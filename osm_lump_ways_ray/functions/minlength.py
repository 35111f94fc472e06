"""--min-length percentage DSL (reference ``MinLengthFilter``,
src/way_group.rs:205-245): a plain number or ``Nm``/``Nkm`` is a literal
metre threshold; ``N%longest`` is a fraction of the longest group's length;
``N%total`` a fraction of the summed length; ``incl N%total`` keeps the
longest groups whose cumulative length covers N% of the total (the threshold
becomes the length of the first group that pushes the cumulative sum past
the target — main.rs:563-577)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class MinLength:
    kind: str  # "length" | "percent_longest" | "percent_total" | "incl_total"
    value: float


def parse_min_length(s: str) -> MinLength:
    """Case-insensitive, same accepted forms and order as the reference's
    ``FromStr`` (way_group.rs:213-245)."""
    t = s.strip().lower()
    try:
        return MinLength("length", float(t))
    except ValueError:
        pass
    for suffix, scale in (("km", 1000.0), ("m", 1.0)):
        if t.endswith(suffix):
            try:
                return MinLength("length", float(t[:-len(suffix)]) * scale)
            except ValueError:
                pass
    if t.endswith("%longest"):
        return MinLength("percent_longest", float(t[:-len("%longest")]) / 100)
    if t.startswith("incl") and t.endswith("%total"):
        return MinLength("incl_total",
                         float(t[len("incl"):-len("%total")]) / 100)
    if t.endswith("%total"):
        return MinLength("percent_total", float(t[:-len("%total")]) / 100)
    raise ValueError(f"cannot parse --min-length value {s!r}")


def resolve_min_length_m(spec: MinLength, components_ds,
                         length_col: str = "length_m") -> float:
    """Spec → metre threshold against the component table. percent_longest /
    percent_total are single distributed aggregates; incl_total streams the
    DESC-sorted lengths until the cumulative sum passes the target (early
    break — the driver sees at most the kept prefix, reference
    main.rs:563-577 sorts and scans the same way)."""
    if spec.kind == "length":
        return spec.value
    if components_ds.count() == 0:
        return 0.0
    if spec.kind == "percent_longest":
        return float(components_ds.max(length_col)) * spec.value
    total = float(components_ds.sum(length_col))
    if spec.kind == "percent_total":
        return total * spec.value
    # incl_total: threshold = length of the first group past the target;
    # if the target is never exceeded, keep only the longest (reference
    # initialises min_length to way_groups[0].length_m)
    desired = total * spec.value
    cum = 0.0
    threshold = None
    for batch in components_ds.sort(length_col, descending=True) \
            .iter_batches(batch_size=4096, batch_format="pyarrow"):
        for v in batch[length_col].to_numpy(zero_copy_only=False):
            if threshold is None:
                threshold = float(v)  # the longest group
            cum += float(v)
            if cum > desired:
                return float(v)
    return threshold if threshold is not None else 0.0
