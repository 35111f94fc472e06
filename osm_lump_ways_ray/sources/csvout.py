"""CSV sinks (S5/S6/S7).

- S5 feature CSV (src/fileio.rs:216-264): header from the props columns, one
  row per feature with a WKT LINESTRING geometry column (lon lat order, 6 dp).
- S6 append-mode stats CSV (ends_csv.rs:14-108): append rows keyed by the run's
  latest input timestamp; header written once, later runs append (a per-run
  time series).
- S7 OpenMetrics gauges (openmetrics.rs:8-44): ``name{label="…"} value`` lines.
"""

from __future__ import annotations

import os
from typing import Sequence

import pyarrow as pa


def _wkt_linestring(lats, lons) -> str:
    pts = ", ".join(f"{lo / 1e7:.6f} {la / 1e7:.6f}" for la, lo in zip(lats, lons))
    return f"LINESTRING ({pts})"


def render_csv_rows(batch: pa.Table, *, props_cols: Sequence[str],
                    lats_col: str = "lats", lons_col: str = "lons") -> pa.Table:
    """Feature rows → CSV line strings (geometry as WKT, like --save-as csv)."""
    lats = batch[lats_col].to_pylist()
    lons = batch[lons_col].to_pylist()
    props = {c: batch[c].to_pylist() for c in props_cols}
    lines = []
    for i in range(len(batch)):
        vals = [str(props[c][i]) for c in props_cols]
        geom = _wkt_linestring(lats[i], lons[i])
        lines.append(",".join(vals + [f'"{geom}"']))
    return pa.table({"line": pa.array(lines, pa.string())})


def write_feature_csv(ds, path: str, *, props_cols: Sequence[str],
                      lats_col: str = "lats", lons_col: str = "lons") -> int:
    """Write one CSV file (small result sets — the reference writes one file
    too); returns row count."""
    rendered = ds.map_batches(
        lambda b: render_csv_rows(b, props_cols=props_cols, lats_col=lats_col,
                                  lons_col=lons_col),
        batch_format="pyarrow")
    n = 0
    with open(path, "w") as f:
        f.write(",".join(list(props_cols) + ["geom"]) + "\n")
        for batch in rendered.iter_batches(batch_format="pyarrow"):
            for line in batch["line"].to_pylist():
                f.write(line + "\n")
                n += 1
    return n


def append_stats_csv(path: str, header: Sequence[str], rows) -> None:
    """S6: append-mode stats CSV — header once, rows appended per run
    (ends_csv.rs:14-54 header check semantics)."""
    exists = os.path.exists(path)
    if exists:
        with open(path) as f:
            first = f.readline().strip()
        if first and first != ",".join(header):
            raise ValueError(f"header mismatch in {path}: {first!r}")
    with open(path, "a") as f:
        if not exists:
            f.write(",".join(header) + "\n")
        for row in rows:
            f.write(",".join(str(v) for v in row) + "\n")


def write_openmetrics(path: str, metric: str, labeled_values, *,
                      help_text: str = "") -> None:
    """S7: minimal OpenMetrics exposition (gauges)."""
    with open(path, "w") as f:
        if help_text:
            f.write(f"# HELP {metric} {help_text}\n")
        f.write(f"# TYPE {metric} gauge\n")
        for labels, value in labeled_values:
            lab = ",".join(f'{k}="{v}"' for k, v in labels.items())
            f.write(f"{metric}{{{lab}}} {value}\n")
        f.write("# EOF\n")


def write_ends_csv(path: str, ends_rows, *, ends_tag_keys=(),
                   only_tagged: bool = False, min_length_m=None,
                   only_largest_n=None, latest_timestamp: int = 0,
                   latest_timestamp_iso: str = "") -> int:
    """S6 FULL column set + filters (ends_csv.rs:14-108): header
    ``timestamp, iso_datetime, upstream_m, upstream_m_rank, nid, lat, lng,
    *ends_tag_keys``; rows filtered to upstream > 1 m (reference :76),
    optionally tagged-only / min-length / largest-N, sorted by upstream desc
    with 1-based rank; upstream rounded to 1 dp, coordinates to 7 dp.

    ``ends_rows``: iterable of dicts with nid, upstream_m, lat, lon (degrees)
    and optional ``tags`` list aligned with ``ends_tag_keys``. Appends to an
    existing file after a header check; returns rows written."""
    from ..functions.utils import round_half_away

    rows = [r for r in ends_rows if r["upstream_m"] > 1.0]
    if only_tagged:
        rows = [r for r in rows
                if any(t is not None for t in r.get("tags", []))]
    if min_length_m is not None:
        rows = [r for r in rows if r["upstream_m"] >= min_length_m]
    rows.sort(key=lambda r: (-r["upstream_m"], r["nid"]))
    if only_largest_n is not None:
        rows = rows[:only_largest_n]
    header = ["timestamp", "iso_datetime", "upstream_m", "upstream_m_rank",
              "nid", "lat", "lng"] + list(ends_tag_keys)
    out = []
    for rank, r in enumerate(rows):
        rec = [latest_timestamp, latest_timestamp_iso,
               float(round_half_away(r["upstream_m"], 1)), rank + 1,
               r["nid"],
               float(round_half_away(r["lat"], 7)),
               float(round_half_away(r["lon"], 7))]
        tags = r.get("tags", [None] * len(ends_tag_keys))
        rec.extend("" if t is None else t for t in tags)
        out.append(rec)
    append_stats_csv(path, header, out)
    return len(out)
