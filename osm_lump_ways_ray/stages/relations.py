"""Relation-tag overwrite (J4) and ends-membership (J6).

- J4 (src/way_id_rel_tags.rs:16-55, README.md:108-122): a relation's tags
  OVERWRITE its member ways' tags; when several relations contain a way, the one
  with the most members wins. DIVERGENCE (documented): the reference breaks ties
  by "last seen" in file order (nondeterministic across parallel readers); we
  break ties by MAX relation id, deterministically.
- J6 (src/bin/osm-lump-ways-down/main.rs:935-1010): re-scan ways matching each
  ``--ends-membership`` filter; every end node contained in a matching way gets
  that filter's ``is_in:<filter>`` flag (OR across ways); plus ``is_in_count``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from .relational import cogroup_join


def relation_tags_overwrite(member_ds, *, way_col: str = "way_id",
                            rel_col: str = "rel_id", tag_col: str = "rel_tag",
                            num_partitions: int = 8):
    """Membership rows (way_id, rel_id, rel_tag) → per-way winning tag.

    Two groupbys: (1) relation sizes, (2) per-way argmax by (n_members, rel_id).
    Returns (way_id, rel_id, rel_tag, n_members)."""
    from ray.data.aggregate import Count

    sizes = member_ds.groupby(rel_col).aggregate(Count(alias_name="n_members"))
    m = cogroup_join(member_ds, sizes, (rel_col,), how="inner",
                     num_partitions=num_partitions)

    def add_part(batch):
        w = batch[way_col].to_numpy(zero_copy_only=False)
        import pyarrow as pa

        return batch.append_column(
            "_part", pa.array(w % num_partitions, pa.int64()))

    def argmax_partition(t):
        # one task per PARTITION (per-way map_groups costs one Python call per
        # way): lexsort by (way, -n_members, -rel_id), keep each way's first row
        import numpy as np
        import pyarrow as pa

        w = t[way_col].to_numpy(zero_copy_only=False)
        n = t["n_members"].to_numpy(zero_copy_only=False)
        r = t[rel_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((-r, -n, w))
        ws = w[order]
        starts = order[np.flatnonzero(np.r_[True, ws[1:] != ws[:-1]])]
        idx = pa.array(starts, pa.int64())
        return pa.table({
            way_col: t[way_col].take(idx),
            rel_col: t[rel_col].take(idx),
            tag_col: t[tag_col].take(idx),
            "n_members": t["n_members"].take(idx),
        })

    return m.map_batches(add_part, batch_format="pyarrow") \
            .groupby("_part").map_groups(argmax_partition,
                                         batch_format="pyarrow")


def ends_membership(ends_ds, way_nodes_ds, filters: Sequence[tuple], *,
                    num_partitions: int = 8):
    """ends (node) ⋈ way-node rows (node, **tag cols**) → per-end boolean
    ``is_in:<name>`` flags + is_in_count.

    ``filters`` = [(name, TagFilter)] evaluated over the way rows' tag columns
    (ColumnTagView); flags OR-accumulate across all ways touching the end
    (reference bit-OR per end, -down/main.rs:975-996)."""
    from ray.data.aggregate import Max

    from ..functions.tagfilter import ColumnTagView

    tag_cols = [c for c in way_nodes_ds.schema().names if c != "node"]

    def flags(batch: pa.Table) -> pa.Table:
        view = ColumnTagView(
            {c: batch[c].to_numpy(zero_copy_only=False) for c in tag_cols},
            n=len(batch))
        cols = {"node": batch["node"]}
        for name, tf in filters:
            cols[f"is_in:{name}"] = pa.array(
                tf.mask(view).astype(np.int64), pa.int64())
        return pa.table(cols)

    flagged = way_nodes_ds.map_batches(flags, batch_format="pyarrow")
    joined = cogroup_join(ends_ds, flagged, ("node",), how="inner",
                          num_partitions=num_partitions)
    aggs = [Max(f"is_in:{name}", alias_name=f"is_in:{name}")
            for name, _ in filters]
    per_end = joined.groupby("node").aggregate(*aggs)

    def count(batch: pa.Table) -> pa.Table:
        total = np.zeros(len(batch), dtype=np.int64)
        for name, _ in filters:
            total += batch[f"is_in:{name}"].to_numpy(zero_copy_only=False)
        return batch.append_column("is_in_count", pa.array(total, pa.int64()))

    return per_end.map_batches(count, batch_format="pyarrow")
