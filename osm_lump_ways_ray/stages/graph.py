"""Distributed graph kernels: degree/pillar (A1), way→edge contraction (M5/M6),
and connected components (G1) — the lump benchmark kernel.

Reference semantics being re-created (NOT ported — the reference is a
single-process shared-mutable-HashMap engine, SURVEY.md §4):

- A1 degree count (src/bin/osm-lump-ways/main.rs:264-292): per way, weight +1 for
  nids[0], +2 for every other position INCLUDING the last, +1 extra for the last
  (so a way's last node always weighs ≥3); weights saturate at u8 (255). Pillar
  nodes are those with total weight != 2.
- M5 contraction (src/bin/osm-lump-ways/main.rs:352-378): within one way, walk the
  node chain, emit an edge from the current node to the next pillar node and stash
  the intermediate nodes; a backtrack guard avoids emitting a parallel edge for
  split-rejoin braids. DIVERGENCE (documented): the reference's guard consults the
  whole group graph built so far (shared mutable state); we keep the guard
  per-way and keep cross-way parallel contracted edges as distinct rows — CC
  membership and summed lengths are unaffected, only the per-edge geometry
  partition differs.
- M6 consecutive-duplicate scrub (src/bin/osm-lump-ways-down/main.rs:385-393).
- G1 connected components (src/graph/undirected_graph.rs:346-380): the reference
  BFS-peels whole in-memory graphs. Here: per-partition union-find contraction
  (groupby over a hash of the canonical edge key) → per-node minimum local label →
  a label-equivalence graph orders of magnitude smaller → recurse, with a driver
  union-find base case below a row threshold. Expected depth at 10^12 rows: 2-3
  levels. Each level checkpoints (state/checkpoint.py) for kill/resume.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.checkpoint import CheckpointManager

# --------------------------------------------------------------------- A1 degree

def _degree_weights_batch(batch: pa.Table, node_ids_col: str) -> pa.Table:
    """Per-batch partial aggregation of node degree weights (pre-shuffle combine)."""
    chains = batch[node_ids_col].to_pylist()
    ids: list[np.ndarray] = []
    wts: list[np.ndarray] = []
    for chain in chains:
        arr = np.asarray(chain, dtype=np.int64)
        if len(arr) == 0:
            continue
        w = np.full(len(arr), 2, dtype=np.int64)
        w[0] = 1
        w[-1] += 1  # last node: +2 (loop) +1 (endpoint) = 3 — reference quirk kept
        ids.append(arr)
        wts.append(w)
    if not ids:
        return pa.table({"node_id": pa.array([], pa.int64()),
                         "weight": pa.array([], pa.int64())})
    cat = np.concatenate(ids)
    wcat = np.concatenate(wts)
    uniq, inv = np.unique(cat, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, wcat)
    return pa.table({"node_id": uniq, "weight": sums})


def node_degree_weights(ways_ds, node_ids_col: str = "node_ids"):
    """ways → (node_id, weight) with weight clipped to 255 (u8 saturation parity)."""
    from ray.data.aggregate import Sum

    partial = ways_ds.map_batches(
        lambda b: _degree_weights_batch(b, node_ids_col), batch_format="pyarrow"
    )
    agg = partial.groupby("node_id").aggregate(Sum("weight", alias_name="weight"))
    return agg.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("weight"), "weight",
            pc.min_element_wise(b["weight"], pa.scalar(255, pa.int64())),
        ),
        batch_format="pyarrow",
    )


def pillar_node_array(ways_ds, node_ids_col: str = "node_ids") -> np.ndarray:
    """Sorted int64 array of pillar node ids (weight != 2), for broadcast.

    The reference keeps this as an in-process SortedSliceSet
    (src/sorted_slice_store.rs:5-99); we broadcast it once with ``ray.put`` and
    binary-search per batch. At planet scale pillar nodes are ~5% of nodes
    (src/bin/osm-lump-ways-down/main.rs:1319-1322) — at 10^12 rows this broadcast
    outgrows a worker heap and the join-based variant (explode ways to
    (way_id, seq, node_id) ⋈ degree table on node_id) must be used instead; the
    broadcast path is the fast path for per-cell shards.
    """
    deg = node_degree_weights(ways_ds, node_ids_col)
    filt = deg.map_batches(
        lambda b: b.filter(pc.not_equal(b["weight"], pa.scalar(2, pa.int64()))),
        batch_format="pyarrow",
    )
    parts = [b["node_id"].to_numpy() for b in filt.iter_batches(batch_format="pyarrow")]
    if not parts:
        return np.array([], dtype=np.int64)
    return np.sort(np.concatenate(parts))


# ----------------------------------------------------------------- M5 contraction

def _dedupe_consecutive(arr: np.ndarray) -> np.ndarray:
    """M6: drop consecutive repeated node ids (src/bin/osm-lump-ways-down/main.rs:385-393)."""
    if len(arr) < 2:
        return arr
    keep = np.empty(len(arr), dtype=bool)
    keep[0] = True
    np.not_equal(arr[1:], arr[:-1], out=keep[1:])
    return arr[keep]


class ContractWays:
    """Actor-pool/map_batches callable: ways → contracted edge rows.

    Output columns: ``u, v, way_id, inter_nids (list<int64>), num_nodes`` plus any
    pass-through columns listed in ``carry_cols`` (e.g. the group key, lang).
    ``u``/``v`` are NOT canonicalized here; ``canonical_edges`` does that.
    The pillar set is shipped once via an object-store ref and resolved in
    ``__init__`` (once per actor), not per batch.
    """

    def __init__(self, pillar_ref, node_ids_col: str = "node_ids",
                 way_id_col: str = "way_id", carry_cols: Sequence[str] = ()):
        import ray

        self.pillars = ray.get(pillar_ref) if not isinstance(pillar_ref, np.ndarray) else pillar_ref
        self.node_ids_col = node_ids_col
        self.way_id_col = way_id_col
        self.carry_cols = list(carry_cols)

    def _is_pillar(self, nids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.pillars, nids)
        idx = np.clip(idx, 0, len(self.pillars) - 1) if len(self.pillars) else idx
        if len(self.pillars) == 0:
            return np.zeros(len(nids), dtype=bool)
        return self.pillars[idx] == nids

    def __call__(self, batch: pa.Table) -> pa.Table:
        chains = batch[self.node_ids_col].to_pylist()
        way_ids = batch[self.way_id_col].to_numpy(zero_copy_only=False)
        carry_vals = {c: batch[c].to_pylist() for c in self.carry_cols}

        out_u, out_v, out_w, out_inter = [], [], [], []
        out_carry = {c: [] for c in self.carry_cols}
        for row_i, chain in enumerate(chains):
            nodes = _dedupe_consecutive(np.asarray(chain, dtype=np.int64))
            n = len(nodes)
            if n < 2:
                continue
            emitted: set[tuple[int, int]] = set()  # per-way parallel-edge guard

            def emit(a: int, b: int, inter):
                key = (a, b) if a < b else (b, a)
                if key in emitted:
                    return
                emitted.add(key)
                out_u.append(a)
                out_v.append(b)
                out_w.append(int(way_ids[row_i]))
                out_inter.append([int(x) for x in inter])
                for c in self.carry_cols:
                    out_carry[c].append(carry_vals[c][row_i])

            if n == 2:
                emit(int(nodes[0]), int(nodes[1]), [])
            else:
                pillar_mask = self._is_pillar(nodes)
                pos = 0
                while n - pos >= 2:
                    # next pillar strictly after pos; the way's last node always
                    # qualifies (weight ≥ 3 by the A1 weighting)
                    nxt = None
                    for i in range(pos + 1, n):
                        if pillar_mask[i] or i == n - 1:
                            nxt = i
                            break
                    i = nxt
                    # split-rejoin backtrack (main.rs:360-377): shrink the edge if
                    # it would duplicate one already emitted from this way
                    while i > pos + 1 and (min(nodes[pos], nodes[i]), max(nodes[pos], nodes[i])) in emitted:
                        i -= 1
                    emit(int(nodes[pos]), int(nodes[i]), nodes[pos + 1:i])
                    pos = i
        cols = {
            "u": pa.array(out_u, pa.int64()),
            "v": pa.array(out_v, pa.int64()),
            "way_id": pa.array(out_w, pa.int64()),
            "inter_nids": pa.array(out_inter, pa.list_(pa.int64())),
        }
        for c in self.carry_cols:
            cols[c] = pa.array(out_carry[c])
        return pa.table(cols)


def contract_ways(ways_ds, pillar_ref, *, carry_cols: Sequence[str] = (),
                  concurrency: Optional[int] = None):
    """ways Dataset → contracted edges Dataset (stateful actor pool when
    concurrency given, else stateless tasks with the ref resolved per task)."""
    if concurrency is None:
        import ray

        # callable classes need an explicit actor-pool size; autoscale up to the
        # session's CPUs so the pool never starves the read/shuffle stages
        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(2, ncpu))
    return ways_ds.map_batches(
        ContractWays,
        fn_constructor_kwargs=dict(pillar_ref=pillar_ref, carry_cols=carry_cols),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )


# ------------------------------------------------------------------------- G1 CC

class _UnionFind:
    __slots__ = ("parent", "seen")

    def __init__(self):
        self.parent: dict[int, int] = {}
        self.seen: set[int] = set()

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        self.seen.add(a)
        self.seen.add(b)
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if ra < rb:  # min-id wins → labels are component minima
            self.parent[rb] = ra
        else:
            self.parent[ra] = rb

    def labels(self) -> dict[int, int]:
        # every touched node, including local roots (a root that appears in
        # another partition must still emit its (node, label) row, or the
        # equivalence edge through it is lost)
        return {x: self.find(x) for x in self.seen}


def _local_cc_group(batch: pa.Table) -> pa.Table:
    """map_groups body: union-find over one edge partition → (node, label) rows,
    label = min node id in the LOCAL component."""
    u = batch["a"].to_numpy(zero_copy_only=False)
    v = batch["b"].to_numpy(zero_copy_only=False)
    uf = _UnionFind()
    for a, b in zip(u, v):
        uf.union(int(a), int(b))
    lab = uf.labels()
    if not lab:
        return pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
    nodes = np.fromiter(lab.keys(), dtype=np.int64, count=len(lab))
    labels = np.fromiter(lab.values(), dtype=np.int64, count=len(lab))
    return pa.table({"node": nodes, "label": labels})


def _driver_union_find(pairs: "pa.Table") -> dict[int, int]:
    uf = _UnionFind()
    a = pairs["a"].to_numpy(zero_copy_only=False)
    b = pairs["b"].to_numpy(zero_copy_only=False)
    for x, y in zip(a, b):
        uf.union(int(x), int(y))
    return uf.labels()


def _apply_label_map(labels_ds, map_ref, in_col: str, out_name: str):
    """Broadcast small-side lookup: rewrite ``in_col`` through a dict shipped once
    via the object store (ray.put) — no shuffle."""
    import ray

    def apply(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        lab = batch[in_col].to_numpy(zero_copy_only=False)
        out = np.fromiter((m.get(int(x), int(x)) for x in lab), dtype=np.int64,
                          count=len(lab))
        idx = batch.schema.get_field_index(in_col)
        return batch.set_column(idx, out_name, pa.array(out, pa.int64()))

    return labels_ds.map_batches(apply, batch_format="pyarrow")


def connected_components(
    edges_ds,
    src: str = "u",
    dst: str = "v",
    *,
    num_partitions: int = 32,
    driver_finish_rows: int = 2_000_000,
    checkpoint: Optional[CheckpointManager] = None,
    max_levels: int = 6,
    _level: int = 0,
):
    """Distributed CC: Dataset of edges → Dataset ``(node, component_id)`` where
    ``component_id`` is the minimum node id of the component (the reference's
    ``root_nodeid`` = min-nid convention, src/way_group.rs:17-24).

    One level = partition-contract: hash-partition edges on the canonical edge key
    → per-partition union-find (``groupby(part).map_groups`` — each group is one
    whole partition, so per-group overhead is O(num_partitions), not O(nodes)) →
    per-node minimum local label via a vectorized ``Min`` aggregate → a
    label-equivalence graph containing only labels of nodes cut across partitions
    — orders of magnitude smaller than the input. That graph is resolved by
    RECURSING on it; below ``driver_finish_rows`` a driver-side union-find
    finishes exactly (documented base case; at 10^12 edges expect 2-3 levels).
    The resolved root map is either broadcast (``ray.put`` dict, base case) or
    joined back distributedly (recursive case) — never a full re-shuffle of the
    input. Every level checkpoints its labels + equivalence graph
    (state/checkpoint.py) so a killed job resumes mid-algorithm (north rule).

    Isolated nodes never appear in ``edges_ds`` and are the caller's concern.
    """
    from ray.data.aggregate import Min

    import ray

    ckpt = checkpoint or CheckpointManager(None)
    t0 = time.monotonic()
    labels_key = f"cc/l{_level}/labels"
    eq_key = f"cc/l{_level}/eq_edges"

    if ckpt.has(labels_key) and ckpt.has(eq_key):
        node_min = ckpt.load(labels_key)
        eq_edges = ckpt.load(eq_key)
    else:
        def project(batch: pa.Table) -> pa.Table:
            key = pc.min_element_wise(batch[src], batch[dst]).to_numpy(zero_copy_only=False)
            # Knuth multiplicative hash in uint64 wraparound, then mod P — uniform
            # over partitions regardless of id clustering (skew-proof for this key)
            part = ((key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
                    ).astype(np.int64) % num_partitions
            return pa.table({"a": batch[src], "b": batch[dst],
                             "part": pa.array(part, pa.int64())})

        parts = edges_ds.map_batches(project, batch_format="pyarrow")
        local = parts.groupby("part").map_groups(_local_cc_group, batch_format="pyarrow")
        local = local.materialize()
        if local.count() == 0:  # empty edge set → empty labels, stable schema
            empty = pa.table({"node": pa.array([], pa.int64()),
                              "component_id": pa.array([], pa.int64())})
            return ray.data.from_arrow(empty)
        node_min = local.groupby("node").aggregate(Min("label", alias_name="min_label"))
        node_min = node_min.rename_columns(["node", "label"])
        # equivalence edges: for each (node, local_label) where local_label differs
        # from the node's global min — connect them in the label graph
        joined = local.rename_columns(["node", "llabel"]).join(
            node_min, "inner", num_partitions, on=("node",)
        )
        eq_edges = joined.map_batches(
            lambda b: pa.table(
                {"a": b["label"], "b": b["llabel"]}
            ).filter(pc.not_equal(b["label"], b["llabel"])),
            batch_format="pyarrow",
        )
        node_min = ckpt.save(labels_key, node_min, extra={"level": _level})
        eq_edges = ckpt.save(eq_key, eq_edges, extra={"level": _level})

    n_eq = eq_edges.count()
    ckpt.record(step=f"cc/l{_level}", eq_edges=n_eq,
                wall_s=round(time.monotonic() - t0, 3))
    if n_eq == 0:
        return node_min.rename_columns(["node", "component_id"])

    if n_eq <= driver_finish_rows or _level + 1 >= max_levels:
        table = pa.concat_tables(list(eq_edges.iter_batches(batch_format="pyarrow")))
        root_ref = ray.put(_driver_union_find(table))
        out = _apply_label_map(node_min, root_ref, "label", "component_id")
        return out.rename_columns(["node", "component_id"])

    # recursive case: resolve the label graph distributedly, join roots back
    sub = connected_components(
        eq_edges, "a", "b", num_partitions=max(8, num_partitions // 4),
        driver_finish_rows=driver_finish_rows, checkpoint=checkpoint,
        max_levels=max_levels, _level=_level + 1,
    )  # (node=label, component_id=root)
    sub = sub.rename_columns(["label", "root"])
    joined = node_min.join(sub, "left_outer", num_partitions, on=("label",))
    return joined.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "component_id": pc.coalesce(b["root"], b["label"]),
        }),
        batch_format="pyarrow",
    )
