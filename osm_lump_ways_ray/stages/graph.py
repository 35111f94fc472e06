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
  BFS-peels whole in-memory graphs, one per tag-group key. Here the vertex
  identity is the PAIR ``(group, node)`` (a node shared by two tag groups must
  not merge them — the reference keeps one Graph2 per group key,
  src/bin/osm-lump-ways/main.rs:319-346): per-partition union-find contraction
  (groupby over a hash of the canonical edge key) → per-(group,node) minimum
  local label → a label-equivalence graph orders of magnitude smaller → recurse,
  with a driver union-find base case below a row threshold. Expected depth at
  10^12 rows: 2-3 levels. Each level checkpoints (state/checkpoint.py) for
  kill/resume.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.checkpoint import CheckpointManager
from .relational import cogroup_join, hash_join

# --------------------------------------------------------------------- A1 degree

def _list_offsets_values(col: "pa.ChunkedArray"):
    """(offsets, values) numpy views of an Arrow list column (zero-copy).

    Handles plain list arrays, Ray's ArrowTensorArray extension (equal-length
    lists get auto-tensorized by pandas-block conversion), and falls back to a
    pylist walk for anything else."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):  # single chunk after combine
        arr = arr.chunk(0)
    if hasattr(arr, "offsets"):
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
        return offsets, values
    try:  # Ray ArrowTensorArray → (n, k) ndarray
        mat = arr.to_numpy(zero_copy_only=False)
        if getattr(mat, "ndim", 1) == 2:
            n, k = mat.shape
            return (np.arange(n + 1, dtype=np.int64) * k,
                    np.ascontiguousarray(mat, dtype=np.int64).ravel())
    except Exception:  # noqa: BLE001
        pass
    rows = arr.to_pylist()
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    vals = []
    for i, r in enumerate(rows):
        r = r if r is not None else []
        vals.extend(int(x) for x in r)
        offsets[i + 1] = offsets[i] + len(r)
    return offsets, np.asarray(vals, dtype=np.int64)


def _degree_weights_batch(batch: pa.Table, node_ids_col: str) -> pa.Table:
    """Per-batch partial aggregation of node degree weights (pre-shuffle
    combine), fully vectorized over the Arrow list offsets — no per-way Python
    lists (measured 3× on the degree pass at 10^6 rows)."""
    offsets, values = _list_offsets_values(batch[node_ids_col])
    if len(values) == 0:
        return pa.table({"node_id": pa.array([], pa.int64()),
                         "weight": pa.array([], pa.int64())})
    w = np.full(len(values), 2, dtype=np.int64)
    starts = offsets[:-1]
    ends = offsets[1:]
    nonempty = ends > starts
    w[starts[nonempty]] = 1
    # last node: +2 (loop) +1 (endpoint) = 3 — reference quirk kept
    np.add.at(w, ends[nonempty] - 1, 1)
    uniq, inv = np.unique(values, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, w)
    return pa.table({"node_id": uniq, "weight": sums})


def node_degree_weights(ways_ds, node_ids_col: str = "node_ids"):
    """ways → (node_id, weight) with weight clipped to 255 (u8 saturation parity)."""
    from .relational import bucket_sum

    partial = ways_ds.map_batches(
        lambda b: _degree_weights_batch(b, node_ids_col), batch_format="pyarrow"
    )
    agg = bucket_sum(partial, "node_id", "weight", num_partitions=16)
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
    import ray

    filt = pillar_nodes_ds(ways_ds, node_ids_col).materialize()
    # parallel zero-copy block fetch: driver-side iter_batches streams blocks
    # one at a time with per-block serialization overhead (measured 5.0 s for
    # 2M pillar ids at 10M pages vs 1 s via ray.get of the refs). This collect
    # is the broadcast fast path's POINT — bounded by _PILLAR_BROADCAST_MAX.
    refs = [r for bundle in filt.iter_internal_ref_bundles()
            for r in bundle.block_refs]
    parts = [np.asarray(t["node_id"].to_numpy(zero_copy_only=False)
                        if isinstance(t, pa.Table) else t["node_id"])
             for t in ray.get(refs) if len(t)]
    if not parts:
        return np.array([], dtype=np.int64)
    return np.sort(np.concatenate(parts))


def pillar_nodes_ds(ways_ds, node_ids_col: str = "node_ids", deg_ds=None):
    """Pillar node ids (weight != 2) as a DATASET — the scale-path counterpart
    of ``pillar_node_array`` (never collected to the driver)."""
    deg = deg_ds if deg_ds is not None else node_degree_weights(ways_ds,
                                                                node_ids_col)
    return deg.map_batches(
        lambda b: b.filter(pc.not_equal(b["weight"], pa.scalar(2, pa.int64()))),
        batch_format="pyarrow").select_columns(["node_id"])


# ----------------------------------------------------------------- M5 contraction

def _dedupe_mask(arr: np.ndarray) -> np.ndarray:
    """M6 keep-mask: drop consecutive repeated node ids
    (src/bin/osm-lump-ways-down/main.rs:385-393)."""
    keep = np.empty(len(arr), dtype=bool)
    if len(arr):
        keep[0] = True
        np.not_equal(arr[1:], arr[:-1], out=keep[1:])
    return keep


def _dedupe_consecutive(arr: np.ndarray) -> np.ndarray:
    if len(arr) < 2:
        return arr
    return arr[_dedupe_mask(arr)]


class ContractWays:
    """Actor-pool/map_batches callable: ways → contracted edge rows.

    Output columns: ``u, v, way_id, inter_nids (list<int64>)`` plus any
    pass-through columns listed in ``carry_cols`` (e.g. the group key, lang).
    ``u``/``v`` are NOT canonicalized here. The pillar set is shipped once via an
    object-store ref and resolved in ``__init__`` (once per actor), not per batch.
    """

    def __init__(self, pillar_ref, node_ids_col: str = "node_ids",
                 way_id_col: str = "way_id", carry_cols: Sequence[str] = ()):
        import ray

        if pillar_ref is None:
            # join-based variant: pillar positions arrive per row in a
            # ``pillar_seqs`` column (see contract_ways_joined) — no broadcast
            self.pillars = None
        else:
            self.pillars = (ray.get(pillar_ref)
                            if not isinstance(pillar_ref, np.ndarray)
                            else pillar_ref)
        self.node_ids_col = node_ids_col
        self.way_id_col = way_id_col
        self.carry_cols = list(carry_cols)

    def _is_pillar(self, nids: np.ndarray) -> np.ndarray:
        if len(self.pillars) == 0:
            return np.zeros(len(nids), dtype=bool)
        idx = np.clip(np.searchsorted(self.pillars, nids), 0, len(self.pillars) - 1)
        return self.pillars[idx] == nids

    def __call__(self, batch: pa.Table) -> pa.Table:
        offsets, values = _list_offsets_values(batch[self.node_ids_col])
        way_ids = batch[self.way_id_col].to_numpy(zero_copy_only=False)
        carry_vals = {c: batch[c].to_pylist() for c in self.carry_cols}
        seq_lists = (batch["pillar_seqs"].to_pylist()
                     if self.pillars is None and
                     "pillar_seqs" in batch.column_names else None)
        # optional carried geometry (node_lats/node_lons parallel lists): edges
        # then carry their chain positions and the lengths stage needs no join
        has_pos = "node_lats" in batch.column_names
        if has_pos:
            _, lat_vals = _list_offsets_values(batch["node_lats"])
            _, lon_vals = _list_offsets_values(batch["node_lons"])

        out_u, out_v, out_w, out_inter = [], [], [], []
        out_lat, out_lon = [], []  # per-edge FULL chain positions (u..inters..v)
        out_carry = {c: [] for c in self.carry_cols}
        for row_i in range(len(way_ids)):
            lo, hi = offsets[row_i], offsets[row_i + 1]
            raw = values[lo:hi]
            keep = _dedupe_mask(raw)
            nodes = raw[keep]
            if has_pos:
                nlats = lat_vals[lo:hi][keep]
                nlons = lon_vals[lo:hi][keep]
            n = len(nodes)
            if n < 2:
                continue
            emitted: set[tuple[int, int]] = set()  # per-way parallel-edge guard

            def emit(pos_a: int, pos_b: int):
                a, b = int(nodes[pos_a]), int(nodes[pos_b])
                key = (a, b) if a < b else (b, a)
                if key in emitted:
                    return
                emitted.add(key)
                out_u.append(a)
                out_v.append(b)
                out_w.append(int(way_ids[row_i]))
                out_inter.append([int(x) for x in nodes[pos_a + 1:pos_b]])
                if has_pos:
                    out_lat.append(nlats[pos_a:pos_b + 1])
                    out_lon.append(nlons[pos_a:pos_b + 1])
                for c in self.carry_cols:
                    out_carry[c].append(carry_vals[c][row_i])

            if n == 2:
                emit(0, 1)
            else:
                if self.pillars is not None:
                    pillar_mask = self._is_pillar(nodes)
                else:
                    mask_raw = np.zeros(hi - lo, dtype=bool)
                    sl = seq_lists[row_i] if seq_lists is not None else None
                    if sl is not None and len(sl):
                        mask_raw[np.asarray(sl, dtype=np.int64)] = True
                    pillar_mask = mask_raw[keep]
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
                    emit(pos, i)
                    pos = i
        cols = {
            "u": pa.array(out_u, pa.int64()),
            "v": pa.array(out_v, pa.int64()),
            "way_id": pa.array(out_w, pa.int64()),
            "inter_nids": pa.array(out_inter, pa.list_(pa.int64())),
        }
        if has_pos:
            # int32 values: e7 fixed-point lat/lon fits (±1.8e9 < 2^31−1) and
            # the chain lists dominate the edge table's bytes — halving them
            # halves the headline pipeline's shuffle + object-store traffic
            # (r2 scaling verdict)
            if out_lat:
                flat_lat = np.concatenate(out_lat).astype(np.int32)
                flat_lon = np.concatenate(out_lon).astype(np.int32)
                lens = np.array([len(x) for x in out_lat], dtype=np.int64)
                off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
                cols["chain_lats"] = pa.ListArray.from_arrays(
                    pa.array(off, pa.int32()), pa.array(flat_lat, pa.int32()))
                cols["chain_lons"] = pa.ListArray.from_arrays(
                    pa.array(off, pa.int32()), pa.array(flat_lon, pa.int32()))
            else:
                cols["chain_lats"] = pa.array([], pa.list_(pa.int32()))
                cols["chain_lons"] = pa.array([], pa.list_(pa.int32()))
        for c in self.carry_cols:
            cols[c] = pa.array(out_carry[c])
        return pa.table(cols)


_PILLAR_CACHE: dict = {}  # per-worker-process pillar arrays, keyed by object ref


def contract_ways(ways_ds, pillar_ref, *, carry_cols: Sequence[str] = (),
                  concurrency: Optional[int] = None, use_actors: bool = False):
    """ways Dataset → contracted edges Dataset.

    Default path: STATELESS tasks with a per-worker-process cache of the pillar
    array (worker processes are reused, so the ``ray.get`` happens once per
    worker — actor-pool semantics without the pool spin-up, which measured ~2 s
    flat at 32 CPUs). ``use_actors=True`` selects the explicit actor pool
    (same state lifecycle via ``__init__``)."""
    if use_actors:
        if concurrency is None:
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
            concurrency = (1, max(2, ncpu))
        return ways_ds.map_batches(
            ContractWays,
            fn_constructor_kwargs=dict(pillar_ref=pillar_ref, carry_cols=carry_cols),
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=concurrency,
        )

    def run(batch: pa.Table) -> pa.Table:
        key = pillar_ref.hex() if hasattr(pillar_ref, "hex") else id(pillar_ref)
        worker = _PILLAR_CACHE.get(key)
        if worker is None:
            worker = ContractWays(pillar_ref, carry_cols=carry_cols)
            _PILLAR_CACHE.clear()  # only ever one live pillar set per job
            _PILLAR_CACHE[key] = worker
        return worker(batch)

    return ways_ds.map_batches(run, batch_format="pyarrow", batch_size=4096)


def contract_ways_joined(ways_ds, *, node_ids_col: str = "node_ids",
                         way_id_col: str = "way_id",
                         carry_cols: Sequence[str] = (),
                         num_partitions: int = 16, pillars_ds=None):
    """M5 contraction WITHOUT the pillar broadcast — the documented scale path
    (pillar_node_array docstring; reference semantics main.rs:352-378): at
    planet scale ~5% of nodes are pillars, and a driver/worker-heap int64
    array of them outgrows any single heap at 10^12 rows.

    Shape: explode ways to (way_id, seq, node_id) id-only rows → inner
    hash-join against the pillar node set → regroup the HIT positions per way
    (≈5% of exploded rows) → left-outer join the per-way ``pillar_seqs`` list
    back onto the ways table → the same per-way contraction body, reading
    flags from the row instead of a broadcast array. Cost: two id-only
    shuffles plus one way_id-keyed shuffle of the ways table, each with
    bounded per-task memory. Emits identical edges to ``contract_ways``
    (pytest parity: tests/test_graph.py)."""
    from .relational import cogroup_join

    if pillars_ds is None:
        pillars_ds = pillar_nodes_ds(ways_ds, node_ids_col)

    def explode(batch: pa.Table) -> pa.Table:
        offsets, values = _list_offsets_values(batch[node_ids_col])
        way_ids = batch[way_id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        counts = (offsets[1:] - offsets[:-1]).astype(np.int64)
        seq = np.arange(len(values), dtype=np.int64) \
            - np.repeat(offsets[:-1], counts)
        return pa.table({
            way_id_col: pa.array(np.repeat(way_ids, counts), pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "node_id": pa.array(values, pa.int64()),
        })

    ex = ways_ds.map_batches(explode, batch_format="pyarrow")
    hits = cogroup_join(ex, pillars_ds, ("node_id",), how="inner",
                        num_partitions=num_partitions)

    def collect(t: pa.Table) -> pa.Table:
        # plain list<int64> output (NOT a numpy cell in pandas — Ray would
        # wrap it in its tensor extension type, which breaks downstream joins)
        s = np.sort(t["seq"].to_numpy(zero_copy_only=False))
        return pa.table({
            way_id_col: pa.array([t[way_id_col][0].as_py()], pa.int64()),
            "pillar_seqs": pa.array([s.tolist()], pa.list_(pa.int64())),
        })

    seqs = hits.groupby(way_id_col).map_groups(collect, batch_format="pyarrow")
    ways2 = cogroup_join(ways_ds, seqs, (way_id_col,), how="left_outer",
                         num_partitions=num_partitions)

    def run(batch: pa.Table) -> pa.Table:
        return ContractWays(None, node_ids_col=node_ids_col,
                            way_id_col=way_id_col, carry_cols=carry_cols)(batch)

    return ways2.map_batches(run, batch_format="pyarrow", batch_size=4096)


# ------------------------------------------------------------------------- G1 CC
#
# Vertex identity is the pair (g, node): g is an int64 tag-group id (0 when
# ungrouped). All shuffles/joins key on both columns; labels are node ids (the
# component minimum within its group), so ``component_id`` keeps the reference's
# root_nodeid = min-nid convention (src/way_group.rs:17-24).

def _unique_pairs(g: np.ndarray, x: np.ndarray):
    """``np.unique`` over (g, x) PAIRS via rank-encoded composite int64 —
    identical sorted rows + inverse to ``np.unique(stack, axis=0)`` but ~1.6×
    faster (axis-0 unique sorts void views; measured 5.1 s vs 3.3 s at 3.3M
    rows — this runs serially on the driver in the CC base case)."""
    ux = np.unique(x)
    xr = np.searchsorted(ux, x)
    ug = np.unique(g)
    gr = np.searchsorted(ug, g)
    span = np.int64(len(ux) + 1)
    uc, inv = np.unique(gr * span + xr, return_inverse=True)
    uniq = np.stack([ug[uc // span], ux[uc % span]], axis=1)
    return uniq, inv


def _min_label_fixpoint(uniq: np.ndarray, ia: np.ndarray,
                        ib: np.ndarray) -> np.ndarray:
    """Min-label propagation with POINTER JUMPING (ADVICE r2: plain one-hop
    rounds degrade to O(diameter × edges) when a hash partition lands a long
    id-consecutive chain run in one group). Labels are DENSE indices into
    ``uniq`` — rows are (g, node) sorted lexicographically, so index order is
    node-id order within a group, and edges never cross groups — which keeps
    the invariant parent[i] ≤ i and makes ``parent[parent]`` a valid
    compression. Hook (edge scatters) + full compression per round =
    O(log diameter) rounds. Returns NODE-ID labels (the component min)."""
    parent = np.arange(len(uniq), dtype=np.int64)
    while True:
        new = parent.copy()
        np.minimum.at(new, ia, parent[ib])
        np.minimum.at(new, ib, parent[ia])
        while True:  # exponential chain collapse
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, parent):
            break
        parent = new
    return uniq[parent, 1]


def _local_cc_group(batch: pa.Table) -> pa.Table:
    """map_groups body: one edge partition → (g, node, label) rows, label = min
    node id in the LOCAL component. Vectorized min-label propagation (r2 — the
    per-edge Python union-find loop was the partition stage's hot path) with
    pointer jumping (r3 ADVICE: O(log diameter) rounds even when a long chain
    run lands in one partition)."""
    g = batch["g"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(g) == 0:
        return pa.table({"g": pa.array([], pa.int64()),
                         "node": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64())})
    uniq, inv = _unique_pairs(np.concatenate([g, g]),
                              np.concatenate([u, v]))
    n_e = len(g)
    ia, ib = inv[:n_e], inv[n_e:]
    lbl = _min_label_fixpoint(uniq, ia, ib)
    return pa.table({"g": pa.array(uniq[:, 0]), "node": pa.array(uniq[:, 1]),
                     "label": pa.array(lbl)})


def _node_min_eq_group(batch: pa.Table) -> pa.Table:
    """map_groups body over one vertex-hash bucket of (g, node, label) rows:
    emit kind-0 rows (g, node, min_label) and kind-1 equivalence edges
    (g, min_label, other_label) for every non-minimal local label.

    Fully vectorized (r4, VERDICT r3 #4): one lexsort, then the run-split
    idiom — boundary masks pick vertex starts (whose label is the run min)
    and the first occurrence of every distinct non-min label (adjacent
    duplicates collapse because the run is label-sorted). This is the
    per-round reduce body of the non-base-case CC path, so it must carry
    10^12-edge rounds without a Python loop."""
    g = batch["g"].to_numpy(zero_copy_only=False).astype(np.int64)
    node = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(g) == 0:
        z8 = pa.array([], pa.int8())
        z64 = pa.array([], pa.int64())
        return pa.table({"kind": z8, "g": z64, "a": z64, "b": z64})
    order = np.lexsort((lab, node, g))
    g, node, lab = g[order], node[order], lab[order]
    new_vertex = np.r_[True, (g[1:] != g[:-1]) | (node[1:] != node[:-1])]
    starts = np.flatnonzero(new_vertex)
    vidx = np.cumsum(new_vertex) - 1          # vertex index per row
    min_lab = lab[starts]                     # sorted → first label is the min
    # kind-1 edges: first occurrence of each DISTINCT label within a vertex
    # run, excluding the run start (the min itself)
    new_lab = np.r_[True, lab[1:] != lab[:-1]] | new_vertex
    eq_mask = new_lab & ~new_vertex
    n0, n1 = len(starts), int(np.count_nonzero(eq_mask))
    return pa.table({
        "kind": pa.array(np.r_[np.zeros(n0, np.int8), np.ones(n1, np.int8)],
                         pa.int8()),
        "g": pa.array(np.r_[g[starts], g[eq_mask]], pa.int64()),
        "a": pa.array(np.r_[node[starts], min_lab[vidx[eq_mask]]], pa.int64()),
        "b": pa.array(np.r_[min_lab, lab[eq_mask]], pa.int64()),
    })


def _driver_union_find(table: pa.Table):
    """Base case: exact resolution of the (small) equivalence graph as FOUR
    numpy arrays ``(ug, ul, comp, root)`` — a vectorized composite-rank map,
    probed by ``_root_lookup`` with pure ``searchsorted`` passes.

    r2 vectorized the UNION-FIND (min-label propagation over dense-indexed
    vertices); r4 vectorizes the MAP itself: the old ``{(g,label): root}``
    dict cost a 1M+-iteration Python comprehension to build and a per-row
    ``m.get((int(g), int(x)))`` tuple loop to probe — measured 19 s of the
    20.5 s CC phase at 10M pages (the shuffles take 0.45 s each). Encoding:
    ``comp = rank(g)·(|ul|+1) + rank(label)`` over the map's own unique
    values (int64-safe: both ranks ≤ |map| ≲ driver_finish_rows)."""
    g = table["g"].to_numpy(zero_copy_only=False).astype(np.int64)
    a = table["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = table["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    empty = np.array([], dtype=np.int64)
    if len(g) == 0:
        return (empty, empty, empty, empty)
    uniq, inv = _unique_pairs(np.concatenate([g, g]), np.concatenate([a, b]))
    n_e = len(g)
    ia, ib = inv[:n_e], inv[n_e:]
    lbl = _min_label_fixpoint(uniq, ia, ib)
    kg, kl = uniq[:, 0], uniq[:, 1]
    ug = np.unique(kg)
    ul = np.unique(kl)
    # uniq is row-lexsorted → comp is strictly increasing (searchsorted-ready)
    comp = (np.searchsorted(ug, kg) * np.int64(len(ul) + 1)
            + np.searchsorted(ul, kl))
    return (ug, ul, comp, lbl)


def _root_lookup(rmap, g: np.ndarray, lab: np.ndarray) -> np.ndarray:
    """Vectorized probe of a ``_driver_union_find`` map: rows whose (g, label)
    is absent keep their label (identity default — same semantics as the old
    ``dict.get``)."""
    ug, ul, comp, root = rmap
    if len(comp) == 0 or len(g) == 0:
        return lab.astype(np.int64, copy=True)
    rg = np.searchsorted(ug, g)
    rl = np.searchsorted(ul, lab)
    np.minimum(rg, len(ug) - 1, out=rg)
    np.minimum(rl, len(ul) - 1, out=rl)
    valid = (ug[rg] == g) & (ul[rl] == lab)
    probe = rg * np.int64(len(ul) + 1) + rl
    pos = np.searchsorted(comp, probe)
    np.minimum(pos, len(comp) - 1, out=pos)
    hit = valid & (comp[pos] == probe)
    out = lab.astype(np.int64, copy=True)
    out[hit] = root[pos[hit]]
    return out


def _empty_labels():
    import ray.data

    return ray.data.from_arrow(pa.table({
        "g": pa.array([], pa.int64()),
        "node": pa.array([], pa.int64()),
        "component_id": pa.array([], pa.int64()),
    }))


def connected_components(
    edges_ds,
    src: str = "u",
    dst: str = "v",
    group_col: Optional[str] = None,
    *,
    num_partitions: int = 32,
    driver_finish_rows: int = 2_000_000,
    checkpoint: Optional[CheckpointManager] = None,
    max_levels: int = 6,
    _level: int = 0,
):
    """Distributed CC: Dataset of edges → Dataset ``(g, node, component_id)``
    where ``component_id`` is the minimum node id of the component within its
    tag group (the reference's root_nodeid convention). ``group_col`` names an
    int64 group-id column (see ``intern_group_ids``); omitted → single group 0.

    One level = partition-contract: hash-partition edges on the canonical edge
    key → per-partition union-find (``groupby(part).map_groups`` — each group is
    one whole partition, so per-group overhead is O(num_partitions), not
    O(nodes)) → per-(g,node) minimum local label via a vectorized ``Min``
    aggregate → a label-equivalence graph containing only labels of vertices cut
    across partitions — orders of magnitude smaller than the input. That graph
    is resolved by RECURSING on it; below ``driver_finish_rows`` a driver-side
    union-find finishes exactly (documented base case; at 10^12 edges expect 2-3
    levels). The resolved root map is either broadcast (``ray.put`` dict, base
    case) or joined back distributedly (recursive case) — never a full
    re-shuffle of the input. Every level checkpoints its labels + equivalence
    graph (state/checkpoint.py) so a killed job resumes mid-algorithm.

    Isolated vertices never appear in ``edges_ds`` and are the caller's concern.
    """
    from ray.data.aggregate import Min

    import ray

    ckpt = checkpoint or CheckpointManager(None)
    t0 = time.monotonic()
    # Fingerprint the invocation into the checkpoint key (ADVICE r1): a fixed
    # "cc/l{level}" key silently served ANOTHER input's labels when one
    # checkpoint dir was shared across runs or across two CC calls in one
    # pipeline. ADVICE r2 hardened the proxy: row count alone let two edge sets
    # of equal size share state, so an order-insensitive endpoint digest is
    # mixed in (one streaming pass; computed only when checkpointing is on).
    if ckpt.root is not None:
        import hashlib as _hl

        from ..state.checkpoint import content_digest

        edges_ds = edges_ds.materialize()
        digest = content_digest(edges_ds, (src, dst))
        fp_src = (f"{src}|{dst}|{group_col}|{num_partitions}|"
                  f"{edges_ds.count()}|{digest}")
        fp = _hl.md5(fp_src.encode()).hexdigest()[:10]
        key_prefix = f"cc-{fp}"
    else:
        key_prefix = "cc"
    labels_key = f"{key_prefix}/l{_level}/labels"
    eq_key = f"{key_prefix}/l{_level}/eq_edges"

    if ckpt.has(labels_key) and ckpt.has(eq_key):
        node_min = ckpt.load(labels_key)
        eq_edges = ckpt.load(eq_key)
        if node_min.count() == 0:
            return _empty_labels()
    else:
        def project(batch: pa.Table) -> pa.Table:
            key = pc.min_element_wise(batch[src], batch[dst]).to_numpy(zero_copy_only=False)
            # Knuth multiplicative hash in uint64 wraparound, then mod P — uniform
            # over partitions regardless of id clustering (skew-proof for this key)
            part = ((key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
                    ).astype(np.int64) % num_partitions
            gcol = (batch[group_col] if group_col
                    else pa.array(np.zeros(len(key), dtype=np.int64), pa.int64()))
            return pa.table({"g": gcol, "a": batch[src], "b": batch[dst],
                             "part": pa.array(part, pa.int64())})

        parts = edges_ds.map_batches(project, batch_format="pyarrow")
        local = parts.groupby("part").map_groups(_local_cc_group, batch_format="pyarrow")
        local = local.materialize()
        n_local = local.count()
        if n_local == 0:  # empty edge set → empty labels, stable schema
            ckpt.save(labels_key, local, extra={"level": _level})
            ckpt.save(eq_key, local, extra={"level": _level})
            return _empty_labels()

        # Small-graph base case: when the ENTIRE label-row set fits the same
        # driver budget the eq-graph base case below already grants itself,
        # finish in one driver pass — each (g, node, label) row is an
        # equivalence edge node↔label, and every label is itself a node id
        # present as a row, so one min-label fixpoint over the distinct
        # vertices yields final component ids. Skips the vbucket shuffle +
        # filter stages + apply map (~2 s of fixed stage cost per CC call —
        # the dominant term on derived graphs far below planet scale). The
        # checkpointed path keeps the full staged pipeline so resume state
        # stays level-shaped.
        if ckpt.root is None and n_local <= driver_finish_rows:
            import ray.data

            tbl = pa.concat_tables(
                list(local.iter_batches(batch_format="pyarrow")))
            g_a = tbl["g"].to_numpy(zero_copy_only=False).astype(np.int64)
            n_a = tbl["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            l_a = tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            uniq, inv = _unique_pairs(np.concatenate([g_a, g_a]),
                                      np.concatenate([n_a, l_a]))
            n_e = len(g_a)
            lbl = _min_label_fixpoint(uniq, inv[:n_e], inv[n_e:])
            return ray.data.from_arrow(pa.table({
                "g": pa.array(uniq[:, 0], pa.int64()),
                "node": pa.array(uniq[:, 1], pa.int64()),
                "component_id": pa.array(lbl, pa.int64()),
            }))

        # ONE shuffle computes both the per-(g,node) min label and the
        # equivalence edges: co-partition label rows by a hash of the vertex so
        # every row of a vertex lands in one group (replaces an aggregate + a
        # join — 3 fewer stage launches per level, the dominant fixed cost on
        # iterative rounds)
        def vbucket(batch: pa.Table) -> pa.Table:
            n = batch["node"].to_numpy(zero_copy_only=False)
            g = batch["g"].to_numpy(zero_copy_only=False)
            key = (n.astype(np.uint64) * np.uint64(1099511628211)
                   ^ g.astype(np.uint64))
            b = ((key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
                 ).astype(np.int64) % num_partitions
            return batch.append_column("vb", pa.array(b, pa.int64()))

        resolved = local.map_batches(vbucket, batch_format="pyarrow") \
                        .groupby("vb").map_groups(_node_min_eq_group,
                                                  batch_format="pyarrow")
        resolved = resolved.materialize()
        node_min = resolved.map_batches(
            lambda b: (lambda f: pa.table({"g": f["g"], "node": f["a"],
                                           "label": f["b"]}))(
                b.filter(pc.equal(b["kind"], pa.scalar(0, pa.int8())))),
            batch_format="pyarrow")
        eq_edges = resolved.map_batches(
            lambda b: (lambda f: pa.table({"g": f["g"], "a": f["a"],
                                           "b": f["b"]}))(
                b.filter(pc.equal(b["kind"], pa.scalar(1, pa.int8())))),
            batch_format="pyarrow")
        node_min = ckpt.save(labels_key, node_min, extra={"level": _level})
        eq_edges = ckpt.save(eq_key, eq_edges, extra={"level": _level})

    n_eq = eq_edges.count()
    ckpt.record(step=f"cc/l{_level}", eq_edges=n_eq,
                wall_s=round(time.monotonic() - t0, 3))
    if n_eq == 0:
        return node_min.rename_columns(["g", "node", "component_id"])

    if n_eq <= driver_finish_rows or _level + 1 >= max_levels:
        table = pa.concat_tables(list(eq_edges.iter_batches(batch_format="pyarrow")))
        root_ref = ray.put(_driver_union_find(table))

        def apply(batch: pa.Table) -> pa.Table:
            from ..state.worker_cache import cached_state

            m = cached_state((root_ref.hex(), "cc_rootmap"),
                             lambda _k: ray.get(root_ref))
            g = batch["g"].to_numpy(zero_copy_only=False).astype(np.int64)
            lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            out = _root_lookup(m, g, lab)
            return pa.table({"g": batch["g"], "node": batch["node"],
                             "component_id": pa.array(out, pa.int64())})

        return node_min.map_batches(apply, batch_format="pyarrow")

    # recursive case: resolve the label graph distributedly, join roots back
    sub = connected_components(
        eq_edges, "a", "b", "g", num_partitions=max(8, num_partitions // 4),
        driver_finish_rows=driver_finish_rows, checkpoint=checkpoint,
        max_levels=max_levels, _level=_level + 1,
    )  # (g, node=label, component_id=root)
    sub = sub.rename_columns(["g", "label", "root"])
    joined = cogroup_join(node_min, sub, ("g", "label"), how="left_outer",
                          num_partitions=num_partitions)
    return joined.map_batches(
        lambda b: pa.table({
            "g": b["g"],
            "node": b["node"],
            "component_id": pc.coalesce(b["root"], b["label"]),
        }),
        batch_format="pyarrow",
    )


def intern_group_ids(ds, value_col: str, out_col: str = "g"):
    """Append an int64 group-id column derived from a string group-value column
    by md5-based hashing (deterministic across workers; collision probability
    negligible for realistic distinct-tag-value counts ≲ 10^8). NULL group
    values (ways without the group tag — the PBF entry) share one reserved
    id distinct from every string's hash, so the facade's
    ``--incl-unset-group`` filter can keep or drop them as a unit."""
    from ..functions.hashing import hash64, hash64_array

    unset_g = np.int64(hash64("\x00<unset-group>\x00"))

    def add(batch: pa.Table) -> pa.Table:
        # group values repeat heavily — md5 only the UNIQUE values and gather
        # (r2 verdict #5: the per-row to_pylist+hash loop was a hot spot)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        isnull = np.array([v is None for v in vals], dtype=bool)
        safe = vals.copy()
        safe[isnull] = ""
        uniq, inv = np.unique(safe, return_inverse=True)
        hashed = np.asarray(hash64_array(list(uniq)), dtype=np.int64)
        out = hashed[inv]
        out[isnull] = unset_g
        return batch.append_column(out_col, pa.array(out, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def pagerank_int(edges_ds, nodes_ds, *, iterations: int = 3,
                 num_partitions: int = 16):
    """PageRank with INTEGER micro-unit arithmetic (deterministic across
    engines, so the DuckDB oracle can unroll the same iterations exactly):

        r_0(v) = 1_000_000
        r_{k+1}(v) = 150_000 + 850_000 · S_k(v) // 1_000_000,
        S_k(v) = Σ_{u→v} r_k(u) // deg_out(u)      (floor division throughout)

    Dangling mass is dropped (simplified variant — mirrored in the oracle).
    Each iteration is one broadcast-or-cogroup join (ranks ⋈ edges on src) and
    one combiner-backed grouped sum — the distributed round shape; ranks stay
    a Dataset throughout, nothing collects to the driver."""
    from .relational import bucket_agg, cogroup_join

    edges = edges_ds.select_columns(["src", "dst"])
    deg = bucket_agg(edges, "src", {"deg": (None, "count")},
                     num_partitions=num_partitions, combine=True)
    edges_deg = cogroup_join(edges, deg, on=("src",),
                             num_partitions=num_partitions)

    def init_rank(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "node": batch["node"],
            "r": pa.array(np.full(n, 1_000_000, np.int64), pa.int64()),
        })

    ranks = nodes_ds.map_batches(init_rank, batch_format="pyarrow")
    for _ in range(iterations):
        def as_src(batch: pa.Table) -> pa.Table:
            return pa.table({"src": batch["node"], "r": batch["r"]})

        r_src = ranks.map_batches(as_src, batch_format="pyarrow")
        contrib_rows = cogroup_join(edges_deg, r_src, on=("src",),
                                    num_partitions=num_partitions)

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch["r"].to_numpy(zero_copy_only=False)
            d = batch["deg"].to_numpy(zero_copy_only=False)
            return pa.table({"node": batch["dst"],
                             "c": pa.array(r // d, pa.int64())})

        sums = bucket_agg(contrib_rows.map_batches(contrib,
                                                   batch_format="pyarrow"),
                          "node", {"s": ("c", "sum")},
                          num_partitions=num_partitions, combine=True)
        joined = cogroup_join(ranks.select_columns(["node"]), sums,
                              on=("node",), how="left_outer",
                              num_partitions=num_partitions)

        def update(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            s = _pc.coalesce(batch["s"], pa.scalar(0, batch["s"].type)) \
                .cast(pa.int64()).to_numpy(zero_copy_only=False)
            r = 150_000 + 850_000 * s // 1_000_000
            return pa.table({"node": batch["node"],
                             "r": pa.array(r, pa.int64())})

        from .relational import snapshot

        # sever the plan between rounds (iterative union→all-to-all shapes
        # wedge the streaming executor otherwise — same pattern as CC/SCC)
        ranks = snapshot(joined.map_batches(update, batch_format="pyarrow"))

    return ranks.map_batches(
        lambda b: pa.table({"node": b["node"], "rank_micro": b["r"]}),
        batch_format="pyarrow")


def sssp_rounds(edges_ds, sources_ds, *, src_col: str = "src",
                dst_col: str = "dst", weight_col: str = "w",
                num_partitions: int = 8, max_rounds: int = 64,
                checkpoint: Optional[CheckpointManager] = None):
    """Distributed multi-source shortest paths (min over all sources) via
    level-synchronous Bellman-Ford rounds — the giant-component scale path
    for the Dijkstra/A* family (G6/G7 run one in-memory graph per component;
    a planet-scale component needs this round shape instead, the same
    auto-route pattern as G13's levelflow).

    Per round: frontier ⋈ edges (cogroup hash join) → relaxed candidates →
    map-side-combined grouped MIN → join against current distances → the
    improved rows become the next frontier and fold into ``dist`` via an
    idempotent MIN re-aggregate (no driver state; counts are the only values
    that reach the driver). Terminates when a round improves nothing.

    ASSUMPTION (documented, reference parity: the in-memory Dijkstra walks
    the whole component anyway): round count = shortest-path HOP diameter of
    the graph — bounded for road/waterway networks; raise ``max_rounds`` for
    pathological chains. Weights must be non-negative integers (exact
    min-plus arithmetic; the oracle compares bit-for-bit).

    Returns (node, dist) for every REACHABLE node; sources have dist 0.

    ``checkpoint``: per-ROUND kill/resume (the CC/flow pattern): each round
    saves (dist, frontier) under a content-fingerprinted key; a restarted job
    reloads the newest completed round and relaxes on from there.
    """
    from .relational import bucket_agg, cogroup_join, concat_blocks, snapshot

    def init0(batch: pa.Table) -> pa.Table:
        col = batch.column_names[0]
        return pa.table({
            "node": batch[col].cast(pa.int64()),
            "dist": pa.array(np.zeros(len(batch), np.int64), pa.int64()),
        })

    ckpt = checkpoint or CheckpointManager(None)
    edges = snapshot(edges_ds.map_batches(
        lambda b: pa.table({"src": b[src_col].cast(pa.int64()),
                            "dst": b[dst_col].cast(pa.int64()),
                            "w": b[weight_col].cast(pa.int64())}),
        batch_format="pyarrow"))
    dist = snapshot(sources_ds.map_batches(init0, batch_format="pyarrow"))
    frontier = dist
    key_prefix = "sssp"
    start_round = 0
    if ckpt.root is not None:
        import hashlib as _hl

        from ..state.checkpoint import content_digest

        fp = _hl.md5(
            f"{content_digest(edges, ('src', 'dst', 'w'))}|"
            f"{content_digest(dist, ('node',))}|{num_partitions}".encode()
        ).hexdigest()[:10]
        key_prefix = f"sssp-{fp}"
        # resume: newest completed round wins
        for r in range(max_rounds - 1, -1, -1):
            if ckpt.has(f"{key_prefix}/r{r}/dist") and                     ckpt.has(f"{key_prefix}/r{r}/frontier"):
                dist = ckpt.load(f"{key_prefix}/r{r}/dist")
                frontier = ckpt.load(f"{key_prefix}/r{r}/frontier")
                start_round = r + 1
                if frontier.count() == 0:
                    return dist
                break
    for _round in range(start_round, max_rounds):
        f_src = frontier.map_batches(
            lambda b: pa.table({"src": b["node"], "fdist": b["dist"]}),
            batch_format="pyarrow")
        relaxed = cogroup_join(edges, f_src, ("src",), how="inner",
                               num_partitions=num_partitions)
        cand = relaxed.map_batches(
            lambda b: pa.table({
                "node": b["dst"],
                "nd": pa.array(
                    b["fdist"].to_numpy(zero_copy_only=False)
                    + b["w"].to_numpy(zero_copy_only=False), pa.int64()),
            }), batch_format="pyarrow")
        cand_min = bucket_agg(cand, ["node"], {"nd": ("nd", "min")},
                              num_partitions=num_partitions, combine=True)
        probe = cogroup_join(cand_min, dist, ("node",), how="left_outer",
                             num_partitions=num_partitions)

        def improved_only(b: pa.Table) -> pa.Table:
            nd = b["nd"].to_numpy(zero_copy_only=False).astype(np.int64)
            # unmatched rows (first time a node is reached) -> +inf sentinel
            old = pc.fill_null(b["dist"], pa.scalar(np.iinfo(np.int64).max,
                                                    pa.int64())) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            idx = pa.array(np.flatnonzero(nd < old))
            return pa.table({"node": b["node"].take(idx),
                             "dist": b["nd"].take(idx)})

        improved = snapshot(probe.map_batches(improved_only,
                                              batch_format="pyarrow"))
        if improved.count() == 0:
            if ckpt.root is not None:
                ckpt.save(f"{key_prefix}/r{_round}/dist", dist,
                          extra={"round": _round})
                ckpt.save(f"{key_prefix}/r{_round}/frontier", improved,
                          extra={"round": _round, "converged": True})
            break
        dist = snapshot(bucket_agg(concat_blocks(dist, improved), ["node"],
                                   {"dist": ("dist", "min")},
                                   num_partitions=num_partitions,
                                   combine=True))
        frontier = improved
        if ckpt.root is not None:
            dist = ckpt.save(f"{key_prefix}/r{_round}/dist", dist,
                             extra={"round": _round})
            frontier = ckpt.save(f"{key_prefix}/r{_round}/frontier", frontier,
                                 extra={"round": _round})
    return dist


def _sssp_local_arrays(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                       sources: np.ndarray):
    """Driver base case: vectorized Bellman-Ford over dense-indexed arrays
    (np.minimum.at rounds to fixpoint — each round one C scatter over the
    edge list; rounds = hop diameter). Returns (nodes, dist) for reachable
    nodes only. Exact same results as ``sssp_rounds`` (parity-tested)."""
    nodes = np.unique(np.concatenate([src, dst, sources]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    INF = np.iinfo(np.int64).max // 2
    dist = np.full(len(nodes), INF, np.int64)
    dist[np.searchsorted(nodes, sources)] = 0
    while True:
        new = dist.copy()
        with np.errstate(over="ignore"):
            np.minimum.at(new, di, dist[si] + w)
        if np.array_equal(new, dist):
            break
        dist = new
    reach = dist < INF
    return nodes[reach], dist[reach]


def sssp(edges_ds, sources_ds, *, src_col: str = "src", dst_col: str = "dst",
         weight_col: str = "w", num_partitions: int = 8,
         max_rounds: int = 64, max_local_edges: int = 200_000,
         force: Optional[str] = None):
    """Auto-routed multi-source shortest paths (same pattern as G13's
    upstream_flow base case): graphs at or under ``max_local_edges`` run the
    driver-side vectorized Bellman-Ford in one pass; larger graphs run the
    fully distributed ``sssp_rounds``. ``force`` in {"local", "distributed"}
    pins a path for parity tests."""
    import ray.data

    path = force
    if path is None:
        path = ("local" if edges_ds.count() <= max_local_edges
                else "distributed")
    if path == "distributed":
        return sssp_rounds(edges_ds, sources_ds, src_col=src_col,
                           dst_col=dst_col, weight_col=weight_col,
                           num_partitions=num_partitions,
                           max_rounds=max_rounds)
    def _collect(ds, cols):
        tabs = list(ds.iter_batches(batch_format="pyarrow"))
        if not tabs:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        return pa.concat_tables(tabs)

    et = _collect(edges_ds.select_columns([src_col, dst_col, weight_col]),
                  (src_col, dst_col, weight_col))
    st = _collect(sources_ds, ("node",))
    nodes, dist = _sssp_local_arrays(
        et[src_col].to_numpy(zero_copy_only=False).astype(np.int64),
        et[dst_col].to_numpy(zero_copy_only=False).astype(np.int64),
        et[weight_col].to_numpy(zero_copy_only=False).astype(np.int64),
        st[st.column_names[0]].to_numpy(zero_copy_only=False).astype(np.int64))
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "dist": pa.array(dist, pa.int64()),
    }))


def sssp_multi(edges_ds, sources_ds, *, src_col: str = "src",
               dst_col: str = "dst", weight_col: str = "w",
               source_col: str = "source", node_col: str = "node",
               num_partitions: int = 8, max_rounds: int = 64):
    """KEYED multi-source shortest paths: state rows are (source, node, dist)
    and every relaxation round advances ALL sources simultaneously — the same
    shuffle count as one single-source run, rows scaled by |sources|. This is
    the per-hull-node distance pass of the distributed frames skeleton (G8
    giant-component path); same round shape and termination as
    ``sssp_rounds``."""
    from .relational import bucket_agg, cogroup_join, concat_blocks, snapshot

    edges = snapshot(edges_ds.map_batches(
        lambda b: pa.table({"src": b[src_col].cast(pa.int64()),
                            "dst": b[dst_col].cast(pa.int64()),
                            "w": b[weight_col].cast(pa.int64())}),
        batch_format="pyarrow"))
    dist = snapshot(sources_ds.map_batches(
        lambda b: pa.table({
            "source": b[source_col].cast(pa.int64()),
            "node": b[node_col].cast(pa.int64()),
            "dist": pa.array(np.zeros(len(b), np.int64), pa.int64()),
        }), batch_format="pyarrow"))
    frontier = dist
    for _ in range(max_rounds):
        f_src = frontier.map_batches(
            lambda b: pa.table({"src": b["node"], "source": b["source"],
                                "fdist": b["dist"]}),
            batch_format="pyarrow")
        relaxed = cogroup_join(edges, f_src, ("src",), how="inner",
                               num_partitions=num_partitions)
        cand = relaxed.map_batches(
            lambda b: pa.table({
                "source": b["source"],
                "node": b["dst"],
                "nd": pa.array(
                    b["fdist"].to_numpy(zero_copy_only=False)
                    + b["w"].to_numpy(zero_copy_only=False), pa.int64()),
            }), batch_format="pyarrow")
        cand_min = bucket_agg(cand, ["source", "node"], {"nd": ("nd", "min")},
                              num_partitions=num_partitions, combine=True)
        probe = cogroup_join(cand_min, dist, ("source", "node"),
                             how="left_outer", num_partitions=num_partitions)

        def improved_only(b: pa.Table) -> pa.Table:
            nd = b["nd"].to_numpy(zero_copy_only=False).astype(np.int64)
            old = pc.fill_null(b["dist"], pa.scalar(np.iinfo(np.int64).max,
                                                    pa.int64())) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            idx = pa.array(np.flatnonzero(nd < old))
            return pa.table({"source": b["source"].take(idx),
                             "node": b["node"].take(idx),
                             "dist": b["nd"].take(idx)})

        improved = snapshot(probe.map_batches(improved_only,
                                              batch_format="pyarrow"))
        if improved.count() == 0:
            break
        dist = snapshot(bucket_agg(concat_blocks(dist, improved),
                                   ["source", "node"],
                                   {"dist": ("dist", "min")},
                                   num_partitions=num_partitions,
                                   combine=True))
        frontier = improved
    return dist


def _emit_wedges(k: np.ndarray, x: np.ndarray, side: np.ndarray):
    """All (a, c) pairs sharing a mid-vertex b with a < b < c. Input is the
    two-sided adjacency (k = mid vertex, x = other endpoint, side 0 ⇒ x < k,
    side 1 ⇒ x > k) SORTED by (k, side, x). One vectorized pass: per-key
    A×C cross products are emitted through a single global pair-index
    arange (p // nC picks the A element, p % nC the C element) — no Python
    loop over the ~|V| distinct keys."""
    if len(k) == 0:
        e = np.empty(0, np.int64)
        return e, e
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    ends = np.r_[starts[1:], np.int64(len(k))]
    nA = np.add.reduceat((side == 0).astype(np.int64), starts)
    nC = (ends - starts) - nA
    tot = nA * nC
    keep = tot > 0
    starts, nA, nC, tot = starts[keep], nA[keep], nC[keep], tot[keep]
    if len(tot) == 0:
        e = np.empty(0, np.int64)
        return e, e
    off = np.concatenate([[0], np.cumsum(tot)[:-1]])
    seg = np.repeat(np.arange(len(tot), dtype=np.int64), tot)
    p = np.arange(int(tot.sum()), dtype=np.int64) - off[seg]
    nc_r = nC[seg]
    wa = x[starts[seg] + p // nc_r]
    wc = x[starts[seg] + nA[seg] + p % nc_r]
    return wa, wc


def _local_triangle_arrays(u: np.ndarray, v: np.ndarray):
    """Driver base case: wedge emit + composite-rank closure over numpy
    arrays (id-oriented u<v input). Same algorithm as the distributed path
    (parity-tested); bounded by the caller's edge threshold."""
    k = np.concatenate([v, u])
    x = np.concatenate([u, v])
    side = np.r_[np.zeros(len(u), np.int8), np.ones(len(u), np.int8)]
    order = np.lexsort((x, side, k))
    wa, wc = _emit_wedges(k[order], x[order], side[order])
    if len(wa) == 0:
        return 0
    uu = np.unique(np.concatenate([u, v, wa, wc]))
    span = np.int64(len(uu) + 1)
    comp_e = np.sort(np.searchsorted(uu, u) * span + np.searchsorted(uu, v))
    probe = np.searchsorted(uu, wa) * span + np.searchsorted(uu, wc)
    pos = np.searchsorted(comp_e, probe)
    np.minimum(pos, len(comp_e) - 1, out=pos)
    return int(np.count_nonzero(comp_e[pos] == probe))


def triangle_count(edges_ds, *, u_col: str = "u", v_col: str = "v",
                   num_partitions: int = 16, max_local_edges: int = 200_000,
                   force: Optional[str] = None):
    """Distributed triangle counting — the canonical wide-join graph metric:
    edges oriented low-id → high-id, wedges by one mid-vertex cogroup join
    (e(a,b) ⋈ e(b,c) → (a,c) with a<b<c), closed by one (a,c) pair
    semi-join back against the edge set, then a count. Two shuffles total.

    SKEW NOTE (100 TB): a hub vertex of degree d emits O(d²) wedges; the
    production mitigation is DEGREE ordering (orient each edge from its
    lower-degree endpoint — one extra degree join) which bounds wedges by
    O(|E|^1.5). Id ordering is the deterministic stand-in here so the SQL
    oracle is a plain 3-way self-join; swap the orientation key for the
    degree table on skewed graphs.

    Auto-routes (the G13 pattern): at or under ``max_local_edges`` the wedge
    emit + closure run on the driver in one numpy pass; ``force`` in
    {"local", "distributed"} pins a path for parity tests.

    Returns one row (n_edges, n_triangles)."""
    import ray.data

    from .relational import bucket_agg, cogroup_join, snapshot

    oriented = edges_ds.map_batches(
        lambda b: (lambda u, v: pa.table({
            "u": pa.array(np.minimum(u, v), pa.int64()),
            "v": pa.array(np.maximum(u, v), pa.int64())}))(
            b[u_col].to_numpy(zero_copy_only=False).astype(np.int64),
            b[v_col].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow")
    # DISTINCT oriented edges: the count is over the SIMPLE graph (duplicate
    # or reversed input rows must not multiply wedges/closures)
    e = snapshot(bucket_agg(oriented, ["u", "v"], {"m": (None, "count")},
                            num_partitions=num_partitions, combine=True)
                 .select_columns(["u", "v"]))
    n_edges = e.count()
    path = force
    if path is None:
        path = "local" if n_edges <= max_local_edges else "distributed"
    if path == "local":
        tabs = list(e.iter_batches(batch_format="pyarrow"))
        if not tabs:
            return ray.data.from_arrow(pa.table({
                "n_edges": pa.array([0], pa.int64()),
                "n_triangles": pa.array([0], pa.int64())}))
        t = pa.concat_tables(tabs)
        tri = _local_triangle_arrays(
            t["u"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["v"].to_numpy(zero_copy_only=False).astype(np.int64))
        return ray.data.from_arrow(pa.table({
            "n_edges": pa.array([int(n_edges)], pa.int64()),
            "n_triangles": pa.array([int(tri)], pa.int64())}))

    # wedge pair-counting in ONE partition pass: both adjacency directions of
    # every mid-vertex land in one hash bucket; per bucket a numpy run-split
    # emits A×C per vertex and pre-counts (a, c) multiplicities with the
    # rank-encoded pair unique — no pandas merge, no raw-wedge shuffle
    # (with the single-execution fix the sf0.1 query dropped 15.4 s → 7.5 s
    # end-to-end at 159k edges / 4.2M triangles; the wedge volume itself —
    # ~8M pairs — is the remaining, irreducible work)
    def adj_rows(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        k = np.concatenate([v, u])            # side 0: k=v (a below k)
        x = np.concatenate([u, v])            # side 1: k=u (c above k)
        side = np.r_[np.zeros(len(u), np.int8), np.ones(len(u), np.int8)]
        part = ((k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(17)).astype(np.int64) % num_partitions
        return pa.table({"k": pa.array(k, pa.int64()),
                         "x": pa.array(x, pa.int64()),
                         "side": pa.array(side, pa.int8()),
                         "_part": pa.array(part, pa.int64())})

    def wedge_counts(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False)
        side = b["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((x, side, k))
        wa, wc = _emit_wedges(k[order], x[order], side[order])
        if len(wa) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"u": z, "v": z, "n": z})
        uniq, inv = _unique_pairs(wa, wc)
        return pa.table({
            "u": pa.array(uniq[:, 0], pa.int64()),
            "v": pa.array(uniq[:, 1], pa.int64()),
            "n": pa.array(np.bincount(inv, minlength=len(uniq))
                          .astype(np.int64), pa.int64()),
        })

    wcount = bucket_agg(
        e.map_batches(adj_rows, batch_format="pyarrow")
         .groupby("_part").map_groups(wedge_counts, batch_format="pyarrow"),
        ["u", "v"], {"n": ("n", "sum")}, num_partitions=num_partitions)
    from .relational import snapshot as _snap

    closed = _snap(cogroup_join(wcount, e.map_batches(
        lambda b: b.append_column("is_e", pa.array(
            np.ones(len(b), np.int8), pa.int8())), batch_format="pyarrow"),
        ("u", "v"), how="inner", num_partitions=num_partitions))
    tri = closed.sum("n") or 0
    return ray.data.from_arrow(pa.table({
        "n_edges": pa.array([int(n_edges)], pa.int64()),
        "n_triangles": pa.array([int(tri)], pa.int64()),
    }))


def _kcore_local_arrays(u: np.ndarray, v: np.ndarray, k: int):
    """Driver base case: vectorized peeling over dense-indexed degree arrays.
    Returns (nodes, deg) of the k-core (deg counted inside the core)."""
    nodes = np.unique(np.r_[u, v])
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    alive_e = np.ones(len(ui), dtype=bool)
    while True:
        deg = np.bincount(ui[alive_e], minlength=len(nodes)) \
            + np.bincount(vi[alive_e], minlength=len(nodes))
        bad = (deg > 0) & (deg < k)
        if not bad.any():
            keep = deg >= k
            return nodes[keep], deg[keep].astype(np.int64)
        alive_e &= ~(bad[ui] | bad[vi])


def kcore(edges_ds, k: int, *, u_col: str = "u", v_col: str = "v",
          num_partitions: int = 16, max_rounds: int = 64,
          max_local_edges: int = 200_000, force=None):
    """Distributed K-CORE decomposition (fixed k): iteratively peel vertices
    of degree < k until fixpoint — the standard dense-subgraph filter
    (spam-farm / community detection pre-pass on web graphs). Returns
    (node, deg) for the surviving core, deg counted within the core.

    Round shape: one combiner-backed degree count (shuffle bounded by
    distinct vertices) + two anti-joins dropping edges incident to peeled
    vertices. O(peel-depth) rounds; each round's work shrinks with the
    surviving edge set. The only driver values are per-round scalar counts.
    Auto-routes to a vectorized driver peel at or under ``max_local_edges``
    (the G13/SSSP/triangles base-case pattern); ``force`` in
    {"local", "distributed"} pins a path for parity tests."""
    import ray.data

    from .relational import bucket_agg, cogroup_join, snapshot, vfilter

    # SIMPLE graph: self-loops dropped (vectorized mask in the same batch
    # pass, never a per-row filter), duplicates collapsed (a duplicate
    # row must not double a vertex's degree)
    def orient(b: pa.Table) -> pa.Table:
        a = b[u_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[v_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != c
        return pa.table({
            "u": pa.array(np.minimum(a, c)[keep], pa.int64()),
            "v": pa.array(np.maximum(a, c)[keep], pa.int64())})

    oriented = edges_ds.map_batches(orient, batch_format="pyarrow")
    e = snapshot(bucket_agg(
        oriented,
        ["u", "v"], {"m": (None, "count")},
        num_partitions=num_partitions, combine=True).select_columns(["u", "v"]))
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64())})
    n_edges = e.count()
    if n_edges == 0:
        return ray.data.from_arrow(empty)
    path = force
    if path is None:
        path = "local" if n_edges <= max_local_edges else "distributed"
    if path == "local":
        t = pa.concat_tables(list(e.iter_batches(batch_format="pyarrow")))
        nodes, deg = _kcore_local_arrays(
            t["u"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["v"].to_numpy(zero_copy_only=False).astype(np.int64), k)
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "deg": pa.array(deg, pa.int64())}))

    def sym(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [b["u"].combine_chunks() if isinstance(b["u"], pa.ChunkedArray)
             else b["u"],
             b["v"].combine_chunks() if isinstance(b["v"], pa.ChunkedArray)
             else b["v"]])})

    deg = None
    for _round in range(max_rounds):
        deg = snapshot(bucket_agg(e.map_batches(sym, batch_format="pyarrow"),
                                  ["node"], {"deg": (None, "count")},
                                  num_partitions=num_partitions, combine=True))
        bad = snapshot(vfilter(deg, "deg", "less", k)
                       .select_columns(["node"]))
        if bad.count() == 0:
            return deg
        e = cogroup_join(e.rename_columns(["node", "v"]), bad, ("node",),
                         how="left_anti", num_partitions=num_partitions) \
            .rename_columns(["u", "node"])
        e = snapshot(cogroup_join(e, bad, ("node",), how="left_anti",
                                  num_partitions=num_partitions)
                     .rename_columns(["u", "v"]))
        if e.count() == 0:
            return ray.data.from_arrow(empty)
    raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")


def double_sweep_diameter(edges_ds, *, u_col: str = "u", v_col: str = "v",
                          num_partitions: int = 4, max_rounds: int = 64):
    """Double-sweep BFS diameter estimate (exact on trees, the standard
    lower bound elsewhere) of the component containing the global MIN
    vertex: one multi-round BFS from the min vertex, hop to its farthest
    node (dist DESC, node ASC tiebreak — deterministic cross-engine), one
    more BFS from there. Both sweeps run the auto-routed ``sssp`` engine
    (unit weights, edges symmetrized map-side): the driver base case under
    ``max_local_edges``, the distributed Bellman-Ford rounds above it — so
    the planet-scale giant component is fine and small graphs do not pay
    ~1.5 s of fixed cost PER HOP (each distributed round is one execution;
    the first cut of this op ran rounds unconditionally and took 90 s on a
    30-hop component). Only two single-row argmax probes touch the driver.

    Returns one row (start_node, far_node, diameter_lb)."""
    import ray.data as rd

    from .relational import concat_blocks, snapshot

    def fwd(b: pa.Table) -> pa.Table:
        return pa.table({"src": b[u_col].cast(pa.int64()),
                         "dst": b[v_col].cast(pa.int64()),
                         "w": pa.array(np.ones(len(b), np.int64), pa.int64())})

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"src": b[v_col].cast(pa.int64()),
                         "dst": b[u_col].cast(pa.int64()),
                         "w": pa.array(np.ones(len(b), np.int64), pa.int64())})

    # snapshot: the min-vertex probe and both sweeps consume sym — and the
    # sssp base-case router calls .count(), metadata-free only when
    # materialized
    sym = snapshot(concat_blocks(
        edges_ds.map_batches(fwd, batch_format="pyarrow"),
        edges_ds.map_batches(rev, batch_format="pyarrow")))
    ends = concat_blocks(
        sym.map_batches(lambda b: pa.table({"node": b["src"]}),
                        batch_format="pyarrow"),
        sym.map_batches(lambda b: pa.table({"node": b["dst"]}),
                        batch_format="pyarrow"))
    start = ends.map_batches(
        lambda b: pa.table({"node": pa.array(
            [int(b["node"].to_numpy(zero_copy_only=False).min())]
            if len(b) else [], pa.int64())}),
        batch_format="pyarrow").repartition(1).map_batches(
        lambda b: pa.table({"node": pa.array(
            [int(b["node"].to_numpy(zero_copy_only=False).min())]
            if len(b) else [], pa.int64())}),
        batch_format="pyarrow", batch_size=None).take_all()
    if not start:
        return rd.from_arrow(pa.table({
            "start_node": pa.array([], pa.int64()),
            "far_node": pa.array([], pa.int64()),
            "diameter_lb": pa.array([], pa.int64())}))
    s0 = int(start[0]["node"])

    def sweep_argmax(src_node: int):
        d = sssp(sym, rd.from_arrow(pa.table(
            {"node": pa.array([src_node], pa.int64())})),
            num_partitions=num_partitions, max_rounds=max_rounds)
        far = d.sort(["dist", "node"], descending=[True, False]) \
            .limit(1).take_all()[0]
        return int(far["node"]), int(far["dist"])

    far1, _ecc = sweep_argmax(s0)
    _far2, diam = sweep_argmax(far1)
    return rd.from_arrow(pa.table({
        "start_node": pa.array([s0], pa.int64()),
        "far_node": pa.array([far1], pa.int64()),
        "diameter_lb": pa.array([diam], pa.int64())}))


def degree_assortativity(edges_ds, *, u_col: str = "u", v_col: str = "v",
                         num_partitions: int = 8):
    """Degree-correlation of an undirected graph: Pearson over the
    (deg_u, deg_v) pairs of every directed orientation — positive means
    hubs link hubs (social nets), negative means hubs link leaves (the
    web). Exact INTEGER moment sums, reported as the (r_num, r_den)
    pair ``r = r_num / r_den`` (both = n·Σxy−(Σx)² / n·Σx²−(Σx)²; Σy = Σx
    by symmetry) so the SQL oracle matches bit-for-bit.

    Shape: degree table via one combiner count, degrees joined onto both
    endpoints (two bucketed joins), one moment-sum combiner pass — no
    per-node state, no driver collections beyond the one-row result."""
    import ray.data as rd

    from .relational import bucket_agg, cogroup_join, concat_blocks, snapshot

    sym = snapshot(concat_blocks(
        edges_ds.map_batches(
            lambda b: pa.table({"s": b[u_col].cast(pa.int64()),
                                "d": b[v_col].cast(pa.int64())}),
            batch_format="pyarrow"),
        edges_ds.map_batches(
            lambda b: pa.table({"s": b[v_col].cast(pa.int64()),
                                "d": b[u_col].cast(pa.int64())}),
            batch_format="pyarrow")))
    deg = bucket_agg(sym.map_batches(
        lambda b: pa.table({"node": b["s"]}), batch_format="pyarrow"),
        "node", {"k": (None, "count")},
        num_partitions=num_partitions, combine=True)
    ds_u = cogroup_join(sym, deg.map_batches(
        lambda b: pa.table({"s": b["node"], "x": b["k"]}),
        batch_format="pyarrow"), ("s",), how="inner",
        num_partitions=num_partitions)
    ds_uv = cogroup_join(ds_u, deg.map_batches(
        lambda b: pa.table({"d": b["node"], "y": b["k"]}),
        batch_format="pyarrow"), ("d",), how="inner",
        num_partitions=num_partitions)

    def moments(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sum_deg": pa.array([int(x.sum())], pa.int64()),
            "sum_prod": pa.array([int((x * y).sum())], pa.int64()),
            "sum_sq": pa.array([int((x * x).sum())], pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        n = int(t["n"].to_numpy().sum())
        sx = int(t["sum_deg"].to_numpy().sum())
        sxy = int(t["sum_prod"].to_numpy().sum())
        sxx = int(t["sum_sq"].to_numpy().sum())
        return pa.table({
            "n_pairs": pa.array([n], pa.int64()),
            "sum_deg": pa.array([sx], pa.int64()),
            "sum_prod": pa.array([sxy], pa.int64()),
            "sum_sq": pa.array([sxx], pa.int64()),
            "r_num": pa.array([n * sxy - sx * sx], pa.int64()),
            "r_den": pa.array([n * sxx - sx * sx], pa.int64())})

    return ds_uv.map_batches(moments, batch_format="pyarrow") \
        .repartition(1).map_batches(finish, batch_format="pyarrow",
                                    batch_size=None)
