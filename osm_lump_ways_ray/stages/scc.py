"""Directed-graph kernels: SCC "loops" (G10), ends (G15), upstream flow
accumulation (G13) — the ``osm-lump-ways-down`` layer.

Reference semantics (NOT a port):

- G10 Kosaraju SCC (src/kosaraju.rs:18-90): single-process 2-pass DFS; singleton
  components are dropped (kosaraju.rs:87). Here: distributed FW-BW min-label
  coloring — iterate min-label propagation forward and backward; vertices with
  ``fwd == bwd == L`` form SCC(L) (mutual reachability); peel assigned vertices
  and repeat. Each round provably assigns at least the SCC of the smallest
  remaining vertex; worst case (long SCC chains) degrades to many rounds, which
  the pillar-node contraction (M5) applied BEFORE SCC mitigates exactly as in
  the reference (SURVEY.md §7.5).
- G15 ends (src/graph/directed_graph.rs:116-122): vertices with out-degree 0 —
  an anti-join of dst-vertices against src-vertices.
- G13 upstream flow (src/bin/osm-lump-ways-down/main.rs:805-910): topo-order
  walk; single-out nodes push ``upstream + length`` downstream and stamp the
  edge with ``upstream``; multi-out nodes split per tag group — same-group
  inflow (Σ in-edge ``upstream_m + length_m``) divides over that group's out
  count; inflow groups with no outflow group split equally over ALL outs; the
  multi-out push does NOT add the out-edge's own length (reference quirk, kept).
  Distributed as: weak-component labeling (G1) → ``groupby(component)
  .map_groups`` with a per-component Kahn walk — components run in parallel,
  inside a component the walk is sequential by data dependency (same as the
  reference, which is single-threaded here). Components beyond
  ``max_group_rows`` edges auto-route to the level-synchronous distributed
  fallback in stages/levelflow.py (see ``upstream_flow`` below; parity-tested
  against the per-component walk in tests/test_scc_flow.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .graph import connected_components
from .relational import cogroup_join, concat_blocks, distinct, hash_join, snapshot


# ---------------------------------------------------------------------- G15 ends

def directed_ends(edges_ds, src: str = "src", dst: str = "dst"):
    """Vertices with out-degree 0 (appear as dst, never as src)."""
    dsts = edges_ds.select_columns([dst]).rename_columns(["node"])
    srcs = edges_ds.select_columns([src]).rename_columns(["node"])
    only_dst = cogroup_join(dsts, srcs, ("node",), how="left_anti", num_partitions=8)
    return distinct(only_dst, "node")


# ------------------------------------------------------------- min-label rounds

_BUCKET_SHIFT = 6  # 64 consecutive node ids per bucket (locality-preserving)
_INF = 1 << 62     # "no candidate" sentinel (min-combines away)


def _fwbw_round_local(df):
    """map_groups body: one bucket's label rows + edge rows → locally-fixpointed
    (fwd, bwd) label pairs for OWNED nodes plus cross-bucket push candidates.

    Rows: kind 0 = label (node, fwd, bwd); kind 1 = edge (node=src, other=dst).
    Every label row for node n lives in bucket(n); every edge is shipped to BOTH
    endpoint buckets, so the owned subgraph is locally complete. fwd labels flow
    src→dst, bwd labels flow dst→src — one fused worklist fixpoint instead of
    two separate propagation jobs (halves rounds, barriers and shuffles).
    ``changed`` = 1 on owned rows whose final fwd/bwd improved on the incoming
    minimum → Σchanged==0 is the global fixpoint test."""
    from collections import defaultdict

    kind = df["kind"].to_numpy()
    node = df["node"].to_numpy()
    other = df["other"].to_numpy()
    fwd_col = df["fwd"].to_numpy()
    bwd_col = df["bwd"].to_numpy()
    # prev_owned: 1 on label rows that were a bucket's OWNED output last round;
    # 0 on external candidates. ``changed`` must compare against the owned
    # previous value ONLY — folding ext candidates into prev hid cross-bucket
    # improvements and stopped the loop a round early (caught at sf0.01).
    owned_col = (df["prev_owned"].to_numpy() if "prev_owned" in df.columns
                 else np.ones(len(kind), dtype=np.int8))

    labF: dict[int, int] = {}
    labB: dict[int, int] = {}
    prevF: dict[int, int] = {}
    prevB: dict[int, int] = {}
    outs = defaultdict(list)  # u -> [v]  (edge u→v, u or v owned here)
    ins = defaultdict(list)   # v -> [u]
    for i in range(len(kind)):
        if kind[i] == 0:
            n = int(node[i])
            f, b = int(fwd_col[i]), int(bwd_col[i])
            if f < labF.get(n, _INF):
                labF[n] = f
            if b < labB.get(n, _INF):
                labB[n] = b
            if owned_col[i] == 1:
                if f < prevF.get(n, _INF):
                    prevF[n] = f
                if b < prevB.get(n, _INF):
                    prevB[n] = b
        else:
            u, v = int(node[i]), int(other[i])
            outs[u].append(v)
            ins[v].append(u)
    extF: dict[int, int] = {}
    extB: dict[int, int] = {}
    work = list(labF.keys())
    in_work = set(work)
    while work:
        nxt, nxt_set = [], set()
        for u in work:
            fu = labF.get(u, _INF)
            bu = labB.get(u, _INF)
            if fu < _INF:
                for v in outs.get(u, ()):
                    if v in labF:
                        if fu < labF[v]:
                            labF[v] = fu
                            if v not in nxt_set:
                                nxt.append(v)
                                nxt_set.add(v)
                    elif fu < extF.get(v, _INF):
                        extF[v] = fu
            if bu < _INF:
                for v in ins.get(u, ()):
                    if v in labB:
                        if bu < labB[v]:
                            labB[v] = bu
                            if v not in nxt_set:
                                nxt.append(v)
                                nxt_set.add(v)
                    elif bu < extB.get(v, _INF):
                        extB[v] = bu
        work, in_work = nxt, nxt_set

    owned_nodes = list(labF.keys())
    ext_nodes = sorted(set(extF) | set(extB))
    n_own, n_ext = len(owned_nodes), len(ext_nodes)
    nodes_out = np.empty(n_own + n_ext, dtype=np.int64)
    f_out = np.empty(n_own + n_ext, dtype=np.int64)
    b_out = np.empty(n_own + n_ext, dtype=np.int64)
    chg = np.zeros(n_own + n_ext, dtype=np.int64)
    owned_flag = np.zeros(n_own + n_ext, dtype=np.int8)
    for i, n in enumerate(owned_nodes):
        nodes_out[i] = n
        f_out[i] = labF[n]
        b_out[i] = labB[n]
        owned_flag[i] = 1
        if labF[n] < prevF.get(n, _INF) or labB[n] < prevB.get(n, _INF):
            chg[i] = 1
    for j, n in enumerate(ext_nodes):
        nodes_out[n_own + j] = n
        f_out[n_own + j] = extF.get(n, _INF)
        b_out[n_own + j] = extB.get(n, _INF)
    return pa.table({"node": pa.array(nodes_out), "fwd": pa.array(f_out),
                     "bwd": pa.array(b_out), "changed": pa.array(chg),
                     "owned": pa.array(owned_flag)})


def _propagate_fwbw(edges_ds, src: str, dst: str, max_rounds: int = 64):
    """Fused forward+backward min-label propagation to fixpoint.

    Labels start at (node, node); each round co-partitions label rows with
    both-endpoint edge copies by node-id-range bucket and runs the fused local
    fixpoint. Rounds ≈ cross-bucket diameter. Returns (node, fwd, bwd) for all
    vertices of ``edges_ds``."""

    def tag_edges(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False)
        d = batch[dst].to_numpy(zero_copy_only=False)
        bs = s >> _BUCKET_SHIFT
        bd = d >> _BUCKET_SHIFT
        cross = bs != bd  # ship a 2nd copy to the dst bucket only when it differs
        bucket = np.concatenate([bs, bd[cross]])
        node = np.concatenate([s, s[cross]])
        other = np.concatenate([d, d[cross]])
        n = len(bucket)
        return pa.table({
            "bucket": pa.array(bucket, pa.int64()),
            "kind": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            "node": pa.array(node, pa.int64()),
            "other": pa.array(other, pa.int64()),
            "fwd": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "bwd": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "prev_owned": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
        })

    def init_labels(batch: pa.Table) -> pa.Table:
        # vertex init from edge rows: both endpoints, label = own id; duplicates
        # collapse inside the bucket-local pass (min semantics)
        s = batch[src].to_numpy(zero_copy_only=False)
        d = batch[dst].to_numpy(zero_copy_only=False)
        n = np.concatenate([s, d])
        return pa.table({
            "bucket": pa.array(n >> _BUCKET_SHIFT, pa.int64()),
            "kind": pa.array(np.zeros(len(n), dtype=np.int8), pa.int8()),
            "node": pa.array(n, pa.int64()),
            "other": pa.array(np.zeros(len(n), dtype=np.int64), pa.int64()),
            "fwd": pa.array(n, pa.int64()),
            "bwd": pa.array(n, pa.int64()),
            "prev_owned": pa.array(np.ones(len(n), dtype=np.int8), pa.int8()),
        })

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(n >> _BUCKET_SHIFT, pa.int64()),
            "kind": pa.array(np.zeros(len(n), dtype=np.int8), pa.int8()),
            "node": batch["node"],
            "other": pa.array(np.zeros(len(n), dtype=np.int64), pa.int64()),
            "fwd": batch["fwd"],
            "bwd": batch["bwd"],
            "prev_owned": batch["owned"].cast(pa.int8()),
        })

    edges_tagged = snapshot(edges_ds.map_batches(tag_edges, batch_format="pyarrow"))
    labels = None
    for rnd in range(max_rounds):
        if labels is None:
            tagged = concat_blocks(
                edges_ds.map_batches(init_labels, batch_format="pyarrow"),
                edges_tagged)
        else:
            tagged = concat_blocks(
                labels.map_batches(tag_labels, batch_format="pyarrow"),
                edges_tagged)
        labels = tagged.groupby("bucket").map_groups(_fwbw_round_local,
                                                     batch_format="pandas")
        labels = snapshot(labels)
        if labels.sum("changed") == 0 and rnd > 0:
            break
    else:
        # Mirror the peel-cap guard: an unconverged fwd/bwd fixpoint can split
        # one SCC into several (members still carrying fwd==bwd==self), which
        # would silently leave real cycles in the "DAG" downstream.
        if labels.sum("changed") != 0:
            raise RuntimeError(
                f"_propagate_fwbw did not converge in {max_rounds} rounds; "
                "raise max_rounds (graph diameter exceeds round budget)")
    # keep only OWNED rows (external candidates are round-internal transport;
    # at fixpoint they provably improve nothing — Σchanged == 0)
    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "fwd": b["fwd"], "bwd": b["bwd"]})
        .filter(pa.compute.equal(b["owned"], pa.scalar(1, pa.int8()))),
        batch_format="pyarrow")


def _trim_round_local(df):
    """map_groups body: one bucket's edge copies → edge copies surviving the
    bucket-local acyclic cascade.

    Each edge is shipped to bucket(src) AND bucket(dst) (one copy when equal,
    ``need`` records the copy count), so a bucket knows the COMPLETE in/out
    degree of every node in its id range. Classic SCC trimming — kill nodes
    with in-degree 0 or out-degree 0 (they cannot lie on a cycle), cascade —
    runs locally over the owned nodes; cross-bucket effects land next round via
    the vote count (an edge survives only if ALL its copies survive)."""
    from collections import defaultdict

    src_a = df["src"].to_numpy()
    dst_a = df["dst"].to_numpy()
    need_a = df["need"].to_numpy()
    bucket = int(df["bucket"].iloc[0])

    indeg = defaultdict(int)
    outdeg = defaultdict(int)
    inc = defaultdict(list)  # owned node -> incident edge idxs
    for i in range(len(src_a)):
        s, d = int(src_a[i]), int(dst_a[i])
        if s >> _BUCKET_SHIFT == bucket:
            outdeg[s] += 1
            inc[s].append(i)
        if d >> _BUCKET_SHIFT == bucket:
            indeg[d] += 1
            inc[d].append(i)

    alive = np.ones(len(src_a), dtype=bool)
    dead_nodes = set()
    work = [n for n in inc
            if (n >> _BUCKET_SHIFT == bucket) and (indeg[n] == 0 or outdeg[n] == 0)]
    dead_nodes.update(work)
    while work:
        n = work.pop()
        for i in inc[n]:
            if not alive[i]:
                continue
            alive[i] = False
            for m, deg in ((int(src_a[i]), outdeg), (int(dst_a[i]), indeg)):
                if m >> _BUCKET_SHIFT == bucket and m not in dead_nodes:
                    deg[m] -= 1
                    if indeg[m] == 0 or outdeg[m] == 0:
                        dead_nodes.add(m)
                        work.append(m)

    keep = np.where(alive)[0]
    killed_col = np.zeros(len(keep), dtype=np.int64)
    if len(keep) and dead_nodes:
        killed_col[0] = len(dead_nodes)
    elif dead_nodes:
        # all copies died — still report the kill via a sentinel row the vote
        # reduce drops (need=0 never matches a count)
        return pa.table({"src": pa.array([0], pa.int64()),
                         "dst": pa.array([0], pa.int64()),
                         "need": pa.array([0], pa.int8()),
                         "killed": pa.array([len(dead_nodes)], pa.int64())})
    return pa.table({"src": pa.array(src_a[keep].astype(np.int64)),
                     "dst": pa.array(dst_a[keep].astype(np.int64)),
                     "need": pa.array(need_a[keep].astype(np.int8)),
                     "killed": pa.array(killed_col)})


def _vote_reduce(df):
    """Per hash-bucket: keep edges whose surviving-copy count equals ``need``."""
    src_a = df["src"].to_numpy().astype(np.int64)
    dst_a = df["dst"].to_numpy().astype(np.int64)
    need_a = df["need"].to_numpy().astype(np.int64)
    order = np.lexsort((dst_a, src_a))
    ss, dd = src_a[order], dst_a[order]
    boundaries = np.concatenate([[True], (ss[1:] != ss[:-1]) | (dd[1:] != dd[:-1])])
    grp = np.cumsum(boundaries) - 1
    counts = np.bincount(grp)
    firsts = np.where(boundaries)[0]
    ok = counts == need_a[order][firsts]
    sel = order[firsts[ok]]
    return pa.table({"src": pa.array(src_a[sel]), "dst": pa.array(dst_a[sel]),
                     "need": pa.array(need_a[sel].astype(np.int8))})


def _trim_acyclic(edges, src: str, dst: str, num_partitions: int,
                  max_rounds: int = 12):
    """Iteratively remove provably-acyclic nodes before FW-BW peeling. Without
    this, every chain prefix costs one full peel round (fwd-min ≠ bwd-min along
    chains). One round = ONE fused bucket-local cascade over both directions
    (each edge shipped to both endpoint buckets) + ONE vote-count reduce — two
    shuffles total, replacing the round-1 design's per-direction join/count
    ladder (~8 barriers/round)."""

    def fanout(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        bs = s >> _BUCKET_SHIFT
        bd = d >> _BUCKET_SHIFT
        cross = bs != bd
        need = np.where(cross, 2, 1).astype(np.int8)
        return pa.table({
            "bucket": pa.array(np.concatenate([bs, bd[cross]]), pa.int64()),
            "src": pa.array(np.concatenate([s, s[cross]]), pa.int64()),
            "dst": pa.array(np.concatenate([d, d[cross]]), pa.int64()),
            "need": pa.array(np.concatenate([need, need[cross]]), pa.int8()),
        })

    def vote_bucket(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((s * np.uint64(1099511628211) ^ d) * np.uint64(0x9E3779B97F4A7C15)
             >> np.uint64(17)).astype(np.int64) % num_partitions
        return batch.append_column("vbucket", pa.array(h, pa.int64()))

    for _ in range(max_rounds):
        if edges.count() == 0:
            break
        local = snapshot(edges.map_batches(fanout, batch_format="pyarrow")
                         .groupby("bucket").map_groups(_trim_round_local,
                                                       batch_format="pandas"))
        # convergence from the stage's own output (no extra count/compare pass;
        # the final stable round also skips its vote-reduce shuffle entirely)
        if int(local.sum("killed") or 0) == 0:
            break
        voted = local.map_batches(vote_bucket, batch_format="pyarrow") \
                     .groupby("vbucket").map_groups(_vote_reduce,
                                                    batch_format="pandas")
        edges = snapshot(voted.map_batches(
            lambda b: pa.table({src: b["src"], dst: b["dst"]}),
            batch_format="pyarrow"))
    return edges


def _dedupe_edges(edges, src: str, dst: str, num_partitions: int):
    """Exact (src,dst) dedup via hash-bucket + per-bucket np.unique. Needed
    before trimming: the vote-count survival rule assumes one row per edge."""

    def bucketize(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((s * np.uint64(1099511628211) ^ d) * np.uint64(0x9E3779B97F4A7C15)
             >> np.uint64(17)).astype(np.int64) % num_partitions
        return pa.table({"vbucket": pa.array(h, pa.int64()),
                         src: batch[src], dst: batch[dst]})

    def uniq(df):
        s = df[src].to_numpy().astype(np.int64)
        d = df[dst].to_numpy().astype(np.int64)
        order = np.lexsort((d, s))
        ss, dd = s[order], d[order]
        first = np.concatenate([[True], (ss[1:] != ss[:-1]) | (dd[1:] != dd[:-1])])
        return pa.table({src: pa.array(ss[first]), dst: pa.array(dd[first])})

    return edges.map_batches(bucketize, batch_format="pyarrow") \
                .groupby("vbucket").map_groups(uniq, batch_format="pandas")


def _local_scc_arrays(s: "np.ndarray", d: "np.ndarray",
                      drop_singletons: bool):
    """Driver base case: iterative Tarjan over CSR arrays → (node, scc_id)
    with scc_id = min node id, size-1 SCCs dropped when requested. For
    ``drop_singletons=True`` this is exactly the distributed result (acyclic
    trimming never removes a node of a ≥2-node SCC)."""
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    n = len(nodes)
    ns, nd = inv[: len(s)], inv[len(s):]
    order = np.argsort(ns, kind="stable")
    heads = nd[order]
    offsets = np.zeros(n + 1, np.int64)
    np.add.at(offsets, ns + 1, 1)
    offsets = np.cumsum(offsets)

    index = np.full(n, -1, np.int64)
    low = np.zeros(n, np.int64)
    on_stack = np.zeros(n, bool)
    comp = np.full(n, -1, np.int64)
    stack: list = []
    next_index = 0
    n_comps = 0
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, int(offsets[root]))]
        index[root] = low[root] = next_index
        next_index += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, ei = work[-1]
            if ei < offsets[v + 1]:
                work[-1] = (v, ei + 1)
                w = int(heads[ei])
                if index[w] == -1:
                    index[w] = low[w] = next_index
                    next_index += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, int(offsets[w])))
                elif on_stack[w]:
                    if index[w] < low[v]:
                        low[v] = index[w]
            else:
                work.pop()
                if work:
                    pv = work[-1][0]
                    if low[v] < low[pv]:
                        low[pv] = low[v]
                if low[v] == index[v]:
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        comp[w] = n_comps
                        if w == v:
                            break
                    n_comps += 1
    roots = np.full(n_comps, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(roots, comp, nodes)
    scc_id = roots[comp]
    if drop_singletons:
        sizes = np.bincount(comp, minlength=n_comps)
        keep = sizes[comp] > 1
        return nodes[keep], scc_id[keep]
    return nodes, scc_id


def strongly_connected_components(edges_ds, src: str = "src", dst: str = "dst",
                                  *, num_partitions: int = 8,
                                  max_peel_rounds: int = 32,
                                  drop_singletons: bool = True,
                                  driver_finish_rows: int = 200_000):
    """Distributed SCC → Dataset (node, scc_id); scc_id = min node of the cycle
    (the reference's root_nid = min nid convention, -down/main.rs:544-663).
    Singleton components dropped by default (kosaraju.rs:87 parity).

    Pipeline: edge dedup → acyclic trimming (kills chains/trees — the vast
    majority of a waterway graph) → fused FW-BW min-label peeling on the cyclic
    core. Raises if the peel cap is hit with edges remaining (a partial result
    would silently leave cycles in "DAG" outputs downstream)."""
    import ray.data

    assigned = None  # union of per-round hits (stays distributed)
    edges = snapshot(_dedupe_edges(edges_ds.select_columns([src, dst]),
                                   src, dst, num_partitions))

    # driver base case (the connected_components pattern, graph.py): below the
    # threshold the iterative FW-BW rounds are pure shuffle overhead (measured
    # 7.4 s for a 4k-edge graph) — one local Tarjan is exact and instant.
    # Only for drop_singletons=True, where trimming cannot change the result.
    if drop_singletons and edges.count() <= driver_finish_rows:
        parts = list(edges.iter_batches(batch_format="pyarrow"))
        if not parts:
            return ray.data.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "scc_id": pa.array([], pa.int64())}))
        t = pa.concat_tables(parts)
        node, scc_id = _local_scc_arrays(
            t[src].to_numpy(zero_copy_only=False).astype(np.int64),
            t[dst].to_numpy(zero_copy_only=False).astype(np.int64),
            drop_singletons)
        return ray.data.from_arrow(pa.table({
            "node": pa.array(node, pa.int64()),
            "scc_id": pa.array(scc_id, pa.int64())}))

    edges = _trim_acyclic(edges, src, dst, num_partitions)

    for _ in range(max_peel_rounds):
        if edges.count() == 0:
            break
        both = _propagate_fwbw(edges, src, dst)
        hit = both.map_batches(
            lambda b: pa.table({"node": b["node"], "scc_id": b["fwd"]}).filter(
                pa.compute.equal(b["fwd"], b["bwd"])),
            batch_format="pyarrow")
        hit = snapshot(hit)
        n_hit = hit.count()
        if n_hit == 0:
            break
        assigned = hit if assigned is None else concat_blocks(assigned, hit)
        # peel: drop edges whose src or dst is assigned, then re-trim (peeling
        # an SCC exposes fresh acyclic tendrils that would otherwise cost full
        # FW-BW rounds)
        a_src = hit.map_batches(lambda b: pa.table({src: b["node"]}),
                                batch_format="pyarrow")
        a_dst = hit.map_batches(lambda b: pa.table({dst: b["node"]}),
                                batch_format="pyarrow")
        edges = cogroup_join(edges, a_src, (src,),
                             how="left_anti", num_partitions=num_partitions)
        edges = cogroup_join(edges, a_dst, (dst,),
                             how="left_anti", num_partitions=num_partitions)
        edges = snapshot(edges)
        edges = _trim_acyclic(edges, src, dst, num_partitions)
    else:
        if edges.count() > 0:
            raise RuntimeError(
                f"SCC peel cap ({max_peel_rounds} rounds) hit with "
                f"{edges.count()} edges unassigned — refusing to return a "
                "partial result (downstream contraction would keep cycles)")

    if assigned is None:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()), "scc_id": pa.array([], pa.int64())}))
    all_assigned = assigned
    if drop_singletons:
        from ray.data.aggregate import Count

        sizes = all_assigned.groupby("scc_id").aggregate(Count(alias_name="n"))
        # single explicit projection (select_columns after a filtering
        # map_batches misreports schema() in Ray 2.49)
        keep = sizes.map_batches(
            lambda b: pa.table({"scc_id": b.filter(
                pa.compute.greater(b["n"], pa.scalar(1, pa.int64())))["scc_id"]}),
            batch_format="pyarrow")
        all_assigned = cogroup_join(all_assigned, keep, ("scc_id",), how="inner",
                                    num_partitions=num_partitions)
    return all_assigned


# ------------------------------------------------------------------- G13 flow

def _flow_group(df, split_equally: bool):
    """map_groups body: one weak component's edges → per-edge upstream_m.

    Columns in: src, dst, length_m, tagid (int; -1 = None/untagged). Returns
    edge rows (src, dst, length_m, upstream_m); per-node upstream values are
    re-derivable by callers as the node's in-edge Σ(upstream_m + length_m)."""
    import pandas as pd
    from collections import defaultdict, deque

    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    length = df["length_m"].to_numpy()
    tag = df["tagid"].to_numpy() if "tagid" in df.columns else np.full(len(src), -1)
    if split_equally:
        tag = np.full(len(src), -1)

    outs = defaultdict(list)   # nid -> [(dst, tagid, length, edge_idx)]
    ins = defaultdict(list)    # nid -> [edge_idx]
    indeg = defaultdict(int)
    nodes = set()
    for i in range(len(src)):
        s, d = int(src[i]), int(dst[i])
        outs[s].append((d, int(tag[i]), float(length[i]), i))
        ins[d].append(i)
        indeg[d] += 1
        nodes.add(s)
        nodes.add(d)

    # Kahn topo order (deterministic: min-nid first — flow sums are commutative
    # so order only affects float rounding)
    import heapq

    frontier = [n for n in sorted(nodes) if indeg[n] == 0]
    heapq.heapify(frontier)
    edge_up = np.zeros(len(src), dtype=np.float64)
    tmp = defaultdict(float)
    seen = 0
    while frontier:
        nid = heapq.heappop(frontier)
        seen += 1
        curr = tmp.pop(nid, 0.0)
        o = outs.get(nid, [])
        if len(o) == 1:
            d, _t, ln, ei = o[0]
            tmp[d] += curr + ln
            edge_up[ei] = curr
        elif len(o) > 1:
            inflow = defaultdict(float)
            for ei in ins.get(nid, []):
                inflow[int(tag[ei])] += edge_up[ei] + float(length[ei])
            outs_per_group = defaultdict(int)
            for _d, t, _ln, _ei in o:
                outs_per_group[t] += 1
            outflow = {t: inflow.get(t, 0.0) / c for t, c in outs_per_group.items()}
            for t_in, amt in inflow.items():
                if t_in not in outs_per_group:
                    for t_out in outflow:
                        outflow[t_out] += amt / len(o)
            for d, t, _ln, ei in o:
                tmp[d] += outflow[t]
                edge_up[ei] = outflow[t]
        for d, _t, _ln, _ei in o:
            indeg[d] -= 1
            if indeg[d] == 0:
                heapq.heappush(frontier, d)
    if seen != len(nodes):
        raise ValueError("cycle detected in flow graph — contract SCCs first (G11)")
    cols = ["src", "dst", "length_m"] + (["tagid"] if "tagid" in df.columns
                                         else [])
    out = df[cols].copy()
    out["upstream_m"] = edge_up
    return out


def upstream_flow(edges_ds, *, split_equally: bool = True,
                  num_partitions: int = 8, checkpoint=None,
                  distributed: Optional[bool] = None,
                  max_group_rows: int = 200_000):
    """G13 over a DAG edge Dataset (src, dst, length_m[, tagid]).

    Two execution paths with identical semantics:

    - ``map_groups`` (many small components): weak components labeled with G1,
      each component's walk one task — components in parallel, intra-component
      order sequential by data dependency (the reference is fully sequential).
    - ``distributed`` (giant component): level-synchronous bucket-local rounds
      (stages/levelflow.py) — no task ever holds a whole component. Chosen
      automatically when the largest weak component exceeds ``max_group_rows``
      edges (a planet waterway graph is effectively ONE component)."""
    if distributed is None:
        from ray.data.aggregate import Count

        labels = connected_components(edges_ds, "src", "dst",
                                      num_partitions=num_partitions,
                                      checkpoint=checkpoint)
        sizes = labels.groupby("component_id").aggregate(Count(alias_name="n"))
        biggest = sizes.max("n") if sizes.count() else 0
        distributed = bool(biggest and biggest > max_group_rows)
    else:
        labels = None
    if distributed:
        from .levelflow import upstream_flow_distributed

        return upstream_flow_distributed(
            edges_ds, split_equally=split_equally,
            num_partitions=num_partitions, checkpoint=checkpoint)
    if labels is None:
        labels = connected_components(edges_ds, "src", "dst",
                                      num_partitions=num_partitions,
                                      checkpoint=checkpoint)
    lab = labels.select_columns(["node", "component_id"]).rename_columns(
        ["src", "component"])
    # cogroup_join, not the native Dataset.join: in a COMPOSED run (several
    # sequential joins per session) Ray 2.49's hash-join aggregator hits the
    # "multiple matches for key field" finalize bug cogroup_join exists for
    e = cogroup_join(edges_ds, lab, ("src",), how="inner",
                     num_partitions=num_partitions)
    return e.groupby("component").map_groups(
        lambda df: _flow_group(df, split_equally), batch_format="pandas")
