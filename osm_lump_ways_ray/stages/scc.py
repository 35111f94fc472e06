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
  reference, which is single-threaded here). Giant components beyond one block
  need the level-synchronous fallback (documented, not yet implemented).
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

def _propagate_round_local(df):
    """map_groups body: one bucket's label rows + edge rows → locally-fixpointed
    labels plus cross-bucket push candidates.

    Rows: kind 0 = label (node, other=-, label); kind 1 = edge (node=src,
    other=dst). Runs a worklist min-propagation over the LOCAL subgraph, so a
    chain living in one bucket collapses in a single round (bucketing is by
    node-id range → spatially/sequentially local graphs converge in ~1-2
    cross-bucket rounds instead of diameter rounds)."""
    import pandas as pd
    from collections import defaultdict

    kind = df["kind"].to_numpy()
    node = df["node"].to_numpy()
    other = df["other"].to_numpy()
    label_col = df["label"].to_numpy()

    lab: dict[int, int] = {}
    adj = defaultdict(list)
    for i in range(len(kind)):
        if kind[i] == 0:
            n = int(node[i])
            l = int(label_col[i])
            if n not in lab or l < lab[n]:
                lab[n] = l
        else:
            adj[int(node[i])].append(int(other[i]))

    # local fixpoint: push min labels along local edges until stable
    work = list(lab.keys())
    external: dict[int, int] = {}
    while work:
        nxt = []
        for u in work:
            lu = lab.get(u)
            if lu is None:
                continue
            for v in adj.get(u, ()):
                if v in lab:
                    if lu < lab[v]:
                        lab[v] = lu
                        nxt.append(v)
                else:
                    # dst's label row lives in another bucket → emit candidate
                    if v not in external or lu < external[v]:
                        external[v] = lu
        work = nxt

    nodes_out = list(lab.keys()) + list(external.keys())
    labels_out = list(lab.values()) + list(external.values())
    # Arrow out (pandas blocks trip Ray's Project fusion on rename downstream)
    return pa.table({"node": pa.array(np.asarray(nodes_out, dtype=np.int64)),
                     "label": pa.array(np.asarray(labels_out, dtype=np.int64))})


_BUCKET_SHIFT = 6  # 64 consecutive node ids per bucket (locality-preserving)


def _propagate_min(edges_ds, labels_ds, src: str, dst: str,
                   num_partitions: int, max_rounds: int = 64):
    """Iterate label(dst) = min(label(dst), label(src)) to fixpoint.

    Each round: co-partition labels + edges by a RANGE bucket of the node id
    (``node >> 6``), run a local worklist fixpoint per bucket
    (``groupby(bucket).map_groups``), then a global ``groupby(node).min``.
    Rounds needed ≈ cross-bucket diameter, not node diameter. Convergence:
    Σlabel strictly decreases until stable (labels only ever shrink)."""
    from ray.data.aggregate import Min, Sum

    def tag_labels(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(n >> _BUCKET_SHIFT, pa.int64()),
            "kind": pa.array(np.zeros(len(n), dtype=np.int8), pa.int8()),
            "node": batch["node"],
            "other": pa.array(np.zeros(len(n), dtype=np.int64), pa.int64()),
            "label": batch["label"],
        })

    def tag_edges(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(s >> _BUCKET_SHIFT, pa.int64()),
            "kind": pa.array(np.ones(len(s), dtype=np.int8), pa.int8()),
            "node": batch[src],
            "other": batch[dst],
            "label": pa.array(np.zeros(len(s), dtype=np.int64), pa.int64()),
        })

    edges_tagged = snapshot(edges_ds.map_batches(tag_edges, batch_format="pyarrow"))
    prev_sum = None
    labels = labels_ds
    for _ in range(max_rounds):
        tagged = concat_blocks(
            labels.map_batches(tag_labels, batch_format="pyarrow"), edges_tagged)
        cand = tagged.groupby("bucket").map_groups(_propagate_round_local,
                                                   batch_format="pandas")
        labels = cand.groupby("node").aggregate(Min("label", alias_name="label"))
        labels = snapshot(labels)
        s = labels.sum("label")
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
    return labels


def _trim_dir_group(df, trim_out: bool):
    """map_groups body: one bucket's edges → surviving edges + killed-node rows.

    Bucketed by the OWNED endpoint (src for out-trim, dst for in-trim), so a
    node's entire out-degree (resp. in-degree) is locally known and degree-0
    nodes cascade-kill within the bucket — a chain living in one id-range
    bucket dies in a single round (classic SCC trimming, made bucket-local).
    Output rows: kind 0 = surviving edge (src, dst); kind 1 = killed node."""
    import pandas as pd
    from collections import defaultdict

    src_a = df["src"].to_numpy()
    dst_a = df["dst"].to_numpy()
    own = src_a if trim_out else dst_a
    other = dst_a if trim_out else src_a
    bucket = int(own[0]) >> _BUCKET_SHIFT

    deg = defaultdict(int)       # owned-endpoint degree (out for out-trim)
    rev = defaultdict(list)      # other-endpoint (local) -> edge idxs
    alive = np.ones(len(src_a), dtype=bool)
    local_nodes = set()
    for i in range(len(src_a)):
        deg[int(own[i])] += 1
        local_nodes.add(int(own[i]))
        o = int(other[i])
        if o >> _BUCKET_SHIFT == bucket:
            rev[o].append(i)

    # seed: local nodes appearing ONLY as the other endpoint have local degree 0
    killed = []
    work = [n for n in (set(rev.keys()) - local_nodes)]
    seen_killed = set(work)
    while work:
        n = work.pop()
        killed.append(n)
        for i in rev.get(n, ()):
            if not alive[i]:
                continue
            alive[i] = False
            m = int(own[i])
            deg[m] -= 1
            if deg[m] == 0 and m not in seen_killed:
                seen_killed.add(m)
                work.append(m)

    surv = np.where(alive)[0]
    k = len(killed)
    return pa.table({
        "kind": pa.array(np.concatenate([np.zeros(len(surv), dtype=np.int8),
                                         np.ones(k, dtype=np.int8)])),
        "src": pa.array(np.concatenate([src_a[surv].astype(np.int64),
                                        np.asarray(killed, dtype=np.int64)])),
        "dst": pa.array(np.concatenate([dst_a[surv].astype(np.int64),
                                        np.zeros(k, dtype=np.int64)])),
    })


def _trim_acyclic(edges, src: str, dst: str, num_partitions: int,
                  max_rounds: int = 10):
    """Iteratively remove provably-acyclic nodes before FW-BW peeling. Without
    this, every chain prefix costs one full peel round (fwd-min ≠ bwd-min along
    chains). Per round and direction: (1) bucket-local degree-0 cascade (kills
    whole id-local chains at once), (2) a global anti-join layer for
    cross-bucket dangling nodes (distinct dsts never appearing as src, and
    vice versa)."""

    for _ in range(max_rounds):
        n_before = edges.count()
        if n_before == 0:
            return edges
        for trim_out in (True, False):
            own = src if trim_out else dst
            anti_col = dst if trim_out else src

            def bucketize(batch: pa.Table, _own=own) -> pa.Table:
                o = batch[_own].to_numpy(zero_copy_only=False)
                return pa.table({
                    "bucket": pa.array(o >> _BUCKET_SHIFT, pa.int64()),
                    "src": batch[src], "dst": batch[dst],
                })

            out = edges.map_batches(bucketize, batch_format="pyarrow") \
                       .groupby("bucket").map_groups(
                           lambda df, _t=trim_out: _trim_dir_group(df, _t),
                           batch_format="pandas")
            out = snapshot(out)
            killed = out.map_batches(
                lambda b, _a=anti_col: pa.table({_a: b.filter(
                    pa.compute.equal(b["kind"], pa.scalar(1, pa.int8())))["src"]}),
                batch_format="pyarrow")
            killed = snapshot(killed)
            surv = out.map_batches(
                lambda b: (lambda f: pa.table({"src": f["src"], "dst": f["dst"]}))(
                    b.filter(pa.compute.equal(b["kind"], pa.scalar(0, pa.int8())))),
                batch_format="pyarrow")
            if killed.count():
                edges = cogroup_join(surv, killed, (anti_col,), how="left_anti",
                                     num_partitions=num_partitions)
                edges = snapshot(edges)
            else:
                edges = snapshot(surv)
            if edges.count() == 0:
                return edges
            # global layer: nodes appearing only on the dead side
            dead = cogroup_join(
                distinct(edges.map_batches(
                    lambda b, _a=anti_col: pa.table({"node": b[_a]}),
                    batch_format="pyarrow"), "node"),
                distinct(edges.map_batches(
                    lambda b, _o=own: pa.table({"node": b[_o]}),
                    batch_format="pyarrow"), "node"),
                ("node",), how="left_anti", num_partitions=num_partitions)
            dead = dead.map_batches(
                lambda b, _a=anti_col: pa.table({_a: b["node"]}),
                batch_format="pyarrow")
            dead = snapshot(dead)
            if dead.count():
                edges = snapshot(cogroup_join(edges, dead, (anti_col,), how="left_anti",
                                              num_partitions=num_partitions))
        if edges.count() == n_before:
            break
    return edges


def strongly_connected_components(edges_ds, src: str = "src", dst: str = "dst",
                                  *, num_partitions: int = 8,
                                  max_peel_rounds: int = 8,
                                  drop_singletons: bool = True):
    """Distributed SCC → Dataset (node, scc_id); scc_id = min node of the cycle
    (the reference's root_nid = min nid convention, -down/main.rs:544-663).
    Singleton components dropped by default (kosaraju.rs:87 parity).

    Pipeline: acyclic trimming (kills chains/trees — the vast majority of a
    waterway graph) → FW-BW min-label peeling on the cyclic core."""
    import ray.data

    assigned = None  # union of per-round hits (stays distributed)
    edges = snapshot(edges_ds.select_columns([src, dst]))
    edges = _trim_acyclic(edges, src, dst, num_partitions)

    for _ in range(max_peel_rounds):
        if edges.count() == 0:
            break
        verts = distinct(concat_blocks(
            edges.map_batches(lambda b: pa.table({"node": b[src]}),
                              batch_format="pyarrow"),
            edges.map_batches(lambda b: pa.table({"node": b[dst]}),
                              batch_format="pyarrow")), "node")
        init = verts.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow")
        init = snapshot(init)
        fwd = _propagate_min(edges, init, src, dst, num_partitions)
        bwd = _propagate_min(edges, init, dst, src, num_partitions)
        both = cogroup_join(fwd.rename_columns(["node", "fwd"]),
                            bwd.rename_columns(["node", "bwd"]),
                            ("node",), how="inner", num_partitions=num_partitions)
        hit = both.map_batches(
            lambda b: pa.table({"node": b["node"], "scc_id": b["fwd"]}).filter(
                pa.compute.equal(b["fwd"], b["bwd"])),
            batch_format="pyarrow")
        hit = snapshot(hit)
        n_hit = hit.count()
        if n_hit == 0:
            break
        assigned = hit if assigned is None else concat_blocks(assigned, hit)
        # peel: drop edges whose src or dst is assigned
        a_src = hit.map_batches(lambda b: pa.table({src: b["node"]}),
                                batch_format="pyarrow")
        a_dst = hit.map_batches(lambda b: pa.table({dst: b["node"]}),
                                batch_format="pyarrow")
        edges = cogroup_join(edges, a_src, (src,),
                             how="left_anti", num_partitions=num_partitions)
        edges = cogroup_join(edges, a_dst, (dst,),
                             how="left_anti", num_partitions=num_partitions)
        edges = snapshot(edges)

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
    out = df[["src", "dst", "length_m"]].copy()
    out["upstream_m"] = edge_up
    return out


def upstream_flow(edges_ds, *, split_equally: bool = True,
                  num_partitions: int = 8, checkpoint=None):
    """G13 over a DAG edge Dataset (src, dst, length_m[, tagid]).

    Weak components are labeled with G1, then each component's walk runs as one
    ``map_groups`` task — components in parallel, the intra-component order
    sequential by data dependency (the reference is fully sequential here)."""
    labels = connected_components(edges_ds, "src", "dst",
                                  num_partitions=num_partitions,
                                  checkpoint=checkpoint)
    lab = labels.select_columns(["node", "component_id"]).rename_columns(
        ["src", "component"])
    e = hash_join(edges_ds, lab, ("src",), how="inner",
                  num_partitions=num_partitions)
    return e.groupby("component").map_groups(
        lambda df: _flow_group(df, split_equally), batch_format="pandas")
