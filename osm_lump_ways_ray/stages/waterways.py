"""The directed "waterways" layer (osm-lump-ways-down): cycle contraction (G11),
loop features (G21), biggest-end assignment (G14), grouped-ends paths (G16 core),
upstream segment emission (G17), tag groups + stream levels (G18 core), longest
source→mouth (G19), through-path length (G20).

Distribution strategy mirrors SURVEY.md §7.2 step 7: the wide steps (relabel
joins, dedup, SCC) are Dataset ops; the order-dependent walks run per weak
component inside ``map_groups`` (components in parallel — the reference is
single-threaded for ALL of these, src/bin/osm-lump-ways-down/main.rs:805-1714).

Documented divergences from the reference:
- parallel edges after cycle contraction are deduped to the MIN length_m
  deterministically (the reference's surviving edge depends on HashMap
  iteration order — -down/main.rs:499-506 nondeterminism noted in SURVEY §7.5);
- self-loop edges produced by contraction are dropped (required for the DAG);
- G16 implements the core path assembly (assignment to ends, max-upstream
  in-edge continuation, distance cut) without the ends-tag CSV extras;
- G18 implements tagid flood fill, sources/sinks, and stream levels; the
  pairwise tributary/distributary classification (tag_group.rs:816-943) is left
  for a later round.
"""

from __future__ import annotations

import heapq
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from .relational import cogroup_join, snapshot
from .scc import strongly_connected_components
from .graph import connected_components


# ---------------------------------------------------------------------- G11

def contract_cycles(edges_ds, *, src: str = "src", dst: str = "dst",
                    length_col: str = "length_m", num_partitions: int = 8,
                    scc_labels=None):
    """Replace every SCC member by its cycle's min node (-down/main.rs:677-705)
    → loop-free DAG. Returns (dag_edges, scc_labels). Pass ``scc_labels`` to
    reuse an SCC result already computed in the same pipeline (loop features +
    contraction share one G10 run instead of two)."""
    from ray.data.aggregate import Min

    scc = scc_labels if scc_labels is not None else strongly_connected_components(
        edges_ds, src, dst, num_partitions=num_partitions)
    scc = snapshot(scc)
    rep_src = scc.map_batches(
        lambda b: pa.table({src: b["node"], "_rs": b["scc_id"]}),
        batch_format="pyarrow")
    rep_dst = scc.map_batches(
        lambda b: pa.table({dst: b["node"], "_rd": b["scc_id"]}),
        batch_format="pyarrow")
    e = cogroup_join(edges_ds, rep_src, (src,), how="left_outer",
                     num_partitions=num_partitions)
    e = cogroup_join(e, rep_dst, (dst,), how="left_outer",
                     num_partitions=num_partitions)

    def relabel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.coalesce(batch["_rs"], batch[src])
        d = pc.coalesce(batch["_rd"], batch[dst])
        keep = pc.invert(pc.equal(s, d))  # drop self loops (cycle-internal)
        t = pa.table({src: s, dst: d, length_col: batch[length_col]})
        return t.filter(keep)

    dag = e.map_batches(relabel, batch_format="pyarrow")
    # dedupe parallel edges deterministically (min length)
    dag = dag.groupby([src, dst]).aggregate(Min(length_col, alias_name=length_col))
    return snapshot(dag), scc


# ---------------------------------------------------------------------- G21

def loop_features(edges_ds, positions_ref, polygons=None, *,
                  src: str = "src", dst: str = "dst", num_partitions: int = 8,
                  scc_labels=None):
    """Per-SCC "loop" feature rows (-down/main.rs:544-663): root_nid = min nid,
    num_nodes, length_m (sum over cycle-internal segments), areas via the PIP
    geocoder (J5/T1) on the loop's min-node position. Pass ``scc_labels`` to
    reuse an SCC result computed once per pipeline (shared with G11)."""
    import ray

    scc = scc_labels if scc_labels is not None else strongly_connected_components(
        edges_ds, src, dst, num_partitions=num_partitions)
    scc = snapshot(scc)
    rep_src = scc.map_batches(
        lambda b: pa.table({src: b["node"], "_cs": b["scc_id"]}),
        batch_format="pyarrow")
    rep_dst = scc.map_batches(
        lambda b: pa.table({dst: b["node"], "_cd": b["scc_id"]}),
        batch_format="pyarrow")
    e = cogroup_join(edges_ds.select_columns([src, dst]), rep_src, (src,),
                     how="inner", num_partitions=num_partitions)
    e = cogroup_join(e, rep_dst, (dst,), how="inner",
                     num_partitions=num_partitions)

    def internal(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.equal(batch["_cs"], batch["_cd"])
        t = batch.filter(keep)
        return pa.table({"scc_id": t["_cs"], src: t[src], dst: t[dst]})

    cyc_edges = e.map_batches(internal, batch_format="pyarrow")

    def per_loop(df):
        import pandas as pd

        from ..functions.haversine import haversine_m_fp
        from .spatial import Polygon  # noqa: F401 (type only)

        pos = ray.get(positions_ref)
        nodes = sorted(set(df[src]) | set(df[dst]))
        lats = np.array([pos[n][0] for n in nodes], dtype=np.int64)
        lons = np.array([pos[n][1] for n in nodes], dtype=np.int64)
        la1 = np.array([pos[a][0] for a in df[src]], dtype=np.int64)
        lo1 = np.array([pos[a][1] for a in df[src]], dtype=np.int64)
        la2 = np.array([pos[b][0] for b in df[dst]], dtype=np.int64)
        lo2 = np.array([pos[b][1] for b in df[dst]], dtype=np.int64)
        length = float(np.sum(haversine_m_fp(la1, lo1, la2, lo2)))
        root = int(df["scc_id"].iloc[0])
        area = "unknown_area"
        if polygons:
            rl, rn = pos[root]
            for poly in polygons:
                if poly.contains(np.array([rl / 1e7]), np.array([rn / 1e7]))[0]:
                    area = poly.name
                    break
        return pd.DataFrame({
            "root_nid": [root],
            "num_nodes": [len(nodes)],
            "length_m": [length],
            "num_segments": [len(df)],
            "area": [area],
        })

    return cyc_edges.groupby("scc_id").map_groups(per_loop, batch_format="pandas")


# ------------------------------------------------------------------- G14/G16

def _component_walks(df, pos, *, max_dist_m: Optional[float]):
    """One weak component: reverse-topo walk implementing G14 (biggest-end
    assignment) + G16 core (grouped-ends path assembly).

    Input edge rows: src, dst, length_m, upstream_m. Returns
    (node rows: node, end_nid; path rows: end_nid, line_idx, n_nodes)."""
    outs = defaultdict(list)
    ins = defaultdict(list)
    indeg = defaultdict(int)
    outdeg = defaultdict(int)
    nodes = set()
    rows = list(zip(df["src"], df["dst"], df["length_m"], df["upstream_m"]))
    for s, d, ln, up in rows:
        s, d = int(s), int(d)
        outs[s].append((d, float(ln), float(up)))
        ins[d].append((s, float(ln), float(up)))
        outdeg[s] += 1
        indeg[d] += 1
        nodes.add(s)
        nodes.add(d)

    ends = sorted(n for n in nodes if outdeg[n] == 0)
    # end "upstream" = Σ in-edge (upstream + length) — reference to_upstream_m
    end_up = {e: sum(up + ln for _s, ln, up in ins[e]) for e in ends}

    # reverse Kahn from ends upward (G14: each node takes the downstream end
    # with max (end_upstream, -end_nid) — deterministic tie-break)
    assigned: Dict[int, int] = {e: e for e in ends}
    rem_out = dict(outdeg)
    frontier = list(ends)
    heapq.heapify(frontier)
    order = []  # reverse-topo order
    while frontier:
        n = heapq.heappop(frontier)
        order.append(n)
        if n not in assigned:
            best = max(((end_up[assigned[d]], -assigned[d])
                        for d, _ln, _up in outs[n] if d in assigned),
                       default=None)
            if best is not None:
                assigned[n] = -best[1]
        for s, _ln, _up in ins[n]:
            rem_out[s] -= 1
            if rem_out[s] == 0:
                heapq.heappush(frontier, s)

    # G16 core: build paths per end by walking UP the max-upstream in-edge,
    # cutting when the end assignment changes or max_dist_m is exceeded
    paths = []
    used = set()
    for n in order:  # ends first, then upstream nodes
        if n in used or (n not in assigned):
            continue
        if outdeg[n] != 0 and n not in [e for e in ends]:
            continue
        if outdeg[n] != 0:
            continue
        # walk upstream from this end
        line = [n]
        used.add(n)
        dist = 0.0
        cur = n
        while True:
            cands = [(up, s, ln) for s, ln, up in ins[cur]
                     if s not in used and assigned.get(s) == assigned[n]]
            if not cands:
                break
            up, s, ln = max(cands)
            if max_dist_m is not None and dist + ln > max_dist_m:
                break
            line.append(s)
            used.add(s)
            dist += ln
            cur = s
        paths.append((assigned[n], len(line), dist))
    return assigned, paths


def biggest_end_and_grouped_paths(dag_with_flow_ds, positions_ref=None, *,
                                  max_dist_m: Optional[float] = None,
                                  num_partitions: int = 8):
    """G14 + G16 over the flow-annotated DAG → (node, end_nid) assignment rows
    and per-end path rows. Weak components run in parallel."""
    import ray

    labels = connected_components(dag_with_flow_ds, "src", "dst",
                                  num_partitions=num_partitions)
    lab = labels.select_columns(["node", "component_id"]).rename_columns(
        ["src", "component"])
    e = cogroup_join(dag_with_flow_ds, lab, ("src",), how="inner",
                     num_partitions=num_partitions)

    def fn(df):
        import pandas as pd

        pos = ray.get(positions_ref) if positions_ref is not None else None
        assigned, paths = _component_walks(df, pos, max_dist_m=max_dist_m)
        nrows = pd.DataFrame({
            "kind": 0, "node": list(assigned.keys()),
            "end_nid": list(assigned.values()),
            "n_nodes": 0, "dist_m": 0.0,
        })
        prows = pd.DataFrame(
            [(1, -1, e, n, d) for e, n, d in paths],
            columns=["kind", "node", "end_nid", "n_nodes", "dist_m"])
        return pd.concat([nrows, prows], ignore_index=True)

    return e.groupby("component").map_groups(fn, batch_format="pandas")


# ---------------------------------------------------------------------- G17

def upstream_segments(flow_edges_ds, positions_ref, *, min_upstream_m: float = 0.0,
                      round_multiples: Tuple[int, ...] = ()):
    """Per-tiny-segment emission (-down/main.rs:1716-1888): each DAG edge
    expands to its inter chain; upstream accumulates along the chain from the
    edge's upstream_m; segments below ``min_upstream_m`` are filtered; optional
    round-to-multiple props (``from_upstream_m_N``, utils round_mult)."""
    import ray

    from ..functions.haversine import haversine_m_fp
    from ..functions.utils import round_mult

    def emit(batch: pa.Table) -> pa.Table:
        pos = ray.get(positions_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        ups = batch["upstream_m"].to_numpy(zero_copy_only=False)
        inters = (batch["inter_nids"].to_pylist()
                  if "inter_nids" in batch.column_names else [[]] * len(src))
        cols = defaultdict(list)
        for i in range(len(src)):
            chain = [int(src[i])] + [int(x) for x in inters[i]] + [int(dst[i])]
            up = float(ups[i])
            for a, b in zip(chain, chain[1:]):
                seg = float(haversine_m_fp(
                    np.array([pos[a][0]]), np.array([pos[a][1]]),
                    np.array([pos[b][0]]), np.array([pos[b][1]]))[0])
                if up >= min_upstream_m:
                    cols["a"].append(a)
                    cols["b"].append(b)
                    cols["from_upstream_m"].append(up)
                    cols["to_upstream_m"].append(up + seg)
                    for m in round_multiples:
                        cols[f"from_upstream_m_{m}"].append(int(round_mult(up, m)))
                up += seg
        if not cols:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "from_upstream_m": pa.array([], pa.float64()),
                             "to_upstream_m": pa.array([], pa.float64())})
        return pa.table({k: pa.array(v) for k, v in cols.items()})

    return flow_edges_ds.map_batches(emit, batch_format="pyarrow")


# ---------------------------------------------------------------------- G18

def _tag_group_component(df):
    """One weak component: flood-fill same-tagid connected edges → taggroupid
    (min src nid of the group, tag_group.rs:764-806), then per-group
    sources/sinks and stream levels (BFS from sinks ordered by upstream,
    tag_group.rs:96-548 core)."""
    import pandas as pd

    rows = list(zip(df["src"], df["dst"], df["tagid"]))
    adj = defaultdict(list)  # node -> [(edge_idx, other, tagid, is_out)]
    for i, (s, d, t) in enumerate(rows):
        adj[int(s)].append((i, int(d), int(t), True))
        adj[int(d)].append((i, int(s), int(t), False))

    group_of = [-1] * len(rows)
    groups: Dict[int, List[int]] = {}
    for i in range(len(rows)):
        if group_of[i] != -1:
            continue
        tid = int(rows[i][2])
        stack = [i]
        members = []
        group_of[i] = i
        while stack:
            e = stack.pop()
            members.append(e)
            for n in (int(rows[e][0]), int(rows[e][1])):
                for j, _o, t, _d in adj[n]:
                    if t == tid and group_of[j] == -1:
                        group_of[j] = i
                        stack.append(j)
        gid = min(min(int(rows[e][0]), int(rows[e][1])) for e in members)
        groups[gid] = members
        for e in members:
            group_of[e] = gid

    # per group: sources (no in-edge within group), sinks (no out-edge within)
    out_rows = []
    sink_groups = []
    for gid, members in groups.items():
        srcs = {int(rows[e][0]) for e in members}
        dsts = {int(rows[e][1]) for e in members}
        sources = sorted(srcs - dsts)
        sinks = sorted(dsts - srcs)
        tagid = int(rows[members[0]][2])
        out_rows.append([gid, tagid, len(members), len(sources), len(sinks), -1])
        # group is terminal if any sink node has no outgoing edge at all
        if any(not any(d for _i, _o, _t, d in adj[n] if d) for n in sinks):
            sink_groups.append(gid)

    # stream levels: BFS over the group graph from terminal groups (level 1)
    touch = defaultdict(set)  # node -> gids touching it
    for gid, members in groups.items():
        for e in members:
            touch[int(rows[e][0])].add(gid)
            touch[int(rows[e][1])].add(gid)
    ggraph = defaultdict(set)
    for gids in touch.values():
        for a in gids:
            for b in gids:
                if a != b:
                    ggraph[a].add(b)
    level = {g: 1 for g in sink_groups}
    frontier = sorted(sink_groups)
    while frontier:
        nxt = []
        for g in frontier:
            for nb in sorted(ggraph[g]):
                if nb not in level:
                    level[nb] = level[g] + 1
                    nxt.append(nb)
        frontier = nxt
    for r in out_rows:
        r[5] = level.get(r[0], -1)
    return pd.DataFrame(out_rows, columns=["taggroupid", "tagid", "num_segments",
                                           "num_sources", "num_sinks",
                                           "stream_level"])


def tag_groups(dag_edges_ds, *, num_partitions: int = 8):
    """G18 core over a tagid-annotated DAG edge table → per-taggroup rows."""
    labels = connected_components(dag_edges_ds, "src", "dst",
                                  num_partitions=num_partitions)
    lab = labels.select_columns(["node", "component_id"]).rename_columns(
        ["src", "component"])
    e = cogroup_join(dag_edges_ds, lab, ("src",), how="inner",
                     num_partitions=num_partitions)
    return e.groupby("component").map_groups(_tag_group_component,
                                             batch_format="pandas")


# ---------------------------------------------------------------------- G19/G20

def _longest_source_mouth_component(df):
    """One weak component (longest_source_mouth.rs:44-315 core): mouths =
    out-degree-0 nodes; per mouth, Dijkstra upstream with edge length_m costs;
    the farthest source is the river system's source; emit per-mouth rows."""
    import pandas as pd

    ins = defaultdict(list)
    outdeg = defaultdict(int)
    nodes = set()
    for s, d, ln in zip(df["src"], df["dst"], df["length_m"]):
        s, d = int(s), int(d)
        ins[d].append((s, float(ln)))
        outdeg[s] += 1
        nodes.add(s)
        nodes.add(d)
    mouths = sorted(n for n in nodes if outdeg[n] == 0)
    rows = []
    for mouth in mouths:
        dist = {mouth: 0.0}
        prev = {}
        frontier = [(0.0, mouth)]
        while frontier:
            dcur, cur = heapq.heappop(frontier)
            if dcur > dist.get(cur, float("inf")):
                continue
            for s, ln in ins.get(cur, ()):
                nd = dcur + ln
                if nd < dist.get(s, float("inf")):
                    dist[s] = nd
                    prev[s] = cur
                    heapq.heappush(frontier, (nd, s))
        if len(dist) == 1:
            continue
        source = max(dist.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        # path length source→mouth = dist[source]
        n_path = 1
        cur = source
        while cur != mouth:
            cur = prev[cur]
            n_path += 1
        rows.append((mouth, source, dist[source], n_path))
    return pd.DataFrame(rows, columns=["mouth_nid", "source_nid",
                                       "river_system_length_m", "path_nodes"])


def longest_source_mouth(dag_edges_ds, *, top_n: Optional[int] = None,
                         num_partitions: int = 8):
    """G19: per-mouth longest upstream path; optional global top-N (K5)."""
    labels = connected_components(dag_edges_ds, "src", "dst",
                                  num_partitions=num_partitions)
    lab = labels.select_columns(["node", "component_id"]).rename_columns(
        ["src", "component"])
    e = cogroup_join(dag_edges_ds, lab, ("src",), how="inner",
                     num_partitions=num_partitions)
    out = e.groupby("component").map_groups(_longest_source_mouth_component,
                                            batch_format="pandas")
    if top_n is not None:
        out = out.sort("river_system_length_m", descending=True).limit(top_n)
    return out


# ---------------------------------------------------------------------- G20

def _through_path_component(df):
    """One weak component: longest source→sink shortest-path length
    (calc_through_path_length, -down/main.rs:2231-2263)."""
    import pandas as pd

    outs = defaultdict(list)
    indeg = defaultdict(int)
    outdeg = defaultdict(int)
    nodes = set()
    for s, d, ln in zip(df["src"], df["dst"], df["length_m"]):
        s, d = int(s), int(d)
        outs[s].append((d, float(ln)))
        outdeg[s] += 1
        indeg[d] += 1
        nodes.add(s)
        nodes.add(d)
    sources = sorted(n for n in nodes if indeg[n] == 0)
    best = 0.0
    for src0 in sources:
        dist = {src0: 0.0}
        frontier = [(0.0, src0)]
        while frontier:
            dcur, cur = heapq.heappop(frontier)
            if dcur > dist.get(cur, float("inf")):
                continue
            for d, ln in outs.get(cur, ()):
                nd = dcur + ln
                if nd < dist.get(d, float("inf")):
                    dist[d] = nd
                    heapq.heappush(frontier, (nd, d))
        for n, dd in dist.items():
            if outdeg[n] == 0 and dd > best:
                best = dd
    comp = int(df["component"].iloc[0]) if "component" in df else -1
    return pd.DataFrame({"component": [comp], "through_path_m": [best]})


def through_path_length(dag_edges_ds, *, num_partitions: int = 8):
    """G20: per weak component, the longest source→sink shortest-path length."""
    labels = connected_components(dag_edges_ds, "src", "dst",
                                  num_partitions=num_partitions)
    lab = labels.select_columns(["node", "component_id"]).rename_columns(
        ["src", "component"])
    e = cogroup_join(dag_edges_ds, lab, ("src",), how="inner",
                     num_partitions=num_partitions)
    return e.groupby("component").map_groups(_through_path_component,
                                             batch_format="pandas")
