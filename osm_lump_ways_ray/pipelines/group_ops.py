"""Distributed wrappers for the per-component operators (G2-G9) — each runs as
``groupby((g, component)).map_groups`` over the labeled contracted-edge table.

Positions (r2 scale path, VERDICT r1 next-step 4): instead of broadcasting an
O(all-nodes) dict via ``ray.put``, the NEEDED node set per component (edge
endpoints + inter-chain nodes) is derived with the vectorized offsets idiom,
deduped, hash-joined against the narrow nodes table, and CO-GROUPED with the
edge rows into the same ``map_groups`` task (kind-tagged rows). Each task sees
only its own component's positions — volume proportional to the component, not
the graph.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.components import ComponentGraph
from ..stages.relational import bucket_agg, cogroup_join, concat_blocks, snapshot

#: Per-(g, component) edge-row budget for one in-memory map_groups task.
#: Components above it either auto-route to a distributed formulation
#: (compression) or fail loudly (ops whose reference semantics are inherently
#: one-graph-in-memory) instead of silently OOMing a worker on the planet
#: graph, which is effectively ONE giant component.
MAX_GROUP_ROWS = 200_000


def _labeled_edges(edges_g, labels, num_partitions: int = 8):
    """edges (g,u,v,inter_nids) ⋈ labels on (g, u) → + component_id."""
    lab = labels.rename_columns(["g", "u", "component_id"])
    return cogroup_join(edges_g.select_columns(["g", "u", "v", "inter_nids"]),
                        lab, ("g", "u"), how="inner",
                        num_partitions=num_partitions)


def _biggest_component_rows(e, num_partitions: int) -> int:
    """Max edge-row count over (g, component_id) — the pre-flight size probe.
    One combiner-backed aggregate; only the per-component COUNTS (not rows)
    reach the driver via ``max``."""
    sizes = bucket_agg(e.select_columns(["g", "component_id"]),
                       ["g", "component_id"], {"n_edges": (None, "count")},
                       num_partitions=num_partitions, combine=True)
    if sizes.count() == 0:
        return 0
    return int(sizes.max("n_edges"))


def _guard_group_sizes(e, max_group_rows: Optional[int], op: str,
                       num_partitions: int) -> None:
    """Fail LOUDLY (instead of OOMing a worker) when any component exceeds
    the in-memory budget. ``max_group_rows=None`` disables the probe for
    callers that have already measured."""
    if max_group_rows is None:
        return
    biggest = _biggest_component_rows(e, num_partitions)
    if biggest > max_group_rows:
        raise ValueError(
            f"{op}: largest component holds {biggest} edge rows "
            f"(> max_group_rows={max_group_rows}); one in-memory map_groups "
            f"task cannot hold a giant component. Compression "
            f"(component_compress_stats) auto-routes to its distributed "
            f"formulation, frames have the distributed "
            f"frames_skeleton_distributed path (hull-of-hulls + one keyed "
            f"multi-source SSSP pass — same module), and betweenness "
            f"auto-routes to its broadcast-compressed source-chunk fan-out "
            f"(_betweenness_giant) — raise max_group_rows only if each "
            f"worker's heap can hold the component.")


def _grouped_rows(edges_g, labels, nodes_ds, num_partitions: int = 8,
                  *, max_group_rows: Optional[int] = MAX_GROUP_ROWS,
                  op: str = "component op", _e=None):
    """Kind-tagged union of labeled edge rows (kind 0) and per-component node
    position rows (kind 1), ready for ``groupby(["g","component_id"])``.

    When ``nodes_ds`` is None only edge rows are emitted (ops that don't need
    geometry, e.g. G2 compression). Group sizes are probed first and a
    component above ``max_group_rows`` fails loudly (VERDICT r3 #3).
    ``_e`` short-circuits with an already-labeled (and already size-probed)
    edge table."""
    from .lump import chain_segments

    if _e is None:
        e = snapshot(_labeled_edges(edges_g, labels, num_partitions))
        _guard_group_sizes(e, max_group_rows, op, num_partitions)
    else:
        e = _e

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "g": batch["g"], "component_id": batch["component_id"],
            "kind": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
            "u": batch["u"], "v": batch["v"], "inter_nids": batch["inter_nids"],
            "node": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "lat": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "lon": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
        })

    if nodes_ds is None:
        return e.map_batches(edge_rows, batch_format="pyarrow")

    def needed(batch: pa.Table) -> pa.Table:
        # all chain nodes per edge: segments (a,b) cover u, inters and v
        a, b, eidx, seg_idx, carried = chain_segments(
            batch, carry=("g", "component_id"))
        g = carried["g"].to_numpy(zero_copy_only=False)
        c = carried["component_id"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([a, b])
        gg = np.concatenate([g, g])
        cc = np.concatenate([c, c])
        key = np.stack([gg, cc, nodes], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table({"g": pa.array(uniq[:, 0], pa.int64()),
                         "component_id": pa.array(uniq[:, 1], pa.int64()),
                         "node": pa.array(uniq[:, 2], pa.int64())})

    need = e.map_batches(needed, batch_format="pyarrow")
    need = bucket_agg(need, ["g", "component_id", "node"],
                      {"_c": (None, "count")},
                      num_partitions=num_partitions) \
        .select_columns(["g", "component_id", "node"])
    pos = nodes_ds.select_columns(["node_id", "lat", "lon"]).rename_columns(
        ["node", "lat", "lon"])
    npos = cogroup_join(need, pos, ("node",), how="inner",
                        num_partitions=num_partitions)

    def pos_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "g": batch["g"], "component_id": batch["component_id"],
            "kind": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            "u": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "v": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "inter_nids": pa.array([[]] * n, pa.list_(pa.int64())),
            "node": batch["node"], "lat": batch["lat"], "lon": batch["lon"],
        })

    return concat_blocks(
        e.map_batches(edge_rows, batch_format="pyarrow"),
        npos.map_batches(pos_rows, batch_format="pyarrow"))


def _map_components_partitioned(rows, fn, *, num_partitions: int = 8):
    """Apply a per-component pandas body over HASH PARTITIONS of components:
    ``groupby((g, component)).map_groups`` pays one Python task invocation per
    component (at 10^7 components that alone is the wall); here one task per
    partition sorts its rows and run-splits component boundaries, calling
    ``fn`` in-process per component (the degree_pillar/ways-assembly r3
    lever applied to the whole G2-G9 family)."""
    import pandas as pd

    def add_part(batch: pa.Table) -> pa.Table:
        g = batch["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["component_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = ((g * 1_000_003 + c) * 0x9E3779B1) % num_partitions
        return batch.append_column("_part", pa.array(part, pa.int64()))

    def per_part(df):
        df = df.sort_values(["g", "component_id"], kind="mergesort")
        g = df["g"].to_numpy()
        c = df["component_id"].to_numpy()
        newk = np.r_[True, (g[1:] != g[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(newk)
        ends = np.r_[starts[1:], len(df)]
        outs = [fn(df.iloc[s:e]) for s, e in zip(starts, ends)]
        if not outs:
            return pd.DataFrame()
        # empty per-component results still carry columns → concat keeps schema
        return pd.concat(outs, ignore_index=True)

    return rows.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pandas")


def _split_group(df):
    """(edges_df sorted, pos dict) from one kind-tagged component group."""
    edges = df[df["kind"] == 0].sort_values(["u", "v"])
    posrows = df[df["kind"] == 1]
    pos = {int(n): (int(la), int(lo))
           for n, la, lo in zip(posrows["node"], posrows["lat"], posrows["lon"])}
    return edges, pos


def _graph_of(edges_df) -> ComponentGraph:
    # deterministic construction: sorted edge rows → stable adjacency order
    return ComponentGraph.from_edge_rows(
        edges_df["u"].to_numpy(), edges_df["v"].to_numpy(),
        edges_df["inter_nids"].tolist() if "inter_nids" in edges_df else None)


def compress_stats_distributed(e, *, num_partitions: int = 8):
    """G2 stats WITHOUT per-component in-memory graphs — the giant-component
    path (VERDICT r3 next-step #2; semantics undirected_graph.rs:640-716).

    The sequential compress has a deterministic REMAINING-VERTEX COUNT even
    though the surviving vertex SET is order-dependent inside cycles:

    - terminals (degree != 2 in the deduped simple graph) always survive;
    - a maximal interior (all-degree-2) chain between DISTINCT terminals a,b
      contracts to one a-b edge; every FURTHER a-b connection (another chain,
      or a pre-existing direct edge) trips the parallel-edge undo and keeps
      exactly 1 interior vertex — a pair with c chains and d ∈ {0,1} direct
      edges keeps max(0, c-1+d) interiors;
    - a chain leaving and re-entering the SAME terminal (attached cycle)
      keeps exactly 2 interiors (the final contraction would form a t-t
      self-edge, which add_edge rejects);
    - an isolated cycle (whole component degree-2) keeps exactly 3 (triangle
      fixpoint: every remaining vertex's contraction would duplicate the
      opposite edge).

    Interior chains are G1-labeled over the interior-interior edge subset
    (chains never cross weak components, so ``g`` suffices as the CC group),
    making every step a bucketed aggregate or cogroup join — no task ever
    holds a whole component. Parity with the map_groups path is asserted in
    tests/test_group_ops.py over all four shapes."""
    from ..stages.graph import connected_components

    e = snapshot(e)

    # the in-memory graph is adjacency-SET (ComponentGraph.add_edge: parallel
    # rows collapse, self loops drop) — dedupe to the same simple graph
    def canon(batch: pa.Table) -> pa.Table:
        g = batch["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["component_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        m = lo != hi
        return pa.table({"g": pa.array(g[m], pa.int64()),
                         "component_id": pa.array(c[m], pa.int64()),
                         "a": pa.array(lo[m], pa.int64()),
                         "b": pa.array(hi[m], pa.int64())})

    edges = snapshot(bucket_agg(
        e.map_batches(canon, batch_format="pyarrow"),
        ["g", "component_id", "a", "b"], {"_c": (None, "count")},
        num_partitions=num_partitions, combine=True)
        .select_columns(["g", "component_id", "a", "b"]))

    def ends(batch: pa.Table) -> pa.Table:
        g = batch["g"].to_numpy(zero_copy_only=False)
        c = batch["component_id"].to_numpy(zero_copy_only=False)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({"g": pa.array(np.r_[g, g], pa.int64()),
                         "component_id": pa.array(np.r_[c, c], pa.int64()),
                         "node": pa.array(np.r_[a, b], pa.int64())})

    deg = snapshot(bucket_agg(
        edges.map_batches(ends, batch_format="pyarrow"), ["g", "node"],
        {"deg": (None, "count"), "component_id": ("component_id", "min")},
        num_partitions=num_partitions, combine=True))

    before = bucket_agg(deg.select_columns(["g", "component_id"]),
                        ["g", "component_id"],
                        {"vertices_before": (None, "count")},
                        num_partitions=num_partitions, combine=True)

    flags = snapshot(deg.map_batches(
        lambda b: pa.table({
            "g": b["g"], "node": b["node"],
            "is_int": pa.array(
                (b["deg"].to_numpy(zero_copy_only=False) == 2)
                .astype(np.int8), pa.int8())}),
        batch_format="pyarrow"))

    lab = cogroup_join(edges, flags.rename_columns(["g", "a", "ia"]),
                       ("g", "a"), how="inner", num_partitions=num_partitions)
    lab = snapshot(cogroup_join(lab, flags.rename_columns(["g", "b", "ib"]),
                                ("g", "b"), how="inner",
                                num_partitions=num_partitions))

    def ii_edges(t: pa.Table) -> pa.Table:
        m = pa.array((t["ia"].to_numpy(zero_copy_only=False) == 1)
                     & (t["ib"].to_numpy(zero_copy_only=False) == 1))
        return t.filter(m).select(["g", "a", "b"])

    def attach_rows(t: pa.Table) -> pa.Table:
        g = t["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["component_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ia = t["ia"].to_numpy(zero_copy_only=False) == 1
        ib = t["ib"].to_numpy(zero_copy_only=False) == 1
        ma, mb = ia & ~ib, ib & ~ia
        return pa.table({
            "g": pa.array(np.r_[g[ma], g[mb]], pa.int64()),
            "component_id": pa.array(np.r_[c[ma], c[mb]], pa.int64()),
            "node": pa.array(np.r_[a[ma], b[mb]], pa.int64()),
            "term": pa.array(np.r_[b[ma], a[mb]], pa.int64()),
        })

    def direct_pairs(t: pa.Table) -> pa.Table:
        m = pa.array((t["ia"].to_numpy(zero_copy_only=False) == 0)
                     & (t["ib"].to_numpy(zero_copy_only=False) == 0))
        return t.filter(m).select(["g", "component_id", "a", "b"])

    # G1 over interior-interior edges → chain/cycle labels (icc = min node);
    # interiors with no interior neighbour are singleton chains (icc = self)
    ii = snapshot(lab.map_batches(ii_edges, batch_format="pyarrow"))
    icc = connected_components(ii, "a", "b", "g",
                               num_partitions=num_partitions) \
        .rename_columns(["g", "node", "icc"])
    int_nodes = deg.map_batches(
        lambda b: b.filter(pa.array(
            b["deg"].to_numpy(zero_copy_only=False) == 2))
        .select(["g", "node", "component_id"]),
        batch_format="pyarrow")
    li = cogroup_join(int_nodes, icc, ("g", "node"), how="left_outer",
                      num_partitions=num_partitions)
    labels_int = snapshot(li.map_batches(
        lambda t: pa.table({"g": t["g"], "component_id": t["component_id"],
                            "node": t["node"],
                            "icc": pc.coalesce(t["icc"], t["node"])
                            .cast(pa.int64())}),
        batch_format="pyarrow"))

    at = lab.map_batches(attach_rows, batch_format="pyarrow")
    at = cogroup_join(at, labels_int.select_columns(["g", "node", "icc"]),
                      ("g", "node"), how="inner",
                      num_partitions=num_partitions)
    at_agg = snapshot(bucket_agg(
        at, ["g", "icc"],
        {"amin": ("term", "min"), "amax": ("term", "max"),
         "component_id": ("component_id", "min")},
        num_partitions=num_partitions, combine=True))

    icc_all = bucket_agg(labels_int.select_columns(["g", "icc", "component_id"]),
                         ["g", "icc"], {"component_id": ("component_id", "min")},
                         num_partitions=num_partitions, combine=True)
    iso = cogroup_join(icc_all, at_agg.select_columns(["g", "icc"]),
                       ("g", "icc"), how="left_anti",
                       num_partitions=num_partitions)

    # ---- contribution rows (g, component_id, after) → one grouped sum
    def term_contrib(b: pa.Table) -> pa.Table:
        t = b.filter(pa.array(b["deg"].to_numpy(zero_copy_only=False) != 2))
        return pa.table({"g": t["g"], "component_id": t["component_id"],
                         "after": pa.array(np.ones(len(t), np.int64),
                                           pa.int64())})

    def self_contrib(t: pa.Table) -> pa.Table:
        m = pa.array(t["amin"].to_numpy(zero_copy_only=False)
                     == t["amax"].to_numpy(zero_copy_only=False))
        f = t.filter(m)
        return pa.table({"g": f["g"], "component_id": f["component_id"],
                         "after": pa.array(np.full(len(f), 2, np.int64),
                                           pa.int64())})

    def iso_contrib(t: pa.Table) -> pa.Table:
        return pa.table({"g": t["g"], "component_id": t["component_id"],
                         "after": pa.array(np.full(len(t), 3, np.int64),
                                           pa.int64())})

    chains = at_agg.map_batches(
        lambda t: (lambda f: pa.table({
            "g": f["g"], "component_id": f["component_id"],
            "a": f["amin"], "b": f["amax"]}))(
            t.filter(pa.array(t["amin"].to_numpy(zero_copy_only=False)
                              != t["amax"].to_numpy(zero_copy_only=False)))),
        batch_format="pyarrow")
    pair_agg = bucket_agg(chains, ["g", "a", "b"],
                          {"c": (None, "count"),
                           "component_id": ("component_id", "min")},
                          num_partitions=num_partitions, combine=True)
    direct = bucket_agg(lab.map_batches(direct_pairs, batch_format="pyarrow")
                        .select_columns(["g", "a", "b"]),
                        ["g", "a", "b"], {"d": (None, "count")},
                        num_partitions=num_partitions, combine=True)
    pd_j = cogroup_join(pair_agg, direct, ("g", "a", "b"), how="left_outer",
                        num_partitions=num_partitions)

    def kept_contrib(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.minimum(pc.coalesce(t["d"], pa.scalar(0, t["d"].type))
                       .cast(pa.int64()).to_numpy(zero_copy_only=False), 1)
        kept = np.maximum(0, c - 1 + d)
        return pa.table({"g": t["g"], "component_id": t["component_id"],
                         "after": pa.array(kept, pa.int64())})

    contribs = concat_blocks(
        deg.map_batches(term_contrib, batch_format="pyarrow"),
        at_agg.map_batches(self_contrib, batch_format="pyarrow"),
        iso.map_batches(iso_contrib, batch_format="pyarrow"),
        pd_j.map_batches(kept_contrib, batch_format="pyarrow"))
    after = bucket_agg(contribs, ["g", "component_id"],
                       {"vertices_after": ("after", "sum")},
                       num_partitions=num_partitions, combine=True)

    # every component has a contrib row (terminals, or an isolated cycle),
    # but keep the outer join + 0 fill as cheap insurance against empties
    out = cogroup_join(snapshot(before), after, ("g", "component_id"),
                       how="left_outer", num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({
            "g": t["g"], "component_id": t["component_id"],
            "vertices_before": t["vertices_before"].cast(pa.int64()),
            "vertices_after": pc.coalesce(
                t["vertices_after"], pa.scalar(0, t["vertices_after"].type))
            .cast(pa.int64())}),
        batch_format="pyarrow")


def component_compress_stats(edges_g, labels, *, num_partitions: int = 8,
                             max_group_rows: Optional[int] = MAX_GROUP_ROWS,
                             force_distributed: Optional[bool] = None,
                             grouped_rows=None):
    """G2 per component → (g, component_id, vertices_before, vertices_after).

    Auto-routes: components all under ``max_group_rows`` edge rows run the
    in-memory graph per ``map_groups`` task; otherwise the whole table goes
    through ``compress_stats_distributed`` (identical counts, parity-tested).
    ``force_distributed`` pins a path for A/B tests. ``grouped_rows`` reuses
    a pre-built (edge-rows-only) kind-tagged table — the size probe and the
    distributed route both read it directly."""
    e = (grouped_rows if grouped_rows is not None
         else snapshot(_labeled_edges(edges_g, labels, num_partitions)))
    if force_distributed is None:
        force_distributed = (
            max_group_rows is not None
            and _biggest_component_rows(e, num_partitions) > max_group_rows)
    if force_distributed:
        return compress_stats_distributed(
            e.select_columns(["g", "component_id", "u", "v"]),
            num_partitions=num_partitions)

    def fn(df):
        import pandas as pd

        edges, _pos = _split_group(df)
        g = _graph_of(edges)
        before = g.num_vertices()
        g.compress()
        return pd.DataFrame({
            "g": [int(df["g"].iloc[0])],
            "component_id": [int(df["component_id"].iloc[0])],
            "vertices_before": [before],
            "vertices_after": [g.num_vertices()],
        })

    rows = (grouped_rows if grouped_rows is not None
            else _grouped_rows(edges_g, labels, None, num_partitions, _e=e))
    return _map_components_partitioned(rows, fn, num_partitions=num_partitions)


def component_lines(edges_g, labels, nodes_ds, *, method: str = "random",
                    num_partitions: int = 8,
                    max_group_rows: Optional[int] = MAX_GROUP_ROWS,
                    with_geometry: bool = False, grouped_rows=None):
    """G4/G5 per component → path rows (g, component_id, line_idx, n_nodes,
    dist_ends_m — reference M11 sinuosity prop, main.rs:789-796).

    ``with_geometry`` adds per-path ``length_m`` (haversine along the
    inter-expanded polyline) and the e7 ``lats``/``lons`` — the
    ``--split-into-single-paths`` writer path (cli_args.rs:143-157;
    sinuosity = length_m / dist_ends_m, main.rs:789-796)."""

    def fn(df):
        import pandas as pd

        from ..functions.haversine import haversine_m_fp

        edges, pos = _split_group(df)
        g = _graph_of(edges)
        # into_lines_* CONSUME the graph (edges + inters) — geometry/length
        # come from a pristine twin
        ref = _graph_of(edges) if with_geometry else None
        lines = (g.into_lines_random() if method == "random"
                 else g.into_lines_as_crow_flies(pos))
        rows = []
        for i, line in enumerate(lines):
            dist_ends = None
            if pos and len(line) >= 2:
                a, b = pos[line[0]], pos[line[-1]]
                dist_ends = float(haversine_m_fp(
                    np.array([a[0]]), np.array([a[1]]),
                    np.array([b[0]]), np.array([b[1]]))[0])
            rec = [int(df["g"].iloc[0]), int(df["component_id"].iloc[0]),
                   i, len(line), dist_ends]
            if with_geometry:
                full = [line[0]]
                length = 0.0
                for a, b in zip(line, line[1:]):
                    full.extend(ref.expand(a, b)[1:])
                    length += ref.edge_length_m(a, b, pos)
                rec.append(length)
                rec.append([pos[n][0] for n in full])
                rec.append([pos[n][1] for n in full])
            rows.append(tuple(rec))
        cols = ["g", "component_id", "line_idx", "n_nodes", "dist_ends_m"]
        if with_geometry:
            cols += ["length_m", "lats", "lons"]
        return pd.DataFrame(rows, columns=cols)

    rows = grouped_rows if grouped_rows is not None else _grouped_rows(
        edges_g, labels, nodes_ds, num_partitions,
        max_group_rows=max_group_rows, op="component_lines")
    return _map_components_partitioned(rows, fn, num_partitions=num_partitions)


def component_frames(edges_g, labels, nodes_ds, *, num_partitions: int = 8,
                     max_group_rows: Optional[int] = MAX_GROUP_ROWS,
                     with_geometry: bool = False, grouped_rows=None):
    """G8 per component → frame line rows (g, component_id, frame_idx,
    n_nodes[, lats, lons]). ``with_geometry`` adds the frame line's e7
    fixed-point coordinates (the --output-frames writer path)."""

    def fn(df):
        import pandas as pd

        edges, pos = _split_group(df)
        g = _graph_of(edges)
        rows = []
        for i, line in enumerate(g.frames(pos)):
            rec = [int(df["g"].iloc[0]), int(df["component_id"].iloc[0]),
                   i, len(line)]
            if with_geometry:
                rec.append([pos[n][0] for n in line])
                rec.append([pos[n][1] for n in line])
            rows.append(tuple(rec))
        cols = ["g", "component_id", "frame_idx", "n_nodes"]
        if with_geometry:
            cols += ["lats", "lons"]
        return pd.DataFrame(rows, columns=cols)

    rows = grouped_rows if grouped_rows is not None else _grouped_rows(
        edges_g, labels, nodes_ds, num_partitions,
        max_group_rows=max_group_rows, op="component_frames")
    return _map_components_partitioned(rows, fn, num_partitions=num_partitions)


def component_betweenness(edges_g, labels, nodes_ds, *, max_nodes: int = 2000,
                          seed: int = 42, num_partitions: int = 8,
                          max_group_rows: Optional[int] = MAX_GROUP_ROWS,
                          source_chunks: int = 1, grouped_rows=None,
                          giant_source_chunks: int = 32, force=None):
    """G9 per component → per-edge (g, component_id, u, v, bc_value) with the
    reference's default 2000-node sampling cap (cli_args.rs:244-253).

    ``source_chunks > 1`` is the intra-component fan-out (the reference
    chunks Dijkstra sources across a thread pool + writer thread,
    main.rs:1029-1052): the component's rows replicate into ``source_chunks``
    groups, each task deterministically re-derives the SAME sample and
    processes only its source slice, and per-edge partials sum in one
    bucketed aggregate. Replication × parallelism is the trade a
    shared-memory thread pool gets for free; use it when ONE component
    dominates the wall (the planet waterway graph). Parity with
    ``source_chunks=1`` is exact (tests/test_group_ops.py).

    Components over ``max_group_rows`` AUTO-ROUTE to the giant path
    (``_betweenness_giant``): sample+compress once per component, broadcast
    the compressed graph via ``ray.put``, fan ``giant_source_chunks`` source
    slices as tasks against it, and sum per-edge partials in one bucketed
    aggregate — the sampling already bounds the COMPRESSED graph, so only the
    one-off build task sees the raw component (the reference's own memory
    shape: it holds the full graph in RAM for every run,
    src/graph/undirected_graph.rs:552-638). ``force`` ∈ {"local", "giant"}
    pins a path for parity tests."""

    def fn(df):
        import pandas as pd

        chunk = int(df["chunk"].iloc[0]) if "chunk" in df else 0
        edges, pos = _split_group(df)
        g = _graph_of(edges)
        # reference order (do_betweenness, main.rs:1060-1095): sample FIRST,
        # then spike-removal and compression with the sample as the keep-set
        sample = g.sample_vertexes(min(max_nodes, g.num_vertices()), pos, seed=seed)
        keep = set(sample)
        g.remove_spikes(never_remove=lambda n: n in keep)
        g.compress(never_remove=lambda n: n in keep)
        if g.is_empty():
            return pd.DataFrame(columns=["g", "component_id", "u", "v", "bc_value"])
        src_idx = (None if source_chunks <= 1
                   else range(chunk, len(sample), source_chunks))
        bc = g.betweenness(sample, pos, source_indices=src_idx)
        rows = [(int(df["g"].iloc[0]), int(df["component_id"].iloc[0]),
                 a, b, int(v)) for (a, b), v in sorted(bc.items())]
        return pd.DataFrame(rows, columns=["g", "component_id", "u", "v", "bc_value"])

    def run_local(rows):
        if source_chunks <= 1:
            return rows.groupby(["g", "component_id"]).map_groups(
                fn, batch_format="pandas")

        def replicate(batch: pa.Table) -> pa.Table:
            outs = []
            for ch in range(source_chunks):
                outs.append(batch.append_column(
                    "chunk", pa.array(np.full(len(batch), ch, np.int64),
                                      pa.int64())))
            return pa.concat_tables(outs)

        partial = rows.map_batches(replicate, batch_format="pyarrow") \
            .groupby(["g", "component_id", "chunk"]) \
            .map_groups(fn, batch_format="pandas")
        return bucket_agg(partial, ["g", "component_id", "u", "v"],
                          {"bc_value": ("bc_value", "sum")},
                          num_partitions=num_partitions, combine=True)

    if grouped_rows is not None:
        return run_local(grouped_rows)
    if force == "local" or max_group_rows is None:
        return run_local(_grouped_rows(
            edges_g, labels, nodes_ds, num_partitions,
            max_group_rows=max_group_rows, op="component_betweenness"))

    e = snapshot(_labeled_edges(edges_g, labels, num_partitions))
    if force == "giant":
        return _betweenness_giant(e, nodes_ds, max_nodes=max_nodes,
                                  seed=seed, num_partitions=num_partitions,
                                  giant_source_chunks=giant_source_chunks)
    if _biggest_component_rows(e, num_partitions) <= max_group_rows:
        return run_local(_grouped_rows(
            edges_g, labels, nodes_ds, num_partitions, max_group_rows=None,
            op="component_betweenness", _e=e))

    # mixed route: under-cap components stay on the in-memory path, over-cap
    # ones take the broadcast-compressed giant fan-out; same output schema
    sizes = bucket_agg(e.select_columns(["g", "component_id"]),
                       ["g", "component_id"], {"n_edges": (None, "count")},
                       num_partitions=num_partitions, combine=True)
    from ..stages.relational import vfilter
    big = vfilter(sizes, "n_edges", "greater", max_group_rows) \
        .select_columns(["g", "component_id"]).take_all()
    big_keys = {(r["g"], r["component_id"]) for r in big}
    big_g = np.array(sorted({k[0] for k in big_keys}), dtype=np.int64)
    big_c = np.array(sorted({k[1] for k in big_keys}), dtype=np.int64)

    def split(keep_big: bool):
        def fsplit(batch: pa.Table) -> pa.Table:
            g = batch["g"].to_numpy(zero_copy_only=False)
            c = batch["component_id"].to_numpy(zero_copy_only=False)
            m = np.isin(g, big_g) & np.isin(c, big_c)
            if len(big_keys) and m.any():
                # exact pair membership for the coarse mask's hits
                hit = np.flatnonzero(m)
                ok = np.fromiter(((g[i], c[i]) in big_keys for i in hit),
                                 dtype=bool, count=len(hit))
                m[hit] = ok
            return batch.filter(pa.array(m if keep_big else ~m))
        return fsplit

    outs = []
    e_small = snapshot(e.map_batches(split(False), batch_format="pyarrow"))
    if e_small.count():
        outs.append(run_local(_grouped_rows(
            edges_g, labels, nodes_ds, num_partitions, max_group_rows=None,
            op="component_betweenness", _e=e_small)))
    e_big = e.map_batches(split(True), batch_format="pyarrow")
    outs.append(_betweenness_giant(e_big, nodes_ds, max_nodes=max_nodes,
                                   seed=seed, num_partitions=num_partitions,
                                   giant_source_chunks=giant_source_chunks))
    return concat_blocks(*outs) if len(outs) > 1 else outs[0]


def _betweenness_giant(e, nodes_ds, *, max_nodes: int, seed: int,
                       num_partitions: int, giant_source_chunks: int):
    """Giant-component G9 (VERDICT r4 next-step #3): source-chunked fan-out
    against a broadcast COMPRESSED component.

    Shape: (1) ONE build task per component assembles the graph, K7-samples,
    spike-removes and compresses with the sample as keep-set — byte-identical
    code to the in-memory path, so parity is exact by construction — and
    emits only the COMPRESSED edges (with precomputed integer-cm lengths) and
    the ordered sample; (2) those bounded rows come to the driver and are
    ``ray.put`` ONCE; (3) ``giant_source_chunks`` tasks per component each
    rebuild the small compressed graph from the broadcast and run their
    source-index slice (the pair set partitions exactly across slices, so
    partials SUM to the full run); (4) one bucketed aggregate reduces
    per-edge partials. Only the build task ever holds a raw component — the
    reference's own bound (it runs the whole planet graph in one process,
    src/graph/undirected_graph.rs:552-638); the O(sample²) Dijkstra wall,
    which dominates, fans out against the compressed broadcast."""
    import ray
    import ray.data

    rows = _grouped_rows(None, None, nodes_ds, num_partitions,
                         max_group_rows=None, op="betweenness_giant", _e=e)

    def build(df):
        import pandas as pd

        edges, pos = _split_group(df)
        g = _graph_of(edges)
        sample = g.sample_vertexes(min(max_nodes, g.num_vertices()), pos,
                                   seed=seed)
        keep = set(sample)
        g.remove_spikes(never_remove=lambda n: n in keep)
        g.compress(never_remove=lambda n: n in keep)
        gid = int(df["g"].iloc[0])
        cid = int(df["component_id"].iloc[0])
        out = []
        if not g.is_empty():
            for a, b in g.edges():
                out.append((gid, cid, 0, a, b,
                            int(round(g.edge_length_m(a, b, pos) * 100))))
            for i, n in enumerate(sample):
                out.append((gid, cid, 1, i, n, 0))
        return pd.DataFrame(
            out, columns=["g", "component_id", "kind", "a", "b", "len_cm"])

    compressed = rows.groupby(["g", "component_id"]).map_groups(
        build, batch_format="pandas").take_all()

    graphs = {}
    for r in compressed:
        key = (int(r["g"]), int(r["component_id"]))
        rec = graphs.setdefault(key, {"edges": [], "sample": []})
        if r["kind"] == 0:
            rec["edges"].append((int(r["a"]), int(r["b"]), int(r["len_cm"])))
        else:
            rec["sample"].append((int(r["a"]), int(r["b"])))
    payload = {}
    items = []
    for key, rec in graphs.items():
        rec["sample"].sort()
        payload[key] = (rec["edges"],
                        [n for _i, n in rec["sample"]])
        nch = max(1, min(giant_source_chunks, len(rec["sample"])))
        for ch in range(nch):
            items.append({"g": key[0], "component_id": key[1],
                          "chunk": ch, "nch": nch})
    empty = pa.table({"g": pa.array([], pa.int64()),
                      "component_id": pa.array([], pa.int64()),
                      "u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "bc_value": pa.array([], pa.int64())})
    if not items:
        return ray.data.from_arrow(empty)
    ref = ray.put(payload)

    def run_chunk(batch: pa.Table) -> pa.Table:
        data = ray.get(ref)
        outs = [empty]
        for gid, cid, ch, nch in zip(
                batch["g"].to_pylist(), batch["component_id"].to_pylist(),
                batch["chunk"].to_pylist(), batch["nch"].to_pylist()):
            edges, sample = data[(gid, cid)]
            g = ComponentGraph()
            elc = {}
            for a, b, lc in edges:
                g.add_edge(a, b)
                elc[(a, b)] = lc
            bc = g.betweenness(sample, None,
                               source_indices=range(ch, len(sample), nch),
                               edge_len_cm=elc)
            ks = sorted(bc)
            outs.append(pa.table({
                "g": pa.array(np.full(len(ks), gid, np.int64)),
                "component_id": pa.array(np.full(len(ks), cid, np.int64)),
                "u": pa.array([a for a, _b in ks], pa.int64()),
                "v": pa.array([b for _a, b in ks], pa.int64()),
                "bc_value": pa.array([int(bc[k]) for k in ks], pa.int64()),
            }))
        return pa.concat_tables(outs)

    partial = ray.data.from_items(items).map_batches(
        run_chunk, batch_format="pyarrow", batch_size=1)
    return bucket_agg(partial, ["g", "component_id", "u", "v"],
                      {"bc_value": ("bc_value", "sum")},
                      num_partitions=num_partitions, combine=True)


def component_dijkstra(edges_g, labels, *, len_mod: int = 13, chord_mod: int = 29,
                       num_partitions: int = 8,
                       max_group_rows: Optional[int] = MAX_GROUP_ROWS,
                       grouped_rows=None):
    """G6 per component → single-source shortest-path distances from the MIN
    vertex to every vertex (g, component_id, node, dist_cm).

    Edge weight (cm) = ``min(u,v) % len_mod + 1`` — deterministic from the ids
    so a SQL oracle can recompute it. To exercise real relaxation (not just a
    path walk) a CHORD edge (min_vertex ↔ max_vertex, weight
    ``min_vertex % chord_mod + 3``) is added whenever the component has ≥ 3
    vertices; Dijkstra (dij.rs:24-54 semantics) must then pick per node the
    cheaper of the forward walk and the chord + backward walk.
    """

    def fn(df):
        import pandas as pd

        edges, _pos = _split_group(df)
        g = _graph_of(edges)
        verts = sorted(g.adj)
        src, dst = verts[0], verts[-1]
        elen = {}
        for a, b in g.edges():
            elen[(a, b)] = a % len_mod + 1
        if len(verts) >= 3 and (src, dst) not in elen:
            g.add_edge(src, dst, [])
            elen[(src, dst)] = src % chord_mod + 3
        dists = g.dijkstra(src, elen)
        rows = [(int(df["g"].iloc[0]), int(df["component_id"].iloc[0]),
                 int(n), int(d)) for n, (_p, d) in sorted(dists.items())
                if d != float("inf")]
        return pd.DataFrame(rows, columns=["g", "component_id", "node", "dist_cm"])

    rows = grouped_rows if grouped_rows is not None else _grouped_rows(
        edges_g, labels, None, num_partitions,
        max_group_rows=max_group_rows, op="component_dijkstra")
    return _map_components_partitioned(rows, fn, num_partitions=num_partitions)


def component_astar(edges_g, labels, nodes_ds, *, num_partitions: int = 8,
                    max_group_rows: Optional[int] = MAX_GROUP_ROWS,
                    grouped_rows=None):
    """G7 per component → A* path (haversine heuristic, dij.rs:84-202) from
    the MIN vertex to the MIDDLE vertex → (g, component_id, seq, node).

    Targeting the middle vertex exercises early termination: on a path
    component only the first half of the chain is emitted."""

    def fn(df):
        import pandas as pd

        edges, pos = _split_group(df)
        g = _graph_of(edges)
        verts = sorted(g.adj)
        src, dst = verts[0], verts[len(verts) // 2]
        path = g.astar_path(src, dst, pos) or []
        return pd.DataFrame({
            "g": np.full(len(path), int(df["g"].iloc[0]), dtype=np.int64),
            "component_id": np.full(len(path), int(df["component_id"].iloc[0]),
                                    dtype=np.int64),
            "seq": np.arange(len(path), dtype=np.int64),
            "node": np.asarray(path, dtype=np.int64),
        })

    rows = grouped_rows if grouped_rows is not None else _grouped_rows(
        edges_g, labels, nodes_ds, num_partitions,
        max_group_rows=max_group_rows, op="component_astar")
    return _map_components_partitioned(rows, fn, num_partitions=num_partitions)


def component_spikes(edges_g, labels, *, pin_mod: int = 5,
                     num_partitions: int = 8,
                     max_group_rows: Optional[int] = MAX_GROUP_ROWS,
                     grouped_rows=None):
    """G3 per component → the edges surviving iterative spike removal
    (undirected_graph.rs:718-754) with ``never_remove = node % pin_mod == 0``
    (the reference pins waterway sinks the same way, -down/main.rs G3 use).
    On a path component the result is the sub-path between the first and last
    pinned vertices (empty when fewer than two pinned vertices remain joined).
    """

    def fn(df):
        import pandas as pd

        edges, _pos = _split_group(df)
        g = _graph_of(edges)
        g.remove_spikes(never_remove=lambda n: n % pin_mod == 0)
        kept = sorted(g.edges())
        return pd.DataFrame({
            "g": np.full(len(kept), int(df["g"].iloc[0]), dtype=np.int64),
            "component_id": np.full(len(kept), int(df["component_id"].iloc[0]),
                                    dtype=np.int64),
            "u": np.asarray([a for a, _ in kept], dtype=np.int64),
            "v": np.asarray([b for _, b in kept], dtype=np.int64),
        })

    rows = grouped_rows if grouped_rows is not None else _grouped_rows(
        edges_g, labels, None, num_partitions,
        max_group_rows=max_group_rows, op="component_spikes")
    return _map_components_partitioned(rows, fn, num_partitions=num_partitions)


def component_hull_dedup(edges_g, labels, nodes_ds, *, grid: int = 1_000_000,
                         num_partitions: int = 8,
                         max_group_rows: Optional[int] = MAX_GROUP_ROWS,
                         grouped_rows=None):
    """D4 per component → hull-input position dedup stats after snapping
    positions to a ``grid`` lattice (forces duplicates so the dedup path is
    actually exercised): (g, component_id, n_vertices, n_unique_pos,
    winner_sum) where winner_sum = Σ of the first-node-wins representatives
    (way_group.rs:94-98; adjacency insertion order is ascending on a sorted
    edge list, so the winner per position is its MIN node id)."""

    def fn(df):
        import pandas as pd

        edges, pos = _split_group(df)
        g = _graph_of(edges)
        snapped = {n: (la // grid, lo // grid) for n, (la, lo) in pos.items()}
        pts = g.dedup_hull_points(snapped)
        return pd.DataFrame({
            "g": [int(df["g"].iloc[0])],
            "component_id": [int(df["component_id"].iloc[0])],
            "n_vertices": [g.num_vertices()],
            "n_unique_pos": [len(pts)],
            "winner_sum": [int(sum(pts.values()))],
        })

    rows = grouped_rows if grouped_rows is not None else _grouped_rows(
        edges_g, labels, nodes_ds, num_partitions,
        max_group_rows=max_group_rows, op="component_hull_dedup")
    return _map_components_partitioned(rows, fn, num_partitions=num_partitions)


# ──────────────────── G8 giant-component path: distributed frames skeleton

def frames_skeleton_distributed(edges_ds, nodes_ds, *, u_col: str = "u",
                                v_col: str = "v", w_col: str = "w",
                                id_col: str = "node_id",
                                num_partitions: int = 8,
                                max_hull: int = 64, max_rounds: int = 64):
    """G8 frames for a component too big for one in-memory task: the FRAME
    SKELETON as a Dataset — every edge lying on a shortest path between some
    pair of convex-hull nodes.

    Fully distributed pipeline: hull-of-hulls (bounded collect of hull
    vertices) → ONE keyed multi-source SSSP pass (all hull sources advance in
    the same rounds — stages/graph.sssp_multi) → per-node distance VECTORS
    (one int64 column per hull node, pivoted partition-wise) joined onto both
    edge endpoints → vectorized tightness test
    ``∃(s,t): d_s(u) + w + d_t(v) = D(s,t)`` per batch.

    DOCUMENTED DIVERGENCE from the in-memory ``ComponentGraph.frames``
    (components.py): the reference unions ONE A*-chosen path per hull pair
    (way_group.rs:76-154) and then line-decomposes; with tied shortest paths
    the skeleton here is the union over ALL tying paths (a superset). On
    tie-free weights the edge sets are identical (parity-tested). Weights
    must be positive integers.
    """
    import ray
    import ray.data

    from ..stages.graph import sssp_multi
    from ..stages.relational import (bucket_agg, cogroup_join, concat_blocks,
                                     snapshot)
    from ..stages.spatial import convex_hull_distributed

    hull_rows = convex_hull_distributed(nodes_ds, id_col=id_col).take_all()
    hull = sorted(int(r[id_col]) for r in hull_rows)
    if len(hull) > max_hull:
        raise ValueError(
            f"frames_skeleton_distributed: hull has {len(hull)} vertices "
            f"(> max_hull={max_hull}); the SSSP state is |hull|×|nodes| rows "
            "— sample the hull (K7 farthest-point sampling) before calling")
    H = len(hull)
    if H == 0:
        z = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table({u_col: z, v_col: z, w_col: z}))
    hull_arr = np.array(hull, dtype=np.int64)

    edges = snapshot(edges_ds.map_batches(
        lambda b: pa.table({"src": b[u_col].cast(pa.int64()),
                            "dst": b[v_col].cast(pa.int64()),
                            "w": b[w_col].cast(pa.int64())}),
        batch_format="pyarrow"))
    directed = concat_blocks(edges, edges.map_batches(
        lambda b: pa.table({"src": b["dst"], "dst": b["src"], "w": b["w"]}),
        batch_format="pyarrow"))
    sources = ray.data.from_arrow(pa.table({
        "source": pa.array(hull_arr, pa.int64()),
        "node": pa.array(hull_arr, pa.int64())}))
    dist = snapshot(sssp_multi(directed, sources,
                               num_partitions=num_partitions,
                               max_rounds=max_rounds))

    INF = np.iinfo(np.int64).max // 4
    # bounded collect: hull-to-hull distance matrix (H² values)
    dmat = np.full((H, H), INF, np.int64)
    hull_set_ref = ray.put(hull_arr)

    def only_hull(b: pa.Table) -> pa.Table:
        n = b["node"].to_numpy(zero_copy_only=False)
        ha = ray.get(hull_set_ref)
        idx = np.searchsorted(ha, n)
        np.minimum(idx, H - 1, out=idx)
        return b.filter(pa.array(ha[idx] == n))

    for r in dist.map_batches(only_hull, batch_format="pyarrow") \
            .take_all():
        si = int(np.searchsorted(hull_arr, r["source"]))
        ti = int(np.searchsorted(hull_arr, r["node"]))
        dmat[si, ti] = r["dist"]

    dcols = [f"d{i}" for i in range(H)]

    def pivot_part(df):
        node = df["node"].to_numpy()
        src = df["source"].to_numpy()
        dst_ = df["dist"].to_numpy()
        uniq, inv = np.unique(node, return_inverse=True)
        mat = np.full((len(uniq), H), INF, np.int64)
        mat[inv, np.searchsorted(hull_arr, src)] = dst_
        out = {"node": pa.array(uniq, pa.int64())}
        for i, c in enumerate(dcols):
            out[c] = pa.array(mat[:, i], pa.int64())
        return pa.table(out)

    from ..stages.relational import map_groups_partitioned

    # partition by node hash; each partition pivots vectorized (one pandas
    # frame per PARTITION — pivot_part handles all its nodes at once)
    def add_part(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False)
        p = ((n.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             >> np.uint64(17)).astype(np.int64) % num_partitions
        return batch.append_column("_part", pa.array(p, pa.int64()))

    dvec = dist.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(
            lambda df: pivot_part(df.drop(columns=["_part"])),
            batch_format="pandas")

    u_side = dvec.rename_columns(["src"] + [f"u{c}" for c in dcols])
    v_side = dvec.rename_columns(["vnode"] + [f"v{c}" for c in dcols])
    j = cogroup_join(edges, u_side, ("src",), how="inner",
                     num_partitions=num_partitions)
    j = cogroup_join(
        j.map_batches(lambda b: b.append_column(
            "vnode", b["dst"]), batch_format="pyarrow"),
        v_side, ("vnode",), how="inner", num_partitions=num_partitions)
    dref = ray.put(dmat)

    def tight(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            z = pa.array([], pa.int64())
            return pa.table({u_col: z, v_col: z, w_col: z})
        du = np.stack([b[f"ud{i}"].to_numpy(zero_copy_only=False)
                       for i in range(H)], axis=1)
        dv = np.stack([b[f"vd{i}"].to_numpy(zero_copy_only=False)
                       for i in range(H)], axis=1)
        w = b["w"].to_numpy(zero_copy_only=False)
        D = ray.get(dref)
        hit = (du[:, :, None] + dv[:, None, :] + w[:, None, None]
               == D[None, :, :]).any(axis=(1, 2))
        idx = pa.array(np.flatnonzero(hit))
        return pa.table({u_col: b["src"].take(idx),
                         v_col: b["dst"].take(idx),
                         w_col: b["w"].take(idx)})

    return j.map_batches(tight, batch_format="pyarrow")
