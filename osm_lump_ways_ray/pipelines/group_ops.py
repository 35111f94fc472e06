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

from ..stages.components import ComponentGraph
from ..stages.relational import bucket_agg, cogroup_join, concat_blocks, snapshot


def _labeled_edges(edges_g, labels, num_partitions: int = 8):
    """edges (g,u,v,inter_nids) ⋈ labels on (g, u) → + component_id."""
    lab = labels.rename_columns(["g", "u", "component_id"])
    return cogroup_join(edges_g.select_columns(["g", "u", "v", "inter_nids"]),
                        lab, ("g", "u"), how="inner",
                        num_partitions=num_partitions)


def _grouped_rows(edges_g, labels, nodes_ds, num_partitions: int = 8):
    """Kind-tagged union of labeled edge rows (kind 0) and per-component node
    position rows (kind 1), ready for ``groupby(["g","component_id"])``.

    When ``nodes_ds`` is None only edge rows are emitted (ops that don't need
    geometry, e.g. G2 compression)."""
    from .lump import chain_segments

    e = snapshot(_labeled_edges(edges_g, labels, num_partitions))

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


def component_compress_stats(edges_g, labels, *, num_partitions: int = 8):
    """G2 per component → (g, component_id, vertices_before, vertices_after)."""

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

    rows = _grouped_rows(edges_g, labels, None, num_partitions)
    return rows.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")


def component_lines(edges_g, labels, nodes_ds, *, method: str = "random",
                    num_partitions: int = 8):
    """G4/G5 per component → path rows (g, component_id, line_idx, n_nodes,
    dist_ends_m — reference M11 sinuosity prop, main.rs:789-796)."""

    def fn(df):
        import pandas as pd

        from ..functions.haversine import haversine_m_fp

        edges, pos = _split_group(df)
        g = _graph_of(edges)
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
            rows.append((int(df["g"].iloc[0]), int(df["component_id"].iloc[0]),
                         i, len(line), dist_ends))
        return pd.DataFrame(rows, columns=["g", "component_id", "line_idx",
                                           "n_nodes", "dist_ends_m"])

    rows = _grouped_rows(edges_g, labels, nodes_ds, num_partitions)
    return rows.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")


def component_frames(edges_g, labels, nodes_ds, *, num_partitions: int = 8):
    """G8 per component → frame line rows (g, component_id, frame_idx, n_nodes)."""

    def fn(df):
        import pandas as pd

        edges, pos = _split_group(df)
        g = _graph_of(edges)
        rows = []
        for i, line in enumerate(g.frames(pos)):
            rows.append((int(df["g"].iloc[0]), int(df["component_id"].iloc[0]),
                         i, len(line)))
        return pd.DataFrame(rows, columns=["g", "component_id", "frame_idx", "n_nodes"])

    rows = _grouped_rows(edges_g, labels, nodes_ds, num_partitions)
    return rows.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")


def component_betweenness(edges_g, labels, nodes_ds, *, max_nodes: int = 2000,
                          seed: int = 42, num_partitions: int = 8):
    """G9 per component → per-edge (g, component_id, u, v, bc_value) with the
    reference's default 2000-node sampling cap (cli_args.rs:244-253)."""

    def fn(df):
        import pandas as pd

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
        bc = g.betweenness(sample, pos)
        rows = [(int(df["g"].iloc[0]), int(df["component_id"].iloc[0]),
                 a, b, int(v)) for (a, b), v in sorted(bc.items())]
        return pd.DataFrame(rows, columns=["g", "component_id", "u", "v", "bc_value"])

    rows = _grouped_rows(edges_g, labels, nodes_ds, num_partitions)
    return rows.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")


def component_dijkstra(edges_g, labels, *, len_mod: int = 13, chord_mod: int = 29,
                       num_partitions: int = 8):
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

    rows = _grouped_rows(edges_g, labels, None, num_partitions)
    return rows.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")


def component_astar(edges_g, labels, nodes_ds, *, num_partitions: int = 8):
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

    rows = _grouped_rows(edges_g, labels, nodes_ds, num_partitions)
    return rows.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")


def component_spikes(edges_g, labels, *, pin_mod: int = 5,
                     num_partitions: int = 8):
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

    rows = _grouped_rows(edges_g, labels, None, num_partitions)
    return rows.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")


def component_hull_dedup(edges_g, labels, nodes_ds, *, grid: int = 1_000_000,
                         num_partitions: int = 8):
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

    rows = _grouped_rows(edges_g, labels, nodes_ds, num_partitions)
    return rows.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")
