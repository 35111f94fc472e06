"""Distributed wrappers for the per-component operators (G2-G9) — each runs as
``groupby((g, component)).map_groups`` over the labeled contracted-edge table,
with node positions broadcast once via ``ray.put`` (scale path for huge runs:
join positions onto edge rows instead — documented in stages/components.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..stages.components import ComponentGraph
from ..stages.relational import cogroup_join


def _labeled_edges(edges_g, labels, num_partitions: int = 8):
    """edges (g,u,v,inter_nids) ⋈ labels on (g, u) → + component_id."""
    lab = labels.rename_columns(["g", "u", "component_id"])
    return cogroup_join(edges_g.select_columns(["g", "u", "v", "inter_nids"]),
                        lab, ("g", "u"), how="inner",
                        num_partitions=num_partitions)


def _graph_of(df) -> ComponentGraph:
    # deterministic construction: sorted edge rows → stable adjacency order
    df = df.sort_values(["u", "v"])
    return ComponentGraph.from_edge_rows(
        df["u"].to_numpy(), df["v"].to_numpy(),
        df["inter_nids"].tolist() if "inter_nids" in df else None)


def component_compress_stats(edges_g, labels, *, num_partitions: int = 8):
    """G2 per component → (g, component_id, vertices_before, vertices_after)."""

    def fn(df):
        import pandas as pd

        g = _graph_of(df)
        before = g.num_vertices()
        g.compress()
        return pd.DataFrame({
            "g": [int(df["g"].iloc[0])],
            "component_id": [int(df["component_id"].iloc[0])],
            "vertices_before": [before],
            "vertices_after": [g.num_vertices()],
        })

    e = _labeled_edges(edges_g, labels, num_partitions)
    return e.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")


def component_lines(edges_g, labels, pos_ref, *, method: str = "random",
                    num_partitions: int = 8):
    """G4/G5 per component → path rows (g, component_id, line_idx, n_nodes,
    dist_ends_m when positions given — reference M11 sinuosity prop,
    src/bin/osm-lump-ways/main.rs:789-796)."""
    import ray

    def fn(df):
        import pandas as pd

        from ..functions.haversine import haversine_m_fp

        pos = ray.get(pos_ref) if pos_ref is not None else None
        g = _graph_of(df)
        lines = (g.into_lines_random() if method == "random"
                 else g.into_lines_as_crow_flies(pos))
        rows = []
        for i, line in enumerate(lines):
            dist_ends = None
            if pos is not None and len(line) >= 2:
                a, b = pos[line[0]], pos[line[-1]]
                dist_ends = float(haversine_m_fp(
                    np.array([a[0]]), np.array([a[1]]),
                    np.array([b[0]]), np.array([b[1]]))[0])
            rows.append((int(df["g"].iloc[0]), int(df["component_id"].iloc[0]),
                         i, len(line), dist_ends))
        return pd.DataFrame(rows, columns=["g", "component_id", "line_idx",
                                           "n_nodes", "dist_ends_m"])

    e = _labeled_edges(edges_g, labels, num_partitions)
    return e.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")


def component_frames(edges_g, labels, pos_ref, *, num_partitions: int = 8):
    """G8 per component → frame line rows (g, component_id, frame_idx, n_nodes)."""
    import ray

    def fn(df):
        import pandas as pd

        pos = ray.get(pos_ref)
        g = _graph_of(df)
        rows = []
        for i, line in enumerate(g.frames(pos)):
            rows.append((int(df["g"].iloc[0]), int(df["component_id"].iloc[0]),
                         i, len(line)))
        return pd.DataFrame(rows, columns=["g", "component_id", "frame_idx", "n_nodes"])

    e = _labeled_edges(edges_g, labels, num_partitions)
    return e.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")


def component_betweenness(edges_g, labels, pos_ref, *, max_nodes: int = 2000,
                          seed: int = 42, num_partitions: int = 8):
    """G9 per component → per-edge (g, component_id, u, v, bc_value) with the
    reference's default 2000-node sampling cap (cli_args.rs:244-253)."""
    import ray

    def fn(df):
        import pandas as pd

        pos = ray.get(pos_ref)
        g = _graph_of(df)
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

    e = _labeled_edges(edges_g, labels, num_partitions)
    return e.groupby(["g", "component_id"]).map_groups(fn, batch_format="pandas")
