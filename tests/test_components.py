"""Per-component graph operator tests (G2-G9) — pure-Python, no Ray needed."""

import numpy as np
import pytest

from osm_lump_ways_ray.stages.components import ComponentGraph


def grid_pos(nodes, spacing=100_000):
    """Place node ids on a line at `spacing` fixed-point units apart."""
    return {n: (0, int(n) * spacing) for n in nodes}


def path_graph(nodes, inters=None):
    g = ComponentGraph()
    for a, b in zip(nodes, nodes[1:]):
        g.add_edge(a, b)
    return g


def test_compress_chain():
    # 1-2-3-4-5 with a branch at 3: compress removes 2 and 4 (degree 2), not 3
    g = path_graph([1, 2, 3, 4, 5])
    g.add_edge(3, 10)
    g.compress()
    assert set(g.vertices()) == {1, 3, 5, 10}
    assert g.contains_edge(1, 3) and g.contains_edge(3, 5)
    assert g.inter_of(1, 3) == [2]
    assert g.inter_of(3, 5) == [4]


def test_compress_parallel_edge_undo():
    # triangle with a chain across: 1-2, 2-3, 1-3: vertex 2 is degree 2 but
    # removing it would duplicate edge (1,3) → must be excluded
    g = ComponentGraph()
    g.add_edge(1, 2)
    g.add_edge(2, 3)
    g.add_edge(1, 3)
    g.compress()
    assert set(g.vertices()) == {1, 2, 3}


def test_compress_merges_inters():
    g = ComponentGraph()
    g.add_edge(1, 2, [11, 12])
    g.add_edge(2, 3, [21])
    g.compress()
    assert g.inter_of(1, 3) == [11, 12, 2, 21]


def test_remove_spikes():
    # path 1-2-3 with spikes 2-10, 3-11-12: leaves peel iteratively
    g = path_graph([1, 2, 3])
    g.add_edge(2, 10)
    g.add_edge(3, 11)
    g.add_edge(11, 12)
    g.remove_spikes(never_remove=lambda n: n in (1, 3))
    assert set(g.vertices()) == {1, 2, 3}


def test_into_lines_random_consumes_graph():
    g = path_graph([1, 2, 3, 4])
    g.add_edge(2, 10)
    lines = list(g.into_lines_random())
    assert g.is_empty()
    # every edge appears exactly once across lines
    covered = set()
    for line in lines:
        for a, b in zip(line, line[1:]):
            e = (min(a, b), max(a, b))
            assert e not in covered
            covered.add(e)
    assert covered == {(1, 2), (2, 3), (3, 4), (2, 10)}


def test_into_lines_starts_at_degree_one():
    g = path_graph([5, 1, 2, 9])
    (line,) = list(g.into_lines_random())
    assert line[0] in (5, 9) and len(line) == 4


def test_dijkstra_and_astar():
    #   1 -10m- 2 -10m- 3
    #    \------25m----/
    g = ComponentGraph()
    g.add_edge(1, 2)
    g.add_edge(2, 3)
    g.add_edge(1, 3)
    lens = {(1, 2): 1000, (2, 3): 1000, (1, 3): 2500}
    pd = g.dijkstra(1, lens)
    assert pd[3] == (2, 2000)  # via 2, not direct
    pos = {1: (0, 0), 2: (0, 100_000), 3: (0, 200_000)}
    # astar uses haversine edge lengths: direct edge 1-3 has no inters so its
    # length equals the crow-flies 1→3 — path may tie; force detour longer:
    g2 = ComponentGraph()
    g2.add_edge(1, 2)
    g2.add_edge(2, 3)
    g2.add_edge(1, 3, [4])
    pos2 = dict(pos)
    pos2[4] = (500_000, 100_000)  # big detour on the direct edge
    assert g2.astar_path(1, 3, pos2) == [1, 2, 3]


def test_as_crow_flies_lines():
    # Y shape: 1-2-3 and 2-10; farthest pair spans the long arm
    g = path_graph([1, 2, 3])
    g.add_edge(2, 10)
    pos = {1: (0, 0), 2: (0, 100_000), 3: (0, 200_000), 10: (10_000, 100_000)}
    lines = list(g.into_lines_as_crow_flies(pos))
    assert lines[0] == [1, 2, 3]  # main line first (max crow-flies pair)
    assert [10, 2] in lines or [2, 10] in lines


def test_convex_hull_and_frames():
    # square 1,2,3,4 + center 5 connected to all corners
    g = ComponentGraph()
    pos = {1: (0, 0), 2: (0, 1_000_000), 3: (1_000_000, 1_000_000),
           4: (1_000_000, 0), 5: (500_000, 500_000)}
    for c in (1, 2, 3, 4):
        g.add_edge(5, c)
    g.add_edge(1, 2)
    g.add_edge(3, 4)
    hull = g._convex_hull_nodes(pos)
    assert hull == [1, 2, 3, 4]
    frames = list(g.frames(pos))
    covered = {(min(a, b), max(a, b)) for line in frames
               for a, b in zip(line, line[1:])}
    assert covered  # frames graph non-empty and decomposed into lines


def test_sample_vertexes_deterministic():
    g = path_graph(list(range(1, 30)))
    pos = grid_pos(range(1, 30))
    s1 = g.sample_vertexes(5, pos, seed=7)
    s2 = g.sample_vertexes(5, pos, seed=7)
    assert s1 == s2 and len(s1) == 5
    assert g.sample_vertexes(100, pos) == list(range(1, 30))


def test_betweenness_path_graph():
    # path 1-2-3-4: with all nodes as sources, middle edge carries most paths
    g = path_graph([1, 2, 3, 4])
    pos = grid_pos([1, 2, 3, 4])
    bc = g.betweenness([1, 2, 3, 4], pos)
    # pairs: (1,2),(1,3),(1,4),(2,3),(2,4),(3,4); edge (2,3) used by 1-3,1-4,2-3,2-4
    assert bc[(2, 3)] == 4
    assert bc[(1, 2)] == 3  # 1-2,1-3,1-4
    assert bc[(3, 4)] == 3


def test_betweenness_matches_networkx_unnormalized():
    import networkx as nx

    rng = np.random.RandomState(3)
    g = ComponentGraph()
    G = nx.Graph()
    nodes = list(range(1, 15))
    pos = grid_pos(nodes)
    edges = set()
    for _ in range(25):
        a, b = rng.choice(nodes, 2, replace=False)
        a, b = int(min(a, b)), int(max(a, b))
        if a != b and (a, b) not in edges:
            edges.add((a, b))
            g.add_edge(a, b)
            G.add_edge(a, b, weight=abs(a - b))
    verts = sorted(g.adj.keys())
    bc = g.betweenness(verts, pos)
    # structural check only (reference counts ONE shortest path per pair, so
    # exact values differ from networkx when ties exist): every edge on some
    # unique shortest path gets a positive count
    assert sum(bc.values()) > 0
    assert all(v >= 0 for v in bc.values())
