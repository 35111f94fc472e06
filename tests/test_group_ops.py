"""Giant-component guard + distributed G2 compression (VERDICT r3 #2/#3).

Parity target: ``component_compress_stats(force_distributed=True)`` must match
the in-memory ``ComponentGraph.compress`` map_groups path over every shape the
sequential algorithm distinguishes (undirected_graph.rs:640-716): plain chains,
parallel chains between the same terminal pair (parallel-edge undo), chain +
pre-existing direct edge, attached cycles, and isolated cycles.
"""
import numpy as np
import pyarrow as pa
import pytest
import ray


def _edges_tbl(pairs, g=0):
    u = [a for a, _ in pairs]
    v = [b for _, b in pairs]
    return pa.table({
        "g": pa.array(np.full(len(pairs), g, np.int64)),
        "u": pa.array(np.asarray(u, np.int64)),
        "v": pa.array(np.asarray(v, np.int64)),
        "inter_nids": pa.array([[] for _ in pairs], pa.list_(pa.int64())),
    })


# one table containing every compress shape, all in tag group 0
_SHAPES = [
    # A: plain chain 1-2-3-4 (after = 2)
    (1, 2), (2, 3), (3, 4),
    # B: two parallel chains 10-11-20 / 10-12-13-20 + spikes 10-14, 20-15
    (10, 11), (11, 20), (10, 12), (12, 13), (13, 20), (10, 14), (20, 15),
    # C: chain 30-32-31 + direct edge 30-31 + spikes 30-33, 31-34
    (30, 32), (32, 31), (30, 31), (30, 33), (31, 34),
    # D: attached cycle 40-41-42-40 + spike 40-43
    (40, 41), (41, 42), (42, 40), (40, 43),
    # E: isolated square cycle 50-51-52-53-50
    (50, 51), (51, 52), (52, 53), (53, 50),
]


def _compress_both_paths(tbl, **kw):
    from osm_lump_ways_ray.pipelines.group_ops import component_compress_stats
    from osm_lump_ways_ray.stages.graph import connected_components

    edges = ray.data.from_arrow(tbl)
    labels = connected_components(edges, "u", "v", "g", num_partitions=4)

    def rows(ds):
        return sorted((r["g"], r["component_id"], r["vertices_before"],
                       r["vertices_after"]) for r in ds.take_all())

    mem = rows(component_compress_stats(edges, labels, num_partitions=4,
                                        force_distributed=False, **kw))
    dist = rows(component_compress_stats(edges, labels, num_partitions=4,
                                         force_distributed=True, **kw))
    return mem, dist


def test_compress_distributed_parity_all_shapes():
    mem, dist = _compress_both_paths(_edges_tbl(_SHAPES))
    assert mem == dist
    by_comp = {c: (b, a) for _g, c, b, a in mem}
    assert by_comp[1] == (4, 2)      # plain chain
    assert by_comp[10] == (7, 5)     # parallel chains keep 1 of 3 interiors
    assert by_comp[30] == (5, 5)     # chain+direct: undo keeps the interior
    assert by_comp[40] == (4, 4)     # attached cycle keeps 2 interiors
    assert by_comp[50] == (4, 3)     # isolated cycle fixpoint = triangle


def test_compress_distributed_parity_multi_group():
    """Same node ids reused across two tag groups must not collide."""
    t = pa.concat_tables([_edges_tbl(_SHAPES, g=0), _edges_tbl(_SHAPES, g=7)])
    mem, dist = _compress_both_paths(t)
    assert mem == dist
    assert len({g for g, *_ in mem}) == 2


def test_compress_auto_routes_above_budget():
    """max_group_rows below the biggest component forces the distributed path
    (and the result is identical to the in-memory one)."""
    from osm_lump_ways_ray.pipelines.group_ops import component_compress_stats
    from osm_lump_ways_ray.stages.graph import connected_components

    tbl = _edges_tbl(_SHAPES)
    edges = ray.data.from_arrow(tbl)
    labels = connected_components(edges, "u", "v", "g", num_partitions=4)

    def rows(ds):
        return sorted(tuple(r.values()) for r in ds.take_all())

    auto = rows(component_compress_stats(edges, labels, num_partitions=4,
                                         max_group_rows=3))
    mem = rows(component_compress_stats(edges, labels, num_partitions=4,
                                        force_distributed=False))
    assert auto == mem


def test_guard_raises_for_inherently_in_memory_ops():
    """Ops with no distributed formulation (frames, betweenness, ...) must
    fail LOUDLY when a component exceeds the budget — not OOM a worker."""
    from osm_lump_ways_ray.pipelines.group_ops import component_frames
    from osm_lump_ways_ray.stages.graph import connected_components

    tbl = _edges_tbl(_SHAPES)
    edges = ray.data.from_arrow(tbl)
    labels = connected_components(edges, "u", "v", "g", num_partitions=4)
    nodes = ray.data.from_arrow(pa.table({
        "node_id": pa.array(np.arange(0, 60, dtype=np.int64)),
        "lat": pa.array(np.arange(0, 60, dtype=np.float64) * 0.001),
        "lon": pa.array(np.arange(0, 60, dtype=np.float64) * 0.001),
    }))
    with pytest.raises(ValueError, match="component_frames"):
        component_frames(edges, labels, nodes, num_partitions=4,
                         max_group_rows=3).materialize()


def test_betweenness_source_chunk_fanout_parity(ray_session):
    """source_chunks=4 (intra-component fan-out + partial-sum reduce) must
    equal the single-task run exactly — the pair set partitions across
    disjoint source-index slices."""
    from osm_lump_ways_ray.pipelines.group_ops import component_betweenness
    from osm_lump_ways_ray.stages.graph import connected_components

    rng = np.random.RandomState(3)
    # a connected random graph: spanning chain + extra chords
    n = 40
    pairs = [(i, i + 1) for i in range(n - 1)]
    pairs += [(int(a), int(b)) for a, b in
              rng.randint(0, n, size=(25, 2)) if a != b]
    tbl = _edges_tbl(pairs)
    edges = ray.data.from_arrow(tbl)
    labels = connected_components(edges, "u", "v", "g", num_partitions=4)
    nodes = ray.data.from_arrow(pa.table({
        "node_id": pa.array(np.arange(n, dtype=np.int64)),
        "lat": pa.array(rng.randint(-800, 800, n).astype(np.int64) * 10000),
        "lon": pa.array(rng.randint(-1700, 1700, n).astype(np.int64) * 10000),
    }))

    def rows(ds):
        return sorted((r["g"], r["component_id"], r["u"], r["v"],
                       r["bc_value"]) for r in ds.take_all())

    one = rows(component_betweenness(edges, labels, nodes, max_nodes=30,
                                     num_partitions=4))
    four = rows(component_betweenness(edges, labels, nodes, max_nodes=30,
                                      num_partitions=4, source_chunks=4))
    assert one == four
    assert any(v > 0 for *_k, v in one)

    # giant path (broadcast compressed graph + source-chunk fan-out): exact
    # parity by construction — the build task runs the SAME sample/spike/
    # compress code, and the chunk partials sum over disjoint source slices
    giant = rows(component_betweenness(edges, labels, nodes, max_nodes=30,
                                       num_partitions=4, force="giant",
                                       giant_source_chunks=5))
    assert giant == one

    # auto-route: a cap below the component's edge count must route to the
    # giant path (NOT raise) and still match
    auto = rows(component_betweenness(edges, labels, nodes, max_nodes=30,
                                      num_partitions=4, max_group_rows=10))
    assert auto == one


def test_betweenness_mixed_route_parity(ray_session):
    """Two components — one over a tiny cap, one under — must split across
    the in-memory and giant paths and together match the all-local run."""
    from osm_lump_ways_ray.pipelines.group_ops import component_betweenness
    from osm_lump_ways_ray.stages.graph import connected_components

    rng = np.random.RandomState(7)
    pairs = [(i, i + 1) for i in range(30)]          # big chain component
    pairs += [(int(a), int(b)) for a, b in
              rng.randint(0, 31, size=(12, 2)) if a != b]
    pairs += [(100, 101), (101, 102), (102, 100), (102, 103)]  # small comp
    tbl = _edges_tbl(pairs)
    edges = ray.data.from_arrow(tbl)
    labels = connected_components(edges, "u", "v", "g", num_partitions=4)
    ids = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    nodes = ray.data.from_arrow(pa.table({
        "node_id": pa.array(np.array(ids, dtype=np.int64)),
        "lat": pa.array(rng.randint(-800, 800, len(ids)).astype(np.int64)
                        * 10000),
        "lon": pa.array(rng.randint(-1700, 1700, len(ids)).astype(np.int64)
                        * 10000),
    }))

    def rows(ds):
        return sorted((r["g"], r["component_id"], r["u"], r["v"],
                       r["bc_value"]) for r in ds.take_all())

    local = rows(component_betweenness(edges, labels, nodes, max_nodes=100,
                                       num_partitions=4, force="local",
                                       max_group_rows=None))
    mixed = rows(component_betweenness(edges, labels, nodes, max_nodes=100,
                                       num_partitions=4, max_group_rows=20))
    assert mixed == local


def test_frames_skeleton_distributed_parity():
    """Distributed frames skeleton == per-pair local Dijkstra union on a
    tie-free weighted graph (the documented-divergence-free case)."""
    import heapq

    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.pipelines.group_ops import \
        frames_skeleton_distributed
    from osm_lump_ways_ray.stages.spatial import _monotone_chain

    rng = np.random.default_rng(5)
    # random connected graph: a ring + chords, positions random, weights
    # random-distinct (tie-free with high probability at these magnitudes)
    n = 40
    ring = [(i, (i + 1) % n) for i in range(n)]
    chords = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
              for _ in range(25)]
    pairs = sorted({(min(a, b) + 1, max(a, b) + 1)
                    for a, b in ring + chords if a != b})
    w = (rng.permutation(len(pairs)) * 97 + 11).astype(np.int64)
    lat = rng.integers(-1_000_000, 1_000_000, n)
    lon = rng.integers(-1_000_000, 1_000_000, n)

    edges = pa.table({"u": pa.array([p[0] for p in pairs], pa.int64()),
                      "v": pa.array([p[1] for p in pairs], pa.int64()),
                      "w": pa.array(w, pa.int64())})
    nodes = pa.table({"node_id": pa.array(np.arange(1, n + 1), pa.int64()),
                      "lat": pa.array(lat, pa.int64()),
                      "lon": pa.array(lon, pa.int64())})
    got = {(r["u"], r["v"]) for r in frames_skeleton_distributed(
        ray.data.from_arrow(edges).repartition(3),
        ray.data.from_arrow(nodes).repartition(3),
        num_partitions=2).take_all()}

    # local reference: hull nodes → per-pair Dijkstra (unique paths) → union
    adj: dict = {}
    for (a, b), ww in zip(pairs, w):
        adj.setdefault(a, []).append((b, int(ww)))
        adj.setdefault(b, []).append((a, int(ww)))

    def dijkstra(s):
        dist = {s: 0}
        prev = {}
        pq = [(0, s)]
        while pq:
            d, x = heapq.heappop(pq)
            if d > dist.get(x, 1 << 62):
                continue
            for y, ww in adj.get(x, ()):
                nd = d + ww
                if nd < dist.get(y, 1 << 62):
                    dist[y] = nd
                    prev[y] = x
                    heapq.heappush(pq, (nd, y))
        return dist, prev

    hull_idx = _monotone_chain(lat, lon)
    hull = sorted(int(i) + 1 for i in hull_idx)
    exp = set()
    for s in hull:
        dist, prev = dijkstra(s)
        for t in hull:
            if t == s or t not in dist:
                continue
            x = t
            while x != s:
                p = prev[x]
                exp.add((min(p, x), max(p, x)))
                x = p
    assert got == exp and len(exp) > 10
