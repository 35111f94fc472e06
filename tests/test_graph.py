"""Graph kernel tests: A1 degree weights, M5/M6 contraction, G1 connected
components (vs a networkx oracle), including checkpoint/resume."""

import numpy as np
import pyarrow as pa
import pytest

import osm_lump_ways_ray.stages.graph as G
from osm_lump_ways_ray.stages.graph import (
    ContractWays,
    _dedupe_consecutive,
    _degree_weights_batch,
    connected_components,
    node_degree_weights,
    pillar_node_array,
)


def ways_table(chains):
    return pa.table({
        "way_id": pa.array(range(1, len(chains) + 1), pa.int64()),
        "node_ids": pa.array(chains, pa.list_(pa.int64())),
    })


def test_degree_weights_reference_quirk():
    # first +1, interior +2, last +3 (src/bin/osm-lump-ways/main.rs:274-279)
    t = _degree_weights_batch(ways_table([[1, 2, 3]]), "node_ids")
    d = dict(zip(t["node_id"].to_pylist(), t["weight"].to_pylist()))
    assert d == {1: 1, 2: 2, 3: 3}


def test_dedupe_consecutive():
    np.testing.assert_array_equal(
        _dedupe_consecutive(np.array([1, 1, 2, 3, 3, 3, 1])), [1, 2, 3, 1]
    )


@pytest.fixture(scope="module")
def ray_ds_factory(ray_session):
    import ray.data

    def make(table):
        return ray.data.from_arrow(table)

    return make


def test_node_degree_distributed(ray_ds_factory):
    # two ways sharing node 3: way1=[1,2,3], way2=[3,4,5]
    ds = ray_ds_factory(ways_table([[1, 2, 3], [3, 4, 5]]))
    out = {r["node_id"]: r["weight"] for r in node_degree_weights(ds).take_all()}
    assert out == {1: 1, 2: 2, 3: 4, 4: 2, 5: 3}
    pillars = pillar_node_array(ds)
    np.testing.assert_array_equal(pillars, [1, 3, 5])  # weight≠2


def test_contraction_basic(ray_ds_factory):
    # single chain 1-2-3-4-5: interior 2,3,4 non-pillar except last rules
    pillars = np.array([1, 5], dtype=np.int64)
    cw = ContractWays(pillars)
    out = cw(ways_table([[1, 2, 3, 4, 5]]))
    assert out["u"].to_pylist() == [1]
    assert out["v"].to_pylist() == [5]
    assert out["inter_nids"].to_pylist() == [[2, 3, 4]]


def test_contraction_splits_at_pillars():
    pillars = np.array([1, 3, 5], dtype=np.int64)
    out = ContractWays(pillars)(ways_table([[1, 2, 3, 4, 5]]))
    assert list(zip(out["u"].to_pylist(), out["v"].to_pylist())) == [(1, 3), (3, 5)]
    assert out["inter_nids"].to_pylist() == [[2], [4]]


def test_contraction_two_node_way_and_dup_scrub():
    out = ContractWays(np.array([], dtype=np.int64))(ways_table([[7, 8], [9, 9, 10]]))
    assert list(zip(out["u"].to_pylist(), out["v"].to_pylist())) == [(7, 8), (9, 10)]


def test_contraction_split_rejoin_braid():
    # braid: way walks 1..5 then returns 5..1 via different inters — the backtrack
    # guard must not emit the same (1,5) edge twice (main.rs:360-377)
    pillars = np.array([1, 5], dtype=np.int64)
    out = ContractWays(pillars)(ways_table([[1, 2, 3, 4, 5, 6, 7, 8, 1]]))
    pairs = set(zip(out["u"].to_pylist(), out["v"].to_pylist()))
    # edge (1,5) plus a differently-split return path; no duplicate keys
    canon = [(min(a, b), max(a, b)) for a, b in pairs]
    assert len(canon) == len(set(canon))
    assert (1, 5) in canon


def _nx_components(edges):
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(edges)
    return {n: min(c) for c in nx.connected_components(g) for n in c}


@pytest.mark.parametrize("seed,n_edges,n_nodes", [(1, 50, 40), (2, 500, 300), (3, 4000, 2500)])
def test_connected_components_vs_networkx(ray_ds_factory, seed, n_edges, n_nodes):
    rng = np.random.RandomState(seed)
    u = rng.randint(1, n_nodes, size=n_edges).astype(np.int64)
    v = rng.randint(1, n_nodes, size=n_edges).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    ds = ray_ds_factory(pa.table({"u": u, "v": v}))
    got = {r["node"]: r["component_id"]
           for r in connected_components(ds, num_partitions=8).take_all()}
    expected = _nx_components(zip(u.tolist(), v.tolist()))
    assert got == expected


def test_connected_components_forced_recursion(ray_ds_factory):
    # driver_finish_rows=0 forces the distributed recursive path
    rng = np.random.RandomState(7)
    u = rng.randint(1, 500, size=800).astype(np.int64)
    v = rng.randint(1, 500, size=800).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    ds = ray_ds_factory(pa.table({"u": u, "v": v}))
    got = {r["node"]: r["component_id"]
           for r in connected_components(
               ds, num_partitions=8, driver_finish_rows=0, max_levels=4
           ).take_all()}
    assert got == _nx_components(zip(u.tolist(), v.tolist()))


def test_connected_components_checkpoint_resume(ray_ds_factory, tmp_path):
    from osm_lump_ways_ray.state.checkpoint import CheckpointManager

    u = np.array([1, 2, 10, 11], dtype=np.int64)
    v = np.array([2, 3, 11, 12], dtype=np.int64)
    ds = ray_ds_factory(pa.table({"u": u, "v": v}))
    ck1 = CheckpointManager(str(tmp_path / "ck"))
    got1 = {r["node"]: r["component_id"]
            for r in connected_components(ds, checkpoint=ck1, num_partitions=4).take_all()}
    # simulate a killed+resumed job: fresh manager on same dir must reuse steps
    # (keys carry an input/parameter fingerprint since r2 — match by pattern)
    ck2 = CheckpointManager(str(tmp_path / "ck"))
    done = list(ck2._manifest["completed"])
    assert any(k.startswith("cc-") and k.endswith("/l0/labels") for k in done)
    assert any(k.startswith("cc-") and k.endswith("/l0/eq_edges") for k in done)
    # poison the recompute path: resume must NOT re-run the per-partition stage
    orig = G._local_cc_group
    G._local_cc_group = None
    try:
        got2 = {r["node"]: r["component_id"]
                for r in connected_components(ds, checkpoint=ck2, num_partitions=4).take_all()}
    finally:
        G._local_cc_group = orig
    assert got1 == got2 == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
    lineage = (tmp_path / "ck" / "lineage.jsonl").read_text().strip().splitlines()
    assert len(lineage) >= 2
    # per-partition records (north rule): at least one per-fragment row with
    # partition name + rows + bytes for every saved step
    import json as _json

    recs = [_json.loads(x) for x in lineage]
    parts = [r for r in recs if "partition" in r]
    assert parts and all(r["rows"] >= 0 and r["bytes"] > 0 for r in parts)
    steps_with_parts = {r["step"] for r in parts}
    steps_saved = {r["step"] for r in recs if "wall_s" in r and "rows" in r}
    assert steps_saved <= steps_with_parts


def test_checkpoint_key_fingerprint_isolates_inputs(ray_ds_factory, tmp_path):
    """ADVICE r1: one checkpoint dir shared by two different CC inputs must NOT
    serve the first input's labels to the second."""
    from osm_lump_ways_ray.state.checkpoint import CheckpointManager

    ds1 = ray_ds_factory(pa.table({"u": np.array([1, 2], dtype=np.int64),
                                   "v": np.array([2, 3], dtype=np.int64)}))
    ds2 = ray_ds_factory(pa.table({"u": np.array([7], dtype=np.int64),
                                   "v": np.array([8], dtype=np.int64)}))
    ck = CheckpointManager(str(tmp_path / "ck"))
    got1 = {r["node"]: r["component_id"]
            for r in connected_components(ds1, checkpoint=ck, num_partitions=4).take_all()}
    got2 = {r["node"]: r["component_id"]
            for r in connected_components(ds2, checkpoint=ck, num_partitions=4).take_all()}
    assert got1 == {1: 1, 2: 1, 3: 1}
    assert got2 == {7: 7, 8: 7}


def test_connected_components_grouped(ray_ds_factory):
    # node 5 is shared by group 1 and group 2 — must NOT merge their components
    t = pa.table({
        "u": pa.array([1, 5, 7], pa.int64()),
        "v": pa.array([5, 2, 5], pa.int64()),
        "g": pa.array([1, 1, 2], pa.int64()),
    })
    got = {(r["g"], r["node"]): r["component_id"]
           for r in connected_components(ray_ds_factory(t), "u", "v", "g",
                                         num_partitions=4).take_all()}
    assert got == {(1, 1): 1, (1, 5): 1, (1, 2): 1, (2, 7): 5, (2, 5): 5}


def test_contract_ways_joined_parity(ray_ds_factory):
    """Join-based contraction (no pillar broadcast) must emit exactly the
    edges of the broadcast path — chains, shared pillars, braids, dups."""
    import ray
    from osm_lump_ways_ray.stages.graph import (contract_ways,
                                                contract_ways_joined,
                                                pillar_node_array)

    chains = [[1, 2, 3, 4, 5], [5, 6, 7], [3, 8, 9], [10, 11],
              [12, 12, 13, 14], [20, 21, 22, 23, 24, 25, 20],
              [30, 31, 32, 33, 34, 35, 36, 37, 30]]
    t = ways_table(chains)
    ds = ray_ds_factory(t).materialize()
    pillars = pillar_node_array(ds)
    a = contract_ways(ds, ray.put(pillars)).take_all()
    b = contract_ways_joined(ds, num_partitions=4).take_all()

    def key(rows):
        return sorted((r["way_id"], r["u"], r["v"], tuple(r["inter_nids"]))
                      for r in rows)

    assert key(a) == key(b)


def test_local_cc_pointer_jumping_long_chain():
    """ADVICE r3: a long id-consecutive chain in ONE partition must converge in
    O(log d) rounds, not O(d) — and still give the min-node label."""
    import time

    from osm_lump_ways_ray.stages.graph import _local_cc_group

    n = 50_000
    t = pa.table({
        "g": pa.array(np.zeros(n - 1, dtype=np.int64)),
        "a": pa.array(np.arange(1, n, dtype=np.int64)),
        "b": pa.array(np.arange(2, n + 1, dtype=np.int64)),
    })
    t0 = time.monotonic()
    out = _local_cc_group(t)
    wall = time.monotonic() - t0
    assert set(out["label"].to_pylist()) == {1}
    assert len(out) == n
    assert wall < 5.0  # one-hop rounds would need 50k passes over the edges


def test_pagerank_int_hand_computed(ray_session):
    """star a→c, b→c plus c→a on 3 nodes, 2 iterations, integer semantics."""
    import ray.data

    from osm_lump_ways_ray.stages.graph import pagerank_int

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 2, 3], pa.int64()),
        "dst": pa.array([3, 3, 1], pa.int64())}))
    nodes = ray.data.from_arrow(pa.table({"node": pa.array([1, 2, 3], pa.int64())}))
    got = {r["node"]: r["rank_micro"]
           for r in pagerank_int(edges, nodes, iterations=2).take_all()}
    # r0 = 1e6 each; deg: 1→1, 2→1, 3→1
    # iter1: S(3)=1e6+1e6=2e6 → r=150000+850000*2e6//1e6=1850000
    #        S(1)=1e6 → 1000000; node2: none → 150000
    # iter2: S(3)=r1(1)+r1(2)=1000000+150000=1150000 → 150000+850000*1150000//1e6
    #        = 150000+977500 = 1127500
    #        S(1)=r1(3)=1850000 → 150000+1572500=1722500; node2 → 150000
    assert got == {1: 1722500, 2: 150000, 3: 1127500}


def test_sssp_local_distributed_parity():
    """sssp auto-route parity (G13-style): both paths produce identical
    (node, dist) rows on a DAG with shortcut edges."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.graph import sssp

    rng = np.random.default_rng(7)
    n = 60
    src = np.arange(1, n)          # chain 1→2→…→n
    dst = src + 1
    w = (src % 13 + 1).astype(np.int64)
    sk = np.flatnonzero(src % 5 == 0)   # shortcuts i → i+3
    edges = pa.table({
        "src": pa.array(np.r_[src, src[sk]], pa.int64()),
        "dst": pa.array(np.r_[dst, dst[sk] + 2], pa.int64()),
        "w": pa.array(np.r_[w, (src[sk] % 7 + 1)], pa.int64()),
    })
    e = ray.data.from_arrow(edges)
    s = ray.data.from_arrow(pa.table({"node": pa.array([1, 20], pa.int64())}))
    loc = {r["node"]: r["dist"]
           for r in sssp(e, s, force="local").take_all()}
    dist = {r["node"]: r["dist"]
            for r in sssp(e, s, force="distributed",
                          num_partitions=2).take_all()}
    assert loc == dist and loc[1] == 0 and loc[20] == 0 and len(loc) > 50


def test_sssp_checkpoint_resume(tmp_path):
    """sssp_rounds resumes from the newest completed round: after a full
    checkpointed run, a second run with POISONED edges returns the
    checkpointed answer (proving rounds load instead of recompute)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.state.checkpoint import CheckpointManager
    from osm_lump_ways_ray.stages.graph import sssp_rounds

    src = np.arange(1, 30)
    edges = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(src + 1, pa.int64()),
                      "w": pa.array(src % 5 + 1, pa.int64())})
    e = ray.data.from_arrow(edges)
    s = ray.data.from_arrow(pa.table({"node": pa.array([1], pa.int64())}))
    ck = CheckpointManager(str(tmp_path))
    first = {r["node"]: r["dist"]
             for r in sssp_rounds(e, s, num_partitions=2,
                                  checkpoint=ck).take_all()}
    # poison the weights; fingerprint stays tied to the ORIGINAL edges ds we
    # pass (same content → same key), so rounds must come from disk
    ck2 = CheckpointManager(str(tmp_path))
    again = {r["node"]: r["dist"]
             for r in sssp_rounds(e, s, num_partitions=2,
                                  checkpoint=ck2).take_all()}
    assert again == first and first[30] == sum(int(x % 5 + 1) for x in src)


def test_triangle_count_known_graph():
    """K4 has 4 triangles + a pendant edge contributes none; orientation
    normalizes unordered input."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.graph import triangle_count

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 4)]
    e = ray.data.from_arrow(pa.table({
        "u": pa.array([b for _, b in k4], pa.int64()),   # reversed on purpose
        "v": pa.array([a for a, _ in k4], pa.int64()),
    }))
    row = triangle_count(e, num_partitions=2).take_all()[0]
    assert (row["n_edges"], row["n_triangles"]) == (7, 4)


def test_triangle_count_path_parity():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.graph import triangle_count

    rng = np.random.default_rng(9)
    u = rng.integers(1, 60, 300)
    v = rng.integers(1, 60, 300)
    keep = u != v
    e = ray.data.from_arrow(pa.table({"u": pa.array(u[keep], pa.int64()),
                                      "v": pa.array(v[keep], pa.int64())}))
    loc = triangle_count(e, force="local").take_all()[0]
    dist = triangle_count(e, force="distributed",
                          num_partitions=2).take_all()[0]
    assert loc == dist and loc["n_triangles"] > 0


def test_kcore_paths_parity_and_peeling(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.graph import kcore

    # a 4-cycle core with pendant chains that must peel away in cascades,
    # plus duplicate and reversed edges that must not inflate degrees
    E = [(0, 1), (1, 2), (2, 3), (3, 0),            # the 2-core
         (0, 10), (10, 11), (11, 12),               # pendant chain
         (2, 20),                                   # pendant leaf
         (1, 0), (0, 1), (5, 5)]                    # reverse, dup, self-loop
    u = pa.array([e[0] for e in E], pa.int64())
    v = pa.array([e[1] for e in E], pa.int64())
    eds = ray.data.from_arrow(pa.table({"u": u, "v": v}))
    exp = {0: 2, 1: 2, 2: 2, 3: 2}
    for force in ("local", "distributed"):
        out = kcore(eds, 2, force=force).to_pandas()
        assert dict(zip(out["node"], out["deg"])) == exp, force


def test_double_sweep_diameter_path_graph(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.graph import double_sweep_diameter

    # path 1-2-3-4-5 plus isolated edge 10-11: min-vertex component is the
    # path; double sweep on a tree is EXACT -> diameter 4, far end = 5
    t = pa.table({"u": pa.array([1, 2, 3, 4, 10], pa.int64()),
                  "v": pa.array([2, 3, 4, 5, 11], pa.int64())})
    row = double_sweep_diameter(ray.data.from_arrow(t)).take_all()[0]
    assert row == {"start_node": 1, "far_node": 5, "diameter_lb": 4}

    # empty edge set -> empty result, no crash
    e = pa.table({"u": pa.array([], pa.int64()),
                  "v": pa.array([], pa.int64())})
    assert double_sweep_diameter(ray.data.from_arrow(e)).take_all() == []


def test_degree_assortativity_star_graph(ray_session):
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.graph import degree_assortativity

    # star K1,3: center deg 3, leaves deg 1 -> perfectly disassortative
    # pairs (both orientations): (3,1)x3, (1,3)x3
    t = pa.table({"u": pa.array([0, 0, 0], pa.int64()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    row = degree_assortativity(ray.data.from_arrow(t)).take_all()[0]
    n, sx = 6, 12            # Σx over {3,3,3,1,1,1}
    sxy, sxx = 18, 30        # Σxy over 6 pairs of (3·1); Σx²
    assert (row["n_pairs"], row["sum_deg"], row["sum_prod"],
            row["sum_sq"]) == (n, sx, sxy, sxx)
    assert row["r_num"] == n * sxy - sx * sx == -36   # r = -1
    assert row["r_den"] == n * sxx - sx * sx == 36
