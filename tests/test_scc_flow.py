"""SCC (G10), ends (G15), upstream flow (G13) tests vs networkx / hand-computed
oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osm_lump_ways_ray.stages.scc import (
    _flow_group,
    directed_ends,
    strongly_connected_components,
    upstream_flow,
)


@pytest.fixture(scope="module")
def mk(ray_session):
    import ray.data

    return ray.data.from_arrow


def edges_table(pairs):
    return pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    })


def test_directed_ends(mk):
    # 1→2→3, 4→3; ends = {3}
    ds = mk(edges_table([(1, 2), (2, 3), (4, 3)]))
    assert [r["node"] for r in directed_ends(ds).take_all()] == [3]


def _nx_scc(pairs, drop_singletons=True):
    import networkx as nx

    g = nx.DiGraph()
    g.add_edges_from(pairs)
    out = {}
    for comp in nx.strongly_connected_components(g):
        if drop_singletons and len(comp) == 1:
            continue
        root = min(comp)
        for n in comp:
            out[n] = root
    return out


@pytest.mark.parametrize("pairs", [
    # two 3-cycles + a tail
    [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)],
    # cycle with entering and leaving chains
    [(1, 2), (2, 3), (3, 4), (4, 2), (4, 5)],
    # nested/meshed SCC
    [(1, 2), (2, 3), (3, 1), (2, 4), (4, 5), (5, 2), (5, 6)],
], ids=["two-cycles", "chain-cycle-chain", "meshed"])
@pytest.mark.parametrize("driver_rows", [200_000, 0],
                         ids=["tarjan-base", "distributed"])
def test_scc_vs_networkx(mk, pairs, driver_rows):
    got = {r["node"]: r["scc_id"]
           for r in strongly_connected_components(
               mk(edges_table(pairs)),
               driver_finish_rows=driver_rows).take_all()}
    assert got == _nx_scc(pairs)


def test_scc_local_vs_distributed_random(mk):
    """Tarjan driver base case ≡ distributed FW-BW on a random digraph."""
    rng = np.random.RandomState(17)
    pairs = list({(int(a), int(b)) for a, b in
                  zip(rng.randint(0, 60, 400), rng.randint(0, 60, 400))
                  if a != b})
    loc = {r["node"]: r["scc_id"]
           for r in strongly_connected_components(
               mk(edges_table(pairs)), driver_finish_rows=10**6).take_all()}
    dist = {r["node"]: r["scc_id"]
            for r in strongly_connected_components(
                mk(edges_table(pairs)), driver_finish_rows=0).take_all()}
    assert loc == dist == _nx_scc(pairs)


def test_scc_no_cycles_empty(mk):
    got = strongly_connected_components(mk(edges_table([(1, 2), (2, 3)]))).take_all()
    assert got == []


def flow_df(rows):
    return pd.DataFrame(rows, columns=["src", "dst", "length_m", "tagid"])


def test_flow_single_chain():
    # 1→2→3, lengths 10,20: edge(1,2).up=0, node2 gets 10; edge(2,3).up=10
    df = flow_df([(1, 2, 10.0, -1), (2, 3, 20.0, -1)])
    out = _flow_group(df, split_equally=True).set_index(["src", "dst"])
    assert out.loc[(1, 2), "upstream_m"] == 0.0
    assert out.loc[(2, 3), "upstream_m"] == 10.0


def test_flow_split_equally_bifurcation():
    # 1→2 (len 10), then 2→3 and 2→4: inflow at 2 = 0+10; each out gets 5
    df = flow_df([(1, 2, 10.0, -1), (2, 3, 1.0, -1), (2, 4, 1.0, -1)])
    out = _flow_group(df, split_equally=True).set_index(["src", "dst"])
    assert out.loc[(2, 3), "upstream_m"] == 5.0
    assert out.loc[(2, 4), "upstream_m"] == 5.0


def test_flow_follows_tag_with_orphan_group():
    # node 2 has in-edges: tag 1 (inflow 0+10) and tag 9 (inflow 0+6, no same-tag
    # out). outs: two tag-1 edges → tag-1 share = 10/2 = 5 each; orphan tag-9
    # inflow splits equally over ALL outs (+6/2=3) → each out = 8
    df = flow_df([(1, 2, 10.0, 1), (7, 2, 6.0, 9), (2, 3, 1.0, 1), (2, 4, 1.0, 1)])
    out = _flow_group(df, split_equally=False).set_index(["src", "dst"])
    assert out.loc[(2, 3), "upstream_m"] == 8.0
    assert out.loc[(2, 4), "upstream_m"] == 8.0


def test_flow_multi_out_does_not_add_own_length():
    # reference quirk: multi-out pushes outflow WITHOUT the out-edge's length;
    # downstream in-edge accounting re-adds it via to_upstream_m
    df = flow_df([(1, 2, 10.0, -1), (2, 3, 7.0, -1), (2, 4, 7.0, -1),
                  (3, 5, 1.0, -1)])
    out = _flow_group(df, split_equally=True).set_index(["src", "dst"])
    # edge(2,3).up = 5; node3 receives 5 (not 12); edge(3,5).up = 5... single-out
    # path: node3 curr=5 → edge(3,5).up = 5, push 5+1
    assert out.loc[(2, 3), "upstream_m"] == 5.0
    assert out.loc[(3, 5), "upstream_m"] == 5.0


def test_flow_cycle_raises():
    df = flow_df([(1, 2, 1.0, -1), (2, 1, 1.0, -1)])
    with pytest.raises(ValueError, match="cycle"):
        _flow_group(df, split_equally=True)


def test_upstream_flow_distributed(mk):
    # two independent components, run through the full distributed path
    t = pa.table({
        "src": pa.array([1, 2, 10, 11], pa.int64()),
        "dst": pa.array([2, 3, 11, 12], pa.int64()),
        "length_m": pa.array([10.0, 20.0, 5.0, 5.0], pa.float64()),
    })
    out = {(r["src"], r["dst"]): r["upstream_m"]
           for r in upstream_flow(mk(t)).take_all()}
    assert out == {(1, 2): 0.0, (2, 3): 10.0, (10, 11): 0.0, (11, 12): 5.0}


# ---------------------------------------------------- level-synchronous G13/G14

def _giant_dag_table(n: int = 2000):
    """ONE weak component spanning many id-range buckets: a spine chain
    1→2→…→n with integer lengths plus confluent side-branches s→spine every 50
    ids (so some nodes are multi-in) and a bifurcation every 401 ids (multi-out,
    exercising the split rule). Lengths are small integers → float sums exact."""
    src, dst, ln = [], [], []
    for i in range(1, n):
        src.append(i)
        dst.append(i + 1)
        ln.append(float(i % 7 + 1))
    for i in range(50, n, 50):  # side sources feeding the spine
        src.append(100000 + i)
        dst.append(i)
        ln.append(3.0)
    for i in range(401, n, 401):  # bifurcation: spine node also feeds a stub sink
        src.append(i)
        dst.append(200000 + i)
        ln.append(2.0)
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64()),
                     "length_m": pa.array(ln, pa.float64())})


def test_flow_distributed_giant_chain_matches_sequential(mk):
    """The level-synchronous path must agree with the per-component sequential
    walk on a single giant component larger than any sensible group block."""
    from osm_lump_ways_ray.stages.levelflow import upstream_flow_distributed

    t = _giant_dag_table(2000)
    seq = _flow_group(
        pd.DataFrame({"src": t["src"].to_numpy(), "dst": t["dst"].to_numpy(),
                      "length_m": t["length_m"].to_numpy(),
                      "tagid": np.full(len(t), -1)}),
        split_equally=True)
    expect = {(r.src, r.dst): r.upstream_m for r in seq.itertuples()}
    got = {(r["src"], r["dst"]): r["upstream_m"]
           for r in upstream_flow_distributed(mk(t), split_equally=True).take_all()}
    assert got == expect


def test_flow_auto_routes_giant_component(mk):
    """upstream_flow auto-selects the distributed path above max_group_rows."""
    t = _giant_dag_table(600)
    out = upstream_flow(mk(t), max_group_rows=100)
    got = {(r["src"], r["dst"]): r["upstream_m"] for r in out.take_all()}
    seq = _flow_group(
        pd.DataFrame({"src": t["src"].to_numpy(), "dst": t["dst"].to_numpy(),
                      "length_m": t["length_m"].to_numpy(),
                      "tagid": np.full(len(t), -1)}),
        split_equally=True)
    assert got == {(r.src, r.dst): r.upstream_m for r in seq.itertuples()}


def test_flow_distributed_follows_tag(mk):
    """Tagged split rule through the distributed path (same fixture as the
    sequential orphan-group test, shifted across a bucket boundary)."""
    from osm_lump_ways_ray.stages.levelflow import upstream_flow_distributed

    base = 1000
    t = pa.table({
        "src": pa.array([base + 1, base + 70, base + 64, base + 64], pa.int64()),
        "dst": pa.array([base + 64, base + 64, base + 128, base + 200], pa.int64()),
        "length_m": pa.array([10.0, 6.0, 1.0, 1.0], pa.float64()),
        "tagid": pa.array([1, 9, 1, 1], pa.int64()),
    })
    got = {(r["src"], r["dst"]): r["upstream_m"]
           for r in upstream_flow_distributed(mk(t), split_equally=False).take_all()}
    assert got[(base + 64, base + 128)] == 8.0
    assert got[(base + 64, base + 200)] == 8.0


def test_flow_distributed_checkpoint_resume(mk, tmp_path):
    from osm_lump_ways_ray.state.checkpoint import CheckpointManager
    from osm_lump_ways_ray.stages.levelflow import upstream_flow_distributed

    t = _giant_dag_table(800)
    ck1 = CheckpointManager(str(tmp_path / "ck"))
    got1 = {(r["src"], r["dst"]): r["upstream_m"]
            for r in upstream_flow_distributed(
                mk(t), checkpoint=ck1, checkpoint_every=2).take_all()}
    # a resumed run must load the newest round checkpoint and finish identically
    ck2 = CheckpointManager(str(tmp_path / "ck"))
    assert any(k.startswith("flow-") for k in ck2._manifest["completed"])
    got2 = {(r["src"], r["dst"]): r["upstream_m"]
            for r in upstream_flow_distributed(
                mk(t), checkpoint=ck2, checkpoint_every=2).take_all()}
    assert got1 == got2


def test_biggest_end_distributed_matches_walk(mk):
    from osm_lump_ways_ray.stages.levelflow import biggest_end_distributed
    from osm_lump_ways_ray.stages.waterways import _component_walks

    t = _giant_dag_table(900)
    flow = upstream_flow(mk(t), distributed=False)
    flow_tbl = pa.concat_tables(list(flow.iter_batches(batch_format="pyarrow")))
    df = flow_tbl.to_pandas()
    assigned, _paths = _component_walks(df, None, max_dist_m=None)
    got = {r["node"]: r["end_nid"]
           for r in biggest_end_distributed(mk(flow_tbl)).take_all()}
    assert got == assigned


def _path_rows(rows):
    def v(x):
        return None if x is None or (isinstance(x, float) and x != x) else \
            round(float(x), 6)

    return sorted((r["end_nid"], r["n_nodes"], v(r["dist_m"]),
                   v(r["from_upstream_m"]), v(r["to_upstream_m"]))
                  for r in rows if r["kind"] == 1)


def test_biggest_end_grouped_paths_auto_routes(mk):
    """biggest_end_and_grouped_paths must auto-route to the distributed
    kernels above max_group_rows, with assignment rows AND path rows (the
    list-ranking G16, r5) identical to the per-component walk path."""
    from osm_lump_ways_ray.stages.waterways import biggest_end_and_grouped_paths

    t = _giant_dag_table(600)
    flow = upstream_flow(mk(t), distributed=False)
    flow_tbl = pa.concat_tables(list(flow.iter_batches(batch_format="pyarrow")))

    seq = biggest_end_and_grouped_paths(mk(flow_tbl)).take_all()
    dist = biggest_end_and_grouped_paths(mk(flow_tbl),
                                         max_group_rows=50).take_all()
    a_seq = {r["node"]: r["end_nid"] for r in seq if r["kind"] == 0}
    a_dist = {r["node"]: r["end_nid"] for r in dist if r["kind"] == 0}
    assert a_dist == a_seq
    assert _path_rows(dist) == _path_rows(seq)


def test_grouped_paths_distributed_pure_path(mk):
    """max_group_rows=0 forces EVERY component through the distributed G16
    list-ranking kernel; multi-branch + multi-component parity vs the
    sequential walk, uncapped and with a max-distance cut."""
    from osm_lump_ways_ray.stages.waterways import biggest_end_and_grouped_paths

    # two components: the giant fixture + a small multi-branch Y with ties
    t = _giant_dag_table(300)
    y = pa.table({"src": pa.array([901001, 901002, 901002, 901005], pa.int64()),
                  "dst": pa.array([901002, 901003, 901004, 901002], pa.int64()),
                  "length_m": pa.array([4.0, 9.0, 2.0, 4.0], pa.float64())})
    both = pa.concat_tables([t, y])
    flow = upstream_flow(mk(both), distributed=False)
    flow_tbl = pa.concat_tables(list(flow.iter_batches(batch_format="pyarrow")))

    for cap in (None, 40.0, 3.0):
        seq = biggest_end_and_grouped_paths(mk(flow_tbl),
                                            max_dist_m=cap).take_all()
        dist = biggest_end_and_grouped_paths(mk(flow_tbl), max_dist_m=cap,
                                             max_group_rows=0).take_all()
        assert _path_rows(dist) == _path_rows(seq), f"cap={cap}"
        a_seq = {r["node"]: r["end_nid"] for r in seq if r["kind"] == 0}
        a_dist = {r["node"]: r["end_nid"] for r in dist if r["kind"] == 0}
        assert a_dist == a_seq
