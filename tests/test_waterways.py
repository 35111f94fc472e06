"""Waterways-layer tests: cycle contraction (G11), loops (G21), biggest-end +
grouped paths (G14/G16), upstream segments (G17), tag groups (G18), longest
source-mouth (G19)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osm_lump_ways_ray.stages.waterways import (
    _component_walks,
    _longest_source_mouth_component,
    _tag_group_component,
    contract_cycles,
    longest_source_mouth,
    loop_features,
    upstream_segments,
)


@pytest.fixture(scope="module")
def mk(ray_session):
    import ray.data

    return ray.data.from_arrow


def e_table(rows):  # (src, dst, length)
    return pa.table({
        "src": pa.array([r[0] for r in rows], pa.int64()),
        "dst": pa.array([r[1] for r in rows], pa.int64()),
        "length_m": pa.array([float(r[2]) for r in rows], pa.float64()),
    })


def test_contract_cycles(mk):
    # chain 1→2→{3,4,5 cycle}→6: cycle contracts to node 3; DAG 1→2→3→6
    rows = [(1, 2, 10), (2, 3, 10), (3, 4, 1), (4, 5, 1), (5, 3, 1), (5, 6, 10)]
    dag, scc = contract_cycles(mk(e_table(rows)), num_partitions=4)
    edges = sorted((r["src"], r["dst"]) for r in dag.take_all())
    assert edges == [(1, 2), (2, 3), (3, 6)]
    labs = {r["node"]: r["scc_id"] for r in scc.take_all()}
    assert labs == {3: 3, 4: 3, 5: 3}


def nodes_table(pos):
    return pa.table({
        "node_id": pa.array(sorted(pos), pa.int64()),
        "lat": pa.array([pos[n][0] for n in sorted(pos)], pa.int64()),
        "lon": pa.array([pos[n][1] for n in sorted(pos)], pa.int64()),
    })


def test_loop_features(mk):
    rows = [(1, 2, 5), (2, 3, 5), (3, 1, 5), (3, 9, 5)]
    pos = {n: (n * 1_000_000, n * 1_000_000) for n in (1, 2, 3, 9)}
    out = loop_features(mk(e_table(rows)), mk(nodes_table(pos)),
                        num_partitions=4).take_all()
    assert len(out) == 1
    f = out[0]
    assert f["root_nid"] == 1 and f["num_nodes"] == 3 and f["num_segments"] == 3
    assert f["length_m"] > 0 and f["area"] == "unknown_area"


def flow_df(rows):  # (src, dst, length, upstream)
    return pd.DataFrame(rows, columns=["src", "dst", "length_m", "upstream_m"])


def test_component_walks_biggest_end():
    # Y: 1→2→3(end A), 2→4(end B); end A has larger upstream
    df = flow_df([(1, 2, 10.0, 0.0), (2, 3, 100.0, 5.0), (2, 4, 1.0, 5.0)])
    assigned, paths = _component_walks(df, None, max_dist_m=None)
    # end upstream: 3 → 5+100=105; 4 → 5+1=6 → nodes 1,2 assign to end 3
    assert assigned[3] == 3 and assigned[4] == 4
    assert assigned[2] == 3 and assigned[1] == 3
    # paths: end 3 walks up through 2,1; end 4 gets only itself
    by_end = {e: n for e, n, _d, _f, _t in paths}
    assert by_end[3] == 3 and by_end[4] == 1
    # G16 props (main.rs:1651-1673): first hop into end 3 is edge (2,3):
    # to_upstream = 5 + 100 = 105; the most-upstream hop is edge (1,2):
    # from_upstream = 0
    props = {e: (f, t) for e, _n, _d, f, t in paths}
    assert props[3] == (0.0, 105.0)
    assert props[4] == (None, None)  # single-node path


def test_component_walks_distance_cut():
    df = flow_df([(1, 2, 10.0, 0.0), (2, 3, 10.0, 10.0)])
    _a, paths = _component_walks(df, None, max_dist_m=15.0)
    (end, n, dist, _f, _t) = paths[0]
    assert end == 3 and n == 2  # second hop would exceed 15 m


def test_upstream_segments(mk):
    t = pa.table({
        "src": pa.array([1], pa.int64()),
        "dst": pa.array([3], pa.int64()),
        "upstream_m": pa.array([100.0], pa.float64()),
        "inter_nids": pa.array([[2]], pa.list_(pa.int64())),
    })
    pos = {1: (0, 0), 2: (0, 100_000), 3: (0, 200_000)}
    segs = sorted(upstream_segments(mk(t), mk(nodes_table(pos))).take_all(),
                  key=lambda s: (s["a"], s["b"]))
    assert [(s["a"], s["b"]) for s in segs] == [(1, 2), (2, 3)]
    assert segs[0]["from_upstream_m"] == 100.0
    assert segs[1]["from_upstream_m"] == pytest.approx(
        100.0 + (segs[0]["to_upstream_m"] - 100.0))


def test_tag_group_component():
    # main river (tag 1): 1→2→3→4; tributary (tag 2): 10→2
    df = pd.DataFrame({
        "src": [1, 2, 3, 10],
        "dst": [2, 3, 4, 2],
        "tagid": [1, 1, 1, 2],
    })
    out = _tag_group_component(df).sort_values("taggroupid").reset_index(drop=True)
    assert len(out) == 2
    main = out[out["tagid"] == 1].iloc[0]
    trib = out[out["tagid"] == 2].iloc[0]
    assert main["num_segments"] == 3 and main["num_sources"] == 1
    assert main["stream_level"] == 1  # reaches the terminal sink
    assert trib["stream_level"] == 2  # one step removed


def test_longest_source_mouth_missouri():
    # Mississippi/Missouri style: short headwater 1→3, long branch 10→11→3, 3→4 (mouth 4)
    df = pd.DataFrame({
        "src": [1, 10, 11, 3],
        "dst": [3, 11, 3, 4],
        "length_m": [100.0, 400.0, 400.0, 50.0],
    })
    out = _longest_source_mouth_component(df)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["mouth_nid"] == 4 and r["source_nid"] == 10
    assert r["river_system_length_m"] == 850.0 and r["path_nodes"] == 4


def test_longest_source_mouth_distributed_topn(mk):
    rows = [(1, 2, 100), (2, 3, 100),          # system A len 200, mouth 3
            (10, 11, 500), (11, 12, 500)]      # system B len 1000, mouth 12
    out = longest_source_mouth(mk(e_table(rows)), top_n=1, num_partitions=4).take_all()
    assert len(out) == 1 and out[0]["mouth_nid"] == 12


# ------------------------------------------------- full G18 (classification)

def tgdf(rows):  # (src, dst, length, tagid, upstream)
    return pd.DataFrame(rows, columns=["src", "dst", "length_m", "tagid",
                                       "upstream_m"])


def _row(out, gid):
    return out[out["taggroupid"] == gid].iloc[0]


def test_tag_group_full_tributary_and_levels():
    from osm_lump_ways_ray.stages.waterways import _tag_group_full_component

    # main river tag1: 1→2→3→4; tributary tag2: 10→2. (I,T) at node 2.
    out = _tag_group_full_component(tgdf([
        (1, 2, 10.0, 1, 0.0), (2, 3, 10.0, 1, 20.0), (3, 4, 10.0, 1, 30.0),
        (10, 2, 10.0, 2, 0.0)]))
    main, trib = _row(out, 1), _row(out, 2)
    assert main["n_tributaries"] == 1 and trib["n_parent_rivers"] == 1
    assert main["stream_level"] == 0 and trib["stream_level"] == 1
    assert trib["code_suffix"] == "1"
    assert main["upstream_dm"] == 300  # end segment 3→4 upstream 30 m


def test_tag_group_full_terminal_distributary():
    from osm_lump_ways_ray.stages.waterways import _tag_group_full_component

    # A (tag 1) 1→2 flows INTO B (tag 2) 2→3: at node 2 A=(I), B=(O) → A is
    # terminal distributary of B per the (In, Out) rule (tag_group.rs:843-845)
    out = _tag_group_full_component(tgdf([
        (1, 2, 10.0, 1, 0.0), (2, 3, 10.0, 2, 10.0)]))
    a, b = _row(out, 1), _row(out, 2)
    assert b["n_terminal_dist"] == 1 and a["n_parent_rivers"] == 1


def test_tag_group_full_branching_distributary():
    from osm_lump_ways_ray.stages.waterways import _tag_group_full_component

    # main B tag1 1→2→3; branch A tag2 2→9: at node 2 A=(O), B=(T) →
    # A is branching distributary of B (tag_group.rs:849-851)
    out = _tag_group_full_component(tgdf([
        (1, 2, 10.0, 1, 0.0), (2, 3, 10.0, 1, 5.0), (2, 9, 10.0, 2, 5.0)]))
    a, b = _row(out, 2), _row(out, 1)
    # gid of branch group = min(2,9) = 2; main = 1
    assert b["n_branching_dist"] == 1 and a["n_parent_rivers"] == 1


def test_tag_group_full_side_channel():
    from osm_lump_ways_ray.stages.waterways import _tag_group_full_component

    # main B tag1: 1→2→3→4→5; side channel A tag2 leaves at 2, rejoins at 4:
    # at 2: A=O, B=T; at 4: A=I, B=T → side-channel rule (tag_group.rs:934-943)
    out = _tag_group_full_component(tgdf([
        (1, 2, 10.0, 1, 0.0), (2, 3, 10.0, 1, 5.0), (3, 4, 10.0, 1, 15.0),
        (4, 5, 10.0, 1, 30.0), (2, 4, 5.0, 2, 5.0)]))
    b = _row(out, 1)
    assert b["n_side_channels"] == 1
    # side channel group id = min(2,4) = 2
    a = _row(out, 2)
    assert a["n_parent_channels"] == 1


def test_tag_group_full_confluence_distances():
    from osm_lump_ways_ray.stages.waterways import _tag_group_full_component

    # main tag1 chain 1→2→3→4 with two confluences (tribs at 2 and 3):
    # group nodes for distances = {2,3} (confs) + {1}(source) + {4}(sink);
    # downstream pairs: 1→2(10), 1→3(20), 1→4(30), 2→3(10), 2→4(20), 3→4(10)
    out = _tag_group_full_component(tgdf([
        (1, 2, 10.0, 1, 0.0), (2, 3, 10.0, 1, 30.0), (3, 4, 10.0, 1, 60.0),
        (10, 2, 20.0, 2, 0.0), (11, 3, 20.0, 3, 0.0)]))
    main = _row(out, 1)
    assert main["num_confluences"] == 2
    assert main["n_conf_pairs"] == 6
    assert main["conf_dist_dm"] == 1000  # (10+20+30+10+20+10) m → dm


def test_tag_groups_full_distributed_code_globalization(mk):
    from osm_lump_ways_ray.stages.waterways import tag_groups_full

    # two separate chains (components); bigger-upstream root ranks first
    t = pa.table({
        "src": pa.array([1, 2, 101, 102], pa.int64()),
        "dst": pa.array([2, 3, 102, 103], pa.int64()),
        "length_m": pa.array([10.0, 10.0, 10.0, 10.0], pa.float64()),
        "tagid": pa.array([1, 2, 5, 5], pa.int64()),
        "upstream_m": pa.array([0.0, 10.0, 0.0, 10.0], pa.float64()),
    })
    rows = {r["taggroupid"]: r for r in tag_groups_full(mk(t), num_partitions=4).take_all()}
    # chain B (101..103) single group upstream 20 ranks above chain A's sink
    # group (edges 2→3, upstream 20 vs ... compute: A sink group = tag2 edge
    # 2→3 end-segment upstream 10 → dm 100; B group end 102→103 upstream 10+10=20? no:
    # upstream_m of edge 102→103 is 10 → dm 100. tie → lower gid first: gid 1... A's
    # sink group gid = min(2,3)=2; B's = 101 → rank: tie upstream 100dm, gid 2 < 101
    a_sink = rows[2]
    b = rows[101]
    assert a_sink["stream_level_code"] == "1"
    assert b["stream_level_code"] == "2"
    assert rows[1]["stream_level_code"] == "1.1"


def test_waterways_down_composed_with_cycles(mk):
    """The composed -down run must equal the individually-called stages on a
    graph WITH cycles (one shared SCC → contraction → flow)."""
    import pyarrow as pa

    from osm_lump_ways_ray.pipelines.waterways_down import waterways_down
    from osm_lump_ways_ray.stages.scc import upstream_flow
    from osm_lump_ways_ray.stages.waterways import contract_cycles

    # cycle 1→2→3→1 feeding chain 3→10→11; separate chain 20→21→22
    t = pa.table({
        "src": pa.array([1, 2, 3, 3, 10, 20, 21], pa.int64()),
        "dst": pa.array([2, 3, 1, 10, 11, 21, 22], pa.int64()),
        "length_m": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0], pa.float64()),
    })
    res = waterways_down(mk(t), num_partitions=4)
    dag, _ = contract_cycles(mk(t), num_partitions=4)
    flow = upstream_flow(dag, num_partitions=4)
    composed = {(r["src"], r["dst"]): r["upstream_m"]
                for r in res["flow_edges"].take_all()}
    staged = {(r["src"], r["dst"]): r["upstream_m"]
              for r in flow.take_all()}
    assert composed == staged
    ends = {r["end_nid"]: r["end_upstream_m"] for r in res["ends"].take_all()}
    assert set(ends) == {11, 22}
    assert ends[22] == 13.0  # 6 + 7
    assigned = {r["node"]: r["end_nid"]
                for r in res["assignments_paths"].take_all() if r["kind"] == 0}
    assert assigned[1] == 11  # cycle contracted to node 1, flows to end 11


def test_pipeline_facade_writes_multilinestring(ray_session, tmp_path):
    """SURVEY §2.10 Pipeline facade: filter + only-longest-n + MultiLineString
    file output over the flagship lump."""
    import json

    from osm_lump_ways_ray.pipelines.waterways_down import Output, Pipeline
    from osm_lump_ways_ray.sources import pages as P

    ds = P.synth_pages_dataset(240, seed=42, override_num_blocks=4)
    out = tmp_path / "groups.geojsons"
    pipe = Pipeline(group_by="name", only_longest_n=3,
                    outputs=[Output(path=str(out), geometry="multilinestring",
                                    props=["name", "length_m"])],
                    num_partitions=8)
    res = pipe.run(ds)
    assert res["written"][0]["n_features"] == 3
    lines = out.read_bytes().split(b"\n")[:-1]
    assert len(lines) == 3
    feats = [json.loads(ln[1:]) for ln in lines]  # strip RS
    assert all(f["geometry"]["type"] == "MultiLineString" for f in feats)
    assert all(set(f["properties"]) == {"name", "length_m"} for f in feats)
    # only-longest-3: lengths descending
    lens = [f["properties"]["length_m"] for f in feats]
    assert sorted(lens, reverse=True) == lens or len(set(lens)) < 3
