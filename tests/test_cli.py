"""CLI round-trips: `python -m osm_lump_ways_ray lump/down` over tiny inputs,
invoked in-process (main() reuses the session fixture's Ray and must NOT shut
it down)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osm_lump_ways_ray.__main__ import main


def test_cli_lump_synth_to_geojson(tmp_path, capsys, ray_session):
    out = tmp_path / "groups.geojson"
    rc = main(["lump", "--synth", "3000", "-o", str(out),
               "--num-partitions", "4"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["components"] > 0
    fc = json.loads(out.read_text())
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) > 0
    geoms = {f["geometry"]["type"] for f in fc["features"]}
    assert geoms == {"MultiLineString"}
    # K1: features sorted by length desc
    lens = [f["properties"]["length_m"] for f in fc["features"]]
    assert lens == sorted(lens, reverse=True)

    import ray

    assert ray.is_initialized()  # CLI must not tear down the outer session


def test_cli_lump_filters_and_linestrings(tmp_path, capsys, ray_session):
    out = tmp_path / "top.geojsonl"
    rc = main(["lump", "--synth", "3000", "-o", str(out),
               "--save-as-linestrings", "--only-longest-n", "5",
               "--num-partitions", "4"])
    assert rc == 0
    lines = [json.loads(l) for l in out.read_text().splitlines() if l.strip()]
    assert 0 < len({l["properties"]["component_id"] for l in lines}) <= 5
    assert all(l["geometry"]["type"] == "LineString" for l in lines)


def test_cli_down_outputs(tmp_path, capsys, ray_session):
    # two chains 1→2→3→4 and 10→11→12 plus a 3-cycle 20→21→22→20
    src = np.array([1, 2, 3, 10, 11, 20, 21, 22], dtype=np.int64)
    dst = np.array([2, 3, 4, 11, 12, 21, 22, 20], dtype=np.int64)
    epath = tmp_path / "edges.parquet"
    pq.write_table(pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "length_m": pa.array(np.full(len(src), 10.0)),
    }), epath)
    nodes = np.unique(np.concatenate([src, dst]))
    npath = tmp_path / "nodes.parquet"
    pq.write_table(pa.table({
        "node_id": pa.array(nodes),
        "lat": pa.array(nodes * 1000), "lon": pa.array(nodes * 2000),
    }), npath)

    out_dir = tmp_path / "down_out"
    om = tmp_path / "loops.om"
    ends_csv = tmp_path / "ends.csv"
    rc = main(["down", "-i", str(epath), "--nodes", str(npath),
               "--out-dir", str(out_dir), "--openmetrics", str(om),
               "--ends-csv", str(ends_csv), "--num-partitions", "4"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["ends"] == "written"
    ends = pq.read_table(os.path.join(out_dir, "ends")).to_pydict()
    assert set(ends["end_nid"]) == {4, 12}  # the cycle contracts away
    text = om.read_text()
    assert text.endswith("# EOF\n") and 'root="20"' in text
    # ends CSV: both chain mouths, 30 m and 20 m upstream, ranked
    rows = ends_csv.read_text().splitlines()
    assert rows[0].startswith("timestamp,iso_datetime,upstream_m")
    assert len(rows) == 3


def test_cli_lump_min_length_dsl_and_debug_filters(tmp_path, capsys,
                                                   ray_session):
    """--min-length percent DSL + divmod/incl-wayids debug surface."""
    out = tmp_path / "big.geojson"
    rc = main(["lump", "--synth", "3000", "-o", str(out),
               "--min-length", "10%longest", "--incl-wayids",
               "--num-partitions", "4"])
    assert rc == 0
    fc = json.loads(out.read_text())
    assert len(fc["features"]) > 0
    lens = [f["properties"]["length_m"] for f in fc["features"]]
    assert min(lens) >= 0.10 * max(lens)
    # all_wayids: JSON list of "w<id>" strings per feature
    wids = fc["features"][0]["properties"]["all_wayids"]
    assert isinstance(wids, list) and all(w.startswith("w") for w in wids)

    # baseline run without the filter has MORE (or equal) features
    out_all = tmp_path / "all.geojson"
    rc = main(["lump", "--synth", "3000", "-o", str(out_all),
               "--num-partitions", "4"])
    assert rc == 0
    n_all = len(json.loads(out_all.read_text())["features"])
    assert n_all >= len(fc["features"])

    # divmod keeps only component_id % 2 == 0
    out_dm = tmp_path / "dm.geojson"
    rc = main(["lump", "--synth", "3000", "-o", str(out_dm),
               "--only-these-way-groups-divmod", "2/0",
               "--num-partitions", "4"])
    assert rc == 0
    dm = json.loads(out_dm.read_text())
    assert all(f["properties"]["component_id"] % 2 == 0
               for f in dm["features"])
    assert 0 < len(dm["features"]) < n_all


def test_cli_lump_min_length_incl_total(tmp_path, capsys, ray_session):
    """incl90%total keeps the longest groups covering 90% of total length."""
    out = tmp_path / "incl.geojson"
    rc = main(["lump", "--synth", "3000", "-o", str(out),
               "--min-length", "incl90%total", "--num-partitions", "4"])
    assert rc == 0
    kept = [f["properties"]["length_m"]
            for f in json.loads(out.read_text())["features"]]
    out_all = tmp_path / "all2.geojson"
    main(["lump", "--synth", "3000", "-o", str(out_all),
          "--num-partitions", "4"])
    allv = sorted((f["properties"]["length_m"]
                   for f in json.loads(out_all.read_text())["features"]),
                  reverse=True)
    total = sum(allv)
    # reference semantics: threshold = length of the first group past 90%
    cum, thr = 0.0, allv[0]
    for v in allv:
        cum += v
        if cum > 0.9 * total:
            thr = v
            break
    assert sorted(kept, reverse=True) == [v for v in allv if v >= thr]


def test_cli_lump_only_these_way_groups_nodeid(tmp_path, capsys, ray_session):
    """Keep only the group(s) containing a specific node id."""
    out_all = tmp_path / "all3.geojson"
    rc = main(["lump", "--synth", "3000", "-o", str(out_all),
               "--incl-wayids", "--num-partitions", "4"])
    assert rc == 0
    fc = json.loads(out_all.read_text())
    target = fc["features"][0]["properties"]
    wid = int(target["all_wayids"][0][1:])

    out = tmp_path / "one.geojson"
    rc = main(["lump", "--synth", "3000", "-o", str(out),
               "--only-these-way-groups", str(wid),
               "--num-partitions", "4"])
    assert rc == 0
    one = json.loads(out.read_text())["features"]
    assert len(one) >= 1
    assert any(f["properties"]["component_id"] == target["component_id"]
               for f in one)
    assert len(one) < len(fc["features"])


def test_cli_lump_frames_and_betweenness_outputs(tmp_path, capsys,
                                                 ray_session):
    frames = tmp_path / "frames.geojsonl"
    bc = tmp_path / "betweenness.geojsonl"
    rc = main(["lump", "--synth", "2000",
               "--output-frames", str(frames),
               "--betweenness-output", str(bc),
               "--betweenness-min-value", "1",
               "--num-partitions", "4"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["frames_written"]["n_features"] > 0
    assert summary["betweenness_written"]["n_features"] > 0
    fl = [json.loads(l) for l in frames.read_text().splitlines() if l.strip()]
    assert all(f["geometry"]["type"] == "LineString" for f in fl)
    assert all(f["properties"]["n_nodes"] ==
               len(f["geometry"]["coordinates"]) for f in fl)
    bl = [json.loads(l) for l in bc.read_text().splitlines() if l.strip()]
    assert all(f["properties"]["bc_value"] >= 1 for f in bl)
    assert all(len(f["geometry"]["coordinates"]) == 2 for f in bl)


def test_cli_down_ends_membership_and_tag(tmp_path, capsys, ray_session):
    """--ends-membership flags + --ends-tag values reach the outputs."""
    src = np.array([1, 2, 3, 10, 11], dtype=np.int64)
    dst = np.array([2, 3, 4, 11, 12], dtype=np.int64)
    lang = ["en", "en", "de", "fr", "fr"]
    epath = tmp_path / "edges.parquet"
    pq.write_table(pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "length_m": pa.array(np.full(len(src), 10.0)),
        "lang": pa.array(lang, pa.string()),
    }), epath)

    out_dir = tmp_path / "down_out"
    ends_csv = tmp_path / "ends.csv"
    rc = main(["down", "-i", str(epath), "--out-dir", str(out_dir),
               "--ends-csv", str(ends_csv),
               "--ends-membership", "lang=de",
               "--ends-tag", "lang", "--num-partitions", "4"])
    assert rc == 0
    ends = pq.read_table(os.path.join(out_dir, "ends")).to_pydict()
    by_nid = {n: f for n, f in zip(ends["end_nid"], ends["is_in:lang=de"])}
    assert by_nid[4] == 1 and by_nid[12] == 0  # 3→4 is de; 11→12 is fr
    # CSV carries the per-end sorted ';'-joined lang values
    rows = ends_csv.read_text().splitlines()
    assert rows[0].endswith(",lang")
    vals = {r.split(",")[4]: r.split(",")[7] for r in rows[1:]}
    assert vals["4"] == "de" and vals["12"] == "fr"  # only edges TOUCHING the end


def test_cli_lump_single_paths_and_per_group_topn(tmp_path, capsys,
                                                  ray_session):
    """--split-into-single-paths family + --only-longest-n-per-group +
    --overwrite guard + the reference's flag aliases."""
    out = tmp_path / "paths.geojsonl"
    rc = main(["lump", "--synth", "2000", "-o", str(out),
               "--split-into-single-paths", "--num-partitions", "4"])
    assert rc == 0
    lines = [json.loads(l) for l in out.read_text().splitlines() if l.strip()]
    assert len(lines) > 0
    assert all(l["geometry"]["type"] == "LineString" for l in lines)
    props = lines[0]["properties"]
    assert {"length_m", "num_nodes", "dist_ends_m", "sinuosity"} <= set(props)
    # sinuosity = length / end-to-end distance >= 1 up to fp noise
    assert all(l["properties"]["sinuosity"] is None
               or l["properties"]["sinuosity"] >= 0.999 for l in lines)
    # K1: sorted by path length desc
    plens = [l["properties"]["length_m"] for l in lines]
    assert plens == sorted(plens, reverse=True)

    # per-component top-1 paths (longest-path is rejected — the reference
    # never implements it, main.rs:761-765; see the dedicated test below)
    out1 = tmp_path / "top1.geojsonl"
    rc = main(["lump", "--synth", "2000", "-o", str(out1),
               "--split-into-single-paths",
               "--only-longest-n-splitted-paths", "1",
               "--num-partitions", "4"])
    assert rc == 0
    l1 = [json.loads(l) for l in out1.read_text().splitlines() if l.strip()]
    from collections import Counter

    per = Counter((l["properties"]["component_id"]) for l in l1)
    assert per and max(per.values()) == 1

    # a tight --max-sinuosity drops paths (subset of the unfiltered run)
    out2 = tmp_path / "sin.geojsonl"
    rc = main(["lump", "--synth", "2000", "-o", str(out2),
               "--split-into-single-paths", "--max-sinuosity", "3.0",
               "--num-partitions", "4"])
    assert rc == 0
    l2 = [json.loads(l) for l in out2.read_text().splitlines() if l.strip()]
    assert len(l2) < len(lines)
    assert all(l["properties"]["sinuosity"] <= 3.0 for l in l2)

    # --only-longest-n-per-group via the --tag-group-k alias
    outg = tmp_path / "pg.geojson"
    rc = main(["lump", "--synth", "2000", "--output-filename", str(outg),
               "--only-longest-n-per-group", "2", "--tag-group-k", "name",
               "--num-partitions", "4"])
    assert rc == 0
    fc = json.loads(outg.read_text())
    assert len(fc["features"]) > 0

    # --overwrite guard: second run on the same path fails without the flag
    rc = main(["lump", "--synth", "2000", "-o", str(outg),
               "--num-partitions", "4"])
    assert rc == 2
    rc = main(["lump", "--synth", "2000", "-o", str(outg),
               "--num-partitions", "4", "--overwrite"])
    assert rc == 0

    # conflicts: --incl-wayids with --split-into-single-paths
    import pytest as _pytest

    with _pytest.raises(ValueError):
        main(["lump", "--synth", "2000", "-o", str(tmp_path / "x.geojson"),
              "--split-into-single-paths", "--incl-wayids",
              "--num-partitions", "4"])


def test_cli_lump_stats_and_dist_to_longer(tmp_path, capsys, ray_session):
    """--csv-stats-file / --openmetrics per-area stats + the implemented
    --incl-dist-to-longer (declared-but-asserted-off in the reference)."""
    out = tmp_path / "st.geojson"
    csvp = tmp_path / "stats.csv"
    omp = tmp_path / "stats.om"
    rc = main(["lump", "--synth", "2000", "-o", str(out),
               "--csv-stats-file", str(csvp), "--openmetrics", str(omp),
               "--num-partitions", "4"])
    assert rc == 0
    rows = csvp.read_text().splitlines()
    assert rows[0] == "timestamp,iso_timestamp,area,metric,value"
    planet = [r for r in rows[1:] if r.split(",")[2] == "planet"]
    assert {r.split(",")[3] for r in planet} == {"groups_count",
                                                "groups_length_m"}
    assert any(r.split(",")[2].startswith("cell:") for r in rows[1:])
    om = omp.read_text()
    assert "# TYPE lump_stats gauge" in om and om.rstrip().endswith("# EOF")
    # append mode: a second run appends rows under one header
    rc = main(["lump", "--synth", "2000", "-o", str(out),
               "--csv-stats-file", str(csvp), "--num-partitions", "4",
               "--overwrite"])
    assert rc == 0
    rows2 = csvp.read_text().splitlines()
    assert len(rows2) == 2 * len(rows) - 1

    out2 = tmp_path / "dtl.geojson"
    rc = main(["lump", "--synth", "2000", "-o", str(out2),
               "--incl-dist-to-longer", "--num-partitions", "4"])
    assert rc == 0
    fc = json.loads(out2.read_text())
    dvals = [f["properties"]["dist_to_longer_m"] for f in fc["features"]]
    # exactly one global-longest feature has no longer neighbor
    assert sum(1 for d in dvals if d is None) == 1
    assert all(d > 0 for d in dvals if d is not None)
    # the longest feature is the null one
    lens = [f["properties"]["length_m"] for f in fc["features"]]
    null_len = [f["properties"]["length_m"] for f in fc["features"]
                if f["properties"]["dist_to_longer_m"] is None][0]
    assert null_len == max(lens)


def _down_fixture(tmp_path):
    """Two chains (1→2→3→4 tag 7, 10→11→12 tag 9) + a 3-cycle (tag 5),
    with way ids and a relation membership table."""
    src = np.array([1, 2, 3, 10, 11, 20, 21, 22], dtype=np.int64)
    dst = np.array([2, 3, 4, 11, 12, 21, 22, 20], dtype=np.int64)
    epath = tmp_path / "edges.parquet"
    pq.write_table(pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "length_m": pa.array(np.full(len(src), 10.0)),
        "tagid": pa.array([7, 7, 7, 9, 9, 5, 5, 5], pa.int64()),
        "way_id": pa.array(np.arange(100, 108, dtype=np.int64)),
    }), epath)
    nodes = np.unique(np.concatenate([src, dst]))
    npath = tmp_path / "nodes.parquet"
    pq.write_table(pa.table({
        "node_id": pa.array(nodes),
        "lat": pa.array(nodes * 1000), "lon": pa.array(nodes * 2000),
    }), npath)
    rpath = tmp_path / "rels.parquet"
    pq.write_table(pa.table({
        "way_id": pa.array([100, 101, 102], pa.int64()),
        "rel_id": pa.array([1, 1, 2], pa.int64()),
        "rel_tag": pa.array([77, 77, 88], pa.int64()),
        "role": pa.array(["main", "main", "side"]),
    }), rpath)
    return epath, npath, rpath


def _read_seq(path):
    return [json.loads(f) for f in
            open(path, "rb").read().decode().split("\x1e") if f.strip()]


def test_cli_down_product_files(tmp_path, capsys, ray_session):
    """The -down per-product output flags: --loops/--ends/--upstreams/
    --grouped-ends/--grouped-waterways/--longest-source-mouth plus their
    knobs, the relation-tag overwrite, and the ends-csv filters."""
    epath, npath, rpath = _down_fixture(tmp_path)
    P = lambda n: str(tmp_path / n)  # noqa: E731
    rc = main(["down", "-i", str(epath), "--nodes", str(npath),
               "--loops", P("loops.geojsons"),
               "--loops-csv-stats-file", P("loops.csv"),
               "--ends", P("ends.geojsons"),
               "--upstreams", P("ups.geojsons"),
               "--upstreams-from-upstream-multiple", "20",
               "--upstream-output-ends-full",
               "--grouped-ends", P("ge.geojsons"),
               "--grouped-ends-max-upstream-delta", "1000",
               "--grouped-waterways", P("gw.geojsons"),
               "--longest-source-mouth", P("lsm.geojsons"),
               "--relations", str(rpath), "--relation-tags-overwrite",
               "--relation-tags-role", "main",
               "--ends-csv", P("ends.csv"), "--ends-csv-only-largest-n", "1",
               "--num-partitions", "4"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    loops = _read_seq(P("loops.geojsons"))
    assert len(loops) == 1
    assert loops[0]["properties"]["nids"] == [20, 21, 22]
    assert loops[0]["geometry"]["type"] == "MultiLineString"
    csv_rows = open(P("loops.csv")).read().splitlines()
    assert any(",planet,loops_count,1" in r for r in csv_rows)

    ends = _read_seq(P("ends.geojsons"))
    assert [f["properties"]["end_nid"] for f in ends] == [4, 12]  # up desc
    assert all(f["geometry"]["type"] == "Point" for f in ends)

    ups = _read_seq(P("ups.geojsons"))
    assert len(ups) == 5  # 5 DAG edges (cycle contracted away)
    p0 = ups[0]["properties"]
    assert {"from_upstream_m", "to_upstream_m", "from_upstream_m_20",
            "end_nid"} <= set(p0)

    ge = _read_seq(P("ge.geojsons"))
    assert {f["properties"]["end_nid"] for f in ge} == {4, 12}

    gw = _read_seq(P("gw.geojsons"))
    # tagid rides through contraction+flow (r4): chain 1 splits into the
    # relation-overwritten group (ways 100/101 → tag 77, 2 edges) and the
    # untouched tail (way 102, tag 7, 1 edge); chain 2 is one tag-9 group
    assert len(gw) == 3 and all(f["geometry"] is None for f in gw)
    assert sorted(f["properties"]["length_dm"] for f in gw) == [100, 200, 200]

    lsm = _read_seq(P("lsm.geojsons"))
    by_mouth = {f["properties"]["mouth_nid"]: f["properties"] for f in lsm}
    # relation overwrite: ways 100/101 (role main) get tag 77; the mouth
    # 4's in-edge is way 102 (role side → filtered), so its name stays t7
    assert by_mouth[4]["name"] == "t7" and by_mouth[12]["name"] == "t9"
    assert by_mouth[4]["river_system_length_m"] == 30.0

    # ends CSV only-largest-1
    rows = open(P("ends.csv")).read().splitlines()
    assert len(rows) == 2 and rows[1].split(",")[4] == "4"

    # overwrite guard on product files
    rc = main(["down", "-i", str(epath), "--nodes", str(npath),
               "--loops", P("loops.geojsons"), "--num-partitions", "4"])
    assert rc == 2
    capsys.readouterr()

    # --longest-source-mouth-only-named with no tagid column filters all
    e2 = tmp_path / "edges2.parquet"
    t = pq.read_table(epath).drop_columns(["tagid", "way_id"])
    pq.write_table(t, e2)
    rc = main(["down", "-i", str(e2), "--nodes", str(npath),
               "--longest-source-mouth", P("lsm2.geojsons"),
               "--longest-source-mouth-only-named",
               "--num-partitions", "4", "--overwrite"])
    assert rc == 0
    assert _read_seq(P("lsm2.geojsons")) == []


def test_cli_down_flow_follows_tag(tmp_path, capsys, ray_session):
    """--flow-follows-tag routes a junction's inflow to the out-edge sharing
    the inflow's tag group (main.rs:838-905); --flow-split-equally halves it."""
    # Y: 1→3 (tag 7), 2→3 (tag 9); outs 3→4 (tag 7), 3→5 (tag 9)
    epath = tmp_path / "edges.parquet"
    pq.write_table(pa.table({
        "src": pa.array([1, 2, 3, 3], pa.int64()),
        "dst": pa.array([3, 3, 4, 5], pa.int64()),
        "length_m": pa.array([100.0, 50.0, 10.0, 10.0]),
        "tagid": pa.array([7, 9, 7, 9], pa.int64()),
    }), epath)
    out_dir = tmp_path / "ft"
    rc = main(["down", "-i", str(epath), "--flow-follows-tag", "name",
               "--out-dir", str(out_dir), "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    flow = pq.read_table(os.path.join(out_dir, "flow_edges")).to_pydict()
    up = {(s, d): u for s, d, u in zip(flow["src"], flow["dst"],
                                       flow["upstream_m"])}
    assert up[(3, 4)] == 100.0 and up[(3, 5)] == 50.0  # follows the tag
    out_dir2 = tmp_path / "eq"
    rc = main(["down", "-i", str(epath), "--flow-split-equally",
               "--out-dir", str(out_dir2), "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    flow = pq.read_table(os.path.join(out_dir2, "flow_edges")).to_pydict()
    up = {(s, d): u for s, d, u in zip(flow["src"], flow["dst"],
                                       flow["upstream_m"])}
    assert up[(3, 4)] == 75.0 and up[(3, 5)] == 75.0  # (100+50)/2

    # conflicts + missing tagid column
    rc = main(["down", "-i", str(epath), "--flow-follows-tag", "name",
               "--flow-split-equally", "--num-partitions", "4"])
    assert rc == 2
    capsys.readouterr()
    e2 = tmp_path / "edges2.parquet"
    pq.write_table(pq.read_table(epath).drop_columns(["tagid"]), e2)
    rc = main(["down", "-i", str(e2), "--flow-follows-tag", "name",
               "--num-partitions", "4"])
    assert rc == 2
    capsys.readouterr()


def test_cli_down_ends_upstreams(tmp_path, capsys, ray_session):
    """--ends-upstreams: each end feature is the MultiLineString of its
    complete upstream network (biggest-end assignment), with min-upstream
    and max-nodes knobs."""
    epath, npath, _ = _down_fixture(tmp_path)
    out = tmp_path / "eu.geojsons"
    rc = main(["down", "-i", str(epath), "--nodes", str(npath),
               "--ends", str(out), "--ends-upstreams",
               "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    feats = _read_seq(out)
    by_end = {f["properties"]["end_nid"]: f for f in feats}
    assert set(by_end) == {4, 12}
    assert by_end[4]["geometry"]["type"] == "MultiLineString"
    assert by_end[4]["properties"]["n_edges"] == 3   # 1→2→3→4
    assert by_end[12]["properties"]["n_edges"] == 2  # 10→11→12
    # upstream-desc order
    ups = [f["properties"]["end_upstream_m"] for f in feats]
    assert ups == sorted(ups, reverse=True)

    # min-upstream filter drops the 20 m chain; max-nodes caps the other
    rc = main(["down", "-i", str(epath), "--nodes", str(npath),
               "--ends", str(out), "--ends-upstreams",
               "--ends-upstreams-min-upstream-m", "25",
               "--ends-upstreams-max-nodes", "3",
               "--num-partitions", "4", "--overwrite"])
    assert rc == 0
    capsys.readouterr()
    feats = _read_seq(out)
    assert [f["properties"]["end_nid"] for f in feats] == [4]
    assert feats[0]["properties"]["n_edges"] == 2  # 4-node chain capped at 3


def test_cli_down_min_upstream_and_lsm_wayids(tmp_path, capsys, ray_session):
    """-down --min-upstream-m filters the --ends output (main.rs:1068-1071);
    --incl-wayids adds the river system's way ids to LSM features
    (main.rs:1256)."""
    epath, npath, _ = _down_fixture(tmp_path)
    out = tmp_path / "ends.geojsons"
    rc = main(["down", "-i", str(epath), "--nodes", str(npath),
               "--ends", str(out), "--min-upstream-m", "25",
               "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    feats = _read_seq(out)
    assert [f["properties"]["end_nid"] for f in feats] == [4]  # 30 m only

    lsm = tmp_path / "lsm.geojsons"
    rc = main(["down", "-i", str(epath), "--nodes", str(npath),
               "--longest-source-mouth", str(lsm), "--incl-wayids",
               "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    by_mouth = {f["properties"]["mouth_nid"]: f["properties"]
                for f in _read_seq(lsm)}
    assert by_mouth[4]["all_wayids"] == ["w100", "w101", "w102"]
    assert by_mouth[12]["all_wayids"] == ["w103", "w104"]


def test_split_paths_longest_path_rejected(tmp_path, capsys, ray_session):
    """--split-into-single-paths-by longest-path must be rejected loudly —
    the reference declares it but never implements it (bin/osm-lump-ways/
    main.rs:761-765 asserts as-crow-flies) — not silently mapped to the
    random decomposition (ADVICE r4)."""
    from osm_lump_ways_ray.__main__ import main

    rc = main(["lump", "--synth", "500", "-o", str(tmp_path / "x.geojson"),
               "--split-into-single-paths",
               "--split-into-single-paths-by", "longest-path",
               "--num-partitions", "4"])
    assert rc == 2
    assert "longest-path" in capsys.readouterr().err
