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
