"""GeoJSONSeq sink tests (S4): RFC 8142 framing, 6-decimal coords, resumable
per-part writes."""

import json

import pyarrow as pa
import pytest

from osm_lump_ways_ray.sources.geojson import render_linestring_features, write_geojsonseq


def feature_table():
    return pa.table({
        "name": pa.array(["river a", "river b"], pa.string()),
        "length_m": pa.array([1234.5, 67.8], pa.float64()),
        "lats": pa.array([[0, 10_000_000], [450_000_000, 450_100_000]],
                         pa.list_(pa.int64())),
        "lons": pa.array([[0, 20_000_000], [90_000_000, 90_100_000]],
                         pa.list_(pa.int64())),
    })


def test_render_rfc8142_lines():
    out = render_linestring_features(feature_table(), props_cols=["name", "length_m"])
    lines = out["line"].to_pylist()
    assert len(lines) == 2
    for raw in lines:
        assert raw.startswith(b"\x1e") and raw.endswith(b"\n")  # RS ... LF
        f = json.loads(raw[1:])
        assert f["type"] == "Feature"
        assert f["geometry"]["type"] == "LineString"
    f0 = json.loads(lines[0][1:])
    assert f0["properties"] == {"name": "river a", "length_m": 1234.5}
    # 6-decimal fixed-point: 10_000_000 e7 → 1.0 deg; lon first in coords
    assert f0["geometry"]["coordinates"] == [[0.0, 0.0], [2.0, 1.0]]


def test_write_geojsonseq_resumable(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_arrow(feature_table())
    out = write_geojsonseq(ds, str(tmp_path / "gj"), props_cols=["name"]).take_all()
    assert sum(r["n_features"] for r in out) == 2
    import os

    parts = [p for p in os.listdir(tmp_path / "gj") if p.endswith(".geojsons")]
    assert parts
    # re-run: identical content → same part names, skipped (mtime unchanged)
    m1 = {p: os.path.getmtime(tmp_path / "gj" / p) for p in parts}
    write_geojsonseq(ds, str(tmp_path / "gj"), props_cols=["name"]).take_all()
    m2 = {p: os.path.getmtime(tmp_path / "gj" / p) for p in parts}
    assert m1 == m2


def test_render_multilinestring_byte_parity():
    """Hand-written expected bytes matching the reference writer exactly:
    fixed 6-decimal coords (Rust {:.6}), lon-first, sorted property keys
    (serde_json BTreeMap), reference field order (fileio.rs:147-172)."""
    from osm_lump_ways_ray.sources.geojson import render_feature_bytes

    t = pa.table({
        "name": pa.array(["r one"], pa.string()),
        "root_nodeid": pa.array([42], pa.int64()),
        "lats": pa.array([[[0, 10_000_000], [450_000_000, 450_100_000]]],
                         pa.list_(pa.list_(pa.int64()))),
        "lons": pa.array([[[0, 20_000_000], [90_000_000, 90_100_000]]],
                         pa.list_(pa.list_(pa.int64()))),
    })
    out = render_feature_bytes(t, props_cols=["root_nodeid", "name"],
                               geometry="multilinestring")
    expected = (
        b'{"properties":{"name":"r one","root_nodeid":42}, "geometry": '
        b'{"type":"MultiLineString", "coordinates": '
        b'[[[0.000000, 0.000000],[2.000000, 1.000000]],'
        b'[[9.000000, 45.000000],[9.010000, 45.010000]]]}, '
        b'"type": "Feature"}')
    assert out["feature"].to_pylist() == [expected]


def test_render_point_byte_parity():
    from osm_lump_ways_ray.sources.geojson import render_feature_bytes

    t = pa.table({
        "nid": pa.array([7], pa.int64()),
        "lat": pa.array([-10_000_000], pa.int64()),
        "lon": pa.array([1_234_567], pa.int64()),
    })
    out = render_feature_bytes(t, props_cols=["nid"], geometry="point")
    expected = (b'{"properties":{"nid":7}, "geometry": '
                b'{"type":"Point", "coordinates": [0.123457, -1.000000]}, '
                b'"type": "Feature"}')
    assert out["feature"].to_pylist() == [expected]


def test_write_featurecollection_and_seq(ray_session, tmp_path):
    import ray.data

    from osm_lump_ways_ray.sources.geojson import write_features_single

    t = pa.table({
        "nid": pa.array([1, 2], pa.int64()),
        "lat": pa.array([0, 10_000_000], pa.int64()),
        "lon": pa.array([0, 20_000_000], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    fc = tmp_path / "ends.geojson"
    info = write_features_single(ds, str(fc), props_cols=["nid"],
                                 geometry="point")
    assert info["n_features"] == 2
    raw = fc.read_bytes()
    assert raw.startswith(b'{"type":"FeatureCollection", "features": [\n')
    assert raw.endswith(b"\n]}")
    assert raw.count(b'"type": "Feature"') == 2
    assert b",\n" in raw
    parsed = json.loads(raw)
    assert parsed["type"] == "FeatureCollection"
    assert len(parsed["features"]) == 2

    sq = tmp_path / "ends.geojsons"
    write_features_single(ds, str(sq), props_cols=["nid"], geometry="point")
    lines = sq.read_bytes().split(b"\n")[:-1]
    assert all(ln.startswith(b"\x1e") for ln in lines)
    assert len(lines) == 2


def test_write_features_split_by_group(ray_session, tmp_path):
    import os

    import ray.data

    from osm_lump_ways_ray.sources.geojson import write_features_split

    t = pa.table({
        "name": pa.array(["rhine", "po", "rhine"], pa.string()),
        "lats": pa.array([[0, 1_000_000]] * 3, pa.list_(pa.int64())),
        "lons": pa.array([[0, 1_000_000]] * 3, pa.list_(pa.int64())),
    })
    ds = ray.data.from_arrow(t)
    pat = str(tmp_path / "out" / "ways-%s.geojsons")
    res = write_features_split(ds, pat, split_col="name",
                               props_cols=["name"], geometry="linestring")
    rows = {r["part"]: r["n_features"] for r in res.take_all()}
    assert rows == {str(tmp_path / "out" / "ways-rhine.geojsons"): 2,
                    str(tmp_path / "out" / "ways-po.geojsons"): 1}
    assert sorted(os.listdir(tmp_path / "out")) == ["ways-po.geojsons",
                                                    "ways-rhine.geojsons"]

    import pytest

    with pytest.raises(ValueError):
        write_features_split(ds, str(tmp_path / "nopct.geojsons"),
                             split_col="name", props_cols=["name"],
                             geometry="linestring")
