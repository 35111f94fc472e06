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
