"""CSV sinks (S5/S6/S7) and G20 through-path tests."""

import pandas as pd
import pyarrow as pa
import pytest

from osm_lump_ways_ray.sources.csvout import (
    append_stats_csv,
    render_csv_rows,
    write_openmetrics,
)
from osm_lump_ways_ray.stages.waterways import _through_path_component


def test_render_csv_rows_wkt():
    t = pa.table({
        "name": pa.array(["a"], pa.string()),
        "lats": pa.array([[0, 10_000_000]], pa.list_(pa.int64())),
        "lons": pa.array([[0, 20_000_000]], pa.list_(pa.int64())),
    })
    (line,) = render_csv_rows(t, props_cols=["name"])["line"].to_pylist()
    assert line == 'a,"LINESTRING (0.000000 0.000000, 2.000000 1.000000)"'


def test_append_stats_csv(tmp_path):
    p = tmp_path / "ends.csv"
    append_stats_csv(str(p), ["ts", "n"], [[1, 2]])
    append_stats_csv(str(p), ["ts", "n"], [[3, 4]])
    assert p.read_text() == "ts,n\n1,2\n3,4\n"
    with pytest.raises(ValueError):
        append_stats_csv(str(p), ["other"], [[1]])


def test_openmetrics(tmp_path):
    p = tmp_path / "m.prom"
    write_openmetrics(str(p), "loops_count", [({"area": "planet"}, 3)],
                      help_text="loops per area")
    txt = p.read_text()
    assert '# TYPE loops_count gauge' in txt
    assert 'loops_count{area="planet"} 3' in txt


def test_through_path():
    # sources 1, 10; sinks 4; 1→2→4 (len 30), 10→2→4 (len 60) → best 60
    df = pd.DataFrame({
        "src": [1, 2, 10], "dst": [2, 4, 2],
        "length_m": [10.0, 20.0, 40.0], "component": [1, 1, 1],
    })
    out = _through_path_component(df)
    assert out.iloc[0]["through_path_m"] == 60.0


def test_write_ends_csv_full_columns(tmp_path):
    """Reference ends-CSV parity (ends_csv.rs:14-108): column set, >1m filter,
    upstream-desc rank, largest-N truncation, append with header check."""
    from osm_lump_ways_ray.sources.csvout import write_ends_csv

    p = str(tmp_path / "ends.csv")
    rows = [
        {"nid": 1, "upstream_m": 500.26, "lat": 1.5, "lon": 2.5, "tags": ["Rhine"]},
        {"nid": 2, "upstream_m": 900.0, "lat": 3.0, "lon": 4.0, "tags": [None]},
        {"nid": 3, "upstream_m": 0.5, "lat": 0.0, "lon": 0.0, "tags": [None]},  # ≤1m
        {"nid": 4, "upstream_m": 700.0, "lat": 5.0, "lon": 6.0, "tags": ["Elbe"]},
    ]
    n = write_ends_csv(p, rows, ends_tag_keys=["name"], only_largest_n=2,
                       latest_timestamp=123, latest_timestamp_iso="2026-01-01T00:00:00Z")
    assert n == 2
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "timestamp,iso_datetime,upstream_m,upstream_m_rank,nid,lat,lng,name"
    assert lines[1].startswith("123,2026-01-01T00:00:00Z,900.0,1,2,")
    assert lines[2].startswith("123,2026-01-01T00:00:00Z,700.0,2,4,") and lines[2].endswith("Elbe")
    # second run appends (time-series semantics) after a header check
    write_ends_csv(p, rows[:1], ends_tag_keys=["name"], latest_timestamp=124)
    assert len(open(p).read().strip().splitlines()) == 4
    # only_tagged filter
    p2 = str(tmp_path / "ends2.csv")
    n2 = write_ends_csv(p2, rows, ends_tag_keys=["name"], only_tagged=True)
    assert n2 == 2  # Rhine + Elbe
