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
