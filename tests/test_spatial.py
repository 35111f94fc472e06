"""Spatial ops: tile assignment, PIP, kNN join, hot-cell salting."""

import numpy as np
import pyarrow as pa
import pytest

from osm_lump_ways_ray.stages.spatial import (
    NearestAnchor,
    PIPGeocoder,
    Polygon,
    assign_tiles,
    salt_hot_cells,
)


@pytest.fixture(scope="module")
def mk(ray_session):
    import ray.data

    return ray.data.from_arrow


def test_polygon_contains():
    sq = Polygon("sq", [(0, 0), (0, 10), (10, 10), (10, 0)])
    inside = sq.contains(np.array([5.0, 15.0, 5.0]), np.array([5.0, 5.0, 15.0]))
    np.testing.assert_array_equal(inside, [True, False, False])


def test_pip_first_match_wins():
    a = Polygon("a", [(0, 0), (0, 10), (10, 10), (10, 0)])
    b = Polygon("b", [(5, 5), (5, 20), (20, 20), (20, 5)])
    geo = PIPGeocoder([a, b])
    out = geo(pa.table({"lat": pa.array([7.0, 15.0, 50.0]),
                        "lon": pa.array([7.0, 15.0, 50.0])}))
    assert out["area"].to_pylist() == ["a", "b", "unknown_area"]


def test_nearest_anchor_tiebreak():
    anchors = (np.array([5, 3], dtype=np.int64),
               np.array([0, 0], dtype=np.int64),
               np.array([0, 0], dtype=np.int64))  # two anchors at same point
    na = NearestAnchor(anchors)
    out = na(pa.table({"lat": pa.array([0], pa.int64()),
                       "lon": pa.array([1000], pa.int64())}))
    assert out["nearest_anchor"].to_pylist() == [3]  # lower id wins ties


def test_assign_tiles_and_salting(mk):
    n = 1000
    # hot cell: 90% of nodes at one location (tile_hotcell fixture shape)
    lat = np.where(np.arange(n) % 10 == 0,
                   np.arange(n) * 1000, 450_000_000).astype(np.int64)
    lon = np.full(n, 900_000_000, dtype=np.int64)
    ds = mk(pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                      "lat": pa.array(lat), "lon": pa.array(lon)}))
    tiled = assign_tiles(ds, res=6)
    salted = salt_hot_cells(tiled, threshold=100, salt=8)
    rows = salted.take_all()
    from collections import Counter

    per_salted = Counter(r["salted_cell"] for r in rows)
    # the hot cell (900 rows) must split into 8 sub-keys, each ≤ ~squarely split
    assert max(per_salted.values()) < 900
    # cold cells keep exactly one salted key each (cell*salt)
    cold = [r for r in rows if r["lat"] != 450_000_000]
    assert all(r["salted_cell"] % 8 == 0 for r in cold)
