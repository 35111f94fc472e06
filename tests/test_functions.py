"""Unit tests for scalar/vector kernels: haversine, rounding, cells, grouper, hashing."""

import numpy as np
import pytest

from osm_lump_ways_ray.functions.cells import (
    cell_id_fp,
    cell_id_sql,
    cell_neighbors,
    cell_parent,
    cell_res,
)
from osm_lump_ways_ray.functions.hashing import hash64, hash64_array, md5_hex
from osm_lump_ways_ray.functions.haversine import (
    haversine_m,
    haversine_m_fp,
    path_length_m_fp,
)
from osm_lump_ways_ray.functions.taggrouper import TagGrouper, group_key_values
from osm_lump_ways_ray.functions.tagfilter import DictTagView
from osm_lump_ways_ray.functions.utils import min_max, round_half_away, round_mult


def test_haversine_known_values():
    # one degree of latitude at the equator ≈ 111.2 km (mean-radius sphere)
    d = haversine_m(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]))
    assert abs(d[0] - 111_195.08) < 1.0
    # symmetric and zero at identity
    assert haversine_m(np.array([45.0]), np.array([9.0]), np.array([45.0]), np.array([9.0]))[0] == 0.0
    d1 = haversine_m(np.array([48.85]), np.array([2.35]), np.array([52.52]), np.array([13.40]))
    d2 = haversine_m(np.array([52.52]), np.array([13.40]), np.array([48.85]), np.array([2.35]))
    assert d1[0] == pytest.approx(d2[0])
    assert d1[0] == pytest.approx(877_460, rel=0.01)  # Paris–Berlin ≈ 877 km


def test_haversine_fixed_point_matches_degrees():
    lat1, lon1, lat2, lon2 = 48.85, 2.35, 52.52, 13.40
    d_deg = haversine_m(*[np.array([v]) for v in (lat1, lon1, lat2, lon2)])
    d_fp = haversine_m_fp(*[np.array([int(v * 1e7)]) for v in (lat1, lon1, lat2, lon2)])
    assert d_fp[0] == pytest.approx(d_deg[0], rel=1e-6)


def test_path_length():
    lats = np.array([0, 0, 0], dtype=np.int64) * 10_000_000
    lons = np.array([0, 1, 2], dtype=np.int64) * 10_000_000
    total = path_length_m_fp(lats, lons)
    seg = haversine_m(np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([1.0]))[0]
    assert total == pytest.approx(2 * seg)
    assert path_length_m_fp(lats[:1], lons[:1]) == 0.0


def test_round_half_away_from_zero():
    # Rust f64::round semantics, NOT banker's rounding
    assert round_half_away(0.25, 1) == 0.3
    assert round_half_away(-0.25, 1) == -0.3
    assert round_half_away(2.5, 0) == 3.0
    assert round_half_away(-2.5, 0) == -3.0
    assert round_half_away(1.04, 1) == 1.0
    np.testing.assert_allclose(round_half_away(np.array([0.15, 0.25]), 1), [0.2, 0.3])


def test_round_mult():
    assert round_mult(1234.0, 500) == 1000
    assert round_mult(1250.0, 500) == 1500
    np.testing.assert_array_equal(round_mult(np.array([100.0, 999.0]), 1000), [0, 1000])


def test_min_max():
    a, b = min_max(np.array([3, 1]), np.array([2, 5]))
    np.testing.assert_array_equal(a, [2, 1])
    np.testing.assert_array_equal(b, [3, 5])


def test_hash64_deterministic_positive():
    assert hash64("https://a.example/") == hash64("https://a.example/")
    assert hash64("x") != hash64("y")
    arr = hash64_array(["a", "b", "a"])
    assert arr[0] == arr[2] != arr[1]
    assert (arr > 0).all()
    assert md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"


def test_cells_roundtrip_and_hierarchy():
    lat = np.array([0, 45 * 10_000_000, -89 * 10_000_000], dtype=np.int64)
    lon = np.array([0, 90 * 10_000_000, -179 * 10_000_000], dtype=np.int64)
    c8 = cell_id_fp(lat, lon, 8)
    c4 = cell_id_fp(lat, lon, 4)
    np.testing.assert_array_equal(cell_res(c8), [8, 8, 8])
    np.testing.assert_array_equal(cell_parent(c8, 4), c4)
    # same point always same cell; nearby distinct points at high res differ
    assert cell_id_fp(lat[:1], lon[:1], 8)[0] == c8[0]
    n = cell_neighbors(int(c8[0]))
    assert int(c8[0]) in n and 4 <= len(n) <= 9


def test_cell_sql_parity():
    import duckdb

    lat = np.array([0, 451234567, -890000000, 899999999], dtype=np.int64)
    lon = np.array([0, 901234567, -1790000000, 1799999999], dtype=np.int64)
    ours = cell_id_fp(lat, lon, 7)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lat BIGINT, lon BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?,?)", [(int(a), int(b)) for a, b in zip(lat, lon)])
    sql = con.execute(f"SELECT {cell_id_sql('lat','lon',7)} FROM pts").fetchall()
    np.testing.assert_array_equal(ours, [r[0] for r in sql])


def test_taggrouper_coalesce():
    g = TagGrouper("name:en,name")
    assert g.get_value({"name": "X"}) == "X"
    assert g.get_value({"name:en": "E", "name": "X"}) == "E"
    assert g.get_value({"highway": "road"}) is None
    view = DictTagView([{"name": "X"}, {"name:en": "E"}, {}])
    np.testing.assert_array_equal(g.values(view), np.array(["X", "E", None], dtype=object))


def test_group_key_values_drop_unset():
    view = DictTagView([{"name": "A", "ref": "1"}, {"name": "B"}, {}])
    keys, keep = group_key_values(view, [TagGrouper("name"), TagGrouper("ref")])
    np.testing.assert_array_equal(keep, [True, False, False])
    assert keys[0] == "A\x1f1"
    keys2, keep2 = group_key_values(view, [TagGrouper("name")], incl_unset_group=True)
    np.testing.assert_array_equal(keep2, [True, True, True])
    assert keys2[2] == "\x00"


def test_parse_min_length_dsl_forms():
    """All accepted forms of way_group.rs:205-245, case-insensitive."""
    from osm_lump_ways_ray.functions.minlength import parse_min_length as p

    assert p("250").kind == "length" and p("250").value == 250.0
    assert p("5km") == p("5000m") == p("5000")
    assert p("10%longest").kind == "percent_longest"
    assert abs(p("10%longest").value - 0.10) < 1e-12
    assert p("90%total").kind == "percent_total"
    assert p("incl90%total").kind == "incl_total"
    assert p("INCL90%TOTAL").kind == "incl_total"  # lowercased first
    import pytest as _pytest
    with _pytest.raises(ValueError):
        p("nonsense%")


def test_vectorized_md5_parity_vs_hashlib():
    """md5_digests_ascii / md5_hex_of_digests are bit-identical to hashlib
    across the single-block (≤55), two-block (56-119) and fallback (>119)
    paths, including empty strings and non-ascii utf8."""
    import hashlib
    import random

    import pyarrow as pa

    from osm_lump_ways_ray.functions.hashing import (
        hash64, hash64_from_digests, md5_digests_ascii, md5_hex_of_digests)

    rng = random.Random(3)
    vals = ["", "x", "a" * 55, "b" * 56, "c" * 64, "d" * 119, "e" * 120,
            "f" * 300, "naïve café — ünïcode"]
    vals += ["".join(rng.choice("abc XYZ123:/.") for _ in range(rng.randint(0, 150)))
             for _ in range(200)]
    dig = md5_digests_ascii(pa.array(vals, pa.string()))
    hexes = md5_hex_of_digests(dig)
    h64 = hash64_from_digests(dig)
    for i, v in enumerate(vals):
        b = v.encode("utf-8")
        assert dig[i].tobytes() == hashlib.md5(b).digest()
        assert hexes[i] == hashlib.md5(b).hexdigest()
        assert h64[i] == hash64(v)
