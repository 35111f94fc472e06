"""raster_to_vector: band quantization + 4-connected region merge on a
hand-built point field with known regions."""

import numpy as np
import pyarrow as pa

from osm_lump_ways_ray.functions.cells import cell_id_fp
from osm_lump_ways_ray.stages.spatial import raster_to_vector


def _points_for_cells(cells_counts, res):
    """Synthesize fixed-point points: ``counts[latb, lonb]`` points centered in
    each named bucket of the res grid."""
    from osm_lump_ways_ray.functions.cells import LAT_SPAN, LON_SPAN

    n = 1 << res
    lats, lons = [], []
    for (latb, lonb), cnt in cells_counts.items():
        lat = (latb * LAT_SPAN + LAT_SPAN // 2) // n - 900_000_000
        lon = (lonb * LON_SPAN + LON_SPAN // 2) // n - 1_800_000_000
        lats += [lat] * cnt
        lons += [lon] * cnt
    return np.array(lats, np.int64), np.array(lons, np.int64)


def test_raster_to_vector_regions(ray_session):
    import ray.data

    res = 4
    # two 4-connected high-count regions separated by a low-count band, plus
    # a diagonal-only pair (must NOT merge: 4-connectivity)
    cells = {
        (3, 3): 10, (3, 4): 10, (4, 4): 10,      # region A (band hi)
        (3, 5): 1,                               # low band separator
        (3, 6): 10, (3, 7): 10,                  # region B (band hi)
        (8, 8): 10, (9, 9): 10,                  # diagonal pair: 2 regions
    }
    lat, lon = _points_for_cells(cells, res)
    # verify the synthesized points land in the intended buckets
    got_cells = cell_id_fp(lat, lon, res)
    mask = np.int64((1 << 29) - 1)
    assert set(zip(((got_cells >> 29) & mask).tolist(),
                   (got_cells & mask).tolist())) == set(cells)

    ds = ray.data.from_arrow(pa.table({
        "lat": pa.array(lat, pa.int64()), "lon": pa.array(lon, pa.int64())}))
    out = raster_to_vector(ds, res=res, n_bands=4).to_pandas() \
        .sort_values(["band", "lat_lo", "lon_lo"]).reset_index(drop=True)
    # max_n = 10 → band(10) = 40 // 11 = 3, band(1) = 4 // 11 = 0
    hi = out[out.band == 3]
    lo = out[out.band == 0]
    assert len(lo) == 1 and lo.n_cells.iloc[0] == 1 and lo.total_n.iloc[0] == 1
    assert len(hi) == 4  # A, B, and the two diagonal singletons
    sizes = sorted(hi.n_cells)
    assert sizes == [1, 1, 2, 3]
    a = hi[hi.n_cells == 3].iloc[0]
    assert (a.lat_lo, a.lat_hi, a.lon_lo, a.lon_hi) == (3, 4, 3, 4)
    assert a.total_n == 30
    b = hi[hi.n_cells == 2].iloc[0]
    assert (b.lat_lo, b.lat_hi, b.lon_lo, b.lon_hi) == (3, 3, 6, 7)
