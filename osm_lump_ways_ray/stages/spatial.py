"""Spatial operators over the grid-cell index (north rule): tile assignment,
point-in-polygon join, kNN spatial join, hot-cell repartitioning.

The reference's only spatial stage is the country-boundary point-in-polygon
geocode (T1/J5, src/bin/osm-lump-ways-down/main.rs:309, :573-579 — a polygon
index loaded once and queried per point). Generalized here:

- PIP: polygons broadcast once (``ray.put``), evaluated vectorized per batch in
  an actor pool; a cell-prefilter (polygon bbox → covered cells) skips points
  whose cell intersects no polygon.
- kNN join: candidate pairs via cell neighborhoods, exact haversine among
  candidates, global argmin per left row. Degenerate small anchor sets use the
  broadcast path (anchor matrix ⋈ every batch).
- hot cells: ``salt_hot_cells`` splits any cell whose row count exceeds a
  threshold into ``salt`` sub-keys (explicit skew-aware repartitioning).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from ..functions.cells import cell_id_fp
from ..functions.haversine import haversine_m_fp


def assign_tiles(ds, *, lat_col: str = "lat", lon_col: str = "lon", res: int = 6,
                 out_col: str = "cell"):
    """Raster→vector tile assignment: every row gets its grid cell id."""

    def assign(batch: pa.Table) -> pa.Table:
        cells = cell_id_fp(
            batch[lat_col].to_numpy(zero_copy_only=False),
            batch[lon_col].to_numpy(zero_copy_only=False), res)
        return batch.append_column(out_col, pa.array(cells, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def salt_hot_cells(ds, *, cell_col: str = "cell", threshold: int = 100_000,
                   salt: int = 16, id_col: str = "node_id"):
    """Explicit skew handling: cells with > threshold rows get their key salted
    into ``salt`` sub-keys (cell*salt + id%salt); cold cells keep cell*salt.
    Downstream groupbys on ``salted_cell`` see bounded partition sizes; a final
    tiny re-aggregate on ``cell`` merges the salted partials."""
    from ray.data.aggregate import Count

    counts = ds.groupby(cell_col).aggregate(Count(alias_name="n"))
    hot = {r[cell_col] for r in counts.take_all() if r["n"] > threshold}
    import ray

    hot_ref = ray.put(hot)

    def add_salt(batch: pa.Table) -> pa.Table:
        h = ray.get(hot_ref)
        cells = batch[cell_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        salted = cells.astype(np.int64) * salt
        mask = np.isin(cells, list(h)) if h else np.zeros(len(cells), dtype=bool)
        salted = np.where(mask, salted + (ids % salt), salted)
        return batch.append_column("salted_cell", pa.array(salted, pa.int64()))

    return ds.map_batches(add_salt, batch_format="pyarrow")


# ------------------------------------------------------------------------- PIP

class Polygon:
    """Simple polygon (fixed-point i32 vertex ring, implicit closure)."""

    __slots__ = ("name", "lats", "lons")

    def __init__(self, name: str, ring: Sequence[tuple]):
        self.name = name
        self.lats = np.array([p[0] for p in ring], dtype=np.float64)
        self.lons = np.array([p[1] for p in ring], dtype=np.float64)

    def contains(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """Vectorized even-odd ray casting (standard published algorithm)."""
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        inside = np.zeros(len(lat), dtype=bool)
        n = len(self.lats)
        j = n - 1
        for i in range(n):
            yi, xi = self.lats[i], self.lons[i]
            yj, xj = self.lats[j], self.lons[j]
            cond = (yi > lat) != (yj > lat)
            with np.errstate(divide="ignore", invalid="ignore"):
                xcross = (xj - xi) * (lat - yi) / (yj - yi) + xi
            inside ^= cond & (lon < xcross)
            j = i
        return inside


class PIPGeocoder:
    """Actor-pool stage (reference T1): polygons loaded ONCE per actor from the
    object store; per batch, each point gets the FIRST containing polygon's name
    (polygons checked in order — mirrors the reference's sorted-area convention,
    -down/main.rs:573-579) or ``unknown_area``."""

    def __init__(self, polygons_ref, lat_col: str = "lat", lon_col: str = "lon"):
        import ray

        self.polys = ray.get(polygons_ref) if not isinstance(polygons_ref, list) else polygons_ref
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        out = np.full(len(lat), "unknown_area", dtype=object)
        unassigned = np.ones(len(lat), dtype=bool)
        for poly in self.polys:
            if not unassigned.any():
                break
            hit = unassigned & poly.contains(lat, lon)
            out[hit] = poly.name
            unassigned &= ~hit
        return batch.append_column("area", pa.array(out, pa.string()))


def pip_join(ds, polygons: list, *, lat_col: str = "lat", lon_col: str = "lon",
             concurrency=None):
    import ray

    ref = ray.put(polygons)
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(2, ncpu))
    return ds.map_batches(
        PIPGeocoder,
        fn_constructor_kwargs=dict(polygons_ref=ref, lat_col=lat_col, lon_col=lon_col),
        batch_format="pyarrow", concurrency=concurrency,
    )


# --------------------------------------------------------------------- kNN join

class NearestAnchor:
    """Broadcast kNN join: for each row, the nearest anchor point by haversine
    (deterministic tie-break: smaller anchor id). Anchor matrix shipped once.

    Scale path (documented): when the anchor side outgrows a broadcast, bucket
    both sides by cell and probe cell neighborhoods (functions.cells
    ``cell_neighbors``), falling back to ring expansion for empty neighborhoods —
    the SIGMOD'21 stream-KNN-join partitioning pattern."""

    def __init__(self, anchors_ref, lat_col: str = "lat", lon_col: str = "lon"):
        import ray

        ids, lats, lons = ray.get(anchors_ref) if not isinstance(anchors_ref, tuple) else anchors_ref
        order = np.argsort(ids)
        self.aid = np.asarray(ids)[order]
        self.alat = np.asarray(lats, dtype=np.float64)[order]
        self.alon = np.asarray(lons, dtype=np.float64)[order]
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        best_id = np.empty(len(lat), dtype=np.int64)
        best_dm = np.empty(len(lat), dtype=np.int64)
        # chunk anchors to bound the (rows × anchors) distance matrix
        step = max(1, 4_000_000 // max(1, len(lat)))
        best = np.full(len(lat), np.inf)
        best_idx = np.zeros(len(lat), dtype=np.int64)
        for s in range(0, len(self.aid), step):
            d = haversine_m_fp(
                lat[:, None], lon[:, None],
                self.alat[None, s:s + step], self.alon[None, s:s + step])
            idx = np.argmin(d, axis=1)  # ties → lowest index = lowest anchor id
            dmin = d[np.arange(len(lat)), idx]
            better = dmin < best
            best[better] = dmin[better]
            best_idx[better] = idx[better] + s
        best_id = self.aid[best_idx]
        best_dm = np.floor(best * 10 + 0.5).astype(np.int64)  # decimetres, exact compare
        return batch.append_column("nearest_anchor", pa.array(best_id, pa.int64())) \
                    .append_column("anchor_dist_dm", pa.array(best_dm, pa.int64()))


def knn_join_broadcast(ds, anchors: tuple, *, lat_col: str = "lat",
                       lon_col: str = "lon", concurrency=None):
    import ray

    ref = ray.put(anchors)
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(2, ncpu))
    return ds.map_batches(
        NearestAnchor,
        fn_constructor_kwargs=dict(anchors_ref=ref, lat_col=lat_col, lon_col=lon_col),
        batch_format="pyarrow", concurrency=concurrency,
    )
