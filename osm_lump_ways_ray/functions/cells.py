"""Hierarchical grid-cell spatial index (H3/S2 analog, pure integer arithmetic).

No ``h3`` library exists in this environment, so we use a deterministic hierarchical
lat/lon quad grid with the same *role* H3 plays in the design (BASELINE.json north
rule): cell ids key the spatial shuffles (node-id join partitioning, tile
assignment, PIP prefilter, kNN neighborhoods), parents/children give the
resolution hierarchy, and the arithmetic is SQL-expressible so DuckDB oracles can
reproduce cell assignment exactly.

Layout of a cell id (int64):  ``res (5 bits) << 58 | lat_bucket << 29 | lon_bucket``
with ``lat_bucket = floor((lat_e7 + 900e6) * 2^res / (1800e6 + 1))`` and similarly
for lon over 3600e6 — inputs are i32 fixed-point degrees×1e7
(src/nodeid_position.rs:97-101 convention). Max res 28.
"""

from __future__ import annotations

import numpy as np

LAT_SPAN = 1_800_000_001  # +1 so lat=+90° lands in the last bucket
LON_SPAN = 3_600_000_001
MAX_RES = 28


def cell_id_fp(lat_e7, lon_e7, res: int) -> np.ndarray:
    """Cell id at resolution ``res`` for fixed-point coordinate arrays."""
    assert 0 <= res <= MAX_RES
    n = np.int64(1) << res
    lat = np.asarray(lat_e7, dtype=np.int64) + 900_000_000
    lon = np.asarray(lon_e7, dtype=np.int64) + 1_800_000_000
    latb = (lat * n) // LAT_SPAN
    lonb = (lon * n) // LON_SPAN
    return (np.int64(res) << 58) | (latb << 29) | lonb


def cell_parent(cell, parent_res: int) -> np.ndarray:
    """Ancestor cell at a coarser resolution."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> 58
    latb = (cell >> 29) & ((1 << 29) - 1)
    lonb = cell & ((1 << 29) - 1)
    shift = res - parent_res
    return (np.int64(parent_res) << 58) | ((latb >> shift) << 29) | (lonb >> shift)


def cell_res(cell) -> np.ndarray:
    return np.asarray(cell, dtype=np.int64) >> 58


def cell_neighbors(cell: int) -> list[int]:
    """The ≤9 cells (self + 8-neighborhood) around a cell at its own resolution.

    Used as the candidate prefilter for kNN joins (SURVEY.md §7.2 step 8); lon
    wraps around the antimeridian, lat clamps at the poles.
    """
    cell = int(cell)
    res = cell >> 58
    n = 1 << res
    latb = (cell >> 29) & ((1 << 29) - 1)
    lonb = cell & ((1 << 29) - 1)
    out = []
    for dla in (-1, 0, 1):
        la = latb + dla
        if la < 0 or la >= n:
            continue
        for dlo in (-1, 0, 1):
            lo = (lonb + dlo) % n
            out.append((res << 58) | (la << 29) | lo)
    return out


def cell_id_sql(lat_col: str, lon_col: str, res: int) -> str:
    """DuckDB SQL expression computing the identical cell id (oracle parity)."""
    n = 1 << res
    return (
        f"(({res}::BIGINT << 58) | "
        f"((({lat_col}::BIGINT + 900000000) * {n}) // {LAT_SPAN} << 29) | "
        f"((({lon_col}::BIGINT + 1800000000) * {n}) // {LON_SPAN}))"
    )
