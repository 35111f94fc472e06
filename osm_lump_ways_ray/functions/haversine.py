"""Vectorized haversine great-circle distance.

Reference semantics: ``src/haversine.rs:6-38`` computes haversine metres via the Rust
``geo`` crate (mean earth radius 6 371 008.8 m). Inputs there are i32 fixed-point
degrees × 1e7 (``src/nodeid_position.rs:97-101``); we keep the same fixed-point
convention so lengths match at output precision.

This is a pure numpy kernel intended to run inside ``map_batches`` — never per row.
"""

from __future__ import annotations

import numpy as np

MEAN_EARTH_RADIUS_M = 6_371_008.8  # same constant as the geo crate
FIXED_POINT = 1e7  # i32 degrees*1e7, per src/nodeid_position.rs:97-101


def haversine_m(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Distance in metres between degree-valued coordinate arrays."""
    la1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lo1 = np.radians(np.asarray(lon1, dtype=np.float64))
    la2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lo2 = np.radians(np.asarray(lon2, dtype=np.float64))
    s_lat = np.sin((la2 - la1) * 0.5)
    s_lon = np.sin((lo2 - lo1) * 0.5)
    a = s_lat * s_lat + np.cos(la1) * np.cos(la2) * s_lon * s_lon
    return 2.0 * MEAN_EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def haversine_m_fp(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Distance in metres between i32 fixed-point (degrees × 1e7) coordinate arrays."""
    return haversine_m(
        np.asarray(lat1, dtype=np.float64) / FIXED_POINT,
        np.asarray(lon1, dtype=np.float64) / FIXED_POINT,
        np.asarray(lat2, dtype=np.float64) / FIXED_POINT,
        np.asarray(lon2, dtype=np.float64) / FIXED_POINT,
    )


def path_length_m_fp(lats: np.ndarray, lons: np.ndarray) -> float:
    """Total haversine length of an ordered fixed-point polyline (pairwise sum).

    Mirrors ``haversine_m_arr_ordered`` (src/haversine.rs:24-33).
    """
    lats = np.asarray(lats)
    lons = np.asarray(lons)
    if len(lats) < 2:
        return 0.0
    return float(np.sum(haversine_m_fp(lats[:-1], lons[:-1], lats[1:], lons[1:])))
