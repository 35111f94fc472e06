"""Scalar/vector utility kernels.

Reference semantics: ``src/utils.rs:1-17`` — ``min_max`` canonical edge key,
``round`` to decimal places (Rust f64::round = half-away-from-zero, NOT numpy's
half-to-even — we replicate half-away-from-zero for golden-output parity), and
``round_mult`` round-to-multiple.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, places: int = 1):
    """Round to ``places`` decimals, ties away from zero (Rust f64::round parity)."""
    m = 10.0**places
    x = np.asarray(x, dtype=np.float64)
    out = np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m
    if out.ndim == 0:
        return float(out)
    return out


def round_mult(x, mult: int):
    """Round to the nearest multiple of ``mult`` (src/utils.rs:13-17)."""
    x = np.asarray(x, dtype=np.float64)
    out = (np.sign(x) * np.floor(np.abs(x) / mult + 0.5) * mult).astype(np.int64)
    if out.ndim == 0:
        return int(out)
    return out


def min_max(a, b):
    """Canonical undirected edge key: (min, max) element-wise (src/utils.rs:1-3)."""
    a = np.asarray(a)
    b = np.asarray(b)
    return np.minimum(a, b), np.maximum(a, b)
