"""Deterministic, platform-stable hashing used for ids, geocoding and dedup.

All hashes are md5-based (never Python's salted ``hash``), so every worker process,
every run, and the DuckDB oracle (``md5()``) agree byte-for-byte.
"""

from __future__ import annotations

import hashlib

import numpy as np

_I63 = (1 << 63) - 1


def hash64(value) -> int:
    """63-bit positive deterministic hash of a str/bytes value (ids must be > 0,
    mirroring the reference's id assertion at src/bin/osm-lump-ways/main.rs:271)."""
    if isinstance(value, str):
        value = value.encode("utf-8")
    h = int.from_bytes(hashlib.md5(value).digest()[:8], "big") & _I63
    return h if h > 0 else 1


def hash64_array(values) -> np.ndarray:
    """Vectorized-ish hash64 over an iterable of strings → int64 ndarray.

    md5 per element is C-speed; the Python loop is acceptable for the geocode /
    synth stages where it is used (not in shuffle-side hot loops).
    """
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        out[i] = hash64(v)
    return out


def md5_hex(value) -> str:
    if isinstance(value, str):
        value = value.encode("utf-8")
    return hashlib.md5(value).hexdigest()


def md5_hex_array(values) -> np.ndarray:
    return np.array([md5_hex(v) for v in values], dtype=object)
