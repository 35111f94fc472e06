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


# ───────────────────────── vectorized single-block md5 (RFC 1321, ≤55 bytes)
# The synth/geocode stages hash one SHORT ascii string per row (ids, urls —
# always < 56 bytes), i.e. a single md5 compression-function block. Running
# the 64 rounds as numpy uint32 vector ops over the whole batch removes the
# last per-row Python loops from the derive phase (measured: the two hashlib
# loops were ~⅓ of the 10M-page headline wall). Values are BIT-IDENTICAL to
# hashlib.md5 (parity-tested in tests/test_functions.py).

_MD5_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)
_MD5_S = np.array([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
                  + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4, dtype=np.uint32)
_MD5_K = np.array([int(abs(__import__("math").sin(i + 1)) * (1 << 32))
                   & 0xFFFFFFFF for i in range(64)], dtype=np.uint32)
_MD5_G = np.array([i for i in range(16)]
                  + [(5 * i + 1) % 16 for i in range(16, 32)]
                  + [(3 * i + 5) % 16 for i in range(32, 48)]
                  + [(7 * i) % 16 for i in range(48, 64)], dtype=np.int64)


def _md5_compress(m16: np.ndarray, state):
    """One md5 compression over ``m16`` (n, 16) little-endian uint32 blocks,
    chained from ``state`` (4 uint32 arrays) → new state. All-numpy; uint32
    wraparound is the modulus."""
    a0, b0, c0, d0 = state
    a, b, c, d = a0, b0, c0, d0
    with np.errstate(over="ignore"):
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            x = a + f + _MD5_K[i] + m16[:, _MD5_G[i]]
            s = _MD5_S[i]
            x = (x << s) | (x >> np.uint32(32 - s))
            a, d, c, b = d, c, b, b + x
        return (a0 + a, b0 + b, c0 + c, d0 + d)


def _md5_init_state(n: int):
    return tuple(np.full(n, v, np.uint32) for v in _MD5_INIT)


def _state_to_digest(state) -> np.ndarray:
    a, b, c, d = state
    out = np.empty((len(a), 4), dtype="<u4")
    out[:, 0], out[:, 1], out[:, 2], out[:, 3] = a, b, c, d
    return out.view(np.uint8).reshape(len(a), 16)


def _md5_single_block(m16: np.ndarray) -> np.ndarray:
    return _state_to_digest(_md5_compress(m16, _md5_init_state(len(m16))))


def _md5_blocks_of(msgs: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """(n, w) uint8 message matrix (zero-padded) + byte lengths (≤ 55) →
    (n, 16) little-endian uint32 single md5 blocks (0x80 marker + bit count)."""
    n, w = msgs.shape
    assert lens.max(initial=0) <= 55, "single-block md5 needs ≤ 55 bytes"
    block = np.zeros((n, 64), np.uint8)
    block[:, :w] = msgs
    block[np.arange(n), lens] = 0x80
    block[:, 56:64] = (lens.astype("<u8") * 8).view(np.uint8).reshape(n, 8)
    return block.view("<u4")


def _md5_two_blocks(msgs: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Two-block path for 56..119-byte messages: raw first block, padded
    second, chained compression. Same bit-identical contract."""
    n, w = msgs.shape
    assert lens.max(initial=0) <= 119, "two-block md5 needs ≤ 119 bytes"
    buf = np.zeros((n, 128), np.uint8)
    buf[:, :w] = msgs
    buf[np.arange(n), lens] = 0x80
    buf[:, 120:128] = (lens.astype("<u8") * 8).view(np.uint8).reshape(n, 8)
    state = _md5_compress(buf[:, :64].copy().view("<u4"), _md5_init_state(n))
    return _state_to_digest(_md5_compress(buf[:, 64:].copy().view("<u4"),
                                          state))


def md5_digests_ascii(strings_arrow) -> np.ndarray:
    """(n, 16) uint8 md5 digests of an Arrow string/binary array of SHORT
    (≤ 55 byte) values, entirely vectorized: the value bytes are gathered
    from the Arrow data buffer with one fancy index, padded, and pushed
    through the vectorized compression function."""
    import pyarrow as pa

    arr = strings_arrow
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 16), np.uint8)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset: arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = offsets[1:] - offsets[:-1]
    w = int(lens.max(initial=0))
    idx = offsets[:-1, None] + np.arange(w, dtype=np.int64)[None, :]
    np.minimum(idx, len(data) - 1, out=idx)
    msgs = data[idx]
    msgs[np.arange(w)[None, :] >= lens[:, None]] = 0
    if w <= 55:
        return _md5_single_block(_md5_blocks_of(msgs, lens))
    out = np.empty((n, 16), np.uint8)
    short = lens <= 55
    if short.any():
        ws = int(lens[short].max(initial=0))
        out[short] = _md5_single_block(
            _md5_blocks_of(msgs[short][:, :max(ws, 1)], lens[short]))
    mid = ~short & (lens <= 119)
    if mid.any():
        out[mid] = _md5_two_blocks(msgs[mid][:, :min(w, 119)], lens[mid])
    rest = lens > 119
    if rest.any():  # arbitrary length: hashlib loop on just those rows
        for i in np.flatnonzero(rest):
            out[i] = np.frombuffer(
                hashlib.md5(msgs[i, :lens[i]].tobytes()).digest(), np.uint8)
    return out


_HEXCHARS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def md5_hex_of_digests(dig: np.ndarray) -> np.ndarray:
    """(n, 16) digest matrix → numpy array of 32-char lowercase hex strings
    (vectorized nibble lookup)."""
    n = len(dig)
    hx = np.empty((n, 32), np.uint8)
    hx[:, 0::2] = _HEXCHARS[dig >> 4]
    hx[:, 1::2] = _HEXCHARS[dig & 0x0F]
    return hx.view("S32").reshape(n).astype("U32")


def hash64_from_digests(dig: np.ndarray) -> np.ndarray:
    """digest matrix → hash64 semantics (big-endian first 8 bytes, 63-bit
    positive, 0 → 1) as int64."""
    h = dig[:, :8].copy().view(">u8").reshape(-1).astype(np.uint64)
    h &= np.uint64(_I63)
    h[h == 0] = 1
    return h.astype(np.int64)
