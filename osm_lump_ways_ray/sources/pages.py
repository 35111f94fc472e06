"""Synthetic Common-Crawl-style ``pages`` table + derived OSM-shaped layers.

Schema (BASELINE.json input_hint): ``(url: string, warc_ts: timestamp[us],
html: binary, text: string, lang: string)``. Generation is deterministic per
(seed, row index) — independent of chunking/parallelism — so the same table can be
synthesized at any scale on any number of workers (no external data).

Derivations (SURVEY.md §7.1):

- ``extract``    — html → text, byte-identical per url (oracle:
  sources/reference_extract.py; gate: tests/test_pages.py).
- ``geocode``    — url → ``node_id`` (md5-based hash64) and i32 fixed-point
  ``(lat, lon)`` (degrees×1e7, mirroring src/nodeid_position.rs:97-101), plus the
  grid-cell id used as the spatial shuffle key.
- ``link``       — pages chained into an OSM-way-shaped table
  ``(way_id, node_ids: list<int64>, tags: map-ish struct, ts)``: CHAIN consecutive
  doc indexes share a way; consecutive ways share a boundary node unless the chain
  index hits a break, giving multi-way connected components with interior
  (degree-2) nodes for the contraction stage (reference M5).

Everything here is a plain function or a ``map_batches``-ready batch callable; no
ray.init, no global state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.cells import cell_id_fp
from ..functions.hashing import hash64

EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds
LANGS = ("en", "de", "fr", "es", "ga")

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor "
    "incididunt ut labore et dolore magna aliqua enim ad minim veniam quis nostrud "
    "exercitation ullamco laboris nisi aliquip ex ea commodo consequat duis aute "
    "irure in reprehenderit voluptate velit esse cillum eu fugiat nulla pariatur "
    "excepteur sint occaecat cupidatat non proident sunt culpa qui officia "
    "flumen rivus aqua pons vallis mons silva"
).split()[:64]
assert len(_WORDS) == 64

_HTML_PRE = (
    '<!DOCTYPE html><html><head><meta charset="utf-8"><title>{title}</title></head>'
    "<body><nav><a href=\"/\">home</a> | <a href=\"/about\">about</a></nav><article>"
)
_HTML_POST = "</article><footer>© example — synthetic corpus</footer></body></html>"

CHAIN_LEN = 6  # docs per derived way
BREAK_EVERY = 4  # every 4th way does NOT share a node with its predecessor


def _lcg(state: int) -> int:
    return (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)


_LCG_A = np.uint64(6364136223846793005)
_LCG_C = np.uint64(1442695040888963407)
_MAX_WORDS = 200  # nwords = 20 + h % 180 ≤ 199

# k-step LCG composition: state_k = A^k·s0 + C·(A^{k-1}+…+1)  (mod 2^64) —
# precomputed per k so a whole batch of texts is one (rows × words) matrix op
_APOW = np.empty(_MAX_WORDS, dtype=np.uint64)
_CACC = np.empty(_MAX_WORDS, dtype=np.uint64)
with np.errstate(over="ignore"):
    _a, _c = np.uint64(1), np.uint64(0)
    for _k in range(_MAX_WORDS):
        _a = _a * _LCG_A
        _c = _c * _LCG_A + _LCG_C
        _APOW[_k] = _a
        _CACC[_k] = _c
del _a, _c, _k
_WORDS_ARR = np.array(_WORDS)


def row_fields(seed: int, i: int) -> dict:
    """All synthesized fields of row ``i`` — the single source of truth."""
    h = hash64(f"{seed}:{i}")
    url = f"https://site{h % 1000}.example/p/{i}"
    lang = LANGS[h % len(LANGS)]
    ts = EPOCH_US + (h % 31_536_000) * 1_000_000
    nwords = 20 + h % 180
    state = h
    words = []
    for _ in range(nwords):
        state = _lcg(state)
        words.append(_WORDS[(state >> 32) % 64])
    text = " ".join(words)
    html = (_HTML_PRE.format(title=f"Page {i}") + text + _HTML_POST).encode("utf-8")
    return {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


_WORDS_PA = pa.array(_WORDS, pa.string())
_LANGS_PA = pa.array(LANGS, pa.string())
_HTML_PRE_A, _HTML_PRE_B = _HTML_PRE.split("{title}")


def synth_pages_batch(batch: pa.Table, seed: int) -> pa.Table:
    """map_batches body over ``ray.data.range(n)`` (column ``id``) → pages rows.

    VECTORIZED against ``row_fields`` (tests assert row-for-row identity): the
    per-word LCG chain is one uint64 matrix op via the precomputed k-step
    composition, and ALL string assembly (word join, url, html wrap) runs in
    Arrow C kernels (``binary_join`` / ``binary_join_element_wise`` — the r2
    per-row ``" ".join``/f-string loops were ~half the synth stage's CPU);
    only the md5 per row stays Python (the row hash is the corpus spec)."""
    import pyarrow.compute as pc

    ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    if n == 0:
        return pa.Table.from_arrays(
            [pa.array([], t) for t in (pa.string(), pa.timestamp("us"),
                                       pa.binary(), pa.string(), pa.string())],
            schema=PAGES_SCHEMA)
    ids_str = pc.cast(pa.array(ids, pa.int64()), pa.string())
    # row hash via the VECTORIZED single-block md5 (functions/hashing.py):
    # identical values to hash64(f"{seed}:{i}"), no per-row Python
    from ..functions.hashing import hash64_from_digests, md5_digests_ascii

    seed_keys = pc.binary_join_element_wise(f"{seed}:", ids_str, "")
    h = hash64_from_digests(md5_digests_ascii(seed_keys)).view(np.uint64)
    nwords = (20 + h % np.uint64(180)).astype(np.int64)
    # in-place LCG matrix + power-of-two mask: the broadcast-with-temporaries
    # form cost 24× in allocator/DRAM traffic, and uint64 `% 64` is a 20×
    # software modulo where `& 63` is one SIMD op (r4 measured; this stage was
    # ~60 % of the 10M-page derive wall)
    states = np.empty((n, _MAX_WORDS), np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound IS the LCG modulus
        np.multiply(h[:, None], _APOW[None, :], out=states)
        states += _CACC[None, :]
    states >>= np.uint64(32)
    states &= np.uint64(63)  # == % 64 (word-table size is a power of two)
    mask = np.arange(_MAX_WORDS, dtype=np.int64)[None, :] < nwords[:, None]
    # gather BEFORE narrowing: the masked rows skip the dead half of the
    # matrix, so the int32 conversion touches only real words
    flat_w = states[mask].astype(np.int32)  # row-major → runs stay contiguous
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(nwords, out=offs[1:])
    words_list = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()),
        pc.take(_WORDS_PA, pa.array(flat_w, pa.int32())))
    texts = pc.binary_join(words_list, " ")
    site_str = pc.cast(pa.array((h % np.uint64(1000)).astype(np.int64)),
                       pa.string())
    urls = pc.binary_join_element_wise(
        "https://site", site_str, ".example/p/", ids_str, "")
    langs = pc.take(_LANGS_PA,
                    pa.array((h % np.uint64(len(LANGS))).astype(np.int64)))
    ts = (np.int64(EPOCH_US) + (h % np.uint64(31_536_000)).astype(np.int64)
          * 1_000_000)
    htmls = pc.cast(pc.binary_join_element_wise(
        _HTML_PRE_A, "Page ", ids_str, _HTML_PRE_B, texts, _HTML_POST, ""),
        pa.binary())
    return pa.Table.from_arrays(
        [
            urls,
            pa.array(ts, pa.timestamp("us")),
            htmls,
            texts,
            langs,
        ],
        schema=PAGES_SCHEMA,
    )


def synth_pages_dataset(n: int, seed: int = 42, *, override_num_blocks: int | None = None):
    """Distributed synthesis: range → map_batches (no driver-side materialization)."""
    import ray.data

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    # batch_size bounds the per-task LCG/word matrices (~25 MB at 2048): at
    # 8192 the 32-way run saturated DRAM bandwidth and ANTI-scaled (measured
    # 6.5 s @32cpu vs 2.6 s with 2048 on the same 10^6 rows)
    return ds.map_batches(
        lambda b: synth_pages_batch(b, seed), batch_format="pyarrow", batch_size=2048
    )


def synth_pages_table(n: int, seed: int = 42) -> pa.Table:
    """Driver-side synthesis for tests/oracles (small n only)."""
    ids = pa.table({"id": pa.array(np.arange(n, dtype=np.int64))})
    return synth_pages_batch(ids, seed)


# ------------------------------------------------------------------ extract stage
_PRE_END = b"<article>"
_POST_START = b"</article>"


def extract_batch(batch: pa.Table) -> pa.Table:
    """Fast engine extractor: html → extracted_text (bytes of the article body).

    Tested byte-identical to sources/reference_extract.py AND to the ``text``
    column for every row (the per-row invariant in BASELINE.json input_hint).

    VECTORIZED (r3): start = C-kernel substring find; end = length-anchored
    (the closing tag opens the fixed footer, and the 64-word vocabulary cannot
    contain markup, so last-index == first-index == len − len(footer) on this
    corpus — the reference extractor remains the byte-level oracle in tests);
    the body bytes are per-row memcpy slices into one preallocated flat buffer
    (measured 6.7× faster than an arange/repeat fancy-gather: the gather moves
    ~16 B of int64 index traffic per output byte, the memcpy moves 1)."""
    import pyarrow.compute as pc

    html_col = batch["html"]
    arr = (html_col.combine_chunks() if isinstance(html_col, pa.ChunkedArray)
           else html_col)
    n = len(arr)
    if n == 0:
        return batch.append_column("extracted_text", pa.array([], pa.binary()))
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset: arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    rel_start = pc.find_substring(arr, _PRE_END.decode()) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    if (rel_start < 0).any():
        raise ValueError("html without <article> tag")
    starts = offsets[:-1] + rel_start + len(_PRE_END)
    ends = offsets[1:] - len(_HTML_POST.encode("utf-8"))  # footer has © (2 B)
    lens = ends - starts
    if (lens < 0).any():
        raise ValueError("html shorter than footer")
    cum = np.cumsum(lens)
    new_offs = np.zeros(n + 1, dtype=np.int32)
    new_offs[1:] = cum
    flat = np.empty(int(cum[-1]), dtype=np.uint8)
    pos = 0
    for s, ln in zip(starts.tolist(), lens.tolist()):
        flat[pos:pos + ln] = data[s:s + ln]
        pos += ln
    out = pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(new_offs), pa.py_buffer(flat)])
    return batch.append_column("extracted_text", out)


# ------------------------------------------------------------------ geocode stage
def geocode_batch(batch: pa.Table, cell_res: int = 7) -> pa.Table:
    """url → (node_id, lat, lon, cell). Deterministic md5 geocoding; lat/lon are
    i32 fixed-point degrees×1e7 (src/nodeid_position.rs:97-101 convention).

    ONE md5 per row (r2): node_id from digest bytes 0-7 (same value as before),
    lat/lon from bytes 8-11 / 12-15 — the round-1 version hashed three times
    per row, tripling the geocode stage's only real cost. r4: the per-row
    hashlib loop became the vectorized single-block md5 (urls are < 56 bytes;
    bit-identical, parity-tested)."""
    from ..functions.hashing import hash64_from_digests, md5_digests_ascii

    url_col = batch["url"]
    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    dig = md5_digests_ascii(url_col)
    node_id = hash64_from_digests(dig)
    b8_11 = dig[:, 8:12].copy().view(">u4").reshape(-1).astype(np.int64)
    b12_15 = dig[:, 12:16].copy().view(">u4").reshape(-1).astype(np.uint64)
    lat = b8_11 % 1_800_000_001 - 900_000_000
    lon = ((b12_15 * np.uint64(977)) % np.uint64(3_600_000_001)).astype(
        np.int64) - 1_800_000_000
    cells = cell_id_fp(lat, lon, cell_res)
    return (
        batch.append_column("node_id", pa.array(node_id, pa.int64()))
        .append_column("lat", pa.array(lat.astype(np.int32), pa.int32()))
        .append_column("lon", pa.array(lon.astype(np.int32), pa.int32()))
        .append_column("cell", pa.array(cells, pa.int64()))
    )


def doc_index_from_url(urls) -> np.ndarray:
    """Recover the doc index ``i`` from ``…/p/{i}`` (vectorized rsplit)."""
    return np.array([int(u.rsplit("/", 1)[1]) for u in urls], dtype=np.int64)


# --------------------------------------------------------------------- link stage
def link_pages_batch(batch: pa.Table) -> pa.Table:
    """Per-page way-membership rows: (way_id, seq, node_id, tags fields, ts).

    Doc ``i`` belongs to chain ``c = i // CHAIN_LEN`` at position ``i % CHAIN_LEN``.
    Chains where ``c % BREAK_EVERY != 0`` additionally START with the last node of
    chain ``c-1`` (shared boundary node → multi-chain components). The way's group
    tag ``name`` is ``g{c // BREAK_EVERY % 64}`` — constant across the linked run
    of chains, so tag-value lumping (M4 semantics) keeps runs intact; ``lang`` of
    the first doc is carried as a secondary tag.

    Emitted per page (one row; boundary duplication is resolved in the grouped
    assembly ``assemble_ways``): way_key, seq within way, node_id, ts.
    """
    urls = batch["url"].to_pylist()
    idx = doc_index_from_url(urls)
    node_id = batch["node_id"].to_numpy(zero_copy_only=False)
    ts = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    lang_arr = batch["lang"]
    lat = batch["lat"].to_numpy(zero_copy_only=False).astype(np.int64)
    lon = batch["lon"].to_numpy(zero_copy_only=False).astype(np.int64)

    chain = idx // CHAIN_LEN
    pos = idx % CHAIN_LEN
    # vectorized: every page emits one membership row; pages at a shared chain
    # boundary emit a second row for the NEXT chain's slot 0
    boundary = (pos == CHAIN_LEN - 1) & (((chain + 1) % BREAK_EVERY) != 0)
    bidx = np.where(boundary)[0]
    way_key = np.concatenate([chain, chain[bidx] + 1])
    seq = np.concatenate([pos + 1, np.zeros(len(bidx), dtype=pos.dtype)]).astype(np.int32)
    nodes = np.concatenate([node_id, node_id[bidx]])
    ts_out = np.concatenate([ts, np.zeros(len(bidx), dtype=np.int64)])
    lang_out = pa.concat_arrays([
        lang_arr.combine_chunks() if isinstance(lang_arr, pa.ChunkedArray) else lang_arr,
        pa.nulls(len(bidx), pa.string())])
    return pa.table(
        {
            "way_key": pa.array(way_key, pa.int64()),
            "seq": pa.array(seq, pa.int32()),
            "node_id": pa.array(nodes, pa.int64()),
            "ts": pa.array(ts_out, pa.int64()),
            "lang": lang_out,
            "lat": pa.array(np.concatenate([lat, lat[bidx]]), pa.int64()),
            "lon": pa.array(np.concatenate([lon, lon[bidx]]), pa.int64()),
        }
    )


def assemble_ways_partition(df):
    """map_groups body over a HASH PARTITION of membership rows (not one group
    per way — per-way map_groups costs one Python call per way, which at 10^12
    scale is the difference between minutes and days). Sorts the partition by
    (way_key, seq) and emits one way row per key via numpy run splitting.

    Output: (way_id, node_ids list<int64>, name, lang, ts) — OSM-way-shaped
    (FIXTURES.md §3). way_id = way_key + 1 (> 0, reference id assertion)."""
    import pandas as pd

    df = df.sort_values(["way_key", "seq"], kind="mergesort")
    keys = df["way_key"].to_numpy()
    nodes = df["node_id"].to_numpy()
    ts = df["ts"].to_numpy()
    langs = df["lang"].to_numpy()
    # i32 fixed-point (the reference's own storage width,
    # src/nodeid_position.rs:97-101): geometry lists dominate the ways/edges
    # tables' bytes — int32 halves the shuffle + object-store traffic
    lats = df["lat"].to_numpy().astype(np.int32)
    lons = df["lon"].to_numpy().astype(np.int32)
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    ends = np.r_[starts[1:], len(keys)]
    way_ids, names, out_langs, out_ts = [], [], [], []
    for s, e in zip(starts, ends):
        c = int(keys[s])
        way_ids.append(c + 1)
        names.append(f"g{(c // BREAK_EVERY) % 64}")
        lg = next((l for l in langs[s:e] if isinstance(l, str)), "en")
        out_langs.append(lg)
        out_ts.append(int(ts[s:e].max()))
    # Arrow list columns built from offsets directly — the node values are
    # already contiguous per way after the sort (no per-way Python lists);
    # positions travel as parallel list columns with the SAME offsets (the
    # InterStore/NodeIdPosition pattern: geometry rides the edge rows, so the
    # headline pipeline computes lengths without a position join)
    offsets = np.empty(len(starts) + 1, dtype=np.int32)
    offsets[:-1] = starts
    offsets[-1] = len(keys)
    off_arr = pa.array(offsets, pa.int32())
    node_ids = pa.ListArray.from_arrays(off_arr,
                                        pa.array(nodes.astype(np.int64), pa.int64()))
    lat_list = pa.ListArray.from_arrays(off_arr, pa.array(lats, pa.int32()))
    lon_list = pa.ListArray.from_arrays(off_arr, pa.array(lons, pa.int32()))
    return pa.table({
        "way_id": pa.array(way_ids, pa.int64()),
        "node_ids": node_ids,
        "node_lats": lat_list,
        "node_lons": lon_list,
        "name": pa.array(names, pa.string()),
        "lang": pa.array(out_langs, pa.string()),
        "ts": pa.array(out_ts, pa.int64()),
    })


def derive_ways(pages_geo_ds, *, num_partitions: int = 32):
    """pages (geocoded) → ways Dataset. One groupby shuffle keyed by a hash
    partition of way_key (ways assembled vectorized per partition)."""
    member = pages_geo_ds.map_batches(link_pages_batch, batch_format="pyarrow")

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch["way_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
                ).astype(np.int64) % num_partitions
        return batch.append_column("part", pa.array(part, pa.int64()))

    return member.map_batches(add_part, batch_format="pyarrow") \
                 .groupby("part").map_groups(assemble_ways_partition,
                                             batch_format="pandas")
