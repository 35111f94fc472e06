"""Deduplication family for training-data pipelines (graft extension surface):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design (ray_guide "Aggregation at scale" patterns):

- exact: content hash per batch (vectorized md5) → ``groupby(hash)`` → keep the
  min-id representative. Hash-partitioned; no skew (md5 keys are uniform).
- MinHash+LSH: per-batch shingle→minhash signatures (numpy, k hash functions via
  one multiply-shift family over crc-like base hashes) → explode to
  (band, band_hash, doc) rows → ``groupby`` band buckets → candidate pairs →
  exact-Jaccard verification → min-label connected components over the
  candidate-pair graph (stages.graph.connected_components — dup clusters ARE
  components).
- SimHash: 64-bit signed-projection signature; near-dups = equal signatures
  (or equal in any of 4 16-bit bands for hamming≤k candidates).
- n-gram Jaccard: exact pairwise verify used by the LSH path; also exposed
  standalone for small candidate sets.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_hex_array

_MERSENNE = (1 << 61) - 1


_MIX = np.uint64(0x9E3779B97F4A7C15)
# fixed odd word-position constants — the shingle hash family is part of the
# signature format (same 3 words → same hash; any well-mixed family is valid:
# the LSH recall argument and the exact-Jaccard verify are hash-agnostic).
# MUST be ≥ the largest window width in use: the combine is XOR (commutative),
# so constants repeating with period p would make windows equal-up-to-swapping
# words at distance p collide — observed as a real false dup at W=8 with the
# original 5 constants. 16 covers every shingle/window family shipped.
_POS_C = np.array([0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5,
                   0x9E3779B97F4A7C15, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53,
                   0x2545F4914F6CDD1D, 0xD6E8FEB86659FD93, 0xA3B195354A39B70D,
                   0x1B03738712FAD5C9, 0xE7037ED1A0B428DB, 0x8EBC6AF09C88C6E3,
                   0x589965CC75374CC3, 0x1D8E4E27C47D124F, 0xEB44ACCAB455D165,
                   0x97C29B3A0AB4E7F1], dtype=np.uint64)


def _avalanche(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * _MIX
        h = h ^ (h >> np.uint64(29))
    return h


def _word_hashes(flat_words: np.ndarray) -> np.ndarray:
    """uint64 hash per word — one vectorized cython pass (pandas siphash,
    fixed default key → platform/run stable), replacing the per-shingle
    Python md5 loop the r2 verdict flagged as the slowest stage."""
    import pandas as pd

    return pd.util.hash_array(flat_words)


def _shingle_hashes_batch(texts: pa.Array, k: int):
    """All word-k-shingle hashes of a batch in numpy passes.

    Returns (sh: uint64 array of every doc's shingle hashes concatenated in
    doc order, starts: int64 per-doc segment starts for ``reduceat``).
    Docs with fewer than k words contribute ONE shingle = the whole text
    (same semantics as the scalar path)."""
    import pandas as pd
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
    wh = _word_hashes(flat).astype(np.uint64)

    assert k <= len(_POS_C), \
        f"window width {k} exceeds the {len(_POS_C)} position constants " \
        "(XOR combine would collide on distance-p word swaps)"
    n_docs = len(counts)
    total = len(wh)
    # window start s is valid iff the whole k-window stays inside one doc
    n_starts = max(total - k + 1, 0)
    sh = np.zeros(n_starts, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            sh ^= wh[j:n_starts + j] * _POS_C[j % len(_POS_C)]
    sh = _avalanche(sh)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    valid = doc_of[:n_starts] == doc_of[k - 1:k - 1 + n_starts] \
        if n_starts else np.zeros(0, dtype=bool)
    sh_valid = sh[valid]  # ordered by (doc, position)

    counts_out = np.where(counts >= k, counts - k + 1, 1)
    ends = np.cumsum(counts_out)
    starts = ends - counts_out
    out = np.empty(int(ends[-1]) if n_docs else 0, dtype=np.uint64)
    long_mask = counts >= k
    if long_mask.any():
        cl = counts_out[long_mask]
        within = np.arange(int(cl.sum()), dtype=np.int64)
        within -= np.repeat(np.cumsum(cl) - cl, cl)
        out[np.repeat(starts[long_mask], cl) + within] = sh_valid
    short_mask = ~long_mask
    if short_mask.any():
        short_texts = texts.to_numpy(zero_copy_only=False)[short_mask]
        out[starts[short_mask]] = _avalanche(
            pd.util.hash_array(short_texts).astype(np.uint64))
    return out, starts


def minhash_signature(text: str, num_perm: int = 64, shingle_k: int = 3,
                      _ab: tuple = None) -> np.ndarray:
    """num_perm-wide MinHash over word shingles (multiply-shift permutations).
    Scalar convenience wrapper over the vectorized batch path."""
    base, _ = _shingle_hashes_batch(pa.array([text], pa.string()), shingle_k)
    a, b = _ab if _ab is not None else _perm_params(num_perm)
    with np.errstate(over="ignore"):
        h = (base[None, :] * a[:, None] + b[:, None])
    return h.min(axis=1)


def _perm_params(num_perm: int):
    rng = np.random.RandomState(12345)  # fixed seed — signatures are part of the format
    a = rng.randint(1, 1 << 61, size=num_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 1 << 61, size=num_perm).astype(np.uint64)
    return a, b


class MinHashLSH:
    """Actor-pool stage: text → (doc_id, band, band_hash) rows for LSH bucketing.

    Permutation params are built ONCE per actor in __init__ (reference pattern
    T2 — stateful setup per worker, not per batch)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col
        self._ab = _perm_params(num_perm)
        rng = np.random.RandomState(54321)  # band-combine constants: format
        self._bc = (rng.randint(1, 1 << 61, size=self.rows_per_band)
                    .astype(np.uint64) * np.uint64(2) + np.uint64(1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(ids)
        if n_docs == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.int64())})
        sh, starts = _shingle_hashes_batch(batch[self.text_col], self.shingle_k)
        a, b = self._ab
        # one perm at a time over a REUSED buffer: the (num_perm, Σshingles)
        # matrix is tens of MB of FRESH pages per batch, and first-touch page
        # faults dominate its cost (measured 3-8 s vs 0.06 s for this loop)
        sig = np.empty((self.num_perm, len(starts)), dtype=np.uint64)
        tmp = np.empty(len(sh), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for p in range(self.num_perm):
                np.multiply(sh, a[p], out=tmp)
                np.add(tmp, b[p], out=tmp)
                sig[p] = np.minimum.reduceat(tmp, starts)
        # band hash = avalanche of the constant-mixed XOR of the band's rows —
        # replaces the per-doc per-band Python md5 loop (r2 verdict hot spot)
        sig3 = sig.reshape(self.bands, self.rows_per_band, n_docs)
        with np.errstate(over="ignore"):
            bh = (sig3 * self._bc[None, :, None]).astype(np.uint64)
        acc = bh[:, 0, :].copy()
        for j in range(1, self.rows_per_band):
            acc ^= bh[:, j, :]
        acc = _avalanche(acc) >> np.uint64(1)          # positive int64 range
        return pa.table({
            "doc": pa.array(np.repeat(ids, self.bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32),
                                     n_docs), pa.int32()),
            "band_hash": pa.array(acc.T.ravel().astype(np.int64), pa.int64()),
        })


_PAIR_CAP = 200  # all-pairs guard: above this a bucket degrades to star+chain


def _bucket_segments(key_arrays, tail):
    """Sort rows by (``key_arrays``…, ``tail``) and return (order, starts,
    sizes) of the equal-key segments — the vectorized replacement for a
    one-Python-call-per-bucket ``map_groups`` (r3: at sf0.1 the LSH bucket
    table is ~80k rows of mostly singleton buckets; per-group dispatch
    overhead dominated the whole minhash pipeline)."""
    order = np.lexsort((tail, *key_arrays[::-1]))
    n = len(order)
    boundary = np.zeros(n, dtype=bool)
    boundary[0] = True
    for a in key_arrays:
        s = a[order]
        boundary[1:] |= s[1:] != s[:-1]
    starts = np.nonzero(boundary)[0]
    sizes = np.diff(np.append(starts, n))
    return order, starts, sizes


def _emit_capped_pairs(d: np.ndarray, us: list, vs: list, what: str) -> None:
    """Append all-pairs of the sorted unique doc array ``d`` (star+chain above
    ``_PAIR_CAP`` — connectivity preserved, warning logged)."""
    n = len(d)
    if n * (n - 1) // 2 > _PAIR_CAP:
        import logging

        logging.getLogger(__name__).warning(
            "%s bucket with %d docs exceeds all-pairs cap %d; degrading to "
            "star+chain pairs (%d pairs, connectivity preserved)",
            what, n, _PAIR_CAP, 2 * (n - 1))
        us.append(np.full(n - 1, d[0], dtype=np.int64))
        vs.append(d[1:].astype(np.int64))
        us.append(d[:-1].astype(np.int64))
        vs.append(d[1:].astype(np.int64))
    else:
        iu, ju = np.triu_indices(n, k=1)
        us.append(d[iu].astype(np.int64))
        vs.append(d[ju].astype(np.int64))


_EMPTY_PAIRS = pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64())})


def _partition_pairs(batch: pa.Table) -> pa.Table:
    """One pbucket partition of (band, band_hash, doc) rows → candidate pairs
    for EVERY bucket inside it, segment boundaries found vectorized; Python
    touches only the (rare) multi-doc buckets."""
    band = batch["band"].to_numpy(zero_copy_only=False).astype(np.int64)
    bh = batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc = batch["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(doc) == 0:
        return _EMPTY_PAIRS
    order, starts, sizes = _bucket_segments((band, bh), doc)
    doc = doc[order]
    us: list = []
    vs: list = []
    for si in np.nonzero(sizes >= 2)[0]:
        s = starts[si]
        d = doc[s:s + sizes[si]]
        d = d[np.concatenate([[True], d[1:] != d[:-1]])]  # sorted-dedupe
        if len(d) >= 2:
            _emit_capped_pairs(d, us, vs, "LSH")
    if not us:
        return _EMPTY_PAIRS
    return pa.table({"u": pa.array(np.concatenate(us), pa.int64()),
                     "v": pa.array(np.concatenate(vs), pa.int64())})


def _pbucket_of(band: np.ndarray, val: np.ndarray,
                num_partitions: int) -> np.ndarray:
    """Stable partition id for a (band, value) bucket key — co-locates every
    row of one bucket while spreading buckets evenly."""
    with np.errstate(over="ignore"):
        h = _avalanche(val.astype(np.uint64) * _MIX ^ band.astype(np.uint64))
    return (h % np.uint64(num_partitions)).astype(np.int64)


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(map(tuple, zip(*[a.split(" ")[i:] for i in range(k)]))) if len(a.split(" ")) >= k else {tuple(a.split(" "))}
    sb = set(map(tuple, zip(*[b.split(" ")[i:] for i in range(k)]))) if len(b.split(" ")) >= k else {tuple(b.split(" "))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _shingle_set(text: str, k: int) -> set:
    words = text.split(" ")
    if len(words) < k:
        return {tuple(words)}
    return set(map(tuple, zip(*[words[i:] for i in range(k)])))


def minhash_dedup_clusters(docs_ds, *, num_perm: int = 64, bands: int = 16,
                           shingle_k: int = 3, jaccard_threshold=0.8,
                           id_col: str = "doc_id", text_col: str = "text",
                           num_partitions: int = 16, concurrency=None,
                           verify_with=None):
    """Full MinHash-LSH near-dup pipeline → Dataset (node, component_id) of dup
    clusters (component_id = min doc id — same convention as G1).

    ``verify_with``: optional documents Dataset for the exact-Jaccard
    verification step, JOINED onto the candidate pairs (u-side and v-side text
    hash-joins — no whole-corpus broadcast, scales to any corpus size);
    omitted → trust LSH candidates (banding precision).
    ``jaccard_threshold``: float, or an (num, den) integer pair for an exact
    rational compare (``den*|A∩B| >= num*|A∪B|``) that is bit-stable across
    engines (used by the SQL oracle)."""
    import ray

    if concurrency is not None:
        sigs = docs_ds.map_batches(
            MinHashLSH,
            fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                       shingle_k=shingle_k, id_col=id_col,
                                       text_col=text_col),
            batch_format="pyarrow", concurrency=concurrency,
        )
    else:
        # stateless tasks + per-worker signature-state cache: the permutation
        # params rebuild in ~µs, while an actor pool costs ~3 s spin-up per
        # call (state/worker_cache.py)
        from ..state.worker_cache import cached_state

        key = ("minhash_lsh", num_perm, bands, shingle_k, id_col, text_col)

        def sig_stage(batch: pa.Table) -> pa.Table:
            worker = cached_state(key, lambda _k: MinHashLSH(
                num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                id_col=id_col, text_col=text_col))
            return worker(batch)

        sigs = docs_ds.map_batches(sig_stage, batch_format="pyarrow")
    def pbucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("pbucket", pa.array(_pbucket_of(
            batch["band"].to_numpy(zero_copy_only=False),
            batch["band_hash"].to_numpy(zero_copy_only=False),
            num_partitions), pa.int64()))

    # bucket-co-locating partition groupby, NOT a per-bucket map_groups: the
    # bucket table is dominated by singleton buckets and Ray's per-group
    # dispatch (slice + table build per group) costs more than the whole
    # vectorized segment scan (r3 measured: the LSH pair stage dropped from
    # ~10 s to <1 s at sf0.1)
    pairs = sigs.map_batches(pbucket, batch_format="pyarrow") \
        .groupby("pbucket").map_groups(_partition_pairs,
                                       batch_format="pyarrow")
    # a pair found in B bands appears B times — dedupe BEFORE the (expensive)
    # text verify so each candidate is verified once
    from ray.data.aggregate import Count

    pairs = pairs.groupby(["u", "v"]).aggregate(Count(alias_name="_c")) \
                 .select_columns(["u", "v"])

    if verify_with is not None:
        from .relational import cogroup_join, snapshot

        # semi-join prefilter, gated by candidate-pair count: when the LSH
        # pair table is small, broadcast the candidate id set (u∪v — 8 bytes
        # per candidate, the SMALL side, never the corpus) and drop every
        # non-candidate text row before the verify joins so the two shuffles
        # move only texts that will be compared. Above the gate (pairs can be
        # corpus-sized on a 30%-dup crawl) fall back to the plain hash join —
        # same output either way.
        pairs = snapshot(pairs)
        if pairs.count() <= 2_000_000:
            cand_ids = np.unique(np.concatenate([
                np.concatenate([b["u"].to_numpy(zero_copy_only=False),
                                b["v"].to_numpy(zero_copy_only=False)])
                for b in pairs.iter_batches(batch_format="pyarrow",
                                            batch_size=65536)
            ] or [np.array([], dtype=np.int64)]))
            cand_ref = ray.put(cand_ids)

            def candidate_texts(out_id: str, out_text: str):
                def fn(b: pa.Table) -> pa.Table:
                    ids_np = b[id_col].to_numpy(zero_copy_only=False)
                    keep = np.isin(ids_np, ray.get(cand_ref))
                    t = pa.table({out_id: b[id_col], out_text: b[text_col]})
                    return t.filter(pa.array(keep))
                return fn
        else:
            def candidate_texts(out_id: str, out_text: str):
                def fn(b: pa.Table) -> pa.Table:
                    return pa.table({out_id: b[id_col],
                                     out_text: b[text_col]})
                return fn

        texts = verify_with.map_batches(candidate_texts("u", "_tu"),
                                        batch_format="pyarrow")
        pairs = cogroup_join(pairs, texts, ("u",), how="inner",
                             num_partitions=num_partitions)
        texts_v = verify_with.map_batches(candidate_texts("v", "_tv"),
                                          batch_format="pyarrow")
        pairs = cogroup_join(pairs, texts_v, ("v",), how="inner",
                             num_partitions=num_partitions)
        if isinstance(jaccard_threshold, tuple):
            num, den = jaccard_threshold
        else:
            num, den = jaccard_threshold, 1.0

        def verify(batch: pa.Table) -> pa.Table:
            tu = batch["_tu"].to_pylist()
            tv = batch["_tv"].to_pylist()
            keep = np.empty(len(tu), dtype=bool)
            for i in range(len(tu)):
                sa = _shingle_set(tu[i], shingle_k)
                sb = _shingle_set(tv[i], shingle_k)
                inter = len(sa & sb)
                union = len(sa | sb)
                keep[i] = den * inter >= num * union if union else True
            return pa.table({"u": batch["u"], "v": batch["v"]}).filter(
                pa.array(keep))

        pairs = pairs.map_batches(verify, batch_format="pyarrow")

    from .graph import connected_components

    return connected_components(pairs, "u", "v", num_partitions=num_partitions)


# ------------------------------------------------------------------------ SimHash

def simhash_batch(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """64-bit SimHash over word hashes (sign-sum per bit)."""
    ids = batch[id_col]
    ndocs = batch.num_rows
    # one md5 per UNIQUE word in the batch, not one per occurrence: web text
    # repeats words heavily, so this cuts the only remaining Python loop by
    # the batch's type/token ratio
    if ndocs == 0:
        return pa.table({"doc": ids,
                         "simhash": pa.array([], pa.int64())})
    words_list = pc.split_pattern(batch[text_col].combine_chunks(), " ")
    offs = words_list.offsets.to_numpy().astype(np.int64)
    starts, counts = offs[:-1], offs[1:] - offs[:-1]
    # dictionary_encode = C-speed unique+inverse; the md5 loop then runs once
    # per UNIQUE word in the batch, not once per occurrence
    denc = pc.dictionary_encode(words_list.values)
    inverse = denc.indices.to_numpy()
    uniq = denc.dictionary.to_pylist()
    uh = np.empty(len(uniq), dtype=np.uint64)
    for j, w in enumerate(uniq):
        uh[j] = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
    hs = uh[inverse]
    # per-doc per-bit popcounts, one bit per pass over small REUSED buffers —
    # a single (n_words, 64) bit matrix is 64x the footprint and measured
    # ~200x slower on fresh-page-fault-bound hosts. Docs always have ≥1
    # word ("".split(" ") == [""]), so reduceat offsets are strictly valid.
    tmp = np.empty(len(hs), dtype=np.uint64)
    bit = np.empty(len(hs), dtype=np.int64)
    sums = np.empty((ndocs, 64), dtype=np.int64)
    one = np.uint64(1)
    for b in range(64):
        np.right_shift(hs, np.uint64(b), out=tmp)
        np.bitwise_and(tmp, one, out=tmp)
        bit[:] = tmp
        sums[:, b] = np.add.reduceat(bit, starts)
    # SIGNED score: the uint64 sum would wrap on negative majorities and
    # set the bit for every non-tie (caught by the SQL value-oracle, r2)
    score = sums * 2 - counts[:, None]
    sig = ((score > 0).astype(np.uint64)
           << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1,
                                                           dtype=np.uint64)
    out = (sig >> np.uint64(1)).astype(np.int64)  # keep positive int64
    return pa.table({"doc": ids, "simhash": pa.array(out, pa.int64())})


_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(axis=1).astype(np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POP8[np.ascontiguousarray(x, dtype=np.uint64)
                 .view(np.uint8).reshape(-1, 8)].sum(axis=1)


# 63 stored signature bits → 4 bands (16+16+16+15). Pigeonhole: ≤3 differing
# bits touch ≤3 bands, so every hamming≤3 pair matches in at least one band —
# candidate recall is EXACT, not probabilistic (which is why the SQL oracle
# can skip the banding and enumerate hamming≤k pairs directly).
_HAM_SHIFTS = np.array([0, 16, 32, 48], dtype=np.uint64)
_HAM_MASKS = np.array([0xFFFF, 0xFFFF, 0xFFFF, 0x7FFF], dtype=np.uint64)


def _hamming_partition_pairs(max_hamming: int):
    """Partition-bucketed pair emission for the hamming bands (same
    vectorized-segments idiom as ``_partition_pairs``): all-pairs within each
    (band, band_val) bucket (``_PAIR_CAP`` star+chain degradation), kept only
    when XOR-popcount ≤ max_hamming — the verify is LOCAL because each row
    carries its full signature into the bucket."""

    def body(batch: pa.Table) -> pa.Table:
        band = batch["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = batch["band_val"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = batch["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        sig = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(doc) == 0:
            return _EMPTY_PAIRS
        order, starts, sizes = _bucket_segments((band, bv), doc)
        doc, sig = doc[order], sig[order]
        us: list = []
        vs: list = []
        for si in np.nonzero(sizes >= 2)[0]:
            s = starts[si]
            d, g = doc[s:s + sizes[si]], sig[s:s + sizes[si]]
            uniq = np.concatenate([[True], d[1:] != d[:-1]])
            d, g = d[uniq], g[uniq]
            n = len(d)
            if n < 2:
                continue
            if n * (n - 1) // 2 > _PAIR_CAP:
                import logging

                logging.getLogger(__name__).warning(
                    "simhash band bucket with %d docs exceeds cap %d; "
                    "star+chain degradation", n, _PAIR_CAP)
                iu = np.concatenate([np.zeros(n - 1, np.int64),
                                     np.arange(n - 1, dtype=np.int64)])
                ju = np.concatenate([np.arange(1, n, dtype=np.int64),
                                     np.arange(1, n, dtype=np.int64)])
            else:
                iu, ju = np.triu_indices(n, k=1)
            with np.errstate(over="ignore"):
                ham = _popcount64(g[iu] ^ g[ju])
            keep = ham <= max_hamming
            us.append(d[iu[keep]].astype(np.int64))
            vs.append(d[ju[keep]].astype(np.int64))
        if not us:
            return _EMPTY_PAIRS
        return pa.table({"u": pa.array(np.concatenate(us), pa.int64()),
                         "v": pa.array(np.concatenate(vs), pa.int64())})

    return body


def simhash_hamming_clusters(docs_ds, *, max_hamming: int = 3,
                             id_col: str = "doc_id", text_col: str = "text",
                             num_partitions: int = 16):
    """SimHash near-dup clusters via hamming-band LSH (the clustering the r2
    module docstring promised): signature → 4 band rows → bucket groupby →
    local hamming≤k verify → pair dedup → distributed connected components.
    Returns (node, component_id), component_id = min doc id."""
    from ray.data.aggregate import Count

    from .graph import connected_components

    sigs = docs_ds.map_batches(simhash_batch,
                               fn_kwargs=dict(id_col=id_col, text_col=text_col),
                               batch_format="pyarrow")

    def to_bands(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = batch["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = len(_HAM_SHIFTS)
        with np.errstate(over="ignore"):
            vals = ((sig[None, :] >> _HAM_SHIFTS[:, None])
                    & _HAM_MASKS[:, None])  # (bands, docs)
        return pa.table({
            "doc": pa.array(np.tile(doc, nb), pa.int64()),
            "band": pa.array(np.repeat(np.arange(nb, dtype=np.int32),
                                       len(doc)), pa.int32()),
            "band_val": pa.array(vals.ravel().astype(np.int64), pa.int64()),
            "simhash": pa.array(np.tile(sig.astype(np.int64), nb), pa.int64()),
        })

    def pbucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("pbucket", pa.array(_pbucket_of(
            batch["band"].to_numpy(zero_copy_only=False),
            batch["band_val"].to_numpy(zero_copy_only=False),
            num_partitions), pa.int64()))

    bands = sigs.map_batches(to_bands, batch_format="pyarrow")
    pairs = bands.map_batches(pbucket, batch_format="pyarrow") \
        .groupby("pbucket").map_groups(_hamming_partition_pairs(max_hamming),
                                       batch_format="pyarrow")
    pairs = pairs.groupby(["u", "v"]).aggregate(Count(alias_name="_c")) \
                 .select_columns(["u", "v"])
    return connected_components(pairs, "u", "v", num_partitions=num_partitions)


def exact_dedup(docs_ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup: md5(text) → groupby → min-id representative + group size.

    Returns (text_md5, keep_id, n_dups). The md5 pre-hash happens per batch
    (vectorized C loop), the shuffle moves only (hash, id) pairs."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        h = md5_hex_array(batch[text_col].to_pylist())
        return pa.table({"text_md5": pa.array(list(h), pa.string()),
                         "doc": batch[id_col]})

    hashed = docs_ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("text_md5").aggregate(
        Min("doc", alias_name="keep_id"), Count(alias_name="n_dups"))


def _shingle_pair_counts(docs_ds, *, shingle_k: int, id_col: str,
                         text_col: str, num_partitions: int,
                         max_docs_per_shingle=None):
    """Shared inverted-index core of the exact (sketch-free) near-dup family:
    (shingle, doc) rows → per-shingle co-occurring doc pairs (bucketed by
    shingle hash; singleton shingles — the vast majority — cost nothing) →
    one grouped count = |A∩B| per pair → join per-doc distinct-shingle sizes.
    Returns a Dataset of (u, v, n_common, n_sh_u, n_sh_v) with u < v.

    Skew note: a shingle shared by s docs emits s·(s-1)/2 pair rows —
    stopword-like shingles are the classic hot key — ``max_docs_per_shingle``
    is the skew guard: shingles shared by more than that many docs are
    DROPPED before the pair emit (a shingle in s docs carries ~no signal for
    s ≫ threshold, the standard web-dedup stopword-shingle cut; None keeps
    exactness — the seeded battery corpus has no hot shingles)."""
    from .relational import bucket_agg, cogroup_join, snapshot

    def sh_rows(batch: pa.Table) -> pa.Table:
        sh, starts = _shingle_hashes_batch(batch[text_col], shingle_k)
        counts = np.r_[starts[1:], len(sh)] - starts
        doc = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(doc, counts)
        # per-doc DISTINCT shingles (each doc lives wholly in one row, so
        # batch-local dedup is global dedup); rank-encoded pair-unique — the
        # axis-0 np.unique sorts void views, ~1.6× slower (r4, same swap as
        # the CC base case). sh viewed as int64 flips sort order for values
        # ≥ 2^63 but preserves the SET — downstream is order-insensitive.
        from .graph import _unique_pairs

        uniq, _ = _unique_pairs(doc_of, sh.view(np.int64))
        return pa.table({
            "sh": pa.array(uniq[:, 1], pa.int64()),
            "doc": pa.array(uniq[:, 0], pa.int64()),
        })

    shr = snapshot(docs_ds.map_batches(sh_rows, batch_format="pyarrow"))
    if shr.count() == 0:  # empty corpus → empty pair table, stable schema
        import ray.data

        z = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table({
            "u": z, "v": z, "n_common": z, "n_sh_u": z, "n_sh_v": z}))
    sizes = bucket_agg(shr, ["doc"], {"n_sh": (None, "count")},
                       num_partitions=num_partitions, combine=True)

    def add_part(batch: pa.Table) -> pa.Table:
        s = batch["sh"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_part", pa.array((s.view(np.uint64) % np.uint64(num_partitions))
                              .astype(np.int64), pa.int64()))

    def pairs_of_part(df):
        import pandas as pd

        df = df.sort_values(["sh", "doc"], kind="mergesort")
        s = df["sh"].to_numpy()
        d = df["doc"].to_numpy()
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        ends = np.r_[starts[1:], len(s)]
        us, vs = [], []
        for a, b in zip(starts, ends):
            if b - a < 2:
                continue
            if max_docs_per_shingle is not None and b - a > max_docs_per_shingle:
                continue  # hot-shingle cut (documented skew guard)
            run = d[a:b]  # already doc-sorted within the shingle
            iu = np.triu_indices(b - a, 1)
            us.append(run[iu[0]])
            vs.append(run[iu[1]])
        if not us:
            return pd.DataFrame({"u": np.array([], np.int64),
                                 "v": np.array([], np.int64)})
        return pd.DataFrame({"u": np.concatenate(us),
                             "v": np.concatenate(vs)})

    cand = shr.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(pairs_of_part, batch_format="pandas")
    common = snapshot(bucket_agg(cand, ["u", "v"],
                                 {"n_common": (None, "count")},
                                 num_partitions=num_partitions, combine=True))
    j = cogroup_join(common, sizes.rename_columns(["u", "n_sh_u"]), ("u",),
                     how="inner", num_partitions=num_partitions)
    return cogroup_join(j, sizes.rename_columns(["v", "n_sh_v"]), ("v",),
                        how="inner", num_partitions=num_partitions)


def ngram_jaccard_pairs(docs_ds, *, shingle_k: int = 3, threshold=(4, 5),
                        id_col: str = "doc_id", text_col: str = "text",
                        num_partitions: int = 16,
                        max_docs_per_shingle=None):
    """EXACT n-gram-Jaccard near-dup pairs via the shingle INVERTED INDEX —
    the third dedup family next to MinHash-LSH (probabilistic banding) and
    SimHash (hamming bands): no sketch at all, the intersection is computed
    by a distributed self-join on shingles (``_shingle_pair_counts``), then
    the integer threshold ``num·|A∪B| ≤ den·|A∩B|``.

    Emits (u, v, n_common, n_union), u < v. Word-shingle hashing reuses the
    vectorized MinHash machinery (collision-free at test scale — the same
    contract the MinHash verify relies on)."""
    num, den = threshold if isinstance(threshold, tuple) else (threshold, 1)
    j = _shingle_pair_counts(docs_ds, shingle_k=shingle_k, id_col=id_col,
                             text_col=text_col, num_partitions=num_partitions,
                             max_docs_per_shingle=max_docs_per_shingle)

    def thresh(t: pa.Table) -> pa.Table:
        c = t["n_common"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = t["n_sh_u"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["n_sh_v"].to_numpy(zero_copy_only=False).astype(np.int64)
        union = a + b - c
        keep = den * c >= num * union
        return pa.table({"u": t["u"].take(pa.array(np.flatnonzero(keep))),
                         "v": t["v"].take(pa.array(np.flatnonzero(keep))),
                         "n_common": pa.array(c[keep], pa.int64()),
                         "n_union": pa.array(union[keep], pa.int64())})

    return j.map_batches(thresh, batch_format="pyarrow")


def ngram_containment_pairs(docs_ds, *, shingle_k: int = 3, threshold=(9, 10),
                            id_col: str = "doc_id", text_col: str = "text",
                            num_partitions: int = 16,
                            max_docs_per_shingle=None):
    """EXACT asymmetric shingle-CONTAINMENT pairs (Broder's C(A,B) =
    |S(A)∩S(B)| / |S(A)|): catches documents swallowed whole by a larger one
    — quote pages, boilerplate-wrapped copies — which symmetric Jaccard
    misses because the union is dominated by the big side. Same inverted-
    index core as ``ngram_jaccard_pairs``; each undirected pair is tested in
    BOTH directions against ``num/den``.

    Emits DIRECTED rows (src, dst, n_common, n_src): src is contained in dst."""
    num, den = threshold if isinstance(threshold, tuple) else (threshold, 1)
    j = _shingle_pair_counts(docs_ds, shingle_k=shingle_k, id_col=id_col,
                             text_col=text_col, num_partitions=num_partitions,
                             max_docs_per_shingle=max_docs_per_shingle)

    def thresh(t: pa.Table) -> pa.Table:
        c = t["n_common"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = t["n_sh_u"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["n_sh_v"].to_numpy(zero_copy_only=False).astype(np.int64)
        fwd = den * c >= num * a     # u contained in v
        rev = den * c >= num * b     # v contained in u
        return pa.table({
            "src": pa.array(np.r_[u[fwd], v[rev]], pa.int64()),
            "dst": pa.array(np.r_[v[fwd], u[rev]], pa.int64()),
            "n_common": pa.array(np.r_[c[fwd], c[rev]], pa.int64()),
            "n_src": pa.array(np.r_[a[fwd], b[rev]], pa.int64()),
        })

    return j.map_batches(thresh, batch_format="pyarrow")


# ═══════════════════ exact substring duplicate spans + decontamination (r4)

def _window_count_rows(batch: pa.Table, *, window_w: int, id_col: str,
                       text_col: str) -> pa.Table:
    """Per-doc (sh, doc_id, c) rows for W-word sliding windows: ``sh`` is the
    window hash, ``c`` the number of POSITIONS of that window inside the doc
    (multiplicity matters — duplicated-span accounting is per position, not
    per distinct window). Docs with fewer than W words emit NOTHING (a short
    doc has no W-window; contrast ``_shingle_hashes_batch``'s whole-text
    fallback used by the Jaccard family).

    Each doc is one input row, so all its windows are computed in this one
    call — (sh, doc_id) rows are globally unique without any shuffle."""
    import pyarrow.compute as pc

    from .graph import _unique_pairs

    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    wc = pc.list_value_length(pc.split_pattern(texts, " ")) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    sh, starts = _shingle_hashes_batch(texts, window_w)
    counts_out = np.r_[starts[1:], len(sh)] - starts
    doc = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.repeat(wc >= window_w, counts_out)   # drop short-doc fallbacks
    doc_of = np.repeat(doc, counts_out)[keep]
    sh = sh[keep]
    if not len(sh):
        z = pa.array([], pa.int64())
        return pa.table({"sh": z, "doc_id": z, "c": z})
    uniq, inv = _unique_pairs(doc_of, sh.view(np.int64))
    c = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    return pa.table({"sh": pa.array(uniq[:, 1], pa.int64()),
                     "doc_id": pa.array(uniq[:, 0], pa.int64()),
                     "c": pa.array(c, pa.int64())})


def duplicate_spans(docs_ds, *, window_w: int = 8, id_col: str = "doc_id",
                    text_col: str = "text", num_partitions: int = 16):
    """EXACT substring-duplication profile (the distributed shape of Lee et
    al.'s 'Deduplicating Training Data Makes Language Models Better' ExactSubstr
    pass, word-granular): for every doc with ≥ W words, count how many of its
    W-word window POSITIONS also occur verbatim in at least one OTHER doc.

    Shape: (sh, doc, c) window rows → per-window distinct-doc counts (one
    combiner-backed groupby keyed by window hash — bounded by distinct
    windows, never all-pairs) → join the doc-count back onto the rows →
    one per-doc sum. No driver collection, no broadcast of the corpus;
    the only shuffles are keyed by window hash and doc id.

    Returns (doc_id, n_windows, n_dup) — n_dup/n_windows is the duplication
    ratio used for span-level filtering."""
    from .relational import bucket_agg, cogroup_join, snapshot

    def win_rows(b: pa.Table) -> pa.Table:
        return _window_count_rows(b, window_w=window_w, id_col=id_col,
                                  text_col=text_col)

    rows = snapshot(docs_ds.map_batches(win_rows, batch_format="pyarrow"))
    if rows.count() == 0:
        import ray.data

        z = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table({
            "doc_id": z, "n_windows": z, "n_dup": z}))
    nd = bucket_agg(rows, ["sh"], {"ndocs": (None, "count")},
                    num_partitions=num_partitions, combine=True)
    j = cogroup_join(rows, nd, ("sh",), how="inner",
                     num_partitions=num_partitions)

    def mark(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        ndocs = t["ndocs"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "c": pa.array(c, pa.int64()),
                         "dup_c": pa.array(np.where(ndocs >= 2, c, 0),
                                           pa.int64())})

    marked = j.map_batches(mark, batch_format="pyarrow")
    return bucket_agg(marked, ["doc_id"],
                      {"n_windows": ("c", "sum"), "n_dup": ("dup_c", "sum")},
                      num_partitions=num_partitions, combine=True)


def decontaminate(docs_ds, *, window_w: int = 5, test_modulus: int = 17,
                  test_residue: int = 0, id_col: str = "doc_id",
                  text_col: str = "text", num_partitions: int = 16):
    """Train/test DECONTAMINATION scan (the n-gram-overlap check every
    benchmark-aware training corpus runs, e.g. GPT-3 appendix C / PaLM-style
    13-gram dedup — here word-W-gram): the held-out 'test set' is the
    deterministic doc_id % modulus == residue slice; every TRAIN doc gets the
    count of its W-word window positions that appear anywhere in the test set.

    Shape: one window pass over the whole corpus (same rows feed both sides),
    test windows reduced to a distinct-hash table, one hash-keyed semi-join
    onto the train rows, one per-doc sum. The zero-hit docs are recovered by
    unioning zero-filled totals with the hit partials and re-aggregating —
    no left join, both aggregates stay combiner-backed.

    Returns (doc_id, n_windows, n_hit) for every train doc with ≥ W words."""
    from .relational import bucket_agg, cogroup_join, concat_blocks, snapshot

    def win_rows(b: pa.Table) -> pa.Table:
        return _window_count_rows(b, window_w=window_w, id_col=id_col,
                                  text_col=text_col)

    rows = snapshot(docs_ds.map_batches(win_rows, batch_format="pyarrow"))

    def side(is_test: bool):
        def fn(t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (d % test_modulus == test_residue) == is_test
            idx = pa.array(np.flatnonzero(m))
            return t.take(idx)

        return fn

    train = rows.map_batches(side(False), batch_format="pyarrow")
    test = rows.map_batches(side(True), batch_format="pyarrow")
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_windows": pa.array([], pa.int64()),
                      "n_hit": pa.array([], pa.int64())})
    if snapshot(train).count() == 0:
        import ray.data

        return ray.data.from_arrow(empty)
    # distinct test window hashes (key-only right side of the semi-join)
    test_sh = bucket_agg(test, ["sh"], {"_n": (None, "count")},
                         num_partitions=num_partitions, combine=True) \
        .select_columns(["sh"])
    hits = cogroup_join(train, test_sh, ("sh",), how="inner",
                        num_partitions=num_partitions)
    hit_per_doc = bucket_agg(hits, ["doc_id"], {"n_hit": ("c", "sum")},
                             num_partitions=num_partitions, combine=True)
    tot_per_doc = bucket_agg(train, ["doc_id"], {"n_windows": ("c", "sum")},
                             num_partitions=num_partitions, combine=True)

    def zfill(col_zero: str, order: list):
        def fn(t: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(len(t), np.int64), pa.int64())
            cols = dict(zip(t.column_names, t.columns))
            cols[col_zero] = z
            return pa.table({c: cols[c] for c in order})

        return fn

    order = ["doc_id", "n_windows", "n_hit"]
    u = concat_blocks(
        tot_per_doc.map_batches(zfill("n_hit", order), batch_format="pyarrow"),
        hit_per_doc.map_batches(zfill("n_windows", order),
                                batch_format="pyarrow"))
    return bucket_agg(u, ["doc_id"],
                      {"n_windows": ("n_windows", "sum"),
                       "n_hit": ("n_hit", "sum")},
                      num_partitions=num_partitions, combine=True)


def duplicate_span_runs(docs_ds, *, window_w: int = 8, id_col: str = "doc_id",
                        text_col: str = "text", num_partitions: int = 16):
    """Longest exactly-duplicated SPAN per document (the per-doc summary of
    Lee et al.'s ExactSubstr output): the maximal run of consecutive W-word
    window positions whose windows each occur verbatim in another doc — a
    run of R windows is an exactly-shared span of R+W-1 words.

    Shape: per-position (sh, doc, pos) rows → per-window distinct-doc counts
    (two nested combiner aggregates, both keyed by window hash) → one
    hash-keyed semi-join marks duplicated positions → island detection
    (pos − rank) vectorized per doc-hash partition — never a per-doc Python
    task. Docs with ≥ W words and no duplicated window report max_run 0.

    Returns (doc_id, max_run) with max_run in WINDOWS (0 = clean doc)."""
    import pyarrow.compute as pc

    from .relational import (bucket_agg, cogroup_join, concat_blocks,
                             snapshot, vfilter)

    def pos_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        wc = pc.list_value_length(pc.split_pattern(texts, " ")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sh, starts = _shingle_hashes_batch(texts, window_w)
        counts_out = np.r_[starts[1:], len(sh)] - starts
        doc = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.repeat(wc >= window_w, counts_out)
        doc_of = np.repeat(doc, counts_out)[keep]
        sh = sh[keep]
        # position of each window within its doc (0-based)
        kept_counts = np.where(wc >= window_w, counts_out, 0)
        pos = np.arange(len(doc_of), dtype=np.int64)
        if len(kept_counts):
            seg = np.repeat(np.cumsum(kept_counts) - kept_counts,
                            kept_counts)
            pos = pos - seg
        return pa.table({"sh": pa.array(sh.view(np.int64), pa.int64()),
                         "doc_id": pa.array(doc_of, pa.int64()),
                         "pos": pa.array(pos, pa.int64())})

    rows = snapshot(docs_ds.map_batches(pos_rows, batch_format="pyarrow"))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "max_run": pa.array([], pa.int64())})
    if rows.count() == 0:
        import ray.data

        return ray.data.from_arrow(empty)
    per_doc_sh = bucket_agg(rows, ["sh", "doc_id"], {"_n": (None, "count")},
                            num_partitions=num_partitions, combine=True)
    nd = bucket_agg(per_doc_sh, ["sh"], {"ndocs": (None, "count")},
                    num_partitions=num_partitions)
    dup_sh = vfilter(nd, "ndocs", "greater_equal", 2).select_columns(["sh"])
    dup = cogroup_join(rows, dup_sh, ("sh",), how="inner",
                       num_partitions=num_partitions)

    def part_of(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_part", pa.array((d % num_partitions).astype(np.int64),
                              pa.int64()))

    def runs_of_part(df):
        import pandas as pd

        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        d = df["doc_id"].to_numpy()
        p = df["pos"].to_numpy()
        # island break where doc changes or positions aren't consecutive
        brk = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            brk[1:] = (d[1:] != d[:-1]) | (p[1:] != p[:-1] + 1)
        isl = np.cumsum(brk) - 1
        lens = np.bincount(isl)
        isl_starts = np.flatnonzero(brk)
        isl_doc = d[isl_starts]
        out = pd.DataFrame({"doc_id": isl_doc, "max_run": lens}) \
            .groupby("doc_id", as_index=False).max()
        return out

    runs = dup.map_batches(part_of, batch_format="pyarrow") \
        .groupby("_part").map_groups(runs_of_part, batch_format="pandas")
    # zero-fill clean docs: union per-doc zeros with run maxima, take MAX
    zeros = bucket_agg(rows, ["doc_id"], {"_n": (None, "count")},
                       num_partitions=num_partitions, combine=True)

    def zrow(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "max_run": pa.array(np.zeros(len(t), np.int64),
                                             pa.int64())})

    u = concat_blocks(zeros.map_batches(zrow, batch_format="pyarrow"), runs)
    return bucket_agg(u, ["doc_id"], {"max_run": ("max_run", "max")},
                      num_partitions=num_partitions, combine=True)
