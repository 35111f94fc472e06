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

from ..functions.hashing import md5_hex_array

_MERSENNE = (1 << 61) - 1


def _base_shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of word k-shingles (md5-based, platform stable)."""
    words = text.split(" ")
    if len(words) < k:
        shingles = [" ".join(words)]
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
    return out


def minhash_signature(text: str, num_perm: int = 64, shingle_k: int = 3,
                      _ab: tuple = None) -> np.ndarray:
    """num_perm-wide MinHash over word shingles (multiply-shift permutations)."""
    base = _base_shingle_hashes(text, shingle_k)
    a, b = _ab if _ab is not None else _perm_params(num_perm)
    # (num_perm, n_shingles) via broadcasting in uint64 wraparound
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in enumerate(texts):
            sig = minhash_signature(t, self.num_perm, self.shingle_k, self._ab)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                h = hashlib.md5(chunk.tobytes()).digest()[:8]
                out_id.append(int(ids[i]))
                out_band.append(b)
                out_hash.append(int.from_bytes(h, "big") >> 1)
        return pa.table({
            "doc": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
        })


_PAIR_CAP = 200  # all-pairs guard: above this a bucket degrades to star+chain


def _bucket_pairs(batch: pa.Table) -> pa.Table:
    """map_groups body over (band, band_hash) buckets → candidate pairs
    (min doc as u). Buckets are tiny for honest data. A pathological bucket
    (all-pairs would exceed ``_PAIR_CAP``) degrades to STAR pairs through the
    min doc PLUS consecutive-doc CHAIN pairs — O(n) pairs that preserve
    connectivity inside the bucket for the downstream connected-components
    clustering (nothing is silently dropped) — and logs a warning."""
    docs = np.unique(batch["doc"].to_numpy(zero_copy_only=False))
    if len(docs) < 2:
        return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    docs.sort()
    n = len(docs)
    if n * (n - 1) // 2 > _PAIR_CAP:
        import logging

        logging.getLogger(__name__).warning(
            "LSH bucket with %d docs exceeds all-pairs cap %d; degrading to "
            "star+chain pairs (%d pairs, connectivity preserved)",
            n, _PAIR_CAP, 2 * (n - 1))
        star_u = np.full(n - 1, docs[0], dtype=np.int64)
        star_v = docs[1:].astype(np.int64)
        chain_u = docs[:-1].astype(np.int64)
        chain_v = docs[1:].astype(np.int64)
        return pa.table({"u": pa.array(np.concatenate([star_u, chain_u])),
                         "v": pa.array(np.concatenate([star_v, chain_v]))})
    iu, ju = np.triu_indices(n, k=1)
    return pa.table({"u": pa.array(docs[iu].astype(np.int64)),
                     "v": pa.array(docs[ju].astype(np.int64))})


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

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(2, ncpu))
    sigs = docs_ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k, id_col=id_col,
                                   text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency,
    )
    pairs = sigs.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow")
    # a pair found in B bands appears B times — dedupe BEFORE the (expensive)
    # text verify so each candidate is verified once
    from ray.data.aggregate import Count

    pairs = pairs.groupby(["u", "v"]).aggregate(Count(alias_name="_c")) \
                 .select_columns(["u", "v"])

    if verify_with is not None:
        from .relational import cogroup_join

        texts = verify_with.map_batches(
            lambda b: pa.table({"u": b[id_col], "_tu": b[text_col]}),
            batch_format="pyarrow")
        pairs = cogroup_join(pairs, texts, ("u",), how="inner",
                             num_partitions=num_partitions)
        texts_v = verify_with.map_batches(
            lambda b: pa.table({"v": b[id_col], "_tv": b[text_col]}),
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
    texts = batch[text_col].to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        words = t.split(" ")
        hs = np.empty(len(words), dtype=np.uint64)
        for j, w in enumerate(words):
            hs[j] = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        # SIGNED score: the uint64 sum would wrap on negative majorities and
        # set the bit for every non-tie (caught by the SQL value-oracle, r2)
        score = bits.sum(axis=0).astype(np.int64) * 2 - len(words)
        sig = np.uint64(0)
        for b in range(64):
            if score[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig >> np.uint64(1))  # keep positive int64
    return pa.table({"doc": ids, "simhash": pa.array(out, pa.int64())})


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
