"""Dedup-family unit tests: the vectorized bucket-pair emission (r3 rewrite of
the per-bucket ``map_groups`` path) against brute-force per-bucket pairs, the
``_PAIR_CAP`` star+chain degradation, and the end-to-end LSH cluster pipelines
on a corpus with planted near-dups."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from osm_lump_ways_ray.stages import dedup as dd


def _brute_pairs(band, bh, doc):
    """Reference all-pairs per (band, bh) bucket over unique docs."""
    out = set()
    buckets = {}
    for b, h, d in zip(band, bh, doc):
        buckets.setdefault((b, h), set()).add(d)
    for docs in buckets.values():
        for u, v in itertools.combinations(sorted(docs), 2):
            out.add((u, v))
    return out


def test_partition_pairs_matches_bruteforce():
    rng = np.random.RandomState(7)
    n = 3000
    band = rng.randint(0, 16, n).astype(np.int64)
    bh = rng.randint(0, 400, n).astype(np.int64)  # forces multi-doc buckets
    doc = rng.randint(0, 500, n).astype(np.int64)
    batch = pa.table({"band": pa.array(band), "band_hash": pa.array(bh),
                      "doc": pa.array(doc)})
    got = dd._partition_pairs(batch)
    got_pairs = set(zip(got["u"].to_pylist(), got["v"].to_pylist()))
    assert got_pairs == _brute_pairs(band, bh, doc)
    # every emitted pair is ordered u < v
    assert all(u < v for u, v in got_pairs)


def test_partition_pairs_cap_star_chain_connectivity():
    # one bucket with n docs where all-pairs would blow the cap: emitted pair
    # graph must still connect every doc (star+chain), with O(n) pairs
    n = 50
    assert n * (n - 1) // 2 > dd._PAIR_CAP
    batch = pa.table({
        "band": pa.array(np.zeros(n, np.int64)),
        "band_hash": pa.array(np.zeros(n, np.int64)),
        "doc": pa.array(np.arange(100, 100 + n, dtype=np.int64)),
    })
    got = dd._partition_pairs(batch)
    assert got.num_rows == 2 * (n - 1)
    # union-find connectivity
    parent = {d: d for d in range(100, 100 + n)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(got["u"].to_pylist(), got["v"].to_pylist()):
        parent[find(u)] = find(v)
    assert len({find(d) for d in range(100, 100 + n)}) == 1


def test_hamming_partition_pairs_filters_by_popcount():
    # sigs: 3 docs in one bucket; doc 1 and 2 differ in 2 bits, doc 3 in 20
    sigs = np.array([0b1111, 0b1100, (1 << 40) - 1], dtype=np.int64)
    batch = pa.table({
        "band": pa.array(np.zeros(3, np.int64)),
        "band_val": pa.array(np.zeros(3, np.int64)),
        "doc": pa.array(np.array([1, 2, 3], np.int64)),
        "simhash": pa.array(sigs),
    })
    got = dd._hamming_partition_pairs(3)(batch)
    assert set(zip(got["u"].to_pylist(), got["v"].to_pylist())) == {(1, 2)}


def test_minhash_clusters_planted_dups(ray_session):
    import ray.data

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away to the deep green forest by the old stone bridge").split()
    texts, ids = [], []
    for i in range(40):
        words = [f"unique{i}w{j}" for j in range(30)]  # distinct docs
        texts.append(" ".join(words))
        ids.append(i)
    # planted near-dup pair: same text with one word changed
    texts.append(" ".join(base))
    ids.append(100)
    mod = list(base)
    mod[5] = "leaps"
    texts.append(" ".join(mod))
    ids.append(101)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = dd.minhash_dedup_clusters(
        docs, verify_with=docs, jaccard_threshold=(1, 2),
        num_partitions=4).to_pandas()
    clusters = dict(zip(out["node"], out["component_id"]))
    assert clusters.get(100) == 100 and clusters.get(101) == 100
    assert all(n in (100, 101) for n in clusters)


def test_simhash_hamming_clusters_planted_dups(ray_session):
    import ray.data

    words = [f"w{j}" for j in range(64)]
    texts = {0: " ".join(words), 1: " ".join(words[:-1] + ["changed"])}
    for i in range(2, 30):
        texts[i] = " ".join(f"doc{i}tok{j}" for j in range(40))
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string())}))
    out = dd.simhash_hamming_clusters(docs, max_hamming=16,
                                      num_partitions=4).to_pandas()
    clusters = dict(zip(out["node"], out["component_id"]))
    # docs 0/1 share almost all tokens → tiny hamming distance → clustered
    assert clusters.get(0) == 0 and clusters.get(1) == 0


def test_ngram_jaccard_pairs_exact_vs_inprocess(ray_session):
    """Inverted-index distributed Jaccard == in-process shingle-set math."""
    import itertools

    import ray.data

    from osm_lump_ways_ray.stages.dedup import (_shingle_set,
                                                ngram_jaccard_pairs)

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "a completely different document about rivers",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "tiny",                                          # < k words
        "tiny",                                          # dup of the short one
    ]
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts, pa.string())})
    got = {(r["u"], r["v"]): (r["n_common"], r["n_union"])
           for r in ngram_jaccard_pairs(
               ray.data.from_arrow(tbl), shingle_k=3,
               threshold=(1, 2)).take_all()}  # jaccard >= 0.5
    want = {}
    sets = [_shingle_set(t, 3) for t in texts]
    for i, j in itertools.combinations(range(len(texts)), 2):
        c = len(sets[i] & sets[j])
        un = len(sets[i] | sets[j])
        if 2 * c >= un and c > 0:
            want[(i, j)] = (c, un)
    assert got == want
    assert (0, 3) in got and (4, 5) in got and (0, 1) in got


def test_ngram_hot_shingle_cap():
    """max_docs_per_shingle drops pairs that ONLY co-occur via a hot
    (stopword-like) shingle, while true near-dups survive."""
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.dedup import ngram_jaccard_pairs

    hot = "the quick brown"           # shared by ALL docs (hot shingle)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [f"{hot} alpha beta gamma", f"{hot} alpha beta gamma",
                 f"{hot} x y z"],
    }))
    # uncapped: docs 1,2 are near-dups (jaccard 1.0); doc 3 shares only the
    # hot shingle (jaccard too low) — threshold keeps just (1,2)
    full = ngram_jaccard_pairs(docs, shingle_k=3, threshold=(4, 5)).take_all()
    assert [(r["u"], r["v"]) for r in full] == [(1, 2)]
    # capped at 2 docs/shingle: the 3-doc hot shingle is cut, but (1,2)
    # still meet through their 2-doc shingles — intersection shrinks by 1,
    # so relax the threshold to see them survive the cut
    capped = ngram_jaccard_pairs(docs, shingle_k=3, threshold=(1, 2),
                                 max_docs_per_shingle=2).take_all()
    assert [(r["u"], r["v"]) for r in capped] == [(1, 2)]
    assert capped[0]["n_common"] == full[0]["n_common"] - 1


def test_pos_constants_injective_under_distance_swaps():
    """Regression: with only 5 position constants, 8-word windows whose words
    were swapped at distance 5 XOR-hashed identically (observed as a false
    duplicate span at sf0.01). The widened constant table must separate every
    distance-p swap for windows up to len(_POS_C)."""
    for w in (6, 8, 12, 16):
        words = [f"tok{j}" for j in range(w)]
        base = " ".join(words)
        for p in range(1, w):
            swapped = list(words)
            swapped[0], swapped[p] = swapped[p], swapped[0]
            both = pa.array([base, " ".join(swapped)], pa.string())
            sh, starts = dd._shingle_hashes_batch(both, w)
            assert sh[starts[0]] != sh[starts[1]], (w, p)


def _brute_windows(text, w):
    toks = text.split(" ")
    if len(toks) < w:
        return []
    return [" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)]


def test_duplicate_spans_matches_bruteforce(ray_session):
    import ray.data

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 shared words
    texts = {
        1: "one two three four five six seven " + span + " tail1 tail2",
        2: "start middle " + span + " nine ten eleven twelve",
        3: " ".join(f"solo3w{j}" for j in range(20)),
        4: "short doc",                       # < 8 words → no rows
        5: span + " " + span,                 # self-repeat + cross-doc dup
    }
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string())}))
    out = dd.duplicate_spans(docs, window_w=8, num_partitions=4).to_pandas()
    got = {r.doc_id: (r.n_windows, r.n_dup) for r in out.itertuples()}
    # brute force
    wins = {d: _brute_windows(t, 8) for d, t in texts.items()}
    exp = {}
    for d, ws in wins.items():
        if not ws:
            continue
        others = set()
        for d2, ws2 in wins.items():
            if d2 != d:
                others.update(ws2)
        exp[d] = (len(ws), sum(1 for x in ws if x in others))
    assert got == exp
    assert 4 not in got and exp[5][1] > 0


def test_decontaminate_matches_bruteforce(ray_session):
    import ray.data

    leak = "p q r s t"
    texts = {
        0: "held out doc with " + leak + " inside it",        # test (0%3==0)
        3: " ".join(f"t3w{j}" for j in range(9)),              # test
        1: "train doc containing " + leak + " verbatim here",  # train, hit
        2: " ".join(f"t2w{j}" for j in range(7)),               # train, clean
        4: "tiny one",                                          # train, short
    }
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string())}))
    out = dd.decontaminate(docs, window_w=5, test_modulus=3,
                           num_partitions=4).to_pandas()
    got = {r.doc_id: (r.n_windows, r.n_hit) for r in out.itertuples()}
    test_ws = set()
    for d in (0, 3):
        test_ws.update(_brute_windows(texts[d], 5))
    exp = {}
    for d in (1, 2, 4):
        ws = _brute_windows(texts[d], 5)
        if ws:
            exp[d] = (len(ws), sum(1 for x in ws if x in test_ws))
    assert got == exp
    assert exp[1][1] > 0 and exp[2][1] == 0


def test_duplicate_span_runs_matches_bruteforce(ray_session):
    import ray.data

    span = " ".join(f"s{j}" for j in range(12))      # 12 shared words
    texts = {
        1: "a b c d e f g " + span + " x y z",
        2: "p q " + span + " r s t u v w",
        3: " ".join(f"solo{j}" for j in range(15)),   # clean, ≥8 words
        4: "too short",                                # dropped
    }
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string())}))
    out = dd.duplicate_span_runs(docs, window_w=8,
                                 num_partitions=4).to_pandas()
    got = {r.doc_id: r.max_run for r in out.itertuples()}
    # brute force: longest consecutive run of windows appearing in other docs
    wins = {d: _brute_windows(t, 8) for d, t in texts.items() if
            len(t.split()) >= 8}
    exp = {}
    for d, ws in wins.items():
        others = set()
        for d2, ws2 in wins.items():
            if d2 != d:
                others.update(ws2)
        best = cur = 0
        for w in ws:
            cur = cur + 1 if w in others else 0
            best = max(best, cur)
        exp[d] = best
    assert got == exp
    # the planted 12-word span shared verbatim → 12-8+1 = 5 window run
    assert exp[1] == 5 and exp[3] == 0
