"""Text-analysis stage tests: token/quality/langid batch bodies plus the r3
additions (vocab wordcount combiner, normalization fingerprints, PII regex
counts, length histogram) on hand-checkable fixtures."""

import hashlib

import pyarrow as pa
import pytest

from osm_lump_ways_ray.stages.text import (
    langid_batch,
    length_histogram,
    normalize_batch,
    pii_counts_batch,
    quality_batch,
    token_stats_batch,
    vocab_partial_batch,
    vocab_topk,
)


def test_token_stats_batch():
    b = pa.table({"text": ["a b c", "", "x  y"]})
    out = token_stats_batch(b)
    # "".split(" ") == [""] → 1 token; double space yields an empty token
    assert out["ws_tokens"].to_pylist() == [3, 1, 3]


def test_quality_batch_stopword_ppm():
    b = pa.table({"text": ["the cat", "cat dog bird fish"]})
    out = quality_batch(b)
    assert out["n_stopwords"].to_pylist() == [1, 0]
    assert out["stop_ppm"].to_pylist() == [500_000, 0]


def test_langid_first_marker_wins():
    b = pa.table({"text": ["the der", "der le", "nothing here"]})
    out = langid_batch(b)
    assert out["detected_lang"].to_pylist() == ["en", "de", "other"]


def test_vocab_partial_batch_counts_within_batch():
    b = pa.table({"text": ["a b a", "b c"]})
    out = vocab_partial_batch(b)
    got = dict(zip(out["token"].to_pylist(), out["c"].to_pylist()))
    assert got == {"a": 2, "b": 2, "c": 1}


def test_vocab_topk_deterministic_tie_break(ray_session):
    import ray.data

    # c appears 3x; a and b tie at 2 → token-ascending break keeps 'a' at k=2
    ds = ray.data.from_arrow(pa.table({"text": ["c a b", "c a b", "c"]}))
    top = vocab_topk(ds, k=2).to_pandas()
    assert list(top["token"]) in (["c", "a"], ["a", "c"])  # set semantics
    assert dict(zip(top["token"], top["n"]))["c"] == 3


def test_normalize_batch_md5_parity():
    b = pa.table({"text": ["  MiXeD Case  ", "plain"]})
    out = normalize_batch(b)
    assert out["norm_text"].to_pylist() == ["mixed case", "plain"]
    want = hashlib.md5(b"mixed case").hexdigest()
    assert out["norm_fp"].to_pylist()[0] == want


def test_pii_counts_batch():
    b = pa.table({"text": [
        "mail me at foo.bar@example.com or x@y.co",
        "call 1234567 now",
        "clean text 12345",  # 5 digits — below the 6+ threshold
    ]})
    out = pii_counts_batch(b)
    assert out["n_emails"].to_pylist() == [2, 0, 0]
    assert out["n_digitseq"].to_pylist() == [0, 1, 0]


def test_length_histogram(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"n_chars": [5, 99, 100, 250, 260]}))
    out = length_histogram(ds, bucket_width=100).to_pandas()
    got = dict(zip(out["bucket"], out["n"]))
    assert got == {0: 2, 1: 1, 2: 2}


def test_repetition_batch_distinct_ppm():
    from osm_lump_ways_ray.stages.text import repetition_batch

    b = pa.table({"text": ["a a a a", "a b c d", "x x y  y"]})
    out = repetition_batch(b)
    # 1/4, 4/4, and {x, y, ''} 3 distinct of 5 tokens (double space)
    assert out["distinct_ppm"].to_pylist() == [250_000, 1_000_000, 600_000]


def test_stratified_sample_deterministic(ray_session):
    import ray.data

    from osm_lump_ways_ray.stages.text import stratified_sample

    t = pa.table({"doc_id": pa.array(list(range(20)), pa.int64()),
                  "lang": pa.array(["en", "de"] * 10)})
    ds = ray.data.from_arrow(t)
    out = stratified_sample(ds, {"en": (1, 5)}, default=(1, 1)).to_pandas()
    en = sorted(out[out["lang"] == "en"]["doc_id"])
    assert en == [0, 10]          # even ids, % 5 == 0
    assert (out["lang"] == "de").sum() == 10  # default rate keeps all


def test_bigram_lift_integer_score():
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.text import bigram_lift

    # 'x y' always together (lift high); 'a b' independent-ish
    docs = ray.data.from_arrow(pa.table({
        "text": ["x y a", "x y b", "a b x", "b a y"],
    }))
    out = {(r["w1"], r["w2"]): (r["n_pair"], r["lift_milli"])
           for r in bigram_lift(docs, min_count=2,
                                min_lift_milli=1000).take_all()}
    # N=12 tokens; c_x=3 c_y=3 c_pair(x,y)=2 → 2*12*1000//9 = 2666
    assert out[("x", "y")] == (2, 2666)


def test_search_topk_scoring_and_cut(ray_session):
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.text import search_topk

    texts = {
        1: "scan scan scan filler filler",        # tf(scan)=3
        2: "scan window filler filler filler",    # tf(scan)=1 tf(window)=1
        3: "window window filler filler filler",  # tf(window)=2
        4: "nothing relevant here at all",
        5: "scan filler filler filler filler",    # tf(scan)=1 (tie with 2?)
    }
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string())}))
    out = search_topk(docs, ["scan", "window"], k=3,
                      num_partitions=4).to_pandas()
    n = 5
    idf_scan = n * 1000 // 3   # docs 1,2,5
    idf_win = n * 1000 // 2    # docs 2,3
    exp = sorted([(1, 3 * idf_scan), (2, idf_scan + idf_win),
                  (3, 2 * idf_win), (5, idf_scan)],
                 key=lambda t: (-t[1], t[0]))[:3]
    assert [(r.doc_id, r.score) for r in out.itertuples()] == exp
