"""URL-hygiene stage tests (stages/web.py): RE2 parse, canonicalization
rules (case-fold, default-port drop, query/fragment strip), distributed
dedup + host rollup, plus the r4 text additions (OOV stats, bigram counts)
and the containment near-dup variant — all on hand-checkable fixtures."""

import numpy as np
import pyarrow as pa
import ray.data

from osm_lump_ways_ray.stages.web import (
    canonical_url_batch,
    host_stats,
    parse_urls_batch,
    synth_urls_batch,
    url_dedup,
)


def test_parse_urls_batch_parts():
    b = pa.table({"url": [
        "HTTPS://Site.Example.ORG:443/a/b?q=1#f",
        "http://h.example:8080/x",
        "https://bare.example",
    ]})
    out = parse_urls_batch(b)
    assert out["scheme"].to_pylist() == ["https", "http", "https"]
    assert out["host"].to_pylist() == ["site.example.org", "h.example",
                                       "bare.example"]
    assert out["port"].to_pylist() == ["443", "8080", ""]
    assert out["path"].to_pylist() == ["/a/b", "/x", ""]


def test_canonical_url_rules():
    b = pa.table({"url": [
        "HTTPS://A.Example:443/p?utm=1#z",   # default https port dropped
        "http://a.example:80/p",             # default http port dropped
        "http://a.example:8080/p?x=1",       # non-default port kept
        "https://a.example/p#only-frag",     # fragment stripped
    ]})
    out = canonical_url_batch(b)
    assert out["curl"].to_pylist() == [
        "https://a.example/p",
        "http://a.example/p",
        "http://a.example:8080/p",
        "https://a.example/p",
    ]


def test_url_dedup_and_host_stats():
    rows = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "url": [
            "HTTPS://A.Example:443/p",    # same canonical as row 2
            "https://a.example/p",
            "https://a.example/q",
            "https://b.example/p",
        ],
    })
    ds = ray.data.from_arrow(rows)
    dd = {r["curl"]: (r["n_pages"], r["keep_id"])
          for r in url_dedup(ds).take_all()}
    assert dd == {"https://a.example/p": (2, 1),
                  "https://a.example/q": (1, 3),
                  "https://b.example/p": (1, 4)}
    hs = {r["host"]: (r["n_pages"], r["n_canonical"], r["keep_id"])
          for r in host_stats(ds).take_all()}
    assert hs == {"a.example": (3, 2, 1), "b.example": (1, 1, 4)}


def test_synth_urls_deterministic_and_dirty():
    b = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "source": ["src3"], "lang": ["de"]})
    u = synth_urls_batch(b)["url"].to_pylist()[0]
    assert u == ("HTTPS://SRC3.Example.ORG:443/de/p/7"
                 "?utm_source=feed&id=0#frag")
    # canonicalizer has real work on every component
    c = canonical_url_batch(synth_urls_batch(b))["curl"].to_pylist()[0]
    assert c == "https://src3.example.org/de/p/7"


def test_oov_stats_counts():
    from osm_lump_ways_ray.stages.text import oov_stats

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        # vocab_k=2 top tokens are 'a' (3×) and 'b' (2×); 'z'/'q' are OOV
        "text": ["a a b z", "a b q q"],
    }))
    out = {r["doc_id"]: (r["n_tokens"], r["n_oov"])
           for r in oov_stats(docs, vocab_k=2).take_all()}
    assert out == {1: (4, 1), 2: (4, 2)}


def test_bigram_topk_counts_within_doc_only():
    from osm_lump_ways_ray.stages.text import bigram_topk

    docs = ray.data.from_arrow(pa.table({
        "text": ["x y x y", "y x"],   # 'x y'×2, 'y x'×2 (cross-doc pair NOT counted)
    }))
    out = {r["bigram"]: r["n"] for r in bigram_topk(docs, k=10).take_all()}
    assert out == {"x y": 2, "y x": 2}


def test_ngram_containment_directed():
    from osm_lump_ways_ray.stages.dedup import ngram_containment_pairs

    small = "w1 w2 w3 w4"                   # 2 shingles, both inside big
    big = "w0 w1 w2 w3 w4 w5 w6 w7 w8"      # 7 shingles
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": [small, big],
    }))
    rows = ngram_containment_pairs(docs, shingle_k=3,
                                   threshold=(1, 1)).take_all()
    # only small→big at full containment; big→small fails (2/7 < 1)
    assert [(r["src"], r["dst"], r["n_common"], r["n_src"])
            for r in rows] == [(1, 2, 2, 2)]


def test_new_ops_empty_input():
    """Empty-table robustness (the ADVICE-r3 crash class): every r4 operator
    returns an empty result instead of raising on a zero-row dataset."""
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.dedup import ngram_containment_pairs
    from osm_lump_ways_ray.stages.graph import sssp
    from osm_lump_ways_ray.stages.similarity import quantize_embeddings_int8
    from osm_lump_ways_ray.stages.text import bigram_topk, vocab_topk_by_group

    empty_docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
    }))
    empty_pages = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "url": pa.array([], pa.string()),
    }))
    empty_emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))
    from osm_lump_ways_ray.stages.web import host_stats, url_dedup

    assert url_dedup(empty_pages).count() == 0
    assert host_stats(empty_pages).count() == 0
    assert bigram_topk(empty_docs).count() == 0
    assert vocab_topk_by_group(empty_docs).count() == 0
    assert ngram_containment_pairs(empty_docs).count() == 0
    assert quantize_embeddings_int8(empty_emb).count() == 0
    e = ray.data.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                      "dst": pa.array([], pa.int64()),
                                      "w": pa.array([], pa.int64())}))
    s = ray.data.from_arrow(pa.table({"node": pa.array([], pa.int64())}))
    assert sssp(e, s, force="local").count() == 0


def test_gzip_roundtrip_stats_and_framing():
    """gzip_text_batch emits REAL gzip-framed payloads (0x1f8b magic,
    stdlib-gzip readable); gunzip_stats_batch recovers exact byte length
    and an md5 matching hashlib over the original utf-8 bytes."""
    import gzip as gzip_mod
    import hashlib

    import pyarrow as pa

    from osm_lump_ways_ray.stages.web import (gzip_text_batch,
                                              gunzip_stats_batch)

    texts = ["hello world", "ünïcode ✓ text", "", "a" * 10_000]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    enc = gzip_text_batch(t)
    for payload, txt in zip(enc["payload"].to_pylist(), texts):
        assert payload[:2] == b"\x1f\x8b"  # gzip magic — WARC framing
        assert gzip_mod.decompress(payload).decode("utf-8") == txt
    out = gunzip_stats_batch(enc)
    assert out["n_bytes"].to_pylist() == [len(x.encode()) for x in texts]
    assert out["text_md5"].to_pylist() == [
        hashlib.md5(x.encode()).hexdigest() for x in texts]


def test_gunzip_roundtrip_dataset(ray_session):
    import hashlib

    import ray.data

    from osm_lump_ways_ray.stages.web import gunzip_roundtrip

    ds = ray.data.from_items(
        [{"doc_id": i, "text": f"doc {i} body " * (i + 1)}
         for i in range(20)])
    out = gunzip_roundtrip(ds).to_pandas().sort_values("doc_id")
    assert list(out["n_bytes"]) == [len(f"doc {i} body " * (i + 1))
                                    for i in range(20)]
    assert out["text_md5"].iloc[3] == hashlib.md5(
        ("doc 3 body " * 4).encode()).hexdigest()


def test_extract_hrefs_variants():
    """Vectorized findall: multiple links per page, relative resolution,
    pages with zero links, malformed (unclosed) hrefs dropped."""
    import pyarrow as pa

    from osm_lump_ways_ray.stages.web import extract_hrefs_batch

    t = pa.table({
        "url": ["https://a.example.com/p", "http://B.example.com/q",
                "https://c.example.com/"],
        "html": [
            '<a href="/x">x</a><a href="https://z.net/1">z</a>'
            '<a href="/y">y</a>',
            "no links here",
            '<a href="unclosed',  # no closing quote → no capture
        ],
    })
    out = extract_hrefs_batch(t).to_pandas()
    assert list(out["src_host"]) == ["a.example.com"] * 3
    assert list(out["dst_host"]) == ["a.example.com", "z.net",
                                     "a.example.com"]
    assert list(out["href"]) == ["/x", "https://z.net/1", "/y"]


def test_host_link_graph_rollup(ray_session):
    import ray.data

    from osm_lump_ways_ray.stages.web import host_link_graph

    rows = [{"url": f"https://s{i % 2}.org/p{i}",
             "html": '<a href="/self">s</a><a href="https://hub.net/x">h</a>'}
            for i in range(10)]
    out = host_link_graph(ray.data.from_items(rows)).to_pandas()
    edges = {(r.src_host, r.dst_host): r.n_links
             for r in out.itertuples()}
    assert edges == {("s0.org", "s0.org"): 5, ("s1.org", "s1.org"): 5,
                     ("s0.org", "hub.net"): 5, ("s1.org", "hub.net"): 5}


def test_anchor_text_rollup(ray_session):
    import ray.data

    from osm_lump_ways_ray.stages.web import anchor_text_rollup

    rows = [{"url": f"https://s{i % 2}.org/p{i}",
             "html": f'<a href="https://hub.net/x">term{i % 3}</a>'}
            for i in range(12)]
    out = anchor_text_rollup(ray.data.from_items(rows)).to_pandas()
    got = {(r.dst_host, r.anchor): r.n_links for r in out.itertuples()}
    assert got == {("hub.net", "term0"): 4, ("hub.net", "term1"): 4,
                   ("hub.net", "term2"): 4}


def test_parse_robots_text_groups_and_comments():
    from osm_lump_ways_ray.stages.web import parse_robots_text

    txt = ("# hi\nUser-agent: bad-bot\nDisallow: /\n\n"
           "User-agent: *\nDisallow: /private/  # trailing\n"
           "Allow: /private/ok\nDisallow:\n")
    allow, dis = parse_robots_text(txt)
    assert allow == ["/private/ok"]
    assert dis == ["/private/"]  # other group's rules and empty line skipped


def test_robots_filter_longest_match(ray_session):
    import ray.data

    from osm_lump_ways_ray.stages.web import robots_filter

    pages = ray.data.from_items([
        {"url": "https://a.org/private/ok/deep", "id": 1},   # allow wins
        {"url": "https://a.org/private/no", "id": 2},        # disallowed
        {"url": "https://a.org/pub", "id": 3},               # unmatched
        {"url": "https://a.org/tie", "id": 4},               # tie → allow
        {"url": "https://b.org/private/no", "id": 5},        # no robots row
    ])
    robots = ray.data.from_items([{
        "host": "a.org",
        "robots": ("User-agent: *\nDisallow: /private/\n"
                   "Allow: /private/ok\nDisallow: /tie\nAllow: /tie\n"),
    }])
    out = robots_filter(pages, robots).to_pandas()
    assert sorted(out["id"]) == [1, 3, 4, 5]
    assert sorted(out.columns) == ["id", "url"]
