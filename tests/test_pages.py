"""Pages source tests: deterministic synthesis, byte-identity extraction
(the BASELINE.json per-row invariant), geocode, link derivation."""

import numpy as np
import pyarrow as pa
import pytest

from osm_lump_ways_ray.sources.pages import (
    CHAIN_LEN,
    PAGES_SCHEMA,
    doc_index_from_url,
    extract_batch,
    geocode_batch,
    link_pages_batch,
    row_fields,
    synth_pages_table,
)
from osm_lump_ways_ray.sources.reference_extract import reference_extract


def test_synth_deterministic_and_schema():
    t1 = synth_pages_table(50, seed=42)
    t2 = synth_pages_table(50, seed=42)
    assert t1.equals(t2)
    assert t1.schema.equals(PAGES_SCHEMA)
    t3 = synth_pages_table(50, seed=43)
    assert not t3.equals(t1)
    # chunk-independence: row i identical regardless of how many rows are made
    assert row_fields(42, 7) == {k: t1.column(k)[7].as_py() if k != "warc_ts"
                                 else t1.column(k)[7].value for k in
                                 ("url", "warc_ts", "html", "text", "lang")}


def test_extract_byte_identity_vs_text_and_oracle():
    """THE per-row invariant: engine extract == oracle extract == text, bytes."""
    t = synth_pages_table(200, seed=42)
    out = extract_batch(t)
    texts = t["text"].to_pylist()
    htmls = t["html"].to_pylist()
    extracted = out["extracted_text"].to_pylist()
    for i in range(len(t)):
        expected = texts[i].encode("utf-8")
        assert extracted[i] == expected, f"engine extract mismatch at row {i}"
        assert reference_extract(htmls[i]) == expected, f"oracle mismatch at row {i}"


def test_geocode_deterministic_in_range():
    t = geocode_batch(synth_pages_table(100, seed=42))
    lat = t["lat"].to_numpy()
    lon = t["lon"].to_numpy()
    assert lat.min() >= -900_000_000 and lat.max() <= 900_000_000
    assert lon.min() >= -1_800_000_000 and lon.max() <= 1_800_000_000
    assert (t["node_id"].to_numpy() > 0).all()
    t2 = geocode_batch(synth_pages_table(100, seed=42))
    assert t.equals(t2)


def test_doc_index_roundtrip():
    t = synth_pages_table(30, seed=42)
    np.testing.assert_array_equal(doc_index_from_url(t["url"].to_pylist()),
                                  np.arange(30))


def test_link_is_chunk_independent():
    """Membership rows must not depend on how pages are batched."""
    t = geocode_batch(synth_pages_table(40, seed=42))
    whole = link_pages_batch(t).sort_by([("way_key", "ascending"), ("seq", "ascending")])
    parts = pa.concat_tables([link_pages_batch(t.slice(0, 13)),
                              link_pages_batch(t.slice(13, 11)),
                              link_pages_batch(t.slice(24))])
    parts = parts.sort_by([("way_key", "ascending"), ("seq", "ascending")])
    assert whole.equals(parts)


def test_link_boundary_sharing():
    t = geocode_batch(synth_pages_table(CHAIN_LEN * 3, seed=42))
    m = link_pages_batch(t)
    # chain 1 and 2 get a seq-0 boundary row (chains 1,2,3 don't break until c=4)
    by_way = {}
    for w, s, n in zip(m["way_key"].to_pylist(), m["seq"].to_pylist(),
                       m["node_id"].to_pylist()):
        by_way.setdefault(w, {})[s] = n
    assert 0 in by_way[1] and 0 in by_way[2]
    # the boundary node is the previous chain's last member
    assert by_way[1][0] == by_way[0][CHAIN_LEN]
