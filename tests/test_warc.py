"""WARC container source/sink (sources/warc.py): per-member gzip framing,
header/Content-Length parsing, write→read roundtrip, idempotent rewrite,
and loud rejection of corrupt containers."""

import gzip
import zlib

import pyarrow as pa
import pytest

from osm_lump_ways_ray.sources.warc import (
    parse_warc_record,
    read_warc,
    scan_warc_members,
    warc_bytes_for_batch,
    write_warc,
)


def _pages(n=7):
    return pa.table({
        "url": [f"https://ex.org/p/{i}" for i in range(n)],
        "warc_ts": pa.array([1_600_000_000 + i for i in range(n)],
                            pa.int64()),
        "html": pa.array([f"payload {i} \r\n\r\n tricky body".encode()
                          for i in range(n)], pa.binary()),
    })


def test_members_individually_decompressible():
    """Common Crawl convention: every record is its OWN gzip member, so a
    reader may start at any member boundary — stdlib gzip must inflate each
    member standalone."""
    body = warc_bytes_for_batch(_pages(3))
    recs = list(scan_warc_members(body))
    assert len(recs) == 3
    # re-slice the raw bytes member by member and gunzip each independently
    pos = 0
    for want in recs:
        d = zlib.decompressobj(wbits=31)
        got = d.decompress(body[pos:]) + d.flush()
        member_len = (len(body) - pos) - len(d.unused_data)
        assert gzip.decompress(body[pos:pos + member_len]) == got == want
        pos += member_len
    assert pos == len(body)


def test_parse_record_content_length_framing():
    body = warc_bytes_for_batch(_pages(2))
    recs = list(scan_warc_members(body))
    url, date, payload, rec_type = parse_warc_record(recs[0])
    assert url == "https://ex.org/p/0"
    assert date == "2020-09-13T12:26:40Z"
    assert rec_type == "response"
    # the payload embeds \r\n\r\n — Content-Length framing must keep it whole
    assert payload == b"payload 0 \r\n\r\n tricky body"


def test_wet_conversion_records(ray_session, tmp_path):
    """WET = conversion records with text/plain payloads; the reader tags
    them via rec_type so mixed archives stay distinguishable."""
    import ray.data

    from osm_lump_ways_ray.sources.warc import write_wet

    docs = pa.table({
        "url": ["https://ex.org/a", "https://ex.org/b"],
        "warc_ts": pa.array([1_600_000_000, 1_600_000_001], pa.int64()),
        "text": ["extracted text one", "extracted text two"],
    })
    out = str(tmp_path / "wet")
    write_wet(ray.data.from_arrow(docs), out)
    back = read_warc(out).to_pandas().sort_values("url")
    assert list(back["rec_type"]) == ["conversion", "conversion"]
    assert [bytes(b).decode() for b in back["html"]] == [
        "extracted text one", "extracted text two"]


def test_deterministic_bytes():
    """gzip mtime pinned to 0 → identical input gives identical bytes."""
    assert warc_bytes_for_batch(_pages()) == warc_bytes_for_batch(_pages())


def test_roundtrip_and_idempotent_rewrite(ray_session, tmp_path):
    import ray.data

    out = str(tmp_path / "w")
    pages = _pages(11)
    m1 = write_warc(ray.data.from_arrow(pages), out).to_pandas()
    assert m1["n_records"].sum() == 11
    back = read_warc(out).to_pandas().sort_values("url").reset_index(
        drop=True)
    assert list(back["url"]) == sorted(pages["url"].to_pylist())
    src = {u: (t, h) for u, t, h in zip(pages["url"].to_pylist(),
                                        pages["warc_ts"].to_pylist(),
                                        pages["html"].to_pylist())}
    for _, r in back.iterrows():
        ts, html = src[r["url"]]
        assert r["warc_ts"] == ts and bytes(r["html"]) == html
    # rewriting the same input must reuse the same file names (no dup parts)
    m2 = write_warc(ray.data.from_arrow(pages), out).to_pandas()
    assert sorted(m1["path"]) == sorted(m2["path"])


def test_corrupt_member_rejected(ray_session, tmp_path):
    p = tmp_path / "bad.warc.gz"
    body = warc_bytes_for_batch(_pages(2))
    p.write_bytes(body[:len(body) - 4])  # truncate the last member
    with pytest.raises(Exception, match="truncated|corrupt"):
        read_warc(str(p)).materialize()


def test_non_warc_record_rejected():
    with pytest.raises(ValueError, match="not a WARC"):
        parse_warc_record(b"HTTP/1.1 200 OK\r\n\r\nbody")


def test_member_spans_tile_file_exactly():
    """CDX spans: offsets/lengths must cover every byte of the container
    with no gaps or overlap (the ranged-read contract)."""
    from osm_lump_ways_ray.sources.warc import scan_warc_member_spans

    body = warc_bytes_for_batch(_pages(5))
    pos = 0
    for off, ln, rec in scan_warc_member_spans(body):
        assert off == pos and ln > 0
        assert gzip.decompress(body[off:off + ln]) == rec
        pos = off + ln
    assert pos == len(body)


def test_build_cdx_and_ranged_read(ray_session, tmp_path):
    import ray.data

    from osm_lump_ways_ray.sources.warc import build_cdx, read_warc_at

    out = str(tmp_path / "w")
    pages = _pages(9)
    write_warc(ray.data.from_arrow(pages), out)
    cdx = build_cdx(out).to_pandas()
    assert len(cdx) == 9
    assert set(cdx.columns) == {"surt", "url", "warc_ts", "filename",
                                "offset", "length", "digest"}
    # surt: host labels reversed, query/frag-free path
    assert (cdx["surt"] == "org,ex)/p/" +
            cdx["url"].str.rsplit("/", n=1).str[-1]).all()
    fetched = read_warc_at(
        ray.data.from_pandas(cdx[["filename", "offset", "length"]]),
        out).to_pandas().sort_values("url").reset_index(drop=True)
    src = {u: h for u, h in zip(pages["url"].to_pylist(),
                                pages["html"].to_pylist())}
    assert len(fetched) == 9
    for _, r in fetched.iterrows():
        assert bytes(r["html"]) == src[r["url"]]


def test_ranged_read_bad_span_rejected(ray_session, tmp_path):
    import ray.data

    from osm_lump_ways_ray.sources.warc import build_cdx, read_warc_at

    out = str(tmp_path / "w")
    write_warc(ray.data.from_arrow(_pages(3)), out)
    cdx = build_cdx(out).to_pandas().head(1)
    cdx["offset"] += 1  # mid-member: not a gzip stream start
    with pytest.raises(Exception):
        read_warc_at(ray.data.from_pandas(cdx), out).materialize()
