"""URL-level web-corpus operators: parse → canonicalize → dedup → host rollup.

The first stage of every Common-Crawl-style pipeline is URL hygiene: parse
the url, canonicalize it (case-fold scheme/host, drop default ports, strip
query tracking junk and fragments), collapse recrawls of the same canonical
url, and roll up per-host stats for host-level filtering. All of it is
Arrow-kernel vectorized (``pc.extract_regex`` is RE2 — the same engine as
DuckDB's ``regexp_extract``, so the oracle reproduces the parse exactly);
the shuffles are hash-bucketed with map-side combiners.

Scale shape (100 TB): the parse/canonicalize stages are stateless
``map_batches`` over zero-copy Arrow; ``url_dedup`` shuffles one (curl,
doc) row per page pre-combined to one row per (curl) per block;
``host_stats`` is a two-level rollup — (host, curl) first, then host — so
the second shuffle moves one row per distinct canonical url, never per page.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2 on BOTH sides (Arrow extract_regex / DuckDB regexp_extract); optional
# groups that don't participate match as '' in both engines.
URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/:?#]+)"
          r"(?::(?P<port>[0-9]+))?(?P<path>/[^?#]*)?")

_DEFAULT_PORTS = (("https", "443"), ("http", "80"))


def parse_urls_batch(batch: pa.Table, *, url_col: str = "url") -> pa.Table:
    """url → (scheme, host, port, path) columns; one RE2 pass per batch."""
    st = pc.extract_regex(batch[url_col], pattern=URL_RE)
    return (batch.append_column("scheme", pc.utf8_lower(
                pc.struct_field(st, "scheme")))
                 .append_column("host", pc.utf8_lower(
                pc.struct_field(st, "host")))
                 .append_column("port", pc.struct_field(st, "port"))
                 .append_column("path", pc.struct_field(st, "path")))


def canonical_url_batch(batch: pa.Table, *, url_col: str = "url") -> pa.Table:
    """Adds ``curl``: scheme://host[:port]/path with scheme+host case-folded,
    default ports dropped, query string and fragment stripped (the classic
    recrawl-collapsing canonicalization)."""
    t = parse_urls_batch(batch, url_col=url_col)
    scheme, host = t["scheme"], t["host"]
    port = t["port"]
    drop = pc.equal(port, "")
    for sch, p in _DEFAULT_PORTS:
        drop = pc.or_(drop, pc.and_(pc.equal(scheme, sch), pc.equal(port, p)))
    port_part = pc.if_else(drop, "",
                           pc.binary_join_element_wise(":", port, ""))
    curl = pc.binary_join_element_wise(
        scheme, "://", host, port_part, t["path"], "")
    return t.append_column("curl", curl)


def surt_key_batch(batch: pa.Table, *, url_col: str = "url") -> pa.Table:
    """Adds ``surt``: the Sort-friendly URI Reordering Transform key that CDX
    indexes sort by (``com,example)/path`` — host labels reversed and
    comma-joined so one host's captures are contiguous under a plain byte
    sort). Label reversal is the repo's run-split idiom: one global
    permutation over the dot-split ListArray's flat values, no per-row
    Python."""
    t = parse_urls_batch(batch, url_col=url_col)
    labels = pc.split_pattern(t["host"], ".")
    la = labels.combine_chunks() if isinstance(labels, pa.ChunkedArray) \
        else labels
    off = la.offsets.to_numpy().astype(np.int64)
    starts, ends = off[:-1], off[1:]
    list_id = np.repeat(np.arange(len(starts)), ends - starts)
    perm = starts[list_id] + (ends[list_id] - 1) - np.arange(len(la.values))
    rev = pa.ListArray.from_arrays(
        pa.array(off, type=pa.int32()),
        la.values.take(pa.array(perm, pa.int64())))
    host_key = pc.binary_join(rev, ",")
    path = pc.if_else(pc.equal(t["path"], ""), "/", t["path"])
    surt = pc.binary_join_element_wise(host_key, ")", path, "")
    return t.append_column("surt", surt)


def url_dedup(pages_ds, *, url_col: str = "url", id_col: str = "doc_id",
              num_partitions: int = 16):
    """Canonical-URL dedup: (curl, n_pages, keep_id=min id). The shuffle is
    hash-bucketed on curl with map-side combine — one surviving row per
    distinct canonical url per block leaves the node."""
    from .relational import bucket_agg

    def stage(batch: pa.Table) -> pa.Table:
        t = canonical_url_batch(batch, url_col=url_col)
        return pa.table({"curl": t["curl"], "doc": t[id_col]})

    rows = pages_ds.map_batches(stage, batch_format="pyarrow")
    return bucket_agg(rows, ["curl"],
                      {"n_pages": (None, "count"), "keep_id": ("doc", "min")},
                      num_partitions=num_partitions, combine=True)


def host_stats(pages_ds, *, url_col: str = "url", id_col: str = "doc_id",
               num_partitions: int = 16):
    """Per-host rollup: (host, n_pages, n_canonical, keep_id). Two-level
    aggregation — (host, curl) partials first, then host — so the host
    shuffle is bounded by DISTINCT canonical urls, not page count, and a
    hot host (the classic web-corpus skew key) still combines map-side."""
    from .relational import bucket_agg

    def stage(batch: pa.Table) -> pa.Table:
        t = canonical_url_batch(batch, url_col=url_col)
        return pa.table({"host": t["host"], "curl": t["curl"],
                         "doc": t[id_col]})

    rows = pages_ds.map_batches(stage, batch_format="pyarrow")
    per_curl = bucket_agg(rows, ["host", "curl"],
                          {"n_pages": (None, "count"),
                           "keep_id": ("doc", "min")},
                          num_partitions=num_partitions, combine=True)
    return bucket_agg(per_curl, ["host"],
                      {"n_pages": ("n_pages", "sum"),
                       "n_canonical": (None, "count"),
                       "keep_id": ("keep_id", "min")},
                      num_partitions=num_partitions, combine=True)


def extract_hrefs_batch(batch: pa.Table, *, html_col: str = "html",
                        url_col: str = "url") -> pa.Table:
    """``<a href="...">`` targets from raw html — fully vectorized findall:
    one ``split_pattern`` on the anchor-prefix turns each page into a list
    of fragments, each fragment (except a list's first, which is pre-link
    content) BEGINS with its href target, so one RE2 ``extract_regex`` over
    the flat fragment values captures every link with zero per-row Python.
    Relative hrefs resolve against the page's own host. Emits one row per
    link: (src_host, dst_host, href)."""
    t = parse_urls_batch(batch, url_col=url_col)
    html = t[html_col].cast(pa.string())
    frags = pc.split_pattern(html, '<a href="')
    fa = frags.combine_chunks() if isinstance(frags, pa.ChunkedArray) \
        else frags
    off = fa.offsets.to_numpy().astype(np.int64)
    starts, ends = off[:-1], off[1:]
    page_id = np.repeat(np.arange(len(starts)), ends - starts)
    local = np.arange(len(fa.values)) - starts[page_id]
    keep = local > 0  # drop each page's pre-first-anchor fragment
    flat = fa.values.take(pa.array(np.nonzero(keep)[0], pa.int64()))
    page_id = page_id[keep]
    cap = pc.extract_regex(
        flat, pattern='^(?P<h>[^"]*)"[^>]*>(?P<t>[^<]*)')
    href = pc.struct_field(cap, "h")
    anchor = pc.struct_field(cap, "t")
    src_host = t["host"].take(pa.array(page_id, pa.int64()))
    # resolve: absolute → its own host; relative (leading /) → page host
    dst = pc.struct_field(
        pc.extract_regex(href, pattern=URL_RE), "host")
    dst = pc.utf8_lower(pc.fill_null(dst, ""))
    rel = pc.starts_with(pc.fill_null(href, ""), "/")
    dst_host = pc.if_else(rel, src_host, dst)
    ok = pc.and_(pc.is_valid(href), pc.not_equal(dst_host, ""))
    return pa.table({"src_host": src_host, "dst_host": dst_host,
                     "href": href,
                     "anchor": pc.fill_null(anchor, "")}).filter(ok)


def host_link_graph(pages_ds, *, html_col: str = "html",
                    url_col: str = "url", num_partitions: int = 16):
    """Host-level web link graph: href extraction per batch, then a
    combiner-backed (src_host, dst_host) count rollup — the edge shuffle
    moves one row per DISTINCT host pair per block, never per link. The
    output edge list feeds the existing graph engine directly (PageRank /
    SCC / degree over hosts — the classic crawl-frontier analyses)."""
    from .relational import bucket_agg

    links = pages_ds.map_batches(
        lambda b: extract_hrefs_batch(b, html_col=html_col,
                                      url_col=url_col),
        batch_format="pyarrow")
    return bucket_agg(links.select_columns(["src_host", "dst_host"]),
                      ["src_host", "dst_host"],
                      {"n_links": (None, "count")},
                      num_partitions=num_partitions, combine=True)


def anchor_text_rollup(pages_ds, *, html_col: str = "html",
                       url_col: str = "url", num_partitions: int = 16):
    """Inbound anchor-text aggregation — the classic web-corpus training
    signal (anchor terms describe the TARGET page better than its own
    text): (dst_host, anchor) → count, combiner-backed so one row per
    distinct (host, anchor) pair per block enters the shuffle."""
    from .relational import bucket_agg

    links = pages_ds.map_batches(
        lambda b: extract_hrefs_batch(b, html_col=html_col,
                                      url_col=url_col),
        batch_format="pyarrow")
    return bucket_agg(links.select_columns(["dst_host", "anchor"]),
                      ["dst_host", "anchor"],
                      {"n_links": (None, "count")},
                      num_partitions=num_partitions, combine=True)


def parse_robots_text(text: str):
    """(allow_prefixes, disallow_prefixes) for the ``User-agent: *`` group —
    the standard subset: comments stripped, empty Disallow ignored, groups
    other than ``*`` skipped. One tiny file per host; Python parse is fine."""
    allow, dis = [], []
    active = False
    for ln in text.splitlines():
        ln = ln.split("#", 1)[0].strip()
        if not ln:
            continue
        k, _, v = ln.partition(":")
        k, v = k.strip().lower(), v.strip()
        if k == "user-agent":
            active = v == "*"
        elif active and k == "disallow" and v:
            dis.append(v)
        elif active and k == "allow" and v:
            allow.append(v)
    return allow, dis


def robots_filter(pages_ds, robots_ds, *, url_col: str = "url",
                  num_partitions: int = 16):
    """Crawl-politeness filter: drop pages whose url path is excluded by
    their host's robots.txt under LONGEST-MATCH semantics (the REP rule:
    the longest matching Allow/Disallow prefix decides; ties go to Allow;
    hosts with no robots row are fully allowed).

    Scale shape: rules are parsed once per host into prefix lists, then
    pages JOIN rules on host (cogroup left_outer — host-partitioned, skew
    machinery included; never a broadcast of an unbounded host map). The
    per-batch apply groups rows by host runs and tests each host's few
    prefixes with one vectorized ``startswith`` per prefix."""
    from .relational import cogroup_join

    keep_cols = pages_ds.schema().names
    clash = {"host", "path", "_allow", "_dis"} & set(keep_cols)
    if clash:
        raise ValueError(f"robots_filter: pages columns collide with "
                         f"internal names {sorted(clash)}")

    def rules_stage(b: pa.Table) -> pa.Table:
        al, di = [], []
        for t in b["robots"].to_pylist():
            a, d = parse_robots_text(t)
            al.append(a)
            di.append(d)
        return pa.table({"host": b["host"],
                         "_allow": pa.array(al, pa.list_(pa.string())),
                         "_dis": pa.array(di, pa.list_(pa.string()))})

    rules = robots_ds.map_batches(rules_stage, batch_format="pyarrow")
    pages = pages_ds.map_batches(
        lambda b: parse_urls_batch(b, url_col=url_col).drop_columns(
            ["scheme", "port"]),
        batch_format="pyarrow")
    joined = cogroup_join(pages, rules, ("host",), how="left_outer",
                          num_partitions=num_partitions)

    def apply(b: pa.Table) -> pa.Table:
        n = len(b)
        if n == 0:
            return b.select(keep_cols)
        paths = np.asarray(b["path"].to_pylist(), dtype="U")
        hosts = np.asarray(b["host"].to_pylist(), dtype=object)
        allow_l = b["_allow"].to_pylist()
        dis_l = b["_dis"].to_pylist()
        keep = np.ones(n, dtype=bool)
        order = np.argsort(hosts, kind="stable")
        sh = hosts[order]
        bounds = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1], True])
        for i0, i1 in zip(bounds[:-1], bounds[1:]):
            idx = order[i0:i1]
            dis = dis_l[idx[0]]
            if not dis:  # no robots row (nulls) or nothing disallowed
                continue
            al = allow_l[idx[0]] or []
            ps = paths[idx]
            best_dis = np.zeros(len(idx), dtype=np.int64)
            for p in dis:
                m = np.char.startswith(ps, p)
                best_dis = np.maximum(best_dis, m * len(p))
            best_al = np.zeros(len(idx), dtype=np.int64)
            for p in al:
                m = np.char.startswith(ps, p)
                best_al = np.maximum(best_al, m * len(p))
            keep[idx] = (best_dis == 0) | (best_al >= best_dis)
        return b.filter(pa.array(keep)).select(keep_cols)

    return joined.map_batches(apply, batch_format="pyarrow")


# ─────────────────────────── deterministic raw-url synthesis (battery input)
# The documents table carries no url column; the battery synthesizes one
# deterministically from (source, lang, doc_id) — dirty on purpose (upper-case
# scheme/host, explicit default port, tracking query, fragment) so the
# canonicalizer has real work. The SQL oracle rebuilds the identical string.

def synth_urls_batch(batch: pa.Table, *, path_mod: int = 25,
                     id_col: str = "doc_id") -> pa.Table:
    d = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    pathk = pa.array((d % path_mod).astype("U"), pa.string())
    qid = pa.array((d % 7).astype("U"), pa.string())
    url = pc.binary_join_element_wise(
        "HTTPS://", pc.utf8_upper(batch["source"]), ".Example.ORG:443/",
        batch["lang"], "/p/", pathk, "?utm_source=feed&id=", qid, "#frag", "")
    return batch.append_column("url", url)


def synth_urls_sql(path_mod: int = 25) -> str:
    """The documents→raw-url construction as a SQL expression (oracle twin)."""
    return ("'HTTPS://' || UPPER(source) || '.Example.ORG:443/' || lang "
            f"|| '/p/' || CAST(doc_id % {path_mod} AS VARCHAR) "
            "|| '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR) "
            "|| '#frag'")


# ─────────────────────────── compressed-payload plumbing (WARC-style gzip)

def gzip_text_batch(batch: pa.Table, *, text_col: str = "text",
                    id_col: str = "doc_id", level: int = 6) -> pa.Table:
    """text → gzip-framed binary payload column (zlib wbits=31 — the WARC
    record framing; MTIME pinned 0 by CPython, so payloads are
    deterministic). Synthesis side of the roundtrip fixture."""
    import zlib

    payloads = []
    for t in batch[text_col].to_pylist():
        co = zlib.compressobj(level, zlib.DEFLATED, 31)
        payloads.append(co.compress(t.encode("utf-8")) + co.flush())
    return pa.table({id_col: batch[id_col],
                     "payload": pa.array(payloads, pa.binary())})


def gunzip_stats_batch(batch: pa.Table, *, payload_col: str = "payload",
                       id_col: str = "doc_id") -> pa.Table:
    """gzip binary payloads → decompressed-text stats: byte length + md5
    (bit-identical to DuckDB ``md5()``, so the oracle recomputes both from
    the uncompressed source column — a value match certifies the whole
    compress→decompress path). Real Common-Crawl inputs arrive as
    gzip-framed WARC records; this is the inflate stage of that read path.
    Per-payload ``zlib.decompress`` is one C call per row (like the image
    codecs — decompression is inherently per-record); everything else is
    vectorized."""
    import zlib

    from ..functions.hashing import md5_hex

    texts = [zlib.decompress(p, 31) for p in batch[payload_col].to_pylist()]
    n = len(texts)
    nbytes = np.fromiter((len(t) for t in texts), np.int64, n)
    return pa.table({
        id_col: batch[id_col],
        "n_bytes": pa.array(nbytes, pa.int64()),
        "text_md5": pa.array([md5_hex(t) for t in texts], pa.string()),
    })


def gunzip_roundtrip(docs_ds, *, text_col: str = "text",
                     id_col: str = "doc_id"):
    """compress → decompress → stats as two streaming map_batches stages
    (no materialization between them; payload bytes stay inside each
    block)."""
    import functools

    enc = docs_ds.map_batches(
        functools.partial(gzip_text_batch, text_col=text_col,
                          id_col=id_col), batch_format="pyarrow")
    return enc.map_batches(
        functools.partial(gunzip_stats_batch, id_col=id_col),
        batch_format="pyarrow")
