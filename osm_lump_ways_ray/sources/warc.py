"""WARC container source/sink — the web-archive record format (ISO 28500,
the Common Crawl container).

The reference engine reads its domain's native container format directly
(``.osm.pbf`` — a length-prefixed sequence of independently-compressed
blobs, scanned in parallel: `src/bin/osm-lump-ways/main.rs:263-284`). The
webtext graft's exact analog is WARC: ``response`` records framed with
WARC/1.0 headers, each record compressed as its OWN gzip member — the
Common Crawl convention that makes one ``.warc.gz`` splittable, because a
reader can start at any member boundary and every member is a complete
record.

Ray-Data shape (mirrors sources/pbf.py):

- **writer**: one ``.warc.gz`` file per input block (never one giant file —
  a failed run skips finished parts on retry), written atomically
  (tmp + rename), gzip mtime pinned to 0 so output bytes are deterministic.
- **reader**: parallel over files (one block per container, like the PBF
  blob shards); WITHIN a file a sequential member scan via
  ``zlib.decompressobj(wbits=31)`` + ``unused_data`` chaining — per-record
  Python is inherent to self-delimiting stream framing, and records are
  kilobytes, so the loop amortizes exactly like the reference's per-blob
  scan.
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import os
import zlib

import numpy as np
import pyarrow as pa

_PAYLOAD_SUFFIX = b"\r\n\r\n"


# record-type → Content-Type, the two members of the Common Crawl family:
# .warc (response = raw fetch) and .wet (conversion = extracted text)
_RECORD_TYPES = {
    "response": "application/http; msgtype=response",
    "conversion": "text/plain",
}


def _warc_record(url: str, date: str, payload: bytes,
                 record_type: str = "response") -> bytes:
    hdr = ("WARC/1.0\r\n"
           f"WARC-Type: {record_type}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {date}Z\r\n"
           f"Content-Type: {_RECORD_TYPES[record_type]}\r\n"
           f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return hdr + payload + _PAYLOAD_SUFFIX


def warc_bytes_for_batch(batch: pa.Table, *, url_col: str = "url",
                         ts_col: str = "warc_ts",
                         payload_col: str = "html",
                         record_type: str = "response",
                         level: int = 6) -> bytes:
    """One gzip member per record, concatenated — the file body for a batch.
    ``ts_col`` is int64 epoch SECONDS (WARC-Date is second-resolution)."""
    urls = batch[url_col].to_pylist()
    ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
    dates = np.datetime_as_string(ts.astype("datetime64[s]"), unit="s")
    payloads = batch[payload_col].to_pylist()
    parts = []
    for u, dt, p in zip(urls, dates, payloads):
        if isinstance(p, str):
            p = p.encode()
        parts.append(gzip.compress(_warc_record(u, str(dt), p, record_type),
                                   compresslevel=level, mtime=0))
    return b"".join(parts)


def write_warc(pages_ds, out_dir: str, *, url_col: str = "url",
               ts_col: str = "warc_ts", payload_col: str = "html",
               record_type: str = "response", level: int = 6):
    """Sink: one ``part-<md5>.warc.gz`` per block. The filename keys on the
    block's (first url, row count, last url), so identical input partitioned
    identically rewrites the same file set — a retried run overwrites
    finished parts idempotently instead of duplicating them. Returns the
    manifest Dataset (path, n_records, n_bytes), one row per file."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        body = warc_bytes_for_batch(batch, url_col=url_col, ts_col=ts_col,
                                    payload_col=payload_col,
                                    record_type=record_type, level=level)
        u0 = batch[url_col][0].as_py()
        u1 = batch[url_col][len(batch) - 1].as_py()
        tag = hashlib.md5(
            f"{u0}|{len(batch)}|{u1}".encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{tag}.warc.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([len(batch)], pa.int64()),
                         "n_bytes": pa.array([len(body)], pa.int64())})

    # materialize: the manifest is tiny (one row per file) and forcing it is
    # what executes the writes — same contract as Dataset.write_parquet
    return pages_ds.map_batches(sink, batch_format="pyarrow").materialize()


def scan_warc_member_spans(data: bytes):
    """Yield ``(offset, length, record_bytes)`` per gzip member — the byte
    spans are what a CDX index records, so a later reader can fetch ONE
    record with a ranged read instead of scanning the file (the Common
    Crawl cluster.idx access pattern)."""
    pos = 0
    view = memoryview(data)
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        rec = d.decompress(view[pos:])
        rec += d.flush()
        consumed = (len(data) - pos) - len(d.unused_data)
        if consumed <= 0 or not d.eof:
            raise ValueError(
                f"truncated or corrupt gzip member at byte {pos}")
        yield pos, consumed, rec
        pos += consumed


def scan_warc_members(data: bytes):
    """Yield raw record bytes per gzip member (sequential within one file —
    the container is self-delimiting, so this is the splittable unit)."""
    for _off, _ln, rec in scan_warc_member_spans(data):
        yield rec


def parse_warc_record(rec: bytes):
    """(url, iso_date, payload, record_type) from one WARC/1.0 record;
    Content-Length frames the payload, so header-like bytes INSIDE payloads
    are safe."""
    i = rec.find(b"\r\n\r\n")
    if i < 0 or not rec.startswith(b"WARC/"):
        raise ValueError("not a WARC/1.0 record")
    h = {}
    for ln in rec[:i].decode("utf-8").split("\r\n")[1:]:
        k, _, v = ln.partition(":")
        h[k.strip().lower()] = v.strip()
    clen = int(h["content-length"])
    payload = rec[i + 4:i + 4 + clen]
    if len(payload) != clen:
        raise ValueError("payload shorter than Content-Length")
    return (h["warc-target-uri"], h["warc-date"], payload,
            h.get("warc-type", "response"))


def _decode_file_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.fs as pafs

    urls, dates, payloads, types = [], [], [], []
    for path in batch["path"].to_pylist():
        # compression=None — the .gz suffix must NOT trigger a whole-stream
        # auto-inflate (member boundaries ARE the record framing; the
        # per-member zlib scan below owns them)
        fs = pafs.LocalFileSystem() if "://" not in path \
            else pafs.FileSystem.from_uri(path)[0]
        with fs.open_input_stream(path, compression=None) as f:
            blob = f.read()
        for rec in scan_warc_members(blob):
            u, dt, p, rt = parse_warc_record(rec)
            urls.append(u)
            dates.append(dt)
            payloads.append(p)
            types.append(rt)
    ts = (np.array([d.rstrip("Z") for d in dates], dtype="datetime64[s]")
          .astype(np.int64) if dates else np.array([], np.int64))
    return pa.table({"url": pa.array(urls, pa.string()),
                     "warc_ts": pa.array(ts, pa.int64()),
                     "html": pa.array(payloads, pa.binary()),
                     "rec_type": pa.array(types, pa.string())})


def read_warc(path: str):
    """Distributed WARC reader: one task per ``.warc.gz`` file (the PBF
    blob-shard pattern — sources/pbf.py); emits (url, warc_ts int64 epoch s,
    html binary). ``path`` is a file, directory, or glob."""
    import ray.data

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.warc.gz")))
    else:
        files = sorted(glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(f"no .warc.gz under {path}")
    # one row per file → batch_size=1 → one decode task per container (the
    # PBF blob-shard fan-out); bytes are opened INSIDE the task so only
    # decoded records enter the object store
    ds = ray.data.from_items([{"path": f} for f in files])
    return ds.map_batches(_decode_file_batch, batch_format="pyarrow",
                          batch_size=1)


def build_cdx(path: str):
    """CDX index over a WARC directory — the Common Crawl ``cluster.idx``
    analog: one row per record with the byte span of its gzip member, so a
    consumer can fetch ONE record with a ranged read instead of scanning
    containers. Parallel one task per file (the blob-shard pattern); within
    a file the span scan is the same self-delimiting member walk as the
    reader. Emits ``(surt, url, warc_ts, filename, offset, length,
    digest)`` — digest is the payload md5 hex (stand-in for CC's sha1-b32;
    same certification power against the DuckDB oracle)."""
    import ray.data

    from ..stages.web import surt_key_batch

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.warc.gz")))
    else:
        files = sorted(glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(f"no .warc.gz under {path}")

    def index_file(batch: pa.Table) -> pa.Table:
        urls, ts, fns, offs, lens, digs = [], [], [], [], [], []
        for fname in batch["path"].to_pylist():
            with open(fname, "rb") as f:
                blob = f.read()
            for off, ln, rec in scan_warc_member_spans(blob):
                u, dt, payload, _rt = parse_warc_record(rec)
                urls.append(u)
                ts.append(dt)
                fns.append(os.path.basename(fname))
                offs.append(off)
                lens.append(ln)
                digs.append(hashlib.md5(payload).hexdigest())
        ts_i = (np.array([d.rstrip("Z") for d in ts], dtype="datetime64[s]")
                .astype(np.int64) if ts else np.array([], np.int64))
        t = pa.table({"url": pa.array(urls, pa.string()),
                      "warc_ts": pa.array(ts_i, pa.int64()),
                      "filename": pa.array(fns, pa.string()),
                      "offset": pa.array(offs, pa.int64()),
                      "length": pa.array(lens, pa.int64()),
                      "digest": pa.array(digs, pa.string())})
        return surt_key_batch(t).select(
            ["surt", "url", "warc_ts", "filename", "offset", "length",
             "digest"])

    ds = ray.data.from_items([{"path": f} for f in files])
    return ds.map_batches(index_file, batch_format="pyarrow", batch_size=1)


def read_warc_at(cdx_ds, warc_dir: str):
    """Random-access WARC fetch driven by a CDX Dataset: every record is
    read via its ``(filename, offset, length)`` span ONLY — seek + exact
    ranged read + single-member inflate, never a sequential file scan. One
    open per distinct file per batch (rows for one file cluster in one
    CDX part, so the fan-in is bounded). This is the access path a 100-TB
    corpus uses for targeted re-fetches: the index is small and sorted, the
    containers stay cold."""

    def fetch(batch: pa.Table) -> pa.Table:
        fns = batch["filename"].to_pylist()
        offs = batch["offset"].to_numpy()
        lens = batch["length"].to_numpy()
        order = np.lexsort((offs, np.array(fns, dtype=object)))
        urls = [None] * len(fns)
        ts = [None] * len(fns)
        payloads = [None] * len(fns)
        handle, handle_name = None, None
        try:
            for i in order.tolist():
                fname = fns[i]
                if fname != handle_name:
                    if handle is not None:
                        handle.close()
                    handle = open(os.path.join(warc_dir, fname), "rb")
                    handle_name = fname
                handle.seek(int(offs[i]))
                member = handle.read(int(lens[i]))
                if len(member) != int(lens[i]):
                    raise ValueError(
                        f"short read at {fname}:{offs[i]}+{lens[i]}")
                rec = gzip.decompress(member)
                u, dt, payload, _rt = parse_warc_record(rec)
                urls[i], ts[i], payloads[i] = u, dt, payload
        finally:
            if handle is not None:
                handle.close()
        ts_i = (np.array([d.rstrip("Z") for d in ts], dtype="datetime64[s]")
                .astype(np.int64) if ts else np.array([], np.int64))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "warc_ts": pa.array(ts_i, pa.int64()),
                         "html": pa.array(payloads, pa.binary())})

    return cdx_ds.map_batches(fetch, batch_format="pyarrow")


def write_wet(docs_ds, out_dir: str, *, url_col: str = "url",
              ts_col: str = "warc_ts", text_col: str = "text",
              level: int = 6):
    """WET sink — the extracted-text companion format (``conversion``
    records, text/plain payloads): what the headline's extract stage would
    publish at production scale. Same framing/idempotency as write_warc."""
    return write_warc(docs_ds, out_dir, url_col=url_col, ts_col=ts_col,
                      payload_col=text_col, record_type="conversion",
                      level=level)
