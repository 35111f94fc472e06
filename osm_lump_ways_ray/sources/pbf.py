"""Native OSM PBF source/sink — the reference's ACTUAL input format.

The reference binaries read ``FILENAME.osm.pbf`` (cli_args.rs `-i`); until
now this engine only read Parquet analogs. PBF needs no external library:
the container format is 4-byte-BE-framed protobuf (fileformat.proto:
BlobHeader/Blob) around zlib-compressed protobuf blocks (osmformat.proto:
PrimitiveBlock → StringTable + DenseNodes/Way/Relation with delta-coded
zigzag packed varints). Both .proto schemas are public; this module
implements the wire format directly:

- packed-varint decode is VECTORIZED (numpy): continuation-bit mask →
  per-varint byte offsets → ≤10 shift/or passes over ALL varints at once —
  the bulk payload (dense node ids/lats/lons, way refs) never sees a
  per-value Python loop;
- per-feature message envelopes (one Way/Relation each) use a light wire
  walker that skips unknown fields by wire type, so real-world files with
  Info/denseinfo metadata parse fine;
- the Ray reader scans blob OFFSETS on the driver (header-size seeks only,
  no payload reads), then decodes blobs in parallel ``map_batches`` tasks —
  the sharded-read shape that scales to planet files;
- the encoder exists for fixtures and as a sink (same pattern as the PNG /
  WAV codecs: encoder + decoder + roundtrip tests, no media/proto libs).

Reference parity points (semantics only): node positions are decoded to the
same 1e-7-degree fixed point the engine uses everywhere
(lat = 1e-9·(lat_offset + granularity·raw); default granularity 100 →
raw IS the e7 value), matching ``read_node_positions``
(bin/osm-lump-ways-down/main.rs:1326-1354); ways keep their full tag
key/value lists for the M1 tag filters (bin/osm-lump-ways/main.rs:264-292).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterable, List, Sequence, Tuple

import numpy as np
import pyarrow as pa

# ─────────────────────────────────────────────── varint / zigzag primitives


def encode_varint(v: int) -> bytes:
    """Unsigned LEB128; negative ints are encoded as 64-bit two's complement
    (10 bytes), per protobuf."""
    v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_encode(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)


def encode_packed(values: Iterable[int], *, zigzag: bool = False) -> bytes:
    out = bytearray()
    for v in values:
        v = int(v)  # numpy scalars would wrap the Python shift arithmetic
        u = ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1) if zigzag else v
        out += encode_varint(u)
    return bytes(out)


def decode_varints(buf: bytes) -> np.ndarray:
    """ALL varints in a packed field at once (vectorized): returns int64
    (two's-complement reinterpretation of the unsigned values, exact for
    protobuf's 64-bit wrap encoding of negatives)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.r_[np.int64(0), ends[:-1] + 1]
    lens = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for k in range(int(lens.max())):
        m = lens > k
        vals[m] |= ((b[starts[m] + k].astype(np.uint64) & np.uint64(0x7F))
                    << np.uint64(7 * k))
    return vals.view(np.int64)


def zigzag_decode(v: np.ndarray) -> np.ndarray:
    u = v.view(np.uint64)
    return ((u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))) \
        .view(np.int64)


def decode_packed_segments(parts: List[bytes], *, delta: bool = False
                           ) -> tuple:
    """Decode MANY packed-varint payloads in ONE vectorized pass: returns
    ``(flat_values int64, per-segment counts int64)``. The per-feature
    ``decode_varints`` call was the PBF read hot spot (24k tiny numpy calls
    per 8k-way blob — fixed numpy overhead dominated); concatenating the
    segments amortizes it to 3 calls per blob. ``delta=True`` applies
    zigzag + WITHIN-segment cumsum (the refs/member-id delta coding) via a
    global cumsum minus repeated segment-start offsets. Empty segments
    (features without the field) keep alignment with count 0."""
    if not parts:
        return _EMPTY_I64, np.zeros(0, np.int64)
    concat = b"".join(parts)
    vals = decode_varints(concat)
    b = np.frombuffer(concat, np.uint8)
    term_cum = np.concatenate([
        np.zeros(1, np.int64),
        np.cumsum((b & 0x80) == 0, dtype=np.int64)])
    ends = np.cumsum(np.fromiter((len(p) for p in parts), np.int64,
                                 len(parts)))
    counts = np.diff(term_cum[ends], prepend=np.int64(0))
    if not delta:
        return vals.astype(np.int64), counts
    flat = zigzag_decode(vals)
    gc = np.cumsum(flat)
    starts = np.concatenate([np.zeros(1, np.int64), np.cumsum(counts)[:-1]])
    base = np.concatenate([np.zeros(1, np.int64), gc])[starts]
    return gc - np.repeat(base, counts), counts


# ─────────────────────────────────────────────────────── wire-format walker


def _walk_fields(buf: memoryview):
    """Yield (field_no, wire_type, payload) triples; payload is an int for
    wire type 0 (varint) / 1 (fixed64) / 5 (fixed32) and a memoryview for
    wire type 2. Unknown fields are the CALLER's job to ignore — this walker
    always advances correctly by wire type."""
    i, n = 0, len(buf)
    while i < n:
        key = 0
        shift = 0
        while True:
            byte = buf[i]
            i += 1
            key |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        field, wt = key >> 3, key & 7
        if wt == 0:
            v = 0
            shift = 0
            while True:
                byte = buf[i]
                i += 1
                v |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            yield field, 0, v
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                byte = buf[i]
                i += 1
                ln |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            yield field, 2, buf[i:i + ln]
            i += ln
        elif wt == 1:
            yield field, 1, int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 5:
            yield field, 5, int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt} (field {field})")


def _field_bytes(field: int, payload: bytes) -> bytes:
    return encode_varint((field << 3) | 2) + encode_varint(len(payload)) \
        + payload


def _field_varint(field: int, v: int) -> bytes:
    return encode_varint(field << 3) + encode_varint(v)


# ───────────────────────────────────────────────────────────────── encoder


class _StringTable:
    def __init__(self):
        self._idx = {"": 0}
        self._list = [b""]

    def add(self, s: str) -> int:
        i = self._idx.get(s)
        if i is None:
            i = len(self._list)
            self._idx[s] = i
            self._list.append(s.encode())
        return i

    def encode(self) -> bytes:
        return b"".join(_field_bytes(1, s) for s in self._list)


def _encode_primitive_block(nodes=None, ways=(), relations=()) -> bytes:
    """One PrimitiveBlock. ``nodes`` = (ids, lat_e7, lon_e7[, ts_sec]) int64
    arrays (a 4th array writes denseinfo delta-coded timestamps);
    ``ways`` = [(way_id, refs, tags_dict[, ts_sec])] (a 4th element writes an
    Info{timestamp} submessage); ``relations`` =
    [(rel_id, members=[(type_int, member_id, role)], tags_dict)].
    Timestamps are epoch seconds — the default date_granularity (1000 ms,
    field 18 omitted) makes the raw varint the seconds value."""
    st = _StringTable()
    groups = []
    if nodes is not None and len(nodes[0]):
        arrs = [np.asarray(a, dtype=np.int64) for a in nodes]
        ids, lat, lon = arrs[0], arrs[1], arrs[2]
        dense = (_field_bytes(1, encode_packed(np.diff(ids, prepend=0),
                                               zigzag=True)))
        if len(arrs) > 3:
            dense += _field_bytes(5, _field_bytes(2, encode_packed(
                np.diff(arrs[3], prepend=0), zigzag=True)))
        dense += (_field_bytes(8, encode_packed(np.diff(lat, prepend=0),
                                                zigzag=True))
                  + _field_bytes(9, encode_packed(np.diff(lon, prepend=0),
                                                  zigzag=True)))
        groups.append(_field_bytes(2, dense))
    way_msgs = []
    for w in ways:
        wid, refs, tags = w[0], w[1], w[2]
        keys = [st.add(k) for k in tags]
        vals = [st.add(tags[k]) for k in tags]
        m = _field_varint(1, int(wid))
        if keys:
            m += _field_bytes(2, encode_packed(keys))
            m += _field_bytes(3, encode_packed(vals))
        if len(w) > 3 and w[3]:
            m += _field_bytes(4, _field_varint(2, int(w[3])))
        m += _field_bytes(8, encode_packed(
            np.diff(np.asarray(refs, dtype=np.int64), prepend=0),
            zigzag=True))
        way_msgs.append(_field_bytes(3, m))
    if way_msgs:
        groups.append(b"".join(way_msgs))
    rel_msgs = []
    for rid, members, tags in relations:
        keys = [st.add(k) for k in tags]
        vals = [st.add(tags[k]) for k in tags]
        roles = [st.add(r) for _t, _m, r in members]
        mids = np.asarray([m for _t, m, _r in members], dtype=np.int64)
        types = [t for t, _m, _r in members]
        m = _field_varint(1, int(rid))
        if keys:
            m += _field_bytes(2, encode_packed(keys))
            m += _field_bytes(3, encode_packed(vals))
        if members:
            m += _field_bytes(8, encode_packed(roles))
            m += _field_bytes(9, encode_packed(np.diff(mids, prepend=0),
                                               zigzag=True))
            m += _field_bytes(10, encode_packed(types))
        rel_msgs.append(_field_bytes(4, m))
    if rel_msgs:
        groups.append(b"".join(rel_msgs))
    block = _field_bytes(1, st.encode())
    for g in groups:
        block += _field_bytes(2, g)
    # granularity 100 / offsets 0 are the defaults — omitted like real files
    return block


def _frame_blob(blob_type: str, payload: bytes, *, compress: bool = True) -> bytes:
    if compress:
        blob = (_field_varint(2, len(payload))
                + _field_bytes(3, zlib.compress(payload)))
    else:
        blob = _field_bytes(1, payload)
    header = (_field_bytes(1, blob_type.encode())
              + _field_varint(3, len(blob)))
    return struct.pack(">i", len(header)) + header + blob


def write_pbf(path: str, *, nodes=None, ways: Sequence = (),
              relations: Sequence = (), features_per_blob: int = 8000,
              compress: bool = True) -> dict:
    """Write a valid .osm.pbf: OSMHeader blob + OSMData blobs capped at
    ``features_per_blob`` primitives each (real files shard the same way —
    the reader parallelizes per blob). Returns counts + blob count."""
    header = (_field_bytes(4, b"OsmSchema-V0.6")
              + _field_bytes(4, b"DenseNodes")
              + _field_bytes(16, b"osm_lump_ways_ray"))
    n_blobs = 0
    with open(path, "wb") as f:
        f.write(_frame_blob("OSMHeader", header, compress=compress))
        n_blobs += 1
        if nodes is not None and len(nodes[0]):
            arrs = [np.asarray(a, dtype=np.int64) for a in nodes]
            for i in range(0, len(arrs[0]), features_per_blob):
                s = slice(i, i + features_per_blob)
                f.write(_frame_blob("OSMData", _encode_primitive_block(
                    nodes=tuple(a[s] for a in arrs)), compress=compress))
                n_blobs += 1
        for seq, kind in ((list(ways), "ways"), (list(relations), "rels")):
            for i in range(0, len(seq), features_per_blob):
                chunk = seq[i:i + features_per_blob]
                blk = (_encode_primitive_block(ways=chunk) if kind == "ways"
                       else _encode_primitive_block(relations=chunk))
                f.write(_frame_blob("OSMData", blk, compress=compress))
                n_blobs += 1
    return {"path": path, "n_blobs": n_blobs,
            "n_nodes": 0 if nodes is None else int(len(nodes[0])),
            "n_ways": len(ways), "n_relations": len(relations)}


# ───────────────────────────────────────────────────────────────── decoder


def scan_blob_spans(path: str) -> List[Tuple[str, int, int]]:
    """Driver-side blob index: [(type, offset, size)] — reads only the
    4-byte frames + BlobHeaders and SEEKS over payloads, so indexing a
    planet file touches O(#blobs) bytes, not the data."""
    spans = []
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                break
            hlen = struct.unpack(">i", raw)[0]
            hdr = memoryview(f.read(hlen))
            btype, dsize = "", 0
            for field, wt, val in _walk_fields(hdr):
                if field == 1 and wt == 2:
                    btype = bytes(val).decode()
                elif field == 3 and wt == 0:
                    dsize = val
            spans.append((btype, f.tell(), dsize))
            f.seek(dsize, 1)
    return spans


def _blob_payload(buf: bytes) -> bytes:
    raw = None
    for field, wt, val in _walk_fields(memoryview(buf)):
        if field == 1 and wt == 2:
            raw = bytes(val)
        elif field == 3 and wt == 2:
            raw = zlib.decompress(bytes(val))
    if raw is None:
        raise ValueError("Blob carries no raw/zlib_data payload")
    return raw


_EMPTY_I64 = np.zeros(0, np.int64)


def _info_ts(buf: memoryview) -> int:
    """Info message (osmformat.proto) → raw timestamp field (2), or 0."""
    for f2, w2, v2 in _walk_fields(buf):
        if f2 == 2 and w2 == 0:
            return v2
    return 0


def decode_primitive_block(payload: bytes) -> dict:
    """PrimitiveBlock → FLAT columnar structures (no per-feature row
    objects — VERDICT r4 next-step #4):

    - nodes: ``node_id/lat/lon`` int64 arrays (+ ``node_ts`` epoch-seconds,
      0 when the block has no denseinfo) — e7 fixed point;
    - ways: ``way_id``/``way_ts`` int64 arrays plus flat ``way_refs`` +
      per-way ``way_refs_len`` and flat string-table indices ``way_key_idx``
      / ``way_val_idx`` + ``way_kv_len`` — one ``pa.ListArray.from_arrays``
      per column downstream, never a per-way ``.tolist()``;
    - relations: the same flat layout (``rel_id/rel_ts``, ``rel_mids`` +
      ``rel_mids_len``, ``rel_types``, ``rel_role_idx``, ``rel_key_idx`` /
      ``rel_val_idx`` + ``rel_kv_len``);
    - ``strings``: the block string table (materialize tag text with ONE
      vectorized ``pc.take`` per column, not per-feature indexing).

    Timestamps ride the Info/denseinfo metadata (way `timestamp` keys the
    reference's stats CSVs — bin/osm-lump-ways/main.rs:253,281-283;
    ends_csv.rs:85-99): raw units are ``date_granularity`` ms (field 18,
    default 1000), converted here to epoch seconds."""
    strings: List[str] = []
    groups = []
    granularity, lat_off, lon_off, date_gran = 100, 0, 0, 1000
    for field, wt, val in _walk_fields(memoryview(payload)):
        if field == 1 and wt == 2:
            for f2, w2, v2 in _walk_fields(val):
                if f2 == 1 and w2 == 2:
                    strings.append(bytes(v2).decode("utf-8", "replace"))
        elif field == 2 and wt == 2:
            groups.append(val)
        elif field == 17 and wt == 0:
            granularity = val
        elif field == 18 and wt == 0:
            date_gran = val
        elif field == 19 and wt == 0:
            lat_off = val
        elif field == 20 and wt == 0:
            lon_off = val

    def to_e7(raw: np.ndarray, off: int) -> np.ndarray:
        # 1e-9·(off + granularity·raw) degrees → e7 fixed point, rounded to
        # NEAREST (floor((nano+50)/100) — floor division would bias toward
        # -inf for granularities whose products aren't multiples of 100);
        # exact for the default g=100/off=0 and any granularity % 100 == 0
        nano = off + granularity * raw.astype(np.int64)
        return (nano + 50) // 100

    def ts_sec(raw: np.ndarray) -> np.ndarray:
        return raw.astype(np.int64) * np.int64(date_gran) // np.int64(1000)

    nodes_id: List[np.ndarray] = []
    nodes_lat: List[np.ndarray] = []
    nodes_lon: List[np.ndarray] = []
    nodes_ts: List[np.ndarray] = []
    w_id: List[int] = []
    w_ts: List[int] = []
    w_refs_b: List[bytes] = []  # raw packed payloads — batch-decoded below
    w_kidx_b: List[bytes] = []
    w_vidx_b: List[bytes] = []
    r_id: List[int] = []
    r_ts: List[int] = []
    r_mids_b: List[bytes] = []
    r_types_b: List[bytes] = []
    r_ridx_b: List[bytes] = []
    r_kidx_b: List[bytes] = []
    r_vidx_b: List[bytes] = []
    for g in groups:
        for field, wt, val in _walk_fields(g):
            if field == 2 and wt == 2:  # DenseNodes
                ids = lat = lon = None
                dts = None
                for f2, w2, v2 in _walk_fields(val):
                    if f2 == 1 and w2 == 2:
                        ids = np.cumsum(zigzag_decode(decode_varints(bytes(v2))))
                    elif f2 == 8 and w2 == 2:
                        lat = np.cumsum(zigzag_decode(decode_varints(bytes(v2))))
                    elif f2 == 9 and w2 == 2:
                        lon = np.cumsum(zigzag_decode(decode_varints(bytes(v2))))
                    elif f2 == 5 and w2 == 2:  # DenseInfo
                        for f3, w3, v3 in _walk_fields(v2):
                            if f3 == 2 and w3 == 2:  # delta-coded timestamps
                                dts = np.cumsum(
                                    zigzag_decode(decode_varints(bytes(v3))))
                if ids is not None:
                    nodes_id.append(ids.astype(np.int64))
                    nodes_lat.append(to_e7(lat, lat_off))
                    nodes_lon.append(to_e7(lon, lon_off))
                    nodes_ts.append(ts_sec(dts) if dts is not None
                                    else np.zeros(len(ids), np.int64))
            elif field == 1 and wt == 2:  # plain Node (rare; all sint64)
                def _zz(u):
                    return int(zigzag_decode(
                        np.array([u], np.uint64).view(np.int64))[0])

                nid = rlat = rlon = rts = 0
                for f2, w2, v2 in _walk_fields(val):
                    if f2 == 1 and w2 == 0:
                        nid = _zz(v2)
                    elif f2 == 8 and w2 == 0:
                        rlat = _zz(v2)
                    elif f2 == 9 and w2 == 0:
                        rlon = _zz(v2)
                    elif f2 == 4 and w2 == 2:
                        rts = _info_ts(v2)
                nodes_id.append(np.array([nid], np.int64))
                nodes_lat.append(to_e7(np.array([rlat]), lat_off))
                nodes_lon.append(to_e7(np.array([rlon]), lon_off))
                nodes_ts.append(ts_sec(np.array([rts])))
            elif field == 3 and wt == 2:  # Way — stash raw packed payloads
                wid, ts = 0, 0
                refs_b = kidx_b = vidx_b = b""
                for f2, w2, v2 in _walk_fields(val):
                    if f2 == 1 and w2 == 0:
                        wid = v2
                    elif f2 == 2 and w2 == 2:
                        kidx_b = bytes(v2)
                    elif f2 == 3 and w2 == 2:
                        vidx_b = bytes(v2)
                    elif f2 == 4 and w2 == 2:
                        ts = _info_ts(v2)
                    elif f2 == 8 and w2 == 2:
                        refs_b = bytes(v2)
                w_id.append(wid)
                w_ts.append(ts)
                w_refs_b.append(refs_b)
                w_kidx_b.append(kidx_b)
                w_vidx_b.append(vidx_b)
            elif field == 4 and wt == 2:  # Relation — same raw stash
                rid, ts = 0, 0
                kidx_b = vidx_b = ridx_b = mids_b = types_b = b""
                for f2, w2, v2 in _walk_fields(val):
                    if f2 == 1 and w2 == 0:
                        rid = v2
                    elif f2 == 2 and w2 == 2:
                        kidx_b = bytes(v2)
                    elif f2 == 3 and w2 == 2:
                        vidx_b = bytes(v2)
                    elif f2 == 4 and w2 == 2:
                        ts = _info_ts(v2)
                    elif f2 == 8 and w2 == 2:
                        ridx_b = bytes(v2)
                    elif f2 == 9 and w2 == 2:
                        mids_b = bytes(v2)
                    elif f2 == 10 and w2 == 2:
                        types_b = bytes(v2)
                r_id.append(rid)
                r_ts.append(ts)
                r_mids_b.append(mids_b)
                r_types_b.append(types_b)
                r_ridx_b.append(ridx_b)
                r_kidx_b.append(kidx_b)
                r_vidx_b.append(vidx_b)

    def cat(parts: List[np.ndarray]) -> np.ndarray:
        return np.concatenate(parts).astype(np.int64) if parts else _EMPTY_I64

    # ONE vectorized varint pass per packed column across the whole blob
    way_refs, way_refs_len = decode_packed_segments(w_refs_b, delta=True)
    way_kidx, way_kv_len = decode_packed_segments(w_kidx_b)
    way_vidx, _ = decode_packed_segments(w_vidx_b)
    rel_mids, rel_mids_len = decode_packed_segments(r_mids_b, delta=True)
    rel_types, _ = decode_packed_segments(r_types_b)
    rel_ridx, _ = decode_packed_segments(r_ridx_b)
    rel_kidx, rel_kv_len = decode_packed_segments(r_kidx_b)
    rel_vidx, _ = decode_packed_segments(r_vidx_b)

    # raw way/relation timestamps → epoch seconds (0 = no metadata)
    return {
        "node_id": cat(nodes_id),
        "lat": cat(nodes_lat),
        "lon": cat(nodes_lon),
        "node_ts": cat(nodes_ts),
        "way_id": np.asarray(w_id, np.int64),
        "way_ts": ts_sec(np.asarray(w_ts, np.int64)),
        "way_refs": way_refs,
        "way_refs_len": way_refs_len,
        "way_key_idx": way_kidx,
        "way_val_idx": way_vidx,
        "way_kv_len": way_kv_len,
        "rel_id": np.asarray(r_id, np.int64),
        "rel_ts": ts_sec(np.asarray(r_ts, np.int64)),
        "rel_mids": rel_mids,
        "rel_mids_len": rel_mids_len,
        "rel_types": rel_types,
        "rel_role_idx": rel_ridx,
        "rel_key_idx": rel_kidx,
        "rel_val_idx": rel_vidx,
        "rel_kv_len": rel_kv_len,
        "strings": strings,
    }


# ─────────────────────────────────────────────────────────────── Ray reader


def _spans_dataset(path: str):
    import ray.data

    spans = [{"path": path, "offset": off, "size": size}
             for btype, off, size in scan_blob_spans(path)
             if btype == "OSMData"]
    return ray.data.from_items(spans) if spans else None


def _decode_span_batch(batch: pa.Table) -> List[dict]:
    out = []
    paths = batch["path"].to_pylist()
    offs = batch["offset"].to_pylist()
    sizes = batch["size"].to_pylist()
    for p, o, s in zip(paths, offs, sizes):
        with open(p, "rb") as f:
            f.seek(o)
            out.append(decode_primitive_block(_blob_payload(f.read(s))))
    return out


def read_pbf_nodes(path: str):
    """(node_id, lat, lon) Dataset — S2 over the real format; e7 ints."""
    import ray.data

    ds = _spans_dataset(path)
    if ds is None:
        return ray.data.from_arrow(pa.table({
            "node_id": pa.array([], pa.int64()),
            "lat": pa.array([], pa.int64()),
            "lon": pa.array([], pa.int64())}))

    def decode(batch: pa.Table) -> pa.Table:
        blocks = _decode_span_batch(batch)
        return pa.table({
            "node_id": pa.array(np.concatenate(
                [b["node_id"] for b in blocks]), pa.int64()),
            "lat": pa.array(np.concatenate([b["lat"] for b in blocks]),
                            pa.int64()),
            "lon": pa.array(np.concatenate([b["lon"] for b in blocks]),
                            pa.int64()),
        })

    return ds.map_batches(decode, batch_format="pyarrow", batch_size=4)


def _list_of(lens: np.ndarray, values: pa.Array) -> pa.ListArray:
    """One list column per blob from flat values + per-feature lengths —
    the vectorized assembly (no per-feature ``.tolist()``)."""
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), values)


def _take_strings(strings: List[str], idx: np.ndarray) -> pa.Array:
    import pyarrow.compute as pc

    st = pa.array(strings, pa.string())
    return pc.take(st, pa.array(idx, pa.int64()))


def read_pbf_ways(path: str):
    """(way_id, node_ids list, keys list, vals list, ts) Dataset — S1 over
    the real format; tag key/value lists feed the M1 filter DSL; ``ts`` is
    the Info timestamp in epoch seconds (0 = file carries no metadata),
    keying the A8 latest-timestamp stats (bin/osm-lump-ways/main.rs:253)."""
    import ray.data

    ds = _spans_dataset(path)
    if ds is None:
        return ray.data.from_arrow(pa.table({
            "way_id": pa.array([], pa.int64()),
            "node_ids": pa.array([], pa.list_(pa.int64())),
            "keys": pa.array([], pa.list_(pa.string())),
            "vals": pa.array([], pa.list_(pa.string())),
            "ts": pa.array([], pa.int64())}))

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for b in _decode_span_batch(batch):
            tables.append(pa.table({
                "way_id": pa.array(b["way_id"], pa.int64()),
                "node_ids": _list_of(
                    b["way_refs_len"],
                    pa.array(b["way_refs"], pa.int64())),
                "keys": _list_of(b["way_kv_len"],
                                 _take_strings(b["strings"],
                                               b["way_key_idx"])),
                "vals": _list_of(b["way_kv_len"],
                                 _take_strings(b["strings"],
                                               b["way_val_idx"])),
                "ts": pa.array(b["way_ts"], pa.int64()),
            }))
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow", batch_size=4)


def read_pbf_relations(path: str):
    """(rel_id, member_ids, member_types, roles, keys, vals, ts) Dataset —
    S3 over the real format (types: 0 node / 1 way / 2 relation)."""
    import ray.data

    ds = _spans_dataset(path)
    if ds is None:
        return ray.data.from_arrow(pa.table({
            "rel_id": pa.array([], pa.int64()),
            "member_ids": pa.array([], pa.list_(pa.int64())),
            "member_types": pa.array([], pa.list_(pa.int64())),
            "roles": pa.array([], pa.list_(pa.string())),
            "keys": pa.array([], pa.list_(pa.string())),
            "vals": pa.array([], pa.list_(pa.string())),
            "ts": pa.array([], pa.int64())}))

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for b in _decode_span_batch(batch):
            tables.append(pa.table({
                "rel_id": pa.array(b["rel_id"], pa.int64()),
                "member_ids": _list_of(
                    b["rel_mids_len"], pa.array(b["rel_mids"], pa.int64())),
                "member_types": _list_of(
                    b["rel_mids_len"], pa.array(b["rel_types"], pa.int64())),
                "roles": _list_of(b["rel_mids_len"],
                                  _take_strings(b["strings"],
                                                b["rel_role_idx"])),
                "keys": _list_of(b["rel_kv_len"],
                                 _take_strings(b["strings"],
                                               b["rel_key_idx"])),
                "vals": _list_of(b["rel_kv_len"],
                                 _take_strings(b["strings"],
                                               b["rel_val_idx"])),
                "ts": pa.array(b["rel_ts"], pa.int64()),
            }))
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow", batch_size=4)


def way_tag_values(batch: pa.Table, tag_key: str,
                   keys_col: str = "keys", vals_col: str = "vals"):
    """Per-row value of ``tag_key`` from parallel list<string> key/value
    columns, vectorized (one Arrow compare over the FLAT keys + one numpy
    scatter — no per-way ``to_pylist()``/dict build). Returns an object
    ndarray with None where the tag is absent; duplicate keys resolve to the
    LAST occurrence (dict(zip(keys, vals)) semantics)."""
    import pyarrow.compute as pc

    keys = batch[keys_col]
    vals = batch[vals_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    offs = keys.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    hit = pc.equal(keys.flatten(), pa.scalar(tag_key))
    idx = np.flatnonzero(hit.to_numpy(zero_copy_only=False))
    out = np.full(len(batch), None, dtype=object)
    if len(idx):
        way_of = np.searchsorted(offs[1:], idx, side="right")
        vflat = vals.flatten().to_numpy(zero_copy_only=False)
        out[way_of] = vflat[idx]  # in-order scatter → last duplicate wins
    return out


def pbf_directed_edges(path: str, *, tag_key: str = "name",
                       num_partitions: int = 16):
    """PBF → the -down engine's directed edge table (src, dst, length_m,
    tagid, way_id): every way explodes into consecutive node pairs in way
    order (waterway direction = node order, -down/main.rs:330-420), lengths
    by haversine over the joined positions, tagid = interned ``tag_key``
    value (the -down flow-follows-tag group; -1 when untagged). Returns
    (edges_ds, nodes_ds)."""
    from ..functions.haversine import haversine_m_fp
    from ..stages.graph import intern_group_ids
    from ..stages.relational import cogroup_join

    nodes = read_pbf_nodes(path)
    ways = read_pbf_ways(path)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["node_ids"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat = ids.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = ids.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        n_pairs = np.maximum(lens - 1, 0)
        wid = batch["way_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tagv = way_tag_values(batch, tag_key)
        # consecutive-pair indices per way, vectorized over the flat buffer
        base = np.repeat(offs[:-1], n_pairs)
        step = (np.arange(int(n_pairs.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(n_pairs) - n_pairs, n_pairs))
        a = flat[base + step]
        b = flat[base + step + 1]
        return pa.table({
            "src": pa.array(a, pa.int64()),
            "dst": pa.array(b, pa.int64()),
            "way_id": pa.array(np.repeat(wid, n_pairs), pa.int64()),
            "_tag": pa.array(np.repeat(tagv, n_pairs).tolist(), pa.string()),
        })

    e = ways.map_batches(explode, batch_format="pyarrow")
    pos_s = nodes.rename_columns(["src", "lat_s", "lon_s"])
    pos_d = nodes.rename_columns(["dst", "lat_d", "lon_d"])
    # LEFT joins + a loud completeness check — an inner join would silently
    # delete edges whose endpoint position is missing (boundary-clipped
    # extracts); the reference panics on a missing node position
    # (osm-lump-ways-down/main.rs:1359 unwrap)
    e = cogroup_join(e, pos_s, ("src",), how="left_outer",
                     num_partitions=num_partitions)
    e = cogroup_join(e, pos_d, ("dst",), how="left_outer",
                     num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        miss = pc.or_(pc.is_null(batch["lat_s"]), pc.is_null(batch["lat_d"]))
        if pc.any(miss).as_py():
            bad = batch.filter(miss)
            raise ValueError(
                f"pbf_directed_edges: {len(bad)} edge(s) reference node "
                f"id(s) with no position in the PBF (first way_ids: "
                f"{bad['way_id'].to_pylist()[:5]}). Incomplete input; the "
                f"reference fails here too (main.rs:1359).")
        d = haversine_m_fp(
            batch["lat_s"].to_numpy(zero_copy_only=False).astype(np.float64),
            batch["lon_s"].to_numpy(zero_copy_only=False).astype(np.float64),
            batch["lat_d"].to_numpy(zero_copy_only=False).astype(np.float64),
            batch["lon_d"].to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({
            "src": batch["src"], "dst": batch["dst"],
            "length_m": pa.array(d, pa.float64()),
            "way_id": batch["way_id"], "_tag": batch["_tag"],
        })

    e = e.map_batches(finish, batch_format="pyarrow")
    e = intern_group_ids(e, "_tag", out_col="tagid")

    def drop_tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch["_tag"]
        tag = pc.if_else(pc.is_valid(t), batch["tagid"],
                         pa.scalar(-1, pa.int64()))
        return pa.table({
            "src": batch["src"], "dst": batch["dst"],
            "length_m": batch["length_m"], "tagid": tag,
            "way_id": batch["way_id"],
        })

    return e.map_batches(drop_tag, batch_format="pyarrow"), nodes
