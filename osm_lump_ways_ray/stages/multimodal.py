"""Multimodal column plumbing (graft extension surface).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata;
decode/resize/feature-extract run as actor-pool ``map_batches`` stages with
SMALL batch sizes (large payloads × concurrency must fit worker heaps —
ray_guide "Memory-aware").

Two decode tiers:

- **REAL** (``DecodeImage`` / ``decode_images``): uncompressed formats need
  no codec library — 24-bit BMP and binary PPM (P6) parse with pure numpy
  (header fields, bottom-up BGR rows, 4-byte padding), then real pixel math:
  channel sums + nearest-neighbour resize + integer grayscale pooling,
  value-exact vs a SQL oracle (queries.py ``multimodal_decode``).
- **STUB** (``DecodeImageStub``): video genuinely requires ffmpeg, which is
  NOT in this container — the stub derives deterministic fake metadata and is
  clearly marked; with PIL present ``DecodeImage.decode`` falls through to it
  for real decode. PNG (stdlib zlib codec below) and baseline JPEG
  (:mod:`.jpeg`, pure-numpy T.81 codec) decode REAL — only progressive or
  chroma-subsampled JPEG and video remain gated.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


class DecodeImageStub:
    """Actor-pool decode stage: binary/text payload → (width, height, n_pixels).

    With PIL present this would decode real images; here the STUB derives
    deterministic fake dimensions from the payload length (documented;
    ``NotImplementedError`` if real decode is requested without PIL)."""

    def __init__(self, payload_col: str = "text", id_col: str = "doc_id",
                 real_decode: bool = False):
        if real_decode and not HAVE_PIL:
            raise NotImplementedError(
                "real image decode requires PIL, which is not available in this "
                "container — use the deterministic stub (real_decode=False)")
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "n_chars" in batch.column_names:
            sizes = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            sizes = np.fromiter(
                (len(x) for x in batch[self.payload_col].to_pylist()),
                dtype=np.int64, count=len(batch))
        width = sizes % 640 + 1
        height = sizes % 480 + 1
        return pa.table({
            "doc_id": batch[self.id_col],
            "width": pa.array(width, pa.int64()),
            "height": pa.array(height, pa.int64()),
            "n_pixels": pa.array(width * height, pa.int64()),
        })


def decode_stub(docs_ds, *, concurrency=None, batch_size: int = 256):
    """Run the decode actor pool (small batches — payload-heavy stage sizing)."""
    import ray

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(2, ncpu))
    return docs_ds.map_batches(DecodeImageStub, batch_format="pyarrow",
                               batch_size=batch_size, concurrency=concurrency)


def resize_meta_batch(batch: pa.Table, *, max_side: int = 224) -> pa.Table:
    """Resize stage (metadata math; the pixel op would sit in the same body
    with PIL): fit (width, height) inside ``max_side`` preserving aspect,
    INTEGER arithmetic only so the DuckDB oracle is value-exact."""
    w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
    mx = np.maximum(w, h)
    scale_micro = np.where(mx > max_side, max_side * 1_000_000 // mx, 1_000_000)
    rw = w * scale_micro // 1_000_000
    rh = h * scale_micro // 1_000_000
    return batch.append_column("resized_w", pa.array(rw, pa.int64())) \
                .append_column("resized_h", pa.array(rh, pa.int64()))


def frame_sample_batch(batch: pa.Table, *, max_frames: int = 8,
                       size_col: str = "n_chars") -> pa.Table:
    """Frame-sample stage (video semantics on the fake payload): the clip has
    ``size % 240 + 1`` frames; sample every ceil(n/max_frames)-th frame —
    at most ``max_frames`` survive. Emits per-clip counts (the LONG per-frame
    expansion is ``stride``/``n_sampled`` applied in a flat_map when a real
    decoder exists)."""
    sizes = batch[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n_frames = sizes % 240 + 1
    stride = -(-n_frames // max_frames)
    n_sampled = -(-n_frames // stride)
    return batch.append_column("n_frames", pa.array(n_frames, pa.int64())) \
                .append_column("frame_stride", pa.array(stride, pa.int64())) \
                .append_column("n_sampled", pa.array(n_sampled, pa.int64()))


class FeatureExtractStub:
    """Feature-extraction actor: the per-actor ``__init__`` builds the (fake)
    model state ONCE — a 256-bucket lookup table standing in for weights — and
    ``__call__`` embeds each payload from its md5 (2 hex pairs → 2 int dims;
    a real model would batch-infer here). Deterministic and SQL-reproducible."""

    def __init__(self, payload_col: str = "text"):
        import hashlib

        self.payload_col = payload_col
        self.md5 = hashlib.md5
        self.lut = np.arange(256, dtype=np.int64)  # identity "weights"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.payload_col].to_pylist()
        f0 = np.empty(len(texts), np.int64)
        f1 = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            d = self.md5(t.encode()).hexdigest()
            f0[i] = self.lut[int(d[0:2], 16)]
            f1[i] = self.lut[int(d[2:4], 16)]
        return batch.append_column("feat0", pa.array(f0, pa.int64())) \
                    .append_column("feat1", pa.array(f1, pa.int64()))


def multimodal_pipeline(docs_ds, *, concurrency=None, batch_size: int = 256):
    """decode → resize → frame-sample → feature-extract over the opaque
    payload column: one actor pool for the stateful stages (decode+features),
    plain vectorized maps for the metadata math."""
    import ray

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(2, ncpu))

    class _Fused(DecodeImageStub):
        """Decode + features share one pool: two model-ish setups, one actor."""

        def __init__(self):
            DecodeImageStub.__init__(self)
            self._feat = FeatureExtractStub()

        def __call__(self, batch: pa.Table) -> pa.Table:
            meta = DecodeImageStub.__call__(self, batch)
            feats = self._feat(batch).select(["feat0", "feat1"])
            for name in feats.column_names:
                meta = meta.append_column(name, feats[name])
            if "n_chars" in batch.column_names:
                meta = meta.append_column("n_chars", batch["n_chars"])
            return meta

    meta = docs_ds.map_batches(_Fused, batch_format="pyarrow",
                               batch_size=batch_size, concurrency=concurrency)
    meta = meta.map_batches(resize_meta_batch, batch_format="pyarrow")
    meta = meta.map_batches(frame_sample_batch, batch_format="pyarrow")
    return meta.drop_columns(["n_chars"])


# ------------------------------------------------- REAL decode (pure numpy)
# PIL/ffmpeg are not in this container, but that only blocks video (and the
# exotic JPEG modes): BMP (BITMAPINFOHEADER, 24-bit) and PPM (P6) decode with
# header parsing + a reshape, PNG decodes with stdlib zlib + the five spec
# filters (codec below), and baseline JPEG decodes with the pure-numpy T.81
# codec in stages/jpeg.py. This is real pixel math over real bytes — the
# import-gated stub above remains only for video frames and
# progressive/subsampled JPEG.

def encode_bmp24(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP bytes (bottom-up rows,
    BGR pixel order, rows padded to 4 bytes — the standard layout)."""
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = bytearray(54)
    header[0:2] = b"BM"
    header[2:6] = (54 + img_size).to_bytes(4, "little")
    header[10:14] = (54).to_bytes(4, "little")
    header[14:18] = (40).to_bytes(4, "little")
    header[18:22] = w.to_bytes(4, "little")
    header[22:26] = h.to_bytes(4, "little")         # positive → bottom-up
    header[26:28] = (1).to_bytes(2, "little")
    header[28:30] = (24).to_bytes(2, "little")
    header[34:38] = img_size.to_bytes(4, "little")
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    return bytes(header) + rows.tobytes()


def decode_bmp24(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (H, W, 3) uint8 RGB."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bits = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bits != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP decodes without PIL "
            f"(got bits={bits}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * h,
                         offset=offset).reshape(h, row_bytes)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return img[::-1] if bottom_up else img


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (H, W, 3) uint8 RGB."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval as whitespace/comment-separated
    # ASCII tokens, then one whitespace byte, then raw RGB
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            while buf[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM needs byte-pair handling")
    return np.frombuffer(buf, dtype=np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3)


# ─────────────────────────────── real PNG codec (zlib is stdlib, no PIL)
# PNG's only hard dependency is DEFLATE (stdlib ``zlib``) and CRC-32 (stdlib
# ``binascii``), so the "compressed formats need PIL" line stops at JPEG:
# this is a complete 8-bit PNG encoder/decoder — all five scanline filters
# (None/Sub/Up/Average/Paeth, spec §9), gray / gray+alpha / RGB / RGBA color
# types, non-interlaced. Encode picks the per-row filter with the standard
# minimum-sum-of-absolute-differences heuristic (what libpng does), so a
# roundtrip genuinely exercises every unfilter path.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: colortype → samples per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import binascii

    return (len(payload).to_bytes(4, "big") + tag + payload
            + (binascii.crc32(tag + payload) & 0xFFFFFFFF).to_bytes(4, "big"))


def _paeth_predictor(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth (spec §9.4) over int16 inputs; returns uint8."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb_ = np.abs(p - b)
    pc_ = np.abs(p - c)
    out = np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                   np.where(pb_ <= pc_, b, c))
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, *, filter_type: Optional[int] = None,
               level: int = 6) -> bytes:
    """uint8 image → PNG bytes. ``(H, W)`` → grayscale (colortype 0),
    ``(H, W, 2)`` → gray+alpha (4), ``(H, W, 3)`` → RGB (2), ``(H, W, 4)`` →
    RGBA (6). ``filter_type`` pins one scanline filter (0-4) for tests; the
    default is libpng's per-row min-sum-of-abs heuristic."""
    import zlib

    if arr.dtype != np.uint8:
        raise ValueError("encode_png wants uint8 pixels")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = np.ascontiguousarray(arr).reshape(h, w * ch)
    prev = np.vstack([np.zeros((1, w * ch), np.uint8), raw[:-1]])  # Up ref
    left = np.zeros_like(raw)
    left[:, ch:] = raw[:, :-ch]                                    # Sub ref
    upleft = np.zeros_like(raw)
    upleft[:, ch:] = prev[:, :-ch]
    cand = np.empty((5, h, w * ch), np.uint8)
    cand[0] = raw
    cand[1] = raw - left
    cand[2] = raw - prev
    cand[3] = raw - ((left.astype(np.int16) + prev.astype(np.int16)) // 2
                     ).astype(np.uint8)
    cand[4] = raw - _paeth_predictor(left, prev, upleft)
    if filter_type is None:
        # per-row heuristic: minimize Σ|signed byte| of the filtered row
        cost = np.abs(cand.astype(np.int8).astype(np.int16)).sum(axis=2)
        pick = cost.argmin(axis=0).astype(np.uint8)
    else:
        pick = np.full(h, filter_type, np.uint8)
    scan = np.empty((h, 1 + w * ch), np.uint8)
    scan[:, 0] = pick
    scan[:, 1:] = cand[pick, np.arange(h)]
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, colortype, 0, 0, 0]))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(scan.tobytes(), level))
            + _png_chunk(b"IEND", b""))


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 array, channels as stored (``(H, W, ch)``; gray
    stays 1-channel). 8-bit depth, colortypes 0/2/4/6, non-interlaced —
    i.e. everything ``encode_png`` emits plus the common wild cases short of
    palettes and 16-bit. Unfilters all five filter types; Sub/Up/None/Average
    rows are numpy-vectorized along the row (Sub via per-lane cumsum),
    Average/Paeth fall back to a per-pixel walk only where the left-pixel
    dependency is genuinely sequential."""
    import zlib

    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        tag = buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + tag + payload + crc
        if tag == b"IHDR":
            meta = (int.from_bytes(payload[0:4], "big"),
                    int.from_bytes(payload[4:8], "big"),
                    payload[8], payload[9], payload[12])
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, colortype, interlace = meta
    if depth != 8 or interlace != 0 or colortype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} colortype={colortype} interlace={interlace} "
            "unsupported (8-bit gray/GA/RGB/RGBA, non-interlaced only)")
    ch = _PNG_CHANNELS[colortype]
    rowlen = w * ch
    scan = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if scan.size != h * (1 + rowlen):
        raise ValueError("PNG scanline payload size mismatch")
    scan = scan.reshape(h, 1 + rowlen)
    filters = scan[:, 0]
    out = np.empty((h, rowlen), np.uint8)
    zero = np.zeros(rowlen, np.uint8)
    for y in range(h):
        f = filters[y]
        row = scan[y, 1:]
        up = out[y - 1] if y else zero
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            out[y] = (np.cumsum(row.reshape(w, ch), axis=0, dtype=np.int64)
                      & 0xFF).astype(np.uint8).reshape(rowlen)
        elif f == 2:  # Up
            out[y] = row + up
        elif f == 3:  # Average — left-dependency is sequential
            r = out[y]
            r[:ch] = row[:ch] + (up[:ch] >> 1)
            for x in range(ch, rowlen):
                r[x] = row[x] + ((int(r[x - ch]) + int(up[x])) >> 1)
        elif f == 4:  # Paeth — left-dependency is sequential
            r = out[y]
            r[:ch] = row[:ch] + _paeth_predictor(
                zero[:ch], up[:ch], zero[:ch])
            for x in range(ch, rowlen):
                a, b, c = int(r[x - ch]), int(up[x]), int(up[x - ch]) if y else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                r[x] = row[x] + pred
        else:
            raise ValueError(f"PNG filter type {f}")
    img = out.reshape(h, w, ch)
    return img[:, :, 0][:, :, None] if ch == 1 else img


def decode_png_rgb(buf: bytes) -> np.ndarray:
    """PNG bytes → ``(H, W, 3)`` uint8 RGB: gray replicates across channels,
    alpha is dropped (matches ``PIL.Image.convert("RGB")`` for opaque/ignored
    alpha)."""
    img = decode_png(buf)
    ch = img.shape[2]
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 2:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]


def resize_nearest(img: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbour resize fitting inside ``max_side`` (aspect kept,
    integer floor mapping src = dst * src_size // dst_size — reproducible in
    SQL). Images already small enough pass through."""
    h, w = img.shape[:2]
    mx = max(h, w)
    if mx <= max_side:
        return img
    rw = max(1, w * max_side // mx)
    rh = max(1, h * max_side // mx)
    yi = np.arange(rh, dtype=np.int64) * h // rh
    xi = np.arange(rw, dtype=np.int64) * w // rw
    return img[yi[:, None], xi[None, :]]


class DecodeImage:
    """REAL decode actor: binary PNG/BMP/PPM payloads → per-image stats + a
    pooled feature row, all integer (value-exact against a SQL oracle that
    recomputes the same pixel arithmetic). One actor decodes many batches;
    formats are routed by magic bytes, anything else raises (use
    DecodeImageStub for opaque JPEG/video payloads)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 max_side: int = 8):
        self.payload_col = payload_col
        self.id_col = id_col
        self.max_side = max_side

    def decode(self, buf: bytes) -> np.ndarray:
        if buf[:8] == _PNG_SIG:
            return decode_png_rgb(buf)
        if buf[:2] == b"BM":
            return decode_bmp24(buf)
        if buf[:2] == b"P6":
            return decode_ppm(buf)
        if buf[:2] == b"\xff\xd8":  # baseline JPEG: real T.81 codec
            from .jpeg import decode_jpeg_rgb

            try:
                return decode_jpeg_rgb(buf)
            except NotImplementedError:
                if not HAVE_PIL:  # progressive / subsampled: honest gate
                    raise
        if HAVE_PIL:  # pragma: no cover - PIL absent in this container
            import io

            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))
        raise NotImplementedError(
            "video / progressive / chroma-subsampled JPEG need PIL/ffmpeg, "
            "which are not in this container; PNG, baseline 4:4:4/gray "
            "JPEG, BMP24 and PPM-P6 decode natively")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        w = np.empty(n, np.int64)
        h = np.empty(n, np.int64)
        sums = np.empty((n, 3), np.int64)
        gray = np.empty(n, np.int64)
        for i, buf in enumerate(payloads):
            img = self.decode(buf)
            h[i], w[i] = img.shape[:2]
            sums[i] = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            small = resize_nearest(img, self.max_side)
            # integer grayscale sum of the resized image: (r+g+b)//3 per px
            gray[i] = (small.sum(axis=2, dtype=np.int64) // 3).sum()
        return pa.table({
            "doc_id": batch[self.id_col],
            "width": pa.array(w, pa.int64()),
            "height": pa.array(h, pa.int64()),
            "n_pixels": pa.array(w * h, pa.int64()),
            "sum_r": pa.array(sums[:, 0], pa.int64()),
            "sum_g": pa.array(sums[:, 1], pa.int64()),
            "sum_b": pa.array(sums[:, 2], pa.int64()),
            "resized_graysum": pa.array(gray, pa.int64()),
        })


def decode_images(ds, *, payload_col: str = "payload",
                  id_col: str = "doc_id", max_side: int = 8,
                  concurrency=None, batch_size: int = 64):
    """Real-decode stage (small batches: payload bytes × concurrency must fit
    worker heaps). DecodeImage holds no model state, so the default is
    STATELESS tasks with a per-worker-process cached instance (no actor-pool
    spin-up cost — the contract stage's r1 lesson); pass ``concurrency`` to
    pin an explicit actor pool instead."""
    if concurrency is not None:
        return ds.map_batches(
            DecodeImage, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs=dict(payload_col=payload_col,
                                       id_col=id_col, max_side=max_side))

    from ..state.worker_cache import cached_state

    def stage(batch: pa.Table) -> pa.Table:
        worker = cached_state(
            ("decode_image", payload_col, id_col, max_side),
            lambda _k: DecodeImage(payload_col=payload_col, id_col=id_col,
                                   max_side=max_side))
        return worker(batch)

    return ds.map_batches(stage, batch_format="pyarrow",
                          batch_size=batch_size)


# ───────────────────────────────── real audio decode: RIFF/WAVE PCM16 mono
# Same contract as the BMP/PPM image path: a REAL container format encoded
# and parsed at the byte level (header walk, chunk sizes, little-endian PCM)
# — no audio library needed, and the SQL oracle recomputes the feature math
# from the synthesis params directly.

def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → canonical RIFF/WAVE PCM bytes."""
    import struct

    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                    sample_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav_pcm16(buf: bytes):
    """RIFF chunk walk (no fixed offsets assumed) → (int16 samples, rate).
    Validates PCM (format 1), mono, 16-bit; raises on anything else."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if fmt != 1:
                raise ValueError(f"not PCM (fmt={fmt})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if data is None or rate is None:
        raise ValueError("missing fmt/data chunk")
    if channels != 1 or bits != 16:
        raise ValueError(f"expected mono PCM16, got {channels}ch {bits}bit")
    return np.frombuffer(data, dtype="<i2").astype(np.int64), rate


class DecodeAudio:
    """Actor-pool callable: WAV payload column → integer audio features
    (n_samples, sample_rate, sum_s, abs_max, zero_x). Zero crossings are
    strict sign flips (product < 0). Per-item container parse, batched
    through the pool — the audio twin of DecodeImage."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        ns = np.empty(n, np.int64)
        rt = np.empty(n, np.int64)
        sm = np.empty(n, np.int64)
        mx = np.empty(n, np.int64)
        zx = np.empty(n, np.int64)
        for i, buf in enumerate(payloads):
            s, rate = decode_wav_pcm16(buf)
            ns[i] = len(s)
            rt[i] = rate
            sm[i] = int(s.sum())
            mx[i] = int(np.abs(s).max(initial=0))
            zx[i] = int(np.count_nonzero(s[1:] * s[:-1] < 0))
        return pa.table({
            "doc_id": batch[self.id_col],
            "n_samples": pa.array(ns, pa.int64()),
            "sample_rate": pa.array(rt, pa.int64()),
            "sum_s": pa.array(sm, pa.int64()),
            "abs_max": pa.array(mx, pa.int64()),
            "zero_x": pa.array(zx, pa.int64()),
        })


def decode_audio(ds, *, payload_col: str = "payload", id_col: str = "doc_id",
                 concurrency=None, batch_size: int = 256):
    """WAV-decode stage: explicit actor pool when ``concurrency`` is given,
    else stateless tasks + per-worker cache (state/worker_cache.py)."""
    if concurrency is not None:
        return ds.map_batches(
            DecodeAudio, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs=dict(payload_col=payload_col,
                                       id_col=id_col))
    from ..state.worker_cache import cached_state

    def stage(batch: pa.Table) -> pa.Table:
        worker = cached_state(("decode_audio", payload_col, id_col),
                              lambda _k: DecodeAudio(payload_col=payload_col,
                                                     id_col=id_col))
        return worker(batch)

    return ds.map_batches(stage, batch_format="pyarrow",
                          batch_size=batch_size)
