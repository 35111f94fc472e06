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
- **STUB** (``DecodeImageStub``): compressed formats (JPEG/PNG) and video
  genuinely require PIL/ffmpeg, which are NOT in this container — the stub
  derives deterministic fake metadata and is clearly marked; with PIL
  present ``DecodeImage.decode`` falls through to it for real decode.
"""

from __future__ import annotations

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
# PIL/ffmpeg are not in this container, but UNCOMPRESSED formats need no
# codec library: BMP (BITMAPINFOHEADER, 24-bit) and PPM (P6) decode with
# header parsing + a reshape. This is real pixel math over real bytes — the
# import-gated stub above remains only for compressed formats (JPEG/PNG)
# and video.

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
    """REAL decode actor: binary BMP/PPM payloads → per-image stats + a
    pooled feature row, all integer (value-exact against a SQL oracle that
    recomputes the same pixel arithmetic). One actor decodes many batches;
    a payload that is neither BMP nor P6 raises (use DecodeImageStub for
    opaque/compressed payloads)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 max_side: int = 8):
        self.payload_col = payload_col
        self.id_col = id_col
        self.max_side = max_side

    def decode(self, buf: bytes) -> np.ndarray:
        if buf[:2] == b"BM":
            return decode_bmp24(buf)
        if buf[:2] == b"P6":
            return decode_ppm(buf)
        if HAVE_PIL:  # pragma: no cover - PIL absent in this container
            import io

            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))
        raise NotImplementedError(
            "compressed image formats need PIL, which is not in this "
            "container; BMP24/PPM-P6 decode natively")

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
