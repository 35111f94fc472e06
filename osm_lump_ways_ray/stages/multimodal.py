"""Multimodal column plumbing (graft extension surface).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata;
decode/resize/feature-extract run as actor-pool ``map_batches`` stages with
SMALL batch sizes (large payloads × concurrency must fit worker heaps —
ray_guide "Memory-aware"). The decode libraries (PIL/ffmpeg/torchvision) are
NOT in this container, so the decode body is a clearly-marked deterministic
FAKE (STUB) gated behind an import-try; everything Ray-side — schema, actor
signature, batch sizing, output layout — is real and tested.
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
