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
