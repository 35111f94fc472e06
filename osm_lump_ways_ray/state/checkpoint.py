"""Checkpoint + lineage layer (north rule: resumable jobs, per-partition lineage).

The reference has NO checkpoint/resume (SURVEY.md §4 — a panic kills the run; the
only staging is an env-var early exit at src/bin/osm-lump-ways/main.rs:224-226).
At 100 TB that is not acceptable, so every iterative kernel (connected components,
SCC, flow rounds) checkpoints its per-round state here:

- each step writes Parquet to ``<root>/steps/<key>/`` ATOMICALLY (write to a
  ``.tmp-<key>`` dir, then rename) and records completion in ``manifest.json``;
- a resumed run calls ``has(key)`` and loads the Parquet instead of recomputing —
  the kill/resume test (tests/test_checkpoint.py) exercises exactly this;
- ``lineage.jsonl`` gets one record per completed step: step key, row count,
  wall seconds, and free-form metrics — the per-partition lineage surface.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path
from typing import Any, Optional


def content_digest(ds, cols) -> int:
    """Cheap order-insensitive content digest of integer columns (ADVICE r2):
    a row-count-only fingerprint let two different edge sets with equal counts
    resume each other's mid-algorithm state. Per-element multiplicative mix,
    XOR-folded per batch (one row per block), XOR across blocks on the driver —
    bounded by block count, never by row count."""
    import numpy as np
    import pyarrow as pa

    mixer = np.uint64(0x9E3779B97F4A7C15)

    def part(batch: pa.Table) -> pa.Table:
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for c in cols:
                a = batch[c].to_numpy(zero_copy_only=False).astype(np.uint64)
                h = (a + np.uint64(1)) * mixer
                h ^= h >> np.uint64(29)
                acc ^= np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"d": pa.array([int(acc) & (2**63 - 1)], pa.int64())})

    out = 0
    for row in ds.map_batches(part, batch_format="pyarrow").take_all():
        out ^= int(row["d"])
    return out


class CheckpointManager:
    def __init__(self, root: Optional[str]):
        """root=None disables checkpointing (all has() → False, save() passthrough)."""
        self.root = Path(root) if root else None
        if self.root:
            (self.root / "steps").mkdir(parents=True, exist_ok=True)
        self._manifest = self._read_manifest()

    def _manifest_path(self) -> Path:
        return self.root / "manifest.json"

    def _read_manifest(self) -> dict:
        if self.root and self._manifest_path().exists():
            return json.loads(self._manifest_path().read_text())
        return {"completed": {}}

    def _write_manifest(self) -> None:
        tmp = self.root / "manifest.json.tmp"
        tmp.write_text(json.dumps(self._manifest, indent=1))
        os.replace(tmp, self._manifest_path())

    def step_dir(self, key: str) -> Path:
        return self.root / "steps" / key

    def has(self, key: str) -> bool:
        return bool(self.root) and key in self._manifest["completed"]

    def load(self, key: str):
        import ray.data

        return ray.data.read_parquet(str(self.step_dir(key)))

    def save(self, key: str, ds, extra: Optional[dict] = None):
        """Materialize ``ds`` to Parquet atomically; returns a Dataset re-read from
        the checkpoint (so downstream lineage starts from durable storage)."""
        if not self.root:
            return ds
        import ray.data

        t0 = time.monotonic()
        final = self.step_dir(key)
        tmp = self.root / "steps" / f".tmp-{key.replace('/', '_')}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        ds.write_parquet(str(tmp))
        if final.exists():
            shutil.rmtree(final)
        final.parent.mkdir(parents=True, exist_ok=True)
        os.replace(tmp, final)
        out = ray.data.read_parquet(str(final))
        # per-PARTITION lineage (north rule: every partition emits lineage +
        # metrics): one record per written parquet fragment, rows from the
        # footer only (no data read)
        import pyarrow.parquet as pq

        rows = 0
        for frag in sorted(final.glob("*.parquet")):
            frows = pq.ParquetFile(frag).metadata.num_rows
            rows += frows
            self.record(step=key, partition=frag.name, rows=frows,
                        bytes=frag.stat().st_size)
        self._manifest["completed"][key] = {"rows": rows, "ts": time.time()}
        self._write_manifest()
        self.record(step=key, rows=rows, wall_s=round(time.monotonic() - t0, 3),
                    **(extra or {}))
        return out

    def record(self, **fields: Any) -> None:
        """Append one lineage/metrics record (no-op when checkpointing disabled)."""
        if not self.root:
            return
        with open(self.root / "lineage.jsonl", "a") as f:
            f.write(json.dumps(fields) + "\n")
