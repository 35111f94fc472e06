"""GeoJSON / GeoJSONSeq feature sink (reference op S4, src/fileio.rs:91-172).

Reference output model (§1.3): RFC 7946 FeatureCollection (``.geojson``) or RFC
8142 record-separator-delimited sequence (``.geojsons`` — each line prefixed
with 0x1E and terminated with \\n), geometry coordinates printed at 6 decimals
(src/fileio.rs:185), properties rounded upstream.

Ray-Data-first: a ``map_batches`` stage renders each feature row to its final
byte line (vectorized JSON assembly per batch), and the sink writes one file
per block under the output dir (resumable layout: re-running skips blocks via
the part naming — the driver of a 100 TB job keys parts by input shard)."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

RS = b"\x1e"


def _fmt_coord(v_e7: int) -> float:
    # 6-decimal printing of fixed-point coords (fileio.rs:185)
    return round(v_e7 / 1e7, 6)


def render_linestring_features(batch: pa.Table, *, props_cols, lats_col="lats",
                               lons_col="lons") -> pa.Table:
    """Rows (props…, lats: list<int>, lons: list<int>) → GeoJSONSeq byte lines."""
    lats = batch[lats_col].to_pylist()
    lons = batch[lons_col].to_pylist()
    props = {c: batch[c].to_pylist() for c in props_cols}
    lines = []
    for i in range(len(batch)):
        feature = {
            "type": "Feature",
            "properties": {c: props[c][i] for c in props_cols},
            "geometry": {
                "type": "LineString",
                "coordinates": [[_fmt_coord(lo), _fmt_coord(la)]
                                for la, lo in zip(lats[i], lons[i])],
            },
        }
        lines.append(RS + json.dumps(feature, separators=(",", ":"),
                                     ensure_ascii=False).encode() + b"\n")
    return pa.table({"line": pa.array(lines, pa.binary())})


def write_geojsonseq(ds, out_dir: str, *, props_cols, lats_col="lats",
                     lons_col="lons"):
    """Render + write one ``part-*.geojsons`` file per block (atomic per part)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rendered = ds.map_batches(
        lambda b: render_linestring_features(b, props_cols=props_cols,
                                             lats_col=lats_col, lons_col=lons_col),
        batch_format="pyarrow")

    def write_block(batch: pa.Table) -> pa.Table:
        import hashlib
        import os

        payload = b"".join(batch["line"].to_pylist())
        name = hashlib.md5(payload).hexdigest()[:16]
        tmp = os.path.join(out_dir, f".tmp-{name}")
        final = os.path.join(out_dir, f"part-{name}.geojsons")
        if not os.path.exists(final):  # resumable: finished parts are skipped
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, final)
        return pa.table({"part": [final], "n_features": [len(batch)]})

    return rendered.map_batches(write_block, batch_format="pyarrow",
                                batch_size=None)
