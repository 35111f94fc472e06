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


# --------------------------------------------------------------- full S4 surface
#
# Byte-parity rendering of the reference's writer (src/fileio.rs):
# - feature layout  {"properties":P, "geometry": G, "type": "Feature"}
#   (write_geojson_feature_directly, fileio.rs:147-172)
# - geometry layout {"type":"T", "coordinates": C} (fileio.rs:12-20)
# - coords printed  [%.6f, %.6f] with lon first (fileio.rs:174-214 — Rust
#   {:.6} = FIXED six decimals, so trailing zeros are kept)
# - property keys SORTED (serde_json's default Map is a BTreeMap)
# - .geojsons → RFC 8142 (0x1E prefix + LF, fileio.rs:156-168);
#   .geojsonl → plain line-delimited; .geojson → FeatureCollection with
#   ",\n" separators (fileio.rs:127-144); selected by extension
#   (format_for_filename, fileio.rs:104-112)
# - MultiLineString is the DEFAULT way-group geometry; LineString is the
#   --save-as-linestrings opt-in; ends are Point features (fileio.rs:266-291)


def _pt(lon_e7: int, lat_e7: int) -> str:
    return f"[{lon_e7 / 1e7:.6f}, {lat_e7 / 1e7:.6f}]"


def _ls(lats, lons) -> str:
    return "[" + ",".join(_pt(lo, la) for la, lo in zip(lats, lons)) + "]"


def _props_json(props: dict) -> str:
    return json.dumps({k: props[k] for k in sorted(props)},
                      separators=(",", ":"), ensure_ascii=False)


def render_feature_bytes(batch: pa.Table, *, props_cols,
                         geometry: str = "multilinestring",
                         lats_col: str = "lats", lons_col: str = "lons",
                         lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Rows → UNFRAMED feature JSON bytes (one ``feature`` binary per row),
    byte-identical to the reference writer. ``geometry``:

    - ``multilinestring``: lats/lons are list<list<int64>> e7 fixed-point
    - ``linestring``: lats/lons are list<int64>
    - ``point``: lat/lon are int64 scalars
    - ``none``: properties-only features (``"geometry": null`` — RFC 7946
      allows it; used for stats products like --grouped-waterways)
    """
    props = {c: batch[c].to_pylist() for c in props_cols}
    n = len(batch)
    if geometry == "none":
        geoms = ("null" for _ in range(n))
    elif geometry == "point":
        lats = batch[lat_col].to_pylist()
        lons = batch[lon_col].to_pylist()
        geoms = (f'{{"type":"Point", "coordinates": {_pt(lons[i], lats[i])}}}'
                 for i in range(n))
    elif geometry == "linestring":
        lats = batch[lats_col].to_pylist()
        lons = batch[lons_col].to_pylist()
        geoms = (f'{{"type":"LineString", "coordinates": '
                 f'{_ls(lats[i], lons[i])}}}' for i in range(n))
    elif geometry == "multilinestring":
        lats = batch[lats_col].to_pylist()
        lons = batch[lons_col].to_pylist()
        geoms = ('{"type":"MultiLineString", "coordinates": ['
                 + ",".join(_ls(la, lo)
                            for la, lo in zip(lats[i], lons[i])) + "]}"
                 for i in range(n))
    else:
        raise ValueError(f"unknown geometry {geometry!r}")
    feats = [
        ('{"properties":' + _props_json({c: props[c][i] for c in props_cols})
         + ', "geometry": ' + g + ', "type": "Feature"}').encode()
        for i, g in enumerate(geoms)
    ]
    return pa.table({"feature": pa.array(feats, pa.binary())})


def _format_for_filename(path: str) -> str:
    if path.endswith(".geojsons"):
        return "seq"
    if path.endswith(".geojsonl"):
        return "lines"
    if path.endswith(".geojson"):
        return "fc"
    raise ValueError(f"unsupported extension in {path!r} "
                     "(.geojson/.geojsons/.geojsonl)")


def _frame(features, fmt: str) -> bytes:
    if fmt == "seq":
        return b"".join(RS + f + b"\n" for f in features)
    if fmt == "lines":
        return b"".join(f + b"\n" for f in features)
    # FeatureCollection framing, fileio.rs:127-144
    return (b'{"type":"FeatureCollection", "features": [\n'
            + b",\n".join(features) + b"\n]}")


def _atomic_write(path: str, payload: bytes) -> None:
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def write_features_single(ds, out_path: str, *, props_cols,
                          geometry: str = "multilinestring", **geo_cols):
    """Render + write ONE file (format by extension). The driver streams
    rendered blocks — features never accumulate in driver memory, but a single
    file is inherently a final/small-output surface; for 100 TB use
    ``write_geojsonseq`` (per-block parts) or ``write_features_split``."""
    fmt = _format_for_filename(out_path)
    rendered = ds.map_batches(
        lambda b: render_feature_bytes(b, props_cols=props_cols,
                                       geometry=geometry, **geo_cols),
        batch_format="pyarrow")
    import os

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    n = 0
    with open(tmp, "wb") as f:
        if fmt == "fc":
            f.write(b'{"type":"FeatureCollection", "features": [\n')
        for batch in rendered.iter_batches(batch_format="pyarrow"):
            for feat in batch["feature"].to_pylist():
                if fmt == "seq":
                    f.write(RS + feat + b"\n")
                elif fmt == "lines":
                    f.write(feat + b"\n")
                else:
                    if n:
                        f.write(b",\n")
                    f.write(feat)
                n += 1
        if fmt == "fc":
            f.write(b"\n]}")
    os.replace(tmp, out_path)
    return {"path": out_path, "n_features": n}


def write_features_split(ds, out_pattern: str, *, split_col: str, props_cols,
                         geometry: str = "multilinestring", **geo_cols):
    """``--split-files-by-group`` (bin/osm-lump-ways cli_args.rs:26,139;
    main.rs:661-760): one output file per ``split_col`` value, substituted for
    the required ``%s`` in ``out_pattern``. Each group renders and writes in
    its own task (atomic tmp+rename per file — a re-run overwrites finished
    files identically, so the layout is resumable); format by extension."""
    if "%s" not in out_pattern:
        raise ValueError(f"no %s found in output pattern ({out_pattern})")
    fmt = _format_for_filename(out_pattern)

    def write_group(batch: pa.Table) -> pa.Table:
        import re

        val = str(batch[split_col][0].as_py())
        safe = re.sub(r"[^A-Za-z0-9._-]", "_", val)
        rendered = render_feature_bytes(batch, props_cols=props_cols,
                                        geometry=geometry, **geo_cols)
        feats = rendered["feature"].to_pylist()
        path = out_pattern.replace("%s", safe)
        _atomic_write(path, _frame(feats, fmt))
        return pa.table({"part": pa.array([path], pa.string()),
                         "n_features": pa.array([len(feats)], pa.int64())})

    return ds.groupby(split_col).map_groups(write_group, batch_format="pyarrow")


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
