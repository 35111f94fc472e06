"""Flagship lump pipeline — the reference's ``osm-lump-ways`` run re-expressed
Ray-Data-first over Common-Crawl-style pages (BASELINE.json north star).

Stages (all streaming; ``html`` is dropped immediately after extraction so wide
binary payloads never enter a shuffle — SURVEY.md §7.5):

  pages ──extract──▶ verify bytes ──geocode──▶ nodes(node_id, lat, lon, cell)
        └─link────▶ ways(way_id, node_ids, tags) ──A1 degree──▶ pillar set
  ways ──M5 contract──▶ edges(u, v, inter_nids, name, lang)
  edges ──G1 CC (grouped)──▶ labels(g, node, component_id)
  edges ──segment explode──▶ (a, b) pairs ⋈ nodes ⋈ nodes  (J1 position join)
        ──haversine──▶ per-segment length ⋈ labels ──▶ per-component length (A2)
  labels ⋈ nodes ──▶ per-tile (cell) stats — the H3-analog tile join
  components ──sort length desc──▶ ranks (A5/K1)

The reference pipeline being mirrored: src/bin/osm-lump-ways/main.rs:64-868
(passes 1-3, components, lengths, ranks, sorted output).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.haversine import haversine_m_fp
from ..sources.pages import derive_ways, extract_batch, geocode_batch
from ..stages.relational import cogroup_join as hash_join
from ..stages.graph import (
    connected_components,
    contract_ways,
    intern_group_ids,
    pillar_node_array,
)
from ..state.checkpoint import CheckpointManager

# ≈400 MB of int64 ids — above this the pillar set stays distributed
# (contract_ways_joined); below it one ray.put broadcast is cheaper
_PILLAR_BROADCAST_MAX = 50_000_000


def extract_and_verify(pages_ds, *, verify: bool = True):
    """html → extracted text; assert byte-identity vs the embedded text column
    (the per-row invariant), then PROJECT AWAY the html payload."""

    def run(batch: pa.Table) -> pa.Table:
        out = extract_batch(batch)
        if verify:
            ok = pc.equal(out["extracted_text"].cast(pa.string()), out["text"])
            bad = len(out) - pc.sum(ok.cast(pa.int64())).as_py()
            if bad:
                raise ValueError(f"extract byte-identity violated for {bad} rows")
        return out.drop_columns(["html", "extracted_text"])

    return pages_ds.map_batches(run, batch_format="pyarrow")


def chain_segments(batch: pa.Table, *, u_col: str = "u", v_col: str = "v",
                   inter_col: str = "inter_nids", carry: tuple = ()):
    """Vectorized chain expansion (the offsets idiom from the A1 degree pass):
    each edge row [u, *inter_nids, v] → per-segment (a, b) arrays plus the
    source edge index. NO per-row Python loop — list offsets/values come
    straight from the Arrow ListArray. Returns (a, b, edge_idx, seg_idx, dict
    of carried columns repeated per segment)."""
    u = batch[u_col].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch[v_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(u)
    if inter_col in batch.column_names and n:
        lst = batch[inter_col].combine_chunks()
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        off = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = lst.values.to_numpy(zero_copy_only=False).astype(np.int64) \
            if len(lst.values) else np.empty(0, dtype=np.int64)
        k = off[1:] - off[:-1]
    else:
        off = np.zeros(n + 1, dtype=np.int64)
        vals = np.empty(0, dtype=np.int64)
        k = np.zeros(n, dtype=np.int64)
    segs = k + 1
    eidx = np.repeat(np.arange(n, dtype=np.int64), segs)
    starts = np.cumsum(segs) - segs
    seg_idx = np.arange(len(eidx), dtype=np.int64) - starts[eidx]
    if len(vals):
        a = np.where(seg_idx == 0, u[eidx],
                     vals[np.maximum(off[eidx] + seg_idx - 1, 0)])
        b = np.where(seg_idx == segs[eidx] - 1, v[eidx],
                     vals[np.minimum(off[eidx] + seg_idx, len(vals) - 1)])
    else:
        a, b = u[eidx], v[eidx]
    carried = {c: batch[c].take(pa.array(eidx)) for c in carry}
    return a, b, eidx, seg_idx, carried


def _segment_pairs(batch: pa.Table) -> pa.Table:
    """Contracted edge rows → per-segment (a, b) rows carrying (g, anchor=u)."""
    a, b, eidx, _si, carried = chain_segments(batch, carry=("g",))
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "a": pa.array(a, pa.int64()),
        "b": pa.array(b, pa.int64()),
        "g": carried["g"],
        "anchor": pa.array(u[eidx], pa.int64()),
    })


def segment_lengths(edges_g, nodes_ds, *, num_partitions: int = 32):
    """J1: segments ⋈ node positions (twice) → haversine metres per segment.

    This is the central topology⋈geometry join of the reference
    (src/way_group.rs:38-44), expressed as two hash joins on node id instead of
    point lookups into an in-process position store."""
    from ..stages.relational import snapshot

    seg = edges_g.map_batches(_segment_pairs, batch_format="pyarrow")
    pos_a = nodes_ds.select_columns(["node_id", "lat", "lon"]).rename_columns(
        ["a", "lat_a", "lon_a"])
    pos_b = nodes_ds.select_columns(["node_id", "lat", "lon"]).rename_columns(
        ["b", "lat_b", "lon_b"])
    # one shuffle per stage (see lump() note on Ray 2.49 multi-shuffle DAGs)
    seg = snapshot(hash_join(seg, pos_a, ("a",), how="inner", num_partitions=num_partitions))
    seg = hash_join(seg, pos_b, ("b",), how="inner", num_partitions=num_partitions)

    def add_len(batch: pa.Table) -> pa.Table:
        m = haversine_m_fp(
            batch["lat_a"].to_numpy(zero_copy_only=False),
            batch["lon_a"].to_numpy(zero_copy_only=False),
            batch["lat_b"].to_numpy(zero_copy_only=False),
            batch["lon_b"].to_numpy(zero_copy_only=False),
        )
        return pa.table({"g": batch["g"], "anchor": batch["anchor"],
                         "length_m": pa.array(m, pa.float64())})

    return seg.map_batches(add_len, batch_format="pyarrow")


def segment_lengths_carried(edges_g):
    """NO-JOIN lengths: edges carry their full chain positions
    (``chain_lats``/``chain_lons`` parallel lists from M5 contraction — the
    InterStore pattern extended to geometry). One stateless map computes all
    per-segment haversines and pre-sums them per edge → (g, anchor=u, length_m).
    Replaces two node-id hash joins in the headline pipeline; the join variant
    (``segment_lengths``) remains the general path when geometry doesn't ride
    the edges."""

    def lens(batch: pa.Table) -> pa.Table:
        lat_l = batch["chain_lats"].combine_chunks()
        lon_l = batch["chain_lons"].combine_chunks()
        if isinstance(lat_l, pa.ChunkedArray):
            lat_l = lat_l.combine_chunks()
            lon_l = lon_l.combine_chunks()
        off = lat_l.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lats = (lat_l.values.to_numpy(zero_copy_only=False)
                if len(lat_l.values) else np.empty(0, dtype=np.int64))
        lons = (lon_l.values.to_numpy(zero_copy_only=False)
                if len(lon_l.values) else np.empty(0, dtype=np.int64))
        n = len(batch)
        # all consecutive pairs within chains: drop the last element of each
        # chain for A, the first for B — via a keep-mask over the flat values
        total = len(lats)
        is_last = np.zeros(total, dtype=bool)
        is_first = np.zeros(total, dtype=bool)
        if total:
            is_last[off[1:] - 1] = True
            is_first[off[:-1]] = True
        seg_m = haversine_m_fp(lats[~is_last], lons[~is_last],
                               lats[~is_first], lons[~is_first])
        # per-edge sum of its segments (segments per edge = chain len − 1)
        counts = (off[1:] - off[:-1]) - 1
        edge_ids = np.repeat(np.arange(n, dtype=np.int64), np.maximum(counts, 0))
        sums = np.zeros(n, dtype=np.float64)
        np.add.at(sums, edge_ids, seg_m)
        return pa.table({"g": batch["g"], "anchor": batch["u"],
                         "length_m": pa.array(sums, pa.float64())})

    return edges_g.map_batches(lens, batch_format="pyarrow")


def tile_stats(labels_ds, nodes_ds, *, num_partitions: int = 32,
               pillar_ref=None):
    """The H3-analog tile join: component labels ⋈ node cells → per-cell stats.

    Skew note: per-batch partial aggregation runs BEFORE the groupby, so a hot
    cell (the `tile_hotcell` fixture: 90% of nodes in one cell) contributes one
    partial row per batch, not one shuffled row per node — the all-to-all stays
    balanced without explicit salting.

    ``pillar_ref`` (r4): labels only contain PILLAR nodes (the contracted
    graph's vertices), so when the broadcast pillar array is already in the
    object store the cells side is pre-filtered map-side by binary search —
    the join shuffle drops from every node to pillar nodes (~5× at 10M
    pages). Semantically a no-op: the inner join discarded those rows anyway."""
    from ray.data.aggregate import Count, Sum

    cells = nodes_ds.select_columns(["node_id", "cell"]).rename_columns(
        ["node", "cell"])
    if pillar_ref is not None:
        import ray

        from ..state.worker_cache import cached_state

        def keep_pillars(batch: pa.Table) -> pa.Table:
            pil = cached_state((pillar_ref.hex(), "tile_pillars"),
                               lambda _k: ray.get(pillar_ref))
            n = batch["node"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(pil, n)
            np.minimum(idx, max(len(pil) - 1, 0), out=idx)
            hit = pil[idx] == n if len(pil) else np.zeros(len(n), bool)
            return batch.filter(pa.array(hit))

        cells = cells.map_batches(keep_pillars, batch_format="pyarrow")
    from ..stages.relational import snapshot

    lab = snapshot(hash_join(labels_ds, cells, ("node",), how="inner",
                             num_partitions=num_partitions))

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.graph import _unique_pairs

        uniq, inv = _unique_pairs(
            batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["component_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({
            "cell": pa.array(uniq[:, 0], pa.int64()),
            "component_id": pa.array(uniq[:, 1], pa.int64()),
            "n": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64),
                          pa.int64()),
        })

    from ..stages.relational import bucket_agg

    partials = lab.map_batches(partial, batch_format="pyarrow")
    per_cell_comp = bucket_agg(partials, ["cell", "component_id"],
                               {"num_nodes": ("n", "sum")},
                               num_partitions=num_partitions)
    return bucket_agg(per_cell_comp, ["cell"],
                      {"num_components": (None, "count"),
                       "num_nodes": ("num_nodes", "sum")},
                      num_partitions=max(4, num_partitions // 2))


def finalize_components(components_ds, edges_g, *, num_partitions: int = 8):
    """M9 props + A5 ranks on the components table.

    Props (src/bin/osm-lump-ways/main.rs:635-654): root_nodeid (= component_id,
    min contracted vertex), root_nodeid_120, length_m (1 dp, half-away rounding
    parity), length_m_int, length_km (2 dp), length_km_int, tag_group_0 (the
    group value string, re-attached from the interned g hash).

    Ranks (main.rs:1158-1208): length_desc_rank (0-based), length_desc_rank_perc
    (4 dp), length_asc_rank (= n - desc_rank), length_asc_rank_perc,
    length_m_fraction_total, length_m_fraction_longest. Rank assignment is the
    DISTRIBUTED sort + per-block-offset pass (relational.with_desc_rank) — the
    round-1 driver-side length vector is gone; the only driver-side values are
    the three scalars (n, total, longest) and per-BLOCK summaries."""
    from ..functions.utils import round_half_away
    from ..stages.relational import distinct as _distinct
    from ..stages.relational import with_desc_rank

    n = components_ds.count()
    total = float(components_ds.sum("length_m") or 0.0)
    longest = float(components_ds.max("length_m") or 0.0)

    ranked = with_desc_rank(components_ds, "length_m",
                            out_col="length_desc_rank")

    # g → group-value string: a JOIN against the (small) distinct pair table,
    # not a broadcast dict
    from ray.data.aggregate import Count

    gmap = edges_g.groupby(["g", "name"]).aggregate(Count(alias_name="_c")) \
                  .map_batches(lambda b: pa.table({"g": b["g"],
                                                   "tag_group_0": b["name"]}),
                               batch_format="pyarrow")
    ranked = hash_join(ranked, gmap, ("g",), how="inner", num_partitions=8)

    def props(batch: pa.Table) -> pa.Table:
        length = batch["length_m"].to_numpy(zero_copy_only=False)
        root = batch["component_id"].to_numpy(zero_copy_only=False)
        desc_rank = batch["length_desc_rank"].to_numpy(zero_copy_only=False)
        return pa.table({
            "g": batch["g"],
            "tag_group_0": batch["tag_group_0"],
            "component_id": batch["component_id"],
            "root_nodeid": batch["component_id"],
            "root_nodeid_120": pa.array(root % 120, pa.int64()),
            "num_nodes": batch["num_nodes"],
            "length_m": pa.array(round_half_away(length, 1), pa.float64()),
            "length_m_int": pa.array(np.floor(length + 0.5).astype(np.int64)),
            "length_km": pa.array(round_half_away(length / 1000.0, 2), pa.float64()),
            "length_km_int": pa.array(np.floor(length / 1000.0 + 0.5).astype(np.int64)),
            "length_desc_rank": pa.array(desc_rank.astype(np.int64)),
            "length_desc_rank_perc": pa.array(round_half_away(desc_rank / n, 4)),
            "length_asc_rank": pa.array((n - desc_rank).astype(np.int64)),
            "length_asc_rank_perc": pa.array(round_half_away((n - desc_rank) / n, 4)),
            "length_m_fraction_total": pa.array(round_half_away(length / total, 4)),
            "length_m_fraction_longest": pa.array(round_half_away(length / longest, 4)),
        })

    return ranked.map_batches(props, batch_format="pyarrow")


def write_outputs(result: dict, output_dir: str):
    """Resumable partitioned output layout (north rule): one parquet directory
    per result table + the lineage/manifest files live under the checkpoint
    dir. Re-running with the same dir skips completed tables."""
    import os

    import ray.data  # noqa: F401

    for name in ("components", "labels", "tiles"):
        final = os.path.join(output_dir, name)
        if os.path.exists(os.path.join(final, "_SUCCESS")):
            continue
        tmp = os.path.join(output_dir, f".tmp-{name}")
        os.makedirs(tmp, exist_ok=True)
        result[name].write_parquet(tmp)
        os.makedirs(final, exist_ok=True)
        for f in os.listdir(tmp):
            os.replace(os.path.join(tmp, f), os.path.join(final, f))
        os.rmdir(tmp)
        open(os.path.join(final, "_SUCCESS"), "w").close()
    return output_dir


def lump(pages_ds, *, cell_res: int = 7, num_partitions: int = 32,
         checkpoint_dir: Optional[str] = None, verify_extract: bool = True,
         group_tag: str = "name", broadcast_pillars: Optional[bool] = None):
    """Full lump pipeline. Returns dict of result Datasets:

    - ``components``: (g, name, component_id, length_m, num_nodes) sorted by
      length desc with length_desc_rank (A5/K1)
    - ``labels``: (g, node, component_id)
    - ``tiles``: per-cell (num_components, num_nodes)
    and a ``metrics`` dict (wall seconds per phase — the lineage surface).
    """
    ckpt = CheckpointManager(checkpoint_dir)
    metrics: dict = {}
    t0 = time.monotonic()

    pages = extract_and_verify(pages_ds, verify=verify_extract)
    geo = pages.map_batches(lambda b: geocode_batch(b, cell_res), batch_format="pyarrow")
    # ONE materialization of the narrow geocoded projection feeds BOTH the
    # nodes table and the ways derivation (round 1 recomputed
    # synth+extract+geocode twice — the dominant derive-phase cost); text/html
    # are projected away before anything is pinned in the object store
    geo = geo.select_columns(
        ["url", "warc_ts", "lang", "node_id", "lat", "lon", "cell"]).materialize()
    nodes_ds = geo.select_columns(["node_id", "lat", "lon", "cell"])
    metrics["nodes"] = geo.count()

    ways = derive_ways(geo).materialize()
    metrics["ways"] = ways.count()
    metrics["t_derive_s"] = round(time.monotonic() - t0, 3)

    return _lump_core(ways, nodes_ds, metrics=metrics, t0=t0, ckpt=ckpt,
                      num_partitions=num_partitions, group_tag=group_tag,
                      broadcast_pillars=broadcast_pillars)


def lump_from_ways(ways_ds, nodes_ds, *, cell_res: int = 7,
                   num_partitions: int = 32,
                   checkpoint_dir: Optional[str] = None,
                   group_tag: str = "name",
                   broadcast_pillars: Optional[bool] = None):
    """Lump over EXTERNAL way/node tables — the ``-i FILENAME.osm.pbf``
    entry (sources/pbf.py readers feed this): ``ways_ds`` needs
    (way_id, node_ids list<int64>, <group_tag>, lang); ``nodes_ds`` needs
    (node_id, lat, lon[, cell]) — a missing ``cell`` is derived from the
    positions with the same grid the geocode stage uses, so the tile join
    behaves identically."""
    ckpt = CheckpointManager(checkpoint_dir)
    metrics: dict = {}
    t0 = time.monotonic()

    if "cell" not in nodes_ds.schema().names:
        from ..stages.spatial import assign_tiles

        nodes_ds = assign_tiles(nodes_ds, res=cell_res)
    nodes_ds = nodes_ds.select_columns(
        ["node_id", "lat", "lon", "cell"]).materialize()
    metrics["nodes"] = nodes_ds.count()
    if "node_lats" not in ways_ds.schema().names:
        # external ways (PBF) reference nodes by id only — attach the inline
        # i32 geometry lists the contraction carries (T3 join, then the core
        # runs identically to the pages path)
        ways_ds = attach_way_geometry(ways_ds, nodes_ds,
                                      num_partitions=num_partitions)
    ways = ways_ds.materialize()
    metrics["ways"] = ways.count()
    metrics["t_derive_s"] = round(time.monotonic() - t0, 3)
    return _lump_core(ways, nodes_ds, metrics=metrics, t0=t0, ckpt=ckpt,
                      num_partitions=num_partitions, group_tag=group_tag,
                      broadcast_pillars=broadcast_pillars)


def attach_way_geometry(ways_ds, nodes_ds, *, num_partitions: int = 16):
    """(way_id, node_ids, …) ⋈ positions → + node_lats/node_lons i32 list
    columns (same offsets as node_ids). Explode → hash join → per-partition
    VECTORIZED reassembly (sort by (way_id, seq), boundary run-split, Arrow
    lists from offsets — no per-way Python).

    FAILS LOUDLY when a way references a node id absent from the positions
    table (boundary-clipped extracts): a silently-shortened geometry list
    would desynchronize the flattened-offsets slicing in the contraction and
    corrupt every later way in the block. The reference panics on a missing
    node position too (osm-lump-ways-down/main.rs:1359 unwrap)."""
    from ..stages.relational import cogroup_join

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["node_ids"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat = ids.flatten()
        offs = ids.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        wid = batch["way_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        seq = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1], lens)
        return pa.table({
            "way_id": pa.array(np.repeat(wid, lens), pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "node_id": flat.cast(pa.int64()),
        })

    flat = ways_ds.select_columns(["way_id", "node_ids"]) \
        .map_batches(explode, batch_format="pyarrow")
    pos = nodes_ds.select_columns(["node_id", "lat", "lon"])
    j = cogroup_join(flat, pos, ("node_id",), how="inner",
                     num_partitions=num_partitions)

    def add_part(batch: pa.Table) -> pa.Table:
        w = batch["way_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((w * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
                ).astype(np.int64) % num_partitions
        return batch.append_column("_part", pa.array(part, pa.int64()))

    def per_part(df) -> pa.Table:
        # one task per PARTITION; whole-partition vectorized reassembly
        df = df.sort_values(["way_id", "seq"], kind="mergesort")
        w = df["way_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]]) \
            if len(w) else np.zeros(0, np.int64)
        offs = np.empty(len(starts) + 1, np.int32)
        offs[:-1] = starts
        offs[-1] = len(w)
        off_arr = pa.array(offs, pa.int32())
        return pa.table({
            "way_id": pa.array(w[starts].astype(np.int64), pa.int64()),
            "node_lats": pa.ListArray.from_arrays(
                off_arr, pa.array(df["lat"].to_numpy().astype(np.int32),
                                  pa.int32())),
            "node_lons": pa.ListArray.from_arrays(
                off_arr, pa.array(df["lon"].to_numpy().astype(np.int32),
                                  pa.int32())),
        })

    geom = j.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_part, batch_format="pandas")
    out = cogroup_join(ways_ds, geom, ("way_id",), how="left_outer",
                       num_partitions=num_partitions)

    def check_complete(batch: pa.Table) -> pa.Table:
        ids = batch["node_ids"]
        lats = batch["node_lats"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if isinstance(lats, pa.ChunkedArray):
            lats = lats.combine_chunks()
        n_ids = np.diff(ids.offsets.to_numpy(zero_copy_only=False))
        # a way whose EVERY node is missing gets a null geometry list
        null_geo = lats.is_null().to_numpy(zero_copy_only=False)
        n_geo = np.where(null_geo, 0,
                         np.diff(lats.offsets.to_numpy(zero_copy_only=False)))
        bad = np.flatnonzero(n_geo != n_ids)
        if len(bad):
            wid = batch["way_id"].to_numpy(zero_copy_only=False)
            missing = int((n_ids[bad] - n_geo[bad]).sum())
            raise ValueError(
                f"attach_way_geometry: {len(bad)} way(s) reference "
                f"{missing} node id(s) with no position in the input "
                f"(first way_ids: {wid[bad][:5].tolist()}). The input is "
                f"incomplete (boundary-clipped extract?); the reference "
                f"fails on a missing node position too "
                f"(osm-lump-ways-down/main.rs:1359).")
        return batch

    return out.map_batches(check_complete, batch_format="pyarrow")


def _lump_core(ways, nodes_ds, *, metrics: dict, t0: float, ckpt,
               num_partitions: int, group_tag: str,
               broadcast_pillars: Optional[bool]):
    """Post-derive lump body: contraction → CC → lengths → tiles. ``ways``
    and ``nodes_ds`` arrive MATERIALIZED with counts already in metrics."""
    import ray

    t1 = time.monotonic()
    # Pillar-set delivery auto-selects on size (r2 verdict #3): below the
    # threshold the sorted array is broadcast once via ray.put (fast path);
    # above it — ~5% of nodes at planet scale, too big for any single heap —
    # the join-based contraction keeps the pillar set distributed.
    if broadcast_pillars is None:
        if metrics["nodes"] <= _PILLAR_BROADCAST_MAX:
            # pillars ⊆ nodes, so the node count (already computed) proves the
            # broadcast fits — no extra pillar-count pass at small scale
            pillars_ds = None
            n_pillars = None
            use_broadcast = True
        else:
            from ..stages.graph import pillar_nodes_ds

            pillars_ds = pillar_nodes_ds(ways).materialize()
            n_pillars = pillars_ds.count()
            use_broadcast = n_pillars <= _PILLAR_BROADCAST_MAX
    else:
        pillars_ds = None
        n_pillars = None
        use_broadcast = broadcast_pillars
    # deduped carry list: group_tag == "lang" must not produce a
    # duplicate column (ADVICE r4 — `-g lang` over a PBF input)
    _carry = [group_tag] + (["lang"] if group_tag != "lang" else [])
    if use_broadcast:
        if pillars_ds is not None:
            parts = [b["node_id"].to_numpy() for b in
                     pillars_ds.iter_batches(batch_format="pyarrow")]
            pillars = (np.sort(np.concatenate(parts)) if parts
                       else np.array([], dtype=np.int64))
        else:
            pillars = pillar_node_array(ways)
        pillar_ref = ray.put(pillars)
        edges = contract_ways(ways, pillar_ref, carry_cols=_carry)
        metrics["pillars"] = int(len(pillars))
    else:
        from ..stages.graph import contract_ways_joined

        pillar_ref = None  # joined path: no broadcast array exists
        edges = contract_ways_joined(ways, carry_cols=_carry,
                                     num_partitions=num_partitions,
                                     pillars_ds=pillars_ds)
        metrics["pillars"] = int(n_pillars) if n_pillars is not None else -1
    edges_full = intern_group_ids(edges, group_tag)  # lazy — full columns (API)
    # materialize ONLY the headline columns: way_id and inter_nids are dead
    # weight for CC + lengths (the chains already carry the interior geometry)
    # — at 10M pages they are ~1/3 of the edge table's bytes (r2 scaling
    # verdict). res["edges"] stays the full lazy view (one cheap map re-run
    # over the materialized ways when the facade needs it).
    edges_g = edges_full.select_columns(
        ["u", "v", "g", "chain_lats", "chain_lons"] + _carry) \
        .materialize()
    metrics["edges"] = edges_g.count()
    metrics["t_contract_s"] = round(time.monotonic() - t1, 3)

    t2 = time.monotonic()
    labels = connected_components(
        edges_g, "u", "v", "g", num_partitions=num_partitions, checkpoint=ckpt,
    ).materialize()
    metrics["t_cc_s"] = round(time.monotonic() - t2, 3)

    t3 = time.monotonic()
    # staged execution (snapshot between shuffles): Ray 2.49's executor handles
    # one shuffle at a time far better than a 5-shuffle mega-DAG — measured 2-3×
    # on this pipeline — and each stage's blocks stay in the object store
    from ..stages.relational import snapshot

    # lengths from the CARRIED chain geometry (segment_lengths_carried): one
    # stateless map, no position joins; per-edge pre-sums keep the labels join
    # at edge granularity instead of segment granularity
    seg = snapshot(segment_lengths_carried(edges_g))
    # per-edge-anchor → component: join edge sums to labels on (g, anchor=node)
    lab_for_join = labels.rename_columns(["g", "anchor", "component_id"])
    seg = snapshot(hash_join(seg, lab_for_join, ("g", "anchor"), how="inner",
                             num_partitions=num_partitions))

    # pre-aggregate per batch (combiner) before the wide groupby: the shuffle
    # then moves one row per (g, component) per batch instead of per segment
    def partial_len(batch: pa.Table) -> pa.Table:
        from ..stages.graph import _unique_pairs

        g = batch["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["component_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = batch["length_m"].to_numpy(zero_copy_only=False)
        uniq, inv = _unique_pairs(g, c)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, m)
        return pa.table({"g": pa.array(uniq[:, 0], pa.int64()),
                         "component_id": pa.array(uniq[:, 1], pa.int64()),
                         "length_m": pa.array(sums, pa.float64())})

    from ..stages.relational import bucket_agg

    comp_len = snapshot(bucket_agg(
        seg.map_batches(partial_len, batch_format="pyarrow"),
        ["g", "component_id"], {"length_m": ("length_m", "sum")},
        num_partitions=num_partitions))
    comp_nodes = snapshot(bucket_agg(
        labels, ["g", "component_id"], {"num_nodes": (None, "count")},
        num_partitions=num_partitions))
    components = hash_join(comp_len, comp_nodes, ("g", "component_id"),
                           how="inner", num_partitions=max(2, num_partitions // 4))
    components = components.sort("length_m", descending=True).materialize()
    metrics["components"] = components.count()
    metrics["t_lengths_s"] = round(time.monotonic() - t3, 3)

    t4 = time.monotonic()
    tiles = tile_stats(labels, nodes_ds, num_partitions=num_partitions,
                       pillar_ref=pillar_ref).materialize()
    metrics["tiles"] = tiles.count()
    metrics["t_tiles_s"] = round(time.monotonic() - t4, 3)
    metrics["t_total_s"] = round(time.monotonic() - t0, 3)
    ckpt.record(step="lump/metrics", **{k: v for k, v in metrics.items()})

    return {"components": components, "labels": labels, "tiles": tiles,
            "nodes": nodes_ds, "edges": edges_full, "metrics": metrics}
