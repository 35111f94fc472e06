"""CLI entry points mirroring the reference's two binaries
(bin/osm-lump-ways/cli_args.rs:21-254 and bin/osm-lump-ways-down/cli_args.rs):

    python -m osm_lump_ways_ray lump -i pages.parquet -o groups.geojson \
        -f "name" -g name --min-length-m 100 --only-longest-n 50
    python -m osm_lump_ways_ray down -i edges.parquet --nodes nodes.parquet \
        --tag-groups --out-dir /tmp/down_out --openmetrics /tmp/loops.om

``lump`` runs the flagship pipeline over a Common-Crawl-style pages Parquet
table (url, warc_ts, html, text, lang — BASELINE.json input_hint shape; or
``--synth N`` for the deterministic seeded table) through the
``Pipeline`` facade; ``down`` runs the composed waterways pipeline
(SCC → loops → contraction → flow → ends → paths → tag groups sharing
intermediates, -down/main.rs:146-1269) over a directed-edge Parquet table.

The CLI owns its Ray session when none exists yet (init + shutdown); the
library itself never initializes Ray.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session(num_cpus: int | None):
    """Init Ray iff nobody else has (the CLI then owns the session and shuts
    it down; under an outer session — e.g. the pytest fixture — it must not)."""
    import ray

    owned = not ray.is_initialized()
    if owned:
        kwargs = dict(address="local", include_dashboard=False,
                      logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray, owned


_DATA_EPOCH_CACHE: dict = {}


def _input_data_epoch(args) -> int:
    """Data-age timestamp for append-mode stats rows: max way Info
    timestamp for PBF inputs (the reference keys its stats CSVs by the
    input's latest timestamp — ends_csv.rs:85-99, main.rs:253); parquet
    edge tables carry no timestamps → 0. One decode pass, cached per path."""
    if not args.input.endswith(".pbf"):
        return 0
    if args.input not in _DATA_EPOCH_CACHE:
        from .sources.pbf import read_pbf_ways

        _DATA_EPOCH_CACHE[args.input] = int(
            read_pbf_ways(args.input).max("ts") or 0)
    return _DATA_EPOCH_CACHE[args.input]


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--num-partitions", type=int, default=32)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="Ray session size (default: all cores)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="resumable per-round state root (state/checkpoint.py)")


def cmd_lump(args) -> int:
    ray, owned = _ray_session(args.num_cpus)
    from .pipelines.waterways_down import Output, Pipeline
    from .sources.pages import synth_pages_dataset

    if args.synth:
        pages = synth_pages_dataset(args.synth, seed=args.seed)
    elif args.input.endswith(".pbf"):
        # the reference's native input (`-i FILENAME.osm.pbf`,
        # cli_args.rs:22-24): sources/pbf.py readers; the group tag and the
        # lang analog come straight from the ways' OSM tags
        import pyarrow as pa

        from .sources.pbf import read_pbf_nodes, read_pbf_ways, way_tag_values

        gb = args.tag_group_by

        def shape(batch: pa.Table) -> pa.Table:
            # vectorized tag lookups (no per-way dict build); the lang
            # column is skipped when it IS the group-by key — a duplicate
            # dict key would silently replace the group values
            cols = {
                "way_id": batch["way_id"],
                "node_ids": batch["node_ids"],
                gb: pa.array(way_tag_values(batch, gb).tolist(),
                             pa.string()),
                "ts": batch["ts"],
            }
            if gb != "lang":
                lang = way_tag_values(batch, "lang")
                lang[lang == None] = ""  # noqa: E711
                cols["lang"] = pa.array(lang.tolist(), pa.string())
            return pa.table(cols)

        ways = read_pbf_ways(args.input).map_batches(shape,
                                                     batch_format="pyarrow")
        pages = (ways, read_pbf_nodes(args.input))
    else:
        import ray.data

        pages = ray.data.read_parquet(args.input)

    if (args.split_into_single_paths
            and args.split_into_single_paths_by == "longest-path"):
        # declared-but-unimplemented in the reference: the lump binary
        # asserts as-crow-flies (bin/osm-lump-ways/main.rs:761-765), the
        # -down binary never reads the flag (cli_args.rs:147)
        print("error: --split-into-single-paths-by longest-path is declared "
              "but unimplemented in the reference (main.rs:761-765 asserts "
              "as-crow-flies); use as-crow-flies", file=sys.stderr)
        return 2
    geometry = "linestring" if args.save_as_linestrings else "multilinestring"
    outputs = []
    for path in args.output or ():
        if args.split_files_by_group and "%s" not in path:
            print(f"error: --split-files-by-group needs %s in {path!r}",
                  file=sys.stderr)
            return 2
        if (not args.overwrite and "%s" not in path
                and os.path.exists(path)):
            print(f"error: {path!r} exists; pass --overwrite "
                  "(cli_args.rs:43-46)", file=sys.stderr)
            return 2
        outputs.append(Output(path=path, geometry=geometry,
                              props=(args.tag_group_by, "component_id",
                                     "length_m", "num_nodes"),
                              split_by=(args.tag_group_by
                                        if args.split_files_by_group else None)))
    if args.min_upstream_m is not None:
        # parity no-op: the reference lump binary declares --min-upstream-m
        # but never reads it (grep of bin/osm-lump-ways/main.rs)
        print("warning: --min-upstream-m is declared-but-unused in the "
              "reference lump binary; ignored here too", file=sys.stderr)

    if args.incl_wayids:
        outputs = [Output(path=o.path, geometry=o.geometry,
                          props=tuple(o.props) + ("all_wayids",),
                          split_by=o.split_by) for o in outputs]
    if args.incl_dist_to_longer:
        outputs = [Output(path=o.path, geometry=o.geometry,
                          props=tuple(o.props) + ("dist_to_longer_m",),
                          split_by=o.split_by) for o in outputs]
    pipe = Pipeline(filter=args.tag_filter, group_by=args.tag_group_by,
                    min_length_m=args.min_length_m,
                    min_length=args.min_length,
                    max_length_m=args.max_length_m,
                    only_longest_n=args.only_longest_n,
                    only_these_way_groups=tuple(args.only_these_way_groups
                                                or ()),
                    only_these_way_groups_nodeid=tuple(
                        args.only_these_way_groups_nodeid or ()),
                    only_these_way_groups_divmod=args.only_these_way_groups_divmod,
                    incl_wayids=args.incl_wayids,
                    incl_unset_group=args.incl_unset_group,
                    only_longest_n_per_group=args.only_longest_n_per_group,
                    split_into_single_paths=args.split_into_single_paths,
                    split_into_single_paths_by=args.split_into_single_paths_by,
                    only_longest_n_splitted_paths=(
                        args.only_longest_n_splitted_paths),
                    max_sinuosity=args.max_sinuosity,
                    incl_dist_to_longer=args.incl_dist_to_longer,
                    min_dist_to_longer_m=args.min_dist_to_longer_m,
                    csv_stats_file=args.csv_stats_file,
                    openmetrics=args.openmetrics,
                    output_frames=args.output_frames,
                    frames_group_min_length_m=args.frames_group_min_length_m,
                    betweenness_output=args.betweenness_output,
                    betweenness_min_value=args.betweenness_min_value,
                    betweenness_min_fraction=args.betweenness_min_fraction,
                    betweenness_max_nodes=args.betweenness_max_nodes,
                    outputs=tuple(outputs),
                    num_partitions=args.num_partitions,
                    checkpoint_dir=args.checkpoint_dir)
    res = pipe.run(pages)
    n = res["components"].count()
    summary = {"components": n, "metrics": res["metrics"],
               "written": res["written"]}
    for k in ("frames_written", "betweenness_written", "stats_written"):
        if k in res:
            summary[k] = res[k]
    print(json.dumps(summary))
    if owned:
        ray.shutdown()
    return 0


def cmd_down(args) -> int:
    import pyarrow as pa

    ray, owned = _ray_session(args.num_cpus)
    import numpy as np
    import ray.data

    from .pipelines.waterways_down import waterways_down
    from .sources.csvout import write_ends_csv, write_openmetrics
    from .stages.relational import cogroup_join

    file_outputs = [args.loops, args.ends, args.upstreams, args.grouped_ends,
                    args.grouped_waterways, args.longest_source_mouth]
    if not args.overwrite:
        for p in file_outputs:
            if p and os.path.exists(p):
                print(f"error: {p!r} exists; pass --overwrite "
                      "(-down cli_args.rs:52-54)", file=sys.stderr)
                return 2
    if args.loops_incl_nids and args.loops_no_incl_nids:
        print("error: --loops-incl-nids conflicts with --loops-no-incl-nids",
              file=sys.stderr)
        return 2
    follows_tag = bool(args.from_upstream or args.flow_follows_tag)
    if follows_tag and args.flow_split_equally:
        print("error: --flow-follows-tag/--from-upstream conflicts with "
              "--flow-split-equally (-down cli_args.rs:277,282)",
              file=sys.stderr)
        return 2

    if args.input.endswith(".pbf"):
        # the reference's native input: ways explode into directed
        # consecutive-pair edges (way order = flow direction), lengths by
        # haversine, tagid interned from --flow-follows-tag's key (or name)
        from .sources.pbf import pbf_directed_edges

        edges, nodes = pbf_directed_edges(
            args.input, tag_key=args.flow_follows_tag or "name",
            num_partitions=args.num_partitions)
    else:
        edges = ray.data.read_parquet(args.input)
        if args.flow_follows_tag and "tagid" not in edges.schema().names:
            print("error: --flow-follows-tag needs a tagid column on the "
                  "edges table (the tag is pre-extracted in this data model)",
                  file=sys.stderr)
            return 2
        nodes = ray.data.read_parquet(args.nodes) if args.nodes else None

    summary = {}
    if (args.input.endswith(".pbf") and args.relation_tags_overwrite
            and not args.relations):
        # the reference reads relation memberships from the SAME pbf
        # (relation_tags.rs); derive (way_id, rel_id, rel_tag, role) rows
        # from the file's Relation messages (way members only) using the
        # flow tag key as the relation tag analog
        from .sources.pbf import read_pbf_relations

        tagk = args.flow_follows_tag or "name"

        def members(batch: pa.Table) -> pa.Table:
            # flat member arrays + one vectorized tag lookup (no per-relation
            # dict build — the way-assembly idiom, VERDICT r4 #4)
            import numpy as np

            from .sources.pbf import way_tag_values

            mids_l = batch["member_ids"]
            if isinstance(mids_l, pa.ChunkedArray):
                mids_l = mids_l.combine_chunks()
            lens = np.diff(mids_l.offsets.to_numpy(zero_copy_only=False))
            rel_of = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
            tag = way_tag_values(batch, tagk)  # per-relation; None = absent
            types_l = batch["member_types"]
            if isinstance(types_l, pa.ChunkedArray):
                types_l = types_l.combine_chunks()
            types = types_l.flatten().to_numpy(zero_copy_only=False)
            has_tag = np.array([t is not None for t in tag], dtype=bool)
            keep = (types == 1) & has_tag[rel_of]
            rid = batch["rel_id"].to_numpy(zero_copy_only=False)
            roles_l = batch["roles"]
            if isinstance(roles_l, pa.ChunkedArray):
                roles_l = roles_l.combine_chunks()
            ki = pa.array(np.flatnonzero(keep), pa.int64())
            import pyarrow.compute as pc

            return pa.table({
                "way_id": pc.take(mids_l.flatten().cast(pa.int64()), ki),
                "rel_id": pa.array(rid[rel_of[keep]], pa.int64()),
                "rel_tag": pa.array(tag[rel_of[keep]].tolist(), pa.string()),
                "role": pc.take(roles_l.flatten(), ki)})

        pbf_members = read_pbf_relations(args.input) \
            .map_batches(members, batch_format="pyarrow")
        # intern the string tag to the edges' tagid space (same hash)
        from .stages.graph import intern_group_ids

        pbf_members = intern_group_ids(pbf_members, "rel_tag",
                                       out_col="rel_tagid")
        pbf_members = pbf_members.map_batches(
            lambda b: pa.table({"way_id": b["way_id"],
                                "rel_id": b["rel_id"],
                                "rel_tag": b["rel_tagid"],
                                "role": b["role"]}),
            batch_format="pyarrow")
        args.relations = "__pbf__"
        _pbf_members = pbf_members
    else:
        _pbf_members = None
    if args.relations and args.relation_tags_overwrite:
        # J4 over a membership parquet (way_id, rel_id, rel_tag[, role]):
        # per-way winning relation tag overwrites the edge's tagid analog
        # (-down cli_args.rs:315-321; stages/relations.py). Role filter first.
        from .stages.relations import relation_tags_overwrite

        members = (_pbf_members if _pbf_members is not None
                   else ray.data.read_parquet(args.relations))
        if args.relation_tags_role:
            roles = set(args.relation_tags_role)
            members = members.map_batches(
                lambda b: b.filter(pa.array(
                    [r in roles for r in b["role"].to_pylist()])),
                batch_format="pyarrow")
        if "way_id" not in edges.schema().names:
            print("error: --relation-tags-overwrite needs a way_id column "
                  "on the edges table", file=sys.stderr)
            return 2
        wins = relation_tags_overwrite(
            members, num_partitions=args.num_partitions) \
            .select_columns(["way_id", "rel_tag"])
        edges = cogroup_join(edges, wins, ("way_id",), how="left_outer",
                             num_partitions=args.num_partitions)

        def apply_tag(batch: pa.Table) -> pa.Table:
            rt = batch["rel_tag"]
            cols = {c: batch[c] for c in batch.column_names
                    if c != "rel_tag"}
            if "tagid" in cols:
                import pyarrow.compute as pc

                cols["tagid"] = pc.if_else(pc.is_valid(rt),
                                           rt.cast(pa.int64()),
                                           batch["tagid"])
            else:
                cols["tagid"] = rt.cast(pa.int64())
            return pa.table(cols)

        edges = edges.map_batches(apply_tag, batch_format="pyarrow")
        summary["relation_tags_overwrite"] = True

    max_dist = (args.grouped_ends_max_distance_m
                if args.grouped_ends_max_distance_m is not None
                else args.max_dist_m)
    with_tg = args.tag_groups or bool(args.grouped_waterways)
    res = waterways_down(edges, nodes, split_equally=not follows_tag,
                         max_dist_m=max_dist,
                         with_tag_groups=with_tg,
                         num_partitions=args.num_partitions,
                         checkpoint_dir=args.checkpoint_dir)
    summary["metrics"] = res["metrics"]

    end_tag_vals = {}
    if args.ends_membership or args.ends_tag:
        import pyarrow as pa

        from .stages.relational import cogroup_join

        tag_cols = [c for c in edges.schema().names
                    if c not in ("src", "dst", "length_m")]

        def way_nodes(batch: pa.Table) -> pa.Table:
            # each directed edge "passes through" both its endpoints
            # (-down/main.rs:975-996 ORs way flags over ways touching the end)
            cols = {"node": pa.concat_arrays([
                batch["src"].combine_chunks().cast(pa.int64()),
                batch["dst"].combine_chunks().cast(pa.int64())])}
            for c in tag_cols:
                cc = batch[c].combine_chunks()
                cols[c] = pa.concat_arrays([cc, cc])
            return pa.table(cols)

        wn = edges.map_batches(way_nodes, batch_format="pyarrow")
        ends_nodes = res["ends"].map_batches(
            lambda b: pa.table({"node": b["end_nid"]}),
            batch_format="pyarrow")
        if args.ends_membership:
            from .functions.tagfilter import parse_tag_filter
            from .stages.relations import ends_membership

            filters = [(s, parse_tag_filter(s)) for s in args.ends_membership]
            flags = ends_membership(ends_nodes, wn, filters,
                                    num_partitions=args.num_partitions) \
                .rename_columns(["end_nid"]
                                + [f"is_in:{s}" for s in args.ends_membership]
                                + ["is_in_count"])
            res["ends"] = cogroup_join(res["ends"], flags, ("end_nid",),
                                       how="left_outer",
                                       num_partitions=args.num_partitions)
            summary["ends_membership"] = args.ends_membership
        if args.ends_tag:
            for key in args.ends_tag:
                vals = cogroup_join(
                    wn.select_columns(["node", key]), ends_nodes, ("node",),
                    how="inner", num_partitions=args.num_partitions) \
                    .groupby("node").map_groups(
                        lambda t, k=key: pa.table({
                            "node": pa.array([t["node"][0].as_py()],
                                             pa.int64()),
                            "val": pa.array([";".join(sorted(
                                set(v for v in t[k].to_pylist()
                                    if v is not None)))], pa.string())}),
                        batch_format="pyarrow")
                for r in vals.take_all():  # one row per END (CSV writer side)
                    end_tag_vals.setdefault(int(r["node"]), {})[key] = r["val"]
            summary["ends_tag"] = args.ends_tag
    # ---------------- per-product GeoJSON(Seq) files (-down cli_args.rs)
    from .sources.geojson import write_features_single

    if args.loops:
        if nodes is None:
            print("error: --loops needs --nodes (positions)", file=sys.stderr)
            return 2
        from .stages.waterways import loop_geometries

        incl = not args.loops_no_incl_nids
        geo = loop_geometries(edges, nodes, incl_nids=incl,
                              num_partitions=args.num_partitions)
        props = ["root_nid", "num_nodes", "length_m"] + (["nids"] if incl
                                                         else [])
        summary["loops_file"] = write_features_single(
            geo, args.loops, props_cols=props, geometry="multilinestring")
    if args.loops_csv_stats_file or args.loops_openmetrics:
        if "loops" not in res:
            print("error: --loops-csv-stats-file/--loops-openmetrics need "
                  "--nodes", file=sys.stderr)
            return 2
        import datetime

        from .sources.csvout import append_stats_csv
        from .stages.relational import bucket_agg

        per_area = bucket_agg(
            res["loops"], ["area"],
            {"loops_count": (None, "count"),
             "loops_length_m": ("length_m", "sum")},
            num_partitions=4, combine=True).take_all()
        total = [("planet", "loops_count",
                  sum(r["loops_count"] for r in per_area)),
                 ("planet", "loops_length_m",
                  sum(r["loops_length_m"] for r in per_area))]
        rows = total + [(r["area"], m, r[m]) for r in per_area
                        for m in ("loops_count", "loops_length_m")]
        epoch = _input_data_epoch(args)
        iso = datetime.datetime.fromtimestamp(
            epoch, datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        if args.loops_csv_stats_file:
            append_stats_csv(
                args.loops_csv_stats_file,
                ["timestamp", "iso_timestamp", "area", "metric", "value"],
                [(epoch, iso, a, m, v) for a, m, v in rows])
            summary["loops_csv_stats_file"] = args.loops_csv_stats_file
        if args.loops_openmetrics:
            write_openmetrics(
                args.loops_openmetrics, "waterways_loops",
                [({"area": a, "metric": m}, v) for a, m, v in rows],
                help_text="per-area loop statistics")
            summary["loops_openmetrics"] = args.loops_openmetrics
    if args.ends:
        if nodes is None:
            print("error: --ends needs --nodes (positions)", file=sys.stderr)
            return 2
        eprops = [c for c in
                  (["end_nid", "end_upstream_m"]
                   + [f"is_in:{s}" for s in (args.ends_membership or ())]
                   + (["is_in_count"] if args.ends_membership else []))]
        sel_ends = res["ends"]
        emin = max(float(args.ends_upstreams_min_upstream_m or 0.0),
                   float(args.min_upstream_m or 0.0))
        if emin > 0.0:
            sel_ends = sel_ends.map_batches(
                lambda b: b.filter(pa.array(
                    b["end_upstream_m"].to_numpy(zero_copy_only=False)
                    >= emin)), batch_format="pyarrow")
        if args.ends_upstreams:
            # --ends-upstreams (declared-but-unused in the reference,
            # -down cli_args.rs:296-306; implemented here): each end's
            # feature is the MultiLineString of its COMPLETE upstream
            # network — every DAG edge whose downstream node drains to
            # this end per the biggest-end assignment (G14 kind-0 rows).
            # --ends-upstreams-max-nodes caps nodes per end
            # deterministically ((src,dst)-sorted prefix).
            asg = res["assignments_paths"].map_batches(
                lambda b: (lambda t: pa.table(
                    {"dst": t["node"], "end_nid": t["end_nid"]}))(
                    b.filter(pa.array(
                        b["kind"].to_numpy(zero_copy_only=False) == 0))),
                batch_format="pyarrow")
            ue = cogroup_join(res["flow_edges"]
                              .select_columns(["src", "dst"]),
                              asg, ("dst",), how="inner",
                              num_partitions=args.num_partitions)
            ue = cogroup_join(ue, sel_ends, ("end_nid",), how="inner",
                              num_partitions=args.num_partitions)
            pos_s = nodes.select_columns(["node_id", "lat", "lon"]) \
                .rename_columns(["src", "lat_s", "lon_s"])
            pos_d = nodes.select_columns(["node_id", "lat", "lon"]) \
                .rename_columns(["dst", "lat_d", "lon_d"])
            ue = cogroup_join(ue, pos_s, ("src",), how="inner",
                              num_partitions=args.num_partitions)
            ue = cogroup_join(ue, pos_d, ("dst",), how="inner",
                              num_partitions=args.num_partitions)
            max_nodes = args.ends_upstreams_max_nodes

            def per_end(df):
                import pandas as pd

                df = df.sort_values(["src", "dst"])
                if max_nodes is not None:
                    seen, keep_n = set(), 0
                    for s, d in zip(df["src"], df["dst"]):
                        seen.update((int(s), int(d)))
                        if len(seen) > max_nodes:
                            break
                        keep_n += 1
                    df = df.iloc[:keep_n]
                if not len(df):
                    return pd.DataFrame(columns=["end_nid", "end_upstream_m",
                                                 "n_edges", "lats", "lons"])
                return pd.DataFrame({
                    "end_nid": [int(df["end_nid"].iloc[0])],
                    "end_upstream_m": [float(df["end_upstream_m"].iloc[0])],
                    "n_edges": [len(df)],
                    "lats": [[[int(a), int(b)] for a, b in
                              zip(df["lat_s"], df["lat_d"])]],
                    "lons": [[[int(a), int(b)] for a, b in
                              zip(df["lon_s"], df["lon_d"])]],
                })

            feats = ue.groupby("end_nid").map_groups(
                per_end, batch_format="pandas") \
                .sort("end_upstream_m", descending=True)
            summary["ends_file"] = write_features_single(
                feats, args.ends,
                props_cols=["end_nid", "end_upstream_m", "n_edges"],
                geometry="multilinestring")
        else:
            pos = nodes.select_columns(["node_id", "lat", "lon"]) \
                .rename_columns(["end_nid", "lat", "lon"])
            epts = cogroup_join(sel_ends, pos, ("end_nid",), how="inner",
                                num_partitions=args.num_partitions) \
                .sort("end_upstream_m", descending=True)
            summary["ends_file"] = write_features_single(
                epts, args.ends, props_cols=eprops, geometry="point")
    if args.upstreams:
        if nodes is None:
            print("error: --upstreams needs --nodes (positions)",
                  file=sys.stderr)
            return 2
        from .stages.waterways import upstream_segments

        mult = tuple(int(m) for m in
                     (args.upstreams_from_upstream_multiple or ()))
        seg = upstream_segments(
            res["flow_edges"], nodes,
            min_upstream_m=args.upstreams_min_upstream_m or 0.0,
            round_multiples=mult, num_partitions=args.num_partitions)
        if args.upstream_output_ends_full:
            # add the draining end per segment: biggest-end assignment of
            # the segment's downstream node (kind-0 rows)
            asg = res["assignments_paths"].map_batches(
                lambda b: (lambda t: pa.table(
                    {"b": t["node"], "end_nid": t["end_nid"]}))(
                    b.filter(pa.array(
                        b["kind"].to_numpy(zero_copy_only=False) == 0))),
                batch_format="pyarrow")
            seg = cogroup_join(seg, asg, ("b",), how="left_outer",
                               num_partitions=args.num_partitions)
        pos_a = nodes.select_columns(["node_id", "lat", "lon"]) \
            .rename_columns(["a", "lat_a", "lon_a"])
        pos_b = nodes.select_columns(["node_id", "lat", "lon"]) \
            .rename_columns(["b", "lat_b", "lon_b"])
        seg = cogroup_join(seg, pos_a, ("a",), how="inner",
                           num_partitions=args.num_partitions)
        seg = cogroup_join(seg, pos_b, ("b",), how="inner",
                           num_partitions=args.num_partitions)

        def seg_lines(batch: pa.Table) -> pa.Table:
            la = batch["lat_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            lb = batch["lat_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            oa = batch["lon_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            ob = batch["lon_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {c: batch[c] for c in batch.column_names
                    if c not in ("lat_a", "lat_b", "lon_a", "lon_b")}
            cols["lats"] = pa.array(np.stack([la, lb], axis=1).tolist(),
                                    pa.list_(pa.int64()))
            cols["lons"] = pa.array(np.stack([oa, ob], axis=1).tolist(),
                                    pa.list_(pa.int64()))
            return pa.table(cols)

        seg = seg.map_batches(seg_lines, batch_format="pyarrow")
        sprops = ["from_upstream_m", "to_upstream_m"] \
            + [f"from_upstream_m_{m}" for m in mult] \
            + (["end_nid"] if args.upstream_output_ends_full else [])
        summary["upstreams_file"] = write_features_single(
            seg, args.upstreams, props_cols=sprops, geometry="linestring")
    if args.grouped_ends:
        if nodes is None:
            print("error: --grouped-ends needs --nodes (positions)",
                  file=sys.stderr)
            return 2
        gp = res["assignments_paths"].map_batches(
            lambda b: b.filter(pa.array(
                b["kind"].to_numpy(zero_copy_only=False) == 1)),
            batch_format="pyarrow")
        if args.grouped_ends_max_upstream_delta is not None:
            delta = float(args.grouped_ends_max_upstream_delta)

            def within_delta(batch: pa.Table) -> pa.Table:
                f = batch["from_upstream_m"].to_numpy(zero_copy_only=False)
                t = batch["to_upstream_m"].to_numpy(zero_copy_only=False)
                ok = np.abs(t - f) <= delta
                ok |= np.isnan(f) | np.isnan(t)
                return batch.filter(pa.array(ok))

            gp = gp.map_batches(within_delta, batch_format="pyarrow")
        pos = nodes.select_columns(["node_id", "lat", "lon"]) \
            .rename_columns(["end_nid", "lat", "lon"])
        gp = cogroup_join(gp, pos, ("end_nid",), how="inner",
                          num_partitions=args.num_partitions)
        summary["grouped_ends_file"] = write_features_single(
            gp, args.grouped_ends,
            props_cols=["end_nid", "n_nodes", "dist_m", "from_upstream_m",
                        "to_upstream_m", "avg_upstream_m"],
            geometry="point")
    if args.grouped_waterways:
        if "tag_groups" not in res or res["tag_groups"] is None:
            print("error: --grouped-waterways needs a tagid column on the "
                  "edges table", file=sys.stderr)
            return 2
        tg = res["tag_groups"]
        tgp = [c for c in tg.schema().names]
        summary["grouped_waterways_file"] = write_features_single(
            tg, args.grouped_waterways, props_cols=tgp, geometry="none")
    if args.longest_source_mouth:
        if nodes is None:
            print("error: --longest-source-mouth needs --nodes (positions)",
                  file=sys.stderr)
            return 2
        from .stages.waterways import longest_source_mouth

        lsm = longest_source_mouth(
            res["dag_edges"],
            top_n=args.longest_source_mouth_longest_n,
            num_partitions=args.num_partitions)
        if args.longest_source_mouth_min_length_m:
            lmin = float(args.longest_source_mouth_min_length_m)
            lsm = lsm.map_batches(
                lambda b: b.filter(pa.array(
                    b["river_system_length_m"].to_numpy(zero_copy_only=False)
                    >= lmin)), batch_format="pyarrow")
        # name analog: the max non-null tagid over the mouth's in-edges
        # (our edges carry integer tag ids, not strings); unnamed mouths get
        # --longest-source-mouth-unnamed-string
        if "tagid" in edges.schema().names:
            from .stages.relational import bucket_agg

            mt = bucket_agg(
                edges.map_batches(
                    lambda b: pa.table({"mouth_nid": b["dst"],
                                        "tagid": b["tagid"]}),
                    batch_format="pyarrow"),
                ["mouth_nid"], {"name_tag": ("tagid", "max")},
                num_partitions=args.num_partitions, combine=True)
            lsm = cogroup_join(lsm, mt, ("mouth_nid",), how="left_outer",
                               num_partitions=args.num_partitions)
        else:
            lsm = lsm.map_batches(
                lambda b: b.append_column(
                    "name_tag", pa.array([None] * len(b), pa.int64())),
                batch_format="pyarrow")
        unnamed = args.longest_source_mouth_unnamed_string

        def with_name(batch: pa.Table) -> pa.Table:
            nt = batch["name_tag"].to_pylist()
            names = [f"t{int(v)}" if v is not None else unnamed for v in nt]
            cols = {c: batch[c] for c in batch.column_names
                    if c != "name_tag"}
            cols["name"] = pa.array(names, pa.string())
            if args.longest_source_mouth_only_named:
                keep = pa.array([v is not None for v in nt])
                return pa.table(cols).filter(keep)
            return pa.table(cols)

        lsm = lsm.map_batches(with_name, batch_format="pyarrow")
        lsm_props = ["mouth_nid", "source_nid", "river_system_length_m",
                     "path_nodes", "name"]
        if args.incl_wayids:
            # member way ids of each mouth's river system (weak component
            # of the DAG) — -down main.rs:1256 passes incl_wayids to the
            # LSM writer; needs a way_id column on the input edges
            if "way_id" not in edges.schema().names:
                print("error: --incl-wayids needs a way_id column on the "
                      "edges table", file=sys.stderr)
                return 2
            from .stages.graph import connected_components

            labels = connected_components(res["dag_edges"], "src", "dst",
                                           num_partitions=args.num_partitions)
            lab_src = labels.select_columns(["node", "component_id"]) \
                .rename_columns(["src", "component_id"])
            we = cogroup_join(edges.select_columns(["src", "way_id"]),
                              lab_src, ("src",), how="inner",
                              num_partitions=args.num_partitions)

            def per_comp_ways(t: pa.Table) -> pa.Table:
                w = sorted(set(t["way_id"].to_numpy(zero_copy_only=False)
                               .astype(np.int64).tolist()))
                return pa.table({
                    "component_id": pa.array([t["component_id"][0].as_py()],
                                             pa.int64()),
                    "all_wayids": pa.array([[f"w{x}" for x in w]],
                                           pa.list_(pa.string())),
                })

            cw = we.groupby("component_id").map_groups(
                per_comp_ways, batch_format="pyarrow")
            lab_mouth = labels.select_columns(["node", "component_id"]) \
                .rename_columns(["mouth_nid", "component_id"])
            lsm = cogroup_join(lsm, lab_mouth, ("mouth_nid",), how="inner",
                               num_partitions=args.num_partitions)
            lsm = cogroup_join(lsm, cw, ("component_id",), how="left_outer",
                               num_partitions=args.num_partitions)
            lsm_props.append("all_wayids")
        pos = nodes.select_columns(["node_id", "lat", "lon"]) \
            .rename_columns(["mouth_nid", "lat", "lon"])
        lsm = cogroup_join(lsm, pos, ("mouth_nid",), how="inner",
                           num_partitions=args.num_partitions)
        summary["longest_source_mouth_file"] = write_features_single(
            lsm, args.longest_source_mouth,
            props_cols=lsm_props,
            geometry="point")

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        for name in ("loops", "dag_edges", "flow_edges", "ends",
                     "assignments_paths", "tag_groups"):
            if name in res and res[name] is not None:
                res[name].write_parquet(os.path.join(args.out_dir, name))
                summary[name] = "written"
    if args.openmetrics:
        if "loops" not in res:
            print("error: --openmetrics needs --nodes (loop positions)",
                  file=sys.stderr)
            return 2
        loops = res["loops"].select_columns(
            ["root_nid", "num_nodes"]).to_pandas()
        write_openmetrics(
            args.openmetrics, "loops_num_nodes",
            [({"root": int(r.root_nid)}, int(r.num_nodes))
             for r in loops.itertuples()],
            help_text="nodes per loop feature")
        summary["openmetrics"] = args.openmetrics
    if args.ends_csv:
        import datetime

        import pandas as pd

        keys = list(args.ends_tag or ())
        ends = res["ends"].to_pandas()
        rows = [{"nid": int(r.end_nid), "upstream_m": float(r.end_upstream_m),
                 "lat": 0.0, "lon": 0.0,
                 "tags": [end_tag_vals.get(int(r.end_nid), {}).get(k)
                          for k in keys]}
                for r in ends.itertuples() if pd.notna(r.end_upstream_m)]
        epoch = _input_data_epoch(args)
        n = write_ends_csv(
            args.ends_csv, rows, ends_tag_keys=keys,
            min_length_m=(args.ends_csv_min_length_m
                          if args.ends_csv_min_length_m is not None
                          else args.min_length_m),
            only_largest_n=args.ends_csv_only_largest_n,
            only_tagged=args.ends_csv_only_tagged,
            latest_timestamp=epoch,
            latest_timestamp_iso=datetime.datetime.fromtimestamp(
                epoch, datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"))
        summary["ends_csv"] = {"path": args.ends_csv, "rows": n}
    print(json.dumps(summary))
    if owned:
        ray.shutdown()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="osm_lump_ways_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("lump", help="flagship lump over a pages table")
    pl.add_argument("-i", "--input", "--input-filename", dest="input",
                    help="pages Parquet path/dir")
    pl.add_argument("--synth", type=int, default=None,
                    help="synthesize N deterministic pages instead of --input")
    pl.add_argument("--seed", type=int, default=42)
    pl.add_argument("-o", "--output", "--output-filename", dest="output",
                    action="append",
                    help=".geojson | .geojsons | .geojsonl (repeatable)")
    pl.add_argument("--overwrite", action="store_true",
                    help="overwrite existing output files (default: exit, "
                         "cli_args.rs:43-46)")
    pl.add_argument("-f", "--tag-filter", default=None,
                    help="M2 filter DSL, e.g. 'name' or 'lang=en'")
    pl.add_argument("-g", "--tag-group-by", "--tag-group-k",
                    dest="tag_group_by", default="name")
    pl.add_argument("--incl-unset-group", action="store_true",
                    help="also keep features whose group tag is unset "
                         "(cli_args.rs:96-98)")
    pl.add_argument("--min-length-m", type=float, default=None)
    pl.add_argument("--min-length", default=None,
                    help="DSL: 100 | 5km | 10%%longest | 2%%total | "
                         "incl90%%total (way_group.rs:205-245; conflicts "
                         "with --min-length-m)")
    pl.add_argument("--max-length-m", type=float, default=None)
    pl.add_argument("--only-longest-n", "--only-longest-n-per-file",
                    dest="only_longest_n", type=int, default=None,
                    help="keep the N longest features per output file "
                         "(cli_args.rs:128-130)")
    pl.add_argument("--only-longest-n-per-group", type=int, default=None,
                    help="keep the N longest features per tag group "
                         "(cli_args.rs:124-126)")
    pl.add_argument("--split-into-single-paths", action="store_true",
                    help="decompose each group into linear paths, one "
                         "LineString feature each (cli_args.rs:142-143)")
    pl.add_argument("--split-into-single-paths-by",
                    choices=["as-crow-flies", "longest-path"],
                    default="as-crow-flies",
                    help="how the largest path is chosen (cli_args.rs:146-157)")
    pl.add_argument("--only-longest-n-splitted-paths", type=int, default=None,
                    help="per way group keep only the N longest paths "
                         "(cli_args.rs:132-134)")
    pl.add_argument("--max-sinuosity", type=float, default=None,
                    help="drop paths whose length/straight-line-distance "
                         "exceeds this (requires --split-into-single-paths)")
    pl.add_argument("--incl-dist-to-longer", "--incl-distance-to-longer",
                    dest="incl_dist_to_longer", action="store_true",
                    help="add dist_to_longer_m per feature: distance to the "
                         "nearest longer group (the reference DECLARES this "
                         "flag but asserts it off, main.rs:735 — here it is "
                         "implemented)")
    pl.add_argument("--min-dist-to-longer-m", type=float, default=None,
                    help="keep features at least this far from any longer "
                         "group (requires --incl-dist-to-longer)")
    pl.add_argument("--min-upstream-m", type=float, default=None,
                    help="accepted for parity; the reference lump binary "
                         "declares but never reads it (cli_args.rs:196-198)")
    pl.add_argument("--csv-stats-file", default=None,
                    help="append per-area stats CSV rows (timestamp, "
                         "iso_timestamp, area, metric, value; "
                         "cli_args.rs:201-213)")
    pl.add_argument("--openmetrics", default=None,
                    help="write the same per-area stats as OpenMetrics "
                         "gauges (cli_args.rs:215-217)")
    pl.add_argument("--only-these-way-groups", type=int, action="append",
                    help="K8 debug: keep groups containing this way id "
                         "(repeatable)")
    pl.add_argument("--only-these-way-groups-nodeid", type=int,
                    action="append",
                    help="K8 debug: keep groups containing this node id "
                         "(repeatable)")
    pl.add_argument("--only-these-way-groups-divmod", default=None,
                    metavar="M/R", help="K8 debug: keep groups where "
                                        "component_id %% M == R")
    pl.add_argument("--incl-wayids", "--incl-way-ids", "--include-wayids",
                    "--include-way-ids", dest="incl_wayids",
                    action="store_true",
                    help="add all_wayids JSON-list property per feature "
                         "(conflicts with --split-into-single-paths)")
    pl.add_argument("--output-frames", default=None,
                    help="write G8 frame lines (GeoJSONSeq) to this path")
    pl.add_argument("--frames-group-min-length-m", type=float, default=None)
    pl.add_argument("--betweenness-output", default=None,
                    help="write G9 per-edge betweenness lines to this path")
    pl.add_argument("--betweenness-min-value", type=int, default=0)
    pl.add_argument("--betweenness-min-fraction", type=float, default=0.0,
                    help="keep edges with bc_value/max >= this "
                         "(cli_args.rs:236-242)")
    pl.add_argument("--betweenness-max-nodes", type=int, default=2000)
    pl.add_argument("--save-as-linestrings", action="store_true")
    pl.add_argument("--split-files-by-group", action="store_true")
    _add_common(pl)
    pl.set_defaults(fn=cmd_lump)

    pd = sub.add_parser("down", help="composed -down run over directed edges")
    pd.add_argument("-i", "--input", "--input-filename", dest="input",
                    required=True,
                    help="edges Parquet (src, dst, length_m[, tagid, way_id])")
    pd.add_argument("--nodes", default=None,
                    help="nodes Parquet (node_id, lat, lon) for loop features")
    pd.add_argument("--overwrite", action="store_true",
                    help="overwrite existing product files "
                         "(-down cli_args.rs:52-54)")
    pd.add_argument("--tag-groups", action="store_true")
    pd.add_argument("--from-upstream", action="store_true",
                    help="tag-grouped flow allocation at junctions "
                         "(legacy alias of --flow-follows-tag)")
    pd.add_argument("--flow-follows-tag", default=None, metavar="TAG",
                    help="at a multi-out node allocate inflow to out-edges "
                         "sharing the inflow's tag group (-down "
                         "cli_args.rs:280-283, main.rs:838-905); our data "
                         "model pre-extracts the tag into the edges' tagid "
                         "column, so TAG is accepted for parity and the "
                         "tagid column must be present")
    pd.add_argument("--flow-split-equally", action="store_true",
                    help="split upstream equally over out-edges — the "
                         "default, made explicit (-down cli_args.rs:276-278)")
    pd.add_argument("--max-dist-m", type=float, default=None)
    pd.add_argument("--out-dir", default=None)
    pd.add_argument("--openmetrics", default=None)
    # per-product GeoJSON(Seq) outputs (-down cli_args.rs:177-349)
    pd.add_argument("--loops", default=None,
                    help="loop features (MultiLineString per SCC)")
    pd.add_argument("--loops-incl-nids", action="store_true",
                    help="include member node ids per loop (default)")
    pd.add_argument("--loops-no-incl-nids", action="store_true")
    pd.add_argument("--loops-csv-stats-file", default=None,
                    help="append per-area loops_count/loops_length_m rows")
    pd.add_argument("--loops-openmetrics", default=None)
    pd.add_argument("--ends", default=None,
                    help="end Point features sorted by end upstream desc")
    pd.add_argument("--ends-upstreams", action="store_true",
                    help="each --ends feature becomes the MultiLineString "
                         "of its complete upstream network (declared-but-"
                         "unused in the reference, cli_args.rs:296-298; "
                         "implemented here via the G14 assignment)")
    pd.add_argument("--ends-upstreams-min-upstream-m", type=float,
                    default=None,
                    help="only ends with at least this much upstream")
    pd.add_argument("--ends-upstreams-max-nodes", type=int, default=None,
                    help="cap nodes per end's upstream network")
    pd.add_argument("--upstreams", default=None,
                    help="per-segment upstream LineStrings (G17)")
    pd.add_argument("--upstreams-min-upstream-m", type=float, default=None)
    pd.add_argument("--upstreams-from-upstream-multiple", type=float,
                    action="append", default=None,
                    help="add from_upstream_m_N rounded props (repeatable)")
    pd.add_argument("--upstream-output-ends-full", action="store_true",
                    help="add the draining end_nid per segment")
    pd.add_argument("--grouped-ends", default=None,
                    help="grouped end-path Point features (G16)")
    pd.add_argument("--grouped-ends-max-distance-m", type=float, default=None,
                    help="group ends within this path distance (maps to "
                         "the pipeline's max_dist_m)")
    pd.add_argument("--grouped-ends-max-upstream-delta", type=float,
                    default=None,
                    help="keep grouped paths with |to-from| upstream "
                         "within this")
    pd.add_argument("--grouped-waterways", default=None,
                    help="per-taggroup stats features (geometry: null); "
                         "implies --tag-groups")
    pd.add_argument("--longest-source-mouth", default=None,
                    help="per-mouth longest-path Point features (G19)")
    pd.add_argument("--longest-source-mouth-min-length-m", type=float,
                    default=None)
    pd.add_argument("--longest-source-mouth-longest-n", type=int,
                    default=None)
    pd.add_argument("--longest-source-mouth-only-named", action="store_true")
    pd.add_argument("--longest-source-mouth-unnamed-string",
                    default="_unnamed")
    pd.add_argument("--relations", default=None,
                    help="relation membership Parquet "
                         "(way_id, rel_id, rel_tag[, role])")
    pd.add_argument("--relation-tags-overwrite", action="store_true",
                    help="overwrite edge tagids with the biggest relation's "
                         "tag (-down cli_args.rs:315-317)")
    pd.add_argument("--relation-tags-role", action="append", default=None,
                    help="only members with this role count (repeatable, "
                         "-down cli_args.rs:319-321)")
    pd.add_argument("--ends-csv", "--ends-csv-file", dest="ends_csv",
                    default=None)
    pd.add_argument("--ends-csv-min-length-m", type=float, default=None)
    pd.add_argument("--ends-csv-only-largest-n", type=int, default=None)
    pd.add_argument("--ends-csv-only-tagged", action="store_true")
    pd.add_argument("--min-upstream-m", type=float, default=None,
                    help="only --ends features with at least this upstream "
                         "(-down main.rs:1068-1071)")
    pd.add_argument("--incl-wayids", "--incl-way-ids", dest="incl_wayids",
                    action="store_true",
                    help="add member way ids to --longest-source-mouth "
                         "features (-down main.rs:1238,1256; needs a way_id "
                         "edge column)")
    # the reference's -down binary declares these but never reads them
    # (grep of -down/main.rs finds zero uses); accepted for CLI parity
    for dead in ("--frames-group-min-length-m", "--max-sinuosity",
                 "--min-dist-to-longer-m", "--output-frames",
                 "--split-into-single-paths-by", "--tag-group-k"):
        pd.add_argument(dead, default=None, help=argparse.SUPPRESS)
    for dead in ("--incl-dist-to-longer", "--incl-unset-group",
                 "--save-as-linestrings", "--split-files-by-group",
                 "--split-into-single-paths"):
        pd.add_argument(dead, action="store_true", help=argparse.SUPPRESS)
    for dead in ("--only-longest-n-per-file", "--only-longest-n-per-group",
                 "--only-longest-n-splitted-paths"):
        pd.add_argument(dead, type=int, default=None, help=argparse.SUPPRESS)
    pd.add_argument("--ends-membership", action="append", default=None,
                    help="tag-filter DSL over edge tag columns; adds "
                         "is_in:<filter> flags per end (repeatable, "
                         "-down cli_args.rs:215)")
    pd.add_argument("--ends-tag", action="append", default=None,
                    help="edge tag column; adds the per-end sorted "
                         "';'-joined values to the ends CSV (repeatable, "
                         "-down cli_args.rs:225)")
    pd.add_argument("--min-length-m", type=float, default=None)
    _add_common(pd)
    pd.set_defaults(fn=cmd_down)

    args = ap.parse_args(argv)
    if args.cmd == "lump" and not (args.input or args.synth):
        ap.error("lump needs -i/--input or --synth")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
