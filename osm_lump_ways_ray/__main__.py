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
    else:
        import ray.data

        pages = ray.data.read_parquet(args.input)

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
                              props=("component_id", "length_m", "num_nodes"),
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
    ray, owned = _ray_session(args.num_cpus)
    import ray.data

    from .pipelines.waterways_down import waterways_down
    from .sources.csvout import write_ends_csv, write_openmetrics

    edges = ray.data.read_parquet(args.input)
    nodes = ray.data.read_parquet(args.nodes) if args.nodes else None
    res = waterways_down(edges, nodes, split_equally=not args.from_upstream,
                         max_dist_m=args.max_dist_m,
                         with_tag_groups=args.tag_groups,
                         num_partitions=args.num_partitions,
                         checkpoint_dir=args.checkpoint_dir)
    summary = {"metrics": res["metrics"]}

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
        import pandas as pd

        keys = list(args.ends_tag or ())
        ends = res["ends"].to_pandas()
        rows = [{"nid": int(r.end_nid), "upstream_m": float(r.end_upstream_m),
                 "lat": 0.0, "lon": 0.0,
                 "tags": [end_tag_vals.get(int(r.end_nid), {}).get(k)
                          for k in keys]}
                for r in ends.itertuples() if pd.notna(r.end_upstream_m)]
        n = write_ends_csv(args.ends_csv, rows, ends_tag_keys=keys,
                           min_length_m=args.min_length_m)
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
    pd.add_argument("-i", "--input", required=True,
                    help="edges Parquet (src, dst, length_m[, tagid])")
    pd.add_argument("--nodes", default=None,
                    help="nodes Parquet (node_id, lat, lon) for loop features")
    pd.add_argument("--tag-groups", action="store_true")
    pd.add_argument("--from-upstream", action="store_true",
                    help="route full upstream to the biggest end "
                         "(default splits equally)")
    pd.add_argument("--max-dist-m", type=float, default=None)
    pd.add_argument("--out-dir", default=None)
    pd.add_argument("--openmetrics", default=None)
    pd.add_argument("--ends-csv", default=None)
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
