"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin at a given sf_dir, compare row count, column names and
order-insensitive values. Usage:

    PYTHONPATH=. python tools/check_queries.py [sf_dir] [query ...]
    PYTHONPATH=. python tools/check_queries.py --manifest [OUT.json]

``--manifest`` runs the FULL battery at sf0.001 AND sf0.01 and writes a
CORRECTNESS-shaped json (per-query rows/schema/hash match records, keyed per
sf) — committed per round as CORRECTNESS_local_r{N}.json so the driver's
mid-round snapshot timing can't hide the battery's end-of-round state
(VERDICT r4 next-step #8).
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result):
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame, sort: bool = True) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    if sort:
        df = df.sort_values(list(df.columns))
    return df.reset_index(drop=True)


def run_battery(sf_dir: str, only: set, entry) -> tuple[list, dict]:
    """One full pass at ``sf_dir``; returns (failures, per-query records in
    the driver's CORRECTNESS shape)."""
    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    records: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None, "oracle_rows": None,
               "err": None}
        records[name] = rec
        t0 = time.monotonic()
        try:
            raw = to_pandas(fn(sf_dir))
            got = canon(raw)
            # driver hashes rows in RETURNED order: verify the engine already
            # emits canonical (all-columns-ascending, name-priority) order
            order_ok = canon(raw, sort=False).equals(got)
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: RAY ERROR {type(e).__name__}: {e}")
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
            failures.append(name)
            continue
        wall = time.monotonic() - t0
        rec["spark_rows"] = int(len(got))
        if not order_ok:
            print(f"! {name}: returned row order is NOT canonical")
            failures.append(name + ":order")
        if name not in oracles:
            print(f"· {name}: rows-only ({len(got)} rows, {wall:.1f}s)")
            rec.update(rows_match=True, schema_match=True, hash_match=None,
                       oracle_rows=None)
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: SQL ERROR {e}")
            rec["err"] = f"SQL: {e}"[:300]
            failures.append(name)
            continue
        rec["oracle_rows"] = int(len(exp))
        if list(got.columns) != list(exp.columns):
            print(f"✗ {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures.append(name)
            continue
        rec["schema_match"] = True
        if len(got) != len(exp):
            print(f"✗ {name}: rows {len(got)} vs {len(exp)}")
            failures.append(name)
            continue
        rec["rows_match"] = True
        # align mixed int/float dtypes (e.g. a Ray Sum yielding float64 vs a SQL
        # BIGINT) before the exact compare
        for c in got.columns:
            if got[c].dtype != exp[c].dtype:
                if pd.api.types.is_datetime64_any_dtype(got[c]) or \
                        pd.api.types.is_datetime64_any_dtype(exp[c]):
                    got[c] = pd.to_datetime(got[c]).astype("datetime64[us]")
                    exp[c] = pd.to_datetime(exp[c]).astype("datetime64[us]")
                else:
                    got[c] = got[c].astype("float64")
                    exp[c] = exp[c].astype("float64")
        # order-sensitive probe: the driver hashes rows in RETURNED order, so
        # flag (but don't fail) when the engine's returned order deviates from
        # the canonical all-columns ascending sort it now emits.
        eq = got.equals(exp)
        if not eq:
            diff = (got != exp).any(axis=1)
            print(f"✗ {name}: {int(diff.sum())}/{len(got)} rows differ; first:")
            print(pd.concat([got[diff].head(3).add_suffix("_ray"),
                             exp[diff].head(3).add_suffix("_sql")], axis=1))
            failures.append(name)
        else:
            rec["hash_match"] = True
            print(f"OK {name} ({len(got)} rows, {wall:.1f}s)")
    con.close()
    return failures, records


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entry

    return ray, entry


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--manifest":
        out_path = sys.argv[2] if len(sys.argv) > 2 \
            else "CORRECTNESS_local.json"
        import subprocess

        manifest: dict = {}
        all_failures = []
        # fresh process per sf: the session-level derivation caches key on
        # sf_dir, but a clean plasma store per level keeps the runs honest
        for sf in ("sf0.001", "sf0.01"):
            r = subprocess.run(
                [sys.executable, __file__, f"/root/testdata/{sf}",
                 "--record", f"/tmp/check_{sf}.json"],
                capture_output=True, text=True)
            sys.stdout.write(r.stdout[-4000:])
            if r.returncode not in (0, 1):
                sys.stderr.write(r.stderr[-4000:])
                return 2
            with open(f"/tmp/check_{sf}.json") as f:
                rec = json.load(f)
            manifest[sf] = rec["records"]
            all_failures += [f"{sf}:{x}" for x in rec["failures"]]
        manifest["_summary"] = {
            "queries": len(manifest.get("sf0.001", {})),
            "failures": all_failures,
        }
        with open(out_path, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        print(f"\nmanifest → {out_path}; {len(all_failures)} failures: "
              f"{all_failures}")
        return 1 if all_failures else 0

    args = [a for a in sys.argv[1:]]
    record_path = None
    if "--record" in args:
        i = args.index("--record")
        record_path = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    ray, entry = _init_ray()
    failures, records = run_battery(sf_dir, only, entry)
    if record_path:
        with open(record_path, "w") as f:
            json.dump({"failures": failures, "records": records}, f)
    print(f"\n{len(failures)} failures: {failures}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
