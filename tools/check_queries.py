"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin at a given sf_dir, compare row count, column names and
order-insensitive values. Usage:

    PYTHONPATH=. python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            raw = to_pandas(fn(sf_dir))
            got = canon(raw)
            # driver hashes rows in RETURNED order: verify the engine already
            # emits canonical (all-columns-ascending, name-priority) order
            order_ok = canon(raw, sort=False).equals(got)
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: RAY ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        wall = time.monotonic() - t0
        if not order_ok:
            print(f"! {name}: returned row order is NOT canonical")
            failures.append(name + ":order")
        if name not in oracles:
            print(f"· {name}: rows-only ({len(got)} rows, {wall:.1f}s)")
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: SQL ERROR {e}")
            failures.append(name)
            continue
        if list(got.columns) != list(exp.columns):
            print(f"✗ {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"✗ {name}: rows {len(got)} vs {len(exp)}")
            failures.append(name)
            continue
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
            print(f"OK {name} ({len(got)} rows, {wall:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
