"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive canonicalization of the values. Stricter than any
reasonable hash: floats must match bit-for-bit (the engine routes all
FP-unstable aggregation through DECIMAL precisely so that they do).

Usage: python selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from coin_for_rich_spark.session import get_spark
from coin_for_rich_spark.sources import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import tempfile

    con = duckdb.connect()
    # same oracle memory posture as scripts/scale_gate.duck_connect: the
    # oracle shares the box with the Spark JVM, and DuckDB's default limit
    # (80% of RAM) ignores that neighbor — cap it and let grouped
    # aggregations spill to disk instead of drawing the OOM killer
    con.execute(
        f"SET memory_limit='{os.environ.get('SPARK_GRAFT_ORACLE_MEM', '24GB')}'"
    )
    con.execute(
        f"SET temp_directory='{tempfile.mkdtemp(prefix='cfr_duck_spill_')}'"
    )
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        if np.issubdtype(s.dtype, np.datetime64):
            s = s.astype("datetime64[us]")
        if s.dtype == object:
            s = s.astype(str)
        df[c] = s
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = canonicalize(spark_df), canonicalize(oracle_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                i = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches; first at row {i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r} (Δ={av[i]-bv[i]!r})"
                )
        else:
            # NaT == NaT and None == None count as equal: numpy's elementwise
            # == is False for missing values even when both sides are missing
            eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            if not np.asarray(eq).all():
                i = int(np.argmax(~np.asarray(eq)))
                problems.append(
                    f"col {c}: first mismatch row {i}: spark={av[i]!r} oracle={bv[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("selfcheck")
    con = duck_connect(sf_dir)
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
