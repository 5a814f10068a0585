#!/usr/bin/env python3
"""Dev-only oracle checker (mirrors the driver's DuckDB compare).

Usage: python3 scripts/check.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet dir (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir tables,
and diffs. NOT part of the engine — development harness only.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # fixed precision before sorting, like the driver's canonical CSV —
    # absorbs summation-order fp noise (~1e-12) between engines
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].astype(float).round(6)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(name, spark_df, oracle_df):
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return f"SCHEMA  spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
    if len(spark_df) != len(oracle_df):
        return f"ROWS    spark={len(spark_df)} oracle={len(oracle_df)}"
    a, b = canon(spark_df), canon(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        # the driver hashes an exact fixed-precision CSV: an int column on
        # one side rendering "0" vs a float "0.0" on the other is a real
        # driver failure (e.g. DuckDB HUGEINT -> pandas float64) — flag it
        # here instead of silently comparing numerically
        if (av.dtype.kind in "iu") != (bv.dtype.kind in "iu") and not (
            av.isna().any() or bv.isna().any()
        ):
            return f"DTYPE   col={c} spark={av.dtype} oracle={bv.dtype} (int/float render mismatch in driver CSV hash)"
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            close = ((av - bv).abs() <= 2e-6 + 1e-9 * bv.abs()) | both_nan
            if not close.all():
                i = (~close).idxmax()
                return f"VALUE   col={c} row={i} spark={av[i]!r} oracle={bv[i]!r}"
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                neq = av.astype(str) != bv.astype(str)
                i = neq.idxmax()
                return f"VALUE   col={c} row={i} spark={av[i]!r} oracle={bv[i]!r}"
    return None


def main():
    # usage: check.py <sfDir> <outDir> [name ...] — trailing names restrict
    # the compare (pairs with graft.Verify's query filter for dev loops)
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = 0
    # a typo'd filter name must not read as a silent pass. A name with
    # neither an oracle nor a dump is either a typo or a query whose
    # Verify dump failed — both deserve a loud nonzero exit.
    dumped = {d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))}
    unknown = only - set(oracles) - dumped
    if unknown:
        print(f"[ERR] no oracle and no dump for: {sorted(unknown)} "
              f"(typo, or graft.Verify failed to write it)")
        sys.exit(2)
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark output")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            failures += 1
            continue
        diff = compare(name, spark_df, oracle_df)
        if diff:
            print(f"[FAIL] {name}: {diff}")
            failures += 1
        else:
            print(f"[ok]   {name}  rows={len(spark_df)}")
    # queries with no oracle: rows-only note (respects the name filter)
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if os.path.isdir(full) and d not in oracles and (not only or d in only):
            n = sum(len(pd.read_parquet(f)) for f in glob.glob(full + "/*.parquet"))
            print(f"[rows] {d}  rows={n} (no oracle)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
