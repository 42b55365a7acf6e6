#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the
<sf_dir> tables, and compares after sorting columns by name and rows by
all columns. Prints a per-query verdict."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    n_ok = n_bad = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output")
            n_bad += 1
            continue
        spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracles:
            print(f"rows  {name}: {len(spark_df)} rows (no oracle)")
            continue
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {str(e)[:200]}")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            n_bad += 1
            continue
        try:
            # strict dtype check: the driver's gate hashes typed values, so
            # a HUGEINT-vs-bigint difference fails there even when the
            # rendered numbers agree (the round-1 q32 lesson)
            pd.testing.assert_frame_equal(a, b, check_dtype=True,
                                          check_exact=True)
            print(f"OK    {name}: {len(a)} rows")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch: {str(e)[:300]}")
            # show first differing rows
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_rows = neq.any(axis=1)
            if bad_rows.any():
                i = bad_rows.idxmax()
                print(f"      spark row {i}: {a.loc[i].to_dict()}")
                print(f"      duck  row {i}: {b.loc[i].to_dict()}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {len(names)} total")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
