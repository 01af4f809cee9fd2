#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
test parquet tables and compares (order-insensitively, exact values) with
the Spark result parquet written by `graft.Verify`.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for a stable order-insensitive compare
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    rows = sorted(map(tuple, out.itertuples(index=False, name=None)))
    return pd.DataFrame(rows, columns=sorted(df.columns))


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"  {name}: NO OUTPUT")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_df)} rows)"
                  + (" EMPTY!" if len(spark_df) == 0 else ""))
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE ERROR: {e}")
            n_fail += 1
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"  {name}: SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
            n_fail += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff[diff].index[0]
            print(f"  {name}: VALUE MISMATCH at row {i}:")
            print(f"    spark: {a.loc[i].to_dict()}")
            print(f"    duck : {b.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"  {name}: OK ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} oracle-pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
