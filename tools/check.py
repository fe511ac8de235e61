#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Creates DuckDB views named after each table over the sfDir parquet,
runs every oracle_sql.json query, and compares against the Spark
parquet dump: columns sorted by name, rows sorted, values compared
exactly (doubles to 9 significant digits after the agreed rounding).
"""
import json
import math
import sys
import glob
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = f"{out}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = con.sql(f"SELECT * FROM '{files[0]}'").df()
            odf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_fail += 1
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"FAIL  {name}: cols spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        srows = sorted(tuple(norm(v) for v in r)
                       for r in sdf[s_cols].itertuples(index=False))
        orows = sorted(tuple(norm(v) for v in r)
                       for r in odf[o_cols].itertuples(index=False))
        if srows == orows:
            print(f"PASS  {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {len(srows)} vs {len(orows)} rows")
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            for a, b in diff:
                print(f"      spark : {a}\n      oracle: {b}")
            n_fail += 1
    # queries with no oracle get a rows-only note
    for d in sorted(os.listdir(out)):
        p = os.path.join(out, d)
        if os.path.isdir(p) and d not in oracle:
            files = glob.glob(f"{p}/*.parquet")
            n = con.sql(f"SELECT count(*) FROM '{files[0]}'").fetchone()[0] \
                if files else 0
            print(f"ROWS  {d}: {n} rows (no oracle)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
