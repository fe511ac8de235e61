#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [--only a,b] [--skip a,b]
                              [--timeout SECS]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Creates DuckDB views named after each table over the sfDir parquet,
runs every oracle_sql.json query, and compares against the Spark
parquet dump: columns sorted by name, rows sorted, values compared
exactly (doubles to 9 significant digits after the agreed rounding).

Each result line carries the oracle's wall seconds (the Spark side is
pre-dumped) so slow DuckDB replays are visible; output is unbuffered
so a long sf0.1 sweep shows progress. --skip excludes named queries
(the known minutes-long DuckDB replays at sf0.1); skipped queries are
listed so a skip can never masquerade as a pass. --timeout bounds each
ORACLE's wall time: on expiry the DuckDB query is interrupted and the
query is reported as TIMEOUT (counted separately, never as pass) — the
principled way to sweep sf0.1 where a few SQL replays (MinHash et al.)
take tens of minutes each while the Spark side is already dumped.
Exit code: 0 clean, 1 any FAIL/ERR/MISS, 2 no failures but ≥1 TIMEOUT
(unverified ≠ verified).
"""
import json
import math
import sys
import threading
import time
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = skip = None
    timeout = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        if a.startswith("--skip="):
            skip = set(a.split("=", 1)[1].split(","))
        if a.startswith("--timeout="):
            timeout = float(a.split("=", 1)[1])
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    skipped = []
    timed_out_names = []
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        if skip is not None and name in skip:
            skipped.append(name)
            continue
        spark_dir = f"{out}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output", flush=True)
            n_fail += 1
            continue
        t0 = time.time()
        timer = None
        timed_out = [False]
        if timeout is not None:
            def _interrupt(c=con, flag=timed_out):
                flag[0] = True
                c.interrupt()
            timer = threading.Timer(timeout, _interrupt)
            timer.start()
        try:
            sdf = con.sql(f"SELECT * FROM '{files[0]}'").df()
            odf = con.sql(oracle[name]).df()
            # cancel IMMEDIATELY after the queries return: a timer
            # firing in the gap before a `finally` would interrupt the
            # idle connection and cancel the NEXT query instead,
            # mis-reporting an unrelated name as ERR
            if timer is not None:
                timer.cancel()
        except Exception as e:
            if timer is not None:
                timer.cancel()
            if timed_out[0]:
                print(f"TIMEOUT {name}: oracle exceeded {timeout:.0f}s "
                      f"(not counted as pass)", flush=True)
                timed_out_names.append(name)
            else:
                print(f"ERR   {name}: {e}", flush=True)
                n_fail += 1
            continue
        if timed_out[0]:
            # timer fired but the query had already returned: the
            # interrupt is now pending against the connection; clear it
            # with a no-op query and count this one by its real result
            try:
                con.sql("SELECT 1")
            except Exception:
                pass
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"FAIL  {name}: cols spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        srows = sorted(tuple(norm(v) for v in r)
                       for r in sdf[s_cols].itertuples(index=False))
        orows = sorted(tuple(norm(v) for v in r)
                       for r in odf[o_cols].itertuples(index=False))
        dt = time.time() - t0
        if srows == orows:
            print(f"PASS  {name} ({len(srows)} rows, {dt:.1f}s)", flush=True)
            n_pass += 1
        else:
            print(f"FAIL  {name}: {len(srows)} vs {len(orows)} rows",
                  flush=True)
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            for a, b in diff:
                print(f"      spark : {a}\n      oracle: {b}")
            n_fail += 1
    # queries with no oracle get a rows-only note
    if only is None:
        for d in sorted(os.listdir(out)):
            p = os.path.join(out, d)
            if os.path.isdir(p) and d not in oracle:
                files = glob.glob(f"{p}/*.parquet")
                n = con.sql(
                    f"SELECT count(*) FROM '{files[0]}'").fetchone()[0] \
                    if files else 0
                print(f"ROWS  {d}: {n} rows (no oracle)")
    if skipped:
        print(f"SKIPPED ({len(skipped)}): {','.join(skipped)}")
    if timed_out_names:
        print(f"TIMED OUT ({len(timed_out_names)}): "
              f"{','.join(timed_out_names)}")
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(timed_out_names)} timeout ==", flush=True)
    # a timed-out oracle is UNVERIFIED, not passed: exit nonzero (its
    # own code) so automation can't read a sweep with unchecked
    # queries as clean — a timeout must never mask a regression
    sys.exit(1 if n_fail else (2 if timed_out_names else 0))


if __name__ == "__main__":
    main()
