#!/usr/bin/env python3
"""Seed BENCH_BAND.json from a full isolated Bench run.

Usage: python3 tools/mkband.py [BENCH_LAST.json] [BENCH_BAND.json]

Takes each key's MIN raw time from the given bench record (run
isolated — nothing else CPU-heavy on the host) and writes the flat
{"key": sec} band file Bench.scala reads at startup. A key in a later
run is stall-flagged when its min-of-2 exceeds 3x its band AND by
>0.5s absolute — the both-runs-slow stall the run-disagreement rule
cannot see. Reseed after a round whose plan changes legitimately move
steady-state times.
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LAST.json"
dst = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BAND.json"

with open(src) as f:
    rec = json.load(f)
raw = rec["raw_times"]
band = {k: min(t for t in ts if t >= 0)
        for k, ts in sorted(raw.items())
        if ts and all(t >= 0 for t in ts)}
with open(dst, "w") as f:
    json.dump(band, f, indent=0, separators=(",", ":"))
    f.write("\n")
print(f"{dst}: {len(band)} keys, total {sum(band.values()):.1f}s "
      f"(from {src})")
