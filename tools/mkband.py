#!/usr/bin/env python3
"""Seed BENCH_BAND.json from a full isolated Bench run.

Usage: python3 tools/mkband.py [BENCH_LAST.json] [BENCH_BAND.json]

Takes each key's MIN raw time from the given bench record (run
isolated — nothing else CPU-heavy on the host) and writes the flat
{"key": sec} band file Bench.scala reads at startup. A key in a later
run is stall-flagged when its min-of-2 exceeds 2x its band AND by
>0.5s absolute — the both-runs-slow stall the run-disagreement rule
cannot see. Reseed after a round whose plan changes legitimately move
steady-state times.

The band file carries its seeding config as underscore-prefixed
provenance keys ("_sf_dir", "_cpus"): Bench skips band flagging when
the current run's config differs (a band seeded at sf0.1 would flag
nearly every key of an sf1 run). Bench.parseBand ignores "_" keys.
"""
import json
import os
import sys

argv = [a for a in sys.argv[1:] if a != "--merge"]
merge = "--merge" in sys.argv
src = argv[0] if len(argv) > 0 else "BENCH_LAST.json"
dst = argv[1] if len(argv) > 1 else "BENCH_BAND.json"

with open(src) as f:
    rec = json.load(f)
raw = rec["raw_times"]
band = {k: min(t for t in ts if t >= 0)
        for k, ts in sorted(raw.items())
        if ts and all(t >= 0 for t in ts)}
# the end-of-run isolated re-measures are the most trustworthy reads
for k, t in rec.get("isolated", {}).items():
    if t >= 0 and k in band:
        band[k] = min(band[k], t)
# --merge: fold into the existing band (element-wise min) so the band
# stays the best-known isolated minimum across runs instead of
# resetting to one run's (possibly noisier) numbers
if merge and os.path.exists(dst):
    with open(dst) as f:
        old = {k: v for k, v in json.load(f).items()
               if not k.startswith("_")}
    for k, v in old.items():
        band[k] = min(band.get(k, v), v)
out = {"_sf_dir": rec.get("sf", "/root/testdata/sf0.1"),
       "_cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32"))}
out.update(band)
with open(dst, "w") as f:
    json.dump(out, f, indent=0, separators=(",", ":"))
    f.write("\n")
print(f"{dst}: {len(band)} keys, total {sum(band.values()):.1f}s "
      f"(from {src}, sf_dir={out['_sf_dir']}, cpus={out['_cpus']})")
