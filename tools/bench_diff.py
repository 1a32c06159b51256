#!/usr/bin/env python3
"""Cross-round bench tripwire: diff the current target/bench.json against the
newest archive in tools/bench_history/ and fail loudly on regressions.

The catalog is 200+ queries — eyeballing the total can hide a single query
blowing up 10x behind ambient drift (the q155 133-s blow-up was caught only
by a total-wall glance). This makes the per-query comparison mechanical:

  * any query whose best time is > THRESH x its prior-round best AND at
    least ABS_FLOOR seconds slower is a REGRESSION -> exit 1
  * new queries (no prior number) are listed informationally
  * queries that got faster are summarized

Usage: python3 tools/bench_diff.py [current.json] [baseline.json]
  (defaults: target/bench.json vs newest tools/bench_history/bench_r*.json)

Round close ritual: run the closing bench, run this script, fix or explain
any regression in SCALE.md's round ledger, then copy target/bench.json to
tools/bench_history/bench_r{N}.json and commit.
"""
import sys, json, glob, os

THRESH = 1.5     # ratio above which a slowdown is a regression
ABS_FLOOR = 0.3  # seconds; sub-300ms queries jitter across this ratio freely

cur_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
if len(sys.argv) > 2:
    base_path = sys.argv[2]
else:
    hist = sorted(glob.glob(os.path.join(os.path.dirname(__file__),
                                         "bench_history", "bench_r*.json")))
    if not hist:
        sys.exit("no baseline in tools/bench_history/ and none given")
    base_path = hist[-1]

cur = json.load(open(cur_path))["queries"]
base = json.load(open(base_path))["queries"]

regressions, improved, new = [], [], []
for name, t in sorted(cur.items()):
    if name not in base:
        new.append((name, t)); continue
    b = base[name]
    if t > b * THRESH and t - b > ABS_FLOOR:
        regressions.append((name, b, t))
    elif b > t * THRESH and b - t > ABS_FLOOR:
        improved.append((name, b, t))

print(f"baseline: {base_path} ({len(base)} queries)")
print(f"current:  {cur_path} ({len(cur)} queries)")
for n, t in new:
    print(f"NEW  {n}: {t:.2f}s")
for n, b, t in improved:
    print(f"FAST {n}: {b:.2f}s -> {t:.2f}s ({t/b:.2f}x)")
for n, b, t in regressions:
    print(f"REGRESSION {n}: {b:.2f}s -> {t:.2f}s ({t/b:.2f}x)")
gone = sorted(set(base) - set(cur))
if gone:
    print(f"DROPPED from catalog: {', '.join(gone)}")
print(f"\n{len(regressions)} regressions, {len(improved)} improved, "
      f"{len(new)} new, {len(gone)} dropped")
sys.exit(1 if regressions or gone else 0)
