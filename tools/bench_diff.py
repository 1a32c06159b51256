#!/usr/bin/env python3
"""Cross-round bench tripwire: diff the current target/bench.json against the
PREVIOUS ROUND's archive in tools/bench_history/ and fail loudly on
regressions.

The catalog is 200+ queries — eyeballing the total can hide a single query
blowing up 10x behind ambient drift (the q155 133-s blow-up was caught only
by a total-wall glance). This makes the per-query comparison mechanical:

  * any query whose best time is > THRESH x its prior-round best AND at
    least ABS_FLOOR seconds slower is a REGRESSION -> exit 1
  * new queries (no prior number) are listed informationally
  * queries that got faster are summarized

Usage: python3 tools/bench_diff.py [current.json] [baseline.json]
  (defaults: target/bench.json vs the PREVIOUS round's archive — see below)

Baseline selection: when CURRENT_ROUND (env GRAFT_ROUND or the newest
VERDICT/CORRECTNESS round + 1) has already archived a bench_r{N}.json
mid-round, blindly diffing against "the newest archive" compares the round
against ITSELF and masks cross-round drift (the round-9 lesson: q91 drifted
1.57x r8->r9 and never tripped because a mid-round r9 archive became the
baseline). So the default baseline is the newest archive whose round number
is STRICTLY BELOW the current round; pass a baseline path explicitly to
diff against anything else (e.g. BOTH the previous round's and a mid-round
archive in the close ritual).

Round close ritual: run the closing bench, run this script against the
previous round's archive (the default), fix or explain any regression in
SCALE.md's round ledger, then copy target/bench.json to
tools/bench_history/bench_r{N}.json and commit.
"""
import sys, json, glob, os, re

THRESH = 1.5     # ratio above which a slowdown is a regression
ABS_FLOOR = 0.3  # seconds; sub-300ms queries jitter across this ratio freely

def current_round():
    """The round being built: GRAFT_ROUND env, else newest round artifact
    (VERDICT is written for round N-1 when round N starts; CORRECTNESS_r{N}
    exists once the driver has graded round N) + 1."""
    if os.environ.get("GRAFT_ROUND"):
        return int(os.environ["GRAFT_ROUND"])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [int(m.group(1)) for f in os.listdir(repo)
              for m in [re.match(r"CORRECTNESS_r(\d+)\.json", f)] if m]
    return (max(rounds) + 1) if rounds else 1

cur_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
if len(sys.argv) > 2:
    base_path = sys.argv[2]
else:
    cur_round = current_round()
    hist = []
    for p in glob.glob(os.path.join(os.path.dirname(__file__),
                                    "bench_history", "bench_r*.json")):
        m = re.match(r"bench_r(\d+)\.json", os.path.basename(p))
        if m and int(m.group(1)) < cur_round:
            hist.append((int(m.group(1)), p))
    if not hist:
        sys.exit("no prior-round baseline in tools/bench_history/ "
                 f"(current round {cur_round}) and none given")
    base_path = max(hist)[1]

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
