#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (e.g. sf0.1 vs a 10x/100x scaling
fixture run) and print the per-query growth table: seconds at each
scale, the ratio, and the per-decade exponent.  Used to build the
SCALING.md tables.

Usage: scaling_report.py <base_bench.json> <scaled_bench.json> <decades>
       [threshold_ratio]
Prints queries sorted by ratio descending; with a threshold, only rows
above it (the 'needs a named cause' set) plus summary totals.
"""
import json
import math
import sys

base_p, scaled_p, decades = sys.argv[1], sys.argv[2], float(sys.argv[3])
thresh = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0

base = json.load(open(base_p))
scaled = json.load(open(scaled_p))
bq, sq = base["queries"], scaled["queries"]

shared = sorted(set(bq) & set(sq))
missing = sorted(set(bq) ^ set(sq))
if missing:
    print(f"# not in both artifacts: {', '.join(missing)}")

rows = []
for q in shared:
    b, s = bq[q], sq[q]
    if b is None or s is None or b < 0 or s < 0:
        print(f"# FAILED somewhere: {q} base={b} scaled={s}")
        continue
    ratio = s / max(b, 1e-9)
    exp = math.log10(max(ratio, 1e-9)) / decades
    rows.append((ratio, q, b, s, exp))

rows.sort(reverse=True)
print(f"| query | base (s) | scaled (s) | ratio | exp/decade |")
print(f"|---|---|---|---|---|")
for ratio, q, b, s, exp in rows:
    if ratio >= thresh:
        print(f"| {q} | {b:.2f} | {s:.2f} | {ratio:.1f}x | {exp:.2f} |")

bt = sum(v for v in bq.values() if v and v >= 0)
st = sum(v for v in sq.values() if v and v >= 0)
bf = sum(1 for v in bq.values() if v is None or v < 0)
sf_ = sum(1 for v in sq.values() if v is None or v < 0)
print(f"\ntotal: base {bt:.1f}s (failed {bf}) -> scaled {st:.1f}s "
      f"(failed {sf_}) = {st/bt:.2f}x, suite exp/decade "
      f"{math.log10(st/bt)/decades:.2f}")
print(f"queries >10x growth: {sum(1 for r in rows if r[0] > 10)} "
      f"of {len(rows)}")
