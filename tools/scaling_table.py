#!/usr/bin/env python3
"""Emit the SURVEY §6 markdown scaling table from the three bench dumps.

Usage: python3 tools/scaling_table.py [sf01.json sf1.json sf10.json]

Ratios are per data decade (sf0.1 -> sf1 -> sf10 are 10x row steps; the
documents table grows ~13.2x in characters per step, so text-bound
queries are linear at ~13x). Queries are grouped by the worst decade
ratio so the table leads with whatever deserves a root cause.
"""
import json
import statistics
import sys

paths = sys.argv[1:] if len(sys.argv) == 4 else [
    "bench_out.json", "BENCH_sf1.json", "BENCH_sf10.json"]
s01, s1, s10 = (json.load(open(p))["queries"] for p in paths)

rows = []
for q, t0 in s01.items():
    t1, t10 = s1.get(q), s10.get(q)
    if t1 is None or t10 is None:
        continue
    rows.append((q, t0, t1, t1 / t0, t10, t10 / t1))
rows.sort(key=lambda r: -max(r[3], r[5]))

print("| query | sf0.1 | sf1 | x/dec | sf10 | x/dec |")
print("|---|---|---|---|---|---|")
for q, t0, t1, r1, t10, r10 in rows:
    print(f"| `{q}` | {t0:.2f}s | {t1:.2f}s | {r1:.1f}x | {t10:.2f}s | {r10:.1f}x |")

r1s = [r[3] for r in rows]
r10s = [r[5] for r in rows]
tot = [sum(d.values()) for d in (s01, s1, s10)]
print()
print(f"totals: {tot[0]:.1f}s / {tot[1]:.1f}s / {tot[2]:.1f}s  "
      f"median ratio {statistics.median(r1s):.2f}x (sf0.1->1), "
      f"{statistics.median(r10s):.2f}x (sf1->10), n={len(rows)}")
