#!/usr/bin/env python
"""Diff two BENCH_LOCAL_r{N}.json artifacts min-vs-min.

Usage: python scripts/diff_bench.py BENCH_LOCAL_r8.json BENCH_LOCAL_r9.json
Prints per-query deltas over a threshold plus totals; reminder: deltas
under ~40% are host noise unless an interleaved A/B (ab_bench.py)
confirms them (SCALE.md round-8 bench methodology)."""
import json
import sys

a, b = (json.load(open(p)) for p in sys.argv[1:3])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
qa, qb = a["queries"], b["queries"]
print(f"{a['round']} ({a['commit'][:8]}) -> {b['round']} ({b['commit'][:8]})"
      f"  min_total {a['min_total']} -> {b['min_total']}")
for q in sorted(set(qa) & set(qb), key=lambda q: qb[q]["min"] / max(qa[q]["min"], 1e-9)):
    r = qb[q]["min"] / max(qa[q]["min"], 1e-9)
    if abs(r - 1) >= thr:
        print(f"{q:36s} {qa[q]['min']:7.3f} -> {qb[q]['min']:7.3f}  x{r:.2f}")
only_b = sorted(set(qb) - set(qa))
if only_b:
    print("new:", ", ".join(only_b))
