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
noisy = []
for q in sorted(set(qa) & set(qb), key=lambda q: qb[q]["min"] / max(qa[q]["min"], 1e-9)):
    r = qb[q]["min"] / max(qa[q]["min"], 1e-9)
    if abs(r - 1) >= thr:
        # VERDICT r10 #6: spread = median/min per side; a mover whose
        # either-side spread exceeds 2 is host-noise-dominated and is
        # EXCLUDED from the adjudication list (reported separately)
        # pre-r11 files have neither 'spread' nor 'median': fall back
        # to min (spread 1.0) so old artifacts still diff
        sa = qa[q].get("spread") or (qa[q].get("median", qa[q]["min"]) / max(qa[q]["min"], 1e-9))
        sb = qb[q].get("spread") or (qb[q].get("median", qb[q]["min"]) / max(qb[q]["min"], 1e-9))
        if max(sa, sb) > 2:
            noisy.append((q, r, sa, sb))
            continue
        print(f"{q:36s} {qa[q]['min']:7.3f} -> {qb[q]['min']:7.3f}  x{r:.2f}")
for q, r, sa, sb in noisy:
    print(f"{q:36s} x{r:.2f}  EXCLUDED (spread {sa:.2f}/{sb:.2f} > 2)")
only_b = sorted(set(qb) - set(qa))
if only_b:
    print("new:", ", ".join(only_b))
