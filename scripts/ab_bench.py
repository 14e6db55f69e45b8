#!/usr/bin/env python
"""A/B micro-bench: time a few registered queries from ONE checkout in a
fresh JVM — min-of-N noop-materialized at sf0.1, the bench.py protocol.

Usage: python scripts/ab_bench.py <repo_root> <reps> <query> [query ...]
Prints one JSON line {"root": ..., "mins": {q: sec}}.

Round-8 use: alternate runs against HEAD and the .ab_r6 worktree
(round-6 HEAD) to attribute the r6->r7 slowdowns VERDICT r7 confirmed
(flagship-variant-doc, sketch-cms-heavy, graph-triangle-count) to code
vs host drift — same box, interleaved A/B/A/B so slow-host windows hit
both arms equally."""
import json
import os
import sys
import time
from pathlib import Path

root, reps, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
sys.path.insert(0, str(Path(root).resolve()))

from genpipe_spark import registry  # noqa: E402
from genpipe_spark.session import get_spark  # noqa: E402

registry.load_all_query_modules()
spark = get_spark("ab-bench")
spark.sparkContext.setLogLevel("ERROR")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def mat(df):
    df.write.format("noop").mode("overwrite").save()

mat(registry.QUERIES["join-inner-equi"](spark, SF))  # warm JVM
mins = {}
for n in names:
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mat(registry.QUERIES[n](spark, SF))
        runs.append(time.perf_counter() - t0)
    mins[n] = round(min(runs), 3)
print(json.dumps({"root": root, "mins": mins}))
spark.stop()
