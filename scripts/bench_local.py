#!/usr/bin/env python
"""Write BENCH_LOCAL_r{N}.json over the full HEADLINE suite with
per-query min, median, and SPREAD = median/min (VERDICT r10 #6: this
host scattered one untouched query 1.45-5.72 s within five consecutive
same-process runs, so cross-round adjudication must auto-exclude
movers whose spread shows the host was noisy on them).

Usage: PYTHONPATH=. python scripts/bench_local.py ROUND [SF_DIR] [RUNS]
Writes BENCH_LOCAL_r{ROUND}.json at the repo root.
"""
import json
import statistics
import subprocess
import sys
import time

from genpipe_spark import registry
from genpipe_spark.session import get_spark

sys.path.insert(0, ".")
from bench import HEADLINE, SF_DIR as DEFAULT_SF  # noqa: E402

rnd = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_SF
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

registry.load_all_query_modules()
spark = get_spark("bench-local")
spark.sparkContext.setLogLevel("ERROR")


def mat(df):
    df.write.format("noop").mode("overwrite").save()


mat(registry.QUERIES["join-inner-equi"](spark, sf_dir))  # warm
out = {}
for name in HEADLINE:
    fn = registry.QUERIES.get(name)
    if fn is None:
        continue
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        mat(fn(spark, sf_dir))
        ts.append(time.perf_counter() - t0)
    mn, md = min(ts), statistics.median(ts)
    out[name] = {
        "min": round(mn, 3),
        "median": round(md, 3),
        "spread": round(md / mn, 2) if mn > 0 else None,
    }
    print(f"{name}: min {mn:.3f} median {md:.3f} spread {md/mn:.2f}",
          flush=True)
spark.stop()

commit = subprocess.run(
    ["git", "rev-parse", "HEAD"], capture_output=True, text=True
).stdout.strip()
payload = {
    "round": f"r{rnd}",
    "commit": commit,
    "sf": sf_dir,
    "min_total": round(sum(v["min"] for v in out.values()), 3),
    "median_total": round(sum(v["median"] for v in out.values()), 3),
    "queries": out,
}
path = f"BENCH_LOCAL_r{rnd}.json"
json.dump(payload, open(path, "w"), indent=1, sort_keys=True)
print(f"wrote {path}: min_total {payload['min_total']}"
      f" median_total {payload['median_total']}")
