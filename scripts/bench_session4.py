"""Scale curves for the round-7 session-4 operators: min-of-3 at
sf0.1 and sf1 (10x). Usage:
python scripts/bench_session4.py [SF_DIR ...]
"""
import sys
import time

from genpipe_spark import registry
from genpipe_spark.session import get_spark

registry.load_all_query_modules()
QUERIES = [
    "stateful-capped-sum",
    "stateful-capped-sum-global",
    "timeseries-ewma",
    "survival-kaplan-meier",
    "alloc-fifo-lots",
    "alloc-largest-remainder",
    "dedup-jaccard-prefix",
    "join-cidr-lookup",
    "agg-grouping-sets",
]
sfs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
spark = get_spark("bench-s4", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
for sf in sfs:
    for name in QUERIES:
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            registry.QUERIES[name](spark, sf).count()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        print(f"{sf.rstrip('/').rsplit('/', 1)[-1]} {name}: {best:.3f}s",
              flush=True)
spark.stop()
