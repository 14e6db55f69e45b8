"""Scale curves for the round-9 LATE additions: min-of-3 (2 at sf10),
noop-materialized. Usage:
PYTHONPATH=. python scripts/bench_session_r9late.py [SF_DIR ...]
"""
import sys
import time

from genpipe_spark import registry
from genpipe_spark.session import get_spark

registry.load_all_query_modules()
QUERIES = [
    "changepoint-pelt",
    "sketch-sample-quantiles",
    "link-fellegi-sunter",
    "dedup-semantic",
    "ab-test-bootstrap",
    "search-mmr-rerank",
    "dedup-minhash-lsh",       # 96/24 banding (recall fix) — re-curved
    "dedup-incremental",       # 96/24
    # stream-dedup-incremental is curve-measured at sf0.1/sf1 only by
    # hand: its construction coalesce(1)-writes the whole source, which
    # at sf10 measures the fixture write, not the operator (the
    # bench_session_r9 stream caveat)
]
sfs = sys.argv[1:] or ["/root/testdata/sf0.1", ".localdata/sf1"]
spark = get_spark("bench-r9late", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def mat(df):
    df.write.format("noop").mode("overwrite").save()


for sf in sfs:
    runs = 2 if sf.endswith("sf10") else 3
    for name in QUERIES:
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            mat(registry.QUERIES[name](spark, sf))
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        print(f"{sf.rstrip('/').rsplit('/', 1)[-1]} {name}: {best:.3f}s",
              flush=True)
spark.stop()
