"""Scale curves for the round-7 session-5 operators: min-of-3,
noop-materialized. Usage:
PYTHONPATH=. python scripts/bench_session5.py [SF_DIR ...]
"""
import sys
import time

from genpipe_spark import registry
from genpipe_spark.session import get_spark

registry.load_all_query_modules()
QUERIES = [
    "timeseries-drawdown",
    "timeseries-cusum",
    "rollup-interpolate-linear",
    "attribution-time-decay",
    "timeseries-holt-winters",
    "rollup-lttb-downsample",
    "join-point-in-polygon",
    "window-rolling-distinct",
    "tpch-q9",
    "tpch-q2",
    "embedding-top-direction",
    "text-hash-features",
    "rfm-segmentation",
    "ltv-cohort-revenue",
]
sfs = sys.argv[1:] or ["/root/testdata/sf0.1", ".localdata/sf1"]
spark = get_spark("bench-s5", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def mat(df):
    df.write.format("noop").mode("overwrite").save()


for sf in sfs:
    for name in QUERIES:
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            mat(registry.QUERIES[name](spark, sf))
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        print(f"{sf.rstrip('/').rsplit('/', 1)[-1]} {name}: {best:.3f}s",
              flush=True)
spark.stop()
