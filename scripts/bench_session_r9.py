"""Scale curves for the round-9 additions: min-of-3, noop-materialized.
Usage: PYTHONPATH=. python scripts/bench_session_r9.py [SF_DIR ...]
"""
import sys
import time

from genpipe_spark import registry
from genpipe_spark.session import get_spark

registry.load_all_query_modules()
QUERIES = [
    "agg-mann-kendall-theil-sen",   # hot/cold routed r9
    "dedup-exact-substr",
    "ab-test-bh-fdr",
    "ab-test-msprt",
    "text-gopher-rules",
    "text-perplexity-buckets",
    "search-rrf-fusion",
    "text-bpe-train",
    "mix-epoch-shuffle",
    "mix-dsir-select",
    "profile-diff-approx",          # certified ("both" mode, split aggs)
    "graph-label-propagation",      # tiebreak rewrite r9
    "ab-test-srm",                  # decimal widening r9
]
# streams (stream-zscore / group-sample / sessionize) are curve-measured
# at sf0.1/sf1 only: their construction writes the whole source through
# coalesce(1), which at sf10 measures the fixture write, not the operator
sfs = sys.argv[1:] or ["/root/testdata/sf0.1", ".localdata/sf1"]
spark = get_spark("bench-r9", cpus=32, shuffle_partitions=32)
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
