"""Min-of-3 timing: prefix-filtered exact Jaccard vs the full
inverted-index form (cap-free) vs the lossy doc-freq-capped form, at a
given fixture. Usage: python scripts/bench_prefix_filter.py [SF_DIR].
"""
import sys
import time

from pyspark.sql import functions as F

from genpipe_spark.operators import dedup as D
from genpipe_spark.queries.common import t, widen
from genpipe_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("bench-prefix", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = widen(t(spark, SF, "documents"))
docs.count()  # warm the scan

FORMS = {
    "exact-inverted": lambda: D.ngram_jaccard_pairs(docs, threshold=0.4),
    "exact-prefix": lambda: D.jaccard_prefix_filter_pairs(docs, threshold=0.4),
    "capped-df50": lambda: D.ngram_jaccard_pairs(
        docs, threshold=0.4, max_doc_freq=50
    ),
}
for name, fn in FORMS.items():
    best, rows = None, None
    for _ in range(3):
        t0 = time.monotonic()
        rows = fn().count()
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    print(f"{name}: {best:.3f}s  rows={rows}", flush=True)

# adversarial shape: shared boilerplate makes the inverted index
# quadratic; the prefix filter's df-ordering demotes the hot shingles
boiler = " ".join(f"common{i}" for i in range(30))
docs_adv = spark.createDataFrame(
    [(i, boiler + " " + " ".join(f"u{i}w{j}" for j in range(5)))
     for i in range(2000)],
    "doc_id: long, text: string",
)
docs_adv = docs_adv.localCheckpoint()
docs_adv.count()
for name, fn in {
    "adv-exact-inverted": lambda: D.ngram_jaccard_pairs(docs_adv, threshold=0.8),
    "adv-exact-prefix": lambda: D.jaccard_prefix_filter_pairs(docs_adv, threshold=0.8),
}.items():
    best, rows = None, None
    for _ in range(2):
        t0 = time.monotonic()
        rows = fn().count()
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    print(f"{name}: {best:.3f}s  rows={rows}")
spark.stop()
