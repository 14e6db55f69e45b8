#!/usr/bin/env python
"""Scale-probe bench: run the heaviest headline queries at an arbitrary
SF dir (made by scripts/make_scaled_sf.py) with min-of-N warm runs and
print one JSON line. Used for the 10x/100x scale-up evidence in
SCALE.md / BENCH_SF1.json — NOT the driver-facing bench (bench.py).

Usage: python scripts/bench_heavy.py [SF_DIR] [RUNS] [QUERY ...]
(QUERY names override the default HEAVY list.)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEAVY = [
    "flagship-variant-doc",
    "dedup-minhash-lsh",
    "dedup-ngram-jaccard",
    "text-metrics",
    "fn-parse-suite",
    "fn-alt-decompose",
    "sketch-kmv-distinct",
    # round-4 additions — scale-validated the same way
    "text-bm25",
    "text-unigram-logprob",
    "rollup-gapfill",
    "dedup-incremental",
    "profile-table",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or HEAVY

    from genpipe_spark import registry
    from genpipe_spark.session import get_spark

    registry.load_all_query_modules()
    spark = get_spark("genpipe-bench-heavy")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            start = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "heavy-suite",
                "sf_dir": sf_dir,
                "runs": runs,
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
