#!/usr/bin/env python
"""Scale a driver testdata dir N-fold for scale-up benching (SCALE.md).

Replicates each table N times with per-replica KEY OFFSETS so the scaled
dataset keeps the source's join fan-out and per-key densities — the way
TPC-H itself scales (more orders/customers, same lines-per-order), not
"same keys, N-fold hotter" (which would measure skew, not scale):

  - customer/orders/lineitem: orderkey and custkey shift per replica, so
    joins match only within a replica and group sizes are unchanged;
  - events: event_id and user_id shift (more users, same per-user rate);
  - documents: doc_id shifts and every WORD gets a per-replica suffix —
    intra-replica duplicate structure (shingle sets, Jaccard values) is
    preserved exactly while every shingle becomes replica-local, so the
    DEDUP workload scales like a real corpus with a constant dup-rate.
    (A first attempt used a 3-char text prefix: that only perturbs k-1
    shingles, cross-replica copies stayed Jaccard≈0.95 pairs, duplicate
    clusters grew ~replica-fold, and dedup-ngram-jaccard measured 23x
    for 10x data — super-linear OUTPUT, not operator cost. Lesson
    recorded in SCALE.md.);
  - embeddings: vec_id shifts (ANN corpus grows; the vec_id<8 query set
    stays 8 vectors — top-k over a bigger corpus);
  - region/nation/part/supplier: copied as-is (bounded dims; no
    headline query joins them at scale).

Usage: python scripts/make_scaled_sf.py [SRC] [DST] [N]
Defaults: /root/testdata/sf0.1 -> .localdata/sf1 (repo root), N=10.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

OFFSET_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["region", "nation", "part", "supplier"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else str(
        Path(__file__).resolve().parent.parent / ".localdata" / "sf1"
    )
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from genpipe_spark.session import get_spark
    from genpipe_spark.tables import load

    spark = get_spark("make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")
    Path(dst).mkdir(parents=True, exist_ok=True)

    for name in COPY_TABLES:
        load(spark, src, name).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"copied {name}")

    for name, keys in OFFSET_COLS.items():
        base = load(spark, src, name)
        # one offset unit per key column = its span, so replicas never
        # collide: key' = key + i * (max+1)
        spans = base.agg(
            *[(F.max(k) + 1).alias(k) for k in keys]
        ).collect()[0].asDict()
        reps = []
        for i in range(n):
            r = base
            for k in keys:
                r = r.withColumn(k, (F.col(k) + F.lit(i * spans[k])).cast(base.schema[k].dataType))
            if name == "documents":
                r = r.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"_r{i}")),
                        ),
                        " ",
                    ),
                )
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        cnt = spark.read.parquet(f"{dst}/{name}.parquet").count()
        print(f"scaled {name}: {cnt} rows ({n}x)")

    spark.stop()


if __name__ == "__main__":
    main()
