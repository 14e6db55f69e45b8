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

# column -> logical key; the offset unit for a logical key comes from
# its OWNING table's span (custkey from customer, orderkey from orders),
# and every referencing column reuses that same unit. Using each table's
# own column span instead (the first version) broke FK alignment
# whenever max(fk) != max(pk) — e.g. customers without orders — so
# replicas i>=1 joined to wrong/missing dimension rows.
OFFSET_COLS = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
# logical key -> (owning table, primary-key column)
KEY_OWNERS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
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

    # one offset unit per LOGICAL key = the owning table's span, so
    # replicas never collide and FK->PK alignment is preserved:
    # key' = key + i * (max_over_owner + 1)
    key_spans = {
        lk: load(spark, src, tbl).agg((F.max(col) + 1).alias("s")).collect()[0]["s"]
        for lk, (tbl, col) in KEY_OWNERS.items()
    }
    for name, keys in OFFSET_COLS.items():
        base = load(spark, src, name)
        reps = []
        for i in range(n):
            r = base
            for k, lk in keys.items():
                r = r.withColumn(k, (F.col(k) + F.lit(i * key_spans[lk])).cast(base.schema[k].dataType))
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
