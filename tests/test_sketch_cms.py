"""Count-Min sketch invariants (operators/sketch.py cms_*):
overestimate-only errors, exact cell-wise mergeability, bounded state.
The cross-engine replay itself is the oracle-parity query
sketch-cms-heavy."""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.operators.sketch import (
    cms_estimate,
    cms_merge,
    cms_sketch,
)


def _freqs(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "k string")


def test_estimate_never_underestimates(spark):
    # skewed stream with forced collisions: width 8 << 40 distinct keys
    rows = [f"key{i}" for i in range(40) for _ in range(i % 5 + 1)]
    df = _freqs(spark, rows)
    sk = cms_sketch(df, "k", depth=4, width=8)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(exact.select("k"), "k", sk, depth=4, width=8)
    joined = est.join(exact, "k").collect()
    assert joined and all(r["est"] >= r["n"] for r in joined)


def test_no_collision_means_exact(spark):
    # 3 keys in 1024 buckets x 4 depths: min over depths collides with
    # nothing, so every estimate is the exact count
    df = _freqs(spark, ["a"] * 5 + ["b"] * 3 + ["c"])
    sk = cms_sketch(df, "k")
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(df.select("k").distinct(), "k", sk).collect()
    }
    assert est == {"a": 5, "b": 3, "c": 1}


def test_merge_equals_single_build(spark):
    rows = [f"w{i % 7}" for i in range(100)]
    df = _freqs(spark, rows).withColumn("part", F.monotonically_increasing_id() % 2)
    whole = cms_sketch(df, "k", depth=2, width=16)
    merged = cms_merge(
        cms_sketch(df.where(F.col("part") == 0), "k", depth=2, width=16),
        cms_sketch(df.where(F.col("part") == 1), "k", depth=2, width=16),
    )
    a = {(r["depth"], r["bucket"]): r["c"] for r in whole.collect()}
    b = {(r["depth"], r["bucket"]): r["c"] for r in merged.collect()}
    assert a == b


def test_sketch_state_is_bounded(spark):
    # 10_000 distinct keys, d=4 w=32: sketch table <= 128 rows no matter
    # the cardinality — the whole point vs a groupBy-per-key
    df = spark.range(10_000).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    sk = cms_sketch(df, "k", depth=4, width=32)
    assert sk.count() <= 4 * 32


def test_nulls_are_skipped(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    sk = cms_sketch(df, "k", depth=2, width=16)
    total = sk.where(F.col("depth") == 0).agg(F.sum("c")).collect()[0][0]
    assert total == 2  # the NULL row contributes to no cell


def test_stream_cms_merge_equals_batch_sketch(spark, tmp_path):
    """Two micro-batches merged through the streaming leg must equal
    the one-shot batch sketch of all rows, and a replayed batch id must
    be skipped (exactly-once state)."""
    import os

    from genpipe_spark.streaming.ingest import stream_cms_merge

    rows = [(f"k{i % 9}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    src = str(tmp_path / "src")
    # two files -> with maxFilesPerTrigger=1, two micro-batches
    df.where(F.monotonically_increasing_id() % 2 == 0).write.parquet(src + "/a.parquet")
    df.where(F.monotonically_increasing_id() % 2 == 1).write.parquet(src + "/b.parquet")
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    state = str(tmp_path / "state")
    q = stream_cms_merge(
        stream, "k", state, str(tmp_path / "ckpt"), depth=2, width=16
    )
    q.awaitTermination(120)
    cur = open(os.path.join(state, "CURRENT")).read().strip()
    streamed = {
        (r["depth"], r["bucket"]): r["c"]
        for r in spark.read.parquet(os.path.join(state, cur)).collect()
    }
    whole = {
        (r["depth"], r["bucket"]): r["c"]
        for r in cms_sketch(df, "k", depth=2, width=16).collect()
    }
    assert streamed == whole


def test_heavy_hitters_threshold_and_totals(spark):
    from genpipe_spark.operators.sketch import cms_heavy_hitters

    # 'hot' is 50% of the stream, everything else <= 5%
    rows = ["hot"] * 100 + [f"cold{i}" for i in range(100)]
    df = _freqs(spark, rows)
    got = {r["key"]: (r["est"], r["n_total"]) for r in
           cms_heavy_hitters(df, "k", threshold_bp=2000).collect()}
    assert set(got) == {"hot"}
    est, n = got["hot"]
    assert n == 200 and est >= 100  # CMS never underestimates
