"""Bloom filter semantics: zero false negatives (the contract), probe
inversion, and size boundedness."""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.operators.bloom import bloom_build, bloom_probe


def test_bloom_no_false_negatives(spark):
    built = spark.range(0, 500).select((F.col("id") * 7 + 1).alias("k"))
    bloom = bloom_build(built, "k")
    probe = spark.range(0, 4000).select(F.col("id").alias("k"))
    passed = {r["k"] for r in bloom_probe(probe, "k", bloom).collect()}
    members = {r["k"] for r in built.collect()}
    # every true member MUST pass (bloom contract); extras are the
    # documented false positives
    assert members <= passed


def test_bloom_probe_inverted_drops_all_members(spark):
    built = spark.range(0, 200).select(F.col("id").alias("k"))
    bloom = bloom_build(built, "k")
    absent = bloom_probe(
        spark.range(0, 1000).select(F.col("id").alias("k")), "k", bloom, keep=False
    )
    # keep=False returns only definitely-absent keys: no member survives
    assert absent.join(built, "k", "left_semi").count() == 0


def test_bloom_size_bounded_by_construction(spark):
    m_bits = 1 << 12
    big = spark.range(0, 20_000).select(F.col("id").alias("k"))
    bloom = bloom_build(big, "k", m_bits=m_bits)
    assert bloom.count() <= m_bits // 32


def test_bloom_rejects_oversized_hash_family(spark):
    import pytest

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(df, "k", k_hashes=9)


def test_bloom_handles_huge_and_negative_keys(spark):
    # regression: raw bigint surrogate keys overflowed the affine
    # multiply, and negative keys produced negative bit positions —
    # keys are now reduced mod M31 first
    keys = [(9_000_000_000,), (-5,), (-9_000_000_000,), (7,)]
    df = spark.createDataFrame(keys, ["k"])
    bloom = bloom_build(df, "k")
    passed = {r["k"] for r in bloom_probe(df, "k", bloom).collect()}
    assert passed == {k for (k,) in keys}
