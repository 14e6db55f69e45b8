"""Explicit Bloom-filter build/probe — compact semi-join pruning.

The 100 TB pattern this encodes: to prune a huge probe table against a
large-but-filterable build side, don't ship the key SET (unbounded);
ship a Bloom filter whose size is FIXED by construction (m bits chosen
up front), then drop probe rows whose k bit positions aren't all set.
False positives only (they just skip the pruning win and get resolved
by the real join); zero false negatives. Spark's AQE injects runtime
bloom filters for exactly this reason (tests/test_plan_audit asserts
that path) — this module is the explicit, engine-replayable form for
when the pruning must cross jobs (build once, probe in many pipelines).

Portability: bit positions come from the repo's M31 affine hash family
(no xxhash), words are 32-bit masks packed in longs (bit 31 max — no
signed-overflow edge in either engine), and the filter itself is a
DataFrame of (word_idx, word) rows — mergeable with bit_or, persistable
as a stage table, and broadcast-able by construction (m/32 rows,
independent of data size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genpipe_spark.operators.dedup import M31

# affine hash family seeds (same style as minhash_signature's)
_A = [1103515245, 69069, 1664525]
_B = [12345, 362437, 1013904223]

def _pow2_32() -> Column:
    return F.array(*[F.lit(1 << b).cast("long") for b in range(32)])


def _positions(key: Column, m_bits: int, k_hashes: int) -> Column:
    """array<struct<word_idx,mask>> of the k bit positions for a key."""
    pow2 = _pow2_32()
    # reduce the key into [0, M31) FIRST (repo convention, dedup.py):
    # a raw bigint surrogate key would overflow int64 on the multiply,
    # and a negative key would emit negative bit positions
    k_red = F.pmod(key.cast("long"), F.lit(M31))
    entries = []
    for i in range(k_hashes):
        h = (k_red * _A[i % len(_A)] + _B[i % len(_B)]) % F.lit(M31) % F.lit(
            m_bits
        )
        entries.append(
            F.struct(
                F.floor(h / 32).cast("long").alias("word_idx"),
                F.element_at(pow2, (h % 32 + 1).cast("int")).alias("mask"),
            )
        )
    return F.array(*entries)


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Build the filter: (word_idx, word) rows, word = bit_or of the
    32-bit masks landing in it. One explode (k rows per distinct key)
    + one groupBy(word_idx) — map-side combinable; output size is
    <= m_bits/32 rows regardless of input size."""
    if k_hashes > len(_A):
        raise ValueError(f"k_hashes <= {len(_A)} (seeded family size)")
    keys = df.select(F.col(key_col).alias("__k")).distinct()
    pos = keys.select(
        F.explode(_positions(F.col("__k"), m_bits, k_hashes)).alias("p")
    )
    return pos.groupBy(F.col("p.word_idx").alias("word_idx")).agg(
        F.bit_or("p.mask").alias("word")
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
    keep: bool = True,
) -> DataFrame:
    """Filter ``df`` to rows whose key MIGHT be in the built set
    (``keep=False`` inverts: definitely-absent rows). The bloom side is
    broadcast — justified as bounded-by-construction (<= m_bits/32
    rows, a constant). DISTINCT keys are probed (k explode rows per
    distinct key, not per input row — duplicate-heavy probe tables pay
    for their key cardinality, not their row count), then the passing
    key set filters ``df`` back with a left-semi join.

    NULL keys: a NULL key hashes to NULL positions and a semi-join on
    NULL matches nothing, so NULL-key rows are dropped REGARDLESS of
    ``keep`` — a Bloom filter has no membership answer for NULL (the
    same contract as SQL ``IN``). Route NULLs around the probe
    explicitly if they must survive (ADVICE r5, documented).
    """
    pos = (
        df.select(F.col(key_col).alias("__k"))
        .distinct()
        .select(
            "__k",
            F.explode(_positions(F.col("__k"), m_bits, k_hashes)).alias("p"),
        )
        .select(
            "__k", F.col("p.word_idx").alias("word_idx"), F.col("p.mask").alias("mask")
        )
    )
    joined = pos.join(F.broadcast(bloom), "word_idx", "left")
    hit = (F.col("word").isNotNull()) & (
        F.col("word").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    verdict = joined.groupBy("__k").agg(
        F.min(hit.cast("int")).alias("__all_hit")
    )
    passing = verdict.where(F.col("__all_hit") == (1 if keep else 0)).select("__k")
    return df.join(
        passing.withColumnRenamed("__k", key_col), key_col, "left_semi"
    )
