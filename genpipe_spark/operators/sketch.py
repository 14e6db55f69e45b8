"""Distinct-count sketching: K-Minimum-Values (KMV / bottom-k).

Why KMV instead of HyperLogLog here: Spark's ``approx_count_distinct``
(HLL++) has implementation-defined registers — not reproducible across
engines — while the KMV estimator is a pure function of the k smallest
DISTINCT hash values, so with the repo's portable 31-bit polynomial hash
the whole sketch is bit-deterministic and an ANSI-SQL oracle can replay
it exactly (ORDER BY hash LIMIT k). Estimator: (k-1) / (h_k / M) with
h_k the k-th smallest distinct hash over hash space [0, M).

Scale shape: one hash projection, one ``distinct`` (map-side partial),
one TakeOrderedAndProject (per-partition bottom-k heaps merged on one
reducer — k values, not rows). Sketches are MERGEABLE: union two
bottom-k arrays, re-sort, keep k — the basis for per-partition /
per-day rollups without rescanning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genpipe_spark.operators.dedup import M31, _word_hash

# bijective multiplicative scramble (mod prime): the raw polynomial char
# fold clusters for similar strings (shared prefixes / sequential
# suffixes), which biases the bottom-of-range order statistics KMV relies
# on; one multiply spreads consecutive values across the full space
_SCRAMBLE = 2654435761 % M31


def kmv_sketch(df: DataFrame, col: str | Column, k: int = 64) -> DataFrame:
    """Bottom-k sketch of ``col``'s distinct values: one row with the
    sorted array of the k smallest distinct hashes (fewer when the true
    cardinality is below k)."""
    c = F.col(col) if isinstance(col, str) else col
    hashes = df.select(
        ((_word_hash(c) * F.lit(_SCRAMBLE)) % F.lit(M31)).alias("h")
    ).distinct()
    bottom = hashes.orderBy("h").limit(k)
    return bottom.agg(F.array_sort(F.collect_list("h")).alias("mins"))


def kmv_merge(a: Column, b: Column, k: int) -> Column:
    """Merge two bottom-k arrays into one (union → sort → first k) —
    associative/commutative, so partition- or day-level sketches roll up."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_estimate(mins: Column, k: int) -> Column:
    """Distinct-count estimate from a bottom-k array: exact count when
    fewer than k hashes exist, else (k-1) * M / h_k, floored to a long."""
    n = F.size(mins)
    h_k = F.element_at(mins, k)
    return F.when(n < k, n.cast("long")).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(float(M31)) / h_k).cast("long")
    )
