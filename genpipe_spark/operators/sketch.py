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


# --------------------------------------------------------------- Count-Min
#
# Frequency sketching (Cormode-Muthukrishnan CM sketch): d independent
# hash rows of w counters; est(key) = min_i counter[i][h_i(key)] — an
# overestimate by at most eps*N with prob 1-delta (w = e/eps, d =
# ln(1/delta)). The at-scale use is hot-key / heavy-hitter detection
# (feeds the salting decision in operators/skew.py) without a
# per-distinct-key groupBy state: the aggregation state is d*w counters
# REGARDLESS of key cardinality.
#
# Same portability rule as KMV: pairwise hashes are (h31(key)*A_i + B_i)
# mod M31 mod w over the repo's polynomial char fold — every product
# < 2^62, so an ANSI-SQL oracle replays the sketch bit-identically.
#
# Scale shape: the build is explode(xd) -> groupBy(depth, bucket), and
# Spark's partial hash aggregation collapses each task's output to at
# most d*w rows before the shuffle — the map-side combine IS the
# classic per-node CM sketch, and the one reducer-side merge is the
# sketch's cell-wise sum. Sketches are MERGEABLE by construction:
# union two sketch tables and sum counts by (depth, bucket).

# depth-indexed pairwise-hash coefficients (arbitrary primes < 2^31)
CMS_A = (1_000_003, 1_000_033, 1_000_037, 1_000_039, 1_000_081, 1_000_099)
CMS_B = (12_289, 24_593, 49_157, 98_317, 196_613, 393_241)


def _cms_bucket(h: Column, depth: int, width: int) -> Column:
    return ((h * F.lit(CMS_A[depth]) + F.lit(CMS_B[depth])) % F.lit(M31)) % F.lit(
        width
    )


def cms_sketch(
    df: DataFrame, col: str | Column, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a CM sketch of ``col``: rows ``depth, bucket, c`` (at most
    d*w of them; absent cells are implicit zeros). NULL keys are skipped
    (they are a completeness problem — operators/validate.not_null —
    not a frequency one)."""
    if depth > len(CMS_A):
        raise ValueError(f"depth > {len(CMS_A)} not supported")
    c = F.col(col) if isinstance(col, str) else col
    h = _word_hash(c)
    cells = df.where(c.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        _cms_bucket(h, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("e")
    )
    return cells.select("e.*").groupBy("depth", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches built with the same (depth, width) —
    associative/commutative, so per-partition / per-day sketches roll up
    without rescanning."""
    return (
        a.unionByName(b)
        .groupBy("depth", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    keys: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int = 4,
    width: int = 1024,
    alias: str = "est",
) -> DataFrame:
    """Point-query the sketch for each row of ``keys``: appends ``alias``
    = min over depths of the matching counter (0 when a key hashes only
    to empty cells). The join is (depth, bucket) equi-join against a
    frame bounded by d*w rows — AQE broadcasts it on its own, no forced
    hint needed."""
    h = _word_hash(F.col(key_col))
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        _cms_bucket(h, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("e"),
    ).select(key_col, "e.*")
    joined = probes.join(sketch, ["depth", "bucket"], "left").withColumn(
        "c", F.coalesce(F.col("c"), F.lit(0))
    )
    return joined.groupBy(key_col).agg(F.min("c").cast("long").alias(alias))


def cms_heavy_hitters(
    df: DataFrame,
    col: str | Column,
    threshold_bp: int = 100,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Keys whose CM-estimated frequency is ≥ threshold_bp/10000 of the
    total row count (default 1%): ``key, est, n_total``. Candidate keys
    are the column's distinct values — appropriate when the key domain
    is bounded (event types, languages, sources); for unbounded domains
    feed an explicit candidate frame to cms_estimate instead. The
    threshold compares in integer basis points (est*10000 >= bp*n) —
    no float wobble, oracle-replayable."""
    name = col if isinstance(col, str) else "key"
    c = F.col(col) if isinstance(col, str) else col.alias(name)
    sketch = cms_sketch(df, col, depth, width)
    keyed = df.select(c).where(F.col(name).isNotNull())
    candidates = keyed.distinct()
    est = cms_estimate(candidates, name, sketch, depth, width)
    # 1-row total attached lazily (crossJoin of a broadcast single-row agg
    # — the repo's standard scalar-attach shape, see text.bm25_score)
    totals = keyed.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        est.crossJoin(F.broadcast(totals))
        .where(F.col("est") * 10_000 >= F.lit(threshold_bp) * F.col("n_total"))
        .select(F.col(name).alias("key"), "est", F.col("n_total").cast("long").alias("n_total"))
    )


def sample_quantile_sketch(
    df: DataFrame, value_col: str | Column, rowkey_col: str | Column,
    k: int = 2048,
) -> DataFrame:
    """Mergeable quantile sketch via a DETERMINISTIC bottom-k hash
    sample — the KMV doctrine applied to quantiles.

    Why not KLL/GK: their compaction sequences depend on arrival order
    (not reproducible across engines, barely across runs), while the
    bottom-k rows by a scrambled multiplicative hash of the row key
    are a pure function of the DATA — a uniform random sample the
    oracle replays exactly (``ORDER BY h, tb, v LIMIT k``; ``v`` joins
    the ordering because real fixtures carry DUPLICATE row keys — two
    rows sharing (h, tb) would otherwise tie-break arbitrarily, and
    with v included any remaining tie is between value-identical rows,
    so the sampled v-multiset is invariant). Rank error:
    by DKW, the sample empirical CDF is within
    eps = sqrt(ln(2/delta)/(2k)) of the true CDF whp — k=2048 gives
    eps ~ 6% at delta ~ 1e-6; k=65536 gives ~1%. Space O(k) vs KLL's
    O((1/eps) log^2 log(1/delta)) — worse asymptotically, but at any
    practical eps the sample fits one executor page and buys exact
    cross-engine replayability.

    Scale: ONE TakeOrderedAndProject pass (per-partition bottom-k
    heaps, k rows to one reducer — k values, not data). Mergeable:
    union two h-sorted arrays, keep the k smallest by (h, tb) —
    associative/commutative, so per-partition / per-day sketches roll
    up without rescanning (see ``sample_quantile_merge``).

    Returns ONE row: ``hs`` (array<struct<h,tb,v>> sorted by (h, tb),
    the merge representation) and ``vs`` (value-sorted array, the
    quantile-lookup representation), plus ``ke`` = min(k, n).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    tb = F.col(rowkey_col) if isinstance(rowkey_col, str) else rowkey_col
    h = ((tb % F.lit(M31)) * F.lit(_SCRAMBLE)) % F.lit(M31)
    bottom = (
        df.select(h.alias("h"), tb.alias("tb"), v.alias("v"))
        .orderBy("h", "tb", "v")
        .limit(k)
    )
    return bottom.agg(
        F.array_sort(F.collect_list(F.struct("h", "tb", "v"))).alias("hs"),
        F.array_sort(F.collect_list("v")).alias("vs"),
        F.count(F.lit(1)).cast("long").alias("ke"),
    )


def sample_quantile_merge(a: Column, b: Column, k: int) -> Column:
    """Merge two ``hs`` arrays: union, re-sort by (h, tb) (struct sort
    is lexicographic by field order in both engines), keep k. The
    merged sketch of a disjoint split equals the global sketch
    EXACTLY — the in-query mergeability proof."""
    return F.slice(F.array_sort(F.concat(a, b)), 1, k)


def sample_quantile_estimate(vs: Column, ke: Column, q_pct: Column) -> Column:
    """Nearest-rank estimate from the value-sorted sample: the
    ceil(q*ke)-th smallest sample value (1-based, exact integer ceil
    via (q*ke + 99) div 100)."""
    r = F.greatest(
        F.lit(1).cast("long"), ((q_pct * ke + 99) - (q_pct * ke + 99) % 100) / 100
    ).cast("long")
    return F.element_at(vs, r.cast("int"))
