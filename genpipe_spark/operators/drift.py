"""Distribution-drift detection between corpus snapshots: fixed-bin
histograms + Population Stability Index (PSI).

operators/profile.py answers "what does this snapshot look like";
this module answers "did the distribution MOVE since the last one" —
the gate a training pipeline runs before mixing a new crawl into the
blend. PSI = Σ_bins (p_cur - p_ref) · ln(p_cur / p_ref); the usual
operating points: <0.1 stable, 0.1–0.25 drifting, >0.25 action.

Scale shape: each snapshot collapses to ≤ nbins rows in ONE
map-side-combinable agg (the bin id is a pure projection, so the
partial hash agg holds at most nbins cells per task); the bin join and
the PSI sum are over ≤ nbins rows. Nothing here grows with the data.

Determinism: bin edges are CALLER-FIXED constants (deterministic by
construction — never derived from data min/max, which would make the
result depend on outliers and cost an extra pass); per-bin ln terms are
quantized nano→micro exactly like text.unigram_logprob_score (kills the
1-ulp libm divergence between engines), and the PSI total is an exact
bigint sum of micro-units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_fixed(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Fixed-range histogram: rows ``bin, n`` (empty bins absent — the
    consumer zero-fills, see psi_drift). NULLs and NaNs are dropped
    (floor(NaN) would otherwise clamp-count NaN mass into bin 0 AND
    break the DuckDB replay); values outside [lo, hi) clamp into the
    edge bins, so the histogram is a total function of the remaining
    data (out-of-range mass is visible in bins 0 / nbins-1 instead of
    silently vanishing)."""
    if not (hi > lo and nbins >= 2):
        raise ValueError("histogram_fixed: need hi > lo and nbins >= 2")
    width = (hi - lo) / nbins
    c = F.col(col).cast("double")
    b = F.floor((c - F.lit(lo)) / F.lit(width)).cast("int")
    b = F.least(F.lit(nbins - 1), F.greatest(F.lit(0), b))
    return (
        df.where(c.isNotNull() & ~F.isnan(c))
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 20,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-bin drift table between two snapshots of ``col``:
    ``bin, n_ref, n_cur, term_micro, psi_micro`` — term_micro is the
    bin's PSI contribution in integer micro-units, psi_micro the total
    (repeated on every row so the one output frame carries both the
    diagnosis and the headline number; psi = psi_micro / 1e6).
    Zero-count bins are smoothed to proportion ``eps`` (the standard
    PSI convention — a bin appearing from nothing is strong drift, not
    a division error)."""
    h_ref = histogram_fixed(ref, col, lo, hi, nbins).withColumnRenamed("n", "n_ref")
    h_cur = histogram_fixed(cur, col, lo, hi, nbins).withColumnRenamed("n", "n_cur")
    spark = ref.sparkSession
    spine = spark.range(nbins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        spine.join(h_ref, "bin", "left")
        .join(h_cur, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = Window.partitionBy()
    p_ref = F.greatest(F.col("n_ref") / F.sum("n_ref").over(tot), F.lit(eps))
    p_cur = F.greatest(F.col("n_cur") / F.sum("n_cur").over(tot), F.lit(eps))
    # nano-round then floor to micro: same ulp-killing quantization as
    # text.unigram_logprob_score
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    term_micro = F.floor(F.round(term * 1e9) / 1000).cast("long")
    out = joined.select("bin", "n_ref", "n_cur", term_micro.alias("term_micro"))
    return out.withColumn("psi_micro", F.sum("term_micro").over(tot))


def ks_two_sample(
    df: DataFrame, value_col: str, in_a: "F.Column"
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic: the max gap
    between the two empirical CDFs — the nonparametric drift test that
    needs no binning choice (complements psi_drift's fixed bins).

    ``in_a`` is a boolean Column splitting rows into samples A / B.
    NULL values are dropped. Output is ONE row:
      n1, n2           — sample sizes,
      ks_num, ks_denom — D as the EXACT fraction
                         max|cdfA - cdfB| = ks_num / (n1*n2),
      ks_micro         — floor(1e6 * D), IEEE-pinned double fold of
                         the exact integers (identical across engines).

    Shape: one conditional agg collapses the data to DISTINCT metric
    values with (cA, cB) counts — map-side combinable, the only pass
    over the data. The cumulative window then runs over the REDUCED
    value table ordered by value. That table is bounded by the metric's
    value domain, not the row count (price cents, quantized scores);
    for genuinely unbounded/continuous domains, quantize first (the
    standard KS-monitor practice — any monotone quantization only
    tightens D estimates downward by at most one cell's mass). The
    exact-integer cross-products cum*n stay in int64 for
    n1*n2 < 2^63 (~3e9 rows per side)."""
    c = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("x"), in_a.cast("int").alias("fa"))
        .groupBy("x")
        .agg(
            F.sum("fa").alias("c1"),
            F.sum(F.lit(1) - F.col("fa")).alias("c2"),
        )
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = c.select(
        "x",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    n = c.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    d = cum.join(F.broadcast(n)).select(
        "n1",
        "n2",
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")).alias(
            "__d"
        ),
    )
    out = d.groupBy("n1", "n2").agg(F.max("__d").alias("ks_num"))
    return out.select(
        "n1",
        "n2",
        "ks_num",
        (F.col("n1") * F.col("n2")).alias("ks_denom"),
        F.floor(
            F.lit(1_000_000.0)
            * F.col("ks_num").cast("double")
            / (F.col("n1") * F.col("n2")).cast("double")
        )
        .cast("long")
        .alias("ks_micro"),
    )
