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
