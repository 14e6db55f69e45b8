"""Time-series anomaly detection over keyed event streams: trailing
rolling z-score outlier flags and truncated-kernel EWMA smoothing.

Both are single-window computations: ONE hash shuffle on the series
key, shared by every window function (Catalyst plans one Window node
per identical spec). No joins, nothing broadcast, no state beyond the
bounded trailing frame — at 100 TB this is one exchange keyed on the
entity id, same skew story as any keyed shuffle.

Cross-engine determinism (FIXTURES.md rules): floats never appear.
Values are quantized to integer cents at entry; the z-score OUTLIER
DECISION is evaluated as an exact int64 inequality
((n*x - S)^2 * (n-1) > t^2 * n * (n*Q - S^2), i.e. z^2 > t^2 cleared
of divisions), and the EWMA uses alpha = 1/2 with weights 2^(16-j) —
exact powers of two in int64 — emitted as a `div` (integer-division)
micro-cents value. DuckDB replays the identical integer arithmetic, so
the driver hash matches bit-for-bit with zero libm involvement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _reject_collisions(df: DataFrame, cols: set[str], op: str) -> None:
    clash = cols & set(df.columns)
    if clash:
        raise ValueError(
            f"{op}: input columns collide with appended/internal names: "
            f"{sorted(clash)}"
        )


def rolling_zscore_flags(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_cents: Column,
    window_rows: int = 50,
    threshold: int = 3,
    min_obs: int = 5,
) -> DataFrame:
    """Flag points whose value deviates > ``threshold`` sample standard
    deviations from the TRAILING ``window_rows`` observations (current
    row excluded — the baseline never includes the point under test).

    Appends: n_win (trailing observations available), s_cents / q_cents2
    (their exact integer sum / sum-of-squares), is_anomaly (NULL until
    ``min_obs`` observations exist, then the exact integer verdict).

    The inequality is z^2 > t^2 with every division cleared:
      (n*x - S)^2 * (n-1)  >  t^2 * n * (n*Q - S^2)
    which stays within int64 for cents-scale values and row windows
    (|x| <= ~10^6 cents, n <= ~10^3). A zero-variance window flags any
    deviation (the mathematical limit of z -> inf).
    """
    _reject_collisions(
        df, {"n_win", "s_cents", "q_cents2", "is_anomaly", "__xc"},
        "rolling_zscore_flags",
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-window_rows, -1)
    )
    x = value_cents.cast("long")
    out = (
        df.withColumn("__xc", x)
        .withColumn("n_win", F.count("__xc").over(w))
        .withColumn("s_cents", F.coalesce(F.sum("__xc").over(w), F.lit(0)))
        .withColumn(
            "q_cents2",
            F.coalesce(F.sum(F.col("__xc") * F.col("__xc")).over(w), F.lit(0)),
        )
    )
    n, s, q = F.col("n_win"), F.col("s_cents"), F.col("q_cents2")
    dev2 = (n * F.col("__xc") - s) * (n * F.col("__xc") - s) * (n - 1)
    var_term = F.lit(threshold * threshold) * n * (n * q - s * s)
    verdict = F.when(n < min_obs, F.lit(None).cast("boolean")).otherwise(
        dev2 > var_term
    )
    return out.withColumn("is_anomaly", verdict).drop("__xc")


# EWMA kernel: alpha = 1/2, truncated at EWMA_LAGS trailing lags. The
# weight of lag j is 2^(EWMA_SHIFT - j) — exact in int64 — and the
# denominator over n available observations telescopes to
# 2^(EWMA_SHIFT+1) - 2^(EWMA_SHIFT - n + 1).
EWMA_LAGS = 16
EWMA_SHIFT = 16


def ewma_micro_cents(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_cents: Column,
    out_col: str = "ewma_micro_cents",
) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2, kernel
    truncated at 16 lags — the dropped tail weighs 2^-17 of the total,
    below cents resolution) appended as an exact micro-cents integer:
    (1e6 * sum(x_j * 2^(16-j))) div sum(2^(16-j)), j = lag.

    The trailing values ride ONE ordered collect_list window frame; the
    weighted fold is a higher-order aggregate over that bounded array
    (size <= 17) and the final scaling is int64 `div` — no doubles
    anywhere, so the emitted value is engine-portable."""
    _reject_collisions(
        df, {out_col, "__arr", "__num", "__den"}, "ewma_micro_cents"
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-EWMA_LAGS, 0)
    )
    arr = F.collect_list(value_cents.cast("long")).over(w)
    df = df.withColumn("__arr", arr)
    n = F.size(F.col("__arr"))
    idx = F.sequence(F.lit(1), n)  # 1-based, oldest -> newest in frame order
    # 2^k lookup (shiftleft takes only literal shift counts)
    pow2 = F.array(*[F.lit(1 << k).cast("long") for k in range(EWMA_SHIFT + 2)])
    weighted = F.zip_with(
        F.col("__arr"),
        idx,
        lambda x, i: x * F.element_at(pow2, (F.lit(EWMA_SHIFT) - (n - i)) + 1),
    )
    num = F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, v: acc + v)
    den = F.lit(1 << (EWMA_SHIFT + 1)).cast("long") - F.element_at(
        pow2, (F.lit(EWMA_SHIFT + 1) - n) + 1
    )
    return (
        df.withColumn("__num", num * F.lit(1_000_000))
        .withColumn("__den", den)
        .withColumn(out_col, F.expr("__num div __den"))
        .drop("__arr", "__num", "__den")
    )
