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


def pelt_segments(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    x_col: str,
    *,
    k_slack: int = 2,
    min_pen: int = 1,
    max_series: int = 200_000,
) -> DataFrame:
    """Optimal mean-shift segmentation per key — PELT (Killick et al.
    2012) over an exact-integer quantized L2 objective.

    Input is the ALREADY-AGGREGATED series: one row per (keys,
    ``order_col``) with an integer ``x_col`` (callers reduce raw events
    to a bounded grid — e.g. monthly counts — first; that aggregation
    is the distributed part, this operator segments the bounded
    residue). Per key, with prefix sums ``S``/``Q`` over the
    rank-ordered points:

        cost(s, t] = (Q_t - Q_s) - (S_t - S_s)^2 // (t - s)
        F(0) = -pen;  F(t) = min_{0<=s<t} F(s) + cost(s, t] + pen
        pen  = max(2 * (sse_total // n), min_pen)     # ~2*sigma^2

    i.e. segment SSE floor-quantized to int64 (cost in [SSE, SSE+1)),
    so the DP optimum, the smallest-s argmin tiebreak, and the
    backtracked boundaries are bit-identical in any engine that floors
    nonnegative integer division — no floats anywhere. PELT pruning
    drops s once ``F(s) + cost(s,t] > F(t) + k_slack``: with true SSE
    the classic K=0 rule is lossless; the floor quantization breaks
    subadditivity by at most 1 per term, so ``k_slack=2`` keeps
    pruning provably optimal-preserving (ties are NOT pruned —
    smallest-s stays reachable). Expected O(n) candidates under
    frequent changepoints, O(n^2) worst case — same optimum either
    way.

    Scale: one Arrow batch per key via ``applyInPandas`` — keys are
    the parallelism (the grouped-order-statistics posture). Series
    length is bounded by the *grid*, not the data (a monthly grid over
    7 years is 84 points at any SF); ``max_series`` guards the
    contract loudly rather than letting a whale key OOM a task.

    Emits ``*keys, seg_idx, start_ord, end_ord, seg_len, seg_sum,
    seg_cost, f_total, pen`` (one row per segment; ``start_ord`` /
    ``end_ord`` are ``order_col`` values at the segment's first/last
    point; ``f_total`` = F(n), the optimized objective).
    """
    import pandas as pd

    keys = list(key_cols)
    base = df.select(*keys, order_col, x_col)
    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in base.select(*keys).schema.fields
    )
    out_schema = (
        f"{key_schema}, seg_idx bigint, start_ord bigint, end_ord bigint,"
        " seg_len bigint, seg_sum bigint, seg_cost bigint, f_total bigint,"
        " pen bigint"
    )

    def one_key(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_series:
            raise ValueError(
                f"pelt_segments: series of {n} points exceeds max_series="
                f"{max_series}; aggregate to a bounded grid first"
            )
        srt = pdf.sort_values(order_col, kind="mergesort")
        ords = [int(v) for v in srt[order_col]]
        xs = [int(v) for v in srt[x_col]]
        ss = [0] * (n + 1)
        qq = [0] * (n + 1)
        for i, v in enumerate(xs):
            ss[i + 1] = ss[i] + v
            qq[i + 1] = qq[i] + v * v
        sse_total = qq[n] - (ss[n] * ss[n]) // n
        pen = max(2 * (sse_total // n), min_pen)

        def cost(s: int, t: int) -> int:
            d = ss[t] - ss[s]
            return (qq[t] - qq[s]) - (d * d) // (t - s)

        fs = [-pen] + [0] * n
        arg = [0] * (n + 1)
        cands = [0]
        for tt in range(1, n + 1):
            best_f, best_s = None, 0
            for s in cands:
                f = fs[s] + cost(s, tt) + pen
                if best_f is None or f < best_f:
                    best_f, best_s = f, s
            fs[tt], arg[tt] = best_f, best_s
            cands = [s for s in cands if fs[s] + cost(s, tt) <= best_f + k_slack]
            cands.append(tt)

        bounds = [n]
        while bounds[0] > 0:
            bounds.insert(0, arg[bounds[0]])
        rows = []
        for i in range(len(bounds) - 1):
            s0, e0 = bounds[i], bounds[i + 1]
            rows.append(
                {
                    **{k: pdf[k].iloc[0] for k in keys},
                    "seg_idx": i + 1,
                    "start_ord": ords[s0],
                    "end_ord": ords[e0 - 1],
                    "seg_len": e0 - s0,
                    "seg_sum": ss[e0] - ss[s0],
                    "seg_cost": cost(s0, e0),
                    "f_total": fs[n],
                    "pen": pen,
                }
            )
        return pd.DataFrame(rows)

    return base.groupBy(*keys).applyInPandas(one_key, out_schema)
