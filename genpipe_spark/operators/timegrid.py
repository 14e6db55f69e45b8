"""Dense time-bucket aggregation (gap-filling resample).

A plain ``groupBy(window)`` emits rows only for buckets that contain
events; dashboards, rate calculations and downstream ML features need
the EMPTY buckets too (timescale's ``time_bucket_gapfill``). Spark-first
shape, no driver collection:

  1. one shuffle: aggregate events into integer bucket indexes
     (``unix_micros DIV width`` — exact integer arithmetic, no float
     bucketing drift);
  2. per-group spine: each group's [min, max] bucket range expands with
     ``sequence()`` + ``explode`` — expression-level, so a group's spine
     length is bounded by its own time span, never the global one;
  3. one left join on (group, bucket) + zero-fill.

At 100 TB the spine explode adds rows proportional to group-span /
bucket-width — the OUTPUT size of a dense resample — and both shuffles
are standard keyed exchanges AQE manages.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Sequence[str] = ("user_id",),
    bucket_s: int = 3600,
    max_buckets_per_group: int = 10_000_000,
) -> DataFrame:
    """Per-group dense bucket series: every bucket between each group's
    first and last event, zero-filled where empty.

    Output: ``*by, bucket_start_us (long), n_events, value_sum,
    value_locf`` — value_sum through integer cents (exact,
    order-independent), zero-filled; value_locf carries the last
    non-empty bucket's sum forward (the other standard gapfill
    interpolation) via one additional window over the already-dense
    spine."""
    width_us = bucket_s * 1_000_000
    keys = list(by)
    # floor division, not DIV: Spark's DIV truncates toward zero while
    # the DuckDB oracle's // floors, so pre-1970 timestamps (negative
    # unix_micros) would land in different buckets per engine. Subtract
    # pmod first — the difference is exactly divisible, so DIV == floor.
    us = f"unix_micros({ts_col})"
    bidx = F.expr(f"({us} - pmod({us}, {width_us})) DIV {width_us}")
    agg = df.select(*keys, bidx.alias("__b"), F.col(value_col).alias("__v")).groupBy(
        *keys, "__b"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("__v") * 100).cast("long")) / 100.0).alias("value_sum"),
    )
    # a single corrupt timestamp (epoch 0 amid current data) would make
    # one group's spine explode to billions of rows; fail loudly with
    # the offending group instead of OOMing the job
    span_ok = F.assert_true(
        F.col("__hi") - F.col("__lo") < F.lit(max_buckets_per_group),
        F.concat(
            F.lit("gapfill spine exceeds max_buckets_per_group for group: "),
            *[F.col(k).cast("string") for k in keys],
        ),
    )
    # the assertion feeds the sequence's lower bound (null -> +0) so
    # column pruning cannot eliminate it
    guarded_lo = F.col("__lo") + F.coalesce(span_ok.cast("long"), F.lit(0))
    spine = (
        agg.groupBy(*keys)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            *keys,
            F.explode(F.sequence(guarded_lo, F.col("__hi"))).alias("__b"),
        )
    )
    out = spine.join(agg, [*keys, "__b"], "left")
    w_locf = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.select(
        *keys,
        (F.col("__b") * width_us).alias("bucket_start_us"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("value_sum"), F.lit(0.0)).alias("value_sum"),
        F.last("value_sum", ignorenulls=True).over(w_locf).alias("value_locf"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_us_col: str,
    value_cents_col: str,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Time-weighted average over irregular observations (the
    TWAP / sensor-mean aggregate): each value holds until the next
    observation (step-function / LOCF weighting), so

        twap = sum(v_i * (t_{i+1} - t_i)) / (t_n - t_1)

    over each key's ordered samples — NOT the arithmetic mean, which
    over-weights burst periods. The last observation contributes no
    duration (nothing is known past it).

    Exact integer construction (cross-engine determinism doctrine):
    values are int64 cents, timestamps int64 microseconds; the weighted
    sum is one int64 ``sum(cents * dur_us)`` and the average is folded
    as hundredths-of-a-cent via the quotient/remainder split
    ``q*10000 + (r*10000) div span`` (q = wsum div span, r = wsum mod
    span) so no intermediate exceeds int64 while span*1e4 < 2^63
    (spans to ~29k years). div/mod TRUNCATE toward zero in both Spark
    and DuckDB, so for a negative wsum the sub-c4 digit rounds toward
    zero (not floor) — engine-identical either way. Headroom:
    |cents|·dur_us summed per key must stay < 2^63 — at cents ≤ 1e6
    and year-long spans that allows ~300k observations/key; beyond
    that, split the sum hi/lo as agg-grouped-corr does.

    Shape: one lag/lead window + one groupBy on the SAME key — two
    exchanges AQE overlaps; ties on the timestamp are pinned by
    ``order_tiebreak`` (required for determinism when duplicate
    timestamps are possible).

    Output: key_cols..., n_obs, span_us, wsum_cents_us,
    twap_c4 (hundredths of a cent; NULL when span is 0)."""
    keys = list(key_cols)
    order = [F.col(ts_us_col)]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(*keys).orderBy(*order)
    stepped = df.withColumn("__next_t", F.lead(ts_us_col).over(w))
    agg = (
        stepped.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            (F.max(ts_us_col) - F.min(ts_us_col)).alias("span_us"),
            F.sum(
                F.when(
                    F.col("__next_t").isNotNull(),
                    F.col(value_cents_col)
                    * (F.col("__next_t") - F.col(ts_us_col)),
                )
            ).alias("wsum_cents_us"),
        )
    )
    return agg.withColumn(
        "twap_c4",
        F.when(
            F.col("span_us") > 0,
            F.expr(
                "(wsum_cents_us div span_us) * 10000"
                " + ((wsum_cents_us % span_us) * 10000) div span_us"
            ),
        ).cast("long"),
    )


def time_bucket_interpolate(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Sequence[str] = ("user_id",),
    bucket_s: int = 3600,
    max_buckets_per_group: int = 10_000_000,
) -> DataFrame:
    """Per-group dense bucket series with LINEAR interpolation across
    empty buckets — the third standard gapfill mode next to zero-fill
    and LOCF (timescale's ``interpolate()``).

    Output: ``*by, bucket_start_us (long), n_events,
    cents_known (nullable long), interp_micro (nullable long)`` where
    ``interp_micro`` is the linearly interpolated bucket value in
    micro-dollars. Exactness: known buckets sum to integer cents; for a
    gap bucket b between the previous known bucket pb (value p) and the
    next known bucket nb (value q), the interpolant is the exact
    rational (p*(nb-b) + q*(b-pb)) / (nb-pb) dollars/100, emitted as
    ``floor`` micro-dollars — pure int64 arithmetic (|p|,|q| <= 1e12
    micro-cents x gap length <= spine guard), identical in both
    engines; no float ever enters. Buckets before the first / after
    the last known bucket have no hull and stay NULL. Plan: the
    gapfill spine (explode over per-group [lo, hi]) + ONE
    partitionBy(by) sort shared by the four LOCF/NOCB windows."""
    width_us = bucket_s * 1_000_000
    keys = list(by)
    us = f"unix_micros({ts_col})"
    bidx = F.expr(f"({us} - pmod({us}, {width_us})) DIV {width_us}")
    agg = (
        df.select(*keys, bidx.alias("__b"), F.col(value_col).alias("__v"))
        .groupBy(*keys, "__b")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("__v") * 100).cast("long")).alias("cents_known"),
        )
    )
    span_ok = F.assert_true(
        F.col("__hi") - F.col("__lo") < F.lit(max_buckets_per_group),
        F.concat(
            F.lit("interpolate spine exceeds max_buckets_per_group for group: "),
            *[F.col(k).cast("string") for k in keys],
        ),
    )
    guarded_lo = F.col("__lo") + F.coalesce(span_ok.cast("long"), F.lit(0))
    spine = (
        agg.groupBy(*keys)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        .select(
            *keys,
            F.explode(F.sequence(guarded_lo, F.col("__hi"))).alias("__b"),
        )
    )
    dense = spine.join(agg, [*keys, "__b"], "left")
    # Both hull sides are RUNNING (unboundedPreceding..currentRow)
    # frames — Spark evaluates those incrementally in O(n). The naive
    # NOCB formulation (first ignorenulls over
    # currentRow..unboundedFollowing) plans an UnboundedFollowing
    # frame that RESCANS to partition end per row — O(n^2) per group,
    # measured 11.9 s vs 0.8 s on a 1M-row spine — so the next-known
    # side runs as LOCF over the DESCENDING order instead (one extra
    # sort, same single hash partitioning).
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__b").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    known_b = F.when(F.col("cents_known").isNotNull(), F.col("__b"))
    hull = dense.select(
        *keys,
        "__b",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        "cents_known",
        F.last("cents_known", ignorenulls=True).over(w_prev).alias("__pv"),
        F.last(known_b, ignorenulls=True).over(w_prev).alias("__pb"),
        F.last("cents_known", ignorenulls=True).over(w_next).alias("__nv"),
        F.last(known_b, ignorenulls=True).over(w_next).alias("__nb"),
    )
    # exact int64 rational: micro-dollars = cents * 10_000; gap weights
    # are bucket distances. Non-negative numerators -> DIV == floor in
    # both engines (cents >= 0 in fixture usage; callers with negative
    # values get floor semantics via the pmod-adjusted DIV below).
    den = F.col("__nb") - F.col("__pb")
    # floor division valid for negatives too: (n - pmod(n, d)) DIV d
    n_expr = "((__pv * (__nb - __b) + __nv * (__b - __pb)) * 10000)"
    interp = F.when(
        F.col("__pv").isNotNull() & F.col("__nv").isNotNull(),
        F.when(den == 0, F.col("__pv") * F.lit(10_000)).otherwise(
            F.expr(
                f"({n_expr} - pmod({n_expr}, (__nb - __pb))) DIV (__nb - __pb)"
            )
        ),
    )
    return hull.select(
        *keys,
        (F.col("__b") * width_us).alias("bucket_start_us"),
        "n_events",
        "cents_known",
        interp.cast("long").alias("interp_micro"),
    )


def lttb_downsample(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    x_col: str,
    y_col: str,
    k: int,
) -> DataFrame:
    """Largest-Triangle-THREE-Buckets downsampling (Steinarsson 2013,
    the proper sequential variant) — per key, keep the first point,
    one point per interior bucket, and the last point, where the
    interior pick maximizes the triangle area between the PREVIOUSLY
    SELECTED point and the NEXT bucket's average. Unlike the shipped
    LTOB (rollup-lttb-downsample: neighbor triangles, fully
    declarative), the prev-selected dependence makes this a per-key
    SEQUENTIAL scan — the statescan class: one hash shuffle on the
    keys + sortWithinPartitions, then mapInPandas with state reset at
    key boundaries.

    EXACTNESS: the classic formulation averages the next bucket
    (float). Here the comparison is multiplied through by the next
    bucket's count m: score = |(m*px - sx)*(y - py) - (px - x)*
    (sy - m*py)| with (sx, sy) the bucket SUMS — pure integers,
    evaluated in arbitrary-precision Python ints (products reach
    ~1e21 for epoch-us x cents inputs, past int64), so a HUGEINT
    DuckDB twin replays selection bit-for-bit. Ties break to the
    earliest rn. Scaling the area by m > 0 never changes the argmax.

    Bucket layout mirrors rollup-lttb-downsample's div spread:
    interior rows rn in [2, n-1] get bucket ((rn-2)*(k-2)) div (n-2),
    buckets 0..k-3; when n <= k every bucket holds <= 1 row and LTTB
    degenerates to the identity (every point selected) in BOTH
    engines, because a 2+-row bucket implies every bucket nonempty
    (the div spread is surjective once n-2 >= k-2).

    Memory: the scan buffers at most TWO buckets per key (the pending
    bucket awaiting selection + the filling one), i.e. O(n/k) per
    key — the inherent LTTB window; for 100 TB series run a
    hierarchical pre-decimation per partition first (same operator,
    larger k) like every production LTTB.

    Output: ``*keys, sel_idx, rn, x, y`` — sel_idx -1 for the first
    point, the interior bucket id for bucket picks, k-2 for the last
    point. Cites Steinarsson's thesis (public); no reference-engine
    equivalent (the reference has no downsampler).
    """
    if k < 3:
        raise ValueError(f"lttb_downsample: k {k} < 3")
    keys = list(keys)
    order_cols = list(order_cols)
    wk = Window.partitionBy(*keys)
    wo = wk.orderBy(*order_cols)
    base = df.select(
        *keys,
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
        F.row_number().over(wo).alias("__rn"),
        F.count(F.lit(1)).over(wk).alias("__n"),
    ).withColumn(
        "__b",
        F.when(
            (F.col("__rn") > 1) & (F.col("__rn") < F.col("__n")),
            F.expr(f"((__rn - 2) * {k - 2}) div (__n - 2)"),
        ),
    )
    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in base.select(*keys).schema.fields
    )
    out_schema = f"{key_schema}, sel_idx bigint, rn bigint, x bigint, y bigint"

    import pandas as pd

    def scan(batches):
        # per-key state (reset at key boundaries)
        cur = object()
        prev = None            # (x, y) of the last selected point
        pending = None         # [(rn, x, y), ...] bucket awaiting pick
        pend_b = None
        filling = []           # bucket being accumulated
        fill_b = None
        out_rows = []

        def select(rows, nxt_m, nxt_sx, nxt_sy, idx):
            nonlocal prev
            px, py = prev
            best = None
            for rn_, x_, y_ in rows:
                s = abs(
                    (nxt_m * px - nxt_sx) * (y_ - py)
                    - (px - x_) * (nxt_sy - nxt_m * py)
                )
                # max score, ties to the earliest rn
                if best is None or s > best[0] or (s == best[0] and rn_ < best[1]):
                    best = (s, rn_, x_, y_)
            out_rows.append((*key_vals, idx, best[1], best[2], best[3]))
            prev = (best[2], best[3])

        def sums(rows):
            return (
                len(rows),
                sum(r[1] for r in rows),
                sum(r[2] for r in rows),
            )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            kcols = [pdf[c].to_numpy() for c in keys]
            rns = pdf["__rn"].to_numpy()
            ns = pdf["__n"].to_numpy()
            bs = pdf["__b"].to_numpy()
            xs = pdf["__x"].to_numpy()
            ys = pdf["__y"].to_numpy()
            for i in range(len(pdf)):
                key_vals = tuple(c[i] for c in kcols)
                rn, n = int(rns[i]), int(ns[i])
                x, y = int(xs[i]), int(ys[i])
                if key_vals != cur:
                    cur = key_vals
                    pending, pend_b, filling, fill_b = None, None, [], None
                if rn == 1:
                    out_rows.append((*key_vals, -1, rn, x, y))
                    prev = (x, y)
                    continue
                if rn < n:
                    b = int(bs[i])
                    if fill_b is None:
                        filling, fill_b = [(rn, x, y)], b
                    elif b == fill_b:
                        filling.append((rn, x, y))
                    else:
                        if pending:
                            select(pending, *sums(filling), pend_b)
                        pending, pend_b = filling, fill_b
                        filling, fill_b = [(rn, x, y)], b
                    continue
                # rn == n: the last point closes the key
                if pending:
                    select(pending, *sums(filling), pend_b)
                    pending = None
                if filling:
                    select(filling, 1, x, y, fill_b)
                    filling, fill_b = [], None
                out_rows.append((*key_vals, k - 2, rn, x, y))
            if out_rows:
                yield pd.DataFrame(
                    out_rows,
                    columns=[*keys, "sel_idx", "rn", "x", "y"],
                )
                out_rows = []

    shuffled = base.repartition(*[F.col(c) for c in keys]).sortWithinPartitions(
        *keys, "__rn"
    )
    return shuffled.mapInPandas(scan, out_schema)
