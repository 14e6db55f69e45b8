"""Time-series queries()/oracle_sql() twins: the as-of join.

The as-of join is the canonical custom operator Spark's DataFrame API
lacks (reference: the engine's temporal merge step). The oracle mirrors
the operator's union+window formulation in ANSI SQL (DuckDB
``last_value(... IGNORE NULLS)`` over the same (ts, side, tiebreak)
ordering), so the hash check verifies the exact tie/tolerance semantics,
not just row counts. Timestamps travel as epoch microseconds (exact
integers in both engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.operators.asof import asof_join
from genpipe_spark.queries.common import t
from genpipe_spark.registry import query

# one oracle part per direction/tolerance variant; each mirrors the
# operator's union + last_value(IGNORE NULLS) window exactly
_ASOF_PART_SQL = """
    SELECT '{part}' AS part, event_id, user_id, ts_us,
           COALESCE(mm.r_id, -1) AS r_id,
           COALESCE(epoch_us(mm.r_ts), -1) AS r_ts_us,
           COALESCE(mm.r_value, -1.0) AS r_value
    FROM (
      SELECT *, last_value(pay IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY uts {dir1}, side ASC, tb {dir2}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mm
      FROM (
        SELECT user_id, ts AS uts, 1 AS side, CAST(NULL AS BIGINT) AS tb,
               event_id, epoch_us(ts) AS ts_us,
               CAST(NULL AS STRUCT(r_ts TIMESTAMP, r_id BIGINT, r_value DOUBLE)) AS pay
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, ts AS uts, 0 AS side, event_id AS tb,
               NULL, NULL,
               struct_pack(r_ts := ts, r_id := event_id, r_value := value)
        FROM events WHERE event_type = '{rtype}'
      )
    ) WHERE side = 1
"""

_TOL_CLAUSE = """
    SELECT part, event_id, user_id, ts_us,
           CASE WHEN ok THEN r_id ELSE -1 END AS r_id,
           CASE WHEN ok THEN r_ts_us ELSE -1 END AS r_ts_us,
           CASE WHEN ok THEN r_value ELSE -1.0 END AS r_value
    FROM (SELECT *, r_id <> -1 AND abs(ts_us - r_ts_us) <= {tol_us} AS ok
          FROM ({inner}))
"""



_ASOF_NEAREST_SQL = """
    SELECT 'nr' AS part, event_id, user_id, ts_us,
           COALESCE(pick.r_id, -1) AS r_id,
           COALESCE(epoch_us(pick.r_ts), -1) AS r_ts_us,
           COALESCE(pick.r_value, -1.0) AS r_value
    FROM (
      SELECT event_id, user_id, ts_us,
             CASE WHEN mb IS NULL THEN mf
                  WHEN mf IS NULL THEN mb
                  WHEN (uts_us - epoch_us(mb.r_ts))
                       <= (epoch_us(mf.r_ts) - uts_us) THEN mb
                  ELSE mf END AS pick
      FROM (
        SELECT *, epoch_us(uts) AS uts_us,
               last_value(pay IGNORE NULLS) OVER (
                 PARTITION BY user_id
                 ORDER BY uts ASC, side ASC, tb ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mb,
               first_value(pay IGNORE NULLS) OVER (
                 PARTITION BY user_id
                 ORDER BY uts ASC, side ASC, tb ASC
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS mf
        FROM (
          SELECT user_id, ts AS uts, 1 AS side, CAST(NULL AS BIGINT) AS tb,
                 event_id, epoch_us(ts) AS ts_us,
                 CAST(NULL AS STRUCT(r_ts TIMESTAMP, r_id BIGINT,
                                     r_value DOUBLE)) AS pay
          FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, ts AS uts, 0 AS side, event_id AS tb,
                 NULL, NULL,
                 struct_pack(r_ts := ts, r_id := event_id, r_value := value)
          FROM events WHERE event_type = 'view'
        )
      ) WHERE side = 1
    )
"""


def _asof_oracle() -> str:
    bwd = _ASOF_PART_SQL.format(part="bwd", rtype="view", dir1="ASC", dir2="ASC")
    fwd = _ASOF_PART_SQL.format(part="fwd", rtype="purchase", dir1="DESC", dir2="DESC")
    tol = _TOL_CLAUSE.format(
        tol_us=600 * 1_000_000,
        inner=_ASOF_PART_SQL.format(part="tol", rtype="view", dir1="ASC", dir2="ASC"),
    )
    return (
        f"{bwd} UNION ALL {fwd} UNION ALL {tol} UNION ALL "
        f"{_ASOF_NEAREST_SQL}"
    )


@query("join-asof", _asof_oracle())
def join_asof(spark, sf):
    """Covers the as-of join in all FOUR forms (tagged union, one driver
    slot): 'bwd' = each click matched to the user's most recent view at
    or before it; 'fwd' = to the next purchase at or after it; 'tol' =
    'bwd' with a 600 s tolerance; 'nr' = to the NEAREST view either way
    (two running-frame window sorts, ascending + descending — never a
    quadratic following frame; equal-distance ties prefer the
    backward match — pandas merge_asof's third direction). Unmatched
    rows surface as -1 sentinels (engine-independent hashing; see
    join-left-multikey)."""
    ev = t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )

    def right(rtype: str):
        return ev.where(F.col("event_type") == rtype).select(
            "user_id",
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("r_id"),
            F.col("value").alias("r_value"),
        )

    def leg(part: str, rtype: str, direction: str, tolerance_s: float | None):
        j = asof_join(
            clicks,
            right(rtype),
            on="user_id",
            left_ts="ts",
            right_ts="r_ts",
            right_cols=["r_id", "r_value"],
            tiebreak="r_id",
            direction=direction,
            tolerance_s=tolerance_s,
        )
        return j.select(
            F.lit(part).alias("part"),
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.coalesce("r_id", F.lit(-1)).alias("r_id"),
            F.coalesce(F.unix_micros("r_ts"), F.lit(-1)).alias("r_ts_us"),
            F.coalesce("r_value", F.lit(-1.0)).alias("r_value"),
        )

    return (
        leg("bwd", "view", "backward", None)
        .unionByName(leg("fwd", "purchase", "forward", None))
        .unionByName(leg("tol", "view", "backward", 600.0))
        .unionByName(leg("nr", "view", "nearest", None))
    )


@query(
    "rollup-time-hierarchy",
    """
    SELECT COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'), 'ALL') AS d,
           COALESCE(strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'), 'ALL') AS h,
           COALESCE(strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S'), 'ALL') AS m,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts),
                     date_trunc('minute', ts))
    """,
)
def rollup_time_hierarchy(spark, sf):
    """Hypertable-style hierarchical time rollup: one pass produces the
    minute, hour, day, and grand-total continuous-aggregate levels via
    ROLLUP (grouping sets). At scale this is ONE shuffle with map-side
    partial aggregation per grouping set — the way to maintain a
    multi-granularity dashboard table over an event stream's history.
    Money-style exactness: value sums travel as integer cents."""
    ev = t(spark, sf, "events").select(
        F.date_trunc("day", "ts").alias("d_t"),
        F.date_trunc("hour", "ts").alias("h_t"),
        F.date_trunc("minute", "ts").alias("m_t"),
        "user_id",
        "value",
    )
    agg = ev.rollup("d_t", "h_t", "m_t").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return agg.select(
        F.coalesce(F.date_format("d_t", fmt), F.lit("ALL")).alias("d"),
        F.coalesce(F.date_format("h_t", fmt), F.lit("ALL")).alias("h"),
        F.coalesce(F.date_format("m_t", fmt), F.lit("ALL")).alias("m"),
        "n_events",
        "n_users",
        "value_cents",
    )


@query(
    "rollup-gapfill",
    """
    WITH b AS (
      SELECT user_id, epoch_us(ts) // 3600000000 AS bidx,
             count(*) AS n_events,
             sum(CAST(round(value*100) AS BIGINT))/100.0 AS value_sum
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id, unnest(range(lo, hi + 1)) AS bidx
      FROM (SELECT user_id, min(bidx) AS lo, max(bidx) AS hi
            FROM b GROUP BY user_id)
    )
    SELECT user_id, bidx * 3600000000 AS bucket_start_us,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(value_sum, 0.0) AS value_sum,
           last_value(value_sum IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bidx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
    FROM (
      SELECT spine.user_id, spine.bidx, n_events, value_sum
      FROM spine LEFT JOIN b
        ON spine.user_id = b.user_id AND spine.bidx = b.bidx
    )
    """,
)
def rollup_gapfill(spark, sf):
    """Dense hourly per-user series with zero-filled empty buckets
    (operators/timegrid.time_bucket_gapfill) — the timescale-style
    gap-filling resample; integer bucket indexes and integer-cents sums
    keep both engines bit-identical."""
    from genpipe_spark.operators.timegrid import time_bucket_gapfill

    return time_bucket_gapfill(
        t(spark, sf, "events"), ts_col="ts", value_col="value",
        by=("user_id",), bucket_s=3600,
    )


@query(
    "timeseries-anomaly",
    """
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events
    ),
    z AS (
      SELECT user_id, event_id, xc,
             count(xc) OVER wprev AS n_win,
             CAST(coalesce(sum(xc) OVER wprev, 0) AS BIGINT) AS s_cents,
             CAST(coalesce(sum(xc * xc) OVER wprev, 0) AS BIGINT) AS q_cents2,
             list(xc) OVER wcur AS arr
      FROM e
      WINDOW
        wprev AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING),
        wcur AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 16 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, n_win, s_cents, q_cents2,
           CASE WHEN n_win < 5 THEN 'warmup'
                WHEN (n_win*xc - s_cents) * (n_win*xc - s_cents) * (n_win - 1)
                     > 9 * n_win * (n_win*q_cents2 - s_cents*s_cents)
                THEN 'anomaly' ELSE 'normal'
           END AS verdict,
           CAST(1000000 * list_sum(list_transform(
                  arr, (x, i) -> x * (1::BIGINT << (16 - (len(arr) - i)))))
                AS BIGINT)
             // ((1::BIGINT << 17) - (1::BIGINT << (17 - len(arr))))
             AS ewma_micro_cents
    FROM z
    """,
)
def timeseries_anomaly(spark, sf):
    """Per-entity streaming analytics pair (operators/anomaly.py): a
    trailing-50-row z-score outlier flag (baseline excludes the point
    under test; exact int64 inequality, no libm) and an alpha=1/2
    EWMA smoother (power-of-two kernel, int64 `div`). Both measures
    share the same partitionBy(user_id) ordering, so the whole query is
    ONE hash shuffle feeding two Window nodes."""
    from genpipe_spark.operators.anomaly import ewma_micro_cents, rolling_zscore_flags

    e = t(spark, sf, "events").select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("xc"),
    )
    flagged = rolling_zscore_flags(
        e, ["user_id"], ["ts", "event_id"], F.col("xc"), window_rows=50,
        threshold=3, min_obs=5,
    )
    smoothed = ewma_micro_cents(
        flagged, ["user_id"], ["ts", "event_id"], F.col("xc")
    )
    verdict = (
        F.when(F.col("is_anomaly").isNull(), "warmup")
        .when(F.col("is_anomaly"), "anomaly")
        .otherwise("normal")
    )
    return smoothed.select(
        "user_id", "event_id", "n_win", "s_cents", "q_cents2",
        verdict.alias("verdict"), "ewma_micro_cents",
    )


@query(
    "interval-overlap-count",
    """
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + ((event_id % 7) + 1) * 60000000 AS e
      FROM events
    ),
    ev AS (
      SELECT user_id, s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT user_id, e, -1 FROM iv
    ),
    run AS (
      SELECT user_id,
             CAST(sum(d) OVER (PARTITION BY user_id ORDER BY t, d
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
      FROM ev
    )
    SELECT user_id,
           (SELECT count(*) FROM iv i WHERE i.user_id = run.user_id) AS n_intervals,
           max(c) AS max_concurrent
    FROM run GROUP BY user_id
    """,
)
def interval_overlap_count(spark, sf):
    """Peak concurrent sessions per user
    (operators/interval.interval_overlap_stats): synthetic [ts, ts+1..7
    min) intervals from events, swept exactly — no pairwise interval
    join. Integer microsecond arithmetic keeps both engines identical."""
    from genpipe_spark.operators.interval import interval_overlap_stats

    e = t(spark, sf, "events")
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + ((F.col("event_id") % 7) + 1) * 60_000_000)
        .alias("e"),
    )
    return interval_overlap_stats(iv, ["user_id"], "s", "e")


@query(
    "funnel-steps",
    """
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t_1
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > t_1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t_2
      GROUP BY e.user_id
    )
    SELECT s1.user_id,
           1 + CAST(t_2 IS NOT NULL AS INT) + CAST(t_3 IS NOT NULL AS INT)
             AS steps_completed,
           t_1, t_2, t_3
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
)
def funnel_steps_query(spark, sf):
    """Ordered signup→click→purchase funnel
    (operators/eventflow.funnel_steps): per-user completion depth with
    each stage's qualifying timestamp; stage i+1 counts only strictly
    after stage i's earliest occurrence. k filtered min-aggregates +
    k-1 user-keyed joins — no event-table window, no per-user sort."""
    from genpipe_spark.operators.eventflow import funnel_steps

    return funnel_steps(
        t(spark, sf, "events"), "user_id", "ts", "event_type",
        ["signup", "click", "purchase"],
    )


@query(
    "funnel-steps-windowed",
    """
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t_1
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > t_1
        AND epoch_us(e.ts) <= t_1 + 86400000000
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t_2
        AND epoch_us(e.ts) <= t_2 + 86400000000
      GROUP BY e.user_id
    )
    SELECT s1.user_id,
           1 + CAST(t_2 IS NOT NULL AS INT) + CAST(t_3 IS NOT NULL AS INT)
             AS steps_completed,
           t_1, t_2, t_3
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
)
def funnel_steps_windowed_query(spark, sf):
    """Conversion-window funnel (operators/eventflow.funnel_steps with
    ``within_us``): each stage counts only when it lands within 24 h of
    the previous stage's qualifying event — the attribution-window form
    of funnel analysis (VERDICT r5 item 5). Same shuffle shape as the
    unwindowed funnel: the window is one extra predicate on the
    user-keyed per-step join."""
    from genpipe_spark.operators.eventflow import funnel_steps

    return funnel_steps(
        t(spark, sf, "events"), "user_id", "ts", "event_type",
        ["signup", "click", "purchase"], within_us=86_400_000_000,
    )


@query(
    "cohort-retention",
    """
    WITH a AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS b FROM events
    ),
    f AS (SELECT user_id, min(b) AS cohort_bucket FROM a GROUP BY user_id)
    SELECT cohort_bucket, b - cohort_bucket AS bucket_offset,
           count(DISTINCT user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY cohort_bucket, b - cohort_bucket
    """,
)
def cohort_retention_query(spark, sf):
    """Weekly cohort-retention triangle
    (operators/eventflow.cohort_retention): users bucketed by first
    active week, counted in each later week they return. Integer
    epoch-microsecond week buckets keep both engines identical."""
    from genpipe_spark.operators.eventflow import cohort_retention

    return cohort_retention(t(spark, sf, "events"), "user_id", "ts")


@query(
    "event-transition-matrix",
    """
    WITH pairs AS (
      SELECT event_type AS state_from,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS state_to
      FROM events
    ),
    counts AS (
      SELECT state_from, state_to, count(*) AS n
      FROM pairs WHERE state_to IS NOT NULL
      GROUP BY state_from, state_to
    ),
    totals AS (SELECT state_from, sum(n) AS tot FROM counts GROUP BY state_from)
    SELECT c.state_from, c.state_to, c.n,
           CAST((c.n * 1000000) // t.tot AS BIGINT) AS p_micro
    FROM counts c JOIN totals t USING (state_from)
    """,
)
def event_transition_matrix(spark, sf):
    """First-order Markov transition matrix between event types per
    user stream (operators/eventflow.transition_matrix): exact counts
    + row-normalized probabilities in integer millionths. One lag
    window is the only event-table shuffle; the matrix itself is
    |states|^2 rows."""
    from genpipe_spark.operators.eventflow import transition_matrix

    return transition_matrix(
        t(spark, sf, "events"), "user_id", ["ts", "event_id"], "event_type"
    )


@query(
    "rollup-twap",
    """
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS t, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    st AS (
      SELECT user_id, t, cents,
             lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS nt
      FROM s
    ),
    a AS (
      SELECT user_id, count(*) AS n_obs,
             max(t) - min(t) AS span_us,
             CAST(sum(CASE WHEN nt IS NOT NULL
                           THEN cents * (nt - t) END) AS BIGINT)
               AS wsum_cents_us
      FROM st GROUP BY user_id
    )
    SELECT user_id, n_obs, span_us, wsum_cents_us,
           CASE WHEN span_us > 0 THEN
             (wsum_cents_us // span_us) * 10000
             + ((wsum_cents_us % span_us) * 10000) // span_us
           END AS twap_c4
    FROM a
    """,
)
def rollup_twap(spark, sf):
    """Time-weighted average value per user
    (operators/timegrid.time_weighted_avg): step-function/LOCF
    weighting over each user's irregular event stream — the TWAP
    aggregate, exact int64 cents·us weighted sums with a euclidean
    hundredth-of-a-cent fold (non-negative values in this fixture, so
    div/mod conventions agree across engines). One lag window + one
    groupBy on the same user key."""
    from genpipe_spark.operators.timegrid import time_weighted_avg

    e = t(spark, sf, "events").select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return time_weighted_avg(
        e, ["user_id"], "t_us", "cents", order_tiebreak="event_id"
    )


@query(
    "session-paths",
    """
    WITH m AS (
      SELECT user_id, ts, event_type, event_id,
             CASE WHEN epoch_us(ts)
                    - epoch_us(lag(ts, 1, TIMESTAMP '1970-01-01') OVER (
                        PARTITION BY user_id ORDER BY ts, event_id))
                  > 21600000000 THEN 1 ELSE 0 END AS ns
      FROM events
    ),
    s AS (
      SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    ),
    p AS (
      SELECT user_id, sid,
             string_agg(event_type, '->' ORDER BY ts, event_id) AS path
      FROM s GROUP BY user_id, sid
    )
    SELECT path, count(*) AS n_sessions FROM p GROUP BY path
    """,
)
def session_paths_query(spark, sf):
    """Top user-journey paths (operators/eventflow.session_paths):
    6-hour inactivity-gap sessions, each session's event types joined
    in (ts, event_id) order, counted per distinct path. The oracle
    sessionizes with the same gaps-and-islands windows and an ORDER BY
    string_agg."""
    from genpipe_spark.operators.eventflow import session_paths

    return session_paths(
        t(spark, sf, "events"), "user_id", "ts", "event_type",
        gap_us=21_600_000_000, tiebreak_col="event_id",
    )


_ACF_MOM = """
      SELECT user_id, lag, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum((x*x) // 1073741824) AS BIGINT) AS sxx_hi,
             CAST(sum((x*x) % 1073741824) AS BIGINT) AS sxx_lo,
             CAST(sum((y*y) // 1073741824) AS BIGINT) AS syy_hi,
             CAST(sum((y*y) % 1073741824) AS BIGINT) AS syy_lo,
             CAST(sum((x*y) // 1073741824) AS BIGINT) AS sxy_hi,
             CAST(sum((x*y) % 1073741824) AS BIGINT) AS sxy_lo
      FROM p GROUP BY user_id, lag
"""


@query(
    "timeseries-acf",
    f"""
    WITH e AS (
      SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS x
      FROM events
    ),
    l AS (
      SELECT user_id, x,
             lag(x, 1) OVER (PARTITION BY user_id ORDER BY ts) AS x1,
             lag(x, 2) OVER (PARTITION BY user_id ORDER BY ts) AS x2,
             lag(x, 3) OVER (PARTITION BY user_id ORDER BY ts) AS x3
      FROM e
    ),
    p AS (
      SELECT user_id, 1 AS lag, x, x1 AS y FROM l WHERE x1 IS NOT NULL
      UNION ALL
      SELECT user_id, 2, x, x2 FROM l WHERE x2 IS NOT NULL
      UNION ALL
      SELECT user_id, 3, x, x3 FROM l WHERE x3 IS NOT NULL
    ),
    s AS ({_ACF_MOM})
    SELECT user_id, lag, n,
           CASE WHEN (CAST(n AS DOUBLE)
                        * (CAST(sxx_hi AS DOUBLE) * 1073741824.0
                           + CAST(sxx_lo AS DOUBLE))
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <= 0.0
                  OR (CAST(n AS DOUBLE)
                        * (CAST(syy_hi AS DOUBLE) * 1073741824.0
                           + CAST(syy_lo AS DOUBLE))
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0.0
                THEN NULL
                ELSE CAST(floor(1000000.0 *
                  (CAST(n AS DOUBLE)
                     * (CAST(sxy_hi AS DOUBLE) * 1073741824.0
                        + CAST(sxy_lo AS DOUBLE))
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE)
                            * (CAST(sxx_hi AS DOUBLE) * 1073741824.0
                               + CAST(sxx_lo AS DOUBLE))
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE)
                              * (CAST(syy_hi AS DOUBLE) * 1073741824.0
                                 + CAST(syy_lo AS DOUBLE))
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                  AS BIGINT)
           END AS acf_micro
    FROM s
    """,
)
def timeseries_acf(spark, sf):
    """Per-entity autocorrelation function at lags 1-3 — the
    seasonality/persistence diagnostic a feature pipeline computes per
    series. Pearson correlation of (x_t, x_{t-lag}) pairs per
    (user_id, lag), accumulated with the agg-grouped-corr doctrine:
    exact int64 (hi, lo)-split product moments at 2^30 (values are
    non-negative cents, so div/mod agree across engines), doubles only
    in the final pinned-order fold; zero-variance groups emit NULL
    instead of a divide artifact. Plan shape: ONE per-key window pass
    produces all three lags, an inline explode unpivots them
    (single scan, no self-joins — the naive per-lag self-join would
    re-shuffle the series three times), then one map-side-combinable
    groupBy on (user_id, lag)."""
    from pyspark.sql import Window

    ev = t(spark, sf, "events").select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("x")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    lagged = ev.select(
        "user_id", "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in (1, 2, 3)],
    )
    pairs = (
        lagged.select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("lag"),
                            F.col("x"),
                            F.col(f"x{k}").alias("y"),
                        )
                        for k in (1, 2, 3)
                    ]
                )
            ).alias("p"),
        )
        .select("user_id", "p.lag", "p.x", "p.y")
        .where(F.col("y").isNotNull())
    )
    split = 1073741824  # 2^30

    def hi_lo(prod, tag):
        return [
            F.sum(F.expr(f"({prod}) div {split}")).alias(f"{tag}_hi"),
            F.sum(F.expr(f"({prod}) % {split}")).alias(f"{tag}_lo"),
        ]

    s = pairs.groupBy("user_id", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        *hi_lo("x*x", "sxx"),
        *hi_lo("y*y", "syy"),
        *hi_lo("x*y", "sxy"),
    )

    def recon_d(tag):
        return (
            F.col(f"{tag}_hi").cast("double") * F.lit(float(split))
            + F.col(f"{tag}_lo").cast("double")
        )

    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    varx = n_d * recon_d("sxx") - sx_d * sx_d
    vary = n_d * recon_d("syy") - sy_d * sy_d
    num = n_d * recon_d("sxy") - sx_d * sy_d
    acf = F.when(
        (varx <= 0.0) | (vary <= 0.0), F.lit(None).cast("long")
    ).otherwise(
        F.floor(F.lit(1_000_000.0) * num / F.sqrt(varx * vary)).cast("long")
    )
    return s.select("user_id", "lag", "n", acf.alias("acf_micro"))


@query(
    "rollup-ohlc",
    """
    WITH e AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 900000000 AS BIGINT) AS bucket,
             epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT user_id, bucket,
           arg_min(cents, us) AS open_c,
           max(cents) AS high_c,
           min(cents) AS low_c,
           arg_max(cents, us) AS close_c,
           count(*) AS n_ticks,
           CAST(sum(cents) AS BIGINT) AS vol_c
    FROM e GROUP BY user_id, bucket
    """,
)
def rollup_ohlc(spark, sf):
    """OHLC candlestick rollup: open/high/low/close per (entity,
    15-minute bucket) — the financial/telemetry compaction primitive.
    open/close are argmin/argmax over the in-bucket timestamp
    (min_by/max_by — deterministic because (user_id, ts) is unique in
    the fixture; real feeds add a sequence tiebreak column), extremes
    and volume ride the same single map-side-combinable aggregate:
    ONE shuffle total, no window, no self-join. Values in exact
    integer cents; the bucket is integer epoch-microseconds div 15 min
    (no timezone arithmetic)."""
    e = t(spark, sf, "events").select(
        "user_id",
        # int64 div, NOT double division + cast: a correctly-rounded
        # double quotient can round UP across an integer boundary where
        # exact floor division would not (the interval-banding rule)
        F.expr("unix_micros(ts) div 900000000").alias("bucket"),
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return e.groupBy("user_id", "bucket").agg(
        F.min_by("cents", "us").alias("open_c"),
        F.max("cents").alias("high_c"),
        F.min("cents").alias("low_c"),
        F.max_by("cents", "us").alias("close_c"),
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("cents").alias("vol_c"),
    )


@query(
    "attribution-last-touch",
    """
    WITH ordered AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_us
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT user_id, event_id AS purchase_id,
           CASE WHEN last_click_us IS NOT NULL
                 AND us - last_click_us <= 604800000000
                THEN last_click_us END AS touch_us,
           CASE WHEN last_click_us IS NOT NULL
                 AND us - last_click_us <= 604800000000
                THEN us - last_click_us END AS lag_us
    FROM ordered WHERE event_type = 'purchase'
    """,
)
def attribution_last_touch(spark, sf):
    """Last-touch attribution — the marketing-analytics primitive: each
    purchase is attributed to the user's most recent PRIOR click
    within a 7-day lookback, or left unattributed (NULL) otherwise.
    ONE running-max window per user over the two relevant event types
    (filter pushed to the scan — views/errors never leave the
    parquet) replaces the naive purchase×click as-of self-join: no
    join at all, state is one int64 per user per row, and the window
    keys on user_id so there is no global sort. The lookback compare
    is exact integer microseconds. The 1-PRECEDING frame excludes a
    click at the exact purchase timestamp on the purchase row itself
    (same-row events are ordered (ts, event_id), matching the oracle
    deterministically)."""
    from pyspark.sql import Window

    e = t(spark, sf, "events").where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
        F.col("ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    week = 604_800_000_000
    o = e.withColumn(
        "last_click_us",
        F.max(
            F.when(F.col("event_type") == "click", F.col("us"))
        ).over(w),
    )
    attributed = F.col("last_click_us").isNotNull() & (
        F.col("us") - F.col("last_click_us") <= week
    )
    return o.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.when(attributed, F.col("last_click_us")).alias("touch_us"),
        F.when(attributed, F.col("us") - F.col("last_click_us")).alias("lag_us"),
    )


@query(
    "rollup-rolling-median",
    """
    WITH v AS (
      SELECT o_orderkey, o_custkey % 8 AS seg, o_orderdate,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT o_orderkey, seg, cents,
             quantile_disc(cents, 0.5) OVER (
               PARTITION BY seg ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 24 PRECEDING AND CURRENT ROW
             ) AS roll_med_cents
      FROM v
    )
    SELECT o_orderkey, seg, cents, roll_med_cents
    FROM r WHERE o_orderkey % 50 = 0
    """,
)
def rollup_rolling_median(spark, sf):
    """Rolling EXACT median denoiser: per segment, the lower median of
    the trailing 25 order totals (cents, int64) under a total
    (date, key) order — the robust alternative to a rolling mean that
    a spike can't drag. Spark has no frame-bounded exact median, so
    the frame is materialized per row via sort_array(collect_list)
    over a ROWS window and indexed at (n+1) div 2 — per-row state is
    BOUNDED BY THE FRAME (25 values), never the partition, so memory
    is O(frame) at any SF; DuckDB's quantile_disc(0.5) window computes
    the identical lower median. The output is thinned to every 50th
    key AFTER the window (both engines), keeping the checked payload
    small while every row still exercises the frame."""
    from pyspark.sql import Window

    v = t(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 8).alias("seg"),
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("seg")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-24, 0)
    )
    arr = F.sort_array(F.collect_list("cents").over(w))
    r = v.select(
        "o_orderkey",
        "seg",
        "cents",
        F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int")).alias(
            "roll_med_cents"
        ),
    )
    return r.where(F.col("o_orderkey") % 50 == 0)


@query(
    "forecast-seasonal-naive",
    """
    WITH d AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_c
      FROM events GROUP BY user_id, day
    )
    SELECT a.user_id,
           count(*) AS n_eval,
           CAST(sum(abs(a.v_c - f.v_c)) AS BIGINT) AS abs_err_sum_c,
           CAST(sum(a.v_c) AS BIGINT) AS actual_sum_c
    FROM d a JOIN d f
      ON a.user_id = f.user_id AND f.day = a.day - INTERVAL 7 DAY
    GROUP BY a.user_id
    """,
)
def forecast_seasonal_naive(spark, sf):
    """Seasonal-naive forecast backtest: predict each user-day's value
    total with the SAME WEEKDAY LAST WEEK and score the per-user MAE —
    the baseline every forecasting pipeline must beat, and the
    denominator of relative-error model metrics (MASE). The lag is a
    calendar self-join on (user, day-7) — NOT lag(7) over a row
    window, which silently misaligns whenever a day is missing —
    evaluated only where the prior week exists (inner join). MAE rides
    as the exact integer pair (abs_err_sum_c, n_eval); actual_sum_c
    enables the relative form. Scale: one map-side-combinable day
    rollup, then a self-equi-join on the REDUCED per-day table —
    both keyed (user, day), no window, no skew beyond the day rollup
    itself."""
    ev = t(spark, sf, "events")
    d = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v_c"))
    a = d.select("user_id", "day", F.col("v_c").alias("av"))
    f = d.select(
        "user_id",
        (F.col("day") + F.expr("INTERVAL 7 DAYS")).alias("day"),
        F.col("v_c").alias("fv"),
    )
    j = a.join(f, ["user_id", "day"])
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs(F.col("av") - F.col("fv"))).alias("abs_err_sum_c"),
        F.sum("av").alias("actual_sum_c"),
    )


@query(
    "rollup-period-over-period",
    """
    WITH m AS (
      SELECT o_custkey % 8 AS seg, date_trunc('month', o_orderdate) AS mon,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c,
             count(*) AS n_orders
      FROM orders GROUP BY seg, mon
    )
    SELECT a.seg, strftime(a.mon, '%Y-%m-%d') AS mon,
           a.rev_c, a.n_orders,
           a.rev_c - mom.rev_c AS mom_delta_c,
           mom.rev_c AS mom_base_c,
           a.rev_c - yoy.rev_c AS yoy_delta_c,
           yoy.rev_c AS yoy_base_c
    FROM m a
    LEFT JOIN m mom ON mom.seg = a.seg
                   AND mom.mon = a.mon - INTERVAL 1 MONTH
    LEFT JOIN m yoy ON yoy.seg = a.seg
                   AND yoy.mon = a.mon - INTERVAL 12 MONTH
    """,
)
def rollup_period_over_period(spark, sf):
    """Month-over-month + year-over-year growth in one pass — the
    standard OLAP reporting shape, computed by CALENDAR self-joins on
    (segment, month - INTERVAL) rather than lag(1)/lag(12) row
    windows, which silently misalign when a month is missing (the
    forecast-seasonal-naive doctrine). Deltas ride as exact integer
    (delta_c, base_c) pairs — consumers divide; missing comparison
    periods stay NULL (LEFT joins), which an outer-join-blind inner
    formulation would silently drop. Scale: one map-side-combinable
    month rollup, then two self-equi-joins on the REDUCED per-month
    table — keyed (seg, month), no window, no global ordering."""
    o = t(spark, sf, "orders")
    m = o.groupBy(
        (F.col("o_custkey") % 8).alias("seg"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    a = m.select("seg", "mon", "rev_c", "n_orders")
    mom = m.select(
        "seg",
        (F.col("mon") + F.expr("INTERVAL 1 MONTH")).alias("mon"),
        F.col("rev_c").alias("mom_base_c"),
    )
    yoy = m.select(
        "seg",
        (F.col("mon") + F.expr("INTERVAL 12 MONTHS")).alias("mon"),
        F.col("rev_c").alias("yoy_base_c"),
    )
    j = a.join(mom, ["seg", "mon"], "left").join(yoy, ["seg", "mon"], "left")
    return j.select(
        "seg",
        F.date_format("mon", "yyyy-MM-dd").alias("mon"),
        "rev_c",
        "n_orders",
        (F.col("rev_c") - F.col("mom_base_c")).alias("mom_delta_c"),
        "mom_base_c",
        (F.col("rev_c") - F.col("yoy_base_c")).alias("yoy_delta_c"),
        "yoy_base_c",
    )


_CAPPED_SUM_ORACLE = """
WITH RECURSIVE v AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT)
           * CASE WHEN event_type IN ('purchase', 'signup') THEN 1
                  ELSE -1 END AS delta,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
  WHERE value IS NOT NULL
),
rec AS (
  SELECT user_id, rn, delta,
         greatest(0, least(20000, delta)) AS bal
  FROM v WHERE rn = 1
  UNION ALL
  SELECT v.user_id, v.rn, v.delta,
         greatest(0, least(20000, rec.bal + v.delta))
  FROM rec JOIN v ON v.user_id = rec.user_id AND v.rn = rec.rn + 1
)
SELECT user_id, rn, delta, bal FROM rec
"""


@query("stateful-capped-sum", _CAPPED_SUM_ORACLE)
def stateful_capped_sum(spark, sf):
    """Two-sided clamped running balance per user — credits (purchase/
    signup cents) push up, debits pull down, the balance saturates in
    [0, 20000]. The clamp recurrence b_i = clamp(b_{i-1}+x_i, lo, hi)
    is NONLINEAR, hence inexpressible as any window aggregate — this
    is the repo's showcase of the stateful-scan operator class
    (boundary-reset mapInPandas over one keyed partitioning) (operators/statescan.py, which also documents the
    window-only closed form for the one-sided case and the
    saturating-affine-monoid parallel scan for a single huge key).
    The oracle replays the recurrence as a DuckDB recursive CTE
    stepping all users one row per iteration. Plan: ONE hash exchange
    on user_id (what any grouped agg pays) + Arrow-batched per-group
    scans; parallelism comes from key count, the 100 TB shape."""
    from genpipe_spark.operators.statescan import capped_running_sum

    ev = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            (
                F.round(F.col("value") * 100).cast("long")
                * F.when(
                    F.col("event_type").isin("purchase", "signup"), 1
                ).otherwise(-1)
            ).alias("delta"),
        )
    )
    out = capped_running_sum(
        ev, keys=["user_id"], order_cols=["ts", "event_id"],
        delta_col="delta", lo=0, hi=20000,
    )
    return out.select("user_id", "rn", "delta", "bal")


_FIFO_ORACLE = """
WITH base AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS qty,
         CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END
           AS is_s
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT user_id, event_id AS supply_id,
         CAST(sum(qty) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) - qty AS s_lo,
         CAST(sum(qty) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS s_hi
  FROM base WHERE is_s = 1
),
d AS (
  SELECT user_id, event_id AS demand_id,
         CAST(sum(qty) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) - qty AS d_lo,
         CAST(sum(qty) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS d_hi
  FROM base WHERE is_s = 0
)
SELECT s.user_id, supply_id, demand_id,
       least(s_hi, d_hi) - greatest(s_lo, d_lo) AS alloc_qty
FROM s JOIN d ON s.user_id = d.user_id
            AND s_lo < d_hi AND d_lo < s_hi
"""


@query("alloc-fifo-lots", _FIFO_ORACLE)
def alloc_fifo_lots(spark, sf):
    """FIFO lot allocation (operators/alloc.fifo_allocate): per user,
    credit events (purchase/signup cents) form supply lots, the rest
    form demand, and each demand row consumes the OLDEST available
    lots. Sequential on its face, but alloc(i, j) is exactly the
    overlap of cumulative-quantity intervals — two per-key prefix-sum
    windows + one per-key range join, all inside whole-stage codegen,
    with output bounded by supplies+demands-1 per key (the merge
    property). The oracle replays the same identity; window sums are
    CAST from DuckDB HUGEINT back to BIGINT (FIXTURES rule). Plan:
    one hash partitioning on user_id shared by both windows and the
    join; keys are the parallelism at 100 TB."""
    from genpipe_spark.operators.alloc import fifo_allocate

    base = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id", "event_id", "ts",
            F.round(F.col("value") * 100).cast("long").alias("qty"),
            F.col("event_type").isin("purchase", "signup").alias("is_s"),
        )
    )
    supply = base.where("is_s")
    demand = base.where("NOT is_s")
    return fifo_allocate(
        supply, demand,
        keys=["user_id"], order_cols=["ts", "event_id"],
        qty_col="qty", supply_id="event_id", demand_id="event_id",
    )


_CAPPED_GLOBAL_ORACLE = """
WITH RECURSIVE d AS (
  SELECT day, delta, row_number() OVER (ORDER BY day) AS rn
  FROM (
    SELECT date_trunc('day', ts) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)
                    * CASE WHEN event_type IN ('purchase', 'signup')
                           THEN 1 ELSE -1 END) AS BIGINT) AS delta
    FROM events WHERE value IS NOT NULL GROUP BY 1
  )
),
rec AS (
  SELECT day, rn, delta,
         greatest(0, least(500000, delta)) AS bal
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.day, d.rn, d.delta,
         greatest(0, least(500000, rec.bal + d.delta))
  FROM rec JOIN d ON d.rn = rec.rn + 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, rn, delta, bal FROM rec
"""


@query("stateful-capped-sum-global", _CAPPED_GLOBAL_ORACLE)
def stateful_capped_sum_global(spark, sf):
    """ONE keyless clamped balance over the whole corpus — the daily
    net cash position saturating in [0, 500000] cents — computed by
    the PARALLEL scan (operators/statescan.capped_running_sum_parallel):
    range-chunk the ordered days, compose each chunk's saturating-
    affine (d, lo, hi) triple, prefix-compose n_chunks triples on the
    driver, replay each chunk from its entry state. This is the
    single-huge-key scale path the per-key operator can't cover:
    the driver sees n_chunks rows regardless of sequence length, and
    data is touched exactly twice. Equality with the sequential
    recurrence is property-tested at random chunk counts; here the
    DuckDB oracle replays the recurrence one day per recursive-CTE
    step. Fixture days are few — the SAME code path splits a
    billion-row sequence 32 ways."""
    from genpipe_spark.operators.statescan import capped_running_sum_parallel

    daily = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.sum(
                F.round(F.col("value") * 100).cast("long")
                * F.when(
                    F.col("event_type").isin("purchase", "signup"), 1
                ).otherwise(-1)
            ).alias("delta")
        )
    )
    out = capped_running_sum_parallel(
        daily, order_cols=["day"], delta_col="delta",
        lo=0, hi=500_000, n_chunks=8,
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "rn", "delta", "bal"
    )


_KM_ORACLE = """
WITH RECURSIVE s0 AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS tp
  FROM events e JOIN s0 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s0.t0 GROUP BY 1
),
z AS (SELECT user_id, max(ts) AS tz FROM events GROUP BY 1),
subj AS (
  SELECT s0.user_id % 4 AS cohort,
         date_diff('day', CAST(t0 AS DATE),
                   CAST(coalesce(tp, tz) AS DATE)) AS dur,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
  FROM s0 LEFT JOIN p USING (user_id) JOIN z USING (user_id)
),
cell AS (
  SELECT cohort, dur,
         CAST(sum(obs) AS BIGINT) AS n_event,
         CAST(sum(1 - obs) AS BIGINT) AS n_censor,
         row_number() OVER (PARTITION BY cohort ORDER BY dur) AS rn
  FROM subj GROUP BY 1, 2
),
risk AS (
  SELECT *,
         CAST(sum(n_event + n_censor) OVER (PARTITION BY cohort)
              - coalesce(sum(n_event + n_censor) OVER (
                  PARTITION BY cohort ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
  FROM cell
),
rec AS (
  SELECT cohort, rn, dur, n_risk, n_event, n_censor,
         1.0 - CAST(n_event AS DOUBLE) / CAST(n_risk AS DOUBLE) AS s
  FROM risk WHERE rn = 1
  UNION ALL
  SELECT r.cohort, r.rn, r.dur, r.n_risk, r.n_event, r.n_censor,
         rec.s * (1.0 - CAST(r.n_event AS DOUBLE)
                        / CAST(r.n_risk AS DOUBLE))
  FROM rec JOIN risk r ON r.cohort = rec.cohort AND r.rn = rec.rn + 1
)
SELECT cohort, dur, n_risk, n_event, n_censor,
       CAST(floor(s * 1000000.0) AS BIGINT) AS surv_micro
FROM rec
"""


@query("survival-kaplan-meier", _KM_ORACLE)
def survival_kaplan_meier(spark, sf):
    """Kaplan-Meier time-to-conversion with right censoring
    (operators/survival.km_survival): per cohort (user_id % 4), the
    survival curve of days from first signup to first subsequent
    purchase, censoring never-converters at their last observed
    event. Everything up to the product limit is declarative (one
    grouped count collapses subjects to grouped-size (cohort, dur)
    cells, one per-cohort window builds risk sets); the float product
    rides the stateful-scan class in pinned IEEE order — one divide,
    one subtract, one multiply per step — so the recursive-CTE oracle
    matches surv_micro bit-for-bit (the pinned-double doctrine).
    Scale: the scan input is cohorts x distinct durations, thousands
    of rows at ANY corpus size; only the first count touches the
    scan."""
    from genpipe_spark.operators.survival import km_survival

    ev = t(spark, sf, "events")
    s0 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    pur = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    tp = (
        s0.join(pur, "user_id")
        .where(F.col("ts") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    tz = ev.groupBy("user_id").agg(F.max("ts").alias("tz"))
    subj = (
        s0.join(tp, "user_id", "left")
        .join(tz, "user_id")
        .select(
            (F.col("user_id") % 4).alias("cohort"),
            F.datediff(
                F.coalesce(F.col("tp"), F.col("tz")).cast("date"),
                F.col("t0").cast("date"),
            ).alias("dur"),
            F.col("tp").isNotNull().cast("int").alias("obs"),
        )
    )
    return km_survival(subj, keys=["cohort"], dur_col="dur", observed_col="obs")


_EWMA_ORACLE = """
WITH RECURSIVE v AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events WHERE value IS NOT NULL
),
rec AS (
  SELECT user_id, rn, x, CAST(x AS DOUBLE) AS s FROM v WHERE rn = 1
  UNION ALL
  SELECT v.user_id, v.rn, v.x,
         0.25 * CAST(v.x AS DOUBLE) + 0.75 * rec.s
  FROM rec JOIN v ON v.user_id = rec.user_id AND v.rn = rec.rn + 1
)
SELECT user_id, rn, x, CAST(floor(s * 1000000.0) AS BIGINT) AS ewma_micro
FROM rec
"""


@query("timeseries-ewma", _EWMA_ORACLE)
def timeseries_ewma(spark, sf):
    """Per-user exponentially weighted moving average of event value
    cents, alpha = 0.25 (operators/statescan.ewma_scan — the LINEAR
    member of the stateful-scan class). The pow()-based closed form
    is window-expressible but libm-unstable across engines; the scan
    evaluates s = 0.25*x + 0.75*s in pinned IEEE order with
    binary-exact coefficient literals, so the recursive-CTE oracle
    matches ewma_micro bit-for-bit. Same single grouped-agg shuffle
    as any per-key scan; keys are the parallelism."""
    from genpipe_spark.operators.statescan import ewma_scan

    ev = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("x"),
        )
    )
    out = ewma_scan(
        ev, keys=["user_id"], order_cols=["ts", "event_id"],
        value_col="x", alpha=0.25,
    )
    return out.select("user_id", "rn", "x", "ewma_micro")


_HOLT_ORACLE = """
WITH RECURSIVE v AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events WHERE value IS NOT NULL
),
rec AS (
  SELECT user_id, rn, x,
         CAST(x AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
  FROM v WHERE rn = 1
  UNION ALL
  SELECT v.user_id, v.rn, v.x,
         0.25 * CAST(v.x AS DOUBLE) + 0.75 * (rec.l + rec.b),
         0.5 * ((0.25 * CAST(v.x AS DOUBLE) + 0.75 * (rec.l + rec.b))
                - rec.l)
           + 0.5 * rec.b
  FROM rec JOIN v ON v.user_id = rec.user_id AND v.rn = rec.rn + 1
)
SELECT user_id, rn, x,
       CAST(floor(l * 1000000.0) AS BIGINT) AS level_micro,
       CAST(floor(b * 1000000.0) AS BIGINT) AS trend_micro
FROM rec
"""


@query("timeseries-holt", _HOLT_ORACLE)
def timeseries_holt(spark, sf):
    """Holt level+trend double-exponential smoothing per user
    (operators/statescan.holt_scan, alpha=0.25, beta=0.5 — both
    binary-exact): the TWO-state member of the stateful-scan class,
    forecast-ready (one-step-ahead = level + trend). The oracle
    recursive CTE replays the identical pinned-IEEE op sequence —
    the l_i subexpression is recomputed inside b_i's expression and
    is bitwise-identical by determinism of IEEE ops — so
    level_micro/trend_micro match bit-for-bit. floor (not trunc):
    trends go negative."""
    from genpipe_spark.operators.statescan import holt_scan

    ev = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("x"),
        )
    )
    out = holt_scan(
        ev, keys=["user_id"], order_cols=["ts", "event_id"],
        value_col="x", alpha=0.25, beta=0.5,
    )
    return out.select("user_id", "rn", "x", "level_micro", "trend_micro")


_LINEAR_ATTR_ORACLE = """
WITH conv AS (
  SELECT user_id, event_id AS conv_id, ts AS cts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_id AS touch_id, ts AS tts
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT c.user_id, conv_id, touch_id,
         row_number() OVER (
           PARTITION BY conv_id ORDER BY tts DESC, touch_id
         ) AS pos,
         count(*) OVER (PARTITION BY conv_id) AS n_touches
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id
   AND t.tts <= c.cts
   AND t.tts >= c.cts - INTERVAL 7 DAY
)
SELECT user_id, conv_id, touch_id, pos, n_touches,
       1000000 // n_touches
         + CASE WHEN pos <= 1000000 % n_touches THEN 1 ELSE 0 END
         AS credit_micro
FROM j
"""


@query("attribution-linear", _LINEAR_ATTR_ORACLE)
def attribution_linear(spark, sf):
    """Linear multi-touch attribution — each purchase's credit split
    EXACTLY across every click/view in the prior 7 days: integer
    micro-credits via per-conversion largest remainder (floor share +
    1 extra micro-unit to the first ``1e6 mod n`` touches, recency
    first), so sum(credit_micro) == 1,000,000 per conversion BY
    CONSTRUCTION — no float leakage, engine-exact (the
    alloc-largest-remainder doctrine applied per group). Complements
    attribution-last-touch (the degenerate n=1 policy). Plan: one
    user-keyed range join (touches per user bounded by activity, keys
    are the parallelism) + one conversion-keyed window — two keyed
    shuffles, no global ordering anywhere."""
    ev = t(spark, sf, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), F.col("ts").alias("cts")
    )
    touch = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("event_id").alias("touch_id"), F.col("ts").alias("tts")
    )
    from pyspark.sql import Window

    j = conv.join(touch, "user_id").where(
        (F.col("tts") <= F.col("cts"))
        & (F.col("tts") >= F.col("cts") - F.expr("INTERVAL 7 DAYS"))
    )
    w = Window.partitionBy("conv_id")
    wo = w.orderBy(F.col("tts").desc(), "touch_id")
    j = j.select(
        "user_id", "conv_id", "touch_id",
        F.row_number().over(wo).alias("pos"),
        F.count(F.lit(1)).over(w).alias("n_touches"),
    )
    return j.select(
        "user_id", "conv_id", "touch_id", "pos", "n_touches",
        (
            F.expr("1000000 div n_touches")
            + F.when(
                F.col("pos") <= F.expr("1000000 % n_touches"), 1
            ).otherwise(0)
        ).alias("credit_micro"),
    )


_DRAWDOWN_ORACLE = """
WITH v AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type IN ('purchase', 'click')
              THEN CAST(round(value * 100) AS BIGINT)
              ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
  FROM events WHERE value IS NOT NULL
),
eq AS (
  SELECT user_id, ts, event_id,
         CAST(sum(delta) OVER w AS BIGINT) AS equity
  FROM v
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
d0 AS (
  SELECT user_id, equity,
         CAST(max(equity) OVER w AS BIGINT) - equity AS drawdown
  FROM eq
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
dd AS (
  SELECT user_id, equity, drawdown,
         CAST(max(drawdown) OVER (PARTITION BY user_id) AS BIGINT) AS max_dd
  FROM d0
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(equity + drawdown) AS BIGINT) AS peak_cents,
       CAST(max(drawdown) AS BIGINT) AS max_drawdown_cents,
       CAST(min(CASE WHEN drawdown = max_dd THEN equity END) AS BIGINT)
         AS equity_at_max_dd
FROM dd
GROUP BY user_id
"""


@query("timeseries-drawdown", _DRAWDOWN_ORACLE)
def timeseries_drawdown(spark, sf):
    """Per-user running-peak / max-drawdown audit over the signed event
    cashflow (purchases+clicks credit, everything else debits) — the
    risk metric every portfolio/inventory monitor computes. Exact
    int64 cents end-to-end: equity is a windowed prefix sum, the
    running peak a max over the SAME (ts, event_id) ordering (two
    stacked windows over one sort — the lower_clamped_running_sum
    layout, statescan.py doctrine), drawdown = peak - equity, then one
    map-side-combinable grouped agg. equity_at_max_dd is made
    tie-deterministic by construction: the per-user max drawdown rides
    a third (whole-partition, same keys → no extra shuffle) window and
    the agg takes min(equity) over exactly the rows achieving it —
    identical min-over-filtered-set semantics in both engines, no
    arg_min/min_by tie ambiguity."""
    from pyspark.sql import Window

    v = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            F.when(
                F.col("event_type").isin("purchase", "click"),
                F.round(F.col("value") * 100).cast("long"),
            )
            .otherwise(-F.round(F.col("value") * 100).cast("long"))
            .alias("delta"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = (
        v.withColumn("equity", F.sum("delta").over(w))
        .withColumn("drawdown", F.max("equity").over(w) - F.col("equity"))
        .withColumn("max_dd", F.max("drawdown").over(Window.partitionBy("user_id")))
    )
    return dd.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("equity") + F.col("drawdown")).alias("peak_cents"),
        F.max("drawdown").alias("max_drawdown_cents"),
        F.min(
            F.when(F.col("drawdown") == F.col("max_dd"), F.col("equity"))
        ).alias("equity_at_max_dd"),
    )


# CUSUM drift allowance and alarm threshold, in cents. Fixed literals on
# both sides; chosen so the fixture actually fires some alarms (mean
# event value is ~50 dollars) without firing on every row.
_CUSUM_K = 4000
_CUSUM_H = 25000

def _cusum_oracle() -> str:
    # the running min must follow event order; both directions share the
    # one (ts, event_id) window
    return f"""
WITH v AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
),
p AS (
  SELECT user_id, ts, event_id,
         CAST(sum(x - {_CUSUM_K}) OVER w AS BIGINT) AS pu,
         CAST(sum({_CUSUM_K} - x) OVER w AS BIGINT) AS pd
  FROM v
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT user_id,
         pu - least(CAST(0 AS BIGINT), CAST(min(pu) OVER w AS BIGINT)) AS su,
         pd - least(CAST(0 AS BIGINT), CAST(min(pd) OVER w AS BIGINT)) AS sd,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(su) AS BIGINT) AS max_up,
       CAST(max(sd) AS BIGINT) AS max_down,
       CAST(count(*) FILTER (WHERE su > {_CUSUM_H}) AS BIGINT) AS n_alarm_up,
       CAST(count(*) FILTER (WHERE sd > {_CUSUM_H}) AS BIGINT) AS n_alarm_down,
       CAST(coalesce(min(CASE WHEN su > {_CUSUM_H} THEN rn END), -1) AS BIGINT)
         AS first_alarm_up_rn
FROM s
GROUP BY user_id
"""


@query("timeseries-cusum", _cusum_oracle())
def timeseries_cusum(spark, sf):
    """Per-user two-sided CUSUM changepoint statistic over event value
    cents (Page 1954): s+_i = max(0, s+_{i-1} + (x_i - k)) detects
    upward level shifts, s-_i the mirror image, alarm when either
    crosses h. The recurrence is the floor-at-zero clamped running
    sum, so it stays FULLY window-expressible via the closed form
    s_i = p_i - min(0, running_min(p_i)) over the raw prefix sum
    (operators/statescan.lower_clamped_running_sum doctrine) — no
    Python scan needed; both directions plus the row counter share ONE
    (user_id, ts, event_id) sort. Exact int64 cents; per-user alarm
    counts, extreme statistics, and first-alarm position (sentinel -1
    when a user never alarms) come from one map-side-combinable agg."""
    from pyspark.sql import Window

    k = F.lit(_CUSUM_K)
    v = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("x"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # windows don't nest: materialize prefix sums, then running-min them
    # (all windows share one partitioning+ordering — ONE sort)
    p = v.select(
        "user_id",
        F.sum(F.col("x") - k).over(w).alias("pu"),
        F.sum(k - F.col("x")).over(w).alias("pd"),
        F.row_number().over(wo).alias("rn"),
        "ts", "event_id",
    )
    s = p.select(
        "user_id", "rn",
        (F.col("pu") - F.least(F.lit(0), F.min("pu").over(w))).alias("su"),
        (F.col("pd") - F.least(F.lit(0), F.min("pd").over(w))).alias("sd"),
    )
    h = F.lit(_CUSUM_H)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("su").alias("max_up"),
        F.max("sd").alias("max_down"),
        F.sum(F.when(F.col("su") > h, 1).otherwise(0)).alias("n_alarm_up"),
        F.sum(F.when(F.col("sd") > h, 1).otherwise(0)).alias("n_alarm_down"),
        F.coalesce(
            F.min(F.when(F.col("su") > h, F.col("rn"))), F.lit(-1)
        ).alias("first_alarm_up_rn"),
    )


_INTERP_ORACLE = """
WITH b AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS bidx,
         count(*) AS n_events,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents_known
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT user_id, unnest(range(lo, hi + 1)) AS bidx
  FROM (SELECT user_id, min(bidx) AS lo, max(bidx) AS hi
        FROM b GROUP BY user_id)
),
dense AS (
  SELECT spine.user_id, spine.bidx,
         COALESCE(b.n_events, 0) AS n_events, b.cents_known
  FROM spine LEFT JOIN b
    ON spine.user_id = b.user_id AND spine.bidx = b.bidx
),
hull AS (
  SELECT user_id, bidx, n_events, cents_known,
         last_value(cents_known IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN cents_known IS NOT NULL THEN bidx END
                    IGNORE NULLS) OVER wp AS pb,
         first_value(cents_known IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN cents_known IS NOT NULL THEN bidx END
                     IGNORE NULLS) OVER wn AS nb
  FROM dense
  WINDOW wp AS (PARTITION BY user_id ORDER BY bidx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY bidx
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bidx * 3600000000 AS bucket_start_us, n_events, cents_known,
       CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
         CASE WHEN nb = pb THEN pv * 10000
              ELSE (num - ((num % (nb - pb)) + (nb - pb)) % (nb - pb))
                     // (nb - pb) END
       END AS interp_micro
FROM (SELECT *, (pv*(nb-bidx) + nv*(bidx-pb)) * 10000 AS num FROM hull)
"""


@query("rollup-interpolate-linear", _INTERP_ORACLE)
def rollup_interpolate_linear(spark, sf):
    """Hourly per-user series with LINEAR interpolation across empty
    buckets (operators/timegrid.time_bucket_interpolate) — the third
    gapfill mode next to rollup-gapfill's zero-fill and LOCF. The
    interpolant is the exact int64 rational
    (p*(nb-b) + q*(b-pb)) * 10^4 / (nb-pb) micro-dollars under floor
    division on BOTH sides (Spark: pmod-adjusted DIV; oracle: the
    same pmod adjustment around DuckDB's truncating //, since bare //
    truncates toward zero and would diverge on negative numerators —
    round-7 advisory); no float enters, so the hash check pins the
    full hull semantics including the NULL edges before the first /
    after the last known bucket."""
    from genpipe_spark.operators.timegrid import time_bucket_interpolate

    return time_bucket_interpolate(
        t(spark, sf, "events"), ts_col="ts", value_col="value",
        by=("user_id",), bucket_s=3600,
    )


_DECAY_ATTR_ORACLE = """
WITH conv AS (
  SELECT user_id, event_id AS conv_id, cts FROM (
    SELECT user_id, event_id, ts AS cts
    FROM events WHERE event_type = 'purchase')
),
touch AS (
  SELECT user_id, event_id AS touch_id, ts AS tts
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT c.user_id, conv_id, touch_id,
         (epoch_us(cts) - epoch_us(tts)) // 86400000000 AS age_days,
         row_number() OVER (
           PARTITION BY conv_id ORDER BY tts DESC, touch_id
         ) AS pos
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id
   AND t.tts <= c.cts
   AND t.tts >= c.cts - INTERVAL 7 DAY
),
wgt AS (
  SELECT user_id, conv_id, touch_id, age_days, pos,
         CAST(64 // (1 << least(age_days, 6)) AS BIGINT) AS w,
         CAST(sum(64 // (1 << least(age_days, 6)))
              OVER (PARTITION BY conv_id) AS BIGINT) AS wtot
  FROM j
),
base AS (
  SELECT *, (1000000 * w) // wtot AS floor_credit,
         (1000000 * w) % wtot AS rem,
         CAST(sum((1000000 * w) // wtot) OVER (PARTITION BY conv_id)
              AS BIGINT) AS floor_sum
  FROM wgt
)
SELECT user_id, conv_id, touch_id, age_days, pos, w, wtot,
       floor_credit
         + CASE WHEN row_number() OVER (
                  PARTITION BY conv_id ORDER BY rem DESC, pos
                ) <= 1000000 - floor_sum THEN 1 ELSE 0 END
         AS credit_micro
FROM base
"""


@query("attribution-time-decay", _DECAY_ATTR_ORACLE)
def attribution_time_decay(spark, sf):
    """Time-decay multi-touch attribution with a one-day half-life —
    the third attribution policy beside last-touch and linear. The
    decay weight 2^-age_days is a DYADIC rational, so scaling by 2^6
    makes every weight an exact integer (64, 32, ..., 1; ages beyond
    6 days clamp to weight 1): 'exponential decay' with ZERO float —
    the trick that keeps attribution exact where a pow()-based weight
    would be libm-unstable. Credits then split by per-conversion
    largest remainder over the integer weights (floor share + 1
    micro-unit to the largest remainders, recency-first tie-break), so
    sum(credit_micro) == 1,000,000 per conversion by construction.
    Plan: the attribution-linear join + TWO conversion-keyed windows
    (weight total + remainder rank) sharing one partitioning."""
    from pyspark.sql import Window

    ev = t(spark, sf, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), F.col("ts").alias("cts")
    )
    touch = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("event_id").alias("touch_id"), F.col("ts").alias("tts")
    )
    j = conv.join(touch, "user_id").where(
        (F.col("tts") <= F.col("cts"))
        & (F.col("tts") >= F.col("cts") - F.expr("INTERVAL 7 DAYS"))
    )
    wp = Window.partitionBy("conv_id")
    j = j.select(
        "user_id", "conv_id", "touch_id",
        F.expr(
            "(unix_micros(cts) - unix_micros(tts)) div 86400000000"
        ).alias("age_days"),
        F.row_number().over(wp.orderBy(F.col("tts").desc(), "touch_id")).alias("pos"),
    )
    w_col = F.expr("64 div (shiftleft(1, least(age_days, 6)))").cast("long")
    wgt = j.select(
        "user_id", "conv_id", "touch_id", "age_days", "pos",
        w_col.alias("w"),
    ).withColumn("wtot", F.sum("w").over(wp))
    base = (
        wgt.withColumn("floor_credit", F.expr("(1000000 * w) div wtot"))
        .withColumn("rem", F.expr("(1000000 * w) % wtot"))
        .withColumn("floor_sum", F.sum(F.expr("(1000000 * w) div wtot")).over(wp))
    )
    extra_rank = F.row_number().over(wp.orderBy(F.col("rem").desc(), "pos"))
    return base.select(
        "user_id", "conv_id", "touch_id", "age_days", "pos", "w", "wtot",
        (
            F.col("floor_credit")
            + F.when(extra_rank <= F.lit(1_000_000) - F.col("floor_sum"), 1)
            .otherwise(0)
        ).alias("credit_micro"),
    )


def _hw_oracle() -> str:
    # binary-exact coefficients: a=0.25, b=0.5, g=0.25; period 7.
    # L2 is textually repeated wherever the scan reads the new level —
    # IEEE determinism makes the recomputation bitwise identical
    # (the timeseries-holt doctrine, now with a LIST seasonal ring).
    L2 = "(0.25*(CAST(r.x AS DOUBLE) - rec.seas[1]) + 0.75*(rec.l + rec.b))"
    return f"""
WITH RECURSIVE v AS (
  SELECT user_id % 10 AS k, epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
r AS (
  SELECT k, x, row_number() OVER (PARTITION BY k ORDER BY day) AS rn
  FROM v
),
rec AS (
  SELECT k, rn, x,
         CAST(x AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b,
         CAST([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS DOUBLE[]) AS seas,
         CAST(0.0 AS DOUBLE) AS scur
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.k, r.rn, r.x,
         {L2},
         0.5*({L2} - rec.l) + 0.5*rec.b,
         list_concat(rec.seas[2:7],
           [0.25*(CAST(r.x AS DOUBLE) - {L2}) + 0.75*rec.seas[1]]),
         0.25*(CAST(r.x AS DOUBLE) - {L2}) + 0.75*rec.seas[1]
  FROM rec JOIN r ON r.k = rec.k AND r.rn = rec.rn + 1
)
SELECT k, rn, x,
       CAST(floor(l * 1000000.0) AS BIGINT) AS level_micro,
       CAST(floor(b * 1000000.0) AS BIGINT) AS trend_micro,
       CAST(floor(scur * 1000000.0) AS BIGINT) AS seasonal_micro
FROM rec
"""


@query("timeseries-holt-winters", _hw_oracle())
def timeseries_holt_winters(spark, sf):
    """Additive Holt-Winters with weekly seasonality over per-cohort
    daily revenue (operators/statescan.holt_winters_scan, alpha=0.25,
    beta=0.5, gamma=0.25, period=7 — all binary-exact): the
    VECTOR-state member of the stateful-scan class. The per-key state
    is level + trend + a 7-slot seasonal ring; the DuckDB twin is a
    recursive CTE whose state row carries a LIST column rotated with
    list_concat(seas[2:7], [s_new]) — level/trend/seasonal micro all
    match bit-for-bit because every coefficient is dyadic and the CTE
    replays the identical pinned-IEEE op sequence (the new level's
    subexpression is textually recomputed wherever read). Input is
    the grouped-size daily reduction (the capped-sum-global rollup
    pattern), so the recursion steps #days, not #rows."""
    from genpipe_spark.operators.statescan import holt_winters_scan

    v = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 10).alias("k"),
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    )
    out = holt_winters_scan(
        v, keys=["k"], order_cols=["day"], value_col="x",
        alpha=0.25, beta=0.5, gamma=0.25, period=7,
    )
    return out.select(
        "k", "rn", "x", "level_micro", "trend_micro", "seasonal_micro"
    )


_LTOB_K = 20

_LTOB_ORACLE = f"""
WITH v AS (
  SELECT user_id, epoch_us(ts) AS x,
         CAST(round(value * 100) AS BIGINT) AS y,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE value IS NOT NULL
),
tri AS (
  SELECT user_id, rn, n, x, y,
         ((rn - 1) * {_LTOB_K}) // n AS bucket,
         CASE WHEN rn = 1 OR rn = n THEN NULL ELSE
           abs((lag(x) OVER w - lead(x) OVER w) * (y - lag(y) OVER w)
               - (lag(x) OVER w - x) * (lead(y) OVER w - lag(y) OVER w))
         END AS area2
  FROM v
  WINDOW w AS (PARTITION BY user_id ORDER BY rn)
),
pick AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY user_id, bucket
           ORDER BY (area2 IS NULL) DESC, area2 DESC, rn
         ) AS pr
  FROM tri
)
SELECT user_id, bucket, rn, x AS ts_us, y AS cents,
       CAST(coalesce(area2, -1) AS BIGINT) AS area2
FROM pick WHERE pr = 1
"""


@query("rollup-lttb-downsample", _LTOB_ORACLE)
def rollup_lttb_downsample(spark, sf):
    """Largest-Triangle-One-Bucket downsampling (Steinarsson 2013) —
    the shape-preserving decimation dashboards use: each user's series
    shrinks to <= 20 points (_LTOB_K), keeping per bucket the point whose
    triangle with its immediate neighbors has the largest area (the
    visually salient extremes survive; a plain every-Nth sample would
    erase spikes). LTOB, not LTTB: neighbor-based areas are pure
    lag/lead expressions — fully declarative, no sequential dependence
    on previously selected points, so the whole operator is ONE
    user-keyed sort shared by three windows + a rank filter. Exact
    int64 doubled-areas (timestamp deltas x cents stay < 2^62);
    endpoints always win their buckets via the NULL-area-first rank;
    ties break to the earliest point identically in both engines."""
    from pyspark.sql import Window

    v = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("x"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
            "ts", "event_id",
        )
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = v.select(
        "user_id", "x", "y",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    wr = Window.partitionBy("user_id").orderBy("rn")
    xp, yp = F.lag("x").over(wr), F.lag("y").over(wr)
    xn, yn = F.lead("x").over(wr), F.lead("y").over(wr)
    area2 = F.when(
        (F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(None)
    ).otherwise(
        F.abs((xp - xn) * (F.col("y") - yp) - (xp - F.col("x")) * (yn - yp))
    )
    tri = v.select(
        "user_id", "rn", "n", "x", "y",
        F.expr(f"((rn - 1) * {_LTOB_K}) div n").alias("bucket"),
        area2.alias("area2"),
    )
    pr = F.row_number().over(
        Window.partitionBy("user_id", "bucket").orderBy(
            F.col("area2").isNull().desc(), F.col("area2").desc(), "rn"
        )
    )
    return (
        tri.withColumn("pr", pr)
        .where(F.col("pr") == 1)
        .select(
            "user_id", "bucket", "rn",
            F.col("x").alias("ts_us"), F.col("y").alias("cents"),
            F.coalesce("area2", F.lit(-1)).alias("area2"),
        )
    )


_LTTB_K = 8


def _lttb_oracle(k: int) -> str:
    """Generated DuckDB twin of operators/timegrid.lttb_downsample —
    the SEQUENTIAL selection unrolled into k-2 chained CTEs (each
    bucket's argmax joins the previous selection), which resolves the
    recursive-CTE question from VERDICT r7 item 6 without recursion:
    k is a fixed query constant, so the recurrence depth is static.
    Scores in HUGEINT (the multiplied-through integer area reaches
    ~1e21); deterministic argmax via lexicographic struct max
    (score, -rn). Chained CTEs are AS MATERIALIZED: each sel_i is
    referenced twice by sel_{i+1} (prev row + candidate join), and
    DuckDB inlines plain CTEs — un-materialized, the chain
    re-evaluates 2^(k-2)-fold (found at sf10: 45 GB of spill before
    ENOSPC; materialized it runs in seconds). Empty buckets (series shorter than k) carry the
    previous selection forward un-emitted (`fresh`); a 2+-row bucket
    implies no empty buckets (div-spread surjectivity), so the NULL
    next-average never decides between candidates."""
    parts = [f"""
WITH base AS (
  SELECT user_id % 37 AS g, epoch_us(ts) AS x,
         CAST(round(value * 100) AS BIGINT) AS y,
         row_number() OVER (PARTITION BY user_id % 37
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id % 37) AS n
  FROM events WHERE value IS NOT NULL
),
v AS MATERIALIZED (
  SELECT g, rn, n, x, y,
         CASE WHEN rn > 1 AND rn < n
              THEN ((rn - 2) * {k - 2}) // (n - 2) END AS b
  FROM base
),
fst AS MATERIALIZED (SELECT g, rn, x, y FROM v WHERE rn = 1),
lst AS MATERIALIZED (SELECT g, rn, x, y FROM v WHERE rn = n AND n >= 2)"""]
    for i in range(1, k - 2):
        parts.append(f""",
nb_{i} AS MATERIALIZED (
  SELECT g, CAST(count(*) AS HUGEINT) AS m,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy
  FROM v WHERE b = {i} GROUP BY g
)""")
    for i in range(0, k - 2):
        prev = "fst" if i == 0 else f"sel_{i - 1}"
        if i < k - 3:
            nxt_join = f"LEFT JOIN nb_{i + 1} nx ON nx.g = c.g"
            m_e, sx_e, sy_e = "nx.m", "nx.sx", "nx.sy"
        else:
            nxt_join = "JOIN lst nx ON nx.g = c.g"
            m_e = "CAST(1 AS HUGEINT)"
            sx_e, sy_e = "CAST(nx.x AS HUGEINT)", "CAST(nx.y AS HUGEINT)"
        pick = (
            f"max(struct_pack("
            f"s := abs(({m_e} * p2.x - {sx_e}) * (c.y - p2.y)"
            f" - (p2.x - c.x) * ({sy_e} - {m_e} * p2.y)),"
            f" nr := -c.rn, rn := c.rn, x := c.x, y := c.y))"
        )
        parts.append(f""",
sel_{i} AS MATERIALIZED (
  SELECT p.g,
         coalesce(w.rn, p.rn) AS rn,
         coalesce(w.x, p.x) AS x,
         coalesce(w.y, p.y) AS y,
         w.rn IS NOT NULL AS fresh
  FROM {prev} p LEFT JOIN (
    SELECT c.g, ({pick}).rn AS rn, ({pick}).x AS x, ({pick}).y AS y
    FROM v c JOIN {prev} p2 ON p2.g = c.g {nxt_join}
    WHERE c.b = {i}
    GROUP BY c.g
  ) w ON w.g = p.g
)""")
    union = ["SELECT g, CAST(-1 AS BIGINT) AS sel_idx, rn, x, y FROM fst"]
    for i in range(0, k - 2):
        union.append(f"SELECT g, {i}, rn, x, y FROM sel_{i} WHERE fresh")
    union.append(f"SELECT g, {k - 2}, rn, x, y FROM lst")
    parts.append("\n" + "\nUNION ALL ".join(union))
    return "".join(parts)


@query("rollup-lttb-proper", _lttb_oracle(_LTTB_K))
def rollup_lttb_proper(spark, sf):
    """LTTB proper (Largest-Triangle-THREE-Buckets, Steinarsson 2013)
    — the sequential downsampler next to rollup-lttb-downsample's
    declarative LTOB: each interior bucket keeps the point maximizing
    the triangle against the PREVIOUSLY SELECTED point and the next
    bucket's average, so spikes survive relative to what the eye has
    already been shown. operators/timegrid.lttb_downsample runs it as
    a statescan-class per-key scan (hash shuffle + boundary-reset
    mapInPandas, two-bucket buffer) with the comparison multiplied
    through by the next bucket's count — exact arbitrary-precision
    integers, which is what makes the unrolled k-2-stage DuckDB twin
    (HUGEINT) replay the selection bit-for-bit. Series key
    user_id % 37 gives ~e3-row series per key at bench SFs."""
    from genpipe_spark.operators.timegrid import lttb_downsample

    ev = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 37).alias("g"),
            F.unix_micros("ts").alias("x"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
            "ts", "event_id",
        )
    )
    return lttb_downsample(
        ev, keys=["g"], order_cols=["ts", "event_id"],
        x_col="x", y_col="y", k=_LTTB_K,
    )


_RFM_ORACLE = """
WITH base AS (
  SELECT user_id,
         CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS f_n,
         CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
                FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT)
           AS m_cents
  FROM events GROUP BY user_id
),
anchor AS (SELECT CAST(max(last_us) AS BIGINT) AS now_us FROM base),
rfm AS (
  SELECT user_id,
         (now_us - last_us) // 86400000000 AS r_days, f_n, m_cents
  FROM base CROSS JOIN anchor
)
SELECT user_id, r_days, f_n, m_cents,
       CAST(ntile(5) OVER (ORDER BY r_days DESC, user_id) AS BIGINT)
         AS r_score,
       CAST(ntile(5) OVER (ORDER BY f_n ASC, user_id) AS BIGINT) AS f_score,
       CAST(ntile(5) OVER (ORDER BY m_cents ASC, user_id) AS BIGINT)
         AS m_score
FROM rfm
"""


def _ntile_from_rank(rn: str, n: str, k: int) -> F.Column:
    """Invert ntile(k) from a global 1-based rank ``rn`` over ``n``
    rows — pure integer arithmetic, identical to the SQL-standard
    bucket layout (the first n%k buckets get ceil(n/k) rows, the rest
    floor(n/k)): with q = n div k, r = n % k, ranks <= r*(q+1) fall in
    the big buckets (ceil-divide by q+1), the rest continue in
    q-sized buckets after them. q = 0 (n < k) degenerates to
    bucket = rank via the first branch."""
    q, r = f"({n} div {k})", f"({n} % {k})"
    return F.expr(
        f"CASE WHEN {rn} <= {r} * ({q} + 1)"
        f" THEN ({rn} + {q}) div ({q} + 1)"
        f" ELSE {r} + ({rn} - {r} * ({q} + 1) + {q} - 1) div {q} END"
    ).cast("long")


@query("rfm-segmentation", _RFM_ORACLE)
def rfm_segmentation(spark, sf):
    """RFM customer segmentation — recency (days since last activity,
    against the corpus max as the deterministic 'now'), frequency
    (purchase count) and monetary (purchase cents), each scored into
    quintiles: the standard marketing/churn segmentation grid. Exact
    integers throughout; ntile ties are made deterministic by the
    (metric, user_id) total order, which the oracle replays verbatim
    (higher score = better: most recent / most frequent / highest
    spend land in bucket 5).

    Scale shape (r8 — replaces three unpartitioned ntile windows that
    each forced the whole user table through ONE reducer, the round-7
    `weak`): the three metrics are STACKED long-format
    (user_id, metric_id, value — 3n narrow rows) so ONE
    operators/relational.global_row_number pass over the total order
    (metric_id, value, user_id) numbers all three sorts together
    (range shuffle + per-partition numbering + broadcast offset table
    — no single-reducer Window); per-metric rank = global_rn −
    (metric_id−1)·n, pivoted back with one grouped agg. Result is
    bit-identical to the oracle's ntile — same bucket boundaries, same
    (metric, user_id) tie order — but every sort is
    partition-parallel, and the whole query costs one extra shuffle of
    a 3-long-column user-grained table instead of three chained
    numbering passes (first r8 form: 3 chains = 2.5 s at sf0.1; this
    form ~1 s)."""
    from genpipe_spark.operators.relational import global_row_number

    base = t(spark, sf, "events").groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("f_n"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                )
            ),
            F.lit(0),
        ).alias("m_cents"),
    )
    anchor = base.agg(
        F.max("last_us").alias("now_us"),
        F.count(F.lit(1)).alias("__n"),
    )
    rfm = base.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.expr("(now_us - last_us) div 86400000000").alias("r_days"),
        "f_n", "m_cents", "__n",
        # ORDER BY r_days DESC == ORDER BY -r_days ASC (int negate is
        # exact; r_days >= 0 so no MIN_LONG edge)
        F.expr("-((now_us - last_us) div 86400000000)").alias("__negr"),
    )
    # the union branches and the final join share one materialization
    rfm = rfm.localCheckpoint(eager=False)
    long = (
        rfm.select("user_id", F.lit(1).alias("__mid"),
                   F.col("__negr").alias("__v"))
        .unionAll(rfm.select("user_id", F.lit(2), "f_n"))
        .unionAll(rfm.select("user_id", F.lit(3), "m_cents"))
    )
    ranked = global_row_number(long, ["__mid", "__v", "user_id"],
                               alias="__grn")
    ranks = ranked.groupBy("user_id").agg(
        F.max(F.when(F.col("__mid") == 1, F.col("__grn"))).alias("__g_r"),
        F.max(F.when(F.col("__mid") == 2, F.col("__grn"))).alias("__g_f"),
        F.max(F.when(F.col("__mid") == 3, F.col("__grn"))).alias("__g_m"),
    )
    return rfm.join(ranks, "user_id").select(
        "user_id", "r_days", "f_n", "m_cents",
        _ntile_from_rank("__g_r", "__n", 5).alias("r_score"),
        _ntile_from_rank("(__g_f - __n)", "__n", 5).alias("f_score"),
        _ntile_from_rank("(__g_m - 2 * __n)", "__n", 5).alias("m_score"),
    )


_LTV_ORACLE = """
WITH firstday AS (
  SELECT user_id,
         CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) AS d0
  FROM events GROUP BY user_id
),
rev AS (
  SELECT e.user_id, f.d0,
         CAST(epoch_us(e.ts) // 86400000000 AS BIGINT) - f.d0 AS age_d,
         CAST(round(e.value * 100) AS BIGINT) AS cents
  FROM events e JOIN firstday f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
),
byage AS (
  SELECT d0 % 7 AS cohort, age_d // 7 AS age_w,
         CAST(sum(cents) AS BIGINT) AS rev_c,
         CAST(count(DISTINCT user_id) AS BIGINT) AS payers
  FROM rev GROUP BY 1, 2
),
sized AS (
  SELECT d0 % 7 AS cohort, CAST(count(*) AS BIGINT) AS cohort_n
  FROM firstday GROUP BY 1
)
SELECT b.cohort, b.age_w, b.rev_c, b.payers, s.cohort_n,
       CAST(sum(b.rev_c) OVER (PARTITION BY b.cohort ORDER BY b.age_w)
            AS BIGINT) AS cum_rev_c,
       (CAST(sum(b.rev_c) OVER (PARTITION BY b.cohort ORDER BY b.age_w)
             AS BIGINT) * 1000000) // s.cohort_n AS ltv_micro
FROM byage b JOIN sized s ON s.cohort = b.cohort
"""


@query("ltv-cohort-revenue", _LTV_ORACLE)
def ltv_cohort_revenue(spark, sf):
    """Cohort LTV curves: cumulative purchase revenue per signup
    cohort (first-activity day mod 7 — the weekday cohort) by account
    age in weeks, normalized per cohort member — the
    lifetime-value-to-date curve under every retention dashboard
    (pairs with cohort-retention's activity view). Exact integer
    cents; the per-member LTV is cleared of float division
    (cum_rev * 1e6 div cohort_n). Plan: one first-day agg, one keyed
    join back to purchases, one grouped agg to (cohort, week) grain,
    then a cohort-partitioned running sum over GROUPED-size data —
    every stage map-side combinable or cohort-keyed."""
    from pyspark.sql import Window

    ev = t(spark, sf, "events")
    firstday = ev.groupBy("user_id").agg(
        F.min(F.expr("unix_micros(ts) div 86400000000")).alias("d0")
    )
    rev = (
        ev.where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .join(firstday, "user_id")
        .select(
            "user_id",
            (F.col("d0") % 7).alias("cohort"),
            F.expr("(unix_micros(ts) div 86400000000 - d0) div 7").alias("age_w"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    byage = rev.groupBy("cohort", "age_w").agg(
        F.sum("cents").alias("rev_c"),
        F.countDistinct("user_id").alias("payers"),
    )
    sized = firstday.groupBy((F.col("d0") % 7).alias("cohort")).agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = byage.join(sized, "cohort").withColumn(
        "cum_rev_c", F.sum("rev_c").over(w)
    )
    return j.select(
        "cohort", "age_w", "rev_c", "payers", "cohort_n", "cum_rev_c",
        F.expr("(cum_rev_c * 1000000) div cohort_n").alias("ltv_micro"),
    )


_SEASDEC_ORACLE = """
WITH daily AS (
  SELECT user_id % 10 AS k, epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
tr AS (
  SELECT k, day, x,
         CASE WHEN count(*) OVER w7 = 7
              THEN CAST(sum(x) OVER w7 AS BIGINT) END AS trend_sum7
  FROM daily
  WINDOW w7 AS (PARTITION BY k ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT *, ((day % 7) + 7) % 7 AS dow,
         CASE WHEN trend_sum7 IS NOT NULL
              THEN 7 * x - trend_sum7 END AS c7
  FROM tr
),
seas AS (
  SELECT k, dow,
         CAST(sum(c7) AS BIGINT) AS s_num,
         CAST(count(c7) AS BIGINT) AS s_cnt
  FROM detr WHERE c7 IS NOT NULL GROUP BY k, dow
),
j AS (
  SELECT d.k, d.day, d.x, d.trend_sum7, d.c7, d.dow,
         CASE WHEN s.s_cnt > 0 THEN
           (s_num * 1000000
              - ((s_num * 1000000 % s_cnt) + s_cnt) % s_cnt) // s_cnt
         END AS seasonal_c7_micro
  FROM detr d LEFT JOIN seas s ON s.k = d.k AND s.dow = d.dow
)
SELECT k, day, x, trend_sum7, dow, seasonal_c7_micro,
       CASE WHEN c7 IS NOT NULL AND seasonal_c7_micro IS NOT NULL
            THEN c7 * 1000000 - seasonal_c7_micro END AS remainder_micro
FROM j
"""


@query("rollup-seasonal-decompose", _SEASDEC_ORACLE)
def rollup_seasonal_decompose(spark, sf):
    """Classical additive seasonal decomposition (the moving-average
    method every STL tutorial starts from) over per-cohort daily
    revenue, weekly period: trend = centered 7-row moving window
    (NULL at series edges where the window is short), detrended =
    x - trend, seasonal index = per-(cohort, day-of-week) mean of the
    detrended series, remainder = detrended - seasonal. Exact
    integers throughout the declarative plan: the trend rides as the
    un-divided 7-day SUM, detrended as c7 = 7*x - trend_sum7 (cents*7
    units — multiply through instead of dividing), and the seasonal
    mean as a pmod-floor micro division (negative-safe, the
    interpolate-linear rule). Shape: one map-side daily reduction,
    one partitioned centered frame, one grouped-size seasonal agg
    joined back on (k, dow) — every stage keyed, nothing
    single-reducer. Complements timeseries-holt-winters (recursive
    smoothing) with the closed-form decomposition view."""
    from pyspark.sql import Window

    daily = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 10).alias("k"),
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    )
    w7 = Window.partitionBy("k").orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "k", "day", "x",
        F.when(
            F.count(F.lit(1)).over(w7) == 7, F.sum("x").over(w7)
        ).alias("trend_sum7"),
    )
    detr = tr.select(
        "*",
        F.expr("pmod(day, 7)").cast("long").alias("dow"),
        F.when(
            F.col("trend_sum7").isNotNull(),
            7 * F.col("x") - F.col("trend_sum7"),
        ).alias("c7"),
    )
    seas = (
        detr.where(F.col("c7").isNotNull())
        .groupBy("k", "dow")
        .agg(
            F.sum("c7").alias("s_num"),
            F.count("c7").alias("s_cnt"),
        )
        .select(
            "k", "dow",
            F.expr(
                "(s_num * 1000000"
                " - ((s_num * 1000000 % s_cnt) + s_cnt) % s_cnt) div s_cnt"
            ).alias("seasonal_c7_micro"),
        )
    )
    j = detr.join(seas, ["k", "dow"], "left")
    return j.select(
        "k", "day", "x", "trend_sum7", "dow", "seasonal_c7_micro",
        F.when(
            F.col("c7").isNotNull() & F.col("seasonal_c7_micro").isNotNull(),
            F.col("c7") * 1_000_000 - F.col("seasonal_c7_micro"),
        ).alias("remainder_micro"),
    )


@query("stream-holt-winters", _hw_oracle())
def stream_holt_winters_query(spark, sf):
    """The REAL streaming Holt-Winters, oracle-checked end to end
    against the SAME recursive-CTE twin as the batch scan
    (timeseries-holt-winters): daily cohort revenue split into three
    day-ordered parquet micro-batches, drained availableNow through
    streaming/stateful.stream_holt_winters (state = level + trend +
    7-slot seasonal ring, carried across batches), output projected to
    the batch query's columns. Works because the stream replays the
    batch scan's exact pinned-IEEE op sequence and arrival is
    day-ordered by construction (the stream_zscore ingest contract) —
    a live stateful stream value-hashing against plain SQL."""
    import tempfile

    from genpipe_spark.streaming.stateful import stream_holt_winters

    daily = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 10).alias("k"),
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    )
    lo, hi = daily.agg(
        F.expr("percentile_approx(day, array(0.33, 0.66), 1000)")
    ).first()[0]
    src = tempfile.mkdtemp(prefix="genpipe_hw_src_")
    for i, cond in enumerate(
        [
            F.col("day") <= lo,
            (F.col("day") > lo) & (F.col("day") <= hi),
            F.col("day") > hi,
        ]
    ):
        daily.where(cond).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/b{i}"
        )
    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    out_dir = tempfile.mkdtemp(prefix="genpipe_hw_out_")
    q = (
        stream_holt_winters(stream)
        .writeStream.format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(f"{out_dir}/data").select(
        "k", "rn", "x", "level_micro", "trend_micro", "seasonal_micro"
    )


_MARKOV_ITERS = 40


def _markov_oracle(iters: int) -> str:
    """Generated DuckDB twin of
    operators/eventflow.markov_removal_attribution: transition
    extraction mirrors the two window selects; the value iteration is
    UNROLLED (fixed count — the pagerank/lttb precedent) over the
    variants x states grid, each stage MATERIALIZED (each it_i is
    read by it_{i+1}'s agg AND carried rows — the 2^k inlining
    lesson). All integer micro arithmetic."""
    head = """
WITH ev AS (
  SELECT user_id, event_type AS ch,
         lag(event_type) OVER w AS prev,
         lead(event_type) OVER w AS nxt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
e AS (
  SELECT '__START__' AS src,
         CASE WHEN ch = 'purchase' THEN '__CONV__' ELSE ch END AS dst
  FROM ev WHERE prev IS NULL OR prev = 'purchase'
  UNION ALL
  SELECT ch,
         CASE WHEN nxt IS NULL THEN '__NULL__'
              WHEN nxt = 'purchase' THEN '__CONV__' ELSE nxt END
  FROM ev WHERE ch <> 'purchase'
),
cnt AS MATERIALIZED (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2
),
tt AS MATERIALIZED (
  SELECT cnt.src, cnt.dst, (cnt.c * 1000000) // t.t AS p
  FROM cnt JOIN (SELECT src, sum(c) AS t FROM cnt GROUP BY src) t
    ON t.src = cnt.src
),
states AS MATERIALIZED (
  SELECT DISTINCT s FROM (
    SELECT src AS s FROM cnt UNION SELECT dst FROM cnt
  )
),
variants(v) AS (
  SELECT s FROM states WHERE s NOT IN ('__START__', '__CONV__', '__NULL__')
  UNION ALL SELECT '__BASE__'
),
vs AS MATERIALIZED (SELECT v, s FROM variants CROSS JOIN states),
it_0 AS MATERIALIZED (
  SELECT v, s, CASE WHEN s = '__CONV__' THEN 1000000 ELSE 0 END AS p
  FROM vs
)"""
    parts = [head]
    for i in range(1, iters + 1):
        parts.append(f""",
it_{i} AS MATERIALIZED (
  SELECT vs.v, vs.s,
         CASE WHEN vs.s = '__CONV__' THEN 1000000
              WHEN vs.s = '__NULL__' OR vs.s = vs.v THEN 0
              ELSE coalesce(a.val, 0) END AS p
  FROM vs LEFT JOIN (
    SELECT p0.v, tt.src AS s, sum((tt.p * p0.p) // 1000000) AS val
    FROM tt JOIN it_{i - 1} p0 ON p0.s = tt.dst
    GROUP BY p0.v, tt.src
  ) a ON a.v = vs.v AND a.s = vs.s
)""")
    parts.append(f"""
SELECT r.v AS channel,
       CAST(b.p AS BIGINT) AS base_micro,
       CAST(r.p AS BIGINT) AS removed_micro,
       CAST(b.p - r.p AS BIGINT) AS removal_micro
FROM it_{iters} r
JOIN it_{iters} b ON b.v = '__BASE__' AND b.s = '__START__'
WHERE r.s = '__START__' AND r.v <> '__BASE__'""")
    return "".join(parts)


@query("attribution-markov-removal", _markov_oracle(_MARKOV_ITERS))
def attribution_markov_removal(spark, sf):
    """Data-driven multi-touch attribution by Markov removal effect
    (operators/eventflow.markov_removal_attribution) — the third
    attribution model next to last-touch and time-decay: journeys
    split at purchases, first-order transition chain in exact micro
    probabilities, absorption into CONV solved by 40 integer
    value-iteration steps, each channel's credit = how much the base
    conversion probability drops when that channel is failed. The
    distributed work is the windowed transition extraction + grouped
    count; the solve is channel-domain-bounded driver math (the
    prefix-compose precedent); the oracle unrolls the identical 40
    iterations over the variants x states grid."""
    from genpipe_spark.operators.eventflow import markov_removal_attribution

    return markov_removal_attribution(
        t(spark, sf, "events"),
        user_col="user_id",
        order_cols=["ts", "event_id"],
        channel_col="event_type",
        conv_value="purchase",
        iters=_MARKOV_ITERS,
    )


_ISOTONIC_ORACLE = """
WITH v AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL
),
ps AS (
  SELECT user_id, rn, event_id, x,
         sum(x) OVER (PARTITION BY user_id ORDER BY rn
                      ROWS UNBOUNDED PRECEDING) AS s
  FROM v
),
-- minimax characterization (Robertson/Wright/Dykstra):
-- fitted_i = max_{j<=i} min_{k>=i} avg(x_j..x_k). O(n^2) pairs per
-- user — affordable because series are PER-USER (bounded by the
-- activity model, not the SF); the Spark side is the O(n) PAVA scan.
pairs AS (
  SELECT a.user_id, a.rn AS j, b.rn AS k,
         CAST(b.s - a.s + a.x AS DOUBLE)
           / CAST(b.rn - a.rn + 1 AS DOUBLE) AS av
  FROM ps a JOIN ps b
    ON b.user_id = a.user_id AND b.rn >= a.rn
),
minq AS (
  SELECT user_id, j, k AS i,
         min(av) OVER (PARTITION BY user_id, j ORDER BY k DESC
                       ROWS UNBOUNDED PRECEDING) AS mn
  FROM pairs
),
fit AS (
  SELECT user_id, i, j,
         max(mn) OVER (PARTITION BY user_id, i ORDER BY j
                       ROWS UNBOUNDED PRECEDING) AS mx
  FROM minq
)
SELECT p.user_id, p.rn, p.event_id, p.x,
       CAST(floor(f.mx * 1000000) AS BIGINT) AS fitted_micro
FROM fit f JOIN ps p ON p.user_id = f.user_id AND p.rn = f.i
WHERE f.j = f.i
"""


@query("ml-isotonic-calibration", _ISOTONIC_ORACLE)
def ml_isotonic_calibration(spark, sf):
    """Per-user isotonic (non-decreasing L2) regression of event value
    over time — the PAVA scan behind probability calibration
    (operators/statescan.isotonic_fit). Spark runs the O(n) block
    stack with exact integer cross-multiplied mean comparisons and one
    double division per pooled block; the oracle certifies it against
    the minimax characterization fitted_i = max_{j<=i} min_{k>=i}
    avg(j..k) — a genuinely different O(n^2) formulation whose selected
    value is the pooled block's own sum/cnt, so the correctly-rounded
    double agrees bit-for-bit. The scan is the statescan class (one
    keyed shuffle, boundary-reset mapInPandas); users are the
    parallelism."""
    from genpipe_spark.operators.statescan import isotonic_fit

    v = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("x"),
        )
    )
    out = isotonic_fit(
        v, keys=["user_id"], order_cols=["ts", "event_id"], value_col="x"
    )
    return out.select("user_id", "rn", "event_id", "x", "fitted_micro")


_MK_THEIL_ORACLE = """
WITH v AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS y,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL
),
n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
pairs AS (
  SELECT a.user_id,
         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.rn - a.rn AS DOUBLE) AS slope
  FROM v a JOIN v b ON b.user_id = a.user_id AND b.rn > a.rn
),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS m_pairs,
         CAST(sum(sg) AS BIGINT) AS s_stat
  FROM pairs GROUP BY 1
),
med AS (
  SELECT user_id, slope FROM (
    SELECT user_id, slope,
           row_number() OVER (PARTITION BY user_id ORDER BY slope) AS r,
           count(*) OVER (PARTITION BY user_id) AS m
    FROM pairs
  ) WHERE r = (m + 1) // 2
),
ties AS (
  SELECT user_id,
         CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie18
  FROM (SELECT user_id, y, count(*) AS c FROM v GROUP BY 1, 2)
  GROUP BY 1
)
SELECT n.user_id, n.n, a.m_pairs, a.s_stat,
       n.n * (n.n - 1) * (2 * n.n + 5) - t.tie18 AS var18,
       CAST(floor(med.slope * 1000000) AS BIGINT) AS theil_slope_micro,
       CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - t.tie18 = 0 THEN NULL
            WHEN a.s_stat > 0 THEN CAST(floor(
              (CAST(a.s_stat - 1 AS DOUBLE)
               / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie18
                           AS DOUBLE) / 18.0)) * 1000000) AS BIGINT)
            WHEN a.s_stat < 0 THEN CAST(floor(
              (CAST(a.s_stat + 1 AS DOUBLE)
               / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie18
                           AS DOUBLE) / 18.0)) * 1000000) AS BIGINT)
            ELSE 0 END AS z_micro
FROM n
JOIN agg a ON a.user_id = n.user_id
JOIN med ON med.user_id = n.user_id
JOIN ties t ON t.user_id = n.user_id
WHERE n.n >= 2
"""


@query("agg-mann-kendall-theil-sen", _MK_THEIL_ORACLE)
def agg_mann_kendall_theil_sen(spark, sf):
    """Per-user Mann-Kendall trend test + Theil-Sen robust slope —
    the nonparametric is-this-series-trending pair (Mann 1945,
    Kendall 1975; Sen 1968): S = sum of pairwise value signs, the
    tie-corrected variance numerator var18 = n(n-1)(2n+5) - sum
    t(t-1)(2t+5) as an exact int, the continuity-corrected z in
    floored micro (the tau doctrine: one pinned sqrt/divide), and the
    Theil-Sen slope as the LOWER-median pairwise slope — an actual
    data-derived double both engines produce from identical exact
    integer operands, selected by nearest rank.

    Whale-safe as of r9 (the r8 ``weak`` discharged): the pairwise
    self-join is gone — each group is one Arrow batch through
    mann_kendall_theil_sen_grouped (operators/quantile.py), S/var18/z
    ride the O(n log n) count_strict_inversions machinery (exact for
    ANY group size, including a 10^6-event bot user), and only the
    Theil-Sen slope gates exact-pairwise behind a per-key length
    threshold with a deterministic sampled-pair fallback for whales
    (the statescan _route_hot_keys doctrine). At sf0.01/sf1 every
    group is far below the gate, so the oracle's pairwise formulation
    stays bit-identical."""
    from ..operators.quantile import mann_kendall_theil_sen_grouped

    v = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("y"),
        )
    )
    return mann_kendall_theil_sen_grouped(
        v, keys=["user_id"], order_cols=["ts", "event_id"], y_col="y"
    )


# DP oracle for changepoint-pelt: the full O(n^2) optimal-partitioning
# recursion with the state carried as LIST columns through a recursive
# CTE (the holt-winters ring precedent) — F/argmin appended per
# iteration, a second recursive CTE backtracks the boundaries, UNNEST
# emits one row per segment. Same quantized integer objective as
# operators/anomaly.pelt_segments (cost = segment SSE floored to int64,
# pen = max(2 * (sse_total // n), 1), smallest-s argmin via
# list_position's first-occurrence semantics == the Python loop's
# strict-< scan).
_PELT_ORACLE = """
WITH RECURSIVE pts AS (
  SELECT o_orderpriority AS k,
         (year(o_orderdate)*12 + month(o_orderdate))::BIGINT AS m,
         count(*)::BIGINT AS x
  FROM orders GROUP BY 1, 2
),
idx AS (
  SELECT k, m, x,
         row_number() OVER (PARTITION BY k ORDER BY m) AS i,
         sum(x)   OVER (PARTITION BY k ORDER BY m) AS s,
         sum(x*x) OVER (PARTITION BY k ORDER BY m) AS q
  FROM pts
),
ser AS (
  SELECT k, count(*)::BIGINT AS n,
         list(m ORDER BY i) AS ms,
         list_prepend(0::BIGINT, list(s::BIGINT ORDER BY i)) AS ss,
         list_prepend(0::BIGINT, list(q::BIGINT ORDER BY i)) AS qq
  FROM idx GROUP BY k
),
penc AS (
  SELECT *,
    greatest(2 * ((qq[n+1] - (ss[n+1]*ss[n+1]) // n) // n), 1)::BIGINT AS p
  FROM ser
),
dp AS (
  SELECT k, n, ms, ss, qq, p, 0::BIGINT AS t,
         [(-p)::BIGINT] AS fs, [0::BIGINT] AS aa
  FROM penc
  UNION ALL
  SELECT k, n, ms, ss, qq, p, t+1,
         list_append(fs, list_min(c)),
         list_append(aa, (list_position(c, list_min(c)) - 1)::BIGINT)
  FROM (
    SELECT *, list_transform(range(0, t+1), s ->
          fs[s+1] + (qq[t+2] - qq[s+1])
          - ((ss[t+2]-ss[s+1]) * (ss[t+2]-ss[s+1])) // (t+1-s)
          + p) AS c
    FROM dp WHERE t < n
  ) z
),
fin AS (SELECT k, n, ms, ss, qq, p, fs, aa FROM dp WHERE t = n),
bt AS (
  SELECT k, n AS t, [n] AS bounds FROM fin
  UNION ALL
  SELECT b.k, f.aa[b.t+1], list_prepend(f.aa[b.t+1], b.bounds)
  FROM bt b JOIN fin f USING (k) WHERE b.t > 0
),
segs AS (
  SELECT f.k, u.i AS seg_idx,
         b.bounds[u.i] AS s0, b.bounds[u.i+1] AS e0,
         f.ms, f.ss, f.qq, f.fs, f.n, f.p
  FROM (SELECT k, bounds FROM bt WHERE t = 0) b
  JOIN fin f USING (k),
  UNNEST(range(1, len(b.bounds))) AS u(i)
)
SELECT k, seg_idx,
       ms[s0+1] AS start_m, ms[e0] AS end_m,
       (e0 - s0) AS seg_len,
       (ss[e0+1] - ss[s0+1]) AS seg_sum,
       (qq[e0+1] - qq[s0+1])
         - ((ss[e0+1]-ss[s0+1])*(ss[e0+1]-ss[s0+1]))//(e0-s0) AS seg_cost,
       fs[n+1] AS f_total, p AS pen
FROM segs
"""


@query("changepoint-pelt", _PELT_ORACLE)
def changepoint_pelt(spark, sf):
    """PELT optimal changepoint segmentation (Killick et al. 2012) —
    the globally-OPTIMAL counterpart to the shipped heuristics
    (timeseries-cusum's two-sided Page test flags excursions;
    seasonal decompose explains cycles; this finds the best
    mean-shift partition under a per-segment penalty). Series:
    monthly order counts per o_orderpriority — the distributed part
    is the groupBy reduction to the calendar grid (bounded: ~80
    points at ANY scale factor, so 100x data changes the VALUES, not
    the series length); the bounded residue is segmented per key in
    one Arrow batch (operators/anomaly.pelt_segments, exact-integer
    quantized SSE cost, pen ~ 2*sigma^2, PELT pruning with the
    k_slack=2 quantization guard). The DuckDB twin replays the FULL
    un-pruned O(n^2) DP through a list-carrying recursive CTE +
    backtrack recursion, so the value-hash certifies both the
    optimum AND that pruning is lossless. Emits one row per segment
    with boundaries, length, sum, quantized cost, F(n) and the
    penalty."""
    from ..operators.anomaly import pelt_segments

    pts = (
        t(spark, sf, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("k"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("m"),
        )
        .agg(F.count("*").cast("long").alias("x"))
    )
    seg = pelt_segments(pts, ["k"], "m", "x")
    return seg.select(
        "k", "seg_idx",
        F.col("start_ord").alias("start_m"),
        F.col("end_ord").alias("end_m"),
        "seg_len", "seg_sum", "seg_cost", "f_total", "pen",
    )


_CROSTON_ORACLE = """
WITH RECURSIVE g AS (
  SELECT l_partkey % 50 AS item,
         (l_shipdate::DATE - DATE '1995-01-01') // 7 AS wk,
         sum(CAST(l_quantity AS BIGINT)) AS z
  FROM lineitem GROUP BY 1, 2
),
nz AS (
  SELECT item, wk, z,
         row_number() OVER (PARTITION BY item ORDER BY wk) AS rn,
         coalesce(wk - lag(wk) OVER (PARTITION BY item ORDER BY wk),
                  wk + 1) AS gap
  FROM g WHERE z > 0
),
recz AS (
  SELECT item, rn, CAST(z AS DOUBLE) AS s FROM nz WHERE rn = 1
  UNION ALL
  SELECT v.item, v.rn, 0.25 * CAST(v.z AS DOUBLE) + 0.75 * recz.s
  FROM recz JOIN nz v ON v.item = recz.item AND v.rn = recz.rn + 1
),
recg AS (
  SELECT item, rn, CAST(gap AS DOUBLE) AS s FROM nz WHERE rn = 1
  UNION ALL
  SELECT v.item, v.rn, 0.25 * CAST(v.gap AS DOUBLE) + 0.75 * recg.s
  FROM recg JOIN nz v ON v.item = recg.item AND v.rn = recg.rn + 1
)
SELECT nz.item, nz.rn, nz.wk, CAST(nz.z AS BIGINT) AS z, nz.gap,
       CAST(floor(recz.s * 1000000.0) AS BIGINT) AS z_ewma_micro,
       CAST(floor(recg.s * 1000000.0) AS BIGINT) AS p_ewma_micro,
       (CAST(floor(recz.s * 1000000.0) AS BIGINT) * 1000000)
         // CAST(floor(recg.s * 1000000.0) AS BIGINT) AS croston_micro
FROM nz
JOIN recz ON recz.item = nz.item AND recz.rn = nz.rn
JOIN recg ON recg.item = nz.item AND recg.rn = nz.rn
"""


@query("forecast-croston", _CROSTON_ORACLE)
def forecast_croston(spark, sf):
    """Croston's method (1972) — THE intermittent-demand forecaster,
    completing the per-key forecasting family (ewma -> holt ->
    holt-winters -> croston): weekly part demand is mostly-zero, so a
    plain EWMA of the grid chases zeros; Croston smooths the NON-ZERO
    demand sizes and the inter-arrival gaps separately (both through
    operators/statescan.ewma_scan, alpha=0.25 — two scans over the
    same keyed order, joined on (item, rn)) and forecasts their
    ratio, floored to micro from the two micro states. The first
    gap is wk+1 (periods since the calendar origin, pinned
    convention). Same determinism story as timeseries-ewma (pinned
    IEEE recurrence, binary-exact alpha, TWO recursive-CTE twins);
    grid reduction is the distributed part, per-key scans are the
    bounded residue."""
    from pyspark.sql import Window

    from ..operators.statescan import ewma_scan

    li = t(spark, sf, "lineitem")
    g = (
        li.groupBy(
            (F.col("l_partkey") % 50).alias("item"),
            (F.datediff(F.col("l_shipdate"), F.lit("1995-01-01"))
             .cast("long") / 7).cast("long").alias("wk"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("z"))
        .where(F.col("z") > 0)
    )
    w = Window.partitionBy("item").orderBy("wk")
    nz = g.withColumn(
        "gap",
        F.coalesce(
            F.col("wk") - F.lag("wk").over(w), F.col("wk") + 1
        ).cast("long"),
    )
    nz = nz.localCheckpoint(eager=False)
    sz = ewma_scan(
        nz, keys=["item"], order_cols=["wk"], value_col="z",
        alpha=0.25, out_col="z_ewma_micro",
    )
    sg = ewma_scan(
        nz, keys=["item"], order_cols=["wk"], value_col="gap",
        alpha=0.25, out_col="p_ewma_micro",
    ).select("item", "rn", "gap", "p_ewma_micro")
    out = sz.join(sg, ["item", "rn"])
    return out.select(
        "item", "rn", "wk", "z", "gap", "z_ewma_micro", "p_ewma_micro",
        F.expr("(z_ewma_micro * 1000000) div p_ewma_micro")
        .alias("croston_micro"),
    )
