"""Interval-join queries()/oracle_sql() twins (SURVEY.md §2.3).

Points come from lineitem (partkey as position), intervals are derived
deterministically from supplier — both sides reproducible in DuckDB,
whose IEJoin handles the BETWEEN range join as the oracle.

`join-interval` (banded equi-join) and `join-interval-explode` (naive
position-explode) share one oracle: the reference's own swap/interception
duality (GenomicsLoader.scala:153-166) — both must match it exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.operators.interval import interval_join, interval_join_explode
from genpipe_spark.registry import query
from genpipe_spark.queries.common import t

_ORACLE = """
    WITH points AS (
      SELECT l_orderkey, l_linenumber, l_partkey AS p
      FROM lineitem WHERE l_linenumber <= 2
    ), intervals AS (
      SELECT s_suppkey,
             (s_suppkey * 37) % 1900 AS lo,
             (s_suppkey * 37) % 1900 + (s_suppkey % 13) AS hi
      FROM supplier
    )
    SELECT l_orderkey, l_linenumber, p, s_suppkey, lo, hi
    FROM points JOIN intervals ON p >= lo AND p <= hi
"""


def _points(spark, sf):
    return (
        t(spark, sf, "lineitem")
        .where(F.col("l_linenumber") <= 2)
        .select("l_orderkey", "l_linenumber", F.col("l_partkey").alias("p"))
    )


def _intervals(spark, sf):
    s = t(spark, sf, "supplier")
    lo = (F.col("s_suppkey") * 37) % 1900
    return s.select(
        "s_suppkey",
        lo.alias("lo"),
        (lo + F.col("s_suppkey") % 13).alias("hi"),
    )


@query("join-interval", _ORACLE)
def join_interval_banded(spark, sf):
    # the scalable banded equi-join form; band width ≈ typical interval
    # length so interval replication stays O(1)
    return interval_join(
        _points(spark, sf),
        _intervals(spark, sf),
        point_col="p",
        lo_col="lo",
        hi_col="hi",
        band_width=16,
    ).select("l_orderkey", "l_linenumber", "p", "s_suppkey", "lo", "hi")


@query("join-interval-explode", _ORACLE)
def join_interval_exploded(spark, sf):
    # naive oracle form (steps/toRange.scala:50-64)
    return interval_join_explode(
        _points(spark, sf),
        _intervals(spark, sf),
        point_col="p",
        lo_col="lo",
        hi_col="hi",
    ).select("l_orderkey", "l_linenumber", "p", "s_suppkey", "lo", "hi")


@query("join-interval-broadcast", _ORACLE)
def join_interval_broadcast(spark, sf):
    # broadcast range join — right plan when intervals fit in memory
    # (the ADAM BroadcastRegionJoin the reference considered,
    # steps/toRange.scala:4-10)
    return interval_join(
        _points(spark, sf),
        _intervals(spark, sf),
        point_col="p",
        lo_col="lo",
        hi_col="hi",
        broadcast_intervals=True,
    ).select("l_orderkey", "l_linenumber", "p", "s_suppkey", "lo", "hi")


@query(
    "interval-interval-join",
    """
    WITH l AS (
      SELECT user_id, event_id AS l_event,
             epoch_us(ts) AS l_lo,
             epoch_us(ts) + ((event_id % 7) + 1) * 3600000000 AS l_hi
      FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT user_id, event_id AS r_event,
             epoch_us(ts) AS r_lo,
             epoch_us(ts) + ((event_id % 11) + 1) * 3600000000 AS r_hi
      FROM events WHERE event_type = 'view'
    )
    SELECT l.user_id, l_event, r_event,
           (CASE WHEN l_hi < r_hi THEN l_hi ELSE r_hi END
            - CASE WHEN l_lo > r_lo THEN l_lo ELSE r_lo END) AS overlap_us
    FROM l JOIN r ON l.user_id = r.user_id
                 AND l_lo <= r_hi AND r_lo <= l_hi
    """,
)
def interval_interval_join_query(spark, sf):
    """Region×region overlap join
    (operators/interval.interval_interval_join): click sessions (1-7 h)
    × view windows (1-11 h) per user, banded at 4 h — the banded
    equi-join emits each overlapping pair exactly once via the
    first-shared-cell rule (no distinct), the DuckDB IEJoin twin uses
    the plain overlap predicate. Output includes the exact overlap
    length in microseconds (closed-interval min(hi)-max(lo))."""
    from genpipe_spark.operators.interval import interval_interval_join

    e = t(spark, sf, "events")
    hour = 3_600_000_000
    left = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("l_event"),
        F.unix_micros("ts").alias("l_lo"),
        (F.unix_micros("ts") + ((F.col("event_id") % 7) + 1) * hour).alias("l_hi"),
    )
    right = e.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("r_event"),
        F.unix_micros("ts").alias("r_lo"),
        (F.unix_micros("ts") + ((F.col("event_id") % 11) + 1) * hour).alias("r_hi"),
    )
    j = interval_interval_join(
        left, right, ["user_id"], "l_lo", "l_hi", "r_lo", "r_hi",
        band_width=4 * hour,
    )
    return j.select(
        "user_id", "l_event", "r_event",
        (F.least("l_hi", "r_hi") - F.greatest("l_lo", "r_lo")).alias("overlap_us"),
    )


@query(
    "interval-reciprocal-join",
    """
    WITH l AS (
      SELECT user_id, event_id AS l_event,
             epoch_us(ts) AS l_lo,
             epoch_us(ts) + ((event_id % 7) + 1) * 3600000000 AS l_hi
      FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT user_id, event_id AS r_event,
             epoch_us(ts) AS r_lo,
             epoch_us(ts) + ((event_id % 11) + 1) * 3600000000 AS r_hi
      FROM events WHERE event_type = 'view'
    )
    SELECT user_id, l_event, r_event, overlap_us
    FROM (
      SELECT l.user_id, l_event, r_event,
             (CASE WHEN l_hi < r_hi THEN l_hi ELSE r_hi END
              - CASE WHEN l_lo > r_lo THEN l_lo ELSE r_lo END) AS overlap_us,
             l_hi - l_lo AS l_len, r_hi - r_lo AS r_len
      FROM l JOIN r ON l.user_id = r.user_id
                   AND l_lo <= r_hi AND r_lo <= l_hi
    )
    WHERE 2 * overlap_us >= l_len AND 2 * overlap_us >= r_len
    """,
)
def interval_reciprocal_join_query(spark, sf):
    """Reciprocal-overlap region join — the genomics filter variant
    (bedtools ``intersect -f 0.5 -r``; the reference's interval joins
    stop at any-overlap, `steps/intersectSwap.scala:17-27`): a pair
    qualifies only when the overlap covers >= 50% of BOTH intervals'
    lengths. Built as the SAME banded exactly-once candidate join as
    interval-interval-join plus a residual fraction predicate in EXACT
    integer microseconds (2*overlap >= len, no double ratios) — the
    filter tightens selectivity but the plan shape, replication bound,
    and single shuffle are unchanged, so the 100 TB posture is
    identical to the any-overlap form."""
    from genpipe_spark.operators.interval import interval_interval_join

    e = t(spark, sf, "events")
    hour = 3_600_000_000
    left = e.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("l_event"),
        F.unix_micros("ts").alias("l_lo"),
        (F.unix_micros("ts") + ((F.col("event_id") % 7) + 1) * hour).alias("l_hi"),
    )
    right = e.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("r_event"),
        F.unix_micros("ts").alias("r_lo"),
        (F.unix_micros("ts") + ((F.col("event_id") % 11) + 1) * hour).alias("r_hi"),
    )
    j = interval_interval_join(
        left, right, ["user_id"], "l_lo", "l_hi", "r_lo", "r_hi",
        band_width=4 * hour,
    )
    overlap = F.least("l_hi", "r_hi") - F.greatest("l_lo", "r_lo")
    return (
        j.select(
            "user_id", "l_event", "r_event",
            overlap.alias("overlap_us"),
            (F.col("l_hi") - F.col("l_lo")).alias("l_len"),
            (F.col("r_hi") - F.col("r_lo")).alias("r_len"),
        )
        .where(
            (2 * F.col("overlap_us") >= F.col("l_len"))
            & (2 * F.col("overlap_us") >= F.col("r_len"))
        )
        .select("user_id", "l_event", "r_event", "overlap_us")
    )
