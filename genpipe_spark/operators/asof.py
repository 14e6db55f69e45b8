"""As-of join: for each left row, the single most recent right row at or
before the left row's timestamp (backward; at-or-after for forward),
matching equally on key columns — the classic trades⋈quotes operator.

Spark-first single-shuffle design (no range join, no
BroadcastNestedLoopJoin, no per-key driver loops):

  1. tag both sides and union them (right rows carry their payload as a
     struct, left rows carry a null payload),
  2. one window partitioned by the keys, ordered by
     (event time, side, tiebreak), frame = unbounded preceding..current,
  3. ``last(payload, ignorenulls=True)`` resolves every left row's match.

Both sides shuffle exactly ONCE on the equi-keys — the same cost as any
keyed aggregation, so the plan survives 100 TB (AQE splits skewed keys).
A naive formulation (``l.ts >= r.ts`` range join) plans as
BroadcastNestedLoopJoin — O(n·m) — and is asserted against in tests.

Determinism: right rows sort before left rows at equal timestamps (so
``<=`` semantics hold exactly), and equal-timestamp right rows are
ordered by an explicit ``tiebreak`` column, so the winning row is unique
under any partitioning / scheduling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str,
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left as-of join.

    Output: every ``left`` row plus ``right_cols`` (and ``right_ts``)
    from the matched right row, null when no right row qualifies.

    - ``on``: equality key column(s), same names on both sides.
    - ``direction``: "backward" (largest right_ts <= left_ts) or
      "forward" (smallest right_ts >= left_ts).
    - ``tiebreak``: right-side column making equal-timestamp winners
      unique (backward keeps the max tiebreak, forward the min).
    - ``tolerance_s``: optional max |left_ts - right_ts| in seconds;
      matches farther away revert to null (pandas ``merge_asof``
      semantics).

    ``right_cols`` must not collide with left column names.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'"
        )
    keys = [on] if isinstance(on, str) else list(on)
    clash = (set(right_cols) | {right_ts}) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}")
    reserved = {"__ts", "__side", "__tb", "__pay", "__m", "__mb", "__mf"}
    res_clash = reserved & (set(left.columns) | set(right.columns))
    if res_clash:
        raise ValueError(
            f"columns collide with asof_join internals: {sorted(res_clash)}"
        )

    payload = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in right_cols],
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        payload.alias("__pay"),
    )
    l2 = left.select(
        *left.columns,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
    )
    # unionByName fills the side-specific columns (left payload, right
    # tiebreak, all non-key left columns on right rows) with nulls
    u = l2.unionByName(r2, allowMissingColumns=True)

    if direction == "nearest":
        # TWO running (unboundedPreceding..currentRow) frames — NEVER a
        # currentRow..unboundedFollowing frame, which Spark evaluates by
        # rescanning to partition end per row (O(n^2) per key; the
        # time_bucket_interpolate lesson). Backward: ascending order,
        # right rows sort before left at equal ts, so <= holds.
        # Forward: the SAME last(non-null) trick over the DESCENDING
        # order with side/tiebreak reversed — at equal ts left rows sort
        # first, so equal-ts right rows are excluded BY DESIGN (they are
        # distance 0 and the backward leg already holds them), and
        # tb DESC makes the running last() the min-tiebreak winner,
        # matching direction='forward' semantics. Tie at equal nonzero
        # distance prefers the backward match (deterministic).
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(
                F.col("__ts").desc(), F.col("__side").desc(), F.col("__tb").desc()
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = (
            u.withColumn("__mb", F.last("__pay", ignorenulls=True).over(wb))
            .withColumn("__mf", F.last("__pay", ignorenulls=True).over(wf))
            .where(F.col("__side") == 1)
        )
        lts = F.unix_micros(F.col("__ts"))
        mb: Column = F.col("__mb")
        mf: Column = F.col("__mf")
        if tolerance_s is not None:
            tol = F.lit(int(round(tolerance_s * 1_000_000)))
            mb = F.when(F.abs(lts - F.unix_micros(mb["__rts"])) <= tol, mb)
            mf = F.when(F.abs(lts - F.unix_micros(mf["__rts"])) <= tol, mf)
        db = lts - F.unix_micros(mb["__rts"])
        df_ = F.unix_micros(mf["__rts"]) - lts
        m: Column = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(db <= df_, mb)
            .otherwise(mf)
        )
        out_cols = [F.col(c) for c in left.columns]
        out_cols.append(m["__rts"].alias(right_ts))
        out_cols.extend(m[c].alias(c) for c in right_cols)
        return matched.select(*out_cols)

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__tb").desc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__pay", ignorenulls=True).over(w)).where(
        F.col("__side") == 1
    )

    m: Column = F.col("__m")
    if tolerance_s is not None:
        # integer-microsecond gap: exact in both Spark and an ANSI-SQL
        # oracle (epoch_us), no float rounding at the tolerance boundary
        gap = F.abs(F.unix_micros(F.col("__ts")) - F.unix_micros(m["__rts"]))
        m = F.when(gap <= F.lit(int(round(tolerance_s * 1_000_000))), m)
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(m["__rts"].alias(right_ts))
    out_cols.extend(m[c].alias(c) for c in right_cols)
    return matched.select(*out_cols)
