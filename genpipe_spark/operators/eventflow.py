"""Product-analytics event-flow operators: ordered funnels and cohort
retention over keyed event streams.

Both are pure keyed aggregations/joins — no windows over the raw event
table, no state, nothing broadcast — so they scale like any grouped
count at 100 TB. Timestamps are bucketed with integer arithmetic
(epoch-microsecond div) so both engines agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from genpipe_spark.operators.anomaly import _reject_collisions


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
    within_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel completion: for each user, the number of funnel
    ``steps`` completed IN ORDER (step i+1 counts only when it happens
    strictly after the user's earliest qualifying step i — and, with
    ``within_us``, no later than ``within_us`` microseconds after it:
    the conversion-window form real funnel analysis uses, where a
    purchase a month after the click is no longer attributed to it).

    Output: (user, steps_completed, t_1..t_k microsecond timestamps of
    the qualifying events, NULL once the funnel broke).

    Shape: one filtered min-aggregate per step (k is a small constant),
    each keyed on the user — k map-side-combinable groupBys + (k-1)
    user-keyed joins, no event-table window, no per-user event
    collection, so a bot user with millions of events costs its event
    count, not a sort."""
    steps = list(steps)
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    _reject_collisions(
        events,
        {"__u", "__t", "__prev"} | {f"t_{i}" for i in range(1, len(steps) + 1)},
        "funnel_steps",
    )
    us = F.col(user_col).alias("__u")
    ts_us = F.unix_micros(F.col(ts_col))
    out = None
    prev_t = None
    for i, step in enumerate(steps, 1):
        ev = events.where(F.col(step_col) == step).select(
            us, ts_us.alias("__t")
        )
        if out is None:
            cur = ev.groupBy("__u").agg(F.min("__t").alias(f"t_{i}"))
            out = cur
        else:
            # earliest occurrence of this step strictly after prev step
            # (and within the conversion window when one is set — one
            # extra predicate on the same user-keyed join, no new
            # shuffle)
            qual = F.col("__t") > F.col("__prev")
            if within_us is not None:
                qual = qual & (F.col("__t") <= F.col("__prev") + F.lit(within_us))
            cur = (
                ev.join(out.select("__u", F.col(prev_t).alias("__prev")), "__u")
                .where(qual)
                .groupBy("__u")
                .agg(F.min("__t").alias(f"t_{i}"))
            )
            out = out.join(cur, "__u", "left")
        prev_t = f"t_{i}"
    completed = None
    for i in range(1, len(steps) + 1):
        c = F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
        completed = c if completed is None else completed + c
    return out.select(
        F.col("__u").alias(user_col),
        completed.alias("steps_completed"),
        *[f"t_{i}" for i in range(1, len(steps) + 1)],
    )


def session_paths(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    state_col: str,
    gap_us: int = 6 * 3600 * 1_000_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Navigation-path mining: sessionize each user's stream by
    inactivity gap (gaps-and-islands, the stream-sessionize-batch
    pattern), concatenate each session's states IN ORDER into a path
    string, and count sessions per path — the "top user journeys"
    product-analytics query.

    Determinism: within-session order is (ts, tiebreak) — pass a
    unique ``tiebreak_col`` when duplicate timestamps are possible;
    the path is built by sorting the collected (ts, tiebreak, state)
    structs (lexicographic struct sort == the window order), so the
    string is a pure function of the session's event SET.

    Shape: one user-keyed window (lag + running sum share it), one
    (user, session) aggregate collecting the session's own events —
    state bounded by session length, never a user's full history — and
    one grouped count on the path string. Three keyed exchanges.

    Output: (path, n_sessions)."""
    _reject_collisions(events, {"__us", "__ns", "__sid"}, "session_paths")
    tb = [tiebreak_col] if tiebreak_col else []
    ev = events.select(
        user_col,
        F.unix_micros(F.col(ts_col)).alias("__us"),
        *tb,
        state_col,
    )
    w = Window.partitionBy(user_col).orderBy(
        "__us", *[F.col(c) for c in tb]
    )
    marked = ev.withColumn(
        "__ns",
        (F.col("__us") - F.lag("__us", 1, -(10**18)).over(w) > gap_us).cast(
            "int"
        ),
    ).withColumn(
        "__sid",
        F.sum("__ns").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sessions = marked.groupBy(user_col, "__sid").agg(
        F.concat_ws(
            "->",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__us", *tb, state_col))
                ),
                lambda s: s[state_col],
            ),
        ).alias("path")
    )
    return sessions.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_s: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention triangle: users bucketed by their FIRST-active
    period, counted in every later period they return.

    Output: (cohort_bucket, bucket_offset, n_users) with buckets =
    floor(epoch_us / bucket_s*1e6) — integer weeks by default.

    Shape: min-aggregate for the cohort (user-keyed), distinct
    (user, bucket) activity pairs (user+bucket-keyed), one join back on
    the user, and the final grouped count — four keyed exchanges, all
    AQE-managed, nothing proportional to any single user's history
    beyond its distinct active buckets."""
    _reject_collisions(events, {"__u", "__us", "__b"}, "cohort_retention")
    width = bucket_s * 1_000_000
    u = F.col(user_col).alias("__u")
    first = (
        events.select(u, F.unix_micros(F.col(ts_col)).alias("__us"))
        # pure-int64 floor division: pmod keeps pre-epoch timestamps
        # flooring (ADVICE r4 timegrid lesson) and `div` never routes
        # through a double (whose rounding can cross a bucket boundary
        # for small widths / large timestamps)
        .withColumn("__b", F.expr(f"(__us - pmod(__us, {width})) div {width}"))
        .groupBy("__u")
        .agg(F.min("__b").alias("cohort_bucket"))
    )
    active = (
        events.select(u, F.unix_micros(F.col(ts_col)).alias("__us"))
        .withColumn("__b", F.expr(f"(__us - pmod(__us, {width})) div {width}"))
        .select("__u", "__b")
        .distinct()
    )
    return (
        active.join(first, "__u")
        .groupBy(
            "cohort_bucket",
            (F.col("__b") - F.col("cohort_bucket")).alias("bucket_offset"),
        )
        .agg(F.count_distinct("__u").alias("n_users"))
    )


def transition_matrix(
    events: DataFrame,
    user_col: str,
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    consecutive states of each user's ordered event stream.

    Output: (state_from, state_to, n, p_micro) where p_micro is the
    row-normalized probability in exact millionths
    (n * 1e6 div total_from — int64, engine-portable).

    Shape: one lag window per user (the only event-table shuffle), a
    grouped count on (from, to), and a from-keyed sum joined back —
    the matrix is |states|^2 rows, tiny by construction."""
    from pyspark.sql import Window

    _reject_collisions(
        events, {"__next", "__tot", "__n6"}, "transition_matrix"
    )
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    pairs = (
        events.withColumn("__next", F.lead(state_col).over(w))
        .where(F.col("__next").isNotNull())
        .select(
            F.col(state_col).alias("state_from"),
            F.col("__next").alias("state_to"),
        )
    )
    counts = pairs.groupBy("state_from", "state_to").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("state_from").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(totals, "state_from")
        .withColumn("__n6", F.col("n") * F.lit(1_000_000))
        .withColumn("p_micro", F.expr("__n6 div __tot"))
        .select("state_from", "state_to", "n", "p_micro")
    )


def markov_removal_attribution(
    df: DataFrame,
    user_col: str,
    order_cols: Sequence[str],
    channel_col: str,
    conv_value: str,
    iters: int = 40,
) -> DataFrame:
    """First-order Markov-chain attribution by REMOVAL EFFECT — the
    data-driven multi-touch model (Anderl et al. 2014's framing of
    Shapley-lite channel credit): build the journey transition chain
    (START -> touches -> CONV | NULL, journeys split at conversions),
    estimate the base conversion probability as absorption into CONV,
    then for each channel re-solve with that channel FAILED (its state
    value pinned to 0 — visiting it ends the journey unconverted);
    removal effect = base - removed.

    Everything is deterministic EXACT INTEGER arithmetic so a
    generated SQL twin replays it bit-for-bit:
      - transition probabilities in micro units, truncating div
        (count * 1e6 div out_total) — the pagerank_micro doctrine;
      - absorption solved by ``iters`` synchronous value-iteration
        steps, each term (p_edge * p_state) div 1e6 summed per source
        (int64-safe: <= 1e12 per term x #states terms);
      - CONV pinned 1e6, NULL pinned 0, the removed channel pinned 0.
    Value iteration on an absorbing chain converges geometrically;
    truncation makes the fixed iteration count exactly reproducible.

    Scale shape: the DISTRIBUTED work is the transition extraction
    (two window expressions over one user-keyed sort) and the grouped
    count; the solve runs driver-side over the collected
    (#states+2)^2-row transition table — bounded by the CHANNEL
    DOMAIN, not the data (the kmeans-centroid / capped-sum
    prefix-compose precedent). Returns one row per non-conversion
    channel: ``channel, base_micro, removed_micro, removal_micro``.
    """
    if iters < 1:
        raise ValueError(f"markov_removal_attribution: iters {iters} < 1")
    keys = [user_col]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    ch = F.col(channel_col)
    ord_df = df.select(
        ch.alias("__ch"),
        F.lag(ch).over(w).alias("__prev"),
        F.lead(ch).over(w).alias("__nxt"),
    )
    conv = F.lit(conv_value)
    starts = ord_df.where(
        F.col("__prev").isNull() | (F.col("__prev") == conv)
    ).select(
        F.lit("__START__").alias("src"),
        F.when(F.col("__ch") == conv, "__CONV__")
        .otherwise(F.col("__ch")).alias("dst"),
    )
    steps = ord_df.where(F.col("__ch") != conv).select(
        F.col("__ch").alias("src"),
        F.when(F.col("__nxt").isNull(), "__NULL__")
        .when(F.col("__nxt") == conv, "__CONV__")
        .otherwise(F.col("__nxt")).alias("dst"),
    )
    cnt = (
        starts.unionByName(steps)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = cnt.collect()  # bounded: (#channels + 2)^2
    out_tot: dict[str, int] = {}
    for r in rows:
        out_tot[r["src"]] = out_tot.get(r["src"], 0) + int(r["c"])
    trans = [
        (r["src"], r["dst"], (int(r["c"]) * 1_000_000) // out_tot[r["src"]])
        for r in rows
    ]
    states = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    channels = sorted(
        s for s in states if s not in ("__START__", "__CONV__", "__NULL__")
    )

    # pre-bucket transitions by source once: the inner loop was
    # rescanning the full transition list per state, an avoidable
    # O(iters * n_states * n_trans) factor (r8 advisory)
    out_edges: dict[str, list[tuple[str, int]]] = {}
    for src, d, pm in trans:
        out_edges.setdefault(src, []).append((d, pm))

    def solve(removed: str | None) -> int:
        p = {s: 1_000_000 if s == "__CONV__" else 0 for s in states}
        for _ in range(iters):
            nxt = {}
            for s in states:
                if s == "__CONV__":
                    nxt[s] = 1_000_000
                elif s == "__NULL__" or s == removed:
                    nxt[s] = 0
                else:
                    nxt[s] = sum(
                        (pm * p[d]) // 1_000_000
                        for d, pm in out_edges.get(s, ())
                    )
            p = nxt
        return p.get("__START__", 0)

    base = solve(None)
    removed = {c: solve(c) for c in channels}
    out = [(c, base, removed[c], base - removed[c]) for c in channels]
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "channel string, base_micro long, removed_micro long,"
        " removal_micro long",
    )
