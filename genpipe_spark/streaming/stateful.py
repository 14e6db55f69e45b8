"""Custom stateful streaming operator: per-user session windows via
``applyInPandasWithState`` (SURVEY.md §2.8 ceiling — the reference has no
stateful streaming at all; this is the additive capability the engine
exposes for event streams).

Semantics: events for a user belong to one session while gaps between
consecutive event times stay under ``gap``; a session closes when the
event-time watermark passes its end + gap (timeout), emitting one row
(user_id, session_start, session_end, n_events, value_sum).

Scale notes: state is partitioned by user_id (the groupBy key), lives in
the state store per partition, and is bounded by the event-time timeout —
no unbounded state. The Python hook is Arrow-batched per group-batch,
not per row."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("vsum", DoubleType()),
    ]
)


def _session_fn(gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1_000).to_numpy()
        vals = rows["value"].to_numpy()

        # split THIS batch into sessions on internal gaps (a micro-batch —
        # or an availableNow catch-up — can span many sessions)
        sessions: list[list] = []  # [start_ms, end_ms, n, vsum]
        for t, v in zip(ts_us, vals):
            t, v = int(t), float(v)
            if sessions and t - sessions[-1][1] <= gap_ms * 1000:
                s = sessions[-1]
                s[1] = t
                s[2] += 1
                s[3] += v
            else:
                sessions.append([t, t, 1, v])

        # merge the open session from state with the first batch session
        if state.exists:
            start_us, end_us, n, vsum = state.get
            if sessions and sessions[0][0] - end_us <= gap_ms * 1000:
                s = sessions[0]
                s[0] = min(s[0], start_us)
                # a late (within-watermark) batch whose events all precede
                # the stored session end must not regress the end/timeout
                s[1] = max(s[1], end_us)
                s[2] += n
                s[3] += vsum
            else:
                sessions.insert(0, [start_us, end_us, n, vsum])

        *closed, last = sessions
        state.update((last[0], last[1], last[2], last[3]))
        # close the open session `gap` after its (event-time) end
        # (timeout API is in epoch millis; state is in micros)
        state.setTimeoutTimestamp(last[1] // 1000 + gap_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in closed],
                    "n_events": [n for _, _, n, _ in closed],
                    "value_sum": [v for _, _, _, v in closed],
                }
            )

    return fn


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful session windows over a *streaming* events DataFrame
    (columns: ts timestamp, user_id long, value double)."""
    gap_ms = {"30 minutes": 1_800_000, "10 minutes": 600_000, "1 hour": 3_600_000}.get(
        gap
    )
    if gap_ms is None:
        raise ValueError(f"unsupported gap {gap!r}")
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch_oracle(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch-mode reference semantics for :func:`sessionize`: classic
    gaps-and-islands with a window (session = run of events with
    inter-event gap <= gap). Used to cross-check the stateful operator's
    total output in tests."""
    from pyspark.sql import Window

    gap_s = {"30 minutes": 1800, "10 minutes": 600, "1 hour": 3600}[gap]
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = events.withColumn(
        "new_session",
        (
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long"), 1, -10**12).over(w)
            > gap_s
        ).cast("int"),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return marked.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("value_sum"),
    )


# ---------------- streaming rolling z-score / EWMA (anomaly leg) ------

ZSCORE_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("n_win", LongType()),
        StructField("s_cents", LongType()),
        StructField("q_cents2", LongType()),
        StructField("verdict", StringType()),
        StructField("ewma_micro_cents", LongType()),
    ]
)

from pyspark.sql.types import ArrayType  # noqa: E402  (module tail-add)

ZSCORE_STATE_SCHEMA = StructType(
    [StructField("tail", ArrayType(LongType()))]
)

_ZW, _ZT, _ZMIN = 50, 3, 5  # window rows, threshold, min obs
_ELAGS, _ESHIFT = 16, 16


def _zscore_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Incremental twin of operators/anomaly.rolling_zscore_flags +
    ewma_micro_cents: the state is ONLY the trailing <=50 cents values
    per user; each event's stats come from that tail (current excluded
    for the z baseline, included for the EWMA), in pure ints — the
    stream over ordered files equals the batch windows exactly
    (test_stream_zscore_matches_batch). Events are sorted per batch;
    ACROSS batches ordered arrival is the ingest contract (as for CDC
    sequences)."""
    (user_id,) = key
    tail = list(state.get[0]) if state.exists else []
    rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, xc in zip(pdf["event_id"], pdf["xc"]):
            xc = int(xc)
            win = tail[-_ZW:]
            n, s = len(win), sum(win)
            q = sum(v * v for v in win)
            if n < _ZMIN:
                verdict = "warmup"
            elif (n * xc - s) ** 2 * (n - 1) > _ZT * _ZT * n * (n * q - s * s):
                verdict = "anomaly"
            else:
                verdict = "normal"
            etail = (tail + [xc])[-(_ELAGS + 1):]
            en = len(etail)
            num = sum(
                v * (1 << (_ESHIFT - (en - i))) for i, v in enumerate(etail, 1)
            )
            den = (1 << (_ESHIFT + 1)) - (1 << (_ESHIFT + 1 - en))
            rows.append(
                (user_id, int(eid), n, s, q, verdict, (num * 1_000_000) // den)
            )
            tail = (tail + [xc])[-_ZW:]
    state.update((tail,))
    if rows:
        yield pd.DataFrame(rows, columns=[f.name for f in ZSCORE_OUT_SCHEMA.fields])


def stream_zscore(events: DataFrame) -> DataFrame:
    """Streaming anomaly analytics over an event stream (columns: ts,
    user_id, event_id, xc cents): per-user rolling z-score verdicts +
    alpha=1/2 EWMA, keyed state bounded at 50 longs per user (no
    timeout needed — state size is constant by construction)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _zscore_fn,
        outputStructType=ZSCORE_OUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------- streaming per-group sample maintenance --------------

SAMPLE_OUT_SCHEMA = StructType(
    [
        StructField("group_key", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_seen", LongType()),
    ]
)

SAMPLE_STATE_SCHEMA = StructType(
    [
        StructField("hashes", ArrayType(LongType())),
        StructField("ids", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)

_SAMPLE_M31 = 2147483647
_SAMPLE_A = 2654435761 % _SAMPLE_M31


def _sample_fn(quota: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Streaming twin of operators/mixing.quota_sample: per group
        keep the ``quota`` ids with the SMALLEST portable id-hash seen
        so far — a deterministic bottom-k 'reservoir' whose membership
        after ANY prefix of the stream equals the batch quota_sample of
        that prefix (the KMV argument: the global bottom-k is a
        function of the set, not the arrival order). State is exactly
        the k (hash, id) pairs + a seen-counter; each batch emits the
        CURRENT sample tagged with n_seen, so the latest emission per
        group is the up-to-date sample."""
        (group,) = key
        if state.exists:
            hashes, ids, n_seen = state.get
            pairs = list(zip(hashes, ids))
        else:
            pairs, n_seen = [], 0
        for pdf in pdfs:
            for did in pdf["doc_id"]:
                did = int(did)
                n_seen += 1
                pairs.append(((did * _SAMPLE_A) % _SAMPLE_M31, did))
            pairs = sorted(set(pairs))[:quota]
        state.update(([h for h, _ in pairs], [i for _, i in pairs], n_seen))
        yield pd.DataFrame(
            {
                "group_key": [str(group)] * len(pairs),
                "doc_id": [i for _, i in pairs],
                "n_seen": [n_seen] * len(pairs),
            }
        )

    return fn


def stream_group_sample(docs: DataFrame, group_col: str, quota: int) -> DataFrame:
    """Maintain a deterministic ``quota``-row sample per group over a
    stream (columns: ``group_col``, doc_id): bottom-k by the portable
    id-hash, so the sample after the final batch EQUALS the batch
    quota_sample over everything seen (tested). State per group is
    constant (k pairs + a counter); per-batch snapshot rows are
    APPENDED (tagged with n_seen — take each group's max-n_seen rows
    for the current sample; file sinks reject update mode).

    Ingest contract (ADVICE r5): ``doc_id`` must be UNIQUE per group
    across the stream — ``n_seen`` counts every arriving row while the
    sample dedups (hash, id) pairs, so replayed/duplicate ids would
    make the stream sample diverge from the batch ``quota_sample`` of
    the same rows (which ranks duplicate rows separately). This is the
    same at-most-once-per-id expectation the batch operator's
    deterministic-hash ranking already encodes."""
    return docs.groupBy(group_col).applyInPandasWithState(
        _sample_fn(quota),
        outputStructType=SAMPLE_OUT_SCHEMA,
        stateStructType=SAMPLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------- streaming Holt-Winters (seasonal scan leg) ----------

HW_OUT_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("day", LongType()),
        StructField("x", LongType()),
        StructField("rn", LongType()),
        StructField("level_micro", LongType()),
        StructField("trend_micro", LongType()),
        StructField("seasonal_micro", LongType()),
    ]
)

# level, trend, rn, the period-slot seasonal ring, and the ring cursor
HW_STATE_SCHEMA = StructType(
    [
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
        StructField("rn", LongType()),
        StructField("seas", ArrayType(DoubleType())),
        StructField("pos", LongType()),
    ]
)


def _holt_winters_fn(alpha: float, beta: float, gamma: float, period: int):
    """Incremental twin of operators/statescan.holt_winters_scan
    (VERDICT r7 item 7): the state is exactly the batch scan's per-key
    state — level + trend + the m-slot seasonal ring + cursor — and
    every micro-batch applies the IDENTICAL pinned-IEEE op sequence,
    so the stream over time-ordered batches equals the batch scan
    bit-for-bit (test_stream_holt_winters_matches_batch, >= 3
    micro-batches). Ordered arrival across batches is the ingest
    contract (as for stream_zscore / CDC sequences); rows are sorted
    within each batch."""
    import math

    a, g, c = float(alpha), float(beta), float(gamma)
    ca, cg, cc = 1.0 - a, 1.0 - g, 1.0 - c
    m = int(period)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            l, b, rn, seas, pos = state.get
            seas = list(seas)
        else:
            l, b, rn, seas, pos = 0.0, 0.0, 0, [0.0] * m, 0
        rows = []
        # concat BEFORE sorting: a group's micro-batch arrives as an
        # iterator of Arrow chunks (split at maxRecordsPerBatch), and a
        # chunk-local sort would interleave days across chunks for
        # >10k-row groups (round-8 self-review; the sessionize fn's
        # pattern)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks).sort_values("day")
            for day, x in zip(allpdf["day"], allpdf["x"]):
                xf = float(x)
                if rn == 0:
                    l, b = xf, 0.0
                    scur = 0.0
                else:
                    so = seas[pos]
                    ln = a * (xf - so) + ca * (l + b)
                    b = g * (ln - l) + cg * b
                    scur = c * (xf - ln) + cc * so
                    seas[pos] = scur
                    pos = (pos + 1) % m
                    l = ln
                rn += 1
                rows.append(
                    (
                        k, int(day), int(x), rn,
                        math.floor(l * 1_000_000.0),
                        math.floor(b * 1_000_000.0),
                        math.floor(scur * 1_000_000.0),
                    )
                )
        state.update((l, b, rn, seas, pos))
        if rows:
            yield pd.DataFrame(
                rows, columns=[f.name for f in HW_OUT_SCHEMA.fields]
            )

    return fn


def stream_holt_winters(
    daily: DataFrame,
    alpha: float = 0.25,
    beta: float = 0.5,
    gamma: float = 0.25,
    period: int = 7,
) -> DataFrame:
    """Streaming additive Holt-Winters over a pre-aggregated daily
    stream (columns: k long, day long, x long) — the seasonal member
    of the streaming scan family next to stream_zscore. Keyed state is
    2 + period floats + a counter (constant by construction — no
    timeout needed); output appends one smoothed row per input row."""
    return daily.groupBy("k").applyInPandasWithState(
        _holt_winters_fn(alpha, beta, gamma, period),
        outputStructType=HW_OUT_SCHEMA,
        stateStructType=HW_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------- streaming histogram quantiles -----------------------

HISTQ_OUT_SCHEMA = StructType(
    [
        StructField("g", LongType()),
        StructField("n_seen", LongType()),
        StructField("pct", LongType()),
        StructField("q_est", DoubleType()),
    ]
)

HISTQ_STATE_SCHEMA = StructType(
    [StructField("bins", ArrayType(LongType()))]
)


def _hist_quantile_fn(lo: float, hi: float, nbins: int, pcts: tuple):
    """Incremental twin of operators/quantile.histogram_group_quantiles:
    keyed state is the fixed-bin count vector (nbins longs — constant,
    no timeout needed), and the per-batch estimates replay the batch
    operator's EXACT IEEE op sequence (r = pct*total/100.0; first bin
    with cum >= r; lo + (bin + frac)*width; floor to 4 dp), so the
    final emission equals the batch operator over everything seen.
    Histogram counts are commutative, so unlike stream_zscore this
    needs NO ordered-arrival contract — any batch split converges to
    the same snapshot (asserted over arbitrary thirds in the e2e
    test)."""
    import math

    width = (hi - lo) / nbins

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (g,) = key
        bins = list(state.get[0]) if state.exists else [0] * nbins
        for pdf in pdfs:
            for x in pdf["x"]:
                x = float(x)
                if math.isnan(x):
                    continue
                b = int(math.floor((x - lo) / width))
                b = min(nbins - 1, max(0, b))
                bins[b] += 1
        state.update((bins,))
        total = sum(bins)
        if total == 0:
            return
        rows = []
        for pct in pcts:
            r = (pct * total) / 100.0
            cum = 0
            for b, n in enumerate(bins):
                cum += n
                if n > 0 and cum >= r and (cum - n) < r:
                    frac = (r - (cum - n)) / n
                    q = lo + (b + frac) * width
                    rows.append(
                        (g, total, pct, math.floor(q * 10000) / 10000.0)
                    )
                    break
        yield pd.DataFrame(
            rows, columns=[f.name for f in HISTQ_OUT_SCHEMA.fields]
        )

    return fn


def stream_histogram_quantile(
    values: DataFrame,
    lo: float,
    hi: float,
    nbins: int = 64,
    pcts: tuple = (50, 90, 99),
) -> DataFrame:
    """Streaming per-group quantile estimates over a value stream
    (columns: g long, x double) — the mergeable-sketch answer to
    'p99 per group, continuously': bounded per-group state (nbins
    counters), bin-width-bounded error, engine-replayable arithmetic
    (the histogram_group_quantiles doctrine). Each micro-batch appends
    a snapshot per group tagged with n_seen; read each group's
    max-n_seen rows for the current estimate (file sinks reject
    update mode — the stream_group_sample convention)."""
    return values.groupBy("g").applyInPandasWithState(
        _hist_quantile_fn(float(lo), float(hi), int(nbins), tuple(pcts)),
        outputStructType=HISTQ_OUT_SCHEMA,
        stateStructType=HISTQ_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
