"""Stateful per-key sequential scans — recurrences no window function
can express.

The flagship here is the two-sided clamped (capped) running sum
``b_i = clamp(b_{i-1} + x_i, lo, hi)``: inventory/credit balances that
saturate at a cap and floor at zero. Unlike a plain prefix sum, the
clamp is NONLINEAR, so ``sum() OVER (ORDER BY ...)`` cannot express it
— this is the canonical case for Spark's (b)-class custom-operator
path. Physical form: ONE hash partitioning on the keys +
sortWithinPartitions, then ``mapInPandas`` with state reset at key
boundaries (see ``_partition_sorted``) — semantically identical to
applyInPandas-per-group but without materializing a pandas frame per
group, which dominates when groups are small and numerous.

Reference comparison: the reference's engine had no equivalent; its
users dropped to driver-side loops for saturating balances. Here the
shuffle is the SAME single hash-partition any grouped aggregate pays,
and the scan parallelizes across keys (the 100 TB posture: millions of
users, each group small).

Scale notes for the one-huge-key case:
  - one-sided clamp (lo only) has the closed form
    ``b_i = p_i - min(0, running_min(p_i))`` over the raw prefix sum
    ``p`` — fully window-expressible, use that when there is no cap;
  - the two-sided map ``x -> min(hi', max(lo', x + d))`` is
    composition-closed (saturating affine maps form a 3-parameter
    monoid), so a parallel prefix scan over per-chunk composed
    ``(d, lo', hi')`` triples splits ONE key across partitions —
    implemented as :func:`capped_running_sum_parallel` (range-chunk →
    per-chunk composed triple → driver prefix-compose over n_chunks
    triples → seeded per-chunk replay). Data is touched exactly twice,
    the driver sees n_chunks rows, and equality with the sequential
    recurrence is property-tested.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partition_sorted(df: DataFrame, keys: list, order_cols: list) -> DataFrame:
    """The shared physical layout every keyed scan runs on: ONE hash
    partitioning on the keys (the same shuffle a grouped agg pays),
    rows of a key contiguous and ordered via sortWithinPartitions.
    Scans then run as mapInPandas with state reset at key boundaries —
    one Python pass per Arrow batch, NO per-group pandas frames.
    applyInPandas (the first implementation here) materializes a
    frame per group, which dominates wall-clock when groups are small
    and numerous (the fixture shape: ~7 events/user); the boundary-
    reset form measured 5-6x faster (4.3/4.2/4.6 s -> 0.85/0.77/0.74 s
    at sf0.1, min-of-3) with identical output — parity re-proven at
    sf0.01 + sf1 and the hypothesis models unchanged."""
    return df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *keys, *order_cols
    )


def _key_rows(pdf: pd.DataFrame, keys: list):
    """Per-row key view for boundary detection: the raw numpy array
    for one key, a list of tuples for compound keys."""
    if len(keys) == 1:
        return pdf[keys[0]].to_numpy()
    return list(zip(*[pdf[k].to_numpy() for k in keys]))


def capped_running_sum(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    delta_col: str,
    lo: int,
    hi: int,
    bal_col: str = "bal",
    rn_col: str = "rn",
) -> DataFrame:
    """Per-key ordered scan ``b_i = clamp(b_{i-1} + delta_i, lo, hi)``
    with ``b_0 = 0``; emits every input row plus its 1-based per-key
    sequence number ``rn_col`` and post-clamp balance ``bal_col``
    (both int64).

    Preconditions (caller-enforced): ``delta_col`` is a non-NULL
    integer column; ``(keys, order_cols)`` uniquely order rows within
    a key (ties would make the recurrence nondeterministic).
    """
    if lo > hi:
        raise ValueError(f"capped_running_sum: lo {lo} > hi {hi}")
    keys = list(keys)
    order_cols = list(order_cols)
    base = df.select(*keys, *order_cols, delta_col)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields
    ) + f", `{rn_col}` bigint, `{bal_col}` bigint"

    def run(batches):
        cur, s, rn = object(), 0, 0  # sentinel never equals a key
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            kv = _key_rows(pdf, keys)
            deltas = pdf[delta_col].to_numpy()
            bal = np.empty(n, dtype=np.int64)
            rns = np.empty(n, dtype=np.int64)
            for i in range(n):
                if kv[i] != cur:
                    cur, s, rn = kv[i], 0, 0
                s += int(deltas[i])
                if s < lo:
                    s = lo
                elif s > hi:
                    s = hi
                rn += 1
                bal[i] = s
                rns[i] = rn
            pdf[rn_col] = rns
            pdf[bal_col] = bal
            yield pdf

    return _partition_sorted(base, keys, order_cols).mapInPandas(
        run, out_schema
    )


def capped_running_sum_parallel(
    df: DataFrame,
    order_cols: Sequence[str],
    delta_col: str,
    lo: int,
    hi: int,
    n_chunks: int = 32,
    bal_col: str = "bal",
    rn_col: str = "rn",
) -> DataFrame:
    """Single-sequence (keyless) clamped running sum, parallelized via
    the saturating-affine-map monoid: ``clamp(x + d, l, h)`` maps are
    closed under composition with

        (d1,l1,h1) then (d2,l2,h2)
          = (d1+d2, clamp(l1+d2, lo, hi), clamp(h1+d2, lo, hi))

    so ONE ordered sequence too large for one task splits into range
    chunks: pass 1 composes each chunk's triple (a per-chunk O(rows)
    scan, n_chunks rows to the driver), the driver prefix-composes
    n_chunks triples into per-chunk entry balances, pass 2 replays
    each chunk seeded with its entry state. Both passes read the SAME
    localCheckpoint'ed range partitioning (the repo's lineage-cut
    idiom), so chunk membership cannot drift between them; the
    checkpoint blocks are reclaimed by the ContextCleaner when the
    returned plan is garbage-collected.

    Output: the input columns plus global 1-based ``rn_col`` and
    ``bal_col`` (both int64) — identical to what
    :func:`capped_running_sum` under a single constant key produces
    (property-tested). Preconditions match: integer non-NULL deltas,
    globally unique ``order_cols``.
    """
    if lo > hi:
        raise ValueError(f"capped_running_sum_parallel: lo {lo} > hi {hi}")
    order_cols = list(order_cols)
    base = df.select(*order_cols, delta_col)
    chunked = (
        base.repartitionByRange(n_chunks, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    def clamp(v: int) -> int:
        return lo if v < lo else (hi if v > hi else v)

    # pass 1: one composed (d, l, h) triple + row count per chunk
    def compose(batches):
        pid, n, d, l, h = None, 0, 0, None, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            n += len(pdf)
            for x in pdf[delta_col].to_numpy():
                x = int(x)
                d += x
                l = lo if l is None else clamp(l + x)
                h = hi if h is None else clamp(h + x)
        if pid is not None:
            yield pd.DataFrame(
                {"pid": [pid], "n": [n], "d": [d], "l": [l], "h": [h]}
            )

    triples = {
        r["pid"]: r
        for r in chunked.mapInPandas(
            compose, "pid int, n bigint, d bigint, l bigint, h bigint"
        ).collect()
    }
    # driver prefix-compose: entry balance + rn offset per chunk.
    # n_chunks rows total — the only driver-side state, by design.
    entry: dict[int, tuple[int, int]] = {}
    s, off = 0, 0
    for pid in sorted(triples):  # range partition ids are order-aligned
        r = triples[pid]
        entry[pid] = (s, off)
        s = min(r["h"], max(r["l"], s + r["d"]))
        off += r["n"]

    # pass 2: seeded sequential replay per chunk (state carried across
    # Arrow batches — mapInPandas yields a partition's batches in order)
    out_schema = ", ".join(
        f"`{c}` {f.dataType.simpleString()}"
        for c, f in zip(base.columns, base.schema.fields)
    ) + f", `{rn_col}` bigint, `{bal_col}` bigint"

    def replay(batches):
        state = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if state is None:
                state = entry[int(pdf["__pid"].iloc[0])]
            s, off = state
            deltas = pdf[delta_col].to_numpy()
            bal = [0] * len(deltas)
            for i, x in enumerate(deltas):
                s = clamp(s + int(x))
                bal[i] = s
            out = pdf.drop(columns=["__pid"])
            out[rn_col] = pd.RangeIndex(off + 1, off + 1 + len(deltas))
            out[bal_col] = pd.Series(bal, dtype="int64")
            state = (s, off + len(deltas))
            yield out

    return chunked.mapInPandas(replay, out_schema)


def lower_clamped_running_sum(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    delta_col: str,
    bal_col: str = "bal",
) -> DataFrame:
    """One-sided (floor-at-zero) clamped running sum — the closed-form
    window variant of :func:`capped_running_sum` for the no-cap case:
    ``b_i = p_i - min(0, min_{j<=i} p_j)`` over the raw prefix sum
    ``p``. Pure window functions, whole-stage codegen, no Python —
    ALWAYS prefer this when there is no upper bound. Equality with the
    sequential recurrence is property-tested."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # windows don't nest: materialize the prefix sum, then min over it
    # (both windows share one partitioning — ONE sort, no extra shuffle)
    return (
        df.withColumn("__p", F.sum(F.col(delta_col)).over(w))
        .withColumn(
            bal_col,
            (F.col("__p") - F.least(F.lit(0), F.min("__p").over(w)))
            .cast("long"),
        )
        .drop("__p")
    )


def ewma_scan(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma_micro",
    rn_col: str = "rn",
) -> DataFrame:
    """Per-key exponentially weighted moving average
    ``s_1 = x_1; s_i = alpha*x_i + (1-alpha)*s_{i-1}`` — the linear
    sibling of the clamp scan. The closed form
    ``sum(beta^(i-j) * x_j)`` IS window-expressible via pow(), but
    pow is libm (cross-engine-unstable, the repo's determinism rules),
    so the recurrence runs as a stateful scan in pinned IEEE order —
    exactly two multiplies and one add per step, replayable by a
    recursive-CTE oracle bit-for-bit. Pass an ``alpha`` exactly
    representable in binary (0.25, 0.5, 0.125...) so the literal
    parses to the same double in both engines. Emits
    ``floor(s * 1e6)`` as int64 plus the per-key row number."""
    keys = list(keys)
    order_cols = list(order_cols)
    beta = 1.0 - alpha  # exact for representable alpha
    base = df.select(*keys, *order_cols, value_col)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields
    ) + f", `{rn_col}` bigint, `{out_col}` bigint"

    import math

    def run(batches):
        cur, s, rn = object(), 0.0, 0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            kv = _key_rows(pdf, keys)
            xs = pdf[value_col].to_numpy()
            out = np.empty(n, dtype=np.int64)
            rns = np.empty(n, dtype=np.int64)
            for i in range(n):
                x = float(xs[i])
                if kv[i] != cur:
                    cur, s, rn = kv[i], x, 0
                else:
                    s = alpha * x + beta * s
                rn += 1
                out[i] = math.floor(s * 1_000_000.0)
                rns[i] = rn
            pdf[rn_col] = rns
            pdf[out_col] = out
            yield pdf

    return _partition_sorted(base, keys, order_cols).mapInPandas(
        run, out_schema
    )


def holt_scan(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    beta: float,
    rn_col: str = "rn",
) -> DataFrame:
    """Per-key Holt double-exponential smoothing — the TWO-state
    linear scan (level + trend):

        l_1 = x_1, b_1 = 0
        l_i = alpha*x_i + (1-alpha)*(l_{i-1} + b_{i-1})
        b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}

    demonstrating that the stateful-scan class carries arbitrary
    state vectors, not just scalars. Same pinned-IEEE doctrine as
    :func:`ewma_scan`: pass binary-exact ``alpha``/``beta`` (0.25,
    0.5, ...) and the recursive-CTE oracle replays the identical op
    sequence bit-for-bit. Emits ``level_micro``/``trend_micro``
    (floor(v*1e6), int64 — floor, not trunc: the trend goes negative)
    and the per-key row number."""
    keys = list(keys)
    order_cols = list(order_cols)
    a, g = float(alpha), float(beta)
    ca, cg = 1.0 - a, 1.0 - g
    base = df.select(*keys, *order_cols, value_col)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields
    ) + f", `{rn_col}` bigint, `level_micro` bigint, `trend_micro` bigint"

    import math

    def run(batches):
        cur, l, b, rn = object(), 0.0, 0.0, 0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            kv = _key_rows(pdf, keys)
            xs = pdf[value_col].to_numpy()
            lv = np.empty(n, dtype=np.int64)
            tr = np.empty(n, dtype=np.int64)
            rns = np.empty(n, dtype=np.int64)
            for i in range(n):
                x = float(xs[i])
                if kv[i] != cur:
                    cur, l, b, rn = kv[i], x, 0.0, 0
                else:
                    ln = a * x + ca * (l + b)
                    b = g * (ln - l) + cg * b
                    l = ln
                rn += 1
                lv[i] = math.floor(l * 1_000_000.0)
                tr[i] = math.floor(b * 1_000_000.0)
                rns[i] = rn
            pdf[rn_col] = rns
            pdf["level_micro"] = lv
            pdf["trend_micro"] = tr
            yield pdf

    return _partition_sorted(base, keys, order_cols).mapInPandas(
        run, out_schema
    )
