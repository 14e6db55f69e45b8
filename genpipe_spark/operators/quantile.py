"""Exact grouped quantiles via nearest-rank selection.

The reference's summary-statistics step computes per-cohort depth/quality
percentiles on the driver after a collect; here the selection is fully
distributed: one shuffle on the group key, a per-group sort (row_number)
and a windowed count, then a rank-match filter. Nothing is collected and
no group ever materializes as an in-memory array, so a skewed 100 TB
group degrades to a big external sort — not an OOM.

Determinism: nearest-rank picks an ACTUAL data value at integer rank
ceil(pct*n/100), computed as (pct*n + 99) DIV 100 in pure integer
arithmetic — no float interpolation, so a DuckDB oracle reproduces it
bit-for-bit (unlike percentile_cont, whose (1-f)*a+f*b interpolation
order is engine-internal).

For the 100 TB *approximate* path Spark's built-in
``percentile_approx`` (GK-sketch, single aggregation, mergeable) is the
right tool; it is exposed here as ``approx=True`` and registers only as
a rows-only check (sketch outputs are not oracle-reproducible).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def count_strict_inversions(y) -> int:
    """STRICT inversions (y[i] > y[j], i < j) in O(n log n), vectorized:
    32-wide base blocks counted by one broadcast comparison, then
    bottom-up merging where each cross count is ONE searchsorted
    (#(L > r) summed over r = |L|*|R| - sum searchsorted(L, R,
    'right')). ~n/32 interpreter iterations total instead of a
    per-element Python merge sort (review r7s5: the pure-Python
    version was interpreter-bound on million-row groups).

    Module-level so both Kendall tau-b and Mann-Kendall ride the same
    machinery (S over time order = n0 - y-tie pairs - 2*inversions).
    """
    import numpy as np

    a = np.asarray(y, dtype=np.int64)
    n = len(a)
    if n < 2:
        return 0
    w = 32
    m = -(-n // w)
    big = np.iinfo(np.int64).max
    b = np.concatenate([a, np.full(m * w - n, big, np.int64)])
    b = b.reshape(m, w)
    iu, ju = np.triu_indices(w, k=1)
    # padding sits at the highest j positions of the last block:
    # big > big and real > big are both False, so pads never count
    total = int((b[:, iu] > b[:, ju]).sum())
    b = np.sort(b, axis=1)
    blocks = [row for row in b]
    # strip pads from the last block BY COUNT, not by value: data
    # equal to INT64_MAX is indistinguishable from a pad, and a
    # value filter would drop it (round-7 advisory). Sorted pads
    # occupy the tail; keeping the first (n mod w) elements keeps
    # exactly the data multiset (any retained MAX compares
    # identically whether it was data or pad).
    n_last = n - (m - 1) * w
    blocks[-1] = blocks[-1][:n_last]
    while len(blocks) > 1:
        nxt = []
        for i in range(0, len(blocks) - 1, 2):
            left, right = blocks[i], blocks[i + 1]
            total += int(
                len(left) * len(right)
                - int(np.searchsorted(left, right, side="right").sum())
            )
            nxt.append(np.sort(np.concatenate([left, right])))
        if len(blocks) % 2:
            nxt.append(blocks[-1])
        blocks = nxt
    return total


def group_quantiles(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
    pcts: Sequence[int] = (50, 90, 99),
    approx: bool = False,
    prereduce: bool = False,
) -> DataFrame:
    """Per-group percentiles of ``value_col``.

    Output: one row per (group, pct): ``*by, pct, q`` where ``q`` is the
    nearest-rank element (exact mode) or the GK-sketch estimate (approx).
    Ties inside equal values are irrelevant — equal values at the picked
    rank yield the same ``q`` whatever the sort put first.

    ``prereduce=True`` (r12, guide §2.3 — aggregate before you
    shuffle): collapse to (group, value, count) with a map-side-
    combinable agg first, then select the nearest rank from CUMULATIVE
    counts — bit-identical (rank r falls inside value v's occupancy
    range (cum-c, cum] exactly when the sorted multiset's r-th element
    is v), but the window sorts distinct values instead of rows and
    the shuffle carries counts. Callers opt in WHEN THEY KNOW the
    value domain is small (e.g. l_quantity's 50 integers: measured
    1.02 s -> 0.41 s at sf0.1, and at 100 TB the per-group external
    sort of every row becomes a combinable count shuffle). For
    high-cardinality values (price cents) the extra exchange reduces
    nothing — measured a pure loss (quantile-mad 2.6 -> 3.6 s) — so
    the default stays row-level."""
    bad = [p for p in pcts if not 1 <= int(p) <= 100]
    if bad:
        raise ValueError(f"pcts must be in [1, 100], got {bad}")
    if approx:
        ps = [p / 100.0 for p in pcts]
        agg = df.groupBy(*by).agg(
            F.percentile_approx(value_col, ps, 10000).alias("qs")
        )
        pairs = F.arrays_zip(
            F.array(*[F.lit(int(p)).cast("long") for p in pcts]).alias("pct"),
            F.col("qs").alias("q"),
        )
        ex = agg.select(*by, F.explode(pairs).alias("e"))
        return ex.select(*by, F.col("e.pct").alias("pct"), F.col("e.q").alias("q"))

    # NULL values are excluded so exact n matches percentile_approx and
    # DuckDB quantile_disc, both of which ignore NULLs.
    df = df.where(F.col(value_col).isNotNull())
    pct_arr = F.array(*[F.lit(int(p)).cast("long") for p in pcts])
    if prereduce:
        vc = df.groupBy(*by, F.col(value_col).alias("q")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        w_cum = (
            Window.partitionBy(*by)
            .orderBy("q")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ranked = vc.select(
            *by,
            "q",
            "__c",
            F.sum("__c").over(w_cum).alias("__cum"),
            F.sum("__c").over(Window.partitionBy(*by)).alias("__n"),
        )
        ex = ranked.select(
            *by, "q", "__c", "__cum", "__n", F.explode(pct_arr).alias("pct")
        )
        target = F.expr("(pct * __n + 99) DIV 100")
        return ex.where(
            (F.col("__cum") >= target)
            & ((F.col("__cum") - F.col("__c")) < target)
        ).select(*by, "pct", "q")
    w_sort = Window.partitionBy(*by).orderBy(F.col(value_col))
    w_all = Window.partitionBy(*by)
    ranked = df.select(
        *by,
        F.col(value_col).alias("q"),
        F.row_number().over(w_sort).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    ex = ranked.select(
        *by, "q", "__rn", "__n", F.explode(pct_arr).alias("pct")
    )
    # nearest-rank = ceil(pct*n/100) in integer math: (pct*n + 99) DIV 100
    target = F.expr("(pct * __n + 99) DIV 100")
    return ex.where(F.col("__rn") == target).select(*by, "pct", "q")


def histogram_group_quantiles(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
    lo: float,
    hi: float,
    nbins: int = 64,
    pcts: Sequence[int] = (50, 90, 99),
) -> DataFrame:
    """Histogram-estimated per-group percentiles — the 100 TB quantile
    path that is BOTH mergeable and oracle-replayable.

    Exact mode above needs a per-group sort; ``percentile_approx``'s GK
    sketch avoids that but its internals aren't engine-reproducible
    (rows-only check). This operator squares the triangle: state is
    ≤ nbins counters per group (one map-side-combinable agg — same
    shape as drift.histogram_fixed), estimates interpolate linearly
    inside the containing bin (PromQL histogram_quantile semantics),
    error is bounded by the bin width, and every arithmetic step is
    plain IEEE ops an ANSI-SQL twin replays bit-for-bit.

    Caller fixes [lo, hi) like drift.histogram_fixed (edge-clamping
    included, same rationale); values outside contribute to edge bins,
    so their mass is counted even though their magnitude saturates.
    Output: ``*by, pct, q_est`` (floor-truncated to 4 dp)."""
    bad = [p for p in pcts if not 1 <= int(p) <= 100]
    if bad:
        raise ValueError(f"pcts must be in [1, 100], got {bad}")
    if not (hi > lo and nbins >= 2):
        raise ValueError("histogram_group_quantiles: need hi > lo and nbins >= 2")
    width = (hi - lo) / nbins
    c = F.col(value_col).cast("double")
    b = F.floor((c - F.lit(lo)) / F.lit(width)).cast("int")
    b = F.least(F.lit(nbins - 1), F.greatest(F.lit(0), b))
    # NaNs dropped with NULLs — floor(NaN) would clamp-count them in bin 0
    hist = (
        df.where(c.isNotNull() & ~F.isnan(c))
        .select(*by, b.alias("bin"))
        .groupBy(*by, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_cum = (
        Window.partitionBy(*by)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*by)
    cum = hist.select(
        *by,
        "bin",
        "n",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    pct_arr = F.array(*[F.lit(int(p)).cast("long") for p in pcts])
    ex = cum.select(*by, "bin", "n", "cum", "total", F.explode(pct_arr).alias("pct"))
    # continuous target rank r = pct/100 * total; the containing bin is
    # the FIRST with cum >= r — i.e. cum >= r AND cum - n < r
    r = F.col("pct") * F.col("total") / 100.0
    containing = ex.where((F.col("cum") >= r) & ((F.col("cum") - F.col("n")) < r))
    frac = (r - (F.col("cum") - F.col("n"))) / F.col("n")
    q = F.lit(lo) + (F.col("bin") + frac) * F.lit(width)
    return containing.select(
        *by, "pct", (F.floor(q * 10000) / 10000.0).alias("q_est")
    )


def group_mad(
    df: DataFrame,
    value_cents_col: str,
    by: Sequence[str],
) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    statistic (outlier-insensitive, unlike stddev): MAD = median of
    |x - median(x)|, both medians exact nearest-rank over integer
    cents so the result is an actual data(-derived) value and
    engine-exact. Two :func:`group_quantiles` passes + one group-keyed
    join; same no-collect distribution story.

    Output: *by, med_cents, mad_cents."""
    med = group_quantiles(df, value_cents_col, by, pcts=(50,)).select(
        *by, F.col("q").alias("med_cents")
    )
    dev = df.join(med, list(by)).select(
        *by,
        F.abs(F.col(value_cents_col) - F.col("med_cents")).alias("__dev"),
    )
    mad = group_quantiles(dev, "__dev", by, pcts=(50,)).select(
        *by, F.col("q").alias("mad_cents")
    )
    return med.join(mad, list(by))


def group_weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    by: Sequence[str],
) -> DataFrame:
    """Lower weighted median per group: the smallest value whose
    cumulative weight reaches half the group's total — the
    importance-weighted center (duplicate-aware corpus statistics,
    weighted latency medians). Integer weights keep every comparison
    exact; the result is an ACTUAL data value (nearest-rank doctrine,
    see module docstring), so the oracle reproduces it bit-for-bit.

    Determinism under ties: rows with equal values may accumulate in
    any order, but the first value whose VALUE-level cumulative weight
    crosses half-total is order-independent, and only the value is
    emitted.

    Shape: one value-ordered window (cumulative + total ride the same
    partition spec) + one grouped min — a single hash shuffle on the
    group key. NULL values or weights are EXCLUDED (the module's
    NULL-exclusion doctrine; Spark sorts NULLS FIRST where DuckDB
    sorts them LAST, so including them would both shift the crossing
    and break engine parity — round-6 review). Output: *by, w_total,
    wmedian."""
    keys = list(by)
    df = df.where(
        F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
    )
    wp = Window.partitionBy(*keys)
    wo = wp.orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0)
    flagged = df.withColumn("__cum", F.sum(weight_col).over(wo)).withColumn(
        "__tot", F.sum(weight_col).over(wp)
    )
    return (
        flagged.groupBy(*keys)
        .agg(
            F.max("__tot").alias("w_total"),
            F.min(
                F.when(
                    F.col("__cum") * 2 >= F.col("__tot"), F.col(value_col)
                )
            ).alias("wmedian"),
        )
    )


def group_weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    by: Sequence[str],
    pcts: Sequence[int] = (25, 50, 75),
) -> DataFrame:
    """Generalization of :func:`group_weighted_median` to arbitrary
    percentiles: for each pct, the smallest value whose cumulative
    weight reaches pct% of the group total — exact integer crossing
    ``cum*100 >= pct*tot`` (no float thresholds), one row per
    (group, pct). Same single-shuffle shape and NULL-exclusion as the
    median; pcts is a small constant, so the per-pct mins ride ONE
    aggregate over the same flagged frame.

    Output: *by, pct, w_total, wq."""
    keys = list(by)
    pcts = list(pcts)
    if not pcts or any(p < 1 or p > 100 for p in pcts):
        raise ValueError("group_weighted_quantiles: pcts must be in [1, 100]")
    df = df.where(
        F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
    )
    wp = Window.partitionBy(*keys)
    wo = wp.orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0)
    flagged = df.withColumn("__cum", F.sum(weight_col).over(wo)).withColumn(
        "__tot", F.sum(weight_col).over(wp)
    )
    agg = flagged.groupBy(*keys).agg(
        F.max("__tot").alias("w_total"),
        *[
            F.min(
                F.when(
                    F.col("__cum") * 100 >= F.lit(p) * F.col("__tot"),
                    F.col(value_col),
                )
            ).alias(f"__q_{p}")
            for p in pcts
        ],
    )
    stacked = ", ".join(f"{p}, __q_{p}" for p in pcts)
    return agg.select(
        *keys,
        "w_total",
        F.expr(f"stack({len(pcts)}, {stacked}) AS (pct, wq)"),
    ).select(*keys, "pct", "w_total", "wq")


def winsorize(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-group winsorization — clip ``value_col`` into its own
    group's exact nearest-rank [lo_pct, hi_pct] band — the standard
    outlier-robust preprocessing before means/regressions (trimming's
    keep-the-row sibling). Bounds come from :func:`group_quantiles`
    (exact mode; one sort-window shuffle over the data), pivoted to a
    per-group (lo, hi) row and joined back group-keyed — the bounds
    table is group-count-sized, so AQE broadcasts it when small and
    shuffles when not; nothing here is data-sized state. Appends
    ``<value_col>_wins`` and a ``clipped`` flag; NULL values pass
    through as NULL with a NULL flag — guarded explicitly, because
    least/greatest IGNORE NULLs in both engines (greatest(NULL, lo)
    = lo would silently impute the lower bound)."""
    if not (1 <= lo_pct < hi_pct <= 100):
        raise ValueError("winsorize: need 1 <= lo_pct < hi_pct <= 100")
    bounds = group_quantiles(df, value_col, by, pcts=(lo_pct, hi_pct))
    b = bounds.groupBy(*by).agg(
        F.min(F.when(F.col("pct") == lo_pct, F.col("q"))).alias("__lo"),
        F.min(F.when(F.col("pct") == hi_pct, F.col("q"))).alias("__hi"),
    )
    out = df.join(b, list(by))
    c = F.col(value_col)
    return (
        out.withColumn(
            f"{value_col}_wins",
            F.when(
                c.isNotNull(),
                F.least(F.greatest(c, F.col("__lo")), F.col("__hi")),
            ),
        )
        .withColumn(
            "clipped", (c < F.col("__lo")) | (c > F.col("__hi"))
        )
        .drop("__lo", "__hi")
    )


def kendall_tau_grouped(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Kendall tau-b over integer columns — the third member
    of the correlation family (Pearson = agg-grouped-corr, Spearman =
    agg-spearman-corr; Kendall is the pair-concordance view, robust to
    monotone transforms AND, unlike Spearman, interpretable as a
    probability of concordance).

    Knight's O(n log n) algorithm per group: sort by (x, y), count
    y-inversions S with a vectorized bottom-up merge (numpy
    searchsorted cross counts — ~n/32 interpreter steps), then with
    n0 = C(n,2),
    n1 = sum C(tx,2) (x-tie runs), n2 = sum C(ty,2) (y-tie runs),
    n3 = sum C(txy,2) (joint-tie runs):

        nc - nd = n0 - n1 - n2 + n3 - 2*S
        tau_b   = (nc - nd) / sqrt((n0 - n1) * (n0 - n2))

    All counts are exact int64; ``tau_micro`` is ONE pinned-IEEE
    sqrt/divide expression over them (the quality-mannwhitney z
    doctrine), NULL when a group is constant in either column.
    Emits ``*keys, n, disc_swaps, n0, n1, n2, n3, tau_micro``.

    Scale: one applyInPandas per group — groups are the parallelism
    (the exact-grouped-order-statistics posture of
    quantile-group-exact); the in-group cost is the sort. Inputs must
    be non-NULL integers (callers quantize/filter first).
    """
    import math

    import pandas as pd

    keys = list(keys)
    base = df.select(*keys, x_col, y_col)
    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in base.select(*keys).schema.fields
    )
    out_schema = (
        f"{key_schema}, n bigint, disc_swaps bigint, n0 bigint, n1 bigint,"
        " n2 bigint, n3 bigint, tau_micro bigint"
    )

    count_inversions = count_strict_inversions

    def tie_term(series) -> int:
        return int(sum(t * (t - 1) // 2 for t in series if t > 1))

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        srt = pdf.sort_values([x_col, y_col], kind="mergesort")
        swaps = count_inversions(srt[y_col].to_numpy())
        n0 = n * (n - 1) // 2
        n1 = tie_term(pdf.groupby(x_col).size())
        n2 = tie_term(pdf.groupby(y_col).size())
        n3 = tie_term(pdf.groupby([x_col, y_col]).size())
        num = n0 - n1 - n2 + n3 - 2 * swaps
        d1, d2 = n0 - n1, n0 - n2
        tau = (
            None
            if d1 == 0 or d2 == 0
            else math.floor(1_000_000.0 * float(num)
                            / math.sqrt(float(d1) * float(d2)))
        )
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row.update(
            n=[n], disc_swaps=[swaps], n0=[n0], n1=[n1], n2=[n2], n3=[n3],
            tau_micro=pd.array([tau], dtype="Int64"),
        )
        return pd.DataFrame(row)

    return base.groupBy(*keys).applyInPandas(one_group, out_schema)


def mann_kendall_theil_sen_grouped(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    y_col: str,
    exact_pair_n: int = 3000,
    whale_sample_pairs: int = 200_000,
) -> DataFrame:
    """Per-group Mann-Kendall trend test + Theil-Sen slope, whale-safe
    via hot/cold routing (the statescan _route_hot_keys doctrine).

    The round-8 ``weak`` was an UNGUARDED per-key O(n^2) self-join —
    one bot user with 10^6 events costs 5*10^11 pairs in a single
    task. Cold keys (n <= ``exact_pair_n``) KEEP that declarative
    whole-stage-codegen plan — with the gate it is bounded, and at
    fixture scale it is ~2x faster than an all-Arrow form (r9 bench).
    Whale keys route to ONE Arrow batch through ``applyInPandas``
    where the statistic rides the existing O(n log n) inversion
    machinery (``count_strict_inversions``, the agg-kendall-tau
    precedent):

      S     = n0 - yties - 2*inversions(y in time order)
              (n0 = C(n,2); yties = sum C(t,2) over equal-y runs;
               inversions = #{i<j : y_i > y_j})
      var18 = n(n-1)(2n+5) - sum t(t-1)(2t+5)     (exact int64)
      z     = floor((S -/+ 1) / sqrt(var18/18) * 1e6)  (continuity-
              corrected, one pinned IEEE sqrt/divide — the tau doctrine)

    Theil-Sen slope (lower-median pairwise slope, Sen 1968) is the one
    genuinely pairwise quantity. Gate per the hot-key doctrine
    (statescan._route_hot_keys): groups with n <= ``exact_pair_n``
    compute the EXACT lower median over all C(n,2) IEEE-double slopes
    (vectorized numpy, <= ~4.5M pairs / ~110 MB transient at the
    default gate); whale groups fall back to the lower median of
    ``whale_sample_pairs`` deterministically-sampled pairs (RNG seeded
    from the group key, so reruns are bit-stable). The fallback is a
    DOCUMENTED approximation — S/var18/z stay exact for whales; only
    the slope is sampled (median-of-pairwise-slopes concentrates at
    O(1/sqrt(m)) so 2*10^5 pairs pins the micro-floored slope for all
    but adversarial distributions).

    Emits ``*keys, n, m_pairs, s_stat, var18, theil_slope_micro,
    z_micro`` — m_pairs = C(n,2) (the pair population, also under the
    sampled fallback, where it reports the population not the sample).
    Groups with n < 2 are dropped (no pairs), matching the join
    formulation.

    Scale: one shuffle on the keys; per-group cost O(n log n) +
    min(C(n,2), whale_sample_pairs) with O(n) + O(sample) memory.
    Groups are the parallelism — the quantile-group-exact posture.
    """
    import math
    import zlib

    import numpy as np
    import pandas as pd

    keys = list(keys)
    order_cols = list(order_cols)
    base = df.select(*keys, *order_cols, y_col)
    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in base.select(*keys).schema.fields
    )
    out_schema = (
        f"{key_schema}, n bigint, m_pairs bigint, s_stat bigint,"
        " var18 bigint, theil_slope_micro bigint, z_micro bigint"
    )
    out_cols = keys + [
        "n", "m_pairs", "s_stat", "var18", "theil_slope_micro", "z_micro",
    ]

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({c: [] for c in out_cols})
        srt = pdf.sort_values(order_cols, kind="mergesort")
        y = srt[y_col].to_numpy(dtype=np.int64)
        n0 = n * (n - 1) // 2
        inv = count_strict_inversions(y)
        _, cnt = np.unique(y, return_counts=True)
        yties = int((cnt * (cnt - 1) // 2).sum())
        s = n0 - yties - 2 * inv
        tie18 = int(
            sum(int(c) * (int(c) - 1) * (2 * int(c) + 5)
                for c in cnt if c > 1)
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie18
        if var18 == 0:
            z = None
        elif s > 0:
            z = math.floor((s - 1) / math.sqrt(var18 / 18.0) * 1000000)
        elif s < 0:
            z = math.floor((s + 1) / math.sqrt(var18 / 18.0) * 1000000)
        else:
            z = 0
        if n <= exact_pair_n:
            iu, ju = np.triu_indices(n, k=1)
            slopes = (y[ju] - y[iu]).astype(np.float64) / (
                (ju - iu).astype(np.float64)
            )
            k = (n0 + 1) // 2
        else:
            # Whale route: deterministic sampled-pair lower median.
            # min/max of two independent uniform draws is uniform over
            # unordered distinct pairs (conditioned on a != b).
            # str-coerce the key scalars BEFORE hashing: numpy 2.x
            # changed repr(np.int64(7)) from '7' to 'np.int64(7)', so
            # seeding from raw scalar reprs would silently change the
            # sampled pair set across numpy versions / heterogeneous
            # clusters (r9 self-review finding)
            seed = zlib.crc32(
                "|".join(str(pdf[c].iloc[0]) for c in keys).encode()
            )
            rng = np.random.RandomState(seed)
            a = rng.randint(0, n, size=whale_sample_pairs)
            b = rng.randint(0, n, size=whale_sample_pairs)
            mask = a != b
            iu = np.minimum(a[mask], b[mask])
            ju = np.maximum(a[mask], b[mask])
            slopes = (y[ju] - y[iu]).astype(np.float64) / (
                (ju - iu).astype(np.float64)
            )
            k = (len(slopes) + 1) // 2
        kth = float(np.partition(slopes, k - 1)[k - 1])
        sl_micro = math.floor(kth * 1000000)
        row = {c: [pdf[c].iloc[0]] for c in keys}
        row.update(
            n=[n], m_pairs=[n0], s_stat=[s], var18=[var18],
            theil_slope_micro=[sl_micro],
            z_micro=pd.array([z], dtype="Int64"),
        )
        return pd.DataFrame(row)

    # ---- hot/cold routing (the statescan _route_hot_keys doctrine,
    # applied r9 after the bench showed the all-Arrow form ~2x the
    # declarative plan at fixture scale): keys with n <= exact_pair_n
    # keep the ORIGINAL whole-stage-codegen pairwise formulation (its
    # per-key pair volume is bounded by the gate, so the r8 `weak` —
    # an UNGUARDED quadratic — cannot recur), and only whale keys take
    # the Arrow path (exact S/var18/z via inversions + the sampled
    # slope). Both paths produce identical values on their shared
    # domain: the declarative plan is the oracle's own formulation,
    # and the Arrow path is brute-force-property-tested against it.
    cnt = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("__cnt"))
    hot_keys = cnt.where(F.col("__cnt") > exact_pair_n).select(*keys)
    cold = base.join(hot_keys, keys, "left_anti")
    hot = base.join(hot_keys, keys, "left_semi")

    w_rn = Window.partitionBy(*keys).orderBy(*order_cols)
    # r12 (guide §5): v fed four consumers (count, both self-join
    # sides, ties) and the quadratic pair relation fed two (stats agg
    # + median window) — the static plan re-derived the scan + anti-
    # join + rank window 4x and the PAIR SELF-JOIN twice (28 scans /
    # 52 exchanges at sf0.1). Checkpoint v once, and fuse the pair
    # stats into the median's own windowed pass (ONE groupBy: m_pairs
    # == max of the per-key window count, s_stat == sum(sg) over the
    # same rows, the median slope == the single row at rank
    # (m+1) div 2) so pairs is derived exactly once.
    v = cold.select(
        *keys,
        F.col(y_col).alias("y"),
        F.row_number().over(w_rn).alias("rn"),
    ).localCheckpoint(eager=False)
    n_df = v.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    a = v.select(*keys, F.col("y").alias("ya"), F.col("rn").alias("ra"))
    b = v.select(*keys, F.col("y").alias("yb"), F.col("rn").alias("rb"))
    pairs = a.join(b, keys).where(F.col("rb") > F.col("ra")).select(
        *keys,
        F.signum(F.col("yb") - F.col("ya")).cast("long").alias("sg"),
        (
            (F.col("yb") - F.col("ya")).cast("double")
            / (F.col("rb") - F.col("ra")).cast("double")
        ).alias("slope"),
    )
    wm = Window.partitionBy(*keys).orderBy("slope")
    agg_med = (
        pairs.select(
            *keys, "sg", "slope",
            F.row_number().over(wm).alias("r"),
            F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("m"),
        )
        .groupBy(*keys)
        .agg(
            F.max("m").alias("m_pairs"),
            F.sum("sg").alias("s_stat"),
            F.max(
                F.when(
                    F.col("r") == F.expr("(m + 1) div 2"), F.col("slope")
                )
            ).alias("slope"),
        )
    )
    ties = (
        v.groupBy(*keys, "y")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(*keys)
        .agg(
            F.sum(
                F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
            ).alias("tie18")
        )
    )
    j = (
        n_df.where(F.col("n") >= 2)
        .join(agg_med, keys)
        .join(ties, keys)
    )
    var18 = F.expr("n * (n - 1) * (2 * n + 5) - tie18")
    sd = F.sqrt(var18.cast("double") / F.lit(18.0))
    z = (
        F.when(var18 == 0, F.lit(None))
        .when(
            F.col("s_stat") > 0,
            F.floor(
                (F.col("s_stat") - 1).cast("double") / sd * 1_000_000
            ).cast("long"),
        )
        .when(
            F.col("s_stat") < 0,
            F.floor(
                (F.col("s_stat") + 1).cast("double") / sd * 1_000_000
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
    )
    cold_out = j.select(
        *keys, "n", "m_pairs", "s_stat",
        var18.alias("var18"),
        F.floor(F.col("slope") * 1_000_000).cast("long")
        .alias("theil_slope_micro"),
        z.alias("z_micro"),
    )
    hot_out = hot.groupBy(*keys).applyInPandas(one_group, out_schema)
    return cold_out.unionByName(hot_out)
