"""Data-mixing operators for training-corpus assembly: per-source
quotas, weighted sampling rates, and document→shard packing. These are
the knobs a 100 TB pretraining pipeline turns after dedup/quality
filtering (additive to SURVEY.md §2, same tier as operators/dedup.py).

Determinism doctrine (same as sampling in queries/llmdata.py): every
selection decision is a pure function of the row's id through a
portable 31-bit multiplicative hash — never ``rand()`` — so reruns,
retries, and the DuckDB oracle all agree bit-for-bit.

Scale notes:
  - quota_sample is one window over the group key. Hot groups
    concentrate on one reducer ONLY up to the window stage; because the
    hash order is uniform, a two-phase refinement (per-partition
    pre-top-quota, then global) bounds that — provided here as
    ``quota_sample(two_phase=True)``.
  - mix_weighted is a pure per-row filter — no shuffle at all.
  - pack_streaming is a running-sum window per pack group: the packing
    order is an explicit column, so at scale you pack WITHIN date/domain
    partitions (bounded window state), not one global stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

M31 = 2147483647
_A = 2654435761 % M31


def _id_hash(id_col: Column) -> Column:
    """Portable deterministic per-row hash in [0, M31)."""
    return (id_col * F.lit(_A)) % F.lit(M31)


def quota_sample(
    df: DataFrame,
    group_col: str,
    quota: int,
    id_col: str = "doc_id",
    two_phase: bool = False,
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen by deterministic
    hash order (uniform over the group, stable across reruns).

    ``two_phase=True`` first takes the per-partition top-``quota`` by
    hash within each group (map-side, no shuffle), so the window stage
    receives at most quota * num_partitions rows per group instead of
    the whole hot group — the standard bounded-reducer refinement for
    skewed group sizes at scale. Results are identical by construction
    (the global top-quota is contained in every superset of
    per-partition top-quotas).
    """
    h = _id_hash(F.col(id_col))
    if two_phase:
        pre = Window.partitionBy(F.spark_partition_id(), group_col).orderBy(
            h.asc(), F.col(id_col).asc()
        )
        df = (
            df.withColumn("__prn", F.row_number().over(pre))
            .where(F.col("__prn") <= quota)
            .drop("__prn")
        )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def mix_weighted(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group sampling rates (data mixing): keep a deterministic
    ``rates[group]`` fraction of each group's rows. A row is kept when
    its id-hash bucket (0..9999) falls below rate*10000 — a pure per-row
    predicate, so the plan is a filter with NO shuffle and composes with
    any downstream operator."""
    bucket = _id_hash(F.col(id_col)) % F.lit(10000)
    rate = F.lit(default_rate)
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return df.where(bucket < (rate * 10000).cast("long"))


def pack_streaming(
    df: DataFrame,
    size_col: str,
    budget: int,
    order_col: str = "doc_id",
    pack_group: str | None = None,
) -> DataFrame:
    """Assign each document to a training shard (``pack_id``) by running
    token offset in a deterministic order: a document starting at offset
    o goes to shard floor(o / budget). One running-sum window; with
    ``pack_group`` the stream (and the window state) is per group —
    the at-scale form, since a single global ordered window funnels
    through one task per range. Adds ``pack_id`` and ``pack_offset``
    (the document's start offset within its shard)."""
    keys = [pack_group] if pack_group else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(F.col(size_col)).over(w) - F.col(size_col)
    return df.withColumn("pack_id", F.floor(start / F.lit(budget))).withColumn(
        "pack_offset", start - F.col("pack_id") * F.lit(budget)
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    by: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the
    ``n`` rows (per ``by`` group, or globally) with the largest
    Efraimidis–Spirakis keys ``u^(1/w)``, where ``u`` is the row's
    portable hash mapped into (0, 1) — inclusion probability scales
    with weight, yet reruns/retries/oracles agree exactly because
    nothing draws ``rand()``.

    Implemented on the log scale (``ln(u)/w`` — monotone transform, so
    the top-n set is identical) and quantized to nano-units through a
    round BEFORE ranking: libm ``ln`` differs across engines by 1 ulp
    (~1e-15 absolute here) while sampling keys are spaced far wider, so
    after the 1e-9 round both engines rank the SAME integers and ties
    break by id (FIXTURES.md libm rule).

    One window shuffle per group (or one global TakeOrdered when ``by``
    is None at small n). Rows with non-positive weights never qualify.
    Output: input columns + ``es_key_nano`` (the quantized key, exposed
    so downstream audits can reproduce the selection)."""
    u = (_id_hash(F.col(id_col)) + F.lit(1)).cast("double") / F.lit(float(M31 + 1))
    w = F.col(weight_col).cast("double")
    key_nano = F.round(F.log(u) / w * 1e9).cast("long")
    scored = df.where(w > 0).withColumn("es_key_nano", key_nano)
    order = [F.desc("es_key_nano"), F.col(id_col)]
    if by is None:
        return scored.orderBy(*order).limit(n)
    win = Window.partitionBy(by).orderBy(*order)
    return (
        scored.withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample_with_replacement(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    by: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITH replacement: ``k``
    independent draws (per ``by`` group, or globally), each selecting
    one row with probability proportional to its weight — a heavy row
    may win several draws, which is exactly the with-replacement
    semantics (completes the sampling family next to the
    without-replacement :func:`weighted_sample`; VERDICT r5 item 6).

    Draw ``j`` re-hashes each row's portable id-hash through an affine
    map with per-draw constants (``a_j = 48271^(j+1) mod M31``,
    ``b_j = (j+1)·2246822519 mod M31`` — the same seeded-family style
    as minhash signatures), then takes the Efraimidis–Spirakis argmax
    of ``ln(u_j)/w`` over the group. Keys are quantized to nano-units
    before ranking (the libm 1-ulp rule, see :func:`weighted_sample`)
    and ties break toward the smaller id, so reruns and the DuckDB
    oracle agree bit-for-bit.

    Scale shape: one explode (k structs per row, k a small constant)
    feeding a map-side-combinable ``max(struct(key, -id))`` argmax per
    (group, draw) — partial aggregation reduces each partition to
    groups×k rows before the single shuffle; no window sort over the
    exploded stream. Rows with non-positive weights never qualify.

    Output: [by,] draw, ``id_col``, key_nano — one row per draw."""
    if k <= 0:
        raise ValueError("weighted_sample_with_replacement: k must be positive")
    h0 = _id_hash(F.col(id_col))
    w = F.col(weight_col).cast("double")
    entries = []
    for j in range(k):
        a = pow(48271, j + 1, M31)
        b = (2246822519 * (j + 1)) % M31
        hj = (h0 * F.lit(a) + F.lit(b)) % F.lit(M31)
        u = (hj + F.lit(1)).cast("double") / F.lit(float(M31 + 1))
        key = F.round(F.log(u) / w * 1e9).cast("long")
        entries.append(
            F.struct(F.lit(j).alias("draw"), key.alias("key_nano"))
        )
    keys = [by] if by else []
    exploded = df.where(w > 0).select(
        *keys, F.col(id_col), F.explode(F.array(*entries)).alias("d")
    )
    winners = exploded.groupBy(*keys, F.col("d.draw").alias("draw")).agg(
        F.max(
            F.struct(
                F.col("d.key_nano").alias("k"), (-F.col(id_col)).alias("negid")
            )
        ).alias("m")
    )
    return winners.select(
        *keys,
        "draw",
        (-F.col("m.negid")).alias(id_col),
        F.col("m.k").alias("key_nano"),
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-corpus
    sampling scheme): keep group g with rate (n_min/n_g)^(1-alpha), so
    effective sizes follow n^alpha — alpha=1 keeps everything, alpha=0
    equalizes to the smallest group. alpha=0.5 (the common setting) is
    computed as floor(1e6 * sqrt(n_min) / sqrt(n_g)) — sqrt and divide
    are IEEE-correctly-rounded, so the micro-rate (and therefore the
    kept set, via the portable id-hash) is engine-identical.

    Shape: one tiny per-group count, a 1-row min attach (bounded
    crossJoin, same pattern as the corpus-stats attach in text-bm25),
    an equi-join of the rate onto rows by group, and a per-row filter.
    Only alpha=0.5 is wired — other alphas need pow(), whose cross-
    engine determinism is not guaranteed."""
    if alpha != 0.5:
        raise NotImplementedError(
            "temperature_sample is wired for alpha=0.5 (sqrt is IEEE-"
            "correctly-rounded; general pow() is not engine-portable)"
        )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    rates = counts.crossJoin(nmin).select(
        group_col,
        F.floor(
            F.lit(1_000_000) * F.sqrt(F.col("__nmin")) / F.sqrt(F.col("__n"))
        ).alias("__rate_micro"),
    )
    bucket = _id_hash(F.col(id_col)) % F.lit(1_000_000)
    return (
        df.join(rates, group_col)
        .where(bucket < F.col("__rate_micro"))
        .drop("__rate_micro")
    )


def balance_classes(
    df: DataFrame,
    class_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact class balancing: downsample every class to the SMALLEST
    class's size, picking each class's deterministic-hash-first rows
    (stable across runs and engines). The quota is discovered from the
    data — a 1-row min attach — then applied as a per-class window
    rank; same skew caveat as quota_sample (a giant class sorts its
    rows in one task's window — acceptable for class-cardinality-bound
    inputs; salt the rank for pathological cases)."""
    counts = df.groupBy(class_col).agg(F.count(F.lit(1)).alias("__n"))
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    w = Window.partitionBy(class_col).orderBy(
        _id_hash(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .crossJoin(nmin)
        .where(F.col("__rn") <= F.col("__nmin"))
        .drop("__rn", "__nmin")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic global training-order shuffle — the per-epoch
    corpus permutation a training job needs (each epoch visits every
    document once, in a different pseudo-random order, reproducible
    from (id, epoch) alone — no RNG state, so a preempted job resumes
    to the identical order).

    Order key = the portable affine hash of (id, epoch); documents are
    sharded by ``h mod n_shards`` (the shard is the loader's file/unit
    of parallel read) and positioned WITHIN their shard by a
    shard-partitioned rank on (h, id) — no global sort, no
    single-reducer window: the only shuffle is the shard partitioning,
    and n_shards is the parallelism (set it to the target file count
    at 100 TB; cross-shard interleave is the loader's round-robin).

    Ids must be non-negative (the %'s sign convention must agree with
    the SQL twin); ``epoch`` shifts the hash so each epoch is a fresh
    permutation. Output: ``id_col, epoch, h, shard, pos`` (pos is
    1-based within the shard)."""
    if n_shards < 1:
        raise ValueError(f"epoch_shuffle: n_shards {n_shards} < 1")
    # reduce the id mod M31 BEFORE the multiply: (M31-1)*mult ~ 1.1e18
    # stays inside int64, so no engine needs 128-bit arithmetic and
    # ids up to int64 max are safe (a raw id*A would wrap past ~1.8e10).
    # The epoch enters MULTIPLICATIVELY (mult = A^(epoch+1) mod M31):
    # an additive epoch term only shifts every h by the same constant,
    # which preserves the relative order except at the single mod wrap
    # and merely relabels shards — i.e. every epoch would replay the
    # same data order (r9 self-review finding, verified numerically:
    # 6 of 8 shards bit-identical across epochs under the additive
    # form). Distinct multiplicative orbits give genuinely different
    # permutations per epoch.
    mult = pow(_A, int(epoch) + 1, M31)
    h = (
        (F.col(id_col) % F.lit(M31)) * F.lit(mult)
        + F.lit((int(epoch) + 1) * 1000003)
    ) % F.lit(M31)
    base = df.select(
        F.col(id_col),
        F.lit(int(epoch)).cast("long").alias("epoch"),
        h.cast("long").alias("h"),
        (h % F.lit(int(n_shards))).cast("long").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return base.withColumn(
        "pos", F.row_number().over(w).cast("long")
    )


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
    top_n: int = 100,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023): score every RAW document by how target-like it is under
    hashed n-gram unigram models and keep the highest-weight docs —
    the published recipe for slicing a web crawl toward a quality
    target domain.

    Features are the repo's portable 31-bit word hash folded into
    ``n_buckets`` (the text-hash-features trick — no vocabulary, no
    broadcast). Two bucket distributions are estimated with add-one
    smoothing: p_t from the TARGET slice (``is_target``), p_r from the
    rest. The per-bucket log ratio ln((ct+1)/(T+B)) - ln((cr+1)/(R+B))
    is quantized nano->micro from EXACT integer counts (the
    unigram-logprob ulp-kill rule — one libm ln per side, rounded
    before anything accumulates), and a raw doc's importance weight is
    the exact int64 sum of its tokens' quantized ratios. Selection =
    top ``top_n`` raw docs by (weight desc, id asc) — rank-based, so
    no exp/resampling randomness is needed for a deterministic,
    engine-exact result (the CCNet-bucketing argument: monotone
    transforms don't change a cut).

    Shape at scale: two combinable bucket-count aggs (B rows each,
    broadcast back), one token->bucket join-free map, one per-doc sum,
    one TopK. Output: ``id_col, n_toks, weight_micro, sel_rank``."""
    from pyspark.sql import Window

    from .dedup import _word_hash

    toks = docs.select(
        F.col(id_col).alias("__id"),
        is_target.alias("__t"),
        F.explode(
            F.filter(
                F.split(F.col(text_col), r"\s+"),
                lambda w: w != "",
            )
        ).alias("w"),
    ).select(
        "__id", "__t", (_word_hash(F.col("w")) % n_buckets).alias("b")
    )
    bc = toks.groupBy("b").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("__t"), 0).otherwise(1)).alias("cr"),
    )
    tot = bc.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    lr_micro = F.floor(
        (
            F.round(
                F.log((F.col("ct") + 1).cast("double")
                      / (F.col("tt") + n_buckets).cast("double")) * 1e9
            )
            - F.round(
                F.log((F.col("cr") + 1).cast("double")
                      / (F.col("tr") + n_buckets).cast("double")) * 1e9
            )
        ) / 1000
    ).cast("long")
    ratios = bc.crossJoin(F.broadcast(tot)).select(
        "b", lr_micro.alias("lr")
    )
    scored = (
        toks.where(~F.col("__t"))
        .join(F.broadcast(ratios), "b")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("lr").alias("weight_micro"),
        )
    )
    topd = scored.orderBy(
        F.col("weight_micro").desc(), F.col("__id").asc()
    ).limit(top_n)
    wr = Window.orderBy(F.col("weight_micro").desc(), F.col("__id").asc())
    return topd.select(
        F.col("__id").alias(id_col), "n_toks", "weight_micro",
        F.row_number().over(wr).cast("long").alias("sel_rank"),
    )
