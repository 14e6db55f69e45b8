"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k with the small query side broadcast —
the fact (corpus) side is scanned once, never shuffled, and the per-pair
cosine is a JVM higher-order expression (zip_with + aggregate), no
Python. Scale paths: IVF (centroid-bucketed probe) and random-hyperplane
LSH bucketing, both of which shrink the candidate set before any pairwise
math; at 100 TB only the bucketed variants are sane and both are plain
equi-joins on a bucket key.

Determinism note: the cosine is computed as a strict left fold
(((0+x1·y1)+x2·y2)+...) so an ANSI-SQL oracle using the same fold
(DuckDB list_reduce) reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Strict left-fold dot product — see module docstring."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def cosine_prenormed(a: Column, b: Column, sq_a: Column, sq_b: Column) -> Column:
    """Cosine with the self-dots precomputed per ROW (before any join) —
    per pair only one fold remains. Bit-identical to :func:`cosine`: the
    self-dot doubles are the same values, and the ``sqrt(sq_a * sq_b)``
    op sequence is unchanged (NOT ``sqrt(a)*sqrt(b)``, which rounds
    differently), so oracle parity is preserved."""
    return dot(a, b) / F.sqrt(sq_a * sq_b)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast; the
    corpus is scanned once; ranking is a per-query window (deterministic
    tie-break on neighbor id). Output: query_id, neighbor_id, rank, cos."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).select("*", dot(F.col("qv"), F.col("qv")).alias("qq"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).select("*", dot(F.col("cv"), F.col("cv")).alias("cc"))
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_prenormed(
            F.col("qv"), F.col("cv"), F.col("qq"), F.col("cc")
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def kmeans_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical-k-means (cosine) centroid training, Lloyd iterations.

    Seeds are the first ``num_centroids`` vectors by id (deterministic);
    each iteration assigns every vector to its nearest centroid (centroid
    set broadcast — the corpus never moves) and recomputes each centroid
    as the elementwise mean of its members via posexplode → (cell, dim)
    partial-aggregated sums: two keyed shuffles per iteration, nothing
    quadratic, nothing collected but the k×dim centroid matrix itself
    (the standard Spark k-means shape — per-iteration lineage is cut by
    materializing only that tiny matrix on the driver). Empty cells keep
    their previous centroid. Output: (cent_id, cent_v).

    Float-sum ordering makes the means bit-nondeterministic across
    re-runs, so IVF queries built on trained centroids register as
    rows-only checks (the first-N-seed variant stays the oracle-matched
    one)."""
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    )
    cents: list[list[float]] = [
        list(r["v"]) for r in c.orderBy("id").limit(num_centroids).collect()
    ]
    if not cents:
        raise ValueError("kmeans_centroids: corpus is empty")
    # corpus may hold fewer rows than requested centroids — clamp so the
    # empty-cell fallback (cents[i]) below never indexes past the seeds
    num_centroids = min(num_centroids, len(cents))
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(i, v) for i, v in enumerate(cents)], "cent_id long, cent_v array<double>"
        )
        scored = c.join(F.broadcast(cdf), how="cross")
        w = Window.partitionBy("id").orderBy(
            F.desc(cosine(F.col("v"), F.col("cent_v"))), F.col("cent_id")
        )
        assigned = (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("id", "v", F.col("cent_id").alias("cell"))
        )
        sums = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", (F.col("s") / F.col("n")).alias("m")))
                ).alias("dims")
            )
            .select("cell", F.transform("dims", lambda d: d["m"]).alias("mean_v"))
        )
        by_cell = {r["cell"]: list(r["mean_v"]) for r in sums.collect()}
        cents = [by_cell.get(i, cents[i]) for i in range(num_centroids)]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(cents)], "cent_id long, cent_v array<double>"
    )


def kmeans_centroids_exact(
    corpus: DataFrame,
    num_centroids: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Spherical k-means with ENGINE-REPLAYABLE arithmetic (the r9
    dedup-semantic certification recipe applied to iterated Lloyd
    training — closes the ann-ivf-kmeans rows-only gap).

    The float-mean centroid of :func:`kmeans_centroids` is
    bit-nondeterministic because double summation is order-dependent.
    Two facts remove the nondeterminism without giving up iteration:

      1. cosine is invariant to positive scaling of either argument,
         so for ASSIGNMENT the centroid can be the member SUM vector
         instead of the mean — spherical k-means only ever uses the
         centroid's direction;
      2. keeping vectors as integers (one ``round(x*scale)``
         quantization at ingest) makes those sums EXACT and
         order-independent — the one float reduction becomes an int64
         reduction.

    Each iteration assigns every vector to the argmax strict-left-fold
    cosine over the double-cast integer centroids ((cos desc, cent_id)
    tiebreak — identical in DuckDB), then recomputes each centroid as
    the exact elementwise int64 SUM of its members (posexplode →
    (cell, dim) combinable aggregation). Empty cells keep their
    previous sum vector. Seeds are the first ``num_centroids``
    quantized vectors by id. Only the k x dim centroid matrix is ever
    collected (bounded by construction — the kmeans_centroids
    precedent, cuts per-iteration lineage).

    Exactness bound: double-cast int64 is exact below 2^53 —
    components |x| <= ~10 quantized at 1e6 support cells of ~1e8
    members; at larger corpora drop ``scale`` (1e3 supports ~1e11).

    Output: (cent_id, cent_v array<double>) — the trained sum-vector
    directions, drop-in for :func:`ivf_topk`'s ``centroids``."""
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(
            as_double(F.col(vec_col)),
            lambda x: F.round(x * scale).cast("long"),
        ).alias("vq"),
    ).select(
        "id", "vq",
        F.transform("vq", lambda x: x.cast("double")).alias("v"),
    )
    cents: list[list[int]] = [
        [int(x) for x in r["vq"]]
        for r in c.orderBy("id").limit(num_centroids).collect()
    ]
    if not cents:
        raise ValueError("kmeans_centroids_exact: corpus is empty")
    num_centroids = min(num_centroids, len(cents))
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(cents)],
            "cent_id long, cent_v array<double>",
        )
        scored = c.join(F.broadcast(cdf), how="cross")
        w = Window.partitionBy("id").orderBy(
            F.desc(cosine(F.col("v"), F.col("cent_v"))), F.col("cent_id")
        )
        assigned = (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("id", "vq", F.col("cent_id").alias("cell"))
        )
        sums = (
            assigned.select("cell", F.posexplode("vq").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "s"))
                ).alias("dims")
            )
            .select("cell", F.transform("dims", lambda d: d["s"]).alias("sum_v"))
        )
        by_cell = {r["cell"]: [int(x) for x in r["sum_v"]] for r in sums.collect()}
        cents = [by_cell.get(i, cents[i]) for i in range(num_centroids)]
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(cents)],
        "cent_id long, cent_v array<double>",
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    num_centroids: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: centroids are the first
    ``num_centroids`` corpus vectors (deterministic) or a trained set
    passed via ``centroids`` (cent_id, cent_v — see
    :func:`kmeans_centroids`); every vector is assigned to its nearest
    centroid; a query probes only its own cell.

    At scale: the centroid set is tiny and broadcast twice (assignment +
    probe); the corpus is partitioned by cell id — a plain equi-join.
    Approximate by construction → no SQL oracle; recall is tested against
    brute_force_topk in tests/."""
    cents = centroids if centroids is not None else corpus.orderBy(id_col).limit(
        num_centroids
    ).select(
        F.col(id_col).alias("cent_id"), as_double(F.col(vec_col)).alias("cent_v")
    )
    cents = cents.select(
        "*", dot(F.col("cent_v"), F.col("cent_v")).alias("cent_sq")
    )

    def assign(df: DataFrame, idc: str, vout: str) -> DataFrame:
        sq = f"{vout}_sq"
        base = df.select(
            F.col(id_col).alias(idc), as_double(F.col(vec_col)).alias(vout)
        ).select("*", dot(F.col(vout), F.col(vout)).alias(sq))
        scored = base.join(F.broadcast(cents), how="cross")
        w = Window.partitionBy(idc).orderBy(
            F.desc(
                cosine_prenormed(
                    F.col(vout), F.col("cent_v"), F.col(sq), F.col("cent_sq")
                )
            ),
            F.col("cent_id"),
        )
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(idc, vout, sq, F.col("cent_id").alias("cell"))
        )

    c_assigned = assign(corpus, "neighbor_id", "cv").alias("c")
    q_assigned = assign(queries, "query_id", "qv").alias("q")
    pairs = c_assigned.join(
        F.broadcast(q_assigned),
        (F.col("c.cell") == F.col("q.cell"))
        & (F.col("c.neighbor_id") != F.col("q.query_id")),
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_prenormed(
            F.col("qv"), F.col("cv"), F.col("qv_sq"), F.col("cv_sq")
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= τ).
    Brute-force form — the oracle-checkable semantics; the LSH-bucketed
    variant below is the scale path."""
    pre = df.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).select("*", dot(F.col("v"), F.col("v")).alias("sq"))
    # prenormed table feeds both sides of the self-join — persist once
    # instead of running the self-dot fold twice over the corpus
    pre = pre.localCheckpoint(eager=False)
    a = pre.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("sq").alias("sa")
    )
    b = pre.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("sq").alias("sb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        cosine_prenormed(F.col("va"), F.col("vb"), F.col("sa"), F.col("sb")).alias("cos"),
    ).where(F.col("cos") >= threshold)


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    num_planes: int = 12,
    num_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucketing: vectors agreeing on all
    ``num_planes`` signs in any of ``num_tables`` tables become candidate
    pairs; exact cosine filters them. Planes are deterministic
    (hash-derived pseudo-random components), so the operator is
    reproducible run-to-run. Candidate join is an equi-join on
    (table, signature) — no cross join anywhere."""

    def plane_component(t: int, p: int, d: int) -> float:
        # deterministic pseudo-random in [-0.5, 0.5)
        h = (t * 1_000_003 + p * 10_007 + d * 97 + 12345) * 2654435761 % (2**32)
        return (h % 1000) / 1000.0 - 0.5

    v = as_double(F.col(vec_col))
    sigs = []
    for t in range(num_tables):
        bits = F.lit(0).cast("long")
        for p in range(num_planes):
            plane = F.array(
                *[F.lit(plane_component(t, p, d)) for d in range(dim)]
            )
            bit = F.when(dot(v, plane) >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            bits = bits * 2 + bit
        sigs.append(F.struct(F.lit(t).alias("table"), bits.alias("sig")))
    tagged = df.select(
        F.col(id_col).alias("id"), v.alias("v"), F.explode(F.array(*sigs)).alias("ts")
    ).select(
        "id",
        "v",
        dot(F.col("v"), F.col("v")).alias("sq"),
        F.col("ts.table").alias("table"),
        F.col("ts.sig").alias("sig"),
    )
    # signature table feeds both sides of the bucket self-join — persist
    # once instead of evaluating num_tables*num_planes plane dots twice
    tagged = tagged.localCheckpoint(eager=False)

    a, b = tagged.alias("a"), tagged.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
            F.col("a.sq").alias("sa"),
            F.col("b.sq").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        cosine_prenormed(F.col("va"), F.col("vb"), F.col("sa"), F.col("sb")).alias("cos"),
    ).where(F.col("cos") >= threshold)


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/bandwidth
    reduction step before ANN indexing at corpus scale (4 bytes/dim ->
    1). scale = max|v| / 127; q_i = floor(v_i/scale + 0.5) (explicit
    half-up rounding — portable, unlike engine-dependent round());
    all-zero vectors quantize to zeros with scale 0. Adds ``scale``,
    ``q`` (array<int>) and ``err_max`` (max absolute reconstruction
    error, floor-truncated at 6 decimals). Pure per-row expressions —
    no shuffle, no Python; every value is reproducible in ANSI SQL."""
    from genpipe_spark.operators.hof import bind

    v0 = as_double(F.col(vec_col))

    def with_v(v: Column) -> Column:
        scale0 = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)

        def with_scale(scale: Column) -> Column:
            q = F.transform(
                v,
                lambda x: F.when(scale == 0, F.lit(0))
                .otherwise(F.floor(x / scale + F.lit(0.5)))
                .cast("int"),
            )

            def with_q(qv: Column) -> Column:
                err = F.array_max(
                    F.zip_with(qv, v, lambda qi, vi: F.abs(qi * scale - vi))
                )
                return F.struct(
                    scale.alias("scale"),
                    qv.alias("q"),
                    (F.floor(err * F.lit(1e6)) / F.lit(1e6)).alias("err_max"),
                )

            return bind(q, with_q)

        return bind(scale0, with_scale)

    return df.withColumn("__qz", bind(v0, with_v)).select(
        F.col(id_col),
        F.col("__qz.scale").alias("scale"),
        F.col("__qz.q").alias("q"),
        F.col("__qz.err_max").alias("err_max"),
    )


def _q10k(vec: Column) -> Column:
    """Half-up quantization of a float vector to 1e-4 int64 units — the
    shared exactness gate for the PQ/IVF-PQ family: once components are
    integers, every distance, argmin, and tie-break is engine-exact."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * 10000 + 0.5).cast("long")
    )


def _l2sq(a: Column, b: Column) -> Column:
    """Exact int64 squared-L2 between two quantized vectors (strict left
    fold; components <= ~1e4 so 64 squared diffs stay < 2^35)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 8,
    m_sub: int = 4,
    sub_dim: int = 16,
    nprobe: int = 3,
    k: int = 5,
    refine_r: int = 64,
) -> DataFrame:
    """IVF-PQ approximate nearest-neighbour search — the composed scale
    path (inverted-file cells for candidate pruning + product-quantized
    codes for O(M) asymmetric distances) that makes billion-vector ANN
    tractable where even per-cell exact cosine is too hot. Both
    codebooks are the deterministic first-``num_cells`` seed vectors
    (the oracle-matched twin of trained codebooks — swap in
    kmeans_centroids exactly like ivf_topk does), and ALL arithmetic is
    int64 over 1e-4-quantized components, so cell assignment, PQ codes,
    ADC distances, and the (dist, id) top-k tie-break are
    engine-identical.

    Plan shape at scale, per stage (N = corpus size, Q = |queries|):
      - cell assignment: N × num_cells broadcast join + min-struct
        groupBy — linear, map-side combinable;
      - PQ encoding: N × m_sub explode, 32-row broadcast codebook,
        min-struct groupBy — linear;
      - probe: Q × num_cells (driver-tiny) → nprobe cells/query;
      - candidates: equi-join on cell id (AQE skew-splits hot cells);
      - ADC: candidates × m_sub rows joined to the BROADCAST
        Q·m_sub·num_cells lookup table, summed by (query, vector) —
        the corpus-side vectors themselves never re-travel; only codes
        do (m_sub bytes-equivalent per vector, the entire point of PQ);
      - refine: only the ADC top-``refine_r`` per query (Q·R rows)
        joins back to the full vectors for an EXACT int64 re-rank —
        the FAISS IVFPQ+refine posture; R bounds exactly how much
        full-width vector data moves per query.
    No stage is quadratic in N; nothing non-broadcast is collected."""
    q = emb.select(F.col(id_col).alias("vid"), _q10k(F.col(vec_col)).alias("q"))
    cents = q.where(F.col("vid") < num_cells).select(
        F.col("vid").alias("cid"), F.col("q").alias("cq")
    )
    # coarse cells: argmin exact L2² with (d, cid) tie-break
    cellmap = (
        q.join(F.broadcast(cents))
        .select("vid", _l2sq(F.col("q"), F.col("cq")).alias("d"), "cid")
        .groupBy("vid")
        .agg(F.min(F.struct("d", "cid")).alias("w"))
        .select("vid", F.col("w.cid").alias("cell"))
    )
    # PQ encode: subspace explode + 32-row broadcast codebook
    sub = q.select(
        "vid",
        F.explode(F.array(*[F.lit(m) for m in range(m_sub)])).alias("m"),
        F.col("q"),
    ).select(
        "vid", "m", F.expr(f"slice(q, m * {sub_dim} + 1, {sub_dim})").alias("sq")
    )
    pqc = sub.where(F.col("vid") < num_cells).select(
        F.col("m"), F.col("vid").alias("pcid"), F.col("sq").alias("pc")
    )
    codes = (
        sub.join(F.broadcast(pqc), "m")
        .select("vid", "m", _l2sq(F.col("sq"), F.col("pc")).alias("d"), "pcid")
        .groupBy("vid", "m")
        .agg(F.min(F.struct("d", "pcid")).alias("w"))
        .select("vid", "m", F.col("w.pcid").alias("code"))
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), _q10k(F.col(vec_col)).alias("qq")
    )
    probe = (
        qs.join(F.broadcast(cents))
        .select("query_id", _l2sq(F.col("qq"), F.col("cq")).alias("d"), "cid")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d", "cid")
            ),
        )
        .where(F.col("rn") <= nprobe)
        .select("query_id", F.col("cid").alias("cell"))
    )
    # per-query ADC lookup table: Q × m_sub × num_cells rows, broadcast
    qd = (
        qs.select(
            "query_id",
            F.explode(F.array(*[F.lit(m) for m in range(m_sub)])).alias("m"),
            F.col("qq"),
        )
        .select(
            "query_id", "m",
            F.expr(f"slice(qq, m * {sub_dim} + 1, {sub_dim})").alias("qsub"),
        )
        .join(F.broadcast(pqc), "m")
        .select(
            "query_id", "m", F.col("pcid").alias("code"),
            _l2sq(F.col("qsub"), F.col("pc")).alias("d"),
        )
    )
    cand = cellmap.join(F.broadcast(probe), "cell").where(
        F.col("vid") != F.col("query_id")
    )
    adist = (
        cand.join(codes, "vid")
        .join(F.broadcast(qd), ["query_id", "m", "code"])
        .groupBy("query_id", "vid")
        .agg(F.sum("d").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy("adist", "vid")
    shortlist = (
        adist.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= refine_r)
        .select("query_id", "vid")
    )
    exact = (
        shortlist.join(q, "vid")
        .join(F.broadcast(qs), "query_id")
        .select("query_id", "vid", _l2sq(F.col("q"), F.col("qq")).alias("dist"))
    )
    wf = Window.partitionBy("query_id").orderBy("dist", "vid")
    return (
        exact.withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vid").alias("neighbor_id"), "rank", "dist")
    )


def center_l2_normalize(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Corpus mean-centering + L2 normalization — the standard
    embedding preprocessing before cosine retrieval / clustering /
    whitening — with EXACT cross-engine determinism: a naive float
    mean depends on accumulation order, so instead

      1. each component quantizes to int64 micros with portable
         half-up (floor(x*1e6 + 0.5) — the quantize_int8 rule);
      2. per-DIMENSION exact integer sums via one combinable agg of d
         sum expressions (dimensionality-sized driver row, attached
         back as a literal array — join-free);
      3. the centered component is kept as the exact integer
         c = m*n - sum_m  (= n * (m - mean), scaled by n to avoid
         division) — the n factor CANCELS under L2 normalization, so
         no float mean ever exists;
      4. one strict left fold per vector for the norm, then each
         component maps to floor(1e6 * c / norm + 0.5) micros
         (0 if the norm is 0, i.e. the vector equals the mean).

    NULL vectors drop; all vectors must share one dimensionality
    (LOUDLY enforced — a ragged corpus raises before any output row
    exists). Empty-array vectors drop like the r11 form's (posexplode
    emitted no rows for them), so the output id set is unchanged.

    Scale (r12, guide §§2.3-2.4 — the round-11 form posexploded every
    vector into n*d rows, shuffled them through a (pos)-agg AND a
    (vec_id)-regroup collect_list): the per-dimension exact sums are
    now ONE map-side-combinable aggregation with d sum expressions
    (dim-bounded state per task, a dim-sized driver row — the kmeans-
    centroid precedent), broadcast back as a LITERAL array; centering
    and normalization become a single NARROW projection over the
    original array rows. ZERO data-sized exchanges — the corpus is
    scanned twice (sum pass + projection pass) and never shuffled,
    which is also the 100 TB shape: the old regroup moved every byte
    of every vector through one hash exchange."""
    e = emb.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) >= 1)
    ).select(
        F.col(id_col).alias("vec_id"),
        as_double(F.col(vec_col)).alias("v"),
    )
    m_arr = F.transform(
        F.col("v"),
        lambda x: F.floor(x * 1_000_000.0 + 0.5).cast("long"),
    )
    gate = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size("v")).alias("dmin"),
        F.max(F.size("v")).alias("dmax"),
    ).first()
    n = int(gate["n"])
    if n == 0:
        # no non-empty vectors: the r11 posexplode form produced an
        # empty frame; keep the schema
        return e.select(
            "vec_id",
            F.array().cast("array<long>").alias("unit_micro"),
        )
    if gate["dmin"] != gate["dmax"]:
        raise ValueError(
            "center_l2_normalize: ragged dimensionality at pos "
            f"{int(gate['dmin'])} (vector lengths span "
            f"{int(gate['dmin'])}..{int(gate['dmax'])})"
        )
    dim = int(gate["dmin"])
    sums = e.select(m_arr.alias("m")).agg(
        *[
            F.sum(F.element_at("m", i + 1)).alias(f"s{i}")
            for i in range(dim)
        ]
    ).first()
    sm_lit = F.array(
        *[F.lit(int(sums[f"s{i}"])).cast("long") for i in range(dim)]
    )
    # centered exact integer c = m*n - sum_m, per component — a pure
    # projection; the fold order over cv is ascending pos, identical
    # to the r11 array_sort(collect_list) order, so the norm double
    # and the floor(1e6*c/norm + 0.5) micros are bit-identical
    cv = F.transform(
        m_arr,
        lambda x, i: x * F.lit(n).cast("long") - F.element_at(sm_lit, i + 1),
    )
    withcv = e.select("vec_id", cv.alias("cv"))
    norm = F.sqrt(
        F.aggregate(
            F.col("cv"),
            F.lit(0.0),
            lambda acc, y: acc + y.cast("double") * y.cast("double"),
        )
    )
    return withcv.select(
        "vec_id",
        F.transform(
            F.col("cv"),
            lambda y: F.when(norm == 0, F.lit(0).cast("long")).otherwise(
                F.floor(
                    F.lit(1_000_000.0) * y.cast("double") / norm + 0.5
                ).cast("long")
            ),
        ).alias("unit_micro"),
    )


def power_iteration_top_dir(
    flat: DataFrame,
    iters: int = 3,
    keep_bits: int = 21,
) -> DataFrame:
    """Dominant principal direction of an (uncentered) embedding
    corpus by power iteration on the Gram operator — in PURE int64,
    no float, no libm, so the result is bit-identical to an unrolled
    SQL replay.

    ``flat`` carries one row per (vector, dimension):
    ``vec_id (long), j (long, 0-based), xq (long)`` — integer-quantized
    components (callers clamp to a small range; see the query for the
    floor(x*16) in [-8, 7] contract).

    Each iteration is the matrix-free step w = X^T (X v):
      1. dot_i = sum_j xq_ij * v_j   — one grouped agg per vector
         (v attached as a d-element LITERAL array, join-free);
      2. w_j  = sum_i xq_ij * dot_i — one keyed join on vec_id + one
         grouped agg (both map-side combinable).
    Instead of float normalization, the vector is rescaled by a
    power-of-two FLOOR SHIFT keeping ``keep_bits`` significant bits:
    shift = max(0, bit_length(max_j |w_j|) - keep_bits), v = w >> shift
    (pmod-adjusted floor division — exact for negatives in any
    engine). Scaling never changes the eigendirection, so convergence
    is the textbook power method's; bit_length rides length(bin(m)) —
    identical in Spark and DuckDB.

    The per-iteration driver step collects exactly d (j, w_j) rows,
    d = the embedding dimensionality discovered from the data (the
    kmeans-centroid precedent: bounded by dimensionality, never by
    the corpus). int64 headroom at component bound B and dimension d:
    |w_j| <= B * d*B*2^keep_bits * N — at the defaults (B=8, d=64)
    safe to N ~ 2e6 vectors; larger corpora or dimensions lower
    keep_bits (the agg-grouped-corr doctrine: document the regime,
    split when exceeded).

    Returns d rows ``j, w (long), shift (long), v (long)`` for the
    FINAL iteration — w the unscaled Gram image, v the rescaled
    direction.
    """
    if iters < 1:
        raise ValueError(f"power_iteration_top_dir: iters {iters} < 1")
    # every iteration reads flat twice (dot pass + Gram pass) and the
    # dim discovery once more — persist the exploded corpus so the
    # 2*iters + 1 consumers share ONE materialization instead of
    # re-running the explode per pass (review r7s5)
    flat = flat.persist()
    dims = [r["j"] for r in flat.select("j").distinct().collect()]
    if sorted(dims) != list(range(len(dims))):
        flat.unpersist()
        raise ValueError(
            "power_iteration_top_dir: dimension indexes must be exactly "
            f"0..d-1 (element_at contract); got {sorted(dims)[:8]}..."
        )
    v = {j: 1 for j in dims}
    last = None
    for _ in range(iters):
        v_arr = F.array(*[F.lit(v[j]) for j in sorted(v)])
        dots = (
            flat.withColumn("__vj", F.element_at(v_arr, F.col("j").cast("int") + 1))
            .groupBy("vec_id")
            .agg(F.sum(F.col("xq") * F.col("__vj")).alias("__dot"))
        )
        w_df = (
            flat.join(dots, "vec_id")
            .groupBy("j")
            .agg(F.sum(F.col("xq") * F.col("__dot")).alias("w"))
        )
        w = {r["j"]: r["w"] for r in w_df.collect()}  # d rows, bounded
        m = max(abs(x) for x in w.values())
        shift = max(0, int(m).bit_length() - keep_bits) if m else 0
        den = 1 << shift
        v = {j: (w[j] - ((w[j] % den) + den) % den) // den for j in w}
        last = (w, shift)
    flat.unpersist()
    w, shift = last
    spark = flat.sparkSession
    return spark.createDataFrame(
        [(j, w[j], shift, v[j]) for j in sorted(w)],
        "j long, w long, shift long, v long",
    )


def semdedup(
    df: DataFrame,
    k_clusters: int | None = None,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster: int = 256,
    levels: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) — semantic deduplication by
    embedding: cluster the corpus, then within each cluster drop every
    vector that has a more-senior (smaller-id) neighbor with cosine >=
    ``threshold``. The pairwise work is confined to clusters — the
    whole point of the method: cross-cluster pairs are never
    materialized, and with the default ADAPTIVE K = max(8,
    ceil(n / target_cluster)) the expected cluster size is constant,
    so the pair stage is LINEAR in the corpus.

    Assignment is a SEED TREE (the IVF shape, r9-late: flat
    nearest-of-K scoring is n*K = n^2/target cosines — measured 886 s
    at the 100x fixture). TWO-LEVEL default: K1 = max(2,
    ceil(sqrt(K))) COARSE seeds (ids < K1) partition the K FINE seeds
    (ids < K); a row probes the K1 coarse seeds, then scores only the
    fine seeds of its coarse group — n * (sqrt(K) + K/sqrt(K)) ~
    2n*sqrt(K) cosines, with the per-group fine scoring an EQUI join.
    THREE-LEVEL (r10, auto when K > 2048 — the measured crossover;
    ~0.5M docs at the default target — or ``levels=3``): a
    cbrt(K)-seed TOP tier above
    a K^(2/3) MID tier, cutting per-row probes to ~3*cbrt(K). Seed
    sets are NESTED prefixes (ids < K0 ⊂ ids < K1 ⊂ ids < K), so
    every group at every tier contains its own seed (cos(s, s) = 1
    wins with the smallest-id tie) and assignment stays total by the
    same argument. Iterated-kmeans clustering lives in the
    ann-ivf-kmeans sibling (certified r10).

    Determinism contract: seeds are PINNED id-threshold sets — no
    iteration — so the two-level assignment (argmax fold-cosine,
    smallest-seed ties at both levels) and the keep/drop verdicts are
    pure functions of the data an ANSI twin replays exactly.

    Emits one row per vector: ``id, cluster, is_dup (0/1),
    dup_of`` (the smallest qualifying senior neighbor, -1 when kept).
    """
    import math

    pre = df.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).select("*", dot(F.col("v"), F.col("v")).alias("sq"))
    pre = pre.localCheckpoint(eager=False)

    if k_clusters is None:
        # one count — a 1-value driver read (the global_row_number
        # offset precedent); the K/K1 rule is replayed in the twin
        n = pre.count()
        k_clusters = max(8, -(-n // target_cluster))
    k1 = max(2, math.ceil(math.sqrt(k_clusters)))
    if levels is None:
        # measured crossover (sf10 embeddings, fresh JVM per config):
        # K=2048 two-level 45.7 s vs three-level 21.0 s; K=32768
        # 307.5 s vs 41.6 s — three-level is ~flat in K, two-level
        # grows as sqrt(K); below ~2k seeds the extra tier's joins
        # aren't paid back
        levels = 3 if k_clusters > 2048 else 2
    if levels not in (2, 3):
        raise ValueError(f"semdedup: levels {levels} not in (2, 3)")

    def nearest(rows, rid, seeds, sid, out, carry=()):
        """argmax cosine over ``seeds`` per ``rows`` row (smallest-seed
        ties); returns (rid, out) pairs. ``carry`` re-emits row-side
        columns via first() — every group row replicates the SAME
        value (it is the row's own payload repeated per seed), so
        first() is order-insensitive here and saves the join-back the
        r11 form paid to re-attach vectors (r12, guide §2.4: the
        join-back was a full exchange+sort of both sides per tier)."""
        packed = F.min(
            F.struct(
                (
                    -cosine_prenormed(
                        F.col("__rv"), F.col("__sv"),
                        F.col("__rq"), F.col("__sq2"),
                    )
                ).alias("negcos"),
                F.col(sid).alias("sid"),
            )
        ).alias("m")
        aggs = [packed] + [
            F.first(F.col(src)).alias(dst) for src, dst in carry
        ]
        return (
            rows.join(seeds)
            .groupBy(rid)
            .agg(*aggs)
            .select(
                rid, F.col("m.sid").alias(out),
                *[dst for _, dst in carry],
            )
        )

    def confined(rows, rid, gcol, seeds, sid, out, carry=()):
        """argmax cosine over the seeds sharing the rows' ``gcol``
        group — the tree's group-confined probe (an EQUI join, so the
        per-row candidate set is the group's seed list, not all K).
        ``carry`` as in nearest()."""
        packed = F.min(
            F.struct(
                (
                    -cosine_prenormed(
                        F.col("__rv"), F.col("__sv"),
                        F.col("__rq"), F.col("__sq2"),
                    )
                ).alias("negcos"),
                F.col(sid).alias("sid"),
            )
        ).alias("m")
        aggs = [packed] + [
            F.first(F.col(src)).alias(dst) for src, dst in carry
        ]
        return (
            rows.join(seeds, gcol)
            .groupBy(rid)
            .agg(*aggs)
            .select(
                rid, F.col("m.sid").alias(out),
                *[dst for _, dst in carry],
            )
        )

    fine = pre.where(F.col("id") < k_clusters).select(
        F.col("id").alias("fid"), F.col("v").alias("fv"),
        F.col("sq").alias("fsq"),
    )
    coarse = fine.where(F.col("fid") < k1).select(
        F.col("fid").alias("sid0"), F.col("fv").alias("__sv"),
        F.col("fsq").alias("__sq2"),
    )
    if levels == 2:
        # fine seed -> coarse group (vector payloads ride the agg via
        # first() — no join-back; r12 guide §2.4)
        fc = nearest(
            fine.select("fid", F.col("fv").alias("__rv"),
                        F.col("fsq").alias("__rq")),
            "fid", coarse, "sid0", "g",
            carry=[("__rv", "fv"), ("__rq", "fsq")],
        )
        # row -> coarse group (the K1-wide probe)
        rc = nearest(
            pre.select("id", F.col("v").alias("__rv"),
                       F.col("sq").alias("__rq")),
            "id", coarse, "sid0", "g",
            carry=[("__rv", "v"), ("__rq", "sq")],
        )
    else:
        # THREE-LEVEL: cbrt(K) top seeds over K^(2/3) mid seeds over
        # the K fine seeds (nested id prefixes). Every probe below the
        # top tier is group-confined, so per-row cost is ~3*cbrt(K).
        k0 = 2
        while k0 ** 3 < k_clusters:
            k0 += 1
        k1_3 = k0
        while k1_3 ** 3 < k_clusters ** 2:
            k1_3 += 1
        k1_3 = min(max(k0, k1_3), k_clusters)
        k0 = min(max(2, k0), k1_3)
        top = fine.where(F.col("fid") < k0).select(
            F.col("fid").alias("sidT"), F.col("fv").alias("__sv"),
            F.col("fsq").alias("__sq2"),
        )
        mid_seed = fine.where(F.col("fid") < k1_3)
        # mid seed -> top group (full probe, K^(2/3) x cbrt(K) pairs);
        # the seed vectors ride the agg (r12: no mid_seed join-back)
        mt = nearest(
            mid_seed.select(
                F.col("fid").alias("mid_id"),
                F.col("fv").alias("__rv"), F.col("fsq").alias("__rq"),
            ),
            "mid_id", top, "sidT", "tg",
            carry=[("__rv", "__sv"), ("__rq", "__sq2")],
        )
        # fine seed -> top group (full probe, K x cbrt(K)), then ->
        # mid group confined to that top group
        ft = nearest(
            fine.select("fid", F.col("fv").alias("__rv"),
                        F.col("fsq").alias("__rq")),
            "fid", top, "sidT", "tg",
            carry=[("__rv", "__rv"), ("__rq", "__rq")],
        )
        fc = confined(
            ft.select("fid", "tg", "__rv", "__rq"),
            "fid", "tg",
            mt.select("tg", "mid_id", "__sv", "__sq2"), "mid_id", "g",
            carry=[("__rv", "fv"), ("__rq", "fsq")],
        )
        # row -> top group, then -> mid group confined to it; the mid
        # group id is the cluster-tree group the fine probe below uses
        rt = nearest(
            pre.select("id", F.col("v").alias("__rv"),
                       F.col("sq").alias("__rq")),
            "id", top, "sidT", "tg",
            carry=[("__rv", "__rv"), ("__rq", "__rq")],
        )
        rc = confined(
            rt.select("id", "tg", "__rv", "__rq"),
            "id", "tg",
            mt.select("tg", "mid_id", "__sv", "__sq2"), "mid_id", "g",
            carry=[("__rv", "v"), ("__rq", "sq")],
        )
    # row -> nearest fine seed WITHIN its coarse group (equi join on g)
    packed = F.min(
        F.struct(
            (
                -cosine_prenormed(
                    F.col("v"), F.col("fv"), F.col("sq"), F.col("fsq")
                )
            ).alias("negcos"),
            F.col("fid").alias("fid"),
        )
    ).alias("m")
    asg = (
        rc.join(fc.select("g", "fid", "fv", "fsq"), "g")
        .groupBy("id")
        .agg(packed, F.first("v").alias("v"), F.first("sq").alias("sq"))
        .select("id", "v", "sq", F.col("m.fid").alias("cluster"))
    )
    # asg feeds BOTH sides of the intra-cluster pair join AND the final
    # verdict join — without a checkpoint the whole assignment tree
    # recomputes three times (r10, found profiling the 3-level tree:
    # stage times were fine but end-to-end was 2x; the deeper chain
    # amplifies recomputation)
    asg = asg.localCheckpoint(eager=False)
    a = asg.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("sq").alias("sa"), F.col("cluster").alias("ca"),
    )
    b = asg.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("sq").alias("sb"), F.col("cluster").alias("cb"),
    )
    hits = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("id_a") > F.col("id_b")))
        .where(
            cosine_prenormed(
                F.col("va"), F.col("vb"), F.col("sa"), F.col("sb")
            )
            >= threshold
        )
        .groupBy(F.col("id_a").alias("id"))
        .agg(F.min("id_b").alias("dup_of"))
    )
    return (
        asg.join(hits, "id", "left")
        .select(
            "id", "cluster",
            F.when(F.col("dup_of").isNotNull(), 1).otherwise(0).alias("is_dup"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long").alias("dup_of"),
        )
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k_candidates: int = 12,
    k_select: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity pass a retrieval stack runs AFTER recall:
    from each query's top-``k_candidates`` cosine candidates, greedily
    select ``k_select`` maximizing

        lam * rel(c)  -  (1 - lam) * max_{s in selected} sim(c, s)

    (ties on score prefer the smaller candidate id). Complements the
    recall family (brute/IVF/IVF-PQ/LSH) and search-rrf-fusion: RRF
    merges rankers, MMR de-redundifies ONE ranking.

    Determinism: rel and sim ride the strict-left-fold cosine doctrine
    (bit-identical doubles cross-engine), lam is an exact decimal
    literal, and every argmax is a struct max with the id tiebreak —
    so the greedy trajectory is a pure function of the data that an
    unrolled ANSI twin replays selection by selection.

    Scale: candidate generation is the corpus scan (delegated to
    :func:`brute_force_topk` here; swap in ivf_topk for the
    billion-vector posture); everything after is bounded by
    ``k_candidates`` per query — the pairwise sim table is
    |Q| * k^2 rows and each greedy round is a join over it. The
    selection loop is a fixed ``k_select``-round plan unroll, NOT a
    driver loop over collected data.

    Emits ``query_id, sel_rank, vec_id, rel, score`` (score of the
    round that selected the vector; round 1's score = rel).
    """
    cands = brute_force_topk(
        corpus, queries, k=k_candidates, id_col=id_col, vec_col=vec_col
    ).select("query_id", F.col("neighbor_id").alias("cid"),
             F.col("cos").alias("rel"))
    cands = cands.localCheckpoint(eager=False)

    vecs = corpus.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v")
    ).select("*", dot(F.col("v"), F.col("v")).alias("sq"))
    a = cands.select("query_id", F.col("cid").alias("sa")).join(
        vecs, F.col("sa") == F.col("vid")
    ).select("query_id", "sa", F.col("v").alias("va"), F.col("sq").alias("qa"))
    b = cands.select("query_id", F.col("cid").alias("sb")).join(
        vecs, F.col("sb") == F.col("vid")
    ).select("query_id", "sb", F.col("v").alias("vb"), F.col("sq").alias("qb"))
    sims = (
        a.join(b, ["query_id"])
        .where(F.col("sa") != F.col("sb"))
        .select(
            "query_id", "sa", "sb",
            cosine_prenormed(
                F.col("va"), F.col("vb"), F.col("qa"), F.col("qb")
            ).alias("sim"),
        )
    )
    sims = sims.localCheckpoint(eager=False)

    def argmax(df, score_col):
        packed = F.max(
            F.struct(
                F.col(score_col).alias("s"),
                (-F.col("cid")).alias("n"),
                F.col("cid").alias("i"),
                F.col("rel").alias("r"),
                F.col(score_col).alias("sc"),
            )
        ).alias("m")
        return df.groupBy("query_id").agg(packed).select(
            "query_id",
            F.col("m.i").alias("vec_id"),
            F.col("m.r").alias("rel"),
            F.col("m.sc").alias("score"),
        )

    sel = argmax(cands.withColumn("score0", F.col("rel")), "score0").select(
        "query_id", "vec_id", "rel", "score", F.lit(1).alias("sel_rank")
    )
    selected = sel
    for r in range(2, k_select + 1):
        rem = cands.join(
            selected.select("query_id", F.col("vec_id").alias("cid")),
            ["query_id", "cid"],
            "left_anti",
        )
        ms = (
            sims.join(
                selected.select("query_id", F.col("vec_id").alias("sb")),
                ["query_id", "sb"],
            )
            .groupBy("query_id", F.col("sa").alias("cid"))
            .agg(F.max("sim").alias("maxsim"))
        )
        scored = rem.join(ms, ["query_id", "cid"]).withColumn(
            "mmr",
            F.lit(lam) * F.col("rel") - F.lit(1 - lam) * F.col("maxsim"),
        )
        nxt = argmax(scored, "mmr").select(
            "query_id", "vec_id", "rel", "score", F.lit(r).alias("sel_rank")
        )
        # r12 (guide §3.3 — very large plans: materialise to truncate):
        # selected(r-1) is referenced THREE times per round (anti-join,
        # sim attach, union), so the lazy plan tree grows ~3^r and
        # round 5 recomputes round 1's argmax dozens of times. A lazy
        # localCheckpoint caps each round at one |Q|*r-row
        # materialization (bounded by construction: k_select rows per
        # query).
        selected = selected.unionByName(nxt).localCheckpoint(eager=False)
    return selected.select("query_id", "sel_rank", "vec_id", "rel", "score")


def _probe_dim_and_count(base: DataFrame, fn_name: str) -> tuple:
    """Shared dim inference for the probe family: ONE aggregation
    yields count + min/max vector length — min == max is the ragged
    gate (ADVICE r11: zip_with against a wrong-length weight literal
    pads nulls and the dot products silently go NULL, the exact
    silent-corruption the loud-gate doctrine bans), and the agreed
    length IS the dimension, so no separate first() job."""
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.size("q")).alias("dmin"),
        F.max(F.size("q")).alias("dmax"),
    ).first()
    if int(agg["n"]) == 0:
        raise ValueError(f"{fn_name}: corpus is empty")
    if agg["dmin"] != agg["dmax"]:
        raise ValueError(
            f"{fn_name}: ragged embedding lengths "
            f"{agg['dmin']}..{agg['dmax']} — ragged vectors would "
            f"NULL-pad zip_with and silently zero the dot products"
        )
    return int(agg["dmin"]), int(agg["n"])


def embedding_linear_probe(
    corpus: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 8,
    lr: int = 32,
    q_scale: int = 1000,
    score_corpus: DataFrame | None = None,
) -> DataFrame:
    """DENSE linear probe trained in-engine — the embedding-side
    counterpart of the sparse hashed fastText trainer
    (operators/text.hashed_linear_train): fixed-iteration full-batch
    GD on squared loss over ONE-TIME-QUANTIZED embedding vectors,
    every step exact int64, so training is a pure function of the
    data and the DuckDB twin replays it round by round.

    Quantize once (q = round(x * q_scale), the kmeans_centroids_exact
    recipe), keep weights in micro-units; per iteration (all floor
    divisions via the shared floor-adjust idiom):

      s_d     = sum_i q_di * w_i          (int64 dot product)
      resid_d = fdiv(s_d, q_scale) - y_d * 1e6
      G_i     = sum_d q_di * resid_d      (combinable per-dim agg)
      w_i    -= fdiv(lr * fdiv(G_i, D), q_scale)

    which is GD with step ``lr`` on 1/(2D)||Xw - y||^2 for x = q/Q,
    w in micro-units. Fixture embeddings have |x| <= ~0.5, so every
    product sits far under 2^63 (|q| <= ~525, |w| < ~1e6 measured).

    Scale: per iteration ONE combinable posexplode aggregation over
    the quantized corpus (dim-count groups) + a dim-sized collect
    (the kmeans centroid precedent); the weight vector rides back as
    an array LITERAL, so scoring is a zip_with fold in whole-stage
    codegen — no join anywhere. Output: (id_col, label, y,
    score_micro) — the trained per-vector score for the
    one-vs-rest y = (label == 1) target unless the caller pre-derives
    ``y`` differently (pass label_col='y' with y precomputed).

    ``score_corpus``: score a DIFFERENT frame with the trained
    weights (train/test splits — the embedding-probe-holdout entry);
    default scores the training corpus itself. NOTE the certified
    AUC on the training corpus is IN-SAMPLE fit (optimizer
    correctness + capacity); the fixture's labels carry little
    generalizable signal (held-out AUC ~0.52 at every SF — measured,
    see embedding-probe-holdout), which is exactly what an honest
    eval harness must report."""
    spark = corpus.sparkSession
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("long").alias("label"),
        (F.col(label_col) == 1).cast("long").alias("y"),
        F.transform(
            as_double(F.col(vec_col)),
            lambda x: F.round(x * q_scale).cast("long"),
        ).alias("q"),
    ).localCheckpoint(eager=True)
    dim, D = _probe_dim_and_count(base, "embedding_linear_probe")
    w = [0] * dim

    def score_of(wlist):
        wlit = F.lit([int(v) for v in wlist])
        s = F.aggregate(
            F.zip_with(F.col("q"), wlit, lambda x, wv: x * wv),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        )
        return s

    from .text import _fdiv_sql  # the shared floor-adjust division

    for _ in range(iters):
        scored = base.select(
            "id", "y", "q", score_of(w).alias("s")
        ).select(
            "q",
            (
                F.expr(_fdiv_sql("s", str(q_scale)))
                - F.col("y") * 1_000_000
            ).alias("resid"),
        )
        grad = (
            scored.select(F.posexplode("q").alias("i", "x"), "resid")
            .groupBy("i")
            .agg(F.sum(F.col("x") * F.col("resid")).alias("g"))
            .collect()
        )
        gmap = {int(r["i"]): int(r["g"]) for r in grad}
        w = [
            w[i] - (lr * (gmap.get(i, 0) // D)) // q_scale
            for i in range(dim)
        ]
    target = base
    if score_corpus is not None:
        target = score_corpus.select(
            F.col(id_col).alias("id"),
            F.col(label_col).cast("long").alias("label"),
            (F.col(label_col) == 1).cast("long").alias("y"),
            F.transform(
                as_double(F.col(vec_col)),
                lambda x: F.round(x * q_scale).cast("long"),
            ).alias("q"),
        )
    return target.select(
        F.col("id").alias(id_col), "label", "y",
        score_of(w).alias("__s"),
    ).select(
        id_col, "label", "y",
        F.expr(_fdiv_sql("__s", str(q_scale))).alias("score_micro"),
    )


def embedding_probe_loss_curve(
    corpus: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    iters: int = 8,
    lr: int = 32,
    q_scale: int = 1000,
) -> DataFrame:
    """Training LOSS CURVE of :func:`embedding_linear_probe` — the
    learning diagnostic that certifies GD is actually descending:
    SSE_t = sum_d resid_d(w_t)^2 in exact int64 for t = 0..iters
    (t=0 is the all-zero model: SSE_0 = 1e12 * n_positives). The
    per-round arithmetic is byte-identical to the probe's, so the
    curve IS the probe's training transcript, and monotone strict
    decrease is pytest-asserted. Int64 bound: resid^2 <= ~1.7e12 at
    this fixture's |resid| <= 1.3e6, safe to ~5e6 docs — track SSE in
    milli-units past that (the kmeans scale-knob pattern).

    Scale: each round pays one combinable per-dim gradient agg + one
    1-row SSE agg. Output: (iter, sse) — iters+1 rows."""
    base = corpus.select(
        (F.col(label_col) == 1).cast("long").alias("y"),
        F.transform(
            as_double(F.col(vec_col)),
            lambda x: F.round(x * q_scale).cast("long"),
        ).alias("q"),
    ).localCheckpoint(eager=True)
    dim, D = _probe_dim_and_count(base, "embedding_probe_loss_curve")
    from .text import _fdiv_sql

    def resid_frame(wlist):
        wlit = F.lit([int(v) for v in wlist])
        s = F.aggregate(
            F.zip_with(F.col("q"), wlit, lambda x, wv: x * wv),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        )
        return base.select("q", s.alias("__s"), "y").select(
            "q",
            (
                F.expr(_fdiv_sql("__s", str(q_scale)))
                - F.col("y") * 1_000_000
            ).alias("resid"),
        )

    w = [0] * dim
    losses: list[tuple[int, int]] = []
    for t in range(iters):
        scored = resid_frame(w)
        sse = scored.agg(
            F.sum(F.col("resid") * F.col("resid")).alias("sse")
        ).collect()[0]["sse"]
        losses.append((t, int(sse)))
        grad = (
            scored.select(F.posexplode("q").alias("i", "x"), "resid")
            .groupBy("i")
            .agg(F.sum(F.col("x") * F.col("resid")).alias("g"))
            .collect()
        )
        gmap = {int(r["i"]): int(r["g"]) for r in grad}
        w = [
            w[i] - (lr * (gmap.get(i, 0) // D)) // q_scale
            for i in range(dim)
        ]
    final = resid_frame(w).agg(
        F.sum(F.col("resid") * F.col("resid")).alias("sse")
    ).collect()[0]["sse"]
    losses.append((iters, int(final)))
    return corpus.sparkSession.createDataFrame(
        losses, "iter long, sse long"
    )


def embedding_multiclass_probe(
    corpus: DataFrame,
    num_classes: int = 10,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 8,
    lr: int = 32,
    q_scale: int = 1000,
) -> DataFrame:
    """MULTICLASS linear probe trained in-engine — ``num_classes``
    one-vs-rest heads descended JOINTLY with the same exact int64
    arithmetic as :func:`embedding_linear_probe` (shared quantization,
    floor-divisions, and step rule, one head per class), then argmax
    prediction with the LOWEST-CLASS tiebreak (both engines index the
    FIRST position of the max) and the 10x10 CONFUSION MATRIX as
    output — the representation-quality scoreboard.

    Scale: per round ONE posexplode aggregation over (dim x class)
    groups + a (num_classes x dim)-sized collect; prediction is an
    array_max/array_position projection — no join anywhere. The
    ``num_classes`` heads ride ONE 2-D weight literal and the residual
    HOF is the first explode's GENERATOR (evaluated once per doc — in
    the Generate's own projection it re-evaluates per exploded row, a
    dim-times recompute). r12 adjudication of VERDICT r11 #3: the
    entry's wall time is NOT compile-bound — it is 8 sequential ~1 s
    shuffle-job latencies (constant in data size; local-mode stage
    scheduling floor), measured by A/B: 2-D literal vs per-class fold
    columns vs broadcast weight-table all land ~1 s/round once the
    generator-order fix is in; unrolling all rounds into one lazy plan
    was measured and REJECTED (the weight frame is referenced twice
    per round, so the logical plan doubles each round — minutes of
    analysis — and truncating via per-round localCheckpoint costs more
    per round than the jobs it saves). Output: (label, pred, n) —
    observed confusion cells only."""
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("long").alias("label"),
        F.transform(
            as_double(F.col(vec_col)),
            lambda x: F.round(x * q_scale).cast("long"),
        ).alias("q"),
    ).localCheckpoint(eager=True)
    dim, D = _probe_dim_and_count(base, "embedding_multiclass_probe")

    def _fdiv_col(x: Column, d: int) -> Column:
        # Column twin of text._fdiv_sql: exact floor division via the
        # floor-adjusted numerator. The adjusted numerator is an exact
        # multiple of d and |score| stays far below 2^53, so the one
        # double division is exact and the cast back is lossless.
        dl = F.lit(d).cast("long")
        return ((x - (((x % dl) + dl) % dl)) / dl).cast("long")

    def scores_of(Wmat):
        # ONE 2-D weight literal scores every head: generated code is
        # a loop over the outer array, constant in classes x dim
        w2 = F.array(*[
            F.lit([int(v) for v in Wmat[c]]) for c in range(num_classes)
        ])
        return F.transform(
            w2,
            lambda wrow: F.aggregate(
                F.zip_with(F.col("q"), wrow, lambda x, wv: x * wv),
                F.lit(0).cast("long"),
                lambda a, v: a + v,
            ),
        )

    W = [[0] * dim for _ in range(num_classes)]
    for _ in range(iters):
        resids = F.transform(
            scores_of(W),
            lambda s, c: _fdiv_col(s, q_scale)
            - F.when(
                F.col("label") == c.cast("long"),
                F.lit(1_000_000).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        # the HEAVY residual HOF is the GENERATOR of the first explode,
        # so it evaluates once per doc; exploding q second only unpacks
        # a stored array. The reverse order puts the residual column in
        # the q-Generate's projection, where CollapseProject makes it
        # re-evaluate per exploded row — a dim-times recompute (r12
        # measurement: the same hazard made the weight-COLUMN variant
        # ~10x slower per round).
        ex = base.select(
            "q", F.posexplode(resids).alias("c", "r")
        ).select("c", "r", F.posexplode("q").alias("i", "x"))
        grad = (
            ex.groupBy("c", "i")
            .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
            .collect()
        )
        gmap = {(int(r["c"]), int(r["i"])): int(r["g"]) for r in grad}
        W = [
            [
                W[c][i] - (lr * (gmap.get((c, i), 0) // D)) // q_scale
                for i in range(dim)
            ]
            for c in range(num_classes)
        ]
    final = base.select(
        "label",
        F.transform(
            scores_of(W), lambda s: _fdiv_col(s, q_scale)
        ).alias("sc"),
    )
    pred = (F.array_position(F.col("sc"), F.array_max("sc")) - 1).cast(
        "long"
    )
    return (
        final.select("label", pred.alias("pred"))
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
