"""Operator-level tests: interval-join equivalence + physical properties,
secondary sort, approximate-dedup recall, similarity recall, multimodal
plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# ------------------------------------------------------- interval joins

def _fixture_points_intervals(spark):
    # FIXTURES.md §3 edge cases: start==point, end==point, nested intervals,
    # point outside all intervals, interval containing no points
    points = spark.createDataFrame(
        [Row(p=16915619), Row(p=16915620), Row(p=16915621), Row(p=1)]
    )
    intervals = spark.createDataFrame(
        [
            Row(lo=16915619, hi=16915620, iv="a"),   # start == p1, end == p2
            Row(lo=16915620, hi=16915621, iv="b"),   # start == p2, end == p3
            Row(lo=16915000, hi=16999999, iv="c"),   # contains p1..p3 (nested)
            Row(lo=5000000, hi=5000010, iv="empty"), # contains no points
        ]
    )
    return points, intervals


def test_interval_join_edge_semantics(spark):
    from genpipe_spark.operators.interval import interval_join, interval_join_explode

    points, intervals = _fixture_points_intervals(spark)
    expected = {  # closed-interval semantics, computed by hand
        (16915619, "a"), (16915619, "c"),
        (16915620, "a"), (16915620, "b"), (16915620, "c"),
        (16915621, "b"), (16915621, "c"),
    }
    for form in ["banded", "explode", "broadcast"]:
        if form == "explode":
            out = interval_join_explode(points, intervals, "p", "lo", "hi")
        else:
            out = interval_join(
                points, intervals, "p", "lo", "hi",
                band_width=1000, broadcast_intervals=(form == "broadcast"),
            )
        got = {(r["p"], r["iv"]) for r in out.collect()}
        assert got == expected, form


def test_interval_join_left_outer_keeps_unmatched_points(spark):
    """how='left' must keep points outside every interval (NULL interval
    columns) — the residual lives in the join CONDITION; a post-join
    .where would evaluate NULL on unmatched rows and silently degrade
    the outer join to inner (VERDICT r4 item 2). Matched pairs must be
    exactly the inner/explode-oracle set."""
    from genpipe_spark.operators.interval import interval_join, interval_join_explode

    points, intervals = _fixture_points_intervals(spark)
    inner_pairs = {
        (r["p"], r["iv"])
        for r in interval_join_explode(points, intervals, "p", "lo", "hi").collect()
    }
    for broadcast in (False, True):
        out = interval_join(
            points, intervals, "p", "lo", "hi",
            band_width=1000, how="left", broadcast_intervals=broadcast,
        ).collect()
        got_matched = {(r["p"], r["iv"]) for r in out if r["iv"] is not None}
        got_unmatched = {r["p"] for r in out if r["iv"] is not None} ^ {
            r["p"] for r in out
        }
        assert got_matched == inner_pairs, broadcast
        assert got_unmatched == {1}, broadcast  # p=1 survives with NULLs
        # and exactly once — banding must not duplicate the NULL row
        assert sum(1 for r in out if r["p"] == 1) == 1, broadcast

    with pytest.raises(ValueError, match="right/full"):
        interval_join(points, intervals, "p", "lo", "hi", how="full")


def test_interval_join_banded_is_equijoin(spark):
    """The banded form must plan as a hash/sort-merge equi-join, never a
    BroadcastNestedLoopJoin — the whole point of banding (SURVEY.md §7.4)."""
    from genpipe_spark.operators.interval import interval_join

    points, intervals = _fixture_points_intervals(spark)
    plan = interval_join(
        points, intervals, "p", "lo", "hi", band_width=1000
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_sort_within_partitions_properties(spark):
    from genpipe_spark.operators.relational import sort_within_partitions

    df = spark.range(0, 10000).select((F.col("id") * 37 % 1000).alias("k"))
    out = sort_within_partitions(df, "k", num_partitions=8)

    def check(it):
        vals = [r["k"] for r in it]
        yield Row(ok=vals == sorted(vals), lo=vals[0] if vals else None,
                  hi=vals[-1] if vals else None)

    parts = out.rdd.mapPartitions(check).collect()
    assert all(p["ok"] for p in parts)  # each partition sorted
    ranges = sorted((p["lo"], p["hi"]) for p in parts if p["lo"] is not None)
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # partitions are range-disjoint


# ------------------------------------------------- approximate-op recall

@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").cache()


def test_minhash_recall_vs_exact(spark, docs):
    from genpipe_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    est = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert truth, "fixture should contain planted near-dups"
    recall = len(truth & est) / len(truth)
    assert recall >= 0.8, (recall, truth, est)


def test_simhash_finds_planted_dups(spark, docs):
    from genpipe_spark.operators.dedup import ngram_jaccard_pairs, simhash_pairs

    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(docs, bits=32, max_hamming=3).collect()
    }
    assert truth
    recall = len(truth & got) / len(truth)
    assert recall >= 0.7, (recall, truth, got)
    # r12: the two-level block-pair banding (default) and the classic
    # d+1 single-block layout verify to the SAME pair set — the banding
    # only shapes the candidate volume, never the output
    single = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(
            docs, bits=32, max_hamming=3, two_level=False
        ).collect()
    }
    assert got == single, (got ^ single)


def test_ivf_recall_vs_brute_force(spark):
    from genpipe_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()
    q = emb.where(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, q, k=5).collect()
    approx = ivf_topk(emb, q, num_centroids=4, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q_] & approx_sets.get(q_, set())) / len(exact_sets[q_])
        for q_ in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.4  # coarse cells, small corpus


def test_lsh_pairs_match_brute_force_above_threshold(spark):
    from genpipe_spark.operators.similarity import (
        cosine_near_dup_pairs,
        lsh_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()
    exact = {
        (r["id_a"], r["id_b"]) for r in cosine_near_dup_pairs(emb, 0.35).collect()
    }
    got = {(r["id_a"], r["id_b"]) for r in lsh_near_dup_pairs(emb, 0.35).collect()}
    # LSH output must be a subset (same exact-cosine filter) with sane recall
    assert got <= exact
    if exact:
        assert len(got) / len(exact) >= 0.3


# -------------------------------------------------- multimodal plumbing

def test_multimodal_feature_extraction(spark, docs):
    from genpipe_spark.operators.multimodal import (
        documents_as_media,
        extract_features,
    )

    media = documents_as_media(docs)
    feats = extract_features(media, dim=16, use_fake_decoder=True)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(len(r["feature"]) == 16 for r in rows)
    # deterministic: second run bit-identical
    rows2 = extract_features(media, dim=16, use_fake_decoder=True).collect()
    assert sorted(map(repr, rows)) == sorted(map(repr, rows2))


def test_multimodal_float_feature_path_is_gated(spark, docs):
    from genpipe_spark.operators.multimodal import documents_as_media, extract_features

    with pytest.raises(NotImplementedError):
        extract_features(documents_as_media(docs))


def test_codec_roundtrips():
    import numpy as np

    from genpipe_spark.functions.codecs import (
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.default_rng(42)
    for _ in range(25):
        h, w = (int(v) for v in rng.integers(1, 48, 2))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(px)) == px).all()
    # Netpbm header quirks: comments and arbitrary whitespace
    quirky = b"P6\n# comment line\n  4\t3 # inline\n255\n" + bytes(range(36))
    assert decode_ppm(quirky).shape == (3, 4, 3)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # greyscale PGM, not P6
    for _ in range(25):
        n = int(rng.integers(1, 5000))
        s = rng.integers(-(2**15), 2**15, n).astype(np.int16)
        rate, out = decode_wav(encode_wav(s, rate=16000))
        assert rate == 16000 and (out == s).all()


def test_multimodal_real_codec_end_to_end(spark, docs):
    import numpy as np

    from genpipe_spark.operators.multimodal import decode_features, synth_media_real

    feats = {r["media_id"]: r for r in decode_features(synth_media_real(docs)).collect()}
    assert len(feats) == docs.count()
    # hand-recompute one image and one audio doc from the recurrences
    for mid, r in feats.items():
        if mid % 2 == 0:
            w, h = mid % 13 + 4, mid % 11 + 4
            y, x, c = np.ogrid[0:h, 0:w, 0:3]
            px = (mid * 7 + 3 * c + x + y) % 256
            assert (r["kind"], r["n_units"]) == ("image", w * h)
            assert (r["v_sum"], r["v_max"]) == (int(px.sum()), int(px.max()))
        else:
            n = mid % 512 + 64
            s = (mid * 31 + 17 * np.arange(n, dtype=np.int64)) % 16384 - 8192
            assert (r["kind"], r["n_units"]) == ("audio", n)
            assert (r["v_sum"], r["v_max"]) == (int(s.sum()), int(s.max()))


def test_multimodal_unknown_codec_raises(spark):
    from pyspark.sql.utils import PythonException

    from genpipe_spark.operators.multimodal import MEDIA_SCHEMA, decode_features

    media = spark.createDataFrame(
        [(1, "image", b"\xff\xd8\xff", "image/jpeg", 2, 2, 0)], schema=MEDIA_SCHEMA
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_features(media).collect()


def test_resize_ppm_real(spark, docs):
    import numpy as np

    from genpipe_spark.functions.codecs import decode_ppm
    from genpipe_spark.operators.multimodal import resize_ppm, synth_media_real

    media = synth_media_real(docs.limit(20))
    resized = resize_ppm(media, width=8, height=6)
    for r in resized.collect():
        if r["codec"] != "image/ppm":
            continue  # audio passes through untouched
        px = decode_ppm(bytes(r["payload"]))
        assert px.shape == (6, 8, 3)
        assert (r["width"], r["height"]) == (8, 6)
        # nearest-neighbor: every resized pixel exists in the source image
        mid = r["media_id"]
        w, h = mid % 13 + 4, mid % 11 + 4
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        src = ((mid * 7 + 3 * c + x + y) % 256).astype(np.uint8)
        ys = (np.arange(6) * h // 6).clip(0, h - 1)
        xs = (np.arange(8) * w // 8).clip(0, w - 1)
        assert (px == src[ys][:, xs]).all()


# ------------------------------------------------- skew / co-location

def test_salted_group_agg_matches_direct(spark):
    from genpipe_spark.operators.skew import salted_group_agg

    df = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    direct = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["qty"])
        for r in df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["qty"])
        for r in salted_group_agg(
            df.withColumn("qty_l", F.col("l_quantity").cast("long")),
            ["l_returnflag", "l_linestatus"],
            {"n": ("l_quantity", "count"), "qty": ("qty_l", "sum")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == direct


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import uuid

    from genpipe_spark.operators.skew import bucketed_join, write_bucketed

    suffix = uuid.uuid4().hex[:8]
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, f"b_li_{suffix}", "l_orderkey", 8)
    write_bucketed(orders, f"b_ord_{suffix}", "l_orderkey", 8)

    # AQE wraps the plan; disable broadcast to force the SMJ path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, f"b_li_{suffix}", f"b_ord_{suffix}", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE b_li_{suffix}")
        spark.sql(f"DROP TABLE b_ord_{suffix}")


def test_layout_bucketed_join_query_no_shuffle(spark):
    """The driver-window layout-bucketed-join query (VERDICT r5 item 1)
    must plan BOTH the join and the per-customer aggregate with zero
    shuffle Exchange — the bucketed layout's HashPartitioning(c_custkey)
    satisfies the join and the (c_custkey, c_mktsegment) grouping."""
    from genpipe_spark import registry

    registry.load_all_query_modules()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = registry.QUERIES["layout-bucketed-join"](spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_partitioned_layout_prunes(spark, tmp_path):
    """Stage tables written partitionBy(key) must show PartitionFilters
    (directory pruning) when filtered on the key — the Catalyst-native
    replacement for the reference's path arithmetic (SCALE.md 'Scans')."""
    from genpipe_spark.sources.sinks import write_parquet_partitioned

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").withColumn(
        "rf", F.col("l_returnflag")
    )
    dest = str(tmp_path / "part")
    write_parquet_partitioned(li, dest, ("rf",))
    q = spark.read.parquet(dest).where(F.col("rf") == "R").select("l_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the partition-key predicate lands in PartitionFilters (directory
    # pruning), not as a data filter; inputFiles() is pre-pruning so the
    # plan text is the observable
    assert "PartitionFilters" in plan
    assert "= R" in plan.split("PartitionFilters", 1)[1][:140]


def test_ngram_jaccard_doc_freq_cap_bounds_candidates(spark):
    """A stop-phrase shared by all docs makes the uncapped inverted index
    quadratic (d^2 candidate pairs); max_doc_freq drops the hot shingle
    before the self-join."""
    from genpipe_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (i, "of the and " + f"u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(40)
    ]
    stop_docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(stop_docs, threshold=0.0)
    # the shared "of the and" shingle pairs every doc with every other
    assert uncapped.count() == 40 * 39 // 2
    capped = ngram_jaccard_pairs(stop_docs, threshold=0.0, max_doc_freq=5)
    assert capped.count() == 0  # no rare shingle is shared


def test_dedup_size_joins_are_not_broadcast_hinted(spark, docs):
    """Per-document size tables must never carry a broadcast hint — at
    corpus scale they have billions of rows (VERDICT r01). AQE may still
    auto-broadcast small sides at runtime, which is the correct behavior."""
    from genpipe_spark.operators.dedup import contamination_check, ngram_jaccard_pairs

    plan1 = (
        ngram_jaccard_pairs(docs, threshold=0.2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    plan2 = (
        contamination_check(corpus, bench, threshold=0.05)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for plan in (plan1, plan2):
        assert "ResolvedHint" not in plan
        assert "broadcast" not in plan.lower()


def _asof_fixture(spark):
    # key 1: ticks at t=10,20,30; key 2: no right rows at all; equal-ts
    # tie at t=20 (two right rows) exercises the tiebreak rule
    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (1, 25, 102), (2, 15, 200)],
        "k long, ts long, lid long",
    ).select("k", F.timestamp_seconds("ts").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(1, 5, 900, 1.0), (1, 20, 901, 2.0), (1, 20, 902, 3.0), (1, 24, 903, 4.0)],
        "k long, rts long, rid long, rv double",
    ).select("k", F.timestamp_seconds("rts").alias("rts"), "rid", "rv")
    return left, right


def test_asof_join_backward_forward_tolerance(spark):
    from genpipe_spark.operators.asof import asof_join

    left, right = _asof_fixture(spark)

    def run(**kw):
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rid", "rv"], tiebreak="rid", **kw,
        )
        return {r["lid"]: r["rid"] for r in out.collect()}

    # backward: <= semantics, equal-ts tie keeps max tiebreak (902 at t=20)
    assert run() == {100: 900, 101: 902, 102: 903, 200: None}
    # forward: >= semantics, equal-ts tie keeps min tiebreak
    assert run(direction="forward") == {100: 901, 101: 901, 102: None, 200: None}
    # tolerance: match farther than 5s reverts to null (t=10 vs t=5 is
    # exactly 5s → kept; boundary is inclusive)
    assert run(tolerance_s=5.0) == {100: 900, 101: 902, 102: 903, 200: None}
    assert run(tolerance_s=4.0) == {100: None, 101: 902, 102: 903, 200: None}


def test_asof_join_plans_single_shuffle_no_bnlj(spark):
    """The union+window formulation must shuffle each side once on the
    keys and never degrade to BroadcastNestedLoopJoin/CartesianProduct
    (a naive l.ts >= r.ts range join would)."""
    from genpipe_spark.operators.asof import asof_join

    left, right = _asof_fixture(spark)
    plan = (
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rid", "rv"], tiebreak="rid",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # one Exchange per union leg (hashpartitioning on the key), nothing more
    assert plan.count("Exchange hashpartitioning") <= 2


def test_kmeans_centroids_and_ivf_recall(spark):
    """Trained centroids must cover every cell id, keep dimensionality,
    and the IVF probe built on them must reach reasonable recall vs the
    exact brute force on the harness embeddings."""
    from genpipe_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cents = kmeans_centroids(emb, num_centroids=8, iters=2)
    rows = cents.collect()
    assert len(rows) == 8 and all(len(r["cent_v"]) == 64 for r in rows)

    q = emb.where(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, centroids=cents).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.3  # probe-1-cell floor


def test_kmv_sketch_merge_and_accuracy(spark):
    """KMV invariants: merging per-partition sketches reproduces the
    global sketch exactly (bottom-k is an exact semigroup), and the
    estimate lands within the standard ~1/sqrt(k) error band."""
    from genpipe_spark.operators.sketch import kmv_estimate, kmv_merge, kmv_sketch

    n = 5000
    df = spark.range(n).select(F.concat(F.lit("tok"), F.col("id")).alias("w"))
    k = 128
    glob = kmv_sketch(df, "w", k).collect()[0]["mins"]
    a = kmv_sketch(df.where(F.col("w").substr(4, 10).cast("long") % 2 == 0), "w", k)
    b = kmv_sketch(df.where(F.col("w").substr(4, 10).cast("long") % 2 == 1), "w", k)
    merged = (
        a.select(F.col("mins").alias("ma"))
        .crossJoin(b.select(F.col("mins").alias("mb")))
        .select(kmv_merge(F.col("ma"), F.col("mb"), k).alias("mins"))
    )
    assert merged.collect()[0]["mins"] == glob

    est = (
        merged.select(kmv_estimate(F.col("mins"), k).alias("e")).collect()[0]["e"]
    )
    assert abs(est - n) / n < 3.0 / (k ** 0.5)  # 3 standard errors


def test_connected_components_transitive(spark):
    """Chains must collapse transitively (1-2, 2-3, 3-4 -> one component)
    and disjoint pairs stay separate; labels are the component min."""
    from genpipe_spark.operators.graph import connected_components, dedup_groups

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "src: long, dst: long",
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20),
    }

    groups = {
        (r["component"], r["n_members"], r["member_ids"])
        for r in dedup_groups(
            edges.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
        ).collect()
    }
    assert groups == {
        (1, 4, "1|2|3|4"),
        (10, 2, "10|11"),
        (20, 2, "20|21"),
    }


def test_connected_components_max_iter_guard(spark):
    """Exhausting max_iter before the fixpoint must raise (strict) or
    warn (strict=False) instead of silently returning wrong labels —
    a long chain needs ~diameter rounds to collapse."""
    import warnings

    from genpipe_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "src: long, dst: long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components(chain, max_iter=1, strict=False)
        assert any("did not converge" in str(x.message) for x in w)
        assert out.count() == 9  # labels returned, flagged incomplete
    # enough rounds: converges and is exact
    got = {
        (r["node"], r["component"])
        for r in connected_components(chain, max_iter=20).collect()
    }
    assert got == {(i, 1) for i in range(1, 10)}


def test_weighted_sample_with_replacement(spark):
    """k draws → k winners per group; a dominant-weight row wins most
    draws (with-replacement semantics); reruns are bit-identical."""
    from genpipe_spark.operators.mixing import weighted_sample_with_replacement

    rows = [(1, "a", 1_000_000), (2, "a", 1), (3, "a", 1), (4, "b", 5)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, n_chars: long")
    out = weighted_sample_with_replacement(df, "n_chars", 8, by="source")
    got = [(r["source"], r["draw"], r["doc_id"]) for r in out.collect()]
    assert len(got) == 16  # 8 draws x 2 groups, one winner each
    assert len({(s, d) for s, d, _ in got}) == 16
    a_winners = [i for s, _, i in got if s == "a"]
    # weight 1e6 vs 1: doc 1 must dominate group a's draws — and win
    # MORE THAN ONCE, which without-replacement sampling cannot do
    assert a_winners.count(1) >= 6
    assert all(i == 4 for s, _, i in got if s == "b")
    rerun = [(r["source"], r["draw"], r["doc_id"]) for r in
             weighted_sample_with_replacement(df, "n_chars", 8, by="source").collect()]
    assert sorted(rerun) == sorted(got)


def test_triangle_count_known_graph(spark):
    """K4 (every node in C(3,2)=3 triangles) + a pendant edge (no
    triangles) + duplicate/reversed edges (must not double-count)."""
    from genpipe_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(
        k4 + [(b, a) for a, b in k4] + [(3, 9)], "src: long, dst: long"
    )
    got = {(r["node"], r["n_triangles"]) for r in triangle_count(edges).collect()}
    assert got == {(0, 3), (1, 3), (2, 3), (3, 3)}


def test_bfs_levels_early_exit_on_empty_frontier(spark, monkeypatch):
    """A diameter-2 graph under max_depth=50 must stop as soon as the
    frontier empties (VERDICT r5): the per-round localCheckpoint count
    stays O(diameter), not O(max_depth), and levels are exact."""
    from pyspark.sql import DataFrame

    from genpipe_spark.operators.graph import bfs_levels

    calls = {"n": 0}
    orig = DataFrame.localCheckpoint

    def counting(self, eager=True):
        calls["n"] += 1
        return orig(self, eager=eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", counting)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src: long, dst: long"
    )
    seeds = spark.createDataFrame([(1,)], "node: long")
    got = {
        (r["node"], r["level"])
        for r in bfs_levels(edges, seeds, max_depth=50).collect()
    }
    assert got == {(1, 0), (2, 1), (3, 2)}
    # 3 productive rounds + 1 empty-frontier probe, 2 checkpoints per
    # round max — far below the ~100 a full 50-round run would issue
    assert calls["n"] <= 10, calls["n"]


def test_asof_join_rejects_reserved_internal_names(spark):
    from genpipe_spark.operators.asof import asof_join

    left, right = _asof_fixture(spark)
    with pytest.raises(ValueError, match="asof_join internals"):
        asof_join(
            left.withColumn("__ts", F.lit(1)), right, on="k",
            left_ts="ts", right_ts="rts", right_cols=["rid"], tiebreak="rid",
        )
    with pytest.raises(ValueError, match="asof_join internals"):
        asof_join(
            left, right.withColumn("__pay", F.lit(1)), on="k",
            left_ts="ts", right_ts="rts", right_cols=["rid"], tiebreak="rid",
        )


def test_kmeans_centroids_small_corpus_clamps(spark):
    """Fewer corpus rows than requested centroids must clamp (not
    IndexError in the empty-cell fallback); empty corpus raises."""
    from genpipe_spark.operators.similarity import kmeans_centroids

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    tiny = emb.where(F.col("vec_id") < 3)
    cents = kmeans_centroids(tiny, num_centroids=8, iters=2)
    rows = cents.collect()
    assert len(rows) == 3 and all(len(r["cent_v"]) == 64 for r in rows)

    with pytest.raises(ValueError, match="corpus is empty"):
        kmeans_centroids(emb.where(F.lit(False)), num_centroids=4)


def test_kmv_query_empty_corpus_null_hk(spark, tmp_path):
    """sketch-kmv-distinct on an empty corpus: size-0 sketch must yield
    a null h_k (not an ANSI element_at(·, 0) crash)."""
    from genpipe_spark.queries.llmdata import sketch_kmv_distinct

    spark.createDataFrame([], "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = sketch_kmv_distinct(spark, str(tmp_path)).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_mins"] == 0 and r["h_k"] is None and r["est"] == 0


def test_staged_layout_query_prunes_and_colocates(spark, tmp_path):
    """Query-level demo of the SCALE.md stage layout: one table written
    partitionBy(pruning key) + bucketBy(join key) must give a downstream
    query BOTH directory pruning (PartitionFilters on the filter key)
    and a shuffle-free join (no Exchange on either side), with results
    identical to the same query over the raw files."""
    import uuid

    from genpipe_spark.operators.skew import write_staged, write_bucketed

    suffix = uuid.uuid4().hex[:8]
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", F.col("l_returnflag").alias("rf")
    )
    orders = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    )
    write_staged(li, f"s_li_{suffix}", ("rf",), "l_orderkey", 8)
    write_bucketed(orders, f"s_ord_{suffix}", "l_orderkey", 8)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = (
            spark.table(f"s_li_{suffix}")
            .where(F.col("rf") == "R")
            .join(spark.table(f"s_ord_{suffix}"), "l_orderkey")
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "= R" in plan.split("PartitionFilters", 1)[1][:200]
        assert "Exchange" not in plan, plan  # co-located join, pruned scan

        expect = (
            li.where(F.col("rf") == "R").join(orders, "l_orderkey").count()
        )
        assert q.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE s_li_{suffix}")
        spark.sql(f"DROP TABLE s_ord_{suffix}")


def test_quota_sample_two_phase_equivalent_and_capped(spark):
    """two_phase=True must return exactly the same rows as the plain
    window form (per-partition pre-top-quota is a superset of the global
    top-quota), and every group must be capped at the quota."""
    from genpipe_spark.operators.mixing import quota_sample

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").repartition(7)
    plain = quota_sample(docs, "source", 5)
    two = quota_sample(docs, "source", 5, two_phase=True)
    assert {r["doc_id"] for r in plain.collect()} == {
        r["doc_id"] for r in two.collect()
    }
    per_group = plain.groupBy("source").count().collect()
    assert per_group and all(r["count"] <= 5 for r in per_group)


def test_mix_weighted_is_pure_filter_no_shuffle(spark):
    """mix_weighted must plan as scan+filter — zero Exchange — and keep
    roughly rate-proportional group sizes."""
    from genpipe_spark.operators.mixing import mix_weighted

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = mix_weighted(docs, "source", {"src0": 0.5, "src1": 0.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert "src1" not in got  # rate 0 drops the whole group
    base = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    assert 0.2 < got["src0"] / base["src0"] < 0.8  # ~0.5 on a small group


def test_pack_streaming_invariants(spark):
    """Every document's pack assignment must satisfy the offset algebra:
    0 <= pack_offset < budget + doc_size bound, pack_id monotone in the
    packing order, and offsets reconstruct the running sum exactly."""
    from genpipe_spark.operators.mixing import pack_streaming

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = pack_streaming(docs, "n_chars", 1000, pack_group="lang").collect()
    by_lang: dict = {}
    for r in sorted(out, key=lambda r: (r["lang"], r["doc_id"])):
        run = by_lang.get(r["lang"], 0)
        assert r["pack_id"] == run // 1000
        assert r["pack_offset"] == run - r["pack_id"] * 1000
        by_lang[r["lang"]] = run + r["n_chars"]


def test_quantize_int8_roundtrip_bounds(spark):
    """Quantized values must fit int8 range, the reconstruction error
    must be <= scale/2 per element (half-up rounding bound), and
    all-zero vectors must produce scale 0 / zero arrays."""
    from genpipe_spark.operators.similarity import quantize_int8

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    rows = quantize_int8(emb).collect()
    assert rows
    for r in rows:
        assert all(-127 <= q <= 127 for q in r["q"])
        assert r["err_max"] <= r["scale"] / 2 + 1e-9

    zero = spark.createDataFrame(
        [(1, [0.0] * 4)], "vec_id long, embedding array<float>"
    )
    z = quantize_int8(zero).collect()[0]
    assert z["scale"] == 0.0 and list(z["q"]) == [0, 0, 0, 0] and z["err_max"] == 0.0


def test_zorder_layout_tightens_per_file_bounds(spark, tmp_path):
    """Z-ordered files must have small bounding boxes in BOTH dimensions:
    the mean normalized (range_x * range_y) per file must beat a plain
    single-key sort layout by a wide margin on the second key, which is
    what makes parquet min/max stats skip files for predicates on either
    column."""
    import glob

    from genpipe_spark.operators.layout import write_zordered

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    lo_o, hi_o, lo_p, hi_p = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()

    def mean_ranges(path):
        ro, rp, n = 0.0, 0.0, 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            r = spark.read.parquet(f).agg(
                F.min("l_orderkey"), F.max("l_orderkey"),
                F.min("l_partkey"), F.max("l_partkey"),
            ).first()
            ro += (r[1] - r[0]) / (hi_o - lo_o)
            rp += (r[3] - r[2]) / (hi_p - lo_p)
            n += 1
        assert n >= 8
        return ro / n, rp / n

    zdest = str(tmp_path / "zorder")
    write_zordered(li, zdest, ["l_orderkey", "l_partkey"], num_files=16)
    linear = str(tmp_path / "linear")
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(linear)
    )

    z_o, z_p = mean_ranges(zdest)
    lin_o, lin_p = mean_ranges(linear)
    # linear layout: tight on the sort key (~1/16) but every file spans
    # ~ALL of partkey -> a partkey predicate reads every file. Z-order
    # balances: BOTH dims bounded, so stats skip on either predicate.
    assert lin_p > 0.9  # second dim unbounded under linear sort
    assert z_p < 0.5 * lin_p, (z_p, lin_p)  # z bounds the second dim
    assert z_o < 0.6  # first dim still bounded (not unclustered)
    # and the data survives intact
    assert spark.read.parquet(zdest).count() == li.count()


def test_zorder_skips_row_groups_end_to_end(spark, tmp_path):
    """The point of the layout, measured at the scan: under a predicate
    on the SECOND z-dimension, the FileSourceScan over the z-ordered
    table must output far fewer rows than the single-key-sorted layout
    (parquet row-group min/max stats pruned on read — the reference's
    band-pruning intent, steps/intersectSwap.scala:108, as file layout).
    Probed at sf0.01: z scan 15.6k rows vs linear 60k (no skipping)."""
    from genpipe_spark.operators.layout import write_zordered

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    total = li.count()
    zdest, lindest = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(li, zdest, ["l_orderkey", "l_partkey"], num_files=16)
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(lindest)
    )
    lo, hi = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    width = max(1, (hi - lo) // 8)

    def scan_output_rows(path):
        q = spark.read.parquet(path).where(
            (F.col("l_partkey") >= lo) & (F.col("l_partkey") < lo + width)
        )
        q.collect()
        leaves = q._jdf.queryExecution().executedPlan().collectLeaves()
        assert leaves.size() == 1
        scan = leaves.apply(0)
        assert "FileSourceScan" in scan.getClass().getSimpleName()
        return scan.metrics().apply("numOutputRows").value()

    z_rows, lin_rows = scan_output_rows(zdest), scan_output_rows(lindest)
    # linear-by-orderkey files all span the full partkey range: nothing
    # skips, the scan emits every row and the filter does all the work
    assert lin_rows == total
    # z-ordered files have tight partkey bounds: most row groups skip
    assert z_rows <= 0.5 * lin_rows, (z_rows, lin_rows)


def test_pipeline_stage_zorder_layout(spark, tmp_path):
    """zorder_by on a pipeline stage routes the materialization through
    write_zordered; partition_by and zorder_by are mutually exclusive."""
    from genpipe_spark.plans.pipeline import Pipeline, PipelineContext

    p = Pipeline()

    @p.stage("cluster", output="clustered", zorder_by=("l_orderkey", "l_partkey"))
    def cluster(spark_, ctx):
        return spark_.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
            "l_orderkey", "l_partkey"
        )

    ctx = p.run(spark, PipelineContext(dest=str(tmp_path)))
    out = ctx.tables["clustered"]
    assert out.count() == spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").count()

    with pytest.raises(ValueError, match="mutually exclusive"):
        p2 = Pipeline()
        p2.stage("bad", output="x", partition_by=("a",), zorder_by=("b",))


# ------------------------------------------------------------ quantiles

def test_group_quantiles_ignores_nulls_and_matches_approx_semantics(spark):
    """ADVICE r3: NULLs must not count toward n (they shifted ranks and
    could surface NULL at low percentiles); exact mode must agree with
    percentile_approx / DuckDB quantile_disc NULL handling."""
    from pyspark.sql import Row

    from genpipe_spark.operators.quantile import group_quantiles

    df = spark.createDataFrame(
        [Row(g="a", v=v) for v in [1, 2, 3, 4, None, None]]
    )
    exact = {r["pct"]: r["q"] for r in group_quantiles(df, "v", ["g"], (50,)).collect()}
    assert exact == {50: 2}  # ceil(0.5*4) = rank 2 of the 4 non-null values

    approx = {
        r["pct"]: r["q"]
        for r in group_quantiles(df, "v", ["g"], (50,), approx=True).collect()
    }
    assert approx == {50: 2}


def test_group_quantiles_schema_consistent_and_validates_pcts(spark):
    from pyspark.sql import Row

    from genpipe_spark.operators.quantile import group_quantiles

    df = spark.createDataFrame([Row(g="a", v=i) for i in range(1, 11)])
    exact = group_quantiles(df, "v", ["g"], (1, 100))
    approx = group_quantiles(df, "v", ["g"], (1, 100), approx=True)
    assert exact.schema["pct"].dataType == approx.schema["pct"].dataType
    # pct=1 maps to rank ceil(n/100) >= 1 -> the min; pct=100 -> the max
    got = {r["pct"]: r["q"] for r in exact.collect()}
    assert got == {1: 1, 100: 10}

    for bad in [(0,), (101,), (50, 0)]:
        with pytest.raises(ValueError):
            group_quantiles(df, "v", ["g"], bad)


def test_group_quantiles_prereduce_matches_row_level(spark):
    """r12: prereduce=True (value-count pre-aggregation, guide §2.3)
    must pick the IDENTICAL nearest-rank value as the row-level path —
    including heavy ties, multiple groups, NULLs, and pcts whose
    target ranks land at tie-run boundaries."""
    import random

    from pyspark.sql import Row

    from genpipe_spark.operators.quantile import group_quantiles

    rng = random.Random(12)
    rows = [
        Row(g=g, v=rng.choice([None, 1, 2, 2, 2, 3, 5, 5, 8, 13]))
        for g in ("a", "b", "c")
        for _ in range(rng.randint(1, 97))
    ]
    df = spark.createDataFrame(rows)
    pcts = (1, 25, 50, 75, 99, 100)
    row_level = {
        (r["g"], r["pct"]): r["q"]
        for r in group_quantiles(df, "v", ["g"], pcts).collect()
    }
    pre = {
        (r["g"], r["pct"]): r["q"]
        for r in group_quantiles(
            df, "v", ["g"], pcts, prereduce=True
        ).collect()
    }
    assert pre == row_level and len(pre) == 3 * len(pcts)


# ------------------------------------------------- AQE skew-join (interval)

def test_interval_join_aqe_splits_hot_bin(spark):
    """Proof of the docstring claim (operators/interval.py): the banded
    equi-join's pile-up bins are handled by AQE's skew-join split — the
    capability the reference's fixed BinPartitioner lacked. A fixture
    with one pathologically hot bin must (a) plan the final join as
    SortMergeJoin(skew=true), (b) split the hot shuffle partition into
    multiple PartialReducerPartitionSpec reads, (c) with within-2x size
    balance across the splits, and (d) still produce exactly the rows
    the broadcast range-join form produces."""
    from genpipe_spark.operators.interval import interval_join

    W = 10_000
    saved = {
        k: spark.conf.get(k, None)
        for k in [
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    try:
        # scale AQE's skew thresholds down to fixture size (defaults are
        # 256MB-class); factor 2 = "hot if 2x median", same shape as prod
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # 200k points pile into bin 0; 2k spread over bins 1..100
        pts = spark.range(200_000).select((F.col("id") % W).alias("p")).unionAll(
            spark.range(2_000).select((W + (F.col("id") * 487) % (100 * W)).alias("p"))
        )
        ivs = spark.createDataFrame(
            [(i * W // 8, (i + 1) * W // 8, f"iv{i}") for i in range(8)]
            + [(W * 3, W * 50, "wide")],
            "lo long, hi long, iv string",
        )
        out = interval_join(pts, ivs, "p", "lo", "hi", band_width=W)
        n_rows = out.count()

        got = interval_join(pts, ivs, "p", "lo", "hi", band_width=W)
        got.collect()
        plan = got._jdf.queryExecution().executedPlan()
        s = plan.toString()
        assert "isFinalPlan=true" in s
        assert "SortMergeJoin(skew=true)" in s, s[:800]
        assert "AQEShuffleRead coalesced and skewed" in s

        # walk the final adaptive plan (QueryStageExec wraps its subtree
        # in .plan(), not .children()) to the skewed shuffle read
        def walk(node, acc):
            acc.append(node)
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i), acc)
            if "QueryStageExec" in node.getClass().getSimpleName():
                walk(node.plan(), acc)
            return acc

        split_sizes = []
        for nd in walk(plan.executedPlan(), []):
            if nd.getClass().getSimpleName() != "AQEShuffleReadExec":
                continue
            specs = nd.partitionSpecs()
            for i in range(specs.size()):
                sp = specs.apply(i)
                if sp.getClass().getSimpleName() == "PartialReducerPartitionSpec":
                    split_sizes.append(sp.dataSize())
        assert len(split_sizes) >= 2, "hot bin was not split"
        assert max(split_sizes) <= 2 * min(split_sizes), split_sizes

        # semantics unchanged: same row count as the broadcast range-join
        oracle_n = interval_join(
            pts, ivs, "p", "lo", "hi", broadcast_intervals=True
        ).count()
        assert n_rows == oracle_n
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ------------------------------------------------------------ PII redact

def test_pii_redact_patterns_and_counts(spark):
    from pyspark.sql import Row

    from genpipe_spark.operators.text import pii_redact

    rows = [
        Row(doc_id=0, text="contact bob.smith+x@example.co.uk or +1 (555) 123-4567 now"),
        Row(doc_id=1, text="server at 10.0.255.7 responded"),
        Row(doc_id=2, text="no personal data here"),
    ]
    out = {r["doc_id"]: r for r in pii_redact(spark.createDataFrame(rows)).collect()}

    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1
    assert "<EMAIL>" in out[0]["redacted"] and "<PHONE>" in out[0]["redacted"]
    assert "@" not in out[0]["redacted"]
    assert out[1]["n_ipv4"] == 1 and "<IPV4>" in out[1]["redacted"]
    assert out[2]["redacted"] == rows[2].text
    assert out[2]["n_email"] == out[2]["n_phone"] == out[2]["n_ipv4"] == 0


def test_bm25_topk_ranks_relevant_docs_first(spark):
    from pyspark.sql import Row

    from genpipe_spark.operators.text import bm25_topk

    corpus = spark.createDataFrame(
        [
            Row(doc_id=0, text="spark spark spark engine"),
            Row(doc_id=1, text="spark is one word here among many other words padding"),
            Row(doc_id=2, text="entirely unrelated content"),
        ]
    )
    queries = spark.createDataFrame([Row(query_id=0, qtext="spark")])
    got = bm25_topk(corpus, queries, k=2).collect()
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [0, 1]
    assert all(r["query_id"] == 0 for r in got)


def test_bm25_topk_consistent_with_fixed_term_scores(spark):
    """bm25_topk with a single-query table must reproduce bm25_scores'
    scores for the same terms (top-k truncation aside)."""
    from pyspark.sql import Row

    from genpipe_spark.operators.text import bm25_scores, bm25_topk

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    terms = ["spark", "merge", "window"]
    fixed = {
        r["doc_id"]: r["score"] for r in bm25_scores(docs, terms).collect()
    }
    queries = spark.createDataFrame([Row(query_id=0, qtext=" ".join(terms))])
    multi = bm25_topk(docs, queries, k=len(fixed) + 10).collect()
    assert {r["doc_id"]: r["score"] for r in multi} == fixed


# -------------------------------------------------- incremental dedup

def test_incremental_dedup_matches_exact_and_keeps_survivors(spark, docs):
    """Pairs from the index-based incremental path == the exact-Jaccard
    pair set restricted to pairs touching the batch; survivors are
    exactly the batch docs with no such pair; a precomputed index gives
    identical results to on-the-fly indexing."""
    from genpipe_spark.operators.dedup import (
        incremental_dedup_keep,
        incremental_minhash_pairs,
        minhash_index,
        ngram_jaccard_pairs,
    )

    new = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)

    exact = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    want = set()
    for r in exact:
        a, b = r["id_a"], r["id_b"]
        if b % 10 == 0:
            want.add((b, a))
        elif a % 10 == 0:
            want.add((a, b))

    got_fly = {
        (r["id_new"], r["id_match"])
        for r in incremental_minhash_pairs(new, corpus, threshold=0.5).collect()
    }
    assert got_fly == want and want

    idx = minhash_index(corpus)
    got_idx = {
        (r["id_new"], r["id_match"])
        for r in incremental_minhash_pairs(
            new, corpus, corpus_index=idx, threshold=0.5
        ).collect()
    }
    assert got_idx == want

    kept = {
        r["doc_id"]
        for r in incremental_dedup_keep(new, corpus, corpus_index=idx).collect()
    }
    new_ids = {r["doc_id"] for r in new.collect()}
    losers = {p[0] for p in want}
    assert kept == new_ids - losers


def test_compact_parquet_small_files(spark, tmp_path):
    """Many tiny files -> the size-targeted file count, same rows; the
    z-order variant keeps second-dimension bounds tight through the
    compaction."""
    import glob

    from genpipe_spark.operators.layout import compact_parquet

    df = spark.range(50_000).select(
        "id", (F.col("id") * 7919 % 1000).alias("x"), (F.col("id") % 997).alias("y")
    )
    src = str(tmp_path / "fragmented")
    df.repartition(64).write.parquet(src)  # 64 tiny files
    assert len(glob.glob(f"{src}/part-*.parquet")) == 64

    total = sum(
        len(open(f, "rb").read()) for f in glob.glob(f"{src}/part-*.parquet")
    )
    # leftovers from a crashed write inside a HIDDEN directory must not
    # count toward the byte total (ADVICE r4: skip by path component,
    # not basename) — plant one as large as the real data
    import os
    import shutil

    os.makedirs(f"{src}/_temporary/0/task_1", exist_ok=True)
    real = glob.glob(f"{src}/part-*.parquet")[0]
    shutil.copy(real, f"{src}/_temporary/0/task_1/part-crashed.parquet")
    with open(f"{src}/_temporary/0/task_1/junk.bin", "wb") as fh:
        fh.write(b"\0" * total)
    target = total // 4  # aim for ~4 files
    dest = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dest, target_file_bytes=target)
    files = glob.glob(f"{dest}/part-*.parquet")
    assert len(files) == n <= 6
    assert spark.read.parquet(dest).count() == 50_000

    zdest = str(tmp_path / "compact_z")
    compact_parquet(spark, src, zdest, target_file_bytes=total // 8, zcols=["x", "y"])
    back = spark.read.parquet(zdest)
    assert back.count() == 50_000
    # z-compacted files have bounded y-ranges (not the full 0..996 span)
    spans = [
        spark.read.parquet(f).agg(F.max("y") - F.min("y")).first()[0]
        for f in glob.glob(f"{zdest}/part-*.parquet")
    ]
    assert sum(spans) / len(spans) < 900


def test_profile_table_modes(spark):
    from genpipe_spark.operators.profile import profile_table

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    cols = ("l_orderkey", "l_returnflag")
    exact = {r["column"]: r for r in profile_table(li, cols, approx_distinct=False).collect()}
    approx = {r["column"]: r for r in profile_table(li, cols).collect()}
    assert exact["l_returnflag"]["n_distinct"] == 3
    assert exact["l_returnflag"]["n_nulls"] == 0
    # HLL estimate within 5% of exact for every profiled column
    for c in cols:
        e, a = exact[c]["n_distinct"], approx[c]["n_distinct"]
        assert abs(a - e) <= max(1, 0.05 * e), (c, e, a)
        assert approx[c]["min_str"] == exact[c]["min_str"]
    # the DEFAULT mode plans without Expand (single combinable agg)
    plan = profile_table(li, cols)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_gapfill_spine_is_dense_and_matches_sparse_agg(spark):
    """Every group's bucket series is contiguous from its first to last
    event (rows == span), zero-filled buckets only where the sparse agg
    has no row, and non-empty buckets carry the sparse agg's exact
    values; value_locf is never null and equals value_sum on non-empty
    buckets."""
    from genpipe_spark.operators.timegrid import time_bucket_gapfill

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    from genpipe_spark.tables import load

    ev = load(spark, SF_SMALL, "events")
    out = time_bucket_gapfill(ev, by=("user_id",), bucket_s=3600).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    width = 3600 * 1_000_000
    for user, rows in by_user.items():
        starts = sorted(r["bucket_start_us"] for r in rows)
        assert starts == list(range(starts[0], starts[-1] + width, width)), user
        for r in rows:
            assert r["value_locf"] is not None
            if r["n_events"] > 0:
                assert r["value_locf"] == r["value_sum"]
            else:
                assert r["value_sum"] == 0.0


def test_incremental_dedup_resubmitted_doc_no_double_pairs(spark):
    """A doc id present in BOTH corpus and batch (re-submission) must
    not double its pairs through the two-sided shingle lookup."""
    from pyspark.sql import Row

    from genpipe_spark.operators.dedup import incremental_minhash_pairs

    text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text=text), Row(doc_id=2, text="totally different words here")]
    )
    new = spark.createDataFrame(
        [Row(doc_id=1, text=text), Row(doc_id=10, text=text)]
    )
    got = incremental_minhash_pairs(new, corpus, threshold=0.5).collect()
    keys = [(r["id_new"], r["id_match"]) for r in got]
    assert len(keys) == len(set(keys))  # no duplicated pair rows
    assert set(keys) == {(1, 1), (10, 1)}  # self-resubmission + its dup


def test_gapfill_span_guard_trips_on_corrupt_timestamp(spark):
    from pyspark.sql import Row

    from genpipe_spark.operators.timegrid import time_bucket_gapfill

    import datetime as dt

    rows = [
        Row(user_id=1, ts=dt.datetime(2024, 1, 1, 10), value=1.0),
        Row(user_id=1, ts=dt.datetime(1970, 1, 1, 0), value=2.0),  # corrupt
    ]
    df = spark.createDataFrame(rows)
    out = time_bucket_gapfill(df, by=("user_id",), bucket_s=3600,
                              max_buckets_per_group=1000)
    with pytest.raises(Exception, match="max_buckets_per_group"):
        out.collect()


def test_gapfill_floor_divides_pre_epoch_timestamps(spark):
    """Negative unix_micros must floor into the earlier bucket, matching
    DuckDB's // semantics — Spark's bare DIV truncates toward zero and
    would put 23:30 on 1969-12-31 into bucket 0 instead of -1
    (ADVICE r4)."""
    from pyspark.sql import Row

    from genpipe_spark.operators.timegrid import time_bucket_gapfill

    import datetime as dt

    rows = [
        Row(user_id=1, ts=dt.datetime(1969, 12, 31, 23, 30), value=1.0),
        Row(user_id=1, ts=dt.datetime(1970, 1, 1, 0, 30), value=2.0),
    ]
    out = time_bucket_gapfill(
        spark.createDataFrame(rows), by=("user_id",), bucket_s=3600
    ).collect()
    got = {r["bucket_start_us"]: r["n_events"] for r in out}
    assert got == {-3_600_000_000: 1, 0: 1}


def test_parse_byte_string_suffixes():
    """widen() must accept every human-readable maxPartitionBytes form a
    session/spark-defaults may carry (ADVICE r4) and never raise at plan
    time."""
    from genpipe_spark.queries.common import parse_byte_string

    assert parse_byte_string("134217728b") == 134217728
    assert parse_byte_string("134217728") == 134217728
    assert parse_byte_string("128m") == 128 * 1024 * 1024
    assert parse_byte_string("64MB") == 64 * 1024 * 1024
    assert parse_byte_string("1g") == 1 << 30
    assert parse_byte_string(" 512k ") == 512 * 1024
    assert parse_byte_string("1t") == 1 << 40
    # unrecognizable input falls back instead of failing the query
    assert parse_byte_string("garbage") == 134217728
    assert parse_byte_string("") == 134217728


def test_weighted_sample_favors_heavy_rows_and_is_deterministic(spark):
    from genpipe_spark.operators.mixing import weighted_sample

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    s1 = weighted_sample(docs, "n_chars", 50).collect()
    s2 = weighted_sample(docs, "n_chars", 50).collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)

    pop_mean = docs.agg(F.avg("n_chars")).first()[0]
    samp_mean = sum(r["n_chars"] for r in s1) / len(s1)
    assert samp_mean > pop_mean  # weight-proportional inclusion

    zero_w = weighted_sample(
        docs.withColumn("w0", F.lit(0)), "w0", 10
    ).collect()
    assert zero_w == []  # non-positive weights never qualify


# ---------------------------------------------------------- reshape

def test_pivot_explicit_and_unpivot(spark):
    from genpipe_spark.operators.reshape import pivot_explicit, unpivot
    from pyspark.sql import functions as F
    import pytest

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("a", "x", 4)],
        "g string, k string, v bigint",
    )
    wide = pivot_explicit(df, ["g"], "k", ["x", "y", "z"], F.sum("v"))
    rows = {r["g"]: (r["x"], r["y"], r["z"]) for r in wide.collect()}
    # absent combination (b,y) and absent category z come back NULL, and
    # a typo'd category is an all-NULL column, not a schema surprise
    assert rows == {"a": (5, 2, None), "b": (3, None, None)}
    long = unpivot(wide, ["g"], ["x", "y", "z"], "k", "v")
    back = {(r["g"], r["k"]): r["v"] for r in long.collect() if r["v"] is not None}
    assert back == {("a", "x"): 5, ("a", "y"): 2, ("b", "x"): 3}
    # unpivot is a pure projection: no shuffle in the plan
    plan = long._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("HashAggregate")[0]
    with pytest.raises(ValueError):
        pivot_explicit(df, ["g"], "k", [], F.sum("v"))


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    from genpipe_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame(
        [("low low low lower",), ("newest newest",)], "text string"
    )
    got = {r["pair"]: r["freq"] for r in bpe_pair_counts(df).collect()}
    # 'lo'/'ow' appear in low (x3) and lower (x1) -> 4; 'we' in lower(1)
    # + newest(2) -> 3; single-char words contribute nothing
    assert got["lo"] == 4 and got["ow"] == 4
    assert got["we"] == 3
    assert got["es"] == 2 and got["st"] == 2


def test_histogram_quantiles_within_bin_width_of_exact(spark):
    from genpipe_spark.operators.quantile import (
        group_quantiles,
        histogram_group_quantiles,
    )
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    li = load(spark, SF_SMALL, "lineitem")
    exact = {
        (r["l_returnflag"], r["pct"]): float(r["q"])
        for r in group_quantiles(
            li, "l_quantity", ["l_returnflag"], pcts=(25, 50, 75, 99)
        ).collect()
    }
    est = {
        (r["l_returnflag"], r["pct"]): r["q_est"]
        for r in histogram_group_quantiles(
            li, "l_quantity", ["l_returnflag"], 0.0, 50.0, nbins=25,
            pcts=(25, 50, 75, 99),
        ).collect()
    }
    assert set(est) == set(exact)
    width = 50.0 / 25
    for k, q in est.items():
        assert abs(q - exact[k]) <= width + 1e-9, (k, q, exact[k])


def test_histogram_quantiles_validation(spark):
    import pytest

    from genpipe_spark.operators.quantile import histogram_group_quantiles

    df = spark.createDataFrame([(1.0, "a")], "x double, g string")
    with pytest.raises(ValueError):
        histogram_group_quantiles(df, "x", ["g"], 1.0, 0.0, 4)
    with pytest.raises(ValueError):
        histogram_group_quantiles(df, "x", ["g"], 0.0, 1.0, 4, pcts=(0,))


def test_edit_distance_pairs_exact_recall_across_bands(spark):
    from genpipe_spark.operators.fuzzy import edit_distance_pairs
    import pytest

    # lengths straddle a band boundary (w=3: len 5 -> band 1, len 6+ -> band 2)
    rows = [(1, "abcde"), (2, "abcdef"), (3, "abcdxx"), (4, "zzzzzzzzzz"), (5, None)]
    df = spark.createDataFrame(rows, "id bigint, name string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_pairs(df, "id", "name", max_dist=2).collect()}
    # (1,2): one insertion across the band boundary; (2,3): two
    # substitutions; (1,3): sub+insert = 2; NULL name excluded
    assert got == {(1, 2): 1, (1, 3): 2, (2, 3): 2}
    plan = edit_distance_pairs(df, "id", "name", 2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "id", "name", 0)


def test_edit_distance_blocking_col_narrows(spark):
    from genpipe_spark.operators.fuzzy import edit_distance_pairs

    rows = [(1, "abc", "x"), (2, "abd", "x"), (3, "abe", "y")]
    df = spark.createDataFrame(rows, "id bigint, name string, cat string")
    got = {(r["id_a"], r["id_b"])
           for r in edit_distance_pairs(df, "id", "name", 2, blocking_col="cat").collect()}
    assert got == {(1, 2)}  # cross-category pair (1,3)/(2,3) blocked by design


def test_global_row_number_no_single_partition_window(spark):
    from genpipe_spark.operators.relational import global_row_number
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        (F.col("id") * 37 % 10_000).alias("k"), F.col("id").alias("payload")
    ).repartition(8)
    out = global_row_number(df, ["k"], alias="rn")
    rows = sorted((r["k"], r["rn"]) for r in out.collect())
    # dense 1..n in key order
    assert [rn for _, rn in rows] == list(range(1, 10_001))
    # the plan must NOT contain an empty-frame global Window (the
    # single-reducer shape); partition-local windows keyed by __pid are
    # the whole point
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partitionBy=[__pid" in plan.replace(" ", "") or "__pid" in plan


def test_kcore_known_graph(spark):
    """Triangle + pendant tail: the 2-core is exactly the triangle
    (pendant peels, which drops nothing else); the 3-core is empty; a
    max_rounds too small to reach the fixpoint raises instead of
    returning a half-peeled graph. Also: a longer tail exercises a
    multi-round cascade (each peel exposes the next node)."""
    import pytest as _pytest

    from genpipe_spark.operators.graph import kcore

    # triangle 1-2-3 plus chain 3-4-5-6 (peels over 3 cascading rounds)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)], "a: long, b: long"
    )
    got = {(r["node"], r["core_deg"]) for r in kcore(edges, k=2).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}
    assert kcore(edges, k=3).count() == 0
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        kcore(edges, k=2, max_rounds=1)


def test_bucket_checksum_detects_single_cell_change(spark):
    """One flipped payload value changes exactly its own bucket's
    (sum, xor) and nothing else; NULL payloads fold as the sentinel so
    NULL vs 0 differ; negative keys bucket via pmod (never negative)."""
    from genpipe_spark.operators.cdc import bucket_checksum

    # -7: negative key (pmod); None-key row: NULL bucket would never
    # equi-join — must land in an ordinary bucket on BOTH sides
    rows = [(i, i % 5, i * 10) for i in range(1, 41)] + [
        (-7, None, 0), (None, 3, 5)]
    a = spark.createDataFrame(rows, "k: long, g: long, v: long")
    b = spark.createDataFrame(
        [(k, g, v + 1 if k == 9 else v) for k, g, v in rows],
        "k: long, g: long, v: long",
    )
    ca = {r["bucket"]: r for r in bucket_checksum(
        a, ["k"], ["g", "v"], n_buckets=8).collect()}
    cb = {r["bucket"]: r for r in bucket_checksum(
        b, ["k"], ["g", "v"], n_buckets=8).collect()}
    assert set(ca) == set(cb) and all(0 <= bk < 8 for bk in ca)
    changed = [bk for bk in ca
               if (ca[bk]["sum_sig"], ca[bk]["xor_sig"])
               != (cb[bk]["sum_sig"], cb[bk]["xor_sig"])]
    assert changed == [9 % 8]
    assert all(ca[bk]["n_rows"] == cb[bk]["n_rows"] for bk in ca)
    # NULL folds as the sentinel, distinct from an explicit zero
    n0 = spark.createDataFrame([(1, None, 2)], "k: long, g: long, v: long")
    z0 = spark.createDataFrame([(1, 0, 2)], "k: long, g: long, v: long")
    s_null = bucket_checksum(n0, ["k"], ["g", "v"]).collect()[0]["sum_sig"]
    s_zero = bucket_checksum(z0, ["k"], ["g", "v"]).collect()[0]["sum_sig"]
    assert s_null != s_zero


def test_ivfpq_recall_vs_exact_l2(spark):
    """IVF-PQ (cells + codes + exact refine) against numpy exact-L2
    ground truth on the same quantized ints. The synthetic embeddings
    are near-isotropic — the honest recall ceiling is low (the
    candidate-set ceiling at nprobe=3 is ~0.6 here); the gate pins the
    floor AND that results are a subset of the probed construction
    (every neighbor differs from its query, ranks dense from 1)."""
    import numpy as np

    from genpipe_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()
    rows = emb.collect()
    V = {
        r["vec_id"]: np.floor(
            np.array(r["embedding"], dtype=np.float64) * 10000 + 0.5
        ).astype(np.int64)
        for r in rows
    }
    qids = [i for i in V if i % 97 == 0]
    exact = {
        qi: {
            v
            for _, v in sorted(
                (int(((V[qi] - V[v]) ** 2).sum()), v) for v in V if v != qi
            )[:5]
        }
        for qi in qids
    }
    out = ivfpq_topk(emb, emb.where(F.col("vec_id") % 97 == 0)).collect()
    approx, ranks = {}, {}
    for r in out:
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        ranks.setdefault(r["query_id"], []).append(r["rank"])
        assert r["neighbor_id"] != r["query_id"]
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())
    recalls = [len(exact[q] & approx.get(q, set())) / 5 for q in qids]
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_common_neighbors_star_plus_path(spark):
    """Star center 0 with leaves 1..3 plus edge 1-2: leaves share hub
    0, so every leaf pair is a candidate EXCEPT 1-2 (already adjacent
    — anti-joined away). Jaccard in exact millionths; reversed
    duplicate edges must not inflate counts."""
    from genpipe_spark.operators.graph import common_neighbors

    e = [(0, 1), (0, 2), (0, 3), (1, 2)]
    edges = spark.createDataFrame(
        e + [(b, a) for a, b in e], "src: long, dst: long"
    )
    got = {
        (r["u"], r["w"], r["common"], r["du"], r["dw"], r["jaccard_micro"])
        for r in common_neighbors(edges).collect()
    }
    # 1-3: common {0}; du=2 (0,2), dw=1 (0) -> 1e6*1 div (2+1-1) = 500000
    # 2-3: symmetric.  1-2 adjacent -> excluded.
    assert got == {(1, 3, 1, 2, 1, 500_000), (2, 3, 1, 2, 1, 500_000)}


def test_common_neighbors_center_degree_cap(spark):
    """max_center_degree drops wedges CENTERED on super-hubs (hubs
    still appear as endpoints): with hub 0 (degree 3) capped out, the
    leaf pairs 1-2/1-3/2-3 lose their shared center and only wedges
    through low-degree centers survive. min_common=2 also exercised."""
    from genpipe_spark.operators.graph import common_neighbors

    # hub 0 - leaves 1,2,3; plus 1-4, 2-4 (4 is a second shared
    # neighbor for pair 1-2 only)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 4), (2, 4)], "src: long, dst: long"
    )
    capped = common_neighbors(edges, max_center_degree=2).collect()
    # centers 1 and 2 (deg 2) each close the 0-4 pair; center 4 closes 1-2
    assert {(r["u"], r["w"], r["common"]) for r in capped} == {
        (0, 4, 2),
        (1, 2, 1),
    }
    two = common_neighbors(edges, min_common=2).collect()
    assert {(r["u"], r["w"], r["common"]) for r in two} == {
        (0, 4, 2),
        (1, 2, 2),
    }


def test_skyline_2d_known_points(spark):
    """(1,5) (2,3) (3,3) (4,1) (4,4) (1,5)dup: frontier is (1,5),
    (2,3), (4,1) — (3,3) loses to (2,3) (equal y, smaller x), (4,4)
    loses to (2,3) outright; the duplicate (1,5) row survives twice
    (identical points never dominate). NULLs drop."""
    from genpipe_spark.operators.relational import skyline_2d

    df = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 3), (4, 1), (4, 4), (1, 5), (None, 0), (0, None)],
        "x: long, y: long",
    )
    got = sorted((r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect())
    assert got == [(1, 5), (1, 5), (2, 3), (4, 1)]


def test_center_l2_normalize_known_and_ragged(spark):
    """Two 2-D vectors symmetric about their mean: centered values are
    +/-(delta*n) which normalize to +/-unit components; a ragged third
    vector must abort via the per-dim coverage assert."""
    import pytest
    from genpipe_spark.operators.similarity import center_l2_normalize

    df = spark.createDataFrame(
        [(1, [1.0, 3.0]), (2, [3.0, 1.0])],
        "vec_id: long, embedding: array<float>",
    )
    got = {r["vec_id"]: r["unit_micro"] for r in center_l2_normalize(df).collect()}
    # centered (scaled by n=2): v1 -> (-2e6, +2e6), v2 -> (+2e6, -2e6);
    # each normalizes to (∓707107, ±707107) (1/sqrt(2) micros, half-up)
    assert got[1] == [-707106, 707107] or got[1] == [-707107, 707107]
    assert got[2][0] == -got[1][0] and got[2][1] == -got[1][1]

    ragged = spark.createDataFrame(
        [(1, [1.0, 3.0]), (2, [3.0])],
        "vec_id: long, embedding: array<float>",
    )
    with pytest.raises(Exception, match="ragged dimensionality"):
        center_l2_normalize(ragged).collect()


def test_winsorize_known_group(spark):
    """Ten values 1..10 in one group at P20-P80: bounds are the exact
    nearest-rank elements 2 and 8; 1 clips up, 9/10 clip down, NULL
    passes through unflagged."""
    from genpipe_spark.operators.quantile import winsorize

    df = spark.createDataFrame(
        [("g", v) for v in range(1, 11)] + [("g", None)], "g: string, x: long"
    )
    rows = {r["x"]: (r["x_wins"], r["clipped"])
            for r in winsorize(df, "x", ["g"], 20, 80).collect()}
    assert rows[1] == (2, True)
    assert rows[2] == (2, False)
    assert rows[8] == (8, False)
    assert rows[9] == (8, True)
    assert rows[10] == (8, True)
    assert rows[None] == (None, None)


def test_rake_keywords_known_doc(spark):
    """'deep learning of deep networks' with stopword 'of': phrases
    are 'deep learning' and 'deep networks'. deep: freq 2, degree 4
    (two 2-token phrases) -> 2e6; learning/networks: freq 1 degree 2
    -> 2e6; each phrase scores 4e6."""
    from genpipe_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "Deep learning of deep networks")], "doc_id: long, text: string"
    )
    got = sorted(
        (r["phrase"], r["n_words"], r["score_micro"])
        for r in rake_keywords(df).collect()
    )
    assert got == [
        ("deep learning", 2, 4_000_000),
        ("deep networks", 2, 4_000_000),
    ]


def test_km_survival_textbook_example(spark):
    """Hand-computed product-limit curve with censoring interleaved:
    subjects exit at t=1 (event), 2 (censor), 3 (event x2), 4
    (censor). S = .8, .8, .8*(1/3), unchanged."""
    from pyspark.sql import Row

    from genpipe_spark.operators.survival import km_survival

    subj = spark.createDataFrame(
        [
            Row(g=1, dur=1, obs=1),
            Row(g=1, dur=2, obs=0),
            Row(g=1, dur=3, obs=1),
            Row(g=1, dur=3, obs=1),
            Row(g=1, dur=4, obs=0),
        ]
    )
    got = {
        r["dur"]: (r["n_risk"], r["n_event"], r["n_censor"], r["surv_micro"])
        for r in km_survival(subj, ["g"], "dur", "obs").collect()
    }
    assert got == {
        1: (5, 1, 0, 800000),
        2: (4, 0, 1, 800000),
        3: (3, 2, 0, 266666),
        4: (1, 0, 1, 266666),
    }


def test_keyed_scan_state_carries_across_arrow_batches(spark):
    """The boundary-reset mapInPandas scans must CONTINUE a key whose
    rows straddle an Arrow batch edge (state is per-partition-stream,
    reset only on key change) — pinned by forcing 3-row batches."""
    from pyspark.sql import Row

    from genpipe_spark.operators.statescan import capped_running_sum

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "3")
    try:
        rows = [Row(k=1, s=i, d=5) for i in range(20)] + [
            Row(k=2, s=i, d=-3) for i in range(20)
        ]
        out = {
            (r["k"], r["s"]): (r["rn"], r["bal"])
            for r in capped_running_sum(
                spark.createDataFrame(rows), ["k"], ["s"], "d", lo=0, hi=30
            ).collect()
        }
        assert all(
            out[(1, i)] == (i + 1, min(30, 5 * (i + 1))) for i in range(20)
        )
        assert all(out[(2, i)] == (i + 1, 0) for i in range(20))
    finally:
        spark.conf.set(key, old)


def test_asof_join_nearest(spark):
    """direction='nearest' (pandas merge_asof's third direction): min
    |gap| either way; equal-ts rows resolve through the backward leg
    (distance 0); equal nonzero distance prefers backward; tolerance
    applies per candidate BEFORE the pick."""
    from genpipe_spark.operators.asof import asof_join

    left, right = _asof_fixture(spark)
    # t=22 sits exactly between the t=20 and t=24 right rows (tie)
    left = left.unionByName(
        spark.createDataFrame([(1, 22, 103)], "k long, ts long, lid long")
        .select("k", F.timestamp_seconds("ts").alias("ts"), "lid")
    )

    def run(**kw):
        out = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rid", "rv"], tiebreak="rid",
            direction="nearest", **kw,
        )
        return {r["lid"]: r["rid"] for r in out.collect()}

    # 100: bwd d=5 beats fwd d=10; 101: equal-ts 902 (d=0);
    # 102: bwd 903 d=1 beats nothing-forward; 103: TIE d=2 -> backward
    assert run() == {100: 900, 101: 902, 102: 903, 103: 902, 200: None}
    # tolerance prunes each leg independently: at 1s, 103 loses both
    # candidates (d=2), 102 keeps its d=1 backward match
    assert run(tolerance_s=1.0) == {
        100: None, 101: 902, 102: 903, 103: None, 200: None,
    }


def test_time_bucket_interpolate_hull_edges(spark):
    """Linear gapfill: interior gaps lerp exactly (floor micro-dollars),
    single-bucket hulls degenerate to the known value, and buckets
    outside the known hull stay NULL (no extrapolation)."""
    from genpipe_spark.operators.timegrid import time_bucket_interpolate

    rows = [
        # user 1: known at buckets 0 and 3 (values 100 and 400 cents)
        (1, 0, 1.0), (1, 3 * 3600, 4.0),
        # user 2: a single event — hull is one bucket
        (2, 7200, 9.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, sec long, value double")
    out = time_bucket_interpolate(
        df.select(
            "user_id", F.timestamp_seconds("sec").alias("ts"), "value"
        ),
        ts_col="ts", value_col="value", by=("user_id",), bucket_s=3600,
    )
    got = {
        (r["user_id"], r["bucket_start_us"] // 3_600_000_000): (
            r["n_events"], r["cents_known"], r["interp_micro"]
        )
        for r in out.collect()
    }
    # user 1: 100 -> 400 cents over 3 buckets = +100 cents/bucket;
    # micro-dollars = cents * 10_000
    assert got[(1, 0)] == (1, 100, 1_000_000)
    assert got[(1, 1)] == (0, None, 2_000_000)
    assert got[(1, 2)] == (0, None, 3_000_000)
    assert got[(1, 3)] == (1, 400, 4_000_000)
    assert got[(2, 2)] == (1, 900, 9_000_000)
    assert len(got) == 5  # dense hulls only; nothing outside


def test_point_in_polygon_concave_and_boundary_grid(spark):
    """Ray casting against the concave L: points in the notch are OUT,
    points in both arms are IN, and a polygon spanning multiple grid
    cells still emits each pair exactly once (no dedup pass)."""
    from genpipe_spark.operators.spatial import point_in_polygon_join

    # L-shape: (0,0)-(60,0)-(60,40)-(40,40)-(40,20)-(0,20)
    polys = spark.createDataFrame(
        [(7, [{"x": x, "y": y} for x, y in
              [(0, 0), (60, 0), (60, 40), (40, 40), (40, 20), (0, 20)]])],
        "poly_id bigint, vertices array<struct<x:long,y:long>>",
    )
    pts = spark.createDataFrame(
        [
            (1, 10, 10),   # lower arm: IN
            (2, 50, 30),   # right arm: IN
            (3, 10, 30),   # the notch: OUT
            (4, 70, 10),   # right of bbox: OUT
            (5, 41, 21),   # just inside the inner corner: IN
        ],
        "pid long, px long, py long",
    )
    # cell=16 forces the polygon across multiple grid cells
    out = point_in_polygon_join(
        pts, polys, px="px", py="py", cell=16
    ).collect()
    assert sorted(r["pid"] for r in out) == [1, 2, 5]
    assert all(r["poly_id"] == 7 for r in out)
    assert len(out) == len({r["pid"] for r in out})  # exactly-once


def test_lttb_proper_short_series_identity_and_spike(spark):
    """lttb_downsample edge semantics: a series shorter than k keeps
    EVERY point (degenerate buckets); n=1 and n=2 keys emit exactly
    their endpoints; and on a flat series with one spike the spike's
    bucket pick IS the spike (the LTTB shape-preservation property)."""
    from genpipe_spark.operators.timegrid import lttb_downsample

    rows = []
    # key 1: n=1; key 2: n=2; key 3: n=5 < k=5? use k=5, n=4 (< k)
    rows.append((1, 10, 100))
    rows.extend([(2, 10, 100), (2, 20, 200)])
    rows.extend([(3, i * 10, i * 7) for i in range(1, 5)])
    # key 4: flat 50-point series with a spike at position 25
    rows.extend(
        [(4, i, 1000 if i != 25 else 99999) for i in range(1, 51)]
    )
    df = spark.createDataFrame(rows, "k long, x long, y long")
    out = lttb_downsample(
        df, keys=["k"], order_cols=["x"], x_col="x", y_col="y", k=5
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append((r["sel_idx"], r["rn"], r["x"], r["y"]))
    assert by_key[1] == [(-1, 1, 10, 100)]
    assert sorted(by_key[2]) == [(-1, 1, 10, 100), (3, 2, 20, 200)]
    # n=4 < k=5: every point survives (identity decimation)
    assert sorted(r[1] for r in by_key[3]) == [1, 2, 3, 4]
    # the spike at x=25 must be selected by its bucket
    assert any(r[2] == 25 and r[3] == 99999 for r in by_key[4])
    # exactly k points for the long series
    assert len(by_key[4]) == 5


def test_markov_removal_known_chain(spark):
    """Hand-checked removal effects: users who click always convert,
    users who view never do — removing 'click' kills all conversion
    (removal = base), removing 'view' changes nothing (removal = 0)."""
    from genpipe_spark.operators.eventflow import markov_removal_attribution

    rows = []
    for u in range(4):  # click -> purchase
        rows += [(u, 1, "click"), (u, 2, "purchase")]
    for u in range(4, 8):  # view -> end (no conversion)
        rows += [(u, 1, "view")]
    df = spark.createDataFrame(rows, "user_id long, seq long, ch string")
    out = {
        r["channel"]: (r["base_micro"], r["removed_micro"], r["removal_micro"])
        for r in markov_removal_attribution(
            df, "user_id", ["seq"], "ch", conv_value="purchase", iters=10
        ).collect()
    }
    # START -> click 0.5 -> CONV 1.0; START -> view 0.5 -> NULL
    assert out["click"] == (500_000, 0, 500_000)
    assert out["view"] == (500_000, 500_000, 0)


def test_isotonic_fit_textbook_and_minimax(spark):
    """PAVA vs the minimax definition on a hand-checked sequence:
    [1, 3, 2, 4] pools (3,2) -> 2.5; [5, 4, 3] pools everything -> 4;
    an already-sorted series is its own fit."""
    from genpipe_spark.operators.statescan import isotonic_fit

    rows = (
        [(1, i + 1, x) for i, x in enumerate([1, 3, 2, 4])]
        + [(2, i + 1, x) for i, x in enumerate([5, 4, 3])]
        + [(3, i + 1, x) for i, x in enumerate([1, 2, 3])]
    )
    df = spark.createDataFrame(rows, "k long, seq long, x long")
    got = {
        (r["k"], r["rn"]): r["fitted_micro"]
        for r in isotonic_fit(df, ["k"], ["seq"], "x").collect()
    }
    assert [got[(1, i)] for i in range(1, 5)] == [
        1_000_000, 2_500_000, 2_500_000, 4_000_000
    ]
    assert [got[(2, i)] for i in range(1, 4)] == [4_000_000] * 3
    assert [got[(3, i)] for i in range(1, 4)] == [
        1_000_000, 2_000_000, 3_000_000
    ]


# ---- duplicate-input doctrine (r8 verdict item 7: the point-in-polygon
# __pid fix generalized — every operator grouping/joining on
# caller-supplied columns must have PINNED duplicate-row semantics)


def test_grid_radius_join_duplicate_rows_multiply(spark):
    """grid_radius_join emits pair MULTIPLICITY: k copies of a point x
    m copies of a center -> k*m matched rows (relational join
    semantics; no hidden dedup, no __pid needed because no groupBy
    collapses caller rows)."""
    from genpipe_spark.operators.spatial import grid_radius_join

    pts = spark.createDataFrame(
        [Row(pid=1, px=0, py=0)] * 2, "pid long, px long, py long"
    )
    ctr = spark.createDataFrame(
        [Row(cid=9, cx=3, cy=4)] * 3, "cid long, cx long, cy long"
    )
    out = grid_radius_join(pts, ctr, "px", "py", "cx", "cy", 5).collect()
    assert len(out) == 6  # 2 x 3
    assert all(r["dist2"] == 25 for r in out)


def test_interval_overlap_stats_duplicate_intervals_count(spark):
    """interval_overlap_stats treats duplicated intervals as distinct
    occupancy: the same [10, 20) twice -> n_intervals 2,
    max_concurrent 2 (the sweep needs no row identity at all)."""
    from genpipe_spark.operators.interval import interval_overlap_stats

    df = spark.createDataFrame(
        [Row(k=1, s=10, e=20)] * 2 + [Row(k=2, s=10, e=20)],
        "k long, s long, e long",
    )
    got = {
        r["k"]: (r["n_intervals"], r["max_concurrent"])
        for r in interval_overlap_stats(df, ["k"], "s", "e").collect()
    }
    assert got == {1: (2, 2), 2: (1, 1)}


def test_edit_distance_pairs_duplicate_rows_multiply(spark):
    """edit_distance_pairs under duplicated input rows: ids are the
    pair identity, so k copies of id_a x m copies of id_b emit the
    pair k*m times (documented precondition: ids unique per logical
    entity; callers wanting set semantics distinct() first)."""
    from genpipe_spark.operators.fuzzy import edit_distance_pairs

    df = spark.createDataFrame(
        [Row(id=1, t="kitten")] * 2 + [Row(id=2, t="sitten")],
        "id long, t string",
    )
    out = edit_distance_pairs(df, "id", "t", max_dist=2).collect()
    assert len(out) == 2  # (1,2) twice — multiplicity, never dropped
    assert all((r["id_a"], r["id_b"], r["dist"]) == (1, 2, 1) for r in out)


def test_bpe_train_matches_reference_bpe(spark):
    """bpe_train == the literal Sennrich get_stats/merge loop: the
    double-space replace() encoding must reproduce greedy
    non-overlapping tuple merges exactly (incl. the 'a a a' self-
    overlap and alternating 'a b a b' cases a single-space encoding
    gets wrong)."""
    from collections import Counter

    from genpipe_spark.operators.text import bpe_train

    texts = [
        "low low low lower lowest new newer",
        "new new newer wider low",
        "aaa abab abab baaa",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(docs, iters=3, top_words=20).collect()
    g_merges = {
        r["k"]: (r["a"], r["b"], r["s"], r["cnt"])
        for r in got if r["part"] == "merge"
    }
    g_words = {
        r["a"]: (r["k"], r["s"], r["cnt"])
        for r in got if r["part"] == "word"
    }
    wf = Counter(w for t in texts for w in t.lower().split())
    syms = {w: list(w) for w in wf}
    for it in range(1, 4):
        pc = Counter()
        for w, ss in syms.items():
            for i in range(len(ss) - 1):
                pc[(ss[i], ss[i + 1])] += wf[w]
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        assert g_merges[it] == (a, b, a + b, c), (it, g_merges[it])
        for w, ss in syms.items():
            out, i = [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == a and ss[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            syms[w] = out
    for rk, w in enumerate(sorted(wf, key=lambda w: (-wf[w], w)), 1):
        assert g_words[w] == (rk, " ".join(syms[w]), wf[w]), w


def test_epoch_shuffle_epochs_are_different_permutations(spark):
    """Each epoch must be a genuinely different order, not a rotation:
    the additive-epoch form shifted every h by the same constant,
    which preserved in-shard sequences almost everywhere (r9
    self-review finding). With the multiplicative form, epoch 0 and
    epoch 1 must disagree on most shards' document sequences (and on
    the shard assignment itself), while each epoch stays a
    permutation: every id exactly once, positions 1..len per shard."""
    from genpipe_spark.operators.mixing import epoch_shuffle

    ids = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    seqs = {}
    for ep in (0, 1):
        rows = epoch_shuffle(ids, epoch=ep, n_shards=8).collect()
        assert len(rows) == 2000
        assert len({r["doc_id"] for r in rows}) == 2000
        by_shard = {}
        for r in sorted(rows, key=lambda r: (r["shard"], r["pos"])):
            by_shard.setdefault(r["shard"], []).append(r["doc_id"])
        for sh, docs in by_shard.items():
            got_pos = sorted(
                r["pos"] for r in rows if r["shard"] == sh
            )
            assert got_pos == list(range(1, len(docs) + 1)), sh
        seqs[ep] = by_shard
    identical = sum(
        1 for sh in seqs[0]
        if seqs[1].get(sh) == seqs[0][sh]
    )
    assert identical == 0, f"{identical} shards replayed the same order"


def test_bpe_train_no_pair_rounds_are_noops(spark):
    """A merge round with no pairs (single-char vocab) must emit no
    merge rule and leave symbolizations unchanged — not null them
    through replace() with a NULL pair (r9 self-review finding)."""
    from genpipe_spark.operators.text import bpe_train

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "c a")], "doc_id long, text string"
    )
    rows = bpe_train(docs, iters=3, top_words=10).collect()
    assert [r for r in rows if r["part"] == "merge"] == []
    words = {r["a"]: r["s"] for r in rows if r["part"] == "word"}
    assert words == {"a": "a", "b": "b", "c": "c"}


def test_kmeans_exact_bit_stable_and_recall(spark):
    """kmeans_centroids_exact (r10 certification path): int64 sum-vector
    centroids must be BIT-IDENTICAL across two independent trainings
    (the property the float-mean variant lacks), cover every cell, and
    the IVF probe built on them must keep the recall floor."""
    from genpipe_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids_exact,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    c1 = kmeans_centroids_exact(emb, num_centroids=8, iters=3)
    c2 = kmeans_centroids_exact(emb, num_centroids=8, iters=3)
    r1 = {r["cent_id"]: list(r["cent_v"]) for r in c1.collect()}
    r2 = {r["cent_id"]: list(r["cent_v"]) for r in c2.collect()}
    assert r1 == r2
    assert len(r1) == 8 and all(len(v) == 64 for v in r1.values())
    # sum vectors are integers exactly representable in double
    assert all(x == float(int(x)) for v in r1.values() for x in v)

    q = emb.where(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, centroids=c1).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.3  # probe-1-cell floor


def test_bpe_learn_routes_identical(spark):
    """The driver-side and distributed BPE merge loops emit IDENTICAL
    merges and final symbolizations (routing is a plan decision,
    invisible to the oracle) — forced via driver_vocab_max=0."""
    from pyspark.sql import Row

    from genpipe_spark.operators.text import _bpe_learn

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(
            ["low lower lowest", "new newer newest", "low low new",
             "wider wide widest low"] * 3
        )]
    )
    wd, md = _bpe_learn(docs, "text", 40)  # driver route
    wx, mx = _bpe_learn(docs, "text", 40, driver_vocab_max=0)  # dist
    assert sorted(map(tuple, md.collect())) == sorted(map(tuple, mx.collect()))
    assert sorted(map(tuple, wd.collect())) == sorted(map(tuple, wx.collect()))


@pytest.mark.parametrize("iters", [1, 2, 3, 5, 6, 7])
def test_harmonic_centrality_doubling_matches_linear(spark, iters):
    """r12 min-plus doubling gate: harmonic_centrality now composes
    D_1 -> D_2 -> D_4 -> ... (+ binary remainder) instead of iters-1
    edge relaxations. The contract is EXACT equality with the linear
    form at the SAME iters — including odd iters, where the remainder
    path runs, and iters=1 (no composition at all). Reference: a
    driver-side BFS capped at `iters` hops over the same undirected
    graph."""
    import collections

    rng_edges = [
        (i * 7 % 23, (i * i + 3) % 23) for i in range(40)
    ] + [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in rng_edges], "src long, dst long"
    )
    from genpipe_spark.operators.graph import harmonic_centrality

    got = {
        r.node: (r.n_reached, r.harmonic_micro)
        for r in harmonic_centrality(edges, iters=iters).collect()
    }
    adj = collections.defaultdict(set)
    for a, b in rng_edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    want = {}
    for s in adj:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, iters + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        reached = {t: d for t, d in dist.items() if t != s}
        if reached:
            want[s] = (
                len(reached),
                sum(1_000_000 // d for d in reached.values()),
            )
    assert got == want


def test_media_fingerprints_match_scalar_reference(spark):
    """r12 vectorization gate: image_ahash / audio_fingerprint run one
    flattened numpy pass per Arrow batch; this pins them against the
    pre-r12 per-row formulas on shapes the synth fixture NEVER makes —
    images wider/taller than the 8x8 grid (many pixels per block),
    constant images (no bit set), and long/1-frame-empty audio —
    so a flattening bug (wrong offsets, wrong slot arithmetic) cannot
    hide behind fixture-only parity."""
    import numpy as np

    from genpipe_spark.functions import codecs
    from genpipe_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprint,
        image_ahash,
    )

    def ref_ahash(payload: bytes) -> tuple[int, int]:
        px = codecs.decode_ppm(payload).astype(np.int64)
        h, w, _ = px.shape
        g3 = px.sum(axis=2)
        ys, xs = np.indices((h, w))
        idx = (ys * 8 // h) * 8 + xs * 8 // w
        bsum = np.zeros(64, dtype=np.int64)
        bcnt = np.zeros(64, dtype=np.int64)
        np.add.at(bsum, idx.ravel(), g3.ravel())
        np.add.at(bcnt, idx.ravel(), 1)
        present = bcnt > 0
        bm = np.zeros(64, dtype=np.int64)
        bm[present] = bsum[present] * 1_000_000 // bcnt[present]
        om = int(bm[present].sum()) // int(present.sum())
        bits = present & (bm > om)
        lo = sum(1 << i for i in range(32) if bits[i])
        hi = sum(1 << i for i in range(32) if bits[32 + i])
        return hi, lo

    def ref_afp(payload: bytes) -> tuple[int, int]:
        _, s = codecs.decode_wav(payload)
        a = np.abs(s.astype(np.int64))
        n = len(a)
        idx = np.arange(n) * 32 // n
        esum = np.zeros(32, dtype=np.int64)
        ecnt = np.zeros(32, dtype=np.int64)
        np.add.at(esum, idx, a)
        np.add.at(ecnt, idx, 1)
        present = ecnt > 0
        fm = np.zeros(32, dtype=np.int64)
        fm[present] = esum[present] * 1_000_000 // ecnt[present]
        om = int(fm[present].sum()) // int(present.sum())
        return n, sum(
            1 << f for f in range(32) if present[f] and fm[f] > om
        )

    rng = np.random.default_rng(42)
    rows, want_img, want_aud = [], {}, {}
    mid = 0
    for h, w in [(4, 4), (5, 17), (40, 40), (64, 9), (128, 128), (8, 8)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        if mid == 0:
            px[:] = 77  # constant image: om == every bm, no bit set
        pay = codecs.encode_ppm(px)
        rows.append((mid, "image", bytearray(pay), "image/ppm", w, h, 0))
        want_img[mid] = (w, h) + ref_ahash(pay)
        mid += 1
    for n in [1, 31, 32, 33, 577, 4096]:
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        pay = codecs.encode_wav(s, rate=8000)
        rows.append((mid, "audio", bytearray(pay), "audio/wav", 0, 0, 0))
        want_aud[mid] = (n,) + (ref_afp(pay)[1],)
        mid += 1
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got_img = {
        r.media_id: (r.w, r.h, r.ahash_hi, r.ahash_lo)
        for r in image_ahash(media).collect()
    }
    got_aud = {
        r.media_id: (r.n_samples, r.afp)
        for r in audio_fingerprint(media).collect()
    }
    assert got_img == want_img
    assert got_aud == want_aud


def test_image_neardup_recall_vs_exact_pairwise(spark):
    """image_neardup_pairs' banding (d+1 wide blocks since r12) has
    FULL recall at Hamming <= 4 (pigeonhole: d differing bits touch at
    most d of the d+1 blocks): the banded + verified pairs must EQUAL
    the exact all-pairs bit_count join over the same fingerprints —
    and the fixture must be non-degenerate (pairs exist; most pairs
    excluded). Also pins the d > 7 gate."""
    import pytest

    from genpipe_spark.operators.multimodal import (
        image_ahash,
        image_neardup_pairs,
        synth_media_real,
    )
    from genpipe_spark.tables import load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    hashes = image_ahash(synth_media_real(d)).select(
        "media_id", "ahash_hi", "ahash_lo"
    ).localCheckpoint(eager=True)
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in image_neardup_pairs(hashes, max_hamming=4).collect()
    }
    a, b = hashes.alias("a"), hashes.alias("b")
    ham = (
        F.bit_count(F.col("a.ahash_hi").bitwiseXOR(F.col("b.ahash_hi")))
        + F.bit_count(F.col("a.ahash_lo").bitwiseXOR(F.col("b.ahash_lo")))
    ).cast("int")
    exact = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= 4)
        .collect()
    }
    assert banded == exact, (
        f"recall broken: {len(exact - banded)} missed, "
        f"{len(banded - exact)} spurious"
    )
    n = hashes.count()
    assert banded, "degenerate fixture: no near-dup pairs"
    assert len(banded) < 0.5 * n * (n - 1) / 2, (
        "degenerate fixture: banding excludes almost nothing"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        image_neardup_pairs(hashes, max_hamming=8)


def test_image_neardup_wide_blocks_shrink_candidates(spark):
    """VERDICT r11 #2 'done' gate: the d+1 wide-block layout (5 blocks
    of 12-13 bits at d=4) must generate MATERIALLY fewer candidate
    pairs than the old 8x8-bit layout (256 buckets/block was ~N^2/64
    at web scale) while the verified OUTPUT stays identical — recall
    is a pigeonhole guarantee in both layouts, so only the collision
    volume may differ."""
    from genpipe_spark.operators.multimodal import (
        image_ahash,
        image_neardup_candidates,
        image_neardup_pairs,
        synth_media_real,
    )
    from genpipe_spark.tables import load

    # collision volume on UNIFORM hashes (the VERDICT's N^2/64 regime;
    # the media fixture is exact-dup-whale-dominated, and whales collide
    # under EVERY layout — the docstring's representative-collapse case)
    uni = spark.range(4000).select(
        F.col("id").alias("media_id"),
        F.shiftrightunsigned(F.xxhash64("id"), 32).alias("ahash_hi"),
        F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit((1 << 32) - 1))
        .alias("ahash_lo"),
    ).localCheckpoint(eager=True)
    wide = image_neardup_candidates(uni, n_blocks=5).count()
    narrow = image_neardup_candidates(uni, n_blocks=8).count()
    # theory: C(4000,2)*8/256 ~ 250k vs C(4000,2)*5/8192 ~ 4.9k (~51x)
    assert narrow >= 10 * max(wide, 1), (
        f"wide blocks should prune: {narrow} (8x8-bit) vs {wide} (5x~13-bit)"
    )
    # and on the real fixture the verified OUTPUT is layout-invariant
    d = load(spark, "/root/testdata/sf0.01", "documents")
    hashes = image_ahash(synth_media_real(d)).select(
        "media_id", "ahash_hi", "ahash_lo"
    ).localCheckpoint(eager=True)
    out_wide = sorted(
        map(tuple, image_neardup_pairs(hashes, max_hamming=4).collect())
    )
    out_narrow = sorted(
        map(tuple,
            image_neardup_pairs(hashes, max_hamming=4, n_blocks=8).collect())
    )
    assert out_wide == out_narrow, "layout changed the verified output"


def test_fasttext_feature_paths_agree(spark):
    """The scorer's inline HOF features (hashed_linear_score) and the
    trainer's exploded feature rows (_hashed_feature_rows) implement
    ONE definition — per-doc total feature counts must match exactly,
    so a drift between the two code paths fails here instead of
    silently training on different features than it scores."""
    from genpipe_spark.operators.text import (
        _hashed_feature_rows,
        hashed_linear_score,
    )
    from genpipe_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    score_nf = {
        r.doc_id: r.n_feat for r in hashed_linear_score(docs).collect()
    }
    train_nf = {
        r.doc_id: r.nf
        for r in _hashed_feature_rows(docs, "text", "doc_id", 4096)
        .select("doc_id", "nf").distinct().collect()
    }
    # the trainer drops zero-feature docs; the scorer emits n_feat=0
    assert train_nf == {k: v for k, v in score_nf.items() if v > 0}


def test_fasttext_subword_features_match_reference_model(spark):
    """r12 extension of the feature-definition pin (commit 9c21924's
    contract) to the subword path: _hashed_feature_rows with
    subword_ns=(3,4) must equal an INDEPENDENT pure-Python model of
    the feature definition — word unigrams + bigrams + boundary-marked
    char 3/4-grams, all through the portable 31-fold hash — per
    (doc, bucket) count, not just totals. Also pins that subword_ns=()
    stays byte-identical to the original definition, and the
    short-word edges ('<x>' has one 3-gram and zero 4-grams)."""
    import collections

    from pyspark.sql import Row

    from genpipe_spark.operators.text import _hashed_feature_rows

    M = 2147483647

    def h31(s):
        a = 7
        for c in s:
            a = (a * 31 + ord(c)) % M
        return a

    def model(text, ns):
        ws = [w for w in text.lower().split() if w]
        wh = [h31(w) for w in ws]
        bi = [
            (wh[i] * 1000003 + wh[i + 1] * 9176 + 12345) % M
            for i in range(len(wh) - 1)
        ]
        sub = []
        for w in ws:
            p = "<" + w + ">"
            for n in ns:
                for i in range(len(p) - n + 1):
                    sub.append(h31(p[i:i + n]))
        return dict(collections.Counter(f % 4096 for f in wh + bi + sub))

    fixture = [
        (1, "Hello world"),
        (2, "ab"),          # '<ab>': two 3-grams, one 4-gram
        (3, "x"),           # '<x>': one 3-gram, NO 4-gram
        (4, "the quick brown fox the quick"),  # repeats -> counts > 1
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in fixture])
    for ns in ((), (3, 4)):
        rows = _hashed_feature_rows(
            df, "text", "doc_id", 4096, subword_ns=ns
        ).collect()
        for doc, text in fixture:
            got = {r.b: r.cnt for r in rows if r.doc_id == doc}
            exp = model(text, ns)
            assert got == exp, (ns, doc, got, exp)
            nf = {r.nf for r in rows if r.doc_id == doc}
            assert nf == {sum(exp.values())}
