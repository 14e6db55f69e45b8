"""Fleet-wide physical-plan audit.

Every registered query's plan is checked for the two patterns that are
fatal at 100 TB regardless of how green the sf0.001 results are:

  - CartesianProduct / BroadcastNestedLoopJoin with an UNBOUNDED side —
    O(n*m) pair evaluation;
  - per-row Python UDFs (BatchEvalPython) — the row-at-a-time slow path
    (Arrow-batched mapInPandas/ArrowEvalPython are allowed).

A small whitelist names the queries where a nested-loop join is the
DOCUMENTED intent against a provably bounded side (broadcast centroid
sets, 1-row sketch arrays, oracle-only brute-force baselines whose scale
siblings are the LSH/IVF operators). Each entry carries its
justification so a new unbounded BNLJ cannot hide behind the list.
"""

from __future__ import annotations

import pytest

from genpipe_spark import registry
from tests.conftest import SF_SMALL

registry.load_all_query_modules()

# query -> why a nested-loop/cartesian plan is acceptable THERE
BOUNDED_NLJ_OK = {
    # brute-force exact baselines: query side is a broadcast <=8-row set;
    # corpus scans once. The scale path is ann-ivf-topk / similarity-lsh.
    "ann-cosine-topk": "broadcast <=8 query vectors vs one corpus scan",
    # centroid assignment: broadcast <=16-row centroid table
    "ann-ivf-topk": "broadcast <=16 centroids vs one corpus scan",
    "ann-ivf-kmeans": "broadcast <=16 trained centroids vs one corpus scan",
    # documented oracle-only all-pairs exact form; scale path is
    # similarity-lsh-pairs (bucketed equi-join)
    "dedup-embedding-cosine": "oracle-only brute-force near-dup baseline",
    # single-row bottom-k sketch arrays crossJoined to attach scalars
    "sketch-kmv-distinct": "1-row sketch x 1-row exact-count joins",
    "sketch-kmv-setops": "1-row sketch / exact-count crossJoins",
    # explicitly the broadcast-range-join VARIANT (small interval side by
    # contract); the scale form is join-interval's banded equi-join
    "join-interval-broadcast": "documented broadcast range-join variant",
    # tagged union of the two ANN forms above — same bounded sides
    "ann-topk-suite": "union of ann-cosine-topk + ann-ivf-topk",
    # 1-row corpus-stats (N, avgdl) crossJoined to attach scalars
    "text-bm25": "1-row corpus-stats scalar attach",
    "text-bm25-topk": "1-row corpus-stats scalar attach",
    "search-rrf-fusion": "inherits bm25_topk's 1-row stats attach",
    # three 1-row top-pair attaches (one per unrolled merge round)
    "text-bpe-train": "1-row top-pair attach per merge round",
    "text-bpe-encode": "1-row top-pair attach per merge round (training "
    "runs on the deduplicated word table only)",
    "pipeline-tokenize-pack": "1-row top-pair attach per merge round "
    "(the text-bpe-encode chain)",
    # 1-row totals attach + 32-row bucket-ratio broadcast
    "mix-dsir-select": "1-row totals + 32-row bucket-ratio attach",
    "text-unigram-logprob": "1-row corpus-total scalar attach",
    "text-perplexity-buckets": "1-row corpus-total scalar attach",
    "text-quality-suite": "inherits text-unigram-logprob's 1-row stats attach",
    # two 1-row half-sketch frames crossJoined for the merge + 1-row total
    "sketch-cms-heavy": "1-row corpus-total scalar attach",
    # 1-row min-count attach discovering the sampling targets
    "mix-balance-temperature": "1-row min-count scalar attach",
    "mix-full-suite": "inherits mix-balance-temperature's and "
    "mix-dsir-select's bounded attaches",
    "sketch-suite": "inherits sketch-kmv-distinct + sketch-cms-heavy's "
    "1-row sketch/total crossJoins + sketch-sample-quantiles' bounded "
    "attaches",
    # quantile-spec-sized attaches: 12-row estimate table x scan for
    # lo/hi ranks, 1-row n, 6-row exact table — bounded by the pinned
    # quantile list, never by the data
    "sketch-sample-quantiles": "6/12-row quantile-table + 1-row n "
    "attaches",
    # candidate generation inherits ann-cosine-topk's broadcast 4-row
    # query set; every later round is k-bounded
    "search-mmr-rerank": "broadcast 4-row query set; k-bounded rounds",
    # the two-level assignment's coarse probe: rows x K1 seeds with
    # K1 = ceil(sqrt(n/256)) — the IVF coarse-quantizer shape (28 rows
    # at the 100x fixture); fine scoring is an equi join on the group
    "dedup-semantic": "sqrt-K coarse-seed probe (IVF shape); fine "
    "scoring equi-joined",
    "embedding-suite": "union of ann-cosine-topk + ann-ivf-topk + "
    "dedup-embedding-cosine + dedup-semantic (all documented "
    "bounded/baseline/IVF-probe forms)",
    "text-bm25-suite": "inherits text-bm25/-topk's 1-row stats attach",
    # 1-row total-order-count crossJoined to attach the lift denominator
    "copurchase-lift": "1-row order-count scalar attach",
    # two 1-row corpus totals (unigram + bigram counts) crossJoined
    "text-bigram-pmi": "1-row corpus-totals scalar attach",
    "text-token-suite": "inherits text-bigram-pmi's, text-bpe-train's "
    "and search-rrf-fusion's 1-row attaches",
    # 1-row corpus doc-count crossJoined to attach the IDF normaliser
    "text-tfidf-topk": "1-row corpus doc-count scalar attach",
    # 1-row per-split totals crossJoined to attach JS/entropy scalars
    "profile-entropy": "1-row split-totals scalar attach",
    # the R*C grid margins crossJoin inherited from chi2 + its own
    # 1-row total attach; all grouped-size (the chi2 whitelist rationale)
    "quality-cramers-v": "inherits quality-chi2-independence's grid "
    "crossJoins + 1-row total",
    # 1-row chance-pairs margin attach
    "quality-cohen-kappa": "1-row chance-pairs scalar attach",
    # the Q11 HAVING-scalar: broadcast of a provably-1-row bloc total
    "tpch-q11": "broadcast 1-row bloc-total aggregate",
    # 1-row corpus-max anchor for recency days
    "rfm-segmentation": "1-row now_us anchor attach",
    "timegrid-suite": "inherits rfm-segmentation's 1-row anchor",
    # the Q22 uncorrelated scalar subquery: a provably-1-row aggregate
    # (global avg of positive balances) crossJoined to every candidate
    "tpch-q22": "1-row global-avg scalar attach (the Q22 subquery)",
    "reshape-olap-suite": "inherits copurchase-lift's and tpch-q22's "
    "1-row attaches",
    # coarse/probe assignment: broadcast <=8-row centroid set
    # crossJoin-scored per vector/query (same shape as ann-ivf-topk)
    "ann-ivfpq-topk": "broadcast <=8 centroids / <=32-row PQ codebook "
    "vs one corpus scan",
    # the Q15 scalar subquery: a provably-1-row max aggregate
    # crossJoined to every per-supplier revenue row
    "tpch-q15": "1-row global-max scalar attach (the Q15 subquery)",
    # 1-row total-count attach to the 9-row digit table
    "quality-benford": "1-row row-count scalar attach",
    "quality-chi2-independence": "R*C cell-grid/margins/1-row-total "
    "attaches — all grouped-size, nothing scan-sized",
    "alloc-largest-remainder": "1-row total-weight scalar attach",
    # 1-row (n1, n2) totals crossJoined to the reduced value table
    "profile-ks-drift": "1-row sample-totals scalar attach",
    # two 1-row reductions (rank-weighted sum + percentile crossings)
    # crossJoined into the single output row
    "profile-skew": "1-row skew-stats scalar attach",
    # profile_table's r9 plan split: counts/minmax, exact-distinct and
    # HLL stat families are separate 1-row aggs crossJoined back (one
    # mixed agg degraded the distinct Expand to SortAggregate)
    "profile-table": "1-row profile stat-family attaches",
    "profile-diff": "1-row profile stat-family attaches (both sides)",
    "profile-diff-approx": "1-row profile stat-family attaches",
    # 1-row corpus time-midpoint anchor (the rfm now_us pattern)
    "ab-test-cuped": "1-row time-midpoint anchor attach",
    # 1-row arm counts + 1-row m_tests + 1-row BH r* reduction, all
    # crossJoined into the <= 5-row metric table
    "ab-test-bh-fdr": "1-row arm-count / m / r* scalar attaches",
    "ab-test-msprt": "1-row arm-count scalar attach",
    "profile-suite": "inherits profile-entropy's, ab-test-cuped's, "
    "ab-test-bh-fdr's and ab-test-bootstrap's bounded attaches",
    # 1-row frame of data-estimated u probabilities / ln weights
    # broadcast-attached to the blocked candidate pairs
    "link-fellegi-sunter": "1-row u-probability/ln-weight scalar attach",
    # 1-row k*/total frames attached to the <= ~20-row source-weight
    # table; both NLJ sides are bounded by construction
    "mix-capped-allocation": "1-row water-filling threshold attach onto "
    "the source-count weight table",
    "link-sorted-neighborhood": "inherits the 1-row u attach; the "
    "rank-window pair join is a banded equi-join",
    "join-filter-suite": "inherits join-bloom-prefilter's fixed-size "
    "bloom + the linkage entries' 1-row attaches",
    # the replicate table is a 32-row groupBy(b) aggregate; the rank
    # self-join is non-equi but both sides are that bounded aggregate
    "ab-test-bootstrap": "32-row replicate-aggregate rank self-join "
    "(both sides grouped-size) + 1-row attaches",
    # 1-row total-count attach for the exact decile-bin arithmetic
    "embedding-probe-calibration": "broadcast 1-row total-count attach",
}

# queries whose construction runs real side-effects (stream drains, temp
# fixtures) — their plans are audited by their own dedicated tests
SKIP = {"stream-sessionize", "stream-zscore", "stream-group-sample", "stream-sessionize-batch", "pipeline-parse-bulk",
        "stream-dedup",  # real stream drain at construction (r7)
        "source-filestream", "sink-parquet-partitioned", "scan-text-vcf",
        "row-sample-parser", "stream-window-agg",
        # suites whose members are SKIP fixture/stream queries
        "scan-source-suite", "stream-agg-suite", "scan-jsonl",
        # temp-dir write side-effect at construction (like sink-parquet)
        "sink-orc-roundtrip",
        # real stream drain + temp-dir writes at construction (r8)
        "stream-histogram-quantile", "stream-holt-winters",
        # real 3-batch foreachBatch drain at construction (r9 late);
        # the returned plan is a plain parquet read of the transcript
        "stream-dedup-incremental",
        # real 3-batch availableNow drain at construction (r10); the
        # returned plan is a plain parquet read of the transcript;
        # dedicated drop-probe test in test_pipeline_streaming.py
        "stream-window-late-drop"}


# query -> why a FORCED F.broadcast hint is acceptable THERE. A forced
# hint bypasses AQE's runtime size check, so it is only allowed when the
# broadcast side is bounded by CONSTRUCTION (a constant, not a function
# of the scale factor). Everything else must leave the decision to AQE.
BOUNDED_BROADCAST_OK = {
    "ann-cosine-topk": "broadcast side is the <=8-row query-vector set",
    "ann-ivf-topk": "broadcast side is the <=16-row centroid table",
    "ann-ivf-kmeans": "broadcast side is the <=16-row centroid table",
    "sketch-kmv-distinct": "1-row sketch arrays crossJoined to attach scalars",
    "sketch-kmv-setops": "1-row sketch arrays crossJoined to attach scalars",
    "join-interval-broadcast": "documented broadcast range-join variant; "
    "scale form is join-interval's banded equi-join",
    "dedup-embedding-cosine": "oracle-only brute-force baseline (documented)",
    "ann-topk-suite": "union of ann-cosine-topk + ann-ivf-topk",
    # per-query-term doc frequencies (<= |query terms| rows) + 1-row
    # corpus stats — bounded by the query, not the corpus
    "text-bm25": "broadcast |query|-row dfreq + 1-row stats",
    "text-bm25-topk": "broadcast 1-row stats",
    "text-perplexity-buckets": "broadcast 1-row corpus total",
    "text-unigram-logprob": "broadcast 1-row corpus total",
    "text-quality-suite": "inherits text-unigram-logprob's 1-row broadcast",
    "sketch-cms-heavy": "broadcast 1-row corpus total",
    "mix-balance-temperature": "1-row min-count attach (AQE-planned)",
    "mix-full-suite": "inherits mix-balance-temperature",
    "sketch-suite": "inherits sketch-cms-heavy's 1-row broadcast",
    # offset table is #partitions rows (thousands at 100 TB, not data-sized)
    "global-row-number": "broadcast per-partition offset table",
    "window-suite": "inherits global-row-number's offset-table broadcast",
    "link-sorted-neighborhood": "inherits global-row-number's "
    "offset-table broadcast",
    # the bloom filter is <= m_bits/32 rows — a CONSTANT chosen at build
    "join-bloom-prefilter": "broadcast fixed-size bloom word table",
    "join-filter-suite": "inherits join-bloom-prefilter's fixed-size bloom "
    "and link-sorted-neighborhood's offset-table broadcast",
    "text-bigram-pmi": "broadcast 1-row unigram/bigram totals",
    "text-token-suite": "inherits text-bigram-pmi's 1-row broadcasts",
    "embedding-suite": "inherits the ann/brute members' bounded broadcasts",
    "text-bm25-suite": "inherits text-bm25's |query|-row dfreq broadcast",
    # constant-by-construction codebooks / lookup tables (8 centroids,
    # 32 PQ codewords, Q-bounded ADC table with Q capped in the query)
    "quantize-embedding-pq": "broadcast 32-row PQ codebook",
    "ann-ivfpq-topk": "broadcast 8-row centroids + 32-row codebook + "
    "capped-Q probe/ADC tables",
    # the Q22 scalar subquery: broadcast of a provably-1-row aggregate
    "tpch-q22": "broadcast 1-row global-avg aggregate",
    "reshape-olap-suite": "inherits tpch-q22's 1-row broadcast",
    "quality-cramers-v": "inherits quality-chi2-independence's bounded "
    "grid/margins/total broadcasts",
    "quality-cohen-kappa": "broadcast 1-row chance-pairs margin",
    "tpch-q11": "broadcast 1-row bloc-total aggregate",
    "rfm-segmentation": "broadcast 1-row now_us anchor",
    "timegrid-suite": "inherits rfm-segmentation's 1-row anchor",
    # polygons are a LITERAL fixture (5 shapes); the cell cover and the
    # edge list are polygon properties, constant by construction
    "join-point-in-polygon": "broadcast literal polygon cells + edges",
    "interval-suite": "inherits join-point-in-polygon's literal-polygon "
    "broadcasts",
    # 1-row corpus doc-count for the IDF normaliser
    "text-tfidf-topk": "broadcast 1-row corpus doc count",
    # 1-row split-totals attach for the entropy/JS normalisers
    "profile-entropy": "broadcast 1-row split totals",
    # constant-cardinality dims: nation is 25 rows at ANY SF, region 5
    "tpch-q7": "broadcast 25-row nation dim (twice-aliased)",
    "tpch-q8": "broadcast 25-row nation (x2) + 5-row region dims",
    # the Q15 scalar subquery: broadcast of a provably-1-row max
    "tpch-q15": "broadcast 1-row global-max aggregate",
    # 9-row first-digit observation table + 1-row total count
    "quality-benford": "broadcast 9-row digit counts + 1-row total",
    # 1-row sample-sizes (n1, n2) attach for the CDF-gap cross products
    "profile-ks-drift": "broadcast 1-row sample totals",
    # margins/grid/total are GROUPED-size (R*C cells), not scan-size
    "quality-chi2-independence": "broadcast R*C cell grid, margins, "
    "1-row grand total",
    # 1-row total-weight attach; ranking window is group-count-sized
    "alloc-largest-remainder": "broadcast 1-row total-weight aggregate",
    # 1-row percentile-crossing reduction attached to the 1-row Gini
    "profile-skew": "broadcast 1-row percentile-stats aggregate",
    "ab-test-cuped": "broadcast 1-row time-midpoint anchor",
    "profile-table": "broadcast 1-row distinct-stat agg",
    "profile-diff": "broadcast 1-row distinct-stat aggs",
    "profile-diff-approx": "broadcast 1-row distinct/HLL stat aggs",
    "profile-suite": "inherits profile-entropy's 1-row broadcast and "
    "the profile stat-family broadcasts",
    # 1-row scalar attaches + the 15-row pinned BH threshold literal
    "ab-test-bh-fdr": "broadcast 1-row scalars + 15-row threshold table",
    "ab-test-msprt": "broadcast 1-row arm counts",
    "search-rrf-fusion": "inherits bm25_topk's broadcast 1-row stats",
    "text-bpe-train": "broadcast 1-row top pair per merge round",
    "text-bpe-encode": "broadcast 1-row top pair per merge round",
    "pipeline-tokenize-pack": "broadcast 1-row top pair per merge round",
    "mix-capped-allocation": "broadcast 1-row totals / k* threshold",
    "mix-dsir-select": "broadcast 1-row totals + 32-row ratio table",
    # per-dimension sum table is dimensionality-sized (64 rows), a
    # property of the embedding model, not the corpus
    "embedding-center-l2": "broadcast dim-sized per-dimension sums",
    # quantile-spec-sized (6/12-row) estimate tables + 1-row n — all
    # bounded by the pinned quantile list, not the data
    "sketch-sample-quantiles": "broadcast 6-row rank/exact tables, "
    "12-row estimate table, 1-row n",
    "search-mmr-rerank": "broadcast 4-row query-vector set (the "
    "ann-cosine-topk rationale)",
    # learned weight table is <= buckets (4096) rows by construction
    "text-fasttext-train": "broadcast <=4096-row learned weight table "
    "(per GD iteration + final scoring)",
    "text-fasttext-holdout": "broadcast <=4096-row learned weight table "
    "(same hashed_linear_apply path as text-fasttext-train)",
    "text-fasttext-planted": "broadcast <=4096-row learned weight table "
    "(same hashed_linear_apply path as text-fasttext-train)",
    # #partitions-row offset table (global_row_number) + 1-row total
    "embedding-probe-calibration": "broadcast partition-offset table "
    "+ 1-row total count",
}


@pytest.mark.parametrize("name", [q for q in registry.QUERIES if q not in SKIP])
def test_no_unbounded_nested_loop_or_row_python(spark, name):
    df = registry.QUERIES[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in BOUNDED_NLJ_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNLJ"
    # row-at-a-time Python is never acceptable; Arrow batches are
    assert "BatchEvalPython" not in plan, f"{name}: per-row Python UDF"
    # forced broadcast of an SF-growing side OOMs at 100 TB (VERDICT r3);
    # the analyzed plan surfaces every user hint as ResolvedHint
    analyzed = df._jdf.queryExecution().analyzed().toString()
    if name not in BOUNDED_BROADCAST_OK:
        assert "ResolvedHint" not in analyzed, (
            f"{name}: forced join hint on a side not whitelisted as "
            f"bounded-by-construction — let AQE decide instead"
        )


def test_dynamic_partition_pruning_on_stage_tables(spark, tmp_path):
    """The engine's partitioned stage tables must benefit from Catalyst's
    dynamic partition pruning: a selective dim filter on the partition
    key injects a runtime pruning subquery into the fact scan — the
    mechanism that replaces the reference's manual per-chrom path
    arithmetic (GenomicsLoader.scala:120,126) at scale."""
    from pyspark.sql import functions as F

    fact = spark.range(50_000).select(
        "id", (F.col("id") % 20).cast("string").alias("chrom"), (F.col("id") * 3).alias("pos")
    )
    dest = str(tmp_path / "fact")
    fact.write.partitionBy("chrom").parquet(dest)
    dim = spark.createDataFrame(
        [("1", "keep"), ("2", "keep"), ("3", "drop")], "chrom string, tag string"
    )
    j = spark.read.parquet(dest).join(dim.where(F.col("tag") == "keep"), "chrom")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:800]


def test_runtime_bloom_filter_on_selective_join(spark, tmp_path):
    """Catalyst's runtime bloom-filter injection prunes the big side of
    a selective shuffle join before the shuffle — the 100 TB mechanism
    that keeps fact⋈filtered-dim joins from shuffling dead rows.
    Thresholds are production-scale (10 GB application side), so the
    test scales them to fixture size, exactly like the skew-join test."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in [
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(500_000).select("id", (F.col("id") % 100_000).alias("k"))
        small = spark.range(100).select(
            (F.col("id") * 7).alias("k"), (F.col("id") % 2).alias("t")
        )
        bdest, sdest = str(tmp_path / "big"), str(tmp_path / "small")
        big.write.parquet(bdest)
        small.write.parquet(sdest)
        b = spark.read.parquet(bdest)
        s = spark.read.parquet(sdest).where(F.col("t") == 0)
        plan = b.join(s, "k")._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:800]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_plan_lint_detects_each_class(spark):
    """operators/checks.plan_lint: one positive probe per finding class
    plus clean-plan negatives (running and both-unbounded frames must
    NOT flag — only the growing-forward rescan class does)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from genpipe_spark.operators.checks import plan_lint

    df = spark.range(10).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    quad = df.withColumn(
        "x",
        F.first("v").over(
            Window.partitionBy("k").orderBy("v")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        ),
    )
    assert any(f.startswith("quadratic-frame") for f in plan_lint(quad))
    run = df.withColumn(
        "x",
        F.sum("v").over(
            Window.partitionBy("k").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    full = df.withColumn(
        "x",
        F.max("v").over(
            Window.partitionBy("k")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    assert plan_lint(run) == []
    assert plan_lint(full) == []
    cart = df.crossJoin(df.selectExpr("k AS k2", "v AS v2"))
    assert any("cartesian" in f or "bnlj" in f for f in plan_lint(cart))
    # unpartitioned ordered window = the single-reducer class; the
    # partitioned probes above double as its negatives
    glob = df.withColumn("r", F.row_number().over(Window.orderBy("v")))
    assert any(
        f.startswith("single-reducer-window") for f in plan_lint(glob)
    )
    # partition-only window (no order) must NOT flag: two bracket
    # groups but the second is a partition spec, not an order spec
    part_only = df.withColumn("s", F.sum("v").over(Window.partitionBy("k")))
    assert plan_lint(part_only) == []


# query -> why a Window with an EMPTY partition spec is acceptable THERE.
# The rule (plan_lint "single-reducer-window", added r8 after the
# rfm-segmentation weak): an unpartitioned Window funnels its whole input
# through ONE task, so it is only allowed over input that is provably
# BOUNDED by construction — a grouped/distinct-domain table, a file list,
# a dimensionality-sized frame, or driver rows — never over scan-sized
# data. Scan-sized global numbering goes through
# operators/relational.global_row_number instead (rfm-segmentation does).
BOUNDED_GLOBAL_WINDOW_OK = {
    # exclusive running min over the DISTINCT-x frontier table —
    # domain-bounded (skyline_2d docstring: quantize x if unbounded)
    "sort-skyline-pareto": "window over the distinct-x reduced table",
    "sort-set-suite": "inherits sort-skyline-pareto / compaction members",
    # bin-packing scan order over the FILE list — #files rows, a layout
    # property, not data-sized
    "layout-compaction-plan": "window over the file-manifest table",
    # max(n) over the d-row per-dimension sums (embedding dimensionality)
    "embedding-center-l2": "window over dim-sized per-dimension sums",
    "embedding-suite": "inherits embedding-center-l2's dim-sized window",
    # PSI term total over the #bins-row term table
    "profile-drift": "window over the histogram-bin term table",
    "profile-suite": "inherits profile-drift's bin-table window",
    # CDF running sums over the REDUCED distinct-value table (the
    # ks_two_sample quantize-first doctrine)
    "profile-ks-drift": "window over the distinct-value CDF table",
    # largest-remainder ranking over the driver-supplied quota rows
    "alloc-largest-remainder": "window over driver-row quota table",
    # cumulative key-mass over the COUNTS-OF-COUNTS table — grouped by
    # count VALUE, domain-bounded (the ks_two_sample doctrine); the
    # whole point of the query is that no per-key sort exists
    "profile-skew": "window over the counts-of-counts value table",
    # BH rank over the per-metric z table — event-type-domain rows
    # (<= 5), already reduced by a grouped dedup
    "ab-test-bh-fdr": "window over the per-metric z table",
    # ranking window over the LIMIT-50 truncated word table (TopK
    # feeds it; the vocab reduction is the ks-drift doctrine)
    "text-bpe-train": "window over the 50-row truncated word list",
    "text-bpe-encode": "vocab-rank window over a table bounded at "
    "|alphabet| + merge count rows by construction",
    "mix-capped-allocation": "windows over post-aggregate source-count "
    "rows (the alloc-largest-remainder shape)",
    "mix-dsir-select": "window over the 100-row truncated selection",
    "mix-full-suite": "inherits mix-dsir-select's truncated window",
    "text-token-suite": "inherits text-bpe-train's truncated-list window",
}


@pytest.mark.parametrize(
    "name",
    [q for q in registry.QUERIES if q not in SKIP],
)
def test_no_single_reducer_windows(spark, name):
    """Fleet-wide: no registered query may plan an unpartitioned Window
    over unverified input — the whole-input-through-one-task shape that
    made rfm-segmentation the round-7 weak. Whitelisted windows name
    their bounded input above."""
    from genpipe_spark.operators.checks import plan_lint

    if name in BOUNDED_GLOBAL_WINDOW_OK:
        pytest.skip(BOUNDED_GLOBAL_WINDOW_OK[name])
    df = registry.QUERIES[name](spark, SF_SMALL)
    hits = [
        f for f in plan_lint(df) if f.startswith("single-reducer-window")
    ]
    assert not hits, f"{name}: {hits}"


@pytest.mark.parametrize(
    "name",
    [q for q in registry.QUERIES if q not in SKIP],
)
def test_no_quadratic_window_frames(spark, name):
    """Fleet-wide: no registered query may carry a growing-forward
    window frame (upper UNBOUNDED FOLLOWING, lower not unbounded) —
    Spark rescans to partition end per row there, O(n^2) per group
    (the r7s5 interpolation/asof-nearest lesson, now enforced)."""
    from genpipe_spark.operators.checks import plan_lint

    df = registry.QUERIES[name](spark, SF_SMALL)
    quad = [f for f in plan_lint(df) if f.startswith("quadratic-frame")]
    assert not quad, f"{name}: {quad}"
