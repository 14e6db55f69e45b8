#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the ``noop`` sink: unlike
``count()`` (which lets Catalyst prune projection-only expression work —
it under-measured expression-heavy queries by up to 5x in rounds 1-2),
the noop write evaluates EVERY output column on the executors without
result download. Numbers from round 2 on therefore measure strictly more
work than BENCH_r01's count()-based run — compare per-query deltas only
within the noop era."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "flagship-variant-doc",
    "join-interval",
    "join-asof",
    "agg-group-collect",
    "window-rank-first-running-sum",
    "agg-count-distinct-reduce",
    "join-inner-equi",
    "topk",
    "dedup-exact",
    "dedup-minhash-lsh",
    "dedup-ngram-jaccard",
    "ann-cosine-topk",
    "text-metrics",
    "sketch-kmv-distinct",
    "stream-window-agg",
    "fn-parse-suite",
    "fn-alt-decompose",
    "pipeline-parse-bulk",
    "mix-weighted-sources",
    "quantize-embedding-int8",
    "quantile-group-exact",
    "text-bm25",
    "stream-stream-interval-join",
    "text-unigram-logprob",
    "rollup-gapfill",
    # r5: end-to-end curation plan (normalize→quality→dedup×2→fingerprint)
    "pipeline-curation",
    # r5 session 2: validation gate, CM-sketch heavy hitters, CDC merge,
    # PSI drift, BPE pair stats
    "validate-constraints",
    "sketch-cms-heavy",
    "merge-upsert",
    "profile-drift",
    "text-bpe-pairs",
    # r5 session 3: C4-style line dedup, SCD2 history, rolling
    # z-score/EWMA analytics
    "text-line-dedup",
    "scd2-history",
    "timeseries-anomaly",
    "graph-pagerank",
    "join-bloom-prefilter",
    "interval-overlap-count",
    "funnel-steps",
    "dedup-duplicated-spans",
    "multimodal-image-ahash",
    "quantile-mad",
    # r6: conversion-window funnel, with-replacement sampling,
    # 128-bit-safe grouped correlation, bucketed-layout write+join
    # (the last measures the bucketed WRITE too — it is a sink op)
    "funnel-steps-windowed",
    "mix-reservoir-replacement",
    "agg-grouped-corr",
    "layout-bucketed-join",
    "interval-interval-join",
    "rollup-twap",
    "graph-triangle-count",
    "copurchase-pairs",
    "session-paths",
    "snapshot-diff",
    "quantile-weighted-median",
    "copurchase-lift",
    "tpch-q5",
    "window-range-frame",
    "text-bigram-pmi",
    "scd2-change-feed",
    # r7: PII redaction, the TPC-H decorrelation shapes, TF-IDF
    # keywords, autocorrelation, k-core peeling, entropy/JS drift
    "redact-pii",
    "tpch-q4",
    "tpch-q13",
    "tpch-q17",
    "tpch-q18",
    "text-tfidf-topk",
    "timeseries-acf",
    "graph-kcore",
    "profile-entropy",
    # r7 batch 2: the completed TPC-H family, OHLC/null-safe/PQ,
    # reciprocal-overlap join, bucket-checksum diff, IVF-PQ search
    "tpch-q10",
    "tpch-q14",
    "tpch-q19",
    "tpch-q21",
    "tpch-q22",
    "rollup-ohlc",
    "join-null-safe",
    "quantize-embedding-pq",
    "interval-reciprocal-join",
    "validate-bucket-checksum",
    "ann-ivfpq-topk",
    "copurchase-triples",
    "quantile-cont-interp",
    "agg-spearman-corr",
    "layout-compaction-plan",
    # r7 session 3: the remaining feasible TPC-H (q6/q7/q8/q12/q15),
    # grouped OLS, link prediction, Benford + KS quality stats,
    # rolling median, Pareto skyline, outer stream join batch twin,
    # centered+normalized embeddings
    "tpch-q6",
    "tpch-q7",
    "tpch-q8",
    "tpch-q12",
    "tpch-q15",
    "agg-ols-regression",
    "graph-link-predict",
    "quality-benford",
    "profile-ks-drift",
    "rollup-rolling-median",
    "sort-skyline-pareto",
    "stream-interval-left-join",
    "embedding-center-l2",
    "forecast-seasonal-naive",
    "dedup-containment",
    "rollup-period-over-period",
    "udtf-python-sentences",
    "quality-winsorize",
    # r7 session 4: the stateful-scan class (clamped balances, the
    # monoid-parallel keyless form, EWMA, Kaplan-Meier), set-based
    # FIFO allocation + apportionment, prefix-filtered exact Jaccard,
    # CIDR + planar-grid enrichment joins, explicit GROUPING SETS,
    # the 3-D Hilbert key
    "stateful-capped-sum",
    "stateful-capped-sum-global",
    "timeseries-ewma",
    "timeseries-holt",
    "survival-kaplan-meier",
    "alloc-fifo-lots",
    "alloc-largest-remainder",
    "dedup-jaccard-prefix",
    "join-cidr-lookup",
    "join-geo-radius",
    "agg-grouping-sets",
    "layout-hilbert-3d",
    # r7 session 5: window-exact risk/changepoint analytics, linear
    # gap interpolation, point-in-polygon containment, Holt-Winters
    # seasonal scan, time-decay attribution, DISTINCT window frames
    "timeseries-drawdown",
    "timeseries-cusum",
    "rollup-interpolate-linear",
    "attribution-time-decay",
    "timeseries-holt-winters",
    "join-point-in-polygon",
    "window-rolling-distinct",
    "quality-theil-atkinson",
    "rollup-lttb-downsample",
    "rollup-lttb-proper",
    "tpch-q9",
    "tpch-q2",
    "embedding-top-direction",
    "text-hash-features",
    "rfm-segmentation",
    "ltv-cohort-revenue",
    "scd2-bitemporal",
    "agg-kendall-tau",
    "stream-trending-topk",
    # r8: the headliner is the APPROX (HLL-default) mode a user runs;
    # the exact-distinct sibling profile-diff exists for the oracle
    # (VERDICT r7 item 4)
    "profile-diff-approx",
    # r8 additions: classical seasonal decomposition, key-skew
    # diagnostic, incremental MV refresh, label-propagation communities
    "rollup-seasonal-decompose",
    "profile-skew",
    "cdc-mv-refresh",
    "graph-label-propagation",
    "attribution-markov-removal",
    "ml-isotonic-calibration",
    "agg-mann-kendall-theil-sen",
    "ab-test-proportions",
    "ab-test-cuped",
    "ab-test-srm",
    # r9 additions: exact-substring corpus dedup, the multiple-testing
    # pair (BH-FDR + always-valid mSPRT), Gopher quality battery,
    # CCNet perplexity buckets, BPE merge training, RRF hybrid
    # retrieval, epoch shuffle, DSIR importance selection
    "dedup-exact-substr",
    "ab-test-bh-fdr",
    "ab-test-msprt",
    "text-gopher-rules",
    "text-perplexity-buckets",
    "text-bpe-train",
    "text-bpe-encode",
    "text-fasttext-score",
    # r11: learned classifier (8 GD iterations, oracle-replayed)
    "text-fasttext-train",
    "dedup-cdc-chunks",
    "pipeline-tokenize-pack",
    "search-rrf-fusion",
    "mix-epoch-shuffle",
    "mix-capped-allocation",
    "mix-dsir-select",
    # r9 late batch: PELT optimal changepoints, deterministic sample-
    # quantile sketch (certified), Fellegi-Sunter record linkage,
    # SemDeDup embedding dedup, live incremental-LSH dedup stream
    "changepoint-pelt",
    "sketch-sample-quantiles",
    "link-fellegi-sunter",
    "dedup-semantic",
    "stream-dedup-incremental",
    "stream-window-late-drop",
    # r11: incremental CDC admission (persisted chunk-hash index)
    "dedup-cdc-incremental",
    # r11: multimodal near-dup (decode -> aHash -> banded Hamming join)
    "multimodal-image-neardup",
    # r11: dense in-engine linear probe (8 GD rounds, oracle-replayed)
    "embedding-linear-probe",
    # r11: ten heads jointly descended -> confusion matrix
    "embedding-probe-multiclass",
    "search-mmr-rerank",
    "link-sorted-neighborhood",
    "forecast-croston",
    "sketch-kmv-setops",
    "graph-harmonic-centrality",
]


def main() -> None:
    from genpipe_spark import registry
    from genpipe_spark.session import get_spark

    registry.load_all_query_modules()
    spark = get_spark("genpipe-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM + parquet footers once so we measure steady-state
    materialize(registry.QUERIES["join-inner-equi"](spark, SF_DIR))

    # min of three warm runs per query: this host shows up to 7x
    # run-to-run variance on individual queries (r4 profiling: identical
    # code timed text-metrics at 6.2 s and 0.86 s in back-to-back suite
    # runs), and the first materialization of each distinct plan carries
    # one-time codegen-compile + parquet-footer costs; min-of-3 converges
    # to steady state where min-of-2 still caught those constants.
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        runs = []
        for _ in range(3):
            start = time.perf_counter()
            materialize(fn(spark, SF_DIR))
            runs.append(time.perf_counter() - start)
        runs.sort()
        timings[name] = round(runs[0], 3)
        # median exposes run-to-run spread next to the min: a query
        # whose median >> min is host-noise-dominated, so cross-round
        # comparisons should read the min (VERDICT r5 item 2 — the
        # r4->r5 "+30% uniform" adjudication, made self-evident)
        medians[name] = round(runs[1], 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Two lines, detail FIRST and the contract line LAST: the driver
    # keeps EXACTLY the last 2000 chars of stdout (BENCH_r06's tail
    # field), and in round 6 the single min+median line outgrew that
    # capture, losing the headline total (parsed:null — VERDICT r6
    # item 2). The final line is the required {"metric","value",
    # "unit","queries","sf"} shape, compact-serialized with PER-QUERY
    # TIMES ROUNDED TO 0.1 s so 80+ queries stay under the 2000-char
    # hard cap (measured: 3-decimal broke 2000 at 79 queries).
    # Full-precision mins AND medians ride the sacrificial detail
    # line — cross-round comparisons read THAT, not the contract line.
    print(
        json.dumps(
            {
                "metric": "headline-suite-detail",
                "queries_min": timings,
                "queries_median": medians,
                # spread = median/min per query (VERDICT r10 #6): >2
                # marks a host-noise-dominated measurement — exclude
                # from cross-round adjudication (scripts/diff_bench.py)
                "queries_spread": {
                    k: round(medians[k] / timings[k], 2) if timings[k] else None
                    for k in timings
                },
                "median_total": round(sum(medians.values()), 3),
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )
    # self-healing length guard (review r7): ~70 chars of headroom at
    # 81 queries evaporates after a few additions or >=10 s timings, so
    # degrade until the line fits the 2000-char capture with margin:
    # 0.1 s precision -> 1 s -> slowest-half subset (flagged) -> empty.
    # The subset step keeps the HEAVY queries (the ones cross-round
    # perf comparison cares about) in the parsed contract even at 90+
    # registered headliners; the fast tail rides the detail line only.
    by_time = sorted(timings, key=timings.get, reverse=True)
    candidates = [
        (1, timings),
        (0, timings),
        (1, {k: timings[k] for k in by_time[: len(by_time) // 2]}),
        (1, {k: timings[k] for k in by_time[:20]}),
        (None, {}),
    ]
    for ndigits, subset in candidates:
        q_out = (
            {k: round(v, ndigits) if ndigits else int(round(v))
             for k, v in subset.items()}
            if ndigits is not None
            else {}
        )
        payload = {
            "metric": "headline-suite-total",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": q_out,
            "sf": sf_val,
        }
        if ndigits is not None and len(subset) < len(timings):
            payload["queries_truncated"] = len(timings) - len(subset)
        contract = json.dumps(payload, separators=(",", ":"))
        if len(contract) <= 1950:
            break
    print(contract)
    spark.stop()
    _write_local_provenance(timings, medians, sf_val)


def _write_local_provenance(timings, medians, sf_val) -> None:
    """Commit-grade bench provenance (VERDICT r7 item 3): the driver
    keeps only the last 2000 chars of stdout, which lost BENCH_r06's
    min block and truncated r07's detail to 11 of 103 medians — making
    min-vs-min cross-round comparison impossible from artifacts alone.
    Write the FULL per-query {min, median} map to
    BENCH_LOCAL_r{N}.json in the repo root (N inferred as one past the
    newest driver-written BENCH_r*.json), tagged with the HEAD commit
    so a 5-line script can diff r{N-1} -> r{N}."""
    import re
    import subprocess

    root = Path(__file__).resolve().parent
    rounds = [
        int(m.group(1))
        for p in root.glob("BENCH_r*.json")
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", p.name))
    ]
    n = max(rounds, default=0) + 1
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=root, capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"  # nonzero git exit -> empty stdout
    except Exception:  # noqa: BLE001 — provenance must never fail the bench
        commit = "unknown"
    out = {
        "round": n,
        "commit": commit,
        "sf": sf_val,
        "min_total": round(sum(timings.values()), 3),
        "median_total": round(sum(medians.values()), 3),
        "queries": {
            q: {"min": timings[q], "median": medians[q]} for q in timings
        },
    }
    (root / f"BENCH_LOCAL_r{n}.json").write_text(
        json.dumps(out, indent=1, sort_keys=True) + "\n"
    )


if __name__ == "__main__":
    main()
