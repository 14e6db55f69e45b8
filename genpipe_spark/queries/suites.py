"""Tagged-union suite entries for the driver's 50-slot correctness
window (the filter-project-suite trick, generalized).

Each suite packs EVERY column of each member query into one canonical
``payload`` string — nothing is dropped, so the merged entry checks
exactly what the member entries check. Packing rules (both engines):

  - non-float columns: plain cast-to-string (bit-identical renderings
    for bigint/int/varchar/boolean across Spark and DuckDB);
  - float columns: ``round(x*1e6)`` cast to bigint then string — the
    repo's integer-cents idiom (queries/common.py money_sum) at micro
    precision. Member doubles are already bit-identical across engines
    (each member passes the driver hash on its own), so the rounded
    integers match exactly;
  - NULLs: coalesced to a sentinel BEFORE concat_ws (both engines skip
    NULLs inside concat_ws, which would otherwise shift alignment).

The member entries stay registered (>50) for pytest parity and the
bench; the DuckDB twin of each suite wraps the member's ORIGINAL oracle
SQL as a subquery and applies the identical packing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from genpipe_spark.registry import ORACLES, QUERIES, query

# self-registration side effects: member modules must be loaded before
# this module reads their ORACLES entries
import genpipe_spark.queries.llmdata  # noqa: F401  (text-*, sketch-*, ann-*)
import genpipe_spark.queries.nested  # noqa: F401  (udf-*)
import genpipe_spark.queries.parse  # noqa: F401  (fn-*)
import genpipe_spark.queries.quality  # noqa: F401  (profile-*, validate-*)
import genpipe_spark.queries.relational  # noqa: F401  (sort/set/window/olap/cdc)
import genpipe_spark.queries.sources  # noqa: F401  (scan-*, sink-*)
import genpipe_spark.queries.streaming  # noqa: F401  (stream-*)
import genpipe_spark.queries.timeseries  # noqa: F401  (rollup-*, timeseries-*)

_NULL = "∅"  # sentinel for NULL fields (never appears in fixture data)


def _pack_spark(spec: list[tuple[str, str]]) -> Column:
    parts = []
    for name, kind in spec:
        c = F.col(name)
        if kind == "f":
            c = F.round(c * 1_000_000).cast("long")
        parts.append(F.coalesce(c.cast("string"), F.lit(_NULL)))
    return F.concat_ws("|", *parts)


def _pack_sql(spec: list[tuple[str, str]]) -> str:
    parts = []
    for name, kind in spec:
        e = f'"{name}"'
        if kind == "f":
            e = f"CAST(round(({e})*1000000) AS BIGINT)"
        parts.append(f"coalesce(CAST({e} AS VARCHAR), '{_NULL}')")
    return "concat_ws('|', " + ", ".join(parts) + ")"


def _suite_entry(members):
    def run(spark, sf):
        out = None
        for tag, (m, spec) in members.items():
            df = QUERIES[m](spark, sf)
            part = df.select(
                F.lit(tag).alias("part"), _pack_spark(spec).alias("payload")
            )
            out = part if out is None else out.unionByName(part)
        return out

    return run


_TEXT_MEMBERS = {
    "metrics": (
        "text-metrics",
        [
            ("doc_id", "s"), ("lang", "s"), ("n_tokens", "s"), ("n_bpe_ish", "s"),
            ("mean_token_len", "f"), ("stopword_ratio", "f"), ("punct_ratio", "f"),
            ("upper_ratio", "f"), ("lang_pred", "s"), ("fp", "s"), ("norm_text", "s"),
        ],
    ),
    "chunk": (
        "text-chunk",
        [("doc_id", "s"), ("chunk_id", "s"), ("chunk_text", "s"), ("n_tokens", "s")],
    ),
    "redact": (
        "redact-pii",
        [
            ("c_custkey", "s"), ("n_email", "s"), ("n_phone", "s"),
            ("n_ipv4", "s"), ("redacted", "s"),
        ],
    ),
}

_UDF_MEMBERS = {
    "allele_freq": ("udf-allele-freq", [("l_orderkey", "s"), ("freqInt", "f")]),
    "pop_merge": ("udf-pop-merge", [("o_custkey", "s"), ("merged", "s")]),
    "pyudtf": (
        "udtf-python-sentences",
        [("doc_id", "s"), ("sent_id", "s"), ("sentence", "s"), ("n_words", "s")],
    ),
}

_STREAM_MEMBERS = {
    "window": (
        "stream-window-agg",
        [("win_start", "s"), ("event_type", "s"), ("n_events", "s"), ("value_sum", "f")],
    ),
    "session": (
        "stream-sessionize-batch",
        [
            ("user_id", "s"), ("session_start", "s"), ("session_end", "s"),
            ("n_events", "s"), ("value_sum", "f"),
        ],
    ),
    "sliding": (
        "stream-sliding-window-agg",
        [("win_start", "s"), ("event_type", "s"), ("n_events", "s"), ("value_sum", "f")],
    ),
    "dedup": (
        "stream-dedup",
        [
            ("event_id", "s"), ("user_id", "s"), ("event_type", "s"),
            ("ts_us", "s"), ("val_c", "s"),
        ],
    ),
    "leftjoin": (
        "stream-interval-left-join",
        [
            ("user_id", "s"), ("click_id", "s"), ("ts_click", "s"),
            ("conv_id", "s"), ("ts_conv", "s"),
        ],
    ),
    "trending": (
        "stream-trending-topk",
        [("win_start", "s"), ("event_type", "s"), ("n_events", "s"), ("rnk", "s")],
    ),
    "incrdedup": (
        "stream-dedup-incremental",
        [("id_new", "s"), ("id_match", "s"), ("jaccard", "f")],
    ),
}

_SCAN_MEMBERS = {
    "vcf": (
        "scan-text-vcf",
        [
            ("chrom_n", "s"), ("chrom", "s"), ("pos", "s"), ("id", "s"), ("ref", "s"),
            ("alt", "s"), ("qual", "s"), ("filter", "s"), ("info", "s"),
            ("format", "s"), ("sample", "s"), ("sample_id", "s"),
        ],
    ),
    "jsonl": (
        "scan-jsonl",
        [
            ("doc_id", "s"), ("text", "s"), ("lang", "s"), ("source", "s"),
            ("score", "f"), ("corrupt", "s"),
        ],
    ),
    "annotation": (
        "scan-text-annotation",
        [("chrom", "s"), ("pos", "s"), ("ref", "s"), ("alt", "s"), ("umd", "s")],
    ),
    "orc": (
        "sink-orc-roundtrip",
        [
            ("l_returnflag", "s"), ("l_linestatus", "s"), ("n", "s"),
            ("price_cents", "s"),
        ],
    ),
}

_SKETCH_MEMBERS = {
    "kmv": (
        "sketch-kmv-distinct",
        [
            ("part", "s"), ("k", "s"), ("n_mins", "s"), ("h_k", "s"),
            ("est", "s"), ("n_exact", "s"),
        ],
    ),
    "cms": (
        "sketch-cms-heavy",
        [("key", "s"), ("est", "s"), ("n_exact", "s"), ("n_total", "s")],
    ),
    "kmvsetops": (
        "sketch-kmv-setops",
        [
            ("k", "s"), ("ka", "s"), ("kb", "s"), ("ku", "s"),
            ("est_a", "s"), ("est_b", "s"), ("est_union", "s"),
            ("inter_cnt", "s"), ("est_inter", "s"), ("n_a", "s"),
            ("n_b", "s"), ("n_union", "s"), ("n_inter", "s"),
            ("ok_a", "s"), ("ok_b", "s"), ("ok_union", "s"),
        ],
    ),
    "squant": (
        "sketch-sample-quantiles",
        [
            ("part", "s"), ("q_pct", "s"), ("ke", "s"), ("n", "s"),
            ("est_cents", "s"), ("exact_cents", "s"), ("lo_n", "s"),
            ("hi_n", "s"), ("verdict", "s"),
        ],
    ),
}


def _register(slug, members, doc):
    sql = "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS part, {_pack_sql(spec)} AS payload FROM ({ORACLES[m]})"
        for tag, (m, spec) in members.items()
    )
    fn = _suite_entry(members)
    fn.__doc__ = doc
    return query(slug, sql)(fn)


text_analysis_suite = _register(
    "text-analysis-suite",
    _TEXT_MEMBERS,
    "text-metrics ∪ text-chunk ∪ redact-pii, every member column packed "
    "(r5 window rotation; redact added r7 — VERDICT r6 item 4, the last "
    "LLM-pipeline operator without an oracle row).",
)
udf_suite = _register(
    "udf-suite",
    _UDF_MEMBERS,
    "udf-allele-freq ∪ udf-pop-merge ∪ udtf-python-sentences (a REAL "
    "Spark-4 @udtf Python table function, Arrow-batched, in a "
    "correlated LATERAL join), packed (r5 window rotation; pyudtf r7).",
)
stream_agg_suite = _register(
    "stream-agg-suite",
    _STREAM_MEMBERS,
    "stream-window-agg ∪ stream-sessionize-batch batch-twin checks ∪ "
    "stream-dedup (a REAL availableNow dropDuplicatesWithinWatermark "
    "stream with cross-batch duplicates) ∪ stream-interval-left-join "
    "(the watermarked LEFT OUTER stream-stream join's batch twin, "
    "NULL outer rows checked) ∪ stream-trending-topk (the serving-layer "
    "rank over watermark-closed sliding counts, sentinel-flush "
    "e2e-proven, r7s5), packed (r5 window rotation; dedup + "
    "left-join r7); r9 adds stream-dedup-incremental — a LIVE "
    "foreachBatch ingest stream matching each micro-batch against the "
    "accumulated corpus LSH index, its batch-ordered emission rule "
    "replayed as SQL.",
)
scan_source_suite = _register(
    "scan-source-suite",
    _SCAN_MEMBERS,
    "scan-text-vcf ∪ scan-jsonl fixture scans with hand-derived VALUES twins, "
    "packed (r5 window rotation).",
)
sketch_suite = _register(
    "sketch-suite",
    _SKETCH_MEMBERS,
    "sketch-kmv-distinct ∪ sketch-cms-heavy — both engine-replayable sketch "
    "families in one slot (r5 window rotation); r9 adds "
    "sketch-sample-quantiles (deterministic bottom-k hash-sample quantiles: "
    "exact sketch replay + mergeability proof + oracle-pinned DKW "
    "rank-error verdict) and sketch-kmv-setops (theta-style "
    "union/intersection estimates from merged KMV sketches, "
    "error-bound-certified).",
)


# -------------------- r5 third rotation (session 3): cover EVERY
# oracle-backed capability with a driver row. Same full-payload
# tagged-union contract as above — every member column packed.

_QUANTILE_MEMBERS = {
    "exact": ("quantile-group-exact", [("l_returnflag", "s"), ("pct", "s"), ("q", "f")]),
    "histogram": (
        "quantile-group-histogram",
        [("l_returnflag", "s"), ("pct", "s"), ("q_est", "f")],
    ),
    "mad": (
        "quantile-mad",
        [("l_returnflag", "s"), ("med_cents", "s"), ("mad_cents", "s")],
    ),
    "wmedian": (
        "quantile-weighted-median",
        [("l_returnflag", "s"), ("w_total", "s"), ("wmedian", "s")],
    ),
    "wpcts": (
        "quantile-weighted-pcts",
        [("l_returnflag", "s"), ("pct", "s"), ("w_total", "s"), ("wq", "s")],
    ),
    "cont": (
        "quantile-cont-interp",
        [("g", "s"), ("pct", "s"), ("interp_c100", "s")],
    ),
    "winsor": (
        "quality-winsorize",
        [
            ("l_orderkey", "s"), ("l_linenumber", "s"), ("g", "s"),
            ("cents", "s"), ("cents_wins", "s"), ("clipped", "s"),
        ],
    ),
}

_WINDOW_MEMBERS = {
    "rfs": (
        "window-rank-first-running-sum",
        [("part", "s"), ("o_custkey", "s"), ("o_orderkey", "s"), ("v1", "s"), ("v2", "s")],
    ),
    "nav": (
        "window-lag-lead-ntile",
        [
            ("o_custkey", "s"), ("o_orderkey", "s"), ("prev_order", "s"),
            ("next_order", "s"), ("quartile", "s"), ("days_since_prev", "s"),
        ],
    ),
    "rownum": ("global-row-number", [("o_orderkey", "s"), ("row_num", "s")]),
    "dist": (
        "window-dist-functions",
        [
            ("o_custkey", "s"), ("o_orderkey", "s"), ("pr", "f"), ("cd", "f"),
            ("second_order", "s"),
        ],
    ),
    "range": (
        "window-range-frame",
        [
            ("o_orderkey", "s"), ("o_custkey", "s"), ("d", "s"),
            ("roll7_cents", "s"),
        ],
    ),
    "rollingdistinct": (
        "window-rolling-distinct",
        [
            ("user_id", "s"), ("event_id", "s"), ("n_types_10", "s"),
            ("n_types_cum", "s"),
        ],
    ),
}

_SORT_SET_MEMBERS = {
    "union": ("set-union", [("o_orderkey", "s"), ("o_totalprice", "f"), ("src", "s")]),
    "sortpart": (
        "sort-within-partitions",
        [("l_orderkey", "s"), ("l_linenumber", "s"), ("l_partkey", "s")],
    ),
    "topk": ("topk", [("o_orderkey", "s"), ("o_totalprice", "f")]),
    "sortglobal": ("sort-global", [("o_orderkey", "s"), ("o_totalprice", "f")]),
    "exint": ("set-except-intersect", [("part", "s"), ("o_custkey", "s")]),
    "hilbert": (
        "layout-hilbert-index",
        [("o_orderkey", "s"), ("hx", "s"), ("hy", "s"), ("hilbert_d", "s")],
    ),
    "bucketed": (
        "layout-bucketed-join",
        [
            ("c_custkey", "s"), ("c_mktsegment", "s"), ("n_orders", "s"),
            ("price_cents", "s"),
        ],
    ),
    "zorder": (
        "layout-zorder-key",
        [("o_orderkey", "s"), ("hx", "s"), ("hy", "s"), ("zkey", "s")],
    ),
    "compaction": (
        "layout-compaction-plan",
        [("file_id", "s"), ("n_rows", "s"), ("target_bin", "s")],
    ),
    "skyline": (
        "sort-skyline-pareto",
        [("p_partkey", "s"), ("price_c", "s"), ("p_size", "s")],
    ),
    "hilbert3d": (
        "layout-hilbert-3d",
        [
            ("event_id", "s"), ("hx", "s"), ("hy", "s"), ("hz", "s"),
            ("hilbert_d", "s"),
        ],
    ),
}

_DEDUP_MISC_MEMBERS = {
    "simhash": ("dedup-simhash", [("id_a", "s"), ("id_b", "s"), ("hamming", "s")]),
    "contamination": (
        "dedup-contamination",
        [("doc_id", "s"), ("worst_benchmark_id", "s"), ("overlap_frac", "f")],
    ),
    "components": (
        "dedup-components",
        [("component", "s"), ("n_members", "s"), ("member_ids", "s")],
    ),
    "linededup": (
        "text-line-dedup",
        [("part", "s"), ("doc_id", "s"), ("text", "s"), ("n_lines", "s"), ("n_kept", "s")],
    ),
    "containment": (
        "dedup-containment",
        [("id_a", "s"), ("id_b", "s"), ("c_a_in_b", "f"), ("c_b_in_a", "f")],
    ),
    "prefixfilter": (
        "dedup-jaccard-prefix",
        [("id_a", "s"), ("id_b", "s"), ("jaccard", "f")],
    ),
    "spans": (
        "dedup-duplicated-spans",
        [
            ("id_a", "s"), ("id_b", "s"), ("n_spans", "s"),
            ("max_span_tokens", "s"), ("dup_tokens_a", "s"), ("longest_start_a", "s"),
        ],
    ),
    "exactsubstr": (
        "dedup-exact-substr",
        [
            ("doc_id", "s"), ("span_start", "s"), ("span_end", "s"),
            ("span_len", "s"), ("n_anchors", "s"),
        ],
    ),
    "cdc": (
        "dedup-cdc-chunks",
        [
            ("doc_id", "s"), ("n_chunks", "s"), ("n_dup_chunks", "s"),
            ("dup_chars", "s"), ("total_chars", "s"),
        ],
    ),
    "cdcincr": (
        "dedup-cdc-incremental",
        [
            ("doc_id", "s"), ("n_chunks", "s"), ("n_known_chunks", "s"),
            ("known_chars", "s"), ("total_chars", "s"), ("rejected", "s"),
        ],
    ),
}

_EMBEDDING_MEMBERS = {
    "brute": (
        "ann-cosine-topk",
        [("query_id", "s"), ("neighbor_id", "s"), ("rank", "s"), ("cos", "f")],
    ),
    "ivf": (
        "ann-ivf-topk",
        [("query_id", "s"), ("neighbor_id", "s"), ("rank", "s"), ("cos", "f")],
    ),
    "kmeans": (
        "ann-ivf-kmeans",
        [("query_id", "s"), ("neighbor_id", "s"), ("rank", "s"), ("cos", "f")],
    ),
    "int8": (
        "quantize-embedding-int8",
        [("vec_id", "s"), ("scale", "f"), ("q", "s"), ("err_max", "f")],
    ),
    "cosdup": (
        "dedup-embedding-cosine",
        [("id_a", "s"), ("id_b", "s"), ("cos", "f")],
    ),
    "lshpairs": (
        "similarity-lsh-pairs",
        [("id_a", "s"), ("id_b", "s"), ("cos", "f")],
    ),
    "pq": (
        "quantize-embedding-pq",
        [("vec_id", "s"), ("m", "s"), ("code", "s"), ("dist", "s")],
    ),
    "ivfpq": (
        "ann-ivfpq-topk",
        [("query_id", "s"), ("neighbor_id", "s"), ("rank", "s"), ("dist", "s")],
    ),
    "centl2": (
        "embedding-center-l2",
        [("vec_id", "s"), ("unit_micro", "s")],
    ),
    "semdedup": (
        "dedup-semantic",
        [("id", "s"), ("cluster", "s"), ("is_dup", "s"), ("dup_of", "s")],
    ),
    "mmr": (
        "search-mmr-rerank",
        [
            ("query_id", "s"), ("sel_rank", "s"), ("vec_id", "s"),
            ("rel", "f"), ("score", "f"),
        ],
    ),
    "probe": (
        "embedding-linear-probe",
        [("vec_id", "s"), ("label", "s"), ("y", "s"), ("score_micro", "s")],
    ),
    "losscurve": (
        "embedding-probe-loss-curve",
        [("iter", "s"), ("sse", "s")],
    ),
    "planted": (
        "embedding-probe-planted",
        [("vec_id", "s"), ("label", "s"), ("y", "s"), ("score_micro", "s")],
    ),
}

_BM25_MEMBERS = {
    "score": ("text-bm25", [("doc_id", "s"), ("score", "f")]),
    "topk": (
        "text-bm25-topk",
        [("query_id", "s"), ("doc_id", "s"), ("rank", "s"), ("score", "f")],
    ),
}

_TIMEGRID_MEMBERS = {
    "cappedsum": (
        "stateful-capped-sum",
        [("user_id", "s"), ("rn", "s"), ("delta", "s"), ("bal", "s")],
    ),
    "cappedglobal": (
        "stateful-capped-sum-global",
        [("day", "s"), ("rn", "s"), ("delta", "s"), ("bal", "s")],
    ),
    "ewma": (
        "timeseries-ewma",
        [("user_id", "s"), ("rn", "s"), ("x", "s"), ("ewma_micro", "s")],
    ),
    "holt": (
        "timeseries-holt",
        [
            ("user_id", "s"), ("rn", "s"), ("x", "s"),
            ("level_micro", "s"), ("trend_micro", "s"),
        ],
    ),
    "kaplanmeier": (
        "survival-kaplan-meier",
        [
            ("cohort", "s"), ("dur", "s"), ("n_risk", "s"),
            ("n_event", "s"), ("n_censor", "s"), ("surv_micro", "s"),
        ],
    ),
    "acf": (
        "timeseries-acf",
        [("user_id", "s"), ("lag", "s"), ("n", "s"), ("acf_micro", "s")],
    ),
    "attribution": (
        "attribution-last-touch",
        [
            ("user_id", "s"), ("purchase_id", "s"), ("touch_us", "s"),
            ("lag_us", "s"),
        ],
    ),
    "attrlinear": (
        "attribution-linear",
        [
            ("user_id", "s"), ("conv_id", "s"), ("touch_id", "s"),
            ("pos", "s"), ("n_touches", "s"), ("credit_micro", "s"),
        ],
    ),
    "ohlc": (
        "rollup-ohlc",
        [
            ("user_id", "s"), ("bucket", "s"), ("open_c", "s"), ("high_c", "s"),
            ("low_c", "s"), ("close_c", "s"), ("n_ticks", "s"), ("vol_c", "s"),
        ],
    ),
    "gapfill": (
        "rollup-gapfill",
        [
            ("user_id", "s"), ("bucket_start_us", "s"), ("n_events", "s"),
            ("value_sum", "f"), ("value_locf", "f"),
        ],
    ),
    "hierarchy": (
        "rollup-time-hierarchy",
        [("d", "s"), ("h", "s"), ("m", "s"), ("n_events", "s"), ("n_users", "s"), ("value_cents", "s")],
    ),
    "anomaly": (
        "timeseries-anomaly",
        [
            ("user_id", "s"), ("event_id", "s"), ("n_win", "s"), ("s_cents", "s"),
            ("q_cents2", "s"), ("verdict", "s"), ("ewma_micro_cents", "s"),
        ],
    ),
    "funnel": (
        "funnel-steps",
        [
            ("user_id", "s"), ("steps_completed", "s"), ("t_1", "s"),
            ("t_2", "s"), ("t_3", "s"),
        ],
    ),
    "funnelw": (
        "funnel-steps-windowed",
        [
            ("user_id", "s"), ("steps_completed", "s"), ("t_1", "s"),
            ("t_2", "s"), ("t_3", "s"),
        ],
    ),
    "cohort": (
        "cohort-retention",
        [("cohort_bucket", "s"), ("bucket_offset", "s"), ("n_users", "s")],
    ),
    "twap": (
        "rollup-twap",
        [
            ("user_id", "s"), ("n_obs", "s"), ("span_us", "s"),
            ("wsum_cents_us", "s"), ("twap_c4", "s"),
        ],
    ),
    "paths": (
        "session-paths",
        [("path", "s"), ("n_sessions", "s")],
    ),
    "markov": (
        "event-transition-matrix",
        [("state_from", "s"), ("state_to", "s"), ("n", "s"), ("p_micro", "s")],
    ),
    "pop": (
        "rollup-period-over-period",
        [
            ("seg", "s"), ("mon", "s"), ("rev_c", "s"), ("n_orders", "s"),
            ("mom_delta_c", "s"), ("mom_base_c", "s"),
            ("yoy_delta_c", "s"), ("yoy_base_c", "s"),
        ],
    ),
    "snaive": (
        "forecast-seasonal-naive",
        [
            ("user_id", "s"), ("n_eval", "s"), ("abs_err_sum_c", "s"),
            ("actual_sum_c", "s"),
        ],
    ),
    "rollmed": (
        "rollup-rolling-median",
        [
            ("o_orderkey", "s"), ("seg", "s"), ("cents", "s"),
            ("roll_med_cents", "s"),
        ],
    ),
    "drawdown": (
        "timeseries-drawdown",
        [
            ("user_id", "s"), ("n", "s"), ("peak_cents", "s"),
            ("max_drawdown_cents", "s"), ("equity_at_max_dd", "s"),
        ],
    ),
    "cusum": (
        "timeseries-cusum",
        [
            ("user_id", "s"), ("n", "s"), ("max_up", "s"), ("max_down", "s"),
            ("n_alarm_up", "s"), ("n_alarm_down", "s"),
            ("first_alarm_up_rn", "s"),
        ],
    ),
    "interp": (
        "rollup-interpolate-linear",
        [
            ("user_id", "s"), ("bucket_start_us", "s"), ("n_events", "s"),
            ("cents_known", "s"), ("interp_micro", "s"),
        ],
    ),
    "attrdecay": (
        "attribution-time-decay",
        [
            ("user_id", "s"), ("conv_id", "s"), ("touch_id", "s"),
            ("age_days", "s"), ("pos", "s"), ("w", "s"), ("wtot", "s"),
            ("credit_micro", "s"),
        ],
    ),
    "holtwinters": (
        "timeseries-holt-winters",
        [
            ("k", "s"), ("rn", "s"), ("x", "s"), ("level_micro", "s"),
            ("trend_micro", "s"), ("seasonal_micro", "s"),
        ],
    ),
    "lttb": (
        "rollup-lttb-downsample",
        [
            ("user_id", "s"), ("bucket", "s"), ("rn", "s"), ("ts_us", "s"),
            ("cents", "s"), ("area2", "s"),
        ],
    ),
    "rfm": (
        "rfm-segmentation",
        [
            ("user_id", "s"), ("r_days", "s"), ("f_n", "s"), ("m_cents", "s"),
            ("r_score", "s"), ("f_score", "s"), ("m_score", "s"),
        ],
    ),
    "ltv": (
        "ltv-cohort-revenue",
        [
            ("cohort", "s"), ("age_w", "s"), ("rev_c", "s"), ("payers", "s"),
            ("cohort_n", "s"), ("cum_rev_c", "s"), ("ltv_micro", "s"),
        ],
    ),
    "lttbproper": (
        "rollup-lttb-proper",
        [
            ("g", "s"), ("sel_idx", "s"), ("rn", "s"), ("x", "s"),
            ("y", "s"),
        ],
    ),
    "seasdec": (
        "rollup-seasonal-decompose",
        [
            ("k", "s"), ("day", "s"), ("x", "s"), ("trend_sum7", "s"),
            ("dow", "s"), ("seasonal_c7_micro", "s"),
            ("remainder_micro", "s"),
        ],
    ),
    "mktheil": (
        "agg-mann-kendall-theil-sen",
        [
            ("user_id", "s"), ("n", "s"), ("m_pairs", "s"), ("s_stat", "s"),
            ("var18", "s"), ("theil_slope_micro", "s"), ("z_micro", "s"),
        ],
    ),
    "isotonic": (
        "ml-isotonic-calibration",
        [
            ("user_id", "s"), ("rn", "s"), ("event_id", "s"), ("x", "s"),
            ("fitted_micro", "s"),
        ],
    ),
    "markov": (
        "attribution-markov-removal",
        [
            ("channel", "s"), ("base_micro", "s"), ("removed_micro", "s"),
            ("removal_micro", "s"),
        ],
    ),
    "croston": (
        "forecast-croston",
        [
            ("item", "s"), ("rn", "s"), ("wk", "s"), ("z", "s"),
            ("gap", "s"), ("z_ewma_micro", "s"), ("p_ewma_micro", "s"),
            ("croston_micro", "s"),
        ],
    ),
    "pelt": (
        "changepoint-pelt",
        [
            ("k", "s"), ("seg_idx", "s"), ("start_m", "s"), ("end_m", "s"),
            ("seg_len", "s"), ("seg_sum", "s"), ("seg_cost", "s"),
            ("f_total", "s"), ("pen", "s"),
        ],
    ),
}

_PROFILE_MEMBERS = {
    "table": (
        "profile-table",
        [
            ("column", "s"), ("n_rows", "s"), ("n_nulls", "s"), ("n_distinct", "s"),
            ("min_str", "s"), ("max_str", "s"),
        ],
    ),
    "drift": (
        "profile-drift",
        [("bin", "s"), ("n_ref", "s"), ("n_cur", "s"), ("term_micro", "s"), ("psi_micro", "s")],
    ),
    "entropy": (
        "profile-entropy",
        [
            ("n_a", "s"), ("n_b", "s"), ("h_a_micro", "s"), ("h_b_micro", "s"),
            ("h_m_micro", "s"), ("js_micro", "s"),
        ],
    ),
    "kanon": (
        "profile-kanonymity",
        [
            ("k", "s"), ("n_groups", "s"), ("n_violating_groups", "s"),
            ("rows_at_risk", "s"), ("min_group_size", "s"),
        ],
    ),
    "ldiv": (
        "profile-ldiversity",
        [
            ("l", "s"), ("n_groups", "s"), ("n_violating_groups", "s"),
            ("rows_at_risk", "s"), ("min_distinct", "s"),
        ],
    ),
    "ks": (
        "profile-ks-drift",
        [
            ("n1", "s"), ("n2", "s"), ("ks_num", "s"), ("ks_denom", "s"),
            ("ks_micro", "s"),
        ],
    ),
    "benford": (
        "quality-benford",
        [
            ("digit", "s"), ("obs", "s"), ("n_rows", "s"),
            ("expected_micro", "s"), ("chi2_term_micro", "s"),
        ],
    ),
    "gini": (
        "quality-gini",
        [
            ("g", "s"), ("n", "s"), ("sx", "s"), ("six_hi", "s"),
            ("six_lo", "s"), ("gini_micro", "s"),
        ],
    ),
    "chi2": (
        "quality-chi2-independence",
        [
            ("r", "s"), ("c", "s"), ("obs", "s"), ("row_tot", "s"),
            ("col_tot", "s"), ("n", "s"), ("chi2_term_micro", "s"),
        ],
    ),
    "mwu": (
        "quality-mannwhitney",
        [
            ("g", "s"), ("n1", "s"), ("n2", "s"), ("u1_doubled", "s"),
            ("u2_doubled", "s"), ("tie_cubed_sum", "s"), ("z_micro", "s"),
        ],
    ),
    "cramersv": (
        "quality-cramers-v",
        [
            ("r_levels", "s"), ("c_levels", "s"), ("n", "s"),
            ("chi2_sum_micro", "s"), ("cramers_v_micro", "s"),
        ],
    ),
    "theil": (
        "quality-theil-atkinson",
        [
            ("g", "s"), ("n", "s"), ("sx", "s"), ("theil_sum_micro", "s"),
            ("theil_micro", "s"), ("lnx_sum_micro", "s"),
            ("atkinson_micro", "s"),
        ],
    ),
    "auc": (
        "quality-auc",
        [("g", "s"), ("n1", "s"), ("n2", "s"), ("auc_micro", "s")],
    ),
    "profdiff": (
        "profile-diff",
        [
            ("column", "s"), ("status", "s"), ("n_rows_old", "s"),
            ("n_rows_new", "s"), ("n_nulls_old", "s"), ("n_nulls_new", "s"),
            ("n_distinct_old", "s"), ("n_distinct_new", "s"),
            ("distinct_delta", "s"), ("range_changed", "s"),
        ],
    ),
    "srm": (
        "ab-test-srm",
        [
            ("n_a", "s"), ("n_b", "s"), ("chi2_micro", "s"),
            ("srm_flag", "s"),
        ],
    ),
    "msprt": (
        "ab-test-msprt",
        [
            ("metric", "s"), ("n_a", "s"), ("n_b", "s"), ("x_a", "s"),
            ("x_b", "s"), ("ln_lambda_micro", "s"), ("msprt_reject", "s"),
        ],
    ),
    "bhfdr": (
        "ab-test-bh-fdr",
        [
            ("metric", "s"), ("n_a", "s"), ("n_b", "s"), ("x_a", "s"),
            ("x_b", "s"), ("z_micro", "s"), ("m_tests", "s"),
            ("bh_rank", "s"), ("thr_micro", "s"), ("rejected", "s"),
        ],
    ),
    "boot": (
        "ab-test-bootstrap",
        [
            ("b", "s"), ("swa", "s"), ("sxa", "s"), ("swb", "s"),
            ("sxb", "s"), ("diff_micro", "s"), ("rnk", "s"),
        ],
    ),
    "cuped": (
        "ab-test-cuped",
        [
            ("n", "s"), ("n_a", "s"), ("n_b", "s"), ("theta_micro", "s"),
            ("lift_centicents", "s"), ("adj_lift_centicents", "s"),
        ],
    ),
    "abtest": (
        "ab-test-proportions",
        [
            ("n_a", "s"), ("n_b", "s"), ("x_a", "s"), ("x_b", "s"),
            ("lift_micro", "s"), ("z_micro", "s"),
        ],
    ),
    "skew": (
        "profile-skew",
        [
            ("n_keys", "s"), ("n_rows", "s"), ("max_c", "s"),
            ("p50_c", "s"), ("p99_c", "s"), ("gini_micro", "s"),
        ],
    ),
}

_CDC_MEMBERS = {
    "merge": (
        "merge-upsert",
        [
            ("c_custkey", "s"), ("c_name", "s"), ("c_nationkey", "s"),
            ("c_acctbal", "f"), ("c_mktsegment", "s"),
        ],
    ),
    "scd2": (
        "scd2-history",
        [
            ("custkey", "s"), ("seg", "s"), ("st", "s"), ("valid_from", "s"),
            ("valid_to", "s"), ("version", "s"), ("is_current", "s"),
        ],
    ),
    "pit": (
        "scd2-point-in-time",
        [("custkey", "s"), ("fact_seq", "s"), ("seg", "s"), ("st", "s"), ("version", "s")],
    ),
    "diff": (
        "snapshot-diff",
        [
            ("c_custkey", "s"), ("c_name", "s"), ("c_nationkey", "s"),
            ("acct_cents", "s"), ("c_mktsegment", "s"), ("op", "s"),
        ],
    ),
    "cdf": (
        "scd2-change-feed",
        [
            ("custkey", "s"), ("seg", "s"), ("st", "s"), ("seq", "s"),
            ("op", "s"),
        ],
    ),
    "stream": (
        "stream-cdc-apply",
        [("k", "s"), ("seg", "s"), ("bal", "s")],
    ),
    "bitemporal": (
        "scd2-bitemporal",
        [("o_orderkey", "s"), ("part", "s"), ("price_c", "s"), ("src", "s")],
    ),
    "bucketsum": (
        "validate-bucket-checksum",
        [
            ("bucket", "s"), ("n_old", "s"), ("n_new", "s"),
            ("sum_old", "s"), ("sum_new", "s"),
            ("xor_old", "s"), ("xor_new", "s"),
        ],
    ),
    "mvrefresh": (
        "cdc-mv-refresh",
        [("g", "s"), ("n", "s"), ("cents", "s")],
    ),
}

_FN_STRUCT_MEMBERS = {
    "annotation": (
        "fn-annotation-parse",
        [
            ("l_orderkey", "s"), ("l_linenumber", "s"), ("sift_pred", "s"),
            ("sift_score", "f"), ("pp_score", "f"), ("mt", "s"), ("cadd", "f"),
            ("clinvar_f", "s"), ("gp1_af", "f"), ("exac", "f"),
        ],
    ),
    "json": (
        "fn-json-extract",
        [("event_type", "s"), ("k_bucket", "s"), ("n", "s"), ("k_sum", "s"), ("k_max", "s")],
    ),
}

_TEXT_TOKEN_MEMBERS = {
    "vocab": ("text-vocab-topk", [("w", "s"), ("cnt", "s")]),
    "bpe": ("text-bpe-pairs", [("pair", "s"), ("freq", "s")]),
    "pmi": (
        "text-bigram-pmi",
        [("w1", "s"), ("w2", "s"), ("n_pair", "s"), ("pmi_micro", "s")],
    ),
    "tfidf": (
        "text-tfidf-topk",
        [("doc_id", "s"), ("w", "s"), ("tf", "s"), ("score_micro", "s")],
    ),
    "bpetrain": (
        "text-bpe-train",
        [("part", "s"), ("k", "s"), ("a", "s"), ("b", "s"), ("s", "s"),
         ("cnt", "s")],
    ),
    "bpeencode": (
        "text-bpe-encode",
        [("doc_id", "s"), ("token_id", "s"), ("tok", "s"), ("cnt", "s")],
    ),
    "rrf": (
        "search-rrf-fusion",
        [("query_id", "s"), ("doc_id", "s"), ("rrf_micro", "s"),
         ("rank_bm25", "s"), ("rank_tf", "s"), ("fused_rank", "s")],
    ),
    "ftplanted": (
        "text-fasttext-planted",
        [("doc_id", "s"), ("n_feat", "s"), ("score_micro", "s"),
         ("y", "s")],
    ),
}

_RESHAPE_OLAP_MEMBERS = {
    "pivot": ("pivot-unpivot", [("o_orderpriority", "s"), ("status", "s"), ("total", "f")]),
    "cube": ("agg-cube", [("status", "s"), ("priority", "s"), ("n", "s"), ("total", "f")]),
    "gsets": (
        "agg-grouping-sets",
        [("status", "s"), ("priority", "s"), ("n", "s"), ("total", "f")],
    ),
    "q1": (
        "tpch-q1-rollup",
        [
            ("rf", "s"), ("ls", "s"), ("sum_qty", "s"), ("sum_base_price", "f"),
            ("sum_disc_price", "f"), ("count_order", "s"),
        ],
    ),
    "q3": ("tpch-q3", [("l_orderkey", "s"), ("revenue", "f"), ("orderdate", "s")]),
    "q5": ("tpch-q5", [("n_name", "s"), ("revenue", "f")]),
    "basket": (
        "copurchase-pairs",
        [("brand_a", "s"), ("brand_b", "s"), ("n_orders", "s")],
    ),
    "lift": (
        "copurchase-lift",
        [
            ("brand_a", "s"), ("brand_b", "s"), ("n_pair", "s"),
            ("conf_a_to_b", "s"), ("lift_micro", "s"),
        ],
    ),
    "q4": ("tpch-q4", [("o_orderpriority", "s"), ("order_count", "s")]),
    "q13": ("tpch-q13", [("c_count", "s"), ("custdist", "s")]),
    "q17": ("tpch-q17", [("avg_yearly", "f")]),
    "q18": (
        "tpch-q18",
        [
            ("c_custkey", "s"), ("o_orderkey", "s"), ("total_qty_c", "s"),
            ("price_c", "s"),
        ],
    ),
    "q10": (
        "tpch-q10",
        [
            ("c_custkey", "s"), ("c_name", "s"), ("n_name", "s"),
            ("acctbal_c", "s"), ("revenue_c2", "s"),
        ],
    ),
    "q14": (
        "tpch-q14",
        [("promo_rev_c2", "s"), ("total_rev_c2", "s"), ("n_items", "s")],
    ),
    "q19": ("tpch-q19", [("revenue_c2", "s"), ("n_rows", "s")]),
    "q21": ("tpch-q21", [("s_suppkey", "s"), ("s_name", "s"), ("numwait", "s")]),
    "triples": (
        "copurchase-triples",
        [
            ("brand_a", "s"), ("brand_b", "s"), ("brand_c", "s"),
            ("n_orders", "s"),
        ],
    ),
    "q22": (
        "tpch-q22",
        [("cntrycode", "s"), ("numcust", "s"), ("totacctbal_c", "s")],
    ),
    "q6": ("tpch-q6", [("revenue_c2", "s"), ("n_rows", "s")]),
    "q7": (
        "tpch-q7",
        [
            ("supp_nation", "s"), ("cust_nation", "s"), ("l_year", "s"),
            ("revenue_c2", "s"), ("n_lines", "s"),
        ],
    ),
    "q8": (
        "tpch-q8",
        [("o_year", "s"), ("bloc_rev_c2", "s"), ("total_rev_c2", "s")],
    ),
    "q12": (
        "tpch-q12",
        [("ship_bucket", "s"), ("high_line_count", "s"), ("low_line_count", "s")],
    ),
    "q15": (
        "tpch-q15",
        [("s_suppkey", "s"), ("s_name", "s"), ("total_rev_c2", "s")],
    ),
    "q2": (
        "tpch-q2",
        [
            ("ps_partkey", "s"), ("ps_suppkey", "s"), ("ps_supplycost_c", "s"),
            ("s_name", "s"), ("n_name", "s"), ("bal_c", "s"),
        ],
    ),
    "q9": ("tpch-q9", [("nation", "s"), ("o_year", "s"), ("profit_c2", "s")]),
    "q11": (
        "tpch-q11", [("ps_partkey", "s"), ("value_c", "s"), ("total_c", "s")]
    ),
    "q16": (
        "tpch-q16",
        [("p_brand", "s"), ("p_type", "s"), ("p_size", "s"), ("supplier_cnt", "s")],
    ),
    "q20": ("tpch-q20", [("s_suppkey", "s"), ("s_name", "s")]),
    "kappa": (
        "quality-cohen-kappa",
        [("n", "s"), ("agree", "s"), ("chance_pairs", "s"), ("kappa_micro", "s")],
    ),
}

quantile_suite = _register(
    "quantile-suite", _QUANTILE_MEMBERS,
    "quantile-group-exact ∪ quantile-group-histogram ∪ quantile-mad ∪ "
    "quantile-weighted-median ∪ quantile-cont-interp — exact grouped "
    "percentiles (DISC), SQL-standard PERCENTILE_CONT with exact "
    "integer interpolation, the mergeable histogram estimator, robust "
    "median/MAD dispersion, the weighted median, and per-group P05-P95 "
    "winsorization (exact bounds joined back, NULL-safe clip) in one "
    "slot (r5 third rotation; wmedian r6; cont + winsor r7).",
)
window_suite = _register(
    "window-suite", _WINDOW_MEMBERS,
    "window-rank-first-running-sum ∪ window-lag-lead-ntile ∪ "
    "global-row-number ∪ window-dist-functions ∪ window-range-frame — "
    "∪ window-rolling-distinct (count(DISTINCT) over trailing/"
    "cumulative frames via the collect_set rewrite Spark needs, "
    "proven against DuckDB's native DISTINCT window agg) — the full "
    "window-function family incl. value-defined RANGE frames "
    "(r5 third rotation; range added r6; rollingdistinct r7s5).",
)
sort_set_suite = _register(
    "sort-set-suite", _SORT_SET_MEMBERS,
    "set-union ∪ sort-within-partitions ∪ topk ∪ sort-global ∪ "
    "set-except-intersect ∪ layout-hilbert-index ∪ "
    "layout-bucketed-join ∪ layout-zorder-key ∪ "
    "layout-compaction-plan — the §2.5 sort/limit/set-op family plus "
    "the layout keys (Hilbert + Morton), the zero-shuffle "
    "bucketed-layout join, and the declarative small-file compaction "
    "planner, the 2-D Pareto skyline (running-min formulation "
    "proven against the NOT-EXISTS dominance spec), and the 3-D "
    "Hilbert key (Skilling transpose, generated 18-stage SQL unroll) "
    "(r5 third rotation; bucketed + zorder r6; compaction plan + "
    "skyline r7; hilbert3d r7s4).",
)
dedup_misc_suite = _register(
    "dedup-misc-suite", _DEDUP_MISC_MEMBERS,
    "dedup-simhash ∪ dedup-contamination ∪ dedup-components ∪ "
    "text-line-dedup ∪ dedup-duplicated-spans ∪ dedup-containment "
    "(asymmetric shingle containment — the short-doc-inside-long-doc "
    "class Jaccard misses) ∪ dedup-exact-substr (Lee et al. "
    "ExactSubstr corpus spans via sorted k-mer anchoring, r9) "
    "∪ dedup-cdc-incremental (live 3-batch availableNow drain against "
    "a persisted chunk-hash index — incremental CDC admission, r11) "
    "(r5 third rotation; containment r7).",
)
embedding_suite = _register(
    "embedding-suite", _EMBEDDING_MEMBERS,
    "ann-cosine-topk ∪ ann-ivf-topk ∪ quantize-embedding-int8 ∪ "
    "dedup-embedding-cosine ∪ similarity-lsh-pairs ∪ "
    "quantize-embedding-pq ∪ ann-ivfpq-topk — the embedding-column "
    "family incl. product-quantization codes and the composed "
    "IVF-PQ + exact-refine search, plus deterministic corpus "
    "mean-centering + L2 normalization (exact integer per-dim means) "
    "(r5 third rotation; supersedes "
    "ann-topk-suite's slot; the hyperplane-LSH scale path rides here "
    "so its old slot could go to graph-pagerank; pq + ivfpq r7; "
    "centl2 r7; r9 adds dedup-semantic — SemDeDup paraphrase-level "
    "dedup: pinned-seed clusters, within-cluster cosine prune, "
    "keep/drop verdicts oracle-replayed — and search-mmr-rerank, the "
    "greedy MMR diversity pass with its unrolled selection twin; r11 "
    "adds embedding-linear-probe, the in-engine dense GD linear probe "
    "with round-by-round oracle replay + AUC certification; r12 adds "
    "embedding-probe-planted, the planted-signal holdout whose "
    "held-out AUC >= 0.7 is a real learner acceptance gate).",
)
text_bm25_suite = _register(
    "text-bm25-suite", _BM25_MEMBERS,
    "text-bm25 ∪ text-bm25-topk (r5 third rotation).",
)
timegrid_suite = _register(
    "timegrid-suite", _TIMEGRID_MEMBERS,
    "stateful-capped-sum (the keyed clamped-balance scan, "
    "recursive-CTE oracle) ∪ stateful-capped-sum-global (the keyless "
    "monoid-composed parallel chunk scan) ∪ survival-kaplan-meier "
    "(product-limit estimator, pinned-IEEE float scan) ∪ "
    "timeseries-ewma (linear scan member, binary-exact alpha) ∪ "
    "timeseries-holt (the TWO-state level+trend member) ∪ "
    "rollup-gapfill ∪ rollup-time-hierarchy ∪ timeseries-anomaly ∪ "
    "funnel-steps ∪ funnel-steps-windowed ∪ cohort-retention ∪ "
    "rollup-twap ∪ session-paths ∪ event-transition-matrix — the "
    "time-series/event-analytics family: gap-filled buckets, calendar "
    "rollup, rolling z-score/EWMA, ordered funnels (plain + "
    "24h-conversion-window), cohort retention, time-weighted averages, "
    "session path mining "
    "plus lag-1..3 autocorrelation (grouped-corr doctrine), OHLC "
    "candlestick compaction, last-touch attribution (windowed "
    "running-max, join-free), and attribution-linear (exact integer "
    "multi-touch credit via per-conversion largest remainder, r7s4) "
    "plus the frame-bounded exact rolling median denoiser and the "
    "seasonal-naive forecast backtest (calendar-joined lag, exact MAE) "
    "and MoM/YoY period-over-period growth (calendar self-joins, NULL "
    "base periods preserved) "
    "(r5 third rotation; funnelw + twap + paths r6; acf + ohlc + "
    "attribution + rollmed r7) plus r7s5: max-drawdown, two-sided "
    "CUSUM changepoints (closed-form clamped prefix sums), linear "
    "gap interpolation (exact int64 lerp), time-decay attribution "
    "(dyadic half-life weights, largest-remainder credits), and "
    "Holt-Winters weekly seasonality (vector-state scan, LIST-ring "
    "recursive-CTE oracle), LTOB downsampling (shape-preserving "
    "decimation, exact integer triangle areas), RFM quintile "
    "segmentation, and cohort LTV curves (exact-cents cumulative "
    "revenue per member); r8: LTTB proper (sequential three-bucket "
    "selection, unrolled-CTE HUGEINT oracle), classical seasonal "
    "decomposition (centered 7-sum trend, multiplied-through "
    "detrending), Markov removal-effect attribution (exact-integer "
    "absorbing-chain value iteration, 40-stage unrolled twin), "
    "isotonic calibration (PAVA scan vs the minimax oracle), and the "
    "Mann-Kendall + Theil-Sen robust trend pair; r9: PELT optimal "
    "changepoint segmentation (quantized-SSE DP, list-carrying "
    "recursive-CTE twin certifying pruning losslessness) and "
    "Croston's intermittent-demand forecaster (two ewma scans — "
    "non-zero sizes + inter-arrival gaps — ratioed in micro).",
)
profile_suite = _register(
    "profile-suite", _PROFILE_MEMBERS,
    "profile-table ∪ profile-drift (PSI) ∪ profile-entropy "
    "(Shannon + Jensen-Shannon divergence) ∪ profile-kanonymity "
    "∪ profile-ldiversity (the homogeneity-attack audit, r7s4) — "
    "∪ profile-ks-drift (exact two-sample Kolmogorov-Smirnov as an "
    "integer fraction) ∪ quality-benford (first-digit law + "
    "chi-square terms) ∪ quality-gini (exact concentration index) "
    "∪ quality-chi2-independence (categorical association, zero "
    "cells included) ∪ quality-mannwhitney (tie-corrected doubled-"
    "rank U + z) — data-quality + privacy profiling (r5 third "
    "rotation; entropy + ks + benford r7; gini + chi2 + mwu r7s4; "
    "cramers-v + theil/atkinson + exact-integer AUC + profile-diff "
    "(the STRUCTURAL drift view: snapshot profiles full-outer-joined, "
    "added/dropped columns + stat deltas) r7s5) ∪ profile-skew "
    "(the pre-shuffle key-skew report: exact Gini + p50/p99 key "
    "counts at counts-of-counts grain, r8) ∪ ab-test-proportions "
    "(pooled two-proportion z, r8) ∪ ab-test-cuped (CUPED "
    "variance-reduced lift, pooled theta from exact moments, r8) ∪ "
    "ab-test-srm (the sample-ratio-mismatch guardrail, exact-integer "
    "chi2 vs the 3.841459 critical value, r8) ∪ ab-test-bh-fdr "
    "(Benjamini-Hochberg FDR over the per-metric z family — rank "
    "arithmetic vs a pinned inverse-normal micro table, r9) ∪ "
    "ab-test-msprt (always-valid mixture SPRT in log space — "
    "nano-rounded single ln, no exp, r9).",
)
cdc_suite = _register(
    "cdc-suite", _CDC_MEMBERS,
    "merge-upsert ∪ scd2-history ∪ scd2-point-in-time ∪ snapshot-diff "
    "∪ scd2-change-feed ∪ stream-cdc-apply ∪ validate-bucket-checksum "
    "— the CDC family: MERGE INTO apply, SCD Type-2 history, the "
    "temporal point-in-time fact join, BOTH inverse pairs — table-diff "
    "(I/U/D changesets) and the change-data-feed reconstruction from "
    "history — the REAL streaming MERGE maintenance loop checked "
    "against batch-MERGE DuckDB semantics, plus Merkle-style bucket "
    "checksums for O(buckets) drift detection before a row-level diff "
    "(r5 third rotation; diff + cdf r6; stream + bucketsum r7) ∪ "
    "scd2-bitemporal (valid-time x transaction-time as-of lookups over "
    "a retroactive-correction history — the fourth temporal shape, "
    "r7s5) ∪ cdc-mv-refresh (incremental SUM/COUNT view maintenance "
    "certified equal to recompute, r8).",
)
fn_struct_parse_suite = _register(
    "fn-struct-parse-suite", _FN_STRUCT_MEMBERS,
    "fn-annotation-parse ∪ fn-json-extract — structured-string parsing "
    "(dbNSFP annotation maps, JSON props) (r5 third rotation).",
)
text_token_suite = _register(
    "text-token-suite", _TEXT_TOKEN_MEMBERS,
    "text-vocab-topk ∪ text-bpe-pairs ∪ text-bigram-pmi ∪ "
    "text-tfidf-topk — tokenizer/phrase-induction statistics incl. "
    "PMI collocations and per-doc TF-IDF keyword extraction "
    "(r5 third rotation; pmi r6; tfidf r7) ∪ text-bpe-train (actual "
    "3-round BPE merge learning, double-space replace encoding, r9) "
    "∪ text-bpe-encode (the learned merges applied CORPUS-WIDE to "
    "per-doc token-id bags — tokenizer application at scale, r10) "
    "∪ search-rrf-fusion (reciprocal-rank hybrid-retrieval fusion, "
    "exact-integer scores, r9).",
)
reshape_olap_suite = _register(
    "reshape-olap-suite", _RESHAPE_OLAP_MEMBERS,
    "pivot-unpivot ∪ agg-cube ∪ agg-grouping-sets (explicit "
    "marginals+total sets) ∪ tpch-q1-rollup ∪ tpch-q3 ∪ tpch-q5 ∪ "
    "copurchase-pairs ∪ copurchase-lift ∪ tpch-q4/q13/q17/q18 ∪ "
    "tpch-q10/q14/q19/q21/q22 ∪ tpch-q2/q9/q11/q16/q20 (the partsupp "
    "shapes over the lineitem-derived observed-pair table — ALL 22 "
    "TPC-H queries now represented, r7s5) ∪ quality-cohen-kappa "
    "(chance-corrected rater agreement, pure integers, r7s5) — "
    "reshape + grouping-sets + the TPC-H "
    "showcases: Q1/Q3/Q5 (6-way star join), the full decorrelation "
    "family (Q4 EXISTS, Q13 outer-join count-with-zeros, Q17 "
    "correlated scalar avg, Q18 HAVING-join-back, Q21 EXISTS+NOT "
    "EXISTS self-join rewrite, Q22 scalar-avg + anti-join), Q10 "
    "returned-revenue report, Q14 conditional-agg ratio, Q19 "
    "disjunctive-predicate join, + market-basket "
    "support/confidence/lift and Apriori 3-itemsets (r5 third "
    "rotation; basket + lift + q5 r6; q4..q22 family + triples r7; "
    "q6/q7/q8/q12/q15 complete the feasible TPC-H set r7).",
)


_MIX_FULL_MEMBERS = {
    "quota": ("mix-quota-source", [("doc_id", "s"), ("source", "s")]),
    "weighted": ("mix-weighted-sources", [("doc_id", "s"), ("source", "s")]),
    "sample": (
        "mix-weighted-sample",
        [("doc_id", "s"), ("source", "s"), ("n_chars", "s"), ("es_key_nano", "s")],
    ),
    "baltemp": (
        "mix-balance-temperature",
        [("part", "s"), ("doc_id", "s"), ("source", "s")],
    ),
    "reservoir": (
        "mix-reservoir-replacement",
        [("source", "s"), ("draw", "s"), ("doc_id", "s"), ("key_nano", "s")],
    ),
    "epochshuffle": (
        "mix-epoch-shuffle",
        [("doc_id", "s"), ("epoch", "s"), ("h", "s"), ("shard", "s"),
         ("pos", "s")],
    ),
    "dsir": (
        "mix-dsir-select",
        [("doc_id", "s"), ("n_toks", "s"), ("weight_micro", "s"),
         ("sel_rank", "s")],
    ),
}

mix_full_suite = _register(
    "mix-full-suite", _MIX_FULL_MEMBERS,
    "mix-quota-source ∪ mix-weighted-sources ∪ mix-weighted-sample "
    "(Efraimidis-Spirakis) ∪ mix-balance-temperature (alpha=0.5 "
    "temperature rates + exact class balancing) ∪ "
    "mix-reservoir-replacement (k independent with-replacement draws) "
    "∪ mix-epoch-shuffle (deterministic per-epoch training-order "
    "permutation, shard-parallel, r9) ∪ mix-dsir-select (DSIR "
    "importance selection under hashed unigram models, r9) "
    "— the full source-mixing family "
    "(r5 third rotation; reservoir added r6).",
)

_AGG_DISTINCT_EXTREMA_MEMBERS = {
    "distinct": (
        "agg-count-distinct-reduce",
        [("part", "s"), ("k1", "s"), ("k2", "s"), ("n1", "s"), ("n2", "s")],
    ),
    "modeargmax": (
        "agg-mode-argmax",
        [
            ("o_orderpriority", "s"), ("mode_status", "s"),
            ("argmax_order", "s"), ("argmin_order", "s"),
        ],
    ),
    "corr": (
        "agg-grouped-corr",
        [
            ("l_returnflag", "s"), ("n", "s"), ("sx", "s"), ("sy", "s"),
            ("sxy_hi", "s"), ("sxy_lo", "s"), ("corr_micro", "s"),
        ],
    ),
    "spearman": (
        "agg-spearman-corr",
        [("g", "s"), ("n", "s"), ("spearman_micro", "s")],
    ),
    "ols": (
        "agg-ols-regression",
        [
            ("l_returnflag", "s"), ("n", "s"), ("sx", "s"), ("sy", "s"),
            ("slope_micro", "s"), ("intercept_micro", "s"), ("r2_micro", "s"),
        ],
    ),
    "kendall": (
        "agg-kendall-tau",
        [
            ("g", "s"), ("n", "s"), ("disc_swaps", "s"), ("n0", "s"),
            ("n1", "s"), ("n2", "s"), ("n3", "s"), ("tau_micro", "s"),
        ],
    ),
}

agg_distinct_extrema_suite = _register(
    "agg-distinct-extrema-suite", _AGG_DISTINCT_EXTREMA_MEMBERS,
    "agg-count-distinct-reduce ∪ agg-mode-argmax ∪ agg-grouped-corr ∪ "
    "agg-spearman-corr — distinct-count reductions, deterministic "
    "mode/argmax/argmin, Pearson correlation from exact int64 moments, "
    "and Spearman rank correlation with exact doubled-average-rank tie "
    "handling (r5 third rotation; spearman r7) ∪ agg-kendall-tau "
    "(Knight's O(n log n) concordance; since r8 the oracle counts "
    "inversions per merge level in O(n log n) too, unlocking sf10 "
    "parity) — the correlation family complete.",
)

_JOIN_FILTER_MEMBERS = {
    "semianti": (
        "join-semi-anti",
        [("part", "s"), ("c_custkey", "s"), ("c_name", "s")],
    ),
    "bloom": (
        "join-bloom-prefilter",
        [("c_custkey", "s"), ("actually_present", "s")],
    ),
    "nullsafe": (
        "join-null-safe",
        [("k", "s"), ("n_orders", "s"), ("n_cust", "s")],
    ),
    "snlink": (
        "link-sorted-neighborhood",
        [
            ("a_key", "s"), ("b_key", "s"), ("rn_a", "s"), ("rn_b", "s"),
            ("ag_name", "s"), ("ag_phone", "s"), ("ag_seg", "s"),
            ("ag_bal", "s"), ("score_nano", "s"), ("decision", "s"),
            ("is_true", "s"),
        ],
    ),
    "fslink": (
        "link-fellegi-sunter",
        [
            ("a_key", "s"), ("b_key", "s"), ("ag_name", "s"), ("ag_phone", "s"),
            ("ag_seg", "s"), ("ag_bal", "s"), ("score_nano", "s"),
            ("decision", "s"), ("is_true", "s"),
        ],
    ),
}

join_filter_suite = _register(
    "join-filter-suite", _JOIN_FILTER_MEMBERS,
    "join-semi-anti ∪ join-bloom-prefilter ∪ join-null-safe — "
    "existence-filtering joins (semi/anti), the fixed-size Bloom "
    "prefilter with its bit arithmetic replayed by the oracle, and "
    "NULL-safe equality (<=>) join semantics (r5 third rotation; "
    "nullsafe added r7); r9 adds link-fellegi-sunter (probabilistic "
    "record linkage: blocked dirty-copy self-link, data-estimated u "
    "probabilities, nano-integer log-likelihood weights, full "
    "confusion matrix oracle-certified) and link-sorted-neighborhood "
    "(the second blocking strategy — global rank window over the "
    "sorted union, same scorer, blocking recall MEASURED).",
)

_INTERVAL_MEMBERS = {
    "join": (
        "join-interval",
        [
            ("l_orderkey", "s"), ("l_linenumber", "s"), ("p", "s"),
            ("s_suppkey", "s"), ("lo", "s"), ("hi", "s"),
        ],
    ),
    "overlap": (
        "interval-overlap-count",
        [("user_id", "s"), ("n_intervals", "s"), ("max_concurrent", "s")],
    ),
    "regionjoin": (
        "interval-interval-join",
        [("user_id", "s"), ("l_event", "s"), ("r_event", "s"), ("overlap_us", "s")],
    ),
    "reciprocal": (
        "interval-reciprocal-join",
        [("user_id", "s"), ("l_event", "s"), ("r_event", "s"), ("overlap_us", "s")],
    ),
    "cidr": (
        "join-cidr-lookup",
        [
            ("c_custkey", "s"), ("ip", "s"), ("dotted", "s"),
            ("n_nationkey", "s"), ("n_name", "s"), ("block_id", "s"),
        ],
    ),
    "georadius": (
        "join-geo-radius",
        [
            ("c_custkey", "s"), ("px", "s"), ("py", "s"),
            ("n_nationkey", "s"), ("n_name", "s"), ("cx", "s"),
            ("cy", "s"), ("dist2", "s"),
        ],
    ),
    "pip": (
        "join-point-in-polygon",
        [("pid", "s"), ("px", "s"), ("py", "s"), ("poly_id", "s")],
    ),
}

interval_suite = _register(
    "interval-suite", _INTERVAL_MEMBERS,
    "join-interval ∪ interval-overlap-count ∪ interval-interval-join ∪ "
    "interval-reciprocal-join ∪ join-cidr-lookup — the interval "
    "family: banded point-in-range join, exact sweep-line "
    "peak-concurrency, the banded region×region overlap join, its "
    "50%-reciprocal-overlap variant (bedtools -f -r semantics), and "
    "the IP-to-CIDR enrichment join where block alignment makes the "
    "banded form a pure equi-join ∪ join-geo-radius (the 2-D grid "
    "sibling: 3x3-neighborhood cell join, exact integer distances) "
    "(r5 third rotation; regionjoin r6; reciprocal r7; cidr + "
    "georadius r7s4) ∪ join-point-in-polygon (exact int64 ray-cast "
    "containment against broadcast grid-bucketed polygons, concave "
    "shapes included — bbox brute-force oracle, r7s5).",
)

_GRAPH_MEMBERS = {
    "pagerank": ("graph-pagerank", [("node", "s"), ("rank_micro", "s")]),
    "bfs": ("graph-bfs-levels", [("node", "s"), ("level", "s")]),
    "triangles": (
        "graph-triangle-count", [("node", "s"), ("n_triangles", "s")]
    ),
    "kcore": ("graph-kcore", [("node", "s"), ("core_deg", "s")]),
    "linkpred": (
        "graph-link-predict",
        [
            ("u", "s"), ("w", "s"), ("common", "s"), ("du", "s"),
            ("dw", "s"), ("jaccard_micro", "s"),
        ],
    ),
    "assort": (
        "graph-assortativity",
        [
            ("m", "s"), ("sx", "s"), ("sxx", "s"), ("sxy", "s"),
            ("assort_micro", "s"),
        ],
    ),
    "clustering": (
        "graph-clustering-coeff",
        [("node", "s"), ("d", "s"), ("n_triangles", "s"), ("clustering_micro", "s")],
    ),
    "lpa": (
        "graph-label-propagation",
        [("node", "s"), ("label", "s")],
    ),
    "harmonic": (
        "graph-harmonic-centrality",
        [("node", "s"), ("n_reached", "s"), ("harmonic_micro", "s")],
    ),
}

graph_suite = _register(
    "graph-suite", _GRAPH_MEMBERS,
    "graph-pagerank ∪ graph-bfs-levels ∪ graph-triangle-count ∪ "
    "graph-kcore — graph algorithms: exact-integer PageRank, bounded "
    "multi-source BFS matched against a genuine WITH RECURSIVE "
    "oracle, degree-ordered wedge-join triangle counting, and "
    "fixpoint k-core peeling vs an unrolled materialized-CTE twin "
    "(r5 third rotation; triangles r6; kcore r7; dedup-components "
    "rides dedup-misc-suite) ∪ graph-assortativity (Newman degree "
    "correlation over the edge double-cover, exact int64 moments, "
    "r7s5) ∪ graph-clustering-coeff (closed-wedge fraction riding "
    "the triangle counts, r7s5) ∪ graph-label-propagation "
    "(synchronous min-tiebreak LPA communities, unrolled twin, r8).",
)

_MM_FULL_MEMBERS = {
    "core": (
        "multimodal-suite",
        [("part", "s"), ("media_id", "s"), ("kind", "s"), ("n1", "s"), ("v1", "s")],
    ),
    "ahash": (
        "multimodal-image-ahash",
        [("media_id", "s"), ("w", "s"), ("h", "s"), ("ahash_hi", "s"), ("ahash_lo", "s")],
    ),
    "afp": (
        "multimodal-audio-fingerprint",
        [("media_id", "s"), ("n_samples", "s"), ("afp", "s")],
    ),
    "neardup": (
        "multimodal-image-neardup",
        [("id_a", "s"), ("id_b", "s"), ("hamming", "s")],
    ),
}

multimodal_full_suite = _register(
    "multimodal-full-suite", _MM_FULL_MEMBERS,
    "multimodal-suite (codec round-trips, features, frame sampling) ∪ "
    "multimodal-image-ahash ∪ multimodal-audio-fingerprint "
    "(real-decode perceptual fingerprints, image + audio) ∪ "
    "multimodal-image-neardup (banded-Hamming aHash pairs, full-recall "
    "8-block pigeonhole at d<=4, exact-verified; r11) — the full "
    "multimodal family (r5 third rotation).",
)
