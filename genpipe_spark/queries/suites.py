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
import genpipe_spark.queries.llmdata  # noqa: F401  (text-*, sketch-*)
import genpipe_spark.queries.nested  # noqa: F401  (udf-*)
import genpipe_spark.queries.sources  # noqa: F401  (scan-*)
import genpipe_spark.queries.streaming  # noqa: F401  (stream-*)

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
}

_UDF_MEMBERS = {
    "allele_freq": ("udf-allele-freq", [("l_orderkey", "s"), ("freqInt", "f")]),
    "pop_merge": ("udf-pop-merge", [("o_custkey", "s"), ("merged", "s")]),
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
    "text-metrics ∪ text-chunk, every member column packed (r5 window rotation).",
)
udf_suite = _register(
    "udf-suite",
    _UDF_MEMBERS,
    "udf-allele-freq ∪ udf-pop-merge, packed (r5 window rotation).",
)
stream_agg_suite = _register(
    "stream-agg-suite",
    _STREAM_MEMBERS,
    "stream-window-agg ∪ stream-sessionize-batch batch-twin checks, packed "
    "(r5 window rotation; the real-stream legs keep their dedicated tests).",
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
    "families in one slot (r5 window rotation).",
)
