"""Query/oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers:
  - a callable ``(spark, sf_dir) -> DataFrame`` under its slug, and
  - (when SQL-expressible) an equivalent DuckDB SQL string.

The driver compares the two at sf0.01 by row count + schema + an
order-insensitive value hash, so:
  - every computed column is aliased identically on both sides,
  - collected arrays are canonically sorted on both sides,
  - float outputs are made bit-deterministic (integer-cents sums,
    floor-truncation — see FIXTURES.md "Determinism requirements").
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the queries() entry for slug ``name``.

    ``oracle`` is the DuckDB-ANSI-SQL twin; omit it only for genuinely
    non-SQL-expressible operators (the driver then records a weaker
    rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 registered queries
# (CORRECTNESS_r01.json = registry insertion order, positions 1-50).
# CURATED_ORDER pins positions 1-50 to the curated set that covers every
# SURVEY.md §2 slug plus the LLM-data operators (several slugs share one
# suite entry — the slug→entry mapping is COVERAGE.md §"query registry").
# Entries not listed here keep their import order AFTER the curated set;
# they are extra forms (interval-join variants, streaming rows-only
# probes) that get checked only if the driver's window ever widens.
CURATED_ORDER: list[str] = [
    # r5 rotation (VERDICT r4 item 1): filter-header/filter-band-equality/
    # filter-quality/project-select-rename merged into filter-project-suite,
    # agg-group-collect/agg-collect-scalar/agg-group-first into
    # agg-collect-suite, fn-snpeff-{ann,eff}-parse into fn-snpeff-suite —
    # freeing 6 slots for the round-4 operators (quantile-group-exact,
    # dedup-incremental, text-bm25-topk, text-quality-suite,
    # rollup-gapfill, profile-table). The merged-away entries stay
    # registered (>50) for pytest parity; no §2 family left the window.
    #
    # r5 THIRD rotation (session 3): every remaining oracle-backed
    # capability pulled in-window via THIRTEEN more full-payload suites
    # (quantile / window / sort-set / dedup-misc / embedding / bm25 /
    # timegrid / profile / cdc / fn-struct-parse / text-token /
    # reshape-olap / mix-full — the last supersedes mix-suite's slot)
    # and one direct entry (fuzzy-edit-join). Merged-away
    # members stay registered (>50) for pytest parity; only rows-only
    # probes and variant forms remain un-windowed.
    #
    # r5 second rotation (earlier session's new operators): five
    # full-payload tagged unions (queries/suites.py — every member
    # column packed, nothing dropped): scan-text-vcf→scan-source-suite
    # (+scan-jsonl), sketch-kmv-distinct→sketch-suite (+sketch-cms-heavy),
    # text-metrics+text-chunk→text-analysis-suite,
    # udf-allele-freq+udf-pop-merge→udf-suite,
    # stream-window-agg+stream-sessionize-batch→stream-agg-suite. The 3
    # net-freed slots expose pipeline-curation, validate-constraints and
    # merge-upsert. Members stay registered (>50) for pytest parity.
    "flagship-variant-doc",
    "scan-parquet-partitioned",
    "scan-source-suite",
    "source-filestream",
    "sink-parquet-partitioned",
    "filter-project-suite",
    "join-inner-equi",
    "join-left-multikey",
    "join-filter-suite",
    "interval-suite",
    "join-asof",
    "agg-collect-suite",
    "agg-distinct-extrema-suite",
    "quantile-suite",
    "sort-set-suite",
    "window-suite",
    "stream-stream-interval-join",
    "agg-salted-group",
    "fn-parse-suite",
    "fn-alt-decompose",
    "fn-struct-parse-suite",
    "fn-snpeff-suite",
    "row-sample-parser",
    "udf-suite",
    "udtf-explode",
    "sql-group-collect",
    "stream-agg-suite",
    "dedup-exact",
    "dedup-ngram-jaccard",
    "dedup-minhash-lsh",
    "dedup-misc-suite",
    "dedup-incremental",
    "embedding-suite",
    "mix-full-suite",
    "pack-sequences",
    "sketch-suite",
    "graph-suite",
    "text-analysis-suite",
    "text-bm25-suite",
    "text-quality-suite",
    "timegrid-suite",
    "profile-suite",
    "multimodal-full-suite",
    "sample-split-deterministic",
    "pipeline-curation",
    "validate-constraints",
    "cdc-suite",
    "text-token-suite",
    "fuzzy-edit-join",
    "reshape-olap-suite",
]


def load_all_query_modules() -> None:
    """Import every query module so registration side effects run, then
    reorder the registry: CURATED_ORDER first (the driver's correctness
    window), remaining entries after in import order."""
    from genpipe_spark.queries import (  # noqa: F401
        flagship,
        interval,
        llmdata,
        nested,
        parse,
        quality,
        relational,
        sources,
        streaming,
        suites,
        timeseries,
    )

    missing = [n for n in CURATED_ORDER if n not in QUERIES]
    if missing:
        raise RuntimeError(f"CURATED_ORDER names unregistered queries: {missing}")
    ordered = CURATED_ORDER + [n for n in QUERIES if n not in set(CURATED_ORDER)]
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in ordered if n in snapshot})
