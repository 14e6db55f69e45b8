"""Testdata table loader.

The driver's synthetic tables (TESTDATA.md): a TPC-H-ish star schema plus
``events`` (stream-shaped), ``documents`` and ``embeddings`` (LLM-data
shaped). One parquet file per table under ``{sf_dir}/{name}.parquet``.

At 100 TB these would be partitioned/bucketed datasets; reading the root
path + filtering keeps Catalyst's partition pruning in play either way
(the reference instead did manual path arithmetic —
``GenomicsLoader.scala:120,126`` — which we deliberately do not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, memoized per (session, sf_dir, name).

    ``spark.read.parquet`` does file listing + footer/schema reads on the
    driver at plan time (~0.1-0.3 s per call here); queries that touch
    three tables paid that threefold on every plan construction. The
    testdata tables are immutable for a session's lifetime, and a cached
    DataFrame is just a reusable logical plan, so memoizing is safe. The
    cache hangs off the SparkSession object to die with the session."""
    cache: dict[tuple[str, str], DataFrame] | None
    cache = getattr(spark, "_genpipe_table_cache", None)
    if cache is None:
        cache = {}
        spark._genpipe_table_cache = cache  # type: ignore[attr-defined]
    key = (sf_dir, name)
    if key not in cache:
        cache[key] = _load(spark, sf_dir, name)
    return cache[key]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.parquet has shipped with two on-disk ts encodings across
        # driver testdata generations: TIMESTAMP(NANOS) (which Spark's
        # vectorized reader rejects — read nanos as long, convert with
        # integer DIV since a double roundtrip loses precision at 2^53)
        # and plain TIMESTAMP (micros, isAdjustedToUTC=false → Spark
        # TIMESTAMP_NTZ). Normalize both to session-TZ TimestampType
        # (session TZ is pinned UTC, so NTZ→TZ keeps wall-clock values,
        # matching the DuckDB oracle's naive timestamps).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if isinstance(ts_type, T.TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load(spark, sf_dir, n) for n in TABLE_NAMES}
