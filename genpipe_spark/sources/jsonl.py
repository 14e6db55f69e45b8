"""JSONL corpus source/sink — the canonical LLM training-data
interchange format (one JSON document per line).

Spark-first scale notes:
  - an EXPLICIT schema is a required argument: schema inference is a
    full extra pass over the data (fatal at 100 TB), so it is simply
    not offered here;
  - PERMISSIVE mode + ``columnNameOfCorruptRecord`` turns malformed
    lines into data instead of failed tasks — for web-scraped corpora
    some malformed lines are a certainty, and the scale-correct move is
    to quarantine them downstream (filter on the marker) while the scan
    keeps streaming;
  - ``.jsonl`` text is line-splittable, so Spark parallelizes within
    large files; gzip members are NOT splittable (one task per .gz
    file) — prefer many medium files or a splittable codec for big
    corpora (same caveat as the VCF source, vcf.py).

Spark caveat (documented upstream): a query that selects ONLY the
corrupt-record column from a JSON scan is disallowed without a cache —
always project it alongside at least one data column, as scan_jsonl's
callers do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _with_corrupt_col(schema: T.StructType | str, corrupt_col: str) -> T.StructType:
    """Copy-extend the schema with the quarantine column — a fresh
    StructType, never ``schema.add`` (which MUTATES the caller's object
    in place and would leak a phantom column into any reuse of it)."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if corrupt_col in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )


def scan_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Distributed JSONL scan with explicit schema; malformed lines come
    back with every data field NULL and the raw line in ``corrupt_col``
    (a field that fails its declared type marks the whole line corrupt
    while parseable sibling fields are kept — Spark's PERMISSIVE
    contract)."""
    schema = _with_corrupt_col(schema, corrupt_col)
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by: tuple[str, ...] = (),
) -> None:
    """JSONL sink: one line per row, optionally compressed/partitioned.
    NULL-valued fields are dropped from each line (Spark's JSON writer
    contract) — round-trips cleanly through scan_jsonl, which restores
    them as NULLs from the schema."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = "_corrupt_record",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Distributed CSV/TSV scan with the same contract as scan_jsonl:
    explicit schema only (no inference pass), PERMISSIVE mode with
    malformed rows quarantined into ``corrupt_col`` (wrong column
    count / uncastable field → data fields NULL where unparseable, raw
    line kept). Same corrupt-column-only query caveat as JSON."""
    schema = _with_corrupt_col(schema, corrupt_col)
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
