"""Sinks (SURVEY.md §2.1): partitioned parquet stage tables, single-file
TSV for external services, and the Elasticsearch-shaped document sink.

Scale notes:
  - partitioned parquet writes use dynamic partition overwrite so
    reprocessing one chrom/band never truncates its siblings;
  - the single-file TSV sink is explicitly coalesce(1) — it exists for a
    human/external-service handoff (umd.prepareInput, steps/UMD.scala:12-18)
    and is documented as non-scalable by design;
  - the ES sink is an adapter interface: in production it would be
    ``df.write.format("org.elasticsearch.spark.sql")`` with the index
    settings below; in this harness it writes JSON-lines with identical
    document shape so the mapping is testable without an ES cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ES index DDL metadata (ddl-index-mapping): the reference creates the
# index over HTTP with an explicit nested mapping and these settings
# (Elastic/Data.scala:34-93). Engine-side this is sink configuration.
ES_INDEX_SETTINGS = {
    "number_of_shards": 8,
    "number_of_replicas": 0,
    "refresh_interval": "1000ms",
    "_all_enabled": False,
}


def write_parquet_partitioned(
    df: DataFrame,
    dest: str,
    partition_by: tuple[str, ...] = ("chrom",),
    mode: str = "overwrite",
) -> None:
    """Stage-table sink: parquet partitioned by the genomic layout keys
    (chrom[/band] — steps/Parser.scala:199 etc.), dynamic overwrite."""
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(dest)
    )


def write_single_tsv(df: DataFrame, dest: str, cols: list[str]) -> None:
    """Single-file TSV handoff (sink-text-single, steps/UMD.scala:12-18):
    concat_ws + coalesce(1). Deliberately not for scale."""
    df.select(F.concat_ws("\t", *[F.col(c).cast("string") for c in cols]).alias("value")).coalesce(
        1
    ).write.mode("overwrite").text(dest)


def write_es_shaped(
    df: DataFrame,
    dest: str,
    index: str,
    version: str,
    es_format: bool = False,
    es_nodes: str | None = None,
) -> None:
    """Document sink (sink-elasticsearch, GenomicsLoader.scala:208-213).

    ``es_format=True`` issues the real connector write (requires the
    elasticsearch-spark jar + cluster — not present in this harness);
    otherwise writes the identical documents as JSON-lines under
    ``dest/index-version/`` so shape and partitioning are testable."""
    if es_format:
        (
            df.write.format("org.elasticsearch.spark.sql")
            .option("es.nodes", es_nodes or "localhost")
            .option("es.resource", f"{index}/{version}")
            .mode("append")
            .save()
        )
        return
    df.write.mode("overwrite").json(f"{dest}/{index}-{version}")


def write_table(df: DataFrame, table: str, overwrite: bool = True) -> None:
    """Metastore table sink (sink-hive-table, steps/toElastic.scala:12):
    saveAsTable against the session catalog (Hive metastore in prod,
    in-memory catalog + warehouse dir locally)."""
    df.write.mode("overwrite" if overwrite else "append").saveAsTable(table)
