"""Skew and co-location techniques (SURVEY.md §4; SCALE.md).

``salted_group_agg`` — two-phase aggregation for skewed group keys: a
random-free deterministic salt spreads each hot key over N partial
groups, a second pass merges. Results are identical to the direct
groupBy (the oracle is the plain SQL aggregate); the win is that no
single reducer receives a whole hot key. AQE handles skewed *joins*
automatically, but a skewed *aggregation* on low-cardinality keys still
funnels into few tasks — salting is the standing fix.

``write_bucketed`` / co-located joins — persist both sides of a
recurring join bucketed by the join key: the sort-merge join then reads
pre-bucketed data with NO shuffle on either side (verified by plan
assertion in tests). This is the Spark-native replacement for the
reference's custom co-partitioner (steps/binPartitioner.scala).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    agg_cols: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``agg_cols`` maps output alias -> (input column, fn) with fn in
    {"sum", "count", "min", "max"} (the decomposable aggregates; avg =
    sum/count composed by the caller). ``salt_source`` is a column whose
    hash spreads rows (defaults to a per-row monotonic id substitute:
    hash of all columns)."""
    salt_in = F.col(salt_source) if salt_source else F.struct(*df.columns)
    salt = F.pmod(F.hash(salt_in), F.lit(salt_buckets)).alias("__salt")

    partial_aggs, final_aggs = [], []
    for alias, (col, fn) in agg_cols.items():
        if fn == "count":
            partial_aggs.append(F.count(F.lit(1)).alias(f"__p_{alias}"))
            final_aggs.append(F.sum(f"__p_{alias}").alias(alias))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(f"__p_{alias}"))
            final_aggs.append(F.sum(f"__p_{alias}").alias(alias))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(f"__p_{alias}"))
            final_aggs.append(F.min(f"__p_{alias}").alias(alias))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(f"__p_{alias}"))
            final_aggs.append(F.max(f"__p_{alias}").alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """With the default in-memory catalog, a managed table's data
    directory can outlive the session that registered it; a later
    session's ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS
    even in overwrite mode (the catalog no longer knows the table).
    Drop the catalog entry if present and remove any orphaned
    warehouse directory. A deployment with a persistent metastore
    never hits the orphan branch — overwrite mode suffices there."""
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    jvm = spark._jvm
    wh = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(wh, table.lower())
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist a stage table bucketed (and sorted) by its recurring join
    key so downstream joins are shuffle-free on both sides."""
    _clear_stale_location(df.sparkSession, table)
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def write_staged(
    df: DataFrame,
    table: str,
    partition_cols: Sequence[str],
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Stage layout for recurring pipelines: directory-partitioned by
    the downstream PRUNING key(s) and bucketed by the recurring JOIN
    key, so one layout serves both access patterns — queries filtered
    on the partition key read only its directories (PartitionFilters)
    and joins on the bucket key shuffle neither side. This is the
    at-scale layout SCALE.md 'Scans' prescribes for stage tables
    (generalizing the reference's chrom/band directory scheme +
    custom co-partitioner into Catalyst-native mechanisms)."""
    _clear_stale_location(df.sparkSession, table)
    w = (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed` on
    the bucket key — plans as a sort-merge join with zero Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
