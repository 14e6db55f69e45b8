"""Flagship query — the reference's whole `variants` stage in one plan
(SURVEY.md §7.2 slice 0).

Shape (mirrors GenomicsLoader stages parser→sampleGroup→variants):
  quality-gated fact rows (lineitem, the "samples")
    → group-collect into canonical per-key documents
    → left multi-key join onto the annotation side (orders ⋈ customer)
    → computed allele-frequency-shaped column.

Exercises: scan-parquet, filter-quality, join-inner-equi,
agg-group-collect, join-left-multikey, and a higher-order computed column
— one whole-stage-codegen plan with a single shuffle for the group-by and
one for the (orderkey) join; the customer side is left to AQE, which
broadcasts it when under threshold and shuffles it at scale (customer
grows with SF, so a forced hint would OOM at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genpipe_spark.registry import query
from genpipe_spark.queries.common import t

FLAGSHIP_ORACLE = """
    WITH gated AS (
      SELECT * FROM lineitem WHERE l_quantity > 7 AND l_extendedprice > 1000
    ), samples AS (
      SELECT l_orderkey,
             list_sort(list(concat('ln=', l_linenumber,
                                   ';qty=', CAST(l_quantity AS INT),
                                   ';rf=', l_returnflag))) AS samples,
             count(*) AS n_samples,
             sum(CAST(l_quantity AS BIGINT)) AS qty_sum,
             sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS revenue
      FROM gated GROUP BY l_orderkey
    )
    SELECT o_orderkey, o_orderstatus, c_mktsegment,
           COALESCE(array_to_string(s.samples, '|'), '') AS samples,
           COALESCE(s.n_samples, 0) AS n_samples,
           COALESCE(s.revenue, 0.0) AS revenue,
           COALESCE(s.qty_sum / (2.0 * s.n_samples), 0.0) AS freq
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    LEFT JOIN samples s ON s.l_orderkey = o_orderkey
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")

    gated = li.where((F.col("l_quantity") > 7) & (F.col("l_extendedprice") > 1000))
    payload = F.concat(
        F.lit("ln="), F.col("l_linenumber").cast("string"),
        F.lit(";qty="), F.col("l_quantity").cast("int").cast("string"),
        F.lit(";rf="), F.col("l_returnflag"),
    )
    samples = gated.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(payload)).alias("samples"),
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
        (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100.0).alias(
            "revenue"
        ),
    )
    # customer grows with scale factor (~15 M rows at sf100): no forced
    # broadcast — AQE auto-broadcasts under its size threshold and falls
    # back to shuffle join when the side is genuinely large.
    annotated = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
    docs = annotated.join(
        samples, samples["l_orderkey"] == annotated["o_orderkey"], "left"
    )
    # coalesce join misses to empty document / zeros: deterministic output
    # representation regardless of how a sink serializes nulls. The sorted
    # document array is serialized to one scalar ('|'-joined) so the
    # driver's order-insensitive hash can canonicalize the row (top-level
    # arrays are unhashable in its pandas sort, VERDICT r01).
    return docs.select(
        "o_orderkey",
        "o_orderstatus",
        "c_mktsegment",
        F.concat_ws("|", F.coalesce(F.col("samples"), F.array().cast("array<string>"))).alias(
            "samples"
        ),
        F.coalesce(F.col("n_samples"), F.lit(0)).alias("n_samples"),
        F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
        F.coalesce(F.col("qty_sum") / (2.0 * F.col("n_samples")), F.lit(0.0)).alias("freq"),
    )


query("flagship-variant-doc", FLAGSHIP_ORACLE)(flagship)
