"""Nested / document-model operators (SURVEY.md §2.4, §2.7).

The reference built its per-variant nested documents with a Hive UDAF
(brickhouse ``collect`` — GenomicsLoader.scala:49,
steps/toSampleGrouped.scala:39-45) plus driver-side ``.toSet`` dedup.
Built-in ``collect_list``/``collect_set`` + ``array_distinct`` +
``sort_array`` subsume all of that and stay inside whole-stage codegen.

Determinism: ``collect_*`` order is non-deterministic under parallel
aggregation, so every collected array is canonically sorted before it
leaves an operator (FIXTURES.md "Determinism requirements").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_collect(
    df: DataFrame,
    keys: Sequence[str],
    payload: Column,
    alias: str = "items",
    distinct: bool = True,
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """Group by ``keys`` and collect one ``payload`` per row into a
    canonically-sorted array — the "samples"/"effs" document builder
    (steps/toSampleGrouped.scala:39-45, steps/toEffectsGrouped.scala:24-38).

    ``payload`` may be any expression (string serialization, struct, map);
    map payloads are not directly sortable, so callers serialize maps to
    canonical strings or structs when determinism matters.
    """
    agg = F.collect_set(payload) if distinct else F.collect_list(payload)
    return df.groupBy(*keys).agg(F.sort_array(agg).alias(alias), *extra_aggs)


def group_first(df: DataFrame, keys: Sequence[str], value_cols: Sequence[str]) -> DataFrame:
    """``groupBy(...).agg(first(...))`` over functionally-dependent columns
    (all rows in a group share the value — steps/toEffects.scala:205).
    Uses ``min`` so the result is deterministic even if the dependency is
    ever violated."""
    return df.groupBy(*keys).agg(*[F.min(c).alias(c) for c in value_cols])


def collect_scalar(df: DataFrame, keys: Sequence[str], payload: Column, alias: str) -> DataFrame:
    """``array(collect(...))[0]`` idiom — keep one representative per group
    (steps/toEffectsGrouped.scala:29-38): a length-1 sorted slice."""
    return df.groupBy(*keys).agg(
        F.slice(F.sort_array(F.collect_set(payload)), 1, 1).alias(alias)
    )


def explode_array(df: DataFrame, array_col: str, alias: str, keep: Sequence[str]) -> DataFrame:
    """LATERAL VIEW explode (steps/UMD.scala:14-16,45) as the native
    generator expression."""
    return df.select(*keep, F.explode(F.col(array_col)).alias(alias))


def window_rank_first(
    df: DataFrame,
    partition_keys: Sequence[str],
    order_cols: Sequence[Column | str],
) -> DataFrame:
    """Best-row-per-group: ``row_number() over (partition by ... order by ...) = 1``.

    This is the reference's best-impact-per-transcript dedup
    (functionalMap_parser, steps/Parser.scala:299-327) as a window.
    ``order_cols`` must be a total order (include a unique tiebreaker) for
    deterministic output."""
    w = Window.partitionBy(*partition_keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_maps(maps_col: Column, default: str = "0") -> Column:
    """Fold an array of string maps into one merged map, ""→default —
    the reference's SQL-registered ``pop`` UDF (steps/toElastic.scala:11)
    as a pure higher-order expression (no Python on the hot path)."""
    merged = F.map_from_entries(
        F.flatten(F.transform(maps_col, lambda m: F.map_entries(m)))
    )
    return F.transform_values(
        merged, lambda _, v: F.when(v == "", F.lit(default)).otherwise(v)
    )


def allele_freq(samples_col: Column, gt_key: str = "gt") -> Column:
    """``freqInt`` (steps/toVariant.scala:28-30): over an array of string
    maps, sum all allele digits of the gt field and divide by 2·n.
    Pure ``aggregate``/``transform`` expression — JVM-side, codegen-able."""
    def _digit(expr: Column) -> Column:
        return F.coalesce(expr.cast("long"), F.lit(0))

    digit_sum = F.aggregate(
        samples_col,
        F.lit(0).cast("long"),
        lambda acc, m: acc
        + _digit(F.try_element_at(F.split(F.try_element_at(m, F.lit(gt_key)), "/"), F.lit(1)))
        + _digit(F.try_element_at(F.split(F.try_element_at(m, F.lit(gt_key)), "/"), F.lit(2))),
    )
    n = F.size(samples_col)
    return (digit_sum / (2.0 * n)).cast("double")


def sentence_split_udtf():
    """A REAL Python user-defined table function (Spark 4 ``@udtf``),
    Arrow-batched (``useArrow=True`` → the plan node is
    ArrowEvalPythonUDTF, not row-at-a-time BatchEvalPython — the
    plan-audit rule holds even for the one operator family whose
    POINT is Python execution): per input row, yield one row per
    '. '-delimited sentence with its index and whitespace word count.
    The generator shape (0..N output rows per input row) is what
    neither a scalar UDF nor a built-in explode of a precomputed
    array expresses — the UDTF owns the split AND the derived
    metrics in one Python body. Returns the class for
    ``spark.udtf.register`` (registration is per-session,
    idempotent)."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="sent_id: int, sentence: string, n_words: int",
        useArrow=True,
    )
    class SentenceSplit:
        def eval(self, text: str):
            for i, s in enumerate((text or "").split(". ")):
                yield i, s, len([w for w in s.split(" ") if w])

    return SentenceSplit
