"""Relational core operators (SURVEY.md §2.2, §2.3, §2.5).

Each is a plain ``DataFrame -> DataFrame`` function built on column
expressions so Catalyst keeps predicate pushdown / column pruning /
join-selection control. Nothing here shuffles unless the relational
semantics require it.

Reference parity notes (file:line cites are to /root/reference):
  - quality/equality/range filters: steps/Parser.scala:196-199,
    steps/toRange.scala:31-47, steps/intersectSwap.scala:101-119
  - joins: steps/toRange.scala:64 (inner equi),
    steps/toVariant.scala:33 + steps/UMD.scala:47 (left multikey)
  - union: steps/toSampleGrouped.scala:36
  - secondary sort: steps/intersectSwap.scala:121-127
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def filter_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Half-open positional band predicate ``lo <= col < hi``.

    The reference drove one Spark job per band (GenomicsLoader.scala:121-123);
    here it is just a pushed-down predicate — Catalyst turns it into parquet
    row-group min/max skipping and partition pruning.
    """
    return df.where((F.col(col) >= F.lit(lo)) & (F.col(col) < F.lit(hi)))


def filter_quality(df: DataFrame, gates: dict[str, tuple[str, float]]) -> DataFrame:
    """Conjunctive numeric gates, e.g. {"sample.dp": (">", 7), "sample.gq": (">", 19)}.

    Works on nested struct fields (dotted paths) exactly like the
    reference's dp/gq gate (steps/Parser.scala:199).
    """
    cond = F.lit(True)
    for path, (op, v) in gates.items():
        c = F.col(path)
        cond = cond & {
            ">": c > v,
            ">=": c >= v,
            "<": c < v,
            "<=": c <= v,
            "==": c == v,
            "!=": c != v,
        }[op]
    return df.where(cond)


def filter_equality(df: DataFrame, eq: dict | None = None, neq: dict | None = None) -> DataFrame:
    cond = F.lit(True)
    for k, v in (eq or {}).items():
        cond = cond & (F.col(k) == F.lit(v))
    for k, v in (neq or {}).items():
        cond = cond & (F.col(k) != F.lit(v))
    return df.where(cond)


def project(df: DataFrame, cols: Sequence[str | Column]) -> DataFrame:
    return df.select(*cols)


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    return df.withColumnsRenamed(mapping)


def with_computed(df: DataFrame, **exprs: Column) -> DataFrame:
    return df.withColumns(dict(exprs))


def join_inner(df: DataFrame, other: DataFrame, on, broadcast_right: bool = False) -> DataFrame:
    """Inner equi-join. ``broadcast_right`` hints the dimension side —
    at 100 TB the fact side never moves; AQE auto-broadcasts <=10MB sides
    anyway, the hint makes it deterministic for known dims."""
    right = F.broadcast(other) if broadcast_right else other
    return df.join(right, on=on, how="inner")


def join_left(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """Left outer join on a composite natural key (steps/toVariant.scala:33)."""
    return df.join(other, on=list(on), how="left")


def join_semi(df: DataFrame, other: DataFrame, on) -> DataFrame:
    return df.join(other, on=on, how="left_semi")


def join_anti(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """Anti-join — the dedup-against-reference primitive for data pipelines."""
    return df.join(other, on=on, how="left_anti")


def union_all(*dfs: DataFrame) -> DataFrame:
    """Position-safe union by column name (reference used unionAll,
    steps/toSampleGrouped.scala:36)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def distinct_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    return df.dropDuplicates(list(subset)) if subset else df.distinct()


def sort_within_partitions(df: DataFrame, col: str, num_partitions: int | None = None) -> DataFrame:
    """Range-partition + secondary sort — the modern spelling of the
    reference's BinPartitioner + repartitionAndSortWithinPartitions
    (steps/binPartitioner.scala:6-29, steps/intersectSwap.scala:123-127).
    One shuffle; each partition is sorted and range-disjoint."""
    parts = [F.col(col)]
    rp = df.repartitionByRange(num_partitions, *parts) if num_partitions else df.repartitionByRange(*parts)
    return rp.sortWithinPartitions(col)


def sort_global(df: DataFrame, *cols: Column | str) -> DataFrame:
    return df.orderBy(*cols)


def topk(df: DataFrame, k: int, *order_cols: Column | str) -> DataFrame:
    """Global top-k. Spark plans orderBy().limit() as TakeOrderedAndProject —
    per-partition heaps + single small merge, no full sort/shuffle."""
    return df.orderBy(*order_cols).limit(k)


def global_row_number(
    df: DataFrame, order_cols: Sequence[str], alias: str = "row_num"
) -> DataFrame:
    """Dense 1-based GLOBAL numbering by ``order_cols`` without the
    single-reducer trap: a plain ``row_number() OVER (ORDER BY …)``
    plans an empty-frame Window — every row through ONE partition, the
    classic 100 TB deadend (and the reason the reference reaches for
    RDD zipWithIndex, toSample.scala-era style). Here:

      1. range-repartition + sort within partitions on the keys
         (one shuffle — partitions are globally ordered AND disjoint),
         then stamp each row with ``monotonically_increasing_id()``
         INSIDE the checkpointed pass: partition id in the upper bits,
         CONSECUTIVE 0-based record number in the lower 33 — i.e. the
         within-partition rank of the sorted order, captured as a
         narrow JVM expression;
      2. count rows per partition (an agg over #partitions groups) and
         cumsum the offsets DRIVER-side — #partitions values, not rows;
      3. add each partition's offset to its local record number via a
         broadcast-joined offset table — another NARROW pass.

    (r12, guide §2.4: step 3 used to be row_number() OVER (PARTITION
    BY __pid) — but range partitioning does not satisfy the window's
    hash-clustering requirement, so the window silently re-shuffled
    AND re-sorted every row by __pid; measured 2.6 s of the operator's
    3.9 s at sf0.1. The id stamp makes the second pass shuffle-free:
    same rn values, one exchange total.)

    ``order_cols`` must be a total order (include a unique tiebreaker):
    equal keys land in one partition under range partitioning, but the
    within-partition order between duplicates would be tie-ambiguous.
    Two jobs by construction (the count pass) — the standard price of
    distributed global numbering. Lower-33-bit record numbers cap a
    partition at 2^33 rows — far beyond any sane partition size."""
    part = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__gmid", F.monotonically_increasing_id())
    )
    # the checkpoint freezes the id stamp (monotonic id is recompute-
    # sensitive) and lets the count pass and the final pass share the
    # one range shuffle
    part = part.localCheckpoint(eager=False)
    pid = F.shiftright(F.col("__gmid"), 33).cast("int")
    counts = sorted(
        (r["__pid"], r["n"])
        for r in part.groupBy(pid.alias("__pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offsets, acc = [], 0
    for p, n in counts:
        offsets.append((p, acc))
        acc += n
    spark = df.sparkSession
    off = spark.createDataFrame(offsets, "__pid int, __off long")
    local = F.col("__gmid") - F.shiftleft(F.shiftright(F.col("__gmid"), 33), 33)
    return (
        part.withColumn("__pid", pid)
        .join(F.broadcast(off), "__pid")
        .withColumn(alias, local + F.col("__off") + F.lit(1))
        .drop("__pid", "__gmid")
    )


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """2-D skyline (Pareto frontier), minimize-both: rows not
    STRICTLY dominated — no other row is <= on both dims and < on at
    least one. Identical (x, y) duplicates dominate nothing and all
    survive (set semantics of the classic skyline definition).

    O(n log n), not the textbook O(n^2) self-join:
      1. reduce to the per-x minimum y — ONE map-side-combinable agg
         (among equal x, only min-y rows can be non-dominated);
      2. exclusive running min of ymin over x ascending — a window on
         the REDUCED distinct-x table (domain-bounded, not row-
         bounded; quantize x first if its domain is unbounded — the
         same rule as drift.ks_two_sample);
      3. a distinct x survives iff its ymin beats every smaller x's
         (strict <, which also resolves the equal-y-smaller-x
         dominance case); join survivors back by x, keeping original
         rows at y == ymin.
    NULL in either dim drops the row (NULL is incomparable under
    dominance)."""
    base = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    per_x = base.groupBy(F.col(x_col).alias("__x")).agg(
        F.min(F.col(y_col)).alias("__ymin")
    )
    w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        per_x.withColumn("__prev", F.min("__ymin").over(w))
        .where(F.col("__prev").isNull() | (F.col("__ymin") < F.col("__prev")))
        .select("__x", "__ymin")
    )
    return base.join(
        frontier,
        (F.col(x_col) == F.col("__x")) & (F.col(y_col) == F.col("__ymin")),
        "inner",
    ).drop("__x", "__ymin")
