"""Relational-core queries()/oracle_sql() twins (SURVEY.md §2.1-2.5).

Each entry exercises one operator slug on the driver's TPC-H-ish tables
with a DuckDB oracle. Every computed column is aliased identically on
both sides; see queries/common.py for the determinism rules.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.operators import relational as R
from genpipe_spark.registry import query
from genpipe_spark.queries.common import day, money_sum, t


@query(
    "scan-parquet-partitioned",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_day
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-06-01'
      AND l_shipdate <  TIMESTAMP '1995-09-01'
    """,
)
def scan_parquet(spark, sf):
    # predicate + projection reach the parquet scan (PushedFilters/ReadSchema)
    li = t(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1995-06-01") & (F.col("l_shipdate") < "1995-09-01")
        ).select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", day("l_shipdate", "ship_day")
        )
    )


@query(
    "filter-header",
    "SELECT doc_id, source, n_chars FROM documents WHERE text NOT LIKE 'the %'",
)
def filter_header(spark, sf):
    # header-drop semantics (filter-header): drop rows by line prefix
    docs = t(spark, sf, "documents")
    return docs.where(~F.col("text").startswith("the ")).select("doc_id", "source", "n_chars")


@query(
    "filter-band-equality",
    """
    SELECT 'band' AS part, l_orderkey, l_linenumber,
           CAST(l_partkey AS VARCHAR) AS k1, '' AS k2
    FROM lineitem WHERE l_partkey >= 500 AND l_partkey < 900
    UNION ALL
    SELECT 'eq' AS part, l_orderkey, l_linenumber, l_returnflag AS k1,
           l_linestatus AS k2
    FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus <> 'O'
    """,
)
def filter_band_equality(spark, sf):
    # covers slugs filter-band-range + filter-equality (tagged union, one
    # driver slot — COVERAGE.md "query registry"); both predicates push
    # down to the parquet scan.
    li = t(spark, sf, "lineitem")
    band = R.filter_range(li, "l_partkey", 500, 900).select(
        F.lit("band").alias("part"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_partkey").cast("string").alias("k1"),
        F.lit("").alias("k2"),
    )
    eq = R.filter_equality(
        li, eq={"l_returnflag": "R"}, neq={"l_linestatus": "O"}
    ).select(
        F.lit("eq").alias("part"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
    )
    return R.union_all(band, eq)


@query(
    "filter-quality",
    """
    SELECT l_orderkey, l_linenumber, l_quantity AS dp, l_extendedprice AS gq
    FROM lineitem WHERE l_quantity > 7 AND l_extendedprice > 19000
    """,
)
def filter_quality(spark, sf):
    # the dp>7 ∧ gq>19 nested-field gate (steps/Parser.scala:199): build the
    # nested sample struct, predicate on dotted paths, then flatten.
    li = t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.struct(
            F.col("l_quantity").alias("dp"), F.col("l_extendedprice").alias("gq")
        ).alias("sample"),
    )
    gated = R.filter_quality(li, {"sample.dp": (">", 7), "sample.gq": (">", 19000)})
    return gated.select(
        "l_orderkey",
        "l_linenumber",
        F.col("sample.dp").alias("dp"),
        F.col("sample.gq").alias("gq"),
    )


@query(
    "project-select-rename",
    """
    SELECT o_orderkey AS orderkey, o_custkey AS custkey,
           o_orderstatus AS status, o_orderpriority
    FROM orders
    """,
)
def project_select_rename(spark, sf):
    # covers slugs project-select + project-rename in one entry (driver's
    # 50-query window — COVERAGE.md "query registry"); project-computed's
    # computed-column semantics live in fn-parse-suite's `revenue` column.
    selected = R.project(
        t(spark, sf, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )
    return R.rename(
        selected,
        {"o_orderkey": "orderkey", "o_custkey": "custkey", "o_orderstatus": "status"},
    )


@query(
    "filter-project-suite",
    """
    SELECT 'header' AS part, CAST(doc_id AS BIGINT) AS id1,
           CAST(n_chars AS BIGINT) AS id2, source AS k1, '' AS k2
    FROM documents WHERE text NOT LIKE 'the %'
    UNION ALL
    SELECT 'band', CAST(l_orderkey AS BIGINT), CAST(l_linenumber AS BIGINT),
           CAST(l_partkey AS VARCHAR), ''
    FROM lineitem WHERE l_partkey >= 500 AND l_partkey < 900
    UNION ALL
    SELECT 'eq', CAST(l_orderkey AS BIGINT), CAST(l_linenumber AS BIGINT),
           l_returnflag, l_linestatus
    FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus <> 'O'
    UNION ALL
    SELECT 'quality', CAST(l_orderkey AS BIGINT), CAST(l_linenumber AS BIGINT),
           CAST(CAST(round(l_quantity*100) AS BIGINT) AS VARCHAR),
           CAST(CAST(round(l_extendedprice*100) AS BIGINT) AS VARCHAR)
    FROM lineitem WHERE l_quantity > 7 AND l_extendedprice > 19000
    UNION ALL
    SELECT 'project', CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT),
           o_orderstatus, o_orderpriority
    FROM orders
    """,
)
def filter_project_suite(spark, sf):
    """Tagged union of the four §2.2 projection/filter entries
    (filter-header ∪ filter-band-equality ∪ filter-quality ∪
    project-select-rename) into ONE driver-window slot — the
    join-semi-anti suite trick, applied to free window positions for the
    round-4 operators (VERDICT r4 item 1). The individual entries stay
    registered (>50) for pytest parity and the bench; each branch
    reshapes its entry's exact output into (part, id1, id2, k1, k2),
    floats via integer cents so the hash is engine-independent."""
    cents_str = lambda c: F.round(F.col(c) * 100).cast("long").cast("string")  # noqa: E731
    hdr = filter_header(spark, sf).select(
        F.lit("header").alias("part"),
        F.col("doc_id").cast("long").alias("id1"),
        F.col("n_chars").cast("long").alias("id2"),
        F.col("source").alias("k1"),
        F.lit("").alias("k2"),
    )
    be = filter_band_equality(spark, sf).select(
        "part",
        F.col("l_orderkey").cast("long").alias("id1"),
        F.col("l_linenumber").cast("long").alias("id2"),
        "k1",
        "k2",
    )
    qual = filter_quality(spark, sf).select(
        F.lit("quality").alias("part"),
        F.col("l_orderkey").cast("long").alias("id1"),
        F.col("l_linenumber").cast("long").alias("id2"),
        cents_str("dp").alias("k1"),
        cents_str("gq").alias("k2"),
    )
    proj = project_select_rename(spark, sf).select(
        F.lit("project").alias("part"),
        F.col("orderkey").cast("long").alias("id1"),
        F.col("custkey").cast("long").alias("id2"),
        F.col("status").alias("k1"),
        F.col("o_orderpriority").alias("k2"),
    )
    return hdr.unionByName(be).unionByName(qual).unionByName(proj)


@query(
    "join-inner-equi",
    """
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_equi(spark, sf):
    # customer grows with SF — no forced broadcast hint; AQE broadcasts
    # it at runtime whenever it is under the size threshold
    return R.join_inner(
        t(spark, sf, "orders"),
        t(spark, sf, "customer"),
        on=F.col("o_custkey") == F.col("c_custkey"),
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@query(
    "join-left-multikey",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
           COALESCE(r.big_qty, -1.0) AS big_qty
    FROM lineitem l
    LEFT JOIN (SELECT l_orderkey, l_linenumber, l_quantity AS big_qty
               FROM lineitem WHERE l_quantity > 40) r
      ON l.l_orderkey = r.l_orderkey AND l.l_linenumber = r.l_linenumber
    """,
)
def join_left_multikey(spark, sf):
    li = t(spark, sf, "lineitem")
    right = li.where(F.col("l_quantity") > 40).select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("big_qty")
    )
    joined = R.join_left(
        li.select("l_orderkey", "l_linenumber", "l_quantity"),
        right,
        on=["l_orderkey", "l_linenumber"],
    )
    # join misses surface as a -1 sentinel instead of NULL so the driver's
    # value hash is engine-representation-independent (NULL float → NaN
    # round-trips differently across pandas conversions)
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.coalesce(F.col("big_qty"), F.lit(-1.0)).alias("big_qty"),
    )


@query(
    "join-semi-anti",
    """
    SELECT 'semi' AS part, c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    UNION ALL
    SELECT 'anti' AS part, c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi_anti(spark, sf):
    # covers slugs join-semi + join-anti (tagged union, one driver slot).
    # anti keys on high-value orders so both match/no-match outcomes occur
    # (every customer has *some* order in the fixture).
    cust = t(spark, sf, "customer")
    semi = R.join_semi(
        cust,
        t(spark, sf, "orders").where(F.col("o_totalprice") > 200000),
        on=F.col("c_custkey") == F.col("o_custkey"),
    ).select(F.lit("semi").alias("part"), "c_custkey", "c_name")
    anti = R.join_anti(
        cust,
        t(spark, sf, "orders").where(F.col("o_totalprice") > 300000),
        on=F.col("c_custkey") == F.col("o_custkey"),
    ).select(F.lit("anti").alias("part"), "c_custkey", "c_name")
    return R.union_all(semi, anti)


@query(
    "agg-count-distinct-reduce",
    """
    SELECT 'count' AS part, o_orderpriority AS k1, '' AS k2,
           count(*) AS n1, count(DISTINCT o_custkey) AS n2
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'distinct' AS part, l_returnflag AS k1, l_linestatus AS k2,
           CAST(-1 AS BIGINT) AS n1, CAST(-1 AS BIGINT) AS n2
    FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    UNION ALL
    SELECT 'reduce' AS part, word AS k1, '' AS k2,
           count(*) AS n1, CAST(-1 AS BIGINT) AS n2
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> '' GROUP BY word
    """,
)
def agg_count_distinct_reduce(spark, sf):
    # covers slugs agg-count + agg-distinct + agg-reducebykey (tagged
    # union, one driver slot; schema part/k1/k2/n1/n2 with -1/'' filler).
    neg1 = F.lit(-1).cast("long")
    counts = (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.countDistinct("o_custkey").alias("n2"),
        )
        .select(
            F.lit("count").alias("part"),
            F.col("o_orderpriority").alias("k1"),
            F.lit("").alias("k2"),
            "n1",
            "n2",
        )
    )
    distinct = R.distinct_rows(
        t(spark, sf, "lineitem").select("l_returnflag", "l_linestatus")
    ).select(
        F.lit("distinct").alias("part"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        neg1.alias("n1"),
        neg1.alias("n2"),
    )
    # word-count — groupBy replaces reduceByKey; map-side partial agg is
    # automatic
    words = t(spark, sf, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    reduced = (
        words.where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n1"))
        .select(
            F.lit("reduce").alias("part"),
            F.col("word").alias("k1"),
            F.lit("").alias("k2"),
            "n1",
            neg1.alias("n2"),
        )
    )
    return R.union_all(R.union_all(counts, distinct), reduced)


@query(
    "agg-group-first",
    """
    SELECT l_orderkey, min(o_orderpriority) AS o_orderpriority,
           min(strftime(o_orderdate, '%Y-%m-%d')) AS order_day
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey
    """,
)
def agg_group_first(spark, sf):
    # first() over functionally-dependent columns; implemented as min for
    # determinism (operators/nested.group_first)
    from genpipe_spark.operators.nested import group_first

    j = t(spark, sf, "lineitem").join(
        t(spark, sf, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("l_orderkey", "o_orderpriority", day("o_orderdate", "order_day"))
    return group_first(j, ["l_orderkey"], ["o_orderpriority", "order_day"])


@query(
    "set-union",
    """
    SELECT o_orderkey, o_totalprice, 'big' AS src FROM orders WHERE o_totalprice > 150000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union(spark, sf):
    o = t(spark, sf, "orders")
    big = o.where(F.col("o_totalprice") > 150000).select(
        "o_orderkey", "o_totalprice", F.lit("big").alias("src")
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("urgent").alias("src")
    )
    return R.union_all(big, urgent)


@query(
    "sort-within-partitions",
    "SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem WHERE l_partkey < 1000",
)
def sort_within_partitions(spark, sf):
    # range-partition + secondary sort (steps/intersectSwap.scala:121-127);
    # row content is order-insensitively hashed, the physical property is
    # asserted in tests/test_operators.py
    li = t(spark, sf, "lineitem").where(F.col("l_partkey") < 1000).select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    return R.sort_within_partitions(li, "l_partkey", num_partitions=8)


@query(
    "sort-global",
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
)
def sort_global(spark, sf):
    return R.sort_global(
        t(spark, sf, "orders").where(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_totalprice"
        ),
        F.desc("o_totalprice"),
        "o_orderkey",
    )


@query(
    "topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def topk(spark, sf):
    # plans as TakeOrderedAndProject: per-partition heaps, no global sort
    return R.topk(
        t(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
        25,
        F.desc("o_totalprice"),
        "o_orderkey",
    )


@query(
    "window-rank-first-running-sum",
    """
    SELECT 'rank_first' AS part, o_custkey, o_orderkey,
           CAST(round(o_totalprice*100) AS BIGINT) AS v1, CAST(-1 AS BIGINT) AS v2
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn = 1
    UNION ALL
    SELECT 'running' AS part, o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS v1,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                AS BIGINT) AS v2
    FROM orders
    """,
)
def window_rank_first_running_sum(spark, sf):
    # covers slugs window-rank-first + window-running-sum (tagged union).
    # rank_first: best-impact-per-transcript semantics
    # (steps/Parser.scala:299-327) as a window; running: running aggregate
    # + sequence per customer (generic window surface), integer cents.
    from pyspark.sql import Window

    from genpipe_spark.operators.nested import window_rank_first as wrf

    o = t(spark, sf, "orders")
    neg1 = F.lit(-1).cast("long")
    rank_first = wrf(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.col("o_orderkey")],
    ).select(
        F.lit("rank_first").alias("part"),
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v1"),
        neg1.alias("v2"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    running = o.select(
        F.lit("running").alias("part"),
        "o_custkey",
        "o_orderkey",
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("v1"),
        F.row_number().over(w).cast("long").alias("v2"),
    )
    return R.union_all(rank_first, running)


@query(
    "agg-salted-group",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_salted_group(spark, sf):
    # two-phase salted aggregation for skewed low-cardinality keys —
    # identical results to the direct groupBy (the oracle), no hot reducer
    from genpipe_spark.operators.skew import salted_group_agg

    li = t(spark, sf, "lineitem").withColumn(
        "qty_l", F.col("l_quantity").cast("long")
    )
    return salted_group_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {"n": ("l_quantity", "count"), "qty_sum": ("qty_l", "sum")},
        salt_buckets=16,
    )


@query(
    "tpch-q1-rollup",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           sum(CAST(round(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price,
           sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0 AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def tpch_q1_rollup(spark, sf):
    # covers slugs tpch-q1 + agg-rollup: TPC-H Q1 pricing summary (leaf
    # groups are exactly Q1's output) with ROLLUP hierarchical totals (the
    # generic-engine grouping-sets addition — the reference has none,
    # SURVEY.md §2.4 note). Money goes through integer cents: exact at any
    # parallelism.
    li = t(spark, sf, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    cents = lambda c: F.sum(F.round(c * 100).cast("long")) / 100.0  # noqa: E731
    agg = li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        cents(F.col("l_extendedprice")).alias("sum_base_price"),
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rf"),
        F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("ls"),
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "count_order",
    )


@query(
    "tpch-q3",
    """
    SELECT l_orderkey,
           sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0 AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def tpch_q3(spark, sf):
    # TPC-H Q3 shape: dim filter, fact join, agg, top-k. customer grows
    # with SF — no forced broadcast; AQE decides from runtime sizes.
    cust = t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = t(spark, sf, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    agg = j.groupBy("l_orderkey", "o_orderdate").agg(
        (
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            )
            / 100.0
        ).alias("revenue")
    )
    return (
        agg.select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )




@query(
    "quantile-group-exact",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_quantity AS q,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem WHERE l_quantity IS NOT NULL
    )
    SELECT l_returnflag, p.pct, q
    FROM ranked CROSS JOIN (VALUES (CAST(25 AS BIGINT)), (50), (75), (99)) AS p(pct)
    WHERE rn = (p.pct * n + 99) // 100
    """,
)
def quantile_group_exact(spark, sf):
    """Exact grouped percentiles via distributed nearest-rank selection
    (operators/quantile.py) — the fully-distributed re-expression of the
    reference's driver-side summary statistics. Nearest-rank picks an
    actual data value at integer rank ceil(pct*n/100), so the DuckDB
    window-function oracle reproduces it bit-for-bit."""
    from genpipe_spark.operators.quantile import group_quantiles

    return group_quantiles(
        t(spark, sf, "lineitem"),
        value_col="l_quantity",
        by=["l_returnflag"],
        pcts=(25, 50, 75, 99),
        # l_quantity is 50 integer values at every SF: the value-count
        # pre-reduction (guide §2.3) shrinks the window's input from
        # every lineitem row to <=50 rows/group (measured 1.02->0.41 s
        # at sf0.1; identical nearest-rank output)
        prereduce=True,
    )


_MERGE_CHANGES_SQL = """
  SELECT o_custkey % 200
           + CASE WHEN o_orderkey % 11 = 0 THEN 1000000 ELSE 0 END AS c_custkey,
         'cdc-' || o_orderkey AS c_name,
         CAST(o_orderkey % 25 AS INTEGER) AS c_nationkey,
         o_totalprice AS c_acctbal,
         o_orderpriority AS c_mktsegment,
         o_orderkey AS seq,
         CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
  FROM orders
"""


@query(
    "merge-upsert",
    f"""
    WITH ch AS ({_MERGE_CHANGES_SQL}),
    latest AS (
      SELECT * FROM (
        SELECT ch.*, row_number()
          OVER (PARTITION BY c_custkey ORDER BY seq DESC, op DESC) AS rn
        FROM ch) WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.c_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM latest WHERE op <> 'D'
    """,
)
def merge_upsert(spark, sf):
    """CDC apply / MERGE INTO semantics (operators/cdc.merge_apply): a
    changeset derived deterministically from orders (upserts, deletes,
    out-of-order duplicates per key, brand-new keys) reconciled into the
    customer snapshot — latest-sequence-wins, deletes drop the key,
    inserts add it. One window + one anti-join, both hash-partitioned on
    the merge key; the DuckDB twin replays the same latest-per-key
    collapse and survivor union."""
    from genpipe_spark.operators.cdc import merge_apply

    o = t(spark, sf, "orders")
    changes = o.select(
        (
            F.col("o_custkey") % 200
            + F.when(F.col("o_orderkey") % 11 == 0, 1_000_000).otherwise(0)
        ).alias("c_custkey"),
        F.concat(F.lit("cdc-"), F.col("o_orderkey")).alias("c_name"),
        (F.col("o_orderkey") % 25).cast("int").alias("c_nationkey"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderpriority").alias("c_mktsegment"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 7 == 0, "D").otherwise("U").alias("op"),
    )
    return merge_apply(
        t(spark, sf, "customer"), changes, ["c_custkey"], "seq"
    )


@query(
    "pivot-unpivot",
    """
    SELECT o_orderpriority, o_orderstatus AS status,
           sum(cast(round(o_totalprice*100) as bigint))/100.0 AS total
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def pivot_unpivot(spark, sf):
    """Round-trip reshape (operators/reshape.py): pivot orders wide
    (one money-cents sum column per EXPLICIT status category — no
    hidden distinct-collect pass), then unpivot back to long and drop
    the NULL cells of absent combinations. The oracle is the plain
    GROUP BY the round trip must algebraically equal — pivot∘unpivot
    ≡ groupBy is the checked identity."""
    from genpipe_spark.operators.reshape import pivot_explicit, unpivot

    o = t(spark, sf, "orders")
    wide = pivot_explicit(
        o.withColumn("cents", F.round(F.col("o_totalprice") * 100).cast("long")),
        ["o_orderpriority"],
        "o_orderstatus",
        ["O", "F", "P"],
        F.sum("cents"),
    )
    long = unpivot(wide, ["o_orderpriority"], ["O", "F", "P"], "status", "cents")
    return long.where(F.col("cents").isNotNull()).select(
        "o_orderpriority", "status", (F.col("cents") / 100.0).alias("total")
    )


@query(
    "agg-cube",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)::BIGINT AS n,
           sum(cast(round(o_totalprice*100) as bigint))/100.0 AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf):
    """CUBE grouping-sets rollup: all 2^2 grouping combinations in ONE
    pass (Catalyst Expand ×4 feeding a single partial-agged shuffle —
    the multi-level-report shape; contrast rollup-time-hierarchy's
    hierarchical ROLLUP). Subtotal levels surface as 'ALL' (both
    grouping columns are non-null in the fixture, so coalesce is
    unambiguous); money via integer cents."""
    o = t(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("o_totalprice", "total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@query(
    "window-lag-lead-ntile",
    """
    SELECT o_custkey,
           o_orderkey,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           CAST(date_diff('day',
                lag(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead_ntile(spark, sf):
    """Per-customer order-history navigation: lag/lead/ntile plus
    inter-order gap days over one (custkey, orderdate, orderkey) window
    — ONE shuffle serves all four functions (same partitioning+ordering
    → one Window physical node; orderkey tie-break keeps every offset
    function deterministic). Complements window-rank-first-running-sum's
    rank/first/sum coverage."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = t(spark, sf, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    )


@query(
    "quantile-group-histogram",
    """
    WITH h AS (
      SELECT l_returnflag,
             least(24, greatest(0, CAST(floor((l_quantity - 0.0) / 2.0) AS INTEGER))) AS bin,
             count(*) AS n
      FROM lineitem WHERE l_quantity IS NOT NULL
      GROUP BY 1, 2
    ),
    cumt AS (
      SELECT l_returnflag, bin, n,
             sum(n) OVER (PARTITION BY l_returnflag ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY l_returnflag) AS total
      FROM h
    ),
    ex AS (
      SELECT l_returnflag, bin, n, cum, total, p.pct
      FROM cumt, unnest([25, 50, 75, 99]) p(pct)
    )
    SELECT l_returnflag, CAST(pct AS BIGINT) AS pct,
           floor((0.0 + (bin + ((pct * total / 100.0) - (cum - n)) / n) * 2.0)
                 * 10000) / 10000.0 AS q_est
    FROM ex
    WHERE cum >= pct * total / 100.0 AND (cum - n) < pct * total / 100.0
    """,
)
def quantile_group_histogram(spark, sf):
    """Histogram-estimated grouped quantiles (operators/quantile.py
    histogram_group_quantiles): the mergeable, ≤nbins-state-per-group,
    oracle-REPLAYABLE approximate path (contrast quantile-group-exact's
    per-group sort and percentile_approx's engine-opaque GK sketch).
    25 bins of width 2 over l_quantity's [0, 50) domain — estimation
    error ≤ bin width, checked against exact in pytest."""
    from genpipe_spark.operators.quantile import histogram_group_quantiles

    return histogram_group_quantiles(
        t(spark, sf, "lineitem"),
        "l_quantity",
        ["l_returnflag"],
        lo=0.0,
        hi=50.0,
        nbins=25,
        pcts=(25, 50, 75, 99),
    )


@query(
    "global-row-number",
    """
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS row_num
    FROM orders
    """,
)
def global_row_number_query(spark, sf):
    """Dense global numbering of orders by (date, key) — the
    zipWithIndex-shaped operation done Spark-first
    (operators/relational.global_row_number): range shuffle +
    per-partition numbering + driver-side offset cumsum over
    #partitions values; NO single-reducer Window. The oracle is the
    naive single-ORDER-BY row_number the operator must equal."""
    return R.global_row_number(
        t(spark, sf, "orders"), ["o_orderdate", "o_orderkey"]
    ).select("o_orderkey", "row_num")


@query(
    "scd2-history",
    """
    WITH ch AS (
      SELECT o_custkey % 100 AS custkey, o_orderkey AS seq,
             o_orderpriority AS seg, o_orderstatus AS st,
             CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders
    ),
    ev AS (
      SELECT *, (op = 'D') AS del,
             lag(seg) OVER w AS pseg, lag(st) OVER w AS pst,
             lag(op = 'D') OVER w AS pdel
      FROM ch WINDOW w AS (PARTITION BY custkey ORDER BY seq)
    ),
    kept AS (
      SELECT * FROM ev
      WHERE NOT coalesce(seg IS NOT DISTINCT FROM pseg
                         AND st IS NOT DISTINCT FROM pst
                         AND NOT del AND NOT pdel, FALSE)
    ),
    v AS (
      SELECT *, lead(seq) OVER w2 AS valid_to,
             sum(CASE WHEN del THEN 0 ELSE 1 END)
               OVER (PARTITION BY custkey ORDER BY seq
                     ROWS UNBOUNDED PRECEDING) AS version
      FROM kept WINDOW w2 AS (PARTITION BY custkey ORDER BY seq)
    )
    SELECT custkey, seg, st, seq AS valid_from, valid_to,
           CAST(version AS INT) AS version, valid_to IS NULL AS is_current
    FROM v WHERE NOT del
    """,
)
def scd2_history_query(spark, sf):
    """SCD Type-2 dimension history (operators/cdc.scd2_history) built
    from a changeset derived from orders: per-key versions with
    [valid_from, valid_to) sequence intervals, no-op updates collapsed,
    deletes closing the open version, re-inserts re-opening with a
    fresh version. One hash shuffle on the dimension key (all window
    functions share the spec); the DuckDB twin replays the identical
    lag-collapse + lead-interval construction."""
    from genpipe_spark.operators.cdc import scd2_history

    o = t(spark, sf, "orders")
    changes = o.select(
        (F.col("o_custkey") % 100).alias("custkey"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderpriority").alias("seg"),
        F.col("o_orderstatus").alias("st"),
        F.when(F.col("o_orderkey") % 13 == 0, "D").otherwise("U").alias("op"),
    )
    return scd2_history(
        changes, ["custkey"], "seq", ["seg", "st"], op_col="op"
    )


@query(
    "set-except-intersect",
    """
    WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
         b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'except_all' AS part, o_custkey FROM (
      SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
    UNION ALL
    SELECT 'intersect_all', o_custkey FROM (
      SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
    UNION ALL
    SELECT 'except', o_custkey FROM (
      SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
    UNION ALL
    SELECT 'intersect', o_custkey FROM (
      SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
    """,
)
def set_except_intersect(spark, sf):
    """The §2.5 set-op family completed: EXCEPT/INTERSECT in both
    multiset (ALL — bag difference/min-multiplicity) and distinct
    semantics, all four over the same two order subsets. Spark plans
    these as hash joins on the full row (left-anti/left-semi with
    count matching for ALL) — same shuffle story as any equi-join."""
    o = t(spark, sf, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    parts = [
        ("except_all", a.exceptAll(b)),
        ("intersect_all", a.intersectAll(b)),
        ("except", a.subtract(b)),
        ("intersect", a.intersect(b)),
    ]
    out = None
    for tag, df in parts:
        p = df.select(F.lit(tag).alias("part"), "o_custkey")
        out = p if out is None else out.unionByName(p)
    return out


@query(
    "scd2-point-in-time",
    """
    WITH ch AS (
      SELECT o_custkey % 100 AS custkey, o_orderkey AS seq,
             o_orderpriority AS seg, o_orderstatus AS st,
             CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders
    ),
    ev AS (
      SELECT *, (op = 'D') AS del,
             lag(seg) OVER w AS pseg, lag(st) OVER w AS pst,
             lag(op = 'D') OVER w AS pdel
      FROM ch WINDOW w AS (PARTITION BY custkey ORDER BY seq)
    ),
    kept AS (
      SELECT * FROM ev
      WHERE NOT coalesce(seg IS NOT DISTINCT FROM pseg
                         AND st IS NOT DISTINCT FROM pst
                         AND NOT del AND NOT pdel, FALSE)
    ),
    hist AS (
      SELECT custkey, seg, st, seq AS valid_from,
             lead(seq) OVER w2 AS valid_to,
             CAST(sum(CASE WHEN del THEN 0 ELSE 1 END)
               OVER (PARTITION BY custkey ORDER BY seq
                     ROWS UNBOUNDED PRECEDING) AS INT) AS version,
             del
      FROM kept WINDOW w2 AS (PARTITION BY custkey ORDER BY seq)
    ),
    facts AS (
      SELECT (o_custkey + 7) % 100 AS custkey, o_orderkey + 3 AS fact_seq
      FROM orders
    ),
    m AS (
      SELECT f.custkey, f.fact_seq, h.seg, h.st, h.version, h.valid_to,
             row_number() OVER (PARTITION BY f.custkey, f.fact_seq
                                ORDER BY h.valid_from DESC, h.version DESC) AS rn
      FROM facts f JOIN (SELECT * FROM hist WHERE NOT del) h
        ON h.custkey = f.custkey AND h.valid_from <= f.fact_seq
    )
    SELECT custkey, fact_seq, seg, st, version
    FROM m WHERE rn = 1 AND (valid_to IS NULL OR fact_seq < valid_to)
    """,
)
def scd2_point_in_time(spark, sf):
    """Point-in-time (temporal) join: facts against the SCD2 dimension
    AS OF each fact's sequence — the warehouse pattern for reproducible
    training snapshots. Composes operators/cdc.scd2_history with
    operators/asof.asof_join (latest valid_from <= fact_seq per key),
    then keeps only facts inside a LIVE validity interval (facts in a
    deleted gap drop). Both stages are key-shuffles; no broadcast of
    the SF-growing dimension."""
    from genpipe_spark.operators.asof import asof_join
    from genpipe_spark.operators.cdc import scd2_history

    o = t(spark, sf, "orders")
    changes = o.select(
        (F.col("o_custkey") % 100).alias("custkey"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderpriority").alias("seg"),
        F.col("o_orderstatus").alias("st"),
        F.when(F.col("o_orderkey") % 13 == 0, "D").otherwise("U").alias("op"),
    )
    hist = scd2_history(changes, ["custkey"], "seq", ["seg", "st"], op_col="op")
    facts = o.select(
        ((F.col("o_custkey") + 7) % 100).alias("custkey"),
        (F.col("o_orderkey") + 3).alias("fact_seq"),
    )
    joined = asof_join(
        facts,
        hist,
        on="custkey",
        left_ts="fact_seq",
        right_ts="valid_from",
        right_cols=["seg", "st", "version", "valid_to"],
        tiebreak="version",
    )
    return joined.where(
        F.col("seg").isNotNull()
        & (F.col("valid_to").isNull() | (F.col("fact_seq") < F.col("valid_to")))
    ).select("custkey", "fact_seq", "seg", "st", "version")


@query(
    "window-dist-functions",
    """
    SELECT o_custkey, o_orderkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def window_dist_functions(spark, sf):
    """Distribution window functions: percent_rank ((rank-1)/(n-1) —
    a small-integer ratio, bit-identical across engines), cume_dist,
    and nth_value over an explicit full-partition frame (the default
    running frame would make it order-dependent). One shared window
    shuffle on the key."""
    from pyspark.sql import Window

    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey", "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


@query(
    "agg-mode-argmax",
    """
    WITH counts AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS c
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ),
    mode_pick AS (
      SELECT o_orderpriority, o_orderstatus AS mode_status FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY c DESC, o_orderstatus DESC) AS rn
        FROM counts) WHERE rn = 1
    ),
    extrema AS (
      SELECT o_orderpriority,
             max(o_orderkey) FILTER (WHERE rn_max = 1) AS argmax_order,
             max(o_orderkey) FILTER (WHERE rn_min = 1) AS argmin_order
      FROM (
        SELECT o_orderpriority, o_orderkey,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC,
                                           o_orderkey) AS rn_max,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY CAST(round(o_totalprice*100) AS BIGINT) ASC,
                                           o_orderkey) AS rn_min
        FROM orders)
      GROUP BY o_orderpriority
    )
    SELECT m.o_orderpriority, m.mode_status, e.argmax_order, e.argmin_order
    FROM mode_pick m JOIN extrema e USING (o_orderpriority)
    """,
)
def agg_mode_argmax(spark, sf):
    """Mode / argmax / argmin with DETERMINISTIC tie-breaks — the
    struct-ordering trick: max(struct(count, -key)) instead of
    max_by/mode built-ins (whose ties are engine- and order-dependent).
    Mode is a two-level aggregate (map-side combinable both levels;
    ties resolve to the LARGEST value, mirrored by the oracle's DESC
    tie-break); argmax/argmin ride one aggregate over
    struct(price_cents, -key).
    No windows over the fact table, so a hot group never funnels
    through one task."""
    o = t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("c")
    )
    # struct-max compares count first, then the value binary-wise —
    # ties resolve to the LARGEST value on both engines (DuckDB twin
    # orders c DESC, value DESC), with no window over the fact table
    mode_pick = counts.groupBy("o_orderpriority").agg(
        F.max(F.struct(F.col("c"), F.col("o_orderstatus")))["o_orderstatus"]
        .alias("mode_status")
    )
    extrema = o.groupBy("o_orderpriority").agg(
        F.max(F.struct(cents.alias("p"), (-F.col("o_orderkey")).alias("nk")))["nk"]
        .alias("neg_argmax"),
        F.min(F.struct(cents.alias("p"), F.col("o_orderkey").alias("k")))["k"]
        .alias("argmin_order"),
    ).select(
        "o_orderpriority",
        (-F.col("neg_argmax")).alias("argmax_order"),
        "argmin_order",
    )
    return mode_pick.join(extrema, "o_orderpriority").select(
        "o_orderpriority", "mode_status", "argmax_order", "argmin_order"
    )


_BLOOM_M = 1 << 16
_BLOOM_POS = """
      SELECT k, unnest([
        (((k % 2147483647 + 2147483647) % 2147483647) * 1103515245 + 12345) % 2147483647 % {m},
        (((k % 2147483647 + 2147483647) % 2147483647) * 69069 + 362437) % 2147483647 % {m},
        (((k % 2147483647 + 2147483647) % 2147483647) * 1664525 + 1013904223) % 2147483647 % {m}
      ]) AS h
""".format(m=_BLOOM_M)


@query(
    "join-bloom-prefilter",
    f"""
    WITH build_keys AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    ),
    build_pos AS ({_BLOOM_POS} FROM build_keys),
    bloom AS (
      SELECT h // 32 AS word_idx, CAST(bit_or(1::BIGINT << CAST(h % 32 AS INT)) AS BIGINT) AS word
      FROM build_pos GROUP BY h // 32
    ),
    probe_pos AS ({_BLOOM_POS} FROM (SELECT c_custkey AS k FROM customer)),
    verdicts AS (
      SELECT p.k,
             min(CASE WHEN b.word IS NOT NULL
                       AND (b.word & (1::BIGINT << CAST(p.h % 32 AS INT)))
                           = (1::BIGINT << CAST(p.h % 32 AS INT))
                 THEN 1 ELSE 0 END) AS all_hit
      FROM probe_pos p LEFT JOIN bloom b ON b.word_idx = p.h // 32
      GROUP BY p.k
    )
    SELECT c.c_custkey,
           CAST(EXISTS (SELECT 1 FROM build_keys bk WHERE bk.k = c.c_custkey)
                AS VARCHAR) AS actually_present
    FROM customer c JOIN verdicts v ON v.k = c.c_custkey AND v.all_hit = 1
    """,
)
def join_bloom_prefilter(spark, sf):
    """Explicit Bloom-filter semi-join pruning (operators/bloom.py):
    build a FIXED-size filter (2^16 bits / 2048 long words — constant
    regardless of build-side size) over the 'F'-status order custkeys,
    broadcast it (bounded by construction), and prefilter customers.
    The oracle replays the identical M31-affine bit arithmetic, so the
    surviving set — true members AND the deterministic false positives
    — matches bit-for-bit; `actually_present` tags which survivors the
    real join would keep."""
    from genpipe_spark.operators.bloom import bloom_build, bloom_probe

    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    build = o.where(F.col("o_orderstatus") == "F")
    bloom = bloom_build(build, "o_custkey", m_bits=_BLOOM_M, k_hashes=3)
    survivors = bloom_probe(
        c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", bloom,
        m_bits=_BLOOM_M, k_hashes=3,
    ).withColumnRenamed("o_custkey", "c_custkey")
    truth = build.select(F.col("o_custkey").alias("c_custkey")).distinct()
    return survivors.join(
        truth.withColumn("__present", F.lit(True)), "c_custkey", "left"
    ).select(
        "c_custkey",
        F.coalesce(F.col("__present"), F.lit(False)).cast("string").alias("actually_present"),
    )


@query(
    "quantile-mad",
    """
    WITH v AS (
      SELECT l_returnflag AS g,
             CAST(round(l_extendedprice*100) AS BIGINT) AS xc
      FROM lineitem
    ),
    med AS (
      SELECT g, xc AS med_cents FROM (
        SELECT g, xc, row_number() OVER (PARTITION BY g ORDER BY xc) AS rn,
               count(*) OVER (PARTITION BY g) AS n
        FROM v)
      WHERE rn = (50*n + 99) // 100
    ),
    dev AS (SELECT v.g, abs(xc - med_cents) AS d FROM v JOIN med USING (g)),
    mad AS (
      SELECT g, d AS mad_cents FROM (
        SELECT g, d, row_number() OVER (PARTITION BY g ORDER BY d) AS rn,
               count(*) OVER (PARTITION BY g) AS n
        FROM dev)
      WHERE rn = (50*n + 99) // 100
    )
    SELECT med.g AS l_returnflag, med_cents, mad_cents
    FROM med JOIN mad USING (g)
    """,
)
def quantile_mad(spark, sf):
    """Robust dispersion (operators/quantile.group_mad): exact
    nearest-rank median + MAD of price cents per return flag — the
    outlier-insensitive spread statistic, bit-exact across engines."""
    from genpipe_spark.operators.quantile import group_mad

    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("xc"),
    )
    return group_mad(li, "xc", ["l_returnflag"])


@query(
    "agg-grouped-corr",
    """
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(l_quantity) AS BIGINT) AS sx,
             CAST(sum(l_linenumber) AS BIGINT) AS sy,
             CAST(sum((l_quantity*l_quantity) // 1073741824) AS BIGINT) AS sxx_hi,
             CAST(sum((l_quantity*l_quantity) % 1073741824) AS BIGINT) AS sxx_lo,
             CAST(sum((l_linenumber*l_linenumber) // 1073741824) AS BIGINT) AS syy_hi,
             CAST(sum((l_linenumber*l_linenumber) % 1073741824) AS BIGINT) AS syy_lo,
             CAST(sum((l_quantity*l_linenumber) // 1073741824) AS BIGINT) AS sxy_hi,
             CAST(sum((l_quantity*l_linenumber) % 1073741824) AS BIGINT) AS sxy_lo
      FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS l_quantity,
                   CAST(l_linenumber AS BIGINT) AS l_linenumber FROM lineitem)
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sx, sy, sxy_hi, sxy_lo,
           CAST(floor(1000000.0 *
                 (CAST(n AS DOUBLE)
                    * (CAST(sxy_hi AS DOUBLE) * 1073741824.0
                       + CAST(sxy_lo AS DOUBLE))
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE)
                           * (CAST(sxx_hi AS DOUBLE) * 1073741824.0
                              + CAST(sxx_lo AS DOUBLE))
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE)
                             * (CAST(syy_hi AS DOUBLE) * 1073741824.0
                                + CAST(syy_lo AS DOUBLE))
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             AS BIGINT) AS corr_micro
    FROM s
    """,
)
def agg_grouped_corr(spark, sf):
    """Grouped Pearson correlation, 128-bit-safe (VERDICT r5 item 3):
    each product moment is accumulated as an EXACT (hi, lo) int64 pair
    split at 2^30 — sum(p div 2^30) and sum(p mod 2^30) — so the
    accumulation never overflows int64 even for cents-scale values at
    sf10+ row counts (lo-sum < 2^30·n holds to n≈8.5e9 rows/group;
    hi-sum < (p_max/2^30)·n — cents-scale p_max≈1e14 gives 9e4·n,
    safe beyond 1e13 rows). The final fold reconstructs hi·2^30+lo in
    DOUBLES with a pinned operation order, all IEEE-correctly-rounded
    (multiply/add/sqrt/divide), so both engines compute bit-identical
    corr_micro from bit-identical integer pairs; below 2^53 the double
    path is exact and equals the old single-int64 formulation.
    Precondition: non-negative x, y (div/mod sign conventions then
    agree across engines; lineitem satisfies it). One
    map-side-combinable aggregate, no window — same shuffle shape as
    before, two extra longs of partial-agg state per moment."""
    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.col("l_linenumber").cast("long").alias("y"),
    )
    split = 1073741824  # 2^30

    def hi_lo(prod, tag):
        return [
            F.sum(F.expr(f"({prod}) div {split}")).alias(f"{tag}_hi"),
            F.sum(F.expr(f"({prod}) % {split}")).alias(f"{tag}_lo"),
        ]

    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        *hi_lo("x*x", "sxx"),
        *hi_lo("y*y", "syy"),
        *hi_lo("x*y", "sxy"),
    )

    def recon_d(tag):
        return (
            F.col(f"{tag}_hi").cast("double") * F.lit(float(split))
            + F.col(f"{tag}_lo").cast("double")
        )

    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n_d * recon_d("sxy") - sx_d * sy_d
    den = F.sqrt(
        (n_d * recon_d("sxx") - sx_d * sx_d)
        * (n_d * recon_d("syy") - sy_d * sy_d)
    )
    # the cross-moment is EXPOSED as its (hi, lo) pair — reconstructing
    # hi*2^30+lo in int64 would overflow in exactly the cents-scale/
    # sf10+ regime the split exists for (round-6 review); consumers
    # reconstruct in whatever width they need
    return s.select(
        "l_returnflag", "n", "sx", "sy", "sxy_hi", "sxy_lo",
        F.floor(F.lit(1_000_000.0) * num / den).cast("long").alias("corr_micro"),
    )


_HILBERT_ORACLE = """
    WITH r0 AS (
      SELECT o_orderkey,
             o_custkey % 1024 AS hx0, o_orderkey % 1024 AS hy0,
             o_custkey % 1024 AS x, o_orderkey % 1024 AS y,
             CAST(0 AS BIGINT) AS d
      FROM orders
    ),
    r1 AS (
      SELECT o_orderkey, hx0, hy0,
             CASE WHEN (y & 512) = 0
                  THEN (CASE WHEN (x & 512) > 0 THEN 512 - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 512) = 0
                  THEN (CASE WHEN (x & 512) > 0 THEN 512 - 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 262144 * xor(3 * (CASE WHEN (x & 512) > 0 THEN 1 ELSE 0 END),
                                       (CASE WHEN (y & 512) > 0 THEN 1 ELSE 0 END)) AS d
      FROM r0
    ),
    r2 AS (
      SELECT o_orderkey, hx0, hy0,
             CASE WHEN (y & 256) = 0
                  THEN (CASE WHEN (x & 256) > 0 THEN 256 - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 256) = 0
                  THEN (CASE WHEN (x & 256) > 0 THEN 256 - 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 65536 * xor(3 * (CASE WHEN (x & 256) > 0 THEN 1 ELSE 0 END),
                                       (CASE WHEN (y & 256) > 0 THEN 1 ELSE 0 END)) AS d
      FROM r1
    ),
    r3 AS (
      SELECT o_orderkey, hx0, hy0,
             CASE WHEN (y & 128) = 0
                  THEN (CASE WHEN (x & 128) > 0 THEN 128 - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 128) = 0
                  THEN (CASE WHEN (x & 128) > 0 THEN 128 - 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 16384 * xor(3 * (CASE WHEN (x & 128) > 0 THEN 1 ELSE 0 END),
                                       (CASE WHEN (y & 128) > 0 THEN 1 ELSE 0 END)) AS d
      FROM r2
    ),
    r4 AS (
      SELECT o_orderkey, hx0, hy0,
             CASE WHEN (y & 64) = 0
                  THEN (CASE WHEN (x & 64) > 0 THEN 64 - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 64) = 0
                  THEN (CASE WHEN (x & 64) > 0 THEN 64 - 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 4096 * xor(3 * (CASE WHEN (x & 64) > 0 THEN 1 ELSE 0 END),
                                       (CASE WHEN (y & 64) > 0 THEN 1 ELSE 0 END)) AS d
      FROM r3
    ),
    r5 AS (
      SELECT o_orderkey, hx0, hy0,
             CASE WHEN (y & 32) = 0
                  THEN (CASE WHEN (x & 32) > 0 THEN 32 - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 32) = 0
                  THEN (CASE WHEN (x & 32) > 0 THEN 32 - 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 1024 * xor(3 * (CASE WHEN (x & 32) > 0 THEN 1 ELSE 0 END),
                                       (CASE WHEN (y & 32) > 0 THEN 1 ELSE 0 END)) AS d
      FROM r4
    ),
    r6 AS (
      SELECT o_orderkey, hx0, hy0,
             CASE WHEN (y & 16) = 0
                  THEN (CASE WHEN (x & 16) > 0 THEN 16 - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 16) = 0
                  THEN (CASE WHEN (x & 16) > 0 THEN 16 - 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 256 * xor(3 * (CASE WHEN (x & 16) > 0 THEN 1 ELSE 0 END),
                                       (CASE WHEN (y & 16) > 0 THEN 1 ELSE 0 END)) AS d
      FROM r5
    ),
    r7 AS (
      SELECT o_orderkey, hx0, hy0,
             CASE WHEN (y & 8) = 0
                  THEN (CASE WHEN (x & 8) > 0 THEN 8 - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 8) = 0
                  THEN (CASE WHEN (x & 8) > 0 THEN 8 - 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 64 * xor(3 * (CASE WHEN (x & 8) > 0 THEN 1 ELSE 0 END),
                                       (CASE WHEN (y & 8) > 0 THEN 1 ELSE 0 END)) AS d
      FROM r6
    ),
    r8 AS (
      SELECT o_orderkey, hx0, hy0,
             CASE WHEN (y & 4) = 0
                  THEN (CASE WHEN (x & 4) > 0 THEN 4 - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 4) = 0
                  THEN (CASE WHEN (x & 4) > 0 THEN 4 - 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 16 * xor(3 * (CASE WHEN (x & 4) > 0 THEN 1 ELSE 0 END),
                                       (CASE WHEN (y & 4) > 0 THEN 1 ELSE 0 END)) AS d
      FROM r7
    ),
    r9 AS (
      SELECT o_orderkey, hx0, hy0,
             CASE WHEN (y & 2) = 0
                  THEN (CASE WHEN (x & 2) > 0 THEN 2 - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 2) = 0
                  THEN (CASE WHEN (x & 2) > 0 THEN 2 - 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 4 * xor(3 * (CASE WHEN (x & 2) > 0 THEN 1 ELSE 0 END),
                                       (CASE WHEN (y & 2) > 0 THEN 1 ELSE 0 END)) AS d
      FROM r8
    ),
    r10 AS (
      SELECT o_orderkey, hx0, hy0,
             CASE WHEN (y & 1) = 0
                  THEN (CASE WHEN (x & 1) > 0 THEN 1 - 1 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN (y & 1) = 0
                  THEN (CASE WHEN (x & 1) > 0 THEN 1 - 1 - x ELSE x END)
                  ELSE y END AS y,
             d + 1 * xor(3 * (CASE WHEN (x & 1) > 0 THEN 1 ELSE 0 END),
                                       (CASE WHEN (y & 1) > 0 THEN 1 ELSE 0 END)) AS d
      FROM r9
    )
    SELECT o_orderkey, hx0 AS hx, hy0 AS hy, d AS hilbert_d FROM r10
    """


@query("layout-hilbert-index", _HILBERT_ORACLE)
def layout_hilbert_index(spark, sf):
    """Hilbert-curve cell index (operators/layout.hilbert_index_pandas,
    bits=10) for orders quantized onto a 1024x1024 grid — the
    locality-layout sibling of z-order. The DuckDB twin unrolls the
    same 10 masked-rotation rounds in pure int64, so the curve
    positions match exactly."""
    from genpipe_spark.operators.layout import hilbert_index_pandas

    o = t(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("hx"),
        (F.col("o_orderkey") % 1024).alias("hy"),
    )
    return hilbert_index_pandas(o, "hx", "hy", bits=10)


@query(
    "layout-bucketed-join",
    """
    SELECT c.c_custkey, c.c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def layout_bucketed_join(spark, sf):
    """Bucketed-layout co-located join (operators/skew.write_bucketed +
    bucketed_join — VERDICT r5 item 1): customer and orders are
    persisted as stage tables bucketed (and sorted) by the join key,
    then joined and aggregated per customer. Because both sides carry
    HashPartitioning(c_custkey) from the bucketed layout, the
    sort-merge join AND the (c_custkey, c_mktsegment) aggregate both
    plan with ZERO shuffle Exchange (asserted in
    tests/test_operators.py::test_layout_bucketed_join_query_no_shuffle)
    — the Catalyst-native replacement for the reference's custom
    co-partitioner (steps/binPartitioner.scala). The oracle verifies
    the JOIN RESULT against a plain SQL join on the raw parquet; the
    bucketed write is a real side effect per invocation (tables
    bj_customer_<sf>/bj_orders_<sf>, mode=overwrite, idempotent)."""
    import re

    from genpipe_spark.operators.skew import bucketed_join, write_bucketed

    tag = re.sub(r"\W+", "_", sf.rstrip("/").rsplit("/", 1)[-1])
    cust = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    orders = t(spark, sf, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("__cents"),
    )
    write_bucketed(cust, f"bj_customer_{tag}", "c_custkey", 8)
    write_bucketed(orders, f"bj_orders_{tag}", "c_custkey", 8)
    j = bucketed_join(spark, f"bj_customer_{tag}", f"bj_orders_{tag}", "c_custkey")
    return j.groupBy("c_custkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("__cents").alias("price_cents"),
    )


_ZORDER_BITS = 10
_ZORDER_TERMS = " + ".join(
    f"((hx >> {b}) & 1) * {1 << (b * 2)} + ((hy >> {b}) & 1) * {1 << (b * 2 + 1)}"
    for b in range(_ZORDER_BITS)
)


@query(
    "layout-zorder-key",
    f"""
    WITH g AS (
      SELECT o_orderkey,
             o_custkey % 1024 AS hx, o_orderkey % 1024 AS hy
      FROM orders
    )
    SELECT o_orderkey, hx, hy,
           CAST({_ZORDER_TERMS} AS BIGINT) AS zkey
    FROM g
    """,
)
def layout_zorder_key(spark, sf):
    """Z-order (Morton) clustering key (operators/layout.zorder_key)
    for orders on the same 1024x1024 grid as layout-hilbert-index —
    bit interleave of the two quantized coordinates, column i
    contributing bit b to position b*2+i. Pure shiftleft/AND/OR int64
    expressions, replayed term-for-term by the oracle (non-overlapping
    bits make bitwise-or equal to plus), so the multi-dimension
    clustering key used by write_zordered gets a driver-checkable row
    next to its Hilbert sibling. The write path itself
    (repartitionByRange + sortWithinPartitions) stays covered by the
    row-group skipping plan tests."""
    from genpipe_spark.operators.layout import zorder_key

    g = t(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("hx"),
        (F.col("o_orderkey") % 1024).alias("hy"),
    )
    return g.withColumn(
        "zkey", zorder_key([F.col("hx"), F.col("hy")], bits=_ZORDER_BITS)
    )


@query(
    "copurchase-pairs",
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           count(*) AS n_orders
    FROM ob a JOIN ob b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY a.p_brand, b.p_brand
    HAVING count(*) >= 3
    """,
)
def copurchase_pairs(spark, sf):
    """Market-basket co-occurrence: brand pairs bought together in >= 3
    orders — the association-mining support count. Shape: one dim join
    (brand onto lines; part grows with SF, so broadcast is left to AQE
    — the flagship rule), distinct (order, brand) to collapse repeat
    lines, a self equi-join on the order key with the a<b ordering so
    each unordered pair counts once, and one grouped count. Pairs per
    order are bounded by the basket's distinct-brand count, so the
    self-join fan-out is C(basket,2) — basket-bounded, never
    corpus-quadratic."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    p = t(spark, sf, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    ob = li.join(p, "l_partkey").select("l_orderkey", "p_brand").distinct()
    # r12 (guide §5 — cache only when reused): both self-join sides
    # re-derived the scan+join+distinct (ReuseExchange misses because
    # the SMJ sides re-key by l_orderkey with distinct expr ids); one
    # lazy checkpoint computes ob once
    ob = ob.localCheckpoint(eager=False)
    a, b = ob.alias("A"), ob.alias("B")
    pairs = a.join(
        b,
        (F.col("A.l_orderkey") == F.col("B.l_orderkey"))
        & (F.col("A.p_brand") < F.col("B.p_brand")),
    )
    return (
        pairs.groupBy(
            F.col("A.p_brand").alias("brand_a"),
            F.col("B.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 3)
    )


@query(
    "snapshot-diff",
    """
    WITH old AS (
      SELECT c_custkey, c_name, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS acct_cents,
             c_mktsegment
      FROM customer
    ),
    new AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 7 = 0 THEN acct_cents + 1000
                  ELSE acct_cents END AS acct_cents,
             c_mktsegment
      FROM old WHERE c_custkey % 10 <> 0
      UNION ALL
      SELECT -c_custkey, c_name, c_nationkey, acct_cents,
             c_mktsegment
      FROM old WHERE c_custkey % 13 = 0
    )
    SELECT COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
           CASE WHEN n.c_custkey IS NULL THEN o.c_name ELSE n.c_name END
             AS c_name,
           CASE WHEN n.c_custkey IS NULL THEN o.c_nationkey
                ELSE n.c_nationkey END AS c_nationkey,
           CASE WHEN n.c_custkey IS NULL THEN o.acct_cents
                ELSE n.acct_cents END AS acct_cents,
           CASE WHEN n.c_custkey IS NULL THEN o.c_mktsegment
                ELSE n.c_mktsegment END AS c_mktsegment,
           CASE WHEN n.c_custkey IS NULL THEN 'D'
                WHEN o.c_custkey IS NULL THEN 'I'
                ELSE 'U' END AS op
    FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    WHERE n.c_custkey IS NULL OR o.c_custkey IS NULL
       OR (n.c_name, n.c_nationkey, n.acct_cents, n.c_mktsegment)
          IS DISTINCT FROM
          (o.c_name, o.c_nationkey, o.acct_cents, o.c_mktsegment)
    """,
)
def snapshot_diff_query(spark, sf):
    """Table diff (operators/cdc.snapshot_diff — the inverse of
    merge_apply): customer vs a deterministically perturbed next
    snapshot (every 10th key deleted, every 7th rebalanced +10.00,
    every 13th re-inserted under the NEGATED key — custkeys are
    positive at every SF, so synthetic inserts can never collide with
    a real key, unlike a fixed +1e6 offset which real keys overtake
    past sf~7; round-6 review) — emits I/U/D changeset rows from ONE
    full-outer key join, unchanged keys emitting nothing. Payload
    travels as integer cents (exact compare + exact hash)."""
    from genpipe_spark.operators.cdc import snapshot_diff

    old = t(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acct_cents"),
        "c_mktsegment",
    )
    new = old.where(F.col("c_custkey") % 10 != 0).withColumn(
        "acct_cents",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("acct_cents") + 1000
        ).otherwise(F.col("acct_cents")),
    ).unionByName(
        old.where(F.col("c_custkey") % 13 == 0).withColumn(
            "c_custkey", -F.col("c_custkey")
        )
    )
    return snapshot_diff(old, new, ["c_custkey"])


@query(
    "quantile-weighted-median",
    """
    WITH v AS (
      SELECT l_returnflag AS g,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS xc,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    c AS (
      SELECT g, xc, w,
             sum(w) OVER (PARTITION BY g ORDER BY xc
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY g) AS tot
      FROM v
    )
    SELECT g AS l_returnflag,
           CAST(max(tot) AS BIGINT) AS w_total,
           min(CASE WHEN cum * 2 >= tot THEN xc END) AS wmedian
    FROM c GROUP BY g
    """,
)
def quantile_weighted_median(spark, sf):
    """Quantity-weighted median price cents per return flag
    (operators/quantile.group_weighted_median): the smallest price
    whose cumulative quantity reaches half the flag's total — exact
    integer cumulative weights, value-level crossing independent of
    tie order."""
    from genpipe_spark.operators.quantile import group_weighted_median

    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("xc"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    return group_weighted_median(li, "xc", "w", ["l_returnflag"])


_WPCTS = (25, 50, 75, 90)
_WPCT_MINS = ",\n             ".join(
    f"min(CASE WHEN cum * 100 >= {p} * tot THEN xc END) AS q{p}"
    for p in _WPCTS
)
_WPCT_UNION = "\n      UNION ALL\n".join(
    f"      SELECT l_returnflag, {p} AS pct, w_total, q{p} AS wq FROM a"
    for p in _WPCTS
)


@query(
    "quantile-weighted-pcts",
    f"""
    WITH v AS (
      SELECT l_returnflag AS g,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS xc,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    c AS (
      SELECT g, xc, w,
             sum(w) OVER (PARTITION BY g ORDER BY xc
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY g) AS tot
      FROM v
    ),
    a AS (
      SELECT g AS l_returnflag,
             CAST(max(tot) AS BIGINT) AS w_total,
             {_WPCT_MINS}
      FROM c GROUP BY g
    )
{_WPCT_UNION}
    """,
)
def quantile_weighted_pcts(spark, sf):
    """Quantity-weighted price percentiles (25/50/75/90) per return
    flag (operators/quantile.group_weighted_quantiles): the smallest
    price whose cumulative quantity reaches pct% of the flag total —
    exact integer crossing cum*100 >= pct*tot, every pct riding ONE
    window + ONE aggregate."""
    from genpipe_spark.operators.quantile import group_weighted_quantiles

    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("xc"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    return group_weighted_quantiles(
        li, "xc", "w", ["l_returnflag"], pcts=_WPCTS
    ).select("l_returnflag", "pct", "w_total", F.col("wq"))


@query(
    "copurchase-lift",
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    nb AS (SELECT p_brand, count(*) AS n_b FROM ob GROUP BY p_brand),
    tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             count(*) AS n_pair
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
      HAVING count(*) >= 3
    )
    SELECT brand_a, brand_b, n_pair,
           CAST((n_pair * 1000000) // na.n_b AS BIGINT) AS conf_a_to_b,
           CAST(floor(1000000.0
                 * (CAST(n_pair AS DOUBLE) * CAST(n_orders AS DOUBLE))
                 / (CAST(na.n_b AS DOUBLE) * CAST(nb2.n_b AS DOUBLE)))
             AS BIGINT) AS lift_micro
    FROM pairs
    JOIN nb na ON na.p_brand = brand_a
    JOIN nb nb2 ON nb2.p_brand = brand_b
    CROSS JOIN tot
    """,
)
def copurchase_lift(spark, sf):
    """Association-rule strength on top of copurchase-pairs:
    confidence(a→b) = n_pair/n_a in exact integer millionths, and
    lift = n_pair·N / (n_a·n_b) folded in doubles with a pinned
    operation order (the agg-grouped-corr doctrine: int64→double,
    multiply, divide, floor are all IEEE-correctly-rounded, so both
    engines produce identical micro-units even past 2^53). The
    1-row order-count attach is a bounded crossJoin (plan-audit
    whitelisted); brand counts join per pair side."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    p = t(spark, sf, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    ob = li.join(p, "l_partkey").select("l_orderkey", "p_brand").distinct()
    # r12 (guide §5): ob feeds FIVE subtrees (nb, tot, both self-join
    # sides — plans/r12/copurchase-lift_before.txt shows five lineitem
    # scans); one lazy checkpoint computes it once
    ob = ob.localCheckpoint(eager=False)
    nb = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_b"))
    tot = ob.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    a, b = ob.alias("A"), ob.alias("B")
    pairs = (
        a.join(
            b,
            (F.col("A.l_orderkey") == F.col("B.l_orderkey"))
            & (F.col("A.p_brand") < F.col("B.p_brand")),
        )
        .groupBy(
            F.col("A.p_brand").alias("brand_a"),
            F.col("B.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= 3)
    )
    na = nb.select(F.col("p_brand").alias("brand_a"), F.col("n_b").alias("__na"))
    nb2 = nb.select(F.col("p_brand").alias("brand_b"), F.col("n_b").alias("__nb"))
    out = pairs.join(na, "brand_a").join(nb2, "brand_b").crossJoin(tot)
    lift = (
        F.lit(1_000_000.0)
        * (F.col("n_pair").cast("double") * F.col("n_orders").cast("double"))
        / (F.col("__na").cast("double") * F.col("__nb").cast("double"))
    )
    return out.select(
        "brand_a", "brand_b", "n_pair",
        F.expr("(n_pair * 1000000) div __na").alias("conf_a_to_b"),
        F.floor(lift).cast("long").alias("lift_micro"),
    )


@query(
    "tpch-q5",
    """
    SELECT n_name,
           sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark, sf):
    """TPC-H Q5 (local supplier volume): the 6-way star join —
    region→nation prune the supplier side, customer and supplier must
    share a nation (the join that defeats naive join ordering), fact
    revenue aggregated per nation in exact integer cents. region and
    nation are constant-size dims (5/25 rows at ANY SF, safe for AQE
    broadcast); customer/supplier/orders/lineitem grow with SF so no
    forced hints — Catalyst's join reordering + AQE pick the plan, the
    point of expressing Q5 declaratively."""
    region = t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    nation = t(spark, sf, "nation")
    supp = t(spark, sf, "supplier")
    cust = t(spark, sf, "customer")
    orders = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = t(spark, sf, "lineitem")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("n_name").agg(
        (
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            )
            / 100.0
        ).alias("revenue")
    )


@query(
    "window-range-frame",
    """
    SELECT o_orderkey, o_custkey, d,
           CAST(sum(cents) OVER (
             PARTITION BY o_custkey ORDER BY d
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS roll7_cents
    FROM (
      SELECT o_orderkey, o_custkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    """,
)
def window_range_frame(spark, sf):
    """RANGE-frame window (vs the window-suite's ROWS frames): 7-day
    rolling order revenue per customer — the frame is defined by the
    ORDER-BY VALUE (integer day index, 6 preceding days + today,
    including all same-day peers), so the result is deterministic
    without any tiebreak even when a customer places several orders a
    day. One keyed window exchange; integer days and cents keep both
    engines bit-identical."""
    o = t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        # timezone-free day index: o_orderdate is TIMESTAMP_NTZ, so
        # epoch arithmetic would drag in a session timezone
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-6, Window.currentRow)
    )
    return o.withColumn("roll7_cents", F.sum("cents").over(w)).select(
        "o_orderkey", "o_custkey", "d", "roll7_cents"
    )


from genpipe_spark.registry import ORACLES as _ORACLES  # noqa: E402
from genpipe_spark.registry import QUERIES  # noqa: E402

@query(
    "scd2-change-feed",
    f"""
    WITH h AS ({_ORACLES["scd2-history"]}),
    x AS (
      SELECT *, lead(valid_from) OVER (PARTITION BY custkey
                                       ORDER BY valid_from) AS nf
      FROM h
    )
    SELECT custkey, seg, st, valid_from AS seq, 'U' AS op FROM h
    UNION ALL
    SELECT custkey, seg, st, valid_to AS seq, 'D' AS op FROM x
    WHERE valid_to IS NOT NULL AND (nf IS NULL OR nf <> valid_to)
    """,
)
def scd2_change_feed_query(spark, sf):
    """Change-data-feed reconstruction (operators/cdc.scd2_change_feed
    — the inverse of scd2_history, third CDC inverse pair): every
    version re-emits its upsert at valid_from; versions closed by
    something other than the next version's valid_from were closed by
    a DELETE, re-emitted with the before-image. The oracle wraps the
    scd2-history oracle and replays the same lead-based gap
    detection. Roundtrip law scd2_history(feed) == history is
    pytest-proven on this same fixture."""
    from genpipe_spark.operators.cdc import scd2_change_feed

    h = QUERIES["scd2-history"](spark, sf)
    return scd2_change_feed(h, ["custkey"], ["seg", "st"])


@query(
    "tpch-q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark, sf):
    """TPC-H Q4 shape — the EXISTS-decorrelation pattern: count orders
    per priority having at least one qualifying lineitem. (The fixture
    lineitem has no commitdate/receiptdate, so the inner predicate is
    l_discount > 0.05 — the decorrelation shape, a correlated EXISTS
    turning into a LEFT SEMI join, is what this entry pins.) Spark
    plans the semi-join hash-partitioned on l_orderkey with the date
    filter pushed to the orders scan; the lineitem side is pre-filtered
    BEFORE the shuffle, so the exchange carries only qualifying keys —
    the posture that survives a 100x fact-table scale-up."""
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = t(spark, sf, "lineitem").where(F.col("l_discount") > 0.05)
    sem = o.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")),
        "o_orderkey",
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "tpch-q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark, sf):
    """TPC-H Q13 shape — customer order-count distribution INCLUDING
    zero-order customers: the outer-join-then-groupBy pattern where the
    join predicate carries an extra non-key condition (here priority
    <> '1-URGENT'; the fixture has no o_comment for the LIKE). count(
    o_orderkey) counts non-NULL matches only, so customers with no
    qualifying order land in the c_count=0 bucket instead of vanishing
    — the semantics an inner join silently breaks. Two shuffles
    (join + final distribution agg); the per-customer count rides the
    join's own partitioning."""
    c = t(spark, sf, "customer").select("c_custkey")
    o = t(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    j = c.join(
        o,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left",
    )
    per_cust = j.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch-q17",
    """
    WITH li AS (
      SELECT l_partkey,
             CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
      FROM lineitem
    ),
    part_avg AS (
      SELECT l_partkey, sum(qty_c) AS sum_qty_c, count(*) AS n_li
      FROM li GROUP BY l_partkey
    )
    SELECT sum(price_c) / 700.0 AS avg_yearly
    FROM li
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg USING (l_partkey)
    WHERE p_brand = 'Brand#4'
      AND 5 * qty_c * n_li < sum_qty_c
    """,
)
def tpch_q17(spark, sf):
    """TPC-H Q17 shape — the correlated scalar subquery
    (l_quantity < 0.2 * per-part avg quantity) decorrelated into a
    per-part aggregate joined back to the fact rows. The threshold
    compare is EXACT integer arithmetic: qty < 0.2*(sum/n) <=>
    5*qty_c*n < sum_c in int64 cents, so the boundary never depends on
    double rounding (the fixture has no p_container; the part filter
    is brand-only). The per-part aggregate is computed over the FULL
    lineitem (the correlation is over all parts' lineitems, not just
    the brand's) but reduces map-side to |parts| rows before its
    shuffle; the brand filter prunes the probe side early."""
    li = t(spark, sf, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
    )
    part_avg = li.groupBy("l_partkey").agg(
        F.sum("qty_c").alias("sum_qty_c"), F.count(F.lit(1)).alias("n_li")
    )
    p = t(spark, sf, "part").where(F.col("p_brand") == "Brand#4").select(
        F.col("p_partkey").alias("l_partkey")
    )
    j = li.join(p, "l_partkey").join(part_avg, "l_partkey")
    return j.where(
        F.lit(5) * F.col("qty_c") * F.col("n_li") < F.col("sum_qty_c")
    ).agg((F.sum("price_c") / 700.0).alias("avg_yearly"))


@query(
    "tpch-q18",
    """
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS total_qty_c
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 25000
    )
    SELECT c_custkey, o_orderkey, total_qty_c,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def tpch_q18(spark, sf):
    """TPC-H Q18 shape (large-volume customers) — the
    groupBy-HAVING-then-join-back pattern: orders whose total quantity
    exceeds a threshold (IN-subquery decorrelated into an aggregate +
    equi-join), enriched with the customer. Quantities in exact integer
    cents. Scale shape: the fact aggregate reduces map-side to
    |orders| rows BEFORE its shuffle and the HAVING prunes to a tiny
    key set, so the two enrichment joins probe with a small build side
    AQE will broadcast — the right plan at any SF."""
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty_c").alias("total_qty_c"))
        .where(F.col("total_qty_c") > 25000)
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    c = t(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    j = big.join(o, "l_orderkey").join(c, "o_custkey")
    return j.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("l_orderkey").alias("o_orderkey"),
        "total_qty_c", "price_c",
    )


@query(
    "join-null-safe",
    """
    WITH a AS (
      SELECT nullif(o_custkey % 50, 0) AS k, count(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT nullif(c_custkey % 50, 0) AS k, count(*) AS n_cust
      FROM customer GROUP BY 1
    )
    SELECT a.k, n_orders, n_cust
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe(spark, sf):
    """NULL-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL
    bucket on each side matches — the semantic a plain equi-join
    silently drops (NULL = NULL is NULL, the row vanishes). Both sides
    pre-aggregate to one row per key, so the NULL<=>NULL match is a
    single pair, not a hidden NULL-cross-product. Spark plans eqNullSafe
    as an ordinary hash-join key (EqualNullSafe is a valid equi-join
    expression — no nested-loop fallback), so the shape scales exactly
    like join-inner-equi."""
    o = t(spark, sf, "orders").select(
        F.nullif(F.col("o_custkey") % 50, F.lit(0)).alias("k")
    )
    a = o.groupBy("k").agg(F.count(F.lit(1)).alias("n_orders"))
    c = t(spark, sf, "customer").select(
        F.nullif(F.col("c_custkey") % 50, F.lit(0)).alias("k")
    )
    b = c.groupBy("k").agg(F.count(F.lit(1)).alias("n_cust"))
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"].alias("k"), "n_orders", "n_cust"
    )


@query(
    "tpch-q21",
    """
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_suppkey, s_name, count(*) AS numwait
    FROM (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM l l1
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM l l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM l l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    ) b
    JOIN supplier ON s_suppkey = b.l_suppkey
    GROUP BY s_suppkey, s_name
    """,
)
def tpch_q21(spark, sf):
    """TPC-H Q21 shape (suppliers who kept orders waiting) — the
    hardest decorrelation pattern: a correlated EXISTS plus a correlated
    NOT EXISTS against the SAME fact table. The oracle runs the literal
    nested form; the Spark plan is the aggregate rewrite a 100 TB run
    needs — ONE groupBy(l_orderkey) computing n_supp (distinct
    suppliers) and n_late_supp (distinct late suppliers), then
    EXISTS(other supplier) == n_supp >= 2 and NOT EXISTS(other late
    supplier) == n_late_supp == 1 for a late supplier's own row. That
    replaces two shuffled self-joins of lineitem with one partial-agg
    shuffle at |orders| rows — the decisive rewrite when lineitem is
    the 100 TB side. "Late" is l_shipdate > o_orderdate + 90 days (the
    fixture has no commitdate/receiptdate; same predicate both
    engines, exact timestamp arithmetic). The blamed-row set then
    groups per supplier and enriches from the supplier dim (AQE
    broadcasts the tiny distinct-key side)."""
    o = t(spark, sf, "orders").where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(o, "l_orderkey").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .alias("late"),
    )
    # r12 (guide §2.3 — aggregate before you shuffle): reduce the fact
    # join ONCE to distinct (order, supplier) pairs with a combinable
    # max(late) flag; per-order supplier counts are then plain counts
    # over the pair table (the old per-order agg paid TWO countDistinct
    # Expands x |fact| rows) and the blamed-pair distinct is the
    # late-flag filter — and both consumers share the one materialized
    # pair table instead of re-deriving the lineitem⋈orders join.
    # Equivalence: n_supp == countDistinct(l_suppkey) == #pairs per
    # order; n_late_supp == countDistinct(when(late, suppkey)) ==
    # #pairs with ANY late line; blamed == distinct late pairs ==
    # pairs where late_any.
    # (no checkpoint: both consumers embed the identical pair-agg
    # Exchange, so ReuseExchange shares the fact-side shuffle at
    # runtime — A/B-measured faster than materializing the pair table)
    pairs = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late_any")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("late_any").cast("long")).alias("n_late_supp"),
    )
    blamed = (
        pairs.where(F.col("late_any"))
        .select("l_orderkey", "l_suppkey")
        .join(
            per_order.where(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
    )
    numwait = blamed.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("numwait"))
    s = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return numwait.join(
        s, F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "numwait")


@query(
    "tpch-q22",
    """
    WITH c AS (
      SELECT c_custkey, c_nationkey % 5 AS cntrycode,
             CAST(round(c_acctbal * 100) AS BIGINT) AS acct_c
      FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)
    ),
    avgpos AS (
      SELECT CAST(sum(acct_c) AS BIGINT) AS s, count(*) AS n
      FROM c WHERE acct_c > 0
    )
    SELECT cntrycode, count(*) AS numcust,
           CAST(sum(acct_c) AS BIGINT) AS totacctbal_c
    FROM c, avgpos
    WHERE acct_c * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cntrycode
    """,
)
def tpch_q22(spark, sf):
    """TPC-H Q22 shape (global-sales-opportunity) — the two remaining
    decorrelation idioms in one query: an UNCORRELATED scalar subquery
    (global avg of positive balances) every row compares against, and a
    correlated NOT EXISTS (customers with no order SINCE 2000-01-01 —
    the fixture's order coverage is total, so a plain no-orders
    predicate is vacuous; the inactivity window keeps the anti-join
    non-vacuous at every SF) that becomes a LEFT ANTI join against the
    date-filtered orders. The country code is c_nationkey % 5 (the
    fixture has no c_phone prefix). The avg compare is EXACT int64:
    acct_c > s/n  <=>  acct_c * n > s in cents — no double division at
    the boundary. Scale shape: the 1-row aggregate broadcasts (an
    explicit broadcast of a provably-1-row side), the anti-join
    shuffles on custkey only after the balance filter pruned the
    probe side and the date filter pruned the build side."""
    c = t(spark, sf, "customer").select(
        "c_custkey",
        (F.col("c_nationkey") % 5).alias("cntrycode"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acct_c"),
    ).where(F.col("cntrycode").isin(0, 1, 2))
    avgpos = c.where(F.col("acct_c") > 0).agg(
        F.sum("acct_c").alias("s"), F.count(F.lit(1)).alias("n")
    )
    rich = c.join(F.broadcast(avgpos)).where(
        F.col("acct_c") * F.col("n") > F.col("s")
    )
    o = (
        t(spark, sf, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    no_orders = rich.join(o, "c_custkey", "left_anti")
    return no_orders.groupBy("cntrycode").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("acct_c").alias("totacctbal_c"),
    )


@query(
    "tpch-q10",
    """
    WITH li AS (
      SELECT l_orderkey,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c2
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT c_custkey, c_name, n_name,
           CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
           CAST(sum(rev_c2) AS BIGINT) AS revenue_c2
    FROM li
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, n_name, acctbal_c
    """,
)
def tpch_q10(spark, sf):
    """TPC-H Q10 shape (returned-item revenue report): fact filtered on
    returnflag, quarter-windowed orders, two dim enrichments, grouped
    revenue per customer. Revenue in exact 1e-4-dollar units:
    price_c * (100 - disc_pct), both int64 — sum order never matters.
    Scale shape: both fact filters reach their scans (returnflag +
    orderdate pushed), the orders/lineitem join shuffles only filtered
    rows, customer joins on the already-aggregated-size key set and
    nation (25 rows) broadcasts. The TPC-H top-20 LIMIT is dropped —
    ties under revenue make it nondeterministic; callers top-k with
    (revenue, custkey) ordering."""
    li = t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_c2"),
    )
    o = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    ).select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    cust = t(spark, sf, "customer").select(
        F.col("c_custkey"), "c_name", "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_c"),
    )
    n = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    j = (
        li.join(o, "l_orderkey")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, "c_nationkey")
    )
    return j.groupBy("c_custkey", "c_name", "n_name", "acctbal_c").agg(
        F.sum("rev_c2").alias("revenue_c2")
    )


@query(
    "tpch-q14",
    """
    WITH li AS (
      SELECT l_partkey,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c2
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-03-01'
    )
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_c2 ELSE 0 END)
                AS BIGINT) AS promo_rev_c2,
           CAST(sum(rev_c2) AS BIGINT) AS total_rev_c2,
           count(*) AS n_items
    FROM li JOIN part ON p_partkey = l_partkey
    """,
)
def tpch_q14(spark, sf):
    """TPC-H Q14 shape (promotion effect): windowed fact joined to the
    part dim, conditional aggregation splitting revenue by p_type. The
    ratio is reported as its EXACT integer numerator/denominator pair
    (promo_rev_c2, total_rev_c2) instead of a float percentage — the
    caller divides; the engines never do. Scale shape: shipdate window
    pushed to the scan, part is the build side (AQE broadcasts it at
    small SF, shuffles at large), ONE conditional agg pass — the
    CASE-inside-SUM pattern, not two joins."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-03-01")
    ).select(
        "l_partkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_c2"),
    )
    p = t(spark, sf, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    j = li.join(p, "l_partkey")
    return j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("rev_c2")).otherwise(0)
        ).alias("promo_rev_c2"),
        F.sum("rev_c2").alias("total_rev_c2"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "tpch-q19",
    """
    WITH li AS (
      SELECT l_partkey,
             CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c2
      FROM lineitem
    )
    SELECT CAST(sum(rev_c2) AS BIGINT) AS revenue_c2, count(*) AS n_rows
    FROM li JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND qty_c BETWEEN 100 AND 1100)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND qty_c BETWEEN 1000 AND 2000)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND qty_c BETWEEN 2000 AND 3000)
    """,
)
def tpch_q19(spark, sf):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    an equi-join on partkey whose residual is an OR of three
    brand/size/quantity conjunct groups — the pattern that degrades to
    a nested-loop join if the common equi-key isn't factored out.
    Spark extracts the p_partkey = l_partkey conjunct (common to all
    branches) as the hash-join key and evaluates the OR as a post-join
    filter; quantities compare in exact integer cents. At 100 TB the
    OR also admits partial pushdown (brand IN (...) and size <= 15 are
    implied supersets Catalyst derives), pruning the dim scan."""
    li = t(spark, sf, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_c2"),
    )
    p = t(spark, sf, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand", "p_size"
    )
    j = li.join(p, "l_partkey")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("qty_c").between(100, 1100)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("qty_c").between(1000, 2000)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("qty_c").between(2000, 3000)
        )
    )
    return j.where(cond).agg(
        F.sum("rev_c2").alias("revenue_c2"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_BUCKET_SIG = (
    "((((c_custkey % 1000000007 + 1000000007) % 1000000007) * 1000003"
    " + ((c_nationkey % 1000000007 + 1000000007) % 1000000007))"
    " % 1000000007 * 1000003"
    " + ((acct_cents % 1000000007 + 1000000007) % 1000000007))"
    " % 1000000007"
)


@query(
    "validate-bucket-checksum",
    f"""
    WITH old AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS acct_cents
      FROM customer
    ),
    new AS (
      SELECT c_custkey, c_nationkey,
             CASE WHEN c_custkey % 7 = 0 THEN acct_cents + 1000
                  ELSE acct_cents END AS acct_cents
      FROM old WHERE c_custkey % 10 <> 0
      UNION ALL
      SELECT -c_custkey, c_nationkey, acct_cents
      FROM old WHERE c_custkey % 13 = 0
    ),
    co AS (
      SELECT ((c_custkey % 64) + 64) % 64 AS bucket, count(*) AS n,
             CAST(sum({_BUCKET_SIG}) % 1000000007 AS BIGINT) AS s,
             bit_xor({_BUCKET_SIG}) AS x
      FROM old GROUP BY 1
    ),
    cn AS (
      SELECT ((c_custkey % 64) + 64) % 64 AS bucket, count(*) AS n,
             CAST(sum({_BUCKET_SIG}) % 1000000007 AS BIGINT) AS s,
             bit_xor({_BUCKET_SIG}) AS x
      FROM new GROUP BY 1
    )
    SELECT COALESCE(co.bucket, cn.bucket) AS bucket,
           co.n AS n_old, cn.n AS n_new,
           co.s AS sum_old, cn.s AS sum_new,
           co.x AS xor_old, cn.x AS xor_new
    FROM co FULL OUTER JOIN cn ON co.bucket = cn.bucket
    WHERE (co.n, co.s, co.x) IS DISTINCT FROM (cn.n, cn.s, cn.x)
    """,
)
def validate_bucket_checksum(spark, sf):
    """Snapshot drift detection by bucket checksum
    (operators/cdc.bucket_checksum): customer vs the same perturbed
    next snapshot as snapshot-diff, each reduced to 64 bucket rows of
    (count, polynomial-sum, bit_xor) signatures, full-outer-joined on
    the bucket id and filtered to the buckets that actually changed.
    This is the O(|buckets|) FIRST pass of a 100 TB table compare —
    the row-level snapshot_diff then runs with both scans pruned to
    the dirty buckets, turning a full-table diff into a touched-data
    diff. All signature arithmetic is canonicalised int64 mod
    1000000007 (identical in both engines, including negative keys),
    so the checksums — not just the verdicts — hash-match the
    oracle."""
    from genpipe_spark.operators.cdc import bucket_checksum

    old = t(spark, sf, "customer").select(
        "c_custkey", "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acct_cents"),
    )
    new = old.where(F.col("c_custkey") % 10 != 0).withColumn(
        "acct_cents",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("acct_cents") + 1000
        ).otherwise(F.col("acct_cents")),
    ).unionByName(
        old.where(F.col("c_custkey") % 13 == 0).withColumn(
            "c_custkey", -F.col("c_custkey")
        )
    )
    cols = (["c_custkey"], ["c_nationkey", "acct_cents"])
    co = bucket_checksum(old, *cols, n_buckets=64).alias("O")
    cn = bucket_checksum(new, *cols, n_buckets=64).alias("N")
    j = co.join(cn, F.col("O.bucket") == F.col("N.bucket"), "full_outer")
    changed = (
        ~F.struct("O.n_rows", "O.sum_sig", "O.xor_sig").eqNullSafe(
            F.struct("N.n_rows", "N.sum_sig", "N.xor_sig")
        )
    )
    return j.where(changed).select(
        F.coalesce("O.bucket", "N.bucket").alias("bucket"),
        F.col("O.n_rows").alias("n_old"), F.col("N.n_rows").alias("n_new"),
        F.col("O.sum_sig").alias("sum_old"), F.col("N.sum_sig").alias("sum_new"),
        F.col("O.xor_sig").alias("xor_old"), F.col("N.xor_sig").alias("xor_new"),
    )


@query(
    "copurchase-triples",
    """
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    freq_pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
      HAVING count(*) >= 3
    ),
    pairs_in_order AS (
      SELECT a.l_orderkey, a.p_brand AS brand_a, b.p_brand AS brand_b
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      WHERE EXISTS (SELECT 1 FROM freq_pairs f
                    WHERE f.brand_a = a.p_brand AND f.brand_b = b.p_brand)
    )
    SELECT brand_a, brand_b, c.p_brand AS brand_c,
           count(*) AS n_orders
    FROM pairs_in_order p JOIN ob c
      ON c.l_orderkey = p.l_orderkey AND c.p_brand > p.brand_b
    GROUP BY 1, 2, 3
    HAVING count(*) >= 3
    """,
)
def copurchase_triples(spark, sf):
    """3-itemset mining — the Apriori level after copurchase-pairs:
    brand triples bought together in >= 3 orders. The scale move is
    DOWNWARD CLOSURE: a triple can only reach min-support if every
    sub-pair does, so the per-order pair stream is LEFT SEMI pruned
    against the frequent-pairs set BEFORE the third extension join —
    semantics provably unchanged (the oracle applies the same prune
    via IN), fan-out cut from C(basket,3) to only extensions of
    surviving pairs. All joins are equi on the order key with
    lexicographic a<b<c ordering so each unordered triple counts
    exactly once; per-order fan-out stays basket-bounded, never
    corpus-quadratic."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    p = t(spark, sf, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    ob = li.join(p, "l_partkey").select("l_orderkey", "p_brand").distinct()
    # r12 (guide §5): ob feeds both pair sides AND the extension side C
    # — one lazy checkpoint instead of three scan+join+distinct trees
    ob = ob.localCheckpoint(eager=False)
    a, b = ob.alias("A"), ob.alias("B")
    pairs = a.join(
        b,
        (F.col("A.l_orderkey") == F.col("B.l_orderkey"))
        & (F.col("A.p_brand") < F.col("B.p_brand")),
    ).select(
        F.col("A.l_orderkey").alias("l_orderkey"),
        F.col("A.p_brand").alias("brand_a"),
        F.col("B.p_brand").alias("brand_b"),
    )
    # pairs feeds the frequent-pair agg AND the pruned extension join —
    # checkpoint so the basket self-join runs once (guide §5)
    pairs = pairs.localCheckpoint(eager=False)
    freq = (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 3)
        .select("brand_a", "brand_b")
    )
    pruned = pairs.join(freq, ["brand_a", "brand_b"], "left_semi").alias("P")
    c = ob.alias("C")
    triples = pruned.join(
        c,
        (F.col("P.l_orderkey") == F.col("C.l_orderkey"))
        & (F.col("C.p_brand") > F.col("P.brand_b")),
    )
    return (
        triples.groupBy(
            F.col("P.brand_a").alias("brand_a"),
            F.col("P.brand_b").alias("brand_b"),
            F.col("C.p_brand").alias("brand_c"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 3)
    )


@query(
    "quantile-cont-interp",
    """
    WITH v AS (
      SELECT l_returnflag AS g,
             CAST(round(l_quantity * 100) AS BIGINT) AS qc,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity, l_orderkey,
                                         l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem WHERE l_quantity IS NOT NULL
    ),
    p AS (SELECT unnest([25, 50, 75]) AS pct),
    c AS (
      SELECT g, pct,
             CASE WHEN rn = (n - 1) * pct // 100 + 1
                  THEN qc * (100 - (n - 1) * pct % 100)
                  WHEN rn = (n - 1) * pct // 100 + 2
                  THEN qc * ((n - 1) * pct % 100)
             END AS contrib
      FROM v CROSS JOIN p
    )
    SELECT g, pct, CAST(sum(contrib) AS BIGINT) AS interp_c100
    FROM c WHERE contrib IS NOT NULL
    GROUP BY g, pct
    """,
)
def quantile_cont_interp(spark, sf):
    """SQL-standard PERCENTILE_CONT (linear interpolation between the
    two bracketing order statistics) — the continuous sibling of
    quantile-group-exact's nearest-rank PERCENTILE_DISC. The
    interpolation is EXACT integer arithmetic: position
    (n-1)*pct/100 splits into idx = (n-1)*pct div 100 and remainder
    rem; the result is reported as interp_c100 = lo_c*(100-rem) +
    hi_c*rem — cents x 100 units, the un-divided numerator — so no
    engine ever performs the float division and the boundary rows
    (rem = 0, where the hi bracket may not exist) fall out naturally
    as a zero term. Plan shape: ONE ranking window per group + a
    3-row percentile explode + one grouped sum of the (at most two)
    non-NULL contributions per (group, pct) — same single-shuffle
    posture as quantile-group-exact. Tie-break (value, orderkey,
    linenumber) makes rn engine-identical under duplicate values."""
    from pyspark.sql import Window

    li = t(spark, sf, "lineitem").where(F.col("l_quantity").isNotNull())
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    v = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    c = v.select(
        "g", "qc", "rn", "n",
        F.explode(F.array(F.lit(25), F.lit(50), F.lit(75))).alias("pct"),
    ).select(
        "g", "pct",
        F.when(
            F.col("rn") == F.expr("(n - 1) * pct div 100 + 1"),
            F.col("qc") * (F.lit(100) - F.expr("(n - 1) * pct % 100")),
        ).when(
            F.col("rn") == F.expr("(n - 1) * pct div 100 + 2"),
            F.col("qc") * F.expr("(n - 1) * pct % 100"),
        ).alias("contrib"),
    )
    return (
        c.where(F.col("contrib").isNotNull())
        .groupBy("g", "pct")
        .agg(F.sum("contrib").alias("interp_c100"))
    )


@query(
    "agg-spearman-corr",
    """
    WITH base AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    ranked AS (
      SELECT g,
             2 * rank() OVER (PARTITION BY g ORDER BY x)
               + count(*) OVER (PARTITION BY g, x) - 1 AS dx,
             2 * rank() OVER (PARTITION BY g ORDER BY y)
               + count(*) OVER (PARTITION BY g, y) - 1 AS dy
      FROM base
    ),
    s AS (
      SELECT g, count(*) AS n,
             CAST(sum(dx) AS BIGINT) AS sx,
             CAST(sum(dy) AS BIGINT) AS sy,
             CAST(sum((dx*dx) // 1073741824) AS BIGINT) AS sxx_hi,
             CAST(sum((dx*dx) % 1073741824) AS BIGINT) AS sxx_lo,
             CAST(sum((dy*dy) // 1073741824) AS BIGINT) AS syy_hi,
             CAST(sum((dy*dy) % 1073741824) AS BIGINT) AS syy_lo,
             CAST(sum((dx*dy) // 1073741824) AS BIGINT) AS sxy_hi,
             CAST(sum((dx*dy) % 1073741824) AS BIGINT) AS sxy_lo
      FROM ranked GROUP BY g
    )
    SELECT g, n,
           CAST(floor(1000000.0 *
                 (CAST(n AS DOUBLE)
                    * (CAST(sxy_hi AS DOUBLE) * 1073741824.0
                       + CAST(sxy_lo AS DOUBLE))
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE)
                           * (CAST(sxx_hi AS DOUBLE) * 1073741824.0
                              + CAST(sxx_lo AS DOUBLE))
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE)
                             * (CAST(syy_hi AS DOUBLE) * 1073741824.0
                                + CAST(syy_lo AS DOUBLE))
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             AS BIGINT) AS spearman_micro
    FROM s
    """,
)
def agg_spearman_corr(spark, sf):
    """Grouped Spearman rank correlation — the robust, monotone-
    invariant sibling of agg-grouped-corr, with EXACT tie handling:
    the average rank of a tie group is (2*min_rank + ties - 1)/2, so
    DOUBLED ranks dx = 2*rank() + count_over(g, value) - 1 stay pure
    int64 (doubling both sides leaves Pearson invariant — corr is
    scale-free). The moment accumulation reuses the agg-grouped-corr
    (hi, lo) 2^30 split verbatim (dx <= 2n, dx² <= 4n² — cents-scale-
    equivalent magnitudes at sf10+), and the final fold is the same
    pinned-order IEEE double reconstruction, so spearman_micro is
    bit-identical across engines. Plan: two ranking windows (one per
    variable, each partitioned by group — no global window) + ONE
    map-side-combinable moment aggregate."""
    from pyspark.sql import Window

    li = t(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dx = (
        F.lit(2) * F.rank().over(Window.partitionBy("g").orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("g", "x"))
        - 1
    )
    dy = (
        F.lit(2) * F.rank().over(Window.partitionBy("g").orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("g", "y"))
        - 1
    )
    r = li.select("g", dx.alias("dx"), dy.alias("dy"))
    split = 1073741824

    def hi_lo(prod, tag):
        return [
            F.sum(F.expr(f"({prod}) div {split}")).alias(f"{tag}_hi"),
            F.sum(F.expr(f"({prod}) % {split}")).alias(f"{tag}_lo"),
        ]

    s = r.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        *hi_lo("dx*dx", "sxx"),
        *hi_lo("dy*dy", "syy"),
        *hi_lo("dx*dy", "sxy"),
    )

    def recon_d(tag):
        return (
            F.col(f"{tag}_hi").cast("double") * F.lit(float(split))
            + F.col(f"{tag}_lo").cast("double")
        )

    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n_d * recon_d("sxy") - sx_d * sy_d
    den = F.sqrt(
        (n_d * recon_d("sxx") - sx_d * sx_d)
        * (n_d * recon_d("syy") - sy_d * sy_d)
    )
    return s.select(
        "g", "n",
        F.floor(F.lit(1_000_000.0) * num / den).cast("long")
        .alias("spearman_micro"),
    )


@query(
    "layout-compaction-plan",
    """
    WITH files AS (
      SELECT o_orderkey % 200 AS file_id, count(*) AS n_rows
      FROM orders GROUP BY 1
    ),
    planned AS (
      SELECT file_id, n_rows,
             CAST(sum(n_rows) OVER (ORDER BY file_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS BIGINT) AS before
      FROM files
    )
    SELECT file_id, n_rows,
           COALESCE(before, 0) // 400 AS target_bin
    FROM planned
    """,
)
def layout_compaction_plan(spark, sf):
    """Small-file compaction PLANNING as a query — the assignment step
    of operators/layout.compact_small_files made declarative and
    oracle-checkable: a simulated file inventory (orders bucketed to
    200 'files' with row counts as the size proxy) is packed into
    target bins by exclusive running size: bin = (size of everything
    before me) div capacity — the sequential fill a sorted OPTIMIZE
    run performs, deterministic and engine-identical in int64. The
    ordering window is GLOBAL but bounded by METADATA size (#files —
    thousands at 100 TB, never data-sized; the compaction itself then
    moves data with one partitioned write per bin), which is exactly
    the boundedness argument for every table-maintenance planner. The
    inventory aggregation underneath is a normal map-side-combinable
    shuffle over the data."""
    from pyspark.sql import Window

    files = (
        t(spark, sf, "orders")
        .groupBy((F.col("o_orderkey") % 200).alias("file_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w = (
        Window.orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # int64 div, not double division + cast (the rollup-ohlc rule)
    return files.select(
        "file_id", "n_rows",
        F.coalesce(F.sum("n_rows").over(w), F.lit(0)).alias("__before"),
    ).select(
        "file_id", "n_rows", F.expr("__before div 400").alias("target_bin")
    )


@query(
    "tpch-q6",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT))
                AS BIGINT) AS revenue_c2,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND CAST(round(l_quantity * 100) AS BIGINT) < 2400
    """,
)
def tpch_q6(spark, sf):
    """TPC-H Q6 (forecasting revenue change): the pure scan-filter-agg
    query — no join at all, the canonical predicate-pushdown +
    whole-stage-codegen benchmark. Revenue = sum(extendedprice *
    discount) in exact 1e-4-dollar int64 units; the discount band
    compares in integer percent so the 0.05/0.07 boundaries are exact,
    not float-rounded. Scale shape: the shipdate window pushes to the
    parquet scan (row-group min/max skipping), the three predicates
    evaluate inside ONE codegen stage, and the global agg is a
    map-side partial + 1-row final — the fastest possible 100 TB plan
    for this shape."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    return (
        li.where(disc_pct.between(5, 7) & (qty_c < 2400))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long") * disc_pct
            ).alias("revenue_c2"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "tpch-q7",
    """
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c2
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, l_year,
           CAST(sum(rev_c2) AS BIGINT) AS revenue_c2,
           count(*) AS n_lines
    FROM li
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE (sn.n_regionkey = 2 AND cn.n_regionkey = 3)
       OR (sn.n_regionkey = 3 AND cn.n_regionkey = 2)
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark, sf):
    """TPC-H Q7 (volume shipping): cross-border trade volume between
    two trading blocs, BOTH directions, by supplier nation x customer
    nation x ship year. Faithful shape: fact -> supplier and
    (via orders) customer, each enriched with its OWN copy of the
    nation dim — the double-dim-alias join — with the disjunctive
    direction predicate evaluated post-join. (The fixture's nation
    names carry no TPC-H semantics, so the two 'nations' are the
    region-2 and region-3 blocs — keeps both directions non-vacuous
    at every SF.) Revenue in exact 1e-4-dollar units. Scale shape:
    the 2-year shipdate window is pushed to the fact scan; nation
    (25 rows) broadcasts twice; the OR over the two direction pairs
    prunes nothing at the scan but Catalyst derives the implied
    regionkey IN (2,3) filter on BOTH nation copies, shrinking the
    supplier/customer join inputs before the fact shuffle."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("l_year"),
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_c2"),
    )
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    orders = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    sn = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
        F.col("n_regionkey").alias("s_regionkey"),
    )
    cn = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("cust_nation"),
        F.col("n_regionkey").alias("c_regionkey"),
    )
    j = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sn), "s_nationkey")
        .join(F.broadcast(cn), "c_nationkey")
    )
    both_dirs = (
        (F.col("s_regionkey") == 2) & (F.col("c_regionkey") == 3)
    ) | ((F.col("s_regionkey") == 3) & (F.col("c_regionkey") == 2))
    return j.where(both_dirs).groupBy(
        "supp_nation", "cust_nation", "l_year"
    ).agg(
        F.sum("rev_c2").alias("revenue_c2"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch-q8",
    """
    WITH li AS (
      SELECT l_orderkey, l_partkey, l_suppkey,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c2
      FROM lineitem
    )
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN sn.n_regionkey = 2 THEN rev_c2 ELSE 0 END)
                AS BIGINT) AS bloc_rev_c2,
           CAST(sum(rev_c2) AS BIGINT) AS total_rev_c2
    FROM li
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = cn.n_regionkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE r_name = 'AMERICA'
      AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_year
    """,
)
def tpch_q8(spark, sf):
    """TPC-H Q8 (national market share): of all ECONOMY-part revenue
    sold into AMERICA-region customers over two years, what share came
    from region-2-bloc suppliers, per order year. The widest TPC-H
    join tree without partsupp: fact + part + supplier + orders +
    customer + nation(x2 aliases) + region — 7 relations. The share is
    reported as its EXACT integer (numerator, denominator) pair per
    the q14 rule: engines never divide. (Fixture adaptation: supplier
    'nation' is the region-2 bloc — the fixture's nation names carry
    no TPC-H semantics — and p_type is a plain equality, the fixture
    having single-word types.) Scale shape: p_type and the order-date
    window push to their scans; part/supplier/nation/region broadcast
    under AQE at driver SF; the conditional CASE aggregation replaces
    the all-vs-subset double join — ONE pass over the joined fact."""
    li = t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_c2"),
    )
    p = t(spark, sf, "part").where(F.col("p_type") == "ECONOMY").select(
        F.col("p_partkey").alias("l_partkey")
    )
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    orders = t(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select(
        "o_orderkey",
        "o_custkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
    )
    cust = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    cn = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_regionkey").alias("c_regionkey"),
    )
    r = t(spark, sf, "region").where(F.col("r_name") == "AMERICA").select(
        F.col("r_regionkey").alias("c_regionkey")
    )
    sn = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_regionkey").alias("s_regionkey"),
    )
    j = (
        li.join(p, "l_partkey")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(r), "c_regionkey")
        .join(F.broadcast(sn), "s_nationkey")
    )
    return j.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("s_regionkey") == 2, F.col("rev_c2")).otherwise(0)
        ).alias("bloc_rev_c2"),
        F.sum("rev_c2").alias("total_rev_c2"),
    )


@query(
    "tpch-q12",
    """
    SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 60 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_bucket
    """,
)
def tpch_q12(spark, sf):
    """TPC-H Q12 shape (shipping priority audit): fact-to-orders join
    with BOTH the grouping key and the aggregated measures produced by
    CASE expressions — the conditional-bucket + conditional-count
    pattern. (Fixture adaptation: no l_shipmode/l_commitdate/
    l_receiptdate, so the group is a date-arithmetic lateness bucket —
    shipped 60+ days after the order date — which additionally pins
    timestamp + INTERVAL arithmetic identical across engines.) Scale
    shape: the ship-year window pushes to the fact scan; the join
    shuffles on orderkey carrying only (shipdate, priority); the
    two-row output comes from map-side partial aggs — at 100 TB this
    is join-bound, and the orders side carries exactly two pruned
    columns."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_shipdate")
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_orderdate",
        "o_orderpriority",
    )
    j = li.join(o, "l_orderkey")
    bucket = F.when(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        "LATE",
    ).otherwise("ONTIME")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(bucket.alias("ship_bucket")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@query(
    "tpch-q15",
    """
    WITH rev AS (
      SELECT l_suppkey AS s_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS total_rev_c2
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev_c2
    FROM supplier JOIN rev USING (s_suppkey)
    WHERE total_rev_c2 = (SELECT max(total_rev_c2) FROM rev)
    """,
)
def tpch_q15(spark, sf):
    """TPC-H Q15 (top supplier): a derived revenue-per-supplier view
    consumed TWICE — once for the global max (scalar subquery), once
    joined back to find every supplier achieving it. Revenue is exact
    int64 1e-4-dollar units, so 'the max' is well-defined with no
    float-tie ambiguity and ALL tied suppliers return (the TPC-H
    spec's own tie rule). Scale shape: the view is one map-side-
    combinable agg over the window-pruned fact; the max reduces it to
    ONE row which broadcasts back as the filter (explicit broadcast of
    a provably-1-row side — plan-audit whitelisted class); supplier
    joins on the post-aggregation key set, far smaller than the fact.
    Spark computes the view once per consumer (twice total) — both
    passes over the PRUNED fact; a persist() would trade memory for
    the second pass at a real 100 TB run's discretion."""
    li = t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("total_rev_c2")
    )
    mx = rev.agg(F.max("total_rev_c2").alias("__mx"))
    top = rev.join(F.broadcast(mx)).where(
        F.col("total_rev_c2") == F.col("__mx")
    ).drop("__mx")
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return top.join(supp, "s_suppkey").select(
        "s_suppkey", "s_name", "total_rev_c2"
    )


@query(
    "agg-ols-regression",
    """
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum((x*x) // 1073741824) AS BIGINT) AS sxx_hi,
             CAST(sum((x*x) % 1073741824) AS BIGINT) AS sxx_lo,
             CAST(sum((y*y) // 1073741824) AS BIGINT) AS syy_hi,
             CAST(sum((y*y) % 1073741824) AS BIGINT) AS syy_lo,
             CAST(sum((x*y) // 1073741824) AS BIGINT) AS sxy_hi,
             CAST(sum((x*y) % 1073741824) AS BIGINT) AS sxy_lo
      FROM (SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem)
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sx, sy,
           CAST(floor(1000000.0 *
                 (CAST(n AS DOUBLE)
                    * (CAST(sxy_hi AS DOUBLE) * 1073741824.0
                       + CAST(sxy_lo AS DOUBLE))
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE)
                      * (CAST(sxx_hi AS DOUBLE) * 1073741824.0
                         + CAST(sxx_lo AS DOUBLE))
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             AS BIGINT) AS slope_micro,
           CAST(floor(1000000.0 *
                 (CAST(sy AS DOUBLE)
                    * (CAST(sxx_hi AS DOUBLE) * 1073741824.0
                       + CAST(sxx_lo AS DOUBLE))
                  - CAST(sx AS DOUBLE)
                    * (CAST(sxy_hi AS DOUBLE) * 1073741824.0
                       + CAST(sxy_lo AS DOUBLE)))
                 / (CAST(n AS DOUBLE)
                      * (CAST(sxx_hi AS DOUBLE) * 1073741824.0
                         + CAST(sxx_lo AS DOUBLE))
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             AS BIGINT) AS intercept_micro,
           CAST(floor(1000000.0 *
                 ((CAST(n AS DOUBLE)
                     * (CAST(sxy_hi AS DOUBLE) * 1073741824.0
                        + CAST(sxy_lo AS DOUBLE))
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE)
                       * (CAST(sxy_hi AS DOUBLE) * 1073741824.0
                          + CAST(sxy_lo AS DOUBLE))
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((CAST(n AS DOUBLE)
                       * (CAST(sxx_hi AS DOUBLE) * 1073741824.0
                          + CAST(sxx_lo AS DOUBLE))
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE)
                         * (CAST(syy_hi AS DOUBLE) * 1073741824.0
                            + CAST(syy_lo AS DOUBLE))
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             AS BIGINT) AS r2_micro
    FROM s
    """,
)
def agg_ols_regression(spark, sf):
    """Grouped simple linear regression (y = a + b*x per return flag,
    x = quantity, y = price cents): slope, intercept, and R**2 from
    EXACT integer moments — the same 128-bit-safe (hi, lo)-split
    accumulation as agg-grouped-corr (sums of p div 2^30 / p mod 2^30
    never overflow int64 past 1e13 rows/group), reconstructed in
    IEEE-pinned double operation order so both engines emit
    bit-identical micro-integers. This is the closed-form regr_slope/
    regr_intercept/regr_r2 family computed the deterministic way —
    no per-engine float accumulation order anywhere. Preconditions:
    non-negative x, y (div/mod sign agreement) and non-constant x and
    y within every group (denominators nonzero; lineitem satisfies
    both). Scale shape: ONE map-side-combinable aggregate — partial
    state is 10 longs per group, no window, no second pass; the exact
    posture for a 100 TB per-segment trend fit."""
    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    split = 1073741824  # 2^30

    def hi_lo(prod, tag):
        return [
            F.sum(F.expr(f"({prod}) div {split}")).alias(f"{tag}_hi"),
            F.sum(F.expr(f"({prod}) % {split}")).alias(f"{tag}_lo"),
        ]

    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        *hi_lo("x*x", "sxx"),
        *hi_lo("y*y", "syy"),
        *hi_lo("x*y", "sxy"),
    )

    def recon_d(tag):
        return (
            F.col(f"{tag}_hi").cast("double") * F.lit(float(split))
            + F.col(f"{tag}_lo").cast("double")
        )

    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = n_d * recon_d("sxy") - sx_d * sy_d
    denx = n_d * recon_d("sxx") - sx_d * sx_d
    deny = n_d * recon_d("syy") - sy_d * sy_d
    inum = sy_d * recon_d("sxx") - sx_d * recon_d("sxy")
    return s.select(
        "l_returnflag", "n", "sx", "sy",
        F.floor(F.lit(1_000_000.0) * num / denx).cast("long").alias("slope_micro"),
        F.floor(F.lit(1_000_000.0) * inum / denx).cast("long").alias("intercept_micro"),
        F.floor(F.lit(1_000_000.0) * (num * num) / (denx * deny))
        .cast("long")
        .alias("r2_micro"),
    )


@query(
    "sort-skyline-pareto",
    """
    WITH p AS (
      SELECT p_partkey,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
             CAST(p_size AS BIGINT) AS p_size
      FROM part
      WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    )
    SELECT p_partkey, price_c, p_size FROM p
    WHERE NOT EXISTS (
      SELECT 1 FROM p q
      WHERE q.price_c <= p.price_c AND q.p_size <= p.p_size
        AND (q.price_c < p.price_c OR q.p_size < p.p_size)
    )
    """,
)
def sort_skyline_pareto(spark, sf):
    """2-D skyline / Pareto frontier (operators/relational.skyline_2d):
    the parts no other part beats on BOTH price and size — the
    multi-objective shortlist primitive. Spark runs the O(n log n)
    per-x-reduce + exclusive-running-min formulation; the oracle is
    the INDEPENDENT textbook NOT-EXISTS dominance spec, so the parity
    check proves the fast formulation equals the definition (the
    bloom-probe doctrine: oracle as spec, not replay)."""
    from genpipe_spark.operators.relational import skyline_2d

    p = t(spark, sf, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    return skyline_2d(p, "price_c", "p_size")


_APPORTION_ORACLE = """
WITH w AS (
  SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS w
  FROM customer GROUP BY 1
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM w),
q AS (
  SELECT k, w,
         (10000 * w) // wt AS base,
         (10000 * w) % wt AS rem
  FROM w CROSS JOIN tot
),
r AS (
  SELECT k, w, base, rem,
         row_number() OVER (ORDER BY rem DESC, k) AS rk,
         10000 - CAST(sum(base) OVER () AS BIGINT) AS leftover
  FROM q
)
SELECT k, w, base, rem,
       base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
FROM r
"""


@query("alloc-largest-remainder", _APPORTION_ORACLE)
def alloc_largest_remainder(spark, sf):
    """Hamilton largest-remainder apportionment
    (operators/alloc.largest_remainder_apportion): split 10,000 units
    across nations proportionally to customer count, floored quotas
    first, leftovers to the largest remainders with a deterministic
    key tie-break. Pure integer arithmetic ((10000*w) div/% W) — no
    floats anywhere, engine-exact by construction; sum(alloc) == 10000
    exactly. The ranking window is GLOBAL but runs over post-aggregate
    group-sized rows (25 nations), the same shape as global-row-number
    — the scan-sized work is one map-side-combinable count."""
    from genpipe_spark.operators.alloc import largest_remainder_apportion

    w = (
        t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return largest_remainder_apportion(
        w, key_cols=["k"], weight_col="w", seats=10_000
    ).select("k", "w", "base", "rem", "alloc")


_CIDR_ORACLE = """
WITH ips AS (
  SELECT c_custkey,
         (c_custkey * 2654435761) % 4294967296 AS ip
  FROM customer
),
blocks AS (
  SELECT n_nationkey, n_name,
         CAST(n_nationkey * 2 + m AS BIGINT) AS block_id,
         CAST(n_nationkey * 2 + m AS BIGINT) * 67108864 AS lo,
         CAST(n_nationkey * 2 + m AS BIGINT) * 67108864 + 67108863 AS hi
  FROM nation, (SELECT unnest([0, 1]) AS m)
)
SELECT c_custkey, ip,
       concat_ws('.', ip // 16777216, (ip // 65536) % 256,
                      (ip // 256) % 256, ip % 256) AS dotted,
       n_nationkey, n_name, block_id
FROM ips JOIN blocks ON ip BETWEEN lo AND hi
"""


@query("join-cidr-lookup", _CIDR_ORACLE)
def join_cidr_lookup(spark, sf):
    """IP-to-network containment join — the log-enrichment workhorse
    (geo/ASN lookup): map each event IP into its owning CIDR block via
    the banded interval join (operators/interval.interval_join). IPs
    are synthesized deterministically from customer keys (Knuth
    multiplicative hash mod 2^32 — exact int64 in both engines, the
    redact-pii fixture-synthesis pattern); blocks are two aligned /6
    ranges per nation. band_width equals the block size and blocks are
    block-aligned, so every interval lands in EXACTLY ONE band — the
    'range join' compiles to a pure shuffle equi-join with a residual,
    zero interval replication: the plan a 100 TB IP-enrichment join
    wants (CIDR tables are band-aligned by construction in real geo
    feeds; unaligned feeds just replicate into the few bands each
    block spans). Unmatched IPs (~22% of the space here) drop on the
    inner join, matching the oracle's BETWEEN."""
    from genpipe_spark.operators.interval import interval_join

    c = t(spark, sf, "customer")
    ips = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 2654435761) % 4294967296).alias("ip"),
    )
    n = t(spark, sf, "nation")
    blocks = (
        n.select("n_nationkey", "n_name")
        .withColumn("m", F.explode(F.array(F.lit(0), F.lit(1))))
        .select(
            "n_nationkey", "n_name",
            (F.col("n_nationkey") * 2 + F.col("m"))
            .cast("long").alias("block_id"),
        )
        .withColumn("lo", F.col("block_id") * 67108864)
        .withColumn("hi", F.col("block_id") * 67108864 + 67108863)
    )
    j = interval_join(ips, blocks, "ip", "lo", "hi", band_width=67108864)
    return j.select(
        "c_custkey", "ip",
        F.concat_ws(
            ".",
            F.expr("ip div 16777216"),
            F.expr("(ip div 65536) % 256"),
            F.expr("(ip div 256) % 256"),
            F.expr("ip % 256"),
        ).alias("dotted"),
        "n_nationkey", "n_name", "block_id",
    )


@query(
    "agg-grouping-sets",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)::BIGINT AS n,
           sum(cast(round(o_totalprice*100) as bigint))/100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf):
    """Explicit GROUPING SETS — the marginals-plus-grand-total report
    ((status), (priority), ()) that neither CUBE (would add the cross
    product) nor ROLLUP (hierarchical only) expresses: the exact
    shape of a dashboard's two independent breakdown panels + total,
    in ONE pass. Catalyst plans the same Expand(x3) feeding a single
    partially-aggregated shuffle as agg-cube — 3 replicas instead of
    4, and at 100 TB choosing sets explicitly over cube() is the
    difference between paying for the groupings a report uses and
    paying for 2^k. Subtotals surface as 'ALL' (grouping columns are
    non-null in the fixture); money via integer cents."""
    o = t(spark, sf, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("o_totalprice", "total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


_GEO_RADIUS_ORACLE = """
WITH p AS (
  SELECT c_custkey,
         (c_custkey * 48271) % 1000000 AS px,
         (c_custkey * 69621) % 1000000 AS py
  FROM customer
),
c AS (
  SELECT n_nationkey, n_name,
         (CAST(n_nationkey AS BIGINT) * 16807 + 123456) % 1000000 AS cx,
         (CAST(n_nationkey AS BIGINT) * 99991 + 654321) % 1000000 AS cy
  FROM nation
)
SELECT c_custkey, px, py, n_nationkey, n_name, cx, cy,
       (px - cx) * (px - cx) + (py - cy) * (py - cy) AS dist2
FROM p JOIN c
  ON (px - cx) * (px - cx) + (py - cy) * (py - cy) <= 400000000
"""


@query("join-geo-radius", _GEO_RADIUS_ORACLE)
def join_geo_radius(spark, sf):
    """Planar radius search (operators/spatial.grid_radius_join):
    every customer point within 20,000 units of a nation center on a
    1e6 x 1e6 integer grid (coordinates synthesized deterministically
    from keys — the fixture-synthesis pattern). The 3x3-neighborhood
    grid join replicates only the CENTER side (9x25 rows), equi-joins
    on the cell key, and verifies exact integer squared distance — no
    trig, no floats, whole-stage codegen; the oracle is the
    brute-force cross filter. The banded interval join's trick, one
    dimension up: ONE shuffle, candidates proportional to local
    density."""
    from genpipe_spark.operators.spatial import grid_radius_join

    c = t(spark, sf, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 48271) % 1000000).alias("px"),
        ((F.col("c_custkey") * 69621) % 1000000).alias("py"),
    )
    n = t(spark, sf, "nation")
    ctrs = n.select(
        "n_nationkey", "n_name",
        ((F.col("n_nationkey").cast("long") * 16807 + 123456) % 1000000)
        .alias("cx"),
        ((F.col("n_nationkey").cast("long") * 99991 + 654321) % 1000000)
        .alias("cy"),
    )
    j = grid_radius_join(pts, ctrs, "px", "py", "cx", "cy", radius=20000)
    return j.select(
        "c_custkey", "px", "py", "n_nationkey", "n_name", "cx", "cy", "dist2"
    )


def _hilbert3d_oracle(bits: int = 7) -> str:
    """DuckDB twin of operators/layout.hilbert_index_nd_pandas at d=3:
    Skilling's AxesToTranspose unrolled stage-for-stage — one CTE per
    (q, dim) inverse-undo step exactly mirroring the numpy loop, then
    the Gray encode, the t-fold, and the bit interleave. Generated,
    not hand-written, so the unroll can't drift from the loop."""
    carry = "event_id, hx0, hy0, hz0"
    ctes = [
        f"""q0 AS (
      SELECT event_id,
             user_id % 128 AS hx0, event_id % 128 AS hy0,
             (CAST(round(value*100) AS BIGINT) % 128) AS hz0,
             user_id % 128 AS x0, event_id % 128 AS x1,
             (CAST(round(value*100) AS BIGINT) % 128) AS x2
      FROM events WHERE value IS NOT NULL
    )"""
    ]
    prev, k = "q0", 0
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(3):
            k += 1
            xi = f"x{i}"
            if i == 0:
                sets = (
                    f"CASE WHEN (x0 & {q}) != 0 THEN xor(x0, {p}) "
                    f"ELSE x0 END AS x0, x1, x2"
                )
            else:
                others = ", ".join(
                    f"x{j}" for j in range(1, 3) if j != i
                )
                sets = (
                    f"CASE WHEN ({xi} & {q}) != 0 THEN xor(x0, {p}) "
                    f"ELSE xor(x0, (xor(x0, {xi}) & {p})) END AS x0, "
                    f"CASE WHEN ({xi} & {q}) != 0 THEN {xi} "
                    f"ELSE xor({xi}, (xor(x0, {xi}) & {p})) END AS {xi}"
                    + (f", {others}" if others else "")
                )
            ctes.append(
                f"s{k} AS (SELECT {carry}, {sets} FROM {prev})"
            )
            prev = f"s{k}"
        q >>= 1
    # Gray encode (sequential: x1 ^= x0 first, x2 ^= NEW x1)
    ctes.append(
        f"g AS (SELECT {carry}, x0, xor(x1, x0) AS x1, "
        f"xor(x2, xor(x1, x0)) AS x2 FROM {prev})"
    )
    # t-fold over the LAST dim, then apply to all dims
    terms = []
    q = 1 << (bits - 1)
    while q > 1:
        terms.append(f"CASE WHEN (x2 & {q}) != 0 THEN {q - 1} ELSE 0 END")
        q >>= 1
    t_expr = terms[0]
    for term in terms[1:]:
        t_expr = f"xor({t_expr}, {term})"
    ctes.append(
        f"ta AS (SELECT {carry}, xor(x0, t) AS x0, xor(x1, t) AS x1, "
        f"xor(x2, t) AS x2 FROM (SELECT *, ({t_expr}) AS t FROM g))"
    )
    # interleave: bit (b, i) lands at position 3b + (2 - i)
    hterms = [
        f"(((x{i} >> {b}) & 1) * {1 << (3 * b + 2 - i)})"
        for b in range(bits - 1, -1, -1)
        for i in range(3)
    ]
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT event_id, hx0 AS hx, hy0 AS hy, hz0 AS hz, "
        f"({' + '.join(hterms)}) AS hilbert_d FROM ta"
    )


@query("layout-hilbert-3d", _hilbert3d_oracle())
def layout_hilbert_3d(spark, sf):
    """3-D Hilbert clustering key (operators/layout.
    hilbert_index_nd_pandas, Skilling transpose, bits=7 per dim) over
    three exact-integer event coordinates — the multi-dimension
    data-layout key for 3-column skipping (the N-D generalization the
    2-D oracle couldn't cover; VERDICT r5 item 8 closed the operator,
    this closes its oracle). The DuckDB twin is GENERATED stage-for-
    stage from the same loop structure (_hilbert3d_oracle), so the
    18-stage inverse-undo unroll cannot drift from the vectorized
    numpy implementation it checks."""
    from genpipe_spark.operators.layout import hilbert_index_nd_pandas

    ev = (
        t(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_id",
            (F.col("user_id") % 128).alias("hx"),
            (F.col("event_id") % 128).alias("hy"),
            (F.round(F.col("value") * 100).cast("long") % 128).alias("hz"),
        )
    )
    return hilbert_index_nd_pandas(ev, ["hx", "hy", "hz"], bits=7).select(
        "event_id", "hx", "hy", "hz", "hilbert_d"
    )


# five literal geofence polygons on the 1000x1000 grid: an axis square,
# a concave L, a triangle, a diamond, and a sliver OVERLAPPING the
# square (points inside both emit two rows). Vertex order traces the
# boundary; the closing edge is implied.
_PIP_POLYGONS: list[tuple[int, list[tuple[int, int]]]] = [
    (0, [(100, 100), (300, 100), (300, 300), (100, 300)]),
    (1, [(500, 100), (800, 100), (800, 400), (700, 400), (700, 200), (500, 200)]),
    (2, [(100, 600), (400, 900), (100, 900)]),
    (3, [(600, 500), (800, 700), (600, 900), (400, 700)]),
    (4, [(250, 50), (320, 350), (280, 350)]),
]


def _pip_oracle() -> str:
    vals = ", ".join(
        f"({pid}, {pos}, {x}, {y})"
        for pid, vs in _PIP_POLYGONS
        for pos, (x, y) in enumerate(vs)
    )
    return f"""
WITH pts AS (
  SELECT event_id AS pid,
         (event_id * 2654435761) % 1000 AS px,
         ((user_id + 1) * 2246822519 + event_id * 97) % 1000 AS py
  FROM events WHERE event_id % 3 = 0
),
vert(poly_id, pos, x, y) AS (VALUES {vals}),
edges AS (
  SELECT poly_id, x AS x1, y AS y1,
         coalesce(lead(x) OVER wl, first_value(x) OVER wf) AS x2,
         coalesce(lead(y) OVER wl, first_value(y) OVER wf) AS y2
  FROM vert
  WINDOW wl AS (PARTITION BY poly_id ORDER BY pos),
         wf AS (PARTITION BY poly_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
bbox AS (
  SELECT poly_id, min(x) AS mnx, max(x) AS mxx,
         min(y) AS mny, max(y) AS mxy
  FROM vert GROUP BY poly_id
),
cand AS (
  SELECT pid, px, py, b.poly_id
  FROM pts, bbox b
  WHERE px BETWEEN mnx AND mxx AND py BETWEEN mny AND mxy
),
cr AS (
  SELECT pid, px, py, c.poly_id,
         sum(CASE WHEN ((y1 > py) <> (y2 > py))
                   AND ((y2 > y1 AND (x1-px)*(y2-y1) + (x2-x1)*(py-y1) > 0)
                     OR (y2 < y1 AND (x1-px)*(y2-y1) + (x2-x1)*(py-y1) < 0))
              THEN 1 ELSE 0 END) AS ncross
  FROM cand c JOIN edges e ON e.poly_id = c.poly_id
  GROUP BY pid, px, py, c.poly_id
)
SELECT pid, px, py, poly_id FROM cr WHERE ncross % 2 = 1
"""


@query("join-point-in-polygon", _pip_oracle())
def join_point_in_polygon(spark, sf):
    """Point-in-polygon containment join
    (operators/spatial.point_in_polygon_join): event points on the
    1000x1000 integer grid (coordinates synthesized deterministically
    from keys) matched to five literal geofence polygons — square,
    CONCAVE L, triangle, diamond, and a sliver overlapping the square
    (shared points emit one row per polygon). Exact int64 ray casting
    (no division, no float): odd +x crossings = inside; the concave L
    exercises the multi-crossing path the bbox test alone cannot
    decide. Spark side buckets polygons into broadcast grid cells
    (points map to ONE cell — no dedup); the oracle is the
    INDEPENDENT bbox-prefilter brute force, so parity proves the grid
    cover is lossless. ONE point scan, zero point-side shuffles before
    the verdict agg."""
    from genpipe_spark.operators.spatial import point_in_polygon_join

    pts = t(spark, sf, "events").where(F.expr("event_id % 3 = 0")).select(
        F.col("event_id").alias("pid"),
        F.expr("(event_id * 2654435761) % 1000").alias("px"),
        F.expr("((user_id + 1) * 2246822519 + event_id * 97) % 1000").alias("py"),
    )
    rows = [
        (pid, [{"x": x, "y": y} for x, y in vs]) for pid, vs in _PIP_POLYGONS
    ]
    polys = spark.createDataFrame(
        rows, "poly_id bigint, vertices array<struct<x:long,y:long>>"
    )
    return point_in_polygon_join(
        pts, polys, px="px", py="py", poly_id="poly_id",
        vertices="vertices", cell=256,
    )


_ROLLING_DISTINCT_ORACLE = """
SELECT user_id, event_id,
       CAST(count(DISTINCT event_type) OVER w AS BIGINT) AS n_types_10,
       CAST(count(DISTINCT event_type) OVER (
              PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS n_types_cum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
"""


@query("window-rolling-distinct", _ROLLING_DISTINCT_ORACLE)
def window_rolling_distinct(spark, sf):
    """DISTINCT-count window aggregates — behavioral diversity ('how
    many distinct event types in the user's last 10 actions / so
    far'), a shape ANSI engines take for granted that Spark REJECTS
    outright (DISTINCT is unsupported in window aggregates). The
    engine's rewrite: collect_set over the same frame, then size() —
    semantically exactly count(DISTINCT) because set membership
    ignores multiplicity and frame NULL handling matches (event_type
    is non-null here). The trailing-10 frame bounds per-row state;
    the cumulative variant's state is the type alphabet (tiny by
    domain). The oracle runs the REAL count(DISTINCT ...) OVER, so
    parity proves the rewrite, not a reimplementation. One
    user-keyed sort shared by both frames."""
    from pyspark.sql import Window

    w10 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf, "events").select(
        "user_id", "event_id",
        F.size(F.collect_set("event_type").over(w10)).cast("long")
        .alias("n_types_10"),
        F.size(F.collect_set("event_type").over(wcum)).cast("long")
        .alias("n_types_cum"),
    )


# ---------------------------------------------------------------- partsupp
# The fixture has no partsupp table, which kept TPC-H q2/q9/q11/q16/q20
# out of reach (ROADMAP r7s3). The OBSERVED supply pairs close the gap:
# partsupp := DISTINCT (l_partkey, l_suppkey) FROM lineitem, with
# availqty/supplycost synthesized deterministically from the pair keys
# (pure integer arithmetic both engines replay — the synthesized-graph /
# geo-coordinate fixture pattern). Every lineitem row joins its
# partsupp row by construction, exactly as in real TPC-H.

_PARTSUPP_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         (l_partkey * 31 + l_suppkey * 17) % 9999 + 1 AS ps_availqty,
         (l_partkey * 13 + l_suppkey * 7) % 99900 + 100 AS ps_supplycost_c
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
"""


def _partsupp(spark, sf):
    li = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    return li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        ((F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % 9999 + 1)
        .alias("ps_availqty"),
        ((F.col("l_partkey") * 13 + F.col("l_suppkey") * 7) % 99900 + 100)
        .alias("ps_supplycost_c"),
    )


@query(
    "tpch-q9",
    f"""
    WITH ps AS ({_PARTSUPP_SQL})
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    - ps_supplycost_c
                      * CAST(round(l_quantity) AS BIGINT) * 100)
                AS BIGINT) AS profit_c2
    FROM lineitem
    JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def tpch_q9(spark, sf):
    """TPC-H Q9 (product-type profit): the 6-table star over the
    synthesized partsupp — profit = revenue minus supply cost, by
    supplier nation and order year, for '%widget%' parts (the
    '%green%' predicate adapted to the fixture vocabulary). Exact
    integer c2 money: ext_cents*(100-disc_pct) - cost_cents*qty*100 —
    no float subtraction. Scale shape: the ps pair table is
    fact-derived (distinct pair reduction, map-side combinable); part/
    supplier/nation broadcast; orders joins on the fact key; Catalyst/
    AQE order the stars (the tpch-q5 posture)."""
    # r12 (guide §2.4 + §8 — use what you know that the optimizer does
    # not): ps_supplycost_c is a PURE FUNCTION of the join keys
    # (l_partkey, l_suppkey), and ps is exactly the distinct pairs of
    # lineitem itself, so `lineitem JOIN ps` matches every fact row to
    # precisely one ps row and only attaches key-derived values —
    # computing the column directly on each row is row-for-row
    # identical and removes the distinct-pair aggregation, the pair
    # join, and the second lineitem scan from the plan.
    li = t(spark, sf, "lineitem").withColumn(
        "ps_supplycost_c",
        (F.col("l_partkey") * 13 + F.col("l_suppkey") * 7) % 99900 + 100,
    )
    p = t(spark, sf, "part").where(F.col("p_name").like("%widget%")).select(
        "p_partkey"
    )
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    profit = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        - F.col("ps_supplycost_c") * F.round(F.col("l_quantity")).cast("long")
        * F.lit(100)
    )
    j = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(F.sum(profit).alias("profit_c2"))


@query(
    "tpch-q11",
    f"""
    WITH ps AS ({_PARTSUPP_SQL}),
    scoped AS (
      SELECT ps_partkey,
             CAST(ps_supplycost_c AS BIGINT) * ps_availqty AS v_c
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
      WHERE s_nationkey < 3
    ),
    byp AS (
      SELECT ps_partkey, CAST(sum(v_c) AS BIGINT) AS value_c
      FROM scoped GROUP BY ps_partkey
    ),
    tot AS (SELECT CAST(sum(v_c) AS BIGINT) AS total_c FROM scoped)
    SELECT ps_partkey, value_c, total_c
    FROM byp CROSS JOIN tot
    WHERE value_c * 500 > total_c
    """,
)
def tpch_q11(spark, sf):
    """TPC-H Q11 (important stock): inventory value by part for a
    nation bloc (nationkey < 3 — the GERMANY predicate adapted),
    keeping parts whose value exceeds 0.2% of the bloc total. The
    HAVING-against-a-scalar-subquery decorrelates to an explicit
    broadcast of the provably-1-row total (the tpch-q22 posture), and
    the fraction compare is cleared of division: value*500 > total —
    exact int64 (value_c < 1e12 at sf10; *500 < 2^63). ONE scan of ps
    feeds both the per-part agg and the total (map-side combinable
    both)."""
    ps = _partsupp(spark, sf)
    s = t(spark, sf, "supplier").where(F.col("s_nationkey") < 3).select(
        "s_suppkey"
    )
    scoped = ps.join(
        s, F.col("s_suppkey") == F.col("ps_suppkey")
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost_c").cast("long") * F.col("ps_availqty"))
        .alias("v_c"),
    )
    byp = scoped.groupBy("ps_partkey").agg(F.sum("v_c").alias("value_c"))
    tot = scoped.agg(F.sum("v_c").alias("total_c"))
    return (
        byp.crossJoin(F.broadcast(tot))
        .where(F.col("value_c") * 500 > F.col("total_c"))
        .select("ps_partkey", "value_c", "total_c")
    )


@query(
    "tpch-q16",
    f"""
    WITH ps AS ({_PARTSUPP_SQL})
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, sf):
    """TPC-H Q16 (parts/supplier relationship): distinct supplier
    counts by (brand, type, size) for a filtered part subset,
    EXCLUDING blacklisted suppliers via NOT IN (negative-balance
    suppliers stand in for the 'Customer Complaints' predicate). The
    NOT IN decorrelates to a broadcast LEFT ANTI join (the fixture
    blacklist is dim-sized and non-NULL by construction — the NULL
    trap of NOT IN documented here: with a nullable subquery column
    the anti-join rewrite needs the null-safe guard join-null-safe
    demonstrates). count(DISTINCT) over the grouped keys is Spark's
    two-phase partial-distinct agg — no window, scales with group
    count."""
    ps = _partsupp(spark, sf)
    p = (
        t(spark, sf, "part")
        .where(
            (F.col("p_brand") != "Brand#13")
            & ~F.col("p_type").like("PROMO%")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = t(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    j = ps.join(
        p, F.col("p_partkey") == F.col("ps_partkey")
    ).join(bad, "ps_suppkey", "left_anti")
    return j.groupBy(
        "p_brand", "p_type", F.col("p_size").cast("long").alias("p_size")
    ).agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))


@query(
    "tpch-q20",
    f"""
    WITH ps AS ({_PARTSUPP_SQL}),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM ps
    JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'b%'
    JOIN shipped ON shipped.l_partkey = ps_partkey
               AND shipped.l_suppkey = ps_suppkey
    JOIN supplier s ON s.s_suppkey = ps_suppkey
    WHERE s.s_nationkey < 3
      AND 2 * ps_availqty > qty
    """,
)
def tpch_q20(spark, sf):
    """TPC-H Q20 (potential part promotion): suppliers in the nation
    bloc whose available quantity exceeds half of what they shipped of
    'b%'-named parts in 1996. The correlated half-sum subquery
    decorrelates to ONE grouped shipped-quantity table equi-joined on
    the (part, supplier) pair, and the 0.5 factor is cleared of
    division: 2*availqty > qty, exact int64. The nested
    EXISTS-chain becomes joins + DISTINCT — the heavy side (lineitem)
    is reduced map-side by the date filter + group BEFORE any join.
    Shape preserved, predicates adapted per docstring."""
    ps = _partsupp(spark, sf)
    p = t(spark, sf, "part").where(F.col("p_name").like("b%")).select(
        "p_partkey"
    )
    shipped = (
        t(spark, sf, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"))
    )
    s = t(spark, sf, "supplier").where(F.col("s_nationkey") < 3).select(
        "s_suppkey", "s_name"
    )
    j = (
        ps.join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(s, F.col("s_suppkey") == F.col("ps_suppkey"))
        .where(F.lit(2) * F.col("ps_availqty") > F.col("qty"))
    )
    return j.select("s_suppkey", "s_name").distinct()


@query(
    "tpch-q2",
    f"""
    WITH ps AS ({_PARTSUPP_SQL}),
    scoped AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost_c,
             s_name, s_acctbal, n_name
      FROM ps
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE s_nationkey < 3
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY ps_partkey
               ORDER BY ps_supplycost_c, ps_suppkey
             ) AS rk
      FROM scoped
    )
    SELECT ps_partkey, ps_suppkey, ps_supplycost_c, s_name, n_name,
           CAST(round(s_acctbal * 100) AS BIGINT) AS bal_c
    FROM ranked
    JOIN part ON p_partkey = ps_partkey
    WHERE rk = 1 AND p_size = 9 AND p_type LIKE 'SMALL%'
    """,
)
def tpch_q2(spark, sf):
    """TPC-H Q2 (minimum-cost supplier): for every size-9 SMALL part,
    the cheapest bloc supplier. The correlated MIN subquery
    decorrelates to a per-part rank window over the scoped ps rows
    (min cost, supplier key as the deterministic tie-break — real Q2
    returns ties, which a hash-compare oracle cannot tolerate;
    documented adaptation) and the region predicate to the nation
    bloc. With q9/q11/q16/q20 this completes ALL 22 TPC-H query
    shapes over the fixture schema. Scale: the window partitions by
    part key (the natural parallelism); part filter broadcasts;
    nothing global."""
    from pyspark.sql import Window

    ps = _partsupp(spark, sf)
    s = t(spark, sf, "supplier").where(F.col("s_nationkey") < 3).select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    scoped = ps.join(
        s, F.col("s_suppkey") == F.col("ps_suppkey")
    ).join(n, F.col("n_nationkey") == F.col("s_nationkey"))
    rk = F.row_number().over(
        Window.partitionBy("ps_partkey").orderBy("ps_supplycost_c", "ps_suppkey")
    )
    p = t(spark, sf, "part").where(
        (F.col("p_size") == 9) & F.col("p_type").like("SMALL%")
    ).select("p_partkey")
    return (
        scoped.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "ps_partkey", "ps_suppkey", "ps_supplycost_c", "s_name", "n_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("bal_c"),
        )
    )


_BITEMPORAL_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
         o_orderkey % 10 = 0 AS corrected
  FROM orders
),
hist AS (
  -- A: the original assertion; superseded (tx_to closes) iff corrected
  SELECT k, price_c, CAST(0 AS BIGINT) AS valid_from,
         CAST(NULL AS BIGINT) AS valid_to,
         d AS tx_from,
         CASE WHEN corrected THEN d + 10 END AS tx_to, 'A' AS src
  FROM base
  UNION ALL
  -- B: after the correction, the old price holds only before d+5
  SELECT k, price_c, 0, d + 5, d + 10, NULL, 'B'
  FROM base WHERE corrected
  UNION ALL
  -- C: the retroactive new price from valid day d+5 on
  SELECT k, price_c + 500, d + 5, NULL, d + 10, NULL, 'C'
  FROM base WHERE corrected
),
probes AS (
  SELECT k, 'pre-tx' AS part, d + 7 AS v, d + 5 AS t FROM base
  UNION ALL
  SELECT k, 'post-tx', d + 7, d + 20 FROM base
  UNION ALL
  SELECT k, 'post-tx-old-valid', d + 2, d + 20 FROM base
)
SELECT p.k AS o_orderkey, p.part, h.price_c, h.src
FROM probes p JOIN hist h
  ON h.k = p.k
 AND h.valid_from <= p.v AND (h.valid_to IS NULL OR p.v < h.valid_to)
 AND h.tx_from <= p.t AND (h.tx_to IS NULL OR p.t < h.tx_to)
"""


@query("scd2-bitemporal", _BITEMPORAL_ORACLE)
def scd2_bitemporal(spark, sf):
    """Bitemporal (valid-time x transaction-time) as-of lookup — the
    fourth temporal shape after SCD2 history / point-in-time /
    change-feed: 'what did the system BELIEVE at tx time T about what
    was true at valid time V'. The history is synthesized
    deterministically from orders (every 10th order gets a retroactive
    price correction recorded 10 days later, effective from valid day
    d+5), giving the three canonical row kinds: the superseded
    original assertion (tx interval CLOSED by the correction), the
    clipped old-price belief, and the retroactive new price. Three
    probes per key hit each belief state — pre-correction reads return
    the original price even for corrected keys (tx dimension), and
    post-correction reads split on the valid dimension. Exactly-one-
    match per (key, probe) by construction; half-open [from, to)
    containment on BOTH axes; all int64 day arithmetic. Scale: the
    lookup is an equi-join on the entity key with residual interval
    predicates — versions per key are bounded (the SCD contract), so
    the residual never explodes; at 100 TB this is the same keyed
    shuffle as any dimension join."""
    base = t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long").alias("d"),
        (F.col("o_orderkey") % 10 == 0).alias("corrected"),
    )
    null_l = F.lit(None).cast("long")
    a = base.select(
        "k", "price_c",
        F.lit(0).cast("long").alias("valid_from"), null_l.alias("valid_to"),
        F.col("d").alias("tx_from"),
        F.when(F.col("corrected"), F.col("d") + 10).alias("tx_to"),
        F.lit("A").alias("src"),
    )
    corr = base.where("corrected")
    b = corr.select(
        "k", "price_c",
        F.lit(0).cast("long").alias("valid_from"),
        (F.col("d") + 5).alias("valid_to"),
        (F.col("d") + 10).alias("tx_from"), null_l.alias("tx_to"),
        F.lit("B").alias("src"),
    )
    c = corr.select(
        "k", (F.col("price_c") + 500).alias("price_c"),
        (F.col("d") + 5).alias("valid_from"), null_l.alias("valid_to"),
        (F.col("d") + 10).alias("tx_from"), null_l.alias("tx_to"),
        F.lit("C").alias("src"),
    )
    hist = a.unionByName(b).unionByName(c)
    probes = (
        base.select("k", F.lit("pre-tx").alias("part"),
                    (F.col("d") + 7).alias("v"), (F.col("d") + 5).alias("t"))
        .unionByName(
            base.select("k", F.lit("post-tx").alias("part"),
                        (F.col("d") + 7).alias("v"), (F.col("d") + 20).alias("t"))
        )
        .unionByName(
            base.select("k", F.lit("post-tx-old-valid").alias("part"),
                        (F.col("d") + 2).alias("v"), (F.col("d") + 20).alias("t"))
        )
    )
    j = probes.join(hist, "k").where(
        (F.col("valid_from") <= F.col("v"))
        & (F.col("valid_to").isNull() | (F.col("v") < F.col("valid_to")))
        & (F.col("tx_from") <= F.col("t"))
        & (F.col("tx_to").isNull() | (F.col("t") < F.col("tx_to")))
    )
    return j.select(F.col("k").alias("o_orderkey"), "part", "price_c", "src")


_MV_REFRESH_ORACLE = """
SELECT o_custkey % 100 AS g,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_orderkey % 50 = 0
   OR (o_orderkey % 50 <> 0 AND o_orderkey % 7 <> 0)
GROUP BY 1
"""


@query("cdc-mv-refresh", _MV_REFRESH_ORACLE)
def cdc_mv_refresh(spark, sf):
    """Incremental materialized-view refresh
    (operators/cdc.incremental_agg_refresh): a per-customer-bucket
    revenue view built from a base snapshot (orders minus every 50th
    key) is brought up to date by a CDC delta — the 50th keys arrive
    as inserts, every 7th base key leaves as a delete (full row
    images, the scd2_change_feed shape) — via ONE signed delta
    aggregation merged into the view. The oracle RECOMPUTES the view
    from the post-delta base, certifying the incremental path equals
    recompute (the self-maintainable-view contract for abelian-group
    aggregates). Cost: delta-sized + view-sized; the base is never
    rescanned."""
    from genpipe_spark.operators.cdc import incremental_agg_refresh

    o = t(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 100).alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = o.where(F.expr("o_orderkey % 50 != 0"))
    mv = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents")
    )
    delta = (
        o.where(F.expr("o_orderkey % 50 = 0"))
        .select("g", "cents", F.lit("I").alias("op"))
        .unionByName(
            base.where(F.expr("o_orderkey % 7 = 0"))
            .select("g", "cents", F.lit("D").alias("op"))
        )
    )
    return incremental_agg_refresh(mv, delta, ["g"], ["cents"])
