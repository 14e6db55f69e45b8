"""Data-quality gating queries: declarative constraint validation
(operators/validate.py) with exact-integer DuckDB twins.

Determinism: every metric is an exact bigint violation count; ratio
thresholds compare in integer basis points (FIXTURES.md rules — no
float accumulation anywhere)."""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.operators import validate as V
from genpipe_spark.queries.common import t
from genpipe_spark.registry import query

# mirrors the check list in validate_constraints below, one SELECT per
# constraint; "constraint"/"column" quoted (reserved words in DuckDB)
_VALIDATE_ORACLE = """
SELECT 'min_rows' AS "constraint", '*' AS "column",
       greatest(1 - count(*), 0)::BIGINT AS violations,
       greatest(1 - count(*), 0) = 0 AS passed
FROM orders
UNION ALL
SELECT 'not_null', 'o_orderkey',
       (count(*) FILTER (WHERE o_orderkey IS NULL))::BIGINT AS v,
       count(*) FILTER (WHERE o_orderkey IS NULL) = 0
FROM orders
UNION ALL
SELECT 'unique', 'o_orderkey',
       (count(*) - count(DISTINCT o_orderkey))::BIGINT,
       count(*) - count(DISTINCT o_orderkey) = 0
FROM orders
UNION ALL
SELECT 'in_range', 'o_totalprice',
       (count(*) FILTER (WHERE o_totalprice IS NOT NULL
                           AND (o_totalprice < 0.0 OR o_totalprice > 10000000.0)))::BIGINT,
       count(*) FILTER (WHERE o_totalprice IS NOT NULL
                          AND (o_totalprice < 0.0 OR o_totalprice > 10000000.0)) = 0
FROM orders
UNION ALL
SELECT 'accepted_in', 'o_orderstatus',
       (count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                           AND o_orderstatus NOT IN ('O', 'F', 'P')))::BIGINT,
       count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O', 'F', 'P')) = 0
FROM orders
UNION ALL
SELECT 'matches', 'o_orderpriority',
       (count(o_orderpriority)
          - count(*) FILTER (WHERE regexp_matches(o_orderpriority,
                                                  '^(?:[1-5]-[A-Z ]+)$')))::BIGINT AS v,
       (count(*) FILTER (WHERE regexp_matches(o_orderpriority,
                                              '^(?:[1-5]-[A-Z ]+)$'))) * 10000
         >= 9000 * count(o_orderpriority)
FROM orders
UNION ALL
SELECT 'referential', 'o_custkey', count(*)::BIGINT, count(*) = 0
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


@query("validate-constraints", _VALIDATE_ORACLE)
def validate_constraints(spark, sf):
    """Deequ-style snapshot gate over ``orders``: six single-table
    constraints evaluated in ONE wide-agg scan
    (operators/validate.validate_table) plus a cross-table FK
    containment check (validate.referential — left-anti join, parent
    projected to its key). Long-format exact-integer output; the DuckDB
    twin recomputes every violation count independently."""
    orders = t(spark, sf, "orders")
    customer = t(spark, sf, "customer")
    single = V.validate_table(
        orders,
        [
            V.min_rows(1),
            V.not_null("o_orderkey"),
            V.unique("o_orderkey"),
            V.in_range("o_totalprice", 0.0, 10_000_000.0),
            V.accepted_in("o_orderstatus", ["O", "F", "P"]),
            V.matches("o_orderpriority", "[1-5]-[A-Z ]+", min_ratio_bp=9000),
        ],
    )
    fk = V.referential(orders, "o_custkey", customer, "c_custkey")
    return single.unionAll(fk)
