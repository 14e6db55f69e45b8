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


def load_all_query_modules() -> None:
    """Import every query module so registration side effects run."""
    from genpipe_spark.queries import (  # noqa: F401
        flagship,
        interval,
        llmdata,
        nested,
        parse,
        relational,
        streaming,
    )
