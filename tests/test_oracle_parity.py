"""The correctness gate, locally: every registered query with an oracle
must match DuckDB on row count + schema + order-insensitive values.
Mirrors the driver's CORRECTNESS_r{N}.json check (sf configurable via
SPARK_GRAFT_TEST_SF; defaults to sf0.001 for speed — the driver runs
sf0.01)."""

from __future__ import annotations

import pytest

from genpipe_spark import registry
from tests.conftest import SF_SMALL
from tests.oracle_utils import compare, run_oracle

registry.load_all_query_modules()
NAMES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    sdf = registry.QUERIES[name](spark, SF_SMALL)
    oracle = run_oracle(registry.ORACLES[name], SF_SMALL)
    problems = compare(sdf, oracle)
    assert not problems, f"{name}: {problems}"


def test_all_queries_run(spark):
    # queries without oracles still must execute and return a DataFrame
    for name, fn in registry.QUERIES.items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name


def test_curated_window_invariants():
    """The driver checks positions 1-50 only (CORRECTNESS_r01): the
    curated set must fill exactly that window and every entry in it must
    be oracle-backed."""
    names = list(registry.QUERIES)
    assert names[:50] == registry.CURATED_ORDER
    missing_oracles = [n for n in names[:50] if n not in registry.ORACLES]
    assert not missing_oracles, missing_oracles


def test_driver_canonicalizer_safe(spark):
    """Every registered query's output must survive the driver's pandas
    sort_values canonicalization — top-level array/map/struct columns are
    unhashable there (the r01 failure mode of 6 queries)."""
    from tests.oracle_utils import driver_canon_ok

    for name, fn in registry.QUERIES.items():
        pdf = fn(spark, SF_SMALL).limit(5).toPandas()
        err = driver_canon_ok(pdf)
        assert err is None, f"{name}: {err}"
