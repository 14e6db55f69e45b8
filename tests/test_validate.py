"""Behavioral tests for operators/validate.py — violating data, not the
vacuous all-pass of the fixture tables (that case is the oracle-parity
query validate-constraints)."""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.operators import validate as V


def _rows(df):
    out = df.collect()
    return {(r["constraint"], r["column"]): (r["violations"], r["passed"]) for r in out}


def test_single_table_checks_count_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 10.0, "x-1"),
            (2, "A", -5.0, "y-2"),   # in_range violation, matches violation
            (2, "B", 20.0, "x-3"),   # duplicate id
            (None, "C", 999.0, "x-4"),  # null id, accepted_in violation
        ],
        "id bigint, status string, price double, code string",
    )
    got = _rows(
        V.validate_table(
            df,
            [
                V.min_rows(10),
                V.not_null("id"),
                V.unique("id"),
                V.in_range("price", 0.0, 100.0),
                V.accepted_in("status", ["A", "B"]),
                V.matches("code", "x-[0-9]", min_ratio_bp=5000),
            ],
        )
    )
    assert got[("min_rows", "*")] == (6, False)
    assert got[("not_null", "id")] == (1, False)
    # 4 rows, distinct non-null ids {1,2} -> 4-2=2 "violations" (NULL rows
    # count against uniqueness by design: a keyed column with NULLs is not
    # a key)
    assert got[("unique", "id")] == (2, False)
    assert got[("in_range", "price")] == (2, False)
    assert got[("accepted_in", "status")] == (1, False)
    # 3 of 4 non-null codes match 'x-[0-9]' -> 1 violation, 7500bp >= 5000bp
    assert got[("matches", "code")] == (1, True)


def test_matches_ratio_boundary_is_exact():
    # exact basis-point boundary: 3/4 matching vs min_ratio 7500bp passes,
    # 7501bp fails — integer arithmetic, no float threshold wobble
    from genpipe_spark.session import get_spark

    spark = get_spark("genpipe-tests", cpus=8, shuffle_partitions=8)
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",)], "v string"
    )
    ok = _rows(V.validate_table(df, [V.matches("v", "a", min_ratio_bp=7500)]))
    bad = _rows(V.validate_table(df, [V.matches("v", "a", min_ratio_bp=7501)]))
    assert ok[("matches", "v")] == (1, True)
    assert bad[("matches", "v")] == (1, False)


def test_min_rows_on_empty_frame(spark):
    df = spark.createDataFrame([], "id bigint")
    got = _rows(V.validate_table(df, [V.min_rows(3)]))
    assert got[("min_rows", "*")] == (3, False)


def test_referential_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id bigint, fk bigint"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk bigint")
    row = V.referential(child, "fk", parent, "pk").collect()[0]
    # fk=99 is an orphan; NULL fk is exempt (pair with not_null to forbid)
    assert (row["violations"], row["passed"]) == (1, False)


def test_approx_unique_mode_has_no_expand(spark):
    df = spark.range(1000).withColumn("k", F.col("id") % 7)
    plan = V.validate_table(
        df, [V.unique("id"), V.unique("k")], approx_unique=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = V.validate_table(
        df, [V.unique("id"), V.unique("k")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # documented cost of 2+ exact uniques


def test_validation_is_one_scan(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("g"), F.lit("ok").alias("s")
    )
    plan = V.validate_table(
        df,
        [V.not_null("id"), V.in_range("g", 0, 4), V.accepted_in("s", ["ok"])],
    )._jdf.queryExecution().executedPlan().toString()
    # one aggregate over one source: no Join/Union/CartesianProduct
    for bad in ("Join", "Union", "CartesianProduct"):
        assert bad not in plan, plan


def test_approx_unique_tolerates_hll_error(spark):
    # HLL rsd 2% shows phantom "duplicates" on perfectly-unique data;
    # approx mode must clamp negatives and pass within 2*rsd slack
    df = spark.range(2_000_000).toDF("id")
    got = _rows(V.validate_table(df, [V.unique("id")], approx_unique=True))
    viol, passed = got[("unique", "id")]
    assert viol >= 0 and passed
    # genuinely non-unique data still fails in approx mode
    from pyspark.sql import functions as F

    dup = spark.range(100_000).select((F.col("id") % 1000).alias("id"))
    got2 = _rows(V.validate_table(dup, [V.unique("id")], approx_unique=True))
    assert got2[("unique", "id")][1] is False


def test_matches_rejects_out_of_range_bp():
    import pytest

    with pytest.raises(ValueError, match="min_ratio_bp"):
        V.matches("c", "x", min_ratio_bp=95_000)
    with pytest.raises(ValueError, match="min_ratio_bp"):
        V.matches("c", "x", min_ratio_bp=0)
