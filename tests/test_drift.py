"""PSI drift detection invariants (operators/drift.py); the
cross-engine replay is the oracle-parity query profile-drift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from genpipe_spark.operators.drift import histogram_fixed, psi_drift


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x double")


def test_identical_distributions_have_zero_psi(spark):
    df = _vals(spark, [1, 2, 3, 4, 5, 6, 7, 8, 9] * 10)
    out = psi_drift(df, df, "x", 0.0, 10.0, nbins=5).collect()
    assert all(r["term_micro"] == 0 for r in out)
    assert out[0]["psi_micro"] == 0


def test_shifted_distribution_flags_drift(spark):
    ref = _vals(spark, [1] * 80 + [9] * 20)
    cur = _vals(spark, [1] * 20 + [9] * 80)
    out = psi_drift(ref, cur, "x", 0.0, 10.0, nbins=5).collect()
    # textbook threshold: >0.25 means action; this swap is massive drift
    assert out[0]["psi_micro"] / 1e6 > 0.25


def test_out_of_range_clamps_to_edge_bins(spark):
    df = _vals(spark, [-100, -1, 5, 50, 999])
    h = {r["bin"]: r["n"] for r in histogram_fixed(df, "x", 0.0, 10.0, 5).collect()}
    assert h == {0: 2, 2: 1, 4: 2}  # nothing silently dropped


def test_vanished_bin_is_smoothed_not_divzero(spark):
    ref = _vals(spark, [1] * 50 + [9] * 50)
    cur = _vals(spark, [1] * 100)  # bin for 9 vanishes entirely
    out = psi_drift(ref, cur, "x", 0.0, 10.0, nbins=5).collect()
    assert all(r["term_micro"] is not None for r in out)
    assert out[0]["psi_micro"] / 1e6 > 0.25


def test_bad_bin_spec_rejected(spark):
    df = _vals(spark, [1.0])
    with pytest.raises(ValueError):
        histogram_fixed(df, "x", 10.0, 0.0, 5)
    with pytest.raises(ValueError):
        histogram_fixed(df, "x", 0.0, 10.0, 1)


def test_histogram_state_is_bounded(spark):
    # 100k rows -> exactly nbins output rows; the partial agg holds at
    # most nbins cells per task (bin id is a pure projection)
    df = spark.range(100_000).select((F.col("id") % 1000).cast("double").alias("x"))
    assert histogram_fixed(df, "x", 0.0, 1000.0, 16).count() == 16


def test_nan_values_are_excluded(spark):
    df = spark.createDataFrame(
        [(float("nan"),), (5.0,), (None,)], "x double"
    )
    h = {r["bin"]: r["n"] for r in histogram_fixed(df, "x", 0.0, 10.0, 5).collect()}
    assert h == {2: 1}  # NaN must not clamp-count into bin 0


def test_ks_two_sample_known(spark):
    """A=[1,2,3] vs B=[2,3,4]: D = 1/3 (largest CDF gap at x=1), as
    the exact fraction 3/9; NULL values dropped."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.drift import ks_two_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (2, "b"), (3, "b"), (4, "b"),
         (None, "a")],
        "x: long, s: string",
    )
    row = ks_two_sample(df, "x", F.col("s") == "a").collect()[0]
    assert (row["n1"], row["n2"]) == (3, 3)
    assert (row["ks_num"], row["ks_denom"], row["ks_micro"]) == (3, 9, 333_333)


def test_ks_two_sample_identical_is_zero(spark):
    from pyspark.sql import functions as F

    from genpipe_spark.operators.drift import ks_two_sample

    df = spark.createDataFrame(
        [(v, s) for v in (5, 7, 7, 9) for s in ("a", "b")], "x: long, s: string"
    )
    row = ks_two_sample(df, "x", F.col("s") == "a").collect()[0]
    assert row["ks_num"] == 0 and row["ks_micro"] == 0
