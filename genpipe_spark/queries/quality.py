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


_PSI_HIST = """
  SELECT least(19, greatest(0, CAST(floor((o_totalprice - 0.0) / 30000.0) AS INTEGER))) AS bin,
         count(*) AS {n}
  FROM orders WHERE o_orderstatus = '{status}' AND o_totalprice IS NOT NULL
  GROUP BY 1
"""

_DRIFT_ORACLE = f"""
WITH bins AS (SELECT CAST(unnest(range(0, 20)) AS INTEGER) AS bin),
h_ref AS ({_PSI_HIST.format(n="n_ref", status="F")}),
h_cur AS ({_PSI_HIST.format(n="n_cur", status="O")}),
j AS (
  SELECT b.bin, coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
  FROM bins b LEFT JOIN h_ref USING (bin) LEFT JOIN h_cur USING (bin)
),
p AS (
  SELECT bin, n_ref, n_cur,
         greatest(n_ref * 1.0 / sum(n_ref) OVER (), 1e-6) AS pr,
         greatest(n_cur * 1.0 / sum(n_cur) OVER (), 1e-6) AS pc
  FROM j
),
t AS (
  SELECT bin, n_ref, n_cur,
         CAST(floor(round((pc - pr) * ln(pc / pr) * 1e9) / 1000) AS BIGINT) AS term_micro
  FROM p
)
SELECT bin, n_ref, n_cur, term_micro,
       CAST(sum(term_micro) OVER () AS BIGINT) AS psi_micro
FROM t
"""


@query("profile-drift", _DRIFT_ORACLE)
def profile_drift(spark, sf):
    """Distribution drift between two snapshots (operators/drift.py
    psi_drift): the o_totalprice distribution of finished vs open
    orders, 20 fixed bins over [0, 600000) — per-bin PSI contributions
    in integer micro-units plus the repeated total. Each snapshot
    collapses map-side to ≤ 20 rows; the DuckDB twin replays the same
    binning, eps smoothing and nano→micro ln quantization."""
    from genpipe_spark.operators.drift import psi_drift

    orders = t(spark, sf, "orders")
    ref = orders.where(F.col("o_orderstatus") == "F")
    cur = orders.where(F.col("o_orderstatus") == "O")
    return psi_drift(ref, cur, "o_totalprice", 0.0, 600_000.0, nbins=20)


@query(
    "profile-kanonymity",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS n
      FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT 5 AS k, count(*) AS n_groups,
           count(*) FILTER (WHERE n < 5) AS n_violating_groups,
           CAST(coalesce(sum(n) FILTER (WHERE n < 5), 0) AS BIGINT) AS rows_at_risk,
           min(n) AS min_group_size
    FROM g
    """,
)
def profile_kanonymity(spark, sf):
    """k-anonymity audit (operators/profile.k_anonymity_profile) over
    the (nationkey, mktsegment) quasi-identifier pair at k=5: counts
    equivalence classes below the threshold and the rows exposed in
    them. One keyed count + a single-row reduction."""
    from genpipe_spark.operators.profile import k_anonymity_profile

    return k_anonymity_profile(
        t(spark, sf, "customer"), ["c_nationkey", "c_mktsegment"], k=5
    )


# log10(1 + 1/d) in exact micro units; the nine constants sum to
# exactly 1_000_000 so expected counts partition n
_BENFORD_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}

_BENFORD_ORACLE = f"""
WITH v AS (
  SELECT CAST(left(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                        AS VARCHAR), 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
),
n AS (SELECT count(*) AS n_rows FROM v),
obs AS (SELECT digit, count(*) AS obs FROM v GROUP BY digit),
p(digit, p_micro) AS (VALUES
  {", ".join(f"({d}, {m})" for d, m in _BENFORD_MICRO.items())})
SELECT p.digit, COALESCE(obs, 0) AS obs, n_rows,
       CAST(n_rows * p_micro AS BIGINT) AS expected_micro,
       CAST(floor(1000000.0 *
             (CAST(COALESCE(obs, 0) AS DOUBLE)
              - CAST(n_rows AS DOUBLE)
                * (CAST(p_micro AS DOUBLE) / 1000000.0))
             * (CAST(COALESCE(obs, 0) AS DOUBLE)
                - CAST(n_rows AS DOUBLE)
                  * (CAST(p_micro AS DOUBLE) / 1000000.0))
             / (CAST(n_rows AS DOUBLE)
                * (CAST(p_micro AS DOUBLE) / 1000000.0)))
         AS BIGINT) AS chi2_term_micro
FROM p LEFT JOIN obs ON obs.digit = p.digit CROSS JOIN n
"""


@query("quality-benford", _BENFORD_ORACLE)
def quality_benford(spark, sf):
    """Benford's-law first-digit audit of o_totalprice — the classic
    fabricated-data / corrupted-feed detector: per digit 1-9, the
    observed count, the expected count under Benford (exact int64
    micro-rows: n * log10(1+1/d) in micro units, constants summing to
    exactly 1e6), and the per-digit chi-square term in IEEE-pinned
    double micro units (consumers sum 9 terms against the chi2(8)
    critical value). The first digit is extracted from the int64
    CENTS decimal rendering — pure integer/string ops, no log10 on
    the data path, so both engines agree bit-for-bit. Digits with
    zero observations still emit (LEFT join from the constant digit
    table). Scale shape: ONE map-side-combinable 9-group aggregate
    over the scan + a 9-row broadcast constant join + a 1-row count
    attach — nothing grows with data but the scan."""
    o = t(spark, sf, "orders").where(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1, 1,
        ).cast("long").alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("obs"))
    n = digits.agg(F.count(F.lit(1)).alias("n_rows"))
    p = spark.createDataFrame(
        list(_BENFORD_MICRO.items()), "digit: long, p_micro: long"
    )
    # p is the preserved side (every digit emits) — Spark cannot
    # broadcast the left of a left join, so the 9-row obs broadcasts
    j = (
        p.join(F.broadcast(obs), "digit", "left")
        .join(F.broadcast(n))
        .select(
            "digit",
            F.coalesce(F.col("obs"), F.lit(0)).alias("obs"),
            "n_rows",
            (F.col("n_rows") * F.col("p_micro")).alias("expected_micro"),
            F.col("p_micro"),
        )
    )
    obs_d = F.col("obs").cast("double")
    exp_d = F.col("n_rows").cast("double") * (
        F.col("p_micro").cast("double") / F.lit(1_000_000.0)
    )
    return j.select(
        "digit", "obs", "n_rows", "expected_micro",
        F.floor(F.lit(1_000_000.0) * (obs_d - exp_d) * (obs_d - exp_d) / exp_d)
        .cast("long")
        .alias("chi2_term_micro"),
    )


_KS_ORACLE = """
WITH v AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS fa
  FROM orders WHERE o_totalprice IS NOT NULL
),
c AS (SELECT x, CAST(sum(fa) AS BIGINT) AS c1,
             CAST(sum(1 - fa) AS BIGINT) AS c2
      FROM v GROUP BY x),
n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2 FROM c),
cum AS (SELECT x,
               CAST(sum(c1) OVER (ORDER BY x) AS BIGINT) AS cum1,
               CAST(sum(c2) OVER (ORDER BY x) AS BIGINT) AS cum2
        FROM c)
SELECT n1, n2,
       CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS ks_num,
       CAST(n1 * n2 AS BIGINT) AS ks_denom,
       CAST(floor(1000000.0
              * CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
              / CAST(n1 * n2 AS DOUBLE)) AS BIGINT) AS ks_micro
FROM cum CROSS JOIN n
GROUP BY n1, n2
"""


@query("profile-ks-drift", _KS_ORACLE)
def profile_ks_drift(spark, sf):
    """Exact two-sample Kolmogorov-Smirnov drift statistic
    (operators/drift.ks_two_sample): finished vs open orders compared
    on the o_totalprice CENTS distribution — the binning-free
    complement to profile-drift's PSI. D is emitted as the exact
    integer fraction ks_num/(n1*n2) plus the IEEE-pinned micro fold.
    The data collapses to distinct cents values in one map-side agg;
    the cumulative window runs over that reduced value table
    (domain-bounded, not row-bounded — see the operator docstring's
    quantize-first rule for unbounded metrics)."""
    from genpipe_spark.operators.drift import ks_two_sample

    o = t(spark, sf, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderstatus",
    )
    return ks_two_sample(o, "cents", F.col("o_orderstatus") == "F")


@query(
    "quality-winsorize",
    """
    WITH v AS (
      SELECT l_orderkey, l_linenumber, l_returnflag AS g,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    r AS (
      SELECT g, cents,
             row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY g) AS n
      FROM v
    ),
    lo AS (SELECT g, cents AS lo_c FROM r WHERE rn = (5 * n + 99) // 100),
    hi AS (SELECT g, cents AS hi_c FROM r WHERE rn = (95 * n + 99) // 100)
    SELECT l_orderkey, l_linenumber, g, cents,
           least(greatest(cents, lo_c), hi_c) AS cents_wins,
           (cents < lo_c OR cents > hi_c) AS clipped
    FROM v JOIN lo USING (g) JOIN hi USING (g)
    WHERE l_orderkey % 100 = 0
    """,
)
def quality_winsorize(spark, sf):
    """Per-group winsorization (operators/quantile.winsorize): price
    cents clipped into each return flag's exact nearest-rank P05-P95
    band, with the clip flag — the outlier-robust preprocessing step.
    The oracle recomputes the bounds independently via the rank/count
    window identity (rn == (p*n+99) div 100). Output thinned to every
    100th order AFTER clipping; the bounds join is group-sized."""
    from genpipe_spark.operators.quantile import winsorize

    li = t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    w = winsorize(li, "cents", ["g"], lo_pct=5, hi_pct=95)
    return w.where(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey", "l_linenumber", "g", "cents",
        F.col("cents_wins"), "clipped",
    )
