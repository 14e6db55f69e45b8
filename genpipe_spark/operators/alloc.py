"""Set-based allocation operators.

``fifo_allocate`` — FIFO lot matching (oldest supply feeds oldest
demand), the warehouse/cost-basis workhorse. The naive formulation is
a sequential scan; the set-based identity used here is that FIFO
allocation of demand j from supply lot i equals the OVERLAP of their
cumulative-quantity intervals:

    alloc(i, j) = max(0, min(cs_i, cd_j) - max(cs_{i-1}, cd_{j-1}))

where ``cs``/``cd`` are running sums of supply/demand quantities in
FIFO order. That turns the whole operator into two per-key window
prefix sums + one per-key interval-overlap join — fully declarative,
whole-stage codegen, no Python. Matched-pair count per key is at most
(supplies + demands - 1) — the merge property — so output is LINEAR
in input even though the join is written as a range predicate.

Scale: both windows and the join share ONE hash partitioning on the
key; per-key supply/demand sequences are the small dimension (a user's
lots), keys are the parallelism. A single key with millions of lots
would want the banded interval_join on cumulative ranges instead —
operators/interval.py already provides it; not wired because no
fixture key is within orders of magnitude of needing it.

``largest_remainder_apportion`` — Hamilton-method proportional
allocation of an integer total across groups: floor the exact quota,
then hand the leftover units to the largest remainders (deterministic
tie-break on the group key). Pure integer arithmetic end-to-end:
base = (seats*w) div W, remainder = (seats*w) % W — no floats, so the
result is engine-exact by construction. The ranking window is over
GROUP-sized data (post-aggregate), not the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fifo_allocate(
    supply: DataFrame,
    demand: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    qty_col: str,
    supply_id: str,
    demand_id: str,
) -> DataFrame:
    """Match demand rows to supply rows FIFO within each key group.

    ``supply_id`` / ``demand_id`` name the id column in each input
    (they may be the same name); output columns are always
    ``supply_id`` / ``demand_id`` / ``alloc_qty``, one row per
    matched pair with ``alloc_qty`` > 0. Quantities must be non-negative integers
    (caller-enforced); unmet demand and unconsumed supply simply
    produce no pair — recover them by re-aggregating alloc_qty
    against the originals.
    """
    keys = list(keys)

    def cum(df: DataFrame, prefix: str, id_col: str, out_name: str) -> DataFrame:
        # window exprs bind to the ORIGINAL columns (order_cols must
        # exist in the input); only the id is re-aliased on the way out
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.select(
            *keys,
            F.col(id_col).alias(out_name),
            (F.sum(qty_col).over(w) - F.col(qty_col)).alias(f"{prefix}_lo"),
            F.sum(qty_col).over(w).alias(f"{prefix}_hi"),
        )

    s = cum(supply, "s", supply_id, "supply_id")
    d = cum(demand, "d", demand_id, "demand_id")
    overlap = F.least(F.col("s_hi"), F.col("d_hi")) - F.greatest(
        F.col("s_lo"), F.col("d_lo")
    )
    return (
        s.join(d, keys)
        .where((F.col("s_lo") < F.col("d_hi")) & (F.col("d_lo") < F.col("s_hi")))
        .select(*keys, "supply_id", "demand_id", overlap.alias("alloc_qty"))
    )


def largest_remainder_apportion(
    weights: DataFrame,
    key_cols: Sequence[str],
    weight_col: str,
    seats: int,
) -> DataFrame:
    """Hamilton apportionment: split integer ``seats`` across groups
    proportionally to non-negative integer ``weight_col``. Adds
    ``base`` (floored quota), ``rem`` (quota remainder numerator),
    and ``alloc`` (final allocation); sum(alloc) == seats exactly
    whenever total weight > 0. Ties on the remainder break on the
    group key ascending — deterministic across engines."""
    key_cols = list(key_cols)
    tot = weights.agg(F.sum(weight_col).alias("__w_tot"))
    w = weights.crossJoin(F.broadcast(tot))
    w = w.select(
        *key_cols,
        F.col(weight_col).alias("w"),
        (F.lit(seats) * F.col(weight_col))
        .cast("long").alias("__num"),
        F.col("__w_tot"),
    ).select(
        *key_cols,
        "w",
        F.expr("__num div __w_tot").alias("base"),
        F.expr("__num % __w_tot").alias("rem"),
        "__w_tot",
    )
    leftover = F.lit(seats) - F.sum("base").over(
        Window.partitionBy()
    )
    rank = F.row_number().over(
        Window.partitionBy().orderBy(F.col("rem").desc(), *key_cols)
    )
    return (
        w.withColumn("__rank", rank)
        .withColumn("__left", leftover)
        .select(
            *key_cols,
            "w",
            "base",
            "rem",
            (
                F.col("base")
                + F.when(F.col("__rank") <= F.col("__left"), 1).otherwise(0)
            ).alias("alloc"),
        )
    )


def capped_apportion(
    weights: DataFrame,
    key_cols: Sequence[str],
    weight_col: str,
    seats: int,
    cap: int,
) -> DataFrame:
    """Water-filling apportionment with a PER-GROUP CAP — the mixture
    allocator a training-data pipeline runs when policy bounds any one
    domain's share ("no source may exceed 12% of the mixture"):
    allocate ``seats`` proportionally to ``weight_col`` but clamp every
    group at ``cap``, redistributing the clamped excess among the
    uncapped groups, recursively — the exact fixpoint, computed in
    CLOSED FORM by rank arithmetic instead of iteration:

      sort groups by (w desc, key); if the top k are capped, the
      uncapped share is R_k = seats - k*cap over W_rest = W - cum_k;
      k* is the SMALLEST k where the (k+1)-th group stays under cap
      (w_{k+1} * R_k <= cap * W_rest) — the standard water-filling
      threshold. Everything below rides Hamilton largest-remainder
      (the alloc-largest-remainder machinery) so sum(alloc) == seats
      EXACTLY, all in int64 (no floats anywhere).

    Scale: the scan-sized work is the caller's weight aggregation;
    everything here runs over group-count rows (the
    alloc-largest-remainder global-window shape). Raises when
    cap * n_groups < seats (infeasible policy — loud, per the
    gate doctrine). Output: key, w, rnk, capped, alloc."""
    key_cols = list(key_cols)
    w = weights.select(*key_cols, F.col(weight_col).cast("long").alias("w"))
    rnk = F.row_number().over(
        Window.partitionBy().orderBy(F.col("w").desc(), *key_cols)
    )
    cum = F.sum("w").over(
        Window.partitionBy()
        .orderBy(F.col("w").desc(), *key_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = w.select(*key_cols, "w", rnk.alias("rnk"), cum.alias("cum"))
    tot = r.agg(
        F.sum("w").alias("tw"), F.count(F.lit(1)).alias("D")
    )
    n_groups = tot.collect()[0]["D"]
    if cap * n_groups < seats:
        raise ValueError(
            f"capped_apportion: cap {cap} x {n_groups} groups < "
            f"seats {seats} — infeasible policy"
        )
    C, N = F.lit(cap).cast("long"), F.lit(seats).cast("long")
    # k = rnk - 1 is feasible iff group rnk stays under cap with the
    # top k capped; k* = min feasible k (D when none)
    kstar = (
        r.crossJoin(F.broadcast(tot))
        .select(
            F.min(
                F.when(
                    (N - (F.col("rnk") - 1) * C >= 0)
                    & (
                        F.col("w") * (N - (F.col("rnk") - 1) * C)
                        <= C * (F.col("tw") - (F.col("cum") - F.col("w")))
                    ),
                    F.col("rnk") - 1,
                )
            ).alias("k0")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.coalesce(F.col("k0"), F.col("D")).alias("kstar"),
        )
    )
    g = r.crossJoin(F.broadcast(kstar))
    capped = g.where(F.col("rnk") <= F.col("kstar")).select(
        *key_cols, "w", "rnk", F.lit(1).alias("capped"), C.alias("alloc")
    )
    unc = g.where(F.col("rnk") > F.col("kstar")).select(
        *key_cols, "w", "rnk",
        (N - F.col("kstar") * C).alias("R"),
    )
    # W_rest = total weight of uncapped groups; m = their count.  When
    # every positive-weight group is capped and only zero-weight groups
    # remain (Wr == 0) with R seats left, proportional division is
    # undefined — distribute the R seats evenly by key order instead
    # (feasible: the cap gate above guarantees R <= cap * m).
    wrest = unc.agg(
        F.sum("w").alias("Wr"), F.count(F.lit(1)).cast("long").alias("m")
    )
    unc2 = (
        unc.crossJoin(F.broadcast(wrest))
        .select(
            *key_cols, "w", "rnk",
            F.expr(
                "CASE WHEN Wr = 0 THEN R div m ELSE R * w div Wr END"
            ).alias("base"),
            F.expr(
                "CASE WHEN Wr = 0 THEN CAST(0 AS BIGINT)"
                " ELSE R * w % Wr END"
            ).alias("rem"),
            "R",
        )
    )
    left = F.max("R").over(Window.partitionBy()) - F.sum("base").over(
        Window.partitionBy()
    )
    rrank = F.row_number().over(
        Window.partitionBy().orderBy(F.col("rem").desc(), *key_cols)
    )
    uncapped = (
        unc2.withColumn("__rr", rrank)
        .withColumn("__left", left)
        .select(
            *key_cols, "w", "rnk", F.lit(0).alias("capped"),
            (
                F.col("base")
                + F.when(F.col("__rr") <= F.col("__left"), 1).otherwise(0)
            ).alias("alloc"),
        )
    )
    return capped.unionByName(uncapped)
