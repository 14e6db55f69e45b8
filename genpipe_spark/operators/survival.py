"""Kaplan-Meier survival estimation — time-to-event with right
censoring, the standard churn/retention/time-to-conversion estimator.

Input: one row per subject with an integer duration and an observed
flag (1 = the event happened at ``duration``, 0 = censored there).
Output: one row per (group, distinct duration) with the risk-set size,
event/censor counts, and the product-limit survival estimate

    S(t_i) = prod_{j <= i} (1 - d_j / n_j)

Spark shape: everything up to the product is declarative — ONE grouped
count collapses subjects to (group, duration) rows (grouped-size data
from here on), a per-group window turns cumulative exits into risk-set
sizes n_i. The product itself is a sequential FLOAT recurrence; the
exp(sum(ln)) rewrite would be window-expressible but crosses libm (the
repo's determinism rules forbid it), so it rides the stateful-scan
class (operators/statescan.py): applyInPandas per group over
already-grouped-size rows, multiplying ``(1 - d/n)`` in pinned IEEE
order. The DuckDB oracle replays the identical op sequence one
duration per recursive-CTE step, so ``floor(s * 1e6)`` matches
bit-for-bit — the same pinned-double doctrine as grouped corr/OLS.

Scale: the scan input is (groups x distinct durations), not subjects —
days/weeks resolution keeps it thousands of rows per group at ANY
corpus size; the only scan-sized work is the first grouped count.

Reference comparison: the reference engine has no survival operator;
its users exported aggregates to R/lifelines. Here it is one oracle-
checked DataFrame op.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def km_survival(
    df: DataFrame,
    keys: Sequence[str],
    dur_col: str,
    observed_col: str,
) -> DataFrame:
    """Per-group Kaplan-Meier curve.

    ``dur_col`` must be a non-negative integer (days/buckets);
    ``observed_col`` is 1 for an observed event, 0 for censoring.
    Output columns: keys..., ``dur``, ``n_risk``, ``n_event``,
    ``n_censor``, ``surv_micro`` (floor(S(t)*1e6), int64).
    """
    keys = list(keys)
    cell = df.groupBy(
        *keys, F.col(dur_col).cast("long").alias("dur")
    ).agg(
        F.sum(F.col(observed_col).cast("long")).alias("n_event"),
        F.sum(F.lit(1) - F.col(observed_col).cast("long")).alias("n_censor"),
    )
    w = Window.partitionBy(*keys).orderBy("dur")
    total = Window.partitionBy(*keys)
    exits = F.col("n_event") + F.col("n_censor")
    # risk set entering t_i = everyone minus exits strictly before t_i
    cell = cell.withColumn(
        "n_risk",
        F.sum(exits).over(total)
        - F.coalesce(
            F.sum(exits).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    base = cell.select(*keys, "dur", "n_risk", "n_event", "n_censor")
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields
    ) + ", `surv_micro` bigint"

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("dur", kind="mergesort", ignore_index=True)
        s = 1.0
        out = [0] * len(pdf)
        d = pdf["n_event"].to_numpy()
        n = pdf["n_risk"].to_numpy()
        for i in range(len(pdf)):
            # pinned IEEE order: one divide, one subtract, one multiply
            s = s * (1.0 - float(d[i]) / float(n[i]))
            out[i] = int(s * 1_000_000.0)  # trunc == floor for s >= 0
        pdf["surv_micro"] = pd.Series(out, dtype="int64")
        return pdf

    return base.groupBy(*keys).applyInPandas(scan, out_schema)
