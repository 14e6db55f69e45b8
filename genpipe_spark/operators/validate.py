"""Declarative data-quality validation — Deequ-style checks in ONE scan.

A training-data pipeline gates every corpus snapshot on invariants
(no-null keys, unique ids, value ranges, format conformance) before it
reaches downstream consumers; the reference ships no equivalent, but its
ingest (GenomicsLoader) silently assumes them. Spark-first shape: every
single-table constraint compiles into ONE wide ``agg`` (a single scan,
map-side partial aggregation, no per-constraint jobs and no driver
loops) and the result is exploded to long format — one row per
constraint with an exact integer violation count, so ``passed`` is
bit-deterministic (no float thresholds unless the caller opts into a
ratio check, which still compares in integer basis points).

Referential integrity crosses tables, so it cannot ride the same scan:
``referential`` compiles to a left-anti join count (shuffle or AQE
broadcast — Catalyst's choice; the parent side is projected to its key
column only, so at 100 TB the shuffle moves keys, not rows).

Scale notes: ``unique`` uses exact ``count_distinct``; multiple unique
checks in one call plan through Catalyst Expand (rows x #unique-checks
pre-shuffle — same documented cost as operators/profile.py exact mode).
Pass ``approx_unique=True`` to trade that for one HLL pass (rsd 2%)
when an exact duplicate count is not required — drift gating usually
only needs "is it roughly unique", and the HLL plan is a plain one-pass
agg at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALIDATION_SCHEMA = "constraint string, column string, violations bigint, passed boolean"


def not_null(col: str) -> dict:
    """Violations = rows where ``col`` IS NULL."""
    return {"kind": "not_null", "column": col}


def unique(col: str) -> dict:
    """Violations = n_rows - count(distinct col) (NULLs count as rows but
    never as a distinct value, so a column with NULLs is never unique)."""
    return {"kind": "unique", "column": col}


def in_range(col: str, lo, hi) -> dict:
    """Violations = non-null rows outside [lo, hi]. NULLs are not range
    violations — combine with ``not_null`` to forbid them."""
    return {"kind": "in_range", "column": col, "lo": lo, "hi": hi}


def matches(col: str, pattern: str, min_ratio_bp: int = 10_000) -> dict:
    """Violations = non-null rows NOT fully matching ``pattern``; passes
    when matching rows ≥ min_ratio_bp/10000 of non-null rows (compared in
    integer basis points — no float threshold). Keep ``pattern`` to
    syntax shared by Java regex and RE2 (see text.PII_PATTERNS note)."""
    if not 0 < int(min_ratio_bp) <= 10_000:
        # a typo'd 95000-for-95% threshold would otherwise silently fall
        # through _passed's exact branch and never fire
        raise ValueError(f"matches: min_ratio_bp must be in (0, 10000], got {min_ratio_bp}")
    return {
        "kind": "matches",
        "column": col,
        "pattern": pattern,
        "min_ratio_bp": int(min_ratio_bp),
    }


def accepted_in(col: str, values: Sequence) -> dict:
    """Violations = non-null rows whose value is outside ``values``."""
    return {"kind": "accepted_in", "column": col, "values": list(values)}


def min_rows(n: int) -> dict:
    """Violations = max(0, n - n_rows): an empty/truncated snapshot fails
    loudly instead of passing every per-row check vacuously."""
    return {"kind": "min_rows", "column": "*", "n": int(n)}


def _violations(check: dict, approx_unique: bool) -> Column:
    kind = check["kind"]
    c = F.col(check["column"]) if check["column"] != "*" else None
    if kind == "not_null":
        return F.count(F.when(c.isNull(), 1))
    if kind == "unique":
        if approx_unique:
            # HLL under/over-shoots by ~rsd even on clean data: clamp the
            # negative case; the pass criterion gets matching slack below
            return F.greatest(
                F.count(F.lit(1)) - F.approx_count_distinct(c, 0.02), F.lit(0)
            )
        return F.count(F.lit(1)) - F.count_distinct(c)
    if kind == "in_range":
        return F.count(
            F.when(c.isNotNull() & ((c < check["lo"]) | (c > check["hi"])), 1)
        )
    if kind == "matches":
        return F.count(
            F.when(c.isNotNull() & ~c.rlike(f"^(?:{check['pattern']})$"), 1)
        )
    if kind == "accepted_in":
        return F.count(F.when(c.isNotNull() & ~c.isin(check["values"]), 1))
    if kind == "min_rows":
        return F.greatest(F.lit(check["n"]).cast("long") - F.count(F.lit(1)), F.lit(0))
    raise ValueError(f"unknown constraint kind: {kind}")


def _passed(
    check: dict,
    viol: Column,
    n_nonnull: Column | None,
    approx_unique: bool = False,
    n_rows: Column | None = None,
) -> Column:
    if check["kind"] == "matches" and check["min_ratio_bp"] < 10_000:
        # matched * 10000 >= bp * n_nonnull, all in exact bigint arithmetic
        matched = n_nonnull - viol
        return matched * 10_000 >= F.lit(check["min_ratio_bp"]) * n_nonnull
    if check["kind"] == "unique" and approx_unique:
        # HLL rsd is 2%: a perfectly-unique column can show an apparent
        # dup count of ~rsd*n, so "roughly unique" passes within 2*rsd
        # (400 bp) — exact mode keeps the strict viol == 0 criterion
        return viol * 10_000 <= 400 * n_rows
    return viol == 0


def validate_table(
    df: DataFrame, checks: Sequence[dict], approx_unique: bool = False
) -> DataFrame:
    """Evaluate every constraint in ONE scan; returns long-format
    ``constraint, column, violations, passed`` (one row per check, in
    the caller's check order — deterministic output)."""
    if not checks:
        raise ValueError("validate_table: no checks given")
    aggs, nonnull_cols = [F.count(F.lit(1)).alias("__nrows")], {}
    for i, check in enumerate(checks):
        aggs.append(_violations(check, approx_unique).alias(f"__v{i}"))
        if check["kind"] == "matches":
            col = check["column"]
            if col not in nonnull_cols:
                nonnull_cols[col] = F.count(F.col(col)).alias(f"__nn_{col}")
    wide = df.agg(*aggs, *nonnull_cols.values())
    rows = F.array(
        *[
            F.struct(
                F.lit(check["kind"]).alias("constraint"),
                F.lit(check["column"]).alias("column"),
                F.col(f"__v{i}").cast("long").alias("violations"),
                _passed(
                    check,
                    F.col(f"__v{i}"),
                    F.col(f"__nn_{check['column']}")
                    if check["kind"] == "matches"
                    else None,
                    approx_unique=approx_unique,
                    n_rows=F.col("__nrows"),
                ).alias("passed"),
            )
            for i, check in enumerate(checks)
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def referential(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Foreign-key containment: one ``constraint='referential'`` row with
    violations = child rows (non-null key) with no matching parent key.
    Left-anti join on the projected parent key column — at scale the
    shuffle carries keys only, and AQE broadcasts genuinely small
    parents on its own (no forced hint; see tests/test_plan_audit.py)."""
    orphans = (
        child.select(F.col(child_col))
        .where(F.col(child_col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(child_col)).distinct(),
            on=child_col,
            how="left_anti",
        )
    )
    return orphans.agg(
        F.lit("referential").alias("constraint"),
        F.lit(child_col).alias("column"),
        F.count(F.lit(1)).cast("long").alias("violations"),
        (F.count(F.lit(1)) == 0).alias("passed"),
    )
