"""Shared declarative row-assertion scaffolding.

``assert_rows`` attaches a per-row ``assert_true`` to a DataFrame as a
filter that always keeps the row when the condition holds — the job
fails at ACTION time with a composed message the moment any row
violates the predicate, with no separate validation job and no extra
scan (the check rides whatever stage already reads the row). Used by
the interval operators' NULL/inverted-bounds preconditions and
merge_apply's winner-ambiguity validation (one definition instead of
the three copies flagged in the round-6 review).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assert_rows(df: DataFrame, valid: Column, *msg_parts: Column) -> DataFrame:
    """Return ``df`` with a row-level assertion: rows where ``valid``
    is True (NULL counts as False) pass through unchanged; the first
    violating row aborts the job with the concatenated ``msg_parts``
    (mix ``F.lit`` text with ``col.cast('string')`` values).

    ``assert_true`` yields NULL on success, so the coalesce keeps the
    filter a tautology that Catalyst cannot prune (the column is
    referenced) yet never drops a row."""
    return df.where(
        F.coalesce(
            F.assert_true(valid, F.concat(*msg_parts)).cast("boolean"),
            F.lit(True),
        )
    )
