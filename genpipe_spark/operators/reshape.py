"""Wide↔long reshaping: pivot with EXPLICIT categories, and unpivot.

Scale rules baked into the API:
  - ``pivot_explicit`` REQUIRES the category list. Spark's
    values-less ``pivot()`` first runs a hidden distinct+collect over
    the pivot column — an extra full pass plus a driver-side
    materialization that explodes on a high-cardinality column at
    100 TB. With explicit values the pivot is ONE ordinary groupBy
    shuffle producing |values| columns, and a typo'd category becomes
    an all-NULL column instead of a silent schema change between runs;
  - ``unpivot`` is a pure per-row projection (Spark's Expand node):
    no shuffle, output rows = input rows × |value columns|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def pivot_explicit(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Wide table: one row per ``group_cols``, one ``agg`` column per
    entry of ``values`` (combinations absent from the data come back
    NULL)."""
    if not values:
        raise ValueError(
            "pivot_explicit: the category list is required — an implicit "
            "distinct-collect over the pivot column does not scale"
        )
    return df.groupBy(*group_cols).pivot(pivot_col, list(values)).agg(agg)


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Long table: ``id_cols + (var_name, value_name)``, one output row
    per (input row × value column). Inverse of pivot_explicit up to
    NULL cells (filter them to recover exactly the pre-pivot groups)."""
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)
