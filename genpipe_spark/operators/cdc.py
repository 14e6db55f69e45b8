"""CDC apply / MERGE INTO — reconcile a snapshot with a changeset.

An incremental ingest pipeline receives change streams (upserts +
deletes, each stamped with a monotonic sequence) and must produce the
next snapshot without rewriting history row-by-row. Spark has no MERGE
over plain parquet (that lives in table formats), so the operator
expresses the same semantics declaratively:

  1. collapse the changeset to its LATEST entry per key — one window
     (`row_number` over key, ordered by sequence desc);
  2. survivors = snapshot rows whose key has no change (left-anti join)
     ∪ latest upserts (deletes simply emit nothing).

Scale shape: both the window and the anti-join hash-partition on the
merge key, so AQE plans ONE co-partitioned exchange per side; the
snapshot is never rewritten where unchanged keys dominate a partition
— pair with sinks.write_parquet_partitioned's dynamic partition
overwrite to rewrite only touched partitions. Skewed keys (one hot
entity receiving most updates) fall under the same AQE skew-split story
as any keyed shuffle (tests/test_skew coverage of operators/skew.py).

Determinism: ties on the sequence are broken by the op column then the
payload hash is NOT consulted — callers must supply a per-key-unique
sequence (CDC sources do: LSN / binlog offset / kafka offset). The
operator asserts uniqueness OPTIONALLY (validate=True) by failing the
job on the first duplicate (key, seq) pair rather than picking a
winner silently.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    validate: bool = False,
) -> DataFrame:
    """Next snapshot after applying ``changes`` (columns: key_cols +
    snapshot payload + ``seq_col`` + ``op_col``): latest-by-sequence
    wins per key; a latest ``delete_op`` removes the key; anything else
    upserts the full payload. Output schema == snapshot schema."""
    keys = list(key_cols)
    data_cols = snapshot.columns
    if validate:
        # fail loudly on ambiguous (key, seq) duplicates instead of
        # letting the tie-break pick silently
        dup = (
            changes.groupBy(*keys, seq_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(f"merge_apply: duplicate (key, seq) in changeset: {dup[0]}")
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    unchanged = snapshot.join(latest.select(*keys), on=keys, how="left_anti")
    # NULL-safe: only an EXPLICIT delete_op removes the key — a NULL op
    # (malformed feed) upserts rather than silently vanishing, because
    # `op != 'D'` alone is NULL-valued for NULL ops and would drop the
    # row from upserts while the anti-join still removed its snapshot row
    upserts = latest.where(
        F.coalesce(F.col(op_col) != delete_op, F.lit(True))
    ).select(*data_cols)
    return unchanged.unionByName(upserts)
