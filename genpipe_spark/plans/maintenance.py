"""Periodic mirror-maintenance plan: MERGE + OPTIMIZE as named stages.

``incremental_export`` (the diff-driven partition refresh) and
``compact_mirror`` (the small-file OPTIMIZE pass) already share one
crash-recovery protocol (plans/export.py); this module surfaces the
composed cycle as a :class:`~genpipe_spark.plans.pipeline.Pipeline`
so the maintenance loop rides the SAME named-stage lifecycle as the
reference-shaped ETL pipelines (dispatch by stage list, per-stage
metrics, resumability by re-running — both stages are idempotent and
self-healing, so a crashed cycle is simply re-dispatched).

Configuration comes from the context:
  - ``ctx.tables["snapshot"]`` — the authoritative current snapshot;
  - ``ctx.conf["mirror_dest"]`` — mirror path;
  - ``ctx.conf["mirror_keys"]`` / ``ctx.conf["mirror_partition_col"]``;
  - optional ``ctx.conf["compact_max_files"]`` /
    ``ctx.conf["compact_target_bytes"]``.

Per-stage stats land in ``ctx.conf["maintenance_stats"][stage]`` —
the {changed_rows, partitions_rewritten} / {partitions_compacted,
files_before, files_after} dicts the underlying plans return, the
observability a scheduled 100 TB maintenance job reports.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from genpipe_spark.plans.export import compact_mirror, incremental_export
from genpipe_spark.plans.pipeline import Pipeline, PipelineContext


def build_maintenance_pipeline() -> Pipeline:
    p = Pipeline()

    @p.stage("refresh")  # side-effect stage: writes the mirror itself
    def refresh(spark: SparkSession, ctx: PipelineContext):
        stats = incremental_export(
            spark,
            ctx.tables["snapshot"],
            ctx.conf["mirror_dest"],
            ctx.conf["mirror_keys"],
            ctx.conf["mirror_partition_col"],
        )
        ctx.conf.setdefault("maintenance_stats", {})["refresh"] = stats
        return None

    @p.stage("optimize")
    def optimize(spark: SparkSession, ctx: PipelineContext):
        stats = compact_mirror(
            spark,
            ctx.conf["mirror_dest"],
            ctx.conf["mirror_partition_col"],
            max_files=ctx.conf.get("compact_max_files", 8),
            target_file_bytes=ctx.conf.get(
                "compact_target_bytes", 128 * 1024 * 1024
            ),
        )
        ctx.conf.setdefault("maintenance_stats", {})["optimize"] = stats
        return None

    return p
