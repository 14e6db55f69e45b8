"""Staged-pipeline runner — the reference's lifecycle (SURVEY.md §3.1)
minus its driver-side chrom×band job loops.

The reference dispatches named stages from config
(``pipeline = ["load","parser",...]``, application.conf.template:28;
GenomicsLoader.scala:107-215), each stage reading one or two parquet
stage tables and writing a new one, with manual path arithmetic per chrom
and per band. Here:

  - a stage is ``fn(spark, ctx) -> DataFrame | None`` registered by name;
  - the IR between stages is a partitioned parquet table under
    ``ctx.dest/<version>/<stage_output>``;
  - there are NO driver loops: one Spark job per stage over all
    chroms/bands, with `chrom`/`band` as partition columns so Catalyst
    prunes what the reference selected by path arithmetic;
  - stages that share a lineage can be fused by returning a DataFrame and
    letting the next stage consume it un-materialized (the runner only
    materializes when the stage declares an output).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from genpipe_spark.sources.sinks import write_parquet_partitioned


@dataclass
class PipelineContext:
    dest: str
    version: str = "v1"
    conf: dict = field(default_factory=dict)
    tables: dict[str, DataFrame] = field(default_factory=dict)
    metrics: list = field(default_factory=list)  # (stage, rows, seconds)

    def path(self, table: str) -> str:
        return f"{self.dest}/{self.version}/{table}"


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, PipelineContext], DataFrame | None]
    output: str | None = None  # stage table name; None = side-effect only
    partition_by: tuple[str, ...] = ()
    # Z-order the output files on these columns instead of directory
    # partitioning (operators/layout.write_zordered): multi-dimension
    # row-group skipping for stage tables queried on two independent
    # keys. Mutually exclusive with partition_by.
    zorder_by: tuple[str, ...] = ()


class Pipeline:
    """Named-stage registry + runner. ``run(spark, ctx, stages)`` mirrors
    the reference's ``if pipeline.contains(step)`` dispatch."""

    def __init__(self) -> None:
        self._stages: dict[str, Stage] = {}
        self._order: list[str] = []

    def stage(
        self,
        name: str,
        output: str | None = None,
        partition_by: tuple[str, ...] = (),
        zorder_by: tuple[str, ...] = (),
    ):
        if partition_by and zorder_by:
            raise ValueError(
                f"stage {name!r}: partition_by and zorder_by are mutually "
                "exclusive layouts"
            )

        def deco(fn):
            self._stages[name] = Stage(name, fn, output, partition_by, zorder_by)
            self._order.append(name)
            return fn

        return deco

    def run(
        self,
        spark: SparkSession,
        ctx: PipelineContext,
        stages: list[str] | None = None,
        collect_metrics: bool = False,
        resume: bool = False,
    ) -> PipelineContext:
        """Run the selected stages. ``collect_metrics=True`` records
        (stage, rows_out, seconds) per materialized stage into
        ``ctx.metrics`` — the rows-in/rows-out observability a long
        curation/ETL run needs (one extra count per stage).

        ``resume=True`` skips any stage whose output table carries the
        runner's commit marker (written through the Hadoop FileSystem
        API after a successful materialization, so it works on any
        storage — Spark's own ``_SUCCESS`` is absent under dynamic
        partition overwrite) and re-reads it instead: a failed 100 TB
        run restarts from the first incomplete stage rather than from
        scratch. Partial writes without the marker re-run."""
        import time as _time

        selected = stages if stages is not None else list(self._order)
        for name in selected:
            t0 = _time.perf_counter()
            st = self._stages[name]
            if resume and st.output and self._committed(spark, ctx.path(st.output)):
                ctx.tables[st.output] = spark.read.parquet(ctx.path(st.output))
                if collect_metrics:
                    ctx.metrics.append((name, "resumed", 0.0))
                continue
            # drop any stale commit marker BEFORE running the stage:
            # partition_by stages write via dynamic partition overwrite,
            # which never clears the destination dir — a crash mid-write
            # would otherwise leave the old marker pointing at a
            # half-overwritten table that a later resume=True trusts
            if st.output:
                self._delete_marker(spark, ctx.path(st.output))
            out = st.fn(spark, ctx)
            if out is not None and st.output:
                if st.partition_by:
                    write_parquet_partitioned(
                        out, ctx.path(st.output), st.partition_by
                    )
                elif st.zorder_by:
                    from genpipe_spark.operators.layout import write_zordered

                    write_zordered(out, ctx.path(st.output), st.zorder_by)
                else:
                    out.write.mode("overwrite").parquet(ctx.path(st.output))
                self._write_marker(spark, ctx.path(st.output))
                # re-read so downstream stages see the materialized table
                # (partition discovery recovers layout keys as columns)
                ctx.tables[st.output] = spark.read.parquet(ctx.path(st.output))
                if collect_metrics:
                    ctx.metrics.append(
                        (
                            name,
                            ctx.tables[st.output].count(),
                            round(_time.perf_counter() - t0, 3),
                        )
                    )
            elif out is not None:
                ctx.tables[st.output or name] = out
            if collect_metrics and (out is None or not st.output):
                ctx.metrics.append((name, None, round(_time.perf_counter() - t0, 3)))
        return ctx

    _MARKER = "_GENPIPE_COMMITTED"

    @classmethod
    def _marker_path(cls, spark: SparkSession, path: str):
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{cls._MARKER}")
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs, hpath

    @classmethod
    def _committed(cls, spark: SparkSession, path: str) -> bool:
        fs, hpath = cls._marker_path(spark, path)
        return bool(fs.exists(hpath))

    @classmethod
    def _write_marker(cls, spark: SparkSession, path: str) -> None:
        fs, hpath = cls._marker_path(spark, path)
        fs.create(hpath, True).close()

    @classmethod
    def _delete_marker(cls, spark: SparkSession, path: str) -> None:
        fs, hpath = cls._marker_path(spark, path)
        if fs.exists(hpath):
            fs.delete(hpath, False)


def build_genomics_pipeline() -> Pipeline:
    """The reference's batch pipeline re-expressed: load → parser → swap
    (interval join) → sampleGroup → variants (SURVEY.md §3.1 stage order;
    umd stages join in when annotation input is configured)."""
    from pyspark.sql import functions as F

    from genpipe_spark.functions.variant import sample_parse
    from genpipe_spark.operators.interval import interval_join

    p = Pipeline()

    @p.stage("load", output="loaded", partition_by=("chrom_n",))
    def load(spark, ctx):
        from genpipe_spark.sources.vcf import scan_vcf_text

        return scan_vcf_text(spark, ctx.conf["vcf_paths"])

    @p.stage("parser", output="parsedSamples", partition_by=("chrom",))
    def parser(spark, ctx):
        raw = ctx.tables.get("loaded") or spark.read.parquet(ctx.path("loaded"))
        raw = raw.withColumn("chrom", F.col("chrom_n").cast("string"))
        parsed = sample_parse(raw)
        # quality + multiallelic gate exactly as the write in
        # steps/Parser.scala:199
        return parsed.where(
            (~F.col("sample.multiallelic"))
            & (F.col("sample.dp") > 7)
            & (F.col("sample.gq") > 19)
        )

    @p.stage("umd.prepare", output=None)
    def umd_prepare(spark, ctx):
        # distinct HIGH/MODERATE/LOW effect sites → single TSV for the
        # external UMD web service (umd.prepareInput, steps/UMD.scala:12-18;
        # the human-in-the-loop machine boundary of SURVEY.md §3.1)
        from genpipe_spark.sources.sinks import write_single_tsv

        if "umd_prepare_dest" not in ctx.conf:
            return None
        parsed = ctx.tables.get("parsedSamples") or spark.read.parquet(
            ctx.path("parsedSamples")
        )
        sites = (
            parsed.select("chrom", "pos", "ref", "alt", F.explode("effects").alias("e"))
            .where(F.col("e.effect_impact").isin("HIGH", "MODERATE", "LOW"))
            .select("chrom", "pos", "ref", "alt")
            .distinct()
        )
        write_single_tsv(
            sites.withColumn("id", F.lit(".")).select("chrom", "pos", "id", "ref", "alt"),
            ctx.conf["umd_prepare_dest"],
            ["chrom", "pos", "id", "ref", "alt"],
        )
        return None

    @p.stage("umd.parse", output="umdAnnotated")
    def umd_parse(spark, ctx):
        # annotated responses → umdAnnotated table (steps/UMD.scala:20-27)
        from genpipe_spark.sources.vcf import scan_annotation_text

        if "umd_annotated_paths" not in ctx.conf:
            return None
        return scan_annotation_text(spark, ctx.conf["umd_annotated_paths"])

    @p.stage("umd.join", output="effectsUMD", partition_by=("chrom",))
    def umd_join(spark, ctx):
        # LATERAL VIEW explode(effects) ⟕ UMD on (pos, ref, alt) —
        # steps/UMD.scala:39-49; UMD letter lands on matching sites, ""
        # elsewhere (the stepsTest/UMD.scala golden idiom)
        umd = ctx.tables.get("umdAnnotated")
        if umd is None:
            return None
        parsed = ctx.tables.get("parsedSamples") or spark.read.parquet(
            ctx.path("parsedSamples")
        )
        # unique sites before explode (ParsedSampleUnique.distinct,
        # steps/UMD.scala:41); multiallelic filter as in the reference
        sites = (
            parsed.where(~F.col("sample.multiallelic"))
            .select("chrom", "pos", "ref", "alt", "effects")
            .distinct()
        )
        exploded = sites.select(
            "chrom", "pos", "ref", "alt", F.explode("effects").alias("effect")
        )
        umd_side = umd.select(
            F.col("chrom").alias("u_chrom"),
            "pos",
            "ref",
            "alt",
            F.col("umd").alias("u_umd"),
        )
        # UMD is a bounded curated annotation DB in the genomics domain,
        # but the generalized stage must not hard-force a broadcast —
        # AQE broadcasts it when it is in fact small.
        joined = exploded.join(
            umd_side,
            (exploded["chrom"] == umd_side["u_chrom"])
            & (exploded["pos"] == umd_side["pos"])
            & (exploded["ref"] == umd_side["ref"])
            & (exploded["alt"] == umd_side["alt"]),
            "left",
        )
        return joined.select(
            exploded["chrom"],
            exploded["pos"],
            exploded["ref"],
            exploded["alt"],
            "effect",
            F.coalesce(F.col("u_umd"), F.lit("")).alias("umd"),
        )

    @p.stage("swap", output="rangesSwap", partition_by=("chrom",))
    def swap(spark, ctx):
        parsed = ctx.tables.get("parsedSamples") or spark.read.parquet(
            ctx.path("parsedSamples")
        )
        variants = (
            parsed.where(
                (F.col("alt") != "<NON_REF>") & (F.col("sample.gt") != "0/0")
            )
            .select("chrom", "pos", "ref", "alt", "indel")
            .distinct()
        )
        blocks = parsed.where(
            (F.col("alt") == "<NON_REF>") & (F.col("end_pos") != 0)
        ).select(
            "chrom",
            F.col("pos").alias("b_pos"),
            "end_pos",
            F.col("sample").alias("b_sample"),
        )
        return interval_join(
            variants,
            blocks,
            point_col="pos",
            lo_col="b_pos",
            hi_col="end_pos",
            band_width=int(ctx.conf.get("band_width", 100_000)),
            extra_keys=("chrom",),
        ).select(
            variants["chrom"].alias("chrom"),
            "pos",
            "ref",
            "alt",
            "indel",
            # reference swap emits Sample("0/0", dp, gq, "", ad, false,
            # sampleId) — pl explicitly emptied, gt/multiallelic pinned
            # (intersectSwap.scala:131)
            F.struct(
                F.lit("0/0").alias("gt"),
                F.col("b_sample.dp").alias("dp"),
                F.col("b_sample.gq").alias("gq"),
                F.lit("").alias("pl"),
                F.col("b_sample.ad").alias("ad"),
                F.lit(False).alias("multiallelic"),
                F.col("b_sample.sampleId").alias("sampleId"),
                F.col("b_sample.diploid").alias("diploid"),
            ).alias("sample"),
        )

    @p.stage("sampleGroup", output="samples", partition_by=("chrom",))
    def sample_group(spark, ctx):
        parsed = ctx.tables.get("parsedSamples") or spark.read.parquet(
            ctx.path("parsedSamples")
        )
        swapped = ctx.tables.get("rangesSwap") or spark.read.parquet(
            ctx.path("rangesSwap")
        )
        direct = parsed.where(F.col("alt") != "<NON_REF>").select(
            "chrom", "pos", "ref", "alt", "indel", "sample"
        )
        both = direct.unionByName(swapped.select(direct.columns))
        # structs are orderable in Spark, so the collected document stays
        # TYPED and still deterministic via sort_array — no JSON
        # serialization roundtrip (FIXTURES.md determinism rules)
        return (
            both.groupBy("chrom", "pos", "ref", "alt", "indel")
            .agg(F.sort_array(F.collect_set(F.col("sample"))).alias("samples"))
        )

    @p.stage("variants", output="variants", partition_by=("chrom",))
    def variants(spark, ctx):
        parsed = ctx.tables.get("parsedSamples") or spark.read.parquet(
            ctx.path("parsedSamples")
        )
        samples = ctx.tables.get("samples") or spark.read.parquet(ctx.path("samples"))
        annotations = (
            parsed.where(F.col("alt") != "<NON_REF>")
            .groupBy("chrom", "pos", "ref", "alt")
            .agg(
                # functionally dependent per site; min for determinism
                F.min("predictions").alias("predictions"),
                F.min("populations").alias("populations"),
            )
        )
        joined = annotations.join(samples, ["chrom", "pos", "ref", "alt"], "left")
        # freqInt over the typed struct array (same digit-sum semantics as
        # the map form, steps/toVariant.scala:28-30)
        digit = lambda c: F.coalesce(c.cast("long"), F.lit(0))  # noqa: E731
        gt_digits = F.aggregate(
            F.col("samples"),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + digit(F.try_element_at(F.split(s["gt"], "/"), F.lit(1)))
            + digit(F.try_element_at(F.split(s["gt"], "/"), F.lit(2))),
        )
        freq = (gt_digits / (2.0 * F.size(F.col("samples")))).cast("double")
        return joined.withColumn("freqInt", freq)

    return p
