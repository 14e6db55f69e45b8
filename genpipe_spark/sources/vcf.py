"""Text scans: gVCF-shaped ingest and annotation files (SURVEY.md §2.1
`scan-text-vcf`, `scan-text-annotation`, `scan-file-list`).

The reference reads gzipped tab-separated text per file with RDD unions
batched 100-at-a-time plus lineage checkpoints
(steps/gzToParquet.scala:37-48,62-87, GenomicsLoader.scala:241-250).
Spark-first: hand the *whole* glob/path-list to one ``spark.read.text`` —
the file source parallelizes splits itself (gzip = one split per file),
``input_file_name()`` replaces the per-file loop for the sample tag, and
no checkpointing is needed because there is no union chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from genpipe_spark.functions.parse import chrom_normalize, umd_label

# rawTable contract (steps/gzToParquet.scala:14-23): one VCF data line per
# row, tagged with its source sample
VCF_COLUMNS = ["chrom", "pos", "id", "ref", "alt", "qual", "filter", "info", "format", "sample"]


def scan_vcf_text(
    spark: SparkSession,
    paths: str | list[str],
    sample_id_from_filename: bool = True,
) -> DataFrame:
    """Read (optionally gzipped) tab-separated VCF text: drop '#' header
    lines, split on tab, type pos as long, normalize chrom, tag each row
    with its source sample id (derived from the file name — replacing the
    reference's per-file driver loop and the streaming variant's
    ``toDebugString`` hack, StreamGenomicsLoader.scala:40-43)."""
    lines = spark.read.text(paths).where(~F.col("value").startswith("#"))
    cols = F.split(F.col("value"), "\t")
    projected = [
        F.try_element_at(cols, F.lit(i + 1)).alias(name)
        for i, name in enumerate(VCF_COLUMNS)
    ]
    out = lines.select(
        *projected,
        F.input_file_name().alias("__file"),
    )
    sample_id = (
        F.regexp_extract(F.regexp_extract(F.col("__file"), r"([^/]+)$", 1), r"^([^.]+)", 1)
        if sample_id_from_filename
        else F.lit("")
    )
    return out.select(
        chrom_normalize(F.col("chrom")).alias("chrom_n"),
        F.col("chrom"),
        F.col("pos").cast("long").alias("pos"),
        "id",
        "ref",
        "alt",
        "qual",
        "filter",
        "info",
        "format",
        "sample",
        sample_id.alias("sample_id"),
    )


def scan_annotation_text(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """External UMD annotation text: drop the NB_LINES header, split tab,
    strip the 'chr' prefix, map pathogenicity phrases to letter codes
    (parseUMD, steps/UMD.scala:20-27; umdVariant contract UMD.scala:6)."""
    lines = spark.read.text(paths).where(~F.col("value").startswith("NB_LINES"))
    c = F.split(F.col("value"), "\t")

    def g(i: int):
        return F.coalesce(F.try_element_at(c, F.lit(i + 1)), F.lit(""))

    return lines.select(
        F.regexp_replace(g(0), "^chr", "").alias("chrom"),
        g(1).cast("long").alias("pos"),
        g(4).alias("ref"),
        g(5).alias("alt"),
        # column 7 only present on 8-column rows (x.size==8 guard, UMD.scala:24)
        F.when(F.size(c) == 8, umd_label(g(7))).otherwise(F.lit("")).alias("umd"),
    )


def read_sample_manifest(path: str) -> list[str]:
    """Driver-side manifest read: skip '#', first tab field per line
    (utils/io.scala:6-12, GenomicsLoader.scala:233-236). Plain Python —
    the manifest is small by construction."""
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(line.split("\t")[0])
    return out
