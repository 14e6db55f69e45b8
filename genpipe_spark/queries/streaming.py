"""Streaming + source/sink queries()/oracle_sql() twins (SURVEY.md §2.1,
§2.8).

`stream-window-agg` runs the streaming windowed aggregation in batch mode
(identical plan semantics) so DuckDB's time_bucket can oracle it.
`stream-ingest` and `scan-text-vcf` exercise the real file-source paths
end-to-end on a deterministic generated fixture (rows-only check — no SQL
table backs generated text input). `sink-parquet-partitioned` is an
oracle-checked write→read roundtrip."""

from __future__ import annotations

import gzip
import os
import tempfile

from pyspark.sql import functions as F

from genpipe_spark.registry import query
from genpipe_spark.queries.common import t


@query(
    "stream-window-agg",
    """
    SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, count(*) AS n_events,
           sum(cast(round(value*100) AS BIGINT))/100.0 AS value_sum
    FROM events GROUP BY 1, 2
    """,
)
def stream_window_agg(spark, sf):
    from genpipe_spark.streaming.ingest import stream_windowed_event_counts

    return stream_windowed_event_counts(t(spark, sf, "events"))


def _vcf_fixture_dir() -> str:
    """Deterministic tiny VCF fixture for the file-source paths (content
    depends only on constants; safe under /tmp, regenerated idempotently)."""
    d = os.path.join(tempfile.gettempdir(), "genpipe_vcf_fixture_v1")
    if not os.path.isdir(d):
        # atomic publish (concurrent driver processes)
        tmp = tempfile.mkdtemp(dir=tempfile.gettempdir())
        for s in range(2):
            with gzip.open(os.path.join(tmp, f"SAMPLE{s}.vcf.gz"), "wt") as fh:
                fh.write("##fileformat=VCFv4.1\n#CHROM\tPOS\n")
                for i in range(30):
                    pos = 500 + 10 * i
                    chrom = ["1", "X", "MT"][i % 3]
                    if i % 4 == 0:
                        fh.write(
                            f"{chrom}\t{pos}\t.\tA\tG,<NON_REF>\t99\tPASS\tCADD13_PHRED=12.5"
                            f"\tGT:AD:DP:GQ:PL:SB\t0/1:7,3:30:80:58,0:1,2\n"
                        )
                    else:
                        fh.write(
                            f"{chrom}\t{pos}\t.\tC\t<NON_REF>\t99\tPASS\tEND={pos + 9}"
                            f"\tGT:DP:GQ:MIN_DP:PL\t0/0:40:60:35:0,0\n"
                        )
        try:
            os.rename(tmp, d)
        except OSError:
            pass  # another process published first; identical content
    return d


@query("scan-text-vcf")  # generated text input → rows-only check
def scan_text_vcf(spark, sf):
    from genpipe_spark.sources.vcf import scan_vcf_text

    return scan_vcf_text(spark, f"{_vcf_fixture_dir()}/*.vcf.gz")


@query("scan-text-annotation")  # generated text input → rows-only check
def scan_text_annotation(spark, sf):
    from genpipe_spark.sources.vcf import scan_annotation_text

    d = os.path.join(tempfile.gettempdir(), "genpipe_umd_fixture_v1")
    path = os.path.join(d, "chrom1.annotated")
    if not os.path.isfile(path):
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d)
        with os.fdopen(fd, "w") as fh:
            fh.write("NB_LINES 4\n")
            for i, phrase in enumerate(
                ["Pathogenic", "Polymorphism", "Probably pathogenic", "Probable polymorphism"]
            ):
                fh.write(f"chr1\t{1000 + i}\t.\t.\tA\tG\tx\t{phrase}\n")
        os.replace(tmp, path)  # atomic publish
    return scan_annotation_text(spark, path)


@query("source-filestream")  # streaming file source, availableNow → rows-only
def source_filestream(spark, sf):
    from genpipe_spark.streaming.ingest import stream_vcf_ingest

    src = _vcf_fixture_dir()
    out = tempfile.mkdtemp(prefix="genpipe_stream_out_")
    q = stream_vcf_ingest(
        spark,
        src,
        os.path.join(out, "data"),
        checkpoint=os.path.join(out, "ckpt"),
        trigger_seconds=None,
    )
    q.awaitTermination(300)
    return spark.read.parquet(os.path.join(out, "data"))


@query("row-sample-parser")  # generated text input → rows-only check;
# exact-value coverage lives in tests/test_genomics.py::test_sample_parse_e2e
def row_sample_parser(spark, sf):
    from genpipe_spark.functions.variant import sample_parse
    from genpipe_spark.sources.vcf import scan_vcf_text

    raw = scan_vcf_text(spark, f"{_vcf_fixture_dir()}/*.vcf.gz").withColumn(
        "chrom", F.col("chrom_n").cast("string")
    )
    parsed = sample_parse(raw)
    return parsed.select(
        "chrom",
        "pos",
        "end_pos",
        "ref",
        "alt",
        "indel",
        F.col("sample.gt").alias("gt"),
        F.col("sample.dp").alias("dp"),
        F.col("sample.gq").alias("gq"),
        F.col("sample.sampleId").alias("sample_id"),
        F.col("predictions.CADD_phred").alias("cadd"),
    )


@query(
    "sink-parquet-partitioned",
    """
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_totalprice > 100000
    """,
)
def sink_parquet_partitioned(spark, sf):
    # write→read roundtrip through the partitioned stage-table sink must
    # preserve rows exactly (partition column recovered by discovery)
    from genpipe_spark.sources.sinks import write_parquet_partitioned

    df = (
        t(spark, sf, "orders")
        .where(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )
    dest = tempfile.mkdtemp(prefix="genpipe_sink_pq_")
    write_parquet_partitioned(df, dest, ("o_orderstatus",))
    back = spark.read.parquet(dest)
    return back.select(
        "o_orderkey", "o_totalprice", F.col("o_orderstatus").cast("string").alias("o_orderstatus")
    )


@query(
    "stream-sessionize-batch",
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1, TIMESTAMP '1970-01-01')
                    OVER (PARTITION BY user_id ORDER BY ts)) > 600000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           count(*) AS n_events,
           sum(CAST(round(value*100) AS BIGINT))/100.0 AS value_sum
    FROM sessions GROUP BY user_id, session_id
    """,
)
def stream_sessionize_batch(spark, sf):
    # gaps-and-islands session windows (batch semantics of the stateful
    # operator; exact value match incl. microsecond timestamps)
    from pyspark.sql import Window

    events = t(spark, sf, "events").select("ts", "user_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = events.withColumn(
        "new_session",
        (
            F.unix_micros("ts")
            - F.lag(F.unix_micros("ts"), 1, -(10**18)).over(w)
            > 600_000_000
        ).cast("int"),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return marked.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("value_sum"),
    ).drop("session_id")


@query("stream-sessionize")  # real stateful streaming op → rows-only check
def stream_sessionize(spark, sf):
    from genpipe_spark.streaming.stateful import sessionize
    from genpipe_spark.tables import load

    events = load(spark, sf, "events").select("ts", "user_id", "value")
    src = tempfile.mkdtemp(prefix="genpipe_sess_src_")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out_dir = tempfile.mkdtemp(prefix="genpipe_sess_out_")
    q = (
        sessionize(stream, gap="10 minutes", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(f"{out_dir}/data")


@query("pipeline-parse-bulk")  # rows-only: genomics parse throughput probe
def pipeline_parse_bulk(spark, sf):
    # the parser stage (scan → sample_parse → quality gate) over a
    # generated 50k-row cohort — the genomics hot path the bench tracks
    from genpipe_spark.functions.variant import sample_parse
    from genpipe_spark.sources.fixtures import vcf_fixture_dir
    from genpipe_spark.sources.vcf import scan_vcf_text

    d = vcf_fixture_dir(n_samples=2, n_sites=25000, tag="bulk")
    raw = scan_vcf_text(spark, f"{d}/*.vcf.gz").withColumn(
        "chrom", F.col("chrom_n").cast("string")
    )
    parsed = sample_parse(raw)
    return parsed.where(
        (~F.col("sample.multiallelic"))
        & (F.col("sample.dp") > 7)
        & (F.col("sample.gq") > 19)
    )
