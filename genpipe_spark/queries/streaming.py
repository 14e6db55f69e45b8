"""Streaming + source/sink queries()/oracle_sql() twins (SURVEY.md §2.1,
§2.8).

`stream-window-agg` runs the streaming windowed aggregation in batch mode
(identical plan semantics) so DuckDB's time_bucket can oracle it.
File-source / sink twins live in queries/sources.py (VALUES-literal
oracles over the deterministic text fixture)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from genpipe_spark.registry import query
from genpipe_spark.queries.common import t, widen


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


@query(
    "stream-stream-interval-join",
    """
    SELECT a.user_id,
           a.event_id AS event_a,
           b.event_id AS event_b,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_a,
           strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '10 minutes'
    """,
)
def stream_stream_interval_join(spark, sf):
    # batch twin of the watermarked stream-stream self-join
    # (streaming/ingest.py:160): withWatermark is a no-op in batch, so
    # the SAME operator runs here with identical join semantics and the
    # oracle checks exact pair-level values. The streaming e2e path
    # (state bounded by watermark + horizon) is pytest-covered.
    from genpipe_spark.streaming.ingest import stream_interval_self_join

    pairs = stream_interval_self_join(t(spark, sf, "events"), horizon="10 minutes")
    return pairs.select(
        "user_id",
        "event_a",
        "event_b",
        F.date_format("ts_a", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_a"),
        F.date_format("ts_b", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_b"),
    )


@query("pipeline-parse-bulk")  # rows-only: genomics parse throughput probe
def pipeline_parse_bulk(spark, sf):
    # the parser stage (scan → sample_parse → quality gate) over a
    # generated 50k-row cohort — the genomics hot path the bench tracks
    from genpipe_spark.functions.variant import sample_parse
    from genpipe_spark.sources.fixtures import vcf_fixture_dir
    from genpipe_spark.sources.vcf import scan_vcf_text

    d = vcf_fixture_dir(n_samples=2, n_sites=25000, tag="bulk")
    # gzip text is unsplittable — parallelism equals file count until the
    # rows are redistributed; widen() before the expensive parse tree
    raw = widen(
        scan_vcf_text(spark, f"{d}/*.vcf.gz").withColumn(
            "chrom", F.col("chrom_n").cast("string")
        )
    )
    parsed = sample_parse(raw)
    gated = parsed.where(
        (~F.col("sample.multiallelic"))
        & (F.col("sample.dp") > 7)
        & (F.col("sample.gq") > 19)
    )
    # flatten to scalars: the full nested tree is still computed (nothing
    # prunes effects/predictions — freq/cadd are read), but the OUTPUT has
    # no top-level struct/array so the driver canonicalizer can hash it
    return gated.select(
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
        F.size(F.col("effects")).alias("n_effects"),
        F.col("predictions.CADD_phred").alias("cadd"),
        F.col("populations.gp1_af").alias("gp1_af"),
    )


@query(
    "stream-sliding-window-agg",
    """
    WITH expanded AS (
      SELECT to_timestamp(CAST(floor(epoch(ts)/300) AS BIGINT)*300 - k.k*300) AS ws,
             event_type, value
      FROM events, unnest(range(0, 2)) k(k)
      WHERE ts IS NOT NULL
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
           count(*)::BIGINT AS n_events,
           sum(cast(round(value*100) AS BIGINT))/100.0 AS value_sum
    FROM expanded GROUP BY ws, event_type
    """,
)
def stream_sliding_window_agg(spark, sf):
    """Sliding windows (width 10 min, slide 5 min): every event lands in
    exactly width/slide = 2 overlapping epoch-aligned windows. The
    DuckDB twin replicates each event across its k window offsets
    explicitly — the same expansion Spark's window() Expand performs —
    then aggregates identically (money-cents sums)."""
    from genpipe_spark.streaming.ingest import stream_sliding_event_counts

    return stream_sliding_event_counts(t(spark, sf, "events"))


@query("stream-zscore")  # real stateful streaming op → rows-only check;
# the exact batch-equality proof is test_stream_zscore_matches_batch and
# the batch twin (timeseries-anomaly) is the oracle-checked form
def stream_zscore_query(spark, sf):
    from genpipe_spark.streaming.stateful import stream_zscore
    from genpipe_spark.tables import load

    events = load(spark, sf, "events").select(
        "ts", "user_id", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("xc"),
    )
    src = tempfile.mkdtemp(prefix="genpipe_zs_src_")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out_dir = tempfile.mkdtemp(prefix="genpipe_zs_out_")
    q = (
        stream_zscore(stream)
        .writeStream.format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(f"{out_dir}/data")


@query("stream-group-sample")  # real stateful streaming op → rows-only;
# batch-equality proof: test_stream_group_sample_matches_batch_quota
def stream_group_sample_query(spark, sf):
    from genpipe_spark.streaming.stateful import stream_group_sample
    from genpipe_spark.tables import load

    docs = load(spark, sf, "documents").select("source", "doc_id")
    src = tempfile.mkdtemp(prefix="genpipe_gs_src_")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out_dir = tempfile.mkdtemp(prefix="genpipe_gs_out_")
    q = (
        stream_group_sample(stream, "source", quota=10)
        .writeStream.format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(f"{out_dir}/data")
