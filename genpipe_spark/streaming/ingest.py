"""Structured Streaming ingest (SURVEY.md §2.8).

The reference's DStream variant (StreamGenomicsLoader.scala:14-54):
60 s textFileStream → header filter → split/typed map → foreachRDD with a
``toDebugString`` filename hack → per-file parquet write. Re-expressed:

  - one incremental Catalyst plan: ``readStream.text`` + the SAME column
    expressions as the batch scan (code reuse by construction —
    scan_vcf_text's projection is shared);
  - ``input_file_name()`` replaces the debugString hack;
  - partitioned parquet sink with checkpointing; trigger configurable
    (60 s processing-time like the reference, or availableNow for
    catch-up/batch-drain runs);
  - additive capability the reference lacks: watermarked event-time
    windowed aggregation (demonstrated on the events fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from genpipe_spark.functions.parse import chrom_normalize
from genpipe_spark.sources.vcf import VCF_COLUMNS


def stream_vcf_ingest(
    spark: SparkSession,
    source_dir: str,
    dest: str,
    checkpoint: str,
    trigger_seconds: int | None = 60,
) -> StreamingQuery:
    """Micro-batch file-arrival ingest: text files → parsed typed rows →
    parquet partitioned by chrom (stream-ingest + stream-foreachbatch-write)."""
    lines = (
        spark.readStream.option("maxFilesPerTrigger", 100)
        .text(source_dir)
        .where(~F.col("value").startswith("#"))
    )
    cols = F.split(F.col("value"), "\t")
    parsed = lines.select(
        *[
            F.try_element_at(cols, F.lit(i + 1)).alias(name)
            for i, name in enumerate(VCF_COLUMNS)
        ],
        F.input_file_name().alias("__file"),
    ).select(
        chrom_normalize(F.col("chrom")).alias("chrom_n"),
        F.col("pos").cast("long").alias("pos"),
        "id",
        "ref",
        "alt",
        "info",
        "format",
        "sample",
        F.regexp_extract(
            F.regexp_extract(F.col("__file"), r"([^/]+)$", 1), r"^([^.]+)", 1
        ).alias("sample_id"),
    )
    writer = (
        parsed.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
        .partitionBy("chrom_n")
        .outputMode("append")
    )
    if trigger_seconds is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def stream_windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Additive generic capability: watermarked tumbling-window counts per
    event type (no equivalent in the reference — SURVEY.md §2.8 note).
    Works identically on a batch DataFrame (for oracle checks) and a
    streaming one."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("value_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def stream_to_es(
    parsed_stream: DataFrame,
    nodes: str,
    index: str,
    checkpoint: str,
    id_col: str | None = None,
    batch_docs: int = 500,
) -> StreamingQuery:
    """Streaming Elasticsearch sink: foreachBatch over the SAME
    distributed HTTP ``_bulk`` writer the batch path uses
    (sources/sinks.write_es_bulk_http) — the reference's streaming
    ``toElastic`` leg (StreamGenomicsLoader.scala:34-47 feeding
    GenomicsLoader's saveToEs) with batch/stream sink code shared by
    construction. Delivery is at-least-once across micro-batch replays;
    pass ``id_col`` so replays are idempotent upserts."""
    from genpipe_spark.sources.sinks import write_es_bulk_http

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_es_bulk_http(
            batch_df, nodes, index, id_col=id_col, batch_docs=batch_docs
        )

    return (
        parsed_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_events(
    events_stream: DataFrame,
    key_cols: list[str] = ("event_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps state
    only for the watermark horizon — bounded state for an unbounded
    stream (the streaming sibling of operators/dedup.exact_dedup)."""
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_vcf_ingest_foreachbatch(
    spark: SparkSession,
    source_dir: str,
    dest: str,
    checkpoint: str,
) -> StreamingQuery:
    """foreachBatch variant of the ingest sink (stream-foreachbatch-write):
    each micro-batch is written through the SAME batch sink used by the
    pipeline runner (write_parquet_partitioned) — batch/stream sink code
    shared by construction, replacing the reference's foreachRDD
    (StreamGenomicsLoader.scala:34-47)."""
    from genpipe_spark.sources.sinks import write_parquet_partitioned

    lines = spark.readStream.text(source_dir).where(~F.col("value").startswith("#"))
    cols = F.split(F.col("value"), "\t")
    parsed = lines.select(
        chrom_normalize(F.try_element_at(cols, F.lit(1))).alias("chrom_n"),
        F.try_element_at(cols, F.lit(2)).cast("long").alias("pos"),
        F.input_file_name().alias("src_file"),
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_parquet_partitioned(batch_df, dest, ("chrom_n",), mode="append")

    return (
        parsed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_enrich_static(
    events_stream: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream–static enrichment join: each micro-batch joins against a
    dimension table — the standard lookup-enrichment shape. The
    dimension is re-read per micro-batch by Structured Streaming, so
    slowly-changing dims pick up updates without restarting the query.
    Works identically on a batch frame for oracle checks.

    ``broadcast_dim`` (default True) forces the broadcast so the stream
    side never shuffles — correct for bounded lookup dims. Pass False
    for an SF-growing dim: the per-batch join then shuffles both sides
    (or AQE broadcasts when the dim turns out small)."""
    dim_side = F.broadcast(dim) if broadcast_dim else dim
    return events_stream.join(dim_side, on, "left")


def stream_interval_self_join(
    events: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream–stream self-join: pair each event with the events of the
    SAME user in the following ``horizon`` (click→conversion attribution
    shape). Both sides are watermarked and the join carries an explicit
    event-time interval condition, so Spark bounds the buffered state to
    watermark + horizon — the at-scale requirement for any stream-stream
    join (an unconstrained join would buffer both streams forever).
    Works identically on batch frames for the oracle check."""
    a = events.select(
        F.col("user_id"),
        F.col("event_id").alias("event_a"),
        F.col("ts").alias("ts_a"),
    ).withWatermark("ts_a", watermark)
    b = events.select(
        F.col("user_id"),
        F.col("event_id").alias("event_b"),
        F.col("ts").alias("ts_b"),
    ).withWatermark("ts_b", watermark)
    return a.join(
        b,
        (a["user_id"] == b["user_id"])
        & (F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"INTERVAL {horizon}")),
    ).select(a["user_id"], "event_a", "event_b", "ts_a", "ts_b")


def stream_incremental_dedup(
    docs_stream: DataFrame,
    corpus: DataFrame,
    dest: str,
    index_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> StreamingQuery:
    """Streaming incremental near-dedup — the production ingest shape:
    each micro-batch of incoming documents dedups against the persisted
    corpus LSH index (and within itself) through the SAME
    ``incremental_dedup_keep`` operator the batch path uses, then
    survivors AND their index rows append to the corpus state, so a
    near-dup arriving two micro-batches after its original is still
    caught. Per-batch cost stays O(batch bands + collisions) — the
    accumulated corpus is never re-paired against itself.

    State layout (both plain parquet, partitionable at scale):
      - ``dest``: accepted documents (id, text) appended per batch;
      - ``index_dir``: (id, band, bucket) LSH rows — bootstrap-written
        from ``corpus`` here, then appended per batch.

    Delivery is at-least-once across micro-batch replays; a replayed
    batch is harmless for ACCEPTANCE because a doc whose id is already
    in the index pairs with itself at jaccard 1 and is dropped
    (the re-submitted-id hardening in incremental_minhash_pairs),
    though its dest append may duplicate rows — readers of ``dest``
    should dedupe by id, or compact with exact_dedup."""
    from genpipe_spark.operators.dedup import incremental_dedup_keep, minhash_index

    minhash_index(corpus, text_col, id_col, num_hashes, bands, k).write.mode(
        "overwrite"
    ).parquet(index_dir)
    corpus.select(id_col, text_col).limit(0).write.mode("overwrite").parquet(dest)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        idx = s.read.parquet(index_dir)
        known = corpus.select(id_col, text_col).unionByName(s.read.parquet(dest))
        keep = incremental_dedup_keep(
            batch_df.select(id_col, text_col),
            known,
            idx,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            k=k,
        ).localCheckpoint()  # eager: both writes below see one snapshot
        keep.write.mode("append").parquet(dest)
        minhash_index(keep, text_col, id_col, num_hashes, bands, k).write.mode(
            "append"
        ).parquet(index_dir)

    return (
        docs_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_sliding_event_counts(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window counts per event type: each event contributes to
    width/slide overlapping windows (``F.window`` with a slide —
    Spark's Expand replicates rows BEFORE the partial agg, so state per
    task stays bounded by live windows × groups, not by events).
    Works identically on a batch frame for the oracle check."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "value_sum"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def stream_cms_merge(
    keys_stream: DataFrame,
    key_col: str,
    state_dir: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 1024,
) -> StreamingQuery:
    """Streaming Count-Min maintenance: each micro-batch's sketch is
    cell-wise merged (operators/sketch.cms_merge — exact) into a
    persisted sketch table, so hot-key estimates over the full history
    cost d·w rows of state however long the stream runs.

    State layout: versioned parquet dirs ``state_dir/v{batch_id}`` plus
    a CURRENT pointer file (atomic rename; on an object store this
    would be a manifest commit). EXACTLY-ONCE per batch: the pointer
    records the last merged batch id, and a replayed batch whose id is
    ≤ CURRENT's is skipped — so a crash between pointer swap and
    checkpoint commit cannot double-count, and a crash before the swap
    just rebuilds the same version dir idempotently."""
    import os

    from genpipe_spark.operators.sketch import cms_merge, cms_sketch

    os.makedirs(state_dir, exist_ok=True)
    ptr = os.path.join(state_dir, "CURRENT")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur_id = -1
        if os.path.exists(ptr):
            cur_id = int(open(ptr).read().strip().lstrip("v"))
        if cur_id >= batch_id:
            return  # replay of an already-merged batch
        batch_sk = cms_sketch(batch_df, key_col, depth, width)
        if cur_id >= 0:
            existing = spark.read.parquet(os.path.join(state_dir, f"v{cur_id}"))
            batch_sk = cms_merge(existing, batch_sk)
        batch_sk.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )
        tmp = ptr + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(f"v{batch_id}")
        os.replace(tmp, ptr)  # atomic publish
        # prune superseded versions (ALL of them, not just the direct
        # predecessor, so a crash between swap and prune can't leak dirs
        # forever) — state stays O(d*w), not O(#batches)
        import shutil

        for entry in os.listdir(state_dir):
            if (
                entry.startswith("v")
                and entry[1:].isdigit()
                and int(entry[1:]) < batch_id
            ):
                shutil.rmtree(os.path.join(state_dir, entry), ignore_errors=True)

    return (
        keys_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_cdc_apply(
    changes_stream: DataFrame,
    snapshot: DataFrame,
    dest: str,
    checkpoint: str,
    key_cols,
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> StreamingQuery:
    """Streaming MERGE maintenance — the incremental-ingest loop the
    CDC family exists for: micro-batches of change rows continuously
    reconcile a persisted snapshot through the SAME latest-by-sequence
    semantics as the batch :func:`operators.cdc.merge_apply`.

    State design (ORDER-INDEPENDENT across micro-batches): ``dest``
    stores the latest change per key seen so far — payload + its
    ``seq_col`` + ``op_col`` — INCLUDING delete tombstones. Each batch
    unions the stored heads with the new rows and re-collapses
    latest-per-key (one keyed window), so a change arriving with an
    OLDER sequence in a LATER micro-batch can never overwrite a newer
    state, and a late upsert cannot resurrect a key a tombstone
    already deleted at a higher sequence. The final state therefore
    equals batch ``merge_apply`` of ALL changes regardless of how the
    stream was micro-batched (tested). The live snapshot is
    ``read.parquet(dest).where(op != delete_op)`` minus the seq/op
    bookkeeping columns.

    Bootstrap: snapshot rows enter as upserts at sequence -2^62
    (before any real CDC sequence) — ONLY when ``dest`` does not
    already hold state: a restart with an existing checkpoint resumes
    from the persisted state instead of wiping applied changes while
    the source skips already-processed batches (round-6 review).
    Sequence ties between a delete and an upsert break by ``op``
    descending, exactly merge_apply's documented tie-break (this
    assumes the delete op sorts below 'U' — true for 'D'; a
    ``delete_op`` >= 'U' is rejected).

    Durability: each state update writes to a staging directory and
    swaps it in (delete + rename). A crash mid-swap (dest deleted,
    rename not yet run) is healed AUTOMATICALLY at the next start:
    staging-present + dest-missing can only arise after the staging
    write completed, so startup finishes the rename before anything
    else — never re-bootstrapping over applied changes (round-7
    review). True reader-atomicity still needs a table format (the
    documented trade-off). Per-batch cost: one keyed window over
    |state| + |batch| rows; at scale partition ``dest`` by a key
    prefix and swap the full rewrite for plans/export.
    incremental_export-style dirty-partition rewrites. Delivery is
    idempotent under micro-batch replay (re-collapsing the same rows
    is a fixpoint)."""
    keys = list(key_cols)
    payload = snapshot.columns
    from pyspark.sql import Window

    if delete_op >= "U":
        raise ValueError(
            f"stream_cdc_apply: delete_op {delete_op!r} must sort below "
            "'U' for the seq-tie break to match merge_apply"
        )
    spark = snapshot.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def _path(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = _path(dest).getFileSystem(hconf)
    staging = dest.rstrip("/") + "__staging"
    # Crash recovery BEFORE the bootstrap check: a crash between
    # fs.delete(dest) and fs.rename(staging, dest) leaves dest missing
    # with the COMPLETE new state sitting in staging (the delete only
    # runs after the staging write returned). Re-bootstrapping from the
    # original snapshot here would silently lose every applied change —
    # the checkpoint skips already-processed batches and the next
    # batch's staging overwrite destroys the recovery copy (round-7
    # review). Completing the swap is always safe: staging-present +
    # dest-missing can ONLY arise post-delete, i.e. staging is a fully
    # committed state.
    if fs.exists(_path(staging)) and not fs.exists(_path(dest)):
        fs.rename(_path(staging), _path(dest))
    if not fs.exists(_path(dest)):
        snapshot.withColumn(seq_col, F.lit(-(2**62))).withColumn(
            op_col, F.lit("U")
        ).write.mode("overwrite").parquet(dest)
    cols = payload + [seq_col, op_col]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        cur = s.read.parquet(dest).select(*cols)
        merged = cur.unionByName(batch_df.select(*cols))
        w = Window.partitionBy(*keys).orderBy(
            F.col(seq_col).desc(), F.col(op_col).desc()
        )
        head = (
            merged.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        # stage-and-swap: the previous state stays intact until the
        # full new state is durably written
        head.write.mode("overwrite").parquet(staging)
        fs.delete(_path(dest), True)
        fs.rename(_path(staging), _path(dest))

    return (
        changes_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_interval_left_join(
    clicks: DataFrame,
    conversions: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click pairs with the same
    user's conversions in the following ``horizon``; clicks with NO
    conversion emit once with NULL conversion columns — but only after
    the watermark passes ts_click + horizon, when Spark can PROVE no
    match can still arrive (the semantics that make outer results
    correct under late data instead of speculative). Both sides are
    watermarked and the join carries the event-time range condition,
    so state stays bounded by watermark + horizon exactly like the
    inner form (stream_interval_self_join). In batch mode withWatermark
    is a no-op and this is a plain left join — the oracle twin.

    At-scale note: outer-NULL emission lags the data by up to
    watermark + horizon by design; a drained availableNow run emits
    tail unmatched clicks only if later input advanced the watermark
    past them (the e2e test's sentinel-flush pattern)."""
    a = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("ts_click"),
    ).withWatermark("ts_click", watermark)
    b = conversions.select(
        F.col("user_id").alias("__uid_b"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("ts_conv"),
    ).withWatermark("ts_conv", watermark)
    return a.join(
        b,
        (a["user_id"] == b["__uid_b"])
        & (F.col("ts_conv") > F.col("ts_click"))
        & (F.col("ts_conv") <= F.col("ts_click") + F.expr(f"INTERVAL {horizon}")),
        "left_outer",
    ).select("user_id", "click_id", "ts_click", "conv_id", "ts_conv")


def trending_topk(counts: DataFrame, k: int = 2) -> DataFrame:
    """Trending view over sliding-window counts: the top-``k`` event
    types per window by count (ties broken by event_type — total order,
    deterministic). This is the SERVING-layer step of a streaming
    trending dashboard: the stream maintains the additive counts
    (stream_sliding_event_counts — append mode, watermark-closed
    windows only), and the rank runs over the SINK table per refresh,
    because a rank inside an append-mode stream would need the whole
    window's final state before emitting (exactly what the watermark
    close already guarantees for the counts). Works identically on the
    batch twin, which is what the oracle checks."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"trending_topk: k {k} must be >= 1")
    w = Window.partitionBy("win_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("win_start", "event_type", "n_events", "rnk")
    )
