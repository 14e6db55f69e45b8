"""End-to-end tests for sources, sinks, the staged pipeline runner, and
streaming ingest — the reference's test layers 3-4 (golden counts through
stage sequence, gzToParquetSpec.scala) on hermetic synthetic fixtures."""

from __future__ import annotations

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

HEADER = "##fileformat=VCFv4.1\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA0000%d\n"

ANN = (
    "G|missense_variant|MODERATE|GENE1|G1|transcript|TX000001|"
    "protein_coding|3/10|c.1A>G|p.Thr2Ala|10/1000|2/500|100/333|x"
)


def _vcf_line(chrom, pos, ref, alt, info, fmt, sample):
    return f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t100\tPASS\t{info}\t{fmt}\t{sample}\n"


def make_vcf_fixture(tmpdir: str, n_samples: int = 2, n_sites: int = 50) -> list[str]:
    """Deterministic per-sample gVCF-ish files: SNPs with annotations,
    <NON_REF> blocks covering them, some 0/0 and low-quality rows."""
    paths = []
    for s in range(n_samples):
        path = os.path.join(tmpdir, f"NA0000{s}.vcf.gz")
        with gzip.open(path, "wt") as fh:
            fh.write(HEADER % s)
            for i in range(n_sites):
                pos = 1000 + i * 10
                chrom = "1" if i % 2 == 0 else "X"
                if i % 5 == s % 5:
                    # variant site with annotations
                    fh.write(
                        _vcf_line(
                            chrom, pos, "A", "G,<NON_REF>",
                            f"dbNSFP_SIFT_pred=D;CADD13_PHRED=10.5;ANN={ANN}",
                            "GT:AD:DP:GQ:PL:SB", "0/1:7,3:30:80:58,0:1,2",
                        )
                    )
                elif i % 7 == 0:
                    # low quality: dp gate drops it (dp=5)
                    fh.write(
                        _vcf_line(
                            chrom, pos, "C", "T,<NON_REF>", "X=1",
                            "GT:AD:DP:GQ:PL:SB", "0/1:3,2:5:80:9,0:1,1",
                        )
                    )
                else:
                    # reference block spanning 10 positions
                    fh.write(
                        _vcf_line(
                            chrom, pos, "C", "<NON_REF>", f"END={pos + 9}",
                            "GT:DP:GQ:MIN_DP:PL", "0/0:40:60:35:0,0",
                        )
                    )
        paths.append(path)
    return paths


@pytest.fixture(scope="module")
def vcf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vcf")
    make_vcf_fixture(str(d))
    return str(d)


def test_scan_vcf_text(spark, vcf_dir):
    from genpipe_spark.sources.vcf import scan_vcf_text

    df = scan_vcf_text(spark, f"{vcf_dir}/*.vcf.gz")
    rows = df.collect()
    assert len(rows) == 100  # 2 samples × 50 sites, headers dropped
    assert {r["sample_id"] for r in rows} == {"NA00000", "NA00001"}
    assert {r["chrom_n"] for r in rows} == {1, 24}  # X normalized to 24
    assert all(r["pos"] >= 1000 for r in rows)


def test_scan_annotation_text(spark, tmp_path):
    from genpipe_spark.sources.vcf import scan_annotation_text

    p = tmp_path / "chrom1.annotated"
    p.write_text(
        "NB_LINES 3\n"
        "chr1\t1000\t.\t.\tA\tG\tx\tPathogenic\n"
        "chr1\t2000\t.\t.\tC\tT\tx\n"  # 7 cols → umd ""
        "chr1\t3000\t.\t.\tG\tA\tx\tPolymorphism\n"
    )
    out = scan_annotation_text(spark, str(p)).orderBy("pos").collect()
    assert [(r["chrom"], r["pos"], r["umd"]) for r in out] == [
        ("1", 1000, "D"), ("1", 2000, ""), ("1", 3000, "B"),
    ]


def test_pipeline_end_to_end(spark, vcf_dir, tmp_path):
    from genpipe_spark.plans.pipeline import PipelineContext, build_genomics_pipeline

    p = build_genomics_pipeline()
    ctx = PipelineContext(
        dest=str(tmp_path / "stages"),
        conf={"vcf_paths": f"{vcf_dir}/*.vcf.gz", "band_width": 50},
    )
    p.run(spark, ctx)

    loaded = spark.read.parquet(ctx.path("loaded"))
    assert loaded.count() == 100
    parsed = spark.read.parquet(ctx.path("parsedSamples"))
    # low-quality rows (dp=5) gated out; everything else passes (gq 45/60)
    assert 0 < parsed.count() < 100
    assert parsed.where(F.col("sample.dp") <= 7).count() == 0

    variants = spark.read.parquet(ctx.path("variants"))
    vrows = variants.collect()
    assert len(vrows) > 0
    # each variant site: its own sample + any overlapping ref-block sample
    for r in vrows:
        assert 1 <= len(r["samples"]) <= 2
        assert 0 < r["freqInt"] <= 1.0

    # partition layout is directory-encoded and recoverable
    assert any("chrom=" in d for d in os.listdir(ctx.path("variants")))


def test_interval_swap_matches_block_cover(spark, vcf_dir, tmp_path):
    """The swap stage must attach exactly the ref-block samples whose
    [pos, end_pos] covers each variant position (reference golden idiom,
    gzToParquetSpec ranges count)."""
    from genpipe_spark.plans.pipeline import PipelineContext, build_genomics_pipeline

    p = build_genomics_pipeline()
    ctx = PipelineContext(
        dest=str(tmp_path / "stages"),
        conf={"vcf_paths": f"{vcf_dir}/*.vcf.gz", "band_width": 50},
    )
    p.run(spark, ctx, ["load", "parser", "swap"])
    parsed = spark.read.parquet(ctx.path("parsedSamples"))
    swapped = spark.read.parquet(ctx.path("rangesSwap")).collect()

    blocks = parsed.where(F.col("alt") == "<NON_REF>").select(
        "chrom", "pos", "end_pos", F.col("sample.sampleId").alias("sid")
    ).collect()
    variants = parsed.where(F.col("alt") != "<NON_REF>").select(
        "chrom", "pos", "ref", "alt"
    ).distinct().collect()
    expected = {
        (v["chrom"], v["pos"], b["sid"])
        for v in variants
        for b in blocks
        if b["chrom"] == v["chrom"] and b["pos"] <= v["pos"] <= b["end_pos"]
    }
    got = {(r["chrom"], r["pos"], r["sample"]["sampleId"]) for r in swapped}
    assert got == expected and expected


def test_sinks(spark, tmp_path):
    from genpipe_spark.sources.sinks import (
        write_es_shaped,
        write_parquet_partitioned,
        write_single_tsv,
    )

    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("chrom"),
        (F.col("id") * 2).alias("pos"),
    )
    dest = str(tmp_path / "pq")
    write_parquet_partitioned(df, dest, ("chrom",))
    assert sorted(d for d in os.listdir(dest) if d.startswith("chrom=")) == [
        "chrom=0", "chrom=1", "chrom=2",
    ]
    # dynamic overwrite: rewriting one partition leaves siblings intact
    write_parquet_partitioned(
        df.where(F.col("chrom") == "0").withColumn("pos", F.lit(0)), dest, ("chrom",)
    )
    back = spark.read.parquet(dest)
    assert back.where("chrom = '1'").count() == 33
    assert back.where("chrom = '0' and pos != 0").count() == 0

    tsv = str(tmp_path / "tsv")
    write_single_tsv(df.limit(10), tsv, ["id", "chrom", "pos"])
    files = [f for f in glob.glob(f"{tsv}/part-*") if not f.endswith(".crc")]
    assert len(files) == 1  # single-file contract
    assert len(open(files[0]).readlines()) == 10

    es = str(tmp_path / "es")
    write_es_shaped(df.limit(5), es, "variants", "v1")
    out = spark.read.json(f"{es}/variants-v1")
    assert out.count() == 5 and set(out.columns) == {"id", "chrom", "pos"}


def test_stream_vcf_ingest_available_now(spark, vcf_dir, tmp_path):
    from genpipe_spark.streaming.ingest import stream_vcf_ingest

    dest = str(tmp_path / "out")
    q = stream_vcf_ingest(
        spark,
        vcf_dir,
        dest,
        checkpoint=str(tmp_path / "ckpt"),
        trigger_seconds=None,  # availableNow: drain existing files, stop
    )
    q.awaitTermination(120)
    out = spark.read.parquet(dest)
    assert out.count() == 100
    assert {r["chrom_n"] for r in out.select("chrom_n").distinct().collect()} == {1, 24}
    assert {r["sample_id"] for r in out.select("sample_id").distinct().collect()} == {
        "NA00000", "NA00001",
    }


def test_stream_windowed_event_counts_matches_oracle(spark):
    """Batch-mode check of the streaming windowed agg against DuckDB
    time_bucket — same rows either way."""
    import duckdb

    from genpipe_spark.streaming.ingest import stream_windowed_event_counts
    from tests.conftest import SF_SMALL
    from tests.oracle_utils import compare

    from genpipe_spark.tables import load

    events = load(spark, SF_SMALL, "events")
    got = stream_windowed_event_counts(events)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'"
    )
    oracle = con.execute(
        """
        SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
               event_type, count(*) AS n_events,
               sum(cast(round(value*100) AS BIGINT))/100.0 AS value_sum
        FROM events GROUP BY 1, 2
        """
    ).fetchdf()
    assert not compare(got, oracle)


def test_read_sample_manifest(tmp_path):
    from genpipe_spark.sources.vcf import read_sample_manifest

    p = tmp_path / "filesList.txt"
    p.write_text("# header\nNA12878\textra\tcols\n\nNA12891\nNA12892\tx\n")
    assert read_sample_manifest(str(p)) == ["NA12878", "NA12891", "NA12892"]


def test_write_table_metastore(spark, tmp_path):
    import uuid

    from genpipe_spark.sources.sinks import write_table

    # unique name: the in-memory catalog forgets tables between sessions but
    # the warehouse directory survives, and saveAsTable refuses orphans
    name = f"t_sink_{uuid.uuid4().hex[:8]}"
    df = spark.range(0, 7).withColumnRenamed("id", "k")
    write_table(df, name)
    assert spark.table(name).count() == 7
    # overwrite semantics (insert overwrite, steps/toElastic.scala:12)
    write_table(df.limit(3), name)
    assert spark.table(name).count() == 3
    spark.sql(f"DROP TABLE {name}")


def test_umd_stages(spark, vcf_dir, tmp_path):
    """UMD annotation flow: prepare TSV → parse annotated responses →
    site-level left join (steps/UMD.scala; golden idiom: the matched site's
    exploded effects carry the letter, every other row carries "")."""
    from genpipe_spark.plans.pipeline import PipelineContext, build_genomics_pipeline

    umd_file = tmp_path / "chrom1.annotated"
    # fixture: variant sites are (A→G); annotate exactly one known pos
    umd_file.write_text("NB_LINES 1\nchr1\t1000\t.\t.\tA\tG\tx\tPathogenic\n")

    p = build_genomics_pipeline()
    ctx = PipelineContext(
        dest=str(tmp_path / "stages"),
        conf={
            "vcf_paths": f"{vcf_dir}/*.vcf.gz",
            "band_width": 50,
            "umd_prepare_dest": str(tmp_path / "umd_input"),
            "umd_annotated_paths": str(umd_file),
        },
    )
    p.run(spark, ctx, ["load", "parser", "umd.prepare", "umd.parse", "umd.join"])

    # prepare: single TSV of distinct HIGH/MODERATE/LOW sites
    import glob as g

    tsv = [f for f in g.glob(str(tmp_path / "umd_input" / "part-*")) if not f.endswith(".crc")]
    assert len(tsv) == 1
    lines = open(tsv[0]).read().splitlines()
    assert lines and all(len(line.split("\t")) == 5 for line in lines)

    joined = spark.read.parquet(ctx.path("effectsUMD"))
    matched = joined.where("pos = 1000 AND alt = 'G'").collect()
    assert matched and all(r["umd"] == "D" for r in matched)
    assert joined.where("pos <> 1000").where("umd <> ''").count() == 0


def test_curation_pipeline_end_to_end(spark, tmp_path):
    """normalize → quality-gate → exact-dedup → near-dedup → featurize on
    the documents fixture: monotone shrinking row counts, near-dup losers
    removed, fingerprints present."""
    from genpipe_spark.plans.curation import build_curation_pipeline
    from genpipe_spark.plans.pipeline import PipelineContext
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents")
    ctx = PipelineContext(dest=str(tmp_path / "cur"), conf={})
    ctx.tables["documents"] = docs
    build_curation_pipeline().run(spark, ctx, collect_metrics=True)
    # per-stage observability: every materialized stage reports rows + time
    assert [m[0] for m in ctx.metrics] == [
        "normalize", "quality", "dedup_exact", "dedup_near", "featurize",
    ]
    assert all(m[1] is not None and m[2] >= 0 for m in ctx.metrics)

    n0 = docs.count()
    n_norm = spark.read.parquet(ctx.path("normalized")).count()
    n_q = spark.read.parquet(ctx.path("quality_gated")).count()
    n_e = spark.read.parquet(ctx.path("exact_unique")).count()
    curated = spark.read.parquet(ctx.path("curated"))
    n_c = curated.count()
    assert n_norm == n0
    assert n0 >= n_q >= n_e >= n_c > 0
    assert n_c < n_e  # the fixture's planted near-dups were removed
    row = curated.first()
    assert row["fp"] is not None and row["n_tokens"] > 0


def test_stream_processing_time_trigger(spark, vcf_dir, tmp_path):
    """The reference's 60 s micro-batch mode (StreamGenomicsLoader): start
    with a processing-time trigger, let >=1 batch commit, stop."""
    import time

    from genpipe_spark.streaming.ingest import stream_vcf_ingest

    dest = str(tmp_path / "out")
    q = stream_vcf_ingest(
        spark, vcf_dir, dest, checkpoint=str(tmp_path / "ckpt"), trigger_seconds=2
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not q.recentProgress:
            time.sleep(1)
        assert q.isActive
    finally:
        q.stop()
    assert spark.read.parquet(dest).count() == 100


def test_stateful_sessionize_matches_batch_oracle(spark, tmp_path):
    """applyInPandasWithState session windows: feed the events fixture
    through a real stream (availableNow), compare CLOSED sessions against
    the batch gaps-and-islands oracle."""
    import shutil

    from genpipe_spark.streaming.stateful import sessionize, sessionize_batch_oracle
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    events = load(spark, SF_SMALL, "events").select("ts", "user_id", "value")
    src = tmp_path / "events_src"
    src.mkdir()
    events.coalesce(1).write.mode("overwrite").parquet(str(src / "batch0"))

    stream = (
        spark.readStream.schema(events.schema).parquet(str(src / "batch0"))
    )
    out = sessionize(stream, gap="10 minutes", watermark="1 hour")
    dest = str(tmp_path / "sessions")
    q = (
        out.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(dest).collect()
    oracle = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch_oracle(events, gap="10 minutes").collect()
    }
    got_set = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got
    }
    # the stream emits only sessions whose timeout passed the final
    # watermark; everything it DID emit must be an exact oracle session
    assert got_set, "expected at least some closed sessions"
    assert got_set <= oracle
    # and most sessions should have closed given the fixture's time span
    assert len(got_set) >= 0.5 * len(oracle), (len(got_set), len(oracle))


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup: duplicated event rows collapse to one per
    key within the watermark horizon."""
    from genpipe_spark.streaming.ingest import stream_dedup_events
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    events = load(spark, SF_SMALL, "events").select("event_id", "ts", "value")
    doubled = events.unionByName(events)  # every event twice
    src = tmp_path / "src"
    doubled.coalesce(1).write.parquet(str(src / "b0"))

    stream = spark.readStream.schema(doubled.schema).parquet(str(src / "b0"))
    out = stream_dedup_events(stream, ["event_id"])
    dest = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(dest)
    assert got.count() == events.count()  # exact one row per event_id
    assert got.select("event_id").distinct().count() == events.count()


def test_stream_foreachbatch_sink(spark, vcf_dir, tmp_path):
    from genpipe_spark.streaming.ingest import stream_vcf_ingest_foreachbatch

    dest = str(tmp_path / "out")
    q = stream_vcf_ingest_foreachbatch(
        spark, vcf_dir, dest, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(dest)
    assert out.count() == 100
    assert {r["chrom_n"] for r in out.select("chrom_n").distinct().collect()} == {1, 24}


def test_stream_enrich_static_matches_batch(spark, tmp_path):
    """Stream-static broadcast enrichment through a real availableNow
    stream must equal the same join run in batch, and the batch plan
    must broadcast the dimension (stream side never shuffles)."""
    from genpipe_spark.streaming.ingest import stream_enrich_static
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    events = load(spark, SF_SMALL, "events").select("event_id", "ts", "user_id")
    dim = (
        events.select("user_id").distinct()
        .withColumn("segment", (F.col("user_id") % 5).cast("int"))
    )
    batch = stream_enrich_static(events, dim)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    src = tmp_path / "src"
    events.coalesce(1).write.parquet(str(src / "b0"))
    dimdest = tmp_path / "dim"
    dim.coalesce(1).write.parquet(str(dimdest))
    stream = spark.readStream.schema(events.schema).parquet(str(src / "b0"))
    out = stream_enrich_static(stream, spark.read.parquet(str(dimdest)))
    dest = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["event_id"], r["segment"])
        for r in spark.read.parquet(dest).collect()
    }
    expect = {(r["event_id"], r["segment"]) for r in batch.collect()}
    assert got == expect


def test_stream_interval_self_join_subset_of_batch(spark, tmp_path):
    """Watermarked stream-stream interval join: every pair the stream
    emits must be a pair the batch form produces, and (availableNow over
    one batch, generous watermark) it must find most of them."""
    from genpipe_spark.streaming.ingest import stream_interval_self_join
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    events = load(spark, SF_SMALL, "events").select("event_id", "ts", "user_id")
    batch_pairs = {
        (r["event_a"], r["event_b"])
        for r in stream_interval_self_join(events).collect()
    }
    assert batch_pairs, "fixture should produce within-horizon pairs"

    src = tmp_path / "src"
    events.coalesce(1).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema(events.schema).parquet(str(src / "b0"))
    out = stream_interval_self_join(stream, watermark="10 days")
    dest = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["event_a"], r["event_b"])
        for r in spark.read.parquet(dest).collect()
    }
    assert got <= batch_pairs
    assert len(got) >= 0.9 * len(batch_pairs), (len(got), len(batch_pairs))


import contextlib


@contextlib.contextmanager
def _mock_es_server():
    """In-process ES stub recording PUT/DELETE/_bulk requests; yields
    (nodes, received)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    received = {"puts": [], "bulks": [], "deletes": []}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n) if n else b""

        def _reply(self, obj, code=200):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_PUT(self):
            with lock:
                received["puts"].append((self.path, json.loads(self._body())))
            self._reply({"acknowledged": True})

        def do_DELETE(self):
            with lock:
                received["deletes"].append(self.path)
            self._reply({}, code=404)  # index didn't exist: must be tolerated

        def do_POST(self):
            body = self._body().decode()
            with lock:
                received["bulks"].append((self.path, body))
            n_items = sum(1 for ln in body.splitlines() if '"index"' in ln)
            self._reply({"errors": False, "items": [{} for _ in range(n_items)]})

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"127.0.0.1:{srv.server_address[1]}", received
    finally:
        srv.shutdown()
        srv.server_close()


def test_es_adapter_http_roundtrip(spark):
    """The ES sink interface demonstrated against a live (mock) HTTP bulk
    endpoint: index DDL (PUT settings + schema-derived nested mapping,
    Elastic/Data.scala:34-93 intent) then distributed _bulk indexing from
    executors (GenomicsLoader.scala:208-213). The stub records every
    request; the docs must round-trip exactly and array-of-struct
    columns must map as type=nested."""
    import json

    from pyspark.sql import Row

    from genpipe_spark.sources.sinks import (
        es_create_index,
        es_delete_index,
        es_mapping_for,
        write_es_bulk_http,
    )

    with _mock_es_server() as (nodes, received):
        df = spark.createDataFrame(
            [
                Row(
                    variant_id=i,
                    chrom=f"chr{1 + i % 2}",
                    effects=[
                        Row(gene=f"g{i}", impact="HIGH"),
                        Row(gene=f"g{i + 1}", impact="LOW"),
                    ],
                    freq=float(i) / 10,
                )
                for i in range(7)
            ]
        ).repartition(3)

        es_delete_index(nodes, "variants")  # 404 must not raise
        mapping = es_mapping_for(df.schema)
        es_create_index(nodes, "variants", mappings=mapping)
        write_es_bulk_http(df, nodes, "variants", id_col="variant_id", batch_docs=2)

        assert received["deletes"] == ["/variants"]
        (path, ddl), = received["puts"]
        assert path == "/variants"
        assert ddl["settings"]["number_of_shards"] == 8
        assert ddl["mappings"]["properties"]["effects"]["type"] == "nested"
        assert ddl["mappings"]["properties"]["effects"]["properties"]["gene"] == {
            "type": "keyword"
        }
        assert ddl["mappings"]["properties"]["freq"] == {"type": "double"}

        # parse back every bulk NDJSON action/doc pair
        docs = {}
        for path, body in received["bulks"]:
            assert path == "/_bulk"
            lines = body.splitlines()
            for action_ln, doc_ln in zip(lines[0::2], lines[1::2]):
                action = json.loads(action_ln)["index"]
                assert action["_index"] == "variants"
                docs[action["_id"]] = json.loads(doc_ln)
        assert len(docs) == 7
        # batch_docs=2 with 7 docs over 3 partitions -> multiple batches
        assert len(received["bulks"]) >= 3
        src = {str(r["variant_id"]): r.asDict(recursive=True) for r in df.collect()}
        assert docs == src


@contextlib.contextmanager
def _flaky_es_server(script):
    """Mock _bulk endpoint driven by a per-request ``script`` list:
    each element handles one incoming bulk request —
      'ok'            index every item (status 201)
      'http500'       whole-request HTTP 500
      'reject:<ids>'  200 response, but items whose _id is in the
                      comma-separated list get status 429, rest 201
      'poison:<ids>'  like reject but status 400 (permanent)
    Extra requests past the script's end are 'ok'. Yields
    (nodes, received) where received['bulks'] holds parsed
    [(id, doc), ...] per request."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    received = {"bulks": []}
    lock = threading.Lock()
    step = {"i": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode()
            lines = body.splitlines()
            pairs = [
                (json.loads(a)["index"].get("_id"), json.loads(d))
                for a, d in zip(lines[0::2], lines[1::2])
            ]
            with lock:
                received["bulks"].append(pairs)
                mode = script[step["i"]] if step["i"] < len(script) else "ok"
                step["i"] += 1
            if mode == "http500":
                self.send_response(500)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            bad_status, bad_ids = 0, set()
            if mode.startswith("reject:"):
                bad_status, bad_ids = 429, set(mode[7:].split(","))
            elif mode.startswith("poison:"):
                bad_status, bad_ids = 400, set(mode[7:].split(","))
            items = [
                {
                    "index": {
                        "status": bad_status if pid in bad_ids else 201,
                        **({"error": {"type": "mock"}} if pid in bad_ids else {}),
                    }
                }
                for pid, _ in pairs
            ]
            data = json.dumps(
                {"errors": any(pid in bad_ids for pid, _ in pairs), "items": items}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"127.0.0.1:{srv.server_address[1]}", received
    finally:
        srv.shutdown()
        srv.server_close()


def test_es_adapter_item_rejection_retries_only_rejected(spark):
    """A 200 _bulk response with per-item 429s must re-send ONLY the
    rejected docs (successes are not replayed within the task) and
    succeed once the endpoint accepts them (VERDICT r4 item 6)."""
    from pyspark.sql import Row

    from genpipe_spark.sources.sinks import write_es_bulk_http

    with _flaky_es_server(["reject:2,4", "ok"]) as (nodes, received):
        df = spark.createDataFrame(
            [Row(doc_id=i, val=f"v{i}") for i in range(6)]
        ).coalesce(1)
        write_es_bulk_http(
            df, nodes, "idx", id_col="doc_id", batch_docs=100, backoff_s=0.01
        )
    assert len(received["bulks"]) == 2
    assert len(received["bulks"][0]) == 6
    # the retry carried exactly the two rejected ids, nothing else
    assert sorted(pid for pid, _ in received["bulks"][1]) == ["2", "4"]


def test_es_adapter_recovers_from_transient_500(spark):
    """A whole-request HTTP 500 must be retried with backoff and succeed
    when the endpoint recovers — without dropping or duplicating docs."""
    from pyspark.sql import Row

    from genpipe_spark.sources.sinks import write_es_bulk_http

    with _flaky_es_server(["http500", "http500", "ok"]) as (nodes, received):
        df = spark.createDataFrame(
            [Row(doc_id=i, val=f"v{i}") for i in range(4)]
        ).coalesce(1)
        write_es_bulk_http(
            df, nodes, "idx", id_col="doc_id", batch_docs=100, backoff_s=0.01
        )
    assert len(received["bulks"]) == 3
    assert all(len(b) == 4 for b in received["bulks"])


def test_es_adapter_poison_doc_fails_loudly(spark):
    """A permanent 400 item rejection must raise immediately (surfacing
    the poison doc) instead of burning the retry budget."""
    from pyspark.sql import Row

    from genpipe_spark.sources.sinks import write_es_bulk_http

    with _flaky_es_server(["poison:1", "poison:1", "poison:1", "poison:1"]) as (
        nodes,
        received,
    ):
        df = spark.createDataFrame(
            [Row(doc_id=i, val=f"v{i}") for i in range(3)]
        ).coalesce(1)
        with pytest.raises(Exception, match="permanently rejected"):
            write_es_bulk_http(
                df, nodes, "idx", id_col="doc_id", batch_docs=100, backoff_s=0.01
            )
    assert len(received["bulks"]) == 1  # no blind replay of the poison batch


def test_es_adapter_batch_bytes_cap(spark):
    """batch_bytes must flush before batch_docs when documents are large,
    bounding request size."""
    from pyspark.sql import Row

    from genpipe_spark.sources.sinks import write_es_bulk_http

    with _flaky_es_server([]) as (nodes, received):
        df = spark.createDataFrame(
            [Row(doc_id=i, val="x" * 2000) for i in range(10)]
        ).coalesce(1)
        write_es_bulk_http(
            df, nodes, "idx", id_col="doc_id",
            batch_docs=1000, batch_bytes=5000, backoff_s=0.01,
        )
    # ~2KB docs with a 5KB cap -> batches of 2-3 docs, never all 10
    assert len(received["bulks"]) >= 4
    assert all(len(b) <= 3 for b in received["bulks"])
    assert sum(len(b) for b in received["bulks"]) == 10


def test_stream_to_es_end_to_end(spark, tmp_path):
    """The reference's streaming story composed end-to-end: text VCF
    files arrive → streaming parse (stream_vcf_ingest expressions) →
    foreachBatch → distributed HTTP _bulk to (mock) Elasticsearch —
    StreamGenomicsLoader.scala:23-47 feeding saveToEs, on Structured
    Streaming + the shared batch sink instead of foreachRDD."""
    import json

    from genpipe_spark.streaming.ingest import stream_to_es

    with _mock_es_server() as (nodes, received):
        src = tmp_path / "src"
        src.mkdir()
        (src / "s1.vcf").write_text(
            "#CHROM\tPOS\n" + "".join(f"chr1\t{100 + i}\n" for i in range(5))
        )
        (src / "s2.vcf").write_text(
            "#CHROM\tPOS\n" + "".join(f"chrX\t{200 + i}\n" for i in range(3))
        )
        lines = spark.readStream.text(str(src)).where(~F.col("value").startswith("#"))
        cols = F.split(F.col("value"), "\t")
        parsed = lines.select(
            F.try_element_at(cols, F.lit(1)).alias("chrom"),
            F.try_element_at(cols, F.lit(2)).cast("long").alias("pos"),
        ).withColumn("site_id", F.concat_ws(":", "chrom", "pos"))
        q = stream_to_es(
            parsed, nodes, "variants", str(tmp_path / "ckpt"),
            id_col="site_id", batch_docs=3,
        )
        q.awaitTermination(300)

        docs = {}
        for path, body in received["bulks"]:
            assert path == "/_bulk"
            lines_ = body.splitlines()
            for action_ln, doc_ln in zip(lines_[0::2], lines_[1::2]):
                docs[json.loads(action_ln)["index"]["_id"]] = json.loads(doc_ln)
        assert len(docs) == 8
        assert docs["chr1:100"] == {"chrom": "chr1", "pos": 100, "site_id": "chr1:100"}
        assert docs["chrX:202"]["pos"] == 202


def test_pipeline_resume_skips_committed_stages(spark, tmp_path):
    """resume=True restarts a staged run from the first incomplete
    stage: committed outputs (_SUCCESS) are re-read, not recomputed;
    removing the marker forces a re-run of that stage only."""
    from pyspark.sql import functions as F

    from genpipe_spark.plans.pipeline import Pipeline, PipelineContext

    calls = {"a": 0, "b": 0}
    p = Pipeline()

    @p.stage("a", output="ta", partition_by=("part",))
    def stage_a(spark_, ctx):
        calls["a"] += 1
        return spark_.range(20).select(
            "id", (F.col("id") % 2).cast("string").alias("part")
        )

    @p.stage("b", output="tb")
    def stage_b(spark_, ctx):
        calls["b"] += 1
        return ctx.tables["ta"].groupBy("part").count()

    ctx = PipelineContext(dest=str(tmp_path))
    p.run(spark, ctx)
    assert calls == {"a": 1, "b": 1}

    # full resume: nothing recomputes, tables come back readable
    ctx2 = PipelineContext(dest=str(tmp_path))
    p.run(spark, ctx2, resume=True, collect_metrics=True)
    assert calls == {"a": 1, "b": 1}
    assert ctx2.tables["tb"].count() == 2
    assert [(m[0], m[1]) for m in ctx2.metrics] == [("a", "resumed"), ("b", "resumed")]

    # partial failure: b's commit marker gone -> only b re-runs
    import os

    os.remove(tmp_path / "v1" / "tb" / "_GENPIPE_COMMITTED")
    ctx3 = PipelineContext(dest=str(tmp_path))
    p.run(spark, ctx3, resume=True)
    assert calls == {"a": 1, "b": 2}


def test_pipeline_rerun_clears_stale_commit_marker(spark, tmp_path):
    """A re-run that crashes mid-stage must not leave last run's commit
    marker behind: partition_by stages write via dynamic partition
    overwrite (dest dir never cleared), so a surviving stale marker
    would make a later resume=True trust a half-overwritten table
    (ADVICE r4). The runner deletes the marker BEFORE stage execution."""
    from pyspark.sql import functions as F

    from genpipe_spark.plans.pipeline import Pipeline, PipelineContext

    boom = {"armed": False}
    calls = {"a": 0}
    p = Pipeline()

    @p.stage("a", output="ta", partition_by=("part",))
    def stage_a(spark_, ctx):
        calls["a"] += 1
        if boom["armed"]:
            raise RuntimeError("simulated mid-stage crash")
        return spark_.range(10).select(
            "id", (F.col("id") % 2).cast("string").alias("part")
        )

    ctx = PipelineContext(dest=str(tmp_path))
    p.run(spark, ctx)  # committed: marker present
    assert (tmp_path / "v1" / "ta" / "_GENPIPE_COMMITTED").exists()

    boom["armed"] = True
    with pytest.raises(RuntimeError, match="simulated"):
        p.run(spark, PipelineContext(dest=str(tmp_path)))
    # the stale marker is gone, so resume does NOT trust the dir ...
    assert not (tmp_path / "v1" / "ta" / "_GENPIPE_COMMITTED").exists()
    boom["armed"] = False
    p.run(spark, PipelineContext(dest=str(tmp_path)), resume=True)
    # ... and the stage actually re-ran (1 initial + 1 crash + 1 resume)
    assert calls["a"] == 3


def test_stream_incremental_dedup_updates_index_across_batches(spark, tmp_path):
    """Streaming incremental near-dedup: micro-batch 1's survivors must
    join the persisted LSH index so that micro-batch 2's near-dup of a
    batch-1 doc is rejected — the property that distinguishes real
    incremental ingest from per-batch-only dedup. Also: a near-dup of
    the ORIGINAL corpus is rejected in any batch, and unique docs pass."""
    import json

    from genpipe_spark.streaming.ingest import stream_incremental_dedup

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    corpus_text = "the quick brown fox jumps over the lazy dog " + base
    doc_c = "spark shuffles partitions across executors while caching " + base
    rows = {
        # batch 1: near-dup of corpus doc 1 (one word appended) + unique C
        "b1": [
            {"doc_id": 10, "text": corpus_text + " extra"},
            {"doc_id": 11, "text": doc_c},
        ],
        # batch 2: near-dup of batch-1 survivor C + a unique doc
        "b2": [
            {"doc_id": 20, "text": doc_c + " tail"},
            {"doc_id": 21, "text": "completely different words entirely " + base.upper()},
        ],
    }
    src = tmp_path / "src"
    src.mkdir()
    import os
    import time as _t

    for i, name in enumerate(["b1", "b2"]):
        p = src / f"{name}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows[name]))
        os.utime(p, (_t.time() + i, _t.time() + i))  # stable batch order

    corpus = spark.createDataFrame(
        [(1, corpus_text), (2, "unrelated corpus document " + base[::-1])],
        "doc_id long, text string",
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream_incremental_dedup(
        stream, corpus, str(tmp_path / "dest"), str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    kept = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "dest")).collect()}
    assert kept == {11, 21}, kept  # 10 ~ corpus, 20 ~ batch-1 survivor 11
    # the index grew by exactly the survivors' band rows (8 bands each)
    idx = spark.read.parquet(str(tmp_path / "index"))
    assert idx.where(F.col("id").isin(11, 21)).count() == 16
    assert idx.where(F.col("id").isin(10, 20)).count() == 0


def test_sliding_window_counts_real_stream(spark, tmp_path):
    """stream_sliding_event_counts on an ACTUAL bounded stream (file
    source, availableNow, append after watermark close) must produce a
    subset of the batch run on the same rows, and every event must fall
    into exactly width/slide = 2 windows."""
    from pyspark.sql import functions as F

    from genpipe_spark.streaming.ingest import stream_sliding_event_counts

    rows = [
        (i, f"2024-01-01 10:{m:02d}:00", "click", 1.0)
        for i, m in enumerate([1, 4, 7, 12, 19, 31])
    ]
    batch = spark.createDataFrame(
        rows, "event_id bigint, ts_s string, event_type string, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    src = str(tmp_path / "src")
    batch.write.parquet(src)

    # every event appears in exactly 2 sliding windows in batch mode
    expanded = stream_sliding_event_counts(batch)
    assert expanded.agg(F.sum("n_events")).collect()[0][0] == 2 * len(rows)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        stream_sliding_event_counts(stream, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["event_type"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    batch_rows = {
        (r["win_start"], r["event_type"], r["n_events"])
        for r in expanded.collect()
    }
    # append mode only emits watermark-closed windows -> subset; the
    # single availableNow drain closes everything before the final event
    assert got <= batch_rows
    assert got  # at least the early windows must have closed


def test_stream_zscore_matches_batch(spark, tmp_path):
    """Incremental streaming z-score/EWMA (applyInPandasWithState, state
    = trailing 50 cents per user) over THREE time-ordered file batches
    (maxFilesPerTrigger=1 forces real cross-batch state handoff) must
    equal the batch window operators exactly, row for row."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.anomaly import (
        ewma_micro_cents,
        rolling_zscore_flags,
    )
    from genpipe_spark.streaming.stateful import stream_zscore
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    events = load(spark, SF_SMALL, "events").select(
        "ts", "user_id", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("xc"),
    )
    # three strictly time-ordered slices -> three stream micro-batches
    lo, hi = events.agg(
        F.expr("percentile_approx(unix_micros(ts), array(0.33, 0.66), 1000)")
    ).first()[0]
    src = tmp_path / "src"
    src.mkdir()
    for i, cond in enumerate(
        [
            F.unix_micros("ts") <= lo,
            (F.unix_micros("ts") > lo) & (F.unix_micros("ts") <= hi),
            F.unix_micros("ts") > hi,
        ]
    ):
        events.where(cond).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"b{i}")
        )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    dest = str(tmp_path / "flags")
    q = (
        stream_zscore(stream)
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["event_id"]): (
            r["n_win"], r["s_cents"], r["q_cents2"], r["verdict"],
            r["ewma_micro_cents"],
        )
        for r in spark.read.parquet(dest).collect()
    }
    flagged = rolling_zscore_flags(
        events, ["user_id"], ["ts", "event_id"], F.col("xc")
    )
    smoothed = ewma_micro_cents(flagged, ["user_id"], ["ts", "event_id"], F.col("xc"))
    verdict = (
        F.when(F.col("is_anomaly").isNull(), "warmup")
        .when(F.col("is_anomaly"), "anomaly")
        .otherwise("normal")
    )
    want = {
        (r["user_id"], r["event_id"]): (
            r["n_win"], r["s_cents"], r["q_cents2"], r["verdict"],
            r["ewma_micro_cents"],
        )
        for r in smoothed.select(
            "user_id", "event_id", "n_win", "s_cents", "q_cents2",
            verdict.alias("verdict"), "ewma_micro_cents",
        ).collect()
    }
    assert len(got) == len(want) and got == want


def test_stream_group_sample_matches_batch_quota(spark, tmp_path):
    """Streaming bottom-k sample maintenance across three micro-batches:
    the LATEST emission per group must equal batch quota_sample over the
    whole corpus (order-independence of bottom-k membership)."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.mixing import quota_sample
    from genpipe_spark.streaming.stateful import stream_group_sample
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").select("source", "doc_id")
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):  # arbitrary thirds — arrival order must not matter
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    dest = str(tmp_path / "sample")
    q = (
        stream_group_sample(stream, "source", quota=10)
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.read.parquet(dest)
    latest_n = emitted.groupBy("group_key").agg(F.max("n_seen").alias("n_seen"))
    got = {
        (r["group_key"], r["doc_id"])
        for r in emitted.join(latest_n, ["group_key"]).where(
            emitted["n_seen"] == latest_n["n_seen"]
        ).collect()
    }
    want = {
        (r["source"], r["doc_id"])
        for r in quota_sample(docs, "source", 10).collect()
    }
    assert got == want and len(want) > 0


def test_stream_cdc_apply_equals_batch_merge(spark, tmp_path):
    """stream_cdc_apply over micro-batches (with a cross-batch
    OUT-OF-ORDER sequence: key 2's older change arrives one batch
    after its newer one) must converge to exactly batch merge_apply of
    all changes — the order-independence the tombstone+re-collapse
    state design guarantees."""
    import json
    import os
    import time as _t

    from genpipe_spark.operators.cdc import merge_apply
    from genpipe_spark.streaming.ingest import stream_cdc_apply

    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, v string, x long",
    )
    rows = {
        # b1: update 1, NEWER update for 2 (seq 9), delete 3
        "b1": [
            {"k": 1, "v": "a2", "x": 11, "seq": 4, "op": "U"},
            {"k": 2, "v": "b9", "x": 29, "seq": 9, "op": "U"},
            {"k": 3, "v": "c", "x": 30, "seq": 5, "op": "D"},
        ],
        # b2: OLDER update for 2 (seq 2, must NOT overwrite seq 9),
        # late upsert for 3 BELOW its tombstone (must stay deleted),
        # brand-new key 7
        "b2": [
            {"k": 2, "v": "b2", "x": 22, "seq": 2, "op": "U"},
            {"k": 3, "v": "zombie", "x": 0, "seq": 1, "op": "U"},
            {"k": 7, "v": "new", "x": 70, "seq": 6, "op": "U"},
        ],
    }
    src = tmp_path / "src"
    src.mkdir()
    for i, name in enumerate(["b1", "b2"]):
        p = src / f"{name}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows[name]))
        os.utime(p, (_t.time() + i, _t.time() + i))
    stream = (
        spark.readStream.schema("k long, v string, x long, seq long, op string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = stream_cdc_apply(
        stream, snap, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        ["k"], "seq",
    )
    q.awaitTermination(300)

    live = (
        spark.read.parquet(str(tmp_path / "state"))
        .where(F.col("op") != "D")
        .select("k", "v", "x")
    )
    got = {tuple(r) for r in live.collect()}
    all_changes = spark.createDataFrame(
        [tuple(r.values()) for b in rows.values() for r in b],
        "k long, v string, x long, seq long, op string",
    )
    expected = {
        tuple(r) for r in merge_apply(snap, all_changes, ["k"], "seq").collect()
    }
    assert got == expected
    assert got == {(1, "a2", 11), (2, "b9", 29), (7, "new", 70)}


def test_stream_cdc_apply_restart_preserves_state(spark, tmp_path):
    """Re-invoking stream_cdc_apply with an existing state + checkpoint
    (the crash-restart path) must RESUME from the persisted state, not
    re-bootstrap from the original snapshot — otherwise the source's
    checkpoint would skip already-processed batches whose effects were
    just wiped (round-6 review)."""
    import json
    import os
    import time as _t

    from genpipe_spark.streaming.ingest import stream_cdc_apply

    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(json.dumps({"k": 1, "v": "a2", "seq": 5, "op": "U"}))

    def run():
        stream = (
            spark.readStream.schema("k long, v string, seq long, op string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = stream_cdc_apply(
            stream, snap, str(tmp_path / "state"), str(tmp_path / "ckpt"),
            ["k"], "seq",
        )
        q.awaitTermination(300)

    run()  # processes b1
    # "restart": second batch arrives, same checkpoint + existing state
    p = src / "b2.json"
    p.write_text(json.dumps({"k": 2, "v": "n", "seq": 6, "op": "U"}))
    os.utime(p, (_t.time() + 2, _t.time() + 2))
    run()  # must NOT re-bootstrap (b1 already consumed by checkpoint)
    live = {
        (r["k"], r["v"])
        for r in spark.read.parquet(str(tmp_path / "state"))
        .where(F.col("op") != "D")
        .collect()
    }
    assert live == {(1, "a2"), (2, "n")}  # b1's effect survived the restart


def test_stream_cdc_apply_recovers_mid_swap_crash(spark, tmp_path):
    """Crash between fs.delete(dest) and fs.rename(staging, dest):
    dest is gone but staging holds the complete new state. Startup
    must COMPLETE the swap — round-6's `if not exists(dest)` branch
    silently re-bootstrapped from the original snapshot while the
    checkpoint skipped already-processed batches, losing their effects
    (round-7 review)."""
    import json
    import os
    import shutil
    import time as _t

    from genpipe_spark.streaming.ingest import stream_cdc_apply

    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(json.dumps({"k": 1, "v": "a2", "seq": 5, "op": "U"}))

    def run():
        stream = (
            spark.readStream.schema("k long, v string, seq long, op string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = stream_cdc_apply(
            stream, snap, str(tmp_path / "state"), str(tmp_path / "ckpt"),
            ["k"], "seq",
        )
        q.awaitTermination(300)

    run()  # processes b1 → state holds k=1 v=a2
    # simulate the crash window: the committed state sits in __staging,
    # dest was already deleted, rename never ran
    shutil.move(str(tmp_path / "state"), str(tmp_path / "state__staging"))
    p = src / "b2.json"
    p.write_text(json.dumps({"k": 2, "v": "n", "seq": 6, "op": "U"}))
    os.utime(p, (_t.time() + 2, _t.time() + 2))
    run()  # startup must rename staging→dest, then apply b2 on top
    live = {
        (r["k"], r["v"])
        for r in spark.read.parquet(str(tmp_path / "state"))
        .where(F.col("op") != "D")
        .collect()
    }
    # a2 (from the recovered staging state) AND n — NOT a re-bootstrap
    # of the original snapshot (which would read {(1,'a'),(2,'n')})
    assert live == {(1, "a2"), (2, "n")}
    assert not (tmp_path / "state__staging").exists()


def test_stream_interval_left_join_outer_rows_emit(spark, tmp_path):
    """LEFT OUTER stream-stream join e2e: the streamed result must
    equal the batch twin INCLUDING the NULL outer rows. Outer emission
    is gated on the watermark passing ts_click + horizon, so the
    source gets far-future sentinel rows on BOTH sides to flush the
    tail; sentinels are filtered from the comparison."""
    from pyspark.sql import functions as F

    from genpipe_spark.streaming.ingest import stream_interval_left_join
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    ev = load(spark, SF_SMALL, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    clicks = ev.where(F.col("event_type") == "click")
    convs = ev.where(F.col("event_type") == "purchase")
    batch = {
        (r["click_id"], r["conv_id"])
        for r in stream_interval_left_join(clicks, convs).collect()
    }
    assert any(c is None for _, c in batch), "fixture should have unconverted clicks"

    SENTINEL = 10_000_000
    flush = spark.range(1).select(
        F.lit(SENTINEL).alias("event_id"),
        F.expr("timestamp '2030-01-01 00:00:00'").alias("ts"),
        F.lit(-1).alias("user_id"),
        F.lit("click").alias("event_type"),
    )
    src = tmp_path / "src"
    clicks.unionByName(flush).coalesce(1).write.parquet(str(src / "clicks"))
    convs.unionByName(
        flush.withColumn("event_type", F.lit("purchase"))
    ).coalesce(1).write.parquet(str(src / "convs"))
    cs = spark.readStream.schema(clicks.schema).parquet(str(src / "clicks"))
    vs = spark.readStream.schema(convs.schema).parquet(str(src / "convs"))
    out = stream_interval_left_join(cs, vs, watermark="1 minute")
    dest = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["click_id"], r["conv_id"])
        for r in spark.read.parquet(dest).collect()
        if r["click_id"] != SENTINEL
    }
    assert got == batch


def test_stream_trending_topk_matches_batch(spark, tmp_path):
    """trending_topk over a REAL availableNow sliding-count stream must
    equal the batch twin exactly once every window is closed: a
    sentinel event far past the last real one flushes the watermark
    (the stream-interval-left-join drain pattern), sentinel windows
    are filtered from both sides, and the serving-layer rank runs over
    the sink table."""
    from pyspark.sql import functions as F

    from genpipe_spark.streaming.ingest import (
        stream_sliding_event_counts,
        trending_topk,
    )

    rows = [
        (i, f"2024-01-01 10:{m:02d}:00", t, 1.0)
        for i, (m, t) in enumerate(
            [(1, "click"), (2, "view"), (3, "click"), (6, "view"),
             (7, "view"), (8, "click"), (12, "buy"), (13, "buy"),
             (14, "view")]
        )
    ]
    sentinel = [(99, "2024-01-02 00:00:00", "sentinel", 0.0)]
    schema = "event_id bigint, ts_s string, event_type string, value double"

    def df_of(r):
        return spark.createDataFrame(r, schema).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type", "value",
        )

    batch, flushed = df_of(rows), df_of(rows + sentinel)
    src = str(tmp_path / "src")
    flushed.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        stream_sliding_event_counts(stream, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sink = spark.read.parquet(out).where(F.col("event_type") != "sentinel")
    got = {
        tuple(r)
        for r in trending_topk(sink.drop("value_sum"), k=2).collect()
    }
    want = {
        tuple(r)
        for r in trending_topk(
            stream_sliding_event_counts(batch).drop("value_sum"), k=2
        ).collect()
    }
    assert got == want and got


def test_stream_holt_winters_matches_batch(spark, tmp_path):
    """Streaming Holt-Winters (applyInPandasWithState; state = level +
    trend + 7-slot seasonal ring) over THREE day-ordered file batches
    (maxFilesPerTrigger=1 forces real cross-batch state handoff) must
    equal the batch seasonal scan bit-for-bit, row for row (VERDICT r7
    item 7)."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.statescan import holt_winters_scan
    from genpipe_spark.streaming.stateful import stream_holt_winters
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    daily = (
        load(spark, SF_SMALL, "events")
        .where(F.col("value").isNotNull())
        .groupBy(
            (F.col("user_id") % 10).alias("k"),
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
    )
    lo, hi = daily.agg(
        F.expr("percentile_approx(day, array(0.33, 0.66), 1000)")
    ).first()[0]
    src = tmp_path / "src"
    src.mkdir()
    for i, cond in enumerate(
        [
            F.col("day") <= lo,
            (F.col("day") > lo) & (F.col("day") <= hi),
            F.col("day") > hi,
        ]
    ):
        daily.where(cond).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"b{i}")
        )
    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    dest = str(tmp_path / "hw")
    q = (
        stream_holt_winters(stream)
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["k"], r["day"]): (
            r["x"], r["rn"], r["level_micro"], r["trend_micro"],
            r["seasonal_micro"],
        )
        for r in spark.read.parquet(dest).collect()
    }
    batch = holt_winters_scan(
        daily,
        keys=["k"], order_cols=["day"], value_col="x",
        alpha=0.25, beta=0.5, gamma=0.25, period=7,
    )
    want = {
        (r["k"], r["day"]): (
            r["x"], r["rn"], r["level_micro"], r["trend_micro"],
            r["seasonal_micro"],
        )
        for r in batch.collect()
    }
    assert len(got) == len(want) and got == want


def test_stream_histogram_quantile_matches_batch(spark, tmp_path):
    """Streaming histogram quantiles (state = nbins counters per group)
    over three ARBITRARY thirds — histogram counts are commutative, so
    no ordered-arrival contract — must converge to the batch
    histogram_group_quantiles over everything, bit for bit (same IEEE
    interpolation sequence)."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.quantile import histogram_group_quantiles
    from genpipe_spark.streaming.stateful import stream_histogram_quantile
    from genpipe_spark.tables import load
    from tests.conftest import SF_SMALL

    vals = (
        load(spark, SF_SMALL, "events")
        .where(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 10).alias("g"),
            F.col("value").cast("double").alias("x"),
            "event_id",
        )
    )
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        vals.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema(vals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    dest = str(tmp_path / "hq")
    q = (
        stream_histogram_quantile(stream, lo=0.0, hi=300.0, nbins=64)
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    snaps = spark.read.parquet(dest).collect()
    latest_n = {}
    for r in snaps:
        latest_n[r["g"]] = max(latest_n.get(r["g"], 0), r["n_seen"])
    got = {
        (r["g"], r["pct"]): r["q_est"]
        for r in snaps
        if r["n_seen"] == latest_n[r["g"]]
    }
    want = {
        (r["g"], r["pct"]): r["q_est"]
        for r in histogram_group_quantiles(
            vals, "x", ["g"], lo=0.0, hi=300.0, nbins=64, pcts=(50, 90, 99)
        ).collect()
    }
    assert got == want


def test_stream_window_late_drop_actually_drops(spark):
    """FIXTURES distribution probe for stream-window-late-drop: the
    late-batch rows must ACTUALLY be dropped (emitted counts strictly
    below the batch-blind counts for a healthy fraction of windows) —
    an all-kept run would parity-PASS against a wrong oracle form
    (the identically-degenerate trap). Also pins the lag-one-batch
    rule direction: batches 0 and 1 are never dropped."""
    from genpipe_spark.queries.streaming import stream_window_late_drop
    from genpipe_spark.tables import load

    sf = "/root/testdata/sf0.001"
    got = {
        (r.ws, r.g): r.n for r in stream_window_late_drop(spark, sf).collect()
    }
    assert got, "no windows emitted"
    ev = load(spark, sf, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("ws"),
        (F.col("user_id") % 5).alias("g"),
        (F.col("event_id") % 3).alias("b"),
    )
    full = {
        (r.ws, r.g): r.n
        for r in ev.groupBy("ws", "g").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    keep01 = {
        (r.ws, r.g): r.n
        for r in ev.where(F.col("b") < 2)
        .groupBy("ws", "g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    dropped_cells = sum(1 for k in got if got[k] < full.get(k, 0))
    assert dropped_cells >= 0.5 * len(got), (
        f"only {dropped_cells}/{len(got)} cells show drops"
    )
    # batches 0/1 always kept: emitted >= their contribution everywhere
    assert all(got[k] >= keep01.get(k, 0) for k in got)


def test_watermark_one_batch_lag_canary(spark, tmp_path):
    """CANARY for the engine rule stream-window-late-drop's oracle
    replays (ADVICE r10 / VERDICT r10 #7): re-MEASURES, on a 3-batch
    toy stream, that this Spark version still (a) lags the watermark
    one batch (the filter for batch N uses max(ts) over batches
    0..N-2 minus the delay), (b) drops iff window END <= that
    watermark, and (c) APPEND emits exactly the windows whose end <=
    the FINAL watermark. If a Spark upgrade changes watermark phasing
    or file-listing order, THIS test fails with a named cause instead
    of the entry failing as a confusing hash mismatch at bench time.

    Discriminators (each alternative rule flips one row):
      - b1's 01-02 06:00 is KEPT: the batch-1 filter wm is the one in
        effect DURING batch 0 (= epoch, no prior batch), not
        max(b0)-2d = 01-03 06:00 (the natural next-trigger rule would
        drop it) nor max(b0 u b1)-2d (no-lag would too);
      - b2's 01-01 12:00 is DROPPED: the batch-2 filter wm is
        max(b0)-2d = 01-03 06:00 (window end 01-02 <= wm);
      - b2's 01-03 12:00 is KEPT: end 01-04 > 01-03 06:00 — but a
        no-lag wm max(all)-2d = 01-08 06 or a one-phase wm
        max(b0 u b1)-2d = 01-06 06 would drop it;
      - 01-08's window is WITHHELD: final-commit wm = max(all)-2d =
        01-08 06:00 and append emits only end <= final wm."""
    import time as _time

    ts = F.to_timestamp
    rows = {
        0: ["2024-01-01 06:00:00", "2024-01-05 06:00:00"],
        1: ["2024-01-02 06:00:00",  # kept: batch-1 filter wm = epoch
            "2024-01-04 06:00:00",
            "2024-01-08 06:00:00"],
        2: ["2024-01-01 12:00:00",  # dropped: end 01-02 <= wm(b0)
            "2024-01-03 12:00:00",  # kept: end 01-04 > wm(b0) 01-03 06
            "2024-01-10 06:00:00"],
    }
    src = str(tmp_path / "src")
    for b, stamps in rows.items():
        df = spark.createDataFrame(
            [(s,) for s in stamps], "ts_s string"
        ).select(ts("ts_s").alias("ts"))
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/b{b}")
        stamp = _time.time() + b * 5
        for root, _, fs in os.walk(f"{src}/b{b}"):
            for f in fs:
                os.utime(os.path.join(root, f), (stamp, stamp))
    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    agg = (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", f"{out}/data")
        .option("checkpointLocation", f"{out}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.ws, r.n)
        for r in spark.read.parquet(f"{out}/data")
        .select(F.date_format("w.start", "yyyy-MM-dd").alias("ws"), "n")
        .collect()
    }
    # Replay of the pinned rule by hand: the ONLY drop is b2's
    # 01-01 12:00 (end 01-02 <= wm-in-effect-during-b1 = max(b0)-2d =
    # 01-03 06:00). Final wm = max(all)-2d = 01-08 06:00; append emits
    # kept windows with end <= that: 01-01..01-05; 01-08 and 01-10
    # stay withheld (open).
    want = {
        ("2024-01-01", 1), ("2024-01-02", 1), ("2024-01-03", 1),
        ("2024-01-04", 1), ("2024-01-05", 1),
    }
    assert got == want, (
        "watermark engine rule moved (one-batch lag / end<=wm drop / "
        f"append-final emission): got {sorted(got)}, want {sorted(want)} "
        "— update queries/streaming.py:_WM_LATE_SQL's pinned transcript"
    )
