"""JSONL source/sink behavior (sources/jsonl.py). The fixture-scan
value check is the oracle-parity query scan-jsonl; here: round-trip,
corrupt-line quarantine filtering, and partitioned writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.sources.jsonl import scan_jsonl, write_jsonl


def test_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", "en"), (2, None, "fr"), (3, "gamma", None)],
        "doc_id long, text string, lang string",
    )
    dest = str(tmp_path / "out")
    write_jsonl(df, dest)
    back = scan_jsonl(spark, dest, "doc_id long, text string, lang string")
    rows = back.collect()
    got = {(r["doc_id"], r["text"], r["lang"]) for r in rows}
    # NULL fields are dropped on write and restored as NULLs by the
    # schema on read — lossless round-trip
    assert got == {(1, "alpha", "en"), (2, None, "fr"), (3, "gamma", None)}
    # corrupt-marker checks must keep a data column projected (the scan's
    # documented corrupt-column-only limitation) — hence collect, not
    # filter().count()
    assert all(r["_corrupt_record"] is None for r in rows)


def test_corrupt_quarantine_split(spark, tmp_path):
    p = tmp_path / "mix.jsonl"
    p.write_text('{"id": 1}\nnot json\n{"id": "bad"}\n{"id": 4}\n')
    df = scan_jsonl(spark, str(p), "id long")
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull()).select(
        "id", "_corrupt_record"
    )
    assert {r["id"] for r in good.collect()} == {1, 4}
    assert len(bad.collect()) == 2  # whole-line garbage AND type mismatch


def test_partitioned_compressed_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "en"), (2, "fr"), (3, "en")], "doc_id long, lang string"
    )
    dest = str(tmp_path / "bylang")
    write_jsonl(df, dest, compression="gzip", partition_by=("lang",))
    back = scan_jsonl(spark, dest, "doc_id long")
    # partition column recovered by directory discovery
    assert {(r["doc_id"], r["lang"]) for r in back.select("doc_id", "lang").collect()} == {
        (1, "en"),
        (2, "fr"),
        (3, "en"),
    }


def test_csv_scan_with_quarantine(spark, tmp_path):
    from genpipe_spark.sources.jsonl import scan_csv

    p = tmp_path / "data.csv"
    p.write_text(
        "doc_id,lang,score\n"
        "1,en,0.5\n"
        "2,fr,not_a_number\n"   # uncastable field -> quarantined
        "3,de,1.25\n"
    )
    df = scan_csv(spark, str(p), "doc_id long, lang string, score double")
    rows = df.collect()
    good = {(r["doc_id"], r["lang"], r["score"]) for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {(1, "en", 0.5), (3, "de", 1.25)}
    assert len(bad) == 1 and bad[0]["doc_id"] == 2 and bad[0]["score"] is None


def test_csv_tsv_separator(spark, tmp_path):
    from genpipe_spark.sources.jsonl import scan_csv

    p = tmp_path / "data.tsv"
    p.write_text("a\tb\n1\tx\n2\ty\n")
    df = scan_csv(spark, str(p), "a long, b string", sep="\t")
    assert {(r["a"], r["b"]) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_scan_does_not_mutate_caller_schema(spark, tmp_path):
    from pyspark.sql import types as T

    from genpipe_spark.sources.jsonl import scan_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text('{"id": 1}\n')
    schema = T.StructType([T.StructField("id", T.LongType())])
    n_before = len(schema.fields)
    scan_jsonl(spark, str(p), schema)
    assert len(schema.fields) == n_before  # no phantom _corrupt_record
