"""File-source / sink queries()/oracle_sql() twins (SURVEY.md §2.1, §2.8
stream-ingest) with LITERAL-VALUES oracles.

The text fixtures these queries read are deterministic (content depends
only on constants), so their DuckDB twins are ``VALUES`` tables built by
an independent pure-Python re-derivation of the expected rows — the
parse rules re-derived from the reference (steps/toSample.scala,
steps/Parser.scala, steps/gzToParquet.scala:24-31), NOT by running the
Spark implementation. A disagreement between the two derivations fails
the driver's hash compare — that is the point.

This upgrades scan-text-vcf / source-filestream / row-sample-parser /
scan-text-annotation from rows-only checks to full value-hash oracles
(VERDICT r01 "Next round" #7, #8).
"""

from __future__ import annotations

import gzip
import os
import tempfile

from pyspark.sql import functions as F

from genpipe_spark.registry import query

# ------------------------------------------------------------- fixture

def vcf_fixture_dir() -> str:
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


# --------------------------------------- expected rows (pure Python)

# chromStrToInt (steps/gzToParquet.scala:24-31)
_CHROM_N = {"1": 1, "X": 24, "MT": 23}

# gqBands (steps/toSample.scala:15-30)
def _gq_band(q: int) -> int:
    bands = [20, 25, 30, 35, 40, 45, 50, 70, 90, 99]
    if q < 20:
        return 0
    for lo, hi in zip(bands[:-1], bands[1:]):
        if lo <= q < hi:
            return lo
    return 99


def _fixture_raw_rows() -> list[tuple]:
    """Expected scan_vcf_text rows: the raw tab fields + chrom_n + the
    filename-derived sample id."""
    rows = []
    for s in range(2):
        for i in range(30):
            pos = 500 + 10 * i
            chrom = ["1", "X", "MT"][i % 3]
            if i % 4 == 0:
                rows.append(
                    (_CHROM_N[chrom], chrom, pos, ".", "A", "G,<NON_REF>", "99",
                     "PASS", "CADD13_PHRED=12.5", "GT:AD:DP:GQ:PL:SB",
                     "0/1:7,3:30:80:58,0:1,2", f"SAMPLE{s}")
                )
            else:
                rows.append(
                    (_CHROM_N[chrom], chrom, pos, ".", "C", "<NON_REF>", "99",
                     "PASS", f"END={pos + 9}", "GT:DP:GQ:MIN_DP:PL",
                     "0/0:40:60:35:0,0", f"SAMPLE{s}")
                )
    return rows


def _fixture_parsed_rows() -> list[tuple]:
    """Expected row-sample-parser rows, re-derived from the reference's
    parse rules (NOT from the Spark implementation):

      - variant rows (ALT "G,<NON_REF>", GT 0/1): altDecompose emits the
        single primary allele G (gt_index 1, not multiallelic); FORMAT
        GT:AD:DP:GQ:PL:SB → dp=DP, gq=gq (NO banding on this layout,
        steps/toSample.scala:42); end_pos = pos for non-block alleles;
        indel = false (both alleles length 1); CADD 12.5 via
        removedot(getter) — 4-decimal truncation is a no-op here.
      - reference blocks (ALT <NON_REF>, GT 0/0): FORMAT GT:DP:GQ:MIN_DP:PL
        → dp=MIN_DP (35), gq=gqBands(60)=50 (steps/toSample.scala:37-39);
        end_pos = INFO END = pos+9; indel = true (length("<NON_REF>")≠1 —
        the reference's literal length test); no CADD → 0.0.
    """
    rows = []
    for s in range(2):
        for i in range(30):
            pos = 500 + 10 * i
            chrom = str(_CHROM_N[["1", "X", "MT"][i % 3]])
            if i % 4 == 0:
                rows.append(
                    (chrom, pos, pos, "A", "G", False, "0/1", 30, 80,
                     f"SAMPLE{s}", 12.5)
                )
            else:
                rows.append(
                    (chrom, pos, pos + 9, "C", "<NON_REF>", True, "0/0", 35,
                     _gq_band(60), f"SAMPLE{s}", 0.0)
                )
    return rows


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _values_sql(rows: list[tuple], cols: list[str], casts: dict[str, str]) -> str:
    """Build SELECT ... FROM (VALUES ...) v(cols) with explicit casts so
    DuckDB's inferred types match Spark's output schema."""
    body = ",\n      ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows
    )
    sel = ", ".join(
        f'CAST("{c}" AS {casts[c]}) AS "{c}"' if c in casts else f'"{c}"'
        for c in cols
    )
    collist = ", ".join(f'"{c}"' for c in cols)
    return f"SELECT {sel} FROM (VALUES\n      {body}\n    ) v({collist})"


_RAW_COLS = ["chrom_n", "chrom", "pos", "id", "ref", "alt", "qual", "filter",
             "info", "format", "sample", "sample_id"]
_RAW_CASTS = {"chrom_n": "INTEGER", "pos": "BIGINT"}

_PARSED_COLS = ["chrom", "pos", "end_pos", "ref", "alt", "indel", "gt", "dp",
                "gq", "sample_id", "cadd"]
_PARSED_CASTS = {"pos": "BIGINT", "end_pos": "BIGINT", "dp": "INTEGER",
                 "gq": "INTEGER", "cadd": "DOUBLE"}


# ------------------------------------------------------------- queries

@query("scan-text-vcf", _values_sql(_fixture_raw_rows(), _RAW_COLS, _RAW_CASTS))
def scan_text_vcf(spark, sf):
    from genpipe_spark.sources.vcf import scan_vcf_text

    return scan_vcf_text(spark, f"{vcf_fixture_dir()}/*.vcf.gz")


@query(
    "source-filestream",
    _values_sql(
        [
            (r[0], r[2], r[3], r[4], r[5], r[8], r[9], r[10], r[11])
            for r in _fixture_raw_rows()
        ],
        ["chrom_n", "pos", "id", "ref", "alt", "info", "format", "sample", "sample_id"],
        {"chrom_n": "INTEGER", "pos": "BIGINT"},
    ),
)
def source_filestream(spark, sf):
    """Streaming file-source ingest (stream-ingest + foreachbatch sink
    family), drained with availableNow, then read back — the batch-twin
    oracle is the VALUES table above (same fixture, independently
    derived)."""
    from genpipe_spark.streaming.ingest import stream_vcf_ingest

    src = vcf_fixture_dir()
    out = tempfile.mkdtemp(prefix="genpipe_stream_out_")
    q = stream_vcf_ingest(
        spark,
        src,
        os.path.join(out, "data"),
        checkpoint=os.path.join(out, "ckpt"),
        trigger_seconds=None,
    )
    q.awaitTermination(300)
    back = spark.read.parquet(os.path.join(out, "data"))
    # partition discovery types the chrom_n partition column as int —
    # pin it (and column order) to the pre-sink schema
    return back.select(
        F.col("chrom_n").cast("int").alias("chrom_n"),
        "pos", "id", "ref", "alt", "info", "format", "sample", "sample_id",
    )


@query("row-sample-parser", _values_sql(_fixture_parsed_rows(), _PARSED_COLS, _PARSED_CASTS))
def row_sample_parser(spark, sf):
    """The composed per-row parse (sampleParser, steps/Parser.scala:203-237)
    over the fixture, flattened to scalar columns; the oracle re-derives
    every field by hand from the reference rules (see
    _fixture_parsed_rows). Exact-value e2e coverage also lives in
    tests/test_genomics.py::test_sample_parse_e2e."""
    from genpipe_spark.functions.variant import sample_parse
    from genpipe_spark.sources.vcf import scan_vcf_text

    raw = scan_vcf_text(spark, f"{vcf_fixture_dir()}/*.vcf.gz").withColumn(
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


_ANNOT_PHRASES = ["Pathogenic", "Polymorphism", "Probably pathogenic", "Probable polymorphism"]
_ANNOT_CODES = {"Pathogenic": "D", "Polymorphism": "B",
                "Probably pathogenic": "P", "Probable polymorphism": "U"}


@query(
    "scan-text-annotation",
    _values_sql(
        [("1", 1000 + i, "A", "G", _ANNOT_CODES[p]) for i, p in enumerate(_ANNOT_PHRASES)],
        ["chrom", "pos", "ref", "alt", "umd"],
        {"pos": "BIGINT"},
    ),
)
def scan_text_annotation(spark, sf):
    from genpipe_spark.sources.vcf import scan_annotation_text

    d = os.path.join(tempfile.gettempdir(), "genpipe_umd_fixture_v1")
    path = os.path.join(d, "chrom1.annotated")
    if not os.path.isfile(path):
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d)
        with os.fdopen(fd, "w") as fh:
            fh.write("NB_LINES 4\n")
            for i, phrase in enumerate(_ANNOT_PHRASES):
                fh.write(f"chr1\t{1000 + i}\t.\t.\tA\tG\tx\t{phrase}\n")
        os.replace(tmp, path)  # atomic publish
    return scan_annotation_text(spark, path)


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
    from genpipe_spark.queries.common import t
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


# ------------------------------------------------- JSONL corpus source

# two files (one plain, one gzip) so the scan proves multi-file +
# compressed-codec reading; the last two lines of the .gz exercise the
# PERMISSIVE corrupt-record contract (whole-line garbage vs a
# type-mismatched field that keeps its parseable siblings)
_JSONL_PLAIN = [
    '{"doc_id": 1, "text": "alpha beta", "lang": "en", "meta": {"source": "web", "score": 0.5}}',
    '{"doc_id": 2, "text": "gamma", "lang": "fr", "meta": {"source": "book", "score": 1.5}}',
    '{"doc_id": 3, "text": "delta epsilon zeta", "lang": "en", "meta": {"source": "web", "score": 0.25}}',
    '{"doc_id": 4, "text": "eta", "lang": "de"}',
]
_JSONL_GZ = [
    '{"doc_id": 5, "text": null, "lang": "en", "meta": {"source": "wiki", "score": 2.0}}',
    "this is not json at all",
    '{"doc_id": "seven", "text": "kappa", "lang": "en", "meta": {"source": "web", "score": 1.0}}',
    '{"doc_id": 6, "text": "theta iota", "lang": "es", "meta": {"source": "web", "score": 0.75}}',
]

_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, meta struct<source: string, score: double>"
)

# expected rows, re-derived BY HAND from Spark's documented PERMISSIVE
# contract (not by running the implementation): malformed line → all
# data fields NULL + raw line in the marker; type-mismatched field →
# that field NULL, parseable siblings kept, marker set
_JSONL_ROWS = [
    (1, "alpha beta", "en", "web", 0.5, False),
    (2, "gamma", "fr", "book", 1.5, False),
    (3, "delta epsilon zeta", "en", "web", 0.25, False),
    (4, "eta", "de", None, None, False),
    (5, None, "en", "wiki", 2.0, False),
    (None, None, None, None, None, True),
    (None, "kappa", "en", "web", 1.0, True),
    (6, "theta iota", "es", "web", 0.75, False),
]
_JSONL_COLS = ["doc_id", "text", "lang", "source", "score", "corrupt"]
_JSONL_CASTS = {"doc_id": "BIGINT", "score": "DOUBLE", "corrupt": "BOOLEAN"}


def jsonl_fixture_dir() -> str:
    """Deterministic JSONL fixture (constants above; atomic publish like
    vcf_fixture_dir)."""
    d = os.path.join(tempfile.gettempdir(), "genpipe_jsonl_fixture_v1")
    if not os.path.isdir(d):
        tmp = tempfile.mkdtemp(dir=tempfile.gettempdir())
        with open(os.path.join(tmp, "part-0.jsonl"), "w") as fh:
            fh.write("\n".join(_JSONL_PLAIN) + "\n")
        with gzip.open(os.path.join(tmp, "part-1.jsonl.gz"), "wt") as fh:
            fh.write("\n".join(_JSONL_GZ) + "\n")
        try:
            os.rename(tmp, d)
        except OSError:
            pass  # lost the publish race: another worker renamed first
    return d


@query("scan-jsonl", _values_sql(_JSONL_ROWS, _JSONL_COLS, _JSONL_CASTS))
def scan_jsonl_docs(spark, sf):
    """JSONL corpus scan (sources/jsonl.scan_jsonl): explicit schema (no
    inference pass), PERMISSIVE corrupt-line quarantine, nested-field
    projection, multi-file + gzip codec — the LLM-corpus sibling of
    scan-text-vcf. The oracle is the hand-derived VALUES table above."""
    from genpipe_spark.sources.jsonl import scan_jsonl

    df = scan_jsonl(spark, jsonl_fixture_dir(), _JSONL_SCHEMA)
    return df.select(
        "doc_id",
        "text",
        "lang",
        F.col("meta.source").alias("source"),
        F.col("meta.score").alias("score"),
        F.col("_corrupt_record").isNotNull().alias("corrupt"),
    )


@query(
    "sink-orc-roundtrip",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
    FROM lineitem
    WHERE l_quantity < 10
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sink_orc_roundtrip(spark, sf):
    """ORC source/sink: the filtered lineitem subset round-trips through
    Spark's built-in columnar ORC writer/reader (snappy, vectorized
    scan) and is aggregated FROM THE ORC COPY — equality with the
    parquet-side oracle proves the format round-trip is lossless
    (types, decimals, nulls). ORC predicate pushdown/column pruning
    work like parquet's; the oracle reads the original parquet."""
    from genpipe_spark.queries.common import t

    df = (
        t(spark, sf, "lineitem")
        .where(F.col("l_quantity") < 10)
        .select("l_returnflag", "l_linestatus", "l_extendedprice")
    )
    dest = tempfile.mkdtemp(prefix="genpipe_sink_orc_")
    df.write.mode("overwrite").orc(dest)
    back = spark.read.orc(dest)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("price_cents"),
    )
