"""genpipe_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of RD-Connect/GenPipe (reference studied at
/root/reference, see SURVEY.md), re-expressed Spark-first.

Layout:
  session     — SparkSession factory tuned for the harness (AQE, Arrow, UTC)
  tables      — testdata table loader (parquet star schema + docs/embeddings)
  registry    — query/oracle registry backing __spark_entry__.py
  operators/  — relational, nested, interval, dedup, similarity, text ops
  functions/  — the parse-layer column-expression library (fn-* slugs)
  sources/    — scans (vcf-ish text, annotation text) and sinks
  plans/      — staged-pipeline runner (the reference's lifecycle, §3.1)
  streaming/  — Structured Streaming ingest
"""

__version__ = "0.1.0"
