"""Sinks (SURVEY.md §2.1): partitioned parquet stage tables, single-file
TSV for external services, and the Elasticsearch-shaped document sink.

Scale notes:
  - partitioned parquet writes use dynamic partition overwrite so
    reprocessing one chrom/band never truncates its siblings;
  - the single-file TSV sink is explicitly coalesce(1) — it exists for a
    human/external-service handoff (umd.prepareInput, steps/UMD.scala:12-18)
    and is documented as non-scalable by design;
  - the ES sink is an adapter interface: in production it would be
    ``df.write.format("org.elasticsearch.spark.sql")`` with the index
    settings below; in this harness it writes JSON-lines with identical
    document shape so the mapping is testable without an ES cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ES index DDL metadata (ddl-index-mapping): the reference creates the
# index over HTTP with an explicit nested mapping and these settings
# (Elastic/Data.scala:34-93). Engine-side this is sink configuration.
ES_INDEX_SETTINGS = {
    "number_of_shards": 8,
    "number_of_replicas": 0,
    "refresh_interval": "1000ms",
    "_all_enabled": False,
}


def write_parquet_partitioned(
    df: DataFrame,
    dest: str,
    partition_by: tuple[str, ...] = ("chrom",),
    mode: str = "overwrite",
) -> None:
    """Stage-table sink: parquet partitioned by the genomic layout keys
    (chrom[/band] — steps/Parser.scala:199 etc.), dynamic overwrite."""
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(dest)
    )


def write_single_tsv(df: DataFrame, dest: str, cols: list[str]) -> None:
    """Single-file TSV handoff (sink-text-single, steps/UMD.scala:12-18):
    concat_ws + coalesce(1). Deliberately not for scale."""
    df.select(F.concat_ws("\t", *[F.col(c).cast("string") for c in cols]).alias("value")).coalesce(
        1
    ).write.mode("overwrite").text(dest)


def write_es_shaped(
    df: DataFrame,
    dest: str,
    index: str,
    version: str,
    es_format: bool = False,
    es_nodes: str | None = None,
) -> None:
    """Document sink (sink-elasticsearch, GenomicsLoader.scala:208-213).

    ``es_format=True`` issues the real connector write (requires the
    elasticsearch-spark jar + cluster — not present in this harness);
    otherwise writes the identical documents as JSON-lines under
    ``dest/index-version/`` so shape and partitioning are testable."""
    if es_format:
        (
            df.write.format("org.elasticsearch.spark.sql")
            .option("es.nodes", es_nodes or "localhost")
            .option("es.resource", f"{index}/{version}")
            .mode("append")
            .save()
        )
        return
    df.write.mode("overwrite").json(f"{dest}/{index}-{version}")


def es_mapping_for(schema) -> dict:
    """Derive the ES index mapping DDL from a DataFrame schema
    (ddl-index-mapping): the generalized form of the reference's
    hand-written nested mapping (Elastic/Data.scala:34-93) — structs
    become object ``properties``, arrays of structs become ``nested``
    (the reference's effects/samples shape), scalars map to
    keyword/long/double/boolean/date."""
    from pyspark.sql import types as T

    def field_type(dt):
        if isinstance(dt, T.StructType):
            return {"properties": {f.name: field_type(f.dataType) for f in dt.fields}}
        if isinstance(dt, T.ArrayType):
            inner = field_type(dt.elementType)
            if isinstance(dt.elementType, T.StructType):
                return {"type": "nested", **inner}
            return inner
        if isinstance(dt, T.MapType):
            return {"type": "object"}
        if isinstance(dt, T.StringType):
            return {"type": "keyword"}
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return {"type": "long"}
        if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
            return {"type": "double"}
        if isinstance(dt, T.BooleanType):
            return {"type": "boolean"}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return {"type": "date"}
        return {"type": "keyword"}

    return {"properties": {f.name: field_type(f.dataType) for f in schema.fields}}


def es_create_index(
    nodes: str,
    index: str,
    mappings: dict | None = None,
    settings: dict | None = None,
    timeout_s: float = 10.0,
) -> dict:
    """Index DDL over HTTP (deleteIndex/createIndex pipeline steps,
    GenomicsLoader.scala:204-207): PUT the settings + mapping. Driver-side
    and O(1) — only the DDL travels, never data."""
    import json
    import urllib.request

    body: dict = {
        "settings": settings
        or {k: v for k, v in ES_INDEX_SETTINGS.items() if not k.startswith("_")}
    }
    if mappings is not None:
        body["mappings"] = mappings
    req = urllib.request.Request(
        f"http://{nodes}/{index}",
        data=json.dumps(body).encode(),
        method="PUT",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as r:
        return json.loads(r.read() or b"{}")


def es_delete_index(nodes: str, index: str, timeout_s: float = 10.0) -> None:
    """DELETE the index, ignoring 404 (deleteIndex step semantics)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(f"http://{nodes}/{index}", method="DELETE")
    try:
        urllib.request.urlopen(req, timeout=timeout_s)
    except urllib.error.HTTPError as e:
        if e.code != 404:
            raise


def write_es_bulk_http(
    df: DataFrame,
    nodes: str,
    index: str,
    id_col: str | None = None,
    batch_docs: int = 500,
    batch_bytes: int = 5 * 1024 * 1024,
    max_retries: int = 3,
    backoff_s: float = 0.5,
) -> None:
    """Distributed ES bulk indexing over plain HTTP (sink-elasticsearch,
    ``saveToEs`` at GenomicsLoader.scala:208-213) without the es-hadoop
    jar: ``foreachPartition`` posts NDJSON ``_bulk`` batches from EACH
    executor directly — the same shape es-hadoop uses, so there is no
    driver bottleneck and memory is bounded per in-flight batch by BOTH
    ``batch_docs`` and ``batch_bytes`` (es-hadoop's own dual cap — one
    giant document can't blow the request size).

    Failure handling (at-least-once; ``id_col`` makes replays idempotent
    upserts):
      - connection errors / HTTP 5xx / 429 on the whole request: bounded
        exponential-backoff retry, then raise (fail the task → Spark
        retries the partition);
      - per-ITEM rejections in a 200 response: only the rejected docs are
        re-sent (successes are never replayed within the task), with the
        same bounded backoff for retryable statuses (429/5xx);
      - permanently rejected docs (4xx item status, e.g. a mapping
        conflict) raise immediately with the first error — a poison doc
        would fail every blind replay forever, so surface it instead of
        burning the retry budget."""

    def send_partition(rows) -> None:
        import json
        import time
        import urllib.error
        import urllib.request

        def post(payload: bytes) -> dict:
            last: Exception | None = None
            for attempt in range(max_retries + 1):
                try:
                    req = urllib.request.Request(
                        f"http://{nodes}/_bulk",
                        data=payload,
                        headers={"Content-Type": "application/x-ndjson"},
                    )
                    with urllib.request.urlopen(req, timeout=30) as r:
                        return json.loads(r.read() or b"{}")
                except urllib.error.HTTPError as e:
                    if e.code < 500 and e.code != 429:
                        raise  # permanent request-level error
                    last = e
                except (urllib.error.URLError, TimeoutError, OSError) as e:
                    last = e
                if attempt < max_retries:
                    time.sleep(backoff_s * (2**attempt))
            raise RuntimeError(
                f"_bulk to {nodes} failed after {max_retries + 1} attempts"
            ) from last

        def flush(buf: list[str]) -> None:
            if not buf:
                return
            pending = buf[:]
            buf.clear()
            for attempt in range(max_retries + 1):
                resp = post("".join(pending).encode())
                if not resp.get("errors"):
                    return
                items = resp.get("items", [])
                if len(items) != len(pending):
                    raise RuntimeError(
                        f"_bulk item count mismatch: sent {len(pending)}, "
                        f"got {len(items)}"
                    )
                retryable: list[str] = []
                for entry, item in zip(pending, items):
                    st = next(iter(item.values()), {})
                    status = st.get("status", 200) if isinstance(st, dict) else 200
                    if 200 <= status < 300:
                        continue
                    if status == 429 or status >= 500:
                        retryable.append(entry)
                    else:
                        raise RuntimeError(
                            f"_bulk permanently rejected a doc "
                            f"(status {status}): {st.get('error')}"
                        )
                if not retryable:
                    return
                pending = retryable
                if attempt < max_retries:
                    time.sleep(backoff_s * (2**attempt))
            raise RuntimeError(
                f"_bulk still rejecting {len(pending)} docs after "
                f"{max_retries + 1} attempts"
            )

        buf: list[str] = []
        buf_bytes = 0
        for row in rows:
            doc = row.asDict(recursive=True)
            action: dict = {"index": {"_index": index}}
            if id_col is not None:
                action["index"]["_id"] = str(doc[id_col])
            entry = json.dumps(action) + "\n" + json.dumps(doc, default=str) + "\n"
            buf.append(entry)
            buf_bytes += len(entry)
            if len(buf) >= batch_docs or buf_bytes >= batch_bytes:
                flush(buf)
                buf_bytes = 0
        flush(buf)

    df.foreachPartition(send_partition)


def write_table(df: DataFrame, table: str, overwrite: bool = True) -> None:
    """Metastore table sink (sink-hive-table, steps/toElastic.scala:12):
    saveAsTable against the session catalog (Hive metastore in prod,
    in-memory catalog + warehouse dir locally)."""
    df.write.mode("overwrite" if overwrite else "append").saveAsTable(table)
