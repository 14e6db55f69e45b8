"""LLM-data-pipeline queries()/oracle_sql() twins: deduplication,
similarity search, text analysis, multimodal plumbing — the beyond-the-
reference operators BASELINE.json's north star calls for.

Oracle-determinism notes:
  - cosine similarity is a strict left fold on doubles in BOTH engines
    (Spark aggregate / DuckDB list_reduce with a 0.0 prepend) → bit-identical;
  - document fingerprints use 31-bit modular polynomial hashes portable
    to ANSI SQL (no xxhash/murmur);
  - approximate operators (MinHash-LSH, SimHash, IVF, hyperplane-LSH) are
    registered WITHOUT oracles (driver rows-only check) and instead have
    recall/equivalence pytest coverage against their exact counterparts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.operators import dedup as D
from genpipe_spark.operators import similarity as S
from genpipe_spark.operators import text as T
from genpipe_spark.operators.multimodal import documents_as_media, extract_features
from genpipe_spark.registry import query
from genpipe_spark.queries.common import t

# ---------------------------------------------------------------- dedup

@query(
    "dedup-exact",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf):
    return D.exact_dedup(t(spark, sf, "documents"))


# hashed 3-word shingles, mirroring operators/dedup.py shingle_hashes:
# per-word 31-bit polynomial char fold, then (wh[i]*P1 + wh[i+1]*P2 + wh[i+2]) % M
_SHINGLES_CTE = r"""
    WITH d AS (
      SELECT doc_id,
             list_apply(
               list_filter(string_split_regex(text, '\s+'), w -> w <> ''),
               w -> list_reduce(
                      list_prepend(CAST(7 AS BIGINT),
                        list_apply(list_filter(string_split(w, ''), c -> c <> ''),
                                   c -> CAST(ascii(c) AS BIGINT))),
                      (a, c) -> (a * 31 + c) % 2147483647)) AS wh
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(wh) - 1, 1)),
               i -> ((wh[i] * 1000003) % 2147483647
                     + (wh[i+1] * 9176) % 2147483647
                     + wh[i+2]) % 2147483647))) AS sh
      FROM d
    )
"""


@query(
    "dedup-ngram-jaccard",
    _SHINGLES_CTE
    + """
    , sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(n_inter / (sa.n + sb.n - n_inter) * 10000)/10000.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE floor(n_inter / (sa.n + sb.n - n_inter) * 10000)/10000.0 >= 0.2
    """,
)
def dedup_ngram_jaccard(spark, sf):
    return D.ngram_jaccard_pairs(t(spark, sf, "documents"), k=3, threshold=0.2)


@query(
    "dedup-minhash-lsh",
    _SHINGLES_CTE
    + """
    , sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(n_inter / (sa.n + sb.n - n_inter) * 10000)/10000.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE floor(n_inter / (sa.n + sb.n - n_inter) * 10000)/10000.0 >= 0.5
    """,
)
def dedup_minhash_lsh(spark, sf):
    # LSH candidate generation + exact Jaccard verification: output equals
    # the exact pair set whenever LSH recall is 1 (verified across SFs in
    # tests), so the exact-Jaccard SQL is a true oracle; a recall miss
    # would surface here as a hash mismatch — by design.
    return D.minhash_lsh_pairs(t(spark, sf, "documents"), threshold=0.5)


@query("dedup-simhash")  # approximate → rows-only check
def dedup_simhash(spark, sf):
    return D.simhash_pairs(t(spark, sf, "documents"), bits=32, max_hamming=3)


_COS = """list_reduce(list_prepend(0.0, list_apply(list_zip({a}, {b}), s -> s[1]*s[2])), (x, y) -> x + y)"""


def _cos_sql(a: str, b: str) -> str:
    return (
        _COS.format(a=a, b=b)
        + " / sqrt("
        + _COS.format(a=a, b=a)
        + " * "
        + _COS.format(a=b, b=b)
        + ")"
    )


@query(
    "dedup-embedding-cosine",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_cos_sql('a.v', 'b.v')} AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_cos_sql('a.v', 'b.v')} >= 0.35
    """,
)
def dedup_embedding_cosine(spark, sf):
    return S.cosine_near_dup_pairs(t(spark, sf, "embeddings"), threshold=0.35)


# ------------------------------------------------------------ similarity

@query(
    "ann-cosine-topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
    pairs AS (
      SELECT query_id, e.vec_id AS neighbor_id, {_cos_sql('qv', 'e.v')} AS cos
      FROM e JOIN q ON e.vec_id <> query_id
    )
    SELECT query_id, neighbor_id, rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs)
    WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark, sf):
    emb = t(spark, sf, "embeddings")
    return S.brute_force_topk(emb, emb.where(F.col("vec_id") < 8), k=5)


@query("ann-ivf-topk")  # approximate → rows-only check; recall tested in pytest
def ann_ivf_topk(spark, sf):
    emb = t(spark, sf, "embeddings")
    return S.ivf_topk(emb, emb.where(F.col("vec_id") < 8), num_centroids=8, k=5)


@query("similarity-lsh-pairs")  # approximate → rows-only check
def similarity_lsh_pairs(spark, sf):
    return S.lsh_near_dup_pairs(t(spark, sf, "embeddings"), threshold=0.35)


# ---------------------------------------------------------- text analysis

@query(
    "text-token-count",
    rf"""
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_ish
    FROM documents
    """,
)
def text_token_count(spark, sf):
    return T.token_count(t(spark, sf, "documents")).select("doc_id", "n_tokens", "n_bpe_ish")


@query(
    "text-quality-score",
    rf"""
    WITH d AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           len(ws) AS n_tokens,
           floor(list_reduce(list_prepend(0, list_apply(ws, w -> length(w))), (a,b) -> a + b)
                 / len(ws) * 10000)/10000.0 AS mean_token_len,
           floor(len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is'], lower(w))))
                 / len(ws) * 10000)/10000.0 AS stopword_ratio,
           floor(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                 / length(text) * 10000)/10000.0 AS punct_ratio,
           floor(len(regexp_extract_all(text, '[A-Z]'))
                 / length(text) * 10000)/10000.0 AS upper_ratio
    FROM d
    """,
)
def text_quality_score(spark, sf):
    return T.quality_score(t(spark, sf, "documents")).select(
        "doc_id", "n_tokens", "mean_token_len", "stopword_ratio", "punct_ratio", "upper_ratio"
    )


def _hits_sql(stops: list[str]) -> str:
    lst = ",".join(f"'{s}'" for s in stops)
    return f"len(list_filter(ws, w -> list_contains([{lst}], lower(w))))"


@query(
    "text-langid",
    rf"""
    WITH d AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             {_hits_sql(T.STOPWORDS['de'])} AS h_de,
             {_hits_sql(T.STOPWORDS['en'])} AS h_en,
             {_hits_sql(T.STOPWORDS['es'])} AS h_es,
             {_hits_sql(T.STOPWORDS['fr'])} AS h_fr
      FROM d
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM scored
    """,
)
def text_langid(spark, sf):
    return T.lang_id(t(spark, sf, "documents")).select("doc_id", "lang", "lang_pred")


@query(
    "text-fingerprint",
    r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_apply(ws, w ->
               list_reduce(list_prepend(CAST(7 AS BIGINT),
                 list_apply(list_filter(string_split(w, ''), c -> c <> ''), c -> CAST(ascii(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % 2147483647))),
             (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fp
    FROM d
    """,
)
def text_fingerprint(spark, sf):
    return T.fingerprint(t(spark, sf, "documents")).select("doc_id", "fp")


# ---------------------------------------------------------- multimodal

@query("multimodal-features")  # binary plumbing + mapInPandas → rows-only check
def multimodal_features(spark, sf):
    media = documents_as_media(t(spark, sf, "documents"))
    return extract_features(media, dim=16, use_fake_decoder=True)


@query(
    "text-normalize",
    r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                               '\s+', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def text_normalize(spark, sf):
    # canonicalization pass ahead of dedup: lowercase, strip punctuation,
    # collapse whitespace — pure regexp_replace chain, codegen-side
    d = t(spark, sf, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    return d.select("doc_id", norm.alias("norm_text"))


@query(
    "multimodal-frame-sample",
    """
    SELECT doc_id AS media_id, unnest(range(0, n_chars % 5000 + 1, 1000)) AS frame_ts_ms
    FROM documents
    """,
)
def multimodal_frame_sample(spark, sf):
    # video frame sampling plumbing: one row per sampled timestamp
    # (operators/multimodal.frame_sample_stub); duration derived
    # deterministically from n_chars so DuckDB can oracle the row fan-out
    from genpipe_spark.operators.multimodal import frame_sample_stub

    d = t(spark, sf, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("fake/raw").alias("codec"),
        (F.col("n_chars") % 5000 + 1).cast("long").alias("duration_ms"),
    )
    return frame_sample_stub(media, every_ms=1000).select("media_id", "frame_ts_ms")


@query(
    "text-chunk",
    r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
      FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           array_to_string(ws[(i*64+1):(i*64+64)], ' ') AS chunk_text,
           least(64, len(ws) - i*64) AS n_tokens
    FROM d, unnest(range(0, CAST(ceil(len(ws)/64.0) AS BIGINT))) AS t(i)
    """,
)
def text_chunk(spark, sf):
    # fixed-size token-window chunking for training pipelines: one row per
    # 64-token window, generated with sequence+transform (no Python)
    from genpipe_spark.operators.hof import bind

    d = t(spark, sf, "documents")
    ws_expr = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")

    def chunks(ws):
        n = F.size(ws)
        idx = F.sequence(F.lit(0), F.ceil(n / 64.0).cast("long") - 1)
        return F.transform(
            idx,
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.concat_ws(" ", F.slice(ws, i * 64 + 1, 64)).alias("chunk_text"),
                F.least(F.lit(64), n - i * 64).alias("n_tokens"),
            ),
        )

    ex = d.select("doc_id", F.explode(bind(ws_expr, chunks)).alias("c"))
    return ex.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


# portable deterministic row hash for sampling/splitting: engine-agnostic
# arithmetic on the id (NOT xxhash/murmur)
_SPLIT_HASH = "(doc_id * 2654435761) % 2147483647"


@query(
    "sample-deterministic",
    f"""
    SELECT doc_id, source, n_chars FROM documents
    WHERE ({_SPLIT_HASH}) % 100 < 10
    """,
)
def sample_deterministic(spark, sf):
    # reproducible 10% sample via portable hash arithmetic — the same rows
    # on any engine, any partitioning, any run (unlike rand() or TABLESAMPLE)
    d = t(spark, sf, "documents")
    h = (F.col("doc_id") * 2654435761) % 2147483647
    return d.where(h % 100 < 10).select("doc_id", "source", "n_chars")


@query(
    "split-train-val-test",
    f"""
    SELECT doc_id,
           CASE WHEN ({_SPLIT_HASH}) % 100 < 80 THEN 'train'
                WHEN ({_SPLIT_HASH}) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_val_test(spark, sf):
    # deterministic 80/10/10 split assignment, stable across engines/runs
    d = t(spark, sf, "documents")
    h = ((F.col("doc_id") * 2654435761) % 2147483647) % 100
    split = (
        F.when(h < 80, F.lit("train")).when(h < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return d.select("doc_id", split.alias("split"))


@query(
    "dedup-contamination",
    _SHINGLES_CTE
    + """
    , c_sh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 10 <> 0),
    b_sh AS (SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % 10 = 0),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM c_sh GROUP BY doc_id),
    overlap AS (
      SELECT c.doc_id, b.bench_id, count(*) AS n_shared
      FROM c_sh c JOIN b_sh b ON c.sh = b.sh
      GROUP BY 1, 2
    ), scored AS (
      SELECT o.doc_id, o.bench_id,
             floor(o.n_shared / s.n_sh * 10000)/10000.0 AS overlap_frac
      FROM overlap o JOIN sizes s ON s.doc_id = o.doc_id
    )
    SELECT doc_id, bench_id AS worst_benchmark_id, overlap_frac FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY overlap_frac DESC, bench_id) AS rn
      FROM scored)
    WHERE rn = 1 AND overlap_frac >= 0.05
    """,
)
def dedup_contamination(spark, sf):
    # benchmark decontamination: corpus = 90% of documents, benchmark =
    # the doc_id%10==0 slice; flag corpus docs overlapping any benchmark
    # doc by >=5% of their shingles
    d = t(spark, sf, "documents")
    corpus = d.where(F.col("doc_id") % 10 != 0)
    benchmark = d.where(F.col("doc_id") % 10 == 0)
    return D.contamination_check(corpus, benchmark, threshold=0.05)
