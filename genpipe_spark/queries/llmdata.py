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
from genpipe_spark.operators.multimodal import (
    decode_features,
    documents_as_media,
    extract_features,
    frame_sample_stub,
    synth_media_real,
)
from genpipe_spark.registry import query
from genpipe_spark.queries.common import t, widen

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


# per-word 31-bit polynomial char fold (operators/dedup._word_hash) —
# the ONE copy both shingle CTEs build on
_WORD_FOLD_D = r"""
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
    )
"""

# hashed 3-word shingles, mirroring operators/dedup.py shingle_hashes:
# per-word 31-bit polynomial char fold, then (wh[i]*P1 + wh[i+1]*P2 + wh[i+2]) % M
_SHINGLES_CTE = _WORD_FOLD_D + r"""
, sh AS (
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
    return D.ngram_jaccard_pairs(widen(t(spark, sf, "documents")), k=3, threshold=0.2)


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
    # the exact pair set whenever LSH recall is 1, so the exact-Jaccard
    # SQL is a true oracle; a recall miss surfaces as a hash mismatch —
    # by design, and it HAPPENED: at the old 32-hash/8-band setting a
    # j=0.8 pair (the fixture pair-set floor) misses with p~1.5% and one
    # did at sf1 (r9 late sweep). 96/24 puts the per-pair miss at
    # (1-0.8^4)^24 ~ 3e-6 — e[misses] << 1 through sf10's ~25k pairs.
    return D.minhash_lsh_pairs(
        widen(t(spark, sf, "documents")), num_hashes=96, bands=24,
        threshold=0.5,
    )


def _simhash_sql(bits: int = 32, max_hamming: int = 3) -> str:
    """DuckDB twin of operators/dedup.simhash at the registered settings.

    Exact-oracle justification: with 4 bit-blocks over 32 bits, any pair
    within hamming <= 3 must agree on >= 1 block (pigeonhole), so the
    Spark operator's LSH bucketing has recall 1 and its output equals the
    full pairwise hamming filter computed here. Bit i<31 reads bit i of
    the 31-bit shingle hash; bit 31 reads bit 0 of the derived second
    hash h2 = (h*1103515245 + 12345) mod M31 — mirroring simhash()."""
    votes = []
    for i in range(bits):
        if i < 31:
            b = f"(sh // {2**i}) % 2"
        else:
            b = f"(((sh * 1103515245 + 12345) % 2147483647) // {2**(i % 31)}) % 2"
        votes.append(f"sum(CASE WHEN {b} = 1 THEN 1 ELSE -1 END) AS v{i}")
    votes_sql = ",\n             ".join(votes)
    sig = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(bits)
    )
    return (
        _SHINGLES_CTE
        + f"""
    , votes AS (SELECT doc_id, {votes_sql} FROM sh GROUP BY doc_id),
    sig AS (SELECT doc_id, {sig} AS s FROM votes)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
    """
    )


@query("dedup-simhash", _simhash_sql())
def dedup_simhash(spark, sf):
    return D.simhash_pairs(widen(t(spark, sf, "documents")), bits=32, max_hamming=3)


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

_ANN_BRUTE_SQL = f"""
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
    """

_ANN_IVF_SQL = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, v AS cent_v FROM e ORDER BY vec_id LIMIT 8),
    scored_all AS (
      SELECT e.vec_id, e.v, cent_id, {_cos_sql('e.v', 'cent_v')} AS c
      FROM e CROSS JOIN cents
    ),
    assigned AS (
      SELECT vec_id, v, cent_id AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c DESC, cent_id) AS rn
        FROM scored_all) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, cell FROM assigned WHERE vec_id < 8),
    pairs AS (
      SELECT query_id, a.vec_id AS neighbor_id, {_cos_sql('qv', 'a.v')} AS cos
      FROM assigned a JOIN q ON a.cell = q.cell AND a.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs)
    WHERE rank <= 5
    """


@query("ann-cosine-topk", _ANN_BRUTE_SQL)
def ann_cosine_topk(spark, sf):
    emb = t(spark, sf, "embeddings")
    return S.brute_force_topk(emb, emb.where(F.col("vec_id") < 8), k=5)


@query("ann-ivf-topk", _ANN_IVF_SQL)
def ann_ivf_topk(spark, sf):
    # IVF is approximate vs brute force but fully DETERMINISTIC (centroids
    # = first 8 by vec_id, nearest-centroid assignment, probe own cell) —
    # so its DuckDB twin replays the same construction; the strict-left-
    # fold cosine is bit-identical in both engines, making assignment and
    # ranking reproducible. Recall vs brute force is separately pytest-ed.
    emb = t(spark, sf, "embeddings")
    return S.ivf_topk(emb, emb.where(F.col("vec_id") < 8), num_centroids=8, k=5)


@query(
    "ann-topk-suite",
    f"""
    SELECT 'brute' AS method, * FROM ({_ANN_BRUTE_SQL})
    UNION ALL
    SELECT 'ivf' AS method, * FROM ({_ANN_IVF_SQL})
    """,
)
def ann_topk_suite(spark, sf):
    """Tagged union of the two ANN forms (same trick as join-semi-anti)
    so BOTH ride one driver-window slot: 'brute' = exact cosine top-k
    (oracle baseline, broadcast <=8-row query side), 'ivf' = seeded
    inverted-file probe (the scale path: centroid equi-join, corpus
    never moves). The individual entries stay registered for pytest and
    the bench."""
    brute = ann_cosine_topk(spark, sf)
    ivf = ann_ivf_topk(spark, sf)
    return brute.select(F.lit("brute").alias("method"), "*").unionByName(
        ivf.select(F.lit("ivf").alias("method"), "*")
    )


_CAPPED_N, _CAPPED_CAP = 1_000_000, 80_000

_CAPPED_SQL = f"""
    WITH w0 AS (
      SELECT source,
             CAST(sum(n_chars) AS BIGINT) *
             (1 + list_reduce(list_prepend(CAST(7 AS BIGINT),
                    list_apply(list_filter(string_split(source, ''),
                                           c -> c <> ''),
                               c -> CAST(ascii(c) AS BIGINT))),
                  (a, c) -> (a * 31 + c) % 2147483647) % 8) AS w
      FROM documents GROUP BY source
    ),
    r AS (
      SELECT source, w,
             row_number() OVER (ORDER BY w DESC, source) AS rnk,
             sum(w) OVER (ORDER BY w DESC, source
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM w0
    ),
    tot AS (SELECT sum(w) AS tw, CAST(count(*) AS BIGINT) AS D FROM w0),
    ks AS (
      SELECT COALESCE(min(CASE WHEN ({_CAPPED_N} - (rnk - 1) * {_CAPPED_CAP}
                                     >= 0)
                            AND (w * ({_CAPPED_N}
                                      - (rnk - 1) * {_CAPPED_CAP})
                                 <= {_CAPPED_CAP} * (tw - (cum - w)))
                           THEN rnk - 1 END), max(D)) AS kstar
      FROM r, tot
    ),
    unc AS (
      SELECT source, w, rnk,
             {_CAPPED_N} - kstar * {_CAPPED_CAP} AS R
      FROM r, ks WHERE rnk > kstar
    ),
    wr AS (SELECT sum(w) AS wrest, CAST(count(*) AS BIGINT) AS m
           FROM unc),
    u2 AS (
      SELECT source, w, rnk, R,
             CASE WHEN wrest = 0 THEN R // m
                  ELSE (R * w) // wrest END AS base,
             CASE WHEN wrest = 0 THEN 0
                  ELSE (R * w) % wrest END AS rem
      FROM unc, wr
    ),
    u3 AS (
      SELECT source, w, rnk, base,
             row_number() OVER (ORDER BY rem DESC, source) AS rr,
             max(R) OVER () - sum(base) OVER () AS leftover
      FROM u2
    )
    SELECT source, w, rnk, 1 AS capped,
           CAST({_CAPPED_CAP} AS BIGINT) AS alloc
    FROM r, ks WHERE rnk <= kstar
    UNION ALL
    SELECT source, w, rnk, 0 AS capped,
           CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM u3
"""


@query("mix-capped-allocation", _CAPPED_SQL)
def mix_capped_allocation(spark, sf):
    """Water-filling mixture allocation with a per-domain cap
    (operators/alloc.capped_apportion): split a 1M-example budget
    across sources proportionally to a deterministic skewed weight
    (total chars x (1 + h31(source) % 8)) with NO source above 8% —
    the policy allocator of a training-mixture pipeline, solved in
    CLOSED FORM by the water-filling rank threshold instead of
    iterating cap-and-redistribute, then Hamilton largest-remainder so
    sum(alloc) == budget EXACTLY, all int64. Complements
    mix-weighted-sources (no caps) and mix-balance-temperature
    (exponent reweighting). Scale: the scan-sized work is the one
    weight aggregation; every window runs over source-count rows (the
    alloc-largest-remainder shape)."""
    from genpipe_spark.operators.alloc import capped_apportion
    from genpipe_spark.operators.dedup import _word_hash

    d = t(spark, sf, "documents")
    w = d.groupBy("source").agg(
        (
            F.sum("n_chars").cast("long")
            * (1 + _word_hash(F.col("source")) % 8)
        ).alias("w")
    )
    return capped_apportion(w, ["source"], "w", seats=_CAPPED_N,
                            cap=_CAPPED_CAP)


# the CDC chunk relation (doc -> chunk rows with 31-fold hashes),
# shared by the corpus-wide stats oracle below and the incremental
# entry's oracle (queries/streaming.py)
_CDC_CH_CTE = r"""
    WITH b AS (
      SELECT doc_id AS id, text AS t,
             list_apply(list_filter(string_split(text, ''), c -> c <> ''),
                        c -> CAST(ascii(c) AS BIGINT)) AS cs,
             CAST(length(text) AS BIGINT) AS n
      FROM documents WHERE length(text) >= 1
    ),
    be AS (
      SELECT id, t, n,
             CASE WHEN n >= 8 THEN
               list_append(
                 list_transform(
                   list_filter(range(8, n),
                     i -> ((cs[i - 0] * 1 + cs[i - 1] * 31
                            + cs[i - 2] * 961 + cs[i - 3] * 29791
                            + cs[i - 4] * 923521 + cs[i - 5] * 28629151
                            + cs[i - 6] * 887503681
                            + cs[i - 7] * 1742810347) % 2147483647)
                          % 64 = 0),
                   i -> CAST(i AS BIGINT)),
                 n)
             ELSE [n] END AS ends
      FROM b
    ),
    ck AS (
      SELECT id,
             CASE WHEN k = 1 THEN 1 ELSE ends[k - 1] + 1 END AS cstart,
             ends[k] AS cend
      FROM be, unnest(range(1, len(ends) + 1)) AS u(k)
    ),
    ch AS (
      SELECT ck.id, cend - cstart + 1 AS clen,
             list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                 list_apply(
                   list_filter(
                     string_split(substring(t, CAST(cstart AS INT),
                                            CAST(cend - cstart + 1 AS INT)),
                                  ''),
                     c -> c <> ''),
                   c -> CAST(ascii(c) AS BIGINT))),
               (a, c) -> (a * 31 + c) % 2147483647) AS chash
      FROM ck JOIN b ON b.id = ck.id
    )"""

_CDC_SQL = _CDC_CH_CTE + r""",
    cc AS (SELECT chash, count(*) AS cnt FROM ch GROUP BY chash)
    SELECT ch.id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(sum(CASE WHEN cnt >= 2 THEN clen ELSE 0 END) AS BIGINT)
             AS dup_chars,
           CAST(sum(clen) AS BIGINT) AS total_chars
    FROM ch JOIN cc ON cc.chash = ch.chash
    GROUP BY ch.id
"""


@query("dedup-cdc-chunks", _CDC_SQL)
def dedup_cdc_chunks(spark, sf):
    """Content-defined chunking dedup (operators/dedup.cdc_chunk_stats;
    the rsync/LBFS/casync family): boundaries where the rolling hash of
    the last 8 chars hits the 1/64 mask, so a one-character edit
    re-chunks ONE chunk and the rest keep their hashes — the
    shift-robust storage/transfer-unit dedup that fixed windows
    (text-line-dedup) miss. Per doc: chunk count, corpus-wide
    duplicated chunk count/chars. Scale: per-row higher-order
    expressions; the only shuffle is the 8-byte (chunk_hash, count)
    agg + count attach."""
    from genpipe_spark.operators.dedup import cdc_chunk_stats

    return cdc_chunk_stats(widen(t(spark, sf, "documents")))


_FASTTEXT_SQL = r"""
    WITH d AS (
      SELECT doc_id,
             list_apply(
               list_filter(string_split_regex(lower(text), '\s+'),
                           w -> w <> ''),
               w -> list_reduce(
                      list_prepend(CAST(7 AS BIGINT),
                        list_apply(list_filter(string_split(w, ''),
                                               c -> c <> ''),
                                   c -> CAST(ascii(c) AS BIGINT))),
                      (a, c) -> (a * 31 + c) % 2147483647)) AS wh
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             list_concat(
               wh,
               list_transform(range(1, greatest(len(wh), 1)),
                 i -> (wh[i] * 1000003 + wh[i + 1] * 9176 + 12345)
                      % 2147483647)) AS feats
      FROM d
    ),
    s AS (
      SELECT doc_id, CAST(len(feats) AS BIGINT) AS n_feat,
             CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_apply(feats,
                   x -> ((((x % 4096) + 4096) % 4096) * 2654435761
                         + 987654321) % 2147483647 % 1000001 - 500000)),
               (a, b) -> a + b) AS BIGINT) AS score_sum
      FROM f
    )
    SELECT doc_id, n_feat, score_sum,
           CASE WHEN n_feat > 0 THEN CAST(
             (score_sum * 1000000
              - ((score_sum * 1000000 % n_feat) + n_feat) % n_feat)
             // n_feat AS BIGINT) END AS mean_micro,
           CASE WHEN score_sum > 0 THEN 1 ELSE 0 END AS decision
    FROM s
"""


@query("text-fasttext-score", _FASTTEXT_SQL)
def text_fasttext_score(spark, sf):
    """fastText-style hashed-linear quality-classifier INFERENCE
    (operators/text.hashed_linear_score) — the scoring pass every
    CCNet/LLaMA-class pretraining pipeline runs over EVERY document;
    complements the heuristic rules (text-gopher-rules) and the LM
    buckets (text-perplexity-buckets) with the third standard filter
    family. Word-unigram + adjacent-bigram features through the
    portable 31-fold hash, bucketed mod 4096, summed against a PINNED
    hash-derived micro-integer weight table (a synthetic trained
    model — production swaps in the real broadcast table, constant by
    construction; nothing else changes). One whole-stage-codegen
    projection: no explode, no shuffle, no UDF."""
    from genpipe_spark.operators.text import hashed_linear_score

    return hashed_linear_score(widen(t(spark, sf, "documents")))


_FT_HOLDOUT_ORACLE_ARGS = dict(
    train_where="WHERE doc_id % 5 <> 0",
    score_where="WHERE doc_id % 5 = 0",
)


def _ft_fd(x: str, d: str) -> str:
    """Exact floor division for the DuckDB twin (// truncates toward
    zero on negatives, so floor-adjust the numerator first — the
    mean_micro idiom; mirrors operators/text._fdiv_sql)."""
    return f"((({x}) - (((({x}) % ({d})) + ({d})) % ({d}))) // ({d}))"


_FT_FOLD31 = (
    "list_reduce(list_prepend(CAST(7 AS BIGINT),"
    " list_apply(list_filter(string_split({s}, ''), c -> c <> ''),"
    " c -> CAST(ascii(c) AS BIGINT))),"
    " (a, c) -> (a * 31 + c) % 2147483647)"
)


def _fasttext_train_oracle(buckets: int = 4096, iters: int = 8,
                           lr: int = 128, gs: int = 65536,
                           train_where: str = "",
                           score_where: str = "",
                           subword_ns: tuple = (),
                           planted_y: bool = False) -> str:
    """DuckDB twin of hashed_linear_train + hashed_linear_apply: the
    full-batch GD iterations unrolled (fixed count — the
    kmeans/lpa/bpe precedent). Replayable because every step is exact
    int64: mean-normalized predictions and per-doc gradient factors
    use the shared floor-adjust division, the per-bucket gradient is
    an integer sum, and the weight update floors twice exactly like
    the driver-side Python (// on ints is floor there already).
    ``subword_ns`` mirrors _hashed_feature_rows' char-ngram subword
    features (same boundary-marked 31-fold hash). ``planted_y``
    replaces the lang-derived target with the planted linear signal
    over the feature representation itself (sign of a fixed per-bucket
    weight pattern + 10% deterministic flips — the text counterpart of
    _PLANTED_Y_SQL)."""
    sub_sql = ""
    if subword_ns:
        pad = "('<' || w0 || '>')"
        per_ns = [
            "list_transform(range(1, greatest(length({p}) - {n} + 2, 1)),"
            " i -> {h})".format(
                p=pad, n=n,
                h=_FT_FOLD31.format(s=f"substring({pad}, i, {n})"),
            )
            for n in subword_ns
        ]
        inner = " || ".join(per_ns)  # list_concat is 2-ary in DuckDB
        sub_sql = (
            " ||\n               flatten(list_transform(ws,"
            f" w0 -> ({inner})))"
        )
    head = rf"""
    WITH dteam AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END AS y,
             list_filter(string_split_regex(lower(text), '\s+'),
                         w -> w <> '') AS ws,
             list_apply(
               list_filter(string_split_regex(lower(text), '\s+'),
                           w -> w <> ''),
               w -> {_FT_FOLD31.format(s='w')}) AS wh
      FROM documents
    ),
    ff AS (
      SELECT doc_id, y,
             list_concat(
               wh,
               list_transform(range(1, greatest(len(wh), 1)),
                 i -> (wh[i] * 1000003 + wh[i + 1] * 9176 + 12345)
                      % 2147483647){sub_sql}) AS feats
      FROM dteam
    ),
    fy0 AS MATERIALIZED (
      SELECT doc_id, y, b, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(count(*)) OVER (PARTITION BY doc_id) AS BIGINT)
               AS nf
      FROM (SELECT doc_id, y,
                   ((ft % {buckets}) + {buckets}) % {buckets} AS b
            FROM (SELECT doc_id, y, unnest(feats) AS ft FROM ff))
      GROUP BY doc_id, y, b
    ),"""
    if planted_y:
        ns = _ft_fd(
            "sum(cnt * ((b * 37) % 21 - 10)) * 1000000", "any_value(nf)"
        )
        head += f"""
    yd AS (
      SELECT doc_id,
             CASE WHEN ({ns} > 400000)
                  <> (((doc_id * 1103515245 + 12345) % 2147483647)
                      % 100 < 10)
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
      FROM fy0 GROUP BY doc_id
    ),
    fy AS MATERIALIZED (
      SELECT f.doc_id, yd.y, f.b, f.cnt, f.nf
      FROM fy0 f JOIN yd USING (doc_id)
    ),"""
    else:
        head += """
    fy AS MATERIALIZED (SELECT * FROM fy0),"""
    head += f"""
    ftr AS MATERIALIZED (SELECT * FROM fy {train_where}),
    dd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS D FROM ftr),
    w0 AS (SELECT DISTINCT b, CAST(0 AS BIGINT) AS w FROM ftr)"""
    parts = [head]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""",
    r{i} AS (
      SELECT ftr.doc_id, any_value(ftr.nf) AS nf, any_value(ftr.y) AS y,
             CAST(sum(ftr.cnt * w.w) AS BIGINT) AS s
      FROM ftr JOIN w{p} w USING (b) GROUP BY ftr.doc_id
    ),
    g{i} AS (
      SELECT doc_id,
             {_ft_fd(f"({_ft_fd('s', 'nf')} - y * 1000000) * {gs}", "nf")}
               AS g
      FROM r{i}
    ),
    gr{i} AS (
      SELECT ftr.b, CAST(sum(ftr.cnt * g{i}.g) AS BIGINT) AS gr
      FROM ftr JOIN g{i} USING (doc_id) GROUP BY ftr.b
    ),
    w{i} AS MATERIALIZED (
      SELECT w.b,
             w.w - {_ft_fd(f"{lr} * {_ft_fd('gr', 'dd.D')}", str(gs))} AS w
      FROM w{p} w JOIN gr{i} USING (b) CROSS JOIN dd
    )""")
    parts.append(f"""
    SELECT doc_id, CAST(nf AS BIGINT) AS n_feat,
           CAST({_ft_fd('s', 'nf')} AS BIGINT) AS score_micro, y
    FROM (
      SELECT fs.doc_id, any_value(fs.nf) AS nf, any_value(fs.y) AS y,
             CAST(sum(fs.cnt * coalesce(w.w, 0)) AS BIGINT) AS s
      FROM (SELECT * FROM fy {score_where}) fs
      LEFT JOIN w{iters} w USING (b) GROUP BY fs.doc_id
    )
    """)
    return "".join(parts)


def _probe_rounds_cte(dim: int = 64, iters: int = 8, lr: int = 32,
                      q: int = 1000, extra_resid: bool = False,
                      train_where: str = "", y_expr: str = "") -> str:
    """Shared GD-round CTE chain for the probe and loss-curve twins:
    the weight vector as a 1-row LIST column — per round a cross join
    attaches w to every vector (1 row x corpus, the broadcast shape),
    the dot product is an exact int64 zip-reduce, and the per-dim
    gradient re-lists into the next w. With ``extra_resid`` an
    r{iters+1} CTE evaluates residuals at the FINAL weights.
    ``y_expr`` overrides the 0/1 target derivation (a SQL expression
    over ``vec_id``/``orig_label``/``qv`` — the planted-signal
    fixture's hook); the overridden target also becomes ``label`` so
    the output mirrors a corpus whose label column IS the target."""
    if y_expr:
        label_sql = f"CAST({y_expr} AS BIGINT) AS label"
        y_sql = f"CAST({y_expr} AS BIGINT) AS y"
    else:
        label_sql = "CAST(orig_label AS BIGINT) AS label"
        y_sql = ("CASE WHEN orig_label = 1 THEN CAST(1 AS BIGINT) "
                 "ELSE CAST(0 AS BIGINT) END AS y")
    head = f"""
    WITH e_raw AS MATERIALIZED (
      SELECT vec_id, label AS orig_label,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x * {q}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    e AS MATERIALIZED (
      SELECT vec_id, {label_sql}, {y_sql}, qv FROM e_raw
    ),
    etr AS MATERIALIZED (SELECT * FROM e {train_where}),
    dd AS (SELECT CAST(count(*) AS BIGINT) AS D FROM etr),
    w0 AS (SELECT list_transform(range(1, {dim} + 1),
                                 i -> CAST(0 AS BIGINT)) AS w)"""
    parts = [head]
    dot = ("list_reduce(list_prepend(CAST(0 AS BIGINT),"
           " list_apply(list_zip(qv, w.w), p -> p[1] * p[2])),"
           " (a, b) -> a + b)")
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(f""",
    r{t} AS (
      SELECT vec_id, qv,
             {_ft_fd(dot, str(q))} - y * 1000000 AS resid
      FROM etr e CROSS JOIN w{p} w
    ),
    g{t} AS (
      SELECT i, CAST(sum(qv[i] * resid) AS BIGINT) AS g
      FROM r{t}, unnest(range(1, {dim} + 1)) AS ti(i)
      GROUP BY i
    ),
    w{t} AS MATERIALIZED (
      SELECT list(wv ORDER BY i) AS w FROM (
        SELECT g{t}.i AS i,
               w.w[i] - {_ft_fd(f"{lr} * {_ft_fd('g', 'dd.D')}", str(q))}
                 AS wv
        FROM g{t} CROSS JOIN w{p} w CROSS JOIN dd)
    )"""
                     )
    if extra_resid:
        parts.append(f""",
    r{iters + 1} AS (
      SELECT vec_id, qv,
             {_ft_fd(dot, str(q))} - y * 1000000 AS resid
      FROM etr e CROSS JOIN w{iters} w
    )""")
    return "".join(parts)


_PROBE_DOT = ("list_reduce(list_prepend(CAST(0 AS BIGINT),"
              " list_apply(list_zip(qv, w.w), p -> p[1] * p[2])),"
              " (a, b) -> a + b)")


def _linear_probe_oracle(dim: int = 64, iters: int = 8, lr: int = 32,
                         q: int = 1000) -> str:
    """DuckDB twin of similarity.embedding_linear_probe (see
    _probe_rounds_cte)."""
    return _probe_rounds_cte(dim, iters, lr, q) + f"""
    SELECT vec_id, label, y,
           CAST({_ft_fd(_PROBE_DOT, str(q))} AS BIGINT) AS score_micro
    FROM e CROSS JOIN w{iters} w
    """


def _probe_loss_oracle(dim: int = 64, iters: int = 8, lr: int = 32,
                       q: int = 1000) -> str:
    """DuckDB twin of similarity.embedding_probe_loss_curve: SSE at
    each round's weights — r{t} holds residuals at w_{t-1}, so
    iter t-1's loss reads r{t}; the final loss reads the extra
    r{iters+1} at the trained weights."""
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({t - 1} AS BIGINT) AS iter,"
        f" CAST(sum(resid * resid) AS BIGINT) AS sse FROM r{t}"
        for t in range(1, iters + 2)
    )
    return (
        _probe_rounds_cte(dim, iters, lr, q, extra_resid=True)
        + "\n" + selects
    )


@query("embedding-linear-probe", _linear_probe_oracle())
def embedding_linear_probe_query(spark, sf):
    """DENSE linear probe TRAINED in-engine on the embeddings table
    (operators/similarity.embedding_linear_probe) — the dense
    counterpart of text-fasttext-train and the standard
    representation-quality measurement (probe an embedding column for
    a label before spending GPU time on it): 8 full-batch GD rounds
    in exact int64 over one-time-quantized vectors, one-vs-rest
    target y = (label = 1). The oracle replays training round by
    round with the weight vector as a 1-row list. IN-SAMPLE
    separation certified by pytest (AUC 0.767 at sf0.001 / 0.848 at
    sf0.01 vs chance 0.5 — optimizer correctness + capacity; the
    held-out measurement is embedding-probe-holdout, ~0.52 on this
    fixture's signal-free labels). Scale: per round one combinable posexplode agg
    (dim-count groups) + a dim-sized collect; scoring is a zip_with
    fold — no join anywhere."""
    from genpipe_spark.operators.similarity import embedding_linear_probe

    return embedding_linear_probe(t(spark, sf, "embeddings"))


def _probe_multiclass_oracle(dim: int = 64, classes: int = 10,
                             iters: int = 8, lr: int = 32,
                             q: int = 1000) -> str:
    """DuckDB twin of similarity.embedding_multiclass_probe: the
    jointly-descended one-vs-rest heads as a 1-row LIST-OF-LISTS
    weight column, per round a (class x dim) gradient re-listed
    class-major; final argmax with the first-position (lowest-class)
    tiebreak and the confusion-matrix aggregation."""
    dot_c = ("list_reduce(list_prepend(CAST(0 AS BIGINT),"
             " list_apply(list_zip(qv, w.w[c]), p -> p[1] * p[2])),"
             " (a, b) -> a + b)")
    cr = f"range(1, {classes + 1})"
    head = f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, CAST(label AS BIGINT) AS label,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x * {q}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    dd AS (SELECT CAST(count(*) AS BIGINT) AS D FROM e),
    w0 AS (SELECT list_transform({cr}, c ->
             list_transform(range(1, {dim} + 1),
                            i -> CAST(0 AS BIGINT))) AS w)"""
    parts = [head]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(f""",
    r{t} AS (
      SELECT vec_id, qv, label,
             list_transform({cr}, c ->
               {_ft_fd(dot_c, str(q))}
               - CASE WHEN label = c - 1 THEN 1000000 ELSE 0 END) AS rs
      FROM e CROSS JOIN w{p} w
    ),
    g{t} AS (
      SELECT c, i, CAST(sum(qv[i] * rs[c]) AS BIGINT) AS g
      FROM r{t}, unnest({cr}) AS tc(c),
           unnest(range(1, {dim} + 1)) AS ti(i)
      GROUP BY c, i
    ),
    w{t} AS MATERIALIZED (
      SELECT list(wc ORDER BY c) AS w FROM (
        SELECT c,
               list(w.w[c][i]
                    - {_ft_fd(f"{lr} * {_ft_fd('g', 'dd.D')}", str(q))}
                    ORDER BY i) AS wc
        FROM g{t} CROSS JOIN w{p} w CROSS JOIN dd GROUP BY c)
    )""")
    parts.append(f""",
    scored AS (
      SELECT label,
             list_transform({cr}, c -> {_ft_fd(dot_c, str(q))}) AS sc
      FROM e CROSS JOIN w{iters} w
    )
    SELECT label,
           CAST(list_position(sc,
                  list_reduce(sc, (a, b) ->
                    CASE WHEN b > a THEN b ELSE a END)) - 1 AS BIGINT)
             AS pred,
           CAST(count(*) AS BIGINT) AS n
    FROM scored GROUP BY 1, 2
    """)
    return "".join(parts)


@query("embedding-probe-multiclass", _probe_multiclass_oracle())
def embedding_probe_multiclass(spark, sf):
    """MULTICLASS linear probe, trained in-engine and scored as a
    CONFUSION MATRIX (operators/similarity.embedding_multiclass_probe)
    — ten one-vs-rest heads jointly descended for 8 exact-int64 GD
    rounds over the quantized embeddings, argmax prediction with the
    lowest-class tiebreak (array_position/list_position both take the
    FIRST max). IN-SAMPLE accuracy 0.406/0.420 at sf0.001/sf0.01 vs
    0.1 chance, pytest-gated (fit, not generalization — see
    embedding-probe-holdout for the split harness). Scale: per round one combinable posexplode agg over
    class x dim groups + a (classes x dim) collect; prediction is a
    pure projection."""
    from genpipe_spark.operators.similarity import (
        embedding_multiclass_probe,
    )

    return embedding_multiclass_probe(t(spark, sf, "embeddings"))


def _probe_calibration_oracle(dim: int = 64, iters: int = 8,
                              lr: int = 32, q: int = 1000) -> str:
    """DuckDB twin of embedding-probe-calibration: the probe chain,
    then exact decile bins by (score, id) rank and per-bin integer
    mean score / positive rate."""
    return _probe_rounds_cte(dim, iters, lr, q) + f""",
    scored AS MATERIALIZED (
      SELECT vec_id, y,
             CAST({_ft_fd(_PROBE_DOT, str(q))} AS BIGINT) AS score_micro
      FROM e CROSS JOIN w{iters} w
    ),
    ranked AS (
      SELECT vec_id, y, score_micro,
             row_number() OVER (ORDER BY score_micro, vec_id) AS rn,
             count(*) OVER () AS D
      FROM scored
    )
    SELECT CAST(((rn - 1) * 10) // D AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST({_ft_fd('sum(score_micro)', 'count(*)')} AS BIGINT)
             AS mean_score_micro,
           CAST((1000000 * sum(y)) // count(*) AS BIGINT)
             AS pos_rate_micro
    FROM ranked GROUP BY 1
    """


@query("embedding-probe-calibration", _probe_calibration_oracle())
def embedding_probe_calibration(spark, sf):
    """CALIBRATION TABLE of the trained dense probe — the reliability
    diagram every score-based filter gets before a threshold is
    chosen: exact decile bins by (score, id) rank, per-bin count,
    integer mean score, and positive rate (micro). Rank rides
    operators/relational.global_row_number (range-partition + offset
    broadcast — no single-reducer window over scan-sized input; the
    DuckDB twin's plain OVER () is fine there, DuckDB is one node by
    construction). Monotone bin->pos_rate separation is
    pytest-asserted on top of the parity gate."""
    from genpipe_spark.operators.relational import global_row_number
    from genpipe_spark.operators.similarity import embedding_linear_probe
    from genpipe_spark.operators.text import _fdiv_sql

    scores = embedding_linear_probe(t(spark, sf, "embeddings")).select(
        "vec_id", "y", "score_micro"
    )
    rn = global_row_number(
        scores, ["score_micro", "vec_id"], alias="rn"
    )
    tot = scores.agg(F.count(F.lit(1)).cast("long").alias("D"))
    binned = rn.crossJoin(F.broadcast(tot)).select(
        "y", "score_micro",
        F.expr("((rn - 1) * 10) div D").alias("bin"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("score_micro").alias("__ss"),
        F.sum("y").alias("__sy"),
    )
    return agg.select(
        "bin", "n",
        F.expr(_fdiv_sql("__ss", "n")).alias("mean_score_micro"),
        F.expr("(1000000 * __sy) div n").alias("pos_rate_micro"),
    )


_HOLDOUT_TRAIN = "WHERE vec_id % 5 <> 0"


@query(
    "embedding-probe-holdout",
    _probe_rounds_cte(train_where=_HOLDOUT_TRAIN) + f"""
    SELECT vec_id, label, y,
           CAST({_ft_fd(_PROBE_DOT, '1000')} AS BIGINT) AS score_micro
    FROM e CROSS JOIN w8 w
    WHERE vec_id % 5 = 0
    """,
)
def embedding_probe_holdout(spark, sf):
    """HELD-OUT evaluation of the dense probe — the train/test split
    every honest model measurement needs (train on vec_id % 5 != 0,
    score ONLY the held-out fifth with the trained weights). On this
    synthetic fixture the held-out AUC is ~0.52 at every SF while the
    in-sample AUC is 0.77-0.85 — i.e. the fixture's labels carry
    little generalizable linear signal and the in-sample separation is
    capacity, which is EXACTLY what a train/test harness exists to
    reveal (the generalization gap is pytest-pinned). The oracle
    replays training on the same split and scores the same held-out
    rows."""
    from genpipe_spark.operators.similarity import embedding_linear_probe

    emb = t(spark, sf, "embeddings")
    return embedding_linear_probe(
        emb.where(F.col("vec_id") % 5 != 0),
        score_corpus=emb.where(F.col("vec_id") % 5 == 0),
    )


_PLANTED_Y_SQL = (
    "CASE WHEN (list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_apply(list_zip(qv, list_transform(range(1, 65),"
    " j -> CAST((j * 37) % 21 - 10 AS BIGINT))),"
    " p -> p[1] * p[2])), (a, b) -> a + b) > 0)"
    " <> (((vec_id * 1103515245 + 12345) % 2147483647) % 100 < 10)"
    " THEN 1 ELSE 0 END"
)


def _planted_y_col(vid, emb, q_scale: int = 1000):
    """Spark twin of _PLANTED_Y_SQL: labels with a RECOVERABLE linear
    signal — y = sign(w* . q) with 10% deterministic flips, where
    w*_j = (j*37) % 21 - 10 (j 1-based) and q is the probe's own
    round(x*1000) quantization. Exact int64 both engines."""
    from genpipe_spark.operators.similarity import as_double

    ws = F.array(*[
        F.lit((j * 37) % 21 - 10).cast("long") for j in range(1, 65)
    ])
    qv = F.transform(
        as_double(emb), lambda x: F.round(x * q_scale).cast("long")
    )
    sig = F.aggregate(
        F.zip_with(qv, ws, lambda x, w: x * w),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    flip = (
        (vid * F.lit(1103515245) + F.lit(12345)) % F.lit(2147483647)
    ) % 100 < 10
    return F.when((sig > 0) != flip, 1).otherwise(0).cast("long")


@query(
    "embedding-probe-planted",
    _probe_rounds_cte(train_where=_HOLDOUT_TRAIN,
                      y_expr=_PLANTED_Y_SQL) + f"""
    SELECT vec_id, label, y,
           CAST({_ft_fd(_PROBE_DOT, '1000')} AS BIGINT) AS score_micro
    FROM e CROSS JOIN w8 w
    WHERE vec_id % 5 = 0
    """,
)
def embedding_probe_planted(spark, sf):
    """PLANTED-SIGNAL held-out evaluation (VERDICT r11 #4): the
    fixture's native labels carry no generalizable linear signal
    (embedding-probe-holdout measures ~0.52 held-out AUC), so the
    holdout harness could not distinguish a working learner from a
    broken one. This entry plants a RECOVERABLE signal — y =
    sign(w* . q) with 10% deterministic label flips (w*_j =
    (j*37)%21-10, flips keyed on vec_id, both exact int64 — see
    _PLANTED_Y_SQL) — trains on vec_id % 5 != 0, and scores ONLY the
    held-out fifth. Held-out AUC >= 0.7 is pytest-asserted, turning
    the honesty disclosure into a real acceptance gate: a trainer
    that stops learning (zero gradients, sign bug, wrong feature
    wiring) now FAILS a test instead of shipping a plausible ~0.5.
    The oracle replays split training on the same planted labels and
    scores the same held-out rows."""
    from genpipe_spark.operators.similarity import embedding_linear_probe

    emb = t(spark, sf, "embeddings").select(
        "vec_id", "embedding",
        _planted_y_col(F.col("vec_id"), F.col("embedding")).alias("y"),
    )
    return embedding_linear_probe(
        emb.where(F.col("vec_id") % 5 != 0),
        label_col="y",
        score_corpus=emb.where(F.col("vec_id") % 5 == 0),
    )


@query("embedding-probe-loss-curve", _probe_loss_oracle())
def embedding_probe_loss_curve_query(spark, sf):
    """TRAINING TRANSCRIPT of the dense linear probe
    (operators/similarity.embedding_probe_loss_curve): exact int64
    SSE at every GD round's weights, t = 0..8 — the learning
    diagnostic that proves descent (strict monotone decrease is
    pytest-asserted; the oracle replays every round, so a silently
    diverging trainer fails parity AND the monotonicity gate). SSE_0
    = 1e12 x n_positives pins the zero-model baseline."""
    from genpipe_spark.operators.similarity import (
        embedding_probe_loss_curve,
    )

    return embedding_probe_loss_curve(t(spark, sf, "embeddings"))


@query(
    "text-fasttext-holdout",
    _fasttext_train_oracle(**_FT_HOLDOUT_ORACLE_ARGS),
)
def text_fasttext_holdout(spark, sf):
    """HELD-OUT evaluation of the trained fastText-style classifier:
    train on doc_id % 5 != 0, score ONLY the held-out fifth with the
    learned broadcast table (unseen buckets coalesce to weight 0 —
    both engines LEFT-join the weight table). The honest counterpart
    of text-fasttext-train's in-sample AUC: on this fixture the
    held-out AUC is ~0.55 at sf0.01 and ~0.53 at sf0.1 vs in-sample
    0.73-0.75 — the per-language word-frequency differences are too
    weak to generalize from hundreds of docs, and the train/test
    harness reports that instead of hiding it (the generalization gap
    is pytest-pinned). The oracle replays split training and held-out
    scoring."""
    from genpipe_spark.operators.text import (
        hashed_linear_apply,
        hashed_linear_train,
    )

    docs = widen(t(spark, sf, "documents")).select(
        "doc_id", "text",
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    weights = hashed_linear_train(
        docs.where(F.col("doc_id") % 5 != 0), label_col="y"
    )
    return hashed_linear_apply(
        docs.where(F.col("doc_id") % 5 == 0), weights, label_col="y"
    )


_FT_SUBWORD_NS = (3, 4)


@query(
    "text-fasttext-planted",
    _fasttext_train_oracle(subword_ns=_FT_SUBWORD_NS, planted_y=True,
                           **_FT_HOLDOUT_ORACLE_ARGS),
)
def text_fasttext_planted(spark, sf):
    """SUBWORD-FEATURED fastText trainer on a PLANTED-SIGNAL holdout
    (VERDICT r11 #4 + #6): features add the boundary-marked char 3/4-
    grams of every word (operators/text._hashed_feature_rows
    subword_ns — fastText's actual trick, same portable 31-fold hash,
    same buckets), and the target carries a RECOVERABLE linear signal
    in the feature representation itself: y = (fdiv(sig*1e6, nf) >
    400000) with 10% deterministic doc_id-keyed flips, where sig is a
    fixed per-bucket weight pattern ((b*37)%21-10) summed over the
    doc's own feature counts and 400000 is the stable cross-SF median
    (probed at sf0.001/0.01/0.1). Trains on doc_id % 5 != 0, scores
    ONLY the held-out fifth; held-out AUC >= 0.7 is pytest-asserted —
    with text-fasttext-holdout's ~0.53 on the native weak-signal
    labels, the pair certifies BOTH that the harness reports failure
    to generalize AND that the trainer genuinely learns when signal
    exists. The oracle replays planted labeling, split training, and
    held-out scoring."""
    from genpipe_spark.operators.text import (
        _fdiv_sql,
        _hashed_feature_rows,
        hashed_linear_apply,
        hashed_linear_train,
    )

    docs = widen(t(spark, sf, "documents")).select("doc_id", "text")
    fx = _hashed_feature_rows(
        docs, "text", "doc_id", 4096, subword_ns=_FT_SUBWORD_NS
    )
    ws_b = (F.col("b") * 37) % 21 - 10
    sig = fx.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * ws_b).alias("sig"),
        F.first("nf").alias("nf"),
    )
    flip = (
        (F.col("doc_id") * F.lit(1103515245) + F.lit(12345))
        % F.lit(2147483647)
    ) % 100 < 10
    y = sig.select(
        "doc_id",
        (
            (F.expr(_fdiv_sql("sig * 1000000", "nf")) > 400000) != flip
        ).cast("long").alias("y"),
    )
    labeled = docs.join(y, "doc_id")
    weights = hashed_linear_train(
        labeled.where(F.col("doc_id") % 5 != 0),
        label_col="y", subword_ns=_FT_SUBWORD_NS,
    )
    return hashed_linear_apply(
        labeled.where(F.col("doc_id") % 5 == 0), weights,
        label_col="y", subword_ns=_FT_SUBWORD_NS,
    )


@query("text-fasttext-train", _fasttext_train_oracle())
def text_fasttext_train(spark, sf):
    """fastText-style quality/language classifier TRAINED FOR REAL
    (VERDICT r10 #1; operators/text.hashed_linear_train) — 8 unrolled
    full-batch GD iterations in exact int64 micro-unit arithmetic over
    the same hashed unigram+bigram features the inference entry
    scores with, labeled y = (lang = 'en'): language ID, fastText's
    flagship pretraining-pipeline job (CCNet's first filter stage).
    The oracle replays TRAINING itself iteration by iteration (the
    kmeans_centroids_exact recipe applied to supervised learning), so
    the learned weights are certified, not pinned. Output: per-doc
    learned score (doc_id, n_feat, score_micro, y); IN-SAMPLE
    separation vs the label is certified by the AUC test (~0.73 at
    sf0.001/sf0.01 vs the untrained/synthetic 0.5 — optimizer
    correctness + fit; the honest held-out measurement is
    text-fasttext-holdout, ~0.55 on this weak-signal fixture).

    Scale: per iteration two combinable aggregations + a broadcast
    weight join over the once-materialized exploded feature table;
    the only collect is the <= 4096-row gradient."""
    from genpipe_spark.operators.text import (
        hashed_linear_apply,
        hashed_linear_train,
    )

    docs = widen(t(spark, sf, "documents")).select(
        "doc_id", "text",
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    weights = hashed_linear_train(docs, label_col="y")
    return hashed_linear_apply(docs, weights, label_col="y")


def _ann_kmeans_oracle(k_cents: int = 8, iters: int = 3, k: int = 5,
                       scale: int = 1_000_000) -> str:
    """DuckDB twin of the TRAINED-centroid IVF (kmeans_centroids_exact
    + ivf_topk): the Lloyd iterations unrolled (fixed count, the
    lpa/markov/bpe precedent). Replayable because centroids are exact
    int64 member-SUM vectors of one-time-quantized inputs (cosine is
    scale-invariant, so sum == mean for assignment) — the only
    reductions are integer, and every cosine is the shared
    strict-left-fold on identical double-cast values."""
    parts = [f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x*{scale}) AS BIGINT)) AS vq
      FROM embeddings
    ),
    ed AS MATERIALIZED (
      SELECT vec_id, vq, list_transform(vq, x -> x::DOUBLE) AS v FROM e
    ),
    c0 AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
               AS cent_id, v AS cent_v
      FROM (SELECT vec_id, v FROM ed ORDER BY vec_id LIMIT {k_cents})
    )"""]
    for i in range(1, iters + 1):
        parts.append(f""",
    a{i} AS (
      SELECT vec_id, vq, cell FROM (
        SELECT ed.vec_id, ed.vq, cent_id AS cell,
               row_number() OVER (
                 PARTITION BY ed.vec_id
                 ORDER BY {_cos_sql('ed.v', 'cent_v')} DESC, cent_id
               ) AS rn
        FROM ed CROSS JOIN c{i - 1}) WHERE rn = 1
    ),
    s{i} AS (
      SELECT cell, list(s ORDER BY pos) AS sum_v FROM (
        SELECT cell, i AS pos, CAST(sum(vq[i]) AS BIGINT) AS s
        FROM a{i}, unnest(range(1, len(vq) + 1)) AS ti(i)
        GROUP BY cell, i)
      GROUP BY cell
    ),
    c{i} AS MATERIALIZED (
      SELECT p.cent_id,
             COALESCE(list_transform(s{i}.sum_v, x -> x::DOUBLE),
                      p.cent_v) AS cent_v
      FROM c{i - 1} p LEFT JOIN s{i} ON s{i}.cell = p.cent_id
    )""")
    parts.append(f""",
    fa AS MATERIALIZED (
      SELECT vec_id, v, cell FROM (
        SELECT ed.vec_id, ed.v, cent_id AS cell,
               row_number() OVER (
                 PARTITION BY ed.vec_id
                 ORDER BY {_cos_sql('ed.v', 'cent_v')} DESC, cent_id
               ) AS rn
        FROM ed CROSS JOIN c{iters}) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, cell
          FROM fa WHERE vec_id < 8),
    pairs AS (
      SELECT query_id, a.vec_id AS neighbor_id,
             {_cos_sql('qv', 'a.v')} AS cos
      FROM fa a JOIN q ON a.cell = q.cell AND a.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, rank, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rank
      FROM pairs)
    WHERE rank <= {k}
    """)
    return "".join(parts)


@query("ann-ivf-kmeans", _ann_kmeans_oracle(8, 3, 5))
def ann_ivf_kmeans(spark, sf):
    """IVF probe over TRAINED centroids (spherical k-means, 3 Lloyd
    iterations) instead of the first-N seeds — the production IVF
    path. CERTIFIED r10 (formerly rows-only): centroids are exact
    int64 member-sum vectors over one-time-quantized inputs
    (operators/similarity.kmeans_centroids_exact — cosine is
    scale-invariant, so the sum direction IS the mean direction), so
    training is a pure function of the data and the DuckDB twin
    replays all three iterations plus the probe exactly. The probe
    runs on the same quantized vectors so every cosine in both engines
    folds identical doubles."""
    emb = t(spark, sf, "embeddings")
    embq = emb.select(
        "vec_id",
        F.transform(
            S.as_double(F.col("embedding")),
            lambda x: F.round(x * 1_000_000).cast("long").cast("double"),
        ).alias("embedding"),
    )
    cents = S.kmeans_centroids_exact(embq, num_centroids=8, iters=3,
                                     scale=1)
    return S.ivf_topk(embq, embq.where(F.col("vec_id") < 8), k=5,
                      centroids=cents)


def _lsh_pairs_sql(threshold: float = 0.35, num_planes: int = 12,
                   num_tables: int = 4, dim: int = 64) -> str:
    """DuckDB twin of operators/similarity.lsh_near_dup_pairs: the
    hyperplanes are deterministic (hash-derived components), so the twin
    inlines the same plane constants and replays signature → bucket-join
    → exact-cosine filter. Both engines compute dot products as strict
    left folds → identical signs → identical buckets and output."""

    def comp(tb: int, pl: int, d: int) -> float:
        h = (tb * 1_000_003 + pl * 10_007 + d * 97 + 12345) * 2654435761 % (2**32)
        return (h % 1000) / 1000.0 - 0.5

    selects = []
    for tb in range(num_tables):
        bit_terms = []
        for pl in range(num_planes):
            arr = "[" + ", ".join(repr(comp(tb, pl, d)) for d in range(dim)) + "]"
            dot = (
                f"list_reduce(list_prepend(0.0, list_apply(list_zip(v, {arr}),"
                " s -> s[1]*s[2])), (x, y) -> x + y)"
            )
            w = 2 ** (num_planes - 1 - pl)
            bit_terms.append(
                f"(CASE WHEN {dot} >= 0 THEN CAST({w} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
        selects.append(
            f"SELECT vec_id AS id, v, {tb} AS tbl, " + " + ".join(bit_terms) + " AS sig FROM e"
        )
    tagged = "\n      UNION ALL\n      ".join(selects)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    tagged AS (
      {tagged}
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM tagged a JOIN tagged b
        ON a.tbl = b.tbl AND a.sig = b.sig AND a.id < b.id
    )
    SELECT id_a, id_b, {_cos_sql('ea.v', 'eb.v')} AS cos
    FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
    WHERE {_cos_sql('ea.v', 'eb.v')} >= {threshold}
    """


@query("similarity-lsh-pairs", _lsh_pairs_sql())
def similarity_lsh_pairs(spark, sf):
    return S.lsh_near_dup_pairs(t(spark, sf, "embeddings"), threshold=0.35)


# ---------------------------------------------------------- text analysis

def _hits_sql(stops: list[str]) -> str:
    lst = ",".join(f"'{s}'" for s in stops)
    return f"len(list_filter(ws, w -> list_contains([{lst}], lower(w))))"




_TEXT_METRICS_ORACLE = rf"""
    WITH d AS (
      SELECT doc_id, lang, text,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
      FROM documents
    ), scored AS (
      SELECT doc_id,
             {{h_de}} AS h_de, {{h_en}} AS h_en, {{h_es}} AS h_es, {{h_fr}} AS h_fr
      FROM d
    )
    SELECT d.doc_id, lang,
           len(ws) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_ish,
           floor(list_reduce(list_prepend(0, list_apply(ws, w -> length(w))), (a,b) -> a + b)
                 / len(ws) * 10000)/10000.0 AS mean_token_len,
           floor({{h_en}} / len(ws) * 10000)/10000.0 AS stopword_ratio,
           floor(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                 / length(text) * 10000)/10000.0 AS punct_ratio,
           floor(len(regexp_extract_all(text, '[A-Z]'))
                 / length(text) * 10000)/10000.0 AS upper_ratio,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS lang_pred,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_apply(ws, w ->
               list_reduce(list_prepend(CAST(7 AS BIGINT),
                 list_apply(list_filter(string_split(w, ''), c -> c <> ''), c -> CAST(ascii(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % 2147483647))),
             (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fp,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                               '\s+', ' ', 'g')) AS norm_text
    FROM d JOIN scored ON scored.doc_id = d.doc_id
""".format(
    h_de=_hits_sql(T.STOPWORDS["de"]),
    h_en=_hits_sql(T.STOPWORDS["en"]),
    h_es=_hits_sql(T.STOPWORDS["es"]),
    h_fr=_hits_sql(T.STOPWORDS["fr"]),
)


@query("text-metrics", _TEXT_METRICS_ORACLE)
def text_metrics(spark, sf):
    """One wide per-document query covering the five scalar text-analysis
    slugs — each column set was an individually-green oracle query in r01;
    the merge frees driver correctness-window slots (COVERAGE.md):

      n_tokens, n_bpe_ish                      text-token-count
      mean_token_len, stopword_ratio,
      punct_ratio, upper_ratio                 text-quality-score
      lang, lang_pred                          text-langid
      fp                                       text-fingerprint
      norm_text                                text-normalize
    """
    out = T.token_count(widen(t(spark, sf, "documents")))
    out = T.quality_score(out)
    out = T.lang_id(out)
    out = T.fingerprint(out)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    return out.select(
        "doc_id", "lang", "n_tokens", "n_bpe_ish", "mean_token_len",
        "stopword_ratio", "punct_ratio", "upper_ratio", "lang_pred", "fp",
        norm.alias("norm_text"),
    )


# ---------------------------------------------------------- multimodal



_MM_SUITE_ORACLE = """
    WITH d AS (
      SELECT doc_id AS media_id, length(text) AS n,
             list_apply(list_filter(string_split(text, ''), c -> c <> ''),
                        c -> CAST(ascii(c) AS BIGINT)) AS bs,
             n_chars
      FROM documents
    ), feats AS (
      SELECT media_id, n,
             list_transform(range(0, 16), j ->
               CASE WHEN j * greatest(n // 16, 1) < n THEN
                 (list_reduce(list_prepend(CAST(7 AS BIGINT),
                    bs[1:(j * greatest(n // 16, 1) + 1)]),
                    (a, c) -> (a * 31 + c) % 1000003) % 2000) - 1000
               ELSE 0 END) AS ints
      FROM d
    )
    SELECT 'features' AS part, media_id, 'image' AS kind,
           CAST(n AS BIGINT) AS n1, array_to_string(ints, '|') AS v1
    FROM feats
    UNION ALL
    SELECT 'frame' AS part, media_id, 'video' AS kind,
           CAST(unnest(range(0, n_chars % 5000 + 1, 1000)) AS BIGINT) AS n1,
           '' AS v1
    FROM d
    UNION ALL
    -- REAL-codec leg: re-derive the decoded PPM pixels / WAV samples from
    -- their closed-form integer recurrences (operators/multimodal.py
    -- synth_media_real) and aggregate; flat index i runs c-fastest
    SELECT 'codec' AS part, doc_id AS media_id, 'image' AS kind,
           CAST(w*h AS BIGINT) AS n1,
           CAST(SUM(v) AS VARCHAR) || ':' || CAST(MAX(v) AS VARCHAR) AS v1
    FROM (
      SELECT doc_id, w, h,
             (doc_id*7 + 3*(i%3) + (i//3)%w + (i//3)//w) % 256 AS v
      FROM (SELECT doc_id, doc_id%13+4 AS w, doc_id%11+4 AS h,
                   unnest(range((doc_id%13+4)*(doc_id%11+4)*3)) AS i
            FROM documents WHERE doc_id%2=0)
    )
    GROUP BY doc_id, w, h
    UNION ALL
    SELECT 'codec' AS part, doc_id AS media_id, 'audio' AS kind,
           CAST(n AS BIGINT) AS n1,
           CAST(SUM(s) AS VARCHAR) || ':' || CAST(MAX(s) AS VARCHAR) AS v1
    FROM (
      SELECT doc_id, n, (doc_id*31 + 17*unnest(range(n))) % 16384 - 8192 AS s
      FROM (SELECT doc_id, doc_id%512+64 AS n FROM documents WHERE doc_id%2=1)
    )
    GROUP BY doc_id, n
"""


@query("multimodal-suite", _MM_SUITE_ORACLE)
def multimodal_suite(spark, sf):
    """Tagged union covering both multimodal slugs (COVERAGE.md):

      part='features'  multimodal-features — binary payload → mapInPandas
        Arrow-batch fake decode (operators/multimodal.extract_features);
        the deterministic rolling-hash features are re-derived in the
        DuckDB twin over the payload bytes, and serialized as exact
        integers round(f*1000) so float32→double conversion can't skew
        the hash. The REAL-codec path stays NotImplementedError-gated.
      part='frame'     multimodal-frame-sample — video frame-sampling row
        fan-out (one row per sampled timestamp), duration derived
        deterministically from n_chars so the twin can replay it.
      part='codec'     REAL codec path — synth_media_real manufactures
        genuine PPM/WAV payloads, decode_features parses them back with
        the actual codecs (functions/codecs.py) and aggregates the decoded
        pixels/samples; the twin recomputes the same aggregates from the
        generating integer recurrences, so a hash match verifies the full
        encode→decode→feature chain bit-exactly.
    """
    d = widen(t(spark, sf, "documents"))
    media = documents_as_media(d)
    feats = extract_features(media, dim=16, use_fake_decoder=True)
    ints = F.transform(
        F.col("feature"), lambda x: F.round(x * 1000).cast("int").cast("string")
    )
    features = feats.select(
        F.lit("features").alias("part"),
        "media_id",
        F.col("kind"),
        F.col("n_bytes").alias("n1"),
        F.concat_ws("|", ints).alias("v1"),
    )
    video = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("fake/raw").alias("codec"),
        (F.col("n_chars") % 5000 + 1).cast("long").alias("duration_ms"),
    )
    frames = frame_sample_stub(video, every_ms=1000).select(
        F.lit("frame").alias("part"),
        "media_id",
        F.lit("video").alias("kind"),
        F.col("frame_ts_ms").alias("n1"),
        F.lit("").alias("v1"),
    )
    real = decode_features(synth_media_real(d)).select(
        F.lit("codec").alias("part"),
        "media_id",
        "kind",
        F.col("n_units").alias("n1"),
        F.concat_ws(":", F.col("v_sum"), F.col("v_max")).alias("v1"),
    )
    return features.unionByName(frames).unionByName(real)




def _token_chunk_structs(ws, width):
    """array<struct<chunk_id,chunk_text,n_tokens>> of fixed
    ``width``-token windows over the word array ``ws``. Empty-safe: a
    doc with zero tokens yields an EMPTY array — F.sequence(0, -1)
    would otherwise produce a descending [0, -1] phantom pair (Spark
    sequence walks downward when end < start), which the DuckDB twins'
    range(0, 0) never emits."""
    n = F.size(ws)
    n_chunks = F.ceil(n / float(width)).cast("long")
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<bigint>")
    )
    return F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(ws, i * width + 1, width)).alias("chunk_text"),
            F.least(F.lit(width).cast("long"), n - i * width).alias("n_tokens"),
        ),
    )


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

    d = widen(t(spark, sf, "documents"))
    ws_expr = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    ex = d.select(
        "doc_id",
        F.explode(bind(ws_expr, lambda ws: _token_chunk_structs(ws, 64))).alias("c"),
    )
    return ex.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


# the DuckDB twin of operators/dedup._word_hash (31-bit polynomial fold)
_WORD_HASH_SQL = (
    "list_reduce(list_prepend(CAST(7 AS BIGINT), "
    "list_apply(list_filter(string_split({w}, ''), c -> c <> ''), "
    "c -> CAST(ascii(c) AS BIGINT))), (a, c) -> (a * 31 + c) % 2147483647)"
)


def _kmv_sql(k: int = 64) -> str:
    est = (
        f"CASE WHEN n_mins < {k} THEN n_mins "
        f"ELSE CAST(floor({k - 1} * 2147483647.0 / h_k) AS BIGINT) END"
    )
    return f"""
    WITH words AS (
      SELECT word FROM (SELECT unnest(string_split(text, ' ')) AS word
                        FROM documents) WHERE word <> ''
    ),
    hs AS (SELECT DISTINCT ({_WORD_HASH_SQL.format(w='word')}
                            * {2654435761 % 2147483647}) % 2147483647 AS h
           FROM words),
    bk AS (SELECT h FROM hs ORDER BY h LIMIT {k}),
    agg AS (SELECT count(*) AS n_mins, max(h) AS h_k FROM bk),
    ex AS (SELECT count(DISTINCT word) AS n_exact FROM words)
    SELECT 'global' AS part, {k} AS k, n_mins, h_k, {est} AS est, n_exact
    FROM agg, ex
    UNION ALL
    SELECT 'merged' AS part, {k} AS k, n_mins, h_k, {est} AS est, n_exact
    FROM agg, ex
    """


@query("sketch-kmv-distinct", _kmv_sql())
def sketch_kmv_distinct(spark, sf):
    """KMV (bottom-k) distinct-count sketch over the corpus vocabulary —
    deterministic and oracle-replayable, unlike HLL (operators/sketch.py).
    Two parts: 'global' sketches all words at once; 'merged' merges two
    half-corpus sketches (doc_id parity split) — KMV merge is exact, so
    both rows must agree on every value, verifying mergeability in-query."""
    from genpipe_spark.operators.sketch import kmv_estimate, kmv_merge, kmv_sketch

    K = 64
    # no widen(): the per-word hash is cheap and kmv's distinct shuffles
    # anyway — an extra text shuffle here measured net-negative
    docs = t(spark, sf, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    n_exact = words.agg(F.countDistinct("w").alias("n_exact"))

    def finish(sketch_df, part):
        mins = F.col("mins")
        return sketch_df.crossJoin(n_exact).select(
            F.lit(part).alias("part"),
            F.lit(K).alias("k"),
            F.size(mins).cast("long").alias("n_mins"),
            # empty corpus -> size 0 -> element_at(·, 0) throws under
            # ANSI; guard to a null h_k instead
            F.when(
                F.size(mins) > 0,
                F.element_at(mins, F.least(F.lit(K), F.size(mins))),
            ).alias("h_k"),
            kmv_estimate(mins, K).alias("est"),
            "n_exact",
        )

    glob = kmv_sketch(words, "w", K)
    halves = [
        kmv_sketch(words.where(F.col("doc_id") % 2 == i), "w", K) for i in (0, 1)
    ]
    merged = (
        halves[0]
        .select(F.col("mins").alias("a"))
        .crossJoin(halves[1].select(F.col("mins").alias("b")))
        .select(kmv_merge(F.col("a"), F.col("b"), K).alias("mins"))
    )
    return finish(glob, "global").unionByName(finish(merged, "merged"))


# DuckDB replay of the CM sketch (operators/sketch.py CMS constants:
# depth 4, width 1024, pairwise hash (h31(w)*A_d + B_d) mod M31 mod w)
_CMS_HASH = """((h * ([1000003,1000033,1000037,1000039])[d.depth+1]
             + ([12289,24593,49157,98317])[d.depth+1]) % 2147483647) % 1024"""

_CMS_SQL = rf"""
WITH words AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
hashed AS (
  SELECT w,
         list_reduce(list_prepend(CAST(7 AS BIGINT),
           list_apply(list_filter(string_split(w, ''), c -> c <> ''),
                      c -> CAST(ascii(c) AS BIGINT))),
           (a, c) -> (a * 31 + c) % 2147483647) AS h
  FROM words
),
cells AS (
  SELECT d.depth, {_CMS_HASH} AS bucket, count(*) AS c
  FROM hashed, unnest([0,1,2,3]) d(depth)
  GROUP BY 1, 2
),
exact AS (SELECT w, min(h) AS h, count(*) AS n_exact FROM hashed GROUP BY w),
total AS (SELECT count(*) AS n_total FROM words),
probes AS (
  SELECT w, n_exact, d.depth, {_CMS_HASH} AS bucket
  FROM exact, unnest([0,1,2,3]) d(depth)
),
est AS (
  SELECT w AS key, any_value(n_exact) AS n_exact, min(coalesce(c, 0)) AS est
  FROM probes LEFT JOIN cells USING (depth, bucket)
  GROUP BY w
)
SELECT key, est::BIGINT AS est, n_exact::BIGINT AS n_exact,
       (SELECT n_total FROM total)::BIGINT AS n_total
FROM est
WHERE est * 10000 >= 100 * (SELECT n_total FROM total)
"""


@query("sketch-cms-heavy", _CMS_SQL)
def sketch_cms_heavy(spark, sf):
    """Count-Min heavy hitters over the corpus word stream
    (operators/sketch.py cms_*): hot-key detection with d*w counters of
    state regardless of key cardinality — the sketch that feeds the
    salting decision (operators/skew.py) at 100 TB. Built as TWO
    half-corpus sketches merged cell-wise (cms_merge is an exact
    cell-wise sum), while the DuckDB oracle builds ONE full-corpus
    sketch — equality of every estimate IS the mergeability proof,
    checked by the driver. ``n_exact`` rides along so the CMS
    overestimate bound is visible in the output; the 1%-of-total filter
    compares in integer basis points on the ESTIMATE (both engines
    replay identical collision arithmetic, so the kept set matches)."""
    from genpipe_spark.operators.sketch import cms_estimate, cms_merge, cms_sketch

    docs = t(spark, sf, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    halves = [cms_sketch(words.where(F.col("doc_id") % 2 == i), "w") for i in (0, 1)]
    sk = cms_merge(*halves)
    # r12 A/B adjudication — LEFT ALONE: deriving n_total from the
    # exact count table (sum of group counts == total words) removes
    # one corpus pass on paper, but totals feeds a broadcast subquery
    # that runs as its OWN job, so nothing shares the exact agg's
    # shuffle with it: both the lazy-checkpoint form (+20%) and the
    # rely-on-reuse form (+14%) measured SLOWER than this narrow
    # map-side count pass in interleaved A/B at sf0.1 — and at scale a
    # narrow scan+count is also cheaper than an unshared re-shuffle of
    # the explode. The totals pass stays.
    exact = words.groupBy("w").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_estimate(exact.select("w"), "w", sk)
    totals = words.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        est.join(exact, "w")
        .crossJoin(F.broadcast(totals))
        .where(F.col("est") * 10_000 >= F.lit(100) * F.col("n_total"))
        .select(
            F.col("w").alias("key"),
            "est",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_total").cast("long").alias("n_total"),
        )
    )


@query(
    "text-vocab-topk",
    """
    SELECT w, count(*)::BIGINT AS cnt
    FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
          FROM documents)
    GROUP BY w
    ORDER BY cnt DESC, w
    LIMIT 20
    """,
)
def text_vocab_topk(spark, sf):
    """Tokenizer-vocab induction step: corpus word frequencies, top-k by
    count (ties broken by word — fully deterministic). Plan shape:
    explode → partial-agg groupBy (map-side combine collapses each task
    to its distinct words) → TakeOrderedAndProject (per-partition top-k
    heaps, k rows to one reducer) — no global sort at any scale."""
    docs = t(spark, sf, "documents")
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("w")).where(
        F.col("w") != ""
    )
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("w")).limit(20)


# portable deterministic row hash for sampling/splitting: engine-agnostic
# arithmetic on the id (NOT xxhash/murmur)
_SPLIT_HASH = "(doc_id * 2654435761) % 2147483647"


@query(
    "sample-split-deterministic",
    f"""
    SELECT doc_id, source, n_chars,
           ({_SPLIT_HASH}) % 100 < 10 AS in_sample,
           CASE WHEN ({_SPLIT_HASH}) % 100 < 80 THEN 'train'
                WHEN ({_SPLIT_HASH}) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def sample_split_deterministic(spark, sf):
    """Covers slugs sample-deterministic (the in_sample flag marks the
    reproducible 10% sample — same rows on any engine/partitioning/run,
    unlike rand() or TABLESAMPLE) + split-train-val-test (deterministic
    80/10/10 assignment), both via portable hash arithmetic."""
    d = t(spark, sf, "documents")
    h = ((F.col("doc_id") * 2654435761) % 2147483647) % 100
    split = (
        F.when(h < 80, F.lit("train")).when(h < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return d.select(
        "doc_id", "source", "n_chars",
        (h < 10).alias("in_sample"),
        split.alias("split"),
    )


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
    d = widen(t(spark, sf, "documents"))
    corpus = d.where(F.col("doc_id") % 10 != 0)
    benchmark = d.where(F.col("doc_id") % 10 == 0)
    return D.contamination_check(corpus, benchmark, threshold=0.05)


# connected components as a recursive CTE: reach(node, r) holds "r is
# reachable from node"; min(r) per node is the component label — exact
# twin of the operator's min-label-propagation fixpoint
_CC_ORACLE = _SHINGLES_CTE.replace("WITH d AS", "WITH RECURSIVE d AS", 1) + """
    , sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE floor(n_inter / (sa.n + sb.n - n_inter) * 10000)/10000.0 >= 0.2
    ),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT a AS node, a AS r FROM e
      UNION
      SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
    SELECT component, count(*) AS n_members,
           array_to_string(list_apply(list_sort(list(node)),
                                      x -> CAST(x AS VARCHAR)), '|') AS member_ids
    FROM comp GROUP BY component
    """


@query("dedup-components", _CC_ORACLE)
def dedup_components(spark, sf):
    """Near-dup pairs -> dedup GROUPS via iterative min-label propagation
    (operators/graph.py): the clustering step after MinHash/Jaccard pair
    emission that picks one canonical survivor per duplicate cluster.
    Oracle is a DuckDB recursive CTE computing min-reachable-id — an
    exact, engine-independent definition of the same fixpoint."""
    from genpipe_spark.operators.graph import dedup_groups

    pairs = D.ngram_jaccard_pairs(widen(t(spark, sf, "documents")), k=3, threshold=0.2)
    return dedup_groups(pairs.select("id_a", "id_b"))


# --------------------------------------------------- data mixing / packing

# portable id hash used by every mixing decision (same residue class as
# the split hash above: 506952114 = 2654435761 mod M31, with more int64
# headroom before the multiply overflows)
_MIX_HASH = "(doc_id * 506952114) % 2147483647"


def _epoch_shuffle_sql(epoch: int, n_shards: int) -> str:
    # epoch enters MULTIPLICATIVELY (A^(epoch+1) mod M31) — an additive
    # term would rotate, not permute (see operators/mixing.epoch_shuffle)
    mult = pow(506952114, epoch + 1, 2147483647)
    h = (
        f"((doc_id % 2147483647) * {mult}"
        f" + {(epoch + 1) * 1000003}) % 2147483647"
    )
    return f"""
    SELECT doc_id, CAST({epoch} AS BIGINT) AS epoch,
           CAST({h} AS BIGINT) AS h,
           CAST(({h}) % {n_shards} AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY ({h}) % {n_shards}
                                   ORDER BY {h}, doc_id) AS BIGINT) AS pos
    FROM documents
    """


@query(
    "mix-epoch-shuffle",
    _epoch_shuffle_sql(0, 8) + "\nUNION ALL\n" + _epoch_shuffle_sql(1, 8),
)
def mix_epoch_shuffle(spark, sf):
    """Deterministic per-epoch training-order shuffle
    (operators/mixing.epoch_shuffle): every doc gets a shard and an
    in-shard position from the portable affine hash of (id, epoch) —
    reproducible with no RNG state (a preempted trainer resumes to the
    identical order), a fresh permutation per epoch. Two epochs
    emitted to pin that the permutations differ. No global sort: the
    only shuffle is the shard partitioning and shards are the
    parallelism (set n_shards to the target file count at 100 TB)."""
    from genpipe_spark.operators.mixing import epoch_shuffle

    d = t(spark, sf, "documents").select("doc_id")
    return epoch_shuffle(d, epoch=0, n_shards=8).unionByName(
        epoch_shuffle(d, epoch=1, n_shards=8)
    )


@query(
    "mix-quota-source",
    f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_MIX_HASH}, doc_id) AS rn
      FROM documents) WHERE rn <= 30
    """,
)
def mix_quota_source(spark, sf):
    """Per-source quota sampling (operators/mixing.quota_sample): at most
    30 docs per source, chosen by deterministic hash order — the
    "cap every domain" step of corpus mixing. The two-phase variant is
    equivalence-tested in tests/ (bounded reducers for hot domains)."""
    from genpipe_spark.operators.mixing import quota_sample

    d = t(spark, sf, "documents")
    return quota_sample(d, "source", 30).select("doc_id", "source")


@query(
    "mix-weighted-sources",
    f"""
    SELECT doc_id, source FROM documents
    WHERE ({_MIX_HASH}) % 10000 <
          CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
               ELSE 1.0 END * 10000 AS BIGINT)
    """,
)
def mix_weighted_sources(spark, sf):
    """Weighted per-source sampling rates (operators/mixing.mix_weighted):
    downsample src0 to 50% and src1 to 25%, keep the rest — deterministic
    data mixing as a pure per-row filter (no shuffle in the plan)."""
    from genpipe_spark.operators.mixing import mix_weighted

    d = t(spark, sf, "documents")
    return mix_weighted(
        d, "source", {"src0": 0.5, "src1": 0.25}
    ).select("doc_id", "source")


@query(
    "pack-sequences",
    """
    SELECT doc_id, lang, pack_id,
           CAST(start - pack_id * 4096 AS BIGINT) AS pack_offset
    FROM (
      SELECT doc_id, lang,
             CAST(floor((sum(n_chars) OVER w - n_chars) / 4096.0) AS BIGINT)
               AS pack_id,
             sum(n_chars) OVER w - n_chars AS start
      FROM documents
      WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    """,
)
def pack_sequences(spark, sf):
    """Document→shard assignment by running token offset
    (operators/mixing.pack_streaming): each doc lands in shard
    floor(start_offset / budget), packed independently per language so
    the window state stays bounded at scale (n_chars stands in for the
    token count; compose with text.token_count for real tokens)."""
    from genpipe_spark.operators.mixing import pack_streaming

    d = t(spark, sf, "documents")
    return pack_streaming(
        d, "n_chars", 4096, order_col="doc_id", pack_group="lang"
    ).select("doc_id", "lang", "pack_id", "pack_offset")


@query(
    "mix-suite",
    f"""
    SELECT 'quota' AS part, doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_MIX_HASH}, doc_id) AS rn
      FROM documents) WHERE rn <= 30
    UNION ALL
    SELECT 'weighted' AS part, doc_id, source FROM documents
    WHERE ({_MIX_HASH}) % 10000 <
          CAST(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
               ELSE 1.0 END * 10000 AS BIGINT)
    """,
)
def mix_suite(spark, sf):
    """Tagged union of the two same-schema mixing forms so both ride one
    driver-window slot: 'quota' = per-source cap (window top-N by
    deterministic hash), 'weighted' = per-source sampling rates
    (shuffle-free filter). pack-sequences has its own entry (different
    schema). The individual entries stay registered for pytest/bench."""
    quota = mix_quota_source(spark, sf)
    weighted = mix_weighted_sources(spark, sf)
    return quota.select(F.lit("quota").alias("part"), "*").unionByName(
        weighted.select(F.lit("weighted").alias("part"), "*")
    )


@query(
    "quantize-embedding-int8",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_apply(v, x -> abs(x))) / 127.0 AS scale
          FROM e),
    q AS (SELECT vec_id, v, scale,
                 list_apply(v, x -> CASE WHEN scale = 0 THEN 0
                     ELSE CAST(floor(x / scale + 0.5) AS INTEGER) END) AS qv
          FROM s)
    SELECT vec_id, scale,
           array_to_string(qv, '|') AS q,
           floor(list_reduce(list_prepend(0.0,
               list_apply(list_zip(qv, v), p -> abs(p[1] * scale - p[2]))),
               (a, b) -> CASE WHEN b > a THEN b ELSE a END) * 1e6) / 1e6
             AS err_max
    FROM q
    """,
)
def quantize_embedding_int8(spark, sf):
    """Symmetric per-vector int8 quantization
    (operators/similarity.quantize_int8) with explicit half-up rounding
    (floor(x/scale + 0.5) — portable, unlike engine round()) and the max
    reconstruction error as an in-row quality metric. The q array is
    serialized for driver hashability."""
    from genpipe_spark.operators.similarity import quantize_int8

    out = quantize_int8(t(spark, sf, "embeddings"))
    return out.select(
        "vec_id", "scale", F.concat_ws("|", "q").alias("q"), "err_max"
    )


_BM25_TERMS = ("spark", "merge", "window")

_BM25_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        w -> w <> '')) AS w
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl),
    hits AS (SELECT doc_id, w FROM toks
             WHERE w IN ({", ".join(repr(t) for t in _BM25_TERMS)})),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM hits GROUP BY doc_id, w),
    dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM hits GROUP BY w),
    per_term AS (
      SELECT tf.doc_id,
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * (tf * (1.2 + 1)
                / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (total_dl * 1.0 / n_docs))))
               AS s
      FROM tf JOIN dl ON tf.doc_id = dl.doc_id
              JOIN dfreq ON tf.w = dfreq.w
              CROSS JOIN stats
    )
    SELECT doc_id, floor(sum(s) * 10000) / 10000.0 AS score
    FROM per_term GROUP BY doc_id
    """


@query("text-bm25", _BM25_SQL)
def text_bm25(spark, sf):
    """Okapi BM25 relevance scores (operators/text.bm25_scores) for a
    fixed 3-term query over the documents corpus — the ranked-retrieval
    primitive of the text tier. Scores floor-truncate at 4 decimals
    before any ranking so both engines agree bit-for-bit."""
    from genpipe_spark.operators.text import bm25_scores

    return bm25_scores(t(spark, sf, "documents"), list(_BM25_TERMS))


_BM25_QUERY_TABLE = (
    (0, "spark merge window"),
    (1, "customer filter"),
    (2, "stream batch hash join"),
)

_BM25_TOPK_SQL = f"""
    WITH q AS (SELECT * FROM (VALUES
        {", ".join(f"({i}, {s!r})" for i, s in _BM25_QUERY_TABLE)})
        AS q(query_id, qtext)),
    qterms AS (
      SELECT DISTINCT query_id,
             unnest(list_filter(string_split_regex(lower(qtext), '\\s+'),
                                w -> w <> '')) AS w
      FROM q
    ),
    vocab AS (SELECT DISTINCT w FROM qterms),
    toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        w -> w <> '')) AS w
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl),
    tf AS (SELECT doc_id, toks.w, count(*) AS tf FROM toks JOIN vocab ON toks.w = vocab.w
           GROUP BY doc_id, toks.w),
    dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    scored AS (
      SELECT tf.doc_id, tf.w,
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * (tf * (1.2 + 1)
                / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (total_dl * 1.0 / n_docs))))
               AS s
      FROM tf JOIN dl ON tf.doc_id = dl.doc_id
              JOIN dfreq ON tf.w = dfreq.w
              CROSS JOIN stats
    ),
    per_qd AS (
      SELECT query_id, doc_id, floor(sum(s) * 10000) / 10000.0 AS score
      FROM scored JOIN qterms ON scored.w = qterms.w
      GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rank, score FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rank
      FROM per_qd)
    WHERE rank <= 10
    """


@query("text-bm25-topk", _BM25_TOPK_SQL)
def text_bm25_topk(spark, sf):
    """Multi-query BM25 retrieval (operators/text.bm25_topk): top-10
    docs per row of a 3-row query table — corpus term stats computed
    once for the union vocabulary, inverted-index join fan-out, no
    per-query corpus scans."""
    from genpipe_spark.operators.text import bm25_topk

    queries = spark.createDataFrame(
        list(_BM25_QUERY_TABLE), "query_id long, qtext string"
    )
    return bm25_topk(t(spark, sf, "documents"), queries, k=10)


_DSIR_ORACLE = _WORD_FOLD_D + r""",
tok AS MATERIALIZED (
  SELECT d.doc_id, (source IN ('src0', 'src1')) AS is_t,
         unnest(wh) % 32 AS b
  FROM d JOIN documents USING (doc_id)
),
bc AS MATERIALIZED (
  SELECT b,
         CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
  FROM tok GROUP BY b
),
tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM bc),
ratios AS (
  SELECT b,
         CAST(floor((round(ln((ct + 1) * 1.0 / (tt + 32)) * 1e9)
                     - round(ln((cr + 1) * 1.0 / (tr + 32)) * 1e9))
                    / 1000) AS BIGINT) AS lr
  FROM bc, tot
),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(lr) AS BIGINT) AS weight_micro
  FROM tok JOIN ratios USING (b)
  WHERE NOT is_t
  GROUP BY doc_id
)
SELECT doc_id, n_toks, weight_micro,
       CAST(sel_rank AS BIGINT) AS sel_rank
FROM (
  SELECT *, row_number() OVER (ORDER BY weight_micro DESC, doc_id)
         AS sel_rank
  FROM scored
) WHERE sel_rank <= 100
"""


@query("mix-dsir-select", _DSIR_ORACLE)
def mix_dsir_select(spark, sf):
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023; operators/mixing.dsir_select): score raw docs by
    target-likeness under hashed unigram models — the src0/src1 slice
    plays the quality target, everything else is the raw pool.
    Add-one-smoothed per-bucket log ratios from exact integer counts,
    nano-rounded (one libm ln per side), summed per doc as int64;
    selection = top-100 by (weight desc, id) — rank-based, so the cut
    is engine-exact with no exp/resampling randomness. Two B-row
    bucket aggs broadcast back; everything else combinable."""
    from genpipe_spark.operators.mixing import dsir_select

    d = widen(t(spark, sf, "documents"))
    return dsir_select(
        d, is_target=F.col("source").isin("src0", "src1"),
        n_buckets=32, top_n=100,
    )


def _bpe_cte_chain(iters: int) -> str:
    """The shared BPE-training CTE chain as ONE RECURSIVE CTE (r11,
    was ``iters`` unrolled w{k} tables — 206 KB of SQL and 28 s of
    planning at 256 rounds; the recursive form runs the same 256
    rounds in ~1.4 s): the working table carries the full (w, cnt, s)
    word table per iteration; each step computes the round's top pair
    as a min-struct aggregate over the PREVIOUS iteration's rows (the
    standard recursive-CTE working-table semantics) and rewrites every
    symbolization via the double-space replace. When no adjacent pair
    remains, the top pair is NULL and the rewrite is a no-op — the
    rounds keep counting up to ``iters`` with frozen symbolizations,
    matching the Spark side's early break observationally. Exposes:
    wf (word counts), t (i, w, cnt, s for i = 0..iters), and wfin
    (the final word table)."""
    return rf"""
WITH RECURSIVE toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w <> '')) AS w
  FROM documents
),
wf AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY w
),
t AS (
  SELECT 0 AS i, w, cnt,
         '  ' || array_to_string(
            list_transform(range(1, length(w) + 1),
                           i -> substr(w, i, 1)), '  ') || '  ' AS s
  FROM wf
  UNION ALL
  SELECT i + 1, w, cnt,
         CASE WHEN ma IS NULL THEN s
              ELSE replace(s, '  ' || ma || '  ' || mb,
                           '  ' || ma || mb) END AS s
  FROM t CROSS JOIN (
    SELECT (min(struct_pack(nc := -c, a := a, b := b))).a AS ma,
           (min(struct_pack(nc := -c, a := a, b := b))).b AS mb
    FROM (
      SELECT sy[j] AS a, sy[j + 1] AS b, CAST(sum(cnt) AS BIGINT) AS c
      FROM (SELECT cnt, string_split(trim(s), '  ') AS sy FROM t) q,
           unnest(range(1, greatest(len(sy), 1))) AS tj(j)
      GROUP BY 1, 2
    )
  )
  WHERE i < {iters}
),
wfin AS MATERIALIZED (
  SELECT w, cnt, s FROM t WHERE i = {iters}
)"""


def _bpe_train_oracle(iters: int, top_words: int | None) -> str:
    """Generated DuckDB twin of operators/text.bpe_train: merge rule
    of round k = the top pair recomputed from the recursive working
    table at iteration k-1 (identical min-struct tiebreak); word rows
    from the final table (top_words=None -> the FULL word table)."""
    word_filter = "" if top_words is None else f"WHERE k <= {top_words}"
    return _bpe_cte_chain(iters) + f""",
mg AS (
  SELECT i + 1 AS k,
         (min(struct_pack(nc := -c, a := a, b := b))).a AS ma,
         (min(struct_pack(nc := -c, a := a, b := b))).b AS mb,
         -(min(struct_pack(nc := -c, a := a, b := b))).nc AS mc
  FROM (
    SELECT i, sy[j] AS a, sy[j + 1] AS b, CAST(sum(cnt) AS BIGINT) AS c
    FROM (SELECT i, cnt, string_split(trim(s), '  ') AS sy
          FROM t WHERE i < {iters}) q,
         unnest(range(1, greatest(len(sy), 1))) AS tj(j)
    GROUP BY i, sy[j], sy[j + 1]
  ) GROUP BY i
)
SELECT 'merge' AS part, CAST(k AS BIGINT) AS k, ma AS a, mb AS b,
       ma || mb AS s, CAST(mc AS BIGINT) AS cnt
FROM mg WHERE ma IS NOT NULL
UNION ALL
SELECT part, k, a, b, s, cnt FROM (
  SELECT 'word' AS part,
         CAST(row_number() OVER (ORDER BY cnt DESC, w) AS BIGINT) AS k,
         w AS a, '' AS b,
         replace(trim(s), '  ', ' ') AS s, cnt
  FROM wfin
) {word_filter}
"""


@query("text-bpe-train", _bpe_train_oracle(256, None))
def text_bpe_train(spark, sf):
    """BPE TRAINING at VOCAB SCALE — 256 merge rounds over the FULL
    word table (r11, was 3 rounds / top-50 words; Sennrich et al.
    2016;
    operators/text.bpe_train) — learns the merges, not just the pair
    stats: weighted adjacent-pair counts over the (word, count)
    table, deterministic (count desc, pair asc) top pair as a
    min-struct over (-count, a, b), and the merge applied by plain
    replace() via the double-space symbol encoding (adjacent
    occurrences share no characters, so non-overlapping left-to-right
    replace EQUALS the reference's greedy tuple merge — verified
    against a literal Python BPE in the smoke test). Emits the merge
    rules and EVERY word's final symbolization. Everything after the
    one corpus reduction is vocabulary-sized: per round one 1-row
    top-pair collect + a literal rewrite, lineage cut every 32 rounds
    (operators/text._bpe_learn), early break once the vocab is
    exhausted (provable no-op tail). The oracle replays all 256
    rounds as ONE recursive CTE instead of 256 unrolled tables."""
    from genpipe_spark.operators.text import bpe_train

    return bpe_train(widen(t(spark, sf, "documents")), iters=256,
                     top_words=None)


def _bpe_encode_oracle(iters: int) -> str:
    """DuckDB twin of operators/text.bpe_encode: the same training CTE
    chain, then vocab ranking and the corpus-wide word-mapping join."""
    return _bpe_cte_chain(iters) + f""",
vocab AS MATERIALIZED (
  SELECT tok,
         CAST(row_number() OVER (ORDER BY tcnt DESC, tok) AS BIGINT)
           AS token_id
  FROM (
    SELECT tok, CAST(sum(cnt) AS BIGINT) AS tcnt
    FROM (SELECT cnt, unnest(string_split(trim(s), '  ')) AS tok
          FROM wfin)
    GROUP BY tok)
),
docw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
enc AS (
  SELECT d.doc_id, u.tok
  FROM docw d
  JOIN wfin wt USING (w),
       unnest(string_split(trim(wt.s), '  ')) AS u(tok)
)
SELECT doc_id, token_id, tok, CAST(count(*) AS BIGINT) AS cnt
FROM enc JOIN vocab USING (tok)
GROUP BY 1, 2, 3
"""


@query("text-bpe-encode", _bpe_encode_oracle(256))
def text_bpe_encode(spark, sf):
    """BPE ENCODING AT SCALE (operators/text.bpe_encode) — applies the
    merge table learned by text-bpe-train corpus-wide, closing the r9
    VERDICT's one named LLM-pipeline gap (tokenizer APPLICATION is the
    hot loop of a real 100 TB training-data pipeline; training alone
    never touches most of the corpus). Emits the bag-of-token-ids per
    document: (doc_id, token_id, tok, cnt).

    Scale: merge rounds run on the deduplicated (word, count) table
    only; the corpus pays one tokenize-explode + ONE equi-join against
    the word -> symbolization mapping (sub-linear distinct-words side,
    AQE-broadcast when small) + one (doc, token) count. Token ids rank
    a vocab bounded at |alphabet| + iters rows by construction."""
    from genpipe_spark.operators.text import bpe_encode

    return bpe_encode(widen(t(spark, sf, "documents")), iters=256)


_TOKPACK_BUDGET = 2048


def _bpe_encode_wordmap_cte(iters: int) -> str:
    """The BPE chain + the corpus word explode (docw), WITHOUT the
    vocab/token aggregation — shared by the tokenize-pack oracle."""
    return _bpe_cte_chain(iters) + r""",
docw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
)"""


def _tokenize_pack_oracle() -> str:
    """The tokenize→pack composition: real BPE token counts (the
    text-bpe-encode chain) drive the per-language running-offset shard
    assignment (the pack-sequences chain)."""
    return _bpe_encode_wordmap_cte(256) + f""",
ntok AS (
  SELECT d.doc_id,
         CAST(sum(len(string_split(trim(wt.s), '  '))) AS BIGINT)
           AS n_tokens
  FROM docw d JOIN wfin wt USING (w)
  GROUP BY d.doc_id
),
nd AS (
  SELECT doc_id, lang, COALESCE(n_tokens, 0) AS n_tokens
  FROM documents LEFT JOIN ntok USING (doc_id)
)
SELECT doc_id, lang, n_tokens, pack_id,
       CAST(start - pack_id * {_TOKPACK_BUDGET} AS BIGINT) AS pack_offset
FROM (
  SELECT doc_id, lang, n_tokens,
         CAST(floor((sum(n_tokens) OVER w - n_tokens)
                    / {_TOKPACK_BUDGET}.0) AS BIGINT) AS pack_id,
         sum(n_tokens) OVER w - n_tokens AS start
  FROM nd
  WINDOW w AS (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
"""


@query("pipeline-tokenize-pack", _tokenize_pack_oracle())
def pipeline_tokenize_pack(spark, sf):
    """END-TO-END tokenize→pack: the learned-BPE token count of every
    document (the text-bpe-encode chain — merges trained on the
    corpus, applied via the word-mapping join) drives the per-language
    running-offset shard assignment (operators/mixing.pack_streaming,
    2048-token shards) — closing the loop the pack-sequences entry
    stubs with n_chars ("compose with real tokens"): this is the
    actual batch layout a trainer reads. Scale: the BPE chain is
    vocabulary-sized; the corpus pays the mapping join + one
    per-language window; docs with no words pack at zero length
    rather than disappearing (LEFT join)."""
    from genpipe_spark.operators.mixing import pack_streaming
    from genpipe_spark.operators.text import _bpe_learn, words

    d = widen(t(spark, sf, "documents"))
    w_fin, _ = _bpe_learn(d, "text", 256)
    wmap = w_fin.select(
        "w", F.size(F.split(F.trim("s"), "  ")).cast("long").alias("wtok")
    )
    docw = d.select(
        "doc_id", F.explode(words(F.lower(F.col("text")))).alias("w")
    )
    ntok = (
        docw.join(wmap, "w")
        .groupBy("doc_id")
        .agg(F.sum("wtok").alias("n_tokens"))
    )
    nd = (
        t(spark, sf, "documents")
        .select("doc_id", "lang")
        .join(ntok, "doc_id", "left")
        .select(
            "doc_id", "lang",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
            .alias("n_tokens"),
        )
    )
    packed = pack_streaming(nd, "n_tokens", _TOKPACK_BUDGET,
                            order_col="doc_id", pack_group="lang")
    return packed.select(
        "doc_id", "lang", "n_tokens", "pack_id",
        F.col("pack_offset").cast("long").alias("pack_offset"),
    )



_RRF_ORACLE = f"""
WITH bm AS MATERIALIZED ({_BM25_TOPK_SQL}),
q2 AS (SELECT * FROM (VALUES
    {", ".join(f"({i}, {s!r})" for i, s in _BM25_QUERY_TABLE)})
    AS q2(query_id, qtext)),
qt AS MATERIALIZED (
  SELECT DISTINCT query_id,
         unnest(list_filter(string_split_regex(lower(qtext), '\\s+'),
                            w -> w <> '')) AS w
  FROM q2
),
toks2 AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            w -> w <> '')) AS w
  FROM documents
),
tf2 AS MATERIALIZED (
  SELECT doc_id, toks2.w, count(*) AS tf
  FROM toks2 JOIN (SELECT DISTINCT w FROM qt) vw ON toks2.w = vw.w
  GROUP BY doc_id, toks2.w
),
hits AS (
  SELECT qt.query_id, tf2.doc_id, CAST(sum(tf) AS BIGINT) AS hits
  FROM tf2 JOIN qt ON tf2.w = qt.w
  GROUP BY 1, 2
),
tfr AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY hits DESC, doc_id) AS rank
    FROM hits)
  WHERE rank <= 10
),
u AS (
  SELECT query_id, doc_id, 'bm25' AS src, rank FROM bm
  UNION ALL
  SELECT query_id, doc_id, 'tf' AS src, rank FROM tfr
),
ag AS (
  SELECT query_id, doc_id,
         CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_micro,
         CAST(coalesce(max(CASE WHEN src = 'bm25' THEN rank END), 0)
              AS BIGINT) AS rank_bm25,
         CAST(coalesce(max(CASE WHEN src = 'tf' THEN rank END), 0)
              AS BIGINT) AS rank_tf
  FROM u GROUP BY 1, 2
)
SELECT query_id, doc_id, rrf_micro, rank_bm25, rank_tf,
       CAST(fused_rank AS BIGINT) AS fused_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_micro DESC, doc_id)
         AS fused_rank
  FROM ag)
WHERE fused_rank <= 10
"""


@query("search-rrf-fusion", _RRF_ORACLE)
def search_rrf_fusion(spark, sf):
    """Hybrid-retrieval reciprocal-rank fusion (Cormack et al. 2009;
    operators/text.rrf_fuse) — the combiner every BM25+dense RAG stack
    runs: fuse the BM25 top-10 (text-bm25-topk's ranker) with a plain
    term-frequency top-10 second opinion (tf_overlap_topk) over the
    same 3-query table, score = sum 1000000 div (60 + rank) in exact
    integers, fused order (score desc, doc_id asc). Candidate volume
    is the union of the rank lists — never the corpus."""
    from genpipe_spark.operators.text import (
        bm25_topk, rrf_fuse, tf_overlap_topk,
    )

    docs = t(spark, sf, "documents")
    queries = spark.createDataFrame(
        list(_BM25_QUERY_TABLE), "query_id long, qtext string"
    )
    bm = bm25_topk(docs, queries, k=10).select("query_id", "doc_id", "rank")
    tfx = tf_overlap_topk(docs, queries, k=10).select(
        "query_id", "doc_id", "rank"
    )
    return rrf_fuse({"bm25": bm, "tf": tfx}, k=60, topk=10)


@query(
    "text-repetition",
    r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
      FROM documents
    ),
    tri AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(ws) - 1, 1)),
                            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS tris
      FROM d
    )
    SELECT doc_id,
           len(tris) AS n_trigrams,
           len(list_distinct(tris)) AS n_trigrams_distinct,
           CASE WHEN len(tris) > 0
                THEN floor((1 - len(list_distinct(tris)) * 1.0 / len(tris)) * 10000)
                     / 10000.0
                ELSE 0.0 END AS rep_ratio
    FROM tri
    """,
)
def text_repetition(spark, sf):
    """Within-document repetition ratio (operators/text.repetition_score)
    — duplicate word-trigram fraction, the boilerplate/looping-text
    curation gate. Pure per-row expressions, no shuffle."""
    from genpipe_spark.operators.text import repetition_score

    return repetition_score(widen(t(spark, sf, "documents"))).select(
        "doc_id", "n_trigrams", "n_trigrams_distinct", "rep_ratio"
    )


@query(
    "text-unigram-logprob",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                        w -> w <> '')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS wc FROM toks GROUP BY w),
    total AS (SELECT sum(wc) AS n_total FROM freq),
    scored AS (
      SELECT doc_id,
             CAST(floor(round(log10(wc * 1.0 / n_total) * 1e9) / 1000) AS BIGINT)
               AS lp_u
      FROM toks JOIN freq USING (w) CROSS JOIN total
    )
    SELECT doc_id,
           count(*) AS n_words,
           floor(sum(lp_u) / (count(*) * 100.0)) / 10000.0 AS mean_logprob
    FROM scored GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark, sf):
    """Corpus-relative unigram fluency score
    (operators/text.unigram_logprob_score) — the KenLM-style quality
    gate: word-count agg + word equi-join + per-doc mean, vocabulary
    never broadcast or collected."""
    from genpipe_spark.operators.text import unigram_logprob_score

    return unigram_logprob_score(widen(t(spark, sf, "documents")))


@query(
    "text-gopher-rules",
    r"""
    WITH d AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '')
               AS ws,
             list_filter(string_split(text, chr(10)), s -> s <> '')
               AS lines
      FROM documents
    ),
    b AS (
      SELECT doc_id, text, ws, lines,
             len(ws) AS n,
             coalesce(list_sum(list_transform(ws, w -> length(w))), 0)
               AS total_len,
             len(lines) AS n_lines,
             len(list_filter(lines,
                 s -> regexp_matches(s, '^\s*[-*•]'))) AS bullet,
             len(list_filter(lines,
                 s -> regexp_matches(s, '\.\.\.\s*$'))) AS ellip,
             len(list_filter(ws,
                 w -> regexp_matches(w, '[A-Za-z]'))) AS alpha,
             len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\.\.\.')) AS symbols,
             len(list_filter(
                 ['the','be','to','of','and','that','have','with'],
                 s -> len(list_filter(ws, w -> lower(w) = s)) > 0))
               AS stops_present,
             len(lines) - len(list_distinct(lines)) AS dup_lines
      FROM d
    ),
    grams AS (
      SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
      FROM d, unnest(range(1, greatest(len(ws), 1))) AS ti(i)
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
    top AS (
      SELECT doc_id,
             (max(struct_pack(c := c, prod := c * length(g)))).prod
               AS top2_chars
      FROM gc GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(n AS BIGINT) AS n_words,
           CAST(n_lines AS BIGINT) AS n_lines,
           CASE WHEN n >= 50 AND n <= 100000 THEN 'yes' ELSE 'no' END
             AS r1_wordcount,
           CASE WHEN 3*n <= total_len AND total_len <= 10*n
                THEN 'yes' ELSE 'no' END AS r2_meanwordlen,
           CASE WHEN 10*symbols <= n THEN 'yes' ELSE 'no' END
             AS r3_symbolratio,
           CASE WHEN 10*bullet <= 9*n_lines THEN 'yes' ELSE 'no' END
             AS r4_bulletlines,
           CASE WHEN 10*ellip <= 3*n_lines THEN 'yes' ELSE 'no' END
             AS r5_ellipsislines,
           CASE WHEN 5*alpha >= 4*n THEN 'yes' ELSE 'no' END
             AS r6_alphawords,
           CASE WHEN stops_present >= 2 THEN 'yes' ELSE 'no' END
             AS r7_stopwords,
           CASE WHEN 10*dup_lines <= 3*n_lines THEN 'yes' ELSE 'no' END
             AS r8_duplines,
           CASE WHEN 5*coalesce(top2_chars, 0) <= length(text)
                THEN 'yes' ELSE 'no' END AS r9_top2gram,
           CASE WHEN n >= 50 AND n <= 100000
                 AND 3*n <= total_len AND total_len <= 10*n
                 AND 10*symbols <= n
                 AND 10*bullet <= 9*n_lines
                 AND 10*ellip <= 3*n_lines
                 AND 5*alpha >= 4*n
                 AND stops_present >= 2
                 AND 10*dup_lines <= 3*n_lines
                 AND 5*coalesce(top2_chars, 0) <= length(text)
                THEN 'yes' ELSE 'no' END AS keep
    FROM b LEFT JOIN top ON top.doc_id = b.doc_id
    """,
)
def text_gopher_rules(spark, sf):
    """The Gopher quality-filter battery (Rae et al. 2021 Table A1;
    operators/text.gopher_quality_rules): nine published heuristics —
    word count, mean word length, symbol ratio, bullet/ellipsis line
    fractions, alphabetic-word fraction, required stop words,
    duplicate-line fraction, most-common-2-gram char fraction — each
    as an exact cross-multiplied integer comparison (no float ratio
    anywhere), plus the composite keep verdict. r1-r8 are pure per-row
    HOF expressions; r9 is one combinable bigram count + per-doc
    struct-max joined back on the doc id."""
    from genpipe_spark.operators.text import gopher_quality_rules

    return gopher_quality_rules(widen(t(spark, sf, "documents")))


@query(
    "text-perplexity-buckets",
    r"""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                w -> w <> '')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS wc FROM toks GROUP BY w),
    total AS (SELECT sum(wc) AS n_total FROM freq),
    sc AS (
      SELECT doc_id, source,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(CAST(floor(round(log10(wc * 1.0 / n_total) * 1e9)
                                 / 1000) AS BIGINT)) AS BIGINT)
               AS sum_lp_micro
      FROM toks JOIN freq USING (w) CROSS JOIN total
      GROUP BY 1, 2
    ),
    m AS (
      SELECT *,
             (sum_lp_micro * 100
              - (((sum_lp_micro * 100 % n_words) + n_words) % n_words))
               // n_words AS mean_centilp
      FROM sc
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY source
                                ORDER BY mean_centilp DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS ng
      FROM m
    )
    SELECT doc_id, source, n_words, sum_lp_micro,
           CAST(mean_centilp AS BIGINT) AS mean_centilp,
           CAST(rk AS BIGINT) AS rk, CAST(ng AS BIGINT) AS n_group,
           CASE WHEN rk * 3 <= ng THEN 'head'
                WHEN rk * 3 <= 2 * ng THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM r
    """,
)
def text_perplexity_buckets(spark, sf):
    """CCNet-style head/middle/tail perplexity bucketing per source
    (operators/text.perplexity_buckets; Wenzek et al. 2020): rank each
    source's docs by the corpus-unigram LM score and cut into exact
    integer tertiles (rk*3 vs n). Perplexity is monotone in mean
    logprob, so the buckets need NO exp/pow — quantized-micro logprob
    sums, a pmod-floor centi-mean sort key, and doc-id tiebreaks make
    the assignment a pure function of the corpus in both engines."""
    from genpipe_spark.operators.text import perplexity_buckets

    return perplexity_buckets(widen(t(spark, sf, "documents")))


@query(
    "dedup-incremental",
    _SHINGLES_CTE
    + """
    , sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT id_a, id_b,
             floor(n_inter / (sa.n + sb.n - n_inter) * 10000)/10000.0 AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE floor(n_inter / (sa.n + sb.n - n_inter) * 10000)/10000.0 >= 0.5
    )
    SELECT CASE WHEN id_b % 10 = 0 THEN id_b ELSE id_a END AS id_new,
           CASE WHEN id_b % 10 = 0 THEN id_a ELSE id_b END AS id_match,
           jaccard
    FROM jac WHERE id_a % 10 = 0 OR id_b % 10 = 0
    """,
)
def dedup_incremental(spark, sf):
    """Incremental-ingest dedup (operators/dedup.incremental_minhash_pairs):
    the doc_id%10==0 slice arrives as a new batch and is near-dup-matched
    against the standing corpus (the other 90%) via its persisted LSH
    index, plus within itself — the corpus never self-joins. Oracle is
    the exact-Jaccard pair set restricted to pairs touching the batch
    (recall-1 at these settings, same argument as dedup-minhash-lsh)."""
    from genpipe_spark.operators.dedup import incremental_minhash_pairs

    d = widen(t(spark, sf, "documents"))
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    # 96/24 banding: the exact-transcript oracle contract (same recall
    # math as dedup-minhash-lsh / stream-dedup-incremental, r9 late)
    return incremental_minhash_pairs(
        new, corpus, num_hashes=96, bands=24, threshold=0.5
    )


_PROFILE_COLS = ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")


def _profile_col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS column, count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_str,
           CAST(max({c}) AS VARCHAR) AS max_str
    FROM lineitem
    """


@query(
    "profile-table",
    "\nUNION ALL\n".join(_profile_col_sql(c) for c in _PROFILE_COLS),
)
def profile_table_query(spark, sf):
    """ANALYZE-style snapshot profile (operators/profile.profile_table):
    per-column null/distinct/range stats of lineitem in one scan — the
    drift-detection primitive a curation pipeline runs per corpus
    version. Timestamp min/max stringify identically in both engines
    (session TZ pinned UTC; 'yyyy-MM-dd HH:mm:ss' both sides).
    Exact-distinct mode opted into here because DuckDB's COUNT(DISTINCT)
    is exact — the operator's DEFAULT is the HLL/no-Expand scale path."""
    from genpipe_spark.operators.profile import profile_table

    return profile_table(t(spark, sf, "lineitem"), _PROFILE_COLS, approx_distinct=False)


@query(
    "text-quality-suite",
    r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
      FROM documents
    ),
    tri AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(ws) - 1, 1)),
                            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS tris
      FROM d
    ),
    rep AS (
      SELECT doc_id,
             len(tris) AS n_trigrams,
             len(list_distinct(tris)) AS n_trigrams_distinct,
             CASE WHEN len(tris) > 0
                  THEN floor((1 - len(list_distinct(tris)) * 1.0 / len(tris))
                             * 10000) / 10000.0
                  ELSE 0.0 END AS rep_ratio
      FROM tri
    ),
    toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                        w -> w <> '')) AS w
      FROM documents
    ),
    freq AS (SELECT w, count(*) AS wc FROM toks GROUP BY w),
    total AS (SELECT sum(wc) AS n_total FROM freq),
    scored AS (
      SELECT doc_id,
             CAST(floor(round(log10(wc * 1.0 / n_total) * 1e9) / 1000) AS BIGINT)
               AS lp_u
      FROM toks JOIN freq USING (w) CROSS JOIN total
    ),
    lp AS (
      SELECT doc_id, count(*) AS n_words,
             floor(sum(lp_u) / (count(*) * 100.0)) / 10000.0 AS mean_logprob
      FROM scored GROUP BY doc_id
    )
    SELECT rep.doc_id, n_trigrams, n_trigrams_distinct, rep_ratio,
           COALESCE(n_words, 0) AS n_words,
           COALESCE(mean_logprob, 0.0) AS mean_logprob
    FROM rep LEFT JOIN lp ON rep.doc_id = lp.doc_id
    """,
)
def text_quality_suite(spark, sf):
    """Wide per-document text-quality entry merging the repetition and
    unigram-fluency families into one driver-window-slot candidate (the
    fn-parse-suite trick): one row per doc, one column set per family.
    The individual entries stay registered for pytest and the bench."""
    rep = text_repetition(spark, sf)
    lp = text_unigram_logprob(spark, sf)
    out = rep.join(lp, "doc_id", "left")
    return out.select(
        "doc_id", "n_trigrams", "n_trigrams_distinct", "rep_ratio",
        F.coalesce(F.col("n_words"), F.lit(0)).alias("n_words"),
        F.coalesce(F.col("mean_logprob"), F.lit(0.0)).alias("mean_logprob"),
    )


@query(
    "mix-weighted-sample",
    f"""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             CAST(round(ln((({_MIX_HASH}) + 1) * 1.0 / 2147483648)
                        / n_chars * 1e9) AS BIGINT) AS es_key_nano
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars, es_key_nano FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY es_key_nano DESC, doc_id) AS rn
      FROM scored) WHERE rn <= 20
    """,
)
def mix_weighted_sample(spark, sf):
    """Deterministic weighted sampling without replacement
    (operators/mixing.weighted_sample, Efraimidis–Spirakis keys on the
    portable id hash): 20 docs per source with inclusion probability
    proportional to n_chars — longer docs favored, reruns exact."""
    from genpipe_spark.operators.mixing import weighted_sample

    d = t(spark, sf, "documents")
    return weighted_sample(d, "n_chars", 20, by="source").select(
        "doc_id", "source", "n_chars", "es_key_nano"
    )


_WR_K = 8
_WR_M31 = 2147483647
_WR_DRAWS = ", ".join(
    f"({j}, {pow(48271, j + 1, _WR_M31)}, {(2246822519 * (j + 1)) % _WR_M31})"
    for j in range(_WR_K)
)


@query(
    "mix-reservoir-replacement",
    f"""
    WITH draws(j, a, b) AS (VALUES {_WR_DRAWS}),
    scored AS (
      SELECT source, doc_id, j,
             CAST(round(ln(((((({_MIX_HASH}) * a + b) % 2147483647) + 1) * 1.0
                            / 2147483648)) / n_chars * 1e9) AS BIGINT)
               AS key_nano
      FROM documents CROSS JOIN draws
      WHERE n_chars > 0
    )
    SELECT source, j AS draw, doc_id, key_nano FROM (
      SELECT *, row_number() OVER (PARTITION BY source, j
                                   ORDER BY key_nano DESC, doc_id) AS rn
      FROM scored) WHERE rn = 1
    """,
)
def mix_reservoir_replacement(spark, sf):
    """Grouped weighted sampling WITH replacement
    (operators/mixing.weighted_sample_with_replacement): 8 independent
    Efraimidis–Spirakis draws per source, weight = n_chars — each draw
    an affine re-hash + argmax, so a heavy doc can win several draws.
    The oracle replays every draw's keys and takes the same
    (key DESC, doc_id) winner per (source, draw)."""
    from genpipe_spark.operators.mixing import weighted_sample_with_replacement

    d = t(spark, sf, "documents")
    return weighted_sample_with_replacement(
        d, "n_chars", _WR_K, by="source"
    ).select("source", "draw", "doc_id", "key_nano")


# ------------------------------------------------------------- curation

# h31 word hash + 3-shingle combine, identical to _SHINGLES_CTE but over
# an arbitrary words-array column (the curation stages run on NORMALIZED
# text, not raw documents.text)
_H31 = (
    "list_reduce(list_prepend(CAST(7 AS BIGINT), "
    "list_apply(list_filter(string_split(w, ''), c -> c <> ''), "
    "c -> CAST(ascii(c) AS BIGINT))), (a, c) -> (a * 31 + c) % 2147483647)"
)

_CURATION_ORACLE = rf"""
    WITH norm AS (
      SELECT doc_id, source,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                 '\s+', ' ', 'g')) AS text
      FROM documents
    ), gated AS (
      SELECT doc_id, source, text,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
      FROM norm
      WHERE len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) >= 10
        AND floor(list_reduce(list_prepend(0,
              list_apply(list_filter(string_split_regex(text, '\s+'), w -> w <> ''),
                         w -> length(w))), (a, b) -> a + b)
            / len(list_filter(string_split_regex(text, '\s+'), w -> w <> ''))
            * 10000)/10000.0 >= 2
    ), exact_keep AS (
      SELECT min(doc_id) AS keep_id FROM gated GROUP BY md5(text)
    ), uniq AS (
      SELECT g.* FROM gated g JOIN exact_keep e ON g.doc_id = e.keep_id
    ), wh AS (
      SELECT doc_id, list_apply(ws, w -> {_H31}) AS wh FROM uniq
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(wh) - 1, 1)),
               i -> ((wh[i] * 1000003) % 2147483647
                     + (wh[i+1] * 9176) % 2147483647
                     + wh[i+2]) % 2147483647))) AS sh
      FROM wh
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), losers AS (
      SELECT DISTINCT b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      JOIN sizes sa ON sa.doc_id = a.doc_id
      JOIN sizes sb ON sb.doc_id = b.doc_id
      GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
      HAVING floor(count(*) / (sa.n + sb.n - count(*)) * 10000)/10000.0 >= 0.5
    )
    SELECT u.doc_id, u.source, len(u.ws) AS n_tokens,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_apply(u.ws, w -> {_H31})),
             (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fp
    FROM uniq u
    WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id_b = u.doc_id)
"""


@query("pipeline-curation", _CURATION_ORACLE)
def pipeline_curation(spark, sf):
    """End-to-end curation pipeline as ONE oracle-checkable declarative
    plan (VERDICT r4 item 5): the exact stage transforms of
    plans/curation.py — normalize → quality-gate → exact-dedup →
    near-dedup survivor selection → tokenize+fingerprint — composed
    without the inter-stage materialization (which only exists for
    restartability; the dataflow is identical, so this IS the pipeline's
    semantics under the oracle). The DuckDB twin recomputes every stage,
    with the near-dedup leg as exact shingle-Jaccard >= 0.5 — equal to
    the LSH+verify output whenever LSH recall is 1 (the documented,
    pytest-checked contract of dedup-minhash-lsh)."""
    d = widen(t(spark, sf, "documents"))
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    d = d.withColumn("text", norm)
    gated = T.quality_score(d).where(
        (F.col("n_tokens") >= 10) & (F.col("mean_token_len") >= 2)
    )
    keep = D.exact_dedup(gated).select("keep_id")
    uniq = gated.join(keep, gated["doc_id"] == keep["keep_id"], "left_semi")
    # uniq feeds BOTH the LSH pair generation and the survivor anti-join;
    # localCheckpoint computes the normalize→gate→exact-dedup prefix once
    # (the staged runner gets the same effect from its materialized
    # inter-stage tables)
    uniq = uniq.localCheckpoint(eager=False)
    pairs = D.minhash_lsh_pairs(uniq, threshold=0.5)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = uniq.join(losers, "doc_id", "left_anti")
    out = T.fingerprint(T.token_count(survivors))
    return out.select("doc_id", "source", "n_tokens", "fp")


@query(
    "text-bpe-pairs",
    r"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS w
      FROM documents
    ),
    vocab AS (SELECT w, count(*) AS wc FROM toks GROUP BY w),
    pairs AS (
      SELECT wc, unnest(list_transform(
               range(1, greatest(len(cs), 1)),
               i -> cs[i] || cs[i+1])) AS pair
      FROM (SELECT wc, list_filter(string_split(w, ''), c -> c <> '') AS cs
            FROM vocab)
    )
    SELECT pair, CAST(sum(wc) AS BIGINT) AS freq
    FROM pairs GROUP BY pair
    ORDER BY freq DESC, pair
    LIMIT 25
    """,
)
def text_bpe_pairs(spark, sf):
    """First BPE merge-step statistic (operators/text.bpe_pair_counts):
    top adjacent char pairs over the corpus, counted off the collapsed
    word-frequency dict (vocab-sized explode, not corpus-sized) — ties
    broken by pair for determinism."""
    pairs = T.bpe_pair_counts(t(spark, sf, "documents"))
    return pairs.orderBy(F.desc("freq"), "pair").limit(25)


@query(
    "fuzzy-edit-join",
    """
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
      AND levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def fuzzy_edit_join(spark, sf):
    """Edit-distance self-join on part names (operators/fuzzy.py): the
    length-banded formulation is EXACT (see module proof), so the
    DuckDB oracle is the straight all-pairs Levenshtein join — equality
    of the two result sets IS the no-missed-pairs proof, driver-checked.
    The Spark plan stays an equi-join on the band (plan-audited: no
    cartesian/BNLJ)."""
    from genpipe_spark.operators.fuzzy import edit_distance_pairs

    return edit_distance_pairs(
        t(spark, sf, "part"), "p_partkey", "p_name", max_dist=3
    )


_LINE_DEDUP_LINES_SQL = r"""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
      FROM documents
    ),
    lines AS (
      SELECT doc_id, CAST(i AS INT) AS line_no,
             array_to_string(ws[(i*3+1):(i*3+3)], ' ') AS line
      FROM d, unnest(range(0, CAST(ceil(len(ws)/3.0) AS BIGINT))) AS t(i)
    )
"""

_LINE_DEDUP_SQL = (
    _LINE_DEDUP_LINES_SQL
    + r"""
    , boiler AS (
      SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) >= 4
    ),
    surv_b AS (SELECT * FROM lines ANTI JOIN boiler USING (line)),
    surv_f AS (
      SELECT doc_id, line_no, line FROM (
        SELECT *, row_number() OVER (PARTITION BY line
                                     ORDER BY doc_id, line_no) AS rn
        FROM lines) WHERE rn = 1
    ),
    totals AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id),
    kept_b AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY line_no) AS text
      FROM surv_b GROUP BY doc_id
    ),
    kept_f AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY line_no) AS text
      FROM surv_f GROUP BY doc_id
    )
    SELECT 'boiler' AS part, t.doc_id, coalesce(k.text, '') AS text,
           t.n_lines, coalesce(k.n_kept, 0) AS n_kept
    FROM totals t LEFT JOIN kept_b k USING (doc_id)
    UNION ALL
    SELECT 'first', t.doc_id, coalesce(k.text, ''),
           t.n_lines, coalesce(k.n_kept, 0)
    FROM totals t LEFT JOIN kept_f k USING (doc_id)
    """
)


def _doc_lines(spark, sf, width=3):
    """(doc_id, line_no, line): the fixture corpus has no newlines, so
    'lines' are fixed 3-token windows (the text-chunk machinery at
    width 3) — same shapes a newline split would produce on real data."""
    from genpipe_spark.operators.hof import bind

    d = widen(t(spark, sf, "documents"))
    ws_expr = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    ex = d.select(
        "doc_id",
        F.explode(bind(ws_expr, lambda ws: _token_chunk_structs(ws, width))).alias("c"),
    )
    return ex.select(
        "doc_id",
        F.col("c.chunk_id").alias("line_no"),
        F.col("c.chunk_text").alias("line"),
    )


@query("text-line-dedup", _LINE_DEDUP_SQL)
def text_line_dedup(spark, sf):
    """C4/Dolma-style corpus-wide line-level dedup
    (operators/dedup.line_dedup), both modes tagged into one entry:
    'boiler' drops every occurrence of lines present in >=4 distinct
    docs (boilerplate removal), 'first' keeps only the globally-first
    occurrence of each duplicated line (C4 exact line dedup). Documents
    are reassembled in original line order; fully-dropped docs survive
    with empty text. Three key-shuffles per mode, nothing broadcast."""
    from genpipe_spark.operators.dedup import line_dedup

    lines = _doc_lines(spark, sf)
    boiler = line_dedup(lines, mode="drop_common", min_docs=4)
    first = line_dedup(lines, mode="keep_first")
    return boiler.select(F.lit("boiler").alias("part"), "*").unionByName(
        first.select(F.lit("first").alias("part"), "*")
    )


def _pagerank_sql(iters=5, d=850_000):
    base = 1_000_000 - d
    sql = """
    WITH edges AS (
      SELECT DISTINCT o_custkey % 100 AS node, o_orderkey % 100 AS dst
      FROM orders WHERE o_custkey % 100 <> o_orderkey % 100
    ),
    nodes AS (
      SELECT node FROM edges UNION SELECT dst FROM edges
    ),
    outdeg AS (SELECT node, count(*) AS odeg FROM edges GROUP BY node),
    e AS (SELECT edges.node, dst, odeg FROM edges JOIN outdeg USING (node)),
    r0 AS (SELECT node, 1000000::BIGINT AS r FROM nodes)"""
    prev = "r0"
    for i in range(1, iters + 1):
        sql += f""",
    c{i} AS (
      SELECT e.dst AS node, sum(r // odeg) AS m
      FROM e JOIN {prev} USING (node) GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.node,
             CAST({base} + ({d}::BIGINT * coalesce(m, 0)) // 1000000 AS BIGINT) AS r
      FROM nodes n LEFT JOIN c{i} USING (node)
    )"""
        prev = f"r{i}"
    sql += f"""
    SELECT node, r AS rank_micro FROM {prev}
    """
    return sql


@query("graph-pagerank", _pagerank_sql())
def graph_pagerank(spark, sf):
    """Five exact-integer PageRank rounds (operators/graph.pagerank_micro)
    over a 100-node digraph derived from orders — the DuckDB twin
    unrolls the same five iterations, so the ranks (micro-units, int64
    `div` throughout) match bit-for-bit. Demonstrates the iterative
    join+agg pattern with per-round lineage cuts."""
    from genpipe_spark.operators.graph import pagerank_micro

    o = t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()
    return pagerank_micro(edges, "src", "dst", iters=5)


@query(
    "graph-bfs-levels",
    """
    WITH RECURSIVE edges AS (
      SELECT DISTINCT o_custkey % 100 AS src, o_orderkey % 100 AS dst
      FROM orders WHERE o_custkey % 100 <> o_orderkey % 100
    ),
    walk(node, level) AS (
      SELECT DISTINCT src AS node, 0 AS level FROM edges WHERE src < 3
      UNION
      SELECT e.dst, w.level + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.level < 6
    )
    SELECT node, min(level) AS level FROM walk GROUP BY node
    """,
)
def graph_bfs_levels(spark, sf):
    """Bounded multi-source BFS (operators/graph.bfs_levels) from seed
    nodes {0,1,2} over the orders-derived digraph — minimum hop counts
    to depth 6. The DuckDB twin is a genuine WITH RECURSIVE walk whose
    min-level collapse must equal the iterative frontier expansion:
    recursive-CTE parity for an engine without recursive SQL."""
    from genpipe_spark.operators.graph import bfs_levels

    o = t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()
    seeds = edges.where(F.col("src") < 3).select(F.col("src").alias("node"))
    return bfs_levels(edges, seeds, max_depth=6)


@query(
    "graph-triangle-count",
    """
    WITH raw AS (
      SELECT DISTINCT
             CASE WHEN o_custkey % 100 < o_orderkey % 100
                  THEN o_custkey % 100 ELSE o_orderkey % 100 END AS a,
             CASE WHEN o_custkey % 100 < o_orderkey % 100
                  THEN o_orderkey % 100 ELSE o_custkey % 100 END AS b
      FROM orders WHERE o_custkey % 100 <> o_orderkey % 100
    ),
    deg AS (
      SELECT n, count(*) AS d FROM (
        SELECT a AS n FROM raw UNION ALL SELECT b AS n FROM raw)
      GROUP BY n
    ),
    o AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                  THEN a ELSE b END AS u,
             CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                  THEN b ELSE a END AS v
      FROM raw JOIN deg da ON da.n = raw.a JOIN deg db ON db.n = raw.b
    ),
    tri AS (
      SELECT e1.u AS u, e1.v AS v, e2.v AS w
      FROM o e1 JOIN o e2 ON e1.v = e2.u
      WHERE EXISTS (SELECT 1 FROM o e3 WHERE e3.u = e1.u AND e3.v = e2.v)
    ),
    corners AS (
      SELECT u AS node FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri
    )
    SELECT node, count(*) AS n_triangles FROM corners GROUP BY node
    """,
)
def graph_triangle_count(spark, sf):
    """Per-node triangle counts (operators/graph.triangle_count) over
    the same 100-node orders-derived graph as pagerank/BFS — the
    degree-ordered wedge join (one triangle = one wedge), replayed
    orientation-for-orientation by the oracle."""
    from genpipe_spark.operators.graph import triangle_count

    o = t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    )
    return triangle_count(edges)


# synth pixels -> all-integer 8x8 aHash, shared by the fingerprint
# entry and the near-dup pair entry below
_AHASH_CTE = """
    WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 2 = 0),
    dims AS (SELECT id, id % 13 + 4 AS w, id % 11 + 4 AS h FROM ids),
    px AS (
      SELECT id, w, h, y, x, c, (id*7 + 3*c + x + y) % 256 AS v
      FROM dims,
           unnest(range(0, h)) AS ty(y),
           unnest(range(0, w)) AS tx(x),
           unnest(range(0, 3)) AS tc(c)
    ),
    gray AS (
      SELECT id, w, h, y, x, CAST(sum(v) AS BIGINT) AS g3
      FROM px GROUP BY id, w, h, y, x
    ),
    blocks AS (
      SELECT id, w, h, (y*8)//h*8 + (x*8)//w AS idx,
             CAST(sum(g3) AS BIGINT) AS bsum, count(*) AS bcnt
      FROM gray GROUP BY id, w, h, (y*8)//h*8 + (x*8)//w
    ),
    bm AS (
      SELECT id, w, h, idx, CAST(bsum * 1000000 // bcnt AS BIGINT) AS bmq
      FROM blocks
    ),
    om AS (
      SELECT id, CAST(sum(bmq) // count(*) AS BIGINT) AS omq
      FROM bm GROUP BY id
    ),
    ah AS (
      SELECT bm.id AS media_id, bm.w, bm.h,
           CAST(coalesce(sum(CASE WHEN idx >= 32 AND bmq > omq
                 THEN (1::BIGINT << CAST(idx - 32 AS INT)) END), 0) AS BIGINT)
             AS ahash_hi,
           CAST(coalesce(sum(CASE WHEN idx < 32 AND bmq > omq
                 THEN (1::BIGINT << CAST(idx AS INT)) END), 0) AS BIGINT)
             AS ahash_lo
      FROM bm JOIN om ON om.id = bm.id
      GROUP BY bm.id, bm.w, bm.h
    )"""


@query(
    "multimodal-image-ahash",
    _AHASH_CTE + """
    SELECT media_id, w, h, ahash_hi, ahash_lo FROM ah
    """,
)
def multimodal_image_ahash(spark, sf):
    """Image perceptual fingerprints (operators/multimodal.image_ahash):
    REAL PPM decode in Arrow batches → all-integer 8x8 average-hash —
    the image-dedup primitive (dedup = groupBy(hash) or bit-block LSH,
    never pixel pairs). The DuckDB twin re-derives the same pixels from
    the synth closed form and replays the block/threshold arithmetic,
    so the 64-bit fingerprints match exactly."""
    from genpipe_spark.operators.multimodal import image_ahash, synth_media_real

    d = widen(t(spark, sf, "documents"))
    return image_ahash(synth_media_real(d))


@query(
    "multimodal-image-neardup",
    _AHASH_CTE + """
    SELECT id_a, id_b, hamming FROM (
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             CAST(bit_count(xor(a.ahash_hi, b.ahash_hi))
                  + bit_count(xor(a.ahash_lo, b.ahash_lo)) AS INTEGER)
               AS hamming
      FROM ah a JOIN ah b ON a.media_id < b.media_id
    ) WHERE hamming <= 4
    """,
)
def multimodal_image_neardup(spark, sf):
    """NEAR-DUPLICATE images (VERDICT r10 #5;
    operators/multimodal.image_neardup_pairs) — the multimodal
    counterpart of dedup-minhash-lsh: real PPM decode -> all-integer
    64-bit aHash -> 8-byte-block banded self-equi-join -> exact
    bit_count-XOR verify at Hamming <= 4. The 8-block pigeonhole makes
    the banding EXACT for d <= 7, so the oracle IS the recall check:
    it computes the plain exact pairwise join over the replayed
    fingerprints and the banded Spark plan must reproduce it
    verbatim (recall additionally pytest-asserted against an exact
    pairwise Spark join). Distribution probe: the synth fixture
    yields pairs at every distance 0..4 and keeps >90% of pairs OUT
    (the FIXTURES degeneracy rule). Scale: one 8x fingerprint
    explode + a 1-byte-key equi-join — never pixel pairs."""
    from genpipe_spark.operators.multimodal import (
        image_ahash,
        image_neardup_pairs,
        synth_media_real,
    )

    d = widen(t(spark, sf, "documents"))
    return image_neardup_pairs(
        image_ahash(synth_media_real(d)).select(
            "media_id", "ahash_hi", "ahash_lo"
        ),
        max_hamming=4,
    )


@query(
    "multimodal-audio-fingerprint",
    """
    WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id % 2 = 1),
    dims AS (SELECT id, id % 512 + 64 AS n FROM ids),
    samples AS (
      SELECT id, n, i, abs((id*31 + 17*i) % 16384 - 8192) AS a
      FROM dims, unnest(range(0, n)) AS ti(i)
    ),
    frames AS (
      SELECT id, n, (i*32)//n AS f, CAST(sum(a) AS BIGINT) AS esum,
             count(*) AS ecnt
      FROM samples GROUP BY id, n, (i*32)//n
    ),
    fm AS (SELECT id, n, f, CAST(esum * 1000000 // ecnt AS BIGINT) AS fmq FROM frames),
    om AS (SELECT id, CAST(sum(fmq) // count(*) AS BIGINT) AS omq FROM fm GROUP BY id)
    SELECT fm.id AS media_id, fm.n AS n_samples,
           CAST(coalesce(sum(CASE WHEN fmq > omq
                 THEN (1::BIGINT << CAST(f AS INT)) END), 0) AS BIGINT) AS afp
    FROM fm JOIN om ON om.id = fm.id
    GROUP BY fm.id, fm.n
    """,
)
def multimodal_audio_fingerprint(spark, sf):
    """Audio energy-band fingerprints
    (operators/multimodal.audio_fingerprint): real WAV decode in Arrow
    batches → 32-frame int64 energy hash; the DuckDB twin re-derives
    the PCM samples from the synth closed form and replays the
    arithmetic — exact fingerprint parity."""
    from genpipe_spark.operators.multimodal import audio_fingerprint, synth_media_real

    d = widen(t(spark, sf, "documents"))
    return audio_fingerprint(synth_media_real(d))


@query(
    "mix-balance-temperature",
    f"""
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    nmin AS (SELECT min(n) AS nmin FROM counts),
    temp AS (
      SELECT d.doc_id, d.source
      FROM documents d JOIN counts USING (source), nmin
      WHERE ({_MIX_HASH}) % 1000000
            < floor(1000000 * sqrt(nmin::DOUBLE) / sqrt(n::DOUBLE))
    ),
    bal AS (
      SELECT doc_id, source FROM (
        SELECT d.doc_id, d.source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY ({_MIX_HASH}), doc_id) AS rn
        FROM documents d), nmin
      WHERE rn <= nmin
    )
    SELECT 'temp' AS part, doc_id, source FROM temp
    UNION ALL
    SELECT 'balance', doc_id, source FROM bal
    """,
)
def mix_balance_temperature(spark, sf):
    """Corpus rebalancing pair (operators/mixing.py): 'temp' =
    temperature sampling at alpha=0.5 (rate = sqrt(n_min/n_g), IEEE-
    exact micro-rates), 'balance' = exact downsampling of every source
    to the smallest source's size by deterministic-hash-first pick.
    Both discover their targets FROM the data via a 1-row min attach
    (bounded crossJoin, whitelisted like the bm25 stats attach)."""
    from genpipe_spark.operators.mixing import balance_classes, temperature_sample

    d = t(spark, sf, "documents").select("doc_id", "source")
    temp = temperature_sample(d, "source").select(
        F.lit("temp").alias("part"), "doc_id", "source"
    )
    bal = balance_classes(d, "source").select(
        F.lit("balance").alias("part"), "doc_id", "source"
    )
    return temp.unionByName(bal)


_SPAN_POS_CTE = _WORD_FOLD_D + r""", sh AS (
      SELECT doc_id, i AS pos,
             ((wh[i] * 1000003) % 2147483647
              + (wh[i+1] * 9176) % 2147483647
              + wh[i+2]) % 2147483647 AS h
      FROM d, unnest(range(1, greatest(len(wh) - 1, 1))) AS t(i)
    )
"""


@query(
    "dedup-duplicated-spans",
    _SPAN_POS_CTE
    + """
    , shc AS (
      SELECT sh.doc_id, sh.pos, sh.h
      FROM sh ANTI JOIN (
        SELECT doc_id, h FROM sh GROUP BY doc_id, h HAVING count(*) > 32
      ) hot USING (doc_id, h)
    ),
    m AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb,
             a.pos - b.pos AS diag
      FROM shc a JOIN shc b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    runs AS (
      SELECT id_a, id_b, count(*) + 2 AS span_tokens,
             min(pa) AS start_a, min(pb) AS start_b
      FROM (
        SELECT *, pa - row_number() OVER (PARTITION BY id_a, id_b, diag
                                          ORDER BY pa) AS grp
        FROM m)
      GROUP BY id_a, id_b, diag, grp
      HAVING count(*) + 2 >= 6
    ),
    best AS (
      SELECT id_a, id_b, start_a AS longest_start_a,
             row_number() OVER (PARTITION BY id_a, id_b
                                ORDER BY span_tokens DESC, start_a DESC,
                                         start_b DESC) AS rn
      FROM runs
    ),
    isl AS (
      SELECT *, CASE WHEN prev_max_end IS NULL OR start_a > prev_max_end
                     THEN 1 ELSE 0 END AS new_island
      FROM (
        SELECT *, max(start_a + span_tokens)
                    OVER (PARTITION BY id_a, id_b
                          ORDER BY start_a, span_tokens
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS prev_max_end
        FROM runs)
    ),
    isl2 AS (
      SELECT *, sum(new_island) OVER (PARTITION BY id_a, id_b
                                      ORDER BY start_a, span_tokens
                                      ROWS UNBOUNDED PRECEDING) AS island
      FROM isl
    ),
    union_a AS (
      SELECT id_a, id_b, CAST(sum(union_len) AS BIGINT) AS dup_tokens_a
      FROM (
        SELECT id_a, id_b, island,
               max(start_a + span_tokens) - min(start_a) AS union_len
        FROM isl2 GROUP BY id_a, id_b, island)
      GROUP BY id_a, id_b
    )
    SELECT r.id_a, r.id_b, count(*) AS n_spans,
           max(span_tokens) AS max_span_tokens,
           min(u.dup_tokens_a) AS dup_tokens_a,
           min(b.longest_start_a) AS longest_start_a
    FROM runs r
    JOIN (SELECT * FROM best WHERE rn = 1) b
      ON b.id_a = r.id_a AND b.id_b = r.id_b
    JOIN union_a u ON u.id_a = r.id_a AND u.id_b = r.id_b
    GROUP BY r.id_a, r.id_b
    """,
)
def dedup_duplicated_spans(spark, sf):
    """Span-level exact duplicate detection
    (operators/dedup.duplicated_spans): maximal runs of consecutive
    matching 3-shingles between doc pairs — shared spans >= 6 tokens
    with counts, the longest span's size and start. Inverted positional
    index + gaps-and-islands on the match diagonal; candidate volume is
    shared-shingle-bounded, never all-pairs (plan-audited)."""
    from genpipe_spark.operators.dedup import duplicated_spans

    return duplicated_spans(
        widen(t(spark, sf, "documents")), min_span_tokens=6
    )


@query(
    "dedup-exact-substr",
    """
    WITH g AS MATERIALIZED (
      SELECT doc_id, i AS pos, substr(text, i, 20) AS gram
      FROM documents,
           unnest(range(1, greatest(length(text) - 18, 1))) AS ti(i)
      WHERE length(text) >= 20
    ),
    dup AS MATERIALIZED (
      SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
    ),
    m AS (SELECT g.doc_id, g.pos FROM g SEMI JOIN dup USING (gram)),
    lagged AS (
      SELECT doc_id, pos,
             lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      FROM m
    ),
    isl AS (
      SELECT doc_id, pos,
             sum(CASE WHEN prev IS NULL OR pos - prev > 20
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS grp
      FROM lagged
    )
    SELECT doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 19 AS BIGINT) AS span_end,
           CAST(max(pos) + 19 - min(pos) + 1 AS BIGINT) AS span_len,
           CAST(count(*) AS BIGINT) AS n_anchors
    FROM isl GROUP BY doc_id, grp
    """,
)
def dedup_exact_substr(spark, sf):
    """Lee et al. 2022 ExactSubstr corpus dedup
    (operators/dedup.exact_substring_spans, r8 verdict item 4 — the
    exact-substring method beyond shipped span/line dedup): per doc,
    the maximal character ranges covered by ANY >= 20-char substring
    occurring twice anywhere in the corpus — the byte ranges the
    paper's removal pass cuts. Suffix-array semantics via sorted
    k-mer anchoring: duplicated-anchor grams found by one combinable
    groupBy (xxhash64 prefilter carries 8-byte keys through the wide
    shuffle; exact-gram regroup of the tiny survivor set keeps it
    EXACT), islands merged per doc. No pair join — hot boilerplate is
    one hot count, not a pair blowup."""
    from genpipe_spark.operators.dedup import (
        exact_substring_spans,
        route_by_input_size,
    )

    # widen() cuts file lineage, so the operator's own size gate can't
    # see the input — decide the route from the UN-widened table (r10;
    # the gate's reasoning lives in route_by_input_size)
    d = t(spark, sf, "documents")
    return exact_substring_spans(
        widen(d), min_len=20, route=route_by_input_size(d)
    )


@query(
    "text-bigram-pmi",
    r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    toks0 AS (
      SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w
    ),
    toks AS (SELECT doc_id, i, ws[i] AS wd FROM toks0),
    big AS (
      SELECT a.wd AS w1, b.wd AS w2
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ),
    pc AS (
      SELECT w1, w2, count(*) AS n_pair FROM big GROUP BY w1, w2
      HAVING count(*) >= 3
    ),
    uni AS (SELECT wd, count(*) AS n_w FROM toks GROUP BY wd),
    nu AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_unigrams FROM uni),
    nb AS (SELECT count(*) AS n_bigrams FROM big)
    SELECT w1, w2, n_pair,
           CAST(floor(round(ln(
                 (CAST(n_pair AS DOUBLE) * CAST(n_unigrams AS DOUBLE)
                    * CAST(n_unigrams AS DOUBLE))
                 / (CAST(n_bigrams AS DOUBLE) * CAST(u1.n_w AS DOUBLE)
                    * CAST(u2.n_w AS DOUBLE))
               ) * 1e9) / 1000) AS BIGINT) AS pmi_micro
    FROM pc
    JOIN uni u1 ON u1.wd = w1
    JOIN uni u2 ON u2.wd = w2
    CROSS JOIN nu CROSS JOIN nb
    """,
)
def text_bigram_pmi(spark, sf):
    """Adjacent-word collocations scored by PMI
    (operators/text.bigram_pmi): multiword-expression induction over
    the corpus's own unigram/bigram distributions, min support 3.
    Micro-unit quantization (nano-round then floor) keeps libm ln
    cross-engine-stable (the module rule)."""
    from genpipe_spark.operators.text import bigram_pmi

    return bigram_pmi(widen(t(spark, sf, "documents")))


@query(
    "redact-pii",
    r"""
    WITH synth AS (
      SELECT c_custkey,
             'Contact ' || c_name || ' at ' ||
             lower(replace(c_name, '#', '_')) || '@example.com or ' ||
             CAST(c_custkey % 900 + 100 AS VARCHAR) || '-' ||
             CAST(c_nationkey + 100 AS VARCHAR) || '-' ||
             CAST(c_custkey % 9000 + 1000 AS VARCHAR) || ' from 10.0.' ||
             CAST(c_custkey % 256 AS VARCHAR) || '.' ||
             CAST(c_nationkey % 256 AS VARCHAR) || ' end' AS text
      FROM customer
    )
    SELECT c_custkey,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text,
             '\+?[0-9][0-9()\- ]{6,}[0-9]')) AS n_phone,
           len(regexp_extract_all(text,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>', 'g')
             AS redacted
    FROM synth
    """,
)
def redact_pii_query(spark, sf):
    """PII scrubbing (operators/text.pii_redact) with a DuckDB twin —
    the one LLM-pipeline operator that had no oracle row (VERDICT r6
    item 4): the documents fixture contains no PII, so the query
    SYNTHESIZES a deterministic PII-bearing text per customer row
    inside the query itself (identically on both engines): a name, a
    derived email, a key-derived phone number, and a key-derived IPv4. The
    oracle replays the same ordered regexp_replace chain (email first
    so phone can't eat digit runs inside addresses — note the email
    local part DOES contain an 8+ digit run that the phone counter
    sees on the original text but the phone REPLACER never does,
    pinning the documented pattern ordering); counts are taken on the
    original text in both engines. Patterns are the shared
    cross-engine-safe PII_PATTERNS (no lookaround/backrefs)."""
    c = t(spark, sf, "customer")
    synth = c.select(
        "c_custkey",
        F.concat(
            F.lit("Contact "), F.col("c_name"), F.lit(" at "),
            F.lower(F.regexp_replace(F.col("c_name"), "#", "_")),
            F.lit("@example.com or "),
            (F.col("c_custkey") % 900 + 100).cast("string"), F.lit("-"),
            (F.col("c_nationkey") + 100).cast("string"), F.lit("-"),
            (F.col("c_custkey") % 9000 + 1000).cast("string"),
            F.lit(" from 10.0."),
            (F.col("c_custkey") % 256).cast("string"), F.lit("."),
            (F.col("c_nationkey") % 256).cast("string"), F.lit(" end"),
        ).alias("text"),
    )
    return T.pii_redact(synth).select(
        "c_custkey", "n_email", "n_phone", "n_ipv4", "redacted"
    )


@query(
    "text-tfidf-topk",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS w
      FROM documents
    ),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
    dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, w, tf,
             tf * CAST(round(ln((n_docs + 1.0) / (df + 1.0)) * 1e9 + 1e9)
                       AS BIGINT) AS score_nano
      FROM tf JOIN dfreq USING (w) CROSS JOIN n
    )
    SELECT doc_id, w, tf, score_nano // 1000 AS score_micro
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score_nano DESC, w) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def text_tfidf_topk(spark, sf):
    """Per-document keyword extraction: top-3 terms by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the sklearn-style smoothing that keeps
    corpus-wide terms positive). Determinism doctrine: the ONE libm
    call (ln of a single pinned double division) is nano-rounded to
    int64 immediately, then score = tf * idf_nano stays in exact
    integer arithmetic through ranking and the micro-unit output; ties
    break by term. Plan shape: tf groupBy (doc, term) and df groupBy
    (term) are both map-side-combinable; the per-term df attaches by an
    equi-join (vocabulary never broadcast, same doctrine as bigram_pmi)
    and N is a 1-row broadcast; the final top-3 is a per-doc window over
    |doc x distinct-term| rows — no global sort, no all-corpus state."""
    docs = t(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    ).where(F.col("w") != "")
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf_nano = F.round(
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
        * 1e9
        + 1e9
    ).cast("long")
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "w", "tf", (F.col("tf") * idf_nano).alias("score_nano")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_nano").desc(), F.col("w")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "doc_id", "w", "tf",
            F.expr("score_nano div 1000").alias("score_micro"),
        )
    )


def _kcore_sql(k: int = 4, unroll: int = 8) -> str:
    """Unrolled peeling twin (the _pagerank_sql idiom): round i keeps
    nodes whose degree within round i-1's survivors is >= k. Peeling
    depth at every fixture SF is <= 4 (measured sf0.001-sf10), so 8
    unrolled rounds include >= 4 provable no-ops past the fixpoint; a
    hypothetical deeper cascade would surface as a LOUD value mismatch
    against the Spark side's exact fixpoint, never a silent pass."""
    # every CTE is AS MATERIALIZED: DuckDB inlines plain CTEs, and each
    # round references the previous one THREE times (the adjacency scan
    # plus both endpoint semi-joins through k{i}), so an un-materialized
    # 8-round unroll expands the base scan 3^8 times and never finishes
    # (round-7 lesson; the pagerank unroll survives only because its
    # chain references each level at most twice)
    sql = """
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT (o_orderkey % 3000) AS a,
             (o_orderkey % 3000) + 1 + (o_custkey % 4) AS b
      FROM orders
    ),
    u0 AS MATERIALIZED (
      SELECT a AS n, b AS m FROM e0 UNION ALL SELECT b, a FROM e0)"""
    prev = "u0"
    for i in range(1, unroll + 1):
        sql += f""",
    k{i} AS MATERIALIZED (
      SELECT n FROM (SELECT n, count(*) AS d FROM {prev} GROUP BY n)
      WHERE d >= {k}
    ),
    u{i} AS MATERIALIZED (
      SELECT u.n, u.m FROM {prev} u
      JOIN k{i} ka ON ka.n = u.n
      JOIN k{i} kb ON kb.n = u.m
    )"""
        prev = f"u{i}"
    sql += f"""
    SELECT n AS node, count(*) AS core_deg FROM {prev} GROUP BY n
    """
    return sql


@query("graph-kcore", _kcore_sql())
def graph_kcore(spark, sf):
    """k-core decomposition (operators/graph.kcore, k=4) over a
    deterministic chain-with-skips graph derived from orders (node i
    links to i+1..i+4 as the data provides) — a graph whose density
    SATURATES with SF (each node has <= 8 possible neighbors), so the
    peeling behavior stays nontrivial at every scale instead of
    trivializing as mod-graphs densify. Spark iterates to the exact
    fixpoint (rounds <= 4 at all fixture SFs, cap 64); the DuckDB twin
    unrolls 8 peeling rounds."""
    from genpipe_spark.operators.graph import kcore

    o = t(spark, sf, "orders")
    a = F.col("o_orderkey") % 3000
    edges = o.select(
        a.alias("a"), (a + 1 + F.col("o_custkey") % 4).alias("b")
    ).distinct()
    return kcore(edges, k=4)


@query(
    "profile-entropy",
    """
    WITH counts AS (
      SELECT lang,
             count(*) FILTER (WHERE doc_id % 2 = 0) AS na,
             count(*) FILTER (WHERE doc_id % 2 = 1) AS nb
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM counts),
    terms AS (
      SELECT CASE WHEN na > 0 THEN CAST(round(
               (CAST(na AS DOUBLE) / CAST(ta AS DOUBLE))
               * ln(CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)) * 1e9)
               AS BIGINT) ELSE 0 END AS pa_nano,
             CASE WHEN nb > 0 THEN CAST(round(
               (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))
               * ln(CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)) * 1e9)
               AS BIGINT) ELSE 0 END AS pb_nano,
             CAST(round(
               (0.5 * (CAST(na AS DOUBLE) / CAST(ta AS DOUBLE))
                + 0.5 * (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)))
               * ln(0.5 * (CAST(na AS DOUBLE) / CAST(ta AS DOUBLE))
                    + 0.5 * (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)))
               * 1e9) AS BIGINT) AS pm_nano
      FROM counts CROSS JOIN tot
    )
    SELECT CAST((SELECT ta FROM tot) AS BIGINT) AS n_a,
           CAST((SELECT tb FROM tot) AS BIGINT) AS n_b,
           CAST(-sum(pa_nano) AS BIGINT) // 1000 AS h_a_micro,
           CAST(-sum(pb_nano) AS BIGINT) // 1000 AS h_b_micro,
           CAST(-sum(pm_nano) AS BIGINT) // 1000 AS h_m_micro,
           (CAST(-sum(pm_nano) AS BIGINT) // 1000)
             - ((CAST(-sum(pa_nano) AS BIGINT) // 1000)
                + (CAST(-sum(pb_nano) AS BIGINT) // 1000)) // 2
             AS js_micro
    FROM terms
    """,
)
def profile_entropy(spark, sf):
    """Distribution entropy + Jensen-Shannon divergence between two
    deterministic halves of the corpus (doc_id parity) over the lang
    column — the corpus-version drift metric complementing PSI
    (profile-drift): JS is symmetric, bounded by ln 2, and defined even
    when a category is absent from one side (where PSI's log-ratio
    blows up). Determinism doctrine: each -p ln p term is nano-rounded
    to int64 immediately after the ONE pinned double expression (single
    division per probability, 0.5-weighted mixture in fixed order),
    summed exactly, floor-div'd to micro-nats; JS is then pure integer
    arithmetic over the three quantized entropies. Plan shape: one
    groupBy(lang) with two conditional counts (map-side combinable),
    a 1-row total attach, and a scalar aggregate — |categories| rows
    after the first shuffle, nothing collected."""
    docs = t(spark, sf, "documents")
    counts = docs.groupBy("lang").agg(
        F.count(F.when(F.col("doc_id") % 2 == 0, 1)).alias("na"),
        F.count(F.when(F.col("doc_id") % 2 == 1, 1)).alias("nb"),
    )
    tot = counts.agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    c = counts.crossJoin(F.broadcast(tot))
    pa = F.col("na").cast("double") / F.col("ta").cast("double")
    pb = F.col("nb").cast("double") / F.col("tb").cast("double")
    pm = F.lit(0.5) * pa + F.lit(0.5) * pb

    def nano(p, guard):
        term = F.round(p * F.log(p) * 1e9).cast("long")
        if guard is not None:
            return F.when(F.col(guard) > 0, term).otherwise(F.lit(0))
        return term

    terms = c.select(
        "ta", "tb",
        nano(pa, "na").alias("pa_nano"),
        nano(pb, "nb").alias("pb_nano"),
        nano(pm, None).alias("pm_nano"),
    )
    agg = terms.groupBy("ta", "tb").agg(
        (-F.sum("pa_nano")).alias("sa"),
        (-F.sum("pb_nano")).alias("sb"),
        (-F.sum("pm_nano")).alias("sm"),
    )
    return agg.select(
        F.col("ta").alias("n_a"),
        F.col("tb").alias("n_b"),
        F.expr("sa div 1000").alias("h_a_micro"),
        F.expr("sb div 1000").alias("h_b_micro"),
        F.expr("sm div 1000").alias("h_m_micro"),
        F.expr("(sm div 1000) - ((sa div 1000) + (sb div 1000)) div 2").alias(
            "js_micro"
        ),
    )


@query(
    "quantize-embedding-pq",
    """
    WITH e AS (
      SELECT vec_id,
             list_apply(embedding::DOUBLE[],
                        x -> CAST(floor(x * 10000 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    ms AS (SELECT unnest([0, 1, 2, 3]) AS m),
    sub AS (
      SELECT vec_id, m, list_slice(q, m * 16 + 1, m * 16 + 16) AS sq
      FROM e CROSS JOIN ms
    ),
    cents AS (
      SELECT m, vec_id AS cid, sq AS c FROM sub WHERE vec_id < 8
    ),
    dists AS (
      SELECT sub.vec_id, sub.m, cents.cid,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_apply(list_zip(sub.sq, cents.c),
                          p -> (p[1] - p[2]) * (p[1] - p[2]))),
               (a, b) -> a + b) AS dist
      FROM sub JOIN cents ON sub.m = cents.m
    )
    SELECT vec_id, m, cid AS code, dist
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                       ORDER BY dist, cid) AS rn
          FROM dists)
    WHERE rn = 1
    """,
)
def quantize_embedding_pq(spark, sf):
    """Product quantization (the IVF-PQ building block): the 64-dim
    embedding splits into M=4 contiguous 16-dim subspaces, each encoded
    as the id of its nearest codebook centroid — here the 8
    deterministic seed vectors' subvectors (the oracle-matched twin of
    a trained codebook, same seeding doctrine as the IVF query; the
    trained path would swap in kmeans_centroids exactly like
    ann-ivf-kmeans). All distances are EXACT int64: components are
    half-up-quantized to 1e-4 units first, so argmin + the (dist, cid)
    tie-break are engine-identical. Plan shape: per-vector explode to
    4 subspace rows, equi-join on the subspace id against a broadcast
    32-row codebook, one groupBy(vec_id, m) min-struct — linear in N,
    no all-pairs, codebook never shuffled. Output long-form
    (vec_id, m, code, dist): 4 rows per vector."""
    # quantizer + L2 fold shared with ivfpq_topk (similarity._q10k /
    # _l2sq) — ONE copy of the exactness-critical formulas (review r7)
    emb = t(spark, sf, "embeddings")
    q = emb.select("vec_id", S._q10k(F.col("embedding")).alias("q"))
    sub = q.select(
        "vec_id",
        F.explode(F.array(*[F.lit(m) for m in range(4)])).alias("m"),
        F.col("q"),
    ).select(
        "vec_id", "m", F.expr("slice(q, m * 16 + 1, 16)").alias("sq")
    )
    cents = sub.where(F.col("vec_id") < 8).select(
        F.col("m"), F.col("vec_id").alias("cid"), F.col("sq").alias("c")
    )
    dists = sub.join(F.broadcast(cents), "m").select(
        "vec_id", "m", "cid",
        S._l2sq(F.col("sq"), F.col("c")).alias("dist"),
    )
    best = dists.groupBy("vec_id", "m").agg(
        F.min(F.struct("dist", "cid")).alias("w")
    )
    return best.select(
        "vec_id", "m", F.col("w.cid").alias("code"), F.col("w.dist").alias("dist")
    )


def _l2_sql(a: str, b: str) -> str:
    """DuckDB twin of operators/similarity._l2sq: exact int64 squared
    L2 as a strict left fold over zipped quantized components."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_apply(list_zip({a}, {b}), p -> (p[1]-p[2])*(p[1]-p[2]))), "
        f"(x, y) -> x + y)"
    )


@query(
    "ann-ivfpq-topk",
    f"""
    WITH e AS (
      SELECT vec_id, list_apply(embedding::DOUBLE[],
             x -> CAST(floor(x * 10000 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, q AS cq FROM e WHERE vec_id < 8),
    cellmap AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_l2_sql('e.q', 'cq')}, cid) AS rn
        FROM e CROSS JOIN cents) WHERE rn = 1
    ),
    ms AS (SELECT unnest([0, 1, 2, 3]) AS m),
    sub AS (
      SELECT vec_id, m, list_slice(q, m * 16 + 1, m * 16 + 16) AS sq
      FROM e CROSS JOIN ms
    ),
    pqc AS (SELECT m, vec_id AS pcid, sq AS pc FROM sub WHERE vec_id < 8),
    codes AS (
      SELECT vec_id, m, pcid AS code FROM (
        SELECT sub.vec_id, sub.m, pqc.pcid,
               row_number() OVER (PARTITION BY sub.vec_id, sub.m
                                  ORDER BY {_l2_sql('sub.sq', 'pqc.pc')},
                                           pqc.pcid) AS rn
        FROM sub JOIN pqc ON sub.m = pqc.m) WHERE rn = 1
    ),
    qs AS (SELECT vec_id AS query_id, q AS qq FROM e
           WHERE vec_id % 97 = 0 AND vec_id < 1000),
    probe AS (
      SELECT query_id, cell FROM (
        SELECT query_id, cid AS cell,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {_l2_sql('qq', 'cq')}, cid) AS rn
        FROM qs CROSS JOIN cents) WHERE rn <= 3
    ),
    qd AS (
      SELECT query_id, m, pcid AS code,
             {_l2_sql('list_slice(qq, m * 16 + 1, m * 16 + 16)', 'pc')} AS d
      FROM qs CROSS JOIN pqc
    ),
    cand AS (
      SELECT query_id, cm.vec_id
      FROM probe JOIN cellmap cm ON cm.cell = probe.cell
      WHERE cm.vec_id <> query_id
    ),
    adist AS (
      SELECT cand.query_id, cand.vec_id,
             CAST(sum(qd.d) AS BIGINT) AS adist
      FROM cand
      JOIN codes ON codes.vec_id = cand.vec_id
      JOIN qd ON qd.query_id = cand.query_id
             AND qd.m = codes.m AND qd.code = codes.code
      GROUP BY 1, 2
    ),
    shortlist AS (
      SELECT query_id, vec_id
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY adist, vec_id) AS rn
            FROM adist)
      WHERE rn <= 64
    ),
    refined AS (
      SELECT s.query_id, s.vec_id, {_l2_sql('e.q', 'qs.qq')} AS dist
      FROM shortlist s
      JOIN e ON e.vec_id = s.vec_id
      JOIN qs ON qs.query_id = s.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, rank, dist
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY dist, vec_id) AS rank
          FROM refined)
    WHERE rank <= 5
    """,
)
def ann_ivfpq_topk(spark, sf):
    """IVF-PQ composed search (operators/similarity.ivfpq_topk): the
    third and final ANN form — brute (exact baseline), IVF (cell
    pruning, exact in-cell), IVF-PQ (cell pruning + O(M) asymmetric
    code distances + exact refine of the ADC top-64; the
    billion-vector FAISS posture where in-cell exact is still too
    hot). Deterministic seed codebooks and all-int64 quantized
    arithmetic make every step — cell assignment, PQ codes, ADC
    lookup sums, the refine re-rank, and both (dist, id) tie-breaks —
    engine-identical, so the DuckDB twin replays the full
    construction, not just the verdict. Queries are vec_id % 97
    capped below 1000 (6-11 at any SF) — the query set must NOT grow
    linearly with the corpus at FIXED num_cells, or the probe stage's
    Q·N·nprobe/cells work turns quadratic; production scales cells
    ~sqrt(N) instead (the codebook here is pinned to 8 seeds for
    oracle determinism). Recall vs exact-L2 brute force is separately
    pytest-gated like ann-ivf-topk's."""
    emb = t(spark, sf, "embeddings")
    return S.ivfpq_topk(
        emb, emb.where((F.col("vec_id") % 97 == 0) & (F.col("vec_id") < 1000))
    )


@query(
    "graph-link-predict",
    """
    WITH raw AS (
      SELECT DISTINCT o_orderkey % 3000 AS a,
             o_orderkey % 3000 + 1 + o_custkey % 4 AS b
      FROM orders
    ),
    adj AS (SELECT a AS v, b AS n FROM raw
            UNION ALL SELECT b AS v, a AS n FROM raw),
    deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
    pairs AS (
      SELECT a1.n AS u, a2.n AS w, count(*) AS common
      FROM adj a1 JOIN adj a2 ON a1.v = a2.v AND a1.n < a2.n
      GROUP BY u, w
      HAVING count(*) >= 2
    ),
    fresh AS (
      SELECT p.* FROM pairs p
      WHERE NOT EXISTS (SELECT 1 FROM raw
                        WHERE raw.a = p.u AND raw.b = p.w)
    )
    SELECT u, w, common, du.d AS du, dw.d AS dw,
           (1000000 * common) // (du.d + dw.d - common) AS jaccard_micro
    FROM fresh JOIN deg du ON du.v = u JOIN deg dw ON dw.v = w
    """,
)
def graph_link_predict(spark, sf):
    """Common-neighbor link prediction (operators/graph.
    common_neighbors): non-adjacent node pairs sharing >= 2 neighbors,
    scored by exact-millionths neighborhood Jaccard — the candidate
    generator for entity resolution / recommendation. The graph is the
    kcore chain-with-skips (node i links to i+1..i+4 as the data
    provides): bounded degree <= 8 at EVERY SF, so the prediction set
    stays non-trivial instead of saturating to a complete graph the
    way mod-N graphs densify. Uncapped here (bounded degree); the
    operator's max_center_degree knob is the documented hub-quadratic
    mitigation at 100 TB, unit-tested separately."""
    from genpipe_spark.operators.graph import common_neighbors

    o = t(spark, sf, "orders")
    a = F.col("o_orderkey") % 3000
    edges = o.select(
        a.alias("src"), (a + 1 + F.col("o_custkey") % 4).alias("dst")
    )
    return common_neighbors(edges, min_common=2)


@query(
    "embedding-center-l2",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL),
    ex AS (SELECT vec_id, CAST(t.i AS INTEGER) AS pos,
                  CAST(floor(v[CAST(t.i AS INTEGER) + 1] * 1000000.0 + 0.5)
                       AS BIGINT) AS m
           FROM e, unnest(range(len(v))) AS t(i)),
    s AS (SELECT pos, CAST(sum(m) AS BIGINT) AS sm, count(*) AS n
          FROM ex GROUP BY pos),
    c AS (SELECT vec_id, ex.pos, m * n - sm AS c
          FROM ex JOIN s ON ex.pos = s.pos),
    arr AS (SELECT vec_id, list(c ORDER BY pos) AS cv
            FROM c GROUP BY vec_id),
    nrm AS (SELECT vec_id, cv,
                   sqrt(list_reduce(
                     list_prepend(0.0, list_apply(cv, y -> CAST(y AS DOUBLE))),
                     (a, b) -> a + b * b)) AS norm
            FROM arr)
    SELECT vec_id,
           array_to_string(list_apply(cv, y ->
             CASE WHEN norm = 0 THEN 0
                  ELSE CAST(floor(1000000.0 * CAST(y AS DOUBLE) / norm + 0.5)
                            AS BIGINT) END), '|') AS unit_micro
    FROM nrm
    """,
)
def embedding_center_l2(spark, sf):
    """Corpus mean-centering + L2 normalization of the embedding
    column (operators/similarity.center_l2_normalize) — the standard
    preprocessing before cosine retrieval/clustering, determinized:
    components quantize to int64 micros, per-dimension means are EXACT
    integer sums (the centered value rides as n*(m - mean), the n
    cancelling under normalization, so no order-dependent float mean
    ever exists), and the single norm fold is the strict left fold of
    the cosine doctrine. Output serialized for driver hashability."""
    from genpipe_spark.operators.similarity import center_l2_normalize

    out = center_l2_normalize(t(spark, sf, "embeddings"))
    return out.select("vec_id", F.concat_ws("|", "unit_micro").alias("unit_micro"))


@query(
    "dedup-containment",
    _SHINGLES_CTE
    + """
    , sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor(n_inter / sa.n * 10000)/10000.0 AS c_a_in_b,
           floor(n_inter / sb.n * 10000)/10000.0 AS c_b_in_a
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE floor(n_inter / sa.n * 10000)/10000.0 >= 0.5
       OR floor(n_inter / sb.n * 10000)/10000.0 >= 0.5
    """,
)
def dedup_containment(spark, sf):
    """Asymmetric shingle containment (operators/dedup.
    containment_pairs): catches a short doc pasted inside a long one —
    near-1 containment at near-0 Jaccard (boilerplate / quotation /
    partial-crawl duplication). Same inverted-index scale shape as
    dedup-ngram-jaccard; both directions reported per pair."""
    return D.containment_pairs(widen(t(spark, sf, "documents")), k=3, threshold=0.5)


@query(
    "dedup-jaccard-prefix",
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
    WHERE floor(n_inter / (sa.n + sb.n - n_inter) * 10000)/10000.0 >= 0.4
    """,
)
def dedup_jaccard_prefix(spark, sf):
    """Exact Jaccard pairs via PREFIX FILTERING (operators/dedup.
    jaccard_prefix_filter_pairs, the AllPairs/PPJoin rule): the
    self-join runs only over each doc's lowest-document-frequency
    shingle prefix (n - ceil(t*n) + 1 tokens) plus a size filter, so
    hot stop-shingles never drive the candidate join — the quadratic
    blowup the ``max_doc_freq`` cap bounds LOSSILY is avoided
    EXACTLY. The oracle is the full pairwise exact-Jaccard SQL: any
    candidate the prefix rule missed would surface as a hash
    mismatch. Equality with the inverted-index operator is also
    hypothesis-tested on adversarial tiny-vocab corpora."""
    return D.jaccard_prefix_filter_pairs(
        widen(t(spark, sf, "documents")), k=3, threshold=0.4
    )


@query(
    "text-rake-keywords",
    """
    WITH tok0 AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text),
                                                    '[^a-z0-9]+'),
                                 w -> w <> '') AS parts
      FROM documents
    ),
    tok AS (
      SELECT doc_id, CAST(t.i AS INTEGER) AS pos,
             parts[CAST(t.i AS INTEGER) + 1] AS w
      FROM tok0, unnest(range(len(parts))) AS t(i)
    ),
    ns AS (SELECT * FROM tok
           WHERE w NOT IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')),
    runs AS (
      SELECT doc_id, pos, w,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS island
      FROM ns
    ),
    plen AS (SELECT doc_id, island, count(*) AS phrase_len
             FROM runs GROUP BY 1, 2),
    member AS (SELECT r.*, phrase_len
               FROM runs r JOIN plen USING (doc_id, island)),
    wstats AS (SELECT doc_id, w, count(*) AS freq,
                      CAST(sum(phrase_len) AS BIGINT) AS degree
               FROM member GROUP BY 1, 2),
    scored AS (SELECT m.doc_id, m.island, m.pos, m.w,
                      (1000000 * degree) // freq AS w_score
               FROM member m JOIN wstats USING (doc_id, w)),
    phrases AS (
      SELECT doc_id, island, string_agg(w, ' ' ORDER BY pos) AS phrase,
             count(*) AS n_words, CAST(sum(w_score) AS BIGINT) AS score_micro
      FROM scored GROUP BY doc_id, island
    )
    SELECT doc_id, phrase, n_words, score_micro FROM (
      SELECT doc_id, phrase, n_words, score_micro,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_micro DESC, phrase) AS rk
      FROM phrases)
    WHERE rk = 1
    """,
)
def text_rake_keywords(spark, sf):
    """RAKE keyword extraction (operators/text.rake_keywords): the
    top-scoring stopword-delimited phrase per document by summed
    degree/frequency word scores in exact micros — unsupervised
    keyword metadata for corpus curation, next to TF-IDF's
    corpus-relative variant (text-tfidf-topk). Deterministic top-1
    via (score desc, phrase asc); the oracle replays tokenization,
    gaps-and-islands runs, and both aggregations in SQL."""
    from pyspark.sql import Window

    from genpipe_spark.operators.text import rake_keywords

    phrases = rake_keywords(widen(t(spark, sf, "documents")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), "phrase"
    )
    return (
        phrases.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", "phrase", "n_words", "score_micro")
    )


_ASSORT_ORACLE = """
WITH raw AS (
  SELECT DISTINCT
         CASE WHEN o_custkey % 100 < o_orderkey % 100
              THEN o_custkey % 100 ELSE o_orderkey % 100 END AS a,
         CASE WHEN o_custkey % 100 < o_orderkey % 100
              THEN o_orderkey % 100 ELSE o_custkey % 100 END AS b
  FROM orders WHERE o_custkey % 100 <> o_orderkey % 100
),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS n FROM raw UNION ALL SELECT b AS n FROM raw)
  GROUP BY n
),
dir AS (
  SELECT a AS u, b AS v FROM raw UNION ALL SELECT b AS u, a AS v FROM raw
),
j AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM dir JOIN deg du ON du.n = dir.u JOIN deg dv ON dv.n = dir.v
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(dx) AS BIGINT) AS sx,
         CAST(sum(dx*dx) AS BIGINT) AS sxx,
         CAST(sum(dx*dy) AS BIGINT) AS sxy
  FROM j
)
SELECT m, sx, sxx, sxy,
       CASE WHEN m * sxx - sx * sx = 0 THEN NULL ELSE
         CAST(floor(1000000.0 *
               (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)
       END AS assort_micro
FROM s
"""


@query("graph-assortativity", _ASSORT_ORACLE)
def graph_assortativity(spark, sf):
    """Degree assortativity (Newman 2002) of the undirected 100-node
    orders graph shared with pagerank/BFS/triangles — do hubs attach
    to hubs? Pearson correlation of endpoint degrees over the
    DIRECTED edge double-cover, which makes the x and y marginals
    identical (sy==sx, syy==sxx), so r collapses to the one-variance
    form (m*sxy - sx^2)/(m*sxx - sx^2) — no sqrt needed at all, ONE
    pinned-IEEE division over exact int64 moments (degrees <= 99 x
    edges <= 9900: every sum far below 2^53 — the no-split regime of
    the agg-grouped-corr doctrine, justified per the 128-bit note
    there). Plan: two grouped-size degree joins on a 100-node derived
    graph + one scalar agg; the scan is the only SF-bound stage."""
    o = t(spark, sf, "orders")
    e = o.select(
        (F.col("o_custkey") % 100).alias("s"),
        (F.col("o_orderkey") % 100).alias("t"),
    ).where(F.col("s") != F.col("t"))
    raw = e.select(
        F.least("s", "t").alias("a"), F.greatest("s", "t").alias("b")
    ).distinct()
    deg = (
        raw.select(F.col("a").alias("n"))
        .unionAll(raw.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    direct = raw.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        raw.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    j = (
        direct.join(deg.select(F.col("n").alias("u"), F.col("d").alias("dx")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dy")), "v")
    )
    s = j.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    m_d, sx_d = F.col("m").cast("double"), F.col("sx").cast("double")
    sxx_d, sxy_d = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    # a degree-regular graph (e.g. the mod-100 graph gone COMPLETE at
    # big replicas) has zero degree variance: assortativity is
    # undefined there, surfaced as NULL — never a division error
    return s.select(
        "m", "sx", "sxx", "sxy",
        F.when(
            F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx") == 0,
            F.lit(None).cast("long"),
        ).otherwise(
            F.floor(
                F.lit(1_000_000.0)
                * (m_d * sxy_d - sx_d * sx_d)
                / (m_d * sxx_d - sx_d * sx_d)
            ).cast("long")
        ).alias("assort_micro"),
    )


_CLUSTERING_ORACLE = """
WITH raw AS (
  SELECT DISTINCT
         CASE WHEN o_custkey % 100 < o_orderkey % 100
              THEN o_custkey % 100 ELSE o_orderkey % 100 END AS a,
         CASE WHEN o_custkey % 100 < o_orderkey % 100
              THEN o_orderkey % 100 ELSE o_custkey % 100 END AS b
  FROM orders WHERE o_custkey % 100 <> o_orderkey % 100
),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS n FROM raw UNION ALL SELECT b AS n FROM raw)
  GROUP BY n
),
o AS (
  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
              THEN a ELSE b END AS u,
         CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
              THEN b ELSE a END AS v
  FROM raw JOIN deg da ON da.n = raw.a JOIN deg db ON db.n = raw.b
),
tri AS (
  SELECT e1.u AS u, e1.v AS v, e2.v AS w
  FROM o e1 JOIN o e2 ON e1.v = e2.u
  WHERE EXISTS (SELECT 1 FROM o e3 WHERE e3.u = e1.u AND e3.v = e2.v)
),
tcount AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT v FROM tri
    UNION ALL SELECT w FROM tri)
  GROUP BY node
)
SELECT deg.n AS node, deg.d,
       CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.d < 2 THEN 0
            ELSE (2000000 * coalesce(n_triangles, 0))
                 // (deg.d * (deg.d - 1)) END AS clustering_micro
FROM deg LEFT JOIN tcount ON tcount.node = deg.n
"""


@query("graph-clustering-coeff", _CLUSTERING_ORACLE)
def graph_clustering_coeff(spark, sf):
    """Local clustering coefficient per node — closed-wedge fraction
    C(v) = 2*T(v) / (d(v)*(d(v)-1)), the standard 'how clique-like is
    this neighborhood' measure (with assortativity, the second global
    graph-structure audit). Reuses the degree-ordered wedge-join
    triangle counts (operators/graph.triangle_count — no new join
    shape) LEFT-joined onto the degree table so triangle-free nodes
    emit C=0, then ONE pure integer expression:
    clustering_micro = 2e6*T div (d*(d-1)), zero float. Cost is the
    triangle count's; the join adds a node-sized exchange."""
    from genpipe_spark.operators.graph import triangle_count

    o = t(spark, sf, "orders")
    e = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    raw = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        raw.select(F.col("a").alias("node"))
        .unionAll(raw.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    tri = triangle_count(e)
    j = deg.join(tri, "node", "left").select(
        "node", "d",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
    )
    return j.select(
        "node", "d", "n_triangles",
        F.when(F.col("d") < 2, F.lit(0))
        .otherwise(
            F.expr("(2000000 * n_triangles) div (d * (d - 1))")
        ).alias("clustering_micro"),
    )


def _powerit_oracle(iters: int = 3, keep_bits: int = 21) -> str:
    # generated unroll (the pagerank/hilbert oracle pattern): one
    # (dot, w, shift, v) CTE block per iteration, each replaying the
    # operator's exact integer steps. sh* fold via length(bin(m)) ==
    # bit_length for positive m; floor division via the pmod adjust.
    sh_expr = "(1::BIGINT << sh)"
    blocks = [
        """flat AS (
  SELECT vec_id, i - 1 AS j,
         GREATEST(-8, LEAST(7,
           CAST(floor(CAST(embedding[i] AS DOUBLE) * 16) AS BIGINT))) AS xq
  FROM embeddings, unnest(range(1, 65)) AS t(i)
)""",
        """dot1 AS (
  SELECT vec_id, CAST(sum(xq) AS BIGINT) AS d FROM flat GROUP BY vec_id
)""",
    ]
    for t in range(1, iters + 1):
        if t > 1:
            blocks.append(f"""dot{t} AS (
  SELECT vec_id, CAST(sum(xq * v) AS BIGINT) AS d
  FROM flat JOIN v{t-1} USING (j) GROUP BY vec_id
)""")
        blocks.append(f"""w{t} AS (
  SELECT j, CAST(sum(xq * d) AS BIGINT) AS w
  FROM flat JOIN dot{t} USING (vec_id) GROUP BY j
)""")
        blocks.append(f"""s{t} AS (
  SELECT greatest(length(bin(CAST(max(abs(w)) AS BIGINT))) - {keep_bits}, 0)
           AS sh
  FROM w{t}
)""")
        blocks.append(f"""v{t} AS (
  SELECT j,
         (w - ((w % {sh_expr}) + {sh_expr}) % {sh_expr}) // {sh_expr} AS v
  FROM w{t} CROSS JOIN s{t}
)""")
    n = iters
    return (
        "WITH " + ",\n".join(blocks) + f"""
SELECT w{n}.j, w{n}.w, CAST(sh AS BIGINT) AS shift, v{n}.v
FROM w{n} JOIN v{n} ON v{n}.j = w{n}.j CROSS JOIN s{n}
"""
    )


@query("embedding-top-direction", _powerit_oracle())
def embedding_top_direction(spark, sf):
    """Dominant principal direction of the embedding corpus by THREE
    power-method iterations on the Gram operator
    (operators/similarity.power_iteration_top_dir) — the first PCA
    axis every embedding-drift / anisotropy audit starts from. The
    whole computation is PURE int64: components quantize to
    floor(x*16) in [-8, 7] (x16 is a power of two — the float multiply
    is exact, so the quantization is engine-identical), each iteration
    is two map-side-combinable aggregates + one keyed join, and
    normalization is replaced by a power-of-two floor shift keeping 21
    significant bits (direction-preserving). The oracle is a GENERATED
    per-iteration SQL unroll (the pagerank pattern) matching w, shift,
    and v bit-for-bit. Driver state: 64 rows per iteration (the
    dimensionality, never the corpus)."""
    from genpipe_spark.operators.similarity import power_iteration_top_dir

    emb = t(spark, sf, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("j", "x")
    ).select(
        "vec_id",
        F.col("j").cast("long").alias("j"),
        F.greatest(
            F.lit(-8),
            F.least(
                F.lit(7),
                F.floor(F.col("x").cast("double") * 16).cast("long"),
            ),
        ).alias("xq"),
    )
    return power_iteration_top_dir(flat, iters=3, keep_bits=21)


_HASHFEAT_ORACLE = _WORD_FOLD_D + r"""
, tok AS (SELECT doc_id, unnest(wh) AS h FROM d)
SELECT doc_id, h % 32 AS bucket,
       CAST(sum(CASE WHEN (h // 32) % 2 = 0 THEN 1 ELSE -1 END)
            AS BIGINT) AS feat,
       CAST(count(*) AS BIGINT) AS n_hits
FROM tok GROUP BY doc_id, h % 32
"""


@query("text-hash-features", _HASHFEAT_ORACLE)
def text_hash_features(spark, sf):
    """Feature hashing (Weinberger 2009, the 'hashing trick'): every
    document becomes a sparse 32-bucket signed-count vector — the
    fixed-width featurizer that needs NO vocabulary table, the reason
    it scales to 100 TB corpora (no fit pass, no dictionary broadcast,
    map-side-combinable counts; collisions are the accepted noise the
    sign bit de-biases in expectation). bucket = wh % 32 and
    sign = ±1 from the next hash bit, over the repo's portable 31-bit
    polynomial word hash (operators/dedup._word_hash) — the oracle
    replays hash, bucket, and sign exactly. One scan + one grouped
    agg; output is corpus-sparse (only occupied buckets emit)."""
    from genpipe_spark.operators.dedup import _word_hash

    docs = t(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
        ).alias("w"),
    ).select("doc_id", _word_hash(F.col("w")).alias("h"))
    return toks.groupBy(
        "doc_id", (F.col("h") % 32).alias("bucket")
    ).agg(
        F.sum(
            F.when(F.expr("(h div 32) % 2 = 0"), 1).otherwise(-1)
        ).alias("feat"),
        F.count(F.lit(1)).alias("n_hits"),
    )


def _profile_diff_side_sql(cols: tuple, where: str) -> str:
    return "\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_str,
           CAST(max({c}) AS VARCHAR) AS max_str
    FROM lineitem WHERE {where}
    """
        for c in cols
    )


_PROFILE_DIFF_OLD_COLS = ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
_PROFILE_DIFF_NEW_COLS = ("l_orderkey", "l_quantity", "l_returnflag", "l_discount")


_PROFILE_DIFF_ORACLE = f"""
WITH old AS ({_profile_diff_side_sql(_PROFILE_DIFF_OLD_COLS, "l_orderkey % 50 <> 0")}),
new AS ({_profile_diff_side_sql(_PROFILE_DIFF_NEW_COLS, "TRUE")})
SELECT coalesce(old.column, new.column) AS column,
       CASE WHEN old.column IS NULL THEN 'added'
            WHEN new.column IS NULL THEN 'dropped'
            ELSE 'common' END AS status,
       old.n_rows AS n_rows_old, new.n_rows AS n_rows_new,
       old.n_nulls AS n_nulls_old, new.n_nulls AS n_nulls_new,
       old.n_distinct AS n_distinct_old, new.n_distinct AS n_distinct_new,
       new.n_distinct - old.n_distinct AS distinct_delta,
       CASE WHEN old.column IS NULL OR new.column IS NULL THEN 'n/a'
            WHEN old.min_str <> new.min_str OR old.max_str <> new.max_str
            THEN 'yes' ELSE 'no' END AS range_changed
FROM old FULL OUTER JOIN new ON old.column = new.column
"""


def _profile_diff_frame(spark, sf):
    """Body of profile-diff (exact-distinct, oracle-paired). Its
    approx sibling no longer shares this frame: as of r9 it runs
    profile_table in "both" mode and value-hashes error-bound
    verdicts instead of raw sketch estimates (certified, not
    rows-only — see profile_diff_approx)."""
    from genpipe_spark.operators.profile import profile_table

    li = t(spark, sf, "lineitem")
    old = profile_table(
        li.where(F.expr("l_orderkey % 50 != 0")),
        _PROFILE_DIFF_OLD_COLS, approx_distinct=False,
    )
    new = profile_table(
        li, _PROFILE_DIFF_NEW_COLS, approx_distinct=False
    )
    o = old.select([F.col(c).alias(f"o_{c}") for c in old.columns])
    n = new.select([F.col(c).alias(f"n_{c}") for c in new.columns])
    j = o.join(n, o["o_column"] == n["n_column"], "full_outer")
    return j.select(
        F.coalesce("o_column", "n_column").alias("column"),
        F.when(F.col("o_column").isNull(), "added")
        .when(F.col("n_column").isNull(), "dropped")
        .otherwise("common").alias("status"),
        F.col("o_n_rows").alias("n_rows_old"),
        F.col("n_n_rows").alias("n_rows_new"),
        F.col("o_n_nulls").alias("n_nulls_old"),
        F.col("n_n_nulls").alias("n_nulls_new"),
        F.col("o_n_distinct").alias("n_distinct_old"),
        F.col("n_n_distinct").alias("n_distinct_new"),
        (F.col("n_n_distinct") - F.col("o_n_distinct")).alias("distinct_delta"),
        # string verdict, not nullable boolean: NULL booleans render
        # differently through the two engines' pandas paths
        F.when(
            F.col("o_column").isNull() | F.col("n_column").isNull(), "n/a"
        ).when(
            (F.col("o_min_str") != F.col("n_min_str"))
            | (F.col("o_max_str") != F.col("n_max_str")),
            "yes",
        ).otherwise("no").alias("range_changed"),
    )


@query("profile-diff", _PROFILE_DIFF_ORACLE)
def profile_diff(spark, sf):
    """Snapshot-to-snapshot profile DIFF — the schema/stats drift
    report a scheduled pipeline runs between corpus versions: two
    one-scan profiles (operators/profile.profile_table, exact-distinct
    mode so the oracle can replay n_distinct) full-outer-joined on
    column name, surfacing added/dropped columns (the new snapshot
    trades l_shipdate for l_discount) and per-column
    null/distinct/range deltas (the old snapshot drops every 50th
    order, so counts and extrema move). Complements profile-drift
    (distribution shift on ONE column): this is the STRUCTURAL drift
    view. Cost: two scans reduced map-side to #columns rows each; the
    join is column-count-sized. The HEADLINE bench entry is
    profile-diff-approx (the HLL default a user runs); this exact
    form exists for the parity gate."""
    return _profile_diff_frame(spark, sf)


_PROFILE_DIFF_APPROX_ORACLE = f"""
WITH old AS ({_profile_diff_side_sql(_PROFILE_DIFF_OLD_COLS, "l_orderkey % 50 <> 0")}),
new AS ({_profile_diff_side_sql(_PROFILE_DIFF_NEW_COLS, "TRUE")})
SELECT coalesce(old.column, new.column) AS column,
       CASE WHEN old.column IS NULL THEN 'added'
            WHEN new.column IS NULL THEN 'dropped'
            ELSE 'common' END AS status,
       old.n_rows AS n_rows_old, new.n_rows AS n_rows_new,
       old.n_nulls AS n_nulls_old, new.n_nulls AS n_nulls_new,
       CASE WHEN old.column IS NULL THEN 'n/a' ELSE 'yes' END
         AS distinct_ok_old,
       CASE WHEN new.column IS NULL THEN 'n/a' ELSE 'yes' END
         AS distinct_ok_new,
       CASE WHEN old.column IS NULL OR new.column IS NULL THEN 'n/a'
            WHEN old.min_str <> new.min_str OR old.max_str <> new.max_str
            THEN 'yes' ELSE 'no' END AS range_changed
FROM old FULL OUTER JOIN new ON old.column = new.column
"""


@query("profile-diff-approx", _PROFILE_DIFF_APPROX_ORACLE)
def profile_diff_approx(spark, sf):
    """profile-diff in the operator's approx-distinct mode, CERTIFIED
    (r8 verdict item 2 — this entry used to be rows-only): the HLL
    estimate itself is not engine-reproducible, so the value-hashed
    payload is the ERROR-BOUND VERDICT instead — per column and side,
    ``distinct_ok_* = 'yes'`` iff |approx - exact| * 10 <= exact
    (eps = 10%, i.e. 5 sigma at the operator's rsd 2% — an exact
    integer comparison, no floats), which the DuckDB twin pins as the
    literal 'yes' over its exact counts. A sketch outside its bound
    flips the verdict to 'no' and FAILS parity — the certification.
    One profile_table scan per side in "both" mode (HLL + exact in a
    single agg; the exact Expand is the certification surcharge —
    production runs keep the pure-HLL mode). Every other column is
    the exact sibling's oracle-pinned payload."""
    from genpipe_spark.operators.profile import profile_table

    li = t(spark, sf, "lineitem")
    old = profile_table(
        li.where(F.expr("l_orderkey % 50 != 0")),
        _PROFILE_DIFF_OLD_COLS, approx_distinct="both",
    )
    new = profile_table(
        li, _PROFILE_DIFF_NEW_COLS, approx_distinct="both"
    )
    o = old.select([F.col(c).alias(f"o_{c}") for c in old.columns])
    n = new.select([F.col(c).alias(f"n_{c}") for c in new.columns])
    j = o.join(n, o["o_column"] == n["n_column"], "full_outer")

    def ok(approx, exact):
        return (
            F.when(approx.isNull() | exact.isNull(), "n/a")
            .when(F.abs(approx - exact) * 10 <= exact, "yes")
            .otherwise("no")
        )

    return j.select(
        F.coalesce("o_column", "n_column").alias("column"),
        F.when(F.col("o_column").isNull(), "added")
        .when(F.col("n_column").isNull(), "dropped")
        .otherwise("common").alias("status"),
        F.col("o_n_rows").alias("n_rows_old"),
        F.col("n_n_rows").alias("n_rows_new"),
        F.col("o_n_nulls").alias("n_nulls_old"),
        F.col("n_n_nulls").alias("n_nulls_new"),
        ok(F.col("o_n_distinct"), F.col("o_n_distinct_exact"))
        .alias("distinct_ok_old"),
        ok(F.col("n_n_distinct"), F.col("n_n_distinct_exact"))
        .alias("distinct_ok_new"),
        F.when(
            F.col("o_column").isNull() | F.col("n_column").isNull(), "n/a"
        ).when(
            (F.col("o_min_str") != F.col("n_min_str"))
            | (F.col("o_max_str") != F.col("n_max_str")),
            "yes",
        ).otherwise("no").alias("range_changed"),
    )


def _lpa_oracle(iters: int) -> str:
    """Generated DuckDB twin of operators/graph.label_propagation —
    the synchronous rounds unrolled (fixed iteration count, so the
    recursion depth is static — the lttb-proper/pagerank precedent).
    Per round: neighbor-label counts + lexicographic struct argmax
    (count desc, label asc)."""
    head = """
WITH fwd AS (
  SELECT o_custkey % 100 AS a, o_orderkey % 100 AS b
  FROM orders WHERE o_custkey % 100 <> o_orderkey % 100
),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM fwd UNION ALL SELECT b AS a, a AS b FROM fwd
  )
),
nodes AS (SELECT DISTINCT a AS node FROM und),
l0 AS (SELECT node, node AS label FROM nodes)"""
    parts = [head]
    for i in range(1, iters + 1):
        parts.append(f""",
l{i} AS (
  SELECT c.node,
         (max(struct_pack(c := c.c, nl := -c.label, l := c.label))).l
           AS label
  FROM (
    SELECT u.a AS node, p.label, count(*) AS c
    FROM und u JOIN l{i - 1} p ON p.node = u.b
    GROUP BY u.a, p.label
  ) c
  GROUP BY c.node
)""")
    parts.append(f"\nSELECT node, label FROM l{iters}")
    return "".join(parts)


_LPA_ITERS = 4


@query("graph-label-propagation", _lpa_oracle(_LPA_ITERS))
def graph_label_propagation(spark, sf):
    """Community detection by synchronous label propagation
    (operators/graph.label_propagation, 4 rounds, min-label ties)
    over the symmetrized 100-node order graph — completing the graph
    family (components/pagerank/triangles/kcore/link-predict) with
    the community view. Sync + deterministic tiebreak + fixed rounds
    turn the usually-order-dependent LPA into a pure function of the
    graph, so the unrolled DuckDB twin matches label for label."""
    from genpipe_spark.operators.graph import label_propagation

    o = t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    )
    return label_propagation(edges, iters=_LPA_ITERS)


_SQS_K = 2048
_SQS_QS = (1, 25, 50, 75, 90, 99)
_SQS_EPS_PM = 60  # DKW eps in per-mille: sqrt(ln(2/1e-6)/(2*2048)) ~ 0.0595

_SQS_SQL = f"""
WITH base AS (
  SELECT (l_orderkey * 8 + l_linenumber)::BIGINT AS tb,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem
),
hs AS (SELECT tb, v, ((tb % 2147483647) * 506952114) % 2147483647 AS h
       FROM base),
nn AS (SELECT count(*)::BIGINT AS n FROM base),
bk  AS (SELECT h, tb, v FROM hs ORDER BY h, tb, v LIMIT {_SQS_K}),
bka AS (SELECT h, tb, v FROM hs WHERE tb % 2 = 0 ORDER BY h, tb, v LIMIT {_SQS_K}),
bkb AS (SELECT h, tb, v FROM hs WHERE tb % 2 = 1 ORDER BY h, tb, v LIMIT {_SQS_K}),
bkm AS (SELECT h, tb, v FROM (SELECT * FROM bka UNION ALL SELECT * FROM bkb)
        ORDER BY h, tb, v LIMIT {_SQS_K}),
vsg AS (SELECT list(v ORDER BY v) AS vs, count(*)::BIGINT AS ke FROM bk),
vsm AS (SELECT list(v ORDER BY v) AS vs, count(*)::BIGINT AS ke FROM bkm),
qs  AS (SELECT unnest([{", ".join(str(q) for q in _SQS_QS)}])::BIGINT AS q_pct),
ests AS (
  SELECT 'global' AS part, q_pct, ke,
         vs[greatest(1, (q_pct * ke + 99) // 100)] AS est_cents
  FROM qs, vsg
  UNION ALL
  SELECT 'merged', q_pct, ke,
         vs[greatest(1, (q_pct * ke + 99) // 100)]
  FROM qs, vsm
),
ranked AS (SELECT v, row_number() OVER (ORDER BY v, tb) AS rn FROM base),
exacts AS (
  SELECT q_pct, v AS exact_cents
  FROM (SELECT q_pct, greatest(1, (q_pct * n + 99) // 100) AS r FROM qs, nn)
  JOIN ranked ON rn = r
),
lohi AS (
  SELECT e.part, e.q_pct, e.ke, e.est_cents,
         sum(CASE WHEN b.v < e.est_cents THEN 1 ELSE 0 END)::BIGINT AS lo_n,
         sum(CASE WHEN b.v <= e.est_cents THEN 1 ELSE 0 END)::BIGINT AS hi_n
  FROM ests e, base b
  GROUP BY 1, 2, 3, 4
)
SELECT l.part, l.q_pct, l.ke, nn.n, l.est_cents, x.exact_cents,
       l.lo_n, l.hi_n, 'yes' AS verdict
FROM lohi l JOIN exacts x ON x.q_pct = l.q_pct, nn
"""


@query("sketch-sample-quantiles", _SQS_SQL)
def sketch_sample_quantiles(spark, sf):
    """Mergeable quantile sketch, CERTIFIED — the KMV doctrine applied
    to quantiles (operators/sketch.sample_quantile_sketch): the
    bottom-k={_SQS_K} lineitem rows by a scrambled multiplicative hash
    of the unique (orderkey, linenumber) row key are a deterministic
    uniform sample both engines reproduce row-for-row, unlike KLL/GK
    whose compaction depends on arrival order. Three certifications in
    ONE value hash: (1) the sketch replay — the oracle rebuilds the
    identical sample and nearest-rank estimates; (2) mergeability —
    the 'merged' part unions two disjoint half sketches (row-key
    parity split) and must equal 'global' EXACTLY (KMV-merge
    precedent); (3) the DKW rank-error bound — Spark computes the
    estimate's true rank interval [lo_n, hi_n] and emits
    verdict='yes' iff it intersects [q - 6%, q + 6%] (exact per-mille
    integers; DKW at k=2048 puts the failure odds ~1e-6), which the
    twin pins as the LITERAL 'yes' — a sketch out of bound fails
    parity loudly. Plan: the sketch is ONE TakeOrderedAndProject (k
    heap rows cross the wire, not data); the exact-quantile leg
    (global_row_number range shuffle + 6-rank broadcast join + one
    lo/hi scan) is the certification surcharge, absent in production
    use."""
    from ..operators.relational import global_row_number
    from ..operators.sketch import (
        sample_quantile_estimate,
        sample_quantile_merge,
        sample_quantile_sketch,
    )

    K = _SQS_K
    li = t(spark, sf, "lineitem")
    base = li.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
        .cast("long")
        .alias("tb"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
    )
    # r12 (guide §5 — cache only when reused): base feeds SIX passes
    # (count, the three sketch legs, global_row_number's range shuffle,
    # the lo/hi certification scan); one 2-long-column materialization
    # replaces five parquet re-scans + re-projects
    base = base.localCheckpoint(eager=False)
    n_df = base.agg(F.count(F.lit(1)).cast("long").alias("n"))

    g = sample_quantile_sketch(base, "v", "tb", K)
    a = sample_quantile_sketch(base.where(F.col("tb") % 2 == 0), "v", "tb", K)
    b = sample_quantile_sketch(base.where(F.col("tb") % 2 == 1), "v", "tb", K)
    m = (
        a.select(F.col("hs").alias("ha"))
        .crossJoin(b.select(F.col("hs").alias("hb")))
        .select(sample_quantile_merge(F.col("ha"), F.col("hb"), K).alias("hm"))
        .select(
            F.array_sort(F.transform(F.col("hm"), lambda x: x["v"])).alias("vs"),
            F.size("hm").cast("long").alias("ke"),
        )
    )
    qs = spark.range(1).select(
        F.explode(F.array([F.lit(q).cast("long") for q in _SQS_QS])).alias("q_pct")
    )
    ests = (
        qs.crossJoin(g.select("vs", "ke"))
        .select(F.lit("global").alias("part"), "q_pct", "ke", "vs")
        .unionByName(
            qs.crossJoin(m).select(
                F.lit("merged").alias("part"), "q_pct", "ke", "vs"
            )
        )
        .select(
            "part", "q_pct", "ke",
            sample_quantile_estimate(
                F.col("vs"), F.col("ke"), F.col("q_pct")
            ).alias("est_cents"),
        )
    )
    ranked = global_row_number(base, ["v", "tb"], "rn")
    ranks = qs.crossJoin(n_df).select(
        "q_pct",
        F.greatest(
            F.lit(1).cast("long"),
            ((F.col("q_pct") * F.col("n") + 99)
             - (F.col("q_pct") * F.col("n") + 99) % 100) / 100,
        ).cast("long").alias("r"),
    )
    exacts = (
        ranked.join(F.broadcast(ranks), F.col("rn") == F.col("r"))
        .select("q_pct", F.col("v").alias("exact_cents"))
    )
    lohi = (
        base.join(F.broadcast(ests))
        .groupBy("part", "q_pct", "ke", "est_cents")
        .agg(
            F.sum((F.col("v") < F.col("est_cents")).cast("long")).alias("lo_n"),
            F.sum((F.col("v") <= F.col("est_cents")).cast("long")).alias("hi_n"),
        )
    )
    out = (
        lohi.join(F.broadcast(exacts), "q_pct")
        .crossJoin(F.broadcast(n_df))
    )
    eps = F.lit(_SQS_EPS_PM).cast("long")
    return out.select(
        "part", "q_pct", "ke", "n", "est_cents", "exact_cents",
        "lo_n", "hi_n",
        F.when(
            (F.col("lo_n") * 1000 <= (F.col("q_pct") * 10 + eps) * F.col("n"))
            & (F.col("hi_n") * 1000 >= (F.col("q_pct") * 10 - eps) * F.col("n")),
            "yes",
        ).otherwise("no").alias("verdict"),
    )


_SEMDEDUP_TAU = 0.35

# adaptive K = max(8, ceil(n/256)): expected cluster size constant, pair
# stage linear. Assignment is TWO-LEVEL (K1 = max(2, ceil(sqrt(K)))
# coarse seeds partition the K fine seeds — the IVF shape): coarse
# probe, then fine scoring only within the row's coarse group. Both the
# K/K1 rule and each struct-argmax replay verbatim.
_SEMDEDUP_SQL = f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
kk AS (
  SELECT greatest(8, (count(*) + 255) // 256)::BIGINT AS k,
         greatest(2, CAST(ceil(sqrt(greatest(8, (count(*) + 255) // 256)))
                     AS BIGINT)) AS k1
  FROM e
),
fine AS (SELECT id AS fid, v AS fv FROM e, kk WHERE id < k),
coarse AS (SELECT id AS sid, v AS sv FROM e, kk WHERE id < k1),
fc AS (
  SELECT f.fid, f.fv,
         (max(struct_pack(c := {_cos_sql('f.fv', 'c.sv')},
                          n := -c.sid, i := c.sid))).i AS g
  FROM fine f, coarse c GROUP BY f.fid, f.fv
),
rc AS (
  SELECT e.id, e.v,
         (max(struct_pack(c := {_cos_sql('e.v', 'c.sv')},
                          n := -c.sid, i := c.sid))).i AS g
  FROM e, coarse c GROUP BY e.id, e.v
),
asg AS (
  SELECT r.id, r.v,
         (max(struct_pack(c := {_cos_sql('r.v', 'f.fv')},
                          n := -f.fid, i := f.fid))).i AS cluster
  FROM rc r JOIN fc f ON f.g = r.g
  GROUP BY r.id, r.v
),
hits AS (
  SELECT a.id AS id, min(b.id) AS dup_of
  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.id > b.id
  WHERE {_cos_sql('a.v', 'b.v')} >= {_SEMDEDUP_TAU}
  GROUP BY a.id
)
SELECT asg.id, asg.cluster,
       CASE WHEN h.dup_of IS NULL THEN 0 ELSE 1 END AS is_dup,
       coalesce(h.dup_of, -1)::BIGINT AS dup_of
FROM asg LEFT JOIN hits h ON h.id = asg.id
"""


@query("dedup-semantic", _SEMDEDUP_SQL)
def dedup_semantic(spark, sf):
    """SemDeDup (Abbas et al. 2023) — SEMANTIC deduplication, the
    embedding-space sibling of the lexical families (minhash/simhash
    catch copies; this catches paraphrases): assign every vector to
    its nearest pinned seed (argmax cosine, smallest-seed ties), then
    within each cluster drop vectors having a smaller-id neighbor at
    cosine >= 0.35, recording who shadowed them. Pairwise cost is
    confined to clusters (sum |cluster|^2 — the method's reason to
    exist; K scales with N in production, and the ann-ivf-kmeans
    entry — certified r10 — is where REAL iterated centroids live).
    The twin replays seeds, fold-cosine assignment, tiebreaks and
    verdicts exactly — operators/similarity.semdedup. levels=2 pins
    the oracle contract to the two-level tree the twin unrolls; the
    r10 three-level tree (auto beyond K=2048, measured crossover) is
    property-tested for verdict invariance and sweep-measured — extend
    the twin's unroll before registering an auto-levels entry."""
    from genpipe_spark.operators.similarity import semdedup

    return semdedup(t(spark, sf, "embeddings"), threshold=_SEMDEDUP_TAU,
                    levels=2)


def _mmr_sql(k_cand: int = 12, k_sel: int = 5) -> str:
    """Generated DuckDB twin of operators/similarity.mmr_rerank — the
    greedy rounds unrolled (fixed k_select, so the recursion depth is
    static: the LPA/power-iteration precedent). Per round: remaining =
    candidates minus selected-so-far; score = 0.7*rel -
    (1.0 - 0.7)*max-sim-to-selected — written EXACTLY as (1.0 - 0.7)
    so DuckDB computes the same 0.30000000000000004 double the Python
    side's (1 - lam) produces; argmax via the struct-max id-tiebreak
    idiom."""
    head = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 4),
sc0 AS (
  SELECT query_id, e.vec_id AS cid, {_cos_sql('qv', 'e.v')} AS rel
  FROM e JOIN q ON e.vec_id <> query_id
),
cand AS (
  SELECT query_id, cid, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, cid) AS rn
    FROM sc0
  ) WHERE rn <= {k_cand}
),
sims AS (
  SELECT a.query_id, a.cid AS sa, b.cid AS sb,
         {_cos_sql('ea.v', 'eb.v')} AS sim
  FROM cand a
  JOIN cand b ON a.query_id = b.query_id AND a.cid <> b.cid
  JOIN e ea ON ea.vec_id = a.cid
  JOIN e eb ON eb.vec_id = b.cid
),
s1 AS (
  SELECT query_id, m.i AS vec_id, m.r AS rel, m.sc AS score,
         1 AS sel_rank
  FROM (
    SELECT query_id,
           max(struct_pack(s := rel, n := -cid, i := cid,
                           r := rel, sc := rel)) AS m
    FROM cand GROUP BY query_id
  )
),
selall1 AS (SELECT * FROM s1)"""
    parts = [head]
    for r in range(2, k_sel + 1):
        parts.append(f""",
ms{r} AS (
  SELECT si.query_id, si.sa AS cid, max(si.sim) AS maxsim
  FROM sims si
  JOIN selall{r - 1} s ON s.query_id = si.query_id AND s.vec_id = si.sb
  GROUP BY 1, 2
),
sc{r} AS (
  SELECT c.query_id, c.cid, c.rel,
         CAST(0.7 AS DOUBLE) * c.rel
           - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * m.maxsim AS mmr
  FROM cand c
  JOIN ms{r} m ON m.query_id = c.query_id AND m.cid = c.cid
  WHERE NOT EXISTS (SELECT 1 FROM selall{r - 1} s
                    WHERE s.query_id = c.query_id AND s.vec_id = c.cid)
),
s{r} AS (
  SELECT query_id, m.i AS vec_id, m.r AS rel, m.sc AS score,
         {r} AS sel_rank
  FROM (
    SELECT query_id,
           max(struct_pack(s := mmr, n := -cid, i := cid,
                           r := rel, sc := mmr)) AS m
    FROM sc{r} GROUP BY query_id
  )
),
selall{r} AS (SELECT * FROM selall{r - 1} UNION ALL SELECT * FROM s{r})""")
    parts.append(f"\nSELECT query_id, sel_rank, vec_id, rel, score FROM selall{k_sel}")
    return "".join(parts)


@query("search-mmr-rerank", _mmr_sql())
def search_mmr_rerank(spark, sf):
    """Maximal Marginal Relevance diversification
    (operators/similarity.mmr_rerank; Carbonell & Goldstein 1998) —
    the post-recall diversity pass completing the retrieval family:
    recall (brute/IVF/IVF-PQ/LSH) finds candidates, search-rrf-fusion
    merges rankers, MMR de-redundifies the final list. Four query
    vectors take their top-12 cosine candidates; five greedy rounds
    select argmax of 0.7*rel - 0.3*max-sim-to-selected with struct-max
    id tiebreaks. The greedy trajectory is bit-deterministic
    (fold-cosine doubles, exact literal arithmetic — the twin spells
    (1.0 - 0.7) to reproduce Python's 1-lam double), so the unrolled
    SQL replays every selection. Bounded after candidate generation:
    the sim table is |Q|*k^2 rows, each round a join over it — a
    fixed plan unroll, no driver loop."""
    from genpipe_spark.operators.similarity import mmr_rerank

    emb = t(spark, sf, "embeddings")
    return mmr_rerank(
        emb, emb.where(F.col("vec_id") < 4), k_candidates=12, k_select=5
    )


_KMV_SO_K = 256


def _kmv_setops_sql(k: int = _KMV_SO_K) -> str:
    est = (
        "CASE WHEN {n} < {k} THEN {n} "
        "ELSE CAST(floor({km1} * 2147483647.0 / {hk}) AS BIGINT) END"
    )

    def e(n, hk):
        return est.format(n=n, hk=hk, k=k, km1=k - 1)

    ok = (
        "CASE WHEN abs({est} - {ex}) * 4 <= {ex} THEN 'yes' ELSE 'no' END"
    )
    return (
        _SHINGLES_CTE
        + f"""
, sides AS (SELECT doc_id % 2 AS side, sh FROM sh),
hs AS (
  SELECT DISTINCT side, ((sh % 2147483647) * 506952114) % 2147483647 AS h
  FROM sides
),
bka AS (SELECT h FROM hs WHERE side = 0 ORDER BY h LIMIT {k}),
bkb AS (SELECT h FROM hs WHERE side = 1 ORDER BY h LIMIT {k}),
bku AS (SELECT DISTINCT h FROM (SELECT h FROM bka UNION ALL SELECT h FROM bkb)
        ORDER BY h LIMIT {k}),
sa AS (SELECT count(*)::BIGINT AS ka, max(h) AS hka FROM bka),
sb AS (SELECT count(*)::BIGINT AS kb, max(h) AS hkb FROM bkb),
su AS (SELECT count(*)::BIGINT AS ku, max(h) AS hku FROM bku),
ic AS (
  SELECT count(*)::BIGINT AS inter_cnt
  FROM bku
  WHERE h IN (SELECT h FROM bka) AND h IN (SELECT h FROM bkb)
),
exact AS (
  SELECT
    (SELECT count(DISTINCT sh) FROM sides WHERE side = 0)::BIGINT AS n_a,
    (SELECT count(DISTINCT sh) FROM sides WHERE side = 1)::BIGINT AS n_b,
    (SELECT count(DISTINCT sh) FROM sides)::BIGINT AS n_union,
    (SELECT count(*) FROM
       (SELECT DISTINCT sh FROM sides WHERE side = 0)
       NATURAL JOIN (SELECT DISTINCT sh FROM sides WHERE side = 1)
    )::BIGINT AS n_inter
)
SELECT {k} AS k, ka, kb, ku,
       {e('ka', 'hka')} AS est_a,
       {e('kb', 'hkb')} AS est_b,
       {e('ku', 'hku')} AS est_union,
       inter_cnt,
       (inter_cnt * ({e('ku', 'hku')})) // ku AS est_inter,
       n_a, n_b, n_union, n_inter,
       {ok.format(est=e('ka', 'hka'), ex='n_a')} AS ok_a,
       {ok.format(est=e('kb', 'hkb'), ex='n_b')} AS ok_b,
       {ok.format(est=e('ku', 'hku'), ex='n_union')} AS ok_union
FROM sa, sb, su, ic, exact
"""
    )


@query("sketch-kmv-setops", _kmv_setops_sql())
def sketch_kmv_setops(spark, sf):
    """KMV SET OPERATIONS — the reason mergeable sketches exist:
    distinct counts of a UNION and an INTERSECTION estimated from two
    independently-built bottom-k sketches without rescanning either
    side (theta-sketch semantics on the KMV doctrine). The two
    3-gram shingle sketches (doc-parity corpus split, k=256; shingles
    because the toy corpus VOCABULARY is only ~31 words, which would
    leave every sketch in its exact below-k regime and never exercise
    the estimator — a sanity-probe catch) merge to the
    union sketch (union -> sort -> first k, kmv_merge); the
    intersection rides the standard theta estimator: the fraction of
    union-sketch hashes present in BOTH side sketches scales the
    union estimate (exact integer arithmetic from replayed hash
    arrays). Every estimate is engine-replayed EXACTLY, and the three
    cardinality estimates additionally carry oracle-pinned 25%
    error-bound verdicts (~4 sigma at k=256's rsd ~6% — the DKW
    certification recipe); the intersection estimate is emitted
    without a pinned bound (its relative error grows as the true
    overlap shrinks — the documented theta-sketch caveat), but being
    a pure function of the sketches it still value-hash-verifies."""
    from genpipe_spark.operators.dedup import M31, shingle_hashes
    from genpipe_spark.operators.sketch import _SCRAMBLE, kmv_estimate, kmv_merge

    K = _KMV_SO_K
    docs = widen(t(spark, sf, "documents"))
    sh = docs.select(
        (F.col("doc_id") % 2).alias("side"),
        F.explode(shingle_hashes(F.col("text"), 3)).alias("sh"),
    )
    # r12 (guide §2.3 — aggregate before you shuffle): the r11 form
    # re-aggregated the checkpointed token table EIGHT times (two
    # per-side distincts for the sketches, four countDistinct legs,
    # an intersect join — 34 Exchanges). ONE map-side-combinable
    # groupBy(sh) with per-side presence flags now feeds everything:
    # the distinct-per-side hash sets ARE its flag filters and all
    # four exact counts are one agg over it. Same distinct sets, same
    # integer counts — estimates and verdicts bit-identical.
    g = sh.groupBy("sh").agg(
        F.max((F.col("side") == 0).cast("int")).alias("in_a"),
        F.max((F.col("side") == 1).cast("int")).alias("in_b"),
    )
    g = g.localCheckpoint(eager=False)

    def side_sketch(flag, alias):
        hs = (
            g.where(F.col(flag) == 1)
            .select(
                (((F.col("sh") % M31) * F.lit(_SCRAMBLE)) % M31).alias("h")
            )
            .distinct()
        )
        bottom = hs.orderBy("h").limit(K)
        return bottom.agg(
            F.array_sort(F.collect_list("h")).alias(alias)
        )

    a = side_sketch("in_a", "ma")
    b = side_sketch("in_b", "mb")
    exact = g.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter"),
    )
    j = a.crossJoin(b).select(
        "ma", "mb", kmv_merge(F.col("ma"), F.col("mb"), K).alias("mu")
    )
    inter_cnt = F.size(
        F.array_intersect(F.array_intersect(F.col("mu"), F.col("ma")), F.col("mb"))
    ).cast("long")
    est_u = kmv_estimate(F.col("mu"), K)
    # est_inter needs est_union as an operand: two-step withColumn
    out = j.select(
        F.lit(K).alias("k"),
        F.size("ma").cast("long").alias("ka"),
        F.size("mb").cast("long").alias("kb"),
        F.size("mu").cast("long").alias("ku"),
        kmv_estimate(F.col("ma"), K).alias("est_a"),
        kmv_estimate(F.col("mb"), K).alias("est_b"),
        est_u.alias("est_union"),
        inter_cnt.alias("inter_cnt"),
    ).withColumn(
        "est_inter",
        F.expr("(inter_cnt * est_union) div ku"),
    )
    res = out.crossJoin(exact)

    def ok(est, ex):
        return F.when(
            F.abs(F.col(est) - F.col(ex)) * 4 <= F.col(ex), "yes"
        ).otherwise("no")

    return res.select(
        "k", "ka", "kb", "ku", "est_a", "est_b", "est_union",
        "inter_cnt", "est_inter", "n_a", "n_b", "n_union", "n_inter",
        ok("est_a", "n_a").alias("ok_a"),
        ok("est_b", "n_b").alias("ok_b"),
        ok("est_union", "n_union").alias("ok_union"),
    )


def _harmonic_oracle(iters: int) -> str:
    """Generated twin of operators/graph.harmonic_centrality: the
    min-plus BFS rounds unrolled (the LPA precedent), reciprocals as
    integer 1000000 // d."""
    head = """
WITH fwd AS (
  SELECT o_custkey % 100 AS a, o_orderkey % 100 AS b
  FROM orders WHERE o_custkey % 100 <> o_orderkey % 100
),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM fwd UNION ALL SELECT b AS a, a AS b FROM fwd
  )
),
d1 AS (SELECT a AS s, b AS t, 1::BIGINT AS d FROM und)"""
    parts = [head]
    for i in range(2, iters + 1):
        parts.append(f""",
d{i} AS (
  SELECT s, t, min(d)::BIGINT AS d FROM (
    SELECT s, t, d FROM d{i - 1}
    UNION ALL
    SELECT p.s, e.b AS t, p.d + 1 AS d
    FROM d{i - 1} p JOIN und e ON e.a = p.t
    WHERE p.s <> e.b
  ) GROUP BY s, t
)""")
    parts.append(f"""
SELECT s AS node, count(*)::BIGINT AS n_reached,
       sum(1000000 // d)::BIGINT AS harmonic_micro
FROM d{iters} GROUP BY s""")
    return "".join(parts)


_HARMONIC_ITERS = 6


@query("graph-harmonic-centrality", _harmonic_oracle(_HARMONIC_ITERS))
def graph_harmonic_centrality(spark, sf):
    """Harmonic centrality (Boldi & Vigna 2014) over the symmetrized
    100-node order graph — the shortest-path member completing the
    graph-audit family (components / pagerank / triangles / k-core /
    assortativity / clustering / LPA communities): H(v) = sum of
    1/d(v,t) over reachable t, well-defined even when the graph
    disconnects. Exact all-pairs BFS via 6 unrolled min-plus rounds
    (>= the fixture diameter) over the BOUNDED modular node domain —
    the distance table is <= 100^2 rows at any SF, and 1/d rides
    integer micro division, so the unrolled twin matches bit-for-bit
    (operators/graph.harmonic_centrality)."""
    from genpipe_spark.operators.graph import harmonic_centrality

    o = t(spark, sf, "orders")
    edges = o.select(
        (F.col("o_custkey") % 100).alias("src"),
        (F.col("o_orderkey") % 100).alias("dst"),
    )
    return harmonic_centrality(edges, iters=_HARMONIC_ITERS)
