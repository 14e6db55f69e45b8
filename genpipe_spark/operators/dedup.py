"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design: every variant reduces the candidate space *before* any
pairwise work — exact dedup is one hash-groupBy; MinHash/SimHash bucket
with LSH bands and only compare within buckets; n-gram Jaccard joins on
shared shingles (inverted index), never cross-joining documents. All of
it is shuffle-on-key DataFrame work AQE can manage at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from genpipe_spark.operators.hof import bind

M31 = 2147483647  # 2^31 - 1, prime: keeps every product < 2^62 (no
# int64 overflow in Spark OR an ANSI-SQL oracle), folds are portable


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: one hash-groupBy, keep the smallest id.
    Output: content_hash, keep_id, n_dups."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (arrays of words joined by single spaces)."""
    ws = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n = F.size(ws)
    return F.array_distinct(
        F.transform(_seq1(n - (k - 1)), lambda i: F.concat_ws(" ", F.slice(ws, i, k)))
    )


def _word_hash(w: Column) -> Column:
    """Deterministic 31-bit polynomial char hash (portable across engines,
    unlike xxhash64)."""
    chars = F.filter(F.split(w, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(7).cast("long"),
        lambda a, ch: (a * 31 + F.ascii(ch)) % F.lit(M31),
    )


# shingle-combine multipliers (arbitrary constants < 2^31; every product
# is taken mod M31 before summing so nothing overflows int64)
_P1, _P2 = 1_000_003, 9176


def _seq1(n):
    """sequence(1, n) that is EMPTY when n < 1 — Spark's sequence walks
    DOWNWARD when end < start (sequence(1, 0) == [1, 0]), which turns a
    too-short document into phantom indexes (and try_element_at(_, 0)
    is a hard INVALID_INDEX_OF_ZERO error, not a NULL)."""
    return F.when(n >= 1, F.sequence(F.lit(1), n.cast("int"))).otherwise(
        F.array().cast("array<int>")
    )


def _shingle_combine(wh: Column, i: Column) -> Column:
    """The ONE k=3 shingle combine: (wh[i]*P1 + wh[i+1]*P2 + wh[i+2])
    mod M31 — shared by the distinct-set and positional index forms so
    the hash spec (and its SQL twins) cannot diverge."""
    return (
        (F.try_element_at(wh, i) * _P1) % F.lit(M31)
        + (F.try_element_at(wh, i + 1) * _P2) % F.lit(M31)
        + F.try_element_at(wh, i + 2)
    ) % F.lit(M31)


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingle *hashes*: chars are folded once per word,
    then each shingle combines k consecutive word hashes arithmetically —
    ~3x less interpreted work than hashing concatenated shingle strings,
    and the join key is a long instead of a string. Only k=3 is wired
    (the combine is explicit so an ANSI-SQL oracle can mirror it)."""
    if k != 3:
        raise ValueError("shingle_hashes is specialized for k=3")
    ws = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    wh_expr = F.transform(ws, _word_hash)

    def combine(wh: Column) -> Column:
        return F.array_distinct(
            F.transform(
                _seq1(F.size(wh) - 2), lambda i: _shingle_combine(wh, i)
            )
        )

    # bind: without it the word-hash array is re-evaluated per shingle
    # (66 s -> 0.9 s at sf0.1, see operators/hof.py)
    return bind(wh_expr, combine)


def minhash_signature(text: Column, num_hashes: int = 32, k: int = 3) -> Column:
    """MinHash signature: min over shingle hashes of (a_i*h + b_i) mod p
    for num_hashes fixed affine permutations (deterministic seeds).

    Single-pass vector fold: one ``aggregate`` over the shingle hashes
    carrying a num_hashes-wide accumulator, with the affine coefficients
    as constant arrays. Higher-order functions are interpreted (not
    codegen'd), so evaluating the shingle-hash fold once — instead of
    once per permutation — is a ~num_hashes× win (it took the sf0.1
    bench from 257 s to seconds)."""
    hs = shingle_hashes(text, k)
    # geometric seed orbits (48271^i, 69621^i — full-period Lehmer
    # multipliers mod M31), NOT an arithmetic progression: the old
    # a_i = (2i+1)*1103515245 family stepped a_i*h by a constant per
    # slot, a lattice walk that for unlucky shingle hashes h (step
    # near M31/q) made the SAME shingle win the min on a periodic
    # 1-in-q subset of slots — observed live at sf10 as a j=0.9878
    # pair disagreeing on 11/32 slots in a strict period-3 pattern
    # and escaping all 8 bands (ideal-theory odds ~3e-11). Consecutive
    # geometric seeds are multiplicatively unrelated, restoring the
    # per-slot independence the banding math assumes (r9).
    coeff_a = F.array(
        *[F.lit(pow(48271, i + 1, M31)) for i in range(num_hashes)]
    )
    coeff_b = F.array(
        *[F.lit(pow(69621, i + 1, M31)) for i in range(num_hashes)]
    )
    init = F.array_repeat(F.lit(M31).cast("long"), num_hashes)

    def step(acc: Column, h: Column) -> Column:
        vals = F.zip_with(coeff_a, coeff_b, lambda a, b: (h * a + b) % F.lit(M31))
        return F.zip_with(acc, vals, lambda x, y: F.least(x, y))

    return F.aggregate(hs, init, step)


def _band_structs(sig: Column, bands: int, rows_per_band: int) -> Column:
    """(band, bucket-hash) structs for LSH banding: bucket = hash of the
    band's signature slice, shared by the pairwise and index forms.

    r12 (guide §1.2/§4 — cheapen per-row work): bucket is Murmur3 over
    the int64 slice directly (``hash(slice(sig, ...))``) instead of the
    old per-element cast-to-string + concat_ws + hash — one hash call
    over 8-byte words vs rows_per_band string materializations per
    band. Any deterministic injective-enough function of the band
    slice yields the SAME candidate semantics (two docs collide iff
    their band slices are equal; accidental hash collisions only ADD
    candidates, which the exact verify removes), so entry outputs are
    unchanged — banding recall math is a property of slice equality,
    not of the bucket encoding. Measured: the 1666-doc 24-band index
    build drops 1.24 s -> ~0.5 s."""
    return F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.hash(
                    F.slice(sig, bi * rows_per_band + 1, rows_per_band)
                ).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
    impl: str = "arrow",
    verify: bool = True,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → minhash → band → bucket-join
    for candidates, then (with ``verify=True``, the default) EXACT Jaccard
    over the candidates' shingle sets — the production shape: LSH bounds
    the pair space (recall), the verify stage restores precision, and the
    exact computation touches only |candidates| pairs, never n².

    ``impl``: "arrow" (numpy-vectorized signatures, the fast path) or
    "expr" (pure column-expression fold — portable, slower).

    Output: id_a < id_b, jaccard (exact when verify=True, floor-truncated
    at 4) or est_jaccard (signature-agreement fraction) otherwise. The
    band join key is (band_index, band_hash) — candidate count scales with
    collisions, not n²."""
    rows_per_band = num_hashes // bands
    if impl == "arrow":
        sigd = minhash_signatures_arrow(df, text_col, id_col, num_hashes, k)
    else:
        sigd = df.select(
            F.col(id_col).alias("id"),
            minhash_signature(F.col(text_col), num_hashes, k).alias("sig"),
        )
    # the signature table feeds BOTH sides of the band self-join (and,
    # with verify, the candidate-id semi-join chain). Python stages do
    # not canonicalize for Spark's exchange reuse, so without a
    # materialization barrier the signature pass is recomputed once per
    # branch (10 MapInPandas nodes observed in the un-cut plan). Lazy
    # localCheckpoint computes it once and rereads — the same
    # persist-the-sketch step a 100 TB pipeline does explicitly (swap
    # for checkpoint()/a stage table on a real cluster).
    sigd = sigd.localCheckpoint(eager=False)
    # bind sig: CollapseProject would otherwise inline the signature
    # computation into all bands x rows_per_band use sites
    banded = sigd.select(
        "id",
        "sig",
        F.explode(
            bind(F.col("sig"), lambda sig: _band_structs(sig, bands, rows_per_band))
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    if verify:
        # signatures are not needed downstream: shed them before the
        # candidate dedup so the shuffle carries only the id pair
        banded = banded.drop("sig")
    a = banded.alias("a")
    b = banded.alias("b")
    pair_cols = [
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
    ] + (
        []
        if verify
        else [F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b")]
    )
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(*pair_cols)
        .dropDuplicates(["id_a", "id_b"])
    )
    if verify:
        # candidate pairs fan out into three downstream branches
        # (id_a leg, id_b leg, final pair join) — cut once; the pair
        # set is tiny by construction (collisions, not n²)
        cand = cand.localCheckpoint(eager=False)
    if not verify:
        agree = F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        est = F.floor(agree / F.lit(float(num_hashes)) * 10000) / 10000.0
        return cand.select("id_a", "id_b", est.alias("est_jaccard")).where(
            F.col("est_jaccard") >= threshold
        )

    # exact-verify stage: join the candidates back to per-doc distinct
    # shingle sets and compute true |A∩B| / |A∪B| per candidate pair only.
    # Shingle sets are computed only for docs that appear in a candidate
    # pair (semi-join) — at scale that is a tiny fraction of the corpus.
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    shs = df.join(
        cand_ids, df[id_col] == cand_ids["id"], "left_semi"
    ).select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), k).alias("shset"),
    )
    sh_a = shs.select(F.col("id").alias("id_a"), F.col("shset").alias("sh_a"))
    sh_b = shs.select(F.col("id").alias("id_b"), F.col("shset").alias("sh_b"))
    pairs = cand.select("id_a", "id_b").join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    jac = F.floor(inter / union * 10000) / 10000.0
    return pairs.select("id_a", "id_b", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard via an inverted shingle index: explode distinct
    shingle hashes, self-join on hash (only docs sharing >=1 shingle pair
    up), count intersections, compute |A∩B|/|A∪B|. Output: id_a < id_b,
    jaccard (floor-truncated at 4). Jaccard is over hashed shingles — the
    31-bit hash is identical in the SQL oracle, so any collision affects
    both engines identically (and is vanishingly rare per pair).

    ``max_doc_freq``: drop shingles appearing in more than this many
    documents from the inverted index before the self-join. A shingle in d
    docs yields d^2/2 candidate rows, so stop-word shingles make the join
    quadratic on real corpora; the cap bounds it (standard practice for
    inverted-index dedup at scale). None = exact Jaccard (the oracle
    semantics); with a cap, intersection counts exclude the hot shingles
    while |A| and |B| still count them, so reported jaccard is a lower
    bound. Size/intersection tables are per-document — joined with plain
    shuffle joins (NEVER broadcast: billions of rows at corpus scale; AQE
    still auto-broadcasts when genuinely small)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes(F.col(text_col), k)).alias("sh"),
    )
    # the inverted index feeds the self-join (both sides) and the size
    # table — four derivations of the shingle HOF without a
    # materialization barrier (exchange reuse does not fire across the
    # differing branch shapes). Persist-once, reread: the same
    # materialize-the-index step an at-scale pipeline does explicitly.
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_doc_freq)
            .select("sh")
        )
        sh = sh.join(rare, "sh", "left_semi")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.floor(jac * 10000) / 10000.0).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# second derived hash for simhash bits >= 31 (bit i of a 31-bit hash only
# exists for i < 31; reusing bit i%31 would double-count low bits)
_SIMHASH_H2_A, _SIMHASH_H2_B = 1_103_515_245, 12_345


def simhash(text: Column, bits: int = 32, k: int = 3) -> Column:
    """SimHash over shingle hashes: per bit, sign of the sum of ±1 votes.

    Single-pass vector fold like :func:`minhash_signature`: one
    ``aggregate`` carries a bits-wide vote accumulator; bit i of each
    31-bit shingle hash is read arithmetically (floor(h / 2^i) % 2 — exact
    in doubles below 2^53) because shiftright needs a literal shift.
    Bits 31..61 come from an independently derived second hash
    h2 = (h*a + b) mod M31 so no bit duplicates another; bits is capped at
    62 so the weighted recombination stays inside a signed long."""
    if not 1 <= bits <= 62:
        raise ValueError("simhash supports 1..62 bits (signed-long weights)")
    hs = shingle_hashes(text, k)
    idx = F.array(*[F.lit(i % 31) for i in range(bits)])
    use_h2 = F.array(*[F.lit(i >= 31) for i in range(bits)])
    init = F.array_repeat(F.lit(0).cast("long"), bits)

    def step(acc: Column, h: Column) -> Column:
        h2 = (h * _SIMHASH_H2_A + _SIMHASH_H2_B) % F.lit(M31)
        pairs = F.zip_with(
            idx, use_h2, lambda i, u: F.struct(i.alias("i"), u.alias("u"))
        )
        return F.zip_with(
            acc,
            pairs,
            lambda a, p: a
            + F.when(
                (
                    F.floor(
                        F.when(p["u"], h2).otherwise(h) / F.pow(F.lit(2.0), p["i"])
                    )
                    % 2
                ).cast("long")
                == 1,
                1,
            ).otherwise(-1),
        )

    votes = F.aggregate(hs, init, step)
    weights = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    return F.aggregate(
        F.zip_with(
            votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 3,
    two_level: bool = True,
) -> DataFrame:
    """SimHash near-dup pairs: bucket by simhash bit-blocks (banded
    Hamming LSH), compare exact hamming within buckets only — recall 1
    by pigeonhole either way, so the output never depends on the
    banding layout.

    Banding (VERDICT r11 #2 — the 8-bit-block candidate volume fix):

    * ``two_level=True`` (default): ``max_hamming + 2`` near-equal
      blocks, bucket key = the CONCATENATED keys of each block PAIR
      (C(B,2) keys/doc). With d differing bits at most d blocks are
      touched, so >= 2 blocks are clean and some clean PAIR agrees on
      its joint key. At bits=32, d=3: 5 blocks of 6-7 bits -> 10 keys
      of 12-14 bits (4,096-16,384 buckets) vs the old 4x8-bit 256 —
      ~10x lower random-collision volume for a 2.5x explode.
    * ``two_level=False``: ``max_hamming + 1`` single blocks (the
      classic layout; explode x(d+1), each key ~bits/(d+1) wide).
      Kept for the candidate-volume regression test and for narrow
      ``bits`` where block pairs would not fit.
    """
    sh = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col), bits).alias("sh"))
    # one row per doc, feeds both sides of the block self-join — persist
    # the fingerprint table once instead of running the fold twice
    sh = sh.localCheckpoint(eager=False)
    B = max_hamming + (2 if two_level else 1)
    if B > bits:
        raise ValueError(
            f"simhash_pairs: {B} blocks need at least {B} bits (got {bits})"
        )
    widths = [bits // B + (1 if i < bits % B else 0) for i in range(B)]
    offsets = [sum(widths[:i]) for i in range(B)]

    def block_key(bno):
        return (
            F.shiftright(F.col("sh"), offsets[bno])
            .bitwiseAND(F.lit((1 << widths[bno]) - 1))
        )

    if two_level:
        # key for block pair (i, j): key_i * 2^w_j + key_j — injective
        # per pair id, so equality == both blocks agree exactly
        block_structs = [
            F.struct(
                F.lit(i * B + j).alias("block"),
                (
                    block_key(i) * F.lit(1 << widths[j]) + block_key(j)
                ).alias("key"),
            )
            for i in range(B)
            for j in range(i + 1, B)
        ]
    else:
        block_structs = [
            F.struct(F.lit(bno).alias("block"), block_key(bno).alias("key"))
            for bno in range(B)
        ]
    banded = sh.select(
        "id", "sh", F.explode(F.array(*block_structs)).alias("bb")
    ).select("id", "sh", "bb.block", "bb.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def minhash_signatures_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 3,
) -> DataFrame:
    """Arrow-vectorized MinHash signatures via mapInPandas — the
    documented fast path when the interpreted HOF fold dominates
    (SCALE.md "Known costs"). r12 (guide §4.2 — hand whole batches to
    vectorized native code, don't loop rows in Python): ALL docs of an
    Arrow batch are processed in one flattened numpy pass — global
    crc32 word hashes, one triple-window combine over the flattened
    word array, per-doc shingle dedup via a single lexsort, and the
    permutation minima via ``np.minimum.reduceat`` per hash row over
    doc segment offsets. Hash values are BIT-IDENTICAL to the old
    per-doc loop (same crc32 family, same Lehmer seed orbits, same
    int64 arithmetic), so downstream candidates — and the streaming
    entries' oracle-replayed transcripts — are unchanged; only the
    per-doc Python/alloc overhead is gone (measured 1666-doc batch
    index: 1.2 s -> ~0.4 s).

    Same banding/estimation downstream as the expression path; the hash
    family differs (crc32 vs portable polynomial), which is fine for the
    approximate operator (recall-tested, not oracle-matched)."""
    import numpy as np
    import pandas as pd
    from zlib import crc32

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    # geometric seed orbits — see minhash_signature: the old
    # arithmetic-progression family produced periodic correlated
    # minima (an sf10 j=0.9878 pair escaped all 8 bands); Lehmer
    # powers decorrelate consecutive slots (r9)
    a = np.array(
        [pow(48271, i + 1, M31) for i in range(num_hashes)], dtype=np.int64
    )
    b = np.array(
        [pow(69621, i + 1, M31) for i in range(num_hashes)], dtype=np.int64
    )
    out_schema = StructType(
        [StructField("id", LongType()), StructField("sig", ArrayType(LongType()))]
    )

    def batches(it):
        for pdf in it:
            n_docs = len(pdf)
            if n_docs == 0:
                yield pd.DataFrame({"id": [], "sig": []})
                continue
            words_per_doc = [t.split() for t in pdf[text_col]]
            lens = np.fromiter(
                (len(ws) for ws in words_per_doc),
                dtype=np.int64, count=n_docs,
            )
            total = int(lens.sum())
            wh = np.fromiter(
                (crc32(w.encode()) for ws in words_per_doc for w in ws),
                dtype=np.int64, count=total,
            )
            off = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(lens, out=off[1:])
            # one global 3-word window combine; windows that straddle a
            # document boundary are dropped by position selection below
            tri = (
                (wh[:-2] * _P1 + wh[1:-1] * _P2 + wh[2:]) % M31
                if total >= k
                else np.zeros(0, dtype=np.int64)
            )
            n_win = np.maximum(lens - (k - 1), 0)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_win)
            win_starts = np.repeat(off[:-1], n_win)
            local = (
                np.arange(len(doc_of), dtype=np.int64)
                - np.repeat(np.cumsum(n_win) - n_win, n_win)
            )
            shv = tri[win_starts + local]
            # per-doc unique (replaces np.unique per doc): lexsort by
            # (doc, value), keep first of each run
            order = np.lexsort((shv, doc_of))
            ds, vs = doc_of[order], shv[order]
            if len(ds):
                keep = np.ones(len(ds), dtype=bool)
                keep[1:] = (ds[1:] != ds[:-1]) | (vs[1:] != vs[:-1])
                ds, vs = ds[keep], vs[keep]
            # docs with < k words contribute the sentinel shingle [0]
            short = np.nonzero(lens < k)[0]
            if len(short):
                ds = np.concatenate([ds, short])
                vs = np.concatenate(
                    [vs, np.zeros(len(short), dtype=np.int64)]
                )
                order = np.argsort(ds, kind="stable")
                ds, vs = ds[order], vs[order]
            counts = np.bincount(ds, minlength=n_docs)
            seg = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(counts[:-1], out=seg[1:])
            # permutation minima: one vectorized pass per hash row,
            # segment-min over per-doc offsets (no per-doc temporaries)
            sig = np.empty((n_docs, num_hashes), dtype=np.int64)
            for h in range(num_hashes):
                sig[:, h] = np.minimum.reduceat((a[h] * vs + b[h]) % M31, seg)
            yield pd.DataFrame(
                {"id": pdf[id_col], "sig": list(sig)}
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema=out_schema)


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at least
    ``threshold`` of their k-word shingles with ANY benchmark document —
    the n-gram-overlap contamination test run before training on scraped
    data.

    Shape: inverted index on shingle hashes, corpus ⋈ benchmark on the
    hash (never a cross join), per (corpus, benchmark) overlap counts,
    then max overlap fraction per corpus doc. Output: doc_id,
    worst_benchmark_id, overlap_frac (fraction of the CORPUS doc's
    shingles found in that benchmark doc, floor-truncated at 4)."""
    c_sh = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingle_hashes(F.col(text_col), k)).alias("sh"),
    )
    # corpus index feeds both the size table and the overlap join —
    # persist once instead of running the shingle fold twice
    c_sh = c_sh.localCheckpoint(eager=False)
    b_sh = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(shingle_hashes(F.col(text_col), k)).alias("sh"),
    )
    sizes = c_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    overlap = (
        c_sh.join(b_sh, "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    frac = F.floor(F.col("n_shared") / F.col("n_sh") * 10000) / 10000.0
    # sizes is one row per corpus document — plain shuffle join (a
    # broadcast here OOMs at corpus scale; AQE broadcasts when small)
    scored = overlap.join(sizes, "doc_id").select(
        "doc_id", "bench_id", frac.alias("overlap_frac")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("overlap_frac"), F.col("bench_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("overlap_frac") >= threshold))
        .select("doc_id", F.col("bench_id").alias("worst_benchmark_id"), "overlap_frac")
    )


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """Persistable LSH index of a corpus snapshot: one (id, band, bucket)
    row per document per band — the structure a production pipeline
    writes as a stage table once per corpus version so each incoming
    batch dedups against it WITHOUT touching corpus text again
    (:func:`incremental_minhash_pairs`). Index size is bands x |corpus|
    rows of three small columns, partitionable by bucket."""
    rows_per_band = num_hashes // bands
    sigd = minhash_signatures_arrow(df, text_col, id_col, num_hashes, k)
    return sigd.select(
        "id",
        F.explode(
            bind(F.col("sig"), lambda sig: _band_structs(sig, bands, rows_per_band))
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def incremental_minhash_pairs(
    new_docs: DataFrame,
    corpus: DataFrame,
    corpus_index: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
    new_index: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs of an incoming batch against an existing corpus
    AND within the batch itself — the production incremental-ingest
    shape: the corpus is never re-paired against itself (its internal
    dups were resolved when it was built), so per-batch cost is
    O(batch bands + collisions), not O(corpus²).

    ``corpus_index`` is the persisted :func:`minhash_index` of the
    corpus; pass None to build it on the fly (first run).
    ``new_index`` is the batch's own :func:`minhash_index` when the
    caller has already built it (an index-maintaining ingest loop
    computes it once and appends it to the persisted index after the
    match — r12: the stream-dedup-incremental entry does exactly
    that); None builds it here. Candidates come from ONE (band,
    bucket) equi-join of the batch index against the corpus∪batch
    index (r12: was two joins + union — same rows, one exchange
    less), then the EXACT-Jaccard verify runs on candidate ids only,
    reading text through semi-joins from whichever side owns each id.

    Output: id_new (batch doc), id_match (corpus or earlier batch doc;
    for intra-batch pairs the larger id is id_new), jaccard."""
    if corpus_index is None:
        corpus_index = minhash_index(corpus, text_col, id_col, num_hashes, bands, k)
    if new_index is None:
        new_index = minhash_index(
            new_docs, text_col, id_col, num_hashes, bands, k
        ).localCheckpoint(eager=False)

    n = new_index.select(
        F.col("id").alias("id_new"), "band", "bucket"
    )
    # corpus matches keep every id; intra-batch matches only smaller
    # ids (the later doc is id_new) — one flagged union feeds ONE join
    c = corpus_index.select(
        F.col("id").alias("id_match"), "band", "bucket",
        F.lit(False).alias("__intra"),
    )
    n2 = new_index.select(
        F.col("id").alias("id_match"), "band", "bucket",
        F.lit(True).alias("__intra"),
    )
    cand = (
        n.join(c.unionByName(n2), ["band", "bucket"])
        .where(~F.col("__intra") | (F.col("id_match") < F.col("id_new")))
        .dropDuplicates(["id_new", "id_match"])
        .select("id_new", "id_match")
    ).localCheckpoint(eager=False)

    # exact verify: shingle sets only for candidate ids, from the side
    # that owns them (semi-joins keep the scans candidate-bounded;
    # left_semi is insensitive to duplicate right-side keys, so the
    # candidate id columns feed it directly — r12: the old per-side
    # .distinct() was a pure extra exchange)
    def side_shingles(src: DataFrame, ids: DataFrame, out_id: str) -> DataFrame:
        return src.join(
            ids, src[id_col] == ids["__cid"], "left_semi"
        ).select(
            F.col(id_col).alias(out_id),
            shingle_hashes(F.col(text_col), k).alias(f"sh_{out_id}"),
        )

    new_ids = cand.select(F.col("id_new").alias("__cid"))
    match_ids = cand.select(F.col("id_match").alias("__cid"))
    sh_new = side_shingles(new_docs, new_ids, "id_new")
    # an id_match can live in the corpus or in the batch (intra pairs);
    # dedupe in case the same id exists in BOTH frames (a re-submitted
    # doc) — two shingle rows would otherwise double every pair it's in
    sh_match = (
        side_shingles(corpus, match_ids, "id_match")
        .unionByName(side_shingles(new_docs, match_ids, "id_match"))
        .dropDuplicates(["id_match"])
    )
    pairs = cand.join(sh_new, "id_new").join(sh_match, "id_match")
    inter = F.size(F.array_intersect(F.col("sh_id_new"), F.col("sh_id_match")))
    union = F.size(F.col("sh_id_new")) + F.size(F.col("sh_id_match")) - inter
    jac = F.floor(inter / union * 10000) / 10000.0
    return pairs.select(
        "id_new", "id_match", jac.alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def incremental_dedup_keep(
    new_docs: DataFrame,
    corpus: DataFrame,
    corpus_index: DataFrame | None = None,
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Batch survivors: new docs with no near-dup in the corpus or in
    earlier (smaller-id) batch docs — what actually gets appended to the
    corpus (plus its index rows) after an incremental ingest."""
    pairs = incremental_minhash_pairs(
        new_docs, corpus, corpus_index, id_col=id_col, **kwargs
    )
    losers = pairs.select(F.col("id_new").alias(id_col)).distinct()
    return new_docs.join(losers, id_col, "left_anti")


def explode_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """One row per line of each document: (id, line_no, line).

    ``posexplode`` keeps the 0-based position so the document can be
    reassembled in original order after line-level filtering. ``delim``
    is treated as a LITERAL string (quoted before hitting Spark's
    regex-based split), matching the literal concat_ws reassembly in
    :func:`line_dedup` — a '.' or '|' delimiter splits on that
    character, not on the regex."""
    if "\\E" in delim:
        raise ValueError("delim must not contain the \\E quote terminator")
    return docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + delim + "\\E")
        ).alias("line_no", "line"),
    )


def line_dedup(
    lines: DataFrame,
    id_col: str = "doc_id",
    mode: str = "drop_common",
    min_docs: int = 2,
    delim: str = "\n",
) -> DataFrame:
    """Corpus-wide line-level deduplication (the C4/Dolma cleanup step:
    kill boilerplate navigation/footer lines that repeat across pages,
    or keep exactly one occurrence of every duplicated line).

    Input is the (id, line_no, line) frame from :func:`explode_lines`.
    Output: (id, text, n_lines, n_kept) with ``text`` reassembled from
    the surviving lines in original order (docs whose every line was
    dropped survive with ``text = ''``).

    Modes:
      - ``drop_common``: drop EVERY occurrence of any line appearing in
        >= ``min_docs`` distinct documents (boilerplate removal).
      - ``keep_first``: for each duplicated line keep only the globally
        first occurrence — min (id, line_no) — and drop the rest
        (C4-style exact line dedup).

    Scale shape: one groupBy(line) aggregation (map-side partial — the
    min-struct winner is computed as an aggregate, NOT a window, so a
    mega-hot boilerplate line never funnels all its occurrences through
    one task), one shuffle join marking each occurrence with a keep
    flag, then ONE groupBy(id) reassembly emitting n_lines/n_kept/text
    together (no totals-vs-kept re-join). Nothing broadcast, nothing
    collected. At 100 TB, group on (xxhash64(line), length(line)) first
    to cut shuffle bytes and join the residual line equality only on
    the hot subset.
    """
    if mode not in ("drop_common", "keep_first"):
        raise ValueError(f"unknown line_dedup mode: {mode!r}")
    lines = lines.select(F.col(id_col).alias("__id"), "line_no", "line")
    # mark each occurrence with a keep flag instead of filtering, so ONE
    # reassembly groupBy produces n_lines, n_kept and the surviving text
    # together (no totals/kept join, no second id-shuffle)
    if mode == "drop_common":
        boiler = (
            lines.groupBy("line")
            .agg(F.count_distinct("__id").alias("nd"))
            .where(F.col("nd") >= min_docs)
            .select("line", F.lit(True).alias("__hot"))
        )
        marked = lines.join(boiler, "line", "left").withColumn(
            "keep", F.col("__hot").isNull()
        )
    else:
        winners = lines.groupBy("line").agg(
            F.min(F.struct("__id", "line_no")).alias("w")
        )
        marked = lines.join(winners, "line").withColumn(
            "keep",
            (F.col("__id") == F.col("w.__id"))
            & (F.col("line_no") == F.col("w.line_no")),
        )
    return marked.groupBy("__id").agg(
        F.count(F.lit(1)).alias("__n_lines"),
        F.count(F.when(F.col("keep"), 1)).alias("__n_kept"),
        F.concat_ws(
            delim,
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("line_no", "line", "keep"))),
                    lambda s: s["keep"],
                ),
                lambda s: s["line"],
            ),
        ).alias("__text"),
    ).select(
        F.col("__id").alias(id_col),
        F.col("__text").alias("text"),
        F.col("__n_lines").alias("n_lines"),
        F.col("__n_kept").alias("n_kept"),
    )


def shingle_hash_positions(text: Column, k: int = 3) -> Column:
    """array<struct<pos,h>> of POSITIONAL k-word shingle hashes (1-based
    pos, NO distinct) — the index for span-level duplicate detection,
    same portable word-fold + combine as :func:`shingle_hashes`."""
    if k != 3:
        raise ValueError("shingle_hash_positions is specialized for k=3")
    ws = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    wh_expr = F.transform(ws, _word_hash)

    def combine(wh: Column) -> Column:
        return F.transform(
            _seq1(F.size(wh) - 2),
            lambda i: F.struct(
                i.alias("pos"), _shingle_combine(wh, i).alias("h")
            ),
        )

    return bind(wh_expr, combine)


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_span_tokens: int = 6,
    k: int = 3,
    max_doc_freq: int | None = None,
    max_pos_freq: int | None = 32,
) -> DataFrame:
    """Maximal duplicated token SPANS between document pairs — the
    substring-level exact-dedup primitive (the signal behind
    suffix-array corpus dedup): a run of r consecutive matching
    k-shingles is a shared span of r + k - 1 tokens.

    Pipeline: positional shingle-hash index → equi-self-join on the
    hash (inverted index, never doc pairs) → gaps-and-islands over
    each pair's match DIAGONAL (pos_a - pos_b constant within a shared
    span; island id = pos_a - row_number, the classic trick) → count
    per island = run length. Output per pair: n_spans,
    max_span_tokens, dup_tokens (sum over spans), span starts of the
    longest span.

    ``dup_tokens_a`` is the UNION length of span intervals projected
    onto the lower-id doc (overlapping spans on different diagonals —
    periodic text — are merged, so the value never exceeds the doc's
    token count and is safe as a fraction-duplicated numerator);
    ``n_spans``/``max_span_tokens`` count the raw diagonal runs.

    Scale: candidate volume is bounded by shared-shingle matches (like
    ngram_jaccard_pairs), not doc pairs. TWO hot-key caps:
    ``max_doc_freq`` drops shingles present in more than that many
    DOCS (stopword boilerplate), and ``max_pos_freq`` (default 32)
    drops a doc's shingle when it repeats more than that many times
    WITHIN the doc — the m*n per-pair match blowup on internally
    periodic text that a doc-frequency cap cannot see. The islands
    window partitions by (pair, diagonal) — many small groups, no hot
    task.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hash_positions(F.col(text_col), k)).alias("s"),
    ).select("id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    # r12 (guide §5 — cache only when reused): the positional shingle
    # table feeds the hot-key aggregations AND both self-join sides, so
    # the explode re-derived from parquet up to 4x (8 scans in the
    # sf0.1 plan). One lazy localCheckpoint materializes it once — the
    # containment_pairs precedent.
    sh = sh.localCheckpoint(eager=False)
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("h")
            .agg(F.count_distinct("id").alias("nd"))
            .where(F.col("nd") > max_doc_freq)
            .select("h")
        )
        sh = sh.join(hot, "h", "left_anti")
    if max_pos_freq is not None:
        hot_pos = (
            sh.groupBy("id", "h")
            .agg(F.count(F.lit(1)).alias("np"))
            .where(F.col("np") > max_pos_freq)
            .select("id", "h")
        )
        sh = sh.join(hot_pos, ["id", "h"], "left_anti")
    a = sh.select(F.col("id").alias("id_a"), F.col("pos").alias("pa"), "h")
    b = sh.select(F.col("id").alias("id_b"), F.col("pos").alias("pb"), "h")
    m = a.join(b, "h").where(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag")
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    runs = (
        m.withColumn("grp", F.col("pa") - F.row_number().over(w))
        .groupBy("id_a", "id_b", "diag", "grp")
        .agg(
            (F.count(F.lit(1)) + (k - 1)).alias("span_tokens"),
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
        )
        .where(F.col("span_tokens") >= min_span_tokens)
    )
    # union length on doc A: merge overlapping [start_a, start_a+span)
    # intervals (periodic text puts overlapping spans on many
    # diagonals) via the running-max formula — with rows sorted by
    # start, each interval's NET contribution to the union is
    # max(0, end - max(prev_max_end, start)), so ONE pair-keyed window
    # + ONE groupBy produce the union sum AND the per-pair span stats
    # together. The round-6 form materialized explicit islands (second
    # window column + two groupBys) and re-aggregated `runs` separately
    # for the stats, then joined — recomputing the whole shingle join
    # upstream twice unless ReuseExchange saved it (round-7 profiling:
    # fusing removes a shuffle join and the double evaluation,
    # ~2.9 s -> ~2.1 s at sf0.1).
    wa = Window.partitionBy("id_a", "id_b").orderBy("start_a", "span_tokens")
    end = F.col("start_a") + F.col("span_tokens")
    with_prev = runs.withColumn(
        "prev_max_end",
        F.max(end).over(wa.rowsBetween(Window.unboundedPreceding, -1)),
    )
    contrib = F.greatest(
        F.lit(0).cast("long"),
        end
        - F.greatest(
            F.coalesce(F.col("prev_max_end"), F.col("start_a")),
            F.col("start_a"),
        ),
    )
    return with_prev.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("span_tokens").alias("max_span_tokens"),
        F.sum(contrib).alias("dup_tokens_a"),
        F.max(
            F.struct("span_tokens", F.col("start_a"), F.col("start_b"))
        )["start_a"].alias("longest_start_a"),
    ).select(
        "id_a", "id_b", "n_spans", "max_span_tokens", "dup_tokens_a",
        "longest_start_a",
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric shingle CONTAINMENT — |A∩B| / |A| — the near-dup
    signal Jaccard misses: a short document pasted inside a long one
    scores near 1 on containment but near 0 on Jaccard (the
    boilerplate / quotation / partial-crawl duplication class; cf.
    Broder's resemblance-vs-containment distinction). Same inverted
    shingle index as ngram_jaccard_pairs (explode distinct hashes,
    equi-self-join on hash, per-pair intersection counts); each
    unordered pair emits BOTH directions' scores and survives when
    either reaches ``threshold``. ``max_doc_freq`` prunes stop-shingle
    quadratic blowup exactly as in the Jaccard form (scores become
    lower bounds)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes(F.col(text_col), k)).alias("sh"),
    )
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_doc_freq)
            .select("sh")
        )
        sh = sh.join(rare, "sh", "left_semi")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    c_ab = F.floor(F.col("n_inter") / F.col("n_a") * 10000) / 10000.0
    c_ba = F.floor(F.col("n_inter") / F.col("n_b") * 10000) / 10000.0
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a", "id_b",
            c_ab.alias("c_a_in_b"),
            c_ba.alias("c_b_in_a"),
        )
        .where(
            (F.col("c_a_in_b") >= threshold) | (F.col("c_b_in_a") >= threshold)
        )
    )


def jaccard_prefix_filter_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via PREFIX FILTERING (the
    AllPairs/PPJoin candidate rule) — same output as
    :func:`ngram_jaccard_pairs` with ``max_doc_freq=None``
    (equality property-tested), but the quadratic self-join runs only
    over each document's PREFIX: order every document's shingles by
    ascending global document frequency (tie-break hash value) and
    keep the first ``n - ceil(t*n) + 1``; two documents with Jaccard
    >= t MUST share a prefix shingle (pigeonhole on the required
    overlap), so the full inverted index never self-joins. Hot
    stop-word shingles land at the END of every prefix ordering and
    effectively vanish from candidate generation — the quadratic
    blowup ``max_doc_freq`` bounds LOSSILY is avoided here EXACTLY.

    The size filter ``min >= t * max`` prunes candidates further
    (J >= t forces it), and verification touches only candidate
    pairs: fan out each pair over A's shingles, inner-join on
    (id_b, sh), count — cost linear in candidates, not in df^2 of
    the hot token. Threshold arithmetic is integer (t quantized DOWN
    to 1e-4, so prefixes only lengthen — no float-ceil false
    negatives). Reported ``jaccard`` is floor-truncated at 4 decimals,
    matching ngram_jaccard_pairs and the SQL oracle.

    WHEN TO USE (measured, SCALE.md "Prefix-filter Jaccard"): choose
    this form for heavy-tailed token frequencies with a selective
    threshold — shared stop-phrases/boilerplate inside otherwise
    distinct docs, where the inverted index's candidates grow as n^2
    (27x slower at 8k docs and diverging). Choose ngram_jaccard_pairs
    when token df is bounded (its simpler plan wins ~5x on such
    corpora), and minhash_lsh_pairs when the corpus is near-dup-DENSE
    (pairs genuinely near the threshold are unprunable by any
    admissible filter, including this one)."""
    t_num = int(threshold * 10000)  # floor: t' <= t keeps the rule safe
    # set size = array length BEFORE exploding (shingle_hashes is
    # already distinct), and carry it on every token row — no sizes
    # groupBy over the token table, no size joins at the end
    sh = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(F.col(text_col), k).alias("__arr"),
    ).select(
        "id",
        F.size("__arr").alias("n_sh"),
        F.explode("__arr").alias("sh"),
    )
    sh = sh.localCheckpoint(eager=False)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
    # ceil(t*n) in exact integers: (n*t_num + 9999) div 10000
    plen = (
        F.col("n_sh")
        - F.expr(f"(n_sh * {t_num} + 9999) div 10000")
        + F.lit(1)
    )
    rank = F.row_number().over(
        Window.partitionBy("id").orderBy("__df", "sh")
    )
    pref = (
        sh.join(dfreq, "sh")
        .withColumn("__r", rank)
        .where(F.col("__r") <= plen)
        .select("id", "sh", "n_sh")
    )
    # r12 (guide §5): both candidate self-join sides re-derived the
    # dfreq join + per-doc rank window; one lazy checkpoint (prefix
    # tokens only — bounded well below the token table) computes it once
    pref = pref.localCheckpoint(eager=False)
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.id") < F.col("b.id"))
            # size filter: J >= t forces min(|A|,|B|) >= t * max
            & (
                F.least(F.col("a.n_sh"), F.col("b.n_sh")) * 10000
                >= F.greatest(F.col("a.n_sh"), F.col("b.n_sh")) * t_num
            ),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .distinct()  # (n_a, n_b) are functionally dependent on the pair
    )
    inter = (
        cand.join(
            sh.select(F.col("id").alias("id_a"), "sh"), "id_a"
        )
        .join(sh.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return inter.select(
        "id_a", "id_b",
        (F.floor(jac * 10000) / 10000.0).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def exact_substring_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 20,
    hash_prefilter: bool = True,
    route: str | None = None,
    high_dup_ratio: float = 0.5,
    broadcast_max_grams: int = 4_000_000,
) -> DataFrame:
    """Corpus-level EXACT duplicated-substring spans — the Lee et al.
    2022 ExactSubstr dedup signal ("Deduplicating Training Data Makes
    Language Models Better"): mark, per document, every maximal
    character range covered by a substring of length >= ``min_len``
    that occurs at least twice in the corpus (any second occurrence
    counts, including a repeat within the SAME document — the paper's
    semantics). The reference method builds one giant suffix array;
    the Spark-native equivalent is sorted k-mer anchoring: a length-L
    substring is duplicated iff its length-L anchor gram occurs >= 2
    times, so grouping the (gram -> count) relation finds exactly the
    duplicated anchors, and merging overlapping anchors
    (gaps-and-islands per doc: break when pos - prev > L) yields the
    maximal spans a removal pass would cut.

    Output: ``id_col, span_start, span_end, span_len, n_anchors`` —
    1-based inclusive character positions, one row per maximal span.

    Scale: the only heavy step is the anchor-frequency count — a
    map-side-combinable groupBy. With ``hash_prefilter`` (default) the
    wide shuffle carries an 8-byte ``xxhash64`` of each gram instead
    of L characters (the sorted-k-mer trick at 100 TB: ~L x smaller
    shuffle); survivors of the hash-count >= 2 filter (true duplicates
    + rare collisions) are then re-grouped on the EXACT gram, so the
    result stays exact — a collision can only ADD candidates to the
    small second pass, never drop one, because equal grams always
    share a hash. No doc-pair join anywhere, so boilerplate shared by
    a million documents costs one hot COUNT (combinable), not 10^12
    pairs. The islands window partitions per doc.

    ``route``: None (default) auto-picks via a deterministic 1/64
    gram-hash sample — when >= ``high_dup_ratio`` of gram occurrences
    are duplicated AND the estimated distinct-gram count fits
    ``broadcast_max_grams``, the pathological-corpus 'broadcast' path
    runs (exact dup-gram set broadcast, corpus never shuffles
    strings); otherwise the committed 'wide' path (hash-prefiltered
    8-byte shuffle). Both routes emit IDENTICAL rows — routing is a
    plan decision, invisible to the oracle.
    """
    if min_len < 2:
        raise ValueError(f"exact_substring_spans: min_len {min_len} < 2")
    if route not in (None, "wide", "broadcast"):
        raise ValueError(
            f"exact_substring_spans: unknown route {route!r} "
            "(expected None, 'wide' or 'broadcast')"
        )
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    g = (
        base.where(F.length("t") >= min_len)
        .select(
            "id",
            F.explode(
                F.sequence(F.lit(1), F.length("t") - (min_len - 1))
            ).alias("pos"),
            "t",
        )
        .select(
            "id", "pos",
            F.expr(f"substring(t, pos, {min_len})").alias("gram"),
        )
    )
    if route is None and hash_prefilter:
        route = route_by_input_size(df)
    if route is None and hash_prefilter:
        # HIGH-DUPLICATION AUTO-ROUTE (r10, closing the flagged r9
        # above-linear decade): on an adversarially repetitive corpus
        # (the measured sf10 fixture: 301M grams, 1.8M distinct,
        # 99.999% of occurrences duplicated) the xxhash64 prefilter
        # eliminates nothing and the wide shuffle carries 20-char
        # strings through group + semi-join. But that same corpus
        # shape means the DISTINCT duplicated-gram set is tiny, so the
        # marking semi-join can BROADCAST the exact dup-gram set and
        # the corpus never shuffles strings at all. The route decision
        # rides a deterministic 1/64 gram-hash sample (one extra
        # map-side pass + a tiny grouped count; sampling by hash keeps
        # ALL occurrences of sampled grams, so the occurrence
        # dup-ratio is unbiased) — and is PLAN-ONLY: both routes emit
        # identical rows (the op is exact either way), so the oracle
        # and the output hash are route-invariant.
        # 1/64 gram-HASH sample: hash strata partition the gram space
        # uniformly, so the distinct-gram estimate nh*64 is exact in
        # expectation AND the occurrence dup-ratio is unbiased (all
        # occurrences of a sampled gram are kept). A 1/16 DOC
        # pre-sample was tried and REVERTED: doc strata do not
        # partition distinct grams, so scaling nh by the doc stride
        # overestimated distinct 13x (23.9M vs the true 1.8M at the
        # adversarial sf10) and mis-routed the exact corpus this gate
        # exists for. The probe's one corpus explode only runs above
        # the size gate, where it is a rounding error of the total.
        hs = F.xxhash64("gram")
        st = (
            g.where(((hs % 64) + 64) % 64 == 0)
            .groupBy(hs.alias("hh"))
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum("c").alias("occ"),
                F.sum(F.when(F.col("c") >= 2, F.col("c"))).alias("docc"),
                F.count(F.lit(1)).alias("nh"),
            )
            .collect()[0]
        )
        occ = st["occ"] or 0
        docc = st["docc"] or 0
        est_distinct = (st["nh"] or 0) * 64
        route = (
            "broadcast"
            if occ > 0
            and docc / occ >= high_dup_ratio
            and est_distinct <= broadcast_max_grams
            else "wide"
        )
    if route == "broadcast":
        # few distinct grams: the exact (gram, count) aggregation is
        # map-side-combine-collapsed to the distinct-gram set (tiny by
        # the route condition), and the dup set broadcasts — the
        # corpus-sized relation is never shuffled for marking
        dup = (
            g.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
            .select("gram")
        )
        # ADVICE r10: the route decision rode a 1/64-sample ESTIMATE;
        # bound the ACTUAL dup set before forcing a broadcast (a
        # dup-ratio-1.0 corpus can have dup set == distinct set).
        # Above the cap, fall back to a plain shuffle semi-join on the
        # already-computed exact dup set — same rows, no forced
        # hundreds-of-MB broadcast.
        # ADVICE r11: materialize before counting so the semi-join
        # reuses the dup set instead of recomputing the aggregation
        dup = dup.localCheckpoint(eager=True)
        n_dup = dup.count()
        if n_dup <= broadcast_max_grams:
            dup = F.broadcast(dup)
        marked = g.join(dup, "gram", "left_semi").select("id", "pos")
    else:
        if hash_prefilter:
            gh = g.select(
                "id", "pos", F.xxhash64("gram").alias("hh"), "gram"
            )
            dup_h = (
                gh.groupBy("hh")
                .agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("c") >= 2)
                .select("hh")
            )
            # r12 (guide §5): the hash-semi survivor set — bounded by
            # the true-dup volume + rare collisions, NOT corpus-sized —
            # feeds both the exact regroup and the marking join; each
            # consumer otherwise re-derives the full gram explode from
            # parquet (two extra corpus passes in the sf0.1 plan).
            g = gh.join(dup_h, "hh", "left_semi").drop("hh").localCheckpoint(
                eager=False
            )
        dup = (
            g.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
            .select("gram")
        )
        marked = g.join(dup, "gram", "left_semi").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    isl = marked.withColumn(
        "brk",
        F.when(
            F.col("pos") - F.lag("pos").over(w) > min_len, 1
        ).otherwise(0)
        + F.when(F.lag("pos").over(w).isNull(), 1).otherwise(0),
    ).withColumn("grp", F.sum("brk").over(w))
    return (
        isl.groupBy("id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (min_len - 1)).alias("span_end"),
            (F.max("pos") + (min_len - 1) - F.min("pos") + 1)
            .alias("span_len"),
            F.count(F.lit(1)).alias("n_anchors"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start", "span_end", "span_len", "n_anchors",
        )
    )


_CDC_POW31 = [1, 31, 961, 29791, 923521, 28629151, 887503681, 1742810347]


def route_by_input_size(df: DataFrame) -> str | None:
    """exact_substring_spans probe gate: below ~4 MB of COMPRESSED
    input the committed wide path is always fine (the broadcast route
    exists for CORPUS-SCALE pathological repetition) and the probe's
    extra Spark job is pure overhead at bench SFs — decide from
    driver-side file metadata (the widen() precedent), zero jobs. The
    threshold is deliberately LOW: repetitive text compresses brutally
    (the adversarial sf10 fixture's 301M grams are 70 MB of parquet),
    so compressed bytes underestimate the working set — err toward
    probing. Returns "wide" for small inputs, None (= run the probe)
    otherwise. Non-file frames (in-memory tests, post-widen() frames —
    widen cuts file lineage, so callers that widen should gate on the
    ORIGINAL frame) also return None."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001
        files = []
    if not files:
        return None
    import os
    from urllib.parse import urlparse

    total = 0
    for f in files:
        path = urlparse(f).path or f
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    return "wide" if total < 4 * 1024 * 1024 else None


def cdc_chunk_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask: int = 64,
) -> DataFrame:
    """Content-defined chunking (CDC) dedup — the rsync/LBFS/casync
    family: chunk boundaries are placed where a rolling hash of the
    LAST ``window`` characters satisfies ``h % mask == 0``, so
    boundaries depend only on LOCAL content. A one-character insertion
    re-chunks ONE chunk and every other chunk hash survives — the
    shift-robustness that fixed-width windows (text-line-dedup's
    lines, fixed 64-char blocks) fundamentally lack; the complementary
    exact tool to dedup-exact-substr's span marking (spans localize
    duplicated text, CDC buckets storage/transfer-unit duplicates).

    Everything is higher-order expressions over the char-code array
    (position hashes, boundary filter, chunk slicing, per-chunk
    31-fold hashes) — per-row compute, no UDF, no explode until the
    corpus-wide duplicate count. The only shuffle is the
    (chunk_hash -> count) aggregation plus one semi-join-shaped count
    attach, both on 8-byte keys. Expected chunk length is ``mask``
    chars (production pins min/max chunk clamps; the pure mask rule
    keeps the operator declaratively replayable and the CDC property
    intact).

    Output per document: n_chunks, n_dup_chunks (chunks whose hash
    occurs >= 2 times corpus-wide — including within one doc),
    dup_chars, total_chars."""
    chunks = cdc_chunks(df, text_col, id_col, window, mask)
    counts = chunks.groupBy("chash").agg(F.count(F.lit(1)).alias("cc"))
    return (
        chunks.join(counts, "chash")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("cc") >= 2).cast("long")).alias("n_dup_chunks"),
            F.sum(F.when(F.col("cc") >= 2, F.col("clen")).otherwise(0))
            .cast("long").alias("dup_chars"),
            F.sum("clen").cast("long").alias("total_chars"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask: int = 64,
    arrow: bool = True,
) -> DataFrame:
    """The CDC chunk relation shared by :func:`cdc_chunk_stats` and
    :func:`cdc_incremental_stats`: one row per (doc, chunk) with the
    chunk's 31-fold hash — (id, ci, clen, chash). Boundary rule and
    scale shape documented on cdc_chunk_stats.

    r12 (guide §4.2 — hand whole batches to vectorized native code):
    the default path is :func:`cdc_chunks_arrow` — the per-position
    8-term rolling hash and the per-chunk 31-fold hash are HOF lambda
    expressions that Spark evaluates INTERPRETED per element (HOF
    lambdas get no whole-stage codegen), ~8 interpreted mod-mults per
    character; the Arrow path computes the same exact int64 values in
    a handful of flat numpy passes per batch. BIT-IDENTICAL by
    construction (same codepoints, same mod-M31 arithmetic — the
    iterated per-step mod and the power-sum form are congruent and
    both reduced to [0, M31)); equivalence is pytest-pinned over
    fixture docs, unicode, boundary lengths, and repeats
    (tests/test_cdc.py::test_cdc_chunks_arrow_matches_hof).
    ``arrow=False`` keeps the pure-expression form."""
    if window != 8:
        raise ValueError("cdc_chunks: window is pinned at 8 "
                         "(the _CDC_POW31 table)")
    if arrow:
        return cdc_chunks_arrow(df, text_col, id_col, window, mask)
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("t")
    ).where(F.length("t") >= 1)
    codes = F.transform(
        F.filter(F.split(F.col("t"), ""), lambda c: c != ""),
        lambda c: F.ascii(c).cast("long"),
    )
    b = base.select("id", "t", codes.alias("cs"), F.length("t").alias("n"))
    pw = [F.lit(p).cast("long") for p in _CDC_POW31]

    def whash(i):
        # rolling hash of chars (i-window+1 .. i), 1-based positions
        s = F.lit(0).cast("long")
        for j in range(8):
            s = (s + F.element_at(F.col("cs"), i - j) * pw[j]) % M31
        return s

    bounds = F.filter(
        F.transform(
            F.sequence(F.lit(8), F.greatest(F.col("n"), F.lit(8))),
            lambda i: F.struct(i.alias("i"), whash(i).alias("h")),
        ),
        lambda s: (s["h"] % mask == 0) & (s["i"] < F.col("n")),
    )
    ends = F.concat(
        F.transform(bounds, lambda s: s["i"]),
        F.array(F.col("n").cast("int")),
    )
    c = b.where(F.col("n") >= 8).select(
        "id", "t", "n", ends.alias("ends")
    ).unionByName(
        # short docs: one whole-doc chunk (no valid window position)
        b.where(F.col("n") < 8).select(
            "id", "t", "n",
            F.array(F.col("n").cast("int")).alias("ends"),
        )
    )
    chunks = c.select(
        "id", "t",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ends")),
                lambda k: F.struct(
                    k.alias("ci"),
                    F.when(k == 1, F.lit(1))
                    .otherwise(F.element_at(F.col("ends"), k - 1) + 1)
                    .alias("start"),
                    F.element_at(F.col("ends"), k).alias("end"),
                ),
            )
        ).alias("ck"),
    ).select(
        "id",
        F.col("ck.ci").alias("ci"),
        (F.col("ck.end") - F.col("ck.start") + 1).cast("long").alias("clen"),
        F.aggregate(
            F.transform(
                F.filter(
                    F.split(
                        F.expr(
                            "substring(t, ck.start, ck.end - ck.start + 1)"
                        ),
                        "",
                    ),
                    lambda ch: ch != "",
                ),
                F.ascii,
            ),
            F.lit(7).cast("long"),
            lambda a, ch: (a * 31 + ch) % M31,
        ).alias("chash"),
    )
    return chunks


def cdc_chunks_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask: int = 64,
) -> DataFrame:
    """Vectorized CDC chunker (guide §4.2) — the numpy twin of the
    HOF path in :func:`cdc_chunks`, bit-identical output (see there).
    One mapInPandas; per Arrow batch everything is flat numpy over the
    concatenated codepoint array: the 8-term rolling window hash is 8
    shifted multiply-adds (int64 headroom: codepoint < 2^21 times
    31^7 < 2^35 summed 8x < 2^59), boundaries are a mask compare,
    chunk ends/starts are segment bookkeeping, and the per-chunk
    31-fold hash rides the power-sum form
    (7*31^L + sum c_k*31^(L-1-k)) mod M31 — congruent to the
    per-step-mod fold and reduced to the same canonical value; the
    summand products are reduced mod M31 (< 2^31) before a
    ``np.add.reduceat`` per chunk, so sums stay exact below 2^63 for
    any chunk shorter than 2^32 chars. Codepoints via UTF-32 decode ==
    Spark's split('')/ascii() codepoint semantics (and DuckDB's twin)."""
    if window != 8:
        raise ValueError("cdc_chunks_arrow: window is pinned at 8 "
                         "(the _CDC_POW31 table)")
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("id", id_type),
            StructField("ci", IntegerType()),
            StructField("clen", LongType()),
            StructField("chash", LongType()),
        ]
    )
    pw = np.array(_CDC_POW31, dtype=np.int64)  # 31^j mod M31, j = 0..7
    m31 = np.int64(M31)

    def batches(it):
        empty = pd.DataFrame(
            {"id": [], "ci": [], "clen": [], "chash": []}
        )
        for pdf in it:
            texts_all = pdf[text_col].tolist()
            ids_all = pdf[id_col]
            keep = [
                i for i, s in enumerate(texts_all)
                if s is not None and len(s) >= 1
            ]
            if not keep:
                yield empty
                continue
            texts = [texts_all[i] for i in keep]
            n_docs = len(texts)
            lens = np.fromiter(
                (len(s) for s in texts), dtype=np.int64, count=n_docs
            )
            off = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(lens, out=off[1:])
            codes = np.frombuffer(
                "".join(texts).encode("utf-32-le"), dtype="<u4"
            ).astype(np.int64)
            total = off[-1]
            # rolling window hash at every global position g >= 7:
            # h[g] = sum_j codes[g-j] * 31^j mod M31 (g 0-based; the
            # HOF's 1-based i = local0 + 1)
            if total >= 8:
                h = np.zeros(total - 7, dtype=np.int64)
                for j in range(8):
                    h += codes[7 - j : total - j] * pw[j]
                h %= m31
                g = np.arange(7, total, dtype=np.int64)
                doc_of = np.searchsorted(off, g, side="right") - 1
                local0 = g - off[doc_of]
                # boundary: window fully inside the doc (local0 >= 7),
                # hash % mask == 0, and i < n (no boundary at doc end)
                is_b = (
                    (local0 >= 7)
                    & (h % mask == 0)
                    & (local0 + 1 < lens[doc_of])
                )
                bg = g[is_b]
                bdoc = doc_of[is_b]
            else:
                bg = np.zeros(0, dtype=np.int64)
                bdoc = np.zeros(0, dtype=np.int64)
            nb = np.bincount(bdoc, minlength=n_docs)
            n_chunks = nb + 1
            out_start = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(n_chunks, out=out_start[1:])
            total_chunks = int(out_start[-1])
            # per-doc chunk END positions (local, 1-based): the sorted
            # boundary i's followed by the trailing n
            ends = np.empty(total_chunks, dtype=np.int64)
            if len(bg):
                within = np.arange(len(bg), dtype=np.int64) - np.repeat(
                    np.cumsum(nb) - nb, nb
                )
                ends[out_start[bdoc] + within] = bg - off[bdoc] + 1
            ends[out_start[1:] - 1] = lens
            doc_of_c = np.repeat(
                np.arange(n_docs, dtype=np.int64), n_chunks
            )
            ci = (
                np.arange(total_chunks, dtype=np.int64)
                - out_start[doc_of_c]
                + 1
            )
            starts = np.empty(total_chunks, dtype=np.int64)
            starts[1:] = ends[:-1] + 1
            starts[out_start[:-1]] = 1
            clen = ends - starts + 1
            # 31-fold chunk hash in power-sum form; per-element
            # exponent = (global chunk end - 1) - g
            p31 = np.empty(int(lens.max()) + 1, dtype=np.int64)
            p31[0] = 1
            for e in range(1, len(p31)):
                p31[e] = (p31[e - 1] * 31) % M31
            g_end = off[doc_of_c] + ends  # one past the last element
            exp = np.repeat(g_end, clen) - 1 - np.arange(
                total, dtype=np.int64
            )
            prod = (codes * p31[exp]) % m31
            gstart = off[doc_of_c] + starts - 1
            chash = (
                np.add.reduceat(prod, gstart) + 7 * p31[clen]
            ) % m31
            yield pd.DataFrame(
                {
                    "id": ids_all.iloc[keep].to_numpy()[doc_of_c],
                    "ci": ci.astype(np.int32),
                    "clen": clen,
                    "chash": chash,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, schema=out_schema
    )


def cdc_incremental_stats(
    batch_df: DataFrame,
    index_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask: int = 64,
    chunks: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL CDC dedup — match a NEW batch's chunks against the
    PERSISTED chunk-hash index of everything already accepted (the
    stream-dedup-incremental shape at chunk granularity, VERDICT r10
    #4): chunk the batch (same boundary rule as cdc_chunk_stats), mark
    each chunk KNOWN iff its hash is in ``index_df`` (column
    ``chash``; within-batch repeats do NOT count — only the persisted
    index), and aggregate per doc. A doc whose known chars reach half
    its total is REJECTED — the storage-dedup admission rule.

    Scale: the batch-sized chunk explode + one join against the
    index on an 8-byte key (AQE broadcasts a small index; a corpus-
    scale index makes this the standard shuffle equi-join) + one
    per-doc agg. The caller owns index persistence (append the
    accepted batch's distinct hashes — see the dedup-cdc-incremental
    entry and the streaming test).

    Output: (id_col, n_chunks, n_known_chunks, known_chars,
    total_chars, rejected int 0/1) — rejected iff
    2*known_chars >= total_chars (cross-multiplied, no float).

    Pass ``chunks`` (a cdc_chunks relation for the same batch) to
    share one chunk explode between the stats and the caller's index
    append — the chunk HOF is the per-batch hot path, computing it
    twice doubles the batch cost."""
    ch = (
        chunks
        if chunks is not None
        else cdc_chunks(batch_df, text_col, id_col, window, mask)
    )
    idx = index_df.select("chash").distinct().withColumn(
        "__known", F.lit(1)
    )
    j = ch.join(idx, "chash", "left")
    per_doc = j.groupBy(F.col("id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("__known").isNotNull().cast("long"))
        .alias("n_known_chunks"),
        F.sum(F.when(F.col("__known").isNotNull(), F.col("clen"))
              .otherwise(0)).cast("long").alias("known_chars"),
        F.sum("clen").cast("long").alias("total_chars"),
    )
    return per_doc.withColumn(
        "rejected",
        (2 * F.col("known_chars") >= F.col("total_chars")).cast("int"),
    )
