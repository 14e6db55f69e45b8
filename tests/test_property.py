"""Property-based tests (hypothesis): the custom operators against
brute-force Python models on randomized inputs — coverage the reference
never had (SURVEY.md §5: 'No property-based/randomized tests')."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

# ---------------------------------------------------------- interval join

intervals_strategy = st.lists(
    st.tuples(st.integers(0, 300), st.integers(0, 60)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=1,
    max_size=12,
)
points_strategy = st.lists(st.integers(0, 360), min_size=1, max_size=15)


@settings(max_examples=12, deadline=None)
@given(points=points_strategy, intervals=intervals_strategy, width=st.sampled_from([7, 64, 1000]))
def test_interval_join_matches_model(spark, points, intervals, width):
    from genpipe_spark.operators.interval import interval_join

    pdf = spark.createDataFrame([Row(idx=i, p=p) for i, p in enumerate(points)])
    idf = spark.createDataFrame(
        [Row(iv=i, lo=lo, hi=hi) for i, (lo, hi) in enumerate(intervals)]
    )
    got = {
        (r["idx"], r["iv"])
        for r in interval_join(pdf, idf, "p", "lo", "hi", band_width=width).collect()
    }
    expected = {
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, hi) in enumerate(intervals)
        if lo <= p <= hi
    }
    assert got == expected


# --------------------------------------------------------- alt-decompose

def _model_alt_decompose(ref: str, alt: str, gt: str):
    """Python model of altMultiallelic (steps/Parser.scala:252-270), with
    our haploid guard (x behaves as x/x)."""
    alt_list = alt.split(",")
    multi = len(alt_list) > 2
    if alt == "<NON_REF>":
        return [(alt, "0/0", "0", False)]
    if gt in ("0/0", "0"):
        return [(ref, "0/0", "0", False)]
    g = gt.split("/")
    g0 = g[0]
    g1 = g[1] if len(g) > 1 else g0
    if g0 == "0":
        return [(alt_list[int(g1) - 1], "0/1", g1, multi)]
    if g0 == g1:
        return [(alt_list[int(g1) - 1], "1/1", g1, multi)]
    return [
        (alt_list[int(g0) - 1], "0/1", g0, True),
        (alt_list[int(g1) - 1], "0/1", g1, multi),
    ]


alleles = st.sampled_from(["G", "C", "T", "GA"])


@st.composite
def site(draw):
    n_alt = draw(st.integers(1, 3))
    alts = [draw(alleles) for _ in range(n_alt)] + ["<NON_REF>"]
    # gt indices must reference existing alts
    i = draw(st.integers(0, n_alt))
    j = draw(st.integers(0, n_alt))
    if i != 0 and j == 0:
        i, j = j, i  # reference path only handles x(0)=='0' or x0==x1 or het-alt
    gt = f"{i}/{j}" if draw(st.booleans()) else (str(j) if i == j else f"{i}/{j}")
    non_ref = draw(st.booleans()) and i == 0 and j == 0
    return ("A", "<NON_REF>" if non_ref else ",".join(alts), gt)


@settings(max_examples=20, deadline=None)
@given(sites=st.lists(site(), min_size=1, max_size=8))
def test_alt_decompose_matches_model(spark, sites):
    from pyspark.sql import functions as F

    from genpipe_spark.functions.variant import alt_decompose

    df = spark.createDataFrame(
        [Row(i=i, ref=r, alt=a, gt=g) for i, (r, a, g) in enumerate(sites)]
    )
    out = df.select(
        "i", alt_decompose(F.col("ref"), F.col("alt"), F.col("gt")).alias("d")
    ).collect()
    for row in out:
        r, a, g = sites[row["i"]]
        got = [
            (e["alt_allele"], e["gt"], e["gt_index"], e["multiallelic"])
            for e in row["d"]
        ]
        assert got == _model_alt_decompose(r, a, g), (r, a, g)


# ------------------------------------------------------------- fingerprint

@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="abc XYZ.,", min_size=0, max_size=40), min_size=1, max_size=5
    )
)
def test_fingerprint_matches_model(spark, texts):
    from genpipe_spark.operators.text import fingerprint

    M = 2147483647

    def model(text: str) -> int:
        acc = 0
        for w in text.split():
            h = 7
            for ch in w:
                h = (h * 31 + ord(ch)) % M
            acc = (acc * 1000003 + h) % M
        return acc

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    out = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    for i, t in enumerate(texts):
        assert out[i] == model(t), repr(t)


# ---------------------------------------------------------- parse layer

@settings(max_examples=15, deadline=None)
@given(
    entries=st.lists(
        st.tuples(
            st.sampled_from(["AA", "BB", "dbNSFP_SIFT_pred", "END", "X"]),
            st.lists(
                st.sampled_from(["0.5", ".", "", "D", "T", "12"]),
                min_size=1,
                max_size=3,
            ),
        ),
        min_size=0,
        max_size=5,
    ),
    probe=st.sampled_from(["AA", "BB", "dbNSFP_SIFT_pred", "MISSING"]),
)
def test_getter_matches_model(spark, entries, probe):
    from pyspark.sql import functions as F

    from genpipe_spark.functions.parse import getter

    info = ";".join(f"{k}={','.join(vs)}" for k, vs in entries)

    def model(info_s: str, key: str) -> list[str]:
        parts = info_s.split(key + "=")
        if len(parts) == 1:
            return [""]
        return parts[1].split(";")[0].split(",")

    df = spark.createDataFrame([Row(info=info)])
    got = df.select(getter(F.col("info"), probe).alias("out")).first()["out"]
    assert got == model(info, probe), (info, probe)


@settings(max_examples=15, deadline=None)
@given(ad=st.lists(st.integers(0, 99), min_size=2, max_size=4), alt=st.integers(1, 3))
def test_ad_ratio_matches_model(spark, ad, alt):
    import math

    from pyspark.sql import functions as F

    from genpipe_spark.functions.parse import ad_ratio

    alt = min(alt, len(ad) - 1)
    ad_s = ",".join(map(str, ad))
    gt = f"0/{alt}"
    df = spark.createDataFrame([Row(ad=ad_s, gt=gt)])
    got = df.select(ad_ratio(F.col("ad"), F.col("gt")).alias("out")).first()["out"]
    total = sum(ad)
    if total == 0:
        assert got is None  # all-zero depth → null (no ANSI error)
        return
    expected = str(math.floor(ad[alt] / total * 1000) / 1000)
    assert got == expected, (ad_s, gt)


# ------------------------------------------------------- mixing / packing

docs_strategy = st.lists(
    st.tuples(st.integers(0, 10_000), st.sampled_from(["a", "b", "c"]),
              st.integers(1, 500)),
    min_size=1, max_size=30, unique_by=lambda t: t[0],
)


@settings(max_examples=10, deadline=None)
@given(rows=docs_strategy, quota=st.integers(1, 6))
def test_quota_sample_matches_model(spark, rows, quota):
    """quota_sample == Python model: per group, sort by
    ((id*506952114) % M31, id), take quota."""
    from genpipe_spark.operators.mixing import quota_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, source=s, n_chars=n) for i, s, n in rows]
    )
    got = {r["doc_id"] for r in quota_sample(df, "source", quota).collect()}
    expected = set()
    for grp in {s for _, s, _ in rows}:
        members = sorted(
            (i for i, s, _ in rows if s == grp),
            key=lambda i: ((i * 506952114) % 2147483647, i),
        )
        expected |= set(members[:quota])
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(rows=docs_strategy, budget=st.integers(10, 800))
def test_pack_streaming_matches_model(spark, rows, budget):
    from genpipe_spark.operators.mixing import pack_streaming

    df = spark.createDataFrame(
        [Row(doc_id=i, source=s, n_chars=n) for i, s, n in rows]
    )
    got = {
        (r["doc_id"], r["pack_id"], r["pack_offset"])
        for r in pack_streaming(
            df, "n_chars", budget, pack_group="source"
        ).collect()
    }
    expected = set()
    for grp in {s for _, s, _ in rows}:
        run = 0
        for i, s, n in sorted(rows):
            if s != grp:
                continue
            expected.add((i, run // budget, run - (run // budget) * budget))
            run += n
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 1000),
            st.lists(
                st.floats(-100, 100, allow_nan=False, width=32),
                min_size=1, max_size=8,
            ),
        ),
        min_size=1, max_size=10, unique_by=lambda t: t[0],
    )
)
def test_quantize_int8_matches_model(spark, vecs):
    import math

    from genpipe_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: (r["scale"], list(r["q"])) for r in quantize_int8(df).collect()}
    import struct as _s
    for i, v in vecs:
        v32 = [_s.unpack("f", _s.pack("f", x))[0] for x in v]  # float32 rounding
        scale = max(abs(x) for x in v32) / 127.0
        q = [0 if scale == 0 else int(math.floor(x / scale + 0.5)) for x in v32]
        assert got[i][0] == scale
        assert got[i][1] == q


words_strategy = st.lists(
    st.sampled_from(["a", "bb", "ccc", "dd", "e"]), min_size=0, max_size=12
)


@given(docs=st.lists(words_strategy, min_size=1, max_size=5))
@settings(max_examples=20, deadline=None)
def test_repetition_score_matches_model(spark, docs):
    """repetition_score == a trivial pure-Python trigram model on
    arbitrary small word lists (empty docs, <3 words, all-same words)."""
    import math

    from pyspark.sql import Row

    from genpipe_spark.operators.text import repetition_score

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(ws)) for i, ws in enumerate(docs)]
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["n_trigrams_distinct"], r["rep_ratio"])
        for r in repetition_score(df).collect()
    }
    for i, ws in enumerate(docs):
        tris = [" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)]
        n, d = len(tris), len(set(tris))
        rep = math.floor((1 - d / n) * 10000) / 10000.0 if n else 0.0
        assert got[i] == (n, d, rep), (i, ws)
