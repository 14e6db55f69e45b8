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


# region-join bounds cross zero: the first-shared-cell exactly-once
# rule must hold where truncating div and floor diverge (negative
# coordinates), not just on the positive axis
signed_intervals_strategy = st.lists(
    st.tuples(st.integers(-300, 300), st.integers(0, 60)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=12, deadline=None)
@given(
    left=signed_intervals_strategy,
    right=signed_intervals_strategy,
    width=st.sampled_from([7, 64, 1000]),
)
def test_interval_interval_join_matches_model(spark, left, right, width):
    """Banded region×region join == brute-force overlap model, each
    pair EXACTLY once (the first-shared-cell rule must not duplicate
    pairs spanning several shared cells, for any band width)."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.interval import interval_interval_join

    ldf = spark.createDataFrame(
        [Row(li=i, l_lo=lo, l_hi=hi) for i, (lo, hi) in enumerate(left)]
    ).withColumn("k", F.lit(1))
    rdf = spark.createDataFrame(
        [Row(ri=i, r_lo=lo, r_hi=hi) for i, (lo, hi) in enumerate(right)]
    ).withColumn("k", F.lit(1))
    rows = interval_interval_join(
        ldf, rdf, ["k"], "l_lo", "l_hi", "r_lo", "r_hi", band_width=width
    ).collect()
    got = [(r["li"], r["ri"]) for r in rows]
    assert len(got) == len(set(got)), "pair emitted more than once"
    expected = {
        (i, j)
        for i, (a, b) in enumerate(left)
        for j, (c, d) in enumerate(right)
        if a <= d and c <= b
    }
    assert set(got) == expected


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


# -------------------------------------------- r5 session-3: line dedup

docs_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=5),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(docs=docs_strategy, min_docs=st.sampled_from([2, 3]))
def test_line_dedup_drop_common_matches_model(spark, docs, min_docs):
    from genpipe_spark.operators.dedup import explode_lines, line_dedup

    rows = [Row(doc_id=i, text="\n".join(lines)) for i, lines in enumerate(docs)]
    lines_df = explode_lines(spark.createDataFrame(rows))
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in line_dedup(lines_df, mode="drop_common", min_docs=min_docs).collect()
    }
    # model: a doc with empty text still splits into one '' line (split
    # semantics), matching explode_lines
    split_docs = {i: ("\n".join(ls)).split("\n") for i, ls in enumerate(docs)}
    from collections import defaultdict

    docs_per_line = defaultdict(set)
    for i, ls in split_docs.items():
        for line in ls:
            docs_per_line[line].add(i)
    hot = {l for l, ds in docs_per_line.items() if len(ds) >= min_docs}
    for i, ls in split_docs.items():
        kept = [l for l in ls if l not in hot]
        assert got[i] == ("\n".join(kept), len(ls), len(kept)), (i, ls)


@settings(max_examples=10, deadline=None)
@given(docs=docs_strategy)
def test_line_dedup_keep_first_matches_model(spark, docs):
    from genpipe_spark.operators.dedup import explode_lines, line_dedup

    rows = [Row(doc_id=i, text="\n".join(lines)) for i, lines in enumerate(docs)]
    lines_df = explode_lines(spark.createDataFrame(rows))
    got = {
        r["doc_id"]: r["text"]
        for r in line_dedup(lines_df, mode="keep_first").collect()
    }
    split_docs = {i: ("\n".join(ls)).split("\n") for i, ls in enumerate(docs)}
    seen = {}
    for i in sorted(split_docs):
        for pos, line in enumerate(split_docs[i]):
            seen.setdefault(line, (i, pos))
    for i, ls in split_docs.items():
        kept = [l for pos, l in enumerate(ls) if seen[l] == (i, pos)]
        assert got[i] == "\n".join(kept), (i, ls)


# ------------------------------------------ r5 session-3: funnel model

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),          # user
        st.integers(0, 50),         # ts
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(events=events_strategy)
def test_funnel_matches_model(spark, events):
    from genpipe_spark.operators.eventflow import funnel_steps

    rows = [
        Row(u=u, ts=__import__("datetime").datetime(2024, 1, 1, 0, 0, t), s=s)
        for u, t, s in events
    ]
    got = {
        r["u"]: r["steps_completed"]
        for r in funnel_steps(
            spark.createDataFrame(rows), "u", "ts", "s", ["a", "b", "c"]
        ).collect()
    }
    # model: sequential earliest-qualifying scan
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, s in events:
        by_user[u].append((t, s))
    for u, evs in by_user.items():
        evs = sorted(evs)
        prev, done = None, 0
        for step in ["a", "b", "c"]:
            cand = [
                t for t, s in evs
                if s == step and (prev is None or t > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            done += 1
        if done == 0:
            assert u not in got, (u, evs)
        else:
            assert got[u] == done, (u, evs, got.get(u))


# -------------------------------- r5 session-3: transition-matrix sums

@settings(max_examples=8, deadline=None)
@given(events=events_strategy)
def test_transition_matrix_rows_normalize(spark, events):
    from genpipe_spark.operators.eventflow import transition_matrix

    rows = [Row(u=u, o=i, s=s) for i, (u, t, s) in enumerate(events)]
    out = transition_matrix(
        spark.createDataFrame(rows), "u", ["o"], "s"
    ).collect()
    from collections import defaultdict

    per_from = defaultdict(list)
    for r in out:
        per_from[r["state_from"]].append(r)
    for state, rs in per_from.items():
        tot = sum(r["n"] for r in rs)
        # exact integer probabilities: floor leaves < len(rs) micro dust
        psum = sum(r["p_micro"] for r in rs)
        assert 1_000_000 - len(rs) < psum <= 1_000_000, (state, rs)
        for r in rs:
            assert r["p_micro"] == r["n"] * 1_000_000 // tot


# ------------------------------------------------- snapshot diff roundtrip

snapshot_strategy = st.dictionaries(
    st.integers(1, 12),  # key
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 3)),
    max_size=10,
)


@settings(max_examples=10, deadline=None)
@given(old=snapshot_strategy, new=snapshot_strategy)
def test_snapshot_diff_roundtrip_property(spark, old, new):
    """For ANY pair of snapshots: applying the derived diff to old
    reproduces new exactly, and the diff is minimal (no rows for
    unchanged keys, ops partition into I/U/D correctly)."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.cdc import merge_apply, snapshot_diff

    schema = "k: long, v: string, x: long"
    odf = spark.createDataFrame(
        [(k, v, x) for k, (v, x) in old.items()], schema
    ) if old else spark.createDataFrame([], schema)
    ndf = spark.createDataFrame(
        [(k, v, x) for k, (v, x) in new.items()], schema
    ) if new else spark.createDataFrame([], schema)
    diff = snapshot_diff(odf, ndf, ["k"]).collect()
    expected_ops = {}
    for k in set(old) | set(new):
        if k in old and k not in new:
            expected_ops[k] = "D"
        elif k not in old and k in new:
            expected_ops[k] = "I"
        elif old[k] != new[k]:
            expected_ops[k] = "U"
    assert {(r["k"], r["op"]) for r in diff} == set(expected_ops.items())
    applied = merge_apply(
        odf,
        snapshot_diff(odf, ndf, ["k"]).withColumn("seq", F.lit(1)),
        ["k"],
        "seq",
    )
    assert {tuple(r) for r in applied.collect()} == {
        (k, v, x) for k, (v, x) in new.items()
    }


# --------------------------------------------- weighted quantile crossing

wq_strategy = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(-50, 50),  # value
        st.integers(1, 9),  # weight
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(rows=wq_strategy, pcts=st.sampled_from([(50,), (25, 50, 75), (10, 90, 100)]))
def test_group_weighted_quantiles_matches_model(spark, rows, pcts):
    """Crossing rule vs a brute-force model: smallest value whose
    cumulative weight reaches pct% of the group total."""
    from genpipe_spark.operators.quantile import group_weighted_quantiles

    df = spark.createDataFrame(rows, "g: string, v: long, w: long")
    got = {
        (r["g"], r["pct"]): (r["w_total"], r["wq"])
        for r in group_weighted_quantiles(df, "v", "w", ["g"], pcts).collect()
    }
    groups = {}
    for g, v, w in rows:
        groups.setdefault(g, []).append((v, w))
    expected = {}
    for g, vw in groups.items():
        tot = sum(w for _, w in vw)
        cum = 0
        svw = sorted(vw)
        for p in pcts:
            cum = 0
            q = None
            for v, w in svw:
                cum += w
                if cum * 100 >= p * tot:
                    q = v
                    break
            expected[(g, p)] = (tot, q)
    assert got == expected


# ------------------------------------------------------ session paths

sp_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),  # user
        st.integers(0, 100),  # t (seconds)
        st.sampled_from(["A", "B", "C"]),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(events=sp_strategy, gap_s=st.sampled_from([5, 17, 40]))
def test_session_paths_matches_model(spark, events, gap_s):
    """Gap sessionization + ordered path concat vs a Python model
    (unique (t, eid) per user enforced by synthetic event ids)."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.eventflow import session_paths

    rows = [
        (u, t * 1_000_000, i, s) for i, (u, t, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "u: long, t_us: long, eid: long, state: string"
    ).select(
        "u", F.timestamp_micros(F.col("t_us")).alias("ts"), "eid", "state"
    )
    got = {
        (r["path"], r["n_sessions"])
        for r in session_paths(
            df, "u", "ts", "state", gap_us=gap_s * 1_000_000,
            tiebreak_col="eid",
        ).collect()
    }
    by_user = {}
    for u, t_us, eid, s in rows:
        by_user.setdefault(u, []).append((t_us, eid, s))
    paths = {}
    for u, evs in by_user.items():
        evs.sort()
        cur, last_t = [], None
        for t_us, _, s in evs:
            if last_t is not None and t_us - last_t > gap_s * 1_000_000:
                p = "->".join(cur)
                paths[p] = paths.get(p, 0) + 1
                cur = []
            cur.append(s)
            last_t = t_us
        p = "->".join(cur)
        paths[p] = paths.get(p, 0) + 1
    assert got == set(paths.items())


# ------------------------------------------------- stateful capped scan

deltas_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-50, 50)),  # (key, delta)
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(rows=deltas_strategy, lo=st.sampled_from([0, -20]), cap=st.sampled_from([30, 10_000_000]))
def test_capped_running_sum_matches_model(spark, rows, lo, cap):
    from genpipe_spark.operators.statescan import capped_running_sum

    df = spark.createDataFrame(
        [Row(k=k, seq=i, delta=d) for i, (k, d) in enumerate(rows)]
    )
    got = {
        (r["k"], r["seq"]): r["bal"]
        for r in capped_running_sum(
            df, keys=["k"], order_cols=["seq"], delta_col="delta",
            lo=lo, hi=cap,
        ).collect()
    }
    state: dict[int, int] = {}
    for i, (k, d) in enumerate(rows):
        s = min(cap, max(lo, state.get(k, 0) + d))
        state[k] = s
        assert got[(k, i)] == s, (k, i)


@settings(max_examples=15, deadline=None)
@given(rows=deltas_strategy)
def test_lower_clamp_closed_form_matches_sequential(spark, rows):
    """The window closed form b = p - min(0, running_min(p)) must equal
    the sequential recurrence with no cap (hi = +inf-ish)."""
    from genpipe_spark.operators.statescan import (
        capped_running_sum,
        lower_clamped_running_sum,
    )

    df = spark.createDataFrame(
        [Row(k=k, seq=i, delta=d) for i, (k, d) in enumerate(rows)]
    )
    seq = {
        (r["k"], r["seq"]): r["bal"]
        for r in capped_running_sum(
            df, keys=["k"], order_cols=["seq"], delta_col="delta",
            lo=0, hi=1 << 60,
        ).collect()
    }
    closed = {
        (r["k"], r["seq"]): r["bal"]
        for r in lower_clamped_running_sum(
            df, keys=["k"], order_cols=["seq"], delta_col="delta"
        ).collect()
    }
    assert seq == closed


@settings(max_examples=10, deadline=None)
@given(
    deltas=st.lists(st.integers(-50, 50), min_size=0, max_size=60),
    chunks=st.sampled_from([1, 3, 7]),
    lo=st.sampled_from([0, -20]),
)
def test_capped_parallel_matches_sequential(spark, deltas, chunks, lo):
    """The monoid-composed chunked scan must equal the per-key
    sequential recurrence for every chunk count — including chunks >
    rows (empty chunks compose as identity) and a cap tight enough to
    saturate both ways."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.statescan import (
        capped_running_sum,
        capped_running_sum_parallel,
    )

    df = spark.createDataFrame(
        [Row(seq=i, delta=d) for i, d in enumerate(deltas)],
        schema="seq bigint, delta bigint",
    )
    par = {
        (r["seq"]): (r["rn"], r["bal"])
        for r in capped_running_sum_parallel(
            df, order_cols=["seq"], delta_col="delta",
            lo=lo, hi=30, n_chunks=chunks,
        ).collect()
    }
    seq = {
        (r["seq"]): (r["rn"], r["bal"])
        for r in capped_running_sum(
            df.withColumn("k", F.lit(1)), keys=["k"], order_cols=["seq"],
            delta_col="delta", lo=lo, hi=30,
        ).collect()
    }
    assert par == seq


# ------------------------------------------------------ FIFO allocation

fifo_rows = st.lists(
    st.tuples(
        st.integers(0, 1),      # key
        st.booleans(),          # is_supply
        st.integers(0, 12),     # qty (0 allowed: zero-qty lots)
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=15, deadline=None)
@given(rows=fifo_rows)
def test_fifo_allocate_matches_sequential_model(spark, rows):
    """The interval-overlap formulation must equal the obvious
    sequential oldest-lot-first consumption loop, pair for pair."""
    from genpipe_spark.operators.alloc import fifo_allocate

    df = spark.createDataFrame(
        [Row(k=k, seq=i, qty=q, is_s=s) for i, (k, s, q) in enumerate(rows)],
        schema="k bigint, seq bigint, qty bigint, is_s boolean",
    )
    got = {
        (r["k"], r["supply_id"], r["demand_id"]): r["alloc_qty"]
        for r in fifo_allocate(
            df.where("is_s"), df.where("NOT is_s"),
            keys=["k"], order_cols=["seq"], qty_col="qty",
            supply_id="seq", demand_id="seq",
        ).collect()
    }
    # sequential model: per key, demands consume lots oldest-first
    model: dict[tuple[int, int, int], int] = {}
    for key in {k for (k, _, _) in rows}:
        lots = [
            [i, q] for i, (k, s, q) in enumerate(rows) if k == key and s
        ]
        li = 0
        for i, (k, s, q) in enumerate(rows):
            if k != key or s:
                continue
            need = q
            while li < len(lots):
                take = min(need, lots[li][1])
                # the operator emits every interval-overlap pair,
                # including zero-width touches only when strict
                # inequalities hold; mirror by recording take>0 and
                # the boundary zero-overlap cases the join admits
                if take > 0:
                    model[(key, lots[li][0], i)] = take
                lots[li][1] -= take
                need -= take
                if lots[li][1] == 0 and need > 0:
                    li += 1
                else:
                    break
    got_pos = {k: v for k, v in got.items() if v > 0}
    assert got_pos == model
    assert all(v >= 0 for v in got.values())


# ------------------------------------------------- prefix-filter Jaccard

words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
docs_strategy = st.lists(
    st.lists(words, min_size=3, max_size=10).map(" ".join),
    min_size=2,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(texts=docs_strategy, thr=st.sampled_from([0.1, 0.35, 0.6]))
def test_prefix_filter_equals_exact_jaccard(spark, texts, thr):
    """The AllPairs prefix-filter candidate rule must lose NOTHING:
    output identical to the full-inverted-index exact operator at any
    threshold — tiny vocab maximizes shared (and hot) shingles, the
    adversarial case for the pruning math."""
    from genpipe_spark.operators.dedup import (
        jaccard_prefix_filter_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t_) for i, t_ in enumerate(texts)]
    )
    exact = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=thr).collect()
    }
    pref = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_prefix_filter_pairs(df, threshold=thr).collect()
    }
    assert pref == exact


# ------------------------------------------------------ grid radius join

coords = st.lists(
    st.tuples(st.integers(0, 200), st.integers(0, 200)),
    min_size=1,
    max_size=15,
)


@settings(max_examples=12, deadline=None)
@given(pts=coords, ctrs=coords, r=st.sampled_from([1, 13, 50, 300]))
def test_grid_radius_join_matches_bruteforce(spark, pts, ctrs, r):
    """3x3-neighborhood grid join == brute-force squared-distance
    filter, each pair exactly once, at radii from sub-cell to
    covers-everything."""
    from genpipe_spark.operators.spatial import grid_radius_join

    pdf = spark.createDataFrame(
        [Row(pi=i, px=x, py=y) for i, (x, y) in enumerate(pts)],
        schema="pi bigint, px bigint, py bigint",
    )
    cdf = spark.createDataFrame(
        [Row(ci=i, cx=x, cy=y) for i, (x, y) in enumerate(ctrs)],
        schema="ci bigint, cx bigint, cy bigint",
    )
    rows = grid_radius_join(pdf, cdf, "px", "py", "cx", "cy", r).collect()
    got = [(x["pi"], x["ci"]) for x in rows]
    assert len(got) == len(set(got)), "pair emitted more than once"
    expected = {
        (i, j)
        for i, (x1, y1) in enumerate(pts)
        for j, (x2, y2) in enumerate(ctrs)
        if (x1 - x2) ** 2 + (y1 - y2) ** 2 <= r * r
    }
    assert set(got) == expected
    for x in rows:
        assert x["dist2"] == (pts[x["pi"]][0] - ctrs[x["ci"]][0]) ** 2 + (
            pts[x["pi"]][1] - ctrs[x["ci"]][1]
        ) ** 2


# --------------------------------------------- largest-remainder alloc

@settings(max_examples=15, deadline=None)
@given(
    weights=st.lists(st.integers(0, 50), min_size=1, max_size=12),
    seats=st.sampled_from([1, 7, 100, 9973]),
)
def test_largest_remainder_matches_model(spark, weights, seats):
    """sum(alloc) == seats exactly whenever total weight > 0;
    allocations match the sequential Hamilton model including
    zero-weight groups and remainder ties broken on the key."""
    from genpipe_spark.operators.alloc import largest_remainder_apportion

    if sum(weights) == 0:
        weights = weights + [1]
    df = spark.createDataFrame(
        [Row(k=i, w=w) for i, w in enumerate(weights)],
        schema="k bigint, w bigint",
    )
    got = {
        r["k"]: (r["base"], r["rem"], r["alloc"])
        for r in largest_remainder_apportion(
            df, key_cols=["k"], weight_col="w", seats=seats
        ).collect()
    }
    tot = sum(weights)
    base = {i: (seats * w) // tot for i, w in enumerate(weights)}
    rem = {i: (seats * w) % tot for i, w in enumerate(weights)}
    leftover = seats - sum(base.values())
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
    alloc = {
        i: base[i] + (1 if pos < leftover else 0)
        for pos, i in enumerate(order)
    }
    assert got == {
        i: (base[i], rem[i], alloc[i]) for i in range(len(weights))
    }
    assert sum(a for _, _, a in got.values()) == seats


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-40, 40)),
        min_size=0, max_size=60,
    ),
    threshold=st.sampled_from([1, 3, 8]),
    chunks=st.sampled_from([2, 5]),
)
def test_capped_hybrid_matches_sequential(spark, rows, threshold, chunks):
    """The hot/cold hybrid router must equal the plain per-key scan for
    every (threshold, chunk count) — adversarially small thresholds
    force real keys down BOTH paths, including keys split across
    range partitions mid-sequence."""
    from genpipe_spark.operators.statescan import (
        capped_running_sum,
        capped_running_sum_hybrid,
    )

    df = spark.createDataFrame(
        [Row(k=k, seq=i, delta=d) for i, (k, d) in enumerate(rows)],
        schema="k bigint, seq bigint, delta bigint",
    )
    hyb = {
        (r["k"], r["seq"]): (r["rn"], r["bal"])
        for r in capped_running_sum_hybrid(
            df, keys=["k"], order_cols=["seq"], delta_col="delta",
            lo=-15, hi=25, hot_threshold=threshold, n_chunks=chunks,
        ).collect()
    }
    seq = {
        (r["k"], r["seq"]): (r["rn"], r["bal"])
        for r in capped_running_sum(
            df, keys=["k"], order_cols=["seq"], delta_col="delta",
            lo=-15, hi=25,
        ).collect()
    }
    assert hyb == seq


def test_hilbert_nd_equals_2d_at_d2(spark):
    """ROADMAP r8 item: the N-D Skilling transpose at d=2 is not just
    'a' Hilbert curve — it is the SAME curve as the classic xy2d loop,
    same orientation, index for index (exhaustive over the full
    bits=4 grid). The 2-D kernel's unrolled SQL twin therefore covers
    the N-D kernel's d=2 slice transitively."""
    from genpipe_spark.operators.layout import (
        hilbert_index_nd_pandas,
        hilbert_index_pandas,
    )

    bits, side = 4, 16
    rows = [(x, y) for x in range(side) for y in range(side)]
    df = spark.createDataFrame(rows, "x long, y long")
    d2 = {
        (r["x"], r["y"]): r["hilbert_d"]
        for r in hilbert_index_pandas(df, "x", "y", bits=bits).collect()
    }
    dn = {
        (r["x"], r["y"]): r["hilbert_d"]
        for r in hilbert_index_nd_pandas(df, ["x", "y"], bits=bits).collect()
    }
    assert d2 == dn


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 6), st.integers(0, 6)),
        min_size=2, max_size=40,
    )
)
def test_kendall_tau_matches_bruteforce(spark, rows):
    """Knight's merge-sort formulation (swaps == discordant pairs, tie
    terms from run lengths) must equal the O(n^2) literal pair count —
    heavy ties on both axes by construction."""
    import math

    from genpipe_spark.operators.quantile import kendall_tau_grouped

    df = spark.createDataFrame(
        [Row(g=g, x=x, y=y) for g, x, y in rows], "g long, x long, y long"
    )
    got = {
        r["g"]: (r["n"], r["disc_swaps"], r["n1"], r["n2"], r["n3"],
                 r["tau_micro"])
        for r in kendall_tau_grouped(df, ["g"], "x", "y").collect()
    }
    from collections import defaultdict

    groups = defaultdict(list)
    for g, x, y in rows:
        groups[g].append((x, y))
    for g, pts in groups.items():
        n = len(pts)
        nd = n1 = n2 = n3 = 0
        for i in range(n):
            for j in range(i + 1, n):
                (xa, ya), (xb, yb) = pts[i], pts[j]
                if (xa < xb and ya > yb) or (xa > xb and ya < yb):
                    nd += 1
                if xa == xb:
                    n1 += 1
                if ya == yb:
                    n2 += 1
                if xa == xb and ya == yb:
                    n3 += 1
        n0 = n * (n - 1) // 2
        num = n0 - n1 - n2 + n3 - 2 * nd
        tau = (
            None
            if n0 - n1 == 0 or n0 - n2 == 0
            else math.floor(
                1_000_000.0 * float(num)
                / math.sqrt(float(n0 - n1) * float(n0 - n2))
            )
        )
        assert got[g] == (n, nd, n1, n2, n3, tau), g


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-500, 500)),
        min_size=0, max_size=60,
    ),
    threshold=st.sampled_from([1, 3, 8]),
    chunks=st.sampled_from([2, 5]),
)
def test_ewma_hybrid_matches_sequential(spark, rows, threshold, chunks):
    """The float hot-key router (r8, VERDICT r7 item 5) vs the
    sequential scan under adversarial splits: rn must be EXACT
    everywhere; ewma_micro exact on cold keys and within the
    documented magnitude-dependent tolerance max(1, |s|*1e-9) micro
    where a hot key is split across range partitions (the
    composed-handoff drift is RELATIVE, ~|s|*2^-52 — r8 advisory:
    an absolute 1-micro claim fails past |s| ~ 4e9 micro)."""
    from genpipe_spark.operators.statescan import ewma_scan, ewma_scan_hybrid

    df = spark.createDataFrame(
        [Row(k=k, seq=i, v=float(v) / 4.0) for i, (k, v) in enumerate(rows)],
        schema="k bigint, seq bigint, v double",
    )
    hyb = {
        (r["k"], r["seq"]): (r["rn"], r["ewma_micro"])
        for r in ewma_scan_hybrid(
            df, keys=["k"], order_cols=["seq"], value_col="v", alpha=0.25,
            hot_threshold=threshold, n_chunks=chunks,
        ).collect()
    }
    seq = {
        (r["k"], r["seq"]): (r["rn"], r["ewma_micro"])
        for r in ewma_scan(
            df, keys=["k"], order_cols=["seq"], value_col="v", alpha=0.25,
        ).collect()
    }
    assert hyb.keys() == seq.keys()
    for key in seq:
        assert hyb[key][0] == seq[key][0], f"rn mismatch at {key}"
        tol = max(1, abs(seq[key][1]) * 1e-9)
        assert abs(hyb[key][1] - seq[key][1]) <= tol, (
            f"ewma beyond tolerance at {key}: {hyb[key]} vs {seq[key]}"
        )


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-500, 500)),
        min_size=0, max_size=50,
    ),
    threshold=st.sampled_from([1, 4]),
    chunks=st.sampled_from([2, 5]),
)
def test_holt_hybrid_matches_sequential(spark, rows, threshold, chunks):
    """holt_scan_hybrid vs holt_scan: exact rn, level/trend within the
    magnitude-dependent max(1, |s|*1e-9)-micro handoff tolerance
    (2-state affine composition; relative drift — r8 advisory)."""
    from genpipe_spark.operators.statescan import holt_scan, holt_scan_hybrid

    df = spark.createDataFrame(
        [Row(k=k, seq=i, v=float(v) / 4.0) for i, (k, v) in enumerate(rows)],
        schema="k bigint, seq bigint, v double",
    )
    kw = dict(keys=["k"], order_cols=["seq"], value_col="v",
              alpha=0.5, beta=0.25)
    hyb = {
        (r["k"], r["seq"]): (r["rn"], r["level_micro"], r["trend_micro"])
        for r in holt_scan_hybrid(
            df, hot_threshold=threshold, n_chunks=chunks, **kw
        ).collect()
    }
    seq = {
        (r["k"], r["seq"]): (r["rn"], r["level_micro"], r["trend_micro"])
        for r in holt_scan(df, **kw).collect()
    }
    assert hyb.keys() == seq.keys()
    for key in seq:
        assert hyb[key][0] == seq[key][0], f"rn mismatch at {key}"
        assert abs(hyb[key][1] - seq[key][1]) \
            <= max(1, abs(seq[key][1]) * 1e-9), f"level at {key}"
        assert abs(hyb[key][2] - seq[key][2]) \
            <= max(1, abs(seq[key][2]) * 1e-9), f"trend at {key}"


def test_ewma_hybrid_single_chunk_hot_key_bitexact(spark):
    """A hot key fully contained in ONE chunk replays the identical
    IEEE op sequence — bit-exact, not just within tolerance (the
    exactness contract's strong case)."""
    from genpipe_spark.operators.statescan import ewma_scan, ewma_scan_hybrid

    rows = [Row(k=1, seq=i, v=(-1.0) ** i * (i + 0.1)) for i in range(40)]
    df = spark.createDataFrame(rows, schema="k bigint, seq bigint, v double")
    hyb = {
        r["seq"]: r["ewma_micro"]
        for r in ewma_scan_hybrid(
            df, ["k"], ["seq"], "v", alpha=0.25,
            hot_threshold=5, n_chunks=1,
        ).collect()
    }
    seq = {
        r["seq"]: r["ewma_micro"]
        for r in ewma_scan(df, ["k"], ["seq"], "v", alpha=0.25).collect()
    }
    assert hyb == seq


@settings(max_examples=10, deadline=None)
@given(
    series=st.lists(
        st.lists(st.integers(-1000, 1000), min_size=1, max_size=25),
        min_size=1, max_size=4,
    )
)
def test_isotonic_fit_matches_minimax_bruteforce(spark, series):
    """PAVA (the operator) vs the minimax definition
    fitted_i = max_{j<=i} min_{k>=i} avg(j..k), evaluated brute-force
    in exact Fractions — independent of both the operator's block
    stack AND the SQL oracle's double path."""
    from fractions import Fraction
    import math

    from genpipe_spark.operators.statescan import isotonic_fit

    rows = [
        (k, i + 1, x)
        for k, xs in enumerate(series)
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "k long, seq long, x long")
    got = {
        (r["k"], r["rn"]): r["fitted_micro"]
        for r in isotonic_fit(df, ["k"], ["seq"], "x").collect()
    }
    for k, xs in enumerate(series):
        n = len(xs)
        pre = [0]
        for x in xs:
            pre.append(pre[-1] + x)
        for i in range(1, n + 1):
            best = None
            for j in range(1, i + 1):
                mn = min(
                    Fraction(pre[kk] - pre[j - 1], kk - j + 1)
                    for kk in range(i, n + 1)
                )
                best = mn if best is None else max(best, mn)
            want = math.floor(float(best) * 1_000_000.0)
            # the operator divides the POOLED block's sum/cnt; the
            # Fraction->float here may round the same rational through
            # a different path only when the fraction is not exactly
            # representable — allow 1 micro of slack at the boundary
            assert abs(got[(k, i)] - want) <= 1, (k, i, got[(k, i)], want)


@settings(max_examples=10, deadline=None)
@given(
    series=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(-10**4, 10**4)),
        min_size=1, max_size=40, unique_by=lambda t: t[0],
    ),
    k=st.sampled_from([3, 5, 8]),
)
def test_lttb_matches_python_reference(spark, series, k):
    """lttb_downsample vs an independent pure-Python LTTB (exact-int
    scoring, same bucket layout) on random (x, y) series — pins the
    sequential selection beyond the fixture-shaped oracle check."""
    from genpipe_spark.operators.timegrid import lttb_downsample

    pts = sorted(series)
    rows = [(1, x, y) for x, y in pts]
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = sorted(
        (r["sel_idx"], r["rn"], r["x"], r["y"])
        for r in lttb_downsample(
            df, ["g"], ["x"], x_col="x", y_col="y", k=k
        ).collect()
    )

    n = len(pts)
    want = [(-1, 1, *pts[0])]
    if n >= 2:
        buckets: dict[int, list] = {}
        for i in range(1, n - 1):
            b = ((i - 1) * (k - 2)) // (n - 2)
            buckets.setdefault(b, []).append((i + 1, *pts[i]))
        prev = pts[0]
        bids = sorted(buckets)
        for idx, b in enumerate(bids):
            if b == k - 3:
                m, sx, sy = 1, pts[-1][0], pts[-1][1]
            elif (b + 1) in buckets:
                nxt = buckets[b + 1]
                m = len(nxt)
                sx = sum(p[1] for p in nxt)
                sy = sum(p[2] for p in nxt)
            else:
                # empty next bucket => this bucket is a singleton
                # (div-spread property); score irrelevant
                m, sx, sy = 1, 0, 0
            px, py = prev
            best = None
            for rn, x, y in buckets[b]:
                s = abs((m * px - sx) * (y - py) - (px - x) * (sy - m * py))
                if best is None or s > best[0] or (s == best[0] and rn < best[1]):
                    best = (s, rn, x, y)
            want.append((b, best[1], best[2], best[3]))
            prev = (best[2], best[3])
        want.append((k - 2, n, *pts[-1]))
    assert got == sorted(want)


# ------------------------------------------- Mann-Kendall + Theil-Sen


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(-8, 8)),
        min_size=2, max_size=30,
    )
)
def test_mann_kendall_matches_bruteforce(spark, rows):
    """The inversion-machinery formulation (S = n0 - yties - 2*inv)
    and the gated exact-pairwise Theil-Sen median must equal the
    literal O(n^2) pair enumeration — heavy value ties by
    construction (r9: the per-key self-join rewrite)."""
    import math

    from genpipe_spark.operators.quantile import (
        mann_kendall_theil_sen_grouped,
    )

    data = [Row(g=g, o=i, y=y) for i, (g, y) in enumerate(rows)]
    df = spark.createDataFrame(data, "g long, o long, y long")
    got = {
        r["g"]: (r["n"], r["m_pairs"], r["s_stat"], r["var18"],
                 r["theil_slope_micro"], r["z_micro"])
        for r in mann_kendall_theil_sen_grouped(
            df, ["g"], ["o"], "y"
        ).collect()
    }
    from collections import defaultdict

    groups = defaultdict(list)
    for g, y in rows:
        groups[g].append(y)
    for g, ys in groups.items():
        n = len(ys)
        if n < 2:
            assert g not in got
            continue
        s = 0
        slopes = []
        tie = defaultdict(int)
        for i in range(n):
            tie[ys[i]] += 1
            for j in range(i + 1, n):
                s += (ys[j] > ys[i]) - (ys[j] < ys[i])
                slopes.append((ys[j] - ys[i]) / (j - i))
        n0 = n * (n - 1) // 2
        tie18 = sum(c * (c - 1) * (2 * c + 5) for c in tie.values())
        var18 = n * (n - 1) * (2 * n + 5) - tie18
        kth = sorted(slopes)[(n0 + 1) // 2 - 1]
        if var18 == 0:
            z = None
        elif s > 0:
            z = math.floor((s - 1) / math.sqrt(var18 / 18.0) * 1000000)
        elif s < 0:
            z = math.floor((s + 1) / math.sqrt(var18 / 18.0) * 1000000)
        else:
            z = 0
        assert got[g] == (
            n, n0, s, var18, math.floor(kth * 1000000), z
        ), g


def test_mann_kendall_whale_key_completes(spark):
    """One 100k-event whale group (the r8 `weak` scenario: a bot user)
    must complete in seconds — S/var18/z stay EXACT via the O(n log n)
    inversion path; the Theil-Sen slope routes to the deterministic
    sampled-pair fallback (bit-stable across reruns). Under the old
    self-join formulation this group alone was ~5e9 pairs."""
    import time

    import numpy as np

    from genpipe_spark.operators.quantile import (
        mann_kendall_theil_sen_grouped,
    )

    n = 100_000
    # y = i // 2: monotone with every value tied exactly twice, so all
    # the closed forms are known: inversions = 0, yties = n/2,
    # tie18 = (n/2) * 2*1*(2*2+5) = 9n, slopes concentrate at 1/2.
    import pandas as pd

    pdf = pd.DataFrame(
        {"g": np.int64(7), "o": np.arange(n, dtype=np.int64),
         "y": np.arange(n, dtype=np.int64) // 2}
    )
    df = spark.createDataFrame(pdf)
    t0 = time.monotonic()
    rows = mann_kendall_theil_sen_grouped(df, ["g"], ["o"], "y").collect()
    elapsed = time.monotonic() - t0
    assert elapsed < 60, f"whale group took {elapsed:.1f}s"
    assert len(rows) == 1
    r = rows[0]
    n0 = n * (n - 1) // 2
    yties = n // 2
    s = n0 - yties
    var18 = n * (n - 1) * (2 * n + 5) - 9 * n
    import math

    z = math.floor((s - 1) / math.sqrt(var18 / 18.0) * 1000000)
    assert (r["n"], r["m_pairs"], r["s_stat"], r["var18"], r["z_micro"]) \
        == (n, n0, s, var18, z)
    # sampled-median slope: true pairwise slopes are (j//2 - i//2)/(j-i)
    # in [0, 1] with median 1/2 — the 200k-pair sample pins micro to a
    # tight band around 500000
    assert 480_000 <= r["theil_slope_micro"] <= 520_000
    # deterministic fallback: a second evaluation is bit-identical
    r2 = mann_kendall_theil_sen_grouped(df, ["g"], ["o"], "y").collect()[0]
    assert r2["theil_slope_micro"] == r["theil_slope_micro"]


def test_ewma_hybrid_large_magnitude_relative_tolerance(spark):
    """The handoff drift regime the r8 advisory named: smoothed state
    ~1e10 (micro ~1e16), where an absolute 1-micro bound is
    unattainable and the contract is the relative one. One hot key
    forced across chunks, large cent magnitudes."""
    from genpipe_spark.operators.statescan import ewma_scan, ewma_scan_hybrid

    n = 400
    rows = [
        Row(k=1, seq=i, v=1.0e10 + (i * 7919 % 1000) * 1.0e6)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "k bigint, seq bigint, v double")
    kw = dict(keys=["k"], order_cols=["seq"], value_col="v", alpha=0.25)
    hyb = {
        r["seq"]: r["ewma_micro"]
        for r in ewma_scan_hybrid(
            df, hot_threshold=1, n_chunks=8, **kw
        ).collect()
    }
    seq = {r["seq"]: r["ewma_micro"] for r in ewma_scan(df, **kw).collect()}
    assert hyb.keys() == seq.keys()
    for s in seq:
        tol = max(1, abs(seq[s]) * 1e-9)
        assert abs(hyb[s] - seq[s]) <= tol, (s, hyb[s], seq[s])


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=1, max_size=6,
    ),
    min_len=st.sampled_from([3, 5]),
    prefilter=st.booleans(),
)
def test_exact_substring_spans_matches_model(spark, docs, min_len, prefilter):
    """Sorted k-mer anchoring == the literal model: count every
    L-gram corpus-wide, mark positions whose gram repeats (>= 2
    occurrences anywhere, same-doc repeats included — Lee et al.
    semantics), merge overlapping/adjacent covers into maximal spans.
    Tiny alphabet forces heavy duplication and self-overlap; the
    hash-prefilter path must be indistinguishable from the direct
    path (exactness claim)."""
    from collections import Counter, defaultdict

    from genpipe_spark.operators.dedup import exact_substring_spans

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"],
         r["n_anchors"])
        for r in exact_substring_spans(
            df, min_len=min_len, hash_prefilter=prefilter
        ).collect()
    }
    cnt = Counter()
    pos = defaultdict(list)
    for i, txt in enumerate(docs):
        for p in range(len(txt) - min_len + 1):
            gram = txt[p:p + min_len]
            cnt[gram] += 1
            pos[i].append((p + 1, gram))  # 1-based
    want = set()
    for i, plist in pos.items():
        marked = [p for p, gm in plist if cnt[gm] >= 2]
        run: list[int] = []
        for p in marked:
            if run and p - run[-1] > min_len:
                want.add((i, run[0], run[-1] + min_len - 1,
                          run[-1] + min_len - run[0], len(run)))
                run = []
            run.append(p)
        if run:
            want.add((i, run[0], run[-1] + min_len - 1,
                      run[-1] + min_len - run[0], len(run)))
    assert got == want


# ---------------------------------------------------------- PELT segments


def _pelt_model(xs: list[int], min_pen: int = 1):
    """Un-pruned optimal-partitioning DP over the same quantized
    objective as operators/anomaly.pelt_segments (the DuckDB twin's
    formulation): exhaustive argmin, smallest-s tiebreak."""
    n = len(xs)
    ss = [0] * (n + 1)
    qq = [0] * (n + 1)
    for i, v in enumerate(xs):
        ss[i + 1] = ss[i] + v
        qq[i + 1] = qq[i] + v * v
    sse = qq[n] - (ss[n] * ss[n]) // n
    pen = max(2 * (sse // n), min_pen)

    def cost(s, t):
        d = ss[t] - ss[s]
        return (qq[t] - qq[s]) - (d * d) // (t - s)

    fs = [-pen] + [0] * n
    arg = [0] * (n + 1)
    for t in range(1, n + 1):
        best = None
        for s in range(t):
            f = fs[s] + cost(s, t) + pen
            if best is None or f < best:
                best, arg[t] = f, s
        fs[t] = best
    bounds = [n]
    while bounds[0] > 0:
        bounds.insert(0, arg[bounds[0]])
    return fs[n], bounds, pen


@settings(max_examples=8, deadline=None)
@given(
    xs=st.lists(st.integers(0, 1000), min_size=2, max_size=60),
)
def test_pelt_pruning_matches_full_dp(spark, xs):
    """PELT pruning (k_slack=2 over the quantized cost) must reproduce
    the EXACT un-pruned DP: same F(n), same backtracked boundaries,
    same smallest-s tiebreaks — the losslessness claim the oracle
    certifies on fixture data, here on adversarial random series."""
    from genpipe_spark.operators.anomaly import pelt_segments

    f_ref, bounds_ref, pen_ref = _pelt_model(xs)
    df = spark.createDataFrame(
        [Row(k="a", m=i, x=v) for i, v in enumerate(xs)]
    )
    out = pelt_segments(df, ["k"], "m", "x").orderBy("seg_idx").collect()
    assert out[0]["f_total"] == f_ref
    assert out[0]["pen"] == pen_ref
    # boundary indices reconstructed from cumulative segment lengths
    acc = [0]
    for r in out:
        acc.append(acc[-1] + r["seg_len"])
    assert acc == bounds_ref
    assert sum(r["seg_len"] for r in out) == len(xs)


def test_pelt_max_series_guard(spark):
    """A series longer than max_series must fail LOUDLY (the whale-key
    contract), not OOM a task."""
    import pytest as _pytest

    from genpipe_spark.operators.anomaly import pelt_segments

    df = spark.createDataFrame([Row(k="a", m=i, x=1) for i in range(50)])
    with _pytest.raises(Exception, match="max_series"):
        pelt_segments(df, ["k"], "m", "x", max_series=10).collect()


# ------------------------------------------------------- MMR re-ranking


def _mmr_model(rels, sims, k_sel, lam=0.7):
    """Pure-python greedy MMR: rels = {cid: rel}, sims = {(a,b): sim}."""
    selected, out = [], []
    cands = sorted(rels)
    for r in range(1, k_sel + 1):
        best = None
        for c in cands:
            if c in selected:
                continue
            if not selected:
                score = rels[c]
            else:
                score = lam * rels[c] - (1 - lam) * max(
                    sims[(c, s)] for s in selected
                )
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        selected.append(best[1])
        out.append((r, best[1], best[2]))
    return out


@settings(max_examples=6, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(-5, 5), st.integers(-5, 5), st.integers(-5, 5)
        ).filter(lambda v: any(v)),
        min_size=6,
        max_size=10,
        unique=True,
    )
)
def test_mmr_matches_greedy_model(spark, vecs):
    """mmr_rerank's unrolled DataFrame selection == the sequential
    greedy reference on random integer vectors (cosines computed the
    same double way in the model via the collected rel/sim values, so
    this checks the SELECTION LOGIC, not float folding)."""
    import math

    from pyspark.sql import Row

    from genpipe_spark.operators.similarity import mmr_rerank

    corpus = spark.createDataFrame(
        [Row(vec_id=i + 10, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)]
    )
    queries = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 0.5, -0.25])]
    )
    k_sel = 3
    got = mmr_rerank(
        corpus.unionByName(queries),
        queries,
        k_candidates=6,
        k_select=k_sel,
    ).collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    qv = [1.0, 0.5, -0.25]
    by_id = {i + 10: [float(x) for x in v] for i, v in enumerate(vecs)}
    rels_all = sorted(
        ((cos(qv, v), -i) for i, v in by_id.items()), reverse=True
    )
    cand_ids = [-n for _, n in rels_all[:6]]
    rels = {i: cos(qv, by_id[i]) for i in cand_ids}
    sims = {
        (a, b): cos(by_id[a], by_id[b])
        for a in cand_ids for b in cand_ids if a != b
    }
    want = _mmr_model(rels, sims, k_sel)
    got_t = sorted((r.sel_rank, r.vec_id) for r in got)
    assert got_t == [(r, c) for r, c, _ in want]


def test_sample_quantile_merge_equals_global(spark):
    """Half-split merge == global sketch on a deterministic frame
    (beyond the in-query 'merged' part: an UNEVEN 1/3-2/3 split)."""
    from pyspark.sql import Row

    from genpipe_spark.operators.sketch import (
        sample_quantile_merge,
        sample_quantile_sketch,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(tb=i, v=(i * 7919) % 1000) for i in range(5000)]
    )
    K = 256
    g = sample_quantile_sketch(df, "v", "tb", K).collect()[0]
    a = sample_quantile_sketch(df.where(F.col("tb") % 3 == 0), "v", "tb", K)
    b = sample_quantile_sketch(df.where(F.col("tb") % 3 != 0), "v", "tb", K)
    m = (
        a.select(F.col("hs").alias("ha"))
        .crossJoin(b.select(F.col("hs").alias("hb")))
        .select(sample_quantile_merge(F.col("ha"), F.col("hb"), K).alias("hm"))
        .collect()[0]
    )
    assert [(x.h, x.tb, x.v) for x in m.hm] == [
        (x.h, x.tb, x.v) for x in g.hs
    ]


def test_fellegi_sunter_score_model(spark):
    """fellegi_sunter_score == the python weight sum on a hand frame."""
    from pyspark.sql import Row

    from genpipe_spark.operators.fuzzy import fellegi_sunter_score
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [Row(pid=1, a1=True, a2=False), Row(pid=2, a1=False, a2=True)]
    ).withColumn("lnu1", F.lit(-5_000_000_000).cast("long")) \
     .withColumn("ln1u1", F.lit(-100).cast("long")) \
     .withColumn("lnu2", F.lit(-2_000_000_000).cast("long")) \
     .withColumn("ln1u2", F.lit(-50).cast("long"))
    fields = [
        {"agree": F.col("a1"), "ln_m_nano": -300, "ln_1m_nano": -1_000,
         "ln_u_nano": F.col("lnu1"), "ln_1u_nano": F.col("ln1u1")},
        {"agree": F.col("a2"), "ln_m_nano": -400, "ln_1m_nano": -2_000,
         "ln_u_nano": F.col("lnu2"), "ln_1u_nano": F.col("ln1u2")},
    ]
    out = {r.pid: r.score_nano
           for r in fellegi_sunter_score(pairs, fields).collect()}
    assert out[1] == (-300 - (-5_000_000_000)) + (-2_000 - (-50))
    assert out[2] == (-1_000 - (-100)) + (-400 - (-2_000_000_000))


def test_fellegi_sunter_small_blocks_stay_exact(spark):
    """The r10 whale-block gate must be a NO-OP at fixture scale: every
    (nation, bal-bucket) block at sf0.001 is far under the 65,536-pair
    budget, so the output is the bit-identical all-pairs result — the
    pinned confusion matrix certifies it (sf0.01's 214/1/0 is pinned by
    the oracle parity gate)."""
    from pyspark.sql import functions as F

    from genpipe_spark.queries.quality import link_fellegi_sunter

    df = link_fellegi_sunter(spark, "/root/testdata/sf0.001")
    r = df.agg(
        F.sum(((F.col("decision") == 1) & (F.col("is_true") == 1))
              .cast("int")).alias("tp"),
        F.sum(((F.col("decision") == 0) & (F.col("is_true") == 1))
              .cast("int")).alias("fn"),
        F.sum(((F.col("decision") == 1) & (F.col("is_true") == 0))
              .cast("int")).alias("fp"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (r.tp, r.fn, r.fp, r.n) == (21, 1, 0, 31)


def test_fellegi_sunter_whale_block_completes(tmp_path, spark):
    """One 100k-customer block (every record in nation 0, every acctbal
    inside one 500-cent bucket) is 100k x ~14.3k = 1.43e9 candidate
    pairs unguarded — the r9 `weak` scenario. The r10 gate must route
    it to windowed blocking: completes in seconds, pair volume linear
    (<= ~2w per record), and candidate recall stays high because the
    uncorrupted a_bal == b_bal sorts true pairs adjacent."""
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from genpipe_spark.queries.quality import link_fellegi_sunter

    n = 100_000
    pdf = pd.DataFrame(
        {
            "c_custkey": pd.array(range(1, n + 1), dtype="int64"),
            "c_name": [f"Customer#{k:09d}" for k in range(1, n + 1)],
            "c_acctbal": [float(k % 49_000) / 100.0 for k in range(1, n + 1)],
            "c_mktsegment": [
                ("BUILDING", "MACHINERY", "AUTOMOBILE")[k % 3]
                for k in range(1, n + 1)
            ],
            "c_nationkey": pd.array([0] * n, dtype="int64"),
        }
    )
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    t0 = time.monotonic()
    out = link_fellegi_sunter(spark, str(tmp_path)).agg(
        F.count(F.lit(1)).alias("npairs"),
        F.sum(F.col("is_true")).alias("true_found"),
    ).collect()[0]
    elapsed = time.monotonic() - t0
    assert elapsed < 90, f"whale block took {elapsed:.1f}s"
    n_b = n // 7
    # linear pair volume: banded window admits <= ~2(w+1) per b-record
    assert out.npairs < 2 * (6 + 1) * 2 * n_b
    # candidate recall: true pairs sort adjacent on (bal, name)
    assert out.true_found >= int(0.95 * n_b)


def test_exact_substr_routes_equivalent(spark):
    """The r10 high-duplication auto-route is PLAN-ONLY: the broadcast
    path, the wide path and the unfiltered exact path must emit
    identical span rows on a pathologically repetitive corpus — and
    the auto decision must pick 'broadcast' there (99%+ of gram
    occurrences duplicated, few distinct grams)."""
    from pyspark.sql import Row

    from genpipe_spark.operators.dedup import exact_substring_spans

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=f"u{i:03d}" + boiler * 4 + f"tail{i % 7}")
            for i in range(200)
        ]
    )

    def spans(**kw):
        return sorted(
            (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_anchors)
            for r in exact_substring_spans(docs, **kw).collect()
        )

    wide = spans(route="wide")
    bcast = spans(route="broadcast")
    plain = spans(route="wide", hash_prefilter=False)
    auto = spans()  # must route to broadcast and still match
    assert wide == bcast == plain == auto
    assert len(wide) > 0


def test_semdedup_three_level_tree(spark):
    """The r10 three-level seed tree: (a) assignment stays TOTAL (one
    verdict per vector; every cluster id is a fine seed); (b) PRECISION
    is exactly 1 at any depth — every dropped vector's dup_of is a
    smaller-id same-cluster neighbor at exact cosine >= threshold (the
    final filter is exact, so deeper trees can only change RECALL);
    (c) keep/drop verdicts agree with the two-level tree on the vast
    majority of the harness embeddings (the boundary-straddle loss is
    bounded, mirroring the SN-blocking measured-recall doctrine)."""
    from pyspark.sql import functions as F

    from genpipe_spark.operators.similarity import as_double, semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    tau = 0.35
    out = {}
    for lv in (2, 3):
        rows = semdedup(emb, k_clusters=32, threshold=tau, levels=lv).collect()
        assert len(rows) == emb.count()
        assert all(r.cluster is not None and 0 <= r.cluster < 32 for r in rows)
        out[lv] = rows

    # (b) soundness of every 3-level drop: exact cosine >= tau and the
    # shadowing neighbor is a smaller id in the same cluster
    byid = {r.id: r for r in out[3]}
    vecs = {
        r.vec_id: list(r.v)
        for r in emb.select(
            "vec_id", as_double(F.col("embedding")).alias("v")
        ).collect()
    }
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    drops = [r for r in out[3] if r.is_dup == 1]
    assert drops, "fixture probe: no drops at all"
    for r in drops:
        assert r.dup_of < r.id
        assert byid[r.dup_of].cluster == r.cluster
        assert cos(vecs[r.id], vecs[r.dup_of]) >= tau - 1e-9

    # (c) agreement floor between depths
    v2 = {r.id: r.is_dup for r in out[2]}
    v3 = {r.id: r.is_dup for r in out[3]}
    agree = sum(1 for i in v2 if v2[i] == v3[i]) / len(v2)
    assert agree >= 0.9, f"level-2/3 verdict agreement {agree:.3f}"


def test_cdc_chunks_shift_robust(spark):
    """The CDC property: prepending one character to a document leaves
    every boundary after the first re-synchronized chunk in place —
    most chunk hashes survive, so the shifted copy still registers as
    massively duplicated against the original. (A fixed-width chunker
    loses EVERY block hash under a 1-char shift.)"""
    from pyspark.sql import Row

    from genpipe_spark.operators.dedup import cdc_chunk_stats

    # varied, non-periodic content: hash-derived words
    words = [f"w{(k * 2654435761) % 97:02d}x{k % 13}" for k in range(300)]
    base = " ".join(words)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text="Z" + base)]
    )
    r = {x.doc_id: x for x in cdc_chunk_stats(docs).collect()}
    assert r[1].n_chunks > 5, "fixture probe: content must chunk"
    # nearly all of both docs' characters sit in shared chunks
    for d in (1, 2):
        frac = r[d].dup_chars / r[d].total_chars
        assert frac >= 0.8, f"doc {d} dup fraction {frac:.2f}"


def test_fasttext_score_model(spark):
    """hashed_linear_score == the literal python model on a hand corpus
    (unigram+bigram 31-fold features, mod-4096 buckets, pinned
    multiplicative weight table)."""
    from pyspark.sql import Row

    from genpipe_spark.operators.text import hashed_linear_score

    M31 = 2147483647

    def wh(w):
        a = 7
        for c in w:
            a = (a * 31 + ord(c)) % M31
        return a

    def score(text):
        ws = [w for w in text.lower().split() if w]
        hs = [wh(w) for w in ws]
        feats = hs + [
            (hs[i] * 1000003 + hs[i + 1] * 9176 + 12345) % M31
            for i in range(len(hs) - 1)
        ]
        s = 0
        for f in feats:
            b = f % 4096
            s += (b * 2654435761 + 987654321) % M31 % 1000001 - 500000
        return len(feats), s

    rows = [
        Row(doc_id=1, text="The quick brown Fox"),
        Row(doc_id=2, text="one"),
        Row(doc_id=3, text="  "),
        Row(doc_id=4, text="spark spark spark"),
    ]
    out = {
        r.doc_id: r
        for r in hashed_linear_score(spark.createDataFrame(rows)).collect()
    }
    for r in rows:
        nf, s = score(r.text)
        got = out[r.doc_id]
        assert (got.n_feat, got.score_sum) == (nf, s), r.text
        assert got.decision == (1 if s > 0 else 0)
        if nf:
            assert got.mean_micro == (s * 1_000_000) // nf
        else:
            assert got.mean_micro is None


def test_capped_apportion_matches_iterative_model(spark):
    """capped_apportion's closed-form water-filling threshold == the
    literal iterate-until-fixpoint model (cap, redistribute, repeat) +
    Hamilton rounding, across weight shapes that exercise 0, some, and
    max-feasible capped groups; sum(alloc) == seats exactly; the
    infeasible policy raises."""
    import pytest
    from pyspark.sql import Row

    from genpipe_spark.operators.alloc import capped_apportion

    def model(ws, seats, cap):
        # fixpoint: repeatedly cap groups whose exact share exceeds cap
        keys = sorted(ws)
        capped = set()
        while True:
            rest = [k for k in keys if k not in capped]
            R = seats - cap * len(capped)
            W = sum(ws[k] for k in rest)
            newly = {k for k in rest if W and ws[k] * R > cap * W}
            if not newly:
                break
            capped |= newly
        alloc = {k: cap for k in capped}
        rest = [k for k in keys if k not in capped]
        R = seats - cap * len(capped)
        W = sum(ws[k] for k in rest)
        if W:
            base = {k: (R * ws[k]) // W for k in rest}
            order = sorted(rest, key=lambda k: (-((R * ws[k]) % W), k))
        else:
            # Wr == 0 fallback: spread R evenly by key order.
            base = {k: (R // len(rest) if rest else 0) for k in rest}
            order = sorted(rest)
        left = R - sum(base.values())
        for k in order[:left]:
            base[k] += 1
        alloc.update(base)
        return alloc

    cases = [
        ({"a": 10, "b": 10, "c": 10, "d": 10}, 100, 40),     # none capped
        ({"a": 90, "b": 5, "c": 3, "d": 2}, 100, 30),        # one capped
        ({"a": 50, "b": 40, "c": 9, "d": 1}, 100, 26),       # two capped
        ({"a": 7, "b": 7, "c": 7, "d": 7, "e": 1}, 100, 21), # near-uniform
        # ADVICE r10: all positive-weight groups capped, zero-weight
        # tail left with R > 0 seats — Wr == 0 must not divide by zero;
        # seats spread evenly by key order among the zero-weight groups.
        ({"a": 100, "b": 0, "c": 0, "d": 0, "e": 0}, 10, 3),
        ({"a": 9, "b": 0, "c": 0}, 9, 4),                    # Wr=0, uneven
    ]
    for ws, seats, cap in cases:
        wdf = spark.createDataFrame([Row(k=k, w=v) for k, v in ws.items()])
        got = {
            r.k: r.alloc
            for r in capped_apportion(wdf, ["k"], "w", seats, cap).collect()
        }
        want = model(ws, seats, cap)
        assert got == want, (ws, seats, cap, got, want)
        assert sum(got.values()) == seats

    with pytest.raises(ValueError, match="infeasible"):
        capped_apportion(
            spark.createDataFrame([Row(k="a", w=1), Row(k="b", w=1)]),
            ["k"], "w", seats=100, cap=10,
        )


def test_fasttext_trained_scorer_separates_label(spark):
    """AUC certification for text-fasttext-train (VERDICT r10 #1): the
    LEARNED hashed-linear scorer must separate the y = (lang = 'en')
    label IN-SAMPLE — Mann-Whitney AUC >= 0.70 on the sf0.001 fixture
    (measured 0.733; fit/optimizer certification — generalization is
    measured separately by the holdout entries, near chance on this
    weak-signal fixture) — and must beat the SYNTHETIC pinned-
    weight scorer (hashed_linear_score) on the same label by a wide
    margin: the synthetic table is label-blind, so its AUC is ~0.5.
    This is the 'trained for real, not fake' gate."""
    from genpipe_spark.queries.llmdata import text_fasttext_train
    from genpipe_spark.operators.text import hashed_linear_score
    from genpipe_spark.tables import load

    sf = "/root/testdata/sf0.001"

    def auc(pairs):  # exact Mann-Whitney with average ranks
        pairs = sorted(pairs)  # by score
        n = len(pairs)
        ranks = {}
        i = 0
        while i < n:
            j = i
            while j < n and pairs[j][0] == pairs[i][0]:
                j += 1
            r = (i + 1 + j) / 2  # average rank of the tie run
            for k in range(i, j):
                ranks[k] = r
            i = j
        n1 = sum(1 for _, y in pairs if y == 1)
        n2 = n - n1
        r1 = sum(ranks[k] for k, (_, y) in enumerate(pairs) if y == 1)
        return (r1 - n1 * (n1 + 1) / 2) / (n1 * n2)

    trained = [
        (r.score_micro, r.y)
        for r in text_fasttext_train(spark, sf).collect()
    ]
    auc_trained = auc(trained)
    docs = load(spark, sf, "documents")
    lbl = {
        r.doc_id: (1 if r.lang == "en" else 0)
        for r in docs.select("doc_id", "lang").collect()
    }
    synth = [
        (r.mean_micro, lbl[r.doc_id])
        for r in hashed_linear_score(docs).collect()
        if r.mean_micro is not None
    ]
    auc_synth = auc(synth)
    assert auc_trained >= 0.70, f"trained AUC {auc_trained:.4f} < 0.70"
    assert auc_trained > auc_synth + 0.15, (
        f"trained {auc_trained:.4f} does not clearly beat synthetic "
        f"{auc_synth:.4f}"
    )


def test_embedding_linear_probe_separates_label(spark):
    """AUC certification for embedding-linear-probe: the in-engine
    dense GD must separate the one-vs-rest label IN-SAMPLE —
    Mann-Whitney AUC >= 0.72 on the sf0.001 embeddings (measured
    0.767; fit/optimizer certification — generalization is measured
    by embedding-probe-holdout, near chance on this fixture's
    signal-free labels) — and the probe must raise loudly on an
    empty corpus."""
    import pytest

    from genpipe_spark.operators.similarity import embedding_linear_probe
    from genpipe_spark.tables import load

    rows = embedding_linear_probe(
        load(spark, "/root/testdata/sf0.001", "embeddings")
    ).collect()
    pairs = sorted((r.score_micro, r.y) for r in rows)
    n = len(pairs)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and pairs[j][0] == pairs[i][0]:
            j += 1
        for k in range(i, j):
            ranks[k] = (i + 1 + j) / 2
        i = j
    n1 = sum(1 for _, y in pairs if y == 1)
    r1 = sum(ranks[k] for k, (_, y) in enumerate(pairs) if y == 1)
    auc = (r1 - n1 * (n1 + 1) / 2) / (n1 * (n - n1))
    assert auc >= 0.72, f"probe AUC {auc:.4f} < 0.72"
    with pytest.raises(ValueError, match="empty"):
        embedding_linear_probe(
            load(spark, "/root/testdata/sf0.001", "embeddings").limit(0)
        )


def test_probe_loss_curve_strictly_decreases(spark):
    """embedding-probe-loss-curve: GD must DESCEND — SSE strictly
    decreases every round on the fixture, and SSE_0 equals the
    zero-model baseline 1e12 * n_positives exactly."""
    from genpipe_spark.operators.similarity import (
        embedding_probe_loss_curve,
    )
    from genpipe_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    curve = {
        r.iter: r.sse for r in embedding_probe_loss_curve(emb).collect()
    }
    n_pos = emb.where("label = 1").count()
    assert curve[0] == n_pos * 1_000_000_000_000
    for t in range(1, 9):
        assert curve[t] < curve[t - 1], (
            f"loss not decreasing at round {t}: "
            f"{curve[t-1]} -> {curve[t]}"
        )


def test_probe_calibration_separates_deciles(spark):
    """embedding-probe-calibration: the reliability table must show
    real score->label calibration — the top score decile's positive
    rate exceeds the bottom decile's by a wide margin, and bins
    partition the corpus exactly."""
    from genpipe_spark.queries.llmdata import embedding_probe_calibration

    rows = {
        r.bin: r
        for r in embedding_probe_calibration(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == set(range(10))
    total = sum(r.n for r in rows.values())
    assert total == 500
    assert rows[9].pos_rate_micro - rows[0].pos_rate_micro >= 250_000, (
        rows[0], rows[9]
    )
    assert rows[9].mean_score_micro > rows[0].mean_score_micro


def test_multiclass_probe_beats_chance(spark):
    """embedding-probe-multiclass: 10-class accuracy from the
    confusion matrix must far exceed 0.1 chance (measured 0.406 at
    sf0.001, gated >= 0.35), the matrix must partition the corpus,
    and every pred must be a valid class."""
    from genpipe_spark.queries.llmdata import embedding_probe_multiclass

    rows = embedding_probe_multiclass(
        spark, "/root/testdata/sf0.001"
    ).collect()
    total = sum(r.n for r in rows)
    diag = sum(r.n for r in rows if r.label == r.pred)
    assert total == 500
    assert all(0 <= r.pred <= 9 for r in rows)
    assert diag / total >= 0.35, f"accuracy {diag/total:.3f} < 0.35"


def _mw_auc(pairs):
    """Exact Mann-Whitney AUC with average ranks over (score, y)."""
    pairs = sorted(pairs)
    n = len(pairs)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and pairs[j][0] == pairs[i][0]:
            j += 1
        for k in range(i, j):
            ranks[k] = (i + 1 + j) / 2
        i = j
    n1 = sum(1 for _, y in pairs if y == 1)
    r1 = sum(ranks[k] for k, (_, y) in enumerate(pairs) if y == 1)
    return (r1 - n1 * (n1 + 1) / 2) / (n1 * (n - n1))


def test_probe_generalization_gap_is_measured(spark):
    """The holdout entries pin the HONEST story: on this synthetic
    fixture both trained classifiers separate IN-SAMPLE but NOT on the
    held-out fifth (labels carry little generalizable signal) — the
    train/test harness must report that, not hide it. Gates: held-out
    AUC stays near chance (< 0.68) while the in-sample AUC certified
    elsewhere is >= 0.70 — i.e. the generalization gap is real and
    measured. A fixture change that introduces true signal flips this
    loudly (update the docstrings then)."""
    from genpipe_spark.queries.llmdata import (
        embedding_probe_holdout,
        text_fasttext_holdout,
    )

    sf = "/root/testdata/sf0.001"
    ft = [
        (r.score_micro, r.y) for r in text_fasttext_holdout(spark, sf).collect()
    ]
    pr = [
        (r.score_micro, r.y)
        for r in embedding_probe_holdout(spark, sf).collect()
    ]
    auc_ft, auc_pr = _mw_auc(ft), _mw_auc(pr)
    assert 0.30 <= auc_ft < 0.68, f"fasttext held-out AUC {auc_ft:.4f}"
    assert 0.30 <= auc_pr < 0.68, f"probe held-out AUC {auc_pr:.4f}"


def test_planted_signal_holdout_auc_is_real(spark):
    """VERDICT r11 #4 'done' gate: with a PLANTED recoverable linear
    signal (y = sign(w* . q) + 10% deterministic flips), the trained
    probe must score the held-out fifth at AUC >= 0.7 — held-out AUC
    becomes a real acceptance gate for the LEARNER, not just an
    honesty disclosure. A trainer that silently stops learning (zero
    gradients, sign bug, mis-wired features) lands near 0.5 and fails
    here. Also probes the fixture itself: both classes must be
    materially present in the held-out split (the r9
    probe-before-trusting-PASS rule)."""
    from genpipe_spark.queries.llmdata import embedding_probe_planted

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = embedding_probe_planted(spark, sf).collect()
        n_pos = sum(1 for r in rows if r.y == 1)
        assert 0.2 <= n_pos / len(rows) <= 0.8, (
            f"degenerate planted labels at {sf}: {n_pos}/{len(rows)}"
        )
        auc = _mw_auc([(r.score_micro, r.y) for r in rows])
        assert auc >= 0.70, f"planted held-out AUC {auc:.4f} at {sf}"


def test_planted_signal_fasttext_holdout_auc_is_real(spark):
    """The text twin of the planted-signal gate (VERDICT r11 #4 + #6):
    the subword-featured fastText trainer must recover the planted
    per-bucket linear signal and score the held-out fifth at AUC >=
    0.7 (measured 0.78/0.76 at sf0.001/sf0.01) — paired with
    text-fasttext-holdout's ~0.53 on the native labels, this pins
    that the trainer learns when and only when signal exists."""
    from genpipe_spark.queries.llmdata import text_fasttext_planted

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = text_fasttext_planted(spark, sf).collect()
        n_pos = sum(1 for r in rows if r.y == 1)
        assert 0.2 <= n_pos / len(rows) <= 0.8, (
            f"degenerate planted labels at {sf}: {n_pos}/{len(rows)}"
        )
        auc = _mw_auc([(r.score_micro, r.y) for r in rows])
        assert auc >= 0.70, f"planted held-out AUC {auc:.4f} at {sf}"
