"""Edge-case behavior of the round-5 session-3 operators: line_dedup
(both modes), scd2_history (delete/reopen/collapse), and the anomaly
pair (warmup NULLs, zero-variance windows, EWMA exactness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.operators.anomaly import ewma_micro_cents, rolling_zscore_flags
from genpipe_spark.operators.cdc import scd2_history
from genpipe_spark.operators.dedup import explode_lines, line_dedup


def _lines(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return explode_lines(df, "doc_id", "text", delim="\n")


def test_line_dedup_drop_common_drops_every_occurrence(spark):
    lines = _lines(
        spark,
        [
            (1, "boiler\nunique-a"),
            (2, "boiler\nunique-b"),
            (3, "boiler\nunique-c"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(lines, mode="drop_common", min_docs=3).collect()
    }
    assert out[1]["text"] == "unique-a" and out[1]["n_kept"] == 1
    assert out[2]["n_lines"] == 2
    # below the min_docs bar nothing is dropped
    kept_all = line_dedup(lines, mode="drop_common", min_docs=4).collect()
    assert all(r["n_kept"] == r["n_lines"] for r in kept_all)


def test_line_dedup_fully_dropped_doc_survives_empty(spark):
    lines = _lines(spark, [(1, "x"), (2, "x"), (3, "x\ny")])
    out = {
        r["doc_id"]: r
        for r in line_dedup(lines, mode="drop_common", min_docs=2).collect()
    }
    assert out[1]["text"] == "" and out[1]["n_kept"] == 0 and out[1]["n_lines"] == 1
    assert out[3]["text"] == "y"


def test_line_dedup_keep_first_keeps_global_min_occurrence(spark):
    lines = _lines(spark, [(2, "dup\nsolo2"), (1, "solo1\ndup"), (3, "dup")])
    out = {r["doc_id"]: r for r in line_dedup(lines, mode="keep_first").collect()}
    # global first occurrence of "dup" is (doc 1, line 1) — docs 2, 3 lose it
    assert out[1]["text"] == "solo1\ndup"
    assert out[2]["text"] == "solo2"
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0


def test_line_dedup_rejects_unknown_mode(spark):
    import pytest

    lines = _lines(spark, [(1, "a")])
    with pytest.raises(ValueError):
        line_dedup(lines, mode="nope")


def test_scd2_collapse_delete_reopen(spark):
    # key 1: v=A, A (collapse), B, DELETE, A (reopen — must NOT collapse
    # with the pre-delete A), key 2: single open version
    rows = [
        (1, 10, "A", "U"),
        (1, 20, "A", "U"),
        (1, 30, "B", "U"),
        (1, 40, "-", "D"),
        (1, 50, "B", "U"),
        (2, 15, "Z", "U"),
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "attr", "op"])
    hist = {
        (r["k"], r["version"]): r
        for r in scd2_history(df, ["k"], "seq", ["attr"], op_col="op").collect()
    }
    assert len(hist) == 4
    v1 = hist[(1, 1)]
    assert (v1["attr"], v1["valid_from"], v1["valid_to"], v1["is_current"]) == (
        "A", 10, 30, False,
    )  # the seq-20 no-op collapsed into it
    v2 = hist[(1, 2)]
    assert (v2["valid_from"], v2["valid_to"], v2["is_current"]) == (30, 40, False)
    v3 = hist[(1, 3)]  # reopened AFTER the delete, same attrs as v2
    assert (v3["attr"], v3["valid_from"], v3["valid_to"], v3["is_current"]) == (
        "B", 50, None, True,
    )
    assert hist[(2, 1)]["is_current"] is True


def test_scd2_no_op_col_means_pure_versioning(spark):
    df = spark.createDataFrame([(1, 1, "A"), (1, 2, "B")], ["k", "seq", "attr"])
    out = scd2_history(df, ["k"], "seq", ["attr"]).collect()
    assert [r["version"] for r in sorted(out, key=lambda r: r["valid_from"])] == [1, 2]


def test_zscore_warmup_and_zero_variance(spark):
    # constant series then one deviation: windows below min_obs are NULL,
    # the deviating point against a zero-variance baseline flags
    rows = [(1, i, 100) for i in range(1, 8)] + [(1, 8, 101)]
    df = spark.createDataFrame(rows, ["k", "seq", "xc"])
    out = {
        r["seq"]: r
        for r in rolling_zscore_flags(
            df, ["k"], ["seq"], F.col("xc"), window_rows=50, min_obs=5
        ).collect()
    }
    assert out[1]["is_anomaly"] is None and out[5]["is_anomaly"] is None
    assert out[6]["is_anomaly"] is False  # enough obs, no deviation
    assert out[8]["is_anomaly"] is True  # +1 cent vs zero-variance baseline


def test_ewma_exact_values(spark):
    # two points: e_1 = x_1; e_2 = (2^16*x_2 + 2^15*x_1) / (2^17 - 2^15)
    df = spark.createDataFrame([(1, 1, 100), (1, 2, 200)], ["k", "seq", "xc"])
    out = {
        r["seq"]: r["ewma_micro_cents"]
        for r in ewma_micro_cents(df, ["k"], ["seq"], F.col("xc")).collect()
    }
    assert out[1] == 100_000_000  # exactly x_1 in micro-cents
    num = (200 * (1 << 16) + 100 * (1 << 15)) * 1_000_000
    assert out[2] == num // ((1 << 17) - (1 << 15))


def test_explode_lines_literal_delimiter(spark):
    # regex metacharacters in delim must be treated literally
    df = spark.createDataFrame([(1, "a|b|c")], ["doc_id", "text"])
    out = explode_lines(df, delim="|").collect()
    assert [r["line"] for r in sorted(out, key=lambda r: r["line_no"])] == ["a", "b", "c"]
    import pytest

    with pytest.raises(ValueError):
        explode_lines(df, delim="x\\Ey")


def test_token_chunks_empty_doc_yields_no_rows(spark):
    # F.sequence(0, -1) walks DOWNWARD — a zero-token doc must produce
    # an empty chunk array, not phantom [0, -1] rows (DuckDB range(0,0)
    # is empty; parity would break)
    from genpipe_spark.queries.llmdata import _token_chunk_structs

    df = spark.createDataFrame([(1, "   "), (2, "a b c d")], ["doc_id", "text"])
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    out = df.select(
        "doc_id", F.size(_token_chunk_structs(ws, 3)).alias("n")
    ).collect()
    got = {r["doc_id"]: r["n"] for r in out}
    assert got == {1: 0, 2: 2}


def test_anomaly_rejects_column_collisions(spark):
    import pytest

    df = spark.createDataFrame([(1, 1, 5, 9)], ["k", "seq", "xc", "n_win"])
    with pytest.raises(ValueError, match="collide"):
        rolling_zscore_flags(df, ["k"], ["seq"], F.col("xc"))
    df2 = spark.createDataFrame([(1, 1, 5)], ["k", "seq", "ewma_micro_cents"])
    with pytest.raises(ValueError, match="collide"):
        ewma_micro_cents(df2, ["k"], ["seq"], F.col("ewma_micro_cents"))


def test_duplicated_spans_finds_known_span(spark):
    from genpipe_spark.operators.dedup import duplicated_spans

    # docs 1 & 2 share the 7-token run "q w e r t y u"; doc 3 is disjoint
    docs = [
        (1, "a b q w e r t y u c d"),
        (2, "x q w e r t y u z z z"),
        (3, "m n o p m n o p m n o"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = duplicated_spans(df, min_span_tokens=6).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"], r["max_span_tokens"]) == (1, 2, 7)
    assert r["n_spans"] == 1 and r["dup_tokens_a"] == 7
    # longest span starts at shingle position 3 in doc 1 ("q" is token 3)
    assert r["longest_start_a"] == 3


def test_duplicated_spans_hot_shingle_cap(spark):
    from genpipe_spark.operators.dedup import duplicated_spans

    # the same 6-token phrase in every doc: with max_doc_freq=2 all its
    # shingles are dropped as boilerplate-hot, so no pair survives
    docs = [(i, "s1 s2 s3 s4 s5 s6") for i in range(1, 5)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    assert duplicated_spans(df, min_span_tokens=6).count() == 6  # all pairs
    assert duplicated_spans(df, min_span_tokens=6, max_doc_freq=2).count() == 0


def test_duplicated_spans_short_and_empty_docs(spark):
    # regression: sequence(1, 0) walks DOWNWARD — docs with < 3 words
    # must yield zero shingles, not an INVALID_INDEX_OF_ZERO crash
    from genpipe_spark.operators.dedup import duplicated_spans

    docs = [(1, "hi there"), (2, ""), (3, "a b c d e f g"), (4, "a b c d e f g")]
    out = duplicated_spans(
        spark.createDataFrame(docs, ["doc_id", "text"]), min_span_tokens=6
    ).collect()
    assert [(r["id_a"], r["id_b"], r["max_span_tokens"]) for r in out] == [(3, 4, 7)]


def test_duplicated_spans_union_bounded_on_periodic_text(spark):
    # overlapping spans on many diagonals must merge: dup_tokens_a can
    # never exceed the doc's token count
    from genpipe_spark.operators.dedup import duplicated_spans

    rep = [(1, " ".join(["w"] * 12)), (2, " ".join(["w"] * 12))]
    r = duplicated_spans(
        spark.createDataFrame(rep, ["doc_id", "text"]),
        min_span_tokens=6, max_pos_freq=None,
    ).collect()[0]
    assert r["dup_tokens_a"] == 12  # the whole doc, once — not 114
    # and the default within-doc repetition cap drops the degenerate
    # shingle entirely
    assert duplicated_spans(
        spark.createDataFrame(rep, ["doc_id", "text"]),
        min_span_tokens=6, max_pos_freq=5,
    ).count() == 0


def test_hilbert_curve_properties(spark):
    """bits=3 full 8x8 grid: the Hilbert index is a bijection onto
    [0, 64) and CONSECUTIVE indexes are always 1-cell neighbors — the
    locality property that distinguishes it from z-order (whose seams
    jump across the space)."""
    from genpipe_spark.operators.layout import hilbert_index_pandas

    grid = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], ["hx", "hy"]
    )
    rows = hilbert_index_pandas(grid, "hx", "hy", bits=3).collect()
    by_d = {r["hilbert_d"]: (r["hx"], r["hy"]) for r in rows}
    assert sorted(by_d) == list(range(64))  # bijection
    for d in range(63):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


def test_hilbert_rejects_out_of_range_cells(spark):
    """The xy2d rotation is only a bijection on [0, 2^bits)^2 — an
    unquantized coordinate must raise, not silently produce a garbage
    index (ADVICE r5)."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from genpipe_spark.operators.layout import hilbert_index_pandas

    bad = spark.createDataFrame([(9, 1), (0, 0)], ["hx", "hy"])
    with pytest.raises(PythonException, match="must be in"):
        hilbert_index_pandas(bad, "hx", "hy", bits=3).collect()


def test_hilbert_nd_curve_properties(spark):
    """3-D bits=2 full 4x4x4 grid through the Skilling-transform
    operator: bijection onto [0, 64) and consecutive indexes are
    1-cell neighbors in exactly one axis — the defining invariants of
    a Hilbert curve, in any dimension (VERDICT r5 item 8)."""
    from genpipe_spark.operators.layout import hilbert_index_nd_pandas

    grid = spark.createDataFrame(
        [(x, y, z) for x in range(4) for y in range(4) for z in range(4)],
        ["cx", "cy", "cz"],
    )
    rows = hilbert_index_nd_pandas(grid, ["cx", "cy", "cz"], bits=2).collect()
    by_d = {r["hilbert_d"]: (r["cx"], r["cy"], r["cz"]) for r in rows}
    assert sorted(by_d) == list(range(64))  # bijection
    for d in range(63):
        a, b = by_d[d], by_d[d + 1]
        assert sum(abs(i - j) for i, j in zip(a, b)) == 1, (d, a, b)
