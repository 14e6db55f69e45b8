"""Fuzzy string matching: edit-distance self-join without all-pairs.

Near-identical entity names (suppliers, titles, product labels) are the
classic record-linkage problem; the naive formulation is an O(n²)
cartesian Levenshtein. This operator applies the repo's interval-join
banding idea to the LENGTH dimension: two strings within edit distance
d differ in length by at most d, so with bands of width w = d+1 any
matchable pair sits at most ONE band apart. The left side keeps its own
band; the right side replicates into {band-1, band, band+1}; the join
is a plain equi-join on the band — EXACT recall (no LSH-style misses),
3× replication of one side, and Levenshtein runs only on
length-compatible candidates.

Skew caveat (documented, not hidden): banding collapses when every
string has the same length (fixed-format keys like 'Supplier#0000001'
— one band holds everything). For such domains pass ``blocking_col``
(e.g. a prefix or category) to add an exact equi-key to the bucket;
that trades recall for boundedness exactly like LSH banding and is the
caller's explicit, visible choice.

Output-bound caveat: on domains drawn from a small vocabulary (the
part-name fixture combines a fixed color list) the TRUE pair count
grows near-quadratically with data size — that is a property of the
exact answer, not of this plan; the knobs above (tighter max_dist,
blocking_col) bound the answer itself when the domain clusters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    blocking_col: str | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with levenshtein(text_a, text_b) <= max_dist:
    ``id_a, id_b, dist``. Exact (length-band replication, see module
    docstring) unless ``blocking_col`` narrows candidates.

    PRECONDITION (r9 doctrine audit): ``id_col`` is the pair identity
    and must be unique per logical entity — duplicated input rows emit
    the pair once per copy-combination (join multiplicity, k*m rows),
    and one id carrying two different texts is ambiguous by
    construction. Callers wanting set semantics ``distinct()`` first.
    The band join itself cannot duplicate a pair: each (a, b) meets in
    exactly one band, b's replicated cell equal to a's own band."""
    if max_dist < 1:
        raise ValueError("edit_distance_pairs: max_dist must be >= 1")
    w = max_dist + 1
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.length(text_col).alias("__len"),
        (F.length(text_col) / w).cast("int").alias("__band"),
        *([F.col(blocking_col).alias("__blk")] if blocking_col else []),
    ).where(F.col("__t").isNotNull())
    left = base.select(
        F.col("__id").alias("id_a"),
        F.col("__t").alias("ta"),
        F.col("__len").alias("la"),
        F.col("__band").alias("band"),
        *([F.col("__blk").alias("blk")] if blocking_col else []),
    )
    right = base.select(
        F.col("__id").alias("id_b"),
        F.col("__t").alias("tb"),
        F.col("__len").alias("lb"),
        F.explode(
            F.array(F.col("__band") - 1, F.col("__band"), F.col("__band") + 1)
        ).alias("band"),
        *([F.col("__blk").alias("blk")] if blocking_col else []),
    )
    on = ["band"] + (["blk"] if blocking_col else [])
    dist = F.levenshtein(F.col("ta"), F.col("tb"))
    return (
        left.join(right, on)
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("la") - F.col("lb")) <= max_dist)
            & (dist <= max_dist)
        )
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
    )


def fellegi_sunter_score(
    pairs: DataFrame,
    fields: Sequence[dict],
    out_col: str = "score_nano",
) -> DataFrame:
    """Fellegi-Sunter (1969) probabilistic record-linkage scoring over
    pre-blocked candidate pairs — the log-likelihood-ratio weight sum

        score = sum_i  agree_i ? ln(m_i/u_i) : ln((1-m_i)/(1-u_i))

    computed ENTIRELY in nano-quantized integers (the FIXTURES libm
    rule: every ln is nano-rounded once, all composition is int64).
    Each entry of ``fields`` describes one comparison:

      {"agree":        Column<boolean>   (the field-agreement predicate),
       "ln_m_nano":    int               (pinned prior: round(ln(m)*1e9)),
       "ln_1m_nano":   int               (round(ln(1-m)*1e9)),
       "ln_u_nano":    Column<bigint>    (data-estimated: see below),
       "ln_1u_nano":   Column<bigint>}

    m_i (P(agree | same entity)) is a PINNED prior — estimating it
    needs labeled matches or EM, both out of declarative scope; u_i
    (P(agree | different entities)) is estimated from the field's
    value distribution as sum_v n_v^2 / N^2 (the birthday collision
    probability), whose ln decomposes into nano-rounded integer parts:
    ln_u_nano = round(ln(sum n_v^2)*1e9) - 2*round(ln(N)*1e9). Callers
    build those from one tiny per-field agg and crossJoin the 1-row
    frame onto the pairs (broadcast, zero shuffle).

    Appends ``out_col`` (bigint, nanonats). Scale: pure map-side
    column arithmetic over however many pairs the caller's BLOCKING
    admits — the pair explosion is the blocking strategy's problem
    (sorted-neighborhood / LSH for the 100 TB case), not the scorer's.
    """
    score = F.lit(0).cast("long")
    for f in fields:
        agree = f["agree"]
        w_agree = F.lit(int(f["ln_m_nano"])).cast("long") - f["ln_u_nano"]
        w_dis = F.lit(int(f["ln_1m_nano"])).cast("long") - f["ln_1u_nano"]
        score = score + F.when(agree, w_agree).otherwise(w_dis)
    return pairs.withColumn(out_col, score)
