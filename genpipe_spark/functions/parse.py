"""Parse-layer scalar functions (SURVEY.md §2.6) as Spark column
expressions — JVM-side, codegen-friendly; zero Python on the hot path.

The reference implements these as Scala row-at-a-time functions inside
``flatMap``; each builder here reproduces the exact semantics (including
deliberate quirks) as a ``Column`` expression. Cites are to
/root/reference source for parity checking.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def str_to_map_expr(col: Column) -> Column:
    """`;`-separated `k=v` INFO string → map (toMap,
    steps/toSample.scala:11-13). Entries without '=' map to null value
    (the reference drops them; callers only probe known keys, where the
    two behaviors agree)."""
    return F.str_to_map(col, F.lit(";"), F.lit("="))


def truncate_at(col: Column, p: int) -> Column:
    """floor-based decimal truncation, deliberately not rounding
    (truncateAt, steps/Parser.scala:81-85)."""
    s = float(10**p)
    return F.floor(col * F.lit(s)) / F.lit(s)


def removedot(col: Column) -> Column:
    """"." or "" → 0.0, else truncate at 4 decimals.

    Quirk preserved: the reference's ``removedot(value, precision)``
    *ignores* the precision argument and always truncates at 4
    (steps/Parser.scala:74-80) — so CADD's ``removedot(x, 0)`` is still
    a 4-decimal truncation."""
    return F.when(col.isin(".", "") | col.isNull(), F.lit(0.0)).otherwise(
        truncate_at(col.cast("double"), 4)
    )


def gq_bands(gq: Column) -> Column:
    """Bucket genotype quality into bands [0,20,25,30,35,40,45,50,70,90,99]
    (gqBands, steps/toSample.scala:15-30)."""
    bands = [20, 25, 30, 35, 40, 45, 50, 70, 90, 99]
    expr = F.lit(99)
    # build the when-chain from the top band down; below 20 → 0
    expr = F.when(gq < 20, F.lit(0))
    for lo, hi in zip(bands[:-1], bands[1:]):
        expr = expr.when((gq >= lo) & (gq < hi), F.lit(lo))
    return expr.otherwise(F.lit(99))


def format_dispatch(format_col: Column, sample_col: Column) -> Column:
    """Dispatch on the FORMAT string (5 known layouts) to extract
    ``struct(gt, dp, gq, pl, ad)`` from the `:`-separated sample field;
    unknown layouts → defaults (formatCase, steps/toSample.scala:32-45).

    Note the first layout runs gq through gq_bands and takes MIN_DP as dp,
    exactly as the reference does."""
    from genpipe_spark.operators.hof import bind

    def dispatch(sa: Column) -> Column:
        def g(i: int) -> Column:  # 0-based accessor, matching sA(i)
            return F.coalesce(F.try_element_at(sa, F.lit(i + 1)), F.lit(""))

        return _dispatch_cases(format_col, g)

    # bind: each branch plucks several fields from the same split
    return bind(F.split(sample_col, ":"), dispatch)


def _dispatch_cases(format_col: Column, g) -> Column:
    def mk(gt, dp, gq, pl, ad) -> Column:
        return F.struct(
            gt.alias("gt"),
            dp.cast("int").alias("dp"),
            gq.cast("int").alias("gq"),
            pl.alias("pl"),
            ad.alias("ad"),
        )

    itrim = lambda c: F.trim(c).cast("int")  # noqa: E731
    return (
        F.when(
            format_col == "GT:DP:GQ:MIN_DP:PL",
            mk(g(0), itrim(g(3)), gq_bands(itrim(g(2))), g(4), F.lit("")),
        )
        .when(format_col == "GT:GQ:PL:SB", mk(g(0), F.lit(0), itrim(g(1)), g(2), F.lit("")))
        .when(
            format_col == "GT:AD:DP:GQ:PGT:PID:PL:SB",
            mk(g(0), itrim(g(2)), itrim(g(3)), g(6), g(1)),
        )
        .when(
            format_col == "GT:GQ:PGT:PID:PL:SB",
            mk(g(0), F.lit(0), F.lit(0), F.lit(""), F.lit("")),
        )
        .when(
            format_col == "GT:AD:DP:GQ:PL:SB",
            mk(g(0), itrim(g(2)), itrim(g(3)), g(4), g(1)),
        )
        .otherwise(mk(F.lit("0/0"), F.lit(0), F.lit(0), F.lit(""), F.lit("")))
    )


def ad_ratio(ad: Column, gt: Column) -> Column:
    """Alt-allele depth ratio: ``ad[gt_alt_index] / sum(ad)`` truncated at 3
    decimals, returned as string; "" passes through
    (ADsplit, steps/toSample.scala:51-59)."""
    arr = F.split(ad, ",")
    total = F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))
    # Scala adArray(gt.split("/")(1).toInt) is 0-based → element_at is 1-based
    alt_idx = F.try_element_at(F.split(gt, "/"), F.lit(2)).cast("int") + F.lit(1)
    # try_divide: all-zero depth (total=0) yields null rather than an ANSI
    # divide-by-zero error (the reference's Scala silently produced NaN)
    ratio = F.try_divide(F.try_element_at(arr, alt_idx).cast("double"), total.cast("double"))
    return F.when(ad == "", ad).otherwise(truncate_at(ratio, 3).cast("string"))


def end_pos(alt: Column, info: Column, pos: Column) -> Column:
    """``end_pos`` = INFO END for `<NON_REF>` reference-block rows, else pos;
    missing END → 0 (endPos, steps/toSample.scala:61-66)."""
    endv = F.coalesce(
        F.try_element_at(str_to_map_expr(info), F.lit("END")).cast("long"), F.lit(0)
    )
    return F.when(alt == "<NON_REF>", endv).otherwise(pos.cast("long"))


def getter(info: Column, key: str) -> Column:
    """Extract the value list for ``key`` from a raw INFO string:
    ``split(info, key+'=')[1].split(';')[0].split(',')``; missing → [""]
    (getter, steps/Parser.scala:275-286). The ";ExAC_AF" key exploits
    prefix-match disambiguation exactly as the reference does."""
    # Scala's String.split takes a regex too — escape the key literally.
    import re

    parts = F.split(info, re.escape(key + "="))
    values = F.split(
        F.element_at(F.split(F.try_element_at(parts, F.lit(2)), ";"), 1), ","
    )
    return F.when(F.size(parts) == 1, F.array(F.lit(""))).otherwise(values)


def getter_rs(id_col: Column) -> Column:
    """Parse the dbSNP ID field: single token → passthrough; multi-token →
    prefix each token *after the first* with "rs" (getterRS,
    steps/Parser.scala:287-298 — note it deliberately skips token 0)."""
    toks = F.split(id_col, ",")
    multi = F.transform(
        F.slice(toks, 2, F.size(toks) - 1),
        lambda t: F.concat(F.lit("rs"), F.element_at(F.split(t, ";"), 1)),
    )
    return F.when(F.size(toks) == 1, F.array(id_col)).otherwise(multi)


def get_or_empty(arr: Column, index: int) -> Column:
    """Safe 1-based list indexing; index 0 or out-of-bounds → ""
    (getOrEmpty, steps/Parser.scala:68-71)."""
    if index == 0:
        return F.lit("")
    return F.coalesce(F.try_element_at(arr, F.lit(index)), F.lit(""))


def chrom_normalize(chrom: Column) -> Column:
    """MT→23, X→24, Y→25, else numeric passthrough
    (chromStrToInt, steps/gzToParquet.scala:24-31)."""
    return (
        F.when(chrom == "MT", F.lit(23))
        .when(chrom == "X", F.lit(24))
        .when(chrom == "Y", F.lit(25))
        .otherwise(chrom.cast("int"))
    )


def diploidize(gt: Column) -> Column:
    """Haploid genotype normalization → struct(gt, diploid):
    "0"→("0/0",false), "1"→("1/1",false), else (gt,true)
    (getDiploid, steps/Parser.scala:238-248)."""
    return (
        F.when(gt == "0", F.struct(F.lit("0/0").alias("gt"), F.lit(False).alias("diploid")))
        .when(gt == "1", F.struct(F.lit("1/1").alias("gt"), F.lit(False).alias("diploid")))
        .otherwise(F.struct(gt.alias("gt"), F.lit(True).alias("diploid")))
    )


def sift_pred_rules(letters: Column) -> Column:
    """Consensus over per-allele SIFT letters: D > T > ""
    (steps/Parser.scala:87-91)."""
    return (
        F.when(F.array_contains(letters, "D"), F.lit("D"))
        .when(F.array_contains(letters, "T"), F.lit("T"))
        .otherwise(F.lit(""))
    )


def polyphen2_pred_rules(letters: Column) -> Column:
    """D > P > B > "" (steps/Parser.scala:93-98)."""
    return (
        F.when(F.array_contains(letters, "D"), F.lit("D"))
        .when(F.array_contains(letters, "P"), F.lit("P"))
        .when(F.array_contains(letters, "B"), F.lit("B"))
        .otherwise(F.lit(""))
    )


def mutation_taster_pred_rules(letters: Column) -> Column:
    """A > D > N > "" (steps/Parser.scala:100-105)."""
    return (
        F.when(F.array_contains(letters, "A"), F.lit("A"))
        .when(F.array_contains(letters, "D"), F.lit("D"))
        .when(F.array_contains(letters, "N"), F.lit("N"))
        .otherwise(F.lit(""))
    )


def clinvar_rules(value: Column) -> Column:
    """CLNSIG pipe-list consensus: {5,4}→9, 5→5, 4→4, multi→0, else ""
    (clinvar_rules, steps/Parser.scala:107-116)."""
    s = F.split(value, r"\|")
    return (
        F.when(F.array_contains(s, "5") & F.array_contains(s, "4"), F.lit("9"))
        .when(F.array_contains(s, "5"), F.lit("5"))
        .when(F.array_contains(s, "4"), F.lit("4"))
        .when(F.size(s) > 1, F.lit("0"))
        .otherwise(F.lit(""))
    )


def umd_label(phrase: Column) -> Column:
    """UMD pathogenicity phrase → single-letter code
    (converter, steps/UMD.scala:29-37); unknown → ""."""
    return (
        F.when(phrase == "Probably pathogenic", F.lit("P"))
        .when(phrase == "Polymorphism", F.lit("B"))
        .when(phrase == "Pathogenic", F.lit("D"))
        .when(phrase == "Probable polymorphism", F.lit("U"))
        .otherwise(F.lit(""))
    )
