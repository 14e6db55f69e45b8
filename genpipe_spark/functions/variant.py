"""Row-multiplying variant semantics: multi-allelic decomposition, snpEff
ANN parsing with best-impact-per-transcript dedup, the INFO annotation
parser, and the composed per-row sample parser (SURVEY.md §2.6
`fn-alt-decompose`, `fn-snpeff-ann-parse`, `fn-annotation-parse`,
`row-sample-parser`).

The reference does all of this row-at-a-time inside ``flatMap``
(sampleParser, steps/Parser.scala:203-237). Here the decomposition is an
array-of-structs expression followed by ``explode`` — the engine's
row-multiplying operator stays a generator expression inside codegen,
never a Python UDF.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from genpipe_spark.functions.parse import (
    ad_ratio,
    clinvar_rules,
    diploidize,
    end_pos,
    format_dispatch,
    get_or_empty,
    getter,
    getter_rs,
    mutation_taster_pred_rules,
    polyphen2_pred_rules,
    removedot,
    sift_pred_rules,
)

# effect_impact ranking for best-per-transcript dedup
# (points map HIGH=1 < MODERATE=2 < LOW=3 < MODIFIER=4,
#  steps/Parser.scala:304; unknown impact → 0, sorts first)
IMPACT_POINTS = {"HIGH": 1, "MODERATE": 2, "LOW": 3, "MODIFIER": 4}


def impact_points(impact: Column) -> Column:
    expr = F.when(impact.isNull(), F.lit(0))
    for k, v in IMPACT_POINTS.items():
        expr = expr.when(impact == k, F.lit(v))
    return expr.otherwise(F.lit(0))


def _alt_entry(alt: Column, gt: Column, gt_index: Column, multi: Column) -> Column:
    return F.struct(
        alt.alias("alt_allele"),
        gt.cast("string").alias("gt"),
        gt_index.cast("string").alias("gt_index"),
        multi.alias("multiallelic"),
    )


def alt_decompose(ref: Column, alt: Column, gt: Column) -> Column:
    """Multi-allelic decomposition → array<struct<alt_allele, gt, gt_index,
    multiallelic>> with 1 or 2 entries (altMultiallelic,
    steps/Parser.scala:252-270). Case table:

      alt == "<NON_REF>"          → [(alt, "0/0", 0, false)]      (ref block)
      gt == "0/0"                 → [(ref, "0/0", 0, false)]
      gt = 0/y                    → [(altList[y-1], "0/1", y, multi)]
      gt = x/x                    → [(altList[x-1], "1/1", x, multi)]
      gt = x/y (x≠y, x≠0)         → [(altList[x-1], "0/1", x, true),
                                     (altList[y-1], "0/1", y, multi)]

    where multi = len(altList) > 2 (the list still includes <NON_REF>).
    Haploid gts ("0", "1") hit the gt=="0/0"?-no → split("/") single-token
    path exactly like the reference (g1 is null → treated by the g0==g1?
    comparison being null → falls through to the het branch only when
    non-null), so callers normalize haploids the same way the reference
    does: "0" and "1" never reach the het double-emit branch because
    split("0","/") = ["0"] makes g0 == "0" true → single-entry branch with
    g1 null; we guard that by coalescing g1 to g0 for haploid inputs.
    """
    from genpipe_spark.operators.hof import bind

    # bind the split arrays once — the when-chain references them many
    # times and HOF/CollapseProject re-evaluation would repeat the splits
    # per branch (measured ~2x on the sf0.1 bench; see operators/hof.py)
    pieces = F.struct(F.split(alt, ",").alias("al"), F.split(gt, "/").alias("g"))

    def decompose(p: Column) -> Column:
        alt_list = p["al"]
        g = p["g"]
        multi = F.size(alt_list) > 2
        g0 = F.element_at(g, 1)
        # haploid "x" behaves as "x/x" for decomposition (getDiploid
        # normalizes the *emitted* gt afterwards, steps/Parser.scala:238-248)
        g1 = F.coalesce(F.try_element_at(g, F.lit(2)), g0)
        g0i = g0.cast("int")
        g1i = g1.cast("int")
        return (
            F.when(
                alt == "<NON_REF>",
                F.array(_alt_entry(alt, F.lit("0/0"), F.lit("0"), F.lit(False))),
            )
            .when(
                (gt == "0/0") | (gt == "0"),
                F.array(_alt_entry(ref, F.lit("0/0"), F.lit("0"), F.lit(False))),
            )
            .when(
                g0 == "0",
                F.array(
                    _alt_entry(F.try_element_at(alt_list, g1i), F.lit("0/1"), g1, multi)
                ),
            )
            .when(
                g0 == g1,
                F.array(
                    _alt_entry(F.try_element_at(alt_list, g1i), F.lit("1/1"), g1, multi)
                ),
            )
            .otherwise(
                F.array(
                    _alt_entry(F.try_element_at(alt_list, g0i), F.lit("0/1"), g0, F.lit(True)),
                    _alt_entry(F.try_element_at(alt_list, g1i), F.lit("0/1"), g1, multi),
                )
            )
        )

    return bind(pieces, decompose)


def _take_right(col: Column, n: int) -> Column:
    """Scala ``takeRight(n)``: last n chars, whole string if shorter."""
    return F.when(F.length(col) <= n, col).otherwise(F.substring(col, -n, n))


def parse_functional_effects(ann: Column) -> Column:
    """Parse a snpEff ``ANN=`` string into array<struct> of functional
    effects — field plucks per functionalMap_parser
    (steps/Parser.scala:299-327), *before* dedup
    (see :func:`dedup_effects_best_impact`). Empty/null input → empty array."""

    def entry(item: Column) -> Column:
        el = F.split(item, r"\|")

        def idx(i: int) -> Column:
            return get_or_empty(el, i)

        aal = F.when(
            F.size(F.split(idx(14), "/")) == 2,
            F.try_element_at(F.split(idx(14), "/"), F.lit(2)),
        ).otherwise(F.lit(""))
        return F.struct(
            idx(2).alias("effect"),
            idx(3).alias("effect_impact"),
            idx(6).alias("functional_class"),
            idx(10).alias("codon_change"),
            idx(11).alias("amino_acid_change"),
            aal.alias("amino_acid_length"),
            idx(4).alias("gene_name"),
            idx(8).alias("transcript_biotype"),
            idx(13).alias("gene_coding"),
            _take_right(idx(7), 15).alias("transcript_id"),
            idx(9).alias("exon_rank"),
            F.lit(1).alias("geno_type_number"),
        )

    parsed = F.transform(F.split(ann, ","), entry)
    # empty input → empty array of the same struct type (slice trick)
    return F.when(ann.isNull() | (ann == ""), F.slice(parsed, 1, 0)).otherwise(parsed)


def dedup_effects_best_impact(effs: Column) -> Column:
    """Distinct the parsed effects, then keep the best-impact effect per
    transcript_id (lowest points; stable — first occurrence wins ties),
    mirroring ``.distinct.groupBy(_.transcript_id).map(sortWith…).map(_.head)``
    (steps/Parser.scala:325). Pure higher-order expression, no shuffle:
    the dedup is *within one row's array*."""
    from genpipe_spark.operators.hof import bind

    def dedup(distinct: Column) -> Column:
        tids = F.array_distinct(F.transform(distinct, lambda e: e["transcript_id"]))

        def best_for(tid: Column) -> Column:
            cands = F.filter(distinct, lambda e: e["transcript_id"] == tid)
            # stable left-fold argmin on impact points (strict <)
            return F.aggregate(
                F.slice(cands, 2, F.greatest(F.size(cands) - 1, F.lit(0))),
                F.element_at(cands, 1),
                lambda acc, e: F.when(
                    impact_points(e["effect_impact"]) < impact_points(acc["effect_impact"]),
                    e,
                ).otherwise(acc),
            )

        return F.transform(tids, best_for)

    # bind: the distinct array is referenced once per transcript — without
    # binding, the whole upstream parse re-evaluates per reference
    return bind(F.array_distinct(effs), dedup)


_ZERO_PREDICTIONS = None  # built lazily below


def zero_predictions() -> Column:
    """The all-empty Predictions struct used for non-primary alleles
    (steps/Parser.scala:216,225)."""
    return F.struct(
        F.lit("").alias("SIFT_pred"),
        F.lit(0.0).alias("SIFT_score"),
        F.lit("").alias("polyphen2_hvar_pred"),
        F.lit("").alias("pp2"),
        F.lit(0.0).alias("polyphen2_hvar_score"),
        F.lit("").alias("MutationTaster_pred"),
        F.lit("").alias("mt"),
        F.lit("").alias("phyloP46way_placental"),
        F.lit("").alias("GERP_RS"),
        F.lit("").alias("SiPhy_29way_pi"),
        F.lit(0.0).alias("CADD_phred"),
        F.lit("").alias("clinvar"),
        F.lit("").alias("clinvar_filter"),
        F.lit("").alias("clnacc"),
        F.lit("").alias("rs"),
    )


def zero_populations() -> Column:
    return F.struct(
        *[
            F.lit(0.0).alias(n)
            for n in [
                "esp6500_aa",
                "esp6500_ea",
                "gp1_afr_af",
                "gp1_asn_af",
                "gp1_eur_af",
                "gp1_af",
                "exac",
            ]
        ]
    )


def predictions_parse(info: Column, rs: Column) -> Column:
    """Predictions struct from raw INFO (annotation_parser,
    steps/Parser.scala:117-183). Quirks preserved:
      - pp2 uses getOrEmpty(…, 0) → always ""
      - removedot always truncates at 4 decimals regardless of the
        precision the reference *appears* to pass
      - Polyphen2_HVAR_* fields actually read the HDIV keys
      - exac uses the ";ExAC_AF" prefix-match key
    """
    sift_pred = getter(info, "dbNSFP_SIFT_pred")
    sift_score = getter(info, "dbNSFP_SIFT_score")
    pp_hvar_pred = getter(info, "dbNSFP_Polyphen2_HDIV_pred")
    pp_hvar_score = getter(info, "dbNSFP_Polyphen2_HDIV_score")
    mt_pred = getter(info, "dbNSFP_MutationTaster_pred")
    mt_score = getter(info, "dbNSFP_MutationTaster_score")
    clinvar = get_or_empty(getter(info, "CLNSIG"), 1)
    return F.struct(
        sift_pred_rules(sift_pred).alias("SIFT_pred"),
        F.array_min(F.transform(sift_score, removedot)).alias("SIFT_score"),
        polyphen2_pred_rules(pp_hvar_pred).alias("polyphen2_hvar_pred"),
        F.lit("").alias("pp2"),
        F.array_max(F.transform(pp_hvar_score, removedot)).alias("polyphen2_hvar_score"),
        mutation_taster_pred_rules(mt_pred).alias("MutationTaster_pred"),
        F.array_max(F.transform(mt_score, removedot)).cast("string").alias("mt"),
        get_or_empty(getter(info, "dbNSFP_phyloP46way_placental"), 1).alias(
            "phyloP46way_placental"
        ),
        get_or_empty(getter(info, "dbNSFP_GERP___RS"), 1).alias("GERP_RS"),
        get_or_empty(getter(info, "dbNSFP_SiPhy_29way_pi"), 1).alias("SiPhy_29way_pi"),
        removedot(get_or_empty(getter(info, "CADD13_PHRED"), 1)).alias("CADD_phred"),
        clinvar.alias("clinvar"),
        clinvar_rules(clinvar).alias("clinvar_filter"),
        get_or_empty(getter(info, "CLNACC"), 1).alias("clnacc"),
        rs.alias("rs"),
    )


def populations_parse(info: Column) -> Column:
    """Populations struct from raw INFO. Quirk preserved: the reference
    passes the EA value into the esp6500_aa field and vice versa
    (steps/Parser.scala:175-181 argument order vs case-class field order)."""

    def pop(key: str) -> Column:
        return removedot(get_or_empty(getter(info, key), 1))

    return F.struct(
        pop("dbNSFP_ESP6500_EA_AF").alias("esp6500_aa"),
        pop("dbNSFP_ESP6500_AA_AF").alias("esp6500_ea"),
        pop("dbNSFP_1000Gp1_AFR_AF").alias("gp1_afr_af"),
        pop("dbNSFP_1000Gp1_ASN_AF").alias("gp1_asn_af"),
        pop("dbNSFP_1000Gp1_EUR_AF").alias("gp1_eur_af"),
        pop("dbNSFP_1000Gp1_AF").alias("gp1_af"),
        pop(";ExAC_AF").alias("exac"),
    )


def sample_parse(raw: DataFrame) -> DataFrame:
    """The composed per-row parse (row-sample-parser): one raw VCF row →
    1-2 nested Variant rows (sampleParser, steps/Parser.scala:203-237).

    Input columns: chrom, pos, id, ref, alt, info, format, sample, sample_id.
    Output: chrom, pos, end_pos, ref, alt, indel, sample(struct),
    effects(array<struct>), predictions(struct), populations(struct).

    Entirely select/explode over column expressions — whole-stage codegen,
    no Python row loop. The expression trees are static (fixed input
    column names), so they are built ONCE per process (_parse_exprs
    cache): constructing this tree costs ~10k py4j round-trips (~2 s),
    pure Python-side overhead that would otherwise be paid on every
    plan construction.
    """
    staged_cols, alt_col, final_cols = _parse_exprs()
    staged = raw.select(*staged_cols).withColumn("__alt", alt_col)
    return staged.select(*final_cols)


@lru_cache(maxsize=1)
def _parse_exprs():
    """Build sample_parse's static Column trees once per process.

    Column objects are immutable expression handles — safe to reuse
    across any number of plans within one JVM/gateway (the lifetime of
    a PySpark process)."""
    fs = format_dispatch(F.col("format"), F.col("sample"))
    rs0 = F.element_at(getter_rs(F.col("id")), 1)
    ann = F.try_element_at(
        F.str_to_map(F.col("info"), F.lit(";"), F.lit("=")), F.lit("ANN")
    )

    staged_cols = [
        F.col("chrom"),
        F.col("pos").cast("long").alias("pos"),
        F.col("ref"),
        F.col("alt"),
        F.col("info"),
        F.col("sample_id"),
        fs.alias("__fs"),
        rs0.alias("__rs"),
        ann.alias("__ann"),
    ]
    alt_col = F.explode(alt_decompose(F.col("ref"), F.col("alt"), F.col("__fs.gt")))

    from genpipe_spark.operators.hof import bind

    x = F.col("__alt")
    primary = (~x["multiallelic"]) & (x["gt_index"] == "1")
    dip = diploidize(x["gt"])

    def gated_effects(deduped: Column) -> Column:
        flt = F.filter(
            deduped, lambda e: e["geno_type_number"] == x["gt_index"].cast("int")
        )
        return F.when(primary, flt).otherwise(F.slice(flt, 1, 0))

    # bind: the parse+dedup tree would otherwise evaluate once per
    # reference (when/otherwise + filter) — the parser-stage hot spot
    effects_col = bind(
        dedup_effects_best_impact(
            parse_functional_effects(F.coalesce(F.col("__ann"), F.lit("")))
        ),
        gated_effects,
    )

    final_cols = [
        F.col("chrom"),
        F.col("pos"),
        end_pos(x["alt_allele"], F.col("info"), F.col("pos")).alias("end_pos"),
        F.col("ref"),
        x["alt_allele"].alias("alt"),
        ((F.length(x["alt_allele"]) != 1) | (F.length(F.col("ref")) != 1)).alias("indel"),
        F.struct(
            dip["gt"].alias("gt"),
            F.col("__fs.dp").alias("dp"),
            F.col("__fs.gq").alias("gq"),
            F.col("__fs.pl").alias("pl"),
            ad_ratio(F.col("__fs.ad"), F.col("__fs.gt")).alias("ad"),
            x["multiallelic"].alias("multiallelic"),
            F.col("sample_id").alias("sampleId"),
            dip["diploid"].alias("diploid"),
        ).alias("sample"),
        effects_col.alias("effects"),
        F.when(primary, predictions_parse(F.col("info"), F.col("__rs")))
        .otherwise(zero_predictions())
        .alias("predictions"),
        F.when(primary, populations_parse(F.col("info")))
        .otherwise(zero_populations())
        .alias("populations"),
    ]
    return staged_cols, alt_col, final_cols


def parse_legacy_eff(eff: Column) -> Column:
    """Legacy snpEff ``EFF=`` format parser (functionalMap_parser,
    steps/toEffects.scala:95-115): entries are
    ``effect(impact|functional_class|codon_change|aa_change|aa_length|
    gene_name|biotype|gene_coding|transcript_id|exon_rank|geno_type_number)``
    — effect before '(', pipe-separated fields inside, ')' stripped from
    the last. Output struct matches :func:`parse_functional_effects` so
    downstream operators (best-impact dedup, group-collect) are shared."""

    def entry(item: Column) -> Column:
        head = F.split(item, r"\(")
        inner = F.split(
            F.regexp_replace(F.coalesce(F.try_element_at(head, F.lit(2)), F.lit("")), r"\)", ""),
            r"\|",
        )

        def idx(i: int) -> Column:  # 0-based into the inner fields
            return F.coalesce(F.try_element_at(inner, F.lit(i + 1)), F.lit(""))

        return F.struct(
            F.element_at(head, 1).alias("effect"),
            idx(0).alias("effect_impact"),
            idx(1).alias("functional_class"),
            idx(2).alias("codon_change"),
            idx(3).alias("amino_acid_change"),
            idx(4).alias("amino_acid_length"),
            idx(5).alias("gene_name"),
            idx(6).alias("transcript_biotype"),
            idx(7).alias("gene_coding"),
            idx(8).alias("transcript_id"),
            idx(9).alias("exon_rank"),
            F.coalesce(idx(10).try_cast("int"), F.lit(1)).alias("geno_type_number"),
        )

    parsed = F.transform(F.split(eff, ","), entry)
    return F.when(eff.isNull() | (eff == ""), F.slice(parsed, 1, 0)).otherwise(parsed)
