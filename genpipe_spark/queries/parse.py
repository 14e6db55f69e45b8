"""Parse-layer queries()/oracle_sql() twins (SURVEY.md §2.6).

The harness tables carry no VCF text, so each fn-* slug is exercised on
*constructed* columns: deterministic strings built from lineitem keys in
BOTH engines, run through the real operator expression on the Spark side,
with the oracle encoding the expected truth table directly in SQL. The
operator implementations under test are the exact ones the genomics
pipeline uses (genpipe_spark/functions/*)."""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import functions as F

from genpipe_spark.functions import parse as P
from genpipe_spark.functions import variant as V
from genpipe_spark.registry import query
from genpipe_spark.queries.common import t, widen

# row selector shared by both engines
_M = "(l_orderkey * 7 + l_linenumber) % {n}"


def _li(spark, sf):
    return widen(t(spark, sf, "lineitem")).select(
        "l_orderkey",
        "l_linenumber",
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber"))).alias("__sel"),
        "l_partkey",
        "l_quantity",
        "l_suppkey",
    )


_SUITE_ORACLE = """
    WITH src AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
             l_extendedprice, l_discount, l_tax,
             (l_orderkey * 7 + l_linenumber) AS sel,
             CAST(l_quantity AS INT) * 2 AS q
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           -- fn-str-to-map
           CAST(l_quantity AS INT) AS dp_val,
           l_linenumber AS gq_val,
           -- fn-gq-bands
           CASE WHEN q < 20 THEN 0 WHEN q < 25 THEN 20 WHEN q < 30 THEN 25
                WHEN q < 35 THEN 30 WHEN q < 40 THEN 35 WHEN q < 45 THEN 40
                WHEN q < 50 THEN 45 WHEN q < 70 THEN 50 WHEN q < 90 THEN 70
                WHEN q < 99 THEN 90 ELSE 99 END AS gq_band,
           -- fn-format-dispatch
           '0/1' AS fd_gt,
           CASE sel % 2 WHEN 0 THEN 0 ELSE CAST(l_quantity AS INT) END AS fd_dp,
           CASE sel % 2 WHEN 0 THEN l_partkey % 90 + 5
                        ELSE l_suppkey % 80 + 20 END AS fd_gq,
           CASE sel % 2 WHEN 0 THEN '9,0,200' ELSE '58,0,300' END AS fd_pl,
           CASE sel % 2 WHEN 0 THEN ''
                        ELSE concat(l_partkey % 9, ',', l_suppkey % 9 + 1) END AS fd_ad,
           -- fn-ad-ratio (a = pk%9+1, b = sk%9+1)
           CAST(floor((l_suppkey % 9 + 1)
                      / CAST(l_partkey % 9 + 1 + l_suppkey % 9 + 1 AS DOUBLE)
                      * 1000)/1000.0 AS VARCHAR) AS ad_ratio,
           -- fn-end-pos
           CASE WHEN sel % 3 = 0 THEN l_partkey + 9 ELSE l_partkey END AS end_pos,
           -- fn-truncate
           floor(l_extendedprice / 7 * 1000)/1000.0 AS trunc3,
           floor(l_extendedprice / 7 * 10000)/10000.0 AS trunc4,
           -- fn-removedot
           CASE WHEN sel % 4 = 0 THEN 0.0
                ELSE floor(l_discount * l_tax * 100 * 10000)/10000.0 END AS rd_val,
           -- fn-getter + fn-get-or-empty
           CAST(l_partkey % 100 AS VARCHAR) AS first_af,
           CASE WHEN sel % 2 = 0 THEN CAST(l_suppkey % 10 AS VARCHAR)
                ELSE '' END AS exac_first,
           -- fn-getter-rs
           CASE WHEN sel % 2 = 0 THEN concat('rs', l_partkey)
                ELSE concat('rs', l_suppkey % 100) END AS rs0,
           -- fn-chrom-normalize
           CASE sel % 5 WHEN 0 THEN 23 WHEN 1 THEN 24 WHEN 2 THEN 25
                        ELSE l_partkey % 22 + 1 END AS chrom_n,
           -- fn-diploidize
           CASE sel % 3 WHEN 0 THEN '0/0' WHEN 1 THEN '1/1' ELSE '0/1' END AS dip_gt,
           CASE sel % 3 WHEN 0 THEN FALSE WHEN 1 THEN FALSE ELSE TRUE END AS dip_diploid,
           -- fn-pred-consensus
           CASE sel % 3 WHEN 0 THEN 'D' WHEN 1 THEN 'T' ELSE '' END AS sift,
           CASE sel % 3 WHEN 0 THEN 'D' WHEN 1 THEN 'P' ELSE 'B' END AS polyphen,
           CASE sel % 3 WHEN 0 THEN '9' WHEN 1 THEN '0' ELSE '5' END AS clinvar_f,
           -- fn-umd-label
           CASE sel % 5 WHEN 0 THEN 'D' WHEN 1 THEN 'B' WHEN 2 THEN 'P'
                        WHEN 3 THEN 'U' ELSE '' END AS umd,
           -- agg-min-max-rowside (per-row min/max over a split list,
           -- SIFT_score.min / polyphen.max shape, steps/Parser.scala:159-164)
           least(l_quantity, l_discount, l_tax) AS vmin,
           greatest(l_quantity, l_discount, l_tax) AS vmax,
           -- project-computed
           floor(l_extendedprice * (1 - l_discount) * 10000)/10000.0 AS revenue
    FROM src
"""


@query("fn-parse-suite", _SUITE_ORACLE)
def fn_parse_suite(spark, sf):
    """One wide per-row query covering every simple scalar parse slug
    (SURVEY.md §2.6) on constructed inputs, through the REAL operator
    expressions (genpipe_spark/functions/parse.py). Column → slug map
    (also in COVERAGE.md):

      dp_val,gq_val       fn-str-to-map        gq_band      fn-gq-bands
      fd_gt..fd_ad        fn-format-dispatch   ad_ratio     fn-ad-ratio
      end_pos             fn-end-pos           trunc3/4     fn-truncate
      rd_val              fn-removedot         first_af     fn-getter
      exac_first          fn-get-or-empty      rs0          fn-getter-rs
      chrom_n             fn-chrom-normalize   dip_*        fn-diploidize
      sift/polyphen/clinvar_f  fn-pred-consensus    umd     fn-umd-label
      vmin,vmax           agg-min-max-rowside  revenue      project-computed

    Each column was an individually-green oracle query in r01; merging
    them into one driver slot frees the 50-query correctness window for
    the relational core (VERDICT r01 "Next round" #1)."""
    li = widen(t(spark, sf, "lineitem"))
    return li.select(*_suite_cols())


@lru_cache(maxsize=1)
def _suite_cols():
    """fn-parse-suite's output expressions are static over lineitem's
    column names — build the ~30-column tree (hundreds of py4j calls)
    once per process instead of on every plan construction."""
    sel = F.col("l_orderkey") * 7 + F.col("l_linenumber")
    m2, m3, m4, m5 = sel % 2, sel % 3, sel % 4, sel % 5

    # constructed inputs (deterministic from the row keys, mirrored in SQL)
    info_map = F.concat(
        F.lit("dp="), F.col("l_quantity").cast("int").cast("string"),
        F.lit(";gq="), F.col("l_linenumber").cast("string"),
        F.lit(";note"),
    )
    m = P.str_to_map_expr(info_map)
    fd_fmt = F.when(m2 == 0, F.lit("GT:GQ:PL:SB")).otherwise(F.lit("GT:AD:DP:GQ:PL:SB"))
    fd_sample = F.when(
        m2 == 0,
        F.concat(
            F.lit("0/1:"), (F.col("l_partkey") % 90 + 5).cast("string"),
            F.lit(":9,0,200:1,2"),
        ),
    ).otherwise(
        F.concat(
            F.lit("0/1:"),
            (F.col("l_partkey") % 9).cast("string"), F.lit(","),
            (F.col("l_suppkey") % 9 + 1).cast("string"), F.lit(":"),
            F.col("l_quantity").cast("int").cast("string"), F.lit(":"),
            (F.col("l_suppkey") % 80 + 20).cast("string"), F.lit(":58,0,300:1,2"),
        )
    )
    fs = P.format_dispatch(fd_fmt, fd_sample)
    ad = F.concat(
        (F.col("l_partkey") % 9 + 1).cast("string"), F.lit(","),
        (F.col("l_suppkey") % 9 + 1).cast("string"),
    )
    ep_alt = F.when(m3 == 0, F.lit("<NON_REF>")).otherwise(F.lit("G"))
    ep_info = F.concat(F.lit("END="), (F.col("l_partkey") + 9).cast("string"), F.lit(";X=1"))
    trunc_v = F.col("l_extendedprice") / 7
    rd_raw = F.when(m4 == 0, F.lit(".")).otherwise(
        (F.col("l_discount") * F.col("l_tax") * 100).cast("string")
    )
    getter_info = F.concat(
        F.lit("X=1;AF="), (F.col("l_partkey") % 100).cast("string"),
        F.lit(","), (F.col("l_partkey") % 7).cast("string"),
        F.when(
            m2 == 0,
            F.concat(F.lit(";ExAC_AF="), (F.col("l_suppkey") % 10).cast("string")),
        ).otherwise(F.lit("")),
    )
    rs_id = F.when(
        m2 == 0, F.concat(F.lit("rs"), F.col("l_partkey").cast("string"))
    ).otherwise(
        F.concat(
            F.lit("rs"), F.col("l_partkey").cast("string"), F.lit(","),
            (F.col("l_suppkey") % 100).cast("string"), F.lit(";junk,77"),
        )
    )
    chrom = (
        F.when(m5 == 0, F.lit("MT"))
        .when(m5 == 1, F.lit("X"))
        .when(m5 == 2, F.lit("Y"))
        .otherwise((F.col("l_partkey") % 22 + 1).cast("string"))
    )
    dip_gt_in = F.when(m3 == 0, F.lit("0")).when(m3 == 1, F.lit("1")).otherwise(F.lit("0/1"))
    dip = P.diploidize(dip_gt_in)
    sift_letters = (
        F.when(m3 == 0, F.lit("T,D")).when(m3 == 1, F.lit("T,.")).otherwise(F.lit("."))
    )
    pp_letters = (
        F.when(m3 == 0, F.lit("B,D")).when(m3 == 1, F.lit("P,B")).otherwise(F.lit("B"))
    )
    clin = F.when(m3 == 0, F.lit("5|4")).when(m3 == 1, F.lit("2|0")).otherwise(F.lit("5"))
    phrase = (
        F.when(m5 == 0, F.lit("Pathogenic"))
        .when(m5 == 1, F.lit("Polymorphism"))
        .when(m5 == 2, F.lit("Probably pathogenic"))
        .when(m5 == 3, F.lit("Probable polymorphism"))
        .otherwise(F.lit("???"))
    )
    minmax_arr = F.array("l_quantity", "l_discount", "l_tax")

    return [
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.try_element_at(m, F.lit("dp")).cast("int").alias("dp_val"),
        F.try_element_at(m, F.lit("gq")).cast("int").alias("gq_val"),
        P.gq_bands(F.col("l_quantity").cast("int") * 2).alias("gq_band"),
        fs["gt"].alias("fd_gt"),
        fs["dp"].alias("fd_dp"),
        fs["gq"].alias("fd_gq"),
        fs["pl"].alias("fd_pl"),
        fs["ad"].alias("fd_ad"),
        P.ad_ratio(ad, F.lit("0/1")).alias("ad_ratio"),
        P.end_pos(ep_alt, ep_info, F.col("l_partkey")).alias("end_pos"),
        P.truncate_at(trunc_v, 3).alias("trunc3"),
        P.truncate_at(trunc_v, 4).alias("trunc4"),
        P.removedot(rd_raw).alias("rd_val"),
        P.get_or_empty(P.getter(getter_info, "AF"), 1).alias("first_af"),
        P.get_or_empty(P.getter(getter_info, ";ExAC_AF"), 1).alias("exac_first"),
        F.element_at(P.getter_rs(rs_id), 1).alias("rs0"),
        P.chrom_normalize(chrom).alias("chrom_n"),
        dip["gt"].alias("dip_gt"),
        dip["diploid"].alias("dip_diploid"),
        P.sift_pred_rules(F.split(sift_letters, ",")).alias("sift"),
        P.polyphen2_pred_rules(F.split(pp_letters, ",")).alias("polyphen"),
        P.clinvar_rules(clin).alias("clinvar_f"),
        P.umd_label(phrase).alias("umd"),
        F.array_min(minmax_arr).alias("vmin"),
        F.array_max(minmax_arr).alias("vmax"),
        (F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000) / 10000.0).alias(
            "revenue"
        ),
    ]


_DECOMP_ORACLE = """
    WITH src AS (SELECT l_orderkey, l_linenumber, {m} AS m FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           CASE m WHEN 0 THEN '<NON_REF>' WHEN 1 THEN 'G' WHEN 2 THEN 'G'
                  WHEN 3 THEN 'C' ELSE 'A' END AS alt_allele,
           CASE m WHEN 0 THEN '0/0' WHEN 1 THEN '0/1' WHEN 2 THEN '0/1'
                  WHEN 3 THEN '1/1' ELSE '0/0' END AS gt,
           CASE m WHEN 0 THEN '0' WHEN 1 THEN '1' WHEN 2 THEN '1'
                  WHEN 3 THEN '2' ELSE '0' END AS gt_index,
           CASE m WHEN 2 THEN TRUE WHEN 3 THEN TRUE ELSE FALSE END AS multiallelic
    FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'C', '0/1', '2', TRUE
    FROM src WHERE m = 2
""".format(m=_M.format(n=5))


@query("fn-alt-decompose", _DECOMP_ORACLE)
def fn_alt_decompose(spark, sf):
    li = _li(spark, sf)
    m = F.col("__sel") % 5
    # m: 0 ref-block | 1 simple het | 2 het-alt 1/2 (two rows) |
    #    3 hom-alt 2/2 multiallelic | 4 hom-ref
    alt = (
        F.when(m == 0, F.lit("<NON_REF>"))
        .when(m == 1, F.lit("G,<NON_REF>"))
        .otherwise(F.lit("G,C,<NON_REF>"))
    )
    gt = (
        F.when(m == 0, F.lit("0/0"))
        .when(m == 1, F.lit("0/1"))
        .when(m == 2, F.lit("1/2"))
        .when(m == 3, F.lit("2/2"))
        .otherwise(F.lit("0/0"))
    )
    x = F.explode(V.alt_decompose(F.lit("A"), alt, gt)).alias("x")
    ex = li.select("l_orderkey", "l_linenumber", x)
    return ex.select(
        "l_orderkey",
        "l_linenumber",
        F.col("x.alt_allele").alias("alt_allele"),
        F.col("x.gt").alias("gt"),
        F.col("x.gt_index").alias("gt_index"),
        F.col("x.multiallelic").alias("multiallelic"),
    )


_ANN_ORACLE = """
    WITH src AS (SELECT l_orderkey, l_linenumber, {m} AS m FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           CASE m WHEN 0 THEN 'stop_gained' ELSE 'missense_variant' END AS effect,
           CASE m WHEN 0 THEN 'HIGH' ELSE 'MODERATE' END AS effect_impact,
           'TRANSCRIPT00001' AS transcript_id
    FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'intron_variant', 'MODIFIER', 'TRANSCRIPT00002'
    FROM src
""".format(m=_M.format(n=2))


@query("fn-snpeff-ann-parse", _ANN_ORACLE)
def fn_snpeff_ann_parse(spark, sf):
    li = _li(spark, sf)
    m = F.col("__sel") % 2
    # two entries on TRANSCRIPT00001 (best-impact dedup keeps one: HIGH when
    # m=0, the MODERATE duplicate otherwise) + one on TRANSCRIPT00002
    e1 = F.concat(
        F.lit("G|missense_variant|MODERATE|GENE1|g|t|TRANSCRIPT00001|pc|1/2|c|p|1/10|2/20|30/40|x")
    )
    e2 = F.when(
        m == 0,
        F.lit("G|stop_gained|HIGH|GENE1|g|t|TRANSCRIPT00001|pc|1/2|c|p|1/10|2/20|30/40|x"),
    ).otherwise(
        F.lit("G|missense_variant|MODERATE|GENE1|g|t|TRANSCRIPT00001|pc|1/2|c|p|1/10|2/20|30/40|x")
    )
    e3 = F.lit("G|intron_variant|MODIFIER|GENE2|g|t|TRANSCRIPT00002|pc|1/2|c|p|1/10|2/20|30/40|x")
    ann = F.concat_ws(",", e1, e2, e3)
    effs = V.dedup_effects_best_impact(V.parse_functional_effects(ann))
    ex = li.select("l_orderkey", "l_linenumber", F.explode(effs).alias("e"))
    return ex.select(
        "l_orderkey",
        "l_linenumber",
        F.col("e.effect").alias("effect"),
        F.col("e.effect_impact").alias("effect_impact"),
        F.col("e.transcript_id").alias("transcript_id"),
    )


@query(
    "fn-annotation-parse",
    """
    SELECT l_orderkey, l_linenumber,
           'D' AS sift_pred,
           least(floor(CAST('0.' || (l_partkey % 90 + 5) AS DOUBLE)*10000)/10000.0, 0.5)
             AS sift_score,
           floor(CAST('0.' || (l_suppkey % 9) AS DOUBLE)*10000)/10000.0 AS pp_score,
           '0.25' AS mt,
           floor(CAST('2' || l_linenumber || '.75' AS DOUBLE)*10000)/10000.0 AS cadd,
           '9' AS clinvar_f,
           0.6827 AS gp1_af,
           floor(CAST('0.8' || (l_partkey % 10) AS DOUBLE)*10000)/10000.0 AS exac
    FROM lineitem
    """,
)
def fn_annotation_parse(spark, sf):
    # the full annotation_parser (steps/Parser.scala:117-183) over a
    # constructed INFO string; oracle recomputes each consensus /
    # min-max / truncation rule directly
    li = _li(spark, sf)
    info = F.concat(
        F.lit("dbNSFP_SIFT_pred=T,D;dbNSFP_SIFT_score=0."),
        (F.col("l_partkey") % 90 + 5).cast("string"),
        F.lit(",0.5;dbNSFP_Polyphen2_HDIV_pred=B,P;dbNSFP_Polyphen2_HDIV_score=0."),
        (F.col("l_suppkey") % 9).cast("string"),
        F.lit(",.;dbNSFP_MutationTaster_pred=N;dbNSFP_MutationTaster_score=0.25"),
        F.lit(";CADD13_PHRED=2"),
        F.col("l_linenumber").cast("string"),
        F.lit(".75;CLNSIG=5|4;dbNSFP_1000Gp1_AF=0.68271;ExAC_AF=0.8"),
        (F.col("l_partkey") % 10).cast("string"),
    )
    from genpipe_spark.functions.variant import populations_parse, predictions_parse

    pred = predictions_parse(info, F.lit("rs1"))
    pop = populations_parse(info)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pred["SIFT_pred"].alias("sift_pred"),
        pred["SIFT_score"].alias("sift_score"),
        pred["polyphen2_hvar_score"].alias("pp_score"),
        pred["mt"].alias("mt"),
        pred["CADD_phred"].alias("cadd"),
        pred["clinvar_filter"].alias("clinvar_f"),
        pop["gp1_af"].alias("gp1_af"),
        pop["exac"].alias("exac"),
    )


_EFF_ORACLE = """
    WITH src AS (SELECT l_orderkey, l_linenumber, l_partkey, {m} AS m FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           CASE m WHEN 0 THEN 'STOP_GAINED' ELSE 'NON_SYNONYMOUS_CODING' END AS effect,
           CASE m WHEN 0 THEN 'HIGH' ELSE 'MODERATE' END AS effect_impact,
           concat('TX', l_partkey % 100) AS transcript_id
    FROM src
""".format(m="(l_orderkey * 7 + l_linenumber) % 2")


@query("fn-snpeff-eff-parse", _EFF_ORACLE)
def fn_snpeff_eff_parse(spark, sf):
    # legacy EFF= format (steps/toEffects.scala:95-115) through the real
    # parser, exploded; oracle encodes the expected plucks
    li = _li(spark, sf)
    m = F.col("__sel") % 2
    head = F.when(m == 0, F.lit("STOP_GAINED(HIGH")).otherwise(
        F.lit("NON_SYNONYMOUS_CODING(MODERATE")
    )
    eff = F.concat(
        head,
        F.lit("|MISSENSE|Cca/Aca|P1T|99|G1|protein_coding|CODING|TX"),
        (F.col("l_partkey") % 100).cast("string"),
        F.lit("|2|1)"),
    )
    ex = li.select(
        "l_orderkey", "l_linenumber", F.explode(V.parse_legacy_eff(eff)).alias("e")
    )
    return ex.select(
        "l_orderkey",
        "l_linenumber",
        F.col("e.effect").alias("effect"),
        F.col("e.effect_impact").alias("effect_impact"),
        F.col("e.transcript_id").alias("transcript_id"),
    )


_SNPEFF_SUITE_ORACLE = f"""
    SELECT 'ann' AS part, * FROM ({_ANN_ORACLE})
    UNION ALL
    SELECT 'eff' AS part, * FROM ({_EFF_ORACLE})
"""


@query("fn-snpeff-suite", _SNPEFF_SUITE_ORACLE)
def fn_snpeff_suite(spark, sf):
    """Tagged union of the two snpEff parser entries (fn-snpeff-ann-parse
    ∪ fn-snpeff-eff-parse — identical output schemas) into ONE
    driver-window slot (VERDICT r4 item 1). The individual entries stay
    registered (>50) for pytest parity and the bench."""
    ann = fn_snpeff_ann_parse(spark, sf).select(F.lit("ann").alias("part"), "*")
    eff = fn_snpeff_eff_parse(spark, sf).select(F.lit("eff").alias("part"), "*")
    return ann.unionByName(eff)


@query(
    "fn-json-extract",
    """
    WITH e AS (
      SELECT event_id, event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type, k % 10 AS k_bucket,
           count(*) AS n, CAST(sum(k) AS BIGINT) AS k_sum,
           max(k) AS k_max
    FROM e GROUP BY event_type, k % 10
    """,
)
def fn_json_extract(spark, sf):
    """JSON column processing: the events.props JSON string is parsed
    BOTH ways Spark offers — ``from_json`` with an explicit schema (the
    typed path: one parse, Catalyst-prunable struct) and
    ``get_json_object`` (the ad-hoc JSONPath path) — the two are
    asserted equal row-wise in-plan (a mismatch nulls the key and
    breaks parity), then aggregated. At scale, prefer from_json: one
    parse per row feeding any number of field reads."""
    e = widen(t(spark, sf, "events"))
    typed = F.from_json(F.col("props"), "k BIGINT")["k"]
    adhoc = F.get_json_object(F.col("props"), "$.k").cast("long")
    k = F.when(typed.eqNullSafe(adhoc), typed)  # NULL on any disagreement
    return (
        e.select("event_id", "event_type", k.alias("k"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )
