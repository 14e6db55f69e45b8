"""Unit tests for the parse-layer expression library against the
reference's documented semantics (SURVEY.md §2.6; fixture shapes from
FIXTURES.md §1-2). Test vectors are constructed from the semantics, not
copied from the reference."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from genpipe_spark.functions import parse as P
from genpipe_spark.functions import variant as V


def one(spark, expr, **cols):
    df = spark.createDataFrame([Row(**cols)])
    return df.select(expr.alias("out")).first()["out"]


# ----------------------------------------------------- fn-alt-decompose

@pytest.mark.parametrize(
    "ref,alt,gt,expected",
    [
        ("A", "<NON_REF>", "0/0", [("<NON_REF>", "0/0", "0", False)]),
        ("A", "G,<NON_REF>", "0/0", [("A", "0/0", "0", False)]),
        ("A", "G,<NON_REF>", "0/1", [("G", "0/1", "1", False)]),
        ("A", "G,C,<NON_REF>", "0/2", [("C", "0/1", "2", True)]),
        ("A", "G,C,<NON_REF>", "2/2", [("C", "1/1", "2", True)]),
        (
            "A",
            "G,C,<NON_REF>",
            "1/2",
            [("G", "0/1", "1", True), ("C", "0/1", "2", True)],
        ),
        # het-alt in a biallelic site: first entry forced multiallelic=True,
        # second takes multi flag (False here) — steps/Parser.scala:268
        (
            "A",
            "G,T",
            "1/2",
            [("G", "0/1", "1", True), ("T", "0/1", "2", False)],
        ),
        # haploid normalization (safe superset of the reference, which only
        # ever sees haploids on <NON_REF> block rows)
        ("A", "G,<NON_REF>", "0", [("A", "0/0", "0", False)]),
        ("A", "G,<NON_REF>", "1", [("G", "1/1", "1", False)]),
    ],
)
def test_alt_decompose(spark, ref, alt, gt, expected):
    out = one(
        spark,
        V.alt_decompose(F.col("ref"), F.col("alt"), F.col("gt")),
        ref=ref,
        alt=alt,
        gt=gt,
    )
    got = [(r["alt_allele"], r["gt"], r["gt_index"], r["multiallelic"]) for r in out]
    assert got == expected


# --------------------------------------------------- fn-format-dispatch

@pytest.mark.parametrize(
    "fmt,sample,expected",
    [
        # gq runs through gq_bands, dp takes MIN_DP
        ("GT:DP:GQ:MIN_DP:PL", "0/1:10:58:7:58,0,209", ("0/1", 7, 50, "58,0,209", "")),
        ("GT:GQ:PL:SB", "1/1:45:12,0,340:1,2", ("1/1", 0, 45, "12,0,340", "")),
        (
            "GT:AD:DP:GQ:PGT:PID:PL:SB",
            "0/1:7,3:10:58:0|1:x:58,0:2,5",
            ("0/1", 10, 58, "58,0", "7,3"),
        ),
        ("GT:GQ:PGT:PID:PL:SB", "0/1:99:0|1:x:1,2:3,4", ("0/1", 0, 0, "", "")),
        ("GT:AD:DP:GQ:PL:SB", "1/1:0,9:9:27:360,27,0:0,0", ("1/1", 9, 27, "360,27,0", "0,9")),
        ("WHO:KNOWS", "0/1:77", ("0/0", 0, 0, "", "")),
    ],
)
def test_format_dispatch(spark, fmt, sample, expected):
    out = one(
        spark,
        P.format_dispatch(F.col("fmt"), F.col("sample")),
        fmt=fmt,
        sample=sample,
    )
    assert (out["gt"], out["dp"], out["gq"], out["pl"], out["ad"]) == expected


@pytest.mark.parametrize(
    "gq,band",
    [(0, 0), (19, 0), (20, 20), (24, 20), (25, 25), (49, 45), (50, 50), (69, 50),
     (70, 70), (89, 70), (90, 90), (98, 90), (99, 99), (150, 99)],
)
def test_gq_bands(spark, gq, band):
    assert one(spark, P.gq_bands(F.col("gq")), gq=gq) == band


# ------------------------------------------------------------ fn-* misc

def test_ad_ratio(spark):
    # adArray(gt_alt)=3, total=10 → 0.3 truncated at 3 decimals, as string
    assert one(spark, P.ad_ratio(F.col("ad"), F.col("gt")), ad="7,3", gt="0/1") == "0.3"
    assert one(spark, P.ad_ratio(F.col("ad"), F.col("gt")), ad="", gt="0/1") == ""
    assert one(spark, P.ad_ratio(F.col("ad"), F.col("gt")), ad="1,2,3", gt="0/2") == "0.5"


def test_end_pos(spark):
    e = P.end_pos(F.col("alt"), F.col("info"), F.col("pos"))
    assert one(spark, e, alt="<NON_REF>", info="END=105;X=1", pos=100) == 105
    assert one(spark, e, alt="<NON_REF>", info="X=1", pos=100) == 0  # missing END → 0
    assert one(spark, e, alt="G", info="END=105", pos=100) == 100


def test_removedot_truncates_at_4_always(spark):
    r = P.removedot(F.col("v"))
    assert one(spark, r, v=".") == 0.0
    assert one(spark, r, v="") == 0.0
    assert one(spark, r, v="0.68271") == 0.6827
    assert one(spark, r, v="1.23456789") == 1.2345


def test_getter(spark):
    g = P.getter(F.col("info"), "AA")
    assert one(spark, g, info="AA=1,2;BB=3") == ["1", "2"]
    assert one(spark, g, info="BB=3") == [""]
    g2 = P.getter(F.col("info"), ";ExAC_AF")
    assert one(spark, g2, info="AC=5;ExAC_AF=0.852,.;Z=1") == ["0.852", "."]


def test_getter_rs(spark):
    g = P.getter_rs(F.col("id"))
    assert one(spark, g, id="rs123") == ["rs123"]
    assert one(spark, g, id=".") == ["."]
    # multi-token: skips token 0, prefixes the rest with rs
    assert one(spark, g, id="rs1,55;x,77") == ["rs55", "rs77"]


def test_chrom_normalize(spark):
    c = P.chrom_normalize(F.col("c"))
    assert one(spark, c, c="MT") == 23
    assert one(spark, c, c="X") == 24
    assert one(spark, c, c="Y") == 25
    assert one(spark, c, c="7") == 7


def test_diploidize(spark):
    d = P.diploidize(F.col("gt"))
    assert tuple(one(spark, d, gt="0")) == ("0/0", False)
    assert tuple(one(spark, d, gt="1")) == ("1/1", False)
    assert tuple(one(spark, d, gt="0/1")) == ("0/1", True)


@pytest.mark.parametrize(
    "rule,letters,expected",
    [
        (P.sift_pred_rules, ["T", "D"], "D"),
        (P.sift_pred_rules, ["T", "."], "T"),
        (P.sift_pred_rules, ["."], ""),
        (P.polyphen2_pred_rules, ["B", "P"], "P"),
        (P.polyphen2_pred_rules, ["B", "P", "D"], "D"),
        (P.mutation_taster_pred_rules, ["N", "D", "A"], "A"),
        (P.mutation_taster_pred_rules, ["N"], "N"),
    ],
)
def test_consensus_rules(spark, rule, letters, expected):
    assert one(spark, rule(F.split(F.col("l"), ",")), l=",".join(letters)) == expected


@pytest.mark.parametrize(
    "value,expected",
    [("5|4", "9"), ("5", "5"), ("4|0", "4"), ("2|0", "0"), ("2", ""), ("", "")],
)
def test_clinvar_rules(spark, value, expected):
    assert one(spark, P.clinvar_rules(F.col("v")), v=value) == expected


def test_umd_label(spark):
    u = P.umd_label(F.col("p"))
    assert one(spark, u, p="Probably pathogenic") == "P"
    assert one(spark, u, p="Polymorphism") == "B"
    assert one(spark, u, p="Pathogenic") == "D"
    assert one(spark, u, p="Probable polymorphism") == "U"
    assert one(spark, u, p="???") == ""


# ------------------------------------- fn-snpeff-ann-parse + best-impact

ANN = (
    "G|missense_variant|MODERATE|GENE1|G1|transcript|ENST00000367770123456|"
    "protein_coding|3/10|c.1A>G|p.Thr2Ala|10/1000|2/500|100/333|x"
    ",G|stop_gained|HIGH|GENE1|G1|transcript|ENST00000367770123456|"
    "protein_coding|3/10|c.1A>T|p.Thr2*|10/1000|2/500|100/333|x"
    ",G|intron_variant|MODIFIER|GENE2|G2|transcript|OTHER_TX|"
    "protein_coding|1/2|c.5C>G|p.X|5/100|1/50|40/80|x"
)


def test_parse_functional_effects(spark):
    out = one(spark, V.parse_functional_effects(F.col("ann")), ann=ANN)
    assert len(out) == 3
    e0 = out[0]
    # 1-based plucks: idx2=effect, idx3=impact, idx7=transcript takeRight 15
    assert e0["effect"] == "missense_variant"
    assert e0["effect_impact"] == "MODERATE"
    assert e0["transcript_id"] == "367770123456"[-15:] or len(e0["transcript_id"]) <= 15
    assert e0["amino_acid_length"] == "333"  # field 14 "100/333" → right of slash
    assert one(spark, V.parse_functional_effects(F.col("ann")), ann="") == []


def test_dedup_effects_best_impact(spark):
    effs = V.dedup_effects_best_impact(V.parse_functional_effects(F.col("ann")))
    out = one(spark, effs, ann=ANN)
    # GENE1's two entries share a transcript: HIGH (1 point) beats MODERATE (2)
    by_tx = {e["transcript_id"]: e for e in out}
    assert len(out) == 2
    tx1 = [e for e in out if e["gene_name"] == "GENE1"]
    assert len(tx1) == 1 and tx1[0]["effect_impact"] == "HIGH"


# ------------------------------------------------- row-sample-parser e2e

RAW_ROWS = [
    # simple het SNP with annotations
    Row(
        chrom="1", pos=1000, id="rs77", ref="A", alt="G,<NON_REF>",
        info=f"BaseQRankSum=1.0;dbNSFP_SIFT_pred=D,T;dbNSFP_SIFT_score=0.03,0.5;"
        f"CLNSIG=5|4;CADD13_PHRED=22.7;dbNSFP_1000Gp1_AF=0.68271;ANN={ANN}",
        format="GT:AD:DP:GQ:PL:SB", sample="0/1:7,3:10:58:58,0,209:2,5",
        sample_id="S1",
    ),
    # <NON_REF> reference block
    Row(
        chrom="1", pos=2000, id=".", ref="C", alt="<NON_REF>",
        info="END=2099", format="GT:DP:GQ:MIN_DP:PL", sample="0/0:12:45:9:0,0",
        sample_id="S1",
    ),
    # multi-allelic het-alt → 2 rows
    Row(
        chrom="1", pos=3000, id=".", ref="T", alt="G,C,<NON_REF>",
        info="X=1", format="GT:AD:DP:GQ:PL:SB", sample="1/2:0,5,5:10:99:x,y:1,1",
        sample_id="S2",
    ),
]


def test_sample_parse_e2e(spark):
    raw = spark.createDataFrame(RAW_ROWS)
    out = V.sample_parse(raw).orderBy("pos", "alt").collect()
    assert len(out) == 4  # 1 + 1 + 2

    snp = [r for r in out if r["pos"] == 1000][0]
    assert snp["alt"] == "G" and not snp["indel"]
    assert snp["end_pos"] == 1000
    assert snp["sample"]["gt"] == "0/1" and snp["sample"]["dp"] == 10
    assert snp["sample"]["ad"] == "0.3"
    assert snp["predictions"]["SIFT_pred"] == "D"
    assert snp["predictions"]["SIFT_score"] == 0.03
    assert snp["predictions"]["clinvar_filter"] == "9"
    assert snp["predictions"]["CADD_phred"] == 22.7
    assert snp["predictions"]["rs"] == "rs77"
    assert snp["populations"]["gp1_af"] == 0.6827
    assert len(snp["effects"]) == 2  # best-impact dedup per transcript

    block = [r for r in out if r["pos"] == 2000][0]
    assert block["alt"] == "<NON_REF>" and block["end_pos"] == 2099
    assert block["indel"]  # length("<NON_REF>") != 1 → true, as in reference
    assert block["sample"]["dp"] == 9  # MIN_DP layout
    assert block["sample"]["gq"] == 45  # gq_bands(45) = 45
    assert block["predictions"]["SIFT_pred"] == ""  # non-primary → zeroed

    multi = sorted([r for r in out if r["pos"] == 3000], key=lambda r: r["alt"])
    assert [r["alt"] for r in multi] == ["C", "G"]
    assert all(r["sample"]["multiallelic"] for r in multi)
    assert all(r["predictions"]["SIFT_pred"] == "" for r in multi)  # zeroed
    assert all(r["effects"] == [] for r in multi)


def test_parse_legacy_eff(spark):
    eff = (
        "NON_SYNONYMOUS_CODING(MODERATE|MISSENSE|Cca/Aca|P123T|456|GENE1|"
        "protein_coding|CODING|TX0001|4|1)"
        ",INTRON(MODIFIER|||||GENE2|protein_coding|CODING|TX0002||1)"
    )
    out = one(spark, V.parse_legacy_eff(F.col("e")), e=eff)
    assert len(out) == 2
    e0 = out[0]
    assert e0["effect"] == "NON_SYNONYMOUS_CODING"
    assert e0["effect_impact"] == "MODERATE"
    assert e0["functional_class"] == "MISSENSE"
    assert e0["amino_acid_change"] == "P123T"
    assert e0["transcript_id"] == "TX0001"
    assert e0["geno_type_number"] == 1
    assert out[1]["effect"] == "INTRON" and out[1]["gene_name"] == "GENE2"
    assert one(spark, V.parse_legacy_eff(F.col("e")), e="") == []
