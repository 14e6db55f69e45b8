"""Training-data curation pipeline — the LLM-data operators composed in
the same staged-table lifecycle as the genomics pipeline (§3.1 shape,
north-star capabilities of BASELINE.json).

Stages: normalize → quality-gate → exact-dedup → near-dedup (MinHash
survivor selection) → tokenize/fingerprint. Each stage is one DataFrame
transform; the runner materializes partitioned parquet between stages so
a 100 TB curation run can restart/resume per stage and prune by
partition (here: `source`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from genpipe_spark.plans.pipeline import Pipeline


def build_curation_pipeline() -> Pipeline:
    from genpipe_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from genpipe_spark.operators.text import fingerprint, quality_score, token_count

    p = Pipeline()

    @p.stage("normalize", output="normalized", partition_by=("source",))
    def normalize(spark, ctx):
        docs = ctx.tables["documents"]
        norm = F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
                r"\s+",
                " ",
            )
        )
        return docs.withColumn("text", norm)

    @p.stage("quality", output="quality_gated", partition_by=("source",))
    def quality(spark, ctx):
        scored = quality_score(ctx.tables["normalized"])
        # standard curation gates: enough tokens, sane mean token length
        return scored.where(
            (F.col("n_tokens") >= 10) & (F.col("mean_token_len") >= 2)
        )

    @p.stage("dedup_exact", output="exact_unique", partition_by=("source",))
    def dedup_exact_stage(spark, ctx):
        gated = ctx.tables["quality_gated"]
        keep = exact_dedup(gated).select("keep_id")
        # keep is O(corpus) — one row per unique document — so it must
        # shuffle, never broadcast; AQE still broadcasts when genuinely
        # small at runtime.
        return gated.join(keep, gated["doc_id"] == keep["keep_id"], "left_semi")

    @p.stage("dedup_near", output="near_unique", partition_by=("source",))
    def dedup_near_stage(spark, ctx):
        uniq = ctx.tables["exact_unique"]
        # 96/24 banding: the survivor set is oracle-checked against the
        # EXACT pair set, so recall needs the banding-math budget
        # (FIXTURES r9-late rule), not the 32/8 default's 1.5%-per-pair
        # tail at the fixture's jaccard-0.8 floor
        pairs = minhash_lsh_pairs(uniq, num_hashes=96, bands=24, threshold=0.5)
        # survivor selection: drop the higher id of each near-dup pair
        # losers can be a large fraction of the corpus (dedup exists
        # because duplicates are plentiful) — shuffle anti-join, no hint.
        losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        return uniq.join(losers, "doc_id", "left_anti")

    @p.stage("featurize", output="curated", partition_by=("source",))
    def featurize(spark, ctx):
        return fingerprint(token_count(ctx.tables["near_unique"]))

    return p
