"""End-to-end training-data curation pipeline — every stage is an
arc_spark operator, composed the way a 100 TB run would compose them.

    raw documents
      │  1. quality gates        (lang_id, quality_score, repetition)
      │  2. PII redaction        (codegen regexp chain)
      │  3. exact dedup          (one fingerprint shuffle)
      │  4. near-dup dedup       (MinHash index + incremental query)
      │  5. decontamination      (cross-corpus shingle overlap vs eval)
      │  6. DSIR selection       (importance weights → Gumbel top-k)
      │  7. split + shard        (hash_split, token packing)
      ▼  train shards (parquet), with a per-stage funnel report

Run:  python examples/curation_pipeline.py [sf_dir] [out_dir]

Every decision is content-hash deterministic (same corpus → same
output set on any cluster size or rerun), which is what makes an
incremental 100 TB pipeline auditable. Stage order matters: cheap
row-local gates first (shrink before any shuffle), exact dedup before
near-dup (one hash shuffle removes the bulk), selection after dedup
(weights are corpus statistics — dups would bias them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def run_curation_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    target_lang: str = "en",
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.9,
    decontam_min_shared: int = 5,
    dsir_keep: int | None = None,
    shard_budget: int = 2000,
) -> dict:
    """Returns the funnel: {stage: surviving doc count} + output paths."""
    import os

    from arc_spark.catalog import read_parquet_normalized
    from arc_spark.functions.sampling import (
        dsir_gumbel_topk, dsir_importance_weights, hash_split)
    from arc_spark.functions.text import (
        lang_id, quality_score, redact_pii, ws_token_count)
    from arc_spark.operators.dedup import (
        cross_overlap_pairs, dedup_against_index, dedup_exact,
        minhash_index)
    from arc_spark.operators.packing import pack_token_shards
    from arc_spark.operators.quality import repetition_profile

    funnel: dict = {}
    docs = read_parquet_normalized(
        spark, os.path.join(sf_dir, "documents.parquet"))
    funnel["raw"] = docs.count()

    # Each stage feeds BOTH its funnel count and the next stage, and the
    # chain is long — without a materialization barrier every count()
    # re-executes the whole pipeline so far, and the lineage Catalyst
    # must re-analyze grows superlinearly (measured: the sf0.001 run
    # dropped ~4.8 min → ~3 min with per-stage persists). At 100 TB
    # the same rule holds: checkpoint stage outputs; never let an
    # 8-stage lineage reach the optimizer.
    _live = []

    def _stage(df: DataFrame) -> DataFrame:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        _live.append(df)
        if len(_live) > 2:  # previous stage has no consumers left
            _live.pop(0).unpersist(blocking=False)
        return df

    # -- 1. row-local quality gates (no shuffle; run FIRST) ----------------
    # barrier BEFORE the repetition semi-join: lang_id/quality_score
    # expand to hundreds of string literals, and letting the optimizer
    # merge both consumers into one stage blows whole-stage codegen's
    # 64 KB method limit (interpreted fallback, per-row) — the cached
    # gate output keeps every downstream stage compiled
    gated = _stage(
        docs
        .withColumn("__lang", lang_id("text"))
        .withColumn("__q", quality_score("text"))
        .filter((F.col("__lang") == target_lang)
                & (F.col("__q") >= min_quality))
        .drop("__lang", "__q")
    )
    rep = repetition_profile(gated).filter("keep").select("doc_id")
    gated = _stage(gated.join(rep, "doc_id", "semi"))
    funnel["quality"] = gated.count()

    # -- 2. PII redaction (content transform, still row-local) -------------
    clean = gated.withColumn("text", redact_pii(F.col("text")))

    # -- 3. exact dedup: keep the lowest id per content fingerprint --------
    keep_exact = dedup_exact(clean).select(
        F.col("keep_id").alias("doc_id"))
    clean = _stage(clean.join(keep_exact, "doc_id", "semi"))
    funnel["exact_dedup"] = clean.count()

    # -- 4. near-dup dedup via the signature index --------------------------
    # index the corpus once (persistable artifact; at scale this parquet
    # outlives the run and every future shard dedups against it)
    idx_path = os.path.join(out_dir, "minhash_index")
    minhash_index(clean).write.mode("overwrite").parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    pairs = dedup_against_index(
        clean, idx, threshold=near_dup_threshold, corpus=clean)
    # drop the HIGHER id of each near-dup pair (self-match excluded)
    drop = (pairs.filter(F.col("new_doc") != F.col("index_doc"))
            .select(F.greatest("new_doc", "index_doc").alias("doc_id"))
            .distinct())
    clean = _stage(clean.join(drop, "doc_id", "anti"))
    funnel["near_dedup"] = clean.count()

    # -- 5. decontamination vs the eval slice (here: source 'src0') --------
    eval_docs = docs.filter(F.col("source") == "src0")
    contaminated = cross_overlap_pairs(
        clean, eval_docs, min_shared=decontam_min_shared,
        max_posting_list=1000,
    ).select(F.col("left_doc").alias("doc_id")).distinct()
    clean = _stage(clean.join(contaminated, "doc_id", "anti"))
    funnel["decontaminated"] = clean.count()

    # -- 6. DSIR target-conditioned selection ------------------------------
    toks = clean.select(
        "doc_id", "source", "lang",
        F.split(F.lower(F.col("text")), " ").alias("w"))
    weights = dsir_importance_weights(
        toks, target=F.col("lang") == target_lang, tokens_col="w",
        id_cols=("doc_id",), buckets=4096)
    k = dsir_keep or max(1, int(funnel["decontaminated"] * 0.8))
    picked = dsir_gumbel_topk(weights, k, temperature=2.0)
    clean = _stage(clean.join(picked.select("doc_id"), "doc_id", "semi"))
    funnel["selected"] = clean.count()

    # -- 7. split + token-budget sharding -----------------------------------
    final = (
        clean
        .withColumn("split", hash_split("doc_id"))
        .withColumn("tokens", ws_token_count("text"))
    )
    train = final.filter("split = 'train'")
    shards = pack_token_shards(
        train.select("source", "doc_id", "tokens"), budget=shard_budget)
    out = train.join(shards.select("doc_id", "shard"), "doc_id")
    train_path = os.path.join(out_dir, "train")
    (out.repartition("source", "shard")
        .write.mode("overwrite").partitionBy("source")
        .parquet(train_path))
    funnel["train_rows"] = spark.read.parquet(train_path).count()
    for df in _live:
        df.unpersist(blocking=False)
    return {"funnel": funnel, "train_path": train_path,
            "index_path": idx_path}


if __name__ == "__main__":
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from arc_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated"
    spark = get_spark(app_name="curation-pipeline")
    result = run_curation_pipeline(spark, sf_dir, out_dir)
    print(json.dumps(result, indent=2))
