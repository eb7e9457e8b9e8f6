#!/usr/bin/env python
"""Scaling probe: measured wall-clock vs corpus size for the operators
whose 100 TB behavior the design claims depend on.

Synthesizes larger corpora by replicating the sf0.1 `documents` /
`embeddings` tables with per-replica MUTATION (a replica tag is mixed
into each text / vector), so the dup structure and posting-list shape
stay at the base corpus's rate instead of exploding combinatorially —
the scaled corpus stresses VOLUME, not an artificial all-pairs dup
clique. This is a PERF probe only; correctness lanes use the driver's
parquet verbatim.

Usage: python scripts/scaling_probe.py [--factors 1,4,16] [--ops all]
Emits one JSON line per (op, factor) to stdout and a summary table to
stderr; SCALING.md records a reference run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_documents(spark, factor: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    if factor == 1:
        return base
    n = base.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    # realistic partitioning: a 1-file base crossJoined with a range
    # otherwise collapses the whole synthetic corpus into ONE cached
    # partition, and every probed operator then pays a SERIAL map stage
    # (tokenize/shingle 1.28M docs in one task ≈ 40s at factor 256 —
    # this artifact masked which stage actually bound token packing in
    # the first r6 measurement). Real corpora are many-file; spread the
    # replicas across the cluster width.
    width = spark.sparkContext.defaultParallelism
    return (base.crossJoin(reps).repartition(width)
            .select((F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
                    # every TOKEN carries the replica tag: replicas share
                    # no shingles, so posting lists keep the base corpus's
                    # length and pair volume scales LINEARLY in the factor
                    # (dup structure exists within each replica only) —
                    # the probe stresses volume, not an artificial clique
                    F.expr("concat_ws(' ', transform(split(text, ' '), "
                           "w -> concat('r', rep, w)))").alias("text"),
                    "lang", "source", "n_chars"))


def scaled_embeddings(spark, factor: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    if factor == 1:
        return base
    n = base.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    # same realistic-partitioning fix as scaled_documents
    width = spark.sparkContext.defaultParallelism
    return (base.crossJoin(reps).repartition(width)
            .select((F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
                    # deterministic per-replica rotation of one coordinate
                    F.expr("transform(embedding, (x, i) -> "
                           "CASE WHEN i = rep % size(embedding) "
                           "THEN -x ELSE x END)").alias("embedding")))


def run_ops(spark, factor: int, ops: set[str]) -> list[dict]:
    from pyspark.sql import functions as F

    from arc_spark.functions.sampling import hash_split
    from arc_spark.functions.text import ws_token_count
    from arc_spark.operators.clustering import connected_components
    from arc_spark.operators.dedup import (
        dedup_exact,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from arc_spark.operators.packing import pack_token_shards
    from arc_spark.operators.similarity import lsh_bucketed_topk

    docs = scaled_documents(spark, factor).persist()
    n_docs = docs.count()
    out = []

    def probe(name, fn, n=n_docs):
        if ops and name not in ops and "all" not in ops:
            return
        t0 = time.perf_counter()
        rows = fn()
        dt = time.perf_counter() - t0
        rec = {"op": name, "factor": factor, "n": n,
               "rows": rows, "sec": round(dt, 2)}
        out.append(rec)
        print(json.dumps(rec))
        sys.stdout.flush()

    probe("exact_dedup", lambda: dedup_exact(
        docs, "text", "doc_id").count())
    probe("ngram_jaccard", lambda: ngram_jaccard_pairs(
        docs, threshold=0.2, max_posting_list=1000).count())
    probe("minhash_lsh", lambda: minhash_lsh_pairs(
        docs, threshold=0.8, num_hashes=128, bands=64).count())
    probe("hash_split", lambda: docs.select(
        hash_split("doc_id").alias("split")).groupBy("split")
        .count().count())
    probe("connected_components", lambda: connected_components(
        ngram_jaccard_pairs(docs, threshold=0.2, max_posting_list=1000),
        nodes=docs.select("doc_id"), unique_edges=True).count())
    # default (auto) bucket count — max(8, partitions, cluster width);
    # see SCALING.md's r6 packing correction: with the corpus properly
    # partitioned the bucket count barely matters at probe scale (the
    # earlier "fixed-8 is linear" finding was the 1-partition serial-map
    # artifact, and the "auto is flat" number was a cache hit)
    probe("token_packing", lambda: pack_token_shards(
        docs.select("source", "doc_id",
                    ws_token_count("text").alias("tokens")),
        budget=2000).groupBy("source", "shard")
        .count().count())
    from arc_spark.functions.text import tfidf_top_terms

    probe("tfidf_terms", lambda: tfidf_top_terms(docs, n_top=5).count())

    from arc_spark.functions.sampling import (
        dsir_gumbel_topk,
        dsir_importance_weights,
    )

    def _dsir():
        toks = docs.select(
            "doc_id", "lang",
            F.split(F.lower(F.col("text")), " ").alias("w"))
        w = dsir_importance_weights(
            toks, target=F.col("lang") == "en", tokens_col="w",
            id_cols=("doc_id",), buckets=4096)
        return dsir_gumbel_topk(w, k=1000).count()

    probe("dsir_resample", _dsir)

    from arc_spark.operators.dedup import dedup_against_index, minhash_index

    def _incremental_dedup():
        # the arrival workflow at scale: 80% of the corpus is the stored
        # index, the other 20% is the arriving shard — index build cost
        # is charged here too (worst case; real arrivals amortize it)
        corpus = docs.filter(F.col("doc_id") % 5 != 0)
        new = docs.filter(F.col("doc_id") % 5 == 0)
        idx = minhash_index(corpus)
        return dedup_against_index(new, idx, threshold=0.8,
                                   corpus=corpus).count()

    probe("incremental_dedup", _incremental_dedup)

    if {"all", "ann_lsh_topk", "ann_ivf_topk"} & ops:
        from arc_spark.operators.similarity import ivf_topk

        emb = scaled_embeddings(spark, factor).persist()
        n_vec = emb.count()
        queries = emb.limit(200)
        probe("ann_lsh_topk", lambda: lsh_bucketed_topk(
            emb, queries, k=10).count(), n=n_vec)
        probe("ann_ivf_topk", lambda: ivf_topk(
            emb, queries, k=10, n_clusters=32, n_probe=4).count(), n=n_vec)
        probe("ann_ivf_sq8_topk", lambda: ivf_topk(
            emb, queries, k=10, n_clusters=32, n_probe=4,
            sq8=True).count(), n=n_vec)
        emb.unpersist()
    docs.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--ops", default="all")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    ops = set(args.ops.split(","))

    from arc_spark.session import get_spark

    spark = get_spark(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    all_rows = []
    for f in factors:
        all_rows.extend(run_ops(spark, f, ops))
    by_op: dict[str, list[dict]] = {}
    for r in all_rows:
        by_op.setdefault(r["op"], []).append(r)
    print("\nop                      " + "".join(
        f"x{f:<10}" for f in factors), file=sys.stderr)
    for op, rows in by_op.items():
        line = f"{op:<24}"
        for f in factors:
            m = next((r for r in rows if r["factor"] == f), None)
            line += f"{m['sec']:<11}" if m else "-          "
        base = rows[0]["sec"] or 0.01
        last = rows[-1]
        growth = last["sec"] / base
        vol = last["factor"] / rows[0]["factor"]
        line += f" growth {growth:.1f}x over {vol:.0f}x data"
        print(line, file=sys.stderr)


if __name__ == "__main__":
    main()
