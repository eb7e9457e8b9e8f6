"""Repetition-based quality gates (operators/quality) and the standalone
nearest-centroid assignment (operators/similarity.kmeans_assign)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arc_spark.operators.quality import repetition_profile
from arc_spark.operators.similarity import kmeans_assign


class TestRepetitionProfile:
    def test_metrics_exact(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a b c d"),            # fully distinct
                (2, "spam spam spam eggs"),  # top word 3/4
                (3, "x"),                  # single word
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in repetition_profile(docs).collect()}
        assert rows[1]["n_words"] == 4
        assert rows[1]["distinct_frac"] == 1.0
        assert rows[1]["top_word_frac"] == 0.25
        assert rows[2]["distinct_frac"] == 0.5
        assert rows[2]["top_word_frac"] == 0.75
        assert rows[3]["n_words"] == 1 and rows[3]["top_word_frac"] == 1.0

    def test_gates(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j"), (2, "a a a a a a a a a b")],
            "doc_id long, text string",
        )
        out = repetition_profile(docs, min_distinct_frac=0.5,
                                 max_top_word_frac=0.2)
        keep = {r["doc_id"]: r["keep"] for r in out.collect()}
        assert keep == {1: True, 2: False}

    def test_no_join_no_window_in_plan(self, spark):
        # one explode + two aggs: the plan must not contain a join or a
        # window — that is the whole point of deriving n_words from the
        # (doc, word) counts instead of a second scan
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = repetition_profile(docs)._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan and "Window" not in plan


class TestKmeansAssign:
    def test_assignment_and_tie_break(self, spark):
        # centroids at 0 and 10; point 7 → 10, point 2 → 0; point 5 is
        # equidistant → smaller centroid id wins
        cent = spark.createDataFrame(
            [(0, [0.0]), (10, [10.0])], "vec_id long, embedding array<double>"
        )
        pts = spark.createDataFrame(
            [(100, [2.0]), (101, [7.0]), (102, [5.0])],
            "vec_id long, embedding array<double>",
        )
        got = {r["vec_id"]: r["cid"] for r in kmeans_assign(pts, cent).collect()}
        assert got == {100: 0, 101: 10, 102: 0}

    def test_empty_centroids_raise(self, spark):
        cent = spark.createDataFrame([], "vec_id long, embedding array<double>")
        pts = spark.createDataFrame([(1, [1.0])],
                                    "vec_id long, embedding array<double>")
        with pytest.raises(ValueError):
            kmeans_assign(pts, cent)

    def test_float32_corpus(self, spark):
        # the real embeddings table carries float32 vectors; the cast to
        # double must happen inside the operator
        cent = spark.createDataFrame([(1, [0.5, 0.5])],
                                     "vec_id long, embedding array<float>")
        pts = spark.createDataFrame([(7, [0.1, 0.9])],
                                    "vec_id long, embedding array<float>")
        assert kmeans_assign(pts, cent).collect()[0]["cid"] == 1


class TestTokenPackingAutoBuckets:
    def test_auto_bucket_count_keeps_packing_invariants(self, spark):
        """n_buckets=None (auto: scales with input partitions) must keep
        the training contracts fixed-8 guarantees: every doc exactly
        once, shards dense per source, per-shard tokens <= budget +
        one doc's overflow, deterministic across runs."""
        from arc_spark.operators.packing import pack_token_shards

        per_doc = spark.range(5000).select(
            (F.col("id") % 3).cast("string").alias("source"),
            F.col("id").alias("doc_id"),
            (F.col("id") % 700 + 1).alias("tokens"),
        ).repartition(16)
        out = pack_token_shards(per_doc, budget=2000).cache()
        assert out.count() == 5000
        assert out.select("doc_id").distinct().count() == 5000
        # dense shard ids per source: max+1 == distinct count
        dense = out.groupBy("source").agg(
            (F.max("shard") + 1).alias("mx"),
            F.countDistinct("shard").alias("n")).collect()
        assert all(r["mx"] == r["n"] for r in dense)
        # budget respected up to single-doc overflow within each bucket
        per_shard = out.groupBy("source", "bucket", "shard").agg(
            F.sum("tokens").alias("t"), F.max("tokens").alias("biggest"))
        assert per_shard.filter(
            F.col("t") - F.col("biggest") >= 2000).count() == 0
        # deterministic: same input -> same assignment
        again = pack_token_shards(per_doc, budget=2000)
        assert out.select("doc_id", "shard").exceptAll(
            again.select("doc_id", "shard")).count() == 0
        out.unpersist()

    def test_many_small_files_bucket_cap(self, spark, tmp_path):
        """r14 (r13 advice): the auto bucket default is VOLUME-capped —
        a many-tiny-files corpus must not get one bucket per file
        (every non-empty (source,bucket) emits >=1 shard, so 200
        buckets for 200 docs would collapse shard sizes to one doc)."""
        from arc_spark.operators import packing as P

        n_files = 200
        base = str(tmp_path / "tiny")
        spark.range(n_files).select(
            F.lit("s0").alias("source"),
            F.col("id").alias("doc_id"),
            F.lit(100).alias("tokens"),
        ).repartition(n_files).write.parquet(base)
        per_doc = spark.read.parquet(base)
        files = per_doc.inputFiles()
        # round-robin repartition leaves some of the 200 partitions
        # empty; what matters is a file count well above the floor
        dp = spark.sparkContext.defaultParallelism
        assert len(files) > max(8, dp)
        out = P.pack_token_shards(per_doc, budget=2000)
        # bucket count == the parallelism floor, NOT the file count:
        # tiny total bytes -> volume signal ~1 -> floor wins
        n_buckets = out.agg(F.countDistinct("bucket")).collect()[0][0]
        assert n_buckets <= max(8, dp) < len(files)
        # byte estimator itself: sampled stat ~= real total
        est = P._estimated_input_bytes(spark, files)
        import os
        real = sum(
            os.path.getsize(f.replace("file:", "")) for f in files)
        assert est is not None and 0.5 * real <= est <= 2 * real
        # packing still sane: ~100/20 docs per shard against budget
        shards = out.groupBy("source", "bucket", "shard").agg(
            F.sum("tokens").alias("t"))
        assert shards.filter(F.col("t") > 2000 + 100).count() == 0


class TestDatasetProfile:
    def test_profile_shape_and_values(self, spark, sf_oracle):
        from arc_spark.catalog import load_tables
        from arc_spark.operators.profiling import profile_dataset

        t = load_tables(spark, sf_oracle, register_views=False)
        rows = {r["col_name"]: r
                for r in profile_dataset(t["documents"]).collect()}
        assert set(rows) == {"doc_id", "text", "lang", "source", "n_chars"}
        d = rows["doc_id"]
        assert d["n_nulls"] == 0 and d["n_distinct"] == d["n_rows"]
        assert d["min_num"] == 0.0 and d["max_num"] == d["n_rows"] - 1
        assert rows["lang"]["min_num"] is None  # non-numeric: no range
        assert rows["lang"]["avg_len"] == 2.0   # ISO-639-1 codes
        assert rows["n_chars"]["avg_len"] is None

    def test_approx_distinct_single_pass_no_expand(self, spark, sf_oracle):
        """exact_distinct=False (the 100 TB mode) must plan WITHOUT the
        Expand operator the exact multi-distinct aggregation needs, and
        its HLL cardinalities must land near the exact ones."""
        from arc_spark.catalog import load_tables
        from arc_spark.operators.profiling import profile_dataset

        t = load_tables(spark, sf_oracle, register_views=False)
        approx = profile_dataset(t["documents"], exact_distinct=False)
        plan = approx._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan
        exact_plan = (profile_dataset(t["documents"])
                      ._jdf.queryExecution().executedPlan().toString())
        assert "Expand" in exact_plan  # the thing the HLL mode removes
        got = {r["col_name"]: r["n_distinct"] for r in approx.collect()}
        want = {r["col_name"]: r["n_distinct"]
                for r in profile_dataset(t["documents"]).collect()}
        for c in got:
            assert abs(got[c] - want[c]) <= max(2, 0.1 * want[c]), c

    def test_unknown_column_raises(self, spark, sf_oracle):
        from arc_spark.catalog import load_tables
        from arc_spark.operators.profiling import profile_dataset

        t = load_tables(spark, sf_oracle, register_views=False)
        with pytest.raises(ValueError, match="unknown columns"):
            profile_dataset(t["documents"], columns=["nope"])
