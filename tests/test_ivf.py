"""IVF ANN operator: centroid fit, probing, recall floor vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_spark.catalog import load_tables
from arc_spark.operators.similarity import brute_force_topk, ivf_topk


class TestIVF:
    def test_shape_and_ranks(self, spark, sf_oracle):
        t = load_tables(spark, sf_oracle, register_views=False)
        emb = t["embeddings"]
        out = ivf_topk(emb, emb.filter(F.col("vec_id") < 3), k=5, n_clusters=8, n_probe=3)
        rows = out.collect()
        assert len(rows) == 15  # 3 queries × top-5
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())

    def test_full_probe_equals_brute_force(self, spark, sf_oracle):
        """Probing ALL clusters makes IVF exact — same sets as brute force."""
        t = load_tables(spark, sf_oracle, register_views=False)
        emb = t["embeddings"]
        q = emb.filter(F.col("vec_id") < 3)
        ivf = ivf_topk(emb, q, k=5, n_clusters=4, n_probe=4)
        bf = brute_force_topk(emb, q, k=5)
        s1 = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
        s2 = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
        assert s1 == s2

    def test_partial_probe_recall_floor(self, spark, sf_oracle):
        t = load_tables(spark, sf_oracle, register_views=False)
        emb = t["embeddings"]
        q = emb.filter(F.col("vec_id") < 5)
        ivf = ivf_topk(emb, q, k=10, n_clusters=8, n_probe=3)
        bf = brute_force_topk(emb, q, k=10)
        s1 = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
        s2 = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
        recall = len(s1 & s2) / len(s2)
        assert recall >= 0.4  # partial probe keeps a useful recall floor
