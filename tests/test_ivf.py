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

class TestIVFSQ8:
    def test_sq8_recall_vs_float_path(self, spark, sf_oracle):
        """IVF-SQ8 (uint8-packed corpus codes, train-on-sample scalar
        quantizer): same probing, ~8x smaller candidate shuffle, recall
        vs the float-scored path >= 0.9 at identical probe settings."""
        t = load_tables(spark, sf_oracle, register_views=False)
        emb = t["embeddings"]
        q = emb.filter(F.col("vec_id") < 8)
        fl = ivf_topk(emb, q, k=10, n_clusters=8, n_probe=8)
        sq = ivf_topk(emb, q, k=10, n_clusters=8, n_probe=8, sq8=True)
        s_fl = {(r["query_id"], r["neighbor_id"]) for r in fl.collect()}
        s_sq = {(r["query_id"], r["neighbor_id"]) for r in sq.collect()}
        assert len(s_sq) == len(s_fl)
        recall = len(s_fl & s_sq) / len(s_fl)
        assert recall >= 0.9, recall

    def test_sq8_shape_and_scores_bounded(self, spark, sf_oracle):
        t = load_tables(spark, sf_oracle, register_views=False)
        emb = t["embeddings"]
        out = ivf_topk(emb, emb.filter(F.col("vec_id") < 3), k=5,
                       n_clusters=4, n_probe=2, sq8=True).collect()
        assert len(out) == 15
        assert all(-1.0001 <= r["score"] <= 1.0001 for r in out)
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


class TestSQ8AutoGate:
    """sq8='auto' (the default): quantization gated on estimated
    candidate-join payload — off below SQ8_AUTO_MIN_CANDIDATE_BYTES
    (CPU-bound regime, float scoring wins), on above it (network/spill-
    bound regime, the 8× byte cut wins). r7 verdict #4."""

    def test_auto_off_below_threshold_matches_float_path(
            self, spark, sf_oracle):
        t = load_tables(spark, sf_oracle, register_views=False)
        emb = t["embeddings"]
        q = emb.filter(F.col("vec_id") < 3)
        # test corpus: estimate is ~MBs, far under the 4 GiB gate → the
        # default must resolve to the float path, bit-identical scores
        auto = ivf_topk(emb, q, k=5, n_clusters=4, n_probe=4)
        fl = ivf_topk(emb, q, k=5, n_clusters=4, n_probe=4, sq8=False)
        assert sorted(map(tuple, auto.collect())) == \
            sorted(map(tuple, fl.collect()))

    def test_auto_on_above_threshold_matches_sq8_path(
            self, spark, sf_oracle, monkeypatch):
        import arc_spark.operators.similarity as sim

        monkeypatch.setattr(sim, "SQ8_AUTO_MIN_CANDIDATE_BYTES", 1)
        monkeypatch.setattr(sim, "SQ8_AUTO_PROBE_MIN_N", 0)
        t = load_tables(spark, sf_oracle, register_views=False)
        emb = t["embeddings"]
        q = emb.filter(F.col("vec_id") < 3)
        auto = ivf_topk(emb, q, k=5, n_clusters=4, n_probe=4)
        sq = ivf_topk(emb, q, k=5, n_clusters=4, n_probe=4, sq8=True)
        assert sorted(map(tuple, auto.collect())) == \
            sorted(map(tuple, sq.collect()))

    def test_estimate_formula_crosses_at_claimed_regime(self):
        """The documented regime claim, checked as arithmetic: at the
        r6-verdict crossover shape (dim 512, corpus 512k, n_probe 8 over
        64 clusters, 1k queries) the estimated candidate payload is
        ~262 GB — 60× past the gate, auto ≡ on — while the pytest corpus
        (dim 64, 6k rows, 3 queries) sits ~400× under it, auto ≡ off."""
        import arc_spark.operators.similarity as sim

        big = 1_000 * 512_000 * 8 / 64 * 512 * 8
        small = 3 * 6_000 * 4 / 4 * 64 * 8
        assert big > 10 * sim.SQ8_AUTO_MIN_CANDIDATE_BYTES
        assert small < sim.SQ8_AUTO_MIN_CANDIDATE_BYTES / 100


class TestAutoBoundedProbeSmallCorpus:
    """r9 advice: a small corpus (n <= SQ8_AUTO_PROBE_MIN_N) must not
    unconditionally disable SQ8 — a huge query set still puts the
    candidate payload over the gate. The small-corpus branch now runs a
    BOUNDED query-side probe (limit(q_gate).count()), so auto keeps the
    spill protection by construction."""

    def test_small_corpus_large_queryset_enables_sq8(
            self, spark, sf_oracle, monkeypatch):
        import arc_spark.operators.similarity as sim

        # corpus stays under the probe floor (default 100k), but the gate
        # is shrunk so even the 3-query set crosses it via the bounded
        # probe — auto must match the explicit sq8=True output
        monkeypatch.setattr(sim, "SQ8_AUTO_MIN_CANDIDATE_BYTES", 1)
        t = load_tables(spark, sf_oracle, register_views=False)
        emb = t["embeddings"]
        q = emb.filter(F.col("vec_id") < 3)
        auto = ivf_topk(emb, q, k=5, n_clusters=4, n_probe=4)
        sq = ivf_topk(emb, q, k=5, n_clusters=4, n_probe=4, sq8=True)
        assert sorted(map(tuple, auto.collect())) == \
            sorted(map(tuple, sq.collect()))

    def test_small_corpus_small_queryset_stays_float(self):
        """Arithmetic contract of the bounded probe: at the pytest shape
        (6k corpus, dim 64, 3 queries) q_gate is far above the query
        count, so the probe sees fewer rows than the gate and resolves
        False — same answer the old unconditional skip gave, now derived
        instead of assumed."""
        import arc_spark.operators.similarity as sim

        n, dim, n_probe, n_clusters = 6_000, 64, 4, 4
        per_query = n * n_probe / n_clusters * dim * 8
        q_gate = int(sim.SQ8_AUTO_MIN_CANDIDATE_BYTES / per_query) + 1
        assert q_gate > 1_000  # 3-query probes can never flip it on
