"""Connected-components clustering + canonical pick (operators/clustering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_spark.operators.clustering import canonical_docs, connected_components


def _cc_map(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


class TestConnectedComponents:
    def test_transitive_chain_plus_singleton(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
        )
        nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)],
                                      "doc_id long")
        got = _cc_map(connected_components(edges, nodes=nodes))
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}

    def test_long_chain_converges(self, spark):
        # diameter 19: exercises the multi-round propagation loop, in both
        # edge orientations (symmetrize must make direction irrelevant)
        edges = spark.createDataFrame(
            [(i + 1, i) if i % 2 else (i, i + 1) for i in range(19)],
            "doc_a long, doc_b long",
        )
        got = _cc_map(connected_components(edges))
        assert set(got.values()) == {0} and len(got) == 20

    def test_no_edges_all_singletons(self, spark):
        edges = spark.createDataFrame([], "doc_a long, doc_b long")
        nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
        got = _cc_map(connected_components(edges, nodes=nodes))
        assert got == {i: i for i in range(5)}

    def test_edge_endpoints_outside_node_universe(self, spark):
        """A chain whose middle hops are NOT in `nodes` must still merge
        the ends: first-seen nodes count as changed (NULL old_label), so
        convergence cannot be declared before their labels propagate."""
        edges = spark.createDataFrame(
            [(1, 100), (100, 101), (101, 2)], "doc_a long, doc_b long"
        )
        nodes = spark.createDataFrame([(1,), (2,), (50,)], "doc_id long")
        got = _cc_map(connected_components(edges, nodes=nodes))
        assert got[1] == got[2] == 1 and got[50] == 50
        assert got[100] == got[101] == 1  # outsiders appear in the output

    def test_max_iterations_bounds_rounds(self, spark):
        # a chain longer than max_iterations: must return (partially
        # propagated), not loop forever
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
        )
        out = connected_components(edges, max_iterations=2)
        assert out.count() == 11


class TestCanonicalDocs:
    def test_keep_best_tie_breaks_min_id(self, spark):
        docs = spark.createDataFrame(
            [(1, 500), (2, 900), (3, 900), (10, 100), (99, 50)],
            "doc_id long, n_chars long",
        )
        cc = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (10, 10), (99, 99)],
            "doc_id long, cluster_id long",
        )
        rows = {r["cluster_id"]: r for r in canonical_docs(docs, cc).collect()}
        # singleton clusters filtered; ties on n_chars=900 -> min doc_id 2
        assert set(rows) == {1}
        assert rows[1]["canonical_doc"] == 2
        assert rows[1]["size"] == 3 and rows[1]["canonical_chars"] == 900

    def test_min_cluster_size_one_reports_all(self, spark):
        docs = spark.createDataFrame([(1, 5), (2, 7)], "doc_id long, n_chars long")
        cc = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, cluster_id long")
        out = canonical_docs(docs, cc, min_cluster_size=1)
        assert out.count() == 2
        assert {r["size"] for r in out.collect()} == {1}
