"""Connected-components clustering + canonical pick (operators/clustering)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arc_spark.operators.clustering import canonical_docs, connected_components


def _cc_map(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


# every semantic test runs BOTH executions: the driver union-find fast
# path (small_graph_edges high) and the distributed min-label loop
# (small_graph_edges=0) — their outputs must be identical
BOTH_PATHS = pytest.mark.parametrize("sge", [0, 1_000_000],
                                     ids=["loop", "unionfind"])


class TestConnectedComponents:
    @BOTH_PATHS
    def test_transitive_chain_plus_singleton(self, spark, sge):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
        )
        nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)],
                                      "doc_id long")
        got = _cc_map(connected_components(edges, nodes=nodes,
                                           small_graph_edges=sge))
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}

    @BOTH_PATHS
    def test_long_chain_converges(self, spark, sge):
        # diameter 19: exercises the multi-round propagation loop, in both
        # edge orientations (symmetrize must make direction irrelevant)
        edges = spark.createDataFrame(
            [(i + 1, i) if i % 2 else (i, i + 1) for i in range(19)],
            "doc_a long, doc_b long",
        )
        got = _cc_map(connected_components(edges, small_graph_edges=sge))
        assert set(got.values()) == {0} and len(got) == 20

    @BOTH_PATHS
    def test_no_edges_all_singletons(self, spark, sge):
        edges = spark.createDataFrame([], "doc_a long, doc_b long")
        nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
        got = _cc_map(connected_components(edges, nodes=nodes,
                                           small_graph_edges=sge))
        assert got == {i: i for i in range(5)}

    @BOTH_PATHS
    def test_edge_endpoints_outside_node_universe(self, spark, sge):
        """A chain whose middle hops are NOT in `nodes` must still merge
        the ends: first-seen nodes count as changed (NULL old_label), so
        convergence cannot be declared before their labels propagate."""
        edges = spark.createDataFrame(
            [(1, 100), (100, 101), (101, 2)], "doc_a long, doc_b long"
        )
        nodes = spark.createDataFrame([(1,), (2,), (50,)], "doc_id long")
        got = _cc_map(connected_components(edges, nodes=nodes,
                                           small_graph_edges=sge))
        assert got[1] == got[2] == 1 and got[50] == 50
        assert got[100] == got[101] == 1  # outsiders appear in the output

    def test_max_iterations_bounds_rounds(self, spark):
        # a chain longer than max_iterations: must return (partially
        # propagated), not loop forever — a property of the distributed
        # loop only, so the fast path is disabled
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
        )
        out = connected_components(edges, max_iterations=2,
                                   small_graph_edges=0)
        assert out.count() == 11

    def test_probe_overflow_falls_back_to_loop(self, spark):
        # more edges than small_graph_edges: the bounded probe must hand
        # off to the distributed loop, and the answer must be the same
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(6)], "doc_a long, doc_b long"
        )
        got = _cc_map(connected_components(edges, small_graph_edges=3))
        assert set(got.values()) == {0} and len(got) == 7

    def test_duplicate_and_self_edges_unionfind(self, spark):
        # the fast path must tolerate multi-edges and self-loops without
        # unique_edges having been requested
        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 2), (3, 3)], "doc_a long, doc_b long"
        )
        got = _cc_map(connected_components(edges))
        assert got == {1: 1, 2: 1, 3: 3}


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
