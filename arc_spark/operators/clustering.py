"""Duplicate-cluster resolution: connected components + canonical pick.

The training-data dedup flow ends with graph steps the pair generators
(`operators/dedup.py`) don't cover: near-dup PAIRS must become CLUSTERS
(a~b and b~c puts a,c in one cluster even when a!~c directly), and each
cluster keeps one canonical document. The reference engine stops at
pair/window dedup (arc `internal/compaction/dedup.go:219-233` is
last-writer-wins within a sort key); this module adds the cluster
closure step a 100 TB corpus dedup actually ships.

Scale design: min-label propagation over the undirected pair graph.
Each round is one shuffle (groupBy-min over the neighbor frame) plus a
join back to labels — all JVM-side, no Python in the loop — and
converges in O(graph diameter) rounds. Near-dup graphs are shallow
(clusters are quasi-cliques from a similarity threshold; diameter is
almost always ≤3–4), so the round count stays tiny even at corpus
scale; `max_iterations` bounds adversarial chains. Every round
`localCheckpoint`s the label frame — without that, the iterative plan's
lineage grows linearly and Catalyst re-analyzes an ever-deeper tree
(the classic iterative-Spark failure). The edge frame is checkpointed
ONCE up front: it is reused every round, and recomputing a
jaccard/LSH pair join per round would dominate the cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    id_col: str = "doc_id",
    max_iterations: int = 50,
    unique_edges: bool = False,
    small_graph_edges: int = 1_000_000,
) -> DataFrame:
    """(node, cluster_id) for every node; cluster_id = min node id in the
    connected component.

    ``edges`` is an undirected pair list (each pair listed once, either
    orientation). ``nodes`` optionally supplies the full node universe so
    isolated documents come back as singleton clusters — a dedup pipeline
    wants the complete mapping, not just the entangled docs. Edge
    endpoints missing from ``nodes`` still participate and appear in the
    output (they join the label frame on their first round).

    ``unique_edges=True`` skips the edge-dedup shuffle: every near-dup
    pair generator in :mod:`arc_spark.operators.dedup` emits each pair
    exactly once as (a<b), so symmetrizing cannot create duplicates.
    Leave False for arbitrary edge lists (multi-edges would multiply the
    neighbor frame every round).

    Hybrid execution: a similarity-thresholded dup graph is SPARSE — the
    edge list is orders of magnitude smaller than the corpus (it is the
    output of an LSH/jaccard gate, not the corpus itself). When the edge
    list fits under ``small_graph_edges`` (probed with one bounded
    ``limit(n+1).collect()`` — ≤ ~16 bytes/edge on the driver), the
    closure is solved with a driver union-find in O(E α(E)) and applied
    back as a BROADCAST map join — total cost one edge job + one
    broadcast, instead of O(diameter) shuffle rounds. Graphs above the
    threshold take the distributed min-label loop. This mirrors how
    production CC implementations finish: iterate only while the graph is
    too big to contract. Set ``small_graph_edges=0`` to force the
    distributed loop.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("a"),
        F.col(dst_col).cast("long").alias("b"),
    )
    if small_graph_edges:
        probe = e.limit(small_graph_edges + 1).collect()
        if len(probe) <= small_graph_edges:
            return _cc_driver_union_find(e, probe, nodes, id_col)
    # symmetrize once
    e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    if not unique_edges:
        e = e.distinct()
    e = e.localCheckpoint(eager=False)

    if nodes is not None:
        labels = nodes.select(F.col(id_col).cast("long").alias("node"))
    else:
        labels = e.select(F.col("a").alias("node")).distinct()
    labels = labels.select("node", F.col("node").alias("label"))

    from pyspark.sql import Observation

    for i in range(max_iterations):
        # min over {own label} ∪ {labels of neighbors}, and the old label
        # for the convergence check, in ONE grouped aggregation (the only
        # shuffle of the round): own rows are unique per node, so
        # max(own_label) recovers the previous label without a join back.
        nbr = e.join(labels, F.col("b") == F.col("node")).select(
            F.col("a").alias("node"), "label", F.lit(False).alias("own")
        )
        # NULL old_label = a node seen for the first time this round (an
        # edge endpoint outside `nodes`): it must count as changed, or the
        # loop could declare convergence before its label has propagated.
        # The convergence count rides the checkpoint materialization as an
        # observed metric — ONE Spark job per round, not checkpoint+count
        # (halved the per-round stage overhead at sf0.1).
        obs = Observation(f"cc_round_{i}")
        step = (
            labels.withColumn("own", F.lit(True))
            .unionByName(nbr)
            .groupBy("node")
            .agg(
                F.min("label").alias("new_label"),
                F.max(F.when(F.col("own"), F.col("label"))).alias("old_label"),
            )
            .observe(
                obs,
                F.count(
                    F.when(
                        (F.col("new_label") < F.col("old_label"))
                        | F.col("old_label").isNull(),
                        1,
                    )
                ).alias("n_changed"),
            )
            .localCheckpoint()
        )
        labels = step.select("node", F.col("new_label").alias("label"))
        if obs.get["n_changed"] == 0:
            break
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


def _cc_driver_union_find(e, probe, nodes, id_col: str) -> DataFrame:
    """Small-graph closure: union-find over the collected edge list.

    Roots are kept at the component-minimum id (union by min, path
    compression), so cluster ids match the distributed loop exactly.
    The (endpoint → cluster) map goes back to the cluster as a broadcast
    frame; nodes outside the edge set stay singleton via a broadcast
    left join — the corpus itself is never collected or shuffled.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in probe:
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    endpoints = {x for row in probe for x in row}
    spark = e.sparkSession
    if endpoints:
        import pandas as pd

        lab = spark.createDataFrame(pd.DataFrame({
            "node": sorted(endpoints),
            "label": [find(x) for x in sorted(endpoints)],
        }))
    else:
        lab = spark.createDataFrame([], "node long, label long")
    lab = lab.select(F.col("node").cast("long"), F.col("label").cast("long"))
    if nodes is not None:
        uni = nodes.select(F.col(id_col).cast("long").alias("node"))
        singles = uni.join(F.broadcast(lab), "node", "left_anti").select(
            "node", F.col("node").alias("label")
        )
        lab = lab.unionByName(singles)
    return lab.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


def canonical_docs(
    documents: DataFrame,
    assignments: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "n_chars",
    min_cluster_size: int = 2,
) -> DataFrame:
    """One row per non-trivial cluster: size + the canonical document
    (max ``order_col``, ties broken by min id — deterministic).

    This is the "keep best, drop rest" step after clustering: a single
    window over cluster_id (one shuffle, already co-partitioned with the
    size agg)."""
    from pyspark.sql.window import Window

    joined = assignments.join(documents, id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "size", F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
        )
        .filter((F.col("rn") == 1) & (F.col("size") >= min_cluster_size))
        .select(
            "cluster_id",
            F.col("size").cast("long").alias("size"),
            F.col(id_col).alias("canonical_doc"),
            F.col(order_col).cast("long").alias("canonical_chars"),
        )
    )
