"""Plan-shape regression tests: the perf-critical physical-plan properties
the engine relies on at scale. A change that silently turns a broadcast
join into a shuffle, or un-pushes an aggregate, should fail HERE, not in a
100 TB run."""

from __future__ import annotations

import pytest

from arc_spark.workload import QUERIES


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanShapes:
    def test_q02_dims_broadcast(self, spark, sf_oracle):
        """nation/region (dimension tables) must broadcast — never shuffle
        the fact side for a dim join."""
        plan = _physical(QUERIES["q02_revenue_by_nation"](spark, sf_oracle))
        assert "BroadcastHashJoin" in plan
        assert "BroadcastExchange" in plan

    @pytest.mark.parametrize("name", ["q02_revenue_by_nation",
                                      "q03_top_orders"])
    def test_fact_table_streams_never_broadcasts(self, spark, sf_oracle,
                                                 name):
        """r15: the planner's inflated post-join estimate used to put
        LINEITEM (the fact table) under a BroadcastExchange; inside the
        byte gate the hinted dim chain must be the build side and the
        lineitem scan must stream."""
        plan = _physical(QUERIES[name](spark, sf_oracle))
        for block in plan.split("BroadcastExchange")[1:]:
            # text until the next join/exchange boundary approximates the
            # broadcast subtree; lineitem must not appear at its top
            first_scan = block.find("Scan parquet")
            if first_scan != -1:
                head = block[:block.find("\n", first_scan) + 1]
                assert "lineitem" not in head, plan

    def test_q03_topk_no_global_sort(self, spark, sf_oracle):
        """ORDER BY + LIMIT plans TakeOrderedAndProject (per-partition top-k
        + merge), not a global sort."""
        plan = _physical(QUERIES["q03_top_orders"](spark, sf_oracle))
        assert "TakeOrderedAndProject" in plan

    def test_q31_filter_pushed_to_scan(self, spark, sf_oracle):
        plan = _physical(QUERIES["q78_select_order_limit"](spark, sf_oracle))
        assert "TakeOrderedAndProject" in plan
        # the value > 90 predicate must reach the parquet scan
        assert "PushedFilters: [IsNotNull(value), GreaterThan(value" in plan

    def test_count_star_aggregate_pushdown(self, spark, sf_oracle):
        """COUNT(*) must be answered from parquet footers through the DSv2
        scan (PushedAggregation), not a full scan — the arc 1 ms count."""
        plan = _physical(QUERIES["q79_count_star"](spark, sf_oracle))
        assert "PushedAggregation: [COUNT(*)]" in plan

    def test_q01_partial_agg_before_shuffle(self, spark, sf_oracle):
        """Hash aggregation must be partial+final (map-side combine)."""
        plan = _physical(QUERIES["q01_pricing_summary"](spark, sf_oracle))
        assert plan.count("HashAggregate") >= 2

    def test_q15_single_shuffle_window(self, spark, sf_oracle):
        """Last-writer-wins dedup: exactly one exchange (the window's
        partitionBy) plus the AQE read — no extra repartitions."""
        plan = _physical(QUERIES["q15_dedup_lww"](spark, sf_oracle))
        assert "Window" in plan or "WindowGroupLimit" in plan

    def test_q51_no_per_source_serial_window(self, spark, sf_oracle):
        """Hierarchical token packing: the per-doc cumsum window must
        partition by (source, bucket) — never by source alone (one task
        per source = the 100 TB scale-killer) and never SinglePartition.
        The only source-partitioned window allowed is the offset
        reconciliation over the metadata-sized counts frame (its input is
        an aggregate, ≤ n_buckets rows per source)."""
        plan = _physical(QUERIES["q51_token_packing"](spark, sf_oracle))
        assert "SinglePartition" not in plan
        # the doc-level cumsum shuffles on BOTH source and bucket
        assert "hashpartitioning(source" in plan
        doc_exchanges = [
            ln for ln in plan.splitlines()
            if "Exchange hashpartitioning(source" in ln and "bucket" in ln
        ]
        assert doc_exchanges, f"no (source, bucket) exchange:\n{plan}"
        # the offsets side reaches the join as a broadcast, not a shuffle
        assert "BroadcastExchange" in plan
        # r10: the cumsum frame is deliberately NOT persisted — under AQE
        # an InMemoryTableScan reports UnknownPartitioning, which forced
        # TWO extra corpus-sized exchanges (counts agg + final agg). The
        # unpersisted (source, bucket) exchange carries partitioning
        # through both branches instead.
        assert "InMemoryTableScan" not in plan, (
            "packing cache re-appeared: it voids the exchange-free "
            "downstream aggs (AQE cache scans report UnknownPartitioning)")
        # the final shard aggregation groups by (source, bucket, shard) so
        # the existing hash(source, bucket) partitioning satisfies it — NO
        # exchange may shuffle the doc-level frame on (source, shard)
        assert not [
            ln for ln in plan.splitlines()
            if "Exchange hashpartitioning(source" in ln and "shard" in ln
        ], f"final agg reshuffles the doc-level frame:\n{plan}"

    def test_shingle_pipeline_not_pushed_into_scan(self, spark, sf_oracle):
        """The dedup shingle pipeline must NOT appear in the parquet scan's
        data filters (the predicate-pushdown trap that serialized the whole
        pipeline onto one input partition)."""
        plan = _physical(QUERIES["q16_ngram_jaccard"](spark, sf_oracle))
        for line in plan.splitlines():
            if "Scan parquet" in line or "BatchScan" in line:
                assert "xxhash64" not in line, "shingle expr leaked into scan filters"

    @pytest.mark.parametrize("name", ["q16_ngram_jaccard", "q17_minhash_lsh",
                                      "q45_dup_clusters"])
    def test_no_lambda_pipeline_in_filters(self, spark, sf_oracle, name):
        """No Filter node may evaluate the hashed-shingle lambda pipeline.
        Catalyst infers `size(arr) > 0` from an inner explode and
        isnotnull() constraints from downstream predicates, and pushes
        them below exchanges with the whole pipeline inlined as an
        interpreted per-row filter (22 s vs 0.5 s on 5 k docs). The
        explode_outer + persist-barrier fixes must keep every xxhash64 out
        of every Filter."""
        opt = (
            QUERIES[name](spark, sf_oracle)
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        for line in opt.splitlines():
            if "Filter" in line:
                assert "xxhash64" not in line, f"lambda pipeline in filter: {line[:160]}"

    def test_q47_redaction_stays_jvm_side(self, spark, sf_oracle):
        """PII redaction is chained regexp_replace — any Python eval node
        here means the codegen path regressed."""
        plan = _physical(QUERIES["q47_pii_redact"](spark, sf_oracle))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_q17_single_signature_pass(self, spark, sf_oracle):
        """r12: LSH candidates come from groupBy(band,bucket)+in-bucket
        pairs — the signature mapInPandas must appear EXACTLY once in
        the plan. A regression to the band-rows self-join shows up as a
        second MapInPandas (each join side re-derives the signature
        pipeline; exchange reuse never fires across asymmetric sides)
        and silently doubles the dominant CPU stage at corpus scale."""
        plan = _physical(QUERIES["q17_minhash_lsh"](spark, sf_oracle))
        assert plan.count("MapInPandas") == 1, \
            "signature pipeline evaluated more than once"
        assert "collect_list" in plan, "group-pairs candidate stage missing"

    def test_q28_uses_block_gemm(self, spark, sf_oracle):
        """Embedding near-dup must run the blocked-GEMM path (one
        applyInPandas group per block pair), not a per-pair lambda fold."""
        plan = _physical(QUERIES["q28_embedding_near_dup"](spark, sf_oracle))
        assert "FlatMapGroupsInPandas" in plan

    def test_q69_like_pushed_regex_codegen(self, spark, sf_oracle):
        """The A7/A8 collapse evidence (r4 verdict item 8): the prefix
        LIKE reaches the parquet scan as StringStartsWith and the
        regex/LIKE stack stays JVM codegen — no Python eval node."""
        plan = _physical(QUERIES["q69_regex_like"](spark, sf_oracle))
        assert 'StringStartsWith(props,{"k")' in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_q68_range_join_no_nested_loop(self, spark, sf_oracle):
        """The bucketized interval join must plan as an equi-join on the
        bucket id — a BroadcastNestedLoopJoin here is the O(|L|x|R|)
        regression the operator exists to prevent."""
        plan = _physical(QUERIES["q68_range_join"](spark, sf_oracle))
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_q48_split_is_pure_codegen(self, spark, sf_oracle):
        plan = _physical(QUERIES["q48_hash_split"](spark, sf_oracle))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert plan.count("HashAggregate") >= 2  # partial+final agg

    def test_q74_instance_table_single_exchange(self, spark, sf_oracle):
        """Bigram fluency (r10 rework): below the broadcast gate the
        instance table feeds exactly ONE exchange — the model-build
        aggregate on (bigram, w1). The score join must be a broadcast
        hash join (no bigram-keyed reshuffle of the instances) and the
        unigram rollup a window WITHIN the vocab table, not a second
        instance aggregation."""
        df = QUERIES["q74_bigram_fluency"](spark, sf_oracle)
        plan = _physical(df)
        assert "BroadcastHashJoin" in plan, plan
        # the only bigram-keyed exchange allowed is the model build on
        # (bigram, w1); a bigram-ALONE exchange is the score join
        # reshuffling the instance table
        offenders = [ln for ln in plan.splitlines()
                     if "Exchange hashpartitioning(bigram" in ln
                     and "w1" not in ln]
        assert not offenders, f"instance table reshuffled on bigram:\n{plan}"
