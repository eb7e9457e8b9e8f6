"""Bucketized range (interval) join (`operators/rangejoin.py`).

The reference exposes range predicates through SQL (DuckDB's theta
join); the engine-level operator here must match that semantics while
planning as a shuffled EQUI-join on bucket ids — never a
BroadcastNestedLoopJoin / cartesian product (the O(|L|·|R|) shape the
naive theta form produces)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from arc_spark.operators.rangejoin import range_join

BASE = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000)


def _frame(spark, n, seed, span_s=3600, name="id"):
    # second-granular timestamps so even a degenerate exact-offset
    # interval (lower == upper, whole seconds) produces matches
    rng = random.Random(seed)
    rows = [(i, BASE + rng.randrange(span_s) * 1_000_000) for i in range(n)]
    return spark.createDataFrame(rows, f"{name} long, ts_us long").select(
        name, F.timestamp_micros("ts_us").alias("ts"))


def _naive(left, right, lower_us, upper_us):
    """The theta form (BNLJ) — ground truth for the differential."""
    r = right.withColumnRenamed("ts", "ts_r")
    l_us, r_us = F.unix_micros(F.col("ts")), F.unix_micros(F.col("ts_r"))
    return left.crossJoin(r).filter(
        (r_us >= l_us + F.lit(lower_us)) & (r_us <= l_us + F.lit(upper_us)))


def _key_set(df):
    return {tuple(r) for r in df.select(
        df.columns[0], df.columns[2] if len(df.columns) > 3 else df.columns[1]
    ).collect()}


class TestRangeJoinSemantics:
    @pytest.mark.parametrize("lower_us,upper_us", [
        (0, 300_000_000),          # forward window
        (-600_000_000, 0),         # backward window
        (-120_000_000, 120_000_000),  # symmetric
        (60_000_000, 60_000_000),  # degenerate: exact offset only
    ])
    def test_differential_vs_naive_theta(self, spark, lower_us, upper_us):
        left = _frame(spark, 120, seed=1, name="lid")
        right = _frame(spark, 150, seed=2, name="rid")
        got = range_join(left, right, lower_us=lower_us, upper_us=upper_us)
        want = _naive(left, right, lower_us, upper_us)
        g = {(r["lid"], r["rid"]) for r in got.collect()}
        w = {(r["lid"], r["rid"]) for r in want.collect()}
        assert g == w and len(w) > 0

    def test_bounds_inclusive_both_ends(self, spark):
        left = spark.createDataFrame([(1, BASE)], "lid long, ts_us long") \
            .select("lid", F.timestamp_micros("ts_us").alias("ts"))
        right = spark.createDataFrame(
            [(10, BASE - 1), (11, BASE), (12, BASE + 5_000_000),
             (13, BASE + 5_000_001)], "rid long, ts_us long") \
            .select("rid", F.timestamp_micros("ts_us").alias("ts"))
        got = range_join(left, right, lower_us=0, upper_us=5_000_000)
        assert {r["rid"] for r in got.collect()} == {11, 12}

    def test_bucket_width_does_not_change_result(self, spark):
        left = _frame(spark, 80, seed=3, name="lid")
        right = _frame(spark, 80, seed=4, name="rid")
        base = range_join(left, right, lower_us=-300_000_000, upper_us=0)
        ref = {(r["lid"], r["rid"]) for r in base.collect()}
        for w in (50_000_000, 300_000_000, 3_600_000_000):
            got = range_join(left, right, lower_us=-300_000_000, upper_us=0,
                             bucket_us=w)
            assert {(r["lid"], r["rid"]) for r in got.collect()} == ref

    def test_clash_columns_suffixed(self, spark):
        left = _frame(spark, 5, seed=5)
        right = _frame(spark, 5, seed=6)
        out = range_join(left, right, lower_us=-10**9, upper_us=10**9)
        assert "id_r" in out.columns and "ts_r" in out.columns

    def test_empty_interval_rejected(self, spark):
        left = _frame(spark, 3, seed=7)
        with pytest.raises(ValueError):
            range_join(left, left, lower_us=5, upper_us=4)


class TestRangeJoinPlan:
    def test_no_nested_loop_join(self, spark):
        """The scale contract: the physical plan is a hash/sort-merge
        EQUI-join on the bucket id — no BroadcastNestedLoopJoin, no
        CartesianProduct anywhere (q68's 100TB survival condition)."""
        left = _frame(spark, 200, seed=8, name="lid")
        right = _frame(spark, 200, seed=9, name="rid")
        out = range_join(left, right, lower_us=-600_000_000, upper_us=0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan
        assert "Cartesian" not in plan
        naive_plan = _naive(left, right, -600_000_000, 0) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" in naive_plan or "Cartesian" in naive_plan

    def test_right_explodes_at_most_two_buckets(self, spark):
        """Candidate blow-up bound: with w = interval width each right row
        lands in ≤2 buckets, so the pre-filter join input is ≤ 2|R|."""
        right = _frame(spark, 300, seed=10, name="rid")
        left = _frame(spark, 1, seed=11, name="lid")
        w = 300_000_000
        r_us = F.unix_micros(F.col("ts"))
        exploded = right.select(F.explode(F.sequence(
            F.floor((r_us - F.lit(0)) / F.lit(w)).cast("long"),
            F.floor((r_us + F.lit(300_000_000)) / F.lit(w)).cast("long"),
        )).alias("b"))
        assert exploded.count() <= 2 * 300


def test_q68_matches_oracle(spark, sf_oracle):
    from arc_spark.workload import ORACLES, QUERIES
    from tests._oracle import compare

    ok, msg = compare(QUERIES["q68_range_join"](spark, sf_oracle),
                      ORACLES["q68_range_join"], sf_oracle)
    assert ok, msg
