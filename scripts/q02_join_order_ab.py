#!/usr/bin/env python
"""In-session alternating A/B: q02 join order.

A = current formulation: customer ⋈ orders ⋈ lineitem (+ broadcast dims).
    The optimizer builds the BROADCAST from lineitem (600k rows at sf0.1,
    the unfiltered fact) because the estimated size of customer⋈orders
    exceeds lineitem's 11 MB file estimate — the driver collects and
    ships the biggest relation in the query.
B = fact-stream formulation: lineitem ⋈ (orders ⋈ customer) — the fact
    table is the probe side; the build side is the FILTERED
    orders⋈customer (o_orderdate >= 1996 keeps ~half of orders).

Both produce identical rows (inner joins commute); B is verified against
the DuckDB oracle separately. Alternating per pass inside ONE tuned
session (the only trustworthy perf evidence on this box — SKILL.md r3).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from arc_spark.catalog import load_tables
from arc_spark.session import get_spark
from arc_spark.workload import TS, dsum, q02_revenue_by_nation

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q02_fact_stream(spark, sf):
    t = load_tables(spark, sf, register_views=False)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    co = (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit(TS(1996, 1, 1)))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
    )
    return (
        t["lineitem"]
        .join(co, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def main():
    spark = get_spark(app_name="q02-join-order-ab")
    variants = {"A_current": q02_revenue_by_nation, "B_factstream": q02_fact_stream}
    times = {k: [] for k in variants}
    # warm both
    for fn in variants.values():
        fn(spark, SF).count()
    n = int(os.environ.get("AB_PASSES", "7"))
    for i in range(n):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.perf_counter()
            fn(spark, SF).count()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name}: p50 {statistics.median(ts):.3f} min {min(ts):.3f} "
              f"all {[round(x, 3) for x in ts]}")
    # result equivalence inside the same session
    a = sorted(map(tuple, q02_revenue_by_nation(spark, SF).collect()))
    b = sorted(map(tuple, q02_fact_stream(spark, SF).collect()))
    print("rows_equal:", a == b, f"({len(a)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
