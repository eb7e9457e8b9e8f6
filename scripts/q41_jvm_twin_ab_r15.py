"""r15 item 2 (VERDICT r14) — NEGATIVE RESULT: two JVM twins for
q41_kmeans_assign's single-task Python GEMM crossing, both A/B-refuted.

Premise check first (scripts/q41_component_profile_r15.py, warm p50):
  scan_noop 0.103 / centroid_collect 0.112 / assign_noop 0.518 /
  full_lane 0.629.  A bare identity mapInPandas over the same input
  reads 0.262 p50 regardless of payload (id-only column identical), so
  the lane is: bounded centroid collect (0.11) + ONE-task Python
  crossing fixed cost (0.26) + agg.  VERDICT item 2's suggested lever
  ("bytes-derived width on the repartition feeding the GEMM") does not
  apply: there is no repartition — the sf0.1 input is one file, the
  crossing is already exactly one task, and task_thread_budget costs
  0.5 ms warm.  The only way to shrink the lane is to remove the Python
  boundary for small inputs.  Both JVM forms LOSE:

1. Interpreted-HOF form (broadcast cross join over the centroid table,
   d2 = v2 + c2 - 2*aggregate(zip_with(...)), min_by struct): rows
   exactly equal, but p50 0.668 vs 0.538 current (construction
   included) — 2000 rows x 8 centroids x 64-element interpreted lambda
   folds cost more than the crossing they remove.

2. Codegen literal form (centroid elements as literals, flat 64-term
   dot per centroid; both least(struct(d2,cid)) and hoisted-element +
   CASE-chain argmin variants): rows exactly equal, but execution p50
   0.45-0.48 vs 0.24 for the GEMM execution.  The d2 math ALONE (no
   argmin) reads 0.42 p50 with a 0.95 first pass: the ~4k-node
   expression tree pays janino whole-stage-codegen compilation per
   EVALUATION (centroids are data-dependent literals, so every build
   gets fresh expression ids and no codegen cache hit) — the compile
   costs more than the Python crossing it replaces, at every corpus
   size (bigger corpora amortize the compile but then the vectorized
   GEMM wins on per-row cost anyway).

Conclusion: q41's shape (bounded collect + one Arrow GEMM task +
aggregate) is the floor at bench scale and the designed shape at 100 TB
(numpy GEMM per Arrow batch, no shuffle).  The r14 driver regression
(0.529 -> 0.959 on a sentinel-invalid run) is contention, not code: the
FP argmin margin is also healthy (min relative best-vs-2nd-centroid gap
6.2e-05 — 11 orders above ulp noise), so no engine-divergence risk
exists either.

Rerunnable: python scripts/q41_jvm_twin_ab_r15.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

while os.path.exists("/tmp/arc_hunter_firing"):
    time.sleep(30)
open("/tmp/arc_ab_busy", "w").close()

try:
    import numpy as np  # noqa: E402
    from pyspark.sql import functions as F  # noqa: E402

    import arc_spark.cacheutil as cu  # noqa: E402
    from arc_spark.operators.similarity import kmeans_assign  # noqa: E402
    from arc_spark.session import get_spark  # noqa: E402
    from arc_spark.workload import load_tables  # noqa: E402

    spark = get_spark()
    t = load_tables(spark, "/root/testdata/sf0.1", register_views=False)
    emb = t["embeddings"]
    cent = emb.orderBy("vec_id").limit(8)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def build_hof():
        cent_j = cent.select(
            F.col("vec_id").cast("long").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"))
        cent_j = cent_j.withColumn(
            "c2", F.expr("aggregate(cv, 0D, (a, x) -> a + x * x)"))
        src = emb.select(F.col("vec_id").cast("long").alias("id"),
                         F.col("embedding").cast("array<double>").alias("v"))
        src = src.withColumn(
            "v2", F.expr("aggregate(v, 0D, (a, x) -> a + x * x)"))
        pairs = src.crossJoin(F.broadcast(cent_j)).withColumn(
            "d2", F.col("v2") + F.col("c2") - 2.0 * F.expr(
                "aggregate(zip_with(v, cv, (x, c) -> x * c), 0D,"
                " (a, x) -> a + x)"))
        return (pairs.groupBy("id")
                .agg(F.min(F.struct("d2", "cid")).alias("m"))
                .select(F.col("id").alias("vec_id"),
                        F.col("m.cid").alias("cid")))

    def build_literal():
        rows = (cent.select(
            F.col("vec_id").cast("long").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"))
            .orderBy("cid").limit(65536).collect())
        cids = [r["cid"] for r in rows]
        C = np.array([list(r["cv"]) for r in rows], dtype=np.float64)
        c2 = (C * C).sum(axis=1)
        k, d = C.shape
        src = emb.select(F.col("vec_id").cast("long").alias("id"),
                         F.col("embedding").cast("array<double>").alias("v"))
        v2 = " + ".join(
            f"element_at(v, {i+1}) * element_at(v, {i+1})"
            for i in range(d))
        structs = []
        for j, cid in enumerate(cids):
            dot = " + ".join(
                f"element_at(v, {i+1}) * {C[j, i]!r}D" for i in range(d))
            structs.append(
                f"struct(__v2 - 2.0D * ({dot}) + {c2[j]!r}D AS d2,"
                f" {cid}L AS cid)")
        expr = "least(" + ", ".join(structs) + ").cid"
        return (src.withColumn("__v2", F.expr(v2))
                .select(F.col("id").alias("vec_id"),
                        F.expr(expr).alias("cid")))

    cur = kmeans_assign(emb, cent)
    a = sorted(map(tuple, cur.collect()))
    for name, b in (("hof", build_hof()), ("literal", build_literal())):
        assert a == sorted(map(tuple, b.collect())), f"{name} rows differ"
        print(f"{name}: rows equal", flush=True)

    noop(build_literal())
    noop(kmeans_assign(emb, cent))
    res: dict[str, list] = {}
    for it in range(5):
        for tag, build in (
                ("cur", lambda: kmeans_assign(emb, cent)),
                ("hof", build_hof), ("literal", build_literal)):
            t0 = time.perf_counter()
            noop(build())  # construction INSIDE the timer (lane semantics)
            res.setdefault(tag, []).append(
                round(time.perf_counter() - t0, 3))
            cu.clear_registry()
    for k_, v in sorted(res.items()):
        w = sorted(v)
        print(k_, "p50", w[len(w) // 2], "min", w[0], v, flush=True)
    json.dump(res, open("/tmp/q41_jvm_twin_ab_r15.json", "w"))
    print("DONE")
finally:
    try:
        os.remove("/tmp/arc_ab_busy")
    except OSError:
        pass
