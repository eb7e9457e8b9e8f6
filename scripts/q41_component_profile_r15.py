"""r15 item 2 (VERDICT r14): decompose q41_kmeans_assign's 0.53-0.96 s
driver cost before touching anything (guide §1).

Suspected components: (a) the bounded centroid collect job
(TakeOrdered over embeddings), (b) the mapInPandas GEMM crossing
(input is ONE parquet file at sf0.1 -> one Python task), (c) the final
groupBy('cid') aggregate. Times each prefix with the noop sink, plus
the full lane, warm p50-of-5, alternating passes.

Writes /tmp/q41_profile_r15.json.
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
    from pyspark.sql import functions as F  # noqa: E402

    from arc_spark.cacheutil import clear_registry  # noqa: E402
    from arc_spark.operators.similarity import kmeans_assign  # noqa: E402
    from arc_spark.session import get_spark  # noqa: E402
    from arc_spark.workload import QUERIES, load_tables  # noqa: E402

    SF = "/root/testdata/sf0.1"
    spark = get_spark()
    sc = spark.sparkContext

    t = load_tables(spark, SF, register_views=False)
    emb = t["embeddings"]
    print("emb partitions:", emb.rdd.getNumPartitions())

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def centroids_only():
        rows = emb.orderBy("vec_id").limit(8).collect()
        return len(rows)

    def scan_noop():
        noop(emb.select("vec_id", "embedding"))

    def assign_noop():
        cent = emb.orderBy("vec_id").limit(8)
        noop(kmeans_assign(emb, cent))

    def full_lane():
        noop(QUERIES["q41_kmeans_assign"](spark, SF))

    STAGES = [("centroid_collect", centroids_only),
              ("scan_noop", scan_noop),
              ("assign_noop", assign_noop),
              ("full_lane", full_lane)]

    # warmup
    full_lane()
    clear_registry()

    res: dict[str, list] = {}
    for it in range(5):
        for name, fn in STAGES:
            sc.setJobDescription(f"q41prof:{name}:{it}")
            t0 = time.perf_counter()
            fn()
            res.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
            clear_registry()

    for k_, v in sorted(res.items()):
        w = sorted(v)
        print(k_, "p50", w[len(w) // 2], "min", w[0], v, flush=True)
    json.dump(res, open("/tmp/q41_profile_r15.json", "w"))
    print("DONE")
finally:
    try:
        os.remove("/tmp/arc_ab_busy")
    except OSError:
        pass
