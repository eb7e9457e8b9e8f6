"""r15 item 4 (VERDICT r14): decompose q31_dsir_weights post-spread
(the registry's heaviest lane, ~1.8 s after the r14 few-file spread).

Prefix-timed with the noop sink, mirroring the lane exactly
(workload.q76_dsir_weights: split(_SPARK_NORM), target lang='en',
id_cols (doc_id, source), buckets=4096): tokenized scan, +spread,
+explode feats, +md5 bucket, doc_feat aggregate (the persisted
relation), full lane. Identifies whether the md5-per-instance, the
explode, or the aggregate dominates (guide SS1/SS2.2).

Writes /tmp/q31_profile_r15.json.
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
    from arc_spark.functions.sampling import (  # noqa: E402
        _spread_few_file_input, hash_bucket)
    from arc_spark.functions.text import bigram_list_expr  # noqa: E402
    from arc_spark.session import get_spark  # noqa: E402
    from arc_spark.workload import _SPARK_NORM  # noqa: E402
    from arc_spark.workload import QUERIES, load_tables  # noqa: E402

    SF = "/root/testdata/sf0.1"
    spark = get_spark()
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def tokens():
        t = load_tables(spark, SF, register_views=False)
        return t["documents"].select(
            "doc_id", "source", "lang",
            F.split(F.expr(_SPARK_NORM), " ").alias("w"))

    def feats_of(df):
        return df.select(
            "doc_id", "source", (F.col("lang") == "en").alias("__t"),
            F.explode_outer(F.expr(
                "concat(w, " + bigram_list_expr("w") + ")")).alias("__f"),
        ).filter(F.col("__f").isNotNull())

    def stage_tokens():
        noop(tokens())

    def stage_spread():
        noop(_spread_few_file_input(tokens()))

    def stage_explode():
        noop(feats_of(_spread_few_file_input(tokens())))

    def stage_md5():
        feats = feats_of(_spread_few_file_input(tokens()))
        noop(feats.withColumn("__b", hash_bucket(F.col("__f"), 4096,
                                                 "dsir")))

    def stage_docfeat():
        feats = feats_of(_spread_few_file_input(tokens()))
        doc_feat = (feats
                    .withColumn("__b", hash_bucket(F.col("__f"), 4096,
                                                   "dsir"))
                    .groupBy("doc_id", "source", "__t", "__b")
                    .agg(F.count(F.lit(1)).alias("__c")))
        noop(doc_feat)

    def full_lane():
        noop(QUERIES["q31_dsir_weights"](spark, SF))

    STAGES = [("tokens_noop", stage_tokens),
              ("spread_noop", stage_spread),
              ("explode_noop", stage_explode),
              ("md5_noop", stage_md5),
              ("docfeat_noop", stage_docfeat),
              ("full_lane", full_lane)]

    full_lane()  # warmup
    clear_registry()

    res: dict[str, list] = {}
    for it in range(5):
        for name, fn in STAGES:
            sc.setJobDescription(f"q31prof:{name}:{it}")
            t0 = time.perf_counter()
            fn()
            res.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
            clear_registry()

    for k_, v in sorted(res.items()):
        w = sorted(v)
        print(k_, "p50", w[len(w) // 2], "min", w[0], v, flush=True)
    json.dump(res, open("/tmp/q31_profile_r15.json", "w"))
    print("DONE")
finally:
    try:
        os.remove("/tmp/arc_ab_busy")
    except OSError:
        pass
