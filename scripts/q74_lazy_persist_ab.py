"""A/B: q74 bigram fluency — current lazy no-persist form vs lazy form
with a PERSISTED vocab-sized model table.

Round re-audit found the current form runs the normalize+split+explode
pipeline THREE times per evaluation, not two: the optimizer collapses
`big_counts.agg(countDistinct(w1))` into a direct w1-keyed distinct
aggregate over the instances, and no exchange chain is shared with the
model branch (their map-side aggregates differ after column pruning —
`scripts/q74_shared_v_ab.py` holds the refuted reuse attempt). The only
robust way to share is an optimizer BARRIER: persist the windowed model
table `mt = big_counts + c_w1` (vocab-sized — bounded at any corpus
scale), compute V and lp from the cache. Construction stays fully lazy
(persist schedules nothing); passes drop 3 -> 2 (mt materialization +
scoring probe). This is NOT the pre-r14 eager form: that one ran
stats.first() at construction (a driver job) and persisted; this one
persists without any construction-time action.

Checks row equality (exact) at sf0.01 + sf0.1, then alternates with a
q21 canary. Writes /tmp/q74_lazy_persist_ab.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

while os.path.exists("/tmp/arc_hunter_firing"):
    time.sleep(30)
open("/tmp/arc_ab_busy", "w").close()

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from arc_spark.functions.text import bigram_list_expr  # noqa: E402
from arc_spark.session import get_spark  # noqa: E402
from arc_spark.workload import _SPARK_NORM, QUERIES, load_tables  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark()
sc = spark.sparkContext


def q74_lazy_persist(spark, sf):
    t = load_tables(spark, sf, register_views=False)
    toks = t["documents"].select(
        "source", "doc_id",
        F.split(F.expr(_SPARK_NORM), " ").alias("w"),
    ).filter(F.size("w") >= 2)
    bg = toks.select(
        "source", "doc_id",
        F.explode(F.expr(bigram_list_expr("w"))).alias("bigram"),
    ).withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
    big_counts = bg.groupBy("bigram", "w1").agg(
        F.count(F.lit(1)).alias("c_bg"))
    mt = (big_counts
          .withColumn("c_w1",
                      F.sum("c_bg").over(Window.partitionBy("w1")))
          .persist())
    vrow = mt.agg(F.countDistinct("w1").alias("v"))
    model = (mt.crossJoin(F.broadcast(vrow))
             .withColumn("lp", F.round(
                 F.log((F.col("c_bg") + 1.0)
                       / (F.col("c_w1") + F.col("v").cast("double"))), 6))
             .select("bigram", "lp"))
    from arc_spark.operators.packing import _estimated_input_bytes

    est = _estimated_input_bytes(spark, list(t["documents"].inputFiles()))
    if est is not None and est <= 256 << 20:
        model = F.broadcast(model)
    scored = bg.join(model, "bigram")
    per_doc = scored.groupBy("source", "doc_id").agg(
        (F.sum(F.col("lp").cast("decimal(30,6)"))
         / F.count(F.lit(1))).cast("decimal(30,6)").alias("avg_lp"))
    out = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("avg_lp"), 5).cast("double").alias("mean_lp"),
        F.round(F.min("avg_lp"), 5).cast("double").alias("worst_lp"),
        F.sum(F.when(F.col("avg_lp") < -7.0, 1).otherwise(0))
        .alias("below_floor"),
    )
    from arc_spark.cacheutil import register_cache

    register_cache(mt)
    return out


# --- equivalence -----------------------------------------------------------
for sf in ("/root/testdata/sf0.01", SF):
    o = sorted(map(tuple, QUERIES["q74_bigram_fluency"](spark, sf).collect()))
    n = sorted(map(tuple, q74_lazy_persist(spark, sf).collect()))
    assert o == n, f"MISMATCH at {sf}: {o[:2]} vs {n[:2]}"
    print(f"{sf}: rows equal ({len(o)})", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


from arc_spark.cacheutil import clear_registry  # noqa: E402

res = {"old": [], "new": [], "canary": []}
for it in range(13):
    for tag, build in (
            ("old", lambda: QUERIES["q74_bigram_fluency"](spark, SF)),
            ("new", lambda: q74_lazy_persist(spark, SF))):
        t_build0 = time.perf_counter()
        df = build()
        build_s = time.perf_counter() - t_build0
        sc.setJobDescription(f"ab:{tag}:{it}")
        t0 = time.perf_counter()
        noop(df)
        res[tag].append(round(build_s + time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        clear_registry()
        spark.catalog.clearCache()
    cq = QUERIES["q21_quality_score"](spark, SF)
    t0 = time.perf_counter()
    noop(cq)
    res["canary"].append(round(time.perf_counter() - t0, 3))

for k_, v in res.items():
    w = sorted(v[1:])
    print(k_, "p50", w[len(w) // 2], "min", w[0], v, flush=True)
json.dump(res, open("/tmp/q74_lazy_persist_ab.json", "w"))
os.remove("/tmp/arc_ab_busy")
print("DONE")
