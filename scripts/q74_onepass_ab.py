"""A/B: q74 bigram fluency — two text-pipeline passes (current) vs ONE
pass through a per-(doc,bigram) pre-aggregate whose exchange both the
model branch and the scoring branch reuse (ReuseExchange).

Current shape: the instance frame `bg` (normalize regex + split +
explode) is evaluated TWICE inside the one job — once under the
model-build aggregate, once on the probe side of the scoring join. At
100 TB that is two full corpus passes. The one-pass form inserts
groupBy(source, doc_id, bigram) between the text pipeline and both
consumers: the text pipeline becomes the map side of a single exchange,
the model aggregates its output, and scoring weights each distinct
per-doc bigram by its count c.

Exactness: per-doc avg = sum(c * lp::decimal(30,6)) / sum(c) — decimal
multiply/sum are exact, so the dividend equals the instance-sum exactly
and the quotient (same decimal types both forms) hashes identically.

The trade being measured: one fewer corpus pass vs a bigger exchange
(the per-doc pre-aggregate barely combines — most per-doc bigram counts
are 1 — so the exchange carries ~instance-count rows with doc_id+source
attached, where the current model exchange carries map-side-combined
distinct bigrams only).

Checks row equality (exact, decimal sums included), then alternates with
a q21 canary. Writes /tmp/q74_onepass_ab.json.
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


def q74_onepass(spark, sf):
    t = load_tables(spark, sf, register_views=False)
    toks = t["documents"].select(
        "source", "doc_id",
        F.split(F.expr(_SPARK_NORM), " ").alias("w"),
    ).filter(F.size("w") >= 2)
    bg = toks.select(
        "source", "doc_id",
        F.explode(F.expr(bigram_list_expr("w"))).alias("bigram"),
    ).withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
    # ONE text-pipeline pass: per-(doc, bigram) counts feed both branches
    pdb = bg.groupBy("source", "doc_id", "bigram", "w1").agg(
        F.count(F.lit(1)).alias("c"))
    big_counts = pdb.groupBy("bigram", "w1").agg(
        F.sum("c").alias("c_bg"))
    vrow = big_counts.agg(F.countDistinct("w1").alias("v"))
    model = (big_counts
             .withColumn("c_w1",
                         F.sum("c_bg").over(Window.partitionBy("w1")))
             .crossJoin(F.broadcast(vrow))
             .withColumn("lp", F.round(
                 F.log((F.col("c_bg") + 1.0)
                       / (F.col("c_w1") + F.col("v").cast("double"))), 6))
             .select("bigram", "lp"))
    from arc_spark.operators.packing import _estimated_input_bytes

    est = _estimated_input_bytes(spark, list(t["documents"].inputFiles()))
    if est is not None and est <= 256 << 20:
        model = F.broadcast(model)
    scored = pdb.join(model, "bigram")
    per_doc = scored.groupBy("source", "doc_id").agg(
        (F.sum(F.col("lp").cast("decimal(30,6)") * F.col("c"))
         / F.sum("c")).cast("decimal(30,6)").alias("avg_lp"))
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("avg_lp"), 5).cast("double").alias("mean_lp"),
        F.round(F.min("avg_lp"), 5).cast("double").alias("worst_lp"),
        F.sum(F.when(F.col("avg_lp") < -7.0, 1).otherwise(0))
        .alias("below_floor"),
    )


# --- equivalence -----------------------------------------------------------
for sf in ("/root/testdata/sf0.01", SF):
    o = sorted(map(tuple, QUERIES["q74_bigram_fluency"](spark, sf).collect()))
    n = sorted(map(tuple, q74_onepass(spark, sf).collect()))
    assert o == n, f"MISMATCH at {sf}: {o[:2]} vs {n[:2]}"
    print(f"{sf}: rows equal ({len(o)})", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


from arc_spark.cacheutil import clear_registry  # noqa: E402

res = {"old": [], "new": [], "canary": []}
for it in range(13):
    for tag, build in (
            ("old", lambda: QUERIES["q74_bigram_fluency"](spark, SF)),
            ("new", lambda: q74_onepass(spark, SF))):
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
json.dump(res, open("/tmp/q74_onepass_ab.json", "w"))

# plan check: the one-pass form must scan documents ONCE (ReuseExchange)
plan = q74_onepass(spark, SF)._jdf.queryExecution().executedPlan().toString()
n_scans = plan.count("Scan parquet")
print("onepass plan: Scan parquet x", n_scans,
      "| ReusedExchange:", plan.count("ReusedExchange"), flush=True)
os.remove("/tmp/arc_ab_busy")
print("DONE")
