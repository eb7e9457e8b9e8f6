"""A/B: q16 posting SELF-JOIN vs GROUP-PAIRS streaming formulation.

The r12 LSH candidate stage won 1.5->1.1 s by replacing a band-rows
self-join with groupBy+collect_list+posexplode/slice pair streaming.
This probes the same switch for the jaccard posting join (windowed-cap
path): keep the window cap (spill-safe bound BEFORE any array is
collected), then stream in-list ordered pairs instead of joining the
persisted posting with itself.

Equivalence: rows compared exactly. Alternating in-session, q21 canary.
Writes /tmp/q16_group_pairs_ab.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

while os.path.exists("/tmp/arc_hunter_firing"):
    time.sleep(30)
open("/tmp/arc_ab_busy", "w").close()

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from arc_spark.operators.dedup import _shingled, ngram_jaccard_pairs  # noqa: E402
from arc_spark.session import get_spark  # noqa: E402
from arc_spark.workload import QUERIES, load_tables  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark()
sc = spark.sparkContext


def group_pairs_jaccard(df: DataFrame, id_col="doc_id", text_col="text",
                        k=3, threshold=0.5, max_posting_list=1000) -> DataFrame:
    """Windowed-cap path only, group-pairs formulation, no persist."""
    sh = _shingled(df, id_col, text_col, k)
    posting = sh.select(
        "doc", F.size("shingles").alias("sz"),
        F.explode_outer("shingles").alias("s"),
    ).filter(F.col("s").isNotNull())
    posting = (posting.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .filter(F.col("cnt") <= max_posting_list).drop("cnt"))
    grp = (posting.groupBy("s")
           .agg(F.sort_array(F.collect_list(F.struct("doc", "sz")))
                .alias("ds"))
           .filter(F.size("ds") >= 2))
    pairs = (grp.select("ds", F.posexplode("ds").alias("i", "a"))
             .select("a", F.explode(
                 F.expr("slice(ds, i + 2, size(ds) - i - 1)")).alias("b")))
    inter = pairs.groupBy(
        F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")).agg(
        F.count(F.lit(1)).alias("inter"),
        F.min(F.col("a.sz")).alias("sz_a"),
        F.min(F.col("b.sz")).alias("sz_b"),
    )
    return (inter.withColumn(
        "jaccard",
        F.col("inter").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard"))


t = load_tables(spark, SF, register_views=False)
docs = t["documents"]

# --- equivalence first (q16 lane params: threshold=0.2, cap=1000) ----------
old = ngram_jaccard_pairs(docs, threshold=0.2, max_posting_list=1000)
new = group_pairs_jaccard(docs, threshold=0.2, max_posting_list=1000)
o_rows = sorted(map(tuple, old.collect()))
n_rows = sorted(map(tuple, new.collect()))
assert o_rows == n_rows, (
    f"MISMATCH old={len(o_rows)} new={len(n_rows)} "
    f"first_diff={next((a, b) for a, b in zip(o_rows, n_rows) if a != b)}")
print(f"rows equal: {len(o_rows)} pairs", flush=True)

# also at sf0.01 and threshold=0.5 (operator default)
t2 = load_tables(spark, "/root/testdata/sf0.01", register_views=False)
d2 = t2["documents"]
assert (sorted(map(tuple, ngram_jaccard_pairs(d2, threshold=0.5).collect()))
        == sorted(map(tuple, group_pairs_jaccard(d2, threshold=0.5)
                      .collect()))), "sf0.01 t=0.5 mismatch"
print("sf0.01 t=0.5 rows equal", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# --- alternating A/B with canary -------------------------------------------
from arc_spark.cacheutil import clear_registry  # noqa: E402

res = {"old": [], "new": [], "canary": []}
for it in range(13):
    for tag, build in (("old", lambda: ngram_jaccard_pairs(
            docs, threshold=0.2, max_posting_list=1000)),
            ("new", lambda: group_pairs_jaccard(
                docs, threshold=0.2, max_posting_list=1000))):
        df = build()
        sc.setJobDescription(f"ab:{tag}:{it}")
        t0 = time.perf_counter()
        noop(df)
        res[tag].append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        clear_registry()
    cq = QUERIES["q21_quality_score"](spark, SF)
    t0 = time.perf_counter()
    noop(cq)
    res["canary"].append(round(time.perf_counter() - t0, 3))

for k_, v in res.items():
    w = sorted(v[1:])
    print(k_, "p50", w[len(w) // 2], "min", w[0], v, flush=True)
json.dump(res, open("/tmp/q16_group_pairs_ab.json", "w"))
os.remove("/tmp/arc_ab_busy")
print("DONE")
