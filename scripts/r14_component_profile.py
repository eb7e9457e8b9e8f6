"""Component-level profile of the heaviest bench lanes (r14 opt round 1,
second pass): break each lane into its pipeline stages and time each with
the noop sink (guide §1.4), warm p50-of-3, inside ONE tuned session.

Writes /tmp/r14_component_profile.json. Honors /tmp/arc_hunter_firing.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

while os.path.exists("/tmp/arc_hunter_firing"):
    time.sleep(30)
open("/tmp/arc_ab_busy", "w").close()

from pyspark.sql import functions as F  # noqa: E402

from arc_spark.session import get_spark  # noqa: E402
from arc_spark.workload import load_tables  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark()
sc = spark.sparkContext


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, build, iters=3):
    """build() -> DataFrame; returns p50 of `iters` warm noop runs."""
    samples = []
    for i in range(iters + 1):  # +1 warmup
        df = build()
        sc.setJobDescription(f"profile:{name}:{i}")
        t0 = time.perf_counter()
        noop(df)
        samples.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        # drop operator caches between runs so each sample recomputes
        from arc_spark.cacheutil import clear_registry

        clear_registry()
    warm = sorted(samples[1:])
    out[name] = {"p50": round(warm[len(warm) // 2], 3),
                 "min": round(warm[0], 3), "all": [round(s, 3) for s in samples]}
    print(name, out[name], flush=True)


out = {}
t = load_tables(spark, SF, register_views=False)
docs = t["documents"]

# ---- q80 components -------------------------------------------------------
from arc_spark.operators.dedup import (  # noqa: E402
    _band_rows,
    _shingled,
    _signatures_from_shingled,
    dedup_against_index,
    minhash_index,
)

corpus = docs.filter(F.col("doc_id") % 5 != 0)
new = docs.filter(F.col("doc_id") % 5 == 0)

timed("q80_a_index_sigs", lambda: minhash_index(corpus))
timed("q80_b_new_sigs", lambda: minhash_index(new))
timed("q80_c_index_bands",
      lambda: _band_rows(minhash_index(corpus).select("doc", "sig"), 128, 64))


def q80_cands():
    nb = _band_rows(minhash_index(new).select("doc", "sig"), 128, 64)
    ib = _band_rows(minhash_index(corpus).select("doc", "sig"), 128, 64)
    return (nb.alias("n").join(
        ib.alias("i"),
        (F.col("n.band") == F.col("i.band"))
        & (F.col("n.bucket") == F.col("i.bucket")))
        .select(F.col("n.doc").alias("new_doc"),
                F.col("i.doc").alias("index_doc")).distinct())


timed("q80_d_cands", q80_cands)
timed("q80_e_full", lambda: dedup_against_index(
    new, minhash_index(corpus), threshold=0.8, num_hashes=128, bands=64,
    corpus=corpus))

# ---- q45 components -------------------------------------------------------
from arc_spark.operators.clustering import connected_components  # noqa: E402
from arc_spark.operators.dedup import ngram_jaccard_pairs  # noqa: E402

timed("q45_a_pairs", lambda: ngram_jaccard_pairs(
    docs, threshold=0.2, max_posting_list=1000))
timed("q45_b_full", lambda: connected_components(
    ngram_jaccard_pairs(docs, threshold=0.2, max_posting_list=1000),
    nodes=docs.select("doc_id"), unique_edges=True))

# ---- q74 components -------------------------------------------------------
from arc_spark.workload import QUERIES  # noqa: E402

timed("q74_full", lambda: QUERIES["q74_bigram_fluency"](spark, SF))

# ---- q17 / q16 / q50 / q02 / q41 full lanes for reference -----------------
for lane in ("q17_minhash_lsh", "q16_ngram_jaccard", "q50_decontaminate",
             "q02_revenue_by_nation", "q41_kmeans_assign"):
    timed(lane, lambda lane=lane: QUERIES[lane](spark, SF))

json.dump(out, open("/tmp/r14_component_profile.json", "w"), indent=1)
os.remove("/tmp/arc_ab_busy")
print("DONE")
