"""q17 (minhash_lsh_pairs) stage-level profile — session 4 of r14 opt
round 1: decompose the second-heaviest bench lane into its pipeline
stages with the noop sink (guide §1.4), warm p50-of-3 inside ONE tuned
session, to either find a remaining lever or put numbers behind the
"frontier" claim in OPTIMIZATION_r14.md's checklist.

Stages (each includes everything above it, so deltas are stage costs):
  a_shingle      scan → normalize → split → 3-gram xxhash array
  b_signatures   + numpy minhash kernel crossing (mapInPandas)
  c_band_rows    + 64-band bucket explode
  d_candidates   + groupBy(band,bucket) + streamed in-bucket pairs + distinct
  e_full_verify  + broadcast-candidates verify joins vs persisted shingles

Writes /tmp/q17_component_profile.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

while os.path.exists("/tmp/arc_hunter_firing"):
    time.sleep(30)
open("/tmp/arc_ab_busy", "w").close()
# ADVICE r14: the marker must come down on EVERY exit path (an exception
# mid-run would otherwise permanently block the bench hunter's gate)
import atexit  # noqa: E402

atexit.register(lambda: os.path.exists("/tmp/arc_ab_busy")
                and os.remove("/tmp/arc_ab_busy"))

from pyspark.sql import functions as F  # noqa: E402

from arc_spark.session import get_spark  # noqa: E402
from arc_spark.workload import load_tables  # noqa: E402
from arc_spark.operators.dedup import (  # noqa: E402
    _band_rows,
    _shingled,
    _signatures_from_shingled,
    minhash_lsh_pairs,
)

SF = "/root/testdata/sf0.1"
spark = get_spark()
sc = spark.sparkContext
out = {}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, build, iters=3):
    samples = []
    for i in range(iters + 1):  # +1 warmup
        df = build()
        sc.setJobDescription(f"q17prof:{name}:{i}")
        t0 = time.perf_counter()
        noop(df)
        samples.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        from arc_spark.cacheutil import clear_registry

        clear_registry()
    warm = sorted(samples[1:])
    out[name] = {"p50": round(warm[len(warm) // 2], 3),
                 "min": round(warm[0], 3),
                 "all": [round(s, 3) for s in samples]}
    print(name, out[name], flush=True)


t = load_tables(spark, SF, register_views=False)
docs = t["documents"]

timed("a_shingle", lambda: _shingled(docs, "doc_id", "text", 3))


def sigs():
    sh = _shingled(docs, "doc_id", "text", 3).persist()
    s = _signatures_from_shingled(sh, 128)
    from arc_spark.cacheutil import register_cache

    register_cache(sh)
    return s


timed("b_signatures", sigs)
timed("c_band_rows", lambda: _band_rows(sigs().select("doc", "sig"), 128, 64))
timed("d_candidates",
      lambda: minhash_lsh_pairs(docs, threshold=0.8, num_hashes=128,
                                bands=64, verify=False))
timed("e_full_verify",
      lambda: minhash_lsh_pairs(docs, threshold=0.8, num_hashes=128,
                                bands=64, verify=True))

with open("/tmp/q17_component_profile.json", "w") as fh:
    json.dump(out, fh, indent=1)
os.remove("/tmp/arc_ab_busy")
print(json.dumps(out))
