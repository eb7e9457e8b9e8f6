"""Sweep: _shingled's repartition width vs the Python-crossing fixed cost.

_shingled unconditionally spreads to defaultParallelism (32) — right for
a CPU-bound shingle stage on a real corpus, but every downstream
mapInPandas signature stage then pays ~32 Python task dispatches
(~0.3 s per 16-task Python job on this box, SKILL r3) for microseconds
of CPU each at bench scale. A bytes-derived width (est_bytes /
SHINGLE_TASK_BYTES, clamped to [1, defaultParallelism], fallback
defaultParallelism) is the scale-adaptive version of the same spread.

Sweeps n for: sig stage alone, q17 full, q16 full, q80 full.
Writes /tmp/shingle_spread_ab.json.
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

import arc_spark.operators.dedup as dd  # noqa: E402
from arc_spark.cacheutil import clear_registry  # noqa: E402
from arc_spark.session import get_spark  # noqa: E402
from arc_spark.workload import QUERIES, load_tables  # noqa: E402

SF = "/root/testdata/sf0.1"
spark = get_spark()
sc = spark.sparkContext

t = load_tables(spark, SF, register_views=False)
docs = t["documents"]

orig_shingled = dd._shingled
FORCED_N = [None]  # None = status quo


def patched_shingled(df, id_col, text_col, k, extra_cols=()):
    if FORCED_N[0] is None:
        return orig_shingled(df, id_col, text_col, k, extra_cols)
    import arc_spark.operators.dedup as _dd
    from pyspark.sql import functions as F

    extra = [F.col(c) for c in extra_cols]
    base = df.repartition(FORCED_N[0]).select(
        F.col(id_col).alias("doc"), *extra, _dd.words(text_col).alias("w"))
    hw = base.select("doc", *extra,
                     F.expr("transform(w, x -> xxhash64(x))").alias("hw"))
    tuple_hash = ",".join(f"element_at(hw, i + {j})" for j in range(k))
    return hw.select(
        "doc", *extra,
        F.expr(
            f"""CASE WHEN size(hw) >= {k} THEN array_distinct(transform(
                    sequence(1, size(hw) - {k - 1}),
                    i -> xxhash64({tuple_hash})))
                ELSE CAST(NULL AS ARRAY<BIGINT>) END"""
        ).alias("shingles"),
    )


dd._shingled = patched_shingled


def noop(df):
    df.write.format("noop").mode("overwrite").save()


BUILDS = {
    "sigs": lambda: dd.minhash_index(docs),
    "q17": lambda: QUERIES["q17_minhash_lsh"](spark, SF),
    "q16": lambda: QUERIES["q16_ngram_jaccard"](spark, SF),
    "q80": lambda: QUERIES["q80_incremental_dedup"](spark, SF),
}

res = {}
NS = [None, 8, 4, 2]
# warmup
noop(BUILDS["q17"]())
clear_registry()
for it in range(5):
    for n in NS:
        FORCED_N[0] = n
        for name, build in BUILDS.items():
            df = build()
            sc.setJobDescription(f"spread:{n}:{name}:{it}")
            t0 = time.perf_counter()
            noop(df)
            res.setdefault(f"{name}@{n or 32}", []).append(
                round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
            clear_registry()
    cq = QUERIES["q21_quality_score"](spark, SF)
    t0 = time.perf_counter()
    noop(cq)
    res.setdefault("canary", []).append(round(time.perf_counter() - t0, 3))

FORCED_N[0] = None
dd._shingled = orig_shingled

for k_, v in sorted(res.items()):
    w = sorted(v)
    print(k_, "p50", w[len(w) // 2], "min", w[0], v, flush=True)
json.dump(res, open("/tmp/shingle_spread_ab.json", "w"))
os.remove("/tmp/arc_ab_busy")
print("DONE")
