"""r15 item 1 (VERDICT r14): settle q45/q46 vs the bytes-derived shingle
spread width on a quiet 32-core box.

The r14 driver bench read q45_dup_clusters at 2.178 s (0.71x) on a
sentinel-INVALID run while the builder's clean witnesses read ~1.0 s;
q45 is the family's most width-sensitive lane (connected-components
iterations stack on top of the pair join). This A/B alternates the
IMPLEMENTED width (bytes-derived, resolves to 5 at sf0.1) against a
FORCED defaultParallelism(32) width on q45 AND q46, with a q21 canary,
inside one session — the only perf evidence this host trusts.

Writes /tmp/q45_width_ab_r15.json.
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
    import arc_spark.operators.dedup as dd  # noqa: E402
    from arc_spark.cacheutil import clear_registry  # noqa: E402
    from arc_spark.session import get_spark  # noqa: E402
    from arc_spark.workload import QUERIES  # noqa: E402

    SF = "/root/testdata/sf0.1"
    spark = get_spark()
    sc = spark.sparkContext

    orig_width = dd._shingle_spread_width
    FORCED = [None]  # None = implemented (bytes-derived)

    def patched_width(df):
        if FORCED[0] is None:
            return orig_width(df)
        return FORCED[0]

    dd._shingle_spread_width = patched_width

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    LANES = ("q45_dup_clusters", "q46_cluster_canonical")
    res: dict[str, list] = {}
    # warmup both lanes once
    for lane in LANES:
        noop(QUERIES[lane](spark, SF))
        clear_registry()

    for it in range(7):
        for forced in (None, 32):
            FORCED[0] = forced
            tag = "impl" if forced is None else "w32"
            for lane in LANES:
                # construction INSIDE the timer: connected_components'
                # bounded small-graph probe (limit+collect union-find)
                # runs at construction time, exactly like the bench's
                # _q_thunk which times fn(spark, sf_dir) + count
                sc.setJobDescription(f"q45ab:{tag}:{lane}:{it}")
                t0 = time.perf_counter()
                noop(QUERIES[lane](spark, SF))
                res.setdefault(f"{lane}@{tag}", []).append(
                    round(time.perf_counter() - t0, 3))
                sc.setJobDescription(None)
                clear_registry()
        cq = QUERIES["q21_quality_score"](spark, SF)
        t0 = time.perf_counter()
        noop(cq)
        res.setdefault("canary", []).append(
            round(time.perf_counter() - t0, 3))

    FORCED[0] = None
    dd._shingle_spread_width = orig_width

    for k_, v in sorted(res.items()):
        w = sorted(v)
        print(k_, "p50", w[len(w) // 2], "min", w[0], v, flush=True)
    json.dump(res, open("/tmp/q45_width_ab_r15.json", "w"))
    print("DONE")
finally:
    # ADVICE r14: always release the bench-hunter gate marker
    try:
        os.remove("/tmp/arc_ab_busy")
    except OSError:
        pass
