"""r15 operator checklist: interleaved warm sweep over ALL registry
lanes at sf0.1 (the r14 sweep methodology — pass 1 of every lane, then
pass 2, so one steal wave cannot poison a lane's both samples).

Each lane is timed as the bench times it: construction + count (collect
for the LIMIT lane) with the operator-cache registry cleared between
lanes. Writes /tmp/registry_sweep_r15.json sorted by p50.
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
    from arc_spark import cacheutil  # noqa: E402
    from arc_spark.session import get_spark  # noqa: E402
    from arc_spark.workload import QUERIES  # noqa: E402

    SF = "/root/testdata/sf0.1"
    spark = get_spark()
    sc = spark.sparkContext

    res: dict[str, list] = {}
    lanes = list(QUERIES)
    PASSES = 3
    for p in range(PASSES):
        for name in lanes:
            cacheutil.clear_registry()
            sc.setJobDescription(f"sweep:{name}:{p}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF)
            n = (len(df.collect())
                 if name == "q78_select_order_limit" else df.count())
            res.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
    out = {}
    for name, v in res.items():
        w = sorted(v[1:]) or sorted(v)  # drop the cold pass
        out[name] = {"p50": w[len(w) // 2], "min": w[0], "all": v}
    for name, d in sorted(out.items(), key=lambda kv: -kv[1]["p50"]):
        print(f"{name}: p50 {d['p50']} min {d['min']} {d['all']}",
              flush=True)
    json.dump(out, open("/tmp/registry_sweep_r15.json", "w"))
    print("DONE")
finally:
    try:
        os.remove("/tmp/arc_ab_busy")
    except OSError:
        pass
