"""A/B: kernel-banded buckets vs signature+Catalyst-band (r14 session 4).

Alternates ARC_LSH_BUCKET_SRC=kernel/sig per aligned pass inside ONE
tuned session (the only trusted perf evidence on this host), q21 as the
untouched-lane canary, noop sink, clear_registry between samples.
Also proves rows-equal at sf0.01 AND sf0.1 and runs the driver-style
oracle compare for q17 at both SFs.

Writes /tmp/q17_bucket_kernel_ab.json.
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

from arc_spark.session import get_spark  # noqa: E402
from arc_spark.workload import QUERIES, ORACLES  # noqa: E402
from arc_spark import cacheutil  # noqa: E402

spark = get_spark()
sc = spark.sparkContext
SF = "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def sample(name, env):
    if env is None:
        os.environ.pop("ARC_LSH_BUCKET_SRC", None)
    else:
        os.environ["ARC_LSH_BUCKET_SRC"] = env
    df = QUERIES[name](spark, SF)
    sc.setJobDescription(f"ab:{name}:{env}")
    t0 = time.perf_counter()
    noop(df)
    dt = time.perf_counter() - t0
    sc.setJobDescription(None)
    cacheutil.clear_registry()
    os.environ.pop("ARC_LSH_BUCKET_SRC", None)
    return dt


# rows-equal + oracle parity first
from tests._oracle import compare  # noqa: E402

parity = {}
for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    df = QUERIES["q17_minhash_lsh"](spark, sf)
    ok, msg = compare(df, ORACLES["q17_minhash_lsh"], sf)
    parity[sf] = [bool(ok), str(msg)[:120]]
    cacheutil.clear_registry()
    os.environ["ARC_LSH_BUCKET_SRC"] = "sig"
    a = sorted(map(tuple, QUERIES["q17_minhash_lsh"](spark, sf).collect()))
    os.environ.pop("ARC_LSH_BUCKET_SRC", None)
    cacheutil.clear_registry()
    b = sorted(map(tuple, QUERIES["q17_minhash_lsh"](spark, sf).collect()))
    cacheutil.clear_registry()
    parity[sf].append(a == b)
    print(sf, parity[sf], flush=True)

# warmup both forms
sample("q17_minhash_lsh", "kernel")
sample("q17_minhash_lsh", "sig")

kern, sig, canary = [], [], []
for i in range(13):
    kern.append(sample("q17_minhash_lsh", "kernel"))
    canary.append(sample("q21_quality_score", None))
    sig.append(sample("q17_minhash_lsh", "sig"))
    print(f"pass {i}: kernel={kern[-1]:.3f} sig={sig[-1]:.3f} "
          f"canary={canary[-1]:.3f}", flush=True)

p50 = lambda xs: sorted(xs)[len(xs) // 2]
out = {
    "parity": parity,
    "kernel": {"p50": round(p50(kern), 3), "min": round(min(kern), 3),
               "all": [round(x, 3) for x in kern]},
    "sig": {"p50": round(p50(sig), 3), "min": round(min(sig), 3),
            "all": [round(x, 3) for x in sig]},
    "canary_q21": {"p50": round(p50(canary), 3),
                   "all": [round(x, 3) for x in canary]},
    "aligned_wins_kernel": sum(1 for a, b in zip(kern, sig) if a < b),
}
with open("/tmp/q17_bucket_kernel_ab.json", "w") as fh:
    json.dump(out, fh, indent=1)
os.remove("/tmp/arc_ab_busy")
print(json.dumps(out))
