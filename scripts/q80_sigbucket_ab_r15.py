"""r15 NEGATIVE RESULT (committed per the round discipline): banding the
stored-signature index side of dedup_against_index through a numpy
mapInPandas kernel (sig -> band buckets, bit-identical chained XXH64)
LOSES to the Catalyst expression at every measured index size:

  lane-level (4k-doc index, alternating, 7 iters): kernel p50 2.17 /
  min 1.76 vs catalyst p50 1.95 / min 1.72 - kernel 2/7 aligned wins.
  banding subtree only (noop sink, ib_scale_ab_r15.py): 4k rows 0.46 vs
  0.21 s; 64k rows min 0.91 vs 0.27; 256k rows min 4.1 vs 1.1 s.

Chained xxhash64 over LONG slots is a few ns each even interpreted; the
kernel pays the full Arrow transfer of the signatures (1 KB/doc) plus
per-row ndarray assembly. The r14 shard-side kernel-buckets win came
from HALVING an already-paid crossing (signatures were already being
computed in Python); a stored index has no crossing to halve. The
_numpy_band_buckets factoring (shared band math) stays - it is used by
the shingle kernel."""
import os, sys, time, tempfile, shutil, statistics
sys.path.insert(0, "/root/repo")
while os.path.exists("/tmp/arc_hunter_firing"):
    time.sleep(30)
open("/tmp/arc_ab_busy", "w").close()
try:
    from arc_spark.session import get_spark
    from arc_spark import cacheutil
    import arc_spark.operators.dedup as dd
    from arc_spark.workload import load_tables, QUERIES
    from pyspark.sql import functions as F
    spark = get_spark(app_name="q80-sigbucket-ab")
    sf_dir = "/root/testdata/sf0.1"
    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx_dir = tempfile.mkdtemp(prefix="arc_q80_sb_")
    dd.minhash_index(corpus).write.mode("overwrite").parquet(idx_dir)
    idx = spark.read.parquet(idx_dir)

    kernel_impl = dd._bucket_rows_from_sigs
    def catalyst_impl(sigs, num_hashes, bands):
        return dd._band_rows(sigs, num_hashes, bands)

    def run():
        cacheutil.clear_registry()
        return dedup_count()
    def dedup_count():
        return dd.dedup_against_index(new, idx, threshold=0.8, num_hashes=128,
                                      bands=64, corpus=corpus).count()
    # result equivalence first
    dd._bucket_rows_from_sigs = kernel_impl
    a = sorted(map(tuple, dd.dedup_against_index(new, idx, threshold=0.8,
               num_hashes=128, bands=64, corpus=corpus).collect()))
    dd._bucket_rows_from_sigs = catalyst_impl
    b = sorted(map(tuple, dd.dedup_against_index(new, idx, threshold=0.8,
               num_hashes=128, bands=64, corpus=corpus).collect()))
    assert a == b, "RESULT MISMATCH"
    print("results equal:", len(a), "rows", flush=True)

    res = {"kernel": [], "catalyst": [], "canary": []}
    for i in range(7):
        for name, impl in (("kernel", kernel_impl), ("catalyst", catalyst_impl)):
            dd._bucket_rows_from_sigs = impl
            cacheutil.clear_registry()
            t0 = time.perf_counter(); dedup_count()
            res[name].append(round(time.perf_counter()-t0, 3))
        t0 = time.perf_counter()
        QUERIES["q21_quality_score"](spark, sf_dir).count()
        res["canary"].append(round(time.perf_counter()-t0, 3))
        print(f"iter {i}: " + " ".join(f"{k}={res[k][-1]}" for k in res), flush=True)
    for k, v in res.items():
        print(k, "p50", round(statistics.median(v),3), "min", min(v), v)
    wins = sum(1 for a_,b_ in zip(res["kernel"],res["catalyst"]) if a_<b_)
    print(f"kernel wins {wins}/7 aligned")
    spark.stop(); shutil.rmtree(idx_dir, ignore_errors=True)
finally:
    os.remove("/tmp/arc_ab_busy")
