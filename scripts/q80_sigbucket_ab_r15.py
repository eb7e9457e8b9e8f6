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
    # --- the REFUTED kernel, inlined so this negative result stays\n    # --- reproducible (the production function was removed after the A/B)\n    def _bucket_rows_from_sigs_refuted(sigs, num_hashes, bands):\n        import arc_spark.operators.dedup as _dd\n        from pyspark.sql import functions as F\n        from pyspark.sql.types import (ArrayType, LongType, StructField,\n                                       StructType)\n\n        _dd._validate_band_geometry(num_hashes, bands)\n        fields = [sigs.schema["doc"],\n                  StructField("buckets", ArrayType(LongType()), True)]\n\n        def gen(batches):\n            import numpy as np\n            import pandas as pd\n\n            with np.errstate(over="ignore"):\n                for pdf in batches:\n                    cells = pdf["sig"].to_numpy()\n                    n = len(pdf)\n                    live = [j for j in range(n) if cells[j] is not None]\n                    out = [None] * n\n                    if live:\n                        mins = (np.vstack([cells[j] for j in live])\n                                .astype(np.int64).view(np.uint64).T)\n                        mins = np.ascontiguousarray(mins)\n                        bk_mat = (_dd._numpy_band_buckets(mins, bands)\n                                  .view(np.int64).T)\n                        for row, j in enumerate(live):\n                            out[j] = bk_mat[row]\n                    yield pd.DataFrame({\n                        "doc": pdf["doc"],\n                        "buckets": pd.Series(out, dtype=object)})\n\n        bks = sigs.mapInPandas(gen, StructType(fields))\n        return bks.select(\n            "doc", F.posexplode_outer("buckets").alias("band", "bucket"),\n        ).filter(F.col("bucket").isNotNull())\n
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

    # dedup_against_index's exact path uses _band_rows ONLY for the
    # index side, so swapping the module attribute swaps exactly ib
    orig_band_rows = dd._band_rows

    def kernel_band_rows(sigs, num_hashes, bands, extra_cols=()):
        assert not extra_cols
        return _bucket_rows_from_sigs_refuted(sigs, num_hashes, bands)

    def dedup_count():
        cacheutil.clear_registry()
        return dd.dedup_against_index(new, idx, threshold=0.8,
                                      num_hashes=128, bands=64,
                                      corpus=corpus).count()

    # result equivalence first
    dd._band_rows = kernel_band_rows
    a = sorted(map(tuple, dd.dedup_against_index(
        new, idx, threshold=0.8, num_hashes=128, bands=64,
        corpus=corpus).collect()))
    dd._band_rows = orig_band_rows
    b = sorted(map(tuple, dd.dedup_against_index(
        new, idx, threshold=0.8, num_hashes=128, bands=64,
        corpus=corpus).collect()))
    assert a == b, "RESULT MISMATCH"
    print("results equal:", len(a), "rows", flush=True)

    res = {"kernel": [], "catalyst": [], "canary": []}
    for i in range(7):
        for name, impl in (("kernel", kernel_band_rows),
                           ("catalyst", orig_band_rows)):
            dd._band_rows = impl
            t0 = time.perf_counter(); dedup_count()
            res[name].append(round(time.perf_counter() - t0, 3))
        dd._band_rows = orig_band_rows
        t0 = time.perf_counter()
        QUERIES["q21_quality_score"](spark, sf_dir).count()
        res["canary"].append(round(time.perf_counter() - t0, 3))
        print(f"iter {i}: " + " ".join(f"{k}={res[k][-1]}" for k in res),
              flush=True)
    for k, v in res.items():
        print(k, "p50", round(statistics.median(v), 3), "min", min(v), v)
    wins = sum(1 for a_, b_ in zip(res["kernel"], res["catalyst"])
               if a_ < b_)
    print(f"kernel wins {wins}/7 aligned")
    spark.stop(); shutil.rmtree(idx_dir, ignore_errors=True)
finally:
    os.remove("/tmp/arc_ab_busy")
