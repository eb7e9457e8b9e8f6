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
# --- the REFUTED kernel, inlined so this negative result stays
# --- reproducible (the production function was removed after the A/B)
def _bucket_rows_from_sigs_refuted(sigs, num_hashes, bands):
    import arc_spark.operators.dedup as _dd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (ArrayType, LongType, StructField,
                                   StructType)

    _dd._validate_band_geometry(num_hashes, bands)
    fields = [sigs.schema["doc"],
              StructField("buckets", ArrayType(LongType()), True)]

    def gen(batches):
        import numpy as np
        import pandas as pd

        with np.errstate(over="ignore"):
            for pdf in batches:
                cells = pdf["sig"].to_numpy()
                n = len(pdf)
                live = [j for j in range(n) if cells[j] is not None]
                out = [None] * n
                if live:
                    mins = (np.vstack([cells[j] for j in live])
                            .astype(np.int64).view(np.uint64).T)
                    mins = np.ascontiguousarray(mins)
                    bk_mat = (_dd._numpy_band_buckets(mins, bands)
                              .view(np.int64).T)
                    for row, j in enumerate(live):
                        out[j] = bk_mat[row]
                yield pd.DataFrame({
                    "doc": pdf["doc"],
                    "buckets": pd.Series(out, dtype=object)})

    bks = sigs.mapInPandas(gen, StructType(fields))
    return bks.select(
        "doc", F.posexplode_outer("buckets").alias("band", "bucket"),
    ).filter(F.col("bucket").isNotNull())


while os.path.exists("/tmp/arc_hunter_firing"):
    time.sleep(30)
open("/tmp/arc_ab_busy", "w").close()
try:
    from arc_spark.session import get_spark
    import arc_spark.operators.dedup as dd
    from arc_spark.workload import load_tables
    from pyspark.sql import functions as F
    spark = get_spark(app_name="ib-scale-ab")
    sf_dir = "/root/testdata/sf0.1"
    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    base_dir = tempfile.mkdtemp(prefix="arc_ib_scale_")
    dd.minhash_index(corpus).write.mode("overwrite").parquet(base_dir + "/b")
    base = spark.read.parquet(base_dir + "/b").select("doc", "sig")
    for mult in (1, 16, 64):
        big = base
        if mult > 1:
            # distinct docs so the band join semantics don't matter; we
            # only time the banding subtree (noop sink)
            big = base.withColumn("doc", F.concat(F.col("doc"), F.lit("_x")))
            frames = [base.withColumn("doc", F.concat(F.col("doc"), F.lit(f"_{i}")))
                      for i in range(mult)]
            from functools import reduce
            big = reduce(lambda a, b: a.union(b), frames)
        d = base_dir + f"/m{mult}"
        big.write.mode("overwrite").parquet(d)
        sigs = spark.read.parquet(d)
        n = sigs.count()
        def noop(df): df.write.format("noop").mode("overwrite").save()
        # warm both
        noop(_bucket_rows_from_sigs_refuted(sigs, 128, 64))
        noop(dd._band_rows(sigs, 128, 64))
        res = {"kernel": [], "catalyst": []}
        for i in range(5):
            for name, fn in (("kernel", lambda: noop(_bucket_rows_from_sigs_refuted(sigs, 128, 64))),
                             ("catalyst", lambda: noop(dd._band_rows(sigs, 128, 64)))):
                t0 = time.perf_counter(); fn()
                res[name].append(round(time.perf_counter()-t0, 3))
        print(f"rows={n}: kernel p50 {statistics.median(res['kernel']):.3f} {res['kernel']}  "
              f"catalyst p50 {statistics.median(res['catalyst']):.3f} {res['catalyst']}", flush=True)
    spark.stop(); shutil.rmtree(base_dir, ignore_errors=True)
finally:
    os.remove("/tmp/arc_ab_busy")
