"""r15 item 7 (VERDICT r14): per-lane A/B of _spread_few_file_input on
the remaining few-file CPU-bound registry lanes — q73_doc_chunking and
q39_repetition_filter (shape candidates from the r14 sweep).

The q70 counter-example (spread REGRESSED it 2x) shows this must be
per-lane A/B'd, not blanket-applied. Alternating spread-on vs
status-quo inside one session, q21 canary.

Writes /tmp/spread_ext_ab_r15.json.
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
    from pyspark.sql import functions as F  # noqa: E402

    from arc_spark.cacheutil import clear_registry  # noqa: E402
    from arc_spark.functions.sampling import (  # noqa: E402
        _spread_few_file_input)
    from arc_spark.functions.text import chunk_documents  # noqa: E402
    from arc_spark.operators.quality import repetition_profile  # noqa: E402
    from arc_spark.session import get_spark  # noqa: E402
    from arc_spark.workload import QUERIES, load_tables  # noqa: E402

    SF = "/root/testdata/sf0.1"
    spark = get_spark()
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def docs():
        return load_tables(spark, SF, register_views=False)["documents"]

    def q39(spread: bool):
        d = _spread_few_file_input(docs()) if spread else docs()
        return repetition_profile(d, min_distinct_frac=0.45,
                                  max_top_word_frac=0.10)

    def q73(spread: bool):
        d = _spread_few_file_input(docs()) if spread else docs()
        chunks = chunk_documents(d, chunk_tokens=64, overlap=16)
        return chunks.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(F.col("end") - F.col("start")).alias("covered_tokens"),
            F.max("chunk_id").alias("max_chunk_id"),
            F.min(F.length("chunk_text")).alias("min_chunk_chars"),
        )

    LANES = {"q39": q39, "q73": q73}

    # row-equality check first (spread must not change results)
    for name, fn in LANES.items():
        a = sorted(map(tuple, fn(False).collect()))
        b = sorted(map(tuple, fn(True).collect()))
        assert a == b, f"{name}: spread changed rows!"
        print(f"{name}: rows equal ({len(a)})", flush=True)

    res: dict[str, list] = {}
    # warmup
    for fn in LANES.values():
        noop(fn(False))
    clear_registry()

    for it in range(7):
        for spread in (False, True):
            tag = "spread" if spread else "base"
            for name, fn in LANES.items():
                df = fn(spread)
                sc.setJobDescription(f"spreadext:{tag}:{name}:{it}")
                t0 = time.perf_counter()
                noop(df)
                res.setdefault(f"{name}@{tag}", []).append(
                    round(time.perf_counter() - t0, 3))
                sc.setJobDescription(None)
                clear_registry()
        cq = QUERIES["q21_quality_score"](spark, SF)
        t0 = time.perf_counter()
        noop(cq)
        res.setdefault("canary", []).append(
            round(time.perf_counter() - t0, 3))

    for k_, v in sorted(res.items()):
        w = sorted(v)
        print(k_, "p50", w[len(w) // 2], "min", w[0], v, flush=True)
    json.dump(res, open("/tmp/spread_ext_ab_r15.json", "w"))
    print("DONE")
finally:
    try:
        os.remove("/tmp/arc_ab_busy")
    except OSError:
        pass
