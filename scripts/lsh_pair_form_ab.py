#!/usr/bin/env python
"""Alternating A/B of the LSH in-bucket pair-generation forms on a
REALISTIC corpus (VERDICT r13 item 6 — extend the factor-16 parity
claim to factor 64).

Old form (pre-r13): nested transform×transform + flatten builds ALL
c² in-bucket pairs as ONE array value per (band,bucket) row — crosses
Spark's 2³¹ array-element limit at c≈65k docs (the r12-advice failure
shape) but was at parity on realistic corpora at factor 16.
New form (r13, shipped): posexplode + slice-explode streams the same
ordered pairs as generate-operator rows.

This probe builds band_rows through the OPERATOR'S OWN internals
(_shingled + _signatures_from_shingled + the identical band transform)
so the compared subplans diverge only at the pair-expansion step, then
alternates warm passes old/new/old/new... in one session. Output counts
are asserted identical.

Usage: python scripts/lsh_pair_form_ab.py [factor] [passes_per_form]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arc_spark.session import get_spark  # noqa: E402
from arc_spark.operators.dedup import (  # noqa: E402
    _shingled, _signatures_from_shingled)
from scaling_probe import scaled_documents  # noqa: E402

K, NUM_HASHES, BANDS = 3, 128, 64
R = NUM_HASHES // BANDS


def band_rows_frame(docs):
    sh = _shingled(docs, "doc_id", "text", K)
    sigs = _signatures_from_shingled(sh, NUM_HASHES)
    band_arr = F.expr(
        f"transform(sequence(0, {BANDS - 1}), i -> xxhash64("
        + ",".join(f"element_at(sig, {R} * i + {j + 1})" for j in range(R))
        + "))"
    )
    return sigs.select(
        "doc",
        F.posexplode_outer(
            F.when(F.col("sig").isNotNull(), band_arr)
        ).alias("band", "bucket"),
    ).filter(F.col("bucket").isNotNull())


def grouped(docs):
    return (
        band_rows_frame(docs)
        .groupBy("band", "bucket")
        .agg(F.collect_list("doc").alias("ds"))
        .filter(F.size("ds") >= 2)
    )


def cands_new(docs):
    return (
        grouped(docs)
        .select("ds", F.posexplode("ds").alias("i", "a"))
        .select(
            "a",
            F.explode(F.expr("slice(ds, i + 2, size(ds) - i - 1)"))
            .alias("b"),
        )
        .select(F.least("a", "b").alias("doc_a"),
                F.greatest("a", "b").alias("doc_b"))
        .distinct()
    )


def cands_old(docs):
    # verbatim pre-r13 expansion (git 54c20ed~1 dedup.py:949-960)
    return (
        grouped(docs)
        .select(F.explode_outer(F.expr(
            "filter(flatten(transform(ds, a -> transform(ds,"
            " b -> struct(a AS doc_a, b AS doc_b)))),"
            " p -> p.doc_a < p.doc_b)")).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(cpus=32, shuffle_partitions=32)
    docs = scaled_documents(spark, factor).persist()
    n = docs.count()
    print(f"corpus: {n} docs (factor {factor})", file=sys.stderr)

    # warm both subplans once (codegen + shuffle files), discard
    c_new = cands_new(docs).count()
    c_old = cands_old(docs).count()
    assert c_new == c_old, (c_new, c_old)

    times: dict[str, list[float]] = {"old": [], "new": []}
    for p in range(passes):
        order = ["old", "new"] if p % 2 == 0 else ["new", "old"]
        for form in order:
            fn = cands_old if form == "old" else cands_new
            t0 = time.perf_counter()
            cnt = fn(docs).count()
            dt = time.perf_counter() - t0
            times[form].append(round(dt, 2))
            print(f"  pass {p} {form}: {dt:.2f}s ({cnt} pairs)",
                  file=sys.stderr, flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    print(json.dumps({
        "probe": "lsh_pair_form_ab", "factor": factor, "n_docs": n,
        "pairs": c_new, "bands": BANDS, "passes": passes,
        "old_s": times["old"], "new_s": times["new"],
        "old_med_s": med["old"], "new_med_s": med["new"],
        "new_over_old": round(med["new"] / med["old"], 3),
    }))


if __name__ == "__main__":
    main()
