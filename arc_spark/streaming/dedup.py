"""Streaming deduplication — the ingest-time dedup the reference defers to
compaction (arc dedups at compaction time, `internal/compaction/dedup.go`;
Structured Streaming can do it on the way IN, bounding duplicate exposure
to one watermark instead of one compaction cycle).

Two semantics, matching the batch pair in `operators/dedup.py`:

- :func:`dedup_stream_exact` — drop exact repeats of a key within the
  watermark. State is bounded: `dropDuplicatesWithinWatermark` evicts keys
  whose event time has passed the watermark, so state size tracks the
  duplicate-arrival window, not the stream's lifetime key cardinality
  (plain dropDuplicates on an unbounded stream grows state forever — the
  classic streaming-dedup failure at scale).
- batch DataFrames take the plain `dropDuplicates` path (no watermark
  needed; semantics identical for a finite frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream_exact(
    events: DataFrame,
    key_cols: list[str],
    time_col: str = "time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence of each key wins; later arrivals within the
    watermark window are dropped. Works on both streaming and batch
    frames (same call site in a CQ that gets upgraded to streaming)."""
    if events.isStreaming:
        return events.withWatermark(time_col, watermark) \
            .dropDuplicatesWithinWatermark(key_cols)
    return events.dropDuplicates(key_cols)


def dedup_stream_against_index(
    docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    time_col: str = "time",
    watermark: str = "10 minutes",
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 64,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup flags for a STREAM of documents against a static
    :func:`arc_spark.operators.dedup.minhash_index` — ingest-time
    near-dup screening (the batch :func:`dedup_against_index` workflow
    moved to the arrival path, so a duplicate shard is flagged within
    one trigger instead of one compaction/batch cycle).

    Emits one row per flagged arriving doc: ``(<id_col>, <time_col>,
    index_doc, jaccard)`` where ``jaccard`` is the MinHash
    slot-agreement ESTIMATE — the stream side never touches corpus
    text (exact verify belongs to the batch path; estimator sigma ~=
    sqrt(j(1-j)/num_hashes), ~0.04 at the defaults).

    Plan shape, all streaming-legal:

    1. stateless projections (tokenize -> hashed shingles -> signature
       -> band explode), the arriving doc's signature CARRIED on each
       band row (~8*num_hashes bytes x bands per doc through the join —
       the price of scoring without a stream-stream self-join, which
       Structured Streaming would reject);
    2. a STREAM-STATIC equi-join on (band, bucket) — no streaming
       state; Spark re-plans the static side per micro-batch, so a
       REFRESHED index parquet is picked up on the next trigger;
    3. ``dropDuplicatesWithinWatermark`` on (doc, index_doc) collapses
       multi-band matches with WATERMARK-BOUNDED state (the pair space
       of one duplicate-arrival window, not the stream's lifetime);
    4. static-side signature join + slot-agreement score + threshold.

    Batch frames take the identical pipeline with plain
    ``dropDuplicates`` — same call site works in a CQ before and after
    its streaming upgrade (the module's standing contract).
    """
    from pyspark.sql import functions as F

    from arc_spark.operators.dedup import (
        _band_rows,
        _shingled,
        _signatures_from_shingled,
    )

    sh = _shingled(docs, id_col, text_col, k, extra_cols=(time_col,))
    sigs = _signatures_from_shingled(sh, num_hashes,
                                     extra_cols=(time_col,))
    nb = _band_rows(sigs, num_hashes, bands,
                    extra_cols=(time_col, "sig"))
    ib = _band_rows(index.select("doc", "sig"), num_hashes, bands)
    matched = (
        nb.alias("n").join(
            ib.alias("i"),
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.bucket") == F.col("i.bucket")),
        )
        .select(F.col("n.doc").alias("doc"),
                F.col(f"n.{time_col}").alias(time_col),
                F.col("n.sig").alias("sig_a"),
                F.col("i.doc").alias("index_doc"))
    )
    if docs.isStreaming:
        matched = matched.withWatermark(time_col, watermark) \
            .dropDuplicatesWithinWatermark(["doc", "index_doc"])
    else:
        matched = matched.dropDuplicates(["doc", "index_doc"])
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)),"
        " 0, (acc, v) -> acc + v)")
    return (
        matched.join(index.select(F.col("doc").alias("index_doc"),
                                  F.col("sig").alias("sig_b")),
                     "index_doc")
        .withColumn("jaccard",
                    est.cast("double") / F.lit(float(num_hashes)))
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("doc").alias(id_col), time_col, "index_doc",
                "jaccard")
    )
