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
