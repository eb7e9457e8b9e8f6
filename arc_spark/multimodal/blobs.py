"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference operators (BASELINE.json north star). Design for 100 TB:

- blobs are `binary` columns co-resident with metadata in Parquet; large
  corpora should store blobs in sharded object-store files and keep
  (uri, offset, length) here instead — the operator signatures below don't
  change.
- decode / feature-extract / resize / frame-sample run as `mapInPandas`
  stages: Arrow-batched, one Python worker per partition, no driver data
  movement. Real codecs (PIL/torchaudio/ffmpeg) aren't in this container, so
  the decode kernel is STUBBED: `deterministic_stub=True` produces
  hash-derived fake outputs with the exact schema/batch shape the real
  kernel would emit; `deterministic_stub=False` raises NotImplementedError
  until a codec is wired in. The Spark-side plumbing — schema, partitioning,
  UDF signature, batch iteration — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

BLOB_SCHEMA = (
    "blob_id bigint, media_type string, blob binary, "
    "width int, height int, duration_ms bigint, codec string"
)


def blob_table(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, BLOB_SCHEMA)


def _decode_stub(blob: bytes, media_type: str) -> bytes:
    raise NotImplementedError(
        "media codecs are not available in this environment; pass "
        "deterministic_stub=True or wire a real decoder (PIL/ffmpeg) here"
    )


def extract_features(
    df: DataFrame,
    blob_col: str = "blob",
    dim: int = 16,
    deterministic_stub: bool = True,
) -> DataFrame:
    """blob → feature vector (array<float>). Real path: a vision/audio model
    over decoded media. Stub path: md5-derived floats (deterministic, unit-
    testable, identical batch shape)."""
    import numpy as np
    import pandas as pd

    out_schema = f"blob_id bigint, media_type string, feature array<float>"
    cols = df.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                raw = bytes(blob) if blob is not None else b""
                if not deterministic_stub:
                    _decode_stub(raw, "")
                h = hashlib.md5(raw).digest()
                rng = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4],
                                    dtype=np.uint32)
                feats.append((rng.astype(np.float64) / np.iinfo(np.uint32).max)
                             .astype(np.float32).tolist())
            yield pd.DataFrame({
                "blob_id": pdf["blob_id"],
                "media_type": pdf["media_type"],
                "feature": feats,
            })

    return df.mapInPandas(kernel, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    blob_col: str = "blob",
    deterministic_stub: bool = True,
) -> DataFrame:
    """Image resize kernel. Stub: passes the blob through and rewrites the
    metadata (the real kernel decodes + resamples via PIL)."""
    import pandas as pd

    schema = BLOB_SCHEMA

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_stub:
                for b in pdf[blob_col]:
                    _decode_stub(bytes(b or b""), "image")
            out = pdf.copy()
            out["width"] = target_w
            out["height"] = target_h
            yield out

    return df.mapInPandas(kernel, schema=schema)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    blob_col: str = "blob",
    deterministic_stub: bool = True,
) -> DataFrame:
    """Video → one row per sampled frame (blob_id, frame_idx, frame_ts_ms,
    frame binary). Stub emits deterministic slice markers; real kernel uses
    ffmpeg. Shows the row-expanding (1→N) mapInPandas shape."""
    import pandas as pd

    schema = "blob_id bigint, frame_idx int, frame_ts_ms bigint, frame binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"blob_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                if not deterministic_stub:
                    _decode_stub(bytes(r[blob_col] or b""), "video")
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    marker = hashlib.md5(
                        bytes(r[blob_col] or b"") + ts.to_bytes(8, "big")
                    ).digest()
                    rows["blob_id"].append(r["blob_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame"].append(marker)
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, schema=schema)
