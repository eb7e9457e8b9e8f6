"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Beyond-reference operators (BASELINE.json north star). Design for 100 TB:

- blobs are `binary` columns co-resident with metadata in Parquet; large
  corpora should store blobs in sharded object-store files and keep
  (uri, offset, length) here instead — the operator signatures below don't
  change.
- decode / feature-extract / resize / frame-sample run as `mapInPandas`
  stages: Arrow-batched, one Python worker per partition, no driver data
  movement.
- `deterministic_stub=False` (the REAL path) decodes PNG images and WAV
  audio with the pure-stdlib codecs in :mod:`arc_spark.multimodal.codecs`
  — actual pixels/samples, actual dimensions, actual per-channel stats.
  Video frame-sampling still needs ffmpeg and raises NotImplementedError;
  `deterministic_stub=True` keeps the hash-derived fake outputs with the
  exact schema/batch shape for plumbing tests.
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


def _real_features(raw: bytes, media_type: str, dim: int) -> list[float]:
    """Decoded-media feature vector: geometry + per-channel/level stats,
    zero-padded to `dim`. PNG, animated GIF, and WAV are real stdlib
    decodes; other video containers need external codecs."""
    from arc_spark.multimodal.codecs import (
        decode_gif,
        decode_png,
        decode_wav,
        image_stats,
    )

    if media_type in ("image/gif", "video/gif"):
        g = decode_gif(raw)
        mid = g["frames"][len(g["frames"]) // 2]["pixels"]
        st = image_stats({"channels": 3, "pixels": mid})
        feats = [g["width"] / 4096.0, g["height"] / 4096.0,
                 g["n_frames"] / 1000.0, g["duration_ms"] / 60000.0]
        feats += st["mean"] + st["min"] + st["max"]
    elif media_type.startswith("image"):
        img = decode_png(raw)
        st = image_stats(img)
        feats = [img["width"] / 4096.0, img["height"] / 4096.0,
                 img["channels"] / 4.0]
        feats += st["mean"] + st["min"] + st["max"]
    elif media_type.startswith("audio"):
        a = decode_wav(raw)
        feats = [a["channels"] / 8.0, a["sample_rate"] / 48000.0,
                 a["duration_ms"] / 60000.0, a["rms"]]
    else:
        raise NotImplementedError(
            f"no stdlib codec for media_type {media_type!r} "
            "(non-GIF video needs ffmpeg)"
        )
    return (feats + [0.0] * dim)[:dim]


def extract_features(
    df: DataFrame,
    blob_col: str = "blob",
    dim: int = 16,
    deterministic_stub: bool = True,
) -> DataFrame:
    """blob → feature vector (array<float>).

    Real path (`deterministic_stub=False`): decode PNG/WAV with the stdlib
    codecs and emit geometry + channel-stat features. Stub path: md5-derived
    floats (deterministic, unit-testable, identical batch shape)."""
    import numpy as np
    import pandas as pd

    out_schema = "blob_id bigint, media_type string, feature array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob, mt in zip(pdf[blob_col], pdf["media_type"]):
                raw = bytes(blob) if blob is not None else b""
                if not deterministic_stub:
                    feats.append([np.float32(x) for x in
                                  _real_features(raw, mt or "", dim)])
                    continue
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

    # ship ONLY the columns the kernel reads across the Arrow boundary
    # (r14, guide §4: Spark cannot see inside the function, so an
    # unpruned frame sends — and reads from storage — every column)
    return df.select("blob_id", "media_type", blob_col).mapInPandas(
        kernel, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    blob_col: str = "blob",
    deterministic_stub: bool = True,
) -> DataFrame:
    """Image resize kernel.

    Real path: PNG decode → nearest-neighbor resample → PNG re-encode
    (stdlib codecs — actual pixels move). Stub: passes the blob through and
    rewrites the metadata only."""
    import pandas as pd

    schema = BLOB_SCHEMA

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            if not deterministic_stub:
                from arc_spark.multimodal.codecs import (
                    decode_png,
                    encode_png,
                    resize_nearest,
                )

                resized = []
                for b in pdf[blob_col]:
                    img = resize_nearest(
                        decode_png(bytes(b or b"")), target_w, target_h
                    )
                    resized.append(encode_png(
                        img["width"], img["height"], img["channels"],
                        bytes(img["pixels"]),
                    ))
                out[blob_col] = resized
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
    """Multi-frame media → one row per sampled frame (blob_id, frame_idx,
    frame_ts_ms, frame binary). The row-expanding (1→N) mapInPandas shape.

    Real kernel (`deterministic_stub=False`): animated GIF decodes with
    the pure-stdlib codec — the visible canvas nearest each sample
    timestamp is re-encoded as a PNG frame. Non-GIF video containers
    (mp4/webm/…) still need ffmpeg and raise honestly. Stub kernel emits
    deterministic slice markers using the `duration_ms` column (no
    decode), keeping the plumbing testable for any container."""
    import pandas as pd

    schema = "blob_id bigint, frame_idx int, frame_ts_ms bigint, frame binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from arc_spark.multimodal.codecs import decode_gif, encode_png

        for pdf in batches:
            rows = {"blob_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for _, r in pdf.iterrows():
                if not deterministic_stub:
                    raw = bytes(r[blob_col] or b"")
                    mt = str(r.get("media_type") or "")
                    if raw[:6] not in (b"GIF87a", b"GIF89a"):
                        raise NotImplementedError(
                            f"frame extraction for {mt or 'unknown'} needs "
                            "ffmpeg; animated GIF is the stdlib-decodable "
                            "container"
                        )
                    g = decode_gif(raw)
                    # cumulative end-time per frame; zero-delay frames get
                    # the GIF-player floor of 10ms so sampling advances
                    ends = []
                    t = 0
                    for fr in g["frames"]:
                        t += max(fr["delay_ms"], 10)
                        ends.append(t)
                    fi = 0
                    for i, ts in enumerate(range(0, max(ends[-1], 1), every_ms)):
                        while fi < len(ends) - 1 and ends[fi] <= ts:
                            fi += 1
                        rows["blob_id"].append(r["blob_id"])
                        rows["frame_idx"].append(i)
                        rows["frame_ts_ms"].append(ts)
                        rows["frame"].append(encode_png(
                            g["width"], g["height"], 3,
                            g["frames"][fi]["pixels"],
                        ))
                    continue
                dur = int(r["duration_ms"] or 0)
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    marker = hashlib.md5(
                        bytes(r[blob_col] or b"") + ts.to_bytes(8, "big")
                    ).digest()
                    rows["blob_id"].append(r["blob_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame"].append(marker)
            yield pd.DataFrame(rows)

    # prune to the kernel's read set before the Arrow boundary (r14,
    # guide §4); media_type/duration_ms are optional in caller frames
    need = ["blob_id", blob_col] + [
        c for c in ("media_type", "duration_ms") if c in df.columns]
    return df.select(*need).mapInPandas(kernel, schema=schema)
