"""Real (stdlib) media codecs + the non-stub multimodal lanes: PNG pixels
and WAV samples actually decode — the round-1 stub gap closed without
external deps."""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from arc_spark.multimodal.codecs import (
    MediaDecodeError,
    decode_png,
    decode_wav,
    encode_png,
    image_stats,
    resize_nearest,
)


def _gradient_png(w=8, h=6, channels=3) -> tuple[bytes, bytes]:
    px = bytearray()
    for y in range(h):
        for x in range(w):
            val = (x * 255) // max(w - 1, 1)
            px += bytes([val] * channels)
    return encode_png(w, h, channels, bytes(px)), bytes(px)


def _sine_wav(seconds=0.1, rate=8000, freq=440) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        n = int(seconds * rate)
        frames = b"".join(
            struct.pack("<h", int(20000 * math.sin(2 * math.pi * freq * i / rate)))
            for i in range(n)
        )
        wf.writeframes(frames)
    return buf.getvalue()


class TestPngCodec:
    def test_roundtrip(self):
        data, px = _gradient_png()
        img = decode_png(data)
        assert (img["width"], img["height"], img["channels"]) == (8, 6, 3)
        assert bytes(img["pixels"]) == px

    def test_stats(self):
        data, _ = _gradient_png(w=2, h=1)  # pixels 0 and 255
        st = image_stats(decode_png(data))
        assert st["min"] == [0.0, 0.0, 0.0] and st["max"] == [1.0, 1.0, 1.0]
        assert all(abs(m - 0.5) < 0.01 for m in st["mean"])

    def test_resize(self):
        data, _ = _gradient_png(w=8, h=8)
        out = resize_nearest(decode_png(data), 4, 4)
        assert (out["width"], out["height"]) == (4, 4)
        assert len(out["pixels"]) == 4 * 4 * 3
        # gradient preserved: left column darker than right
        assert out["pixels"][0] < out["pixels"][9]

    def test_rejects_garbage(self):
        with pytest.raises(MediaDecodeError):
            decode_png(b"not a png at all")

    def test_filtered_scanlines(self):
        # encode_png writes filter 0; round-trip a PIL-style Sub/Up image by
        # hand-crafting filters through a second decode of re-encoded data
        data, px = _gradient_png(w=16, h=4, channels=4)
        img = decode_png(data)
        again = decode_png(encode_png(16, 4, 4, bytes(img["pixels"])))
        assert bytes(again["pixels"]) == px


class TestWavCodec:
    def test_sine_properties(self):
        a = decode_wav(_sine_wav())
        assert a["channels"] == 1 and a["sample_rate"] == 8000
        assert a["duration_ms"] == 100
        # sine RMS ≈ amplitude/√2 = (20000/32768)/1.414 ≈ 0.43
        assert abs(a["rms"] - 0.43) < 0.02

    def test_rejects_garbage(self):
        with pytest.raises(MediaDecodeError):
            decode_wav(b"RIFFgarbage")


class TestRealLanes:
    def test_extract_features_real_png_and_wav(self, spark):
        from arc_spark.multimodal import blob_table, extract_features

        png, _ = _gradient_png(w=32, h=16)
        wav = _sine_wav()
        df = blob_table(spark, [
            (1, "image/png", bytearray(png), 32, 16, None, "png"),
            (2, "audio/wav", bytearray(wav), None, None, 100, "pcm16"),
        ])
        out = {r["blob_id"]: r["feature"]
               for r in extract_features(df, deterministic_stub=False).collect()}
        img_f, wav_f = out[1], out[2]
        assert abs(img_f[0] - 32 / 4096) < 1e-6  # width feature
        assert abs(img_f[1] - 16 / 4096) < 1e-6  # height feature
        assert abs(wav_f[3] - 0.43) < 0.02       # rms feature
        assert len(img_f) == len(wav_f) == 16

    def test_resize_images_real(self, spark):
        from arc_spark.multimodal import blob_table, resize_images
        from arc_spark.multimodal.codecs import decode_png

        png, _ = _gradient_png(w=8, h=8)
        df = blob_table(spark, [(1, "image/png", bytearray(png), 8, 8, None, "png")])
        row = resize_images(df, 4, 2, deterministic_stub=False).collect()[0]
        assert row["width"] == 4 and row["height"] == 2
        img = decode_png(bytes(row["blob"]))
        assert (img["width"], img["height"]) == (4, 2)


def test_wav_8bit_decodes():
    """Review regression: 8-bit WAV (unsigned samples) crashed the decoder
    with a plain ValueError on any negative-amplitude sample."""
    import io as _io
    import wave as _wave

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes([0, 64, 128, 192, 255] * 100))
    a = decode_wav(buf.getvalue())
    assert a["channels"] == 1 and a["n_frames"] == 500
    assert 0.0 < a["rms"] <= 1.0


class TestGifCodec:
    """Pure-stdlib animated-GIF decode (LZW, interlace, composition) — the
    container that makes frame sampling a REAL lane without ffmpeg."""

    def _two_frame(self, w=4, h=3):
        from arc_spark.multimodal.codecs import encode_gif

        f0 = bytes(range(w * h))
        f1 = bytes([7] * (w * h))
        return f0, f1, encode_gif(
            w, h, [{"indices": f0, "delay_ms": 40},
                   {"indices": f1, "delay_ms": 60}])

    def test_roundtrip_two_frames(self):
        from arc_spark.multimodal.codecs import decode_gif

        f0, f1, gif = self._two_frame()
        g = decode_gif(gif)
        assert (g["width"], g["height"], g["n_frames"]) == (4, 3, 2)
        assert g["duration_ms"] == 100
        # gray palette: R channel == index
        assert bytes(g["frames"][0]["pixels"][0::3]) == f0
        assert set(g["frames"][1]["pixels"]) == {7}

    def test_interlaced_frame(self):
        from arc_spark.multimodal.codecs import decode_gif, encode_gif

        f0 = bytes(range(32))
        gif = encode_gif(4, 8, [{"indices": f0, "delay_ms": 0}],
                         interlace_first=True)
        assert bytes(decode_gif(gif)["frames"][0]["pixels"][0::3]) == f0

    def test_lzw_multi_subblock_and_clears(self):
        import random

        from arc_spark.multimodal.codecs import decode_gif, encode_gif

        random.seed(11)
        big = bytes(random.randrange(256) for _ in range(64 * 48))
        gif = encode_gif(64, 48, [{"indices": big, "delay_ms": 20}])
        assert bytes(decode_gif(gif)["frames"][0]["pixels"][0::3]) == big

    def test_rejects_garbage(self):
        import pytest

        from arc_spark.multimodal.codecs import MediaDecodeError, decode_gif

        _, _, gif = self._two_frame()
        for bad in (b"nope", gif[:20], gif[:-1] + b"\x7e"):
            with pytest.raises(MediaDecodeError):
                decode_gif(bad)

    def test_sample_frames_real_gif(self, spark):
        """Distributed frame sampling over a real GIF decode: every 50ms
        across a 100ms 2-frame GIF → frames at 0 and 50ms, first from
        frame 0 (0-40ms), second from frame 1 (40-100ms)."""
        from arc_spark.multimodal.blobs import sample_frames
        from arc_spark.multimodal.codecs import decode_png, encode_gif

        f0 = bytes([3] * 12)
        f1 = bytes([9] * 12)
        gif = encode_gif(4, 3, [{"indices": f0, "delay_ms": 40},
                                {"indices": f1, "delay_ms": 60}])
        df = spark.createDataFrame(
            [(1, "image/gif", gif)], "blob_id long, media_type string, blob binary")
        rows = sorted(
            sample_frames(df, every_ms=50, deterministic_stub=False).collect(),
            key=lambda r: r["frame_idx"])
        assert [(r["frame_idx"], r["frame_ts_ms"]) for r in rows] == [(0, 0), (1, 50)]
        img0 = decode_png(bytes(rows[0]["frame"]))
        img1 = decode_png(bytes(rows[1]["frame"]))
        assert set(img0["pixels"]) == {3}
        assert set(img1["pixels"]) == {9}

    def test_extract_features_real_gif(self, spark):
        from arc_spark.multimodal.blobs import extract_features
        from arc_spark.multimodal.codecs import encode_gif

        gif = encode_gif(4, 3, [{"indices": bytes([128] * 12), "delay_ms": 30}])
        df = spark.createDataFrame(
            [(5, "image/gif", gif)], "blob_id long, media_type string, blob binary")
        row = extract_features(df, deterministic_stub=False).collect()[0]
        feats = row["feature"]
        # n_frames/1000 and duration/60000 land in slots 2 and 3
        assert abs(feats[2] - 1 / 1000) < 1e-6
        assert abs(feats[3] - 30 / 60000) < 1e-6
        # mid-frame mean level ≈ 128/255 in the channel-stat block
        assert abs(feats[4] - 128 / 255) < 1e-3
