"""Pure-stdlib media codecs for the multimodal lanes.

No PIL/ffmpeg in this environment, but two public container formats are
fully decodable with the standard library alone, which makes the image and
audio lanes REAL instead of stubbed:

- PNG (RFC 2083 / W3C spec): chunk parse → IHDR → zlib-inflate IDAT →
  per-scanline unfilter (filters 0-4). 8-bit gray/RGB/gray+A/RGBA,
  non-interlaced — the shapes ML pipelines actually emit. Plus a minimal
  encoder (filter-0 scanlines) for resize output and test fixtures.
- WAV (RIFF): stdlib ``wave`` for framing, ``array`` for PCM samples.

Decoders raise :class:`MediaDecodeError` on malformed input — a poisoned
blob fails its row's decode, not the executor.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples per pixel


class MediaDecodeError(ValueError):
    pass


def decode_png(data: bytes) -> dict:
    """PNG bytes → {width, height, channels, pixels: bytearray (row-major,
    interleaved channels)}."""
    if data[:8] != PNG_MAGIC:
        raise MediaDecodeError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack_from(">I", data, pos), data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if len(chunk) != length:
            raise MediaDecodeError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None:
        raise MediaDecodeError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS:
        raise MediaDecodeError(f"unsupported PNG (depth={depth}, color={color})")
    if interlace != 0:
        raise MediaDecodeError("interlaced PNG not supported")
    ch = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"bad IDAT stream: {e}") from None
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise MediaDecodeError("pixel payload size mismatch")
    out = bytearray(stride * h)
    prev = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise MediaDecodeError(f"unknown filter {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return {"width": w, "height": h, "channels": ch, "pixels": out}


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal PNG encoder: 8-bit, filter-0 scanlines, one IDAT."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}.get(channels)
    if color is None:
        raise MediaDecodeError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise MediaDecodeError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride:(y + 1) * stride]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def resize_nearest(img: dict, target_w: int, target_h: int) -> dict:
    """Nearest-neighbor resample of a decode_png result."""
    w, h, ch, px = img["width"], img["height"], img["channels"], img["pixels"]
    out = bytearray(target_w * target_h * ch)
    for ty in range(target_h):
        sy = min(ty * h // target_h, h - 1)
        src_row = sy * w * ch
        dst_row = ty * target_w * ch
        for tx in range(target_w):
            sx = min(tx * w // target_w, w - 1)
            out[dst_row + tx * ch:dst_row + (tx + 1) * ch] = (
                px[src_row + sx * ch:src_row + (sx + 1) * ch]
            )
    return {"width": target_w, "height": target_h, "channels": ch, "pixels": out}


def image_stats(img: dict) -> dict:
    """Per-channel mean/min/max in [0, 1] — the feature-extraction kernel's
    real signal source."""
    ch, px = img["channels"], img["pixels"]
    n = len(px) // ch if ch else 0
    means, mins, maxs = [], [], []
    for c in range(ch):
        vals = px[c::ch]
        means.append(sum(vals) / (255.0 * n) if n else 0.0)
        mins.append(min(vals) / 255.0 if n else 0.0)
        maxs.append(max(vals) / 255.0 if n else 0.0)
    return {"mean": means, "min": mins, "max": maxs}


def decode_wav(data: bytes) -> dict:
    """WAV bytes → {channels, sample_rate, n_frames, duration_ms, rms}."""
    import io
    import wave
    from array import array

    try:
        with wave.open(io.BytesIO(data)) as wf:
            ch, width, rate = wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
            n = wf.getnframes()
            frames = wf.readframes(n)
    except (wave.Error, EOFError) as e:
        raise MediaDecodeError(f"bad WAV: {e}") from None
    if width == 2:
        samples = array("h")
        samples.frombytes(frames[: (len(frames) // 2) * 2])
        peak = 32768.0
    elif width == 1:
        # 8-bit WAV is UNSIGNED (0..255, midpoint 128): center to -128..127
        samples = [b - 128 for b in frames]
        peak = 128.0
    else:
        raise MediaDecodeError(f"unsupported sample width {width}")
    rms = ((sum(s * s for s in samples) / len(samples)) ** 0.5 / peak
           if len(samples) else 0.0)
    return {
        "channels": ch,
        "sample_rate": rate,
        "n_frames": n,
        "duration_ms": int(n * 1000 / rate) if rate else 0,
        "rms": rms,
    }
