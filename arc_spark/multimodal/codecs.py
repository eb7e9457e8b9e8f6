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


# ---------------------------------------------------------------------------
# GIF (87a/89a) — the pure-stdlib "video" lane: animated GIF is the one
# multi-frame container decodable without ffmpeg/PIL, so frame sampling
# runs a REAL decoder (LZW + canvas composition) instead of a stub.
# Spec: GIF89a (W3C/CompuServe); LZW variant with variable code width
# 3..12 bits, clear/EOI codes, and frame disposal semantics.
# ---------------------------------------------------------------------------

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-variant LZW → index stream (caps at `expected` pixels)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader, LSB-first
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi  # truncated stream → stop
        byte0 = bitpos >> 3
        val = int.from_bytes(data[byte0:byte0 + 3], "little")
        val = (val >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return val

    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise MediaDecodeError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _deinterlace(indices: bytearray, w: int, h: int) -> bytearray:
    """GIF 4-pass interlace → sequential rows."""
    out = bytearray(len(indices))
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for row in range(start, h, step):
            out[row * w:(row + 1) * w] = indices[src:src + w]
            src += w
    return out


def decode_gif(data: bytes) -> dict:
    """GIF bytes → {width, height, n_frames, duration_ms, frames}.

    Each frame is {pixels (RGB bytes, full canvas), delay_ms}: frames are
    COMPOSED onto the logical screen with GIF disposal semantics (1/none =
    draw over, 2 = restore background; 3/previous treated as draw-over —
    vanishingly rare and sampling-irrelevant), transparency honored during
    composition. This is what a video frame-sampler needs: the visible
    canvas at each frame time, not raw sub-rectangles."""
    if data[:6] not in GIF_MAGICS:
        raise MediaDecodeError("not a GIF")
    try:
        w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            gct = data[pos:pos + 3 * n]
            pos += 3 * n
        canvas = bytearray(w * h * 3)
        if gct and bg * 3 + 3 <= len(gct):
            canvas[:] = gct[bg * 3:bg * 3 + 3] * (w * h)
        frames: list[dict] = []
        delay_ms = 0
        transparent: int | None = None
        disposal = 0
        prev_disposal_bg = False
        while pos < len(data):
            block = data[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension
                label = data[pos]
                pos += 1
                if label == 0xF9:  # graphic control
                    size = data[pos]
                    gflags, delay_cs, tindex = struct.unpack_from(
                        "<BHB", data, pos + 1)
                    delay_ms = delay_cs * 10
                    transparent = tindex if gflags & 0x01 else None
                    disposal = (gflags >> 2) & 0x07
                    pos += 1 + size
                else:  # skip any other extension's sub-blocks
                    pass
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
                continue
            if block != 0x2C:
                raise MediaDecodeError(f"unexpected GIF block 0x{block:02x}")
            fx, fy, fw, fh, lflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            table = gct
            if lflags & 0x80:
                n = 2 << (lflags & 0x07)
                table = data[pos:pos + 3 * n]
                pos += 3 * n
            if table is None:
                raise MediaDecodeError("GIF frame without a color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _gif_lzw_decode(min_code, bytes(lzw), fw * fh)
            if len(indices) < fw * fh:
                raise MediaDecodeError("GIF frame pixel data truncated")
            if lflags & 0x40:
                indices = _deinterlace(indices, fw, fh)
            if prev_disposal_bg and gct is not None:
                canvas[:] = (gct[bg * 3:bg * 3 + 3] or b"\0\0\0") * (w * h)
            # compose the sub-rectangle onto the canvas
            for row in range(fh):
                cy = fy + row
                if cy >= h:
                    break
                base = (cy * w + fx) * 3
                for col in range(min(fw, w - fx)):
                    idx = indices[row * fw + col]
                    if transparent is not None and idx == transparent:
                        continue
                    off = idx * 3
                    canvas[base + col * 3:base + col * 3 + 3] = table[off:off + 3]
            frames.append({"pixels": bytes(canvas), "delay_ms": delay_ms})
            prev_disposal_bg = disposal == 2
            delay_ms = 0
            transparent = None
            disposal = 0
    except (struct.error, IndexError) as e:
        raise MediaDecodeError(f"bad GIF: {e}") from None
    if not frames:
        raise MediaDecodeError("GIF with no image data")
    return {
        "width": w,
        "height": h,
        "n_frames": len(frames),
        "duration_ms": sum(f["delay_ms"] for f in frames),
        "frames": frames,
    }


def encode_gif(width: int, height: int, frames: list[dict],
               palette: bytes | None = None, interlace_first: bool = False) -> bytes:
    """Minimal GIF89a encoder for fixtures and resized output.

    ``frames``: [{indices: bytes (palette indices, w*h), delay_ms}];
    ``palette``: RGB triples (padded to a power of two, default 256-gray).
    Uses the classic clear-code-heavy LZW form (every code literal,
    periodic clears) — valid GIF, zero compression machinery.
    ``interlace_first`` writes frame 0 with the interlace flag (row-permuted)
    so decoder interlace handling is testable."""
    if palette is None:
        palette = bytes(v for i in range(256) for v in (i, i, i))
    n_colors = max(2, len(palette) // 3)
    depth = max(2, (n_colors - 1).bit_length())
    size = 1 << depth
    pal = palette.ljust(size * 3, b"\x00")[: size * 3]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += pal
    min_code = depth
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    for fi, fr in enumerate(frames):
        out += b"\x21\xf9\x04"
        out += struct.pack("<BHB", 0, max(fr.get("delay_ms", 0), 0) // 10, 0)
        out += b"\x00"
        ilace = interlace_first and fi == 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height,
                                     0x40 if ilace else 0)
        indices = fr["indices"]
        if ilace:
            rows = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for row in range(start, height, step):
                    rows.append(indices[row * width:(row + 1) * width])
            indices = b"".join(rows)
        out.append(min_code)
        # literal LZW: width is min_code+1 the whole time thanks to clears
        bits = bytearray()
        acc = 0
        nacc = 0
        cw = min_code + 1

        def emit(code: int):
            nonlocal acc, nacc
            acc |= code << nacc
            nacc += cw
            while nacc >= 8:
                bits.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8

        emit(clear)
        for i, idx in enumerate(indices):
            emit(idx)
            # re-clear before the table could force a width bump
            if i % (clear - 2) == clear - 3:
                emit(clear)
        emit(eoi)
        if nacc:
            bits.append(acc & 0xFF)
        for i in range(0, len(bits), 255):
            chunk = bits[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
