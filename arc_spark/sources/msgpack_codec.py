"""Minimal MessagePack codec (pure Python, no external dependency).

Covers the subset arc's wire protocol uses
(/root/reference/internal/ingest/msgpack.go:31-575 and
/root/reference/pkg/models/record.go:33-47): nil, bool, int, float64,
str, bin, array, map. Used by the ingest endpoint decoder and round-trip
tests; if the real `msgpack` package is installed it is preferred.
"""

from __future__ import annotations

import struct

try:  # pragma: no cover - environment dependent
    import msgpack as _msgpack
except Exception:  # pragma: no cover
    _msgpack = None


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------

def packb(obj) -> bytes:
    if _msgpack is not None:
        return _msgpack.packb(obj, use_bin_type=True)
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(0x100 + obj)
        elif 0 <= obj <= 0xFFFFFFFFFFFFFFFF and obj > 0x7FFFFFFFFFFFFFFF:
            out.append(0xCF)
            out += struct.pack(">Q", obj)
        else:
            out.append(0xD3)
            out += struct.pack(">q", obj)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes([0xD9, n])
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += bytes([0xC4, n])
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for v in obj:
            _pack(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"cannot msgpack-encode {type(obj)}")


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

def unpackb(data: bytes):
    if _msgpack is not None:
        # unicode_errors="replace": invalid UTF-8 in string values becomes
        # U+FFFD instead of failing the whole batch (reference sanitizes,
        # internal/ingest/msgpack.go:543-575) — matches the pure-python path
        return _msgpack.unpackb(
            data, raw=False, strict_map_key=False, unicode_errors="replace"
        )
    obj, pos = _unpack(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes at {pos}")
    return obj


def _unpack(mv: memoryview, pos: int):
    b = mv[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _unpack_map(mv, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(mv, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return str(mv[pos:pos + n], "utf-8", "replace"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:
        n = mv[pos]
        return bytes(mv[pos + 1:pos + 1 + n]), pos + 1 + n
    if b == 0xC5:
        (n,) = struct.unpack_from(">H", mv, pos)
        return bytes(mv[pos + 2:pos + 2 + n]), pos + 2 + n
    if b == 0xC6:
        (n,) = struct.unpack_from(">I", mv, pos)
        return bytes(mv[pos + 4:pos + 4 + n]), pos + 4 + n
    if b == 0xCA:
        (v,) = struct.unpack_from(">f", mv, pos)
        return v, pos + 4
    if b == 0xCB:
        (v,) = struct.unpack_from(">d", mv, pos)
        return v, pos + 8
    if b == 0xCC:
        return mv[pos], pos + 1
    if b == 0xCD:
        (v,) = struct.unpack_from(">H", mv, pos)
        return v, pos + 2
    if b == 0xCE:
        (v,) = struct.unpack_from(">I", mv, pos)
        return v, pos + 4
    if b == 0xCF:
        (v,) = struct.unpack_from(">Q", mv, pos)
        return v, pos + 8
    if b == 0xD0:
        (v,) = struct.unpack_from(">b", mv, pos)
        return v, pos + 1
    if b == 0xD1:
        (v,) = struct.unpack_from(">h", mv, pos)
        return v, pos + 2
    if b == 0xD2:
        (v,) = struct.unpack_from(">i", mv, pos)
        return v, pos + 4
    if b == 0xD3:
        (v,) = struct.unpack_from(">q", mv, pos)
        return v, pos + 8
    if b == 0xD9:
        n = mv[pos]
        return str(mv[pos + 1:pos + 1 + n], "utf-8", "replace"), pos + 1 + n
    if b == 0xDA:
        (n,) = struct.unpack_from(">H", mv, pos)
        return str(mv[pos + 2:pos + 2 + n], "utf-8", "replace"), pos + 2 + n
    if b == 0xDB:
        (n,) = struct.unpack_from(">I", mv, pos)
        return str(mv[pos + 4:pos + 4 + n], "utf-8", "replace"), pos + 4 + n
    if b == 0xDC:
        (n,) = struct.unpack_from(">H", mv, pos)
        return _unpack_array(mv, pos + 2, n)
    if b == 0xDD:
        (n,) = struct.unpack_from(">I", mv, pos)
        return _unpack_array(mv, pos + 4, n)
    if b == 0xDE:
        (n,) = struct.unpack_from(">H", mv, pos)
        return _unpack_map(mv, pos + 2, n)
    if b == 0xDF:
        (n,) = struct.unpack_from(">I", mv, pos)
        return _unpack_map(mv, pos + 4, n)
    raise ValueError(f"unsupported msgpack byte 0x{b:02x}")


def _unpack_array(mv: memoryview, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _unpack(mv, pos)
        out.append(v)
    return out, pos


def _unpack_map(mv: memoryview, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _unpack(mv, pos)
        v, pos = _unpack(mv, pos)
        out[k] = v
    return out, pos
