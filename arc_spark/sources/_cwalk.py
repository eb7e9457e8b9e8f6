"""Optional C accelerator for the msgpack string-column header walk.

The columnar decoder's one remaining interpreted loop is the per-cell
header walk in ``_decode_str_column`` (~300 ns/cell — the sync-ack
ingest profile's bottleneck; the reference decodes natively in Go,
internal/ingest/msgpack*.go). The walk is 5 machine instructions per
cell, so a 30-line C function gives ~20× on exactly that loop while the
surrounding numpy/Arrow work is already vectorized.

Build-on-first-use with the system compiler, cached under
``~/.cache/arc_spark`` keyed by a source hash; loaded via ctypes. Every
failure mode (no compiler, sandboxed filesystem, exotic platform,
``ARC_DISABLE_CWALK=1``) degrades silently to the pure-Python loop —
the accelerator is an optimization, never a dependency, and the
decoder-equivalence property fuzz (tests/test_properties.py) runs
against whichever path is active.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

_C_SRC = r"""
#include <stdint.h>

/* Walk n msgpack string headers starting at buf[pos]:
 * fixstr (0xA0-0xBF, 1-byte header) and str8 (0xD9, 2-byte header).
 * Writes lens[i] = value byte length, hdr[i] = header width (1|2).
 * Returns the end offset, or -1 on a non-string token / overrun. */
int64_t arc_walk_str_column(const uint8_t *buf, int64_t size, int64_t pos,
                            int64_t n, int64_t *lens, int64_t *hdr) {
    for (int64_t i = 0; i < n; i++) {
        if (pos >= size) return -1;
        uint8_t h = buf[pos];
        if (h >= 0xA0 && h <= 0xBF) {
            int64_t ln = h & 0x1F;
            lens[i] = ln; hdr[i] = 1; pos += 1 + ln;
        } else if (h == 0xD9) {
            if (pos + 1 >= size) return -1;
            int64_t ln = buf[pos + 1];
            lens[i] = ln; hdr[i] = 2; pos += 2 + ln;
        } else {
            return -1;
        }
    }
    return pos > size ? -1 : pos;
}

/* Fused walk+extract: one pass that validates headers, writes the n+1
 * int32 value-byte offsets, and memcpys the value bytes (headers
 * stripped) into out. cap is out's capacity in bytes; every copy is
 * bounds-checked against it BEFORE writing (a truncated/malicious
 * column can declare n cells but contain fewer, so no formula over
 * (size, pos, n) alone can bound the value region — the capacity must
 * travel with the buffer). Replaces the mask-build / fancy-index /
 * double-cumsum numpy pipeline with zero interpreter work between
 * cells — the sync-ack ingest path's residual GIL-held cost (r5
 * verdict: recover the sustained-ingest lanes). Returns end offset,
 * or -1 on a non-string token / overrun / capacity overflow. */
int64_t arc_extract_str_column(const uint8_t *buf, int64_t size,
                               int64_t pos, int64_t n, int64_t cap,
                               int32_t *offsets, uint8_t *out) {
    int64_t total = 0;
    offsets[0] = 0;
    for (int64_t i = 0; i < n; i++) {
        if (pos >= size) return -1;
        uint8_t h = buf[pos];
        int64_t ln;
        if (h >= 0xA0 && h <= 0xBF) {
            ln = h & 0x1F; pos += 1;
        } else if (h == 0xD9) {
            if (pos + 1 >= size) return -1;
            ln = buf[pos + 1]; pos += 2;
        } else {
            return -1;
        }
        if (pos + ln > size) return -1;
        if (total + ln > cap) return -1;
        for (int64_t j = 0; j < ln; j++) out[total + j] = buf[pos + j];
        total += ln; pos += ln;
        offsets[i + 1] = (int32_t)total;
    }
    return pos;
}

/* ENCODE mirror of the walk above (r12): n strings given as Arrow
 * offsets (n+1 int32, relative to data) emitted as msgpack
 * fixstr/str8 headers + payload, byte-identical to the numpy scatter
 * path in pack_array_vectorized. The scatter builds three index
 * arrays over every payload byte (repeat + arange + fancy store —
 * ~11 ns/byte interpreter-side); this is one pass of header stores +
 * memcpys (~0.6 ns/byte), which was the dominant cost of msgpack
 * string-column serving (58 ms of a 65k-row JSON-ish column's 75 ms).
 * Caller guarantees every length <= 0xFF (it already computed the
 * lens for the str8 gate); out capacity >= total + 2n. Returns bytes
 * written, or -1 on a length out of range. */
int64_t arc_pack_str_column(const uint8_t *data, const int32_t *offs,
                            int64_t n, uint8_t *out) {
    int64_t p = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t ln = (int64_t)offs[i + 1] - (int64_t)offs[i];
        if (ln < 0 || ln > 0xFF) return -1;
        if (ln <= 31) {
            out[p++] = (uint8_t)(0xA0 | ln);
        } else {
            out[p++] = 0xD9;
            out[p++] = (uint8_t)ln;
        }
        const uint8_t *src = data + offs[i];
        for (int64_t j = 0; j < ln; j++) out[p + j] = src[j];
        p += ln;
    }
    return p;
}
"""

_walk = None
_extract = None
_pack_str = None
_tried = False
# r12 (mirror of the _clp fix, same r11-advice race shape): serialize
# the one-time build so a thread racing the builder waits for the
# loaded functions instead of observing _tried=True mid-build and
# silently losing the fast path for its call.
_BUILD_LOCK = threading.Lock()


def _build() -> ctypes.CDLL | None:
    digest = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
    cache = os.environ.get("ARC_CWALK_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".cache")
    so_path = os.path.join(cache, f"cwalk-{digest}.so")
    if not os.path.exists(so_path):
        os.makedirs(cache, exist_ok=True)
        with tempfile.NamedTemporaryFile(
                "w", suffix=".c", delete=False, dir=cache) as f:
            f.write(_C_SRC)
            c_path = f.name
        try:
            tmp_so = (so_path
                      + f".tmp-{os.getpid()}-{threading.get_ident()}")
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
                check=True, capture_output=True, timeout=60)
            os.replace(tmp_so, so_path)  # atomic: racing builders converge
        finally:
            os.unlink(c_path)
    lib = ctypes.CDLL(so_path)
    fn = lib.arc_walk_str_column
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                   ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
    ex = lib.arc_extract_str_column
    ex.restype = ctypes.c_int64
    ex.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                   ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
                   ctypes.c_void_p]
    pk = lib.arc_pack_str_column
    pk.restype = ctypes.c_int64
    pk.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                   ctypes.c_void_p]
    return fn, ex, pk


def _ensure_built() -> None:
    global _walk, _extract, _pack_str, _tried
    if _tried:
        return
    with _BUILD_LOCK:
        if _tried:
            return
        if os.environ.get("ARC_DISABLE_CWALK", "").lower() not in (
                "1", "true"):
            try:
                _walk, _extract, _pack_str = _build()
            except Exception:
                _walk = _extract = _pack_str = None
        # set LAST (GIL orders the stores): a reader seeing _tried=True
        # must also see the loaded function pointers
        _tried = True


def native_walk():
    """The compiled walker, or None (build once per process, never raise)."""
    _ensure_built()
    return _walk


def native_extract():
    """The fused walk+extract, or None (same build/fallback contract)."""
    _ensure_built()
    return _extract


def native_pack_str():
    """The string-column msgpack encoder, or None (same contract)."""
    _ensure_built()
    return _pack_str
