"""Optional C accelerator: XXH64 over Arrow string-array slices.

Backs the OPT-IN native shingle path (``ARC_SHINGLE_IMPL=native``,
operators/dedup.py). Spark's ``xxhash64`` over a string is standard
XXH64 of the UTF-8 bytes (catalyst XXH64.hashUnsafeBytes reads
little-endian words, exactly the reference algorithm; bit-exactness is
locked by the differential fuzz in tests/test_shingle_native.py), so a
50-line C loop over the Arrow string buffers — data + int32 offsets,
already the wire layout ``mapInArrow`` hands us zero-copy — hashes at
~ns/word. NOTE the r13 A/B verdict (SCALING.md r13): the surrounding
mapInArrow stage is still SLOWER than the pure-Catalyst expression
path at every measured factor, because the interpreted-HOF cost the
kernel removes turned out to be near zero on Spark 4.1 while the word
arrays' Arrow transfer is not — which is why native is an escape
hatch, not the default. The scalar twin :func:`xxh64_bytes` doubles as
a general Spark-compatible XXH64 for driver-side code.

Build-on-first-use with the system compiler, cached under the repo
``.cache`` keyed by a source hash; loaded via ctypes (the _cwalk/_clp
pattern, including the build lock — see sources/_cwalk.py). Every
failure mode (no compiler on an executor, sandboxed filesystem,
``ARC_DISABLE_CXXH=1``) degrades to :func:`xxh64_bytes`, a pure-Python
scalar twin used per word — slow but bit-identical, so a heterogeneous
cluster (driver has cc, an executor doesn't) still returns correct
shingles.
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
#include <string.h>

#define P1 0x9E3779B185EBCA87ULL
#define P2 0xC2B2AE3D27D4EB4FULL
#define P3 0x165667B19E3779F9ULL
#define P4 0x85EBCA77C2B2AE63ULL
#define P5 0x27D4EB2F165667C5ULL

static inline uint64_t rotl(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}

static inline uint64_t rd64(const uint8_t *p) {
    uint64_t v; memcpy(&v, p, 8); return v;  /* little-endian hosts */
}

static inline uint32_t rd32(const uint8_t *p) {
    uint32_t v; memcpy(&v, p, 4); return v;
}

static inline uint64_t xxh_round(uint64_t acc, uint64_t lane) {
    acc += lane * P2;
    return rotl(acc, 31) * P1;
}

static inline uint64_t xxh64(const uint8_t *p, int64_t len, uint64_t seed) {
    const uint8_t *end = p + len;
    uint64_t h;
    if (len >= 32) {
        uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed,
                 v4 = seed - P1;
        do {
            v1 = xxh_round(v1, rd64(p));      p += 8;
            v2 = xxh_round(v2, rd64(p));      p += 8;
            v3 = xxh_round(v3, rd64(p));      p += 8;
            v4 = xxh_round(v4, rd64(p));      p += 8;
        } while (p + 32 <= end);
        h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
        h = (h ^ xxh_round(0, v1)) * P1 + P4;
        h = (h ^ xxh_round(0, v2)) * P1 + P4;
        h = (h ^ xxh_round(0, v3)) * P1 + P4;
        h = (h ^ xxh_round(0, v4)) * P1 + P4;
    } else {
        h = seed + P5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        h ^= xxh_round(0, rd64(p));
        h = rotl(h, 27) * P1 + P4;
        p += 8;
    }
    if (p + 4 <= end) {
        h ^= (uint64_t)rd32(p) * P1;
        h = rotl(h, 23) * P2 + P3;
        p += 4;
    }
    while (p < end) {
        h ^= (uint64_t)(*p) * P5;
        h = rotl(h, 11) * P1;
        p++;
    }
    h ^= h >> 33;
    h *= P2;
    h ^= h >> 29;
    h *= P3;
    h ^= h >> 32;
    return h;
}

/* Hash n byte slices of one Arrow string buffer: slice i is
 * data[offs[i] .. offs[i+1]).  out[i] = XXH64(slice, seed). */
void arc_xxh64_str32(const uint8_t *data, const int32_t *offs, int64_t n,
                     uint64_t seed, uint64_t *out) {
    for (int64_t i = 0; i < n; i++) {
        int64_t a = offs[i], b = offs[i + 1];
        out[i] = xxh64(data + a, b - a, seed);
    }
}
"""

_hash_batch = None
_tried = False
# serialize the one-time build (the r11-advice race shape — see _cwalk):
# a thread racing the builder waits for the loaded function instead of
# observing _tried=True mid-build and losing the fast path
_BUILD_LOCK = threading.Lock()


def _build():
    digest = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
    cache = os.environ.get("ARC_CWALK_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".cache")
    so_path = os.path.join(cache, f"cxxh-{digest}.so")
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
    fn = lib.arc_xxh64_str32
    fn.restype = None
    fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                   ctypes.c_uint64, ctypes.c_void_p]
    return fn


def _ensure_built() -> None:
    global _hash_batch, _tried
    if _tried:
        return
    with _BUILD_LOCK:
        if _tried:
            return
        if os.environ.get("ARC_DISABLE_CXXH", "").lower() not in (
                "1", "true"):
            try:
                _hash_batch = _build()
            except Exception:
                _hash_batch = None
        _tried = True  # set LAST (GIL orders the stores)


def native_xxh64_batch():
    """The compiled slice hasher, or None (build once, never raise)."""
    _ensure_built()
    return _hash_batch


# ---------------------------------------------------------------------------
# pure-Python scalar twin (executor fallback + test oracle)
# ---------------------------------------------------------------------------

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxh64_bytes(b: bytes, seed: int = 42) -> int:
    """Standard XXH64 (== Spark ``xxhash64`` over a string's UTF-8 bytes;
    the differential fuzz locks this equality). Returns unsigned."""
    n = len(b)
    p = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while p + 32 <= n:
            v1 = _round(v1, int.from_bytes(b[p:p + 8], "little"))
            v2 = _round(v2, int.from_bytes(b[p + 8:p + 16], "little"))
            v3 = _round(v3, int.from_bytes(b[p + 16:p + 24], "little"))
            v4 = _round(v4, int.from_bytes(b[p + 24:p + 32], "little"))
            p += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while p + 8 <= n:
        h ^= _round(0, int.from_bytes(b[p:p + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        p += 8
    if p + 4 <= n:
        h ^= (int.from_bytes(b[p:p + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        p += 4
    while p < n:
        h ^= (b[p] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        p += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h
