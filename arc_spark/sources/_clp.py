"""Optional C accelerator for the uniform line-protocol chunk parse.

:func:`line_protocol.parse_chunk_vectorized` already keeps the dominant
wire shape off the per-line Python loop, but its pyarrow.compute
formulation re-scans the chunk ~30 kernel passes deep (split, list ops,
per-key uniques) — ~1 µs/line/core, which is the measured floor of the
fused bulk-LP lane (r11 profile: 123 ms of kernel time per 125k-line
chunk, zero Python glue to cut). The reference parses LP in one native
pass (internal/ingest/lineprotocol.go, 5.3M lines/s single parser); this
module is the same move: a single-pass C scanner for the STRICTLY
uniform case — one measurement, stable tag/field key sequences, ASCII,
no escapes/quotes — that declines (returns None) on the first sign of
anything else, leaving the Arrow-kernel path and the per-line parser as
the semantic source of truth. The three-way equivalence is fuzz-locked
(tests/test_properties.py: C path vs kernel path vs generic loop).

Build-on-first-use with the system compiler, cached under the repo's
``.cache`` keyed by a source hash; loaded via ctypes (the _cwalk
pattern). Every failure mode (no compiler, read-only filesystem,
``ARC_DISABLE_CLP=1``) degrades silently to the kernel path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

MAX_TAGS = 16
MAX_FIELDS = 32

_C_SRC = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <errno.h>

/* field type codes (must match _clp.py) */
#define T_FLOAT 0
#define T_INT   1
#define T_BOOL  2

/* bytes that always send a chunk back to the Python paths: non-ASCII,
 * backslash escapes, quoted strings, carriage returns */
static inline int forbidden(uint8_t c) {
    return c >= 0x80 || c == '\\' || c == '"' || c == '\r';
}

/* span scan: from pos, advance until one of two terminators or '\n'/end.
 * Declines (returns -1) on forbidden bytes or '=' when no_eq is set. */
static int64_t scan_value(const uint8_t *buf, int64_t size, int64_t pos,
                          uint8_t t1, uint8_t t2, int no_eq) {
    while (pos < size) {
        uint8_t c = buf[pos];
        if (c == t1 || c == t2) return pos;
        if (c == '\n' || forbidden(c) || (no_eq && c == '=')) return -1;
        pos++;
    }
    return pos; /* EOF terminates like '\n' for the caller to judge */
}

/* Parse the FIRST line's shape.
 * meta out: [0]=n_tags [1]=n_fields [2]=line1_len(incl '\n' if present)
 * key_spans out: (start,len) int64 pairs: measurement, tag keys...,
 *                field keys...
 * types out: per-field T_* from the first line's value lexemes.
 * Returns 1 ok, 0 decline. */
int64_t arc_lp_schema(const uint8_t *buf, int64_t size,
                      int64_t max_tags, int64_t max_fields,
                      int64_t *meta, int64_t *key_spans, int64_t *types) {
    if (size <= 0) return 0;
    int64_t pos = 0;
    /* measurement: until ',' or ' ' */
    int64_t end = scan_value(buf, size, pos, ',', ' ', 1);
    if (end < 0 || end >= size || end == pos) return 0;
    key_spans[0] = pos; key_spans[1] = end - pos;
    int64_t n_tags = 0, n_fields = 0, ks = 2;
    pos = end;
    while (pos < size && buf[pos] == ',') {   /* tags */
        pos++;
        if (n_tags >= max_tags) return 0;
        int64_t ke = scan_value(buf, size, pos, '=', '=', 0);
        if (ke < 0 || ke >= size || buf[ke] != '=' || ke == pos) return 0;
        /* key itself must not contain ',' or ' ' — scan_value stopped at
         * '=', so re-check the span */
        for (int64_t i = pos; i < ke; i++)
            if (buf[i] == ',' || buf[i] == ' ') return 0;
        key_spans[ks++] = pos; key_spans[ks++] = ke - pos;
        pos = ke + 1;
        int64_t ve = scan_value(buf, size, pos, ',', ' ', 1);
        if (ve < 0 || ve >= size || ve == pos) return 0; /* empty value: decline */
        pos = ve;
        n_tags++;
    }
    if (pos >= size || buf[pos] != ' ') return 0;
    pos++;
    for (;;) {                                 /* fields */
        if (n_fields >= max_fields) return 0;
        int64_t ke = scan_value(buf, size, pos, '=', '=', 0);
        if (ke < 0 || ke >= size || buf[ke] != '=' || ke == pos) return 0;
        for (int64_t i = pos; i < ke; i++)
            if (buf[i] == ',' || buf[i] == ' ') return 0;
        key_spans[ks++] = pos; key_spans[ks++] = ke - pos;
        pos = ke + 1;
        int64_t ve = scan_value(buf, size, pos, ',', ' ', 1);
        if (ve < 0 || ve == pos) return 0;
        /* type from the first line's lexeme */
        int64_t vl = ve - pos;
        uint8_t last = buf[ve - 1];
        int64_t ty;
        if (last == 'i' || last == 'u') ty = T_INT;
        else {
            /* bool tokens: t T true True TRUE f F false False FALSE */
            const uint8_t c0 = buf[pos];
            if ((c0=='t'||c0=='T'||c0=='f'||c0=='F') &&
                (vl==1 || vl==4 || vl==5)) ty = T_BOOL;
            else ty = T_FLOAT;
        }
        types[n_fields++] = ty;
        if (ve >= size) return 0;              /* first line must have ts */
        pos = ve;
        if (buf[pos] == ',') { pos++; continue; }
        if (buf[pos] == ' ') { pos++; break; }
        return 0;
    }
    /* timestamp: digits only, ends at '\n' or EOF */
    int64_t ts = pos;
    while (pos < size && buf[pos] >= '0' && buf[pos] <= '9') pos++;
    if (pos == ts || pos - ts > 19) return 0;
    if (pos < size && buf[pos] != '\n') return 0;
    meta[0] = n_tags; meta[1] = n_fields;
    meta[2] = (pos < size) ? pos + 1 : pos;
    return 1;
}

static int64_t match_span(const uint8_t *buf, int64_t size, int64_t pos,
                          const uint8_t *ref, int64_t rlen) {
    if (pos + rlen > size) return -1;
    if (memcmp(buf + pos, ref, (size_t)rlen) != 0) return -1;
    return pos + rlen;
}

/* Full chunk parse against the first line's schema.
 * key_spans/types: from arc_lp_schema. div/mul: time scaling (ts/div*mul).
 * tag_starts/tag_lens: int32[n_tags * n_alloc] row-major per tag.
 * field_vals: int64[n_fields * n_alloc] row-major; doubles/bools are
 * written through the same 8-byte slots (caller reinterprets by type).
 * Returns lines parsed (== n_alloc on success), or -1 decline. */
int64_t arc_lp_parse(const uint8_t *buf, int64_t size, int64_t n_alloc,
                     const int64_t *key_spans, const int64_t *types,
                     int64_t n_tags, int64_t n_fields,
                     int64_t divq, int64_t mul,
                     int64_t *time_out,
                     int32_t *tag_starts, int32_t *tag_lens,
                     int64_t *field_vals) {
    if (size > 0x7fffffffLL) return -1;  /* int32 span arithmetic */
    const uint8_t *meas = buf + key_spans[0];
    int64_t meas_len = key_spans[1];
    int64_t pos = 0, row = 0;
    char tmp[64];
    while (pos < size) {
        if (row >= n_alloc) return -1;
        /* measurement */
        int64_t p = match_span(buf, size, pos, meas, meas_len);
        if (p < 0) return -1;
        /* tags */
        for (int64_t t = 0; t < n_tags; t++) {
            if (p >= size || buf[p] != ',') return -1;
            p++;
            const int64_t *sp = key_spans + 2 + 2 * t;
            p = match_span(buf, size, p, buf + sp[0], sp[1]);
            if (p < 0 || p >= size || buf[p] != '=') return -1;
            p++;
            /* ALWAYS terminate on ',' AND ' ': a bare ',' inside the
             * LAST tag's value would otherwise absorb an =-less extra
             * tag ("m,a=1,xyz f=..." → value "1,xyz") that the generic
             * parser REJECTS as a malformed tag — a divergence, caught
             * in r11 review */
            int64_t ve = scan_value(buf, size, p, ',', ' ', 1);
            if (ve < 0 || ve >= size || ve == p) return -1;
            uint8_t expect_t = (t + 1 < n_tags) ? ',' : ' ';
            if (buf[ve] != expect_t) return -1;
            tag_starts[t * n_alloc + row] = (int32_t)p;
            tag_lens[t * n_alloc + row] = (int32_t)(ve - p);
            p = ve;
        }
        if (p >= size || buf[p] != ' ') return -1;
        p++;
        /* fields */
        for (int64_t f = 0; f < n_fields; f++) {
            const int64_t *sp = key_spans + 2 + 2 * (n_tags + f);
            p = match_span(buf, size, p, buf + sp[0], sp[1]);
            if (p < 0 || p >= size || buf[p] != '=') return -1;
            p++;
            /* same terminator discipline as tags (field-value typing
             * would also catch a leaked ',', but don't rely on it) */
            int64_t ve = scan_value(buf, size, p, ',', ' ', 1);
            if (ve < 0 || ve == p || ve >= size) return -1;
            uint8_t expect_f = (f + 1 < n_fields) ? ',' : ' ';
            if (buf[ve] != expect_f) return -1;
            int64_t vl = ve - p;
            int64_t ty = types[f];
            int64_t *slot = field_vals + f * n_alloc + row;
            if (ty == T_INT) {
                uint8_t last = buf[ve - 1];
                if ((last != 'i' && last != 'u') || vl < 2 || vl > 21)
                    return -1;
                memcpy(tmp, buf + p, (size_t)(vl - 1));
                tmp[vl - 1] = 0;
                errno = 0;
                char *endp;
                long long v = strtoll(tmp, &endp, 10);
                if (errno || endp != tmp + vl - 1) return -1;
                *slot = (int64_t)v;
            } else if (ty == T_BOOL) {
                int v;
                if (vl == 1 && (buf[p]=='t' || buf[p]=='T')) v = 1;
                else if (vl == 1 && (buf[p]=='f' || buf[p]=='F')) v = 0;
                else if (vl == 4 && (!memcmp(buf+p,"true",4) ||
                                     !memcmp(buf+p,"True",4) ||
                                     !memcmp(buf+p,"TRUE",4))) v = 1;
                else if (vl == 5 && (!memcmp(buf+p,"false",5) ||
                                     !memcmp(buf+p,"False",5) ||
                                     !memcmp(buf+p,"FALSE",5))) v = 0;
                else return -1;
                *slot = v;
            } else {
                /* float: strict charset so strtod can't sneak in
                 * nan/inf/hex forms the Arrow cast rejects */
                if (vl > 63) return -1;
                for (int64_t i = p; i < ve; i++) {
                    uint8_t c = buf[i];
                    if (!((c >= '0' && c <= '9') || c == '.' || c == '-' ||
                          c == '+' || c == 'e' || c == 'E'))
                        return -1;
                }
                memcpy(tmp, buf + p, (size_t)vl);
                tmp[vl] = 0;
                errno = 0;
                char *endp;
                double d = strtod(tmp, &endp);
                if (errno || endp != tmp + vl) return -1;
                memcpy(slot, &d, 8);
            }
            p = ve + (f + 1 < n_fields ? 1 : 0);
        }
        p++; /* the ' ' before the timestamp */
        /* timestamp: digits only, overflow-checked accumulate */
        int64_t ts = 0, t0 = p;
        while (p < size && buf[p] >= '0' && buf[p] <= '9') {
            if (ts > (0x7fffffffffffffffLL - 9) / 10) return -1;
            ts = ts * 10 + (buf[p] - '0');
            p++;
        }
        if (p == t0 || p - t0 > 19) return -1;
        if (p < size && buf[p] != '\n') return -1;
        ts /= divq;
        if (mul > 1 && ts > 0x7fffffffffffffffLL / mul) return -1;
        time_out[row] = ts * mul;
        row++;
        pos = (p < size) ? p + 1 : p;
    }
    return row;
}

/* Gather n variable-length slices of buf into a contiguous utf8 buffer:
 * offsets[n+1] (int32) + out bytes. cap bounds out. Returns total bytes
 * or -1. */
int64_t arc_lp_gather(const uint8_t *buf, const int32_t *starts,
                      const int32_t *lens, int64_t n,
                      int32_t *offsets, uint8_t *out, int64_t cap) {
    int64_t total = 0;
    offsets[0] = 0;
    for (int64_t i = 0; i < n; i++) {
        int32_t ln = lens[i];
        if (total + ln > cap) return -1;
        memcpy(out + total, buf + starts[i], (size_t)ln);
        total += ln;
        offsets[i + 1] = (int32_t)total;
    }
    return total;
}
"""

_schema = None
_parse = None
_gather = None
_tried = False
# r12 (r11 advice): _ensure_built had a check-then-act race — two threads
# (the 8-way deferred-drain pool on first flush, or the fused writer's 8
# chunk workers) could both pass the _tried gate and run cc concurrently
# with the SAME pid-keyed tmp path, caching a corrupt .so under the
# source-hash name; every later process would then fail CDLL and silently
# lose the fast path until .cache was cleared. The lock serializes the
# one-time build; losers of the race wait and see the winner's globals
# (not a permanent decline — the r11 shape let a thread observe
# _tried=True mid-build and fall back for that call).
_BUILD_LOCK = threading.Lock()


def _build():
    digest = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
    cache = os.environ.get("ARC_CWALK_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".cache")
    so_path = os.path.join(cache, f"clp-{digest}.so")
    if not os.path.exists(so_path):
        os.makedirs(cache, exist_ok=True)
        with tempfile.NamedTemporaryFile(
                "w", suffix=".c", delete=False, dir=cache) as f:
            f.write(_C_SRC)
            c_path = f.name
        try:
            # pid+tid keyed: cross-process races converge via the atomic
            # os.replace; within-process _BUILD_LOCK already serializes,
            # the tid is belt-and-braces for any future unlocked caller
            tmp_so = so_path + f".tmp-{os.getpid()}-{threading.get_ident()}"
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
                check=True, capture_output=True, timeout=60)
            os.replace(tmp_so, so_path)  # atomic: racing builders converge
        finally:
            os.unlink(c_path)
    lib = ctypes.CDLL(so_path)
    sch = lib.arc_lp_schema
    sch.restype = ctypes.c_int64
    sch.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p]
    par = lib.arc_lp_parse
    par.restype = ctypes.c_int64
    par.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p]
    gat = lib.arc_lp_gather
    gat.restype = ctypes.c_int64
    gat.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_int64]
    return sch, par, gat


def _ensure_built() -> None:
    global _schema, _parse, _gather, _tried
    if _tried:
        return
    with _BUILD_LOCK:
        if _tried:
            return
        if os.environ.get("ARC_DISABLE_CLP", "").lower() not in ("1", "true"):
            try:
                _schema, _parse, _gather = _build()
            except Exception:
                _schema = _parse = _gather = None
        # set LAST: a concurrent reader that sees _tried=True must also
        # see the loaded function pointers (GIL orders these stores)
        _tried = True


def parse_chunk_native(chunk: bytes, scale) -> "dict[str, dict] | None":
    """Single-pass C parse of a strictly uniform LP chunk, or None.

    Accept ⟹ byte-identical semantics to the kernel/generic paths
    (fuzz-locked); every irregularity declines so the Python paths stay
    the source of truth. ``scale`` is PRECISION_TO_US[precision].
    """
    _ensure_built()
    if _parse is None or not chunk:
        return None
    import numpy as np
    import pyarrow as pa

    size = len(chunk)
    meta = np.zeros(4, np.int64)
    key_spans = np.zeros(2 * (1 + MAX_TAGS + MAX_FIELDS), np.int64)
    types = np.zeros(MAX_FIELDS, np.int64)
    if _schema(chunk, size, MAX_TAGS, MAX_FIELDS,
               meta.ctypes.data, key_spans.ctypes.data,
               types.ctypes.data) != 1:
        return None
    n_tags, n_fields = int(meta[0]), int(meta[1])
    try:
        names = [
            chunk[int(key_spans[2 * i]):
                  int(key_spans[2 * i] + key_spans[2 * i + 1])].decode()
            for i in range(1 + n_tags + n_fields)
        ]
    except UnicodeDecodeError:
        return None
    meas, tag_names = names[0], names[1:1 + n_tags]
    field_names = names[1 + n_tags:]
    cols = tag_names + field_names
    if len(set(cols)) != len(cols) or "time" in cols:
        return None  # duplicate keys / reserved name: generic path decides
    n_alloc = chunk.count(b"\n") + (0 if chunk.endswith(b"\n") else 1)
    time_out = np.empty(n_alloc, np.int64)
    tag_starts = np.empty(max(1, n_tags) * n_alloc, np.int32)
    tag_lens = np.empty(max(1, n_tags) * n_alloc, np.int32)
    field_vals = np.empty(max(1, n_fields) * n_alloc, np.int64)
    divq, mul = (1000, 1) if scale < 1 else (1, int(scale))
    n = _parse(chunk, size, n_alloc, key_spans.ctypes.data,
               types.ctypes.data, n_tags, n_fields, divq, mul,
               time_out.ctypes.data, tag_starts.ctypes.data,
               tag_lens.ctypes.data, field_vals.ctypes.data)
    if n != n_alloc:
        return None
    columns: dict[str, object] = {"time": pa.array(time_out)}
    for t, name in enumerate(tag_names):
        starts = tag_starts[t * n_alloc:(t + 1) * n_alloc]
        lens = tag_lens[t * n_alloc:(t + 1) * n_alloc]
        total = int(lens.sum())
        offsets = np.empty(n_alloc + 1, np.int32)
        data = np.empty(max(1, total), np.uint8)
        if _gather(chunk, starts.ctypes.data, lens.ctypes.data, n_alloc,
                   offsets.ctypes.data, data.ctypes.data, total) != total:
            return None
        # zero-copy: py_buffer holds a reference to the numpy exporter,
        # and from_buffers tolerates a data buffer larger than
        # offsets[-1]
        columns[name] = pa.Array.from_buffers(
            pa.utf8(), n_alloc,
            [None, pa.py_buffer(offsets), pa.py_buffer(data)])
    for f, name in enumerate(field_names):
        raw = field_vals[f * n_alloc:(f + 1) * n_alloc]
        ty = int(types[f])
        if ty == 1:
            columns[name] = pa.array(raw)  # zero-copy int64 view
        elif ty == 2:
            columns[name] = pa.array(raw.astype(bool))
        else:
            columns[name] = pa.array(raw.view(np.float64))
    return {meas: {"columns": columns, "tag_columns": sorted(tag_names)}}
