"""Ingest decode layer: wire records → typed Arrow batches → DataFrames.

Mirrors the reference's ingest semantics (SURVEY §1.2/§2.A15-A18):
- timestamp unit auto-detection (s/ms/µs/ns → µs,
  /root/reference/internal/ingest/msgpack.go:435-505)
- per-batch schema inference from first non-null value
  (/root/reference/internal/ingest/arrow_writer.go:339-367): ints widen to
  int64, floats to float64, strings, bools; `time` must be integer epoch
- row→columnar conversion (arrow_writer.go:1177 rowsToColumnar)
- schema-evolution-tolerant accumulation (union of columns, nulls backfill —
  arrow_writer.go:2706-2930 mergeBatches)
"""

from __future__ import annotations

import struct
from typing import Any

import pyarrow as pa

from arc_spark.sources.msgpack_codec import unpackb

# magnitude thresholds for epoch-unit detection (valid ~2001..2286, like the
# reference's decimal-digit classification)
_NS_MIN = 10**17
_US_MIN = 10**14
_MS_MIN = 10**11


# ---------------------------------------------------------------------------
# payload decompression (reference internal/api/msgpack.go: magic-byte
# auto-detect of gzip/zstd request bodies, with a decompression-bomb guard —
# decompress_bomb_test.go)
# ---------------------------------------------------------------------------

GZIP_MAGIC = b"\x1f\x8b"
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"

#: default output cap — matches the reference's bounded-reader design:
#: a tiny compressed body may not expand into arbitrary memory
MAX_DECOMPRESSED_BYTES = 256 * 1024 * 1024

try:  # zstd support is optional (no codec in the base environment)
    import zstandard as _zstd  # type: ignore
except ImportError:
    _zstd = None


class MalformedPayloadError(ValueError):
    """Wire bytes that don't decode to an arc payload shape — a CLIENT
    fault (HTTP 400, circuit-breaker-neutral), never an engine error."""


class DecompressionBombError(ValueError):
    pass


def maybe_decompress(payload: bytes,
                     max_decompressed_bytes: int = MAX_DECOMPRESSED_BYTES) -> bytes:
    """Auto-detect and decompress a gzip/zstd payload by magic bytes.

    Uncompressed payloads pass through untouched. Decompression stops at
    ``max_decompressed_bytes``; input remaining past the cap raises
    :class:`DecompressionBombError` instead of allocating further.
    """
    if payload[:2] == GZIP_MAGIC:
        import zlib

        d = zlib.decompressobj(wbits=47)  # gzip container
        out = d.decompress(payload, max_decompressed_bytes)
        if d.unconsumed_tail:
            raise DecompressionBombError(
                f"gzip payload exceeds {max_decompressed_bytes} bytes decompressed"
            )
        return out
    if payload[:4] == ZSTD_MAGIC:
        if _zstd is not None:
            try:
                return _zstd.ZstdDecompressor().decompress(
                    payload, max_output_size=max_decompressed_bytes
                )
            except _zstd.ZstdError:
                # One-shot ZstdError conflates three cases: output over
                # the cap, no content-size in the frame header, and a
                # genuinely corrupt frame. r13 (r12 advice): classify by
                # CHUNKED REPLAY instead of message-sniffing so both
                # codec paths (zstandard here, pyarrow below) map the
                # same input to the same error class — corrupt frames
                # are the client's fault (MalformedPayloadError), only
                # a real cap trip is DecompressionBombError, and a
                # VALID streamed frame without a header content size
                # now decompresses instead of failing. Replay cost is
                # confined to the cold error path.
                import io as _io

                try:
                    reader = _zstd.ZstdDecompressor().stream_reader(
                        _io.BytesIO(payload))
                    chunks: list[bytes] = []
                    got = 0
                    while True:
                        chunk = reader.read(1 << 22)  # 4 MiB
                        if not chunk:
                            break
                        got += len(chunk)
                        if got > max_decompressed_bytes:
                            raise DecompressionBombError(
                                f"zstd payload exceeds "
                                f"{max_decompressed_bytes} bytes "
                                f"decompressed")
                        chunks.append(chunk)
                    return b"".join(chunks)
                except _zstd.ZstdError as e:
                    raise MalformedPayloadError(
                        f"bad zstd frame: {e}") from None
        # r12: pyarrow fallback — the zstandard package is optional but
        # pyarrow (a hard dependency) ships the codec, so zstd payloads
        # now work everywhere. Bomb guard via CHUNKED streaming reads:
        # stop the moment the cap is crossed instead of trusting (or
        # even parsing) the frame's self-declared content size — a
        # forged header must not size the allocation.
        import pyarrow as pa

        try:
            stream = pa.input_stream(pa.py_buffer(payload),
                                     compression="zstd")
            chunks: list[bytes] = []
            got = 0
            while True:
                chunk = stream.read(1 << 22)  # 4 MiB
                if not chunk:
                    break
                got += len(chunk)
                if got > max_decompressed_bytes:
                    raise DecompressionBombError(
                        f"zstd payload exceeds {max_decompressed_bytes} "
                        f"bytes decompressed")
                chunks.append(chunk)
            return b"".join(chunks)
        except (pa.ArrowInvalid, OSError) as e:
            # pyarrow surfaces corrupt frames as OSError("ZSTD
            # decompress failed: ..."), not ArrowInvalid
            raise MalformedPayloadError(f"bad zstd frame: {e}") from None
    return payload


def normalize_epoch_us(v: int) -> int:
    """Auto-detect epoch unit by magnitude → microseconds."""
    if v >= _NS_MIN:
        return v // 1000
    if v >= _US_MIN:
        return v
    if v >= _MS_MIN:
        return v * 1000
    return v * 1_000_000


def _normalize_epoch_us_column(values):
    """Vectorized :func:`normalize_epoch_us` over a whole column — the
    ingest ack path runs this on every payload, so a per-element Python
    loop is measurable at 100k-row batches. numpy input stays numpy
    (zero-object fast path); lists fall back element-wise when the column
    has NULLs or non-int values."""
    import numpy as np

    if isinstance(values, np.ndarray):
        v = values.astype(np.int64, copy=False)
    else:
        try:
            v = np.asarray(values, dtype=np.int64)
        except (ValueError, TypeError, OverflowError):
            return [normalize_epoch_us(int(t)) if t is not None else None
                    for t in values]
    if len(v):
        # single-unit fast path: real columns are one epoch unit
        # throughout, so two scalar reductions replace three masked
        # where-passes (ack-path hot: runs per payload)
        lo, hi = int(v.min()), int(v.max())
        if lo >= _NS_MIN:
            out = v // 1000
        elif lo >= _US_MIN and hi < _NS_MIN:
            out = v
        elif lo >= _MS_MIN and hi < _US_MIN:
            out = v * 1000
        elif 0 <= lo and hi < _MS_MIN:
            out = v * 1_000_000
        else:
            out = np.where(
                v >= _NS_MIN, v // 1000,
                np.where(v >= _US_MIN, v,
                         np.where(v >= _MS_MIN, v * 1000, v * 1_000_000)),
            )
    else:
        out = v
    return out if isinstance(values, np.ndarray) else out.tolist()


def decode_msgpack_payload(data: bytes) -> dict:
    """Decode an arc wire payload (columnar `{m, columns, tags?}`, row
    `{m, t, fields, tags?}`, or batch `{batch: [rows]}`) into the columnar
    form {measurement, columns: {name: values}, tag_columns: [..]}.

    Columnar payloads take the zero-object fast path
    (:func:`arc_spark.sources.msgpack_codec.unpack_columnar`): homogeneous
    numeric columns arrive as numpy arrays and string columns as Arrow
    StringArrays — no per-cell Python objects between the wire and the
    Arrow flush. Row/batch payloads use the generic decoder.
    """
    from arc_spark.sources.msgpack_codec import unpack_columnar

    try:
        return _decode_msgpack_payload(data)
    except MalformedPayloadError:
        raise
    except (ValueError, TypeError, KeyError, IndexError, OverflowError,
            RecursionError, struct.error) as e:
        # truncated/garbage/hostile bytes: surface as the CLIENT-fault
        # type (HTTP 400, breaker-neutral), never a bare engine error
        raise MalformedPayloadError(
            f"undecodable msgpack payload: {e}") from None


def _decode_msgpack_payload(data: bytes) -> dict:
    from arc_spark.sources.msgpack_codec import unpack_columnar

    fast = unpack_columnar(data)
    if fast is not None:
        cols = fast["columns"]
        if "time" in cols:
            t = cols["time"]
            if isinstance(t, pa.Array):
                # numeric-string epochs: the generic path accepts them via
                # per-element int() — match it
                t = t.to_pylist()
            cols["time"] = _normalize_epoch_us_column(t)
        return fast
    obj = unpackb(data)
    if isinstance(obj, dict) and "columns" in obj:
        cols = {str(k): list(v) for k, v in obj["columns"].items()}
        if "time" in cols:
            cols["time"] = _normalize_epoch_us_column(cols["time"])
        return {
            "measurement": obj.get("m") or obj.get("measurement"),
            "columns": cols,
            "tag_columns": list(obj.get("tags") or obj.get("tag_columns") or []),
        }
    rows = obj["batch"] if isinstance(obj, dict) and "batch" in obj else [obj]
    if not isinstance(rows, list) or not all(
            isinstance(r, dict) for r in rows):
        raise MalformedPayloadError(
            "payload is valid MessagePack but not an arc wire shape "
            "(columnar map, row record, or batch)")
    return rows_to_columnar(rows)


def rows_to_columnar(rows: list[dict]) -> dict:
    """Row records ({m, t, fields{}, tags{}}) → columnar batch."""
    if not rows:
        return {"measurement": None, "columns": {}, "tag_columns": []}
    measurement = rows[0].get("m") or rows[0].get("measurement")
    tag_keys: list[str] = []
    field_keys: list[str] = []
    for r in rows:
        for k in (r.get("tags") or {}):
            if k not in tag_keys:
                tag_keys.append(k)
        for k in (r.get("fields") or {}):
            if k not in field_keys:
                field_keys.append(k)
    columns: dict[str, list] = {"time": []}
    for k in tag_keys + field_keys:
        columns[k] = []
    for r in rows:
        # explicit None chain: a legitimate epoch-0 timestamp is falsy.
        # time_us is the key parse_line/parse_batch emit (already µs;
        # normalize_epoch_us is idempotent on µs magnitudes).
        t = r.get("t")
        if t is None:
            t = r.get("time")
        if t is None:
            t = r.get("timestamp")
        if t is None:
            t = r.get("time_us")
        columns["time"].append(normalize_epoch_us(int(t)) if t is not None else None)
        tags = r.get("tags") or {}
        fields = r.get("fields") or {}
        for k in tag_keys:
            columns[k].append(tags.get(k))
        for k in field_keys:
            columns[k].append(fields.get(k))
    return {"measurement": measurement, "columns": columns, "tag_columns": tag_keys}


def _infer_arrow_type(
    name: str,
    values,
    tag_columns: set[str],
    decimal_columns: dict[str, tuple[int, int]] | None = None,
) -> pa.DataType:
    import numpy as np

    if name == "time":
        return pa.timestamp("us")
    if decimal_columns and name in decimal_columns:
        p, s = decimal_columns[name]
        return pa.decimal128(p, s)
    if name in tag_columns:
        return pa.string()
    # fast-path columns carry their type already
    if isinstance(values, pa.Array):
        return values.type
    if isinstance(values, np.ndarray):
        if values.dtype.kind == "f":
            return pa.float64()
        if values.dtype.kind in ("i", "u"):
            return pa.int64()
        if values.dtype.kind == "b":
            return pa.bool_()
        raise TypeError(f"unsupported ingest dtype {values.dtype} in column {name!r}")
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            return pa.bool_()
        if isinstance(v, int):
            return pa.int64()
        if isinstance(v, float):
            return pa.float64()
        if isinstance(v, str):
            return pa.string()
        raise TypeError(f"unsupported ingest type {type(v)} in column {name!r}")
    return pa.string()  # all-null column defaults to string (nullable)


def columnar_to_arrow(
    batch: dict,
    decimal_columns: dict[str, tuple[int, int]] | None = None,
) -> pa.Table:
    """Columnar dict batch → typed Arrow table (arc's type system exactly).

    ``decimal_columns`` maps column → (precision, scale), the per-measurement
    DECIMAL128 config of the reference (internal/config/decimal.go:9-60,
    arrow_writer.go:491-497: `measurement:col=precision,scale`). Values may
    arrive as int/float/string; all are quantized to the configured scale.
    """
    import decimal as _dec

    import numpy as np

    cols = batch["columns"]
    tag_set = set(batch.get("tag_columns") or [])
    arrays, names = [], []
    for name, values in cols.items():
        typ = _infer_arrow_type(name, values, tag_set, decimal_columns)
        fast = isinstance(values, (np.ndarray, pa.Array))
        if name == "time":
            if fast:
                arr = pa.array(np.asarray(values, dtype=np.int64))
            else:
                arr = pa.array([v if v is None else int(v) for v in values],
                               type=pa.int64())
            arrays.append(arr.cast(pa.timestamp("us")))
        elif pa.types.is_decimal(typ):
            vals = values.tolist() if isinstance(values, np.ndarray) else (
                values.to_pylist() if isinstance(values, pa.Array) else values
            )
            q = _dec.Decimal(1).scaleb(-typ.scale)
            arrays.append(pa.array(
                [None if v is None else _dec.Decimal(str(v)).quantize(q)
                 for v in vals],
                type=typ,
            ))
        elif fast:
            # zero-object path: ndarray → pa.array (one C call); a numeric
            # ndarray for a tag column casts to the declared string type
            arr = values if isinstance(values, pa.Array) else pa.array(values)
            arrays.append(arr if arr.type == typ else arr.cast(typ))
        elif pa.types.is_int64(typ):
            arrays.append(pa.array([None if v is None else int(v) for v in values], type=typ))
        elif pa.types.is_float64(typ):
            arrays.append(pa.array(
                [None if v is None else float(v) for v in values], type=typ))
        else:
            arrays.append(pa.array(values, type=typ))
        names.append(name)
    return pa.table(dict(zip(names, arrays)))


def merge_batches(tables: list[pa.Table]) -> pa.Table:
    """Union-by-name merge across schema evolution: missing columns → null
    (reference mergeBatches with validity bitmaps, arrow_writer.go:2706-2930).

    An ENTIRELY-null column in one batch carries no type information —
    inference defaulted it (string), which used to hard-fail the merge
    when another batch carried the column's real type (reference issue
    #337: ingest dropped/failed all-null batch columns). Pre-pass: relax
    every all-null column to Arrow's null type, which permissive concat
    promotes to whatever real type any sibling batch holds; a column
    null in EVERY batch falls back to string post-concat (the on-disk
    type it always had)."""
    relaxed = []
    for t in tables:
        cols, changed = [], False
        for i, f in enumerate(t.schema):
            c = t.column(i)
            # only STRING all-null columns relax: string is exactly what
            # inference DEFAULTS to with zero type evidence; configured
            # types (decimal128, timestamp) are intentional and must not
            # round-trip through null
            if (pa.types.is_string(f.type)
                    and c.null_count == len(c) and len(c) > 0):
                c = pa.nulls(len(c))
                changed = True
            cols.append(c)
        relaxed.append(pa.table(dict(zip(t.column_names, cols)))
                       if changed else t)
    out = pa.concat_tables(relaxed, promote_options="permissive")
    null_fields = [f.name for f in out.schema if pa.types.is_null(f.type)]
    if null_fields:
        out = out.cast(pa.schema(
            [pa.field(f.name, pa.string() if f.name in null_fields
                      else f.type, f.nullable) for f in out.schema]))
    return out


def columnar_to_dataframe(spark, batch: dict):
    """Columnar wire batch → Spark DataFrame (Arrow-native, zero row loop)."""
    table = columnar_to_arrow(batch)
    return spark.createDataFrame(table)
