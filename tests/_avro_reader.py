"""Independent Avro Object Container File reader — the Iceberg export
cross-check's decode side. Written from the Avro 1.11 spec with NO code
shared with `arc_spark.operators.avro_min` (that module only writes;
this one re-derives varint/zigzag, block framing, and schema-driven
decoding from the spec text), so an encoding bug in the writer — wrong
zigzag, bad union branch index, missing block terminator, sync-marker
mismatch — fails loudly here instead of round-tripping invisibly.

Supports what Iceberg metadata files use: null codec, primitives,
records, ["null", X] unions, arrays, maps, fixed.
"""

from __future__ import annotations

import json
import struct


class AvroError(AssertionError):
    pass


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError("truncated avro data")
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def varint(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.take(1)[0]
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise AvroError("varint too long")
        return acc

    def long(self) -> int:
        u = self.varint()
        return (u >> 1) ^ -(u & 1)  # un-zigzag

    def bytes_(self) -> bytes:
        n = self.long()
        if n < 0:
            raise AvroError("negative length")
        return self.take(n)


def _decode(schema, cur: _Cursor):
    if isinstance(schema, list):  # union
        idx = cur.long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union branch {idx} out of range")
        return _decode(schema[idx], cur)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return cur.take(1) == b"\x01"
    if t in ("int", "long"):
        return cur.long()
    if t == "float":
        return struct.unpack("<f", cur.take(4))[0]
    if t == "double":
        return struct.unpack("<d", cur.take(8))[0]
    if t == "string":
        return cur.bytes_().decode("utf-8")
    if t == "bytes":
        return cur.bytes_()
    if t == "fixed":
        return cur.take(schema["size"])
    if t == "record":
        return {f["name"]: _decode(f["type"], cur)
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = cur.long()
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                cur.long()
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], cur))
    if t == "map":
        out = {}
        while True:
            n = cur.long()
            if n == 0:
                return out
            if n < 0:
                cur.long()
                n = -n
            for _ in range(n):
                k = cur.bytes_().decode("utf-8")
                out[k] = _decode(schema["values"], cur)
    raise AvroError(f"unsupported avro type {t!r}")


def read_avro(data: bytes) -> tuple[dict, dict[str, bytes], list[dict]]:
    """(schema, file metadata, records) from container bytes."""
    cur = _Cursor(data)
    if cur.take(4) != b"Obj\x01":
        raise AvroError("bad avro magic")
    meta: dict[str, bytes] = {}
    while True:
        n = cur.long()
        if n == 0:
            break
        if n < 0:
            cur.long()
            n = -n
        for _ in range(n):
            k = cur.bytes_().decode("utf-8")
            meta[k] = cur.bytes_()
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise AvroError(f"unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    sync = cur.take(16)
    records: list[dict] = []
    while cur.pos < len(cur.buf):
        count = cur.long()
        size = cur.long()
        block = _Cursor(cur.take(size))
        for _ in range(count):
            records.append(_decode(schema, block))
        if block.pos != size:
            raise AvroError("block under/overrun")
        if cur.take(16) != sync:
            raise AvroError("sync marker mismatch")
    return schema, meta, records
