"""Minimal Avro Object Container File writer (spec: Apache Avro 1.11.x,
https://avro.apache.org/docs/1.11.1/specification/) — just enough of the
format for Iceberg manifest / manifest-list files: null codec, one
block, generic records driven by a JSON schema.

Why hand-rolled: this container has no avro/fastavro package and no
network, and the subset Iceberg needs is small — zigzag-varint ints,
length-prefixed strings/bytes, records, unions (only ``["null", X]``
optionals), arrays, and maps. The writer is schema-driven and recursive,
so the Iceberg exporter (`iceberg_export.py`) stays declarative.

Scale note: manifests are metadata-plane (one short record per data
file); even a 100 TB table compacted to ~1 file/partition-hour yields a
few MB of Avro — driver-side encoding is never the bottleneck.
"""

from __future__ import annotations

import json
import os
import struct

MAGIC = b"Obj\x01"


def _varint(n: int, out: bytearray) -> None:
    """Unsigned LEB128 (Avro's variable-length base)."""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _long(n: int, out: bytearray) -> None:
    """Avro int/long: zigzag then varint."""
    _varint((n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1, out)


def _bytes(b: bytes, out: bytearray) -> None:
    _long(len(b), out)
    out.extend(b)


def _encode(schema, v, out: bytearray) -> None:
    """One value per the (JSON-decoded) schema node."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: pick the branch by value
        if v is None:
            idx = schema.index("null")
            _long(idx, out)
            return
        branches = [(i, s) for i, s in enumerate(schema) if s != "null"]
        if len(branches) != 1:
            raise ValueError("only 2-branch [null, X] unions supported")
        idx, schema = branches[0]
        _long(idx, out)
        _encode(schema, v, out)
        return
    else:
        t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _long(int(v), out)
    elif t == "float":
        out.extend(struct.pack("<f", float(v)))
    elif t == "double":
        out.extend(struct.pack("<d", float(v)))
    elif t == "string":
        _bytes(v.encode("utf-8"), out)
    elif t == "bytes":
        _bytes(bytes(v), out)
    elif t == "fixed":
        b = bytes(v)
        if len(b) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.extend(b)
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], v[f["name"]], out)
    elif t == "array":
        items = list(v)
        if items:
            _long(len(items), out)
            for it in items:
                _encode(schema["items"], it, out)
        _long(0, out)
    elif t == "map":
        entries = dict(v)
        if entries:
            _long(len(entries), out)
            for k, mv in entries.items():
                _bytes(str(k).encode("utf-8"), out)
                _encode(schema["values"], mv, out)
        _long(0, out)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def write_avro(schema: dict, records: list[dict],
               metadata: dict[str, str] | None = None) -> bytes:
    """Serialize ``records`` into a one-block Avro container (null codec).

    ``metadata`` lands in the file-header map next to avro.schema —
    Iceberg manifests require keys like ``schema``/``partition-spec``/
    ``format-version`` there."""
    out = bytearray(MAGIC)
    meta = {"avro.schema": json.dumps(schema, separators=(",", ":")),
            "avro.codec": "null"}
    for k, v in (metadata or {}).items():
        meta[k] = v
    _long(len(meta), out)
    for k, v in meta.items():
        _bytes(k.encode("utf-8"), out)
        _bytes(v.encode("utf-8"), out)
    _long(0, out)
    sync = os.urandom(16)
    out.extend(sync)
    body = bytearray()
    for r in records:
        _encode(schema, r, body)
    _long(len(records), out)
    _long(len(body), out)
    out.extend(body)
    out.extend(sync)
    return bytes(out)
