"""Independent Iceberg v2 table reader — the export cross-check.

Walks a table the way a directory-based Iceberg reader does (the spec +
the Hadoop-catalog convention the reference's exporter.go publishes):
version-hint.text → v<N>.metadata.json → current snapshot →
manifest-list Avro → manifest Avro → data files, with strict validation
at each hop. Shares NO code with `arc_spark.operators.iceberg_export`;
Avro decoding comes from the spec-derived `tests/_avro_reader.py`, and
manifest fields are resolved BY FIELD-ID from the embedded Avro schema
(what PyIceberg/Java actually project by), so a wrong or missing
field-id fails here even if names line up.
"""

from __future__ import annotations

import json
import os

from tests._avro_reader import read_avro


class IcebergError(AssertionError):
    pass


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise IcebergError(msg)


def _by_field_id(schema: dict, record: dict) -> dict:
    """{field-id: value} for one decoded record — id-based projection."""
    out = {}
    for f in schema["fields"]:
        _require("field-id" in f,
                 f"avro field {f['name']!r} lacks a field-id")
        out[f["field-id"]] = record[f["name"]]
    return out


def read_table(table_path: str) -> dict:
    """Resolve the current snapshot's file set with validation.
    Returns {"version", "snapshot_id", "schema", "partition_columns",
    "files": [{path, record_count, file_size, partition}]}."""
    md = os.path.join(table_path, "metadata")
    hint = os.path.join(md, "version-hint.text")
    _require(os.path.isfile(hint), "missing version-hint.text")
    version = int(open(hint).read().strip())
    meta_path = os.path.join(md, f"v{version}.metadata.json")
    _require(os.path.isfile(meta_path),
             f"hint points at missing v{version}.metadata.json")
    meta = json.load(open(meta_path))

    _require(meta["format-version"] == 2, "expected format-version 2")
    for req in ("table-uuid", "location", "last-sequence-number",
                "last-column-id", "schemas", "current-schema-id",
                "partition-specs", "default-spec-id", "sort-orders",
                "current-snapshot-id", "snapshots"):
        _require(req in meta, f"table metadata missing {req!r}")
    schema = next(s for s in meta["schemas"]
                  if s["schema-id"] == meta["current-schema-id"])
    field_ids = [f["id"] for f in schema["fields"]]
    _require(len(set(field_ids)) == len(field_ids), "duplicate field ids")
    _require(max(field_ids, default=0) <= meta["last-column-id"],
             "last-column-id below a schema field id")
    spec = next(s for s in meta["partition-specs"]
                if s["spec-id"] == meta["default-spec-id"])
    schema_ids = {f["id"]: f["name"] for f in schema["fields"]}
    for pf in spec["fields"]:
        _require(pf["source-id"] in schema_ids,
                 f"partition source-id {pf['source-id']} not in schema")
        _require(pf["field-id"] >= 1000, "partition field-id below 1000")
        _require(pf["transform"] == "identity",
                 "exporter only emits identity transforms")
    pcols = [pf["name"] for pf in spec["fields"]]

    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    _require(snap["sequence-number"] <= meta["last-sequence-number"],
             "snapshot sequence above last-sequence-number")

    mlist_path = snap["manifest-list"]
    _require(os.path.isfile(mlist_path),
             f"manifest-list missing: {mlist_path}")
    ml_schema, _, manifests = read_avro(open(mlist_path, "rb").read())

    files = []
    for m in manifests:
        mf = _by_field_id(ml_schema, m)
        # 500 path, 501 length, 517 content, 503 added snapshot,
        # 515/516 sequence bounds, 504-506 file counts, 512-514 rows
        _require(os.path.isfile(mf[500]),
                 f"manifest missing: {mf[500]}")
        _require(os.path.getsize(mf[500]) == mf[501],
                 "manifest_length mismatch")
        _require(mf[517] == 0, "expected data manifest (content=0)")
        _require(mf[516] <= mf[515] <= meta["last-sequence-number"],
                 "manifest sequence bounds invalid")
        man_schema, man_meta, entries = read_avro(open(mf[500], "rb").read())
        _require(man_meta.get("format-version") == b"2",
                 "manifest lacks format-version=2 metadata")
        man_spec = json.loads(man_meta["partition-spec"])
        _require([f["name"] for f in man_spec] == pcols,
                 "manifest partition-spec disagrees with table spec")
        counted = {"added": 0, "existing": 0, "deleted": 0}
        rows = {"added": 0, "existing": 0, "deleted": 0}
        for e in entries:
            ent = _by_field_id(man_schema, e)
            status = ent[0]
            _require(status in (0, 1, 2), f"bad entry status {status}")
            df_field = next(f for f in man_schema["fields"]
                            if f["field-id"] == 2)
            df = _by_field_id(df_field["type"], ent[2])
            # 134 content, 100 path, 101 format, 102 partition,
            # 103 record_count, 104 file_size_in_bytes
            _require(df[134] == 0, "expected data file (content=0)")
            _require(df[101].upper() == "PARQUET", "unexpected format")
            part_schema = next(f for f in df_field["type"]["fields"]
                               if f["field-id"] == 102)["type"]
            partition = {}
            for pf, spec_f in zip(part_schema["fields"], spec["fields"]):
                _require(pf["field-id"] == spec_f["field-id"],
                         "partition struct field-id disagrees with spec")
                partition[pf["name"]] = ent[2]["partition"][pf["name"]]
            key = {1: "added", 0: "existing", 2: "deleted"}[status]
            counted[key] += 1
            rows[key] += df[103]
            if status == 2:
                continue
            _require(os.path.isfile(df[100]),
                     f"data file missing: {df[100]}")
            _require(os.path.getsize(df[100]) == df[104],
                     f"file_size_in_bytes mismatch for {df[100]}")
            files.append({"path": df[100], "record_count": df[103],
                          "file_size": df[104], "partition": partition})
        _require(counted["added"] == mf[504]
                 and counted["existing"] == mf[505]
                 and counted["deleted"] == mf[506],
                 "manifest-list file counts disagree with entries")
        _require(rows["added"] == mf[512]
                 and rows["existing"] == mf[513]
                 and rows["deleted"] == mf[514],
                 "manifest-list row counts disagree with entries")
    return {"version": version, "snapshot_id": snap["snapshot-id"],
            "schema": schema, "partition_columns": pcols, "files": files}


_DUCK = {"string": "VARCHAR", "long": "BIGINT", "int": "INTEGER",
         "double": "DOUBLE", "float": "FLOAT", "boolean": "BOOLEAN",
         "date": "DATE", "timestamp": "TIMESTAMP",
         "timestamptz": "TIMESTAMPTZ", "binary": "BLOB"}


def duckdb_sql(table_path: str, state: dict | None = None) -> str:
    """DuckDB SELECT materializing the resolved snapshot — partition
    columns injected from manifest partition metadata as typed literals
    (identity-partitioned columns are absent from the data pages,
    exactly like an Iceberg reader of a migrated hive table)."""
    state = state or read_table(table_path)
    types = {f["name"]: f["type"] for f in state["schema"]["fields"]}
    selects = []
    for f in sorted(state["files"], key=lambda x: x["path"]):
        full = f["path"].replace("'", "''")
        parts = []
        for c in state["partition_columns"]:
            v = f["partition"][c]
            duck_t = _DUCK.get(types.get(c, "string"), "VARCHAR")
            lit = "NULL" if v is None else str(v)
            parts.append(f"CAST({lit} AS {duck_t}) AS \"{c}\"")
        cols = ", ".join(["t.*"] + parts)
        selects.append(f"SELECT {cols} FROM read_parquet('{full}') t")
    if not selects:
        return "SELECT 1 WHERE FALSE"
    return " UNION ALL ".join(selects)
