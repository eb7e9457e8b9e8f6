r"""InfluxDB Line Protocol parser.

Wire grammar (reference /root/reference/internal/ingest/lineprotocol.go:37-436):

    measurement[,tag=value...] field=value[,field=value...] [timestamp]

- escapes: ``\,`` ``\ `` in measurement; additionally ``\=`` in tag/field
  keys and tag values; ``\"`` and ``\\`` inside quoted string field values.
- field value types: float (default), ``123i`` int64, ``123u`` uint→int64,
  ``t/T/true/True/f/F/false/False`` bool, ``"..."`` string.
- timestamp: integer in the given precision (ns default; s/ms/us/ns),
  normalized to µs — arc's storage resolution (SURVEY §1.2).

Two surfaces:
- :func:`parse_batch` — pure-Python, for the API edge (small batches,
  latency path).
- :func:`lines_to_dataframe` — distributed parse of a DataFrame/RDD of raw
  lines via ``mapInPandas`` (bulk backfill path; the parser runs once per
  Arrow batch, not per row).
"""

from __future__ import annotations

from collections.abc import Iterator

PRECISION_TO_US = {"ns": 1 / 1000, "us": 1, "u": 1, "ms": 1000, "s": 1_000_000}


class LineProtocolError(ValueError):
    pass


def _split_unescaped(s: str, sep: str) -> list[str]:
    """Split on unescaped `sep`. The separator's own escape is consumed
    (``\\,`` → ``,``); every other escape sequence is preserved verbatim for
    the later per-part unescape stage."""
    out, cur, i, n = [], [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == sep:
                cur.append(nxt)
            else:
                cur.append(c)
                cur.append(nxt)
            i += 2
            continue
        if c == sep:
            out.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    out.append("".join(cur))
    return out


def _tokenize(line: str) -> tuple[str, str, str | None]:
    """Split into (measurement+tags, fields, timestamp) on unescaped spaces,
    respecting quoted strings in the field section."""
    parts: list[str] = []
    cur: list[str] = []
    in_quotes = False
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == "\\" and i + 1 < n:
            cur.append(c)
            cur.append(line[i + 1])
            i += 2
            continue
        if c == '"' and parts:
            # quotes delimit STRING FIELD VALUES only; in the measurement/
            # tag section (before the first unescaped space) a double quote
            # is an ordinary character per the line-protocol spec
            in_quotes = not in_quotes
            cur.append(c)
            i += 1
            continue
        if c == " " and not in_quotes and len(parts) < 2:
            parts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    parts.append("".join(cur))
    if len(parts) < 2 or not parts[0] or not parts[1]:
        raise LineProtocolError(f"malformed line: {line!r}")
    return parts[0], parts[1], (parts[2] if len(parts) > 2 and parts[2] else None)


def _unescape(s: str, chars: str) -> str:
    out, i, n = [], 0, len(s)
    while i < n:
        if s[i] == "\\" and i + 1 < n and s[i + 1] in chars + "\\":
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


_BOOL_TRUE = {"t", "T", "true", "True", "TRUE"}
_BOOL_FALSE = {"f", "F", "false", "False", "FALSE"}


def _parse_field_value(raw: str):
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        return _unescape(raw[1:-1], '"')
    if raw in _BOOL_TRUE:
        return True
    if raw in _BOOL_FALSE:
        return False
    if raw and raw[-1] in "iu":
        try:
            return int(raw[:-1])
        except ValueError as e:
            raise LineProtocolError(f"bad integer field {raw!r}") from e
    try:
        return float(raw)
    except ValueError as e:
        raise LineProtocolError(f"bad field value {raw!r}") from e


def parse_line(line: str, precision: str = "ns") -> dict:
    """One LP line → {'measurement', 'tags': {..}, 'fields': {..}, 'time_us'}."""
    head, field_part, ts_part = _tokenize(line)

    head_parts = _split_unescaped(head, ",")
    measurement = _unescape(head_parts[0], ", ")
    tags: dict[str, str] = {}
    for t in head_parts[1:]:
        kv = _split_unescaped(t, "=")
        if len(kv) != 2 or not kv[0]:
            raise LineProtocolError(f"bad tag {t!r} in {line!r}")
        tags[_unescape(kv[0], ", =")] = _unescape(kv[1], ", =")

    fields: dict[str, object] = {}
    # split fields on unescaped commas outside quotes
    buf, items, in_q, i = [], [], False, 0
    while i < len(field_part):
        c = field_part[i]
        if c == "\\" and i + 1 < len(field_part):
            buf.append(c); buf.append(field_part[i + 1]); i += 2; continue
        if c == '"':
            in_q = not in_q
        if c == "," and not in_q:
            items.append("".join(buf)); buf = []; i += 1; continue
        buf.append(c); i += 1
    items.append("".join(buf))
    for item in items:
        eq = -1
        depth_q = False
        for j, c in enumerate(item):
            if c == '"':
                depth_q = not depth_q
            elif c == "=" and not depth_q and (j == 0 or item[j - 1] != "\\"):
                eq = j
                break
        if eq <= 0:
            raise LineProtocolError(f"bad field {item!r} in {line!r}")
        key = _unescape(item[:eq], ", =")
        fields[key] = _parse_field_value(item[eq + 1:])
    if not fields:
        raise LineProtocolError(f"no fields in {line!r}")

    time_us = None
    if ts_part is not None:
        try:
            raw = int(ts_part)
        except ValueError as e:
            raise LineProtocolError(f"bad timestamp {ts_part!r}") from e
        scale = PRECISION_TO_US.get(precision)
        if scale is None:
            raise LineProtocolError(f"bad precision {precision!r}")
        time_us = int(raw * scale) if scale >= 1 else raw // 1000
    return {"measurement": measurement, "tags": tags, "fields": fields, "time_us": time_us}


def parse_batch(text: str, precision: str = "ns", default_time_us: int | None = None) -> list[dict]:
    """Parse an LP payload (newline-separated; '#' comments skipped)."""
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        rec = parse_line(line, precision)
        if rec["time_us"] is None:
            rec["time_us"] = default_time_us
        out.append(rec)
    return out


def _infer_lp_schema(recs: list[dict]):
    """Sampled records → (tag_cols, field_types, per-measurement col map)."""
    tag_cols: set[str] = set()
    field_types: dict[str, type] = {}
    meas_tags: dict[str, set] = {}
    meas_fields: dict[str, set] = {}
    for r in recs:
        tag_cols.update(r["tags"])
        meas_tags.setdefault(r["measurement"], set()).update(r["tags"])
        meas_fields.setdefault(r["measurement"], set()).update(r["fields"])
        for k, v in r["fields"].items():
            prev = field_types.get(k)
            if prev is None or (prev is bool and isinstance(v, (int, float))):
                field_types[k] = type(v)
            elif prev is int and isinstance(v, float):
                field_types[k] = float
    return tag_cols, field_types, meas_tags, meas_fields


def payload_to_dataframe(spark, payload: bytes, precision: str = "ns",
                         chunk_bytes: int | None = None):
    """Bulk LP payload → (flattened DataFrame, schema info, line count).

    The payload is split into ~``chunk_bytes`` BYTE chunks at newline
    boundaries on the driver (O(bytes) slicing, no per-line Python), the
    chunks ship to executors as a tiny binary-column DataFrame, and parse
    happens in TWO distributed passes over the same chunk frame:

    1. schema pass — each chunk parses and emits only its per-measurement
       tag/field/type summary (a few rows of metadata per chunk), merged on
       the driver. EVERY line contributes, so a measurement or field that
       first appears deep in the payload is never silently dropped (a
       first-chunk sample cannot promise that).
    2. data pass — each chunk parses into the full merged schema with
       column-wise (not row-dict) building.

    The per-line Python cost is paid twice but spread over the cluster; the
    driver never builds an N-row DataFrame.
    """
    import pandas as pd

    if chunk_bytes is None:
        # ~2 chunks per core: full parallelism with some stragglers slack
        target = max(2 * spark.sparkContext.defaultParallelism, 1)
        chunk_bytes = max(len(payload) // target, 64 * 1024)
    chunks: list[bytes] = []
    start, n = 0, len(payload)
    while start < n:
        end = min(start + chunk_bytes, n)
        if end < n:
            nl = payload.find(b"\n", end)
            end = n if nl == -1 else nl + 1
        chunks.append(payload[start:end])
        start = end

    pdf = pd.DataFrame({"chunk": chunks})
    chunk_df = spark.createDataFrame(pdf).repartition(
        min(len(chunks), spark.sparkContext.defaultParallelism) or 1
    )

    # pass 1: exhaustive distributed schema inference
    def infer_chunks(batches):
        import json as _json

        for bpdf in batches:
            for chunk in bpdf["chunk"]:
                recs = [
                    parse_line(s, precision)
                    for s in bytes(chunk).decode("utf-8", "replace").splitlines()
                    if s.strip() and not s.startswith("#")
                ]
                tc, ft, mt, mf = _infer_lp_schema(recs)
                yield pd.DataFrame({
                    "summary": [_json.dumps({
                        "tags": sorted(tc),
                        "field_types": {k: t.__name__ for k, t in ft.items()},
                        "meas_tags": {m: sorted(s) for m, s in mt.items()},
                        "meas_fields": {m: sorted(s) for m, s in mf.items()},
                    })]
                })

    import json as _json

    _RANK = {"bool": 0, "int": 1, "float": 2, "str": 3}
    _TYPE = {"bool": bool, "int": int, "float": float, "str": str}
    tag_cols: set[str] = set()
    field_types: dict[str, type] = {}
    meas_tags: dict[str, set] = {}
    meas_fields: dict[str, set] = {}
    for row in chunk_df.mapInPandas(infer_chunks, "summary string").collect():
        s = _json.loads(row["summary"])
        tag_cols.update(s["tags"])
        for m, ts in s["meas_tags"].items():
            meas_tags.setdefault(m, set()).update(ts)
        for m, fs in s["meas_fields"].items():
            meas_fields.setdefault(m, set()).update(fs)
        for k, tname in s["field_types"].items():
            prev = field_types.get(k)
            if prev is None or _RANK[tname] > _RANK[prev.__name__]:
                # widen by rank except str never demotes numerics: int<float,
                # bool<int — same widening _infer_lp_schema applies per chunk
                field_types[k] = _TYPE[tname]
    spark_type = {int: "long", float: "double", str: "string", bool: "boolean"}
    schema = ", ".join(
        ["measurement string", "time timestamp_ntz"]
        + [f"`{c}` string" for c in sorted(tag_cols)]
        + [f"`{c}` {spark_type[t]}" for c, t in sorted(field_types.items())]
    )
    tag_list, field_list = sorted(tag_cols), sorted(field_types)
    n_lines = sum(
        1 for c in chunks
        for s in c.decode("utf-8", "replace").splitlines()
        if s.strip() and not s.startswith("#")
    )

    def parse_chunks(batches):
        for pdf in batches:
            for chunk in pdf["chunk"]:
                cols: dict[str, list] = {c: [] for c in
                                         ["measurement"] + tag_list + field_list}
                times: list = []
                for s in bytes(chunk).decode("utf-8", "replace").splitlines():
                    if not s.strip() or s.startswith("#"):
                        continue
                    r = parse_line(s, precision)
                    cols["measurement"].append(r["measurement"])
                    times.append(r["time_us"])
                    tags, fields = r["tags"], r["fields"]
                    for c in tag_list:
                        cols[c].append(tags.get(c))
                    for c in field_list:
                        cols[c].append(fields.get(c))
                out = pd.DataFrame(cols)
                out.insert(1, "time", pd.to_datetime(
                    pd.Series(times, dtype="float64") if not times
                    else pd.Series(times), unit="us"))
                yield out[["measurement", "time"] + tag_list + field_list]

    # pass 2: full parse into the merged schema
    flat = chunk_df.mapInPandas(parse_chunks, schema=schema)
    info = {
        "tags": {m: sorted(s) for m, s in meas_tags.items()},
        "fields": {m: sorted(s) for m, s in meas_fields.items()},
    }
    return flat, info, n_lines


def lines_to_dataframe(spark, lines_df, precision: str = "ns",
                       measurement: str | None = None,
                       return_schema: bool = False):
    """Distributed LP parse: DataFrame[value: string] → flattened DataFrame.

    Tags and fields are flattened to columns (arc stores no maps at rest —
    SURVEY §1.1): output schema is inferred from a driver-side sample, then
    applied in a single `mapInPandas` pass (Arrow-batched, parallel over
    input partitions — this is the 100 TB-safe path: no driver collect of
    data, one schema-inference sample only).

    return_schema=True additionally returns per-measurement column info
    ``{"tags": {meas: [...]}, "fields": {meas: [...]}}`` from the sample —
    the ingest bulk path uses it to write each measurement with only its
    own columns.
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    sample = [r[0] for r in lines_df.limit(1000).collect()]
    recs = [parse_line(s, precision) for s in sample if s and s.strip() and not s.startswith("#")]
    if measurement is not None:
        recs = [r for r in recs if r["measurement"] == measurement]
    tag_cols, field_types, meas_tags, meas_fields = _infer_lp_schema(recs)
    spark_type = {int: "long", float: "double", str: "string", bool: "boolean"}
    cols = ["measurement string", "time timestamp_ntz"]
    cols += [f"`{c}` string" for c in sorted(tag_cols)]
    cols += [f"`{c}` {spark_type[t]}" for c, t in sorted(field_types.items())]
    schema = ", ".join(cols)
    tag_list, field_list = sorted(tag_cols), sorted(field_types)

    def parse_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for s in pdf.iloc[:, 0]:
                if not s or not s.strip() or s.startswith("#"):
                    continue
                r = parse_line(s, precision)
                if measurement is not None and r["measurement"] != measurement:
                    continue
                row = {"measurement": r["measurement"],
                       "time": pd.Timestamp(r["time_us"], unit="us")
                               if r["time_us"] is not None else None}
                for c in tag_list:
                    row[c] = r["tags"].get(c)
                for c in field_list:
                    row[c] = r["fields"].get(c)
                rows.append(row)
            yield pd.DataFrame(rows, columns=["measurement", "time"] + tag_list + field_list)

    out = lines_df.mapInPandas(parse_partition, schema=schema)
    if return_schema:
        return out, {
            "tags": {m: sorted(s) for m, s in meas_tags.items()},
            "fields": {m: sorted(s) for m, s in meas_fields.items()},
        }
    return out
