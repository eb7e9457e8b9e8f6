"""End-to-end HTTP serve-path fuzz (r10 verdict item 7).

test_properties fuzzes the typed-JSON ENCODER against json.dumps; this
locks the whole read wire path — random table → parquet flush →
snapshot/catalog → live HTTP POST /api/v1/query → typed-JSON chunks →
parse-back — against DuckDB reading the very same parquet files. Both
serving paths are driven per example: the native pyarrow fast scan
(bare SELECT * ... LIMIT shape) and the Spark path (non-trivial
predicate forces a real Spark job through the same encoder).
"""

from __future__ import annotations

import datetime as dt
import json
import math
import urllib.request

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arc_spark.api import IngestService, QueryService
from arc_spark.auth import AuthStore
from arc_spark.catalog import MeasurementCatalog
from arc_spark.server import ArcServer
from arc_spark.sources.writer import write_measurement_arrow

# time values stay inside ONE day so an example writes a handful of hour
# partitions, not hundreds
_T0 = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in µs
_T_SPAN = 4 * 3600 * 1_000_000

_COL_TYPES = ("int", "float", "bool", "string")

_name_st = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s not in {"time", "year", "month", "day", "hour"})

_text_st = st.text(
    alphabet=st.characters(max_codepoint=0x10FFFF,
                           exclude_categories=("Cs",)),
    max_size=40,
)


def _value_st(kind: str):
    if kind == "int":
        base = st.integers(min_value=-(2**62), max_value=2**62)
    elif kind == "float":
        base = st.floats(allow_nan=False, allow_infinity=False, width=64)
    elif kind == "bool":
        base = st.booleans()
    else:
        base = _text_st
    return st.none() | base


@st.composite
def _tables(draw):
    n = draw(st.integers(min_value=1, max_value=80))
    names = draw(st.lists(_name_st, min_size=1, max_size=4, unique=True))
    kinds = [draw(st.sampled_from(_COL_TYPES)) for _ in names]
    arrays = {"time": pa.array(
        [draw(st.integers(min_value=_T0, max_value=_T0 + _T_SPAN))
         for _ in range(n)], pa.int64())}
    pa_types = {"int": pa.int64(), "float": pa.float64(),
                "bool": pa.bool_(), "string": pa.string()}
    for name, kind in zip(names, kinds):
        arrays[name] = pa.array(
            [draw(_value_st(kind)) for _ in range(n)], pa_types[kind])
    return pa.table(arrays)


@pytest.fixture(scope="module")
def serve_env(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_fuzz")
    root = str(tmp / "data")
    ingest = IngestService(spark, root, max_buffer_rows=10**9,
                           max_buffer_age_s=10**9)
    cat = MeasurementCatalog(spark, root)
    svc = QueryService(spark, cat)
    auth = AuthStore(str(tmp / "auth.db"))
    admin = auth.create_token("admin")
    server = ArcServer(svc, ingest, auth).start()
    try:
        yield server.port, admin, root, svc
    finally:
        server.stop()


def _http_query(port: int, token: str, sql: str) -> tuple[list[str], list]:
    """POST /api/v1/query (typed-JSON wire) → (column names, row arrays)."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v1/query",
        data=json.dumps({"sql": sql}).encode(), method="POST")
    req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=120) as resp:
        body = resp.read()
    parts = json.loads(body)
    assert parts and "columns" in parts[0], f"bad envelope head: {parts[:1]}"
    cols = [c["name"] for c in parts[0]["columns"]]
    rows = [r for p in parts[1:] for r in p["data"]]
    return cols, rows


def _norm_cell(v, kind_hint=None):
    """Engine-neutral cell form. Timestamps: server emits naive-UTC ISO
    strings; DuckDB returns tz-aware datetimes — both land on epoch µs."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return ("t", (v - dt.datetime(1970, 1, 1))
                // dt.timedelta(microseconds=1))
    if kind_hint == "timestamp" and isinstance(v, str):
        parsed = dt.datetime.fromisoformat(v)
        return _norm_cell(parsed)
    if kind_hint == "timestamp" and isinstance(v, int):
        return ("t", v)  # msgpack wire: timestamps travel as epoch µs
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _norm_rows(cols: list[str], rows, ts_cols: set[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(
            _norm_cell(row[i],
                       "timestamp" if cols[i] in ts_cols else None)
            for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


_counter = [0]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(table=_tables())
def test_http_serve_matches_duckdb(serve_env, table):
    import duckdb

    port, admin, root, svc = serve_env
    _counter[0] += 1
    meas = f"m{_counter[0]}"
    write_measurement_arrow(table, root, "fuzz", meas, tag_columns=[])
    svc.register_measurement("fuzz", meas, view=meas)

    # SELECT * on a measurement exposes the hive partition columns on
    # every path (Spark view, native shape detect, scan_arrow) — that is
    # the engine's hive-table contract, so the oracle models it too
    data_cols = [c for c in table.column_names if c != "time"]
    part_cols = ["year", "month", "day", "hour"]
    all_cols = ["time"] + data_cols + part_cols
    sel = ", ".join(
        ["time"] + data_cols
        + [f"CAST({c} AS BIGINT) AS {c}" for c in part_cols])
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT {sel} FROM read_parquet("
        f"'{root}/fuzz/{meas}/**/*.parquet', hive_partitioning=1)"
    ).fetchall()
    duck_norm = _norm_rows(all_cols, [list(r) for r in duck], {"time"})

    # native fast-scan path (no Spark job) — bare SELECT-*-LIMIT shape
    cols_n, rows_n = _http_query(
        port, admin, f"SELECT * FROM {meas} LIMIT 1000000")
    assert sorted(cols_n) == sorted(all_cols)
    assert _norm_rows(cols_n, rows_n, {"time"}) == duck_norm

    # Spark path — the non-trivial predicate defeats native shape
    # detection, so the same rows travel Spark plan → toArrow → encoder
    cols_s, rows_s = _http_query(
        port, admin, f"SELECT * FROM {meas} WHERE 1=1")
    assert sorted(cols_s) == sorted(all_cols)
    assert _norm_rows(cols_s, rows_s, {"time"}) == duck_norm

    # Arrow wire over the same native shape: parse the IPC stream back
    # and hold it to the same oracle rows
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v1/query",
        data=json.dumps({"sql": f"SELECT * FROM {meas} LIMIT 1000000",
                         "format": "arrow"}).encode(), method="POST")
    req.add_header("Authorization", f"Bearer {admin}")
    with urllib.request.urlopen(req, timeout=120) as resp:
        arrow_tbl = pa.ipc.open_stream(resp.read()).read_all()
    assert sorted(arrow_tbl.column_names) == sorted(all_cols)
    arrow_rows = [list(r.values()) for r in arrow_tbl.to_pylist()]
    assert _norm_rows(arrow_tbl.column_names, arrow_rows,
                      {"time"}) == duck_norm

    # columnar-msgpack wire (r11 verdict item 5 — this was the one
    # serve format with encoder-unit coverage only): decode the
    # {"frames", "column_order"} envelope with the codec's own GENERIC
    # decoder (unpackb — a separate code path from the vectorized
    # encoder, so an encode bug can't self-verify) and hold the rows to
    # the same DuckDB oracle. Timestamps travel as epoch µs on this wire.
    from arc_spark.sources.msgpack_codec import unpackb

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v1/query",
        data=json.dumps({"sql": f"SELECT * FROM {meas} LIMIT 1000000",
                         "format": "msgpack"}).encode(), method="POST")
    req.add_header("Authorization", f"Bearer {admin}")
    with urllib.request.urlopen(req, timeout=120) as resp:
        env = unpackb(resp.read())
    mp_cols = list(env["column_order"])
    assert sorted(mp_cols) == sorted(all_cols)
    mp_rows: list[list] = []
    for frame in env["frames"]:
        fcols = frame["columns"]
        for i in range(frame["n"]):
            mp_rows.append([fcols[c][i] for c in mp_cols])
    assert _norm_rows(mp_cols, mp_rows, {"time"}) == duck_norm
