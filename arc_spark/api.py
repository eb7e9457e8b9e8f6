"""Service facades: the reference's two HTTP surfaces as engine objects.

- :class:`QueryService` — POST /api/v1/query lifecycle
  (/root/reference/internal/api/query.go:1396-1935, SURVEY §3.1) minus the
  wire: governance admit → read-only validation → RBAC table check →
  catalog-resolved execution under a cancellable job group → row cap →
  JSON / Arrow IPC / columnar MessagePack serialization. An HTTP layer
  (any framework) calls ``execute`` per request.
- :class:`IngestService` — POST /api/v1/write lifecycle (SURVEY §3.3):
  decode → WAL append (the ACK point — durability is decoupled from
  flush latency, the reference's central ingest design) → in-memory
  Arrow buffer → size/age-triggered flush through the hour-partitioned
  writer. ``recover()`` replays the WAL after a crash.
"""

from __future__ import annotations

import os
import re
import time

from pyspark.sql import SparkSession

import threading

from arc_spark.catalog import MeasurementCatalog
from arc_spark.governance import Governor, QueryRegistry, RateLimitExceeded
from arc_spark.plans.time_pruning import prune_sql
from arc_spark.plans.validator import SqlValidationError, extract_tables, validate_read_only


class AccessDeniedError(Exception):
    """RBAC denial (reference A11). Distinct from builtin PermissionError,
    which the engine reserves for OS-level filesystem failures."""


# backwards-compat alias for pre-r3 importers
PermissionError_ = AccessDeniedError


def _lp_byte_ranges(payload: bytes, n: int) -> list[tuple[int, int]]:
    """(offset, length) byte ranges covering `payload`, newline-snapped:
    seek forward from each approximate cut to the next newline (O(n)
    scans, not O(bytes)). Shared by the local-threaded and distributed
    fused LP writers."""
    bounds = [0]
    step = max(1, len(payload) // n)
    for i in range(1, n):
        pos = payload.find(b"\n", i * step)
        if pos == -1:
            break
        if pos + 1 > bounds[-1]:
            bounds.append(pos + 1)
    bounds.append(len(payload))
    return [(off, end - off)
            for off, end in zip(bounds, bounds[1:]) if end > off]


class NativeScanUnsupported(Exception):
    """The native (pyarrow, no-Spark-job) serving path can't express this
    request shape — callers fall back to the full Spark path. NEVER
    surfaced to a client: it signals routing, not an error."""


# pure-time-range `where` grammar: `time <op> ts` atoms joined by AND,
# each optionally parenthesized, or a single `time BETWEEN ts AND ts`.
# ts is an ISO-8601 single-quoted literal (optionally TIMESTAMP-prefixed).
# Anything else — other columns, OR, functions, bare numbers — returns
# None and the Spark path keeps full SQL semantics (same stance as the
# native-COUNT shape check: exact-or-fall-through, never approximately).
_TR_TS = r"(?:TIMESTAMP\s+)?'([^']*)'"
_TR_ATOM_RE = re.compile(rf"(?is)^time\s*(>=|<=|>|<)\s*{_TR_TS}$")
_TR_BETWEEN_RE = re.compile(
    rf"(?is)^time\s+BETWEEN\s+{_TR_TS}\s+AND\s+{_TR_TS}$")
_TR_AND_SPLIT = re.compile(r"(?i)\s+AND\s+")


def _strip_outer_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            depth += (ch == "(") - (ch == ")")
            if depth == 0 and i < len(s) - 1:
                return s  # outer parens don't match each other
        s = s[1:-1].strip()
    return s


# literal shapes BOTH this parser and Spark's string→timestamp cast
# accept: dashed date, optional time, optional offset. Python 3.11's
# fromisoformat alone is WIDER than Spark (compact '20240115', week
# dates '2024-W03-1') — serving those natively while Spark casts them
# to NULL would return different rows per path (r8 review finding)
_TR_LIT_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}"
    r"([ T]\d{2}:\d{2}(:\d{2}(\.\d{1,6})?)?"
    r"(Z|[+-]\d{2}:?\d{2})?)?$")


def _parse_ts_literal(lit: str) -> int | None:
    """Epoch µs for an ISO literal, with Spark's string→timestamp cast
    semantics in the session's UTC zone: naive literals are UTC, offsets
    convert. Parse failures — and any form outside the Spark∩Python ISO
    intersection — return None (→ Spark path, which serves the
    cast-to-NULL / analysis-error semantics itself)."""
    import datetime as _dt

    lit = lit.strip()
    if not _TR_LIT_RE.match(lit):
        return None
    try:
        dt = _dt.datetime.fromisoformat(lit)
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    # integer arithmetic: float64 epoch seconds lose µs past 2^31 s
    # (verified: a 2038 literal came back 1 µs short via timestamp())
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    return (dt - epoch) // _dt.timedelta(microseconds=1)


def _combine_time_atoms(atoms: list[tuple[str, int]]):
    """(op, µs) atoms → TimeRange: the strictest lower bound (larger
    instant; exclusive on a tie) and the strictest upper bound win."""
    from arc_spark.catalog import TimeRange

    lo: tuple[int, bool] | None = None   # (µs, inclusive)
    hi: tuple[int, bool] | None = None
    for op, us in atoms:
        if op in (">", ">="):
            cand = (us, op == ">=")
            if lo is None or cand[0] > lo[0] or (cand[0] == lo[0]
                                                 and not cand[1]):
                lo = cand
        else:
            cand = (us, op == "<=")
            if hi is None or cand[0] < hi[0] or (cand[0] == hi[0]
                                                 and not cand[1]):
                hi = cand
    if lo is None and hi is None:
        return None
    return TimeRange(
        lo_us=lo[0] if lo else None, lo_incl=lo[1] if lo else True,
        hi_us=hi[0] if hi else None, hi_incl=hi[1] if hi else True)


def parse_time_range(where: str):
    """:class:`arc_spark.catalog.TimeRange` when `where` is a pure
    time-range predicate, else None."""
    from arc_spark.catalog import TimeRange

    s = _strip_outer_parens(where)
    m = _TR_BETWEEN_RE.match(s)
    if m:
        lo, hi = _parse_ts_literal(m.group(1)), _parse_ts_literal(m.group(2))
        if lo is None or hi is None:
            return None
        return TimeRange(lo_us=lo, lo_incl=True, hi_us=hi, hi_incl=True)
    if re.search(r"(?i)\bBETWEEN\b", s):
        return None  # BETWEEN inside a conjunction would mis-split on AND
    parts = _TR_AND_SPLIT.split(s)
    if not parts:
        return None
    atoms: list[tuple[str, int]] = []
    for part in parts:
        m = _TR_ATOM_RE.match(_strip_outer_parens(part))
        if not m:
            return None
        us = _parse_ts_literal(m.group(2))
        if us is None:
            return None
        atoms.append((m.group(1), us))
    return _combine_time_atoms(atoms)


# parsed-plan Filter-condition grammar (the SQL serving fast path):
#   node := atom | between | "(" node " AND " node ")"
# Catalyst prints conjunctions BINARY-NESTED with wrapping parens and
# literals bare, so requiring (a) paren/comma-free literals inside
# atoms, (b) exactly matching outer parens, and (c) exactly one
# top-level " AND " per level makes literal injection structurally
# impossible: a crafted string literal that mimics the printed shape
# must reintroduce a paren or comma (fails the atom) or break the
# outer-paren matching (fails the node) — either way → Spark path,
# which serves the cast-to-NULL semantics itself.
_PLAN_ATOM_RE = re.compile(r"(?is)^\('time (>=|<=|>|<) ([^(),]*)\)$")
_PLAN_BETWEEN_RE = re.compile(
    r"(?is)^'between\('time, ([^(),]*), ([^(),]*)\)$")


def _plan_cond_timerange(cond: str):
    """TimeRange from a PARSED-plan Filter condition's printed form,
    else None (→ full Spark execution)."""

    def walk(s: str) -> list[tuple[str, int]] | None:
        m = _PLAN_ATOM_RE.match(s)
        if m:
            us = _parse_ts_literal(m.group(2))
            return None if us is None else [(m.group(1), us)]
        m = _PLAN_BETWEEN_RE.match(s)
        if m:
            lo = _parse_ts_literal(m.group(1))
            hi = _parse_ts_literal(m.group(2))
            if lo is None or hi is None:
                return None
            return [(">=", lo), ("<=", hi)]
        if not (s.startswith("(") and s.endswith(")")):
            return None
        depth = 0
        for i, ch in enumerate(s):
            depth += (ch == "(") - (ch == ")")
            if depth == 0 and i < len(s) - 1:
                return None  # outer parens don't match each other
        inner = s[1:-1]
        depth = 0
        split = None
        for i, ch in enumerate(inner):
            depth += (ch == "(") - (ch == ")")
            if depth == 0 and inner.startswith(" AND ", i):
                if split is not None:
                    return None  # Catalyst prints binary ANDs only
                split = i
        if split is None:
            return None
        a = walk(inner[:split])
        b = walk(inner[split + 5:])
        if a is None or b is None:
            return None
        return a + b

    atoms = walk(cond.strip())
    return _combine_time_atoms(atoms) if atoms else None


class QueryService:
    def __init__(
        self,
        spark: SparkSession,
        catalog: MeasurementCatalog,
        governor: Governor | None = None,
        allowed_tables: dict[str, set[str]] | None = None,
        rbac=None,
        token_info_fn=None,
    ):
        self.spark = spark
        self.catalog = catalog
        self.governor = governor or Governor()
        self.registry = QueryRegistry(spark)
        # token → set of "db.measurement" (None entry = all); RBAC check is
        # plan-walk table extraction, not regex (reference A11)
        self.allowed_tables = allowed_tables or {}
        # hierarchical RBAC (reference query.go:1230-1305 checkQueryRBAC):
        # rbac is an rbac.RBACStore; token_info_fn maps a plaintext token
        # to AuthStore.verify()-shaped info (None = unknown → the HTTP
        # auth layer already rejected it, so the engine-side check skips)
        self.rbac = rbac
        self.token_info_fn = token_info_fn
        self._plan_lock = threading.Lock()

    def _check_rbac(self, token: str, sql: str, db: str | None = None,
                    permission: str = "read") -> None:
        refs = None
        if token in self.allowed_tables:
            allowed = self.allowed_tables[token]
            refs = extract_tables(self.spark, sql)
            for ref in refs:
                name = ".".join(ref)
                if name not in allowed and ref[-1] not in allowed:
                    raise AccessDeniedError(f"token lacks access to {name}")
        # hierarchical org/team/role check (reference checkQueryRBAC):
        # every table ref needs `permission` on its (database, measurement).
        # Unqualified refs resolve via the catalog's view bindings, then
        # the request-scoped db (the x-arc-database override the reference
        # applies to close the header-bypass), then "default".
        if self.rbac is None or not self.rbac.enabled:
            return
        info = self.token_info_fn(token) if self.token_info_fn else None
        if info is None:
            return  # no token identity → HTTP layer owns the decision
        if refs is None:
            refs = extract_tables(self.spark, sql)
        if not refs:
            return
        reqs = []
        for ref in refs:
            if len(ref) >= 2:
                pair = (ref[0], ref[-1])
            else:
                pair = (self.catalog.view_binding(ref[0])
                        or (db or "default", ref[0]))
            reqs.append((info, pair[0], pair[1], permission))
        for req, res in zip(reqs, self.rbac.check_permissions_batch(reqs)):
            if not res["allowed"]:
                raise AccessDeniedError(
                    f"access denied: no {permission} permission for"
                    f" {req[1]}.{req[2]}")

    def register_measurement(self, db: str, measurement: str, view: str | None = None) -> str:
        return self.catalog.register(db, measurement, view)

    def _scope_to_db(self, db: str, sql: str) -> None:
        """Header-database scoping (reference x-arc-database): reject
        multi-part table refs, and bind each unqualified ref that names a
        measurement of ``db`` to that measurement (bare-name view).
        Runs under ``_plan_lock`` so the view binding is not observable by
        a concurrently-scoped request for a different database."""
        measurements = set(self.catalog.measurements(db))
        for ref in extract_tables(self.spark, sql):
            if len(ref) >= 2:
                raise SqlValidationError(
                    "cross-database queries (db.table) not allowed when "
                    "the request is scoped to a database"
                )
            if ref[0] in measurements:
                self.catalog.register(db, ref[0], view=ref[0])

    _IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

    def query_measurement(
        self,
        db: str,
        measurement: str,
        where: str | None = None,
        order_by: str | None = None,
        limit: int = 1000,
        token: str = "",
        _admitted: bool = False,
    ):
        """GET /api/v1/query/:measurement shape (reference A13,
        query.go:3923-4130): a validated filter+order+limit over one
        measurement. `where` is validated through the read-only plan check
        (spliced into a SELECT and parsed — a second statement or DML fails
        validation) but *executed* as a parsed boolean expression on the
        DataFrame, with ORDER BY / LIMIT applied as plan operations — so a
        `where` ending in a comment token (`--`) cannot comment out the
        endpoint row limit. `order_by` columns must be bare identifiers,
        optionally suffixed ASC/DESC.

        ``_admitted``: the server's native-scan fallback already charged
        this request's rate-limit slot inside scan_measurement_arrow —
        one HTTP request must consume exactly one slot."""
        from pyspark.sql import functions as F

        if not _admitted:
            self.governor.admit(token)
        # register + parse + prune under the SAME lock as execute()'s
        # pruning: createOrReplaceTempView here must not interleave with a
        # concurrent prune override/restore of the same view name
        try:
            with self._plan_lock:
                view = self.catalog.register(db, measurement)
                val_sql = (f"SELECT * FROM {view}"
                           + (f" WHERE {where}" if where else ""))
                validate_read_only(self.spark, val_sql)
                self._check_rbac(token, val_sql, db=db)
                # the filter goes through prune_sql, so a WHERE time range
                # on this endpoint gets the derived partition predicate —
                # the reference's flagship pruned read path (BASELINE's
                # 4.7 ms time-bucket is this shape)
                df = prune_sql(self.spark, val_sql, self.catalog)
        except (SqlValidationError, AccessDeniedError, RateLimitExceeded):
            raise
        except Exception as e:
            raise SqlValidationError(f"invalid where clause: {e}") from None
        if order_by:
            sort_cols = []
            for part in order_by.split(","):
                tokens = part.strip().split()
                col = tokens[0] if tokens else ""
                direction = tokens[1].upper() if len(tokens) > 1 else "ASC"
                if (
                    len(tokens) > 2
                    or direction not in ("ASC", "DESC")
                    or not self._IDENT_RE.match(col)
                ):
                    raise SqlValidationError(f"invalid order_by part {part.strip()!r}")
                sort_cols.append(F.col(col).desc() if direction == "DESC" else F.col(col).asc())
            df = df.orderBy(*sort_cols)
        df = self.governor.cap(token, df.limit(int(limit)))
        return self.registry.run(
            df,
            sql=val_sql + f" LIMIT {int(limit)}",
            token=token,
            timeout_s=self.governor.timeout_s(token),
        )

    def scan_measurement_arrow(self, db: str, measurement: str,
                               limit: int = 1000, token: str = "",
                               snapshot: int | None = None,
                               where: str | None = None):
        """Native fast path for the TRIVIAL and TIME-RANGE A13 shapes —
        no order_by; `where`, when present, must be a pure time-range
        predicate (``time >=/>/<=/</BETWEEN`` literals joined by AND):
        the committed file list reads through pyarrow.dataset
        (multi-threaded C++ scan, no Spark job, no JVM→Python collect)
        into the same Arrow memory the wire encoders consume (~10× the
        DataFrame path at serving sizes). A time-range where prunes the
        file list by hive prefix driver-side, then scans with the exact
        row predicate (reference "Time Range (7d) LIMIT 10K" = 15 ms;
        pruner parity with internal/pruning/partition_pruner.go:448-676).
        Governance (rate admit + row cap) and RBAC apply exactly as on
        the Spark path; any unsupported shape raises
        :class:`NativeScanUnsupported` so the caller falls back to
        :meth:`query_measurement` with full SQL semantics."""
        tr = None
        if where is not None:
            # parse BEFORE admitting: an unsupported shape must not
            # consume a rate-limit slot, or the server's Spark fallback
            # double-charges the token (429s at half its configured QPS
            # on the fallback shape — r8 review finding)
            tr = parse_time_range(where)
            if tr is None:
                raise NativeScanUnsupported(
                    f"not a pure time-range predicate: {where!r}")
        self.governor.admit(token)
        view = self.catalog.register(db, measurement)
        where_sql = f" WHERE {where}" if where else ""
        self._check_rbac(token, f"SELECT * FROM {view}{where_sql}", db=db)
        cap = self.governor.row_cap(token)
        eff = int(limit) if cap is None else min(int(limit), cap)
        try:
            table = self.catalog.scan_arrow(db, measurement, limit=eff,
                                            snapshot=snapshot,
                                            time_range=tr)
        except ValueError as e:
            if tr is not None:
                # no time column / non-timestamp type / lossy unit —
                # the Spark path owns these shapes (and surfaces the
                # proper analysis error when the column is missing)
                raise NativeScanUnsupported(str(e)) from None
            # unknown/pruned snapshot version, multi-tier pin → client
            # error, not an engine fault (the breaker must not trip)
            raise SqlValidationError(str(e)) from None
        self.registry.record_instant(
            f"SELECT * FROM {view}{where_sql} LIMIT {eff}"
            + (f" VERSION AS OF {snapshot}" if snapshot is not None else ""),
            token=token, rows=table.num_rows)
        return table

    # SHOW TABLES is an alias for SHOW MEASUREMENTS; the db in FROM may be
    # quoted (reference query.go:50-58 showTablesPattern)
    _SHOW_TABLES_RE = re.compile(
        r"(?is)^\s*SHOW\s+(?:TABLES|MEASUREMENTS)"
        r"(?:\s+(?:FROM\s+)?[\"'`]?([\w.-]+)[\"'`]?)?\s*;?\s*$"
    )

    _PROJECT_LINE_RE = re.compile(r"^'Project \[(.*)\]$")
    _AGG_TOKEN_RE = re.compile(
        r"unresolvedalias\('(?:COUNT|count)\(1\)\)"
        r"|'(?:COUNT|count)\(1\) AS (\w+)#\d+"
        r"|unresolvedalias\('(MIN|min|MAX|max)\('([A-Za-z_]\w*)\)\)"
        r"|'(MIN|min|MAX|max)\('([A-Za-z_]\w*)\) AS (\w+)#\d+")
    # shared by the native COUNT and time-range detectors (the '+- '
    # tree prefix is optional: count matches raw lines, timerange
    # pre-strips) — one regex so a treeString format change can't break
    # one detector while the other keeps serving
    _COUNT_RELATION_RE = re.compile(
        r"^(?:\+- )?'UnresolvedRelation \[([^\]]+)\], \[\], false$")

    def _resolve_relation(self, rel_text: str,
                          db: str | None) -> tuple[str, str] | None:
        """A plan relation token list → (db, measurement), honoring view
        bindings and request db-scoping; None when unresolvable (or
        cross-db under a scoped request — the Spark path must surface
        the SAME _scope_to_db error, never a native answer)."""
        parts = [p.strip() for p in rel_text.split(",")]
        if len(parts) == 2:
            if db is not None:
                return None
            key = self.catalog.measurement_for_view(parts[1], db=parts[0])
            if key is None and parts[1] in self.catalog.measurements(parts[0]):
                key = (parts[0], parts[1])
            return key
        if len(parts) == 1:
            return self.catalog.measurement_for_view(parts[0], db=db)
        return None

    def _plan_lines(self, sql: str) -> list[str] | None:
        """Parsed-plan treeString lines (through the process-wide parse
        LRU — validation/RBAC/shape-detect share one parse per distinct
        SQL), or None on a parse failure."""
        from arc_spark.plans.validator import plan_tree_string

        try:
            return [ln for ln in plan_tree_string(self.spark, sql)
                    .splitlines() if ln.strip()]
        except Exception:
            return None

    def _native_count(self, sql: str, db: str | None,
                      lines: list[str] | None = None) -> list | None:
        """[(name, value, arrow_type), ...] when `sql` is EXACTLY a bare
        ``SELECT <COUNT(*) | MIN(col) | MAX(col), ...> FROM <one
        measurement>`` answerable from parquet footer metadata (the
        reference's ~1 ms metadata aggregates) — detected on the parsed
        plan (two nodes: Project of only those aggregates over a single
        relation; a WHERE adds a Filter node, GROUP BY parses as
        Aggregate, any other expression breaks token coverage), never by
        string matching. MIN/MAX are limited to timestamp/date/integer
        columns whose every row group carries exact stats (float stats
        can be conservative bounds like -0.0, string stats can truncate
        — those shapes run on Spark). None → run on Spark."""
        if lines is None:
            lines = self._plan_lines(sql)
        if lines is None or len(lines) != 2:
            return None
        m_proj = self._PROJECT_LINE_RE.match(lines[0])
        m_rel = self._COUNT_RELATION_RE.match(lines[1])
        if not m_proj or not m_rel:
            return None
        # tokenize the projection: every expression must be a supported
        # aggregate and the tokens must cover the WHOLE list (an
        # unsupported expression anywhere → Spark)
        content = m_proj.group(1)
        specs: list[tuple[str, str | None, str]] = []
        pos = 0
        while pos < len(content):
            if specs:
                if not content.startswith(", ", pos):
                    return None
                pos += 2
            m = self._AGG_TOKEN_RE.match(content, pos)
            if m is None or m.start() != pos:
                return None
            pos = m.end()
            if m.group(2) or m.group(4):  # min/max
                kind = (m.group(2) or m.group(4)).lower()
                col = m.group(3) or m.group(5)
                name = m.group(6) or f"{kind}({col})"
            else:
                kind, col = "count", None
                name = m.group(1) or "count(1)"
            specs.append((kind, col, name))
        if not specs or len({n for _, _, n in specs}) != len(specs):
            return None  # empty or duplicate output names
        key = self._resolve_relation(m_rel.group(1), db)
        if key is None:
            return None
        import pyarrow as pa

        out = []
        try:
            for kind, col, name in specs:
                if kind == "count":
                    out.append((name, self.catalog.count_rows(*key),
                                pa.int64(), "count"))
                    continue
                st = self.catalog.column_stats(*key, col)
                if st is None:
                    return None  # ineligible type / missing stats
                lo, hi, col_type = st
                val = lo if kind == "min" else hi
                out.append((name, val, col_type, kind))
        except Exception:
            return None  # footer unreadable etc. — let Spark surface it
        return out

    def _serve_native_count(self, cols: list, fmt: str):
        """The 1-row result in each wire shape, schema-identical to the
        Spark path (names, types, nullability)."""
        import datetime as _dt

        import pyarrow as pa

        def _naive(v):
            # Spark collects session-tz(UTC)-naive datetimes
            if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return v

        if fmt == "rows":
            from pyspark.sql import Row

            return [Row(**{name: _naive(v) for name, v, _t, _k in cols})]
        if fmt == "arrow":
            from arc_spark.serving import to_arrow_ipc

            fields, arrays = [], []
            for name, v, t, kind in cols:
                if pa.types.is_timestamp(t):
                    # Spark's toArrow carries the session tz
                    t = pa.timestamp("us", tz="UTC")
                fields.append(pa.field(name, t,
                                       nullable=kind != "count"))
                arrays.append(pa.array([v], t))
            return to_arrow_ipc(pa.Table.from_arrays(
                arrays, schema=pa.schema(fields)))
        # json/msgpack serializers consume DataFrames; a 1-row local
        # DataFrame (no scan) keeps their header/typing logic
        # authoritative
        from pyspark.sql.pandas.types import from_arrow_schema

        schema = from_arrow_schema(pa.schema(
            [pa.field(name, t if not pa.types.is_timestamp(t)
                      else pa.timestamp("us"), nullable=True)
             for name, _, t, _k in cols]))
        df = self.spark.createDataFrame(
            [tuple(_naive(v) for _, v, _t, _k in cols)], schema)
        if fmt == "json":
            from arc_spark.serving import stream_typed_json

            return list(stream_typed_json(df))
        if fmt == "msgpack":
            from arc_spark.serving import to_columnar_msgpack

            return to_columnar_msgpack(df)
        raise ValueError(f"unknown fmt {fmt!r}")

    _TR_GLOBAL_LIMIT_RE = re.compile(r"^'GlobalLimit (\d+)$")
    _TR_LOCAL_LIMIT_RE = re.compile(r"^'LocalLimit (\d+)$")
    _TR_FILTER_RE = re.compile(r"^'Filter (.*)$")

    def _native_timerange(self, sql: str, db: str | None,
                          lines: list[str] | None = None):
        """(key, TimeRange | None, limit) when `sql` is EXACTLY
        ``SELECT * FROM <one measurement> [WHERE <pure time range>]
        LIMIT <n>`` — the reference's "Time Range (7d) LIMIT 10K" and
        "SELECT LIMIT 10K/100K/1M" serving categories (15 / 18-105 ms
        in BASELINE) — detected on the PARSED plan like the native
        COUNT shape: GlobalLimit/LocalLimit/Project[*]/[Filter]/
        relation, the Filter condition (when present) matched against
        the paren-safe printed-condition grammar
        (_plan_cond_timerange). Any other projection, an ORDER BY, a
        missing LIMIT, or any non-time predicate → None → full Spark
        execution."""
        if lines is None:
            lines = self._plan_lines(sql)
        if lines is None or len(lines) not in (4, 5):
            return None
        lines = [ln.strip().removeprefix("+- ").strip() for ln in lines]
        m_gl = self._TR_GLOBAL_LIMIT_RE.match(lines[0])
        m_ll = self._TR_LOCAL_LIMIT_RE.match(lines[1])
        m_rel = self._COUNT_RELATION_RE.match(lines[-1])
        if (not m_gl or not m_ll or lines[2] != "'Project [*]"
                or not m_rel or m_gl.group(1) != m_ll.group(1)):
            return None
        tr = None
        if len(lines) == 5:
            m_f = self._TR_FILTER_RE.match(lines[3])
            if not m_f:
                return None
            tr = _plan_cond_timerange(m_f.group(1))
            if tr is None:
                return None
        key = self._resolve_relation(m_rel.group(1), db)
        if key is None:
            return None
        return key, tr, int(m_gl.group(1))

    def _serve_native_table(self, table, fmt: str):
        """A native-scan pyarrow Table in each wire shape, matching the
        Spark path's types (naive UTC datetimes for 'rows', session-tz
        Arrow fields for 'arrow', typed-JSON / columnar-msgpack via the
        Table-aware serving encoders)."""
        import pyarrow as pa

        if fmt == "arrow":
            from arc_spark.serving import to_arrow_ipc

            return to_arrow_ipc(table)
        if fmt == "msgpack":
            from arc_spark.serving import to_columnar_msgpack

            return to_columnar_msgpack(table)
        if fmt == "json":
            from arc_spark.serving import stream_typed_json

            # LIST, not the raw generator: every fmt="json" consumer
            # (server.py joins chunks; _serve_native_count) works on the
            # materialized chunk list — the generator reached json.dumps
            # in the HTTP route and killed the handler mid-connection
            # (caught by tests/test_serve_fuzz.py's first run)
            return list(stream_typed_json(table))
        if fmt == "rows":
            from pyspark.sql import Row

            from arc_spark.serving import table_columns_spark_local

            # Spark's collect() returns naive PROCESS-LOCAL datetimes
            # (fromInternal → fromtimestamp) — one shared chokepoint
            # applies the same policy here
            cols = table_columns_spark_local(table)
            RowT = Row(*table.column_names)
            return [RowT(*vals) for vals in zip(*cols)]
        raise ValueError(f"unknown fmt {fmt!r}")



    def execute(self, sql: str, token: str = "", fmt: str = "rows",
                db: str | None = None):
        """Run one query request end-to-end.

        fmt: 'rows' (list of Row), 'json' (typed-JSON chunks iterator),
        'arrow' (IPC bytes), 'msgpack' (columnar bytes).

        ``db`` scopes the request to one database (the reference's
        ``x-arc-database`` header, query.go:1484-1495): unqualified table
        names resolve to that database's measurements, SHOW MEASUREMENTS
        defaults to it, and cross-database ``db.table`` references are
        rejected — detected on the PARSED plan's table refs, not by string
        scanning (no literal/comment-masking regexes to get wrong).
        """
        self.governor.admit(token)
        if db is not None and not self._IDENT_RE.match(db):
            raise SqlValidationError(f"invalid database name {db!r}")
        # SHOW intercept — storage listing, no SQL engine (reference A12)
        stripped = sql.strip().rstrip(";").upper()
        if stripped == "SHOW DATABASES":
            return [{"database": d} for d in self.catalog.databases()]
        m = self._SHOW_TABLES_RE.match(sql)
        if m:
            target = m.group(1) or db or ""
            return [{"measurement": x} for x in self.catalog.measurements(target)]
        validate_read_only(self.spark, sql)
        self._check_rbac(token, sql, db=db)
        # native COUNT(*) (reference headline: 1.03 ms via metadata):
        # a bare unfiltered count over one measurement is answered from
        # parquet footers over the committed snapshot — no Spark job.
        # Validation + RBAC above already ran on this SQL; the shape
        # check is on the PARSED plan, so any filter/group/expression
        # falls through to the engine.
        plan_lines = self._plan_lines(sql)  # one parse, both detectors
        nc = self._native_count(sql, db, lines=plan_lines)
        if nc is not None:
            self.registry.record_instant(sql, token=token, rows=1)
            return self._serve_native_count(nc, fmt=fmt)
        # native time-range serving on the SQL surface (reference "Time
        # Range (7d) LIMIT 10K" = 15 ms): SELECT * + pure time filter +
        # LIMIT over one measurement reads through the snapshot-pruned
        # pyarrow scan — no Spark job. Unsupported measurement shapes
        # (no time column, lossy type) fall through to the engine.
        nt = self._native_timerange(sql, db, lines=plan_lines)
        if nt is not None:
            key, tr, n = nt
            cap = self.governor.row_cap(token)
            eff = n if cap is None else min(n, cap)
            try:
                table = self.catalog.scan_arrow(*key, limit=eff,
                                                time_range=tr)
            except ValueError:
                table = None  # → Spark path keeps full semantics
            if table is not None:
                self.registry.record_instant(sql, token=token,
                                             rows=table.num_rows)
                return self._serve_native_table(table, fmt=fmt)
        # SQL-surface partition pruning (reference A2's flagship behavior):
        # WHERE time ranges become year/month/day/hour partition predicates
        # on each measurement scan. The lock scopes the temporary pruned-view
        # registration so concurrent execute() calls can't observe it.
        with self._plan_lock:
            if db is not None:
                self._scope_to_db(db, sql)
            df = prune_sql(self.spark, sql, self.catalog)
        df = self.governor.cap(token, df)
        timeout_s = self.governor.timeout_s(token)
        if fmt == "rows":
            return self.registry.run(df, sql=sql, token=token, timeout_s=timeout_s)
        if fmt == "json":
            from arc_spark.serving import stream_typed_json

            return self.registry.run(
                df, sql=sql, token=token, timeout_s=timeout_s,
                collect=lambda d: list(stream_typed_json(d)),
            )
        if fmt == "arrow":
            from arc_spark.serving import to_arrow_ipc

            return self.registry.run(
                df, sql=sql, token=token, timeout_s=timeout_s, collect=to_arrow_ipc
            )
        if fmt == "msgpack":
            from arc_spark.serving import to_columnar_msgpack

            return self.registry.run(
                df, sql=sql, token=token, timeout_s=timeout_s,
                collect=to_columnar_msgpack,
            )
        raise ValueError(f"unknown fmt {fmt!r}")


class IngestService:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        wal_dir: str | None = None,
        max_buffer_rows: int = 50_000,
        max_buffer_age_s: float = 5.0,
        defer_decode: bool = False,
        direct_flush_max_rows: int = 2_000_000,
        decimal_config: dict[str, dict[str, tuple[int, int]]] | None = None,
        sort_keys_config: dict[str, list[str]] | None = None,
        max_decompressed_bytes: int | None = None,
        flush_workers: int = 0,
        distributed_decode_min_bytes: int = 8 * 1024 * 1024,
        max_pending_rows: int | None = None,
        wal_sync: str = "fsync",
    ):
        """defer_decode=True moves payload decoding from the ack path to the
        flush path — the reference's sub-ms ack design taken to its limit
        (arc also acks before Parquet work but decodes first). The ack
        still RETURNS AN EXACT COUNT: a header-only msgpack walk
        (msgpack_codec.count_rows, ~2µs) or a vectorized LP line count
        (line_protocol.count_lines, ~39M lines/s) — -1 only when the
        payload structure defeats the walk. Flush-size triggering counts
        payloads instead of rows.

        flush_workers>0 decouples flush from the ack path (the reference's
        flushWorker pool, arrow_writer.go:2370-2438): a threshold-crossing
        write SCHEDULES a flush on a worker thread and returns immediately;
        the worker also enforces the age trigger without traffic. Call
        :meth:`drain` (or :meth:`close`) to make everything durable.

        max_pending_rows bounds ingest memory: when buffered + in-flight
        rows reach it, write_* blocks until a flush completes — ack rate
        converges to flush rate instead of accumulating unbounded heap
        (the reference's bounded flush queue). Default 4× max_buffer_rows;
        pass 0/None semantics via a huge value if unbounded is wanted."""
        from arc_spark.sources.wal import Wal

        self.spark = spark
        self.root = root
        self.wal = Wal(wal_dir, sync=wal_sync) if wal_dir else None
        self.max_buffer_rows = max_buffer_rows
        self.max_buffer_age_s = max_buffer_age_s
        self.defer_decode = defer_decode
        self.direct_flush_max_rows = direct_flush_max_rows
        # per-measurement DECIMAL128 columns, {measurement: {col: (p, s)}} —
        # the reference's `measurement:col=precision,scale` config
        # (internal/config/decimal.go:9-60)
        self.decimal_config = decimal_config or {}
        # per-measurement sort-key override, {measurement: [col, ...]} —
        # the reference's `measurement:col1,col2` [ingest] sort_keys
        # (internal/config/sort_keys.go:9-60); `time` is appended by the
        # writer, and absent measurements sort by (tags..., time)
        self.sort_keys_config = sort_keys_config or {}
        if max_decompressed_bytes is None:
            from arc_spark.sources.ingest import MAX_DECOMPRESSED_BYTES

            max_decompressed_bytes = MAX_DECOMPRESSED_BYTES
        self.max_decompressed_bytes = max_decompressed_bytes
        # LP payloads at/above this size decode distributed (mapInPandas)
        # instead of in driver Python — the backfill path (reference keeps
        # bulk imports off the hot ingest workers too, internal/api/import*)
        self.distributed_decode_min_bytes = distributed_decode_min_bytes
        # bulk-LP payloads at/below this size take the LOCAL THREADED
        # fused path instead of a Spark job: the chunk parse is
        # pyarrow.compute (GIL-releasing) and the write is pyarrow
        # parquet, so a thread pool scales them across cores without
        # paying the Python-task job round-trip (~180-300 ms fixed on
        # this box — measured as 40%+ of the 1M-line lane). An HTTP
        # payload this size is single-node work by definition (the
        # reference's bulk import is likewise in-process native
        # workers); genuinely large backfills still fan out via Spark.
        self.local_fused_max_bytes = 128 * 1024 * 1024
        # deferred-msgpack backlogs at/above this size drain DISTRIBUTED
        # (staged file + mapInPandas decode+write, the fused bulk-LP
        # shape): the driver's one-process decode ceiling is ~3.5M rec/s,
        # the distributed drain measured 13M rec/s warm on a 12M-row
        # backlog. None disables. Same executor-resolvable-root rule as
        # the LP bulk path.
        self.distributed_flush_min_bytes = 64 << 20
        # optional hook fired with the set of (db, measurement) keys after
        # files land — the wire layer points it at catalog.invalidate so a
        # registered view NEVER serves a stale file listing after a flush
        # (Spark's FileStatusCache pins the listing a view was created
        # with; the reference invalidates its query cache after writes the
        # same way, internal/api/query.go:1049-1053)
        self.on_measurements_written = None
        self._buffers: dict[tuple[str, str], list[dict]] = {}
        # (db, kind, payload, n_acked) — n_acked = rows counted at ack via
        # the header/byte walk, or -1 when the count was not determinable
        self._raw: list[tuple[str, str, bytes, int]] = []
        self._buffer_rows = 0
        self._flushing_rows = 0  # snapshot rows still being written
        # deferred-decode payloads can't be counted in ROWS before a flush
        # decodes them, so the raw path carries its own BYTE-based bound —
        # without it sustained deferred ingest acks into unbounded heap
        # (found when a 3 s defer lane "acked" 30× the flush rate)
        self._raw_bytes = 0
        self._flushing_raw_bytes = 0
        self.max_pending_raw_bytes = 256 << 20
        self.max_pending_rows = (
            max_pending_rows if max_pending_rows is not None
            else 4 * max_buffer_rows
        )
        self._oldest: float | None = None
        self._recovering = False  # suppresses WAL truncation mid-replay
        # parse_dropped: lines the deferred LP ack counted optimistically
        # that then failed to parse at flush — the ack itself stays
        # optimistic (count_lines is a header walk, not a parse), but the
        # drop is observable here rather than silent
        self.stats = {"acked": 0, "flushed": 0, "flushes": 0,
                      "parse_dropped": 0}
        # _lock: buffers + WAL-append atomicity (a flush snapshot must never
        # cut the WAL between another writer's append and its buffer insert);
        # _flush_serial: at most one flush body runs at a time, so a later
        # flush's WAL truncation cannot outrun an earlier flush's Parquet
        self._lock = threading.Lock()
        # ack-path decode serializer (see write_msgpack): GIL-bound
        # decodes convoy under writer concurrency; one-at-a-time IS the
        # process decode ceiling, and waiting writers park on the lock
        self._decode_serial = threading.Lock()
        # signaled when a flush finishes (or rolls back): backpressured
        # writers re-check the pending-row level
        self._space = threading.Condition(self._lock)
        self._flush_serial = threading.Lock()
        self._flush_queue = None
        self._flush_pending = threading.Event()
        self._flush_error: BaseException | None = None
        self._stop = False
        self._workers: list[threading.Thread] = []
        if flush_workers > 0:
            import queue

            self._flush_queue = queue.Queue()
            for i in range(flush_workers):
                t = threading.Thread(
                    target=self._flush_worker, name=f"arc-flush-{i}", daemon=True
                )
                t.start()
                self._workers.append(t)

    def _dec_manifest(self, measurement: str) -> dict[str, list[int]] | None:
        """decimal_config entry for a measurement in manifest shape
        ({col: [precision, scale]}), or None — every manifest write site
        must use this so no publish path drops decimal metadata."""
        decimals = self.decimal_config.get(measurement)
        return ({c: list(ps) for c, ps in decimals.items()}
                if decimals else None)

    def _manifest_sort_keys(self, measurement: str,
                            tag_list: list[str]) -> list[str]:
        keys = list(self.sort_keys_config.get(measurement) or tag_list)
        if "time" not in keys:
            keys.append("time")
        return keys

    # -- write path --------------------------------------------------------
    def write_msgpack(self, db: str, payload: bytes, _wal: bool = True) -> int:
        """Decode + ack one columnar-msgpack payload. The ACK happens after
        the WAL fsync, BEFORE any Parquet work (reference arrow_writer.go
        WriteColumnarRecord → WAL AppendRawWithMeta).

        gzip/zstd payloads are auto-detected by magic bytes and decompressed
        (bomb-guarded) BEFORE the WAL append, so WAL replay's format sniff
        always sees msgpack bytes (reference internal/api/msgpack.go)."""
        from arc_spark.sources.ingest import maybe_decompress

        payload = maybe_decompress(payload, self.max_decompressed_bytes)
        if self.defer_decode:
            # EXACT count at ack without decoding: a header-only walk
            # (array/column-length headers, ~2µs regardless of payload
            # size) — the deferred profile acks with real counts, closing
            # the -1 semantic gap vs the synchronous path
            from arc_spark.sources.msgpack_codec import count_rows

            n = count_rows(payload)
            return self._admit(db, payload if _wal else None,
                               raw=("msgpack", payload,
                                    -1 if n is None else n))
        from arc_spark.sources.ingest import decode_msgpack_payload

        # decode under the ack-decode MUTEX: the decode is GIL-bound
        # Python/numpy, so one decoding thread already achieves the
        # process's maximum decode rate — N concurrent writers decoding
        # "in parallel" just convoy on the GIL (5 ms switch slices,
        # cache thrash) and HALVE aggregate throughput. Serializing the
        # decode makes waiting writers block on a lock (GIL released)
        # instead: 8-writer sustained sync ack measured 6.8 → 12.9M
        # rec/s, e2e 5.8 → 8.9M (r8 verdict #6 lever, landed as a lock
        # rather than a handoff pool — same serialization, no ~40 µs
        # per-batch executor handoff, zero cost when uncontended)
        with self._decode_serial:
            batch = decode_msgpack_payload(payload)
        return self._admit(db, payload if _wal else None, batch=batch)

    def write_line_protocol(
        self, db: str, payload: bytes, precision: str = "ns", _wal: bool = True
    ) -> int:
        from arc_spark.sources.ingest import maybe_decompress

        payload = maybe_decompress(payload, self.max_decompressed_bytes)
        if (
            not self.defer_decode
            and len(payload) >= self.distributed_decode_min_bytes
        ):
            # backfill-sized payload: decode + write distributed (mapInPandas
            # over cluster partitions), synchronous like the reference's bulk
            # import path — no driver-core decode ceiling, no WAL (durability
            # = the write completes before the ack)
            return self._write_line_protocol_distributed(db, payload, precision)
        if self.defer_decode:
            from arc_spark.sources.line_protocol import count_lines

            # exact line count at ~39M lines/s (vectorized byte pass) —
            # parse still deferred to the flush path
            return self._admit(db, payload if _wal else None,
                               raw=(f"lp:{precision}", payload,
                                    count_lines(payload)))
        from arc_spark.sources.line_protocol import parse_chunk_columnar

        # vectorized columnar parse, split PER MEASUREMENT — the former
        # parse_batch + rows_to_columnar pair was 5.6× slower (pure-Python
        # row loop behind the ack mutex) AND silently filed every row of a
        # multi-measurement payload under the FIRST line's measurement
        # (rows_to_columnar keys the whole batch on rows[0]; r11 repro:
        # cpu+mem payload → everything under bench/cpu). The kernels
        # release the GIL, so no ack mutex here: concurrent writers'
        # parses overlap instead of convoying. Invalid UTF-8 is sanitized
        # inside the parser (U+FFFD), not fatal — one hostile batch must
        # not DoS the ingest path (reference internal/ingest/utf8*.go).
        from arc_spark.sources.line_protocol import (LineProtocolError,
                                                     count_lines)

        per_meas = parse_chunk_columnar(payload, precision)
        batches = []
        parsed = 0
        for meas, b in per_meas.items():
            if not b["columns"]:
                continue
            b["measurement"] = meas
            parsed += len(b["columns"][next(iter(b["columns"]))])
            batches.append(b)
        # the sync ack path keeps parse_batch's ALL-OR-NOTHING contract
        # (deferred/flush callers skip+count instead): parse_chunk_columnar
        # drops malformed lines silently, so a parsed-vs-expected shortfall
        # here means the payload must be rejected whole — 400, not a
        # partial ingest the client can't see
        expected = count_lines(payload)
        if parsed < expected:
            raise LineProtocolError(
                f"{expected - parsed} of {expected} lines failed to parse")
        if not batches:
            return 0
        return self._admit(db, payload if _wal else None, batches=batches)

    def _write_line_protocol_distributed(
        self, db: str, payload: bytes, precision: str
    ) -> int:
        """Bulk LP ingest, fused parse+write: byte-chunk the payload at
        newline boundaries, then ONE shuffle-free Spark job in which each
        task parses its chunks AND writes the resulting hour-partitioned
        Parquet directly from the executor (in-process Arrow writer — the
        reference's per-worker independent files,
        internal/ingest/arrow_writer.go). No persist barrier, no align
        pass, no write shuffle: wall-clock is one map stage.

        Tradeoffs vs the former two-pass plan (still available as
        ``line_protocol.payload_to_dataframe``): concurrent tasks produce
        one file per (chunk, hour) instead of one per hour — exactly the
        small-file shape hourly compaction (A20) exists to merge — and a
        field whose lexical TYPE differs across chunks (``1i`` vs ``1.5``)
        yields per-file schema conflicts instead of a widened global
        schema; LP typing is per-line deterministic, so any consistently
        typed source is unaffected (the reference likewise rejects
        cross-batch type drift, import_inprocess.go).

        Returns the payload's line count (every line either parses or
        fails the job).

        Transport: the payload is STAGED as one file under the storage
        root and tasks receive only (offset, length) byte ranges — a
        1-row-per-task ``spark.range`` frame, single stage, no shuffle.
        Shipping the bytes through ``createDataFrame`` + ``repartition``
        cost ~0.5 s driver-side Arrow conversion plus a shuffle of the
        whole payload before any task ran; the staged file costs one
        sequential write and the ranges are newline-snapped without
        scanning the payload. Executors resolve the staged path with the
        same auto-resolvable-backend rule the fused writer already
        requires (local/file/s3).

        Task sizing: ~2 MB of payload per task. Python tasks cost ~25 ms
        each in scheduling/worker-handshake overhead regardless of work,
        so tiny chunks make a 250k-line backfill overhead-bound (measured
        0.9 s at 64 chunks vs ~0.35 s at 8); a 2 MB slice parses+writes
        in ~100 ms, keeping overhead under a third of task time while
        large backfills still fan out to 2×cores."""
        import json as _json
        import uuid as _uuid

        import pandas as pd

        from arc_spark.storage import backend_for

        if len(payload) <= self.local_fused_max_bytes:
            return self._write_lp_fused_local(db, payload, precision)

        bk = backend_for(self.root)
        par = self.spark.sparkContext.defaultParallelism
        # ~3 MB per task, capped at cores/2: measured on local[32] with a
        # 49 MB payload — 16 tasks 0.67 s, 24 tasks 1.52 s, 32 tasks 2.56 s
        # (per-Python-task overhead is ~25-30 ms SERIALIZED, and full-width
        # fan-out contends with the parse itself); at 15 MB the same rule
        # lands on 6 tasks ≈ 0.4 s
        n_tasks = max(1, min(max(4, par // 2), len(payload) // (3 << 20) + 1))
        ranges = _lp_byte_ranges(payload, n_tasks)
        staging = bk.join(self.root, ".lp-staging")
        bk.mkdirs(staging)
        staged = bk.join(staging, f"{_uuid.uuid4().hex}.lp")
        bk.write_bytes(staged, payload)
        root, precision_ = self.root, precision
        sort_keys_cfg = self.sort_keys_config

        def parse_write(batches):
            # each concurrent worker gets ONE native thread: N workers ×
            # a default per-process pool of N threads oversubscribes the
            # box N-fold (measured: parse p50 503 ms vs 71 ms at 25 tasks)
            from arc_spark.functions.threads import pin_math_threads

            pin_math_threads()
            from arc_spark.sources.ingest import columnar_to_arrow
            from arc_spark.sources.line_protocol import parse_chunk_columnar
            from arc_spark.sources.writer import write_measurement_arrow
            from arc_spark.storage import backend_for as _bf

            ebk = _bf(staged)
            for bpdf in batches:
                for i in bpdf["id"]:
                    off, ln = ranges[int(i)]
                    chunk = ebk.read_range(staged, off, ln)
                    per_meas = parse_chunk_columnar(chunk, precision_)
                    out = {"measurement": [], "n": [], "tags": [],
                           "files": []}
                    for meas, batch in per_meas.items():
                        table = columnar_to_arrow(batch)
                        wl: list[str] = []
                        write_measurement_arrow(
                            table, root, db, meas,
                            tag_columns=batch["tag_columns"],
                            sort_keys=sort_keys_cfg.get(meas),
                            manifest=False, written_out=wl,
                        )
                        out["measurement"].append(meas)
                        out["n"].append(table.num_rows)
                        out["tags"].append(_json.dumps(batch["tag_columns"]))
                        out["files"].append(_json.dumps(wl))
                    yield pd.DataFrame(out)

        try:
            results = (
                self.spark.range(0, len(ranges), 1, len(ranges))
                .mapInPandas(parse_write,
                             "measurement string, n long, tags string, "
                             "files string")
                .collect()
            )
        finally:
            bk.remove_file_if_exists(staged)

        return self._finish_lp_bulk(db, [
            (r["measurement"], r["n"], _json.loads(r["tags"]),
             _json.loads(r["files"])) for r in results])

    def _write_lp_fused_local(self, db: str, payload: bytes,
                              precision: str) -> int:
        """Bulk LP ingest, fused parse+write, LOCAL THREADS — the
        single-node twin of :meth:`_write_line_protocol_distributed`.

        The per-chunk work is pyarrow end to end (vectorized parse in
        pyarrow.compute, zstd parquet write via pads.write_dataset), both
        of which release the GIL — so a ThreadPoolExecutor scales them
        across cores WITHOUT a Spark job, skipping the Python-task
        round-trip that is pure overhead at HTTP-payload sizes (measured
        on this harness: a NOOP 16-task Python job costs ~260-330 ms
        wall; the entire threaded parse+write of 1M lines is less). The
        reference's bulk import is the same shape — in-process native
        workers (internal/api/import_inprocess.go). Payloads above
        ``local_fused_max_bytes`` (true backfills) still take the
        distributed path; identical file layout, manifest, and
        single-commit-per-measurement visibility either way."""
        from concurrent.futures import ThreadPoolExecutor

        from arc_spark.sources.ingest import columnar_to_arrow
        from arc_spark.sources.line_protocol import parse_chunk_columnar

        # measured sweep on local[32], 49 MB / 1M lines: 8 workers 0.28 s,
        # 16 0.37 s, 25 0.51 s, 32 0.60 s — beyond ~8 threads the
        # GIL-held per-chunk glue between the GIL-releasing pyarrow
        # segments serializes and the handoff churn dominates.
        # r10 re-sweep (after the parse head's byte gates moved into
        # Arrow kernels): each chunk now carries ~26 ms of GIL-held
        # kernel-dispatch glue REGARDLESS of size, so 2-per-worker
        # oversubscription lost to 1-per-worker — parse-only 16ch/8w
        # 0.336 s vs 8ch/8w 0.184 s; whole lane 0.406 → 0.323 s (1M),
        # 0.125 → 0.120 s (250k). Chunks now cap at the worker count.
        # workers first, then cap chunks AT the worker count: a literal
        # 8-chunk cap on a <8-core box re-creates the 2-per-worker
        # oversubscription the sweep showed regresses (r10 advice).
        max_workers = min(8, os.cpu_count() or 8)
        n_chunks = max(1, min(max_workers, len(payload) // (2 << 20) + 1))
        n_workers = min(max_workers, n_chunks)
        # NOT raised: Arrow's 8-thread IO pool does serialize 8 concurrent
        # chunk writes in isolation (110 ms vs 45 at io=cpu, JVM-free
        # microbench), but in the fused path the write half already hides
        # inside the other threads' parse window (parse wall ~175 ms >
        # saturated-write wall ~110 ms) — a 12-pass alternating in-session
        # A/B measured io=32 as a wash-to-slightly-worse (r11), so the
        # process-global knob stays untouched.
        ranges = _lp_byte_ranges(payload, n_chunks)
        root, sort_keys_cfg = self.root, self.sort_keys_config

        def work(rng):
            from arc_spark.sources.writer import write_measurement_arrow

            off, ln = rng
            per_meas = parse_chunk_columnar(payload[off:off + ln],
                                            precision)
            out = []
            for meas, batch in per_meas.items():
                table = columnar_to_arrow(batch)
                wl: list[str] = []
                write_measurement_arrow(
                    table, root, db, meas,
                    tag_columns=batch["tag_columns"],
                    sort_keys=sort_keys_cfg.get(meas),
                    manifest=False, written_out=wl)
                out.append((meas, table.num_rows,
                            batch["tag_columns"], wl))
            return out

        if len(ranges) == 1:
            results = work(ranges[0])
        else:
            with ThreadPoolExecutor(max_workers=n_workers) as ex:
                results = [r for rs in ex.map(work, ranges) for r in rs]
        return self._finish_lp_bulk(db, results)

    def _finish_lp_bulk(self, db: str, results) -> int:
        """Shared bulk-LP epilogue: per-measurement manifest + ONE
        snapshot commit (the whole write becomes visible atomically —
        files are invisible to snapshot readers until now), stats, and
        flush notification. ``results``: (measurement, n_rows,
        tag_columns, written_files) per parsed chunk-measurement."""
        from arc_spark import snapshots
        from arc_spark.sources.writer import measurement_path, write_manifest

        root = self.root
        n_lines = 0
        meas_tags: dict[str, set] = {}
        meas_files: dict[str, list] = {}
        for meas, n, tags, files in results:
            n_lines += n
            meas_tags.setdefault(meas, set()).update(tags)
            meas_files.setdefault(meas, []).extend(files)
        for meas, tags in meas_tags.items():
            tag_list = sorted(tags)
            write_manifest(root, db, meas, tag_list,
                           self._manifest_sort_keys(meas, tag_list),
                           decimals=self._dec_manifest(meas))
            snapshots.commit(measurement_path(root, db, meas),
                             add=meas_files.get(meas, []))
        with self._lock:
            self.stats["acked"] += n_lines
            self.stats["flushed"] += n_lines
            self.stats["flushes"] += 1
        self._notify_written({(db, meas) for meas in meas_tags})
        return n_lines

    def _drain_raw_distributed(
        self, db: str, entries: list[tuple[str, bytes]]
    ) -> int:
        """Distributed drain of a deferred-payload backlog ((kind, bytes)
        pairs — msgpack or line protocol): payloads are STAGED as one
        concatenated file (payload boundaries are natural split points —
        no byte-splitting problem), and executor tasks decode their
        payload group and write hour-partitioned Parquet directly (the
        fused shape of the bulk-LP path). Breaks the driver's one-process
        decode ceiling: measured 13M rec/s warm on a 12M-row msgpack
        backlog vs ~3.5M for the in-process flush workers.

        r15 (guide §2.6 overlap): a backlog big enough for 2+ jobs drains
        as TWO CONCURRENT half-jobs instead of one. Each job stays
        cores/2-capped (the r11 finding that full-width fan-out within
        ONE job is ~8% slower stands — it doubles per-task fixed cost),
        but two jobs in flight back-fill each other's task tails and
        fill the cores one capped job leaves idle: a fixed ~262 MB /
        12M-row backlog measured 15.0 → 19.0M rows/s p50 (+27%, 5/5
        aligned passes; 3- and 4-way splits oversubscribe the Python
        workers and LOSE — 0.71/0.89/0.94 s p50 for 2/3/4). Manifest and
        snapshot stay ONE commit over the merged results, so atomic
        visibility and the tag-union semantics are byte-identical to the
        single-job drain. The split gate is byte-based
        (distributed_flush_min_bytes per sub-job), so small backlogs pay
        nothing.

        Same constraints as the fused LP writer: the root must be
        executor-resolvable (local/file/s3), per-task schema merging, and
        at-least-once on failure (the WAL retains the payloads; a retry
        after a partial write duplicates rows, which compaction's
        last-writer-wins dedup collapses for tagged measurements —
        failure of EITHER sub-job fails the whole drain, and the caller
        requeues the full snapshot exactly as before).

        Returns rows written; the caller owns stats/WAL accounting."""
        import json as _json

        from arc_spark import snapshots
        from arc_spark.sources.writer import measurement_path, write_manifest

        total_bytes = sum(len(p) for _, p in entries)
        min_per_job = self.distributed_flush_min_bytes or (64 << 20)
        n_jobs = max(1, min(int(os.environ.get("ARC_DEFER_DRAIN_JOBS",
                                               "2")),
                            total_bytes // max(1, min_per_job),
                            len(entries)))
        if n_jobs <= 1:
            results = self._drain_stage_and_run(db, entries)
        else:
            # contiguous byte-balanced halves (payload order preserved
            # within each job; the two jobs overlap on the scheduler)
            parts: list[list[tuple[str, bytes]]] = []
            target = total_bytes / n_jobs
            cur: list[tuple[str, bytes]] = []
            acc = 0
            for e in entries:
                cur.append(e)
                acc += len(e[1])
                if acc >= target * (len(parts) + 1) and len(parts) < n_jobs - 1:
                    parts.append(cur)
                    cur = []
            if cur:
                parts.append(cur)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(parts)) as ex:
                results = [r for part in ex.map(
                    lambda p: self._drain_stage_and_run(db, p), parts)
                    for r in part]
        n_rows = 0
        meas_tags: dict[str, set] = {}
        meas_files: dict[str, list] = {}
        for r in results:
            n_rows += r["n"]
            meas_tags.setdefault(r["measurement"], set()).update(
                _json.loads(r["tags"]))
            meas_files.setdefault(r["measurement"], []).extend(
                _json.loads(r["files"]))
        root = self.root
        for meas, tags in meas_tags.items():
            tag_list = sorted(tags)
            # carry decimal metadata: the drained tasks applied
            # decimal_config to the data, so the manifest must say so —
            # otherwise this atomic replace silently drops decimals the
            # in-process flush recorded
            write_manifest(root, db, meas, tag_list,
                           self._manifest_sort_keys(meas, tag_list),
                           decimals=self._dec_manifest(meas))
            # atomic visibility: all of this drain's files for the
            # measurement publish in one snapshot swap; a crash mid-drain
            # left them invisible and the WAL retains the payloads
            snapshots.commit(measurement_path(root, db, meas),
                             add=meas_files.get(meas, []))
        self._notify_written({(db, m) for m in meas_tags})
        return n_rows

    def _drain_stage_and_run(
        self, db: str, entries: list[tuple[str, bytes]]
    ) -> list:
        """Stage one concatenated payload file and run ONE decode+write
        job over it; returns the job's result rows (measurement/n/tags/
        files per task-measurement). Commit/manifest/stats belong to the
        caller (:meth:`_drain_raw_distributed`), which may run several of
        these concurrently."""
        import json as _json
        import uuid as _uuid

        import pandas as pd

        from arc_spark.storage import backend_for

        bk = backend_for(self.root)
        staging = bk.join(self.root, ".raw-staging")
        bk.mkdirs(staging)
        staged = bk.join(staging, f"{_uuid.uuid4().hex}.bin")
        offs: list[tuple[int, int, str]] = []
        pos = 0
        # stream payloads straight to the staging file: concatenating a
        # multi-hundred-MB bytes object first costs two full copies
        with bk.fs.open_output_stream(bk.fs_path(staged)) as f:
            for kind, p in entries:
                offs.append((pos, len(p), kind))
                f.write(p)
                pos += len(p)
        par = self.spark.sparkContext.defaultParallelism
        # cores/2 cap: same per-Python-task overhead finding as the bulk
        # LP path (full-width fan-out contends with the decode itself;
        # also re-measured on gzip backlogs where decompress doubles the
        # per-payload C work — full width was still ~8% SLOWER, so the
        # cap stays unconditional)
        n_tasks = max(1, min(max(4, par // 2), len(offs)))
        # CONTIGUOUS groups, not round-robin: payloads were written in
        # order, so each group is one contiguous byte range — the task
        # issues a single range read and slices payloads in memory
        # (1 GET per task on object stores instead of hundreds)
        per = (len(offs) + n_tasks - 1) // n_tasks
        groups = [offs[i * per:(i + 1) * per] for i in range(n_tasks)]
        groups = [g for g in groups if g]
        n_tasks = len(groups)
        root, decimal_config = self.root, self.decimal_config
        sort_keys_cfg = self.sort_keys_config

        def decode_write(batches):
            from arc_spark.functions.threads import pin_math_threads

            pin_math_threads()
            from arc_spark.catalog import validate_identifier
            from arc_spark.sources.ingest import (
                columnar_to_arrow,
                decode_msgpack_payload,
                merge_batches,
            )

            def _meas_ok(meas: str) -> bool:
                # post-ack on an executor: drop path-shaped measurement
                # names rather than failing (and endlessly retrying) the
                # whole drain job
                try:
                    validate_identifier(meas, "measurement")
                    return True
                except ValueError:
                    return False
            from arc_spark.sources.line_protocol import parse_chunk_columnar
            from arc_spark.sources.writer import write_measurement_arrow
            from arc_spark.storage import backend_for as _bf

            ebk = _bf(staged)
            for bpdf in batches:
                for i in bpdf["id"]:
                    grp = groups[int(i)]
                    base = grp[0][0]
                    span = grp[-1][0] + grp[-1][1] - base
                    blob = ebk.read_range(staged, base, span)
                    by_meas: dict[str, list] = {}
                    for off, ln, kind in grp:
                        payload = blob[off - base:off - base + ln]
                        if kind.startswith("lp"):
                            precision = (kind.split(":")[1]
                                         if ":" in kind else "ns")
                            for meas, b in parse_chunk_columnar(
                                    payload, precision).items():
                                if b["columns"] and _meas_ok(meas):
                                    by_meas.setdefault(meas, []).append(b)
                            continue
                        b = decode_msgpack_payload(payload)
                        m_name = b.get("measurement") or "default"
                        if b["columns"] and _meas_ok(m_name):
                            by_meas.setdefault(m_name, []).append(b)
                    out = {"measurement": [], "n": [], "tags": [],
                           "files": []}
                    for meas, bl in by_meas.items():
                        decs = decimal_config.get(meas)
                        # merge_batches, not a plain concat: an all-null
                        # column in one payload (string by inference)
                        # must merge with a sibling payload's real type
                        # exactly as on the in-process flush path
                        tbl = merge_batches(
                            [columnar_to_arrow(x, decimal_columns=decs)
                             for x in bl])
                        tags = sorted({c for x in bl
                                       for c in (x.get("tag_columns") or [])})
                        wl: list[str] = []
                        write_measurement_arrow(
                            tbl, root, db, meas, tag_columns=tags,
                            sort_keys=sort_keys_cfg.get(meas),
                            manifest=False, written_out=wl,
                        )
                        out["measurement"].append(meas)
                        out["n"].append(tbl.num_rows)
                        out["tags"].append(_json.dumps(tags))
                        out["files"].append(_json.dumps(wl))
                    yield pd.DataFrame(out)

        try:
            return (
                self.spark.range(0, n_tasks, 1, n_tasks)
                .mapInPandas(decode_write,
                             "measurement string, n long, tags string, "
                             "files string")
                .collect()
            )
        finally:
            bk.remove_file_if_exists(staged)

    def _admit(
        self,
        db: str,
        wal_payload: bytes | None,
        batch: dict | None = None,
        raw: tuple[str, bytes, int] | None = None,
        batches: list[dict] | None = None,
    ) -> int:
        """WAL append + buffer insert, atomically: a concurrent flush
        snapshot either sees both (entry flushed, WAL cut past it) or
        neither (entry keeps its WAL backing) — never a WAL entry whose
        rows are outside every snapshot.

        Backpressure first: while buffered + in-flight rows are at
        max_pending_rows, block (triggering flushes) until a flush drains
        space — ingest cannot outrun the writer into unbounded heap."""
        # ack-time name check, BEFORE any WAL append: a wire 'm' of
        # "../../x" must 400 here rather than enter the log (a replayed
        # poison entry would wedge recovery) — writes re-validate at the
        # measurement_path chokepoint regardless
        from arc_spark.catalog import validate_identifier

        validate_identifier(db, "database")
        if batch is not None:
            validate_identifier(
                batch.get("measurement") or "default", "measurement")
        for b in batches or ():
            validate_identifier(
                b.get("measurement") or "default", "measurement")
        while True:
            with self._lock:
                over = (
                    (self._buffer_rows + self._flushing_rows
                     >= self.max_pending_rows
                     or self._raw_bytes + self._flushing_raw_bytes
                     >= self.max_pending_raw_bytes)
                    and self._flush_error is None
                )
            if not over:
                break
            self._trigger_flush()  # sync mode flushes inline; workers: schedule
            with self._space:
                if ((self._buffer_rows + self._flushing_rows
                     >= self.max_pending_rows
                     or self._raw_bytes + self._flushing_raw_bytes
                     >= self.max_pending_raw_bytes)
                        and self._flush_error is None):
                    self._space.wait(timeout=0.1)
        wal_tok = None
        with self._lock:
            if wal_payload is not None and self.wal is not None:
                # buffered append under the lock keeps the WAL/buffer
                # atomicity contract; the fsync happens AFTER the lock via
                # group commit, so N concurrent acks share ~1 fsync
                # instead of serializing one each (see Wal.sync_upto)
                wal_tok = self.wal.append_nosync(wal_payload)
            if raw is not None:
                self._raw.append((db, *raw))
                self._raw_bytes += len(raw[1])
                n = raw[2]
                if n >= 0:
                    # counted at ack (header/byte walk, no decode); the
                    # flush-time decode reconciles any delta
                    self.stats["acked"] += n
                trip_size = len(self._raw) >= max(self.max_buffer_rows // 1000, 1)
            else:
                # one lock pass + one WAL append for ALL of a payload's
                # per-measurement batches (multi-measurement LP): the
                # WAL entry stays payload-granular, so replay semantics
                # are unchanged
                todo = batches if batches is not None else [batch]
                n = 0
                for b in todo:
                    if not b["columns"]:
                        continue
                    meas = b.get("measurement") or "default"
                    k = len(b["columns"][next(iter(b["columns"]))])
                    self._buffers.setdefault((db, meas), []).append(b)
                    n += k
                if n == 0:
                    return 0
                self._buffer_rows += n
                self.stats["acked"] += n
                trip_size = self._buffer_rows >= self.max_buffer_rows
            if self._oldest is None:
                self._oldest = time.monotonic()
            trip = trip_size or (
                time.monotonic() - self._oldest >= self.max_buffer_age_s
            )
        if wal_tok is not None and self.wal.sync in ("fsync", "fdatasync"):
            # durable-before-ack, grouped with concurrent writers
            self.wal.sync_upto(wal_tok)
        if trip:
            self._trigger_flush()
        return n

    def _trigger_flush(self) -> None:
        if self._flush_queue is None:
            self.flush()
        elif not self._flush_pending.is_set():
            self._flush_pending.set()
            self._flush_queue.put("flush")

    def _flush_worker(self) -> None:
        import queue as _queue

        poll = min(self.max_buffer_age_s, 1.0)
        while not self._stop:
            try:
                item = self._flush_queue.get(timeout=poll)
            except _queue.Empty:
                # age trigger without traffic (reference flush ticker)
                with self._lock:
                    aged = (
                        self._oldest is not None
                        and time.monotonic() - self._oldest >= self.max_buffer_age_s
                    )
                if aged:
                    try:
                        self.flush()
                    except BaseException as e:  # surfaced by drain()
                        self._flush_error = e
                continue
            self._flush_pending.clear()
            try:
                if item is not None:
                    self.flush()
            except BaseException as e:
                self._flush_error = e
            finally:
                self._flush_queue.task_done()
            if item is None:
                break

    def drain(self) -> int:
        """Wait for scheduled flushes, then flush whatever remains.
        Raises the first worker-side flush error, if any."""
        if self._flush_queue is not None:
            self._flush_queue.join()
        total = self.flush()
        if self._flush_error is not None:
            err, self._flush_error = self._flush_error, None
            raise err
        return total

    def close(self) -> None:
        """Drain and stop the worker threads."""
        self.drain()
        self._stop = True
        if self._flush_queue is not None:
            for _ in self._workers:
                self._flush_queue.put(None)
            for t in self._workers:
                t.join(timeout=10)

    def _decode_raw_batches(
        self, raw: list[tuple[str, str, bytes, int]]
    ) -> tuple[dict[tuple[str, str], list[dict]], int, int]:
        """Decode deferred payloads (flush time) → {(db, meas): [batches]}.

        LP payloads split PER MEASUREMENT via ``parse_chunk_columnar`` —
        the same grouping the distributed drain applies — so where a
        deferred stream lands never depends on whether the backlog
        crossed ``distributed_flush_min_bytes``.

        Returns (batches, ACKED DELTA, DROPPED): the delta is actual
        decoded rows minus what the ack path already counted per entry
        (header-walk counts are exact in practice; the delta self-corrects
        any divergence); dropped is the non-negative per-payload sum of
        ack-counted lines that failed to parse — the client-visible
        deferred ack is OPTIMISTIC on malformed input (documented in the
        README), and this counter makes the drop observable."""
        from arc_spark.catalog import validate_identifier
        from arc_spark.sources.ingest import decode_msgpack_payload
        from arc_spark.sources.line_protocol import parse_chunk_columnar

        def _name_ok(meas: str) -> bool:
            # post-ack: an invalid (path-shaped) measurement name can't be
            # 400'd anymore — drop the batch instead of poisoning the
            # flush retry loop; the drop shows up in parse_dropped
            try:
                validate_identifier(meas, "measurement")
                return True
            except ValueError:
                return False

        # LP payloads parse CONCURRENTLY across entries: the kernels in
        # parse_chunk_columnar release the GIL, one ~500 KB payload costs
        # ~10 ms of Arrow compute, and a deferred backlog below the
        # distributed threshold arrives as dozens of independent payloads
        # — sequential decode made the in-process LP drain the sustained
        # lane's bound (~1 M lines/s/worker; r11 measured the 8-way map
        # at ~4× on the same backlog). Per-entry results stay separate so
        # the ack-delta/dropped accounting below is untouched.
        lp_parsed: dict[int, dict] = {}
        lp_idx = [i for i, e in enumerate(raw) if e[1].startswith("lp")]
        if len(lp_idx) > 1:
            from concurrent.futures import ThreadPoolExecutor

            def _parse_lp(i: int) -> dict:
                _db, kind, payload, _n = raw[i]
                precision = kind.split(":")[1] if ":" in kind else "ns"
                return parse_chunk_columnar(payload, precision)

            workers = min(8, os.cpu_count() or 8, len(lp_idx))
            with ThreadPoolExecutor(max_workers=workers) as ex:
                lp_parsed = dict(zip(lp_idx, ex.map(_parse_lp, lp_idx)))

        out: dict[tuple[str, str], list[dict]] = {}
        delta = 0
        dropped = 0
        for idx, (db, kind, payload, n_pre) in enumerate(raw):
            actual = 0
            if kind.startswith("lp"):
                precision = kind.split(":")[1] if ":" in kind else "ns"
                per_meas = (lp_parsed[idx] if idx in lp_parsed
                            else parse_chunk_columnar(payload, precision))
                for meas, batch in per_meas.items():
                    if batch["columns"] and _name_ok(meas):
                        n = len(batch["columns"][next(iter(batch["columns"]))])
                        out.setdefault((db, meas), []).append(batch)
                        actual += n
            else:
                batch = decode_msgpack_payload(payload)
                meas = batch.get("measurement") or "default"
                if batch["columns"] and _name_ok(meas):
                    actual = len(
                        batch["columns"][next(iter(batch["columns"]))])
                    out.setdefault((db, meas), []).append(batch)
            pre = n_pre if n_pre >= 0 else 0
            delta += actual - pre
            if actual < pre:
                dropped += pre - actual
        return out, delta, dropped

    def _maybe_drain_distributed(
        self, raw: list[tuple[str, str, bytes, int]]
    ) -> tuple[list[tuple[str, str, bytes, int]], int, int]:
        """Split per-db deferred-payload groups (msgpack AND line
        protocol) whose byte total crosses the distributed-flush
        threshold and drain them via :meth:`_drain_raw_distributed`.
        Returns (remaining raw, rows written distributed, rows of those
        already counted at ack — the caller adds only the difference to
        the acked stat)."""
        if self.distributed_flush_min_bytes is None:
            return raw, 0, 0
        by_db: dict[str, list[tuple[str, bytes]]] = {}
        pre_by_db: dict[str, int] = {}
        for db, kind, payload, n_pre in raw:
            by_db.setdefault(db, []).append((kind, payload))
            pre_by_db[db] = pre_by_db.get(db, 0) + max(n_pre, 0)
        dist_dbs = {
            db for db, es in by_db.items()
            if sum(len(p) for _, p in es) >= self.distributed_flush_min_bytes
        }
        if not dist_dbs:
            return raw, 0, 0
        rows = 0
        pre_counted = 0
        for db in dist_dbs:
            rows += self._drain_raw_distributed(db, by_db[db])
            pre_counted += pre_by_db.get(db, 0)
        remaining = [e for e in raw if e[0] not in dist_dbs]
        return remaining, rows, pre_counted

    # -- flush path --------------------------------------------------------
    def flush(self) -> int:
        """Merge buffered batches per measurement (schema-evolution-aware)
        and write through the hour-partitioned sorted writer; WAL segments
        sealed before the snapshot are then obsolete and removed.

        The snapshot (buffer swap + WAL rotation) is atomic with respect to
        writers; Parquet writing happens outside the lock, so the ack path
        is never blocked by a flush in progress. Only segments BEFORE the
        rotation cut are truncated — entries appended during the flush keep
        their WAL backing."""
        with self._flush_serial:
            with self._lock:
                buffers, self._buffers = self._buffers, {}
                raw, self._raw = self._raw, []
                snap_rows = self._buffer_rows
                snap_raw_bytes = self._raw_bytes
                self._flushing_rows += snap_rows
                self._flushing_raw_bytes += snap_raw_bytes
                self._buffer_rows = 0
                self._raw_bytes = 0
                self._oldest = None
                cut = None
                # During recover() the WAL must survive untouched: a
                # threshold-triggered flush mid-replay would otherwise delete
                # segments the replay iterator has not read yet. recover()
                # truncates once, after its own final flush.
                if self.wal is not None and not self._recovering:
                    cut = self.wal.rotate()
            decoded_merged = False
            dist_rows = 0
            try:
                if raw:
                    # large deferred backlogs (msgpack or LP) drain
                    # distributed (executors decode+write); the rest
                    # decodes in-process
                    raw, dist_rows, dist_pre = \
                        self._maybe_drain_distributed(raw)
                    if dist_rows:
                        # distributed rows are durably written NOW —
                        # account them immediately so a later buffer-write
                        # failure can't lose them from the flushed count.
                        # Ack-time header counts already covered dist_pre
                        # of these rows; add only the difference.
                        with self._lock:
                            self.stats["acked"] += dist_rows - dist_pre
                            self.stats["flushed"] += dist_rows
                    acked_delta = 0
                    parse_dropped = 0
                    if raw:
                        decoded, acked_delta, parse_dropped = \
                            self._decode_raw_batches(raw)
                        for key, batches in decoded.items():
                            buffers.setdefault(key, []).extend(batches)
                    decoded_merged = True
                    with self._lock:
                        self.stats["acked"] += acked_delta
                        self.stats["parse_dropped"] += parse_dropped
                total = self._write_buffers(buffers)
            except BaseException:
                # a failed Parquet write must not orphan acked rows: put the
                # whole snapshot back (oldest-first) so the NEXT flush
                # retries it. The WAL cut below only happens on success, so
                # a crash instead of a retry still recovers from the log.
                with self._lock:
                    for key, batches in buffers.items():
                        self._buffers[key] = batches + self._buffers.get(key, [])
                        self._buffer_rows += sum(
                            len(b["columns"][next(iter(b["columns"]))])
                            for b in batches if b["columns"]
                        )
                    if raw and not decoded_merged:
                        # drain/decode failed mid-raw: requeue the CURRENT
                        # binding — still the full snapshot if the
                        # distributed drain itself failed (its partial
                        # writes retry at-least-once; LWW compaction dedup
                        # collapses tagged replays), but only the
                        # REMAINING payloads if the drain succeeded and
                        # the in-process decode then failed, so durably
                        # written groups are never re-run
                        self._raw = list(raw) + self._raw
                        self._raw_bytes += sum(len(p) for _, _, p, _ in raw)
                    if self._oldest is None and self._buffers:
                        self._oldest = time.monotonic()
                    self._flushing_rows -= snap_rows
                    # the in-flight share always drops by the FULL snapshot:
                    # decoded raw re-queues as row batches, undecoded raw
                    # re-queued (and re-counted) into _raw_bytes above
                    self._flushing_raw_bytes -= snap_raw_bytes
                    self._space.notify_all()
                raise
            if cut is not None:
                self.wal.truncate_upto(cut)
            with self._lock:
                self.stats["flushed"] += total
                self.stats["flushes"] += 1
                self._flushing_rows -= snap_rows
                self._flushing_raw_bytes -= snap_raw_bytes
                self._space.notify_all()
            self._notify_written(set(buffers))
        return total + dist_rows

    def _notify_written(self, keys: set) -> None:
        """Fire on_measurements_written; an observer failure must never
        fail (or retry) a flush whose data already landed."""
        cb = self.on_measurements_written
        if cb is None or not keys:
            return
        try:
            cb(keys)
        except Exception:
            pass

    def _write_buffers(self, buffers: dict[tuple[str, str], list[dict]]) -> int:
        from arc_spark.sources.ingest import columnar_to_arrow, merge_batches
        from arc_spark.sources.writer import (
            write_measurement,
            write_measurement_arrow,
        )

        total = 0
        for (db, meas), batches in buffers.items():
            decimals = self.decimal_config.get(meas)
            tables = [columnar_to_arrow(b, decimal_columns=decimals)
                      for b in batches]
            tag_cols = sorted(
                {c for b in batches for c in (b.get("tag_columns") or [])}
            )
            dec_manifest = (
                {c: list(ps) for c, ps in decimals.items()} if decimals else None
            )
            sort_keys = self.sort_keys_config.get(meas)  # None → tags+time
            # steady-state flushes write Parquet in-process (the reference's
            # design — no per-flush Spark job). A backlog bigger than one
            # trigger unit is CHUNKED and the chunks written concurrently
            # (sort + parquet encode release the GIL): drain after a burst
            # pays N× the per-chunk cost / parallelism, not one giant
            # single-threaded sort. Only a single payload beyond
            # direct_flush_max_rows takes the distributed Spark write.
            # half the trigger size: a steady-state snapshot (one trigger
            # unit, plus whatever accumulated while the previous flush ran)
            # splits across ≥2 concurrent chunk writers
            chunk_rows = max(min(self.max_buffer_rows, 2_000_000) // 2, 50_000)
            chunks: list[list] = [[]]
            acc = 0
            big: list = []
            for t in tables:
                if t.num_rows > self.direct_flush_max_rows:
                    big.append(t)
                    continue
                if acc + t.num_rows > chunk_rows and chunks[-1]:
                    chunks.append([])
                    acc = 0
                chunks[-1].append(t)
                acc += t.num_rows
            chunks = [c for c in chunks if c]

            written: list[str] = []  # list.extend is GIL-atomic per chunk

            def _write_chunk(group: list) -> int:
                merged = merge_batches(group)
                write_measurement_arrow(
                    merged, self.root, db, meas, tag_columns=tag_cols,
                    sort_keys=sort_keys, decimals=dec_manifest,
                    manifest=False, written_out=written,
                )
                return merged.num_rows

            if chunks:
                from arc_spark.sources.writer import write_manifest

                # once per flush, atomically — not per concurrent chunk
                manifest_keys = list(sort_keys) if sort_keys else (tag_cols or [])
                if "time" not in manifest_keys:
                    manifest_keys = manifest_keys + ["time"]
                write_manifest(self.root, db, meas, tag_cols,
                               manifest_keys, decimals=dec_manifest)
            if len(chunks) <= 1:
                total += sum(_write_chunk(c) for c in chunks)
            else:
                from concurrent.futures import ThreadPoolExecutor

                workers = min(len(chunks), 4)
                with ThreadPoolExecutor(max_workers=workers) as ex:
                    total += sum(ex.map(_write_chunk, chunks))
            if written:
                # ONE snapshot commit per measurement per flush: readers
                # see the whole flush or none of it (reference Raft-
                # manifest atomicity; a crash before this line leaves the
                # chunk files invisible and the WAL replays the rows)
                from arc_spark import snapshots
                from arc_spark.sources.writer import measurement_path

                snapshots.commit(
                    measurement_path(self.root, db, meas), add=written)
            for t in big:
                df = self.spark.createDataFrame(t)
                write_measurement(df, self.root, db, meas,
                                  tag_columns=tag_cols,
                                  sort_keys=sort_keys,
                                  decimals=dec_manifest)
                total += t.num_rows
        return total

    # -- crash recovery ----------------------------------------------------
    def recover(self, db: str = "default") -> int:
        """Replay WAL payloads written but not yet flushed (startup path,
        reference wal/recovery.go). Payload kind is sniffed: msgpack maps
        start with 0x80-0x8f/0xde/0xdf; anything else is line protocol.

        Returns the number of rows recovered. WAL truncation is suppressed
        while the replay iterator is live (flush() checks ``_recovering``)
        so a threshold-triggered flush cannot delete unread segments. Once
        the replay is fully read, suppression lifts and one final flush runs
        under the NORMAL rotate/truncate-upto protocol — so the flushed
        segments drop, while entries appended concurrently after the final
        snapshot keep their WAL backing (a full truncate here would destroy
        them). ``defer_decode`` is disabled during replay so the returned
        count reflects DECODED rows exactly (the deferred header-walk count
        is exact in practice but returns -1 on undeterminable payloads)."""
        if self.wal is None:
            return 0
        n = 0
        self._recovering = True
        prev_defer = self.defer_decode
        self.defer_decode = False
        try:
            from arc_spark.sources.ingest import MalformedPayloadError

            for _ts, payload in self.wal.replay():
                first = payload[:1]
                try:
                    if first and (0x80 <= first[0] <= 0x8F
                                  or first[0] in (0xDE, 0xDF)):
                        n += self.write_msgpack(db, payload, _wal=False)
                    else:
                        n += self.write_line_protocol(
                            db, payload, _wal=False)
                except (MalformedPayloadError, ValueError):
                    # a poison entry (pre-validation-era WAL, or bytes
                    # that no longer pass today's checks) must not make
                    # startup unrecoverable: CRC says the frame is what
                    # was written, so skipping is a decode-policy drop,
                    # not data loss from corruption — log-visible via
                    # the recovered-vs-flushed stats delta
                    continue
        finally:
            self.defer_decode = prev_defer
            self._recovering = False
        # replay fully read; flush with rotation-based truncation (drain
        # waits out any worker-scheduled flushes first)
        if self._flush_queue is not None:
            self.drain()
        else:
            self.flush()
        return n
