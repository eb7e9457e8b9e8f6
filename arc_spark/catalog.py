"""Measurement/table catalog.

Replaces the reference's regex table→path rewriter
(/root/reference/internal/api/query.go:2462-2596 convertSQLToStoragePaths):
instead of rewriting SQL strings into ``read_parquet('<path>/**')`` calls,
every measurement is registered as a Spark temp view (or catalog table) over
its Parquet path and Spark's analyzer resolves names. Partition pruning,
parallel scan, and schema merge are then native (reference A2/A3 collapse).

Two catalogs live here:

- :func:`load_tables` — the flat driver testdata layout
  (``<sf_dir>/<name>.parquet``).
- :class:`MeasurementCatalog` — arc's ``db.measurement`` namespace over
  hive-partitioned storage (``<root>/<db>/<measurement>/year=/month=/...``),
  including multi-tier (hot ∪ cold) reads
  (reference internal/api/query.go:2836-2921 buildMultiTierReadParquet).
"""

from __future__ import annotations

import functools as _functools
import os

from pyspark.sql import DataFrame, SparkSession

from arc_spark.storage import backend_for

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


_HIVE_PART_RE = None  # compiled lazily (module import stays cheap)


def _path_time_window(path: str) -> tuple[int, int] | None:
    """[start, end) epoch-µs window a hive-partitioned file path can hold,
    from its ``year=/month=/day=/hour=`` components — ``hour=`` files span
    one hour, daily-compacted files (no ``hour=``) one day, and so on.
    None when the path carries no hive time components (unprunable — the
    caller must keep the file). Mirrors the reference's directory-prefix
    pruning (internal/pruning/partition_pruner.go:563-676) over the Spark
    layout.

    Callers MUST pass the path RELATIVE to the measurement root: a
    storage root or db name containing a ``year=N`` segment would
    otherwise poison every file's window and prune real data
    (r8 review finding).

    Memoized on the DIRECTORY prefix (the filename never carries hive
    components, and every file in an hour dir shares one window):
    re-parsing 720 paths per serve was ~8 ms of a ~60 ms time-range
    request; warm serves now pay a dict hit per file. The cache is a
    pure string→window map, safe across measurements."""
    return _dir_time_window(path.rsplit("/", 1)[0] + "/"
                            if "/" in path else "")


@_functools.lru_cache(maxsize=65_536)
def _dir_time_window(path: str) -> tuple[int, int] | None:
    global _HIVE_PART_RE
    if _HIVE_PART_RE is None:
        import re

        _HIVE_PART_RE = re.compile(
            r"(?:^|/)(year|month|day|hour)=(\d+)(?=/)")
    comps = {m.group(1): int(m.group(2))
             for m in _HIVE_PART_RE.finditer(path)}
    if "year" not in comps:
        return None
    import datetime as _dt

    y = comps["year"]
    mo, d, h = comps.get("month"), comps.get("day"), comps.get("hour")
    utc = _dt.timezone.utc
    try:
        start = _dt.datetime(y, mo or 1, d or 1, h or 0, tzinfo=utc)
        if h is not None:
            end = start + _dt.timedelta(hours=1)
        elif d is not None:
            end = start + _dt.timedelta(days=1)
        elif mo is not None:
            end = _dt.datetime(y + (mo == 12), mo % 12 + 1, 1, tzinfo=utc)
        else:
            end = _dt.datetime(y + 1, 1, 1, tzinfo=utc)
    except (ValueError, OverflowError):
        # out-of-range component (year=13m → ValueError; year=1e11 →
        # OverflowError) — keep the file, filter exact
        return None
    return (int(start.timestamp() * 1_000_000),
            int(end.timestamp() * 1_000_000))


class TimeRange:
    """A pure time predicate in epoch-µs: ``lo <(=) time <(=) hi``, either
    side optional. Two faces: :meth:`may_contain` prunes files by their
    hive-window CONSERVATIVELY (a kept file may still hold zero matching
    rows; the exact predicate runs in the scan), and :meth:`arrow_filter`
    is the exact row predicate as a pyarrow dataset expression (which
    pyarrow also uses for parquet row-group-statistics pruning)."""

    __slots__ = ("lo_us", "lo_incl", "hi_us", "hi_incl")

    def __init__(self, lo_us: int | None = None, lo_incl: bool = True,
                 hi_us: int | None = None, hi_incl: bool = True):
        self.lo_us, self.lo_incl = lo_us, lo_incl
        self.hi_us, self.hi_incl = hi_us, hi_incl

    def may_contain(self, window: tuple[int, int] | None) -> bool:
        if window is None:
            return True  # unpartitioned file — cannot prune, filter exact
        ws, we = window  # file rows live in [ws, we)
        # conservative on inclusivity: `we > lo` / `ws <= hi` keep at most
        # one boundary file extra; the row filter is exact either way
        if self.lo_us is not None and we <= self.lo_us:
            return False
        if self.hi_us is not None and ws > self.hi_us:
            return False
        return True

    def covers(self, window: tuple[int, int] | None) -> bool:
        """True when EVERY row a file with this hive window can hold
        already satisfies the predicate — the exact row filter is then
        an identity and the scan can skip it entirely. r13: on the
        hour-partitioned 7d/10K serving shape, ~69 of 71 pruned-in
        files are fully interior to the range, and the per-file acero
        filter was the lane's dominant warm cost (11.3 of 18.7 ms —
        the serve_timerange vs arc-15 ms gap). Conservative under any
        time unit: rows live in [ws, we) real time, so ws ≥ lo (> for
        an exclusive bound) and we ≤ hi suffice regardless of
        inclusivity or sub-µs row resolution."""
        if window is None:
            return False
        ws, we = window
        if self.lo_us is not None and (
                ws < self.lo_us or (ws == self.lo_us
                                    and not self.lo_incl)):
            return False
        if self.hi_us is not None and we > self.hi_us:
            return False
        return True

    def arrow_filter(self, time_type):
        """Exact row predicate against a `time` column of ``time_type``.
        Raises ValueError when the column type can't represent the bounds
        losslessly (caller falls back to the Spark path)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if not pa.types.is_timestamp(time_type):
            raise ValueError(
                f"time column is {time_type}, not a timestamp")

        def _scalar(us: int):
            s = pa.scalar(us, pa.timestamp("us", tz=time_type.tz))
            try:
                return s.cast(time_type)
            except pa.ArrowInvalid as e:  # lossy cast (µs → s truncates)
                raise ValueError(str(e)) from None

        fld = pc.field("time")
        expr = None
        if self.lo_us is not None:
            e = (fld >= _scalar(self.lo_us) if self.lo_incl
                 else fld > _scalar(self.lo_us))
            expr = e
        if self.hi_us is not None:
            e = (fld <= _scalar(self.hi_us) if self.hi_incl
                 else fld < _scalar(self.hi_us))
            expr = e if expr is None else expr & e
        if expr is None:
            raise ValueError("time range with no bounds")
        return expr


class _DecodedFileCache:
    """Bounded LRU of DECODED small parquet files for the native serving
    paths — the warm-server answer to the hour-partitioned hot tier's
    per-file floor.

    Measured at sf0.1 (r9): a 7d/LIMIT-10K time-range serve must open
    ~72 hour-files of ~140 rows each; each open costs ~1.35 ms of
    footer-parse + column-decode CPU (not I/O — the bytes are in page
    cache), and thread pools cap at ~2.3× (GIL-bound wrapper layer), so
    the lane floors at ~45 ms however the scan is arranged. A long-lived
    server re-serves the SAME committed files — they are write-once
    (uuid part names; compaction/DELETE publish new snapshots rather
    than rewriting), so caching the decoded tables is sound. Entries are
    validated by (mtime_ns, size) stat on every hit — an out-of-band
    overwrite misses and re-reads — and :meth:`ArcCatalog.invalidate`
    clears the cache wholesale (the documented hook after any file-set
    mutation). Only files ≤ ``max_file_bytes`` are cached: the regime
    where per-file overhead dominates is tiny files; big compacted files
    stream efficiently already and would evict thousands of small ones.

    Knobs: ``ARC_SPARK_SCAN_CACHE_MB`` total budget (default 128, 0
    disables), ``ARC_SPARK_SCAN_CACHE_FILE_KB`` per-file gate (default
    256)."""

    def __init__(self, max_bytes: int | None = None,
                 max_file_bytes: int | None = None):
        import threading
        from collections import OrderedDict

        if max_bytes is None:
            max_bytes = int(os.environ.get(
                "ARC_SPARK_SCAN_CACHE_MB", "128")) << 20
        if max_file_bytes is None:
            max_file_bytes = int(os.environ.get(
                "ARC_SPARK_SCAN_CACHE_FILE_KB", "256")) << 10
        self.max_bytes = max_bytes
        self.max_file_bytes = max_file_bytes
        self._lock = threading.Lock()
        self._entries: "OrderedDict[str, tuple[int, int, object]]" = \
            OrderedDict()
        self._bytes = 0

    def get(self, path: str, mtime_ns: int, size: int):
        with self._lock:
            ent = self._entries.get(path)
            if ent is None or ent[0] != mtime_ns or ent[1] != size:
                return None
            self._entries.move_to_end(path)
            return ent[2]

    def put(self, path: str, mtime_ns: int, size: int, table) -> None:
        nbytes = table.nbytes
        if nbytes > self.max_bytes:
            return
        with self._lock:
            old = self._entries.pop(path, None)
            if old is not None:
                self._bytes -= old[2].nbytes
            self._entries[path] = (mtime_ns, size, table)
            self._bytes += nbytes
            while self._bytes > self.max_bytes and self._entries:
                _, (_, _, ev) = self._entries.popitem(last=False)
                self._bytes -= ev.nbytes

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
            self._bytes = 0

    def evict_prefix(self, prefix: str) -> None:
        """Drop entries under one path prefix (a measurement root) —
        invalidating measurement A must not cold-start B's serving."""
        with self._lock:
            victims = [p for p in self._entries if p.startswith(prefix)]
            for p in victims:
                _, _, t = self._entries.pop(p)
                self._bytes -= t.nbytes


#: process-wide decoded-file cache (immutable committed files; safe to
#: share across catalogs/sessions in one process)
_scan_cache = _DecodedFileCache()

# Debug/verify knob (r13 advice): when set, the covers() fast path
# re-applies the exact row filter on fully-interior hive files and
# logs any row that escapes its path window — catches writer-invariant
# violations from out-of-band import paths at the cost of the filter
# the fast path exists to skip.
_VERIFY_INTERIOR = os.environ.get(
    "ARC_SCAN_VERIFY_INTERIOR", "") not in ("", "0", "false")


def _hive_parts(rel_path: str) -> "list[tuple[str, object]] | None":
    """``key=value`` hive components of a path relative to the scan
    root, typed like pyarrow's hive-partitioning inference over our
    layouts (int32 for CANONICAL in-range integers, string otherwise).
    Returns None when a value's typing is uncertain — non-canonical
    spellings Python's int() accepts but pyarrow's inference doesn't
    (``1_0``, ``+5``), or integers outside int32 — so the caller can
    decline to the dataset scan instead of diverging from it."""
    out: list[tuple[str, object]] = []
    for seg in rel_path.split("/")[:-1]:
        if "=" not in seg:
            continue
        k, _, v = seg.partition("=")
        if v.isdigit() or (v.startswith("-") and v[1:].isdigit()):
            iv = int(v)
            if not (-(1 << 31) <= iv < (1 << 31)) or str(iv) != v:
                return None  # out of int32 / non-canonical ("007")
            out.append((k, iv))
        elif any(ch.isdigit() for ch in v) and all(
                ch.isdigit() or ch in "+-_." for ch in v):
            return None  # numeric-ish spelling pyarrow may type oddly
        else:
            out.append((k, v))
    return out


def _read_small_files_cached(bk, root: str, files: "list[str]",
                             limit: int | None, time_range, columns):
    """Read a pruned list of SMALL local parquet files through the
    decoded-file cache, in list order, stopping once ``limit`` rows
    survive the exact time predicate. Returns the concatenated table,
    or None when this path must decline (non-local backend, a file over
    the cache gate, cache disabled, per-file schema surprises) — the
    caller then uses the pyarrow-dataset scan. Raises ValueError for
    no-time-column / unrepresentable bounds exactly like the dataset
    path (the API layer falls back to Spark on that). Hive partition
    columns are appended per file exactly as pyarrow's hive flavor
    would (int32, after data columns), so callers see identical schemas
    either way."""
    import pyarrow as pa

    if bk.scheme is not None or _scan_cache.max_bytes <= 0:
        return None
    stats = []
    prefix_len = len(root.rstrip("/")) + 1
    for f in files:
        fs = bk.fs_path(f)
        try:
            st = os.stat(fs)
        except OSError:
            return None  # vanished out-of-band: dataset path reports it
        if st.st_size > _scan_cache.max_file_bytes:
            return None
        stats.append((f, fs, st))
    tables = []
    got = 0
    flt = None
    schema0 = None  # first file's (projected) schema, for empty results
    for f, fs, st in stats:
        tab = _scan_cache.get(fs, st.st_mtime_ns, st.st_size)
        if tab is None:
            parts = _hive_parts(f[prefix_len:])
            if parts is None:
                return None  # uncertain partition typing: dataset path
            import pyarrow.parquet as pq

            tab = pq.read_table(fs, memory_map=True)
            for k, v in parts:
                typ = pa.int32() if isinstance(v, int) else pa.string()
                tab = tab.append_column(
                    pa.field(k, typ),
                    pa.array([v] * tab.num_rows, typ))
            _scan_cache.put(fs, st.st_mtime_ns, st.st_size, tab)
        if time_range is not None and flt is None:
            if tab.schema.get_field_index("time") < 0:
                raise ValueError("measurement has no 'time' column")
            flt = time_range.arrow_filter(
                tab.schema.field("time").type)
        try:
            # skip the exact row filter for files whose hive window is
            # fully interior to the range — the filter is an identity
            # there, and on the hour-partitioned 7d shape it was the
            # lane's dominant warm cost (see TimeRange.covers). This
            # leans on the WRITER INVARIANT that every row in an
            # hour=/day= file lies inside its path window (writer.py
            # partitions by columns DERIVED from `time`, and compaction
            # re-derives them — see _hour_cols' contract). r14 (r13
            # advice): ARC_SCAN_VERIFY_INTERIOR=1 re-applies the filter
            # on covers()-skipped files and flags any mis-partitioned
            # row — a debug mode for import paths outside the writer.
            if flt is not None and not time_range.covers(
                    _path_time_window(f[prefix_len:])):
                tab = tab.filter(flt)
            elif flt is not None and _VERIFY_INTERIOR:
                checked = tab.filter(flt)
                if checked.num_rows != tab.num_rows:
                    import logging

                    logging.getLogger("arc_spark.catalog").error(
                        "mis-partitioned hive file %s: %d row(s) "
                        "outside its path time window (writer "
                        "invariant violated; serving the filtered "
                        "rows)", f, tab.num_rows - checked.num_rows)
                    tab = checked
            if columns is not None:
                tab = tab.select(columns)
        except (pa.ArrowInvalid, KeyError):
            return None  # heterogeneous schema: dataset path unifies
        if schema0 is None:
            schema0 = tab.schema
        if tab.num_rows:
            tables.append(tab)
            got += tab.num_rows
        if limit is not None and got >= limit:
            break
    if not tables:
        # filter dropped every row: empty result with the real schema
        return schema0.empty_table()
    out = (tables[0] if len(tables) == 1
           else pa.concat_tables(tables, promote_options="permissive"))
    if limit is not None and out.num_rows > limit:
        out = out.slice(0, limit)
    return out


def validate_identifier(name: str, what: str = "name") -> None:
    """A database/measurement name is a SINGLE path segment under the
    storage root — never a traversal. ``db=".."`` or
    ``measurement="x/../../etc"`` through any API route would otherwise
    read (or worse, WRITE) outside the root (the reference validates
    database names at creation, internal/api/databases.go). Rejects
    empty, dot-navigation, separators, NUL, and dot-prefixed names
    (reserved for engine-internal dirs like .sync-staging)."""
    if (not name or name in (".", "..") or name.startswith(".")
            or "/" in name or "\\" in name or "\x00" in name):
        from arc_spark.plans.validator import SqlValidationError

        # SqlValidationError (a ValueError) so HTTP routes answer 400 and
        # the circuit breaker counts it as a user error, not engine fault
        raise SqlValidationError(
            f"invalid {what} {name!r}: must be a single non-hidden "
            "path segment")


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) — Spark cannot read
    those natively (arc's type system is µs-only, SURVEY §1.2; ns inputs are
    normalized to µs at ingest, reference internal/ingest/msgpack.go:435-505)."""
    import glob

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not files:
            return []
        path = files[0]
    schema = pq.read_schema(path)
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def _require_conf(spark: SparkSession, key: str, want: str) -> None:
    got = spark.conf.get(key, None)
    if got is None or got.lower() != want:
        raise RuntimeError(
            f"session conf {key}={got!r}, need {want!r}: build the session "
            "with arc_spark.session.get_spark or call "
            "arc_spark.session.ensure_parquet_confs(spark) before resolving "
            "any plan (a reader helper must not flip session-global confs "
            "under already-resolved lazy plans)"
        )


def read_parquet_normalized(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with ns-timestamp healing: ns columns are read as
    long (legacy conf) and floor-converted to µs timestamps — the same
    normalization arc applies at ingest.

    Requires (and verifies, loudly) the two parquet confs that
    session.get_spark sets at build and session.ensure_parquet_confs sets
    at driver entry: naive timestamps must resolve as TIMESTAMP (not NTZ)
    and ns columns as long. Verified here instead of set here — mutating
    session-global conf inside a reader flips how unrelated, already-built
    lazy plans execute."""
    from pyspark.sql import functions as F

    _require_conf(spark, "spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ns_cols = _nanos_timestamp_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    _require_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load the driver testdata tables; optionally register temp views.

    Memoized per (session, dir): the testdata is static, DataFrames are
    immutable plans, and a cold load costs ~600 ms (10 tables × footer
    probe + reader construction) — which would otherwise dominate every
    sub-second query's latency. Mirrors the reference keeping one
    long-lived server process with warm catalog state (SURVEY §7 risk 2).
    """
    key = (id(spark._jsparkSession), sf_dir)
    dfs = _TABLE_CACHE.get(key)
    if dfs is None:
        if not os.path.isdir(sf_dir):
            raise FileNotFoundError(f"testdata dir not found: {sf_dir}")
        dfs = {}
        for name in TESTDATA_TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            if os.path.exists(path):
                dfs[name] = read_parquet_normalized(spark, path)
        _TABLE_CACHE[key] = dfs
    if register_views:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
    return dfs


class MeasurementCatalog:
    """``db.measurement`` → partitioned-Parquet path resolution.

    SHOW DATABASES / SHOW MEASUREMENTS are directory listings, like the
    reference (internal/api/databases.go:435-662) — storage is the source
    of truth, no metadata service required.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cold_root: str | None = None,
        daily_root: str | None = None,
    ):
        """daily_root: the day-compacted tier (operators/compaction.
        compact_measurement_daily) — ``year=/month=/day=`` partitioned, one
        file per day, ``hour`` as an in-file column. Unioned into reads like
        the cold tier."""
        self.spark = spark
        self.root = root
        self.cold_root = cold_root
        self.daily_root = daily_root
        self._views: dict[tuple[str, str], set[str]] = {}
        #: bumped whenever the view universe changes (register/invalidate);
        #: consumers keying caches on (sql, epoch) — QueryService's pruned-
        #: plan cache — drop stale plans without tracking individual views
        self.epoch = 0
        #: epoch-keyed footer-count cache for the native COUNT(*) path
        self._count_cache: dict[tuple[str, str], tuple[int, int]] = {}
        #: epoch-keyed footer min/max cache (native MIN/MAX path)
        self._stats_cache: dict[tuple[str, str, str], tuple] = {}
        #: immutable per-file row counts (files never mutate in place)
        self._file_rows: dict[str, int] = {}
        #: committed-snapshot state each live view was registered from —
        #: lets register() skip the footer-merge re-registration when
        #: nothing changed (the serving hot path registers per REQUEST;
        #: re-reading a 720-file listing cost ~500 ms per call)
        self._view_states: dict[tuple[str, str], tuple] = {}

    # -- namespace listing (reference A12) --------------------------------
    def databases(self) -> list[str]:
        bk = backend_for(self.root)
        if not bk.isdir(self.root):
            return []
        return bk.list_dirs(self.root)

    def measurements(self, db: str) -> list[str]:
        try:
            validate_identifier(db, "database")
        except ValueError:
            return []  # a path-shaped name can't list outside the root
        bk = backend_for(self.root)
        base = bk.join(self.root, db)
        if not bk.isdir(base):
            return []
        return bk.list_dirs(base)

    # -- resolution (reference A1/A4) --------------------------------------
    def paths(self, db: str, measurement: str) -> list[str]:
        """All tier paths holding this measurement (hot first). Tiers may
        live on different backends (hot local, cold object-store)."""
        validate_identifier(db, "database")
        validate_identifier(measurement, "measurement")
        out = []
        for base in filter(None, (self.root, self.cold_root, self.daily_root)):
            bk = backend_for(base)
            p = bk.join(base, db, measurement)
            if bk.isdir(p):
                out.append(p)
        return out

    def count_rows(self, db: str, measurement: str) -> int:
        """Exact committed row count from parquet FOOTERS — no Spark job,
        no data pages (the reference's ~1 ms COUNT(*) served from DuckDB
        metadata; here the snapshot file list + footer num_rows). Sums
        over every tier exactly like :meth:`table`; cached per catalog
        epoch, so any flush/compaction/invalidate recomputes."""
        from arc_spark import snapshots

        key = (db, measurement)
        hit = self._count_cache.get(key)
        if hit is not None and hit[0] == self.epoch:
            return hit[1]
        total = 0
        for p in self.paths(db, measurement):
            bk = backend_for(p)
            files = snapshots.data_files(p, bk=bk)
            if files is None:
                files = [bk.join(p, r)
                         for r in snapshots.live_glob(p, bk=bk)]
            for f in files:
                # per-FILE counts are immutable (parquet files never
                # mutate in place), so an epoch bump (any flush) costs
                # O(new files) footer reads, not O(all files)
                n = self._file_rows.get(f)
                if n is None:
                    n = bk.parquet_metadata(f).num_rows
                    if len(self._file_rows) > 1_000_000:
                        self._file_rows.clear()  # ~100MB bound
                    self._file_rows[f] = n
                total += n
        self._count_cache[key] = (self.epoch, total)
        return total

    def column_stats(self, db: str, measurement: str,
                     col: str) -> tuple | None:
        """(min, max) for one column from parquet FOOTER statistics over
        the committed set — every row group of every file must carry
        exact stats or this returns None (caller falls back to Spark).

        Restricted by the CALLER to types whose parquet stats are exact
        (timestamps/dates/integers); float stats may be conservative
        bounds (-0.0 vs 0.0) and string stats may truncate, so those
        never take this path. A file missing the column contributes
        nothing (all-null column in SQL min/max semantics); an all-null
        or empty table yields (None, None) like SQL MIN/MAX."""
        from arc_spark import snapshots

        key = (db, measurement, col)
        hit = self._stats_cache.get(key)
        if hit is not None and hit[0] == self.epoch:
            return hit[1]
        import pyarrow as pa

        def _eligible(t) -> bool:
            return (pa.types.is_timestamp(t) or pa.types.is_date(t)
                    or pa.types.is_integer(t))

        lo = hi = None
        col_type = None
        for p in self.paths(db, measurement):
            bk = backend_for(p)
            files = snapshots.data_files(p, bk=bk)
            if files is None:
                files = [bk.join(p, r)
                         for r in snapshots.live_glob(p, bk=bk)]
            for f in files:
                md = bk.parquet_metadata(f)
                sch = md.schema.to_arrow_schema()
                if col not in sch.names:
                    continue  # column absent in this file: all-null
                t = sch.field(col).type
                if not _eligible(t) or (col_type is not None
                                        and t != col_type):
                    self._stats_cache[key] = (self.epoch, None)
                    return None  # float/string stats or evolved type
                col_type = t
                idx = None
                if md.num_row_groups:
                    # flattened parquet column index by path (flat
                    # measurement schemas: top-level names only)
                    for i in range(md.num_columns):
                        if md.row_group(0).column(i).path_in_schema == col:
                            idx = i
                            break
                if idx is None:
                    continue
                for g in range(md.num_row_groups):
                    cc = md.row_group(g).column(idx)
                    if cc.num_values == 0:
                        continue  # all values null in this group
                    st = cc.statistics
                    if st is None or not st.has_min_max:
                        self._stats_cache[key] = (self.epoch, None)
                        return None  # stats missing → not answerable
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        if col_type is None:
            # column in NO file's schema: the view can't resolve it either
            # — fall through so Spark raises its usual unresolved-column
            # error (distinct from all-null, where the type is known)
            out = None
        else:
            out = (lo, hi, col_type)
        self._stats_cache[key] = (self.epoch, out)
        return out

    def measurement_for_view(self, name: str,
                             db: str | None = None) -> tuple[str, str] | None:
        """Reverse view lookup: the unique (db, measurement) whose
        registered view is ``name`` (scoped to ``db`` when given).
        Returns None when unknown OR ambiguous — callers fall back to
        the Spark path, never guess."""
        matches = [key for key, views in self._views.items()
                   if name in views and (db is None or key[0] == db)]
        return matches[0] if len(matches) == 1 else None

    def table(self, db: str, measurement: str, merge_schema: bool = True) -> DataFrame:
        """DataFrame over every tier of a measurement.

        'No files found' yields an EMPTY DataFrame, not an error — matching
        the reference (internal/api/query.go:2035-2037).

        Snapshot-managed tiers (arc_spark.snapshots) resolve the COMMITTED
        file list instead of globbing the directory: a crashed flush's
        stray files are invisible until their commit, the reference's
        Raft-manifest / Iceberg ReplaceDataFiles atomicity. The explicit
        file list still carries ``basePath``, so hive partition columns
        and Catalyst partition pruning behave exactly as a directory scan.
        Unmanaged trees keep the glob path.
        """
        from arc_spark import snapshots

        # each tier root is its own partitioned table (hive partition
        # discovery needs a basePath per root — two roots can't share one),
        # unioned by name so tiers may differ in schema vintage
        tiers = []
        for p in self.paths(db, measurement):
            bk = backend_for(p)
            files = snapshots.data_files(p, bk=bk)
            if files is None:
                # unmanaged: directory glob; a tier emptied by compaction/
                # tiering (dir skeleton, no files) cannot be read — skip
                if not bk.find_files(p, suffix=".parquet"):
                    continue
                sources = [bk.spark_url(p)]
            elif not files:
                continue  # managed but empty snapshot
            else:
                sources = [bk.spark_url(f) for f in files]
            reader = self.spark.read.option("basePath", bk.spark_url(p))
            if merge_schema:
                reader = reader.option("mergeSchema", "true")
            tiers.append(reader.parquet(*sources))
        if not tiers:
            return self.spark.createDataFrame([], "time timestamp")
        df = tiers[0]
        for t in tiers[1:]:
            df = df.unionByName(t, allowMissingColumns=True)
        return df

    def table_at(self, db: str, measurement: str, version: int,
                 merge_schema: bool = True) -> DataFrame:
        """TIME TRAVEL: DataFrame over snapshot ``version``'s file list —
        reproducible reads for pinned-dataset training runs (Delta/
        Iceberg ``VERSION AS OF`` on the engine's own snapshot chain).

        Single-tier only: versions are per measurement-path, so a
        multi-tier union has no single coherent pin — refused loudly
        rather than guessed. Raises ValueError for pruned/unknown
        versions; referenced files must still exist (compaction's
        ``defer_input_deletion`` is the window that guarantees it)."""
        from arc_spark import snapshots

        paths = self.paths(db, measurement)
        if len(paths) != 1:
            raise ValueError(
                f"time travel needs a single-tier measurement; "
                f"{db}.{measurement} has {len(paths)} tiers")
        p = paths[0]
        bk = backend_for(p)
        files = snapshots.files_at(p, version, bk=bk)
        if not files:
            return self.spark.createDataFrame([], "time timestamp")
        reader = self.spark.read.option("basePath", bk.spark_url(p))
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*[bk.spark_url(f) for f in files])

    def scan_arrow(self, db: str, measurement: str,
                   columns: list[str] | None = None,
                   limit: int | None = None,
                   snapshot: int | None = None,
                   time_range: "TimeRange | None" = None):
        """Native Arrow scan of a measurement's COMMITTED files — no Spark
        job, no driver-collect hop.

        The trivial-serving shape (project + limit over one measurement —
        the reference's SELECT-LIMIT wire benchmark) pays ~80 ms of Spark
        job scheduling plus a ~100 MB/s JVM→Python collect in the
        DataFrame path; reading the same committed parquet through
        :mod:`pyarrow.dataset` is a multi-threaded C++ scan into the SAME
        Arrow memory the encoders consume (~10× at 100k–1M rows). The
        file list is snapshot-resolved exactly like :meth:`table`, hive
        partition columns materialize as int32 columns, and ns timestamps
        normalize to µs so both serving paths return identical values.

        ``time_range`` adds the reference's time-range serving shape
        (BASELINE "Time Range (7d) LIMIT 10K" = 15 ms; pruner behavior
        from reference internal/pruning/partition_pruner.go:448-676):
        the committed file list is pruned DRIVER-SIDE against each
        file's hive ``year=/month=/day=/hour=`` window (O(files) string
        work, no I/O — the snapshot list already sits in memory), then
        the surviving files scan through pyarrow with the exact row
        predicate, which pyarrow additionally uses for parquet
        row-group-statistics pruning, stopping at LIMIT. Anything beyond
        filter-on-time + limit (other predicates, ordering, joins) stays
        on Spark."""
        import pyarrow as pa
        import pyarrow.dataset as pads

        from arc_spark import snapshots

        paths = self.paths(db, measurement)
        if snapshot is not None and len(paths) != 1:
            raise ValueError(
                f"time travel needs a single-tier measurement; "
                f"{db}.{measurement} has {len(paths)} tiers")
        tables = []
        schema_fallback: list = []  # real schemas when pruning emptied a tier
        remaining = limit
        for p in paths:
            bk = backend_for(p)
            if snapshot is not None:
                files = snapshots.files_at(p, snapshot, bk=bk)
            else:
                files = snapshots.data_files(p, bk=bk)
            if files is None:
                files = [bk.join(p, r)
                         for r in snapshots.live_glob(p, bk=bk)]
            if time_range is not None:
                all_files = files
                # window from the path RELATIVE to the measurement root —
                # a root/db segment named `year=N` must not poison it
                prefix_len = len(p.rstrip("/")) + 1
                files = [f for f in files if time_range.may_contain(
                    _path_time_window(f[prefix_len:]))]
                if not files and all_files:
                    # everything pruned on a POPULATED measurement: the
                    # empty result must still carry the real schema
                    # (wire clients concat pages; a stub time-only
                    # schema breaks them — r8 review finding). One-file
                    # dataset inspection is cheap.
                    schema_fallback.append(pads.dataset(
                        [bk.fs_path(all_files[0])],
                        filesystem=bk.fs_read,
                        partitioning=pads.partitioning(flavor="hive"),
                        partition_base_dir=bk.fs_path(p),
                    ).schema)
            if not files:
                continue
            if time_range is not None:
                # tiny-file regime (hour-partitioned hot tier): the
                # decoded-file LRU beats re-paying ~1.35 ms/file of
                # footer+decode CPU per serve; declines (None) fall
                # through to the dataset scan
                t = _read_small_files_cached(
                    bk, p, files, remaining, time_range, columns)
                if t is not None:
                    if remaining is not None:
                        remaining -= t.num_rows
                    tables.append(t)
                    if remaining is not None and remaining <= 0:
                        break
                    continue
            ds = pads.dataset(
                [bk.fs_path(f) for f in files],
                filesystem=bk.fs_read,
                partitioning=pads.partitioning(flavor="hive"),
                partition_base_dir=bk.fs_path(p),
            )
            flt = None
            if time_range is not None:
                # a scan that silently dropped the predicate would serve
                # WRONG rows — any unsupported shape (no time column,
                # non-timestamp type, lossy unit) must raise so the
                # caller falls back to the Spark path
                try:
                    ftype = ds.schema.field("time").type
                except KeyError:
                    raise ValueError(
                        f"{db}.{measurement} has no 'time' column")
                flt = time_range.arrow_filter(ftype)
            if remaining is not None:
                t = ds.head(remaining, columns=columns, filter=flt)
                remaining -= t.num_rows
            else:
                t = ds.to_table(columns=columns, filter=flt)
            tables.append(t)
            if remaining is not None and remaining <= 0:
                break
        if not tables:
            if schema_fallback:
                tables = [schema_fallback[0].empty_table()]
            else:
                return pa.table({"time": pa.array([], pa.timestamp("us"))})
        out = (tables[0] if len(tables) == 1
               else pa.concat_tables(tables, promote_options="permissive"))
        # Spark-wire schema normalization, so both serving paths emit
        # identical Arrow schemas: µs timestamps (Spark floors ns), all
        # fields nullable (Spark's parquet reads report nullable even
        # for required columns), no parquet field/schema metadata (the
        # Spark collect path doesn't carry it)
        fields = []
        changed = False
        for f in out.schema:
            t = f.type
            if pa.types.is_timestamp(t) and t.unit != "us":
                t = pa.timestamp("us", tz=t.tz)
                changed = True
            if not f.nullable or f.metadata:
                changed = True
            fields.append(pa.field(f.name, t, nullable=True))
        if changed or out.schema.metadata:
            out = out.cast(pa.schema(fields))
        return out

    def measurement_for_path(self, path: str) -> tuple[str, str] | None:
        """Reverse-resolve a scan root path to its (db, measurement).

        Used by SQL-surface pruning (plans/time_pruning.prune_sql) to map
        the optimized plan's parquet scan roots back to registered
        measurements. Accepts whatever URI form Spark reports for the scan
        (`file:`-prefixed local paths, object-store URLs)."""
        for root in filter(None, (self.root, self.cold_root, self.daily_root)):
            bk = backend_for(root)
            logical = bk.from_spark_url(path)
            if bk.scheme is None:
                # tolerate symlinked local roots
                logical = os.path.realpath(logical)
                norm_root = os.path.realpath(root)
            else:
                norm_root = root
            if not logical.startswith(norm_root.rstrip("/") + "/"):
                continue
            rel = logical[len(norm_root.rstrip("/")) + 1:]
            parts = rel.split("/")
            if len(parts) >= 2:
                db, meas = parts[0], parts[1]
                if bk.isdir(bk.join(root, db, meas)):
                    return (db, meas)
        return None

    def views_for(self, db: str, measurement: str) -> set[str]:
        return set(self._views.get((db, measurement), set()))

    def _register_state(self, db: str, measurement: str) -> tuple | None:
        """Cheap freshness fingerprint: (tier path, committed snapshot
        version) per tier — one directory listing each, no footer I/O.
        None when any tier is UNMANAGED (no snapshot chain): freshness
        can't be proven there, so callers must re-register every time
        (globs are the source of truth and may drift silently)."""
        from arc_spark import snapshots

        st = []
        for p in self.paths(db, measurement):
            vers = snapshots.latest_version(p, bk=backend_for(p))
            if vers is None:
                return None
            st.append((p, vers))
        return tuple(st)

    def register(self, db: str, measurement: str, view: str | None = None) -> str:
        name = view or f"{db}_{measurement}"
        # idempotent re-register keeps the epoch (and with it the
        # pruned-plan cache): the single-measurement REST endpoint
        # registers its view on EVERY request, and an epoch bump per
        # request would make the A9 plan cache miss 100% of the time.
        # A genuinely new (measurement, view) binding still bumps.
        already = name in self._views.get((db, measurement), set())
        state = self._register_state(db, measurement)
        if (already and state is not None
                and self._view_states.get((db, measurement)) == state):
            # nothing committed since this view was built: skip the
            # re-registration (a footer merge + file listing — ~500 ms
            # on a 720-file measurement, per request on the REST path).
            # Every engine write path commits a snapshot and calls
            # invalidate(), so a stale skip requires an out-of-band
            # mutation that also bypassed the snapshot CAS.
            return name
        self.table(db, measurement).createOrReplaceTempView(name)
        self._view_states[(db, measurement)] = state
        if not already:
            self._views.setdefault((db, measurement), set()).add(name)
            self.epoch += 1
        return name

    def view_binding(self, name: str) -> tuple[str, str] | None:
        """Reverse lookup: which (db, measurement) a registered view name
        is bound to — lets the RBAC check resolve an unqualified table ref
        back to its real database instead of trusting the name string."""
        for (db, meas), views in self._views.items():
            if name in views:
                return (db, meas)
        return None

    def invalidate(self, db: str, measurement: str) -> None:
        """Re-resolve reads over a measurement after its file set changed
        (compaction/delete/retention/restore). Two caches need clearing:
        the session's shared FileStatusCache (refreshByPath — or a plain
        ``spark.read`` over the same path serves the stale listing), and
        every temp view, which pins the file listing it was created with
        and must be re-registered from a fresh scan. Mirrors the
        reference's post-compaction cache invalidation
        (internal/api/query.go:1049-1053)."""
        for p in self.paths(db, measurement):
            self.spark.catalog.refreshByPath(backend_for(p).spark_url(p))
        for name in self._views.get((db, measurement), set()):
            self.table(db, measurement).createOrReplaceTempView(name)
        self._view_states[(db, measurement)] = \
            self._register_state(db, measurement)
        self.epoch += 1
        # the native-serving decoded-file cache holds committed files
        # too; stat-validation already catches in-place rewrites, this
        # catches everything else the epoch bump is for — scoped to THIS
        # measurement's tiers so invalidating A never cold-starts B's
        # serving (r9 review)
        # trailing separator so 'cpu' never evicts a sibling whose name
        # shares the prefix ('cpu_total') — cached keys are file paths
        # strictly under the measurement root (r9 advice)
        for p in self.paths(db, measurement):
            _scan_cache.evict_prefix(
                backend_for(p).fs_path(p).rstrip("/") + "/")
