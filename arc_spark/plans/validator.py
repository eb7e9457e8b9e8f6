"""SQL gate: read-only validation and table-reference extraction.

The reference does both with regexes over the SQL string
(A10 /root/reference/internal/api/query.go:677-742,2057-2372 and
A11 query.go:1074-1302) because it never parses SQL. Spark *can* parse to a
logical plan first, so the checks here are structural:

- :func:`validate_read_only` — parse the statement (no execution; commands
  in Spark only run when the plan is *executed*) and reject anything whose
  plan tree contains command/DML/DDL nodes.
- :func:`extract_tables` — collect ``UnresolvedRelation`` names from the
  parsed tree for RBAC batch checks: exact, CTE-aware, comment-proof — all
  the things the reference's regex needed 230 lines to approximate.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession


class SqlValidationError(ValueError):
    pass


# plan-node markers that indicate a non-read statement
_DENY_NODE_MARKERS = (
    "Command",           # SetCommand, AddJarsCommand, all runnable commands
    "CreateTable",
    "CreateView",
    "CreateNamespace",
    "CreateFunction",
    "DropTable",
    "DropView",
    "DropNamespace",
    "DropFunction",
    "AlterTable",
    "AlterView",
    "InsertInto",
    "InsertOverwrite",
    "DeleteFrom",
    "UpdateTable",
    "MergeInto",
    "TruncateTable",
    "RepairTable",
    "RenameTable",
    "RefreshTable",
    "RefreshFunction",
    "CacheTable",
    "UncacheTable",
    "AnalyzeTable",
    "AnalyzeColumn",
    "SetCatalog",
    "SetNamespace",
    "CompoundBody",      # SQL-scripting multi-statement blocks
)

# statements Spark would accept but arc's API must not expose
_DENY_TOKEN_RE = re.compile(
    r"(?is)^\s*(SET|RESET|ADD\s+(JAR|FILE|ARCHIVE)|LIST\s+(JAR|FILE)|"
    r"CREATE|DROP|ALTER|INSERT|UPDATE|DELETE|MERGE|TRUNCATE|GRANT|REVOKE|"
    r"ANALYZE|CACHE|UNCACHE|REFRESH|MSCK|LOAD\s+DATA|CALL|DECLARE|EXECUTE)\b"
)

_ALLOWED_SHOW_RE = re.compile(r"(?is)^\s*SHOW\s+(DATABASES|SCHEMAS|TABLES|MEASUREMENTS)\b")

# datasource names Spark accepts in table position as format.`path` —
# a direct filesystem read that must never reach the session from the API
_DATASOURCE_FORMATS = {
    "parquet", "csv", "json", "orc", "text", "textfile", "avro",
    "binaryfile", "libsvm", "jdbc", "xml", "delta", "iceberg",
}


def _parse_plan(spark: SparkSession, sql: str):
    return spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


# Parsed-plan treeString LRU (r12). One execute() parses the same SQL
# up to three times (read-only validation, RBAC table extraction, the
# native shape detectors), each a ~3-5 ms JVM round-trip — together
# ~8 ms of the 15 ms native time-range budget. parsePlan is purely
# SYNTACTIC (unresolved — no catalog or token state), so the tree
# string is a deterministic function of (SQL text, parser-affecting
# session confs, Spark version). r13 (r12 advice): the cache key
# carries a per-SESSION parser-conf fingerprint — an embedder running
# sessions with different ansi/parser settings gets distinct entries
# instead of stale validation results. The fingerprint is read ONCE
# per SparkSession object (a py4j conf read per call would eat the
# 3-5 ms the cache saves); flipping a parser conf mid-session on the
# SAME session is out of contract (the server never SETs — the
# validator itself blocks SET through the API — and an embedder that
# does so must call invalidate_parse_cache()). Bounded by TOTAL BYTES
# (key+tree), not entry count: 512 × worst-case 64 KB keys + 256 KB
# trees would otherwise pin ~160 MB. Same design point as the A9
# SQL-transform cache (the reference caches its query rewrite per SQL,
# internal/database/cache.go).
import threading as _threading
import weakref as _weakref
from collections import OrderedDict as _OrderedDict

_TREE_CACHE: "_OrderedDict[tuple, str]" = _OrderedDict()
_TREE_CACHE_MAX = 512
_TREE_CACHE_MAX_BYTES = 8 * 1024 * 1024
_TREE_CACHE_BYTES = 0  # guarded by _TREE_LOCK
_TREE_LOCK = _threading.Lock()

# confs that change what parsePlan returns for the same SQL text
_PARSER_CONF_KEYS = (
    "spark.sql.ansi.enabled",
    "spark.sql.ansi.doubleQuotedIdentifiers",
    "spark.sql.ansi.enforceReservedKeywords",
    "spark.sql.legacy.setopsPrecedence.enabled",
)
_SESSION_FPRINT: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
_FPRINT_GEN = 0  # bumped by invalidate_parse_cache(); guarded by _TREE_LOCK


def _parser_fingerprint(spark: SparkSession) -> tuple:
    # Both the get and the re-stamp sit under _TREE_LOCK so
    # invalidate_parse_cache() is atomic w.r.t. in-flight lookups: a
    # request racing an embedder's invalidation could otherwise re-stamp
    # the session's PRE-invalidation fingerprint between the clear and
    # its next parse and re-serve a stale tree. The conf read (py4j
    # round-trip) stays OUTSIDE the lock; the generation snapshot
    # bracketing it means a stamp only lands if NO invalidation ran
    # while the (possibly pre-flip) confs were being read — the loser
    # simply re-reads on its next call.
    with _TREE_LOCK:
        fp = _SESSION_FPRINT.get(spark)
        gen = _FPRINT_GEN
    if fp is None:
        fp = tuple(spark.conf.get(k, None) for k in _PARSER_CONF_KEYS)
        with _TREE_LOCK:
            cached = _SESSION_FPRINT.get(spark)
            if cached is not None:
                return cached
            if _FPRINT_GEN == gen:
                _SESSION_FPRINT[spark] = fp
    return fp


def invalidate_parse_cache() -> None:
    """Drop all cached parse trees and session fingerprints (for
    embedders that flip parser confs on a live session). Atomic with
    respect to concurrent _parser_fingerprint() stamps (same lock)."""
    global _TREE_CACHE_BYTES, _FPRINT_GEN
    with _TREE_LOCK:
        _TREE_CACHE.clear()
        _TREE_CACHE_BYTES = 0
        _SESSION_FPRINT.clear()
        _FPRINT_GEN += 1


# don't let one pathological request pin megabytes in the LRU: a giant
# generated SQL (or its proportionally giant tree) bypasses the cache —
# repeated dashboards, the case the cache exists for, are short
_TREE_CACHE_MAX_ITEM = 64 * 1024


def plan_tree_string(spark: SparkSession, sql: str) -> str:
    """``parsePlan(sql).treeString()`` through the process-wide LRU.
    Parse failures are not cached (the error path is not hot and the
    exception detail should come from the live parser)."""
    global _TREE_CACHE_BYTES
    cacheable = len(sql) <= _TREE_CACHE_MAX_ITEM
    if cacheable:
        key = (_parser_fingerprint(spark), sql)
        with _TREE_LOCK:
            tree = _TREE_CACHE.get(key)
            if tree is not None:
                _TREE_CACHE.move_to_end(key)
                return tree
    tree = _parse_plan(spark, sql).treeString()
    if cacheable and len(tree) <= 4 * _TREE_CACHE_MAX_ITEM:
        entry_bytes = len(sql) + len(tree)
        with _TREE_LOCK:
            old = _TREE_CACHE.pop(key, None)
            if old is not None:
                _TREE_CACHE_BYTES -= len(sql) + len(old)
            _TREE_CACHE[key] = tree
            _TREE_CACHE_BYTES += entry_bytes
            while _TREE_CACHE and (
                    len(_TREE_CACHE) > _TREE_CACHE_MAX
                    or _TREE_CACHE_BYTES > _TREE_CACHE_MAX_BYTES):
                (_, esql), etree = _TREE_CACHE.popitem(last=False)
                _TREE_CACHE_BYTES -= len(esql) + len(etree)
    return tree


# EXPLAIN [mode] <statement>: read-only iff the inner statement is —
# validated by recursion, so EXPLAIN INSERT is rejected like INSERT.
# (The plan walk alone would deny every EXPLAIN: its node is
# ExplainCommand, and "Command" is the deny marker.)
_EXPLAIN_RE = re.compile(
    r"(?is)^\s*EXPLAIN\s+(?:(?:EXTENDED|CODEGEN|COST|FORMATTED)\s+)?(.+)$")


def _strip_explain(sql: str) -> str | None:
    """The statement under an EXPLAIN prefix, or None when `sql` is not
    an EXPLAIN."""
    m = _EXPLAIN_RE.match(sql)
    return m.group(1) if m else None


def validate_read_only(spark: SparkSession, sql: str) -> None:
    """Raise :class:`SqlValidationError` unless `sql` is a read-only query
    (SELECT/WITH/VALUES/EXPLAIN/DESCRIBE and the SHOW forms arc allows)."""
    if ";" in re.sub(r"(?s)'[^']*'|\"[^\"]*\"|--[^\n]*|/\*.*?\*/", "", sql).rstrip().rstrip(";"):
        raise SqlValidationError("multi-statement requests are not allowed")
    if _ALLOWED_SHOW_RE.match(sql):
        return
    if _DENY_TOKEN_RE.match(sql):
        raise SqlValidationError("only read-only queries are allowed")
    inner = _strip_explain(sql)
    if inner is not None:
        return validate_read_only(spark, inner)
    try:
        tree = plan_tree_string(spark, sql)
    except Exception as e:  # parse error → surface as validation error
        raise SqlValidationError(f"SQL parse error: {e}") from None
    for line in tree.splitlines():
        node = line.lstrip(" :+-*")
        name = node.split(" ", 1)[0].split("[", 1)[0]
        for marker in _DENY_NODE_MARKERS:
            if marker in name:
                raise SqlValidationError(
                    f"statement is not read-only (plan node {name})"
                )
    # Spark's direct-path table syntax (SELECT * FROM text.`/etc/passwd`)
    # reads ANY file the process can see — the arbitrary-file-read the
    # reference's DuckDB I/O sandbox closes. Tables must resolve through
    # the catalog: refuse relations that name a datasource format or
    # carry a path-shaped segment.
    for m in _RELATION_RE.finditer(tree):
        parts = [p.strip() for p in m.group(1).split(",")]
        if (any("/" in p or "\\" in p for p in parts)
                or (len(parts) >= 2
                    and parts[0].lower() in _DATASOURCE_FORMATS)):
            raise SqlValidationError(
                "direct-path table references (format.`path`) are not "
                "allowed; query registered measurements")


_RELATION_RE = re.compile(r"'UnresolvedRelation \[([^\]]+)\]")


def extract_tables(spark: SparkSession, sql: str) -> list[tuple[str, ...]]:
    """All table references in `sql` as name tuples (db, table) or (table,).

    CTE names are parsed as UnresolvedRelation too until analysis; they are
    filtered out by matching against the WITH clause's definitions — same
    semantics the reference implements by regex (query.go:1074-1302).
    EXPLAIN prefixes are stripped so RBAC sees the inner statement's
    tables (ExplainCommand prints its child as one argument line that
    the relation regex cannot be trusted to cover)."""
    inner = _strip_explain(sql)
    if inner is not None:
        return extract_tables(spark, inner)
    tree = plan_tree_string(spark, sql)
    refs = []
    for m in _RELATION_RE.finditer(tree):
        parts = tuple(p.strip() for p in m.group(1).split(","))
        refs.append(parts)
    cte_names = set(re.findall(r"CTE \[([^\]]+)\]", tree))
    cte_defs: set[str] = set()
    for grp in cte_names:
        cte_defs.update(n.strip() for n in grp.split(","))
    out, seen = [], set()
    for r in refs:
        if len(r) == 1 and r[0] in cte_defs:
            continue
        if r not in seen:
            seen.add(r)
            out.append(r)
    return out
