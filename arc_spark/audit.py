"""Audit logging (reference internal/audit/audit.go + middleware.go):
SQLite-persisted audit trail of auditable HTTP actions.

Shape matches the reference:

- Events are queued on a bounded channel and batch-inserted by a
  background writer (batch of 100 or 1 s tick, audit.go writerLoop);
  a full queue DROPS the event rather than blocking the request path
  (audit.go LogEvent's non-blocking select).
- A retention loop deletes entries older than ``retention_days`` once
  per day and once at startup (audit.go retentionLoop). No
  incremental_vacuum — pages freed by the DELETE are reused by later
  inserts, which is what actually bounds file growth (the reference's
  initSchema comment records this lesson; behavior kept, text ours).
- ``query`` supports event_type/actor/database/since/until filters with
  a 100-default / 10k-max LIMIT and OFFSET paging (audit.go Query);
  ``stats`` returns per-event-type counts (audit.go Stats).
- Event classification from (method, path, status): 401/403 →
  ``auth.failed``; token routes → ``token.*``; query routes →
  ``query.executed``; writes/imports → ``data.write``; delete/retention
  → lifecycle events (middleware.go classifyEvent).

The store may share a SQLite file with :class:`arc_spark.auth.AuthStore`
(the reference shares the auth DB) or live in its own; both see the
``audit_logs`` table created idempotently.
"""

from __future__ import annotations

import json
import queue
import sqlite3
import threading
import time

_EXCLUDED_PATHS = {
    "/health",
    "/healthz",
    "/metrics",
    "/api/v1/logs",
    "/api/v1/ready",
    "/api/v1/audit",
    "/api/v1/audit/stats",
}

_SCHEMA = """
CREATE TABLE IF NOT EXISTS audit_logs (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    timestamp REAL NOT NULL,
    event_type TEXT NOT NULL,
    actor TEXT,
    method TEXT NOT NULL,
    path TEXT NOT NULL,
    database_name TEXT,
    measurement TEXT,
    status_code INTEGER,
    ip_address TEXT,
    user_agent TEXT,
    duration_ms INTEGER,
    detail TEXT
);
CREATE INDEX IF NOT EXISTS idx_audit_timestamp ON audit_logs(timestamp);
CREATE INDEX IF NOT EXISTS idx_audit_event_type ON audit_logs(event_type);
CREATE INDEX IF NOT EXISTS idx_audit_actor ON audit_logs(actor);
CREATE INDEX IF NOT EXISTS idx_audit_database ON audit_logs(database_name);
"""


def classify_event(method: str, path: str, status_code: int) -> str:
    """Event type from the request line (middleware.go classifyEvent)."""
    if status_code in (401, 403):
        return "auth.failed"
    if path.startswith("/api/v1/auth/tokens"):
        if method == "POST":
            return "token.rotated" if path.endswith("/rotate") else "token.created"
        if method == "DELETE":
            return "token.deleted"
        return "token.listed"
    if path.startswith("/api/v1/query"):
        return "query.executed"
    if path.startswith("/api/v1/write") or path.startswith("/api/v1/import"):
        return "data.write"
    if path == "/api/v1/delete":
        return "data.delete"
    if path == "/api/v1/retention":
        return "retention.executed"
    if path == "/api/v1/compaction":
        return "compaction.executed"
    if path in ("/api/v1/backup", "/api/v1/restore"):
        return "backup.executed"
    if path == "/api/v1/reconcile":
        return "reconcile.executed"
    if path.startswith("/api/v1/databases") and method in ("POST", "DELETE"):
        return "database.modified"
    if method == "GET":
        return "data.read"
    return "admin.action"


class AuditLogger:
    """Async batched audit writer over SQLite.

    ``log_event`` never blocks: events ride a bounded queue (1000, like
    the reference's channel) and the writer thread batch-inserts them.
    """

    def __init__(self, path: str = ":memory:", retention_days: int = 90,
                 include_reads: bool = False, batch_size: int = 100,
                 flush_interval_s: float = 1.0):
        self._db = sqlite3.connect(path, check_same_thread=False)
        self._db_lock = threading.Lock()
        with self._db_lock:
            self._db.executescript(_SCHEMA)
            self._db.commit()
        self.retention_days = retention_days
        self.include_reads = include_reads
        self.batch_size = batch_size
        self.flush_interval_s = flush_interval_s
        self.dropped = 0  # events lost to a full queue (observable)
        self._q: "queue.Queue[dict | None]" = queue.Queue(maxsize=1000)
        # queued-but-not-yet-committed count; lets flush() offer
        # read-your-writes to the audit query routes without blocking the
        # request path (the reference's tests poll; ours can be exact)
        self._pending = 0
        self._pending_cv = threading.Condition()
        self._stop = threading.Event()
        self._writer = threading.Thread(target=self._writer_loop, daemon=True)
        self._last_cleanup = 0.0
        self.cleanup_old_entries()  # startup cleanup (retentionLoop)
        self._writer.start()

    # -- ingest path ----------------------------------------------------
    def log_event(self, event: dict) -> None:
        event.setdefault("timestamp", time.time())
        try:
            self._q.put_nowait(event)
        except queue.Full:
            # under the same cv-lock discipline as _pending: GIL-safe
            # today, but the class is lock-disciplined everywhere else
            with self._pending_cv:
                self.dropped += 1
            return
        with self._pending_cv:
            self._pending += 1

    def _writer_loop(self) -> None:
        batch: list[dict] = []
        while True:
            try:
                ev = self._q.get(timeout=self.flush_interval_s)
            except queue.Empty:
                ev = None
            if ev is not None:
                batch.append(ev)
            if batch and (ev is None or len(batch) >= self.batch_size):
                self._flush(batch)
                batch = []
            # daily retention tick, piggybacked on the writer loop (the
            # reference runs a second goroutine; one thread suffices here)
            if time.time() - self._last_cleanup > 86400:
                self.cleanup_old_entries()
            if self._stop.is_set():
                # drain whatever is still queued, then exit
                while True:
                    try:
                        batch.append(self._q.get_nowait())
                    except queue.Empty:
                        break
                if batch:
                    self._flush(batch)
                return

    def _flush(self, batch: list[dict]) -> None:
        rows = [(
            e.get("timestamp"), e.get("event_type", ""), e.get("actor"),
            e.get("method", ""), e.get("path", ""), e.get("database"),
            e.get("measurement"), e.get("status_code"), e.get("ip_address"),
            e.get("user_agent"), e.get("duration_ms"),
            json.dumps(e["detail"]) if e.get("detail") else None,
        ) for e in batch]
        with self._db_lock:
            self._db.executemany(
                "INSERT INTO audit_logs (timestamp, event_type, actor, method,"
                " path, database_name, measurement, status_code, ip_address,"
                " user_agent, duration_ms, detail)"
                " VALUES (?,?,?,?,?,?,?,?,?,?,?,?)", rows)
            self._db.commit()
        with self._pending_cv:
            self._pending -= len(batch)
            self._pending_cv.notify_all()

    def flush(self, timeout_s: float = 5.0) -> None:
        """Drain the queue and wait until everything queued so far is
        committed — including a batch the writer thread already holds."""
        batch = []
        while True:
            try:
                batch.append(self._q.get_nowait())
            except queue.Empty:
                break
        if batch:
            self._flush(batch)
        with self._pending_cv:
            self._pending_cv.wait_for(lambda: self._pending <= 0,
                                      timeout=timeout_s)

    def stop(self) -> None:
        self._stop.set()
        self._writer.join(timeout=5)

    # -- retention ------------------------------------------------------
    def cleanup_old_entries(self) -> int:
        self._last_cleanup = time.time()
        if self.retention_days <= 0:
            return 0
        cutoff = time.time() - self.retention_days * 86400
        with self._db_lock:
            cur = self._db.execute(
                "DELETE FROM audit_logs WHERE timestamp < ?", (cutoff,))
            self._db.commit()
            return cur.rowcount

    # -- read path ------------------------------------------------------
    _COLS = ("id", "timestamp", "event_type", "actor", "method", "path",
             "database_name", "measurement", "status_code", "ip_address",
             "user_agent", "duration_ms", "detail")

    def query(self, event_type: str = "", actor: str = "", database: str = "",
              since: float | None = None, until: float | None = None,
              limit: int = 100, offset: int = 0) -> list[dict]:
        sql = "SELECT %s FROM audit_logs WHERE 1=1" % ", ".join(self._COLS)
        args: list = []
        for cond, val in (("event_type = ?", event_type), ("actor = ?", actor),
                          ("database_name = ?", database)):
            if val:
                sql += " AND " + cond
                args.append(val)
        if since is not None:
            sql += " AND timestamp >= ?"
            args.append(since)
        if until is not None:
            sql += " AND timestamp <= ?"
            args.append(until)
        sql += " ORDER BY timestamp DESC LIMIT ?"
        args.append(max(1, min(limit if limit > 0 else 100, 10000)))
        if offset > 0:
            sql += " OFFSET ?"
            args.append(offset)
        with self._db_lock:
            rows = self._db.execute(sql, args).fetchall()
        return [dict(zip(self._COLS, r)) for r in rows]

    def stats(self, since: float | None = None) -> dict[str, int]:
        sql = "SELECT event_type, COUNT(*) FROM audit_logs"
        args: list = []
        if since is not None:
            sql += " WHERE timestamp >= ?"
            args.append(since)
        sql += " GROUP BY event_type ORDER BY COUNT(*) DESC"
        with self._db_lock:
            return dict(self._db.execute(sql, args).fetchall())

    # -- middleware hook ------------------------------------------------
    def record_request(self, method: str, path: str, status_code: int,
                       actor: str = "anonymous", database: str = "",
                       measurement: str = "", ip_address: str = "",
                       user_agent: str = "", duration_ms: int = 0,
                       detail: dict | None = None) -> None:
        """The server calls this per response (middleware.go Middleware):
        excluded paths are never audited; GETs only when include_reads."""
        if path in _EXCLUDED_PATHS:
            return
        if method == "GET" and not self.include_reads:
            return
        self.log_event({
            "event_type": classify_event(method, path, status_code),
            "actor": actor or "anonymous",
            "method": method,
            "path": path,
            "database": database or None,
            "measurement": measurement or None,
            "status_code": status_code,
            "ip_address": ip_address,
            "user_agent": (user_agent or "")[:256],
            "duration_ms": duration_ms,
            "detail": detail,
        })
