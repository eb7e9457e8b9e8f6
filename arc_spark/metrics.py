"""In-memory time-series metrics rings (reference internal/metrics/
timeseries.go: TimeSeriesCollector + TimeSeriesBuffer — behavior kept,
text ours).

Three fixed-size ring buffers — ``system`` (process memory/threads/GC),
``application`` (ingest totals, plan-cache hits, query counts), ``api``
(HTTP request/error totals) — sampled by one daemon thread at a fixed
interval. Ring size = retention/interval, so memory is bounded by
construction. Served at ``GET /api/v1/metrics/timeseries/<type>``
(?duration_minutes=N, clamped to the retention) exactly like the
reference's route.
"""

from __future__ import annotations

import threading
import time
from collections import deque


class TimeSeriesBuffer:
    def __init__(self, size: int):
        self._points: deque[dict] = deque(maxlen=max(size, 1))
        self._lock = threading.Lock()

    def add(self, values: dict, ts: float | None = None) -> None:
        with self._lock:
            self._points.append(
                {"timestamp": ts if ts is not None else time.time(),
                 "values": values})

    def get(self, duration_minutes: int) -> list[dict]:
        cutoff = time.time() - duration_minutes * 60
        with self._lock:
            return [p for p in self._points if p["timestamp"] >= cutoff]


def _system_sample() -> dict:
    import gc
    import resource

    ru = resource.getrusage(resource.RUSAGE_SELF)
    counts = gc.get_count()
    return {
        "threads": threading.active_count(),
        # ru_maxrss is KB on Linux
        "memory_rss_mb": round(ru.ru_maxrss / 1024, 2),
        "cpu_user_s": round(ru.ru_utime, 3),
        "cpu_sys_s": round(ru.ru_stime, 3),
        "gc_gen0": counts[0], "gc_gen1": counts[1], "gc_gen2": counts[2],
    }


class TimeSeriesCollector:
    """One sampling thread feeding the three rings. ``server`` and
    ``ingest`` are read-only sources; the collector never blocks them
    (it snapshots under their own locks via public state)."""

    def __init__(self, server=None, ingest=None, catalog=None,
                 interval_s: float = 10.0, retention_minutes: int = 60):
        size = max(int(retention_minutes * 60 / max(interval_s, 0.1)), 1)
        self.system = TimeSeriesBuffer(size)
        self.application = TimeSeriesBuffer(size)
        self.api = TimeSeriesBuffer(size)
        self.interval_s = interval_s
        self.retention_minutes = retention_minutes
        self._server = server
        self._ingest = ingest
        self._catalog = catalog
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- sampling ---------------------------------------------------------
    def collect_once(self) -> None:
        now = time.time()
        self.system.add(_system_sample(), now)

        app: dict = {}
        ing = self._ingest
        if ing is not None:
            app.update({
                "ingest_rows_acked_total": ing.stats.get("acked", 0),
                "ingest_rows_flushed_total": ing.stats.get("flushed", 0),
                "ingest_flushes_total": ing.stats.get("flushes", 0),
            })
        cat = self._catalog
        if cat is not None:
            stats = getattr(cat, "_prune_cache_stats", None) or {}
            app.update({
                "plan_cache_hits": stats.get("hits", 0),
                "plan_cache_misses": stats.get("misses", 0),
                "catalog_epoch": getattr(cat, "epoch", 0),
            })
        self.application.add(app, now)

        api: dict = {}
        srv = self._server
        if srv is not None:
            with srv._metrics_lock:
                snap = dict(srv.metrics)
            total = sum(snap.values())
            errors = sum(v for k, v in snap.items()
                         if k.rsplit(" ", 1)[-1][:1] in ("4", "5"))
            api.update({"requests_total": total, "errors_total": errors})
        self.api.add(api, now)

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                self.collect_once()
            except Exception:
                pass  # sampling must never take the server down

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "TimeSeriesCollector":
        if self._thread is None:
            self.collect_once()  # first point immediately
            self._thread = threading.Thread(
                target=self._loop, name="arc-ts-metrics", daemon=True)
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    # -- serving -----------------------------------------------------------
    VALID_TYPES = ("system", "application", "api")

    def get(self, metric_type: str, duration_minutes: int = 30) -> list[dict]:
        duration_minutes = max(1, min(int(duration_minutes), 1440))
        buf = {"system": self.system, "application": self.application,
               "api": self.api}.get(metric_type)
        if buf is None:
            raise ValueError(
                f"invalid metric type {metric_type!r}; "
                f"valid: {list(self.VALID_TYPES)}")
        return buf.get(duration_minutes)
