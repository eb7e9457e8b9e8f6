"""Maintenance scheduler (reference internal/scheduler): interval jobs
with jitter, failure isolation, manual trigger, status; engine-wired
registrars for compaction/retention/CQ/reconcile; HTTP surface."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from arc_spark.scheduler import MaintenanceScheduler


def _wait_until(cond, timeout_s=15.0):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.05)
    return False


class TestMaintenanceScheduler:
    def test_runs_on_interval(self):
        sched = MaintenanceScheduler(poll_interval_s=0.05)
        hits = []
        sched.add_job("tick", lambda: hits.append(1) or {"n": len(hits)},
                      interval_s=0.1, jitter_frac=0)
        sched.start()
        try:
            assert _wait_until(lambda: len(hits) >= 3)
        finally:
            sched.stop()
        st = sched.status()[0]
        assert st["runs"] >= 3 and st["failures"] == 0
        assert st["last_error"] is None and st["last_duration_s"] is not None

    def test_failure_recorded_schedule_continues(self):
        sched = MaintenanceScheduler(poll_interval_s=0.05)
        calls = []

        def flaky():
            calls.append(1)
            if len(calls) == 1:
                raise RuntimeError("boom")
            return "ok"

        sched.add_job("flaky", flaky, interval_s=0.1, jitter_frac=0)
        sched.start()
        try:
            assert _wait_until(lambda: len(calls) >= 2)
        finally:
            sched.stop()
        st = sched.status()[0]
        assert st["failures"] == 1 and st["runs"] >= 2

    def test_trigger_now(self):
        sched = MaintenanceScheduler()
        sched.add_job("manual", lambda: 42, interval_s=3600)
        assert sched.trigger_now("manual") == 42
        with pytest.raises(KeyError):
            sched.trigger_now("nope")

    def test_trigger_now_propagates_error(self):
        sched = MaintenanceScheduler()

        def bad():
            raise ValueError("nope")

        sched.add_job("bad", bad, interval_s=3600)
        with pytest.raises(RuntimeError):
            sched.trigger_now("bad")
        assert sched.status()[0]["failures"] == 1

    def test_duplicate_job_rejected(self):
        sched = MaintenanceScheduler()
        sched.add_job("x", lambda: None, 60)
        with pytest.raises(ValueError):
            sched.add_job("x", lambda: None, 60)
        assert sched.remove_job("x") and not sched.remove_job("x")

    def test_jitter_bounds_next_due(self):
        sched = MaintenanceScheduler()
        sched.add_job("j", lambda: None, interval_s=100, jitter_frac=0.1)
        due = sched.status()[0]["next_due_in_s"]
        assert 89 <= due <= 111

    def test_engine_wired_compaction_and_retention(self, spark, tmp_path):
        # real compaction/retention jobs against a real measurement tree
        from arc_spark.api import IngestService

        root = str(tmp_path)
        svc = IngestService(spark, root, max_buffer_rows=10**9,
                            max_buffer_age_s=10**9)
        for i in range(3):
            svc.write_line_protocol(
                "metrics",
                f"cpu,host=h{i} usage={i} 1700000000000000000\n".encode())
            svc.flush()
        sched = MaintenanceScheduler()
        sched.schedule_compaction(spark, root, "metrics", "cpu",
                                  interval_s=3600, min_files=2,
                                  min_age_seconds=0)
        sched.schedule_retention(root, "metrics", "cpu",
                                 retention_days=36500, interval_s=3600)
        out = sched.trigger_now("compaction:metrics.cpu")
        assert out and not out[0]["skipped"]
        assert sched.trigger_now("retention:metrics.cpu") == {"removed": []}

    def test_schedule_cq_tick(self, spark, tmp_path):
        from arc_spark.streaming.cq import CQScheduler

        sched = MaintenanceScheduler()
        sched.schedule_cq(CQScheduler(spark, str(tmp_path)), interval_s=3600)
        assert sched.trigger_now("continuous_queries") == []

    def test_schedule_reconcile(self, tmp_path):
        from arc_spark.operators.reconciliation import Reconciler

        sched = MaintenanceScheduler()
        sched.schedule_reconcile(Reconciler(str(tmp_path)), interval_s=3600)
        out = sched.trigger_now("reconcile")
        assert out["dry_run"] is True


def _req(port, path, method="GET", token=None, body=None, timeout=180):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method=method)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, resp.read()


class TestSchedulerRoutes:
    @pytest.fixture()
    def live_sched(self, spark, tmp_path):
        from arc_spark.api import QueryService
        from arc_spark.auth import AuthStore
        from arc_spark.catalog import MeasurementCatalog
        from arc_spark.server import ArcServer

        cat = MeasurementCatalog(spark, str(tmp_path / "data"))
        auth = AuthStore(str(tmp_path / "auth.db"))
        admin = auth.create_token("admin")
        sched = MaintenanceScheduler()
        sched.add_job("demo", lambda: {"ok": True}, interval_s=3600)
        server = ArcServer(QueryService(spark, cat), None, auth,
                           scheduler=sched).start()
        try:
            yield server.port, admin
        finally:
            server.stop()

    def test_status_and_trigger(self, live_sched):
        port, admin = live_sched
        status, body = _req(port, "/api/v1/scheduler/status", token=admin)
        jobs = json.loads(body)["jobs"]
        assert [j["name"] for j in jobs] == ["demo"]
        status, body = _req(port, "/api/v1/scheduler/jobs/demo/run", "POST",
                            admin, b"")
        assert status == 200 and json.loads(body)["result"] == {"ok": True}
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(port, "/api/v1/scheduler/jobs/ghost/run", "POST", admin, b"")
        assert e.value.code == 404


class TestEndpointMetrics:
    def test_endpoint_latency_summary(self, spark, tmp_path):
        from arc_spark.api import QueryService
        from arc_spark.auth import AuthStore
        from arc_spark.catalog import MeasurementCatalog
        from arc_spark.server import ArcServer

        cat = MeasurementCatalog(spark, str(tmp_path / "data"))
        auth = AuthStore(str(tmp_path / "auth.db"))
        admin = auth.create_token("admin")
        server = ArcServer(QueryService(spark, cat), None, auth).start()
        try:
            for _ in range(3):
                _req(server.port, "/health")
            status, body = _req(server.port, "/api/v1/metrics/endpoints",
                                token=admin)
            eps = json.loads(body)["endpoints"]
            assert eps["GET /health"]["count"] == 3
            assert eps["GET /health"]["avg_ms"] >= 0
            assert eps["GET /health"]["max_ms"] >= eps["GET /health"]["avg_ms"]
        finally:
            server.stop()


class TestImportStats:
    def test_import_and_stats_routes(self, spark, tmp_path):
        from arc_spark.api import IngestService, QueryService
        from arc_spark.auth import AuthStore
        from arc_spark.catalog import MeasurementCatalog
        from arc_spark.server import ArcServer

        root = str(tmp_path / "data")
        ingest = IngestService(spark, root, max_buffer_rows=10**9,
                               max_buffer_age_s=10**9)
        cat = MeasurementCatalog(spark, root)
        auth = AuthStore(str(tmp_path / "auth.db"))
        admin = auth.create_token("admin")
        server = ArcServer(QueryService(spark, cat), ingest, auth).start()
        try:
            _req(server.port, "/api/v1/import/lp?db=metrics", "POST", admin,
                 b"cpu,host=a usage=1 1700000000000000000\n"
                 b"cpu,host=b usage=2 1700000060000000000\n")
            _req(server.port, "/api/v1/import/tle?db=sat", "POST", admin,
                 b"ISS (ZARYA)\n"
                 b"1 25544U 98067A   08264.51782528 -.00002182  00000-0"
                 b" -11606-4 0  2927\n"
                 b"2 25544  51.6416 247.4627 0006703 130.5360 325.0288"
                 b" 15.72125391563537\n")
            status, body = _req(server.port, "/api/v1/import/stats",
                                token=admin)
            st = json.loads(body)["imports"]
            assert st["lp"] == {"files": 1, "rows": 2}
            assert st["tle"]["rows"] == 1
            status, body = _req(server.port, "/api/v1/write/tle/stats",
                                token=admin)
            assert json.loads(body)["rows"] == 1
            status, body = _req(server.port, "/api/v1/write/msgpack/stats",
                                token=admin)
            assert json.loads(body)["acked"] >= 2  # lp import counts acked
        finally:
            server.stop()
