"""MQTT subscription manager + REST surface (reference internal/mqtt
subscription store + internal/api/mqtt_subscriptions.go). Broker-free:
lifecycle runs against an injected fake subscriber; the PahoSubscriber
path stays live-broker-gated in test_tiering_mqtt.py."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from arc_spark.sources.mqtt_subscriptions import (
    MqttValidationError,
    SubscriptionManager,
    SubscriptionNotFound,
    SubscriptionRepository,
    SubscriptionRunning,
    build_encryptor,
    generate_encryption_key,
)


class FakeSubscriber:
    def __init__(self):
        self.started = False
        self.stats = {"messages_received": 3, "messages_failed": 1,
                      "bytes_received": 64, "reconnects": 0}

    def start(self):
        self.started = True

    def stop(self):
        self.started = False


def _mgr(tmp_path, key="auto"):
    if key == "auto":
        key = generate_encryption_key()
    fakes = []

    def factory(sub, password):
        fakes.append((sub.id, password, FakeSubscriber()))
        return fakes[-1][2]

    mgr = SubscriptionManager(
        SubscriptionRepository(str(tmp_path / "subs.db")),
        encryptor=build_encryptor(key),
        subscriber_factory=factory)
    return mgr, fakes


REQ = {"name": "plant-a", "broker": "tcp://broker:1883",
       "topics": ["sensors/+/cpu"], "database": "iot", "qos": 1}


class TestManager:
    def test_crud_roundtrip_and_validation(self, tmp_path):
        mgr, _ = _mgr(tmp_path)
        sub = mgr.create(dict(REQ), password="s3cret")
        got = mgr.get(sub.id)
        assert got.name == "plant-a" and got.topics == ["sensors/+/cpu"]
        # password never appears in the public dict or plaintext in the db
        pub = got.to_public()
        assert pub.get("has_password") is True
        assert "s3cret" not in json.dumps(pub)
        assert "password_encrypted" not in pub
        raw = open(tmp_path / "subs.db", "rb").read()
        assert b"s3cret" not in raw
        mgr.update(sub.id, {"name": "plant-b", "qos": 2})
        assert mgr.get(sub.id).name == "plant-b"
        assert len(mgr.list()) == 1
        mgr.delete(sub.id)
        with pytest.raises(SubscriptionNotFound):
            mgr.get(sub.id)
        with pytest.raises(MqttValidationError):
            mgr.create({"name": "x", "broker": "", "topics": []})
        # no encryption key configured + password → loud validation error
        (tmp_path / "nokey").mkdir()
        bare, _ = _mgr(tmp_path / "nokey", key=None)
        with pytest.raises(MqttValidationError, match="encryption key"):
            bare.create(dict(REQ), password="pw")

    def test_password_encryption_roundtrip(self, tmp_path):
        key = generate_encryption_key()
        mgr, fakes = _mgr(tmp_path, key=key)
        sub = mgr.create(dict(REQ), password="hunter2")
        mgr.start(sub.id)
        # the subscriber factory received the DECRYPTED password
        assert fakes[-1][1] == "hunter2"
        assert mgr.get(sub.id).password_encrypted not in ("", "hunter2")

    def test_lifecycle_and_guards(self, tmp_path):
        mgr, fakes = _mgr(tmp_path)
        sub = mgr.create(dict(REQ))
        mgr.start(sub.id)
        assert mgr.get(sub.id).status == "running"
        assert fakes[-1][2].started
        with pytest.raises(SubscriptionRunning):
            mgr.update(sub.id, {"name": "nope"})
        st = mgr.stats(sub.id)
        assert st["messages_received"] == 3 and st["messages_failed"] == 1
        mgr.pause(sub.id)
        assert mgr.get(sub.id).status == "paused"
        mgr.restart(sub.id)
        assert mgr.get(sub.id).status == "running"
        mgr.stop(sub.id)
        assert mgr.get(sub.id).status == "stopped"
        # delete stops implicitly when running
        mgr.start(sub.id)
        mgr.delete(sub.id)
        assert mgr.list() == []

    def test_auto_start_and_shutdown(self, tmp_path):
        mgr, fakes = _mgr(tmp_path)
        a = mgr.create(dict(REQ, name="a", auto_start=True))
        mgr.create(dict(REQ, name="b"))
        started = mgr.start_auto()
        assert started == [a.id]
        mgr.shutdown()
        assert mgr.get(a.id).status == "stopped"


class TestHttpSurface:
    @pytest.fixture()
    def live(self, spark, tmp_path):
        from arc_spark.api import IngestService, QueryService
        from arc_spark.auth import AuthStore
        from arc_spark.catalog import MeasurementCatalog
        from arc_spark.server import ArcServer

        root = str(tmp_path / "data")
        ing = IngestService(spark, root, max_buffer_rows=10**9,
                            max_buffer_age_s=10**9)
        auth = AuthStore(str(tmp_path / "auth.db"))
        admin = auth.create_token("admin")
        limited = auth.create_token("lim", allowed_tables=["x"])
        server = ArcServer(
            QueryService(spark, MeasurementCatalog(spark, root)),
            ing, auth).start()
        mgr, fakes = _mgr(tmp_path)
        server.mqtt_subs = mgr
        try:
            yield server.port, admin, limited, fakes
        finally:
            server.stop()

    def _req(self, port, path, method="GET", token=None, body=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=body, method=method)
        if token:
            req.add_header("Authorization", f"Bearer {token}")
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read() or b"{}")

    def test_crud_lifecycle_over_http(self, live):
        port, admin, _limited, fakes = live
        status, sub = self._req(
            port, "/api/v1/mqtt/subscriptions", "POST", admin,
            json.dumps(dict(REQ, password="pw")).encode())
        assert status == 201 and sub["status"] in ("created", "stopped")
        sid = sub["id"]
        _, listing = self._req(port, "/api/v1/mqtt/subscriptions",
                               token=admin)
        assert [s["id"] for s in listing["subscriptions"]] == [sid]
        status, started = self._req(
            port, f"/api/v1/mqtt/subscriptions/{sid}/start", "POST",
            admin, b"")
        assert status == 200 and started["status"] == "running"
        assert fakes[-1][1] == "pw"  # decrypted for the subscriber
        _, st = self._req(port,
                          f"/api/v1/mqtt/subscriptions/{sid}/stats",
                          token=admin)
        assert st["messages_received"] == 3
        # update while running → 409
        with pytest.raises(urllib.error.HTTPError) as e:
            self._req(port, f"/api/v1/mqtt/subscriptions/{sid}", "POST",
                      admin, json.dumps({"name": "n2"}).encode())
        assert e.value.code == 409
        self._req(port, f"/api/v1/mqtt/subscriptions/{sid}/stop",
                  "POST", admin, b"")
        status, upd = self._req(
            port, f"/api/v1/mqtt/subscriptions/{sid}", "POST", admin,
            json.dumps({"name": "n2"}).encode())
        assert upd["name"] == "n2"
        status, _ = self._req(port, f"/api/v1/mqtt/subscriptions/{sid}",
                              "DELETE", admin)
        assert status == 200
        with pytest.raises(urllib.error.HTTPError) as e:
            self._req(port, f"/api/v1/mqtt/subscriptions/{sid}",
                      token=admin)
        assert e.value.code == 404

    def test_auth_and_validation_errors(self, live):
        port, admin, limited, _ = live
        with pytest.raises(urllib.error.HTTPError) as e:
            self._req(port, "/api/v1/mqtt/subscriptions", token=limited)
        assert e.value.code == 403
        with pytest.raises(urllib.error.HTTPError) as e:
            self._req(port, "/api/v1/mqtt/subscriptions", "POST", admin,
                      json.dumps({"name": "x"}).encode())
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            self._req(port, "/api/v1/mqtt/subscriptions/zzz/start",
                      "POST", admin, b"")
        assert e.value.code == 404

    def test_unconfigured_503(self, spark, tmp_path):
        from arc_spark.api import IngestService, QueryService
        from arc_spark.auth import AuthStore
        from arc_spark.catalog import MeasurementCatalog
        from arc_spark.server import ArcServer

        root = str(tmp_path / "d2")
        auth = AuthStore(str(tmp_path / "a2.db"))
        admin = auth.create_token("admin")
        server = ArcServer(
            QueryService(spark, MeasurementCatalog(spark, root)),
            IngestService(spark, root, max_buffer_rows=10**9,
                          max_buffer_age_s=10**9), auth).start()
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                self._req(server.port, "/api/v1/mqtt/subscriptions",
                          token=admin)
            assert e.value.code == 503
        finally:
            server.stop()


class TestConfigWiring:
    def test_mqtt_enabled_wires_manager(self, spark, tmp_path):
        from arc_spark.config import build_engine, load_config, shutdown

        root = str(tmp_path / "data")
        cfg = load_config(None, env={
            "ARC_STORAGE_LOCAL_PATH": root,
            "ARC_SERVER_PORT": "0",
            "ARC_MQTT_ENABLED": "true",
            "ARC_MQTT_DB_PATH": str(tmp_path / "subs.db"),
            "ARC_METRICS_TIMESERIES_ENABLED": "false",
        })
        engine = build_engine(cfg, spark=spark)
        try:
            mgr = engine["server"].mqtt_subs
            assert mgr is not None
            sub = mgr.create(dict(REQ))
            assert mgr.get(sub.id).broker == REQ["broker"]
        finally:
            shutdown(engine)
