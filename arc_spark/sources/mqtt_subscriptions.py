"""Managed MQTT subscriptions: persisted configs, lifecycle, encrypted
credentials (reference ``internal/mqtt/``: subscription.go model +
validation, repository.go SQLite persistence, manager.go lifecycle,
encryption.go AES-256-GCM password storage,
``internal/api/mqtt_subscriptions.go`` REST surface). Behavior kept,
code ours.

Contracts preserved from the reference:

- QoS resolution (#326): an omitted QoS defaults to 1 (at-least-once);
  an EXPLICIT 0 is kept — no code path may rewrite a persisted 0 to 1.
- Broker URL must use tcp/ssl/ws/wss/mqtt/mqtts and carry a host.
- Passwords encrypt with AES-256-GCM under a 32-byte key from
  ``ARC_ENCRYPTION_KEY`` (base64); without a key, creating a
  subscription WITH a password is rejected (never store plaintext).
- A RUNNING subscription can't be updated — stop it first.
- Stats timestamps are emitted only when real (#546).

The broker client itself is pluggable: the default factory attaches
paho-mqtt (absent in this environment → a clear error that lands in the
subscription's error state, same as the reference's failed connect);
tests inject a fake subscriber factory. Message handling routes through
the existing :class:`arc_spark.sources.mqtt.MqttIngestBridge` decode →
hour-partitioned write path.
"""

from __future__ import annotations

import base64
import json
import os
import secrets
import sqlite3
import threading
import time
import uuid
from dataclasses import dataclass, field
from urllib.parse import urlparse

MAX_NAME_LEN = 128
MAX_BROKER_URL_LEN = 512
MAX_CLIENT_ID_LEN = 128
MAX_TOPICS = 64
MAX_TOPIC_LENGTH = 256
DEFAULT_QOS = 1

_VALID_SCHEMES = ("tcp", "ssl", "ws", "wss", "mqtt", "mqtts")

STATUS_STOPPED = "stopped"
STATUS_RUNNING = "running"
STATUS_ERROR = "error"
STATUS_PAUSED = "paused"


class MqttValidationError(Exception):
    """Bad subscription config (HTTP 400)."""


class SubscriptionConflict(Exception):
    """Unique-name collision (HTTP 409)."""


class SubscriptionRunning(Exception):
    """Update refused while running (HTTP 409)."""


class SubscriptionNotFound(Exception):
    """Unknown id (HTTP 404)."""


# -- password encryption (reference encryption.go) ------------------------

class AESGCMEncryptor:
    """AES-256-GCM, nonce||ciphertext base64 (reference AESEncryptor)."""

    def __init__(self, key: bytes):
        if len(key) != 32:
            raise ValueError(f"encryption key must be 32 bytes, got {len(key)}")
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        self._gcm = AESGCM(key)

    def encrypt(self, plaintext: str) -> str:
        nonce = secrets.token_bytes(12)
        ct = self._gcm.encrypt(nonce, plaintext.encode(), None)
        return base64.b64encode(nonce + ct).decode()

    def decrypt(self, ciphertext: str) -> str:
        raw = base64.b64decode(ciphertext)
        return self._gcm.decrypt(raw[:12], raw[12:], None).decode()


class NoPasswordEncryptor:
    """Key absent: refuse to store secrets (reference NoPasswordEncryptor
    semantics — passwords are REJECTED, never stored in the clear)."""

    def encrypt(self, plaintext: str) -> str:
        raise MqttValidationError(
            "password provided but no encryption key configured"
            " (set ARC_ENCRYPTION_KEY)")

    def decrypt(self, ciphertext: str) -> str:
        raise MqttValidationError("no encryption key configured")


def parse_encryption_key(encoded: str) -> bytes:
    try:
        key = base64.b64decode(encoded, validate=True)
    except Exception:
        raise ValueError("encryption key must be base64")
    if len(key) != 32:
        raise ValueError(f"encryption key must decode to 32 bytes, got {len(key)}")
    return key


def generate_encryption_key() -> str:
    return base64.b64encode(secrets.token_bytes(32)).decode()


def build_encryptor(encoded_key: str | None = None):
    """Key from the argument or ``ARC_ENCRYPTION_KEY``; absent → the
    refusing encryptor (reference GetEncryptionKey + NewPasswordEncryptor)."""
    encoded = encoded_key or os.environ.get("ARC_ENCRYPTION_KEY", "")
    if not encoded:
        return NoPasswordEncryptor()
    return AESGCMEncryptor(parse_encryption_key(encoded))


# -- model (reference subscription.go) ------------------------------------

def resolve_qos(qos: int | None) -> int:
    """None (omitted) → default 1; explicit value — INCLUDING 0 — kept
    (reference resolveQoS, #326)."""
    return DEFAULT_QOS if qos is None else qos


def validate_broker_url(url: str) -> None:
    parsed = urlparse(url)
    if parsed.scheme not in _VALID_SCHEMES:
        raise MqttValidationError(
            f"invalid broker URL: must start with one of"
            f" {[s + '://' for s in _VALID_SCHEMES]}")
    if not parsed.hostname:
        raise MqttValidationError("invalid broker URL: host is required")


@dataclass
class Subscription:
    name: str
    broker: str
    topics: list[str]
    database: str
    id: str = ""
    client_id: str = ""
    qos: int = DEFAULT_QOS
    username: str = ""
    password_encrypted: str = ""
    tls_enabled: bool = False
    tls_cert_path: str = ""
    tls_key_path: str = ""
    tls_ca_path: str = ""
    tls_insecure_skip_verify: bool = False
    auto_start: bool = False
    status: str = STATUS_STOPPED
    error_message: str = ""
    topic_mapping: dict[str, str] = field(default_factory=dict)
    keep_alive_seconds: int = 0
    connect_timeout_seconds: int = 0
    reconnect_max_seconds: int = 0
    clean_session: bool = True
    created_at: float = 0.0
    updated_at: float = 0.0

    def set_defaults(self) -> None:
        """Reference SetDefaults — QoS deliberately NOT touched here
        (already resolved at create; re-defaulting would turn a persisted
        explicit 0 back into 1, reintroducing #326)."""
        if not self.client_id:
            self.client_id = "arc-" + secrets.token_hex(4)
        if self.keep_alive_seconds == 0:
            self.keep_alive_seconds = 60
        if self.connect_timeout_seconds == 0:
            self.connect_timeout_seconds = 30
        if self.reconnect_max_seconds == 0:
            self.reconnect_max_seconds = 60
        if not self.status:
            self.status = STATUS_STOPPED

    def validate(self) -> None:
        if not self.name:
            raise MqttValidationError("name is required")
        if len(self.name) > MAX_NAME_LEN:
            raise MqttValidationError(f"name exceeds {MAX_NAME_LEN} characters")
        if not self.broker:
            raise MqttValidationError("broker is required")
        if len(self.broker) > MAX_BROKER_URL_LEN:
            raise MqttValidationError(
                f"broker URL exceeds {MAX_BROKER_URL_LEN} characters")
        validate_broker_url(self.broker)
        if not self.client_id:
            raise MqttValidationError("client_id is required")
        if len(self.client_id) > MAX_CLIENT_ID_LEN:
            raise MqttValidationError(
                f"client_id exceeds {MAX_CLIENT_ID_LEN} characters")
        if not self.topics:
            raise MqttValidationError("at least one topic is required")
        if len(self.topics) > MAX_TOPICS:
            raise MqttValidationError(f"maximum {MAX_TOPICS} topics allowed")
        for t in self.topics:
            if not t:
                raise MqttValidationError("empty topic not allowed")
            if len(t) > MAX_TOPIC_LENGTH:
                raise MqttValidationError(
                    f"topic pattern exceeds {MAX_TOPIC_LENGTH} characters")
        if not 0 <= self.qos <= 2:
            raise MqttValidationError("qos must be 0, 1, or 2")
        if not self.database:
            raise MqttValidationError("database is required")
        for p in (self.tls_cert_path, self.tls_key_path, self.tls_ca_path):
            if p and ".." in p:
                raise MqttValidationError(
                    "path traversal not allowed in certificate paths")
        for fname in ("keep_alive_seconds", "connect_timeout_seconds",
                      "reconnect_max_seconds"):
            if getattr(self, fname) < 0:
                raise MqttValidationError(f"{fname} cannot be negative")

    def to_public(self) -> dict:
        """JSON shape: the encrypted password NEVER leaves the store
        (reference ``json:"-"`` on PasswordEncrypted + HasPassword)."""
        d = {k: v for k, v in self.__dict__.items()
             if k != "password_encrypted"}
        d["has_password"] = bool(self.password_encrypted)
        return d


# -- persistence (reference repository.go) --------------------------------

_COLS = (
    "id name broker client_id topics qos database username"
    " password_encrypted tls_enabled tls_cert_path tls_key_path tls_ca_path"
    " tls_insecure_skip_verify auto_start status error_message topic_mapping"
    " keep_alive_seconds connect_timeout_seconds reconnect_max_seconds"
    " clean_session created_at updated_at"
).split()


class SubscriptionRepository:
    def __init__(self, path: str = ":memory:"):
        self._db = sqlite3.connect(path, check_same_thread=False)
        self._lock = threading.Lock()
        with self._lock:
            self._db.execute(
                """CREATE TABLE IF NOT EXISTS mqtt_subscriptions (
                    id TEXT PRIMARY KEY,
                    name TEXT UNIQUE NOT NULL,
                    broker TEXT NOT NULL,
                    client_id TEXT NOT NULL,
                    topics TEXT NOT NULL,
                    qos INTEGER NOT NULL,
                    database TEXT NOT NULL,
                    username TEXT NOT NULL DEFAULT '',
                    password_encrypted TEXT NOT NULL DEFAULT '',
                    tls_enabled INTEGER NOT NULL DEFAULT 0,
                    tls_cert_path TEXT NOT NULL DEFAULT '',
                    tls_key_path TEXT NOT NULL DEFAULT '',
                    tls_ca_path TEXT NOT NULL DEFAULT '',
                    tls_insecure_skip_verify INTEGER NOT NULL DEFAULT 0,
                    auto_start INTEGER NOT NULL DEFAULT 0,
                    status TEXT NOT NULL DEFAULT 'stopped',
                    error_message TEXT NOT NULL DEFAULT '',
                    topic_mapping TEXT NOT NULL DEFAULT '{}',
                    keep_alive_seconds INTEGER NOT NULL DEFAULT 60,
                    connect_timeout_seconds INTEGER NOT NULL DEFAULT 30,
                    reconnect_max_seconds INTEGER NOT NULL DEFAULT 60,
                    clean_session INTEGER NOT NULL DEFAULT 1,
                    created_at REAL NOT NULL,
                    updated_at REAL NOT NULL
                )""")
            self._db.commit()

    def _to_row(self, s: Subscription) -> tuple:
        d = dict(s.__dict__)
        d["topics"] = json.dumps(d["topics"])
        d["topic_mapping"] = json.dumps(d["topic_mapping"])
        for b in ("tls_enabled", "tls_insecure_skip_verify", "auto_start",
                  "clean_session"):
            d[b] = int(d[b])
        return tuple(d[c] for c in _COLS)

    @staticmethod
    def _from_row(row) -> Subscription:
        d = dict(zip(_COLS, row))
        d["topics"] = json.loads(d["topics"])
        d["topic_mapping"] = json.loads(d["topic_mapping"])
        for b in ("tls_enabled", "tls_insecure_skip_verify", "auto_start",
                  "clean_session"):
            d[b] = bool(d[b])
        return Subscription(**d)

    def insert(self, s: Subscription) -> None:
        with self._lock:
            try:
                self._db.execute(
                    f"INSERT INTO mqtt_subscriptions ({', '.join(_COLS)})"
                    f" VALUES ({', '.join('?' * len(_COLS))})",
                    self._to_row(s))
            except sqlite3.IntegrityError:
                raise SubscriptionConflict(
                    f"subscription name {s.name!r} already exists")
            self._db.commit()

    def get(self, sub_id: str) -> Subscription | None:
        with self._lock:
            row = self._db.execute(
                f"SELECT {', '.join(_COLS)} FROM mqtt_subscriptions"
                " WHERE id = ?", (sub_id,)).fetchone()
        return self._from_row(row) if row else None

    def list(self) -> list[Subscription]:
        with self._lock:
            rows = self._db.execute(
                f"SELECT {', '.join(_COLS)} FROM mqtt_subscriptions"
                " ORDER BY created_at").fetchall()
        return [self._from_row(r) for r in rows]

    def update(self, s: Subscription) -> None:
        s.updated_at = time.time()
        sets = ", ".join(f"{c} = ?" for c in _COLS if c != "id")
        vals = [v for c, v in zip(_COLS, self._to_row(s)) if c != "id"]
        with self._lock:
            try:
                self._db.execute(
                    f"UPDATE mqtt_subscriptions SET {sets} WHERE id = ?",
                    (*vals, s.id))
            except sqlite3.IntegrityError:
                raise SubscriptionConflict(
                    f"subscription name {s.name!r} already exists")
            self._db.commit()

    def update_status(self, sub_id: str, status: str, error: str = "") -> None:
        with self._lock:
            self._db.execute(
                "UPDATE mqtt_subscriptions SET status = ?, error_message = ?,"
                " updated_at = ? WHERE id = ?",
                (status, error, time.time(), sub_id))
            self._db.commit()

    def delete(self, sub_id: str) -> bool:
        with self._lock:
            cur = self._db.execute(
                "DELETE FROM mqtt_subscriptions WHERE id = ?", (sub_id,))
            self._db.commit()
            return cur.rowcount > 0


# -- runtime subscriber ----------------------------------------------------

class PahoSubscriber:  # pragma: no cover - requires a live broker
    """Default broker client: paho-mqtt feeding an MqttIngestBridge.
    Import-gated — absence surfaces as a start error on the subscription
    (the reference's failed-connect path), never an import crash."""

    def __init__(self, sub: Subscription, password: str, bridge):
        try:
            import paho.mqtt.client as paho
        except ImportError:
            raise MqttValidationError(
                "paho-mqtt not installed; cannot attach a live broker")
        self._sub = sub
        self._bridge = bridge
        self.stats = {"messages_received": 0, "messages_failed": 0,
                      "bytes_received": 0, "reconnects": 0,
                      "last_message_at": None, "connected_since": None}
        self._client = paho.Client(client_id=sub.client_id,
                                   clean_session=sub.clean_session)
        if sub.username:
            self._client.username_pw_set(sub.username, password or None)
        if sub.tls_enabled:
            self._client.tls_set(ca_certs=sub.tls_ca_path or None,
                                 certfile=sub.tls_cert_path or None,
                                 keyfile=sub.tls_key_path or None)
            if sub.tls_insecure_skip_verify:
                self._client.tls_insecure_set(True)
        self._client.on_message = self._on_message
        self._client.on_connect = self._on_connect

    def _on_connect(self, client, userdata, flags, rc):
        if self.stats["connected_since"] is not None:
            self.stats["reconnects"] += 1
        self.stats["connected_since"] = time.time()
        for t in self._sub.topics:
            client.subscribe(t, qos=self._sub.qos)

    def _on_message(self, client, userdata, msg):
        try:
            n = self._bridge.handle_message(msg.topic, msg.payload)
            self.stats["messages_received"] += 1
            self.stats["bytes_received"] += len(msg.payload)
            self.stats["last_message_at"] = time.time()
            if n == 0:
                self.stats["messages_failed"] += 1
        except Exception:
            self.stats["messages_failed"] += 1

    def start(self) -> None:
        parsed = urlparse(self._sub.broker)
        self._client.connect(parsed.hostname, parsed.port or 1883,
                             keepalive=self._sub.keep_alive_seconds)
        self._client.loop_start()

    def stop(self) -> None:
        self._client.loop_stop()
        self._client.disconnect()


# -- manager (reference manager.go) ---------------------------------------

class SubscriptionManager:
    """CRUD + lifecycle over persisted subscriptions.

    ``subscriber_factory(sub, password, manager) -> subscriber`` builds the
    broker client; subscriber exposes ``start()``, ``stop()``, ``stats``
    (dict). Tests inject fakes; the default wires PahoSubscriber over an
    MqttIngestBridge (each topic mapped to a measurement via
    ``topic_mapping``, else the topic's last segment)."""

    def __init__(self, repo: SubscriptionRepository, encryptor=None,
                 subscriber_factory=None, bridge_factory=None):
        self.repo = repo
        self.encryptor = encryptor or build_encryptor()
        self._subscriber_factory = subscriber_factory or self._default_factory
        self._bridge_factory = bridge_factory
        self._lock = threading.Lock()
        self._running: dict[str, object] = {}

    def _default_factory(self, sub: Subscription, password: str):
        if self._bridge_factory is None:
            raise MqttValidationError(
                "no ingest bridge configured for MQTT subscriptions")
        from arc_spark.sources.mqtt import MqttSubscription

        bridge = self._bridge_factory(sub)
        for t in sub.topics:
            measurement = sub.topic_mapping.get(
                t, t.rstrip("/#").rsplit("/", 1)[-1] or "mqtt")
            bridge.subscribe(MqttSubscription(
                topic=t, db=sub.database, measurement=measurement))
        return PahoSubscriber(sub, password, bridge)

    # -- CRUD --------------------------------------------------------------
    def create(self, req: dict, password: str = "") -> Subscription:
        sub = Subscription(
            id=uuid.uuid4().hex[:12],
            name=req.get("name", ""),
            broker=req.get("broker", ""),
            client_id=req.get("client_id", ""),
            topics=list(req.get("topics") or []),
            qos=resolve_qos(req.get("qos")),
            database=req.get("database", ""),
            username=req.get("username", ""),
            tls_enabled=bool(req.get("tls_enabled", False)),
            tls_cert_path=req.get("tls_cert_path", ""),
            tls_key_path=req.get("tls_key_path", ""),
            tls_ca_path=req.get("tls_ca_path", ""),
            tls_insecure_skip_verify=bool(
                req.get("tls_insecure_skip_verify", False)),
            auto_start=bool(req.get("auto_start", False)),
            topic_mapping=dict(req.get("topic_mapping") or {}),
            keep_alive_seconds=int(req.get("keep_alive_seconds", 0)),
            connect_timeout_seconds=int(req.get("connect_timeout_seconds", 0)),
            reconnect_max_seconds=int(req.get("reconnect_max_seconds", 0)),
            clean_session=bool(req.get("clean_session", True)),
            created_at=time.time(),
            updated_at=time.time(),
        )
        sub.set_defaults()
        sub.validate()
        if password:
            sub.password_encrypted = self.encryptor.encrypt(password)
        self.repo.insert(sub)
        return sub

    def get(self, sub_id: str) -> Subscription:
        sub = self.repo.get(sub_id)
        if sub is None:
            raise SubscriptionNotFound(f"subscription not found: {sub_id}")
        return sub

    def list(self) -> list[Subscription]:
        return self.repo.list()

    def update(self, sub_id: str, req: dict) -> Subscription:
        sub = self.get(sub_id)
        with self._lock:
            if sub_id in self._running:
                raise SubscriptionRunning(
                    "subscription is running; stop it before updating")
        for k in ("name", "broker", "client_id", "database", "username",
                  "tls_cert_path", "tls_key_path", "tls_ca_path"):
            if k in req and req[k] is not None:
                setattr(sub, k, req[k])
        if req.get("topics") is not None:
            sub.topics = list(req["topics"])
        if req.get("qos") is not None:
            sub.qos = req["qos"]
        for k in ("tls_enabled", "tls_insecure_skip_verify", "auto_start",
                  "clean_session"):
            if k in req and req[k] is not None:
                setattr(sub, k, bool(req[k]))
        if req.get("topic_mapping") is not None:
            sub.topic_mapping = dict(req["topic_mapping"])
        for k in ("keep_alive_seconds", "connect_timeout_seconds",
                  "reconnect_max_seconds"):
            if req.get(k) is not None:
                setattr(sub, k, int(req[k]))
        if req.get("password"):
            sub.password_encrypted = self.encryptor.encrypt(req["password"])
        sub.validate()
        self.repo.update(sub)
        return sub

    def delete(self, sub_id: str) -> None:
        self.get(sub_id)
        self.stop(sub_id, missing_ok=True)
        self.repo.delete(sub_id)

    # -- lifecycle ---------------------------------------------------------
    def start(self, sub_id: str) -> Subscription:
        sub = self.get(sub_id)
        with self._lock:
            if sub_id in self._running:
                return sub  # idempotent
        password = ""
        if sub.password_encrypted:
            password = self.encryptor.decrypt(sub.password_encrypted)
        try:
            subscriber = self._subscriber_factory(sub, password)
            subscriber.start()
        except Exception as e:
            self.repo.update_status(sub.id, STATUS_ERROR, str(e)[:500])
            raise
        with self._lock:
            self._running[sub_id] = subscriber
        self.repo.update_status(sub.id, STATUS_RUNNING, "")
        return self.get(sub_id)

    def stop(self, sub_id: str, missing_ok: bool = False) -> None:
        with self._lock:
            subscriber = self._running.pop(sub_id, None)
        if subscriber is None:
            if missing_ok:
                return
            raise SubscriptionNotFound(
                f"subscription not running: {sub_id}")
        subscriber.stop()
        self.repo.update_status(sub_id, STATUS_STOPPED, "")

    def pause(self, sub_id: str) -> None:
        """Stop consuming, status 'paused' (reference PauseSubscription —
        stops without clearing error state into 'stopped')."""
        with self._lock:
            subscriber = self._running.pop(sub_id, None)
        if subscriber is None:
            raise SubscriptionNotFound(f"subscription not running: {sub_id}")
        subscriber.stop()
        self.repo.update_status(sub_id, STATUS_PAUSED, "")

    def restart(self, sub_id: str) -> Subscription:
        self.stop(sub_id, missing_ok=True)
        return self.start(sub_id)

    def start_auto(self) -> list[str]:
        """Start every auto_start subscription; failures land in that
        subscription's error state, not as a raised boot error (reference
        manager Start)."""
        started = []
        for sub in self.repo.list():
            if sub.auto_start:
                try:
                    self.start(sub.id)
                    started.append(sub.id)
                except Exception:
                    pass  # status already 'error' with the message
        return started

    def shutdown(self) -> None:
        with self._lock:
            ids = list(self._running)
        for sub_id in ids:
            try:
                self.stop(sub_id, missing_ok=True)
            except Exception:
                pass

    # -- stats (reference SubscriptionStats, #546 omit-unset times) -------
    def stats(self, sub_id: str) -> dict:
        sub = self.get(sub_id)
        out = {"id": sub.id, "name": sub.name, "status": sub.status,
               "messages_received": 0, "messages_failed": 0,
               "bytes_received": 0, "reconnects": 0}
        with self._lock:
            subscriber = self._running.get(sub_id)
        if subscriber is not None:
            s = dict(subscriber.stats)
            for k in ("messages_received", "messages_failed",
                      "bytes_received", "reconnects"):
                out[k] = s.get(k, 0)
            for k in ("last_message_at", "connected_since"):
                if s.get(k) is not None:
                    out[k] = s[k]
        return out

    def all_stats(self) -> list[dict]:
        return [self.stats(s.id) for s in self.repo.list()]
