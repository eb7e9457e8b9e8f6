"""Token auth + RBAC persistence (reference internal/auth/: hashed API
tokens in SQLite, per-token allowed-table lists).

Tokens are stored as SHA-256 hashes — the plaintext is returned exactly
once at creation and never persisted (reference auth/token.go). The
allowed-tables set rides in the same row as JSON; ``None`` means
unrestricted (admin), matching ``QueryService``'s RBAC semantics where an
absent policy allows all tables.

``AuthStore.tables_view()`` adapts the store to the mapping protocol
``QueryService.allowed_tables`` expects (``token in m`` / ``m[token]``),
so the engine-side RBAC check (plan-walk table extraction, A11) is
unchanged — only the policy source moves from an in-memory dict to SQLite.
"""

from __future__ import annotations

import hashlib
import json
import secrets
import sqlite3
import threading
import time


def _hash(token: str) -> str:
    return hashlib.sha256(token.encode()).hexdigest()


class AuthStore:
    def __init__(self, path: str = ":memory:"):
        # check_same_thread=False + our own lock: the HTTP server handles
        # requests on a thread pool
        self._db = sqlite3.connect(path, check_same_thread=False)
        self._lock = threading.Lock()
        with self._lock:
            self._db.execute(
                """CREATE TABLE IF NOT EXISTS tokens (
                       token_hash TEXT PRIMARY KEY,
                       name TEXT UNIQUE NOT NULL,
                       allowed_tables TEXT,     -- JSON list or NULL (admin)
                       created_at REAL NOT NULL,
                       revoked INTEGER NOT NULL DEFAULT 0
                   )"""
            )
            self._db.commit()

    # -- management --------------------------------------------------------
    def create_token(
        self, name: str, allowed_tables: list[str] | None = None
    ) -> str:
        """Mint a token; returns the plaintext ONCE. Raises on name reuse."""
        token = secrets.token_hex(24)
        with self._lock:
            self._db.execute(
                "INSERT INTO tokens (token_hash, name, allowed_tables, created_at)"
                " VALUES (?, ?, ?, ?)",
                (
                    _hash(token),
                    name,
                    json.dumps(sorted(allowed_tables)) if allowed_tables is not None else None,
                    time.time(),
                ),
            )
            self._db.commit()
        return token

    def revoke(self, name: str) -> bool:
        with self._lock:
            cur = self._db.execute(
                "UPDATE tokens SET revoked = 1 WHERE name = ?", (name,)
            )
            self._db.commit()
            return cur.rowcount > 0

    def list_tokens(self) -> list[dict]:
        with self._lock:
            rows = self._db.execute(
                "SELECT name, allowed_tables, created_at, revoked FROM tokens"
            ).fetchall()
        return [
            {"name": n, "allowed_tables": json.loads(a) if a else None,
             "created_at": c, "revoked": bool(r)}
            for n, a, c, r in rows
        ]

    # -- verification ------------------------------------------------------
    def verify(self, token: str) -> dict | None:
        """(name, allowed set | None) for a live token, else None."""
        if not token:
            return None
        with self._lock:
            row = self._db.execute(
                "SELECT name, allowed_tables FROM tokens"
                " WHERE token_hash = ? AND revoked = 0",
                (_hash(token),),
            ).fetchone()
        if row is None:
            return None
        name, allowed = row
        return {
            "name": name,
            "allowed_tables": set(json.loads(allowed)) if allowed else None,
        }

    def tables_view(self) -> "AuthTablesView":
        return AuthTablesView(self)


class AuthTablesView:
    """Mapping adapter: QueryService.allowed_tables protocol over the store.

    ``token in view`` → the token has a RESTRICTED policy (admin/unknown
    tokens return False, which QueryService treats as allow-all — unknown
    tokens are rejected earlier, at the HTTP auth step)."""

    def __init__(self, store: AuthStore):
        self._store = store

    def __contains__(self, token: str) -> bool:
        info = self._store.verify(token)
        return info is not None and info["allowed_tables"] is not None

    def __getitem__(self, token: str) -> set[str]:
        info = self._store.verify(token)
        if info is None or info["allowed_tables"] is None:
            raise KeyError(token)
        return info["allowed_tables"]
