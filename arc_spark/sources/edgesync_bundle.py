"""Air-gap bundle transport for file-level edge sync (reference
internal/edgesync/ bundle.go, exporter.go, importer.go, bundleindex.go,
ack.go, bundle_dest.go, registry.go — behavior kept, code ours).

A fully air-gapped spoke runs no sync agent; instead an operator exports
pending ledger entries onto removable media and carries them to the hub:

- **Bundle**: a DIRECTORY (not an archive — a human at an air gap can run
  ``sha256sum entries.jsonl``) named by a ULID-shaped, lexicographically
  sortable id: ``<id>/manifest.json`` (small, signed header),
  ``<id>/entries.jsonl`` (one {path, sha256, size_bytes} per line),
  ``<id>/data/<sync path>`` (the file bytes).
- **Integrity**: the manifest binds an ORDER-INDEPENDENT canonical digest
  of the entries under an HMAC-SHA256 keyed by the spoke's shared secret,
  plus the raw sha256 of entries.jsonl for human verification. The hub
  verifies identity BEFORE signature (a bundle addressed to another hub
  is refused even if perfectly signed — the spoke may be registered on
  both), replays are refused via the bundle index keyed on
  (spoke_id, bundle_id), and every data file's digest is verified before
  ANY file is committed.
- **Commit** goes through the hub's normal verify-then-promote receiver
  (chunked, so a bundle can carry files of any size with bounded
  memory); conflicts (hub holds different bytes) are REPORTED, never
  overwritten, and deliberately absent from the ack's acknowledged
  paths.
- **Ack return leg**: the hub writes a signed ``ack.json`` into the
  bundle directory; the drive rides back and the spoke applies it —
  acknowledged paths advance to synced (terminal, prunable), conflicts
  to conflicted. Without this leg the air-gap ledger grows forever.
- **DestinationPolicy** bounds which directories the hub's operator
  routes will import from / the spoke will export to.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import secrets as _secrets
import sqlite3
import threading
import time

from arc_spark.sources.edgesync import (
    CHUNK_BYTES,
    HubReceiver,
    SyncConflict,
    SyncLedger,
    validate_sync_path,
)
from arc_spark.storage import backend_for

BUNDLE_VERSION = 1
MANIFEST_NAME = "manifest.json"
ENTRIES_NAME = "entries.jsonl"
ACK_NAME = "ack.json"
DATA_DIR = "data"

# Crockford base32: no I, L, O, U — the characters most often misread
# when a human copies a bundle id off a screen at an air gap
_CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
_BUNDLE_ID_LEN = 26


class BundleError(ValueError):
    """Malformed / misaddressed / tampered bundle — refused untouched."""


class BundleAlreadyImported(BundleError):
    """Replay: this (spoke, bundle) was already imported (bundle index)."""


def new_bundle_id(now: float | None = None) -> str:
    """ULID-shaped: 48-bit ms timestamp then 80 random bits, Crockford
    base32 — directory listings sort in creation order."""
    ms = int((time.time() if now is None else now) * 1000)
    raw = ms.to_bytes(6, "big") + _secrets.token_bytes(10)
    enc = base64.b32encode(raw).decode().rstrip("=")
    return enc.translate(str.maketrans(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567", _CROCKFORD))


def validate_bundle_id(bundle_id: str) -> None:
    """The id is attacker-chosen (a compromised spoke signs anything) and
    reaches a SQLite key, log lines, and a directory name — bound it."""
    if len(bundle_id) != _BUNDLE_ID_LEN:
        raise BundleError(
            f"bundle id must be {_BUNDLE_ID_LEN} chars, "
            f"got {len(bundle_id)}")
    for ch in bundle_id:
        if ch not in _CROCKFORD:
            raise BundleError(
                f"bundle id contains {ch!r}: not Crockford base32")


def entries_digest(entries: list[dict]) -> str:
    """Canonical, order- and formatting-independent digest of the entry
    set — survives a reader that rewrites entries.jsonl, which the raw
    file hash does not."""
    h = hashlib.sha256()
    for e in sorted(entries, key=lambda e: e["path"]):
        h.update(f"{e['path']}\x00{e['sha256']}\x00"
                 f"{e['size_bytes']}\x00".encode())
    return h.hexdigest()


def paths_digest(paths: list[str]) -> str:
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(p.encode() + b"\x00")
    return h.hexdigest()


def _mac(secret: str, *fields) -> str:
    msg = "\x1f".join(str(f) for f in fields).encode()
    return hmac.new(secret.encode(), msg, hashlib.sha256).hexdigest()


def _manifest_mac(secret: str, m: dict) -> str:
    return _mac(secret, "manifest", m["bundle_id"], m["spoke_id"],
                m["hub_id"], m["created_at"], m["entry_count"],
                m["total_bytes"], m["entries_digest"])


def _ack_mac(secret: str, a: dict) -> str:
    return _mac(secret, "ack", a["bundle_id"], a["spoke_id"], a["hub_id"],
                a["imported_at"], a["paths_digest"])


class DestinationPolicy:
    """Which directories bundle import/export may touch (bundle_dest.go):
    an operator-supplied path must resolve inside an allowed dir and
    outside the storage root. Empty allow-list → disabled (refuse all)."""

    def __init__(self, allowed_dirs: list[str],
                 storage_root: str | None = None):
        self.allowed = [os.path.realpath(d) for d in allowed_dirs]
        self.storage_root = (os.path.realpath(storage_root)
                             if storage_root else None)

    def enabled(self) -> bool:
        return bool(self.allowed)

    def resolve(self, requested: str) -> str:
        p = os.path.realpath(requested)
        if self.storage_root is not None and (
                p == self.storage_root
                or p.startswith(self.storage_root + os.sep)):
            raise BundleError(
                "bundle directory inside the storage root is not allowed")
        for d in self.allowed:
            if p == d or p.startswith(d + os.sep):
                return p
        raise BundleError(
            f"{requested!r} is outside the allowed bundle directories")


class SpokeRegistry:
    """Hub-side registry of spokes and their shared secrets
    (registry.go). SQLite-backed; ``:memory:`` for tests."""

    def __init__(self, db_path: str = ":memory:"):
        self._db = sqlite3.connect(db_path, check_same_thread=False)
        self._lock = threading.Lock()
        with self._lock:
            self._db.execute(
                "CREATE TABLE IF NOT EXISTS spokes ("
                "spoke_id TEXT PRIMARY KEY, secret TEXT NOT NULL, "
                "enabled INTEGER NOT NULL DEFAULT 1, created_at REAL)")
            self._db.commit()

    def register(self, spoke_id: str, secret: str,
                 enabled: bool = True) -> None:
        with self._lock:
            self._db.execute(
                "INSERT OR REPLACE INTO spokes VALUES (?, ?, ?, ?)",
                (spoke_id, secret, int(enabled), time.time()))
            self._db.commit()

    def get(self, spoke_id: str) -> dict | None:
        with self._lock:
            row = self._db.execute(
                "SELECT secret, enabled FROM spokes WHERE spoke_id=?",
                (spoke_id,)).fetchone()
        if row is None:
            return None
        return {"secret": row[0], "enabled": bool(row[1])}

    def set_enabled(self, spoke_id: str, enabled: bool) -> bool:
        """True if the spoke existed. Reversible, unlike delete: the
        registration (and its secret) survives, so re-enabling needs no
        re-provisioning (reference edgesync_admin.go disable)."""
        with self._lock:
            cur = self._db.execute(
                "UPDATE spokes SET enabled=? WHERE spoke_id=?",
                (int(enabled), spoke_id))
            self._db.commit()
            return cur.rowcount > 0

    def list(self) -> list[dict]:
        """All registrations, SECRETS EXCLUDED — the list is operator
        observability (which edge deployments exist), and a secret is
        readable only at register/rotate time (edgesync_admin.go list)."""
        with self._lock:
            rows = self._db.execute(
                "SELECT spoke_id, enabled, created_at FROM spokes"
                " ORDER BY spoke_id").fetchall()
        return [{"spoke_id": r[0], "enabled": bool(r[1]),
                 "created_at": r[2]} for r in rows]

    def rotate(self, spoke_id: str) -> str | None:
        """Re-mint the spoke's shared secret in place; returns the new
        secret (the ONLY time it is readable) or None for an unknown
        spoke. Rotation-without-downtime is the operational need the
        replace-on-register path can't serve: replace requires knowing
        (and re-sending) a secret, rotate invalidates the old one
        atomically server-side (edgesync_admin.go rotate)."""
        import secrets as _secrets

        new = _secrets.token_hex(32)
        with self._lock:
            cur = self._db.execute(
                "UPDATE spokes SET secret=? WHERE spoke_id=?",
                (new, spoke_id))
            self._db.commit()
            if cur.rowcount == 0:
                return None
        return new

    def delete(self, spoke_id: str) -> bool:
        """Remove the registration outright. Files already received from
        the spoke are retained (edgesync_admin.go delete note)."""
        with self._lock:
            cur = self._db.execute(
                "DELETE FROM spokes WHERE spoke_id=?", (spoke_id,))
            self._db.commit()
            return cur.rowcount > 0


class BundleIndex:
    """Replay protection: which (spoke, bundle) the hub has imported
    (bundleindex.go). The online families don't need this — HTTP uploads
    are idempotent by (path, sha) — but a drive can be plugged in twice."""

    def __init__(self, db_path: str = ":memory:"):
        self._db = sqlite3.connect(db_path, check_same_thread=False)
        self._lock = threading.Lock()
        with self._lock:
            self._db.execute(
                "CREATE TABLE IF NOT EXISTS imported_bundles ("
                "spoke_id TEXT NOT NULL, bundle_id TEXT NOT NULL, "
                "created_at REAL, imported_at REAL, "
                "file_count INTEGER, bytes_total INTEGER, "
                "PRIMARY KEY (spoke_id, bundle_id))")
            self._db.commit()

    def seen(self, spoke_id: str, bundle_id: str) -> dict | None:
        with self._lock:
            row = self._db.execute(
                "SELECT created_at, imported_at, file_count, bytes_total "
                "FROM imported_bundles WHERE spoke_id=? AND bundle_id=?",
                (spoke_id, bundle_id)).fetchone()
        if row is None:
            return None
        return {"created_at": row[0], "imported_at": row[1],
                "file_count": row[2], "bytes_total": row[3]}

    def record(self, spoke_id: str, bundle_id: str, created_at: float,
               file_count: int, bytes_total: int) -> None:
        with self._lock:
            self._db.execute(
                "INSERT OR REPLACE INTO imported_bundles VALUES "
                "(?, ?, ?, ?, ?, ?)",
                (spoke_id, bundle_id, created_at, time.time(),
                 file_count, bytes_total))
            self._db.commit()

    def list_by_spoke(self, spoke_id: str, limit: int = 50) -> list[dict]:
        with self._lock:
            rows = self._db.execute(
                "SELECT bundle_id, created_at, imported_at, file_count, "
                "bytes_total FROM imported_bundles WHERE spoke_id=? "
                "ORDER BY imported_at DESC LIMIT ?",
                (spoke_id, limit)).fetchall()
        return [{"bundle_id": b, "created_at": c, "imported_at": i,
                 "file_count": f, "bytes_total": t}
                for b, c, i, f, t in rows]


# ---------------------------------------------------------------------------
# spoke side: export + ack application
# ---------------------------------------------------------------------------

def _ensure_airgap_columns(ledger: SyncLedger) -> None:
    """Schema migration (ledger.go:232): a ledger created before the
    air-gap columns existed gains exported_bundle_id in place."""
    with ledger._lock:
        cols = {r[1] for r in ledger._db.execute(
            "PRAGMA table_info(sync_ledger)").fetchall()}
        if "exported_bundle_id" not in cols:
            ledger._db.execute(
                "ALTER TABLE sync_ledger ADD COLUMN exported_bundle_id TEXT")
            ledger._db.commit()


class BundleExporter:
    """Spoke side of the air gap (exporter.go): write pending ledger
    entries to a bundle; apply the signed ack that rides back."""

    def __init__(self, root: str, ledger: SyncLedger, spoke_id: str,
                 hub_id: str, secret: str):
        self.root = root
        self.ledger = ledger
        self.spoke_id = spoke_id
        self.hub_id = hub_id
        self.secret = secret
        _ensure_airgap_columns(ledger)

    def export(self, dest: str, limit: int = 0) -> dict:
        """Discover + select pending entries, write ``dest/<bundle_id>/``
        and mark them ``exported``. Returns {bundle_id, files, bytes}.

        Discovery runs here because an air-gapped spoke runs NO agent —
        this is the only thing that ever notices new committed files."""
        from arc_spark.sources.edgesync import SpokeAgent

        SpokeAgent(self.root, self.ledger, transport=None,
                   hub_id=self.hub_id).discover()
        pending = self.ledger.pending(self.hub_id, limit=limit or 10**9)
        if not pending:
            return {"bundle_id": None, "files": 0, "bytes": 0}
        bundle_id = new_bundle_id()
        bdir = os.path.join(dest, bundle_id)
        os.makedirs(os.path.join(bdir, DATA_DIR), exist_ok=True)
        bk = backend_for(self.root)
        entries = []
        total = 0
        for e in pending:
            src = bk.join(self.root, e["path"])
            dst = os.path.join(bdir, DATA_DIR, *e["path"].split("/"))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            # stream copy with digest re-check: media should carry what
            # the ledger promised, not whatever the file became
            h = hashlib.sha256()
            with bk.fs.open_input_file(bk.fs_path(src)) as f, \
                    open(dst, "wb") as out:
                while True:
                    chunk = f.read(CHUNK_BYTES)
                    if not chunk:
                        break
                    h.update(chunk)
                    out.write(chunk)
            if h.hexdigest() != e["sha256"]:
                raise BundleError(
                    f"{e['path']}: content changed since discovery "
                    f"(ledger {e['sha256'][:12]}…, "
                    f"disk {h.hexdigest()[:12]}…)")
            size = os.path.getsize(dst)
            entries.append({"path": e["path"], "sha256": e["sha256"],
                            "size_bytes": size})
            total += size
        with open(os.path.join(bdir, ENTRIES_NAME), "wb") as f:
            for e in entries:
                f.write(json.dumps(
                    e, separators=(",", ":")).encode() + b"\n")
        entries_raw_sha = hashlib.sha256(
            open(os.path.join(bdir, ENTRIES_NAME), "rb").read()).hexdigest()
        manifest = {
            "version": BUNDLE_VERSION,
            "bundle_id": bundle_id,
            "spoke_id": self.spoke_id,
            "hub_id": self.hub_id,
            "created_at": int(time.time()),
            "entry_count": len(entries),
            "total_bytes": total,
            "entries_sha256": entries_raw_sha,
            "entries_digest": entries_digest(entries),
        }
        manifest["mac"] = _manifest_mac(self.secret, manifest)
        with open(os.path.join(bdir, MANIFEST_NAME), "w") as f:
            json.dump(manifest, f, indent=1)
        with self.ledger._lock:
            for e in entries:
                self.ledger._db.execute(
                    "UPDATE sync_ledger SET state='exported', "
                    "exported_bundle_id=?, updated_at=? "
                    "WHERE hub_id=? AND path=?",
                    (bundle_id, time.time(), self.hub_id, e["path"]))
            self.ledger._db.commit()
        return {"bundle_id": bundle_id, "files": len(entries),
                "bytes": total}

    def revert(self, bundle_id: str) -> int:
        """exported → pending (the drive was lost/wiped); the entries
        become exportable again."""
        validate_bundle_id(bundle_id)
        with self.ledger._lock:
            cur = self.ledger._db.execute(
                "UPDATE sync_ledger SET state='pending', "
                "exported_bundle_id=NULL, updated_at=? "
                "WHERE hub_id=? AND state='exported' "
                "AND exported_bundle_id=?",
                (time.time(), self.hub_id, bundle_id))
            self.ledger._db.commit()
            return cur.rowcount

    def apply_ack(self, bundle_dir: str) -> dict:
        """Verify + apply the hub's signed ack: acknowledged paths reach
        ``synced`` (terminal), conflicts reach ``conflicted``. An
        unverified ack never advances anything."""
        with open(os.path.join(bundle_dir, ACK_NAME)) as f:
            a = json.load(f)
        validate_bundle_id(a.get("bundle_id", ""))
        if a.get("spoke_id") != self.spoke_id:
            raise BundleError(
                f"ack is for spoke {a.get('spoke_id')!r}, I am "
                f"{self.spoke_id!r}")
        if a.get("hub_id") != self.hub_id:
            # an ack from another hub names files this spoke never sent
            # there
            raise BundleError(
                f"ack is from hub {a.get('hub_id')!r}, my hub is "
                f"{self.hub_id!r}")
        if a.get("paths_digest") != paths_digest(a.get("paths", [])):
            raise BundleError("ack paths digest mismatch")
        if not hmac.compare_digest(
                a.get("mac", ""), _ack_mac(self.secret, a)):
            raise BundleError("ack MAC mismatch")
        synced = conflicted = 0
        for p in a["paths"]:
            self.ledger.mark_synced(self.hub_id, p)
            synced += 1
        for c in a.get("conflicts", []):
            self.ledger.mark_conflicted(
                self.hub_id, c["path"], c.get("detail", "hub conflict"))
            conflicted += 1
        return {"bundle_id": a["bundle_id"], "synced": synced,
                "conflicted": conflicted}


# ---------------------------------------------------------------------------
# hub side: verified import + signed ack
# ---------------------------------------------------------------------------

class BundleImporter:
    """Hub side of the air gap (importer.go): verify everything, commit
    through the receiver, record for replay protection, write the ack."""

    def __init__(self, receiver: HubReceiver, index: BundleIndex,
                 registry: SpokeRegistry, hub_id: str,
                 max_files: int = 1_000_000):
        self.receiver = receiver
        self.index = index
        self.registry = registry
        self.hub_id = hub_id
        self.max_files = max_files
        self._lock = threading.Lock()

    def import_bundle(self, bundle_dir: str) -> dict:
        with self._lock:
            return self._import(bundle_dir)

    def _import(self, bundle_dir: str) -> dict:
        try:
            with open(os.path.join(bundle_dir, MANIFEST_NAME)) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            raise BundleError(f"unreadable manifest: {e}") from None
        if m.get("version") != BUNDLE_VERSION:
            raise BundleError(
                f"unknown bundle version {m.get('version')!r} — refusing "
                "to guess the layout")
        validate_bundle_id(m.get("bundle_id", ""))
        # identity before signature: a bundle for another hub is refused
        # even if perfectly signed (the spoke may be registered on both)
        if m.get("hub_id") != self.hub_id:
            raise BundleError(
                f"bundle is addressed to hub {m.get('hub_id')!r}, "
                f"this hub is {self.hub_id!r}")
        if not 0 < int(m.get("entry_count", 0)) <= self.max_files:
            raise BundleError(
                f"entry_count {m.get('entry_count')!r} outside "
                f"(0, {self.max_files}]")
        spoke = self.registry.get(m.get("spoke_id", ""))
        if spoke is None:
            raise BundleError(f"unknown spoke {m.get('spoke_id')!r}")
        if not spoke["enabled"]:
            raise BundleError(f"spoke {m['spoke_id']!r} is disabled")
        # dedup BEFORE verification: re-hashing an already-imported
        # bundle answers a question the index already answered
        prior = self.index.seen(m["spoke_id"], m["bundle_id"])
        if prior is not None:
            raise BundleAlreadyImported(
                f"{m['bundle_id']} already imported "
                f"({prior['file_count']} files)")
        entries_path = os.path.join(bundle_dir, ENTRIES_NAME)
        raw = open(entries_path, "rb").read()
        if hashlib.sha256(raw).hexdigest() != m.get("entries_sha256"):
            raise BundleError("entries.jsonl does not match its sha256")
        entries = [json.loads(line) for line in raw.splitlines() if line]
        if len(entries) != m["entry_count"]:
            raise BundleError(
                f"manifest declares {m['entry_count']} entries, "
                f"file holds {len(entries)}")
        if entries_digest(entries) != m.get("entries_digest"):
            raise BundleError("canonical entries digest mismatch")
        if not hmac.compare_digest(
                m.get("mac", ""), _manifest_mac(spoke["secret"], m)):
            raise BundleError("manifest MAC mismatch")
        # verify EVERY data file before committing ANY: a truncated
        # drive must not leave a half-imported bundle
        for e in entries:
            validate_sync_path(e["path"])
            p = os.path.join(bundle_dir, DATA_DIR, *e["path"].split("/"))
            h = hashlib.sha256()
            try:
                with open(p, "rb") as f:
                    while True:
                        chunk = f.read(CHUNK_BYTES)
                        if not chunk:
                            break
                        h.update(chunk)
            except OSError as exc:
                raise BundleError(
                    f"{e['path']}: missing/unreadable data file "
                    f"({exc})") from None
            if h.hexdigest() != e["sha256"]:
                raise BundleError(
                    f"{e['path']}: data file does not match its "
                    "manifest digest")
        committed = already = 0
        bytes_written = 0
        acked_paths: list[str] = []
        conflicts: list[dict] = []
        for e in entries:
            p = os.path.join(bundle_dir, DATA_DIR, *e["path"].split("/"))
            try:
                out = self._commit_one(e, p, m["spoke_id"])
            except SyncConflict as exc:
                # reported, never overwritten, and deliberately NOT
                # acknowledged: the spoke's copy was not delivered
                conflicts.append({"path": e["path"], "detail": str(exc)})
                continue
            if out["status"] == "already_present":
                already += 1
            else:
                committed += 1
                bytes_written += e["size_bytes"]
            acked_paths.append(e["path"])
        self.index.record(m["spoke_id"], m["bundle_id"],
                          m["created_at"], committed + already,
                          bytes_written)
        ack = {
            "version": BUNDLE_VERSION,
            "bundle_id": m["bundle_id"],
            "spoke_id": m["spoke_id"],
            "hub_id": self.hub_id,
            "imported_at": int(time.time()),
            "paths": sorted(acked_paths),
            "conflicts": conflicts,
        }
        ack["paths_digest"] = paths_digest(ack["paths"])
        ack["mac"] = _ack_mac(spoke["secret"], ack)
        ack_written = True
        try:
            with open(os.path.join(bundle_dir, ACK_NAME), "w") as f:
                json.dump(ack, f, indent=1)
        except OSError:
            # not fatal — the files are committed either way — but the
            # spoke loses its chance to advance; say so plainly
            ack_written = False
        return {"bundle_id": m["bundle_id"], "spoke_id": m["spoke_id"],
                "committed": committed, "already_present": already,
                "conflicts": conflicts, "bytes_written": bytes_written,
                "ack_written": ack_written}

    def _commit_one(self, e: dict, local_path: str, spoke_id: str) -> dict:
        """Commit via the receiver's CHUNKED path — bounded memory no
        matter how large the bundled file is."""
        size = e["size_bytes"]
        st = self.receiver.begin(e["path"], e["sha256"], size,
                                 spoke_id=spoke_id)
        if st.get("status") == "already_present":
            return st
        offset = st["offset"]
        with open(local_path, "rb") as f:
            if offset:
                f.seek(offset)
            while True:
                chunk = f.read(CHUNK_BYTES)
                if not chunk:
                    break
                offset = self.receiver.append(
                    st["upload_id"], offset, chunk)["offset"]
        return self.receiver.finish(st["upload_id"])
