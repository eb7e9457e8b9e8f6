"""Snapshot-manifest commit layer: atomic data-file visibility.

The reference gets multi-file atomicity from its Raft-replicated file
manifest plus the Iceberg exporter's ``ReplaceDataFiles`` swap
(/root/reference/internal/iceberg/exporter.go,
internal/compaction/manifest.go): readers resolve a committed *file
list*, never a directory glob, so a crash between "files written" and
"commit" can only leave invisible stray files — never a partial flush a
query can see.

This module is the Spark-native equivalent. Per measurement directory
(one per tier — hot, cold, daily each commit their own):

- ``<meas>/_arc_snapshots/v{N}.json`` — immutable, versioned file lists
  (paths relative to the measurement dir, so backup/restore and tier
  moves keep manifests valid). The CURRENT snapshot is simply the
  highest version present; publishing one is a single tmp→rename, which
  is atomic on local filesystems and either-old-or-new on object stores.
- writers call :func:`commit` with ``add=written_files`` /
  ``remove=replaced_files`` AFTER the data files are durably written and
  BEFORE any replaced file is deleted. Crash before commit → readers
  keep the old snapshot (stray new files are invisible); crash after
  commit → readers see the new snapshot (stale old files are invisible).
  The reconciler classifies aged unlisted files as ``orphan_data``.
- readers (:meth:`arc_spark.catalog.MeasurementCatalog.table`) resolve
  the current snapshot into an explicit file list for
  ``spark.read.parquet(*files)`` with ``basePath`` — hive partition
  columns and Catalyst partition pruning work exactly as they do for a
  directory scan, because the file index is just pre-resolved.

Adoption is incremental: a tree without ``_arc_snapshots`` is
*unmanaged* and reads fall back to the directory glob. The FIRST commit
on such a tree bootstraps from a glob of the live files, so existing
data stays visible. All engine write paths (flush, distributed drains,
compaction, delete, retention, tiering, restore) commit; ad-hoc files
dropped into a managed tree by hand are invisible until a commit or
snapshot removal — which is the point.

Concurrency: threads in one process serialize on an in-process lock;
across PROCESSES, :func:`commit` is a version compare-and-swap — the
``vN+1`` file is published with a fail-if-exists primitive (hard-link
EEXIST on local filesystems), and a loser rereads the winner's snapshot
and reapplies its own add/remove sets. That makes the A24 collapse
("compaction as a separate Spark job") actually safe: an out-of-process
lifecycle job and a serving engine committing concurrently lose neither
side's files — the role the reference's Raft RegisterFile ordering
plays (internal/compaction/manifest.go). Object stores without a
conditional create degrade to documented single-writer mode. A
concurrent *reader* always sees a fully written snapshot (the body is
complete before the link/rename publishes it).

At 100 TB: reads pay a bounded handful of small GETs (newest full
snapshot + ≤ FOLD_EVERY−1 deltas) instead of a recursive LIST. Commits
are Delta-log style: a version normally appends only its add/remove
sets — O(changes) bytes regardless of live file count — and every
FOLD_EVERY-th version folds the chain into one full snapshot (~100
bytes/file), whose size is itself bounded because compaction bounds the
live file count (hourly tier merges every multi-file partition to one
file). The r4-noted O(files)-per-commit rewrite is gone; a pytest
micro-bench locks delta-commit cost flat vs file count.
"""

from __future__ import annotations

import threading
import time
import uuid

from arc_spark.storage import backend_for

SNAP_DIR = "_arc_snapshots"
KEEP_VERSIONS = 10
# prune only version files older than this: a racing out-of-process
# committer's read→CAS window is sub-second, so its just-read current
# version can never be deleted out from under it
PRUNE_MIN_AGE_S = 60.0
# incremental commits (the Delta-log upgrade path the module always
# documented): a commit normally appends only its add/remove sets —
# O(changes), not O(files) — and every FOLD_EVERY-th version writes a
# full snapshot so reads fold a bounded chain. FOLD_EVERY < KEEP_VERSIONS
# guarantees the count-based prune can never cut a live fold chain.
FOLD_EVERY = 8

_locks: dict[str, threading.Lock] = {}
_locks_guard = threading.Lock()


def _lock_for(meas_path: str) -> threading.Lock:
    with _locks_guard:
        lk = _locks.get(meas_path)
        if lk is None:
            lk = _locks[meas_path] = threading.Lock()
        return lk


def _snap_dir(bk, meas_path: str) -> str:
    return bk.join(meas_path, SNAP_DIR)


def _versions(bk, meas_path: str) -> list[tuple[int, str]]:
    d = _snap_dir(bk, meas_path)
    if not bk.isdir(d):
        return []
    out = []
    for f in bk.list_files(d, suffix=".json"):
        name = bk.basename(f)
        if name.startswith("v") and name.endswith(".json"):
            body = name[1:-5]
            if body.isdigit():
                out.append((int(body), f))
    out.sort()
    return out


def is_managed(meas_path: str, bk=None) -> bool:
    bk = bk or backend_for(meas_path)
    return bool(_versions(bk, meas_path))


def latest_version(meas_path: str, bk=None) -> int | None:
    """Newest committed snapshot version, or None for an unmanaged tree.
    ONE directory listing, no version-file reads — the cheap freshness
    fingerprint (versions are CAS-monotonic, so an unchanged number means
    an unchanged committed file set)."""
    bk = bk or backend_for(meas_path)
    vers = _versions(bk, meas_path)
    return vers[-1][0] if vers else None


def _load_state(bk, meas_path: str):
    """Fold the version chain → (ver, files_set | None, deltas_since_full).

    Walk backward from the newest version to the newest readable FULL
    snapshot, then fold the delta versions above it in order. An
    unreadable file (a reader racing an object-store PUT can only hit
    this on the very latest key) invalidates everything above it — the
    fold restarts below, so readers always see a consistent prefix.
    Returns files=None for an unmanaged tree (no readable full
    snapshot)."""
    vers = _versions(bk, meas_path)
    chain: list[tuple[int, dict]] = []
    base = None
    for ver, path in reversed(vers):
        try:
            obj = bk.read_json(path)
            # shape check up front: a parseable-but-malformed version
            # (hand-edited, foreign writer) must take the unreadable
            # path, not crash the fold later with a KeyError
            if obj.get("delta"):
                if not isinstance(obj.get("add"), list) or \
                        not isinstance(obj.get("remove"), list):
                    raise ValueError("malformed delta version")
            elif not isinstance(obj.get("files"), list):
                raise ValueError("malformed full snapshot")
        except Exception:
            chain = []  # versions above an unreadable file are unusable
            continue
        if obj.get("delta"):
            chain.append((ver, obj))
            continue
        base = (ver, obj)
        break
    if base is None:
        return 0, None, 0
    files = set(base[1]["files"])
    top = base[0]
    for ver, obj in sorted(chain):
        files.update(obj["add"])
        files.difference_update(obj["remove"])
        top = ver
    return top, files, len(chain)


def current(meas_path: str, bk=None) -> tuple[int, list[str]] | None:
    """(version, relative file list) of the current snapshot, or None for
    an unmanaged tree. A torn/unreadable latest version falls back to the
    previous one (rename is atomic locally; on an object store a reader
    racing the PUT may see the key before the body — the prior chain
    is always complete)."""
    bk = bk or backend_for(meas_path)
    ver, files, _ = _load_state(bk, meas_path)
    if files is None:
        return None
    return ver, sorted(files)


def data_files(meas_path: str, bk=None) -> list[str] | None:
    """Absolute paths of the current snapshot's data files; None when the
    tree is unmanaged (caller falls back to the directory glob)."""
    bk = bk or backend_for(meas_path)
    cur = current(meas_path, bk=bk)
    if cur is None:
        return None
    _, rels = cur
    return [bk.join(meas_path, r) for r in rels]


def history(meas_path: str, bk=None) -> list[dict]:
    """Listable snapshot versions (oldest first): {version, kind
    full|delta, committed_at (file mtime, best effort), n_files for
    fulls / n_add+n_remove for deltas} — how an operator discovers
    pinnable time-travel versions (``files_at``/?snapshot=N)."""
    bk = bk or backend_for(meas_path)
    out = []
    for ver, path in _versions(bk, meas_path):
        entry: dict = {"version": ver}
        try:
            entry["committed_at"] = bk.mtime(path)
        except Exception:
            entry["committed_at"] = None
        try:
            obj = bk.read_json(path)
            if obj.get("delta"):
                entry["kind"] = "delta"
                entry["n_add"] = len(obj.get("add", []))
                entry["n_remove"] = len(obj.get("remove", []))
            else:
                entry["kind"] = "full"
                entry["n_files"] = len(obj.get("files", []))
        except Exception:
            entry["kind"] = "unreadable"
        out.append(entry)
    return out


def files_at(meas_path: str, version: int, bk=None) -> list[str]:
    """Absolute file paths of snapshot ``version`` — TIME TRAVEL for
    reproducible reads (a training pipeline pins the dataset version it
    consumed; Delta/Iceberg `VERSION AS OF` semantics on the engine's
    own snapshot chain).

    Raises :class:`ValueError` when the version is unknown, pruned away
    (version files age out — same caveat as Delta time travel after
    VACUUM), or its chain is unreadable. The FILES it references must
    also still exist: compaction with ``defer_input_deletion`` keeps
    replaced inputs until the reconciler sweeps them, which is the
    window where time travel across a compaction works."""
    bk = bk or backend_for(meas_path)
    vers = dict(_versions(bk, meas_path))
    if version not in vers:
        raise ValueError(
            f"snapshot v{version} not available for {meas_path} "
            "(unknown or pruned)")
    # newest readable FULL snapshot at or below the pin, then fold
    # deltas (base, version]
    base = None
    for ver in sorted((v for v in vers if v <= version), reverse=True):
        try:
            obj = bk.read_json(vers[ver])
        except Exception:
            continue
        if not obj.get("delta") and isinstance(obj.get("files"), list):
            base = (ver, set(obj["files"]))
            break
    if base is None:
        raise ValueError(
            f"no readable full snapshot at or below v{version} "
            f"for {meas_path}")
    files = base[1]
    for ver in sorted(v for v in vers if base[0] < v <= version):
        try:
            obj = bk.read_json(vers[ver])
        except Exception as e:
            raise ValueError(
                f"snapshot chain for v{version} unreadable at v{ver}: {e}"
            ) from None
        if obj.get("delta"):
            files.update(obj.get("add", []))
            files.difference_update(obj.get("remove", []))
        elif isinstance(obj.get("files"), list):
            files = set(obj["files"])
    return [bk.join(meas_path, r) for r in sorted(files)]


def _is_live_data_file(rel: str) -> bool:
    """True for committed-shape data files: .parquet, inside the tree,
    not under any tmp/staging/dot directory."""
    if not rel.endswith(".parquet"):
        return False
    parts = rel.replace("\\", "/").split("/")
    for p in parts[:-1]:
        if p.startswith(".") or p.startswith("_"):
            return False
        if ".compact-tmp-" in p or ".delete-tmp-" in p:
            return False
    name = parts[-1]
    return ".delete-tmp-" not in name and not name.startswith(".")


def live_glob(meas_path: str, bk=None) -> list[str]:
    """The unmanaged view: every live .parquet under the tree (tmp dirs,
    staging, dot/underscore dirs excluded) as RELATIVE paths."""
    bk = bk or backend_for(meas_path)
    if not bk.isdir(meas_path):
        return []
    out = []
    for f in bk.find_files(meas_path, suffix=".parquet"):
        rel = bk.relpath(f, meas_path).replace("\\", "/")
        if _is_live_data_file(rel):
            out.append(rel)
    return out


def _rel(bk, meas_path: str, path: str) -> str:
    p = path.replace("\\", "/")
    base = meas_path.rstrip("/") + "/"
    if p.startswith(base):
        return p[len(base):]
    return p  # already relative


class CommitContention(RuntimeError):
    """CAS retries exhausted — pathological multi-writer contention on one
    measurement (dozens of out-of-process commits inside one call's
    window). The operation is safe to retry; nothing was published."""


def commit(meas_path: str, add=(), remove=(), bk=None,
           max_retries: int = 64) -> int:
    """Publish the next snapshot = current ∪ add − remove. Returns the new
    version. On an unmanaged tree the base is a glob of live files (which
    already includes just-written adds), so the first commit adopts
    everything in place.

    Contract for writers: call AFTER the added files are fully written
    and BEFORE any removed file is physically deleted.

    Multi-process safety (the A24 collapse's precondition — compaction /
    retention / delete may run as SEPARATE Spark jobs against a serving
    engine): the version file is published with a compare-and-swap —
    ``move_file_excl`` fails if ``vN+1`` already exists (hard-link EEXIST
    on local filesystems; the reference's Raft RegisterFile ordering,
    internal/compaction/manifest.go, plays this role natively). A loser
    rereads the new current snapshot and retries with its add/remove sets
    reapplied, so two processes committing concurrently lose neither's
    files. Threads in one process additionally serialize on the local
    lock (cheaper than burning CAS retries). Object-store backends
    without a conditional create degrade to check-then-move:
    single-writer-per-measurement there, as documented in
    ``StorageBackend.move_file_excl``."""
    bk = bk or backend_for(meas_path)
    add_rel = [_rel(bk, meas_path, p) for p in add]
    rm_rel = [_rel(bk, meas_path, p) for p in remove]
    with _lock_for(meas_path):
        stuck = 0
        prev_ver: int | None = None
        for _ in range(max_retries):
            ver, files, chain_len = _load_state(bk, meas_path)
            if files is None:
                files = set(live_glob(meas_path, bk=bk))
                chain_len = FOLD_EVERY  # bootstrap is always a full write
            files.update(add_rel)
            files.difference_update(rm_rel)
            # ZOMBIE detection: a permanently unreadable/malformed version
            # above the readable fold makes ver+1 collide forever. Engage
            # ONLY after several CAS losses with a NON-advancing fold —
            # a live racing committer always advances ver between rereads,
            # so this cannot misfire on a healthy concurrent writer and
            # last-writer-win away its files (TOCTOU). The supersede is a
            # FULL snapshot because readers drop deltas above a bad file.
            stuck = stuck + 1 if prev_ver == ver else 0
            prev_ver = ver
            force_full = False
            new_ver = ver + 1
            if stuck >= 3:
                max_exist = max(
                    (v for v, _ in _versions(bk, meas_path)), default=0)
                if max_exist > ver:
                    new_ver = max_exist + 1
                    force_full = True
            d = _snap_dir(bk, meas_path)
            bk.mkdirs(d)
            tmp = bk.join(
                d, f".v{new_ver:012d}.json.tmp-{uuid.uuid4().hex[:8]}")
            if force_full or chain_len + 1 >= FOLD_EVERY:
                # periodic fold: one full snapshot bounds the read chain
                obj = {"version": new_ver, "files": sorted(files)}
            else:
                # incremental: O(changes) bytes, not O(files)
                obj = {"version": new_ver, "delta": True,
                       "add": sorted(set(add_rel)),
                       "remove": sorted(set(rm_rel))}
            bk.write_json(tmp, obj)
            if not bk.move_file_excl(
                    tmp, bk.join(d, f"v{new_ver:012d}.json")):
                continue  # lost the race to another process: reread, retry
            # prune history beyond KEEP_VERSIONS — but never young files:
            # an age floor keeps a racing committer's just-read current
            # version from vanishing mid-CAS even under a version burst
            vers = _versions(bk, meas_path)
            for _, path in vers[:-KEEP_VERSIONS]:
                try:
                    if time.time() - bk.mtime(path) < PRUNE_MIN_AGE_S:
                        continue
                except (OSError, KeyError):
                    continue
                bk.remove_file_if_exists(path)
            return new_ver
        raise CommitContention(
            f"{meas_path}: snapshot CAS lost {max_retries} consecutive "
            "races — check for a runaway external committer")


def contains(meas_path: str, path: str, bk=None) -> bool | None:
    """Is ``path`` in the current snapshot? None when unmanaged."""
    bk = bk or backend_for(meas_path)
    cur = current(meas_path, bk=bk)
    if cur is None:
        return None
    return _rel(bk, meas_path, path) in set(cur[1])
