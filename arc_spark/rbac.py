"""Hierarchical RBAC: organizations → teams → roles → measurement
permissions, with token→team memberships.

Reference surface: ``internal/auth/rbac_models.go:1-125`` (entities),
``internal/auth/rbac_manager.go:285-2275`` (CRUD + two-level permission
cache + check semantics), ``internal/api/rbac_routes.go:79-774`` (REST
surface). Behavior kept, code ours — the reference replicates writes
through Raft (cluster mode); standalone Spark collapses that to direct
SQLite writes under one lock, exactly like its own single-node path.

Check semantics (reference ``checkPermissionUncached``,
``checkRBACPermissionCached``, ``checkOSSPermission``):

- token with NO team memberships → OSS token-permission check only
  (backward compat).
- token with memberships → walk enabled teams → roles whose
  ``database_pattern`` matches the database; if the request names a
  measurement AND the role has measurement permissions, ONLY a matching
  measurement pattern can grant — a role with measurement permissions
  where none match is a deny *for that role* even if its role-level
  permissions would allow (least-privilege narrowing). Roles without
  measurement permissions grant at role level.
- RBAC denial still falls back to OSS token permissions (a team
  membership must never *reduce* what the bare token could do).
- ``admin`` in a permission list implies every permission.

Pattern language (reference ``matchPattern``): ``*`` matches all;
``prefix_*`` / ``*_suffix`` match on the underscore boundary; a bare
trailing ``*`` is a prefix match; otherwise exact.

The reference gates RBAC behind an enterprise license
(``IsRBACEnabled``, license.FeatureRBAC); licensing is out of scope
here, so the gate is the ``[rbac] enabled`` config flag with identical
disabled behavior (OSS checks only).

Token identity: the reference keys memberships by the token's surrogate
integer id, which survives rotation. Our ``AuthStore`` keys tokens by
unique *name* (also rotation-stable), so memberships store the token
name.
"""

from __future__ import annotations

import sqlite3
import threading
import time

VALID_PERMISSIONS = ("read", "write", "delete", "admin")

# reference rbac_manager.go: bounded cascade — deleting an org/team with
# more descendants than this refuses and tells the operator to delete
# children first (guards against a fat-finger wiping a whole tenant).
MAX_CASCADE_DESCENDANTS = 1000

PERM_CACHE_TTL_S = 30.0
PERM_CACHE_MAX = 10_000
TOKEN_CACHE_TTL_S = 30.0


class RBACError(Exception):
    """Validation / not-found errors from the RBAC store (mapped to
    4xx by the HTTP layer)."""


def match_pattern(pattern: str, value: str) -> bool:
    """Wildcard match (reference rbac_manager.go:1968 matchPattern):
    ``*``, ``prefix_*``, ``*_suffix``, trailing-``*`` prefix, exact."""
    if pattern == "*":
        return True
    if pattern.endswith("_*"):
        return value.startswith(pattern[:-2] + "_")
    if pattern.startswith("*_"):
        return value.endswith("_" + pattern[2:])
    if pattern.endswith("*"):
        return value.startswith(pattern[:-1])
    return pattern == value


def _contains_permission(perms: list[str], wanted: str) -> bool:
    return "admin" in perms or wanted in perms


def _check_oss(token_info: dict, wanted: str) -> tuple[bool, str, str]:
    """OSS token-permission check (reference checkOSSPermission):
    the token's own flat permission list, no hierarchy."""
    perms = token_info.get("permissions") or []
    if _contains_permission(perms, wanted):
        return True, "token", ""
    return False, "denied", f"token does not have '{wanted}' permission"


def _validate_perms(perms: list[str]) -> list[str]:
    if not perms:
        raise RBACError("permissions list must be non-empty")
    for p in perms:
        if p not in VALID_PERMISSIONS:
            raise RBACError(
                f"invalid permission {p!r}; valid: {VALID_PERMISSIONS}")
    return list(dict.fromkeys(perms))  # dedupe, keep order


class RBACStore:
    """SQLite-backed RBAC hierarchy + two-level permission cache.

    ``enabled=False`` (the default) preserves pure-OSS behavior: every
    check routes to the token's flat permission list, and the REST
    surface still works so operators can stage a hierarchy before
    flipping the flag (reference: license activation).
    """

    def __init__(self, path: str = ":memory:", enabled: bool = True):
        self._db = sqlite3.connect(path, check_same_thread=False)
        self._db.execute("PRAGMA foreign_keys = ON")
        self._lock = threading.Lock()
        self.enabled = enabled
        # perm-result cache: (token, db, meas, perm) -> (result, expires)
        self._perm_cache: dict[tuple, tuple[tuple, float]] = {}
        # token RBAC data cache: token_name -> (data, expires)
        self._token_cache: dict[str, tuple[dict, float]] = {}
        self.cache_hits = 0
        self.cache_misses = 0
        with self._lock:
            self._db.executescript(
                """
                CREATE TABLE IF NOT EXISTS rbac_organizations (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    name TEXT UNIQUE NOT NULL,
                    description TEXT NOT NULL DEFAULT '',
                    enabled INTEGER NOT NULL DEFAULT 1,
                    created_at REAL NOT NULL,
                    updated_at REAL NOT NULL
                );
                CREATE TABLE IF NOT EXISTS rbac_teams (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    organization_id INTEGER NOT NULL
                        REFERENCES rbac_organizations(id),
                    name TEXT NOT NULL,
                    description TEXT NOT NULL DEFAULT '',
                    enabled INTEGER NOT NULL DEFAULT 1,
                    created_at REAL NOT NULL,
                    updated_at REAL NOT NULL,
                    UNIQUE(organization_id, name)
                );
                CREATE TABLE IF NOT EXISTS rbac_roles (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    team_id INTEGER NOT NULL REFERENCES rbac_teams(id),
                    database_pattern TEXT NOT NULL,
                    permissions TEXT NOT NULL,
                    created_at REAL NOT NULL
                );
                CREATE TABLE IF NOT EXISTS rbac_measurement_permissions (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    role_id INTEGER NOT NULL REFERENCES rbac_roles(id),
                    measurement_pattern TEXT NOT NULL,
                    permissions TEXT NOT NULL,
                    created_at REAL NOT NULL
                );
                CREATE TABLE IF NOT EXISTS rbac_token_memberships (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    token_name TEXT NOT NULL,
                    team_id INTEGER NOT NULL REFERENCES rbac_teams(id),
                    created_at REAL NOT NULL,
                    UNIQUE(token_name, team_id)
                );
                CREATE INDEX IF NOT EXISTS idx_rbac_teams_org
                    ON rbac_teams(organization_id);
                CREATE INDEX IF NOT EXISTS idx_rbac_roles_team
                    ON rbac_roles(team_id);
                CREATE INDEX IF NOT EXISTS idx_rbac_mp_role
                    ON rbac_measurement_permissions(role_id);
                CREATE INDEX IF NOT EXISTS idx_rbac_membership_token
                    ON rbac_token_memberships(token_name);
                """
            )
            self._db.commit()

    # -- caches ------------------------------------------------------------
    def invalidate_all_cache(self) -> None:
        """After role/team/permission changes — affects unknown tokens
        (reference InvalidateAllCache)."""
        with self._lock:
            self._perm_cache.clear()
            self._token_cache.clear()

    def invalidate_token_cache(self, token_name: str) -> None:
        with self._lock:
            self._token_cache.pop(token_name, None)
            for k in [k for k in self._perm_cache if k[0] == token_name]:
                del self._perm_cache[k]

    # -- organizations -----------------------------------------------------
    def create_organization(self, name: str, description: str = "") -> dict:
        if not name:
            raise RBACError("organization name required")
        now = time.time()
        with self._lock:
            try:
                cur = self._db.execute(
                    "INSERT INTO rbac_organizations"
                    " (name, description, created_at, updated_at)"
                    " VALUES (?, ?, ?, ?)",
                    (name, description, now, now),
                )
            except sqlite3.IntegrityError:
                raise RBACError(f"organization {name!r} already exists")
            self._db.commit()
            oid = cur.lastrowid
        return self.get_organization(oid)

    def list_organizations(self) -> list[dict]:
        with self._lock:
            rows = self._db.execute(
                "SELECT id, name, description, enabled, created_at,"
                " updated_at FROM rbac_organizations ORDER BY id"
            ).fetchall()
        return [self._org_row(r) for r in rows]

    @staticmethod
    def _org_row(r) -> dict:
        return {"id": r[0], "name": r[1], "description": r[2],
                "enabled": bool(r[3]), "created_at": r[4],
                "updated_at": r[5]}

    def get_organization(self, org_id: int, with_teams: bool = False) -> dict:
        with self._lock:
            r = self._db.execute(
                "SELECT id, name, description, enabled, created_at,"
                " updated_at FROM rbac_organizations WHERE id = ?",
                (org_id,),
            ).fetchone()
        if r is None:
            raise RBACError(f"organization {org_id} not found")
        org = self._org_row(r)
        if with_teams:
            org["teams"] = self.list_teams(org_id)
        return org

    def update_organization(self, org_id: int, *, name: str | None = None,
                            description: str | None = None,
                            enabled: bool | None = None) -> dict:
        self.get_organization(org_id)  # existence check
        sets, vals = ["updated_at = ?"], [time.time()]
        if name is not None:
            sets.append("name = ?"); vals.append(name)
        if description is not None:
            sets.append("description = ?"); vals.append(description)
        if enabled is not None:
            sets.append("enabled = ?"); vals.append(int(enabled))
        with self._lock:
            try:
                self._db.execute(
                    f"UPDATE rbac_organizations SET {', '.join(sets)}"
                    " WHERE id = ?", (*vals, org_id))
            except sqlite3.IntegrityError:
                raise RBACError(f"organization {name!r} already exists")
            self._db.commit()
        self.invalidate_all_cache()
        return self.get_organization(org_id)

    def delete_organization(self, org_id: int) -> None:
        self.get_organization(org_id)
        with self._lock:
            team_ids = [r[0] for r in self._db.execute(
                "SELECT id FROM rbac_teams WHERE organization_id = ?",
                (org_id,))]
            n = len(team_ids) + sum(
                self._count_team_descendants(t) for t in team_ids)
            if n > MAX_CASCADE_DESCENDANTS:
                raise RBACError(
                    f"{n} descendants under organization {org_id}"
                    f" (max {MAX_CASCADE_DESCENDANTS}); delete child"
                    " entities first")
            for t in team_ids:
                self._delete_team_tree(t)
            self._db.execute(
                "DELETE FROM rbac_organizations WHERE id = ?", (org_id,))
            self._db.commit()
        self.invalidate_all_cache()

    # -- teams -------------------------------------------------------------
    def create_team(self, org_id: int, name: str,
                    description: str = "") -> dict:
        self.get_organization(org_id)
        if not name:
            raise RBACError("team name required")
        now = time.time()
        with self._lock:
            try:
                cur = self._db.execute(
                    "INSERT INTO rbac_teams (organization_id, name,"
                    " description, created_at, updated_at)"
                    " VALUES (?, ?, ?, ?, ?)",
                    (org_id, name, description, now, now),
                )
            except sqlite3.IntegrityError:
                raise RBACError(
                    f"team {name!r} already exists in organization {org_id}")
            self._db.commit()
            tid = cur.lastrowid
        return self.get_team(tid)

    @staticmethod
    def _team_row(r) -> dict:
        return {"id": r[0], "organization_id": r[1], "name": r[2],
                "description": r[3], "enabled": bool(r[4]),
                "created_at": r[5], "updated_at": r[6]}

    def list_teams(self, org_id: int) -> list[dict]:
        with self._lock:
            rows = self._db.execute(
                "SELECT id, organization_id, name, description, enabled,"
                " created_at, updated_at FROM rbac_teams"
                " WHERE organization_id = ? ORDER BY id", (org_id,)
            ).fetchall()
        return [self._team_row(r) for r in rows]

    def get_team(self, team_id: int, with_roles: bool = False) -> dict:
        with self._lock:
            r = self._db.execute(
                "SELECT id, organization_id, name, description, enabled,"
                " created_at, updated_at FROM rbac_teams WHERE id = ?",
                (team_id,),
            ).fetchone()
        if r is None:
            raise RBACError(f"team {team_id} not found")
        team = self._team_row(r)
        if with_roles:
            team["roles"] = self.list_roles(team_id)
        return team

    def update_team(self, team_id: int, *, name: str | None = None,
                    description: str | None = None,
                    enabled: bool | None = None) -> dict:
        self.get_team(team_id)
        sets, vals = ["updated_at = ?"], [time.time()]
        if name is not None:
            sets.append("name = ?"); vals.append(name)
        if description is not None:
            sets.append("description = ?"); vals.append(description)
        if enabled is not None:
            sets.append("enabled = ?"); vals.append(int(enabled))
        with self._lock:
            try:
                self._db.execute(
                    f"UPDATE rbac_teams SET {', '.join(sets)} WHERE id = ?",
                    (*vals, team_id))
            except sqlite3.IntegrityError:
                raise RBACError(f"team {name!r} already exists")
            self._db.commit()
        self.invalidate_all_cache()
        return self.get_team(team_id)

    def _count_team_descendants(self, team_id: int) -> int:
        role_ids = [r[0] for r in self._db.execute(
            "SELECT id FROM rbac_roles WHERE team_id = ?", (team_id,))]
        n = len(role_ids)
        n += self._db.execute(
            "SELECT COUNT(*) FROM rbac_token_memberships WHERE team_id = ?",
            (team_id,)).fetchone()[0]
        for rid in role_ids:
            n += self._db.execute(
                "SELECT COUNT(*) FROM rbac_measurement_permissions"
                " WHERE role_id = ?", (rid,)).fetchone()[0]
        return n

    def _delete_team_tree(self, team_id: int) -> None:
        """Caller holds the lock."""
        self._db.execute(
            "DELETE FROM rbac_measurement_permissions WHERE role_id IN"
            " (SELECT id FROM rbac_roles WHERE team_id = ?)", (team_id,))
        self._db.execute(
            "DELETE FROM rbac_roles WHERE team_id = ?", (team_id,))
        self._db.execute(
            "DELETE FROM rbac_token_memberships WHERE team_id = ?",
            (team_id,))
        self._db.execute("DELETE FROM rbac_teams WHERE id = ?", (team_id,))

    def delete_team(self, team_id: int) -> None:
        self.get_team(team_id)
        with self._lock:
            n = self._count_team_descendants(team_id)
            if n > MAX_CASCADE_DESCENDANTS:
                raise RBACError(
                    f"{n} descendants under team {team_id}"
                    f" (max {MAX_CASCADE_DESCENDANTS}); delete child"
                    " entities first")
            self._delete_team_tree(team_id)
            self._db.commit()
        self.invalidate_all_cache()

    # -- roles -------------------------------------------------------------
    def create_role(self, team_id: int, database_pattern: str,
                    permissions: list[str]) -> dict:
        self.get_team(team_id)
        if not database_pattern:
            raise RBACError("database_pattern required")
        perms = _validate_perms(permissions)
        with self._lock:
            cur = self._db.execute(
                "INSERT INTO rbac_roles (team_id, database_pattern,"
                " permissions, created_at) VALUES (?, ?, ?, ?)",
                (team_id, database_pattern, ",".join(perms), time.time()),
            )
            self._db.commit()
            rid = cur.lastrowid
        self.invalidate_all_cache()
        return self.get_role(rid)

    @staticmethod
    def _role_row(r) -> dict:
        return {"id": r[0], "team_id": r[1], "database_pattern": r[2],
                "permissions": r[3].split(","), "created_at": r[4]}

    def list_roles(self, team_id: int) -> list[dict]:
        with self._lock:
            rows = self._db.execute(
                "SELECT id, team_id, database_pattern, permissions,"
                " created_at FROM rbac_roles WHERE team_id = ? ORDER BY id",
                (team_id,),
            ).fetchall()
        return [self._role_row(r) for r in rows]

    def get_role(self, role_id: int, with_measurements: bool = False) -> dict:
        with self._lock:
            r = self._db.execute(
                "SELECT id, team_id, database_pattern, permissions,"
                " created_at FROM rbac_roles WHERE id = ?", (role_id,)
            ).fetchone()
        if r is None:
            raise RBACError(f"role {role_id} not found")
        role = self._role_row(r)
        if with_measurements:
            role["measurement_permissions"] = (
                self.list_measurement_permissions(role_id))
        return role

    def update_role(self, role_id: int, *,
                    database_pattern: str | None = None,
                    permissions: list[str] | None = None) -> dict:
        self.get_role(role_id)
        sets, vals = [], []
        if database_pattern is not None:
            if not database_pattern:
                raise RBACError("database_pattern required")
            sets.append("database_pattern = ?"); vals.append(database_pattern)
        if permissions is not None:
            sets.append("permissions = ?")
            vals.append(",".join(_validate_perms(permissions)))
        if sets:
            with self._lock:
                self._db.execute(
                    f"UPDATE rbac_roles SET {', '.join(sets)} WHERE id = ?",
                    (*vals, role_id))
                self._db.commit()
            self.invalidate_all_cache()
        return self.get_role(role_id)

    def delete_role(self, role_id: int) -> None:
        self.get_role(role_id)
        with self._lock:
            self._db.execute(
                "DELETE FROM rbac_measurement_permissions WHERE role_id = ?",
                (role_id,))
            self._db.execute(
                "DELETE FROM rbac_roles WHERE id = ?", (role_id,))
            self._db.commit()
        self.invalidate_all_cache()

    # -- measurement permissions ------------------------------------------
    def create_measurement_permission(
            self, role_id: int, measurement_pattern: str,
            permissions: list[str]) -> dict:
        self.get_role(role_id)
        if not measurement_pattern:
            raise RBACError("measurement_pattern required")
        perms = _validate_perms(permissions)
        with self._lock:
            cur = self._db.execute(
                "INSERT INTO rbac_measurement_permissions"
                " (role_id, measurement_pattern, permissions, created_at)"
                " VALUES (?, ?, ?, ?)",
                (role_id, measurement_pattern, ",".join(perms), time.time()),
            )
            self._db.commit()
            mid = cur.lastrowid
        self.invalidate_all_cache()
        return {"id": mid, "role_id": role_id,
                "measurement_pattern": measurement_pattern,
                "permissions": perms}

    def list_measurement_permissions(self, role_id: int) -> list[dict]:
        with self._lock:
            rows = self._db.execute(
                "SELECT id, role_id, measurement_pattern, permissions,"
                " created_at FROM rbac_measurement_permissions"
                " WHERE role_id = ? ORDER BY id", (role_id,)
            ).fetchall()
        return [{"id": r[0], "role_id": r[1], "measurement_pattern": r[2],
                 "permissions": r[3].split(","), "created_at": r[4]}
                for r in rows]

    def delete_measurement_permission(self, mp_id: int) -> None:
        with self._lock:
            cur = self._db.execute(
                "DELETE FROM rbac_measurement_permissions WHERE id = ?",
                (mp_id,))
            self._db.commit()
        if cur.rowcount == 0:
            raise RBACError(f"measurement permission {mp_id} not found")
        self.invalidate_all_cache()

    # -- token memberships -------------------------------------------------
    def add_token_to_team(self, token_name: str, team_id: int) -> dict:
        self.get_team(team_id)
        if not token_name:
            raise RBACError("token_name required")
        with self._lock:
            try:
                cur = self._db.execute(
                    "INSERT INTO rbac_token_memberships"
                    " (token_name, team_id, created_at) VALUES (?, ?, ?)",
                    (token_name, team_id, time.time()),
                )
            except sqlite3.IntegrityError:
                raise RBACError(
                    f"token {token_name!r} already in team {team_id}")
            self._db.commit()
            mid = cur.lastrowid
        self.invalidate_token_cache(token_name)
        return {"id": mid, "token_name": token_name, "team_id": team_id}

    def remove_token_from_team(self, token_name: str, team_id: int) -> None:
        with self._lock:
            cur = self._db.execute(
                "DELETE FROM rbac_token_memberships"
                " WHERE token_name = ? AND team_id = ?",
                (token_name, team_id))
            self._db.commit()
        if cur.rowcount == 0:
            raise RBACError(
                f"token {token_name!r} is not in team {team_id}")
        self.invalidate_token_cache(token_name)

    def list_team_tokens(self, team_id: int) -> list[dict]:
        self.get_team(team_id)
        with self._lock:
            rows = self._db.execute(
                "SELECT id, token_name, team_id, created_at"
                " FROM rbac_token_memberships WHERE team_id = ?"
                " ORDER BY id", (team_id,)
            ).fetchall()
        return [{"id": r[0], "token_name": r[1], "team_id": r[2],
                 "created_at": r[3]} for r in rows]

    # -- permission checks -------------------------------------------------
    def _load_token_data(self, token_name: str) -> dict:
        """teams + roles + measurement perms reachable from the token's
        memberships, one snapshot (reference getTokenRBACData)."""
        with self._lock:
            team_rows = self._db.execute(
                "SELECT t.id, t.organization_id, t.name, t.description,"
                " t.enabled, t.created_at, t.updated_at"
                " FROM rbac_teams t"
                " JOIN rbac_token_memberships m ON m.team_id = t.id"
                " JOIN rbac_organizations o ON o.id = t.organization_id"
                " WHERE m.token_name = ? AND o.enabled = 1",
                (token_name,),
            ).fetchall()
            teams = [self._team_row(r) for r in team_rows]
            roles: dict[int, list[dict]] = {}
            meas: dict[int, list[dict]] = {}
            for team in teams:
                role_rows = self._db.execute(
                    "SELECT id, team_id, database_pattern, permissions,"
                    " created_at FROM rbac_roles WHERE team_id = ?",
                    (team["id"],),
                ).fetchall()
                roles[team["id"]] = [self._role_row(r) for r in role_rows]
                for role in roles[team["id"]]:
                    mp_rows = self._db.execute(
                        "SELECT measurement_pattern, permissions"
                        " FROM rbac_measurement_permissions"
                        " WHERE role_id = ?", (role["id"],),
                    ).fetchall()
                    meas[role["id"]] = [
                        {"measurement_pattern": p, "permissions": s.split(",")}
                        for p, s in mp_rows]
        return {"teams": teams, "roles": roles, "meas": meas}

    def _token_data(self, token_name: str) -> dict:
        now = time.time()
        with self._lock:
            hit = self._token_cache.get(token_name)
            if hit and now < hit[1]:
                return hit[0]
        data = self._load_token_data(token_name)
        with self._lock:
            self._token_cache[token_name] = (data, now + TOKEN_CACHE_TTL_S)
        return data

    def _check_rbac_grant(self, data: dict, database: str,
                          measurement: str, wanted: str) -> bool:
        for team in data["teams"]:
            if not team["enabled"]:
                continue
            for role in data["roles"].get(team["id"], []):
                if not match_pattern(role["database_pattern"], database):
                    continue
                if measurement:
                    mps = data["meas"].get(role["id"], [])
                    if mps:
                        # measurement perms present: only a matching
                        # pattern can grant; no role-level fallthrough
                        for mp in mps:
                            if (match_pattern(mp["measurement_pattern"],
                                              measurement)
                                    and _contains_permission(
                                        mp["permissions"], wanted)):
                                return True
                        continue
                if _contains_permission(role["permissions"], wanted):
                    return True
        return False

    def check_permission(self, token_info: dict | None, database: str,
                         measurement: str, permission: str) -> dict:
        """→ {allowed, source ('token'|'rbac'|'denied'), reason}."""
        if token_info is None:
            return {"allowed": False, "source": "denied",
                    "reason": "no token provided"}
        if not self.enabled:
            ok, src, why = _check_oss(token_info, permission)
            return {"allowed": ok, "source": src, "reason": why}
        token_name = token_info["name"]
        key = (token_name, database, measurement, permission)
        now = time.time()
        with self._lock:
            hit = self._perm_cache.get(key)
            if hit and now < hit[1]:
                self.cache_hits += 1
                return dict(hit[0][0])
        self.cache_misses += 1
        result = self._check_uncached(token_info, database, measurement,
                                      permission)
        with self._lock:
            if len(self._perm_cache) >= PERM_CACHE_MAX:
                self._perm_cache.clear()  # blunt eviction, same as a miss
            self._perm_cache[key] = ((result,), now + PERM_CACHE_TTL_S)
        return dict(result)

    def _check_uncached(self, token_info: dict, database: str,
                        measurement: str, permission: str) -> dict:
        data = self._token_data(token_info["name"])
        if not data["teams"]:
            ok, src, why = _check_oss(token_info, permission)
            return {"allowed": ok, "source": src, "reason": why}
        if self._check_rbac_grant(data, database, measurement, permission):
            return {"allowed": True, "source": "rbac", "reason": ""}
        ok, src, why = _check_oss(token_info, permission)
        if ok:
            return {"allowed": True, "source": src, "reason": ""}
        return {"allowed": False, "source": "denied",
                "reason": (f"no permission for {permission} on database"
                           f" '{database}'")}

    def check_permissions_batch(self, reqs: list[tuple]) -> list[dict]:
        """reqs: [(token_info, database, measurement, permission)].
        One token-data load per distinct token (reference
        CheckPermissionsBatch)."""
        return [self.check_permission(*r) for r in reqs]

    def get_effective_permissions(self, token_info: dict) -> list[dict]:
        """Resolved grants for a token: its OSS permissions plus every
        role/measurement grant reachable via memberships (reference
        GetEffectivePermissions)."""
        perms: list[dict] = []
        oss = token_info.get("permissions") or []
        if oss:
            perms.append({"database": "*", "permissions": list(oss),
                          "source": "token"})
        if not self.enabled:
            return perms
        data = self._token_data(token_info["name"])
        for team in data["teams"]:
            if not team["enabled"]:
                continue
            for role in data["roles"].get(team["id"], []):
                mps = data["meas"].get(role["id"], [])
                if mps:
                    for mp in mps:
                        perms.append({
                            "database": role["database_pattern"],
                            "measurement": mp["measurement_pattern"],
                            "permissions": list(mp["permissions"]),
                            "source": "rbac"})
                else:
                    perms.append({
                        "database": role["database_pattern"],
                        "permissions": list(role["permissions"]),
                        "source": "rbac"})
        return perms
