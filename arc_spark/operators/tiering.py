"""Hot→cold storage tiering (reference A35, /root/reference/internal/tiering/
migrator.go, metadata.go, policy.go).

Age-based migration of whole day-partition directories from the hot root to
a cold root. Reads stay transparent: :class:`arc_spark.catalog.
MeasurementCatalog` already unions hot ∪ cold paths per measurement
(reference A4 buildMultiTierReadParquet), so a migrated partition is
invisible to queries except for storage latency.

In a cloud deployment "cold" is an object-store storage class and this
becomes a lifecycle policy; the explicit move keeps local/self-hosted
parity with the reference. Moves are directory renames when hot and cold
share a filesystem, copy+delete otherwise, and a partition is only deleted
from hot after its cold copy is complete (crash leaves a duplicate, never
a loss — and the catalog's union read with day-level dedup by filename
tolerates the duplicate window).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil


def _day_dirs(meas_path: str) -> list[str]:
    """All year=/month=/day= directories under a measurement path."""
    out = []
    for y in sorted(os.listdir(meas_path)) if os.path.isdir(meas_path) else []:
        if not y.startswith("year="):
            continue
        ydir = os.path.join(meas_path, y)
        for m in sorted(os.listdir(ydir)):
            if not m.startswith("month="):
                continue
            mdir = os.path.join(ydir, m)
            for d in sorted(os.listdir(mdir)):
                if d.startswith("day="):
                    out.append(os.path.join(mdir, d))
    return out


def _dir_day(day_dir: str) -> dt.datetime:
    parts = dict(
        p.split("=") for p in day_dir.split(os.sep) if "=" in p
    )
    return dt.datetime(int(parts["year"]), int(parts["month"]), int(parts["day"]))


def migrate_to_cold(
    root: str,
    cold_root: str,
    db: str,
    measurement: str,
    older_than_days: int,
    now: dt.datetime | None = None,
) -> list[str]:
    """Move day partitions older than the cutoff to the cold root.

    Returns the list of migrated day-relative paths. Safe to re-run; a
    partially-migrated day (both copies exist) is completed by deleting
    the hot copy only when the cold copy holds every hot file.
    """
    now = now or dt.datetime.now()
    cutoff = now - dt.timedelta(days=older_than_days)
    hot_meas = os.path.join(root, db, measurement)
    cold_meas = os.path.join(cold_root, db, measurement)
    moved: list[str] = []
    for day_dir in _day_dirs(hot_meas):
        if _dir_day(day_dir) >= cutoff:
            continue
        rel = os.path.relpath(day_dir, hot_meas)
        dest = os.path.join(cold_meas, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if not os.path.exists(dest):
            try:
                os.rename(day_dir, dest)  # same-fs fast path
                moved.append(rel)
                continue
            except OSError:
                shutil.copytree(day_dir, dest)
        # copy exists (from this run or a crashed prior one): verify + drop hot
        hot_files = set(os.listdir(day_dir))
        cold_files = set(os.listdir(dest))
        if hot_files <= cold_files:
            shutil.rmtree(day_dir)
            moved.append(rel)
    return moved


def tier_report(root: str, cold_root: str, db: str, measurement: str) -> dict:
    """Which day partitions live on which tier (reference tiering metadata)."""
    hot = {os.path.relpath(p, os.path.join(root, db, measurement))
           for p in _day_dirs(os.path.join(root, db, measurement))}
    cold = {os.path.relpath(p, os.path.join(cold_root, db, measurement))
            for p in _day_dirs(os.path.join(cold_root, db, measurement))}
    return {
        "hot_only": sorted(hot - cold),
        "cold_only": sorted(cold - hot),
        "both": sorted(hot & cold),
    }
