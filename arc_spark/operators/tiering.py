"""Hot→cold storage tiering (reference A35, /root/reference/internal/tiering/
migrator.go, metadata.go, policy.go).

Age-based migration of whole day-partition directories from the hot root to
a cold root. Reads stay transparent: :class:`arc_spark.catalog.
MeasurementCatalog` already unions hot ∪ cold paths per measurement
(reference A4 buildMultiTierReadParquet), so a migrated partition is
invisible to queries except for storage latency.

The hot and cold roots may live on DIFFERENT storage backends
(:mod:`arc_spark.storage`; reference internal/storage/backend.go) — the
canonical deployment tiers local NVMe to an object store. Same-backend
moves try a rename first (free on local/HDFS); cross-backend or
no-rename stores take the copy-verify-delete path, and a partition is
only deleted from hot after its cold copy holds every hot file (crash
leaves a duplicate, never a loss — the catalog's union read tolerates
the duplicate window).
"""

from __future__ import annotations

import datetime as dt

import pyarrow.fs as pafs

from arc_spark.storage import backend_for


def _day_dirs(meas_path: str) -> list[str]:
    """All year=/month=/day= directories under a measurement path."""
    return backend_for(meas_path).partition_dirs(
        meas_path, ["year=", "month=", "day="]
    )


def _dir_day(day_dir: str) -> dt.datetime:
    parts = dict(p.split("=") for p in day_dir.split("/") if "=" in p)
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
    from arc_spark import snapshots

    hot_bk = backend_for(root)
    cold_bk = backend_for(cold_root)
    same_backend = hot_bk is cold_bk
    now = now or dt.datetime.now()
    cutoff = now - dt.timedelta(days=older_than_days)
    hot_meas = hot_bk.join(root, db, measurement)
    cold_meas = cold_bk.join(cold_root, db, measurement)
    # snapshot-managed tiers take the copy protocol even on one backend:
    # a whole-dir rename would yank files out from under the committed
    # hot snapshot before any commit could follow (readers error on
    # missing files), whereas copy → commit cold add → commit hot remove
    # → delete hot is re-runnable from every crash point (worst window:
    # the day visible on both tiers, healed by the next run)
    managed = (snapshots.is_managed(hot_meas, bk=hot_bk)
               or snapshots.is_managed(cold_meas, bk=cold_bk))
    moved: list[str] = []
    for day_dir in _day_dirs(hot_meas):
        if _dir_day(day_dir) >= cutoff:
            continue
        rel = hot_bk.relpath(day_dir, hot_meas)
        dest = cold_bk.join(cold_meas, rel)
        cold_bk.mkdirs(cold_bk.dirname(dest))
        if not cold_bk.exists(dest):
            if same_backend and not managed:
                try:
                    hot_bk.move_dir(day_dir, dest)  # rename fast path
                    moved.append(rel)
                    continue
                except OSError:
                    pass
            pafs.copy_files(
                hot_bk.fs_path(day_dir),
                cold_bk.fs_path(dest),
                source_filesystem=hot_bk.fs,
                destination_filesystem=cold_bk.fs,
            )
        # copy exists (from this run or a crashed prior one): verify + drop hot
        hot_files = {hot_bk.basename(f) for f in hot_bk.find_files(day_dir)}
        cold_files = {cold_bk.basename(f) for f in cold_bk.find_files(dest)}
        if hot_files <= cold_files:
            if managed:
                cold_add = [f for f in cold_bk.find_files(dest, suffix=".parquet")]
                hot_del = hot_bk.find_files(day_dir, suffix=".parquet")
                snapshots.commit(cold_meas, add=cold_add, bk=cold_bk)
                snapshots.commit(hot_meas, remove=hot_del, bk=hot_bk)
            hot_bk.remove_tree(day_dir)
            moved.append(rel)
    return moved


def tier_report(root: str, cold_root: str, db: str, measurement: str) -> dict:
    """Which day partitions live on which tier (reference tiering metadata)."""
    hot_bk = backend_for(root)
    cold_bk = backend_for(cold_root)
    hot_meas = hot_bk.join(root, db, measurement)
    cold_meas = cold_bk.join(cold_root, db, measurement)
    hot = {hot_bk.relpath(p, hot_meas) for p in _day_dirs(hot_meas)}
    cold = {cold_bk.relpath(p, cold_meas) for p in _day_dirs(cold_meas)}
    return {
        "hot_only": sorted(hot - cold),
        "cold_only": sorted(cold - hot),
        "both": sorted(hot & cold),
    }
