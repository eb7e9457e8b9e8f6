"""Data lifecycle: retention (file/partition TTL) and predicate delete (GDPR).

Reference:
- retention (A27, /root/reference/internal/api/retention.go:407-900): cutoff
  = now − (retention_days + buffer); files whose max(time) < cutoff are
  removed. With hive partitioning this becomes partition-prefix deletes —
  no file content ever read.
- predicate delete (A26, /root/reference/internal/api/delete.go:531-870):
  find files containing matches, rewrite each keeping NOT(pred), swap.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _remove_with_crc(path: str) -> None:
    """Remove a file plus Hadoop local-FS '.name.crc' sidecar — a stale crc
    next to a rewritten file fails reads with ChecksumException."""
    if os.path.exists(path):
        os.remove(path)
    crc = os.path.join(os.path.dirname(path), "." + os.path.basename(path) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)


def _partition_day(day_dir: str) -> dt.datetime:
    parts = {}
    for seg in day_dir.split(os.sep):
        if "=" in seg:
            k, v = seg.split("=", 1)
            parts[k] = int(v)
    return dt.datetime(parts["year"], parts["month"], parts["day"])


def apply_retention(
    root: str,
    db: str,
    measurement: str,
    retention_days: float,
    buffer_days: float = 1.0,
    now: dt.datetime | None = None,
) -> list[str]:
    """Drop whole day partitions older than the cutoff. Returns removed dirs.

    O(#partitions) directory math — the 100 TB path: no scan, no rewrite,
    exactly like dropping `day=` prefixes on object storage."""
    now = now or dt.datetime.utcnow()
    cutoff = now - dt.timedelta(days=retention_days + buffer_days)
    removed = []
    meas = os.path.join(root, db, measurement)
    for day_dir in sorted(glob.glob(os.path.join(meas, "year=*/month=*/day=*"))):
        day = _partition_day(day_dir)
        # a whole day is droppable only if its last instant is before cutoff
        if day + dt.timedelta(days=1) <= cutoff:
            shutil.rmtree(day_dir)
            removed.append(day_dir)
    return removed


def count_matching(spark: SparkSession, meas_path: str, predicate_sql: str) -> int:
    """DELETE dry-run: how many rows would go (reference estimate step,
    delete.go:635)."""
    df = spark.read.option("mergeSchema", "true").parquet(meas_path)
    return df.filter(F.expr(predicate_sql)).count()


def delete_where(
    spark: SparkSession,
    root: str,
    db: str,
    measurement: str,
    predicate_sql: str,
    dry_run: bool = False,
) -> dict:
    """Predicate delete: rewrite only the files that contain matches, keeping
    rows where NOT(pred).

    Plan shape: one scan with `input_file_name()` finds affected files
    (predicate pushed to parquet), then each affected file is rewritten
    independently — untouched files are never rewritten, so cost scales with
    the match footprint, not table size (same contract as the reference).
    """
    meas_path = os.path.join(root, db, measurement)
    df = spark.read.option("mergeSchema", "true").parquet(meas_path)
    affected = [
        r[0].replace("file://", "").replace("file:", "")
        for r in df.filter(F.expr(predicate_sql))
        .select(F.input_file_name()).distinct().collect()
    ]
    matched = df.filter(F.expr(predicate_sql)).count()
    if dry_run or not affected:
        return {"files": len(affected), "deleted_rows": matched, "dry_run": dry_run}

    for fpath in affected:
        keep = spark.read.parquet(fpath).filter(~F.expr(predicate_sql))
        tmp = fpath + f".delete-tmp-{uuid.uuid4().hex[:8]}"
        keep.coalesce(1).write.mode("overwrite").option("compression", "zstd").parquet(tmp)
        outs = glob.glob(os.path.join(tmp, "*.parquet"))
        _remove_with_crc(fpath)
        if outs:
            shutil.move(outs[0], fpath)
        shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.refreshByPath(meas_path)
    return {"files": len(affected), "deleted_rows": matched, "dry_run": False}
