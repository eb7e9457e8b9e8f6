"""Compaction, dedup, retention, predicate-delete tests over the hive layout
(reference semantics: dedup.go last-writer-wins, retention.go prefix deletes,
delete.go rewrite-with-negated-predicate)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from arc_spark.operators.compaction import (
    compact_measurement,
    compaction_candidates,
    heal_time_column,
    recover_incomplete,
)
from arc_spark.operators.lifecycle import apply_retention, delete_where
from arc_spark.sources.ingest import columnar_to_dataframe, rows_to_columnar
from arc_spark.sources.writer import write_measurement


def _write_batches(spark, root, n_batches=12, with_dups=True):
    """n_batches small files into one hour partition, with duplicate
    (host, time) rows across batches (last writer wins)."""
    base = dt.datetime(2024, 3, 1, 10, 0)
    for i in range(n_batches):
        rows = [
            {"m": "cpu", "t": int((base + dt.timedelta(seconds=i)).timestamp() * 1e6),
             "tags": {"host": "h1"}, "fields": {"value": float(i)}},
        ]
        if with_dups:
            # same (host, time) in every batch — compaction must keep ONE
            rows.append({"m": "cpu", "t": int(base.timestamp() * 1e6),
                         "tags": {"host": "dup"}, "fields": {"value": float(i)}})
        df = columnar_to_dataframe(spark, rows_to_columnar(rows))
        write_measurement(df, root, "metrics", "cpu", tag_columns=["host"])
    return os.path.join(root, "metrics", "cpu")


def test_compaction_merges_and_dedups(spark, tmp_path):
    root = str(tmp_path)
    meas = _write_batches(spark, root, n_batches=12)
    hour_dir = glob.glob(os.path.join(meas, "year=*/month=*/day=*/hour=*"))[0]
    n_before = len(glob.glob(os.path.join(hour_dir, "*.parquet")))
    assert n_before >= 12

    results = compact_measurement(spark, root, "metrics", "cpu", min_files=10,
                                  min_age_seconds=0)
    assert len(results) == 1 and not results[0]["skipped"]
    n_after = len(glob.glob(os.path.join(hour_dir, "*.parquet")))
    assert n_after == 1  # 12+ files → 1 (reference: 43 → 1)

    back = spark.read.parquet(meas)
    dups = back.filter(F.col("host") == "dup").collect()
    assert len(dups) == 1  # last-writer-wins on (host, time)
    assert back.filter(F.col("host") == "h1").count() == 12  # distinct times kept


def test_compaction_age_and_minfiles_policy(spark, tmp_path):
    root = str(tmp_path)
    meas = _write_batches(spark, root, n_batches=5, with_dups=False)
    # below min_files → no candidates
    assert compaction_candidates(meas, min_files=10, min_age_seconds=0) == []
    # fresh files, age gate → no candidates
    assert compaction_candidates(meas, min_files=3, min_age_seconds=3600) == []
    assert len(compaction_candidates(meas, min_files=3, min_age_seconds=0)) == 1


def test_crash_recovery_sweeps_tmp_state(spark, tmp_path):
    root = str(tmp_path)
    meas = _write_batches(spark, root, n_batches=3, with_dups=False)
    hour_dir = glob.glob(os.path.join(meas, "year=*/month=*/day=*/hour=*"))[0]
    # simulate a crash: stale tmp dir + manifest
    tmp = hour_dir + ".compact-tmp-deadbeef"
    os.makedirs(tmp)
    with open(hour_dir + ".compact-manifest.json", "w") as f:
        f.write('{"inputs": [], "tmp_dir": "%s", "partition": "%s"}' % (tmp, hour_dir))
    n = recover_incomplete(meas)
    assert n >= 1
    assert not os.path.exists(tmp)
    assert spark.read.parquet(meas).count() == 3  # data intact


def test_heal_time_column_string_and_epoch(spark):
    df = spark.createDataFrame(
        [("2024-03-01 10:00:00",), ("1709287200000000",), ("1709287200",)],
        "time string",
    )
    healed = heal_time_column(df).collect()
    assert healed[0]["time"] == dt.datetime(2024, 3, 1, 10, 0)
    assert healed[1]["time"] == dt.datetime(2024, 3, 1, 10, 0)
    assert healed[2]["time"] == dt.datetime(2024, 3, 1, 10, 0)


def test_retention_prefix_delete(spark, tmp_path):
    root = str(tmp_path)
    rows = []
    for day in (1, 5, 20):
        rows.append({"m": "cpu", "t": int(dt.datetime(2024, 3, day).timestamp() * 1e6),
                     "tags": {"host": "a"}, "fields": {"value": 1.0}})
    df = columnar_to_dataframe(spark, rows_to_columnar(rows))
    write_measurement(df, root, "metrics", "cpu", tag_columns=["host"])
    # cutoff = Mar 21 − (10+1) days = Mar 10 → day 1 and day 5 drop, day 20 stays
    removed = apply_retention(root, "metrics", "cpu", retention_days=10,
                              buffer_days=1,
                              now=dt.datetime(2024, 3, 21))
    assert len(removed) == 2
    assert any("day=1" in r for r in removed) and any("day=5" in r for r in removed)
    left = spark.read.parquet(os.path.join(root, "metrics", "cpu"))
    assert sorted(r["day"] for r in left.select("day").collect()) == [20]


def test_delete_where_rewrites_only_affected_files(spark, tmp_path):
    root = str(tmp_path)
    rows = [
        {"m": "ev", "t": int(dt.datetime(2024, 3, 1, h).timestamp() * 1e6),
         "tags": {"user": u}, "fields": {"v": 1.0}}
        for h, u in [(1, "alice"), (1, "bob"), (2, "bob"), (3, "carol")]
    ]
    df = columnar_to_dataframe(spark, rows_to_columnar(rows))
    write_measurement(df, root, "app", "ev", tag_columns=["user"])
    meas = os.path.join(root, "app", "ev")

    dry = delete_where(spark, root, "app", "ev", "user = 'bob'", dry_run=True)
    assert dry["deleted_rows"] == 2
    assert spark.read.parquet(meas).count() == 4  # dry run: untouched

    res = delete_where(spark, root, "app", "ev", "user = 'bob'")
    assert res["deleted_rows"] == 2
    back = spark.read.parquet(meas)
    assert back.count() == 2
    assert back.filter("user = 'bob'").count() == 0


class TestPublishCrashRecovery:
    """Regression (ADVICE medium): a crash between publishing the compacted
    file and removing inputs left BOTH copies with no way to roll back."""

    def _scaffold(self, tmp_path):
        part = tmp_path / "metrics" / "cpu" / "year=2024" / "month=03" / "day=01" / "hour=10"
        part.mkdir(parents=True)
        i1, i2 = part / "a.parquet", part / "b.parquet"
        i1.write_bytes(b"input-a")
        i2.write_bytes(b"input-b")
        pub = part / "cpu_compacted_1_0.parquet"
        pub.write_bytes(b"compacted")
        manifest = part.parent / (part.name + ".compact-manifest.json")
        import json as _json
        manifest.write_text(_json.dumps({
            "inputs": [str(i1), str(i2)],
            "tmp_dir": str(part) + ".compact-tmp-dead",
            "partition": str(part),
            "published": [str(pub)],
        }))
        return part, i1, i2, pub

    def test_rolls_back_when_inputs_survive(self, tmp_path):
        # crash after the output move but before any input removal
        part, i1, i2, pub = self._scaffold(tmp_path)
        meas = str(tmp_path / "metrics" / "cpu")
        assert recover_incomplete(meas) >= 1
        assert i1.exists() and i2.exists()        # pre-compaction view intact
        assert not pub.exists()                   # duplicate copy removed

    def test_rolls_forward_when_input_removal_started(self, tmp_path):
        # crash mid input-removal: outputs are fully published by then
        part, i1, i2, pub = self._scaffold(tmp_path)
        i1.unlink()
        meas = str(tmp_path / "metrics" / "cpu")
        assert recover_incomplete(meas) >= 1
        assert pub.exists()                       # published output kept
        assert not i2.exists()                    # swap completed
