"""Sessionization: batch (window program) and streaming (applyInPandasWithState)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from arc_spark.streaming.sessionize import sessionize, sessionize_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


import pytest


@pytest.fixture
def few_state_partitions(spark):
    """Shrink shuffle (= streaming state) partitions for the stateful tests,
    restoring the session default afterwards."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


def _ev(uid, minute):
    return (uid, T0 + dt.timedelta(minutes=minute))


def _drain_available(q, deadline_s: float = 120.0):
    """Library drain helper (arc_spark.streaming.util) with a test-sized
    deadline; the availableNow/ProcessingTimeTimeout rationale lives on
    the helper's docstring."""
    from arc_spark.streaming.util import drain_available

    assert drain_available(q, deadline_s=deadline_s)


class TestBatchSessionize:
    def test_gap_splits_sessions(self, spark):
        # user 1: events at 0,10,20 | gap | 60,65  → two sessions (3 + 2)
        # user 2: single event              → one session of 1
        df = spark.createDataFrame(
            [_ev(1, 0), _ev(1, 10), _ev(1, 20), _ev(1, 60), _ev(1, 65), _ev(2, 5)],
            "user_id long, ts timestamp",
        )
        out = sessionize(df, gap="30 minutes").orderBy("user", "session_idx").collect()
        assert [(r["user"], r["session_idx"], r["n_events"]) for r in out] == [
            (1, 1, 3),
            (1, 2, 2),
            (2, 1, 1),
        ]
        first = out[0]
        assert first["duration_us"] == 20 * 60 * 1_000_000

    def test_exact_gap_boundary_stays_open(self, spark):
        # diff == gap does NOT split (split requires strictly greater)
        df = spark.createDataFrame(
            [_ev(1, 0), _ev(1, 30)], "user_id long, ts timestamp"
        )
        out = sessionize(df, gap="30 minutes").collect()
        assert len(out) == 1 and out[0]["n_events"] == 2


class TestDrainAvailable:
    def test_failed_query_raises_instead_of_spinning(
            self, spark, tmp_path, few_state_partitions):
        """drain_available must surface a failed query's
        StreamingQueryException promptly — not sleep out the full
        deadline and return False (r10 review)."""
        import time as _t

        import pytest as _pytest
        from pyspark.errors.exceptions.captured import StreamingQueryException

        from arc_spark.streaming.util import drain_available

        in_dir = str(tmp_path / "in")
        spark.createDataFrame(
            [_ev(1, 0)], "user_id long, ts timestamp"
        ).write.parquet(in_dir)
        spark.udf.register(
            "sess_boom", lambda x: (_ for _ in ()).throw(
                RuntimeError("kaboom")), "long")
        bad = (spark.readStream.schema("user_id long, ts timestamp")
               .parquet(in_dir)
               .selectExpr("sess_boom(user_id) AS user_id", "ts"))
        q = (
            sessionize_stream(bad, gap="30 minutes", timeout_ms=3_600_000)
            .writeStream.format("memory").queryName("drain_fail")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        t0 = _t.monotonic()
        with _pytest.raises(StreamingQueryException):
            drain_available(q, deadline_s=60)
        assert _t.monotonic() - t0 < 30  # surfaced, not deadline-slept


class TestStreamingSessionize:
    def test_closed_sessions_emitted(self, spark, tmp_path, few_state_partitions):
        in_dir = str(tmp_path / "in")
        df = spark.createDataFrame(
            [_ev(1, 0), _ev(1, 10), _ev(1, 60), _ev(2, 0)],
            "user_id long, ts timestamp",
        )
        df.coalesce(1).write.parquet(in_dir)

        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(in_dir)
        sessions = sessionize_stream(stream, gap="30 minutes", timeout_ms=3_600_000)
        q = (
            sessions.writeStream.format("memory")
            .queryName("closed_sessions")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _drain_available(q)
        rows = spark.sql("SELECT * FROM closed_sessions").collect()
        # only user 1's first session closed (the 60-min event crossed the gap);
        # user 1's second session and user 2's session remain open in state
        assert len(rows) == 1
        r = rows[0]
        assert r["user"] == 1 and r["n_events"] == 2
        assert r["duration_us"] == 10 * 60 * 1_000_000

    def test_state_persists_across_batches(self, spark, tmp_path, few_state_partitions):
        in_dir = str(tmp_path / "in2")
        ckpt = str(tmp_path / "ckpt2")
        spark.createDataFrame(
            [_ev(7, 0), _ev(7, 5)], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(in_dir)

        def run_once(qname):
            collected = []
            stream = spark.readStream.schema("user_id long, ts timestamp").parquet(in_dir)
            q = (
                sessionize_stream(stream, gap="30 minutes", timeout_ms=3_600_000)
                .writeStream.foreachBatch(
                    lambda batch_df, _id: collected.extend(batch_df.collect())
                )
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            _drain_available(q)
            return collected

        assert run_once("s1") == []  # session still open
        # second run: a far-future event closes the session held in state
        spark.createDataFrame(
            [_ev(7, 120)], "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(in_dir)
        rows = run_once("s2")
        assert len(rows) == 1 and rows[0]["n_events"] == 2
