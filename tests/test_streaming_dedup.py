"""Streaming exact dedup (streaming/dedup.py) — bounded-state ingest dedup."""

from __future__ import annotations

import datetime as dt

import pytest

from arc_spark.streaming.dedup import dedup_stream_exact

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture
def few_state_partitions(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


def _rows():
    # event_id 10 arrives three times (dup burst), 11 twice, 12 once
    return [
        (10, T0, 1.0),
        (10, T0 + dt.timedelta(seconds=30), 1.0),
        (11, T0 + dt.timedelta(minutes=1), 2.0),
        (10, T0 + dt.timedelta(minutes=2), 1.0),
        (11, T0 + dt.timedelta(minutes=3), 2.0),
        (12, T0 + dt.timedelta(minutes=4), 3.0),
    ]


SCHEMA = "event_id long, time timestamp, value double"


class TestBatchPath:
    def test_batch_dedup(self, spark):
        df = spark.createDataFrame(_rows(), SCHEMA)
        out = dedup_stream_exact(df, ["event_id"])
        assert out.count() == 3
        assert {r["event_id"] for r in out.collect()} == {10, 11, 12}


class TestStreamingPath:
    def test_stream_dedup_within_watermark(self, spark, tmp_path,
                                           few_state_partitions):
        in_dir = str(tmp_path / "in")
        spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(in_dir)
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        out = dedup_stream_exact(stream, ["event_id"], watermark="30 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT event_id, COUNT(*) AS n FROM dedup_out GROUP BY event_id"
        ).collect()
        assert {r["event_id"]: r["n"] for r in got} == {10: 1, 11: 1, 12: 1}


class TestStreamAgainstIndex:
    """r9: dedup_stream_against_index — ingest-time near-dup screening
    of an arriving document stream against a static minhash_index via a
    stream-static band join (no streaming state except the watermarked
    multi-band collapse)."""

    DOC_SCHEMA = "doc_id long, time timestamp, text string"
    BASE = ("the quick brown fox jumps over the lazy dog "
            "again and again today")

    def _corpus(self, spark):
        rows = [(i, self.BASE + f" variant {i}") for i in range(20)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _arrivals(self):
        return [
            (100, T0, self.BASE + " variant 7"),            # dup of 7
            (101, T0 + dt.timedelta(minutes=1),
             "entirely unrelated content with nothing shared here ok"),
            (102, T0 + dt.timedelta(minutes=2),
             self.BASE + " variant 13"),                    # dup of 13
        ]

    def test_batch_path(self, spark):
        from arc_spark.operators.dedup import minhash_index
        from arc_spark.streaming.dedup import dedup_stream_against_index

        idx = minhash_index(self._corpus(spark))
        docs = spark.createDataFrame(self._arrivals(), self.DOC_SCHEMA)
        got = dedup_stream_against_index(docs, idx, threshold=0.7).collect()
        pairs = {(r["doc_id"], r["index_doc"]) for r in got}
        assert {(100, 7), (102, 13)} <= pairs
        assert all(r["doc_id"] != 101 for r in got)
        assert all(0 <= r["jaccard"] <= 1 for r in got)

    def test_streaming_path(self, spark, tmp_path, few_state_partitions):
        from arc_spark.operators.dedup import minhash_index
        from arc_spark.streaming.dedup import dedup_stream_against_index

        idx = minhash_index(self._corpus(spark))
        in_dir = str(tmp_path / "docs_in")
        spark.createDataFrame(self._arrivals(), self.DOC_SCHEMA) \
            .coalesce(1).write.parquet(in_dir)
        stream = spark.readStream.schema(self.DOC_SCHEMA).parquet(in_dir)
        out = dedup_stream_against_index(stream, idx, threshold=0.7,
                                         watermark="30 minutes")
        assert out.isStreaming
        q = (out.writeStream.format("memory").queryName("idx_dedup_out")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt2"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM idx_dedup_out").collect()
        pairs = {(r["doc_id"], r["index_doc"]) for r in got}
        assert {(100, 7), (102, 13)} <= pairs
        # multi-band matches collapsed: exactly one row per pair
        assert len(got) == len(pairs)
        assert all(r["doc_id"] != 101 for r in got)
