"""Ingest decode + writer tests (reference adversarial cases: schema churn,
all-nil columns, mixed time units — SURVEY §5, FIXTURES.md §5/§7)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest

from arc_spark.sources.ingest import (
    columnar_to_arrow,
    columnar_to_dataframe,
    decode_msgpack_payload,
    merge_batches,
    normalize_epoch_us,
    rows_to_columnar,
)
from arc_spark.sources.msgpack_codec import packb, unpackb
from arc_spark.sources.writer import read_manifest, write_measurement


def test_msgpack_roundtrip():
    obj = {
        "m": "cpu",
        "columns": {"time": [1, 2, 3], "host": ["a", None, "c"], "value": [0.5, 1.5, None]},
        "tags": ["host"],
        "n": 3,
        "flag": True,
        "blob": b"\x00\x01\xff",
        "neg": -12345678901234,
        "nested": [1, {"k": None}],
    }
    assert unpackb(packb(obj)) == obj


def test_msgpack_large_collections():
    obj = {"arr": list(range(70000)), "s": "x" * 70000}
    assert unpackb(packb(obj)) == obj


def test_normalize_epoch_units():
    base_s = 1700000000
    assert normalize_epoch_us(base_s) == base_s * 10**6
    assert normalize_epoch_us(base_s * 10**3) == base_s * 10**6
    assert normalize_epoch_us(base_s * 10**6) == base_s * 10**6
    assert normalize_epoch_us(base_s * 10**9 + 999) == base_s * 10**6


def test_decode_columnar_payload():
    payload = packb({
        "m": "cpu",
        "columns": {"time": [1700000000, 1700000001], "host": ["a", "b"], "value": [1.0, 2.0]},
        "tags": ["host"],
    })
    batch = decode_msgpack_payload(payload)
    assert batch["measurement"] == "cpu"
    assert batch["columns"]["time"] == [1700000000 * 10**6, 1700000001 * 10**6]
    assert batch["tag_columns"] == ["host"]


def test_decode_row_batch_payload():
    payload = packb({"batch": [
        {"m": "cpu", "t": 1700000000000, "tags": {"host": "a"}, "fields": {"v": 1.5}},
        {"m": "cpu", "t": 1700000001000, "tags": {"host": "b"}, "fields": {"v": 2.5, "extra": 7}},
    ]})
    batch = decode_msgpack_payload(payload)
    assert batch["tag_columns"] == ["host"]
    assert batch["columns"]["v"] == [1.5, 2.5]
    assert batch["columns"]["extra"] == [None, 7]  # sparse column → null backfill


def test_schema_inference_types():
    batch = rows_to_columnar([
        {"m": "s", "t": 1700000000, "tags": {"device": "d1"},
         "fields": {"temp": 21.5, "count": 3, "ok": True, "note": "n"}},
    ])
    table = columnar_to_arrow(batch)
    types = {f.name: str(f.type) for f in table.schema}
    assert types == {
        "time": "timestamp[us]", "device": "string", "temp": "double",
        "count": "int64", "ok": "bool", "note": "string",
    }


def test_all_nil_column_defaults_string():
    batch = rows_to_columnar([
        {"m": "s", "t": 1700000000, "fields": {"online": None}},
        {"m": "s", "t": 1700000001, "fields": {"online": None}},
    ])
    table = columnar_to_arrow(batch)
    assert str(table.schema.field("online").type) == "string"


def test_schema_evolution_merge():
    t1 = columnar_to_arrow(rows_to_columnar(
        [{"m": "s", "t": 1, "fields": {"temp": 20.0}}]))
    t2 = columnar_to_arrow(rows_to_columnar(
        [{"m": "s", "t": 2, "fields": {"temp": 21.0, "humidity": 0.4}}]))
    merged = merge_batches([t1, t2])
    assert merged.num_rows == 2
    assert merged.column("humidity").to_pylist() == [None, 0.4]


def test_all_nil_batch_column_merges_with_typed_batch():
    """Reference issue #337 analogue: a batch whose column is ENTIRELY
    null (inference defaulted it to string) must merge with a later
    batch carrying the column's real type — previously this hard-failed
    the flush (string vs double), wedging the retry loop on one batch."""
    t1 = columnar_to_arrow(rows_to_columnar(
        [{"m": "s", "t": 1, "fields": {"x": None}},
         {"m": "s", "t": 2, "fields": {"x": None}}]))
    t2 = columnar_to_arrow(rows_to_columnar(
        [{"m": "s", "t": 3, "fields": {"x": 7.5}}]))
    for order in ([t1, t2], [t2, t1]):
        merged = merge_batches(order)
        assert str(merged.schema.field("x").type) == "double"
        assert sorted(merged.column("x").to_pylist(),
                      key=lambda v: (v is None, v)) == [7.5, None, None]
    # int typed sibling promotes the same way
    t3 = columnar_to_arrow(rows_to_columnar(
        [{"m": "s", "t": 4, "fields": {"x": 9}}]))
    assert str(merge_batches([t1, t3]).schema.field("x").type) == "int64"


def test_all_nil_in_every_batch_stays_string():
    t1 = columnar_to_arrow(rows_to_columnar(
        [{"m": "s", "t": 1, "fields": {"x": None}}]))
    t2 = columnar_to_arrow(rows_to_columnar(
        [{"m": "s", "t": 2, "fields": {"x": None}}]))
    merged = merge_batches([t1, t2])
    assert str(merged.schema.field("x").type) == "string"
    assert merged.column("x").to_pylist() == [None, None]


def test_all_nil_decimal_column_keeps_decimal():
    """Configured types are intentional — an all-null DECIMAL column must
    not round-trip through the string fallback."""
    import pyarrow as pa

    dec = {"price": (10, 2)}
    t1 = columnar_to_arrow({
        "measurement": "s",
        "columns": {"time": [1], "price": [None]},
        "tag_columns": [],
    }, decimal_columns=dec)
    t2 = columnar_to_arrow({
        "measurement": "s",
        "columns": {"time": [2], "price": ["3.50"]},
        "tag_columns": [],
    }, decimal_columns=dec)
    merged = merge_batches([t1, t2])
    assert pa.types.is_decimal(merged.schema.field("price").type)


def test_columnar_to_dataframe(spark):
    batch = decode_msgpack_payload(packb({
        "m": "cpu",
        "columns": {"time": [1700000000, 1700003600], "host": ["a", "b"],
                    "value": [1.0, 2.0]},
        "tags": ["host"],
    }))
    df = columnar_to_dataframe(spark, batch)
    assert df.count() == 2
    assert dict(df.dtypes)["time"].startswith("timestamp")


def test_write_measurement_hive_layout(spark, tmp_path):
    root = str(tmp_path)
    batch = rows_to_columnar([
        {"m": "cpu", "t": int(dt.datetime(2024, 3, 1, 10, 5).timestamp() * 1e6),
         "tags": {"host": "a"}, "fields": {"value": 1.0}},
        {"m": "cpu", "t": int(dt.datetime(2024, 3, 1, 11, 20).timestamp() * 1e6),
         "tags": {"host": "a"}, "fields": {"value": 2.0}},
        {"m": "cpu", "t": int(dt.datetime(2024, 3, 2, 0, 0).timestamp() * 1e6),
         "tags": {"host": "b"}, "fields": {"value": 3.0}},
    ])
    df = columnar_to_dataframe(spark, batch)
    out = write_measurement(df, root, "metrics", "cpu", tag_columns=["host"])
    hours = sorted(glob.glob(os.path.join(out, "year=*/month=*/day=*/hour=*")))
    assert [h.split("cpu/")[1] for h in hours] == [
        "year=2024/month=3/day=1/hour=10",
        "year=2024/month=3/day=1/hour=11",
        "year=2024/month=3/day=2/hour=0",
    ]
    # read back through the catalog: partition pruning columns exist
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert {"year", "month", "day", "hour"} <= set(back.columns)
    m = read_manifest(root, "metrics", "cpu")
    assert m["tag_columns"] == ["host"]
    assert m["sort_keys"] == ["host", "time"]


def test_write_measurement_arrow_same_layout(spark, tmp_path):
    """The in-process Arrow flush fast path must be indistinguishable from
    the Spark writer: same hive tree, same schema on read (TIMESTAMP_LTZ),
    same rows — files from both paths coexist in one measurement."""
    from arc_spark.sources.writer import write_measurement_arrow

    root = str(tmp_path)
    batch = rows_to_columnar([
        {"m": "cpu", "t": int(dt.datetime(2024, 3, 1, 10, 5).timestamp() * 1e6),
         "tags": {"host": "a"}, "fields": {"value": 1.0}},
        {"m": "cpu", "t": int(dt.datetime(2024, 3, 1, 11, 20).timestamp() * 1e6),
         "tags": {"host": "a"}, "fields": {"value": 2.0}},
        {"m": "cpu", "t": int(dt.datetime(2024, 3, 2, 0, 0).timestamp() * 1e6),
         "tags": {"host": "b"}, "fields": {"value": 3.0}},
    ])
    out = write_measurement_arrow(
        columnar_to_arrow(batch), root, "metrics", "cpu", tag_columns=["host"]
    )
    hours = sorted(glob.glob(os.path.join(out, "year=*/month=*/day=*/hour=*")))
    assert [h.split("cpu/")[1] for h in hours] == [
        "year=2024/month=3/day=1/hour=10",
        "year=2024/month=3/day=1/hour=11",
        "year=2024/month=3/day=2/hour=0",
    ]
    # now append the SAME rows through the Spark path: one tree, both writers
    df = columnar_to_dataframe(spark, batch)
    write_measurement(df, root, "metrics", "cpu", tag_columns=["host"])
    back = spark.read.parquet(out)
    assert back.count() == 6
    assert dict(back.dtypes)["time"] == "timestamp"
    assert back.filter("year = 2024 AND day = 1").count() == 4
    vals = sorted(r["value"] for r in back.filter("hour = 0").collect())
    assert vals == [3.0, 3.0]
    m = read_manifest(root, "metrics", "cpu")
    assert m["sort_keys"] == ["host", "time"]


def test_partition_pruning_from_time_predicate(spark, tmp_path):
    """The replacement for the reference's 1205-line pruner (A2): a hive
    layout + partition filter prunes at plan time."""
    root = str(tmp_path)
    rows = []
    for day in (1, 2, 3):
        for h in (0, 12):
            rows.append({"m": "cpu",
                         "t": int(dt.datetime(2024, 3, day, h).timestamp() * 1e6),
                         "tags": {"host": "a"}, "fields": {"value": float(day)}})
    df = columnar_to_dataframe(spark, rows_to_columnar(rows))
    out = write_measurement(df, root, "metrics", "cpu", tag_columns=["host"])
    back = spark.read.parquet(out)
    pruned = back.filter("year = 2024 AND month = 3 AND day = 2")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() == 2


def test_permuted_time_order_sorted_within_partition(spark, tmp_path):
    """Adversarial case from the reference's ingest suite (permuted time,
    arrow_writer_test.go family): out-of-order input must land in the right
    hour partitions AND be time-sorted within each file."""
    root = str(tmp_path)
    base = dt.datetime(2024, 3, 1, 10, 0)
    offs = [50, 3, 47, 11, 29, 5, 59, 0, 17, 41]  # shuffled minutes
    rows = [
        {"m": "cpu", "t": int((base + dt.timedelta(minutes=o)).timestamp() * 1e6),
         "tags": {"host": "a"}, "fields": {"value": float(o)}}
        for o in offs
    ]
    df = columnar_to_dataframe(spark, rows_to_columnar(rows))
    out = write_measurement(df, root, "metrics", "cpu", tag_columns=["host"])
    files = glob.glob(os.path.join(out, "year=*/month=*/day=*/hour=*/*.parquet"))
    assert files
    import pyarrow.parquet as pq

    for f in files:
        tcol = pq.read_table(f, columns=["time"]).column("time").to_pylist()
        assert tcol == sorted(tcol), f"unsorted times in {f}"


def test_backfill_multi_day_spread(spark, tmp_path):
    """Multi-hour/multi-day backfill batch splits into one partition per
    distinct hour (reference flushPartitionedData groupByHour)."""
    root = str(tmp_path)
    stamps = [
        dt.datetime(2024, 2, 27, 5), dt.datetime(2024, 2, 28, 23),
        dt.datetime(2024, 3, 1, 0), dt.datetime(2024, 3, 1, 1),
    ]
    rows = [
        {"m": "cpu", "t": int(s.timestamp() * 1e6),
         "tags": {"host": "a"}, "fields": {"value": 1.0}}
        for s in stamps
    ]
    df = columnar_to_dataframe(spark, rows_to_columnar(rows))
    out = write_measurement(df, root, "metrics", "cpu", tag_columns=["host"])
    hours = sorted(glob.glob(os.path.join(out, "year=*/month=*/day=*/hour=*")))
    assert len(hours) == 4
    assert spark.read.parquet(out).count() == 4


def test_lp_rows_carry_time_through_columnar():
    """Regression: rows_to_columnar ignored parse_batch's `time_us` key,
    so the non-deferred LP ingest path stored NULL time for every row."""
    from arc_spark.sources.line_protocol import parse_batch

    rows = parse_batch("cpu,host=a usage=0.5 1700000000000000000\n")
    batch = rows_to_columnar(rows)
    assert batch["columns"]["time"] == [1700000000000000]


def test_epoch_zero_timestamp_not_dropped():
    """Regression (ADVICE low): falsy checks turned a legitimate epoch-0
    timestamp into NULL."""
    from arc_spark.sources.line_protocol import parse_line

    batch = rows_to_columnar([{"m": "x", "t": 0, "fields": {"v": 1.0}}])
    assert batch["columns"]["time"] == [0]
    assert parse_line("cpu v=1 0", precision="ns")["time_us"] == 0


class TestIngestHardening:
    """gzip/zstd auto-detect + bomb guard + UTF-8 sanitize (reference
    internal/api/msgpack.go, decompress_bomb_test.go, ingest/utf8*.go)."""

    def test_gzip_payload_roundtrips(self, spark, tmp_path):
        import gzip

        from arc_spark.api import IngestService
        from arc_spark.catalog import MeasurementCatalog

        svc = IngestService(spark, str(tmp_path), max_buffer_rows=10**9,
                            max_buffer_age_s=10**9)
        payload = packb({
            "m": "cpu",
            "columns": {"time": [1700000000000000], "host": ["a"], "v": [1.0]},
            "tags": ["host"],
        })
        assert svc.write_msgpack("m", gzip.compress(payload)) == 1
        svc.flush()
        assert MeasurementCatalog(spark, str(tmp_path)).table("m", "cpu").count() == 1

    def test_gzip_lp_payload(self, spark, tmp_path):
        import gzip

        from arc_spark.api import IngestService

        svc = IngestService(spark, str(tmp_path), max_buffer_rows=10**9,
                            max_buffer_age_s=10**9)
        n = svc.write_line_protocol(
            "m", gzip.compress(b"cpu,host=a v=1 1700000000000000000\n")
        )
        assert n == 1

    def test_decompression_bomb_rejected(self):
        import gzip

        from arc_spark.sources.ingest import (
            DecompressionBombError,
            maybe_decompress,
        )

        bomb = gzip.compress(b"\x00" * (4 << 20))  # 4 MiB of zeros, ~4 KiB gz
        with pytest.raises(DecompressionBombError):
            maybe_decompress(bomb, max_decompressed_bytes=1 << 20)
        # under the cap: passes through decompressed
        assert len(maybe_decompress(bomb, max_decompressed_bytes=8 << 20)) == 4 << 20

    def test_zstd_via_pyarrow_fallback(self, spark, tmp_path):
        """r12: zstd payloads work WITHOUT the optional zstandard
        package — pyarrow (a hard dependency) ships the codec; the
        fallback bomb-guards via chunked streaming reads (never trusts
        the frame's self-declared content size) and maps corrupt frames
        to the client-fault error, not an engine fault."""
        import pyarrow as pa

        from arc_spark.api import IngestService
        from arc_spark.catalog import MeasurementCatalog
        from arc_spark.sources.ingest import (
            DecompressionBombError, MalformedPayloadError,
            maybe_decompress)

        def zstd(b: bytes) -> bytes:
            buf = pa.BufferOutputStream()
            with pa.output_stream(buf, compression="zstd") as s:
                s.write(b)
            return buf.getvalue().to_pybytes()

        # e2e: compressed columnar write → rows on disk
        svc = IngestService(spark, str(tmp_path), max_buffer_rows=10**9,
                            max_buffer_age_s=10**9)
        payload = packb({
            "m": "cpu",
            "columns": {"time": [1700000000000000], "host": ["a"],
                        "v": [1.0]},
            "tags": ["host"],
        })
        assert svc.write_msgpack("m", zstd(payload)) == 1
        svc.flush()
        assert MeasurementCatalog(
            spark, str(tmp_path)).table("m", "cpu").count() == 1
        # bomb guard: cap crossed mid-stream, not after full expansion
        bomb = zstd(b"\x00" * (4 << 20))
        with pytest.raises(DecompressionBombError):
            maybe_decompress(bomb, max_decompressed_bytes=1 << 20)
        assert len(maybe_decompress(
            bomb, max_decompressed_bytes=8 << 20)) == 4 << 20
        # corrupt frame → client fault
        with pytest.raises(MalformedPayloadError):
            maybe_decompress(b"\x28\xb5\x2f\xfdnot-a-frame", 1 << 20)

    def test_uncompressed_passthrough(self):
        from arc_spark.sources.ingest import maybe_decompress

        raw = packb({"m": "x", "columns": {"time": [1]}, "tags": []})
        assert maybe_decompress(raw) is raw

    def test_invalid_utf8_sanitized_not_fatal(self):
        # craft a msgpack fixstr with an invalid UTF-8 byte: 0xA3 'a' 0xFF 'b'
        bad = b"\x81\xa4host\xa3a\xffb"
        obj = unpackb(bad)
        assert obj == {"host": "a�b"}

    def test_invalid_utf8_lp_batch_not_fatal(self, spark, tmp_path):
        from arc_spark.api import IngestService

        svc = IngestService(spark, str(tmp_path), max_buffer_rows=10**9,
                            max_buffer_age_s=10**9)
        payload = b"cpu,host=a\xff v=1 1700000000000000000\n"
        assert svc.write_line_protocol("m", payload) == 1

    def test_multi_measurement_sync_lp_splits(self, spark, tmp_path):
        """r11 fix: the sync LP ack path filed EVERY row of a
        multi-measurement payload under the first line's measurement
        (rows_to_columnar keyed the batch on rows[0]); the vectorized
        per-measurement parse splits correctly."""
        import os

        from arc_spark.api import IngestService

        svc = IngestService(spark, str(tmp_path), max_buffer_rows=10**9,
                            max_buffer_age_s=10**9)
        n = svc.write_line_protocol(
            "m",
            b"cpu,host=a usage=1 1700000000000000000\n"
            b"mem,host=a used=2 1700000000000000000\n"
            b"cpu,host=b usage=3 1700000001000000000\n")
        assert n == 3
        svc.flush()
        meas_dirs = {p for p in os.listdir(tmp_path / "m")
                     if not p.startswith(("_", "."))}
        assert meas_dirs == {"cpu", "mem"}

    def test_malformed_sync_lp_rejected_whole(self, spark, tmp_path):
        """The sync ack path keeps parse_batch's all-or-nothing contract:
        one malformed line rejects the payload (HTTP 400), never a
        partial ingest the client can't see."""
        import pytest as _pytest

        from arc_spark.api import IngestService
        from arc_spark.sources.line_protocol import LineProtocolError

        svc = IngestService(spark, str(tmp_path), max_buffer_rows=10**9,
                            max_buffer_age_s=10**9)
        with _pytest.raises(LineProtocolError):
            svc.write_line_protocol(
                "m",
                b"cpu,host=a usage=1 1700000000000000000\n"
                b"not line protocol at all\n")
        assert svc.stats["acked"] == 0
        # comments and blank lines are not "failed" lines
        assert svc.write_line_protocol(
            "m", b"\n# c\ncpu,host=a usage=1 1700000000000000000\n") == 1


class TestZstdErrorClassParity:
    """r12 advice: the error CLASS for a given zstd input must not
    depend on which codec is installed. With the zstandard package the
    one-shot decompress raises ZstdError for cap-trips, missing header
    content sizes, AND corrupt frames alike — the classify-by-replay
    path must map corrupt → MalformedPayloadError (like the pyarrow
    fallback), cap → DecompressionBombError, and recover valid frames
    the one-shot rejected only for a missing content size. Exercised
    through a faithful fake of the zstandard API (the package is
    optional and absent in this env); the pyarrow-fallback twin cases
    live in TestZstd*Fallback above."""

    @staticmethod
    def _fake_zstd():
        import io
        import types

        import pyarrow as pa

        class ZstdError(Exception):
            pass

        class _Reader:
            def __init__(self, fobj):
                self._src = fobj.read()
                try:
                    self._stream = pa.input_stream(
                        pa.py_buffer(self._src), compression="zstd")
                except Exception as e:  # construction-time failure
                    raise ZstdError(str(e))

            def read(self, n):
                try:
                    return self._stream.read(n)
                except Exception as e:
                    raise ZstdError(str(e))

        class ZstdDecompressor:
            def decompress(self, payload, max_output_size=0):
                # the real one-shot refuses frames without a header
                # content size and outputs over max_output_size; both
                # surface as ZstdError. pyarrow's writer never embeds
                # a content size, so every frame from our test encoder
                # hits the no-content-size branch — exactly the shape
                # that must fall through to the replay.
                raise ZstdError("could not determine content size "
                                "in frame header")

            def stream_reader(self, fobj):
                return _Reader(fobj)

        m = types.ModuleType("zstandard")
        m.ZstdError = ZstdError
        m.ZstdDecompressor = ZstdDecompressor
        return m

    def test_replay_classification(self, monkeypatch):
        import pyarrow as pa

        from arc_spark.sources import ingest as ing
        from arc_spark.sources.ingest import (
            DecompressionBombError, MalformedPayloadError,
            maybe_decompress)

        monkeypatch.setattr(ing, "_zstd", self._fake_zstd())

        def zstd(b: bytes) -> bytes:
            buf = pa.BufferOutputStream()
            with pa.output_stream(buf, compression="zstd") as s:
                s.write(b)
            return buf.getvalue().to_pybytes()

        # valid frame the one-shot rejected (no content size) → data
        assert maybe_decompress(zstd(b"hello" * 100), 1 << 20) \
            == b"hello" * 100
        # cap trip → bomb, on the replay path
        with pytest.raises(DecompressionBombError):
            maybe_decompress(zstd(b"\x00" * (4 << 20)), 1 << 20)
        # corrupt frame → client fault, same class as pyarrow fallback
        with pytest.raises(MalformedPayloadError):
            maybe_decompress(b"\x28\xb5\x2f\xfdnot-a-frame", 1 << 20)
