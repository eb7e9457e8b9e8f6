"""Native Arrow fast scan (catalog.scan_arrow + the trivial A13 serving
shape): the committed file list read through pyarrow.dataset with no
Spark job — must return exactly what the Spark path returns, under the
same governance/RBAC, ~10× faster at serving sizes."""

from __future__ import annotations

import datetime as dt
import json
import urllib.error
import urllib.request

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from arc_spark.api import IngestService, QueryService
from arc_spark.auth import AuthStore
from arc_spark.catalog import MeasurementCatalog
from arc_spark.server import ArcServer
from arc_spark.sources.writer import write_measurement, write_measurement_arrow


@pytest.fixture()
def meas(spark, tmp_path):
    root = str(tmp_path / "data")
    df = spark.range(500).select(
        F.timestamp_micros(
            F.lit(int(dt.datetime(2024, 1, 15).timestamp() * 1_000_000))
            + (F.col("id") % 5) * 3_600_000_000 + F.col("id")).alias("time"),
        (F.col("id") % 4).cast("string").alias("host"),
        F.col("id").cast("double").alias("value"))
    write_measurement(df, root, "metrics", "cpu", tag_columns=["host"])
    return root


def _rowset(rows):
    # tz-normalized: Spark collect yields naive session-local (UTC)
    # datetimes, the Arrow path tz-aware UTC — same instants
    return {(r["host"], r["value"], r["time"].replace(tzinfo=None),
             r["year"], r["month"], r["day"], r["hour"]) for r in rows}


class TestScanArrowParity:
    def test_matches_spark_path_exactly(self, spark, meas):
        cat = MeasurementCatalog(spark, meas)
        spark_rows = [r.asDict() for r in
                      cat.table("metrics", "cpu").collect()]
        table = cat.scan_arrow("metrics", "cpu")
        native_rows = table.to_pylist()
        assert len(native_rows) == len(spark_rows) == 500
        assert _rowset(native_rows) == _rowset(spark_rows)
        # µs normalization: no ns units survive
        for f in table.schema:
            if pa.types.is_timestamp(f.type):
                assert f.type.unit == "us"

    def test_limit_and_columns(self, spark, meas):
        cat = MeasurementCatalog(spark, meas)
        t = cat.scan_arrow("metrics", "cpu", limit=7)
        assert t.num_rows == 7
        t2 = cat.scan_arrow("metrics", "cpu", columns=["host", "value"],
                            limit=3)
        assert t2.column_names == ["host", "value"] and t2.num_rows == 3

    def test_orphans_invisible_on_managed_tree(self, spark, meas):
        """The fast scan resolves the COMMITTED snapshot, exactly like
        Spark reads — a crash orphan must not appear."""
        write_measurement_arrow(pa.table({
            "time": pa.array([1_705_300_000_000_000], pa.timestamp("us")),
            "host": pa.array(["ORPHAN"]), "value": pa.array([1.0]),
        }), meas, "metrics", "cpu", tag_columns=["host"], manifest=False)
        cat = MeasurementCatalog(spark, meas)
        t = cat.scan_arrow("metrics", "cpu")
        assert t.num_rows == 500
        assert "ORPHAN" not in set(t.column("host").to_pylist())

    def test_empty_measurement(self, spark, tmp_path):
        cat = MeasurementCatalog(spark, str(tmp_path))
        assert cat.scan_arrow("nope", "nothing").num_rows == 0


class TestServingFastPath:
    @pytest.fixture()
    def live(self, spark, meas):
        cat = MeasurementCatalog(spark, meas)
        svc = QueryService(spark, cat)
        auth = AuthStore(str(meas) + "-auth.db")
        admin = auth.create_token("admin")
        limited = auth.create_token("lim", allowed_tables=["other"])
        ingest = IngestService(spark, meas, max_buffer_rows=10**9,
                               max_buffer_age_s=10**9)
        server = ArcServer(svc, ingest, auth).start()
        try:
            yield server.port, admin, limited
        finally:
            server.stop()

    def _get(self, port, path, token):
        req = urllib.request.Request(f"http://127.0.0.1:{port}{path}")
        req.add_header("Authorization", f"Bearer {token}")
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.read(), dict(r.headers)

    def test_arrow_format_roundtrip_matches_json(self, live):
        port, admin, _ = live
        _, body, headers = self._get(
            port, "/api/v1/query/cpu?db=metrics&format=arrow&limit=100000",
            admin)
        assert headers["Content-Type"] == "application/vnd.apache.arrow.stream"
        table = pa.ipc.open_stream(body).read_all()
        assert table.num_rows == 500
        _, jbody, _ = self._get(
            port, "/api/v1/query/cpu?db=metrics&limit=100000", admin)
        rows = json.loads(jbody)["rows"]
        assert len(rows) == 500
        assert {r["host"] for r in rows} == \
            set(table.column("host").to_pylist())

    def test_msgpack_format_decodes(self, live):
        from arc_spark.sources.msgpack_codec import unpackb

        port, admin, _ = live
        _, body, headers = self._get(
            port, "/api/v1/query/cpu?db=metrics&format=msgpack&limit=50",
            admin)
        assert headers["Content-Type"] == "application/msgpack"
        obj = unpackb(body)
        assert obj["column_order"]
        assert sum(f["n"] for f in obj["frames"]) == 50

    def test_fast_and_spark_paths_agree(self, live):
        """The same endpoint with and without a (tautological) where —
        fast path vs Spark path — returns identical row sets."""
        port, admin, _ = live
        _, fast, _ = self._get(
            port, "/api/v1/query/cpu?db=metrics&limit=100000", admin)
        _, sparked, _ = self._get(
            port, "/api/v1/query/cpu?db=metrics&limit=100000"
                  "&where=value%20%3E%3D%200", admin)
        f = {(r["host"], r["value"], r["time"])
             for r in json.loads(fast)["rows"]}
        s = {(r["host"], r["value"], r["time"])
             for r in json.loads(sparked)["rows"]}
        assert f == s

    def test_rbac_enforced_on_fast_path(self, live):
        port, _, limited = live
        with pytest.raises(urllib.error.HTTPError) as e:
            self._get(port, "/api/v1/query/cpu?db=metrics", limited)
        assert e.value.code == 403

    def test_row_cap_enforced_on_fast_path(self, spark, meas):
        from arc_spark.governance import Governor, TokenPolicy

        cat = MeasurementCatalog(spark, meas)
        gov = Governor(default_policy=TokenPolicy(max_rows=25))
        svc = QueryService(spark, cat, governor=gov)
        t = svc.scan_measurement_arrow("metrics", "cpu", limit=1000)
        assert t.num_rows == 25  # policy cap wins over requested limit
