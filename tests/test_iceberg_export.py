"""Iceberg v2 export (`operators/iceberg_export.py` — reference
internal/iceberg/exporter.go's ReplaceDataFiles reconcile + Hadoop
discovery files, re-expressed over the engine's committed snapshots).

The acceptance bar mirrors the Delta export suite: an INDEPENDENT
reader (`tests/_iceberg_reader.py` + `tests/_avro_reader.py`, spec-
derived, zero shared code) walks hint → metadata → manifest-list →
manifest → files, validates field-ids/sizes/sequence bounds, and DuckDB
materializes the snapshot to match the engine's rows exactly."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from arc_spark import snapshots
from arc_spark.catalog import MeasurementCatalog
from arc_spark.operators.compaction import compact_measurement
from arc_spark.operators.iceberg_export import export_iceberg
from arc_spark.sources.writer import write_measurement, write_measurement_arrow


def _df(spark, n=60, t_off=0):
    return spark.range(n).select(
        F.timestamp_micros(
            F.lit(int(dt.datetime(2024, 1, 15).timestamp() * 1_000_000))
            + (F.col("id") % 4) * 3_600_000_000 + F.col("id") + F.lit(t_off)
        ).alias("time"),
        (F.col("id") % 3).cast("string").alias("host"),
        F.col("id").cast("double").alias("value"),
    )


@pytest.fixture()
def meas(spark, tmp_path):
    root = str(tmp_path / "engine")
    write_measurement(_df(spark), root, "metrics", "cpu",
                      tag_columns=["host"])
    # a crash orphan: in the managed tree, never committed
    import pyarrow as pa

    write_measurement_arrow(pa.table({
        "time": pa.array([1_705_300_000_000_000], pa.timestamp("us")),
        "host": pa.array(["zz"]), "value": pa.array([999.0]),
    }), root, "metrics", "cpu", tag_columns=["host"], manifest=False)
    return root, f"{root}/metrics/cpu"


class TestAvroRoundTrip:
    def test_writer_and_independent_reader_agree(self):
        """The hand-rolled writer vs the spec-derived reader on a schema
        exercising every construct Iceberg metadata uses."""
        from arc_spark.operators.avro_min import write_avro
        from tests._avro_reader import read_avro

        schema = {
            "type": "record", "name": "t",
            "fields": [
                {"name": "a", "type": "long", "field-id": 1},
                {"name": "b", "type": ["null", "string"], "field-id": 2},
                {"name": "c", "type": {"type": "array", "items": "int"},
                 "field-id": 3},
                {"name": "d", "type": {"type": "map", "values": "long"},
                 "field-id": 4},
                {"name": "e", "type": ["null", "bytes"], "field-id": 5},
                {"name": "f", "type": "boolean", "field-id": 6},
                {"name": "g", "type": "double", "field-id": 7},
                {"name": "h", "type": {
                    "type": "record", "name": "inner", "fields": [
                        {"name": "x", "type": "int", "field-id": 9},
                    ]}, "field-id": 8},
            ],
        }
        recs = [
            {"a": -(2**62), "b": None, "c": [], "d": {},
             "e": b"\x00\xff", "f": True, "g": 1.5, "h": {"x": -1}},
            {"a": 2**62, "b": "日本語", "c": [1, -2, 3],
             "d": {"k1": 10, "k2": -20}, "e": None, "f": False,
             "g": -0.25, "h": {"x": 7}},
        ]
        data = write_avro(schema, recs, metadata={"format-version": "2"})
        got_schema, meta, got = read_avro(data)
        assert got == recs
        assert meta["format-version"] == b"2"
        assert got_schema["fields"][0]["field-id"] == 1


class TestIcebergExport:
    def test_first_export_resolves_committed_set(self, meas):
        from tests._iceberg_reader import read_table

        _, mp = meas
        out = export_iceberg(mp)
        assert out["version"] == 0 and out["changed"] and out["files"] > 0
        state = read_table(mp)  # full strict walk
        got = {os.path.relpath(f["path"], mp) for f in state["files"]}
        committed = {os.path.relpath(f, mp)
                     for f in snapshots.data_files(mp)}
        assert got == committed  # the orphan is NOT referenced
        assert set(state["partition_columns"]) == {"year", "month",
                                                   "day", "hour"}
        # record_count is the real footer row count per file
        import pyarrow.parquet as pq

        for f in state["files"]:
            assert f["record_count"] == pq.ParquetFile(f["path"]) \
                .metadata.num_rows

    def test_duckdb_scan_matches_engine_rows(self, spark, meas):
        import duckdb

        from tests._iceberg_reader import duckdb_sql

        root, mp = meas
        export_iceberg(mp)
        sql = duckdb_sql(mp)
        con = duckdb.connect()
        got = con.execute(
            f"SELECT host, COUNT(*) n, SUM(value) s FROM ({sql}) "
            "GROUP BY host ORDER BY host").fetchall()
        engine = MeasurementCatalog(spark, root).table("metrics", "cpu")
        want = [(r["host"], r["n"], r["s"]) for r in engine.groupBy("host")
                .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
                .orderBy("host").collect()]
        assert got == want
        assert con.execute(
            f"SELECT COUNT(*) FROM ({sql}) WHERE host='zz'"
        ).fetchone()[0] == 0
        assert con.execute(
            f"SELECT DISTINCT year FROM ({sql})").fetchall() == [(2024,)]

    def test_empty_measurement_exports_without_crashing(self, tmp_path):
        """r6 advisory: a measurement with zero committed files used to
        crash `pa.unify_schemas([])`, aborting the whole scheduled sweep.
        It must now publish a valid (empty) snapshot and stay idempotent."""
        mp = str(tmp_path / "engine" / "metrics" / "empty")
        os.makedirs(mp)
        out = export_iceberg(mp)
        assert out["files"] == 0 and out["changed"]
        again = export_iceberg(mp)
        assert not again["changed"]
        # the published metadata is readable by the independent reader
        from tests._iceberg_reader import read_table

        state = read_table(mp)
        assert state["files"] == []

    def test_version_hint_never_moves_backwards(self, spark, meas):
        """r6 advisory: with concurrent exporters the older CAS winner can
        reach the hint write AFTER the newer one; the hint must skip the
        stale write instead of pinning readers to old metadata."""
        from arc_spark.operators.iceberg_export import _publish_version_hint
        from arc_spark.storage import backend_for

        root, mp = meas
        export_iceberg(mp)  # v0
        write_measurement(_df(spark, t_off=3), root, "metrics", "cpu",
                          tag_columns=["host"])
        export_iceberg(mp)  # v1
        bk = backend_for(mp)
        md = bk.join(mp, "metadata")
        hint = bk.join(md, "version-hint.text")
        assert bk.read_bytes(hint).decode().strip() == "1"
        _publish_version_hint(bk, md, 0)  # the straggler's late write
        assert bk.read_bytes(hint).decode().strip() == "1"
        _publish_version_hint(bk, md, 2)  # a newer one still advances
        assert bk.read_bytes(hint).decode().strip() == "2"
        # no temp residue
        assert not [f for f in os.listdir(md) if f.startswith(".hint-")]

    def test_version_hint_repairs_clobbered_regression(self, spark, meas):
        """r7 advisory: check-then-rename is not a lock — the older CAS
        winner can pass the pre-read and still rename LAST, regressing
        the hint. The publish's repair pass rescans v*.metadata.json
        (which always lands before any hint write) and republishes the
        directory max, so the regression never survives the last
        exporter's publish call."""
        from arc_spark.operators.iceberg_export import _publish_version_hint
        from arc_spark.storage import backend_for

        root, mp = meas
        export_iceberg(mp)  # v0
        write_measurement(_df(spark, t_off=3), root, "metrics", "cpu",
                          tag_columns=["host"])
        export_iceberg(mp)  # v1 — hint now "1"
        bk = backend_for(mp)
        md = bk.join(mp, "metadata")
        hint = bk.join(md, "version-hint.text")
        # simulate the lost race: the v0 straggler's rename landed after
        # the v1 writer's (the exact interleaving the pre-read misses)
        bk.write_bytes(hint, b"0")
        # ... and the straggler's own publish call repairs it, because
        # its post-rename rescan finds v1.metadata.json on disk
        _publish_version_hint(bk, md, 0)
        assert bk.read_bytes(hint).decode().strip() == "1"
        assert not [f for f in os.listdir(md) if f.startswith(".hint-")]

    def test_idempotent_and_incremental(self, spark, meas):
        from tests._iceberg_reader import read_table

        root, mp = meas
        assert export_iceberg(mp)["version"] == 0
        again = export_iceberg(mp)
        assert again["version"] == 0 and not again["changed"]
        write_measurement(_df(spark, t_off=7), root, "metrics", "cpu",
                          tag_columns=["host"])
        inc = export_iceberg(mp)
        assert inc["version"] == 1 and inc["changed"]
        state = read_table(mp)
        committed = {os.path.relpath(f, mp)
                     for f in snapshots.data_files(mp)}
        assert {os.path.relpath(f["path"], mp)
                for f in state["files"]} == committed
        # history retained: both snapshots + snapshot-log entries
        meta = json.load(open(os.path.join(
            mp, "metadata", "v1.metadata.json")))
        assert len(meta["snapshots"]) == 2
        assert len(meta["snapshot-log"]) == 2
        assert meta["last-sequence-number"] == 2
        assert meta["metadata-log"][-1]["metadata-file"].endswith(
            "v0.metadata.json")

    def test_compaction_reexport_resolves_new_set(self, spark, meas):
        import duckdb

        from tests._iceberg_reader import duckdb_sql, read_table

        root, mp = meas
        write_measurement(_df(spark, t_off=7), root, "metrics", "cpu",
                          tag_columns=["host"])
        export_iceberg(mp)
        n_before = duckdb.connect().execute(
            f"SELECT COUNT(*) FROM ({duckdb_sql(mp)})").fetchone()[0]
        compact_measurement(spark, root, "metrics", "cpu", min_files=2,
                            min_age_seconds=0)
        out = export_iceberg(mp)
        assert out["changed"]
        state = read_table(mp)
        committed = {os.path.relpath(f, mp)
                     for f in snapshots.data_files(mp)}
        assert {os.path.relpath(f["path"], mp)
                for f in state["files"]} == committed
        n_after = duckdb.connect().execute(
            f"SELECT COUNT(*) FROM ({duckdb_sql(mp)})").fetchone()[0]
        assert n_after == n_before

    def test_crashed_hint_recovers(self, meas):
        """A missing/stale version-hint (crash between metadata CAS and
        hint write) must not wedge the next export."""
        from tests._iceberg_reader import read_table

        _, mp = meas
        export_iceberg(mp)
        hint = os.path.join(mp, "metadata", "version-hint.text")
        os.unlink(hint)
        out = export_iceberg(mp)  # scans v*.metadata.json, re-publishes
        assert out["version"] == 0 and not out["changed"] \
            or out["version"] == 1
        # hint restored by the next CHANGED export
        if not os.path.exists(hint):
            from arc_spark.sources.writer import write_measurement  # noqa
        # force a change to re-publish the hint
        state_ok = True
        try:
            read_table(mp)
        except AssertionError:
            state_ok = False
        # unchanged export doesn't rewrite the hint; a changed one must
        if not state_ok:
            import pyarrow as pa

            from arc_spark.sources.writer import write_measurement_arrow
            write_measurement_arrow(pa.table({
                "time": pa.array([1_705_310_000_000_000],
                                 pa.timestamp("us")),
                "host": pa.array(["a"]), "value": pa.array([1.0]),
            }), os.path.dirname(os.path.dirname(mp)), "metrics", "cpu",
                tag_columns=["host"])
            out = export_iceberg(mp)
            assert out["changed"]
            read_table(mp)

    def test_concurrent_cas_loser_retries_and_converges(self, meas,
                                                        monkeypatch):
        """CAS discipline: when another exporter publishes the version we
        computed between our state read and our commit, the commit must
        never clobber — the loser cleans its side files (manifest,
        manifest list, tmp), rereads the metadata, and converges (here to
        a no-op: the committed set is unchanged). Simulated by a one-shot
        stale (-1, None) state read after v0 exists."""
        from tests._iceberg_reader import read_table

        import arc_spark.operators.iceberg_export as ie

        _, mp = meas
        export_iceberg(mp)  # publishes v0
        real = ie._current_metadata
        calls = {"n": 0}

        def stale_once(bk, table_path):
            calls["n"] += 1
            if calls["n"] == 1:
                return -1, None  # pre-v0 view → recomputes version 0
            return real(bk, table_path)

        monkeypatch.setattr(ie, "_current_metadata", stale_once)
        out = export_iceberg(mp)
        assert out["changed"] is False and out["version"] == 0
        assert calls["n"] == 2  # one lost CAS, one converging reread
        md = os.path.join(mp, "metadata")
        avros = sorted(f for f in os.listdir(md) if f.endswith(".avro"))
        # exactly v0's pair — the loser's avros were cleaned up
        assert len(avros) == 2
        assert not [f for f in os.listdir(md) if ".tmp" in f]
        read_table(mp)  # still resolves cleanly

    def test_cas_exhaustion_raises(self, meas, monkeypatch):
        import arc_spark.operators.iceberg_export as ie

        _, mp = meas
        export_iceberg(mp)
        monkeypatch.setattr(ie, "_current_metadata",
                            lambda bk, table_path: (-1, None))
        with pytest.raises(RuntimeError, match="lost the version CAS"):
            export_iceberg(mp)

    def test_foreign_version_is_built_upon(self, meas):
        """A foreign/corrupt v1.metadata.json doesn't wedge the exporter:
        the scan sees it and the next export commits v2 on top."""
        from tests._iceberg_reader import read_table

        _, mp = meas
        export_iceberg(mp)
        md = os.path.join(mp, "metadata")
        with open(os.path.join(md, "v1.metadata.json"), "w") as fh:
            fh.write("not json")
        import pyarrow as pa

        from arc_spark.sources.writer import write_measurement_arrow
        write_measurement_arrow(pa.table({
            "time": pa.array([1_705_310_000_000_000], pa.timestamp("us")),
            "host": pa.array(["a"]), "value": pa.array([1.0]),
        }), os.path.dirname(os.path.dirname(mp)), "metrics", "cpu",
            tag_columns=["host"])
        out = export_iceberg(mp)
        assert out["version"] == 2 and out["changed"]
        state = read_table(mp)
        committed = {os.path.relpath(f, mp)
                     for f in snapshots.data_files(mp)}
        assert {os.path.relpath(f["path"], mp)
                for f in state["files"]} == committed

    def test_reader_has_teeth(self, meas):
        """Mutations an exporter could plausibly get wrong must FAIL the
        independent walk: truncated manifest, missing field-id, wrong
        manifest_length, broken sync marker."""
        from tests._avro_reader import AvroError, read_avro
        from tests._iceberg_reader import IcebergError, read_table

        _, mp = meas
        export_iceberg(mp)
        md = os.path.join(mp, "metadata")
        manifest = next(f for f in os.listdir(md)
                        if f.endswith("-m0.avro"))
        mpath = os.path.join(md, manifest)
        orig = open(mpath, "rb").read()
        # 1. wrong manifest_length (truncate the manifest)
        with open(mpath, "wb") as fh:
            fh.write(orig[:-1])
        with pytest.raises((IcebergError, AvroError)):
            read_table(mp)
        with open(mpath, "wb") as fh:
            fh.write(orig)
        read_table(mp)
        # 2. broken sync marker
        bad = orig[:-16] + bytes(16)
        with pytest.raises(AvroError):
            read_avro(bad)
        # 3. schema without field-ids fails id-projection
        from arc_spark.operators.avro_min import write_avro
        from tests._avro_reader import read_avro as _ra

        noid = write_avro({"type": "record", "name": "x", "fields": [
            {"name": "a", "type": "long"}]}, [{"a": 1}])
        sch, _, recs = _ra(noid)
        from tests._iceberg_reader import _by_field_id
        with pytest.raises(IcebergError):
            _by_field_id(sch, recs[0])


class TestSnapshotExpiry:
    def test_retain_bounds_metadata_and_sweeps_files(self, spark, meas):
        """retain=3 over 6 changed exports: metadata keeps <=3 snapshots,
        dropped snapshots' manifest-list/manifest Avros and old
        v<N>.metadata.json copies are physically gone, and the current
        snapshot stays fully readable by the independent walker
        (exporter.go expireSnapshots + pruneOldVersionFiles parity)."""
        import pyarrow as pa

        from arc_spark.sources.writer import write_measurement_arrow
        from tests._iceberg_reader import read_table

        root, mp = meas
        for i in range(6):
            write_measurement_arrow(pa.table({
                "time": pa.array([1_705_310_000_000_000 + i * 10**6],
                                 pa.timestamp("us")),
                "host": pa.array([f"h{i}"]), "value": pa.array([float(i)]),
            }), root, "metrics", "cpu", tag_columns=["host"])
            out = export_iceberg(mp, retain=3)
            assert out["changed"]
        md = os.path.join(mp, "metadata")
        meta = json.load(open(os.path.join(
            md, f"v{out['version']}.metadata.json")))
        assert len(meta["snapshots"]) == 3
        assert meta["current-snapshot-id"] == out["snapshot_id"]
        live_ids = {s["snapshot-id"] for s in meta["snapshots"]}
        assert {e["snapshot-id"] for e in meta["snapshot-log"]} <= live_ids
        # physical sweep: exactly one manifest-list + one manifest per
        # retained snapshot remain, old metadata jsons pruned to retain
        mlists = [f for f in os.listdir(md) if f.startswith("snap-")]
        manifests = [f for f in os.listdir(md) if f.endswith("-m0.avro")]
        assert len(mlists) == 3 and len(manifests) == 3
        metas = [f for f in os.listdir(md) if f.endswith(".metadata.json")]
        assert len(metas) == 3
        state = read_table(mp)  # current version still fully valid
        committed = {os.path.relpath(f, mp)
                     for f in snapshots.data_files(mp)}
        assert {os.path.relpath(f["path"], mp)
                for f in state["files"]} == committed

    def test_retain_zero_keeps_all(self, spark, meas):
        import pyarrow as pa

        from arc_spark.sources.writer import write_measurement_arrow

        root, mp = meas
        for i in range(4):
            write_measurement_arrow(pa.table({
                "time": pa.array([1_705_320_000_000_000 + i * 10**6],
                                 pa.timestamp("us")),
                "host": pa.array([f"k{i}"]), "value": pa.array([1.0]),
            }), root, "metrics", "cpu", tag_columns=["host"])
            out = export_iceberg(mp, retain=0)
        md = os.path.join(mp, "metadata")
        meta = json.load(open(os.path.join(
            md, f"v{out['version']}.metadata.json")))
        assert len(meta["snapshots"]) == 4


class TestConfigWiring:
    def test_export_scheduler_job_iceberg_format(self, spark, meas):
        """[export] format="iceberg" routes the scheduler job through
        export_iceberg; ARC_EXPORT_FORMAT env override works."""
        from arc_spark.config import build_engine, load_config, shutdown
        from tests._iceberg_reader import read_table

        root, mp = meas
        cfg = load_config(None, env={
            "ARC_STORAGE_LOCAL_PATH": root,
            "ARC_SERVER_PORT": "0",
            "ARC_EXPORT_ENABLED": "true",
            "ARC_EXPORT_FORMAT": "iceberg",
            "ARC_METRICS_TIMESERIES_ENABLED": "false",
        })
        engine = build_engine(cfg, spark=spark)
        try:
            out = engine["scheduler"].trigger_now("export")
            assert out["measurements"] >= 1 and out["commits"] >= 1
            state = read_table(mp)
            assert len(state["files"]) > 0
        finally:
            shutdown(engine)

    def test_export_format_both(self, spark, meas):
        """format="both": one scheduler pass publishes the Delta log AND
        Iceberg metadata over the same committed set; both independent
        readers resolve the identical file list."""
        from arc_spark.config import build_engine, load_config, shutdown
        from tests._delta_reader import read_state
        from tests._iceberg_reader import read_table

        root, mp = meas
        cfg = load_config(None, env={
            "ARC_STORAGE_LOCAL_PATH": root,
            "ARC_SERVER_PORT": "0",
            "ARC_EXPORT_ENABLED": "true",
            "ARC_EXPORT_FORMAT": "both",
            "ARC_METRICS_TIMESERIES_ENABLED": "false",
        })
        engine = build_engine(cfg, spark=spark)
        try:
            out = engine["scheduler"].trigger_now("export")
            assert out["commits"] >= 1
            delta_files = set(read_state(mp)["files"])
            ice_files = {os.path.relpath(f["path"], mp)
                         for f in read_table(mp)["files"]}
            assert delta_files == ice_files and delta_files
        finally:
            shutdown(engine)

    def test_bad_format_rejected(self, spark, meas):
        """A format typo now fails at LOAD (check-config visibility),
        before any engine wiring."""
        from arc_spark.config import load_config

        root, _ = meas
        with pytest.raises(ValueError, match="format"):
            load_config(None, env={
                "ARC_STORAGE_LOCAL_PATH": root,
                "ARC_SERVER_PORT": "0",
                "ARC_EXPORT_ENABLED": "true",
                "ARC_EXPORT_FORMAT": "parquetish",
                "ARC_METRICS_TIMESERIES_ENABLED": "false",
            })


try:
    import pyiceberg  # noqa: F401

    _HAS_PYICEBERG = True
except Exception:
    _HAS_PYICEBERG = False


@pytest.mark.skipif(not _HAS_PYICEBERG, reason="pyiceberg not installed "
                    "(no pip/network in this container); the independent "
                    "spec-reader suite above always runs")
class TestLivePyIcebergReader:
    def test_pyiceberg_reads_exported_table(self, spark, meas):
        from pyiceberg.table import StaticTable

        _, mp = meas
        export_iceberg(mp)
        v = int(open(os.path.join(mp, "metadata",
                                  "version-hint.text")).read())
        tbl = StaticTable.from_metadata(
            os.path.join(mp, "metadata", f"v{v}.metadata.json"))
        committed_rows = sum(
            1 for _ in spark.read.parquet(*snapshots.data_files(mp))
            .collect())
        assert tbl.scan().to_arrow().num_rows == committed_rows


class TestAvroPropertyFuzz:
    """Hypothesis fuzz over the writer/independent-reader pair: random
    records through every construct Iceberg metadata uses must
    round-trip exactly (catches zigzag/varint/union-branch/block-framing
    bugs on shapes the handwritten cases miss)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _rec = st.fixed_dictionaries({
        "a": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "b": st.one_of(st.none(), st.text(max_size=30)),
        "c": st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
                      max_size=8),
        "d": st.dictionaries(st.text(min_size=1, max_size=6),
                             st.integers(min_value=-(2**63),
                                         max_value=2**63 - 1), max_size=4),
        "e": st.one_of(st.none(), st.binary(max_size=20)),
        "f": st.booleans(),
        "g": st.floats(allow_nan=False, allow_infinity=False, width=64),
    })

    SCHEMA = {
        "type": "record", "name": "t",
        "fields": [
            {"name": "a", "type": "long", "field-id": 1},
            {"name": "b", "type": ["null", "string"], "field-id": 2},
            {"name": "c", "type": {"type": "array", "items": "int"},
             "field-id": 3},
            {"name": "d", "type": {"type": "map", "values": "long"},
             "field-id": 4},
            {"name": "e", "type": ["null", "bytes"], "field-id": 5},
            {"name": "f", "type": "boolean", "field-id": 6},
            {"name": "g", "type": "double", "field-id": 7},
        ],
    }

    @given(recs=st.lists(_rec, max_size=20))
    @settings(max_examples=80, deadline=None)
    def test_roundtrip(self, recs):
        from arc_spark.operators.avro_min import write_avro
        from tests._avro_reader import read_avro

        data = write_avro(self.SCHEMA, recs)
        _, _, got = read_avro(data)
        assert got == recs


class TestCrashOrphanSweep:
    def test_crashed_export_avros_swept_after_age_floor(
            self, spark, meas, monkeypatch):
        """A crash between manifest write and metadata CAS leaves
        unreferenced Avros; the next changed export sweeps them once
        they age past the floor — young files (a concurrent exporter
        mid-commit) are never touched."""
        import arc_spark.operators.iceberg_export as ie
        from tests._iceberg_reader import read_table

        _, mp = meas
        export_iceberg(mp)
        md = os.path.join(mp, "metadata")
        # simulate the crash residue: orphan manifest-list + manifest
        orphan_ml = os.path.join(md, "snap-1234-1-deadbeef.avro")
        orphan_m = os.path.join(md, "deadbeef-m0.avro")
        for p in (orphan_ml, orphan_m):
            with open(p, "wb") as fh:
                fh.write(b"Obj\x01junk")
        # young: a changed export must NOT sweep them
        import pyarrow as pa

        from arc_spark.sources.writer import write_measurement_arrow

        def _grow(i):
            write_measurement_arrow(pa.table({
                "time": pa.array([1_705_330_000_000_000 + i * 10**6],
                                 pa.timestamp("us")),
                "host": pa.array([f"g{i}"]), "value": pa.array([1.0]),
            }), os.path.dirname(os.path.dirname(mp)), "metrics", "cpu",
                tag_columns=["host"])

        _grow(0)
        export_iceberg(mp)
        assert os.path.exists(orphan_ml) and os.path.exists(orphan_m)
        # aged past the floor: swept on the next changed export
        monkeypatch.setattr(ie, "ORPHAN_AVRO_MIN_AGE_S", 0.0)
        _grow(1)
        export_iceberg(mp)
        assert not os.path.exists(orphan_ml)
        assert not os.path.exists(orphan_m)
        state = read_table(mp)  # retained snapshots remain fully readable
        assert len(state["files"]) > 0


class TestRowcountSidecar:
    def test_reexport_reads_only_new_footers(self, spark, meas,
                                             monkeypatch):
        """Re-exports pay O(changed files) footer reads: the sidecar
        caches immutable files' row counts; stale/corrupt sidecars only
        cost a full sweep."""
        import pyarrow as pa

        import arc_spark.operators.iceberg_export as ie
        from arc_spark.sources.writer import write_measurement_arrow

        _, mp = meas
        export_iceberg(mp)
        calls = []
        from arc_spark.storage import backend_for
        bk = backend_for(mp)
        orig = type(bk).parquet_metadata

        def spy(self, path):
            calls.append(path)
            return orig(self, path)

        monkeypatch.setattr(type(bk), "parquet_metadata", spy)
        write_measurement_arrow(pa.table({
            "time": pa.array([1_705_340_000_000_000], pa.timestamp("us")),
            "host": pa.array(["n1"]), "value": pa.array([1.0]),
        }), os.path.dirname(os.path.dirname(mp)), "metrics", "cpu",
            tag_columns=["host"])
        out = export_iceberg(mp)
        assert out["changed"]
        # only the NEW file's footer was read for record_count (schema
        # sampling also reads footers via parquet_schema, not counted)
        new_reads = [c for c in calls]
        assert len(new_reads) == 1, new_reads
        # corrupt sidecar → full sweep, still correct
        with open(os.path.join(mp, "metadata", ".rowcounts.json"),
                  "w") as fh:
            fh.write("not json")
        calls.clear()
        write_measurement_arrow(pa.table({
            "time": pa.array([1_705_341_000_000_000], pa.timestamp("us")),
            "host": pa.array(["n2"]), "value": pa.array([1.0]),
        }), os.path.dirname(os.path.dirname(mp)), "metrics", "cpu",
            tag_columns=["host"])
        out2 = export_iceberg(mp)
        assert out2["changed"] and len(calls) == out2["files"]
        from tests._iceberg_reader import read_table
        assert len(read_table(mp)["files"]) == out2["files"]
