"""Air-gap bundle transport (reference internal/edgesync/ bundle.go /
exporter.go / importer.go / bundleindex.go / ack.go / bundle_dest.go):
export pending ledger entries to removable media, verified hub import
with replay protection, signed ack return leg."""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from arc_spark.sources.edgesync import HubReceiver, SyncLedger
from arc_spark.sources.edgesync_bundle import (
    ACK_NAME,
    DATA_DIR,
    ENTRIES_NAME,
    MANIFEST_NAME,
    BundleAlreadyImported,
    BundleError,
    BundleExporter,
    BundleImporter,
    BundleIndex,
    DestinationPolicy,
    SpokeRegistry,
    new_bundle_id,
    validate_bundle_id,
)

SECRET = "shared-spoke-secret"


def _spoke_tree(tmp_path, n=4, size=2000):
    root = tmp_path / "spoke"
    part = root / "metrics" / "cpu" / "year=2024" / "month=1" / \
        "day=1" / "hour=0"
    part.mkdir(parents=True)
    for i in range(n):
        (part / f"f{i}.parquet").write_bytes(
            f"PARQUET-{i}-".encode() * (size // 10))
    return str(root)


def _exporter(tmp_path, **kw):
    root = kw.pop("root", None) or _spoke_tree(tmp_path)
    led = SyncLedger(str(tmp_path / "ledger.db"))
    return BundleExporter(root, led, spoke_id="edge-1", hub_id="hub-A",
                          secret=SECRET, **kw), led


def _importer(tmp_path, hub_id="hub-A", secret=SECRET, enabled=True):
    recv = HubReceiver(str(tmp_path / "hub"))
    reg = SpokeRegistry()
    reg.register("edge-1", secret, enabled=enabled)
    return BundleImporter(recv, BundleIndex(), reg, hub_id=hub_id), recv


class TestBundleId:
    def test_shape_and_sortability(self):
        a = new_bundle_id(now=1_700_000_000.0)
        b = new_bundle_id(now=1_700_000_100.0)
        validate_bundle_id(a)
        assert len(a) == 26 and a < b  # time-prefixed → sortable

    @pytest.mark.parametrize("bad", ["", "short", "x" * 26, "0" * 25 + "I",
                                     "0" * 25 + "u", "A" * 27])
    def test_invalid_rejected(self, bad):
        with pytest.raises(BundleError):
            validate_bundle_id(bad)


class TestExport:
    def test_export_layout_and_ledger_state(self, tmp_path):
        exp, led = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        assert out["files"] == 4 and out["bytes"] > 0
        bdir = tmp_path / "media" / out["bundle_id"]
        assert (bdir / MANIFEST_NAME).exists()
        assert (bdir / ENTRIES_NAME).exists()
        m = json.loads((bdir / MANIFEST_NAME).read_text())
        assert m["entry_count"] == 4 and m["hub_id"] == "hub-A"
        assert hashlib.sha256(
            (bdir / ENTRIES_NAME).read_bytes()).hexdigest() == \
            m["entries_sha256"]
        # every entry's bytes are under data/ at its sync path
        for line in (bdir / ENTRIES_NAME).read_text().splitlines():
            e = json.loads(line)
            assert (bdir / DATA_DIR / e["path"]).stat().st_size == \
                e["size_bytes"]
        # ledger: everything moved pending → exported (nothing pending)
        assert led.pending("hub-A") == []
        # a second export finds nothing new
        assert exp.export(str(tmp_path / "media2"))["files"] == 0

    def test_revert_returns_entries_to_pending(self, tmp_path):
        exp, led = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        assert exp.revert(out["bundle_id"]) == 4
        assert len(led.pending("hub-A")) == 4


class TestImport:
    def test_roundtrip_import_and_ack(self, tmp_path):
        exp, led = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        bdir = str(tmp_path / "media" / out["bundle_id"])
        imp, recv = _importer(tmp_path)
        res = imp.import_bundle(bdir)
        assert res["committed"] == 4 and res["conflicts"] == []
        assert res["ack_written"] is True
        assert recv.index.count() == 4
        # hub holds byte-identical files at the sync paths
        for line in open(os.path.join(bdir, ENTRIES_NAME)):
            e = json.loads(line)
            hub_file = tmp_path / "hub" / e["path"]
            assert hashlib.sha256(
                hub_file.read_bytes()).hexdigest() == e["sha256"]
        # the drive rides back: ack advances the spoke ledger to synced
        ackres = exp.apply_ack(bdir)
        assert ackres["synced"] == 4 and ackres["conflicted"] == 0
        assert led.stats("hub-A")["synced"]["files"] == 4

    def test_replay_refused_without_rehash(self, tmp_path):
        exp, _ = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        bdir = str(tmp_path / "media" / out["bundle_id"])
        imp, _ = _importer(tmp_path)
        imp.import_bundle(bdir)
        with pytest.raises(BundleAlreadyImported):
            imp.import_bundle(bdir)  # drive plugged in twice

    def test_wrong_hub_refused_even_if_signed(self, tmp_path):
        exp, _ = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        bdir = str(tmp_path / "media" / out["bundle_id"])
        imp, _ = _importer(tmp_path, hub_id="hub-B")  # same secret!
        with pytest.raises(BundleError, match="addressed to hub"):
            imp.import_bundle(bdir)

    def test_unknown_and_disabled_spoke_refused(self, tmp_path):
        exp, _ = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        bdir = str(tmp_path / "media" / out["bundle_id"])
        recv = HubReceiver(str(tmp_path / "hub"))
        imp = BundleImporter(recv, BundleIndex(), SpokeRegistry(),
                             hub_id="hub-A")
        with pytest.raises(BundleError, match="unknown spoke"):
            imp.import_bundle(bdir)
        imp2, _ = _importer(tmp_path, enabled=False)
        with pytest.raises(BundleError, match="disabled"):
            imp2.import_bundle(bdir)

    def test_tampered_manifest_mac_refused(self, tmp_path):
        exp, _ = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        bdir = tmp_path / "media" / out["bundle_id"]
        m = json.loads((bdir / MANIFEST_NAME).read_text())
        m["total_bytes"] += 1  # any bound field
        (bdir / MANIFEST_NAME).write_text(json.dumps(m))
        imp, recv = _importer(tmp_path)
        with pytest.raises(BundleError, match="MAC"):
            imp.import_bundle(str(bdir))
        assert recv.index.count() == 0

    def test_wrong_secret_refused(self, tmp_path):
        exp, _ = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        bdir = str(tmp_path / "media" / out["bundle_id"])
        imp, _ = _importer(tmp_path, secret="a-different-secret")
        with pytest.raises(BundleError, match="MAC"):
            imp.import_bundle(bdir)

    def test_corrupt_data_file_commits_nothing(self, tmp_path):
        """Verify-all-before-commit-any: one flipped byte in one data
        file → the WHOLE bundle is refused, zero files promoted."""
        exp, _ = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        bdir = tmp_path / "media" / out["bundle_id"]
        victim = next((bdir / DATA_DIR).rglob("*.parquet"))
        data = bytearray(victim.read_bytes())
        data[5] ^= 0xFF
        victim.write_bytes(bytes(data))
        imp, recv = _importer(tmp_path)
        with pytest.raises(BundleError, match="does not match"):
            imp.import_bundle(str(bdir))
        assert recv.index.count() == 0

    def test_conflict_reported_not_acked_not_overwritten(self, tmp_path):
        exp, _ = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        bdir = str(tmp_path / "media" / out["bundle_id"])
        imp, recv = _importer(tmp_path)
        # hub already holds DIFFERENT bytes at one of the paths
        e0 = json.loads(open(os.path.join(bdir, ENTRIES_NAME))
                        .readline())
        other = b"HUB-HAS-DIFFERENT-CONTENT"
        recv.receive(e0["path"], hashlib.sha256(other).hexdigest(), other)
        res = imp.import_bundle(bdir)
        assert res["committed"] == 3
        assert [c["path"] for c in res["conflicts"]] == [e0["path"]]
        # hub bytes untouched
        assert (tmp_path / "hub" / e0["path"]).read_bytes() == other
        # the ack excludes the conflicted path; applying it marks the
        # entry conflicted, NOT synced
        ackres = exp.apply_ack(bdir)
        assert ackres["synced"] == 3 and ackres["conflicted"] == 1

    def test_ack_from_wrong_hub_never_advances(self, tmp_path):
        exp, led = _exporter(tmp_path)
        out = exp.export(str(tmp_path / "media"))
        bdir = str(tmp_path / "media" / out["bundle_id"])
        imp, _ = _importer(tmp_path)
        imp.import_bundle(bdir)
        ack = json.load(open(os.path.join(bdir, ACK_NAME)))
        ack["hub_id"] = "hub-EVIL"
        json.dump(ack, open(os.path.join(bdir, ACK_NAME), "w"))
        with pytest.raises(BundleError):
            exp.apply_ack(bdir)
        assert led.stats("hub-A").get("synced", {}).get("files", 0) == 0


class TestDestinationPolicy:
    def test_containment_and_storage_root_exclusion(self, tmp_path):
        allowed = tmp_path / "mnt" / "usb"
        allowed.mkdir(parents=True)
        inner = allowed / "bundles"
        inner.mkdir()
        pol = DestinationPolicy([str(allowed)],
                                storage_root=str(tmp_path / "data"))
        assert pol.enabled()
        assert pol.resolve(str(inner)) == os.path.realpath(str(inner))
        with pytest.raises(BundleError, match="outside"):
            pol.resolve(str(tmp_path / "elsewhere"))
        (tmp_path / "data").mkdir()
        with pytest.raises(BundleError, match="storage root"):
            pol.resolve(str(tmp_path / "data"))
        # escape attempts normalize before the check
        with pytest.raises(BundleError, match="outside"):
            pol.resolve(str(allowed / ".." / ".." / "etc"))
        assert not DestinationPolicy([]).enabled()


class TestHttpAndConfigWiring:
    def test_bundle_import_over_http(self, spark, tmp_path):
        """Operator workflow over the wire: register the spoke, POST the
        bundle dir, read history; policy rejects directories outside the
        allow-list; replay 409s."""
        import urllib.error
        import urllib.request

        from arc_spark.config import build_engine, load_config, shutdown

        media = tmp_path / "mnt" / "usb"
        media.mkdir(parents=True)
        exp, _ = _exporter(tmp_path)
        out = exp.export(str(media))
        bdir = str(media / out["bundle_id"])
        cfg = load_config(None, env={
            "ARC_STORAGE_LOCAL_PATH": str(tmp_path / "hub"),
            "ARC_SERVER_PORT": "0",
            "ARC_EDGE_SYNC_HUB_ENABLED": "true",
            "ARC_EDGE_SYNC_HUB_ID": "hub-A",
            "ARC_EDGE_SYNC_HUB_BUNDLE_IMPORT_DIRS": str(tmp_path / "mnt"),
            "ARC_METRICS_TIMESERIES_ENABLED": "false",
        })
        engine = build_engine(cfg, spark=spark)
        engine["server"].start()
        base = f"http://127.0.0.1:{engine['server'].port}"

        def post(route, obj, expect=200):
            req = urllib.request.Request(
                base + route, data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
                method="POST")
            with urllib.request.urlopen(req, timeout=30) as r:
                assert r.status == expect
                return json.load(r)

        try:
            post("/api/v1/sync-spokes",
                 {"spoke_id": "edge-1", "secret": SECRET}, expect=201)
            res = post("/api/v1/bundle-import", {"dir": bdir})
            assert res["committed"] == 4
            # history reflects it
            with urllib.request.urlopen(
                    base + "/api/v1/bundle-import/history/edge-1",
                    timeout=30) as r:
                hist = json.load(r)
            assert hist["bundles"][0]["bundle_id"] == out["bundle_id"]
            # replay → 409; out-of-policy dir → 400
            for route, obj, code in (
                    ("/api/v1/bundle-import", {"dir": bdir}, 409),
                    ("/api/v1/bundle-import",
                     {"dir": str(tmp_path / "elsewhere")}, 400)):
                with pytest.raises(urllib.error.HTTPError) as e:
                    post(route, obj)
                assert e.value.code == code
            # the imported files are committed + indexed on the hub
            assert engine["server"].edge_receiver.index.count() == 4
            from arc_spark import snapshots

            assert len(snapshots.data_files(
                str(tmp_path / "hub" / "metrics" / "cpu"))) == 4
        finally:
            shutdown(engine)

    def test_spoke_cli_export_and_ack(self, tmp_path):
        """`python -m arc_spark bundle export/ack` end to end in-process
        (subprocess-free: the CLI functions are called directly)."""
        from arc_spark.__main__ import main

        import io
        from contextlib import redirect_stdout

        root = _spoke_tree(tmp_path)
        cfgfile = tmp_path / "arc.toml"
        cfgfile.write_text(
            f"[storage]\nlocal_path = '{root}'\n"
            "[edge_sync]\nspoke_id = 'edge-1'\nspoke_hub_id = 'hub-A'\n"
            f"spoke_secret = '{SECRET}'\n"
            f"spoke_ledger_db = '{tmp_path / 'ledger.db'}'\n")
        media = tmp_path / "media"
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = main(["bundle", "export", "-c", str(cfgfile),
                       "--dest", str(media)])
        assert rc == 0
        out = json.loads(buf.getvalue())
        assert out["files"] == 4
        bdir = str(media / out["bundle_id"])
        imp, _ = _importer(tmp_path)
        imp.import_bundle(bdir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = main(["bundle", "ack", bdir, "-c", str(cfgfile)])
        assert rc == 0
        assert json.loads(buf.getvalue())["synced"] == 4


class TestLargeFileBoundedMemory:
    def test_import_uses_chunked_receiver_path(self, tmp_path):
        """Bundled files commit through begin/append/finish — a file
        bigger than CHUNK_BYTES still imports (memory bounded per part)."""
        import arc_spark.sources.edgesync_bundle as mod

        root = tmp_path / "spoke"
        part = root / "db" / "m" / "year=2024" / "month=1" / "day=1" / \
            "hour=0"
        part.mkdir(parents=True)
        big = os.urandom(256 << 10)
        (part / "big.parquet").write_bytes(big)
        led = SyncLedger()
        exp = BundleExporter(str(root), led, "edge-1", "hub-A", SECRET)
        # small chunk for the test: exercise the multi-part path
        orig = mod.CHUNK_BYTES
        mod.CHUNK_BYTES = 32 << 10
        try:
            out = exp.export(str(tmp_path / "media"))
            imp, recv = _importer(tmp_path)
            res = imp.import_bundle(
                str(tmp_path / "media" / out["bundle_id"]))
        finally:
            mod.CHUNK_BYTES = orig
        assert res["committed"] == 1
        assert (tmp_path / "hub" / "db" / "m" / "year=2024" / "month=1" /
                "day=1" / "hour=0" / "big.parquet").read_bytes() == big
