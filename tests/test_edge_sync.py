"""Edge sync (A40): spool → ship → hub import, with disconnects and replays."""

from __future__ import annotations

import os

from arc_spark.api import IngestService
from arc_spark.catalog import MeasurementCatalog
from arc_spark.sources.edge import EdgeSpool, EdgeSync, HubReceiver
from arc_spark.sources.msgpack_codec import packb


def _payload(i):
    return packb({
        "m": "cpu",
        "columns": {"time": [1700000000000000 + i * 60_000_000],
                    "host": [f"edge{i % 2}"], "value": [float(i)]},
        "tags": ["host"],
    })


class TestEdgeSync:
    def test_offline_spool_then_full_sync(self, spark, tmp_path):
        spool = EdgeSpool(str(tmp_path / "spool"))
        for i in range(5):
            spool.append(_payload(i))
        assert len(spool.pending()) == 5

        hub_root = str(tmp_path / "hub")
        ingest = IngestService(spark, hub_root, max_buffer_rows=10**9,
                               max_buffer_age_s=10**9)
        hub = HubReceiver(ingest, db="metrics")
        sync = EdgeSync(spool, lambda name, data: hub.receive("node1", name, data))
        assert sync.sync() == 5
        assert spool.pending() == []
        ingest.flush()
        assert MeasurementCatalog(spark, hub_root).table("metrics", "cpu").count() == 5

    def test_disconnect_preserves_order_and_resumes(self, spark, tmp_path):
        spool = EdgeSpool(str(tmp_path / "s2"))
        for i in range(4):
            spool.append(_payload(i))
        calls = {"n": 0}

        def flaky(name, data):
            calls["n"] += 1
            return calls["n"] != 2  # second ship attempt fails (link drop)

        sync = EdgeSync(spool, flaky)
        assert sync.sync() == 1  # stops at the failure, keeps ordering
        assert len(spool.pending()) == 3
        sync2 = EdgeSync(spool, lambda n, d: True)
        assert sync2.sync() == 3

    def test_replay_is_deduplicated_at_hub(self, spark, tmp_path):
        spool = EdgeSpool(str(tmp_path / "s3"))
        spool.append(_payload(0))
        hub_root = str(tmp_path / "hub3")
        ingest = IngestService(spark, hub_root, max_buffer_rows=10**9,
                               max_buffer_age_s=10**9)
        hub = HubReceiver(ingest, db="m")
        shipped = []

        def capture(name, data):
            shipped.append((name, data))
            return hub.receive("n1", name, data)

        EdgeSync(spool, capture).sync()
        # at-least-once: the same file arrives again after an ack loss
        assert hub.receive("n1", *shipped[0]) is True
        assert ingest.stats["acked"] == 1  # applied exactly once

    def test_corrupt_spool_file_quarantined(self, spark, tmp_path):
        spool = EdgeSpool(str(tmp_path / "s4"))
        spool.append(_payload(0))
        spool.append(_payload(1))
        first = sorted(spool.pending())[0]
        p = os.path.join(spool.dir, first)
        data = bytearray(open(p, "rb").read())
        data[-1] ^= 0xFF
        open(p, "wb").write(bytes(data))
        sync = EdgeSync(spool, lambda n, d: True)
        assert sync.sync() == 1  # only the intact file ships
        assert any(f.endswith(".corrupt") for f in os.listdir(spool.dir))
