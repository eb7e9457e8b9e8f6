"""r15 item 3 (VERDICT r14): A/B — drain a fixed deferred-msgpack
backlog as ONE distributed job (current) vs TWO CONCURRENT half-jobs
(guide SS2.6 overlap: the second job's tasks back-fill executors freed
by the first job's tail; 2 x 16 tasks also fills the 32-core box where
one cores/2-capped job leaves half idle).

The r14 timeline profile (defer_drain_profile_r15) showed the defer
pipeline is already gapless — drains run back-to-back with ~15 ms
turnaround — so the e2e rate IS the drain job's own throughput. This
tests whether concurrent sub-drains raise it.

Writes /tmp/defer_overlap_ab_r15.json.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

while os.path.exists("/tmp/arc_hunter_firing"):
    time.sleep(30)
open("/tmp/arc_ab_busy", "w").close()

try:
    from concurrent.futures import ThreadPoolExecutor  # noqa: E402

    from arc_spark.api import IngestService  # noqa: E402
    from arc_spark.session import get_spark  # noqa: E402
    from arc_spark.sources.msgpack_codec import packb  # noqa: E402

    spark = get_spark()

    sus_n = 10_000
    sus_payloads = [packb({
        "m": "cpu",
        "columns": {
            "time": [1700000000000000 + (j * sus_n + i) * 1000
                     for i in range(sus_n)],
            "host": [f"h{i % 64}" for i in range(sus_n)],
            "value": [float(i % 997) for i in range(sus_n)],
        },
        "tags": ["host"],
    }) for j in range(8)]

    # fixed backlog ~ the backpressure ceiling the sustained lane drains
    N_PAYLOADS = 1200  # ~262 MB, ~12M rows — one real drain's size
    entries = [("msgpack", sus_payloads[j % 8]) for j in range(N_PAYLOADS)]
    n_rows_expect = N_PAYLOADS * sus_n

    def one_drain(svc, db):
        t0 = time.perf_counter()
        rows = svc._drain_raw_distributed(db, entries)
        dt = time.perf_counter() - t0
        assert rows == n_rows_expect, rows
        return dt

    def split_drain(svc, db, n_split):
        per = (len(entries) + n_split - 1) // n_split
        parts = [entries[i * per:(i + 1) * per] for i in range(n_split)]
        parts = [p for p in parts if p]
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=len(parts)) as ex:
            rows = sum(ex.map(
                lambda p: svc._drain_raw_distributed(db, p), parts))
        dt = time.perf_counter() - t0
        assert rows == n_rows_expect, rows
        return dt

    res: dict[str, list] = {}
    with tempfile.TemporaryDirectory() as td:
        svc = IngestService(spark, td, defer_decode=True)
        # warm the distributed path / worker pool (both shapes)
        split_drain(svc, "warm", 2)
        one_drain(svc, "warm")
        for it in range(5):
            for tag, fn in (("one", lambda: one_drain(svc, f"a{it}")),
                            ("two", lambda: split_drain(svc, f"b{it}", 2))):
                res.setdefault(tag, []).append(round(fn(), 3))
        svc.close()

    for k_, v in sorted(res.items()):
        w = sorted(v)
        rate = n_rows_expect / w[len(w) // 2] / 1e6
        print(f"{k_}: p50 {w[len(w) // 2]} min {w[0]} "
              f"(p50 {rate:.1f}M rows/s) {v}", flush=True)
    json.dump(res, open("/tmp/defer_overlap_ab_r15.json", "w"))
    print("DONE")
finally:
    try:
        os.remove("/tmp/arc_ab_busy")
    except OSError:
        pass
