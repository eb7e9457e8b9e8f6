"""r15 item 3 (VERDICT r14): phase-profile the deferred-msgpack
sustained window (13.7 M rec/s driver e2e vs arc's 20.9 M; SCALING r13
attributes the gap to flush-phase alignment).

Reproduces bench.py's _sustained_window(defer=True) exactly (8 writer
threads, 3 s, 5M buffer rows, 2.0 s age, 2 flush workers) while
instrumenting: each flush body's phases (snapshot, staging write, Spark
drain job, in-process decode, parquet write, WAL truncate), gaps where
no flush body runs, and the final drain's wall share. Prints a timeline.

Writes /tmp/defer_drain_profile_r15.json.
"""
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

while os.path.exists("/tmp/arc_hunter_firing"):
    time.sleep(30)
open("/tmp/arc_ab_busy", "w").close()

try:
    from arc_spark.api import IngestService  # noqa: E402
    from arc_spark.session import get_spark  # noqa: E402
    from arc_spark.sources.msgpack_codec import packb  # noqa: E402

    spark = get_spark()

    # EXACT copies of bench.py's sustained payloads
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
    print("payload bytes:", [len(p) for p in sus_payloads[:2]])

    EVENTS = []  # (t_rel, name, dur, extra)
    T0 = [0.0]

    def ev(name, t_start, extra=None):
        EVENTS.append((round(t_start - T0[0], 3), name,
                       round(time.perf_counter() - t_start, 3), extra))

    orig_drain = IngestService._drain_raw_distributed
    orig_decode = IngestService._decode_raw_batches
    orig_write = IngestService._write_buffers

    def timed_drain(self, db, entries):
        t0 = time.perf_counter()
        nbytes = sum(len(p) for _, p in entries)
        rows = orig_drain(self, db, entries)
        ev("dist_drain", t0, {"bytes": nbytes, "rows": rows,
                              "payloads": len(entries)})
        return rows

    def timed_decode(self, raw):
        t0 = time.perf_counter()
        out = orig_decode(self, raw)
        ev("inproc_decode", t0, {"payloads": len(raw)})
        return out

    def timed_write(self, buffers):
        t0 = time.perf_counter()
        total = orig_write(self, buffers)
        ev("parquet_write", t0, {"rows": total})
        return total

    IngestService._drain_raw_distributed = timed_drain
    IngestService._decode_raw_batches = timed_decode
    IngestService._write_buffers = timed_write

    def window(secs=3.0):
        EVENTS.clear()
        with tempfile.TemporaryDirectory() as td:
            svc = IngestService(spark, td, max_buffer_rows=5_000_000,
                                max_buffer_age_s=2.0, flush_workers=2,
                                defer_decode=True)
            stop_at = time.perf_counter() + secs
            counts = [0] * 8

            def _writer(k):
                i = 0
                while time.perf_counter() < stop_at:
                    svc.write_msgpack("bench", sus_payloads[(k + i) % 8])
                    counts[k] += sus_n
                    i += 1

            threads = [threading.Thread(target=_writer, args=(k,))
                       for k in range(8)]
            t0 = time.perf_counter()
            T0[0] = t0
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            acked = sum(counts)
            ack_wall = time.perf_counter() - t0
            td0 = time.perf_counter()
            svc.drain()
            drain_wall = time.perf_counter() - td0
            e2e_wall = time.perf_counter() - t0
            svc.close()
        return acked, ack_wall, drain_wall, e2e_wall

    # warm the distributed path (same 200-payload warmup as bench.py)
    with tempfile.TemporaryDirectory() as td:
        svc = IngestService(spark, td, max_buffer_rows=10**9,
                            max_buffer_age_s=10**9, defer_decode=True)
        svc.max_pending_raw_bytes = 1 << 30
        svc.distributed_flush_min_bytes = 1 << 10
        for j in range(200):
            svc.write_msgpack("bench", sus_payloads[j % 8])
        svc.flush()
        svc.close()

    out = {"windows": [], "events": []}
    for w in range(3):
        acked, ack_wall, drain_wall, e2e_wall = window()
        res = {"acked": acked,
               "ack_rate_M": round(acked / ack_wall / 1e6, 2),
               "e2e_rate_M": round(acked / e2e_wall / 1e6, 2),
               "ack_wall": round(ack_wall, 3),
               "final_drain_wall": round(drain_wall, 3),
               "e2e_wall": round(e2e_wall, 3)}
        print(f"window {w}: {res}", flush=True)
        for e in EVENTS:
            print("   ", e, flush=True)
        out["windows"].append(res)
        out["events"].append(list(EVENTS))

    json.dump(out, open("/tmp/defer_drain_profile_r15.json", "w"))
    print("DONE")
finally:
    IngestService._drain_raw_distributed = orig_drain
    IngestService._decode_raw_batches = orig_decode
    IngestService._write_buffers = orig_write
    try:
        os.remove("/tmp/arc_ab_busy")
    except OSError:
        pass
