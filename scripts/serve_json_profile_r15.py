"""r15 item 5 (VERDICT r14): profile the typed-JSON fastscan encoder.

serve_json_fastscan = catalog.scan_arrow (native pyarrow scan of the
committed events measurement) + stream_typed_json. The r14 profile put
the encoder at a 26.7 ms JVM-free floor on the 100k-row events table.
This decomposes: scan alone, encoder alone (serial + the slice-parallel
path the bench actually takes), per-column token cost, and the row/chunk
join. No Spark needed — everything is pyarrow + driver Python.

Writes /tmp/serve_json_profile_r15.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

while os.path.exists("/tmp/arc_hunter_firing"):
    time.sleep(30)
open("/tmp/arc_ab_busy", "w").close()

try:
    import pyarrow.parquet as pq  # noqa: E402

    from arc_spark.serving import (_json_token_array,  # noqa: E402
                                   _typed_json_chunks_vectorized,
                                   stream_typed_json)

    table = pq.read_table("/root/testdata/sf0.1/events.parquet")
    print("events:", table.num_rows, "rows,", table.schema)

    def p50(fn, n=9):
        xs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            xs.append(time.perf_counter() - t0)
        xs.sort()
        return round(xs[len(xs) // 2] * 1000, 2), round(xs[0] * 1000, 2)

    res = {}
    # full pipeline as the bench lane consumes it (parallel path: >=49k rows)
    res["stream_full"] = p50(
        lambda: sum(len(c) for c in stream_typed_json(table)))
    # serial encoder
    res["encode_serial"] = p50(
        lambda: _typed_json_chunks_vectorized(table, 1000))
    # per-column token cost
    for i, f in enumerate(table.schema):
        col = table.column(i)
        res[f"token:{f.name}:{f.type}"] = p50(
            lambda c=col: _json_token_array(c))
    # flush_rows sensitivity (wire contract is 1000-row chunks; check the
    # chunk-join share)
    for fr in (1000, 10000, 100000):
        res[f"encode_serial_fr{fr}"] = p50(
            lambda fr=fr: _typed_json_chunks_vectorized(table, fr))

    for k, v in res.items():
        print(f"{k}: p50 {v[0]} ms, min {v[1]} ms", flush=True)
    json.dump(res, open("/tmp/serve_json_profile_r15.json", "w"))
    print("DONE")
finally:
    try:
        os.remove("/tmp/arc_ab_busy")
    except OSError:
        pass
