#!/usr/bin/env python
"""Same-session alternating checkout A/B of the NON-DEFERRED sustained
msgpack ingest lane (VERDICT r13 "what's wrong" #1).

Context: all eight r13 bench runs read this one lane's best window at
6.2-8.2 M rec/s while every r12 sentinel-valid run read 8.4-10.4M —
and the defer + LP lanes HELD, so host steal alone didn't cleanly
explain it. The r13 code diff on this lane's call graph
(write_msgpack -> maybe_decompress -> msgpack_codec/_cwalk -> WAL ->
buffer) is EMPTY except the cold `except ZstdError:` branch of
maybe_decompress, which plain msgpack payloads never enter — so the
hypothesis under test is "box attribution", and the methodology is the
one the repo already uses for perf claims: ALTERNATING measurements
inside one session so both variants see the same box state.

Design: pairs of subprocesses, one per checkout (r12 tree vs current
tree), order ALTERNATING each round (ABBA ABBA ...) so slow drifts
cancel; each subprocess builds the tree's own tuned session
(arc_spark.session.get_spark), runs one discarded 2 s ramp window then
`windows` measured 3 s sync windows of the exact bench payload shape,
and prints per-window (ack, e2e) rates. The parent brackets every
subprocess with a 32-thread mini-sentinel probe (same shape as
bench.py's) so the box state during each sample is on the record.

Usage:
    python scripts/ingest_ab_checkouts.py <r12_tree> [pairs] [windows]
Writes a JSON artifact to stdout (one line) and a readable table to
stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_CHILD = r"""
import json, sys, tempfile, time, threading
sys.path.insert(0, sys.argv[1])
from arc_spark.session import get_spark
from arc_spark.sources.msgpack_codec import packb
from arc_spark.api import IngestService

spark = get_spark(cpus=32, shuffle_partitions=32)
windows = int(sys.argv[2])

sus_n = 10_000
payloads = [packb({
    "m": "cpu",
    "columns": {
        "time": [1700000000000000 + (j * sus_n + i) * 1000
                 for i in range(sus_n)],
        "host": [f"h{i % 64}" for i in range(sus_n)],
        "value": [float(i % 997) for i in range(sus_n)],
    },
    "tags": ["host"],
}) for j in range(8)]


def window(secs):
    with tempfile.TemporaryDirectory() as td:
        svc = IngestService(spark, td, max_buffer_rows=5_000_000,
                            max_buffer_age_s=2.0, flush_workers=2,
                            defer_decode=False)
        stop_at = time.perf_counter() + secs
        counts = [0] * 8

        def _writer(k):
            i = 0
            while time.perf_counter() < stop_at:
                svc.write_msgpack("bench", payloads[(k + i) % 8])
                counts[k] += sus_n
                i += 1

        threads = [threading.Thread(target=_writer, args=(k,))
                   for k in range(8)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        acked = sum(counts)
        ack_wall = time.perf_counter() - t0
        svc.drain()
        e2e_wall = time.perf_counter() - t0
        svc.close()
    return acked / ack_wall, acked / e2e_wall


window(2.0)  # discarded ramp (flush workers + JIT + first Spark jobs)
out = [window(3.0) for _ in range(windows)]
print(json.dumps(out))
"""


def _mini_sentinel() -> float:
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    buf = b"\x00" * (1024 * 1024)

    def work() -> None:
        h = hashlib.sha256()
        for _ in range(16):
            h.update(buf)

    with ThreadPoolExecutor(max_workers=32) as pool:
        t0 = time.perf_counter()
        for f in [pool.submit(work) for _ in range(32)]:
            f.result()
        return time.perf_counter() - t0


def _run_child(tree: str, windows: int) -> list[list[float]]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, tree, str(windows)],
        capture_output=True, text=True, env=env, cwd=tree, timeout=600)
    if p.returncode != 0:
        raise RuntimeError(f"child in {tree} failed:\n{p.stderr[-2000:]}")
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    r12_tree = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r12_tree"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    windows = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cur_tree = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    runs: list[dict] = []
    for rnd in range(pairs):
        order = (("r12", r12_tree), ("r13", cur_tree))
        if rnd % 2:
            order = order[::-1]
        for label, tree in order:
            s0 = _mini_sentinel()
            t0 = time.time()
            wins = _run_child(tree, windows)
            s1 = _mini_sentinel()
            rec = {"round": rnd, "variant": label,
                   "sentinel": [round(s0, 3), round(s1, 3)],
                   "wall_s": round(time.time() - t0, 1),
                   "ack_M": [round(a / 1e6, 2) for a, _ in wins],
                   "e2e_M": [round(e / 1e6, 2) for _, e in wins]}
            runs.append(rec)
            print(f"  round {rnd} {label}: ack {rec['ack_M']} "
                  f"e2e {rec['e2e_M']} sentinel {rec['sentinel']}",
                  file=sys.stderr, flush=True)

    def best(label: str, key: str) -> float:
        return max(max(r[key]) for r in runs if r["variant"] == label)

    def med(label: str, key: str) -> float:
        vals = sorted(v for r in runs if r["variant"] == label
                      for v in r[key])
        return vals[len(vals) // 2]

    summary = {
        "lane": "ingest_msgpack_sustained_sync",
        "pairs": pairs, "windows_per_child": windows,
        "r12": {"best_ack_M": best("r12", "ack_M"),
                "med_ack_M": med("r12", "ack_M"),
                "best_e2e_M": best("r12", "e2e_M")},
        "r13": {"best_ack_M": best("r13", "ack_M"),
                "med_ack_M": med("r13", "ack_M"),
                "best_e2e_M": best("r13", "e2e_M")},
        "sentinels": [s for r in runs for s in r["sentinel"]],
        "runs": runs,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
