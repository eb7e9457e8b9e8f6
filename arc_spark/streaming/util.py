"""Streaming query lifecycle helpers.

The one non-obvious piece: draining an ``availableNow`` query that uses
a stateful operator with ``ProcessingTimeTimeout`` (e.g.
:func:`arc_spark.streaming.sessionize.sessionize_stream`). Spark never
self-terminates such a query — while any group holds an unexpired
timeout, the micro-batch engine spins "No new data but cleaning up
state" batches forever (observed: batch 214 after two minutes on a
4-row input), so ``awaitTermination(t)`` always waits out its full
timeout and ``processAllAvailable()`` parks indefinitely.
:func:`drain_available` is the supported drain-and-stop pattern.
"""

from __future__ import annotations

import time


def drain_available(query, deadline_s: float = 300.0,
                    poll_s: float = 0.2) -> bool:
    """Wait until an ``availableNow`` streaming query has processed all
    real input, then stop it. Returns True if the drain condition was
    observed, False if the deadline expired first (the query is stopped
    either way).

    The drain condition is TWO committed zero-input progress reports
    with distinct batch ids (and no data available at observation time)
    since the last data-carrying batch. One zero-input report is not
    enough: on a checkpoint restart Spark REPLAYS the last committed
    (possibly no-data) batch, and both ``isDataAvailable`` and
    ``lastProgress`` can lag its commit under load — a single-report
    check raced that window and stopped before the new data's batch ran.
    Two distinct zero-input commits cannot precede the data batch:
    availableNow latches the source offsets at query start, so the first
    batch planned after the replay IS the pending data batch.

    Open stateful groups (e.g. sessions that have not crossed their gap)
    stay in the checkpointed state store for the next run — that is the
    correct drain semantics for incremental batch-over-stream usage, and
    it is exactly what a continuous deployment would hold in memory.

    Caveat for external callers (r11 advice): ANY clean termination
    counts as drained — including a ``stop()`` issued by another thread
    mid-drain, which this function cannot distinguish from a stateless
    query self-finishing after its last data batch. If your code stops
    queries it has handed to ``drain_available``, treat a True return
    as "terminated without error", not "all input processed".
    """
    deadline = time.monotonic() + deadline_s
    drained = False
    zero_batches: set = set()
    try:
        while time.monotonic() < deadline:
            if not query.isActive:
                # failed (or externally stopped) query: surface the real
                # error instead of spinning out the deadline and
                # returning a bare False (r10 review) — awaitTermination
                # re-raises the StreamingQueryException if one exists.
                # If it returns without raising, the run ended cleanly;
                # count that as drained regardless of the final report's
                # numInputRows: a stateless availableNow query can
                # self-finish on a data-carrying batch with no trailing
                # no-data report, and requiring one here failed such
                # fully-successful drains (r10 advice). The residual
                # ambiguity — an external stop() racing the drain — is
                # accepted: nothing in this codebase stops a query it
                # handed to drain_available.
                query.awaitTermination(1)
                drained = True
                break
            available = query.status["isDataAvailable"]
            lp = query.lastProgress
            if lp is not None:
                if lp["numInputRows"] == 0:
                    zero_batches.add(lp["batchId"])
                else:
                    zero_batches.clear()  # data batch: restart the count
            if len(zero_batches) >= 2 and not available:
                drained = True
                break
            time.sleep(poll_s)
    finally:
        query.stop()
    return drained
