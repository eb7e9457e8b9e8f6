"""Cache-lifetime plumbing for operators with internal persist() calls.

Several operators persist an intermediate relation that feeds multiple
branches of the returned LAZY plan (DSIR's doc×bucket counts, the
jaccard capped posting list). Two lifetime constraints collide:

- the cache must stay hot until the caller EXECUTES the returned plan —
  which may be long after the operator returned, through arbitrarily
  many further compositions (``pack_token_shards(df).groupBy(...)
  .count()``), so nothing tied to Python object reachability works: the
  intermediate frame's wrapper dies at composition time while the JVM
  plan lives on (r9: a weakref-finalize design silently unpersisted
  q51's window cache before the action ran — caught by the plan-shape
  suite);
- a long-lived session calling operators repeatedly must not accumulate
  dead cached partitions forever (the r8 advisory).

Resolution: a process-wide BOUNDED FIFO registry. Every operator-
internal cache registers here; beyond ``ARC_SPARK_OPERATOR_CACHES``
(default 8) the oldest registrant is unpersisted. Eviction is always
SAFE — Spark recomputes an unpersisted relation — it only costs time if
an old pipeline is re-executed later, and any workload touching more
than 8 operator pipelines concurrently can raise the knob. Spark's own
LRU storage eviction still governs memory within the window.
"""

from __future__ import annotations

import os
import threading
from collections import deque

_MAX = int(os.environ.get("ARC_SPARK_OPERATOR_CACHES", "8"))
_lock = threading.Lock()
_ring: "deque" = deque()


def _unpersist_quiet(*dfs) -> None:
    """Best-effort unpersist — the JVM/session may already be gone."""
    for df in dfs:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass


def register_cache(*cached) -> None:
    """Track operator-internal persisted frames; unpersist the oldest
    once more than ``ARC_SPARK_OPERATOR_CACHES`` are live."""
    evicted = []
    with _lock:
        for df in cached:
            _ring.append(df)
        while len(_ring) > _MAX:
            evicted.append(_ring.popleft())
    if evicted:
        # eviction is SAFE (Spark recomputes) but silently voids the
        # optimizer-barrier perf wins a still-pending >8-operator pipeline
        # depends on (e.g. the 13s->1.5s ngram posting case) — say so, so
        # such pipelines discover they need to raise the knob (r9 advice)
        import logging

        logging.getLogger(__name__).info(
            "cacheutil: evicted %d operator cache(s) beyond "
            "ARC_SPARK_OPERATOR_CACHES=%d; a pipeline composing more than "
            "%d cache-backed operators before its action should raise the "
            "env knob or its persisted barriers will recompute",
            len(evicted), _MAX, _MAX)
    _unpersist_quiet(*evicted)


def clear_registry() -> None:
    """Unpersist every tracked cache (tests, session teardown)."""
    with _lock:
        dfs = list(_ring)
        _ring.clear()
    _unpersist_quiet(*dfs)


def release_on_drop(result, *cached) -> None:
    """Deprecated alias from the first r9 design — the GC-tied release
    broke composed pipelines (see module docstring). Registers the
    caches in the bounded ring instead; ``result`` is ignored."""
    register_cache(*cached)
