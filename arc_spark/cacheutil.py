"""Cache-lifetime plumbing for operators with internal persist() calls.

Several operators persist an intermediate relation that feeds multiple
branches of the returned plan (DSIR's doc×bucket counts, the jaccard
capped posting list). The cache must stay hot while the caller can still
trigger those branches, but a long-lived session that calls the operator
repeatedly must not accumulate dead cached partitions (r8 advice).
``release_on_drop`` ties the cache's lifetime to the RETURNED frame: the
finalizer unpersists the internals exactly when the caller drops its
last reference to the result.
"""

from __future__ import annotations

import weakref


def _unpersist_quiet(*dfs) -> None:
    """Best-effort unpersist for finalizer use — the JVM/session may
    already be gone at interpreter shutdown."""
    for df in dfs:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass


def release_on_drop(result, *cached) -> None:
    """Unpersist each frame in ``cached`` when ``result`` is
    garbage-collected."""
    weakref.finalize(result, _unpersist_quiet, *cached)
