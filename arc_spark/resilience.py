"""Resilience primitives (reference internal/throttle/throttle.go and
internal/circuitbreaker/circuitbreaker.go).

``Debouncer`` — an action proceeds at most once per interval, process-wide.
Semantics follow throttle.go:

- The window is anchored to the MONOTONIC clock (``time.monotonic`` since
  a construction-time origin), so a wall-clock step cannot fire the
  throttle early or wedge it.
- "Never fired" is an explicit sentinel and the FIRST call always
  proceeds — with a monotonic anchor the first elapsed values are tiny,
  so without the sentinel the first call would be throttled
  (throttle.go's package comment records the shipped bug).
- Non-positive intervals are clamped to a small floor rather than
  panicking (throttle.go minInterval).
- ``remaining()`` reports time until the next eligible acquire, for
  Retry-After headers; 0 when eligible now.

``CircuitBreaker`` — closed → open after ``max_failures`` consecutive
failures; open → half-open after ``timeout_s``; half-open admits at most
``half_open_max_requests`` probes and closes again after that many
successes, reopening on any probe failure (circuitbreaker.go Execute/
allowRequest/recordResult). ``CircuitOpenError`` maps to HTTP 503 at the
wire layer.
"""

from __future__ import annotations

import threading
import time


class CircuitOpenError(Exception):
    """Raised when the breaker is open (circuitbreaker.go ErrCircuitOpen)."""


class TooManyProbesError(CircuitOpenError):
    """Raised when half-open probe quota is exhausted
    (circuitbreaker.go ErrTooManyRequests)."""


_MIN_INTERVAL_S = 0.001


class Debouncer:
    """At most one acquire per interval; thread-safe; first call wins."""

    def __init__(self, interval_s: float):
        self.interval_s = max(float(interval_s), _MIN_INTERVAL_S)
        self._origin = time.monotonic()
        self._last: float | None = None  # None = never fired (load-bearing)
        self._lock = threading.Lock()

    def try_acquire(self) -> bool:
        now = time.monotonic() - self._origin
        with self._lock:
            if self._last is not None and now - self._last < self.interval_s:
                return False
            self._last = now
            return True

    def remaining(self) -> float:
        with self._lock:
            last = self._last
        if last is None:
            return 0.0
        elapsed = (time.monotonic() - self._origin) - last
        return max(0.0, self.interval_s - elapsed)


CLOSED, OPEN, HALF_OPEN = "closed", "open", "half-open"


class CircuitBreaker:
    def __init__(self, name: str = "default", max_failures: int = 5,
                 timeout_s: float = 30.0, half_open_max_requests: int = 3,
                 on_state_change=None):
        self.name = name
        self.max_failures = max_failures
        self.timeout_s = timeout_s
        self.half_open_max_requests = half_open_max_requests
        self.on_state_change = on_state_change
        self._lock = threading.Lock()
        self._state = CLOSED
        self._failures = 0
        self._successes = 0
        self._last_failure_at = 0.0  # monotonic
        self._half_open_inflight = 0
        # lifetime counters for /metrics
        self.total_requests = 0
        self.total_rejected = 0
        self.total_failures = 0

    # -- state machine --------------------------------------------------
    def _transition(self, to: str) -> None:
        frm, self._state = self._state, to
        if frm != to and self.on_state_change is not None:
            self.on_state_change(self.name, frm, to)

    @property
    def state(self) -> str:
        with self._lock:
            self._maybe_half_open()
            return self._state

    def _maybe_half_open(self) -> None:
        if (self._state == OPEN
                and time.monotonic() - self._last_failure_at > self.timeout_s):
            self._transition(HALF_OPEN)
            self._successes = 0
            self._half_open_inflight = 0

    def allow(self) -> None:
        """Raises unless a request may proceed; reserves a half-open slot."""
        with self._lock:
            self.total_requests += 1
            self._maybe_half_open()
            if self._state == CLOSED:
                return
            if self._state == OPEN:
                self.total_rejected += 1
                raise CircuitOpenError(
                    f"circuit breaker '{self.name}' is open; retry in "
                    f"{self.remaining():.1f}s")
            # half-open: bounded probes
            if self._half_open_inflight >= self.half_open_max_requests:
                self.total_rejected += 1
                raise TooManyProbesError(
                    f"circuit breaker '{self.name}' half-open probe quota "
                    "exhausted")
            self._half_open_inflight += 1

    def record(self, ok: bool) -> None:
        with self._lock:
            if ok:
                if self._state == HALF_OPEN:
                    self._successes += 1
                    if self._successes >= self.half_open_max_requests:
                        self._transition(CLOSED)
                        self._failures = 0
                else:
                    self._failures = 0
                return
            self.total_failures += 1
            self._last_failure_at = time.monotonic()
            if self._state == HALF_OPEN:
                # any probe failure reopens immediately
                self._transition(OPEN)
                return
            self._failures += 1
            if self._failures >= self.max_failures:
                self._transition(OPEN)

    def record_neutral(self) -> None:
        """Release a half-open probe slot without counting toward
        successes OR failures. For USER errors (bad SQL, RBAC denial,
        rate limit): the engine was never exercised, so the outcome says
        nothing about its health — a few 400s from one client must not
        close the circuit while the engine is still down, nor reset the
        consecutive-failure count while closed."""
        with self._lock:
            if self._state == HALF_OPEN and self._half_open_inflight > 0:
                self._half_open_inflight -= 1

    # -- public API -----------------------------------------------------
    def execute(self, fn):
        """Run ``fn`` under breaker protection. The breaker observes the
        outcome; the function's exception propagates to the caller."""
        self.allow()
        try:
            result = fn()
        except Exception:
            self.record(False)
            raise
        self.record(True)
        return result

    def remaining(self) -> float:
        """Seconds until an open breaker would admit a probe."""
        elapsed = time.monotonic() - self._last_failure_at
        return max(0.0, self.timeout_s - elapsed)

    def stats(self) -> dict:
        with self._lock:
            self._maybe_half_open()
            return {
                "name": self.name,
                "state": self._state,
                "consecutive_failures": self._failures,
                "total_requests": self.total_requests,
                "total_rejected": self.total_rejected,
                "total_failures": self.total_failures,
            }
