"""Per-executor rate limiting — the reference's guava RateLimiter analogue.

Reference: origin/target RateLimiters, one pair per executor, default 20k
permits/s (job/AbstractJobSession.java:58-62; acquired per row at
CopyJobSession.java:93,110).  There is no Cassandra to protect here, but the
same knob throttles pressure on shared storage (object-store request caps,
NFS throughput) — so it is wired as an optional per-actor token bucket in the
normalize stage: each Ray actor independently limits itself to the configured
rows/s, matching the reference's per-executor semantics (total throughput =
rate × concurrency).
"""

from __future__ import annotations

import threading
import time


class TokenBucket:
    """Simple thread-safe token bucket: ``acquire(n)`` blocks until n permits
    are available.  Permits accrue at ``rate`` per second up to ``burst``
    (default: one second's worth)."""

    def __init__(self, rate: float, burst: float | None = None):
        if rate <= 0:
            raise ValueError("rate must be > 0 rows/s")
        self.rate = float(rate)
        self.burst = float(burst) if burst is not None else float(rate)
        self._tokens = self.burst
        self._last = time.monotonic()
        self._lock = threading.Lock()

    def acquire(self, n: int = 1) -> float:
        """Take ``n`` permits, sleeping for any deficit; returns seconds
        slept.  Guava-style pay-forward semantics: the balance may go
        negative (the current call pays the debt), so ``n`` larger than the
        burst capacity — e.g. one big Arrow batch — still works instead of
        spinning forever waiting for a bucket that can never hold it."""
        with self._lock:
            now = time.monotonic()
            self._tokens = min(
                self.burst, self._tokens + (now - self._last) * self.rate
            )
            self._last = now
            self._tokens -= n
            deficit = -self._tokens
        if deficit > 0:
            wait = deficit / self.rate
            time.sleep(wait)
            return wait
        return 0.0
