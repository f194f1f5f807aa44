"""Retry/backoff fabric with transient-error classification (reference O30:
`pq/snapshot/helpers.go:44-162` retries chunk claims, `connector.go:446-559`
reconnects the replication loop with exponential backoff).

Spark already retries TASKS; this fabric covers the driver-side control
plane — slot polling, slot advance, heartbeat ticks, catalog queries —
where a dropped connection must mean "back off and retry", not "crash the
pipeline"."""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

# Substrings that mark an error as transient — connection-level failures and
# PostgreSQL's retryable SQLSTATE classes 08 (connection), 40001/40P01
# (serialization/deadlock), 57P03 (cannot connect now), 53 (resources).
TRANSIENT_MARKERS = (
    "connection refused",
    "connection reset",
    "connection timed out",
    "server closed the connection",
    "could not connect",
    "cannot connect now",
    "terminating connection",
    "serialization failure",
    "deadlock detected",
    "too many connections",
    "timeout expired",
    "temporarily unavailable",
    # slot held by the active instance — the reference's passive standby
    # keeps retrying until it captures the slot (pq/slot/slot.go takeover;
    # connector.go:446-559): backing off here makes the resilient
    # replication loop double as that wait-for-takeover loop.
    "is active for pid",
)


class FatalError(RuntimeError):
    """Raised when an error is classified non-retryable."""


def is_transient(exc: BaseException) -> bool:
    if isinstance(exc, (ConnectionError, TimeoutError, OSError)):
        return True
    msg = str(exc).lower()
    return any(m in msg for m in TRANSIENT_MARKERS)


@dataclass
class Backoff:
    """Exponential backoff with a cap (helpers.go:44-78 shape)."""

    base_delay_s: float = 0.1
    max_delay_s: float = 30.0
    factor: float = 2.0
    max_tries: int = 8

    def delays(self):
        d = self.base_delay_s
        for _ in range(self.max_tries - 1):
            yield min(d, self.max_delay_s)
            d *= self.factor


def with_backoff(
    fn: Callable,
    backoff: Backoff | None = None,
    classify: Callable[[BaseException], bool] = is_transient,
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, BaseException], None] | None = None,
):
    """Run `fn()`; retry transient failures with exponential backoff. A
    non-transient failure or retry exhaustion raises FatalError with the
    original exception chained."""
    backoff = backoff or Backoff()
    attempt = 0
    last: BaseException | None = None
    for delay in [*backoff.delays(), None]:
        attempt += 1
        try:
            return fn()
        except BaseException as exc:  # noqa: BLE001 — classified below
            last = exc
            if not classify(exc):
                raise FatalError(f"non-retryable: {exc}") from exc
            if delay is None:
                break
            if on_retry:
                on_retry(attempt, exc)
            sleep(delay)
    raise FatalError(f"retries exhausted after {attempt} attempts: {last}") from last
