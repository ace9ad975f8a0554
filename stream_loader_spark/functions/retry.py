"""Retry with exponential backoff for driver-side storage calls.

Spark retries tasks and stages on its own; what still needs a retry
wrapper is driver-side storage I/O in foreachBatch sinks (manifest
writes, JDBC commits, catalog calls). Semantics follow the reference's
policy object (util/Retry.scala:30-109 — bounded retries, exponential
backoff, interrupt-aware) with defaults matching
RecordBatchingSink.builder(): 5 retries, 1s initial delay, ×3 backoff.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, TypeVar

T = TypeVar("T")


@dataclass(frozen=True)
class RetryPolicy:
    retries: int = 5
    initial_delay_sec: float = 1.0
    backoff_factor: float = 3.0

    def delays(self) -> list[float]:
        return [self.initial_delay_sec * self.backoff_factor**i for i in range(self.retries)]

    def run(
        self,
        fn: Callable[[], T],
        on_retry: Callable[[int, BaseException], None] | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ) -> T:
        """Run ``fn``; on failure retry up to ``retries`` times with
        exponential backoff. KeyboardInterrupt is never swallowed."""
        last: BaseException | None = None
        for attempt, delay in enumerate([0.0] + self.delays()):
            if delay:
                sleep(delay)
            try:
                return fn()
            except KeyboardInterrupt:
                raise
            except Exception as e:  # noqa: BLE001
                last = e
                if on_retry is not None:
                    on_retry(attempt, e)
        assert last is not None
        raise last
