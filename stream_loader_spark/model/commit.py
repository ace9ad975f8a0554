"""File/batch commit strategies.

Models the reference's ``FileCommitStrategy.ReachedAnyOf`` — close a
file/batch when ANY of {open duration, size, record count} reaches its
threshold (sink/file/FileCommitStrategy.scala:39-55) — and the fuzzy
variant that jitters thresholds to de-synchronize commit storms across a
fleet (FileCommitStrategy.scala:63-112).

In the Spark engine these become trigger configuration: processing-time
trigger interval (duration), ``maxRecordsPerFile`` (count), and
AQE-coalesced partition sizing (size). The class is still useful
driver-side for custom ``foreachBatch`` sinks that roll their own files,
and as the verifiable model of the semantics.
"""

from __future__ import annotations

import random
from dataclasses import dataclass


@dataclass(frozen=True)
class ReachedAnyOf:
    """Commit when any configured threshold is reached."""

    max_open_duration_ms: int | None = None
    max_file_size: int | None = None
    max_record_count: int | None = None

    def __post_init__(self) -> None:
        if (
            self.max_open_duration_ms is None
            and self.max_file_size is None
            and self.max_record_count is None
        ):
            raise ValueError("at least one threshold must be set")

    def should_commit(self, open_ms: int, size: int, records: int) -> bool:
        return (
            (self.max_open_duration_ms is not None and open_ms >= self.max_open_duration_ms)
            or (self.max_file_size is not None and size >= self.max_file_size)
            or (self.max_record_count is not None and records >= self.max_record_count)
        )

    def to_trigger_options(self) -> dict[str, str]:
        """Spark writer/trigger options equivalent to this strategy."""
        opts: dict[str, str] = {}
        if self.max_open_duration_ms is not None:
            opts["trigger.processingTime"] = f"{self.max_open_duration_ms} milliseconds"
        if self.max_record_count is not None:
            opts["maxRecordsPerFile"] = str(self.max_record_count)
        return opts


@dataclass(frozen=True)
class FuzzyReachedAnyOf:
    """ReachedAnyOf with Gaussian-jittered thresholds.

    Each new file samples thresholds from N(mean, mean*spread); useful
    when many independent loader instances would otherwise commit in
    lockstep.
    """

    max_open_duration_ms: int | None = None
    max_file_size: int | None = None
    max_record_count: int | None = None
    spread: float = 0.1

    def __post_init__(self) -> None:
        # fail at CONSTRUCTION like ReachedAnyOf does — deferring to the
        # first sample() surfaces the misconfiguration mid-stream with
        # an error message naming the wrong class
        if (
            self.max_open_duration_ms is None
            and self.max_file_size is None
            and self.max_record_count is None
        ):
            raise ValueError("at least one threshold must be set")

    def sample(self, rng: random.Random) -> ReachedAnyOf:
        def jitter(mean: int | None) -> int | None:
            if mean is None:
                return None
            return max(1, int(rng.gauss(mean, mean * self.spread)))

        return ReachedAnyOf(
            max_open_duration_ms=jitter(self.max_open_duration_ms),
            max_file_size=jitter(self.max_file_size),
            max_record_count=jitter(self.max_record_count),
        )
