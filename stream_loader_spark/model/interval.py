"""Rewind intervals.

Mirrors the reference's ``StreamInterval`` (model/StreamInterval.scala:26-35):
a rewind expressed either as a fixed number of offsets or as an event-time
duration. In the Spark engine these translate to Kafka source options
(``startingOffsets`` / ``startingOffsetsByTimestamp``) or to position
arithmetic against a sink's committed positions.
"""

from __future__ import annotations

from dataclasses import dataclass

from stream_loader_spark.model.position import StreamPosition


@dataclass(frozen=True)
class OffsetRange:
    """Rewind by a fixed count of offsets."""

    offsets: int

    def apply(self, committed: StreamPosition) -> StreamPosition:
        return committed.moved_by(-self.offsets)


@dataclass(frozen=True)
class WatermarkRange:
    """Rewind by event-time duration (milliseconds).

    Resolving a watermark rewind to an offset requires a
    timestamp→offset lookup (Kafka ``offsetsForTimes``; Spark
    ``startingOffsetsByTimestamp``), so ``apply`` only computes the
    target watermark; the source resolves it.
    """

    duration_ms: int

    def target_watermark_ms(self, committed: StreamPosition) -> int:
        return max(0, committed.watermark_ms - self.duration_ms)
