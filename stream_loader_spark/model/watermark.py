"""Watermark tracking with a future-timestamp clamp.

Mirrors the reference's ``MaxWatermarkProvider`` semantics
(source/WatermarkProvider.scala:50-77): the watermark is the max event
time observed, but events whose timestamp is further than
``valid_diff_ms`` in the future of the wall clock are REJECTED — they do
not advance the watermark (they are still delivered downstream; the
clamp only protects the watermark from corrupt future timestamps).
Default valid diff is 1 hour (KafkaSource.scala:191).

Spark's ``withWatermark`` tracks max-event-time engine-side but has no
future clamp, so the engine applies the clamp as a pre-filter expression
before ``withWatermark`` — see
:func:`stream_loader_spark.operators.watermark.clamped_watermark_agg`
for the batch/query form and
:func:`stream_loader_spark.streaming.pipeline.with_clamped_watermark`
for the streaming form. This class is the driver-side / property-test
model of those semantics.
"""

from __future__ import annotations

DEFAULT_VALID_WATERMARK_DIFF_MS = 3_600_000  # 1 hour


class MaxWatermarkTracker:
    """Per-partition max-event-time watermark with future clamp."""

    def __init__(
        self,
        valid_diff_ms: int = DEFAULT_VALID_WATERMARK_DIFF_MS,
        initial_ms: int = -1,
    ) -> None:
        self.valid_diff_ms = valid_diff_ms
        self.watermark_ms = initial_ms

    def observe(self, event_ms: int, now_ms: int) -> int:
        """Observe one event; returns the (possibly advanced) watermark.

        Events with ``event_ms > now_ms + valid_diff_ms`` are invalid and
        leave the watermark untouched.
        """
        if event_ms <= now_ms + self.valid_diff_ms and event_ms > self.watermark_ms:
            self.watermark_ms = event_ms
        return self.watermark_ms
