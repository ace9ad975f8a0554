"""Observability (SURVEY §2.10): streaming metrics via query listeners.

The reference exports Micrometer metrics — records-polled distribution,
watermark delay gauge, per-partition counters, commit timers
(StreamLoader.scala:43-44, KafkaSource.scala:157-163,
RecordBatchingSinker.scala:175-208). Spark surfaces the same facts in
``StreamingQueryProgress``; this listener normalizes them into a plain
metrics dict any registry (Prometheus client, StatsD, logs) can export.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressMetrics:
    batches_completed: int = 0
    records_total: int = 0
    last_input_rows_per_sec: float = 0.0
    last_process_rows_per_sec: float = 0.0
    last_batch_duration_ms: int = 0
    last_watermark_delay_ms: int | None = None
    per_query: dict = field(default_factory=dict)


class MetricsListener(StreamingQueryListener):
    """Collects per-query throughput and watermark-delay metrics."""

    def __init__(self) -> None:
        self.metrics = ProgressMetrics()

    # StreamingQueryListener interface -------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        m = self.metrics
        m.batches_completed += 1
        m.records_total += p.numInputRows
        m.last_input_rows_per_sec = p.inputRowsPerSecond or 0.0
        m.last_process_rows_per_sec = p.processedRowsPerSecond or 0.0
        m.last_batch_duration_ms = p.batchDuration
        watermark = (p.eventTime or {}).get("watermark")
        # Spark reports the epoch as a placeholder until the first real
        # watermark; treating it as real would gauge a ~56-year delay
        if watermark and not watermark.startswith("1970-01-01T00:00:00"):
            wm = datetime.fromisoformat(watermark.replace("Z", "+00:00"))
            now = datetime.now(timezone.utc)
            m.last_watermark_delay_ms = int((now - wm).total_seconds() * 1000)
        m.per_query[str(p.id)] = {
            "numInputRows": p.numInputRows,
            "batchId": p.batchId,
        }

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
