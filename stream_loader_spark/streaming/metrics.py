"""Observability (SURVEY §2.10): streaming metrics via query listeners.

The reference exports Micrometer metrics — records-polled distribution,
watermark delay gauge, per-partition counters, commit timers
(StreamLoader.scala:43-44, KafkaSource.scala:157-163,
RecordBatchingSinker.scala:175-208). Spark surfaces the same facts in
``StreamingQueryProgress``; this listener normalizes them into a plain
metrics dict any registry (Prometheus client, StatsD, logs) can export.
"""

from __future__ import annotations

import json
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


def _flatten_offsets(offsets: object) -> dict[tuple[str, int], int]:
    """Kafka progress offset JSON (``{topic: {partition: offset}}``) →
    ``{(topic, partition): offset}``. Non-Kafka sources (file streams
    report ``{"logOffset": N}``) flatten to nothing."""
    out: dict[tuple[str, int], int] = {}
    if not isinstance(offsets, dict):
        return out
    for topic, parts in offsets.items():
        if not isinstance(parts, dict):
            continue
        for p, off in parts.items():
            try:
                out[(topic, int(p))] = int(off)
            except (TypeError, ValueError):
                continue
    return out


def _parse_json(text: object) -> object:
    if not isinstance(text, str):
        return None
    try:
        return json.loads(text)
    except ValueError:
        return None


class MetricsRegistry:
    """Minimal gauge registry: the seam a Prometheus/StatsD exporter
    plugs into. Mirrors the reference's Micrometer-registry shape
    (util/Metrics.scala): gauges keyed by (name, tags); removal
    re-registers a 0.0 constant because exporters like Prometheus
    cannot unregister (KafkaMetricsReporter.scala:70-79)."""

    def __init__(self) -> None:
        self._gauges: dict[tuple[str, tuple[tuple[str, str], ...]], float] = {}

    @staticmethod
    def _key(name: str, tags: dict[str, str] | None):
        return name, tuple(sorted((tags or {}).items()))

    def set_gauge(self, name: str, value: float, tags: dict[str, str] | None = None) -> None:
        self._gauges[self._key(name, tags)] = float(value)

    def remove_gauge(self, name: str, tags: dict[str, str] | None = None) -> None:
        key = self._key(name, tags)
        if key in self._gauges:
            self._gauges[key] = 0.0

    def snapshot(self) -> dict[str, float]:
        """name.by.<tagkeys>{tag=val,...} → value (flat export form)."""
        out: dict[str, float] = {}
        for (name, tags), v in self._gauges.items():
            label = name + ("{" + ",".join(f"{k}={val}" for k, val in tags) + "}" if tags else "")
            out[label] = v
        return out


class KafkaSourceMetricsBridge(StreamingQueryListener):
    """Kafka client-metrics bridge, Spark-native (SURVEY §2.10).

    The reference registers every Kafka consumer metric as a gauge,
    making names unique by appending tag keys (records-lag exists
    per-topic AND per-partition) and dropping the client-id tag
    (util/KafkaMetricsReporter.scala:38-62). Spark does not expose the
    consumer's raw metric registry, but ``StreamingQueryProgress``
    carries the same facts per source: ``metrics`` (min/max/avg
    offsets-behind-latest — the consumer-lag family) and the
    ``startOffset``/``endOffset``/``latestOffset`` JSON maps. This
    listener normalizes both into the registry under the reference's
    naming convention:

    - ``kafka.source.<metric>``            — source-level metrics map
    - ``kafka.source.records-consumed``    — numInputRows per progress
    - ``kafka.source.end-offset.by.partition.topic``  (tagged gauge)
    - ``kafka.source.records-lag.by.partition.topic`` (latest − end,
      the per-partition consumer lag the reference gets from
      ``records-lag`` — only when the source reports latestOffset)
    """

    def __init__(self, registry: MetricsRegistry | None = None) -> None:
        self.registry = registry or MetricsRegistry()
        self._seen_partitions: set[tuple[str, int]] = set()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        for src in event.progress.sources:
            self._bridge_source(src)

    def _bridge_source(self, src) -> None:
        reg = self.registry
        reg.set_gauge("kafka.source.records-consumed", src.numInputRows or 0)
        if src.inputRowsPerSecond is not None:
            reg.set_gauge("kafka.source.records-consumed-rate", src.inputRowsPerSecond)
        for name, value in (src.metrics or {}).items():
            try:
                reg.set_gauge(f"kafka.source.{name}", float(value))
            except (TypeError, ValueError):
                continue
        end = _flatten_offsets(_parse_json(src.endOffset))
        latest = _flatten_offsets(_parse_json(getattr(src, "latestOffset", None)))
        for (topic, partition), off in end.items():
            tags = {"topic": topic, "partition": str(partition)}
            reg.set_gauge("kafka.source.end-offset.by.partition.topic", off, tags)
            if (topic, partition) in latest:
                reg.set_gauge(
                    "kafka.source.records-lag.by.partition.topic",
                    max(latest[(topic, partition)] - off, 0),
                    tags,
                )
        # partitions that left the subscription (rebalance, topic
        # deletion) must stop exporting: a frozen last-value lag gauge
        # is a lie an alerting pipeline acts on (the reference's
        # KafkaMetricsReporter.scala:70-79 handles removal explicitly)
        current = set(end)
        for topic, partition in self._seen_partitions - current:
            tags = {"topic": topic, "partition": str(partition)}
            reg.remove_gauge("kafka.source.end-offset.by.partition.topic", tags)
            reg.remove_gauge("kafka.source.records-lag.by.partition.topic", tags)
        self._seen_partitions = current

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
