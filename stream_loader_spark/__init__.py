"""stream_loader_spark — a PySpark-native stream-loading / analytics engine.

A from-scratch rebuild of the capabilities of adform/stream-loader
(reference: /root/reference, MPL-2.0) on top of Apache Spark:

- Structured Streaming replaces the hand-rolled Kafka poll loop
  (reference StreamLoader.scala:80-93).
- Exactly-once delivery comes from checkpointing + idempotent sinks
  (deterministic file names, dedup tokens, offsets-in-target), replacing
  the reference's two-phase-commit storages (TwoPhaseCommitBatchStorage.scala).
- The relational query surface (recovery aggregations, time partitioning,
  watermark clamping) is expressed as plain DataFrame transforms so
  Catalyst optimizes them.
- Beyond the reference: large-scale training-data pipeline operators
  (dedup, similarity search, multimodal columns, text analysis).
"""

from stream_loader_spark.model.position import StreamPosition
from stream_loader_spark.model.range import StreamRange, StreamRangeBuilder, merge_ranges
from stream_loader_spark.model.interval import OffsetRange, WatermarkRange

__all__ = [
    "StreamPosition",
    "StreamRange",
    "StreamRangeBuilder",
    "merge_ranges",
    "OffsetRange",
    "WatermarkRange",
]

__version__ = "0.1.0"
