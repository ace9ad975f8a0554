"""Rewind warm-up: re-consume a window of already-committed records to
warm caches/state without double-writing (SURVEY §2.5 D1).

The reference wraps a sinker so that, after a restart, consumption
begins N offsets (or T time) BEFORE the committed position; records
older than the committed offset are "touched" (fed to a warm-up
callback, e.g. a dedup cache) instead of written, and writing resumes
seamlessly at the boundary (RewindingPartitionGroupSinker.scala:45-118).

``RewindingSink`` is the foreachBatch form: it loads the inner sink's
committed positions once, classifies every batch row as replayed vs
new with one broadcast-joined filter, hands replayed rows to the
warm-up callback, and writes only new rows through the inner sink. The
rewound start itself is configured on the source (``startingOffsets`` /
``startingOffsetsByTimestamp``), computed with
:mod:`stream_loader_spark.model.interval`.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_loader_spark.model.interval import OffsetRange, WatermarkRange
from stream_loader_spark.model.position import StreamPosition


def rewound_starting_offsets(
    committed: dict[tuple[str, int], StreamPosition],
    interval: OffsetRange | WatermarkRange,
    all_partitions: dict[str, int] | None = None,
) -> dict[str, dict[str, int]]:
    """Kafka ``startingOffsets`` JSON structure for a rewound start.

    Offset intervals rewind by subtraction; watermark intervals return
    the target timestamps for ``startingOffsetsByTimestamp`` instead.

    ``all_partitions`` (topic → partition count) fills partitions that
    have NO committed position with -2 (Kafka's "earliest"): Spark's
    Kafka source asserts that a specific-offsets map covers EVERY
    TopicPartition of the subscription, so a partition added since the
    last commit — or one that never produced — would otherwise fail the
    stream at start. Callers that pass only ``committed`` keep the old
    behavior and must guarantee the map is complete.
    """
    out: dict[str, dict[str, int]] = {}
    for (topic, partition), pos in committed.items():
        if isinstance(interval, OffsetRange):
            val = interval.apply(pos).offset
        else:
            val = interval.target_watermark_ms(pos)
        out.setdefault(topic, {})[str(partition)] = val
    if all_partitions:
        # -2 = Kafka "earliest" for the offsets form; the timestamp form
        # uses 0 (offsetsForTimes(0) resolves to the earliest offset)
        filler = -2 if isinstance(interval, OffsetRange) else 0
        for topic, n in all_partitions.items():
            for partition in range(n):
                out.setdefault(topic, {}).setdefault(str(partition), filler)
    return out


class RewindingSink:
    """Wraps a sink: replayed rows warm up, new rows write."""

    def __init__(
        self,
        inner: Callable[[DataFrame, int], None],
        committed: dict[tuple[str, int], StreamPosition],
        warmup: Callable[[DataFrame], None] | None = None,
        topic_col: str = "topic",
        partition_col: str = "partition",
        offset_col: str = "offset",
    ) -> None:
        self.inner = inner
        self.warmup = warmup
        self.committed = committed
        self.cols = (topic_col, partition_col, offset_col)

    def _floor_df(self, spark):
        rows = [(t, p, pos.offset) for (t, p), pos in self.committed.items()]
        return spark.createDataFrame(
            rows, "_f_topic string, _f_partition int, _f_next_offset bigint"
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        t, p, o = self.cols
        if not self.committed:
            self.inner(batch_df, batch_id)
            return
        floors = self._floor_df(batch_df.sparkSession)
        joined = batch_df.join(
            F.broadcast(floors),
            (F.col(t) == F.col("_f_topic")) & (F.col(p) == F.col("_f_partition")),
            "left",
        ).withColumn(
            "_replayed",
            F.col("_f_next_offset").isNotNull() & (F.col(o) < F.col("_f_next_offset")),
        )
        joined = joined.persist()
        try:
            replayed = joined.where(F.col("_replayed"))
            new = joined.where(~F.col("_replayed"))
            drop_cols = ["_replayed", "_f_topic", "_f_partition", "_f_next_offset"]
            if self.warmup is not None:
                self.warmup(replayed.drop(*drop_cols))
            self.inner(new.drop(*drop_cols), batch_id)
        finally:
            # an exception mid-write must not leak the cached batch across
            # foreachBatch retries
            joined.unpersist()
