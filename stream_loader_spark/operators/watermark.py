"""Watermark operators (SURVEY §2.1 S5).

The reference's ``MaxWatermarkProvider`` advances a per-partition
watermark to the max event time seen, but REJECTS events whose
timestamp lies further than ``valid_diff`` in the future of the wall
clock (default 1h) — those events still flow downstream, they just
don't advance the watermark (source/WatermarkProvider.scala:50-77).

Spark's ``withWatermark`` has no such clamp, so we express it as a
filter in the watermark aggregation (batch/query form, below) and as a
pre-filter before ``withWatermark`` (streaming form, in
streaming/pipeline.py).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_VALID_DIFF = "INTERVAL 1 HOUR"


def valid_event_time(ts_col: Column, now: Column, valid_diff: str = DEFAULT_VALID_DIFF) -> Column:
    """Predicate: event time is not unreasonably far in the future."""
    return ts_col <= now + F.expr(valid_diff)


def clamped_watermark_agg(
    records: DataFrame,
    now: datetime,
    ts_col: str = "ts",
    topic_col: str = "topic",
    partition_col: str = "partition",
    valid_diff: str = DEFAULT_VALID_DIFF,
) -> DataFrame:
    """S5 (query form): per-partition watermark = max valid event time.

    ``now`` is passed explicitly (not ``current_timestamp()``) so the
    result is deterministic and oracle-checkable.
    """
    now_col = F.lit(now).cast("timestamp")
    return (
        records.where(valid_event_time(F.col(ts_col), now_col, valid_diff))
        .groupBy(topic_col, partition_col)
        .agg(F.max(ts_col).alias("watermark"))
    )
