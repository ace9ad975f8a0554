"""Kafka-shaped stream-record view over the ``events`` fixture table.

The reference's unit of work is a ``StreamRecord`` — a Kafka consumer
record plus watermark (model/StreamRecord.scala:20-22) with columns
(topic, partition, offset, timestamp, key, value). The driver's
``events`` parquet table (event_id, ts, user_id, event_type, value,
props) stands in for the topic; this module defines the ONE canonical
mapping used by both the Spark operators and the DuckDB oracle SQL:

    topic     = event_type
    partition = int(user_id % NUM_PARTITIONS)
    offset    = event_id          (globally increasing → per-partition increasing)
    ts        = ts                (event time)
    value     = props             (payload)

In production the same downstream operators run on the real Kafka
source: ``spark.readStream.format("kafka")`` exposes identical columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

NUM_PARTITIONS = 8

# Canonical SQL fragment for the DuckDB oracle ("offset" is a reserved
# word in DuckDB, so it is always quoted).
KAFKA_VIEW_SQL = (
    "SELECT event_type AS topic, "
    f"CAST(user_id % {NUM_PARTITIONS} AS INT) AS partition, "
    'event_id AS "offset", ts, value, props '
    "FROM events"
)


def event_ts_col(events: DataFrame, ts_col: str = "ts") -> Column:
    """Event-time column of the events fixture as a proper timestamp.

    The fixture stores nanosecond timestamps, which Spark surfaces as
    raw longs (``spark.sql.legacy.parquet.nanosAsLong``); they are
    truncated to microseconds here, matching DuckDB's nanos→micros read.
    The one place this conversion lives — every events consumer uses it.
    """
    dtype = dict(events.dtypes).get(ts_col)
    if dtype == "bigint":
        return F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    if dtype == "timestamp_ntz":
        # Tz-less reads (Spark 4.1 NTZ inference) normalize to LTZ; the
        # cast must name "timestamp_ltz" explicitly — plain "timestamp"
        # re-resolves to NTZ when spark.sql.timestampType=TIMESTAMP_NTZ.
        return F.col(ts_col).cast("timestamp_ltz")
    return F.col(ts_col)


def as_stream_records(events: DataFrame) -> DataFrame:
    """events fixture → (topic, partition, offset, ts, value, props)."""
    ts = event_ts_col(events)
    return events.select(
        F.col("event_type").alias("topic"),
        (F.col("user_id") % NUM_PARTITIONS).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        ts.alias("ts"),
        F.col("value"),
        F.col("props"),
    )


def kafka_metadata_columns() -> list[Column]:
    """The metadata projection every loader exposes (reference
    loaders/ClickHouse.scala:77-97 projects _topic/_partition/_offset/_watermark)."""
    return [
        F.col("topic").alias("_topic"),
        F.col("partition").alias("_partition"),
        F.col("offset").alias("_offset"),
        F.col("ts").alias("_watermark"),
    ]
