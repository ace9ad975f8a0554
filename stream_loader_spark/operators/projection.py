"""Projection / row-transformation operators (SURVEY §2.2).

- P3 metadata projection: expose stream metadata as output columns
  (reference loaders/S3.scala:51-57, loaders/ClickHouse.scala:77-97).
- P4 record partitioning: assign each record a time-derived output
  partition (reference sink/batch/RecordPartitioner.scala:19-29; the
  canonical implementation maps the Kafka timestamp to a LocalDate,
  loaders/S3.scala:73). In Spark this is ``to_date`` + ``partitionBy`` —
  Hive-style paths then give partition pruning on read for free.
- P1 record formatting (1 raw record → 0..N typed rows) is
  ``from_json``/``from_avro`` + ``explode`` — see ``formatted_records``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_loader_spark.sources.kafka_view import kafka_metadata_columns


def with_metadata_projection(records: DataFrame, *payload_cols: str) -> DataFrame:
    """P3: _topic/_partition/_offset/_watermark + payload columns."""
    cols = kafka_metadata_columns()
    cols.extend(F.col(c) for c in payload_cols)
    return records.select(*cols)


def with_date_partition(
    records: DataFrame, ts_col: str = "ts", partition_col: str = "dt"
) -> DataFrame:
    """P4: event-date output-partition column (tumbling 1-day buckets)."""
    return records.withColumn(partition_col, F.to_date(F.col(ts_col)))


def formatted_records(records: DataFrame, schema: str, value_col: str = "props") -> DataFrame:
    """P1: parse the payload into typed columns (JSON flavor).

    ``schema`` is a DDL string, e.g. ``"k INT"``. Unparseable payloads
    yield NULL fields (permissive mode), matching the reference's
    formatter contract of 0..N output rows per input.
    """
    return records.withColumn("_parsed", F.from_json(F.col(value_col), schema)).select(
        "*", "_parsed.*"
    ).drop("_parsed")
