"""Idempotence-key operators (SURVEY §2.5 D2, D3) — distributed form.

Query-expressible versions of the driver-side helpers in
model/idempotence.py: given a record set, compute per-partition ranges
and derive (a) the insert dedup token and (b) the deterministic output
file name. Both are pure column expressions over the A4 range
aggregation, so they run as one hash-aggregate + projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_loader_spark.operators.recovery import stream_ranges


def range_string_col(
    topic: Column, partition: Column, start_offset: Column, end_offset: Column
) -> Column:
    """``topic:partition:start:end`` — canonical range serialization
    (same shape as the reference's ClickHouse dedup token,
    clickhouse/ClickHouseFileStorage.scala:86-88)."""
    return F.concat_ws(
        ":",
        topic,
        partition.cast("string"),
        start_offset.cast("string"),
        end_offset.cast("string"),
    )


def dedup_tokens(records: DataFrame) -> DataFrame:
    """D2: one row per (topic, partition) with its range token, plus the
    batch-level token (sorted ';'-join of all partition tokens)."""
    ranges = stream_ranges(records)
    with_token = ranges.select(
        "topic",
        "partition",
        range_string_col(
            F.col("topic"), F.col("partition"), F.col("start_offset"), F.col("end_offset")
        ).alias("range_token"),
    )
    # batch token via a global window over the (partition-count-sized)
    # token frame: the previous agg + crossJoin re-ran the whole
    # stream_ranges aggregation on the broadcast side (verified: two
    # FileScans, no exchange reuse across the broadcast boundary) —
    # the window keeps ONE branch and one scan, and the frame it sorts
    # is #partitions rows, never record-sized
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return with_token.withColumn(
        "batch_token",
        F.array_join(F.array_sort(F.collect_list("range_token").over(w)), ";"),
    )


def deterministic_file_names(
    records: DataFrame, partition_value_col: str | None = None, extension: str = "parquet"
) -> DataFrame:
    """D3: deterministic output file name per (topic, partition [, output
    partition]): sha256 of the range token (+ partition value), so
    re-running the same batch overwrites the same path.

    Mirrors the idempotent-overwrite trick of the reference's
    TimePartitioningFilePathFormatter.scala:39-47 (UUID from range hash)
    with a cross-engine-stable hash (sha256 hex).

    NAMESPACE WARNING: this is the per-(topic, partition) QUERY form;
    ``model/idempotence.batch_file_name`` is the per-BATCH sink form
    (one UUID-shaped name over the whole ranges signature). They hash
    different inputs with different encodings and are NOT
    interchangeable — a sink must pick one naming scheme and keep it,
    or a replay under the other scheme writes a second file instead of
    overwriting.
    """
    group_cols = ["topic", "partition"]
    df = records
    if partition_value_col is not None:
        group_cols.append(partition_value_col)
    ranges = df.groupBy(*group_cols).agg(
        F.min("offset").alias("start_offset"),
        F.max("offset").alias("end_offset"),
    )
    token = range_string_col(
        F.col("topic"), F.col("partition"), F.col("start_offset"), F.col("end_offset")
    )
    if partition_value_col is not None:
        token = F.concat_ws("/", F.col(partition_value_col).cast("string"), token)
    return ranges.select(
        *group_cols,
        token.alias("range_token"),
        F.concat(F.sha2(token, 256), F.lit(f".{extension}")).alias("file_name"),
    )
