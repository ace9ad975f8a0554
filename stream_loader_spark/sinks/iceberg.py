"""Iceberg transactional sink (SURVEY §2.8 K6) — connector-gated.

The reference commits data files and consumer offsets in ONE Iceberg
transaction: append files + set table properties
``__consumer_offset:<group>:<topic>:<partition> = "<offset>:<wm>"``,
and recovers positions by reading those properties back
(iceberg/IcebergRecordBatchStorage.scala:26-75). With the Iceberg Spark
runtime on the classpath, the same design is:

- ``writeTo(table).append()`` inside ``foreachBatch`` (Iceberg's Spark
  sink commits the file set atomically);
- offsets mirrored into table properties via ``ALTER TABLE ... SET
  TBLPROPERTIES`` keyed by consumer group/topic/partition — Spark's
  checkpoint remains the primary ledger, the properties enable the
  reference's Kafka-free restart;
- ``committed_positions`` parses the properties back.

The Iceberg runtime is NOT present in this environment, so the sink
raises a clear error at construction unless the catalog resolves; the
property codec (pure Python) is tested regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_loader_spark.model.position import StreamPosition
from stream_loader_spark.operators.recovery import stream_ranges

PROPERTY_PREFIX = "__consumer_offset"


def offset_property(consumer_group: str, topic: str, partition: int) -> str:
    return f"{PROPERTY_PREFIX}:{consumer_group}:{topic}:{partition}"


def encode_position(pos: StreamPosition) -> str:
    return f"{pos.offset}:{pos.watermark_ms}"


def decode_position(value: str) -> StreamPosition:
    offset, wm = value.split(":")
    return StreamPosition(int(offset), int(wm))


def positions_from_properties(
    properties: dict[str, str], consumer_group: str
) -> dict[tuple[str, int], StreamPosition]:
    """Parse committed positions out of table properties; the stored
    offset is the last committed one, so the next position is +1."""
    out: dict[tuple[str, int], StreamPosition] = {}
    prefix = f"{PROPERTY_PREFIX}:{consumer_group}:"
    for key, value in properties.items():
        if not key.startswith(prefix):
            continue
        topic, partition = key[len(prefix) :].rsplit(":", 1)
        last = decode_position(value)
        out[(topic, int(partition))] = StreamPosition(last.offset + 1, last.watermark_ms)
    return out


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


class IcebergOffsetsSink:
    """foreachBatch sink: append to an Iceberg table + mirror offsets
    into table properties for Kafka-free restart."""

    def __init__(self, spark: SparkSession, table: str, consumer_group: str) -> None:
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg Spark runtime not on the classpath; add "
                "org.apache.iceberg:iceberg-spark-runtime and configure a catalog"
            )
        self.spark = spark
        self.table = table
        self.consumer_group = consumer_group

    def is_batch_committed(self, ranges) -> bool:
        """A batch is committed iff every range it covers is already at or
        behind the positions recorded in the table properties — the
        reference's isBatchCommitted check (RecordBatchStorage.scala:44-64)."""
        committed = self.committed_positions()
        if not committed:
            return False
        for r in ranges:
            pos = committed.get((r["topic"], r["partition"]))
            if pos is None or r["end_offset"] >= pos.offset:
                return False
        return True

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        """Append + mirror offsets.

        NOTE: the DataFrame API cannot put the append and the property
        update in ONE Iceberg transaction (the reference does,
        IcebergRecordBatchStorage.scala:47-64, via the Java Transaction
        API — the seam to graft when running with a real catalog). The
        replay guard below closes the restart-duplication window: a
        replayed batch whose ranges are already behind the recorded
        positions is skipped; only a crash exactly between append and
        property update needs the Java-transaction upgrade.
        """
        batch_df = batch_df.persist()
        ranges = stream_ranges(batch_df).collect()
        if self.is_batch_committed(ranges):
            batch_df.unpersist()
            return
        batch_df.drop("topic", "partition", "offset").writeTo(self.table).append()
        props = ", ".join(
            f"'{offset_property(self.consumer_group, r['topic'], r['partition'])}'="
            f"'{r['end_offset']}:"
            f"{int(r['end_watermark'].timestamp() * 1000) if r['end_watermark'] is not None else 0}'"
            for r in ranges
        )
        if props:
            self.spark.sql(f"ALTER TABLE {self.table} SET TBLPROPERTIES ({props})")
        batch_df.unpersist()

    def committed_positions(self) -> dict[tuple[str, int], StreamPosition]:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {self.table}").collect()
        return positions_from_properties(
            {r["key"]: r["value"] for r in rows}, self.consumer_group
        )
