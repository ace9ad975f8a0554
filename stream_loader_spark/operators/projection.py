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


# -- binary record formats (P2 / E4 / E5) ----------------------------------
#
# The reference's canonical formatters parse Avro and Protobuf payloads
# (hadoop/parquet/AvroParquetFileBuilder.scala:30-86,
# ProtoParquetFileBuilder.scala:23-54; the Iceberg test loader decodes
# Avro records, stream-loader-tests/.../loaders/Iceberg.scala:44-60).
# Spark ships the expression wrappers in-core, but the implementation
# jars (spark-avro, spark-protobuf) are EXTERNAL packages — absent in
# this environment — so each formatter probes for its jar and raises a
# clear error naming the missing package; golden tests skip on absence.


def avro_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def protobuf_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def avro_formatted_records(
    records: DataFrame,
    avro_schema_json: str,
    value_col: str = "value",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """P2/E4: parse binary Avro payloads into typed columns.

    ``mode='PERMISSIVE'`` nulls out corrupt payloads (the formatter's
    0..N contract); ``'FAILFAST'`` surfaces them as task errors.
    """
    if not avro_available(records.sparkSession):
        raise RuntimeError(
            "Avro formatting requires the spark-avro package "
            "(org.apache.spark:spark-avro_2.13) on the classpath"
        )
    from pyspark.sql.avro.functions import from_avro

    parsed = from_avro(F.col(value_col), avro_schema_json, {"mode": mode})
    return records.withColumn("_parsed", parsed).select("*", "_parsed.*").drop("_parsed")


def protobuf_formatted_records(
    records: DataFrame,
    message_name: str,
    descriptor_file: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """E5: parse binary Protobuf payloads into typed columns, from a
    compiled descriptor-set file (protoc --descriptor_set_out)."""
    if not protobuf_available(records.sparkSession):
        raise RuntimeError(
            "Protobuf formatting requires the spark-protobuf package "
            "(org.apache.spark:spark-protobuf_2.13) on the classpath"
        )
    from pyspark.sql.protobuf.functions import from_protobuf

    parsed = from_protobuf(F.col(value_col), message_name, descFilePath=descriptor_file)
    return records.withColumn("_parsed", parsed).select("*", "_parsed.*").drop("_parsed")


def formatted_records_split(
    records: DataFrame,
    schema: str,
    value_col: str = "props",
    corrupt_col: str = "_corrupt_record",
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """P1 with a dead-letter path: (good, quarantined) DataFrames.

    ``formatted_records`` follows the reference's permissive contract
    (unparseable payloads yield NULL fields) — but a loader feeding a
    warehouse usually wants corrupt bytes ROUTED, not silently nulled.
    Spark 4's permissive ``from_json`` returns a struct of null FIELDS
    for malformed input (never a null struct), so mere null-checking
    cannot distinguish corrupt payloads from valid JSON missing a key;
    the detector is the engine's own ``columnNameOfCorruptRecord``
    channel, which captures the raw text of exactly the rows Jackson
    rejected.

    ``good`` carries the parsed columns (NULL payloads parse to NULL
    fields and stay good — absence is not corruption); ``quarantined``
    keeps the original record shape for a replayable dead-letter sink.
    Both sides are lazy filters over one parse expression and add no
    shuffle — but they are two separate ACTIONS when written to two
    sinks, so a ``foreachBatch`` router should ``persist()`` the
    micro-batch first to pay the source scan once (see
    tests/test_streaming_sinks.py::TestQuarantineRouting). Batch
    callers that consume BOTH sides inside one job can pass
    ``materialize=True`` instead: the parsed frame is checkpointed so
    the scan and the JSON parse run once rather than once per side.
    """
    full_schema = f"{schema}, {corrupt_col} STRING"
    parsed = records.withColumn(
        "_parsed",
        F.from_json(
            F.col(value_col), full_schema, {"columnNameOfCorruptRecord": corrupt_col}
        ),
    )
    if materialize:
        parsed = parsed.localCheckpoint(eager=False)
    is_bad = F.col(f"_parsed.{corrupt_col}").isNotNull()
    good = (
        parsed.where(~is_bad | F.col(value_col).isNull())
        .select("*", "_parsed.*")
        .drop("_parsed", corrupt_col)
    )
    quarantined = parsed.where(is_bad).drop("_parsed")
    return good, quarantined


_UDTF_SEQ = iter(range(1_000_000))


def formatted_records_udtf(records: DataFrame, formatter_udtf, props_col: str = "props") -> DataFrame:
    """The FULL user-extension form of the record formatter: arbitrary
    Python logic turns one raw record into zero or more typed rows,
    joined back to the record's stream metadata — the 1→0..N contract
    of the reference's RecordFormatter interface
    (sink/batch/RecordFormatter.scala:18-24, cited for parity).

    ``formatter_udtf`` is a ``@udtf(returnType=...)`` class whose
    ``eval(payload)`` yields output tuples; yielding nothing drops the
    record (the formatter-level dead-letter gesture). The plan is a
    LATERAL table-function join, so Catalyst still prunes and pushes
    around it.

    This is deliberately the SLOW PATH: JSON payloads should use
    ``formatted_records`` (JVM ``from_json``), Avro the codec path —
    a Python UDTF is for formats those can't express. Declare the
    UDTF with ``useArrow=True`` where the payload shapes allow it to
    cut the per-row pickling cost.
    """
    spark = records.sparkSession
    seq = next(_UDTF_SEQ)
    fn_name = f"sl_record_formatter_{seq}"
    view = f"sl_formatter_input_{seq}"
    spark.udtf.register(fn_name, formatter_udtf)
    records.createOrReplaceTempView(view)
    meta = ", ".join(f"r.{c}" for c in records.columns if c != props_col)
    return spark.sql(
        f"SELECT {meta}, f.* FROM {view} r, LATERAL {fn_name}(r.{props_col}) f"
    )
