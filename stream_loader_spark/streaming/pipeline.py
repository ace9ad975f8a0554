"""Pipeline builder: the Spark-native ``StreamLoader``.

The reference assembles loaders from builders — source, formatter,
partitioner, batcher, storage (StreamLoader.scala:25-40, §3.1) — then
runs a hand-rolled poll/commit loop. Here the same assembly surface
produces a Structured Streaming query: the engine supplies polling,
micro-batching, watermarks, checkpointed exactly-once and restart; the
sink callables supply storage idempotence.

    pipe = (StreamPipeline(spark)
            .from_stream(stream_df)                  # or .from_kafka(...)
            .format_records(schema="k INT")          # P1
            .clamp_watermark("ts", delay="10 minutes")  # S5 + watermark
            .partition_by_date("ts")                 # P4
            .sink(ManifestFileSink(out), checkpoint))
    q = pipe.start()          # or .run_available() for a bounded drain

Production Kafka sources plug in with ``from_kafka`` (standard
``spark.readStream.format("kafka")`` options); tests use file streams.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from stream_loader_spark.operators.watermark import DEFAULT_VALID_DIFF, valid_event_time
from stream_loader_spark.operators.projection import formatted_records


def kafka_source_options(
    bootstrap_servers: str,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
    committed: dict | None = None,
    interval=None,
    default_offsets: str = "earliest",
    **extra,
) -> dict[str, str]:
    """The EXACT option dict a Kafka source run is configured with —
    S1–S3 as data, assertable without a broker.

    Mirrors the reference's subscription + seek semantics
    (source/KafkaSource.scala:84-111, KafkaContext.scala:61-70) onto
    Spark's reader options:

    - exactly one of ``subscribe`` / ``subscribe_pattern`` (the
      reference's topics-vs-pattern subscription modes);
    - ``committed`` positions (``{(topic, partition): StreamPosition}``)
      + an optional ``OffsetRange`` rewind → per-partition
      ``startingOffsets`` JSON (seek-to-committed, S2);
    - ``committed`` + a ``WatermarkRange`` rewind →
      ``startingOffsetsByTimestamp`` JSON (offsetsForTimes, S3);
    - no committed positions → ``startingOffsets=<default_offsets>``
      (fresh consumer).
    """
    import json

    from stream_loader_spark.model.interval import OffsetRange, WatermarkRange
    from stream_loader_spark.streaming.rewind import rewound_starting_offsets

    if (subscribe is None) == (subscribe_pattern is None):
        raise ValueError(
            "exactly one of subscribe / subscribe_pattern is required "
            "(reference KafkaSource subscribes to explicit topics OR a pattern)"
        )
    # Options the engine OWNS: offsets are committed through the sink's
    # two-phase storage (K1-K9), never Kafka auto-commit (the reference
    # consumer likewise runs enable.auto.commit=false and commits via
    # the storage); seek defaults go through ``default_offsets``; the
    # key/value byte contract is fixed. Spark's Kafka source fails on
    # these at stream start — rejecting them HERE makes it a
    # configuration-time error instead of a runtime one.
    forbidden = {
        "kafka.enable.auto.commit": "offsets commit through the sink storage",
        "kafka.auto.offset.reset": "use default_offsets",
        "kafka.key.deserializer": "records are bytes; deserialize downstream",
        "kafka.value.deserializer": "records are bytes; deserialize downstream",
    }
    for k in extra:
        if k in forbidden:
            raise ValueError(f"unsupported kafka option {k!r}: {forbidden[k]}")
    opts: dict[str, str] = {"kafka.bootstrap.servers": bootstrap_servers}
    if subscribe is not None:
        opts["subscribe"] = subscribe
    else:
        opts["subscribePattern"] = subscribe_pattern
    if committed:
        # OffsetRange(0) is the identity rewind: seek exactly to the
        # committed next offsets (the reference's plain S2 seek)
        per_partition = rewound_starting_offsets(
            committed, interval if interval is not None else OffsetRange(0)
        )
        key = (
            "startingOffsetsByTimestamp"
            if isinstance(interval, WatermarkRange)
            else "startingOffsets"
        )
        opts[key] = json.dumps(per_partition, sort_keys=True, separators=(",", ":"))
    else:
        opts["startingOffsets"] = default_offsets
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def with_clamped_watermark(
    stream: DataFrame,
    ts_col: str = "ts",
    delay: str = "10 minutes",
    valid_diff: str = DEFAULT_VALID_DIFF,
) -> DataFrame:
    """S5 for streams: drop unreasonably-future event times from
    watermark tracking, then register the engine watermark.

    The reference still *delivers* future-stamped records (they only
    don't advance the watermark); Spark's watermark is computed from all
    surviving rows, so the clamp must filter them entirely — the one
    deliberate semantic narrowing, applied only to rows beyond
    ``valid_diff`` of the processing-time clock.
    """
    # NULL event times are neither future nor invalid — the reference
    # delivers them — so they must pass the clamp (a bare comparison
    # evaluates NULL and where() would silently drop the row: lost data
    # with no metric or dead-letter path)
    clamped = stream.where(
        F.col(ts_col).isNull()
        | valid_event_time(F.col(ts_col), F.current_timestamp(), valid_diff)
    )
    return clamped.withWatermark(ts_col, delay)


class StreamPipeline:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._stream: DataFrame | None = None
        self._transforms: list[Callable[[DataFrame], DataFrame]] = []
        self._sink: Callable[[DataFrame, int], None] | None = None
        self._checkpoint: str | None = None
        self._trigger: dict | None = None

    # -- sources --------------------------------------------------------
    def from_stream(self, stream: DataFrame) -> "StreamPipeline":
        """Any streaming DataFrame already shaped like stream records."""
        self._stream = stream
        return self

    def from_kafka(
        self,
        bootstrap_servers: str,
        subscribe: str | None = None,
        subscribe_pattern: str | None = None,
        committed: dict | None = None,
        interval=None,
        default_offsets: str = "earliest",
        **options,
    ) -> "StreamPipeline":
        """Production source: standard Kafka reader, bytes in key/value.
        Subscription + seek options come from ``kafka_source_options``
        (S1–S3); pass ``committed`` positions and an optional rewind
        ``interval`` to start from sink-recovered offsets."""
        reader = self.spark.readStream.format("kafka")
        for k, v in kafka_source_options(
            bootstrap_servers,
            subscribe=subscribe,
            subscribe_pattern=subscribe_pattern,
            committed=committed,
            interval=interval,
            default_offsets=default_offsets,
            **options,
        ).items():
            reader = reader.option(k, v)
        self._stream = reader.load().select(
            F.col("topic"),
            F.col("partition"),
            F.col("offset"),
            F.col("timestamp").alias("ts"),
            F.col("key"),
            F.col("value"),
        )
        return self

    def from_file_stream(
        self, path: str, schema: str, fmt: str = "parquet", **options
    ) -> "StreamPipeline":
        """File-based stream (tests / replay): new files become batches.
        ``maxFilesPerTrigger=1`` forces one micro-batch per file."""
        reader = self.spark.readStream.format(fmt).schema(schema)
        for k, v in options.items():
            reader = reader.option(k, str(v))
        self._stream = reader.load(path)
        return self

    def track_watermark(self, valid_diff_ms: int = 3_600_000) -> "StreamPipeline":
        """Stateful per-partition watermark tracking with future clamp —
        delivers every record stamped with the current watermark (the
        reference's exact MaxWatermarkProvider contract); see
        streaming/stateful.py."""
        from stream_loader_spark.streaming.stateful import with_tracked_watermark

        return self.transform(lambda df: with_tracked_watermark(df, valid_diff_ms))

    # -- transforms (applied in order) ----------------------------------
    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "StreamPipeline":
        self._transforms.append(fn)
        return self

    def format_records(self, schema: str, value_col: str = "props") -> "StreamPipeline":
        return self.transform(lambda df: formatted_records(df, schema, value_col))

    def format_avro(
        self, avro_schema_json: str, value_col: str = "value", mode: str = "PERMISSIVE"
    ) -> "StreamPipeline":
        """P2/E4: binary Avro payloads → typed columns (needs spark-avro;
        reference AvroParquetFileBuilder.scala:30-86)."""
        from stream_loader_spark.operators.projection import avro_formatted_records

        return self.transform(
            lambda df: avro_formatted_records(df, avro_schema_json, value_col, mode)
        )

    def format_protobuf(
        self, message_name: str, descriptor_file: str | None = None, value_col: str = "value"
    ) -> "StreamPipeline":
        """E5: binary Protobuf payloads → typed columns (needs
        spark-protobuf; reference ProtoParquetFileBuilder.scala:23-54)."""
        from stream_loader_spark.operators.projection import protobuf_formatted_records

        return self.transform(
            lambda df: protobuf_formatted_records(df, message_name, descriptor_file, value_col)
        )

    def clamp_watermark(
        self, ts_col: str = "ts", delay: str = "10 minutes", valid_diff: str = DEFAULT_VALID_DIFF
    ) -> "StreamPipeline":
        return self.transform(lambda df: with_clamped_watermark(df, ts_col, delay, valid_diff))

    def partition_by_date(self, ts_col: str = "ts", out_col: str = "dt") -> "StreamPipeline":
        return self.transform(lambda df: df.withColumn(out_col, F.to_date(F.col(ts_col))))

    def dedup_within_watermark(self, *keys: str) -> "StreamPipeline":
        """Streaming dedup on key columns with watermark-bounded state —
        the D1 warm-up cache's steady-state form: replays and duplicate
        deliveries inside the watermark window drop engine-side, and
        state is evicted as the watermark advances (bounded memory at
        any scale). Requires a prior ``clamp_watermark``."""
        return self.transform(lambda df: df.dropDuplicatesWithinWatermark(list(keys)))

    # -- sink -----------------------------------------------------------
    def sink(
        self, sink_fn: Callable[[DataFrame, int], None], checkpoint: str
    ) -> "StreamPipeline":
        self._sink = sink_fn
        self._checkpoint = checkpoint
        return self

    def trigger(self, **kwargs) -> "StreamPipeline":
        self._trigger = kwargs
        return self

    # -- execution ------------------------------------------------------
    def _build(self) -> DataFrame:
        if self._stream is None:
            raise ValueError("no source configured")
        df = self._stream
        for fn in self._transforms:
            df = fn(df)
        return df

    def start(self) -> StreamingQuery:
        if self._sink is None or self._checkpoint is None:
            raise ValueError("no sink configured")
        writer = (
            self._build()
            .writeStream.foreachBatch(self._sink)
            .option("checkpointLocation", self._checkpoint)
        )
        if self._trigger:
            writer = writer.trigger(**self._trigger)
        return writer.start()

    def run_available(self, timeout_sec: int = 300) -> None:
        """Drain everything currently available, then stop (the bounded
        form used by tests and backfills). Raises if the drain does not
        finish within ``timeout_sec`` — a silent partial drain would let
        callers read half-written state."""
        saved_trigger = self._trigger
        self._trigger = {"availableNow": True}
        try:
            q = self.start()
            finished = q.awaitTermination(timeout_sec)
            if not finished:
                q.stop()
                raise TimeoutError(
                    f"availableNow drain did not finish within {timeout_sec}s"
                )
        finally:
            self._trigger = saved_trigger
