"""S1–S3 Kafka option contract, pinned without a broker.

The reference subscribes to explicit topics or a pattern and seeks each
partition to a committed / rewound position
(source/KafkaSource.scala:84-111, KafkaContext.scala:61-70). The Spark
engine expresses all of that as reader OPTIONS, so the whole contract
is assertable as data: ``kafka_source_options`` is a pure function, and
a recording DataStreamReader double captures exactly what
``StreamPipeline.from_kafka`` would configure on a real source.
"""

from __future__ import annotations

import json

import pytest

from stream_loader_spark.model.interval import OffsetRange, WatermarkRange
from stream_loader_spark.model.position import StreamPosition
from stream_loader_spark.streaming.pipeline import StreamPipeline, kafka_source_options

COMMITTED = {
    ("ads", 0): StreamPosition(offset=1200, watermark_ms=1_700_000_000_000),
    ("ads", 1): StreamPosition(offset=900, watermark_ms=1_700_000_100_000),
    ("clicks", 0): StreamPosition(offset=50, watermark_ms=1_700_000_200_000),
}


class TestKafkaSourceOptions:
    def test_subscribe_fresh_consumer(self):
        opts = kafka_source_options("k1:9092,k2:9092", subscribe="ads,clicks")
        assert opts == {
            "kafka.bootstrap.servers": "k1:9092,k2:9092",
            "subscribe": "ads,clicks",
            "startingOffsets": "earliest",
        }

    def test_subscribe_pattern(self):
        opts = kafka_source_options("k:9092", subscribe_pattern="ads-.*")
        assert opts["subscribePattern"] == "ads-.*"
        assert "subscribe" not in opts

    def test_topics_and_pattern_are_exclusive(self):
        with pytest.raises(ValueError, match="subscribe"):
            kafka_source_options("k:9092", subscribe="a", subscribe_pattern="a.*")
        with pytest.raises(ValueError, match="subscribe"):
            kafka_source_options("k:9092")

    def test_committed_seek_is_per_partition_json(self):
        """S2: plain seek-to-committed → startingOffsets JSON with the
        NEXT offset for every (topic, partition)."""
        opts = kafka_source_options("k:9092", subscribe="ads,clicks", committed=COMMITTED)
        assert json.loads(opts["startingOffsets"]) == {
            "ads": {"0": 1200, "1": 900},
            "clicks": {"0": 50},
        }
        assert "startingOffsetsByTimestamp" not in opts

    def test_offset_rewind_subtracts_and_clamps(self):
        opts = kafka_source_options(
            "k:9092", subscribe="ads,clicks", committed=COMMITTED, interval=OffsetRange(100)
        )
        assert json.loads(opts["startingOffsets"]) == {
            "ads": {"0": 1100, "1": 800},
            "clicks": {"0": 0},  # 50 - 100 clamps at zero, never negative
        }

    def test_watermark_rewind_uses_offsets_for_times(self):
        """S3: an event-time rewind cannot be offset arithmetic — it
        becomes startingOffsetsByTimestamp (Kafka offsetsForTimes)."""
        opts = kafka_source_options(
            "k:9092",
            subscribe="ads,clicks",
            committed=COMMITTED,
            interval=WatermarkRange(duration_ms=60_000),
        )
        assert "startingOffsets" not in opts
        assert json.loads(opts["startingOffsetsByTimestamp"]) == {
            "ads": {"0": 1_700_000_000_000 - 60_000, "1": 1_700_000_100_000 - 60_000},
            "clicks": {"0": 1_700_000_200_000 - 60_000},
        }

    def test_extra_options_pass_through_stringified(self):
        opts = kafka_source_options(
            "k:9092", subscribe="ads", maxOffsetsPerTrigger=50000, failOnDataLoss=False
        )
        assert opts["maxOffsetsPerTrigger"] == "50000"
        assert opts["failOnDataLoss"] == "False"


KAFKA_SCHEMA = (
    "topic string, partition int, offset long, "
    "timestamp timestamp, key binary, value binary"
)


class _RecordingReader:
    """DataStreamReader double: records format/options, loads a real
    (empty, batch) DataFrame so the pipeline's projection runs."""

    def __init__(self, spark):
        self._spark = spark
        self.fmt = None
        self.options: dict[str, str] = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self):
        return self._spark.createDataFrame([], KAFKA_SCHEMA)


class _SparkWithRecorder:
    def __init__(self, spark, reader):
        self._spark = spark
        self._reader = reader

    @property
    def readStream(self):
        return self._reader

    def __getattr__(self, name):
        return getattr(self._spark, name)


class TestFromKafkaCapture:
    def test_pipeline_configures_reader_with_contract_options(self, spark):
        reader = _RecordingReader(spark)
        pipe = StreamPipeline(_SparkWithRecorder(spark, reader)).from_kafka(
            "k:9092",
            subscribe="ads,clicks",
            committed=COMMITTED,
            interval=OffsetRange(100),
            maxOffsetsPerTrigger=1000,
        )
        assert reader.fmt == "kafka"
        assert reader.options["kafka.bootstrap.servers"] == "k:9092"
        assert reader.options["subscribe"] == "ads,clicks"
        assert json.loads(reader.options["startingOffsets"]) == {
            "ads": {"0": 1100, "1": 800},
            "clicks": {"0": 0},
        }
        assert reader.options["maxOffsetsPerTrigger"] == "1000"
        # the projected stream exposes the engine's record columns
        assert pipe._stream.columns == ["topic", "partition", "offset", "ts", "key", "value"]


class TestGoldenOptionMaps:
    """Full-dict equality — a stray or missing option is a contract
    break even when every individually-asserted key is right."""

    def test_fresh_consumer_full_map(self):
        assert kafka_source_options("k1:9092,k2:9092", subscribe="ads") == {
            "kafka.bootstrap.servers": "k1:9092,k2:9092",
            "subscribe": "ads",
            "startingOffsets": "earliest",
        }

    def test_committed_seek_full_map(self):
        assert kafka_source_options(
            "k:9092", subscribe="ads,clicks", committed=COMMITTED
        ) == {
            "kafka.bootstrap.servers": "k:9092",
            "subscribe": "ads,clicks",
            "startingOffsets": '{"ads":{"0":1200,"1":900},"clicks":{"0":50}}',
        }

    def test_pattern_with_rewind_full_map(self):
        assert kafka_source_options(
            "k:9092",
            subscribe_pattern="ads.*",
            committed=COMMITTED,
            interval=OffsetRange(100),
            maxOffsetsPerTrigger=5000,
            failOnDataLoss=False,
        ) == {
            "kafka.bootstrap.servers": "k:9092",
            "subscribePattern": "ads.*",
            "startingOffsets": '{"ads":{"0":1100,"1":800},"clicks":{"0":0}}',
            "maxOffsetsPerTrigger": "5000",
            "failOnDataLoss": "False",
        }

    def test_watermark_rewind_full_map(self):
        opts = kafka_source_options(
            "k:9092",
            subscribe="ads",
            committed=COMMITTED,
            interval=WatermarkRange(100_000),
        )
        assert set(opts) == {
            "kafka.bootstrap.servers",
            "subscribe",
            "startingOffsetsByTimestamp",
        }
        by_ts = json.loads(opts["startingOffsetsByTimestamp"])
        assert by_ts == {
            "ads": {"0": 1_699_999_900_000, "1": 1_700_000_000_000},
            "clicks": {"0": 1_700_000_100_000},
        }

    @pytest.mark.parametrize(
        "key",
        [
            "kafka.enable.auto.commit",
            "kafka.auto.offset.reset",
            "kafka.key.deserializer",
            "kafka.value.deserializer",
        ],
    )
    def test_engine_owned_options_rejected(self, key):
        # the engine commits through the sink storage (K1-K9), never
        # Kafka auto-commit; defaults go through default_offsets
        with pytest.raises(ValueError, match="unsupported kafka option"):
            kafka_source_options("k:9092", subscribe="ads", **{key: "true"})

    def test_from_kafka_enforces_subscription_exclusivity(self, spark):
        reader = _RecordingReader(spark)
        with pytest.raises(ValueError, match="exactly one of"):
            StreamPipeline(_SparkWithRecorder(spark, reader)).from_kafka(
                "k:9092", subscribe="ads", subscribe_pattern="ads.*"
            )
        with pytest.raises(ValueError, match="exactly one of"):
            StreamPipeline(_SparkWithRecorder(spark, reader)).from_kafka("k:9092")
