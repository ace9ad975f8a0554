"""Config-driven loader assembly — the reference's application entry.

The reference wires loaders from typed HOCON configs
(stream-loader-tests/src/main/resources/common.conf +
application-{s3,hdfs,clickhouse,vertica,iceberg}.conf: kafka consumer
properties + topic, batch size/commit triggers, storage-specific
blocks). This module is that surface for the Spark engine: a plain
dict (JSON-friendly — HOCON's role in the JVM ecosystem) assembles a
``StreamPipeline`` plus sink, so a deployment is data, not code:

    app = build_app(spark, {
        "source": {"type": "file", "path": "/in", "schema": REC_SCHEMA},
        "format": {"type": "json", "schema": "k BIGINT, v STRING"},
        "watermark": {"column": "ts", "delay": "10 minutes"},
        "partition": {"column": "ts"},
        "sink": {"type": "manifest", "path": "/out",
                 "partition-by": "dt"},
        "checkpoint": "/chk",
    })
    app.pipeline.run_available()      # or .start() for continuous

Config keys mirror the reference's block names (kafka consumer
properties pass through verbatim, as the reference passes them to the
KafkaConsumer). Validation is strict: unknown keys raise with the
allowed set — the safety the reference gets from typed config classes,
which a stringly dict would otherwise silently lose.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from stream_loader_spark.streaming.pipeline import StreamPipeline

_TOP_KEYS = {"source", "kafka", "format", "watermark", "partition", "dedup", "sink", "checkpoint", "trigger"}
_SOURCE_KEYS = {"type", "path", "schema", "format", "options"}
_KAFKA_KEYS = {"bootstrap-servers", "topic", "topic-pattern", "consumer", "default-offsets"}
_FORMAT_KEYS = {"type", "schema", "value-column", "mode"}
_WATERMARK_KEYS = {"column", "delay", "valid-diff"}
_PARTITION_KEYS = {"column", "out"}
_DEDUP_KEYS = {"keys"}

# Single source of truth for sink types: _validate and _build_sink both
# read this table, so a new sink type is one entry here + one branch in
# _build_sink — they can't silently disagree, and required keys fail at
# validation time (not as a KeyError mid-assembly).
_SINK_TYPES: dict[str, dict[str, set[str]]] = {
    "manifest": {"required": {"path"}, "optional": {"partition-by"}},
    "offsets": {"required": {"path"}, "optional": set()},
    "upsert": {
        "required": {"path", "key-columns", "order-column"},
        "optional": {"num-buckets", "tombstone-column"},
    },
    "matview": {
        "required": {"path", "key-columns", "value-columns"},
        "optional": {"num-buckets"},
    },
    "dedup-ingest": {
        "required": {"path"},
        "optional": {"text-column", "id-column"},
    },
    "ivf": {
        "required": {"path"},
        "optional": {"num-centroids", "kmeans-iterations", "id-column", "vector-column"},
    },
    # The reference's raison d'être storages (SURVEY §2.8 K6-K9) were
    # assemblable only in code until round 6 — a reference user
    # switching via config couldn't wire their actual target.
    "clickhouse": {
        "required": {"url", "table", "columns"},
        "optional": {
            "compress", "topic-column", "partition-column", "offset-column",
            "ts-column", "verify-dedup", "insert-settings", "max-rows-per-block",
        },
    },
    "jdbc-txn": {
        "required": {"data-table", "offsets-table", "consumer-group", "data-columns"},
        "optional": {
            "connect", "driver", "database", "param-token", "topic-column",
            "partition-column", "offset-column", "ts-column", "data-column-types",
        },
    },
    "iceberg": {
        "required": {"table", "consumer-group"},
        "optional": set(),
    },
}


def _required_keys(block: dict, required: set[str], where: str) -> None:
    missing = required - set(block)
    if missing:
        raise ValueError(f"{where} config missing required keys {sorted(missing)}")


def _check_keys(block: dict, allowed: set[str], where: str) -> None:
    unknown = set(block) - allowed
    if unknown:
        raise ValueError(
            f"unknown {where} config keys {sorted(unknown)}; allowed: {sorted(allowed)}"
        )


@dataclass
class LoaderApp:
    """An assembled loader: the pipeline plus the sink it commits to
    (exposed so operators/recovery can interrogate committed
    positions, mirroring how the reference hands the storage to both
    the loader and the recovery path)."""

    pipeline: StreamPipeline
    sink: Callable[[DataFrame, int], None]


def _validate_sink(cfg: dict) -> None:
    kind = cfg.get("type")
    if kind not in _SINK_TYPES:
        raise ValueError(
            f"unknown sink type {kind!r}; allowed: {sorted(_SINK_TYPES)}"
        )
    spec = _SINK_TYPES[kind]
    _check_keys(cfg, {"type"} | spec["required"] | spec["optional"], f"{kind} sink")
    _required_keys(cfg, spec["required"], f"{kind} sink")
    if kind == "jdbc-txn":
        # the connection factory comes from exactly one place: a
        # dotted "module:attr" import path, or the built-in sqlite
        # driver + database pair (tests, embedded deployments)
        has_connect = "connect" in cfg
        has_driver = "driver" in cfg or "database" in cfg
        if has_connect == has_driver:
            raise ValueError(
                "jdbc-txn sink requires exactly one of 'connect' "
                "(module:attr factory) or 'driver'+'database'"
            )
        if has_driver:
            _required_keys(cfg, {"driver", "database"}, "jdbc-txn sink")
            if cfg["driver"] != "sqlite":
                raise ValueError(
                    f"unknown jdbc-txn driver {cfg['driver']!r}; allowed: sqlite "
                    "(use 'connect' for any other DB-API module)"
                )


def _resolve_connect(cfg: dict):
    """Connection factory for jdbc-txn: built-in sqlite, or an imported
    ``module:attr`` callable (how a deployment supplies psycopg2 /
    vertica-python / anything DB-API without this module importing it)."""
    if "connect" in cfg:
        import importlib

        mod_name, _, attr = cfg["connect"].partition(":")
        if not attr:
            raise ValueError(
                f"jdbc-txn 'connect' must be 'module:attr', got {cfg['connect']!r}"
            )
        factory = getattr(importlib.import_module(mod_name), attr)
        if not callable(factory):
            raise ValueError(f"jdbc-txn connect {cfg['connect']!r} is not callable")
        return factory
    from stream_loader_spark.sinks.dbtxn import sqlite_connect

    return sqlite_connect(cfg["database"])


def _build_sink(cfg: dict, spark: SparkSession | None = None):
    kind = cfg["type"]
    if kind == "manifest":
        from stream_loader_spark.sinks.manifest import ManifestFileSink

        return ManifestFileSink(cfg["path"], partition_by=cfg.get("partition-by"))  # str col name
    if kind == "offsets":
        from stream_loader_spark.sinks.offsets import InRowOffsetsSink

        return InRowOffsetsSink(cfg["path"])
    if kind == "matview":
        from stream_loader_spark.sinks.matview import IncrementalAggSink

        return IncrementalAggSink(
            cfg["path"],
            keys=list(cfg["key-columns"]),
            value_cols=list(cfg["value-columns"]),
            num_buckets=int(cfg.get("num-buckets", 16)),
        )
    if kind == "dedup-ingest":
        from stream_loader_spark.streaming.ingest import DedupIngestSink

        return DedupIngestSink(
            cfg["path"],
            text_col=cfg.get("text-column", "text"),
            id_col=cfg.get("id-column", "doc_id"),
        )
    if kind == "ivf":
        from stream_loader_spark.streaming.ingest import IvfIngestSink

        return IvfIngestSink(
            cfg["path"],
            num_centroids=int(cfg.get("num-centroids", 16)),
            kmeans_iterations=int(cfg.get("kmeans-iterations", 2)),
            id_col=cfg.get("id-column", "vec_id"),
            vec_col=cfg.get("vector-column", "embedding"),
        )
    if kind == "clickhouse":
        from stream_loader_spark.functions.rowbinary import CHType, RowBinaryEncoder
        from stream_loader_spark.sinks.clickhouse import ClickHouseHttpStorage

        encoder = RowBinaryEncoder(
            [(name, CHType(ch_type)) for name, ch_type in cfg["columns"]]
        )
        return ClickHouseHttpStorage(
            cfg["url"],
            cfg["table"],
            encoder,
            compress=bool(cfg.get("compress", False)),
            topic_col=cfg.get("topic-column", "topic"),
            partition_col=cfg.get("partition-column", "partition"),
            offset_col=cfg.get("offset-column", "offset"),
            ts_col=cfg.get("ts-column", "ts"),
            verify_dedup=bool(cfg.get("verify-dedup", True)),
            insert_settings=cfg.get("insert-settings"),
            max_rows_per_block=int(cfg.get("max-rows-per-block", 1_000_000)),
        )
    if kind == "jdbc-txn":
        from stream_loader_spark.sinks.dbtxn import DbTransactionalSink

        sink = DbTransactionalSink(
            _resolve_connect(cfg),
            cfg["data-table"],
            cfg["offsets-table"],
            cfg["consumer-group"],
            list(cfg["data-columns"]),
            topic_col=cfg.get("topic-column", "topic"),
            partition_col=cfg.get("partition-column", "partition"),
            offset_col=cfg.get("offset-column", "offset"),
            ts_col=cfg.get("ts-column", "ts"),
            param_token=cfg.get("param-token", "?"),
            data_col_types=cfg.get("data-column-types"),
        )
        # create-if-missing at assembly: the deployment artifact alone
        # must yield a runnable loader (the reference's storages
        # likewise touch the target at init for position recovery)
        sink.ensure_tables()
        return sink
    if kind == "iceberg":
        from stream_loader_spark.sinks.iceberg import IcebergOffsetsSink

        if spark is None:
            # fail as a configuration error here, not as an opaque
            # AttributeError inside iceberg_available(spark)
            raise ValueError(
                "iceberg sink requires an active SparkSession: "
                "pass spark to _build_sink/build_app"
            )
        return IcebergOffsetsSink(spark, cfg["table"], cfg["consumer-group"])
    from stream_loader_spark.sinks.upsert import UpsertSink

    return UpsertSink(
        cfg["path"],
        key_cols=list(cfg["key-columns"]),
        order_col=cfg["order-column"],
        num_buckets=int(cfg.get("num-buckets", 16)),
        tombstone_col=cfg.get("tombstone-column"),
    )


def _validate(config: dict) -> None:
    """Whole-config validation BEFORE any assembly: a typo in the last
    block must fail before the first block touches storage (the
    reference's typed config classes fail at parse time the same
    way)."""
    _check_keys(config, _TOP_KEYS, "top-level")
    if ("source" in config) == ("kafka" in config):
        raise ValueError("exactly one of 'source' (file/test) or 'kafka' is required")
    if "sink" not in config or "checkpoint" not in config:
        raise ValueError("'sink' and 'checkpoint' are required")
    if "kafka" in config:
        _check_keys(config["kafka"], _KAFKA_KEYS, "kafka")
        _required_keys(config["kafka"], {"bootstrap-servers"}, "kafka")
    else:
        _check_keys(config["source"], _SOURCE_KEYS, "source")
        if config["source"].get("type", "file") != "file":
            raise ValueError(
                f"unknown source type {config['source'].get('type')!r}; allowed: file"
            )
        _required_keys(config["source"], {"path", "schema"}, "source")
    for block, allowed in (
        ("format", _FORMAT_KEYS),
        ("watermark", _WATERMARK_KEYS),
        ("partition", _PARTITION_KEYS),
        ("dedup", _DEDUP_KEYS),
        # DataStreamWriter.trigger kwargs: an unchecked typo here would
        # otherwise surface only at query start, AFTER sink assembly
        ("trigger", {"processingTime", "once", "availableNow", "continuous"}),
    ):
        if block in config:
            _check_keys(config[block], allowed, block)
    if "dedup" in config and not config["dedup"].get("keys"):
        raise ValueError("dedup block requires a non-empty 'keys' list")
    if "format" in config:
        if config["format"].get("type", "json") not in ("json", "avro", "protobuf"):
            raise ValueError(
                f"unknown format type {config['format'].get('type')!r}; "
                "allowed: json, avro, protobuf"
            )
        _required_keys(config["format"], {"schema"}, "format")
    _validate_sink(config["sink"])


def build_app(spark: SparkSession, config: dict) -> LoaderApp:
    """Assemble a loader from config. Transform order is fixed
    (format → watermark → partition → dedup), matching the reference's
    formatter → watermark tracking → partitioner → batcher order."""
    _validate(config)

    pipe = StreamPipeline(spark)

    if "kafka" in config:
        k = config["kafka"]
        pipe.from_kafka(
            k["bootstrap-servers"],
            subscribe=k.get("topic"),
            subscribe_pattern=k.get("topic-pattern"),
            default_offsets=k.get("default-offsets", "earliest"),
            # consumer properties pass through verbatim, prefixed the
            # way Spark's Kafka source expects (the reference passes
            # its consumer block straight to the KafkaConsumer)
            **{f"kafka.{p}": v for p, v in (k.get("consumer") or {}).items()},
        )
    else:
        s = config["source"]
        pipe.from_file_stream(
            s["path"], s["schema"], fmt=s.get("format", "parquet"), **(s.get("options") or {})
        )

    if "format" in config:
        f = config["format"]
        kind = f.get("type", "json")
        if kind == "json":
            pipe.format_records(f["schema"], value_col=f.get("value-column", "props"))
        elif kind == "avro":
            pipe.format_avro(
                f["schema"], value_col=f.get("value-column", "value"), mode=f.get("mode", "PERMISSIVE")
            )
        else:
            pipe.format_protobuf(f["schema"], value_col=f.get("value-column", "value"))

    if "watermark" in config:
        w = config["watermark"]
        kwargs = {}
        if "valid-diff" in w:
            kwargs["valid_diff"] = w["valid-diff"]
        pipe.clamp_watermark(w.get("column", "ts"), delay=w.get("delay", "10 minutes"), **kwargs)

    if "partition" in config:
        p = config["partition"]
        pipe.partition_by_date(p.get("column", "ts"), out_col=p.get("out", "dt"))

    if "dedup" in config:
        pipe.dedup_within_watermark(*config["dedup"]["keys"])

    sink = _build_sink(config["sink"], spark)
    pipe.sink(sink, config["checkpoint"])
    if "trigger" in config:
        pipe.trigger(**config["trigger"])
    return LoaderApp(pipeline=pipe, sink=sink)


def load_app(spark: SparkSession, config_path: str) -> LoaderApp:
    """Assemble from a JSON config file (the deployment artifact)."""
    import json

    with open(config_path) as fh:
        return build_app(spark, json.load(fh))
