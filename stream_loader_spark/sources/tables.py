"""Fixture-table catalog over the driver's parquet test data.

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file (or directory) each under a
scale-factor directory (TESTDATA.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    # Normalize TIMESTAMP_NTZ (Spark 4.1+ inference over tz-less parquet)
    # to TIMESTAMP_LTZ: every operator and oracle compares under a UTC
    # session timezone, where the cast is value-identical. The cast target
    # must be spelled "timestamp_ltz" — under a session with
    # spark.sql.timestampType=TIMESTAMP_NTZ the bare "timestamp" keyword
    # resolves to NTZ and the cast silently no-ops, leaving unix_millis /
    # session_window unresolvable (the round-3 driver failure mode).
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, df[c].cast("timestamp_ltz"))
    return df


def scatter(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input so CPU-heavy operators parallelize.

    The local fixtures are single parquet files → one input split → one
    task, which serializes explode/HOF-heavy work. At production scale
    inputs arrive in many splits and this is a no-op; locally it costs
    one small shuffle of the raw rows and buys full-core parallelism.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table and register temp views for spark.sql."""
    out = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dataset whose schema grew over time (the loader
    kept appending batches while upstream added payload columns —
    reference formatters get this from Avro schema evolution; on the
    parquet side it is footer-schema merging). ``mergeSchema`` unions
    all file schemas; files predating a column yield NULLs for it.

    Scale note: merging reads every file footer at planning time —
    fine for a sink's batch dirs, not for millions of files; pair with
    ``operators/layout.py::compact_small_files`` to keep file counts
    bounded.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)
