"""Bucketed (pre-shuffled) table layout for co-located joins.

The reference keeps Kafka-partition affinity end to end — records from
partition P land in files for partition P, so downstream consumers
never re-shuffle (PartitionGroupingSink, SURVEY §2.3 G1/G2; see
stream-loader-core GroupingSink semantics). Spark's equivalent for the
BATCH side of that contract is bucketing: write each table hash-
partitioned into N buckets on the join/agg key, and every later join
or aggregation on that key skips its Exchange entirely.

At 100 TB this is the single biggest shuffle lever there is: a
fact-fact join (e.g. lineitem ⋈ orders on orderkey) re-shuffles both
sides on every query; bucketed layout pays the shuffle ONCE at write
time and amortizes it over every subsequent read. Bucket count is a
layout-time decision: pick it so one bucket of the biggest table fits
an executor's memory slice (at 100 TB / 4096 buckets ≈ 25 GB per
bucket per table — size accordingly).

Mechanics that make the no-Exchange plan actually materialize:

- both sides bucketed by the SAME columns into the SAME bucket count
  (Spark does not yet coalesce mismatched counts unless
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is on);
- the join must be a sort-merge join — broadcast hits small sides
  first, which is fine (broadcast has no Exchange either);
- ``sortBy`` at write time additionally removes the per-task Sort
  before the merge when reading a single file per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort: bool = True,
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` as an external bucketed table rooted at ``path``.

    Bucketing metadata lives in the session catalog (saveAsTable is
    required — a bare ``parquet(path)`` write silently drops bucket
    info), while the data itself stays at ``path`` so the layout is
    portable across sessions that re-register the table.
    """
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    writer = (
        df.write.format(file_format)
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two registered bucketed tables on their bucket key.

    Reads through the catalog (``spark.table``) — reading the parquet
    path directly would lose the bucket spec and re-introduce both
    Exchanges.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan.

    The assertion primitive for co-location tests: a bucketed
    fact-fact join must plan with zero shuffle Exchange nodes. Counts
    the bare ``Exchange`` operator word, whatever its partitioning
    (hash, range, single-partition, round-robin) — ``BroadcastExchange``
    (not a data shuffle of this side) and ``ReusedExchange`` (a
    pointer, not a second shuffle) are distinct operator words and
    excluded; matching only 'Exchange hashpartitioning' let range-sort
    shuffles certify as shuffle-free.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for tok in re.findall(r"\w*Exchange\b", plan) if tok == "Exchange")
