"""Streaming materialized-view sink: per-batch incremental aggregation.

The streaming half of ``operators/matview.py``: a ``foreachBatch``
sink that keeps a per-key aggregate table current as batches arrive,
doing DELTA-sized work per batch:

1. the batch reduces to mergeable state (count / exact decimal sums /
   min / max per key) — one map-side-combinable aggregate;
2. prior state is read back for the TOUCHED keys only (left-semi
   against the delta's keys — untouched keys never enter the job);
3. touched prior ⊕ delta merges (state-sized), and the merged rows go
   through ``UpsertSink.write_batch`` — which rewrites only the hash
   buckets those keys land in and gives the crash/replay discipline
   (atomic manifest, batch ledger, deterministic version dirs).

Replays are no-ops BEFORE any aggregation runs: a committed batch id
short-circuits, so the merge can never double-count a delivered batch
(the at-least-once → exactly-once bridge, same contract as every other
sink in sinks/). At 100 TB the per-batch cost tracks the batch's key
footprint — buckets touched × bucket size — not the view size, the
property that makes continuous aggregation affordable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stream_loader_spark.operators.matview import (
    aggregate_state,
    finalize_aggregates,
    merge_aggregate_states,
)
from stream_loader_spark.sinks.upsert import UpsertSink

# order column for the underlying upsert: the writing batch id — within
# one batch every key appears once, across batches later always wins
_VERSION_COL = "_mv_batch"


class IncrementalAggSink:
    """foreachBatch sink maintaining SELECT keys…, count, sum/min/max
    per value column, incrementally."""

    def __init__(
        self,
        path: str,
        keys: list[str],
        value_cols: list[str],
        num_buckets: int = 16,
    ) -> None:
        self.keys = list(keys)
        self.value_cols = list(value_cols)
        self.upsert = UpsertSink(
            path, key_cols=self.keys, order_col=_VERSION_COL, num_buckets=num_buckets
        )

    def is_batch_committed(self, batch_id: int) -> bool:
        return self.upsert.is_batch_committed(batch_id)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.write_batch(batch_df, batch_id)

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        if self.upsert.is_batch_committed(batch_id):
            return  # replay: state already reflects this batch
        spark = batch_df.sparkSession
        delta = aggregate_state(batch_df, self.keys, self.value_cols).persist()
        try:
            states = [delta]
            try:
                prior = self.upsert.current_state(spark).drop(
                    "_bucket", _VERSION_COL
                )
                # touched keys only: the untouched 99% of a large view
                # never enters the merge job
                touched = prior.join(
                    delta.select(*self.keys), self.keys, "left_semi"
                )
                states.append(touched)
            except ValueError:
                pass  # first batch: no committed state yet
            merged = merge_aggregate_states(states, self.keys).withColumn(
                _VERSION_COL, F.lit(batch_id)
            )
            self.upsert.write_batch(merged, batch_id)
        finally:
            delta.unpersist()

    def current_view(self, spark: SparkSession) -> DataFrame:
        """The finalized aggregate table (sums as DOUBLE, avg derived)."""
        state = self.upsert.current_state(spark).drop("_bucket", _VERSION_COL)
        return finalize_aggregates(state, self.keys)
