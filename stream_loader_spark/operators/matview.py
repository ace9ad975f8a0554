"""Incremental aggregate maintenance (materialized-view deltas).

The reference's sinks append record BATCHES; warehouse consumers then
re-aggregate full tables to refresh dashboards/feature stores. At
100 TB a full re-aggregation per refresh is the dominant cost — the
standard fix is maintaining MERGEABLE per-key aggregate state and
folding in each new batch (the same algebra Spark uses internally for
partial aggregation: every state column is a commutative monoid, so
state(A ∪ B) = state(A) ⊕ state(B) regardless of how the input was
split or ordered).

- ``aggregate_state`` reduces a slice of rows to per-key state:
  row count, exact DECIMAL sums (float sums would make the merged
  result depend on batch boundaries — the exact-sum convention from
  plans/queries.py), min, max per measure. One map-side-combinable
  hash aggregate; the shuffle carries one row per key.
- ``merge_aggregate_states`` folds any number of state slices into
  one: union + re-aggregate with (sum, sum, min, max). Work is
  state-sized (key count), never input-sized — the delta refresh.
  With the state table bucket-laid-out on the keys
  (operators/bucketing.py), the merge exchange disappears entirely.
- ``finalize_aggregates`` derives the presentation columns (avg as
  one double division; sums surfaced as DOUBLE) — derived LAST so
  intermediate state stays exactly mergeable.

The checked query (``incremental_agg_totals``) proves the monoid law
the whole design rests on: state built from two disjoint slices and
merged equals the oracle's single full-table aggregation, column for
column, bit for bit.

Persistence composes with ``sinks/upsert.py``: state rows are
keyed → ``UpsertSink.write_batch(merged_state, batch_id)`` gives the
crash-safe, replay-idempotent storage half; this module is the
algebra half (deliberately storage-free).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_SUM_TYPE = "decimal(28,6)"


def aggregate_state(
    df: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """Per-key mergeable state over one input slice.

    Output: ``keys…, n, sum_<c>, min_<c>, max_<c>`` per value column.
    Sums accumulate as DECIMAL(28,6) so merging is exact and
    batch-split-independent.
    """
    if not keys or not value_cols:
        raise ValueError("aggregate_state needs keys and value_cols")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in value_cols:
        aggs += [
            # Spark widens sum-of-decimal precision; pin the state type
            # so slices and merged states stay union-compatible
            F.sum(F.col(c).cast(STATE_SUM_TYPE)).cast(STATE_SUM_TYPE).alias(f"sum_{c}"),
            # per-column NON-NULL count: SQL AVG divides by this, not by
            # the row count — without it a nullable measure's average is
            # unfixably wrong at finalize time
            F.count(F.col(c)).alias(f"n_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold state slices: ⊕ = (n+n', sum+sum', min∧min', max∨max').

    Union + one hash aggregate — state-sized work. The sum columns
    keep their DECIMAL type through ``sum`` (cast back to the state
    type: Spark widens sum-of-decimal precision, and a drifting state
    schema would break the next merge round).
    """
    if not states:
        raise ValueError("nothing to merge")
    u = reduce(lambda a, b: a.unionByName(b), states)
    value_cols = [c[len("sum_"):] for c in states[0].columns if c.startswith("sum_")]
    aggs = [F.sum("n").cast("bigint").alias("n")]
    for c in value_cols:
        aggs += [
            F.sum(f"sum_{c}").cast(STATE_SUM_TYPE).alias(f"sum_{c}"),
            F.sum(f"n_{c}").cast("bigint").alias(f"n_{c}"),
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.max(f"max_{c}").alias(f"max_{c}"),
        ]
    return u.groupBy(*keys).agg(*aggs)


def finalize_aggregates(state: DataFrame, keys: list[str]) -> DataFrame:
    """Presentation view of the state: exact sums surfaced as DOUBLE,
    avg as ONE double division (identical expression order on any
    engine reading the same state)."""
    value_cols = [c[len("sum_"):] for c in state.columns if c.startswith("sum_")]
    cols = [*keys, F.col("n")]
    for c in value_cols:
        s = F.col(f"sum_{c}").cast("double")
        # SQL AVG semantics: divide by the NON-NULL count, NULL for an
        # all-NULL group (legacy states without n_<c> fall back to the
        # row count — pre-evolution rows were written when the operator
        # ignored NULLs anyway)
        denom = (
            F.col(f"n_{c}") if f"n_{c}" in state.columns else F.col("n")
        ).cast("double")
        cols += [
            s.alias(f"sum_{c}"),
            F.when(denom > 0, s / denom).alias(f"avg_{c}"),
            F.col(f"min_{c}"),
            F.col(f"max_{c}"),
        ]
    return state.select(*cols)
