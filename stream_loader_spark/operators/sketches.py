"""Mergeable sketch columns: HLL distinct unions, Theta set algebra.

``approx_distinct_users`` (plans/queries.py) answers one fixed
grouping. At 100 TB the production pattern is different: store a
SKETCH per (key, day) — kilobytes — and answer arbitrary date-range /
key-rollup questions later by MERGING sketches, never rescanning the
raw corpus. Spark 4 ships the Apache DataSketches family as native
aggregates; these operators wrap the two shapes a loader needs:

- ``daily_hll_sketches`` + ``hll_union_estimate``: the materialized
  daily layer and the range rollup. Union is associative and
  duplicate-insensitive, so any partition of the input (days, shards,
  restated batches) merges to an estimate within the same error
  bound — matview.py's monoid property, for a non-linear aggregate.
  (Not bit-identical across DIFFERENT splits: sparse→dense
  representation transitions shift low bits; the contract is the
  bound, which is why checked queries emit tolerance booleans.)
- ``theta_period_overlap``: Theta sketches additionally support
  INTERSECTION, answering "distinct users active in BOTH periods"
  (retention overlap) without a per-user self-join — at corpus scale
  the exact form shuffles every user id twice, the sketch form ships
  two kilobyte-sized summaries.

Estimates can't hash-match an exact engine, so checked queries emit
the within-tolerance contract (|approx − exact| / exact bounded,
exact computed alongside) — the same scheme the HLL/GK rows already
use. Sketch BYTES are engine-specific and stay internal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_hll_sketches(
    records: DataFrame,
    key_col: str,
    date_col,
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """The stored layer: one HLL sketch per (key, day).

    lg_k=14 (16 Ki registers, ~0.8% rsd) is the size/accuracy point
    where the daily row stays a few KB while month-scale unions hold
    under 2% error. The sketch input must be int/string/binary
    (DataSketches contract) — pass a cast Column for other types.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return records.groupBy(F.col(key_col), date_col).agg(
        F.hll_sketch_agg(v, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_union_estimate(sketches: DataFrame, key_col: str) -> DataFrame:
    """Range rollup over the stored layer: union per key + estimate.

    Work is sketch-count-sized — the raw corpus is never touched, the
    property that makes arbitrary-range distinct counts affordable."""
    return sketches.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_sketches"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_approx"),
    )


def daily_kll_sketches(
    records: DataFrame,
    key_col: str,
    date_col,
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Mergeable quantile layer: one KLL(double) sketch per (key, day).

    Unlike ``percentile_approx`` (GK — a per-query aggregate), KLL
    sketches are storable and mergeable, so the daily layer answers
    any later date-range quantile question without rescanning
    (k=200 ≈ ±1.65% rank error at 99% confidence)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return records.groupBy(F.col(key_col), date_col).agg(
        F.kll_sketch_agg_double(v.cast("double"), F.lit(k)).alias("sketch")
    )


def kll_merged_quantiles(
    sketches: DataFrame, key_col: str, quantiles: list[float]
) -> DataFrame:
    """Range rollup: merge per key, read quantiles + the EXACT n the
    sketch tracked (stream length is exact in KLL — a free integrity
    check against the raw count)."""
    merged = sketches.groupBy(key_col).agg(
        F.kll_merge_agg_double("sketch").alias("_m")
    )
    labels = [_quantile_label(q) for q in quantiles]
    dupes = {l for l in labels if labels.count(l) > 1}
    if dupes:
        raise ValueError(f"quantiles collide on column label(s) {sorted(dupes)}")
    return merged.select(
        key_col,
        F.kll_sketch_get_n_double("_m").alias("n_values"),
        *[
            F.kll_sketch_get_quantile_double("_m", F.lit(q)).alias(label)
            for q, label in zip(quantiles, labels)
        ],
    )


def _quantile_label(q: float) -> str:
    """q0.5 → 'q50', q0.999 → 'q99_9'. A bare int(q*100) truncates
    float error (0.29 → 'q28') and collides distinct quantiles
    (0.99/0.999 both → 'q99')."""
    pct = round(q * 100, 6)
    if pct == int(pct):
        return f"q{int(pct)}"
    return "q" + str(pct).replace(".", "_")


def theta_period_overlap(
    records: DataFrame,
    key_col: str,
    date_col,
    value_col: str,
    split_date,
) -> DataFrame:
    """Distinct values present in BOTH periods (≤ split vs > split),
    per key: two theta aggregates over one scan, one intersection per
    key. Returns (key, overlap_approx).

    The exact equivalent needs every (key, value) pair shuffled with
    both-side flags; this ships two sketches per key instead — the
    100 TB shape for retention/overlap questions.
    """
    d = date_col if not isinstance(date_col, str) else F.col(date_col)
    sides = records.groupBy(key_col).agg(
        F.theta_sketch_agg(F.when(d <= split_date, F.col(value_col))).alias("sk_a"),
        F.theta_sketch_agg(F.when(d > split_date, F.col(value_col))).alias("sk_b"),
    )
    return sides.select(
        key_col,
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
        ).alias("overlap_approx"),
    )
