"""Binned range join — the scalable form of interval/range joins.

Spark executes a raw ``left.t BETWEEN right.start AND right.end`` join
as a nested loop (per-key cross product at best). The standard scalable
rewrite bins time into fixed-width buckets: each interval is exploded
into the buckets it touches, point rows map to exactly one bucket, and
the join becomes an equi-join on (key, bucket) followed by the exact
range filter. Cost: |intervals| × (span/bin + 1) exploded rows and one
hash shuffle — linear, AQE-friendly, and skew-tolerant, never a cross
product. (Same idea as interval bucketing in time-series stores.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_time: str,
    interval_start: str,
    interval_end: str,
    bin_width_sec: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval (same key) containing them:
    ``interval_start <= point_time < interval_end``.

    Columns from both sides are preserved (names must not collide apart
    from ``key``).

    Only ``how='inner'`` is supported: the exact range predicate must
    run as a post-join filter (the bin equi-join is a superset), and a
    post-filter silently degrades any outer join to inner semantics —
    an unmatched left row's NULL interval columns fail the predicate
    and vanish. Callers needing left semantics should anti-join the
    matched points back against the full point set explicitly, with an
    id column that defines row identity.
    """
    if how != "inner":
        raise ValueError(
            f"binned_range_join supports how='inner' only (got {how!r}): "
            "the exact-range post-filter would silently drop unmatched "
            "outer rows"
        )
    p_bin = (F.unix_timestamp(F.col(point_time)) / bin_width_sec).cast("long")
    points_b = points.withColumn("_bin", p_bin)

    start_bin = (F.unix_timestamp(F.col(interval_start)) / bin_width_sec).cast("long")
    end_bin = (F.unix_timestamp(F.col(interval_end)) / bin_width_sec).cast("long")
    intervals_b = intervals.withColumn(
        "_bin", F.explode(F.sequence(start_bin, end_bin))
    )

    joined = points_b.join(intervals_b, [key, "_bin"], how).where(
        (F.col(point_time) >= F.col(interval_start))
        & (F.col(point_time) < F.col(interval_end))
    )
    return joined.drop("_bin")
