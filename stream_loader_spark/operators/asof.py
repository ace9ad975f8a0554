"""As-of (temporal) join — a custom operator Spark SQL lacks natively.

``asof_join(left, right)`` attaches, to every left row, the latest
right row with the same key and time ≤ the left row's time. The naive
formulation (non-equi range join) degenerates to a per-key cross
product; the scalable formulation used here is the classic
union-and-carry trick:

1. tag both inputs and union them into one stream of (key, time, tag);
2. sort within key by (time, tag) — right rows sort before left rows at
   equal times so same-instant matches are visible;
3. carry the most recent right payload forward with
   ``last(..., ignorenulls=True)`` over an unbounded-preceding window;
4. keep only left rows.

Cost is one shuffle by key + one sort — the same shape as a window
aggregation, linear in input size, skew-tolerant via AQE. With a
``tie_break`` column the right side is first reduced to one row per
(key, time) so the result is deterministic, matching DuckDB's ASOF
JOIN oracle; the carried payload is a single struct, so all payload
columns always come from the SAME right row (including its NULLs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join: latest ``right`` row per key with
    ``right_time <= left_time``; unmatched left rows keep NULL payloads.

    ``tie_break`` names a unique right column used to pick ONE right row
    when several share (key, right_time); pass ``None`` ONLY when the
    right side is already unique per (key, time) — otherwise the carried
    payload depends on partitioning order and results are
    nondeterministic.
    """
    # a NULL right_time sorts FIRST under the ascending carry window, so
    # its payload would be carried onto every left row as a bogus match;
    # ASOF semantics (and the DuckDB oracle, where NULL <= t is never
    # true) say such rows can match nothing — drop them up front
    right = right.where(F.col(right_time).isNotNull())
    # The tie-break is folded into the CARRY sort rather than a separate
    # per-(key, time) dedup window: with the union ordered by
    # (_t, _is_left, _tb), the max-tie_break right row is the LAST one
    # carried at any equal time — the same row the row_number dedup
    # picked — for one fewer exchange and sort (the dedup window
    # clustered on (key, time) and could not share the carry window's
    # hash(key) exchange; measured as a whole extra stage). NULL
    # tie_breaks sort first ascending, exactly mirroring the old
    # desc-nulls-last pick.

    left_cols = left.columns
    # the payload is carried as ONE struct: per-column carries would mix
    # fields from different right rows and resurrect legitimately-NULL
    # payload values from older rows
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload_cols) + ">"
    )
    tb_type = right.schema[tie_break].dataType if tie_break is not None else None
    tagged_left = left.select(
        F.col(key).alias("_key"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_cols],
        null_struct.alias("_r"),
        *([F.lit(None).cast(tb_type).alias("_tb")] if tie_break is not None else []),
    )
    tagged_right = right.select(
        F.col(key).alias("_key"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        payload_struct.alias("_r"),
        *([F.col(tie_break).alias("_tb")] if tie_break is not None else []),
    )
    unioned = tagged_left.unionByName(tagged_right)

    # right rows (_is_left=0) sort before left rows at equal _t, so an
    # exactly-simultaneous right row is eligible for the left row; at
    # equal (key, time) among right rows the max tie_break sorts last
    # and wins the carry
    order_cols = ["_t", "_is_left"] + (["_tb"] if tie_break is not None else [])
    w = (
        Window.partitionBy("_key")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select("*", F.last("_r", ignorenulls=True).over(w).alias("_asof"))
    return carried.where(F.col("_is_left") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"_asof.{c}").alias(c) for c in payload_cols],
    )
