"""Time-series regularization: calendar gap filling + forward fill.

Loaded event streams are sparse — a (key, day) grid with holes where
nothing happened — but downstream consumers (rollup dashboards,
feature windows, anomaly baselines) need a DENSE regular series.
This is the densification operator warehouses write as
``generate_series + outer join + last_value IGNORE NULLS``:

1. per key, ONE aggregate finds the observed [min_day, max_day] span;
2. ``sequence()`` + ``explode`` generates the key's calendar — a
   narrow generate whose output is exactly the result size, no join
   against a global calendar dimension and no shuffle beyond the
   grid's own;
3. observed values attach by (key, day) equi-join;
4. holes fill either with a constant (``fill="zero"``) or the last
   observed value (``fill="ffill"`` — ``last(ignorenulls=True)`` over
   a per-key date-ordered window; partitioned on the key, so window
   parallelism grows with key cardinality).

Scale: the generated grid is keys × days — the OUTPUT size; every
step is proportional to it. The span aggregate is map-side
combinable; the only wide operations are the grid join and the
per-key window sort, both on the same key the result is consumed by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    df: DataFrame,
    key_cols: list[str],
    date_col: str,
    value_cols: list[str],
    fill: str = "zero",
) -> DataFrame:
    """Dense per-key daily series over each key's observed span.

    ``df`` must hold at most one row per (key, day) — pre-aggregate
    first (the deliberate contract: silently re-aggregating here would
    hide a caller's grain mistake). Added rows carry ``filled=true``.
    """
    if fill not in ("zero", "ffill"):
        raise ValueError(f"fill must be 'zero' or 'ffill', got {fill!r}")
    d = F.col(date_col)
    spans = df.groupBy(*key_cols).agg(
        F.min(d).alias("_d0"), F.max(d).alias("_d1")
    )
    calendar = spans.select(
        *key_cols,
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias(date_col),
    )
    joined = calendar.join(
        df.withColumn("_observed", F.lit(True)), [*key_cols, date_col], "left"
    )
    out_cols = [*key_cols, date_col]
    if fill == "zero":
        # fill ONLY generated gap rows: an OBSERVED row whose measure is
        # NULL was loaded that way and must stay NULL (zeroing it while
        # flagging filled=false would make 'observed NULL' and
        # 'observed 0' indistinguishable downstream)
        filled = joined.select(
            *out_cols,
            *[
                F.when(F.col("_observed").isNull(), F.lit(0))
                .otherwise(F.col(c))
                .alias(c)
                for c in value_cols
            ],
            F.col("_observed").isNull().alias("filled"),
        )
    else:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(date_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = joined.select(
            *out_cols,
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                for c in value_cols
            ],
            F.col("_observed").isNull().alias("filled"),
        )
    return filled
