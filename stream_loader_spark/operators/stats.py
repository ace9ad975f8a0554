"""Grouped second-moment statistics (corr / covariance / stddev).

Widens the §2.9 relational surface with the statistical aggregate
family. Implemented from exact sufficient statistics rather than the
built-in ``corr``/``stddev_samp`` aggregates, for one reason:
cross-engine determinism. Streaming one-pass variance updates
(Welford/Chan) accumulate float error in a partition-order-dependent
way, so Spark's and DuckDB's built-ins differ in the low bits and the
driver's exact-repr float hashing would flap. Instead:

1. ONE hash-aggregate computes n and the exact decimal sums
   Σx, Σy, Σx², Σy², Σxy (inputs cast to DECIMAL(18,6), squares exact
   at scale 12) — map-side combinable, the shuffle carries six numbers
   per group regardless of group size. Same scale story as the
   built-ins: a single pass, constant state.
2. The moments are then derived with an IDENTICAL double-precision
   expression tree in Spark and in the oracle SQL — IEEE 754 ops are
   correctly rounded, so identical inputs + identical op order =
   bit-identical output on both engines.

``tests/test_operators.py::TestGroupedMoments`` separately pins this
operator against Spark's built-in ``corr``/``covar_pop``/``stddev``
within 1e-9, so the built-in surface is exercised too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_moment_stats(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    input_decimal: str = "decimal(18,6)",
) -> DataFrame:
    """Per-group (n, mean, stddev_samp of x and y, covar_pop, corr).

    Deterministic to the bit across engines (see module docstring);
    stddev/corr are NULL for groups with fewer than two rows.

    ``input_decimal`` sizes the exact sufficient-statistic type to the
    DATA, not the worst case: Spark decimals with precision ≤ 18 live
    on the compact-long fast path, and the product precision is
    p₁+p₂+1 — so when the caller knows the inputs are, say, 2-decimal
    currency under 10⁶ (``decimal(8,2)`` → products at ``decimal(17,4)``)
    every multiply and sum stays in long arithmetic instead of heap
    BigDecimal, a measured ~2× on the whole aggregate. The default
    keeps the conservative wide type. Exactness is unaffected either
    way (the sums are exact at any sufficient scale); ANSI mode turns
    an undersized choice into a loud cast error, never a silent
    rounding.
    """
    xd = F.col(x_col).cast(input_decimal)
    yd = F.col(y_col).cast(input_decimal)
    # pairwise-complete rows only: the decimal SUMs skip NULLs while
    # count(1) would count them, silently deflating means and inflating
    # variances (corr requires both-present rows anyway; built-in
    # corr/covar agree on this filtering)
    df = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(yd * yd).cast("double").alias("syy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
    )
    return _moments_from_sums(agg, group_col)


def grouped_moment_stats_cents(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    split_bits: int = 28,
) -> DataFrame:
    """``grouped_moment_stats`` for inputs known to be exact 2-decimal
    values (currency, quantities): identical output, integer-only
    per-row arithmetic.

    Values scale to BIGINT cents (exact: a 2-decimal rational stored
    as double is within 1e-9 of its cent integer, so ``round`` recovers
    it); products of cents are exact bigints ≤ ~1e14. The per-row hot
    path is then pure long arithmetic — no per-row decimal objects,
    which cost a measured ~0.45 s per product-sum on a 600k-row
    aggregate even on Spark's compact-long decimal path (ANSI overflow
    checks on every op). Product sums would overflow bigint, so each
    product splits hi = p div 2^split_bits, lo = p % split_bits-mask;
    Σhi and Σlo are plain bigint sums and recombine EXACTLY in decimal
    on the grouped rows only (groups × 3 values, not rows). The final
    decimal → double conversions divide in decimal first (scale-6
    division is exact for these scale-4/2 rationals), so each double
    is the correctly-rounded value of the exact sum — bit-identical to
    the wide-decimal path and to the DuckDB oracle.

    Bounds (ANSI errors loudly, never silently wrong): cents ≤ ~1e7
    (values < 10^5), so with split_bits=28 Σlo stays in bigint to
    ~6×10^9 input rows per group and Σhi far beyond; past that scale
    use ``grouped_moment_stats`` (decimal sums, any N).
    """
    shift = F.lit(1 << split_bits)
    xc = F.round(F.col(x_col).cast("double") * 100).cast("bigint")
    yc = F.round(F.col(y_col).cast("double") * 100).cast("bigint")
    df = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    prod = df.select(
        group_col,
        xc.alias("xc"),
        yc.alias("yc"),
        (xc * xc).alias("pxx"),
        (yc * yc).alias("pyy"),
        (xc * yc).alias("pxy"),
    )
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("xc").alias("sxc"), F.sum("yc").alias("syc")]
    for p in ("pxx", "pyy", "pxy"):
        aggs.append(F.sum(F.expr(f"{p} div {1 << split_bits}")).alias(f"{p}_hi"))
        aggs.append(F.sum(F.col(p) % shift).alias(f"{p}_lo"))
    agg = prod.groupBy(group_col).agg(*aggs)

    def centsum_to_double(col: str):
        # exact: bigint cents → decimal, scale-6 division (exact for
        # 2-decimal rationals), ONE correctly-rounded double conversion
        return (F.col(col).cast("decimal(38,0)") / 100).cast("double")

    def split_to_double(p: str):
        # recombine hi·2^bits + lo in decimal (exact at any magnitude),
        # then the exact scale-6 division by 10^4 (cents² units)
        total = F.col(f"{p}_hi").cast("decimal(28,0)") * (1 << split_bits) + F.col(
            f"{p}_lo"
        ).cast("decimal(38,0)")
        return (total / 10000).cast("double")

    sums = agg.select(
        group_col,
        "n",
        centsum_to_double("sxc").alias("sx"),
        centsum_to_double("syc").alias("sy"),
        split_to_double("pxx").alias("sxx"),
        split_to_double("pyy").alias("syy"),
        split_to_double("pxy").alias("sxy"),
    )
    return _moments_from_sums(sums, group_col)


def _moments_from_sums(agg: DataFrame, group_col: str) -> DataFrame:
    """Derive (mean/stddev/covar/corr) from exact double sufficient
    sums with the engine-identical expression tree (module docstring);
    shared by the wide-decimal and integer-split aggregation paths."""
    nd = F.col("n").cast("double")
    dx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = nd * F.col("syy") - F.col("sy") * F.col("sy")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    return agg.select(
        group_col,
        "n",
        (F.col("sx") / nd).alias("mean_x"),
        (F.col("sy") / nd).alias("mean_y"),
        # dx/dy > 0 guards: for zero- or near-constant groups the
        # double-precision moment can be 0 or round slightly negative —
        # sqrt then yields inf/NaN with engine-dependent repr. NULL for
        # degenerate groups is deterministic on every engine (oracle SQL
        # carries the identical CASE guards).
        F.when((F.col("n") > 1) & (dx > 0), F.sqrt(dx / (nd * (nd - 1)))).alias("stddev_x"),
        F.when((F.col("n") > 1) & (dy > 0), F.sqrt(dy / (nd * (nd - 1)))).alias("stddev_y"),
        (num / (nd * nd)).alias("covar_pop_xy"),
        F.when((F.col("n") > 1) & (dx > 0) & (dy > 0), num / F.sqrt(dx * dy)).alias("corr_xy"),
    )


def stream_anomaly_stats(
    records: DataFrame,
    group_col: str,
    value_col: str,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-group value-distribution monitor: z-score outlier counts.

    The loader-side quality gauge (is a topic suddenly emitting
    garbage values?): per group, mean/stddev from the same exact
    decimal sufficient sums as ``grouped_moment_stats``, broadcast
    back onto the stream, and every record scored
    ``z = (value - mean) / stddev``. Two aggregate passes and one
    broadcast join — group stats are group-count-sized, so the
    corpus-side join is map-side at any scale.

    Returns (group, n_events, n_outliers, max_abs_z) with
    ``max_abs_z`` snapped to scale-6 decimal (cross-engine float
    convention); degenerate groups (n < 2 or zero variance) report
    zero outliers.
    """
    vd = F.col(value_col).cast("decimal(18,6)")
    stats = records.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vd).cast("double").alias("sx"),
        F.sum(vd * vd).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    dx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    stats = stats.select(
        group_col,
        "n",
        (F.col("sx") / nd).alias("_mean"),
        # dx > 0 guard (same rationale as grouped_moment_stats): for a
        # near-constant group the double round-off can push dx slightly
        # negative, sqrt gives NaN, and NaN compares GREATER than
        # everything in Spark — every record would then count as an
        # outlier, the opposite of the documented zero-variance contract
        F.when((F.col("n") > 1) & (dx > 0), F.sqrt(dx / (nd * (nd - 1)))).alias(
            "_std"
        ),
    )
    # null-safe group join: a NULL group key is a real cohort (often the
    # malformed-record cohort this monitor exists to flag) — an inner
    # equi-join would drop its records from the output entirely
    stats_r = stats.withColumnRenamed(group_col, "_st_g")
    scored = records.join(
        F.broadcast(stats_r), F.col(group_col).eqNullSafe(F.col("_st_g"))
    ).drop("_st_g").withColumn(
        "_z",
        F.when(
            F.col("_std").isNotNull() & (F.col("_std") > 0),
            (F.col(value_col).cast("double") - F.col("_mean")) / F.col("_std"),
        ),
    )
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.abs(F.col("_z")) > z_threshold, 1).otherwise(0)
        ).alias("n_outliers"),
        F.coalesce(F.max(F.abs(F.col("_z"))), F.lit(0.0))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("max_abs_z"),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Median/MAD outlier flags per group — the robust alternative to
    z-scores (``stream_anomaly_stats``) when the metric distribution
    has heavy tails, which corpus length/quality metrics always do
    (mean and stddev are themselves dragged by the outliers they are
    supposed to find).

    Median and MAD are EXACT DISCRETE quantiles (percentile_disc
    semantics) computed with the same RANGE-framed windowed-count
    pattern as ``text.perplexity_buckets`` — no global sort, and for
    integer inputs every derived statistic is an integer, so the
    outlier verdict ``|x − med| > k · MAD`` is bit-reproducible on any
    engine (no float tolerance anywhere).

    Scale shape: two per-group window passes (the cumulative histogram
    over values, then over deviations) — both hash-partition on
    ``group_col`` only, so skew follows the group sizes; the
    per-language/per-source groups this is built for are the same ones
    ``perplexity_buckets`` already windows over. The KLL-sketch swap
    documented there applies here identically if a group outgrows a
    partition.
    """
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_v").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy(group_col)
    base = df.select(id_col, group_col, F.col(value_col).cast("bigint").alias("_v"))
    cum = base.select(
        id_col,
        group_col,
        "_v",
        F.count(F.lit(1)).over(w_cum).alias("_cum"),
        F.count(F.lit(1)).over(w_grp).alias("_tot"),
    )
    # percentile_disc(0.5): smallest value whose cumulative count
    # reaches half the group (2·cum >= tot avoids any division)
    med = cum.select(
        id_col,
        group_col,
        "_v",
        F.min(F.when(2 * F.col("_cum") >= F.col("_tot"), F.col("_v")))
        .over(w_grp)
        .alias("med"),
    ).withColumn("_dev", F.abs(F.col("_v") - F.col("med")))
    w_dcum = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_dev").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = med.select(
        id_col,
        group_col,
        "_v",
        "med",
        "_dev",
        F.count(F.lit(1)).over(w_dcum).alias("_dcum"),
        F.count(F.lit(1)).over(w_grp).alias("_tot"),
    ).select(
        id_col,
        group_col,
        F.col("_v").alias(value_col),
        "med",
        "_dev",
        F.min(F.when(2 * F.col("_dcum") >= F.col("_tot"), F.col("_dev")))
        .over(w_grp)
        .alias("mad"),
    )
    return out.select(
        id_col,
        group_col,
        value_col,
        "med",
        "mad",
        (F.col("_dev") > F.lit(k) * F.col("mad")).alias("is_outlier"),
    )
