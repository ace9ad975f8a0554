"""Blocked fuzzy-matching join (entity resolution over noisy keys).

The reference stream-loader has no fuzzy matching — this belongs to the
LLM-training-data surface (entity resolution across scraped catalogs,
near-identical author/title/product strings) alongside the dedup family
in :mod:`stream_loader_spark.operators.dedup`.

Design (standard ER, Spark-first):

* **Blocking**: candidate pairs are generated only within caller-chosen
  blocking keys (brand, country code, zip prefix, …). The quadratic is
  bounded per block — the knob a 100 TB run tunes is the blocking key's
  selectivity, exactly like the LSH band width in minhash_lsh_pairs.
* **Distinct-value compression**: edit distances are computed once per
  distinct ``(block, value)`` PAIR, not per row pair — corpora with
  heavy value repetition (catalog names, user agents) pay the O(k²)
  comparison cost on k = distinct values, and the row-level expansion
  is two hash joins back on ``(block, value)``.
* **Lossless length-band pruning**: ``levenshtein(a, b) >= |len(a) -
  len(b)|``, so pairs outside the band are skipped before the O(mn)
  distance kernel runs. No recall loss.
* **JVM-side distance**: ``F.levenshtein`` is a built-in Catalyst
  expression — the whole plan stays in whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    value_col: str,
    block_cols: list[str],
    max_distance: int,
) -> DataFrame:
    """All row pairs within a block whose ``value_col`` strings are
    within ``max_distance`` Levenshtein edits.

    Returns ``(id_a, id_b, value_a, value_b, lev_dist)``. Every
    unordered row pair appears exactly once: pairs with distinct values
    are oriented ``value_a < value_b``; pairs sharing one value are
    oriented ``id_a < id_b``.
    """
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    missing = [c for c in [id_col, value_col, *block_cols] if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in input: {missing}")

    rows = df.select(
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("__val"),
        *[F.col(c) for c in block_cols],
    )
    # the distinct value table feeds BOTH sides of the self-join, and a
    # broadcast boundary sits between them — cross-subtree ReusedExchange
    # does not fire there, so without the pin the corpus-wide distinct
    # pipeline (scan + exchange + aggregate) runs twice. The block is
    # value-vocabulary scale, not corpus scale.
    vals = (
        rows.select(*block_cols, "__val").distinct().localCheckpoint(eager=True)
    )

    a = vals.select(
        *[F.col(c).alias(f"__ba_{c}") for c in block_cols],
        F.col("__val").alias("value_a"),
    )
    b = vals.select(
        *[F.col(c).alias(f"__bb_{c}") for c in block_cols],
        F.col("__val").alias("value_b"),
    )
    block_eq = [F.col(f"__ba_{c}") == F.col(f"__bb_{c}") for c in block_cols]
    # value_a <= value_b de-duplicates unordered value pairs; the length
    # band is the lossless lower-bound prune for the distance kernel
    cand = (
        a.join(b, on=block_eq, how="inner")
        .where(F.col("value_a") <= F.col("value_b"))
        .where(
            F.abs(F.length("value_a") - F.length("value_b")) <= F.lit(max_distance)
        )
        .withColumn(
            "lev_dist", F.levenshtein(F.col("value_a"), F.col("value_b"), max_distance)
        )
        .where(F.col("lev_dist") >= 0)
        .select(
            *[F.col(f"__ba_{c}").alias(c) for c in block_cols],
            "value_a",
            "value_b",
            "lev_dist",
        )
    )

    left = rows.select(
        *[F.col(c) for c in block_cols],
        F.col("__id").alias("id_a"),
        F.col("__val").alias("value_a"),
    )
    right = rows.select(
        *[F.col(c).alias(f"__rb_{c}") for c in block_cols],
        F.col("__id").alias("id_b"),
        F.col("__val").alias("__rval"),
    )
    out = (
        cand.join(left, on=[*block_cols, "value_a"], how="inner")
        .join(
            right,
            on=[
                *[F.col(c) == F.col(f"__rb_{c}") for c in block_cols],
                F.col("value_b") == F.col("__rval"),
            ],
            how="inner",
        )
        # distinct-value pairs appear once per row pair already; the
        # shared-value diagonal needs the id order to drop self/mirror
        .where(
            (F.col("value_a") < F.col("value_b"))
            | (F.col("id_a") < F.col("id_b"))
        )
    )
    return out.select("id_a", "id_b", "value_a", "value_b", "lev_dist")


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_value: str,
    right_value: str,
    block_cols: list[str],
    max_distance: int,
    compress: bool = True,
) -> DataFrame:
    """Two-table fuzzy equi-join: rows of ``left`` matched to rows of
    ``right`` sharing a block whose value strings are within
    ``max_distance`` Levenshtein edits.

    Returns ``(id_a, id_b, value_a, value_b, lev_dist)`` — one row per
    matching (left row, right row) combination. Same plan shape as
    :func:`blocked_fuzzy_pairs`: distances once per distinct value pair,
    row expansion via hash joins, lossless length-band prune.

    ``compress=True`` (the default) pays two distincts + two expansion
    joins to run the distance kernel once per distinct value pair — the
    right trade when values repeat heavily (catalog names, user
    agents). With near-unique values (ids, personal names) the
    compression buys nothing; ``compress=False`` joins the row sets
    directly, one shuffle join + one distance pass.
    """
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    for df, cols in ((left, [left_id, left_value]), (right, [right_id, right_value])):
        missing = [c for c in [*cols, *block_cols] if c not in df.columns]
        if missing:
            raise ValueError(f"columns not in input: {missing}")

    lrows = left.select(
        F.col(left_id).alias("id_a"),
        F.col(left_value).alias("value_a"),
        *[F.col(c) for c in block_cols],
    )
    rrows = right.select(
        F.col(right_id).alias("id_b"),
        F.col(right_value).alias("__rval"),
        *[F.col(c).alias(f"__rb_{c}") for c in block_cols],
    )
    if not compress:
        # pin the distance kernel's width: a small left table can scan
        # as one split (fixture scale) or a few fat ones, serializing
        # the O(pairs · m·n) kernel behind the broadcast join — the
        # 15 k-row shuffle is far cheaper than a single-core DP pass.
        # At production scale the scan is already wide and this is a
        # cheap rebalance of the probe side.
        par = lrows.sparkSession.sparkContext.defaultParallelism
        lwide = lrows.repartition(par, *[F.col(c) for c in block_cols], F.col("id_a"))
        # threshold form: the DP early-exits past max_distance (returns
        # -1), and filtered rows keep their true distance
        lev = F.levenshtein(F.col("value_a"), F.col("__rval"), max_distance)
        return (
            lwide.join(
                rrows,
                on=[F.col(c) == F.col(f"__rb_{c}") for c in block_cols],
                how="inner",
            )
            .where(
                F.abs(F.length("value_a") - F.length("__rval"))
                <= F.lit(max_distance)
            )
            .withColumn("lev_dist", lev)
            .where(F.col("lev_dist") >= 0)
            .select(
                "id_a", "id_b", "value_a",
                F.col("__rval").alias("value_b"), "lev_dist",
            )
        )
    lvals = lrows.select(*block_cols, "value_a").distinct()
    rvals = rrows.select(
        *[F.col(f"__rb_{c}") for c in block_cols], F.col("__rval").alias("value_b")
    ).distinct()
    cand = (
        lvals.join(
            rvals,
            on=[F.col(c) == F.col(f"__rb_{c}") for c in block_cols],
            how="inner",
        )
        .where(
            F.abs(F.length("value_a") - F.length("value_b")) <= F.lit(max_distance)
        )
        .withColumn(
            "lev_dist", F.levenshtein(F.col("value_a"), F.col("value_b"), max_distance)
        )
        .where(F.col("lev_dist") >= 0)
        .select(*block_cols, "value_a", "value_b", "lev_dist")
    )
    return (
        cand.join(lrows, on=[*block_cols, "value_a"], how="inner")
        .join(
            rrows,
            on=[
                *[F.col(c) == F.col(f"__rb_{c}") for c in block_cols],
                F.col("value_b") == F.col("__rval"),
            ],
            how="inner",
        )
        .select("id_a", "id_b", "value_a", "value_b", "lev_dist")
    )
