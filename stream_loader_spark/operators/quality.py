"""Data-quality validation: expectation reports and constraint routing.

Loaders sit at the trust boundary: whatever passes them becomes
training data / warehouse fact. The reference enforces per-column
TYPE constraints at encode time (macro `@MaxLength`/`@DecimalEncoding`
annotations — functions/encoding.py mirrors those); this module adds
the VALUE-level checks production pipelines bolt on top
(Great-Expectations/dbt-test shape), Spark-first:

- ``quality_report``: one pass over the table → one row per declared
  expectation with measured violation counts. Every check compiles to
  a conditional SUM inside a single hash aggregate — adding checks
  adds columns to one map-side-combinable pass, never extra scans.
- ``constraint_split``: the row-routing form — rows violating any
  expectation go to the quarantine side with a reason string, clean
  rows pass through unchanged. Same one-parse two-projection shape as
  the corrupt-payload dead-letter router (operators/projection.py),
  generalized from "parses at all" to arbitrary column predicates.

Expectations are data (name → Column predicate that is TRUE when the
row is acceptable), so a deployment can declare them next to the
config (app.py) rather than in code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> Column:
    """NULLs are acceptable here (pair with not_null to forbid them) —
    each expectation measures ONE failure mode so reports stay
    attributable."""
    c = F.col(col)
    return c.isNull() | ((c >= F.lit(lo)) & (c <= F.lit(hi)))


def matches(col: str, pattern: str) -> Column:
    c = F.col(col)
    return c.isNull() | c.rlike(pattern)


def one_of(col: str, values: list) -> Column:
    c = F.col(col)
    return c.isNull() | c.isin(values)


def _check_names(expectations: dict[str, Column]) -> None:
    """Check names reach a selectExpr string (stack literals), so they
    are restricted to STRICT identifier characters. '-' or '.' would
    not just fail — `_v_a-0` parses as the arithmetic `_v_a - 0` and
    silently reads another check's counter; a quote would splice into
    the expression. Both must raise here, loudly."""
    import re

    bad = [n for n in expectations if not re.fullmatch(r"[A-Za-z0-9_]+", n)]
    if bad:
        raise ValueError(f"expectation names must be identifier-like, got {bad}")


def quality_report(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """One row per expectation: (check, n_rows, n_violations, pass_rate).

    A NULL predicate result counts as a violation — an expectation
    that cannot be evaluated must not silently pass (the same
    absence-is-not-validity stance as the dead-letter router).
    """
    if not expectations:
        raise ValueError("no expectations declared")
    _check_names(expectations)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in expectations.items():
        aggs.append(
            F.sum(F.when(pred.eqNullSafe(F.lit(True)), 0).otherwise(1)).alias(f"_v_{name}")
        )
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per check: stack() is a
    # generate over ONE row — free at any scale
    pairs = ", ".join(f"'{name}', _v_{name}" for name in expectations)
    return wide.selectExpr(
        "n_rows", f"stack({len(expectations)}, {pairs}) AS (check, n_violations)"
    ).select(
        "check",
        "n_rows",
        # SUM over zero rows is NULL: an empty micro-batch (routine in
        # streaming) must report 0 violations and a vacuous pass, not
        # NULL metric rows that fail gates like 'n_violations == 0'
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("bigint").alias("n_violations"),
        F.when(F.col("n_rows") == 0, F.lit(1.0))
        .otherwise(
            (F.col("n_rows") - F.coalesce(F.col("n_violations"), F.lit(0))).cast(
                "double"
            )
            / F.col("n_rows").cast("double")
        )
        .alias("pass_rate"),
    )


def constraint_split(
    df: DataFrame, expectations: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) — quarantined rows carry ``_violations``,
    the comma-joined names of every failed expectation (a row can fail
    several; listing all beats re-quarantining one failure at a time).

    One annotated projection feeds two filtered branches: under
    foreachBatch, persist the annotated frame and write both sides —
    the same double-sink discipline as formatted_records_split.
    """
    if not expectations:
        raise ValueError("no expectations declared")
    failed = F.concat_ws(
        ",",
        *[
            F.when(~pred.eqNullSafe(F.lit(True)), F.lit(name))
            for name, pred in expectations.items()
        ],
    )
    annotated = df.withColumn("_violations", failed)
    valid = annotated.where(F.col("_violations") == "").drop("_violations")
    quarantined = annotated.where(F.col("_violations") != "")
    return valid, quarantined
