"""Skew-handling utilities for joins and aggregations at scale.

A hot key (one topic-partition with 100× the traffic, one document
cluster with millions of near-dups) turns a shuffle join into a single
straggler task. Two standard remedies, exposed as composable helpers:

- ``salted_join``: replicate the small side R times and scatter the
  big side's hot keys across R salt buckets — every (key, salt) bucket
  is ~1/R of the original hot key. Use when the small side fits
  broadcast-per-salt but the big side is skewed.
- AQE's skew-join handling (``spark.sql.adaptive.skewJoin.enabled``,
  on by default in this engine's session) splits oversized partitions
  at runtime — prefer it when statistics exist; use explicit salting
  for deterministic plans or non-AQE environments.

Aggregations need no salting here: all engine aggregations are
hash-based with map-side partial aggregation, so hot group keys reduce
before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across ``salt_buckets``.

    The big side gets a deterministic per-row salt (hash of all its
    columns, cheap and reproducible); the small side is exploded ×R so
    every (key, salt) combination exists. For the supported join types
    the output equals the unsalted join exactly — only the shuffle
    distribution changes. Right/full joins are rejected: replicated
    small-side rows would null-extend once per salt bucket.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "leftsemi", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} joins; {how!r} would "
            "duplicate unmatched small-side rows across salt buckets"
        )
    # the salt must vary across IDENTICAL rows — hashing the row's
    # columns gives duplicate rows (heartbeats, narrow key-only frames)
    # one salt and zero scattering. monotonically_increasing_id is
    # unique per row regardless of content; its value carries no
    # meaning here (any assignment is correct — the small side is
    # replicated to every bucket), so its partition-dependence is fine.
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = big_s.join(small_s, on + ["_salt"], how)
    return joined.drop("_salt")


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Heavy-hitter profile of a prospective join/aggregation key —
    the diagnostic run BEFORE picking a strategy (broadcast vs salted
    vs AQE skew-join): the top-k heaviest keys with their exact row
    counts, corpus share, and skew factor versus a uniform key.

    All-integer output (share in ppm, skew ×100 — both exact integer
    divisions), so the profile is bit-reproducible anywhere. One
    map-side-combinable count aggregate + one scalar-singleton
    broadcast; top-k compiles to TakeOrderedAndProject, never a global
    sort.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "cnt",
            F.expr("(cnt * 1000000L) div _total").alias("share_ppm"),
            F.expr("(cnt * _nkeys * 100L) div _total").alias("skew_x100"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(top_k)
    )
