"""Deterministic dataset sampling (training-data pipeline surface).

Random sampling is the standard way to carve eval/ablation subsets out
of a 100 TB corpus, but ``rand()`` samples are not reproducible across
reruns, engines, or partitionings. Hash-bucket sampling is: a row's
bucket is a pure function of its id (two md5 nibbles → 0..255), so the
sample is stable under retries, engine-agnostic (md5 is everywhere),
and composable (disjoint bucket ranges give disjoint splits). No
shuffle — the filter evaluates inside the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 256  # two md5 hex nibbles


def sample_bucket(id_col: Column, salt: str = "") -> Column:
    """Bucket 0..255 from the first two md5 nibbles of (salt + id) —
    identical arithmetic is expressible in any SQL engine."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def deterministic_sample(
    df: DataFrame,
    keep_buckets: int,
    id_col: str = "doc_id",
    salt: str = "",
    bucket_col: str = "sample_bucket",
) -> DataFrame:
    """Keep rows whose bucket < ``keep_buckets`` (rate ≈ keep/256).

    Different ``salt`` values draw independent samples; bucket ranges
    [0, a) and [a, b) from the same salt never overlap — use that for
    train/eval splits that must stay disjoint forever.
    """
    out = df.withColumn(bucket_col, sample_bucket(F.col(id_col), salt))
    return out.where(F.col(bucket_col) < keep_buckets)
