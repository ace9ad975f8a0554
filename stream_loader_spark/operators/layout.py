"""Data-layout maintenance: small-file compaction and range clustering.

The reference's batcher controls file sizes at WRITE time
(FileRecordBatcher commit triggers, SURVEY §2.6 B2-B5): files roll at
a byte/record/time threshold, so a slow topic-partition still emits
small files. At 100 TB the two layout problems that follow are

- **small files**: listing + task-per-file overhead grows linearly
  with file count; a day of 5-minute micro-batches × 4096 partitions
  is ~1.2M files unless compacted, and
- **no clustering**: point/range predicates on a non-partition column
  (user_id, doc_id) scan every file because min/max footer stats
  overlap everywhere.

Both are fixed by periodic rewrite jobs, not by the streaming writer —
the same separation Iceberg/Delta use (rewrite_data_files /
OPTIMIZE). These helpers are those jobs, DataFrame-native:

- ``compact_small_files``: coalesce a partition's files to a target
  count derived from the actual byte size (scan → write, no shuffle
  when shrinking via coalesce).
- ``cluster_by_range``: range-repartition + sort-within-partitions on
  the cluster key, so each output file owns a disjoint key range and
  parquet row-group pruning (plus Spark's file-level min/max skipping)
  turns key predicates into near-point reads.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 512 * 1024 * 1024


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_small_files(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    file_format: str = "parquet",
) -> int:
    """Rewrite ``src`` into ``dest`` with ≈target-sized files.

    File count comes from the measured input bytes, so the job is
    self-tuning as partitions grow. Uses ``coalesce`` (narrow — no
    shuffle) because compaction only ever shrinks the file count;
    callers that also want clustering use ``cluster_by_range`` which
    pays the shuffle deliberately. Returns the output file count.

    On an object store, run per partition-directory (the unit the
    reference routes by, sinks/manifest.py) so a failed rewrite
    invalidates one partition, not the table.
    """
    n_files = max(1, math.ceil(path_bytes(spark, src) / target_file_bytes))
    df = spark.read.format(file_format).load(src)
    df.coalesce(n_files).write.format(file_format).mode("overwrite").save(dest)
    return n_files


def path_bytes(spark: SparkSession, path: str) -> int:
    """Input size through the Hadoop FileSystem API, so object-store
    URIs (s3a://, hdfs://...) measure correctly — ``os.walk`` on a URI
    silently returns 0, which would coalesce a multi-TB partition into
    ONE task. A genuinely missing path raises (loudly) from the
    FileSystem instead of sizing to zero."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(jpath).getLength())


def cluster_by_range(
    df: DataFrame,
    dest: str,
    cluster_cols: list[str],
    num_files: int,
    file_format: str = "parquet",
) -> None:
    """Write ``df`` as ``num_files`` files, each owning a disjoint
    range of ``cluster_cols``.

    ``repartitionByRange`` samples the key distribution, so skewed
    keys still yield balanced files; ``sortWithinPartitions`` orders
    rows inside each file so parquet row-group min/max stats are tight
    (a range predicate prunes to one or two row groups instead of a
    full-file scan). One shuffle, paid at layout time, amortized over
    every later selective read — the batch analogue of the reference's
    partition-affine file routing (SURVEY §2.3 G2).
    """
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    if num_files < 1:
        raise ValueError(f"num_files must be >= 1, got {num_files}")
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.format(file_format)
        .mode("overwrite")
        .save(dest)
    )


def file_key_ranges(dest: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per data file, from parquet footer
    stats — the evidence that clustering produced disjoint ranges."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(dest):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, f))
            idx = md.schema.names.index(column)
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                out.append((lo, hi))
    return out


# ---------------------------------------------------------------------------
# Multi-dimensional (Z-order) clustering
# ---------------------------------------------------------------------------
#
# ``cluster_by_range`` above prunes on ONE key; scans that filter on any
# of several columns need MULTI-dimensional clustering (Delta's OPTIMIZE
# ZORDER / Iceberg's sort-order rewrite). ``zorder_value`` maps each row
# to a Morton code: every clustering column is bucketed to ``2**bits``
# equi-width integer buckets between the column's exact min/max and the
# bucket bits are interleaved into one BIGINT. All arithmetic is exact
# integer ops (floor division, shifts), so an independent SQL engine
# reproduces the value bit-for-bit — the checked-query contract
# (plans/queries.py::zorder_layout_orders).
#
# Scale design: the bounds aggregate is one tiny job (2 numbers per
# column) broadcast back as a scalar join — never collected to the
# driver inside the plan. ``repartitionByRange`` samples the Z-value to
# pick balanced boundaries (the same range-exchange machinery
# ``cluster_by_range`` uses); the sort is within-partition only — no
# global sort barrier. Production systems bucket by sampled QUANTILES
# of each column instead of exact min/max (equi-depth beats equi-width
# under skew); equi-width is used here because it is exactly
# reproducible by the SQL oracle — swap ``_bucket_expr`` for an
# approx-percentile lookup to get the equi-depth variant, the
# interleave and writer are unchanged.

DEFAULT_ZORDER_BITS = 8


def _as_bigint(col: Column) -> Column:
    """Clustering dimensions must be exact integers on every engine:
    dates/timestamps go through epoch DAYS (integer on both Spark and
    ANSI SQL engines; epoch seconds of a timestamp are float-typed in
    some engines)."""
    return col.cast("bigint")


def _bucket_expr(col: Column, mn: Column, mx: Column, n_buckets: int) -> Column:
    """Equi-width bucket in [0, n_buckets): FLOOR((x-mn)*n / (mx-mn+1)).

    Arithmetic runs in DOUBLE from the first subtraction: an int64
    pipeline overflows on wide domains (64-bit snowflake/hash ids make
    ``x - mn`` or the ×n exceed bigint — a hard ARITHMETIC_OVERFLOW
    under ANSI mode, silent wraparound without it), while doubles are
    exact for |values| < 2**53 (the documented precision envelope) and
    merely lose low bits beyond — identical IEEE ops on every engine,
    so the oracle stays bit-equal where it is checkable. FLOOR (not a
    bigint cast) converts: Spark's cast truncates but DuckDB's ROUNDS,
    so a cast here would flap between engines. The ``least`` clamp
    guards the one double-rounding edge (quotient rounding up to
    exactly n at extreme magnitudes); single-value domains land in 0.
    """
    x = col.cast("double")
    lo = mn.cast("double")
    span = mx.cast("double") - lo + F.lit(1.0)
    return F.least(
        F.floor((x - lo) * F.lit(float(n_buckets)) / span),
        F.lit(n_buckets - 1).cast("bigint"),
    )


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_ZORDER_BITS,
    out_col: str = "zvalue",
) -> DataFrame:
    """Add a Morton (Z-order) code over ``cols`` as ``out_col``.

    Column i's bucket bit b lands at interleaved position
    ``b * len(cols) + i`` — the standard bit-interleave, expressed as a
    sum of shifted bits so it compiles to pure integer expressions
    (whole-stage codegen; no UDF). ``bits * len(cols)`` must fit a
    signed 64-bit value.
    """
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(
            f"{bits} bits x {len(cols)} columns exceeds the 62-bit Z-value budget"
        )
    n_buckets = 1 << bits
    bounds = df.agg(
        *[F.min(_as_bigint(F.col(c))).alias(f"_mn_{i}") for i, c in enumerate(cols)],
        *[F.max(_as_bigint(F.col(c))).alias(f"_mx_{i}") for i, c in enumerate(cols)],
    )
    # scalar broadcast join: bounds is ONE row regardless of input size
    with_bounds = df.crossJoin(F.broadcast(bounds))
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        bucket = _bucket_expr(
            _as_bigint(F.col(c)), F.col(f"_mn_{i}"), F.col(f"_mx_{i}"), n_buckets
        )
        for b in range(bits):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (b * len(cols) + i)).cast("bigint")
    return with_bounds.withColumn(out_col, z).drop(
        *[f"_mn_{i}" for i in range(len(cols))],
        *[f"_mx_{i}" for i in range(len(cols))],
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = DEFAULT_ZORDER_BITS,
    n_files: int = 16,
) -> None:
    """OPTIMIZE ZORDER-style rewrite: cluster ``df`` into ``n_files``
    range-disjoint Z-value runs and write parquet.

    Files carry disjoint Z-ranges (range exchange) and are sorted
    inside (within-partition sort, no global barrier), so every file's
    parquet min/max stats cover a tight region of every clustering
    column — the property that makes multi-column filter pruning work.
    The Z-value itself is persisted so maintenance jobs can detect
    clustering drift without recomputing bounds.
    """
    zdf = zorder_value(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, "zvalue")
        .sortWithinPartitions("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )


def shard_by_budget(
    df: DataFrame,
    size_col: str,
    id_col: str = "doc_id",
    budget: int = 1 << 28,
    n_slices: int = 16,
    salt: str = "",
) -> DataFrame:
    """Deterministic greedy packing of rows into size-budgeted output
    shards — the "write the corpus as ~256 MB training files" layout
    step, computed as a metadata pass (no byte movement).

    Rows are first hashed into ``n_slices`` independent slices (md5 of
    the id, same arithmetic as ``sampling.sample_bucket``), then packed
    SEQUENTIALLY within their slice in md5 order: a running size cumsum
    opens a new shard each time the budget boundary is crossed. A row
    that straddles the boundary belongs to the shard it STARTS in, so
    shards may overrun the budget by at most one row — the classic
    streaming first-fit, chosen because it is a pure window expression
    (exactly reproducible in any engine, and in the oracle SQL).

    Scale shape: ONE shuffle (hash partition by slice + in-partition
    sort by the md5 order key); each slice's cumsum is independent, so
    parallelism is ``n_slices`` regardless of corpus size — size
    n_slices to the cluster, not the data. No global sort, no driver
    state. Output adds ``slice``, ``shard`` (globally unique:
    slice * 2^32 + local index), and ``start_off`` (the row's first
    byte offset inside its shard).
    """
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    sliced = df.withColumn(
        "slice", F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % n_slices
    ).withColumn("_ord", h)
    w = Window.partitionBy("slice").orderBy("_ord", id_col)
    cum = F.sum(F.col(size_col).cast("bigint")).over(w)
    start = (cum - F.col(size_col).cast("bigint")).alias("_start")
    out = (
        sliced.withColumn("_start", start)
        .withColumn("_local", F.expr(f"_start div {budget}L"))
        .withColumn(
            "shard",
            (F.col("slice").cast("bigint") * F.lit(1 << 32) + F.col("_local")).cast(
                "bigint"
            ),
        )
        .withColumn("start_off", F.col("_start") % budget)
    )
    return out.drop("_ord", "_start", "_local")
