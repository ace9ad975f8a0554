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

from pyspark.sql import DataFrame, SparkSession
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
    n_files = max(1, math.ceil(dir_bytes(src) / target_file_bytes))
    df = spark.read.format(file_format).load(src)
    df.coalesce(n_files).write.format(file_format).mode("overwrite").save(dest)
    return n_files


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
