"""Idempotence keys: dedup tokens and deterministic file names.

Two tricks make replayed batches no-ops, re-expressed from the
reference's design (not its code):

1. **Insert dedup token** — a stable string derived from the batch's
   stream ranges; a storage that remembers tokens (ClickHouse
   ``insert_deduplication_token``, or our manifest) drops replays.
   Reference shape: ``topic:partition:start:end;...``
   (clickhouse/ClickHouseFileStorage.scala:86-88).

2. **Deterministic file names** — output file names derived from a hash
   of the ranges (+ output partition value), so re-running the same
   batch overwrites the same paths instead of duplicating data.
   Reference: UUID from MurmurHash3 of ranges
   (sink/file/TimePartitioningFilePathFormatter.scala:39-47).

We use SHA-256 (stdlib, stable across processes/languages) rather than
the reference's MurmurHash3 — the property that matters is determinism,
not the hash function.
"""

from __future__ import annotations

import hashlib
import uuid
from typing import Sequence

from stream_loader_spark.model.range import StreamRange, ranges_signature


def dedup_token(ranges: Sequence[StreamRange]) -> str:
    """Stable token identifying exactly this set of consumed ranges."""
    return ranges_signature(ranges)


def deterministic_uuid(*parts: str) -> str:
    """A stable UUID from arbitrary string parts (SHA-256 → UUIDv8-like)."""
    digest = hashlib.sha256("\x1f".join(parts).encode("utf-8")).digest()
    return str(uuid.UUID(bytes=digest[:16]))


def batch_file_name(
    ranges: Sequence[StreamRange],
    partition_value: str | None = None,
    extension: str = "parquet",
) -> str:
    """Deterministic output file name for a batch (+ output partition).

    Re-running the same batch yields the same name — the core
    idempotent-overwrite trick for file sinks.
    """
    parts = [ranges_signature(ranges)]
    if partition_value is not None:
        parts.append(partition_value)
    return f"{deterministic_uuid(*parts)}.{extension}"
