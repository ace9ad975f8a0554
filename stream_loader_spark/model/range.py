"""Stream ranges: the unit of what a batch covered.

Semantics mirror the reference's ``StreamRange`` — an inclusive
``[start, end]`` span of offsets in one (topic, partition) with
watermarks at both ends (reference model/StreamRange.scala:17-52) — and
its mutable builder that extends the end offset and maxes the watermark
as records are observed (StreamRange.scala:61-81).

In the Spark engine these describe what a micro-batch covered; they are
written to the sink manifest and drive idempotence tokens and
deterministic file names.  The distributed way to compute them is a
``groupBy(topic, partition).agg(min(offset), max(offset), max(ts))`` —
see :mod:`stream_loader_spark.operators.recovery`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

from stream_loader_spark.model.position import StreamPosition


@dataclass(frozen=True)
class StreamRange:
    """Inclusive range of offsets consumed from one stream partition."""

    topic: str
    partition: int
    start: StreamPosition
    end: StreamPosition

    @property
    def record_count_upper_bound(self) -> int:
        return self.end.offset - self.start.offset + 1

    def is_consecutive_with(self, nxt: "StreamRange") -> bool:
        """True if ``nxt`` continues this range with no gap."""
        return (
            self.topic == nxt.topic
            and self.partition == nxt.partition
            and nxt.start.offset == self.end.offset + 1
        )

    def merged_with(self, nxt: "StreamRange") -> "StreamRange":
        """Merge a consecutive following range: keep earliest start,
        latest end (reference model/StreamRange.scala:26-51)."""
        if not self.is_consecutive_with(nxt):
            raise ValueError(f"ranges not consecutive: {self} + {nxt}")
        return StreamRange(self.topic, self.partition, self.start, nxt.end)

    def canonical_string(self) -> str:
        """Stable serialization used in tokens and file names:
        ``topic:partition:startOffset:endOffset``."""
        return f"{self.topic}:{self.partition}:{self.start.offset}:{self.end.offset}"


class StreamRangeBuilder:
    """Accumulates observed records of one (topic, partition) into a range.

    Extends the end offset and takes the running max of the watermark,
    mirroring reference model/StreamRange.scala:61-81.
    """

    def __init__(self, topic: str, partition: int, start: StreamPosition) -> None:
        self.topic = topic
        self.partition = partition
        self._start = start
        self._end_offset = start.offset
        self._end_watermark_ms = start.watermark_ms
        self._observed = False

    def observe(self, offset: int, watermark_ms: int) -> None:
        # the FIRST observation is checked against the range start, not
        # skipped: a first offset below start would otherwise build an
        # inverted range (end < start) that corrupts coverage math and
        # dedup tokens downstream instead of failing fast here
        if offset < self._end_offset:
            raise ValueError(
                f"offsets must be non-decreasing: got {offset} after {self._end_offset}"
            )
        self._observed = True
        self._end_offset = offset
        self._end_watermark_ms = max(self._end_watermark_ms, watermark_ms)

    def build(self) -> StreamRange:
        return StreamRange(
            self.topic,
            self.partition,
            self._start,
            StreamPosition(self._end_offset, self._end_watermark_ms),
        )


def merge_ranges(ranges: Iterable[StreamRange]) -> list[StreamRange]:
    """Merge consecutive ranges per (topic, partition).

    Input order within a partition must be by start offset; output keeps
    one range per maximal consecutive run.  Non-consecutive runs are kept
    separate (a gap means another consumer owned those offsets).
    """
    by_tp: dict[tuple[str, int], list[StreamRange]] = {}
    for r in ranges:
        by_tp.setdefault((r.topic, r.partition), []).append(r)

    out: list[StreamRange] = []
    for tp in sorted(by_tp):
        run: StreamRange | None = None
        for r in sorted(by_tp[tp], key=lambda x: x.start.offset):
            if run is None:
                run = r
            elif run.is_consecutive_with(r):
                run = run.merged_with(r)
            else:
                out.append(run)
                run = r
        if run is not None:
            out.append(run)
    return out


def summarize_ranges(
    ranges: Iterable[StreamRange], keep_exact: int = 8
) -> list[StreamRange]:
    """Bound a (merged) range list for LONG-LIVED records: per
    (topic, partition), keep at most ``keep_exact`` ranges TOTAL — the
    newest ``keep_exact - 1`` stay exact and everything older collapses
    into ONE envelope [oldest start .. that run's end], even across
    gaps (so the envelope occupies the remaining slot).

    Why this exists: a compaction record that carries every range ever
    committed grows one range per (batch × partition) when offsets are
    SPARSE per partition (e.g. a globally-increasing event id used as
    the offset — gaps belong to other partitions, so
    ``merge_ranges``'s consecutive-only merge can legitimately never
    collapse them). Measured: 200 batches × 29 partitions = 5,763
    ranges / 760 KB in one record, recovery time growing linearly with
    stream lifetime — at the 100k-batch lifetimes the sink targets,
    the record the compaction exists to keep SMALL becomes the thing
    that grows without bound.

    Safety: recovery positions read only each partition's MAX end —
    unchanged by the envelope. The replay guard is by batch id, not by
    range coverage, so widening a historic range over same-partition
    gap offsets (offsets that were never and will never be delivered
    for that partition under a deterministic source) changes no
    decision. The newest ranges stay exact because they are the only
    ones a restart can still race with.
    """
    by_tp: dict[tuple[str, int], list[StreamRange]] = {}
    for r in ranges:
        by_tp.setdefault((r.topic, r.partition), []).append(r)
    out: list[StreamRange] = []
    for tp in sorted(by_tp):
        rs = sorted(by_tp[tp], key=lambda x: x.start.offset)
        if len(rs) > keep_exact and keep_exact >= 1:
            old, recent = rs[: len(rs) - (keep_exact - 1)], rs[len(rs) - (keep_exact - 1):]
            envelope = StreamRange(old[0].topic, old[0].partition, old[0].start, old[-1].end)
            out.append(envelope)
            out.extend(recent)
        else:
            out.extend(rs)
    return out


def ranges_signature(ranges: Sequence[StreamRange]) -> str:
    """Canonical multi-range serialization: sorted, ';'-joined.

    This is the basis of both the insert dedup token (reference
    clickhouse/ClickHouseFileStorage.scala:86-88 builds
    ``topic:partition:start:end;...``) and deterministic file naming
    (TimePartitioningFilePathFormatter.scala:39-47 hashes the ranges).
    """
    return ";".join(sorted(r.canonical_string() for r in ranges))
