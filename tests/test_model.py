"""Property tests for the pure-Python stream model (SURVEY §5.1's
ScalaCheck layer, re-expressed with hypothesis)."""

import random

from hypothesis import given, strategies as st

from stream_loader_spark.model.position import StreamPosition
from stream_loader_spark.model.range import (
    StreamRange,
    StreamRangeBuilder,
    merge_ranges,
    ranges_signature,
)
from stream_loader_spark.model.interval import OffsetRange, WatermarkRange
from stream_loader_spark.model.watermark import MaxWatermarkTracker
from stream_loader_spark.model.idempotence import (
    dedup_token,
    deterministic_uuid,
    batch_file_name,
)
from stream_loader_spark.model.commit import ReachedAnyOf, FuzzyReachedAnyOf

offsets = st.integers(min_value=0, max_value=2**40)
millis = st.integers(min_value=0, max_value=2**41)


def mk_range(topic, partition, start, length, wm=0):
    return StreamRange(
        topic, partition, StreamPosition(start, wm), StreamPosition(start + length, wm)
    )


class TestPositions:
    @given(offsets, millis, offsets, millis)
    def test_ordering_is_by_offset_only(self, o1, w1, o2, w2):
        p1, p2 = StreamPosition(o1, w1), StreamPosition(o2, w2)
        assert (p1 < p2) == (o1 < o2)
        assert (p1 >= p2) == (o1 >= o2)

    @given(offsets, st.integers(min_value=-(2**40), max_value=2**40))
    def test_moved_by_clamps_at_zero(self, o, d):
        assert StreamPosition(o, 0).moved_by(d).offset == max(0, o + d)


class TestRanges:
    @given(st.lists(st.tuples(offsets, st.integers(0, 100), millis), min_size=1, max_size=20))
    def test_builder_tracks_end_and_max_watermark(self, observations):
        observations = sorted(observations)
        b = StreamRangeBuilder("t", 0, StreamPosition(observations[0][0], 0))
        for off, _, wm in observations:
            b.observe(off, wm)
        r = b.build()
        assert r.end.offset == observations[-1][0]
        assert r.end.watermark_ms == max(w for _, _, w in observations)

    @given(offsets, st.integers(1, 50), st.integers(1, 50))
    def test_merge_consecutive(self, start, len1, len2):
        r1 = mk_range("t", 0, start, len1)
        r2 = mk_range("t", 0, start + len1 + 1, len2)
        merged = r1.merged_with(r2)
        assert merged.start.offset == start
        assert merged.end.offset == r2.end.offset

    @given(offsets, st.integers(1, 50), st.integers(2, 50))
    def test_merge_ranges_keeps_gaps_separate(self, start, len1, gap):
        r1 = mk_range("t", 0, start, len1)
        r2 = mk_range("t", 0, r1.end.offset + gap + 1, 5)  # gap > 0
        out = merge_ranges([r2, r1])  # order-insensitive input
        assert len(out) == 2
        assert out[0].start.offset == start

    @given(st.integers(1, 5), st.integers(1, 40), st.integers(1, 8))
    def test_summarize_ranges_bounds_per_partition(self, parts, n, keep):
        """Gap-separated ranges (sparse per-partition offsets) summarize
        to at most keep_exact ranges per partition, preserving each
        partition's min start and MAX end (the recovery position) and
        keeping the newest keep_exact-1 ranges exact."""
        from stream_loader_spark.model.range import summarize_ranges

        ranges = []
        for p in range(parts):
            pos = p  # stagger so partitions differ
            for _ in range(n):
                ranges.append(mk_range("t", p, pos, 3))
                pos += 10  # gap of 6 -> never consecutive
        out = summarize_ranges(ranges, keep_exact=keep)
        by_p = {}
        for r in out:
            by_p.setdefault(r.partition, []).append(r)
        for p in range(parts):
            rs = sorted(by_p[p], key=lambda r: r.start.offset)
            assert len(rs) <= keep
            assert rs[0].start.offset == p
            assert rs[-1].end.offset == p + (n - 1) * 10 + 3
            # the newest tail stays exact when anything was collapsed
            if n > keep:
                tail = rs[-(keep - 1):] if keep > 1 else []
                for i, r in enumerate(tail):
                    j = n - (keep - 1) + i
                    assert r.start.offset == p + j * 10
                    assert r.end.offset == p + j * 10 + 3

    @given(st.integers(1, 5), st.integers(1, 20))
    def test_merge_ranges_collapses_runs_per_partition(self, parts, n):
        ranges = []
        for p in range(parts):
            pos = 0
            for _ in range(n):
                ranges.append(mk_range("t", p, pos, 9))
                pos += 10  # consecutive: next start == prev end + 1
        random.Random(42).shuffle(ranges)
        out = merge_ranges(ranges)
        assert len(out) == parts
        for r in out:
            assert r.start.offset == 0
            assert r.end.offset == n * 10 - 1


class TestWatermark:
    @given(st.lists(st.tuples(millis, millis), min_size=1, max_size=50))
    def test_monotonic_and_clamped(self, events):
        tracker = MaxWatermarkTracker(valid_diff_ms=3_600_000)
        prev = tracker.watermark_ms
        for ev, now in events:
            wm = tracker.observe(ev, now)
            assert wm >= prev
            # the watermark never exceeds any now+diff it was advanced under
            prev = wm

    def test_future_event_rejected(self):
        t = MaxWatermarkTracker(valid_diff_ms=1000)
        assert t.observe(5000, now_ms=1000) == -1  # > now+diff: rejected
        assert t.observe(1500, now_ms=1000) == 1500  # within diff: advances
        assert t.observe(900, now_ms=1000) == 1500  # older: no regress


class TestIdempotence:
    @given(st.lists(st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 3), offsets), max_size=8))
    def test_token_is_order_insensitive(self, specs):
        ranges = [mk_range(t, p, o, 5) for t, p, o in specs]
        shuffled = list(ranges)
        random.Random(1).shuffle(shuffled)
        assert dedup_token(ranges) == dedup_token(shuffled)

    def test_uuid_and_file_name_deterministic(self):
        r = mk_range("t", 0, 100, 50)
        assert deterministic_uuid("x", "y") == deterministic_uuid("x", "y")
        assert deterministic_uuid("x", "y") != deterministic_uuid("x", "z")
        assert batch_file_name([r], "dt=2024-01-01") == batch_file_name([r], "dt=2024-01-01")
        assert batch_file_name([r], "dt=2024-01-01") != batch_file_name([r], "dt=2024-01-02")

    def test_signature_format(self):
        r1, r2 = mk_range("t", 0, 0, 9), mk_range("t", 1, 5, 5)
        assert ranges_signature([r2, r1]) == "t:0:0:9;t:1:5:10"


class TestIntervals:
    @given(offsets, millis, st.integers(0, 2**20))
    def test_offset_rewind(self, o, w, n):
        assert OffsetRange(n).apply(StreamPosition(o, w)).offset == max(0, o - n)

    @given(millis, st.integers(0, 2**20))
    def test_watermark_rewind_targets(self, w, d):
        assert WatermarkRange(d).target_watermark_ms(StreamPosition(0, w)) == max(0, w - d)


class TestCommitStrategy:
    @given(st.integers(0, 10**6), st.integers(0, 10**9), st.integers(0, 10**6))
    def test_reached_any_of(self, ms, size, recs):
        s = ReachedAnyOf(max_open_duration_ms=1000, max_file_size=10**6, max_record_count=100)
        assert s.should_commit(ms, size, recs) == (ms >= 1000 or size >= 10**6 or recs >= 100)

    def test_fuzzy_sampling_stays_positive(self):
        f = FuzzyReachedAnyOf(max_record_count=1000, spread=0.5)
        rng = random.Random(7)
        for _ in range(100):
            assert f.sample(rng).max_record_count >= 1

    def test_trigger_options_mapping(self):
        opts = ReachedAnyOf(max_open_duration_ms=5000, max_record_count=100).to_trigger_options()
        assert opts == {
            "trigger.processingTime": "5000 milliseconds",
            "maxRecordsPerFile": "100",
        }
