"""Rebalance contract tests (SURVEY §2 K10 / reference behaviors).

Mirrors the reference's broker-backed rebalance scenarios
(stream-loader-tests-util RebalanceBehaviors.scala:38-207) against the
file-stream stand-in + checkpoint machinery, which is where Spark's
equivalents of assign/revoke bookkeeping live:

- "assign": a partition appearing mid-stream (Kafka's
  ``increaseTo(2)``) maps to new-partition rows arriving in the source;
  the restarted query's checkpoint must pick them up while continuing
  the old partition, with no loss and no duplication.
- "revoke": moving a partition from loader A to loader B maps to
  re-predicating A's group and standing up B with a FRESH checkpoint.
  B re-reads history, so it wraps its sink in ``RewindingSink`` warmed
  with A's committed positions — the reference's warm-up-instead-of-
  rewrite discipline (RewindingPartitionGroupSinker.scala:45-118) —
  and the union of both sinks holds every message exactly once.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from stream_loader_spark.sinks.manifest import ManifestFileSink
from stream_loader_spark.streaming.pipeline import StreamPipeline
from stream_loader_spark.streaming.rewind import RewindingSink

SCHEMA = "topic string, partition int, offset bigint, ts timestamp"
TS = datetime(2024, 1, 1)


def write_source(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def rows_for(partition, offsets):
    return [("t", partition, o, TS) for o in offsets]


class TestRebalanceAssign:
    def test_new_partition_loads_and_old_partition_continues(self, spark, tmp_path):
        src = str(tmp_path / "src")
        cp = str(tmp_path / "cp")
        sink = ManifestFileSink(str(tmp_path / "out"))

        # 1. one partition, first batch
        write_source(spark, src, rows_for(0, range(5)))
        (
            StreamPipeline(spark)
            .from_file_stream(src, SCHEMA)
            .sink(sink, cp)
            .run_available()
        )
        assert sink.committed_data(spark).count() == 5

        # 2.+3. partition 1 appears mid-stream; both partitions get data
        write_source(spark, src, rows_for(0, range(5, 10)))
        write_source(spark, src, rows_for(1, range(5)))
        (
            StreamPipeline(spark)
            .from_file_stream(src, SCHEMA)
            .sink(sink, cp)
            .run_available()
        )

        # 4. both partitions fully loaded, exactly once
        data = sink.committed_data(spark)
        assert data.count() == 15
        assert data.select("topic", "partition", "offset").distinct().count() == 15
        pos = sink.committed_positions()
        assert pos[("t", 0)].offset == 10
        assert pos[("t", 1)].offset == 5

    def test_replayed_batches_after_restart_are_noops(self, spark, tmp_path):
        """Deleting the checkpoint forces a full source re-read — every
        batch replays. The manifest's batch ledger must absorb the
        replay without duplicating rows (the loss-free restart half of
        the reference's KafkaRestartBehaviors)."""
        src = str(tmp_path / "src")
        sink = ManifestFileSink(str(tmp_path / "out"))
        write_source(spark, src, rows_for(0, range(8)))
        (
            StreamPipeline(spark)
            .from_file_stream(src, SCHEMA)
            .sink(sink, str(tmp_path / "cp1"))
            .run_available()
        )
        # fresh checkpoint: batch 0 replays identically (same files, one
        # deterministic batch) and must commit as a no-op
        (
            StreamPipeline(spark)
            .from_file_stream(src, SCHEMA)
            .sink(sink, str(tmp_path / "cp2"))
            .run_available()
        )
        assert sink.committed_data(spark).count() == 8
        assert sink.committed_positions()[("t", 0)].offset == 8


class TestRebalanceRevoke:
    def test_revoked_partition_moves_loaders_without_loss_or_duplication(
        self, spark, tmp_path
    ):
        src = str(tmp_path / "src")
        a_sink = ManifestFileSink(str(tmp_path / "out-a"))

        # phase 1: loader A owns partitions 0 and 1
        write_source(spark, src, rows_for(0, range(5)) + rows_for(1, range(5)))
        (
            StreamPipeline(spark)
            .from_file_stream(src, SCHEMA)
            .transform(lambda df: df.where(F.col("partition").isin(0, 1)))
            .sink(a_sink, str(tmp_path / "cp-a"))
            .run_available()
        )
        assert a_sink.committed_data(spark).count() == 10
        handover = dict(a_sink.committed_positions())

        # rebalance: partition 1 revoked from A, assigned to B; more
        # data lands on both partitions afterwards
        write_source(spark, src, rows_for(0, range(5, 8)) + rows_for(1, range(5, 9)))

        # A continues on its OWN checkpoint with the narrowed predicate
        (
            StreamPipeline(spark)
            .from_file_stream(src, SCHEMA)
            .transform(lambda df: df.where(F.col("partition") == 0))
            .sink(a_sink, str(tmp_path / "cp-a"))
            .run_available()
        )
        # B starts FRESH (re-reads everything), predicated to partition
        # 1, sink wrapped to warm up instead of rewriting A's rows
        b_inner = ManifestFileSink(str(tmp_path / "out-b"))
        warmed = []
        b_sink = RewindingSink(
            b_inner,
            committed={("t", 1): handover[("t", 1)]},
            warmup=lambda df: warmed.append(df.count()),
        )
        (
            StreamPipeline(spark)
            .from_file_stream(src, SCHEMA)
            .transform(lambda df: df.where(F.col("partition") == 1))
            .sink(b_sink, str(tmp_path / "cp-b"))
            .run_available()
        )

        a_data = a_sink.committed_data(spark)
        b_data = b_inner.committed_data(spark)
        # A stopped loading the revoked partition: its partition-1
        # ledger never advanced past the handover point
        assert a_data.where("partition = 1").count() == 5
        assert a_sink.committed_positions()[("t", 1)].offset == 5
        assert a_sink.committed_positions()[("t", 0)].offset == 8
        # B loaded exactly the post-handover partition-1 rows and
        # warmed (not rewrote) the replayed ones
        assert b_inner.committed_positions()[("t", 1)].offset == 9
        assert b_data.count() == 4
        assert sum(warmed) == 5
        # union of both loaders = every message exactly once
        union = a_data.unionByName(b_data).select("topic", "partition", "offset")
        assert union.count() == 17 and union.distinct().count() == 17


class TestRebalanceAssignLive:
    def test_partition_added_while_query_runs_loads_without_restart(
        self, spark, tmp_path
    ):
        """The reference's assign scenario adds the partition while the
        loader KEEPS RUNNING (RebalanceBehaviors.scala:39-115 — one
        loader instance, admin increaseTo(2) mid-flight, no restart).
        The earlier assign test covers the checkpoint-restart
        equivalent; this one holds a live processingTime-triggered
        query open, lands new-partition rows mid-run, and requires the
        SAME query instance to load them — continuing the old
        partition, no loss, no duplication."""
        import time

        src = str(tmp_path / "src")
        cp = str(tmp_path / "cp")
        sink = ManifestFileSink(str(tmp_path / "out"))

        # 1. one partition, some data, query running continuously
        write_source(spark, src, rows_for(0, range(5)))
        q = (
            StreamPipeline(spark)
            .from_file_stream(src, SCHEMA)
            .sink(sink, cp)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

        def committed_count():
            try:
                return sink.committed_data(spark).count()
            except ValueError:  # no committed batches yet
                return 0

        def wait_for(n, deadline_sec=90):
            end = time.time() + deadline_sec
            while time.time() < end:
                if committed_count() >= n:
                    return
                time.sleep(0.5)
            raise TimeoutError(
                f"sink never reached {n} rows; last={committed_count()}"
            )

        try:
            wait_for(5)
            # 2.+3. partition 1 appears and both partitions get more
            # data WHILE the query is live
            write_source(spark, src, rows_for(0, range(5, 10)))
            write_source(spark, src, rows_for(1, range(5)))
            wait_for(15)
        finally:
            q.stop()

        # 4. both partitions fully loaded, exactly once
        data = sink.committed_data(spark)
        assert data.count() == 15
        assert data.select("topic", "partition", "offset").distinct().count() == 15
        pos = sink.committed_positions()
        assert pos[("t", 0)].offset == 10
        assert pos[("t", 1)].offset == 5
