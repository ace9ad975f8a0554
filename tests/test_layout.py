"""Layout maintenance: compaction file counts and clustering pruning
evidence (operators/layout.py)."""

import os

import pytest

from pyspark.sql import functions as F

from stream_loader_spark.operators.layout import (
    cluster_by_range,
    compact_small_files,
    dir_bytes,
    file_key_ranges,
)
from stream_loader_spark.sources.tables import load_table


def _data_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out += [f for f in files if f.endswith(".parquet")]
    return out


class TestCompaction:
    def test_many_small_files_become_few(self, spark, sf_small, tmp_path):
        src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
        events = load_table(spark, sf_small, "events")
        events.repartition(16).write.parquet(src)
        assert len(_data_files(src)) == 16

        # target sized so everything fits one file
        n = compact_small_files(spark, src, dest, target_file_bytes=1 << 30)
        assert n == 1
        assert len(_data_files(dest)) == 1
        assert spark.read.parquet(dest).count() == events.count()

    def test_target_bytes_drives_file_count(self, spark, sf_small, tmp_path):
        src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
        load_table(spark, sf_small, "events").repartition(8).write.parquet(src)
        total = dir_bytes(src)
        n = compact_small_files(spark, src, dest, target_file_bytes=total // 3)
        assert n in (3, 4)  # ceil division of measured bytes
        assert 1 < len(_data_files(dest)) <= n


class TestClusterByRange:
    def test_files_own_disjoint_key_ranges(self, spark, sf_small, tmp_path):
        dest = str(tmp_path / "clustered")
        events = load_table(spark, sf_small, "events")
        cluster_by_range(events, dest, ["user_id"], num_files=4)

        ranges = sorted(file_key_ranges(dest, "user_id"))
        assert len(ranges) == 4
        for (_, prev_hi), (next_lo, _) in zip(ranges, ranges[1:]):
            assert prev_hi <= next_lo  # disjoint (boundary key may touch)

    def test_row_groups_are_tight_after_sort(self, spark, sf_small, tmp_path):
        # an unsorted write has near-full-range stats in every file;
        # the clustered write's per-file spans must partition the domain
        dest = str(tmp_path / "clustered")
        events = load_table(spark, sf_small, "events")
        lo, hi = events.agg(F.min("user_id"), F.max("user_id")).first()
        cluster_by_range(events, dest, ["user_id"], num_files=4)
        spans = [b - a for a, b in file_key_ranges(dest, "user_id")]
        assert sum(spans) <= (hi - lo) * 1.01

    def test_roundtrip_preserves_rows(self, spark, sf_small, tmp_path):
        dest = str(tmp_path / "clustered")
        events = load_table(spark, sf_small, "events")
        cluster_by_range(events, dest, ["user_id"], num_files=3)
        back = spark.read.parquet(dest)
        assert back.count() == events.count()
        assert sorted(back.columns) == sorted(events.columns)

    def test_validates_args(self, spark, sf_small, tmp_path):
        events = load_table(spark, sf_small, "events")
        with pytest.raises(ValueError):
            cluster_by_range(events, str(tmp_path / "x"), [], 2)
        with pytest.raises(ValueError):
            cluster_by_range(events, str(tmp_path / "x"), ["user_id"], 0)


class TestSchemaEvolution:
    def test_merge_schema_unions_generations(self, spark, tmp_path):
        """A sink's output dir where later batches carry a new payload
        column: merged read exposes the union schema, NULL-filling the
        old generation (the parquet-side analogue of the reference's
        Avro schema evolution)."""
        from stream_loader_spark.sources.tables import read_evolving

        dest = str(tmp_path / "data")
        spark.createDataFrame([(1, "x")], "id long, a string").write.parquet(
            dest + "/batch=0"
        )
        spark.createDataFrame(
            [(2, "y", 7)], "id long, a string, b int"
        ).write.parquet(dest + "/batch=1")

        df = read_evolving(spark, dest)
        assert set(df.columns) == {"id", "a", "b", "batch"}
        rows = {r.id: r for r in df.collect()}
        assert rows[1].b is None and rows[2].b == 7

    def test_plain_read_would_hide_the_new_column(self, spark, tmp_path):
        dest = str(tmp_path / "data")
        spark.createDataFrame([(1, "x")], "id long, a string").write.parquet(
            dest + "/batch=0"
        )
        spark.createDataFrame(
            [(2, "y", 7)], "id long, a string, b int"
        ).write.parquet(dest + "/batch=1")
        # without merging, whichever footer Spark samples wins — the
        # evolving read is the contract, this pins why it exists
        plain = spark.read.parquet(dest)
        assert set(plain.columns) <= {"id", "a", "b", "batch"}
