"""Bucketed layout kills the join shuffle (operators/bucketing.py).

The scale contract under test: after paying the shuffle once at write
time, a fact-fact equi-join on the bucket key plans with ZERO Exchange
operators, while the same join over plain parquet needs two.
"""

import pytest

from pyspark.sql import functions as F

from stream_loader_spark.operators.bucketing import (
    bucketed_join,
    exchange_count,
    write_bucketed,
)
from stream_loader_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_small, "orders")
    lineitem = load_table(spark, sf_small, "lineitem")
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], 4, str(root / "orders_b")
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        4,
        str(root / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _force_smj(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return prev


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, bucketed_tables):
        left, right = bucketed_tables
        prev = _force_smj(spark)
        try:
            joined = bucketed_join(spark, left, right, ["o_orderkey"])
            assert exchange_count(joined) == 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_plain_parquet_join_needs_two_exchanges(self, spark, sf_small):
        prev = _force_smj(spark)
        try:
            orders = load_table(spark, sf_small, "orders")
            li = load_table(spark, sf_small, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            )
            joined = orders.join(li, ["o_orderkey"])
            assert exchange_count(joined) == 2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_bucketed_join_matches_plain_join(self, spark, sf_small, bucketed_tables):
        left, right = bucketed_tables
        bucketed = (
            bucketed_join(spark, left, right, ["o_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        orders = load_table(spark, sf_small, "orders")
        li = load_table(spark, sf_small, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        plain = (
            orders.join(li, ["o_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(bucketed.collect()) == sorted(plain.collect())

    def test_bucketed_groupby_has_no_exchange(self, spark, bucketed_tables):
        _, right = bucketed_tables
        agg = (
            spark.table(right)
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert exchange_count(agg) == 0

    def test_write_bucketed_validates_args(self, spark, sf_small, tmp_path):
        orders = load_table(spark, sf_small, "orders")
        with pytest.raises(ValueError):
            write_bucketed(orders, "t", [], 4, str(tmp_path / "t"))
        with pytest.raises(ValueError):
            write_bucketed(orders, "t", ["o_orderkey"], 0, str(tmp_path / "t"))
