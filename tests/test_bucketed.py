"""Bucketed co-located joins: the write-once-shuffle-never pattern."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nhl_data_pipeline_spark.catalog import load_table
from nhl_data_pipeline_spark.sources.bucketed import (
    bucketed_join,
    exchange_count,
    write_bucketed,
)
from tests.conftest import TEST_SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, TEST_SF_DIR, "lineitem")
    o = load_table(spark, TEST_SF_DIR, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "b_orders", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # Force the sort-merge path so the exchange comparison is apples-to-apples.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, "l_orderkey")
        assert exchange_count(j) == 0, "bucketed join must not shuffle"

        li = load_table(spark, TEST_SF_DIR, "lineitem")
        o = load_table(spark, TEST_SF_DIR, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        plain = li.join(o, "l_orderkey")
        assert exchange_count(plain) >= 1, "path join should shuffle here"
        # identical results either way
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_aggregation_reuses_partitioning(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert exchange_count(agg) == 0, "groupBy on the bucket key must not shuffle"
