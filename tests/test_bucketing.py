"""Bucketed-table co-located join: the 100 TB join strategy SCALE.md
prescribes (pre-shuffle both fact tables once at write time, then every
subsequent join on the bucket key runs with ZERO exchanges) must actually
plan that way on this engine."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _drop(spark, *tables):
    """DROP TABLE + remove any stale managed-table directory a crashed
    earlier run left in the warehouse (LOCATION_ALREADY_EXISTS guard)."""
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_exchange(spark, no_broadcast):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    _drop(spark, "b_lineitem", "b_orders")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    try:
        joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: bucketing IS the shuffle
        # and the result is still correct
        n = joined.count()
        want = li.join(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
        ).count()
        assert n == want > 0
    finally:
        _drop(spark, "b_lineitem", "b_orders")


def test_bucketed_groupby_no_exchange(spark, no_broadcast):
    """Aggregation on the bucket key also rides the bucketing (no exchange
    before the final agg)."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    _drop(spark, "b_li2")
    li.write.bucketBy(8, "l_orderkey").mode("overwrite").saveAsTable("b_li2")
    try:
        agg = spark.table("b_li2").groupBy("l_orderkey").agg(F.sum("l_quantity"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        _drop(spark, "b_li2")
