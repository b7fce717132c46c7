"""Storage-layout guarantees (sources/storage.py): bucketed joins carry no
Exchange, partition-pruned scans carry PartitionFilters, and both layouts
return results identical to their naive counterparts."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.sources.storage import (
    bucketed_join,
    read_partition_pruned,
    write_bucketed,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{wh}'")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lines = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "bktest.orders_b", "o_orderkey", buckets=4)
    write_bucketed(lines, "bktest.lineitem_b", "o_orderkey", buckets=4)
    yield "bktest.orders_b", "bktest.lineitem_b", orders, lines
    spark.sql("DROP DATABASE bktest CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """With broadcast disabled (at 100 TB neither fact side broadcasts),
    the same-bucketing join must be a zero-Exchange sort-merge join."""
    lt, rt, *_ = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _formatted(bucketed_join(spark, lt, rt, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_shuffle_join(spark, bucketed_tables):
    lt, rt, orders, lines = bucketed_tables
    got = (
        bucketed_join(spark, lt, rt, "o_orderkey")
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .collect()[0]
    )
    want = (
        orders.join(lines, "o_orderkey")
        .groupBy()
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .collect()[0]
    )
    assert (got["n"], got["qty"]) == (want["n"], want["qty"])


def test_partition_pruned_scan(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF, "events").select("event_id", "event_type", "value", "ts")
    write_partitioned(ev, path, "event_type", sort_col="ts")

    pruned = read_partition_pruned(spark, path, "event_type", "click")
    plan = _formatted(pruned)
    assert "PartitionFilters" in plan and "event_type" in plan

    want = ev.filter(F.col("event_type") == "click").count()
    assert pruned.count() == want


def test_partitioned_roundtrip_values(spark, tmp_path):
    path = str(tmp_path / "events_rt")
    ev = load_table(spark, SF, "events").select("event_id", "event_type", "value")
    write_partitioned(ev, path, "event_type")
    got = spark.read.parquet(path).agg(F.round(F.sum("value"), 2).alias("s")).collect()[0]["s"]
    want = ev.agg(F.round(F.sum("value"), 2).alias("s")).collect()[0]["s"]
    assert got == want
