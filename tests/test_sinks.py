"""Sink layer tests: round trips, partition pruning, bucketed co-located
joins (the zero-exchange scale path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.sources.sinks import (
    write_bucketed_table,
    write_csv,
    write_json,
    write_parquet,
)

SF = "/root/testdata/sf0.001"


def test_csv_round_trip(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    write_csv(ev, str(tmp_path / "csv"), single_file=True)
    back = spark.read.option("header", True).schema("event_id long, user_id long, value double").csv(
        str(tmp_path / "csv")
    )
    assert back.count() == ev.count()
    assert back.agg(F.sum("value")).collect()[0][0] == pytest.approx(
        ev.agg(F.sum("value")).collect()[0][0]
    )


def test_json_round_trip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    write_json(docs, str(tmp_path / "json"))
    back = spark.read.json(str(tmp_path / "json"))
    assert back.count() == docs.count()


def test_partitioned_parquet_prunes(spark, tmp_path):
    ev = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    write_parquet(ev, str(tmp_path / "part"), partition_by=["day"])
    back = spark.read.parquet(str(tmp_path / "part"))
    one_day = back.filter(F.col("day") == "2024-01-03")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan (directory pruning, not row filter)
    assert one_day.count() == ev.filter(F.to_date("ts") == "2024-01-03").count()
    assert "PartitionFilters: [isnotnull(day" in plan or "day#" in plan.split("PartitionFilters")[1].splitlines()[0]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both fact tables bucketed on the join key -> sort-merge join with
    ZERO exchanges (the pre-shuffled co-location contract)."""
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # the in-memory catalog forgets tables between sessions but the
    # warehouse directories survive -> clear both
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed_table(o, "b_orders", "o_orderkey", 4, sort_col="o_orderkey")
    write_bucketed_table(li, "b_lineitem", "l_orderkey", 4, sort_col="l_orderkey")
    joined = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    # disable broadcast so the join strategy decision is layout-driven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        joined.collect()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # correctness of the co-located join
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = joined.collect()
    assert {(r.o_orderstatus, r.n) for r in got} == {(r.o_orderstatus, r.n) for r in want}


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from real_time_scraping_and_predicting_time_series_data_spark.sources.sinks import (
        compact_parquet,
    )

    src = str(tmp_path / "frag")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(64).write.parquet(src)  # simulate streaming small files
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) >= 32
    dst = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dst, target_file_bytes=64 * 1024 * 1024)
    assert len(glob.glob(f"{dst}/*.parquet")) == n <= 2
    assert spark.read.parquet(dst).count() == ev.count()


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Every z-ordered file must cover a narrow slice of BOTH key columns
    (vs naive round-robin files that each span the full range)."""
    import glob

    from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
    from real_time_scraping_and_predicting_time_series_data_spark.sources.sinks import (
        zorder_write,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    naive = str(tmp_path / "naive")
    ev.repartition(8).write.parquet(naive)
    zpath = str(tmp_path / "zord")
    zorder_write(ev, zpath, cols=("user_id", "value"), bits=8, n_files=8)

    def avg_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            row = spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
            spans.append(float(row[1]) - float(row[0]))
        return sum(spans) / len(spans)

    assert spark.read.parquet(zpath).count() == ev.count()
    for col in ("user_id", "value"):
        assert avg_span(zpath, col) < 0.6 * avg_span(naive, col), col
