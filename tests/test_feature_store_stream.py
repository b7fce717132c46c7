"""Batch ↔ streaming parity for point-in-time feature serving: the
stateful streaming twin must emit, for every purchase label in the real
sf0.001 events table, exactly the feature row the batch as-of join
(`ml_point_in_time_features`) produces — value-exact, across multiple
micro-batches so the open/published day state provably carries over."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries
from real_time_scraping_and_predicting_time_series_data_spark.streaming.feature_store import (
    streaming_point_in_time_features,
)

SF = "/root/testdata/sf0.001"


def _feed_in_four_files(spark, tmp_path):
    """Write events as 4 parquet files split on global (ts, event_id) rank
    so maxFilesPerTrigger=1 delivers 4 event-time-ordered micro-batches."""
    ev = load_table(spark, SF, "events")
    ranked = ev.withColumn(
        "_part", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    src = str(tmp_path / "stream_src")
    for i in range(1, 5):
        ranked.filter(F.col("_part") == i).drop("_part").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_point_in_time_stream_matches_batch_asof(spark, tmp_path):
    stream = _feed_in_four_files(spark, tmp_path)
    q = (
        streaming_point_in_time_features(stream)
        .writeStream.format("memory")
        .queryName("pit_serve")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pit"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    canon = F.floor(F.col("feat_mean") * 1000000 + F.lit(0.5)) / 1000000
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM pit_serve")
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("label_ts"),
            F.round("label_value", 6).alias("label_value"),
            "feat_day",
            "feat_n",
            canon.alias("feat_mean"),
        )
        .collect()
    }
    want = {
        tuple(r) for r in all_queries()["ml_point_in_time_features"].fn(spark, SF).collect()
    }
    assert len(want) > 100
    # every label emitted exactly once, with the identical feature row
    assert got == want


def test_point_in_time_stream_no_leakage(spark, tmp_path):
    """Served feat_day is always strictly before the label's own day."""
    stream = _feed_in_four_files(spark, tmp_path)
    q = (
        streaming_point_in_time_features(stream)
        .writeStream.format("memory")
        .queryName("pit_leak")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_leak"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    bad = (
        spark.sql("SELECT * FROM pit_leak")
        .filter(F.col("feat_day").isNotNull())
        .filter(F.to_date("feat_day") >= F.to_date("ts"))
        .count()
    )
    assert bad == 0


def test_point_in_time_state_survives_restart(spark, tmp_path):
    """The (open-day aggregate, published snapshot) state must recover
    from the checkpoint: a label ingested after a stop/restart must be
    served the features accumulated BEFORE the restart, not re-seed."""
    import datetime as dt

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    d1 = dt.datetime(2026, 3, 1, 10, 0)
    d2 = dt.datetime(2026, 3, 2, 10, 0)
    d3 = dt.datetime(2026, 3, 3, 10, 0)
    src, ckpt, out = (
        str(tmp_path / "src"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )

    def run_batch(rows, fname):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)
        q = (
            streaming_point_in_time_features(
                spark.readStream.schema(schema).parquet(src)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.event_id: r for r in spark.read.parquet(out).collect()}

    # run 1: day1 builds features (n=2, mean=10.0); day2 purchase consumes
    # them and day2 accumulates (purchase 5.0 + tick 7.0 -> mean 6.0)
    first = run_batch(
        [
            (0, d1, 1, "click", 10.0, "{}"),
            (1, d1 + dt.timedelta(hours=1), 1, "click", 10.0, "{}"),
            (2, d2, 1, "purchase", 5.0, "{}"),
            (3, d2 + dt.timedelta(hours=1), 1, "click", 7.0, "{}"),
        ],
        "b1",
    )
    assert set(first) == {2}
    assert first[2].feat_day == "2026-03-01"
    assert first[2].feat_n == 2
    assert first[2].feat_mean == 10.0

    # run 2 (fresh query, same checkpoint): a day3 label must be served the
    # day2 snapshot accumulated before the restart
    second = run_batch([(4, d3, 1, "purchase", 9.0, "{}")], "b2")
    assert set(second) == {2, 4}
    assert second[4].feat_day == "2026-03-02"
    assert second[4].feat_n == 2
    assert second[4].feat_mean == 6.0
