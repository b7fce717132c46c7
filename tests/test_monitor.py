"""observe() + StreamingQueryListener monitoring feed (S7 replacement)."""

from __future__ import annotations

import time

from real_time_scraping_and_predicting_time_series_data_spark.sources.streams import (
    file_tick_stream,
)
from real_time_scraping_and_predicting_time_series_data_spark.streaming.monitor import (
    TickMetricsListener,
    with_tick_metrics,
)

from tests.test_streaming import BATCH_1, BATCH_2, _write_poll_file


def test_streaming_observed_metrics(spark, tmp_path):
    drop = str(tmp_path / "drop")
    _write_poll_file(drop, "poll_000.json", BATCH_1)
    _write_poll_file(drop, "poll_001.json", BATCH_2)

    listener = TickMetricsListener()
    spark.streams.addListener(listener)
    try:
        q = (
            with_tick_metrics(file_tick_stream(spark, drop))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async; give it a moment to drain
        deadline = time.time() + 30
        while time.time() < deadline and len(listener.history) < 2:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    batches = {m["batch_id"]: m for m in listener.history}
    assert len(batches) >= 2
    first = batches[min(batches)]
    assert first["n_rows"] == len(BATCH_1)
    assert first["min_value"] == 50.0 and first["max_value"] == 101.0


def test_batch_observed_metrics(spark):
    from pyspark.sql.observation import Observation

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    obs = Observation("batch_metrics")
    from pyspark.sql import functions as F

    df = ev.observe(obs, F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n"] == 1000
    assert got["avg_value"] > 0
