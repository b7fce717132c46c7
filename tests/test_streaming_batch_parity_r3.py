"""Batch ↔ streaming parity on the REAL sf0.001 events table for the r3
tick-bar operators: the streaming session_window aggregation must agree
with the batch lag-flag sessionization, and the streaming OHLC candles
must agree with the batch grouped-aggregation bars, after an availableNow
replay of the same rows."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries
from real_time_scraping_and_predicting_time_series_data_spark.streaming.windows import (
    ohlc_bars_stream,
    session_stats,
)

SF = "/root/testdata/sf0.001"
QS = all_queries()

# far-future sentinel tick (dummy user) that pushes the watermark past every
# real session/bar so append mode emits them all before availableNow stops.
_SENTINEL_USER = -1


def _streamed_events(spark, tmp_path):
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table

    # load_table normalizes the parquet TIMESTAMP_NTZ ts to plain UTC
    # timestamp (watermarks reject NTZ); the re-written copy then streams
    # with the normalized type.
    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "stream_src")
    ev.write.mode("overwrite").parquet(src)
    far = ev.agg(F.max("ts")).collect()[0][0] + dt.timedelta(days=365)
    spark.createDataFrame(
        [(10**9, far, _SENTINEL_USER, "click", 0.0, "{}")], ev.schema
    ).coalesce(1).write.mode("append").parquet(src)
    return spark.readStream.schema(ev.schema).parquet(src)


def _run_to_memory(stream_df, name, tmp_path):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_sessionize_stream_parity(spark, tmp_path):
    stream = _streamed_events(spark, tmp_path)
    _run_to_memory(
        session_stats(stream, gap="30 minutes", watermark="1 second"), "sess_par", tmp_path
    )
    got = {
        (r.user_id, r.session_start): r.n_ticks
        for r in spark.sql("SELECT * FROM sess_par").collect()
        if r.user_id != _SENTINEL_USER
    }
    want = {
        (r.user_id, r.session_start): r.n_events
        for r in QS["events_sessionize"].fn(spark, SF).collect()
    }
    assert len(want) > 50
    assert got == want
    # session_window's end = last tick + gap; the batch operator's end is the
    # last tick itself — check the fixed offset on a sample
    batch_end = {
        (r.user_id, r.session_start): r.session_end
        for r in QS["events_sessionize"].fn(spark, SF).collect()
    }
    for r in spark.sql("SELECT * FROM sess_par LIMIT 100").collect():
        if r.user_id == _SENTINEL_USER:
            continue
        assert r.session_end == batch_end[(r.user_id, r.session_start)] + dt.timedelta(
            minutes=30
        )


def test_holt_winters_stateful_stream_parity(spark, tmp_path):
    """The stateful Holt-Winters gate must be BIT-identical to the batch
    fold when micro-batches arrive in time order: split sf0.001 events at
    the median ts into two files, replay with maxFilesPerTrigger=1 (state
    crosses a real micro-batch boundary), compare every row."""
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
    from real_time_scraping_and_predicting_time_series_data_spark.operators.rolling import (
        holt_winters,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.stateful import (
        streaming_holt_winters,
    )

    ev = load_table(spark, SF, "events").select("user_id", "event_id", "ts", "value")
    mid = ev.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    src = str(tmp_path / "hw_src")
    ev.filter(F.unix_micros("ts") <= mid).coalesce(1).write.mode("overwrite").parquet(
        src + "/f0"
    )
    ev.filter(F.unix_micros("ts") > mid).coalesce(1).write.mode("overwrite").parquet(
        src + "/f1"
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    q = (
        streaming_holt_winters(stream, period=24)
        .writeStream.format("memory")
        .queryName("hw_par")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hw_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.event_id: (r.hw_level, r.hw_trend, r.hw_seasonal)
        for r in spark.sql("SELECT * FROM hw_par").collect()
    }
    want = {
        r.event_id: (r.hw_level, r.hw_trend, r.hw_seasonal)
        for r in holt_winters(ev, period=24).collect()
    }
    assert len(got) == len(want) >= 1000
    assert got == want  # bit-identical, including across the batch boundary


def test_ohlc_stream_parity(spark, tmp_path):
    stream = _streamed_events(spark, tmp_path).withColumn(
        "size", F.get_json_object("props", "$.k").cast("double")
    )
    _run_to_memory(
        ohlc_bars_stream(stream, window="1 hour", watermark="1 second", size_col="size"),
        "bars_par",
        tmp_path,
    )
    got = {
        (r.user_id, r.bar_ts): (r.open, r.high, r.low, r.close, r.n_ticks,
                                None if r.vwap is None else round(r.vwap, 9))
        for r in spark.sql("SELECT * FROM bars_par").collect()
        if r.user_id != _SENTINEL_USER
    }
    want = {
        (r.user_id, r.bar_ts): (r.open, r.high, r.low, r.close, r.n_ticks,
                                None if r.vwap is None else round(r.vwap, 9))
        for r in QS["ts_ohlc_vwap_bars"].fn(spark, SF).collect()
    }
    assert len(want) > 100
    # streaming candles rounded the same way as the batch query's vwap
    want_cmp = {k: v for k, v in want.items() if k in got}
    assert len(want_cmp) == len(want)  # every batch bar was emitted
    for k, v in want_cmp.items():
        assert got[k][:5] == v[:5], k
        if v[5] is None:
            assert got[k][5] is None
        else:
            assert got[k][5] == pytest.approx(v[5], abs=1e-6)


def test_kalman_stateful_stream_parity(spark, tmp_path):
    """The stateful Kalman gate must be BIT-identical to the batch fold
    across a real micro-batch boundary (same two-file replay as the
    Holt-Winters parity test)."""
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
    from real_time_scraping_and_predicting_time_series_data_spark.operators.rolling import (
        kalman_1d,
    )
    from real_time_scraping_and_predicting_time_series_data_spark.streaming.stateful import (
        streaming_kalman_1d,
    )

    ev = load_table(spark, SF, "events").select("user_id", "event_id", "ts", "value")
    mid = ev.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    src = str(tmp_path / "kf_src")
    ev.filter(F.unix_micros("ts") <= mid).coalesce(1).write.mode("overwrite").parquet(
        src + "/f0"
    )
    ev.filter(F.unix_micros("ts") > mid).coalesce(1).write.mode("overwrite").parquet(
        src + "/f1"
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    q = (
        streaming_kalman_1d(stream)
        .writeStream.format("memory")
        .queryName("kf_par")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "kf_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.event_id: (r.kalman_x, r.kalman_p)
        for r in spark.sql("SELECT * FROM kf_par").collect()
    }
    want = {r.event_id: (r.kalman_x, r.kalman_p) for r in kalman_1d(ev).collect()}
    assert len(got) == len(want) >= 1000
    assert got == want  # bit-identical, including across the batch boundary
