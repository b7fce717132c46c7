"""Watermarked window aggregations — the event-time replacement for the
reference's 1 s processing-time drain loop (S4, ``lvmh_forecaster2.py:
313-336, 374``) per SURVEY.md §2.8 "streaming set".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tumbling_stats",
    "sliding_stats",
    "session_stats",
    "dedup_within_watermark",
]


def tumbling_stats(
    ticks: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Per-key tumbling OHLC-ish stats with late-data handling: rows later
    than the watermark are dropped, finalized windows are emitted once
    (append mode capable)."""
    return (
        ticks.withWatermark("ts", watermark)
        .groupBy("user_id", F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_ticks"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
            F.avg("value").alias("mean"),
            F.min_by("value", "ts").alias("open"),
            F.max_by("value", "ts").alias("close"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("bucket_start"),
            "n_ticks",
            "low",
            "high",
            "mean",
            "open",
            "close",
        )
    )


def sliding_stats(
    ticks: DataFrame,
    window: str = "2 minutes",
    slide: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Overlapping (sliding) windows — each row contributes to
    window/slide buckets; the streaming twin of the rolling stats the
    reference recomputes per plot refresh (A2/A3)."""
    return (
        ticks.withWatermark("ts", watermark)
        .groupBy("user_id", F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_ticks"), F.avg("value").alias("mean"))
        .select("user_id", F.col("w.start").alias("bucket_start"), "n_ticks", "mean")
    )


def session_stats(ticks: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Session windows: bursts of ticks separated by ``gap`` of silence —
    the natural unit for the reference's bursty change-deduped stream."""
    return (
        ticks.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_ticks"), F.avg("value").alias("mean"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_ticks",
            "mean",
        )
    )


def ohlc_bars_stream(
    ticks: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    size_col: str | None = None,
) -> DataFrame:
    """Streaming OHLC(+VWAP) candles: the tumbling-window twin of the batch
    ``ts_ohlc_vwap_bars`` aggregation (operators/tickbars.py). Open/close
    are ``min_by``/``max_by`` on the event timestamp inside the window —
    incremental aggregation state is one (value, ts) pair per extreme, so a
    bar's state is O(1) regardless of tick volume; late ticks inside the
    watermark update the candle before append-mode emission."""
    # Same zero-padded (ts, event_id) pick key as the batch operator so the
    # streaming candle is bit-identical even when two ticks share a µs.
    sk = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )
    aggs = [
        F.min_by("value", sk).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", sk).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ]
    if size_col:
        aggs.append(
            (F.sum(F.col("value") * F.col(size_col)) / F.nullif(F.sum(size_col), F.lit(0.0))).alias(
                "vwap"
            )
        )
    return (
        ticks.withWatermark("ts", watermark)
        .groupBy("user_id", F.window("ts", window).alias("w"))
        .agg(*aggs)
        .select("user_id", F.col("w.start").alias("bar_ts"), *[c for c in
                ("open", "high", "low", "close", "n_ticks", *(("vwap",) if size_col else ()))])
    )


def dedup_within_watermark(ticks: DataFrame, watermark: str = "2 minutes") -> DataFrame:
    """Exactly-once tick identity dedup inside the watermark horizon
    (``dropDuplicatesWithinWatermark`` — the streaming guard against source
    redelivery, complementing the value-change gate P2)."""
    return ticks.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
