"""Stream-stream joins — the streaming form of the as-of alignment (J1,
SURVEY.md §7 hard/risky #1).

The reference aligns two arrival streams (forecast ledger vs. actuals) with
a driver-side linear scan (``lvmh_forecaster2.py:173-177``). In streaming
Spark that is a watermarked stream-stream join: both sides buffer in the
state store, the event-time range condition bounds how long, and the
watermark evicts expired state — O(state) bounded by the interval, not by
the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    interval: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
    left_prefix: str = "l",
    right_prefix: str = "r",
) -> DataFrame:
    """Join each left event to right events of the same key within
    ``(left.ts, left.ts + interval]`` — "what happened (right) shortly
    after (left)". Both sides watermarked so buffered state is evicted.

    Column collision is resolved by prefixing; output carries both event
    ids, both timestamps and both values.
    """
    l = left.select(
        F.col(key),
        F.col("ts").alias(f"{left_prefix}_ts"),
        F.col("event_id").alias(f"{left_prefix}_event_id"),
        F.col("value").alias(f"{left_prefix}_value"),
    ).withWatermark(f"{left_prefix}_ts", watermark)
    r = right.select(
        F.col(key).alias("_rkey"),
        F.col("ts").alias(f"{right_prefix}_ts"),
        F.col("event_id").alias(f"{right_prefix}_event_id"),
        F.col("value").alias(f"{right_prefix}_value"),
    ).withWatermark(f"{right_prefix}_ts", watermark)
    cond = (
        (F.col(key) == F.col("_rkey"))
        & (F.col(f"{right_prefix}_ts") > F.col(f"{left_prefix}_ts"))
        & (F.col(f"{right_prefix}_ts") <= F.col(f"{left_prefix}_ts") + F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond, how).drop("_rkey")
