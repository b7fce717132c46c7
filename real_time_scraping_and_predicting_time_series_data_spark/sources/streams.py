"""Streaming sources replacing the reference's scraper process (S1/S3).

Spark has no HTTP-polling source; the production shape is: an external
poller (the reference's asyncio loop, unchanged) appends JSON/parquet files
to a drop zone, and Structured Streaming tails the directory. For demos and
tests:

- ``file_tick_stream``  : ``readStream`` over a drop-zone directory with the
  explicit tick schema (``asyncio scraping.py:14``'s timestamp/price/
  variation generalized to keyed ticks).
- ``rate_tick_stream``  : the built-in ``rate`` source mapped to a
  deterministic synthetic price walk — the stand-in for the 5 s Yahoo poll
  (``scraper:86``), one tick per key per trigger.

Both yield the same schema as the batch ``events`` table minus props, so
every batch operator applies unchanged to the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["TICK_SCHEMA", "file_tick_stream", "rate_tick_stream"]

TICK_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def file_tick_stream(spark: SparkSession, drop_dir: str, fmt: str = "json") -> DataFrame:
    """Tail a drop-zone directory written by an external poller (S1).

    ``maxFilesPerTrigger=1`` gives deterministic micro-batch replay in tests
    (one poll file = one batch, like the reference's queue drain S4).
    """
    reader = (
        spark.readStream.format(fmt)
        .schema(TICK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
    )
    return reader.load(drop_dir)


def rate_tick_stream(spark: SparkSession, rows_per_second: int = 10, n_keys: int = 5) -> DataFrame:
    """Synthetic tick stream from the rate source: deterministic price walk
    per key (sin-based so values revisit levels and the change-dedup gate
    P2 actually drops rows)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % n_keys).alias("user_id"),
        (
            F.round(100 + 10 * F.sin(F.floor(F.col("value") / n_keys) / 3.0), 0)
        ).alias("value"),
    )
