"""Incremental exact-quantile monitor over a tick stream — the streaming
twin of `events_value_quantiles_grid` (operators/stats.py), third member
of the mergeable-grid family beside the KS drift monitor
(drift_stream.py) and the CMS accumulator (sketch_stream.py).

Each micro-batch reduces to its (event_type, v_cents, cnt) value grid;
the served grid is the grouped-sum merge of every batch's grid, and the
nearest-rank quantiles computed from it are EXACTLY the batch quantiles
over everything ingested (count addition is associative + commutative,
and a nearest-rank quantile is a pure function of the merged grid — no
interpolation, no fp, so the serve is bit-identical, not just close).

Idempotence follows the corpus_ingest pattern: per-batch grids land in
``batch_id=<id>`` directories via staging-rename, so an at-least-once
replay overwrites its own directory instead of double-counting. At 100 TB
the per-batch state is |distinct cents in batch| rows and the serve-side
merge touches only grids — the raw stream is never re-read. This is the
"p99 latency / price percentile dashboard over unbounded history at
bounded state" production shape.

Deployment assumption (same as DriftStreamMonitor): the staging-rename is
a DRIVER-LOCAL ``os.replace`` — correct only when ``store_dir`` is shared
by driver and executors (local mode, NFS). On HDFS/S3, route the rename
through the Hadoop ``FileSystem`` API or an atomic-commit table format.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.stats import quantiles_from_type_grid

__all__ = ["QuantileStreamAccumulator"]


class QuantileStreamAccumulator:
    """Accumulates (event_type, v_cents, cnt) grids per micro-batch and
    serves exact nearest-rank quantiles over all data seen."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        value_col: str = "value",
        group_col: str = "event_type",
    ) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.value_col = value_col
        self.group_col = group_col
        os.makedirs(store_dir, exist_ok=True)

    def _batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.store_dir, f"batch_id={batch_id}")

    def batch_grid(self, df: DataFrame) -> DataFrame:
        """This batch's (event_type, v, cnt) grid — reduced before
        anything is stored."""
        return df.groupBy(
            F.col(self.group_col).alias("event_type"),
            F.round(F.col(self.value_col) * 100).cast("long").alias("v"),
        ).agg(F.count("*").cast("long").alias("cnt"))

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: publish this batch's grid under its batch_id
        (staging-rename → replays overwrite, never double-count)."""
        grid = self.batch_grid(batch_df)
        staging = os.path.join(self.store_dir, f"_staging_{batch_id}")
        grid.coalesce(1).write.mode("overwrite").parquet(staging)
        final = self._batch_dir(batch_id)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(staging, final)

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.ingest_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    def serve_grid(self) -> DataFrame:
        """The merged value grid: union of per-batch grids + one grouped
        sum — identical to the batch grid of everything ingested. An
        empty store (no batch published yet) serves an empty grid, not
        PATH_NOT_FOUND."""
        try:
            merged = self.spark.read.option("basePath", self.store_dir).parquet(
                self.store_dir + "/batch_id=*"
            )
        except Exception:
            merged = self.spark.createDataFrame(
                [], "event_type string, v bigint, cnt bigint"
            )
        return merged.groupBy("event_type", "v").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )

    def serve_quantiles(self) -> DataFrame:
        """Exact per-type nearest-rank p50/p90/p99/max over everything
        ingested — bit-identical to `events_value_quantiles_grid` on the
        same ticks (shared grid-quantile core)."""
        return quantiles_from_type_grid(self.serve_grid())
