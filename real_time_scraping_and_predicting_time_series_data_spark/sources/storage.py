"""Storage-layout operators: bucketed tables and partitioned parquet.

At 100 TB the dominant cost of the engine's repeated joins and
point-in-time scans is the shuffle and the full-table scan. Two standard
Spark layouts remove them:

- **Bucketing** (`write_bucketed`): persist a relation hash-bucketed (and
  sorted) on its join key via ``bucketBy``. Two tables bucketed on the
  same key with the same bucket count sort-merge-join with ZERO Exchange
  on either side — the shuffle is paid once at write time and amortized
  over every subsequent join. This is the materialized form of the
  co-partitioning the in-memory operators get from AQE-aligned
  ``repartition``; for a fact table joined daily against its dimension-of
  -the-day, it is the difference between reshuffling 100 TB per query and
  never reshuffling it at all.

- **Partitioned parquet** (`write_partitioned`): hive-style directory
  partitioning on a low-cardinality filter column (event_type, dt).
  Predicates on the partition column prune at the *directory* level —
  ``PartitionFilters`` in the scan node — so a one-type query over a
  100 TB, 10-type table reads 10 TB, before row-group min/max pruning
  even starts. ``sortWithinPartitions`` on write tightens those per-file
  min/max stats for secondary predicate pushdown.

Not registered as driver queries: both require a *write* side, and the
correctness harness runs read-only against the shared testdata. The
layout-equivalence and plan-shape guarantees are pinned by
tests/test_storage.py instead (results identical to the unbucketed join;
no Exchange in the bucketed plan; PartitionFilters present and file scan
restricted to matching directories).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "bucketed_join", "write_partitioned", "read_partition_pruned"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed table hash-bucketed on ``key``.

    ``sortBy(key)`` additionally sorts within each bucket file, letting a
    later sort-merge join skip its Sort as well as its Exchange."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key, same-bucket-count tables. With
    ``spark.sql.sources.bucketing.enabled`` (default true) the planner
    reads bucket i of each side into the same task: no Exchange, no Sort
    (when written sortBy), straight to the merge."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    sort_col: str | None = None,
) -> None:
    """Write hive-partitioned parquet; optionally sort within partitions so
    parquet row-group min/max stats stay tight for non-partition filters."""
    if sort_col is not None:
        df = df.repartition(F.col(partition_col)).sortWithinPartitions(sort_col)
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_partition_pruned(
    spark: SparkSession,
    path: str,
    partition_col: str,
    value: str,
) -> DataFrame:
    """Scan restricted to one partition directory: the equality predicate
    lands in the scan's PartitionFilters, never touching other dirs."""
    return spark.read.parquet(path).filter(F.col(partition_col) == value)
