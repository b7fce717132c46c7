"""Sinks (S5/S6) and physical-layout writers.

The reference persists via three ad-hoc CSV dumps at shutdown
(``asyncio scraping.py:64-71``, ``lvmh_forecaster2.py:187-211``). Here the
write path is a first-class layer:

- CSV/JSON for interchange (the reference's formats);
- Parquet as the engine-native format, optionally hive-partitioned by a
  derived column (e.g. event date) so downstream scans prune partitions;
- bucketed tables (``bucketBy`` + ``saveAsTable``): pre-shuffled layout so
  repeated large-fact joins/aggregations on the bucket key run with ZERO
  exchanges — the canonical 100 TB co-location strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_csv", "write_json", "write_parquet", "write_bucketed_table"]


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink with header (S5: ``df.to_csv(index=False)`` equivalent).
    ``single_file`` coalesces to 1 part — only for small exports, never for
    engine-scale data."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Columnar sink; with ``partition_by``, scans filtered on those columns
    prune whole directories (verified in tests via the input-file count)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8, sort_col: str | None = None
) -> None:
    """Persist pre-shuffled: rows are hash-bucketed (and optionally sorted)
    by the join/agg key at write time. Subsequent joins between tables
    bucketed the same way skip the exchange entirely."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)
