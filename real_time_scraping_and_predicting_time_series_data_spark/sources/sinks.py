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

__all__ = ["write_csv", "write_json", "write_orc", "write_parquet", "write_bucketed_table"]


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink with header (S5: ``df.to_csv(index=False)`` equivalent).
    ``single_file`` coalesces to 1 part — only for small exports, never for
    engine-scale data."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """Columnar ORC sink — Spark-native alternative to Parquet for
    Hive-ecosystem interchange (predicate pushdown + column pruning work
    the same way; `spark.read.orc` round-trips the schema)."""
    df.write.mode("overwrite").orc(path)


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


def compact_parquet(
    spark, src: str, dst: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target)`` files.

    Streaming sinks and fine-grained partition appends accumulate small
    files; at 100 TB unboxed small files dominate scan cost (one task +
    footer read each). Run this as the maintenance pass bounded per
    partition. Sizing reads the source footprint from the filesystem (local
    walk here; on a cluster the same arithmetic over FileSystem.listStatus).
    Returns the output file count.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dst)
    return n


def zorder_write(
    df: DataFrame, path: str, cols: tuple[str, str], bits: int = 8, n_files: int = 8
) -> None:
    """Z-order clustered parquet write: interleave the bits of the two
    columns' normalized ranks into a Morton code, range-partition and sort
    by it, so every output file covers a small rectangle of the 2-D key
    space. Parquet min/max stats on EITHER column then skip most files/row
    groups — the data-skipping layout for two-dimensional predicates where
    hive-partitioning by one column can't help the other.

    Normalization is (x - min) / (max - min) via a broadcast 1-row
    aggregate — no sampling, deterministic.
    """
    x, y = cols
    stats = df.agg(
        F.min(x).alias("_xmn"), F.max(x).alias("_xmx"),
        F.min(y).alias("_ymn"), F.max(y).alias("_ymx"),
    )
    top = (1 << bits) - 1
    d = df.crossJoin(F.broadcast(stats))
    xb = F.floor(
        (F.col(x) - F.col("_xmn")) / (F.col("_xmx") - F.col("_xmn") + F.lit(1e-12)) * top
    ).cast("long")
    yb = F.floor(
        (F.col(y) - F.col("_ymn")) / (F.col("_ymx") - F.col("_ymn") + F.lit(1e-12)) * top
    ).cast("long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(xb, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(yb, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    (
        d.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_xmn", "_xmx", "_ymn", "_ymx")
        .write.mode("overwrite")
        .parquet(path)
    )
