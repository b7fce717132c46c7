"""Small-file compaction — the lakehouse OPTIMIZE (bin-packing) primitive.

Streaming ingest (`pkg/streaming/*` publish one directory per micro-batch),
fine-grained partitioned writes, and high-parallelism jobs all leave behind
KB-scale parquet files. At 100 TB that is the classic small-file problem:
every file costs a scheduler task, a footer/stat fetch, and an object-store
GET, so a table written by a 2-second-trigger stream can cost 100x its data
volume in per-file overhead to read. Compaction rewrites a directory into
~target-size files; it is pure layout — row set and schema are unchanged.

Spark-first design:

- File inventory comes from the `_metadata` hidden column
  (`_metadata.file_path` / `file_size`), so the size census is a
  distributed aggregation over the scan — no driver-side filesystem
  listing, which at object-store scale is the thing that does not scale.
- `mode="coalesce"` (default) merges partitions WITHOUT a shuffle:
  `coalesce(n)` collapses read splits locally, so compaction cost is one
  read+write pass. The tradeoff is no re-clustering — input order is
  preserved per merged group and file sizes can skew with input skew.
- `mode="shuffle"` pays one round-robin exchange (`repartition(n)`) for
  even file sizes; with `sort_by` it becomes `repartitionByRange` + an
  in-partition sort, i.e. re-CLUSTERING compaction that restores tight
  per-file min/max stats (the 1-D cousin of `write_zordered`).

Reference scope note: the reference engine appends CSV snapshots forever
(`asyncio scraping.py:61`, `lvmh_forecaster2.py` re-reads them whole); this
module is part of the §2.8 extension surface that makes the same pipeline
operable at warehouse scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["file_census", "compact"]


def file_census(spark: SparkSession, path: str) -> dict:
    """Distributed file-size census of a parquet directory.

    Returns ``{"n_files", "total_bytes", "min_bytes", "median_bytes",
    "max_bytes"}`` computed from the ``_metadata`` hidden column — one
    scan-side distinct over (path, size) pairs, no driver listing."""
    files = (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("p"),
            F.col("_metadata.file_size").alias("sz"),
        )
        .distinct()
    )
    row = files.agg(
        F.count("*").alias("n_files"),
        F.sum("sz").alias("total_bytes"),
        F.min("sz").alias("min_bytes"),
        F.expr("percentile(sz, 0.5)").alias("median_bytes"),
        F.max("sz").alias("max_bytes"),
    ).collect()[0]
    return {k: (int(v) if v is not None else 0) for k, v in row.asDict().items()}


def _target_file_count(total_bytes: int, target_bytes: int) -> int:
    return max(1, math.ceil(total_bytes / max(1, target_bytes)))


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
    mode: str = "coalesce",
    sort_by: tuple[str, ...] = (),
) -> dict:
    """Rewrite parquet directory ``src`` into ``dst`` with ~``target_bytes``
    files. Returns ``{"before": census, "after": census, "n_target": n}``.

    ``mode="coalesce"``: shuffle-free merge (cheapest; keeps clustering as-is,
    sizes may skew). ``mode="shuffle"``: one exchange for even sizes;
    combined with ``sort_by`` it range-partitions and sorts so every output
    file carries tight min/max stats on the sort keys (restores pruning for
    a stream-appended table). The output count is computed from the SOURCE
    byte census; parquet re-encoding can change the ratio somewhat, which is
    fine — the point is ~target-scale files, not exact sizes."""
    if mode not in ("coalesce", "shuffle"):
        raise ValueError(f"unknown mode {mode!r}")
    if sort_by and mode == "coalesce":
        raise ValueError("sort_by requires mode='shuffle' (range repartition)")
    before = file_census(spark, src)
    n = _target_file_count(before["total_bytes"], target_bytes)
    df: DataFrame = spark.read.parquet(src)
    if sort_by:
        df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    elif mode == "shuffle":
        df = df.repartition(n)
    else:
        df = df.coalesce(n)
    df.write.mode("overwrite").parquet(dst)
    after = file_census(spark, dst)
    return {"before": before, "after": after, "n_target": n}
