"""Grid-store compaction — bounded directory growth for the mergeable-grid
streaming stores (drift, quantile, and any `batch_id=<id>`-per-micro-batch
grid family).

Every store in the family publishes one tiny (keys → counts) grid per
micro-batch under ``batch_id=<id>`` (staging-rename, replay-overwrite).
Serves merge ALL batch grids with a grouped sum — correct at any moment,
but the directory count grows with stream lifetime: a 2-second trigger is
~43k directories/day, and at object-store scale the LISTING cost (not the
grid bytes) eventually dominates every serve. Compaction folds everything
published so far into ONE ``compacted_upto=<max_batch_id>`` directory.
The grouped-sum merge is associative, so the folded grid is the same
relation the per-batch union would have produced, and every downstream
serve statistic is unchanged — bit-identical, for the same reason the
stores' streaming/batch parity holds.

Correctness under the streaming failure model:

- **Replay safety** — after a fold, serves read the compacted grid plus
  only batch dirs with ``id > compacted_upto``; a late at-least-once
  replay of an already-folded batch must be DROPPED at ingest
  (``is_compacted``), because its rows are inside the fold already and a
  fresh ``batch_id=<id>`` dir would double-count.
- **Crash safety** — the new compacted dir is staged and renamed BEFORE
  folded batch dirs are removed; a crash in the window leaves stale batch
  dirs that serves already ignore (``id <= upto``) and the next
  compaction sweeps. Two compacted dirs can coexist after a crash for the
  same reason; readers take the max ``upto`` and the sweep removes the
  older.

Same deployment assumption as the stores themselves: staging-rename is a
driver-local ``os.replace`` — correct when ``store_dir`` is shared by
driver and executors (local mode, NFS); on HDFS/S3 route renames through
the Hadoop ``FileSystem`` API or an atomic-commit table format.
"""

from __future__ import annotations

import os
import re
import shutil
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "compacted_upto",
    "is_compacted",
    "publish_dir",
    "read_store_grid",
    "compact_grid_store",
    "compact_union_store",
]

_BATCH_RE = re.compile(r"^batch_id=(\d+)$")
_COMPACT_RE = re.compile(r"^compacted_upto=(\d+)$")


def _batch_ids(store_dir: str) -> list[int]:
    out = []
    for name in os.listdir(store_dir):
        m = _BATCH_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def compacted_upto(store_dir: str) -> int:
    """Highest batch_id folded into a compacted dir; -1 if never compacted.
    Multiple compacted dirs (crash window) resolve to the max."""
    if not os.path.isdir(store_dir):
        return -1
    upto = -1
    for name in os.listdir(store_dir):
        m = _COMPACT_RE.match(name)
        if m:
            upto = max(upto, int(m.group(1)))
    return upto


def is_compacted(store_dir: str, batch_id: int) -> bool:
    """True when ``batch_id``'s rows are already inside the compacted grid —
    an at-least-once replay of it must be dropped at ingest."""
    return batch_id <= compacted_upto(store_dir)


def publish_dir(df: DataFrame, store_dir: str, dirname: str) -> None:
    """Stage + rename ``df`` (coalesced to one file) as ``store_dir/dirname``
    — the idempotent publish every store in the family uses.

    Crash-safe swap (ADVICE r12): the old ``rmtree(final); rename(staging,
    final)`` order had a window where a crash deleted a previously
    SUCCESSFUL publish and left nothing — recovery then depended entirely
    on the at-least-once replay re-delivering that batch.  Now the old dir
    is renamed ASIDE (never deleted before its replacement is in place),
    the new dir renamed in, and only then the aside removed.  The aside
    name starts with ``_staging_`` so serves' listings already ignore it
    and the compaction sweep cleans any debris.  If a crash lands between
    the two renames, the next publish of the same dirname (the replay
    path) self-heals by restoring the aside first."""
    final = os.path.join(store_dir, dirname)
    staging = os.path.join(store_dir, f"_staging_{dirname.replace('=', '_')}")
    aside = staging + ".prev"
    # Self-heal a crash between the two renames below: the previous
    # publish's content is in the aside and final is absent — restore it
    # before (re)staging, so the swap below again never leaves a gap.
    if os.path.isdir(aside) and not os.path.exists(final):
        os.rename(aside, final)
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    shutil.rmtree(aside, ignore_errors=True)
    if os.path.exists(final):
        os.rename(final, aside)
    os.rename(staging, final)
    shutil.rmtree(aside, ignore_errors=True)


def _live_parts(store_dir: str) -> list[str]:
    """The directories a serve should read: the newest compacted grid (if
    any) + batch dirs NEWER than it. Stale dirs (older compacted grids,
    batch dirs at or below the fold) are excluded — they are crash debris."""
    upto = compacted_upto(store_dir)
    parts = []
    if upto >= 0:
        parts.append(os.path.join(store_dir, f"compacted_upto={upto}"))
    parts.extend(
        os.path.join(store_dir, f"batch_id={i}")
        for i in _batch_ids(store_dir)
        if i > upto
    )
    return parts


def read_store_grid(spark: SparkSession, store_dir: str, schema: str) -> DataFrame:
    """Union of every live part's rows (NOT aggregated — callers own the
    grouped-sum merge, exactly as before compaction existed). Typed-empty
    when nothing has published."""
    parts = _live_parts(store_dir) if os.path.isdir(store_dir) else []
    if not parts:
        return spark.createDataFrame([], schema)
    dfs = [spark.read.schema(schema).parquet(p) for p in parts]
    return reduce(DataFrame.unionByName, dfs)


def _sweep(store_dir: str, keep: str) -> None:
    """Remove every batch/compacted/staging dir except ``keep`` — safe
    post-rename (those rows are in the fold) and for crash debris (serves
    already ignore ids at or below the fold)."""
    for name in os.listdir(store_dir):
        if name == keep:
            continue
        if _BATCH_RE.match(name) or _COMPACT_RE.match(name) or name.startswith("_staging_"):
            shutil.rmtree(os.path.join(store_dir, name), ignore_errors=True)


def _fold(spark: SparkSession, store_dir: str, schema: str, transform) -> dict:
    """Shared fold core: merge live parts via ``transform``, publish as
    ``compacted_upto=<max live id>``, sweep everything else. A no-op fold
    (no live batches) still sweeps crash debris."""
    upto = compacted_upto(store_dir)
    live_ids = [i for i in _batch_ids(store_dir) if i > upto]
    dirs_before = len(os.listdir(store_dir)) if os.path.isdir(store_dir) else 0
    if not live_ids:
        if upto >= 0 or dirs_before:
            _sweep(store_dir, f"compacted_upto={upto}")
        return {
            "folded_batches": 0,
            "upto": upto,
            "dirs_before": dirs_before,
            "dirs_after": len(os.listdir(store_dir)),
        }
    new_upto = max(live_ids)
    merged = transform(read_store_grid(spark, store_dir, schema))
    publish_dir(merged, store_dir, f"compacted_upto={new_upto}")
    _sweep(store_dir, f"compacted_upto={new_upto}")
    return {
        "folded_batches": len(live_ids),
        "upto": new_upto,
        "dirs_before": dirs_before,
        "dirs_after": len(os.listdir(store_dir)),
    }


def compact_grid_store(
    spark: SparkSession,
    store_dir: str,
    schema: str,
    key_cols: tuple[str, ...],
    sum_cols: tuple[str, ...],
) -> dict:
    """Fold all live parts into one ``compacted_upto=<max_id>`` grid by the
    associative grouped-sum merge, then sweep folded batch dirs, older
    compacted dirs, and crash debris. Returns ``{"folded_batches", "upto",
    "dirs_before", "dirs_after"}``."""
    return _fold(
        spark,
        store_dir,
        schema,
        lambda df: df.groupBy(*key_cols).agg(
            *[F.sum(c).cast("long").alias(c) for c in sum_cols]
        ),
    )


def compact_union_store(
    spark: SparkSession,
    store_dir: str,
    schema: str,
) -> dict:
    """Fold an APPEND-ONLY store (rows disjoint across batch dirs by the
    replay-overwrite publish contract — e.g. postings, per-doc bases) by
    pure union, no aggregation: the fold is the same multiset the per-batch
    union served, just in one directory. Same rename-then-sweep crash
    window and `is_compacted` replay contract as `compact_grid_store`."""
    return _fold(spark, store_dir, schema, lambda df: df)


def compact_max_store(
    spark: SparkSession,
    store_dir: str,
    schema: str,
    key_cols: tuple[str, ...],
    max_cols: tuple[str, ...],
) -> dict:
    """Fold all live parts by a grouped-MAX merge — for stores whose
    per-key state is an idempotent bit/watermark (per-user conversion
    bits, per-register HLL maxima) rather than an additive count.  Max is
    associative, commutative AND idempotent, so this fold tolerates even
    row-level duplication across parts, a strictly weaker requirement
    than the sum fold's disjointness contract."""

    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy(*key_cols).agg(
            *[F.max(c).cast("long").alias(c) for c in max_cols]
        )

    return _fold(spark, store_dir, schema, merge)
