"""Streaming URL-frontier ingest — the incremental twin of
``corpus_url_canonical_dedup`` + ``corpus_crawl_frontier``
(operators/corpus.py), on the ``corpus_ingest.py`` ledger skeleton.

A crawler discovers URLs continuously; the frontier must admit each
CANONICAL url once (first-seen-wins — re-discovered variants of an
already-queued page are dropped at ingest) and serve a politeness
schedule over the accepted set.  Decomposition:

- **within-batch dedup**: min-doc_id survivor per canonical URL — one
  grouped agg over the batch only (URL canonicalization itself is pure
  codegen'd string algebra from ``canonical_url``, zero extra shuffle);
- **cross-batch dedup**: left-anti join of the batch's survivors against
  the ledger of already-accepted canonical URLs.  The ledger read
  projects ONLY the canonical-URL column; at 100 TB the accepted store
  is bucketed on ``canonical_url`` so the anti join is zero-shuffle on
  the ledger side and the probe side is one micro-batch;
- **idempotent append**: accepted rows land under ``batch_id=<id>`` via
  staging-rename (a replayed batch overwrites its own earlier attempt
  and excludes its own directory from the ledger probe), and
  ``compact()`` folds batch directories by pure union — accepted rows
  are disjoint across batches by the anti-join.

Equivalence contract (pinned in tests/test_url_frontier.py): when batch
assignment is MONOTONE in doc_id (a real crawl's arrival order — earlier
discovery ⇒ smaller id), the earliest batch containing any member of a
canonical group also contains that group's global min doc_id, so
first-seen-wins == global min-doc_id survivor and ``serve_frontier()``
is bit-identical to the one-pass ``corpus_crawl_frontier``.  Under
out-of-order arrival the store still admits exactly one row per
canonical URL (first arrival), which is the semantics a live frontier
actually wants — the batch-parity guarantee is scoped to ordered
arrival, stated here rather than hidden.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .store_compaction import compacted_upto, is_compacted, publish_dir

__all__ = ["UrlFrontierStore"]


class UrlFrontierStore:
    """First-seen-wins canonical-URL ledger over columns
    ``(doc_id, url)``; accepted rows carry
    ``(doc_id, canonical_url, reg_domain, host)``."""

    def __init__(self, spark: SparkSession, store_dir: str) -> None:
        self.spark = spark
        self.root = os.path.join(store_dir, "accepted")
        os.makedirs(self.root, exist_ok=True)

    def _batch_dirs(self, exclude_batch_id: int | None = None) -> list[str]:
        upto = compacted_upto(self.root)
        out = []
        if upto >= 0:
            out.append(os.path.join(self.root, f"compacted_upto={upto}"))
        for d in os.listdir(self.root):
            if not d.startswith("batch_id="):
                continue
            if exclude_batch_id is not None and d == f"batch_id={exclude_batch_id}":
                continue
            if int(d.split("=", 1)[1]) <= upto:
                continue
            out.append(os.path.join(self.root, d))
        return sorted(out)

    def _ledger_urls(self, exclude_batch_id: int | None = None) -> DataFrame | None:
        dirs = self._batch_dirs(exclude_batch_id)
        if not dirs:
            return None
        # Canonical-URL-only projection: one column of the store is read.
        return self.spark.read.parquet(*dirs).select("canonical_url")

    def compact(self) -> dict:
        """Fold accepted ``batch_id=<i>`` dirs into ``compacted_upto=<max>``
        — a pure union (rows disjoint by the ledger anti-join)."""
        upto = compacted_upto(self.root)
        live = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.root)
            if d.startswith("batch_id=") and int(d.split("=", 1)[1]) > upto
        )
        if not live:
            return {"folded_batches": 0, "upto": upto}
        new_upto = max(live)
        merged = self.spark.read.parquet(*self._batch_dirs())
        staging = os.path.join(self.root, f".staging_compacted_upto={new_upto}")
        shutil.rmtree(staging, ignore_errors=True)
        merged.write.mode("overwrite").parquet(staging)
        os.rename(staging, os.path.join(self.root, f"compacted_upto={new_upto}"))
        for d in os.listdir(self.root):
            keep = d == f"compacted_upto={new_upto}"
            stale = (
                (d.startswith("batch_id=") and int(d.split("=", 1)[1]) <= new_upto)
                or d.startswith("compacted_upto=")
                or d.startswith(".staging")
                or d.startswith("_staging")
            )
            if stale and not keep:
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
        return {"folded_batches": len(live), "upto": new_upto}

    # -- ingest ---------------------------------------------------------

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: admit first-seen canonical URLs, idempotently.
        ``batch_df`` carries raw ``(doc_id, url)``."""
        from ..operators.corpus import canonical_url, with_registrable_domain  # noqa: PLC0415

        if is_compacted(self.root, batch_id):
            return  # replay of a folded batch: its verdicts are in the fold
        canon, host = canonical_url(F.col("url"))
        c = batch_df.select(
            "doc_id", canon.alias("canonical_url"), host.alias("host")
        )
        c = with_registrable_domain(c, host_col="host")
        w = Window.partitionBy("canonical_url").orderBy("doc_id")
        survivors = (
            c.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        ledger = self._ledger_urls(exclude_batch_id=batch_id)
        if ledger is not None:
            survivors = survivors.join(ledger, "canonical_url", "left_anti")
        # publish_dir's rename-aside swap (ADVICE r12): a crash mid-publish
        # never leaves a previously successful batch's rows absent.
        publish_dir(survivors, self.root, f"batch_id={batch_id}")

    def attach(self, urls: DataFrame, checkpoint: str):
        """Wire a streaming (doc_id, url) source into the store."""
        return (
            urls.writeStream.foreachBatch(self.ingest_batch)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- serve ----------------------------------------------------------

    def accepted(self) -> DataFrame:
        """All admitted frontier rows (one per canonical URL)."""
        dirs = self._batch_dirs()
        if not dirs:
            raise FileNotFoundError(f"no accepted batches under {self.root}")
        return self.spark.read.parquet(*dirs)

    def serve_frontier(self, docs: DataFrame) -> DataFrame:
        """The politeness schedule over the accepted set — the SAME
        ``frontier_schedule`` body as the batch ``corpus_crawl_frontier``
        (priority = survivor doc's n_chars desc, doc_id tiebreak;
        per-domain crawl delay), so serve == batch is by construction
        under ordered arrival."""
        from ..operators.corpus import frontier_schedule  # noqa: PLC0415

        surv = self.accepted().select(
            F.col("doc_id").alias("survivor_doc_id"),
            "canonical_url",
            "reg_domain",
            "host",
        )
        return frontier_schedule(surv, docs)
