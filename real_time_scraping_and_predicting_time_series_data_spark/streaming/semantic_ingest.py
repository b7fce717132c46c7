"""Streaming semantic-dedup admission — SemDeDup as a stream: the
embedding-space twin of the MinHash near-dup store (neardup_ingest.py),
completing the ingest matrix {exact hash, MinHash-LSH, embedding cosine}
× {batch, streaming}.

First-seen-wins admission over a cell-partitioned vector store:

- **assign**: every incoming embedding is unit-normalized and assigned to
  its nearest seed centroid by the zero-shuffle broadcast projection
  (`ivf_assign` — the model ships to tasks, vectors never shuffle to
  assign);
- **within-batch collapse**: cosine >= tau pairs WITHIN a cell form
  edges; connected components keep the min-id representative per
  component (the `neardup_ingest` representative rule, so chains collapse
  to one vector instead of order-dependent survivors);
- **ledger probe**: representatives are compared against the ALREADY
  ACCEPTED vectors of the SAME cells only (equi-join on ``cell`` — the
  SemDeDup cluster pruning: candidate volume is Σ|cell|², never
  |corpus|²); anything within tau of an accepted vector is rejected
  (first-seen-wins);
- **publish**: survivors land under ``batch_id=<id>`` via
  staging-rename — at-least-once replays overwrite their own directory
  (the corpus_ingest idempotence pattern), and a replay excludes its own
  earlier attempt from the ledger probe so it reaches the same verdicts.

The served invariant (test-pinned): no two served vectors in the same
cell have cosine >= tau. Cross-cell near-dups are the deliberate recall
boundary of cluster pruning — the same tradeoff the batch
`dedup_semantic_clusters` documents.

Deployment assumption (shared with the other stores): driver-local
staging-rename — correct on a driver-visible filesystem; on HDFS/S3 use
the Hadoop FileSystem API or an atomic-commit table format.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .store_compaction import compacted_upto, is_compacted, publish_dir

from ..functions.vector import as_double, dot, norm
from ..operators.dedup import cell_local_components
from ..operators.similarity import ivf_assign

__all__ = ["SemanticDedupStore"]


class SemanticDedupStore:
    """First-seen-wins semantically-deduplicated vector store over columns
    ``(vec_id, embedding)``."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        centroids: DataFrame,
        threshold: float = 0.3,
    ) -> None:
        self.spark = spark
        self.root = os.path.join(store_dir, "accepted")
        self.threshold = threshold
        # (cell, c_nvec) seed centroids, normalized — kept as a plain local
        # relation; every use broadcasts it
        self.centroids = centroids.localCheckpoint(eager=True)
        os.makedirs(self.root, exist_ok=True)

    # -- store access -------------------------------------------------------

    def _batch_dirs(self, exclude_batch_id: int | None = None) -> list[str]:
        """Live parts: the newest compacted fold (if any) + batch dirs
        newer than it (at-or-below-fold dirs are crash debris, ignored)."""
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

    def compact(self) -> dict:
        """Union-fold every accepted batch dir into one
        ``compacted_upto=<max>`` dir (accepted rows are disjoint across
        batches by the admission anti-join); serve() and the ledger probe
        are unchanged, folded-batch replays are dropped at ingest. Same
        rename-then-sweep crash window as store_compaction."""
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

    def _ledger(self, exclude_batch_id: int | None = None) -> DataFrame | None:
        dirs = self._batch_dirs(exclude_batch_id)
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def serve(self) -> DataFrame:
        """Everything accepted: (cell, vec_id, v) — empty before the first
        batch, never PATH_NOT_FOUND."""
        led = self._ledger()
        if led is None:
            return self.spark.createDataFrame(
                [], "cell int, vec_id bigint, v array<double>"
            )
        return led

    # -- ingest -------------------------------------------------------------

    def _assign(self, df: DataFrame) -> DataFrame:
        c = df.select("vec_id", as_double(F.col("embedding")).alias("v"))
        c = c.withColumn("_n", norm(F.col("v"))).select(
            "vec_id", F.transform("v", lambda x: x / F.col("_n")).alias("v")
        )
        return ivf_assign(c, self.centroids, "v", ["vec_id"]).select(
            F.col("cell").cast("int").alias("cell"), "vec_id", "v"
        )

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: admit semantically-novel vectors,
        idempotently per batch_id."""
        if is_compacted(self.root, batch_id):
            return  # replay of a folded batch: its verdicts are in the fold
        assigned = self._assign(batch_df).localCheckpoint(eager=True)

        # within-batch: cos >= tau edges inside a cell -> min-id component
        # representatives (chains collapse to one survivor).  Edges never
        # leave a cell, so CC is the one-shuffle per-cell union-find
        # (cell_local_components) rather than the O(diameter) iterative
        # loop — at micro-batch cadence the fixpoint rounds' per-job
        # overhead dominated the whole ingest (r11 drift-serve fix).
        a = assigned.select("cell", F.col("vec_id").alias("src"), F.col("v").alias("va"))
        b = assigned.select("cell", F.col("vec_id").alias("dst"), F.col("v").alias("vb"))
        edges = (
            a.join(b, "cell")
            .filter(F.col("src") < F.col("dst"))
            .filter(F.round(dot(F.col("va"), F.col("vb")), 9) >= self.threshold)
            .select("cell", "src", "dst")
        )
        labels = cell_local_components(edges, assigned.select("cell", "vec_id"))
        reps = assigned.join(
            labels.filter(F.col("node") == F.col("label")).select(
                F.col("node").alias("vec_id")
            ),
            "vec_id",
            "left_semi",
        )

        # ledger probe: same-cell comparison against already-accepted
        # vectors (a replay excludes its own earlier attempt so it reaches
        # the same verdicts)
        led = self._ledger(exclude_batch_id=batch_id)
        if led is not None:
            hits = (
                reps.alias("n")
                .join(led.alias("o"), "cell")
                .filter(
                    F.round(dot(F.col("n.v"), F.col("o.v")), 9) >= self.threshold
                )
                .select(F.col("n.vec_id").alias("vec_id"))
                .distinct()
            )
            reps = reps.join(hits, "vec_id", "left_anti")

        # publish_dir's rename-aside swap (ADVICE r12): a crash mid-publish
        # never leaves a previously successful batch's rows absent.
        publish_dir(reps, self.root, f"batch_id={batch_id}")

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(
                lambda df, bid: self.ingest_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
