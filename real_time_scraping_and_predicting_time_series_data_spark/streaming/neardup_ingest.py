"""Incremental corpus construction with NEAR-duplicate admission control —
the streaming twin of ``operators/dedup.py``'s MinHash-LSH pipeline, built
on the same ledger/idempotence skeleton as ``corpus_ingest.py``.

Admission rule (first-arrival-wins, deterministic):

- **within batch**: MinHash band buckets generate candidate pairs, exact
  Jaccard over the shingle sets verifies them, connected components over
  the verified edges cluster the batch's near-dups, and the min-``doc_id``
  representative of each cluster survives (the standard LSH-cluster dedup
  used by large corpus pipelines);
- **cross batch**: a surviving representative is admitted only if NO
  already-accepted document shares a band bucket AND verifies at
  Jaccard ≥ threshold. The ledger probe is an equi-join on
  (band, bucket) — bounded candidate work per batch regardless of corpus
  size — followed by verification against only the colliding ledger
  docs' stored shingle sets;
- **idempotent append**: accepted rows (with their shingle sets and band
  buckets, so future probes never recompute them) land in a
  ``batch_id=<id>`` directory via the staging-rename publish; a replayed
  batch excludes its own directory from the ledger read.

Served-corpus invariant (pinned in tests/test_neardup_ingest.py): no two
documents in ``serve()`` BOTH share a MinHash band bucket AND have
Jaccard ≥ threshold. This is the LSH guarantee, which is probabilistic in
the Jaccard value itself: a pair at J just above the threshold can share
no band bucket (P[collision] = 1-(1-J^r)^b ≈ 0.6% at J = 0.2 with b = 4
bands × r = 4 rows) and both be admitted. Near-certain detection needs
J well above the band threshold (J^r·b ≳ 1) or a banding config sized to
the target J — the standard LSH recall trade-off, identical to the batch
pipeline's. What IS exact: every candidate that does collide is verified
with exact Jaccard before rejection, so there are no false rejections.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .store_compaction import compacted_upto, is_compacted, publish_dir

from ..operators.dedup import (
    connected_components,
    minhash_signatures,
    shingle_sets,
    verify_candidates_jaccard,
)

__all__ = ["NearDupCorpusStore"]


def _band_buckets(sigs: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(id, band, bucket) — exact band-value-tuple buckets, one row per
    band (same construction as ``minhash_candidates``'s join keys)."""
    rows_per_band = num_perm // bands
    structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(
                    "-", *[F.col(f"mh_{bi * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    return sigs.select("id", F.explode(structs).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket")
    )


class NearDupCorpusStore:
    """First-seen-wins near-dup-free document store over columns
    ``(doc_id, text, source)``."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        threshold: float = 0.2,
        n: int = 2,
        num_perm: int = 16,
        bands: int = 4,
    ) -> None:
        self.spark = spark
        self.root = os.path.join(store_dir, "accepted")
        self.threshold = threshold
        self.n = n
        self.num_perm = num_perm
        self.bands = bands
        os.makedirs(self.root, exist_ok=True)

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

    # -- ingest -------------------------------------------------------------

    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: admit near-dup-free representatives,
        idempotently per batch_id."""
        if is_compacted(self.root, batch_id):
            return  # replay of a folded batch: its verdicts are in the fold
        sets = shingle_sets(batch_df, id_col="doc_id", text="text", n=self.n).localCheckpoint(
            eager=True
        )
        sigs = minhash_signatures(sets, num_perm=self.num_perm)
        bk = _band_buckets(sigs, self.num_perm, self.bands).localCheckpoint(eager=True)

        # within-batch: candidates -> verify -> cluster -> min-id reps
        a = bk.select(F.col("id").alias("id_a"), "band", "bucket")
        b = bk.select(F.col("id").alias("id_b"), "band", "bucket")
        cand = (
            a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        edges = (
            verify_candidates_jaccard(cand, sets)
            .filter(F.col("jaccard") >= self.threshold)
            .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        )
        labels = connected_components(edges, sets.select("id"))
        reps = (
            labels.groupBy("label").agg(F.min("node").alias("id")).select("id")
        )

        # cross-batch: probe the ledger's band buckets, verify survivors
        survivors = reps
        ledger = self._ledger(exclude_batch_id=batch_id)
        if ledger is not None:
            lbk = ledger.select("doc_id", F.explode("bands").alias("b")).select(
                F.col("doc_id").alias("led_id"),
                F.col("b.band").alias("band"),
                F.col("b.bucket").alias("bucket"),
            )
            probe = (
                bk.join(reps, "id")
                .join(lbk, ["band", "bucket"])
                .select("id", "led_id")
                .distinct()
            )
            led_sets = ledger.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
            new_sets = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
            joined = (
                probe.select(F.col("id").alias("id_a"), F.col("led_id").alias("id_b"))
                .join(new_sets, "id_a")
                .join(led_sets, "id_b")
            )
            common = F.size(F.array_intersect("sh_a", "sh_b"))
            union = F.size("sh_a") + F.size("sh_b") - common
            rejected = (
                joined.filter((common / union) >= self.threshold)
                .select(F.col("id_a").alias("id"))
                .distinct()
            )
            survivors = reps.join(rejected, "id", "left_anti")

        accepted = (
            batch_df.join(survivors.withColumnRenamed("id", "doc_id"), "doc_id", "left_semi")
            .join(sets.withColumnRenamed("id", "doc_id"), "doc_id")
            .join(
                bk.groupBy("id")
                .agg(F.collect_list(F.struct("band", "bucket")).alias("bands"))
                .withColumnRenamed("id", "doc_id"),
                "doc_id",
            )
        )
        # publish_dir's rename-aside swap (ADVICE r12): a crash mid-publish
        # never leaves a previously successful batch's rows absent.
        publish_dir(accepted, self.root, f"batch_id={batch_id}")

    def attach(self, docs: DataFrame, checkpoint: str):
        """Wire a streaming document source into the store."""
        return (
            docs.writeStream.foreachBatch(self.ingest_batch)
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- serve --------------------------------------------------------------

    def serve(self) -> DataFrame:
        """All accepted documents (near-dup-free corpus)."""
        dirs = self._batch_dirs()
        if not dirs:
            raise FileNotFoundError(f"no accepted batches under {self.root}")
        return self.spark.read.parquet(*dirs).drop("sh", "bands")
