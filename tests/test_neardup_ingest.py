"""NearDupCorpusStore: streaming first-seen-wins near-dup admission.

Crafted tests run 8 bands of 2 rows (band-collision probability ~0.97 at
the planted pairs' Jaccard, and the seeded hashes make the outcome
deterministic).

Invariants: (1) the served corpus never contains two documents with
Jaccard ≥ threshold — neither within one micro-batch nor across batches;
(2) a replayed batch (at-least-once delivery) leaves the store unchanged;
(3) earlier arrivals win over later near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
    jaccard_pairs,
    minhash_candidates,
    minhash_signatures,
    shingle_sets,
    verify_candidates_jaccard,
)
from real_time_scraping_and_predicting_time_series_data_spark.streaming.neardup_ingest import (
    NearDupCorpusStore,
)

T = 0.5


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


BATCH1 = [
    (1, "the quick brown fox jumps over the lazy dog", "a"),
    (2, "the quick brown fox jumps over the lazy cat", "a"),  # near-dup of 1
    (3, "completely different words entirely here now", "b"),
]
BATCH2 = [
    (10, "the quick brown fox leaps over the lazy dog", "a"),  # near-dup of 1
    (11, "another disjoint document with fresh vocabulary", "b"),
]


def test_neardup_admission_and_replay(spark, tmp_path):
    store = NearDupCorpusStore(spark, str(tmp_path), threshold=T, bands=8)
    store.ingest_batch(_docs(spark, BATCH1), batch_id=0)
    served = {r.doc_id for r in store.serve().collect()}
    assert 1 in served and 3 in served
    assert 2 not in served  # within-batch near-dup: min-id representative wins

    store.ingest_batch(_docs(spark, BATCH2), batch_id=1)
    served = {r.doc_id for r in store.serve().collect()}
    assert served == {1, 3, 11}  # 10 rejected against the ledger (first-seen-wins)

    # replay batch 1 (at-least-once delivery) — store unchanged
    store.ingest_batch(_docs(spark, BATCH2), batch_id=1)
    assert {r.doc_id for r in store.serve().collect()} == {1, 3, 11}

    # pairwise invariant: no served pair at jaccard >= T
    pairs = jaccard_pairs(
        store.serve(), id_col="doc_id", text="text", block=None, n=2, threshold=T
    )
    assert pairs.count() == 0


def test_neardup_invariant_on_real_corpus(spark, tmp_path):
    """Feed sf0.001 documents in two halves; the served corpus must satisfy
    the LSH admission invariant: no served pair that SHARES a MinHash band
    bucket has Jaccard >= threshold. (The all-pairs form of the invariant is
    probabilistic — a pair at J just above T has ~0.6% band-collision
    probability at J=0.2 with 4x4 banding and can legitimately be admitted;
    see the module docstring of neardup_ingest.)"""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "source"
    )
    half = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    store = NearDupCorpusStore(spark, str(tmp_path), threshold=0.2)
    store.ingest_batch(docs.filter(F.col("doc_id") <= half), batch_id=0)
    store.ingest_batch(docs.filter(F.col("doc_id") > half), batch_id=1)
    served = store.serve()
    n_all, n_served = docs.count(), served.count()
    assert 0 < n_served <= n_all
    # banded-candidate pairs over the served corpus, verified by exact
    # Jaccard — exactly the detectable-pair set the admission rule promises
    # to keep out.
    sets = shingle_sets(served.select("doc_id", "text"), n=2).localCheckpoint(eager=False)
    sigs = minhash_signatures(sets, num_perm=16)
    cands = minhash_candidates(sigs, num_perm=16, bands=4)
    detectable = verify_candidates_jaccard(cands, sets).filter(F.col("jaccard") >= 0.2)
    assert detectable.count() == 0
    # idempotent replay on the real corpus too
    store.ingest_batch(docs.filter(F.col("doc_id") > half), batch_id=1)
    assert store.serve().count() == n_served


def test_neardup_streaming_attach(spark, tmp_path):
    """End-to-end through writeStream.foreachBatch with availableNow."""
    src = str(tmp_path / "src")
    _docs(spark, BATCH1).coalesce(1).write.mode("overwrite").parquet(src)
    store = NearDupCorpusStore(spark, str(tmp_path / "store"), threshold=T, bands=8)
    schema = "doc_id long, text string, source string"
    q = store.attach(
        spark.readStream.schema(schema).parquet(src), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert {r.doc_id for r in store.serve().collect()} == {1, 3}


def test_neardup_store_survives_restart(spark, tmp_path):
    """Restart contract: a new attach from the same checkpoint must skip
    the already-ingested file (no re-admission churn) and judge the new
    file's docs against the RECOVERED ledger — doc 10 is rejected as a
    near-dup of pre-restart doc 1."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store = NearDupCorpusStore(spark, str(tmp_path / "store"), threshold=T, bands=8)
    schema = "doc_id long, text string, source string"

    def attach_once():
        q = store.attach(spark.readStream.schema(schema).parquet(src), ckpt)
        q.awaitTermination(120)

    _docs(spark, BATCH1).coalesce(1).write.mode("append").parquet(src)
    attach_once()
    assert {r.doc_id for r in store.serve().collect()} == {1, 3}

    _docs(spark, BATCH2).coalesce(1).write.mode("append").parquet(src)
    attach_once()
    assert {r.doc_id for r in store.serve().collect()} == {1, 3, 11}
