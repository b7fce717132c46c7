"""Batch ↔ streaming parity for the incremental BM25 index: the served
per-query top-k over documents ingested across micro-batches must be
value-exact against `text_bm25_multi` run as one batch — including the
retroactive df/avgdl reweighting late documents cause — and the store must
be replay-safe, restart-recoverable, and compaction-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.operators.text import (
    _BM25_PANEL,
    bm25_multi_topk,
)
from real_time_scraping_and_predicting_time_series_data_spark.streaming.bm25_stream import (
    Bm25StreamIndex,
)

SF = "/root/testdata/sf0.001"


def _batch_want(spark):
    docs = load_table(spark, SF, "documents")
    return {tuple(r) for r in bm25_multi_topk(docs).collect()}


def _served(idx):
    return {tuple(r) for r in idx.serve_topk(_BM25_PANEL).collect()}


def test_bm25_stream_serve_matches_batch(spark, tmp_path):
    """4 micro-batches through a checkpointed file stream → served top-k
    equals the one-pass batch ranking over all documents."""
    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "src")
    for i in range(4):
        docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(4)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    idx = Bm25StreamIndex(spark, str(tmp_path / "store"))
    q = idx.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    want = _batch_want(spark)
    assert len(want) == 30
    assert _served(idx) == want


def test_bm25_replay_restart_and_compaction(spark, tmp_path):
    """At-least-once replay overwrites its own shard (no double count);
    restart from the checkpoint ingests only new files; compact() folds
    the shards with an identical served ranking and drops folded
    replays."""
    docs = load_table(spark, SF, "documents")
    part = lambda i: docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == i)  # noqa: E731
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    idx = Bm25StreamIndex(spark, str(tmp_path / "store"))

    part(0).coalesce(1).write.mode("append").parquet(src)
    q = idx.attach(
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src),
        ckpt,
    )
    q.awaitTermination(300)
    half = _served(idx)
    assert half and half != _batch_want(spark)  # late docs will reweight

    # at-least-once replay of batch 0: same rows, same batch_id → unchanged
    idx.ingest_batch(part(0), 0)
    assert _served(idx) == half

    # restart: second file, NEW query object, SAME checkpoint
    part(1).coalesce(1).write.mode("append").parquet(src)
    q2 = idx.attach(
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src),
        ckpt,
    )
    q2.awaitTermination(300)
    want = _batch_want(spark)
    assert _served(idx) == want

    # compaction: identical serve, folded replay dropped
    rep = idx.compact()
    assert rep["upto"] >= 1
    assert _served(idx) == want
    idx.ingest_batch(part(0), 0)  # replay of a FOLDED batch: dropped
    assert _served(idx) == want
