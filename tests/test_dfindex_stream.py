"""Batch ↔ streaming parity for the incremental n-gram df index: the
served boilerplate share over documents ingested across micro-batches must
be value-exact against `corpus_boilerplate_ngrams` run as one batch —
including the retroactive re-flag of an early document whose grams cross
the df threshold only in a later batch — and the store must be replay-safe
(at-least-once) and restart-recoverable (checkpointed file stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries
from real_time_scraping_and_predicting_time_series_data_spark.streaming.dfindex_stream import (
    NgramDfStreamIndex,
)

SF = "/root/testdata/sf0.001"


def _batch_want(spark):
    return {
        tuple(r)
        for r in all_queries()["corpus_boilerplate_ngrams"].fn(spark, SF).collect()
    }


def _served(idx):
    return {tuple(r) for r in idx.serve_boilerplate().collect()}


def test_stream_serve_matches_batch(spark, tmp_path):
    """4 micro-batches through a checkpointed file stream → serve equals
    the one-batch query over all documents."""
    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "src")
    for i in range(4):
        docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(4)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    idx = NgramDfStreamIndex(spark, str(tmp_path / "store"))
    q = idx.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    want = _batch_want(spark)
    assert len(want) > 100
    assert _served(idx) == want


def test_replay_is_idempotent_and_restart_recovers(spark, tmp_path):
    """A replayed batch_id overwrites its own directory (no double count);
    a restarted query from the same checkpoint ingests only new files."""
    docs = load_table(spark, SF, "documents")
    part = lambda i: docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == i)  # noqa: E731
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    idx = NgramDfStreamIndex(spark, str(tmp_path / "store"))

    part(0).coalesce(1).write.mode("append").parquet(src)
    q = idx.attach(
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src),
        ckpt,
    )
    q.awaitTermination(300)
    half = _served(idx)

    # at-least-once replay of batch 0: same rows, same batch_id → unchanged
    idx.ingest_batch(part(0), 0)
    assert _served(idx) == half

    # restart: second file, NEW query object, SAME checkpoint — only the
    # new file is ingested (batch_id advances past the recovered offset)
    part(1).coalesce(1).write.mode("append").parquet(src)
    q2 = idx.attach(
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src),
        ckpt,
    )
    q2.awaitTermination(300)
    assert _served(idx) == _batch_want(spark)


def test_retroactive_reflag_across_batches(spark, tmp_path):
    """A document ingested in batch 0 must be re-flagged once batch 1
    pushes its grams over the df threshold — the property a frozen
    per-batch verdict store would get wrong."""
    tmpl = "alpha beta gamma delta epsilon zeta"  # one shared 5-gram window
    rows = [(i, f"{tmpl} unique{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = NgramDfStreamIndex(spark, str(tmp_path / "store"))

    idx.ingest_batch(df.filter(F.col("doc_id") < 2), 0)
    early = {r.doc_id: r.flagged for r in idx.serve_boilerplate().collect()}
    assert early == {0: False, 1: False}  # shared grams seen in only 2 docs

    idx.ingest_batch(df.filter(F.col("doc_id") >= 2), 1)
    late = {r.doc_id: r.flagged for r in idx.serve_boilerplate().collect()}
    # the two shared 5-grams now appear in 6 docs (df >= 5): every doc has
    # 2 of its 3 distinct grams boilerplate -> frac 2/3 >= 0.5
    assert late == {i: True for i in range(6)}
