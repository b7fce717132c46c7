"""Incremental corpus store (streaming/corpus_ingest.py): serve() must
equal the batch exact-dedup survivor set after any mix of ingests and
at-least-once replays, including through a real streaming query."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from real_time_scraping_and_predicting_time_series_data_spark.streaming.corpus_ingest import (
    IncrementalCorpusStore,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

# batch 2 repeats batch 1 content ("dup of a") and itself ("twice twice").
BATCH_1 = [(1, "alpha text", "s1"), (2, "beta text", "s1"), (3, "alpha text", "s2")]
BATCH_2 = [(10, "beta text", "s2"), (11, "gamma text", "s2"), (12, "gamma text", "s1")]
# first-seen survivors: 1 (alpha), 2 (beta), 11 (gamma)
EXPECTED = {(1, "alpha text"), (2, "beta text"), (11, "gamma text")}


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _served(store):
    return {(r["doc_id"], r["text"]) for r in store.serve().collect()}


def test_first_seen_survivors_across_batches(spark, tmp_path):
    store = IncrementalCorpusStore(spark, str(tmp_path))
    store.ingest_batch(_df(spark, BATCH_1), 0)
    store.ingest_batch(_df(spark, BATCH_2), 1)
    assert _served(store) == EXPECTED


def test_replayed_batch_is_idempotent_and_not_self_suppressing(spark, tmp_path):
    store = IncrementalCorpusStore(spark, str(tmp_path))
    store.ingest_batch(_df(spark, BATCH_1), 0)
    store.ingest_batch(_df(spark, BATCH_2), 1)
    # at-least-once: batch 1 re-delivered. Must neither duplicate (its dir
    # is overwritten) nor self-suppress (ledger excludes its own first try).
    store.ingest_batch(_df(spark, BATCH_2), 1)
    assert _served(store) == EXPECTED


def test_streaming_attach_dedups_exactly_once(spark, tmp_path):
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    for i, rows in enumerate((BATCH_1, BATCH_2)):
        with open(os.path.join(drop, f"b{i}.json"), "w") as f:
            for doc_id, text, source in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text, "source": source}) + "\n")
        t = 1_700_000_000 + i * 10
        os.utime(os.path.join(drop, f"b{i}.json"), (t, t))

    stream = (
        spark.readStream.format("json")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(drop)
    )
    store = IncrementalCorpusStore(spark, str(tmp_path / "store"))
    q = store.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _served(store) == EXPECTED


def test_extra_columns_carried_and_hash_present(spark, tmp_path):
    store = IncrementalCorpusStore(spark, str(tmp_path))
    store.ingest_batch(_df(spark, BATCH_1), 0)
    row = {r["doc_id"]: r for r in store.serve().collect()}[1]
    assert row["source"] == "s1"
    assert len(row["content_hash"]) == 64


def test_store_survives_checkpoint_restart(spark, tmp_path):
    """Stop after batch 1, restart the stream from the same checkpoint with
    new files present: the restarted query must process only the new batch,
    and the corpus must equal the batch recompute — no re-admission of
    already-rejected duplicates, no loss."""
    drop = str(tmp_path / "drop")
    os.makedirs(drop)

    def write_file(i, rows):
        with open(os.path.join(drop, f"b{i}.json"), "w") as f:
            for doc_id, text, source in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text, "source": source}) + "\n")
        t = 1_700_000_000 + i * 10
        os.utime(os.path.join(drop, f"b{i}.json"), (t, t))

    def stream():
        return (
            spark.readStream.format("json")
            .schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .load(drop)
        )

    store = IncrementalCorpusStore(spark, str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")

    write_file(0, BATCH_1)
    q = store.attach(stream(), ckpt)
    q.awaitTermination(120)
    assert _served(store) == {(1, "alpha text"), (2, "beta text")}

    # restart from the same checkpoint with batch 2 now present
    write_file(1, BATCH_2)
    q = store.attach(stream(), ckpt)
    q.awaitTermination(120)
    assert _served(store) == EXPECTED


def test_streaming_corpus_pipeline_composition(spark, tmp_path):
    """The continuous corpus pipeline end-to-end: drop-zone JSON docs →
    PII redaction (stateless Catalyst pass on the stream) → first-seen
    dedup store. The served corpus must equal the batch recompute of the
    same composition (redact-then-dedup over the union of all files)."""
    from pyspark.sql import functions as F

    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import pii_redact

    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    rows1 = [(1, "pay 1234567 to a@b.io", "s1"), (2, "plain text", "s1")]
    rows2 = [(3, "pay 7654321 to a@b.io", "s2"),  # differs pre-redaction only
             (4, "plain text", "s2"), (5, "fresh doc", "s2")]
    for i, rows in enumerate((rows1, rows2)):
        with open(os.path.join(drop, f"b{i}.json"), "w") as f:
            for doc_id, text, source in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text, "source": source}) + "\n")
        t = 1_700_000_000 + i * 10
        os.utime(os.path.join(drop, f"b{i}.json"), (t, t))

    stream = (
        spark.readStream.format("json")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(drop)
    )
    redacted = pii_redact(stream).withColumnRenamed("clean_text", "text")
    store = IncrementalCorpusStore(spark, str(tmp_path / "store"))
    q = store.attach(redacted, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {(r["doc_id"], r["text"]) for r in store.serve().collect()}
    # docs 1 and 3 redact to the same text -> doc 3 rejected; 4 dups 2.
    assert got == {
        (1, "pay <NUM> to <EMAIL>"),
        (2, "plain text"),
        (5, "fresh doc"),
    }
