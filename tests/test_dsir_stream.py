"""DsirStreamModel: merge-of-grids serve == batch, replay idempotence,
compaction invariance, streaming e2e (r10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
    dsir_weights,
)
from real_time_scraping_and_predicting_time_series_data_spark.streaming.dsir_stream import (
    DsirStreamModel,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_serve_equals_batch_and_replay_idempotent(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    want = _rows(dsir_weights(docs, F.col("lang") == "en"))
    m = DsirStreamModel(spark, str(tmp_path / "store"), F.col("lang") == "en")
    splits = [
        docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == b) for b in range(3)
    ]
    for b, part in enumerate(splits):
        m.ingest_batch(part, b)
    assert _rows(m.serve_weights()) == want
    # at-least-once replay of batch 1 must overwrite, never double-count
    m.ingest_batch(splits[1], 1)
    assert _rows(m.serve_weights()) == want
    # retroactivity: serving after only 2 batches differs (the model is
    # the point — weights move as the LM estimate sharpens)
    m2 = DsirStreamModel(spark, str(tmp_path / "store2"), F.col("lang") == "en")
    m2.ingest_batch(splits[0], 0)
    m2.ingest_batch(splits[1], 1)
    partial = dict((r[0], r[2]) for r in _rows(m2.serve_weights()))
    full = dict((r[0], r[2]) for r in want)
    moved = [d for d in partial if d in full and partial[d] != full[d]]
    assert moved, "a third batch must shift some earlier weights"


def test_compaction_preserves_serve(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    m = DsirStreamModel(spark, str(tmp_path / "store"), F.col("lang") == "en")
    for b in range(3):
        m.ingest_batch(
            docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == b), b
        )
    before = _rows(m.serve_weights())
    rep = m.compact()
    assert rep["grid"]["folded_batches"] >= 1 and rep["db"]["folded_batches"] >= 1
    assert _rows(m.serve_weights()) == before
    # replay of a folded batch is dropped at ingest
    m.ingest_batch(
        docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 1), 1
    )
    assert _rows(m.serve_weights()) == before


def test_streaming_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF, "documents").limit(60).localCheckpoint()
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    m = DsirStreamModel(spark, str(tmp_path / "store"), F.col("lang") == "en")
    q = m.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    want = _rows(dsir_weights(spark.read.parquet(src), F.col("lang") == "en"))
    assert _rows(m.serve_weights()) == want


def test_streaming_restart_recovery(spark, tmp_path):
    """Kill the stream after the first file, restart from the checkpoint
    with more files present: no batch is double-ingested (replays
    overwrite their own batch_id), and the final serve equals the batch
    operator over everything — the corpus_ingest restart contract."""
    docs = load_table(spark, SF, "documents").limit(90).localCheckpoint()
    src = str(tmp_path / "src")
    parts = [
        docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == b) for b in range(3)
    ]
    parts[0].coalesce(1).write.mode("overwrite").parquet(src)
    m = DsirStreamModel(spark, str(tmp_path / "store"), F.col("lang") == "en")
    ckpt = str(tmp_path / "ckpt")
    schema = docs.schema

    def drain():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = m.attach(stream, ckpt)
        q.awaitTermination(120)

    drain()  # availableNow: consumes file 0 then stops
    first = sorted(map(tuple, m.serve_weights().collect()))
    assert first  # file-0 docs served
    # more data lands while the stream is down
    for p in parts[1:]:
        p.coalesce(1).write.mode("append").parquet(src)
    drain()  # restart from checkpoint: only the NEW files are ingested
    want = sorted(map(tuple, dsir_weights(spark.read.parquet(src), F.col("lang") == "en").collect()))
    assert sorted(map(tuple, m.serve_weights().collect())) == want
