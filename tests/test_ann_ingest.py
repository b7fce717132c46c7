"""Streaming IVF index: serve over everything ingested must equal the
batch seeded-IVF query on the same vectors — bit-identically — including
after an at-least-once replay, and the availableNow attach path."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
    ivf_topk_seeded,
)
from real_time_scraping_and_predicting_time_series_data_spark.streaming.ann_ingest import (
    IvfStreamIndex,
    seed_centroids,
)

SF = "/root/testdata/sf0.001"


def _queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _want(spark, emb):
    return sorted(
        tuple(r)
        for r in ivf_topk_seeded(emb, _queries(emb), k=5, n_cells=16, nprobe=4).collect()
    )


def test_ivf_stream_index_equals_batch(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    idx = IvfStreamIndex(spark, str(tmp_path / "ivf_store"), seed_centroids(emb, 16))
    idx.ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), batch_id=0)
    idx.ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), batch_id=1)
    # at-least-once replay must not duplicate vectors
    idx.ingest_batch(emb.filter(F.col("vec_id") % 2 == 1), batch_id=1)

    got = sorted(tuple(r) for r in idx.serve_topk(_queries(emb), k=5, nprobe=4).collect())
    want = _want(spark, emb)
    assert len(want) > 0
    assert got == want


def test_ivf_stream_index_attach_availablenow(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    src = str(tmp_path / "src")
    emb.coalesce(2).write.mode("overwrite").parquet(src)
    idx = IvfStreamIndex(spark, str(tmp_path / "store"), seed_centroids(emb, 16))
    q = idx.attach(
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in idx.serve_topk(_queries(emb), k=5, nprobe=4).collect())
    assert got == _want(spark, emb)


def test_ivf_stream_store_is_cell_partitioned(spark, tmp_path):
    import os

    emb = load_table(spark, SF, "embeddings")
    idx = IvfStreamIndex(spark, str(tmp_path / "store"), seed_centroids(emb, 16))
    idx.ingest_batch(emb, batch_id=0)
    cells = [
        d
        for d in os.listdir(os.path.join(str(tmp_path / "store"), "batch_id=0"))
        if d.startswith("cell=")
    ]
    assert len(cells) > 1  # layout prunes by cell for pinned probe sets


def test_ivf_store_survives_restart(spark, tmp_path):
    """Restart contract for the IVF store (completing the pattern across
    all grid/index stores): a new attach from the same checkpoint ingests
    only new files, and serve equals the batch seeded-IVF query over all
    vectors."""
    emb = load_table(spark, SF, "embeddings")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    idx = IvfStreamIndex(spark, str(tmp_path / "store"), seed_centroids(emb))

    def attach_once():
        q = idx.attach(
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            ckpt,
        )
        q.awaitTermination(120)

    emb.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    attach_once()
    half = sorted(tuple(r) for r in idx.serve_topk(_queries(emb), k=5, nprobe=4).collect())

    emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    attach_once()

    got = sorted(tuple(r) for r in idx.serve_topk(_queries(emb), k=5, nprobe=4).collect())
    assert got == _want(spark, emb)
    assert got != half


def test_ivf_serve_before_first_batch(spark, tmp_path):
    """Pre-ingest serve: empty corpus, zero neighbors, no PATH_NOT_FOUND."""
    emb = load_table(spark, SF, "embeddings")
    idx = IvfStreamIndex(spark, str(tmp_path / "store"), seed_centroids(emb))
    assert idx.serve_topk(_queries(emb), k=5, nprobe=4).count() == 0
