"""Round-8 operators: query-side-as-relation ANN serving."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
    ivf_topk_relation,
    ivf_topk_seeded,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ivf_topk_relation — the millions-of-queries serving shape
# ---------------------------------------------------------------------------


def test_relation_path_bit_identical_to_broadcast_path(spark):
    """On the same inputs the relation path and the broadcast seeded path
    run IDENTICAL arithmetic (same centroids, same fold order, same
    tie-breaks) — results must agree exactly, row for row."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(
        map(tuple, ivf_topk_seeded(emb, queries, k=5, n_cells=8, nprobe=3).collect())
    )
    b = sorted(
        map(tuple, ivf_topk_relation(emb, queries, k=5, n_cells=8, nprobe=3).collect())
    )
    assert a == b and len(a) > 0


def test_relation_path_handles_10k_query_relation(spark):
    """The scale claim made concrete: a 12k-row query RELATION (built
    executor-side from spark.range — never collected, never broadcast)
    against the corpus.  Every query must come back with exactly k ranked
    neighbors and rank 1 must dominate rank k."""
    emb = load_table(spark, SF, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    nq = 12_000
    queries = spark.range(nq).select(
        (F.col("id") + 1_000_000).alias("query_id"),
        F.array(
            *[
                (F.sin(F.col("id") * 0.37 + i) + F.lit(1.5)).cast("float")
                for i in range(dim)
            ]
        ).alias("embedding"),
    )
    out = ivf_topk_relation(emb, queries, k=3, n_cells=8, nprobe=2)
    agg = out.groupBy("query_id").agg(
        F.count("*").alias("n"),
        F.max("rank").alias("maxr"),
        F.min("rank").alias("minr"),
        (F.max(F.when(F.col("rank") == 1, F.col("cos")))
         - F.max(F.when(F.col("rank") == 3, F.col("cos")))).alias("spread"),
    )
    rows = agg.collect()
    assert len(rows) == nq
    assert all(r.n == 3 and r.minr == 1 and r.maxr == 3 for r in rows)
    assert all(r.spread >= 0 for r in rows)


def test_relation_path_plan_has_no_broadcast_of_queries(spark):
    """Plan pin for the scale shape: the candidate join must be a SHUFFLE
    join (both sides exchanged on the cell key), not a broadcast of the
    query side; the only BroadcastExchange rows allowed are the one-row
    centroid model.  And nothing in the Python path collects."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_topk_relation(emb, queries, k=3, n_cells=8, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    # broadcasts present must all be the single-row centroid model
    # (HashedRelation with the collapsed struct list), never the query
    # relation: a broadcast join keyed on cell would name it
    for ln in plan.splitlines():
        if "BroadcastHashJoin" in ln:
            assert "cell" not in ln.split("BroadcastHashJoin")[1].split("," )[0]
