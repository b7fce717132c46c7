"""Round-9 operators: compressed codes inside the IVF cell join with
relation-side query sets (binary Hamming + SQ8 ADC), and their audits."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
    binary_hamming_topk,
    ivf_binary_topk_relation,
    sq8_adc_topk,
    sq8_topk_relation,
)

SF = "/root/testdata/sf0.001"


def _no_query_broadcast(out):
    """Plan pin shared by the relation serves: the candidate join must be
    a shuffle join on the cell key; any BroadcastHashJoin present must not
    be keyed on cell (only the one-row centroid/code model broadcasts)."""
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    for ln in plan.splitlines():
        if "BroadcastHashJoin" in ln:
            assert "cell" not in ln.split("BroadcastHashJoin")[1].split(",")[0]


def test_ivf_binary_relation_plan_has_no_query_broadcast(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    _no_query_broadcast(ivf_binary_topk_relation(emb, queries, k=3, n_cells=8, nprobe=2))


def test_sq8_relation_plan_has_no_query_broadcast(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    _no_query_broadcast(sq8_topk_relation(emb, queries, k=3, n_cells=8, nprobe=2))


def test_ivf_binary_full_probe_equals_full_scan(spark):
    """With nprobe = n_cells every cell is probed, so the cell-pruned
    composition must reproduce the full-scan `binary_hamming_topk`
    EXACTLY (same pool, same queries, same tie-breaks) — pins that the
    IVF stage only prunes, never re-ranks."""
    emb = load_table(spark, SF, "embeddings")
    n_q = 8
    queries = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = binary_hamming_topk(emb, k=5, pool=15, n_queries=n_q)
    composed = ivf_binary_topk_relation(
        emb, queries, k=5, n_cells=8, nprobe=8, pool=15
    )
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, composed.collect()))
    assert a == b and len(a) == n_q * 5


def test_sq8_full_probe_equals_full_scan(spark):
    """SQ8 twin of the full-probe identity: nprobe = n_cells composition
    == the broadcast full-scan `sq8_adc_topk`."""
    emb = load_table(spark, SF, "embeddings")
    n_q = 8
    queries = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = sq8_adc_topk(emb, k=5, pool=15, n_queries=n_q)
    composed = sq8_topk_relation(emb, queries, k=5, n_cells=8, nprobe=8, pool=15)
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, composed.collect()))
    assert a == b and len(a) == n_q * 5


def test_ivf_binary_relation_external_query_ids(spark):
    """External-id query relation (the ADVICE r8 shape): 3k queries whose
    ids collide with corpus ids must NOT lose neighbors when
    exclude_self=False — every query returns exactly k ranked rows."""
    emb = load_table(spark, SF, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    nq = 3_000
    queries = spark.range(nq).select(
        F.col("id").alias("query_id"),  # deliberately overlapping id space
        F.array(
            *[
                (F.sin(F.col("id") * 0.61 + i) + F.lit(1.2)).cast("float")
                for i in range(dim)
            ]
        ).alias("embedding"),
    )
    out = ivf_binary_topk_relation(
        emb, queries, k=3, n_cells=8, nprobe=2, pool=10, exclude_self=False
    )
    agg = out.groupBy("query_id").agg(F.count("*").alias("n"), F.max("rank").alias("mx"))
    rows = agg.collect()
    assert len(rows) == nq
    assert all(r.n == 3 and r.mx == 3 for r in rows)


def test_fixed_lstm_forward_properties(spark):
    """The fixed-weight LSTM twin (M1/M3 in-CI path): deterministic across
    calls, sensitive to its input (different windows -> different
    forecasts), output bounded by the hard-activation envelope (|y| <=
    50 * 0.1 + 0.1 after the Dense fold), and zero-input gives the pure
    bias-driven baseline rather than zeros."""
    from real_time_scraping_and_predicting_time_series_data_spark.ml.keras_forecast import (
        fixed_lstm_forward,
    )

    xs_a = [i / 9.0 for i in range(10)]
    xs_b = [1.0 - i / 9.0 for i in range(10)]
    a1, a2, b = fixed_lstm_forward(xs_a), fixed_lstm_forward(xs_a), fixed_lstm_forward(xs_b)
    assert a1 == a2  # bit-identical rerun
    assert a1 != b  # input sensitivity
    assert all(abs(y) <= 5.1 for y in a1)  # |h2|<=1 so |dense| <= 50*0.1+0.1
    z = fixed_lstm_forward([0.0] * 10)
    assert any(abs(y) > 1e-9 for y in z)


def test_lstm_query_shape_and_determinism(spark):
    """ml_lstm_fixed_inference: one 5-step forecast per event_type, rerun-
    identical, forecasts inside the window's [mn, mx] span widened by the
    dense envelope."""
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import (
        all_queries,
    )

    fn = all_queries()["ml_lstm_fixed_inference"].fn
    a = sorted(map(tuple, fn(spark, SF).collect()))
    b = sorted(map(tuple, fn(spark, SF).collect()))
    assert a == b
    types = {r[0] for r in a}
    assert len(a) == len(types) * 5
    steps = sorted(r[1] for r in a if r[0] == a[0][0])
    assert steps == [1, 2, 3, 4, 5]


def test_ivf_binary_recall_audit_bounds(spark):
    """Audit sanity: recall/ndcg in [0,1], n_hit <= k, one row per panel
    query; with nprobe=4/16 and pool=15 the mean recall must clear the
    coarse-code floor (>= 0.4) on the test corpus."""
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        q_sim_ivf_binary_recall_audit,
    )

    rows = q_sim_ivf_binary_recall_audit(spark, SF).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 <= r.recall <= 1.0 and 0.0 <= r.ndcg <= 1.0
        assert r.n_hit <= r.k == 5
    assert sum(r.recall for r in rows) / len(rows) >= 0.4
