"""Crafted-input invariants for the round-7 operators: known answers and
boundary behavior for the classifier-eval metrics (ROC/PR/isotonic), the
group-comparison suite, and the schema-discovery profilers (the sf-table
oracles verify cross-engine parity; these verify the MATH)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
    average_precision_from_grid,
    isotonic_fit_bins,
    oneway_f_from_group_sums,
    roc_auc_from_grid,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _grid(spark, rows):
    return spark.createDataFrame(rows, "pc long, pos long, neg long")


# ---------------------------------------------------------------------------
# ROC AUC — tie-aware Mann-Whitney over the score grid
# ---------------------------------------------------------------------------


def test_roc_auc_perfect_separation_is_one(spark):
    g = _grid(spark, [(10, 0, 7), (90, 5, 0)])
    row = roc_auc_from_grid(g).collect()[0]
    assert (row.n_pos, row.n_neg) == (5, 7)
    assert row.auc == 1.0
    assert row.auc_num2 == 2 * 5 * 7


def test_roc_auc_all_tied_is_half(spark):
    g = _grid(spark, [(42, 5, 7)])
    row = roc_auc_from_grid(g).collect()[0]
    assert row.auc == 0.5
    assert row.auc_num2 == 5 * 7  # 2U = pos*neg under complete ties


def test_roc_auc_hand_computed(spark):
    # scores: neg at 1,2; pos at 2,3  ->  pairs: (pos=2 vs neg=1: win),
    # (pos=2 vs neg=2: tie), (pos=3 vs neg=1: win), (pos=3 vs neg=2: win)
    # U = 3 + 0.5 = 3.5 of 4 -> AUC = 0.875
    g = _grid(spark, [(1, 0, 1), (2, 1, 1), (3, 1, 0)])
    row = roc_auc_from_grid(g).collect()[0]
    assert row.auc_num2 == 7  # 2U
    assert row.auc == 0.875


def test_roc_auc_inverted_ranker_is_zero(spark):
    g = _grid(spark, [(10, 5, 0), (90, 0, 7)])
    assert roc_auc_from_grid(g).collect()[0].auc == 0.0


# ---------------------------------------------------------------------------
# PR AUC — step-wise average precision, descending thresholds
# ---------------------------------------------------------------------------


def test_average_precision_perfect_ranker(spark):
    g = _grid(spark, [(10, 0, 7), (90, 5, 0)])
    row = average_precision_from_grid(g).collect()[0]
    assert row.pr_auc == 1.0
    assert row.best_f1 == 1.0


def test_average_precision_hand_computed(spark):
    # descending cells: (3: 1 pos), (2: 1 pos 1 neg), (1: 1 neg)
    # cell 3: dR=1/2, P=1/1;  cell 2: dR=1/2, P=2/3;  cell 1: dR=0
    # AP = 0.5*1 + 0.5*(2/3) = 5/6
    g = _grid(spark, [(1, 0, 1), (2, 1, 1), (3, 1, 0)])
    row = average_precision_from_grid(g).collect()[0]
    assert abs(row.pr_auc - 5 / 6) < 2e-6
    # F1 at cell 3: 2*1/(2+1)=2/3; at cell 2: 2*2/(2+3)=4/5; at cell 1:
    # 2*2/(2+4)=2/3 -> best 0.8
    assert abs(row.best_f1 - 0.8) < 2e-6


def test_average_precision_all_negative_ranked_top_has_low_ap(spark):
    # one pos ranked below all 9 negs: AP = 1/10 at its threshold
    g = _grid(spark, [(1, 1, 0), (2, 0, 9)])
    row = average_precision_from_grid(g).collect()[0]
    assert abs(row.pr_auc - 0.1) < 2e-6


# ---------------------------------------------------------------------------
# Isotonic (PAV via minimax) — pooling and monotonicity
# ---------------------------------------------------------------------------


def _bins(spark, rows):
    return spark.createDataFrame(rows, "bin long, w long, sy long")


def test_isotonic_monotone_input_is_unchanged(spark):
    b = _bins(spark, [(0, 4, 0), (1, 4, 1), (2, 4, 2), (3, 4, 4)])
    out = {r.bin: r for r in isotonic_fit_bins(b).collect()}
    for i in range(4):
        assert out[i].iso_p == out[i].pos_rate


def test_isotonic_pools_adjacent_violators(spark):
    # pos_rate: 0.0, 0.75, 0.25, 1.0 -> bins 1,2 violate; pooled to 0.5
    b = _bins(spark, [(0, 4, 0), (1, 4, 3), (2, 4, 1), (3, 4, 4)])
    out = {r.bin: r.iso_p for r in isotonic_fit_bins(b).collect()}
    assert out[0] == 0.0
    assert out[1] == 0.5
    assert out[2] == 0.5
    assert out[3] == 1.0


def test_isotonic_weighted_pooling(spark):
    # y=1 (w=1) then y=0 (w=3): pooled weighted avg = 1/4 for both
    b = _bins(spark, [(0, 1, 1), (1, 3, 0)])
    out = {r.bin: r.iso_p for r in isotonic_fit_bins(b).collect()}
    assert out[0] == 0.25
    assert out[1] == 0.25


def test_isotonic_output_is_nondecreasing_on_sf(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    q = all_queries()["ml_isotonic_calibration"]
    rows = sorted(q.fn(spark, SF_SMOKE).collect(), key=lambda r: r.bin)
    for a, b in zip(rows, rows[1:]):
        assert a.iso_p <= b.iso_p + 1e-9


# ---------------------------------------------------------------------------
# One-way F — zero between-group variance and a hand example
# ---------------------------------------------------------------------------


def _groups(spark, rows):
    return spark.createDataFrame(rows, "g string, n long, sx long, sxx long")


def test_oneway_f_identical_groups_is_zero(spark):
    # two groups with identical sums -> SSB = 0 -> F = 0
    s = _groups(spark, [("a", 4, 20, 120), ("b", 4, 20, 120)])
    row = oneway_f_from_group_sums(s.drop("g")).collect()[0]
    assert row.f_stat == 0.0
    assert row.eta_sq == 0.0


def test_oneway_f_hand_computed(spark):
    # group a: values 1,2,3 (n=3, sx=6, sxx=14); group b: 4,5,6 (15, 77)
    # means 2, 5; grand 3.5; SSB = 3*(2-3.5)^2 + 3*(5-3.5)^2 = 13.5
    # SSW = 2 + 2 = 4; F = (13.5/1)/(4/4) = 13.5; eta2 = 13.5/17.5
    s = _groups(spark, [("a", 3, 6, 14), ("b", 3, 15, 77)])
    row = oneway_f_from_group_sums(s.drop("g")).collect()[0]
    assert abs(row.f_stat - 13.5) < 2e-6
    assert abs(row.eta_sq - 13.5 / 17.5) < 2e-6


# ---------------------------------------------------------------------------
# Schema discovery — ground truth on the generated star schema
# ---------------------------------------------------------------------------


def test_inclusion_dependencies_true_fk_is_one(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    q = all_queries()["dq_inclusion_dependencies"]
    rows = {r.candidate: r for r in q.fn(spark, SF_SMOKE).collect()}
    assert rows["orders.o_custkey in customer.c_custkey"].inclusion == 1.0
    assert rows["lineitem.l_partkey in part.p_partkey"].inclusion == 1.0
    for r in rows.values():
        assert 0.0 <= r.inclusion <= 1.0
        assert r.n_contained <= r.n_lhs


def test_functional_dependencies_rates_are_rates(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    q = all_queries()["dq_functional_dependencies"]
    rows = {r.candidate: r for r in q.fn(spark, SF_SMOKE).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert 0.0 <= r.violation_rate <= 1.0
        assert r.n_violating <= r.n_lhs
        assert r.max_rhs >= 1


def test_cramers_v_bounds_on_sf(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    q = all_queries()["stats_cramers_v"]
    row = q.fn(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row.cramers_v <= 1.0
    assert row.chi2 >= 0.0


# ---------------------------------------------------------------------------
# Apriori triples — crafted baskets + the lossless-prune plan pin
# ---------------------------------------------------------------------------


def test_frequent_triples_crafted_baskets(spark, tmp_path):
    # orders: 1..3 contain {1,2,3}; order 4 contains {1,2,4}; order 5 {5,6,7}
    rows = []
    for ok, parts in [(1, [1, 2, 3]), (2, [1, 2, 3]), (3, [1, 2, 3]),
                      (4, [1, 2, 4]), (5, [5, 6, 7])]:
        for i, p in enumerate(parts):
            rows.append((ok, p, i, 1.0, 10.0, 0.0, 0.0, "N", "O", "2024-01-01"))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/lineitem.parquet")
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    q = all_queries()["orders_frequent_triples"]
    out = {(r.part_a, r.part_b, r.part_c): r for r in q.fn(spark, d).collect()}
    # only {1,2,3} reaches support 2 (3 orders); {1,2,4} and {5,6,7} are 1-offs
    assert set(out) == {(1, 2, 3)}
    assert out[(1, 2, 3)].n_orders_all3 == 3
    assert abs(out[(1, 2, 3)].support - 3 / 5) < 1e-9


def test_frequent_triples_plan_has_apriori_semi_join(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    q = all_queries()["orders_frequent_triples"]
    plan = q.fn(spark, SF_SMOKE)._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan, plan


def test_lateral_topk_matches_window_form(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries
    from pyspark.sql import Window

    q = all_queries()["sql_lateral_topk"]
    got = {
        (r.c_custkey, r.o_orderkey) for r in q.fn(spark, SF_SMOKE).collect()
    }
    c = load_table(spark, SF_SMOKE, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, SF_SMOKE, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    want = {
        (r.c_custkey, r.o_orderkey)
        for r in c.join(o, c.c_custkey == o.o_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .collect()
    }
    assert got == want and got


# ---------------------------------------------------------------------------
# CDC chunking — the insertion-shift robustness that defines CDC
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").alias("n_chars"),
    )
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/documents.parquet")
    return d


def test_cdc_chunks_survive_prefix_insertion(spark, tmp_path):
    """Two documents sharing a long tail, one with extra words prepended:
    content-defined boundaries re-synchronize after the edit, so shared
    chunks are still detected (a fixed-width chunker would find none)."""
    shared = " ".join(f"tok{i}" for i in range(200))
    d = _write_docs(
        spark,
        tmp_path,
        [(1, shared), (2, "INSERTED WORDS AT FRONT " + shared)],
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    out = all_queries()["dedup_cdc_chunks"].fn(spark, d).collect()
    assert len(out) >= 5  # many interior chunks shared despite the shift
    for r in out:
        assert r.n_docs == 2


def test_cdc_chunks_disjoint_docs_share_nothing(spark, tmp_path):
    d = _write_docs(
        spark,
        tmp_path,
        [(1, " ".join(f"aa{i}" for i in range(100))),
         (2, " ".join(f"bb{i}" for i in range(100)))],
    )
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    assert all_queries()["dedup_cdc_chunks"].fn(spark, d).collect() == []


# ---------------------------------------------------------------------------
# LLR collocations — hand-computed Dunning statistic
# ---------------------------------------------------------------------------


def test_bigram_llr_hand_computed(spark, tmp_path):
    # corpus bigrams: "a b" x 6, "a c" x 6, "d b" x 6, "d c" x 6, "e f" x 6
    # For (a,b): k11=6, r=12, c=12, N=30
    rows = []
    did = 0
    for pair in [("a", "b"), ("a", "c"), ("d", "b"), ("d", "c"), ("e", "f")]:
        for _ in range(6):
            rows.append((did, f"{pair[0]} {pair[1]}"))
            did += 1
    d = _write_docs(spark, tmp_path, rows)
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    out = {(r.a, r.b): r.llr for r in all_queries()["corpus_bigram_llr"].fn(spark, d).collect()}
    k11, r, c, n = 6.0, 12.0, 12.0, 30.0
    k12, k21 = r - k11, c - k11
    k22 = n - r - c + k11
    want = 2.0 * (
        k11 * math.log(k11 * n / (r * c))
        + k12 * math.log(k12 * n / (r * (n - c)))
        + k21 * math.log(k21 * n / ((n - r) * c))
        + k22 * math.log(k22 * n / ((n - r) * (n - c)))
    )
    assert abs(out[("a", "b")] - want) < 2e-6
    # (e,f) is a perfect collocation: r = c = k11 = 6 -> k12 = k21 = 0
    k11, r, c = 6.0, 6.0, 6.0
    k22 = n - r - c + k11
    want_ef = 2.0 * (
        k11 * math.log(k11 * n / (r * c))
        + k22 * math.log(k22 * n / ((n - r) * (n - c)))
    )
    assert abs(out[("e", "f")] - want_ef) < 2e-6
    assert out[("e", "f")] > out[("a", "b")]  # LLR prefers the pure pair


# ---------------------------------------------------------------------------
# Normal-tail p-values — A&S polynomial vs math.erfc
# ---------------------------------------------------------------------------


def test_p_two_sided_matches_erfc(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import p_two_sided

    zs = [0.0, 0.5, 1.0, 1.96, 2.575, 4.0, -1.96]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {r.z: r.p for r in df.select("z", p_two_sided(F.col("z")).alias("p")).collect()}
    for z in zs:
        want = math.erfc(abs(z) / math.sqrt(2.0))
        assert abs(got[z] - want) < 3e-7  # A&S 7.1.26 bound is 1.5e-7 on erf


def test_two_proportion_z_hand_computed(spark, tmp_path):
    # cohort 0 (even users): 2 of 4 convert; cohort 1 (odd): 3 of 4
    rows = []
    eid = 0
    for uid in range(8):
        converts = (uid % 2 == 0 and uid < 4) or (uid % 2 == 1 and uid < 7)
        val = 250.0 if converts else 10.0
        rows.append((eid, "2024-01-01 00:00:00", uid, "purchase", val, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/events.parquet")
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    row = all_queries()["stats_two_proportion_z"].fn(spark, d).collect()[0]
    assert (row.n0, row.n1, row.c0, row.c1) == (4, 4, 2, 3)
    p0, p1, pp = 0.5, 0.75, 5 / 8
    want_z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / 4 + 1 / 4))
    assert abs(row.z - want_z) < 2e-6
    assert abs(row.p_value - math.erfc(abs(want_z) / math.sqrt(2))) < 1e-5


def test_fdr_bh_rejections_are_a_rank_prefix(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    rows = sorted(
        all_queries()["stats_fdr_bh"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    # p nondecreasing in rank; rejected set is a prefix
    for a, b in zip(rows, rows[1:]):
        assert a.p_value <= b.p_value + 1e-9
        assert a.rejected or not b.rejected
    # BH step-up definition holds on the emitted values
    m = len(rows)
    thr = max((r.rnk for r in rows if r.p_value <= 0.10 * r.rnk / m), default=0)
    for r in rows:
        assert r.rejected == (r.rnk <= thr)


def test_silhouette_bounds_and_coverage(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    rows = all_queries()["embedding_silhouette"].fn(spark, SF_SMOKE).collect()
    n_emb = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n for r in rows) == n_emb
    for r in rows:
        assert -1.0 <= r.mean_sil <= 1.0


# ---------------------------------------------------------------------------
# Permutation test / fuzzy linkage / ORC round-trip
# ---------------------------------------------------------------------------


def test_permutation_test_separated_groups_min_p(spark, tmp_path):
    # src0 docs ~ length 10, src1 ~ length 1000: no fair-coin relabeling
    # comes near the observed gap -> n_exceed = 0, p = 1/33
    rows = [(i, "x" * 10, "en", "src0", 10) for i in range(40)]
    rows += [(100 + i, "x" * 1000, "en", "src1", 1000) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/documents.parquet")
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    row = all_queries()["stats_permutation_test"].fn(spark, d).collect()[0]
    assert row.n == 80
    assert row.n_exceed == 0
    assert abs(row.p_mc - 1 / 33) < 2e-6
    assert abs(row.obs_diff - 990.0) < 1e-9


def test_fuzzy_orders_tolerance_and_blocking(spark, tmp_path):
    rows = [
        # same cust, same month, within 1% -> pair
        (1, 10, "O", 10000.00, "2024-03-05 00:00:00", "1-URGENT"),
        (2, 10, "O", 10050.00, "2024-03-20 00:00:00", "1-URGENT"),
        # same cust, same month, 5% apart -> no pair
        (3, 10, "O", 20000.00, "2024-03-07 00:00:00", "1-URGENT"),
        (4, 10, "O", 21000.00, "2024-03-08 00:00:00", "1-URGENT"),
        # same cust, within 1% but different months -> blocked out
        (5, 11, "O", 5000.00, "2024-01-31 00:00:00", "1-URGENT"),
        (6, 11, "O", 5000.00, "2024-02-01 00:00:00", "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/orders.parquet")
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    out = all_queries()["dedup_fuzzy_orders"].fn(spark, d).collect()
    assert [(r.ok_a, r.ok_b, r.month, r.diff_cents) for r in out] == [
        (1, 2, "2024-03", 5000)
    ]


def test_orc_round_trip(spark, tmp_path):
    from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
    from real_time_scraping_and_predicting_time_series_data_spark.sources.sinks import write_orc

    docs = load_table(spark, SF_SMOKE, "documents")
    p = str(tmp_path / "docs_orc")
    write_orc(docs, p)
    back = spark.read.orc(p)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.select("doc_id", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "n_chars").collect()}
    assert a == b


# ---------------------------------------------------------------------------
# md5-register HLL — mergeability + accuracy envelope
# ---------------------------------------------------------------------------


def test_hll_registers_merge_by_max(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )

    df = spark.range(0, 20000).select(F.col("id").cast("string").alias("s"))
    whole = hll_registers(df, F.col("s"))
    h1 = hll_registers(df.filter(F.col("s").cast("long") % 2 == 0), F.col("s"))
    h2 = hll_registers(df.filter(F.col("s").cast("long") % 2 == 1), F.col("s"))
    merged = (
        h1.unionAll(h2).groupBy("idx").agg(F.max("M").cast("long").alias("M"))
    )
    a = {(r.idx, r.M) for r in whole.collect()}
    b = {(r.idx, r.M) for r in merged.collect()}
    assert a == b
    est_whole = hll_estimate_from_registers(whole).collect()[0]
    est_merged = hll_estimate_from_registers(merged).collect()[0]
    assert tuple(est_whole) == tuple(est_merged)
    assert abs(est_whole.hll_estimate - 20000) / 20000 < 0.05  # ~3 sigma


def test_hll_md5_query_error_envelope(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    row = all_queries()["sketch_hll_md5"].fn(spark, SF_SMOKE).collect()[0]
    assert row.n_registers <= 4096
    assert abs(row.rel_err) < 0.08  # small-range regime at sf0.001


# ---------------------------------------------------------------------------
# Harmonic regression — exact recovery of a planted weekly cycle
# ---------------------------------------------------------------------------


def test_harmonic_regression_recovers_planted_cycle(spark, tmp_path):
    # y_d = 100 + 40*sin(2*pi*d/7) + 20*cos(2*pi*d/7), 70 days, one purchase
    # per day whose value is y_d -> the fit must recover (100, 40, 20), R²=1
    rows = []
    for d in range(70):
        ang = 2 * math.pi * (d % 7) / 7
        y = 100.0 + 40.0 * math.sin(ang) + 20.0 * math.cos(ang)
        y = round(y * 100) / 100  # integer cents like the engine
        ts = f"2024-01-{(d % 28) + 1:02d} 12:00:00" if d < 28 else None
        rows.append((d, d, y))
    df = spark.createDataFrame(rows, "event_id long, day long, value double").select(
        "event_id",
        (F.lit("2024-01-01 12:00:00").cast("timestamp") + F.make_dt_interval(F.col("day"))).alias("ts"),
        F.col("event_id").alias("user_id"),
        F.lit("purchase").alias("event_type"),
        "value",
        F.lit("{}").alias("props"),
    )
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/events.parquet")
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    row = all_queries()["ml_harmonic_regression"].fn(spark, d).collect()[0]
    assert row.n == 70
    assert abs(row.b0 - 100.0) < 0.01
    # the query's day index is days-since-epoch, so (b1, b2) is a phase
    # ROTATION of the planted (40, 20); the amplitude is invariant
    amp = math.hypot(row.b1, row.b2)
    assert abs(amp - math.hypot(40.0, 20.0)) < 0.01
    assert row.r2 > 0.999


def test_clustering_coefficient_triangle_plus_star(spark, tmp_path):
    # orders making: triangle {1,2,3} (each pair co-ordered twice) and a
    # star 10-{11,12,13} (each pair twice, no closure)
    rows = []
    ok = 0
    def add_order(parts):
        nonlocal ok
        ok += 1
        for i, p in enumerate(parts):
            rows.append((ok, p, i, 1.0, 10.0, 0.0, 0.0, "N", "O", "2024-01-01"))
    for _ in range(2):
        add_order([1, 2, 3])
        add_order([10, 11])
        add_order([10, 12])
        add_order([10, 13])
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/lineitem.parquet")
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    row = all_queries()["graph_clustering_coefficient"].fn(spark, d).collect()[0]
    # triangle: 3 nodes deg 2 -> 3 wedges, 1 triangle; star: hub deg 3 ->
    # 3 wedges, leaves deg 1 -> 0.  total wedges 6, triangles 1, C = 0.5
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (7, 6, 6, 1)
    assert abs(row.global_coeff - 0.5) < 1e-9


# ---------------------------------------------------------------------------
# Croston — hand recursion on a crafted intermittent series
# ---------------------------------------------------------------------------


def test_croston_hand_recursion(spark, tmp_path):
    # user 1 demand: day 0 -> 10.0, day 5 -> 20.0, day 6 -> 30.0
    # z: 10 -> 11 -> 12.9 ; p: 1 -> 1 + .1*(5-1)=1.4 -> 1.4 + .1*(1-1.4)=1.36
    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 10.0, "{}"),
        (2, "2024-01-06 10:00:00", 1, "purchase", 20.0, "{}"),
        (3, "2024-01-07 10:00:00", 1, "purchase", 30.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/events.parquet")
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    row = all_queries()["ts_croston_forecast"].fn(spark, d).collect()[0]
    assert row.n_periods == 3
    assert abs(row.level - 12.9) < 2e-6
    assert abs(row.interval - 1.36) < 2e-6
    assert abs(row.croston_forecast - 12.9 / 1.36) < 2e-6


# ---------------------------------------------------------------------------
# Hypothesis properties for the metric cores
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    cells=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=12,
    )
)
@SLOW
def test_roc_auc_complement_symmetry(spark, cells):
    """Swapping the class labels must complement the AUC: 2U' = 2ab − 2U.
    Holds exactly in the BIGINT numerator for any grid."""
    seen = {}
    for pc, pos, neg in cells:
        seen[pc] = (pos, neg)
    rows = [(pc, p, n) for pc, (p, n) in seen.items()]
    if sum(p for _, p, _ in rows) == 0 or sum(n for _, _, n in rows) == 0:
        return  # degenerate: one class empty
    g = _grid(spark, rows)
    gswap = _grid(spark, [(pc, n, p) for pc, p, n in rows])
    a = roc_auc_from_grid(g).collect()[0]
    b = roc_auc_from_grid(gswap).collect()[0]
    assert a.auc_num2 + b.auc_num2 == 2 * a.n_pos * a.n_neg
    assert (a.n_pos, a.n_neg) == (b.n_neg, b.n_pos)


@given(
    bins=st.lists(
        st.tuples(st.integers(1, 20), st.integers(0, 20)), min_size=1, max_size=8
    )
)
@SLOW
def test_isotonic_is_monotone_and_mean_preserving(spark, bins):
    """For ANY bin histogram: the PAV fit is nondecreasing in bin order and
    preserves the weighted total (Σ w·iso == Σ sy — the projection
    property of isotonic regression)."""
    rows = [(i, w, min(sy, w)) for i, (w, sy) in enumerate(bins)]
    b = spark.createDataFrame(rows, "bin long, w long, sy long")
    out = sorted(isotonic_fit_bins(b).collect(), key=lambda r: r.bin)
    for x, y in zip(out, out[1:]):
        assert x.iso_p <= y.iso_p + 1e-9
    got_total = sum(r.iso_p * r.n_bin for r in out)
    want_total = sum(sy for _, _, sy in rows)
    # iso_p is canonicalized at 1e-6, so the preserved total is within
    # Σw ulps of that quantization
    assert abs(got_total - want_total) <= 1e-6 * sum(w for _, w, _ in rows) + 1e-9


@given(
    cells=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=10,
    )
)
@SLOW
def test_average_precision_in_unit_interval(spark, cells):
    seen = {}
    for pc, pos, neg in cells:
        seen[pc] = (pos, neg)
    rows = [(pc, p, n) for pc, (p, n) in seen.items()]
    if sum(p for _, p, _ in rows) == 0 or sum(n for _, _, n in rows) == 0:
        return
    g = _grid(spark, rows)
    row = average_precision_from_grid(g).collect()[0]
    assert 0.0 <= row.pr_auc <= 1.0 + 1e-9
    assert 0.0 <= row.best_f1 <= 1.0 + 1e-9


def test_average_precision_tolerates_empty_leading_cell(spark):
    """r7 verdict regression pin: a grid whose HIGHEST-score cell holds
    zero rows (pos=0, neg=0) used to make the leading cumulative
    precision term an ANSI divide-by-zero.  The falsifying hypothesis
    example, frozen so the fix is seed-independent: one real cell at
    pc=0 (1 pos, 1 neg) plus an empty cell at pc=1.  Expected values:
    precision at the single non-empty threshold = 1/2, so AP = 1·(1/2)
    and best F1 = 2·1/(1+1+1) = 2/3."""
    g = _grid(spark, [(0, 1, 1), (1, 0, 0)])
    row = average_precision_from_grid(g).collect()[0]
    assert (row.n_pos, row.n_neg) == (1, 1)
    assert abs(row.pr_auc - 0.5) < 2e-6
    assert abs(row.best_f1 - 2.0 / 3.0) < 2e-6
    # and the empty cell is a true no-op: same grid without it agrees
    base = average_precision_from_grid(_grid(spark, [(0, 1, 1)])).collect()[0]
    assert (base.pr_auc, base.best_f1) == (row.pr_auc, row.best_f1)


# ---------------------------------------------------------------------------
# Boosted stumps — hand-computed two-round fit on a separable grid
# ---------------------------------------------------------------------------


def test_boosted_stumps_hand_computed(spark, tmp_path):
    # x in {10, 20}: z = 0 (2 docs each); x in {30, 40}: z = 1 (2 docs each)
    # f0 = 0.5; stage-1 split at x=20 (SSE 0): leaves ±0.5, lr 0.5 -> ±0.25
    # residuals ±0.25 piecewise constant -> stage-2 split x=20 again,
    # leaves ±0.125, train mse proxy 0
    rows = []
    did = 0
    for x, z in [(10, 0), (20, 0), (30, 1), (40, 1)]:
        for _ in range(2):
            rows.append((did, "w " * 3, "en", "src1" if z else "src0", x))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/documents.parquet")
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    row = all_queries()["ml_boosted_stumps"].fn(spark, d).collect()[0]
    assert row.n == 8
    assert row.split1 == 20
    assert row.f0 == 0.5
    assert row.leaf1_l == -0.25 and row.leaf1_r == 0.25
    assert row.split2 == 20
    assert row.leaf2_l == -0.125 and row.leaf2_r == 0.125
    assert row.train_mse_proxy == 0.0


# ---------------------------------------------------------------------------
# Theta method — replicated recursion on a crafted series
# ---------------------------------------------------------------------------


def test_theta_forecast_replicates_hand_recursion(spark, tmp_path):
    # one purchase per day, values 10, 14, 12, 20, 16, 22
    vals = [10.0, 14.0, 12.0, 20.0, 16.0, 22.0]
    rows = [
        (i, f"2024-01-{i+1:02d} 12:00:00", i, "purchase", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/events.parquet")
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    row = all_queries()["ts_theta_forecast"].fn(spark, d).collect()[0]
    n = len(vals)
    tbar = (n + 1) / 2
    ybar = sum(vals) / n
    b = sum((t + 1 - tbar) * (y - ybar) for t, y in enumerate(vals)) / sum(
        (t + 1 - tbar) ** 2 for t in range(n)
    )
    a = ybar - b * tbar
    lvl = None
    for t, y in enumerate(vals, start=1):
        z = 2 * y - (a + b * t)
        lvl = z if lvl is None else lvl + 0.2 * (z - lvl)
    assert row.n == n
    assert abs(row.trend_slope - b) < 1e-4
    assert abs(row.theta2_level - lvl) < 1e-4
    want_h1 = 0.5 * (a + b * (n + 1)) + 0.5 * lvl
    assert abs(row.forecast_h1 - want_h1) < 1e-4
    # horizon spacing follows the trend: f(h+1) - f(h) = b/2
    assert abs((row.forecast_h2 - row.forecast_h1) - b / 2) < 1e-4
