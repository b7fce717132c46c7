"""Crafted-input invariants for the round-5 operators: hand-computable
fixtures (the sf-table oracles verify cross-engine parity; these verify
the MATH — known answers, boundary behavior, losslessness claims)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import grid_cumsum

BASE = dt.datetime(2024, 1, 1)

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# grid_cumsum: equals the naive single-partition running sum for ANY grid
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 9)), min_size=1, max_size=30
    )
)
@SLOW
def test_grid_cumsum_matches_naive(spark, vals):
    # dedupe keys (grids have distinct order values by construction)
    seen = {}
    for v, c in vals:
        seen[v] = c
    rows = [(v, c) for v, c in seen.items()]
    g = spark.createDataFrame(rows, "v long, cnt long")
    got = {
        r.v: r.cum_cnt
        for r in grid_cumsum(g, ["cnt"], nbuckets=4).collect()
    }
    run, want = 0, {}
    for v, c in sorted(rows):
        run += c
        want[v] = run
    assert got == want
    # r14: the closed-form value_range bucketing (no percentile bounds job)
    # is just another monotone tiling — identical output, including when
    # the declared range is narrower than the data (out-of-range rows land
    # in clamped-order buckets that still tile the sort order).
    got_r = {
        r.v: r.cum_cnt
        for r in grid_cumsum(
            g, ["cnt"], nbuckets=4, value_range=(-50, 50)
        ).collect()
    }
    assert got_r == want
    got_narrow = {
        r.v: r.cum_cnt
        for r in grid_cumsum(
            g, ["cnt"], nbuckets=4, value_range=(-5, 5)
        ).collect()
    }
    assert got_narrow == want


# ---------------------------------------------------------------------------
# prefix filter: lossless vs brute force on crafted near-dup docs
# ---------------------------------------------------------------------------


def test_prefix_filter_finds_all_high_jaccard_pairs(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.dedup import (
        q_jaccard_prefix_filter,
    )

    # docs 0/1 share most 3-grams (J >= 0.5); doc 2 unrelated; doc 3 is a
    # copy of 0 (J = 1.0)
    texts = [
        "a b c d e f g h i j",
        "a b c d e f g h i x",
        "q r s t u v w x y z extra tokens here now",
        "a b c d e f g h i j",
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    import real_time_scraping_and_predicting_time_series_data_spark.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = lambda s, d, n: docs  # noqa: E731
        # call the registered fn through the module-level load_table patch
        from real_time_scraping_and_predicting_time_series_data_spark.operators import dedup as dd

        orig_dd = dd.load_table
        dd.load_table = lambda s, d, n: docs
        try:
            out = {
                (r.id_a, r.id_b): r.jaccard
                for r in q_jaccard_prefix_filter(spark, "ignored").collect()
            }
        finally:
            dd.load_table = orig_dd
    finally:
        cat.load_table = orig

    assert (0, 3) in out and out[(0, 3)] == 1.0
    assert (0, 1) in out and 0.5 <= out[(0, 1)] < 1.0
    assert (1, 3) in out
    assert all(2 not in pair for pair in out)


# ---------------------------------------------------------------------------
# logistic Newton: separates linearly separable crafted data
# ---------------------------------------------------------------------------


def test_logistic_newton_separates(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        _logistic_coeffs,
    )

    # x1 separates the classes; x2 is noise (varies, uncorrelated with z)
    rows = [
        (float(x) / 10.0, float(x % 7) / 7.0, 1.0 if x > 50 else 0.0)
        for x in range(0, 101, 2)
    ]
    d = spark.createDataFrame(rows, "x1 double, x2 double, z double")
    w = _logistic_coeffs(d).collect()[0]
    assert w.w1 > 0  # larger x1 -> class 1
    assert abs(w.w2) < abs(w.w1)  # noise feature carries less weight
    # decision boundary near x1 = 5.0 (the midpoint)
    assert abs(-w.w0 / w.w1 - 5.0) < 1.5


# ---------------------------------------------------------------------------
# Hampel: replaces the planted spike, leaves clean ticks alone
# ---------------------------------------------------------------------------


def test_hampel_replaces_spike(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    vals = [10.0, 10.1, 9.9, 500.0, 10.2, 10.0, 9.8]
    rows = [
        (i, BASE + dt.timedelta(seconds=i), 1, v, "{}", "click")
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double, props string, event_type string"
    )
    from real_time_scraping_and_predicting_time_series_data_spark.operators import rolling as rl

    orig = rl.load_table
    rl.load_table = lambda s, d, n: ev
    try:
        out = {r.event_id: r for r in all_queries()["ts_hampel_filter"].fn(spark, "x").collect()}
    finally:
        rl.load_table = orig
    assert out[3].is_spike and out[3].despiked != 500.0
    assert not out[1].is_spike and out[1].despiked == 10.1


# ---------------------------------------------------------------------------
# MACD: constant series has zero macd / signal / hist everywhere
# ---------------------------------------------------------------------------


def test_macd_constant_series_is_zero(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.indicators import macd

    rows = [(i, BASE + dt.timedelta(seconds=i), 1, 42.0) for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    out = macd(df).collect()
    assert all(r.macd == 0.0 and r.macd_signal == 0.0 and r.macd_hist == 0.0 for r in out)


# ---------------------------------------------------------------------------
# Kaplan-Meier math on a hand-computed cohort
# ---------------------------------------------------------------------------


def test_kaplan_meier_hand_computed(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators import funnel as fn
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    # 4 users; corpus ends day 10. lifetimes: u1: d0..d2 (t=2, died),
    # u2: d0..d2 (t=2, died), u3: d0..d5 (t=5, died), u4: d0..d10 (t=10,
    # censored). KM: at t=2 n_risk=4, d=2 -> S=0.5; at t=5 n_risk=2, d=1
    # -> S=0.25.
    def d(day, hour=0):
        return BASE + dt.timedelta(days=day, hours=hour)

    rows = []
    eid = 0
    for uid, last, in ((1, 2), (2, 2), (3, 5), (4, 10)):
        for day in (0, last):
            rows.append((eid, d(day), uid, "click", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    orig = fn._t
    fn._t = lambda s, dd, n: ev
    try:
        out = {r.day: r for r in all_queries()["events_kaplan_meier"].fn(spark, "x").collect()}
    finally:
        fn._t = orig
    assert out[2].n_risk == 4 and out[2].n_deaths == 2
    assert out[2].survival == pytest.approx(0.5)
    assert out[5].n_risk == 2 and out[5].n_deaths == 1
    assert out[5].survival == pytest.approx(0.25)
    assert 10 not in out  # censored users never create a survival step


# ---------------------------------------------------------------------------
# Gini: degenerate and maximal concentration bounds
# ---------------------------------------------------------------------------


def test_gini_bounds(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators import stats as stx
    from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

    def run(revenues):
        rows = [
            (i, i, "O", float(r), dt.date(2024, 1, 1), "1-URGENT", "c", 0, "x")
            for i, r in enumerate(revenues)
        ]
        o = spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double,"
            " o_orderdate date, o_orderpriority string, o_clerk string,"
            " o_shippriority int, o_comment string",
        )
        orig = stx.load_table
        stx.load_table = lambda s, d, n: o
        try:
            return all_queries()["orders_revenue_concentration"].fn(spark, "x").collect()[0]
        finally:
            stx.load_table = orig

    eq = run([100.0] * 10)
    assert eq.gini == pytest.approx(0.0, abs=1e-6)
    assert eq.top10_share == pytest.approx(0.1, abs=1e-6)

    conc = run([0.01] * 9 + [10000.0])
    assert conc.gini > 0.85
    assert conc.top10_share > 0.99


# ---------------------------------------------------------------------------
# PSI: identical distributions score ~0; disjoint ones score large
# ---------------------------------------------------------------------------


def test_psi_bounds(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        psi_from_value_grid,
    )

    same = spark.createDataFrame(
        [(v, 10, 10) for v in range(1, 21)], "v long, ca long, cb long"
    )
    r = psi_from_value_grid(same).collect()[0]
    assert abs(r.psi) < 0.01 and not r.drifted

    shifted = spark.createDataFrame(
        [(v, 10, 0) for v in range(1, 11)] + [(v, 0, 10) for v in range(11, 21)],
        "v long, ca long, cb long",
    )
    r2 = psi_from_value_grid(shifted).collect()[0]
    assert r2.psi > 1.0 and r2.drifted


# ---------------------------------------------------------------------------
# JS divergence: identical distributions -> 0; disjoint -> ln 2
# ---------------------------------------------------------------------------


def _jsd_from_grid(spark, rows):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (  # noqa: PLC0415
        q_stats_js_divergence,
    )

    # drive the registered query's core by building an events-shaped frame
    df = spark.createDataFrame(rows, "event_type string, value double")
    tagged = df.select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("b"),
    )
    g = tagged.groupBy("v").agg(
        F.sum("a").cast("long").alias("ca"), F.sum("b").cast("long").alias("cb")
    )
    tot = g.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    j = g.crossJoin(F.broadcast(tot))
    p = F.col("ca") / F.col("na").cast("double")
    q = F.col("cb") / F.col("nb").cast("double")
    m = (p + q) / F.lit(2.0)
    terms = j.select(
        F.when(F.col("ca") > 0, p * F.log(p / m)).otherwise(F.lit(0.0)).alias("pa"),
        F.when(F.col("cb") > 0, q * F.log(q / m)).otherwise(F.lit(0.0)).alias("pb"),
    )
    row = terms.agg(
        (F.lit(0.5) * F.sum("pa") + F.lit(0.5) * F.sum("pb")).alias("jsd")
    ).collect()[0]
    return row.jsd


def test_js_divergence_identical_is_zero(spark):
    rows = [("click", float(v)) for v in (1, 2, 3)] + [
        ("purchase", float(v)) for v in (1, 2, 3)
    ]
    assert abs(_jsd_from_grid(spark, rows)) < 1e-12


def test_js_divergence_disjoint_is_ln2(spark):
    rows = [("click", 1.0), ("click", 2.0), ("purchase", 5.0), ("purchase", 6.0)]
    assert abs(_jsd_from_grid(spark, rows) - math.log(2)) < 1e-12


# ---------------------------------------------------------------------------
# Kendall tau: perfectly monotone daily means -> tau_b = 1 / -1
# ---------------------------------------------------------------------------


def _tau_for(spark, daily_means):
    rows = [
        (1, BASE + dt.timedelta(days=i), float(m))
        for i, m in enumerate(daily_means)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    vi = df.select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    daily = vi.groupBy("user_id", "d").agg(
        F.sum("v").cast("long").alias("s"), F.count("*").cast("long").alias("n")
    )
    a = daily.select(
        "user_id", F.col("d").alias("d1"), F.col("s").alias("s1"), F.col("n").alias("n1")
    )
    b = daily.select(
        "user_id", F.col("d").alias("d2"), F.col("s").alias("s2"), F.col("n").alias("n2")
    )
    lhs, rhs = F.col("s1") * F.col("n2"), F.col("s2") * F.col("n1")
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            F.when(lhs < rhs, 1).otherwise(0).alias("conc"),
            F.when(lhs > rhs, 1).otherwise(0).alias("disc"),
            F.when(lhs == rhs, 1).otherwise(0).alias("tie"),
        )
    )
    r = pairs.agg(
        F.sum("conc").alias("c"), F.sum("disc").alias("d"), F.sum("tie").alias("t"),
        F.count("*").alias("n0"),
    ).collect()[0]
    denom = math.sqrt(r.n0 * (r.n0 - r.t))
    return (r.c - r.d) / denom if denom else None


def test_kendall_tau_monotone(spark):
    assert _tau_for(spark, [1, 2, 3, 4, 5]) == pytest.approx(1.0)
    assert _tau_for(spark, [5, 4, 3, 2, 1]) == pytest.approx(-1.0)


def test_kendall_tau_alternating_near_zero(spark):
    # 1,3,2,4: pairs = 6, discordant = 1 (3>2) -> tau = (5-1)/6
    assert _tau_for(spark, [1, 3, 2, 4]) == pytest.approx(4 / 6)


# ---------------------------------------------------------------------------
# BFS hops: hand-built path graph
# ---------------------------------------------------------------------------


def test_bfs_hops_path_graph(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.graph import bfs_hops

    # path 1-2-3-4-5, symmetric edges
    half = [(i, i + 1) for i in range(1, 5)]
    edges = spark.createDataFrame(
        half + [(b, a) for a, b in half], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # node 5 unreached in 3 hops


# ---------------------------------------------------------------------------
# Naive Bayes: separable two-class corpus classifies perfectly
# ---------------------------------------------------------------------------


def test_naive_bayes_separable(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.text import (
        q_ml_naive_bayes_text,
    )

    # two languages with disjoint vocabularies; doc_id%5==0 rows are test
    docs = []
    for i in range(20):
        lang = "aa" if i % 2 == 0 else "bb"
        text = ("foo bar baz " if lang == "aa" else "qux quux corge ") * 3
        docs.append((i, text.strip(), lang, "s0", len(text)))
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = {r.lang: r for r in q_ml_naive_bayes_text(spark, str(tmp_path)).collect()}
    assert set(out) == {"aa", "bb"}
    for r in out.values():
        assert r.n_correct == r.n_test and r.accuracy == 1.0


# ---------------------------------------------------------------------------
# Domain cap: a source with more than 15 docs is capped at 15
# ---------------------------------------------------------------------------


def test_domain_cap_caps_at_15(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        q_corpus_domain_cap,
    )

    docs = [(i, "x" * (10 + i), "en", "big" if i < 30 else "small", 10 + i) for i in range(35)]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = {r.source: r for r in q_corpus_domain_cap(spark, str(tmp_path)).collect()}
    assert out["big"].n_kept == 15 and out["big"].n_dropped == 15
    assert out["small"].n_kept == 5 and out["small"].n_dropped == 0
    # kept docs are the LONGEST 15 of the big source: ids 15..29
    assert out["big"].kept_chars == sum(10 + i for i in range(15, 30))


# ---------------------------------------------------------------------------
# Hubness: occurrence counts over all top-10 lists sum to 10 * n_queries
# ---------------------------------------------------------------------------


def test_hubness_mass_conservation(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        q_embedding_hubness,
    )

    rows = q_embedding_hubness(spark, "/root/testdata/sf0.001").collect()
    n_vectors = sum(r.n_vectors for r in rows)
    total_occurrences = sum(r.k_occurrence * r.n_vectors for r in rows)
    assert total_occurrences == 10 * n_vectors  # every vector emits a top-10 list


# ---------------------------------------------------------------------------
# Cross-correlation: y = x shifted by 2 days -> xcorr(lag=2) = 1
# ---------------------------------------------------------------------------


def test_cross_correlation_detects_shift(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_ts_cross_correlation,
    )

    rows = []
    eid = 0
    # period-101 cubic-residue sequence: no shift inside the +-5-day lag
    # window re-aligns it with itself (a %7 square pattern did at lag -5)
    sig = lambda i: float((i * i * i) % 101 + 1)  # noqa: E731
    for i in range(30):
        rows.append((eid, BASE + dt.timedelta(days=i), 1, "click", sig(i), "{}"))
        eid += 1
        if i >= 2:
            # purchase mirrors click 2 days later
            rows.append((eid, BASE + dt.timedelta(days=i), 1, "purchase", sig(i - 2), "{}"))
            eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    out = {r.lag: r.xcorr for r in q_ts_cross_correlation(spark, str(tmp_path)).collect()}
    assert out[2] == pytest.approx(1.0)
    assert all(v < 0.999 for lag, v in out.items() if lag != 2)


# ---------------------------------------------------------------------------
# Centroid drift: identical halves -> cos = 1, shift = 0
# ---------------------------------------------------------------------------


def test_centroid_drift_identical_halves(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        q_embedding_centroid_drift,
    )

    vecs = []
    for i in range(8):
        base = [float(i % 2), 1.0, 2.0, float(i % 2) * 3]
        # even ids (half A) and odd ids (half B) get identical vectors per label
        vecs.append((2 * i, base, i % 2))
        vecs.append((2 * i + 1, base, i % 2))
    pd.DataFrame(vecs, columns=["vec_id", "embedding", "label"]).to_parquet(
        tmp_path / "embeddings.parquet"
    )
    out = {r.label: r for r in q_embedding_centroid_drift(spark, str(tmp_path)).collect()}
    for r in out.values():
        assert r.centroid_cos == pytest.approx(1.0)
        assert r.l2_shift == pytest.approx(0.0)
        assert r.n_a == r.n_b


# ---------------------------------------------------------------------------
# MMR: diversity beats a marginally-more-relevant near-duplicate
# ---------------------------------------------------------------------------


def test_mmr_prefers_diverse_pick(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        mmr_select,
    )

    cand = spark.createDataFrame(
        [(1, 0.99), (2, 0.98), (3, 0.97), (4, 0.60), (5, 0.40)], "cid long, rel double"
    )
    # 1,2,3 are near-copies of each other; 4,5 orthogonal to everything
    dup = [(a, b, 0.999) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    rest = [
        (a, b, 0.0)
        for a in range(1, 6)
        for b in range(1, 6)
        if a != b and not (a in (1, 2, 3) and b in (1, 2, 3))
    ]
    pair = spark.createDataFrame(dup + rest, "i long, j long, s double")
    picks = [
        r.cid for r in mmr_select(cand, pair, k=3).orderBy("pick_order").collect()
    ]
    # greedy: 1 first (max rel); then 4 (0.7*0.6 beats 0.7*0.98-0.3*0.999); then 2
    assert picks == [1, 4, 2]


# ---------------------------------------------------------------------------
# Granger lag F: y driven by yesterday's x -> full model wins decisively
# ---------------------------------------------------------------------------


def test_granger_detects_exogenous_driver(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_ts_granger_lag_f,
    )

    rows = []
    eid = 0
    sig = lambda i: float((i * i * i) % 101 + 1)  # noqa: E731
    for i in range(40):
        rows.append((eid, BASE + dt.timedelta(days=i), 1, "click", sig(i), "{}"))
        eid += 1
        if i >= 1:
            # purchases today = clicks yesterday: the exogenous lag explains
            # everything the AR(1) term cannot
            rows.append((eid, BASE + dt.timedelta(days=i), 1, "purchase", sig(i - 1), "{}"))
            eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    r = q_ts_granger_lag_f(spark, str(tmp_path)).collect()[0]
    assert r.rss_full <= r.rss_restricted
    assert r.rss_full == pytest.approx(0.0, abs=1e-4)  # exact functional dependence
    # exact dependence drives RSS_full to 0: F is either enormous or the
    # guarded NULL (division by exactly-zero RSS)
    assert r.f_stat is None or r.f_stat > 1000
    assert r.rss_restricted > 1.0  # the AR(1)-only fit is genuinely worse


# ---------------------------------------------------------------------------
# Periodogram: exact 7-day cycle -> power peaks at period 7
# ---------------------------------------------------------------------------


def test_periodogram_finds_weekly_cycle(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
        q_ts_periodogram,
    )

    rows = []
    for i in range(70):
        v = 10.0 + (3.0 if i % 7 == 0 else 0.0)  # weekly spike
        rows.append((i, BASE + dt.timedelta(days=i), 1, "purchase", v, "{}"))
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    out = {r.period: r.power for r in q_ts_periodogram(spark, str(tmp_path)).collect()}
    assert max(out, key=out.get) == 7


# ---------------------------------------------------------------------------
# VaR / ES: hand-computed nearest-rank tail
# ---------------------------------------------------------------------------


def test_var_es_hand_computed(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
        q_ts_var_es,
    )

    # 41 daily values -> 40 returns -> k = ceil(0.05*40) = 2:
    # var = 2nd-smallest return, es = mean of the two smallest
    vals = [100.0]
    for i in range(40):
        vals.append(vals[-1] * (1.0 + [0.01, -0.02, 0.005, -0.01][i % 4]))
    rows = [
        (i, BASE + dt.timedelta(days=i), 1, "purchase", v, "{}")
        for i, v in enumerate(vals)
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    r = q_ts_var_es(spark, str(tmp_path)).collect()[0]
    assert r.n_days == 40 and r.tail_n == 2
    # the two most-negative returns are both ~-0.02 (cents-rounded)
    assert r.var_95 == pytest.approx(-0.02, abs=1e-3)
    assert r.es_95 <= r.var_95 <= 0
    assert r.worst_return <= r.es_95


# ---------------------------------------------------------------------------
# Ljung-Box: trending series shows far more autocorrelation than noise
# ---------------------------------------------------------------------------


def test_ljung_box_orders_trend_above_noise(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
        q_ts_ljung_box,
    )

    rows = []
    eid = 0
    for i in range(100):
        rows.append((eid, BASE + dt.timedelta(hours=i), 1, "view", float(i), "{}"))
        eid += 1
        rows.append(
            (eid, BASE + dt.timedelta(hours=i), 2, "view",
             float((i * i * i) % 101), "{}")
        )
        eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    out = {r.user_id: r.q_stat for r in q_ts_ljung_box(spark, str(tmp_path)).collect()}
    assert out[1] > 100  # linear trend: near-1 ACF at every lag
    assert out[1] > 10 * out[2]  # pseudo-random residue sequence is far whiter


# ---------------------------------------------------------------------------
# Learning curve: window accounting invariants
# ---------------------------------------------------------------------------


def test_learning_curve_window_accounting(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_ml_learning_curve,
    )

    rows = sorted(
        q_ml_learning_curve(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.fraction_pct,
    )
    assert [r.fraction_pct for r in rows] == [20, 40, 60, 80, 100]
    nds = [r.n_train_days for r in rows]
    assert nds == sorted(nds)  # more fraction -> no fewer train days
    assert len({r.n_test_points for r in rows}) == 1  # same held-out week
    assert all(r.rmse > 0 for r in rows)


# ---------------------------------------------------------------------------
# Duplicate spans: shared 12-token run -> one merged island, exact bounds
# ---------------------------------------------------------------------------


def test_duplicate_spans_merged_island(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.text import (
        q_text_duplicate_spans,
    )

    shared = " ".join(f"dup{i}" for i in range(12))  # 12 shared tokens
    docs = [
        (0, f"alpha beta {shared} gamma", "en", "s0", 1),
        (1, f"{shared} delta epsilon zeta", "en", "s0", 1),
        (2, "totally different words here nothing shared at all ok fine", "en", "s0", 1),
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = {r.doc_id: r for r in q_text_duplicate_spans(spark, str(tmp_path)).collect()}
    # doc 0: shared run at positions 2..13; its 5 overlapping 8-shingles
    # merge into ONE island
    assert set(out) == {0, 1}
    assert (out[0].start_pos, out[0].end_pos, out[0].span_tokens) == (2, 13, 12)
    assert (out[1].start_pos, out[1].end_pos, out[1].span_tokens) == (0, 11, 12)


# ---------------------------------------------------------------------------
# Forecast reconciliation: children sum exactly to the direct total
# ---------------------------------------------------------------------------


def test_reconciled_forecasts_sum_to_direct_total(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
        q_ts_forecast_reconciliation,
    )

    rows = q_ts_forecast_reconciliation(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_day = {}
    for r in rows:
        by_day.setdefault(r.day, []).append(r)
        assert r.fc_reconciled >= 0 and r.fc_base >= 0
    for day, rs in by_day.items():
        bu = sum(r.fc_base for r in rs)
        rec = sum(r.fc_reconciled for r in rs)
        # coherence: reconciled children sum to fc_base * td/bu summed =
        # td (the direct total), up to the 1e-6 canon per row
        scale = rs[0].fc_reconciled / rs[0].fc_base if rs[0].fc_base else 1.0
        assert rec == pytest.approx(bu * scale, rel=1e-6)


# ---------------------------------------------------------------------------
# Freshness lag: the globally newest type has zero staleness
# ---------------------------------------------------------------------------


def test_freshness_lag_newest_is_zero(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
        q_dq_freshness_lag,
    )

    rows = q_dq_freshness_lag(spark, "/root/testdata/sf0.001").collect()
    assert min(r.staleness_s for r in rows) == 0
    assert all(r.staleness_s >= 0 and 0 <= r.n_last_day <= r.n_total for r in rows)


# ---------------------------------------------------------------------------
# Chatterjee xi: strictly monotone -> exactly 1 - 3/(n+1)
# ---------------------------------------------------------------------------


def test_xi_monotone_exact(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_stats_xi_correlation,
    )

    n = 29
    rows = [
        (i, BASE + dt.timedelta(days=i), 1, "view", float(i + 1), "{}")
        for i in range(n)
    ] + [
        # user 2: period-7 seasonal pattern — functionally dependent on day,
        # so xi should remain clearly positive even though it's non-monotone
        (100 + i, BASE + dt.timedelta(days=i), 2, "view", float(i % 7), "{}")
        for i in range(n)
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    out = {r.user_id: r for r in q_stats_xi_correlation(spark, str(tmp_path)).collect()}
    want = 1.0 - 3.0 / (n + 1)
    assert out[1].xi == pytest.approx(want, abs=1e-6)
    assert out[1].sum_rank_jumps == n - 1


# ---------------------------------------------------------------------------
# Hurst R/S: trending series scores higher than mean-reverting
# ---------------------------------------------------------------------------


def _hurst_of(spark, tmp_path, vals):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
        q_ts_hurst_rs,
    )

    rows = [
        (i, BASE + dt.timedelta(days=i), 1, "purchase", float(v), "{}")
        for i, v in enumerate(vals)
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    out = q_ts_hurst_rs(spark, str(tmp_path)).collect()
    (tmp_path / "events.parquet").unlink()
    return out[0].hurst, {r.window_size: r.n_blocks for r in out}


def test_hurst_trend_vs_meanreverting(spark, tmp_path):
    n = 64
    trend = [10.0 + 0.5 * i for i in range(n)]  # persistent: H -> 1
    flip = [10.0 + (1.0 if i % 2 else -1.0) for i in range(n)]  # antipersistent
    h_trend, blocks = _hurst_of(spark, tmp_path, trend)
    h_flip, _ = _hurst_of(spark, tmp_path, flip)
    assert blocks == {4: 16, 8: 8, 16: 4, 32: 2}  # exact block accounting
    assert h_trend > 0.9
    assert h_flip < 0.3
    assert h_trend > h_flip


# ---------------------------------------------------------------------------
# Session likelihood / DAU-WAU / elasticity invariants
# ---------------------------------------------------------------------------


def test_session_likelihood_bounds(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.funnel import (
        q_events_session_likelihood,
    )

    rows = q_events_session_likelihood(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.log_likelihood <= 0  # product of probabilities
        # bounded below by 1; above by 1/min(model prob), not |types| —
        # a user who repeatedly takes globally-rare transitions scores high
        assert r.perplexity >= 1.0
    import statistics
    # the population as a whole is near the uniform 5-state baseline
    assert statistics.median(r.perplexity for r in rows) < 6.0


def test_dau_wau_stickiness_bounds(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.funnel import (
        q_events_dau_wau_stickiness,
    )

    rows = q_events_dau_wau_stickiness(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 1 <= r.dau <= r.wau  # a day's actives are a subset of the week's
        assert 0 < r.stickiness <= 1.0


def test_price_elasticity_full_rank(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_orders_price_elasticity,
    )

    rows = q_orders_price_elasticity(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r.n > 0 and r.r2 is not None and 0 <= r.r2 <= 1 for r in rows)


# ---------------------------------------------------------------------------
# Wavelet energy: a pure 2-day alternation concentrates at level 1
# ---------------------------------------------------------------------------


def test_wavelet_energy_concentrates_at_matching_scale(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
        q_ts_wavelet_energy,
    )

    rows = [
        (i, BASE + dt.timedelta(days=i), 1, "purchase",
         10.0 + (1.0 if i % 2 == 0 else -1.0), "{}")
        for i in range(32)
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    out = {r.level: r for r in q_ts_wavelet_energy(spark, str(tmp_path)).collect()}
    # +-1 alternation: every level-1 pair differs by exactly 2 -> d = 1,
    # energy = n_pairs; coarser levels see constant averages -> 0
    assert out[1].n_coeffs == 16 and out[1].detail_energy == pytest.approx(16.0)
    assert out[2].detail_energy == pytest.approx(0.0)
    assert out[3].detail_energy == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# Cohort LTV: cumulative revenue is nondecreasing within each cohort
# ---------------------------------------------------------------------------


def test_cohort_ltv_monotone(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.funnel import (
        q_events_cohort_ltv,
    )

    rows = q_events_cohort_ltv(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r.week_offset)
        cums = [r.cum_rev_cents for r in rs]
        assert cums == sorted(cums)
        assert cums[-1] == sum(r.rev_cents for r in rs)
        assert all(r.ltv_per_user > 0 for r in rs)


# ---------------------------------------------------------------------------
# Hill estimator: exact Pareto(alpha) tail recovers alpha
# ---------------------------------------------------------------------------


def test_hill_recovers_pareto_alpha(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_stats_hill_tail_index,
    )

    # deterministic Pareto(alpha=2) sample via inverse CDF on a uniform grid
    alpha = 2.0
    n = 2000
    xs = [(1.0 - (i + 0.5) / n) ** (-1.0 / alpha) * 100.0 for i in range(n)]
    rows = [(i, i % 500, "O", x, "2024-01-01", "1-URGENT") for i, x in enumerate(xs)]
    pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    ).to_parquet(tmp_path / "orders.parquet")
    r = q_stats_hill_tail_index(spark, str(tmp_path)).collect()[0]
    assert r.k == 100
    assert r.tail_alpha == pytest.approx(alpha, rel=0.15)  # Hill is consistent
    assert r.x_max >= r.x_k > 0


# ---------------------------------------------------------------------------
# Fulfillment cycle: rank percentiles ordered, bounded by max
# ---------------------------------------------------------------------------


def test_fulfillment_cycle_percentile_order(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_orders_fulfillment_cycle,
    )

    rows = q_orders_fulfillment_cycle(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.p50_days <= r.p90_days <= r.max_days
        assert r.n_orders > 0


# ---------------------------------------------------------------------------
# Markov attribution: removal effects on a crafted two-path funnel
# ---------------------------------------------------------------------------


def test_markov_attribution_gating_channel_dominates(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.funnel import (
        q_events_markov_attribution,
    )

    rows = []
    eid = 0

    def add(u, types):
        nonlocal eid
        for j, t in enumerate(types):
            rows.append((eid, BASE + dt.timedelta(minutes=j), u, t, 1.0, "{}"))
            eid += 1

    # every conversion passes through 'signup'; 'view' never leads anywhere
    for u in range(20):
        add(u, ["click", "signup", "purchase"])
    for u in range(20, 40):
        add(u, ["view", "error"])
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    out = {r.channel: r for r in q_events_markov_attribution(spark, str(tmp_path)).collect()}
    # removing the gating channels kills ALL conversions
    assert out["signup"].removal_effect == pytest.approx(1.0)
    assert out["click"].removal_effect == pytest.approx(1.0)
    # channels off the converting path contribute nothing
    assert out["view"].removal_effect == pytest.approx(0.0)
    assert out["error"].removal_effect == pytest.approx(0.0)
    assert out["signup"].attribution_share == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# RRF fusion: candidates in both top-20 lists outrank single-list ones
# ---------------------------------------------------------------------------


def test_rrf_fusion_ranks_and_bounds(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.similarity import (
        q_sim_rrf_fusion,
    )

    rows = q_sim_rrf_fusion(spark, "/root/testdata/sf0.001").collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        # rrf of a candidate in both lists is in (1/80+1/80, 2/61];
        # single-list membership caps at 1/61
        assert 0 < r.rrf <= 2 / 61 + 1e-9
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rank)
        vals = [r.rrf for r in rs]
        assert vals == sorted(vals, reverse=True)
        assert len(rs) == 10 and rs[0].rank == 1


# ---------------------------------------------------------------------------
# Conformal: guaranteed >= 90% marginal coverage on exchangeable splits
# ---------------------------------------------------------------------------


def test_conformal_coverage_guarantee(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_ml_conformal_forecast,
    )

    r = q_ml_conformal_forecast(spark, "/root/testdata/sf0.01").collect()[0]
    assert r.n_cal > 0 and r.n_test > 0
    assert r.interval_halfwidth > 0
    # finite-sample conformal guarantee holds under exchangeability; the
    # synthetic per-user series are stationary, so allow small slack only
    assert r.coverage >= 0.85


# ---------------------------------------------------------------------------
# Backlog: conservation — deltas sum to zero, peak positive
# ---------------------------------------------------------------------------


def test_backlog_conservation(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_orders_open_backlog,
    )

    rows = sorted(
        q_orders_open_backlog(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.day,
    )
    assert rows
    assert sum(r.net_change for r in rows) == 0  # every open closes
    running = 0
    for r in rows:
        running += r.net_change
        assert r.open_orders == running
        assert running >= 0
    assert max(r.open_orders for r in rows) > 0


# ---------------------------------------------------------------------------
# Runs test: oscillating series -> strongly positive z; trending -> negative
# ---------------------------------------------------------------------------


def test_runs_test_detects_oscillation_and_trend(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_stats_runs_test,
    )

    def z_of(vals):
        rows = [
            (i, BASE + dt.timedelta(days=i), 1, "purchase", float(v), "{}")
            for i, v in enumerate(vals)
        ]
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        ).to_parquet(tmp_path / "events.parquet")
        out = q_stats_runs_test(spark, str(tmp_path)).collect()[0]
        (tmp_path / "events.parquet").unlink()
        return out

    # 8/12 alternation plus a single 10 sitting exactly at the median
    # (median ties are dropped, so both sign classes stay populated)
    osc = z_of([10] + [8 + 4 * (i % 2) for i in range(40)])
    trend = z_of(list(range(1, 41)))
    assert osc.z_stat > 3  # alternating: maximum number of runs
    assert trend.z_stat < -3  # monotone: exactly 2 runs
    assert trend.runs == 2


# ---------------------------------------------------------------------------
# NB confusion: diagonal equals the accuracy rollup's correct counts
# ---------------------------------------------------------------------------


def test_nb_confusion_consistent_with_accuracy(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.text import (
        q_ml_naive_bayes_confusion,
        q_ml_naive_bayes_text,
    )

    sf = "/root/testdata/sf0.001"
    acc = {r.lang: r for r in q_ml_naive_bayes_text(spark, sf).collect()}
    conf = q_ml_naive_bayes_confusion(spark, sf).collect()
    diag = {r.true_lang: r.n for r in conf if r.true_lang == r.pred_lang}
    row_tot = {}
    for r in conf:
        row_tot[r.true_lang] = row_tot.get(r.true_lang, 0) + r.n
    for lang, a in acc.items():
        assert row_tot[lang] == a.n_test
        assert diag.get(lang, 0) == a.n_correct


# ---------------------------------------------------------------------------
# Inspection pack: per source best >= median >= worst
# ---------------------------------------------------------------------------


def test_inspection_pack_ordering(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        q_corpus_inspection_pack,
    )

    rows = q_corpus_inspection_pack(spark, "/root/testdata/sf0.001").collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, {})[r.role] = r.n_chars
    assert per_src
    for roles in per_src.values():
        assert set(roles) == {"best", "worst", "median"}
        assert roles["best"] >= roles["median"] >= roles["worst"]


# ---------------------------------------------------------------------------
# ABC classes: shares sum to 1, A share ~0.8 boundary respected
# ---------------------------------------------------------------------------


def test_abc_classes_partition_revenue(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_orders_abc_classes,
    )

    rows = {r.abc: r for r in q_orders_abc_classes(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"A", "B", "C"}
    assert sum(r.revenue_share for r in rows.values()) == pytest.approx(1.0, abs=1e-5)
    assert rows["A"].revenue_share <= 0.8 + 0.05  # boundary part may straddle
    assert rows["A"].n_parts < rows["C"].n_parts or rows["A"].revenue_share > rows["C"].revenue_share


# ---------------------------------------------------------------------------
# OOV: disjoint-vocab test split -> 100% OOV; identical -> 0%
# ---------------------------------------------------------------------------


def test_oov_rate_extremes(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        q_corpus_oov_rate,
    )

    docs = []
    for i in range(1, 11):  # train docs (ids not divisible by 5)
        if i % 5 == 0:
            continue
        docs.append((i, "alpha beta gamma", "en", "s0", 10))
    docs.append((5, "delta epsilon", "en", "s0", 10))   # test: fully OOV
    docs.append((10, "alpha alpha beta", "en", "s0", 10))  # test: fully in-vocab
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    r = q_corpus_oov_rate(spark, str(tmp_path)).collect()[0]
    assert r.test_tokens == 5 and r.oov_tokens == 2
    assert r.oov_token_rate == pytest.approx(0.4)
    assert r.oov_types == 2 and r.test_types == 4


# ---------------------------------------------------------------------------
# Rich club: density bounded, cuts increase with quantile
# ---------------------------------------------------------------------------


def test_rich_club_bounds(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.graph import (
        q_graph_rich_club,
    )

    rows = sorted(
        q_graph_rich_club(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.degree_quantile,
    )
    assert [r.degree_quantile for r in rows] == [0.5, 0.75, 0.9]
    ks = [r.k_cut for r in rows]
    assert ks == sorted(ks)
    for r in rows:
        if r.phi is not None:
            assert 0.0 <= r.phi <= 1.0
        assert r.n_edges <= r.n_nodes * (r.n_nodes - 1) / 2


# ---------------------------------------------------------------------------
# Diversity: uniform groups maximize entropy; effective groups = exp(H)
# ---------------------------------------------------------------------------


def test_diversity_indices_bounds(spark):
    import math

    from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
        q_corpus_diversity_indices,
    )

    rows = {r.dimension: r for r in q_corpus_diversity_indices(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"lang", "source"}
    for r in rows.values():
        assert 0 <= r.simpson_diversity < 1
        assert 0 <= r.shannon_entropy <= math.log(r.n_groups) + 1e-9
        assert 1 <= r.effective_groups <= r.n_groups + 1e-6
        assert abs(r.effective_groups - math.exp(r.shannon_entropy)) < 1e-4


# ---------------------------------------------------------------------------
# Modularity: per-brand contributions bounded; random-ish partition ~ 0
# ---------------------------------------------------------------------------


def test_brand_modularity_accounting(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.graph import (
        q_graph_brand_modularity,
    )

    rows = q_graph_brand_modularity(spark, "/root/testdata/sf0.001").collect()
    assert rows
    total_ein = sum(r.e_in for r in rows)
    q_total = sum(r.q_contrib for r in rows)
    for r in rows:
        assert 0 <= r.e_in and r.d_sum > 0
        assert -1.0 <= r.q_contrib <= 1.0
    assert -1.0 <= q_total <= 1.0
    assert total_ein >= 0


# ---------------------------------------------------------------------------
# Jarque-Bera: symmetric two-point returns -> JB dominated by kurtosis
# ---------------------------------------------------------------------------


def test_jarque_bera_hand_values(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
        q_stats_jarque_bera,
    )

    # prices alternating +1%/-1%: returns are a symmetric two-point
    # distribution -> skewness 0, excess kurtosis exactly -2 (Bernoulli)
    vals = [100.0]
    for i in range(60):
        vals.append(vals[-1] * (1.01 if i % 2 == 0 else 0.99))
    rows = [
        (i, BASE + dt.timedelta(days=i), 1, "purchase", v, "{}")
        for i, v in enumerate(vals)
    ]
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    r = q_stats_jarque_bera(spark, str(tmp_path)).collect()[0]
    assert r.n == 60
    assert abs(r.skewness) < 0.01
    assert r.excess_kurtosis == pytest.approx(-2.0, abs=0.01)
    # JB = n/6 * (K^2/4) = 60/6 * 1 = 10
    assert r.jb_stat == pytest.approx(10.0, abs=0.2)


# ---------------------------------------------------------------------------
# PACF: a pure AR(1) series has pacf(1) ~ phi and pacf(2), pacf(3) ~ 0
# ---------------------------------------------------------------------------


def test_pacf_ar1_cutoff(spark, tmp_path):
    import pandas as pd

    from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
        q_ts_pacf,
    )

    # deterministic AR(1)-like sequence: x_t = 0.8 x_{t-1} + pseudo-noise
    # from a fixed integer residue generator (no RNG in tests)
    x, rows = 10.0, []
    for i in range(300):
        noise = ((i * i * 7919) % 97 - 48) / 97.0
        x = 0.8 * x + noise
        rows.append((i, BASE + dt.timedelta(hours=i), 1, "view", float(x), "{}"))
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet")
    out = {r.lag: r.pacf for r in q_ts_pacf(spark, str(tmp_path)).collect()}
    assert out[1] == pytest.approx(0.8, abs=0.12)  # phi recovered at lag 1
    assert abs(out[2]) < 0.2 and abs(out[3]) < 0.2  # cutoff after the AR order
