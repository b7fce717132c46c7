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
