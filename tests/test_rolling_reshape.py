"""Accuracy/property tests for rolling, resampling, sampling and sketch
operators (the parts the DuckDB oracle can't check)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.operators.reshape import (
    stratified_sample,
)
from real_time_scraping_and_predicting_time_series_data_spark.operators.rolling import (
    ewma,
    resample_grid,
)

SF = "/root/testdata/sf0.01"


def test_ewma_matches_pandas(spark):
    ev = load_table(spark, SF, "events").filter(F.col("user_id") == 3)
    got = {
        r.event_id: r.ewma
        for r in ewma(ev, alpha=0.3).collect()
    }
    pdf = ev.orderBy("ts", "event_id").toPandas()
    want = pdf["value"].ewm(alpha=0.3, adjust=False).mean()
    for eid, w in zip(pdf["event_id"], want):
        assert got[eid] == pytest.approx(w, rel=1e-9)


def test_approx_quantile_close_to_exact(spark):
    ev = load_table(spark, SF, "events")
    both = (
        ev.groupBy("user_id")
        .agg(
            F.percentile("value", F.lit(0.25)).alias("p25"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.75)).alias("p75"),
            F.approx_percentile("value", F.lit(0.5), F.lit(1000)).alias("approx"),
        )
        .collect()
    )
    for r in both:
        # approx_percentile returns a REAL data point (no interpolation);
        # with <100 rows/key it must land between the exact quartiles.
        assert r.p25 <= r.approx <= r.p75
        assert r.approx == pytest.approx(r.p50, rel=0.25)


def test_stratified_sample_fractions(spark):
    docs = load_table(spark, SF, "documents")
    fracs = {"en": 0.5, "fr": 0.2, "de": 0.2, "es": 0.2, "zh": 0.2}
    out = stratified_sample(docs, "lang", fracs, seed=42)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, frac in fracs.items():
        observed = got.get(lang, 0) / base[lang]
        assert observed == pytest.approx(frac, abs=0.15), lang
    # deterministic for a fixed seed
    again = stratified_sample(docs, "lang", fracs, seed=42).count()
    assert again == out.count()


def test_resample_gapfill_carries_last_value(spark):
    ev = load_table(spark, SF, "events").filter(F.col("user_id") == 5)
    grid = resample_grid(ev, step="1 hour").orderBy("grid_ts").toPandas()
    ticks = ev.orderBy("ts").toPandas()
    # every filled value equals the most recent tick at/before the grid point
    ticks_sorted = ticks.sort_values("ts")
    for _, row in grid.head(200).iterrows():
        prior = ticks_sorted[ticks_sorted["ts"] <= row["grid_ts"]]
        if prior.empty:
            assert pd.isna(row["filled_value"])
        else:
            assert row["filled_value"] == prior.iloc[-1]["value"]
    # grid is contiguous hourly
    deltas = grid["grid_ts"].diff().dropna().unique()
    assert len(deltas) == 1 and deltas[0] == pd.Timedelta(hours=1)


def test_weighted_systematic_sample_picks_at_most_k_heaviest_biased(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.reshape import (
        weighted_systematic_sample,
    )

    ev = load_table(spark, SF, "events")
    k = 5
    w = F.floor(F.abs(F.col("value")) * 100).cast("long") + F.lit(1).cast("long")
    picks = weighted_systematic_sample(ev, k=k, weight=w).groupBy("user_id").count()
    counts = {r["user_id"]: r["count"] for r in picks.collect()}
    n_users = ev.select("user_id").distinct().count()
    assert set(counts) == set(
        r["user_id"] for r in ev.select("user_id").distinct().collect()
    )
    # systematic resampling selects between 1 and k rows per key (a single
    # heavy row can swallow multiple stride points but is emitted once)
    assert all(1 <= c <= k for c in counts.values()), counts
    assert len(counts) == n_users

    # determinism: same input -> identical pick set
    again = weighted_systematic_sample(ev, k=k, weight=w)
    a = {(r["user_id"], r["event_id"]) for r in again.select("user_id", "event_id").collect()}
    b = {
        (r["user_id"], r["event_id"])
        for r in weighted_systematic_sample(ev, k=k, weight=w)
        .select("user_id", "event_id")
        .collect()
    }
    assert a == b
