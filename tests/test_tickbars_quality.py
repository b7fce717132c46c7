"""Semantic unit tests for the tick-bar analytics and corpus-quality
operators (crafted inputs where the expected answer is computable by hand;
oracle parity at sf0.001 is covered by test_registry.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"
QS = all_queries()


def _ticks(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_ohlc_open_close_pick_by_ts_then_event_id(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # same hour bar; two ticks share ts -> event_id breaks the tie
        (2, t0, 1, "click", 10.0, '{"k": 1}'),
        (1, t0, 1, "click", 20.0, '{"k": 1}'),
        (3, t0 + dt.timedelta(minutes=30), 1, "click", 5.0, '{"k": 3}'),
    ]
    df = _ticks(spark, rows)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    # point the query at a dir shaped like the testdata layout
    out = QS["ts_ohlc_vwap_bars"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    bar = out[0]
    assert bar.open == 20.0  # event_id 1 wins the equal-ts tie
    assert bar.close == 5.0
    assert bar.high == 20.0 and bar.low == 5.0 and bar.n_ticks == 3
    # vwap = (10*1 + 20*1 + 5*3) / 5 = 9.0
    assert bar.vwap == pytest.approx(9.0, abs=1e-9)


def test_max_drawdown_handcrafted(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    vals = [10.0, 12.0, 7.0, 11.0, 4.0, 6.0]  # peak 12 -> trough 4 => dd 8
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "click", v, "{}") for i, v in enumerate(vals)
    ]
    _ticks(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    out = QS["ts_max_drawdown"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].max_drawdown == pytest.approx(8.0)
    assert out[0].peak_value == pytest.approx(12.0)


def test_type_daily_corr_shape_and_bounds(spark):
    rows = QS["events_type_daily_corr"].fn(spark, SF).collect()
    assert len(rows) == 10  # C(5,2) type pairs
    for r in rows:
        assert r.type_a < r.type_b
        if r.corr is not None:
            assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9


def test_chunk_overlap_covers_and_overlaps(spark):
    out = QS["corpus_chunk_overlap"].fn(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_words")
    )
    per_doc = out.groupBy("doc_id").agg(
        F.max(F.col("chunk_start") + F.col("n_tokens") - 1).alias("covered"),
        F.count("*").alias("n_chunks"),
        F.min("n_tokens").alias("min_tok"),
        F.max("n_tokens").alias("max_tok"),
    )
    joined = per_doc.join(docs, "doc_id").collect()
    assert len(joined) > 0
    for r in joined:
        assert r.covered == r.n_words  # every token lands in some chunk
        assert r.max_tok <= 32
        # every chunk except possibly the last is full-size
        assert r.n_chunks == (max(r.n_words - 1, 0)) // 24 + 1


def test_int8_quantize_error_bound(spark):
    rows = QS["embedding_int8_quantize"].fn(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # affine rounding error is at most scale/2 (plus fp slack)
        assert r.max_abs_err <= r.q_scale / 2 + 1e-9
        assert 0 <= r.q_checksum <= 255 * 64


def test_key_skew_profile_consistency(spark):
    row = QS["events_key_skew_profile"].fn(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert row.n_rows == ev.count()
    assert row.n_keys == ev.select("user_id").distinct().count()
    assert row.p50 <= row.p90 <= row.p99 <= row.max_key_rows
    assert row.top_key_share == pytest.approx(row.max_key_rows / row.n_rows, rel=1e-6)


def test_sessionize_splits_on_gap(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 7, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=50), 7, "click", 1.0, "{}"),  # 40-min gap
        (4, t0 + dt.timedelta(minutes=55), 7, "click", 1.0, "{}"),
    ]
    _ticks(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        QS["events_sessionize"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r.session_id,
    )
    assert [r.n_events for r in out] == [2, 2]
    assert out[0].duration_seconds == 600
    assert out[1].duration_seconds == 300


def test_lm_perplexity_uniform_corpus(spark, tmp_path):
    # every token equally frequent -> p = 1/V for all, ppl == V exactly
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd")], "doc_id long, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = QS["corpus_lm_perplexity"].fn(spark, str(tmp_path)).collect()
    assert {r.doc_id: r.ppl for r in out} == {1: 4.0, 2: 4.0}
    assert all(r.n_tokens == 2 for r in out)


def test_holt_winters_recovers_planted_seasonality(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.rolling import (
        holt_winters,
    )

    t0 = dt.datetime(2024, 1, 1)
    pattern = [0.0, 5.0, -5.0]
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, "t", 10.0 + pattern[i % 3], "{}")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = sorted(
        holt_winters(df, alpha=0.3, beta=0.1, gamma=0.5, period=3).collect(),
        key=lambda r: r.event_id,
    )
    tail = out[-3:]
    by_slot = {r.event_id % 3: r for r in tail}
    # seasonal components converge toward the planted (0, +5, -5) offsets
    assert by_slot[1].hw_seasonal > 2.5
    assert by_slot[2].hw_seasonal < -2.5
    assert abs(by_slot[0].hw_seasonal) < 1.5
    for r in tail:  # level converges to the deseasonalized mean
        assert abs(r.hw_level - 10.0) < 1.5


def test_ohlc_invariants_on_real_table(spark):
    """low ≤ open, close ≤ high on every bar; tick counts partition the
    table; VWAP lies within [low, high] whenever defined."""
    bars = QS["ts_ohlc_vwap_bars"].fn(spark, SF).collect()
    ev_count = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n_ticks for r in bars) == ev_count
    for r in bars:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        if r.vwap is not None:
            assert r.low - 1e-6 <= r.vwap <= r.high + 1e-6


def test_sessionize_partitions_events_and_respects_gap(spark):
    """Sessions partition the event set; consecutive sessions of a user are
    separated by MORE than the 30-minute gap."""
    sess = QS["events_sessionize"].fn(spark, SF).collect()
    ev_count = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n_events for r in sess) == ev_count
    by_user: dict = {}
    for r in sess:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r.session_start)
        for prev, nxt in zip(rows, rows[1:]):
            gap = (nxt.session_start - prev.session_end).total_seconds()
            assert gap > 30 * 60


def test_chunk_non_overlap_reconstructs_document(spark):
    """Dropping each chunk's 8-token overlap (except the first chunk)
    reconstructs the original token stream exactly."""
    out = QS["corpus_chunk_overlap"].fn(spark, SF)
    rebuilt = {
        r.doc_id: r.toks
        for r in out.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_index", "chunk_text"))
                    ),
                    lambda s: F.when(
                        s.getField("chunk_index") == 0,
                        F.split(s.getField("chunk_text"), " "),
                    ).otherwise(
                        F.slice(F.split(s.getField("chunk_text"), " "), 9, 32)
                    ),
                )
            ).alias("toks")
        )
        .collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    for d in docs:
        assert rebuilt[d.doc_id] == d.text.strip().split()


def test_holt_winters_constant_series_is_fixed_point(spark):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.rolling import (
        holt_winters,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(hours=i), 1, "t", 7.0, "{}") for i in range(30)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = holt_winters(df, period=5).collect()
    # constant series: level locked at x, trend 0; seasonals decay toward 0
    for r in out:
        assert r.hw_level == pytest.approx(7.0, abs=1e-6)
        assert r.hw_trend == pytest.approx(0.0, abs=1e-6)
        assert abs(r.hw_seasonal) <= 7.0 * 0.2 + 1e-9


def test_gopher_filters_flags_compose(spark):
    rows = QS["text_gopher_filters"].fn(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.keep == (
            r.ok_word_count and r.ok_mean_word_len and r.ok_alpha and r.ok_stopwords
        )
        assert r.n_stopwords <= r.n_words
    # the synthetic corpus is lowercase word salad: alpha fraction is 1
    assert all(r.alpha_frac == 1.0 for r in rows)


def test_per_key_reservoir_bounds_and_determinism(spark):
    out1 = QS["sample_per_key_reservoir"].fn(spark, SF).collect()
    out2 = QS["sample_per_key_reservoir"].fn(spark, SF).collect()
    # deterministic across runs (md5 ranking, no RNG)
    assert sorted(r.event_id for r in out1) == sorted(r.event_id for r in out2)
    per_key: dict = {}
    for r in out1:
        per_key[r.user_id] = per_key.get(r.user_id, 0) + 1
    assert max(per_key.values()) <= 5
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # every key with >=5 events contributes exactly 5; smaller keys all rows
    counts = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    for uid, n in counts.items():
        assert per_key.get(uid, 0) == min(n, 5)
