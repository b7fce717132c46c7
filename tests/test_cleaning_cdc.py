"""Semantic tests for the corpus-cleaning and CDC operators — constructed
inputs with hand-derivable answers (the DuckDB parity harness covers the
registered-query twins; these pin the operator semantics directly)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.operators.cdc import (
    scd2_history,
    upsert_snapshot,
    with_op,
)
from real_time_scraping_and_predicting_time_series_data_spark.operators.cleaning import (
    decontaminate,
    regex_extract,
    repetition_scores,
)
from real_time_scraping_and_predicting_time_series_data_spark.operators.rolling import holt_linear


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_only_ngram_overlap(spark):
    heldout = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _docs(
        spark,
        [
            # contains the held-out 5-gram "alpha beta gamma delta epsilon"
            (1, "x alpha beta gamma delta epsilon y"),
            # shares words but no 5-gram
            (2, "alpha beta gamma x delta epsilon zeta eta theta"),
            # disjoint
            (3, "one two three four five six"),
        ],
    )
    out = {r.doc_id: (r.n_shared, r.contaminated) for r in decontaminate(train, heldout, n=5).collect()}
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)


def test_repetition_scores_flag_degenerate_doc(spark):
    docs = _docs(
        spark,
        [
            (1, "spam ham " * 20),  # one 2-gram dominates
            (2, " ".join(f"w{i}" for i in range(40))),  # all distinct
        ],
    )
    out = {r.doc_id: r for r in repetition_scores(docs).collect()}
    assert out[1].flagged and out[1].top_2gram_frac > 0.4
    assert out[1].dup_3gram_frac == pytest.approx(1.0)
    assert not out[2].flagged
    assert out[2].dup_3gram_frac == 0.0


def test_regex_extract_counts_and_joins(spark):
    docs = _docs(spark, [(1, "the table and the value but not Tableau"), (2, "xyz")])
    out = {r.doc_id: r for r in regex_extract(docs, r"\b[a-z]+e\b").collect()}
    assert out[1].n_matches == 4  # the, table, the, value
    assert out[1].matches_csv == "the,table,the,value"
    assert out[2].n_matches == 0 and out[2].matches_csv == ""


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )


T0 = dt.datetime(2024, 1, 1)


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


def test_upsert_snapshot_last_wins_and_tombstones(spark):
    log = _log(
        spark,
        [
            (1, 1, _ts(0), "signup", 10.0),
            (1, 2, _ts(1), "click", 20.0),  # U -> final value for user 1
            (2, 3, _ts(0), "signup", 5.0),
            (2, 4, _ts(2), "error", 0.0),  # trailing D -> tombstoned
            (3, 5, _ts(0), "error", 1.0),
            (3, 6, _ts(1), "view", 7.0),  # delete then re-upsert -> alive
        ],
    )
    snap = {r.user_id: r for r in upsert_snapshot(with_op(log)).collect()}
    assert set(snap) == {1, 3}
    assert snap[1].last_value == 20.0 and snap[1].last_op == "U" and snap[1].n_ops == 2
    assert snap[3].last_value == 7.0


def test_scd2_history_intervals_tile_and_current(spark):
    log = _log(
        spark,
        [
            (1, 1, _ts(0), "view", 1.0),
            (1, 2, _ts(1), "view", 1.0),  # unchanged -> collapsed
            (1, 3, _ts(2), "view", 2.0),  # version 2
            (1, 4, _ts(3), "view", 1.0),  # back to 1.0 -> version 3
        ],
    )
    hist = scd2_history(log).orderBy("valid_from").collect()
    assert [r.value for r in hist] == [1.0, 2.0, 1.0]
    # intervals tile: each valid_to equals the next valid_from
    assert hist[0].valid_to == hist[1].valid_from
    assert hist[1].valid_to == hist[2].valid_from
    assert [r.is_current for r in hist] == [False, False, True]


def test_holt_linear_matches_reference_recurrence(spark):
    vals = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0]
    log = _log(
        spark,
        [(1, i, _ts(i), "view", v) for i, v in enumerate(vals)]
        + [(2, 100 + i, _ts(i), "view", v * 2) for i, v in enumerate(vals)],
    )
    out = holt_linear(log, alpha=0.5, beta=0.3).collect()
    got = {
        (r.user_id, r.event_id): (r.holt_level, r.holt_trend) for r in out
    }

    def ref(series):
        lvl, trd = series[0], 0.0
        yield lvl, trd
        for x in series[1:]:
            new = 0.5 * x + 0.5 * (lvl + trd)
            trd = 0.3 * (new - lvl) + 0.7 * trd
            lvl = new
            yield lvl, trd

    for i, (l, t) in enumerate(ref(vals)):
        assert got[(1, i)] == (pytest.approx(l), pytest.approx(t))
    for i, (l, t) in enumerate(ref([v * 2 for v in vals])):
        assert got[(2, 100 + i)] == (pytest.approx(l), pytest.approx(t))
