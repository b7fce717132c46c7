"""Unit tests for corpus-construction operators (operators/corpus.py) and
the nearest as-of variant: behavior on crafted rows where the synthetic
documents table can't exercise the semantics (PII hits, tie-breaking,
packing overflow), plus scale-shape assertions on the registered plans."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.operators.asof import asof_join_nearest
from real_time_scraping_and_predicting_time_series_data_spark.operators.corpus import (
    bigram_counts,
    build_vocabulary,
    deterministic_shuffle,
    pack_budget_bins,
    pii_redact,
    source_mixture_balance,
    token_entropy,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")


def test_pii_redact_hits_and_counts(spark):
    df = _docs(
        spark,
        [
            (1, "mail bob.smith+x@example.co.uk now", "a", 0),
            (2, "acct 12345678 and 999999 ok, short 12345 kept", "a", 0),
            (3, "clean text only", "a", 0),
        ],
    )
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert got[1]["clean_text"] == "mail <EMAIL> now"
    assert (got[1]["n_emails"], got[1]["n_numbers"]) == (1, 0)
    assert got[2]["clean_text"] == "acct <NUM> and <NUM> ok, short 12345 kept"
    assert (got[2]["n_emails"], got[2]["n_numbers"]) == (0, 2)
    assert got[3]["clean_text"] == "clean text only"


def test_pii_redact_counts_numbers_after_email_redaction(spark):
    """Digit runs living inside an email must not double-count as number
    redactions: counts reconcile with the placeholders in clean_text."""
    df = _docs(spark, [(1, "reach a123456789@x.com or 777777777", "a", 0)])
    row = pii_redact(df).collect()[0]
    assert row["clean_text"] == "reach <EMAIL> or <NUM>"
    assert (row["n_emails"], row["n_numbers"]) == (1, 1)


def test_vocabulary_rank_and_tiebreak(spark):
    df = _docs(spark, [(1, "b b a a c", "a", 0), (2, "a", "a", 0)])
    rows = build_vocabulary(df, top_k=2).collect()
    assert [(r["token"], r["freq"], r["vocab_id"]) for r in rows] == [("a", 3, 1), ("b", 2, 2)]


def test_bigrams_skip_short_docs(spark):
    df = _docs(spark, [(1, "x y z", "a", 0), (2, "solo", "a", 0)])
    got = {r["bigram"]: r["freq"] for r in bigram_counts(df).collect()}
    assert got == {"x y": 1, "y z": 1}


def test_token_entropy_uniform_and_degenerate(spark):
    df = _docs(spark, [(1, "a b c d", "a", 0), (2, "a a a a", "a", 0)])
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert got[1]["token_entropy"] == 2.0  # uniform over 4 tokens = 2 bits
    assert got[2]["token_entropy"] == 0.0
    assert got[1]["n_tokens"] == 4


def test_pack_budget_bins_prefix_semantics(spark):
    # budget 10: sizes 6,6,6 -> cum_before 0,6,12 -> bins 0,0,1
    df = _docs(spark, [(1, "", "s", 6), (2, "", "s", 6), (3, "", "s", 6)])
    rows = {r["bin_id"]: r for r in pack_budget_bins(df, budget=10).collect()}
    assert rows[0]["n_docs"] == 2 and rows[0]["bin_chars"] == 12
    assert rows[1]["n_docs"] == 1 and rows[1]["bin_chars"] == 6


def test_mixture_balances_to_smallest_source(spark):
    df = _docs(
        spark,
        [(i, "", "big", 10) for i in range(8)] + [(100 + i, "", "small", 10) for i in range(3)],
    )
    rows = {r["source"]: r for r in source_mixture_balance(df).collect()}
    assert rows["big"]["n_kept"] == 3 and rows["small"]["n_kept"] == 3


def test_shuffle_is_deterministic_and_ranked(spark):
    df = _docs(spark, [(i, "", "s", 0) for i in range(50)])
    a = deterministic_shuffle(df, limit=10).collect()
    b = deterministic_shuffle(df, limit=10).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["shuffle_rank"] for r in a] == list(range(1, 11))
    keys = [r["shuffle_key"] for r in a]
    assert keys == sorted(keys)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")


def test_asof_nearest_prefers_smaller_gap_backward_on_tie(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    left = _ev(spark, [(1, 7, at(100), 1.0), (2, 7, at(500), 2.0), (3, 8, at(100), 3.0)])
    right = _ev(
        spark,
        [
            (10, 7, at(90), 9.0),    # 10s before left#1
            (11, 7, at(105), 8.0),   # 5s after left#1 -> nearest forward
            (12, 7, at(490), 7.0),   # 10s before left#2 (tie with #13)
            (13, 7, at(510), 6.0),   # 10s after left#2 -> backward wins tie
        ],
    )
    got = {r["event_id"]: r for r in asof_join_nearest(left, right, tolerance_seconds=60).collect()}
    assert got[1]["matched_value"] == 8.0 and got[1]["matched_dir"] == "forward"
    assert got[1]["gap_us"] == 5_000_000
    assert got[2]["matched_value"] == 7.0 and got[2]["matched_dir"] == "backward"
    assert got[3]["matched_value"] is None and got[3]["matched_dir"] is None


def test_vocabulary_plan_no_global_sort(spark):
    """The vocab rank must consume the global ordering through TakeOrdered,
    never a full-vocabulary single-partition sort."""
    from tests.test_plans import _plan

    assert "TakeOrderedAndProject" in _plan(spark, "corpus_vocabulary")
