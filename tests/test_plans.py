"""Physical-plan assertions: the scale properties the engine is designed
around must survive refactors — filter pushdown into parquet scans, column
pruning, broadcast joins for small dims, top-k without a global sort, and
shuffle reuse across window + aggregation stages."""

from __future__ import annotations

import pytest

from real_time_scraping_and_predicting_time_series_data_spark.plans.registry import all_queries

from tests.conftest import SF_SMOKE

QUERIES = all_queries()


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection reaches the scan: key columns only, no l_orderkey/partkey
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q3_broadcasts_dims(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan  # top-10 without global sort
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter pushed


def test_global_topk_avoids_full_sort(spark):
    plan = _plan(spark, "sort_limit_global_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[0]


def test_flagship_single_key_shuffle(spark):
    """Dedup window, variation window and the per-key agg must share ONE
    hash exchange on user_id (the plan's only wide dependency before the
    final top-k)."""
    plan = _plan(spark, "flagship_top_movers")
    body = plan.split("== Physical Plan ==")[1].split("(1) Scan")[0]
    assert body.count("Exchange") == 1, body


def test_asof_union_single_shuffle(spark):
    """The union+last-ignore-nulls as-of join is one exchange + one window,
    not a range join explosion."""
    plan = _plan(spark, "asof_join_click_purchase")
    body = plan.split("== Physical Plan ==")[1].split("(1) Scan")[0]
    assert body.count("Exchange") == 1, body
    assert "Join" not in body  # no join operator at all — window-based


def test_events_scan_prunes_props(spark):
    """The wide JSON column must never be read unless used."""
    plan = _plan(spark, "flagship_top_movers")
    assert "props" not in plan


def test_broadcast_part_join(spark):
    plan = _plan(spark, "join_broadcast_part")
    assert "BroadcastHashJoin" in plan
    assert "LessThanOrEqual(p_size,10)" in plan


def test_semi_anti_planned_as_such(spark):
    assert "LeftSemi" in _plan(spark, "join_semi_customers_with_orders")
    assert "LeftAnti" in _plan(spark, "join_anti_customers_without_orders")
