"""Cross-implementation equivalence tests for the composed join operators:
the bucketized range join against a naive theta join, and the tolerance
as-of join against pandas.merge_asof — independent implementations of the
same semantics on the real events table."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.operators.asof import asof_join
from real_time_scraping_and_predicting_time_series_data_spark.operators.rangejoin import (
    bucketed_range_join,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_range_join_equals_naive_theta_join(spark):
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "ts")
    left = ev.filter(F.col("event_id") % 3 == 0)
    right = ev.filter(F.col("event_id") % 3 == 1)
    win = 1800

    got = {
        (r.l_event_id, r.r_event_id)
        for r in bucketed_range_join(left, right, key="user_id", window_seconds=win).collect()
    }
    naive = (
        left.alias("a")
        .join(
            right.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("a.ts") - F.expr(f"INTERVAL {win} SECOND"))
            & (F.col("b.ts") < F.col("a.ts")),
        )
        .select(F.col("a.event_id").alias("l_id"), F.col("b.event_id").alias("r_id"))
    )
    want = {(r.l_id, r.r_id) for r in naive.collect()}
    assert len(want) > 0
    assert got == want


def test_asof_tolerance_matches_pandas_merge_asof(spark):
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "ts", "value")
    left = ev.filter(F.col("event_id") % 2 == 0)
    right = ev.filter(F.col("event_id") % 2 == 1)
    for direction in ("backward", "forward"):
        got_rows = asof_join(
            left,
            right,
            on="user_id",
            ts="ts",
            right_value_cols=("value",),
            direction=direction,
            tolerance_seconds=900,
        ).collect()
        got = {r.event_id: r.value_right for r in got_rows}

        lp = left.toPandas().sort_values(["ts", "event_id"], kind="mergesort")
        rp = right.toPandas().sort_values(["ts", "event_id"], kind="mergesort")
        merged = pd.merge_asof(
            lp,
            rp[["user_id", "ts", "value"]].rename(columns={"value": "value_right"}),
            on="ts",
            by="user_id",
            direction=direction,
            tolerance=pd.Timedelta(seconds=900),
        )
        want = {
            int(r.event_id): (None if pd.isna(r.value_right) else r.value_right)
            for r in merged.itertuples(index=False)
        }
        assert len(got) == len(want) > 0
        assert got == want, direction
