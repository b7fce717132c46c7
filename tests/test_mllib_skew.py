"""MLlib GBT forecaster learnability + salted-join equivalence under a
manufactured hot key."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.ml.forecast import lag_features
from real_time_scraping_and_predicting_time_series_data_spark.ml.mllib_forecast import (
    GBTForecaster,
)
from real_time_scraping_and_predicting_time_series_data_spark.operators.skew import salted_join


def test_gbt_learns_nonlinear_series(spark):
    # piecewise/nonlinear series a linear AR fit handles poorly:
    # x_t = 50 + 20*sign(sin(t/5)) + t/50
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
            1,
            50.0 + 20.0 * math.copysign(1, math.sin(i / 5)) + i / 50.0,
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    feats = lag_features(df, lookback=4, horizon=1)
    model = GBTForecaster(lookback=4, horizon=1, max_iter=25).fit(feats)
    preds = model.predict(feats)
    both = (
        preds.dropna(subset=["y_1"])
        .agg(
            F.sqrt(F.avg(F.pow(F.col("pred_1") - F.col("y_1"), 2))).alias("gbt"),
            F.sqrt(F.avg(F.pow(F.col("value") - F.col("y_1"), 2))).alias("persistence"),
        )
        .collect()[0]
    )
    assert both["gbt"] < both["persistence"]


def test_salted_join_equals_plain_join_under_skew(spark):
    # hot key: 90% of probe rows share key 7
    probe = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("rowid"),
    )
    build = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("payload"))
    plain = probe.join(build, "k").select("rowid", "payload")
    salted = salted_join(probe, build, key="k", n_salts=8, salt_source="rowid").select(
        "rowid", "payload"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the salt genuinely spreads the hot key across sub-partitions
    spread = (
        probe.withColumn("_salt", F.pmod(F.xxhash64("rowid"), F.lit(8)))
        .filter(F.col("k") == 7)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(spread) == 8
    counts = [r["count"] for r in spread]
    assert max(counts) < 2 * min(counts)
