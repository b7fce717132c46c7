"""Tests for the forecasting dataflow (M1-M4) and multimodal plumbing."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.ml.forecast import (
    LinearForecaster,
    lag_features,
)
from real_time_scraping_and_predicting_time_series_data_spark.operators.multimodal import (
    FEATURE_DIM,
    assets_from_documents,
    decode_features,
    frame_sample,
)


def _series(spark, n=200, keys=(1, 2), noise=1.0):
    """Stationary AR(2) with seeded innovations:
    x_t = 1.2·x_{t-1} − 0.4·x_{t-2} + 5 + e_t (noiseless variant converges
    to the fixed point 25 and becomes collinear — keep noise > 0 for an
    identifiable design matrix)."""
    import datetime as dt

    rng = np.random.default_rng(123)
    rows = []
    eid = 0
    for uid in keys:
        x1, x2 = 10.0 + uid, 12.0 + uid
        for t in range(n):
            x = 1.2 * x1 - 0.4 * x2 + 5.0 + noise * float(rng.standard_normal())
            rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=t), uid, x))
            x2, x1 = x1, x
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")


def test_linear_forecaster_recovers_ar_process(spark):
    df = _series(spark, n=400)
    feats = lag_features(df, lookback=3, horizon=2)
    model = LinearForecaster(lookback=3, horizon=2).fit(feats)
    # step-1 weights recover the AR recurrence up to noise
    w = model.weights[1]
    assert w[1] == pytest.approx(1.2, abs=0.1)
    assert w[2] == pytest.approx(-0.4, abs=0.15)
    preds = model.predict(feats)
    ev = model.evaluate(preds, group=None).collect()[0]
    assert ev["rmse_1"] < 1.5  # ≈ the injected noise sd


def test_fit_matches_numpy_lstsq(spark):
    rng = np.random.default_rng(42)
    import datetime as dt

    vals = rng.normal(100, 5, 120).tolist()
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 1, float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    feats = lag_features(df, lookback=4, horizon=1)
    model = LinearForecaster(lookback=4, horizon=1).fit(feats)

    pdf = feats.dropna(subset=["y_1"]).orderBy("event_id").toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["value"]] + [pdf[f"lag_{i}"] for i in range(1, 4)]
    )
    y = pdf["y_1"].to_numpy()
    want, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert np.allclose(model.weights[1], want, atol=1e-6)


def test_forecaster_beats_persistence_on_trend(spark):
    df = _series(spark, n=100)
    feats = lag_features(df, lookback=3, horizon=1)
    model = LinearForecaster(lookback=3, horizon=1).fit(feats)
    preds = model.predict(feats).dropna(subset=["y_1"])
    both = preds.agg(
        F.sqrt(F.avg(F.pow(F.col("pred_1") - F.col("y_1"), 2))).alias("model"),
        F.sqrt(F.avg(F.pow(F.col("value") - F.col("y_1"), 2))).alias("persistence"),
    ).collect()[0]
    assert both["model"] < both["persistence"]


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@pytest.fixture()
def assets(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    return assets_from_documents(docs)


def test_asset_schema(assets):
    assert dict(assets.dtypes)["payload"] == "binary"
    assert "n_frames" in assets.select("meta.*").columns


def test_decode_features_shape_and_determinism(assets):
    out1 = decode_features(assets).orderBy("asset_id").collect()
    out2 = decode_features(assets).orderBy("asset_id").collect()
    assert len(out1) == 50
    for a, b in zip(out1, out2):
        assert len(a.features) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in a.features)
        assert a.features == b.features  # deterministic fake decode
        assert a.n_bytes > 0


def test_real_decode_is_stubbed(assets):
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        decode_features(assets, real_decode=True).collect()


def test_resize_real_decode_is_stubbed_and_fake_is_aspect_exact(assets):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.multimodal import (
        resize_images,
    )

    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        resize_images(assets, real_decode=True).collect()
    rows = resize_images(assets, target_w=256).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.target_w == 256
        if r.width:
            # round-half-up aspect preservation: within half a pixel of exact
            assert abs(r.target_h - r.height * 256 / r.width) <= 0.5
        assert len(r.resized_hash) == 64


def test_frame_sample_bounds(assets):
    out = frame_sample(assets, stride=7).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r.frame_idx < r.n_frames
        assert r.frame_idx % 7 == 0


def test_keras_path_gated_cleanly(spark):
    """The Keras fidelity path must import everywhere and fail with a clear
    actionable error (not an ImportError at import time) when the backend
    is absent."""
    from real_time_scraping_and_predicting_time_series_data_spark.ml.keras_forecast import (
        HAS_KERAS,
        KerasLSTMForecaster,
    )

    m = KerasLSTMForecaster()
    if HAS_KERAS:  # environment-dependent: exercise for real if available
        m.build_model()
    else:
        with pytest.raises(RuntimeError, match="tensorflow/keras is not installed"):
            m.build_model()


def test_per_key_fit_recovers_distinct_dynamics(spark):
    """Two keys driven by different noiseless AR(2) processes: per-key fit
    must recover each key's coefficients (near-zero RMSE per key), which a
    single global model cannot do."""
    import datetime as dt

    from real_time_scraping_and_predicting_time_series_data_spark.ml.forecast import (
        LinearForecaster,
        fit_per_key,
        lag_features,
        predict_per_key,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    series = {1: ([0.9, -0.2], [10.0, 11.0]), 2: ([0.3, 0.6], [5.0, 4.0])}
    for uid, (ar, seed) in series.items():
        vals = list(seed)
        for t in range(2, 80):
            vals.append(ar[0] * vals[t - 1] + ar[1] * vals[t - 2] + 1.0)
        rows += [
            (uid, i, base + dt.timedelta(minutes=i), float(v)) for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")

    feats = lag_features(df, lookback=3, horizon=1)
    coefs = fit_per_key(feats, lookback=3, horizon=1)
    preds = predict_per_key(feats, coefs, lookback=3).filter(F.col("y_1").isNotNull())
    per_key_rmse = {
        r.user_id: r.rmse
        for r in preds.groupBy("user_id")
        .agg(F.sqrt(F.avg(F.pow(F.col("pred") - F.col("y_1"), 2))).alias("rmse"))
        .collect()
    }
    assert all(v < 1e-6 for v in per_key_rmse.values()), per_key_rmse

    glob = LinearForecaster(lookback=3, horizon=1).fit(feats)
    gpreds = glob.predict(feats).filter(F.col("y_1").isNotNull())
    g_rmse = gpreds.agg(
        F.sqrt(F.avg(F.pow(F.col("pred_1") - F.col("y_1"), 2))).alias("r")
    ).collect()[0].r
    assert g_rmse > 100 * max(per_key_rmse.values())
