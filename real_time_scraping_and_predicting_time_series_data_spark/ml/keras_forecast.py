"""Keras-fidelity forecasting path (M1/M2/M3 exact-architecture twin).

The reference model is LSTM(50, seq)→Dropout(.2)→LSTM(50)→Dropout(.2)→
Dense(horizon), adam + MSE, warm-start ``fit(epochs=50, batch_size=32)``
over all history every 10 new rows (``lvmh_forecaster2.py:62-71, 90-104``).

TensorFlow is NOT available in this container, so this module is the gated
fidelity path: the Spark-side plumbing (driver-side training over the
collected window tensor from ``sliding_features``; executor-side inference
through a scalar pandas UDF applying the broadcast weights) is laid out and
importable, and every entry point degrades with a clear error when the
backend is absent. The supported production path is ``ml/forecast.py``
(linear AR) / ``ml/mllib_forecast.py`` (GBT).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

try:  # gate: keras/tensorflow are optional, absent in this environment
    from tensorflow import keras  # type: ignore

    HAS_KERAS = True
except Exception:  # noqa: BLE001 — any import failure means "no backend"
    keras = None
    HAS_KERAS = False

__all__ = ["HAS_KERAS", "KerasLSTMForecaster"]


@dataclass
class KerasLSTMForecaster:
    """Exact reference architecture; usable only when tensorflow is
    installed (``HAS_KERAS``)."""

    sequence_length: int = 10
    horizon: int = 5
    epochs: int = 50
    batch_size: int = 32
    _model: object | None = None

    def _require_backend(self) -> None:
        if not HAS_KERAS:
            raise RuntimeError(
                "tensorflow/keras is not installed in this environment; use "
                "ml.forecast.LinearForecaster or ml.mllib_forecast.GBTForecaster "
                "(same dataflow, supported backends)"
            )

    def build_model(self):
        """lvmh_forecaster2.py:62-71 verbatim architecture."""
        self._require_backend()
        model = keras.Sequential(
            [
                keras.layers.LSTM(50, return_sequences=True, input_shape=(self.sequence_length, 1)),
                keras.layers.Dropout(0.2),
                keras.layers.LSTM(50),
                keras.layers.Dropout(0.2),
                keras.layers.Dense(self.horizon),
            ]
        )
        model.compile(optimizer="adam", loss="mse")
        self._model = model
        return model

    def fit(self, feats: DataFrame) -> "KerasLSTMForecaster":
        """Warm-start fit over the collected (features, targets) window
        table from ``operators.timeseries.sliding_features`` — training is
        driver-side (model is small; data volume = windows, which a
        TB-scale deployment would sample or shard via Horovod-style tools,
        out of scope here)."""
        self._require_backend()
        import numpy as np

        pdf = feats.select("features", "targets").toPandas()
        X = np.stack(pdf["features"].to_numpy())[:, :, None].astype("float32")
        y = np.stack(pdf["targets"].to_numpy()).astype("float32")
        if self._model is None:
            self.build_model()
        self._model.fit(X, y, epochs=self.epochs, batch_size=self.batch_size, verbose=0)
        return self

    def predict(self, feats: DataFrame) -> DataFrame:
        """Executor-side inference: broadcast weights into a scalar pandas
        UDF over the ``features`` array column."""
        self._require_backend()
        import numpy as np
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        from pyspark.sql.functions import pandas_udf

        weights = self._model.get_weights()
        cfg = self._model.get_config()
        spark = feats.sparkSession
        bc = spark.sparkContext.broadcast((cfg, weights))

        @pandas_udf(T.ArrayType(T.DoubleType()))
        def infer(features: pd.Series) -> pd.Series:
            c, w = bc.value
            m = keras.Sequential.from_config(c)
            m.set_weights(w)
            X = np.stack(features.to_numpy())[:, :, None].astype("float32")
            return pd.Series(list(m.predict(X, verbose=0).astype(float)))

        return feats.withColumn("forecast", infer(F.col("features")))
