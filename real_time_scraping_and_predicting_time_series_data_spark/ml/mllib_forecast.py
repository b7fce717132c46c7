"""MLlib forecasting pipeline (the M1 alternative path from SURVEY.md §2.6):
lag features → VectorAssembler → MinMaxScaler → GBTRegressor (one model per
horizon step — the "direct" multi-step strategy mirroring the reference's
Dense(5) multi-output head).

Complements ml/forecast.py's closed-form linear fit: GBT captures the
non-linearities an LSTM would, while remaining a distributed, restartable
Spark-native estimator. The MinMaxScaler stage replicates the reference's
full-history scaler refit (``lvmh_forecaster2.py:79-80`` — leakage-faithful
by default, exactly like the reference; pass a pre-split frame for the
split-safe variant).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import MinMaxScaler, VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.registry import register
from .forecast import lag_features

__all__ = ["GBTForecaster"]


@dataclass
class GBTForecaster:
    lookback: int = 5
    horizon: int = 2
    max_iter: int = 20
    max_depth: int = 3
    seed: int = 42
    models: dict[int, PipelineModel] = field(default_factory=dict)

    def _feature_cols(self) -> list[str]:
        return ["value"] + [f"lag_{i}" for i in range(1, self.lookback)]

    def _pipeline(self, step: int) -> Pipeline:
        return Pipeline(
            stages=[
                VectorAssembler(inputCols=self._feature_cols(), outputCol="raw_features"),
                MinMaxScaler(inputCol="raw_features", outputCol="features"),
                GBTRegressor(
                    featuresCol="features",
                    labelCol=f"y_{step}",
                    predictionCol=f"pred_{step}",
                    maxIter=self.max_iter,
                    maxDepth=self.max_depth,
                    seed=self.seed,
                ),
            ]
        )

    def fit(self, feats: DataFrame) -> "GBTForecaster":
        train = feats.dropna(subset=[f"y_{j}" for j in range(1, self.horizon + 1)])
        for j in range(1, self.horizon + 1):
            self.models[j] = self._pipeline(j).fit(train)
        return self

    def predict(self, feats: DataFrame) -> DataFrame:
        out = feats
        for j, model in self.models.items():
            out = model.transform(out).drop("raw_features", "features")
        return out

    def evaluate(self, preds: DataFrame, group: str | None = None) -> DataFrame:
        exprs = [
            F.sqrt(F.avg(F.pow(F.col(f"pred_{j}") - F.col(f"y_{j}"), 2))).alias(f"rmse_{j}")
            for j in range(1, self.horizon + 1)
        ]
        base = preds.dropna(subset=[f"y_{j}" for j in range(1, self.horizon + 1)])
        return base.groupBy(group).agg(*exprs) if group else base.agg(*exprs)


@register("ml_gbt_forecast_eval", oracle=None, tags=("ml", "mllib", "gbt", "M1", "M3"))
def q_gbt_forecast(spark, sf_dir):
    """MLlib GBT pipeline end to end on events (rows-only; learnability is
    pytest-verified on a synthetic non-linear series)."""
    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    feats = lag_features(ev, lookback=4, horizon=1)
    model = GBTForecaster(lookback=4, horizon=1, max_iter=10).fit(feats)
    preds = model.predict(feats)
    out = model.evaluate(preds, group="user_id")
    return out.select("user_id", F.round("rmse_1", 4).alias("rmse_1"))
