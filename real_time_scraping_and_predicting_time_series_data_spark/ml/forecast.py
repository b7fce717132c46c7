"""Forecasting as Spark dataflow (M1-M4, ``lvmh_forecaster2.py:62-124``).

The reference trains a Keras LSTM(50)x2 on sliding windows of the last
``sequence_length=10`` prices and emits ``forecast_horizon=5`` steps
(``forecaster:30, 22-24``). MLlib has no LSTM; the idiomatic Spark design is
**lag-feature linear autoregression fit by distributed normal equations**:

- featurize: lag columns per key (W1 — one shuffle, window functions);
- fit: X'X and X'y accumulated as map-side aggregates over arrays (a
  (d+1)² matrix per partition, combined associatively — the same pattern
  MLlib uses internally), solved on the driver in O(d³) for d=10;
- predict: broadcast the weight vector back as a literal array; the
  forecast is a JVM-side dot product. Multi-step forecasts are produced by
  one model per horizon step (direct strategy — parallelizable, unlike the
  recursive strategy, and what the reference's Dense(5) head effectively
  learns).
- evaluate: RMSE per key over the as-of-aligned (prediction, actual) pairs
  (A1/M4), exactly the reference's rolling metric.

Retraining every N new rows (M2/W5) maps to re-running ``fit`` inside a
``foreachBatch`` cadence (streaming/pipeline.py).

The generic float paths (``LinearForecaster``, ``fit_per_key``) are verified
by pytest: fitted weights must reproduce numpy's lstsq on the same design
matrix, and RMSE must beat the naive persistence baseline on a learnable
series.  The registered eval queries additionally carry FULL value-hash
oracles (r11): cents-quantized AR(2) with exact BIGINT Gram moments and the
shared `_lc_solve3` adjugate parenthesization, so the whole
fit→predict→eval loop is bit-checked against DuckDB.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register

__all__ = ["LinearForecaster", "lag_features"]


def lag_features(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
    lookback: int = 10,
    horizon: int = 5,
) -> DataFrame:
    """Lag/lead design columns: lag_1..lag_lookback (inputs), y_1..y_horizon
    (targets). Rows lacking a full lookback window are dropped; rows lacking
    targets survive with NULL y (usable for inference)."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    cols = [df[c] for c in df.columns]
    cols += [F.lag(value, i).over(w).alias(f"lag_{i}") for i in range(1, lookback + 1)]
    cols += [F.lead(value, j).over(w).alias(f"y_{j}") for j in range(1, horizon + 1)]
    return df.select(*cols).filter(F.col(f"lag_{lookback}").isNotNull())


@dataclass
class LinearForecaster:
    """Direct multi-step linear AR model over lag features."""

    lookback: int = 10
    horizon: int = 5
    ridge: float = 1e-8
    value_col: str = "value"
    weights: dict[int, list[float]] | None = None  # step -> [bias, w_0..w_{L-1}]

    def _design_cols(self) -> list[str]:
        # The reference's inference window is the last L prices INCLUDING the
        # current one (lvmh_forecaster2.py:112): x_t, x_{t-1}, …, x_{t-L+1}.
        return [self.value_col] + [f"lag_{i}" for i in range(1, self.lookback)]

    def fit(self, feats: DataFrame) -> "LinearForecaster":
        """Normal equations via a single distributed aggregation.

        Builds x = [1, lag_1..lag_L, y_1..y_H] per row, accumulates the
        full Gram matrix Σ x·xᵀ as array-of-array sums (map-side combined),
        then solves the L+1 system per horizon step on the driver.
        """
        d = self.lookback + 1
        xcols = [F.lit(1.0)] + [F.col(c).cast("double") for c in self._design_cols()]
        ycols = [F.col(f"y_{j}").cast("double") for j in range(1, self.horizon + 1)]
        vec = F.array(*(xcols + ycols))
        train = feats.dropna(subset=[f"y_{j}" for j in range(1, self.horizon + 1)])
        outer = F.transform(vec, lambda xi: F.transform(vec, lambda xj: xi * xj))
        # (i, j, Σ x_i·x_j): two posexplodes + hash agg — map-side partial
        # sums make this a single-pass distributed Gram accumulation; only
        # (d+H)² ≈ tiny rows ever reach the driver.
        k = d + self.horizon
        cells = (
            train.select(F.posexplode(outer).alias("i", "row"))
            .select("i", F.posexplode("row").alias("j", "v"))
            .groupBy("i", "j")
            .agg(F.sum("v").alias("s"))
            .collect()
        )
        gram = np.zeros((k, k))
        for r in cells:
            gram[r["i"], r["j"]] = r["s"]
        xtx = gram[:d, :d] + self.ridge * np.eye(d)
        self.weights = {}
        for j in range(1, self.horizon + 1):
            xty = gram[:d, d + j - 1]
            self.weights[j] = np.linalg.solve(xtx, xty).tolist()
        return self

    def predict(self, feats: DataFrame) -> DataFrame:
        """Attach pred_1..pred_horizon as broadcast-literal dot products —
        pure codegen'd arithmetic, no model object on executors."""
        if self.weights is None:
            raise RuntimeError("fit() first")
        out = feats
        for j, w in self.weights.items():
            expr = F.lit(w[0])
            for i, c in enumerate(self._design_cols(), start=1):
                expr = expr + F.lit(w[i]) * F.col(c)
            out = out.withColumn(f"pred_{j}", expr)
        return out

    def evaluate(self, preds: DataFrame, group: str | None = "user_id") -> DataFrame:
        """RMSE of pred_j vs y_j over rows where the actual exists (A1)."""
        exprs = [
            F.sqrt(F.avg(F.pow(F.col(f"pred_{j}") - F.col(f"y_{j}"), 2))).alias(f"rmse_{j}")
            for j in range(1, self.horizon + 1)
        ]
        base = preds.dropna(subset=[f"y_{j}" for j in range(1, self.horizon + 1)])
        return base.groupBy(group).agg(*exprs) if group else base.agg(*exprs)


# ---------------------------------------------------------------------------
# Registered query (rows-only: iterative lin-alg not SQL-expressible)
# ---------------------------------------------------------------------------


def _solve3_sql(m: str, g1: str, g2: str, g3: str) -> tuple[str, str, str, str]:
    """SQL text of the shared adjugate 3×3 solve — the same parenthesization
    as `_lc_solve3` (kept in sync so Spark-Column and DuckDB evaluations of
    the same exact-integer moments are bit-identical).  `m` is the CTE/table
    prefix holding m11..m33 (symmetric normal matrix) and g1..g3 (RHS).
    Returns (det, b0, b1, b2) expression strings; callers divide by det."""
    t1 = f"({m}.m22*{m}.m33 - {m}.m23*{m}.m23)"
    t2 = f"({m}.m13*{m}.m23 - {m}.m12*{m}.m33)"
    t3 = f"({m}.m12*{m}.m23 - {m}.m13*{m}.m22)"
    det = (
        f"({m}.m11 * {t1} - {m}.m12 * ({m}.m12*{m}.m33 - {m}.m13*{m}.m23)"
        f" + {m}.m13 * {t3})"
    )
    b0 = f"({t1} * {g1} + {t2} * {g2} + {t3} * {g3})"
    b1 = (
        f"({t2} * {g1} + ({m}.m11*{m}.m33 - {m}.m13*{m}.m13) * {g2}"
        f" + ({m}.m12*{m}.m13 - {m}.m11*{m}.m23) * {g3})"
    )
    b2 = (
        f"({t3} * {g1} + ({m}.m12*{m}.m13 - {m}.m11*{m}.m23) * {g2}"
        f" + ({m}.m11*{m}.m22 - {m}.m12*{m}.m12) * {g3})"
    )
    return det, b0, b1, b2


def _ar2_linear_oracle() -> str:
    """Full-oracle SQL for ml_linear_forecast_eval (see the query docstring
    for the exactness argument)."""
    det, *bs = _solve3_sql("m", "m.gy1", "m.g11", "m.g21")
    _, *bs2 = _solve3_sql("m", "m.gy2", "m.g12", "m.g22")
    b01, b11, b21 = (f"{b} / m.det" for b in bs)
    b02, b12, b22 = (f"{b} / m.det" for b in bs2)
    return f"""
    WITH f AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS x1,
               CAST(round(lag(value, 1) OVER w * 100) AS BIGINT) AS x2,
               CAST(round(lead(value, 1) OVER w * 100) AS BIGINT) AS y1,
               CAST(round(lead(value, 2) OVER w * 100) AS BIGINT) AS y2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        QUALIFY lag(value, 2) OVER w IS NOT NULL
    ), t AS (
        SELECT * FROM f WHERE y1 IS NOT NULL AND y2 IS NOT NULL
    ), g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
               CAST(sum(x1*x1) AS BIGINT) AS s11, CAST(sum(x1*x2) AS BIGINT) AS s12,
               CAST(sum(x2*x2) AS BIGINT) AS s22,
               CAST(sum(y1) AS BIGINT) AS sy1, CAST(sum(x1*y1) AS BIGINT) AS s1y1,
               CAST(sum(x2*y1) AS BIGINT) AS s2y1,
               CAST(sum(y2) AS BIGINT) AS sy2, CAST(sum(x1*y2) AS BIGINT) AS s1y2,
               CAST(sum(x2*y2) AS BIGINT) AS s2y2
        FROM t
    ), md AS (
        SELECT CAST(n AS DOUBLE) AS m11, CAST(s1 AS DOUBLE) AS m12,
               CAST(s2 AS DOUBLE) AS m13, CAST(s11 AS DOUBLE) AS m22,
               CAST(s12 AS DOUBLE) AS m23, CAST(s22 AS DOUBLE) AS m33,
               CAST(sy1 AS DOUBLE) AS gy1, CAST(s1y1 AS DOUBLE) AS g11,
               CAST(s2y1 AS DOUBLE) AS g21,
               CAST(sy2 AS DOUBLE) AS gy2, CAST(s1y2 AS DOUBLE) AS g12,
               CAST(s2y2 AS DOUBLE) AS g22
        FROM g
    ), m AS (
        SELECT md.*, {det.replace('m.', 'md.')} AS det FROM md
    ), coef AS (
        SELECT {b01} AS b01, {b11} AS b11, {b21} AS b21,
               {b02} AS b02, {b12} AS b12, {b22} AS b22
        FROM m WHERE m.det <> 0
    ), scored AS (
        SELECT t.user_id,
               CAST(floor((CAST(t.y1 AS DOUBLE) - (c.b01 + c.b11 * t.x1 + c.b21 * t.x2))
                          * (CAST(t.y1 AS DOUBLE) - (c.b01 + c.b11 * t.x1 + c.b21 * t.x2))
                          * 100 + 0.5) AS BIGINT) AS e1,
               CAST(floor((CAST(t.y2 AS DOUBLE) - (c.b02 + c.b12 * t.x1 + c.b22 * t.x2))
                          * (CAST(t.y2 AS DOUBLE) - (c.b02 + c.b12 * t.x1 + c.b22 * t.x2))
                          * 100 + 0.5) AS BIGINT) AS e2
        FROM t CROSS JOIN coef c
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_scored,
           round(sqrt(CAST(sum(e1) AS BIGINT) / (100.0 * count(*))) / 100.0, 6) AS rmse_1,
           round(sqrt(CAST(sum(e2) AS BIGINT) / (100.0 * count(*))) / 100.0, 6) AS rmse_2
    FROM scored GROUP BY user_id
    """


@register(
    "ml_linear_forecast_eval",
    oracle=_ar2_linear_oracle(),
    tags=("ml", "forecast", "M1", "M3", "M4"),
)
def q_ml_forecast(spark, sf_dir):
    """M1-M4 end to end, exact-arithmetic edition: lag featurization (W1) →
    single-pass distributed normal-equation fit → broadcast-coefficient
    inference → per-key RMSE, on the events table.  Direct 2-step strategy
    (one model per horizon step), design [1, x_t, x_{t-1}] — the reference's
    sliding-window-in / multi-step-out loop (lvmh_forecaster2.py:62-124) as
    one declarative plan.

    Rows-only until r11; now a FULL value-hash oracle via the
    `ml_learning_curve_ar` device: inputs are cents-quantized so every Gram
    moment is an exact BIGINT (sums of integer-valued doubles stay exact
    below 2^53 regardless of Spark's combine order), the 3×3 solve is the
    shared `_lc_solve3` adjugate parenthesization (`_solve3_sql` emits the
    identical SQL text), predictions associate left-to-right in both
    engines, and per-row squared errors are floor-quantized to BIGINT
    centi-cents² before the order-immune integer sum.  The float lookback-5
    path (`LinearForecaster`, numpy-checked) remains the generic API and is
    pytest-pinned; this query pins the same math bit-exactly.

    Scale: ONE scan → 12 BIGINT moments (map-side combined), coefficients
    are a 1-row broadcast, scoring is codegen'd arithmetic — at 100 TB the
    cost is the scan.  BIGINT moments overflow past ~1e9 rows at cents
    scale; hoist to DECIMAL(38,0) there (documented, as learning-curve)."""
    ev = load_table(spark, sf_dir, "events")
    t = _ar2_complete_rows(ev)
    g = t.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum("y1").cast("long").alias("sy1"),
        F.sum(F.col("x1") * F.col("y1")).cast("long").alias("s1y1"),
        F.sum(F.col("x2") * F.col("y1")).cast("long").alias("s2y1"),
        F.sum("y2").cast("long").alias("sy2"),
        F.sum(F.col("x1") * F.col("y2")).cast("long").alias("s1y2"),
        F.sum(F.col("x2") * F.col("y2")).cast("long").alias("s2y2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    b01, b11, b21 = _lc_solve3(
        d("n"), d("s1"), d("s2"), d("s11"), d("s12"), d("s22"),
        d("sy1"), d("s1y1"), d("s2y1"),
    )
    b02, b12, b22 = _lc_solve3(
        d("n"), d("s1"), d("s2"), d("s11"), d("s12"), d("s22"),
        d("sy2"), d("s1y2"), d("s2y2"),
    )
    coef = g.select(
        b01.alias("b01"), b11.alias("b11"), b21.alias("b21"),
        b02.alias("b02"), b12.alias("b12"), b22.alias("b22"),
    )
    # Singular-design guard (ADVICE r11 mirror of the per-key fix): Spark's
    # Divide is null-on-zero, so det == 0 makes every coefficient NULL —
    # drop the row so a degenerate global design yields an empty eval on
    # both engines (the oracle's coef CTE filters det <> 0 identically).
    coef = coef.filter(F.col("b01").isNotNull())
    return _ar2_rmse_readout(t, coef)


def _ar2_complete_rows(ev) -> "DataFrame":
    """The cents-quantized AR(2) feature relation (x1, x2, y1, y2 +
    user_id/event_id keys), filtered to COMPLETE rows — shared by the
    batch refit and the incremental moment store so both fit and score
    the identical relation."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    f = (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("x1"),
            F.round(F.lag("value", 1).over(w) * 100).cast("long").alias("x2"),
            F.round(F.lead("value", 1).over(w) * 100).cast("long").alias("y1"),
            F.round(F.lead("value", 2).over(w) * 100).cast("long").alias("y2"),
            F.lag("value", 2).over(w).alias("_lag2"),
        )
        .filter(F.col("_lag2").isNotNull())
        .drop("_lag2")
    )
    return f.filter(F.col("y1").isNotNull() & F.col("y2").isNotNull())


def _ar2_rmse_readout(t, coef) -> "DataFrame":
    """Broadcast-coefficient scoring + per-user RMSE over floor-quantized
    BIGINT centi-cents² errors — the order-immune readout both the batch
    refit and the streaming serve share."""
    scored = t.crossJoin(F.broadcast(coef))
    e1 = F.col("y1").cast("double") - (
        F.col("b01") + F.col("b11") * F.col("x1") + F.col("b21") * F.col("x2")
    )
    e2 = F.col("y2").cast("double") - (
        F.col("b02") + F.col("b12") * F.col("x1") + F.col("b22") * F.col("x2")
    )
    q1 = F.floor(e1 * e1 * 100 + F.lit(0.5)).cast("long")
    q2 = F.floor(e2 * e2 * 100 + F.lit(0.5)).cast("long")
    return scored.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_scored"),
        F.round(
            F.sqrt(F.sum(q1).cast("long") / (F.lit(100.0) * F.count("*"))) / F.lit(100.0), 6
        ).alias("rmse_1"),
        F.round(
            F.sqrt(F.sum(q2).cast("long") / (F.lit(100.0) * F.count("*"))) / F.lit(100.0), 6
        ).alias("rmse_2"),
    )


@register(
    "ml_forecast_stream_serve",
    oracle=_ar2_linear_oracle(),
    tags=("ml", "forecast", "streaming", "M2", "incremental", "warm-start"),
)
def q_ml_forecast_stream_serve(spark, sf_dir):
    """INCREMENTAL twin of `ml_linear_forecast_eval` — the M2 warm-start
    gap closed (VERDICT r12 item 7): the reference keeps model weights
    across retrains (lvmh_forecaster2.py:90-104) but refits over full
    history; here each micro-batch publishes only its 12 exact BIGINT
    Gram moments into `ForecastGramStore` and the retrain is a grouped
    sum over the tiny moment grids + the shared 3×3 adjugate solve —
    O(batch) retrain cost, O(1) model state, recursive least squares in
    sufficient-statistics form.

    The feature rows stream in as three deterministic md5-split
    micro-batches; the serve solves from the MERGED moments and scores
    the full feature relation with the broadcast coefficients.  Because
    integer moments are exact under any batch split, the served
    coefficients — and therefore every RMSE row — are bit-identical to
    the batch full-history refit, which is why this query ships under
    the SAME `ml_linear_forecast_eval` oracle: value-hash parity proves
    incremental == batch, not merely approximates it.

    Scale: ingest publishes 12 rows per batch regardless of batch size;
    a retrain reads O(#batches-since-compaction) tiny grids (12 rows
    after `compact()`); only the EVAL scores history — a production
    retrain loop serves predictions from the coefficients alone."""
    import atexit  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from ..functions.hashing import md5_60  # noqa: PLC0415
    from ..streaming.forecast_stream import ForecastGramStore  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    # Materialize the feature relation once: three ingests + the scoring
    # pass would otherwise each re-run the lag/lead window chain.
    t = _ar2_complete_rows(ev).localCheckpoint(eager=True)
    store_dir = tempfile.mkdtemp(prefix="forecast_gram_serve_")
    atexit.register(shutil.rmtree, store_dir, ignore_errors=True)
    store = ForecastGramStore(spark, store_dir)
    key = F.concat(
        F.col("user_id").cast("string"), F.lit(":"), F.col("event_id").cast("string")
    )
    bid_col = F.pmod(md5_60(key), F.lit(3))
    for bid in range(3):
        store.ingest_batch(t.filter(bid_col == F.lit(bid)), bid)
    return _ar2_rmse_readout(t, store.coefficients())


@register(
    "ml_seasonal_naive_eval",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               lag(value, 7) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pred
        FROM events
    )
    SELECT user_id,
           round(sqrt(avg((value - pred) * (value - pred))), 6) AS rmse,
           CAST(count(*) AS BIGINT) AS n_scored
    FROM s WHERE pred IS NOT NULL
    GROUP BY user_id
    """,
    tags=("ml", "baseline", "eval"),
)
def q_seasonal_naive_eval(spark, sf_dir):
    """Seasonal-naive baseline (predict value from 7 ticks ago) scored by
    per-key RMSE — the standard forecast sanity floor (M4), and the one
    forecaster whose full train/predict/eval loop is SQL-expressible, so the
    eval itself is oracle-checked end-to-end."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("pred", F.lag("value", 7).over(w)).filter(F.col("pred").isNotNull())
    err = F.col("value") - F.col("pred")
    return s.groupBy("user_id").agg(
        F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
        F.count("*").alias("n_scored"),
    )


# ---------------------------------------------------------------------------
# Per-key model fitting (one model per key — the "millions of models" shape)
# ---------------------------------------------------------------------------


def fit_per_key(
    feats: DataFrame,
    lookback: int = 5,
    horizon: int = 2,
    key: str = "user_id",
    value_col: str = "value",
    ridge: float = 1e-8,
) -> DataFrame:
    """One AR model per key via grouped-map (``applyInPandas``): each key's
    rows arrive as one Arrow batch, numpy solves the (lookback+1)-dim normal
    equations per horizon step, and only the coefficient vectors leave the
    worker — (|keys| × horizon) tiny rows.

    This is the scale shape for per-entity models (one per ticker / device /
    user): the fit parallelizes across keys with no driver involvement,
    state per task is O(lookback²), and the output coefficient table is
    broadcastable. The global-model twin (``LinearForecaster.fit``) is the
    one-model-over-everything alternative; the test shows per-key fitting
    recovering per-key dynamics a single global model cannot.
    """
    import pandas as pd

    dcols = [value_col] + [f"lag_{i}" for i in range(1, lookback)]
    d = lookback + 1

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.column_stack([np.ones(len(pdf))] + [pdf[c].to_numpy(float) for c in dcols])
        rows = []
        kval = pdf[key].iloc[0]
        for j in range(1, horizon + 1):
            m = pdf[f"y_{j}"].notna().to_numpy()
            Xm, ym = X[m], pdf.loc[m, f"y_{j}"].to_numpy(float)
            w = np.linalg.solve(Xm.T @ Xm + ridge * np.eye(d), Xm.T @ ym)
            rows.append((kval, j, w.tolist()))
        return pd.DataFrame(rows, columns=[key, "step", "coefs"])

    return feats.groupBy(key).applyInPandas(
        _fit, schema=f"{key} long, step int, coefs array<double>"
    )


def predict_per_key(
    feats: DataFrame,
    coefs: DataFrame,
    lookback: int = 5,
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Join the (broadcastable) per-key coefficient table back and score as
    a JVM-side zip_with dot product — one output row per (input row, step),
    no Python in the scoring path."""
    dcols = [value_col] + [f"lag_{i}" for i in range(1, lookback)]
    xarr = F.array(F.lit(1.0), *[F.col(c).cast("double") for c in dcols])
    dot = F.aggregate(
        F.zip_with(xarr, F.col("coefs"), lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return feats.join(F.broadcast(coefs), key).withColumn("pred", dot)


def _per_key_ar2_oracle() -> str:
    """Full-oracle SQL for ml_per_key_forecast_eval: per-(user, step) exact
    Gram under the per-step target mask, shared adjugate solve, quantized
    in-sample scoring — the per-key mirror of `_ar2_linear_oracle`."""
    det, b0, b1, b2 = _solve3_sql("m", "m.gy", "m.g1", "m.g2")
    return f"""
    WITH f AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS x1,
               CAST(round(lag(value, 1) OVER w * 100) AS BIGINT) AS x2,
               CAST(round(lead(value, 1) OVER w * 100) AS BIGINT) AS y1,
               CAST(round(lead(value, 2) OVER w * 100) AS BIGINT) AS y2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        QUALIFY lag(value, 2) OVER w IS NOT NULL
    ), s AS (
        SELECT f.*, st.step,
               CASE WHEN st.step = 1 THEN y1 ELSE y2 END AS yv
        FROM f CROSS JOIN (SELECT 1 AS step UNION ALL SELECT 2) st
    ), g AS (
        SELECT user_id, step,
               CAST(count(*) FILTER (yv IS NOT NULL) AS BIGINT) AS n,
               CAST(sum(x1) FILTER (yv IS NOT NULL) AS BIGINT) AS s1,
               CAST(sum(x2) FILTER (yv IS NOT NULL) AS BIGINT) AS s2,
               CAST(sum(x1*x1) FILTER (yv IS NOT NULL) AS BIGINT) AS s11,
               CAST(sum(x1*x2) FILTER (yv IS NOT NULL) AS BIGINT) AS s12,
               CAST(sum(x2*x2) FILTER (yv IS NOT NULL) AS BIGINT) AS s22,
               CAST(sum(yv) AS BIGINT) AS sy,
               CAST(sum(x1*yv) AS BIGINT) AS s1y,
               CAST(sum(x2*yv) AS BIGINT) AS s2y
        FROM s GROUP BY user_id, step
    ), md AS (
        SELECT user_id, step,
               CAST(n AS DOUBLE) AS m11, CAST(s1 AS DOUBLE) AS m12,
               CAST(s2 AS DOUBLE) AS m13, CAST(s11 AS DOUBLE) AS m22,
               CAST(s12 AS DOUBLE) AS m23, CAST(s22 AS DOUBLE) AS m33,
               CAST(sy AS DOUBLE) AS gy, CAST(s1y AS DOUBLE) AS g1,
               CAST(s2y AS DOUBLE) AS g2
        FROM g
    ), m AS (
        SELECT md.*, {det.replace('m.', 'md.')} AS det FROM md
    ), coef AS (
        SELECT user_id, step,
               {b0} / m.det AS b0, {b1} / m.det AS b1, {b2} / m.det AS b2
        FROM m WHERE m.det <> 0
    ), scored AS (
        SELECT s.user_id, s.step,
               CAST(floor((CAST(s.yv AS DOUBLE) - (c.b0 + c.b1 * s.x1 + c.b2 * s.x2))
                          * (CAST(s.yv AS DOUBLE) - (c.b0 + c.b1 * s.x1 + c.b2 * s.x2))
                          * 100 + 0.5) AS BIGINT) AS e2c
        FROM s JOIN coef c ON s.user_id = c.user_id AND s.step = c.step
        WHERE s.yv IS NOT NULL
    )
    SELECT user_id, CAST(step AS INTEGER) AS step,
           CAST(count(*) AS BIGINT) AS n_scored,
           round(sqrt(CAST(sum(e2c) AS BIGINT) / (100.0 * count(*))) / 100.0, 6) AS rmse
    FROM scored GROUP BY user_id, step
    """


@register(
    "ml_per_key_forecast_eval",
    oracle=_per_key_ar2_oracle(),
    tags=("ml", "forecast", "per-key", "M1", "M4"),
)
def q_ml_per_key_forecast(spark, sf_dir):
    """Per-key AR(2) fit via grouped-map (`applyInPandas`: each key's rows
    arrive as one Arrow batch, only 2 tiny coefficient rows leave the
    worker) → broadcast-coefficient JVM scoring → per-(key, step) RMSE —
    the "one model per ticker" shape (M1/M4, lvmh_forecaster2.py:62-124
    repeated per entity).

    Rows-only until r11; now a FULL value-hash oracle: features are
    cents-quantized BEFORE the groupBy so the per-key Gram moments the
    pandas worker accumulates are exact int64s, and the solve inside the
    UDF is the shared `_lc_solve3` adjugate parenthesization on Python
    floats — bit-identical to the DuckDB CTE (`_solve3_sql` text) because
    both walk the same IEEE expression tree over the same exact integers.
    Per-step target masks (direct strategy: step j trains on rows where
    lead_j exists), in-sample scoring over the same mask.

    The float lookback-5 path (`fit_per_key`/`predict_per_key`,
    numpy-checked) remains the generic API, pytest-pinned.  Scale: the fit
    parallelizes across keys (state per task O(d²)), the coefficient table
    is 2·|keys| rows and broadcast; at 100 TB the cost is one shuffle on
    the key plus the scan."""
    import pandas as pd  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    f = (
        ev.select(
            "user_id",
            F.round(F.col("value") * 100).cast("long").alias("x1"),
            F.round(F.lag("value", 1).over(w) * 100).cast("long").alias("x2"),
            F.round(F.lead("value", 1).over(w) * 100).cast("long").alias("y1"),
            F.round(F.lead("value", 2).over(w) * 100).cast("long").alias("y2"),
            F.lag("value", 2).over(w).alias("_lag2"),
        )
        .filter(F.col("_lag2").isNotNull())
        .drop("_lag2")
    )

    def _fit_exact(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = pdf["user_id"].iloc[0]
        rows = []
        for step, ycol in ((1, "y1"), (2, "y2")):
            m = pdf[ycol].notna()
            x1 = pdf.loc[m, "x1"].to_numpy("int64")
            x2 = pdf.loc[m, "x2"].to_numpy("int64")
            y = pdf.loc[m, ycol].to_numpy("int64")
            s11, s12, s13 = float(len(x1)), float(x1.sum()), float(x2.sum())
            s22, s23, s33 = (
                float((x1 * x1).sum()), float((x1 * x2).sum()), float((x2 * x2).sum())
            )
            # Singular-design guard (ADVICE r11): a key with no rows under
            # this step's mask, or a constant series (x1 == x2 everywhere),
            # has det == 0 — _lc_solve3 would raise ZeroDivisionError on
            # Python floats and crash the whole query.  Skip the (key, step)
            # instead, mirroring the oracle's `WHERE m.det <> 0` (Spark
            # SQL's null-on-zero-divide degrades the column-expression twin
            # the same way).
            det = (
                s11 * (s22 * s33 - s23 * s23)
                - s12 * (s12 * s33 - s13 * s23)
                + s13 * (s12 * s23 - s13 * s22)
            )
            if det == 0.0:
                continue
            b0, b1, b2 = _lc_solve3(
                s11, s12, s13, s22, s23, s33,
                float(y.sum()), float((x1 * y).sum()), float((x2 * y).sum()),
            )
            rows.append((uid, step, b0, b1, b2))
        return pd.DataFrame(rows, columns=["user_id", "step", "b0", "b1", "b2"])

    coefs = f.groupBy("user_id").applyInPandas(
        _fit_exact, schema="user_id long, step int, b0 double, b1 double, b2 double"
    )
    s = f.join(F.broadcast(coefs), "user_id")
    yv = F.when(F.col("step") == 1, F.col("y1")).otherwise(F.col("y2"))
    scored = s.withColumn("yv", yv).filter(F.col("yv").isNotNull())
    err = F.col("yv").cast("double") - (
        F.col("b0") + F.col("b1") * F.col("x1") + F.col("b2") * F.col("x2")
    )
    e2c = F.floor(err * err * 100 + F.lit(0.5)).cast("long")
    return scored.groupBy("user_id", "step").agg(
        F.count("*").cast("long").alias("n_scored"),
        F.round(
            F.sqrt(F.sum(e2c).cast("long") / (F.lit(100.0) * F.count("*"))) / F.lit(100.0), 6
        ).alias("rmse"),
    )


@register(
    "ml_error_metrics",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               lag(value, 7) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pred
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_scored,
           round(sqrt(avg((value - pred) * (value - pred))), 6) AS rmse,
           round(avg(abs(value - pred)), 6) AS mae,
           round(avg(CASE WHEN value <> 0 THEN abs((value - pred) / value) END), 6) AS mape,
           round(avg(CASE WHEN abs(value) + abs(pred) <> 0
                          THEN 2 * abs(value - pred) / (abs(value) + abs(pred)) END), 6) AS smape,
           round(avg(pred - value), 6) AS bias
    FROM s WHERE pred IS NOT NULL
    GROUP BY user_id
    """,
    tags=("ml", "eval", "M4"),
)
def q_ml_error_metrics(spark, sf_dir):
    """Full forecast-error metric suite (RMSE / MAE / MAPE / SMAPE / bias)
    per key over the seasonal-naive predictions — the reference scores only
    RMSE (``lvmh_forecaster2.py:119``); production eval loops track the
    scale-free twins too. One window + one grouped agg, all JVM-side."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn("pred", F.lag("value", 7).over(w)).filter(F.col("pred").isNotNull())
    err = F.col("pred") - F.col("value")
    ae = F.abs(err)
    return s.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_scored"),
        F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
        F.round(F.avg(ae), 6).alias("mae"),
        F.round(F.avg(F.when(F.col("value") != 0, ae / F.abs("value"))), 6).alias("mape"),
        F.round(
            F.avg(
                F.when(
                    F.abs("value") + F.abs("pred") != 0,
                    2 * ae / (F.abs("value") + F.abs("pred")),
                )
            ),
            6,
        ).alias("smape"),
        F.round(F.avg(err), 6).alias("bias"),
    )


@register(
    "ml_backtest_folds",
    oracle="""
    WITH bounds AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
    ), folds(fold) AS (VALUES (1), (2), (3)),
    s AS (
        SELECT user_id, value, epoch_us(ts) AS tus,
               lag(value, 7) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pred
        FROM events
    )
    SELECT f.fold,
           CAST(count(*) AS BIGINT) AS n_scored,
           round(sqrt(avg((s.value - s.pred) * (s.value - s.pred))), 6) AS rmse,
           round(avg(abs(s.value - s.pred)), 6) AS mae
    FROM s, bounds b, folds f
    WHERE s.pred IS NOT NULL
      AND s.tus >= b.lo + (b.hi - b.lo + 1) * f.fold // 4
      AND s.tus <  b.lo + (b.hi - b.lo + 1) * (f.fold + 1) // 4
    GROUP BY f.fold
    """,
    tags=("ml", "eval", "backtest", "M4"),
)
def q_ml_backtest_folds(spark, sf_dir):
    """Rolling-origin backtest (M4 as a proper evaluation protocol): the
    observation span is quartered; folds 1-3 score the seasonal-naive
    forecaster on successive quarter test windows, so each fold's test data
    lies strictly after more history than the last. Fold boundaries are
    exact integer µs arithmetic — bit-identical across engines. Shape: one
    per-key lag window + a broadcast 1-row bounds join + grouped agg; the
    events relation is scanned twice (bounds + scored) but shuffled once."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    )
    folds = spark.range(1, 4).select(F.col("id").cast("int").alias("fold"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        ev.withColumn("pred", F.lag("value", 7).over(w))
        .filter(F.col("pred").isNotNull())
        .withColumn("tus", F.unix_micros("ts"))
    )
    joined = (
        s.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(folds))
        # span+1 boundaries: fold 3's bound is hi+1, so the globally latest
        # observation is scored (with span, `tus < hi` would drop it).
        .filter(
            (F.col("tus") >= F.col("lo") + F.expr("(hi - lo + 1) * fold div 4"))
            & (F.col("tus") < F.col("lo") + F.expr("(hi - lo + 1) * (fold + 1) div 4"))
        )
    )
    err = F.col("value") - F.col("pred")
    return joined.groupBy("fold").agg(
        F.count("*").cast("long").alias("n_scored"),
        F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
        F.round(F.avg(F.abs(err)), 6).alias("mae"),
    )


@register(
    "ml_forecast_intervals",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id,
               value - lag(value, 7) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS r
        FROM events
    ), t AS (
        SELECT user_id, event_id, r,
               row_number() OVER (PARTITION BY user_id ORDER BY r, event_id) AS rn,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        FROM s WHERE r IS NOT NULL
    ), b AS (
        SELECT user_id,
               min(CASE WHEN rn = CAST(ceil(0.1 * n) AS BIGINT) THEN r END) AS lo,
               min(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN r END) AS hi,
               CAST(max(n) AS BIGINT) AS n_scored
        FROM t GROUP BY user_id
    )
    SELECT t.user_id, b.n_scored,
           floor(b.lo * 1000000 + 0.5) / 1000000 AS resid_p10,
           floor(b.hi * 1000000 + 0.5) / 1000000 AS resid_p90,
           floor(CAST(sum(CASE WHEN t.r >= b.lo AND t.r <= b.hi
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / b.n_scored * 1000000 + 0.5) / 1000000 AS coverage
    FROM t JOIN b USING (user_id)
    GROUP BY t.user_id, b.n_scored, b.lo, b.hi
    """,
    tags=("ml", "eval", "intervals"),
)
def q_forecast_intervals(spark, sf_dir):
    """Empirical prediction intervals for the seasonal-naive forecaster
    (M4 closure): per key, the 10th/90th percentile of forecast residuals
    by NEAREST-RANK selection (rank = ceil(p·n) under a unique (r,
    event_id) order — no interpolation, so both engines pick the same
    physical row and the band edges are raw parquet-derived doubles), plus
    the realized coverage of that band. Interpolated percentile_cont is
    engine-ambiguous under ties; nearest-rank is the bit-portable form.
    Shape: ONE user_id exchange feeds both window passes (time-order lag,
    residual-order rank), the bounds table is |keys| rows broadcast back,
    and the coverage agg reuses the same partitioning."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id", "event_id",
        (F.col("value") - F.lag("value", 7).over(wt)).alias("r"),
    ).filter(F.col("r").isNotNull())
    wr = Window.partitionBy("user_id").orderBy("r", "event_id")
    wn = Window.partitionBy("user_id")
    t = s.select(
        "user_id", "event_id", "r",
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count("*").over(wn).cast("long").alias("n"),
    )
    b = t.groupBy("user_id").agg(
        F.min(F.when(F.col("rn") == F.ceil(0.1 * F.col("n")), F.col("r"))).alias("lo"),
        F.min(F.when(F.col("rn") == F.ceil(0.9 * F.col("n")), F.col("r"))).alias("hi"),
        F.max("n").cast("long").alias("n_scored"),
    )
    j = t.join(F.broadcast(b), "user_id")
    covered = F.sum(
        F.when((F.col("r") >= F.col("lo")) & (F.col("r") <= F.col("hi")), 1).otherwise(0)
    )
    return (
        j.groupBy("user_id", "n_scored", "lo", "hi")
        .agg(
            (
                F.floor(
                    covered.cast("double") / F.col("n_scored") * 1000000 + 0.5
                ) / 1000000
            ).alias("coverage")
        )
        .select(
            "user_id", "n_scored",
            (F.floor(F.col("lo") * 1000000 + 0.5) / 1000000).alias("resid_p10"),
            (F.floor(F.col("hi") * 1000000 + 0.5) / 1000000).alias("resid_p90"),
            "coverage",
        )
    )


# ---------------------------------------------------------------------------
# Pinball (quantile) loss evaluation (r10) — are the interval edges good
# QUANTILE FORECASTS, not just well-covered in-sample?
# ---------------------------------------------------------------------------

_PINBALL_QS = (0.1, 0.5, 0.9)


@register(
    "ml_pinball_eval",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id,
               value - lag(value, 7) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS r,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS trank0
        FROM events
    ), t AS (
        SELECT user_id, event_id, r,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY trank0) AS trank,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        FROM s WHERE r IS NOT NULL
    ), tr AS (
        SELECT user_id, r,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY r, event_id) AS rn,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS ntr
        FROM t WHERE trank <= n // 2
    ), q AS (
        SELECT user_id, CAST(max(ntr) AS BIGINT) AS n_train,
               min(CASE WHEN rn = CAST(ceil(0.1 * ntr) AS BIGINT) THEN r END) AS q10,
               min(CASE WHEN rn = CAST(ceil(0.5 * ntr) AS BIGINT) THEN r END) AS q50,
               min(CASE WHEN rn = CAST(ceil(0.9 * ntr) AS BIGINT) THEN r END) AS q90
        FROM tr GROUP BY user_id
    ), te AS (
        SELECT t.user_id, t.r, q.n_train, q.q10, q.q50, q.q90
        FROM t JOIN q USING (user_id) WHERE t.trank > t.n // 2
    ), lo AS (
        SELECT user_id, n_train,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(sum(CAST(floor((CASE WHEN r >= q10 THEN 0.1 * (r - q10)
                         ELSE 0.9 * (q10 - r) END) * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS l10,
               CAST(sum(CAST(floor((CASE WHEN r >= q50 THEN 0.5 * (r - q50)
                         ELSE 0.5 * (q50 - r) END) * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS l50,
               CAST(sum(CAST(floor((CASE WHEN r >= q90 THEN 0.9 * (r - q90)
                         ELSE 0.1 * (q90 - r) END) * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS l90
        FROM te GROUP BY user_id, n_train
    )
    SELECT user_id, n_train, n_test,
           round(l10 / (1000000.0 * n_test), 6) AS pinball_p10,
           round(l50 / (1000000.0 * n_test), 6) AS pinball_p50,
           round(l90 / (1000000.0 * n_test), 6) AS pinball_p90
    FROM lo
    """,
    tags=("ml", "eval", "quantile", "pinball"),
)
def q_ml_pinball_eval(spark, sf_dir):
    """Out-of-sample PINBALL loss of the seasonal-naive quantile
    forecasts: per user, residual quantiles q10/q50/q90 are fit by
    nearest-rank on the FIRST time-half of the residuals and scored with
    the quantile loss L_q on the second half — the proper scoring rule
    for interval edges (`ml_forecast_intervals` checks in-sample
    coverage; this checks the edges actually FORECAST their quantile;
    minimized in expectation by the true quantile).  Because the
    forecast is pred + r_q, the loss collapses to a function of (r,
    r_q) — no value/pred columns carried.  Per-row losses quantize to
    BIGINT micro-units before summing (aggregation-order-immune); the
    train/test split is the per-key time rank with the unique (ts,
    event_id) tiebreak.  One user_id exchange feeds every window."""
    ev = load_table(spark, sf_dir, "events")
    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value", 7).over(wt)).alias("r"),
        F.row_number().over(wt).alias("trank0"),
    ).filter(F.col("r").isNotNull())
    wt2 = Window.partitionBy("user_id").orderBy("trank0")
    wn = Window.partitionBy("user_id")
    t = s.select(
        "user_id",
        "event_id",
        "r",
        F.row_number().over(wt2).alias("trank"),
        F.count("*").over(wn).cast("long").alias("n"),
    )
    tr = t.filter(F.col("trank") <= F.floor(F.col("n") / 2))
    wr = Window.partitionBy("user_id").orderBy("r", "event_id")
    wntr = Window.partitionBy("user_id")
    tr = tr.select(
        "user_id",
        "r",
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count("*").over(wntr).cast("long").alias("ntr"),
    )
    q = tr.groupBy("user_id").agg(
        F.max("ntr").cast("long").alias("n_train"),
        *[
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.lit(qq) * F.col("ntr")), F.col("r")
                )
            ).alias(f"q{int(qq * 100)}")
            for qq in _PINBALL_QS
        ],
    )
    te = t.filter(F.col("trank") > F.floor(F.col("n") / 2)).join(
        F.broadcast(q), "user_id"
    )

    def lmicro(qq: float, qcol: str):
        loss = F.when(
            F.col("r") >= F.col(qcol),
            F.lit(qq) * (F.col("r") - F.col(qcol)),
        ).otherwise(F.lit(1.0 - qq) * (F.col(qcol) - F.col("r")))
        return F.floor(loss * 1000000 + F.lit(0.5)).cast("long")

    lo = te.groupBy("user_id", "n_train").agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum(lmicro(0.1, "q10")).cast("long").alias("l10"),
        F.sum(lmicro(0.5, "q50")).cast("long").alias("l50"),
        F.sum(lmicro(0.9, "q90")).cast("long").alias("l90"),
    )
    return lo.select(
        "user_id",
        "n_train",
        "n_test",
        F.round(F.col("l10") / (F.lit(1000000.0) * F.col("n_test")), 6).alias(
            "pinball_p10"
        ),
        F.round(F.col("l50") / (F.lit(1000000.0) * F.col("n_test")), 6).alias(
            "pinball_p50"
        ),
        F.round(F.col("l90") / (F.lit(1000000.0) * F.col("n_test")), 6).alias(
            "pinball_p90"
        ),
    )


# ---------------------------------------------------------------------------
# Learning curve (r10) — data-scaling audit of the closed-form AR(2) model
# ---------------------------------------------------------------------------


def _lc_solve3(s11, s12, s13, s22, s23, s33, g1, g2, g3):
    """Adjugate solve of the symmetric 3x3 normal equations — the exact
    parenthesization of stats._solve3 (kept in sync with the SQL form).

    Column inputs divide via ``try_divide`` (r13): Spark 4's default ANSI
    mode makes a plain ``/`` THROW on det = 0 instead of yielding the
    NULL the singular-design guards filter — try_divide restores
    null-on-zero under either ANSI setting and is the identical IEEE
    division when det ≠ 0, so oracle parity is untouched.  Float inputs
    keep plain division (the per-key grouped-map fit pre-guards det)."""
    from pyspark.sql import Column  # noqa: PLC0415

    det = (
        s11 * (s22 * s33 - s23 * s23)
        - s12 * (s12 * s33 - s13 * s23)
        + s13 * (s12 * s23 - s13 * s22)
    )
    div = F.try_divide if isinstance(det, Column) else (lambda a, b: a / b)
    b0 = div(
        (s22 * s33 - s23 * s23) * g1
        + (s13 * s23 - s12 * s33) * g2
        + (s12 * s23 - s13 * s22) * g3,
        det,
    )
    b1 = div(
        (s13 * s23 - s12 * s33) * g1
        + (s11 * s33 - s13 * s13) * g2
        + (s12 * s13 - s11 * s23) * g3,
        det,
    )
    b2 = div(
        (s12 * s23 - s13 * s22) * g1
        + (s12 * s13 - s11 * s23) * g2
        + (s11 * s22 - s12 * s12) * g3,
        det,
    )
    return b0, b1, b2


@register(
    "ml_learning_curve_ar",
    oracle="""
    WITH f AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS y,
               CAST(round(lag(value, 1) OVER w * 100) AS BIGINT) AS x1,
               CAST(round(lag(value, 7) OVER w * 100) AS BIGINT) AS x2,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':'
                                  || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                   % 5 AS hq,
               ('0x' || substr(md5('lc:' || CAST(user_id AS VARCHAR) || ':'
                                  || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                   % 4 AS q
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        QUALIFY x1 IS NOT NULL AND x2 IS NOT NULL
    ), fr AS (
        SELECT CAST(ff.range AS BIGINT) AS fraction FROM range(1, 5) ff
    ), gram AS (
        SELECT fr.fraction,
               CAST(count(*) FILTER (hq < 4 AND q < fr.fraction) AS BIGINT) AS n,
               CAST(sum(x1)      FILTER (hq < 4 AND q < fr.fraction) AS BIGINT) AS s1,
               CAST(sum(x2)      FILTER (hq < 4 AND q < fr.fraction) AS BIGINT) AS s2,
               CAST(sum(x1 * x1) FILTER (hq < 4 AND q < fr.fraction) AS BIGINT) AS s11,
               CAST(sum(x1 * x2) FILTER (hq < 4 AND q < fr.fraction) AS BIGINT) AS s12,
               CAST(sum(x2 * x2) FILTER (hq < 4 AND q < fr.fraction) AS BIGINT) AS s22,
               CAST(sum(y)       FILTER (hq < 4 AND q < fr.fraction) AS BIGINT) AS sy,
               CAST(sum(x1 * y)  FILTER (hq < 4 AND q < fr.fraction) AS BIGINT) AS s1y,
               CAST(sum(x2 * y)  FILTER (hq < 4 AND q < fr.fraction) AS BIGINT) AS s2y
        FROM f CROSS JOIN fr GROUP BY fr.fraction
    ), model AS (
        SELECT fraction, n,
               CAST(n AS DOUBLE) AS m11, CAST(s1 AS DOUBLE) AS m12,
               CAST(s2 AS DOUBLE) AS m13, CAST(s11 AS DOUBLE) AS m22,
               CAST(s12 AS DOUBLE) AS m23, CAST(s22 AS DOUBLE) AS m33,
               CAST(sy AS DOUBLE) AS g1, CAST(s1y AS DOUBLE) AS g2,
               CAST(s2y AS DOUBLE) AS g3
        FROM gram
    ), modeld AS (
        SELECT *,
               (m11 * (m22*m33 - m23*m23) - m12 * (m12*m33 - m13*m23)
                + m13 * (m12*m23 - m13*m22)) AS det
        FROM model
    ), coef AS (
        SELECT fraction, n AS n_train,
               ((m22*m33 - m23*m23) * g1 + (m13*m23 - m12*m33) * g2
                + (m12*m23 - m13*m22) * g3) / det AS b0,
               ((m13*m23 - m12*m33) * g1 + (m11*m33 - m13*m13) * g2
                + (m12*m13 - m11*m23) * g3) / det AS b1,
               ((m12*m23 - m13*m22) * g1 + (m12*m13 - m11*m23) * g2
                + (m11*m22 - m12*m12) * g3) / det AS b2
        FROM modeld WHERE det <> 0
    ), scored AS (
        SELECT c.fraction, c.n_train, c.b0, c.b1, c.b2,
               CAST(floor((CAST(f.y AS DOUBLE) - (c.b0 + c.b1 * f.x1 + c.b2 * f.x2))
                          * (CAST(f.y AS DOUBLE) - (c.b0 + c.b1 * f.x1 + c.b2 * f.x2))
                          * 100 + 0.5) AS BIGINT) AS e2c
        FROM f JOIN coef c ON true
        WHERE f.hq = 4
    )
    SELECT fraction, n_train,
           CAST(count(*) AS BIGINT) AS n_test,
           round(sqrt(CAST(sum(e2c) AS BIGINT)
                      / (100.0 * count(*))) / 100.0, 6) AS rmse
    FROM scored GROUP BY fraction, n_train
    """,
    tags=("ml", "eval", "learning-curve"),
)
def q_ml_learning_curve(spark, sf_dir):
    """Learning curve of the closed-form AR(2) forecaster (y_t on lags 1
    and 7, cents-quantized): four NESTED training sets — 25/50/75/100% of
    the train pool by md5 quartile — fit by exact 3×3 normal equations
    and scored on one fixed 20% held-out split — the REGRESSION companion
    of `ml_learning_curve` (which scales a per-user mean model along the
    time axis): this one scales a fitted model along the sample axis with
    nested hash fractions, so curve differences are purely data-volume.

    One-scan shape: all four Gram matrices are conditional BIGINT sums
    over the same pass (nested by construction: quartile < f), each
    solved by the shared adjugate; scoring is one broadcast of 4
    coefficient rows into the test relation with per-row squared errors
    quantized to BIGINT centi-cents² (aggregation-order-immune).  (BIGINT
    Gram sums overflow past ~1e9 rows at cents scale — hoist to
    DECIMAL(38,0) there; kept BIGINT for bit-checkability.)"""
    ev = load_table(spark, sf_dir, "events")
    from ..functions.hashing import md5_60  # noqa: PLC0415

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    key = F.concat(
        F.col("user_id").cast("string"), F.lit(":"), F.col("event_id").cast("string")
    )
    f = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("y"),
            F.round(F.lag("value", 1).over(w) * 100).cast("long").alias("x1"),
            F.round(F.lag("value", 7).over(w) * 100).cast("long").alias("x2"),
            (md5_60(key) % 5).alias("hq"),
            (md5_60(F.concat(F.lit("lc:"), key)) % 4).alias("q"),
        )
        .filter(F.col("x1").isNotNull() & F.col("x2").isNotNull())
        .localCheckpoint(eager=False)
    )
    # r14: the 36 conditional Gram aggregates and the four adjugate solves
    # are built as parsed expression strings (identical CASE/arithmetic
    # trees — the `stats_bootstrap_ci` device): the Column construction
    # cost ~1.7 s of py4j round trips per query build.
    def gsum(expr: str, fr: int) -> str:
        return (
            f"CAST(sum(CASE WHEN hq < 4 AND q < {fr}"
            f" THEN {expr} ELSE 0 END) AS BIGINT)"
        )

    aggs = []
    for fr in range(1, 5):
        aggs += [
            F.expr(gsum("1", fr)).alias(f"n_{fr}"),
            F.expr(gsum("x1", fr)).alias(f"s1_{fr}"),
            F.expr(gsum("x2", fr)).alias(f"s2_{fr}"),
            F.expr(gsum("x1 * x1", fr)).alias(f"s11_{fr}"),
            F.expr(gsum("x1 * x2", fr)).alias(f"s12_{fr}"),
            F.expr(gsum("x2 * x2", fr)).alias(f"s22_{fr}"),
            F.expr(gsum("y", fr)).alias(f"sy_{fr}"),
            F.expr(gsum("x1 * y", fr)).alias(f"s1y_{fr}"),
            F.expr(gsum("x2 * y", fr)).alias(f"s2y_{fr}"),
        ]
    g = f.agg(*aggs)
    rows = []
    for fr in range(1, 5):
        dd = lambda c: f"CAST({c}_{fr} AS DOUBLE)"  # noqa: B023, E731
        s11, s12, s13 = dd("n"), dd("s1"), dd("s2")
        s22, s23, s33 = dd("s11"), dd("s12"), dd("s22")
        g1, g2, g3 = dd("sy"), dd("s1y"), dd("s2y")
        det = (
            f"({s11} * ({s22}*{s33} - {s23}*{s23})"
            f" - {s12} * ({s12}*{s33} - {s13}*{s23})"
            f" + {s13} * ({s12}*{s23} - {s13}*{s22}))"
        )
        b0 = (
            f"try_divide(({s22}*{s33} - {s23}*{s23}) * {g1}"
            f" + ({s13}*{s23} - {s12}*{s33}) * {g2}"
            f" + ({s12}*{s23} - {s13}*{s22}) * {g3}, {det})"
        )
        b1 = (
            f"try_divide(({s13}*{s23} - {s12}*{s33}) * {g1}"
            f" + ({s11}*{s33} - {s13}*{s13}) * {g2}"
            f" + ({s12}*{s13} - {s11}*{s23}) * {g3}, {det})"
        )
        b2 = (
            f"try_divide(({s12}*{s23} - {s13}*{s22}) * {g1}"
            f" + ({s12}*{s13} - {s11}*{s23}) * {g2}"
            f" + ({s11}*{s22} - {s12}*{s12}) * {g3}, {det})"
        )
        rows.append(
            F.struct(
                F.lit(fr).cast("long").alias("fraction"),
                F.col(f"n_{fr}").alias("n_train"),
                F.expr(b0).alias("b0"),
                F.expr(b1).alias("b1"),
                F.expr(b2).alias("b2"),
            )
        )
    # Singular-design guard (ADVICE r12): Spark's non-ANSI zero-divide
    # yields NULL coefficients where DuckDB yields Inf/NaN — drop det = 0
    # fractions on BOTH sides (oracle: `WHERE det <> 0` in the coef CTE).
    coef = (
        g.select(F.explode(F.array(*rows)).alias("c"))
        .select("c.*")
        .filter(F.col("b0").isNotNull())
    )
    test = f.filter(F.col("hq") == 4)
    scored = test.crossJoin(F.broadcast(coef))
    err = F.col("y").cast("double") - (
        F.col("b0") + F.col("b1") * F.col("x1") + F.col("b2") * F.col("x2")
    )
    e2c = F.floor(err * err * 100 + F.lit(0.5)).cast("long")
    return (
        scored.groupBy("fraction", "n_train")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.round(
                F.sqrt(
                    F.sum(e2c).cast("long") / (F.lit(100.0) * F.count("*"))
                )
                / F.lit(100.0),
                6,
            ).alias("rmse"),
        )
    )


@register(
    "ml_yule_walker_ar2",
    oracle="""
    WITH f AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS x,
               CAST(round(lag(value, 1) OVER w * 100) AS BIGINT) AS l1,
               CAST(round(lag(value, 2) OVER w * 100) AS BIGINT) AS l2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(CASE WHEN l1 IS NOT NULL THEN x * l1 END) AS BIGINT) AS a1,
               CAST(sum(CASE WHEN l1 IS NOT NULL THEN x END) AS BIGINT) AS b1,
               CAST(sum(CASE WHEN l1 IS NOT NULL THEN l1 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN l2 IS NOT NULL THEN x * l2 END) AS BIGINT) AS a2,
               CAST(sum(CASE WHEN l2 IS NOT NULL THEN x END) AS BIGINT) AS b2,
               CAST(sum(CASE WHEN l2 IS NOT NULL THEN l2 END) AS BIGINT) AS c2
        FROM f GROUP BY user_id
    ), gam AS (
        SELECT user_id, n,
               (CAST(sxx AS DOUBLE) - (CAST(s AS DOUBLE) / n) * s
                - (CAST(s AS DOUBLE) / n) * s
                + n * ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))) / n AS g0,
               (CAST(a1 AS DOUBLE) - (CAST(s AS DOUBLE) / n) * b1
                - (CAST(s AS DOUBLE) / n) * c1
                + (n - 1) * ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))) / n AS g1,
               (CAST(a2 AS DOUBLE) - (CAST(s AS DOUBLE) / n) * b2
                - (CAST(s AS DOUBLE) / n) * c2
                + (n - 2) * ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))) / n AS g2
        FROM g WHERE n >= 10
    )
    SELECT user_id, n,
           floor(g0 / 10000.0 * 1000000 + 0.5) / 1000000 AS gamma0,
           floor((g1 * (g0 - g2)) / (g0 * g0 - g1 * g1) * 1000000 + 0.5) / 1000000
               AS phi1,
           floor((g0 * g2 - g1 * g1) / (g0 * g0 - g1 * g1) * 1000000 + 0.5) / 1000000
               AS phi2,
           floor((g1 / g0) * 1000000 + 0.5) / 1000000 AS rho1
    FROM gam
    WHERE g0 > 0 AND g0 * g0 - g1 * g1 <> 0
    """,
    tags=("ml", "timeseries", "autoregression", "yule-walker"),
)
def q_ml_yule_walker_ar2(spark, sf_dir):
    """Per-key AR(2) via the Yule–Walker equations — fit from the series'
    own autocovariances (γ₀, γ₁, γ₂, biased 1/n normalization, full-series
    mean) instead of the regression Gram: φ₁ = γ₁(γ₀−γ₂)/(γ₀²−γ₁²),
    φ₂ = (γ₀γ₂−γ₁²)/(γ₀²−γ₁²).  The moment-method complement of
    `ml_per_key_forecast_eval`'s least-squares AR(2) (Yule–Walker is what
    Levinson–Durbin recursions and PACF cutoff diagnostics are built on);
    ρ₁ = γ₁/γ₀ is the lag-1 autocorrelation readout.

    Exactness: cents-quantized series makes every moment (Σx, Σx², lagged
    cross-sums and their boundary sums) an exact BIGINT; each γₖ expands
    the demeaned product sum as A − x̄B − x̄C + (n−k)x̄² — one identical
    rational→double expression per engine — and the φ ratios share one
    parenthesization.  Scale: single window pass for the two lags (the W1
    shuffle on user_id), then one grouped 9-moment integer agg."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    f = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.round(F.lag("value", 1).over(w) * 100).cast("long").alias("l1"),
        F.round(F.lag("value", 2).over(w) * 100).cast("long").alias("l2"),
    )
    g = f.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.when(F.col("l1").isNotNull(), F.col("x") * F.col("l1"))).cast("long").alias("a1"),
        F.sum(F.when(F.col("l1").isNotNull(), F.col("x"))).cast("long").alias("b1"),
        F.sum(F.when(F.col("l1").isNotNull(), F.col("l1"))).cast("long").alias("c1"),
        F.sum(F.when(F.col("l2").isNotNull(), F.col("x") * F.col("l2"))).cast("long").alias("a2"),
        F.sum(F.when(F.col("l2").isNotNull(), F.col("x"))).cast("long").alias("b2"),
        F.sum(F.when(F.col("l2").isNotNull(), F.col("l2"))).cast("long").alias("c2"),
    )
    xb = F.col("s").cast("double") / F.col("n")

    def gamma(a, b, c, k):
        return (
            F.col(a).cast("double")
            - xb * F.col(b)
            - xb * F.col(c)
            + (F.col("n") - k) * (xb * xb)
        ) / F.col("n")

    gam = g.filter(F.col("n") >= 10).select(
        "user_id",
        "n",
        gamma("sxx", "s", "s", 0).alias("g0"),
        gamma("a1", "b1", "c1", 1).alias("g1"),
        gamma("a2", "b2", "c2", 2).alias("g2"),
    )
    canon = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    den = F.col("g0") * F.col("g0") - F.col("g1") * F.col("g1")
    # Degenerate-key guard (ADVICE r11): a constant per-user series has
    # g0 = 0 (and perfectly correlated lags make den = 0) — Spark's
    # null-on-zero-divide would emit NULL where DuckDB's IEEE division
    # emits NaN/Inf, a latent parity break.  Filter the keys identically
    # on both engines instead (the oracle carries the same WHERE).
    gam = gam.filter((F.col("g0") > 0) & (den != 0))
    return gam.select(
        "user_id",
        "n",
        canon(F.col("g0") / F.lit(10000.0)).alias("gamma0"),
        canon((F.col("g1") * (F.col("g0") - F.col("g2"))) / den).alias("phi1"),
        canon((F.col("g0") * F.col("g2") - F.col("g1") * F.col("g1")) / den).alias("phi2"),
        canon(F.col("g1") / F.col("g0")).alias("rho1"),
    )
