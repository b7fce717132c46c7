"""Technical trading indicators (Bollinger bands, RSI, MACD) — the
domain surface closest to the reference's purpose (a real-time stock
price scraper/forecaster, ``lvmh_forecaster2.py``): the features a
price-prediction pipeline derives from the tick stream before any model
sees it.

All three follow established engine shapes: Bollinger and Cutler-RSI are
pure key-partitioned window aggregates (one shuffle, no Python); MACD is
a three-state recursion (fast EMA, slow EMA, signal EMA of their
difference) carried by the same one-pass ``mapInPandas`` fold as
`ewma`/`kalman_1d` (operators/rolling.py), with a recursive-CTE oracle
replaying the identical IEEE recurrence."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..catalog import load_table
from ..plans.registry import register

__all__ = ["macd"]


@register(
    "ts_bollinger_bands",
    oracle="""
    SELECT user_id, event_id, value,
           round(avg(value) OVER w, 6) AS bb_mid,
           round(avg(value) OVER w + 2.0 * coalesce(stddev_samp(value) OVER w, 0.0), 6)
               AS bb_upper,
           round(avg(value) OVER w - 2.0 * coalesce(stddev_samp(value) OVER w, 0.0), 6)
               AS bb_lower,
           CAST(count(*) OVER w AS BIGINT) AS bb_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    tags=("timeseries", "indicator", "bollinger"),
)
def q_bollinger(spark, sf_dir):
    """20-tick Bollinger bands per key: rolling mean ± 2 sample standard
    deviations — the volatility envelope. One key-partitioned window
    (shares its exchange with any other per-key window in the same
    plan); leading edges keep their truncated windows on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    mid = F.avg("value").over(w)
    sd = F.coalesce(F.stddev_samp("value").over(w), F.lit(0.0))
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.round(mid, 6).alias("bb_mid"),
        F.round(mid + 2.0 * sd, 6).alias("bb_upper"),
        F.round(mid - 2.0 * sd, 6).alias("bb_lower"),
        F.count("*").over(w).cast("long").alias("bb_n"),
    )


@register(
    "ts_rsi",
    oracle="""
    WITH d AS (
        SELECT user_id, event_id, ts, value,
               value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS diff
        FROM events
    ), g AS (
        SELECT user_id, event_id, ts, value,
               greatest(coalesce(diff, 0.0), 0.0) AS gain,
               greatest(-coalesce(diff, 0.0), 0.0) AS loss
        FROM d
    )
    SELECT user_id, event_id, value,
           CASE WHEN sum(loss) OVER w = 0.0 THEN 100.0
                ELSE floor((100.0 - 100.0 / (1.0 + sum(gain) OVER w
                                                  / sum(loss) OVER w))
                           * 10000 + 0.5) / 10000
           END AS rsi
    FROM g
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    """,
    tags=("timeseries", "indicator", "rsi"),
)
def q_rsi(spark, sf_dir):
    """14-tick Cutler RSI per key: 100 − 100/(1 + Σgain/Σloss) over the
    trailing window (the SMA form — Wilder's recursive smoothing is the
    `ewma` fold if needed; Cutler's is the windowed variant that stays
    expression-only). All-gain windows pin to 100; the first tick's
    missing diff counts 0 both sides."""
    ev = load_table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.withColumn(
        "diff", F.col("value") - F.lag("value").over(wl)
    )
    g = d.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.greatest(F.coalesce(F.col("diff"), F.lit(0.0)), F.lit(0.0)).alias("gain"),
        F.greatest(-F.coalesce(F.col("diff"), F.lit(0.0)), F.lit(0.0)).alias("loss"),
    )
    w = wl.rowsBetween(-13, 0)
    sg = F.sum("gain").over(w)
    sl = F.sum("loss").over(w)
    rsi = F.when(sl == 0.0, F.lit(100.0)).otherwise(
        F.floor((F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + sg / sl)) * 10000 + 0.5)
        / 10000
    )
    return g.select("user_id", "event_id", "value", rsi.alias("rsi"))


def macd(
    df,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
):
    """MACD(fast, slow, signal) per key, exact recursive form: two price
    EMAs (α = 2/(n+1)), their difference, and a signal EMA of that
    difference — three coupled states folded in ONE pass (the `ewma`
    scale shape: one hash shuffle on ``key`` + in-partition sort +
    ``mapInPandas`` with O(1) carried state). Seeds: e_fast = e_slow =
    x_1 (so macd_1 = 0) and signal_1 = 0."""
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("macd", DoubleType()),
            StructField("macd_signal", DoubleType()),
            StructField("macd_hist", DoubleType()),
        ]
    )
    af, bf = 2.0 / (fast + 1.0), 1.0 - 2.0 / (fast + 1.0)
    as_, bs = 2.0 / (slow + 1.0), 1.0 - 2.0 / (slow + 1.0)
    ag, bg = 2.0 / (signal + 1.0), 1.0 - 2.0 / (signal + 1.0)
    part = df.repartition(key).sortWithinPartitions(key, ts, tiebreak)

    def fold(batches):
        last_key, ef, es, sig = object(), 0.0, 0.0, 0.0
        for pdf in batches:
            vals = pdf[value].to_numpy(dtype="float64")
            keys = pdf[key].to_numpy()
            m = [0.0] * len(vals)
            s = [0.0] * len(vals)
            h = [0.0] * len(vals)
            for i in range(len(vals)):
                k = keys[i]
                x = float(vals[i])
                if k != last_key:
                    last_key, ef, es, sig = k, x, x, 0.0
                else:
                    ef = af * x + bf * ef
                    es = as_ * x + bs * es
                    sig = ag * (ef - es) + bg * sig
                m[i] = ef - es
                s[i] = sig
                h[i] = (ef - es) - sig
            yield pdf.assign(macd=m, macd_signal=s, macd_hist=h)

    return part.mapInPandas(fold, schema=schema)


@register(
    "ts_macd",
    oracle="""
    WITH RECURSIVE o AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ), s AS (
        SELECT user_id, event_id, value, rn,
               value AS ef, value AS es, CAST(0.0 AS DOUBLE) AS sig
        FROM o WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_id, o.value, o.rn,
               (2.0 / 13.0) * o.value + (1.0 - 2.0 / 13.0) * s.ef AS ef,
               (2.0 / 27.0) * o.value + (1.0 - 2.0 / 27.0) * s.es AS es,
               (2.0 / 10.0) * (((2.0 / 13.0) * o.value + (1.0 - 2.0 / 13.0) * s.ef)
                               - ((2.0 / 27.0) * o.value + (1.0 - 2.0 / 27.0) * s.es))
                 + (1.0 - 2.0 / 10.0) * s.sig AS sig
        FROM s JOIN o ON o.user_id = s.user_id AND o.rn = s.rn + 1
    )
    SELECT user_id, event_id, value,
           floor((ef - es) * 10000 + 0.5) / 10000 AS macd,
           floor(sig * 10000 + 0.5) / 10000 AS macd_signal,
           floor(((ef - es) - sig) * 10000 + 0.5) / 10000 AS macd_hist
    FROM s
    """,
    tags=("timeseries", "indicator", "macd"),
)
def q_macd(spark, sf_dir):
    """MACD(12, 26, 9) per key — the classic momentum crossover feature.
    The recursive-CTE oracle replays the identical three-state IEEE
    recurrence (note the signal update uses the CURRENT ef/es, exactly as
    the fold computes them before updating sig)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    out = macd(ev)
    canon = lambda c: F.floor(F.col(c) * 10000 + 0.5) / 10000  # noqa: E731
    return out.select(
        "user_id",
        "event_id",
        "value",
        canon("macd").alias("macd"),
        canon("macd_signal").alias("macd_signal"),
        canon("macd_hist").alias("macd_hist"),
    )
