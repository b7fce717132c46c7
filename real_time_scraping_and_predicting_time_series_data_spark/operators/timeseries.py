"""Time-series signature operators of the reference pipeline.

Re-expresses, as declarative keyed Spark operators (scaling from the
reference's single implicit ticker to millions of keys):

- change-detection dedup      (P2, ``asyncio scraping.py:80-83``)
- anchored variation          (P3, ``asyncio scraping.py:45-52``)
- sliding-window featurization(W1, ``lvmh_forecaster2.py:73-88``)
- last-N tail window          (W2, ``lvmh_forecaster2.py:112``)
- tick down-sampling          (W4, ``lvmh_forecaster2.py:250-252``)
- RMSE aggregate              (A1, ``lvmh_forecaster2.py:126-148``)
- min/max/mean aggregates     (A2/A3, ``lvmh_forecaster2.py:242-273``)
- MinMax scaling              (A5, ``lvmh_forecaster2.py:79-80,113,122``)
- tumbling-window aggregation (streaming-shaped; batch twin of the
  micro-batch loop S4, ``lvmh_forecaster2.py:313-336``)

Scale notes: every operator partitions by key (``user_id``); the only
shuffles are the per-key hash partition for window functions and the final
group-by — both on the same key, so AQE can reuse the exchange. No
driver-side loops, no UDFs: all expressions stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ..plans.registry import register
from ..catalog import load_table

__all__ = [
    "change_dedup",
    "anchored_variation",
    "sliding_features",
    "tail_window",
    "downsample",
    "rmse",
    "minmax_scale",
    "gaps_islands",
]

# ---------------------------------------------------------------------------
# Composable operators
# ---------------------------------------------------------------------------


def _key_window(key: str, ts: str, tiebreak: str) -> WindowSpec:
    return Window.partitionBy(key).orderBy(ts, tiebreak)


def change_dedup(
    df: DataFrame, key: str = "user_id", ts: str = "ts", value: str = "value", tiebreak: str = "event_id"
) -> DataFrame:
    """Consecutive-distinct filter: keep a row only when ``value`` differs
    from the previous retained value per key; the first row per key is always
    kept (``asyncio scraping.py:80-83``).

    Because equal *consecutive* raw values collapse transitively, filtering on
    ``lag(value)`` over the raw stream is equivalent to the reference's
    retained-stream comparison. One hash partition by key; O(1) state per row.
    """
    w = _key_window(key, ts, tiebreak)
    prev = F.lag(value).over(w)
    return (
        df.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(value)))
        .drop("_prev")
    )


def anchored_variation(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
    out: str = "variation",
) -> DataFrame:
    """``variation = value / first_value - 1`` with the anchor latched from
    the first observation per key (``asyncio scraping.py:45-52``); first row
    gets exactly 0.0.
    """
    w = _key_window(key, ts, tiebreak).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    first = F.first(value).over(w)
    return df.withColumn(out, F.col(value) / first - F.lit(1.0))


def sliding_features(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
    lookback: int = 10,
    horizon: int = 5,
) -> DataFrame:
    """Sliding-window featurization (``lvmh_forecaster2.py:73-88``): for each
    row, ``features`` = the last ``lookback`` values (inclusive) and
    ``targets`` = the next ``horizon`` values. Rows without a full window are
    dropped, mirroring the reference's range bound.

    ``collect_list`` over a row-frame window; one shuffle on the key.
    """
    w = _key_window(key, ts, tiebreak)
    feat = F.collect_list(value).over(w.rowsBetween(-(lookback - 1), 0))
    targ = F.collect_list(value).over(w.rowsBetween(1, horizon))
    return (
        df.withColumn("features", feat)
        .withColumn("targets", targ)
        .filter((F.size("features") == lookback) & (F.size("targets") == horizon))
    )


def tail_window(
    df: DataFrame, n: int, key: str = "user_id", ts: str = "ts", tiebreak: str = "event_id"
) -> DataFrame:
    """Most recent ``n`` rows per key (``lvmh_forecaster2.py:112`` takes the
    last ``sequence_length`` prices as inference input).

    ``row_number`` over a descending per-key window then filter — a single
    shuffle; at scale this is the standard grouped top-k (partial top-k per
    map task would be a further optimization via ``Window`` + AQE).
    """
    w = Window.partitionBy(key).orderBy(F.desc(ts), F.desc(tiebreak))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n).drop("_rn")


def downsample(
    df: DataFrame, step: int, key: str = "user_id", ts: str = "ts", tiebreak: str = "event_id"
) -> DataFrame:
    """Keep every ``step``-th row per key, plus the last row
    (``lvmh_forecaster2.py:250-252`` axis-tick thinning)."""
    w = _key_window(key, ts, tiebreak)
    cnt = Window.partitionBy(key)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(cnt))
        .filter(((F.col("_rn") - 1) % step == 0) | (F.col("_rn") == F.col("_n")))
        .drop("_rn", "_n")
    )


def rmse(df: DataFrame, actual: str, pred: str, group: list[str] | None = None) -> DataFrame:
    """RMSE over rows where both columns are present
    (``lvmh_forecaster2.py:126-148``: dropna then sqrt(mean(sq diff)))."""
    filtered = df.filter(F.col(actual).isNotNull() & F.col(pred).isNotNull())
    expr = F.sqrt(F.avg(F.pow(F.col(actual) - F.col(pred), F.lit(2)))).alias("rmse")
    if group:
        return filtered.groupBy(*group).agg(expr)
    return filtered.agg(expr)


def minmax_scale(
    df: DataFrame, value: str = "value", key: str | None = None, out: str = "scaled"
) -> DataFrame:
    """MinMax [0,1] scaling (``lvmh_forecaster2.py:26,79-80``): fit = min/max
    aggregate over the whole history, transform = (x-mn)/(mx-mn).

    The reference refits over ALL history each retrain (leakage-faithful
    mode); a split-safe variant would compute the agg over the training
    prefix only. Implemented as agg + broadcast join (scalar subquery
    semantics) — no window over the full table, so no single-partition
    bottleneck at scale.
    """
    if key is None:
        stats = df.agg(
            F.min(value).alias("_mn"), F.max(value).alias("_mx")
        )
        joined = df.crossJoin(F.broadcast(stats))
    else:
        stats = df.groupBy(key).agg(F.min(value).alias("_mn"), F.max(value).alias("_mx"))
        joined = df.join(F.broadcast(stats), on=key)
    rng = F.col("_mx") - F.col("_mn")
    scaled = F.when(rng == 0, F.lit(0.0)).otherwise((F.col(value) - F.col("_mn")) / rng)
    return joined.withColumn(out, scaled).drop("_mn", "_mx")


# ---------------------------------------------------------------------------
# Registered queries (events table; each with a DuckDB oracle twin)
# ---------------------------------------------------------------------------


@register(
    "ts_change_dedup",
    oracle="""
    SELECT event_id, user_id, value FROM (
        SELECT event_id, user_id, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ) t WHERE prev IS NULL OR prev <> value
    """,
    tags=("timeseries", "P2"),
)
def q_change_dedup(spark, sf_dir):
    """P2: consecutive-distinct tick filter per key."""
    ev = load_table(spark, sf_dir, "events")
    return change_dedup(ev).select("event_id", "user_id", "value")


@register(
    "ts_anchored_variation",
    oracle="""
    SELECT event_id, user_id, value,
           round(value / first_value(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1, 9) AS variation
    FROM events
    """,
    tags=("timeseries", "P3"),
)
def q_anchored_variation(spark, sf_dir):
    """P3: per-key variation vs. first observed value."""
    ev = load_table(spark, sf_dir, "events")
    out = anchored_variation(ev)
    return out.select(
        "event_id", "user_id", "value", F.round("variation", 9).alias("variation")
    )


@register(
    "ts_sliding_features_lags",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value, 2) OVER w AS lag_2, lag(value, 1) OVER w AS lag_1,
           lead(value, 1) OVER w AS lead_1, lead(value, 2) OVER w AS lead_2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    QUALIFY lag_2 IS NOT NULL AND lead_2 IS NOT NULL
    """,
    tags=("timeseries", "W1"),
)
def q_sliding_features_lags(spark, sf_dir):
    """W1 (scalar form): lookback window as lag columns, targets as leads —
    the SQL-checkable twin of the array-valued ``sliding_features``."""
    ev = load_table(spark, sf_dir, "events")
    w = _key_window("user_id", "ts", "event_id")
    out = ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 2).over(w).alias("lag_2"),
        F.lag("value", 1).over(w).alias("lag_1"),
        F.lead("value", 1).over(w).alias("lead_1"),
        F.lead("value", 2).over(w).alias("lead_2"),
    )
    return out.filter(F.col("lag_2").isNotNull() & F.col("lead_2").isNotNull())


@register(
    "ts_sliding_features_arrays",
    oracle="""
    SELECT event_id, user_id,
           array_to_string(list_transform(feats, x -> printf('%.9f', x)), ',') AS features_csv,
           array_to_string(list_transform(targs, x -> printf('%.9f', x)), ',') AS targets_csv
    FROM (
        SELECT event_id, user_id,
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS feats,
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND 5 FOLLOWING) AS targs
        FROM events
    ) t WHERE len(feats) = 10 AND len(targs) = 5
    """,
    tags=("timeseries", "W1"),
)
def q_sliding_features_arrays(spark, sf_dir):
    """W1 (array form): collect_list windows exactly shaped like the
    reference's X[n,10,1] / y[n,5] tensors (``lvmh_forecaster2.py:83-88``).

    The registered query serializes each window to a fixed-format CSV string
    (``%.9f`` per element) so the driver's hash canonicalizer — which cannot
    hash list-valued cells — gets deterministic scalar columns; the array API
    (``sliding_features``) itself still returns ``array<double>``.
    """
    ev = load_table(spark, sf_dir, "events")
    fmt = lambda c: F.array_join(F.transform(c, lambda x: F.format_string("%.9f", x)), ",")
    return sliding_features(ev, lookback=10, horizon=5).select(
        "event_id",
        "user_id",
        fmt("features").alias("features_csv"),
        fmt("targets").alias("targets_csv"),
    )


@register(
    "ts_tail_window",
    oracle="""
    SELECT event_id, user_id, value FROM (
        SELECT event_id, user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) t WHERE rn <= 10
    """,
    tags=("timeseries", "W2"),
)
def q_tail_window(spark, sf_dir):
    """W2: last-10 rows per key (model inference input window)."""
    ev = load_table(spark, sf_dir, "events")
    return tail_window(ev, 10).select("event_id", "user_id", "value")


@register(
    "ts_downsample",
    oracle="""
    SELECT event_id, user_id FROM (
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
    ) t WHERE (rn - 1) % 7 = 0 OR rn = n
    """,
    tags=("timeseries", "W4"),
)
def q_downsample(spark, sf_dir):
    """W4: every 7th tick per key plus the last."""
    ev = load_table(spark, sf_dir, "events")
    return downsample(ev, 7).select("event_id", "user_id")


@register(
    "ts_rmse",
    oracle="""
    SELECT user_id, round(sqrt(avg((a - b) * (a - b))), 6) AS rmse FROM (
        SELECT user_id, value AS a,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
        FROM events
    ) t WHERE a IS NOT NULL AND b IS NOT NULL
    GROUP BY user_id
    """,
    tags=("timeseries", "A1"),
)
def q_rmse(spark, sf_dir):
    """A1: RMSE between each value and its predecessor (persistence
    forecast), grouped per key — the reference's forecast-vs-actual metric
    with lag(value) standing in for the forecast column."""
    ev = load_table(spark, sf_dir, "events")
    w = _key_window("user_id", "ts", "event_id")
    paired = ev.select("user_id", F.col("value").alias("a"), F.lag("value").over(w).alias("b"))
    out = rmse(paired, "a", "b", group=["user_id"])
    return out.select("user_id", F.round("rmse", 6).alias("rmse"))


@register(
    "ts_minmax_scale",
    oracle="""
    SELECT event_id, user_id,
           round(CASE WHEN mx = mn THEN 0.0 ELSE (value - mn) / (mx - mn) END, 9) AS scaled
    FROM (
        SELECT event_id, user_id, value,
               min(value) OVER (PARTITION BY user_id) AS mn,
               max(value) OVER (PARTITION BY user_id) AS mx
        FROM events
    ) t
    """,
    tags=("timeseries", "A5"),
)
def q_minmax_scale(spark, sf_dir):
    """A5: per-key MinMax [0,1] scaling, full-history fit (leakage-faithful
    mode of ``lvmh_forecaster2.py:79-80``)."""
    ev = load_table(spark, sf_dir, "events")
    out = minmax_scale(ev, key="user_id")
    return out.select("event_id", "user_id", F.round("scaled", 9).alias("scaled"))


@register(
    "ts_tumbling_agg",
    oracle="""
    SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(value), 6) AS avg_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events
    GROUP BY user_id, date_trunc('hour', ts)
    """,
    tags=("timeseries", "streaming-shaped"),
)
def q_tumbling_agg(spark, sf_dir):
    """Tumbling 1-hour window aggregate per key — batch twin of the
    Structured Streaming windowed agg replacing the reference's 1 s
    micro-batch drain (S4, ``lvmh_forecaster2.py:313-336``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "n_events",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


@register(
    "ts_running_extrema",
    oracle="""
    SELECT user_id,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           round(avg(value), 6) AS avg_value
    FROM events GROUP BY user_id
    """,
    tags=("timeseries", "A2", "A3"),
)
def q_running_extrema(spark, sf_dir):
    """A2/A3: per-key min/max/mean (the reference's axis-limit and
    plot-title aggregates, ``lvmh_forecaster2.py:242-273``)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


@register(
    "ts_timestamp_arithmetic",
    oracle="""
    SELECT e.event_id, CAST(s.step AS INTEGER) AS step,
           strftime(date_trunc('microseconds', e.ts) + s.step * INTERVAL 1 MINUTE,
                    '%Y-%m-%d %H:%M:%S.%f') AS target_ts,
           CAST(date_diff('second', date_trunc('microseconds', e.ts),
                date_trunc('microseconds', e.ts) + s.step * INTERVAL 1 MINUTE) AS BIGINT)
               AS horizon_seconds
    FROM events e CROSS JOIN (SELECT unnest([1, 2, 3]) AS step) s
    """,
    tags=("timeseries", "P10"),
)
def q_timestamp_arithmetic(spark, sf_dir):
    """P10: synthetic future event-times — the reference stamps each
    forecast ``now + i minutes`` (``lvmh_forecaster2.py:162,181``); here the
    horizon fan-out is an explode + interval arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("step"))
        .select(
            "event_id",
            "step",
            F.date_format(
                F.expr("timestampadd(MINUTE, step, ts)"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("target_ts"),
            F.expr("timestampdiff(SECOND, ts, timestampadd(MINUTE, step, ts))")
            .cast("long")
            .alias("horizon_seconds"),
        )
    )


@register(
    "ts_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM events
    """,
    tags=("timeseries", "gapfill", "forward-fill"),
)
def q_ts_forward_fill(spark, sf_dir):
    """Forward fill (LOCF): error events' values are treated as missing and
    carried forward from the last good observation per key — last(...)
    IGNORE NULLS over the cumulative frame, the same primitive the as-of
    join builds on. One shuffle + sort per key; leading missings stay NULL."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    good = F.when(F.col("event_type") != "error", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(good, ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "ts_anomaly_zscore",
    oracle="""
    WITH r AS (
        SELECT event_id, user_id, value,
               avg(value) OVER w AS m,
               stddev_samp(value) OVER w AS sd,
               count(*) OVER w AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, value,
           round((value - m) / sd, 6) AS zscore
    FROM r
    WHERE n >= 10 AND sd > 1e-12 AND abs((value - m) / sd) > 2.5
    """,
    tags=("timeseries", "anomaly", "rolling"),
)
def q_ts_anomaly_zscore(spark, sf_dir):
    """Rolling z-score anomaly detection per key: each value scored against
    the mean/stddev of its own trailing 20 observations (frame ends at the
    PREVIOUS row so the point under test never contaminates its baseline);
    flag |z| > 2.5 with a 10-observation warm-up. One per-key sort, no
    second pass."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-20, -1)
    r = ev.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w).alias("m"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("*").over(w).alias("n"),
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        r.filter((F.col("n") >= 10) & (F.col("sd") > 1e-12) & (F.abs(z) > 2.5))
        .select("event_id", "user_id", "value", F.round(z, 6).alias("zscore"))
    )


@register(
    "ts_winsorize",
    oracle="""
    WITH q AS (
        SELECT user_id,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.value,
           round(least(greatest(e.value, q.lo), q.hi), 6) AS winsorized,
           CASE WHEN e.value < q.lo OR e.value > q.hi THEN 1 ELSE 0 END AS clipped
    FROM events e JOIN q ON e.user_id = q.user_id
    """,
    tags=("timeseries", "winsorize", "quality"),
)
def q_ts_winsorize(spark, sf_dir):
    """Per-key winsorization: clip values to the key's own [p5, p95] band —
    the outlier-capping pass a training-data pipeline runs before
    normalization. The per-key quantile table is |keys|-sized and
    broadcasts; clipping is a codegen'd least/greatest."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("user_id").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    return (
        ev.join(F.broadcast(q), "user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 6).alias(
                "winsorized"
            ),
            F.when((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1)
            .otherwise(0)
            .alias("clipped"),
        )
    )


@register(
    "ts_cusum_drift",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS vi
        FROM events
    ), st AS (
        SELECT user_id, CAST(sum(vi) AS BIGINT) AS sv, count(*) AS n
        FROM c GROUP BY user_id
    ), keyed AS (
        SELECT c.user_id, c.event_id, c.ts,
               c.vi - ((2 * st.sv + st.n) // (2 * st.n)) AS d
        FROM c JOIN st USING (user_id)
    ), pre AS (
        SELECT user_id, event_id, ts,
               CAST(sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
        FROM keyed
    )
    SELECT user_id, event_id,
           (p - least(0, CAST(min(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))) / 100.0
               AS cusum_pos
    FROM pre
    """,
    tags=("timeseries", "cusum", "changepoint"),
)
def q_ts_cusum_drift(spark, sf_dir):
    """One-sided CUSUM drift statistic per key: S_t = max(0, S_{t-1} +
    (x_t - μ_key)) — the classic upward-changepoint detector, with μ the
    key's mean rounded to cents.

    Scale shape: the recursion has an exact closed form — S_t = P_t −
    min(0, min_{j≤t} P_j) with P the running sum of deviations — so the
    whole statistic is a running sum plus a running min over the SAME
    per-key ordering: two Window nodes sharing one hash partitioning, O(1)
    window state per row.  (The previous fold over a ``collect_list``
    prefix carried an i-element array on row i — O(n²) per key, an OOM
    hazard on long keys.)

    Cross-engine exactness: ``value`` is 2-decimal, so everything runs in
    integer cents — vi = round(100·value), μ_cents = ⌊(2·Σvi + n)/(2n)⌋
    (half-up), deviations/prefix sums/mins all integers — making every
    intermediate bit-identical between Spark and DuckDB regardless of
    summation order; only the final /100.0 returns to double (an identical
    IEEE division on both sides)."""
    ev = load_table(spark, sf_dir, "events")
    evc = ev.withColumn("vi", F.round(F.col("value") * 100).cast("long"))
    st = evc.groupBy("user_id").agg(F.sum("vi").alias("sv"), F.count("*").alias("n"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keyed = (
        evc.join(F.broadcast(st), "user_id")
        .withColumn("d", F.col("vi") - F.expr("(2 * sv + n) div (2 * n)"))
        .withColumn("p", F.sum("d").over(w))
        .withColumn("mn", F.min("p").over(w))
    )
    s_cents = F.col("p") - F.least(F.lit(0).cast("long"), F.col("mn"))
    return keyed.select(
        "user_id",
        "event_id",
        (s_cents / 100.0).alias("cusum_pos"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: consecutive-run detection
# ---------------------------------------------------------------------------


def gaps_islands(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    mark: str = "event_type",
) -> DataFrame:
    """Group consecutive rows with the same ``mark`` value into islands.

    The generalization of the reference's consecutive-change logic
    (``asyncio scraping.py:80-83``) from "drop repeats" to "summarize each
    run": per key, ordered by (ts, tiebreak), a new island starts whenever
    ``mark`` differs from the previous row's value.

    Implementation is a change flag (``lag``) + running sum — both windows
    share ONE hash partitioning on ``key``, so the whole derivation costs a
    single shuffle; the island id is then available for any downstream
    grouped aggregation. (The textbook row_number-difference trick needs two
    different window partitionings and therefore two shuffles.)
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    prev = F.lag(mark).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(mark)), F.lit(1)).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("island_id", F.sum(chg).over(run))


@register(
    "ts_gaps_islands",
    oracle="""
    SELECT user_id, event_type, CAST(island_id AS BIGINT) AS island_id,
           CAST(min(event_id) AS BIGINT) AS start_event_id,
           CAST(max(event_id) AS BIGINT) AS end_event_id,
           CAST(count(*) AS BIGINT) AS run_len,
           round(avg(value), 9) AS avg_value
    FROM (
        SELECT user_id, event_type, event_id, value,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island_id
        FROM (
            SELECT user_id, event_type, event_id, value, ts,
                   CASE WHEN lag(event_type) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                        IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
            FROM events
        ) flagged
    ) islands
    GROUP BY user_id, event_type, island_id
    """,
    tags=("timeseries", "gaps-islands", "P2"),
)
def q_gaps_islands(spark, sf_dir):
    """Gaps-and-islands: summarize each run of consecutive same-type events
    per user (start/end arrival sequence, length, mean value). One shuffle
    for both windows + the grouped agg reuses the same key prefix."""
    ev = load_table(spark, sf_dir, "events")
    runs = gaps_islands(ev)
    return runs.groupBy("user_id", "event_type", "island_id").agg(
        F.min("event_id").alias("start_event_id"),
        F.max("event_id").alias("end_event_id"),
        F.count(F.lit(1)).alias("run_len"),
        F.round(F.avg("value"), 9).alias("avg_value"),
    )


def seasonal_decompose(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    season: Column | None = None,
) -> DataFrame:
    """Additive seasonal decomposition against an hour-of-day profile:
    ``value = key_mean + seasonal(key, hour) + residual``, where seasonal
    is the per-(key, hour) mean deviation from the key mean — the
    classical seasonal-means decomposition (period = 24h) that a
    monitoring pipeline runs before anomaly scoring, so residuals can be
    thresholded free of the daily cycle.

    Shape: two partitioned window averages — ``(key)`` and ``(key,
    season)`` — both parallel across keys, no global window, no extra
    shuffle beyond the two hash exchanges (the second reuses the first's
    key prefix under AQE).
    """
    season = season if season is not None else F.hour(F.col(ts))
    wk = Window.partitionBy(key)
    ws = Window.partitionBy(key, "season_idx")
    base = df.withColumn("season_idx", season.cast("int"))
    # Means from EXACT decimal sums, divided once: double summation order
    # differs between engines (and between partitionings of the same
    # engine), which lands round-6 values on half-up boundaries; a
    # decimal(18,6) sum is associative, so both engines derive the
    # bit-identical double mean.
    dec = F.col(value).cast("decimal(18,6)")
    key_mean = F.sum(dec).over(wk).cast("double") / F.count(value).over(wk)
    season_mean = F.sum(dec).over(ws).cast("double") / F.count(value).over(ws)

    # Half-up canonicalization floor(x*1e6 + 0.5)/1e6 instead of round():
    # means of decimal sums frequently terminate ON the 6th-digit half
    # boundary (S/n with even n), where Spark's and DuckDB's round()
    # disagree within ULPs; floor/mul/add are bit-identical IEEE ops (see
    # rolling.py ewma for the precedent).
    def canon(c):
        return F.floor(c * 1000000 + 0.5) / 1000000

    return base.select(
        F.col(key),
        F.col("season_idx"),
        F.col(value),
        canon(key_mean).alias("key_mean"),
        canon(season_mean - key_mean).alias("seasonal"),
        canon(F.col(value) - season_mean).alias("residual"),
    )


@register(
    "ts_seasonal_decompose",
    oracle="""
    WITH base AS (
        SELECT user_id, CAST(hour(ts) AS INTEGER) AS season_idx, value, event_id,
               CAST(value AS DECIMAL(18,6)) AS dv
        FROM events
    ), m AS (
        SELECT user_id, season_idx, value,
               CAST(sum(dv) OVER (PARTITION BY user_id) AS DOUBLE)
                   / count(value) OVER (PARTITION BY user_id) AS km,
               CAST(sum(dv) OVER (PARTITION BY user_id, season_idx) AS DOUBLE)
                   / count(value) OVER (PARTITION BY user_id, season_idx) AS sm
        FROM base
    )
    SELECT user_id, season_idx, value,
           floor(km * 1000000 + 0.5) / 1000000 AS key_mean,
           floor((sm - km) * 1000000 + 0.5) / 1000000 AS seasonal,
           floor((value - sm) * 1000000 + 0.5) / 1000000 AS residual
    FROM m
    """,
    tags=("timeseries", "seasonal", "decompose"),
)
def q_ts_seasonal_decompose(spark, sf_dir):
    """Hour-of-day additive seasonal decomposition per user."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    return seasonal_decompose(ev)


@register(
    "ts_seasonal_strength",
    oracle="""
    WITH base AS (
        SELECT user_id, CAST(hour(ts) AS INTEGER) AS season_idx, value,
               CAST(value AS DECIMAL(18,6)) AS dv
        FROM events
    ), m AS (
        SELECT user_id, value,
               CAST(sum(dv) OVER (PARTITION BY user_id) AS DOUBLE)
                   / count(value) OVER (PARTITION BY user_id) AS km,
               CAST(sum(dv) OVER (PARTITION BY user_id, season_idx) AS DOUBLE)
                   / count(value) OVER (PARTITION BY user_id, season_idx) AS sm
        FROM base
    ), a AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               var_samp(value - km) AS vd, var_samp(value - sm) AS vr
        FROM m GROUP BY user_id
    )
    SELECT user_id, n,
           floor(vd * 1000 + 0.5) / 1000 AS var_detrended,
           floor(vr * 1000 + 0.5) / 1000 AS var_residual,
           floor(greatest(0, 1 - vr / vd) * 1000000 + 0.5) / 1000000
               AS seasonal_strength
    FROM a WHERE vd > 0
    """,
    tags=("timeseries", "seasonal", "diagnostic"),
)
def q_ts_seasonal_strength(spark, sf_dir):
    """Seasonal strength F_S = max(0, 1 − Var(R)/Var(S+R)) (Hyndman's
    STL-feature definition) per key, over the SAME hour-of-day additive
    decomposition as `ts_seasonal_decompose`: detrended = value − key
    mean, residual = value − hour-of-day mean. F_S near 1 = the hourly
    profile explains the variance (a seasonal model is worth fitting),
    near 0 = no usable within-day cycle — the one-number triage that
    decides whether `ts_holt_winters` gets a season term. Means ride the
    DECIMAL(18,6) sums (cross-engine exact — the decompose convention);
    the variance ratio is 1e-6-floor-canonicalized. One per-key window
    pass + one grouped aggregate — the two windows and the aggregate all
    hash on user_id."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.hour("ts").cast("int").alias("season_idx"), "value"
    )
    w_u = Window.partitionBy("user_id")
    w_us = Window.partitionBy("user_id", "season_idx")
    dv = F.col("value").cast("decimal(18,6)")
    m = ev.select(
        "user_id",
        "value",
        (F.sum(dv).over(w_u).cast("double") / F.count("value").over(w_u)).alias("km"),
        (F.sum(dv).over(w_us).cast("double") / F.count("value").over(w_us)).alias("sm"),
    )
    a = m.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.var_samp(F.col("value") - F.col("km")).alias("vd"),
        F.var_samp(F.col("value") - F.col("sm")).alias("vr"),
    )
    fs = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("vr") / F.col("vd"))
    # floor canon at 1e-3 for the raw variances (values O(10^3): Welford
    # merge-order skew reaches the 6th decimal; the ratio stays 1e-6-safe)
    canon3 = lambda c: F.floor(c * 1000 + F.lit(0.5)) / 1000  # noqa: E731
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return a.filter(F.col("vd") > 0).select(
        "user_id",
        "n",
        canon3(F.col("vd")).alias("var_detrended"),
        canon3(F.col("vr")).alias("var_residual"),
        canon(fs).alias("seasonal_strength"),
    )


@register(
    "ts_changepoint_cusum_segments",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS vi
        FROM events
    ), st AS (
        SELECT user_id, CAST(sum(vi) AS BIGINT) AS sv, count(*) AS n
        FROM c GROUP BY user_id
    ), keyed AS (
        SELECT c.user_id, c.event_id, c.ts, c.vi,
               c.vi - ((2 * st.sv + st.n) // (2 * st.n)) AS d
        FROM c JOIN st USING (user_id)
    ), psum AS (
        SELECT user_id, event_id, ts, vi,
               CAST(sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
        FROM keyed
    ), pre AS (
        SELECT user_id, event_id, ts, vi,
               p - least(0, CAST(min(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)) AS s
        FROM psum
    ), flagged AS (
        SELECT user_id, event_id, ts, vi, s,
               CASE WHEN s >= 500 AND
                         coalesce(lag(s) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) < 500
                    THEN 1 ELSE 0 END AS crossing
        FROM pre
    ), seg AS (
        SELECT user_id, event_id, ts, vi, s,
               CAST(sum(crossing) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
        FROM flagged
    )
    SELECT user_id, segment_id,
           CAST(count(*) AS BIGINT) AS n_ticks,
           min(event_id) AS start_event,
           max(event_id) AS end_event,
           floor(CAST(sum(vi) AS BIGINT) / (100.0 * count(*)) * 1000000 + 0.5) / 1000000 AS seg_avg,
           max(s) / 100.0 AS seg_max_cusum
    FROM seg
    GROUP BY user_id, segment_id
    """,
    tags=("timeseries", "cusum", "changepoint", "segments"),
)
def q_ts_changepoint_segments(spark, sf_dir):
    """CUSUM changepoint segmentation per key: the drift statistic S_t (the
    exact integer-cents closed form of ``ts_cusum_drift``: running sum of
    deviations minus its running min) crosses the alarm threshold h=5.00
    from below → a segment boundary; segment id = crossings so far; one
    grouped aggregate emits per-segment extent and stats. Everything stays
    in integer cents until the two final divisions, so the whole pipeline
    — statistic, crossings, segment ids, sums — is bit-identical across
    engines regardless of summation order. Scale shape: the same single
    per-key hash partition serves all four window functions AND (via
    partial aggregation) the segment rollup — one exchange total."""
    ev = load_table(spark, sf_dir, "events")
    evc = ev.withColumn("vi", F.round(F.col("value") * 100).cast("long"))
    st = evc.groupBy("user_id").agg(F.sum("vi").alias("sv"), F.count("*").alias("n"))
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed = (
        evc.join(F.broadcast(st), "user_id")
        .withColumn("d", F.col("vi") - F.expr("(2 * sv + n) div (2 * n)"))
        .withColumn("p", F.sum("d").over(w))
        .withColumn("mn", F.min("p").over(w))
        .withColumn("s", F.col("p") - F.least(F.lit(0).cast("long"), F.col("mn")))
    )
    flagged = keyed.withColumn(
        "crossing",
        F.when(
            (F.col("s") >= 500) & (F.coalesce(F.lag("s").over(wo), F.lit(0)) < 500), 1
        ).otherwise(0),
    ).withColumn("segment_id", F.sum("crossing").over(w).cast("long"))
    return flagged.groupBy("user_id", "segment_id").agg(
        F.count("*").cast("long").alias("n_ticks"),
        F.min("event_id").alias("start_event"),
        F.max("event_id").alias("end_event"),
        (F.floor(F.sum("vi").cast("long") / (100.0 * F.count("*")) * 1000000 + 0.5) / 1000000).alias("seg_avg"),
        (F.max("s") / 100.0).alias("seg_max_cusum"),
    )


@register(
    "ts_acf",
    oracle="""
    WITH l AS (
        SELECT user_id, value,
               lag(value, 1) OVER w AS v1,
               lag(value, 2) OVER w AS v2,
               lag(value, 3) OVER w AS v3,
               lag(value, 4) OVER w AS v4,
               lag(value, 5) OVER w AS v5
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(1 AS INT) AS lag, round(corr(value, v1), 6) AS acf
    FROM l GROUP BY user_id
    UNION ALL
    SELECT user_id, CAST(2 AS INT) AS lag, round(corr(value, v2), 6) AS acf
    FROM l GROUP BY user_id
    UNION ALL
    SELECT user_id, CAST(3 AS INT) AS lag, round(corr(value, v3), 6) AS acf
    FROM l GROUP BY user_id
    UNION ALL
    SELECT user_id, CAST(4 AS INT) AS lag, round(corr(value, v4), 6) AS acf
    FROM l GROUP BY user_id
    UNION ALL
    SELECT user_id, CAST(5 AS INT) AS lag, round(corr(value, v5), 6) AS acf
    FROM l GROUP BY user_id
    """,
    tags=("timeseries", "acf", "stats"),
)
def q_ts_acf(spark, sf_dir):
    """Per-key autocorrelation function at lags 1..5 (lag-pair Pearson
    corr) — the seasonality/AR-order diagnostic that decides the
    forecaster's window length (the reference hard-codes sequence_length=10,
    ``lvmh_forecaster2.py:30``; ACF is how you'd choose it from data).
    One window pass computes all five lag columns (single per-key sort),
    one grouped aggregation computes all five corrs; the lag→row unpivot
    happens on the 5-column aggregate (150 rows), not the tick stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "value",
        *[F.lag("value", k).over(w).alias(f"v{k}") for k in range(1, 6)],
    )
    agg = lagged.groupBy("user_id").agg(
        *[F.round(F.corr("value", f"v{k}"), 6).alias(f"acf{k}") for k in range(1, 6)]
    )
    return agg.select(
        "user_id",
        F.expr(
            "stack(5, 1, acf1, 2, acf2, 3, acf3, 4, acf4, 5, acf5) AS (lag, acf)"
        ),
    ).select("user_id", F.col("lag").cast("int").alias("lag"), "acf")


@register(
    "ts_sax_words",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS vi
        FROM events
    ), seg AS (
        SELECT user_id, vi,
               ntile(8) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seg
        FROM c
    ), paa AS (
        SELECT user_id, seg,
               CAST(sum(vi) AS BIGINT) / (100.0 * count(*)) AS paa
        FROM seg GROUP BY user_id, seg
    ), st AS (
        SELECT user_id,
               CAST(sum(vi) AS BIGINT) / (100.0 * count(*)) AS mu,
               sqrt((CAST(sum(vi * vi) AS BIGINT) / 10000.0) / count(*)
                    - (CAST(sum(vi) AS BIGINT) / (100.0 * count(*)))
                      * (CAST(sum(vi) AS BIGINT) / (100.0 * count(*)))) AS sd
        FROM seg GROUP BY user_id
    ), sym AS (
        SELECT p.user_id, p.seg,
               CASE WHEN (p.paa - s.mu) / s.sd < -0.6745 THEN 'a'
                    WHEN (p.paa - s.mu) / s.sd < 0 THEN 'b'
                    WHEN (p.paa - s.mu) / s.sd < 0.6745 THEN 'c'
                    ELSE 'd' END AS sym,
               s.sd AS sd
        FROM paa p JOIN st s USING (user_id)
    )
    SELECT user_id,
           string_agg(sym, '' ORDER BY seg) AS sax_word,
           round(min(sd), 6) AS value_sd
    FROM sym GROUP BY user_id
    """,
    tags=("timeseries", "sax", "symbolic"),
)
def q_ts_sax_words(spark, sf_dir):
    """SAX symbolization (the classic symbolic time-series representation):
    split each key's ordered series into 8 equal-count segments (ntile),
    PAA = per-segment mean, z-normalize against the key's own mean/std,
    discretize by the 4-letter Gaussian breakpoints (±0.6745, 0) and
    concatenate into the key's 8-character SAX word — the index key for
    motif discovery / whole-series similarity at 100 TB (words are tiny,
    join-able, and distance lower-bounds Euclidean). Every mean/variance
    comes from exact integer-cent sums, so the z-scores, letters and words
    are bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "user_id", "ts", "event_id", F.round(F.col("value") * 100).cast("long").alias("vi")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = c.select("user_id", "vi", F.ntile(8).over(w).alias("seg"))
    paa = seg.groupBy("user_id", "seg").agg(
        (F.sum("vi").cast("long") / (100.0 * F.count("*"))).alias("paa")
    )
    mu = F.sum("vi").cast("long") / (100.0 * F.count("*"))
    st = seg.groupBy("user_id").agg(
        mu.alias("mu"),
        F.sqrt(
            (F.sum(F.col("vi") * F.col("vi")).cast("long") / 10000.0) / F.count("*")
            - mu * mu
        ).alias("sd"),
    )
    z = (F.col("paa") - F.col("mu")) / F.col("sd")
    sym = (
        paa.join(st, "user_id")
        .select(
            "user_id",
            "seg",
            F.when(z < -0.6745, "a")
            .when(z < 0, "b")
            .when(z < 0.6745, "c")
            .otherwise("d")
            .alias("sym"),
            "sd",
        )
    )
    return sym.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                lambda s: s.getField("sym"),
            ),
        ).alias("sax_word"),
        F.round(F.min("sd"), 6).alias("value_sd"),
    )


# ---------------------------------------------------------------------------
# LTTB downsampling (the industry-standard upgrade of W4)
# ---------------------------------------------------------------------------


def lttb_downsample(
    df: DataFrame,
    k: int = 10,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per key: keep first and
    last points; split the interior into ``k-2`` equal-count buckets; in
    each bucket keep the point maximizing the triangle area with the
    PREVIOUSLY SELECTED point and the next bucket's centroid — the
    shape-preserving visualization downsampler (vs the reference's
    every-n-th thinning, ``lvmh_forecaster2.py:250-252``).

    Selection is sequential (each pick depends on the previous), so it is
    a per-key ``applyInPandas``; the area comparison runs in EXACT integer
    arithmetic — x in key-relative epoch seconds, y in cents, and the
    centroid division cleared by multiplying through by the next bucket's
    count: A ∝ |(m·x_p − Sx)(y_c − y_p) − (x_p − x_c)(Sy − m·y_p)|.
    Magnitude bound ≲ 2·10^15 at sf0.1 — BIGINT-safe; ties break to the
    smallest ``tiebreak`` id. Keys with ≤ k points pass through whole.
    """
    prep = df.select(
        F.col(key),
        F.col(tiebreak),
        F.col(ts),
        F.col(value),
        F.expr(f"unix_micros({ts}) div 1000000").alias("_xs"),
        F.round(F.col(value) * 100).cast("long").alias("_y"),
    )
    out_schema = prep.select(key, tiebreak, value).schema

    def fn(pdf):
        pdf = pdf.sort_values([ts, tiebreak], ignore_index=True)
        n = len(pdf)
        if n <= k:
            return pdf[[key, tiebreak, value]]
        x0 = int(pdf["_xs"].min())
        xs = [int(v) - x0 for v in pdf["_xs"]]
        ys = [int(v) for v in pdf["_y"]]
        eids = [int(v) for v in pdf[tiebreak]]
        inner = k - 2
        # bucket index per interior row i (0-based rn = i): b = 1 + ((i-1)*inner)//(n-2)
        buckets: list[list[int]] = [[] for _ in range(k)]
        buckets[0] = [0]
        buckets[k - 1] = [n - 1]
        for i in range(1, n - 1):
            buckets[1 + ((i - 1) * inner) // (n - 2)].append(i)
        sums = [
            (sum(xs[i] for i in b), sum(ys[i] for i in b), len(b)) for b in buckets
        ]
        picked = [0]
        prev = 0
        for b in range(1, k - 1):
            sx, sy, m = sums[b + 1]
            xp, yp = xs[prev], ys[prev]
            best, best_area, best_eid = None, -1, None
            for i in buckets[b]:
                area = abs((m * xp - sx) * (ys[i] - yp) - (xp - xs[i]) * (sy - m * yp))
                if area > best_area or (area == best_area and eids[i] < best_eid):
                    best, best_area, best_eid = i, area, eids[i]
            picked.append(best)
            prev = best
        picked.append(n - 1)
        return pdf.iloc[picked][[key, tiebreak, value]]

    return prep.groupBy(key).applyInPandas(fn, schema=out_schema)


__all__.append("lttb_downsample")


@register(
    "ts_lttb_downsample",
    oracle="""
    WITH RECURSIVE pts0 AS (
        SELECT user_id, event_id, value,
               CAST(round(value * 100) AS BIGINT) AS y,
               epoch_us(ts) // 1000000 AS xs,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
    ), small AS (
        SELECT user_id, event_id, value FROM pts0 WHERE n <= 10
    ), bk AS (
        SELECT user_id, event_id, value, y, rn, n,
               xs - min(xs) OVER (PARTITION BY user_id) AS x,
               CASE WHEN rn = 1 THEN 0
                    WHEN rn = n THEN 9
                    ELSE 1 + ((rn - 2) * 8) // (n - 2) END AS b
        FROM pts0 WHERE n > 10
    ), nsum AS (
        SELECT user_id, b,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(count(*) AS BIGINT) AS m
        FROM bk GROUP BY user_id, b
    ), sel(user_id, b, event_id, value, x, y) AS (
        SELECT user_id, 0, event_id, value, x, y FROM bk WHERE b = 0
        UNION ALL
        SELECT s.user_id, s.b + 1,
               max_by(c.event_id, lpad(CAST(abs((ns.m * s.x - ns.sx) * (c.y - s.y)
                       - (s.x - c.x) * (ns.sy - ns.m * s.y)) AS VARCHAR), 20, '0')
                   || lpad(CAST(9999999999 - c.event_id AS VARCHAR), 10, '0')),
               max_by(c.value, lpad(CAST(abs((ns.m * s.x - ns.sx) * (c.y - s.y)
                       - (s.x - c.x) * (ns.sy - ns.m * s.y)) AS VARCHAR), 20, '0')
                   || lpad(CAST(9999999999 - c.event_id AS VARCHAR), 10, '0')),
               max_by(c.x, lpad(CAST(abs((ns.m * s.x - ns.sx) * (c.y - s.y)
                       - (s.x - c.x) * (ns.sy - ns.m * s.y)) AS VARCHAR), 20, '0')
                   || lpad(CAST(9999999999 - c.event_id AS VARCHAR), 10, '0')),
               max_by(c.y, lpad(CAST(abs((ns.m * s.x - ns.sx) * (c.y - s.y)
                       - (s.x - c.x) * (ns.sy - ns.m * s.y)) AS VARCHAR), 20, '0')
                   || lpad(CAST(9999999999 - c.event_id AS VARCHAR), 10, '0'))
        FROM sel s
        JOIN bk c ON c.user_id = s.user_id AND c.b = s.b + 1
        JOIN nsum ns ON ns.user_id = s.user_id AND ns.b = s.b + 2
        WHERE s.b < 8
        GROUP BY s.user_id, s.b
    )
    SELECT user_id, event_id, value FROM sel
    UNION ALL
    SELECT user_id, event_id, value FROM bk WHERE b = 9
    UNION ALL
    SELECT user_id, event_id, value FROM small
    """,
    tags=("timeseries", "downsample", "lttb"),
)
def q_ts_lttb_downsample(spark, sf_dir):
    """LTTB shape-preserving downsample to 10 points per key. The oracle
    replays the full sequential selection via a recursive CTE threading
    the previously-selected point per key, with the argmax expressed as
    max_by over a zero-padded integer sort key (area desc, event_id asc)
    — exact integer arithmetic end to end, so the selected point SET is
    bit-identical across engines. Domain bound: event_id < 10^10 (same
    contract as the tick-bar sort key) and |area| < 10^20."""
    ev = load_table(spark, sf_dir, "events")
    return lttb_downsample(ev, k=10)


# ---------------------------------------------------------------------------
# Dynamic time warping distance between key pairs
# ---------------------------------------------------------------------------

_DTW_LEN = 24  # per-series length cap (first N ticks per key)
_DTW_INF = 10**15  # boundary sentinel: >> any reachable path cost, no overflow


def dtw_pair_distances(
    df: DataFrame,
    pairs: list[tuple[int, int]],
    max_len: int = _DTW_LEN,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Exact dynamic-time-warping distance (|Δ| cost, no band) between the
    first ``max_len`` ticks of each key pair — the classic elastic
    whole-series similarity measure Spark has no operator for. Costs run
    in integer cents, so the full DP is integer-exact.

    Scale shape: each key reduces to ONE array row (ordered collect), the
    pair table is a broadcast join of those rows, and each pair's O(n²)
    DP runs vectorized-Python-side over its single row — work per pair is
    bounded by ``max_len²``, and pairs parallelize across the cluster.
    (A banded/windowed variant bounds it further; the cap is the
    documented contract here.)"""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    users = sorted({u for p in pairs for u in p})
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    series = (
        df.filter(F.col(key).isin(users))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_len)
        .groupBy(key)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("_rn").alias("rn"),
                            F.round(F.col(value) * 100).cast("long").alias("y"),
                        )
                    )
                ),
                lambda s: s.getField("y"),
            ).alias("ys")
        )
    )
    pairs_df = series.sparkSession.createDataFrame(
        [(a, b) for a, b in pairs], f"user_a long, user_b long"
    )
    joined = (
        pairs_df.join(
            F.broadcast(series.select(F.col(key).alias("user_a"), F.col("ys").alias("ya"))),
            "user_a",
        )
        .join(
            F.broadcast(series.select(F.col(key).alias("user_b"), F.col("ys").alias("yb"))),
            "user_b",
        )
    )
    out_schema = StructType(
        [
            StructField("user_a", LongType()),
            StructField("user_b", LongType()),
            StructField("dtw_distance", DoubleType()),
        ]
    )

    def fn(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                ya = [int(v) for v in r.ya]
                yb = [int(v) for v in r.yb]
                na, nb = len(ya), len(yb)
                prev = [0] + [_DTW_INF] * nb  # dp row 0
                for i in range(1, na + 1):
                    cur = [_DTW_INF] * (nb + 1)
                    for j in range(1, nb + 1):
                        cost = abs(ya[i - 1] - yb[j - 1])
                        cur[j] = cost + min(prev[j - 1], prev[j], cur[j - 1])
                    prev = cur
                rows.append((int(r.user_a), int(r.user_b), prev[nb] / 100.0))
            import pandas as pd

            yield pd.DataFrame(rows, columns=["user_a", "user_b", "dtw_distance"])

    return joined.mapInPandas(fn, schema=out_schema)


__all__.append("dtw_pair_distances")

_DTW_PAIRS = [(1, 2), (3, 4), (5, 6), (7, 8), (9, 10)]


def _dtw_oracle(pairs=_DTW_PAIRS, max_len=_DTW_LEN, inf=_DTW_INF) -> str:
    """DuckDB twin: the SAME DP replayed cell-by-cell in a recursive CTE.
    State per iteration = the last nb+1 DP values (a rolling list buffer
    in row-major order); cell t maps to (i, j) = (1+(t-1)//nb, 1+(t-1)%nb);
    diag/up/left come from fixed buffer positions with boundary overrides.
    All-integer arithmetic → bit-exact against the Spark-side DP."""
    pair_rows = ", ".join(f"({a}, {b})" for a, b in pairs)
    users = sorted({u for p in pairs for u in p})
    user_list = ", ".join(str(u) for u in users)
    return f"""
    WITH RECURSIVE ranked AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS y,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events WHERE user_id IN ({user_list})
    ), series AS (
        SELECT user_id, list(y ORDER BY rn) AS ys
        FROM ranked WHERE rn <= {max_len} GROUP BY user_id
    ), pair AS (
        SELECT p.user_a, p.user_b, a.ys AS ya, b.ys AS yb,
               len(a.ys) AS na, len(b.ys) AS nb
        FROM (VALUES {pair_rows}) AS p(user_a, user_b)
        JOIN series a ON a.user_id = p.user_a
        JOIN series b ON b.user_id = p.user_b
    ), dp(user_a, user_b, t, buf) AS (
        SELECT user_a, user_b, 0,
               list_prepend(CAST(0 AS BIGINT),
                   [CAST({inf} AS BIGINT) FOR _ IN range(nb)])
        FROM pair
        UNION ALL
        SELECT d.user_a, d.user_b, d.t + 1,
               list_append(d.buf[2:],
                   abs(p.ya[1 + d.t // p.nb] - p.yb[1 + d.t % p.nb]) + least(
                       CASE WHEN d.t % p.nb = 0 AND d.t // p.nb > 0
                            THEN {inf} ELSE d.buf[1] END,
                       d.buf[2],
                       CASE WHEN d.t % p.nb = 0 THEN {inf}
                            ELSE d.buf[p.nb + 1] END))
        FROM dp d JOIN pair p
          ON p.user_a = d.user_a AND p.user_b = d.user_b
        WHERE d.t < p.na * p.nb
    )
    SELECT CAST(d.user_a AS BIGINT) AS user_a,
           CAST(d.user_b AS BIGINT) AS user_b,
           d.buf[p.nb + 1] / 100.0 AS dtw_distance
    FROM dp d JOIN pair p
      ON p.user_a = d.user_a AND p.user_b = d.user_b
    WHERE d.t = p.na * p.nb
    """


@register("ts_dtw_pairs", oracle=_dtw_oracle(), tags=("timeseries", "dtw", "similarity"))
def q_ts_dtw_pairs(spark, sf_dir):
    """DTW distance for five fixed key pairs over each key's first 24
    ticks. The oracle replays the identical integer DP cell-by-cell via a
    recursive CTE carrying a rolling (nb+1)-value buffer — the same
    array-threading trick as the Holt-Winters oracle, extended to a 2-D
    DP. Cell t (1-based) is (i, j) = (1+(t-1)//nb, 1+(t-1)%nb); in the
    recursive step the previous iterate's t is t-1, so the indices appear
    as 1 + t//nb and 1 + t%nb."""
    ev = load_table(spark, sf_dir, "events")
    return dtw_pair_distances(ev, _DTW_PAIRS, max_len=_DTW_LEN)


@register(
    "ts_ljung_box",
    oracle="""
    WITH l AS (
        SELECT user_id, value,
               lag(value, 1) OVER w AS v1, lag(value, 2) OVER w AS v2,
               lag(value, 3) OVER w AS v3, lag(value, 4) OVER w AS v4,
               lag(value, 5) OVER w AS v5
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), a AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               round(corr(value, v1), 9) AS r1, round(corr(value, v2), 9) AS r2,
               round(corr(value, v3), 9) AS r3, round(corr(value, v4), 9) AS r4,
               round(corr(value, v5), 9) AS r5
        FROM l GROUP BY user_id
    )
    SELECT user_id, n,
           floor(n * (n + 2) * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
                 + r3 * r3 / (n - 3) + r4 * r4 / (n - 4) + r5 * r5 / (n - 5))
                 * 1000000 + 0.5) / 1000000 AS q_stat
    FROM a WHERE n > 5
    """,
    tags=("timeseries", "acf", "stats", "diagnostic"),
)
def q_ts_ljung_box(spark, sf_dir):
    """Per-key Ljung-Box portmanteau statistic over lags 1..5 — the "is
    there ANY autocorrelation left" gate run on forecast residuals (a
    white-noise residual stream means the model captured the structure;
    a large Q means refit). Companion to `ts_acf`: same single window
    pass + one grouped aggregation, with the five lag correlations
    (round-9 on both engines before squaring) folded into
    Q = n(n+2)·Σ ρ_k²/(n−k) as one fixed IEEE expression, canon 1e-6."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "value",
        *[F.lag("value", k).over(w).alias(f"v{k}") for k in range(1, 6)],
    )
    a = lagged.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        *[F.round(F.corr("value", f"v{k}"), 9).alias(f"r{k}") for k in range(1, 6)],
    )
    n = F.col("n")
    s = sum(
        (F.col(f"r{k}") * F.col(f"r{k}") / (n - k) for k in range(2, 6)),
        F.col("r1") * F.col("r1") / (n - 1),
    )
    return a.filter(n > 5).select(
        "user_id", "n",
        (F.floor(n * (n + 2) * s * 1000000 + F.lit(0.5)) / 1000000).alias("q_stat"),
    )


@register(
    "ts_periodogram",
    oracle="""
    WITH vi AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), daily AS (
        SELECT day,
               CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / (100.0 * count(*)) AS m
        FROM vi GROUP BY day
    ), idx AS (
        SELECT m, row_number() OVER (ORDER BY day) - 1 AS t,
               CAST(count(*) OVER () AS BIGINT) AS n,
               avg(m) OVER () AS mu
        FROM daily
    ), per AS (SELECT unnest(range(2, 15)) AS p),
    terms AS (
        SELECT p.p, i.n,
               (i.m - i.mu) * cos(2 * pi() * i.t / p.p) AS c,
               (i.m - i.mu) * sin(2 * pi() * i.t / p.p) AS s
        FROM idx i CROSS JOIN per p
    )
    SELECT CAST(p AS BIGINT) AS period, n AS n_days,
           floor((sum(c) * sum(c) + sum(s) * sum(s)) * (2.0 / n)
                 * 1000000 + 0.5) / 1000000 AS power
    FROM terms GROUP BY p, n
    """,
    tags=("timeseries", "seasonality", "spectral"),
)
def q_ts_periodogram(spark, sf_dir):
    """Periodogram of the purchase daily-mean series at candidate periods
    2..14 days — the spectral seasonality detector (a weekly cycle shows
    up as a power spike at period 7) that picks the season length
    `ts_holt_winters` / `ts_seasonal_decompose` then consume.

    One grouped agg collapses ticks to the daily grid; the windowed
    index/mean run over that bounded grid (the acceptable global window);
    the 13-row period relation broadcasts, and each period's DFT power is
    two plain sums of cos/sin-weighted centered values — no FFT machinery
    needed at 13 candidate periods, and every term is the identical IEEE
    expression on both engines (libm cos/sin last-ulp skew absorbed by the
    1e-6 canon)."""
    import math  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    vi = ev.select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    daily = vi.groupBy("day").agg(
        (F.sum("v").cast("long").cast("double") / (F.lit(100.0) * F.count("*"))).alias("m")
    )
    return periodogram_from_daily(daily)


def periodogram_from_daily(daily):
    """Periodogram powers from a (day, m) daily-mean grid — the shared core
    of `ts_periodogram` and the streaming seasonality monitor
    (streaming/seasonality_stream.py): (day, cents-sum, count) grids are
    MERGEABLE, daily means re-derive from merged sums, so the served
    spectrum is bit-identical to the batch query over the same ticks."""
    import math  # noqa: PLC0415

    spark = daily.sparkSession
    w_all = Window.orderBy("day")
    idx = daily.select(
        "m",
        (F.row_number().over(w_all) - 1).alias("t"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
        F.avg("m").over(Window.partitionBy()).alias("mu"),
    )
    per = spark.range(2, 15).select(F.col("id").cast("int").alias("p"))
    tau = F.lit(2 * math.pi)
    terms = idx.crossJoin(F.broadcast(per)).select(
        "p", "n",
        ((F.col("m") - F.col("mu")) * F.cos(tau * F.col("t") / F.col("p"))).alias("c"),
        ((F.col("m") - F.col("mu")) * F.sin(tau * F.col("t") / F.col("p"))).alias("s"),
    )
    pw = (F.sum("c") * F.sum("c") + F.sum("s") * F.sum("s")) * (F.lit(2.0) / F.col("n"))
    return terms.groupBy("p", "n").agg(
        (F.floor(pw * 1000000 + F.lit(0.5)) / 1000000).alias("power")
    ).select(
        F.col("p").cast("long").alias("period"), F.col("n").alias("n_days"), "power"
    )


@register(
    "ts_var_es",
    oracle="""
    WITH vi AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), daily AS (
        SELECT day,
               CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / (100.0 * count(*)) AS m
        FROM vi GROUP BY day
    ), ret AS (
        SELECT day, m / lag(m) OVER (ORDER BY day) - 1 AS r
        FROM daily
    ), ranked AS (
        SELECT day, r,
               row_number() OVER (ORDER BY r, day) AS rnk,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM ret WHERE r IS NOT NULL
    ), cut AS (
        SELECT n, CAST(ceil(0.05 * n) AS BIGINT) AS k FROM ranked LIMIT 1
    )
    SELECT c.n AS n_days, c.k AS tail_n,
           floor(max(CASE WHEN rk.rnk = c.k THEN rk.r END) * 1000000 + 0.5)
               / 1000000 AS var_95,
           floor(avg(CASE WHEN rk.rnk <= c.k THEN rk.r END) * 1000000 + 0.5)
               / 1000000 AS es_95,
           floor(min(rk.r) * 1000000 + 0.5) / 1000000 AS worst_return
    FROM ranked rk CROSS JOIN cut c
    GROUP BY c.n, c.k
    """,
    tags=("timeseries", "risk", "quantile", "finance"),
)
def q_ts_var_es(spark, sf_dir):
    """Historical 95% Value-at-Risk and Expected Shortfall of the purchase
    daily-mean return series — the risk summary a trading pipeline (the
    reference's domain: live-scraped LVMH prices, `asyncio scraping.py`)
    reports next to its forecasts. VaR = the exact nearest-rank 5th
    percentile of daily simple returns; ES = the mean of the tail at or
    below that rank; both from ONE ranking of the bounded daily-return
    grid (deterministic day tie-break), the exact-quantile convention of
    `events_value_quantiles_grid`. Returns derive from exact-cents daily
    means, so both engines rank identical doubles."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    vi = ev.select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    daily = vi.groupBy("day").agg(
        (F.sum("v").cast("long").cast("double") / (F.lit(100.0) * F.count("*"))).alias("m")
    )
    return var_es_from_daily(daily)


def var_es_from_daily(daily):
    """Historical VaR95/ES from a (day, m) daily-mean grid — the shared
    core of `ts_var_es` and the streaming seasonality/risk monitor: the
    per-day (cents-sum, count) grid is mergeable, means re-derive exactly
    from merged sums, so the served risk numbers are bit-identical to the
    batch query over everything ingested."""
    w_day = Window.orderBy("day")
    ret = daily.select(
        "day", (F.col("m") / F.lag("m").over(w_day) - 1).alias("r")
    ).filter(F.col("r").isNotNull())
    ranked = ret.select(
        "day", "r",
        F.row_number().over(Window.orderBy("r", "day")).cast("long").alias("rnk"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    )
    ranked = ranked.withColumn("k", F.ceil(F.lit(0.05) * F.col("n")).cast("long"))
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return ranked.groupBy(F.col("n").alias("n_days"), F.col("k").alias("tail_n")).agg(
        canon(F.max(F.when(F.col("rnk") == F.col("k"), F.col("r")))).alias("var_95"),
        canon(F.avg(F.when(F.col("rnk") <= F.col("k"), F.col("r")))).alias("es_95"),
        canon(F.min("r")).alias("worst_return"),
    )


@register(
    "ts_spectral_entropy",
    oracle="""
    WITH vi AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), daily AS (
        SELECT day,
               CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / (100.0 * count(*)) AS m
        FROM vi GROUP BY day
    ), idx AS (
        SELECT m, row_number() OVER (ORDER BY day) - 1 AS t,
               CAST(count(*) OVER () AS BIGINT) AS n,
               avg(m) OVER () AS mu
        FROM daily
    ), per AS (SELECT unnest(range(2, 15)) AS p),
    terms AS (
        SELECT p.p, i.n,
               (i.m - i.mu) * cos(2 * pi() * i.t / p.p) AS c,
               (i.m - i.mu) * sin(2 * pi() * i.t / p.p) AS s
        FROM idx i CROSS JOIN per p
    ), pw AS (
        SELECT p, n,
               floor((sum(c) * sum(c) + sum(s) * sum(s)) * (2.0 / n)
                     * 1000000 + 0.5) / 1000000 AS power
        FROM terms GROUP BY p, n
    ), tot AS (SELECT sum(power) AS tp FROM pw)
    SELECT max(pw.n) AS n_days,
           round(max(t.tp), 6) AS total_power,
           floor(-sum(CASE WHEN pw.power > 0 AND t.tp > 0
                           THEN (pw.power / t.tp) * ln(pw.power / t.tp)
                           ELSE 0 END) * 1000000 + 0.5) / 1000000
               AS spectral_entropy,
           floor(-sum(CASE WHEN pw.power > 0 AND t.tp > 0
                           THEN (pw.power / t.tp) * ln(pw.power / t.tp)
                           ELSE 0 END) / ln(13) * 1000000 + 0.5) / 1000000
               AS normalized_entropy
    FROM pw CROSS JOIN tot t
    """,
    tags=("timeseries", "seasonality", "spectral", "entropy"),
)
def q_ts_spectral_entropy(spark, sf_dir):
    """Spectral (Shannon) entropy of the purchase daily-mean periodogram
    over candidate periods 2..14 — the one-number "how concentrated is the
    seasonality" summary: entropy near 0 means one dominant cycle (use
    `ts_holt_winters` with that season), entropy near ln(13) means a flat
    spectrum (don't bother with a seasonal model). Rides the SAME
    `periodogram_from_daily` core as `ts_periodogram` — and therefore the
    same mergeable per-day grid the streaming seasonality monitor
    maintains, so `serve_spectral_entropy` is bit-identical to this batch
    query. Entropy terms are pure functions of the 13 canonicalized
    powers; the 13-term sum is 1e-6-floor-canonicalized."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    vi = ev.select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    daily = vi.groupBy("day").agg(
        (F.sum("v").cast("long").cast("double") / (F.lit(100.0) * F.count("*"))).alias("m")
    )
    return spectral_entropy_from_daily(daily)


def spectral_entropy_from_daily(daily):
    """Spectral entropy from a (day, m) daily-mean grid — shared by
    `ts_spectral_entropy` and the streaming seasonality monitor's
    `serve_spectral_entropy` (the periodogram's mergeability carries over:
    entropy is a pure function of the served powers)."""
    import math  # noqa: PLC0415

    pw = periodogram_from_daily(daily)
    tot = pw.agg(F.sum("power").alias("tp"))
    frac = F.col("power") / F.col("tp")
    term = F.when(
        (F.col("power") > 0) & (F.col("tp") > 0), frac * F.log(frac)
    ).otherwise(F.lit(0.0))
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        pw.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n_days").alias("n_days"),
            F.round(F.max("tp"), 6).alias("total_power"),
            canon(-F.sum(term)).alias("spectral_entropy"),
            canon(-F.sum(term) / F.lit(math.log(13))).alias("normalized_entropy"),
        )
    )


@register(
    "ts_permutation_entropy",
    oracle="""
    WITH t AS (
        SELECT user_id, value AS x1,
               lead(value, 1) OVER w AS x2,
               lead(value, 2) OVER w AS x3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), pat AS (
        SELECT user_id,
               (1 + CASE WHEN x2 < x1 THEN 1 ELSE 0 END
                  + CASE WHEN x3 < x1 THEN 1 ELSE 0 END) * 100
             + (1 + CASE WHEN x1 <= x2 THEN 1 ELSE 0 END
                  + CASE WHEN x3 < x2 THEN 1 ELSE 0 END) * 10
             + (1 + CASE WHEN x1 <= x3 THEN 1 ELSE 0 END
                  + CASE WHEN x2 <= x3 THEN 1 ELSE 0 END) AS pattern
        FROM t WHERE x3 IS NOT NULL
    ), counts AS (
        SELECT user_id, pattern, CAST(count(*) AS BIGINT) AS c
        FROM pat GROUP BY user_id, pattern
    ), tot AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY user_id
    ), per_user AS (
        SELECT c.user_id, max(t.n) AS n,
               -sum((c.c / CAST(t.n AS DOUBLE))
                    * ln(c.c / CAST(t.n AS DOUBLE))) AS h
        FROM counts c JOIN tot t USING (user_id) GROUP BY c.user_id
    )
    SELECT user_id, n AS n_triples,
           floor(h * 1000000 + 0.5) / 1000000 AS perm_entropy,
           floor(h / ln(6) * 1000000 + 0.5) / 1000000 AS normalized_entropy
    FROM per_user WHERE n >= 10
    """,
    tags=("timeseries", "entropy", "complexity", "diagnostic"),
)
def q_ts_permutation_entropy(spark, sf_dir):
    """Per-key order-3 permutation entropy (Bandt-Pompe) of the tick
    series: every consecutive value triple maps to one of 6 ordinal
    patterns (ties broken by position, so both engines classify equal
    doubles identically), and the Shannon entropy of the pattern
    histogram measures series complexity — near ln(6) = indistinguishable
    from noise (don't fit an AR model), low = strong ordinal structure.
    The standard cheap complexity gate beside `ts_hurst_rs` (long-memory)
    and `stats_runs_test` (sign randomness).

    Scale shape: one per-key window pass builds the triples (two leads),
    one grouped count per (key, pattern) — at most 6 rows per key — and
    one per-key aggregate folds the entropy; no global relation anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        F.col("value").alias("x1"),
        F.lead("value", 1).over(w).alias("x2"),
        F.lead("value", 2).over(w).alias("x3"),
    ).filter(F.col("x3").isNotNull())
    b = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    pattern = (
        (F.lit(1) + b(F.col("x2") < F.col("x1")) + b(F.col("x3") < F.col("x1"))) * 100
        + (F.lit(1) + b(F.col("x1") <= F.col("x2")) + b(F.col("x3") < F.col("x2"))) * 10
        + (F.lit(1) + b(F.col("x1") <= F.col("x3")) + b(F.col("x2") <= F.col("x3")))
    )
    counts = t.select("user_id", pattern.alias("pattern")).groupBy(
        "user_id", "pattern"
    ).agg(F.count("*").cast("long").alias("c"))
    w_u = Window.partitionBy("user_id")
    frac = F.col("c") / F.sum("c").over(w_u).cast("double")
    per_user = counts.select(
        "user_id", "c", (frac * F.log(frac)).alias("term")
    ).groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n"), (-F.sum("term")).alias("h")
    )
    import math  # noqa: PLC0415

    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return per_user.filter(F.col("n") >= 10).select(
        "user_id",
        F.col("n").alias("n_triples"),
        canon(F.col("h")).alias("perm_entropy"),
        canon(F.col("h") / F.lit(math.log(6))).alias("normalized_entropy"),
    )


@register(
    "ts_adf_unit_root",
    oracle="""
    WITH vi AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), daily AS (
        SELECT day,
               CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / (100.0 * count(*)) AS m
        FROM vi GROUP BY day
    ), d AS (
        SELECT m - lag(m) OVER (ORDER BY day) AS y,
               lag(m) OVER (ORDER BY day) AS x
        FROM daily
    ), a AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               regr_slope(y, x) AS beta,
               regr_r2(y, x) AS r2,
               var_samp(y) AS vy, var_samp(x) AS vx
        FROM d WHERE x IS NOT NULL
    )
    SELECT n AS n_obs, round(beta, 9) AS beta,
           floor(beta / sqrt((1 - r2) * vy / ((n - 2) * vx))
                 * 1000000 + 0.5) / 1000000 AS t_stat,
           beta / sqrt((1 - r2) * vy / ((n - 2) * vx)) < -2.86 AS stationary
    FROM a
    """,
    tags=("timeseries", "stationarity", "unit-root", "diagnostic"),
)
def q_ts_adf_unit_root(spark, sf_dir):
    """Dickey-Fuller unit-root test (constant, no lag augmentation) on the
    purchase daily-mean series: regress delta_m on m_{t-1}; beta near 0
    (t above -2.86, the 5% critical value with constant) means a unit
    root — difference the series before fitting the AR forecaster
    (`ml_linear_ar`), the standard pre-modeling stationarity gate beside
    `ts_acf`/`ts_hurst_rs`. Closed form off regr_slope/regr_r2/var_samp
    on the bounded daily grid: se(beta)^2 = (1-r^2)*Syy/((n-2)*Sxx) with
    the (n-1) factors cancelling — one aggregate, zero extra shuffles,
    the identical IEEE expression on both engines (canon 1e-6)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    vi = ev.select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    daily = vi.groupBy("day").agg(
        (F.sum("v").cast("long").cast("double") / (F.lit(100.0) * F.count("*"))).alias("m")
    )
    w_day = Window.orderBy("day")
    d = daily.select(
        (F.col("m") - F.lag("m").over(w_day)).alias("y"),
        F.lag("m").over(w_day).alias("x"),
    ).filter(F.col("x").isNotNull())
    a = d.agg(
        F.count("*").cast("long").alias("n"),
        F.regr_slope("y", "x").alias("beta"),
        F.regr_r2("y", "x").alias("r2"),
        F.var_samp("y").alias("vy"),
        F.var_samp("x").alias("vx"),
    )
    se = F.sqrt(
        (1 - F.col("r2")) * F.col("vy") / ((F.col("n") - 2) * F.col("vx"))
    )
    t = F.col("beta") / se
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return a.select(
        F.col("n").alias("n_obs"),
        F.round("beta", 9).alias("beta"),
        canon(t).alias("t_stat"),
        (t < -2.86).alias("stationary"),
    )


@register(
    "ts_turning_points",
    oracle="""
    WITH vi AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), daily AS (
        SELECT day,
               CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / (100.0 * count(*)) AS m
        FROM vi GROUP BY day
    ), tri AS (
        SELECT lag(m) OVER (ORDER BY day) AS p, m,
               lead(m) OVER (ORDER BY day) AS nx,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily
    ), tp AS (
        SELECT n, CAST(count(*) FILTER (
                   WHERE (m > p AND m > nx) OR (m < p AND m < nx))
               AS BIGINT) AS t
        FROM tri WHERE p IS NOT NULL AND nx IS NOT NULL
        GROUP BY n
    )
    SELECT n AS n_days, t AS turning_points,
           round(2.0 * (n - 2) / 3, 6) AS expected,
           floor((t - 2.0 * (n - 2) / 3) / sqrt((16.0 * n - 29) / 90)
                 * 1000000 + 0.5) / 1000000 AS z_score,
           abs((t - 2.0 * (n - 2) / 3) / sqrt((16.0 * n - 29) / 90)) < 1.96
               AS consistent_with_random
    FROM tp
    """,
    tags=("timeseries", "randomness", "diagnostic"),
)
def q_ts_turning_points(spark, sf_dir):
    """Turning-points randomness test on the purchase daily-mean series:
    count strict local extrema among interior days; under iid the count
    is ~N(2(n-2)/3, (16n-29)/90), so the z-score flags serial structure
    the runs test (signs) can miss — and vice versa; the two cover each
    other in the residual-diagnostics panel. Strict inequalities mean
    ties (equal doubles — both engines derive them from identical cents)
    are never extrema. One pass over the bounded daily grid."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    vi = ev.select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    daily = vi.groupBy("day").agg(
        (F.sum("v").cast("long").cast("double") / (F.lit(100.0) * F.count("*"))).alias("m")
    )
    w_day = Window.orderBy("day")
    tri = daily.select(
        F.lag("m").over(w_day).alias("p"),
        "m",
        F.lead("m").over(w_day).alias("nx"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    ).filter(F.col("p").isNotNull() & F.col("nx").isNotNull())
    is_tp = ((F.col("m") > F.col("p")) & (F.col("m") > F.col("nx"))) | (
        (F.col("m") < F.col("p")) & (F.col("m") < F.col("nx"))
    )
    tp = tri.groupBy("n").agg(
        F.sum(F.when(is_tp, 1).otherwise(0)).cast("long").alias("t")
    )
    n, t = F.col("n"), F.col("t")
    exp = F.lit(2.0) * (n - 2) / 3
    z = (t - exp) / F.sqrt((F.lit(16.0) * n - 29) / 90)
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return tp.select(
        n.alias("n_days"),
        t.alias("turning_points"),
        F.round(exp, 6).alias("expected"),
        canon(z).alias("z_score"),
        (F.abs(z) < 1.96).alias("consistent_with_random"),
    )


@register(
    "ts_forecast_reconciliation",
    oracle="""
    WITH vi AS (
        SELECT event_type AS t,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ), daily AS (
        SELECT t, day, CAST(sum(v) AS BIGINT) AS sv
        FROM vi GROUP BY t, day
    ), mx AS (SELECT CAST(max(day) AS BIGINT) AS hi FROM daily),
    test AS (
        SELECT d.t, d.day, d.sv / 100.0 AS actual
        FROM daily d CROSS JOIN mx WHERE d.day > mx.hi - 7
    ), base AS (
        SELECT d.t, d.day + 7 AS day, d.sv / 100.0 AS fc_base
        FROM daily d CROSS JOIN mx
        WHERE d.day + 7 > mx.hi - 7 AND d.day + 7 <= mx.hi
    ), totals AS (
        SELECT day,
               CAST(sum(CAST(round(fc_base * 100) AS BIGINT)) AS BIGINT) AS bu
        FROM base GROUP BY day
    ), direct AS (
        SELECT d.day + 7 AS day, CAST(sum(d.sv) AS BIGINT) AS td
        FROM daily d CROSS JOIN mx
        WHERE d.day + 7 > mx.hi - 7 AND d.day + 7 <= mx.hi
        GROUP BY d.day + 7
    )
    SELECT b.t AS event_type, b.day, b.fc_base,
           floor(b.fc_base * t2.td / t1.bu * 1000000 + 0.5) / 1000000
               AS fc_reconciled,
           e.actual,
           floor(abs(e.actual - b.fc_base) * 1000000 + 0.5) / 1000000
               AS abs_err_base,
           floor(abs(e.actual - b.fc_base * t2.td / t1.bu) * 1000000 + 0.5)
               / 1000000 AS abs_err_reconciled
    FROM base b
    JOIN totals t1 ON t1.day = b.day
    JOIN direct t2 ON t2.day = b.day
    JOIN test e ON e.t = b.t AND e.day = b.day
    """,
    tags=("timeseries", "forecast", "hierarchy", "reconciliation"),
)
def q_ts_forecast_reconciliation(spark, sf_dir):
    """Hierarchy-coherent forecasting: seasonal-naive (lag-7) per-type
    daily revenue forecasts reconciled TOP-DOWN so the children sum to the
    directly-forecast total — the coherence step every hierarchical
    forecasting stack (product→category→total) runs so downstream
    consumers never see children disagreeing with their parent.

    Per-type base forecasts and the direct total forecast both come from
    the one (type, day) cents grid; reconciliation multiplies each child
    by (direct total / bottom-up total) per day — a broadcast of two
    7-row day relations, zero extra passes. Exact-cents sums keep the
    scale factors' inputs integer; the two IEEE ops per row are
    floor-canonicalized at 1e-6."""
    ev = load_table(spark, sf_dir, "events")
    vi = ev.select(
        F.col("event_type").alias("t"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    daily = vi.groupBy("t", "day").agg(F.sum("v").cast("long").alias("sv"))
    daily = daily.localCheckpoint(eager=False)
    mx = daily.agg(F.max("day").cast("long").alias("hi"))
    test = (
        daily.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("hi") - 7)
        .select("t", "day", (F.col("sv") / 100.0).alias("actual"))
    )
    base = (
        daily.crossJoin(F.broadcast(mx))
        .filter(
            ((F.col("day") + 7) > F.col("hi") - 7) & ((F.col("day") + 7) <= F.col("hi"))
        )
        .select("t", (F.col("day") + 7).alias("day"), (F.col("sv") / 100.0).alias("fc_base"))
    )
    totals = base.groupBy("day").agg(
        F.sum(F.round(F.col("fc_base") * 100).cast("long")).cast("long").alias("bu")
    )
    direct = (
        daily.crossJoin(F.broadcast(mx))
        .filter(
            ((F.col("day") + 7) > F.col("hi") - 7) & ((F.col("day") + 7) <= F.col("hi"))
        )
        .groupBy((F.col("day") + 7).alias("day"))
        .agg(F.sum("sv").cast("long").alias("td"))
    )
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    rec = F.col("fc_base") * F.col("td") / F.col("bu")
    return (
        base.join(F.broadcast(totals), "day")
        .join(F.broadcast(direct), "day")
        .join(test, ["t", "day"])
        .select(
            F.col("t").alias("event_type"),
            F.col("day").cast("long").alias("day"),
            "fc_base",
            canon(rec).alias("fc_reconciled"),
            "actual",
            canon(F.abs(F.col("actual") - F.col("fc_base"))).alias("abs_err_base"),
            canon(F.abs(F.col("actual") - rec)).alias("abs_err_reconciled"),
        )
    )


@register(
    "dq_freshness_lag",
    oracle="""
    WITH g AS (SELECT max(ts) AS hi FROM events),
    per AS (
        SELECT event_type, max(ts) AS latest,
               CAST(count(*) AS BIGINT) AS n_total
        FROM events GROUP BY event_type
    )
    SELECT p.event_type,
           CAST(date_diff('second', p.latest, g.hi) AS BIGINT) AS staleness_s,
           p.n_total,
           CAST((SELECT count(*) FROM events e
                 WHERE e.event_type = p.event_type
                   AND e.ts > g.hi - INTERVAL 1 DAY) AS BIGINT) AS n_last_day
    FROM per p CROSS JOIN g
    """,
    tags=("dq", "freshness", "monitoring"),
)
def q_dq_freshness_lag(spark, sf_dir):
    """Per-stream freshness audit: how stale is each event type relative
    to the newest tick anywhere, and how much volume arrived in the
    trailing day — the "did a feed silently die" gate that runs before
    every downstream aggregation window closes. Two grouped aggregations
    over one scan (per-type max/count + trailing-day count as a
    conditional sum against the broadcast global max); integer seconds,
    full value-hash oracle."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").alias("hi"))
    j = ev.crossJoin(F.broadcast(g))
    return j.groupBy("event_type").agg(
        (
            F.unix_timestamp(F.max("hi")) - F.unix_timestamp(F.max("ts"))
        ).cast("long").alias("staleness_s"),
        F.count("*").cast("long").alias("n_total"),
        F.sum(
            F.when(F.col("ts") > F.col("hi") - F.expr("INTERVAL 1 DAY"), 1).otherwise(0)
        ).cast("long").alias("n_last_day"),
    )


@register(
    "ts_hurst_rs",
    oracle="""
    WITH vi AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), daily AS (
        SELECT day,
               CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / (100.0 * count(*)) AS m
        FROM vi GROUP BY day
    ), idx AS (
        SELECT m, row_number() OVER (ORDER BY day) - 1 AS t,
               CAST(count(*) OVER () AS BIGINT) AS tt
        FROM daily
    ), sizes AS (SELECT unnest([4, 8, 16, 32]) AS w),
    blocks AS (
        SELECT s.w, i.t // s.w AS blk, i.t % s.w AS pos, i.m
        FROM idx i CROSS JOIN sizes s
        WHERE i.t // s.w < i.tt // s.w
    ), bstat AS (
        SELECT w, blk, avg(m) AS mu,
               sqrt(avg(m * m) - avg(m) * avg(m)) AS sd
        FROM blocks GROUP BY w, blk
    ), z AS (
        SELECT b.w, b.blk,
               sum(b.m - s.mu) OVER (PARTITION BY b.w, b.blk ORDER BY b.pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM blocks b JOIN bstat s ON s.w = b.w AND s.blk = b.blk
    ), rs AS (
        SELECT z.w, z.blk,
               (max(z.cum) - min(z.cum)) / max(s.sd) AS ratio
        FROM z JOIN bstat s ON s.w = z.w AND s.blk = z.blk
        WHERE s.sd > 0
        GROUP BY z.w, z.blk
    ), per_w AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
               ln(avg(ratio)) AS y, ln(CAST(w AS DOUBLE)) AS x,
               avg(ratio) AS mean_rs
        FROM rs GROUP BY w
    ), fit AS (
        SELECT (count(*) * sum(x * y) - sum(x) * sum(y))
               / (count(*) * sum(x * x) - sum(x) * sum(x)) AS h
        FROM per_w
    )
    SELECT p.w AS window_size, p.n_blocks,
           floor(p.mean_rs * 1000000 + 0.5) / 1000000 AS mean_rs,
           floor(f.h * 1000000 + 0.5) / 1000000 AS hurst
    FROM per_w p CROSS JOIN fit f
    """,
    tags=("timeseries", "hurst", "finance", "longmemory"),
)
def q_ts_hurst_rs(spark, sf_dir):
    """Hurst exponent by rescaled-range (R/S) analysis of the purchase
    daily-mean series: split the series into blocks of 4/8/16/32 days,
    compute each block's range-of-cumulative-deviations over its std, and
    fit ln(mean R/S) against ln(window) — H>0.5 = trending/long-memory,
    H<0.5 = mean-reverting, the classic regime diagnostic for the
    reference's price-forecasting domain (is an AR window even the right
    model class?).

    Everything is windowed WITHIN (size, block) partitions over the
    bounded daily grid (the one global window is the day indexing); the
    4-row log-log fit is a closed-form slope. Incomplete trailing blocks
    are dropped (t/w < T/w integer arithmetic — identical on both
    engines); zero-variance blocks are excluded before the ratio."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    vi = ev.select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    daily = vi.groupBy("day").agg(
        (F.sum("v").cast("long").cast("double") / (F.lit(100.0) * F.count("*"))).alias("m")
    )
    idx = daily.select(
        "m",
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("tt"),
    )
    sizes = spark.createDataFrame([(4,), (8,), (16,), (32,)], "w int")
    blocks = (
        idx.crossJoin(F.broadcast(sizes))
        .filter(
            F.floor(F.col("t") / F.col("w")) < F.floor(F.col("tt") / F.col("w"))
        )
        .select(
            "w",
            F.floor(F.col("t") / F.col("w")).cast("long").alias("blk"),
            (F.col("t") % F.col("w")).alias("pos"),
            "m",
        )
    )
    bstat = blocks.groupBy("w", "blk").agg(
        F.avg("m").alias("mu"),
        F.sqrt(F.avg(F.col("m") * F.col("m")) - F.avg("m") * F.avg("m")).alias("sd"),
    )
    wz = (
        Window.partitionBy("w", "blk").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    z = blocks.join(bstat, ["w", "blk"]).withColumn(
        "cum", F.sum(F.col("m") - F.col("mu")).over(wz)
    )
    rs = (
        z.filter(F.col("sd") > 0)
        .groupBy("w", "blk")
        .agg(((F.max("cum") - F.min("cum")) / F.max("sd")).alias("ratio"))
    )
    per_w = rs.groupBy("w").agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.log(F.avg("ratio")).alias("y"),
        F.avg("ratio").alias("mean_rs"),
    ).withColumn("x", F.log(F.col("w").cast("double")))
    fit = per_w.agg(
        (
            (F.count("*") * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (F.count("*") * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
        ).alias("h")
    )
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return per_w.crossJoin(F.broadcast(fit)).select(
        F.col("w").cast("long").alias("window_size"),
        "n_blocks",
        canon(F.col("mean_rs")).alias("mean_rs"),
        canon(F.col("h")).alias("hurst"),
    )


def _haar_level_sql(src: str, lvl: int) -> str:
    """One Haar step: exact pairwise (avg, diff/2) over even/odd positions
    of ``src``; trailing unpaired element dropped (count=2 guard)."""
    return f"""
    h{lvl} AS (
        SELECT t // 2 AS t,
               sum(CASE WHEN t % 2 = 0 THEN v ELSE 0 END) / 2.0
                 + sum(CASE WHEN t % 2 = 1 THEN v ELSE 0 END) / 2.0 AS v,
               sum(CASE WHEN t % 2 = 0 THEN v ELSE 0 END) / 2.0
                 - sum(CASE WHEN t % 2 = 1 THEN v ELSE 0 END) / 2.0 AS d
        FROM {src} GROUP BY t // 2 HAVING count(*) = 2
    )"""


@register(
    "ts_wavelet_energy",
    oracle=f"""
    WITH vi AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ), daily AS (
        SELECT day,
               CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / (100.0 * count(*)) AS m
        FROM vi GROUP BY day
    ), h0 AS (
        SELECT row_number() OVER (ORDER BY day) - 1 AS t, m AS v FROM daily
    ),{_haar_level_sql("h0", 1)},{_haar_level_sql("h1", 2)},{_haar_level_sql("h2", 3)}
    SELECT CAST(1 AS BIGINT) AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
           floor(sum(d * d) * 1000000 + 0.5) / 1000000 AS detail_energy
    FROM h1
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
           floor(sum(d * d) * 1000000 + 0.5) / 1000000 FROM h2
    UNION ALL
    SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
           floor(sum(d * d) * 1000000 + 0.5) / 1000000 FROM h3
    """,
    tags=("timeseries", "wavelet", "spectral", "multiresolution"),
)
def q_ts_wavelet_energy(spark, sf_dir):
    """Haar wavelet detail energy at scales 2/4/8 days for the purchase
    daily-mean series — the multiresolution complement to
    `ts_periodogram`: the periodogram localizes periodicity in frequency,
    the wavelet energies localize VOLATILITY by scale (is the variance
    day-to-day jitter or week-scale swings?), which decides smoothing
    windows and anomaly thresholds.

    Three exact pairwise-reduction rounds over the bounded daily grid
    (each a grouped agg on t//2, trailing odd element dropped by the
    count=2 guard; the per-round relation HALVES so later rounds are
    nearly free); the oracle unrolls the recursion as CTE stages exactly
    like `graph_kcore_peel`. Spark rounds eager-checkpoint 2-consumer
    outputs per the MMR/BFS lesson."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    vi = ev.select(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    daily = vi.groupBy("day").agg(
        (F.sum("v").cast("long").cast("double") / (F.lit(100.0) * F.count("*"))).alias("m")
    )
    cur = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1).alias("t"),
        F.col("m").alias("v"),
    )
    even = F.sum(F.when(F.col("t") % 2 == 0, F.col("v")).otherwise(0.0)) / 2.0
    odd = F.sum(F.when(F.col("t") % 2 == 1, F.col("v")).otherwise(0.0)) / 2.0
    levels = []
    for lvl in (1, 2, 3):
        nxt = (
            cur.groupBy(F.floor(F.col("t") / 2).alias("t"))
            .agg(
                (even + odd).alias("v"),
                (even - odd).alias("d"),
                F.count("*").alias("_n"),
            )
            .filter(F.col("_n") == 2)
            .select("t", "v", "d")
            .localCheckpoint(eager=True)
        )
        levels.append(
            nxt.agg(
                F.lit(lvl).cast("long").alias("level"),
                F.count("*").cast("long").alias("n_coeffs"),
                (F.floor(F.sum(F.col("d") * F.col("d")) * 1000000 + F.lit(0.5)) / 1000000).alias(
                    "detail_energy"
                ),
            )
        )
        cur = nxt.select("t", "v")
    out = levels[0]
    for more in levels[1:]:
        out = out.union(more)
    return out


@register(
    "ts_pacf",
    oracle="""
    WITH l AS (
        SELECT user_id, value,
               lag(value, 1) OVER w AS v1, lag(value, 2) OVER w AS v2,
               lag(value, 3) OVER w AS v3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), a AS (
        SELECT user_id,
               round(corr(value, v1), 9) AS r1,
               round(corr(value, v2), 9) AS r2,
               round(corr(value, v3), 9) AS r3
        FROM l GROUP BY user_id
    ), d AS (
        SELECT user_id, r1, r2, r3,
               (r2 - r1 * r1) / (1 - r1 * r1) AS p2,
               r1 * (1 - r2) / (1 - r1 * r1) AS f21
        FROM a
    )
    SELECT user_id, lag, pacf FROM (
        SELECT user_id, CAST(1 AS BIGINT) AS lag,
               floor(r1 * 1000000 + 0.5) / 1000000 AS pacf FROM d
        UNION ALL
        SELECT user_id, CAST(2 AS BIGINT),
               floor(p2 * 1000000 + 0.5) / 1000000 FROM d
        UNION ALL
        SELECT user_id, CAST(3 AS BIGINT),
               floor((r3 - f21 * r2 - p2 * r1)
                     / (1 - f21 * r1 - p2 * r2) * 1000000 + 0.5) / 1000000
        FROM d
    )
    """,
    tags=("timeseries", "pacf", "stats", "diagnostic"),
)
def q_ts_pacf(spark, sf_dir):
    """Per-key partial autocorrelation at lags 1..3 by the closed-form
    Durbin-Levinson recursion over the lag correlations — the diagnostic
    `ts_acf` cannot replace: PACF cuts off sharply at the true AR order
    (the reference hard-codes window 10, `lvmh_forecaster2.py:30`; PACF is
    how you READ the right order off the data), while ACF only decays.
    Fixed recursion depth → one fixed IEEE expression tree per lag, no
    iteration; lag correlations round-9 pinned on both engines before the
    recursion, outputs canon 1e-6. Same single window pass + grouped agg
    shape as `ts_acf`/`ts_ljung_box`."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id", "value",
        *[F.lag("value", k).over(w).alias(f"v{k}") for k in range(1, 4)],
    )
    a = lagged.groupBy("user_id").agg(
        *[F.round(F.corr("value", f"v{k}"), 9).alias(f"r{k}") for k in range(1, 4)]
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    d = a.select(
        "user_id", "r1", "r2", "r3",
        ((r2 - r1 * r1) / (1 - r1 * r1)).alias("p2"),
        (r1 * (1 - r2) / (1 - r1 * r1)).alias("f21"),
    )
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    p3 = (F.col("r3") - F.col("f21") * F.col("r2") - F.col("p2") * F.col("r1")) / (
        1 - F.col("f21") * F.col("r1") - F.col("p2") * F.col("r2")
    )
    out1 = d.select("user_id", F.lit(1).cast("long").alias("lag"), canon(F.col("r1")).alias("pacf"))
    out2 = d.select("user_id", F.lit(2).cast("long").alias("lag"), canon(F.col("p2")).alias("pacf"))
    out3 = d.select("user_id", F.lit(3).cast("long").alias("lag"), canon(p3).alias("pacf"))
    return out1.union(out2).union(out3)


_PURGE_FOLDS = 5
_PURGE_EMBARGO = 2  # days excluded from training on EACH side of the test block


@register(
    "ml_purged_time_split",
    oracle=f"""
    WITH days AS (
        SELECT DISTINCT date_trunc('day', ts) AS day FROM events
    ), idx AS (
        SELECT day, row_number() OVER (ORDER BY day) AS i,
               count(*) OVER () AS n
        FROM days
    ), folds AS (SELECT unnest(range(0, {_PURGE_FOLDS})) AS fold),
    bounds AS (
        SELECT f.fold,
               CAST(floor(f.fold * max(i.n) / {_PURGE_FOLDS}.0) + 1 AS BIGINT) AS lo,
               CAST(floor((f.fold + 1) * max(i.n) / {_PURGE_FOLDS}.0) AS BIGINT) AS hi
        FROM folds f CROSS JOIN idx i GROUP BY f.fold
    ), labeled AS (
        SELECT b.fold, i.i,
               CASE WHEN i.i BETWEEN b.lo AND b.hi THEN 'test'
                    WHEN i.i < b.lo - {_PURGE_EMBARGO}
                      OR i.i > b.hi + {_PURGE_EMBARGO} THEN 'train'
                    ELSE 'purged' END AS role
        FROM bounds b CROSS JOIN idx i
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(count(CASE WHEN role = 'train' THEN 1 END) AS BIGINT) AS n_train_days,
           CAST(count(CASE WHEN role = 'test' THEN 1 END) AS BIGINT) AS n_test_days,
           CAST(count(CASE WHEN role = 'purged' THEN 1 END) AS BIGINT) AS n_purged_days,
           CAST(coalesce(min(CASE WHEN role = 'train' THEN
                 least(abs(i - (SELECT min(i2.i) FROM labeled i2
                                WHERE i2.fold = labeled.fold AND i2.role = 'test')),
                       abs(i - (SELECT max(i2.i) FROM labeled i2
                                WHERE i2.fold = labeled.fold AND i2.role = 'test')))
               END), 0) AS BIGINT) AS min_train_test_gap
    FROM labeled
    GROUP BY fold
    """,
    tags=("ml", "timeseries", "split", "leakage", "eval"),
)
def q_ml_purged_time_split(spark, sf_dir):
    """Purged k-fold time split with embargo (López de Prado's leakage
    control for serially-correlated data — public): the event calendar is
    cut into 5 contiguous test blocks; training days within 2 days of a
    test block are PURGED, so features computed over trailing windows
    (W1/W2 sliding features) can't smuggle test-period information into
    training — the time-series analogue of `corpus_cluster_split`.
    Per fold: train/test/purged day counts and the realized minimum
    train↔test gap (always > embargo, checked by the oracle's integer
    arithmetic).  Scale shape: the day grid is calendar-bounded (one
    distinct-shuffle over events, then everything runs on |days| rows);
    the fold grid is a 5-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.date_trunc("day", "ts").alias("day")).distinct()
    w = Window.orderBy("day")
    idx = days.select(
        "day",
        F.row_number().over(w).cast("long").alias("i"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    )
    folds = idx.sparkSession.range(_PURGE_FOLDS).select(F.col("id").alias("fold"))
    k = float(_PURGE_FOLDS)
    bounds = (
        folds.crossJoin(idx.select(F.max("n").alias("n")).limit(1))
        .select(
            "fold",
            (F.floor(F.col("fold") * F.col("n") / k) + 1).cast("long").alias("lo"),
            F.floor((F.col("fold") + 1) * F.col("n") / k).cast("long").alias("hi"),
        )
    )
    labeled = (
        F.broadcast(bounds)
        .crossJoin(idx.select("i"))
        .select(
            "fold",
            "i",
            "lo",
            "hi",
            F.when(F.col("i").between(F.col("lo"), F.col("hi")), "test")
            .when(
                (F.col("i") < F.col("lo") - _PURGE_EMBARGO)
                | (F.col("i") > F.col("hi") + _PURGE_EMBARGO),
                "train",
            )
            .otherwise("purged")
            .alias("role"),
        )
    )
    tmin = labeled.filter(F.col("role") == "test").groupBy("fold").agg(
        F.min("i").alias("t_lo"), F.max("i").alias("t_hi")
    )
    gap = F.least(
        F.abs(F.col("i") - F.col("t_lo")), F.abs(F.col("i") - F.col("t_hi"))
    )
    return (
        labeled.join(F.broadcast(tmin), "fold")
        .groupBy(F.col("fold").cast("long").alias("fold"))
        .agg(
            F.count(F.when(F.col("role") == "train", 1)).cast("long").alias("n_train_days"),
            F.count(F.when(F.col("role") == "test", 1)).cast("long").alias("n_test_days"),
            F.count(F.when(F.col("role") == "purged", 1)).cast("long").alias("n_purged_days"),
            F.coalesce(
                F.min(F.when(F.col("role") == "train", gap)), F.lit(0)
            ).cast("long").alias("min_train_test_gap"),
        )
    )


# ---------------------------------------------------------------------------
# Matrix profile (r10) — STOMP's diagonal trick in relational form
# (Yeh et al., "Matrix Profile I", ICDM 2016 — public)
# ---------------------------------------------------------------------------

_MP_W = 5      # subsequence length (days)
_MP_ZONE = 3   # trivial-match exclusion: |i - j| >= _MP_ZONE


def matrix_profile_daily(
    df: DataFrame,
    key: str = "event_type",
    w: int = _MP_W,
    zone: int = _MP_ZONE,
) -> DataFrame:
    """Per-key matrix profile of the DAILY mean series: for every length-w
    subsequence, the z-normalized Euclidean distance to its nearest
    non-trivial neighbor within the same series — the all-pairs motif /
    discord primitive (a subsequence with a LOW profile value repeats; a
    HIGH one is an anomaly).

    Relational STOMP: all pairwise products v[p]·v[q] land in a (key,
    diag=p−q, p) relation, and QT(i,j) — the sliding dot product every
    distance needs — is a width-w window SUM along each diagonal, exactly
    the O(1)-per-cell update STOMP exploits, expressed as a partitioned
    window instead of a sequential scan.  Subsequence moments come from
    one width-w sliding sum over the grid.  Everything quadratic runs on
    the per-key DAILY grid (tens of rows per key after one grouped agg —
    the `ts_theil_sen` scale move), never on raw ticks.

    Bit-parity: daily means are re-quantized to integer cents, so S1, S2,
    and QT are exact BIGINT sums (immune to window-sum accumulation
    order); each distance is then ONE fixed-shape IEEE expression
    corr = (w·QT − S1ᵢS1ⱼ) / (√denᵢ·√denⱼ), den = w·S2 − S1², and
    d² = 2w(1 − corr).  Zero-variance (constant) subsequences have no
    z-norm and are excluded from both sides of the profile.

    Returns (key, win_idx, nn_idx, mp_dist, diag) — nearest-neighbor
    index, profile distance, and the matching diagonal."""
    vi = df.select(
        F.col(key),
        F.col("ts").cast("date").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    daily = vi.groupBy(key, "d").agg(
        F.floor(
            F.sum("vc").cast("long").cast("double") / (F.lit(1.0) * F.count("*"))
            + F.lit(0.5)
        ).cast("long").alias("v")
    )
    widx = Window.partitionBy(key).orderBy("d")
    grid = daily.withColumn("idx", F.row_number().over(widx).cast("long")).select(
        key, "idx", "v"
    )
    grid = grid.localCheckpoint(eager=False)
    wslide = Window.partitionBy(key).orderBy("idx").rowsBetween(0, w - 1)
    wins = (
        grid.select(
            key,
            F.col("idx").alias("i"),
            F.sum("v").over(wslide).alias("s1"),
            F.sum(F.col("v") * F.col("v")).over(wslide).alias("s2"),
            F.count("*").over(wslide).alias("wn"),
        )
        .filter(F.col("wn") == w)
        .select(
            key,
            "i",
            "s1",
            (F.lit(w) * F.col("s2") - F.col("s1") * F.col("s1")).alias("den"),
        )
    )
    a = grid.select(key, F.col("idx").alias("p"), F.col("v").alias("va"))
    b = grid.select(key, F.col("idx").alias("q"), F.col("v").alias("vb"))
    prods = a.join(b, key).select(
        key,
        (F.col("p") - F.col("q")).alias("diag"),
        "p",
        (F.col("va") * F.col("vb")).alias("prod"),
    )
    wdiag = Window.partitionBy(key, "diag").orderBy("p").rowsBetween(0, w - 1)
    qt = (
        prods.select(
            key,
            "diag",
            F.col("p").alias("i"),
            F.sum("prod").over(wdiag).alias("qt"),
            F.count("*").over(wdiag).alias("qn"),
        )
        .filter((F.col("qn") == w) & (F.abs(F.col("diag")) >= zone))
        .withColumn("j", F.col("i") - F.col("diag"))
    )
    wi = wins.select(key, "i", F.col("s1").alias("s1i"), F.col("den").alias("deni"))
    wj = wins.select(
        key, F.col("i").alias("j"), F.col("s1").alias("s1j"), F.col("den").alias("denj")
    )
    pairs = (
        qt.join(wi, [key, "i"])
        .join(wj, [key, "j"])
        .filter((F.col("deni") > 0) & (F.col("denj") > 0))
        .withColumn(
            "corr",
            (
                (F.lit(w) * F.col("qt") - F.col("s1i") * F.col("s1j")).cast("double")
            )
            / (
                F.sqrt(F.col("deni").cast("double"))
                * F.sqrt(F.col("denj").cast("double"))
            ),
        )
        .withColumn("d2", F.lit(2.0 * w) * (F.lit(1.0) - F.col("corr")))
    )
    wmin = Window.partitionBy(key, "i").orderBy(F.round("d2", 9), F.asc("j"))
    return (
        pairs.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select(
            key,
            F.col("i").alias("win_idx"),
            F.col("j").alias("nn_idx"),
            F.round(F.sqrt(F.greatest(F.col("d2"), F.lit(0.0))), 6).alias("mp_dist"),
            "diag",
        )
    )


def _matrix_profile_oracle(w: int = _MP_W, zone: int = _MP_ZONE) -> str:
    return f"""
    WITH vi AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(round(value * 100) AS BIGINT) AS vc
        FROM events
    ), daily AS (
        SELECT event_type, d,
               CAST(floor(CAST(CAST(sum(vc) AS BIGINT) AS DOUBLE)
                          / (1.0 * count(*)) + 0.5) AS BIGINT) AS v
        FROM vi GROUP BY event_type, d
    ), grid AS MATERIALIZED (
        SELECT event_type,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
                    AS BIGINT) AS idx,
               v
        FROM daily
    ), wins AS MATERIALIZED (
        SELECT event_type, i, s1, {w} * s2 - s1 * s1 AS den FROM (
            SELECT event_type, idx AS i,
                   CAST(sum(v) OVER sw AS BIGINT) AS s1,
                   CAST(sum(v * v) OVER sw AS BIGINT) AS s2,
                   count(*) OVER sw AS wn
            FROM grid
            WINDOW sw AS (PARTITION BY event_type ORDER BY idx
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING))
        WHERE wn = {w}
    ), prods AS (
        SELECT a.event_type, a.idx - b.idx AS diag, a.idx AS p,
               a.v * b.v AS prod
        FROM grid a JOIN grid b USING (event_type)
    ), qt AS (
        SELECT event_type, diag, i, qtv, i - diag AS j FROM (
            SELECT event_type, diag, p AS i,
                   CAST(sum(prod) OVER dw AS BIGINT) AS qtv,
                   count(*) OVER dw AS qn
            FROM prods
            WINDOW dw AS (PARTITION BY event_type, diag ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING))
        WHERE qn = {w} AND abs(diag) >= {zone}
    ), pairs AS (
        SELECT q.event_type, q.i, q.j, q.diag,
               2.0 * {w} * (1.0 - (
                   CAST({w} * q.qtv - wi.s1 * wj.s1 AS DOUBLE)
                   / (sqrt(CAST(wi.den AS DOUBLE)) * sqrt(CAST(wj.den AS DOUBLE)))
               )) AS d2
        FROM qt q
        JOIN wins wi ON wi.event_type = q.event_type AND wi.i = q.i
        JOIN wins wj ON wj.event_type = q.event_type AND wj.i = q.j
        WHERE wi.den > 0 AND wj.den > 0
    )
    SELECT event_type, i AS win_idx, j AS nn_idx,
           round(sqrt(greatest(d2, 0.0)), 6) AS mp_dist, diag
    FROM (
        SELECT event_type, i, j, diag, d2,
               row_number() OVER (PARTITION BY event_type, i
                                  ORDER BY round(d2, 9), j) AS rn
        FROM pairs)
    WHERE rn = 1
    """


@register(
    "ts_matrix_profile",
    oracle=_matrix_profile_oracle(),
    tags=("timeseries", "matrix-profile", "motif", "anomaly"),
)
def q_ts_matrix_profile(spark, sf_dir):
    """Matrix profile (w=5 days, exclusion zone 3) of each event_type's
    daily mean series: per subsequence, the z-normalized distance to its
    nearest non-trivial neighbor — low values = repeated motifs, high
    values = discords (the anomaly view `ts_anomaly_stl_residual` can't
    see: shape anomalies with normal levels).  QT via window sums along
    (key, diagonal) — the STOMP recurrence as a partitioned window —
    with BIGINT-exact moments; fully value-hash-checked."""
    ev = load_table(spark, sf_dir, "events")
    return matrix_profile_daily(ev, key="event_type", w=_MP_W, zone=_MP_ZONE)


@register(
    "ts_mp_discords",
    oracle=f"""
    WITH mp AS ({_matrix_profile_oracle()})
    SELECT event_type, kind, win_idx, nn_idx, mp_dist FROM (
        SELECT event_type, 'discord' AS kind, win_idx, nn_idx, mp_dist,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY mp_dist DESC, win_idx) AS rn
        FROM mp
        UNION ALL
        SELECT event_type, 'motif' AS kind, win_idx, nn_idx, mp_dist,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY mp_dist ASC, win_idx) AS rn
        FROM mp)
    WHERE rn = 1
    """,
    tags=("timeseries", "matrix-profile", "anomaly", "motif"),
)
def q_ts_mp_discords(spark, sf_dir):
    """The matrix profile's consumable artifact: per key, the top DISCORD
    (the subsequence farthest from everything — the shape anomaly) and
    the top MOTIF pair (the closest repeat), each with its matched
    window.  Pure per-key ranks over the `ts_matrix_profile` relation
    (bounded: windows per key), deterministic win_idx tie-break."""
    ev = load_table(spark, sf_dir, "events")
    mp = matrix_profile_daily(ev, key="event_type", w=_MP_W, zone=_MP_ZONE)
    wd = Window.partitionBy("event_type").orderBy(
        F.desc("mp_dist"), F.asc("win_idx")
    )
    wm = Window.partitionBy("event_type").orderBy(
        F.asc("mp_dist"), F.asc("win_idx")
    )
    disc = mp.withColumn("rn", F.row_number().over(wd)).filter(
        F.col("rn") == 1
    ).select("event_type", F.lit("discord").alias("kind"), "win_idx", "nn_idx", "mp_dist")
    moti = mp.withColumn("rn", F.row_number().over(wm)).filter(
        F.col("rn") == 1
    ).select("event_type", F.lit("motif").alias("kind"), "win_idx", "nn_idx", "mp_dist")
    return disc.union(moti)
