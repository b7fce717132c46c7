"""Tick-bar analytics: OHLC candles, VWAP, drawdown, cross-series
correlation.

The reference is a stock-tick pipeline (``asyncio scraping.py`` polls one
price series; ``lvmh_forecaster2.py`` plots it): these are the standard
downstream analytics a user of such a pipeline reaches for next, expressed
as single-shuffle grouped aggregations / windows over the generalized
many-key tick table (``events``).

- **OHLC bars**: one grouped aggregation per (key, time bucket); open and
  close are ``min_by``/``max_by`` picks on a zero-padded sortable
  ``(timestamp, tiebreak)`` string key — DuckDB's ``arg_min``/``arg_max``
  accept only a single ordering argument, so the composite order is encoded
  into one lexicographically-correct string on BOTH engines.
- **VWAP** rides the same aggregation: Σ(price·size)/Σ(size) with the size
  taken from the ``props`` JSON (S2's path extraction feeding an aggregate).
- **Max drawdown**: running peak via a bounded ``rowsBetween`` window, then
  a grouped max of (peak − value) — the window and the aggregation share
  one hash partitioning on the key (single exchange).
- **Type correlation**: daily per-type mean series self-joined on the day
  (5 types → 10 pairs), Pearson ``corr`` per pair — how the engine answers
  "do clicks and purchases move together?" without any driver-side loop.

At 100 TB: every query here shuffles once on (key[, bucket]) with map-side
partial aggregation; bars and correlations are ~|keys|·|buckets| rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register

__all__ = []


def _sort_key():
    """Zero-padded (epoch-micros, event_id) string — lexicographic order ==
    (ts, event_id) order, reproducible in DuckDB as
    ``lpad(epoch_us(ts)::VARCHAR, 20, '0') || lpad(event_id::VARCHAR, 20, '0')``."""
    return F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )


@register(
    "ts_ohlc_vwap_bars",
    oracle="""
    WITH t AS (
        SELECT user_id, date_trunc('hour', ts) AS bar_ts, value,
               lpad(epoch_us(ts)::VARCHAR, 20, '0') || lpad(event_id::VARCHAR, 20, '0') AS sk,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS size
        FROM events
    )
    SELECT user_id, bar_ts,
           arg_min(value, sk) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, sk) AS close,
           CAST(count(*) AS BIGINT) AS n_ticks,
           round(sum(value * size) / nullif(sum(size), 0), 6) AS vwap
    FROM t
    GROUP BY user_id, bar_ts
    """,
    tags=("timeseries", "ohlc", "vwap"),
)
def q_ohlc_vwap_bars(spark, sf_dir):
    """Hourly OHLC + VWAP bars per key: ONE grouped aggregation (single
    shuffle on (user_id, hour)); open/close via min_by/max_by on the padded
    sort key, VWAP weighted by the props.k size field."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("bar_ts"),
        "value",
        _sort_key().alias("sk"),
        F.get_json_object("props", "$.k").cast("double").alias("size"),
    )
    return t.groupBy("user_id", "bar_ts").agg(
        F.min_by("value", F.col("sk")).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", F.col("sk")).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
        # nullif guard: a bar whose sizes sum to 0 has no defined VWAP —
        # NULL on both engines (ANSI Spark would otherwise raise).
        F.round(
            F.sum(F.col("value") * F.col("size")) / F.nullif(F.sum("size"), F.lit(0.0)), 6
        ).alias("vwap"),
    )


@register(
    "ts_max_drawdown",
    oracle="""
    WITH peaks AS (
        SELECT user_id, value,
               max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM events
    )
    SELECT user_id,
           round(max(peak - value), 6) AS max_drawdown,
           round(max(peak), 6) AS peak_value
    FROM peaks
    GROUP BY user_id
    """,
    tags=("timeseries", "drawdown"),
)
def q_max_drawdown(spark, sf_dir):
    """Maximum drawdown per key: running peak (bounded window, O(1) state
    per row — no prefix arrays) then a grouped max of peak − value. The
    window partitioning and the aggregation hash on the same key, so the
    plan carries ONE exchange. Absolute (not ratio) drawdown keeps the
    statistic defined for zero/negative series."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peaks = ev.select("user_id", "value", F.max("value").over(w).alias("peak"))
    return peaks.groupBy("user_id").agg(
        F.round(F.max(F.col("peak") - F.col("value")), 6).alias("max_drawdown"),
        F.round(F.max("peak"), 6).alias("peak_value"),
    )


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_seconds
    FROM sess
    GROUP BY user_id, session_id
    """,
    tags=("timeseries", "session"),
)
def q_sessionize(spark, sf_dir):
    """Batch sessionization by inactivity gap (30 min): lag-flag → running
    sum → session summary. The batch twin of the streaming
    ``session_window`` aggregation (streaming/windows.py); both windows and
    the final grouped agg hash on ``user_id``, so the plan carries ONE
    exchange. The same lag-flag + running-sum shape as gaps-and-islands,
    keyed on time gaps instead of value runs."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_s = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_s > 30 * 60 * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)).alias("new_session"),
    )
    sess = flagged.select(
        "user_id", "ts", F.sum("new_session").over(run).alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(1_000_000)
        ).cast("long").alias("duration_seconds"),
    )


@register(
    "events_type_daily_corr",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day, avg(value) AS mean_value
        FROM events GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_days,
           round(corr(a.mean_value, b.mean_value), 6) AS corr
    FROM daily a JOIN daily b ON a.day = b.day AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
    tags=("timeseries", "correlation"),
)
def q_type_daily_corr(spark, sf_dir):
    """Pairwise Pearson correlation of the per-type daily mean-value series:
    daily grouped agg (one shuffle), equi-join the tiny per-type series on
    the day (broadcast at any scale — |days|·|types| rows), grouped corr per
    pair. 5 types → 10 pairs; the declarative form of "do clicks and
    purchases move together?"."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.avg("value").alias("mean_value"))
    a = daily.select(
        F.col("event_type").alias("type_a"), "day", F.col("mean_value").alias("va")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), "day", F.col("mean_value").alias("vb")
    )
    joined = a.join(b, "day").filter(F.col("type_a") < F.col("type_b"))
    return joined.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.corr("va", "vb"), 6).alias("corr"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival statistics — tick-rate profiling / burstiness per key
# ---------------------------------------------------------------------------


@register(
    "events_inter_arrival_stats",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id,
               epoch_us(date_trunc('microseconds', ts))
                 - lag(epoch_us(date_trunc('microseconds', ts)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ), t AS (
        SELECT user_id, gap_us, gap_us / 1000000.0 AS gap_s,
               row_number() OVER (PARTITION BY user_id ORDER BY gap_us, event_id) AS rn,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        FROM g WHERE gap_us IS NOT NULL
    )
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_gaps,
           floor(CAST(CAST(sum(gap_us) AS BIGINT) AS DOUBLE)
                 / (1000000.0 * max(n)) * 1000000 + 0.5) / 1000000 AS mean_gap_s,
           CAST(min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN gap_us END) AS BIGINT) AS p50_gap_us,
           CAST(min(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN gap_us END) AS BIGINT) AS p90_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           round(stddev_samp(gap_s)
                 / (CAST(CAST(sum(gap_us) AS BIGINT) AS DOUBLE) / (1000000.0 * max(n))),
                 4) AS burstiness
    FROM t GROUP BY user_id
    """,
    tags=("events", "timeseries", "profiling"),
)
def q_inter_arrival_stats(spark, sf_dir):
    """Per-key inter-arrival profile: gap count, exact mean gap, nearest-
    rank p50/p90 gaps, max gap, and burstiness (coefficient of variation —
    ~1 for a Poisson arrival process, >1 for bursty streams). This is the
    rate-profiling scan behind trigger sizing, watermark tuning, and the
    key-skew story (which keys are hot and HOW they are hot). Gaps are
    integer MICROSECONDS end to end: percentiles and max are exact BIGINTs
    picked by rank, the mean is one exact integer sum divided once
    (floor-canonicalized), and only the stddev-based burstiness rounds a
    grouped double agg (round-4, values O(1)). One user_id exchange feeds
    the lag window, the rank window, and the final agg."""
    ev = load_table(spark, sf_dir, "events")
    wt = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id", "event_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wt)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("user_id").orderBy("gap_us", "event_id")
    wn = Window.partitionBy("user_id")
    t = g.select(
        "user_id", "gap_us",
        (F.col("gap_us") / F.lit(1000000.0)).alias("gap_s"),
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count("*").over(wn).cast("long").alias("n"),
    )
    mean_s = F.sum("gap_us").cast("long").cast("double") / (
        F.lit(1000000.0) * F.max("n")
    )
    return t.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_gaps"),
        (F.floor(mean_s * 1000000 + 0.5) / 1000000).alias("mean_gap_s"),
        F.min(
            F.when(F.col("rn") == F.ceil(0.5 * F.col("n")), F.col("gap_us"))
        ).cast("long").alias("p50_gap_us"),
        F.min(
            F.when(F.col("rn") == F.ceil(0.9 * F.col("n")), F.col("gap_us"))
        ).cast("long").alias("p90_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.round(F.stddev_samp("gap_s") / mean_s, 4).alias("burstiness"),
    )


@register(
    "events_calendar_heatmap",
    oracle="""
    SELECT CAST(dayofweek(ts) AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hr,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS DOUBLE)
             / (100.0 * count(*)) AS mean_value
    FROM events
    GROUP BY CAST(dayofweek(ts) AS INT), CAST(hour(ts) AS INT)
    """,
    tags=("events", "calendar", "profiling"),
)
def q_events_calendar_heatmap(spark, sf_dir):
    """Day-of-week x hour activity heatmap: event count, distinct users,
    exact mean value per calendar cell (168 rows max) — the seasonality-
    profiling scan behind load forecasting and trigger scheduling. One
    grouped agg over the scan; the mean uses the integer-cents exact form
    (DuckDB dayofweek: Sunday=0, Spark dayofweek: Sunday=1 — aligned by
    the -1 shift on the Spark side)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").cast("double")
            / (F.lit(100.0) * F.count("*"))
        ).alias("mean_value"),
    )


@register(
    "ts_week_over_week",
    oracle="""
    WITH wk AS (
        SELECT user_id, date_trunc('week', ts) AS week_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY user_id, date_trunc('week', ts)
    )
    SELECT user_id, strftime(week_start, '%Y-%m-%d') AS week_start,
           n_events, cents,
           lag(cents) OVER (PARTITION BY user_id ORDER BY week_start) AS prev_cents,
           CASE WHEN lag(cents) OVER (PARTITION BY user_id ORDER BY week_start) > 0
                THEN floor((CAST(cents AS DOUBLE)
                            / lag(cents) OVER (PARTITION BY user_id ORDER BY week_start)
                            - 1.0) * 1000000 + 0.5) / 1000000
           END AS wow_growth
    FROM wk
    """,
    tags=("timeseries", "calendar", "growth"),
)
def q_week_over_week(spark, sf_dir):
    """Per-key weekly totals with week-over-week growth — the reporting
    staple. Weekly sums are exact integer cents; the growth ratio is one
    fixed-shape division on two exact integers (floor-canonicalized,
    NULL for a first week or a zero/negative base). The weekly agg and
    the lag window share one user_id-rooted partitioning; weeks per key
    are bounded by the time range, so the window state is tiny."""
    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week_start")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("week_start")
    prev = F.lag("cents").over(w)
    growth = F.when(
        prev > 0,
        F.floor((F.col("cents").cast("double") / prev - F.lit(1.0)) * 1000000 + 0.5)
        / 1000000,
    )
    return wk.select(
        "user_id",
        F.date_format("week_start", "yyyy-MM-dd").alias("week_start"),
        "n_events", "cents",
        prev.alias("prev_cents"),
        growth.alias("wow_growth"),
    )
