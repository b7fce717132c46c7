"""As-of joins (J1): the reference's signature operator.

``lvmh_forecaster2.py:150-185`` aligns each forecast row with a
later-arriving actual: when a new actual arrives it fills the *oldest*
forecast whose ``actual_price`` is NULL (FIFO, ``forecaster:173-177`` linear
``iterrows`` scan). Two declarative, shuffle-minimal Spark decompositions:

1. **Time as-of join** (``asof_join``): for each left row, the latest right
   row with ``right.ts <= left.ts`` per key. Spark ≤4 has no ASOF JOIN SQL,
   so we compose it as *union + last(ignore-nulls) window*: tag both inputs,
   union, sort per key by (ts, side) and carry the last non-null right value
   forward. ONE shuffle + sort on (key, ts) — no range-join row explosion,
   no driver loop; scales to arbitrarily many keys/rows and is exactly the
   merge-join strategy a native ASOF implementation would use.

2. **FIFO sequence alignment** (``fifo_align``): the reference's exact
   arrival-order semantics — i-th forecast pairs with the (i+offset)-th
   observation. ``row_number`` per key on both sides + equi-join on the
   sequence number: two co-partitioned shuffles on the same key.

The DuckDB oracles use DuckDB's native ``ASOF JOIN`` and ``row_number``
respectively, so these queries are verified against an independent
implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register

__all__ = ["asof_join", "fifo_align", "asof_join_nearest"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    right_value_cols: tuple[str, ...] = ("value",),
    tiebreak: str = "event_id",
    direction: str = "backward",
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward (default) or forward as-of join, with optional tolerance.

    Returns ``left`` with, for each row, the most recent (backward) or next
    (forward) right-side ``right_value_cols`` at or before/after ``left.ts``
    within the same ``on`` key, plus the matched right timestamp as
    ``{ts}{suffix}``. Unmatched rows keep NULLs (left-outer semantics, like
    the reference's not-yet-filled forecasts). ``tolerance_seconds`` (pandas
    ``merge_asof``-style) nulls the match when the time gap exceeds it —
    evaluated as a post-fill predicate, so it adds no shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    right_value_cols = tuple(right_value_cols)
    if ts not in right_value_cols:
        right_value_cols = right_value_cols + (ts,)
    carried = [f"{c}{suffix}" for c in right_value_cols]
    l_tagged = left.select(
        F.lit(1).alias("_side"),
        F.col(on),
        F.col(ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.struct(*left.columns).alias("_row"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(a) for c, a in zip(right_value_cols, carried)],
    )
    r_tagged = right.select(
        F.lit(0).alias("_side"),
        F.col(on),
        F.col(ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_row"),
        *[F.col(c).alias(a) for c, a in zip(right_value_cols, carried)],
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows (side=0) sort before left rows at equal ts => inclusive
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc("_ts"), F.asc("_side"), F.asc("_tb"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = [F.last(a, ignorenulls=True).over(w).alias(a) for a in carried]
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc("_ts"), F.desc("_side"), F.asc("_tb"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = [F.first(a, ignorenulls=True).over(w).alias(a) for a in carried]

    out = unioned.select("_side", "_ts", "_row", *filled).filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        rts = F.col(f"{ts}{suffix}")
        gap = (
            F.unix_micros(F.col("_ts")) - F.unix_micros(rts)
            if direction == "backward"
            else F.unix_micros(rts) - F.unix_micros(F.col("_ts"))
        )
        in_tol = rts.isNotNull() & (gap <= int(tolerance_seconds * 1_000_000))
        out = out.select(
            "_ts",
            "_row",
            *[F.when(in_tol, F.col(a)).otherwise(F.lit(None)).alias(a) for a in carried],
        )
    return out.select(*[F.col(f"_row.{c}").alias(c) for c in left.columns], *carried)


def fifo_align(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    offset: int = 0,
    how: str = "left",
) -> DataFrame:
    """FIFO arrival-order alignment: the i-th left row (per key, ordered by
    arrival) joins the (i+offset)-th right row. This is the reference's
    fill-the-oldest-NULL-forecast semantics (``lvmh_forecaster2.py:173-177``)
    expressed as a sequence-number equi-join: forecasts are consumed in
    creation order by actuals in arrival order.

    Output columns: all of ``left`` plus right's columns prefixed ``r_``.
    """
    wl = Window.partitionBy(key).orderBy(ts, tiebreak)
    wr = Window.partitionBy(key).orderBy(ts, tiebreak)
    l = left.withColumn("_seq", F.row_number().over(wl))
    r = right.withColumn("_seq", F.row_number().over(wr) - F.lit(offset))
    r = r.select(
        F.col(key).alias("_rkey"), "_seq", *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key]
    )
    joined = l.join(r, (l[key] == r["_rkey"]) & (l["_seq"] == r["_seq"]), how)
    return joined.drop("_seq", "_rkey")


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "asof_join_click_purchase",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value
        FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, date_trunc('microseconds', ts) AS ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, c.value, p.value AS value_right
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("timeseries", "asof", "J1"),
)
def q_asof_time(spark, sf_dir):
    """J1 (time variant): for each click, the latest prior-or-equal purchase
    value of the same user; NULL when no purchase preceded it."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(clicks, purchases, on="user_id", ts="ts", right_value_cols=("value",))
    return out.select("event_id", "user_id", "value", "value_right")


@register(
    "asof_fifo_forecast_alignment",
    oracle="""
    WITH seqd AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        FROM events
    )
    SELECT f.user_id, f.event_id, f.value AS forecast_basis,
           a.value AS actual_value,
           round(a.value - f.value, 9) AS error
    FROM seqd f LEFT JOIN seqd a
      ON f.user_id = a.user_id AND a.seq = f.seq + 5
    """,
    tags=("timeseries", "asof", "J1", "fifo"),
)
def q_asof_fifo(spark, sf_dir):
    """J1 (FIFO variant): pair each observation with the one arriving 5
    ticks later per key — the reference's forecast-ledger alignment where a
    forecast made at tick i is scored against the actual at tick i+5."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    out = fifo_align(ev, ev, key="user_id", ts="ts", tiebreak="event_id", offset=5)
    return out.select(
        "user_id",
        "event_id",
        F.col("value").alias("forecast_basis"),
        F.col("r_value").alias("actual_value"),
        F.round(F.col("r_value") - F.col("value"), 9).alias("error"),
    )


@register(
    "asof_join_forward_tolerance",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value
        FROM events WHERE event_type = 'click'
    ), errors AS (
        SELECT user_id, date_trunc('microseconds', ts) AS ts, value
        FROM events WHERE event_type = 'error'
    ), matched AS (
        SELECT c.event_id, c.user_id, c.value, c.ts AS c_ts,
               e.value AS e_value, e.ts AS e_ts
        FROM clicks c ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts <= e.ts
    )
    SELECT event_id, user_id, value,
           CASE WHEN e_ts IS NOT NULL
                 AND epoch_us(e_ts) - epoch_us(c_ts) <= 1800000000
                THEN e_value END AS value_right,
           CASE WHEN e_ts IS NOT NULL
                 AND epoch_us(e_ts) - epoch_us(c_ts) <= 1800000000
                THEN strftime(e_ts, '%Y-%m-%d %H:%M:%S.%f') END AS matched_ts
    FROM matched
    """,
    tags=("timeseries", "asof", "J1", "forward", "tolerance"),
)
def q_asof_forward_tolerance(spark, sf_dir):
    """J1 (forward + tolerance variant): for each click, the next error of
    the same user within 30 minutes — pandas merge_asof(direction='forward',
    tolerance=...) semantics, still one shuffle + one window, verified
    against DuckDB's native forward ASOF JOIN with a gap predicate."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts", "value")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts", "value")
    out = asof_join(
        clicks,
        errors,
        on="user_id",
        ts="ts",
        right_value_cols=("value",),
        direction="forward",
        tolerance_seconds=1800,
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        "value_right",
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("matched_ts"),
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tolerance_seconds: float = 1800,
    left_id: str = "event_id",
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')``): for each left row, the right row with the smallest
    absolute time gap within tolerance, preferring the earlier (backward)
    match on exact ties. ``left_id`` must uniquely identify left rows — the
    two directional passes are merged by equi-joining on it, so duplicates
    would fan out.

    Composed from the two directional as-of primitives — each is ONE
    shuffle + one window — merged on the left row id (an equi-join on a
    unique key, AQE-friendly at any scale). No range-join explosion: cost
    is 3 co-partitioned shuffles regardless of time density.
    """
    lid = left_id
    back = asof_join(
        left, right, on=on, ts=ts, right_value_cols=(value,),
        direction="backward", tolerance_seconds=tolerance_seconds,
    ).select(
        F.col(lid), F.col(on), F.col(ts), F.col(value),
        F.col(f"{value}_right").alias("_bv"), F.col(f"{ts}_right").alias("_bts"),
    )
    fwd = asof_join(
        left, right, on=on, ts=ts, right_value_cols=(value,),
        direction="forward", tolerance_seconds=tolerance_seconds,
    ).select(F.col(lid).alias("_fid"),
             F.col(f"{value}_right").alias("_fv"), F.col(f"{ts}_right").alias("_fts"))
    m = back.join(fwd, back[lid] == fwd["_fid"], "left").drop("_fid")
    gb = F.when(F.col("_bts").isNotNull(),
                F.unix_micros(F.col(ts)) - F.unix_micros(F.col("_bts")))
    gf = F.when(F.col("_fts").isNotNull(),
                F.unix_micros(F.col("_fts")) - F.unix_micros(F.col(ts)))
    pick_back = gb.isNotNull() & (gf.isNull() | (gb <= gf))
    pick_fwd = ~F.coalesce(pick_back, F.lit(False)) & gf.isNotNull()
    return m.select(
        lid, on, value,
        F.when(pick_back, F.col("_bv")).when(pick_fwd, F.col("_fv")).alias("matched_value"),
        F.when(pick_back, F.lit("backward")).when(pick_fwd, F.lit("forward")).alias("matched_dir"),
        F.when(pick_back, gb).when(pick_fwd, gf).cast("long").alias("gap_us"),
    )


@register(
    "asof_join_nearest",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts, value
        FROM events WHERE event_type = 'click'
    ), errors AS (
        SELECT user_id, date_trunc('microseconds', ts) AS ts, value
        FROM events WHERE event_type = 'error'
    ), b AS (
        SELECT c.event_id, c.user_id, c.value, c.ts AS c_ts,
               e.value AS bv, e.ts AS bts
        FROM clicks c ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts >= e.ts
    ), f AS (
        SELECT c.event_id, e.value AS fv, e.ts AS fts
        FROM clicks c ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts <= e.ts
    ), m AS (
        SELECT b.event_id, b.user_id, b.value,
               CASE WHEN bts IS NOT NULL
                     AND epoch_us(c_ts) - epoch_us(bts) <= 1800000000
                    THEN epoch_us(c_ts) - epoch_us(bts) END AS gb,
               CASE WHEN fts IS NOT NULL
                     AND epoch_us(fts) - epoch_us(c_ts) <= 1800000000
                    THEN epoch_us(fts) - epoch_us(c_ts) END AS gf,
               bv, fv
        FROM b JOIN f USING (event_id)
    )
    SELECT event_id, user_id, value,
           CASE WHEN gb IS NOT NULL AND (gf IS NULL OR gb <= gf) THEN bv
                WHEN gf IS NOT NULL THEN fv END AS matched_value,
           CASE WHEN gb IS NOT NULL AND (gf IS NULL OR gb <= gf) THEN 'backward'
                WHEN gf IS NOT NULL THEN 'forward' END AS matched_dir,
           CAST(CASE WHEN gb IS NOT NULL AND (gf IS NULL OR gb <= gf) THEN gb
                     WHEN gf IS NOT NULL THEN gf END AS BIGINT) AS gap_us
    FROM m
    """,
    tags=("timeseries", "asof", "J1", "nearest"),
)
def q_asof_nearest(spark, sf_dir):
    """J1 (nearest variant): for each click, the error event of the same
    user with the smallest absolute time gap within 30 minutes, backward
    winning ties — merge_asof(direction='nearest') semantics."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts", "value")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts", "value")
    return asof_join_nearest(clicks, errors, tolerance_seconds=1800)


@register(
    "ml_point_in_time_features",
    oracle="""
    WITH vi AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ), feats AS (
        SELECT user_id,
               CAST(d AS TIMESTAMP) + INTERVAL 1 DAY AS avail_ts,
               strftime(d, '%Y-%m-%d') AS feat_day,
               CAST(count(*) AS BIGINT) AS feat_n,
               CAST(CAST(sum(v) AS BIGINT) AS DOUBLE) / (100.0 * count(*)) AS feat_mean
        FROM vi GROUP BY user_id, d
    ), labels AS (
        SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT l.user_id, l.event_id,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS label_ts,
           round(l.value, 6) AS label_value,
           f.feat_day, f.feat_n,
           floor(f.feat_mean * 1000000 + 0.5) / 1000000 AS feat_mean
    FROM labels l ASOF LEFT JOIN feats f
      ON l.user_id = f.user_id AND l.ts >= f.avail_ts
    """,
    tags=("ml", "asof", "features"),
)
def q_point_in_time_features(spark, sf_dir):
    """Point-in-time-correct feature join — the feature-store pattern that
    prevents training-label leakage: each purchase (label) is joined to
    its user's most recent COMPLETED-day feature snapshot (daily tick
    count + exact mean), where a day's features become available only at
    the following midnight. Same-day ticks can never leak into the label's
    features, cold-start labels keep NULLs (left semantics). Reuses the
    1-shuffle union + last-ignore-nulls as-of primitive — featurization
    and alignment share the user_id partitioning; DuckDB's native ASOF
    LEFT JOIN is the oracle. Generalizes the reference's forecast/actual
    alignment (lvmh_forecaster2.py:161-185) from one series to the
    entity-keyed training-set build."""
    ev = load_table(spark, sf_dir, "events")
    vi = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    feats = vi.groupBy("user_id", "d").agg(
        F.count("*").cast("long").alias("feat_n"),
        (F.sum("v").cast("long").cast("double") / (F.lit(100.0) * F.count("*"))).alias(
            "feat_mean"
        ),
    ).select(
        "user_id",
        F.date_add(F.col("d"), 1).cast("timestamp").alias("ts"),
        F.date_format("d", "yyyy-MM-dd").alias("feat_day"),
        "feat_n",
        "feat_mean",
        F.unix_date(F.col("d")).cast("long").alias("event_id"),
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    out = asof_join(
        labels, feats, on="user_id", ts="ts",
        right_value_cols=("feat_day", "feat_n", "feat_mean"),
        direction="backward",
    )
    return out.select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("label_ts"),
        F.round("value", 6).alias("label_value"),
        F.col("feat_day_right").alias("feat_day"),
        F.col("feat_n_right").alias("feat_n"),
        (F.floor(F.col("feat_mean_right") * 1000000 + 0.5) / 1000000).alias("feat_mean"),
    )
