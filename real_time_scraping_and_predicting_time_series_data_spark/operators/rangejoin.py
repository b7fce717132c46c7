"""Event-time range join (interval join) with a bucketized scale path.

A range join pairs each left row with right rows whose timestamp falls in a
trailing window ``[l.ts - W, l.ts)`` on the same key — the batch twin of the
stream-stream interval join (streaming/joins.py) and the generalization of
the reference's forecast↔actual alignment window (`lvmh_forecaster2.py:
161-185`, which pairs rows arriving within a horizon of each other).

Naive SQL expresses this as an inequality-only join predicate, which Spark
would execute as a broadcast-nested-loop or a full cartesian per key. The
scale path here **bucketizes time**: both sides get a bucket id
``floor(unix_micros(ts) / W)``; because the trailing window is exactly one
bucket wide, every qualifying right row lives in the left row's bucket or the
one before it, so exploding the left side into those two bucket keys turns
the range join into an *equi*-join on ``(key, bucket)`` followed by an exact
range residual filter. Each right row carries a single bucket, so no pair can
match twice — no dedup pass needed. Cost: 2× the left rows through one hash
join instead of a per-key cartesian; at 100 TB both sides shuffle-partition
on (key, bucket) and skew is bounded by bucket width, tunable independently
of data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register

__all__ = ["bucketed_range_join"]


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Pairs (l, r) sharing ``key`` with ``r.ts in [l.ts - W, l.ts)``.

    Both inputs must not already contain the reserved columns ``_bkt``.
    Returns the joined frame with all left columns (prefixed ``l_``) and all
    right columns (prefixed ``r_``).
    """
    w_us = int(window_seconds) * 1_000_000
    lb = F.floor(F.unix_micros(F.col(left_ts)) / w_us)
    l = left.select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
        F.explode(F.array(lb, lb - 1)).alias("_bkt"),
    )
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        F.floor(F.unix_micros(F.col(right_ts)) / w_us).alias("_bkt"),
    )
    lts, rts = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond = (F.col(f"l_{key}") == F.col(f"r_{key}")) & (l["_bkt"] == r["_bkt"])
    return (
        l.join(r, cond)
        .filter((rts >= lts - F.expr(f"INTERVAL {int(window_seconds)} SECOND")) & (rts < lts))
        .drop("_bkt")
    )


@register(
    "range_join_purchase_errors",
    oracle="""
    SELECT a.event_id AS purchase_id, b.event_id AS error_id,
           round(epoch(a.ts) - epoch(b.ts), 3) AS gap_s
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts - INTERVAL 60 MINUTE
     AND b.ts < a.ts
    WHERE a.event_type = 'purchase' AND b.event_type = 'error'
    """,
    tags=("timeseries", "join", "range"),
)
def q_range_join(spark, sf_dir):
    """Errors preceding each purchase by <60 min for the same user — the
    bucketized range join (equi-join on (user_id, time-bucket) + residual)
    where naive SQL would nested-loop."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    joined = bucketed_range_join(purchases, errors, key="user_id", window_seconds=3600)
    return joined.select(
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("error_id"),
        F.round(
            F.unix_micros(F.col("l_ts")) / 1e6 - F.unix_micros(F.col("r_ts")) / 1e6, 3
        ).alias("gap_s"),
    )
