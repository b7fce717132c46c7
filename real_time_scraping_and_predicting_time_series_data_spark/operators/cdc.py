"""Change-data-capture operators: upsert-log application and SCD Type-2
history construction.

The reference maintains mutable state by appending every tick to an
in-memory pandas frame and re-deriving "current" views from the tail
(``lvmh_forecaster2.py:29-45``); at warehouse scale the same need — apply a
stream of keyed inserts/updates/deletes onto a snapshot, and keep the full
validity history of each key — is CDC. Both operators are single-shuffle
window compositions: partition by the key, order by commit time, pick
winners / derive validity intervals. No Python, no driver state.

Op semantics here derive the op code from ``event_type`` (signup→I,
error→D, everything else→U), turning the driver's events table into a
deterministic changelog without synthesizing data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register

__all__ = ["with_op", "upsert_snapshot", "scd2_history"]

def with_op(events: DataFrame) -> DataFrame:
    """Tag each event with its CDC op code (I/U/D)."""
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    return events.withColumn("op", op)


def upsert_snapshot(
    log: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str = "value",
) -> DataFrame:
    """Apply an I/U/D changelog: the last op per key (by commit time) wins;
    a trailing delete tombstones the key out of the snapshot entirely.

    One hash shuffle on ``key``; the row_number + tombstone filter run
    inside the window stage. At 100 TB this is the standard merge-on-read
    compaction shape — no broadcast (keys are unbounded), no global sort.
    """
    w = Window.partitionBy(key).orderBy(F.desc(ts), F.desc(tiebreak))
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_ops", F.count("*").over(Window.partitionBy(key)))
        .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
        .select(
            key,
            F.col("op").alias("last_op"),
            F.col(value).alias("last_value"),
            F.col(ts).alias("last_ts"),
            F.col("n_ops").cast("long").alias("n_ops"),
        )
    )


def scd2_history(
    log: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str = "value",
) -> DataFrame:
    """Slowly-changing-dimension Type-2: collapse consecutive rows with an
    unchanged ``value`` (change-detection dedup, P2), then derive each
    surviving version's validity interval [valid_from, valid_to) via lead()
    and flag the open-ended current version.

    Two window passes over the SAME (key, ts, tiebreak) sort — Catalyst
    plans them in one Exchange + one Sort (the second Window reuses the
    child ordering), so the whole history build is a single shuffle.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changed = log.withColumn("_prev", F.lag(value).over(w)).filter(
        F.col("_prev").isNull() | (F.col(value) != F.col("_prev"))
    )
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    return changed.select(
        key,
        F.col(value),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "cdc_upsert_snapshot",
    oracle="""
    WITH log AS (
        SELECT user_id, event_id, value, date_trunc('microseconds', ts) AS ts,
               CASE event_type WHEN 'signup' THEN 'I'
                               WHEN 'error' THEN 'D'
                               ELSE 'U' END AS op
        FROM events
    ), ranked AS (
        SELECT user_id, op, value, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_ops
        FROM log
    )
    SELECT user_id, op AS last_op,
           round(value, 2) AS last_value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           CAST(n_ops AS BIGINT) AS n_ops
    FROM ranked WHERE rn = 1 AND op != 'D'
    """,
    tags=("cdc", "upsert"),
)
def q_cdc_upsert(spark, sf_dir):
    """Changelog apply: latest op per user wins, trailing errors (deletes)
    tombstone the user out of the snapshot."""
    ev = load_table(spark, sf_dir, "events")
    snap = upsert_snapshot(with_op(ev))
    return snap.select(
        "user_id",
        "last_op",
        F.round("last_value", 2).alias("last_value"),
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        "n_ops",
    )


@register(
    "cdc_scd2_history",
    oracle="""
    WITH chg AS (
        SELECT user_id, event_id, value, date_trunc('microseconds', ts) AS ts,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ), vers AS (
        SELECT user_id, event_id, value, ts
        FROM chg WHERE prev IS NULL OR value != prev
    )
    SELECT user_id,
           round(value, 2) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S'),
                    '9999-01-01 00:00:00') AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM vers
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("cdc", "scd2"),
)
def q_cdc_scd2(spark, sf_dir):
    """SCD Type-2 dimension history per user: one row per value version
    with its validity interval; the open interval is the current version."""
    ev = load_table(spark, sf_dir, "events")
    hist = scd2_history(ev)
    return hist.select(
        "user_id",
        F.round("value", 2).alias("value"),
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-01-01 00:00:00"),
        ).alias("valid_to"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# Snapshot diff (table-level data diff)
# ---------------------------------------------------------------------------


def snapshot_diff(old: DataFrame, new: DataFrame, key: str, compare: list[str]) -> DataFrame:
    """Row-level diff of two keyed snapshots: full outer join on the key,
    classify each key as inserted / deleted / changed / unchanged by
    comparing the listed columns (null-safe). The table-diff primitive
    behind incremental publishing, reconciliation audits, and CDC
    backfills; at scale both sides shuffle once on the key (or not at all
    if both snapshots are bucketed/partitioned by it — the layout the
    ingest pipeline already writes)."""
    o = old.select(F.col(key), *[F.col(c).alias(f"old_{c}") for c in compare])
    n = new.select(F.col(key), *[F.col(c).alias(f"new_{c}") for c in compare])
    j = o.join(n, key, "full_outer")
    changed = None
    for c in compare:
        ne = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        changed = ne if changed is None else (changed | ne)
    status = (
        F.when(F.col(f"old_{compare[0]}").isNull() & F.col(f"new_{compare[0]}").isNotNull(), "inserted")
        .when(F.col(f"new_{compare[0]}").isNull() & F.col(f"old_{compare[0]}").isNotNull(), "deleted")
        .when(changed, "changed")
        .otherwise("unchanged")
    )
    return j.withColumn("diff_status", status)


__all__ = list(globals().get("__all__", [])) + ["snapshot_diff"]


@register(
    "dq_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    ), new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderpriority = '1-URGENT'
                    THEN floor(o_totalprice * 1.1 * 100 + 0.5) / 100
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 97 != 0
    ), j AS (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               o.o_totalprice AS old_price, n.o_totalprice AS new_price,
               CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
                    WHEN n.o_orderkey IS NULL THEN 'deleted'
                    WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                         OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 'changed'
                    ELSE 'unchanged' END AS diff_status
        FROM old o FULL OUTER JOIN new n ON n.o_orderkey = o.o_orderkey
    )
    SELECT o_orderkey, diff_status,
           floor(old_price * 100 + 0.5) / 100 AS old_price,
           floor(new_price * 100 + 0.5) / 100 AS new_price
    FROM j WHERE diff_status IN ('deleted', 'changed')
    """,
    tags=("dq", "diff", "cdc"),
)
def q_dq_snapshot_diff(spark, sf_dir):
    """Snapshot diff demo: 'new' is the orders table with every 97th order
    deleted and urgent orders repriced +10% — the diff must recover exactly
    the deleted keys and the changed rows with old/new values. (Key-only
    join + column compare; the synthetic mutation makes the expected diff
    deterministic and fully oracle-checked.)"""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    new = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority") == "1-URGENT",
            F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5) / 100,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    d = snapshot_diff(old, new, "o_orderkey", ["o_totalprice", "o_orderstatus"])
    return d.filter(F.col("diff_status").isin("deleted", "changed")).select(
        "o_orderkey",
        "diff_status",
        (F.floor(F.col("old_o_totalprice") * 100 + 0.5) / 100).alias("old_price"),
        (F.floor(F.col("new_o_totalprice") * 100 + 0.5) / 100).alias("new_price"),
    )
