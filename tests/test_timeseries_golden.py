"""Golden pipeline tests (SURVEY.md §5.2): deterministic replay of the
reference semantics against a plain-Python re-implementation of
``asyncio scraping.py:45-52, 80`` and ``lvmh_forecaster2.py:73-88, 126-148,
150-185`` on the same rows — including consecutive duplicate values, which
the driver's events table doesn't contain.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_scraping_and_predicting_time_series_data_spark.operators.asof import (
    asof_join,
    fifo_align,
)
from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
    anchored_variation,
    change_dedup,
    minmax_scale,
    rmse,
    sliding_features,
    tail_window,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

# Two keys; key 1 has consecutive duplicates (reference change-dedup target),
# key 2 is monotonic. Timestamps irregular like the 5 s poll.
BASE = dt.datetime(2024, 1, 1)
ROWS = [
    # (event_id, seconds offset, user_id, value)
    (0, 0, 1, 100.0),
    (1, 5, 1, 100.0),   # dup -> dropped
    (2, 11, 1, 101.5),
    (3, 15, 1, 101.5),  # dup -> dropped
    (4, 16, 1, 101.5),  # dup -> dropped
    (5, 22, 1, 99.0),
    (6, 30, 1, 100.0),
    (7, 31, 1, 99.0),
    (8, 40, 1, 99.0),   # dup -> dropped
    (9, 0, 2, 10.0),
    (10, 7, 2, 11.0),
    (11, 13, 2, 12.0),
    (12, 21, 2, 13.0),
]


def _reference_pipeline(rows):
    """Plain-python replay of scraper:45-52,80 per key."""
    out = {}
    for uid in sorted({r[2] for r in rows}):
        seq = [r for r in rows if r[2] == uid]
        seq.sort(key=lambda r: (r[1], r[0]))
        retained, last = [], None
        for eid, sec, _, price in seq:
            if last is None or price != last:  # scraper:80
                retained.append((eid, price))
                last = price
        first = retained[0][1]  # scraper:47-48
        out[uid] = [(eid, price, price / first - 1) for eid, price in retained]
    return out


@pytest.fixture()
def ticks(spark):
    data = [(eid, BASE + dt.timedelta(seconds=s), uid, v) for eid, s, uid, v in ROWS]
    return spark.createDataFrame(data, SCHEMA)


def test_change_dedup_golden(spark, ticks):
    got = {
        (r.user_id, r.event_id): r.value
        for r in change_dedup(ticks).collect()
    }
    want = {
        (uid, eid): price
        for uid, rows in _reference_pipeline(ROWS).items()
        for eid, price, _ in rows
    }
    assert got == want


def test_change_dedup_idempotent(spark, ticks):
    once = change_dedup(ticks)
    twice = change_dedup(once)
    assert sorted(r.event_id for r in once.collect()) == sorted(
        r.event_id for r in twice.collect()
    )


def test_anchored_variation_golden(spark, ticks):
    piped = anchored_variation(change_dedup(ticks))
    got = {r.event_id: r.variation for r in piped.collect()}
    want = {
        eid: var for rows in _reference_pipeline(ROWS).values() for eid, _, var in rows
    }
    assert set(got) == set(want)
    for eid in want:
        assert got[eid] == pytest.approx(want[eid], abs=1e-12)


def test_first_retained_variation_is_zero(spark, ticks):
    """Property from scraper:47-48: first retained tick per key has variation
    exactly 0.0."""
    piped = anchored_variation(change_dedup(ticks))
    firsts = (
        piped.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert len(firsts) == 2
    for r in firsts:
        assert r.variation == 0.0


def test_no_equal_consecutive_after_dedup(spark, ticks):
    """Property from scraper:80: retained stream has no equal consecutive
    prices per key."""
    from pyspark.sql import Window

    deduped = change_dedup(ticks)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bad = (
        deduped.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev") == F.col("value"))
        .count()
    )
    assert bad == 0


def test_sliding_features_shapes(spark, ticks):
    out = sliding_features(ticks, lookback=3, horizon=2).collect()
    # key 1 has 9 rows, key 2 has 4 -> windows needing 3 back + 2 ahead:
    # key1: positions 3..7 (0-idx 2..6) -> 5 rows; key2: position 3 -> 1 row... compute:
    # valid rows = n - lookback + 1 - horizon per key = 9-3+1-2=5 and 4-3+1-2=0
    assert len(out) == 5
    for r in out:
        assert len(r.features) == 3 and len(r.targets) == 2
    # windows are contiguous slices in ts order
    by_eid = {r.event_id: r for r in out}
    r4 = by_eid[4]  # key1 raw positions 2,3,4 -> values 101.5,101.5,101.5
    assert r4.features == [101.5, 101.5, 101.5]
    assert r4.targets == [99.0, 100.0]


def test_tail_window(spark, ticks):
    out = tail_window(ticks, 2)
    got = sorted((r.user_id, r.event_id) for r in out.collect())
    assert got == [(1, 7), (1, 8), (2, 11), (2, 12)]


def test_rmse_golden(spark, ticks):
    # persistence forecast: prev value predicts current; golden from python
    import itertools

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paired = ticks.withColumn("pred", F.lag("value").over(w))
    got = {r.user_id: r.rmse for r in rmse(paired, "value", "pred", group=["user_id"]).collect()}

    for uid in (1, 2):
        seq = sorted([r for r in ROWS if r[2] == uid], key=lambda r: (r[1], r[0]))
        errs = [
            (b[3] - a[3]) ** 2 for a, b in itertools.pairwise(seq)
        ]
        want = math.sqrt(sum(errs) / len(errs))
        assert got[uid] == pytest.approx(want, rel=1e-12)


def test_minmax_scale_bounds_and_constant_key(spark):
    data = [
        (0, BASE, 1, 5.0),
        (1, BASE, 1, 10.0),
        (2, BASE, 1, 7.5),
        (3, BASE, 2, 3.0),
        (4, BASE, 2, 3.0),  # constant key -> all scaled to 0.0, not NaN
    ]
    df = spark.createDataFrame(data, SCHEMA)
    got = {r.event_id: r.scaled for r in minmax_scale(df, key="user_id").collect()}
    assert got[0] == 0.0 and got[1] == 1.0 and got[2] == 0.5
    assert got[3] == 0.0 and got[4] == 0.0


# ---------------------------------------------------------------------------
# As-of join semantics (J1)
# ---------------------------------------------------------------------------


def _mk(spark, rows):
    return spark.createDataFrame(
        [(eid, BASE + dt.timedelta(seconds=s), uid, v) for eid, s, uid, v in rows], SCHEMA
    )


def test_asof_backward_basic(spark):
    left = _mk(spark, [(0, 10, 1, 1.0), (1, 20, 1, 2.0), (2, 5, 1, 3.0)])
    right = _mk(spark, [(100, 8, 1, 50.0), (101, 15, 1, 60.0)])
    out = {r.event_id: r.value_right for r in asof_join(left, right).collect()}
    assert out == {0: 50.0, 1: 60.0, 2: None}


def test_asof_backward_inclusive_tie(spark):
    """right.ts == left.ts matches (DuckDB ASOF >= semantics)."""
    left = _mk(spark, [(0, 10, 1, 1.0)])
    right = _mk(spark, [(100, 10, 1, 70.0)])
    out = asof_join(left, right).collect()
    assert out[0].value_right == 70.0


def test_asof_forward(spark):
    left = _mk(spark, [(0, 10, 1, 1.0), (1, 30, 1, 2.0)])
    right = _mk(spark, [(100, 12, 1, 70.0), (101, 25, 1, 80.0)])
    out = {r.event_id: r.value_right for r in asof_join(left, right, direction="forward").collect()}
    assert out == {0: 70.0, 1: None}


def test_asof_keys_isolated(spark):
    left = _mk(spark, [(0, 10, 1, 1.0)])
    right = _mk(spark, [(100, 5, 2, 99.0)])
    out = asof_join(left, right).collect()
    assert out[0].value_right is None


def test_fifo_align_offset(spark):
    """FIFO ledger semantics: i-th row pairs with (i+2)-th observation."""
    rows = [(i, 10 * i, 1, float(i)) for i in range(6)]
    df = _mk(spark, rows)
    out = fifo_align(df, df, offset=2)
    got = {r.event_id: r.r_value for r in out.collect()}
    assert got == {0: 2.0, 1: 3.0, 2: 4.0, 3: 5.0, 4: None, 5: None}


def test_fifo_every_forecast_filled_once_fifo_order(spark):
    """Property from forecaster:173-177: forecasts are consumed FIFO; each
    gets at most one actual, and matched actuals are strictly ordered."""
    rows = [(i, 10 * i, 1, float(100 + i)) for i in range(8)]
    df = _mk(spark, rows)
    out = fifo_align(df, df, offset=3).collect()
    matched = sorted(
        [(r.event_id, r.r_event_id) for r in out if r.r_event_id is not None]
    )
    # mapping is injective and order-preserving
    actuals = [a for _, a in matched]
    assert len(set(actuals)) == len(actuals)
    assert actuals == sorted(actuals)


def test_gaps_islands_partitions_stream_into_alternating_runs(spark, ticks):
    from real_time_scraping_and_predicting_time_series_data_spark.operators.timeseries import (
        gaps_islands,
    )

    # mark = the value column itself: islands are runs of equal consecutive
    # values, so island count per key == change_dedup survivor count.
    runs = gaps_islands(ticks, mark="value").collect()
    assert len(runs) == len(ROWS)  # every row belongs to exactly one island

    per_key: dict[int, list] = {}
    for r in sorted(runs, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        per_key.setdefault(r["user_id"], []).append(r)
    survivors = {
        r["user_id"]: 0
        for r in change_dedup(ticks).collect()
    }
    for r in change_dedup(ticks).collect():
        survivors[r["user_id"]] += 1
    for uid, rows in per_key.items():
        ids = [r["island_id"] for r in rows]
        assert ids == sorted(ids)  # island ids non-decreasing in stream order
        # consecutive rows share an island iff values match
        for a, b in zip(rows, rows[1:]):
            assert (a["island_id"] == b["island_id"]) == (a["value"] == b["value"])
        assert len(set(ids)) == survivors[uid]  # one island per retained tick
