"""Continuous aggregate: incremental minute partials must serve exactly the
batch recompute at every resolution, across micro-batch boundaries, before
and after compaction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_scraping_and_predicting_time_series_data_spark.streaming.continuous_agg import (
    ContinuousAggregate,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BASE = dt.datetime(2024, 3, 1, 10, 0, 0)

# Two batches whose rows interleave inside the same minute/hour buckets —
# the case where append-only partials produce duplicate bucket rows that
# serve-side merging must collapse.
BATCH_1 = [(1, 0, 10.0), (1, 20, 30.0), (1, 70, 5.0), (2, 10, 100.0)]
BATCH_2 = [(1, 30, 20.0), (1, 80, 15.0), (2, 3700, 50.0), (2, 40, 60.0)]


def _df(spark, rows):
    return spark.createDataFrame(
        [(uid, BASE + dt.timedelta(seconds=s), v) for uid, s, v in rows], SCHEMA
    )


def _expected(spark, resolution):
    raw = _df(spark, BATCH_1 + BATCH_2)
    return {
        (r.user_id, r.bucket): (r.n, round(r.s, 9), r.mn, r.mx)
        for r in raw.groupBy(
            "user_id", F.date_trunc(resolution, "ts").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }


def _served(agg, resolution):
    return {
        (r.user_id, r.bucket): (r.n_events, round(r.total_value, 9), r.min_value, r.max_value)
        for r in agg.serve(resolution).collect()
    }


def test_incremental_serve_equals_batch_recompute(spark, tmp_path):
    agg = ContinuousAggregate(spark, str(tmp_path))
    agg.ingest_batch(_df(spark, BATCH_1), 0)
    agg.ingest_batch(_df(spark, BATCH_2), 1)

    for resolution in ("minute", "hour", "day"):
        assert _served(agg, resolution) == _expected(spark, resolution), resolution

    # compaction is invisible to serve and bounds the store at 1 row/bucket
    before = _served(agg, "minute")
    agg.compact()
    assert _served(agg, "minute") == before
    store = agg.partials()
    assert store.count() == store.select("user_id", "bucket").distinct().count()


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a batch_id must not
    double-count — the replay overwrites its own earlier write."""
    agg = ContinuousAggregate(spark, str(tmp_path))
    agg.ingest_batch(_df(spark, BATCH_1), 0)
    agg.ingest_batch(_df(spark, BATCH_2), 1)
    agg.ingest_batch(_df(spark, BATCH_2), 1)  # replay
    for resolution in ("minute", "hour"):
        assert _served(agg, resolution) == _expected(spark, resolution), resolution


def test_ingest_after_compact_lands_in_new_generation(spark, tmp_path):
    """Post-compact ingests must keep serving correctly from the swapped
    generation directory."""
    agg = ContinuousAggregate(spark, str(tmp_path))
    agg.ingest_batch(_df(spark, BATCH_1), 0)
    agg.compact()
    agg.ingest_batch(_df(spark, BATCH_2), 1)
    assert _served(agg, "minute") == _expected(spark, "minute")


def test_streaming_attach_feeds_store(spark, tmp_path):
    """End-to-end through a real streaming query (file source, availableNow):
    the store must serve the batch recompute of everything ingested."""
    import json
    import os

    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    for i, rows in enumerate((BATCH_1, BATCH_2)):
        with open(os.path.join(drop, f"b{i}.json"), "w") as f:
            for uid, s, v in rows:
                f.write(
                    json.dumps(
                        {
                            "user_id": uid,
                            "ts": (BASE + dt.timedelta(seconds=s)).strftime(
                                "%Y-%m-%dT%H:%M:%S.000Z"
                            ),
                            "value": v,
                        }
                    )
                    + "\n"
                )
        t = 1_700_000_000 + i * 10
        os.utime(os.path.join(drop, f"b{i}.json"), (t, t))

    stream = (
        spark.readStream.format("json")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(drop)
    )
    agg = ContinuousAggregate(spark, str(tmp_path / "store"))
    q = agg.attach(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert _served(agg, "hour") == _expected(spark, "hour")


def test_serve_before_first_batch(spark, tmp_path):
    """Pre-ingest serve at every resolution: empty result, not
    PATH_NOT_FOUND."""
    agg = ContinuousAggregate(spark, str(tmp_path / "empty_store"))
    for res in ("minute", "hour", "day"):
        assert agg.serve(res).count() == 0
