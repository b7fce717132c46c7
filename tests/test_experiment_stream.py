"""Batch ↔ streaming parity for the incremental A/B experiment monitor:
per-user conversion bits must merge idempotently across micro-batches
(users span batches), replay-safely, restart-recoverably, and the max-fold
compaction must keep the served readout bit-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.catalog import load_table
from real_time_scraping_and_predicting_time_series_data_spark.operators.stats import (
    conversion_bits,
    two_proportion_from_bits,
)
from real_time_scraping_and_predicting_time_series_data_spark.streaming.experiment_stream import (
    ExperimentStreamMonitor,
)

SF = "/root/testdata/sf0.001"


def _batch_want(spark):
    ev = load_table(spark, SF, "events")
    return tuple(two_proportion_from_bits(conversion_bits(ev)).collect()[0])


def _served(mon):
    return tuple(mon.serve_readout().collect()[0])


def test_stream_serve_matches_batch_with_users_spanning_batches(spark, tmp_path):
    """Splitting on EVENT id (not user) puts most users in several
    batches — the served readout must still equal the one-batch statistic
    because bits merge by max, not sum."""
    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "src")
    for i in range(3):
        ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(3)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    mon = ExperimentStreamMonitor(spark, str(tmp_path / "store"))
    q = mon.attach(
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    assert _served(mon) == _batch_want(spark)


def test_replay_restart_and_max_compaction(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    part = lambda i: ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(2)) == i)  # noqa: E731
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    mon = ExperimentStreamMonitor(spark, str(tmp_path / "store"))

    assert mon.serve_readout().collect() == []  # typed-empty pre-ingest

    part(0).coalesce(1).write.mode("append").parquet(src)
    q = mon.attach(
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src),
        ckpt,
    )
    q.awaitTermination(300)
    half = _served(mon)

    mon.ingest_batch(part(0), 0)  # at-least-once replay: unchanged
    assert _served(mon) == half

    part(1).coalesce(1).write.mode("append").parquet(src)
    q2 = mon.attach(
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src),
        ckpt,
    )
    q2.awaitTermination(300)
    full = _served(mon)
    assert full == _batch_want(spark)

    # max-fold compaction: served readout bit-identical; folded replays drop
    mon.compact()
    assert _served(mon) == full
    mon.ingest_batch(part(0), 0)
    assert _served(mon) == full
