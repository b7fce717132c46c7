"""Custom Python DataSource (format("tick")): batch partition planning,
stream/batch identity, offset-checkpoint restart, and determinism."""

from __future__ import annotations

from real_time_scraping_and_predicting_time_series_data_spark.sources.tick_source import (
    register_tick_source,
)


def _batch(spark, n=100):
    register_tick_source(spark)
    return spark.read.format("tick").option("n_ticks", n).load()


def test_batch_partitions_and_change_dedup(spark):
    df = _batch(spark, 100)
    assert df.rdd.getNumPartitions() == 4
    rows = sorted((r.poll_id, r.price, r.variation) for r in df.collect())
    # change-dedup: every emitted row has a nonzero variation, and prices
    # are cents-exact cumulative steps
    assert rows and all(v != 0.0 for _, _, v in rows)
    assert 0 < len(rows) < 100  # some polls were unchanged and dropped
    for (k1, p1, _), (k2, p2, v2) in zip(rows, rows[1:]):
        assert k1 < k2
        assert abs((p2 - p1) - v2) < 1e-9 or k2 != k1 + 1  # step consistency


def test_batch_is_deterministic_and_partitioning_invariant(spark):
    a = sorted(tuple(r) for r in _batch(spark, 80).collect())
    register_tick_source(spark)
    b = sorted(
        tuple(r)
        for r in spark.read.format("tick")
        .option("n_ticks", 80)
        .option("partitions", 7)
        .load()
        .collect()
    )
    assert a == b


def test_stream_drains_to_batch_identity(spark, tmp_path):
    register_tick_source(spark)
    q = (
        spark.readStream.format("tick")
        .option("max_polls", 100)
        .option("poll_batch", 30)
        .load()
        .writeStream.format("memory")
        .queryName("ticks_t1")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("select * from ticks_t1").collect())
    want = sorted(tuple(r) for r in _batch(spark, 100).collect())
    assert got == want


def test_stream_restart_resumes_from_offset(spark, tmp_path):
    """Stop after the first drain of 40 polls, restart with a higher
    max_polls and the SAME checkpoint: only polls beyond the committed
    offset are emitted (no duplicates), and the union equals the batch."""
    register_tick_source(spark)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def run(max_polls):
        q = (
            spark.readStream.format("tick")
            .option("max_polls", max_polls)
            .option("poll_batch", 20)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return [tuple(r) for r in spark.read.parquet(out).collect()]

    first = run(40)
    both = run(100)
    assert first
    assert len(both) > len(first)
    # exactly-once across the restart: no poll_id duplicated, union == batch
    ids = [t[0] for t in both]
    assert len(ids) == len(set(ids))
    want = {tuple(r) for r in _batch(spark, 100).collect()}
    assert set(both) == want
