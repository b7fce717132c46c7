"""State-store introspection: `spark.read.format("statestore")` reads a
streaming aggregation's checkpointed state offline — the ops surface for
debugging stateful pipelines (what keys are held, how big is state,
which partition owns a hot key) without touching the running query."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_scraping_and_predicting_time_series_data_spark.sources.tick_source import (
    register_tick_source,
)


def test_statestore_reader_matches_served_aggregate(spark, tmp_path):
    register_tick_source(spark)
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("tick")
        .option("max_polls", 100)
        .option("poll_batch", 25)
        .load()
        .groupBy((F.col("poll_id") % 4).alias("bucket"))
        .agg(F.count("*").alias("n"), F.sum("price").alias("sp"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("agg_ss")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    served = {
        r.bucket: (r.n, round(r.sp, 6))
        for r in spark.sql("select * from agg_ss").collect()
    }
    # state rows expose the INTERNAL aggregation buffer: key struct field
    # is the grouping expression, value struct fields are the aggregate
    # buffers (count, sum) — access positionally
    state = spark.read.format("statestore").load(ckpt)
    held = {
        r["key"][0]: (r["value"][0], round(r["value"][1], 6))
        for r in state.collect()
    }
    assert held == served and len(held) == 4
    # every state row names its owning shuffle partition — the handle for
    # diagnosing hot-key state skew offline
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = [r.partition_id for r in state.collect()]
    assert parts and all(0 <= p < n_shuffle for p in parts)
