"""Streaming demo runner — the reference's E2 session as a live Spark job.

Replays the integrated pipeline (`lvmh_forecaster2.py` run():
scrape → change-dedup → variation → retrain cadence → multi-step forecast →
as-of alignment → rolling RMSE → export) on Structured Streaming with the
synthetic rate source standing in for the HTTP poller, then prints what the
reference shows on its live chart: latest ticks, forecast-vs-actual ledger
rows, and the RMSE trail — and exports the same three CSV stores its
``export_data`` writes on shutdown.

Usage:
    python demo_stream.py [seconds] [rows_per_second]

Defaults: 20 s drive at 50 rows/s (the reference ingests ≤0.2 rows/s —
`asyncio scraping.py:86` — so even the demo rate is 250× its envelope).
"""

from __future__ import annotations

import sys
import tempfile
import time

from real_time_scraping_and_predicting_time_series_data_spark.session import get_spark
from real_time_scraping_and_predicting_time_series_data_spark.sources.streams import (
    rate_tick_stream,
)
from real_time_scraping_and_predicting_time_series_data_spark.streaming.monitor import (
    TickMetricsListener,
)
from real_time_scraping_and_predicting_time_series_data_spark.streaming.pipeline import (
    ForecastPipeline,
)


def main(seconds: int = 20, rows_per_second: int = 50) -> int:
    spark = get_spark(app_name="demo-stream")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="demo_stream_")
    print(f"work dir: {work}")

    listener = TickMetricsListener()
    spark.streams.addListener(listener)

    pipe = ForecastPipeline(spark, work, lookback=5, horizon=3, retrain_every=10)
    ticks = rate_tick_stream(spark, rows_per_second=rows_per_second, n_keys=5)
    pipe.start(ticks, trigger={"processingTime": "2 seconds"})
    print(f"driving for {seconds}s at {rows_per_second} rows/s ...")
    time.sleep(seconds)

    counts = pipe.stop_and_export(f"{work}/export")
    spark.streams.removeListener(listener)

    print("\n-- exported stores (reference export_data twin) --")
    for name, n in counts.items():
        print(f"  {name}: {n} rows -> {work}/export/{name}/")

    if (t := pipe.ticks()) is not None:
        print("\n-- latest ticks (post change-dedup + variation) --")
        t.orderBy(t.ts.desc()).limit(5).show(truncate=False)
    if (led := pipe.ledger()) is not None:
        print("-- forecast ledger (as-of aligned) --")
        led.orderBy(led.target_ts.desc()).limit(5).show(truncate=False)
    if (r := pipe.rmse_history()) is not None:
        print("-- RMSE history --")
        r.show(10, truncate=False)
    return 0


if __name__ == "__main__":
    secs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    sys.exit(main(secs, rps))
