"""Custom Python DataSource: the reference's HTTP tick poller as a
FIRST-CLASS Spark source.

The reference's S1 operator (`asyncio scraping.py:12-43`) polls the Yahoo
chart API every 5 s, keeps only price CHANGES, and appends (timestamp,
price, variation) rows.  The engine has so far twinned it with a file
drop-zone + rate source (`sources/streams.py`); this module closes the
remaining API-surface gap by implementing the poller as a registered
Spark data source (`spark.read.format("tick")` /
`spark.readStream.format("tick")`) via the Python DataSource API
(pyspark.sql.datasource, Spark 4) — so a user can mount the tick feed
exactly like parquet or Kafka, and Catalyst sees a real relation with a
fixed schema.

Network honesty: this container has no network and real polling belongs
to an out-of-engine process anyway (SURVEY §2.1 S1 decision), so the
fetch step is a DETERMINISTIC synthetic twin — a seeded md5-hash random
walk reproducing the reference's change-dedup semantics (unchanged polls
emit nothing; variation = price − previous price, `scraper:44-55`).  An
``endpoint`` option documents where the real HTTP GET would go; wiring it
is a one-function swap (`_price_at`), and every batching / offset /
partition-planning mechanism around it is real and tested.

Batch form: ``spark.read.format("tick").option("n_ticks", 500)`` plans
one partition per ``partitions`` option (default 4) — rows are generated
executor-side from the partition spec (the driver ships only (start, end)
bounds, never rows).

Streaming form: a ``SimpleDataSourceStreamReader`` whose offset is the
poll index — ``initialOffset``/``read(start)`` advance ``poll_batch``
polls per micro-batch; replaying a (start, end) range is bit-reproducible
(offsets ARE the randomness seed), so the source is exactly-once under
Spark's offset log exactly like a real replayable source.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

__all__ = ["TickDataSource", "TICK_SCHEMA_DDL", "register_tick_source"]

TICK_SCHEMA_DDL = "poll_id BIGINT, ts TIMESTAMP, price DOUBLE, variation DOUBLE"

_BASE_PRICE = 650.0  # LVMH-ish level, cents-exact arithmetic below
_EPOCH_S = 1_700_000_000  # fixed synthetic clock origin, 5 s cadence


def _hash_u32(seed: str, i: int) -> int:
    return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)


def _step(seed: str, k: int) -> int:
    """Deterministic per-poll price step — THE swap point for a real HTTP
    fetch (a live poller would return fetched_price - last_price here).
    Step 0 (prob 1/3) models an unchanged poll, exercising the
    change-dedup."""
    r = _hash_u32(seed, k) % 3  # -1 / 0 / +1 cents, 0 => unchanged poll
    return (-1, 0, 25)[r]


def _rows(seed: str, start: int, end: int) -> Iterator[tuple]:
    """CHANGED-price rows for polls in [start, end): the reference's dedup
    (scraper:47-50) — a poll whose step is 0 emits nothing.  State is
    rebuilt from poll 0 so any (start, end) slice is replayable;
    production would checkpoint (last_cents) per offset instead."""
    import datetime as dt

    cents = round(_BASE_PRICE * 100)
    for k in range(1, end):
        s = _step(seed, k)
        cents += s
        if k >= start and s != 0:
            ts = dt.datetime.fromtimestamp(_EPOCH_S + 5 * k, dt.timezone.utc).replace(
                tzinfo=None
            )
            yield (k, ts, cents / 100.0, s / 100.0)


class _TickPartition(InputPartition):
    def __init__(self, seed: str, start: int, end: int):
        self.seed, self.start, self.end = seed, start, end


class _TickBatchReader(DataSourceReader):
    def __init__(self, options):
        self.seed = options.get("seed", "tick")
        self.n = int(options.get("n_ticks", 200))
        self.parts = max(1, int(options.get("partitions", 4)))

    def partitions(self):
        per = -(-self.n // self.parts)
        return [
            _TickPartition(self.seed, lo + 1, min(lo + per, self.n) + 1)
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _TickPartition):
        yield from _rows(partition.seed, partition.start, partition.end)


class _TickStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.seed = options.get("seed", "tick")
        self.per_batch = int(options.get("poll_batch", 20))
        self.max_polls = int(options.get("max_polls", 100))

    def initialOffset(self):
        return {"poll": 1}

    def read(self, start):
        lo = start["poll"]
        hi = min(lo + self.per_batch, self.max_polls + 1)
        # the Simple reader prefetches driver-side and PICKLES the rows to
        # executors: a plain generator fails to pickle, a bare list fails
        # the runner's next() — a list_iterator satisfies both
        return iter(list(_rows(self.seed, lo, hi))), {"poll": hi}

    def readBetweenOffsets(self, start, end):
        # replay path: offsets fully determine the rows (exactly-once)
        return iter(list(_rows(self.seed, start["poll"], end["poll"])))


class TickDataSource(DataSource):
    """``format("tick")`` — deterministic change-deduped tick feed.

    Options: ``seed`` (hash seed), batch: ``n_ticks``/``partitions``,
    stream: ``poll_batch``/``max_polls``, ``endpoint`` (documentary)."""

    @classmethod
    def name(cls):
        return "tick"

    def schema(self):
        return TICK_SCHEMA_DDL

    def reader(self, schema: StructType):
        return _TickBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _TickStreamReader(self.options)


def register_tick_source(spark) -> None:
    spark.dataSource.register(TickDataSource)


# Registered query: the custom source's batch form, value-hash-verified —
# DuckDB replays the identical md5 walk (same first-8-hex u32, same %3
# step table, same cumulative cents), so even the custom DataSource is
# oracle-checked, not just smoke-tested.
from ..plans.registry import register  # noqa: E402


@register(
    "source_tick_batch",
    oracle=f"""
    WITH k AS (
        SELECT unnest(range(1, 201)) AS k
    ), s AS (
        SELECT k,
               CASE (('0x' || substr(md5('tick:' || CAST(k AS VARCHAR)), 1, 8))::UBIGINT % 3)
                    WHEN 0 THEN -1 WHEN 1 THEN 0 ELSE 25 END AS step
        FROM k
    ), c AS (
        SELECT k, step,
               {round(_BASE_PRICE * 100)} + CAST(sum(step) OVER (ORDER BY k) AS BIGINT)
                   AS cents
        FROM s
    )
    SELECT CAST(k AS BIGINT) AS poll_id,
           make_timestamp(({_EPOCH_S} + 5 * k) * 1000000) AS ts,
           cents / 100.0 AS price,
           step / 100.0 AS variation
    FROM c WHERE step != 0
    """,
    tags=("source", "datasource-api", "streaming-twin"),
)
def q_source_tick_batch(spark, sf_dir):
    """The custom ``format("tick")`` DataSource read as a batch relation
    (200 polls, 4 planned partitions) and verified VALUE-EXACTLY against a
    DuckDB replay of the same md5 step walk — the change-dedup semantics
    of the reference's poller (`scraper:44-55`) pinned at the source-API
    level: unchanged polls absent, variation = price step, cents-exact
    prices.  ``sf_dir`` is unused (the source is its own data)."""
    register_tick_source(spark)
    return spark.read.format("tick").option("n_ticks", 200).load()


@register(
    "source_tick_stream_serve",
    oracle=f"""
    WITH k AS (
        SELECT unnest(range(1, 201)) AS k
    ), s AS (
        SELECT k,
               CASE (('0x' || substr(md5('tick:' || CAST(k AS VARCHAR)), 1, 8))::UBIGINT % 3)
                    WHEN 0 THEN -1 WHEN 1 THEN 0 ELSE 25 END AS step
        FROM k
    ), c AS (
        SELECT k, step,
               {round(_BASE_PRICE * 100)} + CAST(sum(step) OVER (ORDER BY k) AS BIGINT)
                   AS cents
        FROM s
    )
    SELECT CAST(k AS BIGINT) AS poll_id,
           make_timestamp(({_EPOCH_S} + 5 * k) * 1000000) AS ts,
           cents / 100.0 AS price,
           step / 100.0 AS variation
    FROM c WHERE step != 0
    """,
    tags=("source", "datasource-api", "streaming", "incremental"),
)
def q_source_tick_stream_serve(spark, sf_dir):
    """The STREAMING path of the custom tick source exercised end-to-end
    as a batch-callable query: readStream.format("tick") drains 200 polls
    through micro-batches of 45 into a parquet sink under a checkpoint,
    and the sink contents are returned — the oracle is the same DuckDB
    md5-walk replay as `source_tick_batch`, so value-hash parity proves
    offset-ranged micro-batch emission reassembles the batch relation
    exactly (no dropped, duplicated, or reordered polls across batch
    boundaries).  Store/checkpoint in a process-scoped temp dir."""
    import atexit
    import shutil
    import tempfile

    register_tick_source(spark)
    root = tempfile.mkdtemp(prefix="tick_serve_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    q = (
        spark.readStream.format("tick")
        .option("max_polls", 200)
        .option("poll_batch", 45)
        .load()
        .writeStream.format("parquet")
        .option("path", root + "/out")
        .option("checkpointLocation", root + "/ckpt")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.schema(TICK_SCHEMA_DDL).parquet(root + "/out")
