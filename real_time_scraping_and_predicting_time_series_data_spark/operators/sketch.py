"""Count-min sketch over a token stream — a mergeable frequency sketch
composed entirely from grouped aggregation (SURVEY.md §2.8: "a novel sketch"
as a custom operator built by composition, no UDFs, no custom state).

Build: every token contributes one counter increment per hash row
``(seed, xxhash64(token, seed) % width)`` — an explode to ``depth`` rows and
ONE hash aggregation. The sketch is a (≤ depth·width)-row table: tiny,
mergeable by addition (union + re-aggregate — the same composable-partials
pattern as the hypertable rollup), and buildable in a single pass over
arbitrarily large corpora.

Estimate: point frequency = min over the ``depth`` counters the token hashes
to. Classic CMS guarantees hold: estimates never undercount, and overcount
by ≤ εN with probability 1-δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉
(property-tested in tests/test_sketch.py).

At 100 TB: the build is one scan + one shuffle of (depth × corpus tokens)
8-byte keyed rows with map-side combine collapsing them to ≤ depth·width
counters per partition before the exchange — the shuffle moves at most
``partitions × depth × width`` rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import ensure_min_partitions, load_table
from ..plans.registry import register

__all__ = ["cms_build", "cms_estimate", "cms_merge"]


def _bucket(tok, seed: int, width: int):
    return F.pmod(F.xxhash64(tok, F.lit(seed)), F.lit(width))


def cms_build(tokens: DataFrame, tok: str = "token", depth: int = 4, width: int = 1024) -> DataFrame:
    """(seed, bucket, n) counter table from a one-column token relation."""
    rows = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("seed"), _bucket(F.col(tok), s, width).alias("bucket"))
                    for s in range(depth)
                ]
            )
        ).alias("sb")
    )
    return rows.groupBy(F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket")).agg(
        F.count("*").alias("n")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): union + sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame, queries: DataFrame, tok: str = "token", depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-frequency estimates for each distinct query token: explode the
    token into its depth (seed, bucket) probes, broadcast-join the (tiny)
    sketch, take the min counter. Missing counters mean frequency 0."""
    probes = queries.select(
        tok,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("seed"), _bucket(F.col(tok), s, width).alias("bucket"))
                    for s in range(depth)
                ]
            )
        ).alias("sb"),
    ).select(tok, F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["seed", "bucket"], "left").na.fill({"n": 0})
    return joined.groupBy(tok).agg(F.min("n").alias("est"))


@register("sketch_cms_heavy_hitters", oracle=None, tags=("sketch", "cms", "heavy-hitters"))
def q_cms_heavy_hitters(spark, sf_dir):
    """Heavy hitters via count-min: build the sketch over the corpus token
    stream, estimate the frequency of each candidate token, keep the top 20
    by estimate. Rows-only (xxhash64 not oracle-reproducible); the CMS
    overcount bound and exact-vs-estimate agreement on heavy tokens are
    property-tested."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    tokens = docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
    sketch = cms_build(tokens, depth=4, width=1024).localCheckpoint(eager=False)
    cands = tokens.distinct()
    est = cms_estimate(sketch, cands, depth=4, width=1024)
    return est.orderBy(F.desc("est"), "token").limit(20)


@register("sketch_hll_distinct", oracle=None, tags=("sketch", "hll", "approx-distinct"))
def q_hll_distinct(spark, sf_dir):
    """HyperLogLog++ approximate distinct users per event type
    (``approx_count_distinct``, rsd=1%) beside the event count.

    The scale path for COUNT(DISTINCT): exact distinct shuffles every
    distinct (group, user) pair, HLL shuffles one ~kB-size mergeable
    register set per group per partition — constant-size state regardless
    of cardinality, the same reason the reference's dedup-by-last-value
    (``asyncio scraping.py:80``) keeps O(1) state. Rows-only (HLL register
    layouts differ between engines); accuracy vs exact is property-tested
    in tests/test_sketch.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
