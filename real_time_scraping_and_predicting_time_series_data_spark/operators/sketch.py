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

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import ensure_min_partitions, load_table
from ..functions.hashing import M61, md5_60, md5_60_sql, mulmod61, mulmod61_sql, perm61, perm61_sql
from ..plans.registry import register

__all__ = ["cms_build", "cms_estimate", "cms_merge"]

# Pairwise-independent hash rows: bucket_s(tok) = ((a_s·h + b_s) mod p) mod
# width over ONE md5-derived 60-BIT token hash h (functions/hashing.py) —
# a 32-bit base hash collides among distinct tokens every ~2^16 values at
# corpus scale, fully correlating all depth rows for the colliding pair and
# defeating the min-probe. p = 2^61-1 with the overflow-safe M61 modmul
# keeps everything BIGINT on both engines; coefficients come from a seeded
# PRNG at import time and are inlined into both the Spark expressions and
# the DuckDB oracle, making the whole sketch — counters, estimates,
# heavy-hitter ranking — bit-reproducible cross-engine.
_CMS_SEED = 20260814
_CMS_PRIME = M61


def _cms_coeffs(depth: int, seed: int = _CMS_SEED) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30)) for _ in range(depth)]


def _tok_hash(tok) -> F.Column:
    return md5_60(tok)


def _bucket(h, seed: int, width: int):
    a, b = _cms_coeffs(seed + 1)[seed]
    return ((mulmod61(a, h) + F.lit(b)) % F.lit(_CMS_PRIME)) % F.lit(width)


def cms_build(tokens: DataFrame, tok: str = "token", depth: int = 4, width: int = 1024) -> DataFrame:
    """(seed, bucket, n) counter table from a one-column token relation."""
    with_h = tokens.withColumn("_h", _tok_hash(F.col(tok)))
    rows = with_h.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("seed"), _bucket(F.col("_h"), s, width).alias("bucket"))
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
    with_h = queries.withColumn("_h", _tok_hash(F.col(tok)))
    probes = with_h.select(
        tok,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("seed"), _bucket(F.col("_h"), s, width).alias("bucket"))
                    for s in range(depth)
                ]
            )
        ).alias("sb"),
    ).select(tok, F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["seed", "bucket"], "left").na.fill({"n": 0})
    return joined.groupBy(tok).agg(F.min("n").alias("est"))


def _cms_oracle(depth: int = 4, width: int = 1024) -> str:
    """DuckDB twin of the count-min heavy-hitters pipeline: same 60-bit md5
    base hash, same inlined M61 hash rows (one UNION ALL branch per seed —
    the modmul coefficients must be literals, not join columns), same
    counters and min-probe estimates — the sketch itself is reproduced,
    not approximated."""
    coeffs = _cms_coeffs(depth)
    bucket_selects = "\n        UNION ALL ".join(
        f"SELECT token, {s} AS seed, "
        f"(({mulmod61_sql(a, 'h')} + {b}) % {_CMS_PRIME}) % {width} AS bucket FROM hh"
        for s, (a, b) in enumerate(coeffs)
    )
    return f"""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents
    ), hh AS (
        SELECT token, {md5_60_sql('token')} AS h FROM toks
    ), b AS (
        {bucket_selects}
    ), sketch AS (
        SELECT seed, bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY seed, bucket
    ), probes AS (
        SELECT DISTINCT token, seed, bucket FROM b
    )
    SELECT p.token, min(sk.n) AS est
    FROM probes p JOIN sketch sk ON sk.seed = p.seed AND sk.bucket = p.bucket
    GROUP BY p.token
    ORDER BY est DESC, token
    LIMIT 20
    """


@register(
    "sketch_cms_heavy_hitters", oracle=_cms_oracle(), tags=("sketch", "cms", "heavy-hitters")
)
def q_cms_heavy_hitters(spark, sf_dir):
    """Heavy hitters via count-min: build the sketch over the corpus token
    stream, estimate the frequency of each candidate token, keep the top 20
    by estimate. Fully oracle-checked — the md5/universal-hash rows make
    counters and estimates bit-reproducible in DuckDB; the CMS overcount
    bound and exact-vs-estimate agreement on heavy tokens are additionally
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


# ---------------------------------------------------------------------------
# Bloom filter — set-membership sketch
# ---------------------------------------------------------------------------

# k independent bit positions per token: bit_i(tok) = perm61(a_i, b_i,
# md5_60(tok)) % m. Coefficients seeded and inlined into both engines, so
# the filter's bit set — and therefore every probe verdict including the
# false positives — is bit-reproducible cross-engine.
_BLOOM_SEED = 20260816


def _bloom_coeffs(k: int, seed: int = _BLOOM_SEED) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30)) for _ in range(k)]


def bloom_build(tokens: DataFrame, tok: str = "token", m: int = 4096, k: int = 3) -> DataFrame:
    """Build a Bloom filter as a relation of DISTINCT set bit positions
    (single column ``bit``, ≤ m rows). Relational-native: build is one
    explode + distinct (map-side combine collapses duplicates before the
    exchange), merge is union+distinct, and the whole filter stays a tiny
    broadcastable table no matter how large the keyed corpus — the same
    fixed-memory mergeable-sketch pattern as the count-min sketch above."""
    from ..functions.hashing import perm61

    h = _tok_hash(F.col(tok))
    bits = tokens.select(
        F.explode(
            F.array(*[(perm61(a, b, h) % F.lit(m)).alias(f"b{i}") for i, (a, b) in enumerate(_bloom_coeffs(k))])
        ).alias("bit")
    )
    return bits.distinct()


def bloom_probe(
    bloom: DataFrame, queries: DataFrame, tok: str = "token", m: int = 4096, k: int = 3
) -> DataFrame:
    """Membership probe: a token is 'maybe present' iff ALL k of its bits
    are set (count of matched probe bits == k); guaranteed no false
    negatives. The filter side is broadcast; the probe is an equi-join on
    the bit position — no Python, no per-row loops."""
    from ..functions.hashing import perm61

    h = _tok_hash(F.col(tok))
    probes = queries.select(
        tok,
        F.explode(
            F.array(*[(perm61(a, b, h) % F.lit(m)).alias(f"b{i}") for i, (a, b) in enumerate(_bloom_coeffs(k))])
        ).alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy(tok)
        .agg((F.count("_set") == F.lit(k)).alias("bloom_maybe"))
    )
    return hits


__all__ += ["bloom_build", "bloom_probe"]


def _bloom_oracle(m: int = 4096, k: int = 3) -> str:
    """DuckDB twin: same 60-bit md5 base hash, same inlined M61 probe rows,
    same all-k-bits membership rule, same exact-membership audit column."""
    coeffs = _bloom_coeffs(k)
    build_bits = "\n            UNION ALL ".join(
        f"SELECT ({perm61_sql(a, b, 'h')}) % {m} AS bit FROM src0_h"
        for a, b in coeffs
    )
    probe_bits = "\n            UNION ALL ".join(
        f"SELECT token, ({perm61_sql(a, b, 'h')}) % {m} AS bit FROM src1_h"
        for a, b in coeffs
    )
    return f"""
    WITH src0_toks AS (
        SELECT DISTINCT unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents WHERE source = 'src0'
    ), src0_h AS (
        SELECT token, {md5_60_sql('token')} AS h FROM src0_toks
    ), bloom AS (
        SELECT DISTINCT bit FROM ({build_bits})
    ), src1_toks AS (
        SELECT DISTINCT unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents WHERE source = 'src1'
    ), src1_h AS (
        SELECT token, {md5_60_sql('token')} AS h FROM src1_toks
    ), probes AS (
        {probe_bits}
    ), verdict AS (
        SELECT p.token,
               (count(b.bit) = {k}) AS bloom_maybe
        FROM probes p LEFT JOIN bloom b ON b.bit = p.bit
        GROUP BY p.token
    )
    SELECT v.token, v.bloom_maybe,
           (s.token IS NOT NULL) AS actually_present
    FROM verdict v LEFT JOIN src0_toks s ON s.token = v.token
    """


@register("sketch_bloom_membership", oracle=_bloom_oracle(), tags=("sketch", "bloom", "membership"))
def q_bloom_membership(spark, sf_dir):
    """Bloom-filter membership: build the filter over src0's distinct
    tokens, probe every distinct src1 token, and audit each verdict against
    exact membership (``actually_present``) — no-false-negative invariant
    and the deterministic false positives are both part of the hashed
    result. Fully oracle-checked via the shared M61 hash rows."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = lambda src: (
        docs.filter(F.col("source") == src)
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .distinct()
    )
    src0, src1 = toks("src0"), toks("src1")
    bloom = bloom_build(src0, m=4096, k=3).localCheckpoint(eager=False)
    verdicts = bloom_probe(bloom, src1, m=4096, k=3)
    return verdicts.join(
        src0.withColumn("_present", F.lit(True)), "token", "left"
    ).select(
        "token",
        "bloom_maybe",
        F.coalesce(F.col("_present"), F.lit(False)).alias("actually_present"),
    )


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog with md5 registers — full cross-engine oracle (r7)
# ---------------------------------------------------------------------------

_HLL_P = 12                      # register index bits
_HLL_M = 1 << _HLL_P             # 4096 registers
_HLL_TAIL_BITS = 60 - _HLL_P     # 48-bit rho tail


def hll_registers(df: DataFrame, expr) -> DataFrame:
    """(idx, M) register relation of a deterministic HLL sketch: idx = top
    12 bits of md5_60(value), rho = 49 − bit_length(48-bit tail) (all-zero
    tail → 49), M = max rho per register.  MERGEABLE by grouped max —
    the property the streaming sketches build on."""
    h = md5_60(expr)
    tail = h.bitwiseAND(F.lit((1 << _HLL_TAIL_BITS) - 1))
    rho = F.lit(_HLL_TAIL_BITS + 1) - F.length(F.ltrim(F.bin(tail), F.lit("0")))
    return (
        df.select(
            F.shiftrightunsigned(h, _HLL_TAIL_BITS).alias("idx"),
            rho.cast("long").alias("rho"),
        )
        .groupBy("idx")
        .agg(F.max("rho").cast("long").alias("M"))
    )


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """(n_registers, hll_estimate) from an (idx, M) register relation —
    the standard Flajolet raw estimator with the small-range
    linear-counting correction, as fixed-shape IEEE arithmetic."""
    m = float(_HLL_M)
    s = regs.agg(
        F.count("*").cast("long").alias("present"),
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("s_present"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(m))
    raw = alpha * F.lit(m) * F.lit(m) / (
        F.col("s_present") + (F.lit(m) - F.col("present"))
    )
    v0 = F.lit(m) - F.col("present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v0 > 0), F.lit(m) * F.log(F.lit(m) / v0)
    ).otherwise(raw)
    return s.select(
        F.col("present").alias("n_registers"),
        (F.floor(est * 1000000 + F.lit(0.5)) / 1000000).alias("hll_estimate"),
    )


@register(
    "sketch_hll_md5",
    oracle=f"""
    WITH v AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), h AS (
        SELECT {md5_60_sql("CAST(l_partkey AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)")}
                   AS h60,
               l_partkey, l_suppkey
        FROM v
    ), r AS (
        SELECT h60 >> {_HLL_TAIL_BITS} AS idx,
               CAST({_HLL_TAIL_BITS + 1}
                    - length(ltrim(bin(h60 & {(1 << _HLL_TAIL_BITS) - 1}), '0'))
                    AS BIGINT) AS rho
        FROM h
    ), regs AS (
        SELECT idx, CAST(max(rho) AS BIGINT) AS M FROM r GROUP BY idx
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS present,
               sum(power(2.0, -M)) AS s_present,
               (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_exact
        FROM regs
    ), e AS (
        SELECT n_exact, present,
               CASE WHEN (0.7213 / (1.0 + 1.079 / {float(_HLL_M)!r}))
                         * {float(_HLL_M)!r} * {float(_HLL_M)!r}
                         / (s_present + ({float(_HLL_M)!r} - present))
                         <= {2.5 * _HLL_M!r}
                     AND {float(_HLL_M)!r} - present > 0
                    THEN {float(_HLL_M)!r}
                         * ln({float(_HLL_M)!r} / ({float(_HLL_M)!r} - present))
                    ELSE (0.7213 / (1.0 + 1.079 / {float(_HLL_M)!r}))
                         * {float(_HLL_M)!r} * {float(_HLL_M)!r}
                         / (s_present + ({float(_HLL_M)!r} - present))
               END AS est
        FROM s
    )
    SELECT n_exact, present AS n_registers,
           floor(est * 1000000 + 0.5) / 1000000 AS hll_estimate,
           floor((floor(est * 1000000 + 0.5) / 1000000 - n_exact) / n_exact
                 * 1000000 + 0.5) / 1000000 AS rel_err
    FROM e
    """,
    tags=("sketch", "hll", "approx-distinct", "oracle"),
)
def q_sketch_hll_md5(spark, sf_dir):
    """HyperLogLog distinct-count of (part, supplier) supply pairs with a
    FULL value-hash oracle — upgrading the HLL family from the rows-only
    `sketch_hll_distinct` (Spark's approx_count_distinct, whose internal
    hash is engine-specific): registers derive from md5_60, so idx, rho,
    every register max, the raw Flajolet estimator, and the small-range
    linear-counting correction are bit-identical across engines.  The
    register relation is MERGEABLE by grouped max (pinned by the split ∪
    merge pytest), which is what makes HLL the right distinct-counter for
    a 100 TB union-of-partitions or a streaming store: 4096 longs of
    state regardless of input size.  One scan → one 4096-row grouped max
    → constant-size arithmetic; rel_err lands inside the ~1.04/√4096
    ≈ 1.6% envelope on the ~50k-pair universe."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select("l_partkey", "l_suppkey").distinct()
    expr = F.concat_ws(":", F.col("l_partkey").cast("string"), F.col("l_suppkey").cast("string"))
    regs = hll_registers(v, expr)
    est = hll_estimate_from_registers(regs)
    exact = v.agg(F.count("*").cast("long").alias("n_exact"))
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return exact.crossJoin(F.broadcast(est)).select(
        "n_exact",
        "n_registers",
        "hll_estimate",
        canon(
            (F.col("hll_estimate") - F.col("n_exact")) / F.col("n_exact")
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — order statistics of the hash
# ---------------------------------------------------------------------------

_KMV_K = 256


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH v AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), h AS (
        SELECT DISTINCT
               {md5_60_sql("CAST(l_partkey AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)")}
                   AS h60
        FROM v
    ), small AS (
        SELECT h60 FROM h ORDER BY h60 LIMIT {_KMV_K}
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(max(h60) AS BIGINT) AS kth,
               (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_exact
        FROM small
    )
    SELECT n_exact, k, kth,
           floor((CAST(k AS DOUBLE) - 1.0)
                 / (CAST(kth AS DOUBLE) / {float(1 << 60)!r})
                 * 1000000 + 0.5) / 1000000 AS kmv_estimate,
           floor(((CAST(k AS DOUBLE) - 1.0)
                  / (CAST(kth AS DOUBLE) / {float(1 << 60)!r}) - n_exact)
                 / n_exact * 1000000 + 0.5) / 1000000 AS rel_err
    FROM s
    """,
    tags=("sketch", "distinct", "kmv", "mergeable"),
)
def q_sketch_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values) distinct-count sketch of the (part,
    supplier) pair universe — the ORDER-STATISTIC alternative to HLL
    (`sketch_hll_distinct`/`sketch_hll_md5`): keep the k = 256 smallest
    60-bit hash values; if the k-th smallest normalized hash is U, the
    unbiased estimate is (k−1)/U (Bar-Yossef et al. 2002, public).  KMV
    sketches MERGE by "union then keep the k smallest" — associative,
    commutative, idempotent (stronger than the count grids' disjointness
    contract; pinned by test) — and unlike HLL support set EXPRESSIONS
    (intersection via the Jaccard of the union sketch).

    Fully deterministic (md5-derived hashes, exact integer order
    statistics) → full value-hash oracle, no rows-only carve-out needed.

    Scale: one distinct-pair agg, then a global TOP-K BY HASH — Spark
    plans orderBy+limit as TakeOrdered (per-partition k-heaps + a k-row
    driver merge), so nothing ever globally sorts; the sketch state is
    k longs regardless of corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select("l_partkey", "l_suppkey").distinct()
    h = v.select(
        md5_60(
            F.concat_ws(
                ":", F.col("l_partkey").cast("string"), F.col("l_suppkey").cast("string")
            )
        ).alias("h60")
    ).distinct()
    small = h.orderBy("h60").limit(_KMV_K)
    n_exact = v.agg(F.count("*").cast("long").alias("n_exact"))
    s = small.agg(
        F.count("*").cast("long").alias("k"),
        F.max("h60").cast("long").alias("kth"),
    ).crossJoin(F.broadcast(n_exact))
    est = (F.col("k").cast("double") - F.lit(1.0)) / (
        F.col("kth").cast("double") / F.lit(float(1 << 60))
    )
    canon = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return s.select(
        "n_exact",
        "k",
        "kth",
        canon(est).alias("kmv_estimate"),
        canon((est - F.col("n_exact")) / F.col("n_exact")).alias("rel_err"),
    )


@register(
    "sketch_kmv_stream_serve",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT
               {md5_60_sql("CAST(l_partkey AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR)")}
                   AS h60
        FROM lineitem
    ), small AS (
        SELECT h60 FROM h ORDER BY h60 LIMIT {_KMV_K}
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(max(h60) AS BIGINT) AS kth
        FROM small
    )
    SELECT k, kth,
           floor((CAST(k AS DOUBLE) - 1.0)
                 / (CAST(kth AS DOUBLE) / {float(1 << 60)!r})
                 * 1000000 + 0.5) / 1000000 AS kmv_estimate
    FROM s
    """,
    tags=("sketch", "distinct", "kmv", "streaming", "incremental"),
)
def q_sketch_kmv_stream_serve(spark, sf_dir):
    """INCREMENTAL twin of `sketch_kmv_distinct`, exercised as a
    batch-callable query: lineitem is ingested in three micro-batches
    split on pmod(xxhash64(l_orderkey), 3) — NOT disjoint in the sketch
    key (the same (part, supplier) pair recurs across batches), which is
    exactly the property this store exists to demonstrate: the KMV merge
    (distinct union, keep the k smallest) is IDEMPOTENT, so overlapping
    batches serve the identical whole-stream sketch.  The oracle is the
    plain one-pass SQL — value-hash parity proves it.  Store in a
    process-scoped temp dir (lazy-analyzer lifetime rule)."""
    import atexit
    import shutil
    import tempfile

    from ..streaming.kmv_stream import KmvStreamSketch

    li = load_table(spark, sf_dir, "lineitem")
    store = tempfile.mkdtemp(prefix="kmv_serve_")
    atexit.register(shutil.rmtree, store, ignore_errors=True)
    sk = KmvStreamSketch(spark, store)
    for bid in range(3):
        sk.ingest_batch(
            li.filter(F.pmod(F.xxhash64("l_orderkey"), F.lit(3)) == bid), bid
        )
    return sk.serve_sketch()


# ---------------------------------------------------------------------------
# Count-Min sketch (r11) — additive heavy-hitter counts under collisions
# ---------------------------------------------------------------------------

_CM_DEPTH = 3
_CM_WIDTH = 16
_CM_TOPK = 10


def cm_cells(tokens: DataFrame, token: str = "token") -> DataFrame:
    """Count-Min sketch cells over a token-occurrence relation: depth
    rows × width buckets, bucket_r(t) = md5_60('cm'||r||':'||t) mod width.
    The sketch IS a (depth·width)-row relation whose merge law is plain
    addition (grouped sum), which is what makes it streamable and
    cross-shard mergeable at 100 TB.

    AGGREGATE-THEN-HASH (r11 sf1x fix): counting per token FIRST and
    hashing only the |vocab| distinct tokens (×depth) replaces
    |occurrences|·depth md5 calls with |vocab|·depth — the md5s were the
    entire scale cost (1.85 s → 14.1 s at 10× corpus before the rewrite);
    cell values are identical because cnt(r, b) = Σ_{tokens hashing to b}
    count(token) either way.  The token count agg is map-side combined;
    at 100 TB |vocab| ≪ |occurrences| always holds."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(_CM_DEPTH)])).alias("r")
    counts = tokens.groupBy(F.col(token)).agg(F.count("*").cast("long").alias("c"))
    return (
        counts.select(F.col(token), "c", rows)
        .select(
            "c",
            "r",
            F.pmod(
                md5_60(
                    F.concat(
                        F.lit("cm"),
                        F.col("r").cast("string"),
                        F.lit(":"),
                        F.col(token),
                    )
                ),
                F.lit(_CM_WIDTH),
            ).alias("b"),
        )
        .groupBy("r", "b")
        .agg(F.sum("c").cast("long").alias("cnt"))
    )


def _cm_tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")


def _cm_probe(sketch: DataFrame, true_top: DataFrame) -> DataFrame:
    """Estimate each probe token's count: min over the depth rows of its
    bucket's cell — CM guarantees est >= true (overcount only)."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(_CM_DEPTH)])).alias("r")
    probes = true_top.select("token", "true_cnt", rows).select(
        "token",
        "true_cnt",
        "r",
        F.pmod(
            md5_60(
                F.concat(
                    F.lit("cm"), F.col("r").cast("string"), F.lit(":"), F.col("token")
                )
            ),
            F.lit(_CM_WIDTH),
        ).alias("b"),
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("token", "true_cnt")
        .agg(F.min("cnt").cast("long").alias("cm_est"))
        .select(
            "token",
            "true_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("true_cnt")).cast("long").alias("overcount"),
        )
    )


_CM_HASH_IN = "'cm' || CAST(r AS VARCHAR) || ':' || token"
_CM_BUCKET_SQL = f"{md5_60_sql(_CM_HASH_IN)} % {_CM_WIDTH}"

_CM_ORACLE = rf"""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents
    ), tk AS (
        SELECT token FROM toks WHERE token <> ''
    ), rows3 AS (
        SELECT CAST(rr.range AS BIGINT) AS r FROM range(0, {_CM_DEPTH}) rr
    ), cells AS (
        SELECT r, {_CM_BUCKET_SQL} AS b, CAST(count(*) AS BIGINT) AS cnt
        FROM tk CROSS JOIN rows3 GROUP BY r, b
    ), true_top AS (
        SELECT token, CAST(count(*) AS BIGINT) AS true_cnt
        FROM tk GROUP BY token
        ORDER BY true_cnt DESC, token LIMIT {_CM_TOPK}
    ), probes AS (
        SELECT t.token, t.true_cnt, r3.r, {_CM_BUCKET_SQL.replace('token', 't.token')} AS b
        FROM true_top t CROSS JOIN rows3 r3
    )
    SELECT p.token, p.true_cnt,
           CAST(min(c.cnt) AS BIGINT) AS cm_est,
           CAST(min(c.cnt) - p.true_cnt AS BIGINT) AS overcount
    FROM probes p JOIN cells c ON c.r = p.r AND c.b = p.b
    GROUP BY p.token, p.true_cnt
    """


@register(
    "sketch_count_min",
    oracle=_CM_ORACLE,
    tags=("sketch", "count-min", "heavy-hitters"),
)
def q_sketch_count_min(spark, sf_dir):
    """Count-Min sketch (depth 3 × width 16) of the document token stream,
    probed at the true top-10 tokens — the fixed-memory heavy-hitter
    counter beside `sketch_kmv_distinct` (distinct) and `sketch_hll_md5`
    (cardinality): 48 BIGINT cells estimate any token's frequency with
    one-sided error (est ≥ true; `overcount` exposes the collision bias
    the 16-bucket width forces on this vocabulary).

    Fully deterministic — the md5-60 row hashes make cells and estimates
    exact relational quantities, so the whole sketch → probe → min
    pipeline carries a value-hash oracle.  Scale: the sketch is ONE
    grouped count to depth·width rows (map-side combined — the classic
    mergeable-summary shape); probes broadcast the 48-cell sketch."""
    docs = load_table(spark, sf_dir, "documents")
    tk = _cm_tokens(docs)
    sketch = cm_cells(tk)
    true_top = (
        tk.groupBy("token")
        .agg(F.count("*").cast("long").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("token"))
        .limit(_CM_TOPK)
    )
    return _cm_probe(sketch, true_top)


@register(
    "sketch_cm_stream_serve",
    oracle=_CM_ORACLE,
    tags=("sketch", "count-min", "streaming", "incremental"),
)
def q_sketch_cm_stream_serve(spark, sf_dir):
    """INCREMENTAL twin of `sketch_count_min`: documents are ingested in
    three DISJOINT micro-batches (split on pmod(md5_60(doc_id), 3) — the
    count-grid disjointness contract: CM cells merge by grouped SUM, so
    disjoint row sets make the merged sketch equal the one-pass sketch
    bit-for-bit; contrast the KMV store, whose distinct-union merge
    tolerates overlap).  The oracle is the plain one-pass SQL — parity
    proves the store's publish/merge path reconstructs the whole-stream
    sketch."""
    import atexit  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from ..streaming.cm_stream import CmStreamSketch  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    store = tempfile.mkdtemp(prefix="cm_serve_")
    atexit.register(shutil.rmtree, store, ignore_errors=True)
    sk = CmStreamSketch(spark, store)
    split = F.pmod(md5_60(F.col("doc_id").cast("string")), F.lit(3))
    for bid in range(3):
        sk.ingest_batch(docs.filter(split == bid), bid)
    sketch = sk.merged()
    tk = _cm_tokens(docs)
    true_top = (
        tk.groupBy("token")
        .agg(F.count("*").cast("long").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("token"))
        .limit(_CM_TOPK)
    )
    return _cm_probe(sketch, true_top)
