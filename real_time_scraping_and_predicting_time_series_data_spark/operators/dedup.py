"""Deduplication operators for large-scale training-data pipelines
(SURVEY.md §2.8 north-star extensions; no counterpart in the reference —
closest semantic relative is the consecutive-change dedup P2,
``asyncio scraping.py:80``).

Five families, each designed so the expensive step is a key-partitioned
join/agg rather than an O(n²) cross join:

- **exact**      : content hash (sha256) group-by; keep min doc_id.
- **n-gram Jaccard** : shingle-set overlap via explode + equi-join on the
  shingle (inverted index), blocked by a cheap key (``source``) so the join
  fan-out stays bounded at 100 TB.
- **MinHash + LSH** : k universal-hash permutations of one md5-derived
  32-bit shingle hash (``min((aᵢ·h + bᵢ) mod p)`` aggregations); banding →
  candidate buckets → exact-Jaccard verification of candidates only. The
  hash chain is plain integer arithmetic over md5, so the DuckDB oracle
  reproduces the ENTIRE pipeline bit-for-bit (candidates included).
- **SimHash**    : 60-bit fingerprint from md5-derived per-token hashes;
  near-dup = small Hamming distance, candidates via band equality on
  15-bit chunks — fully reproduced by the DuckDB oracle (sign sums, chunk
  banding, Hamming verify).
- **embedding cosine** : near-dup pairs above a cosine threshold, blocked
  by banded sign-random-projection buckets (seeded literal hyperplanes,
  mirrored by the oracle).

Every family is value-hash-checked end to end; banding recall is
additionally property-tested against the exact operators
(tests/test_dedup_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

import math
import os
import random

from ..catalog import ensure_min_partitions, load_table
from ..functions.hashing import M61, md5_60, md5_60_sql, perm61, perm61_sql
from ..session import SHUFFLE_PARTITIONS
from ..functions.vector import as_double, cosine, dot, norm
from ..functions.vector import hamming64
from ..plans.registry import register

__all__ = [
    "exact_dedup",
    "shingles",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_candidates",
    "simhash",
    "simhash_pairs",
    "embedding_dup_pairs",
    "embedding_dup_pairs_banded",
]

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact content hash.

    sha256 group-by: the canonical exact-dedup at scale — single shuffle on
    the 256-bit hash, no full-text comparisons.
    """
    return (
        df.withColumn("content_hash", F.sha2(F.col(text), 256))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# Shingling + exact n-gram Jaccard (inverted-index join, not cross join)
# ---------------------------------------------------------------------------


def word_shingles(words: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles over a PRE-PROJECTED words column.

    r13 optimization (guide §1.2 "don't compute things twice"): callers
    should project ``split(trim(text), '\\s+')`` as its own column first
    and shingle THAT — inlining the split into this expression makes the
    optimizer's CollapseProject/pushdown machinery duplicate the whole
    tokenize chain wherever the shingle expression is referenced
    (measured 2–4× on the shingle stage at sf0.1).  Identical output to
    the old inlined form: same transform order, same array_distinct."""
    if n == 1:
        return F.array_distinct(words)
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.array_distinct(grams)


def split_words(text: Column) -> Column:
    """The canonical whitespace tokenization every shingle consumer shares."""
    return F.split(F.trim(text), r"\s+")


def shingles(text: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles of a whitespace-tokenized text.
    Prefer ``word_shingles`` over a projected ``split_words`` column in
    new code (see its r13 note)."""
    return word_shingles(split_words(text), n)


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    block: str | None = "source",
    n: int = 2,
    threshold: float = 0.2,
    prune_singletons: bool = False,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via an inverted-index self-join.

    explode(shingles) → join on (block, shingle) with id<id → count common
    shingles per pair → Jaccard = common / (|A| + |B| - common). The join is
    keyed on the shingle (plus an optional blocking key), so cost scales with
    Σ df(shingle)² within blocks — bounded, unlike a cross join. At 100 TB
    the blocking key (source, LSH bucket, length band) is what keeps df low.

    Two scale choices: (a) both self-join sides are the *same* plan subtree
    shuffled on the same keys, so Spark materializes the exchange once and
    reuses it (ReusedExchange — verified in tests/test_plans.py), no manual
    materialization needed; (b) the join key is ``xxhash64(shingle)`` —
    8 bytes through the shuffle instead of the shingle string (collision
    odds ~|shingles|²/2⁶⁴, deterministic).

    ``max_df`` (the stop-gram cap, r9): drop shingles whose in-block
    document frequency exceeds the cap BEFORE the self-join, and size each
    doc's set over the survivors — Jaccard over the stop-gram-filtered
    shingle profile.  This is the skew escalation for the low-threshold
    clustering shape where prefix filtering can't prune (prefix length →
    |set| as tau → 0): a boilerplate shingle shared by df docs contributes
    df² candidate rows — one straggler task and a quadratic output at
    corpus scale — while carrying no dedup signal (production corpus-dedup
    pipelines drop exactly these).  The cap collapses that term to zero;
    the oracle applies the identical cap so the filtered semantics stay
    value-hash-checked.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(block).alias("blk")] if block else [F.lit(0).alias("blk")] ),
        split_words(F.col(text)).alias("_w"),
    )
    base = toks.select("id", "blk", word_shingles(F.col("_w"), n).alias("sh"))
    return _jaccard_core(base, threshold, prune_singletons, max_df=max_df)


def _jaccard_core(
    base: DataFrame,
    threshold: float,
    prune_singletons: bool,
    max_df: int | None = None,
) -> DataFrame:
    """Shared inverted-index Jaccard machinery over (id, blk, sh) rows —
    used by the word-shingle and character-shingle pair generators.

    r13 optimization (guide §1.2, §3.3 "materialise an intermediate"):
    the shingle-set relation is lazily checkpointed BEFORE the explode.
    Inlined under a Generate, the (tokenize → gram → distinct) chain gets
    duplicated by optimizer pushdown (e.g. the inferred ``size(sh) > 0``
    filter re-derives it below the repartition, on the un-spread scan) —
    measured 4× on the edge build at sf0.1 (5.7 s → 1.3 s, identical
    pairs).  The checkpoint is one doc-level pass, ~|corpus| text bytes
    cached to local disk — the same persisted-intermediate trade the
    MinHash pipeline already documents."""
    base = base.withColumn("set_size", F.size("sh")).localCheckpoint(eager=False)

    inv = base.select("id", "blk", "set_size", F.explode("sh").alias("_sh")).select(
        "id", "blk", "set_size", F.xxhash64("_sh").alias("shingle")
    )
    if max_df is not None:
        # Stop-gram cap (r9, reworked from two window sorts): the hot set
        # — shingles with df > cap — is SMALL BY DEFINITION (each member
        # needs > cap distinct docs, so |hot| < |postings|/cap), so it
        # aggregates through a map-side-combined groupBy and BROADCASTS
        # into an anti-join: the posting list itself is never sorted or
        # exchanged for the filter.  Survivor set sizes are a grouped
        # count joined back — AQE broadcasts the doc-level side locally;
        # at cluster scale it's a plain shuffle join on the id key.
        hot = (
            inv.groupBy("blk", "shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("blk", "shingle")
        )
        inv = inv.join(F.broadcast(hot), ["blk", "shingle"], "left_anti")
        sizes = inv.groupBy("blk", "id").agg(F.count("*").alias("_sz"))
        inv = (
            inv.drop("set_size")
            .join(sizes, ["blk", "id"])
            .withColumnRenamed("_sz", "set_size")
        )
    if prune_singletons:
        # A shingle occurring once in its block can't appear in any pair, so
        # drop it BEFORE the self-join (~60% of this corpus's 3-gram
        # postings). The df count partitions by the same (blk, shingle) keys
        # a sort-merge pair join shuffles on, so at cluster scale the filter
        # rides the join's exchange; locally AQE broadcasts the join and the
        # window would be a pure extra shuffle — hence opt-in. set_size
        # keeps counting ALL shingles; only n_common terms need df >= 2.
        wdf = Window.partitionBy("blk", "shingle")
        inv = inv.withColumn("_df", F.count("*").over(wdf)).filter(F.col("_df") >= 2).drop("_df")
    a = inv.select(
        F.col("id").alias("id_a"), "blk", F.col("set_size").alias("size_a"), "shingle"
    )
    b = inv.select(
        F.col("id").alias("id_b"), "blk", F.col("set_size").alias("size_b"), "shingle"
    )
    common = (
        a.join(b, ["blk", "shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count("*").alias("n_common"))
    )
    jac = common.withColumn(
        "jaccard",
        F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
    )
    return jac.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingle_sets(df: DataFrame, id_col: str = "doc_id", text: str = "text", n: int = 2) -> DataFrame:
    """(id, sh: array<string>) shingle sets — the shared intermediate of the
    MinHash pipeline. Callers that use it more than once (signatures +
    candidate verification) should materialize it (``localCheckpoint`` /
    persist / a parquet stage at cluster scale) instead of recomputing the
    scan→tokenize→shingle subtree per consumer."""
    toks = df.select(F.col(id_col).alias("id"), split_words(F.col(text)).alias("_w"))
    return toks.select("id", word_shingles(F.col("_w"), n).alias("sh"))


# Universal-hash MinHash permutations: perm_i(h) = (a_i·h + b_i) mod p over
# a single md5-derived 60-BIT shingle hash (functions/hashing.py): a 32-bit
# base hash has birthday collisions among distinct shingles every ~2^16
# values — routine at 100 TB — which silently inflates Jaccard estimates.
# p = 2^61-1 with the overflow-safe M61 modmul keeps everything BIGINT on
# both engines; coefficients come from a seeded PRNG at import time and are
# inlined into BOTH the Spark expressions and the DuckDB oracle SQL, so
# signatures — and therefore LSH candidates — are bit-identical.
_MH_SEED = 20260813
_MH_PRIME = M61


def _mh_coeffs(num_perm: int, seed: int = _MH_SEED) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 30), rng.randrange(0, 1 << 30)) for _ in range(num_perm)]


def minhash_signatures(
    sets: DataFrame, num_perm: int = 16
) -> DataFrame:
    """k-permutation MinHash signature over ``shingle_sets`` output:
    sig[i] = min over shingles of perm_i(shingle). One explode + one grouped
    agg with k min() columns — fully JVM-side, linear in shingle count. The
    shingle string is md5-hashed ONCE (first 15 hex digits → 60-bit int);
    permutations are overflow-safe M61 integer arithmetic on that value
    (functions/hashing.py), reproducible in the DuckDB oracle."""
    ex = sets.select("id", F.explode("sh").alias("shingle")).withColumn(
        "h", md5_60("shingle")
    )
    mins = [
        F.min(perm61(a, b, F.col("h"))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_mh_coeffs(num_perm))
    ]
    return ex.groupBy("id").agg(*mins)


def minhash_candidates(
    sigs: DataFrame, num_perm: int = 16, bands: int = 4
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_perm/bands`` rows; docs sharing any full band become candidate
    pairs. Bucket join on (band_idx, band_value_tuple) — the classic
    sub-quadratic candidate generation. The bucket key is the
    concatenated band VALUES (not a re-hash): equal keys iff equal band
    tuples, so the candidate set is exactly reproducible in SQL and free
    of bucket-collision false candidates; the key stays ≤ ~44 chars for
    4 rows/band, comparable shuffle width to a 64-bit hash."""
    rows_per_band = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(
                    "-", *[F.col(f"mh_{bi * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    exploded = sigs.select("id", F.explode(band_structs).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket")
    )
    a = exploded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = exploded.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


# 60-bit SimHash: the token hash is the first 15 hex digits of md5 —
# bit-reproducible in DuckDB (('0x' || substr(md5(tok), 1, 15))::BIGINT),
# so the fingerprints, the chunk-band candidates and the Hamming verify all
# carry a full oracle. 60 = 4·15 keeps the default 4-band chunking exact.
_SIMHASH_BITS = 60


def simhash(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """60-bit SimHash: per token, an md5-derived hash; fingerprint bit i is
    the sign of Σ_tokens (±1 by token-hash bit i). Expressed as explode +
    60 conditional sums + bit reassembly — one grouped aggregation, all
    codegen, reproducible cross-engine.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.trim(F.col(text)), r"\s+")).alias("tok")
    ).withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long"))
    sums = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{i}")
        for i in range(_SIMHASH_BITS)
    ]
    agg = toks.groupBy("id").agg(*sums)
    fp = None
    for i in range(_SIMHASH_BITS):
        bit = F.when(F.col(f"s_{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return agg.select("id", fp.alias("simhash"))


def simhash_pairs(fps: DataFrame, max_hamming: int = 12, bands: int = 4) -> DataFrame:
    """Near-dup candidates: docs sharing any (60/bands)-bit chunk of the
    fingerprint, verified by exact Hamming distance ≤ ``max_hamming``.

    Pigeonhole guarantee: a pair at Hamming distance < ``bands`` always
    shares at least one chunk (its differing bits can't touch every chunk;
    bits left uncovered when bands ∤ 60 only weaken precision, never this
    recall bound), so recall is 1.0 up to distance bands-1 and
    probabilistic beyond — raise ``bands`` (smaller chunks) to trade
    candidate volume for recall.
    """
    width = _SIMHASH_BITS // bands
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), bi * width).bitwiseAND(F.lit(mask)).alias(
                    "chunk"
                ),
            )
            for bi in range(bands)
        ]
    )
    ex = fps.select("id", "simhash", F.explode(chunks).alias("b")).select(
        "id", "simhash", F.col("b.band").alias("band"), F.col("b.chunk").alias("chunk")
    )
    a = ex.select(F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), "band", "chunk")
    b = ex.select(F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), "band", "chunk")
    cand = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    block: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate vectors: pairs with cosine ≥ threshold. With a blocking
    column (LSH bucket / IVF cell / label) the join is per-block; without,
    it is a genuine cross join — only acceptable for small n or as the
    verification step after candidate generation.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec)).alias("v"),
        *([F.col(block).alias("blk")] if block else [F.lit(0).alias("blk")]),
    )
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "blk")
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "blk")
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# Banded sign-random-projection blocking.  The hyperplane signs are fixed
# pseudo-random ±1 constants generated from a seeded PRNG at import time and
# inlined as literals into BOTH the Spark expression and the DuckDB oracle
# SQL, so the blocking (and therefore the exact result set) is reproducible
# on both engines — unlike the xxhash64-based SRP in similarity.py, which
# has no oracle twin.
_SRP_SEED = 20260813
_SRP_DIM = 64


def _srp_signs(bands: int, bits: int, dim: int = _SRP_DIM, seed: int = _SRP_SEED):
    """±1 hyperplane components, signs[band][bit][component]."""
    rng = random.Random(seed)
    return [
        [[1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)] for _ in range(bits)]
        for _ in range(bands)
    ]


def embedding_dup_pairs_banded(
    df: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    threshold: float = 0.95,
    bands: int = 12,
    bits: int = 3,
    dim: int = _SRP_DIM,
    seed: int = _SRP_SEED,
) -> DataFrame:
    """Embedding near-dup pairs via banded SRP blocking + exact-cosine verify.

    Candidates = pairs agreeing on all ``bits`` hyperplane signs of any of
    the ``bands`` bands — an equi-join on (band, bucket), never a cross
    join.  Exact cosine is computed only for candidates.  A pair at cosine c
    survives one band with prob (1 - acos(c)/π)^bits, so recall is
    1-(1-p^bits)^bands: 0.96 theoretical / 0.98 measured at c=0.4 for
    (12 bands, 3 bits) — trimmed from 16 bands in r3 for 25% less
    candidate volume while holding the ≥0.95 recall contract.  At a
    production near-dup threshold (c≥0.95, p≈0.9) the right knobs are wider
    bands (16+ bits → 2^16 buckets, ~4000× candidate reduction); the test
    corpus's deliberately weak 0.4 threshold needs the shallow setting.

    Constant-factor choices (measured at sf0.1):

    - **Band signatures materialized once.** The 48 hyperplane-sign folds
      are computed in one pass and ``localCheckpoint``-ed; both self-join
      sides and the dedup read the 32k-row materialization instead of
      re-deriving the buckets (and AQE sees an exact size, keeping the
      band join broadcast).  An alternative "emit each pair only from its
      first colliding band" design that drops the DISTINCT entirely was
      benchmarked SLOWER: the per-row ``zip_with`` signature comparison on
      the 8M-row join output costs more than the narrow 16-byte/row
      distinct exchange it saves.
    - **Pre-normalized vectors, joined back for candidates only.** ``v/‖v‖``
      is computed once per *vector* (n rows), so per-candidate verification
      is a single dot-product fold rather than dot + two norms (3 HOF
      passes → 1).  The oracle's ``list_cosine_similarity`` and this dot
      agree to well past the round-6 canonicalization (both are exact
      cosine up to fp rounding).
    """
    signs = _srp_signs(bands, bits, dim, seed)
    # r13: spread the signature build — the 36 per-row sign folds
    # otherwise run on the scan's single partition at harness scale
    # (ensure_min_partitions is a no-op once the input splits naturally).
    base = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"), as_double(F.col(vec)).alias("v")
    )
    # Hoist the norm into its own projected column: referencing norm(v)
    # inside the transform lambda re-evaluates the O(dim) fold per ELEMENT
    # (O(dim²)/row); as a sibling column it is computed once per row.
    base = base.withColumn("nrm", norm(F.col("v")))
    base = base.select("id", F.transform("v", lambda x: x / F.col("nrm")).alias("nv"))
    buckets = []
    for t in range(bands):
        bucket = F.lit(0)
        for i in range(bits):
            plane = F.array(*[F.lit(s) for s in signs[t][i]])
            # sign(dot(v, p)) == sign(dot(v/|v|, p)) — bucket unchanged.
            bucket = bucket + F.when(dot(F.col("nv"), plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        buckets.append(bucket)
    # nv is checkpointed WITH the signatures: the candidate join-backs read
    # the materialized normalized vectors instead of re-deriving
    # scan→cast→norm→divide once per join side.
    sig = base.select("id", "nv", F.array(*buckets).alias("sig")).localCheckpoint(eager=True)
    bk = sig.select("id", F.posexplode("sig").alias("band", "bucket"))
    a = bk.select(F.col("id").alias("id_a"), "band", "bucket")
    b = bk.select(F.col("id").alias("id_b"), "band", "bucket")
    # r13 (guide §2.5, the `_exploding_cell_join` pattern): bands·2^bits
    # distinct join keys under-fill the partitions and AQE sizes the
    # exploding self-join from its tiny map bytes — deterministic salt +
    # explicit-count repartition keep the Σ|bucket|² candidate stage at
    # full parallelism; every pair still meets once per shared band
    # (the b-side row carries ONE salt, exactly one a-side replica
    # matches), and the DISTINCT collapses multi-band hits as before.
    p = SHUFFLE_PARTITIONS
    salt_n = max(1, min(4 * p, (20 * p) // (bands * (1 << bits))))
    if salt_n > 1:
        b = b.withColumn("_salt", F.pmod(F.xxhash64("id_b"), F.lit(salt_n)).cast("int"))
        a = a.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
        keys = ["band", "bucket", "_salt"]
    else:
        keys = ["band", "bucket"]
    cand = (
        a.repartition(p, *[F.col(k) for k in keys])
        .join(b.repartition(p, *[F.col(k) for k in keys]).hint("shuffle_hash"), keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = sig.select(F.col("id").alias("id_a"), F.col("nv").alias("nv_a"))
    vb = sig.select(F.col("id").alias("id_b"), F.col("nv").alias("nv_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", dot(F.col("nv_a"), F.col("nv_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def _srp_banded_oracle(threshold: float, bands: int = 12, bits: int = 3) -> str:
    """DuckDB twin of ``embedding_dup_pairs_banded``: same sign constants,
    same band/bucket blocking, same exact-cosine verification."""
    signs = _srp_signs(bands, bits)
    structs = []
    for t in range(bands):
        terms = []
        for i in range(bits):
            arr = "[" + ",".join(str(s) for s in signs[t][i]) + "]"
            terms.append(f"(CASE WHEN list_dot_product(v, {arr}) > 0 THEN {1 << i} ELSE 0 END)")
        structs.append("{'band': %d, 'bucket': %s}" % (t, " + ".join(terms)))
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bk AS (SELECT vec_id, unnest([{", ".join(structs)}]) AS s FROM e),
    bb AS (SELECT vec_id, s.band AS band, s.bucket AS bucket FROM bk),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bb a JOIN bb b
          ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
    FROM cand c
    JOIN e ea ON ea.vec_id = c.id_a
    JOIN e eb ON eb.vec_id = c.id_b
    WHERE list_cosine_similarity(ea.v, eb.v) >= {threshold}
    """


# ---------------------------------------------------------------------------
# Duplicate clustering: connected components over near-dup pairs
# ---------------------------------------------------------------------------

# Same knob (and env var) as operators/graph.py: label vectors in the CC
# loop are node-bounded relations — broadcast-hinted by default so the
# pinned edge partitioning stays exchange-free across rounds; opt out at
# billion-node scale for AQE shuffle joins.
_BROADCAST_NODES = os.environ.get("SPARK_GRAFT_GRAPH_BROADCAST_NODES", "1") == "1"


def _bcast_nodes(df: DataFrame) -> DataFrame:
    return F.broadcast(df) if _BROADCAST_NODES else df


def connected_components(
    edges: DataFrame, nodes: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Connected components by iterative min-label propagation: every node
    starts labeled with itself; each round each node takes the min of its
    own label and its neighbors' labels, until a fixpoint.

    Scale shape: each round is one equi-join (edges × labels, keyed on the
    node id) plus one grouped min — the standard distributed CC loop
    (GraphX/pregel-style; large-star/small-star would cut rounds from
    O(diameter) to O(log n) if chains were long, but near-dup components
    are shallow).  Each round's labels are ``localCheckpoint``-ed so the
    lineage (and thus the replay cost of a lost partition) stays constant;
    convergence is detected by counting changed labels — a scalar per
    round, not a collect.

    ``edges``: (src, dst) pairs.  ``nodes``: one column of node ids;
    isolated nodes come out labeled with themselves.

    r13 (optimization, guide §1.2 "fewer passes"): two actions per round
    became ONE — the per-round labels are lazy-checkpointed and the
    fixpoint probe is a single ``sum(label)`` aggregate whose job also
    materializes the checkpoint.  Min-label propagation only ever lowers a
    label, so the label sum (exact DECIMAL(38,0) — no overflow at any id
    range) is strictly decreasing until the fixpoint and constant at it;
    the old probe was a second job PLUS a node-keyed shuffle join of old
    vs new labels every round.  The loop also runs only over
    EDGE-TOUCHED nodes (the only ones propagation can relabel); isolated
    nodes join back labeled with themselves in the final assembly — at
    corpus scale the in-loop relation shrinks from |corpus| to |docs in
    near-dup pairs|.

    r13 session 2 (guide §2.4, the iterative-graph pattern): the
    symmetric edge relation is pinned hash-partitioned by ``dst`` (the
    per-round groupBy key) and the label vector joins broadcast-hinted,
    so each round is ONE on-partition stage — prop-min per dst, merged
    into the old labels by a node-keyed (still dst-partitioned) join —
    instead of a shuffled join + a union-wide exchange.  The new-label
    arithmetic ``least(old, min incoming)`` equals the old
    ``min over (self ∪ neighbors)`` exactly.  Label vectors are
    node-bounded relations: the broadcast hint follows the same
    parameterised opt-out as the graph module
    (SPARK_GRAFT_GRAPH_BROADCAST_NODES=0 → AQE shuffle joins and the
    pin key flips to the join key ``src``).
    """
    node_col = nodes.columns[0]
    # Lazy-checkpoint the directed edges BEFORE mirroring: the union's two
    # branches would otherwise each re-execute the (possibly expensive)
    # upstream once.
    edges = edges.select(F.col("src"), F.col("dst")).localCheckpoint(eager=False)
    pin_key = "dst" if _BROADCAST_NODES else "src"
    sym = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(F.col(pin_key))
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col(pin_key).alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    prev_sum = object()  # sentinel: no sum observed yet
    for _ in range(max_iter):
        prop = (
            sym.join(_bcast_nodes(labels.withColumnRenamed("node", "src")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("_pmin"))
        )
        new = (
            labels.withColumnRenamed("label", "_old")
            .join(prop, "node", "left")
            .select(
                "node",
                F.least(F.col("_old"), F.coalesce("_pmin", F.col("_old"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=False)
        )
        # ONE action: materializes the round's checkpoint AND returns the
        # fixpoint probe (None only when the edge set is empty).
        cur_sum = new.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()[0]
        labels = new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return (
        nodes.select(F.col(node_col).alias("node"))
        .join(labels.withColumnRenamed("label", "_lbl"), "node", "left")
        .select("node", F.coalesce("_lbl", F.col("node")).alias("label"))
    )


def connected_components_star(
    edges: DataFrame, nodes: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014 — public) — the documented escalation of
    :func:`connected_components` when component DIAMETER is large:
    min-label propagation needs O(diameter) rounds (a 1M-node chain is 1M
    joins), star contraction needs O(log n) because every round re-points
    nodes at their neighborhood minimum, halving tree heights.

    Per round, with Γ(u) = symmetric neighbors of u and
    m(u) = min(Γ(u) ∪ {u}):

    - large-star: emit (v, m(u)) for every v ∈ Γ(u) with v > u;
    - small-star: emit (v, m(u)) for every v ∈ Γ(u) with v ≤ u... plus
      (u, m(u)) — implemented as edges from m(u) to each non-min small
      neighbor and u itself.

    Each half-round is ONE grouped min (m per node) joined back to the
    neighbor list — two shuffles — and the edge multiset is deduplicated
    to keep rounds bounded by the current edge count.  Convergence =
    edge set unchanged (count + per-column sums — a 3-scalar aggregate,
    no collect); at the fixpoint every surviving edge points a node at
    its component minimum.  Labels: nodes left-join the star edges
    (isolated nodes label themselves).  Output schema matches
    :func:`connected_components` exactly: (node, label)."""
    node_col = nodes.columns[0]
    # r13 (optimization, guide §1.2): every checkpoint in this loop is LAZY
    # and the per-round ``sig`` aggregate is the single action that
    # materializes both half-rounds' checkpoints — one job per round where
    # there were three (2 eager checkpoint jobs + the sig job).  Exchange
    # reuse keeps the twice-consumed inner star single-computed (its plan
    # ends in a distinct's Exchange).
    cur = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def sig(e: DataFrame) -> tuple:
        # Fixpoint detection without a collect: count + an order-invariant
        # content hash (sum of per-edge xxhash64) — a 2-scalar aggregate.
        r = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (r.n, r.h)

    def star(e: DataFrame, large: bool) -> DataFrame:
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least("_mv", "u").alias("m"))
        )
        j = sym.join(m, "u")
        if large:
            out = j.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("x"), F.col("m")
            )
        else:
            out = j.filter(F.col("v") <= F.col("u")).select(
                F.col("v").alias("x"), F.col("m")
            ).union(m.select(F.col("u").alias("x"), F.col("m")))
        return (
            out.filter(F.col("x") != F.col("m"))
            .select(F.least("x", "m").alias("a"), F.greatest("x", "m").alias("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )

    prev = sig(cur)
    converged = False
    for _ in range(max_iter):
        cur = star(star(cur, large=True), large=False)
        now = sig(cur)
        if now == prev:
            converged = True
            break
        prev = now
    if not converged:
        # Star contraction converges in O(log n) rounds, so exhausting
        # max_iter means the caller's bound was too small for the graph —
        # the labels below may NOT be component minima.  An exact operator
        # must not silently serve approximate output.
        import warnings  # noqa: PLC0415

        warnings.warn(
            f"connected_components_star: edge-set fixpoint not reached "
            f"within max_iter={max_iter}; labels may not be component "
            f"minima — raise max_iter (O(log n) rounds suffice)",
            RuntimeWarning,
            stacklevel=2,
        )
    labels = (
        nodes.select(F.col(node_col).alias("node"))
        .join(cur.select(F.col("b").alias("node"), F.col("a").alias("_lbl")), "node", "left")
        .groupBy("node")
        .agg(F.min("_lbl").alias("_lbl"))
        .select("node", F.coalesce("_lbl", "node").alias("label"))
    )
    return labels


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_hash",
    oracle="""
    SELECT sha256(text) AS content_hash,
           min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
    tags=("dedup", "exact"),
)
def q_dedup_exact(spark, sf_dir):
    """Exact content-hash dedup with representative selection."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


@register(
    "dedup_exact_survivors",
    oracle="""
    SELECT d.doc_id, d.source FROM documents d
    JOIN (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text)) k
      ON d.doc_id = k.keep_id
    """,
    tags=("dedup", "exact"),
)
def q_dedup_exact_survivors(spark, sf_dir):
    """Exact dedup, survivor rows (join back to keep full records)."""
    docs = load_table(spark, sf_dir, "documents")
    keep = (
        docs.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("keep_id"))
    ).select("keep_id")
    return docs.join(keep, docs.doc_id == keep.keep_id, "left_semi").select("doc_id", "source")


@register(
    "dedup_jaccard_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id, source,
               list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                              FOR i IN range(1, len(words) - 1)]) AS grams
        FROM toks
    ), sized AS (
        SELECT doc_id, source, grams, len(grams) AS set_size FROM sh
    ), inv AS (
        SELECT doc_id, source, set_size, unnest(grams) AS shingle FROM sized
    ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.set_size AS size_a, b.set_size AS size_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM inv a JOIN inv b ON a.source = b.source AND a.shingle = b.shingle
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, n_common,
           round(n_common / (size_a + size_b - n_common), 9) AS jaccard
    FROM common
    WHERE n_common / (size_a + size_b - n_common) >= 0.05
    """,
    tags=("dedup", "jaccard"),
)
def q_dedup_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard pairs (source-blocked inverted-index join).

    3-grams (not 2-grams) keep per-shingle document frequency low on this
    small-vocabulary corpus, bounding the Σ df² join fan-out — shingle
    width is THE knob that keeps the exact op sub-quadratic; MinHash-LSH
    (dedup_minhash_pairs) is the path when even that is too hot."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    out = jaccard_pairs(docs, block="source", n=3, threshold=0.05)
    return out.select("id_a", "id_b", "n_common", F.round("jaccard", 9).alias("jaccard"))


def verify_candidates_jaccard(cands: DataFrame, sets: DataFrame) -> DataFrame:
    """Exact Jaccard computed ONLY for candidate pairs: two equi-joins fetch
    the shingle sets, ``array_intersect`` scores each pair. Cost is linear
    in |candidates| — this is the LSH contract (never score all O(n²)
    pairs)."""
    a = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "id_a").join(b, "id_b")
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - common
    return joined.select("id_a", "id_b", (common / union).alias("jaccard"))


def _minhash_oracle(num_perm: int = 16, bands: int = 4) -> str:
    """DuckDB twin of the full MinHash-LSH pipeline: same md5-derived base
    hash, same inlined universal-hash coefficients, same band-value-tuple
    buckets, same exact-Jaccard verification — the candidate SET itself is
    hash-checked, not just the survivors."""
    coeffs = _mh_coeffs(num_perm)
    rows = num_perm // bands
    min_cols = ",\n               ".join(
        f"min({perm61_sql(a, b, 'h')}) AS mh_{i}" for i, (a, b) in enumerate(coeffs)
    )
    band_selects = "\n        UNION ALL ".join(
        "SELECT doc_id, %d AS band, concat_ws('-', %s) AS bucket FROM sig"
        % (bi, ", ".join(f"mh_{bi * rows + r}" for r in range(rows)))
        for bi in range(bands)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
    ), sh AS (
        SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1]
                                      FOR i IN range(1, len(words))]) AS grams
        FROM toks
    ), ex AS (
        SELECT doc_id, unnest(grams) AS shingle FROM sh
    ), hh AS (
        SELECT doc_id, {md5_60_sql('shingle')} AS h FROM ex
    ), sig AS (
        SELECT doc_id, {min_cols}
        FROM hh GROUP BY doc_id
    ), bk AS (
        {band_selects}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bk a JOIN bk b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(sa.grams, sb.grams)) /
                 (len(sa.grams) + len(sb.grams) - len(list_intersect(sa.grams, sb.grams))),
                 9) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    """


@register("dedup_minhash_pairs", oracle=_minhash_oracle(), tags=("dedup", "minhash", "lsh"))
def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH candidate pairs verified by exact Jaccard on candidates
    only. Fully oracle-checked: the md5/universal-hash permutation chain
    and the band-value buckets are bit-reproducible in DuckDB, so the
    driver hashes the exact candidate pipeline, not a weaker rows-only
    shape; recall vs exact Jaccard is additionally property-tested. The
    shingle sets are materialized once (localCheckpoint) and shared by the
    signature and verification stages — at cluster scale this is a
    persisted intermediate table."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    sets = shingle_sets(docs, n=2).localCheckpoint(eager=False)
    sigs = minhash_signatures(sets, num_perm=16).localCheckpoint(eager=False)
    cands = minhash_candidates(sigs, num_perm=16, bands=4)
    verified = verify_candidates_jaccard(cands, sets)
    return verified.select("id_a", "id_b", F.round("jaccard", 9).alias("jaccard"))


def _simhash_oracle(max_hamming: int = 20, bands: int = 4) -> str:
    """DuckDB twin of the SimHash pipeline: same md5-derived token hash,
    same 60 sign sums, same chunk banding, same Hamming verification."""
    width = _SIMHASH_BITS // bands
    mask = (1 << width) - 1
    s_cols = ",\n               ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{i}"
        for i in range(_SIMHASH_BITS)
    )
    fp_terms = " + ".join(
        f"(CASE WHEN s_{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(_SIMHASH_BITS)
    )
    chunk_selects = "\n        UNION ALL ".join(
        f"SELECT id, fp, {bi} AS band, (fp >> {bi * width}) & {mask} AS chunk FROM fps"
        for bi in range(bands)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ), hh AS (
        SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ), sums AS (
        SELECT id, {s_cols}
        FROM hh GROUP BY id
    ), fps AS (
        SELECT id, CAST({fp_terms} AS BIGINT) AS fp FROM sums
    ), ex AS (
        {chunk_selects}
    ), cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.fp AS fp_a, b.fp AS fp_b
        FROM ex a JOIN ex b ON a.band = b.band AND a.chunk = b.chunk AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= {max_hamming}
    """


@register("dedup_simhash_pairs", oracle=_simhash_oracle(), tags=("dedup", "simhash"))
def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs at Hamming ≤ 20. Fully oracle-checked: the
    md5-derived 60-bit fingerprints make the whole pipeline — sign sums,
    chunk banding, Hamming verify — bit-reproducible in DuckDB; banding
    recall is additionally property-tested."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    fps = simhash(docs)
    out = simhash_pairs(fps, max_hamming=20, bands=4)
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "dedup_embedding_cosine",
    oracle=_srp_banded_oracle(threshold=0.4),
    tags=("dedup", "embedding"),
)
def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs, SRP-band-blocked: candidate pairs
    come from an equi-join on (band, bucket) — no cross join at any scale —
    then exact cosine verifies candidates only.  The oracle replicates the
    identical blocking from the same inlined hyperplane constants, so the
    result set (not just the survivors) is hash-checked.  Threshold 0.4 is
    tuned to the random test vectors; recall vs the unblocked all-pairs
    ground truth is property-tested (tests/test_dedup_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = embedding_dup_pairs_banded(emb, threshold=0.4)
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


_CLUSTERS_ORACLE = """
    WITH RECURSIVE toks AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id, source,
               list_distinct([words[i] || ' ' || words[i+1]
                              FOR i IN range(1, len(words))]) AS grams
        FROM toks
    ), sized AS (
        SELECT doc_id, source, grams, len(grams) AS set_size FROM sh
    ), inv AS (
        SELECT doc_id, source, set_size, unnest(grams) AS shingle FROM sized
    ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.set_size AS size_a, b.set_size AS size_b,
               count(*) AS n_common
        FROM inv a JOIN inv b ON a.source = b.source AND a.shingle = b.shingle
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ), pairs AS (
        SELECT id_a, id_b FROM common
        WHERE n_common / (size_a + size_b - n_common) >= 0.05
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
    """


@register(
    "dedup_duplicate_clusters",
    oracle=_CLUSTERS_ORACLE,
    tags=("dedup", "clustering", "graph"),
)
def q_dedup_clusters(spark, sf_dir):
    """Duplicate clustering: 2-gram Jaccard pairs (threshold 0.05) as edges,
    connected components labels every document with the minimum doc_id of
    its near-dup cluster (isolated docs label themselves).  This is the
    canonical corpus-dedup shape — pairwise near-dup detection alone can't
    pick survivors when dup relations chain (A~B, B~C but A!~C); the
    component label is the group-by key for survivor selection.

    Oracle: DuckDB recursive CTE computing min reachable id per node over
    the same symmetric edge set — an independent CC formulation (transitive
    closure) vs Spark's iterative label propagation."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    edges = jaccard_pairs(docs, block="source", n=2, threshold=0.05).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    labels = connected_components(edges, docs.select("doc_id"))
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


@register(
    "dedup_clusters_star",
    oracle=_CLUSTERS_ORACLE,
    tags=("dedup", "clustering", "graph", "logstar"),
)
def q_dedup_clusters_star(spark, sf_dir):
    """`dedup_duplicate_clusters` computed by the LARGE-STAR/SMALL-STAR
    contraction (`connected_components_star`) instead of min-label
    propagation — identical edges, identical labels, same recursive-CTE
    oracle, but O(log n) rounds instead of O(diameter): the escalation
    the min-label docstring promises for graphs whose near-dup relations
    chain (long paraphrase chains, crawl mirror cascades).  At 100 TB
    the difference is 20 joins vs potentially thousands on a
    high-diameter component; on this corpus both converge fast and the
    equality of the two algorithms' outputs is itself driver-checked
    (same oracle)."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    edges = jaccard_pairs(docs, block="source", n=2, threshold=0.05).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    labels = connected_components_star(edges, docs.select("doc_id"))
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


@register(
    "corpus_split_leakage",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id, source,
               list_distinct([words[i] || ' ' || words[i+1]
                              FOR i IN range(1, len(words))]) AS grams
        FROM toks
    ), sized AS (
        SELECT doc_id, source, grams, len(grams) AS set_size FROM sh
    ), inv AS (
        SELECT doc_id, source, set_size, unnest(grams) AS shingle FROM sized
    ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.set_size AS size_a, b.set_size AS size_b,
               count(*) AS n_common
        FROM inv a JOIN inv b ON a.source = b.source AND a.shingle = b.shingle
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ), pairs AS (
        SELECT id_a, id_b,
               n_common / (size_a + size_b - n_common) AS jaccard
        FROM common
        WHERE n_common / (size_a + size_b - n_common) >= 0.05
    )
    SELECT id_a, id_b, round(jaccard, 6) AS jaccard,
           CASE WHEN ('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 15))::BIGINT % 10 >= 8
                THEN 'test' ELSE 'train' END AS split_a,
           CASE WHEN ('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 15))::BIGINT % 10 >= 8
                THEN 'test' ELSE 'train' END AS split_b,
           (('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 15))::BIGINT % 10 >= 8)
               <> (('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 15))::BIGINT % 10 >= 8)
               AS leak
    FROM pairs
    """,
    tags=("corpus", "dedup", "split", "leakage", "eval"),
)
def q_corpus_split_leakage(spark, sf_dir):
    """Train/test split LEAKAGE audit — the eval-integrity check every
    training pipeline needs before trusting held-out metrics: near-dup
    document pairs (2-gram Jaccard ≥ 0.05, the clustering edge set) are
    labeled with each side's deterministic split assignment (md5-60 of
    the doc id, % 10: buckets 8-9 = the 20% test split — the same
    cross-engine keyed-hash convention as the deterministic shuffle), and
    any pair straddling the boundary is a leak: its test member is a
    near-copy of a training document, so eval loss there measures
    memorization, not generalization.  The production fix is to split by
    CLUSTER id (dedup_duplicate_clusters) instead of doc id; this audit
    is what tells you that's needed and how bad the naive split is.
    Scale shape: the pair relation is the existing Σdf²-bounded
    inverted-index join; the split labels are per-row hash projections —
    no new shuffles beyond the pairs themselves."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_pairs(docs, block="source", n=2, threshold=0.05)

    def bucket(c: str) -> F.Column:
        return md5_60(F.col(c).cast("string")) % 10 >= 8

    return pairs.select(
        "id_a",
        "id_b",
        F.round("jaccard", 6).alias("jaccard"),
        F.when(bucket("id_a"), "test").otherwise("train").alias("split_a"),
        F.when(bucket("id_b"), "test").otherwise("train").alias("split_b"),
        (bucket("id_a") != bucket("id_b")).alias("leak"),
    )


@register(
    "corpus_cluster_split",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id, source,
               list_distinct([words[i] || ' ' || words[i+1]
                              FOR i IN range(1, len(words))]) AS grams
        FROM toks
    ), sized AS (
        SELECT doc_id, source, grams, len(grams) AS set_size FROM sh
    ), inv AS (
        SELECT doc_id, source, set_size, unnest(grams) AS shingle FROM sized
    ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.set_size AS size_a, b.set_size AS size_b,
               count(*) AS n_common
        FROM inv a JOIN inv b ON a.source = b.source AND a.shingle = b.shingle
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ), pairs AS (
        SELECT id_a, id_b FROM common
        WHERE n_common / (size_a + size_b - n_common) >= 0.05
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ), clusters AS (
        SELECT node AS doc_id, min(label) AS cluster_id
        FROM reach GROUP BY node
    ), assigned AS (
        SELECT doc_id, cluster_id,
               CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT
                         % 10 >= 8
                    THEN 'test' ELSE 'train' END AS split
        FROM clusters
    ), leaks AS (
        SELECT count(*) AS n FROM pairs p
        JOIN assigned a ON a.doc_id = p.id_a
        JOIN assigned b ON b.doc_id = p.id_b
        WHERE a.split <> b.split
    )
    SELECT a.split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT a.cluster_id) AS BIGINT) AS n_clusters,
           CAST(max(l.n) AS BIGINT) AS leaked_pairs
    FROM assigned a CROSS JOIN leaks l
    GROUP BY a.split
    """,
    tags=("corpus", "dedup", "split", "leakage", "eval"),
)
def q_corpus_cluster_split(spark, sf_dir):
    """The FIX `corpus_split_leakage` points at: assign train/test by the
    md5 bucket of the near-dup CLUSTER id, not the doc id.  Every
    near-dup pair lives inside one cluster (its edge created the cluster)
    and a cluster maps to exactly one split, so cross-split leakage is
    ZERO BY CONSTRUCTION — and the query proves it: per split, doc and
    cluster counts plus the cross-split near-dup pair count (always 0),
    all value-hash-checked.  Scale shape: clusters from the existing CC
    pipeline; the split is a per-row hash projection; the leak check is
    two joins of the pair relation against the assignment."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    # The inverted-index pair build feeds BOTH the CC edge set and the
    # leak-verification joins — materialize it once (lazy checkpoint: the
    # first consumer executes it, the second reads the materialization)
    # instead of re-running the Σdf² join per consumer.
    pairs = (
        jaccard_pairs(docs, block="source", n=2, threshold=0.05)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    clusters = connected_components(edges, docs.select("doc_id")).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    assigned = clusters.withColumn(
        "split",
        F.when(
            md5_60(F.col("cluster_id").cast("string")) % 10 >= 8, "test"
        ).otherwise("train"),
    ).localCheckpoint(eager=False)
    leaks = (
        pairs.join(
            assigned.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            assigned.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count("*").alias("n"))
    )
    return (
        assigned.crossJoin(F.broadcast(leaks))
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
            F.max("n").cast("long").alias("leaked_pairs"),
        )
    )


_STOPGRAM_DF_CAP = 32


@register(
    "dedup_clusters_stopgram",
    oracle=f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id, source,
               list_distinct([words[i] || ' ' || words[i+1]
                              FOR i IN range(1, len(words))]) AS grams
        FROM toks
    ), inv0 AS (
        SELECT doc_id, source, unnest(grams) AS shingle FROM sh
    ), dfreq AS (
        SELECT source, shingle, count(*) AS df FROM inv0 GROUP BY 1, 2
    ), inv AS (
        SELECT i.doc_id, i.source, i.shingle,
               count(*) OVER (PARTITION BY i.source, i.doc_id) AS set_size
        FROM inv0 i JOIN dfreq d
          ON d.source = i.source AND d.shingle = i.shingle
        WHERE d.df <= {_STOPGRAM_DF_CAP}
    ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.set_size AS size_a, b.set_size AS size_b,
               count(*) AS n_common
        FROM inv a JOIN inv b ON a.source = b.source AND a.shingle = b.shingle
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ), pairs AS (
        SELECT id_a, id_b FROM common
        WHERE n_common / (size_a + size_b - n_common) >= 0.05
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
    """,
    tags=("dedup", "clustering", "graph", "skew"),
)
def q_dedup_clusters_stopgram(spark, sf_dir):
    """`dedup_duplicate_clusters` with the stop-gram df cap (32 per
    source block) — the skew-hardened form a 100 TB corpus runs: shingles
    shared by more than 32 docs are boilerplate, carry no dedup signal,
    and each contribute df² candidate rows to the inverted-index self-join
    (the one term that breaks the Σdf² bound under hot-key skew; prefix
    filtering can't help at tau=0.05 since the prefix length approaches
    the whole set).  Jaccard is computed over the FILTERED shingle
    profiles on both engines, so the variant carries its own full
    value-hash oracle rather than approximating the uncapped one."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    edges = jaccard_pairs(
        docs, block="source", n=2, threshold=0.05, max_df=_STOPGRAM_DF_CAP
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = connected_components(edges, docs.select("doc_id"))
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


# ---------------------------------------------------------------------------
# Character n-gram Jaccard (typo-level near-dup)
# ---------------------------------------------------------------------------


def char_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    block: str | None = "source",
    n: int = 4,
    threshold: float = 0.35,
) -> DataFrame:
    """Exact CHARACTER-n-gram Jaccard pairs — the typo/near-edit-level
    companion of the word-shingle :func:`jaccard_pairs` (single-character
    edits shift every word shingle they touch but only ``n`` of the char
    grams, so char-gram Jaccard degrades smoothly under small edits).
    Same inverted-index machinery (``_jaccard_core``): explode grams →
    equi-join on (block, gram-hash) → count commons; cost Σdf² within
    blocks, never O(n²)."""
    t = F.trim(F.col(text))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
            lambda i: t.substr(i, F.lit(n)),
        )
    )
    base = df.select(
        F.col(id_col).alias("id"),
        *([F.col(block).alias("blk")] if block else [F.lit(0).alias("blk")]),
        grams.alias("sh"),
    )
    return _jaccard_core(base, threshold, prune_singletons=False)


__all__.append("char_jaccard_pairs")


@register(
    "dedup_char_ngram_jaccard",
    oracle="""
    WITH g AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(1, greatest(length(trim(text)) - 3, 1) + 1),
                   i -> substr(trim(text), i, 4))) AS grams
        FROM documents
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.grams, b.grams)) AS n_common,
               len(a.grams) AS sa, len(b.grams) AS sb
        FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           round(n_common / (sa + sb - n_common), 9) AS jaccard
    FROM pairs
    WHERE n_common / (sa + sb - n_common) >= 0.35
    """,
    tags=("dedup", "jaccard", "chargram"),
)
def q_dedup_char_ngram(spark, sf_dir):
    """Character-4-gram Jaccard near-dup pairs within source blocks at
    threshold 0.35. The oracle verifies with a direct all-pairs
    list_intersect within blocks (feasible at sf0.01); the engine path is
    the inverted-index join — same result, sub-quadratic cost."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    out = char_jaccard_pairs(docs, n=4, threshold=0.35)
    return out.select("id_a", "id_b", F.round("jaccard", 9).alias("jaccard"))


# ---------------------------------------------------------------------------
# Asymmetric shingle containment — subset/quote-inclusion duplicates
# ---------------------------------------------------------------------------


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    block: str | None = "source",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Directed containment pairs C(A→B) = |A∩B| / |A| over word n-gram
    shingles: the asymmetric near-dup detector for SUBSET duplicates — a
    short document quoted wholesale inside a longer one scores near 1.0
    containment while its Jaccard can be arbitrarily low (the union is
    dominated by the container). Broder's original resemblance/containment
    pair; the containment side is what catches quote-inclusion and
    boilerplate-wrapping duplication in a pretraining corpus.

    Scale shape: identical to `jaccard_pairs` — the SAME inverted-index
    self-join produces the undirected common-shingle counts once; both
    directed containments are then emitted from the tiny aggregated pair
    relation by a single explode (no union-branch recomputation, the
    triangle_counts lesson). Returns (contained_id, container_id,
    n_common, containment) at containment >= threshold."""
    # r13: hoisted tokenization + pre-explode checkpoint (see _jaccard_core)
    toks = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(block).alias("blk")] if block else [F.lit(0).alias("blk")] ),
        split_words(F.col(text)).alias("_w"),
    )
    base = (
        toks.select("id", "blk", word_shingles(F.col("_w"), n).alias("sh"))
        .withColumn("set_size", F.size("sh"))
        .localCheckpoint(eager=False)
    )
    inv = base.select("id", "blk", "set_size", F.explode("sh").alias("_sh")).select(
        "id", "blk", "set_size", F.xxhash64("_sh").alias("shingle")
    )
    a = inv.select(F.col("id").alias("id_a"), "blk", F.col("set_size").alias("size_a"), "shingle")
    b = inv.select(F.col("id").alias("id_b"), "blk", F.col("set_size").alias("size_b"), "shingle")
    common = (
        a.join(b, ["blk", "shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count("*").alias("n_common"))
    )
    directed = common.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("contained_id"),
                    F.col("id_b").alias("container_id"),
                    F.col("n_common"),
                    (F.col("n_common") / F.col("size_a")).alias("containment"),
                ),
                F.struct(
                    F.col("id_b").alias("contained_id"),
                    F.col("id_a").alias("container_id"),
                    F.col("n_common"),
                    (F.col("n_common") / F.col("size_b")).alias("containment"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    return directed.filter(F.col("containment") >= threshold)


@register(
    "dedup_containment_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id, source,
               list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                              FOR i IN range(1, len(words) - 1)]) AS grams
        FROM toks
    ), sized AS (
        SELECT doc_id, source, grams, len(grams) AS set_size FROM sh
    ), inv AS (
        SELECT doc_id, source, set_size, unnest(grams) AS shingle FROM sized
    ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.set_size AS size_a, b.set_size AS size_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM inv a JOIN inv b ON a.source = b.source AND a.shingle = b.shingle
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ), directed AS (
        SELECT id_a AS contained_id, id_b AS container_id, n_common,
               n_common / size_a AS containment
        FROM common
        UNION ALL
        SELECT id_b, id_a, n_common, n_common / size_b FROM common
    )
    SELECT contained_id, container_id, n_common,
           round(containment, 9) AS containment
    FROM directed WHERE containment >= 0.8
    """,
    tags=("dedup", "containment"),
)
def q_dedup_containment(spark, sf_dir):
    """Directed 3-gram shingle containment pairs at C >= 0.8 — the
    subset-duplicate detector (short doc quoted inside a long one) that
    symmetric Jaccard structurally misses. Same source-blocked
    inverted-index join as `dedup_jaccard_pairs`; both directions emitted
    from the aggregated pair relation in one explode pass."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    out = containment_pairs(docs, block="source", n=3, threshold=0.8)
    return out.select(
        "contained_id", "container_id", "n_common",
        F.round("containment", 9).alias("containment"),
    )


# ---------------------------------------------------------------------------
# Prefix-filtered similarity join (PPJoin-style) — r5
# ---------------------------------------------------------------------------


@register(
    "dedup_jaccard_prefix_filter",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                              FOR i IN range(1, len(words) - 1)]) AS grams
        FROM toks
    ), sized AS (
        SELECT doc_id, grams, len(grams) AS sz FROM sh
    ), inv AS (
        SELECT doc_id, sz, unnest(grams) AS g FROM sized
    ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.sz AS size_a, b.sz AS size_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, n_common,
           round(n_common / (size_a + size_b - n_common), 9) AS jaccard
    FROM common
    WHERE n_common / (size_a + size_b - n_common) >= 0.5
    """,
    tags=("dedup", "jaccard", "prefix-filter", "scale-path"),
)
def q_jaccard_prefix_filter(spark, sf_dir):
    """High-threshold (tau=0.5) exact Jaccard pairs via PREFIX FILTERING
    (SSJoin/PPJoin): order every document's shingles by ascending global
    document frequency (rarest first, deterministic df/hash tiebreak);
    if J(A,B) >= tau then |A∩B| >= ceil(tau*|A|), and two sets with
    overlap >= alpha MUST share a token inside their (len-alpha+1)
    prefixes — so candidates are generated ONLY from prefix-token
    collisions (~the rarest half of each set at tau=0.5), never from the
    full posting lists, and verification is a per-candidate
    array_intersect. Lossless by the prefix lemma, so the oracle is plain
    brute-force Jaccard at the same threshold.

    This is the standard scale path when the threshold is high enough to
    bite: posting volume drops to the prefix fraction, and because
    prefixes hold the RAREST tokens, the df^2 skew term collapses —
    complementary to MinHash-LSH (probabilistic, any tau) and to the
    blocked exact join (`dedup_jaccard_pairs`, low tau)."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_prefix_filter_pairs(docs, tau=0.5, n=3)


def prefix_filter_candidates(sh: DataFrame, tau: float) -> DataFrame:
    """Candidate (id_a, id_b) pairs from prefix-token collisions over a
    (doc_id, grams) relation — the PPJoin generation stage, exposed so the
    skew-stress suite can assert candidate volume directly (a corpus-wide
    hot shingle must NOT quadratically blow up candidates: its df ranks it
    LAST in the rarest-first order, outside every prefix).

    Beyond the prefix lemma, two further LOSSLESS PPJoin prunes run before
    a pair ever reaches the gram-array verify joins:

    - length filter: Jaccard >= tau forces tau·max(|A|,|B|) <= min(|A|,|B|),
      applied inside the posting self-join so disqualified pairs never
      enter the pair aggregation;
    - positional filter: with every doc's tokens ranked in ONE global
      (df, h) order, a common token at ranks (i, j) bounds the total
      overlap by min(i,j) − 1 + 1 + min(|A|−i, |B|−j) (common tokens
      before it precede it in BOTH orders; after it, follow in both).
      The pair survives only if the best such bound over its matched
      prefix tokens reaches the equivalent-overlap threshold
      alpha = ceil(tau/(1+tau)·(|A|+|B|)).

    Both bounds use exact integer arithmetic on the Jaccard inequality
    (n_common·(1+tau) >= tau·(sa+sb) with tau rational) via a 1e-9-scaled
    integer tau, so no float rounding can drop a true pair. The aggregation
    replaces the former DISTINCT — same single pair-keyed exchange, strictly
    fewer rows out.
    """
    # tau as an exact integer ratio (tau_i / SCALE), floored so tau_i/scale
    # <= tau: the prune inequalities then stay in BIGINT arithmetic and err
    # only on the KEEP side — lossless for any tau.
    scale = 1_000_000_000
    tau_i = int(math.floor(tau * scale))
    inv = sh.select(
        "doc_id", F.size("grams").alias("sz"), F.explode("grams").alias("_g")
    ).select("doc_id", "sz", F.xxhash64("_g").alias("h"))
    df_tok = inv.groupBy("h").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "h")
    ranked = inv.join(df_tok, "h").withColumn("rn", F.row_number().over(w))
    pref = ranked.filter(
        F.col("rn") <= F.col("sz") - F.ceil(F.lit(tau) * F.col("sz")) + 1
    ).select(
        "doc_id",
        F.col("sz").cast("long").alias("sz"),  # BIGINT: the tau_i products below
        F.col("rn").cast("long").alias("rn"),  # overflow 32-bit under ANSI
        "h",
    )
    sa, sb = F.col("a.sz"), F.col("b.sz")
    ra, rb = F.col("a.rn"), F.col("b.rn")
    # overlap upper bound contributed by this matched token (global-order
    # positional argument above); the pair's bound is the MIN over matches.
    ub = F.least(ra, rb) + F.least(sa - ra, sb - rb)
    pairs = (
        pref.alias("a")
        .join(pref.alias("b"), "h")
        # length filter: tau·max <= min, in integers.
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.least(sa, sb) * scale >= F.greatest(sa, sb) * tau_i)
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(
            F.min(ub).alias("_ub"),
            F.first(sa).alias("_sa"),
            F.first(sb).alias("_sb"),
        )
        # positional filter: need overlap o with o >= tau·(sa+sb−o), i.e.
        # o·(scale+tau_i) >= tau_i·(sa+sb); prune when even _ub fails it.
        .filter(
            F.col("_ub") * (scale + tau_i) >= (F.col("_sa") + F.col("_sb")) * tau_i
        )
        .select("id_a", "id_b")
    )
    return pairs


def jaccard_prefix_filter_pairs(
    docs: DataFrame, tau: float = 0.5, n: int = 3
) -> DataFrame:
    """Exact Jaccard >= tau pairs of ``docs`` (doc_id, text) via prefix
    filtering — see `q_jaccard_prefix_filter` for the lemma and scale
    argument."""
    # r13 (guide §2.1, §1.2): spread the scan before the shingle HOF (it
    # otherwise materializes on ONE partition, ~3 s at sf0.1) and
    # checkpoint EAGERLY — `sh` feeds three consumers (prefix candidates,
    # ga, gb) whose broadcast-exchange jobs would otherwise race to
    # materialize a lazy checkpoint, each recomputing the projection.
    sh = ensure_min_partitions(docs).select(
        "doc_id", shingles(F.col("text"), n).alias("grams")
    ).localCheckpoint(eager=True)
    # Postings carry only the 8-byte xxhash64 of the gram (the
    # _jaccard_core convention) — the global order is (df, h), a total
    # order up to 2^-64 hash ties, and gram strings never enter a shuffle.
    cands = prefix_filter_candidates(sh, tau)
    ga = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("grams_a"))
    gb = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("grams_b"))
    verified = (
        cands.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("grams_a", "grams_b")).cast("long").alias("n_common"),
            F.size("grams_a").alias("sa"),
            F.size("grams_b").alias("sb"),
        )
    )
    jac = F.col("n_common") / (F.col("sa") + F.col("sb") - F.col("n_common"))
    return (
        verified.filter(jac >= tau)
        .select("id_a", "id_b", "n_common", F.round(jac, 9).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup — storage-dedup primitive (r7)
# ---------------------------------------------------------------------------


@register(
    "dedup_cdc_chunks",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
    ), toks AS (
        SELECT doc_id, unnest(range(0, len(ws))) AS pos, unnest(ws) AS w FROM t
    ), marked AS (
        SELECT doc_id, pos, w,
               CASE WHEN {md5_60_sql('w')} % 8 = 0 THEN 1 ELSE 0 END AS bnd
        FROM toks
    ), cids AS (
        SELECT doc_id, pos, w,
               CAST(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT)
                   AS cid
        FROM marked
    ), chunks AS (
        SELECT doc_id, cid,
               substr(md5(string_agg(w, ' ' ORDER BY pos)), 1, 16) AS chunk_hash
        FROM cids GROUP BY doc_id, cid
    )
    SELECT chunk_hash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM chunks
    GROUP BY chunk_hash
    HAVING count(DISTINCT doc_id) >= 2
    """,
    tags=("dedup", "cdc", "chunking", "storage"),
)
def q_dedup_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup — the storage/content-addressable
    primitive (FastCDC/LBFS family) beside the similarity dedups: chunk
    boundaries are declared wherever md5_60(word) % 8 == 0, so they are a
    pure function of LOCAL content and survive insertions/deletions
    elsewhere in the document (a fixed-width chunker would shift every
    boundary after an edit — the property that makes CDC the right
    primitive for delta storage and shared-prefix/suffix detection).
    Expected chunk length is 8 words; emitted are the chunks shared by
    >= 2 documents with exact occurrence counts.

    Shape at 100 TB: one token explosion, a PARTITIONED per-doc running
    sum for chunk ids (never a global sort), one grouped string-agg per
    (doc, chunk), one grouped count per chunk hash — all map-side-
    combinable aggregations keyed by doc or hash.  The 60-bit md5 base
    hash (`functions/hashing.py`) makes boundaries and chunk hashes
    bit-identical across engines.

    Complements `text_duplicate_spans` (which finds arbitrary-offset
    shared substrings via shingle postings): CDC answers the storage
    question — which content-addressed blocks does a dedup store keep
    once? — in one pass without a pairwise stage."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "w")
    )
    marked = toks.withColumn(
        "bnd", F.when(md5_60(F.col("w")) % 8 == 0, 1).otherwise(0)
    )
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cids = marked.withColumn("cid", F.sum("bnd").over(w_doc).cast("long"))
    chunks = cids.groupBy("doc_id", "cid").agg(
        F.substring(
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("pos", "w"))),
                        lambda s: s.w,
                    ),
                    " ",
                )
            ),
            1,
            16,
        ).alias("chunk_hash")
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Fuzzy record linkage — blocked tolerance join over orders (r7)
# ---------------------------------------------------------------------------


@register(
    "dedup_fuzzy_orders",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               date_trunc('month', o_orderdate) AS blk,
               CAST(round(o_totalprice * 100) AS BIGINT) AS pc
        FROM orders
    )
    SELECT a.o_custkey AS custkey,
           CAST(strftime(a.blk, '%Y-%m') AS VARCHAR) AS month,
           a.o_orderkey AS ok_a, b.o_orderkey AS ok_b,
           a.pc AS price_a_cents, b.pc AS price_b_cents,
           CAST(abs(a.pc - b.pc) AS BIGINT) AS diff_cents
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey AND a.blk = b.blk
     AND a.o_orderkey < b.o_orderkey
    WHERE 100 * abs(a.pc - b.pc) <= greatest(a.pc, b.pc)
    """,
    tags=("dedup", "entity-resolution", "fuzzy", "blocking"),
)
def q_dedup_fuzzy_orders(spark, sf_dir):
    """Fuzzy duplicate-order detection (record linkage over NUMERIC
    fields — the entity-resolution flavor the text dedups don't cover):
    two orders are suspected duplicates when they share customer and
    calendar month and their totals agree within 1%.  Classic
    double-billing / replayed-submission audit.

    Blocking-then-verify, the canonical linkage shape: the self-join is
    keyed on (custkey, month) — candidates are per-block, never |orders|²
    — and the 1% tolerance is INTEGER-EXACT (100·|Δcents| <=
    max(cents): no fp in the predicate, so both engines keep identical
    pairs).  At 100 TB the blocked join is one shuffle on the block key;
    skewed mega-customers are AQE's skew-join case, and tighter blocks
    (day, amount bucket) are one-line narrowings."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("blk"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
    )
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("blk"),
        F.col("o_orderkey").alias("ok_a"),
        F.col("pc").alias("price_a_cents"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("blk"),
        F.col("o_orderkey").alias("ok_b"),
        F.col("pc").alias("price_b_cents"),
    )
    return (
        a.join(b, ["custkey", "blk"])
        .filter(F.col("ok_a") < F.col("ok_b"))
        .filter(
            100 * F.abs(F.col("price_a_cents") - F.col("price_b_cents"))
            <= F.greatest("price_a_cents", "price_b_cents")
        )
        .select(
            "custkey",
            F.date_format("blk", "yyyy-MM").alias("month"),
            "ok_a",
            "ok_b",
            "price_a_cents",
            "price_b_cents",
            F.abs(F.col("price_a_cents") - F.col("price_b_cents"))
            .cast("long")
            .alias("diff_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Exact-substring duplicate spans (r10) — the suffix-array dedup's
# relational twin (Lee et al. 2022, "Deduplicating Training Data Makes
# Language Models Better" — public)
# ---------------------------------------------------------------------------

_SPAN_K = 8  # tokens per shingle = minimum reported duplicate length


def duplicate_substring_spans(
    df: DataFrame, k: int = _SPAN_K, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """MAXIMAL cross-document duplicated token spans: every k-token
    shingle that appears in >= 2 distinct documents marks its interval
    [off, off+k-1]; per document, overlapping/adjacent marked intervals
    merge into maximal spans — exactly the spans a suffix-array
    exact-substring dedup would cut (any duplicated substring of
    >= k tokens is a union of duplicated k-shingles, so span recall is
    complete at granularity k).

    Scale shape (the reason this beats a literal suffix array on a
    cluster): one explode to the (doc, offset, shingle-hash) relation
    (~k× the token count), ONE grouped agg on the 60-bit md5 shingle hash
    for document frequency, one hash-keyed join back, and per-doc island
    windows — every step key-partitioned, no global sort of the corpus
    (a distributed suffix array needs exactly that).  Hash collisions are
    engine-identical (md5), so the oracle matches bit-for-bit.

    This is exactly the md5-keyed scale variant `text_duplicate_spans`'s
    docstring prescribes for 100 TB ("group on the 60-bit md5 instead,
    same plan") — that operator groups by the raw 8-gram string (fully
    readable oracle), this one ships 8-byte keys through the shuffle and
    builds shingles by array-slice with NO per-doc lead window (one
    fewer per-doc sort).

    Returns (doc_id, span_start, span_end, span_tokens, n_shingles),
    token offsets 1-based inclusive."""
    ws = F.split(F.trim(F.col(text)), r"\s+")
    toks = df.select(F.col(id_col), ws.alias("ws"))
    offs = F.when(
        F.size("ws") >= k, F.sequence(F.lit(1), F.size("ws") - k + 1)
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    sh = toks.select(
        id_col,
        F.explode(offs).alias("off"),
        "ws",
    ).select(
        id_col,
        F.col("off").cast("long").alias("off"),
        md5_60(F.concat_ws(" ", F.slice(F.col("ws"), F.col("off"), k))).alias("h"),
    )
    dfreq = sh.groupBy("h").agg(
        F.countDistinct(id_col).alias("nd")
    ).filter(F.col("nd") >= 2)
    dup = sh.join(dfreq.select("h"), "h")
    wprev = (
        Window.partitionBy(id_col)
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = dup.withColumn(
        "brk",
        F.when(
            F.col("off")
            > F.coalesce(F.max(F.col("off") + k - 1).over(wprev), F.lit(-1)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    wisl = Window.partitionBy(id_col).orderBy("off")
    isl = marked.withColumn("island", F.sum("brk").over(wisl))
    return (
        isl.groupBy(id_col, "island")
        .agg(
            F.min("off").cast("long").alias("span_start"),
            (F.max("off") + k - 1).cast("long").alias("span_end"),
            (F.max("off") + k - F.min("off")).cast("long").alias("span_tokens"),
            F.count("*").cast("long").alias("n_shingles"),
        )
        .select(id_col, "span_start", "span_end", "span_tokens", "n_shingles")
    )


def _substring_spans_oracle(k: int = _SPAN_K) -> str:
    shingle = f"list_aggregate(ws[i:i + {k - 1}], 'string_agg', ' ')"
    return f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
        FROM documents
    ), s AS MATERIALIZED (
        SELECT doc_id, CAST(i AS BIGINT) AS off,
               {md5_60_sql(shingle)} AS h
        FROM t, unnest(range(1, len(ws) - {k} + 2)) AS u(i)
    ), d AS (
        SELECT h FROM s GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), dup AS (
        SELECT s.doc_id, s.off FROM s JOIN d USING (h)
    ), m AS (
        SELECT doc_id, off,
               CASE WHEN off > coalesce(max(off + {k} - 1) OVER (
                        PARTITION BY doc_id ORDER BY off
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) + 1
               THEN 1 ELSE 0 END AS brk
        FROM dup
    ), isl AS (
        SELECT doc_id, off,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY off) AS island
        FROM m
    )
    SELECT doc_id,
           CAST(min(off) AS BIGINT) AS span_start,
           CAST(max(off) + {k} - 1 AS BIGINT) AS span_end,
           CAST(max(off) + {k} - min(off) AS BIGINT) AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_shingles
    FROM isl GROUP BY doc_id, island
    """


@register(
    "dedup_substring_spans",
    oracle=_substring_spans_oracle(),
    tags=("dedup", "substring", "spans"),
)
def q_dedup_substring_spans(spark, sf_dir):
    """Exact-substring duplicate spans at shingle granularity k=8: the
    maximal cross-document duplicated token intervals per document —
    what a training pipeline cuts (rather than dropping whole docs) when
    boilerplate or quotations repeat across the corpus.  Interval-merge
    is per-doc gaps-and-islands over the duplicated-shingle offsets;
    fully value-hash-checked (md5-60 shingle hashes, BIGINT offsets)."""
    docs = load_table(spark, sf_dir, "documents")
    return duplicate_substring_spans(docs, k=_SPAN_K)


def substring_redact(
    df: DataFrame, k: int = _SPAN_K, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """APPLY the substring-span pass: splice every cross-document
    duplicated span (`duplicate_substring_spans`) out of its document and
    return the redacted text — the cut step of exact-substring dedup
    (dropping spans, not documents, is the point of the method: the
    unique remainder of a boilerplate-contaminated doc survives).

    Policy: every duplicated span is cut from EVERY document carrying it
    (the conservative train-data policy — a span seen twice is memorized
    boilerplate wherever it appears); documents with no duplicated span
    pass through untouched.

    Shape: the span relation is tiny (per-doc islands); cutting is one
    per-doc broadcast-free equi-join of token offsets against span
    intervals (offsets are bounded by doc length, spans by island count)
    followed by an ordered re-concatenation — one extra shuffle on doc_id
    beyond the span build.  Returns (doc_id, n_tokens_before,
    n_tokens_after, n_spans_cut, clean_text)."""
    spans = duplicate_substring_spans(df, k=k, text=text, id_col=id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"),
        F.count("*").cast("long").alias("n_spans_cut"),
    )
    ws = F.split(F.trim(F.col(text)), r"\s+")
    toks = df.select(F.col(id_col), ws.alias("ws"))
    joined = toks.join(per_doc, id_col, "left").select(
        id_col,
        F.size("ws").cast("long").alias("n_tokens_before"),
        F.coalesce("n_spans_cut", F.lit(0)).alias("n_spans_cut"),
        F.when(F.col("_spans").isNull(), F.col("ws"))
        .otherwise(
            F.filter(
                F.transform(
                    "ws", lambda w, i: F.struct(w.alias("w"), (i + 1).alias("off"))
                ),
                lambda s: ~F.exists(
                    "_spans",
                    lambda sp: (s.getField("off") >= sp.getField("span_start"))
                    & (s.getField("off") <= sp.getField("span_end")),
                ),
            ).getField("w")
        )
        .alias("kept"),
    )
    return joined.select(
        id_col,
        "n_tokens_before",
        F.size("kept").cast("long").alias("n_tokens_after"),
        "n_spans_cut",
        F.concat_ws(" ", F.col("kept")).alias("clean_text"),
    )


def _substring_redact_oracle(k: int = _SPAN_K) -> str:
    spans = _substring_spans_oracle(k)
    return f"""
    WITH spans AS MATERIALIZED ({spans}),
    per_doc AS (
        SELECT doc_id,
               list(struct_pack(s := span_start, e := span_end)) AS sp,
               CAST(count(*) AS BIGINT) AS n_spans_cut
        FROM spans GROUP BY doc_id
    ), toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
        FROM documents
    ), cut AS (
        SELECT t.doc_id,
               CAST(len(t.ws) AS BIGINT) AS n_tokens_before,
               coalesce(p.n_spans_cut, 0) AS n_spans_cut,
               CASE WHEN p.sp IS NULL THEN t.ws ELSE
                   [t.ws[i] FOR i IN range(1, len(t.ws) + 1)
                    IF len(list_filter(p.sp,
                           x -> i >= x.s AND i <= x.e)) = 0]
               END AS kept
        FROM toks t LEFT JOIN per_doc p USING (doc_id)
    )
    SELECT doc_id, n_tokens_before,
           CAST(len(kept) AS BIGINT) AS n_tokens_after,
           n_spans_cut,
           coalesce(list_aggregate(kept, 'string_agg', ' '), '') AS clean_text
    FROM cut
    """


@register(
    "dedup_substring_redact",
    oracle=_substring_redact_oracle(),
    tags=("dedup", "substring", "redact"),
)
def q_dedup_substring_redact(spark, sf_dir):
    """The cut step of exact-substring dedup: duplicated spans spliced out
    of every carrying document, unique remainders preserved — returns
    before/after token counts and the redacted text itself (value-hash-
    checked string-for-string)."""
    docs = load_table(spark, sf_dir, "documents")
    return substring_redact(docs, k=_SPAN_K)


# ---------------------------------------------------------------------------
# MinHash-LSH retrieval-quality audit (r10) — the dedup twin of
# `sim_recall_audit`: price the banding scheme against exact ground truth
# ---------------------------------------------------------------------------

_MH_AUDIT_TAU = 0.6


def _minhash_audit_oracle(
    tau: float = _MH_AUDIT_TAU, num_perm: int = 16, bands: int = 4
) -> str:
    coeffs = _mh_coeffs(num_perm)
    rows = num_perm // bands
    min_cols = ",\n               ".join(
        f"min({perm61_sql(a, b, 'h')}) AS mh_{i}" for i, (a, b) in enumerate(coeffs)
    )
    band_selects = "\n        UNION ALL ".join(
        "SELECT doc_id, %d AS band, concat_ws('-', %s) AS bucket FROM sig"
        % (bi, ", ".join(f"mh_{bi * rows + r}" for r in range(rows)))
        for bi in range(bands)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
        FROM documents
    ), sh AS MATERIALIZED (
        SELECT doc_id, list_distinct([words[i] || ' ' || words[i+1]
                                      FOR i IN range(1, len(words))]) AS grams
        FROM toks
    ), ex AS MATERIALIZED (
        SELECT doc_id, unnest(grams) AS shingle FROM sh
    ), truth AS MATERIALIZED (
        SELECT ia AS id_a, ib AS id_b FROM (
            SELECT p.ia, p.ib,
                   p.c * 1.0 / (len(sa.grams) + len(sb.grams) - p.c) AS jac
            FROM (
                SELECT a.doc_id AS ia, b.doc_id AS ib,
                       CAST(count(*) AS BIGINT) AS c
                FROM ex a JOIN ex b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY ia, ib) p
            JOIN sh sa ON sa.doc_id = p.ia
            JOIN sh sb ON sb.doc_id = p.ib)
        WHERE jac >= {tau}
    ), hh AS (
        SELECT doc_id, {md5_60_sql('shingle')} AS h FROM ex
    ), sig AS (
        SELECT doc_id, {min_cols}
        FROM hh GROUP BY doc_id
    ), bk AS (
        {band_selects}
    ), cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bk a JOIN bk b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), hits AS (
        SELECT CAST(count(*) AS BIGINT) AS n_hits
        FROM cand JOIN truth USING (id_a, id_b)
    )
    SELECT CAST({tau} AS DOUBLE) AS tau,
           (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           n_hits,
           round(n_hits / greatest((SELECT count(*) FROM truth), 1), 6) AS recall,
           round(n_hits / greatest((SELECT count(*) FROM cand), 1), 6)
               AS precision_at_tau
    FROM hits
    """


@register(
    "dedup_minhash_recall_audit",
    oracle=_minhash_audit_oracle(),
    tags=("dedup", "minhash", "lsh", "eval", "audit"),
)
def q_dedup_minhash_recall_audit(spark, sf_dir):
    """Recall AND precision of the MinHash-LSH candidate stage against
    exact n-gram-Jaccard ground truth at tau=0.6 — the dedup twin of
    `sim_recall_audit`: before trusting a banding scheme at 100 TB you
    price what it misses (recall: planted near-dups that never shared a
    band) and what it wastes (precision: bucket collisions the verifier
    must discard).  Ground truth comes from the inverted-index join
    (pairs sharing ≥ 1 shingle bound every pair with J > 0, so truth is
    complete); candidates are the UNVERIFIED band-bucket pairs from the
    same md5/universal-hash chain as `dedup_minhash_pairs` — both halves
    deterministic, so the audit itself is value-hash-checked.  One row:
    (tau, n_true_pairs, n_candidates, n_hits, recall, precision_at_tau).

    Scale note: exact ground truth is inherently quadratic in hot-shingle
    document frequency — at 100 TB this audit runs on a held-out SAMPLE
    (hash-mod the doc ids) or with the `dedup_clusters_stopgram` df cap
    on the truth side; the LSH half scales unchanged.  Auditing on a
    sample is the method (Broder's original recall estimates are
    sampled), not a concession."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    sets = shingle_sets(docs, n=2).localCheckpoint(eager=False)
    ex = sets.select("id", F.explode("sh").alias("shingle"))
    pcount = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    sizes_a = sets.select(F.col("id").alias("id_a"), F.size("sh").alias("na"))
    sizes_b = sets.select(F.col("id").alias("id_b"), F.size("sh").alias("nb"))
    truth = (
        pcount.join(sizes_a, "id_a")
        .join(sizes_b, "id_b")
        .filter(
            F.col("c") * 1.0 / (F.col("na") + F.col("nb") - F.col("c"))
            >= _MH_AUDIT_TAU
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    sigs = minhash_signatures(sets, num_perm=16)
    cand = minhash_candidates(sigs, num_perm=16, bands=4).localCheckpoint(
        eager=False
    )
    n_true = truth.count()
    n_cand = cand.count()
    hits = cand.join(truth, ["id_a", "id_b"])
    return hits.agg(F.count("*").cast("long").alias("n_hits")).select(
        F.lit(_MH_AUDIT_TAU).alias("tau"),
        F.lit(n_true).cast("long").alias("n_true_pairs"),
        F.lit(n_cand).cast("long").alias("n_candidates"),
        "n_hits",
        F.round(F.col("n_hits") / F.greatest(F.lit(n_true), F.lit(1)), 6).alias(
            "recall"
        ),
        F.round(
            F.col("n_hits") / F.greatest(F.lit(n_cand), F.lit(1)), 6
        ).alias("precision_at_tau"),
    )


# ---------------------------------------------------------------------------
# LSH banding tuner — expected precision/recall per (bands, rows) config
# ---------------------------------------------------------------------------

_LSH_TUNE_CONFIGS = ((1, 16), (2, 8), (4, 4), (8, 2))  # k = b*r = 16 minhashes
_LSH_TUNE_TAU = 0.5


def _lsh_catch_expr(b: int, r: int) -> str:
    """P(candidate | s) = 1 − (1 − s^r)^b as a pow-free expression over a
    column named ``s`` — integer exponents unrolled into multiplication
    chains so Spark and DuckDB evaluate the identical IEEE tree (libm
    pow(double, double) is not bit-portable; * is)."""
    s_r = "(" + " * ".join(["s"] * r) + ")"
    one_m = f"(1.0 - {s_r})"
    return "(1.0 - " + "(" + " * ".join([one_m] * b) + ")" + ")"


def _lsh_tuning_oracle() -> str:
    blocks = []
    for b, r in _LSH_TUNE_CONFIGS:
        catch = _lsh_catch_expr(b, r)
        blocks.append(f"""
    SELECT CAST({b} AS BIGINT) AS bands, CAST({r} AS BIGINT) AS rows_per_band,
           floor(pow(1.0 / {b}, 1.0 / {r}) * 1000000 + 0.5) / 1000000
               AS crossover_s,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) FILTER (WHERE s >= {_LSH_TUNE_TAU}) AS BIGINT) AS n_true,
           floor(CAST(sum(CAST(floor({catch} * 1000000000 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1000.0 + 0.5) / 1000000.0 AS exp_candidates,
           floor(CAST(sum(CAST(floor({catch} * 1000000000 + 0.5) AS BIGINT))
                          FILTER (WHERE s >= {_LSH_TUNE_TAU})
                      AS DOUBLE) / 1000.0 + 0.5) / 1000000.0 AS exp_true,
           floor(CAST(sum(CAST(floor({catch} * 1000000000 + 0.5) AS BIGINT))
                          FILTER (WHERE s >= {_LSH_TUNE_TAU}) AS DOUBLE)
                 / 1000000000.0
                 / count(*) FILTER (WHERE s >= {_LSH_TUNE_TAU})
                 * 1000000 + 0.5) / 1000000 AS expected_recall,
           floor(CAST(sum(CAST(floor({catch} * 1000000000 + 0.5) AS BIGINT))
                          FILTER (WHERE s >= {_LSH_TUNE_TAU}) AS DOUBLE)
                 / CAST(sum(CAST(floor({catch} * 1000000000 + 0.5) AS BIGINT))
                        AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS expected_precision
    FROM pairs""")
    union = "\n    UNION ALL ".join(blocks)
    return rf"""
    WITH toks AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS words
        FROM documents
    ), sh AS (
        SELECT doc_id, source,
               list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                              FOR i IN range(1, len(words) - 1)]) AS grams
        FROM toks
    ), sized AS (
        SELECT doc_id, source, grams, len(grams) AS set_size FROM sh
    ), inv AS (
        SELECT doc_id, source, set_size, unnest(grams) AS shingle FROM sized
    ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.set_size AS size_a, b.set_size AS size_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM inv a JOIN inv b ON a.source = b.source AND a.shingle = b.shingle
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ), pairs AS (
        SELECT n_common / (size_a + size_b - n_common) AS s
        FROM common
        WHERE n_common / (size_a + size_b - n_common) >= 0.05
    )
    {union}
    ORDER BY bands
    """


@register(
    "dedup_lsh_tuning_curve",
    oracle=_lsh_tuning_oracle(),
    tags=("dedup", "lsh", "tuning", "audit"),
)
def q_dedup_lsh_tuning_curve(spark, sf_dir):
    """The LSH BANDING TUNER — `sim_nprobe_recall_curve`'s dedup twin: for
    every (bands b, rows r) split of a 16-hash MinHash signature, the
    expected recall and precision of banding on THIS corpus, from the
    exact pair-similarity distribution: P(candidate | s) = 1 − (1−s^r)^b
    summed over the observed exact-Jaccard pairs (truth at s ≥ 0.5).
    (1,16) is the ultra-precise single band, (8,2) the recall-heavy end;
    the crossover similarity (1/b)^{1/r} says where each config's
    S-curve turns on.  `dedup_minhash_recall_audit` measures ONE
    operating point empirically; this predicts the whole knob from the
    similarity histogram before any signatures are computed — the
    planning step of a 100 TB dedup rollout.

    Universe honesty (no silent caps): sums run over the source-blocked
    inverted-index pairs with s ≥ 0.05 (the same universe as
    `dedup_jaccard_pairs`); pairs below that contribute ≤ b·0.05^r ≤
    2·10⁻³ each to expected candidates for every config here (r ≥ 2),
    so precision is bounded-optimistic by construction and the bound is
    stated rather than hidden.

    Exactness: s is an exact integer ratio; s^r and (1−s^r)^b are
    UNROLLED MULTIPLICATION CHAINS shared as one expression string by
    both engines (libm pow is not bit-portable; * is); each pair's catch
    probability is nano-quantized BEFORE the order-sensitive sum.

    Scale: the pair relation is the inverted-index join (Σ df² within
    blocks — the same bound as every Jaccard operator here); the four
    config sums are one more pass over that relation, constant output."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_pairs(docs, n=3, block="source", threshold=0.05).select(
        F.col("jaccard").alias("s")
    )
    # ONE pass over the pair relation: every config's quantized catch sums
    # become columns of a single map-side-combined aggregation (4 separate
    # aggs re-ran the inverted-index join per config — 14.3 s -> one scan)
    is_true = F.col("s") >= _LSH_TUNE_TAU
    aggs = [
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(is_true, 1).otherwise(0)).cast("long").alias("n_true"),
    ]
    for b, r in _LSH_TUNE_CONFIGS:
        catch_q = F.floor(
            F.expr(_lsh_catch_expr(b, r)) * 1000000000 + F.lit(0.5)
        ).cast("long")
        aggs.append(F.sum(catch_q).cast("long").alias(f"q_{b}_{r}"))
        aggs.append(
            F.sum(F.when(is_true, catch_q).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"qt_{b}_{r}")
        )
    wide = pairs.agg(*aggs).localCheckpoint(eager=False)
    canon = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    parts = []
    for b, r in _LSH_TUNE_CONFIGS:
        q, qt = F.col(f"q_{b}_{r}"), F.col(f"qt_{b}_{r}")
        parts.append(
            wide.select(
                F.lit(b).cast("long").alias("bands"),
                F.lit(r).cast("long").alias("rows_per_band"),
                canon(F.pow(F.lit(1.0 / b), F.lit(1.0 / r))).alias("crossover_s"),
                "n_pairs",
                "n_true",
                (
                    F.floor(q.cast("double") / F.lit(1000.0) + F.lit(0.5))
                    / F.lit(1000000.0)
                ).alias("exp_candidates"),
                (
                    F.floor(qt.cast("double") / F.lit(1000.0) + F.lit(0.5))
                    / F.lit(1000000.0)
                ).alias("exp_true"),
                canon(
                    qt.cast("double") / F.lit(1000000000.0) / F.col("n_true")
                ).alias("expected_recall"),
                canon(qt.cast("double") / q.cast("double")).alias(
                    "expected_precision"
                ),
            )
        )
    out = parts[0]
    for pp in parts[1:]:
        out = out.union(pp)
    return out.orderBy("bands")


def cell_local_components(edges: DataFrame, members: DataFrame) -> DataFrame:
    """Connected components when every edge is CONFINED TO A BOUNDED
    BLOCKING CELL (LSH band bucket, IVF cell, SemDeDup cluster): one
    grouped-map union-find per cell — a single shuffle on the cell key and
    zero fixpoint iterations, vs O(diameter) join+checkpoint rounds for
    the generic :func:`connected_components` loop.

    Exactness: union-by-min (the larger root is attached under the
    smaller) makes every final root the component MINIMUM, so labels are
    identical to min-label propagation's fixpoint — the same first-seen
    representative rule, independent of edge order.

    Scale: the bounded-cell assumption is the SAME one the caller's
    pair-join already made — if a cell were too large for an in-memory
    union-find over its members, the cosine/Jaccard pair enumeration
    (Σ|cell|²) would have blown up first.  Components spanning MULTIPLE
    cells (possible under multi-band LSH blocking) are out of scope here:
    use :func:`connected_components` / :func:`connected_components_star`
    when edges cross blocks.

    ``edges``: (cell, src, dst) — both endpoints in the same cell.
    ``members``: (cell, node) — every node of every cell, one row each;
    isolated members come out labeled with themselves.  Returns
    (node, label).
    """
    import pandas as pd  # noqa: PLC0415

    node_col = members.columns[1]
    e = edges.select("cell", F.col("src").cast("long"), F.col("dst").cast("long"))
    m = members.select(
        "cell", F.col(node_col).cast("long").alias("src")
    ).withColumn("dst", F.lit(None).cast("long"))

    def _uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        mem_mask = pdf["dst"].isna()
        nodes = [int(n) for n in pdf.loc[mem_mask, "src"]]
        for n in nodes:
            parent[n] = n
        for s, d in zip(pdf.loc[~mem_mask, "src"], pdf.loc[~mem_mask, "dst"]):
            s, d = int(s), int(d)
            parent.setdefault(s, s)
            parent.setdefault(d, d)
            rs, rd = find(s), find(d)
            if rs != rd:
                lo, hi = (rs, rd) if rs < rd else (rd, rs)
                parent[hi] = lo
        return pd.DataFrame({"node": nodes, "label": [find(n) for n in nodes]})

    return (
        e.unionByName(m)
        .groupBy("cell")
        .applyInPandas(_uf, schema="node long, label long")
    )
