"""Corpus-quality filtering and training-data preparation operators
(SURVEY.md §2.8 north-star extensions; no counterpart in the 551-line
reference — these are the LLM-pipeline operations a 100 TB corpus engine
needs beside dedup/similarity/text).

- **Gopher-style quality filters**: the published rule family (word-count
  bounds, mean-word-length bounds, alphabetic-word fraction, stopword
  presence) computed per document as pure Catalyst array/string
  expressions, emitting one flag per rule plus the composed keep decision.
- **Token chunking with overlap**: fixed-size sliding chunks (RAG/context
  packing shape) via sequence → explode → slice — the array-native form of
  the reference's sliding-window featurization (W1,
  ``lvmh_forecaster2.py:83-88``) applied to tokens instead of prices.
- **int8 embedding quantization**: per-vector affine quantization with
  reconstruction-error audit — transform/fold HOFs, no Python; the
  ``floor(x + 0.5)`` form (not ``round``) keeps the bit pattern identical
  to the DuckDB twin.
- **Key-skew profile**: the partition-planning diagnostic — per-key count
  distribution quantiles + heaviest-key share, the numbers that decide
  salting/AQE-skew settings before a 100 TB join.

All four are single-scan, shuffle-once (or shuffle-twice for the profile's
count-of-counts) shapes with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import ensure_min_partitions, load_table
from ..plans.registry import register

__all__ = []

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


@register(
    "text_gopher_filters",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
    ), m AS (
        SELECT doc_id,
               len(words) AS n_words,
               round(list_sum(list_transform(words, w -> length(w))) / len(words), 6)
                   AS mean_word_len,
               round(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) / len(words), 6)
                   AS alpha_frac,
               len(list_filter(words, w -> w IN {_STOPWORDS!r})) AS n_stopwords
        FROM t
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len, alpha_frac,
           CAST(n_stopwords AS BIGINT) AS n_stopwords,
           n_words >= 20 AND n_words <= 100000 AS ok_word_count,
           mean_word_len >= 3 AND mean_word_len <= 10 AS ok_mean_word_len,
           alpha_frac >= 0.8 AS ok_alpha,
           n_stopwords >= 2 AS ok_stopwords,
           (n_words >= 20 AND n_words <= 100000)
               AND (mean_word_len >= 3 AND mean_word_len <= 10)
               AND alpha_frac >= 0.8 AND n_stopwords >= 2 AS keep
    FROM m
    """,
    tags=("text", "quality", "gopher"),
)
def q_gopher_filters(spark, sf_dir):
    """Gopher-style document quality rules (Rae et al. 2021's published
    heuristic family, the subset meaningful on a synthetic corpus): word
    count in [20, 100k], mean word length in [3, 10], ≥80% words containing
    a letter, ≥2 stopwords. One scan, zero shuffles — every rule is an
    array fold over the tokenization; emits per-rule flags so downstream
    can audit WHY a document was dropped (the filter-transparency pattern),
    plus the composed keep decision."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    t = docs.select("doc_id", words.alias("words"))
    n_words = F.size("words")
    mean_wl = F.round(
        F.aggregate(F.transform("words", lambda w: F.length(w)), F.lit(0), lambda a, x: a + x)
        / n_words,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter("words", lambda w: w.rlike("[a-z]"))) / n_words, 6
    )
    n_stop = F.size(F.filter("words", lambda w: w.isin(*_STOPWORDS)))
    m = t.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    ok_wc = (F.col("n_words") >= 20) & (F.col("n_words") <= 100000)
    ok_mwl = (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
    ok_alpha = F.col("alpha_frac") >= 0.8
    ok_stop = F.col("n_stopwords") >= 2
    return m.select(
        "*",
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_alpha & ok_stop).alias("keep"),
    )


_CHUNK, _STRIDE = 32, 24


@register(
    "corpus_chunk_overlap",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
    ), starts AS (
        SELECT doc_id, words, unnest(range(1, len(words) + 1, {_STRIDE})) AS s FROM t
    )
    SELECT doc_id,
           CAST((s - 1) / {_STRIDE} AS BIGINT) AS chunk_index,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(len(list_slice(words, s, s + {_CHUNK} - 1)) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(words, s, s + {_CHUNK} - 1), ' ') AS chunk_text
    FROM starts
    """,
    tags=("corpus", "chunking"),
)
def q_chunk_overlap(spark, sf_dir):
    """Fixed-size token chunks with overlap (chunk 32, stride 24 — each
    chunk shares 8 tokens with its predecessor): the RAG/context-window
    preparation shape. sequence → explode → slice, all array-native; the
    trailing partial chunk is kept (training pipelines pad it). Same
    array-window pattern as the reference's X/y tensor construction
    (``lvmh_forecaster2.py:83-88``) but over tokens. Scale: one scan, the
    explode multiplies rows by ~n_tokens/stride — no shuffle at all."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words"))
    starts = t.select(
        "doc_id",
        "words",
        F.explode(F.sequence(F.lit(1), F.size("words"), F.lit(_STRIDE))).alias("s"),
    )
    chunk = F.slice(F.col("words"), F.col("s"), _CHUNK)
    return starts.select(
        "doc_id",
        ((F.col("s") - 1) / _STRIDE).cast("long").alias("chunk_index"),
        F.col("s").cast("long").alias("chunk_start"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


@register(
    "embedding_int8_quantize",
    oracle="""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), s AS (
        SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx,
               (list_max(v) - list_min(v)) / 255.0 AS scale
        FROM e
    ), q AS (
        SELECT vec_id, v, mn, scale,
               list_transform(v, x -> floor((x - mn) / scale + 0.5)) AS qv
        FROM s WHERE scale > 0
    )
    SELECT vec_id,
           round(mn, 6) AS q_min,
           round(scale, 9) AS q_scale,
           CAST(list_sum(qv) AS BIGINT) AS q_checksum,
           round(list_max(list_transform(range(1, len(v) + 1),
                                         i -> abs(v[i] - (mn + qv[i] * scale)))), 9)
               AS max_abs_err
    FROM q
    """,
    tags=("embedding", "quantization"),
)
def q_int8_quantize(spark, sf_dir):
    """Affine int8 quantization of the embedding column with a
    reconstruction-error audit: per-vector (min, scale) → code = floor((x −
    min)/scale + 0.5) ∈ [0, 255] → max |x − dequant(code)|. Zero shuffles,
    pure HOFs; ``floor(+0.5)`` instead of ``round`` keeps Spark and DuckDB
    bit-identical (their ``round`` tie-breaking differs). The checksum is
    the driver-hashable stand-in for the int8 payload itself; constant
    vectors (scale 0) are excluded on both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    s = emb.select(
        "vec_id",
        v.alias("v"),
        F.array_min(v).alias("mn"),
        ((F.array_max(v) - F.array_min(v)) / 255.0).alias("scale"),
    ).filter(F.col("scale") > 0)
    q = s.withColumn(
        "qv", F.transform("v", lambda x: F.floor((x - F.col("mn")) / F.col("scale") + 0.5))
    )
    err = F.array_max(
        F.zip_with(
            "v", "qv", lambda x, c: F.abs(x - (F.col("mn") + c * F.col("scale")))
        )
    )
    return q.select(
        "vec_id",
        F.round("mn", 6).alias("q_min"),
        F.round("scale", 9).alias("q_scale"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_checksum"),
        F.round(err, 9).alias("max_abs_err"),
    )


@register(
    "corpus_lm_perplexity",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ), freq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY token
    ), tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n FROM freq
    ), scored AS (
        SELECT t.doc_id, ln(f.c / tot.n) AS logp
        FROM toks t JOIN freq f ON f.token = t.token CROSS JOIN tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(exp(-avg(logp)), 4) AS ppl
    FROM scored GROUP BY doc_id
    """,
    tags=("corpus", "quality", "perplexity"),
)
def q_lm_perplexity(spark, sf_dir):
    """Unigram language-model perplexity per document (the CCNet-style
    corpus quality signal, with the LM trained on the corpus itself):
    token frequencies → p(token) = c/N → ppl(doc) = exp(−mean ln p).
    Three shuffles: the frequency build, the token⋈frequency equi-join
    (co-partitioned on the token — the frequency side is |vocab| rows and
    broadcasts when small), and the per-doc aggregation. Everything stays
    in Catalyst; no model object exists outside the frequency table."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").alias("n"))
    scored = (
        toks.join(freq, "token")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.log(F.col("c") / F.col("n")).alias("logp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.exp(-F.avg("logp")), 4).alias("ppl"),
    )


@register(
    "pipeline_pretraining_corpus",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS words
        FROM documents
    ), m AS (
        SELECT doc_id, text, words,
               len(words) AS n_words,
               list_sum(list_transform(words, w -> length(w))) / len(words) AS mwl,
               len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) / len(words) AS af,
               len(list_filter(words, w -> w IN {_STOPWORDS!r})) AS ns
        FROM t
    ), kept AS (
        SELECT doc_id, text, words FROM m
        WHERE n_words BETWEEN 20 AND 100000 AND mwl BETWEEN 3 AND 10
          AND af >= 0.8 AND ns >= 2
    ), survivors AS (
        SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
    ), sdocs AS (
        SELECT k.doc_id, k.words FROM kept k JOIN survivors s ON s.doc_id = k.doc_id
    ), chunks AS (
        SELECT doc_id, words, unnest(range(1, len(words) + 1, {_STRIDE})) AS s
        FROM sdocs
    )
    SELECT md5(doc_id || ':' || CAST((s - 1) / {_STRIDE} AS BIGINT)) AS shuffle_key,
           doc_id,
           CAST((s - 1) / {_STRIDE} AS BIGINT) AS chunk_index,
           CAST(len(list_slice(words, s, s + {_CHUNK} - 1)) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(words, s, s + {_CHUNK} - 1), ' ') AS chunk_text
    FROM chunks
    """,
    tags=("corpus", "pipeline"),
)
def q_pipeline_pretraining(spark, sf_dir):
    """End-to-end pretraining-corpus preparation as ONE declarative plan:
    Gopher quality gate → exact-dedup survivors (min doc_id per content
    hash, left-semi joined back) → overlapping token chunks → deterministic
    md5 shuffle key (the reproducible training order, sorted by the
    consumer — no global sort inside the job). Composes the round-2/3
    building blocks the way a real data pipeline would; cost is one
    dedup aggregation + one semi join + a chunk explode, with every
    quality rule fused into the scan-side projection."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_words = F.size(words)
    mwl = (
        F.aggregate(F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x)
        / n_words
    )
    af = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))) / n_words
    ns = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    kept = docs.filter(
        n_words.between(20, 100000) & mwl.between(3, 10) & (af >= 0.8) & (ns >= 2)
    ).select("doc_id", "text", words.alias("words"))
    survivors = kept.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    sdocs = kept.join(survivors, "doc_id", "left_semi")
    chunks = sdocs.select(
        "doc_id",
        "words",
        F.explode(F.sequence(F.lit(1), F.size("words"), F.lit(_STRIDE))).alias("s"),
    )
    idx = ((F.col("s") - 1) / _STRIDE).cast("long")
    chunk = F.slice(F.col("words"), F.col("s"), _CHUNK)
    return chunks.select(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), idx.cast("string"))).alias(
            "shuffle_key"
        ),
        "doc_id",
        idx.alias("chunk_index"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


@register(
    "events_key_skew_profile",
    oracle="""
    WITH counts AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           round(avg(n), 6) AS mean_key_rows,
           round(quantile_cont(n, 0.5), 6) AS p50,
           round(quantile_cont(n, 0.9), 6) AS p90,
           round(quantile_cont(n, 0.99), 6) AS p99,
           round(max(n) / sum(n), 9) AS top_key_share
    FROM counts
    """,
    tags=("skew", "profiling"),
)
def q_key_skew_profile(spark, sf_dir):
    """Key-distribution profile of the join/agg key: per-key counts, then
    count-of-counts statistics (quantiles of the key-size distribution,
    heaviest-key share). This is the diagnostic that sizes salting and AQE
    skew thresholds BEFORE shuffling 100 TB on a key; two shuffles total
    and the second one aggregates |keys| rows to a single profile row."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    pct = F.percentile("n", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.round(F.avg("n"), 6).alias("mean_key_rows"),
        F.round(pct[0], 6).alias("p50"),
        F.round(pct[1], 6).alias("p90"),
        F.round(pct[2], 6).alias("p99"),
        F.round(F.max("n") / F.sum("n"), 9).alias("top_key_share"),
    )


# ---------------------------------------------------------------------------
# End-to-end dedup pipeline report
# ---------------------------------------------------------------------------


def _dedup_report_oracle(num_perm: int = 16, bands: int = 4, threshold: float = 0.35) -> str:
    """DuckDB twin of the dedup funnel report: same exact-hash survivor
    rule, same MinHash-LSH candidates (shared M61 hash rows), same
    verified-pair drop rule, same per-source token accounting."""
    from ..functions.hashing import md5_60_sql, perm61_sql
    from .dedup import _mh_coeffs

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
    WITH d AS (
        SELECT doc_id, text, source,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents
    ), keep AS (
        SELECT min(doc_id) AS doc_id FROM d GROUP BY md5(text)
    ), surv AS (
        SELECT d.* FROM d JOIN keep k ON k.doc_id = d.doc_id
    ), toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM surv
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
    ), dropped AS (
        SELECT DISTINCT c.id_b AS doc_id
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b
        WHERE len(list_intersect(sa.grams, sb.grams)) /
              (len(sa.grams) + len(sb.grams) - len(list_intersect(sa.grams, sb.grams)))
              >= {threshold}
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(s.doc_id) AS BIGINT) AS n_after_exact,
           CAST(count(CASE WHEN s.doc_id IS NOT NULL AND dr.doc_id IS NULL
                           THEN 1 END) AS BIGINT) AS n_final,
           CAST(sum(d.n_tokens) AS BIGINT) AS tokens_before,
           CAST(coalesce(sum(CASE WHEN s.doc_id IS NOT NULL AND dr.doc_id IS NULL
                                  THEN d.n_tokens END), 0) AS BIGINT) AS tokens_after
    FROM d
    LEFT JOIN (SELECT doc_id FROM surv) s ON s.doc_id = d.doc_id
    LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
    GROUP BY d.source
    """


@register(
    "corpus_dedup_pipeline_report",
    oracle=_dedup_report_oracle(),
    tags=("corpus", "dedup", "report", "pipeline"),
)
def q_dedup_pipeline_report(spark, sf_dir):
    """The dedup funnel audit every corpus build ships with: per source,
    document/token counts (1) raw, (2) after exact dedup (min-doc_id
    survivor per content hash), (3) after near-dup removal (drop any
    surviving doc that appears as the LARGER id of a MinHash-LSH candidate
    pair verified at Jaccard >= 0.35 — the deterministic pair-drop rule;
    cluster-representative selection is the separate
    ``dedup_duplicate_clusters`` operator). Composes the registered exact +
    MinHash pipelines, so the whole funnel — hashes, buckets, verified
    pairs, token sums — carries one full value-hash oracle. Scale shape:
    the two dedup stages are the proven sub-quadratic ones; the report
    itself is two broadcastable id sets left-joined back plus one grouped
    sum."""
    from .dedup import (
        minhash_candidates,
        minhash_signatures,
        shingle_sets,
        verify_candidates_jaccard,
    )

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents")).withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    )
    keep = docs.groupBy(F.md5("text").alias("_h")).agg(F.min("doc_id").alias("doc_id"))
    surv = docs.join(keep.select("doc_id"), "doc_id").localCheckpoint(eager=False)
    sets = shingle_sets(surv, n=2).localCheckpoint(eager=False)
    sigs = minhash_signatures(sets, num_perm=16)
    cands = minhash_candidates(sigs, num_perm=16, bands=4)
    dropped = (
        verify_candidates_jaccard(cands, sets)
        .filter(F.col("jaccard") >= 0.35)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    flagged = (
        docs.join(surv.select("doc_id", F.lit(1).alias("_surv")), "doc_id", "left")
        .join(F.broadcast(dropped.withColumn("_drop", F.lit(1))), "doc_id", "left")
    )
    final_tok = F.when(
        F.col("_surv").isNotNull() & F.col("_drop").isNull(), F.col("n_tokens")
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count("_surv").cast("long").alias("n_after_exact"),
        F.count(final_tok).cast("long").alias("n_final"),
        F.sum("n_tokens").cast("long").alias("tokens_before"),
        F.coalesce(F.sum(final_tok), F.lit(0)).cast("long").alias("tokens_after"),
    )


# ---------------------------------------------------------------------------
# Normalization-aware exact dedup uplift
# ---------------------------------------------------------------------------


@register(
    "text_normalize_dedup_uplift",
    oracle="""
    WITH n AS (
        SELECT source,
               md5(text) AS raw_h,
               md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g'))) AS norm_h
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT raw_h) AS BIGINT) AS distinct_raw,
           CAST(count(DISTINCT norm_h) AS BIGINT) AS distinct_normalized,
           CAST(count(DISTINCT raw_h) - count(DISTINCT norm_h) AS BIGINT)
               AS dedup_uplift
    FROM n GROUP BY source
    """,
    tags=("text", "dedup", "normalize", "quality"),
)
def q_text_normalize_uplift(spark, sf_dir):
    """How many additional exact duplicates canonical text normalization
    (lowercase → strip non-alphanumerics → collapse whitespace) exposes,
    per source — the standard pre-dedup step in corpus construction, with
    its payoff quantified before committing to it. Pure string expressions
    + one grouped distinct-count; the ASCII-only normalization regex is
    identical on both engines."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    norm = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
            )
        )
    )
    n = docs.select("source", F.md5("text").alias("raw_h"), norm.alias("norm_h"))
    return n.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("raw_h").cast("long").alias("distinct_raw"),
        F.countDistinct("norm_h").cast("long").alias("distinct_normalized"),
        (F.countDistinct("raw_h") - F.countDistinct("norm_h"))
        .cast("long")
        .alias("dedup_uplift"),
    )


# ---------------------------------------------------------------------------
# Cross-document boilerplate detection (corpus-frequent n-grams)
# ---------------------------------------------------------------------------


def boilerplate_scores(
    inv: DataFrame, base: DataFrame, df_counts: DataFrame | None = None, threshold: int = 5
) -> DataFrame:
    """Shared scoring core of `corpus_boilerplate_ngrams` and the streaming
    df-index serve (streaming/dfindex_stream.py): given the (doc_id, gram)
    inverted index and the per-doc (doc_id, n_grams) base relation, flag
    each document by the fraction of its distinct grams whose corpus-wide
    document frequency reaches ``threshold``. ``df_counts`` lets the
    streaming twin inject its incrementally merged (gram, nd) grid instead
    of recounting the full postings store — counts are mergeable, so the
    result is bit-identical either way."""
    if df_counts is None:
        df_counts = inv.groupBy("gram").agg(F.count("*").alias("nd"))
    boiler_grams = df_counts.filter(F.col("nd") >= threshold).select("gram")
    n_boiler = (
        inv.join(boiler_grams, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_boiler"))
    )
    frac = F.coalesce(F.col("n_boiler"), F.lit(0)) / F.greatest(
        F.col("n_grams"), F.lit(1)
    )
    return (
        base.join(n_boiler, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_boiler"), F.lit(0)).cast("long").alias("n_boiler"),
            F.round(frac, 6).alias("boiler_frac"),
            (frac >= 0.5).alias("flagged"),
        )
    )


@register(
    "corpus_boilerplate_ngrams",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                              || w[i+3] || ' ' || w[i+4]
                              FOR i IN range(1, len(w) - 3)]) AS grams
        FROM toks
    ), inv AS (
        SELECT doc_id, unnest(grams) AS gram FROM sh
    ), df AS (
        SELECT gram, count(*) AS nd FROM inv GROUP BY gram
    ), boiler AS (
        SELECT i.doc_id, CAST(count(*) AS BIGINT) AS n_boiler
        FROM inv i JOIN df ON df.gram = i.gram
        WHERE df.nd >= 5 GROUP BY i.doc_id
    ), base AS (
        SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM sh
    )
    SELECT b.doc_id, b.n_grams,
           coalesce(n.n_boiler, 0) AS n_boiler,
           round(coalesce(n.n_boiler, 0) / greatest(b.n_grams, 1), 6)
               AS boiler_frac,
           coalesce(n.n_boiler, 0) / greatest(b.n_grams, 1) >= 0.5 AS flagged
    FROM base b LEFT JOIN boiler n USING (doc_id)
    """,
    tags=("corpus", "quality", "boilerplate", "ngram"),
)
def q_corpus_boilerplate_ngrams(spark, sf_dir):
    """Cross-document boilerplate share: the fraction of a document's
    distinct word 5-grams that occur in >= 5 documents corpus-wide (the
    C4/RefinedWeb-style "repeated template text" signal — headers, nav
    bars, license blurbs — which within-doc repetition filters like
    `text_repetition_filter` cannot see).

    Scale shape: one explode to the (doc, gram) inverted index, one grouped
    count for document frequency, one semi-join back keyed on the gram, one
    per-doc count — cost is the posting-list volume, never doc x doc. The
    shuffle key is ``xxhash64(gram)`` (8 bytes instead of the 5-word
    string; collision odds ~|grams|²/2⁶⁴ — the `_jaccard_core` convention,
    and this halved the query's bench time). The df relation is
    Zipf-skewed; AQE skew-split applies on the hash key, and hot grams
    (df >= threshold) are exactly the few the semi-join fans out. Reuses
    `shingles` from the dedup module."""
    from .dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    # The shingle arrays feed THREE differently-keyed branches (df count,
    # semi-join back, per-doc size) — no exchange reuse applies, so the
    # generation subtree (regex split + HOF transform) would execute three
    # times; materialize it once (halved the sf0.1 bench time).
    # r13: spread before the shingle HOF + EAGER (the
    # `jaccard_prefix_filter` measurement: single-partition
    # materialization + lazy-checkpoint races across the three consumers).
    sh = ensure_min_partitions(docs).select(
        "doc_id", shingles(F.col("text"), 5).alias("grams")
    ).localCheckpoint(eager=True)
    inv = sh.select("doc_id", F.explode("grams").alias("_g")).select(
        "doc_id", F.xxhash64("_g").alias("gram")
    )
    base = sh.select("doc_id", F.size("grams").cast("long").alias("n_grams"))
    return boilerplate_scores(inv, base)


@register(
    "corpus_df_index_serve",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                              || w[i+3] || ' ' || w[i+4]
                              FOR i IN range(1, len(w) - 3)]) AS grams
        FROM toks
    ), inv AS (
        SELECT doc_id, unnest(grams) AS gram FROM sh
    ), df AS (
        SELECT gram, count(*) AS nd FROM inv GROUP BY gram
    ), boiler AS (
        SELECT i.doc_id, CAST(count(*) AS BIGINT) AS n_boiler
        FROM inv i JOIN df ON df.gram = i.gram
        WHERE df.nd >= 5 GROUP BY i.doc_id
    ), base AS (
        SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM sh
    )
    SELECT b.doc_id, b.n_grams,
           coalesce(n.n_boiler, 0) AS n_boiler,
           round(coalesce(n.n_boiler, 0) / greatest(b.n_grams, 1), 6)
               AS boiler_frac,
           coalesce(n.n_boiler, 0) / greatest(b.n_grams, 1) >= 0.5 AS flagged
    FROM base b LEFT JOIN boiler n USING (doc_id)
    """,
    tags=("corpus", "quality", "boilerplate", "streaming", "incremental"),
)
def q_corpus_df_index_serve(spark, sf_dir):
    """INCREMENTAL twin of `corpus_boilerplate_ngrams`, exercised as a
    batch-callable query: the documents table is ingested in three
    deterministic micro-batches (split on pmod(xxhash64(doc_id), 3))
    through `NgramDfStreamIndex` — per-batch (gram, nd) df grids +
    postings published under batch_id directories — and the SERVED
    boilerplate share is returned. The oracle is the plain one-batch SQL:
    passing value-hash-exact proves the merge-of-grids serve is
    bit-identical to batch, including the retroactive re-flagging of
    early documents whose grams crossed the df threshold only in a later
    batch. The store lives in a process-scoped temp dir reclaimed at
    interpreter exit — Spark 4's lazy analyzer re-resolves file sources on
    later actions, so the store must outlive the returned DataFrame (an
    eager checkpoint + delete logged FileNotFound on re-analysis)."""
    import atexit
    import shutil
    import tempfile

    from ..streaming.dfindex_stream import NgramDfStreamIndex

    docs = load_table(spark, sf_dir, "documents")
    store = tempfile.mkdtemp(prefix="dfindex_serve_")
    atexit.register(shutil.rmtree, store, ignore_errors=True)
    idx = NgramDfStreamIndex(spark, store)
    for bid in range(3):
        idx.ingest_batch(
            docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == bid), bid
        )
    return idx.serve_boilerplate()


# ---------------------------------------------------------------------------
# Classifier-filtered corpus selection (DSIR-style importance acceptance)
# ---------------------------------------------------------------------------


def _classifier_filter_oracle() -> str:
    from .stats import _LOGISTIC_CTE_SQL

    return (
        _LOGISTIC_CTE_SQL
        + r"""
    , alldocs AS (
        SELECT doc_id, source,
               n_chars / 100.0 AS x1,
               n_chars / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
                   AS x2
        FROM documents
    ), scored2 AS (
        SELECT a.doc_id, a.source,
               1.0 / (1.0 + exp(-((c0 + d0) + (c1 + d1) * a.x1
                                  + (c2 + d2) * a.x2))) AS p,
               ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)), 1, 8))::UBIGINT
                   / 4294967296.0 AS u
        FROM alldocs a CROSS JOIN fin
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE u < p) AS BIGINT) AS n_kept,
           floor((sum(p) / count(*)) * 1000000 + 0.5) / 1000000 AS mean_score,
           round(count(*) FILTER (WHERE u < p) / CAST(count(*) AS DOUBLE), 6)
               AS kept_frac
    FROM scored2
    GROUP BY source
    """
    )


@register(
    "corpus_classifier_filter",
    oracle=_classifier_filter_oracle(),
    tags=("corpus", "classifier", "sampling", "dsir"),
)
def q_corpus_classifier_filter(spark, sf_dir):
    """Classifier-based corpus selection, DSIR/CCNet-style: train the
    src1-vs-src0 domain classifier (two exact Newton steps — the
    `ml_logistic_newton` chain), score EVERY document, and accept each doc
    with probability equal to its score via the deterministic md5 uniform
    (`hash_uniform`) — importance resampling toward the target domain as a
    pure scan-side filter. Reports per-source doc counts, kept counts,
    mean score and kept fraction — the audit a mixture owner reads before
    committing the filtered corpus.

    Scale shape: training is two map-side aggregations (zero exchanges);
    scoring + acceptance is one scan with a 1-row coefficient broadcast —
    nothing about the filter step shuffles, so it composes with any
    downstream dedup/pack pipeline at 100 TB."""
    from .corpus import hash_uniform
    from .stats import _logistic_coeffs, _logistic_rows

    coeffs = _logistic_coeffs(_logistic_rows(spark, sf_dir)).select("w0", "w1", "w2")
    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        "source",
        (F.col("n_chars") / F.lit(100.0)).alias("x1"),
        (
            F.col("n_chars")
            / F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
        ).alias("x2"),
    )
    scored = feats.crossJoin(F.broadcast(coeffs)).select(
        "doc_id",
        "source",
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.col("w0")
                        + F.col("w1") * F.col("x1")
                        + F.col("w2") * F.col("x2")
                    )
                )
            )
        ).alias("p"),
        hash_uniform("doc_id").alias("u"),
    )
    kept = F.when(F.col("u") < F.col("p"), 1).otherwise(0)
    return scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(kept).cast("long").alias("n_kept"),
        (F.floor((F.sum("p") / F.count("*")) * 1000000 + F.lit(0.5)) / 1000000).alias(
            "mean_score"
        ),
        F.round(F.sum(kept) / F.count("*").cast("double"), 6).alias("kept_frac"),
    )
