"""Corpus-construction operators for LLM training-data pipelines
(SURVEY.md §2.8 extensions): vocabulary building, n-gram statistics,
token-entropy quality scoring, PII redaction, deterministic shuffling,
source-mixture balancing, and token-budget sequence packing.

These are the ops a data-curation pipeline runs between raw-document
ingest (sources/) and dedup/similarity (dedup.py, similarity.py): build a
vocab, score and filter documents, redact PII, rebalance the source mix,
shuffle deterministically, and pack documents into training-context bins.

All hot paths are pure Catalyst expressions (explode / zip_with /
windowed aggregation) — no Python crossings.  Determinism is load-bearing
everywhere: "random" ordering is keyed on ``md5(doc_id)``, which both
Spark and DuckDB compute identically, so sampling/shuffling decisions are
reproducible across engines and across reruns (a production pipeline would
swap in ``xxhash64`` — same shape, cheaper hash, but no oracle twin).

Scale notes (100 TB):
- vocabulary: full-vocab frequency agg is one shuffle with map-side
  combine; the global rank is TakeOrdered-limited to the top-K BEFORE any
  single-partition work, so the unbounded distinct-token tail (billions of
  misspellings at corpus scale) never funnels into one partition.
- bigrams: generated per document with ``zip_with`` on the token array —
  zero extra shuffles before the counting agg (no posexplode+window).
- mixture/packing: windows are partitioned by ``source`` — parallel per
  source; no global window anywhere. Caveat: with a handful of sources the
  per-source sort concentrates (one task per source) — the exact-count
  variants are |stratum|-bounded-sort ops; at corpus scale use the
  windowless hash-threshold twin (``source_mixture_fraction``) or a
  composite (source, shard) packing key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import md5_60, md5_60_sql
from ..plans.registry import register
from .text import words_of

__all__ = [
    "build_vocabulary",
    "bigram_counts",
    "token_entropy",
    "pii_redact",
    "deterministic_shuffle",
    "source_mixture_balance",
    "source_mixture_fraction",
    "hash_uniform",
    "pack_budget_bins",
]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUMBER_RE = r"\d{6,}"


def build_vocabulary(df: DataFrame, text: str = "text", top_k: int = 1000) -> DataFrame:
    """Global token frequencies → dense ``vocab_id`` (1 = most frequent,
    ties broken by token string). The id assignment is rank over only the
    TakeOrdered top-K rows, never over the full vocabulary."""
    tok = df.select(F.explode(words_of(F.col(text))).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("freq"))
    top = freq.orderBy(F.desc("freq"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return top.select(
        "token", "freq", F.row_number().over(w).cast("long").alias("vocab_id")
    )


def bigram_counts(df: DataFrame, text: str = "text", top_k: int = 20) -> DataFrame:
    """Top-K word bigrams. Bigram generation is array-native ``zip_with``
    of the token array against its own 1-shifted slice — per-row, no
    window, no extra shuffle; only the count agg shuffles."""
    toks = df.select(words_of(F.col(text)).alias("w")).filter(F.size("w") >= 2)
    bg = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
                " (a, b) -> concat_ws(' ', a, b))"
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(top_k)
    )


def token_entropy(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Shannon entropy (bits) of each document's token distribution — a
    perplexity-proxy quality score (low entropy = repetitive/templated
    text). Computed as ``log2(N) - Σ c·log2(c) / N`` from per-(doc, token)
    counts: two partial-aggregating shuffles, no per-token probability
    materialization."""
    tok = df.select(F.col(id_col), F.explode(words_of(F.col(text))).alias("token"))
    cnt = tok.groupBy(id_col, "token").agg(F.count("*").alias("c"))
    return cnt.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 6
        ).alias("token_entropy"),
    )


def pii_redact(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails and long digit runs (account/phone-shaped) with typed
    placeholder tokens; count hits per category. Patterns are the ASCII
    subset on which Java regex (Spark) and RE2 (DuckDB) agree."""
    t = F.col(text)
    # Numbers are counted on the email-redacted text, not the raw text —
    # digit runs inside an email are consumed by the email replacement and
    # must not double-count as number redactions.
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    return df.select(
        F.col(id_col),
        F.regexp_replace(after_email, LONG_NUMBER_RE, "<NUM>").alias("clean_text"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(LONG_NUMBER_RE), F.lit(0))).cast("long").alias("n_numbers"),
    )


def shuffle_key(id_col: str = "doc_id") -> F.Column:
    """Deterministic pseudo-random sort key: md5 of the decimal id string.
    Identical lowercase-hex output on Spark and DuckDB."""
    return F.md5(F.col(id_col).cast("string"))


def deterministic_shuffle(df: DataFrame, id_col: str = "doc_id", limit: int = 200) -> DataFrame:
    """Reproducible global training-order shuffle: rank by md5(id). The
    global ordering is consumed through ``orderBy().limit()`` —
    TakeOrderedAndProject, per-partition partial top-K — and the dense rank
    is a window over only the surviving ``limit`` rows."""
    top = (
        df.select(F.col(id_col), shuffle_key(id_col).alias("shuffle_key"))
        .orderBy("shuffle_key")
        .limit(limit)
    )
    w = Window.orderBy("shuffle_key")
    return top.select(
        id_col, "shuffle_key", F.row_number().over(w).cast("long").alias("shuffle_rank")
    )


def source_mixture_balance(
    df: DataFrame,
    group: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Rebalance the corpus source mix by deterministic downsampling: every
    source keeps the same number of documents (the smallest source's
    count), selected by md5-order within each source — the equalize-down
    special case of target-weight mixture sampling for LLM training sets.

    Shape: one count agg (tiny, |sources| rows, broadcast back) + one
    per-source window rank — parallel across sources, no global ordering,
    but each source's rank sorts in a single task: exact counts cost a
    |stratum|-bounded sort. At 100 TB with few, huge sources prefer
    ``source_mixture_fraction`` (windowless hash thinning, ~√target count
    error). Returns the per-source summary of the kept set."""
    counts = df.groupBy(group).agg(F.count("*").alias("n_src"))
    target = counts.agg(F.min("n_src").alias("target"))
    w = Window.partitionBy(group).orderBy(shuffle_key(id_col), F.col(id_col))
    ranked = df.select(
        F.col(group), F.col(id_col), F.col(size_col), F.row_number().over(w).alias("r")
    )
    kept = ranked.join(F.broadcast(target), ranked["r"] <= target["target"]).drop("target")
    return kept.groupBy(group).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum(size_col).cast("long").alias("sum_chars"),
    )


def pack_budget_bins(
    df: DataFrame,
    group: str = "source",
    order: str = "doc_id",
    size_col: str = "n_chars",
    budget: int = 16384,
) -> DataFrame:
    """Pack documents into fixed-budget training-context bins: within each
    source (ordered by id), bin = floor(running-size-before / budget) — the
    prefix-sum approximation of greedy first-fit packing, expressible as
    ONE partitioned window (greedy exact packing is a data-dependent
    recurrence; the prefix form overflows a bin by at most one document and
    needs no Python). Returns per-bin document and size counts."""
    w = (
        Window.partitionBy(group)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    binned = df.select(
        F.col(group),
        F.col(size_col),
        F.floor(cum_before / F.lit(float(budget))).cast("long").alias("bin_id"),
    )
    return binned.groupBy(group, "bin_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(size_col).cast("long").alias("bin_chars"),
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "corpus_bpe_first_merges",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents
    ), wf AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM tok WHERE length(w) >= 2 GROUP BY w
    ), pairs AS (
        SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, c
        FROM wf, unnest(range(1, length(w))) AS t(i)
    ), agg AS (
        SELECT pair,
               CAST(sum(c) AS BIGINT) AS occurrences,
               CAST(count(*) AS BIGINT) AS n_word_types
        FROM pairs GROUP BY pair
    )
    SELECT pair, occurrences, n_word_types,
           CAST(row_number() OVER (ORDER BY occurrences DESC, pair) AS BIGINT)
               AS merge_rank
    FROM agg ORDER BY merge_rank LIMIT 30
    """,
    tags=("corpus", "tokenizer", "bpe"),
)
def q_corpus_bpe_first_merges(spark, sf_dir):
    """First-iteration BPE merge statistics: the corpus-weighted counts of
    adjacent character pairs inside words — exactly the table the first
    byte-pair-encoding merge step maximizes over when inducing a
    tokenizer from a corpus (Sennrich et al. 2016, public). Top-30 merge
    candidates, deterministic (count DESC, pair ASC) rank.

    Scale shape: the word explosion collapses to the word-TYPE frequency
    table first (Zipf: |types| << |tokens|), so the per-character pair
    explode runs over types weighted by counts, not over the raw corpus —
    the same types-not-tokens trick a real BPE trainer uses. One explode
    + two grouped aggs + a top-30 rank (post-limit)."""
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(words_of(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pairs = wf.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "c",
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("c").cast("long").alias("occurrences"),
        F.count("*").cast("long").alias("n_word_types"),
    )
    w = Window.orderBy(F.desc("occurrences"), F.asc("pair"))
    return (
        agg.withColumn("merge_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("merge_rank") <= 30)
        .orderBy("merge_rank")
    )


@register(
    "corpus_vocabulary",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ), f AS (
        SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY token
    )
    SELECT token, freq,
           CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS vocab_id
    FROM f
    ORDER BY vocab_id
    LIMIT 1000
    """,
    tags=("corpus", "text", "vocabulary"),
)
def q_corpus_vocabulary(spark, sf_dir):
    """Top-1000 vocabulary with dense frequency-ranked ids."""
    docs = load_table(spark, sf_dir, "documents")
    return build_vocabulary(docs, top_k=1000)


@register(
    "corpus_bigrams_topk",
    oracle="""
    WITH t AS (
        SELECT string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), bg AS (
        SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bigram
        FROM t WHERE len(w) >= 2
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS freq
    FROM bg GROUP BY bigram
    ORDER BY freq DESC, bigram
    LIMIT 20
    """,
    tags=("corpus", "text", "ngram"),
)
def q_corpus_bigrams(spark, sf_dir):
    """Top-20 word bigrams across the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return bigram_counts(docs, top_k=20)


@register(
    "corpus_token_entropy",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ), c AS (
        SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS token_entropy
    FROM c GROUP BY doc_id
    """,
    tags=("corpus", "text", "quality"),
)
def q_corpus_token_entropy(spark, sf_dir):
    """Token-distribution entropy per document (perplexity proxy)."""
    docs = load_table(spark, sf_dir, "documents")
    return token_entropy(docs)


@register(
    "corpus_pii_redact",
    oracle="""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\d{6,}', '<NUM>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\d{6,}')) AS BIGINT) AS n_numbers
    FROM documents
    """,
    tags=("corpus", "text", "pii"),
)
def q_corpus_pii_redact(spark, sf_dir):
    """PII redaction pass: emails and long digit runs → typed placeholders."""
    docs = load_table(spark, sf_dir, "documents")
    return pii_redact(docs)


@register(
    "corpus_deterministic_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key FROM documents
    )
    SELECT doc_id, shuffle_key,
           CAST(row_number() OVER (ORDER BY shuffle_key) AS BIGINT) AS shuffle_rank
    FROM keyed
    ORDER BY shuffle_key
    LIMIT 200
    """,
    tags=("corpus", "sampling", "shuffle"),
)
def q_corpus_shuffle(spark, sf_dir):
    """First 200 documents of the deterministic md5 training shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_shuffle(docs, limit=200)


@register(
    "corpus_source_mixture",
    oracle="""
    WITH counts AS (
        SELECT source, count(*) AS n_src FROM documents GROUP BY source
    ), tgt AS (
        SELECT min(n_src) AS target FROM counts
    ), ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS r
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM ranked, tgt
    WHERE r <= target
    GROUP BY source
    """,
    tags=("corpus", "sampling", "mixture"),
)
def q_corpus_mixture(spark, sf_dir):
    """Equal-weight source rebalance via deterministic downsampling."""
    docs = load_table(spark, sf_dir, "documents")
    return source_mixture_balance(docs)


@register(
    "corpus_pack_budget_bins",
    oracle="""
    WITH cum AS (
        SELECT source, n_chars,
               coalesce(sum(n_chars) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM documents
    ), binned AS (
        SELECT source, n_chars,
               CAST(floor(cum_before / 16384.0) AS BIGINT) AS bin_id
        FROM cum
    )
    SELECT source, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS bin_chars
    FROM binned GROUP BY source, bin_id
    """,
    tags=("corpus", "packing"),
)
def q_corpus_pack(spark, sf_dir):
    """Token-budget context packing: per-source 16 KiB prefix-sum bins."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_budget_bins(docs, budget=16384)


def hash_uniform(id_col: str = "doc_id") -> F.Column:
    """Deterministic uniform [0,1) draw per id: the first 8 hex digits of
    md5(id) as an integer over 2^32. Identical on Spark and DuckDB."""
    return F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(4294967296.0)


def source_mixture_fraction(
    df: DataFrame,
    group: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Scale-path mixture rebalance: per-source Bernoulli thinning at rate
    ``target/n_src`` keyed on the deterministic md5 uniform — a pure FILTER
    against a broadcast |sources|-row rate table. Zero windows, zero
    per-group ordering: unlike ``source_mixture_balance`` (exact counts via
    per-source rank, which concentrates each source's sort in one task when
    |sources| is small), this keeps the scan embarrassingly parallel at any
    size; kept counts land within ~√target of the target, which is the
    standard LLM-corpus mixture trade."""
    counts = df.groupBy(group).agg(F.count("*").alias("n_src"))
    target = counts.agg(F.min("n_src").alias("target"))
    rates = counts.crossJoin(F.broadcast(target)).select(
        F.col(group).alias("_g"),
        (F.col("target").cast("double") / F.col("n_src")).alias("_rate"),
    )
    kept = df.join(F.broadcast(rates), df[group] == F.col("_g")).filter(
        hash_uniform(id_col) < F.col("_rate")
    )
    return kept.groupBy(group).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum(size_col).cast("long").alias("sum_chars"),
    )


@register(
    "corpus_source_mixture_fraction",
    oracle="""
    WITH counts AS (
        SELECT source, count(*) AS n_src FROM documents GROUP BY source
    ), tgt AS (
        SELECT min(n_src) AS target FROM counts
    ), rates AS (
        SELECT source, CAST(target AS DOUBLE) / n_src AS rate
        FROM counts, tgt
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
              / 4294967296.0 < r.rate
    GROUP BY d.source
    """,
    tags=("corpus", "sampling", "mixture", "scale-path"),
)
def q_corpus_mixture_fraction(spark, sf_dir):
    """Mixture rebalance by deterministic hash thinning — the windowless
    100 TB path (exact-count twin: ``corpus_source_mixture``)."""
    docs = load_table(spark, sf_dir, "documents")
    return source_mixture_fraction(docs)


@register(
    "corpus_bigram_pmi",
    oracle="""
    WITH t AS (
        SELECT string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), uni AS (
        SELECT unnest(w) AS tok FROM t
    ), uc AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok
    ), nu AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
    bg AS (
        SELECT unnest(list_transform(range(1, len(w)),
                      i -> {'a': w[i], 'b': w[i + 1]})) AS p
        FROM t WHERE len(w) >= 2
    ), bc AS (
        SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS c_ab
        FROM bg GROUP BY p.a, p.b
    ), nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS np FROM bc),
    scored AS (
        SELECT bc.a, bc.b, bc.c_ab,
               round(ln((CAST(bc.c_ab AS DOUBLE) / nb.np)
                        / ((CAST(ua.c AS DOUBLE) / nu.n)
                           * (CAST(ub.c AS DOUBLE) / nu.n))), 6) AS pmi
        FROM bc
        JOIN uc ua ON ua.tok = bc.a
        JOIN uc ub ON ub.tok = bc.b
        CROSS JOIN nu CROSS JOIN nb
        WHERE bc.c_ab >= 5
    )
    SELECT a, b, c_ab, pmi FROM scored
    ORDER BY pmi DESC, a, b LIMIT 20
    """,
    tags=("corpus", "text", "collocation"),
)
def q_corpus_bigram_pmi(spark, sf_dir):
    """Top-20 collocations by pointwise mutual information:
    PMI = ln(p(ab) / (p(a)·p(b))) over corpus bigram/unigram counts with a
    min-support of 5 — the classic phrase detector (what should become one
    token). Counts are exact BIGINTs from two grouped aggs over one token
    explosion; the two corpus totals are one-row broadcasts; the single
    ln() is applied to an exact count ratio and rounded (the `text_tfidf`
    libm precedent). Top-k via TakeOrdered with the bigram itself as the
    deterministic tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("w"))
    uni = t.select(F.explode("w").alias("tok"))
    uc = uni.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    nu = uc.agg(F.sum("c").cast("long").alias("n"))
    idx = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg = t.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("w", i).alias("a"),
                    F.element_at("w", i + 1).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    bc = bg.groupBy("a", "b").agg(F.count("*").cast("long").alias("c_ab"))
    nb = bc.agg(F.sum("c_ab").cast("long").alias("np"))
    ua = uc.select(F.col("tok").alias("a"), F.col("c").alias("ca"))
    ub = uc.select(F.col("tok").alias("b"), F.col("c").alias("cb"))
    scored = (
        bc.filter(F.col("c_ab") >= 5)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "a", "b", "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab").cast("double") / F.col("np"))
                    / (
                        (F.col("ca").cast("double") / F.col("n"))
                        * (F.col("cb").cast("double") / F.col("n"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "a", "b").limit(20)


# ---------------------------------------------------------------------------
# Zipf fit + temperature-scaled source mixture (r5)
# ---------------------------------------------------------------------------


@register(
    "corpus_zipf_slope",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ), f AS (
        SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY token
    ), v AS (
        SELECT token, freq,
               CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS r
        FROM f ORDER BY r LIMIT 500
    )
    SELECT CAST(count(*) AS BIGINT) AS n_ranks,
           round(regr_slope(ln(freq), ln(r)), 6) AS zipf_slope,
           round(regr_r2(ln(freq), ln(r)), 6) AS zipf_r2
    FROM v
    """,
    tags=("corpus", "zipf", "diagnostics"),
)
def q_corpus_zipf_slope(spark, sf_dir):
    """Zipf's-law fit of the corpus: OLS slope of ln(freq) on ln(rank)
    over the top-500 vocabulary (natural text ~ -1; the word-salad
    testdata is much flatter) — the one-number sanity check that a crawl
    batch is language-like rather than log spam or base64. Rank
    assignment rides the existing TakeOrdered vocabulary path (no global
    sort); the fit is one regr_* aggregate over 500 rows. The only libm
    ops (ln) hit both engines' last-ulp noise on identical integer inputs
    — absorbed by the 6-dp round."""
    docs = load_table(spark, sf_dir, "documents")
    v = build_vocabulary(docs, top_k=500)
    return v.agg(
        F.count("*").cast("long").alias("n_ranks"),
        F.round(F.regr_slope(F.log("freq"), F.log("vocab_id")), 6).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("freq"), F.log("vocab_id")), 6).alias("zipf_r2"),
    )


@register(
    "corpus_temperature_mixture",
    oracle="""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_src,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(sum(n_src) AS DOUBLE) AS nn FROM counts
    ), pw AS (
        SELECT source, n_src, sum_chars,
               n_src / t.nn AS p,
               pow(n_src / t.nn, 0.7) AS w
        FROM counts, tot t
    ), z AS (
        SELECT sum(w) AS zz FROM pw
    )
    SELECT pw.source, pw.n_src, pw.sum_chars,
           round(pw.p, 6) AS p_natural,
           round(pw.w / z.zz, 6) AS p_temperature,
           round((pw.w / z.zz) / pw.p, 6) AS boost
    FROM pw, z
    """,
    tags=("corpus", "mixture", "sampling", "temperature"),
)
def q_corpus_temperature_mixture(spark, sf_dir):
    """Temperature-scaled source mixture (T=0.7): the multilingual-LM
    sampling knob — q_s ∝ p_s^T flattens the natural source distribution
    so small sources are up-sampled without drowning big ones
    (`boost` = q/p > 1 for rare sources). Complements
    `corpus_source_mixture_fraction` (equal-size rebalance): this emits
    the RATES a weighted sampler would consume. Two tiny aggregates
    (per-source counts, one-row totals) + broadcasts — nothing scales
    with corpus size except the first grouped count."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_src"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    tot = counts.agg(F.sum("n_src").cast("double").alias("nn"))
    pw = counts.crossJoin(F.broadcast(tot)).select(
        "source", "n_src", "sum_chars",
        (F.col("n_src") / F.col("nn")).alias("p"),
        F.pow(F.col("n_src") / F.col("nn"), 0.7).alias("w"),
    )
    z = pw.agg(F.sum("w").alias("zz"))
    return pw.crossJoin(F.broadcast(z)).select(
        "source", "n_src", "sum_chars",
        F.round(F.col("p"), 6).alias("p_natural"),
        F.round(F.col("w") / F.col("zz"), 6).alias("p_temperature"),
        F.round((F.col("w") / F.col("zz")) / F.col("p"), 6).alias("boost"),
    )


# ---------------------------------------------------------------------------
# Span-corruption masks (T5-style denoising objective prep) — r5
# ---------------------------------------------------------------------------


@register(
    "corpus_span_corruption",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok,
               generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS i
        FROM documents
    ), marked AS (
        SELECT doc_id, i, tok,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                    || CAST(i AS VARCHAR)), 1, 8))::UBIGINT
                / 4294967296.0) < 0.15 AS masked
        FROM toks
    ), islands AS (
        SELECT doc_id, i, tok,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM marked WHERE masked
    ), spans AS (
        SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
               CAST(count(*) AS BIGINT) AS span_len,
               array_to_string(list(tok ORDER BY i), ' ') AS span_text
        FROM islands GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY span_start) AS BIGINT) AS mask_id,
           span_start, span_len, span_text
    FROM spans
    """,
    tags=("corpus", "masking", "denoising", "t5"),
)
def q_corpus_span_corruption(spark, sf_dir):
    """T5/UL2-style span-corruption mask generation, DETERMINISTIC: each
    token position draws the md5 uniform on (doc_id, position) and is
    marked with p=0.15; contiguous marked runs merge into spans
    (gaps-and-islands: position minus rank), each span gets a sentinel
    mask_id in document order. This is the denoising-objective
    preprocessing a seq2seq pretraining pipeline runs corpus-wide —
    reproducible across engines, executors and retries, so the SAME
    corruption can be regenerated for debugging (the reason hash-driven
    beats rng-driven in a distributed pipeline).

    Scale shape: posexplode → one per-doc window (rank) → one grouped agg;
    row volume is the token count, keys are doc-local — one exchange on
    doc_id serves both the window and the span rollup."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("i0", "tok"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "tok")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("i"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    marked = toks.filter(u < 0.15)
    w = Window.partitionBy("doc_id").orderBy("i")
    islands = marked.withColumn("grp", F.col("i") - F.row_number().over(w))
    spans = islands.groupBy("doc_id", "grp").agg(
        F.min("i").cast("long").alias("span_start"),
        F.count("*").cast("long").alias("span_len"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("i"), F.col("tok")))
                ),
                lambda s: s.getField("tok"),
            ),
            " ",
        ).alias("span_text"),
    )
    wr = Window.partitionBy("doc_id").orderBy("span_start")
    return spans.select(
        "doc_id",
        F.row_number().over(wr).cast("long").alias("mask_id"),
        "span_start",
        "span_len",
        "span_text",
    )


# ---------------------------------------------------------------------------
# Per-source quota cap — domain-cap curation (r5)
# ---------------------------------------------------------------------------


@register(
    "corpus_domain_cap",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) AS rnk
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE rnk <= 15) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE rnk > 15) AS BIGINT) AS n_dropped,
           CAST(sum(n_chars) FILTER (WHERE rnk <= 15) AS BIGINT) AS kept_chars,
           round(count(*) FILTER (WHERE rnk <= 15)
                 / CAST(count(*) AS DOUBLE), 6) AS retention
    FROM ranked GROUP BY source
    """,
    tags=("corpus", "curation", "quota"),
)
def q_corpus_domain_cap(spark, sf_dir):
    """Per-source quota cap — the domain-cap step every web-scale corpus
    pipeline runs so one crawler-friendly domain cannot dominate the
    training mixture: rank documents WITHIN each source by a deterministic
    quality proxy (length desc, id tiebreak) and keep at most 15. Reports
    the per-source kept/dropped audit the curation run logs.

    One window partitioned by the source key — a single key-shuffle whose
    per-partition state is the cap counter; at 100 TB this is the same
    shape as `sample_per_key_reservoir` (hot domains skew, and the fix is
    the same two-level cap: per-(source, shard) pre-cap then the exact
    rank), no global ordering anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = docs.withColumn("rnk", F.row_number().over(w))
    kept = F.col("rnk") <= 15
    return ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(kept, 0).otherwise(1)).cast("long").alias("n_dropped"),
        F.sum(F.when(kept, F.col("n_chars"))).cast("long").alias("kept_chars"),
        F.round(
            F.sum(F.when(kept, 1).otherwise(0)) / F.count("*").cast("double"), 6
        ).alias("retention"),
    )


@register(
    "corpus_inspection_pack",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) AS r_best,
               row_number() OVER (PARTITION BY source
                   ORDER BY n_chars ASC, doc_id) AS r_worst,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT source, role, doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM (
        SELECT source, 'best' AS role, doc_id, n_chars FROM ranked WHERE r_best = 1
        UNION ALL
        SELECT source, 'worst' AS role, doc_id, n_chars FROM ranked WHERE r_worst = 1
        UNION ALL
        SELECT source, 'median' AS role, doc_id, n_chars FROM ranked
        WHERE r_best = CAST(ceil(n / 2.0) AS BIGINT)
    )
    """,
    tags=("corpus", "curation", "inspection"),
)
def q_corpus_inspection_pack(spark, sf_dir):
    """Human-QA inspection pack: for every source, the best / worst /
    median document by the deterministic quality proxy — the artifact a
    curation run attaches to its report so a reviewer can eyeball each
    source's extremes instead of random samples. One window pass per
    ordering over the per-source partitions; exact median by nearest rank.
    Integer output, full value-hash oracle."""
    docs = load_table(spark, sf_dir, "documents")
    wb = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ww = Window.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    wn = Window.partitionBy("source")
    ranked = docs.select(
        "source", "doc_id", "n_chars",
        F.row_number().over(wb).alias("r_best"),
        F.row_number().over(ww).alias("r_worst"),
        F.count("*").over(wn).alias("n"),
    ).localCheckpoint(eager=False)
    best = ranked.filter(F.col("r_best") == 1).select(
        "source", F.lit("best").alias("role"), "doc_id", "n_chars"
    )
    worst = ranked.filter(F.col("r_worst") == 1).select(
        "source", F.lit("worst").alias("role"), "doc_id", "n_chars"
    )
    med = ranked.filter(
        F.col("r_best") == F.ceil(F.col("n") / F.lit(2.0)).cast("int")
    ).select("source", F.lit("median").alias("role"), "doc_id", "n_chars")
    return best.union(worst).union(med).select(
        "source", "role", "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )


@register(
    "corpus_oov_rate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ), train_vocab AS (
        SELECT DISTINCT term FROM toks WHERE doc_id % 5 <> 0
    ), test_toks AS (
        SELECT t.term, CAST(count(*) AS BIGINT) AS n
        FROM toks t WHERE doc_id % 5 = 0 GROUP BY t.term
    ), tagged AS (
        SELECT tt.term, tt.n,
               CASE WHEN tv.term IS NULL THEN 1 ELSE 0 END AS oov
        FROM test_toks tt LEFT JOIN train_vocab tv ON tv.term = tt.term
    )
    SELECT CAST(sum(n) AS BIGINT) AS test_tokens,
           CAST(sum(CASE WHEN oov = 1 THEN n ELSE 0 END) AS BIGINT)
               AS oov_tokens,
           CAST(count(*) AS BIGINT) AS test_types,
           CAST(sum(oov) AS BIGINT) AS oov_types,
           round(sum(CASE WHEN oov = 1 THEN n ELSE 0 END)
                 / CAST(sum(n) AS DOUBLE), 6) AS oov_token_rate,
           round(sum(oov) / CAST(count(*) AS DOUBLE), 6) AS oov_type_rate
    FROM tagged
    """,
    tags=("corpus", "vocabulary", "oov", "diagnostics"),
)
def q_corpus_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate of the held-out fifth against the training
    split's vocabulary, by token and by type — the vocabulary-coverage
    diagnostic that sizes tokenizer vocab and flags domain shift (a
    rising token-OOV rate on fresh crawl data is the first sign the
    tokenizer needs retraining). Test tokens aggregate to per-type counts
    BEFORE the vocab anti-join, so the join carries |types| rows, not
    |tokens|; the vocab side is a distinct-term relation partitioned on
    the same term key."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words_of(F.col("text"))).alias("term"))
    toks = toks.localCheckpoint(eager=False)
    train_vocab = toks.filter(F.col("doc_id") % 5 != 0).select("term").distinct()
    test_toks = (
        toks.filter(F.col("doc_id") % 5 == 0)
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tagged = test_toks.join(
        train_vocab.withColumn("_in", F.lit(1)), "term", "left"
    ).select("term", "n", F.when(F.col("_in").isNull(), 1).otherwise(0).alias("oov"))
    oov_n = F.sum(F.when(F.col("oov") == 1, F.col("n")).otherwise(0))
    return tagged.agg(
        F.sum("n").cast("long").alias("test_tokens"),
        oov_n.cast("long").alias("oov_tokens"),
        F.count("*").cast("long").alias("test_types"),
        F.sum("oov").cast("long").alias("oov_types"),
        F.round(oov_n / F.sum("n").cast("double"), 6).alias("oov_token_rate"),
        F.round(F.sum("oov") / F.count("*").cast("double"), 6).alias("oov_type_rate"),
    )


@register(
    "corpus_diversity_indices",
    oracle="""
    WITH bylang AS (
        SELECT lang AS grp, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang
    ), bysrc AS (
        SELECT source AS grp, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY source
    ), f AS (
        SELECT 'lang' AS dimension, grp, c, CAST(sum(c) OVER () AS BIGINT) AS n
        FROM bylang
        UNION ALL
        SELECT 'source' AS dimension, grp, c, CAST(sum(c) OVER () AS BIGINT) AS n
        FROM bysrc
    )
    , fp AS (
        SELECT dimension, c, n, c / CAST(n AS DOUBLE) AS p FROM f
    )
    SELECT dimension, CAST(count(*) AS BIGINT) AS n_groups,
           floor((1.0 - sum(c * c) / CAST(max(n) * max(n) AS DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS simpson_diversity,
           floor(-sum(p * ln(p)) * 1000000 + 0.5) / 1000000 AS shannon_entropy,
           floor(exp(-sum(p * ln(p))) * 1000000 + 0.5) / 1000000
               AS effective_groups
    FROM fp GROUP BY dimension
    """,
    tags=("corpus", "diversity", "mixture", "diagnostics"),
)
def q_corpus_diversity_indices(spark, sf_dir):
    """Mixture diversity of the corpus along language and source: Simpson
    index (1 − Σp²), Shannon entropy, and the effective number of groups
    (exp H) — the one-row-per-dimension summary a curation report leads
    with ("are we really multilingual, or 90% English with garnish?").
    Two grouped counts over one scan; every index is a fixed expression
    over the bounded group-count grid, canon 1e-6."""
    docs = load_table(spark, sf_dir, "documents")
    frames = []
    for dim, col in (("lang", "lang"), ("source", "source")):
        g = docs.groupBy(F.col(col).alias("grp")).agg(
            F.count("*").cast("long").alias("c")
        )
        frames.append(g.select(F.lit(dim).alias("dimension"), "grp", "c"))
    f = frames[0].union(frames[1])
    wn = Window.partitionBy("dimension")
    f = f.withColumn("n", F.sum("c").over(wn).cast("long")).withColumn(
        "p", F.col("c") / F.col("n").cast("double")
    )
    canon = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    h = -F.sum(F.col("p") * F.log("p"))
    return f.groupBy("dimension").agg(
        F.count("*").cast("long").alias("n_groups"),
        canon(
            F.lit(1.0)
            - F.sum(F.col("c") * F.col("c"))
            / (F.max("n") * F.max("n")).cast("double")
        ).alias("simpson_diversity"),
        canon(h).alias("shannon_entropy"),
        canon(F.exp(h)).alias("effective_groups"),
    )


@register(
    "corpus_bigram_llr",
    oracle=r"""
    WITH t AS (
        SELECT string_split_regex(trim(text), '\s+') AS w FROM documents
    ), bg AS (
        SELECT unnest(list_transform(range(1, len(w)),
                      i -> {'a': w[i], 'b': w[i + 1]})) AS p
        FROM t WHERE len(w) >= 2
    ), bc AS (
        SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS c_ab
        FROM bg GROUP BY p.a, p.b
    ), ra AS (
        SELECT a, CAST(sum(c_ab) AS BIGINT) AS r FROM bc GROUP BY a
    ), cb AS (
        SELECT b, CAST(sum(c_ab) AS BIGINT) AS c FROM bc GROUP BY b
    ), nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM bc),
    scored AS (
        SELECT bc.a, bc.b, bc.c_ab,
               round(2.0 * (
                   bc.c_ab * ln(CAST(bc.c_ab AS DOUBLE) * nb.n
                                / (CAST(ra.r AS DOUBLE) * cb.c))
                 + CASE WHEN ra.r - bc.c_ab > 0
                        THEN (ra.r - bc.c_ab)
                             * ln(CAST(ra.r - bc.c_ab AS DOUBLE) * nb.n
                                  / (CAST(ra.r AS DOUBLE) * (nb.n - cb.c)))
                        ELSE 0.0 END
                 + CASE WHEN cb.c - bc.c_ab > 0
                        THEN (cb.c - bc.c_ab)
                             * ln(CAST(cb.c - bc.c_ab AS DOUBLE) * nb.n
                                  / (CAST(nb.n - ra.r AS DOUBLE) * cb.c))
                        ELSE 0.0 END
                 + CASE WHEN nb.n - ra.r - cb.c + bc.c_ab > 0
                        THEN (nb.n - ra.r - cb.c + bc.c_ab)
                             * ln(CAST(nb.n - ra.r - cb.c + bc.c_ab AS DOUBLE)
                                  * nb.n
                                  / (CAST(nb.n - ra.r AS DOUBLE) * (nb.n - cb.c)))
                        ELSE 0.0 END), 6) AS llr
        FROM bc JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nb
        WHERE bc.c_ab >= 5
    )
    SELECT a, b, c_ab, llr FROM scored
    ORDER BY llr DESC, a, b LIMIT 20
    """,
    tags=("corpus", "text", "collocation"),
)
def q_corpus_bigram_llr(spark, sf_dir):
    """Top-20 collocations by Dunning's log-likelihood ratio — the
    collocation statistic that, unlike PMI (`corpus_bigram_pmi`), does not
    over-reward rare pairs: LLR = 2·Σ_ij k_ij·ln(k_ij·N / (r_i·c_j)) over
    the 2×2 contingency of (first word = a) × (second word = b), zero
    cells contributing zero.  All four cells derive from exact BIGINT
    bigram counts and margins (one explode, three grouped aggs, margins
    broadcast); ln() applies to exact count ratios, round 1e-6; top-k via
    TakeOrdered with the bigram tiebreak — same shape and min-support 5
    as the PMI query, so the two rankings are directly comparable."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("w"))
    idx = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg = t.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("w", i).alias("a"),
                    F.element_at("w", i + 1).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    bc = bg.groupBy("a", "b").agg(F.count("*").cast("long").alias("c_ab"))
    ra = bc.groupBy("a").agg(F.sum("c_ab").cast("long").alias("r"))
    cb = bc.groupBy("b").agg(F.sum("c_ab").cast("long").alias("c"))
    nb = bc.agg(F.sum("c_ab").cast("long").alias("n"))
    k11 = F.col("c_ab").cast("double")
    k12 = (F.col("r") - F.col("c_ab")).cast("double")
    k21 = (F.col("c") - F.col("c_ab")).cast("double")
    k22 = (F.col("n") - F.col("r") - F.col("c") + F.col("c_ab")).cast("double")
    n = F.col("n").cast("double")
    r = F.col("r").cast("double")
    c = F.col("c").cast("double")
    term = lambda k, e: F.when(k > 0, k * F.log(k * n / e)).otherwise(F.lit(0.0))  # noqa: E731
    llr = 2.0 * (
        k11 * F.log(k11 * n / (r * c))
        + term(k12, r * (n - c))
        + term(k21, (n - r) * c)
        + term(k22, (n - r) * (n - c))
    )
    scored = (
        bc.filter(F.col("c_ab") >= 5)
        .join(ra, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(nb))
        .select("a", "b", "c_ab", F.round(llr, 6).alias("llr"))
    )
    return scored.orderBy(F.desc("llr"), "a", "b").limit(20)


# ---------------------------------------------------------------------------
# Deterministic weighted sampling — Efraimidis–Spirakis with md5 uniforms (r8)
# ---------------------------------------------------------------------------


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight: F.Column,
    n: int = 3,
) -> DataFrame:
    """Weighted sampling without replacement, one pass, DETERMINISTIC:
    the A-ES scheme (Efraimidis & Spirakis 2006, public) ranks each row
    by key = ln(u)/w and keeps the per-group top-n — exactly the
    distribution of sequential weighted draws — with the uniform u
    derived from the cross-engine md5-60 hash of the row id instead of a
    RNG.  Replacing the RNG with a keyed hash is what makes the sample
    REPRODUCIBLE across engines, retries, and cluster sizes (the same
    property the deterministic-shuffle operator relies on) and gives the
    query a full value-hash DuckDB oracle — the difference between
    "sampled roughly like this" and an auditable training-mix manifest.

    Scale shape: the key is one pure-codegen projection per row (hash,
    ln, divide — no shuffle, no RNG state); the per-group top-n is a
    window that Spark 4 runs with WindowGroupLimit pushdown (partial
    top-n per task BEFORE the group exchange), so the exchange carries
    O(n·groups·tasks) rows, not the corpus."""
    from ..functions.hashing import md5_60  # noqa: PLC0415

    # md5_60 is a 60-bit hash (range [0, 2^60)); dividing (h+1) by 2^60
    # makes u exactly uniform on (0, 1] — dividing by 2^61 would halve the
    # range and skew the A-ES keys by a constant ln(0.5)/w offset.
    u = (md5_60(F.col(id_col).cast("string")) + F.lit(1)).cast("double") / float(
        1 << 60
    )
    key = F.log(u) / weight
    win = Window.partitionBy(group_col).orderBy(
        F.desc(F.round(key, 9)), F.asc(id_col)
    )
    return (
        df.withColumn("_w", weight)
        .withColumn("_k", key)
        .withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= n)
    )


def _weighted_sample_oracle() -> str:
    from ..functions.hashing import md5_60_sql  # noqa: PLC0415

    u = f"(({md5_60_sql('CAST(doc_id AS VARCHAR)')}) + 1) / {float(1 << 60)!r}"
    return f"""
    WITH d AS (
        SELECT source, doc_id, n_chars,
               ln(1.0 + n_chars) AS w,
               {u} AS u
        FROM documents
    )
    SELECT source, doc_id, n_chars,
           round(w, 6) AS weight,
           round(ln(u) / w, 9) AS skey,
           CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY round(ln(u) / w, 9) DESC, doc_id) AS BIGINT) AS rank
    FROM d
    QUALIFY rank <= 3
    """


@register(
    "corpus_weighted_sample",
    oracle=_weighted_sample_oracle(),
    tags=("corpus", "sampling", "curation", "deterministic"),
)
def q_corpus_weighted_sample(spark, sf_dir):
    """Quality-weighted corpus subsample, 3 docs per source, w =
    ln(1 + n_chars) (log-tempered length as the quality proxy — swap in
    any positive score column).  The auditable form of 'sample the
    training mix proportional to quality': same inputs → same sample on
    any engine, any cluster size, any retry — and therefore fully
    value-hash-oracled, unlike RNG sampling (`sample_stratified` stays
    rows-only by design; this is its deterministic weighted twin)."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.log(F.lit(1.0) + F.col("n_chars").cast("double"))
    out = weighted_sample_per_group(docs, "source", "doc_id", w, n=3)
    return out.select(
        "source",
        "doc_id",
        "n_chars",
        F.round("_w", 6).alias("weight"),
        F.round("_k", 9).alias("skey"),
        "rank",
    )


# ---------------------------------------------------------------------------
# Iterative BPE training (r10) — true merge ROUNDS, not just the first table
# ---------------------------------------------------------------------------

_BPE_SEP = "\x1f"  # unit separator: wraps every symbol as <SEP>sym<SEP>


def bpe_train_merges(df: DataFrame, rounds: int = 3, text: str = "text") -> DataFrame:
    """Iterative byte-pair-encoding TRAINING over the corpus (Sennrich et
    al. 2016, public): unlike `corpus_bpe_first_merges` (one static pair
    table), this runs ``rounds`` actual merge rounds — after each argmax
    merge the word-type symbol sequences are REWRITTEN, so round r+1's
    pair counts reflect the merged vocabulary.  That sequential dynamic
    (the merge changes the next count table) is what makes BPE training
    non-trivial to distribute; here each round is one grouped agg + a
    1-row broadcast model join.

    Representation: a word's symbol sequence is one string with every
    symbol wrapped in U+001F (``<S>h<S><S>e<S>…``), so merging pair (a,b)
    is a plain non-regex ``replace(seq, <S>a<S><S>b<S>, <S>ab<S>)`` —
    left-to-right non-overlapping, exactly greedy BPE merge semantics
    ("aaa" + merge(a,a) -> [aa, a]) with whole-symbol anchoring for free
    (both delimiters must match), identical in Spark and DuckDB.

    Scale shape: everything runs over the word-TYPE table weighted by
    counts (Zipf: |types| << |tokens| — the types-not-tokens trick a real
    BPE trainer uses), localCheckpointed once so the corpus is scanned a
    single time; per round ONE pair-explode + grouped sum + a 1-row
    argmax (count DESC, pair ASC — deterministic) broadcast into the
    rewrite.  ``rounds`` is a small constant; at 100 TB the type table is
    ~millions of rows and each round is one shuffle on (a, b).

    Returns (merge_round, left_sym, right_sym, occurrences) — the learned
    merge table, the artifact a tokenizer trainer ships."""
    wf = (
        df.select(F.explode(words_of(F.col(text))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
        .select(
            F.regexp_replace(
                F.col("w"), "(.)", f"{_BPE_SEP}$1{_BPE_SEP}"
            ).alias("seq"),
            "c",
        )
        .localCheckpoint(eager=True)
    )
    out = None
    cur = wf
    for r in range(1, rounds + 1):
        syms = F.split(F.btrim(F.col("seq"), F.lit(_BPE_SEP)), _BPE_SEP * 2)
        pairs = (
            cur.select(
                F.explode(
                    F.zip_with(
                        F.slice(syms, F.lit(1), F.size(syms) - 1),
                        F.slice(syms, F.lit(2), F.size(syms) - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
                "c",
            )
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "c")
            .groupBy("a", "b")
            .agg(F.sum("c").cast("long").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        row = best.select(
            F.lit(r).cast("long").alias("merge_round"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.col("cnt").alias("occurrences"),
        )
        out = row if out is None else out.union(row)
        if r < rounds:
            cur = cur.crossJoin(F.broadcast(best)).select(
                F.replace(
                    F.col("seq"),
                    F.concat(
                        F.lit(_BPE_SEP), F.col("a"), F.lit(_BPE_SEP),
                        F.lit(_BPE_SEP), F.col("b"), F.lit(_BPE_SEP),
                    ),
                    F.concat(
                        F.lit(_BPE_SEP), F.col("a"), F.col("b"), F.lit(_BPE_SEP)
                    ),
                ).alias("seq"),
                "c",
            )
    return out


def _bpe_cte_steps(rounds: int = 3) -> tuple[list[str], str]:
    """Shared DuckDB CTE chain for BPE training: word-type table, initial
    delimited sequences, then per round a pair-count table p{r}, the
    argmax b{r}, and (between rounds) the rewritten s{r+1}.  Returns
    (steps, chr-literal) for composition by the trainer and fertility
    oracles."""
    s = "chr(31)"
    steps = [
        f"""wf AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents)
        WHERE length(w) >= 2 GROUP BY w
    ), s1 AS MATERIALIZED (
        SELECT regexp_replace(w, '(.)', {s} || '\\1' || {s}, 'g') AS seq, c
        FROM wf
    )"""
    ]
    for r in range(1, rounds + 1):
        steps.append(f"""p{r} AS MATERIALIZED (
        SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(c) AS BIGINT) AS cnt
        FROM (SELECT string_split(trim(seq, {s}), {s} || {s}) AS syms, c
              FROM s{r}),
             unnest(range(1, len(syms))) AS t(i)
        GROUP BY a, b
    ), b{r} AS MATERIALIZED (
        SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1
    )""")
        if r < rounds:
            steps.append(f"""s{r + 1} AS MATERIALIZED (
        SELECT replace(seq, {s} || a || {s} || {s} || b || {s},
                       {s} || a || b || {s}) AS seq, c
        FROM s{r} CROSS JOIN b{r}
    )""")
    return steps, s


def _bpe_train_oracle(rounds: int = 3) -> str:
    steps, _ = _bpe_cte_steps(rounds)
    selects = [
        f"SELECT CAST({r} AS BIGINT) AS merge_round, a AS left_sym, "
        f"b AS right_sym, cnt AS occurrences FROM b{r}"
        for r in range(1, rounds + 1)
    ]
    return "WITH " + ",\n    ".join(steps) + "\n    " + "\n    UNION ALL ".join(selects)


@register(
    "corpus_bpe_train_merges",
    oracle=_bpe_train_oracle(),
    tags=("corpus", "tokenizer", "bpe", "iterative"),
)
def q_corpus_bpe_train_merges(spark, sf_dir):
    """Three true BPE merge rounds over the corpus word-type table — the
    learned merge list (round, pair, corpus-weighted occurrences), with
    each round's counts computed over the vocabulary AFTER the previous
    merge (greedy left-to-right rewrite).  The DuckDB oracle unrolls the
    identical three rounds over the identical delimited-string
    representation, so the merge choices, tie-breaks, and counts are all
    value-hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_train_merges(docs, rounds=3)


# ---------------------------------------------------------------------------
# DSIR importance weights (r10) — hashed-n-gram domain selection
# (Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling" — public)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096


def dsir_weights(
    df: DataFrame,
    target_pred: F.Column,
    buckets: int = _DSIR_BUCKETS,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR log importance weight
    log w(d) = Σ_tokens [ln p_target(b(t)) − ln p_raw(b(t))] over hashed
    unigram buckets with add-one smoothing — the importance-resampling
    score for selecting raw-corpus documents that look like a target
    domain.  Positive = target-like, negative = raw-typical.  The two
    bucket LMs are DISJOINT (raw = the complement of the target split):
    contrasting target against a pool that contains it only shrinks every
    ratio below the smoothing correction and nothing separates.

    Bit-parity: both bucket LMs are exact BIGINT counts; each bucket's
    log-ratio collapses to ONE ln of an exact rational (the
    `corpus_bigram_pmi` convention), quantized to integer micro-nats
    (floor(x·1e6 + 0.5)), so the per-document sum Σ n_db · lr_b is exact
    BIGINT arithmetic — immune to aggregation order on both engines.

    Scale shape: two grouped sums build the bounded bucket tables (≤
    ``buckets`` rows — the mergeable LM state), the scoring join is
    (doc, bucket) × broadcast(bucket model), and everything else is
    per-row hashing.  No shuffle touches raw text twice.  (The exact
    integer cross-product (ct+1)·(totr+V) inside the ln overflows BIGINT
    past ~3e9 corpus tokens; at that scale hoist to the algebraically
    equal DOUBLE form ((ct+1)/(cr+1))·((totr+V)/(tott+V)) — kept in
    integer form here because it is bit-checkable.)

    Returns (doc_id, n_tokens, logw_micro, logw)."""
    toks = df.select(
        F.col(id_col),
        target_pred.alias("is_tgt"),
        F.explode(words_of(F.col(text))).alias("w"),
    ).select(
        id_col, "is_tgt", (md5_60(F.col("w")) % buckets).alias("b")
    )
    db = toks.groupBy(id_col, "b").agg(F.count("*").cast("long").alias("n"))
    model = toks.groupBy("b").agg(
        F.sum(F.when(~F.col("is_tgt"), 1).otherwise(0)).cast("long").alias("cr"),
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).cast("long").alias("ct"),
    )
    return dsir_score(db, model, buckets=buckets, id_col=id_col)


def dsir_score(
    db: DataFrame,
    model: DataFrame,
    buckets: int = _DSIR_BUCKETS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents from a (doc, bucket, n) relation and a (bucket, cr,
    ct) LM-count model — the shared core of the batch query and the
    streaming serve (`DsirStreamModel`), so stream == batch is equality
    of inputs, not a reimplementation."""
    totals = model.agg(
        F.sum("cr").cast("long").alias("totr"), F.sum("ct").cast("long").alias("tott")
    )
    lr = model.crossJoin(F.broadcast(totals)).select(
        "b",
        F.floor(
            F.log(
                (
                    (F.col("ct") + 1) * (F.col("totr") + buckets)
                ).cast("double")
                / ((F.col("cr") + 1) * (F.col("tott") + buckets)).cast("double")
            )
            * 1000000.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lr"),
    )
    scored = db.join(F.broadcast(lr), "b").groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum(F.col("n") * F.col("lr")).cast("long").alias("logw_micro"),
    )
    return scored.select(
        id_col,
        "n_tokens",
        "logw_micro",
        F.round(F.col("logw_micro").cast("double") / 1000000.0, 6).alias("logw"),
    )


def _dsir_oracle(buckets: int = _DSIR_BUCKETS) -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id, lang = 'en' AS is_tgt,
               {md5_60_sql("w")} % {buckets} AS b
        FROM (SELECT doc_id, lang,
                     unnest(string_split_regex(trim(text), '\\s+')) AS w
              FROM documents)
    ), db AS (
        SELECT doc_id, b, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY doc_id, b
    ), model AS (
        SELECT b,
               CAST(sum(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr,
               CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
        FROM toks GROUP BY b
    ), tot AS (
        SELECT CAST(sum(cr) AS BIGINT) AS totr, CAST(sum(ct) AS BIGINT) AS tott
        FROM model
    ), lr AS (
        SELECT b,
               CAST(floor(ln(CAST((ct + 1) * (totr + {buckets}) AS DOUBLE)
                            / CAST((cr + 1) * (tott + {buckets}) AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT) AS lr
        FROM model CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(sum(n * lr) AS BIGINT) AS logw_micro,
           round(CAST(sum(n * lr) AS BIGINT) / 1000000.0, 6) AS logw
    FROM db JOIN lr USING (b)
    GROUP BY doc_id
    """


@register(
    "corpus_dsir_weights",
    oracle=_dsir_oracle(),
    tags=("corpus", "dsir", "importance", "selection"),
)
def q_corpus_dsir_weights(spark, sf_dir):
    """DSIR importance weights with English documents as the target
    domain: hashed-unigram bucket LMs (4096 buckets, add-one smoothing)
    for target and raw corpus, per-doc log weight as an exact
    BIGINT micro-nat sum — the data-selection score a pretraining
    pipeline ranks its raw crawl by.  Fully value-hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs, F.col("lang") == "en")


def tokenizer_fertility(
    df: DataFrame, rounds: int = 3, text: str = "text", grp: str = "source"
) -> DataFrame:
    """Tokenizer FERTILITY audit (subword tokens per word) of the
    ``rounds``-merge BPE tokenizer learned by :func:`bpe_train_merges`,
    broken down per ``grp`` — the standard cross-domain tokenizer-quality
    readout (a domain with high fertility pays more sequence length per
    word; the multilingual-tokenizer fairness metric).

    The merge table is learned GLOBALLY, then applied to each group's
    word-TYPE table (1-char words, which the trainer's pair table never
    sees, still count — they tokenize to themselves).  Application is
    ``rounds`` sequential 1-row broadcast rewrites; counting is
    size-of-split — no per-token work anywhere.

    Returns (grp, n_words, n_subwords, fertility)."""
    merges = bpe_train_merges(df, rounds=rounds, text=text).localCheckpoint(
        eager=True
    )
    wf = (
        df.select(F.col(grp), F.explode(words_of(F.col(text))).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy(grp, "w")
        .agg(F.count("*").cast("long").alias("c"))
        .select(
            grp,
            F.regexp_replace(
                F.col("w"), "(.)", f"{_BPE_SEP}$1{_BPE_SEP}"
            ).alias("seq"),
            "c",
        )
    )
    cur = wf
    for r in range(1, rounds + 1):
        mr = merges.filter(F.col("merge_round") == r).select(
            F.col("left_sym").alias("_a"), F.col("right_sym").alias("_b")
        )
        cur = cur.crossJoin(F.broadcast(mr)).select(
            grp,
            F.replace(
                F.col("seq"),
                F.concat(
                    F.lit(_BPE_SEP), F.col("_a"), F.lit(_BPE_SEP),
                    F.lit(_BPE_SEP), F.col("_b"), F.lit(_BPE_SEP),
                ),
                F.concat(
                    F.lit(_BPE_SEP), F.col("_a"), F.col("_b"), F.lit(_BPE_SEP)
                ),
            ).alias("seq"),
            "c",
        )
    nsym = F.size(F.split(F.btrim(F.col("seq"), F.lit(_BPE_SEP)), _BPE_SEP * 2))
    return (
        cur.select(grp, "c", nsym.cast("long").alias("nsym"))
        .groupBy(grp)
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("nsym")).cast("long").alias("n_subwords"),
        )
        .select(
            grp,
            "n_words",
            "n_subwords",
            F.round(
                F.col("n_subwords").cast("double") / F.col("n_words").cast("double"),
                6,
            ).alias("fertility"),
        )
    )


def _fertility_oracle(rounds: int = 3) -> str:
    steps, s = _bpe_cte_steps(rounds)
    steps.append(f"""f1 AS MATERIALIZED (
        SELECT source,
               regexp_replace(w, '(.)', {s} || '\\1' || {s}, 'g') AS seq,
               CAST(count(*) AS BIGINT) AS c
        FROM (SELECT source,
                     unnest(string_split_regex(trim(text), '\\s+')) AS w
              FROM documents)
        WHERE length(w) >= 1
        GROUP BY source, w""" + "\n    )")
    for r in range(1, rounds + 1):
        steps.append(f"""f{r + 1} AS MATERIALIZED (
        SELECT source,
               replace(seq, {s} || a || {s} || {s} || b || {s},
                       {s} || a || b || {s}) AS seq, c
        FROM f{r} CROSS JOIN b{r}
    )""")
    return (
        "WITH "
        + ",\n    ".join(steps)
        + f"""
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_words,
           CAST(sum(c * nsym) AS BIGINT) AS n_subwords,
           round(CAST(sum(c * nsym) AS BIGINT)
                 / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE), 6) AS fertility
    FROM (SELECT source, c,
                 CAST(len(string_split(trim(seq, {s}), {s} || {s})) AS BIGINT)
                     AS nsym
          FROM f{rounds + 1})
    GROUP BY source
    """
    )


@register(
    "corpus_bpe_fertility",
    oracle=_fertility_oracle(),
    tags=("corpus", "tokenizer", "bpe", "fertility"),
)
def q_corpus_bpe_fertility(spark, sf_dir):
    """Per-source fertility of the 3-merge BPE tokenizer learned on the
    whole corpus: train globally (`corpus_bpe_train_merges`), apply the
    merge table to each source's word types, report subword-per-word
    ratios — the LEARNED-tokenizer companion of `corpus_tokenizer_fertility`
    (which measures whitespace-token byte cost per language): this one
    audits what the induced merge table actually buys per source.  The oracle replays training AND application end to end."""
    docs = load_table(spark, sf_dir, "documents")
    return tokenizer_fertility(docs, rounds=3)


@register(
    "corpus_dsir_stream_serve",
    oracle=_dsir_oracle(),
    tags=("corpus", "dsir", "streaming", "incremental"),
)
def q_corpus_dsir_stream_serve(spark, sf_dir):
    """INCREMENTAL twin of `corpus_dsir_weights` exercised end-to-end: the
    documents table is ingested in three deterministic micro-batches
    (split on pmod(xxhash64(doc_id), 3)) through `DsirStreamModel` —
    per-batch (bucket, cr, ct) LM grids + per-doc bucket counts published
    under batch_id directories — and the SERVED weights are returned.
    The oracle is the plain one-batch SQL: passing value-hash-exact
    proves the merge-of-grids model is bit-identical to batch, including
    the retroactive re-weighting of early documents as later batches
    shift both bucket LMs.  (Store outlives the returned DataFrame — the
    `corpus_df_index_serve` Spark-4 lazy-analyzer note.)"""
    import atexit
    import shutil
    import tempfile

    from ..streaming.dsir_stream import DsirStreamModel

    docs = load_table(spark, sf_dir, "documents")
    store = tempfile.mkdtemp(prefix="dsir_serve_")
    atexit.register(shutil.rmtree, store, ignore_errors=True)
    model = DsirStreamModel(spark, store, F.col("lang") == "en")
    for bid in range(3):
        model.ingest_batch(
            docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == bid), bid
        )
    return model.serve_weights()


@register(
    "corpus_kneser_ney_bigram",
    oracle=r"""
    WITH t AS (
        SELECT string_split_regex(trim(text), '\s+') AS w FROM documents
    ), bg AS (
        SELECT unnest(list_transform(range(1, len(w)),
                      i -> {'a': w[i], 'b': w[i + 1]})) AS p
        FROM t WHERE len(w) >= 2
    ), bc AS (
        SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS c_ab
        FROM bg GROUP BY p.a, p.b
    ), lc AS (
        SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a,
               CAST(count(*) AS BIGINT) AS n1p_fwd
        FROM bc GROUP BY a
    ), rc AS (
        SELECT b, CAST(count(*) AS BIGINT) AS n1p_back FROM bc GROUP BY b
    ), nt AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bc),
    scored AS (
        SELECT bc.a, bc.b, bc.c_ab, lc.c_a,
               floor((greatest(CAST(bc.c_ab AS DOUBLE) - 0.75, 0.0)
                      / lc.c_a) * 1000000 + 0.5) / 1000000 AS p_ml_disc,
               floor(((0.75 * lc.n1p_fwd / lc.c_a)
                      * (CAST(rc.n1p_back AS DOUBLE) / nt.n_types))
                     * 1000000 + 0.5) / 1000000 AS p_cont_part,
               floor((greatest(CAST(bc.c_ab AS DOUBLE) - 0.75, 0.0) / lc.c_a
                      + (0.75 * lc.n1p_fwd / lc.c_a)
                        * (CAST(rc.n1p_back AS DOUBLE) / nt.n_types))
                     * 1000000 + 0.5) / 1000000 AS p_kn
        FROM bc JOIN lc ON lc.a = bc.a JOIN rc ON rc.b = bc.b CROSS JOIN nt
        WHERE bc.c_ab >= 5
    )
    SELECT a, b, c_ab, p_ml_disc, p_cont_part, p_kn FROM scored
    ORDER BY p_kn DESC, a, b LIMIT 20
    """,
    tags=("corpus", "text", "language-model", "kneser-ney"),
)
def q_corpus_kneser_ney_bigram(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities (absolute discount
    D = 0.75) — the smoothing every production n-gram LM uses, and the
    honest upgrade over `corpus_lm_perplexity`'s add-k: P(b|a) =
    max(c(ab)−D, 0)/c(a) + D·N1+(a·)/c(a) · N1+(·b)/N1+(··), where the
    continuation probability counts CONTEXTS b follows, not tokens — the
    "San Francisco" correction (frequent word, single context → low
    continuation mass).  Top-20 bigrams by P_KN at min-support 5, with the
    discounted-ML and continuation components reported separately.

    Bit-parity: all five count relations are exact BIGINTs from two
    grouped aggs over one bigram explosion (the `corpus_bigram_pmi`
    plan); each probability is ONE fixed-shape expression of exact
    integers, floor-canonicalized at 1e-6, and the top-k orders by the
    canonicalized value with the bigram itself as tiebreak.  Scale: the
    bigram-type relation is the only shuffle; left/right/context totals
    are grouped folds of it; no corpus re-scan."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(F.split(F.trim(F.col("text")), r"\s+").alias("w"))
    idx = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg = t.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("w", i).alias("a"),
                    F.element_at("w", i + 1).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    bc = bg.groupBy("a", "b").agg(F.count("*").cast("long").alias("c_ab"))
    bc = bc.localCheckpoint(eager=False)
    lc = bc.groupBy("a").agg(
        F.sum("c_ab").cast("long").alias("c_a"),
        F.count("*").cast("long").alias("n1p_fwd"),
    )
    rc = bc.groupBy("b").agg(F.count("*").cast("long").alias("n1p_back"))
    nt = bc.agg(F.count("*").cast("long").alias("n_types"))
    canon = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    disc = F.greatest(F.col("c_ab").cast("double") - F.lit(0.75), F.lit(0.0)) / F.col(
        "c_a"
    )
    lam = F.lit(0.75) * F.col("n1p_fwd") / F.col("c_a")
    cont = F.col("n1p_back").cast("double") / F.col("n_types")
    scored = (
        bc.filter(F.col("c_ab") >= 5)
        .join(lc, "a")
        .join(rc, "b")
        .crossJoin(F.broadcast(nt))
        .select(
            "a",
            "b",
            "c_ab",
            canon(disc).alias("p_ml_disc"),
            canon(lam * cont).alias("p_cont_part"),
            canon(disc + lam * cont).alias("p_kn"),
        )
    )
    return scored.orderBy(F.desc("p_kn"), "a", "b").limit(20)


# ---------------------------------------------------------------------------
# URL canonicalization + dedup (r11) — the crawl-pipeline front door
# ---------------------------------------------------------------------------


def canonical_url(url):
    """Canonicalize a URL column with pure Catalyst string expressions
    (RFC 3986 syntax-based normalization + the de-facto crawl extras):

    - lowercase scheme and authority;
    - strip the scheme-default port (``:80`` http, ``:443`` https);
    - drop the fragment;
    - strip a leading ``www.`` label;
    - collapse trailing slashes on the path (root stays ``/``; an empty
      path becomes ``/``);
    - drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
      CASE-INSENSITIVELY — real crawls see ``UTM_Source=``; ADVICE r11)
      and sort the survivors bytewise.

    Returns ``(canonical, host)`` Columns; the registrable domain is a
    Public-Suffix-List broadcast join over the host — see
    :func:`with_registrable_domain` (r12: replaced the last-two-labels
    heuristic, which mis-grouped ``co.uk``-style multi-label suffixes).

    Scale: everything is codegen'd regexp/array work, no UDF, no shuffle;
    the downstream dedup is one hash aggregation on the canonical key —
    URL keys are high-cardinality and unskewed, so this is the cheapest
    dedup tier and the one to run FIRST at 100 TB (before any content
    hashing) — it needs only the URL column, never the payload."""
    nofrag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    auth = F.lower(F.regexp_extract(nofrag, r"^[^:]+://([^/?#]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path0 = F.regexp_extract(nofrag, r"^[^:]+://[^/?#]+([^?#]*)", 1)
    stripped = F.regexp_replace(path0, "/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    query = F.regexp_extract(nofrag, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike("(?i)^(utm_[^=]*|gclid|fbclid)(=|$)"),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )
    return canonical, host


# Synthetic Public Suffix List excerpt (publicsuffix.org shape): multi-label
# suffixes are what the last-two-labels heuristic got wrong — 'metro.co.uk'
# is a registrable domain, 'co.uk' is not.  A production pipeline loads the
# real ~10k-row list; the join shape below is identical.
_PSL_SUFFIXES = (
    "com", "org", "net", "io", "edu", "gov",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "jp", "co.jp", "com.au",
)

_PSL_SQL_VALUES = ", ".join(f"('{s}')" for s in _PSL_SUFFIXES)


def psl_table(spark, suffixes: tuple[str, ...] = _PSL_SUFFIXES):
    """The PSL as a tiny broadcastable relation (suffix string)."""
    return spark.createDataFrame([(s,) for s in suffixes], "suffix string")


def _tail_labels(host, n: int):
    """The host's trailing ``n`` dot-separated labels ('' when the host has
    fewer than n labels)."""
    return F.regexp_extract(host, r"((?:[^.]+\.){%d}[^.]+)$" % (n - 1), 1)


# Above this size the suffix membership test leaves codegen'd IN-literals
# for the distinct-host broadcast map (per-row literal compares would cost
# |PSL| string equals per row on the real ~10k-row list).
_PSL_LITERAL_MAX = 256


def with_registrable_domain(
    df, host_col: str = "host", suffixes: tuple[str, ...] = _PSL_SUFFIXES
):
    """Add ``reg_domain`` via the Public-Suffix-List rule: the LONGEST
    suffix in the PSL matching the host's trailing labels, plus one more
    label.  Unknown TLDs fall back to the single-label default (reg
    domain = last two labels) — the ``*`` wildcard of the real list; a
    host that IS a public suffix falls back to itself.

    Probe depth is DERIVED from the deepest suffix in ``suffixes``
    (ADVICE r12: the fixed last-2/last-3 probes silently mis-grouped
    3+-label rules once the real ~10k-row PSL is swapped in) — a list
    containing e.g. ``act.edu.au`` automatically probes 3-label tails.

    Two plan shapes by list size (VERDICT r12 item 5 — the r12 version
    paid two per-row broadcast hash joins, a measured 2× on the URL
    tier):

    - ``len(suffixes) <= _PSL_LITERAL_MAX``: the membership tests inline
      as codegen'd IN-literal predicates per tail depth — ZERO joins,
      zero extra stages, the whole rule rides the scan projection (the
      registered queries' path: the synthetic excerpt is 14 rows);
    - larger lists (the real PSL): the suffix probe runs against the
      DISTINCT hosts only — a relation orders of magnitude smaller than
      the fact side — and the (host → reg_domain) map broadcasts back
      onto the fact rows as ONE hash join.  Per-host tail extraction +
      probe cost is proportional to |hosts| (the crawl's host census,
      ~10⁷ at 100 TB), not |rows|; past the broadcast ceiling the same
      map joins shuffle-hash on the host key."""
    max_labels = max(s.count(".") + 1 for s in suffixes)

    def reg_expr(h):
        """sdepth + reg-domain projection for a host Column — longest
        matching suffix wins (ascending wrap order puts the DEEPEST probe
        outermost in the when-chain, so it takes precedence)."""
        sdepth = F.lit(1)
        for n in range(2, max_labels + 1):
            set_n = [s for s in suffixes if s.count(".") + 1 == n]
            if set_n:
                sdepth = F.when(_tail_labels(h, n).isin(set_n), n).otherwise(sdepth)
        # reg domain = suffix depth + 1 trailing labels: index k of this
        # array is the (k+1)-label tail, so element_at(., sd) = tail(sd+1).
        tails_plus = F.array(
            *[_tail_labels(h, n) for n in range(2, max_labels + 2)]
        )
        reg = F.element_at(tails_plus, sdepth.cast("int"))
        return F.when(reg == "", h).otherwise(reg)

    if len(suffixes) <= _PSL_LITERAL_MAX:
        return df.select(*df.columns, reg_expr(F.col(host_col)).alias("reg_domain"))

    h = F.col("_h")
    hosts = df.select(F.col(host_col).alias("_h")).distinct()
    psl = psl_table(df.sparkSession, suffixes)
    cands = hosts.select(
        "_h",
        F.posexplode(
            F.array(*[_tail_labels(h, n) for n in range(2, max_labels + 1)])
        ).alias("_i", "_tail"),
    )
    matched = (
        cands.filter(F.col("_tail") != "")
        .join(F.broadcast(psl.withColumnRenamed("suffix", "_tail")), "_tail")
        .groupBy("_h")
        .agg(F.max(F.col("_i") + 2).alias("_sdepth"))
    )
    sd = F.coalesce(F.col("_sdepth"), F.lit(1)).cast("int")
    tails_plus = F.array(*[_tail_labels(h, n) for n in range(2, max_labels + 2)])
    reg = F.element_at(tails_plus, sd)
    regmap = hosts.join(matched, "_h", "left").select(
        h.alias(host_col),
        F.when(reg == "", h).otherwise(reg).alias("reg_domain"),
    )
    return df.join(F.broadcast(regmap), host_col, "left").select(
        *df.columns, "reg_domain"
    )


# Deterministic messy-URL synthesis shared by both engines: documents has
# no URL column, so each doc gets a crawl-style URL whose messiness class
# is doc_id%6 and whose page identity is doc_id%200 — docs sharing a page
# key differ only in case / trailing slash / www / default port / fragment
# / tracking params (incl. mixed-case UTM_Source) / param order, exactly
# the variation canonicalization must collapse.  (doc_id%4 is constant
# within a page-key group since 200 ≡ 0 mod 4, so the domain split is
# group-stable; the %4==3 slice uses a multi-label public suffix so the
# PSL rule is exercised, not just the default.)
_URL_SYNTH_SQL = """
        CASE doc_id % 6
          WHEN 0 THEN 'https://' || source || '.news.' || dom || '/articles/item-' || k
          WHEN 1 THEN 'HTTPS://' || upper(source) || '.News.' || upper(dom) || '/articles/item-' || k || '/'
          WHEN 2 THEN 'https://www.' || source || '.news.' || dom || '/articles/item-' || k || '?UTM_Source=feed&utm_medium=rss'
          WHEN 3 THEN 'https://' || source || '.news.' || dom || ':443/articles/item-' || k || '#section-2'
          WHEN 4 THEN 'https://' || source || '.news.' || dom || '/articles/item-' || k || '?page=2&sort=asc'
          ELSE 'https://' || source || '.news.' || dom || '/articles/item-' || k || '?sort=asc&page=2&fbclid=abc123'
        END
"""


def _synth_url_spark():
    k = (F.col("doc_id") % 200).cast("string")
    dom = (
        F.when(F.col("doc_id") % 4 < 2, F.lit("example.com"))
        .when(F.col("doc_id") % 4 == 2, F.lit("sample.org"))
        .otherwise(F.lit("metro.co.uk"))
    )
    base = lambda *parts: F.concat(*parts)  # noqa: E731
    src, lit = F.col("source"), F.lit
    stem = lambda d: F.concat(src, lit(".news."), d, lit("/articles/item-"), k)  # noqa: E731
    v = F.col("doc_id") % 6
    return (
        F.when(v == 0, base(lit("https://"), stem(dom)))
        .when(
            v == 1,
            base(
                lit("HTTPS://"),
                F.upper(src),
                lit(".News."),
                F.upper(dom),
                lit("/articles/item-"),
                k,
                lit("/"),
            ),
        )
        .when(v == 2, base(lit("https://www."), stem(dom), lit("?UTM_Source=feed&utm_medium=rss")))
        .when(
            v == 3,
            base(
                lit("https://"),
                src,
                lit(".news."),
                dom,
                lit(":443/articles/item-"),
                k,
                lit("#section-2"),
            ),
        )
        .when(v == 4, base(lit("https://"), stem(dom), lit("?page=2&sort=asc")))
        .otherwise(base(lit("https://"), stem(dom), lit("?sort=asc&page=2&fbclid=abc123")))
    )


# Shared WITH-chain (synth -> parse -> canonicalize) reused by the dedup and
# crawl-frontier oracles; ends with the `canon(doc_id, url, canonical_url,
# reg_domain)` CTE.
_URL_CANON_CTES = f"""
    WITH u AS (
        SELECT doc_id,
               CAST(doc_id % 200 AS VARCHAR) AS k,
               CASE WHEN doc_id % 4 < 2 THEN 'example.com'
                    WHEN doc_id % 4 = 2 THEN 'sample.org'
                    ELSE 'metro.co.uk' END AS dom,
               source
        FROM documents
    ), raw AS (
        SELECT doc_id, {_URL_SYNTH_SQL} AS url FROM u
    ), parts AS (
        SELECT doc_id, url,
               regexp_replace(url, '#.*$', '') AS nofrag
        FROM raw
    ), p2 AS (
        SELECT doc_id, url,
               lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
               lower(regexp_extract(nofrag, '^[^:]+://([^/?#]+)', 1)) AS auth,
               regexp_extract(nofrag, '^[^:]+://[^/?#]+([^?#]*)', 1) AS path0,
               regexp_extract(nofrag, '\\?([^#]*)', 1) AS query
        FROM parts
    ), p3 AS (
        SELECT doc_id, url, scheme, path0, query,
               regexp_replace(
                   CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
                        WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
                        ELSE auth END,
                   '^www\\.', '') AS host
        FROM p2
    ), psl(suffix) AS (
        VALUES {_PSL_SQL_VALUES}
    ), pm AS (
        SELECT p3.*,
               CASE WHEN m3.suffix IS NOT NULL THEN 3
                    WHEN m2.suffix IS NOT NULL THEN 2
                    ELSE 1 END AS sdepth
        FROM p3
        LEFT JOIN psl m3 ON regexp_extract(p3.host, '([^.]+\\.[^.]+\\.[^.]+)$', 1) = m3.suffix
        LEFT JOIN psl m2 ON regexp_extract(p3.host, '([^.]+\\.[^.]+)$', 1) = m2.suffix
    ), p4 AS (
        SELECT doc_id, url, scheme, host, sdepth,
               CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
                    ELSE regexp_replace(path0, '/+$', '') END AS path,
               coalesce(array_to_string(
                   list_sort(list_filter(str_split(query, '&'),
                       p -> p <> '' AND NOT regexp_matches(p, '(?i)^(utm_[^=]*|gclid|fbclid)(=|$)'))),
                   '&'), '') AS canon_q
        FROM pm
    ), canon AS (
        SELECT doc_id, url,
               scheme || '://' || host || path
                   || CASE WHEN canon_q = '' THEN '' ELSE '?' || canon_q END AS canonical_url,
               CASE sdepth
                    WHEN 3 THEN CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$', 1) = ''
                                     THEN host ELSE regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$', 1) END
                    WHEN 2 THEN CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1) = ''
                                     THEN host ELSE regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1) END
                    ELSE CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1) = ''
                              THEN host ELSE regexp_extract(host, '([^.]+\\.[^.]+)$', 1) END
               END AS reg_domain
        FROM p4
    )
"""


@register(
    "corpus_url_canonical_dedup",
    oracle=_URL_CANON_CTES + """
    SELECT canonical_url, reg_domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS survivor_doc_id
    FROM canon GROUP BY canonical_url, reg_domain
    """,
    tags=("corpus", "url", "dedup", "canonicalization"),
)
def q_corpus_url_canonical_dedup(spark, sf_dir):
    """URL canonicalization + dedup — the FIRST dedup tier of a crawl
    pipeline (before any content hashing): normalize scheme/host case,
    default ports, fragments, ``www.``, trailing slashes, and tracking
    params (case-insensitively, ADVICE r11); group by the canonical URL
    plus the PSL registrable domain and keep the min-doc_id survivor per
    group.  r12: `with_registrable_domain` replaced the last-two-labels
    heuristic — the ``metro.co.uk`` synth slice pins the multi-label
    suffix rule on both engines.

    documents has no URL column, so a deterministic messy URL is
    synthesized per doc (messiness class = doc_id%6, page key =
    doc_id%200) identically in both engines — what the value-hash then
    checks is the canonicalization pipeline itself collapsing every
    variant class.  Full oracle: pure string algebra, identical regex and
    bytewise param sort on both sides.

    Scale: no UDF, one hash agg on the canonical key plus two broadcast
    PSL joins; URL keys are high-cardinality/unskewed, and only the URL
    column is touched (column pruning leaves the payload unread at
    100 TB)."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", _synth_url_spark().alias("url"))
    canon, host = canonical_url(F.col("url"))
    c = raw.select("doc_id", "url", canon.alias("canonical_url"), host.alias("host"))
    c = with_registrable_domain(c, "host")
    return c.groupBy("canonical_url", "reg_domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("url").cast("long").alias("n_variants"),
        F.min("doc_id").cast("long").alias("survivor_doc_id"),
    )


_FRONTIER_ORACLE = _URL_CANON_CTES + """
    , surv AS (
        SELECT canonical_url, reg_domain,
               regexp_extract(canonical_url, '^[^:]+://([^/?#]+)', 1) AS host,
               CAST(min(doc_id) AS BIGINT) AS survivor_doc_id
        FROM canon GROUP BY canonical_url, reg_domain
    ), pri AS (
        SELECT s.*, d.n_chars
        FROM surv s JOIN documents d ON d.doc_id = s.survivor_doc_id
    ), sched AS (
        SELECT host, reg_domain, canonical_url, survivor_doc_id,
               CAST(row_number() OVER (
                   PARTITION BY host
                   ORDER BY n_chars DESC, survivor_doc_id) - 1 AS BIGINT) AS slot,
               CASE WHEN reg_domain = 'sample.org' THEN 10 ELSE 5 END AS delay_s
        FROM pri
    )
    SELECT host, reg_domain, canonical_url, survivor_doc_id, slot,
           CAST(slot * delay_s AS BIGINT) AS fetch_offset_s
    FROM sched
    """


def frontier_schedule(surv: DataFrame, docs: DataFrame) -> DataFrame:
    """Politeness schedule over a frontier relation ``surv`` carrying
    (canonical_url, reg_domain, host, survivor_doc_id): one fetch per
    HOST per time slot (priority = survivor doc's n_chars desc, doc_id
    tiebreak), per-domain crawl delay (10 s for sample.org, 5 s default —
    the robots.txt `Crawl-delay` stand-in); ``fetch_offset_s`` = slot ×
    delay.  Shared by the batch `corpus_crawl_frontier` and the streaming
    `UrlFrontierStore.serve_frontier`, so serve == batch is by
    construction, not by parallel maintenance."""
    pri = surv.join(
        docs.select(F.col("doc_id").alias("survivor_doc_id"), "n_chars"),
        "survivor_doc_id",
    )
    w = Window.partitionBy("host").orderBy(F.desc("n_chars"), F.asc("survivor_doc_id"))
    sched = pri.select(
        "host",
        "reg_domain",
        "canonical_url",
        "survivor_doc_id",
        (F.row_number().over(w) - 1).cast("long").alias("slot"),
        F.when(F.col("reg_domain") == "sample.org", 10).otherwise(5).alias("delay_s"),
    )
    return sched.select(
        "host",
        "reg_domain",
        "canonical_url",
        "survivor_doc_id",
        "slot",
        (F.col("slot") * F.col("delay_s")).cast("long").alias("fetch_offset_s"),
    )


@register(
    "corpus_crawl_frontier",
    oracle=_FRONTIER_ORACLE,
    tags=("corpus", "url", "crawl", "scheduling"),
)
def q_corpus_crawl_frontier(spark, sf_dir):
    """Politeness-scheduled crawl frontier over the canonicalized URL set —
    the step AFTER `corpus_url_canonical_dedup` in a crawl pipeline: one
    fetch per HOST per time slot (round-robin within host by priority =
    survivor doc's n_chars desc, doc_id tiebreak), with a per-domain
    crawl delay (10 s for sample.org, 5 s otherwise standing in for
    robots.txt `Crawl-delay`); ``fetch_offset_s`` = slot × delay is each
    URL's scheduled start.

    Scale: dedup is the canonical-key hash agg; scheduling is ONE window
    per host — partitioned by host, so the frontier parallelizes across
    hosts exactly the way a polite fetcher does, and no host's queue
    depth affects another's.  The per-host window is bounded by that
    host's frontier depth — the quantity a real crawler must bound
    anyway (queue caps), documented here rather than hidden."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", _synth_url_spark().alias("url"))
    canon, host = canonical_url(F.col("url"))
    c = raw.select("doc_id", canon.alias("canonical_url"), host.alias("host"))
    c = with_registrable_domain(c, "host")
    surv = c.groupBy("canonical_url", "reg_domain", "host").agg(
        F.min("doc_id").cast("long").alias("survivor_doc_id")
    )
    return frontier_schedule(surv, docs)


@register(
    "corpus_frontier_stream_serve",
    oracle=_FRONTIER_ORACLE,
    tags=("corpus", "url", "crawl", "streaming", "incremental"),
)
def q_corpus_frontier_stream_serve(spark, sf_dir):
    """INCREMENTAL twin of `corpus_crawl_frontier`: URLs are discovered in
    three micro-batches split on ASCENDING doc_id ranges (a crawl's
    arrival order — earlier discovery ⇒ smaller id), ingested through the
    `UrlFrontierStore` first-seen-wins canonical-URL ledger
    (within-batch min-id survivor → ledger anti-join → idempotent
    batch-dir publish, the `corpus_ingest` skeleton), then served through
    the SAME `frontier_schedule` body as the batch query.  Under ordered
    arrival first-seen == global min-doc_id survivor, so the oracle is
    the plain one-pass SQL — parity proves the store's admit/replay/merge
    path reconstructs the batch frontier bit-for-bit."""
    import atexit  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from ..streaming.url_frontier import UrlFrontierStore  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", _synth_url_spark().alias("url"))
    n = raw.count()
    store_dir = tempfile.mkdtemp(prefix="frontier_serve_")
    atexit.register(shutil.rmtree, store_dir, ignore_errors=True)
    store = UrlFrontierStore(spark, store_dir)
    for bid in range(3):
        lo = bid * n // 3
        # last batch takes the open tail so no id space drops stragglers
        cut = (F.col("doc_id") >= lo) & (
            F.lit(bid == 2) | (F.col("doc_id") < (bid + 1) * n // 3)
        )
        store.ingest_batch(raw.filter(cut), bid)
    return store.serve_frontier(docs)


# ---------------------------------------------------------------------------
# robots.txt disallow rules (r13) — the politeness story's missing half:
# Crawl-delay existed (frontier_schedule); path-prefix allow/deny did not
# ---------------------------------------------------------------------------

# Synthetic per-domain rule set shared by both engines (robots.txt shape:
# path-prefix rules, LONGEST matching prefix wins, allow wins length ties —
# the Google REP tiebreak).  A production pipeline loads each host's parsed
# robots.txt into this same (domain, prefix, allow) relation; the join
# shape below is identical.  Against the synthesized '/articles/item-<k>'
# paths: example.com denies the item-1 prefix (111 of 200 page keys) but
# re-allows the longer item-12 prefix (11 keys back — the
# longest-prefix-wins exercise); sample.org denies the item-7 prefix.
_ROBOTS_RULES = (
    ("example.com", "/articles/item-1", 0),
    ("example.com", "/articles/item-12", 1),
    ("sample.org", "/articles/item-7", 0),
)

_ROBOTS_SQL_VALUES = ", ".join(
    f"('{d}', '{p}', {a})" for d, p, a in _ROBOTS_RULES
)


def robots_rules_table(spark, rules: tuple = _ROBOTS_RULES):
    """The parsed robots rules as a tiny broadcastable relation."""
    return spark.createDataFrame(
        list(rules), "reg_domain string, prefix string, allow int"
    )


def apply_robots_rules(df, rules, url_col: str = "canonical_url"):
    """Filterable robots verdict over a frontier relation carrying
    (``url_col``, reg_domain): adds ``matched_prefix`` (the winning rule's
    prefix, NULL when no rule matches), ``rule_allow`` and ``allowed``.

    Longest-matching-prefix wins; allow wins a length tie (the REP
    tiebreak); a URL with no matching rule is allowed.  Plan shape: the
    per-domain rule lists collapse to one broadcast row each (the
    `_centroid_row` model pattern), and the winner is a per-row
    ``array_max`` over the matching prefixes — no fact-side row
    explosion, no grouped agg, zero shuffle; a crawler-scale rule set
    (millions of hosts) joins the same way on the host key."""
    spark = df.sparkSession
    grouped = rules.groupBy("reg_domain").agg(
        F.collect_list(F.struct("prefix", "allow")).alias("_rules")
    )
    path = F.regexp_extract(F.col(url_col), r"^[^:]+://[^/?#]+([^?#]*)", 1)
    j = df.join(F.broadcast(grouped), "reg_domain", "left")
    matches = F.filter(
        F.coalesce(F.col("_rules"), F.array().cast("array<struct<prefix:string,allow:int>>")),
        lambda r: F.startswith(path, r["prefix"]),
    )
    winner = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                F.length(r["prefix"]).alias("l"),
                r["allow"].alias("allow"),
                r["prefix"].alias("prefix"),
            ),
        )
    )
    return j.select(
        *df.columns,
        winner.getField("prefix").alias("matched_prefix"),
        winner.getField("allow").alias("rule_allow"),
        (winner.isNull() | (winner.getField("allow") == 1)).alias("allowed"),
    )


_ROBOTS_ORACLE = _URL_CANON_CTES + f"""
    , surv AS (
        SELECT canonical_url, reg_domain,
               regexp_extract(canonical_url, '^[^:]+://([^/?#]+)', 1) AS host,
               regexp_extract(canonical_url, '^[^:]+://[^/?#]+([^?#]*)', 1) AS path,
               CAST(min(doc_id) AS BIGINT) AS survivor_doc_id
        FROM canon GROUP BY 1, 2, 3, 4
    ), rules(reg_domain, prefix, allow) AS (
        VALUES {_ROBOTS_SQL_VALUES}
    ), verdict AS (
        SELECT s.host, s.reg_domain, s.canonical_url, s.survivor_doc_id,
               r.prefix, r.allow,
               row_number() OVER (
                   PARTITION BY s.canonical_url
                   ORDER BY (r.prefix IS NOT NULL) DESC,
                            length(r.prefix) DESC, r.allow DESC, r.prefix
               ) AS rn
        FROM surv s LEFT JOIN rules r
          ON r.reg_domain = s.reg_domain AND starts_with(s.path, r.prefix)
    )
    SELECT host, reg_domain, canonical_url, survivor_doc_id,
           prefix AS matched_prefix,
           CAST(allow AS INT) AS rule_allow,
           (allow IS NULL OR allow = 1) AS allowed
    FROM verdict WHERE rn = 1
    """


@register(
    "corpus_robots_filter",
    oracle=_ROBOTS_ORACLE,
    tags=("corpus", "url", "crawl", "robots", "politeness"),
)
def q_corpus_robots_filter(spark, sf_dir):
    """robots.txt allow/deny over the canonicalized frontier — the other
    half of the politeness story next to `corpus_crawl_frontier`'s
    Crawl-delay: per canonical URL, match the per-domain path-prefix
    rules, pick the LONGEST matching prefix (allow wins a length tie —
    the REP tiebreak), and emit the verdict row the fetcher consumes
    (matched_prefix / rule_allow / allowed; no matching rule = allowed).
    The rule set exercises the tiebreak: example.com denies the item-1
    prefix but re-allows the longer item-12 prefix beneath it.

    Scale: the rule relation broadcasts as one per-domain array row and
    the winner is a per-row array_max — no fact-side row explosion, no
    shuffle beyond the URL tier's own canonical-key agg; at 100 TB only
    the URL column and the broadcast rules are touched, so the filter
    runs BEFORE any fetch/payload cost, which is the point of robots
    compliance in a crawler."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", _synth_url_spark().alias("url"))
    canon, host = canonical_url(F.col("url"))
    c = raw.select("doc_id", canon.alias("canonical_url"), host.alias("host"))
    c = with_registrable_domain(c, "host")
    surv = c.groupBy("canonical_url", "reg_domain", "host").agg(
        F.min("doc_id").cast("long").alias("survivor_doc_id")
    )
    out = apply_robots_rules(surv, robots_rules_table(spark))
    return out.select(
        "host",
        "reg_domain",
        "canonical_url",
        "survivor_doc_id",
        "matched_prefix",
        F.col("rule_allow").cast("int").alias("rule_allow"),
        "allowed",
    )


# ---------------------------------------------------------------------------
# sitemap.xml discovery (r13) — the third leg of the crawl front door:
# robots says what you MAY fetch, the frontier says WHEN, the sitemap says
# what the site WANTS you to fetch (including pages the crawl hasn't seen)
# ---------------------------------------------------------------------------

# Deterministic per-host sitemap synthesis shared by both engines: every
# crawled host publishes a sitemap listing page keys 0..149 (a subset of
# the crawl's 0..199 key space) plus 1000..1009 (ten never-crawled pages —
# the discovery payload).  The <loc> values are emitted already-canonical
# (lowercase scheme/host, no port/fragment/query); a production pipeline
# runs extracted locs through `canonical_url` before the diff — the listed
# composition point, elided here so the value-hash pins the parse+diff.
_SITEMAP_KNOWN_KEYS = (0, 150)     # half-open
_SITEMAP_NEW_KEYS = (1000, 1010)   # half-open

_SITEMAP_ORACLE = _URL_CANON_CTES + f"""
    , known AS (
        SELECT DISTINCT
               regexp_extract(canonical_url, '^[^:]+://([^/?#]+)', 1) AS host,
               canonical_url
        FROM canon
    ), hosts AS (SELECT DISTINCT host FROM known
    ), sm AS (
        SELECT host,
               '<?xml version="1.0" encoding="UTF-8"?><urlset>'
               || array_to_string(list_transform(
                      list_concat(range({_SITEMAP_KNOWN_KEYS[0]}, {_SITEMAP_KNOWN_KEYS[1]}),
                                  range({_SITEMAP_NEW_KEYS[0]}, {_SITEMAP_NEW_KEYS[1]})),
                      k -> '<url><loc>https://' || host || '/articles/item-' || k
                           || '</loc></url>'), '')
               || '</urlset>' AS xml
        FROM hosts
    ), locs AS (
        SELECT host,
               unnest(regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)) AS loc
        FROM sm
    ), j AS (
        SELECT l.host, l.loc,
               CASE WHEN k.canonical_url IS NOT NULL THEN 1 ELSE 0 END AS known
        FROM locs l LEFT JOIN known k
          ON k.host = l.host AND k.canonical_url = l.loc
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_listed,
           CAST(sum(known) AS BIGINT) AS n_known,
           CAST(count(*) - sum(known) AS BIGINT) AS n_new
    FROM j GROUP BY host
    """


@register(
    "corpus_sitemap_discovery",
    oracle=_SITEMAP_ORACLE,
    tags=("corpus", "url", "crawl", "sitemap", "discovery"),
)
def q_corpus_sitemap_discovery(spark, sf_dir):
    """sitemap.xml URL discovery — per crawled host, synthesize the host's
    sitemap (an <urlset> of <url><loc>…</loc></url> entries: 150 pages the
    crawl's key space covers + 10 never-crawled pages), parse the <loc>
    values back out with the RE2-safe extraction both engines share, and
    DIFF against the crawl's canonical-URL set: n_known (listed pages the
    crawl already holds under their query-less canonical form) vs n_new
    (the discovery payload a frontier would enqueue).  Completes the
    crawl front door next to `corpus_robots_filter` (may-fetch) and
    `corpus_crawl_frontier` (when-to-fetch); the synthesize→parse round
    trip pins the PARSE side, which is the part a real pipeline runs.

    Scale: sitemaps are per-host documents — the whole tier is one row
    per host (the host census, tiny next to the corpus), one regex
    extraction per sitemap, and a host-keyed left join against the
    canonical set projecting only (host, canonical_url); nothing touches
    document payloads."""
    locs, known = _sitemap_locs_and_known(spark, sf_dir)
    j = locs.join(
        known.select("host", F.col("canonical_url").alias("loc"), F.lit(1).alias("_k")),
        ["host", "loc"],
        "left",
    )
    return j.groupBy("host").agg(
        F.count("*").cast("long").alias("n_listed"),
        F.coalesce(F.sum("_k"), F.lit(0)).cast("long").alias("n_known"),
        (F.count("*") - F.coalesce(F.sum("_k"), F.lit(0)))
        .cast("long")
        .alias("n_new"),
    )


def _sitemap_locs_and_known(spark, sf_dir):
    """Shared by the sitemap queries: (locs, known) — every parsed
    (host, loc) sitemap entry, and the crawl's distinct
    (host, canonical_url) set."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", _synth_url_spark().alias("url"))
    canon, host = canonical_url(F.col("url"))
    known = (
        raw.select(canon.alias("canonical_url"), host.alias("host"))
        .distinct()
    )
    hosts = known.select("host").distinct()
    keys = F.concat(
        F.sequence(F.lit(_SITEMAP_KNOWN_KEYS[0]), F.lit(_SITEMAP_KNOWN_KEYS[1] - 1)),
        F.sequence(F.lit(_SITEMAP_NEW_KEYS[0]), F.lit(_SITEMAP_NEW_KEYS[1] - 1)),
    )
    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset>'),
        F.array_join(
            F.transform(
                keys,
                lambda k: F.concat(
                    F.lit("<url><loc>https://"),
                    F.col("host"),
                    F.lit("/articles/item-"),
                    k.cast("string"),
                    F.lit("</loc></url>"),
                ),
            ),
            "",
        ),
        F.lit("</urlset>"),
    )
    sm = hosts.select("host", xml.alias("xml"))
    locs = sm.select(
        "host",
        F.explode(
            F.regexp_extract_all(F.col("xml"), F.lit("<loc>([^<]*)</loc>"), 1)
        ).alias("loc"),
    )
    return locs, known


_DISCOVERY_FRONTIER_ORACLE = _URL_CANON_CTES + f"""
    , known AS (
        SELECT DISTINCT
               regexp_extract(canonical_url, '^[^:]+://([^/?#]+)', 1) AS host,
               canonical_url, reg_domain
        FROM canon
    ), hosts AS (SELECT DISTINCT host FROM known
    ), hostdom AS (SELECT DISTINCT host, reg_domain FROM known
    ), sm AS (
        SELECT host,
               '<?xml version="1.0" encoding="UTF-8"?><urlset>'
               || array_to_string(list_transform(
                      list_concat(range({_SITEMAP_KNOWN_KEYS[0]}, {_SITEMAP_KNOWN_KEYS[1]}),
                                  range({_SITEMAP_NEW_KEYS[0]}, {_SITEMAP_NEW_KEYS[1]})),
                      k -> '<url><loc>https://' || host || '/articles/item-' || k
                           || '</loc></url>'), '')
               || '</urlset>' AS xml
        FROM hosts
    ), locs AS (
        SELECT host,
               unnest(regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)) AS loc
        FROM sm
    ), newu AS (
        SELECT l.host, l.loc FROM locs l LEFT JOIN known k
          ON k.host = l.host AND k.canonical_url = l.loc
        WHERE k.canonical_url IS NULL
    ), rules(reg_domain, prefix, allow) AS (
        VALUES {_ROBOTS_SQL_VALUES}
    ), nd AS (
        SELECT n.host, n.loc, hd.reg_domain,
               regexp_extract(n.loc, '^[^:]+://[^/?#]+([^?#]*)', 1) AS path
        FROM newu n JOIN hostdom hd ON hd.host = n.host
    ), verd AS (
        SELECT host, loc, reg_domain, (allow IS NULL OR allow = 1) AS allowed
        FROM (
            SELECT nd.*, r.allow,
                   row_number() OVER (
                       PARTITION BY nd.loc
                       ORDER BY (r.prefix IS NOT NULL) DESC,
                                length(r.prefix) DESC, r.allow DESC, r.prefix
                   ) AS rn
            FROM nd LEFT JOIN rules r
              ON r.reg_domain = nd.reg_domain AND starts_with(nd.path, r.prefix))
        WHERE rn = 1
    ), sched AS (
        SELECT host, reg_domain, loc AS canonical_url,
               CAST(regexp_extract(loc, 'item-(\\d+)$', 1) AS BIGINT) AS page_key,
               CAST(row_number() OVER (
                   PARTITION BY host
                   ORDER BY CAST(regexp_extract(loc, 'item-(\\d+)$', 1) AS BIGINT)
               ) - 1 AS BIGINT) AS slot,
               CASE WHEN reg_domain = 'sample.org' THEN 10 ELSE 5 END AS delay_s
        FROM verd WHERE allowed
    )
    SELECT host, reg_domain, canonical_url, page_key, slot,
           CAST(slot * delay_s AS BIGINT) AS fetch_offset_s
    FROM sched
    """


@register(
    "pipeline_discovery_frontier",
    oracle=_DISCOVERY_FRONTIER_ORACLE,
    tags=("corpus", "pipeline", "crawl", "sitemap", "robots", "scheduling"),
)
def q_pipeline_discovery_frontier(spark, sf_dir):
    """The crawl DISCOVERY loop composed end-to-end: sitemap parse →
    never-crawled URLs (anti-join vs the canonical set) → robots.txt
    allow/deny (longest-prefix; example.com's deny on the item-1 prefix
    blocks its entire item-1000.. discovery payload — the rule
    composition the funnel must respect) → politeness schedule over the
    SURVIVING new URLs (per-host slots ordered by page key, per-domain
    crawl delay — the `frontier_schedule` discipline applied to pages
    that have no document yet, so priority is the deterministic page
    key rather than content length).  This pins the COMPOSITION of the
    three r13 front-door tiers the way `pipeline_crawl_corpus` pins the
    content tiers.

    Scale: every relation in the chain is host-keyed and tiny relative
    to the corpus (sitemaps are one row per host, discovery is ≤ the
    listed-URL count); the only corpus-wide work is the canonical-set
    projection the URL tier already pays."""
    spark_locs, known = _sitemap_locs_and_known(spark, sf_dir)
    new = spark_locs.join(
        known.select("host", F.col("canonical_url").alias("loc")),
        ["host", "loc"],
        "left_anti",
    )
    hostdom = (
        with_registrable_domain(known.select("host").distinct(), "host")
    )
    new = new.join(F.broadcast(hostdom), "host")
    rb = apply_robots_rules(new, robots_rules_table(spark), url_col="loc")
    allowed = rb.filter(F.col("allowed"))
    key = F.regexp_extract(F.col("loc"), r"item-(\d+)$", 1).cast("long")
    allowed = allowed.withColumn("page_key", key)
    w = Window.partitionBy("host").orderBy(F.asc("page_key"))
    return allowed.select(
        "host",
        "reg_domain",
        F.col("loc").alias("canonical_url"),
        "page_key",
        (F.row_number().over(w) - 1).cast("long").alias("slot"),
        (
            (F.row_number().over(w) - 1)
            * F.when(F.col("reg_domain") == "sample.org", 10).otherwise(5)
        )
        .cast("long")
        .alias("fetch_offset_s"),
    )


# ---------------------------------------------------------------------------
# HTML main-content extraction (r12) — markup → clean text, the step between
# the crawl frontier and the Gopher/quality gates
# ---------------------------------------------------------------------------

# Deterministic markup synthesis shared by both engines: documents carries
# clean text, a crawl carries markup — each doc is wrapped in a crawl-style
# page (head with style/script by doc_id%2 / doc_id%3, nav, TWO content
# paragraphs, a NESTED related box on two of three variant classes — an
# outer <div> holding the link farm plus a trailing editorial teaser, the
# shape real crawl HTML has and the r12 flat-span matcher silently
# truncated (VERDICT r12 item 4) — a trailing tracker script on one,
# footer).
_HTML_SYNTH_SQL = """
 '<html><head><title>Doc ' || doc_id || '</title>'
 || CASE WHEN doc_id % 2 = 0 THEN '<style>.c{color:red;}</style>' ELSE '' END
 || CASE WHEN doc_id % 3 = 0 THEN '<script>var x=1;</script>' ELSE '' END
 || '</head><body>'
 || '<nav><a href="/">Home</a> <a href="/about">About</a></nav>'
 || '<p>' || text || '</p>'
 || '<p>Published by ' || source || ' desk</p>'
 || CASE WHEN doc_id % 3 <> 1
         THEN '<div class="box"><div class="rel"><a href="/a">read more here</a> <a href="/b">trending now today</a> <a href="/c">subscribe to newsletter</a> ad</div> sponsored feature story follows</div>'
         ELSE '' END
 || CASE WHEN doc_id % 3 = 2 THEN '<script>track();</script>' ELSE '' END
 || '<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms</a></footer>'
 || '</body></html>'
"""

# Block BOUNDARY tokens (r13): every <p>/</p>/<div>/</div> is a separator
# and the text runs BETWEEN consecutive boundaries are the blocks.  Unlike
# the r12 non-greedy span match <(?:p|div)[^>]*>(.*?)</(?:p|div)> — which
# silently truncated at the first INNER </div> of a nested body and lost
# any text after it (VERDICT r12 item 4) — boundary splitting is exact on
# arbitrarily nested markup, needs no lookahead (DuckDB's RE2 has none),
# and reproduces the span match bit-exactly on flat bodies (the
# in-between runs are empty and filtered).  This is the block-tokenizer
# granularity jusText/readability operate at: <div>A<div>B</div>C</div>
# yields the three text runs A, B, C, each link-density-scored on its own
# bytes.
_HTML_BOUNDARY_RE = "</?(?:p|div)[^>]*>"
_HTML_LINK_RE = "(?s)<a[^>]*>(.*?)</a>"


def _synth_html_spark():
    did, src, lit = F.col("doc_id"), F.col("source"), F.lit
    return F.concat(
        lit("<html><head><title>Doc "),
        did.cast("string"),
        lit("</title>"),
        F.when(did % 2 == 0, lit("<style>.c{color:red;}</style>")).otherwise(lit("")),
        F.when(did % 3 == 0, lit("<script>var x=1;</script>")).otherwise(lit("")),
        lit("</head><body>"),
        lit('<nav><a href="/">Home</a> <a href="/about">About</a></nav>'),
        lit("<p>"),
        F.col("text"),
        lit("</p>"),
        lit("<p>Published by "),
        src,
        lit(" desk</p>"),
        F.when(
            did % 3 != 1,
            lit(
                '<div class="box"><div class="rel"><a href="/a">read more here</a> '
                '<a href="/b">trending now today</a> '
                '<a href="/c">subscribe to newsletter</a> ad</div> '
                "sponsored feature story follows</div>"
            ),
        ).otherwise(lit("")),
        F.when(did % 3 == 2, lit("<script>track();</script>")).otherwise(lit("")),
        lit('<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms</a></footer>'),
        lit("</body></html>"),
    )


def html_main_content(html):
    """Main-content extraction over an HTML column with pure Catalyst
    string/regex algebra — boilerplate stripping by SEMANTIC TAG
    (script/style contents, the whole <head>, nav/header/footer) then by
    LINK DENSITY (drop any block whose anchor-text length is ≥ half its
    plain-text length — the classic readability/jusText rule, here as an
    exact integer comparison so both engines agree bit-wise).

    Blocks come from BOUNDARY SPLITTING (`_HTML_BOUNDARY_RE`): the text
    runs between consecutive <p>/<div> open/close tokens, so nested
    markup is handled exactly (r13, VERDICT r12 item 4 — the old
    non-greedy span match truncated at the first inner </div>); empty
    runs (pure tag adjacency) are filtered out, which makes the output
    bit-identical to the old matcher on flat bodies.  The <head> strip
    keeps out-of-body text (title) from surfacing as a run.

    Returns (blocks, kept) array Columns of struct(plain, linklen);
    compose lengths/md5 from them.  No backreferences or lookaheads
    anywhere (DuckDB's RE2 has neither).

    Scale: per-row regex projections, zero shuffle, zero UDF — the
    extraction rides the parquet scan exactly like `canonical_url`; at
    100 TB this is the map stage between fetch and the quality gates."""
    s1 = F.regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    s1 = F.regexp_replace(s1, "(?s)<style[^>]*>.*?</style>", " ")
    # <header> is stripped by its own rule; <head(\s...)?> cannot match it
    # (the char after 'head' must be whitespace or '>'), so order is free.
    s2 = F.regexp_replace(s1, r"(?s)<head(\s[^>]*)?>.*?</head>", " ")
    s2 = F.regexp_replace(s2, "(?s)<nav[^>]*>.*?</nav>", " ")
    s2 = F.regexp_replace(s2, "(?s)<footer[^>]*>.*?</footer>", " ")
    s2 = F.regexp_replace(s2, "(?s)<header[^>]*>.*?</header>", " ")
    runs = F.split(s2, _HTML_BOUNDARY_RE)
    sb = F.filter(
        F.transform(
            runs,
            lambda b: F.struct(
                F.trim(F.regexp_replace(b, "<[^>]*>", " ")).alias("plain"),
                F.length(
                    F.concat_ws("", F.regexp_extract_all(b, F.lit(_HTML_LINK_RE), 1))
                ).alias("linklen"),
            ),
        ),
        lambda x: x["plain"] != "",
    )
    kept = F.filter(sb, lambda x: x["linklen"] * 2 < F.length(x["plain"]))
    return sb, kept


_HTML_EXTRACT_ORACLE = (
    """
    WITH raw AS (
        SELECT doc_id, """
    + _HTML_SYNTH_SQL
    + """ AS html FROM documents
    ), s1 AS (
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                 '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS h
        FROM raw
    ), s2 AS (
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(h, '(?s)<head(\\s[^>]*)?>.*?</head>', ' ', 'g'),
                     '(?s)<nav[^>]*>.*?</nav>', ' ', 'g'),
                   '(?s)<footer[^>]*>.*?</footer>', ' ', 'g'),
                 '(?s)<header[^>]*>.*?</header>', ' ', 'g') AS h
        FROM s1
    ), scored AS (
        SELECT doc_id,
               list_filter(
                   list_transform(
                       regexp_split_to_array(h, '</?(?:p|div)[^>]*>'),
                       b -> struct_pack(
                           plain := trim(regexp_replace(b, '<[^>]*>', ' ', 'g')),
                           linklen := length(coalesce(array_to_string(
                               regexp_extract_all(b, '(?s)<a[^>]*>(.*?)</a>', 1), ''), ''))
                       )),
                   x -> x.plain <> '') AS sb
        FROM s2
    ), kept AS (
        SELECT doc_id,
               len(sb) AS n_blocks,
               list_filter(sb, x -> 2 * x.linklen < length(x.plain)) AS keep
        FROM scored
    )
    SELECT doc_id,
           CAST(n_blocks AS INTEGER) AS n_blocks,
           CAST(len(keep) AS INTEGER) AS n_kept,
           CAST(length(trim(regexp_replace(
               array_to_string(list_transform(keep, x -> x.plain), ' '),
               '\\s+', ' ', 'g'))) AS BIGINT) AS main_chars,
           md5(trim(regexp_replace(
               array_to_string(list_transform(keep, x -> x.plain), ' '),
               '\\s+', ' ', 'g'))) AS main_md5
    FROM kept
    """
)


@register(
    "corpus_html_extract",
    oracle=_HTML_EXTRACT_ORACLE,
    tags=("corpus", "html", "extraction", "boilerplate"),
)
def q_corpus_html_extract(spark, sf_dir):
    """HTML main-content extraction — the missing step between
    `corpus_crawl_frontier` (what to fetch) and `text_gopher_filters` /
    the quality gates (which operate on CLEAN text): strip script/style,
    drop semantic boilerplate containers (nav/header/footer), split the
    body into flat blocks, and keep only blocks whose LINK DENSITY is
    low (2·anchor_chars < plain_chars — the readability/jusText rule as
    exact integer arithmetic).  Emits per-doc block counts, extracted
    length, and md5 of the normalized main text, so the whole
    markup→text pipeline is value-hash-checked against DuckDB running
    the identical RE2-safe regex chain (no backreferences or lookaheads).
    r13: blocks are the text runs between <p>/<div> BOUNDARY tokens, so
    the NESTED related box the synth now emits (an outer <div> wrapping
    the link farm plus a trailing teaser) is parsed exactly — the r12
    non-greedy span matcher truncated it at the first inner </div> and
    lost the teaser (VERDICT r12 item 4; regression-pinned in
    tests/test_r13_operators.py).

    The crawl chain now reads end-to-end: `corpus_url_canonical_dedup`
    (URL tier) → `corpus_crawl_frontier` / `corpus_frontier_stream_serve`
    (scheduling) → `corpus_html_extract` (markup → text) →
    `text_gopher_filters` → dedup/packing.

    Scale: pure per-row regex projections riding the parquet scan — no
    UDF, no shuffle, no Python; the link-density rule needs only the
    block's own bytes, so the operator is embarrassingly parallel at
    100 TB and its cost is the scan + regex CPU."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", _synth_html_spark().alias("html"))
    sb, kept = html_main_content(F.col("html"))
    scored = raw.select("doc_id", sb.alias("sb"), kept.alias("keep"))
    main = F.trim(
        F.regexp_replace(
            F.concat_ws(" ", F.transform("keep", lambda x: x["plain"])), r"\s+", " "
        )
    )
    return scored.select(
        "doc_id",
        F.size("sb").cast("int").alias("n_blocks"),
        F.size("keep").cast("int").alias("n_kept"),
        F.length(main).cast("long").alias("main_chars"),
        F.md5(main).alias("main_md5"),
    )


# ---------------------------------------------------------------------------
# End-to-end crawl pipeline (r12) — URL tier → markup→text → quality gate →
# content dedup, as ONE composed plan with a per-source funnel readout
# ---------------------------------------------------------------------------

_CRAWL_MIN_MAIN_CHARS = 200


_CRAWL_PIPELINE_ORACLE = (
    _URL_CANON_CTES
    + f"""
    , surv AS (
        SELECT canonical_url, reg_domain,
               regexp_extract(canonical_url, '^[^:]+://[^/?#]+([^?#]*)', 1) AS path,
               CAST(min(doc_id) AS BIGINT) AS doc_id
        FROM canon GROUP BY 1, 2, 3
    ), rules(reg_domain, prefix, allow) AS (
        VALUES {_ROBOTS_SQL_VALUES}
    ), rb AS (
        SELECT canonical_url, doc_id, (allow IS NULL OR allow = 1) AS allowed
        FROM (
            SELECT s.canonical_url, s.doc_id, r.allow,
                   row_number() OVER (
                       PARTITION BY s.canonical_url
                       ORDER BY (r.prefix IS NOT NULL) DESC,
                                length(r.prefix) DESC, r.allow DESC, r.prefix
                   ) AS rn
            FROM surv s LEFT JOIN rules r
              ON r.reg_domain = s.reg_domain AND starts_with(s.path, r.prefix))
        WHERE rn = 1
    ), sdocs AS (
        SELECT d.doc_id, d.text, d.source FROM documents d
        JOIN rb ON rb.doc_id = d.doc_id AND rb.allowed
    ), shtml AS (
        SELECT doc_id, source, """
    + _HTML_SYNTH_SQL
    + """ AS html FROM sdocs
    ), hs1 AS (
        SELECT doc_id, source,
               regexp_replace(
                 regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                 '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS h
        FROM shtml
    ), hs2 AS (
        SELECT doc_id, source,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(h, '(?s)<head(\\s[^>]*)?>.*?</head>', ' ', 'g'),
                     '(?s)<nav[^>]*>.*?</nav>', ' ', 'g'),
                   '(?s)<footer[^>]*>.*?</footer>', ' ', 'g'),
                 '(?s)<header[^>]*>.*?</header>', ' ', 'g') AS h
        FROM hs1
    ), hkept AS (
        SELECT doc_id, source,
               list_filter(
                   list_transform(
                       regexp_split_to_array(h, '</?(?:p|div)[^>]*>'),
                       b -> struct_pack(
                           plain := trim(regexp_replace(b, '<[^>]*>', ' ', 'g')),
                           linklen := length(coalesce(array_to_string(
                               regexp_extract_all(b, '(?s)<a[^>]*>(.*?)</a>', 1), ''), ''))
                       )),
                   x -> x.plain <> '' AND 2 * x.linklen < length(x.plain)) AS keep
        FROM hs2
    ), hmain AS (
        SELECT doc_id, source,
               trim(regexp_replace(
                   array_to_string(list_transform(keep, x -> x.plain), ' '),
                   '\\s+', ' ', 'g')) AS main
        FROM hkept
    ), funnel AS (
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_crawled,
               CAST(count(rb.doc_id) AS BIGINT) AS n_url_unique,
               CAST(count(CASE WHEN rb.allowed THEN 1 END) AS BIGINT)
                   AS n_robots_ok,
               CAST(count(CASE WHEN length(m.main) >= """
    + str(_CRAWL_MIN_MAIN_CHARS)
    + """ THEN 1 END) AS BIGINT) AS n_quality,
               CAST(count(DISTINCT CASE WHEN length(m.main) >= """
    + str(_CRAWL_MIN_MAIN_CHARS)
    + """ THEN md5(m.main) END) AS BIGINT) AS n_content_unique
        FROM documents d
        LEFT JOIN rb ON rb.doc_id = d.doc_id
        LEFT JOIN hmain m ON m.doc_id = d.doc_id
        GROUP BY d.source
    )
    SELECT * FROM funnel
    """
)


@register(
    "pipeline_crawl_corpus",
    oracle=_CRAWL_PIPELINE_ORACLE,
    tags=("corpus", "pipeline", "crawl", "url", "html", "dedup"),
)
def q_pipeline_crawl_corpus(spark, sf_dir):
    """The crawl chain composed END-TO-END as one declarative plan, with
    a per-source funnel readout: raw crawl (every doc, messy URL) →
    URL-tier dedup (canonical-key min-doc_id survivors —
    `corpus_url_canonical_dedup`'s device) → robots.txt allow/deny
    (r13, `apply_robots_rules` — longest-prefix-wins; blocked URLs are
    never fetched, so extraction cost is only paid for compliant URLs)
    → HTML main-content extraction (`html_main_content`) → quality gate
    (main text ≥ 200 chars, the cheapest Gopher-style length rule on
    EXTRACTED text, not markup) → exact content dedup (distinct md5 of
    the normalized main text).  Output per source: n_crawled ≥
    n_url_unique ≥ n_robots_ok ≥ n_quality ≥ n_content_unique — the
    survivor funnel a crawl-pipeline owner actually monitors.

    One plan, fully value-hash-checked: Catalyst sees the whole chain,
    prunes the documents scan to (doc_id, text, source), and every tier
    is the already-oracled operator body — this query pins their
    COMPOSITION (the join keys and gate placement between tiers), which
    is where pipeline bugs live.

    Scale: URL tier = hash agg on the canonical key; extraction = per-row
    regex; gate = a length compare; content dedup = hash agg on md5 —
    two shuffles total (canonical key, then the source/md5 agg) plus the
    survivor join, all key-partitioned, no UDF anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", _synth_url_spark().alias("url"))
    canon, host = canonical_url(F.col("url"))
    c = raw.select("doc_id", canon.alias("canonical_url"), host.alias("host"))
    c = with_registrable_domain(c, "host")
    surv = c.groupBy("canonical_url", "reg_domain").agg(
        F.min("doc_id").cast("long").alias("doc_id")
    )
    # robots tier (r13): verdicts kept for the funnel, fetch/extraction
    # runs ONLY on allowed URLs — a compliant crawler never pays payload
    # cost for a blocked URL.
    rb = apply_robots_rules(surv, robots_rules_table(spark)).select(
        "doc_id", "allowed"
    )
    sdocs = docs.join(rb.filter(F.col("allowed")).select("doc_id"), "doc_id").select(
        "doc_id", "text", "source"
    )
    shtml = sdocs.select("doc_id", "source", _synth_html_spark().alias("html"))
    _sb, kept = html_main_content(F.col("html"))
    main = F.trim(
        F.regexp_replace(
            F.concat_ws(" ", F.transform(kept, lambda x: x["plain"])), r"\s+", " "
        )
    )
    hmain = shtml.select("doc_id", main.alias("main"))
    qual = F.length("main") >= _CRAWL_MIN_MAIN_CHARS
    flags = rb.select(
        "doc_id",
        F.lit(1).alias("_surv"),
        F.when(F.col("allowed"), 1).alias("_rok"),
    )
    m = (
        docs.select("doc_id", "source")
        .join(flags, "doc_id", "left")
        .join(hmain, "doc_id", "left")
    )
    return m.groupBy("source").agg(
        F.count("*").cast("long").alias("n_crawled"),
        F.count("_surv").cast("long").alias("n_url_unique"),
        F.count("_rok").cast("long").alias("n_robots_ok"),
        F.count(F.when(qual, 1)).cast("long").alias("n_quality"),
        F.countDistinct(F.when(qual, F.md5("main")))
        .cast("long")
        .alias("n_content_unique"),
    )
