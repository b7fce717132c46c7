"""Corpus-cleaning operators for LLM training-data pipelines (SURVEY.md
§2.8 extensions): test-set decontamination, Gopher-style repetition
filtering, and regex pattern extraction.

These extend the dedup/text families with the remaining staples of a
pre-training data pipeline: removing training documents that leak n-grams
from a held-out evaluation set (decontamination), dropping documents whose
n-gram distribution is degenerately repetitive (quality filtering a la
Gopher/C4), and structured pattern extraction. All pure Catalyst
expressions — tokenize/shingle via split/transform, counts via hash
aggregation, no Python in the hot path.

Reference parity: the reference pipeline has no corpus stage (it is a tick
scraper, ``asyncio scraping.py``), so these are the survey-mandated
LLM-pipeline extensions; they reuse the shingling machinery of
``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog import ensure_min_partitions, load_table
from ..operators.dedup import shingles
from ..plans.registry import register

__all__ = ["ngrams_all", "decontaminate", "repetition_scores", "regex_extract"]


def ngrams_all(text: Column, n: int) -> Column:
    """ALL word n-grams of a whitespace-tokenized text, duplicates kept
    (unlike :func:`dedup.shingles`, which is distinct-by-construction) —
    repetition scoring needs the multiplicities."""
    words = F.split(F.trim(text), r"\s+")
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))


def decontaminate(
    train: DataFrame,
    heldout: DataFrame,
    n: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Test-set decontamination: flag every training document sharing at
    least one word ``n``-gram with the held-out evaluation set.

    Scale shape: the held-out set is small by construction (an eval
    benchmark, not a corpus), so its distinct gram set is broadcast and the
    train side never shuffles for the probe — one explode + broadcast hash
    join + per-doc hash agg. At 100 TB the cost is a single pass over the
    training text. Returns (id, n_shared, contaminated) for every train doc.
    """
    tg = train.select(F.col(id_col), F.explode(shingles(F.col(text), n)).alias("gram"))
    hg = heldout.select(F.explode(shingles(F.col(text), n)).alias("gram")).distinct()
    counts = tg.join(F.broadcast(hg), "gram").groupBy(id_col).agg(
        F.count("*").alias("n_shared")
    )
    return (
        train.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def repetition_scores(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    top2_threshold: float = 0.05,
    dup3_threshold: float = 0.1,
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``top_2gram_frac``: occurrences of the single most frequent word
      2-gram over all 2-gram occurrences (boilerplate detector);
    - ``dup_3gram_frac``: fraction of 3-gram occurrences whose gram occurs
      more than once in the document (template/spam detector);
    - ``flagged``: either signal above its threshold.

    Shape: two explode → (doc, gram) hash count → per-doc agg passes; the
    grouping key includes the doc id, so the shuffle is by (doc, gram) and
    partial aggregation absorbs the explosion map-side. No Python.
    """

    def frac(n: int, agg_fn) -> DataFrame:
        g = df.select(F.col(id_col), F.explode(ngrams_all(F.col(text), n)).alias("gram"))
        c = g.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
        return c.groupBy(id_col).agg(agg_fn.alias(f"_f{n}"))

    top2 = frac(2, F.max("c") / F.sum("c"))
    dup3 = frac(3, F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)) / F.sum("c"))
    return (
        top2.join(dup3, id_col)
        .select(
            id_col,
            F.round("_f2", 6).alias("top_2gram_frac"),
            F.round("_f3", 6).alias("dup_3gram_frac"),
            (
                (F.round("_f2", 6) > top2_threshold) | (F.round("_f3", 6) > dup3_threshold)
            ).alias("flagged"),
        )
    )


def regex_extract(
    df: DataFrame,
    pattern: str,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Extract ALL matches of ``pattern`` per document: match count +
    CSV-joined match list (array outputs serialized so downstream equality
    checks and the driver's canonicalizer can hash them). Per-row JVM regex
    — embarrassingly parallel, no shuffle at all."""
    m = F.regexp_extract_all(F.col(text), F.lit(pattern), 0)
    return df.select(
        F.col(id_col),
        F.size(m).cast("long").alias("n_matches"),
        F.concat_ws(",", m).alias("matches_csv"),
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "text_decontaminate",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), g AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram
        FROM w, unnest(range(1, len(w) - 3)) AS t(i)
    ), h AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0
    ), c AS (
        SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM g JOIN h USING (gram)
        WHERE g.doc_id % 17 != 0
        GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(c.n_shared, 0) AS BIGINT) AS n_shared,
           coalesce(c.n_shared, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 17 != 0) d
    LEFT JOIN c USING (doc_id)
    """,
    tags=("text", "dedup", "decontamination"),
)
def q_decontaminate(spark, sf_dir):
    """5-gram test-set decontamination: held-out slice = doc_id % 17 == 0,
    train = the rest; every train doc sharing a 5-gram with the held-out
    slice is flagged."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    heldout = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    return decontaminate(train, heldout, n=5)


@register(
    "text_repetition_filter",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), g2 AS (
        SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram
        FROM w, unnest(range(1, len(w))) AS t(i)
    ), c2 AS (
        SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram
    ), a2 AS (
        SELECT doc_id, max(c) / sum(c) AS f2 FROM c2 GROUP BY doc_id
    ), g3 AS (
        SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram
        FROM w, unnest(range(1, len(w) - 1)) AS t(i)
    ), c3 AS (
        SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY doc_id, gram
    ), a3 AS (
        SELECT doc_id, sum(CASE WHEN c >= 2 THEN c ELSE 0 END) / sum(c) AS f3
        FROM c3 GROUP BY doc_id
    )
    SELECT a2.doc_id,
           round(f2, 6) AS top_2gram_frac,
           round(f3, 6) AS dup_3gram_frac,
           (round(f2, 6) > 0.05 OR round(f3, 6) > 0.1) AS flagged
    FROM a2 JOIN a3 USING (doc_id)
    """,
    tags=("text", "quality", "repetition"),
)
def q_repetition_filter(spark, sf_dir):
    """Gopher-style repetition filter: top-2-gram fraction > 5% or
    duplicate-3-gram fraction > 10% flags the document."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return repetition_scores(docs, top2_threshold=0.05, dup3_threshold=0.1)


@register(
    "text_regex_extract",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\b[a-z]+e\\b')) AS BIGINT) AS n_matches,
           coalesce(array_to_string(regexp_extract_all(text, '\\b[a-z]+e\\b'), ','), '')
               AS matches_csv
    FROM documents
    """,
    tags=("text", "regex"),
)
def q_regex_extract(spark, sf_dir):
    """Regex pattern extraction: all lowercase words ending in 'e', as
    count + CSV list per document (RE2 and java.util.regex agree on this
    dialect-neutral pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    return regex_extract(docs, r"\b[a-z]+e\b")
