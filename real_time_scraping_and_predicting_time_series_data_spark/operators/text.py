"""Text analysis operators for training-data pipelines (SURVEY.md §2.8):
language-ID heuristic, quality scoring, token counting, TF-IDF, document
fingerprinting. All pure Catalyst expressions over the ``documents`` table —
tokenization via split/explode, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import ensure_min_partitions, load_table
from ..plans.registry import register

__all__ = ["words_of", "quality_scores", "langid_scores", "tfidf", "fingerprint"]

# Tiny per-language marker-word profiles for the heuristic language-ID
# (n-gram/stopword heuristic family; real profiles would be learned).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "fr": ("le", "la", "et", "de"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "los", "y", "de"),
    "zh": ("的", "是", "了", "在"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def words_of(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def quality_scores(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, token count, mean token length,
    stopword ratio, punctuation ratio, uppercase ratio, repetition ratio
    (1 - distinct/total tokens)."""
    w = words_of(F.col(text))
    n_words = F.size(w)
    n_chars = F.length(F.col(text))
    stop_hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text), r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(F.col(text), r"[A-Z]", ""))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars_text"),
        n_words.cast("long").alias("n_words"),
        F.round((n_chars - n_words + 1) / n_words, 6).alias("avg_word_len"),
        F.round(stop_hits / n_words, 6).alias("stopword_ratio"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_upper / n_chars, 6).alias("upper_ratio"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(w)) / n_words, 6).alias("repetition_ratio"),
    )


def langid_scores(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language-ID: score each language profile by marker hits
    per token; predict the argmax (deterministic tie-break by language
    code). A stand-in for real char-n-gram LM scoring, with the identical
    shape: L parallel scores + argmax."""
    w = words_of(F.col(text))
    n_words = F.size(w)
    scores = [
        F.struct(
            (F.size(F.filter(w, lambda x: x.isin(*marks))) / n_words).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, marks in sorted(LANG_MARKERS.items())
    ]
    # argmax: max over (score, reversed-lang) structs -> deterministic
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.col("lang").alias("labeled_lang"),
        best["lang"].alias("predicted_lang"),
        F.round(best["score"], 6).alias("marker_score"),
    )


def tfidf(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", min_df: int = 1
) -> DataFrame:
    """TF-IDF per (doc, term): tf = count/doc_len, idf = ln((N+1)/(df+1))+1
    (smoothed). The raw token explosion runs exactly ONCE: doc lengths and
    document frequencies are unbounded-frame windows over the per-(doc,
    term) ``tf`` relation rather than separate aggregate+join branches.
    The branch form LOOKS like it reuses ``tf``, but column pruning makes
    each branch's aggregate subtree structurally different, so Spark's
    ReusedExchange never fires and the explode ran three times (measured:
    3 Generate / 12 Exchange nodes; this form is 1 Generate / 7). The
    window on ``term`` hashes by term — the same skew profile the dfreq
    join already had (df over distinct (id, term) pairs, no count-distinct
    expand); the window on ``id`` feeds consumers that re-partition by id
    anyway (keyword ranking), so its exchange is reused downstream."""
    toks = df.select(F.col(id_col).alias("id"), F.explode(words_of(F.col(text))).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf_count"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .filter(F.col("df") >= min_df)
        .withColumn("doc_len", F.sum("tf_count").over(Window.partitionBy("id")))
    )
    return (
        scored.crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            "tf_count",
            F.round(
                (F.col("tf_count") / F.col("doc_len"))
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                9,
            ).alias("tfidf"),
        )
    )


def fingerprint(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic polynomial rolling hash over tokens (document
    fingerprint): fp = Σ-fold (fp * 31 + token_code) mod 2^31-1, where
    token_code folds character codes the same way. Pure integer arithmetic,
    reproducible in any engine (oracle twin uses the identical recurrence).
    """
    M = 2147483647  # 2^31 - 1
    w = words_of(F.col(text))
    tok_code = lambda t: F.pmod(  # noqa: E731
        F.aggregate(
            F.split(t, ""),
            F.lit(7).cast("long"),
            lambda acc, ch: F.pmod(acc * 31 + F.coalesce(F.ascii(ch), F.lit(0)), F.lit(M)),
        ),
        F.lit(M),
    )
    fp = F.aggregate(
        w,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * 131 + tok_code(t), F.lit(M)),
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "text_quality_scores",
    oracle="""
    WITH t AS (
        SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w,
               length(text) AS nc
        FROM documents
    )
    SELECT doc_id,
           CAST(nc AS BIGINT) AS n_chars_text,
           CAST(len(w) AS BIGINT) AS n_words,
           round((nc - len(w) + 1) / len(w), 6) AS avg_word_len,
           round(len(list_filter(w, x -> x IN ('the','a','and','of','to','in','is'))) / len(w), 6)
               AS stopword_ratio,
           round((nc - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / nc, 6) AS punct_ratio,
           round((nc - length(regexp_replace(text, '[A-Z]', '', 'g'))) / nc, 6) AS upper_ratio,
           round(1.0 - len(list_distinct(w)) / len(w), 6) AS repetition_ratio
    FROM t
    """,
    tags=("text", "quality"),
)
def q_text_quality(spark, sf_dir):
    """Quality-score features per document."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_scores(docs)


@register(
    "text_langid",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang AS labeled_lang,
               string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ), scored AS (
        SELECT doc_id, labeled_lang,
               [
                 {'score': len(list_filter(w, x -> x IN ('der','die','und','das'))) / len(w), 'lang': 'de'},
                 {'score': len(list_filter(w, x -> x IN ('the','a','and','of'))) / len(w), 'lang': 'en'},
                 {'score': len(list_filter(w, x -> x IN ('el','los','y','de'))) / len(w), 'lang': 'es'},
                 {'score': len(list_filter(w, x -> x IN ('le','la','et','de'))) / len(w), 'lang': 'fr'},
                 {'score': len(list_filter(w, x -> x IN ('的','是','了','在'))) / len(w), 'lang': 'zh'}
               ] AS scores
        FROM t
    )
    SELECT doc_id, labeled_lang,
           list_max(scores)['lang'] AS predicted_lang,
           round(list_max(scores)['score'], 6) AS marker_score
    FROM scored
    """,
    tags=("text", "langid"),
)
def q_text_langid(spark, sf_dir):
    """Heuristic marker-word language identification."""
    docs = load_table(spark, sf_dir, "documents")
    return langid_scores(docs)


@register(
    "text_token_topk",
    oracle="""
    SELECT term, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents) t
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
    tags=("text", "tokens", "topk"),
)
def q_text_token_topk(spark, sf_dir):
    """Corpus-level token counting: explode → hash agg → top-20."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(words_of(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(20)
    )


@register(
    "text_tfidf",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT id, term, CAST(count(*) AS BIGINT) AS tf_count FROM toks GROUP BY id, term
    ), dl AS (
        SELECT id, CAST(count(*) AS BIGINT) AS doc_len FROM toks GROUP BY id
    ), dfreq AS (
        SELECT term, count(DISTINCT id) AS df FROM toks GROUP BY term
    ), nd AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    )
    SELECT tf.id, tf.term, tf.tf_count,
           round((tf.tf_count / dl.doc_len) * (ln((nd.n_docs + 1) / (dfreq.df + 1)) + 1), 9)
               AS tfidf
    FROM tf JOIN dl USING (id) JOIN dfreq USING (term) CROSS JOIN nd
    """,
    tags=("text", "tfidf"),
)
def q_text_tfidf(spark, sf_dir):
    """TF-IDF inverted index over the corpus."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return tfidf(docs)


_BM25_TERMS = ("hash", "join", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...] = _BM25_TERMS,
    k: int = _BM25_TOPK,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 retrieval (Robertson & Spärck Jones family — public):
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N−df+0.5)/(df+0.5)), top-k docs for a fixed query
    term set.  The sparse-retrieval half every hybrid (BM25 + dense)
    stack runs; `sim_rrf_fusion` is the fusion layer above it.

    Scale shape: ONE token explosion; doc length and document frequency
    are grouped aggregates over the (doc, term) tf relation; corpus-level
    N/avgdl collapse to a broadcast 1-row literal; only postings of the
    |Q| query terms survive the filter, so the scored relation is
    Σ_t∈Q df(t) rows — never the corpus.  Global top-k = orderBy + limit
    (partial per-partition top-k then a k-row merge; the rank window runs
    POST-limit on k rows, keeping the repo's no-unbounded-window rule).
    avgdl is rounded to 6dp on both engines before use so the one
    cross-engine aggregation-order difference can't leak into scores."""
    toks = df.select(F.col(id_col), F.explode(words_of(F.col(text))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.round(F.avg("dl"), 6).alias("avgdl"), F.count("*").alias("n_docs")
    )
    hits = tf.filter(F.col("term").isin(*terms))
    dfreq = hits.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("part", idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom)
        .groupBy(id_col, "dl")
        .agg(F.sum("part").alias("score"))
    )
    top = scored.orderBy(F.desc(F.round("score", 9)), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc(F.round("score", 9)), F.asc(id_col))
    return top.select(
        id_col,
        "dl",
        F.round("score", 6).alias("bm25"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
    ), stats AS (
        SELECT round(avg(dl), 6) AS avgdl, count(*) AS n_docs FROM dl
    ), dfreq AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tf
        WHERE term IN {_BM25_TERMS!r}
        GROUP BY 1
    ), scored AS (
        SELECT t.doc_id, d.dl,
               sum(
                   ln(CAST(1.0 AS DOUBLE)
                      + (s.n_docs - f.df + CAST(0.5 AS DOUBLE))
                        / (f.df + CAST(0.5 AS DOUBLE)))
                   * (t.tf * CAST({_BM25_K1 + 1.0!r} AS DOUBLE))
                   / (t.tf + CAST({_BM25_K1!r} AS DOUBLE)
                      * (CAST({1.0 - _BM25_B!r} AS DOUBLE)
                         + CAST({_BM25_B!r} AS DOUBLE) * d.dl / s.avgdl))
               ) AS score
        FROM tf t
        JOIN dfreq f USING (term)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s
        WHERE t.term IN {_BM25_TERMS!r}
        GROUP BY 1, 2
    )
    SELECT doc_id, dl, round(score, 6) AS bm25,
           CAST(row_number() OVER (
               ORDER BY round(score, 9) DESC, doc_id) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= {_BM25_TOPK}
    """,
    tags=("text", "retrieval", "bm25", "topk"),
)
def q_text_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-20 for the fixed query (hash, join, vector) over the
    documents corpus — the sparse-retrieval ranker beside the dense ANN
    stack (fuse with `sim_rrf_fusion`).  k1=1.2, b=0.75 (the canonical
    defaults)."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return bm25_topk(docs)


# Multi-query BM25 serving + retrieval eval (r9): the BATCH shape a real
# retrieval stack runs — a query RELATION scored in one pass — plus the
# MRR / precision@k audit that prices the ranking, mirroring how
# `sim_recall_audit` prices the dense path.

_BM25_PANEL = (
    (1, ("hash", "join", "vector")),
    (2, ("customer", "order", "line")),
    (3, ("stream", "batch", "window")),
)
_BM25_MULTI_K = 10


def bm25_multi_topk(
    df: DataFrame,
    panel: tuple = _BM25_PANEL,
    k: int = _BM25_MULTI_K,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 over a query RELATION: one token pass, one broadcast of the
    (query_id, term) panel, scores for every (query, doc) with at least
    one hit, per-query top-k through a PARTITIONED rank window — |panel|
    rides a broadcast, so 3 queries and 3 million take the same plan
    (with a genuinely large panel the broadcast becomes a shuffle join on
    term — one hint away)."""
    tf = _bm25_tf(df, text, id_col)
    qdf = _bm25_panel_df(df.sparkSession, panel)
    return _bm25_rank_from_tf(tf, qdf, k, k1, b, id_col)


def _bm25_tf(df: DataFrame, text: str, id_col: str) -> DataFrame:
    toks = df.select(F.col(id_col), F.explode(words_of(F.col(text))).alias("term"))
    return toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def _bm25_panel_df(spark, panel: tuple) -> DataFrame:
    return spark.createDataFrame(
        [(qid, t) for qid, terms in panel for t in terms], "query_id long, term string"
    )


def _bm25_rank_from_tf(
    tf: DataFrame,
    qdf: DataFrame,
    k: int,
    k1: float,
    b: float,
    id_col: str,
    exclude_self: bool = False,
) -> DataFrame:
    """Per-query top-k from a precomputed (doc, term, tf) relation —
    factored so consumers that also need the tf relation (the eval) share
    ONE token explosion instead of rebuilding the subtree per branch.
    ``exclude_self=True`` drops the document whose id equals the query id
    before ranking (query-by-example serving, where the anchor trivially
    tops its own result list)."""
    # r14: dl feeds the stats aggregate AND the length-norm join; hits
    # feeds dfreq AND the scoring join (and carries qdf, which for the
    # hybrid serve is itself an expensive anchor-TF-IDF subtree) — without
    # cuts every consumer re-derives them (hybrid_retrieval_rrf's executed
    # plan: 901 lines / 66 Exchanges; 259 / 18 after)
    dl = (
        tf.groupBy(id_col)
        .agg(F.sum("tf").cast("long").alias("dl"))
        .localCheckpoint(eager=False)
    )
    stats = dl.agg(
        F.round(F.avg("dl"), 6).alias("avgdl"), F.count("*").alias("n_docs")
    )
    hits = tf.join(F.broadcast(qdf), "term").localCheckpoint(eager=False)
    dfreq = hits.select("term", id_col).distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("part", idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom)
        .groupBy("query_id", id_col)
        .agg(F.sum("part").alias("score"))
    )
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 9)), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("score", 6).alias("bm25"), "rank")
    )


def _bm25_multi_cte() -> str:
    panel_rows = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_PANEL for t in terms
    )
    return f"""
    qdf AS (SELECT CAST(query_id AS BIGINT) AS query_id, term
            FROM (VALUES {panel_rows}) v(query_id, term)),
    toks AS MATERIALIZED (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ), tf AS MATERIALIZED (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS MATERIALIZED (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
    ), stats AS (
        SELECT round(avg(dl), 6) AS avgdl, count(*) AS n_docs FROM dl
    ), hits AS MATERIALIZED (
        SELECT q.query_id, t.doc_id, t.term, t.tf FROM tf t JOIN qdf q USING (term)
    ), dfreq AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1
    ), scored AS MATERIALIZED (
        SELECT h.query_id, h.doc_id,
               sum(
                   ln(CAST(1.0 AS DOUBLE)
                      + (s.n_docs - f.df + CAST(0.5 AS DOUBLE))
                        / (f.df + CAST(0.5 AS DOUBLE)))
                   * (h.tf * CAST({_BM25_K1 + 1.0!r} AS DOUBLE))
                   / (h.tf + CAST({_BM25_K1!r} AS DOUBLE)
                      * (CAST({1.0 - _BM25_B!r} AS DOUBLE)
                         + CAST({_BM25_B!r} AS DOUBLE) * d.dl / s.avgdl))
               ) AS score
        FROM hits h
        JOIN dfreq f USING (term)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s
        GROUP BY 1, 2
    ), ranked AS MATERIALIZED (
        SELECT query_id, doc_id, round(score, 6) AS bm25,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(score, 9) DESC, doc_id) AS BIGINT) AS rank
        FROM scored
    )"""


@register(
    "text_bm25_multi",
    oracle=f"""
    WITH {_bm25_multi_cte()}
    SELECT query_id, doc_id, bm25, rank FROM ranked WHERE rank <= {_BM25_MULTI_K}
    """,
    tags=("text", "retrieval", "bm25", "topk", "relation"),
)
def q_text_bm25_multi(spark, sf_dir):
    """BM25 serving for a 3-query panel in one corpus pass — per-query
    top-10 through a partitioned rank window (the batch-retrieval shape;
    per-query metrics audited by `text_bm25_eval`)."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return bm25_multi_topk(docs)


@register(
    "text_bm25_stream_serve",
    oracle=f"""
    WITH {_bm25_multi_cte()}
    SELECT query_id, doc_id, bm25, rank FROM ranked WHERE rank <= {_BM25_MULTI_K}
    """,
    tags=("text", "retrieval", "bm25", "streaming", "incremental"),
)
def q_text_bm25_stream_serve(spark, sf_dir):
    """INCREMENTAL twin of `text_bm25_multi`, exercised as a
    batch-callable query: documents are ingested in three deterministic
    micro-batches (split on pmod(xxhash64(doc_id), 3)) through
    `Bm25StreamIndex`, whose per-batch state is the (doc, term, tf)
    inverted-index shard; the SERVED per-query top-10 over the merged
    shards is returned.  The oracle is the plain one-pass batch SQL —
    passing value-hash-exact proves the accumulated index serves the
    same ranking a batch rebuild would, including the retroactive
    df/avgdl reweighting late documents cause."""
    import atexit
    import shutil
    import tempfile

    from ..streaming.bm25_stream import Bm25StreamIndex

    docs = load_table(spark, sf_dir, "documents")
    store = tempfile.mkdtemp(prefix="bm25_serve_")
    atexit.register(shutil.rmtree, store, ignore_errors=True)
    idx = Bm25StreamIndex(spark, store)
    for bid in range(3):
        idx.ingest_batch(
            docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == bid), bid
        )
    return idx.serve_topk(_BM25_PANEL, k=_BM25_MULTI_K, k1=_BM25_K1, b=_BM25_B)


@register(
    "text_bm25_eval",
    oracle=f"""
    WITH {_bm25_multi_cte()},
    nterms AS (
        SELECT query_id, count(*) AS nt FROM qdf GROUP BY 1
    ), relevant AS (
        SELECT h.query_id, h.doc_id
        FROM (SELECT DISTINCT query_id, doc_id, term FROM hits) h
        JOIN nterms n USING (query_id)
        GROUP BY h.query_id, h.doc_id
        HAVING count(*) = max(n.nt)
    ), topk AS (
        SELECT query_id, doc_id, rank FROM ranked WHERE rank <= {_BM25_MULTI_K}
    ), joined AS (
        SELECT t.query_id, t.rank,
               CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
        FROM topk t LEFT JOIN relevant r
          ON r.query_id = t.query_id AND r.doc_id = t.doc_id
    )
    SELECT j.query_id,
           CAST(max(nr.n) AS BIGINT) AS n_relevant,
           CAST(sum(CASE WHEN j.rank <= 5 THEN j.rel ELSE 0 END) AS BIGINT)
               AS hits_at_5,
           round(sum(CASE WHEN j.rank <= 5 THEN j.rel ELSE 0 END) / 5.0, 6)
               AS precision_at_5,
           round(coalesce(max(CASE WHEN j.rel = 1
                                   THEN 1.0 / j.rank END), 0.0), 6) AS mrr
    FROM joined j
    JOIN (SELECT query_id, count(*) AS n FROM relevant GROUP BY 1) nr
      USING (query_id)
    GROUP BY j.query_id
    """,
    tags=("text", "retrieval", "bm25", "eval", "audit"),
)
def q_text_bm25_eval(spark, sf_dir):
    """Retrieval-quality audit of the BM25 panel: per query, with
    relevance = "document contains EVERY query term" (the conjunctive
    proxy — deterministic and corpus-derived, no human labels), report
    the relevant-set size, hits@5, precision@5, and MRR@10.  The sparse
    twin of `sim_recall_audit`: a retrieval stack ships only when both
    its dense and sparse rankers carry an eval row."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    qdf = _bm25_panel_df(docs.sparkSession, _BM25_PANEL)
    nterms = qdf.groupBy("query_id").agg(F.count("*").alias("nt"))
    # ONE token explosion shared by the ranking and the relevance sides
    # (lazy checkpoint: first consumer materializes, the rest read it).
    tf = _bm25_tf(docs, "text", "doc_id").localCheckpoint(eager=False)
    matched = (
        tf.join(F.broadcast(qdf), "term")
        .select("query_id", "doc_id", "term")
        .distinct()
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("nm"))
    )
    relevant = (
        matched.join(F.broadcast(nterms), "query_id")
        .filter(F.col("nm") == F.col("nt"))
        .select("query_id", "doc_id")
    )
    nrel = relevant.groupBy("query_id").agg(F.count("*").alias("n"))
    topk = _bm25_rank_from_tf(
        tf, qdf, _BM25_MULTI_K, _BM25_K1, _BM25_B, "doc_id"
    ).select("query_id", "doc_id", "rank")
    joined = topk.join(
        relevant.withColumn("rel", F.lit(1)), ["query_id", "doc_id"], "left"
    ).select("query_id", "rank", F.coalesce("rel", F.lit(0)).alias("rel"))
    return (
        joined.join(F.broadcast(nrel), "query_id")
        .groupBy("query_id")
        .agg(
            F.max("n").cast("long").alias("n_relevant"),
            F.sum(F.when(F.col("rank") <= 5, F.col("rel")).otherwise(0))
            .cast("long")
            .alias("hits_at_5"),
            F.round(
                F.sum(F.when(F.col("rank") <= 5, F.col("rel")).otherwise(0)) / 5.0, 6
            ).alias("precision_at_5"),
            F.round(
                F.coalesce(
                    F.max(F.when(F.col("rel") == 1, F.lit(1.0) / F.col("rank"))),
                    F.lit(0.0),
                ),
                6,
            ).alias("mrr"),
        )
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    )
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT), list_transform(w,
                   t -> list_reduce(
                       list_prepend(CAST(7 AS BIGINT), list_transform(string_split(t, ''),
                           ch -> CAST(coalesce(ascii(ch), 0) AS BIGINT))),
                       (acc, c) -> (acc * 31 + c) % 2147483647)
               )),
               (acc, tc) -> (acc * 131 + tc % 2147483647) % 2147483647
           ) AS fingerprint
    FROM t
    """,
    tags=("text", "fingerprint"),
)
def q_text_fingerprint(spark, sf_dir):
    """Deterministic polynomial document fingerprint (integer arithmetic —
    exact cross-engine parity, no hash-library dependence)."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return fingerprint(docs)


@register(
    "text_edit_distance_pairs",
    oracle="""
    WITH banded AS (
        SELECT p_partkey, p_brand, p_name,
               unnest([length(p_name) // 9, length(p_name) // 9 + 1]) AS band
        FROM part
    )
    SELECT DISTINCT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_distance
    FROM banded a JOIN banded b
      ON a.p_brand = b.p_brand AND a.band = b.band AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 8
    """,
    tags=("text", "similarity", "levenshtein"),
)
def q_edit_distance(spark, sf_dir):
    """Edit-distance near-dup pairs within a blocking key (brand),
    prefiltered by a LOSSLESS length band — character-level complement to
    the token-level Jaccard/MinHash family.

    distance ≤ 8 implies |len(a) − len(b)| ≤ 8, so with 9-wide length
    bands a qualifying pair lands in the same or adjacent band.  Two
    equi-joins cover that losslessly with each pair generated exactly
    ONCE — same-band (key-ordered) plus adjacent-band (orientation fixed
    by the band, keys normalized after) — replacing the emit-into-two-
    bands + DISTINCT form that scored every same-band pair twice and
    then paid a dedup shuffle; an exact length-gap prefilter (|Δlen| ≤ 8,
    pure codegen) skips the DP for the band-boundary stragglers.  The
    r8 rewrite took sf0.1 from 22.5 s to ~1.4 s — almost all of it from
    `ensure_min_partitions`: the probe side of the broadcast join was a
    single parquet partition, serializing ~8M candidate emissions + 5M
    DP verifications onto one core (measured: the threshold form of
    levenshtein is ~40% SLOWER than the plain O(n·m) DP at these ~33-char
    lengths, so the classic bounded-DP trick is deliberately NOT used).
    Honest scale note: brand count is FIXED, so brand-block size still
    grows with the corpus — at 100 TB the length band (and, beyond it, a
    q-gram count prefilter) is what keeps the verified pair volume
    sub-quadratic."""
    # The probe side of the broadcast join inherits the scan's partition
    # count — a single small parquet file would serialize all ~8M
    # candidate emissions + DP verifications onto one core.
    p = ensure_min_partitions(load_table(spark, sf_dir, "part"))
    banded = p.select(
        "p_partkey",
        "p_brand",
        "p_name",
        (F.length("p_name") / 9).cast("long").alias("band"),
    )
    a = banded.select(
        F.col("p_partkey").alias("key_a"), "p_brand", "band", F.col("p_name").alias("name_a")
    )
    b = banded.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("band").alias("band_b"),
        F.col("p_name").alias("name_b"),
    )
    same = a.join(
        b,
        (F.col("p_brand") == F.col("brand_b"))
        & (F.col("band") == F.col("band_b"))
        & (F.col("key_a") < F.col("key_b")),
    )
    adjacent = a.join(
        b,
        (F.col("p_brand") == F.col("brand_b"))
        & (F.col("band") == F.col("band_b") - F.lit(1)),
    )
    cand = same.unionByName(adjacent).select(
        F.least("key_a", "key_b").alias("key_a"),
        F.greatest("key_a", "key_b").alias("key_b"),
        "name_a",
        "name_b",
    )
    return (
        cand.filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= 8
        )
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_distance") <= 8)
        .select("key_a", "key_b", "edit_distance")
    )


# GPT-style pre-tokenizer classes, lookahead-free so Java regex (Spark) and
# RE2 (DuckDB oracle) agree: letter runs, digit runs, non-space symbol runs.
BPE_ISH_PATTERN = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]+'))
                AS BIGINT) AS bpe_ish_tokens,
           round(length(text)
                 / greatest(len(regexp_extract_all(text, '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]+')), 1),
                 6) AS chars_per_token
    FROM documents
    """,
    tags=("text", "tokens"),
)
def q_text_token_stats(spark, sf_dir):
    """Per-document token counting two ways (SURVEY §2.8 text analysis):
    whitespace splitting and a BPE-ish pre-tokenizer regex (letter / digit /
    symbol runs — the lookahead-free core of GPT-2's pre-tokenizer), plus
    chars-per-token, the usual proxy for tokenizer efficiency. Pure codegen
    string ops; at scale this is a map-only pass with no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("ws_tokens"),
        F.size(bpe).cast("long").alias("bpe_ish_tokens"),
        F.round(
            F.length("text") / F.greatest(F.size(bpe), F.lit(1)), 6
        ).alias("chars_per_token"),
    )


@register(
    "pipeline_clean_corpus",
    oracle="""
    WITH kept AS (
        SELECT doc_id, text, lang, source, n_chars,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
        WHERE lang IN ('en', 'de', 'fr', 'es') AND n_chars BETWEEN 120 AND 480
    ), survivors AS (
        SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
    )
    SELECT k.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(k.n_tokens) AS BIGINT) AS total_tokens,
           round(avg(k.n_chars), 6) AS avg_chars
    FROM kept k JOIN survivors s ON k.doc_id = s.doc_id
    GROUP BY k.source
    """,
    tags=("text", "pipeline", "dedup"),
)
def q_pipeline_clean_corpus(spark, sf_dir):
    """End-to-end training-data prep composite: language allowlist → length
    band → exact dedup (md5 group-by, min-id survivor) → per-source corpus
    stats. The shape of a real 100 TB cleaning job: every stage is a
    pushed-down filter, one dedup shuffle on the hash, one agg shuffle on
    source — the allowlist and length band prune before any shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(
        F.col("lang").isin("en", "de", "fr", "es")
        & F.col("n_chars").between(120, 480)
    ).withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    )
    survivors = kept.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keep_id")
    )
    return (
        kept.join(survivors, kept.doc_id == survivors.keep_id, "left_semi")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS-style near-dup/plagiarism detector)
# ---------------------------------------------------------------------------


@register(
    "text_winnow_fingerprint",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), g AS (
        SELECT doc_id,
               list_transform(range(1, len(w) - 1),
                   i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15))::BIGINT
               ) AS h
        FROM t WHERE len(w) >= 6
    ), fp AS (
        SELECT doc_id,
               list_transform(range(1, len(h) - 2),
                   j -> least(h[j], h[j+1], h[j+2], h[j+3])) AS fps
        FROM g
    )
    SELECT DISTINCT doc_id, unnest(fps) AS fingerprint
    FROM fp
    """,
    tags=("text", "fingerprint", "winnowing"),
)
def q_winnow_fingerprint(spark, sf_dir):
    """Winnowing document fingerprints (the MOSS scheme): hash every
    3-word shingle (60-bit md5), slide a window of 4 consecutive shingle
    hashes, keep each window's minimum, emit the distinct (doc, fingerprint)
    set. Guarantees every match of ≥ 6 consecutive words between two
    documents shares a fingerprint — the classic sub-quadratic overlap
    detector (candidates come from an equi-join on ``fingerprint``, like
    the MinHash band join). Pure Catalyst HOFs over one scan: the shingle
    hash array and window minima are per-row ``transform``s (no explode
    until the final distinct), so the 100 TB cost is one scan + one
    distinct shuffle of (doc, fp) pairs."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    w = F.split(F.trim(F.col("text")), r"\s+")
    hashes = F.transform(
        F.sequence(F.lit(1), F.size("w") - 2),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ",
                        F.element_at(F.col("w"), i),
                        F.element_at(F.col("w"), i + 1),
                        F.element_at(F.col("w"), i + 2),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
    )
    fps = F.transform(
        F.sequence(F.lit(1), F.size("h") - 3),
        lambda j: F.least(
            F.element_at(F.col("h"), j),
            F.element_at(F.col("h"), j + 1),
            F.element_at(F.col("h"), j + 2),
            F.element_at(F.col("h"), j + 3),
        ),
    )
    return (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 6)
        .select("doc_id", hashes.alias("h"))
        .select("doc_id", F.explode(fps).alias("fingerprint"))
        .distinct()
    )


@register(
    "text_keywords_topk",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT id, term, CAST(count(*) AS BIGINT) AS tf_count FROM toks GROUP BY id, term
    ), dl AS (
        SELECT id, CAST(sum(tf_count) AS BIGINT) AS doc_len FROM tf GROUP BY id
    ), dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), nd AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.id, tf.term,
               round((tf.tf_count / dl.doc_len)
                     * (ln((nd.n_docs + 1) / (dfreq.df + 1)) + 1), 9) AS tfidf
        FROM tf JOIN dl USING (id) JOIN dfreq USING (term) CROSS JOIN nd
    )
    SELECT id, term, tfidf,
           CAST(row_number() OVER (PARTITION BY id
                                   ORDER BY tfidf DESC, term) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 3
    """,
    tags=("text", "tfidf", "keywords"),
)
def q_text_keywords(spark, sf_dir):
    """Top-3 TF-IDF keywords per document — the per-doc salience extractor
    (tagging, routing, topic seeding) layered on the corpus TF-IDF
    relation. The rank window partitions by doc over the per-(doc, term)
    relation (bounded by doc length), ordering on the round-9 score with
    the term string as the deterministic tiebreaker — both engines sort
    ASCII terms identically, so the selected keyword SET is bit-stable."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    scored = tfidf(docs)
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("id", "term", "tfidf", "rank")
    )


@register(
    "text_readability_scores",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                    w -> len(w) > 0)) AS BIGINT) AS n_words,
               CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                                    s -> len(trim(s)) > 0)) AS BIGINT) AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
                 AS n_vowel_groups
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_vowel_groups,
           floor(CAST(n_words AS DOUBLE) / n_sentences * 1000000 + 0.5)
             / 1000000 AS words_per_sentence,
           floor((206.835
                  - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                  - 84.6 * (CAST(n_vowel_groups AS DOUBLE) / n_words))
                 * 1000000 + 0.5) / 1000000 AS flesch_proxy
    FROM base WHERE n_words > 0 AND n_sentences > 0
    """,
    tags=("text", "quality", "readability"),
)
def q_text_readability(spark, sf_dir):
    """Flesch-style readability proxy per document: words/sentence and a
    vowel-group syllable proxy feed the classic 206.835 − 1.015·wps −
    84.6·spw formula — the reading-level gate corpus pipelines run beside
    the Gopher rules. All three counts are exact integers from portable
    regex classes ([.!?]+ sentence split, [aeiouy]+ vowel groups — ASCII
    character classes behave identically in Java regex and RE2, the
    `corpus_pii_redact` precedent); the score is one fixed-shape
    expression on exact counts, floor-canonicalized. One scan, zero
    shuffles below the output."""
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    words = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda w: F.length(w) > 0
    )
    sents = F.filter(
        F.split(F.col("text"), r"[.!?]+"), lambda s: F.length(F.trim(s)) > 0
    )
    vg = F.size(
        F.split(F.regexp_replace(F.lower(F.col("text")), r"[aeiouy]+", "\x01"), "\x01")
    ) - 1
    base = docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(sents).cast("long").alias("n_sentences"),
        vg.cast("long").alias("n_vowel_groups"),
    ).filter((F.col("n_words") > 0) & (F.col("n_sentences") > 0))
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_vowel_groups").cast("double") / F.col("n_words")
    score = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    return base.select(
        "doc_id", "n_words", "n_sentences", "n_vowel_groups",
        (F.floor(wps * 1000000 + 0.5) / 1000000).alias("words_per_sentence"),
        (F.floor(score * 1000000 + 0.5) / 1000000).alias("flesch_proxy"),
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes — the classic fast corpus classifier (r5)
# ---------------------------------------------------------------------------


_NB_ORACLE_PREFIX = """
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ), dt AS (
        SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS n_dw
        FROM toks GROUP BY doc_id, lang, term
    ), train AS (
        SELECT * FROM dt WHERE doc_id % 5 <> 0
    ), test AS (
        SELECT * FROM dt WHERE doc_id % 5 = 0
    ), wc AS (
        SELECT lang AS cls, term, CAST(sum(n_dw) AS BIGINT) AS cnt
        FROM train GROUP BY lang, term
    ), classes AS (
        SELECT cls, CAST(sum(cnt) AS BIGINT) AS tot FROM wc GROUP BY cls
    ), priors AS (
        SELECT lang AS cls, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
        FROM train GROUP BY lang
    ), v AS (
        SELECT CAST(count(DISTINCT term) AS BIGINT) AS vsz FROM train
    ), ntr AS (
        SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM train
    ), scored AS (
        SELECT t.doc_id, t.lang AS true_lang, c.cls,
               sum(t.n_dw * ln(CAST(COALESCE(w.cnt, 0) + 1 AS DOUBLE))) AS s1,
               CAST(sum(t.n_dw) AS BIGINT) AS td
        FROM test t
        CROSS JOIN (SELECT cls FROM classes) c
        LEFT JOIN wc w ON w.cls = c.cls AND w.term = t.term
        GROUP BY t.doc_id, t.lang, c.cls
    ), sc AS (
        SELECT s.doc_id, s.true_lang, s.cls,
               floor((ln(p.nd / CAST(ntr.n AS DOUBLE)) + s.s1
                      - s.td * ln(CAST(c.tot + v.vsz AS DOUBLE)))
                     * 1000000 + 0.5) AS score
        FROM scored s
        JOIN classes c ON c.cls = s.cls
        JOIN priors p ON p.cls = s.cls
        CROSS JOIN v CROSS JOIN ntr
    ), pred AS (
        SELECT doc_id, true_lang, cls AS pred_lang,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, cls) AS r
        FROM sc
    )
"""


def _nb_predictions(spark, sf_dir):
    """Shared NB train+score core: (doc_id, true_lang, cls, score, r) with
    r = 1 marking the argmax row per test doc — feeds both the per-class
    accuracy rollup and the confusion matrix."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(words_of(F.col("text"))).alias("term")
    )
    dt = toks.groupBy("doc_id", "lang", "term").agg(
        F.count("*").cast("long").alias("n_dw")
    )
    dt = dt.localCheckpoint(eager=False)
    train = dt.filter(F.col("doc_id") % 5 != 0)
    test = dt.filter(F.col("doc_id") % 5 == 0)
    wc = train.groupBy(F.col("lang").alias("cls"), "term").agg(
        F.sum("n_dw").cast("long").alias("cnt")
    )
    wc = wc.localCheckpoint(eager=False)
    classes = wc.groupBy("cls").agg(F.sum("cnt").cast("long").alias("tot"))
    priors = train.groupBy(F.col("lang").alias("cls")).agg(
        F.countDistinct("doc_id").cast("long").alias("nd")
    )
    v = train.agg(F.countDistinct("term").cast("long").alias("vsz"))
    ntr = train.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    scored = (
        test.withColumnRenamed("lang", "true_lang")
        .crossJoin(F.broadcast(classes.select("cls")))
        .join(wc, ["cls", "term"], "left")
        .groupBy("doc_id", "true_lang", "cls")
        .agg(
            F.sum(
                F.col("n_dw")
                * F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double"))
            ).alias("s1"),
            F.sum("n_dw").cast("long").alias("td"),
        )
    )
    full = (
        scored.join(F.broadcast(classes), "cls")
        .join(F.broadcast(priors), "cls")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(ntr))
    )
    score = F.floor(
        (
            F.log(F.col("nd") / F.col("n").cast("double"))
            + F.col("s1")
            - F.col("td") * F.log((F.col("tot") + F.col("vsz")).cast("double"))
        )
        * 1000000
        + F.lit(0.5)
    )
    wp = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    return full.withColumn("score", score).withColumn("r", F.row_number().over(wp))


@register(
    "ml_naive_bayes_text",
    oracle=_NB_ORACLE_PREFIX + """
    SELECT true_lang AS lang,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(count(*) FILTER (WHERE pred_lang = true_lang) AS BIGINT)
               AS n_correct,
           round(count(*) FILTER (WHERE pred_lang = true_lang)
                 / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pred WHERE r = 1
    GROUP BY true_lang
    """,
    tags=("ml", "text", "classifier", "naive-bayes"),
)
def q_ml_naive_bayes_text(spark, sf_dir):
    """Multinomial Naive Bayes language classifier, trained and evaluated
    in one query: Laplace-smoothed per-class token log-likelihoods from
    the doc_id%5!=0 training split, argmax scoring on the held-out fifth,
    per-class accuracy out — the cheap high-throughput classifier (a la
    fastText-style curation gates) that corpus pipelines run when the
    Newton logistic model (`ml_logistic_newton`) is too heavy.

    Entirely relational NB: the "model" IS two aggregate tables (per-class
    term counts + class totals), training is one grouped sum over the
    token relation, and inference is a left join of test tokens against
    the model keyed on (class, term) — at 100 TB both sides partition on
    the term key and the 5-row class list broadcasts; no parameter vector
    ever leaves the cluster. Unseen-term mass folds into the closed form
    sum n_dw*ln(cnt+1) - T_d*ln(tot_c+V), so the join stays sparse
    (only seen (term, class) pairs carry rows). Scores are canonicalized
    to 1e-6 log-units before the argmax so both engines pick identical
    labels (ties break toward the smaller class label)."""
    pred = _nb_predictions(spark, sf_dir).filter(F.col("r") == 1)
    correct = F.when(F.col("cls") == F.col("true_lang"), 1).otherwise(0)
    return pred.groupBy(F.col("true_lang").alias("lang")).agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum(correct).cast("long").alias("n_correct"),
        F.round(F.sum(correct) / F.count("*").cast("double"), 6).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# Cross-doc duplicate spans — exact substring-dedup marking (r5)
# ---------------------------------------------------------------------------

_SPAN_W = 8  # shingle width in tokens


@register(
    "text_duplicate_spans",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos, unnest(w) AS term
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
              FROM documents)
    ), sh AS (
        SELECT doc_id, pos,
               concat_ws(' ', term,
                   {", ".join(f"lead(term, {i}) OVER (PARTITION BY doc_id ORDER BY pos)" for i in range(1, _SPAN_W))}
               ) AS gram,
               lead(term, {_SPAN_W - 1})
                   OVER (PARTITION BY doc_id ORDER BY pos) AS last_tok
        FROM toks
    ), full_sh AS (
        SELECT doc_id, pos, gram FROM sh WHERE last_tok IS NOT NULL
    ), dup AS (
        SELECT gram FROM full_sh
        GROUP BY gram HAVING count(DISTINCT doc_id) > 1
    ), marks AS (
        SELECT f.doc_id, f.pos AS s, f.pos + {_SPAN_W - 1} AS e
        FROM full_sh f JOIN dup d ON d.gram = f.gram
    ), isl AS (
        SELECT doc_id, s, e,
               CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id
                        ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) THEN 1 ELSE 0 END AS brk
        FROM marks
    ), grp AS (
        SELECT doc_id, s, e,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM isl
    )
    SELECT doc_id, CAST(island AS BIGINT) AS span_id,
           CAST(min(s) AS BIGINT) AS start_pos,
           CAST(max(e) AS BIGINT) AS end_pos,
           CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens
    FROM grp GROUP BY doc_id, island
    """,
    tags=("text", "dedup", "substring", "spans"),
)
def q_text_duplicate_spans(spark, sf_dir):
    """Cross-document duplicate SPANS: every maximal token interval covered
    by some 8-token shingle that also appears in another document — the
    marking pass of exact substring deduplication (the deduplicate-text-
    datasets approach: find long repeated substrings across the corpus and
    cut them, not whole near-dup docs). Output is the per-doc merged
    interval list a redaction pass would splice out.

    Shape: one posexplode + an 8-lead window builds every shingle in a
    single per-doc sort; cross-doc duplication is one grouped HAVING on
    the shingle (grouped by the raw 8-gram here for an exact oracle — at
    100 TB group on `functions/hashing.py`'s 60-bit md5 instead, same
    plan); interval merging is the gaps-and-islands running max, integer
    arithmetic end to end (full value-hash oracle, no canon needed)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(words_of(F.col("text"))).alias("pos", "term")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("term"), *[F.lead("term", i).over(wd) for i in range(1, _SPAN_W)]
    )
    sh = toks.select(
        "doc_id", "pos", gram.alias("gram"),
        F.lead("term", _SPAN_W - 1).over(wd).alias("last_tok"),
    ).filter(F.col("last_tok").isNotNull())
    dup = sh.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("nd")
    ).filter(F.col("nd") > 1).select("gram")
    marks = sh.join(dup, "gram").select(
        "doc_id", F.col("pos").alias("s"), (F.col("pos") + _SPAN_W - 1).alias("e")
    )
    wprev = (
        Window.partitionBy("doc_id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = marks.withColumn(
        "brk",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)), 1
        ).otherwise(0),
    )
    wrun = (
        Window.partitionBy("doc_id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = isl.withColumn("island", F.sum("brk").over(wrun))
    return grp.groupBy("doc_id", F.col("island").cast("long").alias("span_id")).agg(
        F.min("s").cast("long").alias("start_pos"),
        F.max("e").cast("long").alias("end_pos"),
        (F.max("e") - F.min("s") + 1).cast("long").alias("span_tokens"),
    )


@register(
    "corpus_tokenizer_fertility",
    oracle="""
    WITH d AS (
        SELECT lang,
               CAST(length(text) AS BIGINT) AS n_chars_txt,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           round(sum(n_bytes) / CAST(sum(n_tokens) AS DOUBLE), 6)
               AS bytes_per_token,
           round(sum(n_chars_txt) / CAST(sum(n_tokens) AS DOUBLE), 6)
               AS chars_per_token
    FROM d GROUP BY lang
    """,
    tags=("corpus", "tokenizer", "multilingual", "diagnostics"),
)
def q_corpus_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per language: bytes and characters consumed per
    whitespace token — the multilingual-budget diagnostic (languages with
    high bytes/token get fewer effective tokens per storage byte, which
    skews both cost accounting and mixture weights; real pipelines run
    this per tokenizer before fixing sampling rates). One grouped sum of
    three per-row integers; exact until the two final divisions."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.length("text").cast("long").alias("n_chars_txt"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.size(words_of(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.round(F.sum("n_bytes") / F.sum("n_tokens").cast("double"), 6).alias(
            "bytes_per_token"
        ),
        F.round(F.sum("n_chars_txt") / F.sum("n_tokens").cast("double"), 6).alias(
            "chars_per_token"
        ),
    )


@register(
    "ml_naive_bayes_confusion",
    oracle=_NB_ORACLE_PREFIX + """
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
    FROM pred WHERE r = 1
    GROUP BY true_lang, pred_lang
    """,
    tags=("ml", "text", "classifier", "evaluation", "confusion"),
)
def q_ml_naive_bayes_confusion(spark, sf_dir):
    """Confusion matrix of the Naive Bayes language classifier on the
    held-out fifth — WHICH languages get mistaken for which (the accuracy
    rollup in `ml_naive_bayes_text` hides the error structure; confusable
    language pairs like es/fr drive the actual cleanup decisions). Same
    shared train+score core; one extra grouped count."""
    pred = _nb_predictions(spark, sf_dir).filter(F.col("r") == 1)
    return pred.groupBy(
        "true_lang", F.col("cls").alias("pred_lang")
    ).agg(F.count("*").cast("long").alias("n"))


# ---------------------------------------------------------------------------
# Query-by-example HYBRID retrieval (r9): the full stack in one query —
# sparse BM25 (this module) + dense cosine (the embeddings table, shared id
# space established by `multimodal_text_embedding_join`), fused by
# reciprocal-rank fusion exactly as `sim_rrf_fusion` fuses its rankers.
# ---------------------------------------------------------------------------

_HYB_ANCHORS = (3, 7, 11)
_HYB_TERMS = 3     # query terms mined from the anchor's own top TF-IDF
_HYB_POOL = 20     # per-ranker candidate depth entering the fusion
_HYB_K = 10        # fused top-k
_HYB_RRF = 60      # the canonical RRF constant


@register(
    "hybrid_retrieval_rrf",
    oracle=f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    ), tf AS MATERIALIZED (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS MATERIALIZED (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
    ), stats AS (
        SELECT round(avg(dl), 6) AS avgdl, count(*) AS n_docs FROM dl
    ), dfreq_all AS MATERIALIZED (
        SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), ascore AS (
        SELECT a.doc_id AS query_id, a.term,
               (a.tf / CAST(d.dl AS DOUBLE))
               * (ln((s.n_docs + 1) / CAST(f.df + 1 AS DOUBLE)) + 1) AS sc
        FROM tf a
        JOIN dl d USING (doc_id)
        JOIN dfreq_all f USING (term)
        CROSS JOIN stats s
        WHERE a.doc_id IN {_HYB_ANCHORS!r}
    ), qdf AS MATERIALIZED (
        SELECT query_id, term FROM (
            SELECT query_id, term,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY round(sc, 9) DESC, term) AS rn
            FROM ascore) WHERE rn <= {_HYB_TERMS}
    ), hits AS MATERIALIZED (
        SELECT q.query_id, t.doc_id, t.term, t.tf FROM tf t JOIN qdf q USING (term)
    ), dfreq AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1
    ), bscore AS (
        SELECT h.query_id, h.doc_id,
               sum(
                   ln(CAST(1.0 AS DOUBLE)
                      + (s.n_docs - f.df + CAST(0.5 AS DOUBLE))
                        / (f.df + CAST(0.5 AS DOUBLE)))
                   * (h.tf * CAST({_BM25_K1 + 1.0!r} AS DOUBLE))
                   / (h.tf + CAST({_BM25_K1!r} AS DOUBLE)
                      * (CAST({1.0 - _BM25_B!r} AS DOUBLE)
                         + CAST({_BM25_B!r} AS DOUBLE) * d.dl / s.avgdl))
               ) AS score
        FROM hits h
        JOIN dfreq f USING (term)
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s
        WHERE h.doc_id <> h.query_id
        GROUP BY 1, 2
    ), sparser AS MATERIALIZED (
        SELECT query_id, doc_id AS neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY round(score, 9) DESC, doc_id) AS r
        FROM bscore
    ), e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    denser AS MATERIALIZED (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(q.v, n.v), 9) DESC,
                            n.vec_id) AS r
        FROM e q JOIN e n ON n.vec_id <> q.vec_id
        WHERE q.vec_id IN {_HYB_ANCHORS!r}
    ), fused AS (
        SELECT coalesce(sp.query_id, de.query_id) AS query_id,
               coalesce(sp.neighbor_id, de.neighbor_id) AS neighbor_id,
               floor((coalesce(1.0 / ({_HYB_RRF} + sp.r), 0.0)
                      + coalesce(1.0 / ({_HYB_RRF} + de.r), 0.0)) * 1000000000 + 0.5)
                   / 1000000000 AS rrf
        FROM (SELECT * FROM sparser WHERE r <= {_HYB_POOL}) sp
        FULL OUTER JOIN (SELECT * FROM denser WHERE r <= {_HYB_POOL}) de
          ON de.query_id = sp.query_id AND de.neighbor_id = sp.neighbor_id
    )
    SELECT query_id, neighbor_id, rrf,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, neighbor_id) AS BIGINT) AS rank
    FROM fused QUALIFY rank <= {_HYB_K}
    """,
    tags=("text", "retrieval", "hybrid", "bm25", "rrf", "similarity"),
)
def q_hybrid_retrieval_rrf(spark, sf_dir):
    """Query-by-example HYBRID retrieval for 3 anchor documents: the
    sparse side mines each anchor's top-3 TF-IDF terms as its query and
    ranks the corpus by BM25; the dense side ranks by embedding cosine
    (shared doc_id↔vec_id space); reciprocal-rank fusion (k=60) merges
    the two top-20 lists into a fused top-10 — the production hybrid
    stack (lexical recall + semantic recall) as ONE relational plan, every
    stage value-hash-oracled.  Scale shape: sparse rides the shared tf
    relation (one token explosion, query-term postings only after the
    broadcast panel join); dense is the bounded-anchor cosine rank; the
    fusion is a full outer join of two k·|anchors| relations."""
    from ..functions.vector import as_double, dot, norm  # noqa: PLC0415

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = list(_HYB_ANCHORS)

    tf = _bm25_tf(docs, "text", "doc_id").localCheckpoint(eager=False)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.round(F.avg("dl"), 6).alias("avgdl"), F.count("*").alias("n_docs")
    )
    dfreq_all = tf.groupBy("term").agg(F.count("*").alias("df"))
    ascore = (
        tf.filter(F.col("doc_id").isin(anchors))
        .join(dl, "doc_id")
        .join(dfreq_all, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("doc_id").alias("query_id"),
            "term",
            (
                (F.col("tf") / F.col("dl").cast("double"))
                * (
                    F.log(
                        (F.col("n_docs") + 1) / (F.col("df") + 1).cast("double")
                    )
                    + 1
                )
            ).alias("sc"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc(F.round("sc", 9)), F.asc("term"))
    qdf = (
        ascore.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _HYB_TERMS)
        .select("query_id", "term")
    )
    sparse = _bm25_rank_from_tf(
        tf, qdf, _HYB_POOL, _BM25_K1, _BM25_B, "doc_id", exclude_self=True
    ).select("query_id", F.col("doc_id").alias("neighbor_id"), F.col("rank").alias("r"))

    ev = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    qv = ev.filter(F.col("vec_id").isin(anchors)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cos = dot(F.col("qv"), F.col("v")) / (norm(F.col("qv")) * norm(F.col("v")))
    wd = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("_cos", 9)), F.asc("neighbor_id")
    )
    dense = (
        ev.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(qv), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_cos", cos)
        .withColumn("r", F.row_number().over(wd))
        .filter(F.col("r") <= _HYB_POOL)
        .select("query_id", "neighbor_id", "r")
    )
    fused = (
        sparse.withColumnRenamed("r", "sr")
        .join(dense.withColumnRenamed("r", "dr"), ["query_id", "neighbor_id"], "full_outer")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.floor(
                    (
                        F.coalesce(F.lit(1.0) / (_HYB_RRF + F.col("sr")), F.lit(0.0))
                        + F.coalesce(F.lit(1.0) / (_HYB_RRF + F.col("dr")), F.lit(0.0))
                    )
                    * 1000000000
                    + F.lit(0.5)
                )
                / 1000000000
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("neighbor_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= _HYB_K)
        .select("query_id", "neighbor_id", "rrf", "rank")
    )


# ---------------------------------------------------------------------------
# Cohen's kappa (r10) — chance-corrected rater agreement for the langid gate
# ---------------------------------------------------------------------------

_LANGID_SCORED_SQL = """
    WITH t AS (
        SELECT doc_id, lang AS labeled_lang,
               string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ), scored AS (
        SELECT doc_id, labeled_lang,
               [
                 {'score': len(list_filter(w, x -> x IN ('der','die','und','das'))) / len(w), 'lang': 'de'},
                 {'score': len(list_filter(w, x -> x IN ('the','a','and','of'))) / len(w), 'lang': 'en'},
                 {'score': len(list_filter(w, x -> x IN ('el','los','y','de'))) / len(w), 'lang': 'es'},
                 {'score': len(list_filter(w, x -> x IN ('le','la','et','de'))) / len(w), 'lang': 'fr'},
                 {'score': len(list_filter(w, x -> x IN ('的','是','了','在'))) / len(w), 'lang': 'zh'}
               ] AS scores
        FROM t
    )"""


@register(
    "stats_cohens_kappa",
    oracle=_LANGID_SCORED_SQL
    + """,
    conf AS MATERIALIZED (
        SELECT list_max(scores)['lang'] AS p, labeled_lang AS a,
               CAST(count(*) AS BIGINT) AS c
        FROM scored GROUP BY p, a
    ), rmarg AS (SELECT p AS l, CAST(sum(c) AS BIGINT) AS rp FROM conf GROUP BY p),
    cmarg AS (SELECT a AS l, CAST(sum(c) AS BIGINT) AS ra FROM conf GROUP BY a),
    pe AS (
        SELECT CAST(sum(rp * ra) AS BIGINT) AS pe_num
        FROM rmarg JOIN cmarg USING (l)
    ), marg AS (
        SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CASE WHEN p = a THEN c ELSE 0 END) AS BIGINT) AS agree,
               (SELECT pe_num FROM pe) AS pe_num
        FROM conf
    )
    SELECT n AS n_docs, agree AS n_agree,
           round(CAST(agree AS DOUBLE) / n, 6) AS po,
           round(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS pe,
           round(CAST(n * agree - pe_num AS DOUBLE)
                 / CAST(n * n - pe_num AS DOUBLE), 6) AS kappa
    FROM marg
    """,
    tags=("stats", "agreement", "langid", "eval"),
)
def q_stats_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between the marker-word langid prediction and the
    gold `lang` label — the chance-corrected agreement readout for any
    heuristic gate (raw accuracy flatters a rater that just predicts the
    majority class; kappa subtracts the marginal-product chance rate).

    kappa = (n·agree − Σ_l rowₗ·colₗ) / (n² − Σ_l rowₗ·colₗ): everything
    up to the final division is BIGINT over the bounded |langs|²
    confusion grid — one grouped count plus two marginal sums — so the
    value-hash is exact.  Scale: the confusion grid is the mergeable
    state (≤ 25 cells); the corpus is scanned once by the langid
    projection."""
    docs = load_table(spark, sf_dir, "documents")
    conf = (
        langid_scores(docs)
        .select(F.col("predicted_lang").alias("p"), F.col("labeled_lang").alias("a"))
        .groupBy("p", "a")
        .agg(F.count("*").cast("long").alias("c"))
    )
    conf = conf.localCheckpoint(eager=False)
    rmarg = conf.groupBy(F.col("p").alias("l")).agg(
        F.sum("c").cast("long").alias("rp")
    )
    cmarg = conf.groupBy(F.col("a").alias("l")).agg(
        F.sum("c").cast("long").alias("ra")
    )
    # chance agreement sums row_l * col_l over CLASSES, not over diagonal
    # cells of the confusion grid — a class with an empty (l, l) cell
    # still contributes its marginal product (join on the class label).
    pe = rmarg.join(cmarg, "l").agg(
        F.sum(F.col("rp") * F.col("ra")).cast("long").alias("pe_num")
    )
    marg = conf.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("p") == F.col("a"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("agree"),
    ).crossJoin(F.broadcast(pe))
    return marg.select(
        F.col("n").alias("n_docs"),
        F.col("agree").alias("n_agree"),
        F.round(F.col("agree").cast("double") / F.col("n"), 6).alias("po"),
        F.round(
            F.col("pe_num").cast("double")
            / (F.col("n").cast("double") * F.col("n")),
            6,
        ).alias("pe"),
        F.round(
            (F.col("n") * F.col("agree") - F.col("pe_num")).cast("double")
            / (F.col("n") * F.col("n") - F.col("pe_num")).cast("double"),
            6,
        ).alias("kappa"),
    )
