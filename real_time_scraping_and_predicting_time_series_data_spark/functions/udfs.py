"""Python UDF surface (SURVEY.md §2.8 "UDF surface"): Arrow-vectorized
pandas UDFs — scalar, grouped-aggregate — plus ``applyInPandas`` grouped
map. These exist to prove the slow path is wired correctly (Arrow batching,
schemas, null handling); every hot-path operator in this engine is
expression-based precisely so these are rarely needed. The demo UDFs
compute SQL-expressible math so the oracle can verify the Arrow round-trip
bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from ..plans.registry import register


@pandas_udf(T.DoubleType())
def log_return(v: pd.Series) -> pd.Series:
    """Scalar pandas UDF: ln(1+x) — vectorized numpy under Arrow."""
    import numpy as np

    return pd.Series(np.log1p(v))


@pandas_udf(T.DoubleType())
def weighted_mean(v: pd.Series, w: pd.Series) -> float:  # GROUPED_AGG (scalar return)
    """Grouped-aggregate pandas UDF: Σvw/Σw per group."""
    import numpy as np

    den = float(np.sum(w))
    return float(np.sum(v * w) / den) if den else float("nan")


def grouped_zscore(df: DataFrame, key: str = "user_id", value: str = "value") -> DataFrame:
    """Grouped-map ``applyInPandas``: per-key z-score (population sd). The
    expression twin is (x-avg)/stddev_pop over a key window — used by the
    oracle."""

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[value].mean()
        sd = pdf[value].std(ddof=0)
        z = (pdf[value] - mu) / sd if sd else pdf[value] * 0.0
        return pd.DataFrame({"user_id": pdf[key], "event_id": pdf["event_id"], "zscore": z})

    return df.groupBy(key).applyInPandas(per_key, schema)


# ---------------------------------------------------------------------------
# Registered queries (oracle-verified UDF round trips)
# ---------------------------------------------------------------------------


@register(
    "udf_scalar_pandas",
    oracle="""
    SELECT event_id, round(ln(1 + value), 9) AS logret
    FROM events WHERE value > -1
    """,
    tags=("udf", "pandas"),
)
def q_udf_scalar(spark, sf_dir):
    """Arrow scalar pandas UDF vs its SQL twin."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > -1)
    return ev.select("event_id", F.round(log_return("value"), 9).alias("logret"))


@register(
    "udf_grouped_agg_pandas",
    oracle="""
    SELECT user_id, round(sum(value * event_id) / sum(event_id), 6) AS wmean
    FROM events GROUP BY user_id
    """,
    tags=("udf", "pandas", "agg"),
)
def q_udf_grouped_agg(spark, sf_dir):
    """Grouped-agg pandas UDF (weighted mean, weights = event_id) vs SQL."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.round(weighted_mean(F.col("value"), F.col("event_id").cast("double")), 6).alias("wmean")
    )


@register(
    "udf_grouped_map_zscore",
    oracle="""
    SELECT user_id, event_id,
           round((value - avg(value) OVER w) / stddev_pop(value) OVER w, 6) AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
    tags=("udf", "pandas", "grouped-map"),
)
def q_udf_grouped_map(spark, sf_dir):
    """applyInPandas grouped map (per-key z-score) vs window-expression SQL."""
    ev = load_table(spark, sf_dir, "events")
    out = grouped_zscore(ev)
    return out.select("user_id", "event_id", F.round("zscore", 6).alias("zscore"))


@register(
    "udf_arrow_batch_map",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(sqrt(list_aggregate(
               list_transform(embedding::DOUBLE[], x -> x * x), 'sum')), 6)
               AS l2_norm
    FROM embeddings
    """,
    tags=("udf", "arrow", "map-in-arrow"),
)
def q_udf_arrow_batch(spark, sf_dir):
    """``mapInArrow`` RecordBatch-level UDF (the lowest-overhead Python
    crossing: no pandas conversion, zero-copy numpy views over the Arrow
    list buffers): per-vector L2 norm + dimension over the embeddings
    table. The segmented sum uses ``np.add.reduceat`` over the flat
    float64 values at the list offsets — LEFT-TO-RIGHT within each
    segment, the same order DuckDB's ``list_aggregate('sum')`` folds, so
    the oracle verifies the Arrow path value-exactly. Completes the UDF
    surface beside scalar/grouped-agg pandas UDFs and applyInPandas."""
    import numpy as np
    import pyarrow as pa

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def batch_norms(batches):
        for b in batches:
            vid = b.column(0)
            lists = b.column(1)
            off = np.asarray(lists.offsets)
            flat = np.asarray(lists.values, dtype=np.float64)
            sq = flat * flat
            dims = np.diff(off).astype(np.int32)
            sums = np.add.reduceat(sq, off[:-1]) if len(off) > 1 else np.array([])
            norms = np.sqrt(sums)
            yield pa.RecordBatch.from_arrays(
                [vid, pa.array(dims, type=pa.int32()), pa.array(norms, type=pa.float64())],
                names=["vec_id", "dim", "l2_norm"],
            )

    out = emb.mapInArrow(
        batch_norms, schema="vec_id long, dim int, l2_norm double"
    )
    return out.select("vec_id", "dim", F.round("l2_norm", 6).alias("l2_norm"))


# ---------------------------------------------------------------------------
# Python UDTF — table-function surface (r7)
# ---------------------------------------------------------------------------


def make_word_chunks_udtf():
    """A Python UDTF chunking a document into fixed-size word windows —
    the one-row-to-many-rows surface (pyspark.sql.functions.udtf,
    Spark 4) complementing the scalar / grouped-agg / grouped-map /
    mapInArrow UDF set.  Chunk = 16 consecutive whitespace tokens (the
    RAG-chunker shape of `corpus_chunk_overlap`, overlap 0 here), emitted
    with a per-doc ordinal.  Deterministic and row-local: Catalyst plans
    it as a Generate, partition-parallel, no state."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id INT, n_words INT, chunk STRING")
    class WordChunks:
        def eval(self, text: str):
            if text is None:
                return
            words = text.split()
            for i in range(0, len(words), 16):
                piece = words[i : i + 16]
                yield i // 16, len(piece), " ".join(piece)

    return WordChunks


@register(
    "udtf_word_chunks",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents WHERE doc_id < 50
    ), chunks AS (
        SELECT doc_id,
               CAST(i AS INT) AS chunk_id,
               CAST(len(ws[i * 16 + 1 : i * 16 + 16]) AS INT) AS n_words,
               array_to_string(ws[i * 16 + 1 : i * 16 + 16], ' ') AS chunk
        FROM w, unnest(range(0, CAST(ceil(len(ws) / 16.0) AS BIGINT))) AS t(i)
    )
    SELECT doc_id, chunk_id, n_words,
           CAST(length(chunk) AS BIGINT) AS n_chars
    FROM chunks
    """,
    tags=("udf", "udtf", "text", "chunking"),
)
def q_udtf_word_chunks(spark, sf_dir):
    """The UDTF exercised through the SQL lateral-table-function surface:
    ``SELECT ... FROM documents, LATERAL word_chunks(text)`` — every
    document fans out to its 16-word chunks with a per-doc ordinal (docs
    here average ~30 words, so a genuine 1:N Generate).  The oracle
    re-chunks with DuckDB list slicing; the compared columns (doc_id,
    chunk_id, n_words, chunk length) pin both the chunk boundaries and
    the emission order.  Restricted to doc_id < 50 to keep the per-row
    Python fan-out a deliberate, bounded demo — the engine's hot-path
    chunker stays JVM-side (`corpus_chunk_overlap`); the UDTF exists for
    the API surface and for logic that genuinely needs Python."""
    spark.udtf.register("word_chunks", make_word_chunks_udtf())
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_words,
               CAST(length(c.chunk) AS BIGINT) AS n_chars
        FROM _udtf_docs d, LATERAL word_chunks(d.text) c
        """
    )
