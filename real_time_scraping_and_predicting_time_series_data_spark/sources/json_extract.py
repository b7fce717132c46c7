"""JSON path extraction (S2) — the reference navigates the Yahoo chart API
response by path ``data['chart']['result'][0]['meta']['regularMarketPrice']``
(``asyncio scraping.py:26-37``), with missing-key → None and a float cast
(``scraper:34``, P8) plus null filter (``scraper:33-43``, P1).

Spark-side: ``get_json_object`` / ``from_json`` over a string column — fully
codegen'd, no Python. The driver's ``events.props`` column is the JSON
target.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..plans.registry import register


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
           CAST(json_extract_string(props, '$.missing') AS INTEGER) AS missing_value
    FROM events
    """,
    tags=("source", "json", "S2", "P8"),
)
def q_json_extract(spark, sf_dir):
    """S2+P8: JSON path extraction with cast; missing path yields NULL."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.get_json_object("props", "$.missing").cast("int").alias("missing_value"),
    )


@register(
    "json_from_json_struct",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    tags=("source", "json", "S2", "P1"),
)
def q_from_json(spark, sf_dir):
    """S2 (typed variant): ``from_json`` into a StructType then struct field
    access + null-validity filter (P1)."""
    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.select("event_id", F.from_json("props", schema).alias("p"))
    return parsed.select("event_id", F.col("p.k").alias("k_typed")).filter(
        F.col("k_typed").isNotNull()
    )


@register(
    "json_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0 END AS k_missing
    FROM events
    """,
    tags=("json", "variant", "S2"),
)
def q_json_variant(spark, sf_dir):
    """S2 on Spark 4's VARIANT type: parse the JSON column once into a
    variant (binary, lazily-shredded — no upfront schema like from_json,
    no per-path re-parse like get_json_object) and extract typed paths with
    variant_get. The modern semi-structured storage path: at 100 TB variant
    columns shred into parquet and path extraction prunes like any column."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        F.when(k.isNull(), 1).otherwise(0).alias("k_missing"),
    )
