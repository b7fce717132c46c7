"""Graph analytics as iterative DataFrame joins (SURVEY.md §2.8 extension
surface): PageRank over the part co-purchase graph.

The dedup module's connected-components operator (operators/dedup.py)
already established the iterate-until-fixpoint join pattern; PageRank is
the fixed-iteration damped variant — each step is an equi-join of the edge
relation with the current rank vector plus one grouped sum, i.e. exactly a
sparse matrix-vector multiply in relational form. At 100 TB the edge
relation partitions by ``src`` once and every iteration reuses that
partitioning (the rank vector is the small side, broadcast); no all-pairs
anything, no driver-side graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register

__all__ = ["copurchase_edges", "pagerank"]

_DAMP = 0.85
_ITERS = 3


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct directed (src, dst) part pairs that co-occur in an order.
    Symmetric by construction, so every node has out-degree >= 1 (no
    dangling-mass correction needed). One self-equi-join on the order key
    — co-occurrence within a key, never across the corpus."""
    a = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    # Dedup only the src<dst half (halves the distinct's shuffle volume),
    # then mirror — the union is a cheap narrow op and the result is the
    # same symmetric set. Both self-join sides are one reused exchange.
    half = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(edges: DataFrame, damp: float = _DAMP, iters: int = _ITERS) -> DataFrame:
    """Fixed-iteration PageRank: r ← (1-d)/N + d·Σ_incoming r(u)/deg(u),
    uniform init. Returns (node, pagerank, degree). Assumes every node has
    out-degree >= 1 (true for symmetric edge sets like co-purchase)."""
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("degree"))
    n = deg.agg(F.count("*").cast("double").alias("nn"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("nn")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(F.broadcast(deg), "src")
            .join(F.broadcast(ranks.withColumnRenamed("node", "src")), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("degree")).alias("mass"))
        )
        ranks = contrib.crossJoin(F.broadcast(n)).select(
            F.col("dst").alias("node"),
            (F.lit(1.0 - damp) / F.col("nn") + F.lit(damp) * F.col("mass")).alias("rank"),
        )
    return ranks.join(deg.withColumnRenamed("src", "node"), "node")


@register(
    "graph_copurchase_pagerank",
    oracle="""
    WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), deg AS (
        SELECT src, CAST(count(*) AS BIGINT) AS degree FROM e0 GROUP BY src
    ), n AS (
        SELECT CAST(count(*) AS DOUBLE) AS nn FROM deg
    ), r0 AS (
        SELECT src AS node, CAST(1.0 AS DOUBLE) / (SELECT nn FROM n) AS rank FROM deg
    ), r1 AS (
        SELECT e.dst AS node,
               CAST(0.15 AS DOUBLE) / (SELECT nn FROM n)
                 + CAST(0.85 AS DOUBLE) * sum(r.rank / d.degree) AS rank
        FROM e0 e JOIN deg d ON d.src = e.src JOIN r0 r ON r.node = e.src
        GROUP BY e.dst
    ), r2 AS (
        SELECT e.dst AS node,
               CAST(0.15 AS DOUBLE) / (SELECT nn FROM n)
                 + CAST(0.85 AS DOUBLE) * sum(r.rank / d.degree) AS rank
        FROM e0 e JOIN deg d ON d.src = e.src JOIN r1 r ON r.node = e.src
        GROUP BY e.dst
    ), r3 AS (
        SELECT e.dst AS node,
               CAST(0.15 AS DOUBLE) / (SELECT nn FROM n)
                 + CAST(0.85 AS DOUBLE) * sum(r.rank / d.degree) AS rank
        FROM e0 e JOIN deg d ON d.src = e.src JOIN r2 r ON r.node = e.src
        GROUP BY e.dst
    )
    SELECT r3.node, round(r3.rank, 9) AS pagerank, d.degree
    FROM r3 JOIN deg d ON d.src = r3.node
    """,
    tags=("graph", "pagerank", "iterative"),
)
def q_copurchase_pagerank(spark, sf_dir):
    """3-iteration damped PageRank (d=0.85) over the part co-purchase
    graph: which parts sit at the center of the basket network. Fixed
    iteration count + deterministic uniform init → full value-hash oracle
    (round-9: rank magnitudes ~1/N with ~1e-14 relative engine skew from
    grouped-sum order). Each iteration is one join + grouped sum over the
    edge relation — the relational sparse matvec."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = pagerank(copurchase_edges(li))
    return pr.select("node", F.round("rank", 9).alias("pagerank"), "degree")
