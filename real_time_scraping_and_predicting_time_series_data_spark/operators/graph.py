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

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register

__all__ = ["copurchase_edges", "pagerank"]

_DAMP = 0.85
_ITERS = 3

# r13 optimization (guide §2.4, §3.1): the iterative graph queries spend
# their time re-exchanging the EDGE relation — every per-round groupBy
# re-shuffled ~|E| rows even though the score/survivor side is a small
# per-NODE relation AQE was already broadcasting (as a runtime SMJ→BHJ
# conversion, which still pays the edge side's shuffle WRITE before the
# local read).  Two complementary moves, both result-preserving:
#
# - pin the edge relation ONCE per query with ``repartition(<groupBy key>)
#   .localCheckpoint(eager=False)`` — LogicalRDD preserves the partitioning,
#   so every round's grouped aggregation is exchange-free, and broadcast
#   semi/equi joins preserve the streamed side's partitioning across rounds;
# - make the node-side broadcast STATIC (an explicit hint) instead of an
#   AQE runtime conversion, so the edge side never plans a shuffle at all.
#
# Score/survivor vectors are node-bounded (≤ |parts| + |customers| rows —
# dimension-keyed, not fact-scale), so the broadcast is safe far past this
# harness; at billion-node scale set SPARK_GRAFT_GRAPH_BROADCAST_NODES=0:
# node-side joins fall back to AQE-selected shuffle joins and the pin key
# switches to the JOIN key so each round's equi-join (rather than its
# groupBy) rides the pinned partitioning — the pre-r13 plan shape.
_BROADCAST_NODES = os.environ.get("SPARK_GRAFT_GRAPH_BROADCAST_NODES", "1") == "1"


def _nodes(df: DataFrame) -> DataFrame:
    """Node-bounded join side: broadcast-hinted unless the deployment opts
    out for billion-node graphs (see module note above)."""
    return F.broadcast(df) if _BROADCAST_NODES else df


def _pin(edges: DataFrame, group_key: str, join_key: str) -> DataFrame:
    """Pin an edge relation for an iterative loop: hash-partition by the
    per-round groupBy key (broadcast-nodes regime) or the per-round join
    key (shuffle regime), then lazy-checkpoint — LogicalRDD keeps the
    partitioning, so downstream rounds skip their exchanges."""
    key = group_key if _BROADCAST_NODES else join_key
    return edges.repartition(F.col(key)).localCheckpoint(eager=False)


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
        # materialize before mirroring: a bare union would re-execute the
        # self-join + distinct once per branch (same antipattern fixed in
        # triangle_counts' corner credit)
        .localCheckpoint(eager=False)
    )
    return half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(edges: DataFrame, damp: float = _DAMP, iters: int = _ITERS) -> DataFrame:
    """Fixed-iteration PageRank: r ← (1-d)/N + d·Σ_incoming r(u)/deg(u),
    uniform init. Returns (node, pagerank, degree). Assumes every node has
    out-degree >= 1 (true for symmetric edge sets like co-purchase).

    Scale note (VERDICT r4 item 4): ``deg`` and ``ranks`` are per-NODE
    relations, so a forced ``F.broadcast`` OOMs on billion-node graphs.
    r13: the hint moved into the parameterised ``_nodes`` wrapper (on by
    default — per-node relations broadcast; flip
    SPARK_GRAFT_GRAPH_BROADCAST_NODES=0 on billion-node graphs to recover
    the AQE shuffle-join plan). The 1-row count ``n`` stays explicitly
    broadcast. The edge relation is pinned partitioned by the per-round
    groupBy key (``dst``; join key ``src`` in the shuffle regime) so each
    iteration's grouped sum skips its exchange — see the module note."""
    edges = _pin(edges, group_key="dst", join_key="src")
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("degree"))
    n = deg.agg(F.count("*").cast("double").alias("nn"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("nn")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(_nodes(deg), "src")
            .join(_nodes(ranks.withColumnRenamed("node", "src")), "src")
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


# ---------------------------------------------------------------------------
# Triangle counting — cohesive-basket structure on the co-purchase graph
# ---------------------------------------------------------------------------

_TRI_SUPPORT = 2


def strong_copurchase_half(lineitem: DataFrame, min_support: int = _TRI_SUPPORT) -> DataFrame:
    """The ``src < dst`` half of the co-purchase graph restricted to STRONG
    edges: part pairs that co-occur in at least ``min_support`` distinct
    orders. The support filter is the practical prefilter for structure
    mining on co-occurrence graphs — it drops the one-off hub noise that
    makes raw co-occurrence graphs quadratically dense, and it is a pure
    HAVING on the same grouped agg that dedups the pairs (no extra pass)."""
    a = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("_support"))
        .filter(F.col("_support") >= min_support)
        .select("src", "dst")
    )


def triangle_counts(half: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an id-oriented edge half
    (``src < dst``): the standard two-join node-iterator — wedges from
    ``e1(a,b) ⋈ e2(b,c)`` (``a<b<c`` by orientation), closed by probing
    ``e3(a,c)``. Each triangle is generated exactly once, then credited to
    all three corners. Returns (node, triangles).

    Scale shape: the edge relation is checkpointed once and plays all three
    join roles; both joins are equi-joins (on ``b``, then on ``(a,c)``) so
    they hash-partition on real keys — no cross product anywhere. The wedge
    count is Σ_b out(b)·in(b); on skewed graphs the classic refinement is
    to orient edges from lower to higher (degree, id) instead of raw id,
    which provably bounds out-degrees by O(sqrt(|E|)) — the same algorithm
    with a different ORDER on nodes, kept out here because the support
    filter already bounds degree on this graph."""
    e = half.localCheckpoint(eager=False)
    wedges = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(e.select(F.col("src").alias("b"), F.col("dst").alias("c")), "b")
    )
    tri = wedges.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("c")), ["a", "c"]
    )
    # explode, not a 3-way union: a union of three selects over `tri`
    # re-executes the wedge+closing joins once PER BRANCH (the plan showed
    # the join pipeline tripled); the explode credits all three corners in
    # the single pass that found the triangle.
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(F.count("*").cast("long").alias("triangles"))


@register(
    "graph_triangle_counts",
    oracle=f"""
    WITH half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {_TRI_SUPPORT}
    ), tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM half e1
        JOIN half e2 ON e1.dst = e2.src
        JOIN half e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ), corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS triangles
    FROM corners GROUP BY node
    """,
    tags=("graph", "triangles"),
)
def q_triangle_counts(spark, sf_dir):
    """Per-part triangle participation on the strong (support >= 2)
    co-purchase graph — the local-clustering signal behind "bought
    together" bundles, and the graph-analytics companion to PageRank's
    centrality. Exact integer counts end to end → full value-hash oracle.
    Complements `graph_copurchase_pagerank` (reference forecasts one
    entity; the extension surface mines cross-entity structure,
    SURVEY.md §2.8)."""
    li = load_table(spark, sf_dir, "lineitem")
    return triangle_counts(strong_copurchase_half(li))


# ---------------------------------------------------------------------------
# Market-basket association rules — support / confidence / lift
# ---------------------------------------------------------------------------


@register(
    "orders_basket_lift",
    oracle=f"""
    WITH baskets AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lineitem
    ), item AS (
        SELECT l_partkey AS part, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS c
        FROM lineitem GROUP BY l_partkey
    ), pair AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb,
               CAST(count(DISTINCT a.l_orderkey) AS BIGINT) AS c_ab
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= {_TRI_SUPPORT}
    )
    SELECT p.pa AS part_a, p.pb AS part_b, p.c_ab AS n_orders_both,
           round(CAST(p.c_ab AS DOUBLE) / bk.n_orders, 9) AS support,
           round(CAST(p.c_ab AS DOUBLE) / ia.c, 9) AS confidence_a_b,
           round((CAST(p.c_ab AS DOUBLE) / bk.n_orders)
                 / ((CAST(ia.c AS DOUBLE) / bk.n_orders)
                    * (CAST(ib.c AS DOUBLE) / bk.n_orders)), 6) AS lift
    FROM pair p
    JOIN item ia ON ia.part = p.pa
    JOIN item ib ON ib.part = p.pb
    CROSS JOIN baskets bk
    """,
    tags=("graph", "basket", "association"),
)
def q_orders_basket_lift(spark, sf_dir):
    """Association rules over order baskets: for every strong part pair
    (co-occurring in >= 2 orders), exact support, confidence(A→B), and
    lift — the transactional twin of `corpus_bigram_pmi` (lift is the PMI
    exponential). All counts are exact order-distinct BIGINTs; the pair
    generation is the same within-order self-join the co-purchase graph
    uses (never a cross join); item counts broadcast onto the support-
    filtered pair relation; the basket total is a one-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    n_orders = li.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    item = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.countDistinct("l_orderkey").cast("long").alias("c")
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pair = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.countDistinct("ok").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= _TRI_SUPPORT)
    )
    ia = item.select(F.col("part").alias("pa"), F.col("c").alias("ca"))
    ib = item.select(F.col("part").alias("pb"), F.col("c").alias("cb"))
    j = (
        pair.join(ia, "pa").join(ib, "pb").crossJoin(F.broadcast(n_orders))
    )
    sup = F.col("c_ab").cast("double") / F.col("n_orders")
    return j.select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        F.col("c_ab").alias("n_orders_both"),
        F.round(sup, 9).alias("support"),
        F.round(F.col("c_ab").cast("double") / F.col("ca"), 9).alias("confidence_a_b"),
        F.round(
            sup
            / (
                (F.col("ca").cast("double") / F.col("n_orders"))
                * (F.col("cb").cast("double") / F.col("n_orders"))
            ),
            6,
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# k-core peeling (bounded-round) — r5
# ---------------------------------------------------------------------------


@register(
    "graph_kcore_peel",
    oracle="""
    WITH e0 AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), d0 AS (
        SELECT src, CAST(count(*) AS BIGINT) AS n FROM e0 GROUP BY src
    ), g AS (
        SELECT n AS v, CAST(count(*) AS BIGINT) AS c FROM d0 GROUP BY n
    ), cum AS (
        SELECT v, CAST(sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm
        FROM g
    ), t AS (
        SELECT CAST(count(*) AS BIGINT) AS nn FROM d0
    ), kv AS (
        SELECT CAST(min(CASE WHEN cum.cm >= ceil(0.25 * t.nn) THEN cum.v END) AS BIGINT) AS k
        FROM cum, t
    ), a1 AS (
        SELECT d0.src FROM d0, kv WHERE d0.n >= kv.k
    ), e1 AS (
        SELECT e.src, e.dst FROM e0 e
        JOIN a1 s ON e.src = s.src JOIN a1 q ON e.dst = q.src
    ), d1 AS (
        SELECT src, CAST(count(*) AS BIGINT) AS n FROM e1 GROUP BY src
    ), a2 AS (
        SELECT d1.src FROM d1, kv WHERE d1.n >= kv.k
    ), e2 AS (
        SELECT e.src, e.dst FROM e1 e
        JOIN a2 s ON e.src = s.src JOIN a2 q ON e.dst = q.src
    ), d2 AS (
        SELECT src, CAST(count(*) AS BIGINT) AS n FROM e2 GROUP BY src
    )
    SELECT d2.src AS node, kv.k, d0.n AS deg_initial, d2.n AS deg_final
    FROM d2 JOIN d0 ON d0.src = d2.src CROSS JOIN kv
    """,
    tags=("graph", "kcore", "iterative"),
)
def q_graph_kcore_peel(spark, sf_dir):
    """Bounded-round k-core peeling of the co-purchase graph at k = the
    exact nearest-rank P25 initial degree: two rounds of "drop every node
    with fewer than k surviving neighbors, then re-count" — the
    dense-substructure extractor (spam clusters, template farms in a
    dedup graph; product communities here). Peeling is genuinely
    iterative: removals CASCADE (sf0.01: 2000 → 1512 → 749 nodes; this
    near-regular graph has no stable core, so deeper rounds empty it —
    the bounded-round form reports the partially peeled state), and
    deg_final < deg_initial even for survivors.

    Scale shape: the threshold comes from the bounded degree-value grid
    (~|distinct degrees| rows, the acceptable global window); each round
    is one grouped count + two semi-joins keyed on the node against the
    already-partitioned edge relation, checkpointed so round r+1 joins
    rather than replays round r. Fixed rounds + integer degrees -> full
    value-hash oracle (the true fixpoint is the same loop with a
    convergence check, SURVEY §2.8's CC pattern)."""
    li = load_table(spark, sf_dir, "lineitem")
    # r13 (module note): src-pinned edges — d0 and every round's re-count
    # group on src exchange-free; the alive semi-joins broadcast.
    edges = _pin(copurchase_edges(li), group_key="src", join_key="src")
    d0 = edges.groupBy("src").agg(F.count("*").cast("long").alias("n"))
    g = d0.groupBy(F.col("n").alias("v")).agg(F.count("*").cast("long").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = g.select("v", F.sum("c").over(w).cast("long").alias("cm"))
    t = d0.agg(F.count("*").cast("long").alias("nn"))
    kv = (
        cum.crossJoin(F.broadcast(t))
        .agg(
            F.min(
                F.when(F.col("cm") >= F.ceil(F.lit(0.25) * F.col("nn")), F.col("v"))
            ).cast("long").alias("k")
        )
        .localCheckpoint(eager=False)
    )
    e = edges
    for _ in range(2):
        d = e.groupBy("src").agg(F.count("*").cast("long").alias("n"))
        alive = (
            d.crossJoin(F.broadcast(kv)).filter(F.col("n") >= F.col("k")).select("src")
        ).localCheckpoint(eager=False)
        e = (
            e.join(_nodes(alive), "src", "left_semi")
            .join(_nodes(alive.select(F.col("src").alias("dst"))), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    d3 = e.groupBy("src").agg(F.count("*").cast("long").alias("n"))
    return (
        d3.join(d0.withColumnRenamed("n", "deg_initial"), "src")
        .crossJoin(F.broadcast(kv))
        .select(
            F.col("src").alias("node"),
            "k",
            "deg_initial",
            F.col("n").alias("deg_final"),
        )
    )


# ---------------------------------------------------------------------------
# Link prediction — Adamic-Adar over the strong co-purchase graph (r5)
# ---------------------------------------------------------------------------


@register(
    "graph_adamic_adar",
    oracle="""
    WITH half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2
    ), sym AS (
        SELECT src, dst FROM half
        UNION ALL SELECT dst AS src, src AS dst FROM half
    ), deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
        FROM sym GROUP BY src
    ), wedges AS (
        SELECT e1.dst AS a, e2.dst AS c, e1.src AS b
        FROM sym e1 JOIN sym e2
          ON e1.src = e2.src AND e1.dst < e2.dst
    ), scored AS (
        SELECT w.a AS src, w.c AS dst,
               CAST(count(*) AS BIGINT) AS common_neighbors,
               sum(1.0 / ln(CAST(d.degree AS DOUBLE))) AS aa_raw
        FROM wedges w JOIN deg d ON d.node = w.b
        GROUP BY w.a, w.c
    ), nonedge AS (
        SELECT s.src, s.dst, s.common_neighbors,
               floor(s.aa_raw * 1000000 + 0.5) / 1000000 AS aa_score
        FROM scored s
        WHERE NOT EXISTS (
            SELECT 1 FROM half h WHERE h.src = s.src AND h.dst = s.dst
        )
    )
    SELECT src, dst, common_neighbors, aa_score
    FROM nonedge
    ORDER BY aa_score DESC, src, dst LIMIT 50
    """,
    tags=("graph", "linkpred", "similarity"),
)
def q_graph_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction on the strong (support>=2) co-purchase
    graph: for every NON-adjacent pair with at least one common neighbor,
    score = sum over common neighbors b of 1/ln(deg(b)) — rare shared
    neighbors weigh more. Top-50 predicted links, deterministic order
    (rounded score desc, then pair id).

    Scale shape mirrors `graph_triangle_counts`: candidate pairs come only
    from the wedge join on the shared center (cost sum deg(b)^2, the
    node-iterator bound, with the support prefilter killing hub blowup) —
    never an all-pairs product. The existing-edge exclusion is a left-anti
    join on the oriented half relation; degrees broadcast when small via
    AQE. Wedge centers have degree >= 2 by construction so ln(deg) never
    hits zero; the 1/ln sum is the only float, floor-canonicalized at 1e-6
    before the rank cut so both engines cut identically."""
    li = load_table(spark, sf_dir, "lineitem")
    half = strong_copurchase_half(li).localCheckpoint(eager=False)
    sym = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )
    e1 = sym.select(F.col("src").alias("b"), F.col("dst").alias("a"))
    e2 = sym.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b").filter(F.col("a") < F.col("c"))
    scored = (
        wedges.join(deg.withColumnRenamed("node", "b"), "b")
        .groupBy(F.col("a").alias("src"), F.col("c").alias("dst"))
        .agg(
            F.count("*").cast("long").alias("common_neighbors"),
            F.sum(F.lit(1.0) / F.log(F.col("degree").cast("double"))).alias("aa_raw"),
        )
    )
    nonedge = scored.join(half, ["src", "dst"], "left_anti").select(
        "src", "dst", "common_neighbors",
        (F.floor(F.col("aa_raw") * 1000000 + F.lit(0.5)) / 1000000).alias("aa_score"),
    )
    return nonedge.orderBy(F.desc("aa_score"), "src", "dst").limit(50)


# ---------------------------------------------------------------------------
# Multi-source BFS — bounded-hop reachability as iterative joins (r5)
# ---------------------------------------------------------------------------


def bfs_hops(edges: DataFrame, seeds: DataFrame, max_hops: int = 3) -> DataFrame:
    """Bounded multi-source BFS: hop distance from the seed set, as
    ``max_hops`` rounds of (frontier join edges -> min per node). Each
    round is one equi-join on ``src`` against the already-partitioned
    edge relation plus a grouped min — the standard relational BFS whose
    per-round cost is the frontier's edge volume, never the whole graph.
    Integer-exact (hop counts), so the oracle is a full value hash."""
    dist = seeds.select(F.col("node"), F.lit(0).cast("long").alias("hops"))
    for _ in range(max_hops):
        # EAGER: each round references dist twice (carry-over union + the
        # frontier join); a lazy checkpoint would re-execute every earlier
        # round 2^r times. The materialized relation is per-reached-node.
        dist = dist.localCheckpoint(eager=True)
        nxt = (
            edges.join(dist.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        dist = dist.union(nxt).groupBy("node").agg(F.min("hops").alias("hops"))
    return dist


@register(
    "graph_bfs_hops",
    oracle="""
    WITH half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2
    ), sym AS (
        SELECT src, dst FROM half
        UNION ALL SELECT dst AS src, src AS dst FROM half
    ), nodes AS (
        SELECT DISTINCT src AS node FROM sym
    ), seeds AS (
        SELECT node, CAST(0 AS BIGINT) AS hops
        FROM nodes ORDER BY node LIMIT 5
    ), d1 AS (
        SELECT node, CAST(min(hops) AS BIGINT) AS hops FROM (
            SELECT node, hops FROM seeds
            UNION ALL
            SELECT e.dst AS node, s.hops + 1 AS hops
            FROM sym e JOIN seeds s ON s.node = e.src
        ) GROUP BY node
    ), d2 AS (
        SELECT node, CAST(min(hops) AS BIGINT) AS hops FROM (
            SELECT node, hops FROM d1
            UNION ALL
            SELECT e.dst AS node, s.hops + 1 AS hops
            FROM sym e JOIN d1 s ON s.node = e.src
        ) GROUP BY node
    ), d3 AS (
        SELECT node, CAST(min(hops) AS BIGINT) AS hops FROM (
            SELECT node, hops FROM d2
            UNION ALL
            SELECT e.dst AS node, s.hops + 1 AS hops
            FROM sym e JOIN d2 s ON s.node = e.src
        ) GROUP BY node
    )
    SELECT hops, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM d3 GROUP BY hops
    """,
    tags=("graph", "bfs", "iterative"),
)
def q_graph_bfs_hops(spark, sf_dir):
    """3-hop multi-source BFS from the 5 smallest nodes of the strong
    co-purchase graph: per-hop ring sizes (how much of the product network
    is within k basket steps of the seed set) — the reachability primitive
    under recommendation radii and taint propagation. Deterministic seeds
    (smallest ids), fixed rounds, integer hop counts -> full value-hash
    oracle; each round's cost is the frontier's edges only."""
    li = load_table(spark, sf_dir, "lineitem")
    half = strong_copurchase_half(li).localCheckpoint(eager=False)
    sym = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    seeds = (
        sym.select(F.col("src").alias("node")).distinct()
        .orderBy("node").limit(5)
    )
    dist = bfs_hops(sym, seeds, max_hops=3)
    return dist.groupBy("hops").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.min("node").cast("long").alias("min_node"),
        F.max("node").cast("long").alias("max_node"),
    )


@register(
    "graph_assortativity",
    oracle="""
    WITH half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2
    ), sym AS (
        SELECT src, dst FROM half
        UNION ALL SELECT dst AS src, src AS dst FROM half
    ), deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY src
    ), pairs AS (
        SELECT CAST(da.d AS DOUBLE) AS x, CAST(db.d AS DOUBLE) AS y
        FROM sym e JOIN deg da ON da.node = e.src JOIN deg db ON db.node = e.dst
    ), s AS (
        SELECT CAST(count(*) AS BIGINT) AS m, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM pairs
    )
    SELECT m AS n_directed_edges,
           floor((m * sxy - sx * sy)
                 / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
                 * 1000000 + 0.5) / 1000000 AS assortativity
    FROM s
    """,
    tags=("graph", "structure", "assortativity"),
)
def q_graph_assortativity(spark, sf_dir):
    """Degree assortativity of the strong co-purchase graph: the Pearson
    correlation of endpoint degrees over every directed edge — positive
    means hubs prefer hubs (social-network-like), negative means
    hub-and-spoke (typical for catalogs and for dedup graphs dominated by
    template clusters). One grouped degree count + one edge-to-degree
    join + one closed-form correlation from raw sums; the symmetric edge
    relation makes the directed-edge Pearson equal the undirected
    definition. Canon 1e-6 on the single float expression."""
    li = load_table(spark, sf_dir, "lineitem")
    half = strong_copurchase_half(li).localCheckpoint(eager=False)
    sym = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("d")
    )
    pairs = (
        sym.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("d", "dx")
        .join(
            deg.select(F.col("node").alias("dst"), F.col("d").alias("dy")), "dst"
        )
        .select(
            F.col("dx").cast("double").alias("x"), F.col("dy").cast("double").alias("y")
        )
    )
    s = pairs.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    m = F.col("m")
    r = (m * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (m * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (m * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.col("m").alias("n_directed_edges"),
        (F.floor(r * 1000000 + F.lit(0.5)) / 1000000).alias("assortativity"),
    )


@register(
    "graph_rich_club",
    oracle="""
    WITH half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT src AS node FROM half UNION ALL SELECT dst AS node FROM half
        ) GROUP BY node
    ), cuts AS (
        SELECT q, CAST(min(CASE WHEN cm >= ceil(q * n) THEN d END) AS BIGINT) AS k
        FROM (
            SELECT g.d, CAST(sum(g.c) OVER (ORDER BY g.d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS cm,
                   CAST(sum(g.c) OVER () AS BIGINT) AS n
            FROM (SELECT d, CAST(count(*) AS BIGINT) AS c FROM deg GROUP BY d) g
        ) cum CROSS JOIN (SELECT unnest([0.5, 0.75, 0.9]) AS q) qs
        GROUP BY q
    ), club AS (
        SELECT c.q, c.k, CAST(count(*) AS BIGINT) AS n_nodes
        FROM deg CROSS JOIN cuts c WHERE deg.d > c.k
        GROUP BY c.q, c.k
    ), club_edges AS (
        SELECT c.q, CAST(count(*) AS BIGINT) AS n_edges
        FROM half h
        JOIN cuts c ON TRUE
        JOIN deg da ON da.node = h.src AND da.d > c.k
        JOIN deg db ON db.node = h.dst AND db.d > c.k
        GROUP BY c.q
    )
    SELECT cl.q AS degree_quantile, cl.k AS k_cut, cl.n_nodes,
           coalesce(ce.n_edges, 0) AS n_edges,
           CASE WHEN cl.n_nodes > 1 THEN
               floor(2.0 * coalesce(ce.n_edges, 0)
                     / (cl.n_nodes * (cl.n_nodes - 1)) * 1000000 + 0.5) / 1000000
           END AS phi
    FROM club cl LEFT JOIN club_edges ce ON ce.q = cl.q
    """,
    tags=("graph", "structure", "richclub"),
)
def q_graph_rich_club(spark, sf_dir):
    """Rich-club coefficient phi(k) of the strong co-purchase graph at the
    P50/P75/P90 degree cuts: the edge density among nodes of degree > k —
    rising phi with k means the hubs form their own densely-wired club
    (the structure behind hub-dominated dedup clusters and popularity-
    biased recommenders); flat phi means hubs connect outward. Degree
    cuts come from the bounded degree-value grid (exact nearest rank);
    club membership is two semi-join-shaped degree joins on the oriented
    half relation; integer counts, one guarded density division."""
    li = load_table(spark, sf_dir, "lineitem")
    half = strong_copurchase_half(li).localCheckpoint(eager=False)
    deg = (
        half.select(F.col("src").alias("node"))
        .union(half.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    g = deg.groupBy("d").agg(F.count("*").cast("long").alias("c"))
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = g.select(
        "d",
        F.sum("c").over(wcum).cast("long").alias("cm"),
        F.sum("c").over(Window.partitionBy()).cast("long").alias("n"),
    )
    qs = spark.createDataFrame([(0.5,), (0.75,), (0.9,)], "q double")
    cuts = (
        cum.crossJoin(F.broadcast(qs))
        .groupBy("q")
        .agg(
            F.min(
                F.when(F.col("cm") >= F.ceil(F.col("q") * F.col("n")), F.col("d"))
            ).cast("long").alias("k")
        )
        .localCheckpoint(eager=True)
    )
    club = (
        deg.crossJoin(F.broadcast(cuts))
        .filter(F.col("d") > F.col("k"))
        .groupBy("q", "k")
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("db"))
    club_edges = (
        half.join(da, "src").join(db, "dst")
        .crossJoin(F.broadcast(cuts))
        .filter((F.col("da") > F.col("k")) & (F.col("db") > F.col("k")))
        .groupBy("q")
        .agg(F.count("*").cast("long").alias("n_edges"))
    )
    phi = F.when(
        F.col("n_nodes") > 1,
        F.floor(
            F.lit(2.0) * F.coalesce(F.col("n_edges"), F.lit(0))
            / (F.col("n_nodes") * (F.col("n_nodes") - 1))
            * 1000000
            + F.lit(0.5)
        )
        / 1000000,
    )
    return (
        club.join(club_edges, "q", "left")
        .select(
            F.col("q").alias("degree_quantile"),
            F.col("k").alias("k_cut"),
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0)).alias("n_edges"),
            phi.alias("phi"),
        )
    )


@register(
    "graph_brand_modularity",
    oracle="""
    WITH half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2
    ), m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM half),
    brand AS (
        SELECT p_partkey AS node, p_brand FROM part
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT src AS node FROM half UNION ALL SELECT dst AS node FROM half
        ) GROUP BY node
    ), dsum AS (
        SELECT b.p_brand, CAST(sum(g.d) AS BIGINT) AS d_sum
        FROM deg g JOIN brand b ON b.node = g.node
        GROUP BY b.p_brand
    ), ein AS (
        SELECT ba.p_brand, CAST(count(*) AS BIGINT) AS e_in
        FROM half h
        JOIN brand ba ON ba.node = h.src
        JOIN brand bb ON bb.node = h.dst AND bb.p_brand = ba.p_brand
        GROUP BY ba.p_brand
    )
    SELECT d.p_brand, coalesce(e.e_in, 0) AS e_in, d.d_sum,
           floor((coalesce(e.e_in, 0) / CAST(m.m AS DOUBLE)
                  - (d.d_sum / (2.0 * m.m)) * (d.d_sum / (2.0 * m.m)))
                 * 1000000 + 0.5) / 1000000 AS q_contrib
    FROM dsum d LEFT JOIN ein e ON e.p_brand = d.p_brand CROSS JOIN m
    """,
    tags=("graph", "modularity", "community"),
)
def q_graph_brand_modularity(spark, sf_dir):
    """Newman modularity contribution of each BRAND on the strong
    co-purchase graph: q_c = e_c/m − (d_c/2m)² — does the catalog's brand
    partition explain the basket structure (positive contributions:
    baskets stay within brands) or is co-purchase brand-agnostic
    (contributions ≈ 0)? The modularity-of-a-GIVEN-partition primitive
    that community-detection algorithms optimize, usable relationally for
    any dimension column. Within-community edges are one two-sided
    broadcast dimension join; degree mass is one grouped sum; m is a
    1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    half = strong_copurchase_half(li).localCheckpoint(eager=False)
    m = half.agg(F.count("*").cast("long").alias("m"))
    brand = part.select(F.col("p_partkey").alias("node"), "p_brand")
    deg = (
        half.select(F.col("src").alias("node"))
        .union(half.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    dsum = deg.join(F.broadcast(brand), "node").groupBy("p_brand").agg(
        F.sum("d").cast("long").alias("d_sum")
    )
    ba = brand.select(F.col("node").alias("src"), F.col("p_brand").alias("brand_a"))
    bb = brand.select(F.col("node").alias("dst"), F.col("p_brand").alias("brand_b"))
    ein = (
        half.join(F.broadcast(ba), "src")
        .join(F.broadcast(bb), "dst")
        .filter(F.col("brand_a") == F.col("brand_b"))
        .groupBy(F.col("brand_a").alias("p_brand"))
        .agg(F.count("*").cast("long").alias("e_in"))
    )
    j = dsum.join(ein, "p_brand", "left").crossJoin(F.broadcast(m))
    e_in = F.coalesce(F.col("e_in"), F.lit(0))
    frac = F.col("d_sum") / (F.lit(2.0) * F.col("m"))
    return j.select(
        "p_brand",
        e_in.alias("e_in"),
        "d_sum",
        (
            F.floor(
                (e_in / F.col("m").cast("double") - frac * frac) * 1000000 + F.lit(0.5)
            )
            / 1000000
        ).alias("q_contrib"),
    )


# ---------------------------------------------------------------------------
# Apriori 3-itemsets — candidate-pruned frequent triples (r7)
# ---------------------------------------------------------------------------


@register(
    "orders_frequent_triples",
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem
    ), baskets AS (
        SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM op
    ), tri AS (
        SELECT a.part AS pa, b.part AS pb, c.part AS pc,
               CAST(count(*) AS BIGINT) AS c_abc
        FROM op a JOIN op b ON a.ok = b.ok AND a.part < b.part
                  JOIN op c ON a.ok = c.ok AND b.part < c.part
        GROUP BY 1, 2, 3 HAVING count(*) >= {_TRI_SUPPORT}
    )
    SELECT t.pa AS part_a, t.pb AS part_b, t.pc AS part_c,
           t.c_abc AS n_orders_all3,
           round(CAST(t.c_abc AS DOUBLE) / bk.n_orders, 9) AS support
    FROM tri t CROSS JOIN baskets bk
    """,
    tags=("graph", "basket", "association", "apriori"),
)
def q_orders_frequent_triples(spark, sf_dir):
    """Frequent 3-itemsets over order baskets — the Apriori step above
    `orders_basket_lift`'s pairs.  The SCALE device is the Apriori
    candidate prune: only parts that appear in some frequent PAIR can
    appear in a frequent triple (downward closure), so the (ok, part)
    relation is LEFT SEMI-filtered against the frequent-pair part set
    BEFORE the three-way within-order self-join — on a heavy-tailed
    catalog this collapses the join input from every part ever ordered
    to the tiny co-purchase core, and the per-order triple expansion
    C(|basket|,3) only runs over pruned baskets.  Counts are exact
    order-distinct BIGINTs ((ok, part) is pre-deduped, so count(*)
    counts orders); support is one final division, round 1e-9.

    The prune is lossless by the Apriori property, and the semi-join is
    pinned in the plan (tests/test_r7_operators.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    # r14 (guide §1.2): the deduped (ok, part) relation feeds FIVE branches
    # (both sides of the pair join, the prune, the triple base, n_orders)
    # and column pruning specialized each one, so the executed plan
    # re-derived the scan + distinct 32 TIMES (1158-line plan, 76
    # Exchanges — plans/r14/orders_frequent_triples_before.txt).  One lazy
    # checkpoint materializes the dedup pass once; same trade as the
    # r13 shingle-relation cuts.
    op = (
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # frequent-pair part universe (downward closure): a part outside every
    # frequent pair cannot be in any frequent triple.
    a = op.select(F.col("ok"), F.col("part").alias("pa"))
    b = op.select(F.col("ok"), F.col("part").alias("pb"))
    fp = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= _TRI_SUPPORT)
    )
    # the frequent-pair part set feeds the semi-join that all three triple
    # sides replicate — cut the PAIR JOIN here (not the pruned relation:
    # the Apriori LeftSemi must stay visible in the final plan, pinned by
    # test_r7), so each replica is a trivial LeftSemi over two LogicalRDDs
    fp_parts = (
        fp.select(F.col("pa").alias("part"))
        .unionAll(fp.select(F.col("pb").alias("part")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    pruned = op.join(fp_parts, "part", "left_semi")
    ta = pruned.select("ok", F.col("part").alias("pa"))
    tb = pruned.select("ok", F.col("part").alias("pb"))
    tc = pruned.select("ok", F.col("part").alias("pc"))
    tri = (
        ta.join(tb, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .join(tc, "ok")
        .filter(F.col("pb") < F.col("pc"))
        .groupBy("pa", "pb", "pc")
        .agg(F.count("*").cast("long").alias("c_abc"))
        .filter(F.col("c_abc") >= _TRI_SUPPORT)
    )
    n_orders = op.agg(F.countDistinct("ok").cast("long").alias("n_orders"))
    return tri.crossJoin(F.broadcast(n_orders)).select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        F.col("pc").alias("part_c"),
        F.col("c_abc").alias("n_orders_all3"),
        F.round(F.col("c_abc").cast("double") / F.col("n_orders"), 9).alias("support"),
    )


@register(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {_TRI_SUPPORT}
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT src AS node FROM half UNION ALL SELECT dst FROM half
        ) GROUP BY node
    ), tri AS (
        SELECT CAST(count(*) AS BIGINT) AS n_tri
        FROM half e1
        JOIN half e2 ON e1.dst = e2.src
        JOIN half e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ), agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(d) / 2 AS BIGINT) AS n_edges,
               CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges
        FROM deg
    )
    SELECT a.n_nodes, a.n_edges, a.n_wedges, t.n_tri AS n_triangles,
           floor(3.0 * t.n_tri / a.n_wedges * 1000000 + 0.5) / 1000000
               AS global_coeff
    FROM agg a CROSS JOIN tri t
    """,
    tags=("graph", "structure", "clustering"),
)
def q_graph_clustering_coefficient(spark, sf_dir):
    """Global clustering coefficient (transitivity) of the strong
    co-purchase graph: C = 3·triangles / wedges — the one-number summary
    of how much the catalog's co-purchase structure closes into cliques
    (bundle-able product families) vs stars (hub accessories).  Reuses
    `strong_copurchase_half` / the id-oriented triangle join; wedges are
    Σ d(d−1)/2 over the exact BIGINT degree relation.  All counts
    integer-exact; the single division is canon 1e-6.  One support-
    filtered pair agg + two equi-joins — the same scale shape as
    `graph_triangle_counts`, reduced to its 1-row global summary."""
    li = load_table(spark, sf_dir, "lineitem")
    half = strong_copurchase_half(li).localCheckpoint(eager=False)
    deg = (
        half.select(F.col("src").alias("node"))
        .unionAll(half.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    agg = deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    wedges = half.select(F.col("src").alias("a"), F.col("dst").alias("b")).join(
        half.select(F.col("src").alias("b"), F.col("dst").alias("c")), "b"
    )
    tri = wedges.join(
        half.select(F.col("src").alias("a"), F.col("dst").alias("c")), ["a", "c"]
    ).agg(F.count("*").cast("long").alias("n_tri"))
    return agg.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        F.col("n_tri").alias("n_triangles"),
        (
            F.floor(3.0 * F.col("n_tri") / F.col("n_wedges") * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("global_coeff"),
    )


def _hits_sql_iterations(iters: int) -> str:
    """Unrolled HITS CTE chain h{k}/a{k} over the bipartite edge set
    ``e(c, p)`` with max-normalized integer micro-unit scores — the DuckDB
    twin of the DataFrame loop in :func:`q_graph_hits` (same floor
    division, same iteration count)."""
    parts = [
        """
    a0 AS MATERIALIZED (
        SELECT p, CAST(1000000 AS BIGINT) AS s FROM (SELECT DISTINCT p FROM e)
    )"""
    ]
    prev_a = "a0"
    for k in range(1, iters + 1):
        parts.append(f"""
    h{k}r AS MATERIALIZED (
        SELECT e.c, CAST(sum(x.s) AS BIGINT) AS s
        FROM e JOIN {prev_a} x ON x.p = e.p GROUP BY e.c
    ), h{k} AS MATERIALIZED (
        SELECT c, CAST(s * 1000000 // (SELECT max(s) FROM h{k}r) AS BIGINT) AS s
        FROM h{k}r
    ), a{k}r AS MATERIALIZED (
        SELECT e.p, CAST(sum(x.s) AS BIGINT) AS s
        FROM e JOIN h{k} x ON x.c = e.c GROUP BY e.p
    ), a{k} AS MATERIALIZED (
        SELECT p, CAST(s * 1000000 // (SELECT max(s) FROM a{k}r) AS BIGINT) AS s
        FROM a{k}r
    )""")
        prev_a = f"a{k}"
    return ",".join(parts)


_HITS_ITERS = 3


@register(
    "graph_hits",
    oracle="""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),"""
    + _hits_sql_iterations(_HITS_ITERS)
    + f"""
    , dc AS (SELECT c, CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY c),
    dp AS (SELECT p, CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY p),
    hubs AS (
        SELECT 'hub' AS side, h.c AS node, h.s AS score, dc.degree,
               CAST(row_number() OVER (ORDER BY h.s DESC, h.c) AS BIGINT) AS rk
        FROM h{_HITS_ITERS} h JOIN dc ON dc.c = h.c
    ), auths AS (
        SELECT 'authority' AS side, a.p AS node, a.s AS score, dp.degree,
               CAST(row_number() OVER (ORDER BY a.s DESC, a.p) AS BIGINT) AS rk
        FROM a{_HITS_ITERS} a JOIN dp ON dp.p = a.p
    )
    SELECT * FROM hubs WHERE rk <= 10
    UNION ALL
    SELECT * FROM auths WHERE rk <= 10
    """,
    tags=("graph", "hits", "iterative", "bipartite"),
)
def q_graph_hits(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg, public) over the bipartite
    customer→part purchase graph: hub customers concentrate purchases on
    high-authority parts, authority parts are bought by high-hub
    customers — the mutual-reinforcement companion to
    `graph_copurchase_pagerank` (which needs a symmetric graph; HITS is
    the tool when the relation is inherently bipartite/directed).  3
    iterations of h ← A·a, a ← Aᵀ·h with max-normalization; top-10 per
    side with degrees.

    Bit-parity: scores live in INTEGER micro-units — each matrix-vector
    step is a BIGINT grouped sum, each normalization is floor division by
    the 1-row max (`s·1e6 DIV max`), so there is no float anywhere and
    both engines agree exactly (the inflate-before-divide product stays
    under 2^63 while max-normalized scores are ≤1e6 and degrees ≤1e6;
    beyond that, lift to decimal(38,0)).  Scale: the edge relation
    partitions by the join key once and every iteration is one equi-join
    + grouped sum (sparse mat-vec, the pagerank shape); the per-side
    top-10 window ranks the NODE relation, bounded by |customers|
    (escalate to the sort-limit top-k pattern if the node relation itself
    is the bottleneck)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # r13 (module note): TWO pinned copies of the distinct edge set — one
    # per mat-vec direction, each hash-partitioned by that direction's
    # groupBy key — so all 2·ITERS grouped sums AND both degree aggs are
    # exchange-free behind the statically-broadcast score vectors; the
    # distinct itself is computed once (shared checkpoint) and each copy
    # pays one partitioning pass.  Before: every half-step re-exchanged
    # the ~|E| join output (AQE broadcast the scores only as a runtime
    # conversion, after the edge side's shuffle write).
    e_c = _pin(e, group_key="c", join_key="p")
    e_p = _pin(e, group_key="p", join_key="c")
    # seed scores off the p-pinned copy: its distinct is exchange-free too
    a = e_p.select("p").distinct().withColumn("s", F.lit(1000000).cast("long"))
    h = None
    # Each half-step's score relation is lazily checkpointed: ``hr``/``ar``
    # feed BOTH their max-aggregate and the normalization, so without the
    # cut the logical tree doubles per half-step (2^6 ≈ 64× duplicated
    # subtrees by iteration 3 — a ~1 MB physical plan whose driver-side
    # compile dominated; guide §7.3 "planning time"). The checkpoint is
    # lazy (no extra job) and the relations are node-bounded.
    for _ in range(_HITS_ITERS):
        hr = (
            e_c.join(_nodes(a), "p").groupBy("c").agg(F.sum("s").cast("long").alias("s"))
            .localCheckpoint(eager=False)
        )
        mx = hr.agg(F.max("s").alias("mx"))
        h = hr.crossJoin(F.broadcast(mx)).select(
            "c", F.expr("CAST(s * 1000000 DIV mx AS BIGINT)").alias("s")
        )
        ar = (
            e_p.join(_nodes(h), "c").groupBy("p").agg(F.sum("s").cast("long").alias("s"))
            .localCheckpoint(eager=False)
        )
        mxa = ar.agg(F.max("s").alias("mx"))
        a = ar.crossJoin(F.broadcast(mxa)).select(
            "p", F.expr("CAST(s * 1000000 DIV mx AS BIGINT)").alias("s")
        )
    dc = e_c.groupBy("c").agg(F.count("*").cast("long").alias("degree"))
    dp = e_p.groupBy("p").agg(F.count("*").cast("long").alias("degree"))
    hubs = (
        h.join(dc, "c")
        .select(
            F.lit("hub").alias("side"),
            F.col("c").alias("node"),
            F.col("s").alias("score"),
            "degree",
        )
    )
    auths = (
        a.join(dp, "p")
        .select(
            F.lit("authority").alias("side"),
            F.col("p").alias("node"),
            F.col("s").alias("score"),
            "degree",
        )
    )
    w = Window.partitionBy("side").orderBy(F.desc("score"), "node")
    return (
        hubs.unionByName(auths)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
    )


# ---------------------------------------------------------------------------
# Personalized PageRank — seed-restart relevance on the strong graph (r10)
# ---------------------------------------------------------------------------


def _ppr_sql_iterations(iters: int, damp: float) -> str:
    """Unrolled r1..rN CTEs for the personalized-PageRank oracle; restart
    mass returns to the SEED set each step (not uniformly)."""
    out = []
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        out.append(f"""
    , r{i} AS (
        SELECT n.node,
               CAST({1.0 - damp} AS DOUBLE) * n.restart
                 + CAST({damp} AS DOUBLE) * COALESCE(m.mass, 0.0) AS rank
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, sum(r.rank / d.degree) AS mass
            FROM sym e JOIN deg d ON d.node = e.src
                       JOIN {prev} r ON r.node = e.src
            GROUP BY e.dst
        ) m ON m.node = n.node
    )""")
    return "".join(out)


@register(
    "graph_personalized_pagerank",
    oracle="""
    WITH half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2
    ), sym AS (
        SELECT src, dst FROM half
        UNION ALL SELECT dst AS src, src AS dst FROM half
    ), deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
        FROM sym GROUP BY src
    ), seeds AS (
        SELECT node FROM deg ORDER BY degree DESC, node LIMIT 5
    ), nodes AS (
        SELECT d.node, d.degree,
               CASE WHEN s.node IS NOT NULL THEN 0.2 ELSE 0.0 END AS restart
        FROM deg d LEFT JOIN seeds s ON s.node = d.node
    ), r0 AS (
        SELECT node, CAST(restart AS DOUBLE) AS rank FROM nodes
    )
    __ITER__
    SELECT n.node, n.degree, (n.restart > 0.0) AS is_seed,
           floor(r.rank * 1000000000 + 0.5) / 1000000000 AS ppr
    FROM r3 r JOIN nodes n ON n.node = r.node
    WHERE r.rank > 0.0
    ORDER BY ppr DESC, n.node LIMIT 50
    """.replace("__ITER__", _ppr_sql_iterations(3, 0.85)),
    tags=("graph", "pagerank", "personalized", "iterative"),
)
def q_graph_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank from the 5 highest-degree parts of the strong
    (support>=2) co-purchase graph — "what is relevant NEAR these
    products", the recommendation/retrieval primitive that global
    `graph_copurchase_pagerank` cannot answer (its restart mass spreads
    uniformly; here it returns to the seed set, so scores measure
    proximity to the seeds).  r ← (1−d)·restart + d·Σ r(u)/deg(u), init
    r = restart (0.2 on each seed), d = 0.85, 3 iterations, top-50 by
    nano-canonicalized score (unreached nodes hold exact 0.0 and are cut).

    Seeds are deterministic (degree desc, node asc — same tiebreak
    convention as the top-k family), so the full pipeline value-hashes.
    Scale: each iteration is one sparse matvec (edge join + grouped sum)
    with the edge relation's partitioning reused across rounds — the
    pagerank argument — plus a per-node left join to re-inject restart
    mass; the seed relation is 5 rows, always broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    half = strong_copurchase_half(li).localCheckpoint(eager=False)
    # r13 (module note): dst-pinned symmetric edges — each iteration's
    # grouped mass sum is exchange-free behind the broadcast-hinted
    # deg/ranks sides (join key src in the opt-out shuffle regime).
    sym = _pin(
        half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))),
        group_key="dst",
        join_key="src",
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )
    seeds = deg.orderBy(F.desc("degree"), "node").limit(5).select("node")
    nodes = (
        deg.join(F.broadcast(seeds.withColumn("_s", F.lit(1))), "node", "left")
        .select(
            "node",
            "degree",
            F.when(F.col("_s").isNotNull(), F.lit(0.2)).otherwise(F.lit(0.0)).alias(
                "restart"
            ),
        )
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("node", F.col("restart").cast("double").alias("rank"))
    damp = 0.85
    for _ in range(3):
        mass = (
            sym.join(_nodes(deg.withColumnRenamed("node", "src")), "src")
            .join(_nodes(ranks.withColumnRenamed("node", "src")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("degree")).alias("mass"))
        )
        ranks = nodes.join(mass, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damp) * F.col("restart")
                + F.lit(damp) * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("rank"),
        )
    return (
        ranks.join(nodes, "node")
        .filter(F.col("rank") > 0.0)
        .select(
            "node",
            "degree",
            (F.col("restart") > 0.0).alias("is_seed"),
            (F.floor(F.col("rank") * 1000000000 + F.lit(0.5)) / 1000000000).alias(
                "ppr"
            ),
        )
        .orderBy(F.desc("ppr"), "node")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Neighborhood Jaccard — integer-exact link prediction (r10)
# ---------------------------------------------------------------------------


@register(
    "graph_neighborhood_jaccard",
    oracle="""
    WITH half AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2
    ), sym AS (
        SELECT src, dst FROM half
        UNION ALL SELECT dst AS src, src AS dst FROM half
    ), deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
        FROM sym GROUP BY src
    ), wedges AS (
        SELECT e1.dst AS a, e2.dst AS c
        FROM sym e1 JOIN sym e2
          ON e1.src = e2.src AND e1.dst < e2.dst
    ), common AS (
        SELECT a AS src, c AS dst, CAST(count(*) AS BIGINT) AS cn
        FROM wedges GROUP BY a, c
    ), nonedge AS (
        SELECT cm.src, cm.dst, cm.cn,
               da.degree AS deg_src, dc.degree AS deg_dst,
               (da.degree + dc.degree - cm.cn) AS un
        FROM common cm
        JOIN deg da ON da.node = cm.src
        JOIN deg dc ON dc.node = cm.dst
        WHERE NOT EXISTS (
            SELECT 1 FROM half h WHERE h.src = cm.src AND h.dst = cm.dst
        )
    )
    SELECT src, dst, cn AS common_neighbors, deg_src, deg_dst,
           floor(CAST(cn AS DOUBLE) / un * 1000000 + 0.5) / 1000000
             AS jaccard
    FROM nonedge
    ORDER BY jaccard DESC, src, dst LIMIT 50
    """,
    tags=("graph", "linkpred", "jaccard"),
)
def q_graph_neighborhood_jaccard(spark, sf_dir):
    """Neighborhood-Jaccard link prediction on the strong co-purchase
    graph: for non-adjacent pairs, |N(a)∩N(c)| / |N(a)∪N(c)| with the
    union by inclusion-exclusion (deg_a + deg_c − common) — EVERY input
    to the score is an exact BIGINT, so unlike `graph_adamic_adar` (whose
    1/ln(deg) sum is float) the ranking key is a single exact integer
    ratio: one divide, floor-canonicalized, zero accumulation skew.

    Same candidate shape as adamic-adar: pairs come only from the wedge
    join on the shared center (Σ deg(b)² with the support-2 prefilter
    bounding hubs), the existing-edge exclusion is an anti join on the
    oriented half relation, and degrees ride AQE-sized joins.  Top-50
    deterministic (score desc, then pair)."""
    li = load_table(spark, sf_dir, "lineitem")
    half = strong_copurchase_half(li).localCheckpoint(eager=False)
    sym = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )
    e1 = sym.select(F.col("src").alias("b"), F.col("dst").alias("a"))
    e2 = sym.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    common = (
        e1.join(e2, "b")
        .filter(F.col("a") < F.col("c"))
        .groupBy(F.col("a").alias("src"), F.col("c").alias("dst"))
        .agg(F.count("*").cast("long").alias("cn"))
    )
    nonedge = (
        common.join(half, ["src", "dst"], "left_anti")
        .join(deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "deg_src"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "deg_dst"), "dst")
        .select(
            "src",
            "dst",
            "cn",
            "deg_src",
            "deg_dst",
            (F.col("deg_src") + F.col("deg_dst") - F.col("cn")).alias("un"),
        )
    )
    return (
        nonedge.select(
            "src",
            "dst",
            F.col("cn").alias("common_neighbors"),
            "deg_src",
            "deg_dst",
            (
                F.floor(F.col("cn").cast("double") / F.col("un") * 1000000 + F.lit(0.5))
                / 1000000
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "src", "dst")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# k-core decomposition (r11) — fixed-round peeling
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 4


def _kcore_oracle(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    ctes = [
        """e0 AS (
        SELECT src, dst FROM (
            SELECT a.l_partkey AS src, b.l_partkey AS dst
            FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            WHERE a.l_partkey < b.l_partkey
        ) GROUP BY src, dst
    ), e0s AS (
        SELECT src, dst FROM e0
        UNION ALL SELECT dst AS src, src AS dst FROM e0
    )"""
    ]
    cur = "e0s"
    for i in range(1, rounds + 1):
        ctes.append(
            f"""s{i} AS (
        SELECT src FROM {cur} GROUP BY src HAVING count(*) >= {k}
    ), e{i} AS (
        SELECT e.src, e.dst FROM {cur} e
        JOIN s{i} a ON a.src = e.src
        JOIN s{i} b ON b.src = e.dst
    )"""
        )
        cur = f"e{i}"
    return f"""
    WITH {", ".join(ctes)}
    SELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree,
           CAST(CASE WHEN count(*) >= {k} THEN 1 ELSE 0 END AS BIGINT) AS stable
    FROM {cur} GROUP BY src
    """


def k_core_peel(
    edges: DataFrame,
    k: int = _KCORE_K,
    rounds: int = _KCORE_ROUNDS,
    check_convergence: bool = False,
) -> DataFrame:
    """``rounds`` unrolled k-core peeling rounds over a symmetric (src, dst)
    edge relation; returns (node, core_degree, stable).  When any node
    survives the last round with degree < k the peel has NOT reached its
    fixpoint — those rows ALWAYS carry ``stable = 0`` (the per-row,
    oracle-pinned signal; consumers filter or assert on it).  Passing
    ``check_convergence=True`` additionally raises a RuntimeWarning from
    the driver (the `connected_components_star` non-convergence contract,
    ADVICE r11) — but that check is a driver-side ACTION, so it executes
    the whole peel eagerly at DataFrame-construction time and the caller
    then re-executes it when consuming the returned plan (~2× cost,
    measured by the r12 scoped anchor).  ADVICE r12: an API returning a
    lazy DataFrame must not act eagerly by default — the warning is
    opt-IN; the ``stable`` flag carries the contract either way."""
    # r13 (module note): pin by the degree-count key — every round's
    # groupBy("src") and the final aggregation run exchange-free, and the
    # broadcast-hinted survivor semi-joins preserve the pinned partitioning
    # through each round's checkpoint.
    cur = _pin(edges, group_key="src", join_key="src")
    for _ in range(rounds):
        surv = (
            cur.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        cur = (
            cur.join(_nodes(surv), "src", "left_semi")
            .join(_nodes(surv.select(F.col("src").alias("dst"))), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
    if check_convergence:
        n_unstable = (
            cur.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") < k)
            .limit(1)
            .count()
        )
        if n_unstable:
            import warnings  # noqa: PLC0415

            warnings.warn(
                f"k_core_peel: fixpoint not reached within rounds={rounds} "
                f"(stable=0 rows remain; they are NOT {k}-core members) — "
                f"raise rounds (peel depth is bounded by the graph's "
                f"degeneracy ordering length)",
                RuntimeWarning,
                stacklevel=2,
            )
    return cur.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("core_degree"),
        F.when(F.count("*") >= k, 1).otherwise(0).cast("long").alias("stable"),
    )


@register(
    "graph_k_core",
    oracle=_kcore_oracle(),
    tags=("graph", "k-core", "peeling"),
)
def q_graph_k_core(spark, sf_dir):
    """3-core of the part co-purchase graph by FOUR unrolled peeling
    rounds: each round drops nodes whose degree among current survivors
    is < k and re-restricts the edge set — the standard dense-subgraph
    extraction (spam/botnet cores, collaboration cores) beside
    `graph_hits`/`graph_personalized_pagerank`'s score propagation.  The
    per-node ``stable`` flag exposes convergence (pinned at test scale by
    pytest; both engines unroll the IDENTICAL rounds, so parity holds
    regardless), and `k_core_peel` additionally raises a RuntimeWarning
    when any stable=0 row survives — non-fixpoint output can't pass
    silently (ADVICE r11).

    Scale: each round is one grouped degree count + two semi-join
    restrictions on the (src-partitioned) edge relation — the peeling
    loop at 100 TB runs O(rounds) shuffles on a monotonically shrinking
    edge set; the integer degrees make every round exact.
    ``check_convergence=False`` here (and the API default, ADVICE r12):
    the query's own output carries the per-row ``stable`` flag
    (oracle-pinned), so the eager driver-side re-check would only
    re-execute the peel per build."""
    li = load_table(spark, sf_dir, "lineitem")
    return k_core_peel(
        copurchase_edges(li), k=_KCORE_K, rounds=_KCORE_ROUNDS,
        check_convergence=False,
    )
