"""Deeper relational coverage: the remaining TPC-H query *shapes* adapted to
the driver's star schema (SURVEY.md §2.8 "standard relational set").

The fixture schema (FIXTURES.md §2) has no partsupp table and fewer columns
than real TPC-H, so each query keeps the original's *plan shape* — the mix of
correlated EXISTS/NOT EXISTS, decorrelated scalar subqueries, disjunctive
pushdown predicates, outer-join histograms — with predicates rewritten onto
the available columns. Shapes covered here: Q4 (EXISTS → semi join with a
cross-table comparison), Q6 (pure scan-agg with a conjunctive pushdown), Q7
(two-sided dimension pair filter), Q8 (market-share ratio), Q9 (profit
decomposition), Q13 (outer-join count histogram), Q15 (agg + global-max scalar
subquery), Q17 (correlated avg threshold), Q19 (disjunctive join predicate),
Q21 (EXISTS + NOT EXISTS double correlation), Q22 (global scalar subquery +
anti join); plus the four shapes needing partsupp — Q2 (correlated min),
Q11 (global-threshold HAVING), Q16 (NOT IN + grouped distinct count), Q20
(nested decorrelated aggregates) — over a partsupp derived as lineitem's
distinct (partkey, suppkey) pairs. With relational.py's Q1/Q3/Q5/Q10/Q12/
Q14/Q18 this covers all 22 TPC-H query shapes.

Scale notes are per-query; the common rules: dimension sides broadcast, fact
filters push into the parquet scan, and every EXISTS/NOT EXISTS lowers to a
left-semi/left-anti hash join on the correlation key instead of a per-row
subquery (Spark never executes correlated subqueries row-at-a-time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q4_priority_late_ship",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    """,
    tags=("relational", "join", "semi", "exists"),
)
def q4_priority_late_ship(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS with a cross-table comparison (lineitem shipped
    >30 days after its order date), lowered to a left-semi join whose ON
    clause carries the correlated predicate. The quarter filter prunes the
    orders scan before the join."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAY")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "agg", "pushdown"),
)
def q6_revenue_forecast(spark, sf_dir):
    """TPC-H Q6 shape: pure scan→filter→global-agg. All three conjuncts are
    pushable parquet filters; the scan reads 4 of 11 columns and the agg is a
    single map-side partial + 1-row exchange — the cheapest possible plan."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("relational", "join", "agg"),
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    Both nation dims broadcast; the disjunctive nation-pair predicate is
    applied after the dim joins (it references both sides)."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n1.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("relational", "join", "agg", "ratio"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of regional order volume per year —
    an 8-way join where every dimension (part/supplier/nation/region)
    broadcasts and only orders⋈lineitem shuffles, then a conditional-ratio
    aggregate."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    n2 = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", vol).otherwise(0.0)) / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                   - p.p_retailprice * 0.6 * l.l_quantity AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("relational", "join", "agg"),
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit decomposition by supplier nation and year
    (supply cost proxied as 60% of p_retailprice — fixtures have no
    partsupp). The %red% LIKE filter prunes part before its broadcast."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.6 * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("amount", amount)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@register(
    "q13_order_count_histogram",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("relational", "join", "outer", "agg"),
)
def q13_order_count_histogram(spark, sf_dir):
    """TPC-H Q13 shape: customer distribution by order count — outer join
    with an ON-clause filter (so zero-order customers survive as count 0),
    then a second aggregation over the first's output. Two shuffles total;
    the histogram agg runs over |customers| rows only."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("relational", "subquery", "agg"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: quarterly revenue per supplier, keep the max —
    the global-max scalar subquery becomes a 1-row aggregate broadcast-cross-
    joined back onto the (post-aggregation, |suppliers|-row) revenue relation;
    no single-partition window anywhere. Revenue is rounded *before* the max
    comparison on both engines so float summation order can't flip the
    winner."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    top = revenue.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("_mx")
    )
    return (
        s.join(F.broadcast(top), s.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, round(0.2 * avg(l_quantity), 6) AS qty_thresh
          FROM lineitem GROUP BY l_partkey) t
      ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < t.qty_thresh
    """,
    tags=("relational", "subquery", "agg"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from below-20%-of-average-quantity orders of
    one brand. The correlated per-part avg decorrelates into a grouped agg
    re-joined on partkey (threshold rounded on both engines so the float avg
    can't straddle the comparison)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    thresh = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_thresh")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(thresh, l.l_partkey == thresh.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("relational", "join", "pushdown"),
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: three-way disjunction mixing part and lineitem
    predicates. Catalyst factors the part-only disjuncts (brand IN ...,
    size <= 15) below the join as a pre-filter on the broadcast side; the
    mixed residual evaluates post-join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    disj = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#34") & size.between(1, 15) & qty.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(disj)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
    tags=("relational", "join", "semi", "anti", "exists"),
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the *sole* late shipper in a
    multi-supplier finished order — the doubly-correlated EXISTS / NOT EXISTS
    pair lowers to a left-semi then a left-anti join on orderkey, each with
    the inequality residual in its ON clause. Three shuffles on l_orderkey
    total; at scale all three co-partition so AQE coalesces them."""
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    base = (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .withColumn("deadline", F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .select("l_orderkey", "l_suppkey", "deadline")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    other = (base.l_orderkey == l2.x_orderkey) & (base.l_suppkey != l2.x_suppkey)
    base = base.join(l2, other, "left_semi")
    l3 = li.select(
        F.col("l_orderkey").alias("y_orderkey"),
        F.col("l_suppkey").alias("y_suppkey"),
        F.col("l_shipdate").alias("y_shipdate"),
    )
    other_late = (
        (base.l_orderkey == l3.y_orderkey)
        & (base.l_suppkey != l3.y_suppkey)
        & (l3.y_shipdate > base.deadline)
    )
    base = base.join(l3, other_late, "left_anti")
    return (
        base.join(F.broadcast(s), base.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q22_dormant_rich_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 400000)
    GROUP BY c.c_mktsegment
    """,
    tags=("relational", "subquery", "anti", "agg"),
)
def q22_dormant_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no large order,
    grouped by segment (fixtures have no phone column, so segment replaces
    the country-code grouping; the >400k order predicate keeps the result
    non-empty at every SF — plain no-orders is empty on this corpus). The
    global avg is a 1-row broadcast cross join; NOT EXISTS is a left-anti
    join against the filtered orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# The four shapes needing partsupp, derived as distinct (l_partkey, l_suppkey)
# pairs from lineitem — completes all 22 TPC-H query shapes.
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
    ), costed AS (
        SELECT ps.partkey, ps.suppkey, s.s_acctbal, s.s_name, s.s_nationkey
        FROM ps JOIN supplier s ON ps.suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT p.p_partkey, p.p_brand, c.s_name, round(c.s_acctbal, 2) AS s_acctbal
    FROM part p
    JOIN costed c ON p.p_partkey = c.partkey
    WHERE p.p_size = 15
      AND c.s_acctbal = (SELECT min(c2.s_acctbal) FROM costed c2
                         WHERE c2.partkey = c.partkey)
    """,
    tags=("relational", "subquery", "join", "exists"),
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: cheapest regional supplier per part (acctbal proxies
    supply cost; partsupp derived from lineitem's distinct pairs). The
    correlated per-part min decorrelates into a grouped min re-joined on
    partkey — never a per-row subquery."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    costed = (
        ps.join(F.broadcast(s), ps.suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("partkey", "s_name", "s_acctbal")
    )
    mins = costed.groupBy(F.col("partkey").alias("m_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        costed.join(mins, (costed.partkey == mins.m_partkey) & (costed.s_acctbal == mins.min_bal))
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .select("p_partkey", "p_brand", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH value_by_part AS (
        SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS part_value
        FROM lineitem GROUP BY l_partkey
    ), total AS (
        SELECT avg(part_value) AS av FROM value_by_part
    )
    SELECT v.l_partkey, round(v.part_value, 2) AS part_value
    FROM value_by_part v, total
    WHERE v.part_value > total.av * 1.25
    """,
    tags=("relational", "subquery", "agg"),
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose revenue exceeds a multiple of the mean
    part revenue — grouped sum + 1-row global aggregate broadcast back as
    the HAVING threshold (mean-relative so the predicate stays selective
    but non-empty at every scale factor)."""
    li = _t(spark, sf_dir, "lineitem")
    vbp = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_value")
    )
    total = vbp.agg(F.avg("part_value").alias("av"))
    return (
        vbp.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("av") * 1.25)
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("relational", "join", "anti", "distinct"),
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier counts per part attribute, with a
    NOT IN subquery (suppliers in deficit) lowered to a left-anti join and
    the attribute filters pushed into the part broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_suppkey")
    )
    return (
        ps.join(bad, ps.suppkey == bad.bad_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_stock_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    ), part_total AS (
        SELECT l_partkey, sum(sq) AS tq FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM shipped sh
    JOIN part_total pt ON sh.l_partkey = pt.l_partkey
    JOIN part p ON p.p_partkey = sh.l_partkey AND p.p_name LIKE '%blue%'
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    WHERE sh.sq > 0.5 * pt.tq
    """,
    tags=("relational", "subquery", "join", "agg"),
)
def q20_excess_stock_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped more than half of a blue
    part's yearly volume — nested correlated aggregates decorrelated into
    two grouped sums (per pair, per part) joined back; part filter and
    supplier dim broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("sq"))
    part_total = shipped.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("sq").alias("tq")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    s = _t(spark, sf_dir, "supplier")
    return (
        shipped.join(part_total, shipped.l_partkey == part_total.pt_partkey)
        .filter(F.col("sq") > 0.5 * F.col("tq"))
        .join(F.broadcast(p), shipped.l_partkey == p.p_partkey)
        .join(F.broadcast(s), shipped.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Price indexes — Laspeyres / Paasche / Fisher by month (r10)
# ---------------------------------------------------------------------------


@register(
    "orders_price_index",
    oracle="""
    WITH lines AS (
        SELECT l_partkey AS part,
               strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem
    ), cell AS (
        SELECT part, month,
               CAST(floor(CAST(sum(pc) AS DOUBLE) / sum(q)) AS BIGINT) AS p,
               CAST(sum(q) AS BIGINT) AS q
        FROM lines GROUP BY part, month
    ), base AS (
        SELECT part, p AS p0, q AS q0 FROM cell
        WHERE month = (SELECT min(month) FROM cell)
    ), j AS (
        SELECT c.month,
               CAST(sum(c.p * b.q0) AS BIGINT) AS pt_q0,
               CAST(sum(b.p0 * b.q0) AS BIGINT) AS p0_q0,
               CAST(sum(c.p * c.q) AS BIGINT) AS pt_qt,
               CAST(sum(b.p0 * c.q) AS BIGINT) AS p0_qt,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM cell c JOIN base b ON b.part = c.part
        GROUP BY c.month
    )
    SELECT month, n_parts,
           floor(CAST(pt_q0 AS DOUBLE) / p0_q0 * 1000000 + 0.5) / 1000000
               AS laspeyres,
           floor(CAST(pt_qt AS DOUBLE) / p0_qt * 1000000 + 0.5) / 1000000
               AS paasche,
           floor(sqrt((CAST(pt_q0 AS DOUBLE) / p0_q0)
                      * (CAST(pt_qt AS DOUBLE) / p0_qt)) * 1000000 + 0.5)
               / 1000000 AS fisher
    FROM j ORDER BY month
    """,
    tags=("orders", "index-numbers", "economics"),
)
def q_orders_price_index(spark, sf_dir):
    """Monthly Laspeyres / Paasche / Fisher price indexes of the part
    catalog vs the first shipping month — the index-number machinery a
    revenue dashboard needs to separate PRICE movement from VOLUME
    movement (`monthly_revenue_trend` shows the product of both):
    Laspeyres holds the base-month basket fixed (overstates after
    substitution), Paasche uses the current basket (understates), Fisher
    is their geometric mean.  Only parts present in BOTH months enter a
    month's index (the matched-model rule).

    INTEGER-EXACT: unit prices are cent-floored integer divides of exact
    cent/quantity sums (the established mean device), and all four
    basket dot products Σp·q are BIGINT sums of BIGINT products; the
    three closing divides (+ one sqrt) are canonicalized.

    Scale: one scan to the (part, month) cell grid, one broadcast-sized
    base-month relation joined back, one grouped agg per month — the
    grid is |parts|·|months|, tiny beside the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(
        F.col("l_partkey").alias("part"),
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("month"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("pc"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    cell = lines.groupBy("part", "month").agg(
        F.floor(F.sum("pc").cast("double") / F.sum("q")).cast("long").alias("p"),
        F.sum("q").cast("long").alias("q"),
    ).localCheckpoint(eager=False)
    m0 = cell.agg(F.min("month").alias("m0"))
    base = (
        cell.crossJoin(F.broadcast(m0))
        .filter(F.col("month") == F.col("m0"))
        .select("part", F.col("p").alias("p0"), F.col("q").alias("q0"))
    )
    j = (
        cell.join(base, "part")
        .groupBy("month")
        .agg(
            F.sum(F.col("p") * F.col("q0")).cast("long").alias("pt_q0"),
            F.sum(F.col("p0") * F.col("q0")).cast("long").alias("p0_q0"),
            F.sum(F.col("p") * F.col("q")).cast("long").alias("pt_qt"),
            F.sum(F.col("p0") * F.col("q")).cast("long").alias("p0_qt"),
            F.count("*").cast("long").alias("n_parts"),
        )
    )
    canon = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    lasp = F.col("pt_q0").cast("double") / F.col("p0_q0")
    paas = F.col("pt_qt").cast("double") / F.col("p0_qt")
    return j.select(
        "month",
        "n_parts",
        canon(lasp).alias("laspeyres"),
        canon(paas).alias("paasche"),
        canon(F.sqrt(lasp * paas)).alias("fisher"),
    ).orderBy("month")


@register(
    "orders_herfindahl",
    oracle="""
    WITH r AS (
        SELECT n.n_name AS nation, l.l_suppkey AS supp,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS rc
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name, l.l_suppkey
    ), t AS (
        SELECT nation, CAST(sum(rc) AS BIGINT) AS tot,
               CAST(count(*) AS BIGINT) AS n_suppliers
        FROM r GROUP BY nation
    ), sh AS (
        SELECT r.nation,
               CAST(floor((CAST(r.rc AS DOUBLE) / t.tot)
                          * (CAST(r.rc AS DOUBLE) / t.tot)
                          * 1000000000000 + 0.5) AS BIGINT) AS s2q,
               t.n_suppliers, t.tot
        FROM r JOIN t ON t.nation = r.nation
    )
    SELECT nation, any_value(n_suppliers) AS n_suppliers,
           round(any_value(tot) / 100.0, 2) AS revenue,
           round(CAST(sum(s2q) AS BIGINT) / 1000000000000.0, 9) AS hhi,
           round(1.0 / any_value(n_suppliers), 9) AS hhi_floor
    FROM sh GROUP BY nation
    """,
    tags=("orders", "concentration", "economics"),
)
def q_orders_herfindahl(spark, sf_dir):
    """Herfindahl–Hirschman supplier-concentration index per nation:
    HHI = Σᵢ shareᵢ² of each supplier's revenue share within its nation —
    the market-structure readout (1/n = perfectly even, 1.0 = monopoly)
    that complements `orders_price_index`'s price/volume split; the same
    aggregate is how a corpus pipeline audits source concentration before
    mixture balancing.

    Exactness: revenues are exact cent BIGINTs (the price-index
    quantization); each share² is an identical IEEE expression quantized
    to 1e-12 BEFORE the per-nation sum, so the HHI sum is an order-immune
    integer.  Scale: one fact-table agg keyed (nation, supp) with the two
    dimension joins broadcast, then a |suppliers|-sized reduction —
    map-side combined all the way."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    rc = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    r = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("l_suppkey").alias("supp"))
        .agg(F.sum(rc).cast("long").alias("rc"))
    )
    t = r.groupBy("nation").agg(
        F.sum("rc").cast("long").alias("tot"),
        F.count("*").cast("long").alias("n_suppliers"),
    )
    share = F.col("rc").cast("double") / F.col("tot")
    sh = r.join(F.broadcast(t), "nation").select(
        "nation",
        F.floor(share * share * F.lit(1000000000000) + F.lit(0.5))
        .cast("long")
        .alias("s2q"),
        "n_suppliers",
        "tot",
    )
    return sh.groupBy("nation").agg(
        F.any_value("n_suppliers").alias("n_suppliers"),
        F.round(F.any_value("tot") / 100.0, 2).alias("revenue"),
        F.round(F.sum("s2q").cast("long") / F.lit(1000000000000.0), 9).alias("hhi"),
        F.round(F.lit(1.0) / F.any_value("n_suppliers"), 9).alias("hhi_floor"),
    )
