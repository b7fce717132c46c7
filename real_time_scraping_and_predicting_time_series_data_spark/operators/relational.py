"""Batch relational core: the standard operator set (SURVEY.md §2.8 row
"standard relational set") exercised on the driver's TPC-H-ish star schema.

The reference itself has no relational queries (it is a single-stream tick
pipeline), but the as-of join and metric aggregates decompose into these, and
the driver's oracle harness verifies them directly. All pure Catalyst
built-ins: scans get predicate pushdown + column pruning, small dimension
joins broadcast, large joins sort-merge/shuffled-hash under AQE.

Hash-parity conventions (see plans/registry.py docstring): aliases match the
oracle SQL exactly; double aggregates rounded on both sides; DuckDB HUGEINT /
BIGINT-returning scalar fns cast to match Spark's types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation pipeline (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg"),
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped scan→filter→hash-agg. Filter + pruning push into the
    parquet scan; partial aggregation is map-side (4×3 groups)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("relational", "join", "topk"),
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-k.
    customer is small relative to lineitem → broadcast; the orders⋈lineitem
    join shuffles on orderkey with AQE free to pick broadcast at low SF."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("relational", "join"),
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way star join; region/nation/supplier broadcast,
    fact-side joins shuffle on their keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "join_broadcast_part",
    oracle="""
    SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice), 2) AS total_price
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    GROUP BY p.p_brand
    """,
    tags=("relational", "join", "broadcast"),
)
def join_broadcast_part(spark, sf_dir):
    """Explicit broadcast-hash join of the small part dim into lineitem —
    zero shuffle on the fact side until the final 25-group agg."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), F.round(F.sum("l_extendedprice"), 2).alias("total_price"))
    )


@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("relational", "join", "semi"),
)
def join_semi(spark, sf_dir):
    """Left-semi join (EXISTS): customers having at least one big order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("relational", "join", "anti"),
)
def join_anti(spark, sf_dir):
    """Left-anti join (NOT EXISTS): customers with no big order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_left_outer_order_lines",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
           round(coalesce(sum(l.l_quantity), 0.0), 2) AS total_qty
    FROM orders o LEFT JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 45
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
    tags=("relational", "join", "outer"),
)
def join_left_outer(spark, sf_dir):
    """Left-outer join with an ON-clause predicate (null-extended rows kept),
    then grouped counts — exercises outer-join null semantics."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_quantity > 45), "left")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count("l_orderkey").alias("n_lines"),
            F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2).alias("total_qty"),
        )
    )


@register(
    "join_full_outer_nations",
    oracle="""
    SELECT coalesce(a.k, b.k) AS nationkey,
           a.n_customers, b.n_suppliers
    FROM (SELECT c_nationkey AS k, CAST(count(*) AS BIGINT) AS n_customers
          FROM customer GROUP BY c_nationkey) a
    FULL OUTER JOIN (SELECT s_nationkey AS k, CAST(count(*) AS BIGINT) AS n_suppliers
          FROM supplier GROUP BY s_nationkey) b
      ON a.k = b.k
    """,
    tags=("relational", "join", "outer"),
)
def join_full_outer(spark, sf_dir):
    """Full-outer join of two aggregates (nations present on either side)."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return c.join(s, ["k"], "full_outer").select(
        F.col("k").alias("nationkey"), "n_customers", "n_suppliers"
    )


# ---------------------------------------------------------------------------
# Grouped / distinct / multi-dimensional aggregation
# ---------------------------------------------------------------------------


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "agg", "distinct"),
)
def agg_distinct_counts(spark, sf_dir):
    """Grouped count-distinct (expand + two-phase agg under the hood)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("relational", "agg", "rollup"),
)
def agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals (grand total + per-flag + per-flag/status)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n, round(avg(o_totalprice), 6) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("relational", "agg", "cube"),
)
def agg_cube(spark, sf_dir):
    """CUBE over two dimensions (all 4 grouping sets)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 6).alias("avg_price")
    )


@register(
    "agg_having",
    oracle="""
    SELECT l_suppkey, round(sum(l_extendedprice), 2) AS total
    FROM lineitem GROUP BY l_suppkey
    HAVING sum(l_extendedprice) > 1000000
    """,
    tags=("relational", "agg", "having"),
)
def agg_having(spark, sf_dir):
    """GROUP BY ... HAVING (post-aggregation filter)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
            F.sum("l_extendedprice").alias("_raw"),
        )
        .filter(F.col("_raw") > 1000000)
        .drop("_raw")
    )


@register(
    "agg_conditional_pivot",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS total_f,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS total_o,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS total_p
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational", "agg", "pivot"),
)
def agg_conditional_pivot(spark, sf_dir):
    """Pivot-style conditional aggregation (CASE WHEN inside sum)."""
    o = _t(spark, sf_dir, "orders")

    def cond_sum(status: str):
        return F.round(
            F.sum(F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")).otherwise(0.0)), 2
        )

    return o.groupBy("o_orderpriority").agg(
        cond_sum("F").alias("total_f"), cond_sum("O").alias("total_o"), cond_sum("P").alias("total_p")
    )


@register(
    "subquery_above_nation_avg",
    oracle="""
    SELECT c.c_custkey, round(c.c_acctbal, 2) AS acctbal
    FROM customer c
    JOIN (SELECT c_nationkey, avg(c_acctbal) AS navg
          FROM customer GROUP BY c_nationkey) t
      ON c.c_nationkey = t.c_nationkey
    WHERE c.c_acctbal > t.navg
    """,
    tags=("relational", "subquery"),
)
def subquery_above_nation_avg(spark, sf_dir):
    """Correlated-scalar-subquery shape: customers above their nation's mean
    balance, decorrelated into an agg + broadcast join."""
    c = _t(spark, sf_dir, "customer")
    navg = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("navg"))
    return (
        c.join(F.broadcast(navg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("navg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


# ---------------------------------------------------------------------------
# Window functions / sort / limit
# ---------------------------------------------------------------------------


@register(
    "window_rank_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders
    ) t WHERE rnk <= 3
    """,
    tags=("relational", "window", "topk"),
)
def window_rank_topk(spark, sf_dir):
    """Grouped top-k via row_number — single hash partition by customer."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rnk")
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total
    FROM orders
    """,
    tags=("relational", "window"),
)
def window_running_sum(spark, sf_dir):
    """Per-customer running revenue (cumulative frame)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


@register(
    "window_lag_lead_price",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice - lag(o_totalprice) OVER w, 2) AS delta_prev,
           round(lead(o_totalprice) OVER w - o_totalprice, 2) AS delta_next,
           CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("relational", "window"),
)
def window_lag_lead(spark, sf_dir):
    """lag/lead deltas + ntile bucketing per customer."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wq = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta_prev"),
        F.round(F.lead("o_totalprice").over(w) - F.col("o_totalprice"), 2).alias("delta_next"),
        F.ntile(4).over(wq).cast("long").alias("quartile"),
    )


@register(
    "sort_limit_global_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    tags=("relational", "sort", "topk"),
)
def sort_limit_global_topk(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heap,
    no full sort, no single-node shuffle of the whole table."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    """,
    tags=("relational", "setop"),
)
def set_union_distinct(spark, sf_dir):
    """UNION (distinct) of two key sets."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000).select(
        F.col("o_custkey").alias("custkey")
    )
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey")
    )
    return o.union(c).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("relational", "setop"),
)
def set_intersect(spark, sf_dir):
    """INTERSECT: customers with both a finished and an open order."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("relational", "setop"),
)
def set_except(spark, sf_dir):
    """EXCEPT (distinct): customers with a finished order but no open one."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


# ---------------------------------------------------------------------------
# Scalar function library
# ---------------------------------------------------------------------------


@register(
    "scalar_string_fns",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_type, 'ECONOMY', 'ECO') AS type_replaced,
           CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END AS has_gold,
           trim(p_name) AS name_trim,
           reverse(p_brand) AS brand_rev
    FROM part
    """,
    tags=("relational", "scalar", "string"),
)
def scalar_string_fns(spark, sf_dir):
    """String scalar functions (all JVM built-ins, codegen'd)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace(F.col("p_type"), "ECONOMY", "ECO").alias("type_replaced"),
        F.when(F.col("p_name").like("%gold%"), 1).otherwise(0).alias("has_gold"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


@register(
    "scalar_date_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(date_part('day', o_orderdate) AS INTEGER) AS order_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT)
               AS days_to_2002
    FROM orders
    """,
    tags=("relational", "scalar", "date"),
)
def scalar_date_fns(spark, sf_dir):
    """Date/time scalar functions."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
    )


@register(
    "scalar_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000), 4) AS abs_dev,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(pow(1 + l_tax, 2), 6) AS tax_sq,
           CAST(l_quantity AS BIGINT) % 5 AS qty_mod
    FROM lineitem
    """,
    tags=("relational", "scalar", "math"),
)
def scalar_math_fns(spark, sf_dir):
    """Math scalar functions (P9: sqrt at ``lvmh_forecaster2.py:138``)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 4).alias("abs_dev"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod"),
    )


@register(
    "scalar_conditional_fns",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_class,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
           greatest(c_acctbal, 0.0) AS bal_floor,
           least(round(c_acctbal, 0), 9999.0) AS bal_cap
    FROM customer
    """,
    tags=("relational", "scalar", "conditional"),
)
def scalar_conditional_fns(spark, sf_dir):
    """CASE/coalesce/nullif/greatest/least conditional scalars."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_class"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.least(F.round(F.col("c_acctbal"), 0), F.lit(9999.0)).alias("bal_cap"),
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "topk"),
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: lost-revenue ranking over returned items — fact
    filter pushed to the scan, nation broadcast, top-20 without full sort."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS totalprice,
           round(t.total_qty, 2) AS total_qty
    FROM orders o
    JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250) t
      ON o.o_orderkey = t.l_orderkey
    """,
    tags=("relational", "join", "agg"),
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate-then-join (orders whose line quantities
    exceed a threshold) — the agg shrinks the fact before the join."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("_qty", 2).alias("total_qty"),
        )
    )


@register(
    "monthly_revenue_trend",
    oracle="""
    WITH m AS (
        SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS month,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem GROUP BY strftime(date_trunc('month', l_shipdate), '%Y-%m-%d')
    )
    SELECT month, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS mom_delta
    FROM m
    """,
    tags=("relational", "date", "window"),
)
def monthly_revenue_trend(spark, sf_dir):
    """Monthly revenue with month-over-month delta (agg → ordered window).

    The trend window is a single global ordering over ~#months rows (tiny
    post-aggregation), so the unpartitioned window is safe at any scale."""
    l = _t(spark, sf_dir, "lineitem")
    m = l.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias("month")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    w = Window.orderBy("month")
    return m.select(
        "month", "revenue", F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias("mom_delta")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    tags=("relational", "agg", "grouping-sets", "sql-surface"),
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS through the SQL surface (spark.sql over the
    registered temp views) — the one grouping shape the DataFrame API lacks
    a direct verb for, and a demonstration that every table is addressable
    via SQL (SURVEY §1.4 decision)."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, round(sum(l_extendedprice), 2) AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    tags=("relational", "join", "agg", "sql-surface"),
)
def q12_shipmode(spark, sf_dir):
    """TPC-H Q12 shape via the SQL surface: join + conditional counts."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT l.l_linestatus,
               sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                   AS high_line_count,
               sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                   AS low_line_count
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_linestatus
        """
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("relational", "join", "agg"),
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: global ratio aggregate over a broadcast join."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "window_distribution_fns",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           round(percent_rank() OVER w, 9) AS prank,
           round(cume_dist() OVER w, 9) AS cdist,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("relational", "window", "distribution"),
)
def window_distribution_fns(spark, sf_dir):
    """Distribution-family window functions (rank/dense_rank/percent_rank/
    cume_dist/nth_value) per customer — one hash partition, one sort."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prank"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("relational", "setop", "multiset"),
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL (bag semantics: multiplicities subtract, not collapse)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("relational", "setop", "multiset"),
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL (bag semantics: min of multiplicities survives)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b)


@register(
    "sql_recursive_month_spine",
    oracle="""
    WITH RECURSIVE months(m, mend) AS (
        SELECT date_trunc('month', min(l_shipdate)), date_trunc('month', max(l_shipdate))
        FROM lineitem
        UNION ALL
        SELECT m + INTERVAL 1 MONTH, mend FROM months WHERE m < mend
    ), rev AS (
        SELECT date_trunc('month', l_shipdate) AS mm,
               sum(l_extendedprice * (1 - l_discount)) AS r
        FROM lineitem GROUP BY date_trunc('month', l_shipdate)
    )
    SELECT strftime(months.m, '%Y-%m-%d') AS month,
           round(coalesce(rev.r, 0.0), 2) AS revenue
    FROM months LEFT JOIN rev ON months.m = rev.mm
    """,
    tags=("relational", "recursive-cte", "sql-surface"),
)
def sql_recursive_month_spine(spark, sf_dir):
    """Recursive CTE (Spark 4 WITH RECURSIVE) through the SQL surface: a
    gap-free month spine generated from the data's own span (the recursion
    carries its end bound, no correlated subquery per step), left-joined to
    monthly revenue so empty months surface as zero — the calendar-spine
    pattern monthly_revenue_trend can't express without a generator."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        WITH RECURSIVE months(m, mend) AS (
            SELECT date_trunc('month', min(l_shipdate)), date_trunc('month', max(l_shipdate))
            FROM lineitem
            UNION ALL
            SELECT m + INTERVAL 1 MONTH, mend FROM months WHERE m < mend
        ), rev AS (
            SELECT date_trunc('month', l_shipdate) AS mm,
                   sum(l_extendedprice * (1 - l_discount)) AS r
            FROM lineitem GROUP BY date_trunc('month', l_shipdate)
        )
        SELECT date_format(months.m, 'yyyy-MM-dd') AS month,
               round(coalesce(rev.r, 0.0), 2) AS revenue
        FROM months LEFT JOIN rev ON months.m = rev.mm
        """
    )


@register(
    "dq_validation_suite",
    oracle="""
    SELECT 'lineitem_orphan_orderkeys' AS check_name,
           CAST(count(*) AS BIGINT) AS violations
    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_duplicate_pk',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'lineitem_nonpositive_price',
           CAST(count(*) AS BIGINT) FROM lineitem WHERE l_extendedprice <= 0
    UNION ALL
    SELECT 'lineitem_discount_out_of_range',
           CAST(count(*) AS BIGINT) FROM lineitem
    WHERE l_discount < 0 OR l_discount > 1
    UNION ALL
    SELECT 'orders_null_custkey',
           CAST(count(*) AS BIGINT) FROM orders WHERE o_custkey IS NULL
    UNION ALL
    SELECT 'customer_unknown_nation',
           CAST(count(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n
                                      WHERE n.n_nationkey = c.c_nationkey)
    """,
    tags=("relational", "quality", "constraints"),
)
def dq_validation_suite(spark, sf_dir):
    """Data-quality constraint suite (Deequ/dbt-test shape): referential
    integrity (anti joins), primary-key uniqueness, range and null checks —
    one pass per table, unioned into a (check_name, violations) report.
    The operational pre-flight a 100 TB pipeline runs before training jobs;
    every check is a pushed-down filter or an anti join on the key."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")

    def check(name, df):
        return df.agg(F.count("*").cast("long").alias("violations")).select(
            F.lit(name).alias("check_name"), "violations"
        )

    orphans = l.join(o.select("o_orderkey"), l.l_orderkey == o.o_orderkey, "left_anti")
    dup_pk = o.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).cast("long").alias("violations")
    ).select(F.lit("orders_duplicate_pk").alias("check_name"), "violations")
    bad_nation = c.join(
        F.broadcast(n.select("n_nationkey")), c.c_nationkey == n.n_nationkey, "left_anti"
    )
    return (
        check("lineitem_orphan_orderkeys", orphans)
        .unionByName(dup_pk)
        .unionByName(check("lineitem_nonpositive_price", l.filter(F.col("l_extendedprice") <= 0)))
        .unionByName(
            check(
                "lineitem_discount_out_of_range",
                l.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            )
        )
        .unionByName(check("orders_null_custkey", o.filter(F.col("o_custkey").isNull())))
        .unionByName(check("customer_unknown_nation", bad_nation))
    )


@register(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
               AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey -> supplier',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           CAST((SELECT count(*) FROM customer) AS BIGINT),
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
    """,
    tags=("dq", "referential", "integrity"),
)
def q_dq_referential_integrity(spark, sf_dir):
    """Cross-table referential-integrity audit: orphan counts for the five
    core foreign keys, each as one LEFT ANTI join (planned as
    broadcast/shuffled hash anti joins — never a subquery-per-row). The
    relationship-level complement of `dq_validation_suite`'s single-table
    rules and `dq_schema_profile`'s column profile; on a 100 TB lake this
    is the post-ingest gate that catches partial loads and late dimension
    arrivals."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    def audit(name, child, child_key, parent, parent_key):
        orphans = child.join(
            parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
        )
        return (
            child.agg(F.count("*").cast("long").alias("n_child"))
            .crossJoin(orphans.agg(F.count("*").cast("long").alias("n_orphans")))
            .select(F.lit(name).alias("fk"), "n_child", "n_orphans")
        )

    return (
        audit("lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey")
        .unionAll(audit("orders.o_custkey -> customer", o, "o_custkey", c, "c_custkey"))
        .unionAll(audit("lineitem.l_partkey -> part", li, "l_partkey", p, "p_partkey"))
        .unionAll(
            audit("lineitem.l_suppkey -> supplier", li, "l_suppkey", s, "s_suppkey")
        )
        .unionAll(
            audit("customer.c_nationkey -> nation", c, "c_nationkey", n, "n_nationkey")
        )
    )


# ---------------------------------------------------------------------------
# Schema-discovery profiling — inclusion + functional dependencies (r7)
# ---------------------------------------------------------------------------


@register(
    "dq_inclusion_dependencies",
    oracle="""
    WITH pairs AS (
        SELECT 'orders.o_custkey in customer.c_custkey' AS candidate,
               (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS n_lhs,
               (SELECT CAST(count(DISTINCT o.o_custkey) AS BIGINT) FROM orders o
                WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
                   AS n_contained
        UNION ALL
        SELECT 'customer.c_custkey in orders.o_custkey',
               (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer),
               (SELECT CAST(count(DISTINCT c.c_custkey) AS BIGINT) FROM customer c
                WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
        UNION ALL
        SELECT 'lineitem.l_partkey in part.p_partkey',
               (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem),
               (SELECT CAST(count(DISTINCT l.l_partkey) AS BIGINT) FROM lineitem l
                WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        UNION ALL
        SELECT 'part.p_partkey in lineitem.l_partkey',
               (SELECT CAST(count(DISTINCT p_partkey) AS BIGINT) FROM part),
               (SELECT CAST(count(DISTINCT p.p_partkey) AS BIGINT) FROM part p
                WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey))
        UNION ALL
        SELECT 'events.user_id in customer.c_custkey',
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events),
               (SELECT CAST(count(DISTINCT e.user_id) AS BIGINT) FROM events e
                WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
        UNION ALL
        SELECT 'lineitem.l_suppkey in customer.c_custkey',
               (SELECT CAST(count(DISTINCT l_suppkey) AS BIGINT) FROM lineitem),
               (SELECT CAST(count(DISTINCT l.l_suppkey) AS BIGINT) FROM lineitem l
                WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = l.l_suppkey))
    )
    SELECT candidate, n_lhs, n_contained,
           floor(n_contained / CAST(n_lhs AS DOUBLE) * 1000000 + 0.5) / 1000000
               AS inclusion
    FROM pairs
    """,
    tags=("dq", "profiling", "discovery", "inclusion"),
)
def q_dq_inclusion_dependencies(spark, sf_dir):
    """Foreign-key DISCOVERY: inclusion coefficients |distinct(A) ∩ B| /
    |distinct(A)| for six candidate column pairs — the true FKs score 1.0,
    the reversed directions report dimension coverage (how many customers
    ever ordered), and one deliberately spurious cross-domain candidate
    (l_suppkey vs c_custkey) shows why numeric-overlap alone must not
    promote a join key.  The profiling complement to
    `dq_referential_integrity`, which VERIFIES keys already declared.
    Each pair is distinct(A) → LEFT SEMI join distinct(B) → two counts:
    the fact table contributes one distinct-shuffle per pair and the
    semi join prunes to key columns only — `.explain` shows ReadSchema
    with exactly one column per side."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ev = load_table(spark, sf_dir, "events")

    def incl(name, lhs, lcol, rhs, rcol):
        a = lhs.select(F.col(lcol).alias("k")).distinct()
        b = rhs.select(F.col(rcol).alias("k")).distinct()
        contained = a.join(b, "k", "left_semi")
        return (
            a.agg(F.count("*").cast("long").alias("n_lhs"))
            .crossJoin(contained.agg(F.count("*").cast("long").alias("n_contained")))
            .select(
                F.lit(name).alias("candidate"),
                "n_lhs",
                "n_contained",
                (
                    F.floor(
                        F.col("n_contained") / F.col("n_lhs").cast("double") * 1000000
                        + F.lit(0.5)
                    )
                    / 1000000
                ).alias("inclusion"),
            )
        )

    return (
        incl("orders.o_custkey in customer.c_custkey", o, "o_custkey", c, "c_custkey")
        .unionAll(
            incl("customer.c_custkey in orders.o_custkey", c, "c_custkey", o, "o_custkey")
        )
        .unionAll(
            incl("lineitem.l_partkey in part.p_partkey", li, "l_partkey", p, "p_partkey")
        )
        .unionAll(
            incl("part.p_partkey in lineitem.l_partkey", p, "p_partkey", li, "l_partkey")
        )
        .unionAll(
            incl("events.user_id in customer.c_custkey", ev, "user_id", c, "c_custkey")
        )
        .unionAll(
            incl(
                "lineitem.l_suppkey in customer.c_custkey",
                li,
                "l_suppkey",
                c,
                "c_custkey",
            )
        )
    )


@register(
    "dq_functional_dependencies",
    oracle="""
    WITH cands AS (
        SELECT 'part.p_brand -> part.p_type' AS candidate, g.*
        FROM (SELECT CAST(count(*) AS BIGINT) AS n_lhs,
                     CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_violating,
                     CAST(max(nd) AS BIGINT) AS max_rhs
              FROM (SELECT p_brand, count(DISTINCT p_type) AS nd
                    FROM part GROUP BY p_brand)) g
        UNION ALL
        SELECT 'part.p_name -> part.p_brand', g.*
        FROM (SELECT CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(max(nd) AS BIGINT)
              FROM (SELECT p_name, count(DISTINCT p_brand) AS nd
                    FROM part GROUP BY p_name)) g
        UNION ALL
        SELECT 'orders.o_custkey -> orders.o_orderpriority', g.*
        FROM (SELECT CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(max(nd) AS BIGINT)
              FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
                    FROM orders GROUP BY o_custkey)) g
        UNION ALL
        SELECT 'documents.source -> documents.lang', g.*
        FROM (SELECT CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(max(nd) AS BIGINT)
              FROM (SELECT source, count(DISTINCT lang) AS nd
                    FROM documents GROUP BY source)) g
        UNION ALL
        SELECT 'events.user_id -> events.event_type', g.*
        FROM (SELECT CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
                     CAST(max(nd) AS BIGINT)
              FROM (SELECT user_id, count(DISTINCT event_type) AS nd
                    FROM events GROUP BY user_id)) g
    )
    SELECT candidate, n_lhs, n_violating, max_rhs,
           floor(n_violating / CAST(n_lhs AS DOUBLE) * 1000000 + 0.5) / 1000000
               AS violation_rate
    FROM cands
    """,
    tags=("dq", "profiling", "discovery", "functional-dependency"),
)
def q_dq_functional_dependencies(spark, sf_dir):
    """Functional-dependency profiling: for five candidate A → B rules,
    the share of A-groups holding more than one distinct B — 0.0 means
    the FD holds exactly (a denormalization / dedup-key candidate), small
    means dirty, large means the columns are simply independent.  Each
    candidate is one (A → countDistinct B) grouped aggregation followed
    by a constant-size rollup: map-side partial aggregation does the
    heavy lifting and nothing but (A, B) columns are read.  The
    single-table complement to `dq_inclusion_dependencies`' cross-table
    discovery; together they recover a star schema's join graph from the
    data alone."""

    def fd(name, df, lhs, rhs):
        g = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("nd"))
        return g.agg(
            F.count("*").cast("long").alias("n_lhs"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast("long").alias(
                "n_violating"
            ),
            F.max("nd").cast("long").alias("max_rhs"),
        ).select(
            F.lit(name).alias("candidate"),
            "n_lhs",
            "n_violating",
            "max_rhs",
            (
                F.floor(
                    F.col("n_violating") / F.col("n_lhs").cast("double") * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("violation_rate"),
        )

    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    d = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    return (
        fd("part.p_brand -> part.p_type", p, "p_brand", "p_type")
        .unionAll(fd("part.p_name -> part.p_brand", p, "p_name", "p_brand"))
        .unionAll(
            fd(
                "orders.o_custkey -> orders.o_orderpriority",
                o,
                "o_custkey",
                "o_orderpriority",
            )
        )
        .unionAll(fd("documents.source -> documents.lang", d, "source", "lang"))
        .unionAll(fd("events.user_id -> events.event_type", ev, "user_id", "event_type"))
    )


@register(
    "sql_lateral_topk",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("sql", "lateral", "topk"),
)
def q_sql_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery surface: each BUILDING-segment
    customer's top-2 orders by totalprice, written as SQL `, LATERAL
    (... ORDER BY ... LIMIT 2)` — the "top-N related rows per outer row"
    idiom users port from Postgres/DuckDB.  Catalyst decorrelates the
    lateral into a per-key window/limit over the join (never a
    subquery-per-row), so the physical plan is the same one-shuffle
    shape as `window_rank_orders_per_customer`; the deterministic
    o_orderkey tiebreak makes the LIMIT well-defined on both engines.
    Registered to pin that the LATERAL SQL surface itself stays
    supported, not just its window-function rewrite."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"_lat_{t}")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
        FROM _lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM _lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@register(
    "dq_k_anonymity",
    oracle="""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               count(*) AS sz
        FROM customer
        GROUP BY 1, 2, 3
    ), tot AS (SELECT CAST(sum(sz) AS BIGINT) AS n FROM classes),
    ks AS (SELECT unnest([2, 5, 10]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(count(CASE WHEN c.sz < ks.k THEN 1 END) AS BIGINT)
               AS classes_below_k,
           CAST(coalesce(sum(CASE WHEN c.sz < ks.k THEN c.sz END), 0) AS BIGINT)
               AS rows_at_risk,
           round(coalesce(sum(CASE WHEN c.sz < ks.k THEN c.sz END), 0)
                 / CAST(max(t.n) AS DOUBLE), 6) AS risk_share
    FROM classes c CROSS JOIN ks CROSS JOIN tot t
    GROUP BY ks.k
    """,
    tags=("relational", "quality", "privacy", "k-anonymity"),
)
def dq_k_anonymity(spark, sf_dir):
    """k-anonymity audit over quasi-identifiers (nation, market segment,
    account-balance band): an equivalence class smaller than k means its
    members are re-identifiable by those attributes alone — the privacy
    pre-flight a training-data release runs next to `corpus_pii_redact`
    (redaction removes direct identifiers; k-anonymity measures what the
    QUASI-identifiers still leak).  Reports, for k ∈ {2, 5, 10}, the
    classes below k, the rows at risk, and the risk share.  Scale shape:
    one grouped count over the QI tuple (map-side combinable), then a
    3-row k-grid broadcast over the class-size relation — the class
    relation, not the data, is what the audit aggregates."""
    c = _t(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    ).agg(F.count("*").alias("sz"))
    tot = classes.agg(F.sum("sz").cast("long").alias("n"))
    ks = spark.range(1).select(F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k"))
    at_risk = F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")))
    return (
        classes.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("k").cast("long").alias("k"))
        .agg(
            F.count(F.when(F.col("sz") < F.col("k"), 1)).cast("long").alias("classes_below_k"),
            F.coalesce(at_risk, F.lit(0)).cast("long").alias("rows_at_risk"),
            F.round(
                F.coalesce(at_risk, F.lit(0)) / F.max("n").cast("double"), 6
            ).alias("risk_share"),
        )
    )


@register(
    "orders_skyline",
    oracle="""
    WITH o AS (
        SELECT c.c_mktsegment AS segment, o.o_orderkey, o.o_totalprice,
               CAST(date_diff('day', DATE '1992-01-01',
                              CAST(o.o_orderdate AS DATE)) AS BIGINT) AS d
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), w AS (
        SELECT segment, o_orderkey, o_totalprice, d,
               max(o_totalprice) OVER (
                   PARTITION BY segment ORDER BY -d
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS mx_newer,
               max(o_totalprice) OVER (PARTITION BY segment, d) AS mx_same
        FROM o
    )
    SELECT segment, o_orderkey, round(o_totalprice, 2) AS totalprice, d AS day_idx
    FROM w
    WHERE o_totalprice = mx_same
      AND (mx_newer IS NULL OR o_totalprice > mx_newer)
    """,
    tags=("relational", "skyline", "pareto", "window"),
)
def q_orders_skyline(spark, sf_dir):
    """2-D SKYLINE (Pareto frontier) per market segment: orders not
    DOMINATED by any other — dominated meaning another order in the
    segment is at least as recent AND at least as expensive, strictly
    better in one.  The classic multi-criteria operator (Börzsönyi et
    al.'s SKYLINE OF, public), computed WITHOUT the naive O(n²)
    dominance join: sort each segment by recency, and a point is on the
    frontier iff its price strictly exceeds the running max over all
    strictly-newer orders (RANGE frame on the day index) and ties the max
    within its own day — one partitioned sort window, O(n log n), the
    same plan at 150k or 150B orders.  Same-day same-price ties both
    survive (neither strictly dominates)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    )
    w_newer = (
        Window.partitionBy("segment")
        .orderBy(-F.col("d"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("segment", "d")
    sky = (
        base.withColumn("mx_newer", F.max("o_totalprice").over(w_newer))
        .withColumn("mx_same", F.max("o_totalprice").over(w_same))
        .filter(
            (F.col("o_totalprice") == F.col("mx_same"))
            & (
                F.col("mx_newer").isNull()
                | (F.col("o_totalprice") > F.col("mx_newer"))
            )
        )
    )
    return sky.select(
        "segment",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.col("d").alias("day_idx"),
    )


@register(
    "dq_l_diversity",
    oracle="""
    WITH classes AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               CAST(count(*) AS BIGINT) AS sz,
               CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS ldiv
        FROM customer
        GROUP BY 1, 2
    ), tot AS (SELECT CAST(sum(sz) AS BIGINT) AS n FROM classes),
    ls AS (SELECT unnest([2, 3, 5]) AS l)
    SELECT CAST(ls.l AS BIGINT) AS l,
           CAST(count(CASE WHEN c.ldiv < ls.l THEN 1 END) AS BIGINT)
               AS classes_below_l,
           CAST(coalesce(sum(CASE WHEN c.ldiv < ls.l THEN c.sz END), 0)
                AS BIGINT) AS rows_at_risk,
           round(coalesce(sum(CASE WHEN c.ldiv < ls.l THEN c.sz END), 0)
                 / CAST(max(t.n) AS DOUBLE), 6) AS risk_share,
           CAST(min(c.ldiv) AS BIGINT) AS min_diversity
    FROM classes c CROSS JOIN ls CROSS JOIN tot t
    GROUP BY ls.l
    """,
    tags=("relational", "quality", "privacy", "l-diversity"),
)
def dq_l_diversity(spark, sf_dir):
    """l-diversity audit — the attack k-anonymity misses: a class can be
    large (k-anonymous) yet have every member share one SENSITIVE value,
    so membership alone discloses it (homogeneity attack).  Quasi-
    identifiers here are (nation, balance band); the sensitive attribute
    is the market segment; a class with fewer than l distinct sensitive
    values is at risk.  Reports, for l ∈ {2, 3, 5}, classes below l, rows
    at risk, risk share, and the corpus-wide minimum diversity — the
    companion gate to `dq_k_anonymity` (same class relation, one extra
    countDistinct).  Scale: one grouped agg over the QI tuple; the audit
    aggregates the class relation, never the data twice."""
    c = _t(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    ).agg(
        F.count("*").cast("long").alias("sz"),
        F.countDistinct("c_mktsegment").cast("long").alias("ldiv"),
    )
    tot = classes.agg(F.sum("sz").cast("long").alias("n"))
    ls = spark.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(3), F.lit(5))).alias("l")
    )
    at_risk = F.sum(F.when(F.col("ldiv") < F.col("l"), F.col("sz")))
    return (
        classes.crossJoin(F.broadcast(ls))
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("l").cast("long").alias("l"))
        .agg(
            F.count(F.when(F.col("ldiv") < F.col("l"), 1))
            .cast("long")
            .alias("classes_below_l"),
            F.coalesce(at_risk, F.lit(0)).cast("long").alias("rows_at_risk"),
            F.round(
                F.coalesce(at_risk, F.lit(0)) / F.max("n").cast("double"), 6
            ).alias("risk_share"),
            F.min("ldiv").cast("long").alias("min_diversity"),
        )
    )


@register(
    "dq_t_closeness",
    oracle="""
    WITH seg AS (
        SELECT c_mktsegment AS s, CAST(count(*) AS BIGINT) AS g
        FROM customer GROUP BY c_mktsegment
    ), tot AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM seg),
    cls AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               c_mktsegment AS s,
               CAST(count(*) AS BIGINT) AS cnt
        FROM customer GROUP BY 1, 2, 3
    ), sz AS (
        SELECT c_nationkey, bal_band, CAST(sum(cnt) AS BIGINT) AS sz
        FROM cls GROUP BY 1, 2
    ), cells AS (
        SELECT z.c_nationkey, z.bal_band, z.sz, g.s, g.g,
               CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
        FROM sz z CROSS JOIN seg g
        LEFT JOIN cls c ON c.c_nationkey = z.c_nationkey
                       AND c.bal_band = z.bal_band AND c.s = g.s
    ), tvd AS (
        SELECT c.c_nationkey, c.bal_band, max(c.sz) AS sz,
               CAST(sum(abs(CAST(c.cnt AS DECIMAL(38,0)) * t.n
                            - CAST(c.g AS DECIMAL(38,0)) * c.sz))
                    AS DECIMAL(38,0)) AS num,
               max(t.n) AS n
        FROM cells c CROSS JOIN tot t
        GROUP BY 1, 2
    ), scored AS (
        SELECT sz, n,
               CAST(num AS DOUBLE) / (2.0 * sz * n) AS tvd
        FROM tvd
    ), ths AS (SELECT unnest([0.2, 0.35, 0.5]) AS t)
    SELECT ths.t AS t,
           CAST(count(CASE WHEN s.tvd > ths.t THEN 1 END) AS BIGINT)
               AS classes_above_t,
           CAST(coalesce(sum(CASE WHEN s.tvd > ths.t THEN s.sz END), 0)
                AS BIGINT) AS rows_at_risk,
           round(coalesce(sum(CASE WHEN s.tvd > ths.t THEN s.sz END), 0)
                 / CAST(max(s.n) AS DOUBLE), 6) AS risk_share,
           round(max(s.tvd), 6) AS max_tvd
    FROM scored s CROSS JOIN ths
    GROUP BY ths.t
    """,
    tags=("relational", "quality", "privacy", "t-closeness"),
)
def dq_t_closeness(spark, sf_dir):
    """t-closeness audit — the attack l-diversity misses: a class can be
    diverse yet SKEWED (e.g. 90%% of one sensitive value where the corpus
    is uniform), so membership still shifts an attacker's posterior.  For
    each (nation, balance-band) class, the total-variation distance
    between its market-segment distribution and the global one — the
    categorical Earth-Mover's distance — flags classes with TVD above
    t ∈ {0.2, 0.35, 0.5}.  Completes the k-anonymity → l-diversity →
    t-closeness ladder on the same quasi-identifier relation.

    Bit-parity: TVD = Σ_s|cnt_s/sz − g_s/n| / 2 is computed as the exact
    integer numerator Σ|cnt·n − g·sz| (DECIMAL(38,0) — cnt·n reaches 1e18+
    at warehouse row counts) over ONE division, so both engines agree to
    the last bit before the 1e-6 round.  Absent segments contribute
    |0 − g·sz| via the class×segment cross join against the ~5-row
    broadcast segment relation.  Scale: two grouped aggs over the QI
    tuple; the audit never scans the data twice."""
    c = _t(spark, sf_dir, "customer")
    seg = c.groupBy(F.col("c_mktsegment").alias("s")).agg(
        F.count("*").cast("long").alias("g")
    )
    tot = seg.agg(F.sum("g").cast("long").alias("n"))
    cls = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
        F.col("c_mktsegment").alias("s"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    sz = cls.groupBy("c_nationkey", "bal_band").agg(
        F.sum("cnt").cast("long").alias("sz")
    )
    cells = (
        sz.crossJoin(F.broadcast(seg))
        .join(cls, ["c_nationkey", "bal_band", "s"], "left")
        .select(
            "c_nationkey",
            "bal_band",
            "sz",
            "g",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
    )
    num = F.sum(
        F.abs(
            F.col("cnt").cast("decimal(38,0)") * F.col("n")
            - F.col("g").cast("decimal(38,0)") * F.col("sz")
        )
    )
    tvd = (
        cells.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "bal_band")
        .agg(num.cast("decimal(38,0)").alias("num"), F.max("sz").alias("sz"),
             F.max("n").alias("n"))
        .select(
            "sz",
            "n",
            (
                F.col("num").cast("double")
                / (F.lit(2.0) * F.col("sz") * F.col("n"))
            ).alias("tvd"),
        )
    )
    ths = spark.range(1).select(
        F.explode(F.array(F.lit(0.2), F.lit(0.35), F.lit(0.5))).alias("t")
    )
    at_risk = F.sum(F.when(F.col("tvd") > F.col("t"), F.col("sz")))
    return (
        tvd.crossJoin(F.broadcast(ths))
        .groupBy("t")
        .agg(
            F.count(F.when(F.col("tvd") > F.col("t"), 1))
            .cast("long")
            .alias("classes_above_t"),
            F.coalesce(at_risk, F.lit(0)).cast("long").alias("rows_at_risk"),
            F.round(
                F.coalesce(at_risk, F.lit(0)) / F.max("n").cast("double"), 6
            ).alias("risk_share"),
            F.round(F.max("tvd"), 6).alias("max_tvd"),
        )
    )


@register(
    "dq_completeness_profile",
    oracle="""
    WITH s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(event_id) AS BIGINT) AS nn_event_id,
               CAST(count(DISTINCT event_id) AS BIGINT) AS nd_event_id,
               CAST(count(ts) AS BIGINT) AS nn_ts,
               CAST(count(DISTINCT ts) AS BIGINT) AS nd_ts,
               CAST(count(user_id) AS BIGINT) AS nn_user_id,
               CAST(count(DISTINCT user_id) AS BIGINT) AS nd_user_id,
               CAST(count(event_type) AS BIGINT) AS nn_event_type,
               CAST(count(DISTINCT event_type) AS BIGINT) AS nd_event_type,
               CAST(count(value) AS BIGINT) AS nn_value,
               CAST(count(DISTINCT value) AS BIGINT) AS nd_value,
               CAST(count(props) AS BIGINT) AS nn_props,
               CAST(count(DISTINCT props) AS BIGINT) AS nd_props
        FROM events
    )
    SELECT u.column_name, s.n AS n_rows, u.n_nonnull, u.n_distinct,
           floor(u.n_nonnull / CAST(s.n AS DOUBLE) * 1000000 + 0.5) / 1000000
               AS completeness
    FROM s, LATERAL (
        VALUES ('event_id', s.nn_event_id, s.nd_event_id),
               ('ts', s.nn_ts, s.nd_ts),
               ('user_id', s.nn_user_id, s.nd_user_id),
               ('event_type', s.nn_event_type, s.nd_event_type),
               ('value', s.nn_value, s.nd_value),
               ('props', s.nn_props, s.nd_props)
    ) u(column_name, n_nonnull, n_distinct)
    """,
    tags=("dq", "profiling", "completeness"),
)
def q_dq_completeness_profile(spark, sf_dir):
    """Per-column completeness/cardinality profile of the events table —
    the first report any data-quality harness emits: one row per column
    with non-null count, exact distinct count, and completeness ratio.
    Beside `dq_referential_integrity` (cross-table) and `dq_snapshot_diff`
    (cross-version), this is the single-table intake gate.

    Shape: ONE aggregation computes every column's stats (the distincts
    share the scan via Spark's expand), then the 1-row result unpivots to
    a 6-row report through an in-row struct explode — no second scan, no
    per-column jobs (the naive profiler loops `df.select(c).distinct()`
    per column: 2·|cols| scans).  At 100 TB swap the exact distincts for
    `approx_count_distinct` (documented cutover, same shape)."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    aggs = [F.count("*").cast("long").alias("n")]
    for c in cols:
        aggs.append(F.count(c).cast("long").alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"nd_{c}"))
    s = ev.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"nn_{c}").alias("n_nonnull"),
                F.col(f"nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    out = s.select("n", F.explode(rows).alias("u")).select(
        F.col("u.column_name").alias("column_name"),
        F.col("n").alias("n_rows"),
        F.col("u.n_nonnull").alias("n_nonnull"),
        F.col("u.n_distinct").alias("n_distinct"),
        (
            F.floor(F.col("u.n_nonnull") / F.col("n").cast("double") * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("completeness"),
    )
    return out
