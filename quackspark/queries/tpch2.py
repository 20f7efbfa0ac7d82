"""TPC-H-shaped coverage, second wave (q4/q7/q14/q17/q18/q19/q22 shapes
adapted to the fixture's columns — no partsupp/commitdate/receiptdate/
container in the driver's synthetic schema, TESTDATA.md).

Each exercises a distinct hard plan shape from the reference inventory:
EXISTS (MARK join duckdb.hpp:13908), two-sided nation join (join-order DP
duckdb-7.cpp:13981), conditional aggregation, correlated scalar subquery
(SINGLE join duckdb.hpp:13910 + decorrelation duckdb-9.cpp:1046),
HAVING-subquery semi-join, disjunctive multi-table predicates, anti-join
with uncorrelated scalar subquery.

Scale notes: every dimension side is explicitly broadcast; the correlated
q17 shape is expressed as an aggregate-then-join (no per-row subquery
execution — the decorrelated form Catalyst would otherwise have to derive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.queries._util import (
    day_bound,
    dsum,
    dsum_u,
    dsum_u_when,
    load_table,
    o_dsum,
)
from quackspark.queries.tpch import O_REVENUE, REVENUE
from quackspark.session import load_table_derived


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: EXISTS semi-join then priority rollup."""
    orders = load_table_derived(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    return (
        orders.filter(
            day_bound(orders, "o_orderdate", ">=", "1995-01-01")
            & day_bound(orders, "o_orderdate", "<", "1996-01-01")
        )
        .join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped: bidirectional nation-pair trade volume by year."""
    li = load_table_derived(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        pairs.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum_u(li, "l_rev_u", REVENUE()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped: conditional aggregation over a part join."""
    li = load_table_derived(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.filter(
        day_bound(li, "l_shipdate", ">=", "1995-09-01")
        & day_bound(li, "l_shipdate", "<", "1995-10-01")
    ).join(F.broadcast(part), li.l_partkey == part.p_partkey)
    is_promo = F.col("p_type").startswith("PROMO")
    return j.agg(
        (
            F.lit(100.0)
            * dsum_u_when(j, "l_rev_u", is_promo, REVENUE())
            / dsum_u(j, "l_rev_u", REVENUE())
        ).alias("promo_revenue")
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped: per-part average-quantity threshold (decorrelated scalar
    subquery expressed directly as aggregate + re-join)."""
    li = load_table_derived(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    brand = part.filter(F.col("p_brand") == "Brand#1")
    j = (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
    )
    return j.agg(
        (dsum_u(j, "l_eprice_u", "l_extendedprice") / 7.0).alias("avg_yearly")
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped: orders whose total quantity exceeds a threshold
    (HAVING subquery → semi-join), top-n by price."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        # both sides arrive hash-partitioned on orderkey (orders bucketed,
        # big inherits lineitem's bucketing through the exchange-free agg);
        # shuffle_hash builds from the small filtered agg side instead of
        # paying SMJ's two in-partition sorts
        orders.join(big.hint("shuffle_hash"), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("sum_qty", 6).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped: OR-of-ANDs predicates across the part join — the filter
    shape the reference's expression rewriter normalizes (duckdb-7.cpp:
    13908-13921); Catalyst handles identically."""
    li = load_table_derived(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 40))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 50))
    )
    return j.filter(cond).agg(dsum_u(j, "l_rev_u", REVENUE()).alias("revenue"))


def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: customers above the average balance with no orders
    (uncorrelated scalar subquery + anti-join)."""
    from quackspark.session import load_table_projection

    cust = load_table(spark, sf_dir, "customer")
    # custkey projection (see q13): the anti-join probe side arrives
    # pre-partitioned on o_custkey — no fact-sized exchange
    orders = load_table_projection(spark, sf_dir, "orders", "o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).alias("cgroup"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cgroup")
    )


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q7_volume_shipping": q7_volume_shipping,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
    "q22_global_sales": q22_global_sales,
}

ORACLES = {
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {o_dsum(O_REVENUE)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q14_promo_revenue": f"""
        SELECT 100.0 * {o_dsum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {O_REVENUE} ELSE 0.0 END")}
               / {o_dsum(O_REVENUE)} AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01'
          AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
    "q17_small_quantity": f"""
        SELECT {o_dsum("l_extendedprice")} / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum_qty, 6) AS sum_qty
        FROM orders
        JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
              FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) b
          ON o_orderkey = b.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "q19_disjunctive": f"""
        SELECT {o_dsum(O_REVENUE)} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 30)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 40)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 50)
    """,
    "q22_global_sales": f"""
        SELECT c_custkey % 10 AS cgroup,
               count(*) AS numcust,
               {o_dsum("c_acctbal")} AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY 1 ORDER BY 1
    """,
}
