"""TPC-H-shaped coverage, third wave (q2/q8/q9/q11/q12/q13/q15/q16/q20/q21
shapes adapted to the fixture schema — partsupp does not exist, so the
"supply" relation is derived from lineitem; commitdate/receiptdate/shipmode
proxies use l_returnflag / o_orderpriority).

Plan shapes exercised (reference inventory §2.1):
- q2:  correlated scalar MIN subquery per group (SINGLE join
       duckdb.hpp:13910) over a derived supply relation + 4-way dim chain.
- q8:  two roles of the same dimension (nation as supp_nation and
       cust_nation) + conditional share-of-total aggregation.
- q9:  profit expression across 5-table join, group by (nation, year).
- q11: group-by HAVING against an uncorrelated global-total subquery.
- q12: fact-fact join + CASE-bucketed counts.
- q13: LEFT OUTER join + two-level aggregation (histogram of counts).
- q15: view-style derived revenue relation + MAX scalar subquery equality.
- q16: COUNT(DISTINCT) with NOT-IN-style anti-join blacklist.
- q20: nested IN over an aggregated-HAVING subquery + region chain.
- q21: EXISTS + NOT EXISTS over the fact table, folded into a single
       per-order aggregate (see its docstring for the derivation).

Scale notes (100 TB posture): dimension sides (region/nation/supplier/part,
and derived per-supplier/per-part aggregates, which shrink to dimension
cardinality) are broadcast; the only large shuffles are fact-fact joins on
their natural keys (orderkey/partkey) and the first-level aggregations,
both AQE-splittable. Money sums use the exact-decimal path (_util.dsum) so results are identical
at any parallelism.
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


def _eur_suppliers(spark, sf_dir, region="EUROPE"):
    """supplier ⋈ nation ⋈ region filtered to one region (broadcast-sized)."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(reg), nation.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


def q2_min_cost_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped: cheapest regional supplier per part (correlated MIN)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supply = li.groupBy(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).agg(F.min("l_extendedprice").alias("supply_cost"))
    esupply = supply.join(
        F.broadcast(_eur_suppliers(spark, sf_dir)),
        F.col("sp_suppkey") == F.col("s_suppkey"),
    )
    min_cost = esupply.groupBy(F.col("sp_partkey").alias("mc_partkey")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    parts = part.filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "SMALL")
    )
    return (
        esupply.join(F.broadcast(parts), F.col("sp_partkey") == parts.p_partkey)
        .join(
            min_cost,
            (F.col("sp_partkey") == F.col("mc_partkey"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped: one nation's share of regional trade volume by year."""
    li = load_table_derived(spark, sf_dir, "lineitem")
    orders = load_table_derived(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("crk")
    )
    vol = (
        li.join(
            orders.filter(
                day_bound(orders, "o_orderdate", ">=", "1995-01-01")
                & day_bound(orders, "o_orderdate", "<", "1997-01-01")
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
            li.l_partkey == part.p_partkey,
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(reg), F.col("crk") == reg.r_regionkey)
    )
    is_n2 = F.col("supp_nation") == "NATION_2"
    return (
        vol.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum_u_when(vol, "l_rev_u", is_n2, REVENUE())
                / dsum_u(vol, "l_rev_u", REVENUE())
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped: profit by supplier nation and year (cost proxied by
    p_retailprice — the fixture has no partsupp supplycost)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    amount = REVENUE() - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").contains("red"))),
            li.l_partkey == part.p_partkey,
        )
        # shuffle_hash (same rationale as q10): with the derived layout
        # both fact sides arrive orderkey-bucketed, and a hash build from
        # orders keeps the join exchange-free AND sort-free — without the
        # hint Spark plans SMJ and pays two full sorts (the part-join
        # destroys lineitem's bucket ordering; measured at sf10: 4.27 s
        # SMJ vs 2.0 s hinted)
        .join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped: parts whose regional supply value exceeds a fraction of
    the global total (HAVING vs uncorrelated scalar subquery)."""
    li = load_table_derived(spark, sf_dir, "lineitem")
    esupp = _eur_suppliers(spark, sf_dir)
    keep = ["l_partkey", "l_extendedprice"] + (
        ["l_eprice_u"] if "l_eprice_u" in li.columns else []
    )
    ev = li.join(
        F.broadcast(esupp), li.l_suppkey == F.col("s_suppkey")
    ).select(*keep)
    per_part = ev.groupBy("l_partkey").agg(
        dsum_u(ev, "l_eprice_u", "l_extendedprice").alias("value")
    )
    total = per_part.agg((dsum("value") * 0.001).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), "l_partkey")
    )


def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped: urgent/non-urgent order counts per return class
    (l_returnflag proxies l_shipmode; fixture has no commitdate chain)."""
    li = load_table_derived(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            day_bound(li, "l_shipdate", ">=", "1996-01-01")
            & day_bound(li, "l_shipdate", "<", "1997-01-01")
            & F.col("l_returnflag").isin("A", "R")
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped: histogram of per-customer order counts (LEFT OUTER join
    preserving order-less customers + two aggregation levels).

    Reads the CUSTKEY PROJECTION of orders (sources/derived.py
    ensure_projection — same rows, bucketed+sorted on o_custkey) AND a
    custkey-bucketed projection of customer (same bucket count →
    co-located join, r7 verdict directive 5): the fact-sized orders
    exchange, the customer exchange, and the first-level per-customer
    aggregation shuffle all disappear — only the tiny histogram
    re-partitions."""
    from quackspark.session import load_table_projection

    cust = load_table_projection(spark, sf_dir, "customer", "c_custkey")
    orders = load_table_projection(spark, sf_dir, "orders", "o_custkey").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_outer"
    ).groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped: supplier(s) with max quarterly revenue (derived revenue
    view + MAX scalar subquery compared by equality)."""
    li = load_table_derived(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            day_bound(li, "l_shipdate", ">=", "1996-01-01")
            & day_bound(li, "l_shipdate", "<", "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(dsum_u(li, "l_rev_u", REVENUE()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mr"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mr"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped: distinct supplier count per (brand, type, size) with a
    blacklist anti-join (NOT IN suppliers with negative balance)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped: regional suppliers who shipped a large volume of 'small'
    parts in 1996 (IN over an aggregated-HAVING subquery)."""
    li = load_table_derived(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    qual = (
        li.filter(
            day_bound(li, "l_shipdate", ">=", "1996-01-01")
            & day_bound(li, "l_shipdate", "<", "1997-01-01")
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").startswith("small"))),
            li.l_partkey == part.p_partkey,
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    eur = _eur_suppliers(spark, sf_dir).select(F.col("s_suppkey").alias("ek"))
    return (
        supp.join(qual, supp.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(eur), supp.s_suppkey == F.col("ek"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped: suppliers who alone returned items on multi-supplier
    finished orders (l_returnflag='R' proxies the late-delivery predicate).

    The reference plans the EXISTS / NOT EXISTS pair as two MARK-join
    self-joins of lineitem (duckdb.hpp:13908) — on Spark that costs three
    shuffles of the fact table. Both existence tests reduce to per-order
    extrema, so ONE hash aggregation replaces them: EXISTS(other
    supplier) ⇔ min(supp) ≠ max(supp); NOT EXISTS(other 'R' supplier)
    together with "the probe supplier is an 'R' supplier" ⇔ the order has
    exactly one distinct 'R' supplier ⇔ min(R-supp) = max(R-supp)
    (non-null), and that unique supplier is max(R-supp) with sum(R) rows
    contributing to its wait count. lineitem is scanned once and shuffled
    once as combined partial-agg states keyed by l_orderkey — no distinct
    aggregate, no Expand, no self-join; everything downstream is
    order-cardinality or smaller. Semantics stay exactly the oracle's
    EXISTS/NOT EXISTS SQL (the semi/anti MARK operator family is covered
    by subq_exists/subq_not_exists/q4)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == 1
    )
    r_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = li.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
        F.min(r_supp).alias("rmin"),
        F.max(r_supp).alias("rmax"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("r_rows"),
    )
    waiting = per_order.filter(
        (F.col("smin") != F.col("smax")) & (F.col("rmin") == F.col("rmax"))
    ).join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    supp2 = supp.select("s_suppkey", "s_nationkey", "s_name")
    return (
        waiting.join(F.broadcast(supp2), waiting.rmax == supp2.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.sum("r_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


QUERIES = {
    "q2_min_cost_supply": q2_min_cost_supply,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_priority_class": q12_priority_class,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_count": q16_supplier_count,
    "q20_part_promotion": q20_part_promotion,
    "q21_waiting_supplier": q21_waiting_supplier,
}

_ESUPPLY = """
    supply AS (
        SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
               min(l_extendedprice) AS supply_cost
        FROM lineitem GROUP BY 1, 2),
    esupply AS (
        SELECT sp_partkey, supply_cost, s_acctbal, s_name, n_name
        FROM supply
        JOIN supplier ON sp_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE')
"""

ORACLES = {
    "q2_min_cost_supply": f"""
        WITH {_ESUPPLY}
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supply_cost
        FROM esupply JOIN part ON sp_partkey = p_partkey
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'SMALL'
          AND supply_cost = (SELECT min(e2.supply_cost) FROM esupply e2
                             WHERE e2.sp_partkey = esupply.sp_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    "q8_market_share": f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {o_dsum(f"CASE WHEN n1.n_name = 'NATION_2' THEN {O_REVENUE} ELSE 0.0 END")}
               / {o_dsum(O_REVENUE)} AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND p_type = 'ECONOMY' AND r_name = 'ASIA'
        GROUP BY 1 ORDER BY 1
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               {o_dsum(f"{O_REVENUE} - 0.1 * p_retailprice * l_quantity")} AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "q11_important_parts": f"""
        WITH ev AS (
            SELECT l_partkey, l_extendedprice
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
        per_part AS (
            SELECT l_partkey, {o_dsum("l_extendedprice")} AS value
            FROM ev GROUP BY 1)
        SELECT l_partkey, value FROM per_part
        WHERE value > (SELECT {o_dsum("value")} * 0.001 FROM per_part)
        ORDER BY value DESC, l_partkey
    """,
    "q12_priority_class": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_returnflag IN ('A', 'R')
        GROUP BY 1 ORDER BY 1
    """,
    "q13_customer_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer
              LEFT OUTER JOIN orders ON c_custkey = o_custkey
                   AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": f"""
        WITH revenue AS (
            SELECT l_suppkey, {o_dsum(O_REVENUE)} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q16_supplier_count": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q20_part_promotion": """
        SELECT s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
                SELECT l_suppkey FROM lineitem
                JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE 'small%'
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY l_suppkey HAVING sum(l_quantity) > 400)
          AND s_nationkey IN (SELECT n_nationkey FROM nation
                              JOIN region ON n_regionkey = r_regionkey
                              WHERE r_name = 'EUROPE')
        ORDER BY s_name
    """,
    "q21_waiting_supplier": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
          AND n_regionkey = 1
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
}
