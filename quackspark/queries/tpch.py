"""TPC-H-shaped headline queries: scan → filter → join → agg → sort.

Exercises the reference's core physical pipeline (TABLE_SCAN duckdb-4.cpp:6784,
FILTER duckdb-3.cpp:12309, HASH_JOIN duckdb-3.cpp:14558, HASH_GROUP_BY
duckdb-3.cpp:8480, ORDER_BY duckdb-4.cpp:559, TOP_N duckdb-4.cpp:840) as
declarative DataFrame plans Catalyst compiles to the same shapes: pushed-down
parquet scans, broadcast/shuffled hash joins, partial+final hash aggregation,
TakeOrderedAndProject.

Scale notes (100 TB posture): dimension tables (region/nation/supplier/part/
customer) are broadcast explicitly so the only shuffles left are the
aggregations; lineitem⋈orders is the one genuinely large shuffle and it is an
equi-join on the natural key, which AQE can further skew-split. Money
aggregates use the exact-decimal path (_util.dsum) so results are identical
at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.queries._util import (
    davg,
    day_bound,
    dsum,
    dsum_u,
    load_table,
    o_davg,
    o_dsum,
)
from quackspark.session import load_table_derived

def REVENUE() -> "F.Column":
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


O_REVENUE = "l_extendedprice * (1 - l_discount)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: big scan + filter + 8-agg groupBy. Flagship query.

    The five exact money sums read the derived layout's materialized
    micro-unit longs (sources/derived.py) when present — the hash-agg
    input is then five stored BIGINT columns, no per-row multiply/Round,
    mirroring how the reference sums its int64-backed DECIMALs in place.
    """
    li = load_table_derived(spark, sf_dir, "lineitem")
    # averages derive from the exact sums post-agg (double(sum)/count —
    # bit-identical to davg) so the hash-agg carries 5 sum states, not 7
    return (
        # plain timestamp predicate, NOT day_bound: this filter keeps
        # ~98% of rows, so the redundant zone-map date predicate cannot
        # skip anything and its extra DATE-column read is pure cost
        # (measured sf10: 1.46 s with vs 1.23 s without)
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_u(li, "l_qty_u", "l_quantity").alias("sum_qty"),
            dsum_u(li, "l_eprice_u", "l_extendedprice").alias("sum_base_price"),
            dsum_u(li, "l_rev_u", REVENUE()).alias("sum_disc_price"),
            dsum_u(li, "l_charge_u", REVENUE() * (1 + F.col("l_tax"))).alias(
                "sum_charge"
            ),
            dsum_u(li, "l_disc_u", "l_discount").alias("_sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
            (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
            (F.col("_sum_disc") / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped: 3-way join + groupBy + top-n (TOP_N duckdb-4.cpp:840).

    Join order is hand-staged dims-first (Catalyst keeps syntactic join
    order without CBO stats): the BUILDING-customer broadcast + the
    o_orderdate filter shrink orders ~10x BEFORE the fact shuffle, and
    the reduced orders side is hinted shuffle_hash so neither side of
    the only wide join pays a sort. At 100 TB the same plan holds — the
    reduced orders side is what a cluster wants to build hash tables
    from, and the lineitem side streams through probe-only."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table_derived(spark, sf_dir, "orders")
    li = load_table_derived(spark, sf_dir, "lineitem")
    o_red = (
        orders.filter(day_bound(orders, "o_orderdate", "<", "1995-03-15"))
        .join(
            F.broadcast(
                cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
            ),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    # derived layout: both fact sides arrive orderkey-bucketed, so the
    # hinted hash join plans with NO exchange (o_red keeps orders'
    # bucketed partitioning through the filter + broadcast join)
    return (
        # exact-only (see q1): the fixture's shipdates start 1995-01, so
        # this predicate keeps ~96% of rows — the zone-map date column
        # would be read for nothing
        li.filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .join(o_red.hint("shuffle_hash"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_u(li, "l_rev_u", REVENUE()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped: 6-way star join through region→nation→{customer,supplier}."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table_derived(spark, sf_dir, "lineitem")
    dims = (
        nation.join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    # supplier-FIRST probe order (r7 verdict directive 4, measured sf10
    # same-JVM A/B: 3.18 s → 1.84 s): the tiny ASIA-supplier broadcast
    # (2 columns, cache-resident hash) filters lineitem to ~1/5 BEFORE
    # the wide shuffle_hash probe against the order-sized o_red build —
    # 75 M cheap small-hash probes replace 75 M cache-missing big-hash
    # probes, and the big-hash probe count drops 5×. The region filter
    # still reaches ORDERS via the ASIA-customer broadcast (~5× smaller
    # build side), and the same-nation predicate folds into the
    # shuffle_hash join as a residual. Exchange-free on the fact side
    # (li bucketed; o_red inherits orders' bucketing through broadcasts).
    supp_asia = supp.join(
        F.broadcast(dims.select("n_nationkey")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey")
    # the pruned money columns must be the ones dsum_u will ACTUALLY
    # consume: in decimal mode it ignores the stored u-column and
    # evaluates REVENUE() from price × discount (caught by a
    # QUACKSPARK_EXACT_SUM=decimal differential: pruning to l_rev_u alone
    # made the fallback expression unresolvable)
    from quackspark.queries._util import EXACT_SUM_MODE

    money = (
        ["l_rev_u"]
        if EXACT_SUM_MODE == "long" and "l_rev_u" in li.columns
        else ["l_extendedprice", "l_discount"]
    )
    li2 = li.join(
        F.broadcast(supp_asia), li.l_suppkey == supp_asia.s_suppkey
    ).select("l_orderkey", *money, "s_nationkey")
    cust_asia = cust.join(
        F.broadcast(dims), cust.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    o_red = orders.join(
        F.broadcast(cust_asia), orders.o_custkey == F.col("c_custkey")
    ).select("o_orderkey", "c_nationkey", "n_name")
    return (
        # equi-join on orderkey ONLY: a bare s_nationkey = c_nationkey —
        # whether in the join condition or as a post-join filter (Catalyst
        # pushes it back in) — becomes a second equi-key, the join then
        # requires hashpartitioning(orderkey, nationkey), and the fact
        # exchange the bucketing exists to kill comes back. Spelled as
        # (a - b) = 0 it is not extractable as a key, so it rides the
        # probe as a residual and the plan stays exchange-free
        # (pinned by test_q5_supplier_first_exchange_free).
        li2.join(
            o_red.hint("shuffle_hash"),
            (li2.l_orderkey == F.col("o_orderkey"))
            & ((F.col("s_nationkey") - F.col("c_nationkey")) == 0),
        )
        .groupBy("n_name")
        .agg(dsum_u(li2, "l_rev_u", REVENUE()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan+filter+global agg — the predicate-pushdown showcase."""
    li = load_table_derived(spark, sf_dir, "lineitem")
    return li.filter(
        day_bound(li, "l_shipdate", ">=", "1994-01-01")
        & day_bound(li, "l_shipdate", "<", "1995-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum_u(
            li, "l_edisc_u", F.col("l_extendedprice") * F.col("l_discount")
        ).alias("revenue")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: join + groupBy many keys + top-n.

    The aggregate runs on ``o_custkey`` ALONE, with the customer/nation
    attributes broadcast-joined onto the ~|customer|-sized agg output —
    equivalent because c_custkey is the customer PK (every grouped key
    functionally determines the other three output keys). This keeps the
    one unavoidable exchange (partial agg states re-keyed from the
    orderkey-bucketed join onto custkey) NARROW: (custkey, sum-state)
    longs instead of 4 keys including two strings, and the dim probes
    touch ~1.5M aggregated rows instead of 15M fact rows. Same shape the
    reference gets from its perfect-hash agg on the int key
    (duckdb-3.cpp:8480)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table_derived(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        li.filter(F.col("l_returnflag") == "R")
        # shuffle_hash: build from orders (the smaller side), skip both
        # sort-merge sorts — measured −15% at sf10; per-partition build
        # size is bounded by the shuffle partition count (AQE), so the
        # plan holds on a cluster. Both facts arrive orderkey-bucketed,
        # so this join itself is exchange-free.
        .join(
            orders.select("o_orderkey", "o_custkey").hint("shuffle_hash"),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_custkey")
        .agg(dsum_u(li, "l_rev_u", REVENUE()).alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
}

ORACLES = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {o_dsum('l_quantity')}                          AS sum_qty,
               {o_dsum('l_extendedprice')}                     AS sum_base_price,
               {o_dsum(O_REVENUE)}                             AS sum_disc_price,
               {o_dsum(O_REVENUE + ' * (1 + l_tax)')}          AS sum_charge,
               {o_davg('l_quantity')}                          AS avg_qty,
               {o_davg('l_extendedprice')}                     AS avg_price,
               {o_davg('l_discount')}                          AS avg_disc,
               count(*)                                        AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {o_dsum(O_REVENUE)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name, {o_dsum(O_REVENUE)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "q6_forecast_revenue": f"""
        SELECT {o_dsum('l_extendedprice * l_discount')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01'
          AND l_shipdate <  TIMESTAMP '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {o_dsum(O_REVENUE)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
}
