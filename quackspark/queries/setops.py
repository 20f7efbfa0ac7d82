"""Set operations (reference UNION duckdb-4.cpp:7803; EXCEPT/INTERSECT planned
as NOT-DISTINCT hash joins duckdb-4.cpp:10298-10334) plus GROUPING SETS /
ROLLUP / CUBE (native in both engines).

Spark-first: union/exceptAll/intersectAll are native DataFrame ops; set
semantics (DISTINCT) compile to hash aggregation — the same physical shape as
the reference, executed as a shuffle on all columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.queries._util import dsum, load_table, o_dsum


def _buckets(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping multisets of (nationkey, acctbal-bucket)."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 0).select(
        "c_nationkey", F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket")
    )
    b = cust.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select(
        "c_nationkey", F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket")
    )
    return a, b


_O_A = "SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket FROM customer WHERE c_acctbal > 0"
_O_B = "SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')"


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _buckets(spark, sf_dir)
    return a.unionAll(b)


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _buckets(spark, sf_dir)
    return a.union(b).distinct()


def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _buckets(spark, sf_dir)
    return a.exceptAll(b).distinct()


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _buckets(spark, sf_dir)
    return a.exceptAll(b)


def set_intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _buckets(spark, sf_dir)
    return a.intersect(b)


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _buckets(spark, sf_dir)
    return a.intersectAll(b)


def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with differing column order (reference UNION binds by
    position; by-name is the robust distributed idiom)."""
    cust = load_table(spark, sf_dir, "customer")
    x = cust.select("c_custkey", "c_nationkey").filter(F.col("c_custkey") <= 100)
    y = cust.select("c_nationkey", "c_custkey").filter(F.col("c_custkey") > 1400)
    return x.unionByName(y).orderBy("c_custkey")


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity").alias("qty"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .select("o_orderstatus", "o_orderpriority", "n", "total")
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (native syntax both engines)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("qs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM qs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


QUERIES = {
    "set_union_all": set_union_all,
    "set_union_distinct": set_union_distinct,
    "set_except_distinct": set_except_distinct,
    "set_except_all": set_except_all,
    "set_intersect_distinct": set_intersect_distinct,
    "set_intersect_all": set_intersect_all,
    "set_union_by_name": set_union_by_name,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
}

ORACLES = {
    "set_union_all": f"({_O_A}) UNION ALL ({_O_B})",
    "set_union_distinct": f"({_O_A}) UNION ({_O_B})",
    "set_except_distinct": f"SELECT DISTINCT * FROM (({_O_A}) EXCEPT ALL ({_O_B}))",
    "set_except_all": f"({_O_A}) EXCEPT ALL ({_O_B})",
    "set_intersect_distinct": f"({_O_A}) INTERSECT ({_O_B})",
    "set_intersect_all": f"({_O_A}) INTERSECT ALL ({_O_B})",
    "set_union_by_name": """
        SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey <= 100
        UNION ALL
        SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey > 1400
        ORDER BY c_custkey
    """,
    "agg_rollup": f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               {o_dsum('l_quantity')} AS qty,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg_cube": f"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               {o_dsum('o_totalprice')} AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "agg_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
}
