"""Subquery forms: EXISTS / NOT EXISTS / IN / NOT IN (tri-valued) / scalar /
correlated.

The reference plans these as MARK and SINGLE joins after binder-side
decorrelation (Binder::PlanSubquery duckdb-9.cpp:1046, DELIM_JOIN
duckdb-3.cpp:14411, MARK join duckdb.hpp:13908). In Spark we never plan those
ourselves: the subquery is written in Spark SQL and Catalyst's
RewritePredicateSubquery / RewriteCorrelatedScalarSubquery produce
ExistenceJoin / scalar-subquery plans natively (SURVEY.md §2.1). DataFrame
variants use semi/anti joins + broadcast aggregates — the decorrelated form,
declared directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.queries._util import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(f"sq_{n}")


def subq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM sq_customer
        WHERE EXISTS (SELECT 1 FROM sq_orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 440000)
        """
    )


def subq_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT count(*) AS n FROM sq_customer
        WHERE NOT EXISTS (SELECT 1 FROM sq_orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 440000)
        """
    )


def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM sq_part
        WHERE p_partkey IN (SELECT l_partkey FROM sq_lineitem WHERE l_quantity >= 49)
        ORDER BY p_partkey
        """
    )


def subq_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT count(*) AS n_unmoved FROM sq_part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM sq_lineitem WHERE l_quantity >= 45)
        """
    )


def subq_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN against a set containing NULL ⇒ empty result (tri-valued logic,
    the MARK-join NULL case duckdb.hpp:13908)."""
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT count(*) AS n FROM (
          SELECT p_partkey FROM sq_part
          WHERE p_partkey NOT IN
            (SELECT nullif(l_partkey, 7) FROM sq_lineitem WHERE l_quantity >= 45)
        )
        """
    )


def subq_scalar_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price (SINGLE-join class)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT count(*) AS n_above_avg FROM sq_orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM sq_orders)
        """
    )


def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance — correlated scalar
    subquery; Catalyst decorrelates to an aggregate+join (DELIM_JOIN class)."""
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal FROM sq_customer c1
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM sq_customer c2
                           WHERE c2.c_nationkey = c1.c_nationkey)
        ORDER BY c_custkey
        """
    )


def subq_in_dataframe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same IN semantics expressed Spark-first: broadcast left-semi join."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    movers = li.filter(F.col("l_quantity") >= 49).select(
        F.col("l_partkey").alias("p_partkey")
    )
    return (
        part.join(movers, "p_partkey", "left_semi")
        .select("p_partkey", "p_retailprice")
        .orderBy("p_partkey")
    )


QUERIES = {
    "subq_exists": subq_exists,
    "subq_not_exists": subq_not_exists,
    "subq_in": subq_in,
    "subq_not_in": subq_not_in,
    "subq_not_in_null": subq_not_in_null,
    "subq_scalar_uncorrelated": subq_scalar_uncorrelated,
    "subq_scalar_correlated": subq_scalar_correlated,
    "subq_in_dataframe": subq_in_dataframe,
}

ORACLES = {
    "subq_exists": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 440000)
    """,
    "subq_not_exists": """
        SELECT count(*) AS n FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 440000)
    """,
    "subq_in": """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        ORDER BY p_partkey
    """,
    "subq_not_in": """
        SELECT count(*) AS n_unmoved FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
    """,
    "subq_not_in_null": """
        SELECT count(*) AS n FROM (
          SELECT p_partkey FROM part
          WHERE p_partkey NOT IN
            (SELECT nullif(l_partkey, 7) FROM lineitem WHERE l_quantity >= 45)
        )
    """,
    "subq_scalar_uncorrelated": """
        SELECT count(*) AS n_above_avg FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
    "subq_scalar_correlated": """
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer c1
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c1.c_nationkey)
        ORDER BY c_custkey
    """,
    "subq_in_dataframe": """
        SELECT p_partkey, p_retailprice FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        ORDER BY p_partkey
    """,
}
