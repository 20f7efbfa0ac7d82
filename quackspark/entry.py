"""Driver contract implementation (see __spark_entry__.py at repo root)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quackspark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001."""
    from quackspark.queries.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
