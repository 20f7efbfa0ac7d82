"""Bucketed co-located joins: same-bucketed tables must join without an
exchange, and results must equal the plain parquet join."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackspark.session import load_table
from quackspark.sources.bucketing import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_no_exchange_and_same_result(spark):
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    write_bucketed(li, "b_lineitem", "l_orderkey", 8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        "l_orderkey",
        8,
    )
    try:
        assert bucketed_join_is_shuffle_free(
            spark, "b_lineitem", "b_orders", "l_orderkey"
        )
        got = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"), "l_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").cast("decimal(18,6)").alias("qty"),
            )
            .collect()[0]
        )
        want = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").cast("decimal(18,6)").alias("qty"),
            )
            .collect()[0]
        )
        assert (got["n"], got["qty"]) == (want["n"], want["qty"])
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
