"""Salted join / aggregate must be row-identical to the plain forms —
the salt changes the shuffle layout, never the result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackspark.operators.skew import salted_aggregate, salted_join
from quackspark.session import load_table

SF = "/root/testdata/sf0.01"


def _sorted(df):
    return sorted(map(tuple, df.collect()), key=repr)


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_equals_plain_join(spark, how):
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    dim = (
        load_table(spark, SF, "customer")
        .select((F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment")
        .filter(F.col("user_id") < 100)  # leave some events unmatched
    )
    got = salted_join(ev, dim, on="user_id", how=how, salt=5)
    want = ev.join(dim, "user_id", how)
    assert sorted(got.columns) == sorted(want.columns)
    assert _sorted(got.select(*sorted(got.columns))) == _sorted(
        want.select(*sorted(want.columns))
    )


def test_salted_join_plan_shuffles_on_salt(spark):
    ev = load_table(spark, SF, "events").select("event_id", "user_id")
    dim = load_table(spark, SF, "nation").select(
        F.col("n_nationkey").alias("user_id"), "n_name"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = salted_join(ev, dim, on="user_id", salt=4)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "__salt" in plan  # the shuffle key includes the salt


def test_salted_aggregate_equals_plain(spark):
    li = load_table(spark, SF, "lineitem")
    got = salted_aggregate(
        li,
        "l_returnflag",
        salt=7,
        n=("count", "l_orderkey"),
        qty=("sum", "l_quantity"),
        lo=("min", "l_extendedprice"),
        hi=("max", "l_extendedprice"),
    )
    want = li.groupBy("l_returnflag").agg(
        F.count("l_orderkey").alias("n"),
        F.sum("l_quantity").alias("qty"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    g = {r["l_returnflag"]: r for r in got.collect()}
    for r in want.collect():
        s = g[r["l_returnflag"]]
        assert s["n"] == r["n"] and s["lo"] == r["lo"] and s["hi"] == r["hi"]
        assert abs(s["qty"] - r["qty"]) < 1e-6
