"""Window functions (reference PhysicalWindow duckdb-3.cpp:10800,
STREAMING_WINDOW duckdb-3.cpp:9543, frame machinery WindowSegmentTree
duckdb-internal.hpp:35971; function list duckdb.hpp:7423-7434).

Spark-first: Window.partitionBy(...).orderBy(...) with rowsBetween /
rangeBetween compiles to the same hash-partition → sort → per-partition
evaluation the reference performs; the shuffle key is the PARTITION BY, so at
100 TB each window is one shuffle and skew lives only in partition-key
cardinality (user_id / nationkey here — high-cardinality, safe).

Every ORDER BY in a window carries a unique tie-break column so row_number /
lead / lag are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quackspark.queries._util import DEC, load_table


def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/percent_rank/cume_dist/ntile in one pass.

    Ranks use a coarsened key (floor of acctbal/1000) so real ties exist.
    """
    cust = load_table(spark, sf_dir, "customer")
    coarse = F.floor(F.col("c_acctbal") / 1000)
    w_rank = Window.partitionBy("c_nationkey").orderBy(
        coarse.desc(), F.col("c_custkey").asc()
    )
    w_ties = Window.partitionBy("c_nationkey").orderBy(coarse.desc())
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w_rank).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.percent_rank().over(w_ties).alias("prnk"),
        F.cume_dist().over(w_ties).alias("cdist"),
        F.ntile(4).over(w_rank).alias("quartile"),
    )


def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag with offsets and defaults over per-user event timelines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.lead("event_type", 1, "NONE").over(w).alias("next_type"),
        F.lag("value", 2, 0.0).over(w).alias("lag2_value"),
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS UNBOUNDED PRECEDING running total (exact-decimal for order-proof
    prefix sums)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS 3 PRECEDING moving window aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias("mavg"),
    )


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN value PRECEDING AND CURRENT ROW (value-based frame)."""
    cust = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_custkey"))
        .rangeBetween(-100, Window.currentRow)
    )
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.count(F.lit(1)).over(w).alias("n_in_range"),
        F.sum(F.col("c_acctbal").cast(DEC)).over(w).cast("double").alias("bal_in_range"),
    )


def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value with explicit full-partition frame."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag+IGNORE NULLS semantics (FindNextStart masks, duckdb-3.cpp:10813):
    last non-error value seen before each event."""
    ev = load_table(spark, sf_dir, "events")
    val = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(val, ignorenulls=True).over(w).alias("last_good_value"),
    )


def window_agg_over_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain aggregate-as-window (share-of-partition pattern)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    qty_sum = F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") / qty_sum).alias("qty_share"),
    )


def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY-style top-3 per group (reference DISTINCT ON/TopN cousins)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "rn", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey", "rn")
    )


def distinct_on_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON (keys) keeps first row per key by explicit order
    (duckdb-4.cpp:9597) — the row_number()=1 rewrite."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


def window_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with an INTERVAL bound (WindowBoundary EXPR_PRECEDING in
    RANGE mode, duckdb-internal.hpp:3433-3443): per-user trailing-1-hour
    event count and value sum over event time. The DataFrame rangeBetween
    API is numeric-only, so the interval frame is expressed in SQL — same
    Catalyst window operator either way."""
    e = load_table(spark, sf_dir, "events")
    frame = (
        "PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
    )
    return e.select(
        "event_id",
        "user_id",
        F.expr(f"count(*) OVER ({frame})").alias("n_1h"),
        F.expr(
            f"CAST(sum(CAST(value AS DECIMAL(18,6))) OVER ({frame}) AS DOUBLE)"
        ).alias("sum_1h"),
    ).orderBy("event_id")


QUERIES = {
    "window_range_interval_frame": window_range_interval_frame,
    "window_rank_family": window_rank_family,
    "window_lead_lag": window_lead_lag,
    "window_running_sum": window_running_sum,
    "window_moving_avg": window_moving_avg,
    "window_range_frame": window_range_frame,
    "window_first_last_nth": window_first_last_nth,
    "window_ignore_nulls": window_ignore_nulls,
    "window_agg_over_partition": window_agg_over_partition,
    "window_topn_per_group": window_topn_per_group,
    "distinct_on_first_per_key": distinct_on_first_per_key,
}

ORACLES = {
    "window_range_interval_frame": """
        SELECT event_id, user_id,
               count(*) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP)
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                    AND CURRENT ROW) AS n_1h,
               CAST(sum(CAST(value AS DECIMAL(18,6)))
                        OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP)
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                    AND CURRENT ROW) AS DOUBLE) AS sum_1h
        FROM events ORDER BY event_id
    """,
    "window_rank_family": """
        SELECT c_custkey, c_nationkey,
           row_number()  OVER (PARTITION BY c_nationkey
                               ORDER BY floor(c_acctbal/1000) DESC, c_custkey ASC) AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist()    OVER w AS cdist,
           ntile(4)       OVER (PARTITION BY c_nationkey
                               ORDER BY floor(c_acctbal/1000) DESC, c_custkey ASC) AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY floor(c_acctbal/1000) DESC)
    """,
    "window_lead_lag": """
        SELECT event_id, user_id,
           lag(event_type, 1)          OVER w AS prev_type,
           lead(event_type, 1, 'NONE') OVER w AS next_type,
           lag(value, 2, 0.0)          OVER w AS lag2_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "window_running_sum": """
        SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders
    """,
    "window_moving_avg": """
        SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / count(*) OVER w AS mavg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    "window_range_frame": """
        SELECT c_custkey, c_nationkey,
           count(*) OVER w AS n_in_range,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) OVER w AS DOUBLE) AS bal_in_range
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey
                     RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
    """,
    "window_first_last_nth": """
        SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "window_ignore_nulls": """
        SELECT event_id, user_id,
           last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_good_value
        FROM events
    """,
    "window_agg_over_partition": """
        SELECT l_orderkey, l_linenumber,
           l_quantity / CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
                             OVER (PARTITION BY l_orderkey) AS DOUBLE) AS qty_share
        FROM lineitem
    """,
    "window_topn_per_group": """
        SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
          SELECT c_nationkey, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer) t
        WHERE rn <= 3 ORDER BY c_nationkey, rn
    """,
    "distinct_on_first_per_key": """
        SELECT o_custkey, o_orderkey, o_orderdate FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
          FROM orders) t
        WHERE rn = 1
    """,
}
