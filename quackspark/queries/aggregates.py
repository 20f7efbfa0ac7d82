"""Aggregate-function long tail (reference registration lists
duckdb-4.cpp:14860-14880 distributive, duckdb-4.cpp:12084-12096 algebraic,
duckdb-5.cpp:12-17 holistic, duckdb-5.cpp:1246-1249 nested,
duckdb-5.cpp:1659-1669 regression; modifiers FILTER/DISTINCT/ORDER-BY
duckdb-internal.hpp:32937, duckdb-5.cpp:1680).

All run as single-shuffle hash aggregations (partial+final, map-side combine
— the Spark twin of the reference's RadixPartitionedHashTable
duckdb-internal.hpp:32846). Stats outputs are wrapped in round() AT THE SAME
DIGITS ON BOTH SIDES because Welford-merge order differs between engines in
the last ~3 ulps; the decimal path covers exact sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.functions.compat import duck_kurtosis, duck_skewness, list_product_sorted, sem
from quackspark.queries._util import DEC, davg, dsum, load_table, o_davg, o_dsum


def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNGROUPED_AGGREGATE (duckdb-3.cpp:9763): global agg, no keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        dsum("l_quantity").alias("total_qty"),
        davg("l_extendedprice").alias("avg_price"),
    )


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates (DistinctAggregateData duckdb-internal.hpp:32937)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.sum_distinct(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_distinct_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    ).orderBy("l_returnflag")


def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER (WHERE ...) modifier → when()-guarded aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 300000
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.when(big, 1)).alias("n_big"),
        dsum(F.when(big, F.col("o_totalprice")).otherwise(F.lit(None))).alias("big_total"),
        F.count(F.lit(1)).alias("n_all"),
    ).orderBy("o_orderstatus")


def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_min/arg_max (duckdb-4.cpp:14877) → min_by/max_by, struct-tiebroken
    so the answer is unique even with duplicate prices."""
    orders = load_table(spark, sf_dir, "orders")
    by_max = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    by_min = F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("neg"))
    return orders.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", by_max).alias("biggest_order"),
        F.min_by("o_orderkey", by_min).alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    ).orderBy("o_orderstatus")


def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or (duckdb-4.cpp:14875)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.bool_and(F.col("l_discount") < 0.11).alias("all_low_disc"),
        F.bool_or(F.col("l_quantity") >= 50).alias("any_full_qty"),
        F.bool_and(F.col("l_tax") > 0.079).alias("all_high_tax"),
    ).orderBy("l_linestatus")


def agg_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_and / bit_or / bit_xor (duckdb-4.cpp:14868-14870)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and(F.col("user_id")).alias("band"),
        F.bit_or(F.col("user_id")).alias("bor"),
        F.bit_xor(F.col("user_id")).alias("bxor"),
    ).orderBy("event_type")


def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_agg(x, sep ORDER BY y) (duckdb-4.cpp:14873 + SortedAggregateBindData
    duckdb-5.cpp:1680): collect→sort→join, the order-stable distributed form."""
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("n_nationkey", "n_name"))),
                    lambda s: s.n_name,
                ),
                ",",
            ).alias("nations_csv")
        )
        .orderBy("n_regionkey")
    )


def agg_collect_list_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list(x ORDER BY x) aggregate (duckdb-5.cpp:1246)."""
    supp = load_table(spark, sf_dir, "supplier")
    # list serialized to a JSON string: the driver harness canon sorts every
    # output column and cannot hash ArrayType (CORRECTNESS_r02 json_inspect)
    return supp.groupBy("s_nationkey").agg(
        F.to_json(F.array_sort(F.collect_list("s_suppkey"))).alias("supp_keys"),
        F.count(F.lit(1)).alias("n"),
    ).orderBy("s_nationkey")


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram(x) (duckdb-5.cpp:1249) normalized to sorted (key,cnt) structs
    — engine-neutral form of its MAP result."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("o_orderstatus")
        .agg(
            F.to_json(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("o_orderpriority").alias("key"), F.col("cnt"))
                    )
                )
            ).alias("hist")
        )
        .orderBy("o_orderstatus")
    )


def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode(x) (duckdb-5.cpp:14) with the deterministic tie rule `smallest
    value among most frequent` spelled out (engine tie order differs)."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy("l_returnflag")
        .agg(F.max_by("l_quantity", F.struct(F.col("cnt"), (-F.col("l_quantity")).alias("nv"))).alias("mode_qty"))
        .orderBy("l_returnflag")
    )


def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantile_cont / quantile_disc / median (duckdb-5.cpp:12-16)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("p25"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("p75"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias("median_disc"),
    ).orderBy("l_returnflag")


def agg_stats_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance family (duckdb-4.cpp:12084-12096), rounded identically
    on both sides (merge-order ulps)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_samp"),
        F.round(F.stddev_pop("l_extendedprice"), 4).alias("sd_pop"),
        F.round(F.var_samp("l_extendedprice"), 1).alias("var_samp"),
        F.round(F.var_pop("l_extendedprice"), 1).alias("var_pop"),
        F.round(sem("l_extendedprice"), 6).alias("sem"),
    ).orderBy("l_returnflag")


def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skewness/kurtosis with DuckDB's sample-adjusted definitions
    (compat.duck_skewness / duck_kurtosis)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(duck_skewness("l_extendedprice"), 8).alias("skew"),
        F.round(duck_kurtosis("l_extendedprice"), 8).alias("kurt"),
    ).orderBy("l_linestatus")


def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / covar_samp / covar_pop (duckdb-4.cpp:12084-12096)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 8).alias("qp_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qp_covar"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("qp_covar_pop"),
    ).orderBy("l_returnflag")


def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regr_* family (duckdb-5.cpp:1659-1669) — Spark 3.4+ built-ins."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("r_count"),
        F.round(F.regr_slope(y, x), 6).alias("r_slope"),
        F.round(F.regr_intercept(y, x), 4).alias("r_intercept"),
        F.round(F.regr_r2(y, x), 8).alias("r_r2"),
        F.round(F.regr_avgx(y, x), 6).alias("r_avgx"),
        F.round(F.regr_avgy(y, x), 4).alias("r_avgy"),
        F.round(F.regr_sxx(y, x), 2).alias("r_sxx"),
        F.round(F.regr_sxy(y, x), 2).alias("r_sxy"),
    ).orderBy("l_returnflag")


def agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """product() (duckdb-4.cpp:14874) via order-stable sorted fold."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 640)
    return li.groupBy("l_orderkey").agg(
        F.round(list_product_sorted(F.collect_list(1 + F.col("l_tax"))), 8).alias("tax_factor"),
        F.count(F.lit(1)).alias("n_lines"),
    ).orderBy("l_orderkey")


def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entropy(x) (duckdb-4.cpp:14876): Shannon entropy (log2) from value
    counts — two-level aggregation, map-side combinable at both levels."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("user_id")
        .agg(
            F.round(
                F.log2(F.sum("c"))
                - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
                8,
            ).alias("type_entropy")
        )
        .orderBy("user_id")
    )


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct — HyperLogLog (duckdb-4.cpp:12128, vendored
    duckdb-hyperloglog.cpp). Sketches differ across engines ⇒ rows-only check;
    the exact companion (agg_count_distinct) is the hash-matched one."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    ).orderBy("l_returnflag")


def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_quantile — t-digest in the reference (duckdb-5.cpp:19-40),
    KLL-style sketch in Spark ⇒ rows-only check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx_median"),
    ).orderBy("l_returnflag")


def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation (reference holistic registration,
    duckdb-5.cpp:12-17 MadFunction; the frontend refuses inline mad() —
    this IS the faithful plan). Two rounds: per-group continuous median
    (shuffle 1), broadcast the tiny medians table back, per-group median
    of |x − m| (shuffle 2) — the two passes a holistic-of-holistic costs
    on any engine, with the group-count-sized intermediate broadcast."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5)").alias("m")
    ).withColumnRenamed("o_orderstatus", "__mad_key")
    # null-safe key equality: a NULL-key group still gets its median row
    # (a plain equi-join would silently drop it)
    return (
        o.join(F.broadcast(med), o["o_orderstatus"].eqNullSafe(F.col("__mad_key")))
        .groupBy("o_orderstatus")
        .agg(
            F.expr(
                "percentile(abs(CAST(o_totalprice AS DOUBLE) - m), 0.5)"
            ).alias("mad_price")
        )
        .orderBy("o_orderstatus")
    )


QUERIES = {
    "agg_global": agg_global,
    "agg_count_distinct": agg_count_distinct,
    "agg_filter_clause": agg_filter_clause,
    "agg_minmax_by": agg_minmax_by,
    "agg_bool": agg_bool,
    "agg_bit": agg_bit,
    "agg_string_agg": agg_string_agg,
    "agg_collect_list_sorted": agg_collect_list_sorted,
    "agg_histogram": agg_histogram,
    "agg_mode_deterministic": agg_mode_deterministic,
    "agg_quantiles": agg_quantiles,
    "agg_stats_family": agg_stats_family,
    "agg_skew_kurt": agg_skew_kurt,
    "agg_corr_covar": agg_corr_covar,
    "agg_regression": agg_regression,
    "agg_product": agg_product,
    "agg_entropy": agg_entropy,
    "agg_approx_distinct": agg_approx_distinct,
    "agg_approx_quantile": agg_approx_quantile,
    "agg_mad": agg_mad,
}

ORACLES = {
    "agg_mad": """
        SELECT o_orderstatus,
               mad(CAST(o_totalprice AS DOUBLE)) AS mad_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "agg_global": f"""
        SELECT count(*) AS n, min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
               min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
               {o_dsum('l_quantity')} AS total_qty, {o_davg('l_extendedprice')} AS avg_price
        FROM lineitem
    """,
    "agg_count_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_distinct_qty,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "agg_filter_clause": """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                    FILTER (WHERE o_totalprice > 300000) AS DOUBLE) AS big_total,
               count(*) AS n_all
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "agg_minmax_by": """
        SELECT o_orderstatus,
               max(CASE WHEN rb = 1 THEN o_orderkey END) AS biggest_order,
               max(CASE WHEN rs = 1 THEN o_orderkey END) AS smallest_order,
               max(o_totalprice) AS max_price
        FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_totalprice DESC, o_orderkey DESC) AS rb,
                row_number() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_totalprice ASC, o_orderkey DESC) AS rs
              FROM orders) t
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "agg_bool": """
        SELECT l_linestatus,
               bool_and(l_discount < 0.11) AS all_low_disc,
               bool_or(l_quantity >= 50) AS any_full_qty,
               bool_and(l_tax > 0.079) AS all_high_tax
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "agg_bit": """
        SELECT event_type, bit_and(user_id) AS band, bit_or(user_id) AS bor,
               bit_xor(user_id) AS bxor
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "agg_string_agg": """
        SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_nationkey) AS nations_csv
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    "agg_collect_list_sorted": """
        SELECT s_nationkey, to_json(list(s_suppkey ORDER BY s_suppkey)) AS supp_keys,
               count(*) AS n
        FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
    """,
    "agg_histogram": """
        SELECT o_orderstatus,
               to_json(list({'key': o_orderpriority, 'cnt': cnt}
                            ORDER BY o_orderpriority)) AS hist
        FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
              FROM orders GROUP BY 1, 2)
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "agg_mode_deterministic": """
        SELECT l_returnflag,
               max(CASE WHEN rn = 1 THEN l_quantity END) AS mode_qty
        FROM (SELECT l_returnflag, l_quantity,
                row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY cnt DESC, l_quantity ASC) AS rn
              FROM (SELECT l_returnflag, l_quantity, count(*) AS cnt
                    FROM lineitem GROUP BY 1, 2) c) t
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "agg_quantiles": """
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5)  AS median_price,
               quantile_cont(l_extendedprice, 0.25) AS p25,
               quantile_cont(l_extendedprice, 0.75) AS p75,
               quantile_disc(l_extendedprice, 0.5)  AS median_disc
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "agg_stats_family": """
        SELECT l_returnflag,
               round(stddev_samp(l_extendedprice), 4) AS sd_samp,
               round(stddev_pop(l_extendedprice), 4)  AS sd_pop,
               round(var_samp(l_extendedprice), 1)    AS var_samp,
               round(var_pop(l_extendedprice), 1)     AS var_pop,
               round(sem(l_extendedprice), 6)         AS sem
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "agg_skew_kurt": """
        SELECT l_linestatus,
               round(skewness(l_extendedprice), 8) AS skew,
               round(kurtosis(l_extendedprice), 8) AS kurt
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "agg_corr_covar": """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 8)       AS qp_corr,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS qp_covar,
               round(covar_pop(l_quantity, l_extendedprice), 4)  AS qp_covar_pop
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "agg_regression": """
        SELECT l_returnflag,
               regr_count(l_extendedprice, l_quantity)               AS r_count,
               round(regr_slope(l_extendedprice, l_quantity), 6)     AS r_slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4) AS r_intercept,
               round(regr_r2(l_extendedprice, l_quantity), 8)        AS r_r2,
               round(regr_avgx(l_extendedprice, l_quantity), 6)      AS r_avgx,
               round(regr_avgy(l_extendedprice, l_quantity), 4)      AS r_avgy,
               round(regr_sxx(l_extendedprice, l_quantity), 2)       AS r_sxx,
               round(regr_sxy(l_extendedprice, l_quantity), 2)       AS r_sxy
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "agg_product": """
        SELECT l_orderkey,
               round(list_aggregate(list_sort(list(1 + l_tax)), 'product'), 8) AS tax_factor,
               count(*) AS n_lines
        FROM lineitem WHERE l_orderkey <= 640
        GROUP BY l_orderkey ORDER BY l_orderkey
    """,
    "agg_entropy": """
        SELECT user_id,
               round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 8) AS type_entropy
        FROM (SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2)
        GROUP BY user_id ORDER BY user_id
    """,
}
