"""Nested types: LIST/STRUCT/MAP + higher-order functions (reference UNNEST
duckdb-4.cpp:6130; nested function registration duckdb-5.cpp:16351-16375;
lambda support LogicalTypeId::LAMBDA duckdb.hpp:946).

Spark-first: ArrayType/StructType/MapType are 1:1 with LIST/STRUCT/MAP
(SURVEY.md §1.2), and Spark's higher-order functions (transform/filter/
aggregate/exists/zip_with) are the exact twin of DuckDB's list lambdas —
all JVM-side, codegen'd, no UDFs anywhere in this module.

Float-list parity note: embeddings are float32; every arithmetic lambda
casts elements to double FIRST so both engines do identical float64 math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.queries._util import load_table


def nested_unnest_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST with ordinality (posexplode) over embedding lists."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))


def nested_hof_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list_transform(l, x -> ...) — element-wise lambda."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    # double-list serialized to fixed-scale decimal strings: float JSON
    # rendering differs between engines, and the driver canon cannot hash
    # ArrayType columns (CORRECTNESS_r02 json_inspect)
    return emb.select(
        "vec_id",
        F.array_join(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 2 + 1, 6)
                .cast("decimal(18,6)")
                .cast("string"),
            ),
            ",",
        ).alias("scaled"),
    )


def nested_hof_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list_filter + cardinality + list_contains-ish exists()."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x.cast("double") > 0)).alias("n_pos"),
        F.exists("embedding", lambda x: x.cast("double") < -2.5).alias("has_low"),
    ).orderBy("vec_id")


def nested_hof_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list_aggregate (sequential left fold): squared L2 norm per vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            6,
        ).alias("norm_sq"),
    ).orderBy("vec_id")


def nested_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_slice/concat/contains/position/distinct/sort/flatten/sequence
    (duckdb-5.cpp:16351-16375) on exact integer arrays."""
    nation = load_table(spark, sf_dir, "nation")
    seq = F.sequence(F.lit(1), F.col("n_nationkey") % 5 + 3)
    # integer lists serialized with to_json (identical int rendering in both
    # engines): the driver canon cannot hash ArrayType columns
    return nation.select(
        "n_nationkey",
        F.to_json(seq).alias("seq"),
        F.to_json(F.slice(seq, 2, 3)).alias("sliced"),
        F.to_json(F.concat(seq, F.array(F.lit(99)))).alias("appended"),
        F.array_contains(seq, 4).alias("has4"),
        F.array_position(seq, 3).alias("pos3"),
        F.to_json(F.sort_array(F.array_distinct(F.concat(seq, seq)))).alias("dedup"),
        F.to_json(F.reverse(F.sort_array(seq))).alias("desc_sorted"),
        F.to_json(F.flatten(F.array(seq, seq))).alias("doubled"),
    ).orderBy("n_nationkey")


def nested_struct_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """struct_pack / struct_extract (duckdb-5.cpp:16352-16354)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    # struct serialized to JSON (bal as fixed-scale decimal so both engines
    # render the same digits): driver canon cannot hash dict-valued columns
    packed = F.struct(
        F.col("c_name").alias("name"),
        # string-typed so both engines quote it with identical digits
        # (DuckDB's to_json drops a DECIMAL's trailing zeros)
        F.col("c_acctbal").cast("decimal(18,2)").cast("string").alias("bal"),
    )
    return cust.select(
        "c_custkey",
        F.to_json(packed).alias("info"),
        F.col("c_acctbal").alias("bal_extracted"),
    )


def nested_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_from_entries / cardinality / element_at / map_keys
    (duckdb-5.cpp:16367-16370). Maps normalize to sorted entries for the
    engine-neutral comparison."""
    supp = load_table(spark, sf_dir, "supplier")
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("nation").alias("k"), F.col("s_nationkey").cast("long").alias("v")),
            F.struct(F.lit("suppkey").alias("k"), F.col("s_suppkey").alias("v")),
        )
    )
    return supp.select(
        "s_suppkey",
        # entries list serialized: driver canon cannot hash ArrayType columns
        F.to_json(F.map_entries(m)).alias("entries"),
        F.element_at(m, "nation").alias("nation_val"),
        F.size(m).alias("cardinality"),
    ).orderBy("s_suppkey")


def nested_explode_struct_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate rows into a list of structs, then UNNEST it back — the
    round-trip the reference's list()/unnest pair performs."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    packed = (
        orders.groupBy("o_custkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")))
            ).alias("orders_list")
        )
    )
    ex = packed.select("o_custkey", F.explode("orders_list").alias("o"))
    return ex.select("o_custkey", F.col("o.k").alias("o_orderkey"), F.col("o.p").alias("price"))


QUERIES = {
    "nested_unnest_explode": nested_unnest_explode,
    "nested_hof_transform": nested_hof_transform,
    "nested_hof_filter": nested_hof_filter,
    "nested_hof_aggregate": nested_hof_aggregate,
    "nested_array_funcs": nested_array_funcs,
    "nested_struct_pack": nested_struct_pack,
    "nested_map_funcs": nested_map_funcs,
    "nested_explode_struct_list": nested_explode_struct_list,
}

ORACLES = {
    "nested_unnest_explode": """
        SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings WHERE vec_id < 50
    """,
    "nested_hof_transform": """
        SELECT vec_id,
               array_to_string(
                   list_transform(embedding,
                       x -> CAST(CAST(round(CAST(x AS DOUBLE) * 2 + 1, 6)
                                      AS DECIMAL(18,6)) AS VARCHAR)),
                   ',') AS scaled
        FROM embeddings WHERE vec_id < 100
    """,
    "nested_hof_filter": """
        SELECT vec_id,
               len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0)) AS n_pos,
               len(list_filter(embedding, x -> CAST(x AS DOUBLE) < -2.5)) > 0 AS has_low
        FROM embeddings ORDER BY vec_id
    """,
    "nested_hof_aggregate": """
        SELECT vec_id,
               round(list_aggregate(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS norm_sq
        FROM embeddings ORDER BY vec_id
    """,
    "nested_array_funcs": """
        SELECT n_nationkey,
               to_json(range(1, n_nationkey % 5 + 4)) AS seq,
               to_json(range(1, n_nationkey % 5 + 4)[2:4]) AS sliced,
               to_json(list_concat(range(1, n_nationkey % 5 + 4), [99])) AS appended,
               list_contains(range(1, n_nationkey % 5 + 4), 4) AS has4,
               CAST(list_position(range(1, n_nationkey % 5 + 4), 3) AS BIGINT) AS pos3,
               to_json(list_sort(list_distinct(list_concat(range(1, n_nationkey % 5 + 4),
                                                   range(1, n_nationkey % 5 + 4))))) AS dedup,
               to_json(list_reverse(list_sort(range(1, n_nationkey % 5 + 4)))) AS desc_sorted,
               to_json(flatten([range(1, n_nationkey % 5 + 4),
                                range(1, n_nationkey % 5 + 4)])) AS doubled
        FROM nation ORDER BY n_nationkey
    """,
    "nested_struct_pack": """
        SELECT c_custkey,
               to_json({'name': c_name,
                        'bal': CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)}) AS info,
               struct_extract({'name': c_name, 'bal': c_acctbal}, 'bal') AS bal_extracted
        FROM customer WHERE c_custkey <= 200
    """,
    "nested_map_funcs": """
        SELECT s_suppkey,
               to_json([{'key': 'nation', 'value': CAST(s_nationkey AS BIGINT)},
                        {'key': 'suppkey', 'value': s_suppkey}]) AS entries,
               CAST(s_nationkey AS BIGINT) AS nation_val,
               2 AS cardinality
        FROM supplier ORDER BY s_suppkey
    """,
    "nested_explode_struct_list": """
        SELECT o_custkey, o_orderkey, o_totalprice AS price
        FROM orders WHERE o_custkey <= 20
    """,
}
