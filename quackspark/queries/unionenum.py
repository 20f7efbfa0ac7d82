"""UNION-type and ENUM sugar (SURVEY.md §1.2/§2.8: UNION (duckdb.hpp:947)
→ struct{tag, members…}; ENUM (duckdb.hpp:944) → string + dictionary).

The reference's union functions (union_value/union_extract/union_tag,
duckdb-5.cpp:16351-16375) become struct operations; enums become a
dictionary array: encode = array_position, decode = element_at —
broadcastable constants, so enum comparisons stay codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.queries._util import load_table

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def union_value(tag: str, value: Column, members: dict[str, str]) -> Column:
    """union_value(tag := value) for a UNION with `members` name→type."""
    fields = [F.lit(tag).alias("tag")]
    for name, typ in members.items():
        fields.append(
            (value.cast(typ) if name == tag else F.lit(None).cast(typ)).alias(name)
        )
    return F.struct(*fields)


def union_tag(u: Column) -> Column:
    return u.getField("tag")


def union_extract(u: Column, member: str) -> Column:
    return u.getField(member)


def enum_code(c: Column, categories: list[str]) -> Column:
    """ENUM encode: 1-based dictionary position (0 → not a member)."""
    return F.array_position(F.array(*[F.lit(x) for x in categories]), c)


def enum_decode(code: Column, categories: list[str]) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in categories]), code.cast("int"))


def union_struct_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION(num INT, name VARCHAR): even keys carry num, odd carry name."""
    n = load_table(spark, sf_dir, "nation")
    members = {"num": "int", "name": "string"}
    u = F.when(
        F.col("n_nationkey") % 2 == 0,
        union_value("num", F.col("n_nationkey"), members),
    ).otherwise(union_value("name", F.col("n_name"), members))
    return n.select(
        "n_nationkey",
        # union struct serialized (nulls kept so both engines render the
        # inactive member): driver canon cannot hash dict-valued columns
        F.to_json(u, {"ignoreNullFields": "false"}).alias("u"),
        union_tag(u).alias("tag"),
        union_extract(u, "num").alias("as_num"),
        union_extract(u, "name").alias("as_name"),
    ).orderBy("n_nationkey")


def enum_dict_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENUM over c_mktsegment: encode to dictionary code, decode back,
    enum_first/enum_last (duckdb-5.cpp:11590) as constants."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    code = enum_code(F.col("c_mktsegment"), SEGMENTS)
    return c.select(
        "c_custkey",
        code.cast("int").alias("seg_code"),
        enum_decode(code, SEGMENTS).alias("seg_back"),
        F.lit(SEGMENTS[0]).alias("enum_first"),
        F.lit(SEGMENTS[-1]).alias("enum_last"),
    ).orderBy("c_custkey")


#: deliberately NON-alphabetical dictionary: insertion order ≠ string
#: order, so the ordering/comparison checks below are meaningful
ENUM_SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]


def enum_insertion_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENUM comparison semantics (duckdb.hpp:944): DuckDB compares and
    sorts enums by DICTIONARY INSERTION ORDER, not string order. The
    carrier comparison key is the 1-based insertion index (enum_code);
    the oracle casts to a real non-alphabetical ENUM and compares/sorts
    natively, pinning the carrier's order to the engine's."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    code = enum_code(F.col("c_mktsegment"), ENUM_SEGMENTS).cast("int")
    household = ENUM_SEGMENTS.index("HOUSEHOLD") + 1
    return c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        code.alias("seg_code"),
        (code < F.lit(household)).alias("before_household"),
    ).orderBy(code, "c_custkey")


def enum_range_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named ENUM types through the SQL frontend: CREATE TYPE … AS ENUM
    registers the dictionary, then the introspection family enum_first /
    enum_last / enum_range / enum_range_boundary (duckdb-5.cpp:11590)
    resolves against it at transpile time — including a dynamic
    (column-valued) boundary argument. Arrays serialize via to_json for
    the driver's hash canon."""
    from quackspark import sqlfront
    from quackspark.session import register_testdata_views

    register_testdata_views(spark, sf_dir)
    labels = ", ".join(f"'{s}'" for s in ENUM_SEGMENTS)
    sqlfront.sql(
        spark, f"CREATE OR REPLACE TYPE seg_t AS ENUM ({labels})"
    )
    return sqlfront.sql(
        spark,
        """
        SELECT c_custkey,
               enum_first(NULL::seg_t) AS e_first,
               enum_last(NULL::seg_t) AS e_last,
               to_json(enum_range(NULL::seg_t)) AS e_range,
               to_json(enum_range_boundary(NULL, c_mktsegment::seg_t))
                   AS e_upto,
               to_json(enum_range_boundary(c_mktsegment::seg_t, NULL))
                   AS e_from
        FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey
        """,
    )


QUERIES = {
    "union_struct_sugar": union_struct_sugar,
    "enum_dict_roundtrip": enum_dict_roundtrip,
    "enum_insertion_order": enum_insertion_order,
    "enum_range_fns": enum_range_fns,
}

_SEG_LIST = "[" + ", ".join(f"'{s}'" for s in SEGMENTS) + "]"
_ENUM_TYPE = "ENUM(" + ", ".join(f"'{s}'" for s in ENUM_SEGMENTS) + ")"
_ENUM_LIST = "[" + ", ".join(f"'{s}'" for s in ENUM_SEGMENTS) + "]"

ORACLES = {
    "union_struct_sugar": """
        WITH u AS (
            SELECT n_nationkey,
                   CASE WHEN n_nationkey % 2 = 0
                        THEN {'tag': 'num',
                              'num': CAST(n_nationkey AS INT),
                              'name': CAST(NULL AS VARCHAR)}
                        ELSE {'tag': 'name',
                              'num': CAST(NULL AS INT),
                              'name': n_name}
                   END AS u
            FROM nation
        )
        SELECT n_nationkey, to_json(u) AS u,
               u.tag AS tag,
               u.num AS as_num,
               u.name AS as_name
        FROM u ORDER BY n_nationkey
    """,
    "enum_dict_roundtrip": f"""
        SELECT c_custkey,
               CAST(list_position({_SEG_LIST}, c_mktsegment) AS INT) AS seg_code,
               {_SEG_LIST}[list_position({_SEG_LIST}, c_mktsegment)] AS seg_back,
               'AUTOMOBILE' AS enum_first,
               'MACHINERY' AS enum_last
        FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey
    """,
    "enum_insertion_order": f"""
        SELECT c_custkey,
               c_mktsegment AS seg,
               CAST(list_position({_ENUM_LIST}, c_mktsegment) AS INT)
                   AS seg_code,
               CAST(c_mktsegment AS {_ENUM_TYPE})
                   < CAST('HOUSEHOLD' AS {_ENUM_TYPE}) AS before_household
        FROM customer WHERE c_custkey <= 500
        ORDER BY CAST(c_mktsegment AS {_ENUM_TYPE}), c_custkey
    """,
    # single-statement oracle: the registered dictionary inlined as a list
    # (DuckDB's enum_range_boundary is inclusive both ends; NULL = open,
    # pinned by direct experiment against a real CREATE TYPE)
    "enum_range_fns": f"""
        SELECT c_custkey,
               'MACHINERY' AS e_first,
               'FURNITURE' AS e_last,
               to_json({_ENUM_LIST}) AS e_range,
               to_json(list_slice({_ENUM_LIST}, 1,
                       list_position({_ENUM_LIST}, c_mktsegment))) AS e_upto,
               to_json(list_slice({_ENUM_LIST},
                       list_position({_ENUM_LIST}, c_mktsegment),
                       {len(ENUM_SEGMENTS)})) AS e_from
        FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey
    """,
}
