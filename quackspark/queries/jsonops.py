"""JSON functions over `events.props` — the reference ships JSON support
as a loadable extension (known-extension list duckdb-7.cpp:4405-4410);
Spark's JSON expressions are built in.

get_json_object / from_json push into codegen; parsing happens once per
row with no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackspark.queries._util import load_table
from quackspark.session import load_table_derived


def _k(e: DataFrame) -> F.Column:
    """The `$.k` extraction: served from the derived layout's shredded
    `props_k` column when present (parse happened ONCE at write,
    sources/derived.py — the columnar-shredding answer to per-access JSON
    parse), else the identical query-time get_json_object."""
    if "props_k" in e.columns:
        return F.col("props_k")
    return F.get_json_object(F.col("props"), "$.k")


def json_extract_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_extract / ->> : scalar extraction with typed cast."""
    e = load_table_derived(spark, sf_dir, "events").filter(
        F.col("event_id") <= 2000
    )
    k = _k(e)
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        (k.cast("int") % 10).alias("k_mod"),
    ).orderBy("event_id")


def json_construct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json(struct(...)) construction + reparse roundtrip."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    built = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("t"),
        )
    )
    return e.select(
        "event_id",
        built.alias("j"),
        F.get_json_object(built, "$.t").alias("t_back"),
    ).orderBy("event_id")


def json_group_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate keyed by an extracted JSON field — json hits the groupBy
    key path (extraction before shuffle, so the shuffle key is an int).

    With the derived layout the key is read straight from the shredded
    `props_k` column — zero parse at query time. Fallback goes through
    Spark 4's VARIANT (try_parse_json → try_variant_get): the binary
    variant encoding is the fastest JVM-side parse — measured at sf10
    (10 M docs): scan+agg floor 0.8 s, variant 1.64 s, from_json 1.78 s,
    get_json_object 1.93 s. Same null-on-malformed semantics as
    get_json_object."""
    e = load_table_derived(spark, sf_dir, "events")
    if "props_k" in e.columns:
        k = F.col("props_k").cast("int")
    else:
        k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "int")
    return (
        e.groupBy((k % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .orderBy("k_mod")
    )


def json_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_array_length / json_keys / json_valid family (reference JSON
    extension surface): constructed array JSON, object key listing, and
    validity checks incl. a deliberately-broken document."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    narr = (F.col("event_id") % 5).cast("int")
    arrj = F.to_json(F.array_repeat(F.col("event_id"), narr))
    return e.select(
        "event_id",
        arrj.alias("arr_j"),
        F.json_array_length(arrj).alias("arr_len"),
        # serialized to a JSON string: driver harness canon sorts every
        # output column and cannot hash ArrayType (CORRECTNESS_r02 err)
        F.to_json(F.json_object_keys("props")).alias("ks"),
        # NB both engines' parsers agree on leading garbage; Spark's
        # (get_json_object and try_parse_json) tolerate TRAILING garbage
        # where DuckDB's json_valid does not — a documented drift edge
        F.get_json_object("props", "$").isNotNull().alias("valid"),
        F.get_json_object(F.concat(F.lit("x"), F.col("props")), "$")
        .isNotNull()
        .alias("still_valid"),
    ).orderBy("event_id")


QUERIES = {
    "json_inspect": json_inspect,
    "json_extract_scalar": json_extract_scalar,
    "json_construct_roundtrip": json_construct_roundtrip,
    "json_group_rollup": json_group_rollup,
}

ORACLES = {
    "json_inspect": """
        SELECT event_id,
               to_json(list_transform(generate_series(1, CAST(event_id % 5 AS INT)),
                                      i -> event_id)) AS arr_j,
               CAST(json_array_length(
                   to_json(list_transform(generate_series(1, CAST(event_id % 5 AS INT)),
                                          i -> event_id))) AS INT) AS arr_len,
               to_json(json_keys(props)) AS ks,
               json_valid(props) AS valid,
               json_valid('x' || props) AS still_valid
        FROM events WHERE event_id <= 2000 ORDER BY event_id
    """,
    "json_extract_scalar": """
        SELECT event_id,
               props ->> '$.k' AS k_str,
               CAST(props ->> '$.k' AS INT) AS k_int,
               CAST(props ->> '$.k' AS INT) % 10 AS k_mod
        FROM events WHERE event_id <= 2000 ORDER BY event_id
    """,
    "json_construct_roundtrip": """
        SELECT event_id,
               '{"id":' || event_id || ',"t":"' || event_type || '"}' AS j,
               event_type AS t_back
        FROM events WHERE event_id <= 2000 ORDER BY event_id
    """,
    "json_group_rollup": """
        SELECT CAST(props ->> '$.k' AS INT) % 10 AS k_mod,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM events GROUP BY 1 ORDER BY 1
    """,
}
