"""Catalog introspection table functions (reference: `duckdb_tables()`,
`duckdb_views()`, `duckdb_schemas()`, `duckdb_columns()`, `duckdb_functions()`
and SQLite-compat `pragma_table_info`, duckdb-6.cpp:14150-14176) mapped onto
`spark.catalog`, returned as DataFrames so they compose with any query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def duckdb_tables(spark: SparkSession) -> DataFrame:
    """Tables/views visible in the current catalog."""
    rows = [
        (t.catalog, t.namespace[0] if t.namespace else None, t.name,
         t.tableType, t.isTemporary)
        for t in spark.catalog.listTables()
    ]
    return spark.createDataFrame(
        rows,
        "catalog_name string, schema_name string, table_name string, "
        "table_type string, temporary boolean",
    )


def duckdb_views(spark: SparkSession) -> DataFrame:
    return duckdb_tables(spark).filter("temporary OR table_type = 'VIEW'")


def duckdb_schemas(spark: SparkSession) -> DataFrame:
    rows = [(d.catalog, d.name) for d in spark.catalog.listDatabases()]
    return spark.createDataFrame(rows, "catalog_name string, schema_name string")


def duckdb_columns(spark: SparkSession, table: str) -> DataFrame:
    """Column metadata for one table (the reference's duckdb_columns filtered,
    also pragma table_info)."""
    rows = [
        (table, i, c.name, c.dataType, c.nullable)
        for i, c in enumerate(spark.catalog.listColumns(table))
    ]
    return spark.createDataFrame(
        rows,
        "table_name string, column_index int, column_name string, "
        "data_type string, is_nullable boolean",
    )


def duckdb_functions(spark: SparkSession) -> DataFrame:
    """Registered function inventory (built-ins + ours)."""
    rows = [(f.name, f.isTemporary) for f in spark.catalog.listFunctions()]
    return spark.createDataFrame(rows, "function_name string, temporary boolean")
