"""EXPORT DATABASE / IMPORT DATABASE (reference: statement enum
`duckdb.hpp:12001-12002`, EXPORT writes schema.sql + load.sql + one data
file per table; IMPORT replays them).

Spark-first form: every registered (temp) view/table is written as its own
parquet/csv dataset under the target directory, plus a `schema.sql` of
CREATE VIEW statements and a `load.json` manifest (table → relative path +
format) that `import_database` replays into a fresh session. Parquet keeps
schema exactly; CSV round-trips through the same option mapping as COPY TO.

Scale: each table export is a distributed `df.write` (per-table
parallelism, no driver materialization); the manifest/schema files are
driver-side metadata only, like the reference's.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from quackspark.sources.csvio import copy_to, read_csv


def export_database(
    spark: SparkSession,
    target_dir: str,
    *,
    format: str = "parquet",
    tables: list[str] | None = None,
) -> dict[str, str]:
    """Write every (or the named) catalog table/view to `target_dir` and
    return the manifest {table: relative data path}."""
    if tables is None:
        # skip internal helper views (__qs_*: statement-scoped scratch)
        # and derived-layout twin tables (qs_drv_*: engine-written
        # physical copies of fixture data, sources/derived.py — exporting
        # them would duplicate data the user never created, and their
        # external locations may have been rebuilt/removed)
        tables = [
            t.name
            for t in spark.catalog.listTables()
            if not t.name.startswith(("__qs_", "qs_drv_"))
        ]
    os.makedirs(target_dir, exist_ok=True)
    manifest: dict[str, str] = {}
    ddl: list[str] = []
    for name in tables:
        rel = f"{name}.{format}"
        df = spark.table(name)
        copy_to(df, os.path.join(target_dir, rel), format=format)
        manifest[name] = rel
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
        ddl.append(f"CREATE OR REPLACE TEMP VIEW {name} AS SELECT * FROM data; -- ({cols})")
    with open(os.path.join(target_dir, "load.json"), "w") as fh:
        json.dump({"format": format, "tables": manifest}, fh, indent=2)
    with open(os.path.join(target_dir, "schema.sql"), "w") as fh:
        fh.write("\n".join(ddl) + "\n")
    return manifest


def import_database(spark: SparkSession, source_dir: str) -> list[str]:
    """Replay an exported directory: register each data file back as a temp
    view. Returns the imported table names."""
    with open(os.path.join(source_dir, "load.json")) as fh:
        meta = json.load(fh)
    fmt = meta["format"]
    for name, rel in meta["tables"].items():
        path = os.path.join(source_dir, rel)
        if fmt == "parquet":
            df = spark.read.parquet(path)
        else:
            df = read_csv(spark, path, header=True, auto_detect=True)
        df.createOrReplaceTempView(name)
    return list(meta["tables"])
