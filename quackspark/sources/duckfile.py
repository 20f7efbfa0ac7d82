"""Native .duckdb database files — closing the "can't open an existing
DuckDB file" gap (reference single-file storage: machinery
duckdb-internal.hpp §storage, checkpoint fn duckdb-6.cpp:9490; ATTACH
statement duckdb.hpp:11990).

Design, Spark-first: the single-file format is inherently single-node —
one file, one page cache, no split points — so there is nothing to
distribute about the FILE itself. The bridge therefore opens it once
(read-only, via the embedded engine that defines the format), streams
every table out as Arrow record batches, and lands each as a splittable
parquet table under the attach alias. From that point on everything is
ordinary distributed Spark: column pruning, predicate pushdown,
row-group splits, stats. Views stored in the file are materialized the
same way (their defining SQL targets the embedded engine's dialect and
has already been resolved by it — materialization is the honest
translation, not a re-parse).

A 100 TB corpus would never live in a .duckdb file; this is a migration
ramp for the reference's users, sized accordingly: batches stream
through the driver once at ATTACH time (bounded memory — one record
batch at a time), never per-query.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

BATCH_ROWS = 1 << 16


def list_duckdb_tables(path: str) -> list[tuple[str, str]]:
    """(name, kind) for every main-schema table/view in the file."""
    import duckdb

    con = duckdb.connect(path, read_only=True)
    try:
        rows = con.execute(
            "SELECT table_name, table_type FROM information_schema.tables "
            "WHERE table_schema = 'main' ORDER BY table_name"
        ).fetchall()
        return [(n, "view" if "VIEW" in k.upper() else "table") for n, k in rows]
    finally:
        con.close()


def _stream_table_to_parquet(con, table: str, out_dir: str) -> int:
    """SELECT * streamed out as record batches → one parquet file per
    ~BATCH_ROWS rows (splittable for Spark, bounded driver memory)."""
    import shutil

    import pyarrow.parquet as pq

    # A re-ATTACH of the same alias must not mix old part files with new
    # ones: if the source table shrank, leftover part-NNNNN.parquet from
    # the prior attach would silently be read alongside the fresh files.
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    reader = con.execute(f'SELECT * FROM "{table}"').fetch_record_batch(BATCH_ROWS)
    n = 0
    writer = None
    writer_rows = 0
    try:
        for batch in reader:
            if writer is None or writer_rows >= 4 * BATCH_ROWS:
                if writer is not None:
                    writer.close()
                writer = pq.ParquetWriter(
                    os.path.join(out_dir, f"part-{n:05d}.parquet"), batch.schema
                )
                writer_rows = 0
                n += 1
            writer.write_batch(batch)
            writer_rows += batch.num_rows
    finally:
        if writer is not None:
            writer.close()
    if n == 0:
        # empty table: write a zero-row file so the schema survives
        empty = con.execute(f'SELECT * FROM "{table}" LIMIT 0').arrow()
        pq.write_table(empty, os.path.join(out_dir, "part-00000.parquet"))
    return n


def attach_duckdb_file(
    spark: SparkSession, path: str, alias: str
) -> list[str]:
    """ATTACH 'file.duckdb' AS alias → a Spark database of external
    parquet tables (alias.t queryable immediately). Returns table names."""
    import duckdb

    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "/tmp"
    base = os.path.join(wh, f"{alias.lower()}__duckfile")
    q_alias = "`" + alias.replace("`", "``") + "`"
    # Re-ATTACH without an intervening DETACH must not leave tables that
    # were dropped from the .duckdb file serving stale parquet: start
    # from an empty alias database, exactly as DETACH would leave it.
    spark.sql(f"DROP DATABASE IF EXISTS {q_alias} CASCADE")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {q_alias}")
    con = duckdb.connect(path, read_only=True)
    names: list[str] = []
    taken: set[str] = set()
    try:
        for name, _kind in list_duckdb_tables(path):
            # DuckDB table names may contain spaces/dashes (legal when
            # quoted there); Spark's catalog only accepts [A-Za-z0-9_]
            # even backtick-quoted — sanitize deterministically, suffix
            # on collision. Reserved words survive via backticks.
            safe = re.sub(r"[^A-Za-z0-9_]", "_", name) or "_"
            base_safe, i = safe, 2
            while safe.lower() in taken:
                safe = f"{base_safe}_{i}"
                i += 1
            taken.add(safe.lower())
            out = os.path.join(base, safe.lower())
            if "'" in out:
                raise ValueError(
                    f"attach location {out!r} contains a single quote — "
                    "unsupported in a Spark LOCATION literal"
                )
            _stream_table_to_parquet(con, name, out)
            q_name = f"`{safe}`"
            spark.sql(f"DROP TABLE IF EXISTS {q_alias}.{q_name}")
            spark.sql(
                f"CREATE TABLE {q_alias}.{q_name} USING parquet LOCATION '{out}'"
            )
            names.append(safe)
    finally:
        con.close()
    return names
