"""Sources/sinks roundtrips: COPY TO csv/parquet then read back with
read_csv option parity, differential-checked against DuckDB reading the
very same files (the §2.2 surface, verified like any other operator).
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from quackspark.queries._util import load_table
from quackspark.sources import copy_to, from_path, read_csv

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def tmpdir():
    with tempfile.TemporaryDirectory(prefix="qs_sources_") as d:
        yield d


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_csv_roundtrip_with_options(spark, tmpdir):
    nation = load_table(spark, SF, "nation")
    path = os.path.join(tmpdir, "nation_csv")
    copy_to(nation, path, format="csv", header=True, delim="|")
    back = read_csv(
        spark,
        path,
        columns={"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
        header=True,
        delim="|",
    )
    assert _sorted_rows(back, "n_nationkey") == _sorted_rows(nation, "n_nationkey")


def test_csv_duckdb_agrees(spark, tmpdir):
    supp = load_table(spark, SF, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    path = os.path.join(tmpdir, "supp_csv")
    copy_to(supp, path, format="csv", header=True)
    got = duckdb.sql(
        f"SELECT count(*), sum(s_suppkey), round(sum(s_acctbal), 3) "
        f"FROM read_csv_auto('{path}/*.csv')"
    ).fetchone()
    row = supp.agg(
        F.count(F.lit(1)),
        F.sum("s_suppkey"),
        F.round(F.sum(F.col("s_acctbal").cast("decimal(18,6)")).cast("double"), 3),
    ).collect()[0]
    assert got == tuple(row)


def test_partitioned_parquet_prunes(spark, tmpdir):
    orders = load_table(spark, SF, "orders")
    path = os.path.join(tmpdir, "orders_part")
    copy_to(
        orders.withColumn("status", F.col("o_orderstatus")),
        path,
        format="parquet",
        partition_by=["status"],
    )
    back = spark.read.parquet(path).filter(F.col("status") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(status" in plan, plan[:500]
    expect = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expect


def test_compressed_csv(spark, tmpdir):
    region = load_table(spark, SF, "region")
    path = os.path.join(tmpdir, "region_gz")
    copy_to(region, path, format="csv", compression="gzip")
    back = read_csv(
        spark, path, columns={"r_regionkey": "int", "r_name": "string"}, header=True
    )
    assert back.count() == region.count()


def test_timestampformat_translation(spark, tmpdir):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderdate").limit(50)
    path = os.path.join(tmpdir, "orders_fmt")
    copy_to(
        orders.withColumn(
            "o_orderdate", F.date_format("o_orderdate", "dd/MM/yyyy HH:mm:ss")
        ),
        path,
        format="csv",
    )
    back = read_csv(
        spark,
        path,
        columns={"o_orderkey": "bigint", "o_orderdate": "timestamp"},
        header=True,
        timestampformat="%d/%m/%Y %H:%M:%S",
    )
    assert _sorted_rows(back, "o_orderkey") == _sorted_rows(orders, "o_orderkey")


def test_replacement_scan_dispatch(spark, tmpdir):
    nation = load_table(spark, SF, "nation")
    csv_path = os.path.join(tmpdir, "rs_nation_csv")
    copy_to(nation, csv_path, format="csv")
    got = from_path(
        spark,
        f"{csv_path}/*.csv",
        columns={"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    )
    assert got.count() == 25
    pq = from_path(spark, f"{SF}/nation.parquet")
    assert pq.count() == 25


def test_export_import_database_roundtrip(spark, tmp_path):
    """EXPORT DATABASE → fresh view names → IMPORT DATABASE restores
    identical contents (parquet exact roundtrip)."""
    from quackspark.sources.exportdb import export_database, import_database

    nation = load_table(spark, "/root/testdata/sf0.01", "nation")
    region = load_table(spark, "/root/testdata/sf0.01", "region")
    nation.createOrReplaceTempView("exp_nation")
    region.createOrReplaceTempView("exp_region")
    target = str(tmp_path / "exported_db")
    manifest = export_database(
        spark, target, tables=["exp_nation", "exp_region"]
    )
    assert set(manifest) == {"exp_nation", "exp_region"}
    assert os.path.exists(os.path.join(target, "schema.sql"))
    spark.catalog.dropTempView("exp_nation")
    spark.catalog.dropTempView("exp_region")
    imported = import_database(spark, target)
    assert set(imported) == {"exp_nation", "exp_region"}
    assert sorted(map(tuple, spark.table("exp_nation").collect())) == sorted(
        map(tuple, nation.collect())
    )
    assert spark.table("exp_region").count() == region.count()
    spark.catalog.dropTempView("exp_nation")
    spark.catalog.dropTempView("exp_region")


def test_attach_detach_database(spark, tmp_path):
    """ATTACH an exported dir as a dotted namespace; DETACH drops it."""
    from quackspark import sqlfront
    from quackspark.sources.exportdb import export_database

    load_table(spark, "/root/testdata/sf0.01", "region").createOrReplaceTempView(
        "att_region"
    )
    target = str(tmp_path / "attachdb")
    export_database(spark, target, tables=["att_region"])
    spark.catalog.dropTempView("att_region")

    res = sqlfront.sql(spark, f"ATTACH '{target}' AS extdb").collect()
    assert ("extdb", "att_region") in {(r["db"], r["table"]) for r in res}
    assert spark.sql("SELECT count(*) AS n FROM extdb.att_region").collect()[0]["n"] == 5
    sqlfront.sql(spark, "DETACH extdb")
    assert "extdb" not in [d.name for d in spark.catalog.listDatabases()]


def test_read_table_functions_differential(spark, tmp_path):
    """`FROM read_csv/read_json/read_parquet(...)` table functions
    (sqlfront._sub_read_fn) vs DuckDB executing the identical text on the
    identical files — options, auto-sniff, and multi-file lists."""
    import duckdb

    from quackspark.oracle import _rows_to_normed
    from quackspark.relation import Connection

    csv = str(tmp_path / "t.csv")
    with open(csv, "w") as f:
        f.write("a;b;c\n1;x;2.5\n2;y;3.5\n3;z;4.5\n")
    jsonl = str(tmp_path / "t.jsonl")
    with open(jsonl, "w") as f:
        f.write('{"k": 1, "s": "aa"}\n{"k": 2, "s": "bb"}\n')
    pq1, pq2 = str(tmp_path / "p1.parquet"), str(tmp_path / "p2.parquet")
    duckdb.sql("SELECT 1 AS v UNION ALL SELECT 2").write_parquet(pq1)
    duckdb.sql("SELECT 3 AS v").write_parquet(pq2)

    con = Connection(spark)
    d = duckdb.connect()
    cases = [
        f"SELECT a, b, c FROM read_csv('{csv}', delim=';', header=true) ORDER BY a",
        f"SELECT a, b FROM read_csv_auto('{csv}') ORDER BY a",
        f"SELECT k, s FROM read_json('{jsonl}') ORDER BY k",
        f"SELECT v FROM read_parquet(['{pq1}', '{pq2}']) ORDER BY v",
    ]
    for q in cases:
        got = con.sql(q).df
        s_cols, s_rows = list(got.columns), [tuple(r) for r in got.collect()]
        cur = d.execute(q)
        d_cols = [x[0] for x in cur.description]
        assert sorted(s_cols) == sorted(d_cols), q
        assert _rows_to_normed(s_cols, s_rows) == _rows_to_normed(
            d_cols, cur.fetchall()
        ), q


def test_copy_to_json_matches_duckdb(spark, tmp_path):
    """COPY (FORMAT JSON) writes newline-delimited JSON identical to the
    reference's json extension sink (r12 fn/format sweep)."""
    import glob as _glob
    import json as _json

    import duckdb

    from quackspark import sqlfront
    from quackspark.session import register_testdata_views

    register_testdata_views(spark, "/root/testdata/sf0.001")
    out = tmp_path / "j_spark"
    sqlfront.sql(
        spark,
        "COPY (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5) "
        f"TO '{out}' (FORMAT JSON)",
    )
    ours = sorted(
        (_json.loads(line)
         for f in _glob.glob(str(out / "part-*")) for line in open(f)
         if line.strip()),
        key=str,
    )
    dd = duckdb.connect()
    dd.execute(
        "CREATE VIEW nation AS FROM '/root/testdata/sf0.001/nation.parquet'"
    )
    duck_out = tmp_path / "j_duck.json"
    dd.execute(
        "COPY (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5) "
        f"TO '{duck_out}' (FORMAT JSON)"
    )
    want = sorted(
        (_json.loads(line) for line in open(duck_out) if line.strip()),
        key=str,
    )
    assert ours == want and len(ours) == 5
