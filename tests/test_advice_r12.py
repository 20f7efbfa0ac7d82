"""Round-13 fixes for the four ADVICE r12 findings: json_object dropping
NULL-valued keys (Spark's to_json ignoreNullFields default), * REPLACE /
COLUMNS() resolving a FROM name against the catalog when a WITH clause
shadows it, the BPE encoder memo keyed on id() (never hits, leaks), and
nested TIME carriers inside extraction calls silently extracting from the
BIGINT µs carrier.
"""

from __future__ import annotations

import duckdb
import pytest

from quackspark import sqlfront
from quackspark.sqlfront import UnsupportedSQL

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    d = duckdb.connect()
    for t in ["nation", "region"]:
        d.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return d


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    from quackspark.session import register_testdata_views

    register_testdata_views(spark, SF)


# --- medium: json_object keeps NULL values ------------------------------


JSON_NULL_CASES = [
    # literal-key (named_struct) branch
    "SELECT json_object('a', NULL) AS j",
    "SELECT json_object('a', 1, 'b', NULL, 'c', 'x') AS j",
    # computed-key (map) branch
    "SELECT json_object(lower('A'), CAST(NULL AS INT)) AS j",
]


@pytest.mark.parametrize("q", JSON_NULL_CASES, ids=range(len(JSON_NULL_CASES)))
def test_json_object_null_values_kept(spark, duck, q):
    got = sqlfront.sql(spark, q).collect()[0][0]
    exp = duck.sql(q).fetchone()[0]
    assert got == exp  # e.g. {"a":null}, not {}


def test_json_object_null_on_table(spark, duck):
    q = (
        "SELECT n_nationkey, json_object('name', n_name, 'big', "
        "CASE WHEN n_nationkey > 12 THEN n_nationkey END) AS j "
        "FROM nation ORDER BY n_nationkey"
    )
    got = [tuple(r) for r in sqlfront.sql(spark, q).collect()]
    exp = duck.sql(q).fetchall()
    assert got == exp


# --- medium: CTE shadowing a catalog table in * REPLACE / COLUMNS() -----


def test_star_replace_cte_shadow_ordinals(spark, duck):
    # the CTE's column ORDER differs from the catalog nation's — expansion
    # must not use the catalog schema (ADVICE r12 verified repro)
    q = (
        "WITH nation AS (SELECT 7 AS n_regionkey, 'y' AS n_name, "
        "9 AS n_nationkey) "
        "SELECT * REPLACE (upper(n_name) AS n_name) FROM nation"
    )
    got = sqlfront.sql(spark, q)
    exp = duck.sql(q)
    # the fallback is column-SET-preserving (ordinals may differ — the
    # designed EXCEPT form); values must agree per column name, and the
    # silent wrong-relation expansion (catalog nation's 3-col schema over
    # the CTE) must be gone
    got_names = sorted(f.name for f in got.schema.fields)
    exp_names = sorted(d[0] for d in exp.description)
    assert got_names == exp_names
    grow = got.collect()[0].asDict()
    erow = dict(zip([d[0] for d in exp.description], exp.fetchone()))
    assert grow == erow  # {'n_regionkey': 7, 'n_name': 'Y', 'n_nationkey': 9}


def test_star_replace_cte_shadow_partial_schema(spark, duck):
    # partially-overlapping schema: catalog-based expansion would raise
    # AnalysisException; the EXCEPT fallback must keep working
    q = (
        "WITH nation AS (SELECT 1 AS n_nationkey, 'z' AS extra) "
        "SELECT * REPLACE (n_nationkey + 1 AS n_nationkey) FROM nation"
    )
    res = sqlfront.sql(spark, q)
    exp = duck.sql(q)
    got_row = res.collect()[0].asDict()
    exp_row = dict(zip([d[0] for d in exp.description], exp.fetchone()))
    assert got_row == exp_row  # {'n_nationkey': 2, 'extra': 'z'}


def test_star_replace_non_shadowing_cte_untouched(spark, duck):
    # a WITH that does NOT shadow the FROM name keeps the ordinal path
    q = (
        "WITH k AS (SELECT 1 AS one) "
        "SELECT * REPLACE (upper(n_name) AS n_name) FROM nation "
        "ORDER BY n_nationkey LIMIT 3"
    )
    got = sqlfront.sql(spark, q)
    exp = duck.sql(q)
    assert [f.name for f in got.schema.fields] == [
        d[0] for d in exp.description
    ]
    assert [tuple(r) for r in got.collect()] == exp.fetchall()


def test_columns_over_cte_refuses(spark):
    q = (
        "WITH nation AS (SELECT 1 AS a, 2 AS b) "
        "SELECT COLUMNS('a|b') FROM nation"
    )
    with pytest.raises(UnsupportedSQL, match="CTE"):
        sqlfront.sql(spark, q)


def test_cte_shadow_names_helper():
    toks = sqlfront._tokens(
        "WITH a AS (SELECT 1), b (x, y) AS (SELECT 1, 2) SELECT * FROM a"
    )
    names = sqlfront._cte_shadow_names(toks)
    assert "a" in names and "b" in names
    assert sqlfront._cte_shadow_names(
        sqlfront._tokens("SELECT x AS (weird) FROM t")
    ) == frozenset()  # no WITH → empty, zero cost


# --- low: BPE memo keyed on content, not id() ---------------------------


def test_bpe_memo_content_key(spark):
    from pyspark import SparkContext

    from quackspark.functions import _udfmemo
    from quackspark.operators.bpe import apply_bpe

    df = spark.createDataFrame([("hello world",)], "txt string")
    merges = [("l", "l"), ("e", "ll")]
    apply_bpe(df, "txt", merges)
    sc = SparkContext._active_spark_context
    cache = _udfmemo._UDF_MEMO[sc]
    n1 = len(cache)
    # same merge table, fresh list/tuple objects → must NOT grow the cache
    apply_bpe(df, "txt", [tuple(m) for m in merges])
    assert len(cache) == n1


def test_bpe_encode_still_exact(spark):
    from quackspark.operators.bpe import apply_bpe

    df = spark.createDataFrame([("lello",)], "txt string")
    out = apply_bpe(df, "txt", [("l", "o"), ("l", "lo")]).collect()[0][1]
    # 'lello' + EOW: merge l+o → lo, then l+lo → llo
    assert out[-1].endswith("llo") or "llo" in "".join(out)


# --- low: nested TIME carrier inside extraction calls refuses -----------


def test_time_extract_direct_still_works(spark, duck):
    q = "SELECT hour(TIME '12:30:45') AS h, minute(TIME '12:30:45') AS m"
    got = sqlfront.sql(spark, q).collect()[0]
    exp = duck.sql(q).fetchone()
    assert tuple(got) == exp


@pytest.mark.parametrize(
    "q",
    [
        "SELECT hour(coalesce(TIME '12:30:45', NULL)) AS h",
        "SELECT hour(greatest(TIME '01:00:00', TIME '12:30:45')) AS h",
        "SELECT minute(if(true, TIME '12:30:45', TIME '01:00:00')) AS m",
    ],
)
def test_time_extract_nested_refuses(spark, q):
    with pytest.raises(UnsupportedSQL, match="TIME"):
        sqlfront.sql(spark, q)


def test_time_literal_outside_extract_unaffected(spark, duck):
    # a TIME literal NOT under an extraction call keeps working
    q = (
        "SELECT CASE WHEN TIME '12:00:00' > TIME '11:00:00' "
        "THEN 1 ELSE 0 END AS x"
    )
    got = sqlfront.sql(spark, q).collect()[0][0]
    exp = duck.sql(q).fetchone()[0]
    assert got == exp
