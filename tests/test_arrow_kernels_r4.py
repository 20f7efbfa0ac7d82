"""Round-4 Arrow-kernel equivalence pins (VERDICT r3 directive #1).

The hot-path kernels (functions/text.fingerprint_arrow,
operators/fts.bm25_features_arrow) must stay value-identical to the
interpreted expression forms they replaced — the expression forms are
what the DuckDB oracles mirror op-for-op, so kernel == expression ⇒
kernel == oracle transitively, plus edge cases the fixture can't hit
(NULL text, empty text, whitespace-only, multi-space runs, unicode).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackspark.functions import text as T
from quackspark.operators import fts as X
from quackspark.queries._util import load_table, parallelize_kernel_input

SF = "/root/testdata/sf0.001"

EDGE_TEXTS = [
    None,
    "",
    "   ",
    "one",
    "a  b\tc\nd",
    " leading and trailing  ",
    "spark spark spark hash",
    "Spark HASH vector VECTOR",
    "x" * 500 + " y",
    "café naïve résumé",
    "a b a b a",
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id int, text string"
    )


def _expr_fingerprint(df):
    toked = df.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    return toked.select(
        "doc_id",
        T.rolling_hash(F.col("toks")).alias("rk_fp"),
        F.md5(F.concat_ws(" ", F.col("toks"))).alias("md5_fp"),
        F.array_min(F.transform(F.col("toks"), F.md5)).alias("minhash1"),
    )


def _kernel_fingerprint(df):
    return df.select(
        "doc_id", T.fingerprint_arrow(F.col("text")).alias("fp")
    ).select("doc_id", "fp.rk_fp", "fp.md5_fp", "fp.minhash1")


def test_fingerprint_kernel_matches_expression_corpus(spark):
    d = load_table(spark, SF, "documents")
    a = sorted(tuple(r) for r in _expr_fingerprint(d).collect())
    b = sorted(tuple(r) for r in _kernel_fingerprint(d).collect())
    assert a == b


def test_fingerprint_kernel_edge_cases(spark, edge_df):
    a = sorted(
        tuple(r) for r in _expr_fingerprint(edge_df.filter("text IS NOT NULL")).collect()
    )
    b = sorted(
        tuple(r) for r in _kernel_fingerprint(edge_df.filter("text IS NOT NULL")).collect()
    )
    assert a == b
    # NULL text → all-NULL fingerprint fields from the kernel
    nrow = _kernel_fingerprint(edge_df.filter("text IS NULL")).collect()
    assert [tuple(r)[1:] for r in nrow] == [(None, None, None)]


def _expr_bm25_features(df, terms):
    base = df.select(
        F.col("doc_id").alias("doc"),
        T.tokens(F.lower(F.col("text"))).alias("toks"),
    )
    return base.select(
        "doc",
        F.size("toks").alias("dl"),
        *[X._tf(F.col("toks"), t).alias(f"tf_{t}") for t in terms],
    )


def test_bm25_features_kernel_matches_expression(spark, edge_df):
    terms = ["spark", "hash", "vector"]
    d = load_table(spark, SF, "documents")
    for df in (d, edge_df.filter("text IS NOT NULL")):
        a = sorted(
            tuple(r)
            for r in df.select(
                F.col("doc_id").alias("doc"),
                X.bm25_features_arrow(F.col("text"), terms).alias("f"),
            ).select("doc", "f.dl", *[f"f.tf_{t}" for t in terms]).collect()
        )
        b = sorted(tuple(r) for r in _expr_bm25_features(df, terms).collect())
        assert a == b


def test_parallelize_kernel_input_rescues_coarse_scan(spark):
    d = load_table(spark, SF, "documents")  # one small file → 1-2 partitions
    out = parallelize_kernel_input(d)
    target = min(spark.sparkContext.defaultParallelism, 32)
    assert out.rdd.getNumPartitions() >= min(target, 4)
    # already-parallel input passes through without an extra Exchange
    wide = d.repartition(target)
    assert parallelize_kernel_input(wide) is wide
