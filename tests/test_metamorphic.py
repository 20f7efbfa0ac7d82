"""Metamorphic configuration tests (the reference's statement-verifier
idea, ClientContext::VerifyQuery duckdb-7.cpp:2891-2990: the same query
under different engine configurations must agree).

Spark analog: results must be invariant to AQE on/off and shuffle
partition count — if they are not, an operator is leaking partial-order
dependence (exactly the float-sum bug class the decimal path exists for).
"""

from __future__ import annotations

import pytest

from quackspark.queries import all_queries

SF = "/root/testdata/sf0.001"

#: representative slice across operator families — one per shuffle shape
PROBES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "window_running_sum",
    "dedup_minhash_lsh",
    "sim_bruteforce_topk",
    "agg_grouping_sets",
    "sw_session",
    "q21_waiting_supplier",
    "join_asof_backward",
    "pipeline_training_prep",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("name", PROBES)
def test_invariant_to_shuffle_partitions(spark, name):
    fn = all_queries()[name]
    base = _rows(fn(spark, SF))
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert _rows(fn(spark, SF)) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


@pytest.mark.parametrize("name", PROBES)
def test_invariant_to_aqe(spark, name):
    fn = all_queries()[name]
    base = _rows(fn(spark, SF))
    orig = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        assert _rows(fn(spark, SF)) == base
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", orig)
