"""Plan-shape assertions for the round-3 operators: the properties that
make them 100 TB-safe, pinned so a refactor that silently degrades the
plan (a broadcast that becomes a sort-merge join, a projection that
re-inlines an expensive expression) fails loudly.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_no_explode_and_broadcast_stats(spark):
    """BM25 scoring must stay a projection: no Generate (explode) node,
    corpus stats broadcast, top-k via TakeOrderedAndProject."""
    from quackspark.queries.fts import fts_bm25_topk

    plan = _plan(fts_bm25_topk(spark, SF))
    assert "Generate" not in plan  # no explode anywhere
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_count_joins_are_broadcast(spark):
    """Bigram-LM scoring joins the (vocab-sized) count tables — both
    must be broadcast, never a corpus-wide sort-merge join."""
    from quackspark.queries.textops import text_bigram_logprob

    plan = _plan(text_bigram_logprob(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_temperature_mix_rates_broadcast(spark):
    """Per-source rates derive in-plan and broadcast back; the keep
    decision must not shuffle the corpus before the final rollup."""
    from quackspark.queries.pipeline import pipeline_temperature_mix

    plan = _plan(pipeline_temperature_mix(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kmeans_assignment_is_map_only(spark):
    """Lloyd assignment never joins the corpus (r4): the distributed
    path is a map-only Arrow argmin against driver-held centroids (the
    only exchanges in a fit round belong to the K×DIM mean update); the
    r14 small-corpus driver path collapses the whole fit to a local
    relation — no join of any kind in either plan."""
    from quackspark.operators.kmeans import kmeans_fit
    from quackspark.session import load_table

    e = load_table(spark, SF, "embeddings")
    dist_plan = _plan(kmeans_fit(e, k=4, iters=2, driver_cap=0))
    assert "ArrowEvalPython" in dist_plan
    drv_plan = _plan(kmeans_fit(e, k=4, iters=2))
    assert "ArrowEvalPython" not in drv_plan  # collapsed to a local scan
    for plan in (dist_plan, drv_plan):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" not in plan


def test_gapfill_single_sort_per_window_partition(spark):
    """Gapfill's LOCF/interp windows partition by series key; there must
    be no single-partition (global) window in the plan."""
    from quackspark.queries.datetimes import dt_gapfill

    plan = _plan(dt_gapfill(spark, SF))
    assert "SinglePartition" not in plan


def test_sessionize_one_shuffle_for_user_windows(spark):
    """Both sessionize windows share the user_id partitioning — the plan
    must contain exactly ONE hashpartitioning exchange on user_id (AQE
    may add coalesces, but no second user_id shuffle)."""
    from quackspark.queries.eventops import ev_sessionize

    plan = _plan(ev_sessionize(spark, SF))
    assert "SinglePartition" not in plan
    n_user_exchanges = len(
        re.findall(r"Exchange hashpartitioning\(user_id", plan)
    )
    assert n_user_exchanges == 1, plan[:2000]


def test_connected_components_rounds_are_int_pair_plans(spark):
    """One star round = groupBy min + equi join on int keys; the round's
    plan must not contain a cartesian or nested-loop join."""
    from quackspark.operators.components import _canon, _large_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "u: long, v: long"
    )
    plan = _plan(_large_star(_canon(edges)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_tokenizes_once(spark):
    """The token array must be materialized in its own projection — the
    regex split appears exactly once in the physical plan."""
    from quackspark.queries.fts import fts_bm25_topk

    plan = _plan(fts_bm25_topk(spark, SF))
    assert plan.count("split(lower") <= 1, plan[:3000]
