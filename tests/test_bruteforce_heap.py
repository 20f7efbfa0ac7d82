"""Per-partition-heap exact top-k (VERDICT r8 next #5): result-identical
to the window form, but the exchange carries only the per-batch
survivors. sf1 throughput evidence lives in BENCH_LOCAL_r10 (the heap
entry joined the headline manifest)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackspark.operators import simsearch as S
from quackspark.queries.simsearch import K, N_QUERIES, _load

SF = "/root/testdata/sf0.01"


def test_heap_matches_window_form(spark):
    e = _load(spark, SF)
    q = e.filter(F.col("vec_id") < N_QUERIES)
    win = S.brute_force_topk(e, q, k=K).orderBy("q_id", "rnk").collect()
    heap = S.brute_force_topk_heap(e, q, k=K).orderBy("q_id", "rnk").collect()
    assert heap == win  # ids, ranks, AND rounded scores bit-identical


def test_heap_plan_is_map_side_selected(spark):
    """The corpus side must flow scan → MapInPandas with NO exchange
    before the kernel (the selection happens map-side); the only
    exchange ranks the surviving sliver."""
    e = _load(spark, SF)
    q = e.filter(F.col("vec_id") < N_QUERIES)
    plan = (
        S.brute_force_topk_heap(e, q, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    head, _, tail = plan.partition("MapInPandas")
    # everything upstream of the kernel (printed BELOW it in the tree,
    # i.e. in `tail`) is exchange-free
    assert "Exchange" not in tail


def test_heap_handles_fewer_candidates_than_k(spark):
    e = _load(spark, SF).filter(F.col("vec_id") < 4)  # 3 candidates/query
    q = e.filter(F.col("vec_id") < 2)
    out = S.brute_force_topk_heap(e, q, k=K).collect()
    assert {r["q_id"] for r in out} == {0, 1}
    assert all(r["c_id"] != r["q_id"] for r in out)
    assert max(r["rnk"] for r in out) == 3  # 4 vectors → 3 candidates each


def test_heap_empty_query_set(spark):
    e = _load(spark, SF)
    out = S.brute_force_topk_heap(e, e.filter("vec_id < 0"), k=K)
    assert out.count() == 0
