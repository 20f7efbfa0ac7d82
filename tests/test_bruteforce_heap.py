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


# --- big-query-set variant (VERDICT r10 next #7) -----------------------


def _synth_queries(spark, n: int, dim: int = 64):
    """n deterministic query vectors, built ENTIRELY in-plan (range →
    transform expression) — the test's query set never exists on the
    driver. Components: pmod(id*2654435761 + d*40503, 997)/498.5 - 1."""
    return spark.range(n).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.pmod(F.col("id") * 2654435761 + d * 40503, F.lit(997))
                / 498.5
                - 1
            ).cast("float"),
        ).alias("embedding"),
    )


def test_bigq_matches_heap_form_on_small_queries(spark, tmp_path):
    e = _load(spark, SF)
    q = e.filter(F.col("vec_id") < N_QUERIES)
    heap = S.brute_force_topk_heap(e, q, k=K).orderBy("q_id", "rnk").collect()
    bigq = (
        S.brute_force_topk_heap_bigq(
            e, q, k=K, stage_path=str(tmp_path / "q_small")
        )
        .orderBy("q_id", "rnk")
        .collect()
    )
    assert bigq == heap  # ids, ranks, AND rounded scores bit-identical


def test_bigq_100k_queries_no_driver_materialization(spark, tmp_path):
    """≥100 k queries: the staged-storage block-nested-loop completes,
    returns exactly k rows per query, and a numpy replay of sampled
    queries confirms the top-k is exact. The query set is built in-plan
    and staged by a distributed write — no collect/toPandas anywhere on
    it (the operator only ever handles its storage path)."""
    import numpy as np

    e = _load(spark, SF)
    nq, k = 100_000, 3
    q = _synth_queries(spark, nq)
    out = S.brute_force_topk_heap_bigq(
        e, q, k=k, stage_path=str(tmp_path / "q_big")
    )
    rows = out.collect()
    assert len(rows) == nq * k
    # ground truth for 5 sampled queries, replayed in numpy
    corpus = e.select("vec_id", "embedding").collect()
    c_ids = np.array([r["vec_id"] for r in corpus])
    C = np.array([r["embedding"] for r in corpus], dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1))
    got = {}
    for r in rows:
        got.setdefault(r["q_id"], []).append((r["rnk"], r["c_id"], r["cos"]))
    for qid in (1_000_000, 1_033_333, 1_050_000, 1_077_777, 1_099_999):
        i = qid - 1_000_000
        d = np.arange(64)
        vec = (
            (np.float64(i) * 2654435761 + d * 40503) % 997
        ) / 498.5 - 1
        vec = vec.astype(np.float32).astype(np.float64)
        cos = np.round(
            (C @ vec) / (cn * np.sqrt((vec * vec).sum())), 6
        )
        order = sorted(zip(-cos, c_ids))[:k]
        want = [
            (rnk + 1, int(cid), float(-negcos))
            for rnk, (negcos, cid) in enumerate(order)
        ]
        assert sorted(got[qid]) == want, qid


def test_bigq_plan_reads_only_corpus(spark, tmp_path):
    """Plan pin: the scored pipeline's ONLY input is the corpus scan —
    the query set reaches tasks via storage, so it appears in no join,
    no broadcast, and no exchange sits below the kernel."""
    e = _load(spark, SF)
    q = _synth_queries(spark, 1000)
    plan = (
        S.brute_force_topk_heap_bigq(
            e, q, k=K, stage_path=str(tmp_path / "q_plan")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "Join" not in plan and "BroadcastExchange" not in plan
    _, _, below_kernel = plan.partition("MapInPandas")
    assert "Exchange" not in below_kernel
