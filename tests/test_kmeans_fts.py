"""Unit tests for operators/kmeans.py and operators/fts.py beyond the
oracle parity suite: invariants a SQL differential can't express —
assignment optimality vs a NumPy reference, BM25 monotonicity."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from quackspark.operators.fts import B, K1, bm25_topk
from quackspark.operators.kmeans import kmeans_assign, kmeans_fit


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    # 3 well-separated blobs of 20 vectors in 8-d
    centers = rng.normal(size=(3, 8)) * 10
    rows = []
    for i in range(60):
        v = centers[i % 3] + rng.normal(size=8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_kmeans_assignment_is_nearest_fitted_centroid(spark, vecs):
    cents = {
        r["cluster"]: np.array(r["cent"], dtype=float)
        for r in kmeans_fit(vecs, k=4, iters=3).collect()
    }
    data = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in vecs.collect()}
    got = kmeans_assign(vecs, k=4, iters=3).collect()
    assert len(got) == 60
    for r in got:
        v = data[r["vec_id"]]
        dists = {c: float(((v - cv) ** 2).sum()) for c, cv in cents.items()}
        best = min(dists, key=lambda c: (dists[c], c))
        assert r["cluster"] == best
        assert r["d2"] == pytest.approx(dists[best], abs=1e-4)


def test_kmeans_separated_blobs_recovered(spark, vecs):
    # k = 3 on 3 well-separated blobs: members of the same blob must land
    # in the same cluster after 3 rounds
    got = kmeans_assign(vecs, k=3, iters=3).collect()
    by_blob = {}
    for r in got:
        by_blob.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(cl) == 1 for cl in by_blob.values())


def _np_bm25(docs, terms, k):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfs = {q: sum(1 for t in toks.values() if q in t) for q in terms}
    out = []
    for d, t in toks.items():
        score = 0.0
        for q in terms:
            tf = t.count(q)
            idf = math.log((n - dfs[q] + 0.5) / (dfs[q] + 0.5) + 1.0)
            score += idf * tf * (K1 + 1.0) / (
                tf + K1 * (1.0 - B + B * len(t) / avgdl)
            )
        out.append((d, round(score, 6)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def test_bm25_matches_numpy_reference(spark):
    docs = [
        (1, "spark joins hash tables fast"),
        (2, "spark spark spark everywhere"),
        (3, "window functions and sort order"),
        (4, "hash hash hash hash join"),
        (5, "a completely unrelated document about nothing"),
        (6, "spark hash spark hash mixed"),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = [
        (r["doc"], r["score"])
        for r in bm25_topk(df, "text", "doc_id", ["spark", "hash"], k=4).collect()
    ]
    assert got == _np_bm25(docs, ["spark", "hash"], 4)


def test_bm25_zero_hit_docs_score_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id: long, text: string"
    )
    rows = bm25_topk(df, "text", "doc_id", ["missing"], k=10).collect()
    assert {r["score"] for r in rows} == {0.0}
