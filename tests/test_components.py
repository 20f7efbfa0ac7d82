"""Unit tests for operators/components.py (distributed connected
components via alternating large-star/small-star): chains — the
worst case for label propagation — hubs, multiple components, and a
brute-force differential on random graphs."""

from __future__ import annotations

import random

import pytest

from quackspark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "d1: long, d2: long")
    rows = connected_components(df, "d1", "d2").collect()
    return {r["node"]: r["comp"] for r in rows}


def _brute(edges):
    """Union-find reference implementation."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # normalize every member to its component min
    comps = {}
    for x in parent:
        comps[x] = find(x)
    return comps


def test_chain(spark):
    # a 30-node path: diameter 29, converges via star contraction
    edges = [(i, i + 1) for i in range(30)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(31)}


def test_hub_and_two_components(spark):
    edges = [(100, i) for i in range(1, 9)] + [(200, 201), (201, 202)]
    got = _cc(spark, edges)
    assert got == {**{i: 1 for i in [100, *range(1, 9)]}, 200: 200, 201: 200, 202: 200}


def test_self_loops_and_duplicates_ignored(spark):
    got = _cc(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}  # pure self-loop node 5 has no edge -> excluded


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    edges = [(u, v) for u, v in edges if u != v]
    assert _cc(spark, edges) == _brute(edges)
