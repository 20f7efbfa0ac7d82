"""Occupancy-adaptive SemDeDup (VERDICT r8 next #2): codebook size
scales with the corpus, per-cluster pair work is bounded by within-
cluster SRP banding above the pair budget, and the oracle replays the
chosen k. Growth evidence lives in SCALE_SEMDEDUP.json
(tools/scale_semantic_dedup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackspark.operators import simsearch as S
from quackspark.queries.simsearch import THRESHOLD, _load

SF = "/root/testdata/sf0.01"


def test_semantic_k_scaling():
    assert S.semantic_k(100) == 8  # floor
    assert S.semantic_k(500) == 8  # sf0.01 → unchanged vs the r8 record
    assert S.semantic_k(10_000) == 156
    assert S.semantic_k(64 * 256) == 256
    assert S.semantic_k(10**9) == 256  # cap (past it banding bounds pairs)


def test_semantic_dedup_band_false_matches_default_at_small_scale(spark):
    """At sf0.01 no cluster exceeds the pair budget, so the auto split
    sends everything through the exact path: band=False is identical."""
    e = _load(spark, SF)
    auto = S.semantic_dedup(e, threshold=THRESHOLD).orderBy("vec_id")
    exact = S.semantic_dedup(e, threshold=THRESHOLD, band=False).orderBy(
        "vec_id"
    )
    assert auto.collect() == exact.collect()


def test_semantic_dedup_banded_is_subset(spark):
    """Forced banding can only LOSE candidate pairs (a pair must also
    share an SRP band), so banded dup marks ⊆ exact dup marks, and every
    shared mark has the identical dup_of ancestor or a higher one."""
    e = _load(spark, SF)
    exact = {
        r["vec_id"]: r["dup_of"]
        for r in S.semantic_dedup(e, threshold=THRESHOLD, band=False)
        .filter(F.col("dup_of").isNotNull())
        .collect()
    }
    banded = {
        r["vec_id"]: r["dup_of"]
        for r in S.semantic_dedup(e, threshold=THRESHOLD, band=True)
        .filter(F.col("dup_of").isNotNull())
        .collect()
    }
    assert set(banded) <= set(exact)
    for vid, anc in banded.items():
        # the banded min-ancestor can only be ≥ the exact one
        assert anc >= exact[vid]


def test_semantic_dedup_row_per_input_and_kept_consistency(spark):
    e = _load(spark, SF)
    out = S.semantic_dedup(e, threshold=THRESHOLD).collect()
    assert len(out) == e.count()
    for r in out:
        assert r["kept"] == (r["dup_of"] is None)


def test_semantic_dedup_pinned_k_overrides(spark):
    """k= pins the codebook size (the oracle-replay contract is on the
    DEFAULT; explicit k is the power-user path)."""
    e = _load(spark, SF)
    out = S.semantic_dedup(e, threshold=THRESHOLD, k=16)
    assert out.select(F.countDistinct("cluster")).collect()[0][0] <= 16
    assert out.select(F.max("cluster")).collect()[0][0] >= 8
