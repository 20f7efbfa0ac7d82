"""Round-11 pins for the r10 verdict directives.

Directive #1: the pipeline capstones must not hint-broadcast a
corpus-derived side. `pipeline_training_prep` used to broadcast the
near-dup DROP set (dup-rate × corpus) and `pipeline_training_prep_v2`
the cluster-survivor KEEP set (≈ the whole deduped corpus) — both OOM
the driver at 100 TB. The fix removes the hints: the semi/anti gates
shuffle on doc_id (co-partitioned with the exact-dedup semi-join), and
only AQE's stats-driven runtime conversion may broadcast them when the
ACTUAL built size is small.

Pin style: with the size-driven broadcast paths disabled
(autoBroadcastJoinThreshold = -1, both static and adaptive), any
BroadcastHashJoin left in the executed plan can only come from an
explicit user hint. The capstones' only legitimate hints sit on
bounded metadata sides (1-row stats, per-source rates, eval-set
shingles) — none of which is a LeftSemi/LeftAnti gate — so the pin is:
NO broadcast join with LeftSemi or LeftAnti semantics anywhere in the
capstone plans.
"""

from __future__ import annotations

import re

import pytest

from quackspark.entry import queries

SF = "/root/testdata/sf0.001"

CAPSTONES = [
    "pipeline_training_prep",
    "pipeline_training_prep_recompute",
    "pipeline_training_prep_v2",
]


@pytest.fixture()
def no_size_broadcast(spark):
    conf = spark.conf
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {}
    for k in keys:
        try:
            old[k] = conf.get(k)
        except Exception:
            old[k] = None
        conf.set(k, "-1")
    yield
    for k, v in old.items():
        if v is None:
            conf.unset(k)
        else:
            conf.set(k, v)


@pytest.mark.parametrize("name", CAPSTONES)
def test_no_hinted_broadcast_on_semi_anti_gates(spark, no_size_broadcast, name):
    # r14: v2's single-pass mix keeps the keep LeftSemi visible in the
    # declared form (the r13 narrow-gate checkpoint that hid it is gone)
    df = queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Broadcast" in line and re.search(r"LeftSemi|LeftAnti", line):
            raise AssertionError(
                f"{name}: hinted broadcast on a corpus-derived gate:\n{line}"
            )
    # the gates themselves must still be there, as shuffled joins. The
    # exact-dedup LeftSemi sits BELOW the surv localCheckpoint in the
    # checkpointing modes (prep, v2) so it only shows in recompute;
    # what every mode must show is its corpus-sized outer gate:
    # prep/recompute the near-dup LeftAnti, v2 the keep LeftSemi.
    if name == "pipeline_training_prep_v2":
        assert "LeftSemi" in plan, name
    else:
        assert "LeftAnti" in plan, name
    if name == "pipeline_training_prep_recompute":
        assert "LeftSemi" in plan, name


@pytest.mark.parametrize(
    "name,n_hints",
    [
        # prep/recompute: zero hints anywhere (the drops hint is gone)
        ("pipeline_training_prep", 0),
        ("pipeline_training_prep_recompute", 0),
        # v2 (r14 single-pass mix): the temperature stats crossJoin and
        # per-source rates join are gone — the mix derives rates with
        # window functions over the (source, bucket) pre-aggregate, so
        # there is no join to hint at all
        ("pipeline_training_prep_v2", 0),
    ],
)
def test_capstone_broadcast_hint_budget(spark, name, n_hints):
    """Belt-and-braces on the logical plan: pin the exact number of
    ResolvedHints per capstone. A reintroduced F.broadcast(drops) or
    F.broadcast(keep_ids) bumps the count even when stats would have
    chosen broadcast anyway (the analyzed plan prints hints before join
    planning)."""
    df = queries()[name](spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == n_hints, name
