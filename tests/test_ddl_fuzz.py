"""DDL/DML fuzz gate (VERDICT r5 directive 8).

Runs fixed-seed statement streams through tools/fuzz_ddl.run_fuzz —
CREATE/INSERT/UPDATE/DELETE/ALTER/upsert templates executed on BOTH
engines with full-table state diffs after every mutation — and asserts
ZERO silent state divergence. The full ≥1000-statement sweep runs via
`python tools/fuzz_ddl.py --n 1000`; this gate keeps a representative
prefix in every CI run. Findings to date (fixed before this gate landed):
ALTER ADD COLUMN DEFAULT not applied to later partial inserts; concat()
NULL-skip semantics; intra-batch duplicate conflict keys must reject.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from fuzz_ddl import run_fuzz  # noqa: E402


def test_ddl_fuzz_no_state_divergence(spark):
    # n=120 spans three episode shapes: plain, constrained, and (r6)
    # VERSIONED+constrained — the commit-log chokepoints fuzz in CI
    stats = run_fuzz(n=120, seed=1, spark=spark)
    failures = stats.pop("failures")
    bad = [f for f in failures if f[0] in ("STATE_MISMATCH", "ACCEPT_DIVERGE")]
    assert not bad, bad
    assert stats["STATE_MATCH"] >= 90, stats
    assert stats["STATE_MATCH"] + stats["BOTH_REJECT"] == 120, stats


def test_ddl_fuzz_alternate_seed(spark):
    stats = run_fuzz(n=80, seed=20260814, spark=spark)
    failures = stats.pop("failures")
    bad = [f for f in failures if f[0] == "STATE_MISMATCH"]
    assert not bad, bad
