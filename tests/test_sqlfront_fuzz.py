"""Grammar-fuzz gate for the SQL frontend (VERDICT r3 directive #3).

Runs a fixed-seed batch of generated statements through
tools/fuzz_sqlfront.run_fuzz (transpile-vs-DuckDB differential) and
asserts ZERO silent mismatches. The full ≥500-statement sweep runs via
`python tools/fuzz_sqlfront.py --n 500`; this pytest gate keeps a
representative 150-statement prefix in every CI run so frontend changes
can't silently regress row semantics.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from fuzz_sqlfront import run_fuzz  # noqa: E402


def test_fuzz_no_silent_mismatches(spark):
    stats = run_fuzz(n=150, seed=1, spark=spark)
    failures = stats.pop("failures")
    mismatches = [f for f in failures if f[0] == "MISMATCH"]
    assert not mismatches, mismatches
    # loud Spark failures are not silent wrongness, but a burst of them
    # means the transpiler is emitting garbage — keep the lid on
    assert stats["SPARK_ERROR"] <= 3, failures
    # the generator should mostly produce DuckDB-valid statements
    assert stats["DUCK_ERROR"] <= 15, stats
    assert stats["MATCH"] >= 120, stats


def test_fuzz_alternate_seed(spark):
    stats = run_fuzz(n=100, seed=20260814, spark=spark)
    failures = stats.pop("failures")
    mismatches = [f for f in failures if f[0] == "MISMATCH"]
    assert not mismatches, mismatches
    assert stats["SPARK_ERROR"] <= 3, failures
