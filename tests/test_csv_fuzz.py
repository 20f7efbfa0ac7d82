"""CSV-dialect fuzz gate (r12): random files × random read_csv options
through tools/fuzz_csv.run_fuzz (csvio/sniffer vs live DuckDB), asserting
ZERO row mismatches. The r12 run of the full tool caught two real dialect
defaults Spark's univocity parser does not share with the reference:
the escape character defaulting to the QUOTE character (doubled-quote
escaping), and quoted fields embedding record separators (multiLine).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from fuzz_csv import run_fuzz  # noqa: E402


def test_csv_fuzz_no_mismatches(spark):
    stats = run_fuzz(n=40, seed=1)
    failures = stats.pop("failures")
    mismatches = [f for f in failures if f[0] == "MISMATCH"]
    assert not mismatches, mismatches
    assert stats["SPARK_ERROR"] == 0, failures
    assert stats["MATCH"] >= 35, stats
