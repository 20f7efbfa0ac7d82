"""VERDICT r11 directive pins.

#4 — the driver's correctness gate samples the FIRST 50 declared
queries; for eleven rounds that window was tpch/json/math/joins/aggs
only. all_queries() now interleaves modules round-robin for the window:
every family is represented and the rows-only entries (weaker driver
check) sit past it.

#6 — the window-form brute-force top-k is retired from the bench
headline (pinned in tests/test_bench_manifest.py; the corpus keeps it
as the parity twin the heap forms oracle against).
"""

from __future__ import annotations

from quackspark.queries import DRIVER_WINDOW, all_oracles, all_queries


def test_driver_window_spans_families():
    names = list(all_queries())[:DRIVER_WINDOW]
    families = {n.split("_")[0] for n in names}
    # q1..q22 prefixes are one family (tpch)
    non_tpch = {f for f in families if not (f.startswith("q") and f[1:].isdigit())}
    assert len(non_tpch) >= 12, f"window families: {sorted(non_tpch)}"


def test_driver_window_excludes_rows_only():
    oracles = all_oracles()
    names = list(all_queries())[:DRIVER_WINDOW]
    rows_only = [n for n in names if n not in oracles]
    assert rows_only == []


def test_corpus_complete_and_duplicate_free():
    qs = all_queries()
    # the window reorder must not drop or duplicate anything
    assert len(qs) == len(set(qs))
    flat: dict = {}
    from quackspark.queries import _modules

    for m in _modules():
        flat.update(m.QUERIES)
    assert set(qs) == set(flat)


def test_window_reorder_is_deterministic():
    assert list(all_queries())[:DRIVER_WINDOW] == list(all_queries())[:DRIVER_WINDOW]
    assert list(all_queries()) == list(all_queries())
