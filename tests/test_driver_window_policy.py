"""Driver-window membership policy (VERDICT r13 #1).

The round driver's correctness gate verifies only the FIRST
``DRIVER_WINDOW`` entries of ``all_queries()``. Round 13 regressed
because a new query (``pipeline_training_prep_v3``) was registered
ABOVE a previously driver-verified one (``pipeline_negative_sampling``)
in its module's QUERIES dict, silently swapping the verified query out
of the window. Policy, pinned here: the window must stay a superset of
the r12-verified set (the last clean window) modulo deliberate,
documented retirements — i.e. new queries append after verified ones.
"""

from __future__ import annotations

import json
import os

from quackspark.queries import DRIVER_WINDOW, all_oracles, all_queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: queries deliberately retired from the driver window, with the round
#: and rationale documented in OPTIMIZATION_r{N}.md / VERDICT — empty
#: until a retirement actually happens.
DELIBERATE_RETIREMENTS: frozenset[str] = frozenset()


def _window() -> list[str]:
    return list(all_queries().keys())[:DRIVER_WINDOW]


def test_window_superset_of_r12_verified_set():
    with open(os.path.join(_REPO, "CORRECTNESS_r12.json")) as fh:
        verified = set(json.load(fh))
    missing = (verified - DELIBERATE_RETIREMENTS) - set(_window())
    assert not missing, (
        f"driver window lost previously-verified queries {sorted(missing)}; "
        "new queries must be registered BELOW existing ones in their "
        "module's QUERIES dict (VERDICT r13 #1)"
    )


def test_negative_sampling_back_in_window():
    """The specific r13 casualty: restored and above v3 (VERDICT r13 #1)."""
    w = _window()
    assert "pipeline_negative_sampling" in w


def test_window_entries_all_have_oracles():
    """Window entries get the strong three-check compare; a rows-only
    entry there would waste a verified slot (all_queries already defers
    oracle-less names past the window — pin it)."""
    oracles = all_oracles()
    assert all(n in oracles for n in _window())


def test_window_is_deterministic():
    assert _window() == _window()
    assert len(_window()) == DRIVER_WINDOW


def test_v3_still_declared_and_oracled():
    """pipeline_training_prep_v3 left the window (it was only there via
    the erroneous r13 insertion) but must stay declared and oracled —
    removal of a declared query is a regression."""
    qs = all_queries()
    assert "pipeline_training_prep_v3" in qs
    assert "pipeline_training_prep_v3" in all_oracles()
