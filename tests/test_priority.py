"""The rotation is DERIVED, not hand-maintained (VERDICT r8 item #2):
these pin the committed priority list to the computation over
CORRECTNESS history, so evidence-ordering can never silently go stale
the way the round-6..8 hand list did."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.derive_priority import derive, registry_names  # noqa: E402

from pyspark_recs.workloads import QUERIES, ORACLE  # noqa: E402
from pyspark_recs.workloads import priority as P  # noqa: E402


def test_committed_priority_matches_derivation():
    # Bounded at DERIVED_FROM_ROUNDS so a CORRECTNESS file landing
    # after generation (driver writes it at round close) doesn't fail
    # CI — the next regeneration folds it in and bumps the bound.
    assert list(P.PRIORITY) == derive(
        P.CHANGED_THIS_ROUND, P.DERIVED_FROM_ROUNDS
    )


def test_priority_is_complete_and_duplicate_free():
    names = registry_names()
    assert len(P.PRIORITY) == len(set(P.PRIORITY))
    assert set(P.PRIORITY) == set(names)


def test_registry_prefix_follows_priority():
    # The driver iterates QUERIES in insertion order; that order IS
    # the derived priority, and every entry has its oracle twin.
    assert list(QUERIES) == list(P.PRIORITY)
    assert set(ORACLE) == set(QUERIES)


def test_changed_this_round_names_are_registered():
    names = set(registry_names())
    for n in P.CHANGED_THIS_ROUND:
        assert n in names, n


def test_tier_order_red_and_never_checked_first():
    # Structural property of derive(): after the changed tier, any
    # red-at-newest-row or never-checked query precedes every green.
    from tools.derive_priority import history

    hist = history(P.DERIVED_FROM_ROUNDS)
    order = list(P.PRIORITY)
    changed = set(P.CHANGED_THIS_ROUND)
    greens_started = False
    for n in order:
        if n in changed:
            continue
        is_green = n in hist and hist[n][2]
        if greens_started:
            assert is_green, f"{n} (red/never) ordered after a green"
        elif is_green:
            greens_started = True


def test_drift_watch_is_oldest_first():
    from tools.derive_priority import history

    hist = history(P.DERIVED_FROM_ROUNDS)
    changed = set(P.CHANGED_THIS_ROUND)
    rounds = [
        hist[n][0]
        for n in P.PRIORITY
        if n not in changed and n in hist and hist[n][2]
    ]
    assert rounds == sorted(rounds)
