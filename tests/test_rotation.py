"""The rotation ledger must account for EVERY registered query.

Each query is either (a) already driver-recorded in some CORRECTNESS_r*.json,
(b) pinned in the active window (R5_WINDOW), (c) pinned for the next
rotation (R6_ROTATION), or (d) permanently DELEGATED to the local oracle
sweep with a named driver-proven twin.  A new query that declares none of
these fails here — the backlog can't silently grow past the driver window
again (r4 verdict item 1/2).
"""

from __future__ import annotations

import glob
import json
import os

from sparkroach.queries import QUERIES
from sparkroach.queries.registry import DRIVER_WINDOW
from sparkroach.queries.rotation import DELEGATED, R5_WINDOW, R6_ROTATION

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _recorded() -> set[str]:
    names: set[str] = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json")):
        names |= set(json.load(open(f)))
    return names


def test_every_query_has_a_declared_disposition():
    recorded = _recorded()
    undeclared = sorted(
        name
        for name in QUERIES
        if name not in recorded
        and name not in R5_WINDOW
        and name not in R6_ROTATION
        and name not in DELEGATED
    )
    assert not undeclared, (
        f"queries with no rotation disposition: {undeclared} — add each to "
        "R6_ROTATION (novel execution path, needs a driver recording) or "
        "DELEGATED (SQL-shape variant, name its driver-proven twin)"
    )


def test_dispositions_are_disjoint_and_names_exist():
    assert not (R5_WINDOW & R6_ROTATION)
    assert not (R5_WINDOW & set(DELEGATED))
    assert not (R6_ROTATION & set(DELEGATED))
    for s in (R5_WINDOW, R6_ROTATION, set(DELEGATED)):
        missing = s - set(QUERIES)
        assert not missing, f"rotation names not registered: {sorted(missing)}"


def test_r6_rotation_fits_the_driver_window():
    # chain_end_to_end keeps its rows-only slot every round
    assert len(R6_ROTATION) + 1 <= DRIVER_WINDOW, (
        f"{len(R6_ROTATION)} r6-pinned queries exceed the "
        f"{DRIVER_WINDOW}-slot window — delegate SQL-shape variants"
    )


def test_delegation_twins_are_driver_proven_or_scheduled():
    recorded = _recorded()
    for name, (twin, why) in DELEGATED.items():
        assert twin in QUERIES, f"{name}: twin {twin} not registered"
        assert twin in recorded or twin in R5_WINDOW or twin in R6_ROTATION, (
            f"{name}: twin {twin} is neither driver-recorded nor pinned "
            "for a rotation window — a delegation must point at hard signal"
        )
        assert why.strip(), name
