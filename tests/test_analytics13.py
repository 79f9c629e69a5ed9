"""Property pins for the analytics13 wave (value correctness is covered
by test_oracle_gate.py's registry sweep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkroach.queries.analytics13 import (
    MAX_CHARS_EXPECT,
    documents_quality_expectations,
    events_gap_fill,
    events_type_transitions,
)
from sparkroach.tables import load
from tests.conftest import SF_SMALL


def test_expectations_report_exercises_both_paths(spark):
    rows = {r["check_name"]: r for r in documents_quality_expectations(spark, SF_SMALL).collect()}
    assert len(rows) == 6
    # structural checks hold on the testdata
    for name in ("doc_id_not_null", "doc_id_unique", "n_chars_matches_text",
                 "lang_is_iso2", "text_not_empty"):
        assert rows[name]["passed"] and rows[name]["n_violations"] == 0
    # the deliberately-tight range check must actually count violations
    tight = rows[f"n_chars_le_{MAX_CHARS_EXPECT}"]
    expect = (
        load(spark, SF_SMALL, "documents")
        .where(F.col("n_chars") > MAX_CHARS_EXPECT)
        .count()
    )
    assert expect > 0, "fixture drift: no doc exceeds the tight bound"
    assert tight["n_violations"] == expect and not tight["passed"]


def test_gap_fill_zero_and_nonzero_slots_both_plentiful(spark):
    for r in events_gap_fill(spark, SF_SMALL).collect():
        assert r["n_zero_slots"] > 0, r
        assert r["n_slots"] - r["n_zero_slots"] > 0, r
        assert r["n_events"] > 0
        # grid spans the feed exactly: every type sees the same grid
    rows = events_gap_fill(spark, SF_SMALL).collect()
    assert len({r["n_slots"] for r in rows}) == 1


def test_transitions_counts_are_consistent(spark):
    rows = events_type_transitions(spark, SF_SMALL).collect()
    ev = load(spark, SF_SMALL, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event is exactly one transition target
    assert sum(r["n"] for r in rows) == n_events
    # _START out-degree == number of users
    assert sum(r["n"] for r in rows if r["prev_type"] == "_START") == n_users
    # conditional probabilities sum to 1 per prev state
    from collections import defaultdict

    acc = defaultdict(float)
    for r in rows:
        acc[r["prev_type"]] += r["p"]
        assert r["p"] == r["n"] / r["n_from"]
    for prev, s in acc.items():
        assert abs(s - 1.0) < 1e-9, (prev, s)
