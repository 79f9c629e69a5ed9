"""Property pins for the analytics14 wave: the edge paths each operator
exists to exercise must be NON-VACUOUS on the testdata (value
correctness is covered by test_oracle_gate.py's registry sweep)."""

from __future__ import annotations

from collections import Counter

from sparkroach.queries.analytics14 import (
    NTH_EVENT,
    events_null_semantics_report,
    events_session_bookends,
    user_daily_activity_full_outer,
)
from tests.conftest import SF_SMALL


def test_full_outer_produces_all_three_activity_classes(spark):
    rows = user_daily_activity_full_outer(spark, SF_SMALL).collect()
    classes = Counter(r["activity"] for r in rows)
    assert set(classes) == {"both", "signup_only", "purchase_only"}
    for r in rows:
        if r["activity"] == "signup_only":
            assert r["n_purchases"] is None and r["n_signups"] is not None
        elif r["activity"] == "purchase_only":
            assert r["n_signups"] is None and r["n_purchases"] is not None
        else:
            assert r["n_signups"] is not None and r["n_purchases"] is not None


def test_null_semantics_both_group_kinds_exist(spark):
    rows = events_null_semantics_report(spark, SF_SMALL).collect()
    for r in rows:
        # all-null groups exist AND non-null groups exist, per type
        assert 0 < r["n_all_null_groups"] < r["n_groups"], r
        # SUM over an all-null group is NULL — never silently 0
        assert r["n_null_sums"] == r["n_all_null_groups"], r
        assert r["n_nonnull"] < r["n_rows"]
        assert r["total_hv"] > 0


def test_bookends_nth_null_and_nonnull_both_exist(spark):
    rows = events_session_bookends(spark, SF_SMALL).collect()
    with_nth = [r for r in rows if r["nth_purchase"] is not None]
    without = [r for r in rows if r["nth_purchase"] is None]
    assert with_nth and without, (len(with_nth), len(without))
    for r in with_nth:
        assert r["n_purchases"] >= NTH_EVENT
    for r in without:
        assert r["n_purchases"] < NTH_EVENT
