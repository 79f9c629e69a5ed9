"""Round-8 wave unit pins: ordered funnel greedy semantics, l-diversity
verdicts, degree-oriented triangle counting, deterministic bootstrap."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from sparkroach.queries import QUERIES
from sparkroach.queries.analytics28 import _B, _POIS, _w_sql, triangle_stats
from tests.conftest import SF_SMALL


def _ts(h, m=0):
    return datetime.datetime(2024, 3, 1, h, m)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_greedy_earliest_semantics(spark, tmp_path):
    """The EARLIEST qualifying step-2 anchors step 3 — a later step-2
    that would have enabled a conversion does not resurrect the user
    (strict windowFunnel semantics, pinned so both engines implement
    the same deterministic rule)."""
    rows = [
        # user 1: view 08:00 → click 09:00 → purchase 10:00 (converts)
        (_ts(8), 1, "view"), (_ts(9), 1, "click"), (_ts(10), 1, "purchase"),
        # user 2: view 08:00; clicks at 09:00 AND 13:00; purchase 17:00.
        # greedy t2 = 09:00 → purchase must land by 15:00 → NOT step3,
        # even though the 13:00 click would have chained to 17:00.
        (_ts(8), 2, "view"), (_ts(9), 2, "click"), (_ts(13), 2, "click"),
        (_ts(17), 2, "purchase"),
        # user 3: view only
        (_ts(8), 3, "view"),
        # user 4: click before any view — never enters the funnel
        (_ts(8), 4, "click"), (_ts(9), 4, "purchase"),
        # user 5: view 08:00, click 16:00 (> 6h gap) — step 2 missed
        (_ts(8), 5, "view"), (_ts(16), 5, "click"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["events_ordered_funnel_maxgap"].fn(spark, sf).collect()[0]
    assert out["n_step1"] == 4  # users 1, 2, 3, 5 viewed
    assert out["n_step2"] == 2  # users 1, 2 clicked within 6h of view
    assert out["n_step3"] == 1  # only user 1 — user 2's greedy t2 expires
    assert out["conv_13"] == 0.25


def test_l_diversity_flags_homogeneous_groups(spark, tmp_path):
    rows = [
        # nation 0 / seg A: 3 customers, all in the SAME $1000 band → l=1
        (1, "a", 0, 500.0, "A"), (2, "b", 0, 600.0, "A"), (3, "c", 0, 700.0, "A"),
        # nation 1 / seg B: 3 customers in 3 distinct bands → l=3, diverse
        (4, "d", 1, 500.0, "B"), (5, "e", 1, 1500.0, "B"), (6, "f", 1, 2500.0, "B"),
        # nation 2 / seg C: negative balances exercise the +shift DIV path
        (7, "g", 2, -999.99, "C"), (8, "h", 2, -1.0, "C"), (9, "i", 2, 999.0, "C"),
    ]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = {
        (r["nationkey"], r["mktsegment"]): r
        for r in QUERIES["customer_l_diversity_report"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[(0, "A")]["l_distinct"] == 1 and not out[(0, "A")]["is_diverse"]
    assert out[(1, "B")]["l_distinct"] == 3 and out[(1, "B")]["is_diverse"]
    # -999.99 and -1.00 share the [-1000, 0) band; 999 is its own
    assert out[(2, "C")]["l_distinct"] == 2


def _tri(spark, pairs):
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return triangle_stats(edges).collect()[0]


def test_triangle_count_k4(spark):
    # K4: 6 edges, C(4,3)=4 triangles, wedges=4*C(3,2)=12, trans=3*4/12=1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _tri(spark, k4)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["n_wedges"] == 12 and r["transitivity"] == 1.0


def test_triangle_count_path_has_none(spark):
    r = _tri(spark, [(0, 1), (1, 2), (2, 3)])
    assert r["n_triangles"] == 0 and r["transitivity"] == 0.0
    assert r["n_wedges"] == 2  # the two interior nodes


def test_triangle_count_two_sharing_an_edge(spark):
    # 0-1-2 triangle + 1-2-3 triangle share edge (1,2)
    r = _tri(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    assert r["n_triangles"] == 2


def test_bootstrap_weights_follow_the_literal_cdf(spark):
    # the inverse-CDF CASE maps u to exactly the documented weights
    df = spark.createDataFrame(
        [(u,) for u in [0, _POIS[0] - 1, _POIS[0], _POIS[1], _POIS[2],
                        _POIS[3] - 1, _POIS[3], 999999]],
        "u long",
    ).select("u", F.expr(_w_sql("u")).alias("w"))
    got = {r["u"]: r["w"] for r in df.collect()}
    assert got[0] == 0 and got[_POIS[0] - 1] == 0
    assert got[_POIS[0]] == 1 and got[_POIS[1]] == 2
    assert got[_POIS[2]] == 3 and got[_POIS[3] - 1] == 3
    assert got[_POIS[3]] == 4 and got[999999] == 4


def test_bootstrap_ci_brackets_and_is_deterministic(spark):
    fn = QUERIES["bootstrap_mean_ci"].fn
    a = {r["source"]: r for r in fn(spark, SF_SMALL).collect()}
    b = {r["source"]: r for r in fn(spark, SF_SMALL).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for src, r in a.items():
        assert r["n_resamples"] <= _B
        assert r["ci_lo"] <= r["ci_hi"]
        # a 2.5-97.5-ish interval over resample MEANS surrounds the point
        # estimate on any non-degenerate source
        assert r["ci_lo"] <= r["mean_len"] <= r["ci_hi"]
        assert (r["ci_lo"], r["ci_hi"]) == (b[src]["ci_lo"], b[src]["ci_hi"])


def test_zone_map_report_sorted_layout_properties(spark):
    """Dedicated pin for the self-materializing zone-map gate (it writes
    real files; joins test_plans._MATERIALIZED): ranks are contiguous,
    per-file ranges are valid and non-overlapping in rank order (the
    sorted-layout guarantee that makes skipping contiguous), row total
    equals the table, and skippable agrees with the bounds."""
    from sparkroach.queries.analytics28 import (
        ZONE_FILES,
        ZONE_HI,
        ZONE_LO,
    )
    from sparkroach.tables import load

    rows = sorted(
        QUERIES["events_zone_map_report"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r["file_rank"],
    )
    assert [r["file_rank"] for r in rows] == list(range(1, ZONE_FILES + 1))
    total = load(spark, SF_SMALL, "events").count()
    assert sum(r["n_rows"] for r in rows) == total
    for r in rows:
        assert r["min_us"] <= r["max_us"]
        assert r["skippable"] == (
            r["max_us"] < ZONE_LO or r["min_us"] >= ZONE_HI
        )
    # range-partitioned on ts → file ranges don't overlap in rank order
    for a, b in zip(rows, rows[1:]):
        assert a["max_us"] <= b["min_us"]
