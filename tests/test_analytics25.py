"""Unit tests for analytics25: skyline semantics against brute-force
domination, and Fellegi–Sunter band behavior on controlled record pairs."""

from __future__ import annotations

import sparkroach.queries.analytics25 as m


def _fake_part(spark, rows):
    """rows: (p_partkey, price, size)."""
    return spark.createDataFrame(
        [
            (k, f"part{k}", "B", "T", int(s), float(p))
            for k, p, s in rows
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )


def _brute_frontier(rows):
    out = []
    for k, p, s in rows:
        dominated = any(
            (q_p <= p and q_s >= s and (q_p < p or q_s > s))
            for q_k, q_p, q_s in rows
            if q_k != k
        )
        if not dominated:
            out.append(k)
    return sorted(out)


def test_pareto_frontier_matches_brute_force(spark, monkeypatch):
    # ties in price, ties in size, exact duplicate points, a dominated
    # cheap-small point, and a frontier staircase
    rows = [
        (1, 10.0, 5),
        (2, 10.0, 9),   # same price, bigger: dominates 1
        (3, 12.0, 9),   # same size as 2 at higher price: dominated
        (4, 12.0, 15),
        (5, 15.0, 15),  # dominated by 4 (same size, cheaper exists)
        (6, 15.0, 20),
        (7, 8.0, 3),    # cheapest: frontier regardless of size
        (8, 10.0, 9),   # exact duplicate of 2: BOTH on the frontier
        (9, 20.0, 20),  # same size as 6 at higher price: dominated
        (10, 20.0, 25),
    ]
    monkeypatch.setattr(
        m, "load", lambda s, d, n: _fake_part(spark, rows)
    )
    got = sorted(
        r["p_partkey"] for r in m.part_pareto_frontier(spark, "x").collect()
    )
    assert got == _brute_frontier(rows)
    assert 2 in got and 8 in got  # duplicate frontier points both kept


def test_pareto_frontier_single_row(spark, monkeypatch):
    rows = [(1, 5.0, 1)]
    monkeypatch.setattr(m, "load", lambda s, d, n: _fake_part(spark, rows))
    got = m.part_pareto_frontier(spark, "x").collect()
    assert [r["p_partkey"] for r in got] == [1]


def _fake_customer(spark, rows):
    """rows: (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)."""
    return spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )


def test_linkage_clean_true_pair_is_match(spark, monkeypatch):
    # custkey 1: no residue fires (1 % 5,7,11,13 != 0) → the dirty twin
    # is identical → score 40+8+10 = 58 ≥ 38 → match, and it is true
    rows = [(1, "Customer#000000001", 3, 100.0, "BUILDING")]
    monkeypatch.setattr(m, "load", lambda s, d, n: _fake_customer(spark, rows))
    got = {r["band"]: r for r in m.customer_record_linkage(spark, "x").collect()}
    assert set(got) == {"match"}
    assert got["match"]["n_pairs"] == 1
    assert got["match"]["n_true_pairs"] == 1
    assert got["match"]["score_min"] == 58


def test_linkage_name_truncation_lands_in_match_band(spark, monkeypatch):
    # custkey 7: name loses its last char (prefix weight 18), segment
    # and balance agree → 18+8+10 = 36 < 38 → 'possible', not match:
    # the clerical-review band is doing its job
    rows = [(7, "Customer#000000007", 3, 100.0, "BUILDING")]
    monkeypatch.setattr(m, "load", lambda s, d, n: _fake_customer(spark, rows))
    got = {r["band"]: r for r in m.customer_record_linkage(spark, "x").collect()}
    assert set(got) == {"possible"}
    assert got["possible"]["score_min"] == 36
    assert got["possible"]["n_true_pairs"] == 1


def test_linkage_corrupted_block_key_loses_the_true_pair(spark, monkeypatch):
    # custkey 13: dirty nation = 14 ≠ 13 → the true pair never co-blocks;
    # with a second customer in nation 14 the dirty row pairs with IT
    # (a non-match) instead — the measured blocking-recall loss
    rows = [
        (13, "Customer#000000013", 13, 100.0, "BUILDING"),
        (2, "Customer#000000002", 14, 500.0, "MACHINERY"),
    ]
    monkeypatch.setattr(m, "load", lambda s, d, n: _fake_customer(spark, rows))
    got = {r["band"]: r for r in m.customer_record_linkage(spark, "x").collect()}
    # pairs: clean#2(nation14) × dirty#13(nation→14), clean#2 × dirty#2,
    # and clean#13 pairs with nobody (no dirty row has nation 13)
    total_true = sum(r["n_true_pairs"] for r in got.values())
    assert total_true == 1  # only custkey 2's own pair survives blocking
    total_pairs = sum(r["n_pairs"] for r in got.values())
    assert total_pairs == 2
