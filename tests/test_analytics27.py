"""Unit tests for the Benford audit: integer digit extraction, constant
fidelity, and deviation arithmetic on a controlled column."""

from __future__ import annotations

import math

import sparkroach.queries.analytics27 as m


def test_benford_constants_are_log10_to_12_decimals():
    for d, p in m._BENFORD_P.items():
        assert abs(float(p) - math.log10(1 + 1 / d)) < 5e-13, d
    # a proper probability vector (12-decimal rounding leaves ~1e-12 slack)
    assert abs(sum(float(p) for p in m._BENFORD_P.values()) - 1.0) < 1e-11


def _fake_orders(spark, prices):
    return spark.createDataFrame(
        [(i, i % 10, "O", float(p), "1995-01-01") for i, p in enumerate(prices)],
        "o_orderkey long, o_custkey int, o_orderstatus string, "
        "o_totalprice double, o_orderdate string",
    )


def test_digit_extraction_from_cents_not_floats(spark, monkeypatch):
    # 0.09 → 9 cents → digit 9; 1234.5 → 123450 cents → digit 1;
    # 0.001 rounds to 0 cents → EXCLUDED (c > 0 guard);
    # 9.995 → 999.5 cents → round-half-even/up boundary: both engines
    # round(999.5) the same way through the shared SQL round()
    prices = [0.09, 1234.5, 0.001, 55.55, 700.0]
    monkeypatch.setattr(m, "load", lambda s, d, n: _fake_orders(spark, prices))
    rows = {r["digit"]: r for r in m.orders_benford_audit(spark, "x").collect()}
    assert set(rows) == set(range(1, 10))  # all digits present, zeros filled
    assert rows[9]["observed"] == 1  # 0.09
    assert rows[1]["observed"] == 1  # 1234.5
    assert rows[5]["observed"] == 1  # 55.55
    assert rows[7]["observed"] == 1  # 700.0
    n = sum(r["observed"] for r in rows.values())
    assert n == 4  # the 0-cent row is excluded

    for r in rows.values():
        want = float(m._BENFORD_P[r["digit"]]) * n
        assert abs(float(r["expected_q"]) - want) < 1e-6
        assert abs(
            float(r["deviation_q"]) - (r["observed"] - want)
        ) < 1e-6


def test_corr_matrix_matches_numpy(spark, monkeypatch):
    import numpy as np

    rng = np.random.RandomState(7)
    n = 400
    qty = rng.randint(1, 50, n).astype(float)
    price = qty * 1000 + rng.randint(0, 10000, n)  # correlated with qty
    disc = rng.randint(0, 10, n) / 100.0
    tax = rng.randint(0, 8, n) / 100.0
    rows = [
        (int(i), 0, 0, 1, float(qty[i]), float(price[i]) / 100.0,
         float(disc[i]), float(tax[i]), "N", "O", "1995-01-01")
        for i in range(n)
    ]

    def fake_load(s, d, name):
        return spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate string",
        )

    monkeypatch.setattr(m, "load", fake_load)
    got = {
        (r["col_x"], r["col_y"]): r["r"]
        for r in m.lineitem_corr_matrix(spark, "x").collect()
    }
    assert len(got) == 6
    cols = {
        "l_quantity": np.round(qty * 100),
        "l_extendedprice": np.round(price / 100.0 * 100),
        "l_discount": np.round(disc * 100),
        "l_tax": np.round(tax * 100),
    }
    for (a, b), r in got.items():
        want = np.corrcoef(cols[a], cols[b])[0, 1]
        assert abs(r - want) < 1e-9, (a, b, r, want)
    # the planted correlation is strong and positive
    assert got[("l_extendedprice", "l_quantity")
               if ("l_extendedprice", "l_quantity") in got
               else ("l_quantity", "l_extendedprice")] > 0.9


def _py_cusum(ds):
    s, out = 0, []
    for d in ds:
        s = max(0, s + d)
        out.append(s)
    return out


def test_cusum_maxplus_identity():
    """The closed form the operator relies on: S_t = P_t - min(0,
    min_{j<=t} P_j) equals the sequential recurrence, on adversarial
    sign patterns."""
    import itertools

    for ds in itertools.product([-3, -1, 0, 2, 5], repeat=6):
        seq = _py_cusum(ds)
        p = m2 = 0
        for t, d in enumerate(ds):
            p += d
            m2 = min(m2, p)
            assert seq[t] == p - min(0, m2), (ds, t)


def test_cusum_detects_a_planted_shift(spark, monkeypatch):
    """Pre-shift values sit below the reference level k (CUSUM decays
    to 0); a planted shifted segment pushes values above k and the peak
    statistic must land exactly at the segment's end with the exact
    cumulated exceedance."""
    import datetime

    k = m._CUSUM_K  # cents
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        v = 30.0  # 3000 cents, 2000 below k
        if 120 <= i < 150:
            v = 80.0  # 8000 cents, 3000 above k: the shift
        rows.append((i, base + datetime.timedelta(minutes=i), i % 7,
                     "click", v, "{}"))

    def fake_load(s, d, n):
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )

    monkeypatch.setattr(m, "load", fake_load)
    got = m.events_cusum_drift(spark, "x").collect()[0]
    # 30 shifted points, each 8000 - k cents above the reference
    want_peak = 30 * (8000 - k)
    assert got["max_cusum"] == want_peak
    peak_ts = base + datetime.timedelta(minutes=149)
    assert got["peak_t_us"] == int(peak_ts.timestamp() * 1_000_000)
