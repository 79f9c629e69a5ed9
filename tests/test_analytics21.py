"""Wave-11 pins: approx-quantile band certification, containment vs
brute-force set math, triplet margin semantics, and YoY seasonality."""

from __future__ import annotations

import pandas as pd

from sparkroach.queries import QUERIES
from tests.conftest import SF_SMALL


def test_approx_quantile_band_and_exact_ranks(spark):
    rows = QUERIES["events_approx_quantile_check"].fn(spark, SF_SMALL).collect()
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["cents"] = (ev["value"] * 100).apply(int)  # value >= 0: int == floor
    assert len(rows) == ev.event_type.nunique()
    for r in rows:
        g = sorted(ev[ev.event_type == r.event_type]["cents"])
        n = len(g)
        assert r.n_events == n
        assert r.p40_cents == g[(4 * n + 9) // 10 - 1]
        assert r.p60_cents == g[(6 * n + 9) // 10 - 1]
        assert r.p40_cents <= r.p60_cents
        assert r.approx_in_band == 1  # the GK claim actually held


def test_containment_matches_set_math_and_catches_asymmetry(spark):
    rows = QUERIES["doc_containment_pairs"].fn(spark, SF_SMALL).collect()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")

    def shingles(t):
        ws = str(t).split(" ")
        return {f"{a} {b}" for a, b in zip(ws, ws[1:])}

    sh = {r.doc_id: shingles(r.text) for r in docs.itertuples()}
    assert len(rows) > 0
    for r in rows:
        a, b = sh[r.doc_a], sh[r.doc_b]
        assert r.inter == len(a & b)
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert r.containment == len(a & b) / min(len(a), len(b))
        assert r.near_containment == (1 if 10 * r.inter >= 9 * min(len(a), len(b)) else 0)
    # containment >= jaccard always; strictly greater for size-skewed pairs
    assert all(
        r.containment >= r.inter / (r.n_a + r.n_b - r.inter) for r in rows
    )
    assert any(r.near_containment == 1 for r in rows)


def test_triplets_margin_positive_and_extremes(spark):
    rows = QUERIES["embedding_triplet_mining"].fn(spark, SF_SMALL).collect()
    assert len(rows) > 0
    from sparkroach.queries.llm_ops4 import _knn_scored_pairs

    pairs = _knn_scored_pairs(spark, SF_SMALL).collect()
    nbrs: dict[int, list[tuple[float, int]]] = {}
    for p in pairs:
        nbrs.setdefault(p.a_id, []).append((p.cosine, p.b_id))
        nbrs.setdefault(p.b_id, []).append((p.cosine, p.a_id))
    got = {r.anchor_id: r for r in rows}
    for vid, ns in nbrs.items():
        best = max(ns, key=lambda t: (t[0], -t[1]))
        worst = min(ns, key=lambda t: (t[0], t[1]))
        if best[0] > worst[0]:
            r = got[vid]
            assert (r.pos_id, r.pos_cos) == (best[1], best[0])
            assert (r.neg_id, r.neg_cos) == (worst[1], worst[0])
            assert r.margin == r.pos_cos - r.neg_cos > 0
        else:
            assert vid not in got  # all-tied anchors yield no triplet
    assert set(got) <= set(nbrs)


def test_seasonality_yoy_alignment(spark):
    rows = QUERIES["orders_monthly_seasonality"].fn(spark, SF_SMALL).collect()
    rev = {(r.yr, r.mo): r.revenue_cents for r in rows}
    assert len(rows) > 12  # spans multiple years
    first_year = min(r.yr for r in rows)
    for r in rows:
        prev = rev.get((r.yr - 1, r.mo))
        assert r.prev_year_cents == prev
        if prev is None:
            assert r.yoy_ratio is None
            assert r.yr == first_year or (r.yr - 1, r.mo) not in rev
        else:
            assert r.yoy_ratio == r.revenue_cents / prev
    assert any(r.yoy_ratio is not None for r in rows)
