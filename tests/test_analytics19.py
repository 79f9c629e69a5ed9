"""Wave-9 pins: gaps-and-islands streaks, bitmap-overlap exactness,
dyadic-EWMA bit identity, changed-bucket diff consistency, k-anonymity
monotonicity, and the CMS inner-product bound."""

from __future__ import annotations

import pandas as pd

from sparkroach.queries import QUERIES
from tests.conftest import SF_SMALL

US_PER_DAY = 86_400_000_000


def _events_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/events.parquet")


def test_streaks_match_python_recompute(spark):
    df = QUERIES["events_active_day_streaks"].fn(spark, SF_SMALL)
    got = {r.user_id: (r.active_days, r.n_streaks, r.longest_streak)
           for r in df.collect()}
    ev = _events_pdf()
    ev["day"] = ev["ts"].values.astype("datetime64[us]").astype("int64") \
        // US_PER_DAY
    for uid, days in ev.groupby("user_id")["day"]:
        ds = sorted(set(days))
        runs, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert got[uid] == (len(ds), len(runs), max(runs)), uid
    # non-vacuous: somebody has more than one streak
    assert any(v[1] > 1 for v in got.values())


def test_bitmap_pairs_match_set_intersection(spark):
    df = QUERIES["user_activity_bitmap_pairs"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) == 28  # C(8, 2)
    ev = _events_pdf()
    ev["day"] = ev["ts"].values.astype("datetime64[us]").astype("int64") \
        // US_PER_DAY
    daysets = {u: set(d % 62 for d in g)
               for u, g in ev.groupby("user_id")["day"]}
    for r in rows:
        a, b = daysets[r.user_a], daysets[r.user_b]
        assert r.days_a == len(a) and r.days_b == len(b)
        assert r.common_days == len(a & b)
        assert r.union_days == len(a | b)
        assert r.day_jaccard == len(a & b) / len(a | b)


def test_ewma_bit_identical_to_python(spark):
    df = QUERIES["events_ewma_dyadic"].fn(spark, SF_SMALL)
    got = {r.event_id: r.ewma for r in df.collect()}
    ev = _events_pdf()
    ev["t_us"] = ev["ts"].values.astype("datetime64[us]").astype("int64")
    uid = int(ev["user_id"].iloc[0])
    g = ev[ev["user_id"] == uid].sort_values(["t_us", "event_id"])
    vals = list(g["value"])
    ids = list(g["event_id"])
    for n in range(7, len(vals)):
        expect = vals[n] / 2
        for i in range(1, 8):
            expect = expect + vals[n - i] / (2 ** (i + 1))
        assert got[ids[n]] == expect  # bit-exact, not approx
    # rows with fewer than 8 predecessors are excluded
    assert ids[0] not in got and ids[6] not in got


def test_table_diff_changed_iff_row_level_difference(spark):
    df = QUERIES["table_diff_buckets"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert [r.bucket for r in rows] == sorted(r.bucket for r in rows)
    for r in rows:
        total = r.n_added + r.n_removed + r.n_modified
        if r.status == "clean":
            assert total == 0, r
        else:
            assert total >= 1, r  # a checksum mismatch implies a real diff
    # the mutation rules are all non-vacuous at sf0.001
    assert sum(r.n_added for r in rows) >= 1
    assert sum(r.n_removed for r in rows) >= 1
    assert sum(r.n_modified for r in rows) >= 1
    assert any(r.status == "clean" for r in rows)  # certification happens


def test_k_anonymity_monotone_up_the_ladder(spark):
    df = QUERIES["customer_k_anonymity_ladder"].fn(spark, SF_SMALL)
    rows = sorted(df.collect(), key=lambda r: r.level)
    assert [r.level for r in rows] == [0, 1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        # coarsening only merges classes: risk and class count shrink
        assert b.rows_at_risk <= a.rows_at_risk
        assert b.n_classes <= a.n_classes
    assert rows[0].rows_at_risk > 0  # finest level genuinely leaks


def test_cms_join_estimate_bounds_exact(spark):
    r = QUERIES["cms_join_size_estimate"].fn(spark, SF_SMALL).collect()[0]
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    # every lineitem has exactly one order: exact join size == |lineitem|
    assert r.exact_rows == len(li)
    assert r.overestimate >= 0  # CMS inner product never underestimates
    assert r.cms_est == r.exact_rows + r.overestimate
    assert r.rel_err == r.overestimate / r.exact_rows
