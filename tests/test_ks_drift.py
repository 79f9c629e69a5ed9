"""events_value_ks_drift (analytics16.py) pins.

Value correctness is swept by the DuckDB oracle gate at three SFs
(tests/test_oracle_gate.py); here: the KS invariants, the exactness of
the rational arithmetic against an independent in-memory computation,
and the dual-counter packing contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from sparkroach.queries import QUERIES
from sparkroach.tables import load
from tests.conftest import SF_SMALL


def test_ks_invariants_and_independent_recompute(spark):
    r = QUERIES["events_value_ks_drift"].fn(spark, SF_SMALL).collect()[0]
    # KS statistic is a probability-scale distance
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.ks_numer >= 0
    assert r.ks_stat == r.ks_numer / (r.n_a * r.n_b)

    # independent recompute: plain python over the collected values
    ev = (
        load(spark, SF_SMALL, "events")
        .where(F.col("value").isNotNull())
        .select(F.unix_micros("ts").alias("t"), "value")
        .collect()
    )
    ts = [row.t for row in ev]
    mid = (min(ts) + max(ts)) // 2
    a = sorted(row.value for row in ev if row.t < mid)
    b = sorted(row.value for row in ev if row.t >= mid)
    assert (len(a), len(b)) == (r.n_a, r.n_b)
    import bisect

    best = 0
    for v in sorted(set(a) | set(b)):
        ra = bisect.bisect_right(a, v)
        rb = bisect.bisect_right(b, v)
        best = max(best, abs(ra * len(b) - rb * len(a)))
    assert best == r.ks_numer


def test_dual_counter_packing_headroom(spark):
    """The single-pass packing (ca*2^32 + cb) rides a SIGNED 64-bit long,
    so it is exact only while each sample's running count stays below
    2^31 (the high half ra*2^32 must stay under 2^63; this also keeps
    |ra*n_b - rb*n_a| < 2^62) — assert the corpus is inside the
    contract.  (The r6 advice found the earlier 2^32 claim off by 2:
    the region 2^31..2^32 passed the stated contract yet overflowed.)"""
    ev = (
        load(spark, SF_SMALL, "events")
        .where(F.col("value").isNotNull())
        .count()
    )
    assert ev < 2**31


def test_packing_overflow_guard_raises(spark, monkeypatch):
    """Beyond the 2^31-per-sample bound the query must RAISE, not return
    silently corrupted numerators.  Exercised by shrinking the module
    bound instead of materializing 2^31 rows."""
    import pytest

    from sparkroach.queries import analytics16

    monkeypatch.setattr(analytics16, "_KS_PACK_MAX", 4)
    with pytest.raises(Exception, match="below 2\\^31 rows per sample"):
        QUERIES["events_value_ks_drift"].fn(spark, SF_SMALL).collect()
