"""Round-8 wave-4 unit pins: ACF grid algebra and Theil–Sen medians
against independent numpy references on controlled series."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkroach.queries import QUERIES
from tests.conftest import SF_SMALL


def _acf_ref(x: np.ndarray, k: int) -> float:
    """Textbook (statsmodels-convention) ACF estimator at lag k."""
    n = len(x)
    mu = x.mean()
    num = ((x[: n - k] - mu) * (x[k:] - mu)).sum()
    den = ((x - mu) ** 2).sum()
    return float(num / den)


def test_acf_grid_algebra_matches_textbook_estimator():
    # the exact-integer algebra n²C_k − nS(H_k+T_k) + (n−k)S² over a
    # zero-filled grid must equal the centered-product estimator
    rng = np.random.default_rng(3)
    x = np.zeros(500, dtype=np.int64)
    present = rng.choice(500, size=350, replace=False)
    x[present] = rng.integers(0, 100_000, size=350)
    n = len(x)
    s = int(x.sum())
    ss = int((x.astype(object) ** 2).sum())
    for k in range(1, 9):
        c = int((x[: n - k].astype(object) * x[k:].astype(object)).sum())
        h = int(x[: n - k].sum())
        t = int(x[k:].sum())
        num = n * n * c - n * s * (h + t) + (n - k) * s * s
        den = n * n * ss - n * s * s
        assert float(num) / float(den) == pytest.approx(
            _acf_ref(x.astype(float), k), abs=1e-12
        )


def test_events_minute_acf_gate_matches_numpy(spark):
    import duckdb

    rows = QUERIES["events_minute_acf"].fn(spark, SF_SMALL).collect()
    assert [r["lag"] for r in rows] == list(range(1, 9))
    con = duckdb.connect()
    mins = con.execute(
        "SELECT epoch_us(ts::TIMESTAMP) // 60000000 AS t, "
        "SUM(CAST(round(value*100) AS BIGINT)) AS x "
        f"FROM read_parquet('{SF_SMALL}/events.parquet') GROUP BY 1"
    ).fetchall()
    t0 = min(t for t, _ in mins)
    t1 = max(t for t, _ in mins)
    x = np.zeros(t1 - t0 + 1)
    for t, v in mins:
        x[t - t0] = v
    for r in rows:
        assert r["n_grid"] == len(x)
        assert r["acf"] == pytest.approx(_acf_ref(x, r["lag"]), abs=1e-9)
    # a 10-minute-cadence event stream is strongly positively
    # autocorrelated at lag 0±ε but near-noise by construction here;
    # just pin the mathematical range
    assert all(-1.0 <= r["acf"] <= 1.0 for r in rows)


def _theil_sen_ref(ts, ys):
    slopes = []
    for i in range(len(ts)):
        for j in range(i + 1, len(ts)):
            slopes.append(
                ((ys[j] - ys[i]) / (ts[j] - ts[i]), ts[i], ts[j])
            )
    slopes.sort()
    n_pairs = len(slopes)
    s6 = round(slopes[(n_pairs + 1) // 2 - 1][0], 6)
    t0 = min(ts)
    devs = sorted(
        (y - round(s6 * (t - t0), 6), t) for t, y in zip(ts, ys)
    )
    i6 = round(devs[(len(ts) + 1) // 2 - 1][0], 6)
    return n_pairs, s6, i6


def test_events_hourly_theil_sen_matches_reference(spark):
    import duckdb

    row = QUERIES["events_hourly_theil_sen"].fn(spark, SF_SMALL).collect()[0]
    con = duckdb.connect()
    hrs = con.execute(
        "SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS t, "
        "SUM(CAST(round(value*100) AS BIGINT)) AS y "
        f"FROM read_parquet('{SF_SMALL}/events.parquet') "
        "GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ts = [t for t, _ in hrs]
    ys = [float(y) for _, y in hrs]
    n_pairs, s6, i6 = _theil_sen_ref(ts, ys)
    assert row["n_points"] == len(ts)
    assert row["n_pairs"] == n_pairs
    assert row["sen_slope_r6"] == pytest.approx(s6, abs=2e-6)
    assert row["sen_intercept_r6"] == pytest.approx(i6, abs=2e-6)


def _gini_ref(xs):
    xs = sorted(xs)
    n = len(xs)
    return (
        sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        / (n * sum(xs))
    )


def test_gini_identity_edges():
    assert _gini_ref([5, 5, 5, 5]) == 0.0  # uniform
    n = 10
    assert _gini_ref([0] * (n - 1) + [100]) == pytest.approx((n - 1) / n)


def test_user_activity_gini_gate_matches_numpy(spark):
    import duckdb

    row = QUERIES["user_activity_gini"].fn(spark, SF_SMALL).collect()[0]
    con = duckdb.connect()
    xs = [
        r[0]
        for r in con.execute(
            "SELECT SUM(CAST(round(value*100) AS BIGINT)) FROM "
            f"read_parquet('{SF_SMALL}/events.parquet') GROUP BY user_id"
        ).fetchall()
    ]
    assert row["n_users"] == len(xs)
    assert row["total_cents"] == sum(xs)
    assert row["gini"] == pytest.approx(_gini_ref(xs), abs=2e-9)
    assert 0 <= row["gini"] < 1


def test_markov_stationary_matches_eigenvector(spark):
    rows = QUERIES["events_markov_stationary"].fn(spark, SF_SMALL).collect()
    states = [r["state"] for r in rows]
    assert len(states) == 5
    # converged: the quantized fixed point stopped moving
    assert all(r["last_delta_q8"] <= 1 for r in rows)
    # and sits on the true stationary eigenvector of the float matrix
    import duckdb

    con = duckdb.connect()
    cnt = con.execute(
        "WITH p AS (SELECT user_id, event_type, lead(event_type) OVER ("
        "PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id"
        ") AS nxt FROM "
        f"read_parquet('{SF_SMALL}/events.parquet')) "
        "SELECT event_type, nxt, COUNT(*) FROM p WHERE nxt IS NOT NULL "
        "GROUP BY 1, 2"
    ).fetchall()
    idx = {s: i for i, s in enumerate(states)}
    mat = np.zeros((5, 5))
    for a, b, c in cnt:
        mat[idx[a], idx[b]] = c
    mat /= mat.sum(axis=1, keepdims=True)
    evals, evecs = np.linalg.eig(mat.T)
    pi = np.real(evecs[:, np.argmax(np.real(evals))])
    pi = pi / pi.sum()
    for r in rows:
        assert r["stationary_q8"] / 1e8 == pytest.approx(
            pi[idx[r["state"]]], abs=1e-4
        )


def test_events_sax_words_match_python_reference(spark):
    import duckdb

    rows = QUERIES["events_sax_quantile_words"].fn(spark, SF_SMALL).collect()
    con = duckdb.connect()
    hrs = dict(
        con.execute(
            "SELECT epoch_us(ts::TIMESTAMP) // 3600000000, "
            "SUM(CAST(round(value*100) AS BIGINT)) FROM "
            f"read_parquet('{SF_SMALL}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    h0 = min(hrs)
    segs: dict = {}
    for hr, y in hrs.items():
        key = ((hr - h0) // 6, (hr - h0) // 24, ((hr - h0) % 24) // 6)
        segs[key] = segs.get(key, 0) + y
    ordered = sorted((v, s) for (s, _d, _sl), v in segs.items())
    n = len(ordered)
    cuts = [ordered[(k * n + 3) // 4 - 1][0] for k in (1, 2, 3)]

    def sym(v):
        if v <= cuts[0]:
            return "a"
        if v <= cuts[1]:
            return "b"
        if v <= cuts[2]:
            return "c"
        return "d"

    words: dict = {}
    for (s, d, sl), v in sorted(segs.items(), key=lambda kv: kv[0][2]):
        words.setdefault(d, {})[sl] = sym(v)
    got = {r["day"]: r["word"] for r in rows}
    assert set(got) == set(words)
    for d, slots in words.items():
        assert got[d] == "".join(slots[k] for k in sorted(slots)), d
    # the alphabet is balanced by construction: each letter covers
    # roughly a quarter of the segments
    from collections import Counter

    letters = Counter(c for w in got.values() for c in w)
    assert set(letters) == {"a", "b", "c", "d"}
    assert max(letters.values()) <= 2 * min(letters.values())


def test_hilbert_curve_reference_properties():
    from sparkroach.functions.hilbert import HILBERT_SIDE, d2xy, xy2d

    # bijection + the defining property: consecutive indices are
    # ALWAYS Manhattan-adjacent cells (checked on the full order-4
    # grid; order-8 spot-checked below)
    n = 16
    cells = sorted(
        (xy2d(x, y, side=n), x, y) for x in range(n) for y in range(n)
    )
    assert len({c[0] for c in cells}) == n * n
    for a, b in zip(cells, cells[1:]):
        assert abs(a[1] - b[1]) + abs(a[2] - b[2]) == 1
    for d in range(0, HILBERT_SIDE * HILBERT_SIDE, 97):
        assert xy2d(*d2xy(d)) == d


def test_hilbert_sql_stages_match_reference_exhaustively():
    import duckdb

    from sparkroach.functions.hilbert import (
        hilbert_ctes,
        morton,
        morton_sql,
        xy2d,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH g AS (SELECT a.a AS hx, a.a AS x0, b.b AS hy, b.b AS y0,
                          0 AS hd
                   FROM range(0, 256) a(a), range(0, 256) b(b)),
        {hilbert_ctes("g")}
        SELECT x0, y0, hd, {morton_sql("x0", "y0", div="//")} AS z
        FROM hfin
        """
    ).fetchall()
    assert len(rows) == 65536
    for x, y, hd, z in rows:
        assert hd == xy2d(x, y) and z == morton(x, y)


def test_hilbert_locality_gate_beats_zorder(spark):
    row = QUERIES["events_hilbert_locality_report"].fn(spark, SF_SMALL).collect()[0]
    assert row["n_cells"] > 100
    # the entire point: the Hilbert walk over occupied cells travels
    # less and lands on grid-adjacent neighbors more often than Z-order
    assert (
        row["hilbert_path_manhattan"] < row["zorder_path_manhattan"]
    ), row
    assert (
        row["hilbert_adjacent_pairs"] >= row["zorder_adjacent_pairs"]
    ), row
    assert 0 < row["locality_ratio"] < 1


def test_lineitem_ols_matches_numpy_least_squares(spark):
    import duckdb

    row = QUERIES["lineitem_ols_cramer"].fn(spark, SF_SMALL).collect()[0]
    con = duckdb.connect()
    data = con.execute(
        "SELECT CAST(round(l_quantity) AS BIGINT), "
        "CAST(round(l_discount*100) AS BIGINT), "
        "CAST(round(l_extendedprice*100) AS BIGINT) FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    ).fetchall()
    x = np.array([r[0] for r in data], dtype=float)
    z = np.array([r[1] for r in data], dtype=float)
    y = np.array([r[2] for r in data], dtype=float)
    a = np.column_stack([np.ones_like(x), x, z])
    beta = np.linalg.lstsq(a, y, rcond=None)[0]
    assert row["n_rows"] == len(x)
    # Cramer over exact integers == numpy LSQ to quantization precision
    assert row["beta0_q6"] / 1e6 == pytest.approx(beta[0], abs=2e-5)
    assert row["beta1_q6"] / 1e6 == pytest.approx(beta[1], abs=2e-5)
    assert row["beta2_q6"] / 1e6 == pytest.approx(beta[2], abs=2e-5)
    # the quantized fit's residual aggregate is reproducible EXACTLY —
    # in python ints (a numpy float64 sum already rounds at ~1.5e16)
    resid = sum(
        abs(
            1_000_000 * yi
            - (
                row["beta0_q6"]
                + row["beta1_q6"] * xi
                + row["beta2_q6"] * zi
            )
        )
        for xi, zi, yi in data
    )
    assert row["sae_q6"] == resid


def _ams_squares(counts, salt, k=24):
    """Reference AMS estimator squares S_j² for one salt."""
    import hashlib

    sums = []
    for j in range(k):
        s = 0
        for u, cnt in counts.items():
            h = int(
                hashlib.md5(f"{salt}:{j}:{u}".encode()).hexdigest()[:8], 16
            )
            s += cnt if h % 2 == 0 else -cnt
        sums.append(s * s)
    return sums


def test_ams_estimator_unbiased_mean_and_concentrated_median():
    rng = np.random.default_rng(12)
    counts = {int(u): int(c) for u, c in enumerate(rng.integers(1, 60, 80))}
    f2 = sum(c * c for c in counts.values())
    means, medians = [], []
    for salt in range(60):
        sq = _ams_squares(counts, salt)
        means.append(np.mean(sq))  # E[S²] = F2 exactly → unbiased
        groups = sorted(
            sum(sq[g * 4 : (g + 1) * 4]) / 4 for g in range(6)
        )
        medians.append(groups[2])  # lower median of the 6 group means
    # unbiasedness: the grand mean of squares tracks F2 tightly
    assert abs(np.mean(means) - f2) / f2 < 0.15
    # concentration: the median-of-means realization is within a small
    # constant factor essentially always (it IS median-biased low —
    # that's the outlier-robustness trade the estimator makes)
    within = sum(1 for e in medians if 0.3 * f2 < e < 3 * f2)
    assert within >= 50


def test_events_ams_f2_gate_reports_sane_error(spark):
    row = QUERIES["events_ams_f2_sketch"].fn(spark, SF_SMALL).collect()[0]
    assert row["f2_exact"] > 0
    # single fixed-hash realization: pinned loose (median-of-means with
    # 6x4 estimators is within a small constant factor w.h.p.)
    assert row["rel_err"] < 1.5


def _peel_ref(edges, k):
    """Reference k-core: peel until fixpoint, return surviving edges."""
    cur = set(edges)
    while True:
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        nxt = {(a, b) for a, b in cur if deg[a] >= k and deg[b] >= k}
        if nxt == cur:
            return cur
        cur = nxt


def test_kcore_reference_semantics():
    path = {(i, i + 1) for i in range(6)}  # path: 2-core is empty
    assert _peel_ref(path, 2) == set()
    clique = {(a, b) for a in range(4) for b in range(a + 1, 4)}
    assert _peel_ref(clique, 2) == clique  # cliques survive intact
    assert _peel_ref(clique, 3) == clique
    lollipop = {(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)}
    assert _peel_ref(lollipop, 2) == {(0, 1), (1, 2), (0, 2)}
    assert _peel_ref(lollipop, 3) == set()


def test_dup_graph_kcore_gate_invariants(spark):
    rows = {r["k"]: r for r in QUERIES["dup_graph_kcore"].fn(spark, SF_SMALL).collect()}
    assert set(rows) == {2, 3}
    for r in rows.values():
        assert r["converged"], "peeling must reach its fixpoint at test SFs"
    # the density ladder is monotone: the 3-core sits inside the 2-core
    assert rows[3]["n_core_nodes"] <= rows[2]["n_core_nodes"]
    assert rows[3]["n_core_edges"] <= rows[2]["n_core_edges"]
    # and matches the reference peeling on the real verified edge set
    import duckdb

    from sparkroach.queries.llm_ops import _JACCARD_TAU, _verified_pairs

    edges = {
        (r["doc_a"], r["doc_b"])
        for r in _verified_pairs(
            spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        )
        .where(F.col("jaccard") >= _JACCARD_TAU)
        .collect()
    }
    for k in (2, 3):
        ref = _peel_ref(edges, k)
        ref_nodes = {n for e in ref for n in e}
        assert rows[k]["n_core_edges"] == len(ref)
        assert rows[k]["n_core_nodes"] == len(ref_nodes)


def _mw_ref(xs, ys):
    """Tie-corrected Mann-Whitney z (scipy.stats.mannwhitneyu
    use_continuity=False convention), independently in numpy."""
    pooled = np.concatenate([xs, ys])
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled))
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2  # midrank, 1-based
        i = j
    n1, n2 = len(xs), len(ys)
    n = n1 + n2
    r1 = ranks[: n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2
    _, t_counts = np.unique(pooled, return_counts=True)
    tie = (t_counts.astype(object) ** 3 - t_counts).sum()
    sigma = np.sqrt(
        n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    )
    return u1, (u1 - n1 * n2 / 2) / sigma


def test_events_mann_whitney_u_matches_numpy(spark):
    import duckdb

    row = QUERIES["events_mann_whitney_u"].fn(spark, SF_SMALL).collect()[0]
    con = duckdb.connect()
    xs, ys = (
        np.array(
            [
                r[0]
                for r in con.execute(
                    "SELECT CAST(round(value*100) AS BIGINT) FROM "
                    f"read_parquet('{SF_SMALL}/events.parquet') "
                    f"WHERE event_type = '{t}'"
                ).fetchall()
            ]
        )
        for t in ("click", "purchase")
    )
    u1, z = _mw_ref(xs, ys)
    assert row["n1"] == len(xs) and row["n2"] == len(ys)
    assert row["u1_2"] == int(2 * u1)
    assert row["z"] == pytest.approx(z, abs=1e-9)


def test_lineitem_spearman_matches_scipy_convention(spark):
    import duckdb

    row = QUERIES["lineitem_spearman_corr"].fn(spark, SF_SMALL).collect()[0]
    con = duckdb.connect()
    data = con.execute(
        "SELECT CAST(round(l_quantity*100) AS BIGINT), "
        "CAST(round(l_extendedprice*100) AS BIGINT) FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    ).fetchall()
    x = np.array([r[0] for r in data], dtype=float)
    y = np.array([r[1] for r in data], dtype=float)

    def midranks(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2
            i = j
        return ranks

    rx, ry = midranks(x), midranks(y)
    ref = np.corrcoef(rx, ry)[0, 1]  # Pearson on midranks == Spearman
    assert row["n_rows"] == len(x)
    assert row["spearman_rho"] == pytest.approx(ref, abs=1e-9)
    # centered-doubled-rank identity: Σ rank2 = n(n+1) ⇒ Σ c = 0
    assert int(2 * rx.sum()) == len(x) * (len(x) + 1)


def test_theil_sen_is_robust_to_outliers():
    # a clean slope-3 line with 20% wild outliers: the pairwise-slope
    # median stays on the line while the LSQ slope is dragged away
    ts = list(range(40))
    ys = [3.0 * t + 10 for t in ts]
    for t in (5, 13, 21, 29, 33, 37, 2, 11):
        ys[t] += 5000.0
    _, s6, _ = _theil_sen_ref(ts, ys)
    assert abs(s6 - 3.0) < 0.5
    lsq = np.polyfit(ts, ys, 1)[0]
    assert abs(lsq - 3.0) > 3  # least squares is off by construction
