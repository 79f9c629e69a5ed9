"""Unit tests for llm_ops14: MMR redundancy suppression on a planted
near-duplicate pool, the substring occurrence identity on literal
strings, and the Feistel bijection over a full dense id domain."""

from __future__ import annotations

import sparkroach.queries.llm_ops14 as m


# ---------------------------------------------------------------------------
# mmr_diversified_topk
# ---------------------------------------------------------------------------


def _fake_embeddings(spark, rows):
    """rows: (vec_id, [floats])."""
    return spark.createDataFrame(
        [(v, [float(x) for x in e], 0) for v, e in rows],
        "vec_id long, embedding array<float>, label int",
    )


def _reference_mmr(rows, query_id, k, quant=1024):
    """Independent greedy MMR with the module's exact integer arithmetic,
    computed directly from the float inputs."""
    import math

    qv = {v: [math.floor(x * quant) for x in e] for v, e in rows}
    query = qv.pop(query_id)
    rel = {v: sum(a * b for a, b in zip(e, query)) for v, e in qv.items()}
    picks, selected = [], []
    remaining = dict(qv)
    for _ in range(k):
        best = None
        for vid, vec in remaining.items():
            msim = (
                max(sum(a * b for a, b in zip(vec, s)) for s in selected)
                if selected
                else 0
            )
            key = (-(2 * rel[vid] - msim), vid)
            if best is None or key < best[0]:
                best = (key, vid)
        picks.append(best[1])
        selected.append(remaining.pop(best[1]))
    return picks


def test_mmr_suppresses_planted_near_duplicates(spark, monkeypatch):
    """Identical highly-relevant clones vs a slightly-less-relevant but
    diverse vector: plain relevance top-k would rank the clones 1-2-3;
    MMR must promote the diverse vector to pick 2.  The full order is
    also pinned against an independent reference greedy."""
    q = [1.0, 0.0, 0.0, 0.0]
    clone = [0.9, 0.1, 0.0, 0.0]  # ids 1,2,3: exact duplicates
    diverse = [0.895, 0.0, 0.5, 0.0]
    rows = [(0, q), (1, clone), (2, clone), (3, clone), (4, diverse)]
    monkeypatch.setattr(m, "load", lambda s, d, n: _fake_embeddings(spark, rows))
    monkeypatch.setattr(m, "_MMR_K", 3)
    got = m.mmr_diversified_topk(spark, "x").collect()
    order = [r["vec_id"] for r in got]
    assert order == _reference_mmr(rows, 0, 3)
    # the qualitative claim: relevance order is 1,2,3 (diverse is 4th);
    # MMR interleaves the diverse vector at pick 2
    assert order[0] == 1
    assert order[1] == 4
    # msim convention: first pick reports 0
    assert got[0]["max_sim_q"] == 0
    assert all(r["mmr_q"] == 2 * r["rel_q"] - r["max_sim_q"] for r in got)


def test_mmr_tie_breaks_to_lowest_vec_id(spark, monkeypatch):
    v = [0.5, 0.5, 0.0, 0.0]
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (7, v), (3, v), (9, v)]
    monkeypatch.setattr(m, "load", lambda s, d, n: _fake_embeddings(spark, rows))
    monkeypatch.setattr(m, "_MMR_K", 3)
    got = m.mmr_diversified_topk(spark, "x").collect()
    assert got[0]["vec_id"] == 3  # identical rel → lowest id first


# ---------------------------------------------------------------------------
# substring_denylist_scan
# ---------------------------------------------------------------------------


def _fake_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_substring_occurrence_identity(spark, monkeypatch):
    # 'art' twice in doc 0 (p-art, art), once in doc 1; overlapping
    # patterns count via replace semantics (non-overlapping, left-to-right)
    texts = ["part of art", "artful table", "no hits here"]
    monkeypatch.setattr(m, "load", lambda s, d, n: _fake_docs(spark, texts))
    got = {
        r["pattern"]: r for r in m.substring_denylist_scan(spark, "x").collect()
    }
    assert got["art"]["total_occ"] == 3
    assert got["art"]["docs_hit"] == 2
    assert got["art"]["max_in_doc"] == 2
    assert got["able"]["total_occ"] == 1  # inside 'table'
    assert got["able"]["docs_hit"] == 1
    assert set(got) == set(m._SUB_PATTERNS)


def test_substring_scan_counts_non_token_fragments(spark, monkeypatch):
    # 'as' inside 'fast' and 'hash' — never a whole token
    texts = ["fast hash fast"]
    monkeypatch.setattr(m, "load", lambda s, d, n: _fake_docs(spark, texts))
    got = {
        r["pattern"]: r for r in m.substring_denylist_scan(spark, "x").collect()
    }
    assert got["as"]["total_occ"] == 3
    assert got["as"]["docs_hit"] == 1


# ---------------------------------------------------------------------------
# epoch_shuffle_order
# ---------------------------------------------------------------------------


def test_feistel_is_a_bijection_on_a_dense_domain(spark, monkeypatch):
    """Every id in a dense range maps to a distinct position — the
    census's n_distinct == n IS the injectivity proof the gate relies
    on; here we pin it on a contiguous block (the hardest case for an
    accidental collision to hide)."""
    n = 4096
    docs = _fake_docs(spark, ["x"] * n)  # doc_id = 0..n-1 dense
    monkeypatch.setattr(m, "load", lambda s, d, sf: docs)
    got = m.epoch_shuffle_order(spark, "x").collect()[0]
    assert got["n"] == n
    assert got["n_distinct"] == n
    assert 0 <= got["pos_min"] <= got["pos_max"] < (1 << 32)


def test_feistel_order_is_deterministic_and_scrambled(spark, monkeypatch):
    docs = _fake_docs(spark, ["x"] * 64)
    monkeypatch.setattr(m, "load", lambda s, d, sf: docs)
    a = m.epoch_shuffle_order(spark, "x").collect()[0]
    b = m.epoch_shuffle_order(spark, "x").collect()[0]
    assert a["chk"] == b["chk"] and a["head8"] == b["head8"]
    # the shuffled head is not the identity order
    assert a["head8"].split(" ") != [str(i) for i in range(8)]


def test_feistel_round_inverts(spark):
    """The Feistel construction is invertible by definition — verify by
    decrypting: run rounds in reverse on a sample of outputs and
    recover the inputs exactly."""
    half = m._HALF

    def f(r, a, b):
        return ((r * a + b) % half * ((r % 251) + 3)) % half

    def enc(x):
        l, r = x // half, x % half
        for a, b in m._FEISTEL_ROUNDS:
            l, r = r, (l + f(r, a, b)) % half
        return l * half + r

    def dec(y):
        l, r = y // half, y % half
        for a, b in reversed(m._FEISTEL_ROUNDS):
            l, r = (r - f(l, a, b)) % half, l
        return l * half + r

    for x in [0, 1, 65535, 65536, 123456789, (1 << 32) - 1]:
        assert dec(enc(x)) == x
