"""Property pins for the analytics12 wave (value correctness is covered
by test_oracle_gate.py's registry sweep): winsorize thresholds land on
true percentile ranks, lift matches a brute-force Python computation,
the as-of state matches a pandas groupby, and the fixed-size sample is
exactly-n, rerun-identical, and stratum-complete."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb
from pyspark.sql import functions as F

from sparkroach.queries.analytics12 import (
    ASOF_CUTOFF,
    COOC_VOCAB,
    SAMPLE_N,
    WINS_HI,
    WINS_LO,
    customer_order_state_asof,
    events_value_winsorize,
    fixed_size_sample_per_source,
    term_cooccurrence_lift,
)
from sparkroach.tables import load
from tests.conftest import SF_SMALL


def test_fixed_sample_exact_n_and_reproducible(spark):
    out1 = fixed_size_sample_per_source(spark, SF_SMALL).collect()
    out2 = fixed_size_sample_per_source(spark, SF_SMALL).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    per_source = Counter(r["source"] for r in out1)
    sizes = {
        r["source"]: r["n"]
        for r in load(spark, SF_SMALL, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_source) == set(sizes)
    for s, n in per_source.items():
        assert n == min(SAMPLE_N, sizes[s])
    # hash-rank selection: the chosen ids per source are the md5-smallest
    docs = defaultdict(list)
    for r in (
        load(spark, SF_SMALL, "documents").select("source", "doc_id").collect()
    ):
        docs[r["source"]].append(r["doc_id"])
    chosen = defaultdict(set)
    for r in out1:
        chosen[r["source"]].add(r["doc_id"])
    for s, ids in docs.items():
        expect = set(
            sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))[
                :SAMPLE_N
            ]
        )
        assert chosen[s] == expect


def test_winsorize_thresholds_are_exact_ranks(spark):
    rows = {r["event_type"]: r for r in events_value_winsorize(spark, SF_SMALL).collect()}
    ev = defaultdict(list)
    for r in load(spark, SF_SMALL, "events").select("event_type", "value").collect():
        ev[r["event_type"]].append(r["value"])
    for t, vals in ev.items():
        vals.sort()
        n = len(vals)
        lo = vals[-(-WINS_LO * n // 100) - 1]  # smallest r with 100r >= 5n
        hi = vals[-(-WINS_HI * n // 100) - 1]
        r = rows[t]
        assert r["p_lo"] == lo and r["p_hi"] == hi
        assert r["n_clamped_low"] == sum(1 for v in vals if v < lo)
        assert r["n_clamped_high"] == sum(1 for v in vals if v > hi)
        assert r["n"] == n


def test_cooccurrence_lift_matches_bruteforce(spark):
    con = duckdb.connect()
    doc_terms = con.execute(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    n_docs = len(doc_terms)
    df = Counter()
    cab = Counter()
    for _, text in doc_terms:
        terms = set(t for t in text.split(" ") if t)
        for t in terms:
            df[t] += 1
        ts = sorted(terms)
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                cab[(a, b)] += 1
    vocab = set(
        t for t, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:COOC_VOCAB]
    )
    for r in term_cooccurrence_lift(spark, SF_SMALL).collect():
        a, b = r["term_a"], r["term_b"]
        assert a in vocab and b in vocab
        assert r["c_ab"] == cab[(a, b)]
        assert r["df_a"] == df[a] and r["df_b"] == df[b]
        assert r["lift"] == (n_docs * cab[(a, b)]) / (df[a] * df[b])


def test_asof_state_matches_bruteforce(spark):
    orders = load(spark, SF_SMALL, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate"
    ).collect()
    import datetime

    cutoff = datetime.datetime.fromisoformat(ASOF_CUTOFF + " 00:00:00")
    best: dict[int, tuple] = {}
    counts = Counter()
    for r in orders:
        if r["o_orderdate"] > cutoff:
            continue
        counts[r["o_custkey"]] += 1
        key = (r["o_orderdate"], r["o_orderkey"])
        if r["o_custkey"] not in best or key > best[r["o_custkey"]][0]:
            best[r["o_custkey"]] = (key, r["o_orderkey"], r["o_orderstatus"])
    got = customer_order_state_asof(spark, SF_SMALL).collect()
    assert len(got) == len(best)
    for r in got:
        _, ok, st = best[r["custkey"]]
        assert r["last_orderkey"] == ok
        assert r["last_status"] == st
        assert r["n_orders_before"] == counts[r["custkey"]]
