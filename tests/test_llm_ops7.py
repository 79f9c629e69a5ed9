"""Round-7 pipeline operators (llm_ops7.py): semantic pins.

Value correctness is swept by the DuckDB oracle gate at three SFs;
here: the PII plane's detection/redaction contract and the incremental
dedup's batch-vs-index semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from sparkroach.queries import QUERIES
from sparkroach.queries.llm_ops7 import _EMAIL_RE, _IP_RE, _PHONE_RE
from tests.conftest import SF_SMALL


def test_pii_counts_match_injection_schedule(spark):
    rows = QUERIES["pii_scrub_report"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # detection equals the deterministic injection schedule: the raw
        # corpus vocabulary has no @ / digits, so there are no other hits
        assert r.n_email == (1 if r.doc_id % 3 == 0 else 0), r.doc_id
        assert r.n_phone == (1 if r.doc_id % 4 == 1 else 0), r.doc_id
        assert r.n_ip == (1 if r.doc_id % 5 == 2 else 0), r.doc_id
        assert r.pii_total == r.n_email + r.n_phone + r.n_ip
    # nonvacuous: every class fires somewhere
    assert sum(r.n_email for r in rows) > 0
    assert sum(r.n_phone for r in rows) > 0
    assert sum(r.n_ip for r in rows) > 0


def test_pii_redaction_leaves_no_matches(spark):
    """Rescanning the redacted text with the same patterns finds NOTHING —
    the actual contract a scrub stage must honor (replacement markers
    contain no pattern-matchable characters)."""
    from sparkroach.tables import load

    d = load(spark, SF_SMALL, "documents").limit(200)
    s = F.col("doc_id").cast("string")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), s, F.lit("@ex0.com"),
            F.lit(" call +1-555-0042"),
            F.lit(" host 10.1.2.3"),
        ).alias("t"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ),
        _IP_RE,
        "[IP]",
    )
    leftovers = aug.select(
        (
            F.regexp_count(red, F.lit(_EMAIL_RE))
            + F.regexp_count(red, F.lit(_PHONE_RE))
            + F.regexp_count(red, F.lit(_IP_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("total")).collect()[0].total
    assert leftovers == 0


def test_incremental_dedup_invariants_on_gate_corpus(spark):
    rows = QUERIES["dedup_incremental_new_docs"].fn(spark, SF_SMALL).collect()
    assert rows, "sf0.001 yields cross-parity near-dups"
    seen = set()
    for r in rows:
        # batch/index polarity: new docs are odd, the index is even
        assert r.new_doc % 2 == 1 and r.dup_of % 2 == 0, r
        assert r.jaccard >= 0.8
        assert r.new_doc not in seen  # exactly one best match per new doc
        seen.add(r.new_doc)


def test_incremental_dedup_recovers_planted_twins(spark, tmp_path):
    """Controlled corpus: odd (batch) docs that byte-copy an even (index)
    doc MUST be reported at jaccard 1.0 (an exact twin shares every band,
    and small buckets are under the index cap), uniques must NOT be
    reported, and a reported near-dup must name the best match."""
    base = [
        "the quick scan reads the table and the filter drops the row",
        "a broadcast join keeps the fact side local to the executor",
        "shuffle partitions size the reducers for the grouped aggregate",
        "the window frame orders rows by time within each user",
        "parquet row groups prune on min max statistics per column",
    ]
    docs = []
    for i, t in enumerate(base):
        docs.append((2 * i, t))  # even: the stored index
    docs.append((1, base[0]))  # exact twin of doc 0
    docs.append((3, base[1]))  # exact twin of doc 2
    docs.append((5, "totally different words about nothing shared here"))
    docs.append((7, base[2] + " extra tail"))  # near dup of doc 4
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = QUERIES["dedup_incremental_new_docs"].fn(
        spark, str(tmp_path)
    ).collect()
    got = {r.new_doc: (r.dup_of, r.jaccard) for r in rows}
    assert got[1] == (0, 1.0)
    assert got[3] == (2, 1.0)
    assert 5 not in got
    if 7 in got:  # banding recall for near dups is probabilistic-by-design
        assert got[7][0] == 4 and 0.8 <= got[7][1] < 1.0
