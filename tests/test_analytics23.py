"""Wave-13 pins: DDL round-trip content + rerun idempotence, and the
ANALYZE TABLE -> catalog statistics -> CBO row-count path."""

from __future__ import annotations

import hashlib

import pandas as pd

from sparkroach.queries import QUERIES
from tests.conftest import SF_SMALL


def _expected(docs: pd.DataFrame) -> dict:
    rows = list(zip(docs.doc_id, docs.source, docs.text))
    rows += [
        (i + 50_000_000, "synthetic", t)
        for i, _, t in rows
        if i % 7 == 0
    ]
    out: dict = {}
    for i, s, t in rows:
        n, sid, th = out.get(s, (0, 0, 0))
        out[s] = (
            n + 1,
            sid + i,
            th + int(hashlib.md5(t.encode()).hexdigest()[:8], 16),
        )
    return out


def test_ddl_roundtrip_content_and_rerun_idempotence(spark):
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    expect = _expected(docs)
    for _ in range(2):  # rerun: DROP-first makes the gate idempotent
        rows = QUERIES["documents_sql_ddl_roundtrip"].fn(spark, SF_SMALL).collect()
        got = {
            r.source: (r.n_rows, r.sum_doc_id, r.text_hash_sum) for r in rows
        }
        assert got == expect
    assert "synthetic" in expect  # the INSERT INTO path genuinely ran
    # the managed table was dropped on exit
    assert not spark.catalog.tableExists("ddl_docs_roundtrip")


def test_analyze_table_feeds_cbo_rowcount(spark):
    """ANALYZE TABLE COMPUTE STATISTICS must surface an exact rowCount in
    the optimizer's statistics (the input CBO join-reordering and
    stats-based broadcasts consume); before ANALYZE only a size estimate
    exists."""
    spark.sql("DROP TABLE IF EXISTS cbo_stats_probe")
    prev = spark.conf.get("spark.sql.cbo.enabled")
    try:
        # rowCount only propagates through the stats visitor under CBO
        spark.conf.set("spark.sql.cbo.enabled", "true")
        df = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
        df.write.saveAsTable("cbo_stats_probe")
        n = df.count()

        def rowcount():
            plan = spark.table("cbo_stats_probe")._jdf.queryExecution()
            return plan.optimizedPlan().stats().rowCount().toString()

        assert rowcount() == "None"  # only sizeInBytes before ANALYZE
        spark.sql("ANALYZE TABLE cbo_stats_probe COMPUTE STATISTICS")
        assert rowcount() == f"Some({n})"
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
        spark.sql("DROP TABLE IF EXISTS cbo_stats_probe")
