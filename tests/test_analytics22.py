"""Wave-12 pins: binaryFile ingest equals the in-memory decode lane,
text-source preconditions + round-trip fidelity, and the arrow-UDF
checksums against hashlib recomputation."""

from __future__ import annotations

import hashlib

import pandas as pd

from sparkroach.queries import QUERIES
from tests.conftest import SF_SMALL
import pytest


@pytest.mark.soak  # property/twin grade (r9 tiering)
def test_binaryfile_ingest_equals_mapinpandas_lane(spark):
    via_files = QUERIES["multimodal_binaryfile_ingest"].fn(spark, SF_SMALL)
    in_memory = QUERIES["multimodal_decode"].fn(spark, SF_SMALL)
    a = sorted(map(tuple, via_files.collect()))
    b = sorted(map(tuple, in_memory.collect()))
    assert a == b and len(a) > 0  # the file system added/lost nothing


def test_text_roundtrip_preconditions_and_checksums(spark):
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    # the gate's framing assumptions, asserted on the real corpus
    assert not docs.text.str.contains("\t").any()
    assert not docs.text.str.contains("\n").any()
    assert not docs.text.str.contains("\r").any()
    row = QUERIES["documents_text_source_roundtrip"].fn(spark, SF_SMALL).collect()[0]
    assert row.format == "text"
    assert row.n_rows == len(docs)
    assert row.sum_doc_id == int(docs.doc_id.sum())
    assert row.sum_len == int(docs.text.str.len().sum())
    expect_hash = sum(
        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in docs.text
    )
    assert row.text_hash_sum == expect_hash


def test_arrow_udf_checksums_match_hashlib(spark):
    rows = QUERIES["docs_arrow_udf_checksum"].fn(spark, SF_SMALL).collect()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    text = {r.doc_id: str(r.text) for r in docs.itertuples()}
    assert len(rows) == len(text)
    for r in rows[:50]:  # spot-check; the oracle gate covers all rows
        t = text[r.doc_id]
        assert r.th == int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        assert r.th_rev == int(
            hashlib.md5(t[::-1].encode()).hexdigest()[:8], 16
        )
    # the two checksums genuinely differ (reverse happened in Python)
    assert any(r.th != r.th_rev for r in rows)
