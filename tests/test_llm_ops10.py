"""Unit tests for the round-7 late-wave-3 operators (llm_ops10):
WebDataset tar shards, URL canonicalization, the bigram-coverage LM
filter, NFC normalization, and the image aHash near-dup plane.

The oracle equivalence of each GATE is swept by test_oracle_gate (and
the three-SF CLI sweeps); these tests pin the pure functions and the
semantic claims a shared cross-engine mistake could hide.
"""

from __future__ import annotations

import duckdb
import pytest

from sparkroach.functions.wds import build_tar_shard, parse_tar_shard
from tests.conftest import SF_SMALL


# ---------------------------------------------------------------------------
# WebDataset tar codec
# ---------------------------------------------------------------------------


def test_wds_roundtrip():
    samples = [(7, "en", "web", "hello world"), (42, "de", "books", "zwei")]
    blob = build_tar_shard(samples)
    out = parse_tar_shard(blob)
    assert [(s["doc_id"], s["lang"], s["source"], s["text"]) for s in out] == [
        (7, "en", "web", "hello world"),
        (42, "de", "books", "zwei"),
    ]
    assert all(s["n_members"] == 2 for s in out)


def test_wds_members_adjacent_and_sorted():
    import io
    import tarfile

    blob = build_tar_shard([(3, "en", "w", "x"), (1, "en", "w", "y")])
    names = [
        m.name
        for m in tarfile.open(fileobj=io.BytesIO(blob)).getmembers()
    ]
    assert names == sorted(names)
    # each sample's two members are adjacent (the sequential-read contract)
    stems = [n.rsplit(".", 1)[0] for n in names]
    assert stems == ["000000001", "000000001", "000000003", "000000003"]


def test_wds_strictness():
    import io
    import tarfile

    with pytest.raises(ValueError, match="not a tar"):
        parse_tar_shard(b"definitely not a tar archive")

    def tar_of(members):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for name, payload in members:
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
        return buf.getvalue()

    with pytest.raises(ValueError, match="missing members"):
        parse_tar_shard(tar_of([("000000001.txt", b"x")]))
    with pytest.raises(ValueError, match="unknown member extension"):
        parse_tar_shard(tar_of([("000000001.jpeg2", b"x")]))
    with pytest.raises(ValueError, match="duplicate member"):
        parse_tar_shard(
            tar_of([("000000001.txt", b"x"), ("000000001.txt", b"y")])
        )
    meta = b'{"doc_id":9,"lang":"en","source":"w"}'
    with pytest.raises(ValueError, match="disagrees"):
        parse_tar_shard(
            tar_of([("000000001.txt", b"x"), ("000000001.json", meta)])
        )


# ---------------------------------------------------------------------------
# aHash
# ---------------------------------------------------------------------------


def test_ahash_known_raster():
    import numpy as np

    from sparkroach.functions.ahash import ahash_bands

    # 16x16: top half dark (10), bottom half bright (200) → mean 105;
    # bottom 32 bits set → bands [0, 0, 0xFFFF, 0xFFFF]
    img = np.zeros((16, 16, 3), dtype="uint8")
    img[:8] = 10
    img[8:] = 200
    assert ahash_bands(img) == [0, 0, 0xFFFF, 0xFFFF]
    # equality sits on the >= side: constant image → every bit set
    img[:] = 77
    assert ahash_bands(img) == [0xFFFF] * 4


def test_ahash_bit_positions():
    import numpy as np

    from sparkroach.functions.ahash import ahash_bands

    # exactly one bright 2x2 box at grid (r=0, c=2) on a 16x16 dark image
    # → band0 bit 2 only
    img = np.zeros((16, 16, 3), dtype="uint8")
    img[0:2, 4:6] = 255
    bands = ahash_bands(img)
    assert bands == [1 << 2, 0, 0, 0]


def test_ahash_rejects_bad_dims():
    import numpy as np

    from sparkroach.functions.ahash import ahash_bands

    with pytest.raises(ValueError, match="8-divisible"):
        ahash_bands(np.zeros((12, 16, 3), dtype="uint8"))


def test_ahash_matches_decoded_corpus_closed_form():
    """The SQL oracle's overlap-area closed form must equal the REAL
    decode+hash chain — the equivalence the gate rests on (spot-checked
    here over every (w, h) class and the mod-256 tile wraparound)."""
    from sparkroach.functions.ahash import ahash_bands
    from sparkroach.functions.jpeg import (
        decode_jpeg,
        encode_doc_jpeg,
        jpeg_params,
        tile_value,
    )

    def closed_form(doc_id):
        p = jpeg_params(doc_id)
        w, h = p["width"], p["height"]
        bw, bh = w // 8, h // 8
        cells = [[0] * 8 for _ in range(8)]
        for r in range(8):
            for c in range(8):
                s = 0
                for ty in range(h // 8):
                    for tx in range(w // 8):
                        ow = max(
                            0,
                            min((c + 1) * bw, 8 * tx + 8) - max(c * bw, 8 * tx),
                        )
                        oh = max(
                            0,
                            min((r + 1) * bh, 8 * ty + 8) - max(r * bh, 8 * ty),
                        )
                        s += ow * oh * tile_value(doc_id, tx, ty)
                cells[r][c] = s
        total = sum(map(sum, cells))
        out = []
        for k in range(4):
            v = 0
            for rr in range(2):
                for c in range(8):
                    if 64 * cells[2 * k + rr][c] >= total:
                        v |= 1 << (rr * 8 + c)
            out.append(v)
        return out

    for doc_id in range(0, 300, 7):
        real = ahash_bands(decode_jpeg(encode_doc_jpeg(doc_id))["rgb"])
        assert real == closed_form(doc_id), doc_id


# ---------------------------------------------------------------------------
# URL canonicalization (behavioral pins on literal URLs, both engines)
# ---------------------------------------------------------------------------

_URL_CASES = [
    # (raw, canonical)
    ("http://WWW.Site1.Example.COM:80/cat/5/", "http://site1.example.com/cat/5"),
    ("https://site2.example.com:443/cat/6", "https://site2.example.com/cat/6"),
    ("https://site3.example.com:8080/cat/7", "https://site3.example.com:8080/cat/7"),
    (
        "http://a.com/p?utm_source=feed&b=3&a=1#frag",
        "http://a.com/p?a=1&b=3",
    ),
    ("http://a.com/p?utm_source=x&utm_medium=y", "http://a.com/p"),
    ("http://a.com/", "http://a.com/"),
    # a second '?' belongs to the query VALUE, not a new query — the
    # instr-based split keeps the whole tail (split_part would drop it)
    ("http://a.com/p?b=2?tail&a=1", "http://a.com/p?a=1&b=2?tail"),
]


def test_url_canonicalization_pins_spark(spark):
    from sparkroach.queries.llm_ops10 import _canon_url_sql

    rows = [(i, raw) for i, (raw, _) in enumerate(_URL_CASES)]
    df = spark.createDataFrame(rows, "i int, url string")
    got = {
        r["i"]: r["c"]
        for r in df.selectExpr(
            "i", _canon_url_sql("url", "spark") + " AS c"
        ).collect()
    }
    for i, (_, want) in enumerate(_URL_CASES):
        assert got[i] == want, (i, got[i], want)


def test_url_canonicalization_pins_duckdb():
    from sparkroach.queries.llm_ops10 import _canon_url_sql

    con = duckdb.connect()
    values = ", ".join(
        f"({i}, '{raw}')" for i, (raw, _) in enumerate(_URL_CASES)
    )
    rows = con.execute(
        f"WITH t(i, url) AS (VALUES {values}) "
        f"SELECT i, {_canon_url_sql('url', 'duckdb')} AS c FROM t ORDER BY i"
    ).fetchall()
    con.close()
    for (i, got), (_, want) in zip(rows, _URL_CASES):
        assert got == want, (i, got, want)


# ---------------------------------------------------------------------------
# NFC
# ---------------------------------------------------------------------------


def test_nfc_python_matches_duckdb_on_suffix_cases():
    import unicodedata

    from sparkroach.queries.llm_ops10 import _NFC_SUFFIXES

    con = duckdb.connect()
    for s in [f"doc text{suf}" for suf in _NFC_SUFFIXES]:
        py = unicodedata.normalize("NFC", s)
        db = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert py == db
    con.close()


def test_nfc_case_semantics():
    """Pin the semantic claim itself: cases 0/2 change, 1/3 don't, and
    case 0 composes to the precomposed form of case 1."""
    import unicodedata

    from sparkroach.queries.llm_ops10 import _NFC_SUFFIXES

    n = [unicodedata.normalize("NFC", s) for s in _NFC_SUFFIXES]
    assert _NFC_SUFFIXES[0] != n[0] and n[0] == _NFC_SUFFIXES[1]
    assert _NFC_SUFFIXES[1] == n[1]
    assert _NFC_SUFFIXES[2] != n[2] and len(n[2]) < len(_NFC_SUFFIXES[2])
    assert _NFC_SUFFIXES[3] == n[3]


# ---------------------------------------------------------------------------
# LM filter: the held-out split genuinely exercises OOV
# ---------------------------------------------------------------------------


def test_lm_split_has_unseen_bigrams(spark):
    from sparkroach.queries.llm_ops10 import lm_bigram_coverage_score

    df = lm_bigram_coverage_score(spark, SF_SMALL)
    rows = df.collect()
    assert all(r["doc_id"] % 2 == 1 for r in rows)  # held-out side only
    assert any(r["n_seen"] < r["n_bigrams"] for r in rows), (
        "no OOV bigrams — the held-out claim is vacuous"
    )
    assert {r["keep"] for r in rows} == {True, False}, (
        "keep threshold does not split the population"
    )


# ---------------------------------------------------------------------------
# plan shape: the pair stage is a capped equi-join, never a cross join
# ---------------------------------------------------------------------------


def test_ahash_pair_plan_no_cartesian(spark):
    from sparkroach.queries.llm_ops10 import multimodal_image_ahash_pairs

    plan = multimodal_image_ahash_pairs(spark, SF_SMALL)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lm_score_plan_is_equi_join(spark):
    """The train→score stage must be an equi-join on the bigram key
    (broadcast or SMJ — either scales), never a nested loop."""
    from sparkroach.queries.llm_ops10 import lm_bigram_coverage_score

    plan = lm_bigram_coverage_score(spark, SF_SMALL)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )
