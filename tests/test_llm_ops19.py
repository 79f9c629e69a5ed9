"""Round-8 wave-2 unit pins: G.711 µ-law conformance and b-bit minhash
estimator behavior."""

from __future__ import annotations

import pytest

from sparkroach.functions.g711 import (
    _BIAS,
    _CLIP,
    doc_pcm_samples,
    mulaw_decode,
    mulaw_decode_sample,
    mulaw_encode,
    mulaw_encode_sample,
)
from sparkroach.queries import QUERIES
from sparkroach.queries.llm_ops19 import BBIT_K
from tests.conftest import SF_SMALL


def _closed_roundtrip(s: int) -> int:
    """The oracle's closed integer form, independently in Python."""
    sign = s < 0
    mag = min(abs(s), _CLIP) + _BIAS
    e = 0
    while mag >= (1 << (e + 8)):
        e += 1
    m = (mag >> (e + 3)) & 15
    dec = ((m * 8 + _BIAS) << e) - _BIAS
    return -dec if sign else dec


def test_mulaw_roundtrip_matches_closed_form_exhaustively():
    # every 16-bit sample value, stride 7 (covers all segments + edges)
    for s in list(range(-32768, 32768, 7)) + [-32768, -1, 0, 1, 32767]:
        assert mulaw_decode_sample(mulaw_encode_sample(s)) == _closed_roundtrip(s)


def test_mulaw_known_codepoints():
    # canonical anchors: 0 encodes to 0xFF (all-inverted zero), and the
    # two sign variants of the same magnitude differ only in bit 7
    assert mulaw_encode_sample(0) == 0xFF
    plus, minus = mulaw_encode_sample(1000), mulaw_encode_sample(-1000)
    assert (plus ^ minus) == 0x80
    assert mulaw_decode_sample(plus) == -mulaw_decode_sample(minus)


def test_mulaw_quantization_error_bounded_by_segment_step():
    worst = 0
    for s in range(-32768, 32768, 11):
        err = abs(mulaw_decode_sample(mulaw_encode_sample(s)) - s)
        worst = max(worst, err)
    # the top segment's half-step is 2^(7+3)/2 = 512; clipping adds the
    # 32767-32635 margin → the true worst case for µ-law
    assert worst <= 512 + (32767 - _CLIP)


def test_mulaw_strict_ranges():
    with pytest.raises(ValueError):
        mulaw_encode_sample(40000)
    with pytest.raises(ValueError):
        mulaw_decode_sample(256)


def test_doc_pcm_covers_both_signs_and_all_segments():
    seen_segments = set()
    for doc in range(10):
        for s in doc_pcm_samples(doc):
            mag = min(abs(s), _CLIP) + _BIAS
            e = 0
            while mag >= (1 << (e + 8)):
                e += 1
            seen_segments.add(e)
    assert seen_segments == set(range(8))


def test_bbit_estimator_tracks_jaccard(spark):
    rows = QUERIES["minhash_bbit_estimate"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_agree"] <= BBIT_K
        assert -1.0 <= r["bbit_est"] <= 1.0
    # exact duplicates (jaccard 1.0) must agree on EVERY bit: the b-bit
    # estimate is exactly 1 — the estimator's only deterministic point
    dups = [r for r in rows if r["jaccard_q"] == 1.0]
    assert dups and all(r["bbit_est"] == 1.0 for r in dups)
    # and the estimator must separate exact dups from the low-similarity
    # tail on average (it is unbiased up to 1-bit collisions)
    low = [r["bbit_est"] for r in rows if r["jaccard_q"] < 0.5]
    if low:
        assert sum(low) / len(low) < 0.95


def test_exact_median_bisection_matches_sorted_truth(spark):
    from sparkroach.queries.analytics import cents
    from sparkroach.tables import load

    out = QUERIES["events_value_exact_median"].fn(spark, SF_SMALL).collect()[0]
    vals = sorted(
        r["c"]
        for r in load(spark, SF_SMALL, "events")
        .select(cents("value").alias("c"))
        .collect()
    )
    n = len(vals)
    lower_median = vals[(n + 1) // 2 - 1]
    assert out["n"] == n
    assert out["median_cents"] == lower_median
    assert out["n_le_median"] >= (n + 1) // 2


def test_exact_median_bisection_on_controlled_input(spark, tmp_path):
    import datetime

    # even count with a duplicate-heavy middle: lower median semantics
    values = [1.00, 2.00, 2.00, 2.00, 7.00, 9.00]  # lower median = 2.00
    spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, i), 1, "view", v, "{}")
            for i, v in enumerate(values)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = (
        QUERIES["events_value_exact_median"]
        .fn(spark, str(tmp_path))
        .collect()[0]
    )
    assert out["median_cents"] == 200
    assert out["n"] == 6 and out["n_le_median"] == 4


# ---------------------------------------------------------------------------
# GIF / LZW pins
# ---------------------------------------------------------------------------


def test_lzw_kwkwk_and_adversarial_roundtrips():
    import random

    from sparkroach.functions.gif import lzw_decode, lzw_encode

    # the canonical KwKwK trigger: a run of one symbol makes the encoder
    # emit a code equal to the decoder's next dictionary slot
    run = [0] * 8
    assert lzw_decode(lzw_encode(run, 3, clear_every=10**9), 3) == run
    rnd = random.Random(7)
    for _ in range(30):
        seq = [rnd.randrange(8) for _ in range(rnd.randrange(1, 400))]
        assert lzw_decode(lzw_encode(seq, 3, clear_every=10**9), 3) == seq
        # and WITH periodic mid-stream CLEAR resets (the gate's setting)
        assert lzw_decode(lzw_encode(seq, 3, clear_every=16), 3) == seq


def test_gif_roundtrip_matches_pixel_arithmetic():
    from sparkroach.functions.gif import (
        GIF_COLORS,
        decode_gif,
        doc_gif_dims,
        encode_doc_gif,
        gif_palette,
    )

    pal = gif_palette()
    for doc in range(20):
        d = decode_gif(encode_doc_gif(doc))
        w, h = doc_gif_dims(doc)
        idx = [
            (doc * 31 + y * 16 + x * 5) % GIF_COLORS
            for y in range(h)
            for x in range(w)
        ]
        assert (d["width"], d["height"], d["n_colors"]) == (w, h, GIF_COLORS)
        assert d["index_sum"] == sum(idx)
        assert d["rgb_sum"] == sum(sum(pal[i]) for i in idx)


def test_gif_strict_failures():
    from sparkroach.functions.gif import decode_gif, encode_doc_gif

    data = encode_doc_gif(3)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"GIF89a" + data[6:])  # 89a deliberately unsupported
    with pytest.raises(ValueError, match="trailer"):
        decode_gif(data[:-1])
    with pytest.raises(ValueError):
        decode_gif(data[: len(data) // 2])


# ---------------------------------------------------------------------------
# NSW beam search pins
# ---------------------------------------------------------------------------


def test_nsw_beam_contract_and_determinism(spark):
    from sparkroach.queries.llm_ops import N_QUERIES
    from sparkroach.queries.llm_ops19 import NSW_TOPK

    fn = QUERIES["ann_nsw_beam_search"].fn
    a = fn(spark, SF_SMALL).collect()
    b = fn(spark, SF_SMALL).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # deterministic
    per_q = {}
    for r in a:
        assert r["q_id"] < N_QUERIES and r["c_id"] != r["q_id"]
        per_q.setdefault(r["q_id"], []).append(r)
    for q, rows in per_q.items():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= NSW_TOPK
        # ranked by (cosine desc, c_id)
        keys = [(-r["cosine"], r["c_id"]) for r in rows]
        assert keys == sorted(keys)


@pytest.mark.soak  # property/twin grade (r9 tiering)
def test_nsw_beam_finds_genuinely_similar_neighbors(spark):
    """The walk must do better than the entry point it starts from: for
    every query, the top hit's cosine must be >= the entry node's own
    similarity (the beam keeps the entry if nothing beats it, so this
    holds with equality at worst) and the result overlaps the graph's
    reachable neighborhood."""
    from pyspark.sql import functions as F

    from sparkroach.queries.llm_ops import _DOT, _NORM, N_QUERIES
    from sparkroach.tables import load

    out = QUERIES["ann_nsw_beam_search"].fn(spark, SF_SMALL)
    top1 = {r["q_id"]: r["cosine"] for r in out.where(F.col("rank") == 1).collect()}
    e = load(spark, SF_SMALL, "embeddings")
    qs = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    entry = e.where(F.col("vec_id") == N_QUERIES).select(
        F.col("embedding").alias("ce")
    )
    cosine = F.round(
        F.expr(_DOT)
        / (F.expr(_NORM.format(col="qe")) * F.expr(_NORM.format(col="ce"))),
        6,
    )
    entry_sim = {
        r["q_id"]: r["c"]
        for r in qs.crossJoin(entry).select("q_id", cosine.alias("c")).collect()
    }
    for q, c in top1.items():
        assert c >= entry_sim[q]


@pytest.mark.soak  # property/twin grade (r9 tiering)
def test_nsw_recall_vs_exact_baseline(spark):
    """The navigable-graph walk must actually FIND neighbors: mean
    recall@5 vs the brute-force baseline — measured 0.95 at the pinned
    dial (entries 128, beam 16, 8 rounds); pinned with slack for SF
    drift."""
    from collections import defaultdict

    from sparkroach.queries.llm_ops19 import NSW_TOPK

    nsw = defaultdict(set)
    for r in QUERIES["ann_nsw_beam_search"].fn(spark, SF_SMALL).collect():
        nsw[r["q_id"]].add(r["c_id"])
    exact = defaultdict(set)
    for r in QUERIES["ann_cosine_topk"].fn(spark, SF_SMALL).collect():
        if r["rank"] <= NSW_TOPK:
            exact[r["q_id"]].add(r["c_id"])
    recalls = [
        len(nsw[q] & exact[q]) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.6


# ---------------------------------------------------------------------------
# ZIP shard codec pins
# ---------------------------------------------------------------------------


def test_zip_shard_roundtrip_and_determinism():
    from sparkroach.functions.zipshard import build_zip_shard, parse_zip_shard

    samples = [(7, "en", "s0", "hello world"), (12, "de", "s1", "x" * 500)]
    a, b = build_zip_shard(samples), build_zip_shard(samples)
    assert a == b  # fixed member timestamps → byte-deterministic shards
    out = parse_zip_shard(a)
    assert [(s["doc_id"], s["lang"], s["source"], s["text"]) for s in out] == [
        (7, "en", "s0", "hello world"),
        (12, "de", "s1", "x" * 500),
    ]
    assert all(s["n_members"] == 2 for s in out)


def test_zip_shard_strict_failures():
    import io
    import zipfile

    from sparkroach.functions.zipshard import build_zip_shard, parse_zip_shard

    blob = build_zip_shard([(3, "en", "s0", "payload text")])
    with pytest.raises(ValueError, match="not a zip"):
        parse_zip_shard(b"PK\x00\x00garbage")
    # flip a payload byte INSIDE the deflated .txt member: the stored
    # CRC-32 no longer matches and the strict read must raise
    idx = blob.index(b"payload") if b"payload" in blob else 40
    bad = bytearray(blob)
    bad[idx] ^= 0xFF
    with pytest.raises(ValueError):
        parse_zip_shard(bytes(bad))
    # half-present sample
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("5.txt", b"only text, no json")
    with pytest.raises(ValueError, match="missing members"):
        parse_zip_shard(buf.getvalue())
    # unknown extension
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("5.bin", b"nope")
    with pytest.raises(ValueError, match="unknown member extension"):
        parse_zip_shard(buf.getvalue())


def test_zip_gate_pin(spark):
    """Dedicated pin for the self-materializing zip gate (writes real
    files; joins test_plans._MATERIALIZED): the checksum aggregate must
    equal the tar lane's on the same corpus — both archive formats
    carry the identical content."""
    zi = QUERIES["documents_zip_shard_ingest"].fn(spark, SF_SMALL).collect()[0]
    ta = (
        QUERIES["documents_tar_webdataset_ingest"]
        .fn(spark, SF_SMALL)
        .collect()[0]
    )
    assert tuple(zi) == tuple(ta)


def test_mad_outliers_matches_sorted_truth(spark):
    from sparkroach.queries.analytics import cents
    from sparkroach.queries.llm_ops19 import _MAD_DEN, _MAD_NUM
    from sparkroach.tables import load

    out = QUERIES["events_value_mad_outliers"].fn(spark, SF_SMALL).collect()[0]
    vals = sorted(
        r["c"]
        for r in load(spark, SF_SMALL, "events")
        .select(cents("value").alias("c"))
        .collect()
    )
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[(n + 1) // 2 - 1]
    n_out = sum(1 for d in devs if d * _MAD_DEN > _MAD_NUM * mad)
    assert (out["n"], out["median_cents"], out["mad_cents"]) == (n, med, mad)
    assert out["n_outliers"] == n_out
    assert out["outlier_frac"] == n_out / n
