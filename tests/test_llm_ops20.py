"""Round-8 wave-3 unit pins: QOI codec conformance (chunk semantics,
strict framing, op-kind coverage over the gate corpus) and LZ4 block
codec conformance (overlap copies, length extensions, end-of-block
rules, strict failures)."""

from __future__ import annotations

import random
import struct

import pytest

from sparkroach.functions.lz4block import lz4_compress, lz4_decompress
from sparkroach.functions.qoi import (
    doc_image_dims,
    doc_pixels,
    qoi_decode,
    qoi_encode,
    qoi_op_histogram,
)


def test_qoi_gate_corpus_roundtrips_and_covers_every_chunk_kind():
    hist = {"RGB": 0, "INDEX": 0, "DIFF": 0, "LUMA": 0, "RUN": 0}
    for d in range(120):
        w, h, px = doc_pixels(d)
        assert (w, h) == doc_image_dims(d)
        blob = qoi_encode(w, h, px)
        assert qoi_decode(blob) == (w, h, px)
        for k, v in qoi_op_histogram(blob).items():
            hist[k] += v
    # the gate corpus must exercise ALL five chunk kinds, or the codec
    # coverage claim is hollow
    assert all(v > 0 for v in hist.values()), hist


def test_qoi_roundtrips_random_and_adversarial_images():
    rng = random.Random(20260816)
    for trial in range(150):
        w, h = rng.randint(1, 19), rng.randint(1, 13)
        kind = trial % 4
        if kind == 0:  # low-cardinality palette → INDEX-heavy
            px = [
                (rng.randrange(4) * 3, rng.randrange(4) * 5, rng.randrange(4) * 7)
                for _ in range(w * h)
            ]
        elif kind == 1:  # constant image → maximal runs (incl. >62 cap)
            c = (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            px = [c] * (w * h)
        elif kind == 2:  # smooth gradient → DIFF/LUMA-heavy
            px = [
                ((2 * i) % 256, (2 * i + 1) % 256, (2 * i) % 256)
                for i in range(w * h)
            ]
        else:  # noise → RGB-heavy
            px = [
                (rng.randrange(256), rng.randrange(256), rng.randrange(256))
                for _ in range(w * h)
            ]
        blob = qoi_encode(w, h, px)
        assert qoi_decode(blob) == (w, h, px), (trial, w, h)


def test_qoi_run_cap_62():
    # 200 identical pixels → runs of 62+62+62+13 (the 6-bit cap, bias -1)
    px = [(9, 9, 9)] * 200
    blob = qoi_encode(1, 200, px)
    hist = qoi_op_histogram(blob)
    # first pixel is a LUMA/RGB/DIFF chunk, the rest pure runs
    assert hist["RUN"] == 4
    assert qoi_decode(blob) == (1, 200, px)


def test_qoi_wraparound_deltas():
    # 255 → 0 is DIFF(+1) under wraparound; 0 → 224 is LUMA(dg=-32)
    px = [(255, 255, 255), (0, 0, 0), (224, 224, 224)]
    blob = qoi_encode(3, 1, px)
    hist = qoi_op_histogram(blob)
    assert hist["DIFF"] >= 1 and hist["LUMA"] >= 1
    assert qoi_decode(blob) == (3, 1, px)


def test_qoi_strict_failures():
    w, h, px = doc_pixels(3)
    blob = qoi_encode(w, h, px)
    with pytest.raises(ValueError, match="magic"):
        qoi_decode(b"qoix" + blob[4:])
    with pytest.raises(ValueError):
        qoi_decode(blob[:20])  # truncated mid-stream
    with pytest.raises(ValueError, match="end marker"):
        qoi_decode(blob[:-1])
    with pytest.raises(ValueError, match="trailing"):
        qoi_decode(blob[:-8] + b"\x00" + blob[-8:])
    with pytest.raises(ValueError, match="channels"):
        qoi_decode(blob[:12] + bytes([4]) + blob[13:])
    bad_run = (
        b"qoif" + struct.pack(">II", 1, 1) + bytes((3, 0))
        + bytes([0xC0 | 61]) + b"\x00" * 7 + b"\x01"
    )
    with pytest.raises(ValueError, match="overshoot"):
        qoi_decode(bad_run)
    with pytest.raises(ValueError, match="pixels"):
        qoi_encode(2, 2, [(0, 0, 0)] * 3)  # wrong pixel count


# ---------------------------------------------------------------------------
# LZ4 block codec
# ---------------------------------------------------------------------------


def test_lz4_roundtrips_structured_and_adversarial_inputs():
    rng = random.Random(20260817)
    for trial in range(300):
        n = rng.randint(0, 800)
        kind = trial % 5
        if kind == 0:  # incompressible noise
            raw = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:  # single byte → offset-1 overlap runs
            raw = bytes([7]) * n
        elif kind == 2:  # low-entropy alphabet
            raw = bytes(rng.randrange(4) for _ in range(n))
        elif kind == 3:  # period-4 pattern → offset-4 overlap matches
            raw = (b"abcd" * (n // 4 + 1))[:n]
        else:  # word soup (the documents-table shape)
            raw = b"".join(
                rng.choice([b"the ", b"cat ", b"sat ", b"mat "])
                for _ in range(n // 4)
            )
        blob = lz4_compress(raw)
        assert lz4_decompress(blob, len(raw)) == raw, (trial, kind, n)


def test_lz4_length_extensions_past_15():
    # >15 literals and a match longer than 19 both take the extension path
    raw = bytes(range(200)) + b"Z" * 400 + bytes(range(200))
    blob = lz4_compress(raw)
    assert lz4_decompress(blob, len(raw)) == raw


def test_lz4_compresses_repetitive_input_hard():
    raw = b"spark " * 500
    assert len(lz4_compress(raw)) < len(raw) // 50


def test_lz4_short_blocks_are_all_literals():
    # spec: blocks < 13 bytes can never contain a match
    for n in range(13):
        raw = b"aaaaaaaaaaaa"[:n]
        blob = lz4_compress(raw)
        # single literals-only sequence: token, (no ext, n<15), literals
        assert blob == bytes([n << 4]) + raw
        assert lz4_decompress(blob, n) == raw


def test_lz4_strict_failures():
    raw = b"hello world hello world hello worldXYZQRS"
    blob = lz4_compress(raw)
    with pytest.raises(ValueError, match="truncated|overruns"):
        lz4_decompress(blob[:-1], len(raw))
    with pytest.raises(ValueError, match="declared"):
        lz4_decompress(blob, len(raw) + 1)
    with pytest.raises(ValueError, match="truncated"):
        lz4_decompress(b"", 0)
    with pytest.raises(ValueError, match="overruns"):
        lz4_decompress(bytes([0x10]), 1)  # literal run past the block
    with pytest.raises(ValueError, match="zero"):
        lz4_decompress(bytes([0x10, 65, 0, 0, 0x00]), 10)
    with pytest.raises(ValueError, match="before the output start"):
        lz4_decompress(bytes([0x10, 65, 9, 0, 0x00]), 10)
    with pytest.raises(ValueError, match="final sequence"):
        lz4_decompress(bytes([0x11]) + b"a", 1)


# ---------------------------------------------------------------------------
# Rice/Golomb linear-prediction codec
# ---------------------------------------------------------------------------


def test_rice_roundtrips_across_signal_shapes():
    import math

    from sparkroach.functions.rice import rice_compress, rice_decompress

    rng = random.Random(8)
    for trial in range(250):
        n = rng.randint(0, 200)
        kind = trial % 5
        if kind == 0:  # incompressible noise
            s = [rng.randint(-32768, 32767) for _ in range(n)]
        elif kind == 1:  # constant → order-1, all-zero residuals
            s = [1234] * n
        elif kind == 2:  # ramp → order-2, all-zero residuals
            s = [min(32767, -32768 + i * 13) for i in range(n)]
        elif kind == 3:
            s = [(-1) ** i * 3 for i in range(n)]
        else:  # smooth tone + small noise: the Rice sweet spot
            s = [
                int(100 * math.sin(i / 5)) + rng.randint(-2, 2)
                for i in range(n)
            ]
        assert rice_decompress(rice_compress(s)) == s, (trial, kind, n)
    for s in ([], [32767], [-32768, 32767, -32768, 32767]):
        assert rice_decompress(rice_compress(s)) == s


def test_rice_gate_corpus_compresses_hard():
    from sparkroach.functions.rice import (
        doc_rice_samples,
        rice_compress,
        rice_decompress,
    )

    tot_c = tot_r = 0
    for d in range(200):
        s = doc_rice_samples(d)
        blob = rice_compress(s)
        assert rice_decompress(blob) == s
        tot_c += len(blob)
        tot_r += 2 * len(s)
    # linear prediction + Rice must beat raw s16 by a wide margin on
    # the ramp-plus-wiggle corpus
    assert tot_c < 0.45 * tot_r, (tot_c, tot_r)


def test_rice_predictor_selection_zeroes_structured_residuals():
    from sparkroach.functions.rice import rice_compress

    # constant and ramp blocks collapse to almost nothing: header +
    # warm-up + a run of zero residuals
    assert len(rice_compress([500] * 1000)) < 150
    assert len(rice_compress([i * 3 for i in range(1000)])) < 150


def test_rice_strict_failures():
    from sparkroach.functions.rice import doc_rice_samples, rice_compress, rice_decompress

    blob = rice_compress(doc_rice_samples(3))
    with pytest.raises(ValueError, match="header"):
        rice_decompress(b"XRC1" + blob[4:])
    with pytest.raises(ValueError, match="header|truncated|warm"):
        rice_decompress(blob[:8])
    with pytest.raises(ValueError, match="order"):
        rice_decompress(blob[:6] + bytes([9]) + blob[7:])
    with pytest.raises(ValueError, match="rice parameter"):
        rice_decompress(blob[:7] + bytes([99]) + blob[8:])
    corrupt = bytearray(blob)
    corrupt[-1] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        rice_decompress(bytes(corrupt))
    with pytest.raises(ValueError, match="trailing|CRC|padding"):
        rice_decompress(blob[:-4] + b"\x00" + blob[-4:])
    with pytest.raises(ValueError, match="PCM16"):
        rice_compress([40000])


# ---------------------------------------------------------------------------
# streaming integer-EWMA recursive state
# ---------------------------------------------------------------------------


def test_integer_ewma_recurrence_vector():
    # e_1 = x_1; e_n = (x_n + e_{n-1}) DIV 2 over non-negative cents
    e, n = 0, 0
    for cents in (100, 50, 30):
        e = cents if n == 0 else (cents + e) // 2
        n += 1
    assert (n, e) == (3, 52)  # 100 → 75 → 52 (floor at each step)


def test_events_ewma_state_streamed_matches_batch_replay(spark):
    import duckdb

    from sparkroach.queries import QUERIES
    from tests.conftest import SF_SMALL

    rows = {
        r["user_id"]: r
        for r in QUERIES["events_ewma_state_streamed"].fn(spark, SF_SMALL).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        "SELECT user_id, epoch_us(ts::TIMESTAMP), event_id, "
        "CAST(round(value*100) AS BIGINT) FROM "
        f"read_parquet('{SF_SMALL}/events.parquet') ORDER BY 1, 2, 3"
    ).fetchall()
    state: dict = {}
    for uid, _t, _eid, cents in data:
        n, e = state.get(uid, (0, 0))
        e = cents if n == 0 else (cents + e) // 2
        state[uid] = (n + 1, e)
    assert set(rows) == set(state)
    for uid, (n, e) in state.items():
        assert rows[uid]["n_events"] == n, uid
        assert rows[uid]["ewma_cents"] == e, uid


# ---------------------------------------------------------------------------
# delta + zigzag + LEB128 varint blocks
# ---------------------------------------------------------------------------


def test_dvi_roundtrips_and_edges():
    from sparkroach.functions.varint import dvi_decode, dvi_encode

    rng = random.Random(6)
    for trial in range(200):
        n = rng.randint(0, 300)
        kind = trial % 4
        if kind == 0:
            vals = sorted(rng.randint(0, 2**50) for _ in range(n))
        elif kind == 1:
            vals = [rng.randint(-(2**62), 2**62) for _ in range(n)]
        elif kind == 2:  # sorted timestamps: the target workload
            vals = [1_700_000_000_000_000 + i * 7 for i in range(n)]
        else:
            vals = [rng.randint(-5, 5) for _ in range(n)]
        assert dvi_decode(dvi_encode(vals)) == vals, (trial, kind)
    assert dvi_decode(dvi_encode([])) == []
    assert dvi_decode(dvi_encode([-(2**63)])) == [-(2**63)]


def test_dvi_sorted_timestamps_compress():
    from sparkroach.functions.varint import dvi_encode

    vals = [1_700_000_000_000_000 + i * 61_000_000 + i % 7 for i in range(1000)]
    assert len(dvi_encode(vals)) < 4.5 * len(vals)  # vs 8 bytes raw


def test_dvi_strict_failures():
    from sparkroach.functions.varint import dvi_decode, dvi_encode

    blob = dvi_encode([5, 7, -3])
    with pytest.raises(ValueError, match="header"):
        dvi_decode(b"XVI1" + blob[4:])
    with pytest.raises(ValueError, match="header|truncated|trailing|CRC"):
        dvi_decode(blob[:6])  # shorter than the minimum container
    with pytest.raises(ValueError, match="trailing"):
        dvi_decode(blob[:-4] + b"\x00" + blob[-4:])
    corrupt = bytearray(blob)
    corrupt[5] ^= 0x02
    with pytest.raises(ValueError, match="CRC|trailing|truncated"):
        dvi_decode(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated"):
        dvi_decode(b"DVI1" + bytes([3, 0x80]) + b"\x00" * 4)


# ---------------------------------------------------------------------------
# TIFF container + PackBits
# ---------------------------------------------------------------------------


def test_packbits_roundtrips_and_long_runs():
    from sparkroach.functions.tiff import packbits_decode, packbits_encode

    rng = random.Random(3)
    for trial in range(200):
        n = rng.randint(0, 300)
        kind = trial % 4
        if kind == 0:
            row = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            row = bytes([9]) * n  # runs past the 128 token cap
        elif kind == 2:
            row = bytes(rng.randrange(2) for _ in range(n))
        else:
            row = bytes(i % 7 for i in range(n))
        enc = packbits_encode(row)
        assert packbits_decode(enc, n) == row, (trial, kind, n)
    assert len(packbits_encode(bytes([7]) * 400)) <= 8


def test_tiff_gate_corpus_roundtrips_and_strips_compress():
    from sparkroach.functions.tiff import (
        doc_tiff_pixels,
        packbits_encode,
        tiff_decode,
        tiff_encode,
    )

    strip_bytes = px_bytes = 0
    for d in range(120):
        w, h, px = doc_tiff_pixels(d)
        blob = tiff_encode(w, h, px)
        assert tiff_decode(blob) == (w, h, px), d
        for y in range(h):
            strip_bytes += len(packbits_encode(px[y * w : (y + 1) * w]))
        px_bytes += len(px)
    # the RLE payload itself compresses (container overhead is what
    # brings the small gate images to ~break-even)
    assert strip_bytes < 0.6 * px_bytes, (strip_bytes, px_bytes)


def test_tiff_strict_failures():
    from sparkroach.functions.tiff import (
        doc_tiff_pixels,
        packbits_decode,
        tiff_decode,
        tiff_encode,
    )

    w, h, px = doc_tiff_pixels(5)
    blob = tiff_encode(w, h, px)
    with pytest.raises(ValueError, match="byte order"):
        tiff_decode(b"MM" + blob[2:])
    with pytest.raises(ValueError, match="magic"):
        tiff_decode(blob[:2] + b"\x2b\x00" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        tiff_decode(blob[:6])
    with pytest.raises(ValueError, match="next-IFD"):
        tiff_decode(blob[:-4])
    with pytest.raises(ValueError, match="truncated literal"):
        packbits_decode(b"\x05ab", 6)
    with pytest.raises(ValueError, match="truncated repeat"):
        packbits_decode(b"\x81", 2)
    with pytest.raises(ValueError, match="decodes to"):
        packbits_decode(b"\x02abc", 5)  # underfilled row
    with pytest.raises(ValueError, match="overflows"):
        packbits_decode(b"\x83z", 1)  # repeat of 126 into a 1-byte row


# ---------------------------------------------------------------------------
# BWT + MTF + RLE block-sorting codec
# ---------------------------------------------------------------------------


def test_bwt_classic_banana_vector():
    from sparkroach.functions.bwt import bwt_forward, bwt_inverse

    primary, last = bwt_forward(b"banana")
    assert (primary, last) == (3, b"nnbaaa")
    assert bwt_inverse(primary, last) == b"banana"


def test_bwt_rank_doubling_matches_naive_rotation_sort():
    from sparkroach.functions.bwt import bwt_forward

    rng = random.Random(11)
    for trial in range(60):
        n = rng.randint(1, 60)
        if trial % 2:
            raw = bytes(rng.randrange(3) for _ in range(n))  # heavy ties
        else:
            raw = bytes(rng.randrange(256) for _ in range(n))
        rots = sorted(range(n), key=lambda i: raw[i:] + raw[:i])
        naive_last = bytes(raw[(i - 1) % n] for i in rots)
        primary, last = bwt_forward(raw)
        assert last == naive_last, (trial, raw)
        assert rots[primary] == 0 or raw[rots[primary]:] + raw[:rots[primary]] == raw


def test_mtf_roundtrip_and_locality():
    from sparkroach.functions.bwt import mtf_decode, mtf_encode

    data = b"aaabbbaaaccc"
    enc = mtf_encode(data)
    assert mtf_decode(enc) == data
    # runs after the first symbol become zeros — the RLE's whole diet
    assert enc[1:3] == b"\x00\x00"


def test_sbwt_roundtrips_and_compresses_shard_blocks():
    import duckdb

    from sparkroach.functions.bwt import sbwt_compress, sbwt_decompress
    from tests.conftest import SF_SMALL

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM read_parquet('{SF_SMALL}/documents.parquet')"
            " ORDER BY doc_id LIMIT 120"
        ).fetchall()
    ]
    block = "\n".join(texts).encode()
    blob = sbwt_compress(block)
    assert sbwt_decompress(blob) == block
    # block-sorting pays on shard blocks even with no entropy stage
    assert len(blob) < 0.6 * len(block), (len(blob), len(block))


def test_sbwt_long_zero_runs_use_varint_extensions():
    from sparkroach.functions.bwt import sbwt_compress, sbwt_decompress

    raw = b"z" * 5000  # constant block → one giant MTF zero run
    blob = sbwt_compress(raw)
    assert sbwt_decompress(blob) == raw
    assert len(blob) < 40  # header 16 + first symbol + short varint run


def test_sbwt_strict_failures():
    from sparkroach.functions.bwt import sbwt_compress, sbwt_decompress

    blob = sbwt_compress(b"hello world hello")
    with pytest.raises(ValueError, match="magic"):
        sbwt_decompress(b"XBWT" + blob[4:])
    with pytest.raises(ValueError, match="header"):
        sbwt_decompress(blob[:10])
    with pytest.raises(ValueError, match="header says|varint"):
        sbwt_decompress(blob[:-1])
    with pytest.raises(ValueError, match="header says"):
        sbwt_decompress(blob + b"\x07")
    with pytest.raises(ValueError, match="primary"):
        sbwt_decompress(blob[:8] + b"\xff\xff\xff\xff" + blob[12:])
    corrupt = bytearray(blob)
    corrupt[-1] ^= 0x01  # flip a literal payload byte → CRC catches it
    with pytest.raises(ValueError, match="CRC|primary|header"):
        sbwt_decompress(bytes(corrupt))
    assert sbwt_decompress(sbwt_compress(b"")) == b""


# ---------------------------------------------------------------------------
# priority sampling (Duffield-Lund-Thorup)
# ---------------------------------------------------------------------------


def _dlt_estimate(weights, seed, k):
    """Reference DLT realization: md5-uniform priorities w/u, top-k
    sample, τ = (k+1)-th priority, estimate Σ max(w, τ)."""
    import hashlib

    prios = []
    for i, w in enumerate(weights):
        h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
        prios.append((w * (1 << 32) / (h + 1), w))
    prios.sort(key=lambda t: -t[0])
    tau = prios[k][0] if len(prios) > k else 0.0
    return sum(max(w, tau) for _, w in prios[:k])


def test_priority_sampling_estimator_is_unbiased_in_expectation():
    # the DLT threshold estimator Σ max(w, τ) is unbiased for Σw; over
    # 400 independent hash realizations the mean must sit within 5%
    rng = random.Random(5)
    weights = [rng.randint(40, 600) for _ in range(40)]
    total = sum(weights)
    mean = sum(_dlt_estimate(weights, s, 16) for s in range(400)) / 400
    assert abs(mean - total) / total < 0.05, (mean, total)


def test_priority_sampling_small_population_is_exact():
    # n ≤ k → τ = 0 and the estimate is the exact total
    weights = [10, 20, 30]
    assert _dlt_estimate(weights, 0, 16) == 60


def test_source_priority_sample_gate_invariants(spark):
    from sparkroach.queries import QUERIES
    from sparkroach.queries.llm_ops20 import PS_K
    from tests.conftest import SF_SMALL

    rows = QUERIES["source_priority_sample"].fn(spark, SF_SMALL).collect()
    assert rows, "no sources"
    for r in rows:
        assert r["n_sample"] == min(r["n_docs"], PS_K)
        assert r["n_w_ge_tau"] + r["n_w_lt_tau"] == r["n_sample"]
        if r["n_docs"] <= PS_K:
            assert r["tau_r6"] == 0.0
            assert r["sum_w_ge_tau"] == r["true_weight"]
        # the reassembled estimator is sane: within 4x of truth for a
        # single realization (k=16 of ~25 docs/source at sf0.001)
        est = r["sum_w_ge_tau"] + r["n_w_lt_tau"] * r["tau_r6"]
        assert 0 < est < 4 * r["true_weight"]


# ---------------------------------------------------------------------------
# ROUGE pair scoring
# ---------------------------------------------------------------------------


def _clipped_overlap(a: list, b: list) -> int:
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    return sum(min(n, cb[t]) for t, n in ca.items())


def test_clipped_overlap_does_not_overcredit_repeats():
    # "x x x y" vs "x z": three x's in a credit only the single x in b
    assert _clipped_overlap(list("xxxy"), list("xz")) == 1
    assert _clipped_overlap(list("xxy"), list("xxx")) == 2


def test_rouge_overlap_pairs_matches_python_reference(spark):
    import duckdb

    from sparkroach.queries import QUERIES
    from tests.conftest import SF_SMALL

    rows = QUERIES["rouge_overlap_pairs"].fn(spark, SF_SMALL).collect()
    assert rows, "no candidate pairs"
    con = duckdb.connect()
    texts = dict(
        con.execute(
            "SELECT doc_id, text FROM "
            f"read_parquet('{SF_SMALL}/documents.parquet')"
        ).fetchall()
    )
    for r in rows[:25]:
        wa = texts[r["doc_a"]].split(" ")
        wb = texts[r["doc_b"]].split(" ")
        ba = [f"{x} {y}" for x, y in zip(wa, wa[1:])]
        bb = [f"{x} {y}" for x, y in zip(wb, wb[1:])]
        ov1 = _clipped_overlap(wa, wb)
        ov2 = _clipped_overlap(ba, bb)
        assert r["ov1"] == ov1 and r["na1"] == len(wa) and r["nb1"] == len(wb)
        assert r["ov2"] == ov2
        assert r["rouge1_f"] == pytest.approx(
            2 * ov1 / (len(wa) + len(wb)), abs=1e-12
        )
        assert r["rouge2_f"] == pytest.approx(
            2 * ov2 / (len(ba) + len(bb)), abs=1e-12
        )


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------


def _rake_ref(texts, stops, scale):
    """Independent pure-Python RAKE over the corpus."""
    from collections import Counter, defaultdict

    phrases = []  # list of tuple(word, ...)
    for t in texts:
        run = []
        for w in t.split(" "):
            if w in stops:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
        if run:
            phrases.append(tuple(run))
    freq, deg = Counter(), Counter()
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    score_q = {w: deg[w] * scale // freq[w] for w in freq}
    agg = defaultdict(lambda: [0, 0, 0])  # phrase -> [n_words, occ, score]
    for ph in phrases:
        e = agg[" ".join(ph)]
        e[0] = len(ph)
        e[1] += 1
        e[2] = sum(score_q[w] for w in ph)
    return sorted(
        ((p, v[0], v[1], v[2]) for p, v in agg.items()),
        key=lambda r: (-r[3], -r[2], r[0]),
    )


def test_rake_keywords_matches_python_reference(spark):
    import duckdb

    from sparkroach.queries import QUERIES
    from sparkroach.queries.llm_ops20 import _RAKE_SCALE, RAKE_STOPS, RAKE_TOP
    from tests.conftest import SF_SMALL

    rows = QUERIES["rake_keywords"].fn(spark, SF_SMALL).collect()
    assert len(rows) == RAKE_TOP
    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM read_parquet('{SF_SMALL}/documents.parquet')"
        ).fetchall()
    ]
    ref = _rake_ref(texts, set(RAKE_STOPS), _RAKE_SCALE)[:RAKE_TOP]
    got = [
        (r["phrase"], r["n_words"], r["n_occurrences"], r["score_q"])
        for r in rows
    ]
    assert got == ref


def test_rake_degree_rewards_cooccurrence():
    # RAKE's signature property: a word living in long phrases outscores
    # an equally frequent word living alone
    ref = _rake_ref(
        ["alpha beta gamma", "alpha beta gamma", "solo the solo"],
        {"the"},
        1_000_000,
    )
    scores = {p: s for p, _, _, s in ref}
    assert scores["alpha beta gamma"] > scores["solo"]


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM
# ---------------------------------------------------------------------------


def _kn_ref(texts, vocab_size, scale):
    """Independent pure-python interpolated KN (d = 3/4, quarters)."""
    from collections import Counter

    toks = [t.split(" ") for t in texts]
    counts = Counter(w for ws in toks for w in ws)
    vocab = set(
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_size
        ]
    )
    map_ = lambda w: w if w in vocab else "<unk>"  # noqa: E731
    big = Counter()
    for ws in toks:
        for a, b in zip(ws, ws[1:]):
            big[(map_(a), map_(b))] += 1
    cv = Counter()
    n1v = Counter()
    n1w = Counter()
    for (v, w), c in big.items():
        cv[v] += c
        n1v[v] += 1
        n1w[w] += 1
    n11 = len(big)
    out = {}
    for v in sorted(cv):
        for w in sorted(n1w):
            c = big.get((v, w), 0)
            num = ((4 * c - 3) * n11 if c else 0) + 3 * n1v[v] * n1w[w]
            out[(v, w)] = (num, 4 * cv[v] * n11, num * scale // (4 * cv[v] * n11))
    return out


def test_kneser_ney_gate_matches_python_reference(spark):
    import duckdb

    from sparkroach.queries import QUERIES
    from sparkroach.queries.llm_ops20 import _KN_SCALE, KN_VOCAB
    from tests.conftest import SF_SMALL

    rows = QUERIES["lm_kneser_ney_bigram"].fn(spark, SF_SMALL).collect()
    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM read_parquet('{SF_SMALL}/documents.parquet')"
        ).fetchall()
    ]
    ref = _kn_ref(texts, KN_VOCAB, _KN_SCALE)
    assert len(rows) == len(ref)
    for r in rows:
        num, den, q = ref[(r["v"], r["w"])]
        assert r["prob_q9"] == q, (r["v"], r["w"])
    # the KN identity: per-context mass sums to EXACTLY one in the
    # rationals (Σ_w num = den for every context v)
    from collections import defaultdict

    mass = defaultdict(int)
    dens = {}
    for (v, _w), (num, den, _q) in ref.items():
        mass[v] += num
        dens[v] = den
    for v in mass:
        assert mass[v] == dens[v], v


def test_kneser_ney_continuation_beats_raw_frequency():
    # KN's signature: "francisco" appears often but only ever after
    # "san" → its continuation probability (weight in UNSEEN contexts)
    # must be lower than a less frequent word seen in many contexts
    texts = (
        ["san francisco"] * 8
        + ["red car", "blue car", "old car", "new car", "a car"]
        + ["the dog"] * 3
    )
    ref = _kn_ref(texts, 24, 10**9)
    # context 'the' never precedes either word → both probabilities are
    # PURE continuation mass.  'francisco' is 8× more frequent than
    # 'car' but lives in a single context; 'car' has five.
    unseen_fr = ref[("the", "francisco")]
    unseen_car = ref[("the", "car")]
    assert unseen_car[2] > unseen_fr[2]  # 5 contexts beats 1 context
    # raw counts would say the opposite
    assert texts.count("san francisco") * 1 > 5


# ---------------------------------------------------------------------------
# Soundex blocking
# ---------------------------------------------------------------------------


def _soundex_ref(name: str) -> str:
    """Independent pure-Python NARA Soundex (reference for the pins)."""
    m = {}
    for chars, d in [
        ("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
        ("l", "4"), ("mn", "5"), ("r", "6"),
    ]:
        for c in chars:
            m[c] = d
    out, prev = [], m.get(name[0].lower())
    for c in name[1:].lower():
        if c in "hw":
            continue  # transparent: same codes across h/w collapse
        d = m.get(c)
        if d and d != prev:
            out.append(d)
        prev = d  # vowels reset prev (None ≠ any digit)
    return (name[0].upper() + "".join(out) + "000")[:4]


NARA_VECTORS = {
    "robert": "R163", "rupert": "R163", "ashcraft": "A261",
    "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
    "honeyman": "H555", "jackson": "J250", "washington": "W252",
    "lee": "L000", "gutierrez": "G362", "lloyd": "L300",
}


def test_soundex_reference_matches_nara_vectors():
    for name, code in NARA_VECTORS.items():
        assert _soundex_ref(name) == code, name


def test_customer_soundex_blocking_matches_reference(spark):
    from sparkroach.queries import QUERIES
    from sparkroach.queries.llm_ops20 import _SURNAMES
    from tests.conftest import SF_SMALL

    rows = QUERIES["customer_soundex_blocking"].fn(spark, SF_SMALL).collect()
    got = {}
    for r in rows:
        for nm in r["names_csv"].split(","):
            got[nm] = r["soundex"]
    # every surname the 150-customer sf0.001 pool reaches must land in
    # the block its reference code names
    assert got, "no blocks"
    for nm, code in got.items():
        assert code == _soundex_ref(nm), (nm, code, _soundex_ref(nm))
    # the variant clusters actually block together (the recall property)
    for cluster in [("smith", "smyth", "smithe"), ("robert", "rupert")]:
        present = [n for n in cluster if n in got]
        assert len({got[n] for n in present}) <= 1, cluster
    # and the census is over the full surname pool at this SF
    assert set(got) == set(_SURNAMES)
