"""MP4 / ISO BMFF codec (functions/mp4.py).

Pins: box framing (incl. largesize and to-end-of-file sizes), the
writer's non-faststart layout, exact sample slicing through a
MULTI-ENTRY stsc chunk map the writer itself never emits (reading
foreign files is the hard direction), probe arithmetic, the
Motion-JPEG decode exactness, and the honest H.264 refusal."""

from __future__ import annotations

import struct

import pytest

from sparkroach.functions.mp4 import (
    _box,
    _full,
    decode_mp4_samples,
    encode_doc_mp4,
    encode_mp4_video,
    encode_probe_mp4,
    mp4_frame_tile_value,
    mp4_params,
    parse_mp4,
    probe_params,
    probe_sample_len,
)


def test_writer_layout_and_roundtrip():
    samples = [b"alpha", b"bb", b"c" * 70]
    blob = encode_mp4_video(samples, 64, 48, fps=10, codec=b"jpeg")
    assert blob[4:8] == b"ftyp"
    v = parse_mp4(blob)
    assert v["codec"] == "jpeg" and v["handler"] == "vide"
    assert (v["width"], v["height"]) == (64, 48)
    assert v["samples"] == samples
    assert v["n_samples"] == 3
    assert v["duration"] == 300 and v["timescale"] == 1000
    assert v["sample_deltas"] == [(3, 100)]
    # deterministic bytes
    assert encode_mp4_video(samples, 64, 48) == blob


def test_empty_sample_list_rejected():
    with pytest.raises(ValueError, match="at least one sample"):
        encode_mp4_video([], 8, 8)


def test_largesize_and_to_end_boxes_parse():
    samples = [b"payload-bytes"]
    blob = encode_mp4_video(samples, 16, 16)
    # rewrite mdat as a largesize box (size=1 + 64-bit size) and shift
    # the single stco offset by the 8 extra header bytes
    ftyp_end = struct.unpack_from(">I", blob, 0)[0]
    mdat_size = struct.unpack_from(">I", blob, ftyp_end)[0]
    mdat_body = blob[ftyp_end + 8 : ftyp_end + mdat_size]
    big = (
        struct.pack(">I", 1)
        + b"mdat"
        + struct.pack(">Q", 16 + len(mdat_body))
        + mdat_body
    )
    rest = blob[ftyp_end + mdat_size :]
    old_off = ftyp_end + 8
    new_off = ftyp_end + 16
    idx = rest.rindex(struct.pack(">I", old_off))
    rest = rest[:idx] + struct.pack(">I", new_off) + rest[idx + 4 :]
    v = parse_mp4(blob[:ftyp_end] + big + rest)
    assert v["samples"] == samples


def test_multi_entry_stsc_chunk_map():
    """Hand-built file: 5 samples over 2 chunks (2 then 3) with a
    two-run stsc — the general chunk map the writer never emits."""
    samples = [bytes([i]) * (i + 3) for i in range(5)]
    base = encode_mp4_video(samples, 8, 8)  # steal ftyp/moov scaffolding
    ftyp_end = struct.unpack_from(">I", base, 0)[0]
    chunk1 = b"".join(samples[:2])
    gap = b"\xee" * 7  # unreferenced bytes between chunks
    chunk2 = b"".join(samples[2:])
    mdat = _box(b"mdat", chunk1 + gap + chunk2)
    off1 = ftyp_end + 8
    off2 = off1 + len(chunk1) + len(gap)
    moov = base[ftyp_end + struct.unpack_from(">I", base, ftyp_end)[0] :]
    # splice new stsc + stco into the existing moov
    old_stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 5, 1))
    new_stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 2, 3, 1),
    )
    old_stco = _full(b"stco", 0, 0, struct.pack(">II", 1, ftyp_end + 8))
    new_stco = _full(
        b"stco", 0, 0, struct.pack(">I", 2) + struct.pack(">II", off1, off2)
    )
    assert old_stsc in moov and old_stco in moov
    moov = moov.replace(old_stsc, new_stsc).replace(old_stco, new_stco)
    # fix every enclosing box size on the path to the spliced tables
    grew = (len(new_stsc) - len(old_stsc)) + (len(new_stco) - len(old_stco))
    fixed = bytearray(moov)
    pos = 0  # moov, trak, mdia, minf, stbl all enclose stbl's tables
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        idx = bytes(fixed).index(fourcc, pos) - 4
        size = struct.unpack_from(">I", fixed, idx)[0]
        struct.pack_into(">I", fixed, idx, size + grew)
        pos = idx + 8
    v = parse_mp4(base[:ftyp_end] + mdat + bytes(fixed))
    assert v["samples"] == samples


def test_probe_arithmetic_and_refusal():
    for doc_id in (0, 4, 9, 17):
        p = probe_params(doc_id)
        v = parse_mp4(encode_probe_mp4(doc_id))
        assert v["codec"] == "avc1"
        assert (v["width"], v["height"]) == (p["width"], p["height"])
        sizes = [probe_sample_len(doc_id, k) for k in range(p["n_samples"])]
        assert [len(s) for s in v["samples"]] == sizes
        assert sum(sum(s) for s in v["samples"]) == sum(
            n * ((doc_id + k) % 256) for k, n in enumerate(sizes)
        )
        with pytest.raises(NotImplementedError, match="motion"):
            decode_mp4_samples(v)


def test_motion_jpeg_decode_exact():
    for doc_id in (0, 5, 11):
        p = mp4_params(doc_id)
        w, h = p["width"], p["height"]
        v = parse_mp4(encode_doc_mp4(doc_id))
        frames = decode_mp4_samples(v)
        assert len(frames) == p["n_frames"]
        for f, d in enumerate(frames):
            expect = 3 * 64 * sum(
                mp4_frame_tile_value(doc_id, f, tx, ty)
                for tx in range(w // 8)
                for ty in range(h // 8)
            )
            assert (d["width"], d["height"], d["pixel_sum"]) == (
                w, h, expect,
            )


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[:10], "truncated|shorter"),
        (lambda b: b"XXXX" + b[4:], "size|ftyp"),
        (lambda b: b[:-6], "overruns|truncated|missing"),
        (lambda b: b.replace(b"moov", b"mooX", 1), "missing required"),
        # stsz count inflated by one → stts disagreement
        (
            lambda b: b.replace(
                struct.pack(">II", 0, _nsamp(b)),
                struct.pack(">II", 0, _nsamp(b) + 1),
                1,
            ),
            "disagrees|truncated",
        ),
    ],
)
def test_parser_strictness(mutate, msg):
    blob = encode_probe_mp4(3)
    with pytest.raises(ValueError, match=msg):
        parse_mp4(mutate(blob))


def _nsamp(blob: bytes) -> int:
    return parse_mp4(blob)["n_samples"]


def test_full_box_version_1_rejected():
    blob = encode_probe_mp4(2)
    idx = blob.index(b"stts") + 4
    bad = blob[:idx] + b"\x01" + blob[idx + 1 :]
    with pytest.raises(ValueError, match="version"):
        parse_mp4(bad)
