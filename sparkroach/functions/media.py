"""Real stdlib media codecs for the multimodal plane (round 4).

``functions.multimodal`` established the Arrow/mapInPandas plumbing with a
deterministic *fake* decode; this module replaces the codec layer with
REAL container round-trips that need nothing beyond the Python stdlib:

- **WAV** (audio): encoded with the stdlib ``wave`` module (canonical
  44-byte RIFF/fmt/data PCM layout), decoded by ``wave`` again — sample
  rate, channel count, frame count, integer duration and the exact sum of
  |16-bit amplitude| over all samples;
- **PPM** (image, P6 binary): text header + raw RGB triples, decoded by a
  token parser — width, height, exact pixel-channel sum;
- **BMP** (image, 24-bit uncompressed): 14-byte file header + 40-byte
  BITMAPINFOHEADER + bottom-up rows padded to 4 bytes, decoded with
  ``struct`` — width, height, exact pixel-channel sum (padding excluded).

Baseline JPEG got its own from-scratch codec in round 5
(``functions/jpeg.py`` — real DCT/quant/Huffman bitstream, exact on its
tile corpus); the AVI and MP4 containers followed in r6/r7
(``functions/avi.py``, ``functions/mp4.py`` — Motion-JPEG decodes for
real in both).  This module's dispatcher still raises
``NotImplementedError`` for containers it does not own rather than
faking a decode; H.264/H.265 sample decode stays stubbed repo-wide
(motion compensation is the line — the MP4 metadata probe works on
such files without decoding).

The synthetic corpus is derived deterministically from ``doc_id`` alone, so
a SQL oracle can mirror every decoded feature as integer arithmetic — but
the Spark side never shortcuts through the formulas: it materializes real
container bytes and parses them back.  A header byte lost, a padding error,
an endianness mistake → the decoded features (and the driver's value hash)
change.

All features are exact integers (or one integer division) — hash-stable
across engines per the float discipline in queries/registry.py.

100 TB posture: encode/decode are map-only mapInPandas stages over binary
columns; Arrow batch size bounds executor memory (see
functions/multimodal docstring); no shuffle until the caller aggregates.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# deterministic corpus parameters (mirrored as SQL arithmetic in the oracle)
# ---------------------------------------------------------------------------


def container_for(doc_id: int) -> str:
    return ("ppm", "wav", "bmp")[doc_id % 3]


def wav_params(doc_id: int) -> dict:
    return {
        "sample_rate": 8000 + ((doc_id // 3) % 3) * 4000,
        "n_channels": 1 + ((doc_id // 3) % 2),
        "n_frames": 500 + (doc_id % 251),
        "amplitude": 1000 + (doc_id % 97),
    }


def ppm_params(doc_id: int) -> dict:
    return {
        "width": 4 + (doc_id % 13),
        "height": 4 + ((doc_id // 13) % 11),
        "rgb": (doc_id % 256, (doc_id * 7) % 256, (doc_id * 13) % 256),
    }


def bmp_params(doc_id: int) -> dict:
    return {
        "width": 4 + (doc_id % 11),
        "height": 4 + ((doc_id // 11) % 9),
        "rgb": (doc_id % 256, (doc_id * 7) % 256, (doc_id * 13) % 256),
    }


# ---------------------------------------------------------------------------
# encoders — produce REAL container bytes
# ---------------------------------------------------------------------------


def encode_wav(doc_id: int) -> bytes:
    p = wav_params(doc_id)
    amp = p["amplitude"]
    # square wave: frame i carries +amp (even) / -amp (odd) on every channel
    frames = bytearray()
    for i in range(p["n_frames"]):
        s = amp if i % 2 == 0 else -amp
        frames += struct.pack("<h", s) * p["n_channels"]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(p["n_channels"])
        w.setsampwidth(2)
        w.setframerate(p["sample_rate"])
        w.writeframes(bytes(frames))
    return buf.getvalue()


def encode_ppm(doc_id: int) -> bytes:
    p = ppm_params(doc_id)
    w, h = p["width"], p["height"]
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + bytes(p["rgb"]) * (w * h)


def encode_bmp(doc_id: int) -> bytes:
    p = bmp_params(doc_id)
    w, h = p["width"], p["height"]
    row = bytes(p["rgb"][::-1]) * w  # BMP stores BGR
    pad = (-len(row)) % 4
    row += b"\x00" * pad
    data = row * h  # constant fill: bottom-up order doesn't matter
    file_header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


def encode_media(doc_id: int) -> tuple[str, bytes]:
    c = container_for(doc_id)
    enc = {"wav": encode_wav, "ppm": encode_ppm, "bmp": encode_bmp}[c]
    return c, enc(doc_id)


# ---------------------------------------------------------------------------
# decoders — REAL parsers; no doc_id formulas anywhere below this line
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> dict:
    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        nf = w.getnframes()
        if w.getsampwidth() != 2:
            raise ValueError(f"expected 16-bit PCM, got {w.getsampwidth()*8}-bit")
        pcm = np.frombuffer(w.readframes(nf), dtype="<i2")
    return {
        "sample_rate": sr,
        "n_channels": nch,
        "n_frames": nf,
        "duration_ms": nf * 1000 // sr,
        "amp_sum": int(np.abs(pcm.astype(np.int64)).sum()),
    }


def decode_wav_samples(payload: bytes, n: int) -> list[int]:
    """REAL decode of the first ``n`` interleaved PCM samples (the DSP
    lanes' input — a genuine ``wave``-module parse, no doc_id formulas).
    Raises ValueError if the container holds fewer than ``n`` samples or
    is not 16-bit PCM."""
    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"expected 16-bit PCM, got {w.getsampwidth() * 8}-bit"
            )
        nch = w.getnchannels()
        need_frames = -(-n // nch)  # ceil
        if w.getnframes() < need_frames:
            raise ValueError(
                f"need {n} samples, container holds "
                f"{w.getnframes() * nch}"
            )
        pcm = np.frombuffer(w.readframes(need_frames), dtype="<i2")
    return [int(v) for v in pcm[:n]]


def decode_ppm(payload: bytes) -> dict:
    import numpy as np

    # P6 header: magic, width, height, maxval as whitespace-separated
    # tokens; the raster begins after exactly ONE whitespace byte past the
    # maxval token (the spec's rule — a plain bytes.split would eat raster
    # bytes that happen to be whitespace values like 0x0A)
    ws = frozenset(b" \t\r\n\x0b\x0c")

    def _token(pos: int) -> tuple[bytes, int]:
        while pos < len(payload) and payload[pos] in ws:
            pos += 1
        start = pos
        while pos < len(payload) and payload[pos] not in ws:
            pos += 1
        return payload[start:pos], pos

    magic, pos = _token(0)
    if magic != b"P6":
        raise ValueError(f"not a P6 ppm: {magic!r}")
    wtok, pos = _token(pos)
    htok, pos = _token(pos)
    mtok, pos = _token(pos)
    w, h, maxval = int(wtok), int(htok), int(mtok)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    if pos >= len(payload) or payload[pos] not in ws:
        raise ValueError("missing raster separator")
    pos += 1  # exactly one whitespace byte, then raster
    pixels = np.frombuffer(payload[pos : pos + 3 * w * h], dtype=np.uint8)
    if pixels.size != 3 * w * h:
        raise ValueError("truncated pixel data")
    return {
        "width": w,
        "height": h,
        "pixel_sum": int(pixels.astype(np.int64).sum()),
    }


def decode_bmp(payload: bytes) -> dict:
    import numpy as np

    magic, _size, _r1, _r2, data_off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP: {magic!r}")
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (hdr={hdr_size} bpp={bpp} comp={compression})")
    h_abs = abs(h)
    row_stride = (3 * w + 3) // 4 * 4
    total = 0
    for r in range(h_abs):
        off = data_off + r * row_stride
        row = np.frombuffer(payload[off : off + 3 * w], dtype=np.uint8)
        total += int(row.astype(np.int64).sum())
    return {"width": w, "height": h_abs, "pixel_sum": total}


def decode_payload(container: str, payload: bytes) -> dict:
    """Dispatch to the real stdlib decoder; unknown containers raise —
    honesty over fake features (JPEG/MP4 need libs this env lacks)."""
    if container == "wav":
        return decode_wav(payload)
    if container == "ppm":
        return decode_ppm(payload)
    if container == "bmp":
        return decode_bmp(payload)
    raise NotImplementedError(
        f"no stdlib decoder for container {container!r} here — baseline "
        "JPEG has its own from-scratch codec (functions/jpeg.py, r5), "
        "MJPEG-in-AVI video decodes for real through functions/avi.py "
        "(r6: RIFF container parse + per-frame JPEG decode), and the "
        "MP4/ISO BMFF container is real through functions/mp4.py (r7: "
        "box-tree parse + sample-table slicing; Motion-JPEG samples "
        "fully decode, multimodal_mp4_decode).  H.264/H.265 SAMPLE "
        "decode stays stubbed: motion compensation is the line — but "
        "the decode-free metadata probe (multimodal_mp4_probe) still "
        "works on such files"
    )


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("container", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("amp_sum", T.LongType()),
    ]
)


def synthesize_real_media(docs: DataFrame) -> DataFrame:
    """(doc_id) → (media_id, container, payload) with REAL container bytes.

    Module-level codec references are shipped to executor workers via
    ``_shiplib.ensure_shipped`` (callers must invoke it), matching the
    chain plane's pandas-UDF deployment."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparkroach.functions.media import encode_media

        for pdf in batches:
            out = []
            for mid in pdf["doc_id"]:
                c, payload = encode_media(int(mid))
                out.append(
                    {"media_id": int(mid), "container": c, "payload": payload}
                )
            yield pd.DataFrame(out, columns=["media_id", "container", "payload"])

    return docs.select("doc_id").mapInPandas(_encode, MEDIA_SCHEMA)


def decode_real_features(media: DataFrame) -> DataFrame:
    """(media_id, container, payload) → decoded feature row per media via
    the real stdlib parsers.  Map-only; payload dropped on output."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparkroach.functions.media import decode_payload

        cols = [f.name for f in DECODED_SCHEMA.fields]
        for pdf in batches:
            out = []
            for mid, c, payload in zip(
                pdf["media_id"], pdf["container"], pdf["payload"]
            ):
                feat = decode_payload(c, bytes(payload))
                row = dict.fromkeys(cols)
                row.update(
                    {"media_id": int(mid), "container": c, "n_bytes": len(payload)}
                )
                row.update(feat)
                out.append(row)
            pdf_out = pd.DataFrame(out, columns=cols)
            yield pdf_out

    return media.mapInPandas(_decode, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# "video": a multi-frame container (concatenated P6 frames) + frame sampling
# ---------------------------------------------------------------------------

# Real video containers live in functions/avi.py and functions/mp4.py —
# but the frame-sampling OPERATOR (the brief's multimodal list: decode /
# feature-extract / resize / frame-sample) doesn't care what the frames
# are encoded as.  A concatenated-P6 sequence is a legitimate multi-frame
# container (the same idea as Y4M: raw frames behind tiny headers) that
# the stdlib can genuinely parse, so the sampling stage below does REAL
# sequential frame parsing — no doc_id formulas on the decode side.


def video_params(doc_id: int) -> dict:
    return {
        "n_frames": 6 + (doc_id % 10),
        "width": 4 + (doc_id % 7),
        "height": 4 + ((doc_id // 7) % 5),
    }


def frame_rgb(doc_id: int, f: int) -> tuple[int, int, int]:
    return (
        (doc_id + 11 * f) % 256,
        (doc_id * 7 + 3 * f) % 256,
        (doc_id * 13 + 5 * f) % 256,
    )


def encode_video(doc_id: int) -> bytes:
    """Concatenated P6 frames, one fill color per frame."""
    p = video_params(doc_id)
    w, h = p["width"], p["height"]
    frames = []
    for f in range(p["n_frames"]):
        header = f"P6\n{w} {h}\n255\n".encode("ascii")
        frames.append(header + bytes(frame_rgb(doc_id, f)) * (w * h))
    return b"".join(frames)


def _p6_frame(payload: bytes, pos: int) -> tuple[int, int, int, int]:
    """Parse ONE P6 frame starting at ``pos``: returns (width, height,
    raster_start, raster_end).  Same single-whitespace-after-maxval rule
    as decode_ppm."""
    ws = frozenset(b" \t\r\n\x0b\x0c")

    def _token(p: int) -> tuple[bytes, int]:
        while p < len(payload) and payload[p] in ws:
            p += 1
        start = p
        while p < len(payload) and payload[p] not in ws:
            p += 1
        return payload[start:p], p

    magic, pos = _token(pos)
    if magic != b"P6":
        raise ValueError(f"not a P6 frame at offset: {magic!r}")
    wtok, pos = _token(pos)
    htok, pos = _token(pos)
    mtok, pos = _token(pos)
    w, h, maxval = int(wtok), int(htok), int(mtok)
    if maxval != 255:
        raise ValueError(f"expected maxval 255, got {maxval}")
    raster_start = pos + 1  # exactly one whitespace byte after maxval
    raster_end = raster_start + 3 * w * h
    if raster_end > len(payload):
        raise ValueError("truncated P6 raster")
    return w, h, raster_start, raster_end


def decode_video_frames(payload: bytes, sample_every: int = 2) -> dict:
    """REAL sequential frame parse + every-k-th frame sampling: walks the
    concatenated P6 frames, sums raster bytes of sampled frames only."""
    pos = 0
    n_frames = 0
    n_sampled = 0
    sampled_pixel_sum = 0
    width = height = None
    while pos < len(payload):
        w, h, rs, re_ = _p6_frame(payload, pos)
        if width is None:
            width, height = w, h
        elif (w, h) != (width, height):
            raise ValueError("frame dimensions changed mid-stream")
        if n_frames % sample_every == 0:
            n_sampled += 1
            sampled_pixel_sum += sum(payload[rs:re_])
        n_frames += 1
        pos = re_
    return {
        "n_frames": n_frames,
        "width": width,
        "height": height,
        "n_sampled": n_sampled,
        "sampled_pixel_sum": sampled_pixel_sum,
    }


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("sampled_pixel_sum", T.LongType()),
    ]
)


def synthesize_video_media(docs: DataFrame) -> DataFrame:
    """(doc_id) → (media_id, container='ppms', payload) multi-frame bytes."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparkroach.functions.media import encode_video

        for pdf in batches:
            out = []
            for mid in pdf["doc_id"]:
                out.append(
                    {
                        "media_id": int(mid),
                        "container": "ppms",
                        "payload": encode_video(int(mid)),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "container", "payload"])

    return docs.select("doc_id").mapInPandas(_encode, MEDIA_SCHEMA)


def frame_sample_features(media: DataFrame, sample_every: int = 2) -> DataFrame:
    """(media_id, payload) → per-video frame-sample features.  Map-only."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparkroach.functions.media import decode_video_frames

        cols = [f.name for f in FRAME_SAMPLE_SCHEMA.fields]
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                feat = decode_video_frames(bytes(payload), sample_every)
                feat["media_id"] = int(mid)
                out.append(feat)
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(_decode, FRAME_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# resize: nearest-neighbor downscale over a gradient image
# ---------------------------------------------------------------------------

# The constant-fill PPMs above are useless for proving a resize actually
# resamples (any pixel equals any other); the gradient image below varies
# per pixel, so the strided downscale's output depends on WHICH pixels
# were kept — the oracle recomputes the kept-coordinate sum exactly.


def gradient_ppm_params(doc_id: int) -> dict:
    return {"width": 6 + (doc_id % 11), "height": 6 + ((doc_id // 11) % 7)}


def gradient_pixel(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    return (
        (doc_id + 3 * x + 5 * y) % 256,
        (doc_id * 7 + 2 * x + y) % 256,
        (doc_id * 13 + x + 4 * y) % 256,
    )


def encode_gradient_ppm(doc_id: int) -> bytes:
    p = gradient_ppm_params(doc_id)
    w, h = p["width"], p["height"]
    raster = bytearray()
    for y in range(h):
        for x in range(w):
            raster += bytes(gradient_pixel(doc_id, x, y))
    return f"P6\n{w} {h}\n255\n".encode("ascii") + bytes(raster)


def decode_resize_ppm(payload: bytes, factor: int = 2) -> dict:
    """REAL parse + nearest-neighbor downscale: keep pixels at coordinates
    divisible by ``factor`` (numpy strided slicing over the true raster)."""
    import numpy as np

    w, h, rs, re_ = _p6_frame(payload, 0)
    img = np.frombuffer(payload[rs:re_], dtype=np.uint8).reshape(h, w, 3)
    small = img[::factor, ::factor, :]
    return {
        "width": w,
        "height": h,
        "out_width": small.shape[1],
        "out_height": small.shape[0],
        "out_pixel_sum": int(small.astype(np.int64).sum()),
    }


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("out_pixel_sum", T.LongType()),
    ]
)


def synthesize_gradient_media(docs: DataFrame) -> DataFrame:
    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparkroach.functions.media import encode_gradient_ppm

        for pdf in batches:
            out = []
            for mid in pdf["doc_id"]:
                out.append(
                    {
                        "media_id": int(mid),
                        "container": "ppm",
                        "payload": encode_gradient_ppm(int(mid)),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "container", "payload"])

    return docs.select("doc_id").mapInPandas(_encode, MEDIA_SCHEMA)


def resize_features(media: DataFrame, factor: int = 2) -> DataFrame:
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparkroach.functions.media import decode_resize_ppm

        cols = [f.name for f in RESIZE_SCHEMA.fields]
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                feat = decode_resize_ppm(bytes(payload), factor)
                feat["media_id"] = int(mid)
                out.append(feat)
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(_decode, RESIZE_SCHEMA)
