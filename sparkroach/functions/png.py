"""From-scratch PNG codec (W3C PNG spec / RFC 2083) — encoder + strict
decoder, stdlib-only (``zlib`` for DEFLATE and CRC-32, ``struct`` for
chunk framing).

Scope (the lossless half of the codec matrix; JPEG covers the lossy
half):

- 8-bit greyscale (colour type 0) and 8-bit truecolour RGB (colour
  type 2), interlace 0 — the shapes the synthetic gate corpus uses;
- ALL FIVE filter types (None / Sub / Up / Average / Paeth, spec §6):
  the encoder cycles the per-row filter so the decoder's
  reconstruction of every filter — including Paeth's three-way
  predictor and Average's floor-of-sum — is exercised on every image;
- multi-IDAT reassembly: the encoder splits the zlib stream at an odd
  97-byte boundary, so the decoder must concatenate IDAT payloads
  before inflating (spec §5: the chunk boundaries carry no meaning);
- strict failure: bad signature, CRC-32 mismatch, unsupported IHDR
  (bit depth ≠ 8, palette/alpha colour types, Adam7 interlace),
  unknown filter byte, and length drift all raise ``ValueError`` — a
  corrupt byte must never produce silently-wrong pixels.

PNG is LOSSLESS, so unlike the JPEG gates the synthetic corpus needs no
exactness construction: any integer pixel function roundtrips exactly,
and the SQL oracle mirrors the pixel arithmetic directly.

Reference parity: none — multimodal decode plumbing per the build brief
(binary payload → Arrow-batched decode → typed features).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# chunk framing
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


# ---------------------------------------------------------------------------
# filters (spec §6) — raw <-> filtered, all mod 256
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ft: int, raw: bytes, prior: bytes, bpp: int) -> bytes:
    out = bytearray(len(raw))
    for i in range(len(raw)):
        a = raw[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        else:  # ft == 4
            pred = _paeth(a, b, c)
        out[i] = (raw[i] - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ft: int, flt: bytes, prior: bytes, bpp: int) -> bytes:
    if ft not in (0, 1, 2, 3, 4):
        raise ValueError(f"png: unknown filter type {ft}")
    out = bytearray(len(flt))
    for i in range(len(flt)):
        a = out[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[i] = (flt[i] + pred) & 0xFF
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_png(
    rows: list[bytes],
    width: int,
    height: int,
    channels: int,
    filter_of_row=None,
    idat_split: int = 97,
) -> bytes:
    """Encode raw 8-bit rows (each ``width*channels`` bytes) as a PNG.

    ``filter_of_row(y) -> 0..4`` picks each row's filter (default cycles
    y % 5 so all five reconstruction paths are exercised); the zlib
    stream is split into ``idat_split``-byte IDAT chunks."""
    if channels not in (1, 3):
        raise ValueError("png encoder: channels must be 1 (grey) or 3 (RGB)")
    if len(rows) != height or any(len(r) != width * channels for r in rows):
        raise ValueError("png encoder: row shape mismatch")
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    bpp = channels
    pick = filter_of_row if filter_of_row is not None else (lambda y: y % 5)
    prior = bytes(width * channels)
    filtered = bytearray()
    for y, raw in enumerate(rows):
        ft = pick(y)
        filtered.append(ft)
        filtered += _filter_row(ft, raw, prior, bpp)
        prior = raw
    z = zlib.compress(bytes(filtered), 6)
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", ihdr)
    for i in range(0, len(z), idat_split):
        out += _chunk(b"IDAT", z[i : i + idat_split])
    out += _chunk(b"IEND", b"")
    return bytes(out)


# ---------------------------------------------------------------------------
# strict decoder
# ---------------------------------------------------------------------------


def decode_png(data: bytes) -> dict:
    """Parse + inflate + un-filter; returns width/height/n_components/
    pixel_sum/filter_hist.  Strict: raises ``ValueError`` on any
    signature, CRC, IHDR-support, filter, or length violation."""
    if len(data) < 8 or data[:8] != _SIG:
        raise ValueError("png: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    ended = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("png: truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError("png: truncated chunk payload")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            if ihdr is not None:
                raise ValueError("png: duplicate IHDR")
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            ended = True
            break
    if ihdr is None:
        raise ValueError("png: missing IHDR")
    if not ended:
        raise ValueError("png: missing IEND")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"png: unsupported bit depth {depth} (only 8)")
    if color_type not in (0, 2):
        raise ValueError(
            f"png: unsupported colour type {color_type} "
            "(only 0=grey, 2=RGB; palette/alpha out of scope)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("png: unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("png: Adam7 interlace not supported")
    channels = 1 if color_type == 0 else 3
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"png: inflated length {len(raw)} != expected "
            f"{height * (stride + 1)}"
        )
    prior = bytes(stride)
    pixel_sum = 0
    filter_hist = [0] * 5
    for y in range(height):
        off = y * (stride + 1)
        ft = raw[off]
        row = _unfilter_row(ft, raw[off + 1 : off + 1 + stride], prior, channels)
        filter_hist[ft] += 1
        pixel_sum += sum(row)
        prior = row
    return {
        "width": width,
        "height": height,
        "n_components": channels,
        "pixel_sum": pixel_sum,
        "filter_hist": filter_hist,
    }


# ---------------------------------------------------------------------------
# gate corpus: deterministic doc_id-arithmetic images (lossless, so the
# SQL oracle mirrors the pixel function directly)
# ---------------------------------------------------------------------------

# even doc_id → greyscale, odd → RGB with channel offsets +85/+170
_G_OFF = 85
_B_OFF = 170


def doc_png_dims(doc_id: int) -> tuple[int, int]:
    return 8 + (doc_id % 5) * 3, 6 + ((doc_id // 5) % 4) * 5


def encode_doc_png(doc_id: int) -> bytes:
    w, h = doc_png_dims(doc_id)
    grey = doc_id % 2 == 0
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            v = (doc_id * 31 + y * 16 + x * 5) % 256
            if grey:
                row.append(v)
            else:
                row += bytes(
                    (v, (v + _G_OFF) % 256, (v + _B_OFF) % 256)
                )
        rows.append(bytes(row))
    # per-doc phase so corpus-wide every (doc phase × row) filter mix runs
    return encode_png(
        rows, w, h, 1 if grey else 3, filter_of_row=lambda y: (doc_id + y) % 5
    )


# ---------------------------------------------------------------------------
# Spark stages (same mapInPandas plumbing as functions.jpeg)
# ---------------------------------------------------------------------------


def synthesize_png_media(docs):
    """(doc_id) → (media_id, payload) with real PNG bytes."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), nullable=False),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _encode(batches):
        from sparkroach.functions.png import encode_doc_png

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        encode_doc_png(int(i)) for i in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(_encode, schema)


def png_features(media):
    """(media_id, payload) → decoded features via the strict decoder;
    n_filters = how many distinct filter types the image used (≥4 on any
    gate image tall enough, proving all reconstruction paths ran)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_components", T.IntegerType()),
            T.StructField("pixel_sum", T.LongType()),
            T.StructField("n_filters", T.IntegerType()),
        ]
    )

    def _decode(batches):
        from sparkroach.functions.png import decode_png

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_png(bytes(payload))
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": d["width"],
                        "height": d["height"],
                        "n_components": d["n_components"],
                        "pixel_sum": d["pixel_sum"],
                        "n_filters": sum(
                            1 for c in d["filter_hist"] if c > 0
                        ),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_components",
                    "pixel_sum", "n_filters",
                ],
            )

    return media.mapInPandas(_decode, schema)
