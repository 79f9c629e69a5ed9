"""Delta + zigzag + LEB128 varint integer-column codec, stdlib-only —
the storage-encoding primitive under Parquet's DELTA_BINARY_PACKED /
protobuf wire format, written from the public encoding rules.

Block format:

  ``DVI1`` magic | varint(count) | varint(zigzag(first)) |
  varint(zigzag(delta_i)) × (count−1) | u32-BE CRC-32 of the
  canonical ``v0,v1,...`` ASCII rendering of the plain values

LEB128: 7-bit little-endian groups, high bit = continue.  Zigzag maps
signed to unsigned ((n << 1) ^ (n >> 63)) so small negative deltas
stay small on the wire.  A sorted timestamp column collapses to a few
bytes per value; the CRC pins the decoded sequence, not just its
aggregate.

The decoder is STRICT: bad magic, truncated varints, fewer or more
payload bytes than ``count`` values, and a CRC mismatch all raise.

Reference parity: none — storage-encoding breadth per the build brief.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"DVI1"
_MASK = (1 << 64) - 1


def zigzag_encode(n: int) -> int:
    if not -(1 << 63) <= n < (1 << 63):
        raise ValueError(f"varint: {n} outside int64")
    return ((n << 1) ^ (n >> 63)) & _MASK


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _emit_uvarint(out: bytearray, u: int) -> None:
    while True:
        grp = u & 0x7F
        u >>= 7
        out.append(grp | (0x80 if u else 0))
        if not u:
            return


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("varint: truncated group")
        if shift > 63:
            raise ValueError("varint: value exceeds 64 bits")
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return u & _MASK, pos


def _crc(values: list[int]) -> int:
    return zlib.crc32(",".join(str(v) for v in values).encode()) & 0xFFFFFFFF


def _wrap64(n: int) -> int:
    """Two's-complement wrap into int64 — deltas of extreme int64
    values overflow the raw difference (found by hypothesis: 4 −
    (−2^63+3) > int64max), so deltas live in wrapping arithmetic like
    every real int64 delta encoder's."""
    return ((n + (1 << 63)) & _MASK) - (1 << 63)


def dvi_encode(values: list[int]) -> bytes:
    out = bytearray(_MAGIC)
    _emit_uvarint(out, len(values))
    prev = None
    for v in values:
        if not -(1 << 63) <= v < (1 << 63):
            raise ValueError(f"varint: {v} outside int64")
        if prev is None:
            _emit_uvarint(out, zigzag_encode(v))
        else:
            _emit_uvarint(out, zigzag_encode(_wrap64(v - prev)))
        prev = v
    out += struct.pack(">I", _crc(values))
    return bytes(out)


def dvi_decode(blob: bytes) -> list[int]:
    if len(blob) < 8 or blob[:4] != _MAGIC:
        raise ValueError(f"varint: bad header {blob[:4]!r}")
    body, tail = blob[4:-4], blob[-4:]
    count, pos = _read_uvarint(body, 0)
    values: list[int] = []
    prev = 0
    for i in range(count):
        u, pos = _read_uvarint(body, pos)
        d = zigzag_decode(u)
        prev = d if i == 0 else _wrap64(prev + d)
        values.append(prev)
    if pos != len(body):
        raise ValueError(f"varint: {len(body) - pos} trailing payload bytes")
    (crc,) = struct.unpack(">I", tail)
    if crc != _crc(values):
        raise ValueError("varint: CRC mismatch on decoded sequence")
    return values
