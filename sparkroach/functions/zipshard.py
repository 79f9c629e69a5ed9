"""Strict ZIP shard codec (stdlib ``zipfile``) — the archive matrix's
second member next to the WebDataset tar lane.

ZIP differs from tar in every way that matters for a shard format: a
CENTRAL DIRECTORY at the end (readers can list members without scanning
the archive — the random-access property object stores exploit), a
per-member CRC-32 the reader verifies on extraction, and per-member
compression choice.  The builder exercises both: .txt members are
DEFLATED, .json members STORED, and every member carries a fixed
timestamp so shard bytes are deterministic.

Layout mirrors the WebDataset convention: per sample ``<doc_id>.txt``
(the text payload) and ``<doc_id>.json`` ({doc_id, lang, source}).
Strict failure contract (ValueError): non-zip input, truncation,
CRC mismatch on any member, unknown member extension, duplicate member,
half-present sample, or stem/metadata doc_id disagreement.

Reference parity: none — source-format breadth per the build brief.
"""

from __future__ import annotations

import io
import json
import zipfile

_FIXED_DT = (2020, 1, 1, 0, 0, 0)  # deterministic member timestamps


def build_zip_shard(samples) -> bytes:
    """samples: iterable of (doc_id, lang, source, text) → zip bytes."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for doc_id, lang, source, text in samples:
            ti = zipfile.ZipInfo(f"{int(doc_id)}.txt", date_time=_FIXED_DT)
            zf.writestr(ti, text.encode("utf-8"), zipfile.ZIP_DEFLATED)
            ji = zipfile.ZipInfo(f"{int(doc_id)}.json", date_time=_FIXED_DT)
            zf.writestr(
                ji,
                json.dumps(
                    {
                        "doc_id": int(doc_id),
                        "lang": lang,
                        "source": source,
                    },
                    sort_keys=True,
                ).encode("utf-8"),
                zipfile.ZIP_STORED,
            )
    return buf.getvalue()


def parse_zip_shard(blob: bytes) -> list[dict]:
    """Strict inverse of :func:`build_zip_shard`; CRC-verified reads."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob), "r")
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a zip archive: {e}") from e
    by_key: dict[str, dict[str, bytes]] = {}
    try:
        with zf:
            for info in zf.infolist():
                stem, dot, ext = info.filename.rpartition(".")
                if not dot or ext not in ("txt", "json"):
                    raise ValueError(
                        f"unknown member extension {info.filename!r}"
                    )
                slot = by_key.setdefault(stem, {})
                if ext in slot:
                    raise ValueError(f"duplicate member {info.filename!r}")
                # zipfile verifies the member CRC-32 during read and
                # raises BadZipFile on mismatch — the strict contract
                slot[ext] = zf.read(info)
    except zipfile.BadZipFile as e:
        raise ValueError(f"corrupt zip archive: {e}") from e
    out: list[dict] = []
    for stem in sorted(by_key):
        slot = by_key[stem]
        if set(slot) != {"txt", "json"}:
            raise ValueError(
                f"sample {stem!r} missing members: has {sorted(slot)}"
            )
        meta = json.loads(slot["json"].decode("utf-8"))
        if not isinstance(meta, dict) or not {
            "doc_id",
            "lang",
            "source",
        } <= meta.keys():
            raise ValueError(
                f"sample {stem!r} metadata is not a "
                "{doc_id, lang, source} object"
            )
        if int(meta["doc_id"]) != int(stem):
            raise ValueError(
                f"sample {stem!r} metadata doc_id {meta['doc_id']} "
                "disagrees with member stem"
            )
        out.append(
            {
                "doc_id": int(meta["doc_id"]),
                "lang": str(meta["lang"]),
                "source": str(meta["source"]),
                "text": slot["txt"].decode("utf-8"),
                "n_members": len(slot),
            }
        )
    out.sort(key=lambda s: s["doc_id"])
    return out
