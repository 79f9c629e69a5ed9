"""WebDataset-style tar shards: build + strict parse (stdlib tarfile).

WebDataset (github.com/webdataset/webdataset — the de-facto shard format
for large-scale multimodal training corpora, e.g. LAION) stores one
SAMPLE as a group of adjacent tar members sharing a basename stem:
``000000042.txt`` + ``000000042.json`` (+ ``.jpg`` …).  A 100 TB corpus
is a directory of such ``.tar`` shards, one shard per task.

This module implements the on-disk shape from the public format
description only: POSIX tar via the stdlib ``tarfile`` module, members
sorted by name so a sample's members are adjacent (the format's
sequential-read contract), deterministic metadata (mtime=0, uid=gid=0).

``parse_tar_shard`` is strict the way the WARC parser is strict: a
sample missing one of its two members, a duplicate member, or an
unknown extension raises ValueError — a malformed shard must fail the
gate, not silently drop rows.

Reference parity: none (the reference has no shard-format surface);
part of the LLM-training-data plane the brief requires.
"""

from __future__ import annotations

import io
import json
import tarfile


def build_tar_shard(samples) -> bytes:
    """``samples``: iterable of (doc_id, lang, source, text) → tar bytes.

    One ``{doc_id:09d}.txt`` member (utf-8 text) and one
    ``{doc_id:09d}.json`` member (sorted-key compact JSON metadata) per
    sample; members emitted in sorted-name order so each sample's
    members are adjacent, as WebDataset's sequential reader expects.
    """
    members: list[tuple[str, bytes]] = []
    for doc_id, lang, source, text in samples:
        key = f"{int(doc_id):09d}"
        members.append((f"{key}.txt", text.encode("utf-8")))
        meta = json.dumps(
            {"doc_id": int(doc_id), "lang": lang, "source": source},
            sort_keys=True,
            separators=(",", ":"),
        )
        members.append((f"{key}.json", meta.encode("utf-8")))
    members.sort(key=lambda m: m[0])
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def parse_tar_shard(blob: bytes) -> list[dict]:
    """Strict inverse of :func:`build_tar_shard`.

    Returns one dict per sample: ``{"doc_id", "lang", "source", "text",
    "n_members"}`` (n_members = members seen for this sample, always 2
    on success).  Raises ValueError on: non-tar input, unknown member
    extension, duplicate member, a sample missing .txt or .json, or a
    .json whose doc_id disagrees with its stem.
    """
    try:
        tf = tarfile.open(fileobj=io.BytesIO(blob), mode="r:")
    except tarfile.TarError as e:  # clean-failure contract
        raise ValueError(f"not a tar archive: {e}") from e
    by_key: dict[str, dict[str, bytes]] = {}
    try:
        with tf:
            # getmembers/extractfile read lazily — header corruption can
            # surface here, not just at open(); same clean-failure contract
            for m in tf.getmembers():
                if not m.isfile():
                    raise ValueError(f"non-file member {m.name!r}")
                stem, dot, ext = m.name.rpartition(".")
                if not dot or ext not in ("txt", "json"):
                    raise ValueError(f"unknown member extension {m.name!r}")
                slot = by_key.setdefault(stem, {})
                if ext in slot:
                    raise ValueError(f"duplicate member {m.name!r}")
                slot[ext] = tf.extractfile(m).read()
    except tarfile.TarError as e:
        raise ValueError(f"corrupt tar archive: {e}") from e
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
                "lang": meta["lang"],
                "source": meta["source"],
                "text": slot["txt"].decode("utf-8"),
                "n_members": len(slot),
            }
        )
    return out
