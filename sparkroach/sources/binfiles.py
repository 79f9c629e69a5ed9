"""Binary-file sink: the write-side complement of ``binaryFile``.

Spark ships a binary *source* (``spark.read.format("binaryFile")`` —
used by the multimodal ingest gates) but no binary *sink*: there is no
built-in way for a job to emit one opaque file per row (image shards,
audio clips, WARC segments, model-ready tar members).  The reference
has the same asymmetry in miniature — its exporter plugin writes one
block file per round (conduit's file_writer exporter) — and the chain
lane already implements that special case as the ``conduit_block_files``
streaming sink.  This module is the general BATCH form: a Python
DataSource writer that persists rows of ``(filename: string,
content: binary)`` as individual files.

Scale/commit design: each task streams its partition's rows straight to
disk (one file per row, never the partition buffered in memory) under
dot-prefixed temporary names; the driver renames temporaries into place
on ``commit()`` and unlinks them on ``abort()`` — the same two-phase
shared-filesystem protocol as the Avro sink (`avro_ocf.py`), so a
failed/speculated task can never leave a half-visible file (readers
list only non-dot names).  Filenames are validated against path
traversal (no separators, no leading dot) because they are DATA, not
trusted config.

Pickling note: class built inside a factory → cloudpickle by value
(the Python data source runner has no pyFiles; see block_source.py).
"""

from __future__ import annotations


def _build_binfiles():
    import os
    import uuid
    from dataclasses import dataclass
    from typing import List, Tuple

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )
    from pyspark.sql.types import BinaryType, StringType, StructType

    def _check_name(name: str) -> str:
        if (
            not name
            or name != os.path.basename(name)
            or name.startswith(".")
            or name in (".", "..")
        ):
            raise ValueError(
                f"sparkroach_binfiles: unsafe filename {name!r} (must be a "
                "bare, non-dot basename)"
            )
        return name

    @dataclass
    class BinCommit(WriterCommitMessage):
        pairs: List[Tuple[str, str]]  # (tmp, final)

    class BinFilesWriter(DataSourceWriter):
        def __init__(self, options, schema: StructType, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("sparkroach_binfiles requires a path")
            names = [f.name for f in schema.fields]
            types = [type(f.dataType) for f in schema.fields]
            if names != ["filename", "content"] or types != [
                StringType,
                BinaryType,
            ]:
                raise ValueError(
                    "sparkroach_binfiles expects exactly "
                    "(filename string, content binary); got "
                    + ", ".join(
                        f"{n} {t.typeName()}"
                        for n, t in zip(
                            names, (f.dataType for f in schema.fields)
                        )
                    )
                )
            self.overwrite = overwrite

        def write(self, iterator) -> WriterCommitMessage:
            os.makedirs(self.path, exist_ok=True)
            pairs: List[Tuple[str, str]] = []
            for row in iterator:
                name = _check_name(row[0])
                tmp = os.path.join(
                    self.path, f".{name}.{uuid.uuid4().hex}.tmp"
                )
                with open(tmp, "wb") as f:
                    f.write(bytes(row[1]))
                pairs.append((tmp, os.path.join(self.path, name)))
            return BinCommit(pairs=pairs)

        def commit(self, messages) -> None:
            if self.overwrite:
                keep = {
                    t for m in messages if m is not None for t, _ in m.pairs
                }
                for n in os.listdir(self.path):
                    full = os.path.join(self.path, n)
                    if not n.startswith(".") and full not in keep:
                        os.unlink(full)
            finals = set()
            for m in messages:
                if m is None:
                    continue
                for tmp, final in m.pairs:
                    if final in finals:
                        raise ValueError(
                            f"sparkroach_binfiles: duplicate filename "
                            f"{os.path.basename(final)!r} across tasks"
                        )
                    finals.add(final)
                    os.replace(tmp, final)

        def abort(self, messages) -> None:
            for m in messages:
                if m is None:
                    continue
                for tmp, _final in m.pairs:
                    if os.path.exists(tmp):
                        os.unlink(tmp)

    class BinFilesDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "sparkroach_binfiles"

        def writer(self, schema: StructType, overwrite: bool):
            return BinFilesWriter(self.options, schema, overwrite)

    return BinFilesDataSource


BinFilesDataSource = _build_binfiles()


def register_binfiles_sink(spark) -> None:
    """Idempotent per-session registration (vanilla sessions included)."""
    spark.dataSource.register(BinFilesDataSource)
