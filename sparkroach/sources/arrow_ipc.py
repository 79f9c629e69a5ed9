"""Arrow IPC file (Feather V2) source + sink — Arrow-native end to end.

The Arrow IPC file format is the de-facto on-disk shape of prepared ML
corpora (it is what the popular dataset-loading libraries memory-map
their caches as), so a training-data engine needs it as a first-class
lane next to parquet/Avro/WARC.  Unlike the from-scratch codecs in this
package, the BYTES here are produced and consumed by pyarrow — a public
library this engine already depends on for every Pandas/Arrow UDF lane —
and the engineering content is the ZERO-COPY plumbing: the PySpark 4
Python DataSource API moves data between the JVM and Python workers as
Arrow RecordBatches, and this source passes those batches STRAIGHT
through to/from `pyarrow.ipc` — no per-row Python on either path:

- reader: one :class:`InputPartition` per ``.arrow`` file; each task
  opens its file and yields the file's own RecordBatches verbatim
  (after a strict schema equality check against the resolved read
  schema — schema EVOLUTION is deliberately the Avro lane's story, this
  lane fails loudly on drift);
- writer: a :class:`DataSourceArrowWriter` — each task streams the
  RecordBatches it receives into ``pyarrow.ipc.new_file`` under a
  dot-prefixed temporary name; the driver renames temporaries into
  place on ``commit()`` and unlinks them on ``abort()`` (the two-phase
  protocol shared with the Avro/binfiles sinks, so a failed or
  speculated task can never leave a half-visible file);
- optional IPC buffer compression (``option("compression",
  "zstd"|"lz4")``) — rejected loudly if this pyarrow build lacks the
  codec, never silently dropped.

Type mapping is explicit and bounded (the types this engine's tables
use: integers, floats, strings, booleans, binary, microsecond
timestamps, and lists thereof); anything else raises at schema time —
never a silent coercion.

Scale design: the driver only LISTS filenames; all bytes flow inside
executor tasks.  Batch passthrough means the Python worker never
materializes rows — the same batches pyarrow reads are what cross the
Arrow socket to the JVM, so the Python-side cost is framing, not data.

Pickling note: classes live inside a factory so cloudpickle serializes
them by value (the Python data source runner has no pyFiles; see
block_source.py).

Reference parity: none — the format matrix (parquet/ORC/CSV/JSON/XML/
text/binaryFile/Avro/WARC/WebDataset/PDF, now Arrow IPC) is part of
this engine's beyond-reference source surface (SURVEY.md §2).
"""

from __future__ import annotations


def _build_arrow_ipc():
    import os
    import uuid
    from dataclasses import dataclass
    from typing import Iterator, List, Sequence, Tuple

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        DataSourceReader,
        InputPartition,
        WriterCommitMessage,
    )
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        BooleanType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    # ---- bounded type mapping (fail loudly outside it) -------------------

    def _arrow_to_spark_type(t):
        import pyarrow as pa

        if pa.types.is_int64(t):
            return LongType()
        if pa.types.is_int32(t):
            return IntegerType()
        if pa.types.is_float64(t):
            return DoubleType()
        if pa.types.is_float32(t):
            return FloatType()
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return StringType()
        if pa.types.is_boolean(t):
            return BooleanType()
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return BinaryType()
        if pa.types.is_timestamp(t) and t.unit == "us":
            return TimestampType()
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return ArrayType(_arrow_to_spark_type(t.value_type))
        raise ValueError(
            f"sparkroach_arrow: unsupported Arrow type {t!r} — the "
            "supported set is int32/int64/float32/float64/string/bool/"
            "binary/timestamp[us]/list-of-those"
        )

    def arrow_to_spark_schema(schema) -> StructType:
        return StructType(
            [
                StructField(f.name, _arrow_to_spark_type(f.type), True)
                for f in schema
            ]
        )

    def _list_arrow(path: str) -> list:
        if os.path.isfile(path):
            return [path]
        if not os.path.isdir(path):
            raise ValueError(f"sparkroach_arrow: no such path {path!r}")
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".arrow") and not f.startswith(".")
        )

    @dataclass
    class FilePartition(InputPartition):
        file_path: str

    class ArrowIpcReader(DataSourceReader):
        def __init__(self, options, schema: StructType):
            self.path = options.get("path", "")
            self.schema = schema

        def partitions(self) -> Sequence[InputPartition]:
            files = _list_arrow(self.path)
            if not files:
                raise ValueError(
                    f"sparkroach_arrow: no .arrow files under {self.path!r}"
                )
            return [FilePartition(f) for f in files]

        def read(self, partition) -> Iterator:
            import pyarrow as pa

            # clean-failure contract (shared with every codec lane):
            # malformed input raises ValueError, never pyarrow's mixed
            # OSError/ArrowException zoo
            try:
                with pa.memory_map(partition.file_path, "r") as src:
                    reader = pa.ipc.open_file(src)
                    got = arrow_to_spark_schema(reader.schema)
                    if got != self.schema:
                        raise ValueError(
                            "sparkroach_arrow: file schema drift in "
                            f"{partition.file_path!r}: file has {got}, "
                            f"read expects {self.schema} (this lane is "
                            "strict — mixed generations belong to the "
                            "Avro lane's schema resolution)"
                        )
                    for i in range(reader.num_record_batches):
                        yield reader.get_batch(i)
            except ValueError:
                raise
            except (OSError, pa.lib.ArrowException) as exc:
                raise ValueError(
                    f"sparkroach_arrow: malformed IPC file "
                    f"{partition.file_path!r}: {exc}"
                ) from exc

    @dataclass
    class ArrowCommit(WriterCommitMessage):
        tmp: str
        final: str

    class ArrowIpcWriter(DataSourceArrowWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options.get("path", "")
            self.compression = options.get("compression") or None
            if overwrite:
                raise ValueError(
                    "sparkroach_arrow: overwrite mode not supported; "
                    "write to a fresh directory (append is the only mode, "
                    "matching the Avro/binfiles sinks)"
                )

        def write(self, iterator) -> ArrowCommit:
            import pyarrow as pa

            if self.compression is not None and not pa.Codec.is_available(
                self.compression
            ):
                raise ValueError(
                    f"sparkroach_arrow: codec {self.compression!r} not "
                    "available in this pyarrow build"
                )
            os.makedirs(self.path, exist_ok=True)
            name = f"part-{uuid.uuid4().hex}.arrow"
            tmp = os.path.join(self.path, f".{name}.tmp")
            final = os.path.join(self.path, name)
            opts = pa.ipc.IpcWriteOptions(compression=self.compression)
            sink = None
            try:
                for batch in iterator:
                    if sink is None:
                        sink = pa.ipc.new_file(
                            tmp, batch.schema, options=opts
                        )
                    sink.write_batch(batch)
                if sink is None:
                    # empty partition: no file at all (the engine requires
                    # a real commit message, so use an empty sentinel)
                    return ArrowCommit(tmp="", final="")
                sink.close()
                return ArrowCommit(tmp=tmp, final=final)
            except BaseException:
                # A task that dies mid-write must not leave its
                # dot-prefixed temporary behind (abort() only unlinks tmps
                # named in commit messages, and retried/speculated tasks
                # would otherwise accumulate them).  Close + unlink are
                # best-effort so they can't mask the original exception.
                if sink is not None:
                    try:
                        sink.close()
                    except Exception:
                        pass
                try:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
                except OSError:
                    pass
                raise

        def commit(self, messages) -> None:
            for m in messages:
                if m is not None and m.tmp:
                    os.replace(m.tmp, m.final)

        def abort(self, messages) -> None:
            for m in messages:
                if m is not None and m.tmp and os.path.exists(m.tmp):
                    os.unlink(m.tmp)

    class ArrowIpcDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "sparkroach_arrow"

        def schema(self) -> StructType:
            """Schema from the first file's IPC footer — a metadata read
            (the footer is why the FILE format, unlike the stream
            format, supports this without scanning data)."""
            import pyarrow as pa

            files = _list_arrow(self.options.get("path", ""))
            if not files:
                raise ValueError(
                    "sparkroach_arrow: no .arrow files to infer schema "
                    "from; pass an explicit .schema(...)"
                )
            with pa.memory_map(files[0], "r") as src:
                return arrow_to_spark_schema(pa.ipc.open_file(src).schema)

        def reader(self, schema: StructType) -> DataSourceReader:
            return ArrowIpcReader(self.options, schema)

        def writer(self, schema: StructType, overwrite: bool):
            return ArrowIpcWriter(self.options, overwrite)

    return ArrowIpcDataSource, arrow_to_spark_schema


ArrowIpcDataSource, arrow_to_spark_schema = _build_arrow_ipc()


def read_ipc_bytes(data: bytes) -> list:
    """Codec-level parse surface (used by the fuzz battery): decode Arrow
    IPC file bytes into RecordBatches, raising ValueError on ANY
    malformation — the same clean-failure contract the DataSource
    reader enforces per file."""
    import pyarrow as pa

    try:
        r = pa.ipc.open_file(pa.BufferReader(data))
        return [r.get_batch(i) for i in range(r.num_record_batches)]
    except ValueError:
        raise
    except (OSError, pa.lib.ArrowException) as exc:
        raise ValueError(f"arrow ipc: malformed: {exc}") from exc


def register_arrow_source(spark) -> None:
    """Idempotent per-session registration (vanilla driver sessions
    included — every gate calls this itself, like the Avro lane)."""
    spark.dataSource.register(ArrowIpcDataSource)
