"""Custom Python streaming sink: the conduit file-exporter analog.

The reference repo IS a conduit exporter plugin (block stream in,
database out — exporter.go:131); conduit's sibling `file_writer`
exporter materializes the same stream as one block file per round.
`conduit_block_files` reproduces that contract as a from-scratch
PySpark 4 `DataSourceStreamWriter` with real two-phase commit:

- **Executor-side writes, driver-side commit.**  Each task writes its
  rows to uniquely-named temp files and returns a `WriterCommitMessage`
  listing (round, temp path); only the driver's `commit` renames them to
  their final ``block_<round>.json`` names (atomic per file), and
  `abort` deletes the temps — a failed or speculatively-duplicated task
  can never leave a half-written or stray block file visible.
- **Exactly-once by idempotence.**  The final name is a pure function of
  the round, so a replayed micro-batch (restart between write and
  checkpoint commit) re-renames over the same targets instead of
  duplicating them — the downstream `conduit_blocks` reader (and the
  reference's round gate) sees each round exactly once.

Together with `block_source.py` this closes the importer→exporter loop:
a block feed can be consumed from files, maintained into tables, and
re-exported as a round-per-file feed, all through engine-native
source/sink contracts rather than foreachBatch glue.

Pickling note: built in a factory so cloudpickle ships the classes BY
VALUE — the write path runs in executor Python workers and the commit
path in the data source runner, neither of which is guaranteed to have
the sparkroach package importable (see block_source.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _build_block_sink_class():
    import os
    import uuid
    from typing import Iterator, List, Optional

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )
    from pyspark.sql.types import Row, StructType

    class BlockFileCommit(WriterCommitMessage):
        def __init__(self, entries):
            self.entries = entries  # (round, temp path)

    class BlockFileStreamWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("conduit_block_files requires a path")
            os.makedirs(self.path, exist_ok=True)  # driver-side, pre-poll

        def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
            tmp_dir = os.path.join(self.path, "_tmp")
            os.makedirs(tmp_dir, exist_ok=True)
            entries = []
            for row in iterator:
                tmp = os.path.join(
                    tmp_dir, f"{row['round']}_{uuid.uuid4().hex}.json"
                )
                with open(tmp, "w", encoding="utf-8") as f:
                    f.write(row["value"] + "\n")
                entries.append((int(row["round"]), tmp))
            return BlockFileCommit(entries)

        def commit(
            self,
            messages: List[Optional[WriterCommitMessage]],
            batchId: int,
        ) -> None:
            for m in messages:
                if m is None:
                    continue
                for rnd, tmp in m.entries:
                    os.replace(
                        tmp, os.path.join(self.path, f"block_{rnd}.json")
                    )

        def abort(
            self,
            messages: List[Optional[WriterCommitMessage]],
            batchId: int,
        ) -> None:
            for m in messages:
                if m is None:
                    continue
                for _, tmp in m.entries:
                    try:
                        os.remove(tmp)
                    except FileNotFoundError:
                        pass

    class BlockFileSinkDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "conduit_block_files"

        def schema(self) -> str:
            return "round long, value string"

        def streamWriter(
            self, schema: StructType, overwrite: bool
        ) -> DataSourceStreamWriter:
            return BlockFileStreamWriter(self.options)

    return BlockFileSinkDataSource


BlockFileSinkDataSource = _build_block_sink_class()


def register_block_sink(spark: SparkSession) -> None:
    spark.dataSource.register(BlockFileSinkDataSource)


def blocks_to_dir(
    typed_blocks: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Export a typed (streaming) block DataFrame as a round-per-file feed:
    encode to the raw envelope JVM-side (`to_json`), then write through
    the two-phase-commit sink.  Returns the started StreamingQuery."""
    spark = typed_blocks.sparkSession
    register_block_sink(spark)
    envelope = typed_blocks.select(
        F.col("round"),
        F.to_json(F.struct(*typed_blocks.columns)).alias("value"),
    )
    writer = (
        envelope.writeStream.format("conduit_block_files")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
