"""Custom Python data source: the conduit file-importer analog.

The reference pipeline's importer plugin delivers blocks one round at a
time, in strict round order, blocking until the next round exists
(conduit.yml:27-68 wires an algod follower importer; the file-importer
variant reads one ``<round>_block.json`` file per round from a watched
directory).  Spark's generic file source cannot express that contract:
it orders micro-batches by file *modification time*, so a block file
that lands late (rsync, retry, clock skew) is delivered out of round
order and the reference's ordered-round gate (cockroach.go:189-199
analog, `ChainDB.add_blocks`) correctly hard-errors.

``conduit_blocks`` is a from-scratch Structured Streaming source (PySpark
4 Python DataSource API) that restores the importer contract:

- **Round-ordered, gap-aware delivery.**  `latestOffset` only advances
  through *contiguous* rounds present on disk: if ``block_7.json`` is
  missing, rounds >= 7 wait — exactly the follower importer blocking on
  the next round — so a late-arriving middle round can never be skipped
  or misordered.
- **Exactly-once.**  Offsets are plain ``{"round": N}`` watermarks
  checkpointed by the engine; a restarted query resumes from the last
  committed round and redelivery is a no-op under the round gate.
- **Executor-side reads.**  The driver only lists filenames (the round
  number is parsed from the name, no file I/O at planning time); each
  round's bytes are read inside its own `InputPartition` on an executor.

Rows are the raw envelope ``(round, value)`` — the block JSON line as
written by the feed — and `blocks_from_dir` parses them to the typed
block schema with one `from_json`, keeping the Python-side reader a thin
byte mover while Catalyst does the decode.

Pickling note: the DataSource class is built INSIDE a factory function,
so its qualname is not module-importable and cloudpickle serializes it
BY VALUE — the streaming data source's Python runner process is spawned
without the session's pyFiles, so a module-referenced class would die
with ModuleNotFoundError there (same self-contained-closure discipline
as functions/multimodal.py, learned the hard way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def next_contiguous_round(present: set[int], start: int) -> int:
    """First round >= start NOT present — the gap-aware offset frontier.
    Delivery may advance through [start, result) and no further: the
    result round is the one the feed has not produced yet, and every
    later file waits behind it (the follower-importer blocking
    contract).  (Mirrored inside the by-value class below, which cannot
    reference module globals; property-tested here.)"""
    nxt = start
    while nxt in present:
        nxt += 1
    return nxt


def _build_block_source_class():
    """Factory: a fully self-contained DataSource class (see module
    docstring's pickling note)."""
    import os
    import re
    from typing import Iterator, Sequence, Tuple

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    file_re = re.compile(r"^block_(\d+)\.json$")

    def round_files(path: str) -> dict:
        out = {}
        try:
            names = os.listdir(path)
        except FileNotFoundError:
            return out
        for name in names:
            m = file_re.match(name)
            if m:
                out[int(m.group(1))] = os.path.join(path, name)
        return out

    class RoundPartition(InputPartition):
        def __init__(self, rnd: int, file_path: str):
            self.rnd = rnd
            self.file_path = file_path

    def read_round(part) -> Iterator[Tuple[int, str]]:
        with open(part.file_path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    yield (part.rnd, line)

    class BlockDirBatchReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("conduit_blocks requires a path")

        def partitions(self) -> Sequence[InputPartition]:
            files = round_files(self.path)
            return [RoundPartition(r, files[r]) for r in sorted(files)]

        def read(self, partition) -> Iterator[Tuple[int, str]]:
            return read_round(partition)

    class BlockDirStreamReader(DataSourceStreamReader):
        _committed = None

        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("conduit_blocks requires a path")
            self.start_round = int(options.get("start_round", "0"))

        def initialOffset(self) -> dict:
            files = round_files(self.path)
            start = min(files) if files else self.start_round
            return {
                "round": min(start, self.start_round) if files else start
            }

        def latestOffset(self) -> dict:
            # advance only through CONTIGUOUS rounds — a gap means the
            # feed has not produced that round yet, so later files wait
            # (the follower-importer blocking contract; the pure logic
            # is next_contiguous_round at module level, property-tested)
            files = round_files(self.path)
            nxt = (
                self._committed
                if self._committed is not None
                else self.initialOffset()["round"]
            )
            while nxt in files:
                nxt += 1
            return {"round": nxt}

        def partitions(self, start: dict, end: dict):
            self._committed = end["round"]
            files = round_files(self.path)
            return [
                RoundPartition(r, files[r])
                for r in range(start["round"], end["round"])
                if r in files  # a pruned round file cannot be re-read
            ]

        def read(self, partition) -> Iterator[Tuple[int, str]]:
            return read_round(partition)

        def commit(self, end: dict) -> None:
            self._committed = end["round"]

    class BlockDirDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "conduit_blocks"

        def schema(self) -> StructType:
            return StructType(
                [
                    StructField("round", LongType(), nullable=False),
                    StructField("value", StringType(), nullable=False),
                ]
            )

        def reader(self, schema) -> DataSourceReader:
            return BlockDirBatchReader(self.options)

        def streamReader(self, schema) -> DataSourceStreamReader:
            return BlockDirStreamReader(self.options)

    return BlockDirDataSource


BlockDirDataSource = _build_block_source_class()


def register_block_source(spark: SparkSession) -> None:
    spark.dataSource.register(BlockDirDataSource)


def write_block_file(spark: SparkSession, path: str, block_df: DataFrame) -> str:
    """Feed side: write one round's block as ``block_<N>.json`` (one JSON
    line, Spark-canonical encoding so binary columns round-trip as base64).
    Single-row driver-side write — this is the *producer* stand-in, not a
    data-path operator."""
    import os

    os.makedirs(path, exist_ok=True)
    rows = block_df.toJSON().collect()
    rnds = [r["round"] for r in block_df.select("round").collect()]
    assert len(rows) == 1 and len(rnds) == 1, "one block file per round"
    target = os.path.join(path, f"block_{rnds[0]}.json")
    tmp = target + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(rows[0] + "\n")
    os.replace(tmp, target)  # atomic: the source never sees half a file
    return target


def blocks_from_dir(
    spark: SparkSession, path: str, streaming: bool = True
) -> DataFrame:
    """Typed block feed from a ``block_<N>.json`` directory through the
    custom source: raw envelope rows decoded by one `from_json` to the
    full nested block schema (JVM-side; the Python reader just moves
    bytes)."""
    from sparkroach.chain.schemas import block_schema

    register_block_source(spark)
    reader = spark.readStream if streaming else spark.read
    raw = reader.format("conduit_blocks").load(path)
    return raw.select(
        F.from_json(F.col("value"), block_schema()).alias("b")
    ).select("b.*")
