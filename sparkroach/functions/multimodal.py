"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB multimodal corpora:
- media rows are ``(media_id, kind, payload binary, meta struct)``; the
  payload is NEVER interpreted by Catalyst — filters/joins run on the typed
  ``meta`` struct and other scalar columns so column pruning keeps the
  multi-MB payload out of every plan that doesn't decode;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  stages: Arrow moves the binary batches to Python with zero JSON overhead,
  and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds memory per
  batch (a 10k-row default batch of 5 MB images is 50 GB — set it low for
  media tables, e.g. 32);
- partitioning: repartition by ``media_id`` bucket before decode so each
  task holds a bounded payload volume and decode parallelism is even.

The codec calls in THIS module are STUBBED (no imaging/audio libraries in
this environment): ``decode_media`` raises NotImplementedError for real
decoding unless ``fake=True``, which derives deterministic pseudo-metadata
from the payload bytes — the Spark-side plumbing (schemas, batching, UDF
signatures) is real and tested either way.  REAL stdlib codecs (WAV via
``wave``, PPM/BMP via struct parsing) live in ``functions.media`` (r4) and
are gate-checked end-to-end by the ``multimodal_decode`` query; JPEG has
its own from-scratch codec (``functions.jpeg``, r5) and the AVI/MP4
containers are real too (``functions.avi`` r6, ``functions.mp4`` r7) —
only motion-compensated sample decode (H.264/H.265) remains stubbed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("kind", T.StringType()),  # image / audio / video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("histogram16", T.ArrayType(T.LongType())),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents testdata: payload =
    UTF-8 text bytes, metadata derived from doc stats.  Stands in for the
    binary ingest path (s3/parquet BLOB columns) in tests."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        (F.col("n_chars") % 1920).cast("int").alias("width"),
        (F.col("n_chars") % 1080).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        F.lit(16000).alias("sample_rate"),
        F.lit("fake/v1").alias("codec"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def decode_media(payload: bytes, kind: str, fake: bool = False) -> dict:
    """Decode one payload.  Real decoding needs imaging/audio libraries not
    present in this environment — callers opt into the deterministic fake
    decode for plumbing tests."""
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg/torchaudio — not "
            "available in this environment; pass fake=True for the "
            "deterministic stub"
        )
    n = len(payload)
    return {
        "width": (n * 7) % 1920,
        "height": (n * 13) % 1080,
        "ok": True,
    }


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Batch feature extraction over the payload column via mapInPandas.

    Per-batch work is vectorized numpy over the Arrow-delivered binary
    column; output drops the payload so downstream plans stay narrow.
    """

    # NOTE: the closure must be fully self-contained (no references to
    # module-level names): cloudpickle ships nested functions by VALUE,
    # while a reference to e.g. decode_media would ship by module+qualname
    # and fail on executors that can't import sparkroach (the driver
    # harness may run from any cwd without installing the package).
    _fake = fake_decode

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def _decode(payload: bytes) -> dict:
            if not _fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — pass "
                    "fake_decode=True for the deterministic stub"
                )
            n = len(payload)
            return {"width": (n * 7) % 1920, "height": (n * 13) % 1080}

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                buf = np.frombuffer(payload, dtype=np.uint8)
                decoded = _decode(bytes(payload))
                hist = np.bincount(buf >> 4, minlength=16).astype("int64")
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(buf),
                        # exact integer byte sum: lets aggregates stay
                        # hash-comparable (float means don't round-trip
                        # through an SQL oracle bit-exactly; int sums do)
                        "byte_sum": int(buf.sum(dtype=np.int64)),
                        "byte_mean": float(buf.mean()) if len(buf) else 0.0,
                        "histogram16": hist.tolist(),
                        "width": decoded["width"],
                        "height": decoded["height"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_extract, FEATURES_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """The mapInArrow lane of feature extraction: no pandas objects at
    all — the binary column's raw Arrow buffers (offsets + data) are
    viewed as numpy arrays and reduced with `np.diff` / `np.add.reduceat`
    in one vectorized pass per batch.

    Same features as `extract_features`'s hot subset (n_bytes, byte_sum),
    skipping the per-row decode dict entirely.  At 100 TB this is the
    shape for pure byte-level metrics: mapInPandas pays a per-column
    pandas Series materialization (and per-row Python in the decode
    loop); operating on the Arrow buffers directly keeps the Python cost
    at O(columns), not O(rows).
    """

    def _extract(batches):
        import numpy as np
        import pyarrow as pa

        out_schema = pa.schema(
            [
                ("media_id", pa.int64()),
                ("kind", pa.string()),
                ("n_bytes", pa.int64()),
                ("byte_sum", pa.int64()),
            ]
        )
        for batch in batches:
            arr = batch.column(batch.schema.get_field_index("payload"))
            off_dtype = (
                np.int64 if pa.types.is_large_binary(arr.type) else np.int32
            )
            offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
                arr.offset : arr.offset + len(arr) + 1
            ].astype(np.int64)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8).astype(
                np.int64
            )
            lengths = np.diff(offsets)
            if len(arr) == 0:
                continue
            # reduceat quirks: an empty row yields data[offset] instead of
            # 0, and a trailing empty row's offset == len(data) is out of
            # range.  A sentinel 0 byte fixes the range (the last real
            # row's segment absorbs +0); empty rows are masked after.
            data2 = np.append(data, np.int64(0))
            sums = np.add.reduceat(data2, offsets[:-1])
            sums = np.where(lengths > 0, sums, 0)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")),
                    batch.column(batch.schema.get_field_index("kind")),
                    pa.array(lengths, type=pa.int64()),
                    pa.array(sums, type=pa.int64()),
                ],
                schema=out_schema,
            )

    return media.mapInArrow(
        _extract, "media_id long, kind string, n_bytes long, byte_sum long"
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: STUB — emits the target dimensions into meta and keeps
    the payload untouched (a real deployment swaps the body for
    PIL/libvips).  Shape and partitioning behavior are production-real."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["meta"] = [
                {**(m or {}), "width": width, "height": height}
                for m in out["meta"]
            ]
            yield out

    return media.mapInPandas(_resize, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame (video rows
    only).  Frame payload extraction is STUBBED as byte slices; the
    explode-shaped mapInPandas (1 row in → N rows out) is the real pattern."""
    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                duration = (meta or {}).get("duration_ms") or 0
                n_frames = max(1, int(duration // every_ms))
                step = max(1, len(payload) // n_frames) if len(payload) else 1
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "frame_payload": bytes(payload[i * step : i * step + step]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_payload"]
            )

    return media.mapInPandas(_sample, frame_schema)
