"""Round-8 wave 3: QOI codec lane, LZ4 block lane, ROUGE pair scoring,
RAKE keyword extraction, priority sampling, Soundex blocking.

Registered ``gated=False`` with DELEGATED twins (rotation.DELEGATED) —
the R8 window is full at 50; these are R9-window candidates, swept by
the local oracle at three SFs like every registry entry.

Reference parity: none — LLM-data-pipeline breadth per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# multimodal_qoi_decode — QOI codec (run / index-cache / delta family)
# ---------------------------------------------------------------------------


def _qoi_oracle() -> str:
    # mirrors functions/qoi.py doc_image_dims + doc_pixel: the codec is
    # lossless, so decoded pixels == the closed-form synthesis
    chan = {
        "r": ("(d.doc_id * 7 + (p.p // 8) * 13) % 256", 1, 12, 97),
        "g": ("(d.doc_id * 11 + (p.p // 8) * 29) % 256", 1, 9, 57),
        "b": ("(d.doc_id * 3 + (p.p // 8) * 53) % 256", 1, 4, 201),
    }
    exprs = {}
    for name, (base, k1, k2, k3) in chan.items():
        m = "(p.p % 8)"
        exprs[name] = f"""(CASE ((p.p // 8) % 4)
            WHEN 0 THEN {base}
            WHEN 1 THEN ({base} + {m} * {k1}) % 256
            WHEN 2 THEN ({base} + {m} * {k2}) % 256
            ELSE CASE WHEN {m} % 2 = 0 THEN {base}
                      ELSE ({base} + {m} * {k3}) % 256 END
        END)"""
    r, g, b = exprs["r"], exprs["g"], exprs["b"]
    return f"""
        WITH dims AS (
            SELECT doc_id,
                   8 + (doc_id % 5) * 4 AS w,
                   6 + ((doc_id // 5) % 4) * 3 AS h
            FROM documents
        )
        SELECT d.doc_id AS media_id,
               CAST(d.w AS INT) AS width,
               CAST(d.h AS INT) AS height,
               CAST(d.w * d.h AS INT) AS n_px,
               CAST(SUM({r}) AS BIGINT) AS r_sum,
               CAST(SUM({g}) AS BIGINT) AS g_sum,
               CAST(SUM({b}) AS BIGINT) AS b_sum,
               CAST(SUM(p.p * ({r} * 65536 + {g} * 256 + {b})) AS BIGINT)
                   AS pos_checksum
        FROM dims d
        JOIN range(0, 384) p(p) ON p.p < d.w * d.h
        GROUP BY d.doc_id, d.w, d.h
        ORDER BY media_id
    """


@register(
    "multimodal_qoi_decode",
    # R9-window candidate: registered gated=False, DELEGATED to
    # multimodal_png_decode (lossless image codec through the identical
    # mapInPandas lane with a pixel-arithmetic oracle, in the R8
    # window); the QOI chunk semantics (run cap 62, index-cache hits,
    # DIFF/LUMA wraparound, strict framing) are unit-pinned in
    # tests/test_llm_ops20.py.
    gated=False,
    oracle=_qoi_oracle(),
    survey_ref="LLM ops: multimodal decode — from-scratch QOI codec "
    "(qoiformat.org spec): run-length + 64-slot index cache + "
    "DIFF/LUMA delta chunks — a FOURTH compression family next to "
    "DEFLATE (PNG), Huffman (JPEG) and LZW (GIF) in the codec matrix",
    description="encode a real QOI image per document (8-pixel groups "
    "cycling constant/+1-step/luma-step/jump-revisit patterns so every "
    "stream exercises RUN, DIFF, LUMA, RGB and INDEX chunks) and decode "
    "it with an independent strict decoder; lossless, so the oracle "
    "mirrors the pixel synthesis as pure doc_id arithmetic.  Per-channel "
    "sums plus a position-weighted checksum — a wrong run length or "
    "delta bias breaks a hash.  Map-only mapInPandas both ways",
)
def multimodal_qoi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach._shiplib import ensure_shipped
    from sparkroach.functions.qoi import qoi_features, synthesize_qoi_media

    ensure_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    return qoi_features(synthesize_qoi_media(docs)).orderBy("media_id")


# ---------------------------------------------------------------------------
# documents_lz4_block_roundtrip — LZ4 block codec lane
# ---------------------------------------------------------------------------


def _lz4_oracle() -> str:
    from sparkroach.queries.llm_ops10 import _th32_sql

    return f"""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS plain_bytes,
               CAST({_th32_sql("md5(text)")} AS BIGINT) AS text_h32
        FROM documents
        ORDER BY doc_id
    """


@register(
    "documents_lz4_block_roundtrip",
    # R9-window candidate: registered gated=False, DELEGATED to
    # documents_tar_webdataset_ingest (driver-proven r7 gate: real bytes
    # built, carried and strictly re-parsed through mapInPandas stages
    # with a text-hash oracle); the LZ4 sequence semantics (overlap
    # copies, length extensions, end-of-block rules, strict failures)
    # are unit-pinned in tests/test_llm_ops20.py.
    gated=False,
    oracle=_lz4_oracle(),
    survey_ref="source formats / codecs: LZ4 block format — a FIFTH "
    "compression family (raw byte-aligned LZ77 sequences, no entropy "
    "stage) next to DEFLATE, Huffman, LZW and QOI; the compression "
    "training-shard pipelines actually use for hot intermediate data",
    description="compress every document's UTF-8 text to a real LZ4 "
    "block (greedy hash-table matcher, 15-extension lengths, overlap-"
    "capable matches, spec end-of-block rules) in one mapInPandas "
    "stage, decompress with the independent strict decoder in a second "
    "— the lane carries only (plain_len, payload), so a one-byte copy "
    "error breaks the md5-derived hash.  Lossless: the oracle hashes "
    "the source text directly.  Map-only, no shuffle",
)
def documents_lz4_block_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach._shiplib import ensure_shipped
    from sparkroach.functions.lz4block import (
        compress_documents,
        decompress_features,
    )

    ensure_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    return decompress_features(compress_documents(docs)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# source_priority_sample — Duffield-Lund-Thorup priority sampling
# ---------------------------------------------------------------------------

PS_K = 16  # per-source sample size


def _ps_oracle() -> str:
    from sparkroach.queries.llm_ops10 import _th32_sql

    h = _th32_sql("md5('ps:' || CAST(doc_id AS VARCHAR))")
    return f"""
        WITH pr AS (
            SELECT source, doc_id, n_chars AS w,
                   CAST(n_chars * 4294967296 AS DOUBLE)
                       / CAST(({h}) + 1 AS DOUBLE) AS priority
            FROM documents
        ),
        rk AS (
            SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY priority DESC, doc_id
            ) AS rk FROM pr
        ),
        tau AS (
            SELECT source, MAX(CASE WHEN rk = {PS_K + 1} THEN priority
                                    ELSE 0.0 END) AS tau
            FROM rk GROUP BY source
        )
        SELECT r.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(r.w) AS BIGINT) AS true_weight,
               CAST(SUM(CASE WHEN r.rk <= {PS_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_sample,
               ROUND(t.tau, 6) AS tau_r6,
               CAST(SUM(CASE WHEN r.rk <= {PS_K}
                              AND CAST(r.w AS DOUBLE) >= t.tau
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_w_ge_tau,
               CAST(SUM(CASE WHEN r.rk <= {PS_K}
                              AND CAST(r.w AS DOUBLE) >= t.tau
                             THEN r.w ELSE 0 END) AS BIGINT)
                   AS sum_w_ge_tau,
               CAST(SUM(CASE WHEN r.rk <= {PS_K}
                              AND CAST(r.w AS DOUBLE) < t.tau
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_w_lt_tau
        FROM rk r JOIN tau t ON t.source = r.source
        GROUP BY r.source, t.tau
        ORDER BY r.source
    """


@register(
    "source_priority_sample",
    # R9-window candidate: registered gated=False, DELEGATED to
    # fixed_size_sample_per_source (md5-deterministic per-source top-k
    # sampling through a per-key rank window — the recorded plan
    # family); the DLT estimator's unbiasedness-shape and the
    # exact-ratio priority construction are pinned in
    # tests/test_llm_ops20.py.
    gated=False,
    oracle=_ps_oracle(),
    survey_ref="training-data management: PRIORITY SAMPLING (Duffield-"
    "Lund-Thorup) — weight-proportional fixed-size samples whose "
    "threshold estimator Σ max(w, τ) is unbiased for the population "
    "total: the principled way to subsample a corpus by length/quality "
    "weight while keeping totals estimable, next to the uniform and "
    "temperature samplers",
    description=f"per source: priority = w·2^32/(h+1) with h the "
    "md5-derived 32-bit hash of the doc id — ONE IEEE division of two "
    "exact integers (w ≤ 577 keeps w·2^32 < 2^53), so both engines "
    f"compute bit-identical priorities; sample = top-{PS_K} by "
    f"(priority desc, doc_id), τ = the {PS_K + 1}-th priority (0 when "
    "the source fits entirely).  Reported: exact true weight, the "
    "sample split around τ (counts + exact weight sums) and τ rounded "
    "6 — the Σ max(w,τ) estimator re-assembled and property-checked in "
    "the unit pin.  Per-source rank windows, map-side everything else",
)
def source_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sparkroach.queries.llm_ops10 import _th32

    d = load(spark, sf_dir, "documents")
    h = _th32(F.concat(F.lit("ps:"), F.col("doc_id").cast("string")))
    pr = d.select(
        "source",
        "doc_id",
        F.col("n_chars").alias("w"),
        (
            (F.col("n_chars") * F.lit(4294967296)).cast("double")
            / (h + 1).cast("double")
        ).alias("priority"),
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    rk = pr.withColumn("rk", F.row_number().over(w_rank))
    tau = rk.groupBy("source").agg(
        F.max(
            F.when(F.col("rk") == PS_K + 1, F.col("priority")).otherwise(0.0)
        ).alias("tau")
    )
    in_sample = F.col("rk") <= PS_K
    w_ge = in_sample & (F.col("w").cast("double") >= F.col("tau"))
    w_lt = in_sample & (F.col("w").cast("double") < F.col("tau"))
    return (
        rk.join(tau, "source")
        .groupBy("source", "tau")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("true_weight"),
            F.sum(in_sample.cast("int")).cast("long").alias("n_sample"),
            F.sum(w_ge.cast("int")).cast("long").alias("n_w_ge_tau"),
            F.sum(F.when(w_ge, F.col("w")).otherwise(0))
            .cast("long")
            .alias("sum_w_ge_tau"),
            F.sum(w_lt.cast("int")).cast("long").alias("n_w_lt_tau"),
        )
        .select(
            "source",
            "n_docs",
            "true_weight",
            "n_sample",
            F.round("tau", 6).alias("tau_r6"),
            "n_w_ge_tau",
            "sum_w_ge_tau",
            "n_w_lt_tau",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# multimodal_tiff_decode — baseline TIFF container + PackBits RLE
# ---------------------------------------------------------------------------


def _tiff_oracle() -> str:
    g = (
        "(CASE WHEN ((p.p // 8) % 4) = 1 "
        "THEN ((d.doc_id * 13 + (p.p // 8) * 41) % 256 + (p.p % 8) * 23) % 256 "
        "ELSE (d.doc_id * 13 + (p.p // 8) * 41) % 256 END)"
    )
    return f"""
        WITH dims AS (
            SELECT doc_id,
                   16 + (doc_id % 4) * 8 AS w,
                   12 + ((doc_id // 4) % 3) * 6 AS h
            FROM documents
        )
        SELECT d.doc_id AS media_id,
               CAST(d.w AS INT) AS width,
               CAST(d.h AS INT) AS height,
               CAST(d.w * d.h AS INT) AS n_px,
               CAST(SUM({g}) AS BIGINT) AS gray_sum,
               CAST(SUM(p.p * {g}) AS BIGINT) AS pos_checksum
        FROM dims d
        JOIN range(0, 1200) p(p) ON p.p < d.w * d.h
        GROUP BY d.doc_id, d.w, d.h
        ORDER BY media_id
    """


@register(
    "multimodal_tiff_decode",
    # R9-window candidate: registered gated=False, DELEGATED to
    # multimodal_png_decode (lossless image codec through the identical
    # mapInPandas lane with a pixel-arithmetic oracle, R8 window); the
    # PackBits token semantics, the IFD walk (out-of-line strip
    # tables, sorted tags, next-IFD pointer) and strict failures are
    # unit-pinned in tests/test_llm_ops20.py.
    gated=False,
    oracle=_tiff_oracle(),
    survey_ref="LLM ops: multimodal decode — baseline TIFF 6.0 "
    "container (real little-endian IFD with out-of-line strip "
    "offset/count tables, strip-per-row) + PackBits RLE — a SEVENTH "
    "compression family (pure run-length, the floor of the hierarchy) "
    "and the second real IFD-style container next to MP4's box walk",
    description="encode a real baseline TIFF per document (8-bit "
    "grayscale, strip-per-row PackBits, IFD value-offset indirection "
    "for the strip tables) and decode it with an independent strict "
    "IFD walker; lossless, so the oracle mirrors the pixel synthesis "
    "as doc_id arithmetic (constant groups → repeat tokens, ramp "
    "groups → literal tokens).  Map-only mapInPandas both ways",
)
def multimodal_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach._shiplib import ensure_shipped
    from sparkroach.functions.tiff import synthesize_tiff_media, tiff_features

    ensure_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    return tiff_features(synthesize_tiff_media(docs)).orderBy("media_id")


# ---------------------------------------------------------------------------
# multimodal_rice_audio_roundtrip — Rice/Golomb linear-prediction codec
# ---------------------------------------------------------------------------


def _rice_oracle() -> str:
    from sparkroach.functions.rice import RICE_N_SAMPLES

    x = (
        "(-8000 + (d.doc_id * 7) % 256 + (3 + d.doc_id % 5) * p.p "
        "+ (d.doc_id * 31 + p.p * 17) % 5)"
    )
    return f"""
        SELECT d.doc_id AS media_id,
               CAST({RICE_N_SAMPLES} AS INT) AS n_samples,
               CAST(SUM({x}) AS BIGINT) AS sample_sum,
               CAST(SUM(p.p * {x}) AS BIGINT) AS pos_checksum,
               TRUE AS compressed_lt_raw
        FROM documents d
        JOIN range(0, {RICE_N_SAMPLES}) p(p) ON TRUE
        GROUP BY d.doc_id
        ORDER BY media_id
    """


@register(
    "multimodal_rice_audio_roundtrip",
    # R9-window candidate: registered gated=False, DELEGATED to
    # multimodal_g711_roundtrip → recorded twin multimodal_goertzel_tone
    # (real audio codec through the mapInPandas lane with a closed-form
    # integer oracle); the Rice coding, predictor selection and strict
    # framing are unit-pinned in tests/test_llm_ops20.py.
    gated=False,
    oracle=_rice_oracle(),
    survey_ref="LLM ops: multimodal audio — Rice/Golomb-coded linear "
    "prediction (the FLAC-family construction: fixed polynomial "
    "predictors order 0..2 + Rice(k) residual coding) — an EIGHTH "
    "compression family and the first bit-level ENTROPY coder in the "
    "matrix, measured 0.36 vs raw s16 on the gate corpus",
    description="96 deterministic PCM16 samples per document (linear "
    "ramp + bounded wiggle, so order-1/2 prediction leaves tiny "
    "residuals) encoded to a real Rice container (per-block best "
    "(order, k) chosen by exact bit cost, zigzag residuals, unary+k-"
    "bit codes, CRC-32) and decoded by the independent strict reader; "
    "lossless, so the oracle mirrors the sample synthesis as doc_id "
    "arithmetic.  The compressed_lt_raw column makes the compression "
    "claim itself hash-checked: if the codec ever stops beating raw "
    "s16 on this corpus, the driver sees it.  Map-only mapInPandas",
)
def multimodal_rice_audio_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from sparkroach._shiplib import ensure_shipped
    from sparkroach.functions.rice import rice_features, synthesize_rice_media

    ensure_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    return rice_features(synthesize_rice_media(docs)).orderBy("media_id")


# ---------------------------------------------------------------------------
# documents_bwt_shard_roundtrip — block-sorting (BWT+MTF+RLE) codec lane
# ---------------------------------------------------------------------------

N_BWT_SHARDS = 8


def _bwt_oracle() -> str:
    from sparkroach.queries.llm_ops10 import _th32_sql

    return f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(COUNT(DISTINCT doc_id % {N_BWT_SHARDS}) AS BIGINT)
                   AS n_shards,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(SUM(strlen(text)) AS BIGINT) AS sum_payload_bytes,
               CAST(SUM({_th32_sql("md5(text)")}) AS BIGINT) AS text_hash_sum
        FROM documents
    """


@register(
    "documents_bwt_shard_roundtrip",
    # R9-window candidate: registered gated=False, DELEGATED to
    # documents_tar_webdataset_ingest (driver-proven r7 gate: shard
    # bytes built in applyInPandas, strictly re-parsed, checksum-
    # aggregated); the BWT/MTF/RLE conformance (banana→nnbaaa vector,
    # rank-doubling vs naive rotations, varint runs, strict container,
    # measured compression) is unit-pinned in tests/test_llm_ops20.py.
    gated=False,
    oracle=_bwt_oracle(),
    survey_ref="source formats / codecs: block-sorting compression "
    "(Burrows-Wheeler transform + move-to-front + zero-run RLE — the "
    "bzip2 family's core) — a SIXTH compression family: a reversible "
    "rotation-sort permutation rather than a dictionary or entropy "
    "table; measured 0.40 on shard blocks with no entropy stage at all",
    description=f"documents → {N_BWT_SHARDS} shard blocks (doc_id-"
    "keyed, canonically ordered 'id\\ttext' lines) → one real SBWT "
    "container per shard (Manber-Myers rank-doubling rotation sort — "
    "naive comparison is quadratic exactly on the repetitive inputs "
    "block-sorting is for — MTF, zero-run varint RLE, CRC-32) → "
    "strict decompress → line parse → checksum aggregate; a one-byte "
    "container error breaks a hash or the CRC.  Block size is "
    "shard-bounded; the per-shard transform is embarrassingly "
    "parallel applyInPandas",
)
def documents_bwt_shard_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach._shiplib import ensure_shipped
    from sparkroach.queries.llm_ops10 import _th32

    ensure_shipped(spark)
    d = load(spark, sf_dir, "documents")

    def to_block(pdf):
        import pandas as pd

        from sparkroach.functions.bwt import sbwt_compress

        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["file_id"].iloc[0])
        block = "\n".join(
            f"{did}\t{txt}" for did, txt in zip(pdf["doc_id"], pdf["text"])
        ).encode("utf-8")
        blob = sbwt_compress(block)
        if len(block) > 64 and len(blob) >= 2 * len(block):
            raise ValueError(
                f"bwt shard {fid}: pathological expansion "
                f"{len(blob)}/{len(block)}"
            )
        return pd.DataFrame({"file_id": [fid], "payload": [blob]})

    def parse(batches):
        import pandas as pd

        from sparkroach.functions.bwt import sbwt_decompress

        for pdf in batches:
            ids, texts = [], []
            for payload in pdf["payload"]:
                block = sbwt_decompress(bytes(payload)).decode("utf-8")
                if block:
                    for line in block.split("\n"):
                        did, txt = line.split("\t", 1)
                        ids.append(int(did))
                        texts.append(txt)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    blocks = (
        d.select("doc_id", "text")
        .withColumn("file_id", F.pmod("doc_id", F.lit(N_BWT_SHARDS)))
        .groupBy("file_id")
        .applyInPandas(to_block, "file_id int, payload binary")
    )
    parsed = blocks.mapInPandas(parse, "doc_id long, text string")
    return parsed.agg(
        F.count("*").cast("long").alias("n_samples"),
        F.countDistinct(F.pmod("doc_id", F.lit(N_BWT_SHARDS)))
        .cast("long")
        .alias("n_shards"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
        F.sum(F.length("text")).cast("long").alias("sum_payload_bytes"),
        F.sum(_th32("text")).cast("long").alias("text_hash_sum"),
    )


# ---------------------------------------------------------------------------
# events_delta_varint_roundtrip — delta+zigzag+LEB128 column encoding
# ---------------------------------------------------------------------------


def _dvi_oracle() -> str:
    from sparkroach.queries.llm_ops10 import _th32_sql

    ts_seq = (
        "string_agg(CAST(epoch_us(ts::TIMESTAMP) AS VARCHAR), ','"
        " ORDER BY epoch_us(ts::TIMESTAMP), event_id)"
    )
    v_seq = (
        "string_agg(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), ','"
        " ORDER BY epoch_us(ts::TIMESTAMP), event_id)"
    )
    return f"""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(epoch_us(ts::TIMESTAMP))
                    - MIN(epoch_us(ts::TIMESTAMP)) AS BIGINT) AS ts_span_us,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents_sum,
               CAST({_th32_sql(f"md5({ts_seq})")} AS BIGINT) AS ts_h32,
               CAST({_th32_sql(f"md5({v_seq})")} AS BIGINT) AS value_h32
        FROM events GROUP BY user_id ORDER BY user_id
    """


@register(
    "events_delta_varint_roundtrip",
    # R9-window candidate: registered gated=False, DELEGATED to
    # documents_tar_webdataset_ingest (real bytes built and strictly
    # re-parsed through grouped-pandas stages with a content-hash
    # oracle — the recorded lane family); the zigzag/LEB128/delta
    # semantics and strict container failures are unit-pinned in
    # tests/test_llm_ops20.py.
    gated=False,
    oracle=_dvi_oracle(),
    survey_ref="source formats / storage encodings: delta + zigzag + "
    "LEB128 varint integer blocks — the encoding primitive under "
    "Parquet DELTA_BINARY_PACKED and the protobuf wire format; sorted "
    "timestamp columns collapse to ~4 bytes/value (measured)",
    description="per user: the ts_us and value-cents columns (ordered "
    "by ts, event_id) each encoded to a real DVI block (zigzag signed "
    "deltas, LEB128 groups, CRC-32 over the canonical decoded "
    "rendering) in one applyInPandas stage, decoded by the strict "
    "decoder in the next; the gate reports per-user count/span/sum "
    "plus the md5-derived hash of the DECODED sequences — a one-bit "
    "wire error breaks the CRC or a hash.  Per-user blocks are "
    "embarrassingly parallel; nothing shuffles twice",
)
def events_delta_varint_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach._shiplib import ensure_shipped

    ensure_shipped(spark)
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        "event_id",
    )

    def encode(pdf):
        import pandas as pd

        from sparkroach.functions.varint import dvi_encode

        pdf = pdf.sort_values(["ts_us", "event_id"])
        uid = int(pdf["user_id"].iloc[0])
        return pd.DataFrame(
            {
                "user_id": [uid],
                "ts_blob": [dvi_encode([int(v) for v in pdf["ts_us"]])],
                "v_blob": [dvi_encode([int(v) for v in pdf["cents"]])],
            }
        )

    def decode(batches):
        import hashlib

        import pandas as pd

        from sparkroach.functions.varint import dvi_decode

        def h32(vals):
            s = ",".join(str(v) for v in vals).encode()
            return int(hashlib.md5(s).hexdigest()[:8], 16)

        for pdf in batches:
            rows = []
            for uid, tb, vb in zip(
                pdf["user_id"], pdf["ts_blob"], pdf["v_blob"]
            ):
                ts = dvi_decode(bytes(tb))
                vs = dvi_decode(bytes(vb))
                if len(ts) != len(vs):
                    raise ValueError("dvi lane: column lengths disagree")
                rows.append(
                    {
                        "user_id": int(uid),
                        "n_events": len(ts),
                        "ts_span_us": max(ts) - min(ts) if ts else 0,
                        "value_cents_sum": sum(vs),
                        "ts_h32": h32(ts),
                        "value_h32": h32(vs),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "user_id", "n_events", "ts_span_us",
                    "value_cents_sum", "ts_h32", "value_h32",
                ],
            )

    enc = ev.groupBy("user_id").applyInPandas(
        encode, "user_id long, ts_blob binary, v_blob binary"
    )
    return enc.mapInPandas(
        decode,
        "user_id long, n_events long, ts_span_us long, "
        "value_cents_sum long, ts_h32 long, value_h32 long",
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# rouge_overlap_pairs — ROUGE-1/2 multiset overlap on LSH candidates
# ---------------------------------------------------------------------------


def _rouge_oracle() -> str:
    from sparkroach.queries.llm_ops import _lsh_candidates_cte

    lsh = _lsh_candidates_cte().strip()
    assert lsh.startswith("WITH ")
    return f"""
        WITH {lsh[len("WITH "):]},
        t1 AS (
            SELECT doc_id, t AS tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT doc_id, unnest(ws) AS t FROM w)
            GROUP BY doc_id, t
        ),
        t2 AS (
            SELECT doc_id, b AS tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1]
                               for i in range(1, len(ws))]) AS b
                FROM w
            )
            GROUP BY doc_id, b
        ),
        l1 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM t1 GROUP BY doc_id),
        l2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM t2 GROUP BY doc_id),
        o1 AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS ov
            FROM cand c
            JOIN t1 a ON a.doc_id = c.doc_a
            JOIN t1 b ON b.doc_id = c.doc_b AND b.tok = a.tok
            GROUP BY c.doc_a, c.doc_b
        ),
        o2 AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS ov
            FROM cand c
            JOIN t2 a ON a.doc_id = c.doc_a
            JOIN t2 b ON b.doc_id = c.doc_b AND b.tok = a.tok
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT c.doc_a, c.doc_b,
               COALESCE(o1.ov, 0) AS ov1,
               la1.n AS na1, lb1.n AS nb1,
               CAST(COALESCE(o1.ov, 0) AS DOUBLE) / CAST(la1.n AS DOUBLE)
                   AS rouge1_r,
               CAST(COALESCE(o1.ov, 0) AS DOUBLE) / CAST(lb1.n AS DOUBLE)
                   AS rouge1_p,
               CAST(2 * COALESCE(o1.ov, 0) AS DOUBLE)
                   / CAST(la1.n + lb1.n AS DOUBLE) AS rouge1_f,
               COALESCE(o2.ov, 0) AS ov2,
               CAST(2 * COALESCE(o2.ov, 0) AS DOUBLE)
                   / CAST(la2.n + lb2.n AS DOUBLE) AS rouge2_f
        FROM cand c
        JOIN l1 la1 ON la1.doc_id = c.doc_a
        JOIN l1 lb1 ON lb1.doc_id = c.doc_b
        JOIN l2 la2 ON la2.doc_id = c.doc_a
        JOIN l2 lb2 ON lb2.doc_id = c.doc_b
        LEFT JOIN o1 ON o1.doc_a = c.doc_a AND o1.doc_b = c.doc_b
        LEFT JOIN o2 ON o2.doc_a = c.doc_a AND o2.doc_b = c.doc_b
        ORDER BY c.doc_a, c.doc_b
    """


@register(
    "rouge_overlap_pairs",
    # R9-window candidate: registered gated=False, DELEGATED to
    # token_cosine_pairs (per-pair token-multiset similarity scored on
    # the capped LSH candidate set — the recorded r7 verify plan
    # family); the multiset-clip semantics (min of counts, repeated
    # tokens not over-credited) are unit-pinned in
    # tests/test_llm_ops20.py.
    gated=False,
    oracle=_rouge_oracle(),
    survey_ref="LLM ops: evaluation metrics — ROUGE-1/ROUGE-2 "
    "(clipped n-gram multiset overlap: recall, precision, F1) scored "
    "on candidate pairs: the summarization/dedup-adjacent metric "
    "suite next to Levenshtein, token cosine and containment in the "
    "verification-signal matrix",
    description="per LSH candidate pair: unigram and bigram CLIPPED "
    "overlap Σ min(count_a, count_b) — exact integers via a term-keyed "
    "equi-join of per-doc count tables (candidate-bounded, never "
    "all-pairs); R/P/F1 each ONE IEEE division of exact integers "
    "(F1 = 2·ov/(n_a+n_b) — the count identity avoids nested "
    "divisions).  Pairs with empty overlap survive via left joins "
    "with zero fill",
)
def rouge_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach.queries.llm_ops import _lsh_candidate_pairs

    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("ws")).localCheckpoint(
        eager=True
    )
    t1 = (
        w.select("doc_id", F.explode("ws").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    bigrams = F.expr(
        "transform(slice(ws, 1, size(ws) - 1), (x, i) -> "
        "concat(x, ' ', ws[i + 1]))"
    )
    t2 = (
        w.select("doc_id", F.explode(bigrams).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    l1 = t1.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    l2 = t2.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    cand = _lsh_candidate_pairs(d)

    def overlap(t, name):
        a = t.withColumnsRenamed({"doc_id": "doc_a", "c": "ca"})
        b = t.withColumnsRenamed({"doc_id": "doc_b", "c": "cb"})
        return (
            cand.join(a, "doc_a")
            .join(b, ["doc_b", "tok"])
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.least("ca", "cb")).cast("long").alias(name))
        )

    base = (
        cand.join(l1.withColumnsRenamed({"doc_id": "doc_a", "n": "na1"}), "doc_a")
        .join(l1.withColumnsRenamed({"doc_id": "doc_b", "n": "nb1"}), "doc_b")
        .join(l2.withColumnsRenamed({"doc_id": "doc_a", "n": "na2"}), "doc_a")
        .join(l2.withColumnsRenamed({"doc_id": "doc_b", "n": "nb2"}), "doc_b")
        .join(overlap(t1, "ov1"), ["doc_a", "doc_b"], "left")
        .join(overlap(t2, "ov2"), ["doc_a", "doc_b"], "left")
        .withColumn("ov1", F.coalesce("ov1", F.lit(0)))
        .withColumn("ov2", F.coalesce("ov2", F.lit(0)))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return base.select(
        "doc_a",
        "doc_b",
        "ov1",
        "na1",
        "nb1",
        (dbl("ov1") / dbl("na1")).alias("rouge1_r"),
        (dbl("ov1") / dbl("nb1")).alias("rouge1_p"),
        ((F.lit(2) * F.col("ov1")).cast("double") / (F.col("na1") + F.col("nb1")).cast("double")).alias(
            "rouge1_f"
        ),
        "ov2",
        ((F.lit(2) * F.col("ov2")).cast("double") / (F.col("na2") + F.col("nb2")).cast("double")).alias(
            "rouge2_f"
        ),
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# rake_keywords — RAKE phrase extraction with degree/frequency scores
# ---------------------------------------------------------------------------

RAKE_STOPS = ("a", "the")  # the corpus' function words
RAKE_TOP = 20
_RAKE_SCALE = 1_000_000


def _rake_oracle() -> str:
    stops = ", ".join(f"'{s}'" for s in RAKE_STOPS)
    return f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        tok AS (
            SELECT doc_id, p.p AS pos, ws[CAST(p.p AS INT)] AS tok
            FROM w JOIN range(1, 400) p(p) ON p.p <= len(ws)
        ),
        grp AS (
            SELECT *,
                   SUM(CASE WHEN tok IN ({stops}) THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS g
            FROM tok
        ),
        member AS (SELECT * FROM grp WHERE tok NOT IN ({stops})),
        plen AS (
            SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS plen,
                   string_agg(tok, ' ' ORDER BY pos) AS phrase
            FROM member GROUP BY doc_id, g
        ),
        ws_ AS (
            SELECT m.tok,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(pl.plen) AS BIGINT) AS deg
            FROM member m
            JOIN plen pl ON pl.doc_id = m.doc_id AND pl.g = m.g
            GROUP BY m.tok
        ),
        sc AS (
            SELECT tok, deg * {_RAKE_SCALE} // freq AS score_q FROM ws_
        ),
        ph AS (
            SELECT pl.doc_id, pl.g, pl.phrase, pl.plen,
                   CAST(SUM(sc.score_q) AS BIGINT) AS score_q
            FROM member m
            JOIN plen pl ON pl.doc_id = m.doc_id AND pl.g = m.g
            JOIN sc ON sc.tok = m.tok
            GROUP BY pl.doc_id, pl.g, pl.phrase, pl.plen
        )
        SELECT phrase,
               CAST(MAX(plen) AS BIGINT) AS n_words,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               MAX(score_q) AS score_q
        FROM ph
        GROUP BY phrase
        ORDER BY score_q DESC, n_occurrences DESC, phrase
        LIMIT {RAKE_TOP}
    """


@register(
    "rake_keywords",
    # R9-window candidate: registered gated=False, DELEGATED to
    # tfidf_top_terms (corpus-wide term scoring → bounded top-N
    # shortlist, the recorded plan family); the RAKE degree/frequency
    # semantics (stopword segmentation, within-phrase co-occurrence
    # degree, deg/freq word scores summed per phrase) are unit-pinned
    # in tests/test_llm_ops20.py.
    gated=False,
    oracle=_rake_oracle(),
    survey_ref="LLM ops: keyword/phrase extraction — RAKE (Rapid "
    "Automatic Keyword Extraction): stopword-delimited candidate "
    "phrases scored by Σ degree(w)/freq(w) over member words — the "
    "classic unsupervised keyphrase baseline, next to tf-idf and "
    "salience in the term-scoring matrix",
    description="candidate phrases = maximal stopword-free token runs "
    "(running stopword count as the phrase id — a per-doc prefix-sum "
    "window); word degree = Σ phrase length over occurrences, word "
    f"score = deg·{_RAKE_SCALE} // freq (integer truncation, positive "
    "operands — identical in both engines); phrase score = Σ member "
    "word scores (exact integers, so the sum is order-free); top-"
    f"{RAKE_TOP} via orderBy+limit (TakeOrdered — no global window). "
    "Word stats are vocabulary-sized aggregates; everything else is "
    "map-side explode + per-doc windows",
)
def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.posexplode(F.split("text", " ")))
        .withColumnsRenamed({"pos": "pos0", "col": "tok"})
        .select(
            "doc_id", (F.col("pos0") + 1).alias("pos"), "tok"
        )
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    grp = tok.withColumn(
        "g",
        F.sum(F.when(F.col("tok").isin(*RAKE_STOPS), 1).otherwise(0)).over(
            w_doc
        ),
    )
    member = grp.where(~F.col("tok").isin(*RAKE_STOPS)).localCheckpoint(
        eager=True
    )  # reused: phrase assembly, word stats, phrase scoring
    plen = member.groupBy("doc_id", "g").agg(
        F.count("*").cast("long").alias("plen"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x.tok,
            ),
        ).alias("phrase"),
    )
    wstats = (
        member.join(plen.select("doc_id", "g", "plen"), ["doc_id", "g"])
        .groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .withColumn(
            "score_q", F.expr(f"deg * {_RAKE_SCALE} DIV freq").cast("long")
        )
    )
    ph = (
        member.join(plen, ["doc_id", "g"])
        .join(wstats.select("tok", "score_q"), "tok")
        .groupBy("doc_id", "g", "phrase", "plen")
        .agg(F.sum("score_q").cast("long").alias("score_q"))
    )
    return (
        ph.groupBy("phrase")
        .agg(
            F.max("plen").cast("long").alias("n_words"),
            F.count("*").cast("long").alias("n_occurrences"),
            F.max("score_q").alias("score_q"),
        )
        .orderBy(
            F.col("score_q").desc(), F.col("n_occurrences").desc(), "phrase"
        )
        .limit(RAKE_TOP)
    )


# ---------------------------------------------------------------------------
# lm_kneser_ney_bigram — interpolated Kneser-Ney in exact quarters
# ---------------------------------------------------------------------------

KN_VOCAB = 24  # top-V tokens; everything else maps to <unk>
_KN_SCALE = 1_000_000_000


def _kn_oracle() -> str:
    return f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        tok AS (
            SELECT doc_id, p.p AS pos, ws[CAST(p.p AS INT)] AS t
            FROM w JOIN range(1, 400) p(p) ON p.p <= len(ws)
        ),
        vocab AS (
            SELECT t FROM (
                SELECT t, COUNT(*) AS c FROM tok GROUP BY t
                ORDER BY c DESC, t LIMIT {KN_VOCAB}
            )
        ),
        m AS (
            SELECT tok.doc_id, tok.pos,
                   CASE WHEN v.t IS NULL THEN '<unk>' ELSE tok.t END AS t
            FROM tok LEFT JOIN vocab v ON v.t = tok.t
        ),
        big AS (
            SELECT a.t AS v, b.t AS w2, CAST(COUNT(*) AS BIGINT) AS c
            FROM m a JOIN m b
              ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            GROUP BY a.t, b.t
        ),
        cv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM big GROUP BY v),
        n1v AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS n1v FROM big GROUP BY v
        ),
        n1w AS (
            SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1w FROM big GROUP BY w2
        ),
        n11 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n11 FROM big),
        st AS (SELECT DISTINCT v AS t FROM big),
        stw AS (SELECT DISTINCT w2 AS t FROM big),
        grid AS (SELECT a.t AS v, b.t AS w2 FROM st a JOIN stw b ON TRUE)
        SELECT g.v, g.w2 AS w,
               COALESCE(b.c, 0) AS c_vw,
               cv.cv AS c_v,
               CAST(((CASE WHEN b.c IS NOT NULL
                           THEN (4 * b.c - 3) * (SELECT n11 FROM n11)
                           ELSE 0 END
                      + 3 * n1v.n1v * n1w.n1w) * {_KN_SCALE})
                    // (4 * cv.cv * (SELECT n11 FROM n11))
                    AS BIGINT) AS prob_q9
        FROM grid g
        JOIN cv ON cv.v = g.v
        JOIN n1v ON n1v.v = g.v
        JOIN n1w ON n1w.w2 = g.w2
        LEFT JOIN big b ON b.v = g.v AND b.w2 = g.w2
        ORDER BY g.v, w
    """


@register(
    "lm_kneser_ney_bigram",
    # R9-window candidate: registered gated=False, DELEGATED to
    # lm_bigram_coverage_score (the recorded count-based bigram LM
    # plane, r7 gate); the interpolated-KN algebra (absolute discount
    # 3/4 in exact quarters, continuation counts, per-context mass
    # summing to exactly one) is pinned against a pure-python KN in
    # tests/test_llm_ops20.py.
    gated=False,
    oracle=_kn_oracle(),
    survey_ref="LLM ops: language modeling — interpolated Kneser-Ney "
    "bigram smoothing (absolute discount + continuation-count "
    "back-off, THE classical n-gram smoother): the full conditional "
    "probability grid over the top-V+<unk> vocabulary, next to the "
    "raw-count bigram coverage filter",
    description=f"top-{KN_VOCAB} vocabulary (count desc, token "
    "tiebreak; the tail maps to <unk> BEFORE bigram extraction — "
    "standard LM practice, and what keeps the grid literal-bounded "
    "at corpus scale), then interpolated KN with d = 3/4 carried in "
    "EXACT QUARTERS: p(w|v)·4·c(v)·N11 = (4c(v,w)−3)·N11 + "
    "3·N1+(v·)·N1+(·w) — pure integers, quantized by one positive "
    "truncating division at 1e-9.  Per-context mass sums to exactly "
    "one in the rationals (unit-pinned).  Counts are map-side "
    "aggregates; the V² grid is vocabulary-bounded, never corpus-"
    "bounded",
)
def lm_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.posexplode(F.split("text", " ")))
        .select("doc_id", F.col("pos"), F.col("col").alias("t"))
    )
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "t")
        .limit(KN_VOCAB)
        .select("t")
    )
    m = (
        tok.join(F.broadcast(vocab.withColumnRenamed("t", "vt")),
                 tok.t == F.col("vt"), "left")
        .select(
            "doc_id",
            "pos",
            F.when(F.col("vt").isNull(), "<unk>").otherwise(F.col("t")).alias(
                "t"
            ),
        )
    )
    a = m.select("doc_id", "pos", F.col("t").alias("v"))
    b = m.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("t").alias("w")
    )
    big = (
        a.join(b, ["doc_id", "pos"])
        .groupBy("v", "w")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)  # reused: cv/n1v/n1w/n11/grid/join
    )
    cv = big.groupBy("v").agg(F.sum("c").cast("long").alias("cv"))
    n1v = big.groupBy("v").agg(F.count("*").cast("long").alias("n1v"))
    n1w = big.groupBy("w").agg(F.count("*").cast("long").alias("n1w"))
    n11 = int(big.count())
    # V² grid: both sides vocabulary-bounded (≤ KN_VOCAB+1 rows each) —
    # broadcast keeps it a BNLJ, never a CartesianProduct
    grid = F.broadcast(big.select("v").distinct()).crossJoin(
        big.select("w").distinct()
    )
    seen = 4 * F.col("c") - 3
    num = (
        F.when(F.col("c").isNotNull(), seen * F.lit(n11)).otherwise(0)
        + 3 * F.col("n1v") * F.col("n1w")
    )
    return (
        grid.join(cv, "v")
        .join(n1v, "v")
        .join(n1w, "w")
        .join(big, ["v", "w"], "left")
        .select(
            "v",
            "w",
            F.coalesce("c", F.lit(0)).cast("long").alias("c_vw"),
            F.col("cv").cast("long").alias("c_v"),
            (num * _KN_SCALE).cast("decimal(38,0)").alias("_num"),
        )
        .select(
            "v",
            "w",
            "c_vw",
            "c_v",
            F.expr(
                f"CAST(_num DIV (4 * c_v * {n11}) AS LONG)"
            ).alias("prob_q9"),
        )
        .orderBy("v", "w")
    )


# ---------------------------------------------------------------------------
# customer_soundex_blocking — American Soundex phonetic blocking
# ---------------------------------------------------------------------------

# literal surname pool with deliberate phonetic-variant clusters (plus
# the classic NARA conformance vectors, unit-pinned); customers draw
# names by custkey arithmetic so both engines see the identical corpus
_SURNAMES = [
    "robert", "rupert", "ashcraft", "ashcroft", "tymczak", "pfister",
    "honeyman", "jackson", "jaxon", "jacksen", "smith", "smyth",
    "smithe", "schmidt", "schmitt", "johnson", "jonson", "johnsen",
    "johnston", "miller", "muller", "moeller", "wright", "write",
    "reid", "reed", "read", "reade", "lloyd", "loyd", "loyde",
    "baker", "becker", "bakker", "carter", "karter", "gutierrez",
    "washington", "lee", "leigh", "klein", "kline", "cline",
    "oconnor", "okonnor", "meyer", "maier", "mayr",
]

# letter → digit map (NARA American Soundex); vowels + h/w unmapped
_SDX_FROM = "bfpvcgjkqsxzdtlmnr"
_SDX_TO = "111122222222334556"


def _soundex_oracle() -> str:
    names = ", ".join(f"'{n}'" for n in _SURNAMES)
    code = (
        "CASE WHEN instr('bfpv', c) > 0 THEN '1' "
        "WHEN instr('cgjkqsxz', c) > 0 THEN '2' "
        "WHEN instr('dt', c) > 0 THEN '3' "
        "WHEN c = 'l' THEN '4' "
        "WHEN instr('mn', c) > 0 THEN '5' "
        "WHEN c = 'r' THEN '6' ELSE c END"
    )
    return f"""
        WITH nm AS (
            SELECT c_custkey,
                   list_extract([{names}],
                       CAST(c_custkey % {len(_SURNAMES)} AS INT) + 1) AS name
            FROM customer
        ),
        ch AS (
            SELECT c_custkey, name, p.p AS pos,
                   substring(name, CAST(p.p AS INT), 1) AS c
            FROM nm JOIN range(1, 16) p(p) ON p.p <= strlen(name)
        ),
        cd AS (SELECT *, {code} AS code FROM ch),
        -- h/w vanish entirely (same-code letters across them collapse);
        -- the first letter is always retained
        kept AS (SELECT * FROM cd WHERE pos = 1 OR (c <> 'h' AND c <> 'w')),
        runs AS (
            SELECT * FROM (
                SELECT *, lag(code) OVER (
                    PARTITION BY c_custkey ORDER BY pos
                ) AS prev FROM kept
            ) WHERE prev IS NULL OR code <> prev
        ),
        dig AS (
            SELECT c_custkey, code,
                   row_number() OVER (
                       PARTITION BY c_custkey ORDER BY pos
                   ) AS dn
            FROM runs WHERE pos > 1 AND instr('123456', code) > 0
        ),
        sx AS (
            SELECT n.c_custkey, n.name,
                   upper(substring(n.name, 1, 1)) ||
                   rpad(coalesce(string_agg(d.code, '' ORDER BY d.dn)
                                     FILTER (WHERE d.dn <= 3), ''),
                        3, '0') AS soundex
            FROM nm n LEFT JOIN dig d ON d.c_custkey = n.c_custkey
            GROUP BY n.c_custkey, n.name
        )
        SELECT soundex,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(COUNT(DISTINCT name) AS BIGINT) AS n_names,
               CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS n_pairs,
               string_agg(DISTINCT name, ',' ORDER BY name) AS names_csv
        FROM sx GROUP BY soundex ORDER BY soundex
    """


@register(
    "customer_soundex_blocking",
    # R9-window candidate: registered gated=False, DELEGATED to
    # customer_record_linkage (blocking-key pair generation over
    # synthesized noisy customer identities — the recorded linkage plan
    # family, promoted to the R8 window); the NARA conformance vectors
    # (Robert/Rupert→R163, Ashcraft/Ashcroft→A261, Tymczak→T522,
    # Pfister→P236, Honeyman→H555) are unit-pinned in
    # tests/test_llm_ops20.py.
    gated=False,
    oracle=_soundex_oracle(),
    survey_ref="record linkage: PHONETIC blocking — American Soundex "
    "(NARA rules: first letter retained, 6-class consonant codes, "
    "adjacent duplicates collapse THROUGH h/w but not across vowels, "
    "3-digit zero-padded) as the blocking key, next to the sorted-"
    "neighborhood and exact-key blocking strategies",
    description="full Soundex implemented relationally in BOTH engines "
    "(no phonetic builtin used): per-character explode → translate-map "
    "→ h/w removal with first-letter retention → lag-collapse of equal "
    "adjacent codes → first-3-digit assembly; then the block census "
    "(customers, distinct spellings, candidate pairs n·(n−1)/2, the "
    "spelling list) per code.  Per-key windows over ≤15 character "
    "rows — map-side shapes only; the census is one groupBy.  "
    "Phonetic variants (smith/smyth/smithe) land in one block, which "
    "is the blocking-recall property linkage pipelines buy here",
)
def customer_soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    names = ", ".join(f"'{n}'" for n in _SURNAMES)
    nm = c.select(
        "c_custkey",
        F.expr(
            f"element_at(array({names}), "
            f"CAST(c_custkey % {len(_SURNAMES)} AS INT) + 1)"
        ).alias("name"),
    )
    ch = nm.select(
        "c_custkey",
        "name",
        F.posexplode(F.split("name", "")),
    ).where(F.length("col") == 1).select(
        "c_custkey",
        "name",
        (F.col("pos") + 1).alias("pos"),
        F.col("col").alias("c"),
    )
    cd = ch.withColumn("code", F.translate("c", _SDX_FROM, _SDX_TO))
    kept = cd.where(
        (F.col("pos") == 1) | (~F.col("c").isin("h", "w"))
    )
    w_pos = Window.partitionBy("c_custkey").orderBy("pos")
    runs = (
        kept.withColumn("prev", F.lag("code").over(w_pos))
        .where(F.col("prev").isNull() | (F.col("code") != F.col("prev")))
    )
    dig = (
        runs.where((F.col("pos") > 1) & F.col("code").rlike("^[1-6]$"))
        .withColumn("dn", F.row_number().over(w_pos))
        .where(F.col("dn") <= 3)
    )
    digits = dig.groupBy("c_custkey").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("dn", "code"))),
                lambda x: x.code,
            ),
        ).alias("digits")
    )
    sx = (
        nm.join(digits, "c_custkey", "left")
        .select(
            "name",
            F.concat(
                F.upper(F.substring("name", 1, 1)),
                F.rpad(F.coalesce("digits", F.lit("")), 3, "0"),
            ).alias("soundex"),
        )
    )
    n = F.count("*").cast("long")
    return (
        sx.groupBy("soundex")
        .agg(
            n.alias("n_customers"),
            F.countDistinct("name").cast("long").alias("n_names"),
            (n * (n - F.lit(1)) / F.lit(2)).cast("long").alias("n_pairs"),
            F.array_join(F.array_sort(F.collect_set("name")), ",").alias(
                "names_csv"
            ),
        )
        .orderBy("soundex")
    )
