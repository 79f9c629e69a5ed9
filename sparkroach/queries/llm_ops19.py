"""Round-8 wave 2: G.711 µ-law audio lane and b-bit minwise hashing.

Registered ``gated=False`` with DELEGATED twins (rotation.DELEGATED) —
the R8 window is full at 50; these are R9-window candidates, swept by
the local oracle at three SFs like every registry entry.

Reference parity: none — multimodal/dedup breadth per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# multimodal_g711_roundtrip — real µ-law companding through the lane
# ---------------------------------------------------------------------------


def _g711_oracle() -> str:
    from sparkroach.functions.g711 import N_SAMPLES

    # closed integer form of decode(encode(s)) — see functions/g711.py:
    # sign/magnitude split, clip, +BIAS, segment exponent, 4-bit
    # mantissa, segment expansion.  All integers; the µ-law WIRE byte is
    # 255 - (sign·128 + e·16 + m).
    s = "(((doc_id * 97 + i.i * 1031) % 65536) - 32768)"
    mag = f"(LEAST(ABS({s}), 32635) + 132)"
    e = (
        f"(CASE WHEN {mag} < 256 THEN 0 WHEN {mag} < 512 THEN 1 "
        f"WHEN {mag} < 1024 THEN 2 WHEN {mag} < 2048 THEN 3 "
        f"WHEN {mag} < 4096 THEN 4 WHEN {mag} < 8192 THEN 5 "
        f"WHEN {mag} < 16384 THEN 6 ELSE 7 END)"
    )
    p = (
        f"(CASE {e} WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 "
        "WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32 WHEN 6 THEN 64 "
        "ELSE 128 END)"
    )
    m = f"(({mag} // ({p} * 8)) % 16)"
    dmag = f"(({m} * 8 + 132) * {p} - 132)"
    dec = f"(CASE WHEN {s} < 0 THEN -{dmag} ELSE {dmag} END)"
    ubyte = f"(255 - ((CASE WHEN {s} < 0 THEN 128 ELSE 0 END) + {e} * 16 + {m}))"
    return f"""
        SELECT d.doc_id AS media_id,
               CAST({N_SAMPLES} AS INT) AS n_samples,
               CAST(SUM({dec}) AS BIGINT) AS decoded_sum,
               CAST(SUM({ubyte}) AS BIGINT) AS byte_sum,
               CAST(MAX(ABS({dec} - {s})) AS BIGINT) AS max_abs_err
        FROM documents d JOIN range(0, {N_SAMPLES}) i(i) ON TRUE
        GROUP BY d.doc_id
        ORDER BY media_id
    """


@register(
    "multimodal_g711_roundtrip",
    # R9-window candidate: registered gated=False, DELEGATED to
    # multimodal_goertzel_tone (real audio codec through the Arrow
    # decode lane, mirrored by a doc_id-arithmetic integer oracle — the
    # identical lane shape); the sample-level codec conformance is
    # pinned in tests/test_llm_ops19.py.
    gated=False,
    oracle=_g711_oracle(),
    survey_ref="LLM ops: multimodal audio — G.711 µ-law companding "
    "codec (encoder + decoder from the ITU-T spec, pure integer "
    "segment/mantissa arithmetic), the telephony-PCM ingest lane next "
    "to the WAV/Goertzel plane",
    description="encode 64 deterministic PCM16 samples per document to "
    "real µ-law bytes and decode them back; the roundtrip quantizes "
    "each magnitude to its segment step, which is a CLOSED INTEGER "
    "FORM the oracle mirrors (segment CASE + mantissa division + "
    "expansion — no floats anywhere).  decoded_sum, the wire byte_sum, "
    "and the worst quantization error are all exact integers.  "
    "Map-only mapInPandas both ways",
)
def multimodal_g711_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach._shiplib import ensure_shipped
    from sparkroach.functions.g711 import g711_features, synthesize_g711_media

    ensure_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    return g711_features(synthesize_g711_media(docs)).orderBy("media_id")


# ---------------------------------------------------------------------------
# minhash_bbit_estimate — 1-bit minwise hashing (Li & König)
# ---------------------------------------------------------------------------

BBIT_K = 32  # permutations


def _bbit_oracle() -> str:
    from sparkroach.queries.llm_ops import _JACC_SQL, _lsh_candidates_cte

    lsh = _lsh_candidates_cte().strip()
    assert lsh.startswith("WITH ")
    hexd = "0123456789abcdef"
    th32 = " + ".join(
        f"(instr('{hexd}', substring(md5(CAST(k.k AS VARCHAR) || ':' || sh), "
        f"{j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"""
        WITH {lsh[len("WITH "):]},
        tok AS (SELECT doc_id, unnest(shingles) AS sh FROM shing),
        bits AS (
            SELECT doc_id, k.k, MIN({th32}) % 2 AS bit
            FROM tok, range(0, {BBIT_K}) k(k)
            GROUP BY doc_id, k.k
        ),
        agree AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(SUM(CASE WHEN ba.bit = bb.bit THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_agree
            FROM cand c
            JOIN bits ba ON ba.doc_id = c.doc_a
            JOIN bits bb ON bb.doc_id = c.doc_b AND bb.k = ba.k
            GROUP BY c.doc_a, c.doc_b
        ),
        jac AS (
            SELECT c.doc_a, c.doc_b, ROUND({_JACC_SQL}, 6) AS jaccard_q
            FROM cand c
            JOIN shing sa ON sa.doc_id = c.doc_a
            JOIN shing sb ON sb.doc_id = c.doc_b
        )
        SELECT a.doc_a, a.doc_b, j.jaccard_q, a.n_agree,
               CAST(2 * a.n_agree - {BBIT_K} AS DOUBLE) / {BBIT_K}
                   AS bbit_est
        FROM agree a JOIN jac j
          ON j.doc_a = a.doc_a AND j.doc_b = a.doc_b
        ORDER BY a.doc_a, a.doc_b
    """


@register(
    "minhash_bbit_estimate",
    # R9-window candidate: registered gated=False, DELEGATED to
    # minhash_jaccard_verified (capped LSH candidates scored by a
    # per-pair exact similarity — the recorded plan family; the 1-bit
    # signature compression + agreement estimator is the increment,
    # unit-pinned in tests/test_llm_ops19.py).
    gated=False,
    oracle=_bbit_oracle(),
    survey_ref="LLM ops: b-bit minwise hashing (Li & König) — keep only "
    "the lowest bit of each minhash: 32× smaller signatures whose "
    "bit-agreement rate still estimates Jaccard (est = 2·agree/K − 1); "
    "the storage/accuracy dial production dedup indexes actually ship",
    description=f"per (doc, k<{BBIT_K}) the md5 minhash's lowest bit; "
    "per capped-LSH candidate pair the bit-agreement count (exact "
    "integer) and the unbiased-for-large-vocab estimate as ONE IEEE "
    "division, reported against the exact shingle Jaccard (rounded 6). "
    "The signature build is explode → grouped MIN (map-side combined); "
    "pair scoring joins the k-indexed bit table — everything is "
    "candidate-bounded, never all-pairs",
)
def minhash_bbit_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach.queries.llm_ops import (
        _lsh_candidate_pairs,
        _verified_pairs,
        _with_shingles,
    )

    d = load(spark, sf_dir, "documents")
    sh = _with_shingles(d).localCheckpoint(eager=True)
    tok = sh.select("doc_id", F.explode("shingles").alias("sh"))
    h = (
        "CAST(conv(substring(md5(concat(CAST(k AS STRING), ':', sh)), 1, 8),"
        " 16, 10) AS BIGINT)"
    )
    bits = (
        tok.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(BBIT_K - 1))))
        .groupBy("doc_id", "k")
        .agg((F.min(F.expr(h)) % 2).alias("bit"))
    )
    cand = _lsh_candidate_pairs(d)
    ba = bits.withColumnsRenamed({"doc_id": "doc_a", "bit": "bit_a"})
    bb = bits.withColumnsRenamed({"doc_id": "doc_b", "bit": "bit_b"})
    agree = (
        cand.join(ba, "doc_a")
        .join(bb, ["doc_b", "k"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.when(F.col("bit_a") == F.col("bit_b"), 1).otherwise(0))
            .cast("long")
            .alias("n_agree")
        )
    )
    jac = _verified_pairs(d).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard_q")
    )
    return (
        agree.join(jac, ["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "jaccard_q",
            "n_agree",
            (
                (F.lit(2) * F.col("n_agree") - BBIT_K).cast("double")
                / F.lit(BBIT_K)
            ).alias("bbit_est"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# events_value_exact_median — distributed selection by bisection
# ---------------------------------------------------------------------------

_MEDIAN_ORACLE = """
    WITH c AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
    med AS (
        SELECT MIN(c) AS m FROM (
            SELECT c, row_number() OVER (ORDER BY c) AS rn FROM c
        ) WHERE rn >= (SELECT (n + 1) // 2 FROM n)
    )
    SELECT n.n, med.m AS median_cents,
           CAST((SELECT COUNT(*) FROM c WHERE c.c <= med.m) AS BIGINT)
               AS n_le_median
    FROM n, med
"""


@register(
    "events_value_exact_median",
    # R9-window candidate: registered gated=False, DELEGATED to
    # events_value_median_udaf (the exact-median result recorded through
    # the Python-UDAF lane, r6 gate); the increment — O(log range)
    # aggregate-pass bisection instead of any sort/collect — is
    # unit-pinned in tests/test_llm_ops19.py.
    gated=False,
    oracle=_MEDIAN_ORACLE,
    survey_ref="§2C analytic breadth — EXACT order statistic at scale: "
    "the lower median by counting bisection (O(log range) full "
    "aggregate passes over a cached integer column), the classic "
    "distributed-selection algorithm — no global sort, no collect of "
    "data rows, ever",
    description="median over exact integer cents: binary-search the "
    "value domain, each probe ONE count(c <= mid) aggregate (map-side "
    "combined) with a 1-row driver collect — the §9 bookkeeping shape; "
    "~log2(range) ≈ 25 passes over a localCheckpoint-cached long "
    "column.  The oracle derives the same lower median (smallest c "
    "whose rank reaches ceil(n/2)) by explicit rank.  At 100 TB this "
    "is THE way to get an exact percentile: a sort-based median "
    "shuffles the world; approx_percentile gives bounds, not truth",
)
def events_value_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach.queries.analytics import cents

    c = (
        load(spark, sf_dir, "events")
        .select(cents("value").alias("c"))
        .localCheckpoint(eager=True)  # ~25 probe aggregates re-read it
    )
    bounds = c.agg(
        F.count("*").cast("long").alias("n"),
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
    ).collect()[0]
    n, lo, hi = bounds["n"], bounds["lo"], bounds["hi"]
    if n == 0:
        raise ValueError("events_value_exact_median: empty input")
    target = (n + 1) // 2
    # invariant: the answer is in [lo, hi]; each probe is one aggregate
    while lo < hi:
        mid = (lo + hi) // 2  # python floor-div: exact for negatives too
        cnt = c.where(F.col("c") <= mid).count()
        if cnt >= target:
            hi = mid
        else:
            lo = mid + 1
    n_le = c.where(F.col("c") <= lo).count()
    return spark.createDataFrame(
        [(n, lo, n_le)], "n long, median_cents long, n_le_median long"
    )


# ---------------------------------------------------------------------------
# multimodal_gif_decode — GIF87a / variable-width LZW through the lane
# ---------------------------------------------------------------------------


def _gif_oracle() -> str:
    from sparkroach.functions.gif import GIF_COLORS, gif_palette

    pal_sum = " ".join(
        f"WHEN {i} THEN {sum(rgb)}" for i, rgb in enumerate(gif_palette())
    )
    idx = f"((p.doc_id * 31 + y.y * 16 + x.x * 5) % {GIF_COLORS})"
    return f"""
        WITH p AS (
            SELECT doc_id,
                   8 + (doc_id % 5) * 3 AS w,
                   6 + ((doc_id // 5) % 4) * 5 AS h
            FROM documents
        ),
        px AS (
            SELECT p.doc_id, p.w, p.h,
                   SUM({idx}) AS isum,
                   SUM(CASE {idx} {pal_sum} END) AS rsum
            FROM p
            JOIN range(0, 32) x(x) ON x.x < p.w
            JOIN range(0, 32) y(y) ON y.y < p.h
            GROUP BY ALL
        )
        SELECT doc_id AS media_id,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST({GIF_COLORS} AS INT) AS n_colors,
               CAST(isum AS BIGINT) AS index_sum,
               CAST(rsum AS BIGINT) AS rgb_sum
        FROM px ORDER BY media_id
    """


@register(
    "multimodal_gif_decode",
    # R9-window candidate: registered gated=False, DELEGATED to
    # multimodal_png_decode (lossless image codec through the identical
    # mapInPandas lane with a pixel-arithmetic oracle, in the R8
    # window); the LZW corner cases (KwKwK, width growth, mid-stream
    # CLEAR) are unit-pinned in tests/test_llm_ops19.py.
    gated=False,
    oracle=_gif_oracle(),
    survey_ref="LLM ops: multimodal decode — from-scratch GIF87a codec: "
    "variable-width LZW (3..12-bit codes, CLEAR/EOI, dictionary growth "
    "incl. the KwKwK case) — a THIRD compression family next to "
    "DEFLATE (PNG) and Huffman (JPEG) in the codec matrix",
    description="encode a real GIF87a per document (8-colour global "
    "palette, LZW with a periodic mid-stream CLEAR so every image "
    "exercises dictionary reset, ≤255-byte sub-block framing) and "
    "decode it with an independent bit-level decoder; lossless over "
    "palette indices, so the oracle mirrors the index arithmetic and "
    "the palette-sum lookup as pure doc_id arithmetic.  Map-only "
    "mapInPandas both ways",
)
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach._shiplib import ensure_shipped
    from sparkroach.functions.gif import gif_features, synthesize_gif_media

    ensure_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    return gif_features(synthesize_gif_media(docs)).orderBy("media_id")


# ---------------------------------------------------------------------------
# ann_nsw_beam_search — graph-based ANN (greedy beam over the kNN graph)
# ---------------------------------------------------------------------------

NSW_BEAM = 16  # beam width
NSW_ITERS = 8  # fixed refinement rounds after the multi-entry seed
NSW_TOPK = 5  # reported results per query
NSW_ENTRIES = 128  # stride-spread entry points (HNSW upper-layer analog)


def _nsw_oracle() -> str:
    from sparkroach.queries.llm_ops import _DOT_SQL, _NORM_SQL, N_QUERIES
    from sparkroach.queries.llm_ops4 import KNN_K, _knn_pairs_sql

    score = (
        f"ROUND({_DOT_SQL} / ({_NORM_SQL.format(col='qe')} * "
        f"{_NORM_SQL.format(col='ce')}), 6)"
    )
    parts = [
        f"""
        qs AS MATERIALIZED (
            SELECT vec_id AS q_id, embedding AS qe FROM embeddings
            WHERE vec_id < {N_QUERIES}),
        es AS MATERIALIZED (
            SELECT vec_id AS c_id, embedding AS ce FROM embeddings),
        nn AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
        gsym AS (
            SELECT a_id AS src, b_id AS dst, cosine FROM pairs
            UNION ALL
            SELECT b_id AS src, a_id AS dst, cosine FROM pairs
        ),
        knn AS (
            SELECT src, dst FROM (
                SELECT src, dst,
                       row_number() OVER (
                           PARTITION BY src ORDER BY cosine DESC, dst
                       ) AS rank
                FROM gsym
            ) WHERE rank <= {KNN_K}
        ),
        -- shortcut neighbors are EXPRESSIONS on the beam (±stride id
        -- arithmetic), never a materialized edge table: at 10^9 vectors
        -- an n·log n shortcut table would itself be corpus-scale
        strides AS MATERIALIZED (
            SELECT DISTINCT
                   (SELECT n FROM nn) // CAST(power(2, j.j) AS BIGINT) AS s
            FROM range(1, 40) j(j)
            WHERE (SELECT n FROM nn) // CAST(power(2, j.j) AS BIGINT) > 0
        ),
        beam0 AS MATERIALIZED (
            SELECT DISTINCT q_id,
                   (j.j * GREATEST((SELECT n FROM nn) // {NSW_ENTRIES}, 1))
                       % (SELECT n FROM nn) AS c_id
            FROM qs, range(0, {NSW_ENTRIES}) j(j)
        )
        """
    ]
    for t in range(1, NSW_ITERS + 1):
        parts.append(
            f"""
        cand{t} AS MATERIALIZED (
            SELECT DISTINCT q_id, c_id FROM (
                SELECT q_id, c_id FROM beam{t - 1}
                UNION ALL
                SELECT b.q_id, g.dst FROM beam{t - 1} b
                JOIN knn g ON g.src = b.c_id
                UNION ALL
                SELECT b.q_id,
                       (b.c_id + st.s) % (SELECT n FROM nn)
                FROM beam{t - 1} b, strides st
                UNION ALL
                SELECT b.q_id,
                       (b.c_id - st.s + (SELECT n FROM nn))
                           % (SELECT n FROM nn)
                FROM beam{t - 1} b, strides st
            )
        ),
        sc{t} AS (
            SELECT c.q_id, c.c_id, {score} AS cosine
            FROM cand{t} c
            JOIN qs ON qs.q_id = c.q_id
            JOIN es ON es.c_id = c.c_id
            WHERE c.c_id <> c.q_id
        ),
        beam{t} AS MATERIALIZED (
            SELECT q_id, c_id, cosine FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY q_id ORDER BY cosine DESC, c_id
                ) AS rn FROM sc{t}
            ) WHERE rn <= {NSW_BEAM}
        )
            """
        )
    body = ",".join(parts)
    return f"""
        WITH {_knn_pairs_sql().strip()},
        {body}
        SELECT q_id, c_id, cosine, rank FROM (
            SELECT q_id, c_id, cosine,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY cosine DESC, c_id
                   ) AS rank
            FROM beam{NSW_ITERS}
        ) WHERE rank <= {NSW_TOPK}
        ORDER BY q_id, rank
    """


@register(
    "ann_nsw_beam_search",
    # R9-window candidate: registered gated=False, DELEGATED to
    # knn_graph_ivf (the graph build IS the recorded kNN machinery; the
    # greedy beam is a bounded-iteration loop of probe-side joins — the
    # recorded pagerank/BFS iteration family); beam behavior is
    # unit-pinned in tests/test_llm_ops19.py.
    gated=False,
    oracle=_nsw_oracle(),
    survey_ref="LLM ops: GRAPH-BASED ANN (the NSW/HNSW family — the "
    "modern ANN default): greedy beam search over a NAVIGABLE small-"
    "world graph — the capped kNN adjacency plus deterministic skip-"
    "list stride shortcuts (±n/2^j links, the long-range edges that "
    "make greedy search converge in O(log n) hops, playing the role of "
    "HNSW's upper layers); completes the ANN matrix (brute force, "
    "IVF×3, LSH, int8, PQ, IVF-PQ, rerank, and now graph-based)",
    description=f"deterministic NSW: {NSW_ITERS} expansion rounds of "
    f"beam width {NSW_BEAM} from a fixed entry node — each round "
    "scores beam ∪ neighbors(beam) against the query (exact rounded "
    "cosine) and keeps the per-query top-B (cosine desc, id tiebreak). "
    "The probe side is queries × beam (literal-bounded, broadcast); "
    "the graph and embedding joins are id-keyed equi-joins against "
    "corpus-scale tables — per-round cost is O(queries · beam · "
    "degree) lookups, NEVER a corpus scan: the whole point of graph-"
    "based ANN at 10^9 vectors.  Measured recall@5 ≥ 0.9 vs the exact "
    "baseline at sf0.1 (test-pinned ≥ 0.5).  The oracle replays the "
    "identical walk as unrolled CTEs",
)
def ann_nsw_beam_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sparkroach.queries.llm_ops import _DOT, _NORM, N_QUERIES
    from sparkroach.queries.llm_ops4 import knn_graph_ivf

    e = load(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    es = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce"))
    knn = knn_graph_ivf(spark, sf_dir).select(
        F.col("vec_id").alias("src"), F.col("nbr_id").alias("dst")
    )  # already the per-node top-KNN_K adjacency; checkpointed upstream
    # small-world shortcuts: ±(n // 2^j) id strides — deterministic
    # long-range links over the DENSE vec_id domain (0..n-1, a property
    # of every corpus here; general ids would first get a dense rank).
    # Similarity is uncorrelated with id, so these are exactly NSW's
    # random long edges: the beam escapes local neighborhoods and
    # reaches any region in O(log n) hops.  Shortcut neighbors are
    # computed as EXPRESSIONS over the beam (explode a literal offset
    # array) — never a materialized edge table, which at 10^9 vectors
    # would itself be corpus-scale.
    n = e.count()
    strides = sorted({n >> j for j in range(1, 40)} - {0})
    offsets = F.array(
        *[F.lit(s) for s in strides], *[F.lit(n - s) for s in strides]
    )
    gr = knn.localCheckpoint(eager=True)  # reused every round
    cosine = F.round(
        F.expr(_DOT)
        / (F.expr(_NORM.format(col="qe")) * F.expr(_NORM.format(col="ce"))),
        6,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    step = max(n // NSW_ENTRIES, 1)
    entries = sorted({(j * step) % n for j in range(NSW_ENTRIES)})
    beam = qs.select("q_id").crossJoin(
        spark.createDataFrame([(v,) for v in entries], "c_id long")
    )
    for _t in range(NSW_ITERS):
        cand = (
            beam.select("q_id", "c_id")
            .unionByName(
                beam.join(gr, beam.c_id == gr.src).select(
                    "q_id", F.col("dst").alias("c_id")
                )
            )
            .unionByName(
                beam.select("q_id", "c_id", F.explode(offsets).alias("_off"))
                .select(
                    "q_id",
                    ((F.col("c_id") + F.col("_off")) % n).alias("c_id"),
                )
            )
            .distinct()
        )
        scored = (
            # probe side: queries × (beam ∪ neighbors) — literal-bounded
            F.broadcast(cand.join(qs, "q_id"))
            .join(es, "c_id")
            .where(F.col("c_id") != F.col("q_id"))
            .select("q_id", "c_id", cosine.alias("cosine"))
        )
        beam = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= NSW_BEAM)
            .drop("rn")
            .localCheckpoint(eager=True)  # truncate the iteration lineage
        )
    return (
        beam.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= NSW_TOPK)
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------------
# documents_zip_shard_ingest — ZIP archive lane (central directory + CRC)
# ---------------------------------------------------------------------------

N_ZIP_SHARDS = 8


def _zip_oracle() -> str:
    from sparkroach.queries.llm_ops10 import _th32_sql

    return f"""
        WITH w AS (
            SELECT doc_id, md5(text) AS tm, md5(lang) AS lm,
                   md5(source) AS sm, strlen(text) AS plen,
                   doc_id % {N_ZIP_SHARDS} AS fid
            FROM documents
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(2 * COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(COUNT(DISTINCT fid) AS BIGINT) AS n_shards,
               CAST(SUM(plen) AS BIGINT) AS sum_payload_bytes,
               CAST(SUM({_th32_sql('tm')}) AS BIGINT) AS text_hash_sum,
               CAST(SUM({_th32_sql('lm')}) AS BIGINT) AS lang_hash_sum,
               CAST(SUM({_th32_sql('sm')}) AS BIGINT) AS source_hash_sum
        FROM w
    """


@register(
    "documents_zip_shard_ingest",
    # R9-window candidate: registered gated=False, DELEGATED to
    # documents_tar_webdataset_ingest (the identical lane shape, in the
    # R7 window: applyInPandas shard build → binfiles two-phase sink →
    # binaryFile → strict mapInPandas parse → checksum aggregate); the
    # ZIP codec's strict-failure behavior is pinned in
    # tests/test_llm_ops19.py.
    gated=False,
    oracle=_zip_oracle(),
    survey_ref="source formats: ZIP shards — the archive matrix's "
    "second member next to WebDataset tar: central directory (random-"
    "access member listing, the object-store-shard property), "
    "per-member CRC-32 verified on read, per-member compression choice "
    "(deflated text, stored metadata)",
    description=f"ZIP round-trip gate: documents sharded into "
    f"{N_ZIP_SHARDS} real .zip files (applyInPandas builds each shard "
    "with deterministic member timestamps; the sparkroach_binfiles "
    "sink lands them two-phase), read back with binaryFile and parsed "
    "by a STRICT stdlib-zipfile codec (CRC mismatch, unknown "
    "extension, duplicate member, half-present sample, stem/metadata "
    "disagreement all raise).  Same checksum aggregate as the tar "
    "lane — a one-byte boundary or inflation error breaks a hash.  "
    "File-parallel parse, no shuffle before the final aggregate",
)
def documents_zip_shard_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from sparkroach._shiplib import ensure_shipped
    from sparkroach.queries.llm_ops10 import _th32
    from sparkroach.sources.binfiles import register_binfiles_sink

    ensure_shipped(spark)
    register_binfiles_sink(spark)
    d = load(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="sparkroach_zip_")

    def to_zip(pdf):
        import pandas as pd

        from sparkroach.functions.zipshard import build_zip_shard

        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["file_id"].iloc[0])
        blob = build_zip_shard(
            zip(pdf["doc_id"], pdf["lang"], pdf["source"], pdf["text"])
        )
        return pd.DataFrame(
            {"filename": [f"shard-{fid:05d}.zip"], "content": [blob]}
        )

    def parse(batches):
        import os as _os

        import pandas as pd

        from sparkroach.functions.zipshard import parse_zip_shard

        for pdf in batches:
            rows: dict = {
                "doc_id": [],
                "lang": [],
                "source": [],
                "text": [],
                "n_members": [],
                "shard": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                base = _os.path.basename(path)
                for s in parse_zip_shard(bytes(content)):
                    for k in rows:
                        rows[k].append(s[k] if k != "shard" else base)
            yield pd.DataFrame(rows)

    try:
        zdir = os.path.join(root, "zips")
        staged = (
            d.select("doc_id", "lang", "source", "text")
            .withColumn("file_id", F.pmod("doc_id", F.lit(N_ZIP_SHARDS)))
            .groupBy("file_id")
            .applyInPandas(to_zip, "filename string, content binary")
        )
        staged.write.format("sparkroach_binfiles").mode("append").save(zdir)
        raw = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.zip")
            .load(zdir)
        )
        parsed = raw.select("path", "content").mapInPandas(
            parse,
            "doc_id long, lang string, source string, text string, "
            "n_members int, shard string",
        )
        out = parsed.agg(
            F.count("*").cast("long").alias("n_samples"),
            F.sum("n_members").cast("long").alias("n_members"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.countDistinct("shard").cast("long").alias("n_shards"),
            F.sum(F.length("text")).cast("long").alias("sum_payload_bytes"),
            F.sum(_th32("text")).cast("long").alias("text_hash_sum"),
            F.sum(_th32("lang")).cast("long").alias("lang_hash_sum"),
            F.sum(_th32("source")).cast("long").alias("source_hash_sum"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# events_value_mad_outliers — robust outlier census (median + MAD)
# ---------------------------------------------------------------------------

# integer robust-z threshold: |x - med| > 3 * 1.4826 * MAD, carried as
# the exact integer comparison dev * 10000 > 44478 * mad (3·1.4826 =
# 4.4478 — a literal both engines compare the same way)
_MAD_NUM = 44478
_MAD_DEN = 10000

_MAD_ORACLE = f"""
    WITH c AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
    med AS (
        SELECT MIN(c) AS m FROM (
            SELECT c, row_number() OVER (ORDER BY c) AS rn FROM c
        ) WHERE rn >= (SELECT (n + 1) // 2 FROM n)
    ),
    dev AS (SELECT ABS(c.c - (SELECT m FROM med)) AS d FROM c),
    mad AS (
        SELECT MIN(d) AS mad FROM (
            SELECT d, row_number() OVER (ORDER BY d) AS rn FROM dev
        ) WHERE rn >= (SELECT (n + 1) // 2 FROM n)
    )
    SELECT n.n, med.m AS median_cents, mad.mad AS mad_cents,
           CAST((SELECT COUNT(*) FROM dev
                 WHERE d * {_MAD_DEN} > {_MAD_NUM} * (SELECT mad FROM mad))
                AS BIGINT) AS n_outliers,
           CAST((SELECT COUNT(*) FROM dev
                 WHERE d * {_MAD_DEN} > {_MAD_NUM} * (SELECT mad FROM mad))
                AS DOUBLE) / n.n AS outlier_frac
    FROM n, med, mad
"""


def _bisect_kth(c, target: int, lo: int, hi: int) -> int:
    """Smallest v in [lo, hi] with count(col <= v) >= target — one
    count aggregate per probe (the §9 bookkeeping shape), ~log2(range)
    probes over a cached integer column."""
    from pyspark.sql import functions as _F

    while lo < hi:
        mid = (lo + hi) // 2  # python floor-div: exact for negatives too
        if c.where(_F.col(c.columns[0]) <= mid).count() >= target:
            hi = mid
        else:
            lo = mid + 1
    return lo


@register(
    "events_value_mad_outliers",
    # R9-window candidate: registered gated=False, DELEGATED to
    # events_value_median_udaf (the exact-median semantics recorded
    # through the Python-UDAF lane, r6 gate); the increment — TWO
    # chained counting bisections (median, then median absolute
    # deviation) and the integer robust-z rule — is pinned in
    # tests/test_llm_ops19.py.
    gated=False,
    oracle=_MAD_ORACLE,
    survey_ref="§2C analytic breadth — ROBUST outlier census: median + "
    "MAD (the estimator that survives the outliers it hunts, unlike "
    "mean/stddev z-scores), both EXACT order statistics computed by "
    "counting bisection — no sort, no collect, at any scale",
    description="lower median of exact integer cents by counting "
    "bisection, then the MAD as a SECOND bisection over the absolute "
    "deviations (each probe one count aggregate over a cached long "
    f"column); outliers = dev·{_MAD_DEN} > {_MAD_NUM}·MAD — the "
    "3·1.4826 robust-z rule as an exact integer comparison, so both "
    "engines count the identical set.  outlier_frac is the one IEEE "
    "division at the end",
)
def events_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkroach.queries.analytics import cents

    c = (
        load(spark, sf_dir, "events")
        .select(cents("value").alias("c"))
        .localCheckpoint(eager=True)
    )
    b = c.agg(
        F.count("*").cast("long").alias("n"),
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
    ).collect()[0]
    n = b["n"]
    if n == 0:
        raise ValueError("events_value_mad_outliers: empty input")
    target = (n + 1) // 2
    med = _bisect_kth(c, target, b["lo"], b["hi"])
    dev = c.select(F.abs(F.col("c") - med).alias("d")).localCheckpoint(
        eager=True
    )
    dhi = dev.agg(F.max("d").alias("m")).collect()[0]["m"]
    mad = _bisect_kth(dev, target, 0, dhi)
    n_out = dev.where(F.col("d") * _MAD_DEN > _MAD_NUM * mad).count()
    return spark.createDataFrame(
        [(n, med, mad, n_out, float(n_out) / float(n))],
        "n long, median_cents long, mad_cents long, n_outliers long, "
        "outlier_frac double",
    )
