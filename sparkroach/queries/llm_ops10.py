"""Round-7 late wave 3: five pipeline stages a 100 TB corpus still runs.

* ``documents_tar_webdataset_ingest`` — WebDataset tar shards (the
  de-facto multimodal training-shard format): samples as adjacent
  ``{key}.txt`` + ``{key}.json`` tar members, sharded, landed through
  the generic binary-file sink, re-ingested file-parallel via
  ``binaryFile`` + a strict stdlib-``tarfile`` parser, checksummed
  against the parquet oracle (functions/wds.py).

* ``url_canonical_dedup`` — crawl-frontier URL canonicalization + dedup:
  lowercase scheme/host, strip ``www.``/default ports/fragments/
  trailing slashes, drop ``utm_*`` params and SORT the rest — then
  cluster by canonical URL.  Raw URLs are synthesized deterministically
  from doc_id (the corpus has none) with every mess class present; the
  canonicalizer itself is generic JVM string/array ops (higher-order
  ``filter``/``array_sort``), mirrored expression-for-expression in the
  DuckDB oracle.

* ``lm_bigram_coverage_score`` — the count-based n-gram LM quality
  filter (the CCNet-style fluency pass, with counts in place of a KenLM
  binary): TRAIN bigram counts on even doc_ids, SCORE odd doc_ids —
  held-out docs really do contain unseen bigrams.  Integer sums
  (capped counts, the add-cap analogue of probability clipping), two
  single IEEE divisions for the reported fractions, and the keep/drop
  label decided by integer cross-multiplication.

* ``text_nfc_normalize_report`` — Unicode NFC normalization (the
  first text-cleanup pass of every multilingual pipeline): combining
  sequences injected deterministically per doc (composition, identity,
  and a two-mark canonical-ordering case), normalized INSIDE an
  arrow-optimized Python UDF with stdlib ``unicodedata``, and matched
  against DuckDB's native ``nfc_normalize`` — two independent
  implementations of the same Unicode standard must agree per byte.

* ``multimodal_image_ahash_pairs`` — image NEAR-dup detection: real
  JPEG decode (the r5 codec lane) → integer average-hash
  (functions/ahash.py) → 16-bit LSH bands → capped band-bucket join →
  exact Hamming verify.  The tile-constant corpus keeps the decoded
  raster provably exact, so the oracle rebuilds every hash bit from
  doc_id arithmetic (box/tile overlap areas) while Spark runs the real
  decode + hash chain.

Reference parity: none (no reference counterpart); all five are the
LLM-training-data surface the brief requires.  Scale notes inline per
gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

_HEX = "0123456789abcdef"


def _th32_sql(col: str) -> str:
    return " + ".join(
        f"(instr('{_HEX}', substring({col}, {k + 1}, 1)) - 1) * {16 ** (7 - k)}"
        for k in range(8)
    )


def _th32(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# documents_tar_webdataset_ingest
# ---------------------------------------------------------------------------

N_TAR_SHARDS = 8


@register(
    "documents_tar_webdataset_ingest",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, md5(text) AS tm, md5(lang) AS lm,
                   md5(source) AS sm, strlen(text) AS plen,
                   doc_id % {N_TAR_SHARDS} AS fid
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
    """,
    survey_ref="source formats: WebDataset tar shards — the de-facto "
    "multimodal training-shard layout (adjacent .txt/.json members per "
    "sample), stdlib-tarfile codec through the generic binary-file sink "
    "and file-parallel binaryFile re-ingest",
    description=f"WebDataset round-trip gate: documents sharded into "
    f"{N_TAR_SHARDS} real .tar files (applyInPandas builds each shard; "
    "the sparkroach_binfiles sink lands them two-phase), read back with "
    "binaryFile and parsed by a STRICT tar codec (unknown extension, "
    "duplicate member, half-present sample, or stem/metadata doc_id "
    "disagreement all raise).  Checksums over text payloads and the "
    "JSON-metadata lang/source fields must match the parquet oracle — "
    "a one-byte member-boundary error breaks a hash.  Parse is "
    "file-parallel with no shuffle before the final aggregate (one "
    "shard per task at 100 TB, the WebDataset contract)",
)
def documents_tar_webdataset_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from sparkroach._shiplib import ensure_shipped
    from sparkroach.sources.binfiles import register_binfiles_sink

    ensure_shipped(spark)
    register_binfiles_sink(spark)
    d = load(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="sparkroach_wds_")

    def to_tar(pdf):
        import pandas as pd

        from sparkroach.functions.wds import build_tar_shard

        pdf = pdf.sort_values("doc_id")
        fid = int(pdf["file_id"].iloc[0])
        blob = build_tar_shard(
            zip(pdf["doc_id"], pdf["lang"], pdf["source"], pdf["text"])
        )
        return pd.DataFrame(
            {"filename": [f"shard-{fid:05d}.tar"], "content": [blob]}
        )

    def parse(batches):
        import os as _os

        import pandas as pd

        from sparkroach.functions.wds import parse_tar_shard

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
                for s in parse_tar_shard(bytes(content)):
                    for k in rows:
                        rows[k].append(s[k] if k != "shard" else base)
            yield pd.DataFrame(rows)

    try:
        wds_dir = os.path.join(root, "wds")
        staged = (
            d.select("doc_id", "lang", "source", "text")
            .withColumn("file_id", F.pmod("doc_id", F.lit(N_TAR_SHARDS)))
            .groupBy("file_id")
            .applyInPandas(to_tar, "filename string, content binary")
        )
        staged.write.format("sparkroach_binfiles").mode("append").save(
            wds_dir
        )
        raw = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.tar")
            .load(wds_dir)
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
            # real distinct FILES seen by the parse (not doc_id % N,
            # which would be circular): the sink must have landed all
            # N_TAR_SHARDS files for the oracle's count to match
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
# url_canonical_dedup
# ---------------------------------------------------------------------------

# deterministic raw-URL synthesis (every mess class a canonicalizer must
# handle): case noise, www., default AND non-default ports, trailing
# slashes, unsorted query params, utm_* junk, fragments, missing query
_RAW_URL_SQL = (
    "CASE WHEN {id} % 2 = 0 THEN 'http' ELSE 'https' END || '://' || "
    "CASE WHEN {id} % 4 < 2 THEN 'WWW.Site' ELSE 'site' END || "
    "CAST({id} % 50 AS {st}) || '.Example.COM' || "
    "CASE WHEN {id} % 3 = 0 THEN "
    "  (CASE WHEN {id} % 2 = 0 THEN ':80' ELSE ':443' END) "
    "  WHEN {id} % 3 = 1 THEN ':8080' ELSE '' END || "
    "'/cat/' || CAST({id} % 40 AS {st}) || "
    "CASE WHEN {id} % 2 = 0 THEN '/' ELSE '' END || "
    "CASE WHEN {id} % 5 = 4 THEN '' ELSE "
    "  '?utm_source=feed&b=' || CAST({id} % 7 AS {st}) || "
    "  '&a=' || CAST({id} % 5 AS {st}) END || "
    "CASE WHEN {id} % 2 = 1 THEN '#sec' || CAST({id} % 3 AS {st}) "
    "  ELSE '' END"
)


def _canon_url_sql(raw: str, dialect: str) -> str:
    """Canonicalization pipeline, mirrored expression-for-expression.

    ``dialect``: 'spark' or 'duckdb' — the splits are identical
    (split_part returns '' out-of-range in both, the Postgres
    behavior); only the list-function spellings differ.
    """
    u = f"split_part({raw}, '#', 1)"
    base = f"split_part({u}, '?', 1)"
    # everything after the FIRST '?' (split_part would silently drop a
    # second '?' and the query tail with it — instr keeps the whole query)
    q = (
        f"CASE WHEN instr({u}, '?') = 0 THEN '' "
        f"ELSE substring({u}, instr({u}, '?') + 1) END"
    )
    scheme = f"lower(split_part({base}, '://', 1))"
    rest = f"split_part({base}, '://', 2)"
    hostport = f"split_part({rest}, '/', 1)"
    path = f"substring({rest}, length({hostport}) + 1)"
    # '[.]' not '\.': Spark SQL string literals process backslash escapes,
    # DuckDB standard strings don't — a bracket class is dialect-identical
    host = (
        f"regexp_replace(lower(split_part({hostport}, ':', 1)), "
        f"'^www[.]', '')"
    )
    port = f"split_part({hostport}, ':', 2)"
    cport = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') "
        f"THEN '' ELSE ':' || {port} END"
    )
    cpath = (
        f"CASE WHEN {path} IN ('', '/') THEN '/' "
        f"ELSE regexp_replace({path}, '/+$', '') END"
    )
    if dialect == "spark":
        keep = (
            f"array_sort(filter(split({q}, '&'), "
            f"p -> p != '' AND NOT startswith(p, 'utm_')))"
        )
        cq = (
            f"CASE WHEN size({keep}) = 0 THEN '' "
            f"ELSE '?' || array_join({keep}, '&') END"
        )
    else:
        keep = (
            f"list_sort(list_filter(string_split({q}, '&'), "
            f"p -> p <> '' AND NOT starts_with(p, 'utm_')))"
        )
        cq = (
            f"CASE WHEN len({keep}) = 0 THEN '' "
            f"ELSE '?' || array_to_string({keep}, '&') END"
        )
    return f"{scheme} || '://' || {host} || {cport} || {cpath} || {cq}"


@register(
    "url_canonical_dedup",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id,
                   {_RAW_URL_SQL.format(id="doc_id", st="VARCHAR")} AS url
            FROM documents
        ),
        canon AS (
            SELECT doc_id, {_canon_url_sql("url", "duckdb")} AS curl
            FROM raw
        ),
        clusters AS (
            SELECT curl, COUNT(*) AS csize,
                   {_th32_sql("md5(curl)")} AS ch
            FROM canon GROUP BY curl
        )
        SELECT CAST(csize AS BIGINT) AS cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(SUM(csize) AS BIGINT) AS n_docs,
               CAST(SUM(ch) AS BIGINT) AS canon_hash_sum
        FROM clusters
        GROUP BY csize
        ORDER BY cluster_size
    """,
    survey_ref="LLM ops: URL canonicalization + dedup — the crawl-"
    "frontier dedup pass (lowercase, www./default-port/fragment/"
    "trailing-slash strip, utm_* removal, query-param sort), generic "
    "JVM string/array expressions with higher-order filter/array_sort",
    description="raw URLs synthesized per doc with every mess class "
    "(case noise, www., :80/:443/:8080, trailing slash, unsorted "
    "params, utm_ junk, fragments, missing query), canonicalized by a "
    "shared expression pipeline (split_part / regexp anchors / "
    "filter+array_sort over params), then clustered by canonical URL; "
    "output is the cluster-size histogram with a canonical-string hash "
    "sum, so one wrong canonicalization step moves a hash.  Map-only "
    "until the two grouped aggs; at 100 TB this is the frontier dedup "
    "shuffle keyed on the canonical URL",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.expr(_RAW_URL_SQL.format(id="doc_id", st="STRING")).alias("url"),
    )
    canon = raw.select(
        "doc_id", F.expr(_canon_url_sql("url", "spark")).alias("curl")
    )
    clusters = canon.groupBy("curl").agg(
        F.count("*").alias("csize"), _th32(F.col("curl")).alias("ch")
    )
    return (
        clusters.groupBy("csize")
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            F.sum("csize").cast("long").alias("n_docs"),
            F.sum("ch").cast("long").alias("canon_hash_sum"),
        )
        .select(
            F.col("csize").cast("long").alias("cluster_size"),
            "n_clusters",
            "n_docs",
            "canon_hash_sum",
        )
        .orderBy("cluster_size")
    )


# ---------------------------------------------------------------------------
# lm_bigram_coverage_score
# ---------------------------------------------------------------------------

# capped-count ceiling (the clipping analogue) and the integer keep rule:
# keep iff mean capped count >= 24/100 of the cap
_LM_CAP = 64
_KEEP_NUM, _KEEP_DEN = 24, 100


@register(
    "lm_bigram_coverage_score",
    oracle=f"""
        WITH ws AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(w)),
                          i -> w[i] || ' ' || w[i + 1])) AS b
            FROM ws
        ),
        train AS (
            SELECT b, COUNT(*) AS cnt FROM bg
            WHERE doc_id % 2 = 0 GROUP BY b
        ),
        score AS (
            SELECT g.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(CASE WHEN t.cnt IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_seen,
                   CAST(SUM(LEAST(COALESCE(t.cnt, 0), {_LM_CAP}))
                        AS BIGINT) AS w_sum
            FROM bg g LEFT JOIN train t USING (b)
            WHERE g.doc_id % 2 = 1
            GROUP BY g.doc_id
        )
        SELECT doc_id, n_bigrams, n_seen, w_sum,
               CAST(n_seen AS DOUBLE) / n_bigrams AS covered_frac,
               CAST(w_sum AS DOUBLE) / ({_LM_CAP} * n_bigrams) AS score,
               CAST({_KEEP_DEN} * w_sum >=
                    {_KEEP_NUM} * {_LM_CAP} * n_bigrams AS BOOLEAN) AS keep
        FROM score
        ORDER BY doc_id
    """,
    survey_ref="LLM ops: count-based n-gram LM quality filter (the "
    "CCNet-style fluency pass) — TRAIN bigram counts on half the corpus, "
    "score HELD-OUT docs by coverage and capped-count mass, integer "
    "keep/drop decision",
    description=f"bigram LM filter with a real train/score split: even "
    "doc_ids are the training corpus (explode bigrams → count), odd "
    "doc_ids are scored against it (left join → per-doc coverage + "
    f"capped-count mass, cap {_LM_CAP}).  Held-out docs genuinely "
    "contain unseen bigrams so the OOV path is exercised; fractions are "
    "single IEEE divisions on integer operands and the keep label is "
    f"integer cross-multiplied (mean >= {_KEEP_NUM}/{_KEEP_DEN}).  At "
    "100 TB: one shuffle to train counts, one broadcast-or-shuffle join "
    "to score — the exact plan a production count-LM filter runs",
)
def lm_bigram_coverage_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    bigrams = F.when(
        F.size(ws) >= 2,
        F.expr(
            "transform(sequence(0, size(split(text, ' ')) - 2), "
            "i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i + 1]))"
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    bg = d.select("doc_id", F.explode(bigrams).alias("b"))
    train = (
        bg.where(F.col("doc_id") % 2 == 0)
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
    )
    scored = (
        bg.where(F.col("doc_id") % 2 == 1)
        .join(train, "b", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("cnt").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_seen"),
            F.sum(F.least(F.coalesce(F.col("cnt"), F.lit(0)), F.lit(_LM_CAP)))
            .cast("long")
            .alias("w_sum"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "n_seen",
        "w_sum",
        (F.col("n_seen").cast("double") / F.col("n_bigrams")).alias(
            "covered_frac"
        ),
        (F.col("w_sum").cast("double") / (_LM_CAP * F.col("n_bigrams"))).alias(
            "score"
        ),
        (
            F.lit(_KEEP_DEN) * F.col("w_sum")
            >= F.lit(_KEEP_NUM * _LM_CAP) * F.col("n_bigrams")
        ).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# text_nfc_normalize_report
# ---------------------------------------------------------------------------

# combining-sequence suffixes per doc_id % 4 (all BMP, so Spark's UTF-16
# length() and DuckDB's codepoint length() agree):
#   0: e + COMBINING ACUTE      → composes to é        (changed)
#   1: precomposed é            → NFC identity          (unchanged)
#   2: a + U+0323 + U+0301      → ạ (U+1EA1) + U+0301   (changed;
#      exercises composition under a trailing mark)
#   3: no suffix                → identity              (unchanged)
_NFC_SUFFIXES = [" café", " café", " ạ́", ""]


def _messy_sql(case_fn) -> str:
    """CASE expression appending the suffix; ``case_fn(i)`` renders the
    suffix literal (the actual UTF-8 characters are embedded — no chr()
    dialect drift)."""
    arms = " ".join(
        f"WHEN doc_id % 4 = {i} THEN text || {case_fn(i)}"
        for i in range(4)
    )
    return f"CASE {arms} END"


def _sql_str(i: int) -> str:
    return "'" + _NFC_SUFFIXES[i] + "'"


@register(
    "text_nfc_normalize_report",
    oracle=f"""
        WITH messy AS (
            SELECT doc_id, {_messy_sql(_sql_str)} AS m FROM documents
        ),
        norm AS (
            SELECT doc_id, m, nfc_normalize(m) AS n FROM messy
        )
        SELECT doc_id,
               CAST(m <> n AS BOOLEAN) AS changed,
               md5(n) AS norm_hash,
               CAST(length(m) AS BIGINT) AS len_before,
               CAST(length(n) AS BIGINT) AS len_after
        FROM norm
        ORDER BY doc_id
    """,
    survey_ref="LLM ops: Unicode NFC normalization — the first cleanup "
    "pass of a multilingual pipeline; arrow-optimized Python "
    "unicodedata lane vs DuckDB's native nfc_normalize (two independent "
    "implementations of the Unicode standard must agree per byte)",
    description="combining sequences injected per doc (e+U+0301 "
    "composition, precomposed identity, a two-mark a+U+0323+U+0301 "
    "ordering-and-composition case, and untouched), normalized inside "
    "an arrow-optimized Python UDF with stdlib unicodedata.normalize"
    "('NFC'); the oracle normalizes the SAME messy strings with "
    "DuckDB's nfc_normalize — md5 of the normalized text plus before/"
    "after codepoint lengths must match exactly.  Map-only at any "
    "scale; the Python lane is Arrow-batched",
)
def text_nfc_normalize_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf("string", useArrow=True)
    def nfc(s: str) -> str:
        import unicodedata as _u

        return _u.normalize("NFC", s)

    d = load(spark, sf_dir, "documents")
    suffix = F.when(F.col("doc_id") % 4 == 0, F.lit(_NFC_SUFFIXES[0]))
    for i in range(1, 4):
        suffix = suffix.when(
            F.col("doc_id") % 4 == i, F.lit(_NFC_SUFFIXES[i])
        )
    messy = d.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("m")
    )
    norm = messy.select("doc_id", "m", nfc("m").alias("n"))
    return norm.select(
        "doc_id",
        (F.col("m") != F.col("n")).alias("changed"),
        F.md5("n").alias("norm_hash"),
        F.length("m").cast("long").alias("len_before"),
        F.length("n").cast("long").alias("len_after"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# multimodal_image_ahash_pairs
# ---------------------------------------------------------------------------

_AHASH_CAP = 24  # band-bucket cap: lowest ids kept (the LSH cap idiom)
_AHASH_T = 8  # Hamming threshold for a verified near-dup pair


def _ahash_oracle() -> str:
    """Rebuild every hash bit from doc_id arithmetic: cell sums via
    box/tile overlap areas (the decode is provably exact on the tile-
    constant corpus, so the closed form IS the decoded raster)."""
    return f"""
        WITH imgs AS (
            SELECT doc_id AS media_id,
                   8 * (2 + doc_id % 3) AS w,
                   8 * (2 + (doc_id // 3) % 3) AS h
            FROM documents
        ),
        cells AS (
            SELECT i.media_id, r.v AS r, c.v AS c,
                   SUM(GREATEST(0, LEAST((c.v + 1) * (i.w // 8), 8 * tx.v + 8)
                            - GREATEST(c.v * (i.w // 8), 8 * tx.v))
                     * GREATEST(0, LEAST((r.v + 1) * (i.h // 8), 8 * ty.v + 8)
                            - GREATEST(r.v * (i.h // 8), 8 * ty.v))
                     * ((i.media_id * 31 + ty.v * 16 + tx.v * 5) % 256))
                       AS cellsum
            FROM imgs i
            JOIN range(0, 8) r(v) ON TRUE
            JOIN range(0, 8) c(v) ON TRUE
            JOIN range(0, 4) tx(v) ON tx.v < i.w // 8
            JOIN range(0, 4) ty(v) ON ty.v < i.h // 8
            GROUP BY ALL
        ),
        tot AS (
            SELECT media_id, SUM(cellsum) AS total FROM cells
            GROUP BY media_id
        ),
        bits AS (
            SELECT c.media_id, c.r, c.c,
                   CASE WHEN 64 * c.cellsum >= t.total THEN 1 ELSE 0 END
                       AS bit
            FROM cells c JOIN tot t USING (media_id)
        ),
        bands AS (
            SELECT media_id, r // 2 AS band_idx,
                   CAST(SUM(bit * (1 << ((r % 2) * 8 + c))) AS BIGINT)
                       AS band_val
            FROM bits GROUP BY media_id, r // 2
        ),
        ranked AS (
            SELECT media_id, band_idx, band_val,
                   ROW_NUMBER() OVER (PARTITION BY band_idx, band_val
                                      ORDER BY media_id) AS rk
            FROM bands
        ),
        capped AS (SELECT * FROM ranked WHERE rk <= {_AHASH_CAP}),
        cand AS (
            SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
            FROM capped a JOIN capped b
              ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.media_id < b.media_id
        ),
        hx AS (
            SELECT media_id,
                   MAX(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
                   MAX(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
                   MAX(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
                   MAX(CASE WHEN band_idx = 3 THEN band_val END) AS b3
            FROM bands GROUP BY media_id
        ),
        pairs AS (
            SELECT c.media_a, c.media_b,
                   bit_count(xor(ha.b0, hb.b0))
                 + bit_count(xor(ha.b1, hb.b1))
                 + bit_count(xor(ha.b2, hb.b2))
                 + bit_count(xor(ha.b3, hb.b3)) AS hamming
            FROM cand c
            JOIN hx ha ON ha.media_id = c.media_a
            JOIN hx hb ON hb.media_id = c.media_b
        )
        SELECT media_a, media_b, CAST(hamming AS INT) AS hamming
        FROM pairs WHERE hamming <= {_AHASH_T}
        ORDER BY media_a, media_b
    """


@register(
    "multimodal_image_ahash_pairs",
    oracle=_ahash_oracle(),
    survey_ref="LLM ops: IMAGE near-dup detection — real JPEG decode → "
    "integer average-hash (aHash) → 16-bit LSH bands → capped band-"
    "bucket join → exact Hamming verify; the perceptual-dedup pass an "
    "image corpus runs before training",
    description="each doc's JPEG (the r5 codec corpus) is decoded for "
    "real and average-hashed with pure-integer arithmetic (bit = "
    "64·cellsum >= total, no float ever); the 64-bit hash splits into "
    "four 16-bit LSH bands, band buckets are capped at the "
    f"{_AHASH_CAP} lowest media_ids (the established LSH cap), and "
    f"capped candidates are Hamming-verified (<= {_AHASH_T}) with "
    "bit_count(xor).  The oracle rebuilds every hash bit from doc_id "
    "arithmetic via box/tile overlap areas — the decode is provably "
    "exact on this corpus — so one wrong decoded pixel, hash bit, cap "
    "rank, or popcount changes the output.  Decode+hash is map-only; "
    "the pair stage is one capped equi-join, never all-pairs",
)
def multimodal_image_ahash_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import pandas as pd
    from pyspark.sql import types as T

    from sparkroach._shiplib import ensure_shipped
    from sparkroach.functions.jpeg import synthesize_jpeg_media

    ensure_shipped(spark)
    docs = load(spark, sf_dir, "documents")
    media = synthesize_jpeg_media(docs)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("b0", T.LongType()),
            T.StructField("b1", T.LongType()),
            T.StructField("b2", T.LongType()),
            T.StructField("b3", T.LongType()),
        ]
    )

    def _hash(batches):
        from sparkroach.functions.ahash import ahash_bands
        from sparkroach.functions.jpeg import decode_jpeg

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                bands = ahash_bands(decode_jpeg(bytes(payload))["rgb"])
                rows.append(
                    {
                        "media_id": int(mid),
                        "b0": bands[0],
                        "b1": bands[1],
                        "b2": bands[2],
                        "b3": bands[3],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "b0", "b1", "b2", "b3"]
            )

    # decode+hash once; consumed by the band explode AND the verify join
    hx = media.mapInPandas(_hash, schema).localCheckpoint(eager=True)

    bands = hx.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_idx"),
                        F.col(f"b{k}").alias("band_val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("bv"),
    ).select("media_id", "bv.band_idx", "bv.band_val")

    from pyspark.sql import Window

    rk = Window.partitionBy("band_idx", "band_val").orderBy("media_id")
    capped = bands.withColumn("rk", F.row_number().over(rk)).where(
        F.col("rk") <= _AHASH_CAP
    )
    a = capped.select(
        "band_idx", "band_val", F.col("media_id").alias("media_a")
    )
    b = capped.select(
        "band_idx", "band_val", F.col("media_id").alias("media_b")
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b")
        .distinct()
    )
    ha = hx.select(
        F.col("media_id").alias("media_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
    )
    hb = hx.select(
        F.col("media_id").alias("media_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)],
    )
    hamming = sum(
        F.bit_count(F.expr(f"a{k} ^ bb{k}")) for k in range(4)
    )
    return (
        cand.join(ha, "media_a")
        .join(hb, "media_b")
        .select(
            "media_a", "media_b", hamming.cast("int").alias("hamming")
        )
        .where(F.col("hamming") <= _AHASH_T)
        .orderBy("media_a", "media_b")
    )
