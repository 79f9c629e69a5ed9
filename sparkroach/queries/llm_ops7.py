"""Round-7 training-data-pipeline operators: PII scrubbing, incremental dedup.

Two production stages the corpus surface didn't yet carry as first-class
operators:

* **PII regex scrub** — the denylist gate (``denylist_scrub_report``,
  llm_ops6) plays the redaction SHAPE on this corpus because the 31-word
  vocabulary has no emails/digits; this module makes the regex plane REAL
  by deterministically injecting synthetic PII spans (emails, phone
  numbers, IPv4s derived from doc_id — the same synthesize-from-doc_id
  discipline the multimodal gates use for payload bytes) and then running
  genuine regex detection + redaction over the augmented text.  Both
  engines construct the identical augmented string and run the same
  patterns (chosen Java-regex/RE2-portable: char classes + bounded
  quantifiers, no lookaround), so counts, redacted lengths and redacted-
  text hashes match bit-for-bit.

* **Incremental dedup** — every dedup gate so far dedups a corpus against
  ITSELF; production pipelines mostly dedup a NEW BATCH against an
  EXISTING INDEX (the snapshot-over-snapshot crawl case): the old corpus'
  LSH band keys are precomputed and stored, the new batch joins against
  them, and nothing quadratic in the old corpus ever runs.  Here the
  even-doc_id half plays the stored index and the odd half the arriving
  batch; the index side of each band bucket is capped at the
  deterministic ``LSH_BUCKET_CAP`` lowest ids (the same declared-
  semantics cap as the self-join gates, mirrored exactly by the oracle),
  bounding per-new-doc work at N_BANDS x cap candidate verifications.

Reference parity: no counterpart (the reference has no text plane);
part of the LLM-training-data surface the brief requires.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from sparkroach.queries.llm_ops import (
    _JACC_SQL,
    _JACCARD_TAU,
    _SHINGLE_HASH_SQL,
    _SHINGLE_HASH_SQL_MD5S,
    _SHINGLES_SQL,
    _minhash_sig_sql,
    _with_shingles,
    LSH_BUCKET_CAP,
    N_BANDS,
    N_MINHASH,
    lsh_bands,
)
from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# pii_scrub_report — real regex detection + redaction over injected PII
# ---------------------------------------------------------------------------

# Java-regex / RE2 portable patterns (char classes + bounded quantifiers
# only — identical semantics in Spark's JVM regex and DuckDB's RE2)
_EMAIL_RE = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
_PHONE_RE = r"\+1-555-[0-9]{4}"
_IP_RE = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

_PII_ORACLE = f"""
    WITH aug AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.com'
                       ELSE '' END
               || CASE WHEN doc_id % 4 = 1
                       THEN ' call +1-555-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 2
                       THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.' || CAST((doc_id // 7) % 256 AS VARCHAR)
                            || '.' || CAST(doc_id % 100 AS VARCHAR)
                       ELSE '' END AS t
        FROM documents
    ),
    scrubbed AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
                   AS n_email,
               CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT)
                   AS n_phone,
               CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ip,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                       '{_PHONE_RE}', '[PHONE]', 'g'),
                   '{_IP_RE}', '[IP]', 'g') AS red
        FROM aug
    )
    SELECT doc_id,
           n_email, n_phone, n_ip,
           n_email + n_phone + n_ip AS pii_total,
           CAST(length(red) AS BIGINT) AS redacted_len,
           md5(red) AS redacted_hash
    FROM scrubbed
    ORDER BY doc_id
"""


@register(
    "pii_scrub_report",
    oracle=_PII_ORACLE,
    survey_ref="LLM ops: PII detection + redaction — REAL regex plane "
    "(email / phone / IPv4 patterns) over deterministically PII-injected "
    "text; upgrades the denylist stand-in to genuine pattern scrubbing",
    description="augment each document with doc_id-derived synthetic PII "
    "spans (emails on id%3, phones on id%4, IPv4s on id%5 — the "
    "synthesize-from-id discipline of the multimodal gates), then run "
    "Java/RE2-portable regexes for detection counts and a 3-stage "
    "regexp_replace redaction; output counts, redacted length and the "
    "md5 of the redacted text per document, all bit-matched cross-engine. "
    "Map-only scan — one pass, no shuffle; at 100 TB this is the "
    "canonical pre-tokenization scrub stage and the per-row cost is a "
    "handful of compiled-regex passes",
)
def pii_scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    s = F.col("doc_id").cast("string")
    email = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" contact user"), s, F.lit("@ex"),
            (F.col("doc_id") % 7).cast("string"), F.lit(".com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 4 == 1,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        F.col("doc_id") % 5 == 2,
        F.concat(
            F.lit(" host 10."), (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            # integer floor division (div) — the oracle's // exactly
            (F.expr("doc_id div 7") % 256).cast("string"),
            F.lit("."), (F.col("doc_id") % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    aug = d.select(
        "doc_id", F.concat(F.col("text"), email, phone, ip).alias("t")
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ),
        _IP_RE,
        "[IP]",
    )
    n_email = F.regexp_count(F.col("t"), F.lit(_EMAIL_RE))
    n_phone = F.regexp_count(F.col("t"), F.lit(_PHONE_RE))
    n_ip = F.regexp_count(F.col("t"), F.lit(_IP_RE))
    return (
        aug.select(
            "doc_id",
            n_email.cast("long").alias("n_email"),
            n_phone.cast("long").alias("n_phone"),
            n_ip.cast("long").alias("n_ip"),
            red.alias("red"),
        )
        .select(
            "doc_id",
            "n_email",
            "n_phone",
            "n_ip",
            (F.col("n_email") + F.col("n_phone") + F.col("n_ip")).alias(
                "pii_total"
            ),
            F.length("red").cast("long").alias("redacted_len"),
            F.md5("red").alias("redacted_hash"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# dedup_incremental_new_docs — new batch vs stored index (no self-join)
# ---------------------------------------------------------------------------


def _incremental_oracle() -> str:
    sig_cols = ", ".join(
        f"{_minhash_sig_sql(i)} AS s{i}" for i in range(N_MINHASH)
    )
    rows_per_band = N_MINHASH // N_BANDS
    band_exprs = []
    for b in range(N_BANDS):
        parts = " || '|' || ".join(
            f"CAST(s{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        band_exprs.append(
            f"SELECT doc_id, {b} AS band_idx, {parts} AS band_val FROM sig"
        )
    bands = " UNION ALL ".join(band_exprs)
    return f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        shing AS MATERIALIZED (
            SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM w
        ),
        md5s AS (SELECT doc_id, {_SHINGLE_HASH_SQL_MD5S} AS ms FROM shing),
        hashed AS (SELECT doc_id, {_SHINGLE_HASH_SQL} AS xs FROM md5s),
        sig AS MATERIALIZED (SELECT doc_id, {sig_cols} FROM hashed),
        bands AS MATERIALIZED ({bands}),
        old_ranked AS (
            SELECT doc_id, band_idx, band_val,
                   row_number() OVER (PARTITION BY band_idx, band_val
                                      ORDER BY doc_id) AS rk
            FROM bands WHERE doc_id % 2 = 0
        ),
        cand AS (
            SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS old_doc
            FROM bands n
            JOIN old_ranked o
              ON o.band_idx = n.band_idx AND o.band_val = n.band_val
             AND o.rk <= {LSH_BUCKET_CAP}
            WHERE n.doc_id % 2 = 1
        ),
        ver AS (
            SELECT c.new_doc, c.old_doc, {_JACC_SQL} AS jaccard
            FROM cand c
            JOIN shing sa ON sa.doc_id = c.new_doc
            JOIN shing sb ON sb.doc_id = c.old_doc
            WHERE {_JACC_SQL} >= {_JACCARD_TAU}
        )
        SELECT new_doc, old_doc AS dup_of, jaccard FROM (
            SELECT new_doc, old_doc, jaccard,
                   row_number() OVER (PARTITION BY new_doc
                                      ORDER BY jaccard DESC, old_doc) AS rk
            FROM ver
        ) WHERE rk = 1
        ORDER BY new_doc
    """


@register(
    "dedup_incremental_new_docs",
    oracle=_incremental_oracle(),
    survey_ref="LLM ops: INCREMENTAL near-dup — a new batch deduped "
    "against an existing corpus' stored LSH index (the snapshot-over-"
    "snapshot crawl case), never a self-join over the old corpus",
    description=f"even doc_ids play the stored index (band keys "
    "precomputed — at 100 TB they live as a bucketed table keyed on "
    "(band_idx, band_val)), odd doc_ids the arriving batch; the index "
    f"side of each bucket is capped at the {LSH_BUCKET_CAP} lowest ids "
    "(deterministic, oracle-mirrored — the self-join gates' declared-"
    "semantics cap), so per-new-doc work is bounded at "
    f"{N_BANDS}x{LSH_BUCKET_CAP} candidate checks regardless of bucket "
    "flooding; candidates verify with exact bigram Jaccard and each "
    "dup reports its best match (highest Jaccard, ties to lowest id). "
    "Nothing rescans or re-pairs the old corpus",
)
def dedup_incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = _with_shingles(d).localCheckpoint(eager=True)
    bands = lsh_bands(sh)
    old_b = bands.where(F.col("doc_id") % 2 == 0)
    new_b = bands.where(F.col("doc_id") % 2 == 1)
    wcap = Window.partitionBy("band_idx", "band_val").orderBy("doc_id")
    old_capped = (
        old_b.withColumn("rk", F.row_number().over(wcap))
        .where(F.col("rk") <= LSH_BUCKET_CAP)
        .select(
            F.col("doc_id").alias("old_doc"), "band_idx", "band_val"
        )
    )
    cand = (
        new_b.select(F.col("doc_id").alias("new_doc"), "band_idx", "band_val")
        .join(old_capped, ["band_idx", "band_val"])
        .select("new_doc", "old_doc")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("new_doc"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("old_doc"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    ver = (
        cand.join(sa, "new_doc")
        .join(sb, "old_doc")
        .select("new_doc", "old_doc", jac.alias("jaccard"))
        .where(F.col("jaccard") >= _JACCARD_TAU)
    )
    wbest = Window.partitionBy("new_doc").orderBy(
        F.col("jaccard").desc(), F.col("old_doc")
    )
    return (
        ver.withColumn("rk", F.row_number().over(wbest))
        .where(F.col("rk") == 1)
        .select("new_doc", F.col("old_doc").alias("dup_of"), "jaccard")
        .orderBy("new_doc")
    )
