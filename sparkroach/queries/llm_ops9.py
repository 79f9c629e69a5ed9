"""Round-7 late wave 2: HTML text extraction and a linear quality scorer.

Two more stages every web-scale training pipeline runs between crawl
and corpus:

* ``html_text_extraction`` — the WET-generation step (Common Crawl's
  WARC→WET): strip markup and boilerplate blocks from HTML, keep the
  content text.  The corpus has no HTML, so — the same
  synthesize-from-doc_id discipline as the PII and multimodal gates —
  each document is wrapped JVM-side into a deterministic page (title,
  ``<style>``/``<script>`` heads, ``<nav>``/aside-ad/``<footer>``
  boilerplate, the text inside ``<p>``), and the extractor then removes
  container blocks and tags with RE2-portable regexes and normalizes
  whitespace.  Because the wrapper is lossless around the text by
  construction, the gate can pin the strongest possible claim: the
  extracted text's md5 equals the ORIGINAL text's md5, per document —
  any regex over/under-reach breaks it.  Boilerplate fraction (what the
  extractor discarded) is exact integer arithmetic per doc.

* ``quality_linear_classifier`` — the fastText-shaped quality filter:
  a linear scorer over hashed token features.  Real classifiers ship a
  learned weight table; here the weights are a deterministic hash of
  the token (md5-prefix → integer in [-1000, 1000], i.e. the hashing
  trick with a fixed salt — the PLAN is identical to scoring with a
  broadcast learned table, which is the part an engine owns).  Scoring
  keeps everything integer until one final IEEE division (weight_sum /
  (1000·n_tokens)), and the keep/drop decision is made by INTEGER
  cross-multiplication so the gate never compares floats.  Map-only
  until the per-doc agg; no Python.

Reference parity: no counterpart (the reference has no text plane);
part of the LLM-training-data surface the brief requires.
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


# ---------------------------------------------------------------------------
# html_text_extraction
# ---------------------------------------------------------------------------

# the deterministic page template (all segments are functions of doc_id /
# lang so the oracle rebuilds the identical string; corpus text is
# [a-z0-9 ] by the loader guard, so no entity escaping is needed)
_NAV = "home about contact archive"
_AD = "subscribe now limited offer"
_FOOTER = "copyright 2026 example press all rights reserved"

# RE2-portable (also valid Java regex): dot-all block removers for the
# containers whose CONTENT must go, then a tag stripper, then whitespace
# normalization.  No lookaround, no backreferences.
_BLOCK_RE = r"(?s)<(script|style|nav|aside|footer)[^>]*>.*?</\1>"
# NOTE: RE2 (DuckDB) has no backreference \1 — spell the alternatives out
_BLOCK_RES = [
    rf"(?s)<{t}[^>]*>.*?</{t}>"
    for t in ("script", "style", "title", "nav", "aside", "footer")
]
_TAG_RE = r"<[^>]+>"


def _page_sql(text: str, doc_id: str, lang: str, strtype: str) -> str:
    """One SQL expression building the synthetic page (``strtype`` is the
    dialect's unbounded string type: STRING in Spark, VARCHAR in DuckDB —
    the only dialect split in the whole expression)."""
    return (
        f"'<html lang=\"' || {lang} || '\"><head><title>doc ' || "
        f"CAST({doc_id} AS {strtype}) || '</title>"
        f"<style>body {{ margin: 0 }}</style>"
        f"<script>var x = ' || CAST({doc_id} AS {strtype}) || ';</script>"
        f"</head><body><nav>{_NAV}</nav>"
        f"<aside class=\"ad\">{_AD}</aside>"
        f"<p>' || {text} || '</p>"
        f"<footer>{_FOOTER}</footer></body></html>'"
    )


def _extract_sql(expr: str, regexp_fn: str) -> str:
    """Chain the block removers + tag stripper + whitespace trim.
    ``regexp_fn`` is ``regexp_replace(%s, %r, %r)`` shaped per dialect."""
    out = expr
    for br in _BLOCK_RES:
        out = regexp_fn % (out, br, " ")
    out = regexp_fn % (out, _TAG_RE, " ")
    out = regexp_fn % (out, r"[ ]+", " ")
    return f"trim({out})"


@register(
    "html_text_extraction",
    oracle=f"""
        WITH pages AS (
            SELECT doc_id, text,
                   {_page_sql("text", "doc_id", "lang", "VARCHAR")} AS html
            FROM documents
        ),
        ex AS (
            SELECT doc_id, text, html,
                   {_extract_sql("html", "regexp_replace(%s, '%s', '%s', 'g')")}
                       AS clean
            FROM pages
        )
        SELECT doc_id,
               md5(clean) AS clean_hash,
               CAST(md5(clean) = md5(text) AS BOOLEAN) AS lossless,
               CAST(strlen(clean) AS BIGINT) AS clean_len,
               CAST(strlen(html) - strlen(text) AS BIGINT)
                   AS boilerplate_chars
        FROM ex
        ORDER BY doc_id
    """,
    survey_ref="LLM ops: HTML text extraction (the WARC→WET content step) "
    "— script/style/nav/aside/footer block removal + tag strip + "
    "whitespace normalization, RE2-portable regex, all JVM-side",
    description="wrap each doc into a deterministic HTML page (title + "
    "style/script heads + nav/ad/footer boilerplate, text inside <p>), "
    "then extract: remove boilerplate CONTAINERS with their content, "
    "strip remaining tags, collapse whitespace.  The wrapper is lossless "
    "around the text by construction, so the gate pins md5(extracted) == "
    "md5(original text) PER DOCUMENT — one regex over- or under-reach "
    "breaks the hash.  Map-only (no shuffle before the output sort); the "
    "extraction cost is linear in page bytes at any corpus size",
)
def html_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    page = F.expr(_page_sql("text", "doc_id", "lang", "STRING"))
    with_html = d.select("doc_id", "text", page.alias("html"))
    clean = F.expr(
        _extract_sql("html", "regexp_replace(%s, '%s', '%s')")
    )
    ex = with_html.select("doc_id", "text", "html", clean.alias("clean"))
    return ex.select(
        "doc_id",
        F.md5("clean").alias("clean_hash"),
        (F.md5("clean") == F.md5("text")).alias("lossless"),
        F.length("clean").cast("long").alias("clean_len"),
        (F.length("html") - F.length("text"))
        .cast("long")
        .alias("boilerplate_chars"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# quality_linear_classifier
# ---------------------------------------------------------------------------

# hashed token weight in [-1000, 1000]: the hashing-trick feature table
# with a fixed salt; the scoring PLAN (explode → hash/lookup → per-doc
# agg) is exactly what a shipped learned table runs
_W_SALT = "qw1"
_W_RANGE = 2001  # odd → symmetric around 0
# keep iff mean token weight >= threshold ⇔ weight_sum * DEN >= NUM * n
_THRESH_NUM, _THRESH_DEN = -25, 1  # mean weight >= -25/1000


@register(
    "quality_linear_classifier",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        ws AS (
            SELECT doc_id,
                   ({_th32_sql("md5('{_W_SALT}' || tok)")}) % {_W_RANGE}
                       - 1000 AS w
            FROM toks
        ),
        agg AS (
            SELECT doc_id,
                   CAST(SUM(w) AS BIGINT) AS weight_sum,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM ws GROUP BY doc_id
        )
        SELECT doc_id, weight_sum, n_tokens,
               CAST(weight_sum AS DOUBLE) / (1000.0 * n_tokens) AS score,
               CAST(weight_sum * {_THRESH_DEN} >=
                    {_THRESH_NUM} * n_tokens AS BOOLEAN) AS keep
        FROM agg
        ORDER BY doc_id
    """.replace("{_W_SALT}", _W_SALT),
    survey_ref="LLM ops: learned-classifier-shaped quality filter — "
    "hashing-trick linear scorer (the fastText-style keep/drop pass): "
    "explode tokens → hashed weight lookup → per-doc aggregate, integer "
    "decision by cross-multiplication",
    description=f"linear quality score over hashed token features: "
    f"weight(token) = md5-prefix hash → integer in [-1000, 1000] (a "
    "fixed-salt hashing-trick table; swapping in a broadcast LEARNED "
    "table is the same plan), score = weight_sum / (1000·n_tokens) with "
    "exactly one IEEE division, and the keep/drop label decided by "
    f"integer cross-multiplication (mean >= {_THRESH_NUM}/1000) so the "
    "gate never compares floats.  Explode → map-side hash → one grouped "
    "agg; at 100 TB this is the per-doc scoring pass, shuffle only on "
    "doc_id",
)
def quality_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    w = (
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(_W_SALT), F.col("tok"))), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(_W_RANGE),
        )
        - 1000
    )
    agg = toks.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.sum("w").cast("long").alias("weight_sum"),
        F.count("*").cast("long").alias("n_tokens"),
    )
    return agg.select(
        "doc_id",
        "weight_sum",
        "n_tokens",
        (
            F.col("weight_sum").cast("double")
            / (1000.0 * F.col("n_tokens"))
        ).alias("score"),
        (
            F.col("weight_sum") * _THRESH_DEN
            >= F.lit(_THRESH_NUM) * F.col("n_tokens")
        ).alias("keep"),
    ).orderBy("doc_id")
