"""Round-7 late wave: winnowing fingerprints (MOSS-style local dedup).

``winnowing_match_pairs`` implements the winnowing algorithm of
Schleimer, Wilkerson & Aiken (SIGMOD 2003, "Winnowing: Local Algorithms
for Document Fingerprinting") — the public algorithm behind MOSS and a
standard tool in training-data curation for catching *partial* overlap
(shared passages, boilerplate, quote reuse) that whole-document MinHash
misses and exact passage hashing over-fragments:

1. slide a k-gram window over each document's token stream and hash
   every gram (k = :data:`WINNOW_K`);
2. in every window of :data:`WINNOW_W` consecutive gram hashes, select
   the minimum (ties broken by earliest position — encoded by packing
   ``hash * 2^20 + pos`` so one ``min()`` does both);
3. the selected (deduplicated) hashes are the document's fingerprint
   set.  Guarantee: any shared token run of at least ``W + K - 1``
   tokens contributes at least one shared fingerprint, while only
   ~``2/(W+1)`` of all gram hashes are kept.

Matching is then a bucketed equi-join on fingerprint — the same
scale shape as the LSH gates: fingerprints shared by more than
:data:`FP_MAX_DOCS` documents are dropped as boilerplate *before* the
join (the standard MOSS "too common to be interesting" filter, and the
exact analog of the LSH bucket cap — it bounds per-bucket join fan-out
so nothing quadratic in the corpus can run), pairs must share at least
:data:`MIN_SHARED` fingerprints, and the report is the deterministic
top :data:`TOP_PAIRS` by (shared count desc, pair id).

Everything is JVM-side (split/transform/posexplode/window/joins — no
Python in the data path), and the oracle runs the identical selection
arithmetic in DuckDB, so the gate pins the algorithm, the tie-breaks
and the caps bit-for-bit.

100 TB posture: per-doc work is linear in tokens (one window pass after
one explode — the partitioned-window shape, never a global sort);
cross-doc work is one shuffle on fingerprint with capped buckets; the
final top-k is TakeOrderedAndProject.  The fingerprint *index* (doc_id,
fp) is exactly what an incremental pipeline stores — a new batch joins
its fingerprints against the stored index (the
``dedup_incremental_new_docs`` pattern, llm_ops7).

Reference parity: no counterpart (the reference has no text plane);
part of the LLM-training-data surface the brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkroach.queries.registry import register
from sparkroach.tables import load

WINNOW_K = 3  # tokens per gram
WINNOW_W = 4  # gram hashes per winnowing window
_P = (1 << 31) - 1  # hash modulus (the repo-wide 31-bit md5-prefix idiom)
_POS = 1 << 20  # position packing base (docs are << 2^20 tokens)
FP_MAX_DOCS = 16  # boilerplate cap: fp in more docs than this is dropped
MIN_SHARED = 2  # pair report floor
TOP_PAIRS = 200  # deterministic report cap

_HEX = "0123456789abcdef"
_TH32_GM = " + ".join(
    f"(instr('{_HEX}', substring(gm, {k + 1}, 1)) - 1) * {16 ** (7 - k)}"
    for k in range(8)
)


@register(
    "winnowing_match_pairs",
    # r8: added to the bench headline set (VERDICT r7 item 6) — the 14
    # pre-r7 headline queries are untouched for comparability; this is
    # the r7-plane representative (window-min fingerprints + bucketed
    # equi-join), making the round-over-round bench cover the new planes.
    bench=True,
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        grams AS (
            SELECT doc_id, g.i AS pos,
                   md5(array_to_string(ws[g.i+1 : g.i+{WINNOW_K}], ' ')) AS gm,
                   len(ws) - {WINNOW_K} + 1 AS n_grams
            FROM toks,
                 unnest(range(0, greatest(len(ws) - {WINNOW_K} + 1, 0)))
                     AS g(i)
        ),
        hs AS (
            SELECT doc_id, pos, n_grams,
                   (({_TH32_GM}) % {_P}) * {_POS} + pos AS packed
            FROM grams
        ),
        sel AS (
            SELECT doc_id, pos, n_grams,
                   min(packed) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW
                                AND {WINNOW_W - 1} FOLLOWING) AS fpk
            FROM hs
        ),
        fps AS (
            SELECT DISTINCT doc_id, fpk // {_POS} AS fp
            FROM sel WHERE pos + {WINNOW_W} <= n_grams
        ),
        keep AS (
            SELECT fp FROM fps
            GROUP BY fp HAVING count(*) BETWEEN 2 AND {FP_MAX_DOCS}
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS shared_fps
        FROM fps a JOIN keep USING (fp) JOIN fps b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_SHARED}
        ORDER BY shared_fps DESC, doc_a, doc_b
        LIMIT {TOP_PAIRS}
    """,
    survey_ref="LLM ops: winnowing document fingerprinting (Schleimer/"
    "Wilkerson/Aiken 2003) — guaranteed detection of shared token runs "
    ">= W+K-1 via window-min k-gram selection; the partial-overlap "
    "detector between whole-doc MinHash and exact passage hashing",
    description=f"winnowing: k={WINNOW_K}-gram hashes, window-min over "
    f"w={WINNOW_W} with hash*2^20+pos packing (one min() applies the "
    "position tie-break), distinct selected fingerprints per doc, "
    f"boilerplate fingerprints (> {FP_MAX_DOCS} docs) dropped before the "
    "bucketed fingerprint equi-join (the LSH-cap analog — bounds bucket "
    f"fan-out), pairs sharing >= {MIN_SHARED} fingerprints reported, "
    f"deterministic top {TOP_PAIRS}.  All JVM-side; the window is "
    "partitioned per doc (never a global sort) and the join shuffles "
    "once on fingerprint",
)
def winnowing_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # r8 optimization: the old plan checkpointed the full fingerprint
    # table, aggregated a frequency census, and joined it back — three
    # shuffles of the FULL fingerprint set (census + both join sides).
    # The census is a per-fingerprint count, so one fp-keyed window
    # (partitioned by fp — per-fingerprint groups, never a global window)
    # computes df in place on a single fp exchange, and the boilerplate /
    # singleton filter runs BEFORE the checkpoint: what gets materialized
    # and self-joined is only the matchable fingerprints (df in
    # [2, FP_MAX_DOCS]), a small fraction of the corpus fingerprint set.
    # The checkpoint still pays the explode+window fingerprint stage once
    # for both join sides.  Identical values at every SF (A/B-verified).
    fps = winnow_fingerprints(d)
    w = Window.partitionBy("fp")
    kept = (
        fps.withColumn("df", F.count("*").over(w))
        .filter((F.col("df") >= 2) & (F.col("df") <= FP_MAX_DOCS))
        .select("doc_id", "fp")
        .localCheckpoint()
    )
    a = kept.alias("a")
    b = kept.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= MIN_SHARED)
        .orderBy(F.desc("shared_fps"), "doc_a", "doc_b")
        .limit(TOP_PAIRS)
    )


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """``(doc_id, text, ...)`` → distinct ``(doc_id, fp)`` winnowing
    fingerprints (selection stage only — the testable guarantee surface:
    any shared token run >= W+K-1 yields a shared fp)."""
    d = docs.select("doc_id", F.split("text", " ").alias("ws"))
    grams = d.select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(ws) >= {WINNOW_K} THEN "
            f"transform(sequence(0, size(ws) - {WINNOW_K}), "
            f"i -> concat_ws(' ', slice(ws, i + 1, {WINNOW_K}))) "
            f"ELSE array() END"
        ).alias("gs"),
    )
    exploded = grams.select(
        "doc_id",
        F.size("gs").alias("n_grams"),
        F.posexplode("gs").alias("pos", "gram"),
    )
    packed = (
        F.pmod(
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long"),
            F.lit(_P),
        )
        * _POS
        + F.col("pos")
    )
    hs = exploded.select("doc_id", "pos", "n_grams", packed.alias("packed"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    sel = hs.select(
        "doc_id", "pos", "n_grams", F.min("packed").over(w).alias("fpk")
    )
    return (
        sel.filter(F.col("pos") + WINNOW_W <= F.col("n_grams"))
        .select("doc_id", F.expr(f"fpk div {_POS}").alias("fp"))
        .distinct()
    )
