"""LLM-data-pipeline operators, round-4 continuation (wave 8): graph
distance over the near-dup graph, secondary verification metrics on LSH
candidates, and two corpus-hygiene reports.

- ``dup_graph_bfs_layers``: BFS shortest-hop distance from the dup
  graph's *root* docs (members of a verified pair that no smaller-id doc
  dominates — every cluster's canonical survivor is a root) to every doc
  reachable through verified near-dup edges.  This is the iterative
  frontier-expansion shape Spark lacks a primitive for (no recursive
  CTE): a bounded driver loop of equi-join + anti-join per layer, each
  layer localCheckpoint-ed so plans stay flat.  The DuckDB oracle IS a
  recursive CTE (``WITH RECURSIVE walk``) — the engines reach the same
  fixpoint through entirely different execution models, which is exactly
  what makes it a strong cross-engine check.  At 100 TB the edge set
  (verified near-dup pairs) is a vanishing fraction of the corpus and
  the loop is bounded by ``BFS_MAX_DEPTH``, so each layer is one shuffle
  on the frontier — the standard Pregel/GraphFrames BFS shape without
  the library dependency.

- ``docs_levenshtein_verify``: edit distance as a SECOND verification
  signal on the capped LSH candidate pairs (the reference's near-dup
  plane stops at Jaccard; edit distance catches reorder-heavy near-dups
  whose shingle sets diverge).  Computed on 64-char prefixes so the DP
  cost is a constant per pair, never O(len²) on full documents — the
  standard prefix-window trick for edit-distance-at-scale.  Exact
  integers in both engines (Spark ``levenshtein`` and DuckDB
  ``levenshtein`` implement the same Wagner-Fischer distance).

- ``token_cosine_pairs``: term-frequency cosine similarity on the
  candidate pairs via a sparse dot product — explode to (doc, term, tf),
  join candidates to each side's tf vector on the term, one grouped sum.
  The dot product and both squared norms are EXACT INTEGERS; the only
  float math is sqrt/multiply/divide at the very end (each IEEE
  correctly-rounded, so both engines emit bit-identical doubles — see
  the registry float discipline).  This is the bag-of-words twin of
  ``dedup_embedding_cosine``: same candidate generator, sparse-exact
  instead of dense-float scoring.

- ``denylist_scrub_report``: token-denylist scrubbing (the
  PII-redaction / boilerplate-strip shape: this corpus has no emails or
  digits, so the denylist carries the pattern) — per-source docs,
  tokens before/removed, bytes before/after, and an order-independent
  md5-prefix checksum over the SCRUBBED text, so the gate pins the
  rewrite itself, not just the counts.  Map-only + one aggregation.

- ``doc_shingle_novelty``: corpus-order novelty — for each doc, how many
  of its distinct word-bigram shingles first appeared in an EARLIER doc
  (min-doc_id per shingle, joined back).  The memorization/novelty
  metric used to detect template floods and staged-crawl duplication in
  training corpora.  Two shuffles (shingle groupBy + join back on
  shingle), both on the shingle key — vocabulary-sized, not corpus-sized.

All gated=False on registration: the r4 driver window is full; these are
r5 rotation candidates, swept by the local oracle gate at
sf0.001/0.01/0.1 like every other registry entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkroach.queries.analytics11 import _th32_col, _th32_sql
from sparkroach.queries.llm_ops import (
    _JACCARD_TAU,
    _SHINGLES,
    _SHINGLES_SQL,
    _lsh_candidate_pairs,
    _lsh_candidates_cte,
    _verified_pairs,
    _with_shingles,
)
from sparkroach.queries.registry import register
from sparkroach.tables import load

# ---------------------------------------------------------------------------
# BFS over the verified near-dup graph
# ---------------------------------------------------------------------------

BFS_MAX_DEPTH = 4

# integer cross-multiplied Jaccard threshold (inter*10 >= 8*union is
# exactly jaccard >= 0.8 — no float literal crosses the engine boundary)
_TAU_NUM = int(_JACCARD_TAU * 10)


def bfs_distances(
    edges: DataFrame, seeds: DataFrame, max_depth: int = BFS_MAX_DEPTH
) -> DataFrame:
    """(node, dist) shortest-hop distances from ``seeds`` (column
    ``node``) through undirected ``edges`` (columns ``u``, ``v`` — pass
    both directions), bounded at ``max_depth``.

    Bounded driver loop: each layer is frontier ⋈ edges (shuffle on the
    frontier key) followed by an anti-join against the visited set, with
    localCheckpoint per layer to truncate lineage (a reliable checkpoint
    dir on a real cluster).  The loop exits early on an empty frontier —
    ``isEmpty`` is a cheap limit-1 job, not a full count."""
    edges = edges.localCheckpoint(eager=True)
    dist = seeds.select("node", F.lit(0).cast("long").alias("dist"))
    dist = dist.localCheckpoint(eager=True)
    frontier = dist.select("node")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return dist


def _dup_edges_and_seeds(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Undirected verified-pair edges + root seeds (docs never appearing
    as doc_b in a verified pair: no smaller-id dup dominates them)."""
    ver = (
        _verified_pairs(d)
        .where(F.col("inter") * 10 >= _TAU_NUM * F.col("uni"))
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    fwd = ver.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    rev = ver.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    edges = fwd.unionByName(rev)
    nodes = edges.select(F.col("u").alias("node")).distinct()
    dominated = ver.select(F.col("doc_b").alias("node")).distinct()
    seeds = nodes.join(dominated, "node", "left_anti")
    return edges, seeds


def _bfs_oracle() -> str:
    # WITH RECURSIVE prefixes the whole CTE list; the non-recursive
    # signature/band/candidate chain rides along unchanged
    cte = _lsh_candidates_cte().replace("WITH w AS", "WITH RECURSIVE w AS", 1)
    return f"""
        {cte},
        ver AS MATERIALIZED (
            SELECT c.doc_a, c.doc_b
            FROM cand c JOIN shing sa ON sa.doc_id = c.doc_a
                        JOIN shing sb ON sb.doc_id = c.doc_b
            WHERE len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))) * 10
                  >= {_TAU_NUM} * (len(sa.shingles) + len(sb.shingles)
                      - len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))))
        ),
        und AS (SELECT doc_a AS u, doc_b AS v FROM ver
                UNION ALL SELECT doc_b, doc_a FROM ver),
        seeds AS (SELECT DISTINCT u AS node FROM und
                  WHERE u NOT IN (SELECT doc_b FROM ver)),
        walk(node, dist) AS (
            SELECT node, 0 FROM seeds
            UNION
            SELECT und.v, walk.dist + 1
            FROM walk JOIN und ON und.u = walk.node
            WHERE walk.dist < {BFS_MAX_DEPTH}
        )
        SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
        FROM walk GROUP BY node ORDER BY node
    """


@register(
    "dup_graph_bfs_layers",
    gated=False,
    oracle=_bfs_oracle(),
    survey_ref="LLM ops: near-dup graph BFS — shortest-hop distance from "
    "cluster-root docs through verified near-dup edges (iterative frontier "
    "expansion; the oracle is a DuckDB recursive CTE)",
    description=f"BFS layers over the verified near-dup graph, depth <= "
    f"{BFS_MAX_DEPTH}: dist 0 = root docs (no smaller-id dup partner), "
    "dist k = reachable in k verified-pair hops — the transitive-dup "
    "audit trail a keep-one-per-cluster dedup pass leaves behind",
)
def dup_graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    edges, seeds = _dup_edges_and_seeds(d)
    return bfs_distances(edges, seeds, BFS_MAX_DEPTH).orderBy("node")


# ---------------------------------------------------------------------------
# edit-distance verification on LSH candidates
# ---------------------------------------------------------------------------

LEV_PREFIX = 64


@register(
    "docs_levenshtein_verify",
    gated=False,
    oracle=f"""
        {_lsh_candidates_cte()}
        SELECT c.doc_a, c.doc_b,
               CAST(levenshtein(substring(da.text, 1, {LEV_PREFIX}),
                                substring(db.text, 1, {LEV_PREFIX})) AS BIGINT)
                   AS lev{LEV_PREFIX}
        FROM cand c JOIN documents da ON da.doc_id = c.doc_a
                    JOIN documents db ON db.doc_id = c.doc_b
        ORDER BY doc_a, doc_b
    """,
    survey_ref="LLM ops: edit-distance verify over LSH candidates — the "
    "second verification signal next to Jaccard (catches reorder-heavy "
    "near-dups); prefix-windowed so the DP cost is constant per pair",
    description=f"Wagner-Fischer edit distance on {LEV_PREFIX}-char "
    "prefixes of every capped LSH candidate pair — exact integers in "
    "both engines; computed ONLY on candidates, never the n² product",
)
def docs_levenshtein_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cand = _lsh_candidate_pairs(d)
    pre = d.select(
        "doc_id", F.substring("text", 1, LEV_PREFIX).alias("pre")
    ).localCheckpoint(eager=True)
    pa = pre.select(F.col("doc_id").alias("doc_a"), F.col("pre").alias("pre_a"))
    pb = pre.select(F.col("doc_id").alias("doc_b"), F.col("pre").alias("pre_b"))
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pre_a", "pre_b").cast("long").alias(f"lev{LEV_PREFIX}"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# term-frequency cosine on LSH candidates (sparse-exact scoring)
# ---------------------------------------------------------------------------


@register(
    "token_cosine_pairs",
    gated=False,
    oracle=f"""
        {_lsh_candidates_cte()},
        tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
               FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                     FROM documents)
               GROUP BY doc_id, w),
        nrm AS (SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2
                FROM tf GROUP BY doc_id),
        dots AS (SELECT c.doc_a, c.doc_b,
                        CAST(SUM(ta.tf * tb.tf) AS BIGINT) AS dot
                 FROM cand c JOIN tf ta ON ta.doc_id = c.doc_a
                             JOIN tf tb ON tb.doc_id = c.doc_b
                                       AND tb.w = ta.w
                 GROUP BY c.doc_a, c.doc_b)
        SELECT d.doc_a, d.doc_b, d.dot,
               na.n2 AS n2_a, nb.n2 AS n2_b,
               CAST(d.dot AS DOUBLE)
                 / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
                   AS cosine
        FROM dots d JOIN nrm na ON na.doc_id = d.doc_a
                    JOIN nrm nb ON nb.doc_id = d.doc_b
        ORDER BY doc_a, doc_b
    """,
    survey_ref="LLM ops: bag-of-words cosine over LSH candidates — sparse "
    "integer dot product via term join; the tf-vector twin of "
    "dedup_embedding_cosine on the same candidate generator",
    description="term-frequency cosine on capped LSH candidate pairs: "
    "dot and squared norms are exact integers (term-join + grouped sum); "
    "sqrt/mul/div only at the end, each IEEE correctly-rounded so both "
    "engines emit identical doubles. An inner candidate pair with no "
    "shared term would drop out of the term join — LSH candidates share "
    "a band, hence at least one shingle, so the inner join is lossless",
)
def token_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cand = _lsh_candidate_pairs(d)
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)  # feeds dot (twice) + both norms
    )
    nrm = tf.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("n2"))
    ta = tf.select(F.col("doc_id").alias("doc_a"), "w", F.col("tf").alias("tf_a"))
    tb = tf.select(F.col("doc_id").alias("doc_b"), "w", F.col("tf").alias("tf_b"))
    dots = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("n2_a"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("n2_b"))
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("n2_a").cast("double")) * F.sqrt(F.col("n2_b").cast("double"))
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", "dot", "n2_a", "n2_b", cos.alias("cosine"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# denylist scrub report
# ---------------------------------------------------------------------------

# the redaction-pattern carrier for this corpus: its 31-word vocabulary
# has no emails/digits, so the denylist plays the role PII regexes play
# on a web corpus — the scrub/report plumbing is identical
DENYLIST = ("a", "the", "key", "scan", "join")


@register(
    "denylist_scrub_report",
    gated=False,
    oracle=f"""
        WITH s AS (SELECT source, text,
                          list_filter(string_split(text, ' '),
                                      x -> x NOT IN {DENYLIST!r}) AS kept
                   FROM documents),
        j AS (SELECT source, text,
                     array_to_string(kept, ' ') AS scrubbed,
                     len(string_split(text, ' ')) AS tok_before,
                     len(kept) AS tok_after
              FROM s)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(tok_before) AS BIGINT) AS tokens_before,
               CAST(SUM(tok_before - tok_after) AS BIGINT) AS tokens_removed,
               CAST(SUM(length(text)) AS BIGINT) AS bytes_before,
               CAST(SUM(length(scrubbed)) AS BIGINT) AS bytes_after,
               CAST(SUM({_th32_sql("scrubbed")}) AS BIGINT) AS scrub_hash_sum
        FROM j GROUP BY source ORDER BY source
    """,
    survey_ref="LLM ops: token-denylist scrubbing report — the "
    "PII-redaction/boilerplate-strip shape (map-only rewrite + one "
    "aggregation), checksummed so the gate pins the rewritten text",
    description="per-source scrub report: docs, tokens before/removed, "
    "bytes before/after, and an order-independent md5-prefix checksum of "
    "the scrubbed text — the checksum makes the REWRITE the thing under "
    "test, not just the counts",
)
def denylist_scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    kept = F.filter(ws, lambda x: ~x.isin(*DENYLIST))
    j = d.select(
        "source",
        F.length("text").alias("b_before"),
        F.size(ws).alias("tok_before"),
        F.size(kept).alias("tok_after"),
        F.array_join(kept, " ").alias("scrubbed"),
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok_before").alias("tokens_before"),
            F.sum(F.col("tok_before") - F.col("tok_after")).alias("tokens_removed"),
            F.sum("b_before").alias("bytes_before"),
            F.sum(F.length("scrubbed")).alias("bytes_after"),
            F.sum(_th32_col(F.col("scrubbed"))).alias("scrub_hash_sum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# corpus-order shingle novelty
# ---------------------------------------------------------------------------


@register(
    "doc_shingle_novelty",
    gated=False,
    oracle=f"""
        WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
                   FROM documents),
        shing AS (SELECT doc_id, source, {_SHINGLES_SQL} AS shingles FROM w),
        gg AS (SELECT doc_id, source, unnest(shingles) AS gram FROM shing),
        first AS (SELECT gram, MIN(doc_id) AS first_doc FROM gg GROUP BY gram),
        per AS (SELECT gg.doc_id, gg.source,
                       CAST(COUNT(*) AS BIGINT) AS n_shingles,
                       CAST(SUM(CASE WHEN f.first_doc < gg.doc_id
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
                FROM gg JOIN first f ON f.gram = gg.gram
                GROUP BY gg.doc_id, gg.source)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_shingles) AS BIGINT) AS shingles_total,
               CAST(SUM(n_seen) AS BIGINT) AS shingles_seen_before,
               CAST(SUM(CASE WHEN n_seen * 2 > n_shingles
                             THEN 1 ELSE 0 END) AS BIGINT) AS docs_majority_seen
        FROM per GROUP BY source ORDER BY source
    """,
    survey_ref="LLM ops: corpus-order shingle novelty — per-doc count of "
    "word-bigram shingles first seen in an earlier doc (min-doc_id per "
    "shingle, joined back); the memorization/template-flood metric",
    description="per-source novelty report over distinct word-bigram "
    "shingles: shingles_seen_before counts grams whose global first "
    "occurrence (MIN doc_id) precedes the doc; docs_majority_seen counts "
    "docs that are >50% recycled material. Two vocabulary-keyed "
    "shuffles — never corpus-keyed",
)
def doc_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = d.select("doc_id", "source", F.split("text", " ").alias("ws")).select(
        "doc_id", "source", F.expr(_SHINGLES).alias("shingles")
    )
    gg = sh.select(
        "doc_id", "source", F.explode("shingles").alias("gram")
    ).localCheckpoint(eager=True)  # feeds first-occurrence agg + join back
    first = gg.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per = (
        gg.join(first, "gram")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
            ).alias("n_seen"),
        )
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_shingles").alias("shingles_total"),
            F.sum("n_seen").alias("shingles_seen_before"),
            F.sum(
                F.when(F.col("n_seen") * 2 > F.col("n_shingles"), 1).otherwise(0)
            ).alias("docs_majority_seen"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# prefix-filtered EXACT similarity join (PPJoin-style)
# ---------------------------------------------------------------------------

# Jaccard >= 0.8 in integer arithmetic throughout:
#   prefix length     p = m - ceil(0.8 m) + 1 = m - (4m+4)//5 + 1
#   overlap bound     a = ceil((0.8/1.8)(mx+my)) = (4(mx+my)+8)//9
# No float literal or float multiply touches a filter decision, so both
# engines prune identically.


def _prefix_jaccard_oracle() -> str:
    from sparkroach.queries.llm_ops import _SHINGLES_SQL

    return f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        shing AS MATERIALIZED (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM w),
        gg AS (SELECT doc_id, unnest(shingles) AS gram FROM shing),
        df AS (SELECT gram, COUNT(*) AS c FROM gg GROUP BY gram),
        ranked AS (SELECT gg.doc_id, gg.gram,
                          row_number() OVER (PARTITION BY gg.doc_id
                                             ORDER BY df.c, gg.gram) AS rn,
                          COUNT(*) OVER (PARTITION BY gg.doc_id) AS m
                   FROM gg JOIN df USING (gram)),
        pref AS MATERIALIZED (
            SELECT doc_id, gram, rn, m FROM ranked
            WHERE rn <= m - ((4*m + 4) // 5) + 1),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM pref a JOIN pref b ON a.gram = b.gram
                  AND a.doc_id < b.doc_id
                  AND b.m * 10 >= 8 * a.m AND a.m * 10 >= 8 * b.m
                  AND least(a.m - a.rn, b.m - b.rn) + 1
                      >= (4*(a.m + b.m) + 8) // 9),
        ver AS (SELECT c.doc_a, c.doc_b,
                   len(list_filter(sa.shingles,
                                   x -> list_contains(sb.shingles, x))) AS inter,
                   len(sa.shingles) + len(sb.shingles)
                     - len(list_filter(sa.shingles,
                                       x -> list_contains(sb.shingles, x))) AS uni
                FROM cand c JOIN shing sa ON sa.doc_id = c.doc_a
                            JOIN shing sb ON sb.doc_id = c.doc_b)
        SELECT doc_a, doc_b,
               CAST(inter AS DOUBLE) / uni AS jaccard
        FROM ver WHERE inter * 10 >= 8 * uni
        ORDER BY doc_a, doc_b
    """


@register(
    "prefix_jaccard_join_exact",
    gated=False,
    oracle=_prefix_jaccard_oracle(),
    survey_ref="LLM ops: prefix-filtered EXACT similarity join (PPJoin "
    "family: prefix + length + positional filters, all lossless) — the "
    "zero-false-negative alternative to MinHash-LSH, and the recall "
    "certifier for it",
    description="exact word-bigram Jaccard >= 0.8 join WITHOUT LSH: "
    "shingles ranked by ascending global document frequency, candidates "
    "= pairs sharing a prefix token, pruned by the lossless length "
    "(sizes within 10/8) and positional (remaining-overlap >= "
    "ceil(4(mx+my)/9)) filters, then exact verify. Provably equal to "
    "the brute-force O(n^2) join; on this low-vocab corpus the "
    "positional+length filters carry the pruning (4.4M -> 667k "
    "candidates at sf0.1) where a Zipfian web corpus would get it from "
    "rare-token prefixes. Integer-only filter arithmetic so both "
    "engines prune identically",
)
def prefix_jaccard_join_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    sh = _with_shingles(d).localCheckpoint(eager=True)  # feeds rank + verify
    gg = sh.select("doc_id", F.explode("shingles").alias("gram"))
    df_ = gg.groupBy("gram").agg(F.count("*").alias("c"))
    wdoc = Window.partitionBy("doc_id").orderBy("c", "gram")
    ranked = (
        gg.join(df_, "gram")
        .select(
            "doc_id",
            "gram",
            F.row_number().over(wdoc).alias("rn"),
            F.count("*").over(Window.partitionBy("doc_id")).alias("m"),
        )
    )
    pref = ranked.where(
        F.col("rn") <= F.col("m") - F.expr("(4*m + 4) div 5") + 1
    ).localCheckpoint(eager=True)  # self-joined below
    a = pref.alias("a")
    b = pref.alias("b")
    alpha = F.expr("(4*(a.m + b.m) + 8) div 9")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.m") * 10 >= 8 * F.col("a.m"))
            & (F.col("a.m") * 10 >= 8 * F.col("b.m"))
            & (
                F.least(
                    F.col("a.m") - F.col("a.rn"), F.col("b.m") - F.col("b.rn")
                )
                + 1
                >= alpha
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    uni = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(inter * 10 >= 8 * uni)
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / uni).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )
