"""Unit pins for the wave-8 LLM ops (llm_ops6): BFS semantics on
synthetic graphs the testdata's near-clique dup graph never exercises
(chains deeper than one hop, disconnected components, max-depth
truncation), plus scrub edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkroach.queries.llm_ops6 import (
    BFS_MAX_DEPTH,
    DENYLIST,
    bfs_distances,
)


def _edges(spark, pairs):
    fwd = spark.createDataFrame(pairs, "u long, v long")
    return fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_bfs_chain_layers(spark):
    """A 5-node chain from one seed: distances are the hop counts —
    the depth>1 behavior the near-clique corpus graph can't show."""
    dist = bfs_distances(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), _seeds(spark, [1])
    )
    assert {(r.node, r.dist) for r in dist.collect()} == {
        (1, 0), (2, 1), (3, 2), (4, 3), (5, 4),
    }


def test_bfs_max_depth_truncates(spark):
    """Nodes beyond max_depth hops are absent, not mislabeled."""
    chain = [(i, i + 1) for i in range(1, 8)]
    dist = bfs_distances(_edges(spark, chain), _seeds(spark, [1]), max_depth=2)
    assert {(r.node, r.dist) for r in dist.collect()} == {(1, 0), (2, 1), (3, 2)}


def test_bfs_multi_seed_min_distance(spark):
    """With seeds at both chain ends, every node takes the NEARER seed's
    distance (shortest over the seed set, not per-seed rows)."""
    dist = bfs_distances(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), _seeds(spark, [1, 5])
    )
    got = {(r.node, r.dist) for r in dist.collect()}
    assert got == {(1, 0), (5, 0), (2, 1), (4, 1), (3, 2)}
    # exactly one row per node — the anti-join dedups across layers
    assert dist.count() == dist.select("node").distinct().count()


def test_bfs_disconnected_component_unreached(spark):
    """A component with no seed never appears; the loop early-exits
    once the reachable frontier drains (well before max_depth)."""
    dist = bfs_distances(
        _edges(spark, [(1, 2), (10, 11)]), _seeds(spark, [1]), max_depth=BFS_MAX_DEPTH
    )
    assert {(r.node, r.dist) for r in dist.collect()} == {(1, 0), (2, 1)}


def test_bfs_cycle_terminates(spark):
    """A cycle must not re-enqueue visited nodes (anti-join guard)."""
    dist = bfs_distances(
        _edges(spark, [(1, 2), (2, 3), (3, 1)]), _seeds(spark, [1])
    )
    assert {(r.node, r.dist) for r in dist.collect()} == {(1, 0), (2, 1), (3, 1)}


def test_scrub_fully_denied_doc(spark):
    """A doc whose every token is denylisted scrubs to the empty string:
    tok_after 0, bytes_after 0 — the report must count it, not drop it."""
    ws = F.split("text", " ")
    kept = F.filter(ws, lambda x: ~x.isin(*DENYLIST))
    df = spark.createDataFrame(
        [("the a key", "s1"), ("merge sort", "s1")], "text string, source string"
    ).select(
        F.size(ws).alias("tok_before"),
        F.size(kept).alias("tok_after"),
        F.array_join(kept, " ").alias("scrubbed"),
    )
    rows = {(r.tok_before, r.tok_after, r.scrubbed) for r in df.collect()}
    assert rows == {(3, 0, ""), (2, 2, "merge sort")}


def test_prefix_exact_join_certifies_lsh_recall(spark):
    """The prefix-filtered join is EXACT (no false negatives), so the
    LSH-verified pair set must be a subset of it; on this corpus they are
    in fact equal, which certifies minhash recall = 100% at sf0.001."""
    from sparkroach.queries import QUERIES
    from tests.conftest import SF_SMALL

    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["prefix_jaccard_join_exact"].fn(spark, SF_SMALL).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["minhash_jaccard_verified"].fn(spark, SF_SMALL).collect()
    }
    assert lsh <= exact
    assert exact == lsh  # corpus fact: LSH misses nothing at this SF
