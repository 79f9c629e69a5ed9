"""Winnowing fingerprints (queries/llm_ops8.py).

Pins the paper's guarantee (Schleimer/Wilkerson/Aiken 2003 §3): any
shared token run of at least W + K - 1 tokens yields at least one
shared fingerprint — and its contrapositive surface (disjoint vocab →
zero shared fingerprints), plus the density bound that makes winnowing
cheaper than keeping every gram."""

from __future__ import annotations

from sparkroach.queries.llm_ops8 import (
    FP_MAX_DOCS,
    MIN_SHARED,
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)

GUARANTEE = WINNOW_W + WINNOW_K - 1  # minimum detectable shared run


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fps(spark, rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in winnow_fingerprints(_docs(spark, rows)).collect():
        out.setdefault(r.doc_id, set()).add(r.fp)
    return out


def test_shared_run_guarantee(spark):
    """Every shared run of exactly GUARANTEE tokens is detected, for
    several positions of the run inside otherwise-disjoint documents."""
    run = " ".join(f"shared{i}" for i in range(GUARANTEE))
    for pad_a, pad_b in [(0, 0), (3, 7), (11, 2), (0, 9)]:
        a = " ".join(f"alpha{i}" for i in range(pad_a)) + " " + run + " " + \
            " ".join(f"omega{i}" for i in range(8))
        b = " ".join(f"beta{i}" for i in range(pad_b)) + " " + run + " " + \
            " ".join(f"gamma{i}" for i in range(8))
        fps = _fps(spark, [(1, a.strip()), (2, b.strip())])
        assert fps[1] & fps[2], (
            f"shared {GUARANTEE}-token run missed at pads ({pad_a},{pad_b})"
        )


def test_disjoint_docs_share_nothing(spark):
    a = " ".join(f"left{i}" for i in range(30))
    b = " ".join(f"right{i}" for i in range(30))
    fps = _fps(spark, [(1, a), (2, b)])
    assert not (fps[1] & fps[2])


def test_identical_docs_share_everything(spark):
    t = " ".join(f"tok{i % 9}x{i % 4}" for i in range(40))
    fps = _fps(spark, [(1, t), (2, t)])
    assert fps[1] == fps[2] and fps[1]


def test_density_and_short_docs(spark):
    """Winnowing keeps far fewer hashes than one-per-gram, and documents
    shorter than the guarantee window produce no fingerprints (never an
    error)."""
    long_doc = " ".join(f"w{i}" for i in range(200))
    n_grams = 200 - WINNOW_K + 1
    fps = _fps(spark, [(1, long_doc)])
    # expected density ~ 2/(W+1); allow generous slack, but it must
    # be well under keeping every gram
    assert len(fps[1]) < 0.8 * n_grams
    short = _fps(spark, [(2, "a b"), (3, "a b c d e")])
    assert 2 not in short  # < K+W-1 grams → no full window
    assert 3 not in short or short[3]  # boundary doc may legally select


def test_pair_query_finds_planted_dup(spark, tmp_path):
    """End-to-end: the registered query reports a planted near-dup pair
    from a corpus written to parquet (same loader path as the gate)."""
    import pyspark.sql.functions as F

    from sparkroach.queries import QUERIES

    base = " ".join(f"body{i % 7}seg{i % 3}" for i in range(30))
    rows = [(1, base), (2, base + " tail0 tail1")]
    # filler docs with disjoint vocab so caps/filters have material
    rows += [
        (10 + j, " ".join(f"fill{j}w{i}" for i in range(25)))
        for j in range(6)
    ]
    df = _docs(spark, rows).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text"))
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["winnowing_match_pairs"].fn(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r.shared_fps for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] >= MIN_SHARED
    assert all(a == 1 and b == 2 for (a, b) in pairs), pairs


def test_constants_sane():
    assert WINNOW_K >= 2 and WINNOW_W >= 2
    assert 2 <= FP_MAX_DOCS and MIN_SHARED >= 1
