"""Unit tests for llm_ops11: robots.txt longest-match semantics and the
power-iteration principal direction (semantic claims the cross-engine
oracle alone can't distinguish from a shared mistake)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL


def test_robots_longest_match_semantics(spark):
    """Pin RFC 9309 §2.2.2 on literal cases: longest rule wins, allow
    wins a length tie, no match defaults to allow."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rules = spark.createDataFrame(
        [
            (1, "disallow", "/a"),
            (1, "allow", "/a/b"),
            (1, "disallow", "/a/b/c"),
            (2, "allow", "/x"),
            (2, "disallow", "/x"),  # exact length tie: allow must win
        ],
        "host_id long, rule string, rule_path string",
    )
    urls = spark.createDataFrame(
        [
            (0, 1, "/a/z"),      # matches /a only → disallow
            (1, 1, "/a/b/z"),    # /a/b beats /a → allow
            (2, 1, "/a/b/c/z"),  # /a/b/c beats /a/b → disallow
            (3, 1, "/other"),    # no match → allow
            (4, 2, "/x/q"),      # tie at /x → allow wins
        ],
        "doc_id long, host_id long, path string",
    )
    m = urls.join(
        F.broadcast(rules),
        (urls["host_id"] == rules["host_id"])
        & F.expr("startswith(path, rule_path)"),
    ).select("doc_id", "rule", "rule_path")
    w = Window.partitionBy("doc_id").orderBy(
        F.length("rule_path").desc(),
        F.when(F.col("rule") == "allow", 0).otherwise(1),
        F.col("rule_path"),
    )
    winner = (
        m.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("doc_id", "rule")
    )
    got = {
        r["doc_id"]: r["rule"]
        for r in urls.join(winner, "doc_id", "left").select(
            "doc_id", F.coalesce("rule", F.lit("allow")).alias("rule")
        ).collect()
    }
    assert got == {
        0: "disallow",
        1: "allow",
        2: "disallow",
        3: "allow",
        4: "allow",
    }


def test_robots_filter_splits_population(spark):
    from sparkroach.queries.llm_ops11 import robots_disallow_filter

    rows = robots_disallow_filter(spark, SF_SMALL).collect()
    verdicts = {r["allowed"] for r in rows}
    assert verdicts == {True, False}
    # every doc got exactly one verdict
    assert len(rows) == len({r["doc_id"] for r in rows})


def test_power_iteration_finds_planted_pc1(spark, tmp_path):
    """The integer-exact pipeline must actually converge toward the top
    eigenvector of Q^T Q — correctness of the MATH, not just
    cross-engine agreement.  The stock corpus is near-isotropic
    (lambda1/lambda2 ~ 1.07, measured), where NO 3-step power method
    converges, so the test plants a corpus with a dominant direction
    (rank-1 spike + noise) and asserts |cos| > 0.99 against numpy's
    eigendecomposition of the SAME quantized matrix."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkroach.queries.llm_ops11 import (
        _PI_Q,
        embedding_power_iteration_pc1,
    )

    rng = np.random.default_rng(11)
    dim, n = 64, 400
    w = rng.normal(size=dim)
    w /= np.linalg.norm(w)
    x = (
        rng.normal(size=(n, 1)) * 0.4 * w[None, :]
        + rng.normal(size=(n, dim)) * 0.05
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in x], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * n, pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    rows = embedding_power_iteration_pc1(spark, str(tmp_path)).collect()
    v = np.array(
        [r["v_fixed"] for r in sorted(rows, key=lambda r: r["dim_idx"])],
        dtype=np.float64,
    )
    q = np.floor(x.astype(np.float64) * _PI_Q)
    evals, evecs = np.linalg.eigh(q.T @ q)
    assert evals[-1] / evals[-2] > 3, "planting failed to create a gap"
    pc1 = evecs[:, -1]
    cos = abs(v @ pc1) / (np.linalg.norm(v) * np.linalg.norm(pc1))
    assert cos > 0.99, cos


def test_power_iteration_floor_div_negative_agreement():
    """The floor-division spelling must agree across engines for
    NEGATIVE numerators (the reason it isn't a bare div/;//)."""
    import duckdb

    from sparkroach.queries.llm_ops11 import _fd_duck

    con = duckdb.connect()
    for a in (-5000, -1, 0, 1, 4097, -4097):
        duck = con.execute(
            f"SELECT {_fd_duck(f'({a})', '4096')}"
        ).fetchone()[0]
        # reference semantics: exact floor division (Python's //)
        assert duck == a // 4096, a
        assert duck == int(np.floor(a / 4096)), a
    con.close()
