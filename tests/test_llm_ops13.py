"""Unit tests for llm_ops13: kappa identity/sign behavior on controlled
raters, Hamilton apportionment exactness under adversarial remainders,
and fertility arithmetic on literal docs."""

from __future__ import annotations

from pyspark.sql import functions as F


def _kappa_from_labels(spark, pairs):
    """Compute kappa with the module's exact integer formula from
    (ra, rb) label pairs — the same arithmetic, driven directly."""
    df = spark.createDataFrame(pairs, "ra int, rb int")
    cell = df.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("long").alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("long").alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb")))
        .cast("long")
        .alias("n00"),
    )
    pe = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    return cell.select(
        (
            (F.col("n") * (F.col("n11") + F.col("n00")) - pe).cast("double")
            / (F.col("n") * F.col("n") - pe).cast("double")
        ).alias("kappa")
    ).collect()[0]["kappa"]


def test_kappa_identical_raters_is_one(spark):
    assert _kappa_from_labels(
        spark, [(1, 1), (0, 0), (1, 1), (0, 0), (1, 1)]
    ) == 1.0


def test_kappa_inverted_raters_is_negative(spark):
    k = _kappa_from_labels(spark, [(1, 0), (0, 1), (1, 0), (0, 1)])
    assert k == -1.0


def test_kappa_chance_level_agreement_is_zero(spark):
    # independent raters with 50/50 marginals, observed agreement
    # exactly at chance: po = pe = 0.5 → kappa = 0
    k = _kappa_from_labels(spark, [(1, 1), (1, 0), (0, 1), (0, 0)])
    assert k == 0.0


def test_apportionment_sums_to_budget_exactly(spark, monkeypatch):
    """Adversarial source sizes whose proportional shares all carry
    fractional parts: Σ quota must equal B exactly and each quota must
    be within 1 of its floor share (Hamilton's quota property)."""
    import sparkroach.queries.llm_ops13 as m

    sizes = {"s01": 7, "s02": 13, "s03": 29, "s04": 101, "s05": 3}
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"w{i}", "en", src, 3))
            i += 1

    def fake_load(spark_, sf_dir, name):
        return spark_.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )

    monkeypatch.setattr(m, "load", fake_load)
    got = m.source_budget_apportion(spark, "ignored").collect()
    total = sum(sizes.values())
    B = m._APPORTION_BUDGET
    assert sum(r["quota"] for r in got) == B
    for r in got:
        base = (B * sizes[r["source"]]) // total
        assert r["quota_base"] == base
        assert r["quota"] in (base, base + 1)


def test_fertility_arithmetic_on_literal_docs(spark, monkeypatch):
    """'ab1 cd' → pieces [ab][1][cd] = 3, words 2, bytes 6;
    fertility 1.5, bytes_per_piece 2.0."""
    import sparkroach.queries.llm_ops13 as m

    def fake_load(spark_, sf_dir, name):
        return spark_.createDataFrame(
            [(0, "ab1 cd", "xx", "s", 6), (1, "e f", "yy", "s", 3)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )

    monkeypatch.setattr(m, "load", fake_load)
    got = {r["lang"]: r for r in m.tokenizer_fertility_report(
        spark, "ignored"
    ).collect()}
    xx = got["xx"]
    assert (xx["n_pieces"], xx["n_words"], xx["n_bytes"]) == (3, 2, 6)
    assert xx["fertility"] == 1.5
    assert xx["bytes_per_piece"] == 2.0
    yy = got["yy"]
    assert (yy["n_pieces"], yy["n_words"], yy["n_bytes"]) == (2, 2, 3)
