"""Pins for the salted join: the hot key is genuinely hot, and the
salted rewrite returns exactly the unsalted join's answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkroach.queries.analytics15 import salted_hot_key_join
from sparkroach.tables import load
from tests.conftest import SF_SMALL


def test_hot_key_is_hot_and_rewrite_is_lossless(spark):
    ev = load(spark, SF_SMALL, "events")
    key = F.when(F.pmod("user_id", F.lit(10)) == 0, F.lit(0)).otherwise(
        F.col("user_id")
    )
    freqs = {
        r["join_key"]: r["n"]
        for r in ev.select(key.alias("join_key"))
        .groupBy("join_key")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # key 0 must dominate every individual normal key (that's the skew)
    assert 0 in freqs
    assert all(freqs[0] > n for k, n in freqs.items() if k != 0)

    # unsalted reference join, same aggregate — must match exactly
    fact = ev.select(key.alias("join_key"), "value")
    dim = ev.select(
        key.alias("join_key"),
        F.when(F.pmod("user_id", F.lit(10)) == 0, "hot")
        .otherwise("normal")
        .alias("key_class"),
    ).distinct()
    plain = {
        r["key_class"]: (r["n_rows"], r["n_keys"], r["total_value"])
        for r in fact.join(dim, "join_key")
        .groupBy("key_class")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct("join_key").cast("long").alias("n_keys"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    salted = {
        r["key_class"]: (r["n_rows"], r["n_keys"], r["total_value"])
        for r in salted_hot_key_join(spark, SF_SMALL).collect()
    }
    assert salted == plain
