"""Physical-plan pins for the r7 wave-8+ operators: the skyline's
no-self-join shape, MMR's bounded-shortlist stage, linkage's single
block-key join, and the substring scan's map-only single pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkroach.queries import QUERIES
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_pareto_frontier_never_forms_a_pair(spark):
    """The oracle is the O(n²) NOT-EXISTS; the Spark plan must not be —
    no nested-loop or cartesian anywhere, the join-back is broadcast,
    and no single-partition global window survives."""
    plan = _plan(spark, "part_pareto_frontier")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_linkage_is_one_equi_join_on_the_block_key(spark):
    plan = _plan(spark, "customer_record_linkage")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # nation-block equi-join (small side broadcasts at test SF; at scale
    # AQE picks SMJ — either way it is an equi-join, never a theta join)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_mmr_pool_is_take_ordered_not_global_sort(spark):
    """The distributed stage of MMR must shortlist via
    TakeOrderedAndProject (top-N without a global sort) with the query
    vector broadcast, never shuffling the corpus."""
    import sparkroach.queries.llm_ops14 as m
    from sparkroach.tables import load

    e = load(spark, SF_SMALL, "embeddings")
    qe = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * m._MMR_Q).cast("long"),
    )
    base = e.select("vec_id", qe.alias("qe"))
    qv = base.filter(F.col("vec_id") == m._MMR_QUERY_ID).select(
        F.col("qe").alias("qq")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("qq"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pool = (
        base.filter(F.col("vec_id") != m._MMR_QUERY_ID)
        .join(F.broadcast(qv))
        .select("vec_id", dot.alias("rel"), "qe")
        .orderBy(F.desc("rel"), "vec_id")
        .limit(m._MMR_POOL)
    )
    plan = pool._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_substring_scan_is_one_scan_map_only_before_census(spark):
    plan = _plan(spark, "substring_denylist_scan")
    # one parquet scan feeding a generate(stack)+aggregate — no joins
    # (formatted mode lists each node twice: tree + details)
    assert plan.count("Scan parquet") == 2
    assert "Generate" in plan  # the stack() unpivot
    for bad in ("Join", "CartesianProduct", "Window"):
        assert bad not in plan, bad


def test_epoch_shuffle_is_shuffle_free_map_plus_census(spark):
    plan = _plan(spark, "epoch_shuffle_order")
    # the Feistel position is pure projection; the only join is the
    # whitelisted broadcast cross of two single-row aggregates (census ×
    # head8) — no window, no SMJ, no cartesian of data rows
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # census + head8 branches (each node listed twice in formatted mode);
    # the head8 branch must shortlist via TakeOrderedAndProject
    assert plan.count("Scan parquet") <= 4
    assert "TakeOrderedAndProject" in plan
