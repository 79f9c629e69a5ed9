"""Physical-plan regression tests: the scale posture of SCALE.md, asserted.

These guard the *shape* of the plans — pushdown reaching the scan, column
pruning, broadcast joins on dimensions, top-k as TakeOrderedAndProject —
so a future edit can't silently regress the 100 TB story while still
passing value checks.
"""

from __future__ import annotations

import re

import pytest

from sparkroach.queries import QUERIES
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: the scan must NOT read l_orderkey/l_partkey/l_suppkey
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "HashAggregate" in plan


def test_q3_broadcasts_and_topk(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2  # customer + orders build sides
    assert "TakeOrderedAndProject" in plan  # top-10 without a global sort
    assert "SortMergeJoin" not in plan


def test_q5_all_dimensions_broadcast(spark):
    plan = _plan(spark, "q5_region_volume")
    # AQE prints initial + adaptive sections, so count is a lower bound
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan


def test_point_lookup_pushes_predicate(spark):
    plan = _plan(spark, "txn_point_lookup")
    assert "EqualTo(o_orderkey,421)" in plan


def test_semijoin_is_left_semi(spark):
    plan = _plan(spark, "participation_semijoin")
    assert "LeftSemi" in plan


def test_desc_keyset_page_is_topk_not_global_sort(spark):
    # descending paging must still be TakeOrderedAndProject (top-k heap),
    # not sort-the-world-then-limit
    plan = _plan(spark, "txn_keyset_page_desc")
    assert "TakeOrderedAndProject" in plan
    assert "l_orderkey" in plan.split("PushedFilters")[1][:300]  # pushed range


def test_minhash_computes_signatures_once(spark):
    # the band table feeds three consumers (bucket counts, under-cap
    # anti-join, over-cap semi-join); capped_band_pairs materializes it
    # ONCE (localCheckpoint — stronger than r3's ReusedExchange: the
    # signature pipeline cannot be re-derived by ANY branch), so the
    # executed plan must read the bands from block-manager scans and
    # contain NO md5 signature recomputation downstream
    df = QUERIES["minhash_lsh_candidates"].fn(spark, SF_SMALL)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in executed or "Scan ExistingRDD" in executed
    assert "md5" not in executed  # signatures were computed before the plan


def test_minhash_has_no_cartesian_product(spark):
    # the LSH path must pair candidates via equi-join on band keys
    plan = _plan(spark, "minhash_lsh_candidates")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_broadcasts_queries_not_corpus(spark):
    plan = _plan(spark, "ann_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the build (broadcast) side must be the filtered query set
    build_idx = plan.find("BroadcastExchange")
    assert build_idx != -1
    assert "vec_id" in plan[build_idx : build_idx + 2000]


# ---------------------------------------------------------------------------
# round-3 additions
# ---------------------------------------------------------------------------


def test_r3_rotated_queries_have_no_quadratic_joins(spark):
    """Every query rotated into the r3 driver window plus the r3 additions:
    no CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    for name in (
        "q7_volume_shipping", "q14_promo_revenue", "q16_supplier_part_count",
        "q19_disjunctive_revenue", "token_quantiles_by_source",
        "text_stopword_quality", "ngram_char_jaccard",
        "doc_rolling_fingerprint", "doc_repetition_stats",
        "gopher_quality_gate", "q13_order_distribution", "q15_top_supplier",
        "q17_small_qty_revenue",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q15_max_is_broadcast_not_sort(spark):
    """The argmax compare must be a 1-row broadcast against the aggregate,
    not a global sort."""
    plan = _plan(spark, "q15_top_supplier")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" not in plan.split("BroadcastHashJoin")[0]
    assert "SortMergeJoin" not in plan


def test_q17_broadcasts_brand_dim_and_pushes_filter(spark):
    plan = _plan(spark, "q17_small_qty_revenue")
    assert "BroadcastHashJoin" in plan
    # the brand equality must reach the part scan as a pushed filter
    assert "EqualTo(p_brand,Brand#23)" in plan
    assert "SortMergeJoin" not in plan


def test_gopher_gate_is_map_only_before_sort(spark):
    """The quality gate must be a single scan + project — its only exchange
    is the output ordering."""
    import re

    plan = _plan(spark, "gopher_quality_gate")
    assert "Join" not in plan
    scans = [
        line for line in plan.splitlines()
        if re.match(r"\(\d+\) Scan parquet", line.strip())
    ]
    assert len(scans) == 1


# ---------------------------------------------------------------------------
# round-4 additions
# ---------------------------------------------------------------------------


def test_capped_band_pairs_has_no_unbounded_window(spark):
    """Bucket-size counting must be the two-stage groupBy.count, not a
    whole-partition window over band keys: an over-cap bucket may only
    pass through STREAMING frames (VERDICT r3 #6).  row_number()/lead()'s
    (UnboundedPreceding, CurrentRow) running frame streams row-by-row and
    is fine; what must never appear is an UnboundedFollowing frame (e.g.
    count() over a partition with no ORDER BY), which buffers the whole
    bucket in one task."""
    plan = _plan(spark, "minhash_lsh_candidates")
    for line in plan.splitlines():
        if "unboundedfollowing" in line.lower():
            raise AssertionError(f"buffering window frame in plan: {line.strip()}")
    # r8: capped_band_pairs is data-adaptive — with no flooded bucket at
    # this SF the over-cap machinery drops out of the plan entirely, so
    # the lead()/broadcast pins moved to a synthetic flooded input below
    # (test_capped_band_pairs_flood_path_keeps_streaming_frames).
    assert "lead(" not in plan  # lean path: no over-cap machinery planned


def test_capped_band_pairs_flood_path_keeps_streaming_frames(spark):
    """With a genuinely flooded bucket the full capped path must plan:
    rank/lead through STREAMING window frames only (no
    UnboundedFollowing buffering), and the over-cap bucket list joining
    by broadcast."""
    from pyspark.sql import functions as F

    from sparkroach.queries.llm_ops import LSH_BUCKET_CAP, capped_band_pairs

    n = LSH_BUCKET_CAP + 8
    bands = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band_idx"),
        F.lit("flood").alias("band_val"),
    )
    df = capped_band_pairs(bands, "doc_id")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    for line in plan.splitlines():
        if "unboundedfollowing" in line.lower():
            raise AssertionError(f"buffering window frame in plan: {line.strip()}")
    # the lead() window survives (streaming frame, linear) …
    assert "lead(" in plan
    # … and the over-cap bucket list joins by broadcast
    assert "BroadcastExchange" in plan


def test_range_join_is_bucketed_hash_join_not_nested_loop(spark):
    """The point-in-interval range join has no equality key; the bucketed
    composition must plan as a hash join on the bucket, never a
    BroadcastNestedLoopJoin / CartesianProduct."""
    plan = _plan(spark, "events_session_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "bucket" in plan


def test_simhash_hamming_pairs_is_banded_not_quadratic(spark):
    """The SimHash pair generator must go through the capped band join
    (hash join on band keys + broadcast over-cap list), never an n²
    cross product; the verify stage joins candidates back by doc id."""
    plan = _plan(spark, "simhash_hamming_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # pairs form through an equi-join on the band keys (r8: with no
    # flooded bucket at this SF the broadcast over-cap list is no longer
    # planned — the flood path's broadcast is pinned separately by
    # test_capped_band_pairs_flood_path_keeps_streaming_frames)
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_funnel_is_one_grouped_pass_with_broadcast_drop_set(spark):
    """quality_filter_funnel: the near-dup drop set joins by broadcast
    (it is tiny by construction) and the per-source accounting is one
    hash aggregate — no sort-merge join against the corpus."""
    plan = _plan(spark, "quality_filter_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_cube_is_one_expand_over_one_scan(spark):
    """CUBE(source, lang) must plan as a single Expand feeding one hash
    aggregate over ONE corpus scan — not four separate scans unioned."""
    import re

    plan = _plan(spark, "docs_grouping_sets")
    assert "Expand" in plan
    scans = [
        line for line in plan.splitlines()
        if re.match(r"\(\d+\) Scan parquet", line.strip())
    ]
    assert len(scans) == 1
    assert "HashAggregate" in plan


def test_unpivot_keeps_zero_rows_and_stays_expand_shaped(spark):
    """The melt must surface explicit zero rows (they exist only in the
    wide form) and plan as a map-side Expand — no extra shuffle, no
    data-dependent distinct scan."""
    from tests.conftest import SF_SMALL as _SF

    df = QUERIES["events_value_unpivot"].fn(spark, _SF)
    rows = df.collect()
    assert any(r.n == 0 for r in rows), "no zero rows — melt is vacuous"
    n_users = len({r.user_id for r in rows})
    assert len(rows) == n_users * 5
    plan = _plan(spark, "events_value_unpivot")
    assert "Expand" in plan
    assert "CartesianProduct" not in plan


# Queries whose fn materializes its result before returning (streaming
# gates, scratch-dir round-trips, multi-consumed graph stages): the
# returned plan is a scan of the materialized output, so there is nothing
# to audit.  Membership REQUIRES a named dedicated test pinning the gate's
# internals ("file.py::test_fn"); test_materialized_pins_are_live asserts
# each pointer resolves, so the escape hatch can't widen silently.
_MATERIALIZED = {
    "bucketed_orders_join":
        "test_analytics11.py::test_bucketed_join_has_no_exchange",
    # continuation wave: driver-assembled / self-materializing gates —
    # the returned plan is a trivial createDataFrame, so the audit
    # would only re-execute the full gate to learn nothing
    "events_ewma_state_streamed":
        "test_llm_ops20.py::test_events_ewma_state_streamed_matches_batch_replay",
    "dup_graph_kcore":
        "test_analytics29.py::test_dup_graph_kcore_gate_invariants",
    "events_minute_acf":
        "test_analytics29.py::test_events_minute_acf_gate_matches_numpy",
    "events_hourly_theil_sen":
        "test_analytics29.py::test_events_hourly_theil_sen_matches_reference",
    "events_mann_whitney_u":
        "test_analytics29.py::test_events_mann_whitney_u_matches_numpy",
    "lineitem_ols_cramer":
        "test_analytics29.py::test_lineitem_ols_matches_numpy_least_squares",
    "user_activity_gini":
        "test_analytics29.py::test_user_activity_gini_gate_matches_numpy",
    "events_markov_stationary":
        "test_analytics29.py::test_markov_stationary_matches_eigenvector",
    "dedup_cc_clusters":
        "test_llm_scale.py::test_cc_clusters_plan_is_bucketed",
    "dedup_streaming_kept":
        "test_streaming_dedup.py::test_stream_matches_batch_twin",
    "documents_format_roundtrip":
        "test_analytics10.py::test_format_roundtrip_checksums_agree_across_formats",
    "documents_orc_roundtrip":
        "test_materialized_pins.py::test_orc_roundtrip_formats_agree",
    "documents_xml_roundtrip":
        "test_materialized_pins.py::test_xml_roundtrip_covers_whole_corpus",
    "events_dynamic_partition_overwrite":
        "test_materialized_pins.py::test_dynamic_partition_overwrite_touches_only_target_day",
    "events_dedup_jitter_streamed":
        "test_streaming_events.py::test_dedup_jitter_collapses_what_plain_dedup_cannot",
    "events_dedup_streamed":
        "test_materialized_pins.py::test_dedup_streamed_collapses_redelivery_exactly",
    "events_join_streamed":
        "test_streaming_events.py::test_stream_stream_join_restart_cut_straddles_a_pair",
    "events_left_join_streamed":
        "test_llm_ops4.py::test_left_join_streamed_emits_null_rows_and_matches_batch",
    "documents_schema_evolution":
        "test_materialized_pins.py::test_schema_evolution_null_fills_old_generation",
    "events_partitioned_read":
        "test_analytics11.py::test_partitioned_read_prunes",
    "events_rollup_streamed":
        "test_streaming_events.py::test_windowed_rollup_with_watermark",
    "events_rollup_update_streamed":
        "test_streaming_events.py::test_update_mode_straddling_hour_is_nonvacuous",
    "events_sessions_streamed":
        "test_streaming_events.py::test_sessions_streamed_equals_batch_twin",
    "events_topk_per_user_streamed":
        "test_streaming_events.py::test_topk_streamed_equals_batch_rank_window",
    "events_stream_static_join":
        "test_materialized_pins.py::test_stream_static_join_equals_batch_enrichment",
    "events_dedup_then_rollup_streamed":
        "test_materialized_pins.py::test_dedup_then_rollup_equals_batch_rollup_of_original",
    "events_full_join_streamed":
        "test_materialized_pins.py::test_full_join_streamed_null_extends_both_sides",
    "events_sessions_timeout_streamed":
        "test_materialized_pins.py::test_sessions_timeout_streamed_matches_batch_twin",
    "hll_streaming_merge":
        "test_sketches.py::test_streaming_hll_equals_batch_sketch",
    "knn_graph_ivf":
        "test_llm_ops4.py::test_knn_graph_rank_contract",
    "lineitem_zorder_read":
        "test_zorder.py::test_zorder_prunes_more_files_than_linear_sort",
    "lsh_recall_report":
        "test_materialized_pins.py::test_lsh_recall_report_bounds",
    "documents_shard_export":
        "test_materialized_pins.py::test_shard_export_manifest_is_a_partition_of_the_corpus",
    "multimodal_binaryfile_ingest":
        "test_analytics22.py::test_binaryfile_ingest_equals_mapinpandas_lane",
    "documents_text_source_roundtrip":
        "test_analytics22.py::test_text_roundtrip_preconditions_and_checksums",
    "documents_sql_ddl_roundtrip":
        "test_analytics23.py::test_ddl_roundtrip_content_and_rerun_idempotence",
    "events_zone_map_report":
        "test_analytics28.py::test_zone_map_report_sorted_layout_properties",
    "documents_zip_shard_ingest":
        "test_llm_ops19.py::test_zip_gate_pin",
}


def test_materialized_pins_are_live():
    """Every _MATERIALIZED entry must point at an existing dedicated test
    function — joining the skip list without one is a test failure."""
    import os
    import re

    here = os.path.dirname(__file__)
    for name, pin in sorted(_MATERIALIZED.items()):
        fname, _, fn = pin.partition("::")
        path = os.path.join(here, fname)
        assert os.path.exists(path), f"{name}: pin file {fname} missing"
        with open(path) as f:
            src = f.read()
        assert re.search(rf"^def {re.escape(fn)}\(", src, re.M), (
            f"{name}: pin test {pin} not found — a _MATERIALIZED entry "
            "must name a live dedicated test"
        )

# Queries where BroadcastNestedLoopJoin is the CORRECT plan: every one is
# a crossJoin against a one-row aggregate (global scalar: totals, bounds,
# thresholds) or a broadcast query/probe set bounded by a constant — the
# shapes the r3 verdict audited as safe.  A BNLJ anywhere else is a bug.
_SCALAR_BNLJ_OK = {
    "ann_cosine_topk", "ann_int8_quantized", "ann_ivf_kmeans",
    "bm25_top_docs",  # crossJoin against the 1-row (N, total_len) stats
    "ann_ivf_multiprobe", "ann_ivfpq_adc", "ann_pq_adc", "ann_recall_report",
    # r7 dial: inherits multiprobe's bounded centroid-ranking crossJoin
    # (queries x nlist-bounded centroid table, the ann_ivf_multiprobe shape)
    "ann_ivfpq_rerank",
    "bpe_second_merge",  # crossJoin against the 1-row learned merge
    "chain_end_to_end", "domain_mix_weights", "events_funnel_conversion",
    "events_gap_fill", "hist_quantile_sketch", "hll_distinct_sketch",
    "kmv_type_jaccard", "pagerank_dup_graph", "q11_important_stock",
    "q22_global_sales_opportunity", "suppkey_skew_report",
    "temperature_mix_weights", "temperature_sample_by_lang",
    "term_cooccurrence_lift", "tfidf_top_terms",
    # 1-row peak/count aggregates joined back (scalar build sides)
    "sessions_concurrency_peak",
    # 1-row bounds/totals/max scalars joined back at three stages
    "events_value_ks_drift",
    # 1-row bounds/grand scalars + a 2-row constant grp frame
    "events_type_drift_chi2",
    "cms_join_size_estimate",  # 1-row est x 1-row exact crossJoin
    # 8-row x 8-row broadcast pair join over the top-8 user bitmaps:
    # build side bounded by the TOP_USERS constant, never by data size
    "user_activity_bitmap_pairs",
    # r7 wave 8+: 1-row scalar cross joins
    "bpe_encode_apply",  # 1-row stats x 1-row top-pieces string
    "epoch_shuffle_order",  # 1-row census x 1-row head8 string
    "mmr_diversified_topk",  # corpus x 1-row broadcast query vector
    # source-cardinality table x 1-row total, then x 1-row leftover
    "source_budget_apportion",
    # 9-digit frame x 1-row corpus-count scalar
    "orders_benford_audit",
    # prefix-scanned stream x 1-row global-max scalar (peak argmin)
    "events_cusum_drift",
    # r8 wave: 1-row x 1-row bookkeeping crossJoins
    "events_ordered_funnel_maxgap",  # three 1-row step counts fused
    "dup_graph_triangles",  # stats x edges x triangles scalars
    "search_ndcg_report",  # 1-row DCG x 1-row IDCG
    # continuation wave: 1-row x 1-row bookkeeping crossJoins
    "events_ams_f2_sketch",  # 1-row exact F2 x 1-row median estimate
    "events_hilbert_locality_report",  # 1-row stats x 1-row path sums x2
    "lm_kneser_ney_bigram",  # vocab x vocab grid (literal KN_VOCAB bound)
    "events_sax_quantile_words",  # segments x 1-row quartile cuts
}


# Queries where an EMPTY-partition-spec Window is the CORRECT plan: every
# one runs over a PROVABLY BOUNDED input — a charset²-bounded BPE pair
# table, a literal-bounded top-N survivor set (the window sits above an
# upstream .limit()), a histogram-bucket or source-cardinality aggregate —
# never over corpus/vocab-scaled data.  `events_user_value_ntiles` is the
# documented exception: percent_rank/cume_dist genuinely need the total
# order and its docstring names the mitigation (r7 verdict adjudication).
# An empty-partition window anywhere else serializes unbounded data
# through ONE WindowExec task at scale and is a bug (verdict r7
# What's-wrong #2).
_GLOBAL_WINDOW_OK = {
    "bpe_pair_counts",  # charset²-bounded pair table
    "bpe_second_merge",  # charset²-bounded pair table, two iterations
    "events_hilbert_locality_report",  # ordering windows over the
    # literal-bounded 256×256 occupied-cell table (≤ 65536 rows ever)
    "events_sax_quantile_words",  # rank over the time-bounded PAA
    # segment table (≤ ~120 rows at the 30-day corpus)
    "events_hourly_theil_sen",  # pair/point sets are time-bounded (≤2000
    # hourly points guarded in the query; ~260k pairs whatever the corpus)
    "events_user_value_ntiles",  # total order is the semantics; documented
    "hist_quantile_sketch",  # histogram-bucket-bounded aggregate
    "source_budget_apportion",  # source-cardinality-bounded (≤ dozens)
    "suppkey_skew_report",  # rank over the ≤SKEW_TOP post-limit survivors
    "hybrid_rrf_fusion",  # ranks over the two ≤RRF_DEPTH post-limit lists
    "search_ndcg_report",  # ranks over the two ≤NDCG_AT post-limit lists
}


def _empty_partition_windows(df) -> list[str]:
    """Window nodes with an empty partitionSpec in the optimized logical
    plan — the shape that executes as a single-partition WindowExec."""
    out = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            out.append(node.simpleString(120))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


@pytest.mark.soak
def test_every_registered_query_plan_is_scale_safe(spark):
    """Universal plan audit: NO CartesianProduct anywhere in the registry,
    BroadcastNestedLoopJoin only in the documented scalar-join whitelist,
    and empty-partition-spec Window nodes only in the documented
    bounded-input whitelist.  New queries are audited automatically the
    moment they register — a quadratic join or a single-partition global
    window can't slip in unlisted."""
    audited = 0
    for name, q in sorted(QUERIES.items()):
        if name in _MATERIALIZED:
            continue
        df = QUERIES[name].fn(spark, SF_SMALL)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "CartesianProduct" not in plan, name
        if name not in _SCALAR_BNLJ_OK:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name}: unlisted BroadcastNestedLoopJoin — either fix the "
                "join or document it in _SCALAR_BNLJ_OK with its scalar side"
            )
        if name not in _GLOBAL_WINDOW_OK:
            w = _empty_partition_windows(df)
            assert not w, (
                f"{name}: unlisted empty-partition-spec Window {w} — "
                "either rewrite it (TakeOrdered top-k / distributed "
                "global_row_number / running_global_sum) or document the "
                "bounded input in _GLOBAL_WINDOW_OK"
            )
        audited += 1
    assert audited >= 100  # the registry keeps growing; never silently shrink


def test_aqe_promotes_smj_to_broadcast_at_runtime(spark):
    """SCALE.md's AQE claim, asserted: with STATIC broadcast planning
    disabled (threshold −1), a join whose build side only turns out to
    be small at RUNTIME (post-filter) must still end up a
    BroadcastHashJoin — AQE replans from the finished stage's actual
    size.  This is the mechanism that saves the 100 TB plan when
    cardinality estimates are wrong, which at that scale they always
    eventually are."""
    from pyspark.sql import functions as F

    from sparkroach.tables import load

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10485760",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load(spark, SF_SMALL, "lineitem")
        # tiny at runtime, opaque to static planning (no stats on the
        # filtered subset)
        hot = load(spark, SF_SMALL, "orders").where(
            F.col("o_totalprice") > 400000
        ).select("o_orderkey", "o_orderdate")
        joined = li.join(hot, li.l_orderkey == hot.o_orderkey).agg(
            F.count("*").alias("n")
        )
        joined.collect()  # materialize so AQE finalizes the plan
        printed = joined._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan isFinalPlan=true" in printed
        # the printout carries BOTH plans: the final (replanned) one first,
        # then the "== Initial Plan ==" section.  The initial plan MUST
        # show the SortMergeJoin (proving static planning really did pick
        # SMJ) and the final one must not.
        final, initial = printed.split("== Initial Plan ==", 1)
        assert "BroadcastHashJoin" in final
        assert "SortMergeJoin" not in final
        assert "SortMergeJoin" in initial
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_partition_at_runtime(spark):
    """The OTHER half of the skew playbook (SCALE.md): salting
    (salted_hot_key_join) is the manual recipe; AQE's skew-join split is
    the automatic one.  With split thresholds scaled to the fixture, a
    join keyed so ~90% of rows share one key must replan to
    SortMergeJoin(skew=true) with an AQEShuffleRead marked `skewed` —
    the oversized partition is split into advisory-sized slices joined
    against a replicated build side, no code change."""
    from pyspark.sql import functions as F

    from sparkroach.tables import load
    from tests.conftest import SF_GATE

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4096",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2048",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load(spark, SF_GATE, "lineitem")
        skewed = li.withColumn(
            "jk",
            F.when(F.col("l_orderkey") % 10 != 0, F.lit(1)).otherwise(
                F.col("l_orderkey")
            ),
        )
        right = li.select(
            F.col("l_orderkey").alias("jk"), F.col("l_quantity").alias("q2")
        )
        j = skewed.join(right, "jk").agg(F.count("*").alias("n"))
        j.collect()
        printed = j._jdf.queryExecution().executedPlan().toString()
        final = printed.split("== Initial Plan ==", 1)[0]
        # The pinned behavior is the SPLIT, not the join flavor: with the
        # session's maxShuffledHashJoinLocalMapThreshold the tiny
        # fixture's SMJ is legitimately rewritten to shuffled-hash at
        # runtime, and AQE's OptimizeSkewedJoin splits either kind.
        assert re.search(r"(SortMergeJoin|ShuffledHashJoin).*\(skew=true\)", final), final
        assert "skewed" in final  # the AQEShuffleRead split marker
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_engine_injects_runtime_bloom_filter(spark):
    """The engine-side complement of bloom_semijoin_prune (sketches.py):
    Spark's runtime row-level filter injects a bloom_filter_might_contain
    probe on the fact side of a selective join, pruning shuffle input
    before the join — the same construct our from-scratch operator
    builds, here produced by the optimizer itself once the size
    thresholds admit the fixture."""
    from pyspark.sql import functions as F

    from sparkroach.tables import load
    from tests.conftest import SF_GATE

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "104857600",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load(spark, SF_GATE, "lineitem")
        hot = load(spark, SF_GATE, "orders").where(
            F.col("o_totalprice") > 300000
        ).select("o_orderkey")
        j = li.join(hot, li.l_orderkey == hot.o_orderkey).agg(
            F.count("*").alias("n")
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "might_contain" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_max_partition_bytes_controls_scan_parallelism(spark):
    """SCALE.md's sizing claim, asserted: spark.sql.files.maxPartitionBytes
    is the knob that decides how many tasks a scan fans out to — shrink
    it and the same file set must split into strictly more input
    partitions (how we'd right-size partitions to executor memory at a
    bigger SF)."""
    from sparkroach.tables import load
    from tests.conftest import SF_GATE

    key = "spark.sql.files.maxPartitionBytes"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, str(128 * 1024 * 1024))
        wide = load(spark, SF_GATE, "lineitem").rdd.getNumPartitions()
        spark.conf.set(key, str(256 * 1024))
        narrow = load(spark, SF_GATE, "lineitem").rdd.getNumPartitions()
        assert narrow > wide, (narrow, wide)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_cbo_stats_reorder_joins(spark):
    """Cost-based optimization pin (complements the AQE runtime pins):
    with ANALYZE'd column statistics on catalog tables, enabling CBO +
    joinReorder must rewrite a deliberately bad join order (fact table
    first) into dimension-first — the static-planning lever that, at
    100 TB, composes with AQE: CBO fixes the join ORDER from stats
    before execution, AQE fixes strategies/skew from runtime sizes."""
    import re

    sf = SF_SMALL
    tables = ("nation", "customer", "orders")
    for t in tables:
        spark.read.parquet(f"{sf}/{t}.parquet").write.mode(
            "overwrite"
        ).saveAsTable(f"cbo_{t}")
        spark.sql(f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    q = """
        SELECT n.n_name, count(*) AS n
        FROM cbo_orders o
        JOIN cbo_customer c ON c.c_custkey = o.o_custkey
        JOIN cbo_nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
    """

    def scan_order(enabled: str) -> list[str]:
        prev = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.cbo.enabled",
                "spark.sql.cbo.joinReorder.enabled",
            )
        }
        spark.conf.set("spark.sql.cbo.enabled", enabled)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", enabled)
        try:
            plan = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        seen: list[str] = []
        for t in re.findall(r"cbo_(\w+)", plan):
            if t not in seen:
                seen.append(t)
        return seen

    try:
        baseline = scan_order("false")
        reordered = scan_order("true")
        # without CBO the plan follows the written (fact-first) order
        assert baseline[0] == "orders", baseline
        # with stats + CBO the fact table moves off the front: the
        # optimizer builds the small dimension side first
        assert reordered[0] != "orders", reordered
        assert set(reordered) == {"orders", "customer", "nation"}
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")


# ---------------------------------------------------------------------------
# round-7 additions
# ---------------------------------------------------------------------------


def test_pii_scrub_is_map_only_before_sort(spark):
    """The PII scrub must be one scan + projected regex work — no join,
    no aggregation exchange; the only exchange is the output ordering.
    At 100 TB this is the per-row pre-tokenization pass and any shuffle
    here would be pure waste."""
    import re

    plan = _plan(spark, "pii_scrub_report")
    assert "Join" not in plan
    scans = [
        line for line in plan.splitlines()
        if re.match(r"\(\d+\) Scan parquet", line.strip())
    ]
    assert len(scans) == 1


def test_incremental_dedup_joins_are_hash_equi_joins(spark):
    """Batch-vs-index candidate generation must pair through band-key
    EQUI-joins (hash-partitioned), never a nested-loop or cartesian —
    the whole point of the stored index is that the old corpus is only
    ever touched through its band keys."""
    plan = _plan(spark, "dedup_incremental_new_docs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_winnowing_fps_window_is_per_doc_partitioned(spark):
    """Winnowing's window-min selection must run inside per-document
    partitions (hashpartitioning on doc_id) — a single-partition window
    here would serialize the whole corpus through one task at 100 TB."""
    from sparkroach.queries.llm_ops8 import winnow_fingerprints
    from sparkroach.tables import load

    df = winnow_fingerprints(load(spark, SF_SMALL, "documents"))
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(doc_id" in plan


def test_winnowing_pairs_plan_is_bounded_and_pays_fps_once(spark):
    """The pair stage must (a) pair only through fingerprint EQUI-joins
    (never nested-loop/cartesian — the frequency cap exists so buckets
    are joinable), (b) end in TakeOrderedAndProject (bounded report, no
    global sort), and (c) reuse the checkpointed fingerprint stage
    instead of re-deriving the explode+window work per consumer (three
    consumers: census + both join sides)."""
    plan = _plan(spark, "winnowing_match_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Scan parquet" not in plan  # all sides read the checkpoint


def test_census_windows_are_keyed_never_global(spark):
    """r8 ADVICE pin: the frequency-census windows the r8 optimization
    introduced (winnowing `count over (partition by fp)`, passage-dedup
    `min/max over (partition by ph)`) must stay partitioned by the hash
    key — hashpartitioning, never an Exchange SinglePartition — so the
    buffered unit is one fingerprint/passage group, not the corpus.  The
    residual skew posture is documented at the call sites: a boilerplate
    flood key funnels its group through one window task's buffer, the
    rows are ~50-byte (id, hash) pairs, and the group is bounded by the
    corpus' duplication structure; if profiling at scale ever shows a
    flood group dominating, the fallback is the pre-r8 map-side-partial
    groupBy census + join-back (more exchanges, flood-immune)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkroach.queries.llm_ops8 import winnow_fingerprints
    from sparkroach.tables import load

    # passage_dedup_exact: the ph census window is in the returned plan
    plan = _plan(spark, "passage_dedup_exact")
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(ph" in plan

    # winnowing_match_pairs: the fp census sits ABOVE a localCheckpoint
    # (the final plan reads the checkpoint RDD), so assert on the
    # pre-checkpoint census frame the query builds
    fps = winnow_fingerprints(load(spark, SF_SMALL, "documents"))
    census = fps.withColumn(
        "df", F.count("*").over(Window.partitionBy("fp"))
    )
    plan = census._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(fp" in plan
