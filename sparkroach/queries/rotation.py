"""Driver-gate rotation windows.

The driver records a bounded number of registry entries per round
(:data:`sparkroach.queries.registry.DRIVER_WINDOW` = 50), while the
registry holds 200+ operators.  Rounds therefore ROTATE which queries
occupy the recorded window; everything else stays registered and is
swept by the LOCAL oracle gate (tests/test_oracle_gate.py,
``python -m sparkroach.oracle``) at sf0.001/0.01/0.1 every round.

Up to round 4 the rotation was expressed as per-``register()`` ``gated=``
flags scattered across ~35 modules; from round 5 on the window is this
single authoritative name list, applied over the registry after all
modules import (``sparkroach/queries/__init__.py``).  The per-call
``gated=`` flag remains only as documentation of each query's default
disposition and as the fallback when no window is pinned.

The r5 window below is exactly the 49 never-driver-recorded queries
pinned in COVERAGE.md (r5 rotation candidates) plus the rows-only
``chain_end_to_end`` — 50 names, filling the window and giving a first
driver recording to the entire backlog-eligible set.
"""

from __future__ import annotations

# Round-5 driver window: 49 oracle-bearing first-recordings + the
# rows-only chain_end_to_end (value-checked by tests/test_chain_end_to_end.py).
R5_WINDOW: frozenset[str] = frozenset(
    {
        "ann_ivfpq_adc",
        "bigram_top_transitions",
        "bpe_pair_counts",
        "bucketed_orders_join",
        "clean_corpus_report",
        "cross_source_dup_matrix",
        "customer_order_state_asof",
        "dataset_card_stats",
        "dedup_keep_best",
        "doc_rarity_score",
        "docs_grouping_sets",
        "documents_format_roundtrip",
        "documents_orc_roundtrip",
        "documents_quality_expectations",
        "dup_span_coverage",
        "events_dedup_jitter_streamed",
        "events_gap_fill",
        "events_incremental_rollup",
        "events_null_semantics_report",
        "events_partitioned_read",
        "events_peak_window",
        "events_props_stats",
        "events_rollup_update_streamed",
        "events_session_bookends",
        "events_session_range_join",
        "events_session_window_builtin",
        "events_type_pivot",
        "events_type_transitions",
        "events_user_value_ntiles",
        "events_value_unpivot",
        "events_value_winsorize",
        "fixed_size_sample_per_source",
        "hll_sketch_merge",
        "inverted_index_postings",
        "kmv_type_jaccard",
        "label_centroid_drift",
        "lsh_band_selectivity",
        "multimodal_frame_sample",
        "multimodal_resize",
        "quality_filter_funnel",
        "salted_hot_key_join",
        "simhash_hamming_pairs",
        "sql_front_door_pricing",
        "suppkey_skew_report",
        "temperature_mix_weights",
        "temperature_sample_by_lang",
        "term_cooccurrence_lift",
        "tfidf_top_terms",
        "user_daily_activity_full_outer",
        # rows-only by design; value-checked in tests/test_chain_end_to_end.py
        "chain_end_to_end",
    }
)

# The window applied this round.
ACTIVE_WINDOW: frozenset[str] | None = R5_WINDOW


def apply_rotation(queries: dict) -> None:
    """Override per-call ``gated=`` flags with the pinned window.

    Mutates ``queries`` in place (Query is frozen — entries are replaced).
    Raises if a pinned name is missing from the registry so a typo in the
    window list fails loudly at import, not silently at gate time.
    """
    import dataclasses

    if ACTIVE_WINDOW is None:
        return
    missing = ACTIVE_WINDOW - queries.keys()
    if missing:
        raise KeyError(
            f"rotation window names not in registry: {sorted(missing)}"
        )
    for name, q in list(queries.items()):
        want = name in ACTIVE_WINDOW
        if q.gated != want:
            queries[name] = dataclasses.replace(q, gated=want)
