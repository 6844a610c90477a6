"""Pins the driver-contract shape of __spark_entry__:

* the first 50 registry entries (the driver's CORRECTNESS window) are all
  oracled and are exactly the 50 distinct operators in _PRIORITY[:50];
* every oracled entry, demoted or not, still has a runnable SQL twin;
* _PRIORITY names only real registry entries (no typo'd reorder).
"""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_priority_names_are_registry_entries():
    missing = [n for n in entry_mod._PRIORITY if n not in entry_mod._REGISTRY]
    assert missing == []


def test_driver_window_is_all_oracled():
    names = list(entry_mod._REGISTRY)
    window = names[: entry_mod._DRIVER_WINDOW]
    oracle = entry_mod.oracle_sql()
    unoracled = [n for n in window if n not in oracle]
    assert unoracled == [], f"rows-only entries inside the driver window: {unoracled}"


def test_driver_window_matches_priority_prefix():
    names = list(entry_mod._REGISTRY)
    assert names[: entry_mod._DRIVER_WINDOW] == entry_mod._PRIORITY[:50]


def test_flagship_new_components_have_driver_rows():
    """VERDICT r2 #1 / r4: each round's flagship components must sit inside
    the driver's recorded window.  entity_users_get_or_create (r2) was
    demoted in r4 — its anti-join get-or-create machinery is driver-covered
    by the in-window j6_get_or_create_anti twin — to make room for the r4
    flagships below."""
    window = set(list(entry_mod._REGISTRY)[: entry_mod._DRIVER_WINDOW])
    for name in (
        "ann_cosine_topk",
        "s5_batched_lookup",
        "u1_handler_dispatch",
        "entity_balances_replay",
        # r5s1: backfill_reindex_progress rotated out (its oracle is a
        # per-chunk groupBy count — a5's physics; the machinery is
        # pytest-pinned in test_backfill.py); the slot carries the r5
        # GraphQL string-front-end flagship
        "qb_graphql_string",
        # r4 flagships (r5s1 rotations: embedding_near_dup ->
        # ann_cosine_topk + sparse_cosine_pairs; seq_packing_contiguous ->
        # pack_chop_spans [strict generalization]; decontam_benchmark_
        # overlap -> dedup_containment_join; frontier_trap_filter ->
        # url_dust_rules; sketch_hll_registers -> sketch_hll_merge
        # [strict upgrade] — rationales in _PRIORITY comments)
        "dedup_pipeline_keep_best",
        "text_pii_scrub",
        # r4 session-3 flagships
        "link_graph_pagerank",
        "bm25_keyword_topk",
        "events_sessionize",
        "ccnet_quality_buckets",
        "asof_join_latest_state",
        "range_join_windows",
        # r4 session-4 flagships
        "redirect_chain_resolve",
        "text_bigram_lm_score",
        # r4 session-6/7 flagships (kmeans_assign demoted r4s11:
        # semantic_dedup_clusters runs kmeans_lloyd as its first stage)
        "semantic_dedup_clusters",
        "quality_classifier_train",
        "pq_encode_codes",
        # r4 session-8 flagship
        "crawl_snapshot_diff",
        # r4 session-9 flagship
        "dedup_winnow_fingerprints",
        # r4 session-11 flagships: JSON-LD extraction; Merkle integrity
        # tree (order-sensitive agg fold), prefix-filtered Jaccard join
        # (the ngram_jaccard strict upgrade)
        "extract_jsonld_struct",
        "snapshot_merkle_tree",
        "dedup_jaccard_prefix_join",
        # r5 session-1 flagship promotions: the four r4-queued entries
        # plus the highest-value never-driver-checked oracled entries
        # (VERDICT r4 next-round #2)
        "window_range_frame_1h",
        "agg_pivot_event_types",
        "set_intersect_hosts",
        "fn_levenshtein_near_terms",
        "dedup_containment_join",
        "sparse_cosine_pairs",
        "sketch_hll_merge",
        "lang_temperature_resample",
        "url_dust_rules",
        "extract_markdown",
        "warc_wet_conversion",
        "pack_chop_spans",
    ):
        assert name in window, name


def test_demotions_have_in_window_twins():
    """Every demotion's machinery is exercised by an in-window twin."""
    window = set(list(entry_mod._REGISTRY)[: entry_mod._DRIVER_WINDOW])
    twins = {
        "qb_ops_in_contains_null": "qb_resolve_single",
        "agg_day_histogram": "a5_group_agg",
        "entity_users_get_or_create": "j6_get_or_create_anti",
        # retargeted r4s5 when text_token_count itself demoted: the
        # regexp_count machinery's in-window representative is pii_scrub
        "text_subword_tokens": "text_pii_scrub",
        "f4_fixed_width_slice": "f3_lower_normalize",
        # r4 session-3 demotions (rationales in _PRIORITY comments)
        "o1_order_passthrough": "o3_pagination",
        "set_union_seeds": "dedup_pipeline_keep_best",
        "f2_hex_encode": "f3_lower_normalize",
        # retargeted r5s1 when a3_min_fold itself demoted: strftime/
        # date_format cross-engine parity is driven by the pivot oracle
        "f9_rfc3339_format": "agg_pivot_event_types",
        # r4 session-9 demotions
        "f10_json_extract": "f3_lower_normalize",
        "dedup_winnow_pairs": "dedup_jaccard_prefix_join",
        # retargeted r5s1 when c4_quality_filter itself demoted
        "text_lang_id": "ccnet_quality_buckets",
        "a2_unique_set_first": "w2_topk_per_key",
        "f13_array_explode": "dedup_jaccard_prefix_join",
        # r4 session-4 demotions
        "p4_comparison_filter": "p5_bool_connectives",
        "o2_topn_by_time": "o3_pagination",
        "f8_template_substitution": "f3_lower_normalize",
        # r4 session-5 demotions
        "text_token_count": "text_pii_scrub",
        "text_quality_score": "ccnet_quality_buckets",
        # r4 session-6/7 demotions (a1 retargeted r5s1 when
        # dedup_exact_groups itself demoted: all-column HashAggregate
        # dedup is grouped-hash-agg physics)
        "a1_distinct": "a5_group_agg",
        "set_anti_seen_diff": "j6_get_or_create_anti",
        "f5_bigint_string_arith": "entity_balances_replay",
        "j3_point_lookup_limit1": "qb_resolve_single",
        # r4 session-8 demotions
        "p1_projection_pruning": "p5_bool_connectives",
        # r4 session-11 demotions
        "dedup_editdist_pairs": "dedup_jaccard_prefix_join",
        "dedup_ngram_jaccard": "dedup_jaccard_prefix_join",
        "q3_shipping_priority": "q1_pricing_summary",
        "embedding_kmeans_assign": "semantic_dedup_clusters",
        # r5 session-1 demotions (rationales in _PRIORITY comments)
        "p6_null_semantics": "crawl_snapshot_diff",
        "p2_allowlist_filter": "p5_bool_connectives",
        "a3_min_fold": "a5_group_agg",
        "w3_lag_pacing": "window_range_frame_1h",
        "j5_broadcast_dim_join": "j1_qb_relation",
        "c4_quality_filter": "ccnet_quality_buckets",
        "dedup_exact_groups": "dedup_pipeline_keep_best",
        "seq_packing_contiguous": "pack_chop_spans",
        "decontam_benchmark_overlap": "dedup_containment_join",
        "frontier_trap_filter": "url_dust_rules",
        "embedding_near_dup": "ann_cosine_topk",
        "sketch_hll_registers": "sketch_hll_merge",
        "backfill_reindex_progress": "a5_group_agg",
    }
    for demoted, twin in twins.items():
        assert demoted not in window, demoted
        assert demoted in entry_mod.oracle_sql(), demoted
        assert twin in window, twin


def test_demoted_duplicates_still_oracled():
    oracle = entry_mod.oracle_sql()
    for name in entry_mod._PRIORITY[50:]:
        assert name in oracle, name
