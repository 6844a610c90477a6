"""Numeric physical-plan bounds for every audited flagship entry.

VERDICT r4 'What's wrong' #3: scripts/plan_audit.py printed operator
histograms but asserted nothing — the 390-exchange pointer-doubling plan
shipped THROUGH the audit because a human had to notice the number. This
module turns each audit into a failing test: for every entry in the
audit list we pin

  * max Exchange count          (shuffle budget — the 100x-scale axis)
  * max ArrowEvalPython/MapInPandas count (Python-boundary budget:
    extractors must stay single-pass; Catalyst duplicating a UDF below
    a Generate is the regression this catches)
  * max BroadcastNestedLoopJoin (only 1-row-scalar broadcasts are
    tolerated, where the audit documents them)
  * CartesianProduct == 0, always, for every entry

Bounds are the counts measured on the audited-good plans at sf0.001
with the conftest session (shuffle_partitions=8) — i.e. today's plan IS
the contract; any regression (a lost broadcast, a duplicated UDF, an
unpersisted iteration reappearing) fails the suite, not just reprints a
bigger number. Counting method matches scripts/plan_audit.py: operator-
name occurrences in queryExecution().executedPlan().toString(); for
persisted lineage (pagerank/trustrank/mirror_hosts) the count includes
the printed-but-cached InMemoryRelation subtrees, so those bounds are
intentionally larger and the InMemoryTableScan evidence lives in
BENCH/PLANS_r*.md.
"""

from __future__ import annotations

import re

import pytest

# name -> (max_exchange, max_arrow, max_bnlj); CartesianProduct always 0
BOUNDS = {
    "events_sessionize": (1, 0, 0),
    "link_graph_pagerank": (53, 0, 4),
    "bm25_keyword_topk": (12, 0, 2),
    "asof_join_latest_state": (2, 0, 0),
    "range_join_windows": (2, 0, 0),
    "doc_chunk_overlap": (0, 0, 0),
    "dedup_minhash_lsh_pairs": (9, 0, 0),
    "q1_pricing_summary": (1, 0, 0),
    "psl_registrable_domain": (0, 0, 0),
    "c4_quality_filter": (0, 0, 0),
    "dedup_substring_spans": (3, 0, 0),
    "url_param_noise": (4, 0, 0),
    "analyze_table_stats": (2, 0, 0),
    "embedding_kmeans_assign": (0, 1, 0),
    "semantic_dedup_clusters": (2, 1, 0),
    "quality_classifier_train": (0, 1, 0),
    "pq_encode_codes": (0, 1, 0),
    "pq_ann_adc_topk": (1, 2, 0),
    "ann_ivfpq_topk": (1, 1, 0),
    "bpe_encode_corpus": (3, 0, 0),
    "dedup_cdc_chunks": (2, 1, 0),
    "dedup_winnow_fingerprints": (0, 0, 0),
    "link_graph_trustrank": (81, 0, 4),
    "dedup_mirror_hosts": (31, 0, 0),
    "crawl_snapshot_diff": (2, 0, 0),
    "frontier_soft404_detect": (3, 0, 0),
    "dsir_resample_topk": (0, 0, 0),
    "extract_jsonld_struct": (0, 1, 0),
    "extract_html_tables": (0, 1, 0),
    "crawl_revalidation_savings": (2, 0, 0),
    "url_path_prefix_rollup": (2, 0, 0),
    "frontier_rendezvous_shards": (1, 0, 0),
    "lang_temperature_resample": (15, 0, 3),
    "unigram_encode_tokens": (0, 1, 0),
    "sketch_hll_registers": (2, 0, 0),
    "snapshot_merkle_tree": (1, 0, 0),
    "extract_microdata_items": (0, 1, 0),
    "extract_meta_robots_flags": (0, 1, 0),
    "frontier_pagination_series": (12, 0, 0),
    "extract_main_content_blocks": (0, 1, 0),
    "dedup_containment_join": (17, 0, 0),
    "image_phash_near_dup": (3, 4, 0),
    "url_dust_rules": (5, 0, 0),
    "site_template_clusters": (1, 2, 0),
    "agg_rollup_subtotals": (1, 0, 0),
    "pack_chop_spans": (2, 1, 0),
    "search_phrase_exact": (0, 0, 0),
    "text_window_chunks": (0, 0, 0),
    "sparse_cosine_pairs": (10, 0, 0),
    "agg_pivot_event_types": (2, 0, 0),
    "window_range_frame_1h": (1, 0, 0),
    "set_intersect_hosts": (2, 0, 0),
    "redirect_chain_resolve": (10, 0, 0),
    "qb_graphql_string": (0, 0, 0),
    "wordpiece_encode_words": (1, 0, 0),
    "sketch_hll_by_host": (1, 0, 0),
}


def _counts(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchange": len(re.findall(r"Exchange", plan)),
        "arrow": len(re.findall(r"ArrowEvalPython|MapInPandas", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
    }


def test_bounds_cover_audit_list():
    """Every entry scripts/plan_audit.py audits must carry a bound here
    (adding an audit without a bound reintroduces the prose-only gap)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "plan_audit.py")
    spec = importlib.util.spec_from_file_location("plan_audit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    audited = {name for name, _ in mod.AUDITS}
    missing = audited - set(BOUNDS)
    assert not missing, f"audited entries without numeric bounds: {sorted(missing)}"


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_plan_within_bounds(spark, sf_dir, name):
    import __spark_entry__ as entry_mod

    # plans that persist invariants (pagerank/trustrank/mirror_hosts)
    # print differently when a PRIOR test left the same subtree cached
    # (CacheManager dedupes the persist and the printed lineage changes),
    # so pin the isolated-session shape the bounds were measured on
    spark.catalog.clearCache()
    df = entry_mod.queries()[name](spark, sf_dir)
    c = _counts(df)
    max_ex, max_arrow, max_bnlj = BOUNDS[name]
    assert c["cartesian"] == 0, f"{name}: CartesianProduct in plan"
    assert c["exchange"] <= max_ex, (
        f"{name}: Exchange {c['exchange']} > bound {max_ex} — a shuffle "
        f"regressed (lost broadcast? unpersisted iteration?)"
    )
    assert c["arrow"] <= max_arrow, (
        f"{name}: Python-boundary ops {c['arrow']} > bound {max_arrow} — "
        f"a UDF pass got duplicated or added to the hot path"
    )
    assert c["bnlj"] <= max_bnlj, (
        f"{name}: BroadcastNestedLoopJoin {c['bnlj']} > bound {max_bnlj}"
    )
