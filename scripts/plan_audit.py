"""Generate BENCH/PLANS_r05.md: physical-plan audits for the flagship paths.

VERDICT r3's plan-audit bullets were hand-read; this pins them to the
actual `.explain` output so the claims ("one shuffle", "broadcast, not
sort-merge", "filters reach the scan") are checkable artifacts, not prose.
For each audited entry we record the operator histogram (exchanges,
joins by strategy, windows, codegen spans) and the FileScan pushdown
lines, plus a short hand commentary on WHY that shape is the 100x-scale
plan. Run: python scripts/plan_audit.py [sf_dir] (default sf0.01).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDITS = [
    (
        "events_sessionize",
        "ONE exchange on user_id; the session merge is per-user local work "
        "after it. No window self-join, no driver state.",
    ),
    (
        "link_graph_pagerank",
        "k=3 unrolled iterations: each is one edges-to-ranks shuffle + a "
        "map-side-combined groupBy(dst); node count reaches the plan as a "
        "broadcast scalar (BroadcastNestedLoopJoin over a 1-row side), "
        "never a driver loop. The node set and out-degree table are "
        "persisted (pagerank(reuse=True)) and consumed via "
        "InMemoryTableScan — the Exchange count below includes the "
        "printed-but-cached lineage each InMemoryRelation node reprints; "
        "the InMemoryTableScan count is the evidence those subtrees "
        "execute once.",
    ),
    (
        "bm25_keyword_topk",
        "df/corpus scalars broadcast; per-term postings filtered BELOW the "
        "tf aggregation; final top-k is TakeOrderedAndProject, not a "
        "global sort.",
    ),
    (
        "asof_join_latest_state",
        "Union + carry-forward: one exchange on the key feeding a single "
        "window — the linear as-of plan; no theta join anywhere.",
    ),
    (
        "range_join_windows",
        "Bucketed form: the join is an EQUI join on the derived bucket "
        "key; the interval predicate is a post-join filter, so no "
        "BroadcastNestedLoopJoin on the big side.",
    ),
    (
        "doc_chunk_overlap",
        "Chunk construction is pure projection (sequence/transform/slice "
        "inside codegen) + explode: zero exchanges before the scan "
        "boundary.",
    ),
    (
        "dedup_minhash_lsh_pairs",
        "Banded LSH: shuffle on (band, band_hash) buckets only — the "
        "all-pairs product never materializes.",
    ),
    (
        "q1_pricing_summary",
        "The classic agg: partial aggregation before the exchange "
        "(map-side combine), scan prunes to the referenced columns.",
    ),
    (
        "psl_registrable_domain",
        "Public-suffix resolution with ZERO exchanges and zero joins: the "
        "PSL rides the plan as a constant-folded map literal and every "
        "host resolves in-row (try_element_at fold inside codegen). The "
        "relational alternative (explode + join + window) would be 2 "
        "exchanges per 10^10-row frontier pass.",
    ),
    (
        "c4_quality_filter",
        "C4 line/page rules: pure per-document projection — higher-order "
        "filter over split lines inside whole-stage codegen; the only "
        "exchange in the plan (if any) belongs to the scan boundary, not "
        "the operator.",
    ),
    (
        "dedup_substring_spans",
        "Lee-et-al duplicated spans: windows built in-row (transform over "
        "the token array, corpus never self-joined); ONE hash-keyed "
        "exchange for the multiplicity election (32-byte md5 keys, "
        "broadcast back), ONE id-keyed exchange for the per-doc merge — "
        "the gaps-and-islands itself is an in-row fold, zero Window nodes "
        "(a window formulation costs a third exchange re-grouping "
        "(id, island)).",
    ),
    (
        "url_param_noise",
        "Tracking-param mining: in-row URL parse + bounded explode; both "
        "aggregations are map-side combined and the group key is the md5 "
        "residual — the residual string itself never shuffles.",
    ),
    (
        "analyze_table_stats",
        "ANALYZE stats: ONE pass — a single multi-distinct aggregate "
        "(Catalyst Expand) then an in-row unpivot; no per-column scans.",
    ),
    (
        "embedding_kmeans_assign",
        "Lloyd k-means, final assignment pass: ONE Arrow matvec projection "
        "(ArrowEvalPython), ZERO exchanges — the k x dim model rides in "
        "the UDF closure. Each training iteration (not in this plan; it "
        "ran before the returned DF) is the same Arrow pass + a "
        "map-side-combined posexplode shuffle of <= k*dim rows per task.",
    ),
    (
        "semantic_dedup_clusters",
        "SemDeDup: the pairwise stage is applyInPandas after ONE exchange "
        "on cluster (plus the id-join to attach assignments); per-group "
        "cost is a blocked gram matrix — O(block*|cluster|) memory, never "
        "an O(n^2) corpus-wide self-join (no Cartesian/NestedLoop nodes).",
    ),
    (
        "quality_classifier_train",
        "GD logistic regression, final scoring pass: ONE Arrow matvec "
        "projection, ZERO exchanges — model-sized closure state only. "
        "Each of the 3 training iterations before it is one Arrow pass + "
        "one map-side-combined posexplode gradient shuffle (<= dim+1 rows "
        "per map task), the treeAggregate shape.",
    ),
    (
        "pq_encode_codes",
        "PQ encode: ONE Arrow pass with all M codebooks in closure, ZERO "
        "exchanges — each 10^10-row corpus vector becomes M small ints "
        "without ever shuffling a float vector. (Training ran before the "
        "returned DF: per-subspace map-side-combined Lloyd updates, "
        "sample-bounded at corpus scale.)",
    ),
    (
        "pq_ann_adc_topk",
        "ADC search: the NQ x M x KSUB distance tables ride the Arrow "
        "closure (broadcast-side analog); scoring is a zero-exchange pass "
        "over the codes, then ONE top-k exchange on q_id. No decode, no "
        "float-vector scan, no cross join.",
    ),
    (
        "ann_ivfpq_topk",
        "IVF-PQ search: the coarse-cell prune is a `cluster IN (probed)` "
        "filter that reaches the scan (partition-prune on a "
        "cluster-partitioned index at deployment scale); ADC scoring over "
        "residual codes is one Arrow pass with the per-(query, cell) "
        "tables in closure; then ONE top-k exchange on q_id. nprobe/"
        "n_clusters of the codes is the only data touched.",
    ),
    (
        "bpe_encode_corpus",
        "BPE encode: the merge fold runs once per DISTINCT word "
        "(vocabulary-sized by Heaps' law — the distinct aggregate below "
        "the fold is the evidence), joins back to the positional word "
        "explode, and docs reassemble with ONE groupBy(id) exchange. The "
        "trained merge ranks ride the plan as a literal map; no UDF.",
    ),
    (
        "dedup_cdc_chunks",
        "Gear-hash CDC chunking + shared-chunk ledger: the chunk scan is "
        "embarrassingly parallel mapInPandas over (id, payload) with NO "
        "exchange below it (the gear table regenerates from splitmix64 on "
        "every executor — nothing broadcast); the two exchanges in this "
        "plan both belong to the downstream ledger's count_distinct "
        "aggregation (Catalyst's two-phase distinct) and carry 32-byte "
        "chunk hashes only — payload bytes never shuffle.",
    ),
    (
        "dedup_winnow_fingerprints",
        "Winnowing (MOSS): gram hashing, the O(grams*w) window-min fold, "
        "tie-break, and dedup of selections all happen IN-ROW inside "
        "whole-stage codegen — zero exchanges, zero UDFs, zero joins; "
        "only the fixed-width (fp, pos) rows exist after the explode. "
        "Fingerprint selection needs no knowledge of other documents — "
        "the property that makes it embarrassingly parallel at 10^12 "
        "grams where the substring-spans election needs a corpus-wide "
        "shuffle.",
    ),
    (
        "link_graph_trustrank",
        "TrustRank: identical per-iteration physics to pagerank (one "
        "edges-to-ranks shuffle + map-side-combined groupBy(dst)); the "
        "seed flag rides the persisted node frame, so personalization "
        "adds ZERO exchanges over uniform PageRank. As in the pagerank "
        "audit, the raw Exchange count includes the printed-but-cached "
        "lineage each InMemoryRelation node reprints — the "
        "InMemoryTableScan count is the evidence those subtrees execute "
        "once.",
    ),
    (
        "dedup_mirror_hosts",
        "Mirror detection: the winnow fingerprint pass is shuffle-free; "
        "profiles exchange as fixed-width (host, fp) rows; the stop-filter "
        "(fps on > H hosts dropped) runs BEFORE the fp-keyed pair join, "
        "bounding per-bucket cost at |hosts(fp)|^2 <= H^2; host-pair "
        "aggregation and the two size joins move pair keys only. The "
        "filtered profile frame feeds both join sides and the size dim, "
        "so it is persisted (reuse=True) — one winnow pass, "
        "InMemoryTableScans after (lineage reprints inflate the raw "
        "Exchange/Generate counts, as in the pagerank audit).",
    ),
    (
        "crawl_snapshot_diff",
        "CDC diff: md5 fingerprints are computed BELOW each side's "
        "exchange, so the full-outer sort-merge join (Spark has no "
        "broadcast full-outer) shuffles (key, 32-byte fp) pairs only — "
        "page payloads never move; the unchanged-row filter runs before "
        "the output projection, so the emitted set is O(|delta|). Over a "
        "bucket(N, url)-partitioned Iceberg pages table both exchanges "
        "vanish (storage-partitioned join).",
    ),
    (
        "frontier_soft404_detect",
        "Soft-404: the template dim (count_distinct per (host, md5(body)) "
        "— its exchanges carry keys+counts, never bodies) comes back as a "
        "BroadcastHashJoin, so the page side is probed with ZERO exchange; "
        "the marker test is a single codegen rlike. At web scale the dim "
        "is urls-per-template sized; if it outgrows broadcast the join "
        "key (host, fp) is already the agg's partitioning.",
    ),
    (
        "dsir_resample_topk",
        "DSIR score + resample: the fitted model is ONE literal "
        "array<long> (fit's own ≤4096-row agg ran before this plan and "
        "is the only collect), so per-doc scoring is a pure-codegen "
        "fold with ZERO exchanges, zero joins, zero Python — and the "
        "resample is a single TakeOrderedAndProject, not a full sort. "
        "At 10^10 docs the only cluster-wide operation is the top-k "
        "merge.",
    ),
    (
        "extract_jsonld_struct",
        "JSON-LD mining: ONE Arrow pass (the tree extractor) over a "
        "pure-codegen HTML build, then explode + from_json as in-row "
        "projections — ZERO exchanges, zero joins; at 10^10 pages the "
        "operator is embarrassingly parallel over the scan.",
    ),
    (
        "extract_html_tables",
        "Table-grid mining: same shape as the JSON-LD audit — one Arrow "
        "extractor pass, two bounded Generates (tables, then cells), no "
        "exchange anywhere; output size is grid-cells, input is pages.",
    ),
    (
        "crawl_revalidation_savings",
        "Conditional-GET economy: ONE exchange on url feeding the lag "
        "window (per-url partitions are history-length sized), then a "
        "map-side-combined groupBy(host) whose exchange carries #hosts "
        "rows of integer counters — fingerprints never re-shuffle.",
    ),
    (
        "url_path_prefix_rollup",
        "Path-trie rollup: prefix build is transform-over-sequence inside "
        "codegen; ONE bounded Generate (<= max_depth rows per URL); the "
        "count-distinct fan-out makes the rollup a two-phase aggregate on "
        "a single (host, depth, prefix) exchange — prefixes, never URLs, "
        "are the exchanged keys.",
    ),
    (
        "frontier_rendezvous_shards",
        "HRW sharding: the per-key argmax over K shards is a greatest() "
        "struct fold — a single-expression codegen projection with ZERO "
        "exchanges beyond the input's own distinct; no dim table, no "
        "join, no UDF. Rebalancing work at shard-count change is bounded "
        "by the HRW property, not by a reshuffle of the keyspace.",
    ),
    (
        "lang_temperature_resample",
        "Temperature mixture: counts and apportionment exchange #langs "
        "rows (the two 1-row/`#langs`-row WindowExec warnings are the "
        "model-sized remainder rank, deliberate); quotas come back as "
        "BroadcastHashJoins; the only corpus-sized exchange is the "
        "per-language selection rank — swap in the two-pass "
        "range-partitioned rank when one language outgrows a partition "
        "(docstring note).",
    ),
    (
        "unigram_encode_tokens",
        "Unigram encode: the trained model rides the closure (kmeans "
        "pattern) into ONE MapInPandas pass — zero exchanges, zero joins "
        "in the encode plan; EM training before it touches the corpus "
        "once and iterates on the vocab-sized word table.",
    ),
    (
        "sketch_hll_registers",
        "HLL registers: hash/bucket/rho all inside one codegen "
        "projection, then ONE exchange whose size is the register count "
        "(partial MAX combines map-side to <= 2^b rows per task at any "
        "input size); the second Exchange below is the registry entry's "
        "presentation orderBy over <= 2^b rows, not the operator. No "
        "UDF, no distinct() — duplicate-insensitivity comes from MAX "
        "itself.",
    ),
    (
        "snapshot_merkle_tree",
        "Merkle fold: row hash + bucket in codegen; ONE n_buckets-bounded "
        "exchange for the level-1 nodes, which are lazy-checkpointed so "
        "the root branch folds the <= n_buckets materialized rows instead "
        "of re-scanning the table (ONE FileScan in the plan). No row data "
        "ever moves for a store-equality check — the diff exchanges node "
        "hashes only.",
    ),
    (
        "extract_microdata_items",
        "Microdata round trip: HTML construction is JVM concat (codegen), "
        "the extractor is ONE ArrowEvalPython (explode_outer + "
        "post-filter keeps Catalyst from duplicating the UDF below the "
        "Generate — the jsonld precedent), zero exchanges end-to-end.",
    ),
    (
        "extract_meta_robots_flags",
        "Meta-robots flags: HTML construction in codegen, ONE "
        "ArrowEvalPython for the struct extraction (alias-then-field "
        "expansion, the title_meta pattern), zero exchanges.",
    ),
    (
        "frontier_pagination_series",
        "Pagination chains: the extracted edge frame is localCheckpointed "
        "(ONE ArrowEvalPython pass executes at checkpoint time; the final "
        "plan scans the materialized RDD, hence Arrow=0 below), then the "
        "redirect resolver's pointer doubling with a localCheckpoint at "
        "the top of every round — the r4 audit's 391-exchange doubled "
        "lineage is now Exchange ~linear in rounds, pinned numerically by "
        "tests/test_plan_bounds.py. No driver iteration proportional to "
        "chain length.",
    ),
    (
        "sketch_hll_by_host",
        "Grouped HLL: ONE map-side-combined exchange on (host, bucket) — "
        "<= 2^b rows per group regardless of group row counts, where an "
        "exact per-group distinct shuffles one row per distinct key. The "
        "rho/bucket split is whole-stage codegen integer math; no UDF.",
    ),
    (
        "wordpiece_encode_words",
        "WordPiece encode: the greedy longest-match loop is ONE "
        "whole-stage-codegen fold per DISTINCT word (vocabulary as two "
        "literal maps — no UDF, no broadcast join, zero Python); the only "
        "exchange is the distinct-word aggregate, vocabulary-sized by "
        "Heaps' law at any corpus size.",
    ),
    (
        "qb_graphql_string",
        "GraphQL STRING front end: the parsed query compiles to the same "
        "declarative tree as the dict path — filter reaches the scan "
        "(PushedFilters), top-25 is TakeOrderedAndProject (never a global "
        "sort), ZERO exchanges, zero Python. The front end is driver-side "
        "string work only; Catalyst sees an identical plan from either "
        "path (tests/test_graphql.py parity).",
    ),
    (
        "redirect_chain_resolve",
        "Pointer doubling with per-round localCheckpoint "
        "(operators/redirects.py resolve_redirects reuse=True): each of "
        "the 6 rounds is ONE |nodes|-row self-equi-join over the "
        "checkpointed jump map — O(log H) shuffles total, where the r4 "
        "plan self-composed lazily into a 2^6-leaf / 390-exchange tree. "
        "Bound enforced by tests/test_plan_bounds.py.",
    ),
    (
        "extract_main_content_blocks",
        "jusText blocks: ONE ArrowEvalPython (explode_outer + "
        "post-filter), classification entirely in codegen integer "
        "arithmetic, zero exchanges — per-page work only.",
    ),
    (
        "dedup_containment_join",
        "Containment join: same exchanges as the Jaccard prefix join "
        "(shingle explode -> df groupBy -> per-doc rank -> prefix-postings "
        "join) with the B side unpruned BY THEOREM (overlap has no B-side "
        "prefix bound); prefix_df(stopword) ~ 0 bounds the per-key "
        "product, residual single-key skew is AQE skew-join territory, "
        "and verification joins exchange doc-sized rows keyed by id, "
        "never pair-sized texts.",
    ),
    (
        "image_phash_near_dup",
        "pHash near-dup: one MapInPandas decode+DCT pass, then the "
        "pigeonhole block self-join -- shuffle keyed on (block_idx, "
        "block_val), popcount verify in codegen, DISTINCT on the pair "
        "output; exact recall with no CartesianProduct anywhere.",
    ),
    (
        "url_dust_rules",
        "DUST rules: pairing is an equi-join on (host, fp) -- duplicate-"
        "cluster-bounded, never all-pairs; LCP/LCS are in-row codegen "
        "filter-size folds (no UDF, no Window); the rule rollup is one "
        "map-side-combined groupBy with a distinct-host aggregate.",
    ),
    (
        "site_template_clusters",
        "Template clusters: ONE ArrowEvalPython for the tag-path "
        "signature, md5/xxhash64 fingerprint in codegen, then a single "
        "map-side-combined groupBy on (host, fp) -- the exchange carries "
        "fixed-width hashes, never signature text.",
    ),
    (
        "agg_rollup_subtotals",
        "ROLLUP: all three granularities in ONE Expand + HashAggregate "
        "pass -- one exchange total, vs three groupBys + union scanning "
        "and shuffling thrice; sums DECIMAL-exact for cross-engine "
        "parity.",
    ),
    (
        "pack_chop_spans",
        "Concat-and-chop packing: the global prefix sum is the two-pass "
        "range-partition scheme (one range exchange + a P-integer driver "
        "collect + one Arrow assign pass -- no single-partition Window); "
        "span explosion is a bounded in-row sequence explode.",
    ),
    (
        "search_phrase_exact",
        "Phrase search: tokenize + indexed-transform + slice-equality as "
        "ONE codegen expression per document -- zero exchanges, zero "
        "Generate fan-out, zero Python; the plan is scan + project + "
        "filter.",
    ),
    (
        "text_window_chunks",
        "RAG chunking: tokenize in codegen, ONE bounded Generate "
        "(chunk starts proportional to n/stride), slice/array_join "
        "projection -- no exchange, no Window, no Python.",
    ),
    (
        "sparse_cosine_pairs",
        "Sparse cosine: in-row gram transform + one explode, one "
        "(id,bucket) partial-agg exchange, inverted-index bucket join "
        "(DAAT), norms joined back by id -- the integer threshold is a "
        "post-join codegen filter; no cartesian, no Window.",
    ),
    (
        "agg_pivot_event_types",
        "PIVOT: explicit value list means ONE aggregation pass (no "
        "distinct pre-scan) -- a single map-side-combined exchange on "
        "day with all pivoted columns produced together.",
    ),
    (
        "window_range_frame_1h",
        "RANGE frame: one exchange on user_id, then WindowExec's "
        "value-based sliding bound over epoch seconds -- per-user local "
        "work, no self-join formulation (which would shuffle the event "
        "table against itself).",
    ),
    (
        "set_intersect_hosts",
        "INTERSECT: plans as aggregate + left-semi join, never a "
        "cartesian; both sides prune to the single key column at the "
        "scan.",
    ),
]

OPS = [
    ("Exchange", r"Exchange"),
    ("BroadcastExchange", r"BroadcastExchange"),
    ("BroadcastHashJoin", r"BroadcastHashJoin"),
    ("SortMergeJoin", r"SortMergeJoin"),
    ("ShuffledHashJoin", r"ShuffledHashJoin"),
    ("BroadcastNestedLoopJoin", r"BroadcastNestedLoopJoin"),
    ("CartesianProduct", r"CartesianProduct"),
    ("Window", r"\bWindow\b"),
    ("HashAggregate(partial)", r"HashAggregate.*partial"),
    ("TakeOrderedAndProject", r"TakeOrderedAndProject"),
    ("Generate(explode)", r"Generate"),
    ("ArrowEvalPython", r"ArrowEvalPython|MapInPandas"),
    ("InMemoryTableScan", r"InMemoryTableScan"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from layerg_crawler_v2_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(shuffle_partitions=8)
    qs = entry_mod.queries()
    out = [
        "# Physical-plan audits (r5, generated by scripts/plan_audit.py)",
        "",
        f"Input: {sf_dir}; plans are AQE initial physical plans "
        "(`queryExecution().executedPlan()`); counts are operator-name "
        "occurrences in the plan tree. Commentary states the property the "
        "count evidences.",
        "",
    ]
    for name, why in AUDITS:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts = {label: len(re.findall(pat, plan)) for label, pat in OPS}
        pushed = [
            ln.strip()[:160]
            for ln in plan.splitlines()
            if "PushedFilters" in ln or "ReadSchema" in ln
        ][:4]
        out.append(f"## {name}")
        out.append("")
        out.append(why)
        out.append("")
        hist = ", ".join(f"{k}={v}" for k, v in counts.items() if v)
        out.append(f"Operator histogram: {hist or '(projection-only)'}")
        if pushed:
            out.append("")
            out.append("Scan pushdown:")
            out.extend(f"    {ln}" for ln in pushed)
        out.append("")
    path = os.path.join(REPO, "BENCH", "PLANS_r05.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
