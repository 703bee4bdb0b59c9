"""Empty-input robustness: every relational/text/vector family must
DEGRADE to an empty (or all-zero) result on a zero-row corpus, never
crash — the behavior a 100 TB pipeline needs when a partition filter
matches nothing or a new tenant's tables are still empty.

An empty mirror of the testdata schemas is materialized once per
session; one representative query per family runs against it. Queries
whose semantics define a non-empty result on empty input (global
aggregates, funnel stages, integrity checks) assert their degenerate
row instead.
"""

from __future__ import annotations

import pytest

from map_reduce_rpc_spark.tables import TABLE_NAMES, load_table


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("empty_sf")
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.limit(0).write.mode("overwrite").parquet(
            str(out / f"{name}.parquet")
        )
    return str(out)


# family representative -> expected row count on EMPTY input
# (None = just "no exception and a well-defined count")
_CASES = {
    # relational: scans/joins/windows collapse to zero rows
    "q1_pricing_summary": 0,
    "region_revenue": 0,
    "parts_top3_per_brand": 0,
    "customers_without_orders": 0,
    "order_ship_calendar": 0,
    "cube_sales": None,  # grouping-set aggregates may emit global rows
    # events
    "events_hourly": 0,
    "user_sessions": 0,
    "purchase_asof_click": 0,
    "funnel_conversion": 3,  # one row per stage, n_users=0 (round-5 fix)
    # text ops / dedup
    "wordcount": 0,
    "dedup_exact": 0,
    "ngram_jaccard_dups": 0,
    "minhash_dups": 0,
    "gopher_rules": 0,
    "fuzzy_part_names": 0,
    "canonical_part_names": 0,
    "dup_clusters_star": 0,
    # dataset management
    "split_assign": 0,
    "stratified_sample": 0,
    "pack_sequences": 0,
    "global_shuffle": 0,
    "integrity_report": 7,  # one row per check, all zero violations
    # vectors
    "similarity_topk": 0,
    "embedding_near_dups": 0,
    "srp_near_dups": 0,
    # late round 5: new relational shapes
    "q3_shipping_priority": 0,
    "q7_nation_volume": 0,
    "q14_promo_effect": None,  # global agg: one row of nulls/zero
    "q22_dormant_rich": 0,  # scalar-subquery thr is NULL -> no rows
    "q17_small_quantity": None,  # global agg over empty join
    "q19_discounted_revenue": None,
    "revenue_trailing_window": 0,
    "frequent_brands_sketch": 1,  # degenerate (0, 0, true) row
    "click_next_purchase": 0,  # forward as-of mirrors backward's 0
    # latest round-5 additions: the 22-shape completion set + the new
    # SQL surfaces + the vector compression tiers
    "q2_min_cost_supplier": 0,
    "q4_order_priority": 0,
    "q5_local_supplier_volume": 0,
    "q8_market_share": 0,
    "q9_product_profit": 0,
    "q10_returned_items": 0,
    "q11_important_brands": 0,  # total is NULL -> comparison never true
    "q12_ship_latency": 0,
    "q13_order_distribution": 0,  # no customers -> no distribution rows
    "q15_top_supplier": 0,  # scalar max over empty rev is NULL
    "q16_part_supplier_counts": 0,
    "q20_dominant_suppliers": 0,
    "q21_waiting_suppliers": 0,
    "lateral_top_lines": 0,
    "recursive_month_spine": None,  # min/max NULL: spine degenerates
    "events_variant_stats": 0,
    "ann_sq8_topk": 0,  # no queries, no candidates
    "ann_pq_adc_topk": 0,  # empty codebook sample -> typed empty result
    "ann_pq_rerank_topk": 0,
    # streaming replay on an empty corpus: sentinel-anchored at epoch 0
    # (core.py guards the None min/max), drains to zero result rows
    "stream_late_data_drop": 0,
    "incremental_dedup_manifest": 0,
    "order_value_robust_stats": 0,
    # round-6 additions: layout pipelines, CDC/SCD2 (batch + stream +
    # point-in-time), composed IVFPQ, PageRank, weighted sampling,
    # Gram matrix, incremental near-dup, stream semi join
    "q6_zorder_scan": None,  # global agg: one (NULL, 0) row
    "scd2_customer_priority": 0,
    "stream_scd2_user_state": 0,
    "pit_priority_revenue": None,  # left-join agg over empty facts
    "pagerank_suppliers": 0,  # no edges -> no nodes -> no ranks
    "pagerank_directed_suppliers": 0,
    "ann_ivfpq_topk": 0,
    "weighted_source_sample": 0,
    "embedding_gram": 0,  # no rows -> no outer products -> no cells
    "incremental_neardup_manifest": 0,
    "stream_converting_clicks": 0,
    "segment_order_stats_compacted": 0,
    # round-7 additions: skew diagnostics/levers, versioning diff,
    # triangle backbone, cluster-aware split, BPE pair counting
    "events_skew_profile": 0,
    "early_user_activity": 0,
    "snapshot_diff_orders": 0,  # empty v1 -> empty v2 -> empty diff
    "triangle_count_suppliers": 1,  # scalar aggs: one (0, 0, 0) row
    "leakage_safe_split": 0,
    "bpe_pair_counts": 0,
    "user_sessions_skewproof": 0,
    "bloom_pruned_urgent_revenue": 0,  # empty build side -> all pruned
    "classifier_quality_scores": 0,
    "hll_sketch_rollup_users": 0,
    "forget_users_events": 0,
    "trigram_lm_scores": 0,
    "boilerplate_ratio": 0,
    "ann_filtered_topk": 0,
    "collocation_pmi": 0,
    "bpe_learn_merges": 0,
    "pca_power_pc1": 0,
    "kcore_suppliers": 0,
    "keyword_search_topk": 0,
    "forget_customers_scd2": 0,
    "forget_docs_neardup_manifest": 0,
    # late round-7 additions: LPA communities, split drift, fuzzy
    # decontamination, personalized PageRank, co-visitation lift
    "label_prop_communities": 0,
    "split_token_drift": 0,
    "decontaminate_fuzzy": 0,
    "ppr_supplier_recs": 0,  # no edges -> typed empty ranks
    "covisitation_lift": 0,
    "ann_mmr_topk": 0,  # empty shortlist -> zero greedy picks
    "events_hourly_interp": 0,  # no observed hours -> empty spine
    "retention_cohorts": 0,  # no purchases -> no cohorts
    "lm_quality_mix_sample": 0,  # empty LM table -> nothing to gate
    "repeated_spans": 0,  # no docs -> no windows, no spans
    "dpp_quarter_revenue": 0,  # no orders -> no partitions, no months
    "session_paths": 0,  # no events -> no sessions, no paths
    # round-8 additions: sketch rollups (batch + stream), Avro
    # roundtrip, robust outliers, compaction, BFS, retrieval,
    # prototypicality, split audit
    "hdr_quantile_rollup_values": 0,
    "stream_hdr_quantiles": 0,
    "avro_events_roundtrip": 0,  # empty container still self-describes
    "mad_outlier_days": 0,
    "user_latest_state": 0,
    "bfs_hops_suppliers": len(
        __import__(
            "map_reduce_rpc_spark.plans.relational", fromlist=["x"]
        ).BFS_SEED_SUPPS
    ),  # seeds are ground truth: hops=0 rows survive an empty graph
    "skipgram_cooc_topk": 0,
    "bm25_search_topk": 0,
    "doc_outlier_embeddings": 0,
    "cross_split_contamination": 0,
    # late round-8 additions: hybrid fusion, dataset card, BPE apply,
    # media dedup, GDPR audit
    "hybrid_rrf_topk": 0,
    "dataset_card_report": 0,
    "bpe_encode_corpus": 0,
    "media_exact_dups": 0,
    "forget_audit_report": 3,  # global aggs: one all-zero clean row per artifact
    "time_travel_orders": 2,  # one (v, 0, NULL) stats row per version
    "stream_txlog_append": 0,
    "pii_redaction_audit": 3,  # one all-zero clean row per pattern
}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_query_survives_empty_corpus(spark, empty_sf_dir, name):
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    df = fn(spark, empty_sf_dir)
    n = df.count()
    expected = _CASES[name]
    if expected is not None:
        assert n == expected, f"{name}: {n} rows on empty input"
    if name == "integrity_report":
        assert all(r["n_violations"] == 0 for r in df.collect())
