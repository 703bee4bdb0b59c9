"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine code lives in ``map_reduce_rpc_spark/``; this module only wires
the query library to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from map_reduce_rpc_spark.plans import (
    events,
    multimodal,
    parity,
    relational,
    sampling,
    streams,
    textops,
    vectors,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: wordcount over the documents corpus.

    Exercises the reference's whole engine path (scan -> flatMap
    tokenize -> shuffle -> agg -> sink), SURVEY.md §7 phase 0.
    """
    return parity.wordcount(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering contract: the correctness checker records rows for the
    FIRST 50 entries only, so slots 1-50 are the driver-certified
    window for this round and everything after is the pytest-oracled
    tail (tests/test_relational.py auto-parametrizes the same
    Spark-vs-DuckDB compare over EVERY oracle_sql entry, window or
    tail, so rotated-out queries stay hash-checked each round).

    ROTATION SCHEDULE (round-5 verdict item 1). With ~140 registered
    queries and 50 slots, disjoint windows cover the registry in
    ceil(140/50) = 3 rounds; a small always-in core holds the flagship
    parity path plus one sentinel per operator family. Cohorts:

      CORE  (~12, in every window): wordcount, kv_pipeline,
            inverted_index_topn, events_variant_stats,
            q6_clustered_scan, minhash_dups, semantic_dedup_cells,
            stream_stateful_sessions, stream_late_data_drop,
            similarity_topk, frame_checksums_mm, integrity_report.
      COHORT-A (round 6, this window): the 22 queries that had never
            held a driver CORRECTNESS row after round 5 — the 16
            TPC-H completions q3/q4/q5/q7/q9/q10/q11/q12/q13/q14/
            q15/q16/q17/q19/q20/q22, the PQ trio (adc/rerank/
            trained), click_next_purchase, revenue_trailing_window,
            frequent_brands_sketch — plus the 9 queries newly
            registered this round (new queries always join the
            current window): incremental_neardup_manifest,
            segment_order_stats_compacted, ann_ivfpq_topk,
            q6_zorder_scan, scd2_customer_priority,
            stream_scd2_user_state, pagerank_suppliers,
            pit_priority_revenue, stream_converting_clicks,
            weighted_source_sample, embedding_gram,
            pagerank_directed_suppliers, canonical_part_names. To make
            room, round-5-certified holdovers moved early to COHORT-B:
            image_features_mm, approx_percentile_bounds,
            domain_mix_sample, stream_dedup_events, ann_sq8_topk,
            incremental_dedup_manifest, funnel_conversion, semantic_dedup,
            q18_large_volume, simhash_dups, stream_click_purchase_full.
      COHORT-B (round 7): the round-5-certified set that vacated this
            round — order_ship_calendar, chunk_documents,
            quality_filter, doc_repetition, containment_dups,
            gopher_rules, fuzzy_part_names, dup_clusters_star,
            curation_pipeline, q2_min_cost_supplier, q8_market_share,
            q21_waiting_suppliers, order_value_robust_stats,
            global_shuffle, stream_purchase_click_join,
            stream_static_hourly, stream_events_etl,
            stream_sliding_counts, stream_session_stats,
            stream_click_attribution, srp_near_dups, ann_kmeans_topk,
            image_resize_mm, audio_features_mm, ann_sq8_topk,
            semantic_dedup, simhash_dups, funnel_conversion,
            q18_large_volume, domain_mix_sample,
            incremental_dedup_manifest, stream_click_purchase_full,
            stream_dedup_events, ann_ivf_topk, image_features_mm,
            lateral_top_lines, recursive_month_spine,
            approx_percentile_bounds.
      COHORT-C (round 8): everything else (the r1-r4 certified tail:
            file_counts ... stream_hourly_counts). Round 9 restarts
            at COHORT-A.

    Every query is certified at least once per 3 rounds; every query
    is hash-checked by pytest every round regardless of cohort. All
    registered queries are fully DuckDB-oracled — zero rows-only.
    """
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # ========== round-6 window: CORE ==========
        "wordcount": parity.wordcount,
        "kv_pipeline": parity.kv_pipeline,
        "inverted_index_topn": parity.inverted_index_topn,
        "events_variant_stats": events.events_variant_stats,
        "q6_clustered_scan": relational.q6_clustered_scan,
        "minhash_dups": textops.minhash_dups,
        "semantic_dedup_cells": vectors.semantic_dedup_cells,
        "stream_stateful_sessions": streams.stream_stateful_sessions,
        "stream_late_data_drop": streams.stream_late_data_drop,
        "similarity_topk": vectors.similarity_topk,
        "frame_checksums_mm": multimodal.frame_checksums_mm,
        "integrity_report": sampling.integrity_report,
        # ========== round-6 window: COHORT-A (never driver-certified
        # before this round — round-5 verdict item 1) ==========
        # 16 TPC-H completions (adapted where the spec needs columns
        # the synthetic tables lack; each docstring states the
        # adaptation):
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q4_order_priority": relational.q4_order_priority,
        "q5_local_supplier_volume": relational.q5_local_supplier_volume,
        "q7_nation_volume": relational.q7_nation_volume,
        "q9_product_profit": relational.q9_product_profit,
        "q10_returned_items": relational.q10_returned_items,
        "q11_important_brands": relational.q11_important_brands,
        "q12_ship_latency": relational.q12_ship_latency,
        "q13_order_distribution": relational.q13_order_distribution,
        "q14_promo_effect": relational.q14_promo_effect,
        "q15_top_supplier": relational.q15_top_supplier,
        "q16_part_supplier_counts": relational.q16_part_supplier_counts,
        "q17_small_quantity": relational.q17_small_quantity,
        "q19_discounted_revenue": relational.q19_discounted_revenue,
        "q20_dominant_suppliers": relational.q20_dominant_suppliers,
        "q22_dormant_rich": relational.q22_dormant_rich,
        # forward as-of join + value-based RANGE frame + heavy hitters
        # (the three certified-family gaps named in the round-5
        # verdict items 1 and 6):
        "click_next_purchase": events.click_next_purchase,
        "revenue_trailing_window": relational.revenue_trailing_window,
        "frequent_brands_sketch": relational.frequent_brands_sketch,
        # PQ compression tier (sampled codebook ADC, ADC->exact
        # rerank serving shape, trained per-sub-space Lloyd codebook):
        "ann_pq_adc_topk": vectors.ann_pq_adc_topk,
        "ann_pq_rerank_topk": vectors.ann_pq_rerank_topk,
        "ann_pq_trained_topk": vectors.ann_pq_trained_topk,
        # ========== round-6 window: round-5-certified holdovers
        # keeping each §2.4 family in-window alongside COHORT-A (all
        # vacate to COHORT-B next round) ==========
        "lateral_top_lines": relational.lateral_top_lines,
        "recursive_month_spine": relational.recursive_month_spine,
        # NEW round 6: multi-dimension Z-order clustered layout — the
        # Morton-key completion of q6_clustered_scan's 1-D range
        # layout; both filter dimensions prune files via footer stats.
        "q6_zorder_scan": relational.q6_zorder_scan,
        # NEW round 6: SCD2 dimension history built through the
        # incremental CDC MERGE path, hash-matched against the
        # one-shot window-SQL recompute.
        "scd2_customer_priority": relational.scd2_customer_priority,
        # NEW round 6: point-in-time (feature-store) join against the
        # SCD2 history — each fact joined to the state in force at its
        # ship date; the leak-free temporal join training pipelines
        # depend on.
        "pit_priority_revenue": relational.pit_priority_revenue,
        # NEW round 6: entity resolution end-to-end — fuzzy pairs
        # closed into clusters (string-labeled CC) and emitted as the
        # applicable canonical mapping with cluster sizes.
        "canonical_part_names": textops.canonical_part_names,
        # NEW round 6: CDC-from-a-stream — foreachBatch maintains the
        # SCD2 user-state history micro-batch by micro-batch; oracle
        # recomputes one-shot, so batch boundaries must not leak.
        "stream_scd2_user_state": streams.stream_scd2_user_state,
        # NEW round 6: stream-stream LEFT SEMI interval join — the
        # fourth join-family member (did-it-convert gating, no
        # fan-out, purchase columns never materialized).
        "stream_converting_clicks": streams.stream_converting_clicks,
        # NEW round 6: quantized-deterministic PageRank — the second
        # certified iterative algorithm; the oracle unrolls all
        # iterations as a CTE chain (kmeans pattern on graphs).
        "pagerank_suppliers": relational.pagerank_suppliers,
        # NEW round 6: directed PageRank with dangling-mass
        # redistribution — the general form; the oracle replays the
        # per-iteration dangling scalar too.
        "pagerank_directed_suppliers": relational.pagerank_directed_suppliers,
        # NEW round 6: A-ES weighted sampling without replacement —
        # the importance-sampling curation primitive (length-weighted,
        # K per source, deterministic md5 uniforms).
        "weighted_source_sample": sampling.weighted_source_sample,
        # NEW round 6: distributed Gram matrix (X^T X) — the PCA /
        # whitening / OPQ-rotation kernel; map-side combine means only
        # n_partitions x dim^2 longs ever shuffle.
        "embedding_gram": vectors.embedding_gram,
        # NEW round 6: right-to-be-forgotten certified end-to-end —
        # hash-bucketed events, cohort deleted via merge_delete_parquet
        # (bounded rewrite, emptied buckets removed), read back and
        # hash-matched against the logical complement.
        "forget_users_events": events.forget_users_events,
        # NEW round 6: the composed faiss-IndexIVFPQ serving shape —
        # coarse probe -> 4-bit ADC shortlist -> exact rerank, each
        # tier already certified alone; this certifies the composition.
        "ann_ivfpq_topk": vectors.ann_ivfpq_topk,
        # NEW round 6 (verdict item 5): incremental near-dup dedup —
        # new batches probe the persisted MinHash band manifest; the
        # corpus side is never re-signatured.
        "incremental_neardup_manifest": textops.incremental_neardup_manifest,
        # NEW round 6 (verdict item 7): the compact-then-bucket layout
        # pipeline certified end-to-end — fragmented write ->
        # compact_parquet_dir -> bucketed tables -> exchange-free join,
        # hash-matched against the plain-layout oracle.
        "segment_order_stats_compacted": relational.segment_order_stats_compacted,
        # ================= end of the 50-slot checked window =================
        # COHORT-B remainder (round-5 certified, window next round):
        "ann_ivf_topk": vectors.ann_ivf_topk,
        "stream_click_purchase_full": streams.stream_click_purchase_full,
        "simhash_dups": textops.simhash_dups,
        "q18_large_volume": relational.q18_large_volume,
        "semantic_dedup": vectors.semantic_dedup,
        "funnel_conversion": events.funnel_conversion,
        "incremental_dedup_manifest": textops.incremental_dedup_manifest,
        "ann_sq8_topk": vectors.ann_sq8_topk,
        "stream_dedup_events": streams.stream_dedup_events,
        "domain_mix_sample": sampling.domain_mix_sample,
        "approx_percentile_bounds": relational.approx_percentile_bounds,
        "image_features_mm": multimodal.image_features_mm,
        "order_ship_calendar": relational.order_ship_calendar,
        "chunk_documents": textops.chunk_documents,
        "quality_filter": textops.quality_filter,
        "doc_repetition": textops.doc_repetition,
        "containment_dups": textops.containment_dups,
        "gopher_rules": textops.gopher_rules,
        "fuzzy_part_names": textops.fuzzy_part_names,
        "dup_clusters_star": textops.dup_clusters_star,
        "curation_pipeline": textops.curation_pipeline,
        "q2_min_cost_supplier": relational.q2_min_cost_supplier,
        "q8_market_share": relational.q8_market_share,
        "q21_waiting_suppliers": relational.q21_waiting_suppliers,
        "order_value_robust_stats": relational.order_value_robust_stats,
        "global_shuffle": sampling.global_shuffle,
        "stream_purchase_click_join": streams.stream_purchase_click_join,
        "stream_static_hourly": streams.stream_static_hourly,
        "stream_events_etl": streams.stream_events_etl,
        "stream_session_stats": streams.stream_session_stats,
        "stream_click_attribution": streams.stream_click_attribution,
        "stream_sliding_counts": streams.stream_sliding_counts,
        "srp_near_dups": vectors.srp_near_dups,
        "ann_kmeans_topk": vectors.ann_kmeans_topk,
        "image_resize_mm": multimodal.image_resize_mm,
        "audio_features_mm": multimodal.audio_features_mm,
        # COHORT-C (r1-r4 certified; window in round 8):
        "file_counts": parity.file_counts,
        "file_meta_concat": parity.file_meta_concat,
        "udtf_first_tokens": parity.udtf_first_tokens,
        "region_revenue": relational.region_revenue,
        "customer_order_stats": relational.customer_order_stats,
        "customers_without_orders": relational.customers_without_orders,
        "scalar_kitchen_sink": relational.scalar_kitchen_sink,
        "segment_setops": relational.segment_setops,
        "order_price_percentiles": relational.order_price_percentiles,
        "events_hourly": events.events_hourly,
        "events_json_extract": events.events_json_extract,
        "user_sessions": events.user_sessions,
        "approx_distinct_users": events.approx_distinct_users,
        "range_join_hot_windows": events.range_join_hot_windows,
        "dedup_exact": textops.dedup_exact,
        "ngram_jaccard_dups": textops.ngram_jaccard_dups,
        "tfidf_top_terms": textops.tfidf_top_terms,
        "parts_top3_per_brand": relational.parts_top3_per_brand,
        "embedding_near_dups": vectors.embedding_near_dups,
        "table_profile": sampling.table_profile,
        "rollup_sales": relational.rollup_sales,
        "events_hourly_filled": events.events_hourly_filled,
        "dup_clusters": textops.dup_clusters,
        "lang_id": textops.lang_id,
        "token_counts": textops.token_counts,
        "rolling_fingerprints": textops.rolling_fingerprints,
        "decontaminate_docs": textops.decontaminate_docs,
        "redact_pii": textops.redact_pii,
        "split_assign": sampling.split_assign,
        "stratified_sample": sampling.stratified_sample,
        "media_catalog": multimodal.media_catalog,
        "media_frame_plan": multimodal.media_frame_plan,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "supplier_balance_rank": relational.supplier_balance_rank,
        "doc_quality": textops.doc_quality,
        "doc_fingerprints": textops.doc_fingerprints,
        "order_priority_counts": relational.order_priority_counts,
        "distinct_parts_per_flag": relational.distinct_parts_per_flag,
        "top_customers_by_revenue": relational.top_customers_by_revenue,
        "customers_with_big_orders": relational.customers_with_big_orders,
        "order_line_arrays": relational.order_line_arrays,
        "returnflag_measures_unpivot": relational.returnflag_measures_unpivot,
        "daily_revenue_moving": relational.daily_revenue_moving,
        "pivot_line_status": relational.pivot_line_status,
        "orders_topk": relational.orders_topk,
        "cube_sales": relational.cube_sales,
        "grouping_sets_sales": relational.grouping_sets_sales,
        "window_kitchen_sink": relational.window_kitchen_sink,
        "hypertable_rollup": events.hypertable_rollup,
        "salted_user_counts": events.salted_user_counts,
        "inverted_index": parity.inverted_index,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "purchase_asof_click": events.purchase_asof_click,
        "pack_sequences": sampling.pack_sequences,
        "stream_hourly_counts": streams.stream_hourly_counts,
        # NOT registered: streams.stream_tws_sessions (Spark 4
        # transformWithStateInPandas). Its state protocol needs the
        # python protobuf runtime, permanently absent in this
        # container, so the applyInPandasWithState form
        # (stream_stateful_sessions, CORE cohort) is the permanent
        # certified sessionization path; the tws form stays as a
        # documented deployment recipe sharing the same oracle
        # (plans/streams.py:stream_tws_sessions docstring), with its
        # processor unit-tested against mock handles.
    }
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each query (ANSI, runs on the registered
    views region nation customer supplier part orders lineitem events
    documents embeddings)."""
    o: dict[str, str] = {}
    o.update(parity.PARITY_ORACLES)
    o.update(relational.RELATIONAL_ORACLES)
    o.update(events.EVENTS_ORACLES)
    o.update(streams.STREAMS_ORACLES)
    o.update(textops.TEXTOPS_ORACLES)
    o.update(sampling.SAMPLING_ORACLES)
    o.update(vectors.VECTORS_ORACLES)
    o.update(multimodal.MULTIMODAL_ORACLES)
    return o
