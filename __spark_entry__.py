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

    ROTATION POLICY (round-6 verdict item 1): STALEST-FIRST. Each
    round the window holds (a) the flagship parity sentinel
    `wordcount` (always slot 1 — the reference's whole engine path),
    (b) every query newly registered this round (never-certified =
    infinitely stale), then (c) the registered queries with the
    OLDEST last-driver-certified round, oldest first, until the 50
    slots are full. This replaces the round-5 fixed-cohort schedule,
    whose arithmetic (12 CORE + 38-query cohorts) could not actually
    reach the 25 r1/r3-certified stragglers the round-6 verdict
    flagged; stalest-first is self-scheduling and cannot strand a
    query. Derived from CORRECTNESS_r01-r06:

      round-7 window = wordcount
        + 11 last-certified-r1 (top_customers_by_revenue, doc_quality,
          supplier_balance_rank, customers_with_big_orders,
          daily_revenue_moving, distinct_parts_per_flag,
          doc_fingerprints, order_line_arrays, order_priority_counts,
          q6_forecast_revenue, returnflag_measures_unpivot)
        + 31 of the 36 last-certified-r5 (COHORT-B of the round-6
          verdict) — the other 5 (approx_percentile_bounds,
          q18_large_volume, global_shuffle, stream_sliding_counts,
          stream_static_hourly) are displaced by this round's 7 new
          registrations and move to round 8 (r5 -> r8 = exactly the
          3-round bound)
        + 7 new round-7 registrations (never-certified = stalest):
          forget_docs_neardup_manifest, forget_customers_scd2,
          events_skew_profile, early_user_activity,
          snapshot_diff_orders, triangle_count_suppliers,
          leakage_safe_split.
      round-8 window = wordcount + the 25 late round-7 registrations
          (never certified = stalest: bpe_pair_counts,
          user_sessions_skewproof, bloom_pruned_urgent_revenue,
          classifier_quality_scores, hll_sketch_rollup_users,
          trigram_lm_scores, boilerplate_ratio, ann_filtered_topk,
          collocation_pmi, bpe_learn_merges, pca_power_pc1,
          kcore_suppliers, keyword_search_topk,
          label_prop_communities, split_token_drift,
          decontaminate_fuzzy, ppr_supplier_recs,
          covisitation_lift, ann_mmr_topk,
          events_hourly_interp, retention_cohorts,
          lm_quality_mix_sample, repeated_spans,
          dpp_quarter_revenue, session_paths) + the 14
          last-certified-r3 + 10 of the 30 last-certified-r4 (= 50);
          the remaining 20 r4 queries and the 5 displaced r5 queries
          head round 9 alongside the r6-certified cohort.

    With 173 queries and 50 slots every query is certified at least
    once per ceil(173/50) = 4 rounds, in practice 3 for all but the
    r4/r5 holdovers displaced by the late round-7 registrations
    (they slip to round 9 — the only 4-round outliers), and every
    query — window or
    tail — is hash-checked against its DuckDB oracle by pytest
    (tests/test_relational.py auto-parametrizes over EVERY oracle_sql
    entry) every round. All registered queries are fully
    DuckDB-oracled — zero rows-only.
    """
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # ===== round-7 window slot 1: flagship parity sentinel =====
        "wordcount": parity.wordcount,
        # ===== round-7 window: the 11 last-certified-in-ROUND-1
        # stragglers (round-6 verdict item 1: pulled forward) =====
        "top_customers_by_revenue": relational.top_customers_by_revenue,
        "doc_quality": textops.doc_quality,
        "supplier_balance_rank": relational.supplier_balance_rank,
        "customers_with_big_orders": relational.customers_with_big_orders,
        "daily_revenue_moving": relational.daily_revenue_moving,
        "distinct_parts_per_flag": relational.distinct_parts_per_flag,
        "doc_fingerprints": textops.doc_fingerprints,
        "order_line_arrays": relational.order_line_arrays,
        "order_priority_counts": relational.order_priority_counts,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "returnflag_measures_unpivot": relational.returnflag_measures_unpivot,
        # ===== round-7 window: COHORT-B — the 36 last-certified-
        # in-ROUND-5 queries (round-6 verdict item 1) =====
        "ann_ivf_topk": vectors.ann_ivf_topk,
        "ann_kmeans_topk": vectors.ann_kmeans_topk,
        "ann_sq8_topk": vectors.ann_sq8_topk,
        "audio_features_mm": multimodal.audio_features_mm,
        "chunk_documents": textops.chunk_documents,
        "containment_dups": textops.containment_dups,
        "curation_pipeline": textops.curation_pipeline,
        "doc_repetition": textops.doc_repetition,
        "domain_mix_sample": sampling.domain_mix_sample,
        "dup_clusters_star": textops.dup_clusters_star,
        "funnel_conversion": events.funnel_conversion,
        "fuzzy_part_names": textops.fuzzy_part_names,
        "gopher_rules": textops.gopher_rules,
        "image_features_mm": multimodal.image_features_mm,
        "image_resize_mm": multimodal.image_resize_mm,
        "incremental_dedup_manifest": textops.incremental_dedup_manifest,
        "order_ship_calendar": relational.order_ship_calendar,
        "order_value_robust_stats": relational.order_value_robust_stats,
        "q21_waiting_suppliers": relational.q21_waiting_suppliers,
        "q2_min_cost_supplier": relational.q2_min_cost_supplier,
        "q8_market_share": relational.q8_market_share,
        "quality_filter": textops.quality_filter,
        "semantic_dedup": vectors.semantic_dedup,
        "simhash_dups": textops.simhash_dups,
        "srp_near_dups": vectors.srp_near_dups,
        "stream_click_attribution": streams.stream_click_attribution,
        "stream_click_purchase_full": streams.stream_click_purchase_full,
        "stream_dedup_events": streams.stream_dedup_events,
        "stream_events_etl": streams.stream_events_etl,
        "stream_purchase_click_join": streams.stream_purchase_click_join,
        "stream_session_stats": streams.stream_session_stats,
        # ===== round-7 window: new round-7 registrations =====
        # NEW round 7 (verdict item 6): right-to-be-forgotten
        # propagated into DERIVED state — the near-dup band/doc
        # manifests (delete + bounded re-decide of victim-pointing
        # docs) and the SCD2 dimension history (partition-bounded
        # delete), each hash-matched against a full recompute over the
        # complement corpus ("the victims never existed").
        "forget_docs_neardup_manifest": textops.forget_docs_neardup_manifest,
        "forget_customers_scd2": relational.forget_customers_scd2,
        # NEW round 7 (the skew + data-management set):
        # - events_skew_profile: heavy-hitter/skew diagnostics (the
        #   measurement that decides when the salting levers apply)
        # - early_user_activity: fact-to-derived-dim join routed
        #   through operators/scale.split_hot_key_join (hot keys
        #   broadcast, cold keys shuffle; oracle = the plain join)
        # - snapshot_diff_orders: two-snapshot added/removed/changed
        #   diff via one co-partitioned full-outer join
        # - triangle_count_suppliers: triangle counting on the
        #   supplier co-occurrence graph (3rd graph-family algorithm)
        # - leakage_safe_split: train/val/test split by near-dup
        #   CLUSTER so eval leakage is structurally impossible
        "events_skew_profile": events.events_skew_profile,
        "early_user_activity": events.early_user_activity,
        "snapshot_diff_orders": relational.snapshot_diff_orders,
        "triangle_count_suppliers": relational.triangle_count_suppliers,
        "leakage_safe_split": textops.leakage_safe_split,
        # ================= end of the 50-slot checked window =================
        # Tail (pytest-oracled every round; round-8 window takes the
        # r3/r4-certified block below, per the rotation policy):
        # bpe_pair_counts registered late in round 7 after the window
        # filled — never-certified, so it HEADS the round-8 window
        # (stalest-first), displacing one r5 holdover to round 9.
        "bpe_pair_counts": textops.bpe_pair_counts,
        # user_sessions_skewproof: split-and-stitch sessionization
        # (bucket-local windows + session-stub merge) — the window-skew
        # lever; same oracle as user_sessions. Heads round 8 with bpe.
        "user_sessions_skewproof": events.user_sessions_skewproof,
        # bloom_pruned_urgent_revenue: explicit Bloom-bitmap join
        # pruning (operators/scale.bloom_prefilter) — fact rows that
        # cannot match drop BEFORE the join shuffle; oracle = the
        # plain join. Late round-7 registration, heads round 8.
        "bloom_pruned_urgent_revenue": relational.bloom_pruned_urgent_revenue,
        # classifier_quality_scores: hashed-linear-model (fastText-
        # style) quality inference, zero-shuffle in-row F.aggregate
        # fold. Late round-7 registration, heads round 8.
        "classifier_quality_scores": textops.classifier_quality_scores,
        # hll_sketch_rollup_users: mergeable DataSketches HLL rollup
        # (daily sketches -> union-merged estimate, 5% bound asserted
        # in-query). Late round-7 registration, heads round 8.
        "hll_sketch_rollup_users": events.hll_sketch_rollup_users,
        # trigram_lm_scores: corpus-trained add-one trigram LM, per-doc
        # mean probability (the CCNet perplexity-filter shape), sums
        # exact via 2^30 floor-quantization. Late round-7 registration,
        # heads round 8.
        "trigram_lm_scores": textops.trigram_lm_scores,
        # boilerplate_ratio: share of each doc's distinct 4-gram
        # shingles recurring in >= 5 docs (cross-corpus boilerplate,
        # complement of doc_repetition's within-doc signal). Late
        # round-7 registration, heads round 8.
        "boilerplate_ratio": textops.boilerplate_ratio,
        # ann_filtered_topk: filtered vector search (label predicate
        # pushed into the scan BEFORE any distance work — the
        # "ANN + metadata WHERE" serving shape). Late round-7
        # registration, heads round 8.
        "ann_filtered_topk": vectors.ann_filtered_topk,
        # collocation_pmi: phrase mining — top adjacent pairs by PMI
        # (frequency-normalized, unlike bpe_pair_counts' raw counts);
        # totals derive from the reduced count tables, scoring joins
        # are vocabulary-sized. Late round-7 registration, heads
        # round 8.
        "collocation_pmi": textops.collocation_pmi,
        # bpe_learn_merges: the FULL BPE tokenizer-induction loop — 3
        # iterations of count -> argmax -> corpus-wide greedy merge
        # (in-row, shuffle-free apply); oracle unrolls all iterations
        # as a CTE chain. Late round-7 registration, heads round 8.
        "bpe_learn_merges": textops.bpe_learn_merges,
        # pca_power_pc1: leading principal direction by power
        # iteration on the distributed Gram matrix (in-row pinned
        # folds on the single matrix row), corpus projected onto it —
        # the embedding_gram kernel actually consumed; oracle unrolls
        # all iterations. Late round-7 registration, heads round 8.
        "pca_power_pc1": vectors.pca_power_pc1,
        # kcore_suppliers: truncated k-core peeling on the supplier
        # co-occurrence backbone (4th graph algorithm); convergence
        # within the fixed rounds asserted in tests/test_graph.py.
        # Late round-7 registration, heads round 8.
        "kcore_suppliers": relational.kcore_suppliers,
        # keyword_search_topk: lexical retrieval (fixed multi-term
        # query, rational tf-idf surrogate, fixed-order term sum) —
        # the keyword complement of the ANN serving family. Late
        # round-7 registration, heads round 8.
        "keyword_search_topk": textops.keyword_search_topk,
        # label_prop_communities: synchronous label-propagation
        # community detection on the supplier backbone (5th graph
        # algorithm — the density-REGION question CC/k-core/PageRank
        # don't answer); min-label tie-break + fixed rounds so the
        # oracle replays every round. Late round-7 registration,
        # heads round 8.
        "label_prop_communities": relational.label_prop_communities,
        # split_token_drift: ppm-quantized total-variation distance
        # between the train/val token distributions of split_assign,
        # per language — the split-health validation; integer-exact
        # end-to-end (events_skew_profile ppm idiom). Late round-7
        # registration, heads round 8.
        "split_token_drift": sampling.split_token_drift,
        # decontaminate_fuzzy: paraphrase-level benchmark scrub —
        # MinHash/LSH band probe of an indexed bench set, exact-jaccard
        # verified; the fuzzy complement of decontaminate_docs' exact
        # 5-gram collision. Late round-7 registration, heads round 8.
        "decontaminate_fuzzy": textops.decontaminate_fuzzy,
        # ppr_supplier_recs: personalized PageRank (random walk with
        # restart to a seed customer cohort) on the bidirectional
        # bipartite purchase graph — the P3 recommender, personalized
        # complement of the global PageRank pair. Late round-7
        # registration, heads round 8.
        "ppr_supplier_recs": relational.ppr_supplier_recs,
        # covisitation_lift: item-to-item co-occurrence with exact
        # integer-ppm lift over user baskets — the collaborative-
        # filtering counting primitive; deterministic per-user cap
        # bounds the quadratic pair term. Late round-7
        # registration, heads round 8.
        "covisitation_lift": events.covisitation_lift,
        # ann_mmr_topk: Maximal Marginal Relevance diversity
        # re-ranking over an exact shortlist — the RAG result-list
        # serving shape; oracle unrolls all greedy steps. Late
        # round-7 registration, heads round 8.
        "ann_mmr_topk": vectors.ann_mmr_topk,
        # events_hourly_interp: linear-interpolation resampling —
        # the gauge/rate gap-handling form next to filled's
        # forward-fill; integer-exact with pinned floor-division
        # semantics. Late round-7 registration, heads round 8.
        "events_hourly_interp": events.events_hourly_interp,
        # retention_cohorts: weekly cohort retention matrix —
        # first-activity cohorts x weeks-since, integer-ppm
        # retention; the long-horizon engagement view. Late
        # round-7 registration, heads round 8.
        "retention_cohorts": events.retention_cohorts,
        # lm_quality_mix_sample: LM-score-decile mixture sampling —
        # keep probability rises with trigram-LM quality via the
        # deterministic md5 gate; oracle embeds the full LM replay.
        # Late round-7 registration, heads round 8.
        "lm_quality_mix_sample": textops.lm_quality_mix_sample,
        # repeated_spans: exact repeated-substring span extraction
        # (the Lee-et-al substring-dedup form — which token ranges
        # to cut, not just which docs pair up); windowed-hash
        # replacement for the suffix array. Late round-7
        # registration, heads round 8.
        "repeated_spans": textops.repeated_spans,
        # dpp_quarter_revenue: dynamic partition pruning certified
        # end-to-end — runtime IN-subquery from a filtered broadcast
        # dim prunes the month-partitioned fact scan; answer checked
        # against the plain unpartitioned oracle. Late round-7
        # registration, heads round 8.
        "dpp_quarter_revenue": relational.dpp_quarter_revenue,
        # session_paths: top in-session event-type trigram journeys
        # — the path-mining complement of the fixed-sequence funnel.
        # Late round-7 registration, heads round 8.
        "session_paths": events.session_paths,
        "stream_static_hourly": streams.stream_static_hourly,
        "stream_sliding_counts": streams.stream_sliding_counts,
        "global_shuffle": sampling.global_shuffle,
        "q18_large_volume": relational.q18_large_volume,
        "approx_percentile_bounds": relational.approx_percentile_bounds,
        "decontaminate_docs": textops.decontaminate_docs,
        "dup_clusters": textops.dup_clusters,
        "events_hourly_filled": events.events_hourly_filled,
        "lang_id": textops.lang_id,
        "media_catalog": multimodal.media_catalog,
        "media_frame_plan": multimodal.media_frame_plan,
        "orders_topk": relational.orders_topk,
        "pivot_line_status": relational.pivot_line_status,
        "redact_pii": textops.redact_pii,
        "rolling_fingerprints": textops.rolling_fingerprints,
        "rollup_sales": relational.rollup_sales,
        "split_assign": sampling.split_assign,
        "stratified_sample": sampling.stratified_sample,
        "token_counts": textops.token_counts,
        "approx_distinct_users": events.approx_distinct_users,
        "cube_sales": relational.cube_sales,
        "customer_order_stats": relational.customer_order_stats,
        "customers_without_orders": relational.customers_without_orders,
        "dedup_exact": textops.dedup_exact,
        "embedding_near_dups": vectors.embedding_near_dups,
        "events_hourly": events.events_hourly,
        "events_json_extract": events.events_json_extract,
        "file_counts": parity.file_counts,
        "file_meta_concat": parity.file_meta_concat,
        "grouping_sets_sales": relational.grouping_sets_sales,
        "hypertable_rollup": events.hypertable_rollup,
        "inverted_index": parity.inverted_index,
        "ngram_jaccard_dups": textops.ngram_jaccard_dups,
        "order_price_percentiles": relational.order_price_percentiles,
        "pack_sequences": sampling.pack_sequences,
        "parts_top3_per_brand": relational.parts_top3_per_brand,
        "purchase_asof_click": events.purchase_asof_click,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "range_join_hot_windows": events.range_join_hot_windows,
        "region_revenue": relational.region_revenue,
        "salted_user_counts": events.salted_user_counts,
        "scalar_kitchen_sink": relational.scalar_kitchen_sink,
        "segment_setops": relational.segment_setops,
        "stream_hourly_counts": streams.stream_hourly_counts,
        "table_profile": sampling.table_profile,
        "tfidf_top_terms": textops.tfidf_top_terms,
        "udtf_first_tokens": parity.udtf_first_tokens,
        "user_sessions": events.user_sessions,
        "window_kitchen_sink": relational.window_kitchen_sink,
        # round-6-certified (freshest; window again in round 9):
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
        "click_next_purchase": events.click_next_purchase,
        "revenue_trailing_window": relational.revenue_trailing_window,
        "frequent_brands_sketch": relational.frequent_brands_sketch,
        "ann_pq_adc_topk": vectors.ann_pq_adc_topk,
        "ann_pq_rerank_topk": vectors.ann_pq_rerank_topk,
        "ann_pq_trained_topk": vectors.ann_pq_trained_topk,
        "lateral_top_lines": relational.lateral_top_lines,
        "recursive_month_spine": relational.recursive_month_spine,
        "q6_zorder_scan": relational.q6_zorder_scan,
        "scd2_customer_priority": relational.scd2_customer_priority,
        "pit_priority_revenue": relational.pit_priority_revenue,
        "canonical_part_names": textops.canonical_part_names,
        "stream_scd2_user_state": streams.stream_scd2_user_state,
        "stream_converting_clicks": streams.stream_converting_clicks,
        "pagerank_suppliers": relational.pagerank_suppliers,
        "pagerank_directed_suppliers": relational.pagerank_directed_suppliers,
        "weighted_source_sample": sampling.weighted_source_sample,
        "embedding_gram": vectors.embedding_gram,
        "forget_users_events": events.forget_users_events,
        "ann_ivfpq_topk": vectors.ann_ivfpq_topk,
        "incremental_neardup_manifest": textops.incremental_neardup_manifest,
        "segment_order_stats_compacted": relational.segment_order_stats_compacted,
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
