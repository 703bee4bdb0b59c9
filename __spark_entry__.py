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
    FIRST 50 entries only, so slots 1-50 hold one fully-oracled query
    per distinct operator family. LATE round 5: five round-4-certified
    queries (cube_sales, grouping_sets_sales, window_kitchen_sink,
    hypertable_rollup, salted_user_counts) vacated to the tail for the
    five riskiest never-certified round-5 additions (q2/q8/q21 of the
    completed TPC-H set, ann_sq8_topk, stream_late_data_drop). Earlier
    in round 5 the window ROTATED per the round-4 verdict: the 15 queries that had never held a recorded
    driver CORRECTNESS row (ann_ivf_topk, ann_kmeans_topk,
    approx_percentile_bounds, audio_features_mm, chunk_documents,
    doc_repetition, domain_mix_sample, global_shuffle,
    image_features_mm, image_resize_mm, inverted_index_topn,
    quality_filter, stream_click_attribution, stream_session_stats,
    stream_sliding_counts) moved IN; 15 queries certified green in all
    of rounds 1-4 (file_counts, file_meta_concat, udtf_first_tokens,
    region_revenue, customer_order_stats, customers_without_orders,
    scalar_kitchen_sink, segment_setops, order_price_percentiles,
    events_hourly, events_json_extract, user_sessions,
    approx_distinct_users, range_join_hot_windows, dedup_exact) moved
    to the tail — each vacated family stays covered in-window by a
    sibling (wordcount/kv_pipeline for the parity scan+UDF path,
    stream_hourly_counts for hourly aggregation, q18's IN-subquery +
    purchase_asof_click for joins, approx_percentile_bounds for the
    sketch family, minhash/simhash/containment for dedup). Rotated-out
    queries stay hash-checked by the pytest oracle replicas
    (tests/oracle.py, auto-parametrized over every oracle_sql entry).
    Every registered query is fully DuckDB-oracled (since late round
    4) — zero rows-only entries.
    """
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # —— reference parity (SURVEY.md §2.2) ——
        "wordcount": parity.wordcount,
        # (LATE-r5 window swap 2: inverted_index, q1_pricing_summary,
        # purchase_asof_click, pack_sequences, stream_hourly_counts —
        # all r1-r4-certified, families still in-window via
        # inverted_index_topn / q6_clustered_scan / click-family
        # streams / domain_mix+integrity / stream_sliding+late_drop —
        # vacate for the five newest never-certified queries.)
        "events_variant_stats": events.events_variant_stats,
        "inverted_index_topn": parity.inverted_index_topn,
        "kv_pipeline": parity.kv_pipeline,
        # —— relational surface (SURVEY.md §2.4 — built-ins the reference lacks) ——
        "lateral_top_lines": relational.lateral_top_lines,
        # NEW round 5: Q6 over a range-clustered layout — the file-level
        # skipping lever exercised end-to-end in a certified query
        # (vacates ngram_jaccard_dups to the tail; minhash/simhash/
        # containment keep the dedup family in-window).
        "q6_clustered_scan": relational.q6_clustered_scan,
        # NEW round 5: the one join type nothing else exercised
        # (vacates parts_top3_per_brand, certified r1-r4, to the tail;
        # window_kitchen_sink keeps rank windows in-window).
        "order_ship_calendar": relational.order_ship_calendar,
        "approx_percentile_bounds": relational.approx_percentile_bounds,
        # —— events / time-series ——
        "recursive_month_spine": relational.recursive_month_spine,
        # —— training-data pipeline: text ops (north-star extensions) ——
        "chunk_documents": textops.chunk_documents,
        "quality_filter": textops.quality_filter,
        "doc_repetition": textops.doc_repetition,
        "minhash_dups": textops.minhash_dups,
        "simhash_dups": textops.simhash_dups,
        "containment_dups": textops.containment_dups,
        "gopher_rules": textops.gopher_rules,
        "semantic_dedup": vectors.semantic_dedup,
        "fuzzy_part_names": textops.fuzzy_part_names,
        "funnel_conversion": events.funnel_conversion,
        "dup_clusters_star": textops.dup_clusters_star,
        "curation_pipeline": textops.curation_pipeline,
        # —— relational tail families rotated into the window (round 4) ——
        "q18_large_volume": relational.q18_large_volume,
        # LATE round 5 window swap: cube_sales, grouping_sets_sales,
        # window_kitchen_sink, hypertable_rollup, salted_user_counts
        # (all driver-certified green in round 4, families still
        # covered by rollup/pivot/revenue_trailing_window/events
        # siblings in the pytest oracle gate) vacate to the tail; the
        # five RISKIEST never-certified round-5 additions take their
        # slots: the two hardest new TPC-H subquery shapes, the SQ8
        # quantizer, and the watermark late-drop gate.
        "q2_min_cost_supplier": relational.q2_min_cost_supplier,
        "q8_market_share": relational.q8_market_share,
        "q21_waiting_suppliers": relational.q21_waiting_suppliers,
        "ann_sq8_topk": vectors.ann_sq8_topk,
        "stream_late_data_drop": streams.stream_late_data_drop,
        # —— training-data pipeline: dataset management ——
        "order_value_robust_stats": relational.order_value_robust_stats,
        # NEW round 5: declarative data-quality gate (PK/FK/null/domain
        # checks, one row per constraint) — vacates table_profile
        # (certified r1-r4; profiling family stays represented here).
        "integrity_report": sampling.integrity_report,
        # —— training-data pipeline: dataset management (tail rotated in) ——
        "domain_mix_sample": sampling.domain_mix_sample,
        "global_shuffle": sampling.global_shuffle,
        # —— structured streaming (stream/batch parity) ——
        "incremental_dedup_manifest": textops.incremental_dedup_manifest,
        "stream_purchase_click_join": streams.stream_purchase_click_join,
        "stream_stateful_sessions": streams.stream_stateful_sessions,
        "stream_static_hourly": streams.stream_static_hourly,
        "stream_dedup_events": streams.stream_dedup_events,
        "stream_events_etl": streams.stream_events_etl,
        "stream_sliding_counts": streams.stream_sliding_counts,
        "stream_session_stats": streams.stream_session_stats,
        "stream_click_attribution": streams.stream_click_attribution,
        # NEW round 5: full-outer stream-stream interval join —
        # completes the inner/left-outer/full-outer family (vacates
        # embedding_near_dups, certified r1-r4 and 0 rows at sf0.01;
        # its blocked-exact pair path stays certified through
        # semantic_dedup and semantic_dedup_cells, which share
        # blocked_near_dup_pairs and emit real pairs).
        "stream_click_purchase_full": streams.stream_click_purchase_full,
        # —— training-data pipeline: similarity search ——
        "similarity_topk": vectors.similarity_topk,
        "srp_near_dups": vectors.srp_near_dups,
        "ann_ivf_topk": vectors.ann_ivf_topk,
        "ann_kmeans_topk": vectors.ann_kmeans_topk,
        # NEW round 5: SemDeDup over LEARNED k-means cells (the
        # no-natural-blocks 100 TB form), Lloyd-replay + closure oracle
        # (vacates tfidf_top_terms, certified r1-r4, to the tail).
        "semantic_dedup_cells": vectors.semantic_dedup_cells,
        # —— training-data pipeline: multimodal columns ——
        "frame_checksums_mm": multimodal.frame_checksums_mm,
        "image_resize_mm": multimodal.image_resize_mm,
        "image_features_mm": multimodal.image_features_mm,
        "audio_features_mm": multimodal.audio_features_mm,
        # ================= end of the 50-slot checked window =================
        # Oracled queries past the driver window (each hash-checked by
        # the pytest oracle replicas in tests/; every query below holds
        # at least one driver-certified green CORRECTNESS row from
        # rounds 1-4 before rotating out):
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
        # NEW round 5 (late): four more classic TPC-H shapes the
        # surface lacked — Q3 top-k join-agg, Q14 conditional agg over
        # a join, Q7 role-played dimension, Q22 scalar-subquery
        # threshold + anti join. Tail slots: pytest-oracled now,
        # rotation candidates for the round-6 window.
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q14_promo_effect": relational.q14_promo_effect,
        "q7_nation_volume": relational.q7_nation_volume,
        "q22_dormant_rich": relational.q22_dormant_rich,
        # Q17: correlated per-group scalar subquery, decorrelated as
        # aggregate-then-join; Q19: OR-of-ANDs spanning both join sides.
        "q17_small_quantity": relational.q17_small_quantity,
        "q19_discounted_revenue": relational.q19_discounted_revenue,
        # Forward as-of join (time-to-convert): mirror of the certified
        # backward purchase_asof_click.
        "click_next_purchase": events.click_next_purchase,
        # VALUE-based (RANGE) window frame over a gapped calendar — the
        # frame kind the ROWS window queries can't express.
        "revenue_trailing_window": relational.revenue_trailing_window,
        # Heavy hitters (Karp/Misra-Gries freqItems) — third sketch
        # family, bound-asserted like the HLL and t-digest queries.
        "frequent_brands_sketch": relational.frequent_brands_sketch,
        # Completing the 22 classic TPC-H shapes (adapted to the
        # available columns where the spec needs partsupp/shipmode —
        # each docstring states the adaptation): correlated EXISTS
        # (Q4), two-conjunct local-supplier join (Q5), returned-item
        # top-k (Q10), scalar-subquery HAVING (Q11), derived-category
        # conditional counts (Q12), outer-join-count distribution
        # (Q13), view + scalar-max (Q15).
        "q4_order_priority": relational.q4_order_priority,
        "q5_local_supplier_volume": relational.q5_local_supplier_volume,
        "q10_returned_items": relational.q10_returned_items,
        "q11_important_brands": relational.q11_important_brands,
        "q12_ship_latency": relational.q12_ship_latency,
        "q13_order_distribution": relational.q13_order_distribution,
        "q15_top_supplier": relational.q15_top_supplier,
        # ... and the subquery-heavy half: joined-cost profit (Q9),
        # NOT-IN distinct counts (Q16), nested correlated quantity
        # threshold (Q20). (Q2, Q8, Q21 sit in the certified window
        # above.) With these the catalog covers all 22 classic TPC-H
        # query shapes.
        "q9_product_profit": relational.q9_product_profit,
        "q16_part_supplier_counts": relational.q16_part_supplier_counts,
        "q20_dominant_suppliers": relational.q20_dominant_suppliers,
        # Spark 4 transformWithStateInPandas: the sessionizer through
        # the new arbitrary-state API (typed handles + named timers,
        # RocksDB provider), hash-checked against the same oracle as
        # the applyInPandasWithState form. Registered only where the
        # python protobuf package (its state protocol) exists — absent
        # in this container, so the processor is mock-unit-tested and
        # the applyInPandasWithState form stays the certified one.
        **(
            {"stream_tws_sessions": streams.stream_tws_sessions}
            if streams.HAS_PROTOBUF
            else {}
        ),
        # PQ/ADC — the second compression tier after SQ8: 4-bit
        # sub-space codes (32x scan-byte cut), asymmetric distance
        # scoring, md5-sampled codebooks replayed by the oracle —
        # plus the production serving shape (ADC shortlist -> exact
        # cosine re-rank; the oracle composes both stages).
        "ann_pq_adc_topk": vectors.ann_pq_adc_topk,
        "ann_pq_rerank_topk": vectors.ann_pq_rerank_topk,
        # Trained-codebook PQ (per-sub-space Lloyd's; the oracle
        # unrolls all m sub-space fits as CTE chains).
        "ann_pq_trained_topk": vectors.ann_pq_trained_topk,
        # vacated from the window late round 5 (driver-certified green
        # in round 4; pytest oracle gate keeps them regression-checked)
        "cube_sales": relational.cube_sales,
        "grouping_sets_sales": relational.grouping_sets_sales,
        "window_kitchen_sink": relational.window_kitchen_sink,
        "hypertable_rollup": events.hypertable_rollup,
        "salted_user_counts": events.salted_user_counts,
        # vacated in late-r5 window swap 2 (r1-r4-certified; pytest
        # oracle gate keeps them regression-checked)
        "inverted_index": parity.inverted_index,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "purchase_asof_click": events.purchase_asof_click,
        "pack_sequences": sampling.pack_sequences,
        "stream_hourly_counts": streams.stream_hourly_counts,
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
