"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual query surface lives in
``market_data_pipeline_spark.plans.driver_queries`` — one entry per
operator family from SURVEY §2 plus the Phase-6 LLM-pipeline extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from market_data_pipeline_spark.plans.driver_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the per-market daily
    summary (broadcast fact⋈dim join + grouped exact aggregation)."""
    from market_data_pipeline_spark.plans.driver_queries import a6_daily_market_summary

    return a6_daily_market_summary(spark, "/root/testdata/sf0.001")


# Recording order (rolling, machine-derived — r8 verdict #1). The
# driver records only a ~50-row PREFIX of queries() iteration order per
# round, so the order IS the re-record policy. From round 9 on it is
# computed from the CORRECTNESS_r*.json trail itself instead of
# hand-maintained frozensets (rounds 2-8 drifted those three times):
#
#   tier 0 — oracled queries with NO hash-green driver row in ANY
#            correctness file: never-green backlog and this round's new
#            registrations alike (a new registration has no row yet).
#   tier 1 — green queries, OLDEST newest-green round first: the ~50
#            stalest greens are re-recorded every round, so no green
#            row ages past ~ceil(|registry| / 50) rounds (~7 at 359).
#   tier 2 — rows-only queries (no oracle): can never hash-green,
#            recorded dead last.
#
# Within each tier, cheapest-first by the measured sf0.1 cost table so a
# time-budgeted window covers the most queries.


def _newest_green_round() -> dict[str, int]:
    """Per query: the newest round whose CORRECTNESS_r*.json has a
    hash_match=true row — the query's driver-trail vintage."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.load(open(path))
        except Exception:
            continue  # a malformed trail file degrades order, not correctness
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest

# Measured driver wall-times (BENCH_r01/r02, sf0.1, seconds) — used only to
# sort WITHIN each tier cheapest-first, so a time-budgeted recording window
# covers the most queries. Stale entries degrade only the order, never
# correctness; new/unlisted queries default to mid-cost 1.0.
_COST = {
    "tx6_length_histogram": 0.14, "tpch_q6_forecast_revenue": 0.17,
    "a7_market_counts": 0.18, "smp1_hash_sample": 0.18, "smp2_stratified": 0.21,
    "tx5_vocabulary": 0.25, "tpch_q14_promo_effect": 0.33, "f1_normalize_chain": 0.34,
    "tpch_q15_top_supplier": 0.35, "tpch_q13_customer_distribution": 0.35,
    "ts2_volatility": 0.38, "ts1_sma": 0.42, "ts4_weekly_ohlc": 0.43,
    "ts6_range_avg": 0.44, "tpch_q22_idle_balances": 0.45, "e4_json_props": 0.45,
    "e5_funnel_users": 0.45, "tpch_q19_disjunctive_revenue": 0.46,
    "cdc1_snapshot_diff": 0.48, "tx4_fingerprint": 0.50, "tpch_q12_delay_priority": 0.52,
    "tpch_q4_order_priority": 0.53, "er1_similar_supplier_names": 0.56,
    "r6_rank_functions": 0.56, "tpch_q16_supplier_cnt": 0.58, "tx7_clean_corpus": 0.59,
    "tpch_q10_returned_items": 0.63, "tpch_q7_nation_volume": 0.70,
    "tpch_q5_local_supplier": 0.80, "tpch_q17_small_qty_revenue": 0.81,
    "j8_segment_top_orders": 0.86, "tpch_q9_product_profit": 0.87,
    "tpch_q8_market_share": 0.88, "iv1_interval_join": 0.96,
    "j7_revenue_by_nation": 1.01, "tpch_q18_large_volume_customers": 1.05,
    "r3_cube_flag_status": 1.15, "ivm1_merged_summary": 1.17, "k3_knn_lsh": 1.16,
    "st1_streaming_tumbling": 1.20, "r2_rollup_market_year": 1.28, "ts3_drawdown": 1.36,
    "st5_stream_static_join": 1.39, "k4_knn_ivf": 1.43, "apx2_price_quantiles": 1.49,
    "mm5_audio_stats": 1.53, "f9_month_buckets": 1.57, "mm1_image_stats": 1.62,
    "r4_pivot_market_year": 1.68, "mm4_image_knn": 1.73, "dd6_cosine_near_dup_lsh": 1.25,
    "r5_symbol_deciles": 1.81, "tpch_q1_pricing_summary": 1.81, "r1_top3_per_market": 1.89,
    "st3_streaming_sessions": 1.87, "st2_streaming_user_totals": 2.00,
    "apx1_approx_distinct": 2.00, "ts5_asof_prices": 2.20,
    "k5_knn_ivf_kmeans": 2.50, "st4_streaming_dedup": 2.70,
    "tpch_q21_suppliers_waiting": 2.91, "mm3_frame_sample": 3.02,
    "mm2_resize_roundtrip": 4.19,
    # round-2 measurements / estimates (CC queries assume the round-3
    # edge-checkpoint fix)
    "dd3_minhash_lsh": 1.70, "dd4_simhash_pairs": 1.02,
    "tx8_tfidf_terms": 0.97, "tx9_redact_pii": 0.87, "ck1_chunk_documents": 0.38,
    "pk1_pack_sequences": 0.27, "smp3_group_split": 0.15,
    "dd9_ngram_jaccard_capped": 1.22, "st6_stream_stream_join": 2.50,
    "ts7_bollinger": 0.45, "ts8_rsi": 0.50, "ts9_rolling_corr": 0.90,
    "r7_grouping_sets": 1.15, "dq1_lineitem_constraints": 0.80,
    "dd7_dup_clusters": 3.00, "dd8_dedup_corpus": 3.50,
    "dd10_dedup_keep_best": 3.50,
    "tpch_q2_min_cost_supplier": 1.00, "tpch_q11_important_stock": 0.80,
    "tpch_q20_promotion_suppliers": 0.60,
    # round-3 additions (estimates from sf0.01 oracle-check wall times)
    "tpch_q3_shipping_priority": 0.70, "tx10_repetition_stats": 0.60,
    "shf1_shuffle_shards": 0.50, "sd1_semantic_dedup": 0.80,
    "dc1_decontaminate": 1.20, "smp4_weighted_sample": 0.25,
    "mix1_domain_quota": 0.40, "ts10_zscore_outliers": 0.60,
    "e6_retention_cohorts": 0.50, "dd11_incremental_dedup": 0.45,
    "r8_unpivot_ohlc": 0.45, "dp1_profile_lineitem": 0.55,
    "ts11_forward_fill": 0.45, "st7_streaming_ingest_dedup": 1.50, "iv2_concurrent_sessions": 0.90, "ts12_linear_trend": 0.50,
    "ts13_market_beta": 1.10, "j9_salted_join": 0.50,
    "u4_intersect_symbols": 0.55, "a11_modal_priority": 0.50,
    "tx11_lm_quality": 0.80,
    # round-3 second pass (estimates from sf0.01 oracle-check wall times)
    "tx12_bm25": 0.63, "dd12_crossdoc_ngram": 1.21, "k6_knn_graph": 1.19,
    "j10_bloom_semi_join": 1.86, "ts14_ewma": 0.55,
    "mix2_temperature_resample": 0.50, "e7_cumulative_users": 0.46,
    "ts15_calendar_fill": 0.35, "iv3_nearest_event": 0.70,
    "ts16_rolling_median": 0.33, "u5_bag_difference": 0.36,
    "ts17_cusum": 0.34, "apx3_sketch_rollup": 1.04,
    "tx13_bigram_lm": 1.14, "e8_last_touch_attribution": 0.60,
    "st8_streaming_ewma": 1.46, "dq2_freshness": 0.46,
    "ts18_adjusted_close": 0.56, "ts19_vwap": 0.32,
    "e9_markov_transitions": 0.55, "st9_streaming_windowed_topk": 1.40,
    "dp2_quantity_drift": 0.40, "dd13_span_dedup": 1.20, "shf2_interleave_sources": 0.60, "k7_knn_pq": 1.30, "ts20_seasonal_baseline": 0.45, "smp5_negative_sampling": 0.75, "st10_streaming_running_stats": 1.50, "ts21_robust_scale": 0.45, "iv4_allen_relations": 0.90,
    # round-4 additions (estimates from sf0.01 oracle-check wall times)
    "ts22_sharpe": 0.45, "ts23_donchian": 0.50, "ts24_return_autocorr": 0.50,
    "ts25_xs_momentum": 1.21, "ts26_amihud_illiquidity": 1.55,
    "ts27_candlestick_flags": 0.55, "e10_conversion_latency": 0.50,
    "e11_rfm_scores": 1.20, "e12_burst_detection": 0.45,
    "tx14_sentence_stats": 0.45, "tx15_zipf_slope": 0.70,
    "dd14_crossdoc_sentences": 0.70, "smp6_quantile_stratified": 0.50,
    "j11_band_range_join": 0.55, "dq3_childless_orders": 0.50,
    "a12_weighted_market_return": 1.48, "u6_symmetric_difference": 0.55,
    "iv5_interval_coverage": 0.55, "e13_bounce_rate": 0.50,
    "cdc2_status_history": 0.75, "k8_radius_search": 0.60,
    "st11_streaming_burst": 1.29, "mm6_phash_dedup": 1.20,
    "e14_sliding_active_users": 0.55, "pk2_bucketed_batches": 0.45,
    "tx16_quality_gate": 0.50, "st12_streaming_sliding": 1.30,
    "ts28_drawdown_duration": 1.56, "smp7_group_reservoir": 0.40,
    "r9_pareto_symbols": 2.27, "f10_time_features": 0.45,
    "tx17_bpe_pairs": 0.55, "k9_label_centroids": 0.53,
    "apx4_heavy_hitters": 0.70, "e15_session_paths": 0.55,
    "fx1_feature_matrix": 0.55, "fx2_point_in_time_join": 0.90,
    "smp8_purged_split": 0.55, "apx5_sliding_actives_hll": 0.60,
    # round-5 additions (estimates from sf0.01 oracle-check wall times)
    "e16_interarrival_stats": 0.48, "e17_hourly_profile": 0.38,
    "e18_first_touch_attribution": 0.43, "e19_event_type_pairs": 0.28,
    "e20_stickiness": 0.32, "dq4_ship_lag": 0.68, "dq5_benford_digits": 0.22,
    "ts29_ulcer_index": 1.52, "ts30_obv": 1.84, "ts31_streaks": 3.09,
    "r10_share_of_total": 1.67, "r11_close_quartiles": 0.34,
    "smp9_systematic_sample": 0.83, "k10_centroid_distances": 0.51,
    "tx18_charset_stats": 0.69, "a13_advance_decline": 0.84,
    "cdc3_point_in_time_status": 0.26, "k11_norm_stats": 0.39,
    "fx3_lagged_features": 0.33, "tx19_dup_sentences": 0.26,
    "j12_nation_top_customers": 0.62, "ts32_monthly_seasonality": 0.38,
    "st13_streaming_distinct_users": 1.81,
    # round-5 batch 3/4 (measured in-session at sf0.1)
    "dp3_profile_orders": 1.84, "iv6_activity_span": 0.38,
    "dd15_prefix_dup_groups": 0.24, "ts33_weekly_atr": 0.39,
    "a14_hhi_concentration": 1.79, "k12_mmr_diverse": 0.57,
    "mm7_scene_changes": 0.83, "tx20_lexical_diversity": 0.41,
    "e21_dwell_time": 0.40, "ts34_calmar": 1.31, "a15_listing_flows": 0.33,
    "k13_ivf_balance": 0.84, "fx4_winsorized_returns": 0.27,
    "e22_anomalous_days": 0.31, "e23_funnel_3step": 0.54,
    "r12_percent_rank": 1.80, "apx6_hll_day_overlap": 0.27,
    "e24_event_pagerank": 3.64,
    # round-5 bank, now MEASURED at sf0.1 (r5 verdict #4): 34 values from
    # the BENCH_r05 driver run's per-query tail, 4 re-measured in-session
    # (smp10/ts35/ts36 were clipped from the tail; k9 was re-timed after
    # its scalar reshape). No estimate or pin remains in this table.
    "smp10_es_weighted_sample": 0.36, "ts35_rolling_sharpe": 0.85,
    "ts36_inverse_vol_weights": 1.68, "dd16_source_jaccard": 1.58,
    "a16_monthly_momentum": 1.24, "e25_cohort_ltv": 0.45,
    "iv7_gap_histogram": 0.36, "tx21_bigram_entropy": 1.21,
    "ts37_updown_capture": 0.45, "e26_session_percentiles": 0.46,
    "dp4_price_histogram": 0.30, "tx22_keyword_in_context": 0.41,
    "ts38_rank_churn": 3.88, "k15_label_confusion": 1.31,
    "dq6_monthly_coverage": 0.64, "f11_target_encoding": 0.59,
    "smp11_balanced_downsample": 0.24, "tx23_vocab_coverage": 0.58,
    "k16_simplified_silhouette": 1.26, "dq7_orphan_rates": 0.99,
    "tx24_pii_by_source": 0.35, "f12_feature_binning": 0.33,
    "k17_ivf_recall": 1.08, "e28_wau_trend": 0.20,
    "ts40_return_moments": 0.42, "a18_turnover_gini": 1.58,
    "tx25_langid_confusion": 0.55, "ts41_pain_index": 0.27,
    "e30_hourly_conversion": 0.18, "dd18_shingle_df_profile": 0.94,
    "smp12_proportional_strata": 0.20, "e31_new_vs_returning": 0.69,
    "a19_market_share_trend": 2.46, "e32_session_depth": 0.79,
    "ts42_up_day_ratio": 1.76, "dd19_dedup_savings": 0.43,
    "k18_text_ann_end_to_end": 1.77,
    # round-6 registrations (measured in-session at sf0.1, best-of-2)
    "dd20_containment_pairs": 1.75, "tx26_word_length_profile": 0.55,
    "iv8_peak_concurrency": 0.72, "e33_daypart_rollup": 0.54,
    "e34_active_gap_histogram": 0.50, "ts43_series_gaps": 1.43,
    "u7_bag_intersect": 0.44, "dq8_natural_key_collisions": 0.33,
    "k19_dim_variance": 0.40, "f13_minmax_log_features": 0.40,
    "o2_keyset_pagination": 0.28, "a20_breadth_thrust": 0.35,
    "pipeline1_daily_update": 4.98,
    # round-7 bank (measured in-session at sf0.1, best-of-2)
    "cdc4_scd2_dimension": 1.55, "iv9_interval_stabbing": 0.61,
    "smp13_kfold_assign": 0.27, "tx27_stopword_profile": 0.73,
    "dp5_column_drift": 0.91, "ts44_parkinson_vol": 1.50,
    "f14_cyclic_time_features": 0.40, "a22_turn_of_month": 0.31,
    "dd21_dup_provenance": 0.60, "e35_repeat_latency": 0.44,
    "k20_label_knn_purity": 1.52, "dq9_source_completeness": 0.30,
    "ts45_hurst_exponent": 1.33, "e36_second_order_markov": 0.82,
    "tx28_ngram_novelty": 1.49, "pipeline2_delisted_sync": 4.06,
    "k21_pca_variance": 0.89, "f15_doc_feature_matrix": 1.77,
    "tx29_bpe_merges": 3.92,
    # round-7 bank batch 6 (measured in-session at sf0.1, best-of-2)
    "dq10_order_price_reconciliation": 2.50, "ts46_garman_klass_vol": 2.18,
    "ts47_roll_spread": 0.64, "e37_retention_survival": 0.43,
    "e38_event_type_lift": 0.78, "a23_high_proximity": 1.24,
    # round-7 bank batch 7 (measured in-session at sf0.1, best-of-2)
    "tx30_doc_entropy": 1.47, "smp14_anchor_positive_pairs": 0.51,
    "k22_quantization_error": 1.69, "e39_power_users": 0.46,
    "ts48_kaufman_er": 1.66, "dd22_jaccard_histogram": 1.85,
    # round-7 bank batch 8 (measured in-session at sf0.1, best-of-2)
    "f16_oof_target_encoding": 1.02, "ts49_variance_ratio": 2.51,
    "tx31_word_burstiness": 0.54, "dp6_ks_drift": 0.41,
    "a24_equal_weight_index": 0.32,
    # round-7 bank batch 9 (measured in-session at sf0.1, best-of-2)
    "ts50_sortino": 0.88, "a25_volume_volatility_corr": 2.33,
    "tx32_vocab_coverage_curve": 0.68, "cdc5_status_change_rate": 0.89,
    # round-7 bank batch 10 (measured in-session at sf0.1, best-of-2)
    "ts51_downside_beta": 2.44, "a26_new_highs_lows": 1.78,
    "tx33_hapax_by_source": 0.53,
    # round-7 bank batch 11 (measured in-session at sf0.1, best-of-2)
    "tx35_doc_length_gini": 0.75, "a27_monthly_hhi": 3.25,
    "tx36_readability": 0.93, "e42_daily_error_rate": 0.98,
    "j13_price_elasticity": 1.10, "j14_sourcing_entropy": 3.80,
    "a28_price_dispersion": 1.05, "a29_return_rates": 1.36,
    "k23_split_representativeness": 0.83, "j15_supplier_risk_exposure": 1.02,
    "dq12_status_invariant": 1.09, "a30_margin_health": 1.19,
    "ts55_vol_regimes": 0.64, "e43_activity_streaks": 0.82,
    "a31_new_vs_repeat_revenue": 1.28, "dq13_last_digit_bias": 0.53,
    "a32_listing_age_vol": 0.76,
    # round-8 registrations (measured in-session at sf0.1, best-of-2)
    "skw1_join_key_skew_profile": 0.77, "skw2_salted_user_totals": 0.51,
    "stb1_stream_batch_reconcile": 1.54, "k24_stratified_knn": 0.54,
    # round-9 registrations (measured in-session at sf0.1, best-of-2)
    "skw3_sharded_sessions": 1.35, "pipeline3_daily_master_update": 10.41,
}




def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    vintage = _newest_green_round()

    def key(name: str):
        if name not in ORACLES:
            return (2, 0, _COST.get(name, 1.0), name)  # rows-only: dead last
        v = vintage.get(name, 0)
        if v == 0:
            return (0, 0, _COST.get(name, 1.0), name)  # never green / new
        return (1, v, _COST.get(name, 1.0), name)  # stalest green first

    return {n: QUERIES[n] for n in sorted(QUERIES, key=key)}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
