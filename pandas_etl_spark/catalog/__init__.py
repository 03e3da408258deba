"""Named query catalog — the driver correctness/bench surface.

Every implemented operator from SURVEY §2 registers here as a named query
(a ``(spark, sf_dir) -> DataFrame`` callable) plus, where SQL-expressible,
a DuckDB oracle SQL string computing the same result on the same parquet
tables. ``__spark_entry__.queries()`` / ``oracle_sql()`` re-export these.

Import side effects: importing this package loads all catalog modules so
the registry is fully populated.
"""

from pandas_etl_spark.catalog.registry import ORACLES, QUERIES, query  # noqa: F401

# populate the registry
from pandas_etl_spark.catalog import advanced  # noqa: E402,F401
from pandas_etl_spark.catalog import batch  # noqa: E402,F401
from pandas_etl_spark.catalog import text  # noqa: E402,F401
from pandas_etl_spark.catalog import dedup  # noqa: E402,F401
from pandas_etl_spark.catalog import misc  # noqa: E402,F401
from pandas_etl_spark.catalog import similarity  # noqa: E402,F401
from pandas_etl_spark.catalog import streaming  # noqa: E402,F401
from pandas_etl_spark.catalog import curation  # noqa: E402,F401
from pandas_etl_spark.catalog import analytics  # noqa: E402,F401
from pandas_etl_spark.catalog import tpch  # noqa: E402,F401
from pandas_etl_spark.catalog import geo  # noqa: E402,F401
from pandas_etl_spark.catalog import patterns  # noqa: E402,F401

# Registry priority ordering (VERDICT r3 #4; rotated per VERDICT r4 #1).
# External harnesses that check a fixed-size prefix of the registry (the
# driver verifies the first 50) should exercise queries that have never
# produced a hard driver signal, not re-prove already-green rows. The
# prefix therefore has two blocks:
#   1. ~15 regression-critical slots that stay pinned every round (the
#      dedup/similarity core, the r3-regression pair rolling_time_window
#      / resample_interpolate, sessionize, pricing_summary) so a
#      regression in the north-star family is caught immediately;
#   2. ~35 rotating slots drawn from oracle-backed queries that have no
#      green row in any CORRECTNESS_r*.json yet (r5: the TPC-H suite,
#      all stream_* oracles, lexical search, SCD2, cohort analytics).
# Everything else keeps module order after the prioritized block; all
# queries remain registered and locally oracle-tested either way.
_PRIORITY = [
    # --- pinned regression-critical block (kept green r1-r4) ---
    "dedup_exact",
    "dedup_groups",
    "dedup_clusters",
    "dedup_multi_signal",
    "minhash_lsh_pairs_checked",
    "ngram_jaccard_pairs",
    "simhash_pairs_checked",
    "ann_cosine_topk",
    "semantic_dedup_checked",
    "curate_corpus",
    "dedup_incremental",
    "sessionize",
    "pricing_summary",
    "rolling_time_window",
    "resample_interpolate",
    # --- r5 rotation: never driver-checked oracle queries ---
    # TPC-H shape suite (q1/q3/q13 were driver-checked in earlier rounds
    # under pricing_summary/nation_revenue/other names; these were not)
    "tpch_q2_shape",
    "tpch_q4_priority_check",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_shipments",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_supplier",
    "tpch_q22_idle_customers",
    # Structured Streaming oracles (availableNow batch-equivalent)
    "stream_tumbling_hour",
    "stream_sliding_window",
    "stream_session_window",
    "stream_stream_join",
    "stream_static_join",
    "stream_dedup_counts",
    "stream_dedup_watermark",
    "stream_topk_trending",
    "stream_quality_histogram",
    "stream_ohlc_bars",
    # lexical retrieval + warehouse/analytics patterns
    "tfidf_search_topk",
    "bm25_search_topk",
    "scd2_history",
    "cohort_retention",
    "pivot_margins",
    "pipeline_yaml_engine",
]
# r6 rotation pool (oracle-backed, never driver-checked as of r5):
# the r5 additions (cdc_apply_latest, stream_cdc_apply, segment_dedup,
# ngram_containment_pairs, pagerank_trade_graph, retrieval_ndcg_tfidf,
# the analytics batch, skew pair, nucleus/k-anon/group-sample, and the
# late-r5 block: bigram_logprob_score, dsir_importance_weights,
# corpus_shuffle_shards, bootstrap_ci_mean_price, curriculum_order,
# table_manifest_checksum, fk_discovery, scd2_point_in_time,
# attribution_linear; the second-continuation block: exact_span_dedup,
# unicode_normalize, release_corpus_manifest; the third-continuation
# block: triangle_count_parts / triangle_top_parts /
# community_parts_lpa / community_modularity /
# related_parts_adamic_adar / semantic_knn_communities /
# assortativity_parts / survival_km_customers / bfs_reach_parts /
# assoc_cats_orders / cheapest_paths_parts / benford_price_audit /
# holt_trend_daily / hybrid_search_rrf / spearman_corr_lineitem /
# ks_price_drift / mwu_purchase_vs_click / theil_sen_trend /
# cusum_revenue_shift / semantic_decontaminate / jw_match_pairs /
# roc_auc_purchase / calibration_purchase_score /
# quantile_normalize_sources (full oracles); plus
# the round-5 geo/pattern/ER block: geo_cell_density /
# spatial_radius_join / nearest_suppliers_knn / spatial_cluster_eps /
# stream_geo_density / activity_streaks / pareto_abc_parts /
# acf_daily_revenue / funnel_time_bound / session_paths_topk /
# conversion_latency_quantiles / ols_price_model / image_ahash_neardup /
# weighted_sample_ares / rake_keyphrases_topk / capped_running_balance /
# entity_golden_records / l_diversity_audit / forecast_backtest_smape
# (full oracles; markov_attribution is rows-only); plus
# rows-only k_core_parts /
# embedding_pca_project /
# ann_pq_topk / segment_neardup / stream_manifest_ingest /
# ann_recall_audit / active_users_hll_rollup / audience_overlap_hll /
# stream_hll_ingest)
# plus the older misc/analytics tail (winnow/pmi/udtf, profile/
# describe/rank_methods, salted_*, embedding_centroids/outliers,
# funnel/ab_test, …). Swap them into the 35 rotating slots next round;
# compute the live pool with:
#   [q for q in QUERIES if q in ORACLES
#    and q not in union(CORRECTNESS_r*.json keys)]


def _apply_priority_order() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority_order()
