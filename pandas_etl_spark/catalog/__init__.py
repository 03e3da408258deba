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
    # --- r6 rotation: never driver-checked oracle queries (the r5
    # rotation — TPC-H q2-q22, all stream_* oracles, lexical search,
    # SCD2/cohort/pivot/yaml — went 50/50 green in CORRECTNESS_r05 and
    # rotates out; these 35 have no green row in any CORRECTNESS_r*) ---
    # LLM-pipeline family (span dedup, containment, decontamination,
    # sampling/ordering, ER, retrieval quality)
    "exact_span_dedup",
    "span_dedup_incremental",
    "segment_dedup",
    "ngram_containment_pairs",
    "ngram_jaccard_prefix",
    "simhash_checked",
    "dsir_importance_weights",
    "bigram_logprob_score",
    "decontaminate_spans",
    "semantic_decontaminate",
    "curriculum_order",
    "corpus_shuffle_shards",
    "unicode_normalize",
    "release_corpus_manifest",
    "rake_keyphrases_topk",
    "retrieval_ndcg_tfidf",
    "hybrid_search_rrf",
    "jw_match_pairs",
    "entity_golden_records",
    "temperature_sample",
    # graph / statistics / time-series analytics
    "pagerank_trade_graph",
    "triangle_count_parts",
    "community_parts_lpa",
    "survival_km_customers",
    "spearman_corr_lineitem",
    "ks_price_drift",
    "roc_auc_purchase",
    "holt_trend_daily",
    "forecast_backtest_smape",
    "woe_iv_quantity",
    # geo / sequence patterns (pareto_abc_parts deliberately included:
    # its class boundary was reworked to exact-integer cents this round)
    "geo_cell_density",
    "spatial_radius_join",
    "point_in_polygon_counts",
    "pareto_abc_parts",
    "activity_streaks",
]
# r7+ rotation pool: ~130 oracle-backed queries remain never
# driver-checked after this round's 35 (the misc/pandas-parity tail —
# null_handling/percentiles_exact/str_extractall/describe_stats/…,
# the warehouse block — cdc_apply_latest/fk_discovery/upsert_snapshot/
# scd2_point_in_time/snapshot_diff_orders/table_manifest_checksum/
# backfill_day_partition/mv_incremental_agg/stream_mv_incremental,
# embeddings — centroids/outliers/standardize/quality_audit/
# knn_label_transfer, skew pair, remaining graph/stats —
# triangle_top/modularity/adamic_adar/bfs/assortativity/cheapest_paths/
# benford/theil_sen/cusum/mwu/calibration/psi/bootstrap/
# neyman_allocation/bh_fdr_segments/mann_kendall_trend/
# propensity_match_pairs/twap_user_day/weighted_median_price,
# remaining geo/patterns + trajectory_length_daily/asof_nearest_click,
# sampling/privacy gates + k_anonymize_generalize, the round-6
# curation block — gopher_quality_gate/source_overlap_jaccard/
# vocab_drift_jsd/bpe_fertility_by_lang/lang_id_kappa/
# dedup_cluster_histogram, stream_cdc_apply/stream_quality_gate/
# stream_geo_density). Compute the live pool with:
#   [q for q in QUERIES if q in ORACLES
#    and q not in union(CORRECTNESS_r*.json keys)]


def _apply_priority_order() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority_order()
