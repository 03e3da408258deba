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
from pandas_etl_spark.catalog import distribution  # noqa: E402,F401
from pandas_etl_spark.catalog import mlaudit  # noqa: E402,F401

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
    # dedup_groups itself is unpinned as of r8: the gate corpus has no
    # duplicates, so its four driver-green rounds were vacuous 0 = 0
    # rows; the planted twin below checks the same operator's schema
    # AND its n_dups/keeper/normalization semantics on data that
    # actually contains groups. dedup_groups stays registered and
    # sweep-covered.
    "dedup_groups_planted",
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
    # pricing_summary sits out the r8 prefix (driver-green r3-r7 and
    # triple-covered every round: __spark_entry__.entry() flagship, the
    # bench headline, and the full local sweep); its slot carries the
    # round-8 portable-HLL twin to a hard driver signal instead.
    "hll_distinct_checked",
    "rolling_time_window",
    "resample_interpolate",
    # --- r8 rotation (VERDICT r7 #1/#2): snapshot_diff_orders stays in
    # the prefix until its array_join fix is DRIVER-green (the one r7
    # red row), then the 28 round-7 additions (all sweep-only today)
    # and the stalest never-checked misc/pandas-parity rows. The r7
    # rotation went 49/50 green in CORRECTNESS_r07 and rotates out. ---
    "snapshot_diff_orders",
    # round-7 additions: distribution / effect-size / first-seen family
    "gini_revenue_concentration",
    "lorenz_deciles",
    "weighted_percentiles",
    "exact_quantiles_distributed",
    "entropy_by_source",
    "chi_square_event_dow",
    "stickiness_dau_mau",
    "new_vs_returning_daily",
    "cumulative_distinct_users",
    "cohens_d_segments",
    # round-7 ML-audit ring
    "class_weights_inverse_freq",
    "stratified_kfold_assign",
    "knn_label_noise",
    "centroid_margin_audit",
    "dedup_rate_by_source",
    # round-7 checked twins + graph/stats/stream additions
    "ann_lsh_checked",
    "heavy_hitters_cms_checked",
    "minhash_source_signature_checked",
    "pca_power_top_component",
    "markov_attribution",
    "stream_asof_enrich",
    "rolling_corr",
    "jaccard_link_prediction",
    "attribution_time_decay",
    "k_anonymize_local",
    "k_core_fixed_depth",
    "erasure_rewrite",
    "corpus_datacard",
    "croston_intermittent_demand",
    # stalest never-checked misc/pandas-parity tail
    "null_handling",
    "percentiles_exact",
    "str_extractall",
    "describe_stats",
    "value_counts",
]
# r9 rotation priority: the late-r8 checked twins (ann_ivf_checked /
# ann_pq_checked / bpe_merges_checked / ann_recall_checked — each
# sweep-green at sf0.001 AND sf0.01 this round, driver-exact
# comparison semantics) should take prefix slots next round; they are
# the newest registry code.
# r8+ rotation pool: ~98 oracle-backed queries remain never
# driver-checked after this round's 35 (misc/pandas-parity tail —
# unpivot/percent_rank_cume/regexp_extract/equi_range/isin/geomean/
# correlated_subquery/grouping_sets/profile/assoc/benford/sampling/
# dummies/accessors/salted pair/moments/rolling_median/rank_methods/
# duplicated/upsert/quality_checks/gap_fill/frame_compare/skew pair/
# corr_matrix/schema_evolution_read; embeddings — centroids/outliers/
# standardize/semantic_knn/diversity_kcenter; analytics —
# funnel/ab_test/session_transcripts/outlier_mad/group_mode/ohlc/
# value_histogram/group_regression/basket/attribution_last_touch/
# event_debounce/seasonal/triangle_top/modularity/adamic_adar/rfm/
# anomaly/transition/trailing_24h/peak/calibration/psi/bootstrap/
# attribution_linear/bfs/assortativity/cheapest_paths/cusum; text —
# multimodal_audio/image_ahash/json_variant/lang_confusion/chunk/
# heavy_hitters/group_percentiles/udtf_ngram/pmi/winnow pair/
# source_composition/length_buckets/zipf/feature_hash/contrastive/
# fuzzy/doc_novelty; curation — merge_intervals/outlier_zscore/
# multi_resolution/winsorize/quality_weighted/group_share/nucleus/
# k_anonymity_audit/group_sample_n/weighted_ares/l_diversity;
# geo/patterns — nearest_knn/spatial_cluster/acf/funnel_time_bound/
# session_paths/ols/conversion_latency/capped_balance).
# Compute the live pool with:
#   [q for q in QUERIES if q in ORACLES
#    and q not in union(CORRECTNESS_r*.json keys)]


def _apply_priority_order() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority_order()
