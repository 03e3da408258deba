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
    # --- r9 rotation (VERDICT r8 #1/#2): pca_power_top_component stays
    # in the prefix until its determinism fix (μ/cov pinned at the
    # aggregates, driver-side fixed-order iteration, left-associative
    # projection fold, signed-zero normalization — the r8 red row) is
    # DRIVER-green; then the five late-r8 checked twins (sweep-green at
    # sf0.001+sf0.01, never driver-checked) and the stalest
    # never-checked rows from the 104-query pool, verdict-named
    # priorities first. The r8 rotation went 35/36 green in
    # CORRECTNESS_r08 and rotates out. ---
    "pca_power_top_component",
    # late-r8 checked twins
    "ann_ivf_checked",
    "ann_pq_checked",
    "ann_recall_checked",
    "bpe_merges_checked",
    "dedup_recall_audit_checked",
    # verdict-named analytics tail (never driver-checked)
    "ab_test_zscores",
    "funnel_counts",
    "basket_rules",
    "corr_matrix",
    "grouping_sets",
    "correlated_subquery",
    "attribution_last_touch",
    "attribution_linear",
    "event_transition_matrix",
    "anomaly_rolling_z",
    "active_users_trailing_24h",
    "bootstrap_ci_mean_price",
    "calibration_purchase_score",
    # geo family
    "nearest_suppliers_knn",
    "spatial_cluster_eps",
    # merge/interval + curation sampling tail
    "merge_intervals",
    "outlier_zscore",
    "multi_resolution_rollup",
    "winsorize_values",
    "quality_weighted_sample",
    # embeddings family (north-star, never driver-checked)
    "embedding_centroids",
    "embedding_outliers",
    "embedding_standardize",
    "semantic_knn_communities",
    "diversity_sample_kcenter",
    # float-margin-audit candidates — driver signal doubles as margin
    # evidence (VERDICT r8 #4)
    "seasonal_decompose_hourly",
    # graph tail
    "triangle_top_parts",
    "community_modularity",
    "session_transcripts",
]
# r10 rotation priority: the three r9 streaming checked twins
# (stream_dedup_ingest_checked / stream_counter_checked /
# stream_span_ingest_checked — VERDICT r8 #7, each sweep-green at
# sf0.001 AND sf0.01 this round) should take prefix slots next round;
# they are the newest registry code.
# r9+ rotation pool after this prefix: ~69 oracle-backed queries
# remain never driver-checked (misc/pandas-parity tail, text family —
# lang_confusion/chunk/heavy_hitters/group_percentiles/udtf_ngram/
# pmi/winnow pair/source_composition/length_buckets/zipf/feature_hash/
# contrastive/fuzzy/doc_novelty, analytics remainder — outlier_mad/
# group_mode/ohlc/value_histogram/group_regression/event_debounce/
# adamic_adar/rfm/peak/psi/bfs/assortativity/cheapest_paths/cusum,
# curation remainder, geo/patterns remainder). Compute the live pool:
#   [q for q in QUERIES if q in ORACLES
#    and q not in union(CORRECTNESS_r*.json green keys)]


def _apply_priority_order() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority_order()
