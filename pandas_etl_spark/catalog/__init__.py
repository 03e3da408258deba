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
    # --- r7 rotation (VERDICT r6 #1): the 25 round-6 additions plus
    # doc_rolling_fingerprint (whose only driver row ever is the r01
    # FAIL — its fix is sweep-green but has never been driver-confirmed)
    # and the stalest never-checked rows from the warehouse/stats tail.
    # The r6 rotation (span dedup family, ER, retrieval quality, graph/
    # stats, geo) went 50/50 green in CORRECTNESS_r06 and rotates out. ---
    "doc_rolling_fingerprint",
    # round-6 additions, all sweep-only today
    "gopher_quality_gate",
    "source_overlap_jaccard",
    "knn_label_transfer",
    "propensity_match_pairs",
    "bpe_fertility_by_lang",
    "lang_id_kappa",
    "mv_incremental_agg",
    "embedding_quality_audit",
    "stream_mv_incremental",
    "backfill_day_partition",
    "asof_nearest_click",
    "twap_user_day",
    "vocab_drift_jsd",
    "k_anonymize_generalize",
    "dedup_cluster_histogram",
    "neyman_allocation",
    "bh_fdr_segments",
    "trajectory_length_daily",
    "weighted_median_price",
    "mann_kendall_trend",
    "cohort_ltv_curves",
    "referential_audit",
    # stalest never-checked rows: warehouse lifecycle + stats + streams
    "theil_sen_trend",
    "mwu_purchase_vs_click",
    "quantile_normalize_sources",
    "scd2_point_in_time",
    "key_skew_profile",
    "table_manifest_checksum",
    "snapshot_diff_orders",
    "cdc_apply_latest",
    "fk_discovery",
    "stream_cdc_apply",
    "stream_quality_gate",
    "stream_geo_density",
]
# r8+ rotation pool: ~110 oracle-backed queries remain never
# driver-checked after this round's 35 (the 24 round-7 additions —
# gini/lorenz/weighted_percentiles, entropy/chi-square/effect sizes,
# stickiness + first-seen family, the ML audits, checked LSH/CMS/PCA/
# k-center/markov/source-signature twins, stream_asof_enrich,
# rolling_corr, jaccard_link_prediction, attribution_time_decay,
# k_anonymize_local, k_core_fixed_depth — plus the
# misc/pandas-parity tail —
# null_handling/percentiles_exact/str_extractall/describe_stats/…,
# embeddings — centroids/outliers/standardize, skew pair, remaining
# graph/stats — triangle_top/modularity/adamic_adar/bfs/assortativity/
# cheapest_paths/benford/cusum/calibration/psi/bootstrap/attribution,
# remaining text — chunk_documents/heavy_hitters/pmi_cooccur/winnow/
# vocab_zipf_fit/feature_hash_counts, sampling/privacy gates,
# upsert_snapshot/schema_evolution_read, remaining geo/patterns).
# Compute the live pool with:
#   [q for q in QUERIES if q in ORACLES
#    and q not in union(CORRECTNESS_r*.json keys)]


def _apply_priority_order() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority_order()
