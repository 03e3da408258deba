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

# Registry priority ordering (VERDICT r3 #4; rotated each round — this is
# the r10 rotation per VERDICT r9 #1/#6).
# External harnesses that check a fixed-size prefix of the registry (the
# driver verifies the first 50) should exercise queries that have never
# produced a hard driver signal, not re-prove already-green rows. As of
# r9 all 257 driver-checked rows are latest-PASS and the never-checked
# pool is 102 (74 oracle-backed + 28 rows-only). The r10 prefix is
# therefore 100% conversions — zero re-proved rows:
#   slots 1-5   the five r9 streaming checked twins (the round's flagship
#               additions, sweep-green at sf0.001+sf0.01 but never
#               driver-checked — VERDICT r9 #2);
#   slots 6-50  the 45 stalest never-checked oracle-backed rows in
#               registry (age) order: the r4-era multimodal/text tail,
#               the misc/pandas-parity tail, the winnowing family, the
#               skew/salting studies.
# Pool after this round (assuming green): 74-50 = 24 oracle-backed
# never-checked (+28 rows-only) = 52 — clears in ~1 more rotation.
# The formerly-pinned regression block (dedup/similarity core,
# rolling_time_window/resample_interpolate, sessionize) rotates out for
# one round: every one of those rows is driver-green as of r9 AND
# triple-covered (full local sweep + unit/property suite + bench), so a
# regression there is still caught the same session it lands.
# Everything else keeps module order after the prioritized block; all
# queries remain registered and locally oracle-tested either way.
_PRIORITY = [
    # --- slots 1-5: r9 streaming checked twins (catalog/streaming.py) ---
    "stream_dedup_ingest_checked",
    "stream_counter_checked",
    "stream_span_ingest_checked",
    "stream_manifest_ingest_checked",
    "stream_hll_ingest_checked",
    # --- slots 6-50: stalest never-checked oracle-backed rows ---
    "multimodal_audio_stub",
    "image_ahash_neardup",
    "json_variant_extract",
    "lang_confusion",
    "chunk_documents",
    "heavy_hitters",
    "group_percentiles",
    "udtf_ngram_topk",
    "pmi_cooccur",
    "doc_winnow",
    "winnow_pairs",
    "source_composition",
    "length_buckets",
    "vocab_zipf_fit",
    "feature_hash_counts",
    "contrastive_triplets",
    "fuzzy_match_pairs",
    "doc_novelty",
    "unpivot_metrics",
    "percent_rank_cume",
    "regexp_extract_ids",
    "equi_range_join",
    "isin_filter",
    "geomean_udaf",
    "profile_columns",
    "assoc_cats_orders",
    "benford_price_audit",
    "sample_stratified",
    "get_dummies_segment",
    "str_dt_accessors",
    "salted_agg_events",
    "salted_join_events",
    "moment_stats",
    "rolling_median",
    "rank_methods",
    "duplicated_flags",
    "upsert_snapshot",
    "quality_checks",
    "gap_fill",
    "frame_compare",
    "skew_zipf_join_plain",
    "skew_zipf_join_salted",
    "schema_evolution_read",
    "outlier_mad",
    "group_mode",
]
# r11 rotation pool after this prefix (24 oracle-backed rows): ohlc_bars,
# value_histogram, group_regression, event_debounce,
# related_parts_adamic_adar, user_rfm_segments, peak_concurrency,
# psi_value_drift, bfs_reach_parts, assortativity_parts,
# cheapest_paths_parts, cusum_revenue_shift, group_share_transform,
# nucleus_select_per_source, k_anonymity_audit, group_sample_n,
# weighted_sample_ares, l_diversity_audit, acf_daily_revenue,
# funnel_time_bound, session_paths_topk, ols_price_model,
# conversion_latency_quantiles, capped_running_balance. Compute live:
#   [q for q in QUERIES if q in ORACLES
#    and q not in union(CORRECTNESS_r*.json keys)]



def _apply_priority_order() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority_order()
