#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Timing = full query wall time including the action (count of a
write-nothing materialization via ``df.write.format('noop')``), which
executes the complete plan without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type-hint resolution

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "window_topk_per_group",
    "window_running_total",
    "rollup_totals",
    "sessionize",
    "session_window_agg",
    "asof_join_events",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "doc_stats",
    "quality_score",
    "ewm_mean",
    "curate_corpus",
]

# Round-4+ additions: timed and reported separately (queries_extended) so
# the headline total stays comparable with earlier rounds.
EXTENDED = [
    "dedup_multi_signal",
    "simhash_checked",
    "dedup_clusters",
    "tpch_q8_market_share",
    "tpch_q21_waiting_supplier",
    "udtf_ngram_topk",
    "stream_session_window",
    "tpch_q7_nation_volume",
    "ngram_jaccard_prefix",
    "pmi_cooccur",
    "outlier_mad",
    "group_mode",
    "doc_winnow",
    "winnow_pairs",
    "stream_ohlc_bars",
    "bpe_learn_merges",
    "semantic_dedup",
    "semantic_dedup_checked",
    "embedding_quantize_error",
    "lang_confusion",
    "stream_topk_trending",
    "pq_encode_stats",
    "tfidf_search_topk",
    "bm25_search_topk",
    "skew_zipf_join_plain",
    "skew_zipf_join_salted",
    "segment_dedup",
    "ngram_containment_pairs",
    "pagerank_trade_graph",
    "cdc_apply_latest",
    "active_users_trailing_24h",
    "peak_concurrency",
    "ann_pq_topk",
    "bigram_logprob_score",
    "dsir_importance_weights",
    "corpus_shuffle_shards",
    "bootstrap_ci_mean_price",
    "curriculum_order",
    "segment_neardup",
    "exact_span_dedup",
    "unicode_normalize",
    "release_corpus_manifest",
    "span_dedup_incremental",
    "temperature_sample",
    "decontaminate_spans",
    "active_users_hll_rollup",
    "triangle_count_parts",
    "community_parts_lpa",
    "related_parts_adamic_adar",
    "k_core_parts",
    "semantic_knn_communities",
    "bfs_reach_parts",
    "assortativity_parts",
    "survival_km_customers",
    "assoc_cats_orders",
    "cheapest_paths_parts",
    "benford_price_audit",
    "holt_trend_daily",
    "embedding_pca_project",
    "hybrid_search_rrf",
    "spearman_corr_lineitem",
    "ks_price_drift",
    "mwu_purchase_vs_click",
    "theil_sen_trend",
    "cusum_revenue_shift",
    "semantic_decontaminate",
    "jw_match_pairs",
    "roc_auc_purchase",
    "calibration_purchase_score",
    "quantile_normalize_sources",
    # round-5 geo / pattern / ER block
    "geo_cell_density",
    "spatial_radius_join",
    "nearest_suppliers_knn",
    "spatial_cluster_eps",
    "point_in_polygon_counts",
    "activity_streaks",
    "pareto_abc_parts",
    "acf_daily_revenue",
    "funnel_time_bound",
    "session_paths_topk",
    "conversion_latency_quantiles",
    "ols_price_model",
    "forecast_backtest_smape",
    "woe_iv_quantity",
    "image_ahash_neardup",
    "weighted_sample_ares",
    "rake_keyphrases_topk",
    "capped_running_balance",
    "entity_golden_records",
    "markov_attribution",
    "l_diversity_audit",
    # round-6 additions
    "gopher_quality_gate",
    "source_overlap_jaccard",
    "knn_label_transfer",
    "propensity_match_pairs",
    "diversity_sample_kcenter",
    "bpe_fertility_by_lang",
    "lang_id_kappa",
    "mv_incremental_agg",
    "embedding_quality_audit",
    "stream_mv_incremental",
    "minhash_source_signature",
    "backfill_day_partition",
    "asof_nearest_click",
    "twap_user_day",
    "vocab_drift_jsd",
    "k_anonymize_generalize",
    # dedup_cluster_histogram is deliberately NOT benched: it re-runs
    # the already-benched dedup_clusters CC core and adds only two tiny
    # aggregates (same rationale as community_modularity)
    "neyman_allocation",
    "bh_fdr_segments",
    "trajectory_length_daily",
    "compression_ratio_filter",
    "weighted_median_price",
    "mann_kendall_trend",
    "cohort_ltv_curves",
    "referential_audit",
    # round-7: the full remaining TPC-H family, closing the "verified
    # but never timed" gap (q8/q21/q7 were already headline-adjacent)
    "tpch_q2_shape",
    "tpch_q4_priority_check",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
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
    "tpch_q22_idle_customers",
    # round-7 additions (markov_attribution gained its oracle this round
    # but was already benched in the round-5 block above)
    "k_anonymize_local",
    "gini_revenue_concentration",
    "lorenz_deciles",
    "entropy_by_source",
    "chi_square_event_dow",
    "stickiness_dau_mau",
    "new_vs_returning_daily",
    "cohens_d_segments",
    "class_weights_inverse_freq",
    "stratified_kfold_assign",
    "knn_label_noise",
    "dedup_rate_by_source",
    "centroid_margin_audit",
    "stream_asof_enrich",
    "rolling_corr",
    "jaccard_link_prediction",
    "weighted_percentiles",
    "attribution_time_decay",
    "cumulative_distinct_users",
    "pca_power_top_component",
    "ann_lsh_checked",
    "heavy_hitters_cms_checked",
    "minhash_source_signature_checked",
    "erasure_rewrite",
    "corpus_datacard",
    "exact_quantiles_distributed",
    "croston_intermittent_demand",
    "dedup_groups_planted",
    "dedup_recall_audit_checked",
    "hll_distinct_checked",
    # k_core_fixed_depth is deliberately NOT benched: it is the first 4
    # peel rounds of the already-benched k_core_parts (the
    # community_modularity / dedup_cluster_histogram precedent)
    # community_modularity is deliberately NOT benched: it re-runs the
    # already-benched LPA and adds only tiny per-community aggregates
    # ann_recall_audit is deliberately NOT benched: it runs all four
    # ANN paths to measure recall, so its wall time is the sum of
    # already-benched queries, not a signal of its own; the same
    # rationale excludes ann_recall_checked (its LSH + brute-force
    # legs are both benched individually)
    "ann_ivf_checked",
    "ann_pq_checked",
    "bpe_merges_checked",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pandas_etl_spark.catalog import QUERIES
    from pandas_etl_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + parquet footers + the Python/Arrow worker pool once
    # (the first pandas_udf otherwise pays ~3-5s of worker spawn inside
    # whichever query hits it first)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    spark.range(1024).repartition(64).select(_noop("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    # Each query runs twice: run 1 pays one-time Janino codegen compiles
    # (5-8s/session for the wide generated aggregates — SCALE.md) and is
    # reported as cold; run 2 is the steady-state number regressions
    # should be judged on (VERDICT r2 #10: codegen noise masked real
    # plan changes). Caches (curate's persisted intermediate) are
    # cleared between runs so the warm run re-executes the full plan
    # rather than reading run 1's cache.
    # Per-query try/except: one broken query degrades to a null entry in
    # the report instead of zeroing the whole artifact (r3 shipped NO
    # bench numbers because a single AnalysisException killed the run).
    # warm = MIN of five post-codegen runs taken in TWO time-separated
    # passes (3 back-to-back + 2 after the full headline sweep): the
    # host shows multi-second noisy-neighbor stalls arriving in
    # minutes-long waves — a single warm sample misattributes one stall
    # as a 5× per-query regression, and even min-of-3 consecutive
    # samples of a sub-second query can land entirely inside one wave.
    # min over time-separated samples is the standard noise-robust
    # statistic here and still executes the full plan each time.
    def clear_leaked_storage() -> None:
        # The iterative operators (LPA, k-core, pagerank, CC) pin
        # localCheckpoint RDD blocks that outlive their query — ~5 per
        # LPA run. Across 50+ queries x 3 runs that squeezed executor
        # storage until late big-join queries spilled (semantic_knn
        # measured 5s clean vs 112s at the end of a full bench).
        # clearCache only drops DataFrame cache entries, not RDD-level
        # checkpoints, so drop those explicitly between queries.
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)
        # Broadcasts and shuffle files are only reclaimed when the
        # ContextCleaner notices their weak refs die — i.e. on a driver
        # GC, which a mostly-JVM bench may not trigger for hundreds of
        # queries. Nudge it so earlier queries' broadcast blocks don't
        # crowd the storage pool out from under later big joins.
        spark.sparkContext._jvm.System.gc()

    # Per-query attribution (VERDICT r9 #2): the r8→r9 headline creep hit
    # queries whose files were git-unchanged, so every warm sample now
    # records (a) Python worker-pool churn — new/reaped pyspark.daemon /
    # pyspark.worker PIDs across the run, distinguishing "worker
    # re-spawn tax" from genuine plan cost (a pure-JVM query like
    # doc_stats should show spawned=0 every run) — and (b) the JVM GC
    # time/count delta, distinguishing driver/executor GC pressure from
    # external (noisy-VM) stalls. A spike with spawned=0 and gc_ms≈0 is
    # environmental by elimination; the sidecar keeps ALL samples, not
    # just the min, so the stall distribution itself is on record.
    def python_worker_pids() -> set[int]:
        pids: set[int] = set()
        for p in os.listdir("/proc"):
            if not p.isdigit():
                continue
            try:
                with open(f"/proc/{p}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\x00", b" ")
            except OSError:
                continue
            if b"pyspark.daemon" in cmd or b"pyspark.worker" in cmd:
                pids.add(int(p))
        return pids

    def gc_totals() -> tuple[int, int]:
        ms = n = 0
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        for i in range(beans.size()):
            b = beans.get(i)
            ms += max(b.getCollectionTime(), 0)
            n += max(b.getCollectionCount(), 0)
        return ms, n

    def host_cpu() -> tuple[int, int, int]:
        # /proc/stat aggregate jiffies: (busy = user+nice+sys+irq+softirq,
        # idle+iowait, steal). A stalled sample with a large steal delta
        # or a busy share far above this process's own usage is DIRECT
        # noisy-neighbor evidence, not elimination.
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            v = [int(x) for x in parts[1:9]]
            busy = v[0] + v[1] + v[2] + v[5] + v[6]
            return busy, v[3] + v[4], v[7]
        except (OSError, ValueError, IndexError):
            return 0, 0, 0

    # APP-scoped CPU (r11, VERDICT r10 #3): utime+stime jiffies of THIS
    # session's processes only — the JVM (driver+executor in local mode),
    # the Python driver, and every live pyspark daemon/worker. Unlike
    # wall time (load-wave noise) and /proc/stat busy (whole host), this
    # is the per-query work metric that is comparable across core counts:
    # a parallel query does ~the same app CPU at 8 and 32 cores while
    # its wall time scales, and a fixed-overhead-bound query shows both
    # flat. The 8-vs-32 scaling evidence reads THIS field.
    _jvm_pid: int | None = None

    def app_cpu_jiffies() -> int:
        nonlocal _jvm_pid
        if _jvm_pid is None:
            try:
                _jvm_pid = int(
                    spark._jvm.java.lang.ProcessHandle.current().pid()
                )
            except Exception:
                _jvm_pid = 0
        total = 0
        for p in {os.getpid(), _jvm_pid} | python_worker_pids():
            if not p:
                continue
            try:
                with open(f"/proc/{p}/stat") as f:
                    rest = f.read().rsplit(") ", 1)[1].split()
                # utime + stime + cutime + cstime: the child terms keep
                # a REAPED worker's CPU on the books (it rolls into its
                # parent daemon/JVM when reaped; without them a sample
                # that reaps workers under-counts, even negative).
                total += (
                    int(rest[11])
                    + int(rest[12])
                    + int(rest[13])
                    + int(rest[14])
                )
            except (OSError, ValueError, IndexError):
                continue
        return total

    warm: dict[str, float | None] = {}
    cold: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    attribution: dict[str, list[dict]] = {}
    warm_samples: dict[str, list[float]] = {name: [] for name in HEADLINE}

    def timed_sample(name: str, run: int, sampling_pass: int) -> float | None:
        """One full-plan execution with per-sample attribution; returns
        the wall time or None on failure (recorded in ``errors``)."""
        try:
            pids0 = python_worker_pids()
            gc_ms0, gc_n0 = gc_totals()
            busy0, idle0, steal0 = host_cpu()
            app0 = app_cpu_jiffies()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            app1 = app_cpu_jiffies()
            busy1, idle1, steal1 = host_cpu()
            gc_ms1, gc_n1 = gc_totals()
            pids1 = python_worker_pids()
            attribution[name].append(
                {
                    "run": run,
                    "pass": sampling_pass,
                    "t": elapsed,
                    "gc_ms": gc_ms1 - gc_ms0,
                    "gc_n": gc_n1 - gc_n0,
                    "workers_spawned": len(pids1 - pids0),
                    "workers_reaped": len(pids0 - pids1),
                    "workers_after": len(pids1),
                    "cpu_busy_j": busy1 - busy0,
                    "cpu_idle_j": idle1 - idle0,
                    "cpu_steal_j": steal1 - steal0,
                    "app_cpu_j": app1 - app0,
                }
            )
            return elapsed
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
            return None
        finally:
            clear_leaked_storage()

    # Pass 1: per query, 1 cold (first-execution codegen) + 3 warm
    # samples, back-to-back.
    for name in HEADLINE:
        attribution[name] = []
        for run in range(4):
            elapsed = timed_sample(name, run, sampling_pass=1)
            if run == 0:
                cold[name] = elapsed
            elif elapsed is not None:
                warm_samples[name].append(elapsed)

    # Pass 2: two more warm samples per query, taken AFTER the whole
    # pass-1 sweep. The host's external load arrives in minutes-long
    # waves (SCALE.md r10: loadavg ~6-8 with zero local processes,
    # per-query wall swinging 2-3x on identical code), so three
    # BACK-TO-BACK samples of a sub-second query are fully
    # wave-correlated — min-of-3 consecutive can still record a 5x
    # stall as the query's time (the r9 doc_stats/quality_score/
    # ewm_mean driver spikes, later shown environmental). Re-sampling
    # each query several minutes later decorrelates the min from any
    # single wave; warm = min over both passes, and the sidecar keeps
    # EVERY sample with its attribution, so the stall distribution
    # itself stays on record.
    for name in HEADLINE:
        if name in errors:
            continue
        for run in range(4, 6):
            elapsed = timed_sample(name, run, sampling_pass=2)
            if elapsed is not None:
                warm_samples[name].append(elapsed)

    for name in HEADLINE:
        warm[name] = min(warm_samples[name]) if warm_samples[name] else None

    # Extended section: round-4+ additions, reported OUTSIDE the
    # headline metric so `value` stays comparable round-over-round on
    # the fixed HEADLINE list. min-of-2 for the same reason the
    # headline is min-of-3: a single sample misreads one VM stall (the
    # r4 run-to-run spread on dedup_multi_signal was 6.5s vs 15s) as a
    # per-query regression; the second run also sheds first-execution
    # codegen.
    extended: dict[str, float | None] = {}
    for name in EXTENDED:
        samples = []
        for _ in range(2):
            try:
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.perf_counter() - t0, 3))
            except Exception as e:
                errors[name] = f"{type(e).__name__}: {e}"[:500]
                print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
                # a query appears in exactly ONE of extended/errors —
                # a partial sample before a failure is not a timing
                # (ADVICE r4)
                samples = []
                break
            finally:
                clear_leaked_storage()
        extended[name] = min(samples) if samples else None

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # The driver captures only a bounded TAIL of stdout (~2000 chars) and
    # parses the JSON line out of it. In r5 the single line grew past that
    # window (queries_extended reached ~140 entries) and the driver
    # recorded parsed:null despite rc=0. Keep the stdout line COMPACT —
    # headline warm breakdown + scalar totals only — and write the full
    # detail (per-query cold, extended, errors) to a sidecar JSON file.
    report = {
        "metric": "catalog_headline_total",
        "value": round(sum(v for v in warm.values() if v is not None), 3),
        "unit": "sec",
        "queries": warm,
        "value_cold": round(sum(v for v in cold.values() if v is not None), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    detail = dict(report)
    detail["queries_cold"] = cold
    # Protocol-stable companion statistic (r11, VERDICT r10 #8): the
    # r1-r9 series used min of 3 BACK-TO-BACK warm samples; r10 changed
    # the headline to min-of-5-in-two-passes. Emit the pass-1 min-of-3
    # alongside so round-over-round warm deltas can always be compared
    # under ONE protocol. The stdout headline line is unchanged.
    warm_p1 = {
        name: min(
            (s["t"] for s in attribution[name] if s["run"] in (1, 2, 3)),
            default=None,
        )
        for name in HEADLINE
    }
    detail["queries_warm_pass1_min3"] = warm_p1
    detail["value_warm_pass1_min3"] = round(
        sum(v for v in warm_p1.values() if v is not None), 3
    )
    detail["attribution"] = attribution
    detail["queries_extended"] = extended
    detail["value_extended"] = round(
        sum(v for v in extended.values() if v is not None), 3
    )
    if errors:
        detail["errors"] = errors
        report["error_count"] = len(errors)
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_EXTENDED.json"
    )
    with open(sidecar, "w") as f:
        json.dump(detail, f, indent=1)
    print(f"bench: full detail written to {sidecar}", file=sys.stderr)
    line = json.dumps(report)
    if len(line) > 1800:  # stay inside the driver's tail window
        report.pop("queries", None)
        line = json.dumps(report)
    print(line)


if __name__ == "__main__":
    main()
