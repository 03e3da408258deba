#!/usr/bin/env python
"""Regenerate PLANS.md: curated explain('formatted') evidence for the
plan-audited queries at $SPARK_GRAFT_SF_DIR (default sf0.1)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEEP = re.compile(
    r"Scan parquet|PushedFilters|ReadSchema|Join|Exchange|TakeOrdered|"
    r"HashAggregate|Window|Sort |Filter|Project|Expand|Generate|"
    r"ArrowEvalPython|MapInPandas"
)
NOTES = {
    "pricing_summary": "TPC-H Q1: the shipdate filter and 7-column pruning reach the parquet scan; two-phase HashAggregate (partial map-side).",
    "top_revenue_orders": "TPC-H Q3: dimension broadcast + distributed top-k (TakeOrderedAndProject — no global sort).",
    "nation_revenue": "TPC-H Q5: supplier/nation/region broadcast; the only real shuffle is orders⋈lineitem.",
    "tpch_q8_market_share": "Seven-way join: 5+ BroadcastHashJoins, exactly one shuffled fact join.",
    "tpch_q21_waiting_supplier": "EXISTS/NOT-EXISTS decorrelated into one order-level aggregate + join back; no correlated re-execution.",
    "rolling_time_window": "One Exchange on user_id feeds both RANGE-frame window aggregates.",
    "sessionize": "Two windows + final aggregate share a single user_id hash partitioning.",
    "dedup_exact": "One shuffle keyed on the 16-byte md5; only (hash,id) crosses the wire; left-semi restores survivors.",
    "ngram_jaccard_pairs": "Stop-shingle df-cap is a window count fused into the single shingle-keyed Exchange (no df-agg + probe join — the probe side used to recompute the whole scan→shingle pipeline); in-bucket pair generation — no candidate self-join shuffle.",
    "unigram_logprob_score": "Token count shuffle once; top-V vocabulary and 1-row totals broadcast back onto the token stream.",
    "tpch_q7_nation_volume": "Bilateral nation pair: all dims broadcast, pair disjunction applied post-join; one shuffled fact join; ship-window pushed to scan.",
    "pmi_cooccur": "Pair fan-out bounded by broadcast top-100 vocabulary; one doc_id shuffle for the pair count; top-k via TakeOrdered.",
    "curate_corpus": "Prefix-filtered pair plan auto-selected at t=0.85: xxhash64 shingle arrays, rarity-prefix candidates (document frequency as a window count over the shingle Exchange — no df-agg + probe join), array_intersect verification; the scan+gate+dedup prefix recomputes per consumer (measured cheaper than persisting full-text rows — SCALE.md r4).",
    "embedding_quantize_error": "Per-dim ranges: one posexplode aggregate to |dims| rows, collapsed to a 1-row range frame broadcast onto a single corpus scan; error math is JVM higher-order expressions (no Python, no vector shuffle).",
    "lang_confusion": "Text never shuffles: lang_id evaluates in the scan projection; one hash aggregate to the |langs|-squared grid; share window over the tiny grid.",
    "semantic_dedup_checked": "n_cells=1 SemDeDup baseline: broadcast self-pair on the capped id range, cosine filter, left-anti back onto the corpus. The static plan below shows SortMergeJoin LeftAnti; at runtime AQE converts it to BroadcastHashJoin LeftAnti because the drop list is a small id-only aggregate (asserted in tests/test_plans.py::test_semantic_dedup_anti_join_broadcasts_at_runtime). The hint is deliberately left to AQE: the drop-list size scales with the duplicate count, so a hard broadcast hint would be wrong at 100 TB dup rates.",
    "winnow_pairs": "Winnowed-fingerprint inverted index: df-capped buckets, in-bucket i<j pair generation, one shuffle on the fingerprint.",
    "segment_dedup": "C4-style segment dedup: JVM-array segmentation in the scan projection; ONE shuffle keyed on segment text serves the rank-1 keep; reassembly reuses the same grouping.",
    "pagerank_trade_graph": "Edge construction is the only fact shuffle (dims broadcast); each iteration joins the aggregated edge table against ranks and re-aggregates by dst — lineage cut per round by localCheckpoint.",
    "cdc_apply_latest": "One key shuffle collapses the ops log (max_by, no window/sort); the MERGE full-outer join reuses the key partitioning; deletes travel key-only into a broadcast-able anti join.",
    "skew_zipf_join_salted": "Fact shuffles on (k, salt) so the 58%-hot key spreads over 8 reducers; the dim replicates 8x via explode before its shuffle — the documented price of salting (SCALE.md crossover: prefer an engaged AQE split).",
    "active_users_trailing_24h": "Distinct (hour,user) collapse FIRST (the only data-sized shuffle); the 24x fan-out replicates the collapsed frame, not raw events; per-bucket distinct count completes it.",
    "ann_pq_topk": "PQ-ADC: corpus reduced to m-int codes (Arrow-batched encode against driver-fit codebooks); ADC score = m JVM array lookups into broadcast per-query LUTs; salted two-stage top-k shortlist (no single-task sort); exact re-rank streams the corpus against the broadcast shortlist.",
    "bigram_logprob_score": "Top-V vocab + both bigram count tables (bounded at (V+1)^2 rows) broadcast back onto the bigram stream; the only corpus-sized shuffles are the token count and the (id,pos) positional self-join.",
    "dsir_importance_weights": "Hashed-unigram target/raw distributions in ONE bounded 1024-row aggregate + 1-row totals, both broadcast; a single token explode feeds counting and scoring.",
    "corpus_shuffle_shards": "Deterministic training-order shuffle: md5-derived shard is the ONLY shuffle key; per-shard window sorts (n_shards parallel tasks), never a global single-partition sort.",
    "segment_neardup": "Paragraph MinHash: JVM-array segmentation materializes ONCE via localCheckpoint (r10 — the segment explode fed three consumers and recomputed per consumer; the plan below scans the checkpointed RDD, zero parquet re-scans); candidate and drop traffic is (band,bucket)/uid-only; the final anti join restores surviving segments.",
    "bootstrap_ci_mean_price": "One md5 per ROW (not per replicate); the 48-replicate explode collapses via map-side combine to |groups|*48 partial sums before the only shuffle; percentile runs on 48 rows per group.",
    "table_manifest_checksum": "Pure map-side combine: per-row md5 XOR + count + min/max fold in one pass; the shuffle carries one partial row per task.",
    "exact_span_dedup": "Rolling-window substring dedup: window hashing is scan-projection JVM expressions; ONE (gram-hash,id,pos) shuffle with min(id) ownership as a window over that same exchange (r10 fusion — the former ownership agg + probe join tokenized the corpus twice); duplicate starts collect per doc and token filtering is per-row higher-order functions — tokens never shuffle.",
    "unicode_normalize": "NFC normalization: a single ArrowEvalPython map sandwiched between JVM regexp stages. The operator itself adds NO Exchange — the one visible below is ensure_parallelism's ingest repartition of the single-file test fixture; on a real multi-file source the plan is scan→map→project end to end.",
    "release_corpus_manifest": "Publish capstone in ONE lazy plan: Arrow NFC map feeds span-dedup's two data-sized shuffles (gram-hash ownership + per-doc start lists); release gates are row filters. Remaining Exchanges are the ingest repartition of the single-file fixture and the final aggregate's one-partial-row-per-task combine.",
    "span_dedup_incremental": "Incremental substring dedup: the corpus side is ONE (gh)-only distinct (8-byte rows) left-joined onto the batch grams as a hit flag, with in-batch min(id) ownership as a window over the same gh exchange (r10 — the former semi/anti/owner shape consumed the batch window explode three times) — no corpus payload ever moves, batch cost ∝ batch windows.",
    "decontaminate_spans": "Span-level decontamination: eval-side (gh)-only distinct (5% split) feeds ONE left-semi join against the train windows; no in-batch ownership branch exists, so train-side text never shuffles beyond the window explode.",
    "key_skew_profile": "Exact distributed Gini: per-key count aggregate, then the three-step prefix-sum (range repartition + per-partition window + broadcast offsets) over |keys| rows — no single-partition Window.orderBy anywhere; top-10 via TakeOrdered.",
    "active_users_hll_rollup": "Mergeable-sketch rollup: two ObjectHashAggregates (daily sketch, weekly union), each with a map-side partial — only KB-sized sketches cross either Exchange; (day,user) pairs never shuffle. The weekly union re-asks read the rollup only.",
    "triangle_count_parts": "Degree-ordered triangle census, compact-forward form (r10): per-order pair fan-out bounded at C(7,2); orientation caps out-degree at O(sqrt E); the census sums |N+(x) ∩ N+(y)| per oriented edge over sorted adjacency arrays inside one codegen'd projection — no wedge-row self-join, no closing semi-join. The canonical edge list and degree table are localCheckpoint-pinned (multi-consumer, jaccard_links pattern), so the printed plan reads from ExistingRDD scans; the edge-construction fan-out is audited in the checkpoint build, not here. Every DATA-sized join is hash/sort-merge or broadcast equi; the one BroadcastNestedLoopJoin at the top of the plan is the sanctioned 1-row x 1-row combine of the triangle-count and wedge-count scalars (the plan lint pins 1-row crosses by name), not a data join.",
    "related_parts_adamic_adar": "Link-prediction wedges enumerate through the COMMON neighbor (no orientation trick applies), so the self-join is keyed on the wedge center; the non-edge filter is a left-anti equi-join on the candidate pair and the degree weight rides the adjacency rows — no BNLJ, no cartesian, TakeOrdered for the top-20. (LPA, k-core, BFS, and weighted shortest paths are not plan-audited: their per-round lineage is deliberately cut by localCheckpoint, so the final explain shows only the last round.)",
    "assortativity_parts": "Degree-mixing corr: degree aggregate + two endpoint equi-joins + ONE 1-row Pearson corr aggregate with a map-side partial — no iteration, no windows, nothing driver-sized.",
    "survival_km_customers": "Kaplan-Meier: the o_custkey aggregate is the ONLY data-sized shuffle; observation-end and total ride a broadcast 1-row frame; both cumulative windows (at-risk countdown, exp-sum-ln survival product) run single-partition over the per-duration aggregate — bounded by the day domain, never customer-sized.",
    "assoc_cats_orders": "Categorical MI + Cramer's V: per pair, ONE map-side-combinable joint-count aggregate over the data; marginals re-aggregate the |X|x|Y| joint table (never the data) and the 1-row scores union across pairs — three scans, no windows over data-sized frames.",
    "benford_price_audit": "Benford conformity: per column ONE map-side-combinable 9-bucket digit-count aggregate is the only data-sized work; the digit domain, chi-square and MAD folds all run on 9-row broadcast frames.",
    "holt_trend_daily": "Holt smoothing: the pushed date filter + ONE (priority,day) aggregate collapse the data before anything sequential; the recurrence runs as a single FlatMapGroupsInPandas over day-domain-bounded series, one series per task.",
    "embedding_pca_project": "Exact PCA: the visible plan is projection only — one ArrowEvalPython matmul over the scan; the fit ran as its own bounded job (per-batch moment rows, positional-sum combine, d+d^2+1 collected moments), so no fit-side Exchange appears here.",
    "hybrid_search_rrf": "RRF fusion: both retrieval legs keep the inverted-index term-join shape (query side broadcasts); the fusion is a full-outer join of two query-bounded rank lists + one per-query window over <= 40 candidates — nothing corpus-sized after the legs.",
    "spearman_corr_lineitem": "Spearman without a global sort: per pair ONE data-sized joint-count aggregate; average ranks are distributed prefix-sums over the |distinct|-sized marginals (localCheckpoint pins the range partitioning); the centered correlation folds over the joint table — no single-partition Window.orderBy anywhere.",
    "ks_price_drift": "Exact KS: one union+aggregate collapses both samples to pooled per-value counts (the only data-sized shuffle); both ECDFs are distributed prefix-sums over the |distinct| value table and the max-gap fold is one aggregate — the raw rows are never globally sorted.",
    "mwu_purchase_vs_click": "Mann-Whitney U: same pooled-count + prefix-sum shape as KS; the rank-sum and tie-correction folds are ONE aggregate over the |distinct| value table, and every summand is a half-integer times an integer — exactly representable, so summation order is irrelevant.",
    "theil_sen_trend": "Theil-Sen: the exact-cents daily aggregate is the only data-sized shuffle; the O(n^2) pair self-join and both percentile medians run on the day-domain series, keyed on priority so series parallelize.",
    "cusum_revenue_shift": "CUSUM: ONE exact-cents daily aggregate collapses the data; the cumulative window + argmax TakeOrdered run over the day-domain series with the 1-row stats frame broadcast.",
    "semantic_decontaminate": "Semantic decontamination: the eval side rides a BroadcastNestedLoopJoin (deliberate bounded-broadcast scoring pass — every train vector scores against every eval vector once; elements+norms extracted per ROW, the per-pair dot is a codegen'd multiply-add chain, no Python), and the contaminated-id list returns via BroadcastHashJoin LeftAnti — the corpus never shuffles.",
    "jw_match_pairs": "Jaro-Winkler linkage: ONE hash shuffle on the blocking key, in-block i<j pair generation, then one ArrowEvalPython scorer stage and a row filter — no cartesian, no global sort; candidate volume is sum(|block|^2) by construction.",
    "roc_auc_purchase": "Exact AUC: ONE per-score-value count aggregate (map-side partial) + the pinned-partitioning prefix-sum over the |distinct| score table + a 1-row fold — no global sort of raw rows, no per-threshold sweep, no Python.",
    "calibration_purchase_score": "Calibration/ECE: a 1-row bounds broadcast + ONE map-side-combinable 10-bin aggregate over the data; the ECE fold and per-bin shares run on the 10-row table — no windows, no Python.",
    "quantile_normalize_sources": "Quantile normalization: two count aggregates collapse the data; rank windows are PARTITIONED by source, pooled positions come from the pinned prefix-sum, the inverse-CDF lookup is a deliberate broadcast range join on the pooled distinct-value table, and the finished (source,value) map broadcasts back — the rows themselves never shuffle.",
    "spatial_radius_join": "Grid-blocked radius join: the small side explodes into its 3x3 cell neighborhood (modular longitude cells — antimeridian pairs survive), ONE equi-join shuffle on (cy,cx), exact haversine filter after; the all-pairs product lives only in the oracle.",
    "nearest_suppliers_knn": "kNN join: the dim side broadcasts (fact never shuffles for the join); the only Exchange is the per-fact-key top-k window with rank-limit pushdown.",
    "spatial_cluster_eps": "eps-connectivity clustering: blocked radius self-join builds edges, star-contraction CC labels components (per-round lineage cut by localCheckpoint, so the final explain shows the label frame only).",
    "activity_streaks": "Gaps-and-islands: (user,day) distinct with map-side partials, ONE user_id Exchange for the row_number window — both downstream groupBys reuse hash(user_id) via subset-satisfies-clustering, zero further Exchanges.",
    "pareto_abc_parts": "ABC classification: per-part aggregate (map-side combine), cumulative share via the pinned-partitioning prefix-sum over the part-level frame, 1-row total broadcast — no single-partition window.",
    "acf_daily_revenue": "ACF: orders collapse to one row per day (the only data-sized work); lag pairing is a broadcast self-join of the day series on exact day offsets; Pearson corr per lag on the paired frame.",
    "funnel_time_bound": "Sequential bounded funnel: three stacked per-user window mins share ONE user_id Exchange + sort; stage anchoring is data-dependent but never re-scans or self-joins the event table.",
    "session_paths_topk": "Session trigram mining: gap flag, running session id, and both leads all ride the same (user_id | ts,event_id) window — one Exchange, one sort; top-10 via TakeOrderedAndProject with a path tie-break.",
    "conversion_latency_quantiles": "Time-to-convert: same single-Exchange stacked-window shape as the funnel; integer epoch-second latency, exact interpolated percentiles on the converted-user frame.",
    "ols_price_model": "Closed-form OLS: ONE map-side-combinable moment aggregate (count/avg/var_pop/covar_pop) over the scan; the centered 2x2 Cramer solve is arithmetic on the single moment row — no iteration, no Python.",
    "image_ahash_neardup": "Perceptual-fingerprint near-dup: Arrow-batched numpy hashes each payload to a 60-bit integer; the exact pigeonhole Hamming blocking (13 chunks at radius 12) shuffles one bigint per blob — payloads never re-cross the wire.",
    "weighted_sample_ares": "A-Res weighted sampling: md5-uniform u^(1/w) score in the scan projection, distributed top-k via TakeOrderedAndProject — per-partition heads, no global sort, losers never shuffle.",
    "rake_keyphrases_topk": "RAKE keyphrases: token islands window on doc_id; phrase/member frames stay (doc,anchor)-keyed; the word-score join is vocabulary-bounded like the TF-IDF inverted index; top-15 via TakeOrdered.",
    "capped_running_balance": "Floored sequential fold: ONE FlatMapGroupsInPandas per user (keys parallelize; the clamp breaks prefix-sum associativity so no window expresses it); total per-key order makes the doubles bit-reproducible.",
    "entity_golden_records": "Entity resolution capstone: JW blocked matching (one blocking-key shuffle + Arrow scorer), star-contraction CC, then survivorship as a per-entity window + aggregate over the member frame.",
    "point_in_polygon_counts": "Geofence containment: all three ray-casting fences evaluate as codegen'd CASE arithmetic inside the single customer scan projection; the only shuffle is the 3-row rollup union.",
    "l_diversity_audit": "Privacy audit: one broadcast dim join + one shuffle to the |segments|x|nations| QI grid carrying a count-distinct partial — never data-sized after the join.",
    "woe_iv_quantity": "WOE/IV: ONE map-side-combinable 10-bin aggregate over the data; totals broadcast as one row; the IV window runs over the 10-row bin table only.",
    "forecast_backtest_smape": "Backtest: the exact-cents daily aggregate is the only data-sized shuffle; split/fit/projection/scoring all run on day-domain series frames with 1-row-per-series broadcasts.",
    "geo_cell_density": "Grid density: coordinate derivation + floor are scan-projection expressions; single shuffle keyed on the cell id with map-side partials.",
    "gopher_quality_gate": "Gopher document gate: every rule (word bounds, mean word length, symbol ratio, alpha fraction, stopwords) is a per-row array expression in ONE scan projection — zero shuffles; the flags compare exact integers so engines cannot disagree at a boundary.",
    "source_overlap_jaccard": "Cross-source contamination matrix: both sides reduce to distinct (source, 60-bit gram-hash) pairs before the ONE hash-keyed shuffle; per-gram source lists are bounded by |sources| so the in-bucket i<j expansion is |sources|^2 worst-case per gram; per-source set sizes broadcast onto the pair counts.",
    "gini_revenue_concentration": "Gini: per-customer exact-cents aggregate, the range-partitioned prefix sum, then TWO 1-row integer aggregates — sum(rank*x) is recovered algebraically from sum(cum), so no rank column and no single-partition window exist at any n.",
    "weighted_percentiles": "Weighted quantile ladder: ONE prefix-sum pass over the (group, price) order; each of p25-p90 is an exact integer crossing test (den*cw >= num*tot) against a 4-row broadcast literal frame — adding quantiles adds no scan, no shuffle.",
    "entropy_by_source": "Token entropy: one (source, token) integer count shuffle with map-side partials; the -sum(p log2 p) fold and vocab normalization run in the per-source aggregate — text crosses the wire once as tokens, never again.",
    "chi_square_event_dow": "Chi-square/Cramer's V: ONE data-sized count aggregate to the |types|x7 grid (localCheckpointed — marginals, totals, dims, and expected counts are five consumers); everything after is broadcast joins over grid rows.",
    "stickiness_dau_mau": "DAU/MAU: distinct (day,user) collapse FIRST (the only data-sized shuffle), then the <=28x fan-out replicates the COLLAPSED frame into its target days; per-day distinct count finishes it — raw events are never replicated.",
    "jaccard_link_prediction": "Jaccard link scores: canonical edges + degrees localCheckpointed (five consumers — two sym legs, the adjacency anti-join, two degree lookups — one edge build instead of five); wedge self-join keyed on the common neighbor; score is a ratio of exact integers.",
    "knn_label_noise": "Label-noise audit: the bounded query subset broadcasts through cosine_topk (corpus scan scores in place, no corpus shuffle); the disagreement vote is a (query,label)-keyed aggregate over k rows per query.",
    "centroid_margin_audit": "Centroid margins: one posexplode aggregate to the |labels|x64 centroid frame, broadcast back over a single corpus scan; per-row scoring is zip_with dot products (JVM fold, no Python); own-vs-best-other reduces per vector.",
    "attribution_time_decay": "Time-decay credit: one user_id Exchange shared by the window-id window; weights are exact dyadic bigints (2^(60-bucket)) so per-window totals are exact integer sums; credit splits are (user, window)-keyed joins.",
    "pca_power_top_component": "Power-iteration PC1: the corpus is touched by ONE vec-keyed self-join moment aggregate (covariance) and one final projection scan; the 30 matvec+normalize rounds run DRIVER-side on the collected pinned 64x64 grid (r9 determinism fix) — iteration cost is dimension-sized, independent of rows, and zero cluster time.",
    "ann_lsh_checked": "Checked sign-LSH: six sequential-fold hyperplane dots evaluate in the scan projection; candidates come from ONE id-only bucket join against the broadcast query buckets; exact cosine re-rank + salted top-k.",
    "heavy_hitters_cms_checked": "Portable CMS: the word-count table (one token shuffle, localCheckpointed) feeds totals, the exact theta-support candidates, and the d x w counter grid; probes join the broadcast grid — every counter an exact integer sum.",
    "k_anonymize_local": "Local recoding: level-0 is the only full-data aggregate; each cascade level re-aggregates just the still-violating subset against grid-bounded group lists (AQE broadcasts them at runtime).",
    "percent_rank_cume": "Scale-true global percent_rank/cume_dist: the unique order makes rank == row_number, so both statistics are exact integer divisions on the range-partitioned prefix COUNT + a broadcast 1-row total — no single-partition window.",
    "knn_label_transfer": "kNN label propagation: the bounded query set broadcasts (the corpus never shuffles for scoring — same shape as ann_cosine_topk); salted two-stage top-k; the majority vote is a tiny (query,label) aggregate + per-query window.",
    "propensity_match_pairs": "Propensity matching: ONE user_id shuffle for the exact-cents score reduction; control dedup aggregates per score; the as-of match runs on the range-partitioned distributed as-of join — no global sort, no single-partition window.",
    "minhash_source_signature": "Mergeable source sketches: all 64 permutation minima compute in ONE aggregate over the distinct (source, gram) stream (no per-perm pass, no explode); the |sources|-row signature table self-joins via broadcast — gram sets never pairwise-join.",
    "asof_nearest_click": "Nearest as-of under tolerance: backward and forward scans ride ONE (user | tss) window Exchange over the union (last/first ignorenulls); no self-join, no global sort; the LATERAL argmin lives only in the oracle.",
    "twap_user_day": "Time-weighted average: ONE (user, day) shuffle shared by the lead window and the aggregate; every weighted term is an exact bigint (cents x delta-microseconds) so summation order is irrelevant.",
    "k_anonymize_generalize": "All four generalization-ladder levels in ONE GROUPING SETS pass (dims broadcast, one data-sized grouping aggregate); level choice and the released grid are arithmetic on the grid-bounded rows.",
    "bh_fdr_segments": "FDR gate: one map-side-combinable exact-integer moment aggregate over the data; z/p/rank/threshold all run on the |segments|-row frame (the SinglePartition window is |segments|-bounded by construction).",
    "trajectory_length_daily": "Trajectory length: coordinate derivation in the scan projection; ONE (user, day) Exchange shared by the lag window and the aggregate; haversine is codegen'd CASE-free arithmetic.",
    "vocab_drift_jsd": "Vocabulary JSD: one (term)-keyed count shuffle with map-side partials; the divergence folds over the vocab-bounded count table with the 1-row totals broadcast.",
    "weighted_median_price": "Weighted median: per-(group, price) aggregate collapses the data; the cumulative weight rides the pinned range-partitioned prefix sum over the GLOBAL (group, price) order with broadcast prior-group offsets — no per-group ordered window at any group cardinality (plan-asserted).",
    "neyman_allocation": "Neyman allocation: ONE moment aggregate over the data; quotas, largest-remainder ranks and the allocation all run on the |strata|-row frame.",
    "dedup_cluster_histogram": "Dedup audit: reuses the CC labeling core (iterative rounds lineage-cut by localCheckpoint, so the explain shows the label frame); two tiny aggregates after.",
    "ann_ivf_checked": "Checked IVF: sign-pattern seed cells fit in ONE posexplode aggregate (<=cells x dim rows collected); assignment is a per-row argmin over broadcast centroid literals in the scan projection; candidates come from ONE cell-keyed join against the broadcast probe set; exact cosine re-rank + salted top-k.",
    "ann_pq_checked": "Checked PQ: L2-normalize in the scan projection; codebook fit/refine runs on codebook-sized frames (localCheckpointed per Lloyd round); encode is ONE broadcast join + (id,s,code) partial aggregate; ADC joins the broadcast query LUT; the bounded shortlist re-ranks by exact cosine.",
    "ann_recall_checked": "Checked recall audit: both legs keep their no-corpus-shuffle shapes (sign-LSH bucket join + broadcast-query brute force); the audit itself adds one left join + aggregate over k x |queries| rows.",
}
# diversity_sample_kcenter is not plan-audited: the greedy selection runs
# k bounded driver rounds and returns a materialized local frame, so its
# final explain is a LocalTableScan (same exclusion rationale as LPA /
# k-core / BFS above).
# bpe_merges_checked is likewise excluded: its 8 rounds each collect a
# 1-row best pair and the result is the assembled merge list.
# backfill_day_partition is likewise excluded: its plan construction
# performs the partitioned write + dynamic overwrite, so the final
# explain shows only the post-backfill scan.


def main() -> None:
    from pandas_etl_spark.catalog import QUERIES
    from pandas_etl_spark.session import get_spark

    spark = get_spark("plans")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    out = [
        "# PLANS — physical-plan evidence (generated from explain('formatted') at sf0.1)",
        "",
        "Regenerate: `python scripts/gen_plans.py` (or the inline snippet in git history).",
        "Key lines only (scans/joins/exchanges/aggregates); full plans available via",
        "`QUERIES[name](spark, sf)._jdf.queryExecution()`. Plan-shape regressions fail",
        "tests/test_plans.py before they reach this file.",
        "",
    ]
    # Prose/plan contradiction lint (VERDICT r9 #4): a note claiming "no
    # BNLJ" above a plan containing one (the r9 triangle_count_parts
    # drift) must fail regeneration, not ship. A note that NAMES the
    # operator (e.g. "the one BroadcastNestedLoopJoin is the sanctioned
    # 1-row combine") is an acknowledgment, not a contradiction.
    claim_lints = [
        ("no bnlj", "BroadcastNestedLoopJoin"),
        ("no cartesian", "CartesianProduct"),
        ("no python", "ArrowEvalPython"),
        ("no python", "MapInPandas"),
    ]
    contradictions: list[str] = []
    for name, note in NOTES.items():
        plan = QUERIES[name](spark, sf)._jdf.queryExecution().explainString(mode)
        note_low = note.lower()
        for claim, marker in claim_lints:
            if claim in note_low and marker in plan and marker.lower() not in note_low:
                contradictions.append(
                    f"{name}: note claims '{claim}' but plan contains {marker}"
                )
        seen: set[str] = set()
        kept: list[str] = []
        for line in plan.splitlines():
            if not KEEP.search(line):
                continue
            key = line.strip()
            if key.startswith("(") or key in seen:
                continue
            seen.add(key)
            kept.append(line.rstrip())
            if len(kept) >= 18:
                break
        out.append(f"## {name}\n\n{note}\n\n```")
        out.extend(kept)
        out.append("```\n")
    if contradictions:
        for c in contradictions:
            print(f"gen_plans: PROSE/PLAN CONTRADICTION — {c}", file=sys.stderr)
        print("gen_plans: refusing to write PLANS.md", file=sys.stderr)
        sys.exit(1)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md regenerated")


if __name__ == "__main__":
    main()
