"""Declarative data-quality checks — one-scan expectation reports.

A training-data pipeline gates every ingest on expectations (null rates,
ranges, category membership, referential shape). This operator compiles
a rule list into ONE aggregation pass (conditional counts — no per-rule
scans, no Python) and emits a long-form report frame, so the check costs
a single read at any scale and the report is itself a queryable table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: list[tuple[str, str]]) -> DataFrame:
    """Evaluate ``(rule_name, boolean SQL expr)`` expectations.

    A row VIOLATES a rule when the expression is false OR null (an
    unknown is not a pass — SQL three-valued logic would otherwise let
    null-laden columns sail through range checks). Returns one row per
    rule: ``(rule, n_rows bigint, n_violations bigint, passed boolean)``
    — computed in a single scan with conditional aggregates, then
    unpivoted driver-free via an array-of-structs explode (same shape as
    Table.describe)."""
    if not rules:
        raise ValueError("check_rules: at least one rule required")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, expr) in enumerate(rules):
        violated = ~F.coalesce(F.expr(expr), F.lit(False))
        aggs.append(F.sum(F.when(violated, 1).otherwise(0)).alias(f"__v{i}"))
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col(f"__v{i}").cast("bigint").alias("n_violations"),
                (F.col(f"__v{i}") == 0).alias("passed"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return one.select(F.explode(entries).alias("r")).select("r.*")


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_cols: list[str],
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier flags — the numeric-column anomaly gate
    of an ingest pipeline.

    The group variance is computed from explicit sum/sum-of-squares
    partials, NOT ``var_samp``: Spark's Welford merge order drifts ~1 ulp
    from a sequential engine even on identical input order, while plain
    sums are bit-equal at matched partitioning (driver-contract finding,
    round 2) — and at scale sum/sumsq is the same single map-side-partial
    shuffle. z is rounded to 6 decimals BEFORE thresholding so the flag
    can't flip across engines on ulp noise.

    Returns id/group/value columns + ``z`` (null when the group is
    degenerate: n < 2 or zero variance) + ``is_outlier``.
    """
    v = F.col(value_col)
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__ss"),
    )
    # no broadcast hint: one stats row PER GROUP — high-cardinality
    # group_cols (e.g. per-user) would not fit an executor at scale;
    # AQE broadcasts dynamically when the frame is actually small,
    # and otherwise both sides already hash on group_cols
    joined = df.join(stats, group_cols)
    n = F.col("__n").cast("double")
    mean = F.col("__s") / n
    var = (F.col("__ss") - F.col("__s") * F.col("__s") / n) / F.nullif(
        n - F.lit(1.0), F.lit(0.0)
    )
    sd = F.sqrt(var)
    z = F.round((v - mean) / F.nullif(sd, F.lit(0.0)), 6)
    return joined.select(
        *id_cols,
        *group_cols,
        value_col,
        z.alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_outlier"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to its group's
    [lower, upper] exact percentiles — the standard numeric-feature
    taming step before training.

    Exact percentiles, two-stage: one groupBy computes the cutpoints
    (map-side partial sort per group), the tiny cutpoint frame
    broadcasts back, and the clip is a narrow projection. No window
    sort over the full data. Spark ``F.percentile`` interpolates
    identically to DuckDB's ``quantile_cont`` (proven bit-exact, round
    1), so clipped values compare raw cross-engine."""
    cuts = df.groupBy(*group_cols).agg(
        F.percentile(value_col, lower).alias("__lo"),
        F.percentile(value_col, upper).alias("__hi"),
    )
    v = F.col(value_col)
    return (
        df.join(cuts, group_cols)  # AQE-sized join, see z-score note
        .select(
            *id_cols,
            *group_cols,
            value_col,
            F.least(F.greatest(v, F.col("__lo")), F.col("__hi")).alias("clipped"),
            ((v < F.col("__lo")) | (v > F.col("__hi"))).alias("was_clipped"),
        )
    )


def split_by_rules(
    df: DataFrame, rules: list[tuple[str, str]]
) -> tuple[DataFrame, DataFrame]:
    """Row-level twin of :func:`check_rules`: partition ``df`` into
    (passing, quarantined) frames, where a row quarantines when ANY
    rule evaluates false-or-null for it. The quarantine side carries a
    ``violated_rules`` array naming the failed rules — the triage
    column an ops queue needs. Both frames are narrow projections of
    one scan (no shuffle, no Python)."""
    if not rules:
        raise ValueError("split_by_rules: at least one rule required")
    flags = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(F.expr(expr), F.lit(False)), F.lit(name))
                for name, expr in rules
            ]
        )
    )
    tagged = df.withColumn("violated_rules", flags)
    good = tagged.filter(F.size("violated_rules") == 0).drop("violated_rules")
    bad = tagged.filter(F.size("violated_rules") > 0)
    return good, bad


def ks_two_sample(
    df1: DataFrame, df2: DataFrame, col: str, alpha_c: float = 1.358
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift test — the bin-free
    complement of the PSI monitor: D = max over the pooled value
    domain of |ECDF1 - ECDF2|, with the large-sample critical value
    c(alpha)*sqrt((n1+n2)/(n1*n2)) (default c = 1.358 ⇒ alpha = 0.05)
    and the drift verdict. Returns one row
    (n1, n2, ks_d, ks_crit, drifted).

    Scale shape: each sample collapses to per-value counts in ONE
    union+aggregate pass (map-side combinable); both ECDFs are
    distributed prefix-sums (:mod:`operators.prefix`) over the pooled
    |distinct|-sized value table, and the max-gap fold is one
    aggregate over that table — the raw samples are scanned once and
    never sorted globally. ECDF values are integer-count ratios, so D
    is bit-deterministic across engines; the verdict compares the
    UNROUNDED D against the critical value."""
    from pandas_etl_spark.operators.prefix import global_running_sum

    tagged = (
        df1.select(F.col(col).alias("v"), F.lit(1).alias("s"))
        .unionAll(df2.select(F.col(col).alias("v"), F.lit(2).alias("s")))
        .filter(F.col("v").isNotNull())
    )
    vals = tagged.groupBy("v").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("s") == 2, 1).otherwise(0)).alias("c2"),
    )
    run = global_running_sum(vals, [F.col("v")], "c1", "cum1")
    run = global_running_sum(run, [F.col("v")], "c2", "cum2")
    tot = vals.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
    )
    crit = F.lit(alpha_c) * F.sqrt(
        (F.col("n1") + F.col("n2")) / (F.col("n1") * F.col("n2"))
    )
    return (
        run.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
            F.max(
                F.abs(
                    F.col("cum1") / F.col("n1") - F.col("cum2") / F.col("n2")
                )
            ).alias("_d"),
        )
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            F.round("_d", 6).alias("ks_d"),
            F.round(crit, 6).alias("ks_crit"),
            (F.col("_d") > crit).alias("drifted"),
        )
    )


def mann_whitney_u(
    df1: DataFrame, df2: DataFrame, col: str
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample location test —
    the rank-based complement of the KS shape test: U1 = R1 -
    n1(n1+1)/2 where R1 is the average-rank sum of sample 1 in the
    pooled ranking, with the tie-corrected normal approximation
    z = (U1 - n1·n2/2) / sqrt(n1·n2/12 · ((N+1) - Σ(t³-t)/(N(N-1))))
    (the standard large-sample form). Returns one row
    (n1, n2, u1, z_score).

    Scale shape: one union+aggregate pass collapses both samples to
    pooled per-value counts; average ranks come from the distributed
    prefix-sum over the |distinct| value table (no global sort); the
    rank-sum and tie-correction folds are one aggregate over that
    table. R1 sums integer-plus-half average ranks weighted by integer
    counts — exact in doubles well past any test-scale N — so U and z
    are deterministic across engines (rounded to 6 for comparison)."""
    from pandas_etl_spark.operators.prefix import global_running_sum

    tagged = (
        df1.select(F.col(col).alias("v"), F.lit(1).alias("s"))
        .unionAll(df2.select(F.col(col).alias("v"), F.lit(2).alias("s")))
        .filter(F.col("v").isNotNull())
    )
    vals = tagged.groupBy("v").agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("s") == 2, 1).otherwise(0)).alias("c2"),
    )
    run = global_running_sum(
        vals.withColumn("ct", F.col("c1") + F.col("c2")),
        [F.col("v")],
        "ct",
        "cum",
    )
    # average rank of every row holding value v (1-based)
    ar = (
        F.col("cum").cast("double")
        - F.col("ct")
        + (F.col("ct") + F.lit(1.0)) / 2
    )
    folded = run.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
        F.sum(F.col("c1") * ar).alias("r1"),
        F.sum(
            F.col("ct").cast("double") * F.col("ct") * F.col("ct")
            - F.col("ct")
        ).alias("tsum"),
    )
    n = F.col("n1") + F.col("n2")
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2
    mu = F.col("n1") * F.col("n2") / 2
    var = (
        F.col("n1")
        * F.col("n2")
        / 12
        * ((n + 1) - F.col("tsum") / (n * (n - 1)))
    )
    return folded.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(u1, 6).alias("u1"),
        F.round(
            F.when(var > 0, (u1 - mu) / F.sqrt(var)).otherwise(F.lit(0.0)),
            6,
        ).alias("z_score"),
    )


def roc_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC-AUC of a score column against a binary label — the
    model-evaluation primitive, computed by the rank identity
    AUC = (R1 - n1(n1+1)/2) / (n1·n0) where R1 is the average-rank sum
    of the positives in the pooled score ranking (ties get average
    ranks, the standard tie-corrected AUC ≡ P(s+ > s-) + ½P(s+ = s-)).
    Returns one row (n_pos, n_neg, auc, gini) with gini = 2·AUC - 1.

    Scale shape: ONE per-score-value count aggregate (map-side
    combinable), average ranks via the distributed prefix-sum over the
    |distinct| score table, one fold — the rows are never globally
    sorted, and no per-threshold sweep materializes. Average ranks are
    half-integers weighted by integer counts, so every sum is exactly
    representable and AUC is bit-deterministic in any order."""
    from pandas_etl_spark.operators.prefix import global_running_sum

    lab = F.col(label_col).cast("int")
    vals = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(F.col(score_col).alias("v"))
        .agg(
            F.sum(lab).alias("c1"),
            F.sum(F.lit(1) - lab).alias("c0"),
        )
    )
    run = global_running_sum(
        vals.withColumn("ct", F.col("c1") + F.col("c0")),
        [F.col("v")],
        "ct",
        "cum",
    )
    ar = (
        F.col("cum").cast("double")
        - F.col("ct")
        + (F.col("ct") + F.lit(1.0)) / 2
    )
    folded = run.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c0").cast("double").alias("n0"),
        F.sum(F.col("c1") * ar).alias("r1"),
    )
    auc = (
        F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2
    ) / (F.col("n1") * F.col("n0"))
    return folded.select(
        F.col("n1").cast("bigint").alias("n_pos"),
        F.col("n0").cast("bigint").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(2 * auc - 1, 6).alias("gini"),
    )


def calibration_bins(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability table for a score against a binary label — the
    calibration half of model evaluation beside :func:`roc_auc` (AUC
    measures ranking; calibration measures whether score LEVELS match
    outcome rates). Scores min-max-normalize against broadcast global
    bounds into ``n_bins`` equi-width bins (the PSI binning
    convention); per bin: count, mean normalized score, positive rate,
    and the |confidence - accuracy| gap whose count-weighted sum is
    the Expected Calibration Error (attached to every row).

    Scale shape: one 1-row bounds aggregate broadcast back, ONE
    map-side-combinable bin aggregate over the data, ECE folded on the
    n_bins-row table. Bin shares are integer-count ratios; means are
    sums of identically-computed doubles (same normalize expression
    both engines), rounded to 6."""
    lab = F.col(label_col).cast("int")
    src = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    bounds = src.agg(
        F.min(F.col(score_col).cast("double")).alias("lo"),
        F.max(F.col(score_col).cast("double")).alias("hi"),
    )
    p = F.when(
        F.col("hi") > F.col("lo"),
        (F.col(score_col).cast("double") - F.col("lo"))
        / (F.col("hi") - F.col("lo")),
    ).otherwise(F.lit(0.0))
    binned = src.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(n_bins - 1), F.floor(p * n_bins).cast("int")
        ).alias("bin"),
        p.alias("p"),
        lab.alias("y"),
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").alias("sp"),
        F.sum("y").alias("sy"),
    )
    tot = cells.agg(F.sum("n").alias("nt"))
    scored = cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("n").cast("bigint").alias("n"),
        (F.col("sp") / F.col("n")).alias("conf"),
        (F.col("sy").cast("double") / F.col("n")).alias("acc"),
        (
            F.col("n").cast("double")
            / F.col("nt")
            * F.abs(F.col("sp") / F.col("n") - F.col("sy") / F.col("n"))
        ).alias("w_gap"),
    )
    ece = scored.agg(F.sum("w_gap").alias("ece"))
    return (
        scored.crossJoin(F.broadcast(ece))
        .select(
            "bin",
            "n",
            F.round("conf", 6).alias("mean_score"),
            F.round("acc", 6).alias("pos_rate"),
            F.round("ece", 6).alias("ece"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_col: str = "normalized",
) -> DataFrame:
    """Cross-group quantile normalization — the batch-effect corrector
    for heterogeneous corpora: every value is replaced by the POOLED
    distribution's quantile at its within-group ECDF position, so all
    groups end up with the same marginal distribution (the microarray
    / multi-source-corpus standardization). Position
    p = (avg_rank - 1)/(n_g - 1) (ties -> average rank, single-row
    groups -> 0.5); the pooled inverse CDF interpolates linearly at
    p·(N-1) over the pooled sorted multiset — quantile_cont semantics,
    so a group identical to the pool maps (nearly) onto itself.

    Scale shape: two aggregates collapse the data — per-(group, value)
    counts and pooled per-value counts. Within-group ranks run as a
    window PARTITIONED by group over the count table (groups
    parallelize; per-group frame = that group's distinct values);
    pooled cumulative positions come from the pinned distributed
    prefix-sum. The inverse-CDF lookup is a broadcast RANGE join of
    the (group, value)-level frame against the pooled DISTINCT-value
    table — the one deliberate broadcast: quantile maps are built on
    bounded-domain columns (lengths, scores, quality values); for an
    unbounded continuous domain, range-partition both sides on the
    cumulative index instead. The finished (group, value) -> out map
    broadcasts back onto the rows, so the raw data never shuffles.
    All inputs to the arithmetic are integer counts and the original
    values, making every intermediate bit-deterministic."""
    from pyspark.sql import Window as W

    from pandas_etl_spark.operators.prefix import global_running_sum

    src = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    gv = src.groupBy(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    ).agg(F.count(F.lit(1)).alias("__c"))
    wg = W.partitionBy("__g").orderBy("__v")
    ranked = gv.select(
        "__g",
        "__v",
        "__c",
        F.sum("__c").over(wg).alias("__cum"),
        F.sum("__c").over(W.partitionBy("__g")).alias("__ns"),
    )
    r = (
        F.col("__cum").cast("double")
        - F.col("__c")
        + (F.col("__c") + F.lit(1.0)) / 2
    )
    pooled = src.groupBy(F.col(value_col).cast("double").alias("__pv")).agg(
        F.count(F.lit(1)).alias("__cp")
    )
    pooled = global_running_sum(pooled, [F.col("__pv")], "__cp", "__cumP")
    nn = pooled.agg(F.sum("__cp").cast("double").alias("__N"))
    pos = (
        F.when(
            F.col("__ns") > 1,
            (r - 1) / (F.col("__ns") - 1),
        )
        .otherwise(F.lit(0.5))
        * (F.col("__N") - 1)
    )
    lookup = ranked.crossJoin(F.broadcast(nn)).select(
        "__g",
        "__v",
        pos.alias("__pos"),
        F.floor(pos).cast("bigint").alias("__lo"),
        F.ceil(pos).cast("bigint").alias("__hi"),
    )
    p_b = F.broadcast(pooled)
    with_lo = lookup.join(
        p_b,
        (F.col("__lo") >= F.col("__cumP") - F.col("__cp"))
        & (F.col("__lo") <= F.col("__cumP") - 1),
    ).select(
        "__g", "__v", "__pos", "__lo", "__hi", F.col("__pv").alias("__vlo")
    )
    mapping = with_lo.join(
        p_b,
        (F.col("__hi") >= F.col("__cumP") - F.col("__cp"))
        & (F.col("__hi") <= F.col("__cumP") - 1),
    ).select(
        F.col("__g").alias(f"__map_{group_col}"),
        F.col("__v").alias(f"__map_{value_col}"),
        (
            F.col("__vlo")
            + (F.col("__pos") - F.col("__lo"))
            * (F.col("__pv") - F.col("__vlo"))
        ).alias(out_col),
    )
    return df.join(
        F.broadcast(mapping),
        (F.col(group_col) == F.col(f"__map_{group_col}"))
        & (F.col(value_col).cast("double") == F.col(f"__map_{value_col}")),
        "left",
    ).drop(f"__map_{group_col}", f"__map_{value_col}")
