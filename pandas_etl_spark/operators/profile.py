"""Column profiling (``df.describe()`` / ``df.info()`` class — SURVEY
§2.5 extension): per-column row / null / distinct counts in one scan.

Shape: ONE aggregation computes every counter (count(*), per-column
null-sum, per-column count(distinct)); the single result row is then
exploded to the long (col, n_rows, n_nulls, n_distinct) form. Long output
keeps the schema stable as the profiled column list grows.

Scale note: N exact count(distinct) in one aggregate makes Catalyst
Expand each input row N ways before the shuffle — the standard exact
profiler trade. For wide tables or when ±2% is fine, pass
``approximate=True`` to use HLL sketches (approx_count_distinct), which
aggregates without the Expand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approximate: bool = False
) -> DataFrame:
    """(col, n_rows, n_nulls, n_distinct) per profiled column."""
    cols = cols if cols is not None else df.columns
    distinct = F.approx_count_distinct if approximate else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
        )
        aggs.append(distinct(c).alias(f"__dist_{c}"))
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"__dist_{c}").cast("bigint").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(entries).alias("p")).select(
        "p.col", "p.n_rows", "p.n_nulls", "p.n_distinct"
    )


def fk_containment(
    pairs: list[tuple["DataFrame", str, str, "DataFrame", str, str]],
) -> "DataFrame":
    """Inclusion-dependency (foreign-key) discovery over declared
    candidate pairs — the schema-profiling step data catalogs run to
    propose join keys: for each (child df, child name, child col,
    parent df, parent name, parent col) report how much of the child's
    key space the parent covers and whether the parent side is unique.

    containment = |distinct(child) ∩ distinct(parent)| /
    |distinct(child)| — 1.0 plus parent uniqueness ⇒ a valid FK→PK
    edge; values near 0 rule the pair out.

    Scale shape: per pair, ONE distinct-aggregate per side (shuffle on
    the key), then a key-keyed join of the two distinct sets — wire
    traffic is distinct keys only, never table rows; the per-pair
    4-number summaries union into one tiny frame."""
    from pyspark.sql import functions as F

    outs = []
    for child, child_name, child_col, parent, parent_name, parent_col in pairs:
        c = child.select(F.col(child_col).alias("__k")).filter(
            F.col("__k").isNotNull()
        ).distinct()
        p = parent.select(F.col(parent_col).alias("__k")).filter(
            F.col("__k").isNotNull()
        )
        p_stats = p.agg(
            F.count(F.lit(1)).alias("__n"),
            F.countDistinct("__k").alias("__nd"),
        )
        pd_ = p.distinct()
        joined = c.join(pd_.withColumn("__hit", F.lit(1)), "__k", "left")
        agg = joined.agg(
            F.count(F.lit(1)).alias("n_child_distinct"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_contained"),
        )
        row = (
            agg.crossJoin(F.broadcast(p_stats))
            .select(
                F.lit(child_name).alias("child_table"),
                F.lit(child_col).alias("child_col"),
                F.lit(parent_name).alias("parent_table"),
                F.lit(parent_col).alias("parent_col"),
                F.col("n_child_distinct").cast("bigint"),
                F.col("n_contained").cast("bigint"),
                F.round(
                    F.col("n_contained").cast("double")
                    / F.greatest(F.col("n_child_distinct"), F.lit(1)).cast(
                        "double"
                    ),
                    6,
                ).alias("containment"),
                (F.col("__n") == F.col("__nd")).alias("parent_unique"),
            )
        )
        outs.append(row)
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def categorical_association(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise association between categorical columns — the
    categorical analogue of a correlation matrix: for every unordered
    column pair, mutual information in nats
    (sum p(x,y)*ln(p(x,y)/(p(x)p(y)))) and Cramer's V
    (sqrt(chi2/N / min(r-1, c-1))), the two standard dependence scores
    for feature selection / redundancy audits. Returns
    (col_a, col_b, n_cats_a, n_cats_b, mi_nats, cramers_v).

    Scale shape: one map-side-combinable joint-count aggregate over
    the data PER PAIR (C(k,2) passes — k is a handful of profiled
    columns, never data-sized); all MI/chi2 math then runs on the
    joint table, whose cardinality is |X|*|Y| categories. Marginals
    re-aggregate the joint counts, not the data. Nulls count as their
    own category (coalesced to a sentinel) so the scores see
    missingness, matching pd.crosstab(dropna=False) profiling.
    Deterministic; callers round for cross-engine comparison (catalog
    rounds to 6, and MI is floored at 0 against tiny negative float
    residue on independent columns)."""
    if len(cols) < 2:
        raise ValueError("categorical_association: need >= 2 columns")
    out = None
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            a, b = cols[i], cols[j]
            joint = (
                df.select(
                    F.coalesce(F.col(a).cast("string"), F.lit(" null"))
                    .alias("x"),
                    F.coalesce(F.col(b).cast("string"), F.lit(" null"))
                    .alias("y"),
                )
                .groupBy("x", "y")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            mx = joint.groupBy("x").agg(F.sum("c").alias("cx"))
            my = joint.groupBy("y").agg(F.sum("c").alias("cy"))
            tot = joint.agg(
                F.sum("c").alias("n"),
                F.count_distinct("x").alias("ra"),
                F.count_distinct("y").alias("rb"),
            )
            pair = (
                joint.join(mx, "x")
                .join(my, "y")
                .crossJoin(F.broadcast(tot))
                .agg(
                    F.first(F.lit(a)).alias("col_a"),
                    F.first(F.lit(b)).alias("col_b"),
                    F.first("ra").cast("bigint").alias("n_cats_a"),
                    F.first("rb").cast("bigint").alias("n_cats_b"),
                    F.sum(
                        (F.col("c") / F.col("n"))
                        * F.log(
                            F.col("c") * F.col("n")
                            / (F.col("cx") * F.col("cy"))
                        )
                    ).alias("_mi"),
                    # chi2 sums over ALL cells of the contingency
                    # table, but the joint frame only holds observed
                    # (c > 0) cells; an absent cell contributes
                    # (0-E)^2/E = E, and the absent Es sum to
                    # N - sum(observed E) because all Es total N.
                    F.sum(
                        F.pow(
                            F.col("c")
                            - F.col("cx") * F.col("cy") / F.col("n"),
                            2,
                        )
                        / (F.col("cx") * F.col("cy") / F.col("n"))
                    ).alias("_chi2_obs"),
                    F.sum(
                        F.col("cx") * F.col("cy") / F.col("n")
                    ).alias("_esum"),
                    F.first("n").alias("_n"),
                    F.least(
                        F.first("ra") - 1, F.first("rb") - 1
                    ).alias("_dof"),
                )
                .select(
                    "col_a",
                    "col_b",
                    "n_cats_a",
                    "n_cats_b",
                    F.round(F.greatest("_mi", F.lit(0.0)), 6).alias(
                        "mi_nats"
                    ),
                    F.round(
                        F.when(
                            F.col("_dof") > 0,
                            F.sqrt(
                                (
                                    F.col("_chi2_obs")
                                    + F.col("_n")
                                    - F.col("_esum")
                                )
                                / F.col("_n")
                                / F.col("_dof")
                            ),
                        ).otherwise(F.lit(0.0)),
                        6,
                    ).alias("cramers_v"),
                )
            )
            out = pair if out is None else out.unionAll(pair)
    return out


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Key-distribution skew report — the diagnostic that decides
    between a plain AQE join and explicit salting (SCALE.md crossover
    study): distinct-key count, hottest-key share, top-10 share, and
    the EXACT Gini coefficient of the per-key row counts, computed
    distributed (no single-partition window) via the three-step global
    prefix-sum of :mod:`operators.prefix`.

    Gini = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over counts sorted ascending —
    tie-order-invariant (equal x values contribute the same Σ i·xᵢ
    under any tie permutation), so any total order (x, key) gives the
    same value on any engine. Wide work: one count aggregate on the
    key + one slim (x, key) range shuffle over |keys| rows; top-10 is
    a distributed TakeOrdered."""
    from pandas_etl_spark.operators.prefix import global_running_sum

    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("x")
    )
    idx = global_running_sum(
        counts.withColumn("__one", F.lit(1)),
        [F.col("x"), F.col("k")],
        "__one",
        "i",
    )
    stats = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("tot"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
        F.max("x").alias("mx"),
    )
    top10 = (
        counts.orderBy(F.desc("x"), F.asc("k"))
        .limit(10)
        .agg(F.sum("x").alias("top10"))
    )
    return stats.crossJoin(F.broadcast(top10)).select(
        F.col("n").cast("bigint").alias("n_keys"),
        F.col("tot").cast("bigint").alias("n_rows"),
        F.round(F.col("mx").cast("double") / F.col("tot"), 6).alias("max_share"),
        F.round(F.col("top10").cast("double") / F.col("tot"), 6).alias(
            "top10_share"
        ),
        F.round(
            F.lit(2.0) * F.col("six") / (F.col("n") * F.col("tot"))
            - (F.col("n") + F.lit(1)).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )


def benford_deviation(df: DataFrame, cols: list[str]) -> DataFrame:
    """Benford's-law conformity audit — the classic fraud / data-entry
    anomaly screen for naturally-occurring positive amounts: per
    column, the observed first-significant-digit distribution against
    the Benford expectation log10(1 + 1/d), with the column-level
    chi-square statistic and Nigrini's mean-absolute-deviation (MAD)
    conformity score attached to every digit row. Returns 9 rows per
    column: (col_name, digit, n, obs_share, benford_share, chi2, mad).

    First-digit extraction is string-based — the first [1-9] in the
    value's string rendering — which is format-agnostic (plain or
    scientific notation both lead with the most significant digit), so
    it is stable across engines regardless of how each renders
    doubles. Nulls, zeros, and digit-free renderings are excluded.

    Scale shape: ONE map-side-combinable 9-bucket count aggregate over
    the data per column; the digit domain (a 9-row range, left-joined
    so absent digits score 0 observed and still pay their expected
    chi-square mass) and the chi2/MAD fold all run on 9-row frames.
    Deterministic; callers round shares/scores for cross-engine
    comparison."""
    if not cols:
        raise ValueError("benford_deviation: need >= 1 column")
    spark = df.sparkSession
    dom = spark.range(1, 10).select(
        F.col("id").cast("int").alias("digit"),
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("id")).alias("e"),
    )
    out = None
    for c in cols:
        digits = df.select(
            F.regexp_extract(F.col(c).cast("string"), "[1-9]", 0)
            .cast("int")
            .alias("digit")
        ).filter(F.col("digit").isNotNull())
        cnt = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
        full = dom.join(cnt, "digit", "left").select(
            "digit", "e", F.coalesce("n", F.lit(0)).alias("n")
        )
        tot = full.agg(F.sum("n").alias("nt"))
        scored = full.crossJoin(F.broadcast(tot)).select(
            "digit",
            "n",
            "e",
            "nt",
            (F.col("n").cast("double") / F.col("nt")).alias("p"),
        )
        colstats = scored.agg(
            (
                F.max("nt")
                * F.sum(
                    (F.col("p") - F.col("e"))
                    * (F.col("p") - F.col("e"))
                    / F.col("e")
                )
            ).alias("chi2"),
            (F.sum(F.abs(F.col("p") - F.col("e"))) / F.lit(9.0)).alias(
                "mad"
            ),
        )
        row = scored.crossJoin(F.broadcast(colstats)).select(
            F.lit(c).alias("col_name"),
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round("p", 6).alias("obs_share"),
            F.round("e", 6).alias("benford_share"),
            F.round("chi2", 6).alias("chi2"),
            F.round("mad", 6).alias("mad"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def spearman_correlation(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Spearman rank correlation — the monotonic-dependence
    profiler beside Pearson ``corr_matrix`` (robust to outliers and
    nonlinearity; ties get average ranks, the standard tie-corrected
    estimator). Returns (col_a, col_b, n, spearman_rho) per unordered
    pair, pairwise-complete (rows null in either column drop for that
    pair, and ranks are recomputed on the surviving subset).

    Scale shape — ranks WITHOUT a global sort and WITHOUT joining
    ranks back onto the data: per pair, ONE map-side-combinable joint
    (value_a, value_b) count aggregate is the only data-sized shuffle;
    marginal counts re-aggregate the joint table, each column's
    average ranks come from the three-step distributed prefix-sum of
    :mod:`operators.prefix` over its |distinct| marginal rows, and the
    correlation folds over the joint table weighted by cell count.
    Ranks are centered by the exact mean (n+1)/2 before the product
    fold, so the rho numerator never suffers the n³-scale catastrophic
    cancellation of the raw-sum formula. Constant columns (zero rank
    variance) return NULL rho.

    Fast path: pairwise-complete re-ranking only matters when nulls
    exist, so columns proven null-free by one cheap aggregate get
    their rank map built ONCE from global per-column counts and shared
    across every pair — k prefix-sums instead of 2·C(k,2) when the
    profiled columns are clean (the common case; 15.1→fewer jobs in
    the sf0.1 bench)."""
    from pandas_etl_spark.operators.prefix import global_running_sum

    if len(cols) < 2:
        raise ValueError("spearman_correlation: need >= 2 columns")

    def _ranks(counted: DataFrame, key: str, out: str) -> DataFrame:
        run = global_running_sum(counted, [F.col(key)], "__mc", "__cum")
        return run.select(
            key,
            (
                F.col("__cum").cast("double")
                - F.col("__mc")
                + (F.col("__mc") + F.lit(1.0)) / 2
            ).alias(out),
        )

    nulls = df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
            for c in cols
        ]
    ).first()
    clean = {c for c in cols if (nulls[c] or 0) == 0}
    shared_ra: dict[str, DataFrame] = {}
    shared_rb: dict[str, DataFrame] = {}
    for c in clean:
        counts = df.groupBy(F.col(c).alias("__v")).agg(
            F.count(F.lit(1)).alias("__mc")
        )
        ranked = _ranks(counts, "__v", "__r").localCheckpoint()
        shared_ra[c] = ranked.select(
            F.col("__v").alias("va"), F.col("__r").alias("ra")
        )
        shared_rb[c] = ranked.select(
            F.col("__v").alias("vb"), F.col("__r").alias("rb")
        )

    out = None
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            a, b = cols[i], cols[j]
            joint = (
                df.select(F.col(a).alias("va"), F.col(b).alias("vb"))
                .filter(F.col("va").isNotNull() & F.col("vb").isNotNull())
                .groupBy("va", "vb")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            tot = joint.agg(F.sum("c").alias("n"))
            if a in clean and b in clean:
                ra, rb = shared_ra[a], shared_rb[b]
            else:
                ra = _ranks(
                    joint.groupBy("va").agg(F.sum("c").alias("__mc")),
                    "va",
                    "ra",
                )
                rb = _ranks(
                    joint.groupBy("vb").agg(F.sum("c").alias("__mc")),
                    "vb",
                    "rb",
                )
            cen = (F.col("n") + F.lit(1.0)) / 2
            folded = (
                joint.join(ra, "va")
                .join(rb, "vb")
                .crossJoin(F.broadcast(tot))
                .select(
                    "c",
                    "n",
                    (F.col("ra") - cen).alias("da"),
                    (F.col("rb") - cen).alias("db"),
                )
                .agg(
                    F.first(F.lit(a)).alias("col_a"),
                    F.first(F.lit(b)).alias("col_b"),
                    F.first("n").cast("bigint").alias("n"),
                    F.sum(F.col("c") * F.col("da") * F.col("db")).alias(
                        "_sab"
                    ),
                    F.sum(F.col("c") * F.col("da") * F.col("da")).alias(
                        "_saa"
                    ),
                    F.sum(F.col("c") * F.col("db") * F.col("db")).alias(
                        "_sbb"
                    ),
                )
                .select(
                    "col_a",
                    "col_b",
                    "n",
                    F.when(
                        (F.col("_saa") > 0) & (F.col("_sbb") > 0),
                        F.round(
                            F.col("_sab")
                            / F.sqrt(F.col("_saa") * F.col("_sbb")),
                            6,
                        ),
                    ).alias("spearman_rho"),
                )
            )
            out = folded if out is None else out.unionAll(folded)
    return out
