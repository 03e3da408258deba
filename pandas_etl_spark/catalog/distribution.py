"""Distribution / concentration / composition analytics (round 7).

The "how is the mass distributed" family a warehouse team runs before
sampling, pricing, or capacity decisions: Gini/Lorenz revenue
concentration, per-source token entropy, contingency-table association
(chi-square / Cramér's V), DAU/MAU stickiness, new-vs-returning user
mix, and per-segment effect sizes.

Scale notes (the shapes that survive 100 TB):
- Gini and the Lorenz deciles need a GLOBAL cumulative over the sorted
  per-customer revenue — the textbook single-partition-window trap.
  Both ride ``operators/prefix.global_running_sum`` (range-partitioned,
  |partitions|-row driver offsets), and Gini additionally uses the
  identity  Σ rank·x = (n+1)·Σx − Σ cum  so no rank column is ever
  materialized — two 1-row aggregates finish it.
- Entropy / chi-square / effect sizes reduce to exact-integer
  map-side-combinable count/moment aggregates first; all floating math
  happens on the reduced (grid-sized) frame and is rounded above
  cross-engine summation-order noise.
- Stickiness uses the bounded-fan-out trailing-window pattern of
  active_users_trailing_24h: collapse to distinct (day, user) FIRST,
  replicate the collapsed frame 28×, never the raw events.

All arithmetic that decides output values is exact integers (cents,
counts) until a final division, so every query here carries a full
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_etl_spark.catalog.registry import query
from pandas_etl_spark.catalog.text import _DD_TOKENS
from pandas_etl_spark.sources import load_table
from pandas_etl_spark.sources.io import ensure_parallelism


# ---------------------------------------------------------------------------
# Gini / Lorenz revenue concentration
# ---------------------------------------------------------------------------

_REV_CTE = """
    rev AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    )
"""


@query(
    "gini_revenue_concentration",
    oracle=f"""
    WITH {_REV_CTE},
    ranked AS (
        SELECT cents,
               sum(cents) OVER (ORDER BY cents, o_custkey) AS cum
        FROM rev
    ),
    agg AS (
        SELECT count(*) AS n, sum(cents) AS s,
               sum(CAST(cum AS DOUBLE)) AS t
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(s AS BIGINT) AS total_cents,
           round((2.0 * ((n + 1.0) * s - t)) / (n * 1.0 * s)
                 - (n + 1.0) / n, 6) AS gini
    FROM agg
    """,
)
def q_gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the standard inequality /
    concentration number (how top-heavy is the book of business).
    Exact-cents per-customer totals; the sorted cumulative runs through
    the range-partitioned global prefix sum, and Σ rank·x is recovered
    from Σ cum via  Σ rank·x = (n+1)·Σx − Σ cum  — so the only state
    after the prefix sum is two 1-row aggregates. No rank column, no
    single-partition window, at any n. Σ cum and (n+1)·Σx are ~n·s/2
    (~1.7e18 already at sf1) so both are computed in double — bigint
    would silently wrap in Spark by ~sf3 while DuckDB promotes to
    HUGEINT, a silent cross-engine divergence; gini is a ratio rounded
    to 6 places, so double accumulation is exact far beyond that."""
    from pandas_etl_spark.operators.prefix import global_running_sum

    o = ensure_parallelism(load_table(spark, sf_dir, "orders"))
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    cum = global_running_sum(
        rev, [F.col("cents").asc(), F.col("o_custkey").asc()], "cents", "cum"
    )
    agg = cum.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cum").cast("double")).alias("t"),
    )
    n, s, t = F.col("n"), F.col("s"), F.col("t")
    return agg.select(
        n.cast("bigint").alias("n_customers"),
        s.cast("bigint").alias("total_cents"),
        F.round(
            (2.0 * ((n + 1.0) * s - t)) / (n * 1.0 * s) - (n + 1.0) / n, 6
        ).alias("gini"),
    )


@query(
    "lorenz_deciles",
    oracle=f"""
    WITH {_REV_CTE},
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_custkey) AS r,
               count(*) OVER () AS n,
               sum(cents) OVER () AS s
        FROM rev
    )
    SELECT CAST(CAST(ceil(r * 10.0 / n) AS BIGINT) AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS rev_cents,
           round(sum(cents) * 1.0 / max(s), 6) AS rev_share
    FROM ranked
    GROUP BY 1
    """,
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve by revenue decile: customers ranked ascending by
    exact-cents revenue, bucketed by  ceil(rank·10/n)  (explicit
    formula, NOT ntile — engines disagree on ntile remainder
    placement), each decile reporting its customer count, revenue, and
    share. The global rank is a range-partitioned prefix COUNT
    (operators/prefix, value 1 per row); totals broadcast from 1-row
    aggregates. Deciles of ties follow the (cents, custkey) total
    order, so bucketing is engine-independent."""
    from pandas_etl_spark.operators.prefix import global_running_sum

    o = ensure_parallelism(load_table(spark, sf_dir, "orders"))
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    ranked = global_running_sum(
        rev.withColumn("__one", F.lit(1)),
        [F.col("cents").asc(), F.col("o_custkey").asc()],
        "__one",
        "r",
    )
    tot = rev.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.ceil(F.col("r") * 10.0 / F.col("n")).cast("bigint").alias(
                "decile"
            ),
            "cents",
            "s",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("rev_cents"),
            F.round(F.sum("cents") * 1.0 / F.max("s"), 6).alias("rev_share"),
        )
    )


# ---------------------------------------------------------------------------
# per-source token entropy
# ---------------------------------------------------------------------------

@query(
    "entropy_by_source",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_DD_TOKENS}) AS token FROM documents
    ),
    tc AS (SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2),
    tot AS (
        SELECT source, sum(n) AS nt, count(*) AS v FROM tc GROUP BY source
    )
    SELECT tc.source,
           CAST(max(tot.nt) AS BIGINT) AS n_tokens,
           CAST(max(tot.v) AS BIGINT) AS vocab,
           round(-sum((tc.n * 1.0 / tot.nt)
                      * log2(tc.n * 1.0 / tot.nt)), 6) AS entropy_bits,
           round(CASE WHEN max(tot.v) > 1
                      THEN -sum((tc.n * 1.0 / tot.nt)
                                * log2(tc.n * 1.0 / tot.nt))
                           / log2(max(tot.v))
                      ELSE 0.0 END, 6) AS norm_entropy
    FROM tc JOIN tot ON tc.source = tot.source
    GROUP BY tc.source
    """,
)
def q_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon token entropy per corpus source — the lexical-diversity
    gate (template-generated or boilerplate-heavy sources score low
    entropy; a useful pre-training mixture signal next to vocab_drift's
    JSD). One (source, token) count shuffle — exact integers — then a
    per-source reduce; entropy in bits plus the vocab-normalized form,
    rounded above summation-order noise."""
    from pandas_etl_spark.functions.text import tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tc = (
        d.select("source", F.explode(tokens("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tc.groupBy("source").agg(
        F.sum("n").alias("nt"), F.count(F.lit(1)).alias("v")
    )
    p = F.col("n") * 1.0 / F.col("nt")
    ent = -F.sum(p * F.log2(p))
    return (
        tc.join(tot, "source")
        .groupBy("source")
        .agg(
            F.max("nt").cast("bigint").alias("n_tokens"),
            F.max("v").cast("bigint").alias("vocab"),
            F.round(ent, 6).alias("entropy_bits"),
            F.round(
                F.when(F.max("v") > 1, ent / F.log2(F.max("v"))).otherwise(
                    0.0
                ),
                6,
            ).alias("norm_entropy"),
        )
    )


# ---------------------------------------------------------------------------
# chi-square association: event_type x day-of-week
# ---------------------------------------------------------------------------

@query(
    "chi_square_event_dow",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CAST(floor(extract(epoch FROM ts) / 86400.0) AS BIGINT) % 7
                   AS dow,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    rowt AS (SELECT event_type, sum(n) AS rn FROM cells GROUP BY 1),
    colt AS (SELECT dow, sum(n) AS cn FROM cells GROUP BY 1),
    tot AS (SELECT sum(n) AS t FROM cells),
    e AS (
        SELECT c.n, rowt.rn * 1.0 * colt.cn / tot.t AS exp
        FROM cells c
        JOIN rowt ON c.event_type = rowt.event_type
        JOIN colt ON c.dow = colt.dow
        CROSS JOIN tot
    ),
    dims AS (
        SELECT count(DISTINCT event_type) AS r, count(DISTINCT dow) AS c,
               sum(n) AS t
        FROM cells
    )
    SELECT round(sum((e.n - e.exp) * (e.n - e.exp) / e.exp), 6) AS chi2,
           CAST((max(dims.r) - 1) * (max(dims.c) - 1) AS BIGINT) AS dof,
           round(sqrt(sum((e.n - e.exp) * (e.n - e.exp) / e.exp)
                      / (max(dims.t)
                         * (least(max(dims.r), max(dims.c)) - 1))), 6)
               AS cramers_v,
           CAST(max(dims.t) AS BIGINT) AS n
    FROM e CROSS JOIN dims
    """,
)
def q_chi_square_event_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence + Cramér's V for event_type ×
    day-of-week (dow = epoch-day mod 7 — the one weekday definition
    both engines compute identically; it is a label, not a calendar
    claim). One grid-sized count aggregate over the data; expected
    counts, the statistic, and V all run on the |types|×7 grid from
    exact-integer marginals."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    # the grid feeds five consumers (marginals, total, dims, expected):
    # localCheckpoint the |types|x7 frame so the events scan runs once
    cells = (
        ev.select(
            "event_type",
            (
                F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).cast(
                    "bigint"
                )
                % 7
            ).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    rowt = cells.groupBy("event_type").agg(F.sum("n").alias("rn"))
    colt = cells.groupBy("dow").agg(F.sum("n").alias("cn"))
    tot = cells.agg(F.sum("n").alias("t"))
    e = (
        cells.join(F.broadcast(rowt), "event_type")
        .join(F.broadcast(colt), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "n", (F.col("rn") * 1.0 * F.col("cn") / F.col("t")).alias("exp")
        )
    )
    dims = cells.agg(
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("c"),
        F.sum("n").alias("t"),
    )
    chi2 = F.sum((F.col("n") - F.col("exp")) ** 2 / F.col("exp"))
    return e.crossJoin(F.broadcast(dims)).agg(
        F.round(chi2, 6).alias("chi2"),
        ((F.max("r") - 1) * (F.max("c") - 1)).cast("bigint").alias("dof"),
        F.round(
            F.sqrt(
                chi2 / (F.max("t") * (F.least(F.max("r"), F.max("c")) - 1))
            ),
            6,
        ).alias("cramers_v"),
        F.max("t").cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# DAU/MAU stickiness
# ---------------------------------------------------------------------------

@query(
    "stickiness_dau_mau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    mau AS (
        SELECT d.day, count(DISTINCT du.user_id) AS mau
        FROM days d JOIN du
          ON du.day BETWEEN d.day - INTERVAL 27 DAY AND d.day
        GROUP BY d.day
    )
    SELECT CAST(dau.day AS VARCHAR) AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(mau.mau AS BIGINT) AS mau,
           round(dau.dau * 1.0 / mau.mau, 6) AS stickiness
    FROM dau JOIN mau ON dau.day = mau.day
    """,
)
def q_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day (trailing 28-day MAU) — the product
    health ratio. Bounded-fan-out trailing window (the
    active_users_trailing_24h pattern): collapse to distinct
    (day, user) FIRST — the only data-sized shuffle — then replicate
    each collapsed row into the ≤28 target days it supports and
    distinct-count per day; raw events are never replicated."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    du = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fan = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 27))
        ).alias("tday"),
        "user_id",
    )
    mau = (
        fan.join(F.broadcast(days), fan.tday == days.day)
        .groupBy("tday")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(mau, dau.day == mau.tday)
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("mau").cast("bigint").alias("mau"),
            F.round(F.col("dau") * 1.0 / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
    )


# ---------------------------------------------------------------------------
# new vs returning users per day
# ---------------------------------------------------------------------------

@query(
    "new_vs_returning_daily",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    ),
    first AS (SELECT user_id, min(day) AS d0 FROM du GROUP BY user_id)
    SELECT CAST(du.day AS VARCHAR) AS day,
           CAST(sum(CASE WHEN du.day = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(sum(CASE WHEN du.day > f.d0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_returning,
           round(sum(CASE WHEN du.day > f.d0 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS returning_share
    FROM du JOIN first f ON du.user_id = f.user_id
    GROUP BY du.day
    """,
)
def q_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active-user mix: first-ever-seen (new) vs returning, plus
    the returning share — the acquisition-vs-retention split. Two
    user-keyed aggregates (distinct day collapse + first-seen min)
    joined back on user_id; both shuffles share the user_id key."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    du = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    first = du.groupBy("user_id").agg(F.min("day").alias("d0"))
    j = du.join(first, "user_id")
    return j.groupBy("day").agg(
        F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("day") > F.col("d0"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_returning"),
        F.round(
            F.sum(F.when(F.col("day") > F.col("d0"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("returning_share"),
    ).select(
        F.col("day").cast("string").alias("day"),
        "n_new",
        "n_returning",
        "returning_share",
    )


# ---------------------------------------------------------------------------
# Cohen's d effect size per segment
# ---------------------------------------------------------------------------

@query(
    "cohens_d_segments",
    oracle="""
    WITH m AS (
        SELECT event_type AS segment,
               sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN user_id % 2 = 0
                        THEN CAST(round(value * 100) AS BIGINT) END) AS s1,
               sum(CASE WHEN user_id % 2 = 0
                        THEN CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT) END) AS q1,
               sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n2,
               sum(CASE WHEN user_id % 2 = 1
                        THEN CAST(round(value * 100) AS BIGINT) END) AS s2,
               sum(CASE WHEN user_id % 2 = 1
                        THEN CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT) END) AS q2
        FROM events GROUP BY 1
    )
    SELECT segment,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round((s1 * 1.0 / n1 - s2 * 1.0 / n2)
                 / sqrt(((q1 - s1 * (s1 * 1.0 / n1)) * 1.0
                         + (q2 - s2 * (s2 * 1.0 / n2)))
                        / (n1 + n2 - 2)) / 100.0 * 100.0, 6) AS cohens_d
    FROM m WHERE n1 > 1 AND n2 > 1
    """,
)
def q_cohens_d_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size per event segment between the even/odd
    user_id split (the same deterministic A/B assignment as
    ab_test_zscores and bh_fdr_segments — d says HOW BIG the difference
    is where z/p say how sure). All moments are exact integer cents
    accumulated map-side; the pooled-SD formula runs on the |segments|
    grid. (Cents cancel in d — it is scale-free — so the /100*100 in
    the shared formula text is a no-op kept for textual identity.)"""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    c = F.round(F.col("value") * 100).cast("bigint")
    even = F.col("user_id") % 2 == 0
    m = ev.groupBy(F.col("event_type").alias("segment")).agg(
        F.sum(F.when(even, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(even, c)).alias("s1"),
        F.sum(F.when(even, c * c)).alias("q1"),
        F.sum(F.when(~even, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(~even, c)).alias("s2"),
        F.sum(F.when(~even, c * c)).alias("q2"),
    )
    n1, s1, q1 = F.col("n1"), F.col("s1"), F.col("q1")
    n2, s2, q2 = F.col("n2"), F.col("s2"), F.col("q2")
    d = (
        (s1 * 1.0 / n1 - s2 * 1.0 / n2)
        / F.sqrt(
            (
                (q1 - s1 * (s1 * 1.0 / n1)) * 1.0
                + (q2 - s2 * (s2 * 1.0 / n2))
            )
            / (n1 + n2 - 2)
        )
        / 100.0
        * 100.0
    )
    return m.filter((n1 > 1) & (n2 > 1)).select(
        "segment",
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        F.round(d, 6).alias("cohens_d"),
    )


@query(
    "cumulative_distinct_users",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    ),
    first AS (SELECT user_id, min(day) AS d0 FROM du GROUP BY user_id),
    newd AS (SELECT d0 AS day, count(*) AS n_new FROM first GROUP BY d0)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT)
               AS cum_distinct_users
    FROM newd
    """,
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the classic growth curve.
    Distinct-by-day is NOT windowable directly at scale (a running
    COUNT(DISTINCT) window re-scans every prefix); the scalable
    identity is  cum_distinct(d) = Σ_{d'≤d} first_seen(d')  — two
    user-keyed aggregates collapse the data to a |days|-row frame, and
    the only ordered cumsum runs over that bounded frame (whitelisted
    tiny-frame window, same class as cusum_revenue_shift)."""
    from pyspark.sql import Window as W

    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    du = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    first = du.groupBy("user_id").agg(F.min("day").alias("d0"))
    newd = first.groupBy(F.col("d0").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    return newd.select(
        F.col("day").cast("string").alias("day"),
        F.col("n_new").cast("bigint").alias("n_new"),
        F.sum("n_new")
        .over(
            W.partitionBy().orderBy("day").rowsBetween(
                W.unboundedPreceding, 0
            )
        )
        .cast("bigint")
        .alias("cum_distinct_users"),
    )


# numerator/denominator quantiles as exact integer ratios (disc method):
# the selected row is the smallest rn with den*rn >= num*n
_EQ_QUANTILES = [(1, 2), (9, 10), (99, 100)]


@query(
    "exact_quantiles_distributed",
    oracle=f"""
    WITH v AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    r AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, l_orderkey, l_linenumber)
                   AS rn,
               count(*) OVER () AS n
        FROM v
    ),
    qs (num, den) AS (
        VALUES {", ".join(f"({n}, {d})" for n, d in _EQ_QUANTILES)}
    )
    SELECT round(num * 1.0 / den, 2) AS q,
           CAST(max(n) AS BIGINT) AS n,
           round(min(cents) * 1.0 / 100.0, 2) AS value
    FROM r CROSS JOIN qs
    WHERE den * rn >= num * n
    GROUP BY num, den
    """,
)
def q_exact_quantiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global quantiles (p50/p90/p99, discrete method) without
    ever centralizing the values: Spark's ``percentile`` aggregate is
    exact but buffers the column per aggregation task — memory-bound at
    100 TB — while this is the range-partitioned global prefix COUNT
    plus an exact integer crossing test  den·rn ≥ num·n  per quantile
    (the unweighted sibling of weighted_percentiles). Adding a quantile
    adds a broadcast literal row, not a pass; the only driver state is
    one count per partition."""
    from pyspark.sql import Window as W  # noqa: F401  (parity w/ siblings)

    from pandas_etl_spark.operators.prefix import global_row_number

    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem")).select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    r = global_row_number(
        li,
        [
            F.col("cents").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
    )
    n = li.agg(F.count(F.lit(1)).alias("n"))
    qs = F.broadcast(
        spark.createDataFrame(_EQ_QUANTILES, "num int, den int")
    )
    return (
        r.crossJoin(F.broadcast(n))
        .crossJoin(qs)
        .filter(F.col("den") * F.col("rn") >= F.col("num") * F.col("n"))
        .groupBy("num", "den")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.round(F.min("cents") * 1.0 / 100.0, 2).alias("value"),
        )
        .select(
            F.round(F.col("num") * 1.0 / F.col("den"), 2).alias("q"),
            "n",
            "value",
        )
    )
