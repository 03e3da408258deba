"""Sequence / contribution / time-series pattern queries: gaps-and-
islands streaks, Pareto-ABC contribution classes, autocorrelation,
time-bounded sequential funnels, session path mining, multi-feature OLS.

These are the classic warehouse "pattern" analyses pandas users run
with groupby+shift/cumsum driver-side loops; here each is a fixed
number of Catalyst shuffles, independent of row count:

- streaks / session paths: ONE hash shuffle on the entity key — every
  window in the chain shares the same partitioning, so Catalyst plans a
  single Exchange + sort feeding stacked Window nodes;
- Pareto-ABC: per-key aggregate, then the repo's distributed prefix sum
  (operators/prefix.py) over the key-level frame — no single-partition
  global window even when the key domain itself is huge;
- ACF / OLS: heavy lifting is one map-side-combinable aggregate; the
  tiny aggregated frame (days, moment sums) is then self-joined /
  algebraically solved — the right 100 TB shape is "reduce first".

Cross-engine notes: interval arithmetic is exact TIMESTAMP math in both
engines; Pearson correlation is normalization-invariant so Spark's
corr ≡ DuckDB's corr; the OLS solves the centered (covariance-form)
normal equations — far better conditioned than raw-moment Cramer — with
ONE shared SQL formula text used by both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_etl_spark.catalog.registry import query
from pandas_etl_spark.sources import load_table
from pandas_etl_spark.sources.io import ensure_parallelism


# ---------------------------------------------------------------------------
# gaps-and-islands: per-user consecutive-active-day streaks
# ---------------------------------------------------------------------------

@query(
    "activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ),
    isl AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS anchor
        FROM days
    ),
    runs AS (
        SELECT user_id, anchor, count(*) AS len
        FROM isl GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY user_id
    """,
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user (gaps-and-
    islands): distinct active days, then the classic ``day - row_number``
    anchor — consecutive days share an anchor — and two aggregates.
    Exactly two data shuffles, both with map-side partials: the (user,
    day) distinct (raw events never cross the wire un-deduplicated),
    then one user_id Exchange of the tiny day-level frame for the
    window — after which BOTH groupBys ((user, anchor) and (user)) ride
    the existing hash(user_id) partitioning with zero further Exchanges
    (hash on a subset of the grouping keys satisfies the clustering
    requirement; plan-asserted). No self-joins, no driver loops."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    days = ev.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = isl.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return runs.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest_streak"),
    )


# ---------------------------------------------------------------------------
# Pareto / ABC contribution classification
# ---------------------------------------------------------------------------

@query(
    "pareto_abc_parts",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS rev_c
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(rev_c) AS t FROM rev),
    ranked AS (
        SELECT l_partkey, rev_c,
               sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey) AS cum_c
        FROM rev
    ),
    cls AS (
        SELECT CASE WHEN cum_c * 10 <= tot.t * 7 THEN 'A'
                    WHEN cum_c * 10 <= tot.t * 9 THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev_c
        FROM ranked, tot
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(rev_c) * 1.0 / (SELECT t FROM tot), 6) AS revenue_share
    FROM cls GROUP BY abc_class
    """,
)
def q_pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification of parts by revenue contribution: parts
    whose cumulative revenue share (largest-first) is <=70% are class A,
    <=90% B, the tail C. The raw scan reduces to one row per part
    (map-side combinable); the cumulative share then runs through the
    distributed prefix sum over the PART-level frame — ``(revenue DESC,
    partkey)`` is a total order — so there is no single-partition global
    window even with 10^8 parts. Total revenue broadcasts as one row.

    Boundary determinism (ADVICE r5): revenue is summed as exact CENTS
    (bigint), so the prefix sum is order-independent integer addition,
    and the 70/90 boundaries compare as pure integers
    (``cum*10 <= tot*7``) — no float rounding can flip a class between
    engines regardless of addition order."""
    from pandas_etl_spark.operators.prefix import global_running_sum

    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        ).alias("rev_c")
    )
    tot = rev.agg(F.sum("rev_c").alias("t"))
    ranked = global_running_sum(
        rev,
        [F.col("rev_c").desc(), F.col("l_partkey").asc()],
        "rev_c",
        "cum_c",
    ).join(F.broadcast(tot))
    cls = ranked.withColumn(
        "abc_class",
        F.when(F.col("cum_c") * 10 <= F.col("t") * 7, F.lit("A"))
        .when(F.col("cum_c") * 10 <= F.col("t") * 9, F.lit("B"))
        .otherwise(F.lit("C")),
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(F.sum("rev_c") / F.first("t"), 6).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# autocorrelation function of the daily revenue series
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7


@query(
    "acf_daily_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
               sum(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    lags AS (SELECT CAST(range AS INTEGER) AS lag
             FROM range(1, {_ACF_MAX_LAG + 1})),
    paired AS (
        SELECT lags.lag, a.rev AS x, b.rev AS y
        FROM daily a
        JOIN lags ON TRUE
        JOIN daily b ON b.d = a.d + lags.lag * INTERVAL 1 DAY
    )
    SELECT lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(x, y), 6) AS acf
    FROM paired GROUP BY lag
    """,
)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily order revenue at lags 1..7 (the
    seasonality fingerprint feeding forecast models). The 100 TB cost is
    the FIRST aggregate (orders -> one row per day, map-side
    combinable); the lag pairing is a self-join of the tiny day-level
    series against its broadcast copy on an exact day offset — missing
    days simply produce no pair (both engines identically). Pearson r is
    scale-invariant, so Spark corr ≡ DuckDB corr."""
    o = ensure_parallelism(load_table(spark, sf_dir, "orders"))
    daily = o.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("d")
    ).agg(F.sum("o_totalprice").alias("rev"))
    lags = F.array([F.lit(i) for i in range(1, _ACF_MAX_LAG + 1)])
    a = daily.withColumn("lag", F.explode(lags)).withColumn(
        "match_d", F.date_add(F.col("d"), F.col("lag"))
    )
    b = daily.select(F.col("d").alias("match_d"), F.col("rev").alias("y"))
    paired = a.join(F.broadcast(b), "match_d")
    return paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.corr("rev", "y"), 6).alias("acf"),
    )


# ---------------------------------------------------------------------------
# time-bounded sequential funnel
# ---------------------------------------------------------------------------

@query(
    "funnel_time_bound",
    oracle="""
    WITH v AS (
        SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click'
          AND e.ts >= v.t_view AND e.ts <= v.t_view + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts >= c.t_click AND e.ts <= c.t_click + INTERVAL 72 HOUR
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(t_view) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_24h,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_72h
    """,
)
def q_funnel_time_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly sequential funnel with conversion windows: first view,
    then first click within 24h OF THAT VIEW, then first purchase
    within 72h of that click. Unlike ``funnel_counts`` (order-only),
    each stage anchors on the previous stage's timestamp, so the stages
    are data-dependent. Spark plan: three stacked per-user window mins
    — all three partition on user_id, so Catalyst sorts once behind ONE
    Exchange (no event-table self-joins; the oracle's joins are the SQL
    spelling of the same anchoring)."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = ev.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") >= F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 24 HOURS")),
            F.col("ts"),
        )
    ).over(w)
    s2 = s1.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 72 HOURS")),
            F.col("ts"),
        )
    ).over(w)
    s3 = s2.withColumn("t_purchase", t_purchase)
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").cast("bigint").alias("n_view"),
        F.count("t_click").cast("bigint").alias("n_click_24h"),
        F.count("t_purchase").cast("bigint").alias("n_purchase_72h"),
    )


# ---------------------------------------------------------------------------
# session path mining: top event trigrams within 30-min-gap sessions
# ---------------------------------------------------------------------------

@query(
    "session_paths_topk",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                         OR lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS sess_id
        FROM seq
    ),
    tri AS (
        SELECT event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3,
               sess_id,
               lead(sess_id, 2) OVER w AS sess3
        FROM sess
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM tri
    WHERE e3 IS NOT NULL AND sess3 = sess_id
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def q_session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-event paths that occur INSIDE one session
    (30-minute inactivity gap): gap-flag -> running session id -> two
    leads, all over the SAME (user_id | ts, event_id) window, so the
    whole chain is one Exchange + one sort; trigrams crossing a session
    boundary are rejected by comparing the session id two events ahead
    (cheaper than re-partitioning by (user, session)). Final top-10 is
    a TakeOrderedAndProject over the small path-count frame with a path
    tie-break for determinism."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = (
        prev_ts.isNull()
        | (F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTES"))
    ).cast("int")
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    tri = sess.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.col("sess_id"),
        F.lead("sess_id", 2).over(w).alias("sess3"),
    )
    paths = (
        tri.filter(F.col("e3").isNotNull() & (F.col("sess3") == F.col("sess_id")))
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return paths.orderBy(F.col("n").desc(), F.col("path").asc()).limit(10)


# ---------------------------------------------------------------------------
# multi-feature OLS via centered normal equations
# ---------------------------------------------------------------------------

# ONE formula text, two engines: 2x2 Cramer solve of the centered
# (covariance-form) normal equations — far better conditioned than
# raw-moment Cramer (no n*S11*S22-scale cancellation).
_OLS_SOLVE_SQL = """
    SELECT n,
           round((c1y * v22 - c12 * c2y) / (v11 * v22 - c12 * c12), 4) AS beta_qty,
           round((v11 * c2y - c12 * c1y) / (v11 * v22 - c12 * c12), 4) AS beta_discount,
           round(my - (c1y * v22 - c12 * c2y) / (v11 * v22 - c12 * c12) * m1
                    - (v11 * c2y - c12 * c1y) / (v11 * v22 - c12 * c12) * m2,
                 4) AS intercept,
           round(((c1y * v22 - c12 * c2y) / (v11 * v22 - c12 * c12) * c1y
                  + (v11 * c2y - c12 * c1y) / (v11 * v22 - c12 * c12) * c2y)
                 / vyy, 6) AS r2
    FROM moments
"""


@query(
    "ols_price_model",
    oracle=f"""
    WITH moments AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               var_pop(l_quantity) AS v11,
               var_pop(l_discount) AS v22,
               covar_pop(l_quantity, l_discount) AS c12,
               covar_pop(l_quantity, l_extendedprice) AS c1y,
               covar_pop(l_discount, l_extendedprice) AS c2y,
               var_pop(l_extendedprice) AS vyy,
               avg(l_quantity) AS m1,
               avg(l_discount) AS m2,
               avg(l_extendedprice) AS my
        FROM lineitem
    )
    {_OLS_SOLVE_SQL}
    """,
)
def q_ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature linear regression l_extendedprice ~ quantity +
    discount, fit in closed form: ONE map-side-combinable moment
    aggregate (count/avg/var_pop/covar_pop — all Catalyst partial
    aggregates), then the centered normal equations solved by 2x2
    Cramer on the single moment row. The solve is a shared SQL text
    (`_OLS_SOLVE_SQL`) evaluated verbatim by both engines, so the only
    cross-engine drift is the moment aggregates' summation order —
    normalized away by the in-query rounding. No iteration, no
    gradient loop, no driver-side linear algebra."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    moments = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.var_pop("l_quantity").alias("v11"),
        F.var_pop("l_discount").alias("v22"),
        F.covar_pop("l_quantity", "l_discount").alias("c12"),
        F.covar_pop("l_quantity", "l_extendedprice").alias("c1y"),
        F.covar_pop("l_discount", "l_extendedprice").alias("c2y"),
        F.var_pop("l_extendedprice").alias("vyy"),
        F.avg("l_quantity").alias("m1"),
        F.avg("l_discount").alias("m2"),
        F.avg("l_extendedprice").alias("my"),
    )
    moments.createOrReplaceTempView("moments")
    return spark.sql(_OLS_SOLVE_SQL)


# ---------------------------------------------------------------------------
# conversion latency distribution (time-to-event percentiles)
# ---------------------------------------------------------------------------

@query(
    "conversion_latency_quantiles",
    oracle="""
    WITH v AS (
        SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id,
               min(e.ts) AS t_purchase
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= v.t_view
        GROUP BY e.user_id
    ),
    lat AS (
        SELECT p.user_id,
               date_diff('second', v.t_view, p.t_purchase) / 3600.0 AS hours
        FROM p JOIN v ON v.user_id = p.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(hours, 0.5), 4) AS p50_hours,
           round(quantile_cont(hours, 0.9), 4) AS p90_hours,
           round(quantile_cont(hours, 0.99), 4) AS p99_hours
    FROM lat
    """,
)
def q_conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, hours from first view to
    first subsequent purchase, summarized as exact interpolated
    p50/p90/p99. Same one-Exchange stacked-window shape as the funnel
    (both per-user mins partition on user_id); latency is integer
    epoch-second arithmetic in both engines, so the only float op is
    the final /3600 and the quantile interpolation."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = ev.withColumn("t_view", t_view)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t_view")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        s1.withColumn("t_purchase", t_purchase)
        .groupBy("user_id")
        .agg(F.max("t_view").alias("t_view"), F.max("t_purchase").alias("t_purchase"))
        .filter(F.col("t_purchase").isNotNull())
        .withColumn(
            "hours",
            (
                F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view")
            ).cast("double")
            / 3600.0,
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.percentile("hours", 0.5), 4).alias("p50_hours"),
        F.round(F.percentile("hours", 0.9), 4).alias("p90_hours"),
        F.round(F.percentile("hours", 0.99), 4).alias("p99_hours"),
    )


# ---------------------------------------------------------------------------
# capped running balance (sequential fold with a floor)
# ---------------------------------------------------------------------------

@query(
    "capped_running_balance",
    oracle="""
    WITH RECURSIVE d AS (
        SELECT user_id, event_id,
               CASE WHEN event_type IN ('purchase', 'signup')
                    THEN value ELSE -value END AS delta,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    r AS (
        SELECT user_id, event_id, rn, delta,
               greatest(0.0, delta) AS bal
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.user_id, d.event_id, d.rn, d.delta,
               greatest(0.0, r.bal + d.delta)
        FROM d JOIN r ON d.user_id = r.user_id AND d.rn = r.rn + 1
    )
    SELECT user_id, event_id, round(delta, 6) AS delta,
           round(bal, 6) AS bal
    FROM r
    """,
)
def q_capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit-style running balance that cannot go below zero:
    purchases/signups deposit ``value``, every other event withdraws
    it, and each step clamps at 0 BEFORE feeding the next — a stateful
    fold no window function expresses (the clamp breaks prefix-sum
    associativity; pandas users loop per group). Runs as
    ``applyInPandas`` per user (operators/fold.capped_running_fold):
    each key folds sequentially, keys parallelize across the cluster.
    Identical accumulation order both engines (ts, event_id total order
    per user), so the doubles match bit-for-bit; the oracle replays the
    fold with a recursive CTE stepping row_number + 1."""
    from pandas_etl_spark.operators.fold import capped_running_fold

    ev = ensure_parallelism(load_table(spark, sf_dir, "events")).select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.col("event_type").isin("purchase", "signup"), F.col("value")
        )
        .otherwise(-F.col("value"))
        .alias("delta"),
    )
    out = capped_running_fold(
        ev, "user_id", ["ts", "event_id"], "delta", floor=0.0
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("delta", 6).alias("delta"),
        F.round("bal", 6).alias("bal"),
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution
# ---------------------------------------------------------------------------

# The absorption solve (I - Q)^-1 b IS SQL-expressible once recast as
# the geometric series sum_k Q^k b, accelerated by repeated doubling:
#   N_{p+1} = N_p + M_p N_p,  M_{p+1} = M_p^2   (M_0 = Q, N_0 = b)
# After P doublings N_P = sum_{k < 2^P} Q^k b; with P = 25 the truncation
# error is rho^(2^25) — zero in doubles for any substochastic Q — so the
# unrolled series equals the exact solve to far below the 6-decimal
# rounding. Each doubling is one |scenarios| x |states|^2 matrix join
# (single-digit sizes), MATERIALIZED so an inlining engine doesn't
# re-evaluate the chain exponentially.
_MKV_P = 25


def _mkv_doubling_sql(p: int) -> str:
    return f""",
    m{p + 1} AS MATERIALIZED (
        SELECT a.s, a.src, b.dst, sum(a.v * b.v) AS v
        FROM m{p} a JOIN m{p} b ON a.s = b.s AND a.dst = b.src
        GROUP BY 1, 2, 3
    ),
    n{p + 1} AS MATERIALIZED (
        SELECT n.s, n.state, n.v + coalesce(mv.addv, 0) AS v
        FROM n{p} n LEFT JOIN (
            SELECT a.s, a.src AS state, sum(a.v * q.v) AS addv
            FROM m{p} a JOIN n{p} q ON a.s = q.s AND a.dst = q.state
            GROUP BY 1, 2
        ) mv ON n.s = mv.s AND n.state = mv.state
    )"""


_MKV_ORACLE = (
    """
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               coalesce(sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS pc
        FROM events
    ),
    lab AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN '__conv__'
                    ELSE event_type END AS state
        FROM seq WHERE pc = 0
    ),
    hops AS (
        SELECT coalesce(lag(state) OVER w, '__start__') AS src,
               state AS dst,
               lead(state) OVER w AS nxt
        FROM lab WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    edges AS (
        SELECT src, dst FROM hops
        UNION ALL
        SELECT dst, '__null__' FROM hops
        WHERE nxt IS NULL AND dst <> '__conv__'
    ),
    cnt AS MATERIALIZED (
        SELECT src, dst, count(*) AS n FROM edges GROUP BY 1, 2
    ),
    chan AS MATERIALIZED (
        SELECT DISTINCT c FROM (
            SELECT src AS c FROM cnt WHERE src <> '__start__'
            UNION
            SELECT dst FROM cnt WHERE dst NOT IN ('__conv__', '__null__')
        )
    ),
    tot AS (SELECT src, sum(n) AS t FROM cnt GROUP BY src),
    scen AS MATERIALIZED (
        SELECT 'FULL' AS s, NULL AS dropc
        UNION ALL SELECT c, c FROM chan
    ),
    qbase AS (
        SELECT c.src, c.dst, c.n * 1.0 / t.t AS v
        FROM cnt c JOIN tot t ON c.src = t.src
        WHERE c.dst IN (SELECT c FROM chan)
    ),
    m0 AS MATERIALIZED (
        SELECT s.s, q.src, q.dst,
               CASE WHEN q.src = s.dropc OR q.dst = s.dropc
                    THEN 0.0 ELSE q.v END AS v
        FROM scen s CROSS JOIN qbase q
    ),
    states AS (SELECT '__start__' AS state UNION ALL SELECT c FROM chan),
    n0 AS MATERIALIZED (
        SELECT s.s, st.state,
               CASE WHEN st.state = s.dropc THEN 0.0
                    ELSE coalesce(x.v, 0.0) END AS v
        FROM scen s CROSS JOIN states st
        LEFT JOIN (
            SELECT c.src AS state, c.n * 1.0 / t.t AS v
            FROM cnt c JOIN tot t ON c.src = t.src
            WHERE c.dst = '__conv__'
        ) x ON st.state = x.state
    )"""
    + "".join(_mkv_doubling_sql(p) for p in range(_MKV_P))
    + f""",
    p AS (SELECT s, v FROM n{_MKV_P} WHERE state = '__start__'),
    pf AS (SELECT v AS pf FROM p WHERE s = 'FULL'),
    re AS (
        SELECT c.c AS channel,
               CASE WHEN pf.pf <= 0 THEN 0.0
                    ELSE greatest(0.0, 1.0 - pd.v / pf.pf) END AS re_raw
        FROM chan c JOIN p pd ON pd.s = c.c CROSS JOIN pf
    ),
    totre AS (SELECT sum(re_raw) AS tr FROM re)
    SELECT channel,
           round(re_raw, 6) AS removal_effect,
           CASE WHEN tr > 0 THEN round(re_raw / tr, 6)
                ELSE 0.0 END AS attribution
    FROM re CROSS JOIN totre
    """
)


@query("markov_attribution", oracle=_MKV_ORACLE)
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven multi-touch attribution by Markov removal effect
    (operators/attribution.py): journeys -> distributed transition
    counts (one user_id shuffle), then the bounded |channels|^2
    absorption solve driver-side. Oracle-backed since round 7 (VERDICT
    r6 #7): the solve has no direct ANSI-SQL spelling, but its
    geometric series does — the oracle unrolls 25 repeated-doubling
    steps of sum Q^k b per removal scenario (error rho^(2^25), i.e.
    exactly the solve at double precision), sharing the journey /
    transition-count SQL semantics with journey_transitions. The chain
    math is additionally pinned by hand-computed unit tests."""
    from pandas_etl_spark.operators.attribution import markov_attribution

    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    return markov_attribution(ev)


@query(
    "weighted_median_price",
    oracle="""
    WITH pp AS (
        SELECT l_returnflag AS grp,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
               sum(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
        SELECT grp, price_c, w,
               sum(w) OVER (PARTITION BY grp ORDER BY price_c) AS cw,
               sum(w) OVER (PARTITION BY grp) AS tot
        FROM pp
    )
    SELECT grp AS l_returnflag,
           CAST(tot AS BIGINT) AS total_qty,
           round(min(price_c) * 1.0 / 100.0, 2) AS weighted_median_price
    FROM cum
    WHERE 2 * cw >= tot
    GROUP BY grp, tot
    """,
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag — the
    lower weighted median (smallest price whose cumulative weight
    reaches half the total), all arithmetic exact integers so the
    crossing row is engine-independent.

    Scale shape: the per-(group, price) aggregate collapses the data
    first; the cumulative weight then runs through ONE
    range-partitioned prefix sum over the GLOBAL (group, price) order
    (operators/prefix.global_running_sum) with the |groups|-row
    prior-group offsets broadcast and subtracted — so no group ever
    serializes into a single-partition window, no matter how few or
    how hot the groups are (the classic failure of
    ``Window.partitionBy(group).orderBy(price)`` at 3 groups x 10^9
    prices). The oracle uses the plain per-group window, fine at gate
    scale."""
    from pandas_etl_spark.operators.prefix import global_running_sum

    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    pp = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("price_c"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    cum = global_running_sum(
        pp, [F.col("grp").asc(), F.col("price_c").asc()], "w", "gcum"
    )
    totals = pp.groupBy("grp").agg(F.sum("w").alias("tot"))
    from pyspark.sql import Window as W

    offs = totals.withColumn(
        "off",
        F.coalesce(
            F.sum("tot").over(
                W.partitionBy().orderBy("grp").rowsBetween(
                    W.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    within = cum.join(F.broadcast(offs), "grp").withColumn(
        "cw", F.col("gcum") - F.col("off")
    )
    return (
        within.filter(2 * F.col("cw") >= F.col("tot"))
        .groupBy(F.col("grp").alias("l_returnflag"), "tot")
        .agg(
            F.round(F.min("price_c") / 100.0, 2).alias(
                "weighted_median_price"
            )
        )
        .select(
            "l_returnflag",
            F.col("tot").cast("bigint").alias("total_qty"),
            "weighted_median_price",
        )
    )


# numerator/denominator pairs: 0.25, 0.5, 0.75, 0.9 as exact integer
# ratios so the crossing test  den*cw >= num*tot  never touches floats
_WQ_QUANTILES = [(5, 20), (10, 20), (15, 20), (18, 20)]


@query(
    "weighted_percentiles",
    oracle=f"""
    WITH pp AS (
        SELECT l_returnflag AS grp,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
               sum(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
        SELECT grp, price_c, w,
               sum(w) OVER (PARTITION BY grp ORDER BY price_c) AS cw,
               sum(w) OVER (PARTITION BY grp) AS tot
        FROM pp
    ),
    qs (num, den) AS (
        VALUES {", ".join(f"({n}, {d})" for n, d in _WQ_QUANTILES)}
    )
    SELECT grp AS l_returnflag,
           round(num * 1.0 / den, 2) AS q,
           CAST(tot AS BIGINT) AS total_qty,
           round(min(price_c) * 1.0 / 100.0, 2) AS wq_price
    FROM cum CROSS JOIN qs
    WHERE den * cw >= num * tot
    GROUP BY grp, num, den, tot
    """,
)
def q_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price percentiles (p25/p50/p75/p90) per return
    flag — weighted_median_price generalized to the full quantile
    ladder from ONE pass: the same range-partitioned global prefix sum
    over (group, price) with broadcast prior-group offsets, then every
    quantile reads the same cumulative frame against its exact integer
    crossing test  den·cw ≥ num·tot  (no float ever decides a row).
    Adding a quantile costs a broadcast literal row, not a re-scan."""
    from pyspark.sql import Window as W

    from pandas_etl_spark.operators.prefix import global_running_sum

    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    pp = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("price_c"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    cum = global_running_sum(
        pp, [F.col("grp").asc(), F.col("price_c").asc()], "w", "gcum"
    )
    totals = pp.groupBy("grp").agg(F.sum("w").alias("tot"))
    offs = totals.withColumn(
        "off",
        F.coalesce(
            F.sum("tot").over(
                W.partitionBy().orderBy("grp").rowsBetween(
                    W.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    qs = F.broadcast(
        cum.sparkSession.createDataFrame(_WQ_QUANTILES, "num int, den int")
    )
    within = (
        cum.join(F.broadcast(offs), "grp")
        .withColumn("cw", F.col("gcum") - F.col("off"))
        .crossJoin(qs)
    )
    return (
        within.filter(
            F.col("den") * F.col("cw") >= F.col("num") * F.col("tot")
        )
        .groupBy(
            F.col("grp").alias("l_returnflag"), "num", "den", "tot"
        )
        .agg(F.round(F.min("price_c") * 1.0 / 100.0, 2).alias("wq_price"))
        .select(
            "l_returnflag",
            F.round(F.col("num") * 1.0 / F.col("den"), 2).alias("q"),
            F.col("tot").cast("bigint").alias("total_qty"),
            "wq_price",
        )
    )


_CROSTON_ALPHA = 0.3


@query(
    "croston_intermittent_demand",
    oracle=f"""
    WITH d AS (
        SELECT l_partkey AS part, l_quantity AS qty,
               datediff('day', DATE '1970-01-01', l_shipdate) AS day,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    lists AS (
        SELECT part,
               list(qty ORDER BY day, l_orderkey, l_linenumber) AS qs,
               list(day ORDER BY day, l_orderkey, l_linenumber) AS ds,
               count(*) AS n
        FROM d GROUP BY part
    ),
    ser AS (
        SELECT part, n, qs,
               list_transform(generate_series(1, len(ds) - 1),
                              i -> CAST(ds[i + 1] - ds[i] AS DOUBLE)) AS gaps
        FROM lists WHERE n >= 2
    ),
    sm AS (
        SELECT part, n,
               CAST(list_reduce(qs,
                    (acc, x) -> {1 - _CROSTON_ALPHA} * acc
                                + {_CROSTON_ALPHA} * x) AS DOUBLE) AS z,
               CAST(list_reduce(gaps,
                    (acc, x) -> {1 - _CROSTON_ALPHA} * acc
                                + {_CROSTON_ALPHA} * x) AS DOUBLE) AS p
        FROM ser
    )
    SELECT part AS l_partkey, CAST(n AS BIGINT) AS n_demands,
           round(z, 6) AS smoothed_size,
           round(p, 6) AS smoothed_interval_days,
           round(z / p, 6) AS croston_daily_forecast
    FROM sm WHERE p > 0
    """,
)
def q_croston_intermittent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for INTERMITTENT demand (the standard forecast
    for sparse spare-part/SKU series, where plain EWMA biases toward
    zero-heavy periods): per part, exponentially smooth the nonzero
    demand SIZES and the inter-demand INTERVALS separately; the demand
    rate is their ratio. Same bit-reproducible recursion contract as
    ewm_mean: pandas' adjust=False EWMA inside one mapInPandas per
    partition (parts parallelize; total per-part order makes the
    doubles exact) ≡ DuckDB list_reduce over the same ordered lists.
    One l_partkey shuffle; series are per-part bounded."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"),
        F.col("l_quantity").cast("double").alias("qty"),
        F.datediff("l_shipdate", F.lit("1970-01-01").cast("date")).alias(
            "day"
        ),
        "l_orderkey",
        "l_linenumber",
    )
    n = spark.sparkContext.defaultParallelism
    part = li.repartition(n, "part").sortWithinPartitions(
        "part", "day", "l_orderkey", "l_linenumber"
    )

    def croston(batches):
        import pandas as pd

        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        out = []
        for key, g in pdf.groupby("part", sort=False):
            if len(g) < 2:
                continue
            z = (
                g["qty"].ewm(alpha=_CROSTON_ALPHA, adjust=False).mean().iloc[-1]
            )
            gaps = g["day"].diff().dropna().astype("float64")
            p = gaps.ewm(alpha=_CROSTON_ALPHA, adjust=False).mean().iloc[-1]
            if p > 0:
                out.append((key, len(g), round(z, 6), round(p, 6), round(z / p, 6)))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "l_partkey",
                    "n_demands",
                    "smoothed_size",
                    "smoothed_interval_days",
                    "croston_daily_forecast",
                ],
            )

    return part.mapInPandas(
        croston,
        "l_partkey long, n_demands bigint, smoothed_size double, "
        "smoothed_interval_days double, croston_daily_forecast double",
    )
