"""Batch relational operator catalog (SURVEY §2.2–§2.8).

Each query exercises one operator family from the SURVEY §2 inventory,
Spark-first (DataFrame API; Catalyst handles pushdown/broadcast/AQE), with
a DuckDB oracle. Aliases are kept identical on both sides — the driver
sorts columns by name before hashing.

Scale notes are inline: broadcast for dimension tables, single shuffle per
agg/join on its keys, no driver-side materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pandas_etl_spark.catalog.registry import query
from pandas_etl_spark.operators.sampling import _threshold as _sample_threshold
from pandas_etl_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# scan / filter / project (SURVEY §2.3) — predicate+projection pushed to parquet
# ---------------------------------------------------------------------------


@query(
    "filter_project",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice,
           CAST(p_size AS BIGINT) AS size_big
    FROM part
    WHERE p_size >= 30 AND p_brand = 'Brand#3'
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") >= 30) & (F.col("p_brand") == "Brand#3"))
        .select(
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.col("p_size").cast("bigint").alias("size_big"),
        )
    )


# ---------------------------------------------------------------------------
# groupBy aggregations (SURVEY §2.5) — TPC-H Q1 shape; partial agg map-side
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                       AS sum_qty,
           sum(l_extendedprice)                                  AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity)                                       AS avg_qty,
           avg(l_extendedprice)                                  AS avg_price,
           avg(l_discount)                                       AS avg_disc,
           count(*)                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_stats",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)            AS n,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           min(o_totalprice)                   AS min_price,
           max(o_totalprice)                   AS max_price,
           round(avg(o_totalprice), 6)         AS avg_price,
           round(stddev_samp(o_totalprice), 6) AS sd_price,
           round(var_samp(o_totalprice), 2)    AS var_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum/mean/min/max/count/std/var/nunique family (§2.5 D-rows).

    nunique is computed as a SEPARATE aggregation joined back (broadcast —
    result has one row per group key): mixing countDistinct into the same
    agg makes Catalyst insert an Expand + regroup, which (a) multiplies the
    pre-shuffle row count by the number of distinct-aggs at 100 TB and
    (b) re-orders the float summation for avg/std/var (nondeterministic
    last-ulp drift vs any sequential oracle)."""
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        F.round(F.stddev_samp("o_totalprice"), 6).alias("sd_price"),
        # var's Welford M2 merge order differs per engine/session by
        # ~1 ulp (~4e-6 abs at 2e10; r1 measured 6e-5 noise): round well
        # above the floor — the r9 margin audit measured the 1e-3 grid's
        # nearest-boundary margin at 2.2e-4, only 3.7x that noise, so
        # the pin moved to 1e-2 (scripts/float_margin_audit.py)
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
    )
    ncust = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )
    return base.join(F.broadcast(ncust), "o_orderpriority").select(
        "o_orderpriority",
        "n",
        "n_cust",
        "min_price",
        "max_price",
        "avg_price",
        "sd_price",
        "var_price",
    )


@query(
    "groupby_wide_max",
    oracle="""
    SELECT l_returnflag,
           max(l_orderkey) AS l_orderkey, max(l_partkey) AS l_partkey,
           max(l_suppkey) AS l_suppkey,
           CAST(max(l_linenumber) AS INTEGER) AS l_linenumber,
           max(l_quantity) AS l_quantity,
           max(l_extendedprice) AS l_extendedprice,
           max(l_discount) AS l_discount, max(l_tax) AS l_tax,
           max(l_linestatus) AS l_linestatus, max(l_shipdate) AS l_shipdate
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_groupby_wide_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship shape: groupby key → max of every other
    column, strings included (lexicographic), mirroring
    ``df.groupby(by="AB").max()``
    (/root/reference/tests/etl_definition_folder/pipelines/pandas_pipeline_recovery_1.yaml:18)."""
    li = _t(spark, sf_dir, "lineitem")
    aggs = [F.max(c).alias(c) for c in li.columns if c != "l_returnflag"]
    return li.groupBy("l_returnflag").agg(*aggs)


@query(
    "global_max",
    oracle="""
    SELECT max(l_orderkey) AS l_orderkey, max(l_quantity) AS l_quantity,
           max(l_extendedprice) AS l_extendedprice,
           max(l_returnflag) AS l_returnflag, max(l_shipdate) AS l_shipdate
    FROM lineitem
    """,
)
def q_global_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table reduction → 1-row frame, mirroring ``DataFrame.max()``
    (/root/reference/tests/.../pandas_pipeline_recovery_1.yaml:48-49)."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"]
    return li.agg(*[F.max(c).alias(c) for c in cols])


# ---------------------------------------------------------------------------
# joins (SURVEY §2.4) — broadcast dims; AQE picks the big-side strategy
# ---------------------------------------------------------------------------


@query(
    "join_dims_broadcast",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(count(*) AS BIGINT) AS n_cust,
           sum(c.c_acctbal)         AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_join_dims_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("c_acctbal").alias("total_bal"))
    )


@query(
    "top_revenue_orders",
    oracle="""
    SELECT l.l_orderkey,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.
    Distributed top-k plans as TakeOrderedAndProject (no full sort)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "nation_revenue",
    oracle="""
    SELECT n.n_name,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: multi-way join with a co-nation predicate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "outer_join",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           coalesce(o.total_spent, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total_spent
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join against a pre-aggregated fact side — aggregate
    BEFORE the join so the shuffle carries one row per key."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("total_spent"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spent", F.lit(0.0)).alias("total_spent"),
    )


@query(
    "theta_join_pairs",
    oracle="""
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, n1.n_regionkey
    FROM nation n1
    JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
                  AND n1.n_nationkey < n2.n_nationkey
    """,
)
def q_theta_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) predicate on top of an equi key — Catalyst keeps
    the equi part as the join key and applies the inequality as a
    post-join filter (no cartesian blowup)."""
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
    ).select(
        F.col("n1.n_name").alias("nation_a"),
        F.col("n2.n_name").alias("nation_b"),
        F.col("n1.n_regionkey").alias("n_regionkey"),
    )


# ---------------------------------------------------------------------------
# window functions / sort / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@query(
    "window_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    ) WHERE rn <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        _t(spark, sf_dir, "part")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_spent,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT)
               AS order_seq
    FROM orders
    """,
)
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("running_spent"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w                    AS prev_price,
           o_totalprice - lag(o_totalprice) OVER w     AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prev.alias("prev_price"),
        (F.col("o_totalprice") - prev).alias("delta"),
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment rank/dense_rank (one c_mktsegment shuffle) plus an
    exact GLOBAL ntile(4) — scale-true since round 7: with the unique
    (c_acctbal, c_custkey) order, ntile is pure integer arithmetic on
    the range-partitioned global prefix COUNT — the first n%4 buckets
    take floor(n/4)+1 rows (the SQL ntile contract), computed from
    (rn, n) with no single-partition window."""
    from pandas_etl_spark.operators.prefix import global_row_number

    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    rn = global_row_number(
        c, [F.col("c_acctbal").asc(), F.col("c_custkey").asc()]
    )
    n = c.agg(F.count(F.lit(1)).alias("n"))
    q, m = F.floor(F.col("n") / 4), F.col("n") % 4
    big = m * (q + 1)  # rows living in the m oversized leading buckets
    quartile = F.when(
        F.col("rn") <= big, F.floor((F.col("rn") - 1) / (q + 1)) + 1
    ).otherwise(m + F.floor((F.col("rn") - 1 - big) / q) + 1)
    return rn.crossJoin(F.broadcast(n)).select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        quartile.cast("bigint").alias("quartile"),
    )


@query(
    "rolling_window",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
           avg(l_quantity) OVER (PARTITION BY l_suppkey
                                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS rolling_avg_qty
    FROM lineitem
    """,
)
def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``rolling(7).mean()`` per group → row-frame window."""
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-6, 0)
    )
    return _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.avg("l_quantity").over(w).alias("rolling_avg_qty"),
    )


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nlargest → distributed top-k (TakeOrderedAndProject)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------


@query(
    "union_all",
    oracle="""
    SELECT c_custkey, c_mktsegment, 'building' AS src
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_mktsegment, 'rich' AS src
    FROM customer WHERE c_acctbal > 5000
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.concat parity → unionByName
    (/root/reference/tests/.../pandas_pipeline_recovery_1.yaml:42-46)."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_mktsegment", F.lit("building").alias("src")
    )
    b = c.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", "c_mktsegment", F.lit("rich").alias("src")
    )
    return a.unionByName(b)


@query(
    "intersect_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@query(
    "except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# pivot / rollup / cube / grouping sets (SURVEY §2.5)
# ---------------------------------------------------------------------------


@query(
    "pivot_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS cnt_open,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS cnt_filled,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS cnt_partial
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.pivot_table → groupBy().pivot(); explicit value list avoids the
    extra distinct-values job (required practice at scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0)).alias("cnt_open"),
            F.coalesce(F.col("F"), F.lit(0)).alias("cnt_filled"),
            F.coalesce(F.col("P"), F.lit(0)).alias("cnt_partial"),
        )
    )


@query(
    "rollup_totals",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "cube_totals",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_extendedprice) AS sum_price, CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.sum("l_extendedprice").alias("sum_price"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# time bucketing (SURVEY §2.5 Grouper) & scalar function families (§2.8)
# ---------------------------------------------------------------------------


@query(
    "time_bucket_week",
    oracle="""
    SELECT date_trunc('week', o_orderdate) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(o_totalprice) AS total
    FROM orders
    GROUP BY bucket
    """,
)
def q_time_bucket_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.Grouper(freq='W') → weekly bucket (Monday-start label)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("total"))
    )


@query(
    "time_bucket_month",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           avg(o_totalprice) AS avg_price
    FROM orders
    GROUP BY bucket
    """,
)
def q_time_bucket_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.avg("o_totalprice").alias("avg_price"))
    )


@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                         AS uname,
           lower(c_mktsegment)                   AS lseg,
           CAST(length(c_name) AS BIGINT)        AS name_len,
           substr(c_name, 1, 8)                  AS prefix,
           concat(c_mktsegment, '#', c_name)     AS tagged,
           replace(c_name, 'Customer', 'Cust')   AS shortname,
           CAST(contains(c_name, '1') AS BOOLEAN) AS has_one,
           trim(c_name)                          AS trimmed
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """.str family parity (§2.8)."""
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_name")).alias("tagged"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("shortname"),
        F.col("c_name").contains("1").alias("has_one"),
        F.trim("c_name").alias("trimmed"),
    )


@query(
    "datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)      AS yr,
           CAST(month(o_orderdate) AS INTEGER)     AS mo,
           CAST(day(o_orderdate) AS INTEGER)       AS dom,
           CAST(quarter(o_orderdate) AS INTEGER)   AS qtr,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(hour(o_orderdate) AS INTEGER)      AS hr,
           date_trunc('day', o_orderdate)          AS day_start
    FROM orders
    """,
)
def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """.dt family parity (§2.8)."""
    d = F.col("o_orderdate")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        F.hour(d).alias("hr"),
        F.date_trunc("day", d).alias("day_start"),
    )


@query(
    "math_case_when",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount)           AS net,
           abs(l_discount - 0.05)                       AS disc_dev,
           CAST(floor(l_quantity) AS BIGINT)            AS qty_floor,
           CAST(ceil(l_quantity) AS BIGINT)             AS qty_ceil,
           sqrt(l_extendedprice)                        AS price_sqrt,
           ln(l_extendedprice + 1)                      AS price_ln,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END                        AS qty_band
    FROM lineitem
    """,
)
def q_math_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arithmetic / np.* / where → Column ops + when().otherwise() (§2.8)."""
    q = F.col("l_quantity")
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(q).cast("bigint").alias("qty_floor"),
        F.ceil(q).cast("bigint").alias("qty_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.log(F.col("l_extendedprice") + 1).alias("price_ln"),
        F.when(q >= 40, "bulk").when(q >= 10, "mid").otherwise("small").alias("qty_band"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.json_normalize parity → get_json_object (§2.8)."""
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


@query(
    "json_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) FILTER (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50)
                AS BIGINT) AS n_high,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_total
    FROM events
    GROUP BY event_type
    """,
)
def q_json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` ingests the payload once into the binary variant
    encoding, ``variant_get`` path-extracts with a type — the modern
    replacement for per-expression ``get_json_object`` re-parsing (the
    variant parse happens once per row regardless of how many paths are
    later read; at 100 TB that's the difference between one JSON parse
    and one per extracted field)."""
    v = _t(spark, sf_dir, "events").select(
        "event_type",
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
        F.sum("k").cast("bigint").alias("k_total"),
    )


@query(
    "dedup_rows_deterministic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def q_dedup_rows_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_duplicates(subset=...) with deterministic keep-first-by-order
    semantics (Spark's dropDuplicates keeps an arbitrary row; pandas keeps
    the first in input order — we make the order explicit, SURVEY §7)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "corr_stats",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 3) AS covar_s,
           round(covar_pop(l_quantity, l_extendedprice), 3)  AS covar_p
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregate family (corr / covar_samp / covar_pop, §2.5).
    Rounded above the cross-engine Welford-merge ulp noise (same reasoning
    as agg_stats' var)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 3).alias("covar_s"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 3).alias("covar_p"),
        )
    )


@query(
    "sample_hash",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)
          % 4294967296 < {_sample_threshold(0.1)}
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by content hash (md5 of the key) — the
    reproducible-across-engines/runs sampling primitive for pipeline
    debugging and A/B slices. Pure narrow filter: no shuffle, prunes to
    three columns at the scan, identical rows on every engine (unlike
    TABLESAMPLE / rand(seed), which are engine- and partitioning-
    dependent)."""
    from pandas_etl_spark.operators.sampling import hash_sample

    o = _t(spark, sf_dir, "orders")
    return hash_sample(o, "o_orderkey", 0.1).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "trade_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(extract(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between nation pairs by
    ship year. Two independent broadcast joins against the same dimension
    (supplier-side and customer-side nation) — the fact table shuffles
    only for the orders/customer equi-joins; both nation lookups stay
    map-side."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "rolling_time_window",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
               value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, epoch_s, value,
           round(avg(value) OVER w, 6) AS avg_1h,
           CAST(count(*) OVER w AS BIGINT) AS n_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-range window frame (rangeBetween on epoch seconds): trailing
    1-hour mean/count per user — the frame is defined by VALUE distance,
    not row count (rolling_window covers the row-count variant). One
    shuffle on user_id; the sort feeds both window aggregates."""
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").cast("long").alias("epoch_s"),
            "value",
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3599, W.currentRow)
    )
    return e.select(
        "user_id",
        "epoch_s",
        "value",
        F.round(F.avg("value").over(w), 6).alias("avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@query(
    "cust_order_histogram",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q_cust_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution including
    zero-order customers (LEFT join keeps them; count(col) skips the null
    orderkey). Two-level aggregation — the second groupBy runs on the
    tiny (customer-count-sized) intermediate, so the only real shuffle is
    the join/first-agg on custkey."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
