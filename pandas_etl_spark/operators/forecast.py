"""Per-series state-space forecasting (SURVEY §2.6 extension — the
time-series family's recursive member beside seasonal decomposition,
EWM, and resampling).

Holt's linear-trend method is a two-state recurrence — level and
trend — over each ordered series:

    l_t = alpha * y_t + (1 - alpha) * (l_{t-1} + b_{t-1})
    b_t = beta  * (l_t - l_{t-1}) + (1 - beta) * b_{t-1}

with the standard initialization l_1 = y_1, b_1 = y_2 - y_1 and the
one-step-ahead fitted value fitted_t = l_{t-1} + b_{t-1} (NULL at
t = 1). No closed-form SQL window exists (each state depends on the
previous state, not a fixed frame), so this is an applyInPandas
operator by necessity — the recurrence itself is the UDF.

Scale shape: the data-sized input is expected to be PRE-AGGREGATED
(e.g. a daily series per key — one shuffle upstream); the operator
adds ONE repartition-by-series exchange, and each series is processed
sequentially inside its own task (the recurrence is inherently
sequential per series, but series are independent, so parallelism =
number of series). Series length is bounded by the time domain, never
raw data volume. The arithmetic is plain IEEE doubles evaluated in the
textbook operand order, so results are bit-reproducible against any
engine running the same recurrence (the catalog oracle replays it as a
recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_linear(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Holt linear-trend smoothing per series: returns the input keys
    plus (y, level, trend, fitted) per row, where fitted is the
    one-step-ahead prediction l_{t-1} + b_{t-1}. Single-row series get
    level = y, trend = 0, fitted NULL (no second point to seed a
    trend). alpha/beta must lie in (0, 1]."""
    if not (0 < alpha <= 1) or not (0 < beta <= 1):
        raise ValueError("holt_linear: alpha and beta must be in (0, 1]")

    import pandas as pd

    out_fields = []
    for name in (series_col, order_col):
        out_fields.append(
            next(f for f in df.schema.fields if f.name == name)
        )
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
        + ", y double, level double, trend double, fitted double"
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        ys = [float(v) for v in pdf[value_col]]
        n = len(ys)
        if n == 1:
            lv, tr, ft = [ys[0]], [0.0], [None]
        else:
            lv, tr, ft = [ys[0]], [ys[1] - ys[0]], [None]
            for t in range(1, n):
                prev_l, prev_b = lv[-1], tr[-1]
                # textbook operand order — mirrored by the SQL oracle
                l_new = alpha * ys[t] + (1 - alpha) * (prev_l + prev_b)
                b_new = beta * (l_new - prev_l) + (1 - beta) * prev_b
                lv.append(l_new)
                tr.append(b_new)
                ft.append(prev_l + prev_b)
        return pd.DataFrame(
            {
                series_col: pdf[series_col].values,
                order_col: pdf[order_col].values,
                "y": ys,
                "level": lv,
                "trend": tr,
                "fitted": ft,
            }
        )

    return (
        df.select(series_col, order_col, F.col(value_col).cast("double"))
        .groupBy(series_col)
        .applyInPandas(smooth, schema)
    )


def theil_sen(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Theil-Sen robust trend estimate per group: the MEDIAN of all
    pairwise slopes (y_j - y_i)/(x_j - x_i), x_i < x_j — the standard
    outlier-resistant alternative to least squares (breakdown point
    ~29%), plus the matching intercept median(y - slope·x). Returns
    (group..., n_points, slope, intercept).

    Scale shape: the O(n²) pair enumeration is intended for
    DOMAIN-BOUNDED series (a daily/hourly aggregate — the caller
    collapses raw data first), exactly like the repo's other
    windowed-series operators; the self-join is keyed on the group
    columns so groups parallelize, and the median is one percentile
    aggregate over the pair frame. Slopes are deterministic doubles,
    and the median interpolation (Spark percentile ≡ DuckDB
    quantile_cont, proven bit-equal by percentiles_exact) keeps
    results engine-stable."""
    gcols = list(group_cols or [])
    a = df.select(
        *gcols, F.col(x_col).alias("__x1"), F.col(y_col).alias("__y1")
    )
    b = df.select(
        *gcols, F.col(x_col).alias("__x2"), F.col(y_col).alias("__y2")
    )
    pairs = (
        a.join(b, gcols) if gcols else a.crossJoin(b)
    ).filter(F.col("__x1") < F.col("__x2"))
    slope_expr = (F.col("__y2") - F.col("__y1")) / (
        F.col("__x2") - F.col("__x1")
    ).cast("double")
    slopes = (
        pairs.groupBy(*gcols)
        .agg(F.percentile(slope_expr, 0.5).alias("slope"))
    )
    joined = (
        df.join(F.broadcast(slopes), gcols)
        if gcols
        else df.crossJoin(F.broadcast(slopes))
    )
    return (
        joined.groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.first("slope").alias("slope"),
            F.percentile(
                F.col(y_col) - F.col("slope") * F.col(x_col), 0.5
            ).alias("intercept"),
        )
    )


def cusum_changepoint(
    df: DataFrame, order_col: str, value_col: str
) -> DataFrame:
    """CUSUM mean-shift change-point detection over an ordered series:
    S_t = Σ_{i<=t} (y_i - ȳ); the change point is the argmax of |S_t|
    (ties -> earliest), and the normalized statistic
    |S|_max / (σ·sqrt(n)) is the scale-free shift score (≳ 1.36
    corresponds to 5% significance under the Brownian-bridge limit,
    the same constant family as the KS test). Returns one row
    (change_point, n, max_cusum, cusum_stat).

    Scale shape: intended for DOMAIN-BOUNDED series (the caller
    aggregates raw data to a daily/hourly series first); the ordered
    cumulative runs in one window over that bounded frame, with ȳ and
    σ riding a broadcast 1-row aggregate. Cross-engine determinism:
    S_t is computed as cum(y)_t - t·ȳ — NOT as a running sum of
    (y - ȳ) — so when the caller passes integer-scaled values (e.g.
    cents) the cumulative is exact under ANY summation association
    (window implementations differ: running fold vs segment tree) and
    S_t is bit-identical everywhere."""
    from pyspark.sql import Window as W

    stats = df.agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_pop(value_col).alias("__sd"),
        F.count(F.lit(1)).alias("__n"),
    )
    w = W.orderBy(order_col).rowsBetween(W.unboundedPreceding, 0)
    cum = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__cum", F.sum(value_col).over(w))
        .withColumn("__t", F.count(F.lit(1)).over(w))
        .withColumn(
            "__s", F.col("__cum") - F.col("__t") * F.col("__mu")
        )
        .select(
            F.col(order_col).alias("change_point"),
            "__n",
            "__s",
            "__sd",
        )
    )
    return (
        cum.orderBy(F.abs(F.col("__s")).desc(), F.col("change_point").asc())
        .limit(1)
        .select(
            "change_point",
            F.col("__n").cast("bigint").alias("n"),
            F.round(F.abs(F.col("__s")), 6).alias("max_cusum"),
            F.round(
                F.when(
                    F.col("__sd") > 0,
                    F.abs(F.col("__s"))
                    / (F.col("__sd") * F.sqrt(F.col("__n"))),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("cusum_stat"),
        )
    )
