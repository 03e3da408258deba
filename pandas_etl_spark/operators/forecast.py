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
