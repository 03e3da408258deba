"""Gaps-and-islands temporal operators: interval merging and SCD Type-2
history construction.

Both are classic warehouse/ETL shapes the reference's pandas surface
reaches via bound-method dispatch (sort + groupby + shift chains); here
they are window-function plans — one shuffle on the partition key, then
linear window passes, which is the optimal distributed form (the state
per key is a single running max/lag, never the key's full history).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Merge overlapping/touching intervals per key into islands.

    An interval starts a new island when its start is strictly after the
    max end of every earlier interval (earlier by ``(start, tiebreak)``
    total order — required: ties on start make "previous max end"
    nondeterministic otherwise). Touching intervals (start == prev end)
    MERGE.

    Returns ``(key, island bigint, island_start, island_end,
    n_intervals bigint)``. One shuffle (partitionBy key); the window
    state is one running max — O(1) per row at any key cardinality.
    """
    w = Window.partitionBy(key_col).orderBy(start_col, order_tiebreak)
    prev_max_end: Column = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    islands = df.withColumn(
        "island",
        F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return islands.groupBy(key_col, "island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Collapse an event log into Slowly-Changing-Dimension Type-2
    history: one row per consecutive run of equal ``attr_col`` values
    per key, with ``valid_from`` / ``valid_to`` validity ranges
    (``valid_to`` NULL on the current run — open-ended).

    Change points come from ``lag(attr)`` over ``(ts, tiebreak)`` total
    order; run ids from a running sum of change flags; ``valid_to`` from
    ``lead(valid_from)`` over the per-key run sequence. Two window passes
    over one partitioning — the exchange is reused (same key), so one
    shuffle total.

    Returns ``(key, version bigint, attr, valid_from, valid_to,
    n_events bigint, is_current boolean)``.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    changed = F.when(
        F.lag(attr_col).over(w).isNull()
        | (F.lag(attr_col).over(w) != F.col(attr_col)),
        1,
    ).otherwise(0)
    runs = df.withColumn(
        "version",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    hist = runs.groupBy(key_col, "version").agg(
        F.min(attr_col).alias(attr_col),  # constant within a run
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    return hist.withColumn("valid_to", F.lead("valid_from").over(wv)).select(
        key_col,
        "version",
        attr_col,
        "valid_from",
        "valid_to",
        "n_events",
        F.col("valid_to").isNull().alias("is_current"),
    )
