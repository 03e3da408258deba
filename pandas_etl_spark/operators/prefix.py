"""Distributed global prefix-sum (running total over a TOTAL order).

Spark's ``Window.orderBy`` with no ``partitionBy`` moves ALL rows into a
single partition (WindowExec warns and the stage is one task) — fine at
test scale, fatal at 100 TB. The scalable classic is the three-step
prefix sum:

1. range-repartition on the order key (each partition holds a contiguous
   key range, partition i entirely before partition i+1),
2. per-partition running sum (a window PARTITIONED by partition id —
   parallel),
3. add each partition's cumulative offset (per-partition totals are
   ``#partitions`` numbers — collected to the driver, cumulated, and
   broadcast back as a literal map).

The only driver state is one number per partition; every wide step is a
slim (order-key, value) shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` over the total order ``order_cols``
    (which must be a TOTAL order — ties make the prefix sum
    nondeterministic), computed without a single-partition window."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint PINS the range partitioning: the per-partition
    # totals job and the final output job must see the SAME partition
    # boundaries, but an uncached repartitionByRange re-runs its
    # boundary SAMPLING on every action — and AQE can present the
    # sampler differently-coalesced input per job, moving boundary keys
    # between partitions so the offsets map (collected in job 1) gets
    # applied to the wrong rows in job 2. Observed: a 60k-key prefix
    # sum whose final cumulative lost 258 rows (spearman audit, r5).
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("__local_cum", F.sum(value_col).over(w))
    # one number per partition; bounded driver state by construction
    totals = {
        r["__pid"]: r["__t"]
        for r in local.groupBy("__pid").agg(F.sum(value_col).alias("__t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    if not offsets:  # empty input: nothing to offset
        return local.withColumn(out_col, F.col("__local_cum")).drop(
            "__pid", "__local_cum"
        )
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("__pid"),
    )
    return local.withColumn(out_col, (F.col("__local_cum") + offset_expr)).drop(
        "__pid", "__local_cum"
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row number over a TOTAL order ``order_cols``,
    without a single-partition window: the prefix sum of ones. With a
    unique order this equals rank()/row_number(), so the global-rank
    pandas-parity operators (percent_rank, cume_dist, ntile,
    positional concat) can all be expressed scale-true: the only
    driver state is one count per partition."""
    ranked = global_running_sum(
        df.withColumn("__one", F.lit(1)), order_cols, "__one", out_col,
        num_partitions,
    )
    return ranked.withColumn(out_col, F.col(out_col).cast("bigint")).drop(
        "__one"
    )
