"""Time-series resample + gap interpolation (pandas ``resample`` /
``interpolate`` parity — SURVEY §2.5 time-bucketing family).

Plan (all built-in expressions, one shuffle on the group key):

1. bucket events to a fixed grid (``date_trunc``-style epoch arithmetic)
   and aggregate per (key, bucket);
2. per key, explode the FULL grid ``sequence(min_bucket, max_bucket,
   step)`` — gaps become rows with null values;
3. linear interpolation via two windows: previous known (value, bucket)
   with ``last(ignorenulls)`` over the backward frame, next known with
   ``first(ignorenulls)`` over the forward frame, then lerp on the time
   fraction. Boundary gaps stay at the known endpoint value
   (pandas ``interpolate(limit_direction='both')`` behavior).

At scale the grid explode is bounded per key by its time span — skewed
long-lived keys fan out proportionally, which AQE handles; the windows
reuse the same (key) partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """(key, bucket timestamp, value double, interpolated boolean) on a
    complete per-key grid; ``value`` is the bucket mean where observed,
    linearly interpolated otherwise."""
    step = F.lit(step_seconds).cast("long")
    epoch = F.col(ts_col).cast("double").cast("long")
    bucketed = (
        df.select(
            F.col(key),
            ((epoch - epoch % step) ).alias("bucket_s"),
            F.col(value_col).cast("double").alias("v"),
        )
        .groupBy(key, "bucket_s")
        .agg(F.avg("v").alias("v"))
    )
    grid = (
        bucketed.groupBy(key)
        .agg(F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi"))
        .select(
            key,
            F.explode(F.sequence(F.col("lo"), F.col("hi"), step)).alias("bucket_s"),
        )
    )
    full = grid.join(bucketed, [key, "bucket_s"], "left")

    wb = W.partitionBy(key).orderBy("bucket_s").rowsBetween(W.unboundedPreceding, 0)
    wf = W.partitionBy(key).orderBy("bucket_s").rowsBetween(0, W.unboundedFollowing)
    known = F.when(F.col("v").isNotNull(), F.col("bucket_s"))
    prev_v = F.last("v", ignorenulls=True).over(wb)
    prev_t = F.last(known, ignorenulls=True).over(wb)
    next_v = F.first("v", ignorenulls=True).over(wf)
    next_t = F.first(known, ignorenulls=True).over(wf)

    frac = (F.col("bucket_s") - prev_t).cast("double") / (next_t - prev_t).cast("double")
    interpolated = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(prev_t.isNull(), next_v)  # leading gap → first known
        .when(next_t.isNull(), prev_v)  # trailing gap → last known
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    # no rounding: the lerp arithmetic is order-identical across engines
    # (bit-equal doubles); rounding at a fixed precision would CREATE
    # half-way mismatches on the exact dyadic fractions lerp produces
    return full.select(
        key,
        F.timestamp_seconds(F.col("bucket_s")).alias("bucket"),
        interpolated.alias("value"),
        F.col("v").isNull().alias("interpolated"),
    )
