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
