"""Mergeable HyperLogLog sketch rollups (Apache DataSketches via Spark 4).

The 100 TB pattern for distinct-count dashboards: scan the raw fact table
ONCE, reduce each (bucket, dimensions) group to a few-KB binary HLL
sketch (``hll_sketch_agg`` partial-merges map-side, so only sketches
cross the wire — never the raw key stream), persist that rollup, and
answer every later "distinct keys over an arbitrary bucket range /
dimension union" question by ``hll_union_agg`` + ``hll_sketch_estimate``
over the tiny rollup table.  Unlike ``approx_count_distinct`` (which
yields a number you cannot re-aggregate), the stored sketches compose:
union is exact over the sketch lattice, so day sketches roll into weeks,
months, or all-time without re-reading the fact table, and a streaming
ingest can append one sketch row per batch.

HLL register updates are max() operations, so sketch contents are
insensitive to row order and partitioning: the same input set always
yields the same sketch, and merging per-day sketches is bit-equivalent
to sketching the union directly (asserted in tests/test_operators.py).

No counterpart in the reference (pandas has no mergeable sketches);
closest is its plain ``nunique`` aggregate (pandas_etl/etl.py pivot/agg
usage). DuckDB cannot replay DataSketches estimates, so catalog queries
over this module are rows-only driver checks with accuracy bounds pinned
in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lg_k = 12 -> 4096 registers -> relative standard error ~1.04/sqrt(4096)
# ~= 1.6%; ~2-3 KB serialized per sketch. Large enough for dashboard
# accuracy, small enough that a year of daily x 100-dimension rollups is
# a few hundred MB — broadcastable.
DEFAULT_LG_K = 12


def hll_rollup(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One row per ``group_cols`` group: a binary HLL sketch of the
    distinct ``key_col`` values plus the exact row count. This is the
    write-once pass over the raw data; everything downstream reads only
    the rollup."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias(sketch_col),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_estimate(
    rollup: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
    out_col: str = "distinct_est",
) -> DataFrame:
    """Re-aggregate a sketch rollup to coarser ``group_cols`` (possibly
    ``[]`` for a grand total): union the sketches, estimate once. The
    shuffle moves only KB-sized sketches."""
    merged = F.hll_union_agg(F.col(sketch_col)).alias("_merged")
    if group_cols:
        agg = rollup.groupBy(*group_cols).agg(
            merged, F.sum("n_rows").alias("n_rows")
        )
    else:
        agg = rollup.agg(merged, F.sum("n_rows").alias("n_rows"))
    return agg.select(
        *group_cols,
        F.hll_sketch_estimate(F.col("_merged")).cast("bigint").alias(out_col),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


def hll_overlap(
    rollup: DataFrame,
    segment_col: str,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Pairwise audience overlap between segments from their sketches
    alone, via inclusion-exclusion: |A∩B| ≈ est(A) + est(B) −
    est(A∪B). HLL cannot intersect sketches directly, so the
    intersection inherits the union's ABSOLUTE error — fine for "how
    much do these audiences overlap" dashboards over large segments,
    unreliable when the true overlap is far below rsd·|A∪B| (the
    documented DataSketches caveat; tests pin the large-overlap
    regime). Runs entirely on the rollup: a self-join over the
    |segments|² pair grid of KB-sized sketches — no raw data."""
    a = rollup.select(
        F.col(segment_col).alias("seg_a"), F.col(sketch_col).alias("_sk_a")
    )
    b = rollup.select(
        F.col(segment_col).alias("seg_b"), F.col(sketch_col).alias("_sk_b")
    )
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b"))
    est_a = F.hll_sketch_estimate(F.col("_sk_a"))
    est_b = F.hll_sketch_estimate(F.col("_sk_b"))
    est_u = F.hll_sketch_estimate(F.hll_union(F.col("_sk_a"), F.col("_sk_b")))
    return pairs.select(
        "seg_a",
        "seg_b",
        est_a.cast("bigint").alias("distinct_a"),
        est_b.cast("bigint").alias("distinct_b"),
        est_u.cast("bigint").alias("distinct_union"),
        F.greatest(F.lit(0), (est_a + est_b - est_u).cast("bigint")).alias(
            "overlap_est"
        ),
    )


def hll_append(
    rollup: DataFrame,
    batch: DataFrame,
    key_col: str,
    group_cols: list[str],
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Incremental maintenance: fold a new raw batch into an existing
    rollup without re-reading history — sketch the batch, then
    union-merge per group (sketch union is associative + commutative +
    idempotent over duplicate keys, so replaying a batch of
    already-seen keys cannot inflate the estimate)."""
    delta = hll_rollup(batch, key_col, group_cols, lg_k, sketch_col)
    return (
        rollup.unionByName(delta)
        .groupBy(*group_cols)
        .agg(
            F.hll_union_agg(F.col(sketch_col)).alias(sketch_col),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
    )
