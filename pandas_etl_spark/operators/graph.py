"""Iterative graph operators on edge DataFrames.

Connected components live in ``functions/dedup.py`` (star-contraction,
O(log n) rounds); this module holds the rank-propagation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank by power iteration over an edge DataFrame —
    returns (node, rank) after ``iters`` synchronous updates from the
    uniform start, the standard formulation (Page et al. 1999; the same
    shape GraphX/Pregel runs):

        rank' = (1-d)/N + d * (Σ_in rank·w/out_w  +  dangling_mass/N)

    Dangling nodes (no out-edges) spread their rank uniformly — without
    that term rank mass leaks and the result is not a distribution
    (Σ rank = 1 is asserted in tests at every iteration count).

    Scale shape: ranks live keyed by node; each iteration is one join
    of the edge table against the current rank (both hash-partitioned
    on the src node — co-located when the edge table is bucketed by
    src) plus a dst-keyed aggregation, i.e. the same two-shuffle round
    GraphX pays. The dangling mass is a 1-row aggregate broadcast into
    the update. ``localCheckpoint`` truncates lineage each round so the
    plan does not grow with ``iters`` (the connected-components
    lesson). Deterministic: no sampling, no rand."""
    # Materialize the graph frames ONCE: every iteration (and the
    # nodes.count() below) would otherwise re-execute the full upstream
    # edge construction — for pagerank_trade_graph that is a 5-way fact
    # join re-run per round (review r5 #2). localCheckpoint also cuts
    # the lineage the iterations would stack on top of.
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        (F.col(weight) if weight else F.lit(1.0)).cast("double").alias("w"),
    ).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.sum("w").alias("tw"))
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint()
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("tw")).alias("c"))
        )
        dangling = (
            ranks.join(outdeg, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
