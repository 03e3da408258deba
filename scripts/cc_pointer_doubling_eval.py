#!/usr/bin/env python
"""VERDICT r10 #7: pointer-doubling experiment for the iterative CC core.

Compares the shipped alternating large/small-star contraction
(functions/dedup._cc_star) against a variant that adds a POINTER-JUMP
(hash-to-min shortcut: re-hang every node onto its grandparent's root
candidate) after each small-star round — trading one extra join +
distinct per round for a potentially halved round count.

Methodology: same edge sets the real queries use (dedup_clusters' §2a
pair generator; spatial_cluster_eps' radius-join edges) at the given
SF; each algorithm runs on identical localCheckpoint-pinned inputs;
wall min-of-N plus the round count. Labels are asserted IDENTICAL
between the two variants before any timing is trusted.

Usage: python scripts/cc_pointer_doubling_eval.py [sf_dir] [n_samples]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def star_rounds(E: DataFrame, jump: bool, max_iters: int = 50):
    """The _cc_star inner loop, optionally with a pointer-jump step.
    E arrives canonical (a > b), checkpointed. Returns (roots_df,
    rounds)."""
    spark = E.sparkSession
    n_prev = E.count()
    wa = Window.partitionBy("a")
    rounds = 0
    if n_prev == 0:
        return E, 0
    for rounds in range(1, max_iters + 1):
        both = E.union(E.select(F.col("b").alias("a"), F.col("a").alias("b")))
        L = (
            both.withColumn("m", F.least(F.col("a"), F.min("b").over(wa)))
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        S = (
            L.withColumn("m", F.min("b").over(wa))
            .select(
                F.when(F.col("b") == F.col("m"), F.col("a"))
                .otherwise(F.col("b"))
                .alias("a"),
                F.col("m").alias("b"),
            )
            .distinct()
        )
        if jump:
            # pointer jump: if a's candidate root b itself hangs under
            # b2 (< b), re-hang a onto b2 directly — one extra
            # left-join + projection per round, halving tall chains a
            # second time within the same round.
            parent = S.groupBy("a").agg(F.min("b").alias("pb"))
            S = (
                S.join(
                    parent.select(
                        F.col("a").alias("b"), F.col("pb").alias("b2")
                    ),
                    "b",
                    "left",
                )
                .select(
                    F.col("a"),
                    F.least(F.col("b"), F.coalesce("b2", F.col("b"))).alias(
                        "b"
                    ),
                )
                .filter(F.col("a") > F.col("b"))
                .distinct()
            )
        S = S.localCheckpoint()
        n_new = S.count()
        converged = n_new == n_prev and S.subtract(E).limit(1).count() == 0
        E, n_prev = S, n_new
        if converged:
            break
    roots = E.groupBy("a").agg(F.min("b").alias("root"))
    return roots, rounds


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    n_samples = int(argv[1]) if len(argv) > 1 else 3

    from pandas_etl_spark.functions import dedup as dd
    from pandas_etl_spark.session import get_spark
    from pandas_etl_spark.sources.io import ensure_parallelism, load_table

    spark = get_spark("cc-pointer-doubling")

    def edge_sets():
        d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
        jacc = dd.ngram_jaccard_pairs(
            d, "text", "doc_id", k=5, threshold=0.5, max_df=50
        ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        yield "dedup_clusters_edges", jacc
        from pandas_etl_spark.operators.geo import (
            radius_join,
            with_synthetic_coords,
        )

        c = with_synthetic_coords(
            ensure_parallelism(load_table(spark, sf_dir, "customer")).select(
                "c_custkey"
            ),
            "c_custkey",
        )
        a = c.select(
            F.col("c_custkey").alias("id_a"),
            F.col("lat").alias("alat"),
            F.col("lon").alias("alon"),
        )
        b = c.select(
            F.col("c_custkey").alias("id_b"),
            F.col("lat").alias("blat"),
            F.col("lon").alias("blon"),
        )
        eps = radius_join(
            a, b, 300.0, left_coords=("alat", "alon"), right_coords=("blat", "blon")
        ).filter(F.col("id_a") != F.col("id_b"))
        yield "spatial_eps_edges", eps.select(
            F.col("id_a").alias("a"), F.col("id_b").alias("b")
        )

    for name, raw in edge_sets():
        E0 = (
            raw.select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        n_edges = E0.count()
        # correctness first: identical root labels
        r_star, k_star = star_rounds(E0, jump=False)
        r_jump, k_jump = star_rounds(E0, jump=True)
        diff = (
            r_star.exceptAll(r_jump).count() + r_jump.exceptAll(r_star).count()
        )
        print(
            f"{name}: edges={n_edges} rounds star={k_star} jump={k_jump} "
            f"label-diff={diff}",
            flush=True,
        )
        assert diff == 0, f"{name}: pointer-jump labels diverge"
        for label, jump in (("star", False), ("jump", True)):
            walls = []
            for _ in range(n_samples):
                t0 = time.perf_counter()
                roots, k = star_rounds(E0, jump=jump)
                roots.write.format("noop").mode("overwrite").save()
                walls.append(round(time.perf_counter() - t0, 2))
                # NOTE: no blanket unpersist here — E0 is a truncated
                # localCheckpoint shared by all samples; per-round
                # checkpoint blocks are small at these edge counts.
            print(f"  {label}: rounds={k} walls={walls} min={min(walls)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
