#!/usr/bin/env python
"""Measured scale curve for the graph/iterative family.

The r7 curve measured the dedup/ANN core; the graph family (triangle
census, label propagation, BFS, weighted shortest paths, density-based
spatial clustering, star-contraction connected components) was only
plan-audited above sf0.1. This script measures it: x{K} corpora where
every graph grows as K DISJOINT copies — the honest "K x more data"
shape (TPC-H scaling adds more parts/orders; it does not densify the
co-purchase neighborhood of an existing part):

- lineitem: K replicas with l_orderkey AND l_partkey offsets, so each
  replica's orders contain each replica's parts — per-order fan-out
  (<= C(7,2) pairs) unchanged, node and edge counts x K, and the
  iterative algorithms' round counts stay O(log component) with
  component sizes unchanged;
- part / customer: matching key offsets (BFS seeds, path targets and
  spatial points scale with the graph);
- documents: the scale_curve bijective rotation corpus (dedup_clusters
  runs star-contraction CC over its exact-duplicate clusters —
  within-replica cluster structure preserved exactly).

Usage:
    python scripts/graph_scale_eval.py [--scales 1,5,10] [--runs 1]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "testdata_scaled",
)
CORE = [
    "triangle_count_parts",
    "community_parts_lpa",
    "bfs_reach_parts",
    "cheapest_paths_parts",
    "spatial_cluster_eps",
    "dedup_clusters",
]
ORDER_OFF = 10_000_000
PART_OFF = 10_000_000
CUST_OFF = 1_000_000


def synthesize(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from pandas_etl_spark.sources import load_table
    from scripts.scale_curve import synthesize as doc_synth

    dst = os.path.join(OUT, f"x{k}graph")
    done = os.path.join(dst, "_DONE")
    if not os.path.isfile(done):
        os.makedirs(dst, exist_ok=True)

        def replicate(name, key_shifts, parts_n):
            base = load_table(spark, BASE, name)
            frames = []
            for r in range(k):
                cols = [
                    (F.col(c) + r * off).alias(c) if r else F.col(c)
                    for c, off in key_shifts.items()
                ]
                keep = [c for c in base.columns if c not in key_shifts]
                frames.append(base.select(*cols, *keep))
            df = frames[0]
            for p in frames[1:]:
                df = df.unionByName(p)
            df.repartition(parts_n).write.mode("overwrite").parquet(
                os.path.join(dst, f"{name}.parquet")
            )

        replicate(
            "lineitem",
            {"l_orderkey": ORDER_OFF, "l_partkey": PART_OFF},
            max(8, 4 * k),
        )
        replicate("part", {"p_partkey": PART_OFF}, max(4, k))
        replicate("customer", {"c_custkey": CUST_OFF}, max(4, k))
        open(done, "w").close()
    # documents via the rotation corpus (shared with scale_curve runs)
    docs_src = os.path.join(doc_synth(spark, k), "documents.parquet")
    docs_dst = os.path.join(dst, "documents.parquet")
    # lexists: a stale symlink (rotation corpus regenerated elsewhere)
    # fails os.path.exists but still blocks os.symlink — relink it
    if os.path.lexists(docs_dst) and not os.path.exists(docs_dst):
        os.unlink(docs_dst)
    if not os.path.lexists(docs_dst):
        os.symlink(docs_src, docs_dst)
    return dst


def main() -> int:
    scales = [1, 5, 10]
    runs = 1
    args = sys.argv[1:]
    if "--scales" in args:
        scales = [int(x) for x in args[args.index("--scales") + 1].split(",")]
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])

    from pandas_etl_spark.catalog import QUERIES
    from pandas_etl_spark.session import get_spark

    spark = get_spark("graph_scale_eval")
    times: dict[str, dict[int, float]] = {q: {} for q in CORE}
    for k in sorted(scales):
        sf_dir = synthesize(spark, k)
        for q in CORE:
            best = math.inf
            for _ in range(runs + 1):  # first run pays codegen; keep min
                spark.catalog.clearCache()
                t0 = time.time()
                QUERIES[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            times[q][k] = round(best, 3)
            print(json.dumps({"query": q, "scale": k, "sec": times[q][k]}))
    k0, k1 = min(scales), max(scales)
    with_exp = k0 != k1  # single-scale runs have no curve (r7 ADVICE)
    header = "\n| query | " + " | ".join(f"x{k} (s)" for k in sorted(scales))
    print(header + (" | exponent |" if with_exp else " |"))
    print("|---" * (len(scales) + (2 if with_exp else 1)) + "|")
    for q in CORE:
        row = f"| {q} | " + " | ".join(
            str(times[q][k]) for k in sorted(scales)
        )
        if with_exp:
            alpha = math.log(times[q][k1] / times[q][k0]) / math.log(k1 / k0)
            row += f" | {alpha:.2f} |"
        else:
            row += " |"
        print(row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
