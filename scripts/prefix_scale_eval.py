#!/usr/bin/env python
"""Measured scale curve for the prefix-sum statistics machinery and
the events family.

The range-partitioned distributed prefix sum (operators/prefix.py) is
the repo's substitute for every single-partition ORDER BY window —
~15 registered statistics ride it (Gini, Lorenz, weighted/exact
quantiles, Spearman, KS, percent_rank, ABC). Its scaling had never
been measured above sf0.1; this script measures it, plus the
event-stream family (sessionize, trailing actives) on replicated
events.

Replica semantics (honest K x):
- orders / lineitem / customer: consistent key offsets (the sf1_bench
  rule — each replica's facts join each replica's dims; per-key group
  sizes unchanged, key cardinality x K, so prefix-sum input size
  scales while per-partition windows stay bounded);
- events: user_id/event_id offsets — K x more users with unchanged
  per-user session structure (sessionize's per-user windows see the
  same partition sizes, there are just K x more partitions);
- part: key offsets to match lineitem.

Usage:
    python scripts/prefix_scale_eval.py [--scales 1,5,10] [--runs 1]
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
    # prefix-sum statistics (range-partitioned distributed prefix sums)
    "gini_revenue_concentration",
    "lorenz_deciles",
    "weighted_percentiles",
    "exact_quantiles_distributed",
    "percent_rank_cume",
    "spearman_corr_lineitem",
    "ks_price_drift",
    "pareto_abc_parts",
    # events family (per-user windows / distinct-collapse fan-out)
    "sessionize",
    "active_users_trailing_24h",
]
ORDER_OFF = 10_000_000
CUST_OFF = 1_000_000
PART_OFF = 10_000_000
USER_OFF = 10_000_000
EVENT_OFF = 100_000_000


def synthesize(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from pandas_etl_spark.sources import load_table

    dst = os.path.join(OUT, f"x{k}px")
    done = os.path.join(dst, "_DONE")
    if os.path.isfile(done):
        return dst
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

    replicate("orders", {"o_orderkey": ORDER_OFF, "o_custkey": CUST_OFF}, max(8, 4 * k))
    replicate("lineitem", {"l_orderkey": ORDER_OFF, "l_partkey": PART_OFF}, max(8, 4 * k))
    replicate("customer", {"c_custkey": CUST_OFF}, max(4, k))
    replicate("part", {"p_partkey": PART_OFF}, max(4, k))
    replicate("events", {"user_id": USER_OFF, "event_id": EVENT_OFF}, max(8, 4 * k))
    open(done, "w").close()
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

    spark = get_spark("prefix_scale_eval")
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
