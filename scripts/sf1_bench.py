#!/usr/bin/env python
"""sf1 bench point for the relational headline core (VERDICT r7 #4).

The r7 scale curve measured the dedup/ANN core on synthetic ×5/×10
document corpora; the TPC-H-ish relational headline had never been
timed above sf0.1. This script synthesizes an sf1-equivalent dir
(×10 sf0.1) inside the repo — the driver testdata is read-only — and
times the five headline-core queries at both scales, printing the
wall-times and observed exponents for SCALE.md.

Replica semantics keep every join's SHAPE honest at ×10:
- lineitem / orders / customer: 10 replicas with consistent key
  offsets (orderkey += r·10^7 on BOTH lineitem and orders,
  custkey += r·10^6 on BOTH orders and customer), so each replica's
  facts join each replica's dims — per-row join fan-out is unchanged,
  total volume is ×10, exactly how TPC-H itself scales.
- supplier / nation: fixed dims (broadcast sides stay broadcast).
- documents: the scale_curve bijective character-rotation replicas
  (within-replica duplicate structure preserved, no fake cross-replica
  similarity).

Usage:
    python scripts/sf1_bench.py [--runs 2]
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
    "sf1",
)
CORE = [
    "pricing_summary",
    "nation_revenue",
    "dedup_exact",
    "minhash_lsh_pairs",
    "curate_corpus",
]
K = 10
ORDER_OFF = 10_000_000
CUST_OFF = 1_000_000


def synthesize(spark) -> str:
    from pyspark.sql import functions as F

    from pandas_etl_spark.sources import load_table

    done = os.path.join(OUT, "_DONE")
    if os.path.isfile(done):
        return OUT

    def replicate(name, key_shifts):
        base = load_table(spark, BASE, name)
        parts = []
        for r in range(K):
            cols = [
                (F.col(c) + r * off).alias(c) if r else F.col(c)
                for c, off in key_shifts.items()
            ]
            keep = [c for c in base.columns if c not in key_shifts]
            parts.append(base.select(*cols, *keep))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.repartition(32).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{name}.parquet")
        )

    replicate("lineitem", {"l_orderkey": ORDER_OFF})
    replicate("orders", {"o_orderkey": ORDER_OFF, "o_custkey": CUST_OFF})
    replicate("customer", {"c_custkey": CUST_OFF})
    # part + events (r10): lets the single-node pandas baseline and the
    # window/session/asof headline queries run at sf1 too. Replicas get
    # their own part keys / users+events, so per-key group sizes and
    # join fan-outs keep their sf0.1 shape — volume x10, skew unchanged.
    replicate("part", {"p_partkey": ORDER_OFF})
    replicate("events", {"event_id": ORDER_OFF, "user_id": CUST_OFF})
    for dim in ("supplier", "nation", "region"):
        load_table(spark, BASE, dim).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{dim}.parquet")
        )
    # documents: reuse the scale-curve rotation corpus (×10)
    from scripts.scale_curve import synthesize as doc_synth

    x10 = doc_synth(spark, K)
    docs_dst = os.path.join(OUT, "documents.parquet")
    if not os.path.exists(docs_dst):
        os.symlink(os.path.join(x10, "documents.parquet"), docs_dst)
    with open(done, "w") as fh:
        fh.write("ok")
    return OUT


def main() -> int:
    runs = 2
    args = sys.argv[1:]
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])

    from pandas_etl_spark.catalog import QUERIES
    from pandas_etl_spark.session import get_spark

    spark = get_spark("sf1_bench")
    synthesize(spark)
    times: dict[str, dict[str, float]] = {q: {} for q in CORE}
    for label, sf_dir in (("sf0.1", BASE), ("sf1", OUT)):
        for q in CORE:
            best = math.inf
            for _ in range(runs + 1):  # first run pays codegen; keep min
                spark.catalog.clearCache()
                t0 = time.time()
                QUERIES[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            times[q][label] = round(best, 3)
            print(json.dumps({"query": q, "sf": label, "sec": times[q][label]}))
    print("\n| query | sf0.1 (s) | sf1 (s) | exponent |")
    print("|---|---|---|---|")
    for q in CORE:
        t0, t1 = times[q]["sf0.1"], times[q]["sf1"]
        alpha = math.log(t1 / t0) / math.log(10)
        print(f"| {q} | {t0} | {t1} | {alpha:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
