#!/usr/bin/env python
"""Skew-stress study (VERDICT r4 #3): when does explicit salting beat
AQE's skew-join split on a hot-key shuffled join?

Builds the same deterministic zipf fact/dim pair as the
skew_zipf_join_* catalog queries (P[k=1] = 1 - 2^(-1/e) for zipf
exponent e), forces a shuffled join (broadcast disabled), and times:

- aqe_off            : plain join, adaptive execution off — the
                       unmitigated hot reducer
- aqe_default        : adaptive on with DEFAULT skew thresholds
                       (256 MB skewedPartitionThresholdInBytes — at
                       local scale the hot partition is far below it,
                       so no split happens; models an untuned cluster)
- aqe_tuned          : skew thresholds scaled to the data (1 MB
                       threshold / advisory size, factor 2) so the
                       split actually engages — models a properly
                       tuned 100 TB cluster where the hot partition
                       exceeds the default threshold organically
- salted_n{4,8,16}   : operators/skew.salted_join with AQE off —
                       isolates the salting effect

Timing = min of 2 runs after one warm-up execution of the plan family.
Results are recorded in SCALE.md ("skew crossover" section).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pandas_etl_spark.operators.skew import salted_join  # noqa: E402
from pandas_etl_spark.session import get_spark  # noqa: E402

N_FACT = int(os.environ.get("SKEW_N_FACT", 8_000_000))
N_DIM = int(os.environ.get("SKEW_N_DIM", 400_000))
EXPONENTS = [0.5, 0.8, 1.2]  # P[k=1] = 1 - 2^(-1/e) ≈ 75%, 58%, 44%


def build(spark, e: float):
    # shared builder with the catalog pair (review r5 #8) — the study
    # and the oracle-checked queries exercise the exact same shapes
    from pandas_etl_spark.operators.skew import zipf_fact_dim

    return zipf_fact_dim(spark, N_FACT, N_DIM, exponent=e)


def agg(joined):
    return joined.groupBy("attr").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("v").cast("bigint").alias("sum_v"),
    )


def timed(df) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def set_confs(spark, confs: dict[str, str]):
    for k, v in confs.items():
        spark.conf.set(k, v)


AQE_DEFAULTS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
}
AQE_TUNED = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
}


def main():
    spark = get_spark("skew_stress", shuffle_partitions=32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    results = {}
    for e in EXPONENTS:
        fact, dim = build(spark, e)
        hot = fact.filter(F.col("k") == 1).count() / N_FACT
        row = {"hot_key_share": round(hot, 3)}

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        timed(agg(fact.join(dim, "k")))  # warm-up (codegen)
        row["aqe_off"] = timed(agg(fact.join(dim, "k")))
        for name, confs in (("aqe_default", AQE_DEFAULTS), ("aqe_tuned", AQE_TUNED)):
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            set_confs(spark, confs)
            row[name] = timed(agg(fact.join(dim, "k")))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for n in (4, 8, 16):
            row[f"salted_n{n}"] = timed(agg(salted_join(fact, dim, on="k", n=n)))
        results[f"zipf_e{e}"] = row
        print(json.dumps({f"zipf_e{e}": row}), flush=True)
    print("FINAL " + json.dumps(results))


if __name__ == "__main__":
    main()
