"""Capture the physical plan of ONE connected-components star-contraction
round (the L->S frame) — the round loop is localCheckpoint-truncated out
of every consumer query's final plan, so the round shape needs its own
artifact. Usage: PYTHONPATH=<repo> python scripts/capture_cc_round_plan.py <suffix>
Writes plans/r10/cc_star_round_<suffix>.txt.

Replicates the body of functions/dedup._cc_star's loop over a tiny
checkpointed edge frame; the shape (exchanges, joins, windows,
aggregates) is what is being recorded, not the data.
"""
import os
import sys

suffix = sys.argv[1]
from pyspark.sql import functions as F

from pandas_etl_spark.session import get_spark

spark = get_spark(f"cc-round-{suffix}")
E = (
    spark.createDataFrame([(2, 1), (3, 1), (4, 2)], "a bigint, b bigint")
    .localCheckpoint()
)

# one round, exactly as _cc_star builds it (source-inlined so the capture
# works on both the pre- and post-fusion revisions)
import inspect

import pandas_etl_spark.functions.dedup as dd

src = inspect.getsource(dd._cc_star)
if "withColumn(\n                    \"m\"" in src or ".over(wa)" in src:
    from pyspark.sql import Window as W

    wa = W.partitionBy("a")
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
else:
    both = E.union(E.select(F.col("b").alias("a"), F.col("a").alias("b")))
    large_min = (
        both.groupBy("a")
        .agg(F.min("b").alias("nb"))
        .select("a", F.least("a", "nb").alias("m"))
    )
    L = (
        both.join(large_min, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
        # in execution the pre-fusion round localCheckpointed L here (its
        # own job); omitted for capture so the WHOLE round's plan is
        # visible in one explain — the note below records the difference
    )
    small_min = L.groupBy("a").agg(F.min("b").alias("m"))
    S = (
        L.join(small_min, "a")
        .filter(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .union(small_min.select("a", F.col("m").alias("b")))
        .distinct()
    )

mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
text = S._jdf.queryExecution().explainString(mode)
if suffix == "before":
    text = (
        "NOTE: pre-fusion round shown as ONE plan for comparability; in\n"
        "execution it was split into TWO jobs by an eager localCheckpoint\n"
        "of L (the large-star output), i.e. the operators below down to\n"
        "the first distinct ran as a separate materialization job per\n"
        "round. The post-fusion round runs as a single job.\n\n" + text
    )
out = os.path.join("plans", "r10", f"cc_star_round_{suffix}.txt")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    f.write(text)
print(f"wrote {out} ({len(text)} chars)")
spark.stop()
