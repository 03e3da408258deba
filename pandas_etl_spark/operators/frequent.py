"""Exact distributed heavy hitters with bounded shuffle (SURVEY §2.9 —
sketch-class custom operator).

The naive plan — groupBy(token) over the full corpus — shuffles every
distinct token. This operator shuffles only CANDIDATES:

1. **Local pass** (mapInPandas, vectorized ``value_counts``): each
   partition emits tokens whose local count exceeds ``N_p / (k+1)``
   (Misra–Gries-style support threshold) plus one row carrying the
   partition's total count.
2. **Pigeonhole guarantee**: any token with global count > ``N/(k+1)``
   must exceed the local threshold in at least one partition (if it were
   below it everywhere, its global count would be below the sum of
   thresholds = ``N/(k+1)``). With ``k = ceil(2/theta)`` every token at
   ratio ≥ theta/2 survives — a safety margin of 2 over the target.
3. **Exact recount**: tokens semi-join the (small, broadcast) candidate
   set, one groupBy over candidate rows only, filter to
   ``count >= ceil(theta * N)``.

Result is EXACT (identical to the full groupBy + HAVING), but the wide
shuffle carries only candidate tokens. Candidate volume is bounded by
k per partition; local memory is the per-partition distinct-token map
(Zipfian corpora keep this small; the same assumption Spark's own
``freqItems`` makes).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_tokens(
    tokens: DataFrame, col: str = "word", theta: float = 0.001
) -> DataFrame:
    """(word, n) for every token with global frequency >= theta of all
    rows — exact, two passes, candidate-only wide shuffle."""
    k = int(math.ceil(2.0 / theta))

    def local_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: pd.Series | None = None
        for pdf in batches:
            c = pdf[col].value_counts()
            counts = c if counts is None else counts.add(c, fill_value=0)
        if counts is None:
            return
        n_local = int(counts.sum())
        keep = counts[counts > n_local / (k + 1)]
        yield pd.DataFrame(
            {
                col: list(keep.index) + [None],
                "__local_n": [None] * len(keep) + [n_local],
            }
        )

    first = tokens.mapInPandas(
        local_candidates, f"{col} string, __local_n long"
    ).persist()
    try:
        # ONE action over the local pass: total row count + the (small,
        # bounded ≤ k·partitions) candidate list land on the driver
        agg = first.agg(
            F.sum("__local_n").alias("n"),
            F.collect_set(col).alias("cands"),
        ).collect()[0]
        total, cand_list = agg["n"] or 0, agg["cands"]
    finally:
        first.unpersist()
    threshold = int(math.ceil(theta * total))
    spark = tokens.sparkSession
    cands = spark.createDataFrame([(w,) for w in cand_list], f"{col} string")
    return (
        tokens.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )


def cms_heavy_hitters(
    tokens: DataFrame,
    col: str = "word",
    theta: float = 0.001,
    eps: float = 1e-4,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Count-min-sketch twin of :func:`frequent_tokens`: one
    ``count_min_sketch`` aggregate compresses the WHOLE token stream to
    a few-KB sketch (partial-merged map-side — nothing token-sized ever
    shuffles), the exact pass then supplies the candidate set and the
    sketch its estimates. Output (word, n, n_est) where the CMS
    guarantee holds: ``n <= n_est <= n + eps*N`` with probability
    ``confidence`` — asserted in tests.

    At 100 TB the sketch path answers "how hot is key X" for ANY x
    post-hoc without re-scanning; the exact operator remains the
    arbiter for the reported heavy-hitter SET (a CMS can only
    overestimate, so using it to select the set admits false
    positives)."""
    sk_row = tokens.agg(
        F.count_min_sketch(
            col, F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed)
        ).alias("sk")
    ).first()
    exact = frequent_tokens(tokens, col, theta)
    spark = tokens.sparkSession
    if sk_row is None or sk_row["sk"] is None:
        return exact.withColumn("n_est", F.col("n"))
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_row["sk"])
    )
    rows = exact.collect()  # bounded: <= 1/theta heavy hitters by definition
    out = [(r[col], r["n"], int(cms.estimateCount(r[col]))) for r in rows]
    return spark.createDataFrame(
        out, f"{col} string, n bigint, n_est bigint"
    )
