#!/usr/bin/env python
"""Measured scaling curve for the dedup/ANN core (VERDICT r6 #5).

SCALE.md argues the 100 TB shapes analytically; this script measures
them: it synthesizes corpora K x the size of sf0.1's documents /
embeddings (inside the repo — the driver testdata is read-only), times
the five core operators at each scale, and prints the observed scaling
exponent  alpha = log(t_K / t_1) / log(K)  per query (alpha ~ 1 =
linear; the LSH/prefix designs should stay well under the ~2 of naive
all-pairs).

Corpus synthesis keeps the workload shape honest at K x:
- documents: K replicas of sf0.1; replica k > 0 applies a BIJECTIVE
  character rotation (Caesar-shift of [a-z] and [0-9] by k via
  ``translate``) so replicas share no letter-bearing shingles/grams —
  within-replica duplicate structure, doc lengths, and shingle-count
  distributions are preserved EXACTLY, and no artificial cross-replica
  similarity is created. (Two rejected alternatives, both measured
  super-linear by construction: a plain copy makes every doc a 64/64
  MinHash match of its clones; a per-token ``_r{k}`` suffix floods
  every replica with the same ultra-common ``_r{k}``-boundary shingles,
  which align per-band minima and fake an LSH mega-bucket — the very
  skew minhash_lsh_pairs' max_bucket guard exists for);
- embeddings: K replicas with offset vec_ids (brute-force cosine cost
  is row count; vector values don't change the work).

Usage:
    python scripts/scale_curve.py [--scales 1,5,10] [--runs 2]
        [--queries exact_span_dedup,...]   # targeted re-measure

Writes corpora under testdata_scaled/x{K}/ (reused if present) and
prints one JSON line per (query, scale) plus the exponent table to
stdout; paste the table into SCALE.md.
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
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard_prefix",
    "ann_cosine_topk",
    "exact_span_dedup",
]


def synthesize(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from pandas_etl_spark.sources import load_table

    dst = os.path.join(OUT, f"x{k}")
    if os.path.isdir(os.path.join(dst, "documents.parquet")) and os.path.isdir(
        os.path.join(dst, "embeddings.parquet")
    ):
        return dst
    docs = load_table(spark, BASE, "documents")
    embs = load_table(spark, BASE, "embeddings")
    doc_parts = []
    emb_parts = []
    letters = "abcdefghijklmnopqrstuvwxyz"
    digits = "0123456789"
    for r in range(k):
        if r == 0:
            salt = F.col("text")
        else:
            rot_from = letters + digits
            rot_to = (
                letters[r % 26 :]
                + letters[: r % 26]
                + digits[r % 10 :]
                + digits[: r % 10]
            )
            salt = F.translate(F.lower(F.col("text")), rot_from, rot_to)
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                salt.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        emb_parts.append(
            embs.select(
                (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    d.repartition(max(4, 4 * k)).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )
    e.repartition(max(4, 2 * k)).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )
    return dst


def main() -> int:
    scales = [1, 5, 10]
    runs = 2
    args = sys.argv[1:]
    if "--scales" in args:
        scales = [int(x) for x in args[args.index("--scales") + 1].split(",")]
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    core = list(CORE)
    if "--queries" in args:  # targeted re-measure (VERDICT r9 #3)
        core = args[args.index("--queries") + 1].split(",")

    from pandas_etl_spark.catalog import QUERIES
    from pandas_etl_spark.session import get_spark

    spark = get_spark("scale_curve")
    times: dict[str, dict[int, float]] = {q: {} for q in core}
    for k in sorted(scales):
        sf_dir = synthesize(spark, k)
        for q in core:
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
    # single-scale runs have no curve — print times without an exponent
    # column instead of dividing by log(1) (r7 ADVICE)
    with_exp = k0 != k1
    header = "\n| query | " + " | ".join(f"x{k} (s)" for k in sorted(scales))
    print(header + (" | exponent |" if with_exp else " |"))
    print("|---" * (len(scales) + (2 if with_exp else 1)) + "|")
    for q in core:
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
