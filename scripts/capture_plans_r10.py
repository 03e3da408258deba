"""Capture .explain("formatted") output for the r10-touched queries.

Usage: PYTHONPATH=<repo> python scripts/capture_plans_r10.py <out_suffix>
Writes plans/r10/<query>_<suffix>.txt for each query in TOUCHED.

Run once from the r9 worktree (suffix "before") and once from HEAD
(suffix "after"). Explain is lazy — no job runs except the bounded
query-construction collects some queries perform (k-means seeds etc.).
"""

from __future__ import annotations

import os
import sys

OUT_DIR = "/root/repo/plans/r10"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# queries whose physical plan changed in r10 (shingle-pipeline fusion,
# window-fused df caps, flattened fixed-dim cosine scorers)
TOUCHED = [
    "minhash_lsh_pairs",
    "curate_corpus",
    "ngram_jaccard_pairs",
    "ngram_jaccard_prefix",
    "winnow_pairs",
    "dedup_multi_signal",
    "ann_cosine_topk",
    "semantic_knn_communities",
    "semantic_decontaminate",
    "semantic_dedup_checked",
    "knn_label_noise",
    "knn_label_transfer",
    # span/segment family fusion (second wave of the round; "before" for
    # these three was captured from the pre-fusion r10 commit 8bf022c —
    # the family was untouched between r9 and that commit)
    "exact_span_dedup",
    "span_dedup_incremental",
    "segment_neardup",
]


def main() -> None:
    suffix = sys.argv[1]
    from pandas_etl_spark.catalog import QUERIES
    from pandas_etl_spark.session import get_spark

    spark = get_spark(f"plans-r10-{suffix}")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in TOUCHED:
        try:
            df = QUERIES[name](spark, SF_DIR)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # capture the failure rather than abort the sweep
            text = f"ERROR capturing plan: {e!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
