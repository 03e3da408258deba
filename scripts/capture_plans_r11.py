"""Capture .explain("formatted") output for the r11-touched queries.

Usage: PYTHONPATH=<repo> python scripts/capture_plans_r11.py <out_suffix>
Writes plans/r11/<query>_<suffix>.txt for each query in TOUCHED.

Run once from a worktree at the r10 commit (suffix "before") and once
from HEAD (suffix "after"). Explain is lazy — no job runs except the
bounded query-construction collects some queries perform.
"""

from __future__ import annotations

import os
import sys

OUT_DIR = "/root/repo/plans/r11"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# queries whose physical plan changes in r11 (skew-safe salted df-cap /
# ownership attach; bootstrap single-pass; knn pre-rank; pq flatten)
TOUCHED = [
    # salted df-cap (count) family
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "ngram_jaccard_prefix",
    "curate_corpus",
    "winnow_pairs",
    "dedup_clusters",
    "dedup_multi_signal",
    "dedup_groups_planted",
    # salted ownership (min) family
    "exact_span_dedup",
    "span_dedup_incremental",
    "decontaminate_spans",
    # r11 audit targets
    "nearest_suppliers_knn",
    "bootstrap_ci_mean_price",
    "ann_pq_checked",
]


def main() -> None:
    suffix = sys.argv[1]
    from pandas_etl_spark.catalog import QUERIES
    from pandas_etl_spark.session import get_spark

    spark = get_spark(f"plans-r11-{suffix}")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in TOUCHED:
        try:
            df = QUERIES[name](spark, SF_DIR)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # capture the failure rather than abort
            text = f"ERROR capturing plan: {e!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
