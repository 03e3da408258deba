#!/usr/bin/env python
"""Regenerate registry-count lines in the docs from the LIVE registry
(VERDICT r4 #9: drifted hand-maintained counts erode trust — generate
them). Rewrites every line carrying the `<!-- counts:auto -->` marker;
tests/test_robustness.py::test_doc_counts_match_registry fails the
suite when a marked line goes stale."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandas_etl_spark.catalog import ORACLES, QUERIES  # noqa: E402

MARK = "<!-- counts:auto -->"


def counts_line() -> str:
    return (
        f"  `oracle_sql()` ({len(QUERIES)} queries, {len(ORACLES)} "
        f"oracle-checked). {MARK}"
    )


def main() -> None:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    lines = open(path).read().splitlines()
    out = [counts_line() if MARK in l else l for l in lines]
    open(path, "w").write("\n".join(out) + "\n")
    n = sum(1 for l in out if MARK in l)
    print(f"README.md: {n} marked line(s) -> {len(QUERIES)} queries / {len(ORACLES)} oracles")
    assert n > 0, "no counts:auto marker found"


if __name__ == "__main__":
    main()
