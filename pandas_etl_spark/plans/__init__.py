"""Physical-plan introspection and linting.

The SURVEY blueprint's ``plans/`` component: programmatic access to the
properties this engine optimizes for — pushdown, pruning, broadcast
choices, Python-boundary crossings — so scale hygiene is checkable in
code (tests, CI, pipeline preflight) instead of by eyeballing
``explain`` output. tests/test_plans.py pins specific query shapes;
this module provides the generic tooling and a repo-wide red-flag lint.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Substrings whose presence in a physical plan is a scale bug in THIS
# codebase (each has a sanctioned alternative):
# - CartesianProduct: an unhinted cross product — O(n*m) shuffle-free
#   explosion; every deliberate pair generation here is bucketed or
#   broadcast.
# - BatchEvalPython: a row-at-a-time Python UDF on the hot path; the
#   sanctioned Python boundary is Arrow-batched (ArrowEvalPython /
#   mapInPandas / applyInPandas).
RED_FLAGS: dict[str, str] = {
    "CartesianProduct": "unbounded cross product (bucket or broadcast instead)",
    "BatchEvalPython": "row-at-a-time Python UDF (use a pandas_udf)",
}


def formatted_plan(df: DataFrame) -> str:
    """``explain('formatted')`` as a string (Spark only prints it)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def plan_summary(df: DataFrame) -> dict[str, object]:
    """Count the plan features that matter at scale. Keys:
    scans/exchanges/broadcast_joins/sortmerge_joins/python_evals/
    codegen_spans plus the pushed filters and read schemas per scan."""
    plan = formatted_plan(df)
    # Formatted explain prints every operator TWICE — once in the tree
    # ('+- Exchange (4)') and once as a detail header ('(4) Exchange') —
    # so operator counts must come from the tree section only or they
    # double (found live in review: a 1-exchange plan reported 2). After
    # execution AQE additionally prints BOTH '== Final Plan ==' and
    # '== Initial Plan ==' trees; count the final one only.
    # ReadSchema/PushedFilters live only in the detail section.
    tree = re.split(r"\n\(\d+\) ", plan, maxsplit=1)[0]
    if "== Final Plan ==" in tree:
        tree = tree.split("== Final Plan ==", 1)[1].split("== Initial Plan ==", 1)[0]
    # codegen spans appear as *(n) markers on the executed plan; under
    # AQE they only materialize after an action has finalized the plan,
    # so codegen_spans is 0 on a never-executed frame — run the frame
    # first when auditing codegen coverage
    executed = df._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    return {
        "scans": len(schemas),
        "exchanges": len(re.findall(r"\bExchange\b", tree)),
        "broadcast_joins": tree.count("BroadcastHashJoin"),
        "sortmerge_joins": tree.count("SortMergeJoin"),
        "shuffled_hash_joins": tree.count("ShuffledHashJoin"),
        "arrow_python_evals": tree.count("ArrowEvalPython")
        + tree.count("MapInPandas")
        + tree.count("FlatMapGroupsInPandas"),
        "row_python_evals": tree.count("BatchEvalPython"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", executed))),
        "pushed_filters": [p for p in pushed if p],
        "read_schemas": schemas,
    }


def lint(df: DataFrame) -> list[str]:
    """Red-flag lint of the physical plan: returns human-readable
    violations (empty list = clean). Cheap — builds the plan, runs
    nothing."""
    plan = formatted_plan(df)
    return [
        f"{flag}: {why}" for flag, why in RED_FLAGS.items() if flag in plan
    ]


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes with NO partition spec — the shape ``WindowExec``
    warns about at runtime ("No Partition Defined ... moving all data
    to a single partition"). Returns the window-function text of each
    offender (empty list = every window is partitioned). Legitimate
    only over provably tiny frames (1-row totals, |groups|-row offsets,
    |partitions|-row prefix boundaries); tests/test_plans.py keeps a
    by-name whitelist of those sites and fails on any new source.

    Formatted detail blocks print ``(n) Window`` then an Arguments line
    holding either three top-level bracket groups
    ``[funcs], [partition], [order]`` or just two. Two groups is
    ambiguous: a partitioned-but-unordered window prints
    ``[funcs], [partition]`` (no WindowExec warning) while an
    unpartitioned ordered one prints ``[funcs], [order]`` — only the
    latter is flagged, recognized by the sort-direction markers
    (``ASC``/``DESC``) Spark always prints in an order spec.
    """
    plan = formatted_plan(df)
    lines = plan.splitlines()
    out: list[str] = []
    for i, l in enumerate(lines):
        ls = l.strip()
        if not (ls.startswith("(") and ls.endswith(" Window")):
            continue
        for d in lines[i + 1 : i + 6]:
            ds = d.strip()
            if not ds.startswith("Arguments:"):
                continue
            groups, depth, cur = [], 0, []
            for ch in ds[len("Arguments:") :]:
                if ch == "[":
                    depth += 1
                    if depth == 1:
                        cur = []
                        continue
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        groups.append("".join(cur))
                        continue
                if depth >= 1:
                    cur.append(ch)
            if len(groups) == 2 and re.search(
                r"\b(?:ASC|DESC) NULLS", groups[1]
            ):
                out.append(groups[0])
            break
    return out
