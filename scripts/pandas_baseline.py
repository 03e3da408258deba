#!/usr/bin/env python
"""Single-node pandas baseline for the reference-surface headline queries.

The goal statement judges this repo against the reference's single-node
throughput at the same data scale — but the reference
(righteouslabs/pandas-etl) publishes no numbers and ships no operators:
it is a YAML orchestrator that delegates every transformation to pandas
(/root/reference/pandas_etl/etl.py — steps call pandas methods
directly). Its single-node throughput on any query IS pandas's
throughput on the idiomatic pandas formulation. This script measures
exactly that: for each reference-surface headline query (the relational
band of bench.py's HEADLINE — the north-star LSH/ANN additions have no
reference counterpart), an idiomatic pandas implementation (the code a
pandas-etl user would put in their YAML steps) is

1. VALIDATED against the same DuckDB oracle the Spark engine is graded
   on (row count + rounded sorted-value checksum at --validate-sf), and
2. TIMED min-of-3 at --sf (default sf0.1, the bench scale), each run
   including the parquet read — the Spark bench re-scans per run too.

Output: one JSON line {"metric": "pandas_single_node_headline", ...}
plus a markdown table to paste into BASELINE.md.

Usage:
    python scripts/pandas_baseline.py [--sf /root/testdata/sf0.1]
        [--validate-sf /root/testdata/sf0.01] [--runs 3] [--no-validate]
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_STOP_EN = ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"]
_PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"


def _read(sf_dir: str, table: str, columns=None) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def q_pricing_summary(sf: str) -> pd.DataFrame:
    li = _read(sf, "lineitem", [
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    ])
    m = li[li["l_shipdate"] <= pd.Timestamp("1998-09-02")].copy()
    m["sum_disc_price"] = m["l_extendedprice"] * (1 - m["l_discount"])
    m["sum_charge"] = m["sum_disc_price"] * (1 + m["l_tax"])
    g = m.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("sum_disc_price", "sum"),
        sum_charge=("sum_charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_quantity", "size"),
    )
    return g


def q_top_revenue_orders(sf: str) -> pd.DataFrame:
    c = _read(sf, "customer", ["c_custkey", "c_mktsegment"])
    o = _read(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    c = c[c["c_mktsegment"] == "BUILDING"]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    j["revenue"] = j["l_extendedprice"] * (1 - j["l_discount"])
    g = j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"], as_index=False)[
        "revenue"
    ].sum()
    g = g.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return g[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]]


def q_nation_revenue(sf: str) -> pd.DataFrame:
    li = _read(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    o = _read(sf, "orders", ["o_orderkey", "o_custkey"])
    c = _read(sf, "customer", ["c_custkey", "c_nationkey"])
    s = _read(sf, "supplier", ["s_suppkey", "s_nationkey"])
    n = _read(sf, "nation", ["n_nationkey", "n_name"])
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j["c_nationkey"] == j["s_nationkey"]]
    j = j.merge(n, left_on="s_nationkey", right_on="n_nationkey")
    j["revenue"] = j["l_extendedprice"] * (1 - j["l_discount"])
    return j.groupby("n_name", as_index=False)["revenue"].sum()


def q_window_topk_per_group(sf: str) -> pd.DataFrame:
    p = _read(sf, "part", ["p_brand", "p_partkey", "p_name", "p_retailprice"])
    p = p.sort_values(["p_brand", "p_retailprice", "p_partkey"], ascending=[True, False, True])
    p["rn"] = p.groupby("p_brand").cumcount() + 1
    return p[p["rn"] <= 3]


def q_window_running_total(sf: str) -> pd.DataFrame:
    o = _read(sf, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    g = o.groupby("o_custkey")
    o["running_spent"] = g["o_totalprice"].cumsum()
    o["order_seq"] = g.cumcount() + 1
    return o


def q_rollup_totals(sf: str) -> pd.DataFrame:
    li = _read(sf, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    lvl2 = li.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("l_quantity", "sum"), n=("l_quantity", "size")
    )
    lvl1 = li.groupby(["l_returnflag"], as_index=False).agg(
        sum_qty=("l_quantity", "sum"), n=("l_quantity", "size")
    )
    lvl1["l_linestatus"] = None
    lvl0 = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "sum_qty": [li["l_quantity"].sum()],
            "n": [len(li)],
        }
    )
    return pd.concat([lvl2, lvl1, lvl0], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "sum_qty", "n"]
    ]


def _sessions(sf: str) -> pd.DataFrame:
    ev = _read(sf, "events", ["user_id", "ts", "value", "event_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    gap = ev.groupby("user_id")["ts"].diff().dt.total_seconds()
    ev["new_sess"] = ((gap.isna()) | (gap > 1800)).astype("int64")
    ev["session_id"] = ev.groupby("user_id")["new_sess"].cumsum()
    return ev


def q_sessionize(sf: str) -> pd.DataFrame:
    ev = _sessions(sf)
    return ev.groupby(["user_id", "session_id"], as_index=False).agg(
        n_events=("value", "size"),
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        total_value=("value", "sum"),
    )


def q_session_window_agg(sf: str) -> pd.DataFrame:
    ev = _sessions(sf)
    g = ev.groupby(["user_id", "session_id"], as_index=False).agg(
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        n_events=("value", "size"),
        total_value=("value", "sum"),
    )
    g["session_end"] = g["session_end"] + pd.Timedelta(seconds=1800)
    return g[["user_id", "session_start", "session_end", "n_events", "total_value"]]


def q_asof_join_events(sf: str) -> pd.DataFrame:
    ev = _read(sf, "events", ["event_id", "user_id", "ts", "value", "event_type"])
    clicks = (
        ev[ev["event_type"] == "click"]
        .sort_values("event_id")
        .groupby(["user_id", "ts"], as_index=False)
        .last()[["user_id", "ts", "value"]]
        .rename(columns={"value": "click_value"})
    )
    purchases = ev[ev["event_type"] == "purchase"][
        ["event_id", "user_id", "ts", "value"]
    ]
    out = pd.merge_asof(
        purchases.sort_values("ts"),
        clicks.sort_values("ts").rename(columns={"ts": "ts_click"}),
        left_on="ts",
        right_on="ts_click",
        by="user_id",
        direction="backward",
    )
    return out[["event_id", "user_id", "ts", "value", "click_value", "ts_click"]]


def q_dedup_exact(sf: str) -> pd.DataFrame:
    d = _read(sf, "documents", ["doc_id", "lang", "source", "text"])
    norm = (
        d["text"].str.strip().str.lower().str.replace(r"\s+", " ", regex=True)
    )
    fp = norm.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
    keep = d.assign(fp=fp).groupby("fp")["doc_id"].min()
    return d[d["doc_id"].isin(keep)][["doc_id", "lang", "source"]]


def _tok_stats(d: pd.DataFrame) -> pd.DataFrame:
    toks = d["text"].str.strip().str.lower().str.split(r"\s+")
    toks = toks.map(lambda ts: [t for t in ts if t])
    n_tokens = toks.str.len().astype("int64")
    n_chars = d["text"].str.len().astype("int64")
    n_punct = d["text"].str.count(_PUNCT_RE)
    punct_ratio = n_punct / np.maximum(n_chars, 1)
    stop = set(_STOP_EN)
    hits = toks.map(lambda ts: sum(1 for t in ts if t in stop))
    stopword_ratio = hits / np.maximum(n_tokens, 1)
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"],
            "n_tokens": n_tokens,
            "n_chars_computed": n_chars,
            "punct_ratio": punct_ratio.astype("float64"),
            "stopword_ratio_en": stopword_ratio.astype("float64"),
        }
    )


def q_doc_stats(sf: str) -> pd.DataFrame:
    return _tok_stats(_read(sf, "documents", ["doc_id", "text"]))


def q_quality_score(sf: str) -> pd.DataFrame:
    s = _tok_stats(_read(sf, "documents", ["doc_id", "text"]))
    quality = (
        0.4 * np.minimum(s["n_tokens"].astype("float64") / 20.0, 1.0)
        + 0.3 * (1.0 - np.minimum(s["punct_ratio"] * 5, 1.0))
        + 0.3 * np.minimum(s["stopword_ratio_en"] * 10, 1.0)
    )
    return pd.DataFrame({"doc_id": s["doc_id"], "quality": quality})


def q_ewm_mean(sf: str) -> pd.DataFrame:
    ev = _read(sf, "events", ["user_id", "event_id", "ts", "value", "event_type"])
    ev = ev[ev["event_type"] == "purchase"].sort_values(["user_id", "ts", "event_id"])
    ewm = (
        ev.groupby("user_id")["value"]
        .ewm(alpha=0.2, adjust=False)
        .mean()
        .reset_index(level=0, drop=True)
    )
    ev["ewm_value"] = ewm.round(6)
    return ev[["user_id", "event_id", "value", "ewm_value"]]


PD_QUERIES = {
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "nation_revenue": q_nation_revenue,
    "window_topk_per_group": q_window_topk_per_group,
    "window_running_total": q_window_running_total,
    "rollup_totals": q_rollup_totals,
    "sessionize": q_sessionize,
    "session_window_agg": q_session_window_agg,
    "asof_join_events": q_asof_join_events,
    "dedup_exact": q_dedup_exact,
    "doc_stats": q_doc_stats,
    "quality_score": q_quality_score,
    "ewm_mean": q_ewm_mean,
}


def _checksum(pdf: pd.DataFrame) -> tuple[int, str]:
    """Order/column-name-insensitive rounded value checksum (rows, hex)."""
    cols = sorted(pdf.columns)
    rows = []
    for _, r in pdf[cols].iterrows():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float) or isinstance(v, np.floating):
                vals.append("null" if pd.isna(v) else f"{round(float(v), 4):.4f}")
            elif pd.isna(v) if not isinstance(v, (list, np.ndarray)) else False:
                vals.append("null")
            elif isinstance(v, pd.Timestamp):
                vals.append(v.isoformat())
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return len(rows), hashlib.md5("\n".join(rows).encode()).hexdigest()


def validate(name: str, vsf: str) -> str | None:
    from pandas_etl_spark.catalog import ORACLES
    from tests.oracle_harness import run_oracle

    mine = PD_QUERIES[name](vsf)
    oracle = run_oracle(ORACLES[name], vsf)
    n1, h1 = _checksum(mine)
    n2, h2 = _checksum(oracle)
    if n1 != n2:
        return f"rows {n1} != oracle {n2}"
    if h1 != h2:
        return f"value checksum mismatch over {n1} rows"
    return None


def main() -> int:
    argv = sys.argv[1:]

    def _opt(flag, default):
        return argv[argv.index(flag) + 1] if flag in argv else default

    sf = _opt("--sf", "/root/testdata/sf0.1")
    vsf = _opt("--validate-sf", "/root/testdata/sf0.01")
    runs = int(_opt("--runs", "3"))
    do_validate = "--no-validate" not in argv

    bad = 0
    if do_validate:
        for name in PD_QUERIES:
            problem = validate(name, vsf)
            tag = "ok" if problem is None else f"MISMATCH ({problem})"
            print(f"validate {name}: {tag}", file=sys.stderr)
            bad += problem is not None
        if bad:
            print(f"pandas_baseline: {bad} validation failures — not timing", file=sys.stderr)
            return 1

    times: dict[str, float] = {}
    for name, fn in PD_QUERIES.items():
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(sf)
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        print(f"time {name}: {times[name]}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    sf_tag = sf.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "pandas_single_node_headline",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf_tag) if sf_tag.replace(".", "").isdigit() else sf_tag,
        "validated_vs_oracle_at": vsf if do_validate else None,
        "runs": runs,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
