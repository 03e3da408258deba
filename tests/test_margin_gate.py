"""Float rounding-boundary margin audit as a CI gate (VERDICT r9 #5).

The drift-ladder method (scripts/float_margin_audit.py, MARGINS.md) is
the repo's determinism backbone: a query whose pre-round value sits
within summation-order drift of a rounding half-boundary can flip a
driver hash across sessions (the pca_power r8 red row). Until r10 the
audit was a round-ritual script; this module makes it a pytest gate:

- ``test_audit_flags_injected_boundary_pin`` proves the machinery goes
  RED on a planted near-boundary pin (a gate that cannot fail is not a
  gate);
- ``test_watchlist_and_touched_margins_no_new_thin`` runs the audit at
  sf0.001 over the dispositioned baseline + the MARGINS.md WATCH list +
  the round's TOUCHED list and fails on any NEW thin row or any
  unauditable oracle — a freshly-registered or freshly-edited oracle
  with a sub-threshold margin is caught the round it lands, with the
  drift-ladder classification (MARGINS.md) as the triage doc;
- the full-registry version (331 queries, ~3 min DuckDB-only) runs when
  SPARK_GRAFT_FULL_MARGIN_AUDIT=1 — the closing-gates ritual recorded
  in SCALE.md each round.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from tests.oracle_harness import run_oracle

_SF = "/root/testdata/sf0.001"
_THRESHOLD = 1e4


def _audit_module():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "float_margin_audit", os.path.join(repo, "scripts", "float_margin_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Dispositioned thin rows at sf0.001 (measured r10; every name maps to a
# MARGINS.md drift-ladder class — D deterministic per-row/ordered-fold,
# S scan-order aggregate on the empirically-stable WATCH list, I
# iterative with pins moved r9). A name here is ALLOWED to audit thin;
# anything else auditing thin is a regression.
BASELINE_THIN_SF0001 = {
    "outlier_mad": "D",  # per-row (v - med)/mad division
    "resample_interpolate": "D",  # per-row lerp
    "asof_nearest_click": "D",  # epoch-seconds passthrough
    "pricing_summary": "S-WATCH",
    "agg_stats": "S (pins moved r9: var 1e-2)",
    "cube_totals": "S-WATCH",
    "time_bucket_month": "S-WATCH",
    "math_case_when": "D",  # per-row sqrt/ln
    "describe_stats": "S-WATCH",
    "embedding_standardize": "D",  # per-row (v-mu)/sd on pinned moments
    "seasonal_decompose_hourly": "D",  # ordered fold on pinned hour means
    "bootstrap_ci_mean_price": "S-WATCH",
    "holt_trend_daily": "D",  # ordered recurrence over S daily aggs
    "theil_sen_trend": "D",  # median selection
    "cusum_revenue_shift": "D",  # ordered fold
    "mann_kendall_trend": "D",  # integer-count formula
    "trajectory_length_daily": "S-WATCH",
}

# MARGINS.md WATCH rows that happened NOT to audit thin at sf0.001 —
# still re-audited every run so a data- or code-shift that thins them
# is caught here first.
WATCHLIST = [
    "unpivot_metrics",
    "pivot_margins",
    "tpch_q19_disjunctive",
    "tpch_q17_small_quantity",
    "moment_stats",
    "benford_price_audit",
    "pca_power_top_component",
    "geomean_udaf",
    "croston_intermittent_demand",
    "pct_change",
]

# Oracles touched since the last round — update when editing an oracle's
# final-select arithmetic or its pins (the slim gate audits these plus
# the baseline/watch rows; the full registry runs under
# SPARK_GRAFT_FULL_MARGIN_AUDIT=1).
TOUCHED_THIS_ROUND = [
    "pca_power_top_component",  # r10: driver pins -> half-away rounding
    "stream_hll_ingest_checked",  # r10: total batch split under null ts
    "ann_ivf_checked",  # r10: empty-centroid guard
]


def _run_gate(names: list[str]) -> tuple[dict[str, float], list[str]]:
    mod = _audit_module()
    from pandas_etl_spark.catalog import ORACLES

    thin: dict[str, float] = {}
    unauditable: list[str] = []
    for n in names:
        entry = mod.audit_one(ORACLES[n], _SF, run_oracle)
        if entry.get("unauditable"):
            unauditable.append(f"{n}: {entry['status']}")
            continue
        worst = entry.get("worst_ulps")
        if worst is not None and worst < _THRESHOLD:
            thin[n] = worst
    return thin, unauditable


# ~100 ulps from the 1e-6 half-boundary at magnitude 1000: the 6th
# decimal digit forces grid k=6, and the 1.14e-5 boundary offset is
# ~100x ulp(1000) — squarely sub-threshold but 100x above the double's
# own representation slop at y = v*1e6 (ulp(1e9) ~ 1.2e-7).
_NEAR_BOUNDARY = "1000.1234565000114"


def test_audit_flags_injected_boundary_pin():
    """Red-on-injection proof: a final-select round() whose pre-round
    value sits ~100 ulps from a 1e-6 half-boundary must be flagged
    thin; the same value pinned upstream in a CTE (dead-center of its
    cell) must classify PINNED-safe."""
    mod = _audit_module()
    bad = f"SELECT round({_NEAR_BOUNDARY}, 6) AS x FROM region WHERE r_regionkey = 0"
    entry = mod.audit_one(bad, _SF, run_oracle)
    assert entry["status"] == "ok", entry
    assert entry["worst_ulps"] is not None and entry["worst_ulps"] < _THRESHOLD, entry

    # dead-center control: the CTE pin survives stripping (only the
    # final region is stripped), so the audited value sits half-a-cell
    # from any boundary
    safe = (
        f"WITH p AS (SELECT round({_NEAR_BOUNDARY}, 6) AS v "
        "FROM region WHERE r_regionkey = 0) "
        "SELECT round(v, 6) AS x FROM p"
    )
    entry = mod.audit_one(safe, _SF, run_oracle)
    assert entry["status"] == "ok", entry
    assert entry["worst_ulps"] is None or entry["worst_ulps"] >= _THRESHOLD, entry


def test_audit_strips_every_union_branch():
    """ADVICE r9: a final top-level UNION ALL chain must have round()
    stripped from EVERY branch, not just the last — otherwise earlier
    branches classify PINNED and a thin margin hides."""
    mod = _audit_module()
    sql = (
        f"SELECT round({_NEAR_BOUNDARY}, 6) AS x FROM region WHERE r_regionkey = 0 "
        "UNION ALL SELECT round(42.123457, 6) AS x FROM region WHERE r_regionkey = 1"
    )
    stripped = mod.strip_final_rounds(sql)
    assert "round" not in stripped.lower(), stripped
    entry = mod.audit_one(sql, _SF, run_oracle)
    assert entry["status"] == "ok", entry
    assert entry["worst_ulps"] is not None and entry["worst_ulps"] < _THRESHOLD, entry


def test_watchlist_and_touched_margins_no_new_thin():
    names = sorted(
        set(BASELINE_THIN_SF0001) | set(WATCHLIST) | set(TOUCHED_THIS_ROUND)
    )
    thin, unauditable = _run_gate(names)
    assert not unauditable, f"unauditable oracles: {unauditable}"
    new_thin = {n: u for n, u in thin.items() if n not in BASELINE_THIN_SF0001}
    assert not new_thin, (
        f"NEW sub-{_THRESHOLD:.0e}-ulp margins (classify against the "
        f"MARGINS.md drift ladder before allowlisting): {new_thin}"
    )


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FULL_MARGIN_AUDIT") != "1",
    reason="full 331-query audit (~3 min) runs in the closing-gates "
    "ritual: SPARK_GRAFT_FULL_MARGIN_AUDIT=1",
)
def test_full_registry_margins_no_new_thin():
    from pandas_etl_spark.catalog import ORACLES, QUERIES

    names = [n for n in QUERIES if n in ORACLES]
    thin, unauditable = _run_gate(names)
    assert not unauditable, f"unauditable oracles: {unauditable}"
    new_thin = {n: u for n, u in thin.items() if n not in BASELINE_THIN_SF0001}
    assert not new_thin, f"NEW thin margins: {new_thin}"
