#!/usr/bin/env python
"""Registry-wide float rounding-boundary margin audit (VERDICT r8 #4).

The pca_power_top_component r8 driver red row was a CLASS of defect,
not an instance: any oracle-backed query whose output rounds a
multi-step float pipeline can flip across sessions when a pre-round
value lands within summation-order drift of a rounding half-boundary.
This script turns that from hope into measurement, for every
oracle-backed query with float output columns:

1. Run the oracle at the gate scale (default sf0.01) and infer each
   float column's rounding grid k (smallest k<=6 whose 10^-k grid all
   values sit on; the driver's comparison itself rounds at 6, so an
   unrounded column is audited against the 6-grid — it faces the same
   hazard via the harness's normalization).
2. Re-run the oracle with round() stripped ONLY from the final select
   region (CTE-internal pinning rounds are part of the determinism
   contract and stay), and measure each float column's minimum
   distance to its k-grid HALF-boundary — the distance a session's
   drift would have to cross to flip the rounded value.
3. Report every query whose margin is thin RELATIVE TO DRIFT. An
   absolute threshold is meaningless (any dataset puts SOME value
   near SOME boundary); the flip condition is
   margin < summation-order drift, and drift scales with the value's
   own ulp (a reassociated n-term sum drifts ~n ulps worst-case).
   The audited metric is therefore min over values of
   (distance to nearest half-boundary) / ulp(value), flagged when
   below --ulps (default 1e4 — 100x a 100-term reassociation at the
   gate scale, and iterative pipelines must pin upstream anyway, as
   pca_power_top_component now does). Three safe classes are
   separated out, not flagged:
   - PINNED: margin ≈ 0.5 * 10^-k (the value was already rounded
     upstream in a CTE — it sits dead-center of its cell);
   - EXACT-HALF: the pre-round value is an exact multiple of
     10^-(k+1) (exact decimal arithmetic; Spark HALF_UP and DuckDB
     round() both round halves away from zero, so the engines agree
     bit-for-bit);
   - SATURATED: |v * 10^k| >= 2^52 (grid finer than the double's
     own resolution — rounding there is a no-op in every engine).
   Queries whose final region cannot be stripped cleanly (row or
   column count changes, SQL errors) are reported as UNAUDITABLE
   rather than silently skipped; exit 1 if any flagged query.

Usage:
    python scripts/float_margin_audit.py [sf_dir] [name-substring ...]
        [--ulps 1e4] [--json out.json]
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ROUND_RE = re.compile(r"\bround\s*\(", re.IGNORECASE)


def _final_region_start(sql: str) -> int:
    """Offset of the FIRST top-level SELECT. Every CTE body in a WITH
    chain is parenthesized (depth > 0), so all depth-0 SELECTs belong
    to the final statement — including every branch of a top-level
    UNION ALL chain. Taking the LAST depth-0 SELECT (the pre-r10
    behavior) left earlier UNION branches' round() calls in place, and
    those branches were then misclassified PINNED (margin = half-cell),
    silently passing the audit (ADVICE r9). Tracks paren depth; ignores
    quoted strings conservatively (oracles here use no embedded parens
    in literals that would confuse depth)."""
    depth = 0
    i = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":  # skip string literal
            j = sql.find("'", i + 1)
            i = n if j < 0 else j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and sql[i : i + 6].upper() == "SELECT":
            return i
        i += 1
    return -1


def _strip_rounds(region: str) -> str:
    """Replace every round(expr, k) in the region with (expr). Applies
    innermost-out until no round( remains (nested rounds in the final
    region are all part of the output expression being audited)."""
    while True:
        m = _ROUND_RE.search(region)
        if m is None:
            return region
        start = m.start()
        i = m.end()  # just past the '('
        depth = 1
        last_comma = -1
        while i < len(region) and depth:
            ch = region[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                last_comma = i
            i += 1
        if depth:  # unbalanced — bail, caller will flag unauditable
            return region
        end = i  # one past ')'
        expr = region[m.end() : last_comma if last_comma > 0 else end - 1]
        region = region[:start] + "(" + expr + ")" + region[end:]


def strip_final_rounds(sql: str) -> str | None:
    pos = _final_region_start(sql)
    if pos < 0:
        return None
    return sql[:pos] + _strip_rounds(sql[pos:])


def _infer_k(values: list[float]) -> int | None:
    """Smallest k in 0..6 such that every value sits on the 10^-k grid
    (within float representation slop). None = unrounded (audit at 6,
    the harness's own normalization grid)."""
    for k in range(0, 7):
        scale = 10.0**k
        ok = True
        for v in values:
            y = v * scale
            # tolerance scales with ulp: at large magnitude the scaled
            # value itself cannot represent the grid more finely
            if abs(y - round(y)) > max(1e-6, 8 * math.ulp(y)):
                ok = False
                break
        if ok:
            return k
    return None


def _margin_ulps(values: list[float], k: int) -> dict:
    """Min distance-to-half-boundary in ulps of the value, plus the
    three safe-class counters (pinned / exact-half / saturated)."""
    scale = 10.0**k
    best = math.inf
    best_v = None
    n_sat = n_half = 0
    for v in values:
        y = v * scale
        if abs(y) >= 2.0**52:
            n_sat += 1
            continue
        f = y - math.floor(y)
        d_grid = abs(f - 0.5) / scale  # absolute distance to boundary
        if d_grid == 0.0:
            # exact half: v is the double nearest a (k+1)-decimal
            # value — exact decimal arithmetic, and both engines
            # round halves away from zero, so they agree bit-for-bit
            if round(v, k + 1) == v:
                n_half += 1
                continue
            d_ulps = 0.0
        else:
            d_ulps = d_grid / math.ulp(v if v else 1e-300)
        if d_ulps < best:
            best, best_v = d_ulps, v
    return {
        "min_ulps": None if best is math.inf else best,
        "at_value": best_v,
        "saturated": n_sat,
        "exact_half": n_half,
    }


def _float_cols(pdf) -> list[str]:
    return [c for c in pdf.columns if str(pdf[c].dtype).startswith("float")]


def _vals(pdf, c) -> list[float]:
    out = []
    for v in pdf[c]:
        if v is None:
            continue
        try:
            f = float(v)
        except (TypeError, ValueError):
            continue
        if not math.isnan(f) and math.isfinite(f):
            out.append(f)
    return out


def audit_one(sql: str, sf_dir: str, run_oracle) -> dict:
    """Audit one oracle SQL: returns the per-query report entry
    ({status, margins, worst_ulps} or a non-ok status). Shared by
    main() and the pytest gate (tests/test_margin_gate.py), so the
    gate exercises the exact production classification path."""
    try:
        base = run_oracle(sql, sf_dir)
    except Exception as e:  # oracle itself broken — sweep's problem
        return {"status": f"oracle error: {e}", "unauditable": True}
    fcols = _float_cols(base)
    if not fcols:
        return {"status": "no float columns"}
    grids = {}
    for c in fcols:
        vals = _vals(base, c)
        if not vals:
            continue
        k = _infer_k(vals)
        grids[c] = 6 if k is None else min(k, 6)
    if not grids:
        return {"status": "no finite float values"}
    stripped = strip_final_rounds(sql)
    if stripped is None:
        return {"status": "no final select found", "unauditable": True}
    try:
        raw = run_oracle(stripped, sf_dir)
    except Exception as e:
        return {"status": f"stripped oracle error: {e}", "unauditable": True}
    if len(raw) != len(base) or sorted(raw.columns) != sorted(base.columns):
        return {"status": "stripped result shape differs", "unauditable": True}
    margins = {}
    for c, k in grids.items():
        vals = _vals(raw, c)
        if vals:
            margins[f"{c}@1e-{k}"] = _margin_ulps(vals, k)
    finite = [m["min_ulps"] for m in margins.values() if m["min_ulps"] is not None]
    worst = min(finite) if finite else None
    return {"status": "ok", "margins": margins, "worst_ulps": worst}


def main() -> int:
    argv = list(sys.argv[1:])
    threshold = 1e4
    json_out = None
    if "--ulps" in argv:
        i = argv.index("--ulps")
        threshold = float(argv[i + 1])
        del argv[i : i + 2]
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    needles = argv[1:]

    from pandas_etl_spark.catalog import ORACLES, QUERIES
    from tests.oracle_harness import run_oracle

    names = [
        n
        for n in QUERIES
        if n in ORACLES and (not needles or any(s in n for s in needles))
    ]
    report: dict[str, dict] = {}
    thin: list[str] = []
    unauditable: list[str] = []
    for n in names:
        entry = audit_one(ORACLES[n], sf_dir, run_oracle)
        report[n] = entry
        if entry.pop("unauditable", False):
            unauditable.append(n)
            continue
        worst = entry.get("worst_ulps")
        if worst is not None and worst < threshold:
            thin.append(n)
            brief = {
                c: f"{m['min_ulps']:.1e}u@{m['at_value']}"
                for c, m in entry["margins"].items()
                if m["min_ulps"] is not None and m["min_ulps"] < threshold
            }
            print(f"THIN   {n}: worst {worst:.2e} ulps {brief}")
    print(
        f"float_margin_audit: {len(names)} queries at {sf_dir} — "
        f"{len(thin)} below {threshold:.0e} ulps, "
        f"{len(unauditable)} unauditable"
    )
    for n in unauditable:
        print(f"UNAUDITABLE {n}: {report[n]['status']}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "threshold": threshold,
                    "thin": thin,
                    "unauditable": unauditable,
                    "report": report,
                },
                f,
                indent=1,
                default=str,
            )
        print(f"wrote {json_out}")
    return 1 if thin else 0


if __name__ == "__main__":
    raise SystemExit(main())
