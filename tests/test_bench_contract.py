"""bench.py driver-contract smoke (r10).

The driver records BENCH_r{N}.json by parsing the ONE JSON line bench.py
prints; r3 lost its round's bench artifact to a single AnalysisException
and r9's creep investigation leaned on the sidecar attribution. This
smoke runs the real main() on a trimmed query set at sf0.001 and pins
the whole contract: the stdout line's schema, the warm/cold accounting,
and the per-sample attribution fields (worker census + GC + host CPU
deltas) the r10 decomposition relies on.
"""

from __future__ import annotations

import contextlib
import io
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_main_contract(monkeypatch, tmp_path):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "HEADLINE", ["pricing_summary", "doc_stats"])
    monkeypatch.setattr(bench, "EXTENDED", ["outlier_mad"])
    # keep the committed sf0.1 sidecar intact: restore after the run
    sidecar = os.path.join(_REPO, "BENCH_EXTENDED.json")
    with open(sidecar) as f:
        committed = f.read()
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            bench.main()
        lines = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")]
        assert len(lines) == 1, buf.getvalue()
        report = json.loads(lines[0])
        assert report["metric"] == "catalog_headline_total"
        assert report["unit"] == "sec"
        assert report["value"] > 0
        assert set(report["queries"]) == {"pricing_summary", "doc_stats"}
        assert "error_count" not in report, report
        assert len(lines[0]) <= 1800  # the driver's stdout tail window

        with open(sidecar) as f:
            detail = json.load(f)
        assert detail["value_extended"] > 0
        assert set(detail["queries_extended"]) == {"outlier_mad"}
        att = detail["attribution"]
        assert set(att) == {"pricing_summary", "doc_stats"}
        for runs in att.values():
            # 1 cold + 3 warm (pass 1, back-to-back) + 2 warm (pass 2,
            # time-separated re-sample after the full headline sweep)
            assert len(runs) == 6
            assert [r["pass"] for r in runs] == [1, 1, 1, 1, 2, 2]
            for r in runs:
                for field in (
                    "t",
                    "pass",
                    "gc_ms",
                    "gc_n",
                    "workers_spawned",
                    "workers_reaped",
                    "workers_after",
                    "cpu_busy_j",
                    "cpu_idle_j",
                    "cpu_steal_j",
                    "app_cpu_j",  # r11: app-scoped CPU (JVM+workers)
                ):
                    assert field in r, (field, r)
            # warm = min of the five post-codegen samples across passes
            warm = [r["t"] for r in runs if r["run"] > 0]
            name = [n for n, rr in att.items() if rr is runs][0]
            assert report["queries"][name] == min(warm)
            # r11 (VERDICT r10 #8): the protocol-stable r1-r9 statistic
            # (min of the 3 back-to-back pass-1 warm samples) rides the
            # sidecar so PERF deltas compare under one protocol
            p1 = [r["t"] for r in runs if r["pass"] == 1 and r["run"] > 0]
            assert detail["queries_warm_pass1_min3"][name] == min(p1)
        assert detail["value_warm_pass1_min3"] > 0
    finally:
        with open(sidecar, "w") as f:
            f.write(committed)
