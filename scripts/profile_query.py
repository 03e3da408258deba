#!/usr/bin/env python
"""Per-stage executor-CPU profiler for catalog queries (guide §1).

Wall time on this host is unusable under the documented external load
waves (SCALE.md r10), so optimization targeting runs on executor CPU
attribution instead: run the named queries (1 cold + 1 warm noop-sink
execution each) with the Spark event log enabled, then parse the log
into per-query totals and a top-stages table (CPU, shuffle bytes,
tasks, and the first line of the stage's callsite) for the WARM run.

Usage:
    python scripts/profile_query.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    if not args:
        print(__doc__)
        return 2
    evdir = tempfile.mkdtemp(prefix="spark-events-")

    from pandas_etl_spark.catalog import QUERIES
    from pandas_etl_spark.session import get_spark

    spark = get_spark(
        "profile_query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    sc = spark.sparkContext

    def clear_leaked_storage() -> None:
        spark.catalog.clearCache()
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist(False)

    walls: dict[str, dict[str, float]] = {}
    for name in args:
        for run in ("cold", "warm"):
            sc.setJobDescription(f"{name}::{run}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.setdefault(name, {})[run] = round(time.perf_counter() - t0, 3)
            clear_leaked_storage()
        sc.setJobDescription(None)

    app_id = sc.applicationId
    spark.stop()
    time.sleep(1)

    # ---- parse the event log -------------------------------------------
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):  # .inprogress if stop didn't flush
        path += ".inprogress"
    v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
    if os.path.isdir(v2):  # Spark 4 rolling layout
        parts = sorted(
            p for p in os.listdir(v2) if p.startswith("events_")
        )
        path = [os.path.join(v2, p) for p in parts]
    else:
        path = [path]
    # job id -> description; stage id -> (job id, callsite); stage metrics
    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    stage_name: dict[int, str] = {}
    stage_cpu: dict[int, float] = {}
    stage_run: dict[int, float] = {}
    stage_tasks: dict[int, int] = {}
    stage_shuf_r: dict[int, int] = {}
    stage_shuf_w: dict[int, int] = {}
    def lines():
        for p in path:
            if p.endswith(".zstd"):
                # no zstandard module in the sandbox; use the zstd CLI
                import io
                import subprocess

                out = subprocess.run(
                    ["zstdcat", p], capture_output=True, check=True
                )
                yield from io.StringIO(out.stdout.decode("utf-8"))
            else:
                with open(p) as f:
                    yield from f

    if True:
        for line in lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_desc[jid] = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                for sinfo in ev.get("Stage Infos", []):
                    sid = sinfo["Stage ID"]
                    stage_job[sid] = jid
                    stage_name[sid] = sinfo.get("Stage Name", "")
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                stage_cpu[sid] = stage_cpu.get(sid, 0.0) + m.get(
                    "Executor CPU Time", 0
                ) / 1e9
                stage_run[sid] = stage_run.get(sid, 0.0) + m.get(
                    "Executor Run Time", 0
                ) / 1e3
                stage_tasks[sid] = stage_tasks.get(sid, 0) + 1
                sm = m.get("Shuffle Read Metrics") or {}
                stage_shuf_r[sid] = (
                    stage_shuf_r.get(sid, 0)
                    + sm.get("Remote Bytes Read", 0)
                    + sm.get("Local Bytes Read", 0)
                )
                wm = m.get("Shuffle Write Metrics") or {}
                stage_shuf_w[sid] = stage_shuf_w.get(sid, 0) + wm.get(
                    "Shuffle Bytes Written", 0
                )

    for name in args:
        for run in ("cold", "warm"):
            tag = f"{name}::{run}"
            sids = [
                s for s, j in stage_job.items() if job_desc.get(j) == tag
            ]
            cpu = sum(stage_cpu.get(s, 0.0) for s in sids)
            sr = sum(stage_shuf_r.get(s, 0) for s in sids)
            sw = sum(stage_shuf_w.get(s, 0) for s in sids)
            nt = sum(stage_tasks.get(s, 0) for s in sids)
            print(
                f"\n== {tag}: wall {walls[name][run]:.2f}s, executor CPU "
                f"{cpu:.1f}s, {len(sids)} stages / {nt} tasks, shuffle "
                f"R {sr/2**20:.1f} MiB / W {sw/2**20:.1f} MiB"
            )
            if run == "warm":
                top = sorted(
                    sids, key=lambda s: stage_cpu.get(s, 0.0), reverse=True
                )[:8]
                for s in top:
                    if stage_cpu.get(s, 0.0) < 0.05:
                        continue
                    nm = stage_name.get(s, "")[:90]
                    print(
                        f"  stage {s:>5}: cpu {stage_cpu.get(s, 0):7.2f}s "
                        f"run {stage_run.get(s, 0):7.2f}s "
                        f"tasks {stage_tasks.get(s, 0):>4} "
                        f"shufR {stage_shuf_r.get(s, 0)/2**20:8.1f}M "
                        f"shufW {stage_shuf_w.get(s, 0)/2**20:8.1f}M  {nm}"
                    )
    print(f"\nevent log: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
