"""Stage-level profile of lm_perplexity_pruned's 10x scaling residual.

Round-8 verdict ask #5: the query's 10x wall ratio has sat at ~3.0x since
round 5 with the narrative "the residual is the exact LM counting pass";
this script replaces the narrative with Spark event-log evidence. It runs
the query once warm + once measured at each SF in its own session with
the event log enabled, then aggregates per-stage wall time and summed
executor run time from the log, printing the stages ranked by growth.

Usage: python tools/profile_lm.py [query_name]      (default
lm_perplexity_pruned; sessions run SEQUENTIALLY — never alongside a bench)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVT = "/tmp/spark_lm_profile_events"

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/tmp/spark_graft_scale/sf1",
}


def run_one(name: str, sf_dir: str) -> tuple[float, list[dict]]:
    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (
        get_spark,
    )
    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (
        SPARK_QUERIES,
    )

    shutil.rmtree(EVT, ignore_errors=True)
    os.makedirs(EVT, exist_ok=True)
    spark = get_spark(
        f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVT}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.compression.codec": "none",
        },
    )
    fn = SPARK_QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    # mark the measured run so warm-up stages are excluded from the report
    t_mark = time.time() * 1000
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.stop()

    stages: dict[int, dict] = {}
    run_time: dict[int, float] = {}
    # Spark 4 event logs may be a single file or a rolling directory
    # (eventlog_v2_<app>/events_*); walk everything that is a file
    paths = [p for p in glob.glob(f"{EVT}/**/*", recursive=True) if os.path.isfile(p)]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time")
                    if sub is None or sub < t_mark:
                        continue
                    # the callsite name is an opaque lambda under AQE; the
                    # RDD scope chain names the physical operators
                    scopes = []
                    for ri in si.get("RDD Info", []):
                        sc = ri.get("Scope")
                        if sc:
                            try:
                                nm = json.loads(sc).get("name")
                            except json.JSONDecodeError:
                                nm = None
                            if nm and nm not in scopes:
                                scopes.append(nm)
                    stages[si["Stage ID"]] = {
                        "name": (" | ".join(reversed(scopes)) or si["Stage Name"].split("\n")[0])[:90],
                        "wall_s": round(
                            (si["Completion Time"] - sub) / 1000.0, 3
                        ),
                        "tasks": si["Number of Tasks"],
                        "shuffle_read_mb": 0.0,
                        "shuffle_write_mb": 0.0,
                    }
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    tm = ev.get("Task Metrics") or {}
                    run_time[sid] = run_time.get(sid, 0.0) + tm.get(
                        "Executor Run Time", 0
                    ) / 1000.0
                    sr = (tm.get("Shuffle Read Metrics") or {})
                    sw = (tm.get("Shuffle Write Metrics") or {})
                    if sid in stages:
                        stages[sid]["shuffle_read_mb"] += (
                            sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                        ) / 1e6
                        stages[sid]["shuffle_write_mb"] += sw.get(
                            "Shuffle Bytes Written", 0
                        ) / 1e6
    out = []
    for sid, st in sorted(stages.items()):
        st["stage_id"] = sid
        st["exec_cpu_s"] = round(run_time.get(sid, 0.0), 2)
        st["shuffle_read_mb"] = round(st["shuffle_read_mb"], 1)
        st["shuffle_write_mb"] = round(st["shuffle_write_mb"], 1)
        out.append(st)
    return wall, out


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "lm_perplexity_pruned"
    results = {}
    for sf, d in SFS.items():
        if not os.path.isdir(d):
            print(f"missing {d} — run tools/gen_scale_data.py first", file=sys.stderr)
            sys.exit(1)
        wall, stages = run_one(name, d)
        results[sf] = (wall, stages)
        print(f"\n=== {name} @ {sf}: wall {wall:.2f}s ===")
        for st in sorted(stages, key=lambda s: -s["exec_cpu_s"]):
            print(
                f"  stage {st['stage_id']:>3} {st['name']:<70} "
                f"wall {st['wall_s']:>7.2f}s cpu {st['exec_cpu_s']:>8.1f}s "
                f"tasks {st['tasks']:>3} shufR {st['shuffle_read_mb']:>8.1f}MB "
                f"shufW {st['shuffle_write_mb']:>8.1f}MB"
            )
        tot_cpu = sum(s["exec_cpu_s"] for s in stages)
        print(f"  total executor CPU {tot_cpu:.1f}s across {len(stages)} stages")
    w0, w1 = results["sf0.1"][0], results["sf1"][0]
    print(f"\nwall ratio sf1/sf0.1 = {w1 / w0:.2f}x")


if __name__ == "__main__":
    main()
