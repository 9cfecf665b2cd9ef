"""Stage-level profile of one registry query via the Spark event log.

Runs the named query in THIS process (fresh session with
spark.eventLog.enabled), one unmeasured warm-up pass + one measured
pass (bench.py protocol), then parses the event log and prints a
per-stage table: duration, task count, shuffle bytes, input bytes —
the local stand-in for the Spark UI's Stages page (guide §7.1; the
session normally runs with the UI disabled).

Usage: python tools/stage_profile.py <query> [more queries...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events"


def summarize(path: str, t_mark: float) -> None:
    jobs = {}          # job id -> (submit ms, result ms, desc)
    stages = {}        # stage id -> dict
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                if ev["Submission Time"] / 1000.0 < t_mark:
                    continue
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if si.get("Submission Time", 0) / 1000.0 < t_mark:
                    continue
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "ms": si.get("Completion Time", 0)
                    - si.get("Submission Time", 0),
                    "tasks": si["Number of Tasks"],
                }
    mjobs = [j for j in jobs.values() if "t1" in j and "measure" in j["desc"]]
    print(f"\n== measured jobs: {len(mjobs)}, "
          f"total {sum(j['t1']-j['t0'] for j in mjobs)/1000.0:.2f}s ==")
    for jid, j in sorted(jobs.items()):
        if "t1" not in j or "measure" not in j["desc"]:
            continue
        dur = (j["t1"] - j["t0"]) / 1000.0
        st = [stages[s] for s in j["stages"] if s in stages]
        st.sort(key=lambda s: -s["ms"])
        top = "; ".join(f"{s['ms']}ms/{s['tasks']}t {s['name']}"
                        for s in st[:3])
        print(f"job {jid}: {dur:6.2f}s  [{top}]")


def main() -> int:
    os.makedirs(EVDIR, exist_ok=True)
    from yelp_data_pipeline_spark.queries import queries
    from yelp_data_pipeline_spark.session import get_spark, release_tracked

    spark = get_spark("stage_profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
    })
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = queries()
    app_id = spark.sparkContext.applicationId

    for name in sys.argv[1:]:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_tracked()
        t_mark = time.time()
        spark.sparkContext.setJobDescription(f"measure:{name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        release_tracked()
        spark.sparkContext.setJobDescription(None)
        print(f"\n######## {name}: wall {wall:.2f}s")
        # flush the event log and parse this app's file
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
        # Spark 4 rolling event log: a directory eventlog_v2_<appId>/
        # containing events_*_<appId> part files; also accept the
        # single-file layout of older versions.
        paths = (glob.glob(os.path.join(EVDIR, f"*{app_id}*", "events*"))
                 or glob.glob(os.path.join(EVDIR, f"{app_id}*")))
        for p in sorted(paths):
            summarize(p, t_mark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
