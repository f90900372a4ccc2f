"""Per-job profile of a single registered query (optimization tooling).

Runs ONE query with the Spark UI enabled, then walks the UI REST API and
prints every Spark job the query submitted — duration, stage count, task
count, shuffle read/write bytes, and the call-site name — sorted by
duration. This is the "which of the 40 jobs inside this 9-second query
is the wall" view that bench.py's single wall number cannot give.

Usage: python tools/profile_jobs.py <query_name> [sf_dir] [--repeat N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_lakehouse_spark import get_spark  # noqa: E402
from ecommerce_lakehouse_spark.queries import REGISTRY  # noqa: E402


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app}"

    # warmup (JVM/codegen) on the flagship, same as bench.py
    REGISTRY["daily_sales"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    baseline_jobs = {j["jobId"] for j in _get(base, "/jobs")}
    walls = []
    for _ in range(repeat):
        t0 = time.time()
        df = REGISTRY[name](spark, sf_dir)
        t_build = time.time() - t0
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    wall = walls[-1]

    jobs = [j for j in _get(base, "/jobs") if j["jobId"] not in baseline_jobs]
    stages = {s["stageId"]: s for s in _get(base, "/stages")}

    rows = []
    for j in jobs:
        sub = j.get("submissionTime")
        comp = j.get("completionTime")
        dur = None
        if sub and comp:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            dur = (
                datetime.strptime(comp.replace("GMT", ""), fmt.replace("%Z", ""))
                - datetime.strptime(sub.replace("GMT", ""), fmt.replace("%Z", ""))
            ).total_seconds()
        sw = sr = inp = tasks = 0
        for sid in j.get("stageIds", []):
            s = stages.get(sid)
            if s:
                sw += s.get("shuffleWriteBytes", 0)
                sr += s.get("shuffleReadBytes", 0)
                inp += s.get("inputBytes", 0)
                tasks += s.get("numCompleteTasks", 0)
        rows.append(
            (
                dur or 0.0,
                j["jobId"],
                len(j.get("stageIds", [])),
                tasks,
                sr,
                sw,
                inp,
                (j.get("name") or "")[:100],
            )
        )
    rows.sort(reverse=True)
    print(f"\nquery={name} wall={wall:.3f}s (plan-build {t_build:.3f}s) "
          f"jobs={len(jobs)} walls={[round(w,3) for w in walls]}")
    print(f"{'dur_s':>7} {'job':>4} {'stg':>4} {'tasks':>6} "
          f"{'shuf_r':>10} {'shuf_w':>10} {'input':>10}  name")
    for dur, jid, nstg, tasks, sr, sw, inp, jname in rows:
        print(f"{dur:7.3f} {jid:4d} {nstg:4d} {tasks:6d} "
              f"{sr:10d} {sw:10d} {inp:10d}  {jname}")
    jsum = sum(r[0] for r in rows)
    print(f"sum(job durations)={jsum:.3f}s  wall-jobs gap={wall - jsum:.3f}s "
          "(gap = driver-side planning/control)")


if __name__ == "__main__":
    main()
