"""Job-level profiler for a named __spark_entry__ query (Phase-A shape).

Mirrors bench_extra.py's session/warmup exactly, then runs the query once
with the Spark REST UI on and dumps per-job walls plus inter-job gaps
(driver-side planning/scheduling — the flat cost that dominates small-SF
headline readings).

    python tools/profile_query.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as E
    from transcript_dedup.session import get_spark, prewarm_python_workers

    spark = get_spark(
        "profile-query",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    qs = E.queries()
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    qs["doc_dedup_components"](spark, warm_dir).count()
    prewarm_python_workers(spark, cpus)
    spark.catalog.clearCache()

    ui = spark.sparkContext.uiWebUrl
    app = _get(f"{ui}/api/v1/applications")[0]["id"]
    jobs_before = {j["jobId"] for j in _get(f"{ui}/api/v1/applications/{app}/jobs")}

    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    df.count()
    wall = time.time() - t0
    t_end = time.time()

    jobs = [
        j
        for j in _get(f"{ui}/api/v1/applications/{app}/jobs")
        if j["jobId"] not in jobs_before
    ]
    jobs.sort(key=lambda j: j["jobId"])

    def ts(s: str) -> float:
        from datetime import datetime

        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp()

    total_job = 0.0
    prev_end = None
    rows = []
    for j in jobs:
        start, end = ts(j["submissionTime"]), ts(j["completionTime"])
        gap = (start - prev_end) if prev_end is not None else 0.0
        prev_end = end
        total_job += end - start
        rows.append(
            {
                "job": j["jobId"],
                "wall_s": round(end - start, 3),
                "gap_before_s": round(gap, 3),
                "stages": len(j["stageIds"]),
                "tasks": j["numTasks"],
                "desc": (j.get("description") or j["name"])[:100],
            }
        )
    print(json.dumps({
        "query": name,
        "wall_s": round(wall, 3),
        "n_jobs": len(jobs),
        "sum_job_wall_s": round(total_job, 3),
        "sum_gaps_s": round(sum(r["gap_before_s"] for r in rows), 3),
        "pre_first_job_s": round(ts(jobs[0]["submissionTime"]) - t0, 3) if jobs else None,
        "post_last_job_s": round(t_end - prev_end, 3) if jobs else None,
    }))
    for r in rows:
        print(json.dumps(r))

    # longest SQL execution: per-node metrics (what the big stages compute)
    try:
        sqls = _get(f"{ui}/api/v1/applications/{app}/sql?details=true&planDescription=false&length=200")
        sqls = [s for s in sqls if s.get("duration") and ts(s["submissionTime"]) >= t0 - 0.5]
        sqls.sort(key=lambda s: -s["duration"])
        print("--- top SQL executions (timed region) ---")
        for s in sqls[:3]:
            print(json.dumps({"id": s["id"], "dur_ms": s["duration"], "status": s["status"]}))
            for nd in s.get("nodes") or []:
                met = ""
                for m in nd.get("metrics") or []:
                    nmm = m.get("name", "")
                    if "time" in nmm.lower():
                        met += f' [{nmm} = {m.get("value")}]'
                if met:
                    print(f"  node {nd['nodeId']} {nd['nodeName'][:60]}:{met}")
    except Exception as e:  # noqa: BLE001
        print(f"sql dump failed: {e}")

    # top stages by wall, with task-time totals — names the compute
    stages = _get(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    seen_job_stage_ids = {sid for j in jobs for sid in j["stageIds"]}
    stages = [s for s in stages if s["stageId"] in seen_job_stage_ids]
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print("--- top stages by executorRunTime ---")
    for s in stages[:20]:
        start = s.get("firstTaskLaunchedTime")
        end = s.get("completionTime")
        wall_st = None
        if start and end:
            wall_st = round(ts(end) - ts(start), 3)
        print(
            json.dumps(
                {
                    "stage": s["stageId"],
                    "run_ms": s.get("executorRunTime"),
                    "cpu_ms": round((s.get("executorCpuTime") or 0) / 1e6),
                    "wall_s": wall_st,
                    "tasks": s.get("numCompleteTasks"),
                    "name": (s.get("name") or "")[:90],
                }
            )
        )


if __name__ == "__main__":
    main()
