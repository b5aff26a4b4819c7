"""Stage/job-level profiler for the dedup pipeline.

Mirrors tools/bench_pipeline.py but (a) labels each pipeline phase with a
job description, (b) reports per-phase wall, and (c) dumps per-job wall
times and inter-job gaps (driver-side planning/scheduling = the flat cost
killing the scaling-efficiency target) from the Spark REST UI.

    python tools/profile_pipeline.py <cores> <corpus_parquet> [eager_conv]
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
    cores = int(sys.argv[1])
    corpus = sys.argv[2]
    eager_conv = len(sys.argv) > 3 and sys.argv[3] == "eager"

    from transcript_dedup.cluster import connected_components
    from transcript_dedup.config import DedupConfig
    from transcript_dedup.decide import make_decisions
    from transcript_dedup.detectors import (
        exact_candidates,
        lsh_candidates,
        substring_candidates,
        verify_candidates,
    )
    from transcript_dedup.generate import corpus_to_spark, generate_corpus
    from transcript_dedup.pipeline import run_dedup_dataframes
    from transcript_dedup.reconstruct import reconstruct_conversations
    from transcript_dedup.session import get_spark
    from transcript_dedup.signatures import add_signatures

    # mirror bench_pipeline's conf handling (round-7 fix: this tool silently
    # ignored TD_EXTRA_CONF before, so "profiles under conf X" profiled the
    # default; it also now defaults to the bench's local-mode AQE-off)
    extra = {"spark.ui.enabled": "true", "spark.sql.adaptive.enabled": "false"}
    extra.update(json.loads(os.environ.get("TD_EXTRA_CONF", "{}")))
    spark = get_spark(
        f"profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf=extra,
    )
    sc = spark.sparkContext
    cfg = DedupConfig().with_(**json.loads(os.environ.get("TD_CFG", "{}")))

    wturns = corpus_to_spark(spark, generate_corpus(50, seed=7)[0])
    run_dedup_dataframes(add_signatures(reconstruct_conversations(wturns), cfg), cfg)[
        "decisions"
    ].count()
    spark.catalog.clearCache()
    ui = sc.uiWebUrl
    app_id = _get(f"{ui}/api/v1/applications")[0]["id"]
    warm_jobs = {j["jobId"] for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")}

    turns = spark.read.parquet(corpus)
    phases: list[tuple[str, float]] = []
    t0 = time.perf_counter()
    tp = t0

    def mark(name):
        nonlocal tp
        now = time.perf_counter()
        phases.append((name, now - tp))
        tp = now

    # mirror run_dedup_dataframes' conv handling (persist + assert-count
    # materialization) so profiles match the real pipeline's job structure
    conv = add_signatures(reconstruct_conversations(turns), cfg).persist()
    from transcript_dedup.signatures import assert_cid_unique

    sc.setJobDescription("phase:conv")
    assert_cid_unique(conv)
    mark("conv(kernel+assert)")
    if eager_conv:
        sc.setJobDescription("phase:conv")
        conv.count()
        mark("conv(count)")

    sc.setJobDescription("phase:pairs")
    cand = (
        exact_candidates(conv)
        .unionByName(lsh_candidates(conv, cfg, None))
        .unionByName(substring_candidates(conv, cfg, None, verify_mode="instr"))
    )
    pairs = verify_candidates(cand, conv, cfg).persist()
    n_pairs = pairs.count()
    mark("pairs(detect+verify)")

    sc.setJobDescription("phase:cc")
    comps = connected_components(pairs.filter("is_match"), cfg, None)
    comps = comps.persist()
    comps.count()
    mark("cc")

    sc.setJobDescription("phase:decide")
    decisions = make_decisions(comps, conv, pairs, cfg)
    n_dec = decisions.count()
    mark("decide")
    wall = time.perf_counter() - t0

    jobs = [
        j
        for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")
        if j["jobId"] not in warm_jobs
    ]
    jobs.sort(key=lambda j: j["jobId"])

    def ts(s):
        return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S")) + float(
            "0." + s[20:23] if len(s) > 20 else 0
        )

    print(f"\n=== cores={cores} wall={wall:.1f}s pairs={n_pairs} decisions={n_dec} ===")
    for name, dt in phases:
        print(f"  phase {name:<22} {dt:6.1f}s")
    prev_end = None
    tot_gap = 0.0
    for j in jobs:
        sub, comp = ts(j["submissionTime"]), ts(j["completionTime"])
        dur = comp - sub
        gap = (sub - prev_end) if prev_end is not None else 0.0
        tot_gap += max(gap, 0)
        prev_end = max(comp, prev_end or comp)
        # callsite name distinguishes broadcast builds / takes / main actions
        desc = ((j.get("description") or "") + " | " + (j.get("name") or ""))[:95]
        print(
            f"job {j['jobId']:>3}  dur {dur:6.2f}s  gap {max(gap,0):5.2f}s  "
            f"tasks {j['numTasks']:>4}  {desc}"
        )
    print(f"sum(positive gaps between jobs) = {tot_gap:.1f}s   wall = {wall:.1f}s")

    stages = _get(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    stages.sort(key=lambda s: -(ts(s["completionTime"]) - ts(s["submissionTime"])))
    print("\ntop stages by wall (incl. warmup; big run-times = kernel passes):")
    for s in stages[:14]:
        dur = ts(s["completionTime"]) - ts(s["submissionTime"])
        print(
            f"stage {s['stageId']:>3}  wall {dur:6.2f}s  run {s['executorRunTime']/1000:7.1f}s  "
            f"tasks {s['numCompleteTasks']:>4}  {s['name'][:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

# note: GC time is printed by main() via the executors endpoint when UI is on
