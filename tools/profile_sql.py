"""Run the real pairs phase once, dump per-node SQL metrics from the REST UI.

    python tools/profile_sql.py <cores> <corpus_parquet>
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _get(url: str):
    with urllib.request.urlopen(url, timeout=20) as r:
        return json.loads(r.read().decode())


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2]

    from transcript_dedup.config import DedupConfig
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

    extra = {"spark.ui.enabled": "true"}
    extra.update(json.loads(os.environ.get("TD_EXTRA_CONF", "{}")))
    spark = get_spark(
        f"sqlprof-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=int(os.environ.get("TD_SHUFFLE_PARTS", 2 * cores)),
        extra_conf=extra,
    )
    cfg = DedupConfig().with_(**json.loads(os.environ.get("TD_CFG", "{}")))
    wturns = corpus_to_spark(spark, generate_corpus(50, seed=7)[0])
    run_dedup_dataframes(add_signatures(reconstruct_conversations(wturns), cfg), cfg)[
        "decisions"
    ].count()
    from transcript_dedup.session import prewarm_python_workers

    prewarm_python_workers(spark, cores)
    spark.catalog.clearCache()

    turns = spark.read.parquet(corpus)
    conv = add_signatures(reconstruct_conversations(turns), cfg).persist()
    conv.count()

    t0 = time.perf_counter()
    cand = (
        exact_candidates(conv)
        .unionByName(lsh_candidates(conv, cfg, None))
        .unionByName(substring_candidates(conv, cfg, None, verify_mode="instr"))
    )
    pairs = verify_candidates(cand, conv, cfg)
    n = pairs.count()
    print(f"pairs.count wall = {time.perf_counter()-t0:.1f}s rows={n}", flush=True)

    ui = spark.sparkContext.uiWebUrl
    app_id = _get(f"{ui}/api/v1/applications")[0]["id"]
    queries = _get(f"{ui}/api/v1/applications/{app_id}/sql?details=true&length=200")
    q = max(queries, key=lambda q: q.get("duration", 0))
    print(f"\nquery id={q['id']} duration={q['duration']/1000:.1f}s  {q['description'][:60]}")
    nodes = q.get("nodes", [])
    rows = []
    for nd in nodes:
        interesting = {}
        for m in nd.get("metrics", []):
            nm = m["name"]
            v = m["value"]
            if any(k in nm for k in ("time", "duration", "rows")):
                interesting[nm] = v
        rows.append((nd["nodeId"], nd["nodeName"], interesting))

    def parse_t(v):
        # values like "1.2 m (...)", "34.5 s", "123" etc — crude max-extract
        import re

        tot = 0.0
        for num, unit in re.findall(r"([\d.]+)\s*(ms|s|m|h)", v):
            mult = {"ms": 0.001, "s": 1, "m": 60, "h": 3600}[unit]
            tot = max(tot, float(num) * mult)
        return tot

    scored = []
    for nid, name, ms in rows:
        best = 0.0
        for k, v in ms.items():
            if "time" in k or "duration" in k:
                best = max(best, parse_t(v))
        scored.append((best, nid, name, ms))
    scored.sort(reverse=True)
    for best, nid, name, ms in scored[:25]:
        print(f"\n[{nid}] {name}  (max metric {best:.1f}s)")
        for k, v in ms.items():
            print(f"    {k}: {v}")
    if os.environ.get("TD_PROF_PLAN"):
        # full physical plan with the same (nodeId) tags the metrics use —
        # lets a skewed node be mapped back to its operator/keys
        qd = _get(
            f"{ui}/api/v1/applications/{app_id}/sql/{q['id']}?details=true&planDescription=true"
        )
        print("\n===== planDescription =====")
        print(qd.get("planDescription", "")[:40000])
    spark.stop()


if __name__ == "__main__":
    main()
