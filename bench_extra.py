"""Extra benchmarks for optimization work (bench.py stays frozen — see the
round-8 rules: the driver times rounds with the round-start bench.py, so
builder-side measurements live here).

Phase-A replica: times the same HEADLINE queries with the same methodology
as bench.py (same session conf, same warmup, count() action), plus optional
noop-sink isolation (guide section 1.4) and .explain("formatted") dumps.

    python bench_extra.py [--noop] [--plans DIR] [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line mirroring bench.py's "queries" section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "doc_dedup_components",
    "doc_substring_pairs",
    "doc_ngram_jaccard_pairs",
    "doc_normalize",
    "tpch_q1_pricing",
    "top10_customers",
    "events_sessionize",
    "ann_cosine_top10",
]


def main() -> None:
    args = sys.argv[1:]
    noop = "--noop" in args
    plans_dir = None
    if "--plans" in args:
        plans_dir = args[args.index("--plans") + 1]
        args = [a for i, a in enumerate(args) if i not in (args.index("--plans"), args.index("--plans") + 1)]
    names = [a for a in args if not a.startswith("--")] or HEADLINE

    from transcript_dedup.session import get_spark, prewarm_python_workers

    import __spark_entry__ as E

    spark = get_spark("bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qs = E.queries()
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    qs[HEADLINE[0]](spark, warm_dir).count()
    prewarm_python_workers(spark, CPUS)
    spark.catalog.clearCache()

    results: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        results[name] = round(time.perf_counter() - t0, 3)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            plan = qs[name](spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": SF_DIR, "noop": noop, "queries": results,
                      "total": round(sum(results.values()), 3)}))


if __name__ == "__main__":
    main()
