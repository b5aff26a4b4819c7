"""A/B arbitrary Spark-conf overrides on the full pinned pipeline protocol
(fresh subprocess per rep, page-cache pre-read, interleaved variants).

    python tools/ablate_conf.py <cores> <reps> <name1> <json1> [<name2> <json2> ...]

Example (AQE partition-coalescing off, skew-join kept on):

    python tools/ablate_conf.py 4 2 \
        base '{}' \
        nocoalesce '{"spark.sql.adaptive.coalescePartitions.enabled": "false"}'
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _warm(corpus: str) -> None:
    for p in os.listdir(corpus):
        with open(os.path.join(corpus, p), "rb") as f:
            while f.read(1 << 24):
                pass


def main() -> None:
    cores = int(sys.argv[1])
    reps = int(sys.argv[2])
    pairs = sys.argv[3:]
    variants = {pairs[i]: pairs[i + 1] for i in range(0, len(pairs), 2)}
    corpus = os.path.join(ROOT, "BENCH", "cache", "turns_n120000_seed42.parquet.d")

    results: dict[str, list[float]] = {}
    for rep in range(reps):
        for name, conf in variants.items():
            _warm(corpus)
            env = dict(os.environ, TD_EXTRA_CONF=conf)
            cmd = [
                "taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0",
                sys.executable, os.path.join("tools", "bench_pipeline.py"),
                str(cores), corpus,
            ]
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True, cwd=ROOT, env=env
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            results.setdefault(name, []).append(r["wall_sec"])
            print(
                json.dumps({"variant": name, "rep": rep, "cores": cores, **r}),
                flush=True,
            )
    print(json.dumps({"cores": cores, "summary": results}))


if __name__ == "__main__":
    main()
