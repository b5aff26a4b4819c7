"""A/B: num_perm 126 (42x3 bands, default) vs 96 (32x3 bands) on the full
pinned pipeline protocol (fresh subprocess per rep, page-cache pre-read,
interleaved variants). Fewer permutations cut the band-key explode by 25%
and the minhash bytes through the verify hydration shuffle by 24% — the
two biggest streams in the DRAM-inflation-bound pairs phase.

    python tools/ablate_numperm.py <cores> [reps]

Decision quality is checked separately (tools/check_numperm_recall.py);
this tool measures wall only and prints decision counts per variant.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# np96 became the shipped default in round 4 (see config.py rationale);
# both variants stay explicit so the A/B remains reproducible either way
VARIANTS = {
    "np126": {"num_perm": 126, "lsh_bands": 42},
    "np96": {"num_perm": 96, "lsh_bands": 32},
}


def _warm(corpus: str) -> None:
    for p in os.listdir(corpus):
        with open(os.path.join(corpus, p), "rb") as f:
            while f.read(1 << 24):
                pass


def main() -> None:
    cores = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    corpus = os.path.join(ROOT, "BENCH", "cache", "turns_n120000_seed42.parquet.d")

    results: dict[str, list[float]] = {}
    for rep in range(reps):
        for name, over in VARIANTS.items():
            _warm(corpus)
            env = dict(os.environ, TD_CFG=json.dumps(over))
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
