"""Measure cfg.split_hydration on its TARGET corpus shape: exact-clique-
dominated (degenerate duplicate cliques where content-equal pairs dominate
the candidate mass) — the judge-requested evidence that the light/heavy
hydration split pays where it is designed to (verify.py split branch).

Builds a corpus where ~1/3 of conversations live in 100-member exact
cliques (every within-clique pair is content-equal), caches it, then runs
the pinned bench_pipeline subprocess protocol with TD_CFG toggling
split_hydration, interleaved.

    python tools/ablate_split_clique.py build   # write the corpus parquet
    (measurement runs are launched by the caller via bench_pipeline.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/BENCH/cache/turns_clique_n120000_seed42.parquet.d"

N_NORMAL = 80_000
N_CLIQUES = 400
CLIQUE_SIZE = 100  # 400 x 100 = 40k clique members


def build():
    import pandas as pd

    from transcript_dedup.generate import generate_corpus

    if os.path.exists(os.path.join(OUT, "_SUCCESS")):
        print(OUT, "(cached)")
        return
    turns, _ = generate_corpus(N_NORMAL + N_CLIQUES, seed=42)
    # last N_CLIQUES conv ids become clique seeds: replicate each seed's
    # turns CLIQUE_SIZE-1 more times under fresh conv ids (content-equal
    # copies -> every within-clique pair is an exact duplicate)
    ids = sorted(turns["conv_id"].unique())
    seeds = ids[-N_CLIQUES:]
    seed_turns = turns[turns["conv_id"].isin(seeds)]
    copies = []
    for k in range(1, CLIQUE_SIZE):
        c = seed_turns.copy()
        c["conv_id"] = c["conv_id"] + f"x{k:03d}"
        copies.append(c)
    full = pd.concat([turns] + copies, ignore_index=True)
    print(
        f"{full['conv_id'].nunique()} convs "
        f"({N_CLIQUES} cliques x {CLIQUE_SIZE}, {N_NORMAL} normal)"
    )

    from transcript_dedup.generate import corpus_to_spark
    from transcript_dedup.session import get_spark

    spark = get_spark("clique-gen", master="local[16]", shuffle_partitions=32)
    corpus_to_spark(spark, full).repartition(32).write.mode("overwrite").parquet(OUT)
    spark.stop()
    print(OUT)


if __name__ == "__main__":
    build()
