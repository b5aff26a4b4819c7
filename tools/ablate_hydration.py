"""A/B the round-3 pairs-phase physical changes at a given core count:

  base  hydration_join=auto        lsh_cache_keys=False   (round-2 behavior)
  hyd   hydration_join=shuffle_hash lsh_cache_keys=False
  keys  hydration_join=auto        lsh_cache_keys=True
  both  hydration_join=shuffle_hash lsh_cache_keys=True   (round-3 default)

Each variant: clear caches, rebuild + eagerly persist conv, then time ONE
execution of the candidate->verify DAG (count of verified pairs). Pair and
match counts must be identical across variants (join strategy and caching
cannot change values).

    python tools/ablate_hydration.py <cores> <corpus> [variants...] [reps]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

VARIANTS = {
    "base": dict(hydration_join="auto", lsh_cache_keys=False),
    "hyd": dict(hydration_join="shuffle_hash", lsh_cache_keys=False),
    "keys": dict(hydration_join="auto", lsh_cache_keys=True),
    "both": dict(hydration_join="shuffle_hash", lsh_cache_keys=True),
    # signature width A/B on top of the round-3 defaults. The shipped
    # default is minhash_width=64 (config.py), so base/hyd/keys/both already
    # run at 64 bits and "w64" == "both"; "w32" is the ablation arm that
    # reproduces the measured-and-rejected 32-bit truncation (counts may
    # differ from the 64-bit variants: band hashes change with the width)
    "w64": dict(hydration_join="shuffle_hash", lsh_cache_keys=True, minhash_width=64),
    "w32": dict(hydration_join="shuffle_hash", lsh_cache_keys=True, minhash_width=32),
}


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2]
    # width variants opt-in only: w32 legitimately changes pair counts, so
    # including it by default would make the cross-variant "identical"
    # invariant read false for the join/caching variants it actually checks
    names = [a for a in sys.argv[3:] if a in VARIANTS] or [
        n for n in VARIANTS if not n.startswith("w")
    ]
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 1

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

    import os

    extra = json.loads(os.environ.get("TD_EXTRA_CONF", "{}"))
    parts = int(os.environ.get("TD_SHUFFLE_PARTS", 2 * cores))
    spark = get_spark(
        f"ablate-hyd-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=parts,
        extra_conf=extra,
    )
    base_cfg = DedupConfig()
    wturns = corpus_to_spark(spark, generate_corpus(50, seed=7)[0])
    run_dedup_dataframes(
        add_signatures(reconstruct_conversations(wturns), base_cfg), base_cfg
    )["decisions"].count()
    spark.catalog.clearCache()

    turns = spark.read.parquet(corpus)
    results = {}
    counts = set()
    for rep in range(reps):
        for name in names:
            cfg = base_cfg.with_(**VARIANTS[name])
            spark.catalog.clearCache()
            tc = time.perf_counter()
            conv = add_signatures(reconstruct_conversations(turns), cfg).persist()
            conv.count()
            conv_wall = round(time.perf_counter() - tc, 2)
            t0 = time.perf_counter()
            cand = (
                exact_candidates(conv)
                .unionByName(lsh_candidates(conv, cfg, None))
                .unionByName(substring_candidates(conv, cfg, None, verify_mode="instr"))
            )
            pairs = verify_candidates(cand, conv, cfg)
            agg = pairs.selectExpr(
                "count(*) as n", "sum(cast(is_match as long)) as m"
            ).collect()[0]
            wall = round(time.perf_counter() - t0, 2)
            results.setdefault(name, []).append(wall)
            counts.add((int(agg["n"]), int(agg["m"])))
            print(
                json.dumps(
                    {"variant": name, "rep": rep, "cores": cores, "conv_wall": conv_wall,
                     "pairs_wall": wall, "n_pairs": int(agg["n"]), "n_match": int(agg["m"])}
                ),
                flush=True,
            )
    print(json.dumps({"cores": cores, "summary": results, "identical": len(counts) == 1}))
    spark.stop()


if __name__ == "__main__":
    main()
