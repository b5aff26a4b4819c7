"""Dump the engine's matched-pair set + counters at a given corpus, for
cross-version diffing (e.g. the cid dictionary-encoding change).

    python tools/dump_pairs.py <repo_root> <corpus_parquet> <out_prefix>

Writes <out_prefix>.pairs.csv (sorted conv_a,conv_b,src_reasons) and prints
one JSON line with counters + decisions count.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, sys.argv[1])


def main():
    corpus, out_prefix = sys.argv[2], sys.argv[3]

    from transcript_dedup.config import DedupConfig
    from transcript_dedup.generate import corpus_to_spark, generate_corpus
    from transcript_dedup.pipeline import run_dedup_dataframes
    from transcript_dedup.reconstruct import reconstruct_conversations
    from transcript_dedup.session import get_spark
    from transcript_dedup.signatures import add_signatures

    spark = get_spark("dump-pairs", master="local[16]", shuffle_partitions=32)
    cfg = DedupConfig()
    counters: dict = {}
    turns = spark.read.parquet(corpus)
    conv = add_signatures(reconstruct_conversations(turns), cfg)
    res = run_dedup_dataframes(conv, cfg, counters=counters)
    pairs = res["candidate_pairs"]
    rows = (
        pairs.filter("is_match")
        .select("conv_a", "conv_b", "confidence")
        .orderBy("conv_a", "conv_b")
        .collect()
    )
    with open(out_prefix + ".pairs.csv", "w") as f:
        for r in rows:
            f.write(f"{r['conv_a']},{r['conv_b']},{r['confidence']}\n")
    n_dec = res["decisions"].count()
    print(
        json.dumps(
            {
                "matched_pairs": len(rows),
                "decisions": n_dec,
                "counters": {k: v for k, v in sorted(counters.items())},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
