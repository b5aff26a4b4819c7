"""Ablation: time each detector + verify separately on a cached conv.

    python tools/ablate_pairs.py <cores> <corpus_parquet>
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


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

    spark = get_spark(
        f"ablate-{cores}", master=f"local[{cores}]", shuffle_partitions=2 * cores
    )
    cfg = DedupConfig()

    wturns = corpus_to_spark(spark, generate_corpus(50, seed=7)[0])
    run_dedup_dataframes(add_signatures(reconstruct_conversations(wturns), cfg), cfg)[
        "decisions"
    ].count()
    spark.catalog.clearCache()

    turns = spark.read.parquet(corpus)
    conv = add_signatures(reconstruct_conversations(turns), cfg).persist()

    def t(name, fn):
        t0 = time.perf_counter()
        n = fn()
        print(f"{name:<28} {time.perf_counter() - t0:7.2f}s   rows={n}")

    t("conv.count (kernel)", lambda: conv.count())
    ex = exact_candidates(conv)
    t("exact.count", lambda: ex.count())
    ls = lsh_candidates(conv, cfg, None)
    t("lsh.count (raw band pairs)", lambda: ls.count())
    t("lsh distinct pairs", lambda: ls.select("conv_a", "conv_b").distinct().count())
    ss = substring_candidates(conv, cfg, None, verify_mode="instr")
    t("substring.count (instr)", lambda: ss.count())
    cand = ex.unionByName(ls).unionByName(ss)
    ver = verify_candidates(cand, conv, cfg)
    t("verify.count (full union)", lambda: ver.count())
    # second time: detectors recomputed? (they are not persisted)
    t("verify.count again", lambda: ver.count())
    spark.stop()


if __name__ == "__main__":
    main()
