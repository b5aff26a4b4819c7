"""Where does carrying minhash arrays cost? Cache read vs join carry.

    python tools/ablate_arrays.py <cores> <corpus_parquet>
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2]

    from pyspark.sql import functions as F

    from transcript_dedup.config import DedupConfig
    from transcript_dedup.detectors.lsh import lsh_candidates
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
    conv.count()

    def t(name, fn):
        t0 = time.perf_counter()
        n = fn()
        print(f"{name:<44} {time.perf_counter() - t0:7.2f}s   out={n}")

    t("cache read: sum(size(minhash))", lambda: conv.select(F.sum(F.size("minhash"))).collect()[0][0])
    t("cache read again", lambda: conv.select(F.sum(F.size("minhash"))).collect()[0][0])
    t("cache read: sum(element_at(minhash,1))", lambda: conv.select(F.sum(F.pmod(F.element_at("minhash", 1), F.lit(997)))).collect()[0][0])
    t("cache read: sum(xxhash64(norm_text))", lambda: conv.select(F.sum(F.pmod(F.xxhash64("norm_text"), F.lit(997)))).collect()[0][0])

    dp = lsh_candidates(conv, cfg, None).select("conv_a", "conv_b").distinct().persist()
    t("pairs persist+count", lambda: dp.count())

    feats = conv.select("conv_id", "minhash")
    aa = feats.toDF("conv_a", "a_minhash")
    bb = feats.toDF("conv_b", "b_minhash")

    j1 = dp.join(aa, "conv_a")
    t("1 join, prune arrays (count)", lambda: j1.count())
    t("1 join, carry array: sum(size)", lambda: j1.select(F.sum(F.size("a_minhash"))).collect()[0][0])
    j2 = dp.join(aa, "conv_a").join(bb, "conv_b")
    t("2 joins, carry both: sum(sizes)", lambda: j2.select(F.sum(F.size("a_minhash") + F.size("b_minhash"))).collect()[0][0])

    # same but with broadcast hint on the pairs side (small side explicit)
    j3 = F.broadcast(dp).join(aa, "conv_a").join(bb, "conv_b")
    t("2 joins bc(pairs), carry both", lambda: j3.select(F.sum(F.size("a_minhash") + F.size("b_minhash"))).collect()[0][0])

    # binary-packed minhash simulation: pack via concat of 126 substrings? No —
    # approximate the carry cost with norm_text (a ~2KB string) instead:
    ft = conv.select("conv_id", "norm_text")
    ca = ft.toDF("conv_a", "ta")
    cb = ft.toDF("conv_b", "tb")
    j4 = dp.join(ca, "conv_a").join(cb, "conv_b")
    t("2 joins carry strings (texts)", lambda: j4.select(F.sum(F.length("ta") + F.length("tb"))).collect()[0][0])
    spark.stop()


if __name__ == "__main__":
    main()
