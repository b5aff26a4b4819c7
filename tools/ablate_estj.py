"""Microbench est_jaccard formulations + substring internals.

    python tools/ablate_estj.py <cores> <corpus_parquet>
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2]

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType

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

    dp = lsh_candidates(conv, cfg, None).select("conv_a", "conv_b").distinct()
    feats = conv.select("conv_id", "minhash")
    aa = feats.toDF("conv_a", "a_minhash")
    bb = feats.toDF("conv_b", "b_minhash")
    hyd = dp.join(aa, "conv_a").join(bb, "conv_b").persist()

    def t(name, fn):
        t0 = time.perf_counter()
        n = fn()
        print(f"{name:<34} {time.perf_counter() - t0:7.2f}s   rows={n}")

    t("hydrated persist+count", lambda: hyd.count())

    # v1: interpreted aggregate(zip_with)
    v1 = hyd.select(
        F.aggregate(
            F.zip_with("a_minhash", "b_minhash", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("m")
    )
    t("v1 aggregate(zip_with)", lambda: v1.filter("m >= 0").count())

    # v2: 126 explicit getItem comparisons (codegen)
    terms = [
        (F.col("a_minhash").getItem(i) == F.col("b_minhash").getItem(i)).cast("int")
        for i in range(cfg.num_perm)
    ]
    s = terms[0]
    for x in terms[1:]:
        s = s + x
    v2 = hyd.select(s.alias("m"))
    t("v2 126 explicit terms", lambda: v2.filter("m >= 0").count())
    t("v2 again", lambda: v2.filter("m >= 0").count())

    # v3: pandas UDF numpy
    import numpy as np

    @F.pandas_udf(IntegerType())
    def match_count(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.stack(a.to_numpy())
        bm = np.stack(b.to_numpy())
        return pd.Series((am == bm).sum(axis=1).astype("int32"))

    v3 = hyd.select(match_count("a_minhash", "b_minhash").alias("m"))
    t("v3 pandas_udf numpy", lambda: v3.filter("m >= 0").count())

    # substring internals
    from transcript_dedup.detectors.substring import _gram_pairs, _tiny_pairs

    t0 = time.perf_counter()
    gram_pairs, all_stopped, kept = _gram_pairs(conv, cfg, None)
    print(f"_gram_pairs build (incl kept.count barrier)  {time.perf_counter()-t0:7.2f}s")
    t("gram_pairs.count", lambda: gram_pairs.count())
    t("tiny_pairs.count", lambda: _tiny_pairs(conv, all_stopped, cfg, None).count())
    raw = gram_pairs.distinct().persist()
    t("raw distinct persist", lambda: raw.count())
    texts = conv.select("conv_id", "norm_text", F.length("norm_text").alias("len"))
    hyd2 = (
        raw.join(
            texts.select(F.col("conv_id").alias("conv_a"), F.col("norm_text").alias("text_a"), F.col("len").alias("len_a")),
            "conv_a",
        )
        .join(
            texts.select(F.col("conv_id").alias("conv_b"), F.col("norm_text").alias("text_b"), F.col("len").alias("len_b")),
            "conv_b",
        )
    )
    t("substr hydrate", lambda: hyd2.count())
    ver = hyd2.filter(
        (F.least("len_a", "len_b") < F.greatest("len_a", "len_b"))
        & F.expr(
            "instr(if(len_a < len_b, text_b, text_a), if(len_a < len_b, text_a, text_b)) > 0"
        )
    )
    t("substr instr verify", lambda: ver.count())
    spark.stop()


if __name__ == "__main__":
    main()
