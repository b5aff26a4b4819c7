"""Micro-ablation of LSH + verify internals.

    python tools/ablate_lsh.py <cores> <corpus_parquet>
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2]

    from pyspark.sql import functions as F

    from transcript_dedup.config import DedupConfig
    from transcript_dedup.detectors.lsh import band_keys
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
        print(f"{name:<34} {time.perf_counter() - t0:7.2f}s   rows={n}")

    t("conv.count (kernel)", lambda: conv.count())
    keys = band_keys(conv, cfg)
    t("band_keys.count", lambda: keys.count())
    t("band_keys.count again", lambda: keys.count())
    keysp = keys.persist()
    t("band_keys persist+count", lambda: keysp.count())
    sizes = keysp.groupBy("band_id", "band_hash").agg(F.count("*").alias("sz"))
    t("sizes.count", lambda: sizes.count())
    keyed = (
        keysp.join(sizes, ["band_id", "band_hash"], "inner")
        .filter(F.col("sz") <= cfg.band_key_drop)
        .withColumn(
            "salt",
            F.when(
                F.col("sz") > cfg.band_key_cap,
                F.pmod(
                    F.xxhash64("conv_id"),
                    F.least(F.lit(cfg.band_salt_max), F.ceil(F.col("sz") / F.lit(cfg.band_key_cap))),
                ),
            ).otherwise(F.lit(0)),
        )
        .select("band_id", "band_hash", "salt", "conv_id")
        .persist()
    )
    t("keyed persist+count", lambda: keyed.count())
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(b, ["band_id", "band_hash", "salt"], "inner")
        .filter(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(F.col("a.conv_id").alias("conv_a"), F.col("b.conv_id").alias("conv_b"))
    )
    t("self-join from cached keyed", lambda: pairs.count())

    # est_jaccard cost: hydrate 250k pairs with both minhash arrays
    dp = pairs.distinct().persist()
    t("distinct pairs", lambda: dp.count())
    feats = conv.select("conv_id", "minhash")
    aa = feats.toDF("conv_a", "a_minhash")
    bb = feats.toDF("conv_b", "b_minhash")
    hyd = dp.join(aa, "conv_a").join(bb, "conv_b")
    t("hydrate joins only", lambda: hyd.count())
    ej = hyd.select(
        (
            F.aggregate(
                F.zip_with("a_minhash", "b_minhash", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            )
        ).alias("ej")
    )
    t("est_jaccard zip_with", lambda: ej.filter("ej >= 0").count())
    spark.stop()


if __name__ == "__main__":
    main()
