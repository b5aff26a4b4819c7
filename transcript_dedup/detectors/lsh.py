"""MinHash/LSH banded candidate join with explicit two-pass skew mitigation.

Scale replacement for the reference's O(n^2) nested-loop comparator
(/root/reference/src/duplicates.ts:19-39): each conversation's MinHash
signature is split into ``bands`` bands of ``rows`` values; a band key is
``xxhash64(band_id, slice(signature))``; conversations colliding on any band
key become candidates. All band arithmetic is built-in expressions
(JVM/codegen) — the signature itself was computed upstream by the Arrow
kernel.

Skew story (SURVEY.md section 4.2 — the custom half on top of AQE):
boilerplate-dominated bands produce degenerate keys whose within-key pair
count is quadratic; AQE can split partitions but cannot cut Cartesian
semantics. Two-pass mitigation:

  pass 1: count band-key group sizes.
  pass 2: keys with size > ``band_key_drop``  -> dropped entirely
          (stop-bands, counted + reported);
          keys with size > ``band_key_cap``   -> salted with
          ``pmod(xxhash64(conv_id), band_salt)`` — within-key recall drops to
          ~1/salt for that band, but a true near-dup pair collides on several
          independent bands, so union recall survives (measured by the
          oracle recall test);
          ordinary keys join unsalted.

Pairs are deduped across bands with a ``distinct()`` (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig


def band_keys(conv: DataFrame, cfg: DedupConfig) -> DataFrame:
    """conversations -> (conv_id, band_id, band_hash); empty docs skipped."""
    # explicit per-band expressions (codegen) instead of
    # transform(sequence(...), lambda) — HigherOrderFunctions run in the
    # expression interpreter; 42 unrolled xxhash64(slice) terms compile
    bands_arr = F.array(
        *[
            F.xxhash64(F.lit(b), F.slice("minhash", b * cfg.lsh_rows + 1, cfg.lsh_rows))
            for b in range(cfg.lsh_bands)
        ]
    )
    return (
        conv.filter(F.col("n_shingles") > 0)
        .select("conv_id", F.posexplode(bands_arr).alias("band_id", "band_hash"))
    )


def lsh_candidates(
    conv: DataFrame, cfg: DedupConfig, counters: dict | None = None
) -> DataFrame:
    """conversations(minhash, n_shingles) -> (conv_a, conv_b, src='lsh')."""
    keys = band_keys(conv, cfg)

    # pass 1: band-key group sizes. A window count would be one exchange
    # instead of two, but window exec sorts every partition — measured
    # slower than hash-agg + join-back at 10M+ keys; keep the groupBy.
    sizes = keys.groupBy("band_id", "band_hash").agg(F.count("*").alias("sz"))

    if counters is not None:
        stats = sizes.agg(
            F.sum(F.when(F.col("sz") > cfg.band_key_drop, F.col("sz"))).alias("dropped_rows"),
            F.sum((F.col("sz") > cfg.band_key_drop).cast("long")).alias("dropped_keys"),
            F.sum(
                ((F.col("sz") > cfg.band_key_cap) & (F.col("sz") <= cfg.band_key_drop)).cast("long")
            ).alias("salted_keys"),
        ).collect()[0]
        counters["lsh_stop_band_rows"] = int(stats["dropped_rows"] or 0)
        counters["lsh_stop_band_keys"] = int(stats["dropped_keys"] or 0)
        counters["lsh_salted_keys"] = int(stats["salted_keys"] or 0)

    # pass 2: drop stop-bands, dynamically salt hot keys so subgroups stay
    # ~cap-sized.
    n_salts = F.least(
        F.lit(cfg.band_salt_max), F.ceil(F.col("sz") / F.lit(cfg.band_key_cap))
    )
    keyed = (
        keys.join(sizes, ["band_id", "band_hash"], "inner")
        .filter(F.col("sz") <= cfg.band_key_drop)
        .withColumn(
            "salt",
            F.when(
                F.col("sz") > cfg.band_key_cap,
                F.pmod(F.xxhash64("conv_id"), n_salts),
            ).otherwise(F.lit(0)),
        )
        .select("band_id", "band_hash", "salt", "conv_id")
    )

    # keyed is both sides of the self-join — persist so the band explode +
    # size join pipeline runs once (the join's two shuffle-map stages run
    # sequentially, so lazy persist is enough)
    keyed = keyed.persist()
    a = keyed.alias("a")
    b = keyed.alias("b")
    # no pre-distinct: the verify stage's groupBy(conv_a, conv_b) absorbs
    # duplicate band collisions — one fewer shuffle here
    pairs = (
        a.join(b, ["band_id", "band_hash", "salt"], "inner")
        .filter(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(
            F.col("a.conv_id").alias("conv_a"),
            F.col("b.conv_id").alias("conv_b"),
        )
        .withColumn("src", F.lit("lsh"))
    )
    return pairs
