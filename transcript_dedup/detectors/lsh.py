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
    """conversations(minhash, n_shingles) -> (conv_a, conv_b, src='lsh').

    ONE shuffle: band keys are grouped once (collect_list of members per
    band key) and candidate pairs are generated MAP-SIDE from each group's
    member list — the former sizes-groupBy + join-back + salted self-join
    (two more 10M-row exchanges, the dominant bandwidth-bound waves in the
    240k profile) collapse into per-group combination expressions. Group
    fan-out stays bounded exactly as before:

      sz > band_key_drop             -> stop-band, no pairs (counted);
      band_key_cap < sz <= drop      -> members salted with
                                        pmod(xxhash64(conv_id), ceil(sz/cap))
                                        (bounded by band_salt_max); pairs
                                        only within a salt subgroup — the
                                        identical pair set the salted
                                        self-join produced;
      sz <= cap                      -> all within-group pairs (<= cap^2/2).

    Most band keys are singletons (~4.4M distinct keys for 5M rows at 120k),
    so the per-group lists stay tiny and the emitted pair count is unchanged.
    Duplicate pairs across bands are absorbed by the verify stage's
    groupBy(conv_a, conv_b), as before.
    """
    keys = band_keys(conv, cfg)
    groups = keys.groupBy("band_id", "band_hash").agg(
        F.collect_list("conv_id").alias("m")
    )
    sz = F.size("m")

    if counters is not None:
        stats = groups.agg(
            F.sum(F.when(sz > cfg.band_key_drop, sz)).alias("dropped_rows"),
            F.sum((sz > cfg.band_key_drop).cast("long")).alias("dropped_keys"),
            F.sum(
                ((sz > cfg.band_key_cap) & (sz <= cfg.band_key_drop)).cast("long")
            ).alias("salted_keys"),
        ).collect()[0]
        counters["lsh_stop_band_rows"] = int(stats["dropped_rows"] or 0)
        counters["lsh_stop_band_keys"] = int(stats["dropped_keys"] or 0)
        counters["lsh_salted_keys"] = int(stats["salted_keys"] or 0)

    n_salts = F.least(F.lit(cfg.band_salt_max), F.ceil(sz / F.lit(cfg.band_key_cap)))

    def salt(x):
        return F.when(sz > cfg.band_key_cap, F.pmod(F.xxhash64(x), n_salts)).otherwise(
            F.lit(0)
        )

    pair_structs = F.flatten(
        F.transform(
            F.col("m"),
            lambda x, i: F.transform(
                F.filter(
                    # elements strictly after position i (slice is 1-based)
                    F.slice(F.col("m"), i + F.lit(2), F.size("m")),
                    lambda y: salt(x) == salt(y),
                ),
                lambda y: F.struct(
                    F.least(x, y).alias("conv_a"), F.greatest(x, y).alias("conv_b")
                ),
            ),
        )
    )
    return (
        groups.filter((sz >= 2) & (sz <= cfg.band_key_drop))
        .select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.conv_a").alias("conv_a"),
            F.col("p.conv_b").alias("conv_b"),
            F.lit("lsh").alias("src"),
        )
    )
