"""Exact-duplicate detector: content-hash grouping.

Graft analogue of the reference's artist+title exact match
(/root/reference/src/duplicates.ts:97-108): two conversations are exact
duplicates iff their F1-normalized reconstructed texts are equal (equality
checked via xxhash64; the verify stage additionally requires
est_jaccard == 1.0 — identical texts yield identical minhash arrays — so a
64-bit content-hash collision cannot create a false merge on its own;
verify.py m_content).

Scale design: the reference's all-pairs loop would emit O(k^2) pairs per
k-sized duplicate group. We emit **star edges** (group representative ->
every other member) — k-1 edges — which yields the identical transitive
closure after connected components, without the quadratic blowup. One window
over a hash-partitioned-by-content_hash exchange; no join.

Ids: edges are keyed by ``cid`` (the dictionary-encoded long id,
signatures.add_signatures) and canonically oriented by cid so the verify
stage's pair groupBy merges this arm with the LSH/substring arms. The
representative stays the STRING-min member (struct-min over (conv_id, cid))
— the anchor choice is part of the external contract (the DuckDB
transcript_decisions oracle reproduces string-min star edges), and the
transitive closure is anchor-invariant either way.

Empty documents (norm_text = '') never match — the analogue of the
reference's null-tag rejection (checkArtistTitleMatch returns false on
missing fields, duplicates.ts:97-101).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_candidates(conv: DataFrame) -> DataFrame:
    """conversations -> (conv_a, conv_b, src='exact') star edges, cid-keyed."""
    w = Window.partitionBy("content_hash")
    nonempty = conv.filter(F.length("norm_text") > 0).select(
        "content_hash", "conv_id", "cid"
    )
    # struct-min orders by conv_id first: rep = cid of the string-min member
    rep = nonempty.withColumn("rep", F.min(F.struct("conv_id", "cid")).over(w))
    return (
        rep.filter(F.col("conv_id") != F.col("rep.conv_id"))
        .select(
            F.least(F.col("rep.cid"), F.col("cid")).alias("conv_a"),
            F.greatest(F.col("rep.cid"), F.col("cid")).alias("conv_b"),
            F.lit("exact").alias("src"),
        )
    )
