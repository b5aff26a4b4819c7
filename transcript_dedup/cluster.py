"""Connected components over duplicate-pair edges (clustering stage).

Distributed replacement for the reference's driver-memory BFS
(``findConnectedFiles``, /root/reference/src/resolve-conflicts.ts:114-135)
and the documented transitive grouping (README.md:60): iterative
min-label propagation ("hash-to-min" style, Rastogi et al. 2013):

    labels(v) <- min(labels(v), min over neighbors u of labels(u))

repeated to fixpoint. Each iteration is one shuffle (join + groupBy-min);
convergence takes O(max component diameter) rounds — duplicate clusters are
shallow, so this is a handful of rounds even at 10^12-turn scale. Lineage is
truncated every iteration with ``localCheckpoint`` (SURVEY.md 4.2), and the
per-iteration changed-label count lands in ``counters`` for the metrics
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DedupConfig


def connected_components(
    edges: DataFrame, cfg: DedupConfig | None = None, counters: dict | None = None
) -> DataFrame:
    """edges(conv_a, conv_b) -> (conv_id, component_id).

    component_id = lexicographic min conv_id of the component. Only nodes
    that appear in an edge are emitted (singletons are not duplicates —
    matching the reference, where only grouped files get decisions).
    """
    cfg = cfg or DedupConfig()
    e = edges.select("conv_a", "conv_b")
    sym = e.unionByName(
        e.select(F.col("conv_b").alias("conv_a"), F.col("conv_a").alias("conv_b"))
    )
    # adjacency is reused every iteration — persist once, repartitioned by src
    sym = sym.repartition("conv_a").persist()

    labels = (
        sym.select(F.col("conv_a").alias("conv_id"))
        .distinct()
        .withColumn("label", F.col("conv_id"))
        .localCheckpoint()
    )

    iters = 0
    for it in range(cfg.cc_max_iters):
        iters = it + 1
        msgs = (
            sym.join(labels, sym.conv_b == labels.conv_id, "inner")
            .select(F.col("conv_a").alias("conv_id"), "label")
        )
        new_labels = (
            msgs.unionByName(labels)
            .groupBy("conv_id")
            .agg(F.min("label").alias("label"))
        )
        new_labels = new_labels.localCheckpoint()  # truncate lineage per round
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "conv_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if counters is not None:
            counters[f"cc_changed_iter_{iters}"] = changed
        if changed == 0:
            break
    if counters is not None:
        counters["cc_iterations"] = iters
    sym.unpersist()
    return labels.select("conv_id", F.col("label").alias("component_id"))
