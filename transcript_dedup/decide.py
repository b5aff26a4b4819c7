"""Per-component representative selection + decisions + conflict invariant.

Deterministic dataflow replacement of the reference's interactive review +
auto-decider (/root/reference/src/auto-decider.ts:233-288): one decision per
connected component (which also makes the reference's greedy overlap
suppression, auto-decider.ts:248-266, moot — a file belongs to exactly one
component).

Rule cascade (``applyRule``, auto-decider.ts:125-177: a rule wins only if its
winner is *strictly* better than the runner-up, else fall through):

  keep-most-complete   unique max completeness   ~ prefer-lossless (:31-44)
  keep-longest         unique max total_chars    ~ prefer-higher-bitrate (:46-56)
  keep-earliest        unique min first_ts       ~ most-metadata analogue
  keep-first-id        min conv_id               (deterministic fallback —
                                                  Spark partition order is
                                                  nondeterministic, SURVEY 4.3)

decision_type: 'auto' when every matched pair inside the component clears the
confidence threshold (auto-decider.ts:196-202), else 'needs_review' (the
interactive branch becomes a flag, SURVEY 2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .config import DedupConfig


def select_representatives(components: DataFrame, conv: DataFrame) -> DataFrame:
    """(conv_id, component_id) + conversations -> per-member ranking with the
    winning rule. Output: component_id, conv_id, is_keep, rule_applied."""
    m = components.join(
        conv.select("conv_id", "completeness", "total_chars", "first_ts"), "conv_id"
    )
    w = Window.partitionBy("component_id")

    def unique_max(col, asc=False):
        target = F.min(col).over(w) if asc else F.max(col).over(w)
        is_best = F.col(col) == target
        n_best = F.sum(is_best.cast("int")).over(w)
        return is_best & (n_best == 1)

    m = (
        m.withColumn("win_complete", unique_max("completeness"))
        .withColumn("win_length", unique_max("total_chars"))
        .withColumn("win_earliest", unique_max("first_ts", asc=True))
        .withColumn("win_first_id", F.col("conv_id") == F.min("conv_id").over(w))
    )
    # does any member win at rule k? (if not, the rule tied -> fall through)
    any_ = lambda c: F.max(F.col(c).cast("int")).over(w) == 1  # noqa: E731
    rule = (
        F.when(any_("win_complete"), F.lit("keep-most-complete"))
        .when(any_("win_length"), F.lit("keep-longest"))
        .when(any_("win_earliest"), F.lit("keep-earliest"))
        .otherwise(F.lit("keep-first-id"))
    )
    is_keep = (
        F.when(any_("win_complete"), F.col("win_complete"))
        .when(any_("win_length"), F.col("win_length"))
        .when(any_("win_earliest"), F.col("win_earliest"))
        .otherwise(F.col("win_first_id"))
    )
    return m.select(
        "component_id", "conv_id", is_keep.alias("is_keep"), rule.alias("rule_applied")
    )


def make_decisions(
    components: DataFrame,
    conv: DataFrame,
    pairs: DataFrame,
    cfg: DedupConfig,
) -> DataFrame:
    """-> decisions(group_id, keep array, delete array, rule_applied,
    decision_type, min_confidence, size)."""
    ranked = select_representatives(components, conv)

    # min matched-pair confidence per component (confidence gate,
    # auto-decider.ts:196)
    pair_conf = (
        pairs.filter("is_match")
        .join(
            components.select(
                F.col("conv_id").alias("conv_a"), "component_id"
            ),
            "conv_a",
        )
        .groupBy("component_id")
        .agg(F.min("confidence").alias("min_confidence"))
    )

    # metadata-field disagreement per component (compareMetadataFields,
    # /root/reference/src/auto-decider.ts:75-108: differing fields flag the
    # decision for metadata review) — transcript fields: role_seq, tool_set,
    # turn_count
    meta_diff = (
        components.join(
            conv.select("conv_id", "role_seq", "tool_set", "turn_count"), "conv_id"
        )
        .groupBy("component_id")
        .agg(
            F.filter(
                F.array(
                    F.when(F.count_distinct("role_seq") > 1, F.lit("role_seq")),
                    F.when(
                        F.count_distinct(F.to_json(F.struct("tool_set"))) > 1,
                        F.lit("tool_set"),
                    ),
                    F.when(F.count_distinct("turn_count") > 1, F.lit("turn_count")),
                ),
                lambda x: x.isNotNull(),
            ).alias("meta_differences")
        )
    )

    dec = (
        ranked.groupBy("component_id", "rule_applied")
        .agg(
            F.sort_array(F.collect_list(F.when(F.col("is_keep"), F.col("conv_id")))).alias(
                "keep"
            ),
            F.sort_array(
                F.collect_list(F.when(~F.col("is_keep"), F.col("conv_id")))
            ).alias("delete"),
            F.count("*").cast("int").alias("size"),
        )
        .join(pair_conf, "component_id", "left")
        .join(meta_diff, "component_id", "left")
        .select(
            F.col("component_id").alias("group_id"),
            "keep",
            "delete",
            "rule_applied",
            F.when(
                F.coalesce("min_confidence", F.lit(0)) >= cfg.confidence_threshold,
                F.lit("auto"),
            )
            .otherwise(F.lit("needs_review"))
            .alias("decision_type"),
            F.coalesce("min_confidence", F.lit(0)).alias("min_confidence"),
            "size",
            F.coalesce("meta_differences", F.array().cast("array<string>")).alias(
                "meta_differences"
            ),
            (F.size(F.coalesce("meta_differences", F.array().cast("array<string>"))) > 0).alias(
                "needs_metadata_review"
            ),
        )
    )
    return dec


def find_conflicts(decisions: DataFrame) -> DataFrame:
    """keep-and-delete conflict detector (J7 —
    /root/reference/src/find-conflicts.ts:24-59, verify-no-conflicts.ts:19-47).
    Returns (conv_id, n_actions, actions) rows that violate the invariant —
    must be empty."""
    exploded = decisions.select(
        F.col("group_id"), F.explode("keep").alias("conv_id"), F.lit("keep").alias("action")
    ).unionByName(
        decisions.select(
            F.col("group_id"), F.explode("delete").alias("conv_id"), F.lit("delete").alias("action")
        )
    )
    return (
        exploded.groupBy("conv_id")
        .agg(F.collect_set("action").alias("actions"), F.count("*").alias("n_actions"))
        .filter(F.size("actions") > 1)
    )
