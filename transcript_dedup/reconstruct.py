"""Turns -> conversations reconstruction + per-conversation features.

Graft analogue of the reference's per-file metadata extraction
(/root/reference/src/metadata.ts:8-38): a conversation record = all turns of
one conv_id reconstructed under **stable (conv_id, turn_idx) ordering**
(input_hint invariant). Implemented entirely with built-in expressions:
``sort_array(collect_list(struct(turn_idx, ...)))`` is deterministic under
any partitioning (unlike bare collect_list), then the struct array is
projected back out with ``transform`` — no Python in this stage.

Scale note: this is one hash-aggregate shuffle keyed by conv_id. Monster
conversations (skewed conv_id) are bounded by the 64-turn generator cap here;
at 10^12-turn scale the same plan holds because the agg is hash-based and
spills, and per-key payload is bounded by max conversation length, not corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .normalize import normalize_text


def reconstruct_conversations(turns: DataFrame, keep_doc_text: bool = False) -> DataFrame:
    """turns(conv_id, turn_idx, role, text, tool, ts) -> one row per conv.

    Output columns:
      conv_id, turn_count, total_chars, first_ts, last_ts,
      role_seq (ordered roles, '|' joined), tool_set (sorted distinct tools),
      doc_text (raw turn texts joined with '\\n' in turn order),
      norm_text (F1-normalized doc_text), content_hash (xxhash64 of norm_text),
      completeness (fraction of non-empty turn texts)
    """
    ordered = F.sort_array(
        F.collect_list(F.struct("turn_idx", "text", "role"))
    )
    conv = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("int").alias("turn_count"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        ordered.alias("_turns"),
        F.sort_array(F.collect_set(F.nullif("tool", F.lit("")))).alias("tool_set"),
        F.avg((F.length(F.trim("text")) > 0).cast("double")).alias("completeness"),
    )
    conv = conv.withColumn(
        "doc_text", F.concat_ws("\n", F.transform("_turns", lambda t: t["text"]))
    ).withColumn(
        "role_seq", F.concat_ws("|", F.transform("_turns", lambda t: t["role"]))
    )
    conv = conv.drop("_turns")
    conv = conv.withColumn("norm_text", normalize_text("doc_text"))
    conv = conv.withColumn("content_hash", F.xxhash64("norm_text"))
    if not keep_doc_text:
        # doc_text is ~half the row width and nothing downstream reads it
        # (norm_text drives hashing, signatures, and substring verify) —
        # dropping it halves Arrow transfer into the kernel and the persist
        # footprint
        conv = conv.drop("doc_text")
    return conv


def turns_normalized(turns: DataFrame) -> DataFrame:
    """Per-turn normalized text (for the per-turn equality invariant vs the
    Python oracle under stable (conv_id, turn_idx) ordering)."""
    return turns.select(
        "conv_id", "turn_idx", normalize_text("text").alias("norm_turn_text")
    )
