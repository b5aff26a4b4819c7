"""Incremental dedup via Structured Streaming (foreachBatch).

The reference is batch-only with file-based resume (SURVEY.md 2.10); the
engine's snapshot/anti-join resume covers that. This module adds the
streaming growth path the metrics design left room for: new transcript
files land in a directory, each micro-batch is deduplicated **against the
already-committed corpus** — detector joins run new-vs-all, never
all-vs-all, so per-batch cost is proportional to batch size, not corpus
size:

  exact:   xxhash64(new) equi-join against stored content hashes
  LSH:     band keys of new equi-join band keys of (stored + new)
  (substring runs in the batch pipeline; its gram index is corpus-global
   and is intentionally not maintained incrementally in v1 — documented.)

State lives in the same TableIO snapshot tables as the batch pipeline
(conversations, candidate_pairs, components, decisions), so a stream can
take over from a batch bootstrap and vice versa; Structured Streaming's
checkpointLocation provides exactly-once micro-batch tracking on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cluster import connected_components
from .config import DedupConfig
from .decide import make_decisions
from .detectors.lsh import band_keys
from .detectors.verify import verify_candidates
from .io import TableIO
from .reconstruct import reconstruct_conversations
from .signatures import add_signatures

TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def _incremental_candidates(new: DataFrame, all_: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Candidates touching at least one NEW conversation (new-vs-all)."""
    # exact: new hashes probe all hashes
    nh = new.filter(F.length("norm_text") > 0).select(
        F.col("conv_id").alias("n_id"), "content_hash"
    )
    ah = all_.filter(F.length("norm_text") > 0).select(
        F.col("conv_id").alias("a_id"), "content_hash"
    )
    exact = (
        nh.join(ah, "content_hash")
        .filter(F.col("n_id") != F.col("a_id"))
        .select(
            F.least("n_id", "a_id").alias("conv_a"),
            F.greatest("n_id", "a_id").alias("conv_b"),
            F.lit("exact").alias("src"),
        )
    )
    # LSH: band keys of new probe band keys of all
    nb = band_keys(new, cfg).withColumnRenamed("conv_id", "n_id")
    ab = band_keys(all_, cfg).withColumnRenamed("conv_id", "a_id")
    lsh = (
        nb.join(ab, ["band_id", "band_hash"])
        .filter(F.col("n_id") != F.col("a_id"))
        .select(
            F.least("n_id", "a_id").alias("conv_a"),
            F.greatest("n_id", "a_id").alias("conv_b"),
            F.lit("lsh").alias("src"),
        )
    )
    return exact.unionByName(lsh)


class StreamingDedup:
    def __init__(self, spark: SparkSession, out_dir: str, cfg: DedupConfig | None = None):
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.io = TableIO(out_dir)

    # -- state ----------------------------------------------------------
    def _stored_conversations(self) -> DataFrame | None:
        if self.io.current_snapshot("conversations") is None:
            return None
        return self.io.read(self.spark, "conversations")

    def _stored_pairs(self) -> DataFrame | None:
        if self.io.current_snapshot("candidate_pairs") is None:
            return None
        return self.io.read(self.spark, "candidate_pairs")

    # -- one micro-batch --------------------------------------------------
    def process_batch(self, turns_batch: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        new = add_signatures(reconstruct_conversations(turns_batch), cfg).persist()
        if new.isEmpty():
            return
        stored = self._stored_conversations()
        if stored is not None:
            # last-write-wins on re-delivered conv_ids (S5 semantics)
            stored = stored.join(new.select("conv_id"), "conv_id", "left_anti")
            all_ = stored.unionByName(new).persist()
        else:
            all_ = new
        cand = _incremental_candidates(new, all_, cfg)
        new_pairs = verify_candidates(cand, all_, cfg)
        prev = self._stored_pairs()
        if prev is not None:
            # drop stored pairs that touch re-delivered convs, then append
            prev = prev.join(
                new.select(F.col("conv_id").alias("conv_a")), "conv_a", "left_anti"
            ).join(new.select(F.col("conv_id").alias("conv_b")), "conv_b", "left_anti")
            pairs = prev.unionByName(new_pairs.select(*prev.columns))
        else:
            pairs = new_pairs
        pairs = pairs.persist()

        comps = connected_components(pairs.filter("is_match"), cfg)
        decisions = make_decisions(comps, all_, pairs, cfg)

        fp = f"stream-batch-{batch_id}"
        self.io.write(all_, "conversations", fingerprint=fp)
        self.io.write(pairs, "candidate_pairs", fingerprint=fp)
        self.io.write(comps, "components", fingerprint=fp)
        self.io.write(decisions, "decisions", fingerprint=fp)
        new.unpersist()
        pairs.unpersist()

    # -- the stream -------------------------------------------------------
    def start(self, input_dir: str, checkpoint_dir: str, available_now: bool = True):
        stream = (
            self.spark.readStream.schema(TURNS_SCHEMA)
            .option("maxFilesPerTrigger", 16)
            .parquet(input_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
