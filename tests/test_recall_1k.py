"""Reference-parity recall gate at the SURVEY 5.2(1) scale (~1-2k convs):
Spark transitive-closure pair set vs the all-pairs Python oracle at
identical shingle/signature config — the north-rule >=0.99 criterion."""

from __future__ import annotations

from transcript_dedup.generate import corpus_to_spark, generate_corpus
from transcript_dedup.oracle import (
    build_records,
    closure_pair_set,
    oracle_pairs,
    recall,
    transitive_closure,
)
from transcript_dedup.pipeline import closure_pairs, run_dedup_dataframes
from transcript_dedup.reconstruct import reconstruct_conversations
from transcript_dedup.signatures import add_signatures


def test_recall_1000_convs(spark, cfg):
    turns_pdf, truth = generate_corpus(1000, seed=42)
    conv = add_signatures(
        reconstruct_conversations(corpus_to_spark(spark, turns_pdf)), cfg
    )
    res = run_dedup_dataframes(conv, cfg)
    spark_cp = {
        (r["conv_a"], r["conv_b"]) for r in closure_pairs(res["components"]).collect()
    }
    ocp = closure_pair_set(
        transitive_closure(oracle_pairs(build_records(turns_pdf, cfg), cfg))
    )
    r = recall(spark_cp, ocp)
    assert r >= 0.99, (r, len(ocp - spark_cp))
    assert len(spark_cp - ocp) == 0, list(spark_cp - ocp)[:5]
