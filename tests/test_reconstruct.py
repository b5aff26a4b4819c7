"""Reconstruction invariants (input_hint): stable (conv_id, turn_idx)
ordering, per-turn text equality vs the plain-Python oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from transcript_dedup.normalize import normalize_text_py
from transcript_dedup.reconstruct import reconstruct_conversations, turns_normalized


def test_doc_reconstruction_matches_python(spark, turns200, corpus200):
    turns_pdf, _ = corpus200
    conv = reconstruct_conversations(turns200, keep_doc_text=True)
    got = {r["conv_id"]: r["doc_text"] for r in conv.select("conv_id", "doc_text").collect()}
    want = {
        cid: "\n".join(g.sort_values("turn_idx")["text"])
        for cid, g in turns_pdf.groupby("conv_id")
    }
    assert got == want


def test_norm_text_matches_python(spark, turns200, corpus200):
    turns_pdf, _ = corpus200
    conv = reconstruct_conversations(turns200)
    got = {r["conv_id"]: r["norm_text"] for r in conv.select("conv_id", "norm_text").collect()}
    for cid, g in turns_pdf.groupby("conv_id"):
        want = normalize_text_py("\n".join(g.sort_values("turn_idx")["text"]))
        assert got[cid] == want, cid


def test_per_turn_equality(spark, turns200, corpus200):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the input_hint's per-row invariant."""
    turns_pdf, _ = corpus200
    got = (
        turns_normalized(turns200)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = turns_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["conv_id"].values == want["conv_id"].values).all()
    assert (got["turn_idx"].values == want["turn_idx"].values).all()
    for g, w in zip(got["norm_turn_text"], want["text"]):
        assert g == normalize_text_py(w)


def test_features(spark, turns200, corpus200):
    turns_pdf, _ = corpus200
    conv = reconstruct_conversations(turns200)
    row = conv.orderBy("conv_id").first()
    g = turns_pdf[turns_pdf.conv_id == row["conv_id"]]
    assert row["turn_count"] == len(g)
    assert row["total_chars"] == int(g.text.str.len().sum())
    assert row["first_ts"] == g.ts.min()
    assert row["last_ts"] == g.ts.max()
    ordered_roles = "|".join(g.sort_values("turn_idx")["role"])
    assert row["role_seq"] == ordered_roles
    # deterministic under different partitioning
    conv2 = reconstruct_conversations(turns200.repartition(7, "turn_idx"))
    h1 = conv.select("conv_id", "content_hash").orderBy("conv_id").collect()
    h2 = conv2.select("conv_id", "content_hash").orderBy("conv_id").collect()
    assert h1 == h2
