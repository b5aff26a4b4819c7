"""F8/F9 weighted-score representative selector (score.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from transcript_dedup.score import additive_score, weighted_representatives


def _members(spark):
    # group g1: b wins on prefix weight despite shorter text; group g2: tie
    # on score -> min id keeps
    rows = [
        ("g1", "a", "mirror/x", "en", 100),
        ("g1", "b", "src0/y", "en", 40),
        ("g1", "c", "other", "de", 60),
        ("g2", "d", "other", "en", 50),
        ("g2", "e", "other", "en", 50),
    ]
    return spark.createDataFrame(
        rows, "component_id string, conv_id string, source string, lang string, n_chars long"
    )


def test_weighted_scorer_prefix_deny_numeric(spark):
    score = additive_score(
        prefix_rules=[("source", "src0", 40.0), ("source", "mirror/", -10.0)],
        value_rules=[("lang", "de", 5.0)],
        numeric_weights=[("n_chars", 0.01)],
    )
    out = weighted_representatives(_members(spark), score).collect()
    by_id = {r["conv_id"]: r for r in out}
    # a: -10 + 1.0 = -9; b: 40 + 0.4 = 40.4; c: 5 + 0.6 = 5.6
    assert abs(by_id["a"]["score"] - (-9.0)) < 1e-9
    assert abs(by_id["b"]["score"] - 40.4) < 1e-9
    assert abs(by_id["c"]["score"] - 5.6) < 1e-9
    assert [r["conv_id"] for r in out if r["is_keep"] and r["component_id"] == "g1"] == ["b"]


def test_weighted_scorer_tie_breaks_to_min_id(spark):
    score = additive_score(numeric_weights=[("n_chars", 0.01)])
    out = weighted_representatives(_members(spark), score).collect()
    g2_keep = [r["conv_id"] for r in out if r["is_keep"] and r["component_id"] == "g2"]
    assert g2_keep == ["d"]  # equal scores -> min conv_id
    # exactly one keeper per group
    keeps = [r for r in out if r["is_keep"]]
    assert len(keeps) == 2


def test_weighted_scorer_null_numeric_is_zero(spark):
    df = spark.createDataFrame(
        [("g", "x", None), ("g", "y", 10)],
        "component_id string, conv_id string, n_chars long",
    )
    score = additive_score(numeric_weights=[("n_chars", 1.0)])
    out = {r["conv_id"]: r for r in weighted_representatives(df, score).collect()}
    assert out["x"]["score"] == 0.0
    assert out["y"]["is_keep"] and not out["x"]["is_keep"]
