"""Connected components: equivalence with the Python BFS closure, chains,
convergence counters."""

from __future__ import annotations

import pandas as pd

from transcript_dedup.cluster import connected_components
from transcript_dedup.config import DedupConfig
from transcript_dedup.oracle import transitive_closure


def _cc(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["conv_a", "conv_b"]))
    counters: dict = {}
    out = connected_components(df, DedupConfig(), counters)
    got = {r["conv_id"]: r["component_id"] for r in out.collect()}
    return got, counters


def test_simple_chain(spark):
    got, counters = _cc(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    assert counters["cc_iterations"] >= 1


def test_matches_python_bfs(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    nodes = [f"n{i:03d}" for i in range(80)]
    edges = set()
    for _ in range(60):
        a, b = rng.choice(80, size=2, replace=False)
        edges.add(tuple(sorted((nodes[a], nodes[b]))))
    got, _ = _cc(spark, sorted(edges))
    want = transitive_closure(edges)
    assert got == want


def test_long_path_converges(spark):
    # a path graph has maximal diameter — worst case for label propagation
    n = 33
    edges = [(f"p{i:02d}", f"p{i+1:02d}") for i in range(n - 1)]
    got, counters = _cc(spark, edges)
    assert set(got.values()) == {"p00"}
    assert counters["cc_iterations"] <= DedupConfig().cc_max_iters
