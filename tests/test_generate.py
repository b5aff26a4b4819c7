"""Corpus generator: determinism, schema, planted families."""

from __future__ import annotations

from transcript_dedup.generate import generate_corpus


def test_deterministic():
    t1, g1 = generate_corpus(120, seed=42)
    t2, g2 = generate_corpus(120, seed=42)
    assert t1.equals(t2) and g1.equals(g2)


def test_schema_and_ordering(corpus200):
    turns, truth = corpus200
    assert list(turns.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(turns.turn_idx.dtype) == "int32"
    # (conv_id, turn_idx) unique; ts monotone within conversation
    assert not turns.duplicated(["conv_id", "turn_idx"]).any()
    g = turns.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
    assert (g.apply(lambda s: s.is_monotonic_increasing)).all()


def test_families_planted(corpus200):
    turns, truth = corpus200
    fams = set(truth.family)
    assert {"exact", "near", "substring", "chain", "boilerplate", "singleton"} <= fams
    # exact dups really are text-identical under turn ordering
    by_conv = {
        cid: list(g.sort_values("turn_idx")["text"])
        for cid, g in turns.groupby("conv_id")
    }
    exact = truth[truth.family == "exact"]
    clusters = exact.groupby("truth_cluster_id").conv_id.apply(list)
    checked = 0
    for members in clusters:
        if len(members) == 2:
            assert by_conv[members[0]] == by_conv[members[1]]
            checked += 1
    assert checked > 0
    # no two distinct truth clusters share identical full text
    full = {cid: "\n".join(t) for cid, t in by_conv.items()}
    tmap = dict(zip(truth.conv_id, truth.truth_cluster_id))
    seen: dict[str, str] = {}
    for cid, doc in full.items():
        if doc in seen:
            assert tmap[seen[doc]] == tmap[cid], "identical text across truth clusters"
        else:
            seen[doc] = cid


def test_substring_family_contained(corpus200):
    turns, truth = corpus200
    from transcript_dedup.normalize import normalize_text_py

    docs = {
        cid: normalize_text_py("\n".join(g.sort_values("turn_idx")["text"]))
        for cid, g in turns.groupby("conv_id")
    }
    sub = truth[truth.family == "substring"]
    for cluster_id, members in sub.groupby("truth_cluster_id").conv_id.apply(list).items():
        if len(members) != 2:
            continue
        a, b = sorted(members, key=lambda c: len(docs[c]))
        assert docs[a] in docs[b]
