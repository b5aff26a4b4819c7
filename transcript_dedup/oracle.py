"""Slow exact Python oracle — reference-parity semantics (SURVEY.md 5.2(1)).

Reimplements the pipeline's match semantics the way the reference computes
duplicates: an all-pairs nested loop over in-memory records
(/root/reference/src/duplicates.ts:19-39) followed by transitive closure
(BFS, /root/reference/src/resolve-conflicts.ts:114-135). Shares the exact
numpy signature kernel (signatures.py) and normalizer twin (normalize.py)
with the Spark pipeline, so at identical shingle/signature config the two
sides compute over bit-identical signatures; the recall >= 0.99 target is
Spark's transitive-closure pair set vs this oracle's.

Gate (graft mapping of artistTitle || filename, duplicates.ts:56-58):
  exact      normalized texts equal (non-empty)
  fuzzy      some LSH band collides AND est-Jaccard >= tau AND
             SimHash Hamming <= r
  substring  one normalized text strictly contained in the other
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

from .config import DedupConfig
from .normalize import normalize_text_py
from .signatures import (
    band_tuples,
    est_jaccard,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash64,
)


class OracleRecord:
    __slots__ = ("conv_id", "norm_text", "sig", "sim", "bands", "n_shingles")

    def __init__(self, conv_id, norm_text, sig, sim, bands, n_shingles):
        self.conv_id = conv_id
        self.norm_text = norm_text
        self.sig = sig
        self.sim = sim
        self.bands = bands
        self.n_shingles = n_shingles


def build_records(turns_df: pd.DataFrame, cfg: DedupConfig) -> list[OracleRecord]:
    """Reconstruct + normalize + sign every conversation (stable
    (conv_id, turn_idx) ordering — the per-turn invariant)."""
    a, b = minhash_params(cfg)
    recs = []
    for conv_id, g in turns_df.sort_values(["conv_id", "turn_idx"]).groupby(
        "conv_id", sort=True
    ):
        doc = "\n".join(g["text"].tolist())
        norm = normalize_text_py(doc)
        sh = shingle_hashes(norm, cfg.shingle_k)
        sig = minhash_signature(sh, a, b)
        sim = int(simhash64(norm))
        recs.append(
            OracleRecord(
                conv_id, norm, sig, sim, set(band_tuples(sig, cfg.lsh_bands, cfg.lsh_rows)), sh.size
            )
        )
    return recs


def oracle_pairs(recs: list[OracleRecord], cfg: DedupConfig) -> set[tuple[str, str]]:
    """All-pairs nested loop (duplicates.ts:19-39 analogue)."""
    out: set[tuple[str, str]] = set()
    for i in range(len(recs)):
        ri = recs[i]
        for j in range(i + 1, len(recs)):
            rj = recs[j]
            if ri.n_shingles == 0 or rj.n_shingles == 0:
                continue
            exact = ri.norm_text == rj.norm_text
            fuzzy = False
            if ri.bands & rj.bands:
                ej = est_jaccard(ri.sig, rj.sig)
                ham = bin(ri.sim ^ rj.sim).count("1")
                # band collision AND (est-J >= tau OR Hamming <= r) — SimHash
                # is the alternative verifier (see config.py rationale)
                fuzzy = ej >= cfg.jaccard_threshold or ham <= cfg.hamming_radius
            substr = False
            if not exact:
                s, t = (ri, rj) if len(ri.norm_text) < len(rj.norm_text) else (rj, ri)
                if len(s.norm_text) < len(t.norm_text):
                    substr = s.norm_text in t.norm_text
            if exact or fuzzy or substr:
                pair = tuple(sorted((ri.conv_id, rj.conv_id)))
                out.add(pair)  # type: ignore[arg-type]
    return out


def transitive_closure(pairs: set[tuple[str, str]]) -> dict[str, str]:
    """BFS closure (resolve-conflicts.ts:114-135): node -> component id
    (min member)."""
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    comp: dict[str, str] = {}
    for start in sorted(adj):
        if start in comp:
            continue
        seen = {start}
        stack = [start]
        while stack:
            v = stack.pop()
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        label = min(seen)
        for v in seen:
            comp[v] = label
    return comp


def closure_pair_set(comp: dict[str, str]) -> set[tuple[str, str]]:
    groups = defaultdict(list)
    for v, c in comp.items():
        groups[c].append(v)
    out = set()
    for members in groups.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out.add((members[i], members[j]))
    return out


def recall(spark_pairs: set[tuple[str, str]], oracle: set[tuple[str, str]]) -> float:
    if not oracle:
        return 1.0
    return len(spark_pairs & oracle) / len(oracle)
