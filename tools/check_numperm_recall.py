"""Decision-quality gate for the num_perm ablation: planted-truth recall
and false-merge check of the pure-Python all-pairs oracle at num_perm=96
(32x3 bands) vs the default 126 (42x3).

The engine's recall target is self-referential (Spark vs oracle at
IDENTICAL config — tests/test_recall_1k), so changing num_perm cannot break
that gate by construction; what it CAN change is detection quality against
the generator's planted truth (the 'near' family's banded collision
probability drops as bands shrink). This tool measures exactly that, on the
all-pairs oracle (no LSH banding shortcut on the verify side — banding only
gates candidate generation, as in the engine).

    python tools/check_numperm_recall.py [n_convs]
"""

from __future__ import annotations

import collections
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def truth_pairs(truth):
    groups = collections.defaultdict(list)
    for c, t in zip(truth.conv_id, truth.truth_cluster_id):
        groups[t].append(c)
    out = set()
    for g in groups.values():
        g.sort()
        out.update(itertools.combinations(g, 2))
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from transcript_dedup.config import DedupConfig
    from transcript_dedup.generate import generate_corpus
    from transcript_dedup.oracle import (
        build_records,
        closure_pair_set,
        oracle_pairs,
        transitive_closure,
    )

    turns, truth = generate_corpus(n, seed=42)
    tp = truth_pairs(truth)
    fam = dict(zip(truth.conv_id, truth.family))

    for name, cfg in (
        ("np126", DedupConfig()),
        ("np96", DedupConfig().with_(num_perm=96, lsh_bands=32)),
    ):
        recs = build_records(turns, cfg)
        cp = closure_pair_set(transitive_closure(oracle_pairs(recs, cfg)))
        missed = tp - cp
        spurious = cp - tp
        by_fam_total = collections.Counter(fam[a] for a, b in tp)
        by_fam_missed = collections.Counter(fam[a] for a, b in missed)
        per_fam = {
            f: round(1 - by_fam_missed.get(f, 0) / t, 4)
            for f, t in sorted(by_fam_total.items())
        }
        print(
            f"{name}: truth_pairs={len(tp)} found={len(tp) - len(missed)} "
            f"recall={1 - len(missed) / len(tp):.4f} spurious={len(spurious)} "
            f"per_family={per_fam}"
        )


if __name__ == "__main__":
    main()
