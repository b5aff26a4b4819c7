"""Artifact-integrity guard (round-8, judge item #2 from round 7).

Rounds 5 and 7 both committed a 0-byte official bench artifact (the
snapshot raced the bench's final write). This test fails the suite whenever
any committed-or-working-tree BENCH/*.json or round artifact is empty or
unparseable, so the defect class is caught before any snapshot is taken.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact_paths() -> list[str]:
    pats = ["BENCH/*.json", "BENCH_r*.json", "CORRECTNESS_r*.json"]
    out: list[str] = []
    for p in pats:
        out.extend(glob.glob(os.path.join(REPO, p)))
    return sorted(out)


def test_bench_artifacts_nonempty_and_parseable():
    import pytest

    if os.path.exists("/tmp/BENCH_RUNNING"):
        # tools/bench_when_clean.sh is mid-run: its stdout redirect has
        # legitimately created (and not yet filled) the output artifact
        pytest.skip("official bench in flight (sentinel /tmp/BENCH_RUNNING)")
    paths = _artifact_paths()
    assert paths, "no bench artifacts found — wrong repo root?"
    bad: list[str] = []
    for p in paths:
        try:
            if os.path.getsize(p) == 0:
                bad.append(f"{p}: 0 bytes")
                continue
            with open(p) as f:
                json.load(f)
        except (OSError, ValueError) as e:
            bad.append(f"{p}: {e}")
    assert not bad, "empty/corrupt bench artifacts: " + "; ".join(bad)
