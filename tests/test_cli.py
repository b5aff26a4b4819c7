"""CLI surface: run -> report round trip in a subprocess (the way a user or
spark-submit invokes the engine)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

from transcript_dedup.generate import generate_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_run_and_report(tmp_path):
    turns, _ = generate_corpus(80, seed=5)
    turns["ts"] = turns["ts"].astype("datetime64[us]")
    inp = tmp_path / "turns.parquet"
    pq.write_table(pa.Table.from_pandas(turns, preserve_index=False), str(inp))

    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "transcript_dedup", "run",
         "--input", str(inp), "--out", str(tmp_path / "state"),
         "--master", "local[4]"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["conversations"] == 80
    assert summary["decisions"] > 0

    rep = subprocess.run(
        [sys.executable, "-m", "transcript_dedup", "report",
         "--out", str(tmp_path / "state"), "--master", "local[4]"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=240,
    )
    assert rep.returncode == 0, rep.stderr[-2000:]
    report = json.loads(rep.stdout.strip().splitlines()[-1])
    assert report["decisions"]["rows"] == summary["decisions"]
    assert any(s["stage"] == "candidate_pairs" for s in report["stages"])
