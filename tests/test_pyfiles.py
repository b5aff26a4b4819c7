"""The --py-files artifact is importable in isolation (no Spark needed).

The north rule ships the job as ``spark-submit --py-files transcript_dedup.zip``;
executors then import the package from the zip via zipimport. This test
builds the artifact and imports the package FROM THE ZIP in a subprocess
whose sys.path contains only the zip + stdlib site (the repo checkout is
masked), proving the artifact is self-contained.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_builds_and_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build_zip
    finally:
        sys.path.pop(0)

    a = build_zip(str(tmp_path / "a.zip"))
    b = build_zip(str(tmp_path / "b.zip"))
    assert a["files"] >= 20  # every engine module is inside
    assert a["sha256"] == b["sha256"]  # byte-stable for identical sources


def test_spark_submit_pyfiles_runs_pipeline(tmp_path):
    """The north-rule deployment surface: spark-submit --py-files zip runs
    the full pipeline with the package resolved from the archive (caught a
    real bug: ship_package tried to re-archive the zip member)."""
    import shutil

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("spark-submit not available")

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build_zip
    finally:
        sys.path.pop(0)
    z = build_zip(str(tmp_path / "transcript_dedup.zip"))["zip"]

    job = tmp_path / "job.py"
    job.write_text(
        "import json, tempfile\n"
        "from transcript_dedup.session import get_spark\n"
        "from transcript_dedup.generate import generate_corpus, corpus_to_spark\n"
        "from transcript_dedup.config import DedupConfig\n"
        "from transcript_dedup.pipeline import DedupPipeline\n"
        "spark = get_spark('submit-smoke', master='local[2]', shuffle_partitions=2)\n"
        "turns = corpus_to_spark(spark, generate_corpus(60, seed=11)[0])\n"
        "res = DedupPipeline(spark, tempfile.mkdtemp(), DedupConfig()).run(\n"
        "    turns, input_fingerprint='submit-smoke')\n"
        "print(json.dumps({'decisions': res['decisions'].count()}))\n"
        "spark.stop()\n"
    )
    out = subprocess.run(
        [spark_submit, "--py-files", z, str(job)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=360,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    assert res["decisions"] > 0


def test_zip_imports_without_repo_on_path(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build_zip
    finally:
        sys.path.pop(0)

    z = build_zip(str(tmp_path / "transcript_dedup.zip"))["zip"]
    probe = (
        "import importlib, json, sys;"
        f"sys.path.insert(0, {z!r});"
        "import transcript_dedup;"
        "assert transcript_dedup.__file__.startswith(%r), transcript_dedup.__file__;"
        "mods = ['config', 'normalize', 'generate', 'oracle', 'score',"
        " 'detectors.exact', 'detectors.lsh', 'detectors.substring',"
        " 'detectors.verify', 'cluster', 'decide', 'io', 'metrics',"
        " 'pipeline', 'streaming', 'reconstruct', 'signatures'];"
        "[importlib.import_module('transcript_dedup.' + m) for m in mods];"
        "from transcript_dedup.config import DedupConfig;"
        "print(json.dumps({'ok': True, 'num_perm': DedupConfig().num_perm}))"
    ) % z
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo root: the zip must satisfy the import
        env=env,
        check=True,
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["ok"] and res["num_perm"] > 0
