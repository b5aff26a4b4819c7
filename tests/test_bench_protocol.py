"""Bench-protocol unit tests (no Spark): the derived canary threshold and
its persistence band — round-7 judge item #3 (the threshold must track the
engine's clean band instead of being a hand-recalibrated constant)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench


def _patch_band(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "CANARY_BAND_FILE", str(tmp_path / "band.json"))


def test_threshold_default_when_no_band(monkeypatch, tmp_path):
    _patch_band(monkeypatch, tmp_path)
    monkeypatch.delenv("BENCH_CANARY_THRESH", raising=False)
    t, src = bench._canary_threshold()
    assert t == bench.CANARY_DEFAULT_THRESH and src == "default"


def test_threshold_derives_from_rolling_min(monkeypatch, tmp_path):
    _patch_band(monkeypatch, tmp_path)
    monkeypatch.delenv("BENCH_CANARY_THRESH", raising=False)
    bench._append_band([70.2, 61.5, 64.0])
    t, src = bench._canary_threshold()
    assert t == round(61.5 * bench.CANARY_BAND_MARGIN, 1)
    assert src.startswith("rolling_min(3)")


def test_threshold_env_override_wins(monkeypatch, tmp_path):
    _patch_band(monkeypatch, tmp_path)
    bench._append_band([61.5])
    monkeypatch.setenv("BENCH_CANARY_THRESH", "80")
    t, src = bench._canary_threshold()
    assert t == 80.0 and src == "env:BENCH_CANARY_THRESH"


def test_band_keeps_tail_and_keys_on_config(monkeypatch, tmp_path):
    _patch_band(monkeypatch, tmp_path)
    bench._append_band([float(i) for i in range(100, 100 + bench.CANARY_BAND_KEEP + 5)])
    band = bench._load_band()
    assert len(band) == bench.CANARY_BAND_KEEP
    assert band[-1] == float(100 + bench.CANARY_BAND_KEEP + 4)
    # a different (convs x cores) config must not reuse these readings
    monkeypatch.setattr(bench, "BENCH_CONVS", 999)
    assert bench._load_band() == []


def test_band_appends_do_not_clobber_other_configs(monkeypatch, tmp_path):
    """A smoke run at another (convs x cores) must not erase the official
    band — bands are stored per key in one file."""
    _patch_band(monkeypatch, tmp_path)
    bench._append_band([129.0, 121.9])
    official = bench._band_key()
    monkeypatch.setattr(bench, "BENCH_CONVS", 2000)
    bench._append_band([8.1])
    assert bench._load_band() == [8.1]
    monkeypatch.setattr(bench, "BENCH_CONVS", int(official.split("x")[0]))
    assert bench._load_band() == [129.0, 121.9]


def test_band_file_corruption_is_nonfatal(monkeypatch, tmp_path):
    _patch_band(monkeypatch, tmp_path)
    (tmp_path / "band.json").write_text("{not json")
    assert bench._load_band() == []
    monkeypatch.delenv("BENCH_CANARY_THRESH", raising=False)
    t, src = bench._canary_threshold()
    assert src == "default"


def test_summary_line_stays_compact():
    """The driver tail-captures stdout; the round-6 artifact arrived
    truncated because per-window detail rode in the summary line. Guard the
    compact shape: a representative 4-window summary must stay well under
    4 KiB and must NOT embed the windows array."""
    windows = [
        {
            "wall_sec_lo": 222.2,
            "wall_sec_hi": 68.4,
            "raw": 0.812,
            "vs_ceiling": 0.82,
            "reprobe_t4_sec": 69.1,
        }
        for _ in range(4)
    ]
    out = {
        "metric": "headline_suite_plus_dedup_scaling",
        "value": 19.7,
        "unit": "sec",
        "queries": {f"q{i}": 2.345 for i in range(8)},
        "sf": "0.1",
        "canary_t4_sec": 68.9,
        "canary_threshold_sec": 73.9,
        "canary_threshold_source": "rolling_min(12)x1.08",
        "canary_clean": True,
        "dedup": {
            "corpus_convs": 120000,
            "decisions": 29940,
            "decisions_identical_across_levels": True,
            "cores_hi": 4,
            "cores_lo": 1,
            "protocol": "median over bracketed pinned windows, per-window canary re-probe",
            "n_windows": 4,
            "n_discarded_by_reprobe": 1,
            "reprobe_t4_secs": [w["reprobe_t4_sec"] for w in windows],
            "wall_sec_hi_runs": [w["wall_sec_hi"] for w in windows],
            "wall_sec_lo_runs": [w["wall_sec_lo"] for w in windows],
            "scaling_efficiency": 0.812,
            "scaling_efficiency_windows": [w["raw"] for w in windows],
            "efficiency_vs_ceiling": 0.82,
            "efficiency_vs_ceiling_windows": [w["vs_ceiling"] for w in windows],
            "best_window": {"raw": 0.83, "vs_ceiling": 0.84},
            "detail_file": "BENCH/bench_detail_20260818T120000.json",
        },
    }
    line = json.dumps(out)
    # the driver captures the LAST 2000 chars of stdout (measured from
    # BENCH_r06.json's truncated tail) — the whole line must fit
    assert len(line) < 2000
    assert "windows\":" not in line.replace(
        "scaling_efficiency_windows", ""
    ).replace("efficiency_vs_ceiling_windows", "").replace("n_windows", "")
