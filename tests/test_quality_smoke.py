"""Slow regression net for the whole process.sh-shaped pipeline (VERDICT r02
task #7): runs scripts/quality_run.py --smoke (CPU interpret, ~10 min) and
asserts every stage completed, phase-A PSNR improved, the eval-oracle mIoU
clears a floor, and the trained-field eval produced nonzero quality.

Run with: LANGSPLAT_SLOW_PIPELINE=1 python -m pytest tests/test_quality_smoke.py -q
(skipped by default to keep the suite under ~16 min; the `verify` skill
documents it as the no-chip pipeline check).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("LANGSPLAT_SLOW_PIPELINE") != "1",
                    reason="~10 min full-pipeline run; set "
                           "LANGSPLAT_SLOW_PIPELINE=1 (documented in the "
                           "verify skill)")
def test_quality_smoke_pipeline(tmp_path):
    ws = tmp_path / "qws"
    # quality_run forces jax_platforms=cpu itself in smoke mode; a fresh
    # subprocess keeps this session's 8-device CPU config out of the way
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "quality_run.py"),
         "--smoke", "--ws", str(ws)],
        cwd=REPO, capture_output=True, text=True, timeout=3000)
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]

    # --smoke appends _smoke to the workspace and writes the report inside it
    report_path = str(ws) + "_smoke/QUALITY_smoke.json"
    with open(report_path) as fh:
        rep = json.load(fh)

    curve = rep["phase_a"]["psnr_curve"]
    assert len(curve) >= 2, "phase A produced no test-iteration reports"
    assert curve[-1]["psnr"] > curve[0]["psnr"], (
        f"phase-A PSNR did not improve: {curve}")
    assert rep["phase_a"]["final_test_psnr_mean"] > 10.0

    # per-level masked feature L1 must exist (real feature-channel numbers,
    # not the frozen-geometry RGB constant — VERDICT r02 weak #2)
    feat = rep["phase_b"]["final_test_feature_l1"]
    assert set(feat) == {"1", "2", "3"}
    assert all(0.0 < v < 1.0 for v in feat.values())

    # eval-path sanity ceiling: GT features through AE + eval protocol
    assert rep["eval_oracle"]["miou"] > 0.5, rep["eval_oracle"]
    # the trained field should recover a meaningful fraction of the ceiling
    # even at smoke scale (observed ~0.75 vs oracle ~0.84)
    assert rep["eval"]["miou"] > 0.2, rep["eval"]
