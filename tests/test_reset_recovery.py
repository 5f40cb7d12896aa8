"""Opacity-reset robustness regression (VERDICT r03 #6): a small phase-A run
spanning an opacity reset must crater and then RECOVER — the exact dynamic
(reset floor + Adam-moment zeroing + densification) that silently killed two
chip-scale quality runs in round 3 before the densify-units fix (4dd7020).

The units themselves are pinned at unit level by
tests/test_model_train.py::test_update_stats_reference_half_image_units; this
test pins the phase-level behavior: loss spikes at the reset
(reference reset_opacity clamps to <=0.01, gaussian_model.py:277) and returns
to the pre-reset level within the remaining iterations.
"""

import os

import numpy as np

from tests.test_data import write_colmap_binary


def _smooth_scene(root, n_cams=4, h=48, w=64):
    """COLMAP scene with SMOOTH image targets (low-frequency sinusoids) — a
    fittable target, unlike pixel noise, so the reset dip is visible against a
    converged baseline."""
    write_colmap_binary(os.path.join(root, "sparse", "0"), n_cams=n_cams)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    from PIL import Image
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n_cams):
        img = np.stack([
            0.5 + 0.4 * np.sin(2 * np.pi * (xx / w + 0.17 * i)),
            0.5 + 0.4 * np.cos(2 * np.pi * (yy / h - 0.11 * i)),
            0.5 + 0.3 * np.sin(2 * np.pi * (xx / w + yy / h) + i),
        ], axis=-1)
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(imgdir, f"img_{i:03d}.png"))


def test_phase_a_recovers_after_opacity_reset(tmp_path):
    root = str(tmp_path / "scene")
    _smooth_scene(root)
    from langsplat_tpu.config import (ModelConfig, OptimizationConfig,
                                      PipelineConfig, TrainConfig)
    from langsplat_tpu.train.loop import training

    reset_at = 120
    total = 300
    cfg = TrainConfig(
        model=ModelConfig(source_path=root, model_path=str(tmp_path / "out"),
                          resolution=1, sh_degree=1),
        optimization=OptimizationConfig(
            iterations=total, include_feature=False,
            densify_from_iter=10, densification_interval=50,
            densify_until_iter=200, densify_grad_threshold=1e-7,
            opacity_reset_interval=reset_at,
            position_lr_max_steps=total),
        pipeline=PipelineConfig(interpret=True),
        quiet=True, test_iterations=[], save_iterations=[],
        checkpoint_iterations=[])
    res = training(cfg)
    hist = np.asarray(res["history"])
    assert np.isfinite(hist).all()

    pre = float(hist[reset_at - 10:reset_at].mean())
    spike = float(hist[reset_at:reset_at + 5].max())
    post = float(hist[total - 30:].mean())
    # the reset must actually bite (opacity clamp -> transparent renders)...
    assert spike > 1.5 * pre, (
        f"opacity reset had no visible effect (pre {pre:.4f}, "
        f"spike {spike:.4f}) — reset_opacity may have stopped firing")
    # ...and training must climb back to (near) the pre-reset level instead of
    # death-spiraling (the round-3 failure mode: units bug left densification
    # unarmed while the post-reset prune removed splats)
    assert post < 1.3 * pre + 0.02, (
        f"no recovery after the opacity reset: pre-reset loss {pre:.4f}, "
        f"post-recovery {post:.4f}")
    # densification stayed alive through the reset window
    assert int(res["field"].num_alive) > 0
