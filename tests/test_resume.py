"""Checkpoint/resume: a run interrupted at a checkpoint and resumed must produce
bitwise-identical field + optimizer + densify state to an uninterrupted run
(the reference's capture()/restore() contract,
/root/reference/scene/gaussian_model.py:63-131, train.py:44-48,140-142 — made
stronger here: the TPU loop's camera schedule and densify RNG are pure functions
of (seed, iteration), so resume is exact even mid-epoch)."""

import os

import numpy as np
import pytest

from langsplat_tpu.config import (ModelConfig, OptimizationConfig, PipelineConfig,
                                  TrainConfig)
from tests.test_data import make_colmap_scene


def _cfg(root, out, iterations, ckpt_iters, start_checkpoint=""):
    return TrainConfig(
        model=ModelConfig(source_path=root, model_path=out, resolution=1,
                          sh_degree=1),
        pipeline=PipelineConfig(interpret=True),
        optimization=OptimizationConfig(
            iterations=iterations, include_feature=False,
            densify_from_iter=3, densification_interval=5,
            densify_until_iter=12, opacity_reset_interval=10,
            densify_grad_threshold=1e-7),
        test_iterations=(), save_iterations=(),
        checkpoint_iterations=ckpt_iters,
        start_checkpoint=start_checkpoint, seed=3, quiet=True)


@pytest.mark.slow
def test_rgb_resume_bitwise(tmp_path):
    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_cams=3)
    out_a = str(tmp_path / "run_a")
    out_b = str(tmp_path / "run_b")

    from langsplat_tpu.train.loop import training
    from langsplat_tpu.models import field_io

    # uninterrupted run: 14 iterations (with densify + opacity-reset cycles),
    # checkpoints at 7 and 14
    training(_cfg(root, out_a, 14, (7, 14)))
    ck7 = os.path.join(out_a, "chkpnt7.npz")
    ck14_a = os.path.join(out_a, "chkpnt14.npz")
    assert field_io.checkpoint_has_state(ck7)

    # resumed run: restore the full state at 7, continue to 14
    training(_cfg(root, out_b, 14, (14,), start_checkpoint=ck7))
    ck14_b = os.path.join(out_b, "chkpnt14.npz")

    with np.load(ck14_a) as a, np.load(ck14_b) as b:
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            np.testing.assert_array_equal(
                a[k], b[k], err_msg=f"resume mismatch in leaf {k}")
