"""Eval renders must not be bound by the TRAINING budget cap (r04 quality-run
regression: a 30k-iter model pruned to 14.8k Gaussians carried splats so large
that one test view needed ~17 instances/Gaussian — past any per-capacity
budget_factor — and the render stage raised instead of growing).

render_full now grows past the policy cap up to RENDER_BUDGET_CEILING; the
reference never truncates (resizeFunctional semantics)."""

import numpy as np
import jax.numpy as jnp

from langsplat_tpu.config import PipelineConfig
from langsplat_tpu.models import gaussian_field as gf
from langsplat_tpu.train.loop import render_full

from tests.test_parallel import batched_cameras


class _Cam:
    def __init__(self, view, proj, cpos, tanf, h, w):
        self.world_view_transform = np.asarray(view)
        self.full_proj_transform = np.asarray(proj)
        self.camera_center = np.asarray(cpos)
        self.tanfovx = self.tanfovy = tanf
        self.height, self.width = h, w


def test_render_full_grows_past_training_budget_cap():
    h = w = 128
    views, projs, cpos, tanf = batched_cameras(v=1, w=w, h=h)
    cam = _Cam(views[0], projs[0], cpos[0], tanf, h, w)

    # 80 huge splats, each touching most of the 64-tile grid: ~5k instances,
    # past the budget_factor=1 policy cap of round(1 * 128) -> 4096
    n, cap = 80, 128
    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.uniform(-0.5, 0.5, (n, 2)),
                          rng.uniform(4, 6, (n, 1))], axis=1).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    field = gf.create_from_pcd(pts, cols, sh_degree=0, capacity=cap)
    from dataclasses import replace
    field = replace(field, scaling=jnp.full((cap, 3), np.log(3.0)),
                    opacity=jnp.full((cap, 1), 2.0))

    pipe = PipelineConfig(budget_factor=1, interpret=True,
                          max_tiles_per_gaussian=16)
    out = render_full(field, cam, pipe, 0, False, jnp.zeros(3))
    assert int(out["instances_dropped"]) == 0
    assert int(out["rect_dropped"]) == 0
    assert np.isfinite(np.asarray(out["render"])).all()
