#!/usr/bin/env python
"""Compiled-mode (on-chip) parity check for fwd_super/bwd_super.

The pytest suite pins JAX to CPU, where Pallas runs in interpret mode only —
so `tests/test_pallas_blend.py:test_read_super_matches_baseline` proves the
read-DMA super-batching bitwise-equal in *interpret* mode only.  This script
runs the same check compiled on the real TPU (loss + all five gradients, sup
in {2,4}, grad_mode in {full,feature}) and prints one JSON line.

Run it on an uncontended chip; it is small (60 gaussians, 32x32) and finishes
in under a minute after compile. (chunk=128: compiled mode requires
lane-aligned chunks, unlike the interpret-mode test's chunk=32.)
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from langsplat_tpu.ops import projection
    from langsplat_tpu.ops.rasterize_pallas import rasterize_pallas
    from langsplat_tpu.ops.tiles import bin_gaussians
    from tests.test_projection_and_dense import make_camera
    from tests.test_tiles import random_scene

    platform = jax.devices()[0].platform
    w = h = 32
    ts = 16
    cam = make_camera(w=w, h=h)
    means, scales, quats, colors, opac, feats = random_scene(60, seed=11,
                                                             spread=1.0)
    target = np.random.default_rng(2).uniform(size=(3, h, w)).astype(np.float32)
    ftarget = np.random.default_rng(3).uniform(size=(3, h, w)).astype(np.float32)
    bg = jnp.array([0.2, 0.5, 0.8])

    def loss_fn(sup, grad_mode):
        def f(means3d, scales_, opac_, colors_, feats_):
            prep = projection.preprocess(
                means3d, scales_, jnp.asarray(quats), None,
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                image_height=h, image_width=w, tanfovx=cam["tanfovx"],
                tanfovy=cam["tanfovy"], sh_degree=0, tile_size=ts,
                colors_precomp=colors_)
            inst = bin_gaussians(prep, grid_x=2, grid_y=2, budget=2048,
                                 max_tiles_per_gaussian=16)
            out = rasterize_pallas(prep, inst, opac_, feats_, bg,
                                   image_height=h, image_width=w, tile_size=ts,
                                   chunk=128, interpret=False, fwd_super=sup,
                                   bwd_super=sup, grad_mode=grad_mode)
            if grad_mode == "feature":
                return jnp.mean((out["language_feature_image"] - ftarget) ** 2)
            return (jnp.mean((out["render"] - target) ** 2)
                    + jnp.mean((out["language_feature_image"] - ftarget) ** 2)
                    + 0.1 * jnp.mean(out["final_transmittance"]))
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4)))

    args = tuple(jnp.asarray(x) for x in (means, scales, opac, colors, feats))
    mismatches = []
    for grad_mode in ("full", "feature"):
        l1, g1 = loss_fn(1, grad_mode)(*args)
        for sup in (2, 4):
            ls, gs = loss_fn(sup, grad_mode)(*args)
            if float(ls) != float(l1):
                mismatches.append(f"{grad_mode}/sup{sup}: loss "
                                  f"{float(ls)!r} != {float(l1)!r}")
            for nm, a, b in zip(["means", "scales", "opac", "colors", "feats"],
                                g1, gs):
                if not np.array_equal(np.asarray(a), np.asarray(b)):
                    d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                    mismatches.append(f"{grad_mode}/sup{sup}: grad {nm} "
                                      f"maxdiff {d:.3e}")
    print(json.dumps({"check": "fwd/bwd_super compiled parity",
                      "platform": platform,
                      "ok": not mismatches, "mismatches": mismatches}))
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
