"""Compiled-mode smoke test of the Pallas blend on the real TPU chip.

Run: python scripts/tpu_smoke.py  (uses the environment's axon TPU device)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from langsplat_tpu.core import transforms
from langsplat_tpu.ops import projection
from langsplat_tpu.ops.rasterize_pallas import rasterize_pallas
from langsplat_tpu.ops.tiles import bin_gaussians


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n = 20_000
    w = h = 256
    ts = 16
    fov = 0.9

    means = np.concatenate([rng.uniform(-2, 2, (n, 2)), rng.uniform(3, 9, (n, 1))],
                           axis=1).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.01), np.log(0.15), (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    feats = rng.normal(size=(n, 3)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)

    view = transforms.world_to_view(np.eye(3), np.zeros(3)).T
    proj = view @ transforms.projection_matrix(0.01, 100.0, fov, fov).T
    campos = np.linalg.inv(view)[3, :3]
    tanf = float(np.tan(fov / 2))
    bg = jnp.zeros(3)
    gx, gy = w // ts, h // ts

    @jax.jit
    def step(means3d, scales_, quats_, opac_, colors_, feats_):
        def loss_fn(m, s, q, o, c, f):
            prep = projection.preprocess(
                m, s, q, None, jnp.asarray(view), jnp.asarray(proj),
                jnp.asarray(campos), image_height=h, image_width=w,
                tanfovx=tanf, tanfovy=tanf, sh_degree=0, tile_size=ts,
                colors_precomp=c)
            inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=8 * n,
                                 max_tiles_per_gaussian=32)
            out = rasterize_pallas(prep, inst, o, f, bg, image_height=h,
                                   image_width=w, tile_size=ts, chunk=128)
            return (jnp.mean(out["render"] ** 2)
                    + jnp.mean(out["language_feature_image"] ** 2)), out["render"]

        (loss, img), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5),
                                                has_aux=True)(
            means3d, scales_, quats_, opac_, colors_, feats_)
        return loss, img, grads

    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors, feats)))
    t0 = time.time()
    loss, img, grads = step(*args)
    jax.block_until_ready(loss)
    print(f"compile+first step: {time.time() - t0:.1f}s  loss={float(loss):.6f}")
    for _ in range(3):
        t0 = time.time()
        loss, img, grads = step(*args)
        jax.block_until_ready(loss)
        print(f"step: {(time.time() - t0) * 1e3:.1f}ms")
    gsum = [float(jnp.sum(jnp.abs(g))) for g in grads]
    print("grad |sums|:", [f"{g:.3f}" for g in gsum])
    assert all(np.isfinite(gsum)) and any(g > 0 for g in gsum)
    print("pixels/s (fwd+bwd):", f"{w * h / (time.time() - t0):.3e}")
    print("OK")


if __name__ == "__main__":
    main()
