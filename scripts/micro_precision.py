"""A/B the in-kernel MXU precision (HIGH bf16x3 vs HIGHEST) on the real device:
numerical deltas of the rendered image + packed gradients, and fwd+bwd timing.

Chained-slope timing (see bench.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step_fn, seed0, steps=5):
    def chain(k):
        s = seed0
        for _ in range(k):
            s = step_fn(s)
        return float(s)
    chain(1)
    t0 = time.time(); chain(1); t1 = time.time() - t0
    t0 = time.time(); chain(1 + steps); t2 = time.time() - t0
    return max(t2 - t1, 0.0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from langsplat_tpu.core import transforms
    from langsplat_tpu.ops import projection
    from langsplat_tpu.ops import rasterize_pallas as rp
    from langsplat_tpu.ops.tiles import bin_gaussians

    n = int(os.environ.get("MPR_N", 200_000))
    h, w, ts = 768, 1024, 16
    fov = 0.9
    rng = np.random.default_rng(0)
    means = np.concatenate([rng.uniform(-3, 3, (n, 2)), rng.uniform(2.5, 12, (n, 1))],
                           axis=1).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.002), np.log(0.02), (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    feats = rng.normal(size=(n, 3)).astype(np.float32)

    view = jnp.asarray(transforms.world_to_view(np.eye(3), np.zeros(3)).T)
    proj = view @ jnp.asarray(transforms.projection_matrix(0.01, 100.0, fov, fov).T)
    campos = jnp.zeros(3)
    tanf = float(np.tan(fov / 2))
    gx, gy = -(-w // ts), -(-h // ts)
    bg = jnp.zeros(3)
    args = tuple(map(jnp.asarray, (means, scales, quats, colors, opac, feats)))

    def build(precision):
        rp.MM_PRECISION = precision

        @jax.jit
        def render_and_grads(m, s, q, c, o, f):
            def loss(m, s, q, c, o, f):
                prep = projection.preprocess(
                    m, s, q, None, view, proj, campos, image_height=h,
                    image_width=w, tanfovx=tanf, tanfovy=tanf, sh_degree=0,
                    tile_size=ts, colors_precomp=c)
                inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=786432,
                                     max_tiles_per_gaussian=32, tile_size=ts,
                                     opacities=o)
                out = rp.rasterize_pallas(prep, inst, o, f, bg, image_height=h,
                                          image_width=w, tile_size=ts, chunk=128)
                lv = (jnp.mean((out["render"] - 0.5) ** 2)
                      + jnp.mean(out["language_feature_image"] ** 2))
                return lv, out["render"]
            (lv, img), grads = jax.value_and_grad(loss, argnums=(0, 3, 4, 5),
                                                  has_aux=True)(m, s, q, c, o, f)
            return img, grads

        return render_and_grads

    import jax
    hi = build(jax.lax.Precision.HIGHEST)
    img_hi, g_hi = hi(*args)
    img_hi = np.asarray(img_hi)
    g_hi = [np.asarray(x) for x in g_hi]

    df = build(jax.lax.Precision.DEFAULT)
    img_df, g_df = df(*args)
    img_df = np.asarray(img_df)
    g_df = [np.asarray(x) for x in g_df]

    def rel(a, b):
        d = np.abs(a - b)
        return d.max(), d.max() / (np.abs(b).max() + 1e-12)

    print("image  DEF vs HIGHEST: abs %.3e rel %.3e" % rel(img_df, img_hi))
    for i, nm in enumerate(["d_means", "d_colors", "d_opac", "d_feats"]):
        print(f"{nm:8s} DEF vs HIGHEST: abs %.3e rel %.3e" % rel(g_df[i], g_hi[i]))

    # timing per precision (grad step, chained)
    def timed(fn):
        def step(seed):
            img, grads = fn(args[0] + seed * 1e-30, *args[1:])
            return jnp.sum(grads[0]) * 1e-30
        return step
    z = jnp.zeros(())
    print(f"fwd+bwd HIGHEST: {chain_time(timed(hi), z):8.2f} ms")
    print(f"fwd+bwd DEFAULT: {chain_time(timed(df), z):8.2f} ms")


if __name__ == "__main__":
    main()
