"""Fast iteration harness: time ONLY the Pallas blend kernels (fwd, fwd+bwd) on
pre-packed constant instance data at bench geometry. Skips bin/pack compilation so a
kernel edit round-trips in ~1 min instead of ~4.

Env: PROF_N, PROF_H, PROF_W, PROF_STEPS, PROF_CHUNK, PROF_FWD_MULT, LANGSPLAT_NMEMB.
Chained-slope timing as in bench.py (tunneled-TPU safe).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(seed, *a):
        a = (a[0] + seed * 1e-30,) + a[1:]
        out = fn(*a)
        leaves = jax.lax.optimization_barrier(
            [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")])
        red = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return red * 1e-30

    def chain(k):
        seed = jnp.zeros(())
        for _ in range(k):
            seed = step(seed, *args)
        return float(seed)

    chain(1)
    t0 = time.time()
    chain(1)
    t1 = time.time() - t0
    t0 = time.time()
    chain(1 + steps)
    t2 = time.time() - t0
    return max(t2 - t1, 0.0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from langsplat_tpu.core import transforms
    from langsplat_tpu.ops import projection
    from langsplat_tpu.ops.rasterize_pallas import (blend_tiles, make_blend_spec,
                                                    pack_instances)
    from langsplat_tpu.ops.tiles import bin_gaussians

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("PROF_N", 1_000_000))
    h = int(os.environ.get("PROF_H", 768))
    w = int(os.environ.get("PROF_W", 1024))
    steps = int(os.environ.get("PROF_STEPS", 8))
    ts = int(os.environ.get("PROF_TS", 16))
    chunk = int(os.environ.get("PROF_CHUNK", 128))
    fwd_mult = int(os.environ.get("PROF_FWD_MULT", 1))
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
    kw = dict(image_height=h, image_width=w, tanfovx=tanf, tanfovy=tanf,
              sh_degree=0, tile_size=ts)

    @jax.jit
    def build(m, s, q, c, o, f):
        prep = projection.preprocess(m, s, q, None, view, proj, campos,
                                     colors_precomp=c, **kw)
        from langsplat_tpu.ops.tiles import instance_counts
        total = jnp.sum(instance_counts(prep, tile_size=ts, tmax=32, opacities=o))
        return total

    args6 = tuple(map(jnp.asarray, (means, scales, quats, colors, opac, feats)))
    measured = int(build(*args6))
    budget = -(-int(measured * 1.1) // 4096) * 4096
    spec = make_blend_spec(image_height=h, image_width=w, tile_size=ts, chunk=chunk,
                           num_feat=3, budget=budget, fwd_mult=fwd_mult,
                           grad_mode=os.environ.get("PROF_GRAD_MODE", "full"),
                           grad_precision=os.environ.get("PROF_GRAD_PREC", "exact"))

    @jax.jit
    def prepacked(m, s, q, c, o, f):
        prep = projection.preprocess(m, s, q, None, view, proj, campos,
                                     colors_precomp=c, **kw)
        inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=budget,
                             max_tiles_per_gaussian=32, tile_size=ts, opacities=o)
        packed, p_off = pack_instances(prep, o, f, inst, spec)
        sched = jnp.concatenate([p_off, inst.tile_start[1:] - inst.tile_start[:-1]])
        return packed, sched

    packed, sched = prepacked(*args6)
    packed = jax.block_until_ready(packed)
    print(f"n={n} {w}x{h} budget={budget} instances={measured} "
          f"aligned={spec.aligned_budget} nmemb_env={os.environ.get('LANGSPLAT_NMEMB')}")

    def fwd(p, s):
        return blend_tiles(p, s, spec, False)

    def fwdbwd(p, s):
        def loss(p):
            tiles = blend_tiles(p, s, spec, False)
            return jnp.mean(tiles[:, :, :7] ** 2)
        return jax.value_and_grad(loss)(p)

    t_fwd = timeit(fwd, packed, sched, steps=steps)
    t_fb = timeit(fwdbwd, packed, sched, steps=steps)
    print(f"kernel fwd      {t_fwd:8.2f} ms")
    print(f"kernel fwd+bwd  {t_fb:8.2f} ms   (bwd ~{t_fb - t_fwd:.2f})")


if __name__ == "__main__":
    main()
