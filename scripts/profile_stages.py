"""Stage-by-stage timing of the rasterization pipeline on the current device.

Isolates preprocess / binning / packing / pallas-forward / full fwd+bwd so kernel work
can be separated from sort+gather overhead. Env: PROF_N, PROF_H, PROF_W, PROF_STEPS.

Timing methodology: on the tunneled TPU platform `block_until_ready` does NOT wait for
device completion (async dispatch; ~35 ms fixed RPC latency dominates naive loops), so
each stage is timed as a dependency CHAIN — the stage's reduced output perturbs the
next iteration's input by 1e-30, outputs pass through an optimization_barrier so they
are materialized — and the reported time is the slope between a 1-step and a
(1+steps)-step chain, each ending in a scalar fetch. See bench.py for the calibration.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=5):
    """Chained slope timing: fn's first positional arg gets a 1e-30 seed perturbation."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(seed, *a):
        a = (a[0] + seed * 1e-30,) + a[1:]
        out = fn(*a)
        leaves = jax.lax.optimization_barrier(
            [x for x in jax.tree_util.tree_leaves(out)
             if hasattr(x, "dtype")])
        red = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return red * 1e-30

    def chain(k):
        seed = jnp.zeros(())
        for _ in range(k):
            seed = step(seed, *args)
        return float(seed)

    chain(1)  # warm up
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

    n = int(os.environ.get("PROF_N", 200_000))
    h = int(os.environ.get("PROF_H", 512))
    w = int(os.environ.get("PROF_W", 512))
    steps = int(os.environ.get("PROF_STEPS", 5))
    ts = int(os.environ.get("PROF_TS", 16))
    chunk = int(os.environ.get("PROF_CHUNK", 128))
    fwd_mult = int(os.environ.get("PROF_FWD_MULT", 1))
    # PROF_ALIGN=256 with PROF_CHUNK=256 keeps the bwd kernel lane-fused
    # (fusion requires chunk == align); costs more alignment padding
    align = int(os.environ["PROF_ALIGN"]) if "PROF_ALIGN" in os.environ else None
    only_kernel = bool(os.environ.get("PROF_ONLY_KERNEL"))
    budget_factor = os.environ.get("PROF_BUDGET_FACTOR")  # None => adaptive like bench
    budget = int(float(budget_factor) * n) if budget_factor else None
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

    if budget is None:
        # adaptive budget exactly like bench.py: 1.1x the measured instance count,
        # rounded up to a 4096 multiple
        @jax.jit
        def probe_count(m, s, q, c):
            prep = projection.preprocess(m, s, q, None, view, proj, campos,
                                         colors_precomp=c, **kw)
            from langsplat_tpu.ops.tiles import instance_counts
            return jnp.sum(instance_counts(prep, tile_size=ts, tmax=32,
                                           opacities=jnp.asarray(opac)))

        measured = int(probe_count(*map(jnp.asarray, (means, scales, quats, colors))))
        budget = -(-int(measured * 1.1) // 4096) * 4096

    # PROF_GRAD_MODE=feature profiles the phase-B step: the feature phase runs
    # 3 of the reference's 4 training runs (process.sh:19-23), its backward
    # skips the geometric chain and its pack backward sorts only the 3
    # feature cotangent rows (grad_rows narrowing)
    grad_mode = os.environ.get("PROF_GRAD_MODE", "full")
    spec = make_blend_spec(image_height=h, image_width=w, tile_size=ts, chunk=chunk,
                           num_feat=3, budget=budget, fwd_mult=fwd_mult,
                           grad_mode=grad_mode, align=align)

    @jax.jit
    def stage_prep(m, s, q, c):
        return projection.preprocess(m, s, q, None, view, proj, campos,
                                     colors_precomp=c, **kw)

    @jax.jit
    def stage_bin(m, s, q, c):
        prep = projection.preprocess(m, s, q, None, view, proj, campos,
                                     colors_precomp=c, **kw)
        return bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=budget,
                             max_tiles_per_gaussian=32, tile_size=ts,
                             opacities=jnp.asarray(opac))

    @jax.jit
    def stage_pack(m, s, q, c, o, f):
        prep = projection.preprocess(m, s, q, None, view, proj, campos,
                                     colors_precomp=c, **kw)
        inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=budget,
                             max_tiles_per_gaussian=32, tile_size=ts, opacities=o)
        return pack_instances(prep, o, f, inst, spec)

    @jax.jit
    def stage_fwd(m, s, q, c, o, f):
        prep = projection.preprocess(m, s, q, None, view, proj, campos,
                                     colors_precomp=c, **kw)
        inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=budget,
                             max_tiles_per_gaussian=32, tile_size=ts, opacities=o)
        packed, p_off = pack_instances(prep, o, f, inst, spec)
        sched = jnp.concatenate([p_off, inst.tile_start[1:] - inst.tile_start[:-1]])
        return blend_tiles(packed, sched, spec, False)

    @jax.jit
    def stage_fwdbwd(m, s, q, c, o, f):
        def loss(m, s, q, c, o, f):
            prep = projection.preprocess(m, s, q, None, view, proj, campos,
                                         colors_precomp=c, **kw)
            inst = bin_gaussians(prep, grid_x=gx, grid_y=gy, budget=budget,
                                 max_tiles_per_gaussian=32, tile_size=ts,
                                 opacities=jax.lax.stop_gradient(o))
            packed, p_off = pack_instances(prep, o, f, inst, spec)
            sched = jnp.concatenate([p_off,
                                     inst.tile_start[1:] - inst.tile_start[:-1]])
            tiles = blend_tiles(packed, jax.lax.stop_gradient(sched), spec, False)
            return jnp.mean(tiles[:, :, :7] ** 2)
        if grad_mode == "feature":
            # phase-B semantics: geometry frozen, d(language_feature) only
            # (reference train.py:96-99; trainer.train_step_feature)
            return jax.value_and_grad(
                lambda f_: loss(m, s, q, c, o, f_))(f)
        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5))(m, s, q, c, o, f)

    @jax.jit
    def stage_kernel_bwd(packed, sched):
        def loss(p):
            tiles = blend_tiles(p, sched, spec, False)
            return jnp.mean(tiles[:, :, :7] ** 2)
        return jax.value_and_grad(loss)(packed)

    args4 = tuple(map(jnp.asarray, (means, scales, quats, colors)))
    args6 = args4 + tuple(map(jnp.asarray, (opac, feats)))

    inst = jax.jit(stage_bin)(*args4)
    print(f"n={n} image={w}x{h} budget={budget} "
          f"instances={int(inst.num_instances)} dropped={int(inst.dropped)}")
    packed_const, p_off_const = jax.jit(stage_pack)(*args6)
    p_off_const = jnp.concatenate(
        [p_off_const, inst.tile_start[1:] - inst.tile_start[:-1]])
    if only_kernel:
        # fast A/B loop for kernel-shape knobs: time only the pallas fwd and the
        # kernel fwd+bwd on a fixed packed buffer (skips prep/bin/pack chains)
        @jax.jit
        def stage_kernel_fwd(packed, sched):
            return blend_tiles(packed, sched, spec, False)

        t_kfwd = timeit(stage_kernel_fwd, packed_const, p_off_const, steps=steps)
        t_kbwd = timeit(stage_kernel_bwd, packed_const, p_off_const, steps=steps)
        print(f"kernel fwd alone        {t_kfwd:8.2f} ms")
        print(f"kernel fwd+bwd alone    {t_kbwd:8.2f} ms  (kernel bwd ~{t_kbwd - t_kfwd:.2f})")
        return

    t_prep = timeit(stage_prep, *args4, steps=steps)
    t_bin = timeit(stage_bin, *args4, steps=steps)
    t_pack = timeit(stage_pack, *args6, steps=steps)
    t_fwd = timeit(stage_fwd, *args6, steps=steps)
    t_kbwd = timeit(stage_kernel_bwd, packed_const, p_off_const, steps=steps)
    t_all = timeit(stage_fwdbwd, *args6, steps=steps)
    print(f"preprocess              {t_prep:8.2f} ms")
    print(f"+ binning (sort)        {t_bin:8.2f} ms  (delta {t_bin - t_prep:.2f})")
    print(f"+ packing (gather)      {t_pack:8.2f} ms  (delta {t_pack - t_bin:.2f})")
    print(f"+ pallas forward        {t_fwd:8.2f} ms  (delta {t_fwd - t_pack:.2f})")
    print(f"kernel fwd+bwd alone    {t_kbwd:8.2f} ms  (kernel bwd ~{t_kbwd - (t_fwd - t_pack):.2f})")
    print(f"full fwd+bwd            {t_all:8.2f} ms  (bwd delta {t_all - t_fwd:.2f}, "
          f"non-kernel bwd ~{t_all - t_fwd - t_kbwd:.2f})")
    print(f"pixels/s fwd+bwd: {w * h / (t_all / 1e3):.3e}")


if __name__ == "__main__":
    main()
