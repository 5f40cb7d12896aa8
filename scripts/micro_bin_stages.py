"""Sub-stage timing inside bin_gaussians + the pack backward at bench scale.

Chained-slope methodology as in profile_stages.py. Env: PROF_N/H/W/STEPS.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from profile_stages import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from langsplat_tpu.core import transforms
    from langsplat_tpu.ops import projection
    from langsplat_tpu.ops import tiles as T

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("PROF_N", 1_000_000))
    h = int(os.environ.get("PROF_H", 768))
    w = int(os.environ.get("PROF_W", 1024))
    steps = int(os.environ.get("PROF_STEPS", 5))
    ts = 16
    fov = 0.9
    rng = np.random.default_rng(0)
    means = np.concatenate([rng.uniform(-3, 3, (n, 2)), rng.uniform(2.5, 12, (n, 1))],
                           axis=1).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.002), np.log(0.02), (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, n).astype(np.float32))

    view = jnp.asarray(transforms.world_to_view(np.eye(3), np.zeros(3)).T)
    proj = view @ jnp.asarray(transforms.projection_matrix(0.01, 100.0, fov, fov).T)
    campos = jnp.zeros(3)
    tanf = float(np.tan(fov / 2))
    gx, gy = -(-w // ts), -(-h // ts)
    num_tiles = gx * gy
    kw = dict(image_height=h, image_width=w, tanfovx=tanf, tanfovy=tanf,
              sh_degree=0, tile_size=ts)

    @jax.jit
    def probe(m):
        prep = projection.preprocess(m, scales, quats, None, view, proj, campos,
                                     colors_precomp=colors, **kw)
        return jnp.sum(T.instance_counts(prep, tile_size=ts, tmax=32,
                                         opacities=opac))

    m0 = jnp.asarray(means)
    measured = int(probe(m0))
    budget = -(-int(measured * 1.1) // 4096) * 4096
    print(f"n={n} budget={budget} instances={measured}")

    prep = jax.jit(lambda m: projection.preprocess(
        m, scales, quats, None, view, proj, campos, colors_precomp=colors,
        **kw))(m0)
    prep = jax.tree.map(lambda x: jax.device_put(x), prep)

    def with_prep(fn):
        # wrap so the perturbed first arg is means2d
        def run(m2d):
            p = prep._replace(means2d=m2d)
            return fn(p)
        return run, prep.means2d

    # stage 1: rank sort (depth ranking)
    def rank_sort(p):
        depth_keys = jnp.where(p.visible, p.depths + p.means2d[:, 0] * 1e-30,
                               jnp.inf)
        _, by_depth = jax.lax.sort((depth_keys, jnp.arange(n, dtype=jnp.int32)),
                                   num_keys=1, is_stable=True)
        rank = jnp.zeros((n,), jnp.int32).at[by_depth].set(
            jnp.arange(n, dtype=jnp.int32))
        return rank

    # stage 2: tile pass mask + counts
    def mask_counts(p):
        mask = T.tile_pass_mask(p, tile_size=ts, tmax=32, opacities=opac)
        count = jax.lax.population_count(mask).astype(jnp.int32)
        return mask, count

    # stage 3: propagate (7 rows)
    def propagate(p):
        mask, count = mask_counts(p)
        offsets = (jnp.cumsum(count) - count).astype(jnp.int32)
        wdt = jnp.maximum(p.tiles_max[:, 0] - p.tiles_min[:, 0], 1)
        seg = jnp.arange(1, n + 1, dtype=jnp.int32)
        rank = rank_sort(p)
        rows = [seg, offsets, wdt, p.tiles_min[:, 0], p.tiles_min[:, 1], rank,
                jax.lax.bitcast_convert_type(mask, jnp.int32)]
        return T.propagate_to_segments(offsets, jnp.stack(rows, 0), budget)

    # stage 4: full bin
    def full_bin(p):
        return T.bin_gaussians(p, grid_x=gx, grid_y=gy, budget=budget,
                               max_tiles_per_gaussian=32, tile_size=ts,
                               opacities=opac)

    fn, arg = with_prep(rank_sort)
    print(f"rank sort            {timeit(fn, arg, steps=steps):8.2f} ms")
    fn, arg = with_prep(mask_counts)
    print(f"mask+counts          {timeit(fn, arg, steps=steps):8.2f} ms")
    fn, arg = with_prep(propagate)
    print(f"+ propagate          {timeit(fn, arg, steps=steps):8.2f} ms")
    fn, arg = with_prep(full_bin)
    print(f"full bin_gaussians   {timeit(fn, arg, steps=steps):8.2f} ms")

    # pack backward pieces at this scale: sort of 12 payloads + cumsum + boundary
    # gather
    aligned = budget + (1 << 17)
    rows = 12
    g = jax.random.normal(jax.random.key(0), (rows, aligned), jnp.float32)
    poa = jax.random.randint(jax.random.key(1), (aligned,), 0, budget,
                             jnp.int32)
    ends = jnp.sort(jax.random.randint(jax.random.key(2), (n + 1,), 0, budget,
                                       jnp.int32))

    def bwd_sort(gg):
        out = jax.lax.sort((poa,) + tuple(gg[i] for i in range(rows)),
                           num_keys=1, is_stable=False)
        return out[1:]

    def bwd_sort_cumsum(gg):
        d_pre = jnp.stack(bwd_sort(gg), 0)[:, :budget]
        return jnp.cumsum(d_pre, axis=1)

    def bwd_full(gg):
        csum = jnp.concatenate([jnp.zeros((rows, 1), gg.dtype),
                                bwd_sort_cumsum(gg)], axis=1)
        c_at = csum[:, ends]
        return c_at[:, 1:] - c_at[:, :-1]

    print(f"bwd sort(12 payload) {timeit(bwd_sort, g, steps=steps):8.2f} ms")
    print(f"+ cumsum             {timeit(bwd_sort_cumsum, g, steps=steps):8.2f} ms")
    print(f"+ boundary gather    {timeit(bwd_full, g, steps=steps):8.2f} ms")


if __name__ == "__main__":
    main()
