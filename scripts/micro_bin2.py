"""Micro-benchmark: bin_gaussians internals at current real sizes, cumulative —
each stage includes the previous ones, so deltas attribute cost to each phase.

Phases: preprocess -> +mask/count/offsets -> +propagate -> +slot math/select_bit
-> +fused key sort -> +searchsorted (== full bin_gaussians).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step_fn, seed0, steps=6):
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
    from langsplat_tpu.core import transforms
    from langsplat_tpu.ops import projection
    from langsplat_tpu.ops import tiles as T

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("MB2_N", 1_000_000))
    h, w_img, ts = 768, 1024, 16
    budget = int(os.environ.get("MB2_BUDGET", 1_798_144))
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
    gx, gy = -(-w_img // ts), -(-h // ts)
    num_tiles = gx * gy
    kw = dict(image_height=h, image_width=w_img, tanfovx=tanf, tanfovy=tanf,
              sh_degree=0, tile_size=ts)

    def prep_of(m, s, q, c):
        return projection.preprocess(m, s, q, None, view, proj, campos,
                                     colors_precomp=c, **kw)

    def phase(upto):
        @jax.jit
        def f(seed, m, s, q, c):
            m = m + seed * 1e-30
            prep = prep_of(m, s, q, c)
            out = [prep.means2d]
            if upto >= 1:
                mask = T.tile_pass_mask(prep, tile_size=ts, tmax=32, opacities=opac)
                count = jax.lax.population_count(mask).astype(jnp.int32)
                offsets = (jnp.cumsum(count) - count).astype(jnp.int32)
                out = [mask, offsets]
            if upto >= 2:
                depth_keys = jnp.where(prep.visible, prep.depths, jnp.inf)
                _, by_depth = jax.lax.sort(
                    (depth_keys, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
                    is_stable=True)
                rank = jnp.zeros((n,), jnp.int32).at[by_depth].set(
                    jnp.arange(n, dtype=jnp.int32))
                seg = jnp.arange(1, n + 1, dtype=jnp.int32)
                rows = [seg, offsets, jnp.maximum(
                    prep.tiles_max[:, 0] - prep.tiles_min[:, 0], 1),
                    prep.tiles_min[:, 0], prep.tiles_min[:, 1], rank,
                    jax.lax.bitcast_convert_type(mask, jnp.int32)]
                acc = T.propagate_to_segments(offsets, jnp.stack(rows, 0), budget)
                out = [acc]
            if upto >= 3:
                total = offsets[-1] + count[-1]
                slot = jnp.arange(budget, dtype=jnp.int32)
                in_range = slot < total
                g = jnp.clip(acc[0] - 1, 0, n - 1)
                j = T._select_bit(jax.lax.bitcast_convert_type(acc[6], jnp.uint32),
                                  jnp.maximum(slot - acc[1], 0))
                tx = acc[3] + j % acc[2]
                ty = acc[4] + j // acc[2]
                tile_of_slot = jnp.where(in_range, ty * gx + tx, num_tiles)
                vals_gid = jnp.where(in_range, g, n)
                presort = jnp.where(in_range, slot, budget)
                out = [tile_of_slot, vals_gid, presort]
            if upto >= 4:
                rank_bits = max(1, (n - 1).bit_length())
                fused = (tile_of_slot.astype(jnp.uint32) << rank_bits) | acc[5].astype(
                    jnp.uint32)
                pad_key = jnp.uint32(num_tiles) << rank_bits
                fused = jnp.where(in_range, fused, pad_key)
                sf, sg, sp = jax.lax.sort((fused, vals_gid, presort), num_keys=1,
                                          is_stable=False)
                out = [sf, sg, sp]
            if upto >= 5:
                st = (sf >> rank_bits).astype(jnp.int32)
                tile_start = jnp.searchsorted(
                    st, jnp.arange(num_tiles + 1, dtype=jnp.int32),
                    method="scan_unrolled").astype(jnp.int32)
                out = out + [tile_start]
            return sum(jnp.sum(x.astype(jnp.float32)) for x in out) * 1e-30
        return f

    args = tuple(map(jnp.asarray, (means, scales, quats, colors)))
    z = jnp.zeros(())
    names = ["preprocess only", "+mask/count/offsets", "+propagate",
             "+slot math/select_bit", "+fused sort", "+searchsorted (full)"]
    prev = 0.0
    for i, nm in enumerate(names):
        f = phase(i)
        t = chain_time(lambda s, f=f: f(s, *args), z)
        print(f"{nm:28s} {t:8.2f} ms  (delta {t - prev:+7.2f})")
        prev = t


if __name__ == "__main__":
    main()
