"""Break the bin_gaussians + pack_instances cost into its primitive parts on-device.

Anti-DCE: every variant returns sum(out)*1e-30 folded into the next iteration's input
(chained-slope timing per bench.py); no *0 reductions that XLA can constant-fold.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step_fn, steps=8):
    import jax.numpy as jnp

    def chain(k):
        s = jnp.zeros((), jnp.float32)
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

    n = int(os.environ.get("MB_N", 200_000))
    budget = int(os.environ.get("MB_BUDGET", 1_200_000))
    num_tiles = int(os.environ.get("MB_TILES", 1024))
    rng = np.random.default_rng(0)

    fused = jnp.asarray(rng.integers(0, 1 << 31, budget).astype(np.uint32))
    p1 = jnp.asarray(rng.integers(0, budget, budget).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, budget, budget).astype(np.int32))
    depths = jnp.asarray(rng.uniform(0, 100, n).astype(np.float32))
    offsets = jnp.asarray(np.sort(rng.integers(0, budget, n)).astype(np.int32))
    vals6 = jnp.asarray(rng.integers(0, budget, (6, n)).astype(np.int32))
    tile_q = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    sorted_tiles = jnp.asarray(np.sort(rng.integers(0, num_tiles, budget))
                               .astype(np.int32))

    def bench(name, f):
        print(f"{name:42s} {chain_time(f):8.2f} ms")

    @jax.jit
    def s_fused(seed):
        k = fused + seed.astype(jnp.uint32)
        out = jax.lax.sort((k, p1, p2), num_keys=1, is_stable=False)
        return (jnp.sum(out[0].astype(jnp.float32)) + jnp.sum(out[1])
                + jnp.sum(out[2])) * jnp.float32(1e-30) + seed * 0.5

    @jax.jit
    def s_fused1(seed):
        k = fused + seed.astype(jnp.uint32)
        out = jax.lax.sort((k, p1), num_keys=1, is_stable=False)
        return (jnp.sum(out[0].astype(jnp.float32))
                + jnp.sum(out[1])) * jnp.float32(1e-30) + seed * 0.5

    @jax.jit
    def s_nsort(seed):
        d = depths + seed * 1e-30
        out = jax.lax.sort((d, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
                           is_stable=True)
        return jnp.sum(out[0]) * jnp.float32(1e-30) + seed * 0.5

    @jax.jit
    def s_prop(seed):
        v = vals6 + seed.astype(jnp.int32)
        deltas = v - jnp.concatenate(
            [jnp.zeros((6, 1), jnp.int32), v[:, :-1]], axis=1)
        grid = jnp.zeros((6, budget), jnp.int32).at[:, offsets].add(
            deltas, mode="drop")
        acc = jnp.cumsum(grid, axis=1)
        return jnp.sum(acc.astype(jnp.float32)) * jnp.float32(1e-30) + seed * 0.5

    @jax.jit
    def s_search(seed):
        st = sorted_tiles + seed.astype(jnp.int32) * 0
        out = jnp.searchsorted(st, tile_q, method="scan_unrolled")
        return jnp.sum(out.astype(jnp.float32)) * jnp.float32(1e-30) + seed * 0.5

    @jax.jit
    def s_scatter(seed):
        dst = p1 + seed.astype(jnp.int32) * 0
        gid = jnp.full((budget + 130000,), n, jnp.int32).at[dst].set(
            p2, mode="drop")
        return jnp.sum(gid.astype(jnp.float32)) * jnp.float32(1e-30) + seed * 0.5

    print(f"n={n} budget={budget} tiles={num_tiles}")
    bench("fused u32 sort + 2 payloads", s_fused)
    bench("fused u32 sort + 1 payload", s_fused1)
    bench(f"depth rank sort (n={n})", s_nsort)
    bench("propagate_to_segments (6 rows)", s_prop)
    bench("searchsorted scan_unrolled", s_search)
    bench("budget-sized scatter-set", s_scatter)


if __name__ == "__main__":
    main()


def extra():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n = int(os.environ.get("MB_N", 200_000))
    budget = int(os.environ.get("MB_BUDGET", 1_200_000))
    rng = np.random.default_rng(0)
    offsets = jnp.asarray(np.sort(rng.integers(0, budget, n)).astype(np.int32))
    vals6 = jnp.asarray(rng.integers(0, budget, (6, n)).astype(np.int32))

    def bench(name, f):
        print(f"{name:42s} {chain_time(f):8.2f} ms")

    @jax.jit
    def p_scatter(seed):
        v = vals6 + seed.astype(jnp.int32)
        grid = jnp.zeros((6, budget), jnp.int32).at[:, offsets].add(v, mode="drop")
        return jnp.sum(grid.astype(jnp.float32)) * jnp.float32(1e-30) + seed * 0.5

    @jax.jit
    def p_cumsum(seed):
        g = jnp.zeros((6, budget), jnp.int32) + seed.astype(jnp.int32)
        acc = jnp.cumsum(g, axis=1)
        return jnp.sum(acc.astype(jnp.float32)) * jnp.float32(1e-30) + seed * 0.5

    @jax.jit
    def p_cumsum1(seed):
        g = jnp.zeros((budget,), jnp.int32) + seed.astype(jnp.int32)
        acc = jnp.cumsum(g)
        return jnp.sum(acc.astype(jnp.float32)) * jnp.float32(1e-30) + seed * 0.5

    @jax.jit
    def p_gather(seed):
        # alternative: 1-row segment ids (scatter ones + cumsum) + 6 value gathers
        v = vals6 + seed.astype(jnp.int32)
        marks = jnp.zeros((budget,), jnp.int32).at[offsets].add(1, mode="drop")
        seg = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
        acc = v[:, seg]
        return jnp.sum(acc.astype(jnp.float32)) * jnp.float32(1e-30) + seed * 0.5

    @jax.jit
    def p_scatter_flat(seed):
        # scatter rows one by one (6 separate 1-D scatters)
        v = vals6 + seed.astype(jnp.int32)
        outs = []
        for r in range(6):
            outs.append(jnp.zeros((budget,), jnp.int32).at[offsets].add(
                v[r], mode="drop"))
        grid = jnp.stack(outs)
        acc = jnp.cumsum(grid, axis=1)
        return jnp.sum(acc.astype(jnp.float32)) * jnp.float32(1e-30) + seed * 0.5

    bench("propagate: scatter only [6,B]", p_scatter)
    bench("propagate: cumsum only [6,B]", p_cumsum)
    bench("propagate: cumsum only [B]", p_cumsum1)
    bench("alt: seg-ids + 6 gathers", p_gather)
    bench("alt: 6x 1-D scatter + cumsum", p_scatter_flat)


if __name__ == "__main__" and os.environ.get("MB_EXTRA"):
    extra()
