"""Binning-stage micro A/Bs at bench scale (N=1M, budget=1.8M, S=N).

The r05 sub-profile showed binning's 28.3 ms is NOT the instance sort (~3 ms)
but (a) propagate_to_segments' budget-sized 7-row gather (~13.4 ms) and (b) the
depth-rank construction (~6.8 ms, dominated by a 1M random scatter-set).
Variants measured here:
  prop_gather   current large-S path: segment ids + values[:, seg]
  prop_gather_t transposed source: take(values.T, seg, axis=0) — one contiguous
                28 B row per index instead of 7 random reads
  prop_delta    small-S path forced: scatter-ADD deltas + row cumsum
  segids        segment_ids_from_offsets alone (scatter-set + cummax)
  rank_scatter  current: sort (depth, iota) then rank.at[by_depth].set(iota)
  rank_sort     inverse permutation via a second 2-row sort (no random scatter)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(seed, *a):
        a = (a[0] + seed.astype(a[0].dtype),) + a[1:]
        out = fn(*a)
        red = sum(jnp.sum(x.astype(jnp.float32))
                  for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype"))
        return red * 1e-30

    def chain(k):
        seed = jnp.zeros((), jnp.float32)
        for _ in range(k):
            seed = step(seed, *args)
        return float(seed)

    chain(1)
    t0 = time.time(); chain(1); t1 = time.time() - t0
    t0 = time.time(); chain(1 + steps); t2 = time.time() - t0
    return max(t2 - t1, 0.0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from langsplat_tpu.ops.tiles import segment_ids_from_offsets

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("MB_N", 1_000_000))
    budget = int(os.environ.get("MB_BUDGET", 1_798_144))
    c = 7
    rng = np.random.default_rng(0)
    # skewed counts summing to ~0.93 * budget like the bench scene
    count = rng.poisson(1.55, n).astype(np.int32)
    offsets = jnp.asarray(np.concatenate([[0], np.cumsum(count)[:-1]]).astype(np.int32))
    values = jnp.asarray(rng.integers(0, 1 << 20, (c, n)).astype(np.int32))
    depths = jnp.asarray(rng.uniform(1, 50, n).astype(np.float32))

    def prop_gather(offsets, values):
        seg = segment_ids_from_offsets(offsets, budget)
        return values[:, seg]

    def prop_gather_t(offsets, values):
        seg = segment_ids_from_offsets(offsets, budget)
        vt = values.T  # [n, c]
        return jnp.take(vt, seg, axis=0).T

    def prop_delta(offsets, values):
        deltas = values - jnp.concatenate(
            [jnp.zeros((c, 1), values.dtype), values[:, :-1]], axis=1)
        grid = jnp.zeros((c, budget), values.dtype).at[:, offsets].add(
            deltas, mode="drop")
        return jnp.cumsum(grid, axis=1)

    def segids(offsets, _):
        return segment_ids_from_offsets(offsets, budget)

    def rank_scatter(depths, _):
        _, by_depth = jax.lax.sort((depths, jnp.arange(n, dtype=jnp.int32)),
                                   num_keys=1, is_stable=True)
        return jnp.zeros((n,), jnp.int32).at[by_depth].set(
            jnp.arange(n, dtype=jnp.int32))

    def rank_sort(depths, _):
        iota = jnp.arange(n, dtype=jnp.int32)
        _, by_depth = jax.lax.sort((depths, iota), num_keys=1, is_stable=True)
        _, rank = jax.lax.sort((by_depth, iota), num_keys=1, is_stable=False)
        return rank

    for name, fn, a in (
        ("segids       ", segids, (offsets, values)),
        ("prop_gather  ", prop_gather, (offsets, values)),
        ("prop_gather_t", prop_gather_t, (offsets, values)),
        ("prop_delta   ", prop_delta, (offsets, values)),
        ("rank_scatter ", rank_scatter, (depths, values)),
        ("rank_sort    ", rank_sort, (depths, values)),
    ):
        print(f"{name} {timeit(fn, *a):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
