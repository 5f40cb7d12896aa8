"""Micro-benchmarks of the XLA host ops around the Pallas kernel: sort variants,
scatter/gather layouts, searchsorted. Informs the binning/packing optimization."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, *args, steps=5):
    import jax
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = 1_000_000
    budget = 6 * n
    tmax = 32
    rows = 16
    num_tiles = 3072
    rng = np.random.default_rng(0)

    keys_tile = jnp.asarray(rng.integers(0, num_tiles, budget).astype(np.int32))
    keys_depth = jnp.asarray(rng.uniform(0, 100, budget).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, n, budget).astype(np.int32))
    fused = jnp.asarray((rng.integers(0, num_tiles, budget).astype(np.int64) << 20
                         | rng.integers(0, n, budget)).astype(np.uint32))

    print(f"two-key sort {budget}:   "
          f"{t(jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2)), keys_tile, keys_depth, gid):8.2f} ms")
    print(f"1-key u32 sort {budget}: "
          f"{t(jax.jit(lambda a, c: jax.lax.sort((a, c), num_keys=1)), fused, gid):8.2f} ms")
    print(f"1-key sort {n} (depth): "
          f"{t(jax.jit(lambda a: jax.lax.sort((a, gid[:n]), num_keys=1)), keys_depth[:n]):8.2f} ms")

    # scatter (binning construction)
    flat_slot = jnp.asarray(rng.integers(0, budget + 1, n * tmax).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, num_tiles, n * tmax).astype(np.int32))

    @jax.jit
    def scat(slots, v):
        return jnp.full((budget,), num_tiles, jnp.int32).at[slots].set(v, mode="drop")
    print(f"scatter {n*tmax}->[{budget}]: {t(scat, flat_slot, vals):8.2f} ms")

    # gather layouts
    attrs_cols = jnp.asarray(rng.normal(size=(rows, n + 1)).astype(np.float32))
    attrs_rows = jnp.asarray(attrs_cols.T)
    idx = jnp.asarray(rng.integers(0, n, budget).astype(np.int32))

    print(f"gather cols [16,N]->[16,B]: {t(jax.jit(lambda a, i: a[:, i]), attrs_cols, idx):8.2f} ms")
    print(f"gather rows [N,16]->[B,16]: {t(jax.jit(lambda a, i: a[i]), attrs_rows, idx):8.2f} ms")
    print(f"gather rows + transpose:    {t(jax.jit(lambda a, i: a[i].T), attrs_rows, idx):8.2f} ms")

    # scatter-add layouts (gradient reduction)
    d_cols = jnp.asarray(rng.normal(size=(rows, budget)).astype(np.float32))
    d_rows = jnp.asarray(d_cols.T)

    @jax.jit
    def scat_add_cols(d, i):
        return jnp.zeros((rows, n + 1)).at[:, i].add(d)

    @jax.jit
    def scat_add_rows(d, i):
        return jnp.zeros((n + 1, rows)).at[i].add(d)
    print(f"scatter-add cols: {t(scat_add_cols, d_cols, idx):8.2f} ms")
    print(f"scatter-add rows: {t(scat_add_rows, d_rows, idx):8.2f} ms")

    p_off = jnp.asarray(np.sort(rng.integers(0, budget, num_tiles + 1)).astype(np.int32))
    slots = jnp.arange(budget, dtype=jnp.int32)
    print(f"searchsorted [{num_tiles+1}] x {budget}: "
          f"{t(jax.jit(lambda p, s: jnp.searchsorted(p, s, side='right')), p_off, slots):8.2f} ms")

    # transpose
    big = jnp.asarray(rng.normal(size=(budget, rows)).astype(np.float32))
    print(f"transpose [B,16]->[16,B]: {t(jax.jit(lambda x: x.T + 0.0), big):8.2f} ms")


if __name__ == "__main__":
    main()
