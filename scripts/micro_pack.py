"""Micro-benchmark: packing-gather layouts and sort payload widths on the device.

Informs pack_instances (rasterize_pallas.py) and bin_gaussians (tiles.py): is the
column gather attrs[:, gid] ([rows, N] lane-axis gather) cheaper or dearer than a
row gather attrs_t[gid, :] ([N, rows] sublane gather) followed by a transpose?
And how much does each extra u32 payload cost in the instance sort?

Chained-slope timing (see bench.py): the tunneled platform's block_until_ready does
not wait, so every variant is timed as a dependency chain ending in a scalar fetch.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step_fn, seed0, steps=8):
    import jax

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

    n = int(os.environ.get("MP_N", 1_000_000))
    budget = int(os.environ.get("MP_BUDGET", 1_500_000))
    rows = 16
    rng = np.random.default_rng(0)
    attrs = jnp.asarray(rng.normal(size=(rows, n + 1)).astype(np.float32))
    attrs_t = jnp.asarray(np.asarray(attrs).T.copy())
    gid = jnp.asarray(rng.integers(0, n, budget).astype(np.int32))

    @jax.jit
    def g_cols(seed, a):
        a = a + seed * 1e-30
        out = a[:, gid]
        return jnp.sum(out) * 1e-30

    @jax.jit
    def g_rows(seed, a):
        a = a + seed * 1e-30
        out = jnp.take(a, gid, axis=0)           # [budget, rows]
        return jnp.sum(out) * 1e-30

    @jax.jit
    def g_rows_T(seed, a):
        a = a + seed * 1e-30
        out = jnp.take(a, gid, axis=0).T          # [rows, budget] (kernel layout)
        return jnp.sum(out[0]) * 1e-30

    print(f"n={n} budget={budget} rows={rows}")
    print(f"gather cols  [rows,N][:,gid]:      "
          f"{chain_time(lambda s: g_cols(s, attrs), jnp.zeros(())):8.2f} ms")
    print(f"gather rows  [N,rows][gid,:]:      "
          f"{chain_time(lambda s: g_rows(s, attrs_t), jnp.zeros(())):8.2f} ms")
    print(f"gather rows + transpose:           "
          f"{chain_time(lambda s: g_rows_T(s, attrs_t), jnp.zeros(())):8.2f} ms")

    # sort payload scaling
    fused = jnp.asarray(rng.integers(0, 1 << 31, budget).astype(np.uint32))
    p1 = jnp.asarray(rng.integers(0, budget, budget).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, budget, budget).astype(np.int32))

    @jax.jit
    def sort1(seed, k):
        k = k + seed.astype(jnp.uint32)
        out = jax.lax.sort((k, p1), num_keys=1, is_stable=False)
        return (jnp.sum(out[1][:8]) * 0).astype(jnp.uint32) + jnp.uint32(0)

    @jax.jit
    def sort2(seed, k):
        k = k + seed.astype(jnp.uint32)
        out = jax.lax.sort((k, p1, p2), num_keys=1, is_stable=False)
        return (jnp.sum(out[1][:8] + out[2][:8]) * 0).astype(jnp.uint32) + jnp.uint32(0)

    def mk(f):
        def step(s):
            return f(s, fused)
        return step

    print(f"u32 sort, 1 payload:               "
          f"{chain_time(mk(sort1), jnp.uint32(0)):8.2f} ms")
    print(f"u32 sort, 2 payloads:              "
          f"{chain_time(mk(sort2), jnp.uint32(0)):8.2f} ms")


if __name__ == "__main__":
    main()
