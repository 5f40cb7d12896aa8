"""Primitive-level timings at the exact shapes of the 1M-Gaussian pipeline.

Each row is one XLA primitive in isolation (chained-slope timing), so Pallas
replacement candidates can be ranked by actual cost. Env: PROF_N, PROF_BUDGET,
PROF_STEPS.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from profile_stages import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("PROF_N", 1_000_000))
    budget = int(os.environ.get("PROF_BUDGET", 1_798_144))
    steps = int(os.environ.get("PROF_STEPS", 3))
    num_tiles = 3072

    k0 = jax.random.key(0)
    f_budget12 = jax.random.normal(k0, (12, budget), jnp.float32)
    i_budget = jax.random.randint(jax.random.key(1), (budget,), 0, n, jnp.int32)
    idx_n = jnp.sort(jax.random.randint(jax.random.key(2), (n,), 0, budget,
                                        jnp.int32))
    vals7 = jax.random.randint(jax.random.key(3), (7, n + 1), 0, n, jnp.int32)
    vals13 = jax.random.normal(jax.random.key(4), (13, n + 1), jnp.float32)
    tile_sorted = jnp.sort(jax.random.randint(jax.random.key(5), (budget,), 0,
                                              num_tiles, jnp.int32))
    depths = jax.random.uniform(jax.random.key(6), (n,), jnp.float32)

    rows = [
        ("cummax i32 [B]", lambda x: jax.lax.cummax(
            x.astype(jnp.int32)), i_budget.astype(jnp.float32)),
        ("cumsum f32 [12,B] ax1", lambda x: jnp.cumsum(x, axis=1), f_budget12),
        ("cumsum i32 [B]", lambda x: jnp.cumsum(
            x.astype(jnp.int32)), i_budget.astype(jnp.float32)),
        ("set-scatter N->B 1d", lambda x: jnp.zeros(
            (budget,), jnp.float32).at[idx_n].set(x[:n]),
            jax.random.normal(jax.random.key(7), (n,), jnp.float32)),
        ("row-gather [7,N] @B", lambda x: vals7[:, jnp.clip(
            x.astype(jnp.int32), 0, n)], i_budget.astype(jnp.float32)),
        ("row-gather [13,N] @B f32", lambda x: vals13[:, jnp.clip(
            x.astype(jnp.int32), 0, n)], i_budget.astype(jnp.float32)),
        ("1-row gather [N] @B", lambda x: vals13[0][jnp.clip(
            x.astype(jnp.int32), 0, n)], i_budget.astype(jnp.float32)),
        ("searchsorted 3073 @B", lambda x: jnp.searchsorted(
            x.astype(jnp.int32), jnp.arange(num_tiles + 1, dtype=jnp.int32),
            method="scan_unrolled"), tile_sorted.astype(jnp.float32)),
        ("sort n=1M 2arr", lambda x: jax.lax.sort(
            (x, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True),
            depths),
        ("sort B 3arr u32", lambda x: jax.lax.sort(
            ((x * 4e9).astype(jnp.uint32), i_budget, i_budget), num_keys=1,
            is_stable=False),
            jax.random.uniform(jax.random.key(8), (budget,), jnp.float32)),
        ("sort B 1arr u32", lambda x: jax.lax.sort(
            ((x * 4e9).astype(jnp.uint32),), num_keys=1, is_stable=False),
            jax.random.uniform(jax.random.key(9), (budget,), jnp.float32)),
    ]
    print(f"n={n} budget={budget}")
    for name, fn, arg in rows:
        print(f"{name:28s} {timeit(fn, arg, steps=steps):8.2f} ms")


if __name__ == "__main__":
    main()
