"""Permutation-application strategies at pack scale: 12-payload sort (round-1
baseline) vs unique-index scatter-set vs gather, 2-D and per-row variants.

The pack backward needs d_pre[:, poa[a]] = g[:, a] (poa is a permutation with
sentinel tails) — sort-by-poa costs ~15.6 ms at 1.8M on v5e; a scatter-SET with
unique indices should be far cheaper if XLA's set-scatter rate (~0.1-2 ns/el)
holds at this shape. Env: PROF_BUDGET, PROF_ROWS, PROF_STEPS.
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

    budget = int(os.environ.get("PROF_BUDGET", 1_800_192))
    rows = int(os.environ.get("PROF_ROWS", 12))
    steps = int(os.environ.get("PROF_STEPS", 3))
    aligned = budget + (1 << 17)

    key = jax.random.key(0)
    g = jax.random.normal(key, (rows, aligned), jnp.float32)
    # poa: a permutation of [0, budget) scattered over the first `budget`
    # aligned slots; the rest are sentinels (budget = padding, aligned = holes)
    perm = jax.random.permutation(jax.random.key(1), budget)
    poa = jnp.concatenate([perm, jnp.full((aligned - budget,), aligned,
                                          jnp.int32)]).astype(jnp.int32)
    poa = jax.random.permutation(jax.random.key(2), poa)  # holes interleaved

    def by_sort(gg):
        out = jax.lax.sort((poa,) + tuple(gg[i] for i in range(rows)),
                           num_keys=1, is_stable=False)
        return jnp.stack(out[1:], 0)[:, :budget]

    def by_scatter_2d(gg):
        z = jnp.zeros((rows, budget + 1), jnp.float32)
        d = z.at[:, poa].set(gg, mode="drop")
        return d[:, :budget]

    def by_scatter_rows(gg):
        outs = []
        for i in range(rows):
            z = jnp.zeros((budget + 1,), jnp.float32)
            outs.append(z.at[poa].set(gg[i], mode="drop")[:budget])
        return jnp.stack(outs, 0)

    def by_scatter_transposed(gg):
        z = jnp.zeros((budget + 1, rows), jnp.float32)
        d = z.at[poa].set(gg.T, mode="drop")
        return d[:budget].T

    def by_gather(gg):
        # inverse permutation gather (round-1's rejected 53 ms formulation)
        inv = jnp.zeros((budget,), jnp.int32).at[perm].set(
            jnp.arange(budget, dtype=jnp.int32))
        return gg[:, inv]

    print(f"budget={budget} aligned={aligned} rows={rows}")
    print(f"sort (12 payload)     {timeit(by_sort, g, steps=steps):8.2f} ms")
    print(f"scatter-set 2d        {timeit(by_scatter_2d, g, steps=steps):8.2f} ms")
    print(f"scatter-set per-row   {timeit(by_scatter_rows, g, steps=steps):8.2f} ms")
    print(f"scatter-set transposed{timeit(by_scatter_transposed, g, steps=steps):8.2f} ms")
    print(f"gather inverse        {timeit(by_gather, g, steps=steps):8.2f} ms")


if __name__ == "__main__":
    main()
