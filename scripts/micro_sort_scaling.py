"""How does lax.sort cost scale with column count and payload rows on TPU?

Motivation: the pack-backward sorts 13 arrays (1 key + 12 payload rows) over
`aligned` ~ 2.4M columns. If XLA's bitonic sort pads to the next power of two,
2.4M pads to 2^22 while the live data (~1.83M) would fit in 2^21 — a ~2x cliff.
Also measures payload-count scaling (is a 13-row sort ~6x a 3-row sort?).

Chained-slope timing like bench.py (RPC latency on the tunneled platform).
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
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
        red = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return (red * 1e-30).astype(jnp.float32) * 0

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

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    results = []
    for ncols in (1_600_000, 1_798_144, 2_000_000, 2_097_152, 2_200_000, 2_400_000,
                  4_194_304):
        for nrows in (3, 13):
            key = jnp.asarray(rng.integers(0, 1 << 30, ncols).astype(np.int32))
            pays = [jnp.asarray(rng.normal(size=ncols).astype(np.float32))
                    for _ in range(nrows - 1)]

            def f(key, *pays):
                return jax.lax.sort((key,) + pays, num_keys=1, is_stable=False)

            t = timeit(f, key, *pays, steps=5)
            results.append((ncols, nrows, t))
            print(f"ncols={ncols:9d} rows={nrows:2d}  {t:7.2f} ms", flush=True)
    return results


if __name__ == "__main__":
    main()
