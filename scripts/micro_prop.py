"""Micro-benchmark: the REAL propagate_to_segments path (segment ids via scatter-set +
cummax, then a monotone row gather values[:, seg]) at real binning sizes, and whether
the gather cost scales with the number of value rows (6 -> 3 via bit-packing) or with
the index count alone.

Chained-slope timing (see bench.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(step_fn, seed0, steps=8):
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
    from langsplat_tpu.ops.tiles import segment_ids_from_offsets
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("MP_N", 1_000_000))
    budget = int(os.environ.get("MP_BUDGET", 2_392_064))
    rng = np.random.default_rng(0)
    offsets = jnp.asarray(np.sort(rng.integers(0, budget, n)).astype(np.int32))
    vals6 = jnp.asarray(rng.integers(0, 1 << 24, (6, n)).astype(np.int32))
    vals3 = vals6[:3]
    vals1 = vals6[:1]

    def mk(rows):
        @jax.jit
        def f(seed, v):
            v = v + seed.astype(jnp.int32)
            seg = segment_ids_from_offsets(offsets, budget)
            acc = v[:, seg]
            return (jnp.sum(acc.astype(jnp.float32)) * 1e-30).astype(jnp.float32)
        vv = {6: vals6, 3: vals3, 1: vals1}[rows]
        return lambda s: f(s, vv)

    @jax.jit
    def segonly(seed, o):
        o = o + seed.astype(jnp.int32) * 0
        seg = segment_ids_from_offsets(o, budget)
        return (jnp.sum(seg.astype(jnp.float32)) * 1e-30).astype(jnp.float32)

    z = jnp.float32(0)
    print(f"n={n} budget={budget}")
    print(f"segment ids alone (scatter+cummax): "
          f"{chain_time(lambda s: segonly(s, offsets), z):8.2f} ms")
    for r in (1, 3, 6):
        print(f"seg ids + monotone gather, {r} rows:  "
              f"{chain_time(mk(r), z):8.2f} ms")


if __name__ == "__main__":
    main()
