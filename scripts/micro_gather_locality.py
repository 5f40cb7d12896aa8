"""Micro-benchmark: gather cost vs index locality, and sort payload scaling.

Informs the pack-backward redesign (rasterize_pallas._gather_attrs_bwd):
  - if gather cost is dominated by HBM locality, keeping the Gaussian array
    spatially ordered (Morton re-sort at densify time) makes the permute gather
    cheap on real scenes, with no kernel changes;
  - if a 12-payload sort is cheaper than the random gather, the permute should
    ride a sort instead.

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
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    budget = int(os.environ.get("MGL_BUDGET", 2_392_064))
    aligned = int(os.environ.get("MGL_ALIGNED", budget + 256 * 3072))
    rows = int(os.environ.get("MGL_ROWS", 12))
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(rows, aligned)).astype(np.float32))

    perm = rng.permutation(aligned)[:budget]
    idx_random = jnp.asarray(perm.astype(np.int32))
    # block-local: indices stay within 16384-wide source blocks
    base = (np.arange(budget) * (aligned / budget)).astype(np.int64)
    jit16k = base + rng.integers(-8192, 8192, budget)
    idx_local16k = jnp.asarray(np.clip(jit16k, 0, aligned - 1).astype(np.int32))
    jit512 = base + rng.integers(-256, 256, budget)
    idx_local512 = jnp.asarray(np.clip(jit512, 0, aligned - 1).astype(np.int32))
    idx_mono = jnp.asarray(np.sort(perm).astype(np.int32))

    def mk_gather(idx):
        @jax.jit
        def f(seed, g):
            g = g + seed * 1e-30
            return jnp.sum(g[:, idx]) * 1e-30
        return lambda s: f(s, g)

    z = jnp.zeros(())
    print(f"budget={budget} aligned={aligned} rows={rows}")
    print(f"gather random idx:        {chain_time(mk_gather(idx_random), z):8.2f} ms")
    print(f"gather 16k-local idx:     {chain_time(mk_gather(idx_local16k), z):8.2f} ms")
    print(f"gather 512-local idx:     {chain_time(mk_gather(idx_local512), z):8.2f} ms")
    print(f"gather monotone idx:      {chain_time(mk_gather(idx_mono), z):8.2f} ms")

    # sort payload scaling at aligned size
    keys = jnp.asarray(rng.integers(0, 1 << 31, aligned).astype(np.uint32))
    pay = [jnp.asarray(rng.normal(size=aligned).astype(np.float32))
           for _ in range(12)]

    def mk_sort(np_):
        @jax.jit
        def f(seed, k):
            k = k + seed.astype(jnp.uint32)
            out = jax.lax.sort((k,) + tuple(pay[:np_]), num_keys=1, is_stable=False)
            acc = sum(jnp.sum(o[:128]) for o in out[1:])
            return (acc * 0).astype(jnp.uint32) + jnp.uint32(0)
        return lambda s: f(s, keys)

    zu = jnp.uint32(0)
    for np_ in (1, 4, 12):
        print(f"u32 sort @ {aligned}, {np_:2d} f32 payloads: "
              f"{chain_time(mk_sort(np_), zu):8.2f} ms")


if __name__ == "__main__":
    main()
