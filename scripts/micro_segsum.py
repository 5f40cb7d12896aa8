"""Micro-benchmark: Pallas bounded-segment-sum kernel vs the XLA
cumsum + boundary-gather formulation, at pack-backward sizes.

Env: MSS_N, MSS_BUDGET, MSS_ROWS, MSS_BJ, MSS_O (block sizes).
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
    from langsplat_tpu.ops.segsum_pallas import segment_sum_bounded
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    n = int(os.environ.get("MSS_N", 1_000_000))
    budget = int(os.environ.get("MSS_BUDGET", 2_392_064))
    rows = int(os.environ.get("MSS_ROWS", 12))
    bj = int(os.environ.get("MSS_BJ", 512))
    o = int(os.environ.get("MSS_O", 512))
    rng = np.random.default_rng(0)

    counts = rng.integers(1, 5, n).astype(np.int64)
    counts = np.minimum((counts * (budget / counts.sum())).astype(np.int64), 32)
    offs = np.concatenate([[0], np.cumsum(counts)]).clip(0, budget).astype(np.int32)
    d = jnp.asarray(rng.normal(size=(rows, budget)).astype(np.float32))
    ends = jnp.asarray(offs)

    @jax.jit
    def xla_path(seed, d):
        d = d + seed * 1e-30
        csum = jnp.concatenate([jnp.zeros((rows, 1), d.dtype),
                                jnp.cumsum(d, axis=1)], axis=1)
        c_at = csum[:, ends]
        seg = c_at[:, 1:] - c_at[:, :-1]
        return jnp.sum(seg) * 1e-30

    @jax.jit
    def kernel_path(seed, d):
        d = d + seed * 1e-30
        seg = segment_sum_bounded(d, ends, n, block_in=bj, block_out=o)
        return jnp.sum(seg) * 1e-30

    # parity check first
    a = jax.jit(lambda d: segment_sum_bounded(d, ends, n,
                                              block_in=bj, block_out=o))(d)
    csum = np.concatenate([np.zeros((rows, 1), np.float32),
                           np.cumsum(np.asarray(d), axis=1)], axis=1)
    ref = csum[:, offs[1:]] - csum[:, offs[:-1]]
    err = np.abs(np.asarray(a) - ref).max()
    print(f"n={n} budget={budget} rows={rows} bj={bj} o={o} max_err={err:.2e}")

    z = jnp.zeros(())
    print(f"XLA cumsum + boundary gather:  {chain_time(lambda s: xla_path(s, d), z):8.2f} ms")
    print(f"Pallas segment_sum_bounded:    {chain_time(lambda s: kernel_path(s, d), z):8.2f} ms")


if __name__ == "__main__":
    main()
